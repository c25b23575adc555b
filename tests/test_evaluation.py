"""Evaluator tests: VQA consensus accuracy + normalization semantics."""
from cullavo_tpu.data.evaluation.vqa_eval import (VQAEvaluator,
                                                  normalize_answer,
                                                  process_punctuation)


def test_normalization():
    assert normalize_answer("Two") == "2"
    assert normalize_answer("a dog.") == "dog"
    assert normalize_answer("isnt") == "isn't"
    # the official tool's comma rule REMOVES the comma inside digits
    # (vqaEval.py processPunctuation: commaStrip match → replace with '')
    assert normalize_answer("1,000") == "1000"
    assert normalize_answer("yes!") == "yes"


def test_consensus_accuracy():
    ev = VQAEvaluator()
    # unanimous
    acc = ev.process(1, "yes", ["yes"] * 10, "is the", "yes/no")
    assert acc == 1.0
    # 3 of 10 annotators agree: each agreeing annotator sees 2 or 3 matches
    acc = ev.process(2, "cat", ["cat"] * 3 + ["dog"] * 7, "what", "other")
    assert 0.5 < acc < 1.0
    # no match
    acc = ev.process(3, "blue", ["red"] * 10, "what color", "other")
    assert acc == 0.0
    out = ev.evaluate()
    assert out["n"] == 3
    assert 0 < out["overall"] < 100
    assert out["perAnswerType"]["yes/no"] == 100.0


def test_results_dump(tmp_path):
    ev = VQAEvaluator()
    ev.process(7, "yes", ["yes"] * 10)
    p = tmp_path / "res.json"
    ev.dump_results(str(p))
    import json
    data = json.loads(p.read_text())
    assert data == [{"question_id": 7, "answer": "yes"}]


def test_panoptic_quality_perfect_and_miss():
    import numpy as np
    from cullavo_tpu.data.evaluation.evaluators import PanopticEvaluator

    ev = PanopticEvaluator(num_classes=3)
    seg = np.zeros((8, 8), np.int32)
    seg[:4] = 1
    seg[4:] = 2
    segs = [{"id": 1, "category_id": 0}, {"id": 2, "category_id": 1}]
    ev.add(seg, segs, seg, segs)  # perfect prediction
    r = ev.results()
    assert r["PQ"] == 100.0 and r["RQ"] == 100.0

    ev2 = PanopticEvaluator(num_classes=3)
    wrong = np.zeros_like(seg)  # predicted nothing
    ev2.add(wrong, [], seg, segs)
    r2 = ev2.results()
    assert r2["PQ"] == 0.0


def test_retrieval_identity():
    import numpy as np
    from cullavo_tpu.data.evaluation.evaluators import RetrievalEvaluator

    rng = np.random.default_rng(0)
    ev = RetrievalEvaluator(ks=(1, 5))
    embs = rng.normal(size=(10, 16))
    for e in embs:
        ev.add(e, e)  # identical pairs → perfect retrieval
    r = ev.results()
    assert r["ir@1"] == 100.0 and r["tr@1"] == 100.0


def test_classification_eval():
    import numpy as np
    from cullavo_tpu.data.evaluation.evaluators import ClassificationEvaluator

    ev = ClassificationEvaluator()
    ev.add(np.asarray([0.1, 0.9, 0.0]), 1)   # top1 hit
    ev.add(np.asarray([0.9, 0.5, 0.4]), 1)   # top5 hit only
    r = ev.results()
    assert r["top1"] == 50.0 and r["top5"] == 100.0


def test_cider_orders_quality():
    from cullavo_tpu.data.evaluation.evaluators import CaptioningEvaluator

    good = CaptioningEvaluator()
    bad = CaptioningEvaluator()
    refs = [["a cat sits on the mat", "a cat is on a mat"],
            ["a dog runs in the park", "the dog is running in a park"]]
    good.add(1, "a cat sits on the mat", refs[0])
    good.add(2, "a dog runs in the park", refs[1])
    bad.add(1, "blue airplane engine", refs[0])
    bad.add(2, "submarine cheese", refs[1])
    assert good.results()["CIDEr"] > bad.results()["CIDEr"]
    assert bad.results()["CIDEr"] >= 0.0


def test_instance_seg_ap_perfect_and_partial():
    import numpy as np

    from cullavo_tpu.data.evaluation.evaluators import InstanceSegEvaluator

    def disk(cx, cy, r, H=32, W=32):
        yy, xx = np.mgrid[:H, :W]
        return (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r

    # perfect predictions -> AP 100 at every threshold
    ev = InstanceSegEvaluator()
    gt = np.stack([disk(8, 8, 5), disk(24, 24, 6)])
    ev.add(gt.copy(), [1, 2], [0.9, 0.8], gt, [1, 2])
    r = ev.results()
    assert r["AP"] == 100.0 and r["AP50"] == 100.0 and r["AP75"] == 100.0

    # one perfect, one missed GT of the same class -> recall caps at 0.5;
    # 101-pt AP ~= 50 (51/101 exactly)
    ev = InstanceSegEvaluator()
    ev.add(gt[:1], [1], [0.9], gt, [1, 1])
    r = ev.results()
    assert abs(r["AP50"] - 100 * 51 / 101) < 1e-6

    # detection with IoU ~0.6 counts only at thresholds <= 0.6:
    # AP50 > 0, AP75 == 0
    ev = InstanceSegEvaluator()
    a = np.zeros((32, 32), bool); a[:, :20] = True     # pred
    b = np.zeros((32, 32), bool); b[:, 5:25] = True    # gt: inter 15, union 25 -> IoU 0.6
    ev.add(a[None], [3], [0.9], b[None], [3])
    r = ev.results()
    assert r["AP50"] > 0 and r["AP75"] == 0.0

    # a high-scoring false positive before the true positive drags AP50
    # below 100 (precision envelope at low recall < 1)
    ev = InstanceSegEvaluator()
    fp = np.zeros((32, 32), bool); fp[:4, :4] = True
    ev.add(np.stack([fp, gt[0]]), [1, 1], [0.95, 0.9], gt[:1], [1])
    r = ev.results()
    assert 0 < r["AP50"] < 100


def test_retrieval_karpathy_grouped():
    """Grouped protocol: every caption of an image joins the pool under its
    image_id; recall counts image_id hits (retrieval_evaluation.py
    semantics), not 1:1 row pairing."""
    import numpy as np
    from cullavo_tpu.data.evaluation.evaluators import RetrievalEvaluator

    rng = np.random.default_rng(1)
    base = rng.normal(size=(4, 8))
    ev = RetrievalEvaluator(ks=(1, 5))
    for i in range(4):
        # 3 captions per image, all near the image embedding
        caps = base[i] + 0.01 * rng.normal(size=(3, 8))
        ev.add(base[i], caps, image_id=100 + i)
    r = ev.results()
    assert r["ir@1"] == 100.0 and r["tr@1"] == 100.0

    # one image's captions point at ANOTHER image -> its tr@1 fails but the
    # texts still land within top-5 images
    ev = RetrievalEvaluator(ks=(1, 5))
    for i in range(4):
        caps = base[(i + 1) % 4 if i == 0 else i] + 0.01 * rng.normal(size=(2, 8))
        ev.add(base[i], caps, image_id=i)
    r = ev.results()
    assert r["tr@1"] < 100.0 and r["ir@5"] == 100.0


def test_panoptic_void_and_crowd_semantics():
    """panopticapi rules: void overlap leaves the union; crowd GT neither
    matches nor counts FN; a >50%-void unmatched prediction is ignored."""
    import numpy as np
    from cullavo_tpu.data.evaluation.evaluators import PanopticEvaluator

    # gt: segment 1 covers cols 0..9 of a 10x20 map, rest VOID
    gt = np.zeros((10, 20), np.int64)
    gt[:, :10] = 1
    # pred: segment 2 covers cols 0..13 (10 px on gt, 4 px on void)
    pred = np.zeros((10, 20), np.int64)
    pred[:, :14] = 2
    ev = PanopticEvaluator(num_classes=5)
    ev.add(pred, [{"id": 2, "category_id": 1}],
           gt, [{"id": 1, "category_id": 1}])
    # void-corrected union = 100 + 140 - 100 - 40 = 100 -> IoU 1.0 -> TP
    assert ev.tp[1] == 1 and ev.fp[1] == 0 and ev.fn[1] == 0
    assert ev.iou_sum[1] == 1.0

    # crowd GT: never matches, never FN; a pred mostly covered by same-class
    # crowd is ignored (not FP)
    gt2 = np.zeros((10, 20), np.int64)
    gt2[:, :10] = 7                      # crowd segment
    pred2 = np.zeros((10, 20), np.int64)
    pred2[:, :9] = 3                     # 90/90 px inside the crowd
    ev2 = PanopticEvaluator(num_classes=5)
    ev2.add(pred2, [{"id": 3, "category_id": 2}],
            gt2, [{"id": 7, "category_id": 2, "iscrowd": 1}])
    assert ev2.tp.sum() == 0 and ev2.fn.sum() == 0 and ev2.fp.sum() == 0

    # a pred only lightly touching the crowd (and not mostly void) IS an FP:
    # fill the non-crowd half with a real other-class segment so the void
    # rule can't absorb it
    gt3 = gt2.copy()
    gt3[:, 10:] = 8                      # real (non-crowd) segment, class 3
    pred3 = np.zeros((10, 20), np.int64)
    pred3[:, 8:20] = 4                   # 20 px crowd + 100 px class-3 gt
    ev3 = PanopticEvaluator(num_classes=5)
    ev3.add(pred3, [{"id": 4, "category_id": 2}],
            gt3, [{"id": 7, "category_id": 2, "iscrowd": 1},
                  {"id": 8, "category_id": 3}])
    # ignore = 20 crowd px of 120 (17%) -> counted FP; the class-3 gt is FN
    assert ev3.fp[2] == 1 and ev3.fn[3] == 1
