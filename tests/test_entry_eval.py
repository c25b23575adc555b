"""CLI eval-entry integration tests: tiny fixtures through ``entry.main``.

Covers the lbk_entry.py:6-22 NAME dispatch end-to-end: xdecoder_test
(semantic, panoptic+PQ, refcoco grounding), vl_test (VQA accuracy), and
cullavo_step2_pre (model-in-the-loop generation) — all against synthetic
fixture datasets registered via the DATASETS.REGISTER config block.
"""
import json
import os

import numpy as np
import pytest

from cullavo_tpu import entry
from cullavo_tpu.data.coco_panoptic import id2rgb


def _save_png(path, arr):
    from PIL import Image

    Image.fromarray(arr).save(path)


def _write_yaml(path, text):
    with open(path, "w") as f:
        f.write(text)
    return str(path)


def _run_eval(capsys, conf):
    entry.main(["eval", "--conf_files", conf])
    out = capsys.readouterr().out.strip().splitlines()
    return json.loads(out[-1])


def test_eval_cli_xdecoder_semseg(tmp_path, capsys):
    img_dir = tmp_path / "img"
    ann_dir = tmp_path / "ann"
    img_dir.mkdir(); ann_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        _save_png(img_dir / f"im{i}.jpg",
                  rng.integers(0, 255, (32, 40, 3), dtype=np.uint8))
        _save_png(ann_dir / f"im{i}.png",
                  rng.integers(0, 6, (32, 40), dtype=np.uint8))
    conf = _write_yaml(tmp_path / "conf.yaml", f"""
NAME: xdecoder_test
PIPELINE: XDecoderPipeline
MODEL:
  TINY: true
DATASETS:
  TEST: [fix_sem_val]
  REGISTER:
    fix_sem_val:
      KIND: semseg
      IMAGE_DIR: {img_dir}
      ANN_DIR: {ann_dir}
      NUM_CLASSES: 6
      TASKS: {{SEMANTIC: true}}
""")
    res = _run_eval(capsys, conf)
    m = res["fix_sem_val"]["sem_seg"]
    assert set(m) == {"mIoU", "fwIoU", "mACC", "pACC"}
    assert 0.0 <= m["mIoU"] <= 100.0
    assert "timing" in res["fix_sem_val"]


def test_eval_cli_xdecoder_panoptic_pq(tmp_path, capsys):
    img_dir = tmp_path / "img"
    pan_dir = tmp_path / "pan"
    img_dir.mkdir(); pan_dir.mkdir()
    rng = np.random.default_rng(1)
    H, W = 32, 32
    anns = []
    for i in range(2):
        _save_png(img_dir / f"{i:012d}.jpg",
                  rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
        ids = np.zeros((H, W), np.int32)
        ids[:16, :16] = 7          # thing segment
        ids[16:, :] = 9            # stuff segment
        _save_png(pan_dir / f"{i:012d}.png", id2rgb(ids).astype(np.uint8))
        anns.append({"image_id": i, "file_name": f"{i:012d}.png",
                     "segments_info": [
                         {"id": 7, "category_id": 1, "iscrowd": 0},
                         {"id": 9, "category_id": 2, "iscrowd": 0}]})
    pj = tmp_path / "panoptic.json"
    with open(pj, "w") as f:
        json.dump({"annotations": anns,
                   "categories": [{"id": 1, "isthing": 1},
                                  {"id": 2, "isthing": 0}]}, f)
    conf = _write_yaml(tmp_path / "conf.yaml", f"""
NAME: xdecoder_test
MODEL:
  TINY: true
DATASETS:
  TEST: [fix_pano_val]
  REGISTER:
    fix_pano_val:
      KIND: coco_panoptic
      JSON: {pj}
      IMAGE_DIR: {img_dir}
      PANOPTIC_DIR: {pan_dir}
      NUM_CLASSES: 6
      TASKS: {{SEMANTIC: true, PANOPTIC: true, INSTANCE: true}}
""")
    res = _run_eval(capsys, conf)
    m = res["fix_pano_val"]
    assert "sem_seg" in m
    # PQ must be COMPUTED (round-1 gap: raw outputs returned, PQ never run)
    assert "panoptic" in m and {"PQ", "SQ", "RQ"} <= set(m["panoptic"])
    # instance GT came from the panoptic mapper, so AP must be reported
    assert "instance_ap" in m and "AP" in m["instance_ap"]


def test_eval_cli_refcoco(tmp_path, capsys):
    img_dir = tmp_path / "img"
    img_dir.mkdir()
    rng = np.random.default_rng(2)
    _save_png(img_dir / "r.jpg", rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
    refs = [{"ann_id": 1, "image_id": 10, "split": "val", "category_id": 3,
             "sentences": [{"sent": "the red thing"}]}]
    inst = {"annotations": [{"id": 1, "image_id": 10,
                             "segmentation": [[2, 2, 20, 2, 20, 20, 2, 20]],
                             "bbox": [2, 2, 18, 18]}],
            "images": [{"id": 10, "file_name": "r.jpg",
                        "height": 32, "width": 32}]}
    rj, ij = tmp_path / "refs.json", tmp_path / "inst.json"
    with open(rj, "w") as f:
        json.dump(refs, f)
    with open(ij, "w") as f:
        json.dump(inst, f)
    out_dir = tmp_path / "out"
    conf = _write_yaml(tmp_path / "conf.yaml", f"""
NAME: xdecoder_test
MODEL:
  TINY: true
SAVE_DIR: {out_dir}
DATASETS:
  TEST: [fix_refcoco_val]
  REGISTER:
    fix_refcoco_val:
      KIND: refcoco
      REFS_JSON: {rj}
      INSTANCES_JSON: {ij}
      IMAGE_DIR: {img_dir}
""")
    res = _run_eval(capsys, conf)
    m = res["fix_refcoco_val"]
    assert {"cIoU", "mIoU", "precision@0.5"} <= set(m)
    assert os.path.exists(out_dir / "ref_coco.csv")


def test_eval_cli_vl_test_vqa(tmp_path, capsys):
    img_dir = tmp_path / "img"
    img_dir.mkdir()
    rng = np.random.default_rng(3)
    for image_id in (1, 2):
        _save_png(img_dir / f"COCO_val2014_{image_id:012d}.jpg",
                  rng.integers(0, 255, (40, 40, 3), dtype=np.uint8))
    qj, aj = tmp_path / "q.json", tmp_path / "a.json"
    with open(qj, "w") as f:
        json.dump({"questions": [
            {"question_id": 100, "question": "what is it?", "image_id": 1},
            {"question_id": 101, "question": "how many?", "image_id": 2}]}, f)
    with open(aj, "w") as f:
        json.dump({"annotations": [
            {"question_id": 100, "question_type": "what is",
             "answer_type": "other",
             "answers": [{"answer": "cat"}] * 10},
            {"question_id": 101, "question_type": "how many",
             "answer_type": "number",
             "answers": [{"answer": "2"}] * 10}]}, f)
    out_dir = tmp_path / "out"
    conf = _write_yaml(tmp_path / "conf.yaml", f"""
NAME: vl_test
PIPELINE: LLaVAVQAVALPipeline
BATCH_SIZE: 2
MAX_NEW_TOKENS: 4
SAVE_DIR: {out_dir}
DATASETS:
  TEST: [fix_vqa_val]
  REGISTER:
    fix_vqa_val:
      KIND: vqa
      QUESTIONS_JSON: {qj}
      ANNOTATIONS_JSON: {aj}
      IMAGE_DIR: {img_dir}
""")
    res = _run_eval(capsys, conf)
    m = res["fix_vqa_val"]
    assert m["n"] == 2
    assert 0.0 <= m["overall"] <= 100.0
    assert os.path.exists(out_dir / "vqa_results.json")


def test_eval_cli_vl_test_kv_quant(tmp_path, capsys):
    """KV_QUANT: int8 reaches the pipeline: the int8-quantized decode cache
    (llama.init_kv_cache) runs the same VQA workload end-to-end."""
    img_dir = tmp_path / "img"
    img_dir.mkdir()
    rng = np.random.default_rng(3)
    _save_png(img_dir / "COCO_val2014_000000000001.jpg",
              rng.integers(0, 255, (40, 40, 3), dtype=np.uint8))
    qj, aj = tmp_path / "q.json", tmp_path / "a.json"
    with open(qj, "w") as f:
        json.dump({"questions": [
            {"question_id": 100, "question": "what is it?", "image_id": 1}]}, f)
    with open(aj, "w") as f:
        json.dump({"annotations": [
            {"question_id": 100, "question_type": "what is",
             "answer_type": "other",
             "answers": [{"answer": "cat"}] * 10}]}, f)
    conf = _write_yaml(tmp_path / "conf.yaml", f"""
NAME: vl_test
PIPELINE: LLaVAVQAVALPipeline
BATCH_SIZE: 1
MAX_NEW_TOKENS: 4
KV_QUANT: int8
SAVE_DIR: {tmp_path / "out"}
DATASETS:
  TEST: [fix_vqa_kv]
  REGISTER:
    fix_vqa_kv:
      KIND: vqa
      QUESTIONS_JSON: {qj}
      ANNOTATIONS_JSON: {aj}
      IMAGE_DIR: {img_dir}
""")
    res = _run_eval(capsys, conf)
    assert res["fix_vqa_kv"]["n"] == 1


def test_eval_cli_vl_test_vqa_testdev_submission(tmp_path, capsys):
    """test-dev split: no annotations — the run produces the EvalAI
    submission JSON, no accuracy (LLaVAVQATESTPipeline.py:29-143)."""
    img_dir = tmp_path / "img"
    img_dir.mkdir()
    rng = np.random.default_rng(5)
    for image_id in (1, 2, 3):
        _save_png(img_dir / f"COCO_test2015_{image_id:012d}.jpg",
                  rng.integers(0, 255, (40, 40, 3), dtype=np.uint8))
    qj = tmp_path / "q.json"
    with open(qj, "w") as f:
        json.dump({"questions": [
            {"question_id": 200 + i, "question": "what is it?", "image_id": i}
            for i in (1, 2, 3)]}, f)
    out_dir = tmp_path / "out"
    conf = _write_yaml(tmp_path / "conf.yaml", f"""
NAME: vl_test
PIPELINE: LLaVAVQATESTPipeline
BATCH_SIZE: 2
MAX_NEW_TOKENS: 4
SAVE_DIR: {out_dir}
DATASETS:
  TEST: [fix_vqa_testdev]
  REGISTER:
    fix_vqa_testdev:
      KIND: vqa
      QUESTIONS_JSON: {qj}
      IMAGE_DIR: {img_dir}
      IMAGE_TEMPLATE: "COCO_test2015_{{:012d}}.jpg"
""")
    res = _run_eval(capsys, conf)
    m = res["fix_vqa_testdev"]
    assert m["n"] == 3 and m["submission"]
    with open(out_dir / "vqa_submission.json") as f:
        sub = json.load(f)
    assert [r["question_id"] for r in sub] == [201, 202, 203]
    assert all(isinstance(r["answer"], str) for r in sub)


def test_eval_cli_step2_pre(tmp_path, capsys):
    img_dir = tmp_path / "img"
    img_dir.mkdir()
    rng = np.random.default_rng(4)
    _save_png(img_dir / "a.jpg", rng.integers(0, 255, (48, 48, 3), dtype=np.uint8))
    cj = tmp_path / "conv.json"
    with open(cj, "w") as f:
        json.dump([{"image": "a.jpg", "conversations": [
            {"from": "human", "value": "<image> describe"},
            {"from": "gpt", "value": "a thing"}]}], f)
    out_dir = tmp_path / "gen"
    conf = _write_yaml(tmp_path / "conf.yaml", f"""
NAME: cullavo_step2_pre
PIPELINE: CuLLaVOPipeline
SAVE_DIR: {out_dir}
MAX_NEW_TOKENS: 8
DATASETS:
  TEST: [fix_sharegpt]
  REGISTER:
    fix_sharegpt:
      KIND: conversations
      JSON: {cj}
      IMAGE_ROOT: {img_dir}
""")
    res = _run_eval(capsys, conf)
    assert "rows" in res
    # the merged JSON is written even when the tiny random model parses to
    # zero usable rows (CuLLaVOPipeline.py:130-132 semantics)
    assert os.path.exists(out_dir / "lbk_new_version.json")


def test_eval_cli_unknown_name(tmp_path):
    conf = _write_yaml(tmp_path / "conf.yaml", "NAME: bogus_workload\n")
    with pytest.raises(SystemExit):
        entry.main(["eval", "--conf_files", conf])


def test_train_cli_xdecoder_joint(tmp_path, capsys):
    """`entry train` with an xdecoder NAME drives the joint
    seg+caption+grounding trainer end-to-end from a config-registered
    caption-grounding dataset: constant batch size (None-mapped records
    are skipped without shrinking the batch), all 12 reference loss keys,
    finite loss, and a saved checkpoint."""
    img_dir = tmp_path / "img"
    pan_dir = tmp_path / "pan"
    img_dir.mkdir(); pan_dir.mkdir()
    rng = np.random.default_rng(3)
    H, W = 64, 64
    pan_anns, cap_anns, grd_anns = [], [], []
    for i in range(5):
        _save_png(img_dir / f"{i:012d}.jpg",
                  rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
        ids = np.zeros((H, W), np.int32)
        if i != 2:           # record 2 has NO segments -> mapper returns None
            ids[:32, :32] = 7
            ids[32:, :] = 9
        _save_png(pan_dir / f"{i:012d}.png", id2rgb(ids).astype(np.uint8))
        segs = ([] if i == 2 else
                [{"id": 7, "category_id": 1, "iscrowd": 0},
                 {"id": 9, "category_id": 2, "iscrowd": 0}])
        pan_anns.append({"image_id": i, "file_name": f"{i:012d}.png",
                         "segments_info": segs})
        cap_anns.append({"image_id": i, "caption": "a cat near a lamp"})
        cap_anns.append({"image_id": i, "caption": "animal on green grass"})
        grd_anns.append({"image_id": i,
                         "segmentation": [[2, 2, 28, 2, 28, 28, 2, 28]],
                         "sentences": [{"raw": "the fluffy cat"}],
                         "category_id": 1})
    pj = tmp_path / "panoptic.json"
    cj = tmp_path / "captions.json"
    gj = tmp_path / "grounding.json"
    pj.write_text(json.dumps({
        "annotations": pan_anns,
        "categories": [{"id": 1, "isthing": 1, "name": "cat"},
                       {"id": 2, "isthing": 0, "name": "grass"}]}))
    cj.write_text(json.dumps({"annotations": cap_anns}))
    gj.write_text(json.dumps({"annotations": grd_anns}))
    save_dir = tmp_path / "ckpt"
    conf = _write_yaml(tmp_path / "conf.yaml", f"""
NAME: xdecoder_train
MODEL:
  TINY: true
BATCH_SIZE: 2
EPOCHS: 1
MAX_INSTANCES: 4
INPUT:
  IMAGE_SIZE: 64
SOLVER:
  BASE_LR: 1.0e-4
  MAX_ITER: 10
SAVE_DIR: {save_dir}
DATASETS:
  TRAIN: fix_joint_train
  REGISTER:
    fix_joint_train:
      KIND: coco_panoptic_caption_grounding
      JSON: {pj}
      IMAGE_DIR: {img_dir}
      PANOPTIC_DIR: {pan_dir}
      CAPTION_JSON: {cj}
      GROUNDING_JSON: {gj}
      NUM_CLASSES: 6
""")
    entry.main(["train", "--conf_files", conf])
    err = capsys.readouterr().err
    import ast

    steps = [ast.literal_eval(l) for l in err.splitlines()
             if l.startswith("{'step'")]
    # 4 valid records at batch 2 -> exactly 2 constant-size steps
    assert len(steps) == 2, err
    assert all(np.isfinite(s["loss_total"]) for s in steps)
    assert save_dir.exists() and any(save_dir.iterdir())


def test_serve_cli_smoke(tmp_path, capsys):
    """``entry serve`` smoke: tiny random model + synthesized requests →
    JSONL results with one row per request."""
    results = tmp_path / "serve_results.jsonl"
    conf = _write_yaml(tmp_path / "serve.yaml", f"""
NAME: serve
SERVE:
  RESULTS: {results}
  SLOTS: 2
  QUANTUM: 3
  PREFILL_CHUNK: 2
  EOS_TOKEN_ID: -1
  DTYPE: float32
""")
    entry.main(["serve", "--conf_files", conf])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["requests"] == 4
    rows = [json.loads(l) for l in results.read_text().splitlines()]
    assert {r["id"] for r in rows} == {0, 1, 2, 3}
    for i, r in enumerate(sorted(rows, key=lambda r: r["id"])):
        assert len(r["tokens"]) == 4 + 2 * i and isinstance(r["text"], str)


def test_serve_cli_requests_file(tmp_path, capsys):
    """JSONL request file with explicit input_ids and per-request budgets;
    results must be deterministic greedy streams (two runs identical)."""
    rng = np.random.default_rng(0)
    req_path = tmp_path / "reqs.jsonl"
    from cullavo_tpu.models.llava.config import tiny_llava_config

    n_img = tiny_llava_config(260).num_image_tokens
    with open(req_path, "w") as f:
        for i in range(3):
            ids = rng.integers(3, 250, size=(1 + n_img + 5 + i,)).tolist()
            ids[1:1 + n_img] = [tiny_llava_config(260).image_token_id] * n_img
            f.write(json.dumps({"id": 10 + i, "input_ids": ids,
                                "max_new_tokens": 5}) + "\n")

    def run(out_name):
        results = tmp_path / out_name
        conf = _write_yaml(tmp_path / f"{out_name}.yaml", f"""
NAME: serve
SERVE:
  REQUESTS: {req_path}
  RESULTS: {results}
  SLOTS: 2
  QUANTUM: 2
  PREFILL_CHUNK: 2
  EOS_TOKEN_ID: -1
  DTYPE: float32
""")
        entry.main(["serve", "--conf_files", conf])
        capsys.readouterr()
        return sorted((json.loads(l) for l in results.read_text().splitlines()),
                      key=lambda r: r["id"])

    a, b = run("a.jsonl"), run("b.jsonl")
    assert a == b
    assert [r["id"] for r in a] == [10, 11, 12]
    assert all(len(r["tokens"]) == 5 for r in a)


def test_eval_cli_vl_test_zoo_blip2(tmp_path, capsys):
    """A zoo workload is reachable from the entry: MODEL.ZOO: blip2 routes
    eval_for_vl_model through VLZooVQAPipeline with the NATIVE flan-T5
    tower (beam-5, length-penalty -1 — the reference decode configuration,
    BLIP2VQAVALPipeline.py:175) end-to-end over a tiny fixture dataset."""
    img_dir = tmp_path / "img"
    img_dir.mkdir()
    rng = np.random.default_rng(7)
    for image_id in (1, 2):
        _save_png(img_dir / f"COCO_val2014_{image_id:012d}.jpg",
                  rng.integers(0, 255, (40, 40, 3), dtype=np.uint8))
    qj, aj = tmp_path / "q.json", tmp_path / "a.json"
    with open(qj, "w") as f:
        json.dump({"questions": [
            {"question_id": 100, "question": "what is it?", "image_id": 1},
            {"question_id": 101, "question": "how many?", "image_id": 2}]}, f)
    with open(aj, "w") as f:
        json.dump({"annotations": [
            {"question_id": 100, "question_type": "what is",
             "answer_type": "other",
             "answers": [{"answer": "cat"}] * 10},
            {"question_id": 101, "question_type": "how many",
             "answer_type": "number",
             "answers": [{"answer": "2"}] * 10}]}, f)
    out_dir = tmp_path / "out"
    conf = _write_yaml(tmp_path / "conf.yaml", f"""
NAME: vl_test
MODEL:
  TINY: true
  ZOO: blip2
MAX_NEW_TOKENS: 4
SAVE_DIR: {out_dir}
DATASETS:
  TEST: [fix_vqa_zoo]
  REGISTER:
    fix_vqa_zoo:
      KIND: vqa
      QUESTIONS_JSON: {qj}
      ANNOTATIONS_JSON: {aj}
      IMAGE_DIR: {img_dir}
""")
    res = _run_eval(capsys, conf)
    m = res["fix_vqa_zoo"]
    assert m["n"] == 2
    assert 0.0 <= m["overall"] <= 100.0
    assert os.path.exists(out_dir / "vqa_results.json")


def test_eval_cli_vl_test_zoo_kosmos2(tmp_path, capsys):
    """KOSMOS-2 zoo workload from the entry: MODEL.ZOO: kosmos2 runs the
    NATIVE latent-query tower (greedy KV-cache decode, Answer: extraction —
    KOSMOS2VQAVALPipeline.py semantics) end-to-end over a tiny fixture."""
    img_dir = tmp_path / "img"
    img_dir.mkdir()
    rng = np.random.default_rng(8)
    _save_png(img_dir / "COCO_val2014_000000000005.jpg",
              rng.integers(0, 255, (40, 40, 3), dtype=np.uint8))
    qj, aj = tmp_path / "q.json", tmp_path / "a.json"
    with open(qj, "w") as f:
        json.dump({"questions": [
            {"question_id": 200, "question": "what color?", "image_id": 5}]}, f)
    with open(aj, "w") as f:
        json.dump({"annotations": [
            {"question_id": 200, "question_type": "what color",
             "answer_type": "other",
             "answers": [{"answer": "red"}] * 10}]}, f)
    conf = _write_yaml(tmp_path / "conf.yaml", f"""
NAME: vl_test
MODEL:
  TINY: true
  ZOO: kosmos2
MAX_NEW_TOKENS: 4
SAVE_DIR: {tmp_path / 'out'}
DATASETS:
  TEST: [fix_vqa_k2]
  REGISTER:
    fix_vqa_k2:
      KIND: vqa
      QUESTIONS_JSON: {qj}
      ANNOTATIONS_JSON: {aj}
      IMAGE_DIR: {img_dir}
""")
    res = _run_eval(capsys, conf)
    m = res["fix_vqa_k2"]
    assert m["n"] == 1 and 0.0 <= m["overall"] <= 100.0


def test_eval_cli_vl_test_zoo_instructblip(tmp_path, capsys):
    """InstructBLIP zoo workload from the entry: MODEL.ZOO: instructblip
    runs the NATIVE instruction-aware Q-Former + LLaMA decoder (qformer
    text conditioning, beam-5 — InstructBLIPVQAVALPipeline.py semantics)
    end-to-end over a tiny fixture."""
    img_dir = tmp_path / "img"
    img_dir.mkdir()
    rng = np.random.default_rng(9)
    _save_png(img_dir / "COCO_val2014_000000000003.jpg",
              rng.integers(0, 255, (40, 40, 3), dtype=np.uint8))
    qj, aj = tmp_path / "q.json", tmp_path / "a.json"
    with open(qj, "w") as f:
        json.dump({"questions": [
            {"question_id": 300, "question": "how big?", "image_id": 3}]}, f)
    with open(aj, "w") as f:
        json.dump({"annotations": [
            {"question_id": 300, "question_type": "how big",
             "answer_type": "other",
             "answers": [{"answer": "small"}] * 10}]}, f)
    conf = _write_yaml(tmp_path / "conf.yaml", f"""
NAME: vl_test
MODEL:
  TINY: true
  ZOO: instructblip
MAX_NEW_TOKENS: 4
SAVE_DIR: {tmp_path / 'out'}
DATASETS:
  TEST: [fix_vqa_ib]
  REGISTER:
    fix_vqa_ib:
      KIND: vqa
      QUESTIONS_JSON: {qj}
      ANNOTATIONS_JSON: {aj}
      IMAGE_DIR: {img_dir}
""")
    res = _run_eval(capsys, conf)
    m = res["fix_vqa_ib"]
    assert m["n"] == 1 and 0.0 <= m["overall"] <= 100.0


def test_eval_cli_imagenet_zero_shot(tmp_path, capsys):
    """imagenet_test workload: KIND: imagenet folder-scan registration +
    the zero-shot Q-Former classification pipeline
    (BLIP2ImageNetPipeline.py semantics) end-to-end from the CLI."""
    root = tmp_path / "in1k"
    rng = np.random.default_rng(11)
    for syn in ("n01440764", "n01443537"):       # tench, goldfish
        d = root / syn
        d.mkdir(parents=True)
        for i in range(2):
            _save_png(d / f"{syn}_{i}.JPEG",
                      rng.integers(0, 255, (36, 36, 3), dtype=np.uint8))
    out_dir = tmp_path / "out"
    conf = _write_yaml(tmp_path / "conf.yaml", f"""
NAME: imagenet_test
MODEL:
  TINY: true
  ZOO: blip2
BATCH_SIZE: 2
SAVE_DIR: {out_dir}
DATASETS:
  TEST: [fix_in1k]
  REGISTER:
    fix_in1k:
      KIND: imagenet
      ROOT: {root}
      FOLDERS: [n01440764, n01443537]
""")
    res = _run_eval(capsys, conf)
    m = res["fix_in1k"]
    assert m["n"] == 4
    assert 0.0 <= m["top1"] <= 100.0 and m["top5"] == 100.0  # 2 classes ⊂ top5
    per_class = out_dir / "imagenet_per_class.csv"
    assert per_class.exists()
    body = per_class.read_text()
    assert "tench" in body and "goldfish" in body  # synset → human labels
