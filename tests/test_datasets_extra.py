"""Tests for the auxiliary segmentation registrations + InteractiveEvaluator.

Mirrors the reference's registration table (datasets/registration/*) with
tmpdir-synthesized datasets — the loaders are pure listings, so the tests
check row schemas and registry wiring.
"""
import json
import os

import numpy as np
import pytest

from cullavo_tpu.data import datasets as D
from cullavo_tpu.data import registry


@pytest.fixture(autouse=True)
def _fresh_registry():
    saved = dict(registry._DATASETS)
    saved_md = dict(getattr(registry, "_METADATA", {}))
    registry._DATASETS.clear()
    if hasattr(registry, "_METADATA"):
        registry._METADATA.clear()
    yield
    registry._DATASETS.clear()
    registry._DATASETS.update(saved)
    if hasattr(registry, "_METADATA"):
        registry._METADATA.clear()
        registry._METADATA.update(saved_md)


def _touch(path, data=b"x"):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)


def test_semseg_pairs(tmp_path):
    img, ann = tmp_path / "img", tmp_path / "ann"
    for stem in ("a", "b"):
        _touch(str(img / f"{stem}.jpg"))
        _touch(str(ann / f"{stem}.png"))
    _touch(str(img / "orphan.jpg"))        # no annotation → skipped
    rows = D.load_semseg_pairs(str(img), str(ann))
    assert [os.path.basename(r["file_name"]) for r in rows] == ["a.jpg", "b.jpg"]
    assert all(r["sem_seg_file_name"].endswith(".png") for r in rows)


def test_scannet_registration(tmp_path):
    root = tmp_path
    base = root / "scannet_frames_25k"
    _touch(str(base / "meta" / "val.txt"),
           b"scene0011_00/color/000000.jpg\nscene0011_00/color/000100.jpg\n")
    for frame in ("000000", "000100"):
        _touch(str(base / "images" / "scene0011_00" / "color" / f"{frame}.jpg"))
        for lbl in ("label41", "label38", "label21"):
            _touch(str(base / "images" / "scene0011_00" / lbl / f"{frame}.png"))
    D.register_scannet_semseg(str(root))
    for name in ("scannet_41_val_seg", "scannet_38_val_seg", "scannet_21_val_seg"):
        rows = registry.get_dataset(name)
        assert len(rows) == 2
        assert "label" in rows[0]["sem_seg_file_name"]
        assert rows[0]["file_name"].endswith(".jpg")


def test_bdd_and_ade_panoptic_registration(tmp_path):
    root = tmp_path
    pan_json = {
        "annotations": [{
            "image_id": 7, "file_name": "im7.png",
            "segments_info": [{"id": 1, "category_id": 3, "iscrowd": 0}],
        }],
        "categories": [{"id": 3, "name": "road", "isthing": 0}],
    }
    base = root / "bdd100k"
    _touch(str(base / "labels/pan_seg/meta_pan.json"),
           json.dumps(pan_json).encode())
    ade = root / "ADEChallengeData2016"
    _touch(str(ade / "ade20k_panoptic_val.json"), json.dumps(pan_json).encode())
    D.register_bdd_panoseg(str(root))
    D.register_ade20k_panoptic(str(root))
    for name in ("bdd10k_40_panoptic_val", "ade20k_panoptic_val"):
        rows = registry.get_dataset(name)
        assert rows[0]["image_id"] == 7
        assert rows[0]["pan_seg_file_name"].endswith("im7.png")
        assert rows[0]["segments_info"][0]["category_id"] == 0  # contiguous


def test_ade20k_instance_rows(tmp_path):
    inst = {
        "images": [{"id": 1, "file_name": "x.jpg", "height": 4, "width": 6}],
        "annotations": [
            {"image_id": 1, "bbox": [0, 0, 2, 2], "category_id": 5,
             "segmentation": [[0, 0, 2, 0, 2, 2]], "iscrowd": 0},
            {"image_id": 1, "bbox": [1, 1, 2, 2], "category_id": 9},
        ],
    }
    base = tmp_path / "ADEChallengeData2016"
    _touch(str(base / "ade20k_instance_val.json"), json.dumps(inst).encode())
    D.register_ade20k_instance(str(tmp_path))
    rows = registry.get_dataset("ade20k_instance_val")
    assert len(rows) == 1 and len(rows[0]["annotations"]) == 2
    assert rows[0]["annotations"][0]["category_id"] == 5


def test_pascalvoc_interactive_rows(tmp_path):
    base = tmp_path / "PascalVOC"
    _touch(str(base / "ImageSets/Segmentation/val.txt"), b"2007_000032\n")
    D.register_pascalvoc_interactive(str(tmp_path))
    rows = registry.get_dataset("pascalvoc_val_Point")
    assert rows[0]["file_name"].endswith("JPEGImages/2007_000032.jpg")
    assert rows[0]["inst_name"].endswith("SegmentationObject/2007_000032.png")
    assert rows[0]["slice_size"] == 5


def test_register_all_segmentation(tmp_path):
    # all loaders are lazy: registration must succeed with an empty root
    base = tmp_path
    _touch(str(base / "scannet_frames_25k/meta/val.txt"), b"")
    D.register_all_segmentation(str(base))
    for name in ("scannet_21_val_seg", "sunrgbd_37_val_seg",
                 "bdd10k_val_sem_seg", "bdd10k_40_panoptic_val",
                 "ade20k_panoptic_val", "ade20k_instance_val",
                 "ade20k_full_sem_seg_val",
                 "coco_2017_train_stuff_10k_sem_seg",
                 "coco_2017_test_stuff_10k_sem_seg", "pascalvoc_val_Point"):
        assert name in registry._DATASETS, name


def test_interactive_evaluator_noc():
    from cullavo_tpu.data.evaluation.evaluators import InteractiveEvaluator

    ev = InteractiveEvaluator(max_clicks=5, iou_iter=2)
    ev.add([0.3, 0.6, 0.82, 0.9, 0.95])   # hits 0.5 at click 2, 0.8 at 3, 0.9 at 4
    ev.add([0.1, 0.2, 0.3, 0.4, 0.45])    # never reaches any threshold
    r = ev.results()
    assert r["noc@0.5"] == pytest.approx((2 + 5) / 2)
    assert r["noc@0.8"] == pytest.approx((3 + 5) / 2)
    assert r["noc@0.9"] == pytest.approx((4 + 5) / 2)
    assert r["iou_max_iter"] == pytest.approx((0.6 + 0.2) / 2)


def test_interactive_evaluator_rejects_bad_curve():
    from cullavo_tpu.data.evaluation.evaluators import InteractiveEvaluator

    ev = InteractiveEvaluator(max_clicks=3)
    with pytest.raises(ValueError):
        ev.add([0.5, 0.6])


def test_box_ap_evaluator():
    from cullavo_tpu.data.evaluation.evaluators import BoxAPEvaluator

    ev = BoxAPEvaluator()
    gt = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float64)
    # perfect detections → AP 100
    ev.add(gt, [1, 1], [0.9, 0.8], gt, [1, 1])
    r = ev.results()
    assert r["AP"] == pytest.approx(100.0)
    # one hit one miss at IoU .5: second pred barely overlaps its gt
    ev2 = BoxAPEvaluator(iou_thresholds=[0.5])
    preds = np.array([[0, 0, 10, 10], [28, 28, 38, 38]], np.float64)
    ev2.add(preds, [1, 1], [0.9, 0.8], gt, [1, 1])
    r2 = ev2.results()
    # recall hits 0.5 with precision 1 → 101-pt AP ≈ 51/101
    assert r2["AP50"] == pytest.approx(100 * 51 / 101, abs=0.1)
