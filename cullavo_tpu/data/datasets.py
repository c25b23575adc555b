"""Dataset registrations beyond COCO panoptic (detectron2-free).

Capability parity with datasets/registration/* for the datasets the active
configs exercise:
  * VQAv2        — questions JSON + annotations JSON keyed by question_id
                   (register_vqa_datasets.py:9-104).
  * RefCOCO      — refs(umd).json-style referring expressions with COCO masks
                   (register_refcoco_dataset.py + the vendored REFER API,
                   datasets/refer.py:45-300 — only the used subset:
                   ref→sentences→ann lookup for the umd val split).
  * ImageNet     — folder scan with the synset→class-index mapping
                   (register_imagenet_cls.py).
  * ADE20K sem.  — image/annotation dir pairing (register_ade20k_*).

Each register_* wires a loader into cullavo_tpu.data.registry.
"""
from __future__ import annotations

import json
import os
from typing import Optional

from cullavo_tpu.data.registry import register_dataset


# ---------------------------------------------------------------------------
# VQAv2
# ---------------------------------------------------------------------------

def load_vqa(questions_json: str, annotations_json: Optional[str],
             image_dir: str, image_template: str = "COCO_val2014_{:012d}.jpg") -> list:
    with open(questions_json) as f:
        questions = json.load(f)["questions"]
    ann_by_qid = {}
    if annotations_json and os.path.exists(annotations_json):
        with open(annotations_json) as f:
            for ann in json.load(f)["annotations"]:
                ann_by_qid[ann["question_id"]] = ann
    rows = []
    for q in questions:
        ann = ann_by_qid.get(q["question_id"])
        rows.append({
            "question_id": q["question_id"],
            "question": q["question"],
            "image_id": q["image_id"],
            "file_name": os.path.join(image_dir, image_template.format(q["image_id"])),
            "answers": [a["answer"] for a in ann["answers"]] if ann else None,
            "question_type": ann.get("question_type") if ann else None,
            "answer_type": ann.get("answer_type") if ann else None,
        })
    return rows


def register_vqa(name: str, questions_json: str, annotations_json: Optional[str],
                 image_dir: str, **kw):
    register_dataset(name, lambda: load_vqa(questions_json, annotations_json,
                                            image_dir, **kw),
                     {"gt_json": annotations_json})


# ---------------------------------------------------------------------------
# RefCOCO (umd refs)
# ---------------------------------------------------------------------------

def load_refcoco(refs_json: str, instances_json: str, image_dir: str,
                 split: str = "val") -> list:
    """refs_json: list of {"ann_id", "image_id", "split", "category_id",
    "sentences": [{"sent"}]}; instances_json: COCO instances with
    segmentation polygons / RLE per ann_id."""
    with open(refs_json) as f:
        refs = json.load(f)
    with open(instances_json) as f:
        inst = json.load(f)
    anns = {a["id"]: a for a in inst["annotations"]}
    imgs = {i["id"]: i for i in inst["images"]}
    rows = []
    for ref in refs:
        if ref.get("split") != split:
            continue
        ann = anns.get(ref["ann_id"])
        img = imgs.get(ref["image_id"])
        if ann is None or img is None:
            continue
        for sent in ref["sentences"]:
            rows.append({
                "image_id": ref["image_id"],
                "file_name": os.path.join(image_dir, img["file_name"]),
                "height": img["height"], "width": img["width"],
                "text": sent["sent"],
                "category_id": ref.get("category_id"),
                "segmentation": ann.get("segmentation"),
                "bbox": ann.get("bbox"),
            })
    return rows


def register_refcoco(name: str, refs_json: str, instances_json: str,
                     image_dir: str, split: str = "val"):
    register_dataset(name, lambda: load_refcoco(refs_json, instances_json,
                                                image_dir, split), {})


def polygons_to_mask(segmentation, height: int, width: int):
    """COCO polygon(s) → binary mask, pure numpy scanline fill (replaces
    pycocotools.mask for the polygon case)."""
    import numpy as np

    mask = np.zeros((height, width), np.uint8)
    if isinstance(segmentation, dict):       # RLE {counts, size}
        return rle_to_mask(segmentation)
    for poly in segmentation:
        pts = np.asarray(poly, np.float64).reshape(-1, 2)
        # even-odd scanline fill
        ys = np.arange(height) + 0.5
        x0, y0 = pts[:, 0], pts[:, 1]
        x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
        for yi, y in enumerate(ys):
            cross = ((y0 <= y) & (y1 > y)) | ((y1 <= y) & (y0 > y))
            if not cross.any():
                continue
            xs = x0[cross] + (y - y0[cross]) / (y1[cross] - y0[cross]) * (x1[cross] - x0[cross])
            xs = np.sort(xs)
            for a, b in zip(xs[0::2], xs[1::2]):
                lo = max(int(np.ceil(a - 0.5)), 0)
                hi = min(int(np.ceil(b - 0.5)), width)
                if hi > lo:
                    mask[yi, lo:hi] = 1
    return mask


def rle_to_mask(rle: dict):
    """Uncompressed COCO RLE {"counts": [...], "size": [h, w]} → mask."""
    import numpy as np

    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, str):
        raise ValueError("compressed RLE strings not supported; decode upstream")
    flat = np.zeros(h * w, np.uint8)
    pos = 0
    val = 0
    for c in counts:
        if val:
            flat[pos:pos + c] = 1
        pos += c
        val ^= 1
    return flat.reshape(w, h).T     # COCO RLE is column-major


# ---------------------------------------------------------------------------
# ImageNet folder scan
# ---------------------------------------------------------------------------

def load_imagenet_folder(root: str, folder_names: Optional[list] = None) -> list:
    from cullavo_tpu.utils import constants

    folders = folder_names or constants.IMAGENET_FOLDER_NAMES
    index = {f: i for i, f in enumerate(folders)}
    rows = []
    for folder in sorted(os.listdir(root)):
        if folder not in index:
            continue
        d = os.path.join(root, folder)
        for fn in sorted(os.listdir(d)):
            rows.append({"file_name": os.path.join(d, fn),
                         "label": index[folder]})
    return rows


def register_imagenet(name: str, root: str):
    register_dataset(name, lambda: load_imagenet_folder(root),
                     {"num_classes": 1000})


# ---------------------------------------------------------------------------
# ADE20K semantic
# ---------------------------------------------------------------------------

def load_ade20k_sem(image_dir: str, ann_dir: str) -> list:
    rows = []
    for fn in sorted(os.listdir(image_dir)):
        stem = os.path.splitext(fn)[0]
        ann = os.path.join(ann_dir, stem + ".png")
        if os.path.exists(ann):
            rows.append({"file_name": os.path.join(image_dir, fn),
                         "sem_seg_file_name": ann})
    return rows


def register_ade20k_sem(name: str, image_dir: str, ann_dir: str):
    register_dataset(name, lambda: load_ade20k_sem(image_dir, ann_dir),
                     {"num_classes": 150, "ignore_label": 255})
