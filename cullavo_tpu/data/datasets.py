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


def register_imagenet(name: str, root: str, folder_names: Optional[list] = None,
                      class_names: Optional[list] = None):
    """Folder-scan ImageNet registration (register_imagenet_cls.py).
    ``folder_names`` restricts/orders the synset folders (defaults to the
    full 1000-synset table); ``class_names`` are the human-readable labels
    used for the zero-shot text prompts."""
    from cullavo_tpu.utils import constants

    if class_names is None:
        # synset folder → human label via the canonical 1000-class table
        syn2cls = dict(zip(constants.IMAGENET_FOLDER_NAMES,
                           constants.IMAGENET_CLASSES))
        class_names = ([syn2cls.get(f, f) for f in folder_names]
                       if folder_names else list(constants.IMAGENET_CLASSES))
    register_dataset(name, lambda: load_imagenet_folder(root, folder_names),
                     {"num_classes": len(class_names),
                      "class_names": class_names})


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


# ---------------------------------------------------------------------------
# Remaining segmentation registrations
# (capability parity with datasets/registration/register_{scannet,sunrgbd,
#  bdd100k,ade20k_panoptic,ade20k_instance,ade20k_full,coco_stuff_10k,
#  pascalvoc_eval}.py — same dataset names, detectron2-free loaders)
# ---------------------------------------------------------------------------

def load_semseg_pairs(image_dir: str, ann_dir: str, image_ext: str = ".jpg",
                      ann_ext: str = ".png") -> list:
    """Generic image/annotation directory pairing (detectron2 ``load_sem_seg``
    as used by register_coco_stuff_10k.py:211 and register_ade20k_full.py)."""
    rows = []
    for fn in sorted(os.listdir(image_dir)):
        if not fn.endswith(image_ext):
            continue
        stem = fn[: -len(image_ext)]
        ann = os.path.join(ann_dir, stem + ann_ext)
        if os.path.exists(ann):
            rows.append({"file_name": os.path.join(image_dir, fn),
                         "sem_seg_file_name": ann})
    return rows


def load_scannet_semseg(dirname: str, split: str, label_folder: str) -> list:
    """ScanNet frames: ``meta/{split}.txt`` lists relative color-image paths;
    labels live beside them with ``color``→``label*`` and jpg→png swapped
    (register_scannet_semseg.py:29-51)."""
    rows = []
    with open(os.path.join(dirname, "meta", split + ".txt")) as f:
        fileids = [ln.split()[0] for ln in f if ln.strip()]
    for rel in fileids:
        image_path = os.path.join(dirname, "images", rel)
        # substitute on the RELATIVE frame id only — a root containing
        # "color"/".jpg" substrings must not be rewritten
        sem_rel = rel.replace("color", label_folder).replace(".jpg", ".png")
        rows.append({"file_name": image_path,
                     "sem_seg_file_name": os.path.join(dirname, "images", sem_rel),
                     "image_id": rel.replace("/", "_").rsplit(".", 1)[0]})
    return rows


_SCANNET_LABEL_FOLDERS = {"scannet_41_val_seg": ("label41", "SCAN_40"),
                          "scannet_38_val_seg": ("label38", "SCAN_37"),
                          "scannet_21_val_seg": ("label21", "SCAN_20")}


def register_scannet_semseg(root: str):
    for name, (folder, const) in _SCANNET_LABEL_FOLDERS.items():
        register_dataset(
            name,
            (lambda folder=folder: load_scannet_semseg(
                os.path.join(root, "scannet_frames_25k"), "val", folder)),
            {"class_names_key": const, "ignore_label": 0,
             "evaluator_type": "sem_seg"})


def load_sunrgbd_semseg(dirname: str, split: str) -> list:
    """SUN-RGBD: image/{split} dir + label37/{split} (register_sunrgbd_semseg
    .py:21-47)."""
    image_dir = os.path.join(dirname, "image", split)
    ann_dir = os.path.join(dirname, "label37", split)
    return load_semseg_pairs(image_dir, ann_dir, ".jpg", ".png")


def register_sunrgbd_semseg(root: str):
    register_dataset("sunrgbd_37_val_seg",
                     lambda: load_sunrgbd_semseg(os.path.join(root, "sun_rgbd"), "val"),
                     {"class_names_key": "SUN_RGBD_37", "ignore_label": 0,
                      "evaluator_type": "sem_seg"})


def register_bdd_semseg(root: str):
    """BDD100k 10k semantic split (register_bdd100k_semseg.py:21-66)."""
    base = os.path.join(root, "bdd100k")
    register_dataset(
        "bdd10k_val_sem_seg",
        lambda: load_semseg_pairs(os.path.join(base, "images/10k/val"),
                                  os.path.join(base, "labels/sem_seg/masks/val"),
                                  ".jpg", ".png"),
        {"class_names_key": "BDD_SEM", "ignore_label": 255,
         "evaluator_type": "sem_seg"})


def register_scannet_panoptic(root: str):
    """ScanNet-20 panoptic val (register_scannet_panoptic.py:134-203): COCO
    panoptic-format JSON over scannet_frames_25k)."""
    from cullavo_tpu.data.coco_panoptic import load_coco_panoptic_json

    base = os.path.join(root, "scannet_frames_25k")
    register_dataset(
        "scannet_21_panoptic_val",
        lambda: load_coco_panoptic_json(
            os.path.join(base, "scannet_panoptic.json"),
            os.path.join(base, "images"),
            os.path.join(base, "scannet_panoptic"), {}),
        {"class_names_key": "SCANNET_20", "evaluator_type": "scannet_panoptic"})


def register_bdd_panoseg(root: str):
    """BDD100k panoptic (COCO-panoptic-format JSON;
    register_bdd100k_panoseg.py:116-166)."""
    from cullavo_tpu.data.coco_panoptic import load_coco_panoptic_json

    base = os.path.join(root, "bdd100k")
    register_dataset(
        "bdd10k_40_panoptic_val",
        lambda: load_coco_panoptic_json(
            os.path.join(base, "labels/pan_seg/meta_pan.json"),
            os.path.join(base, "images/10k/val"),
            os.path.join(base, "labels/pan_seg/bitmasks/val"), {}),
        {"class_names_key": "BDD_PANO", "evaluator_type": "bdd_panoptic_pano"})


def register_ade20k_panoptic(root: str):
    """ADE20k panoptic val (COCO-panoptic-format JSON;
    register_ade20k_panoptic.py:217-265,308-390)."""
    from cullavo_tpu.data.coco_panoptic import load_coco_panoptic_json

    base = os.path.join(root, "ADEChallengeData2016")
    register_dataset(
        "ade20k_panoptic_val",
        lambda: load_coco_panoptic_json(
            os.path.join(base, "ade20k_panoptic_val.json"),
            os.path.join(base, "images/validation"),
            os.path.join(base, "ade20k_panoptic_val"), {}),
        {"class_names_key": "ADE_PANOPTIC_CLASSES",
         "evaluator_type": "ade20k_panoptic_seg"})


def load_coco_instance_json(json_file: str, image_dir: str) -> list:
    """COCO-instances-format JSON → rows with per-image annotation lists
    (detectron2 ``load_coco_json`` subset used by register_ade20k_instance).
    Dataset category ids are remapped to contiguous 0-based indices (sorted
    by id, like detectron2) so GT classes line up with prediction indices."""
    with open(json_file) as f:
        data = json.load(f)
    cats = sorted(c["id"] for c in data.get("categories", []))
    remap = {cid: i for i, cid in enumerate(cats)}
    anns_by_img = {}
    for a in data["annotations"]:
        anns_by_img.setdefault(a["image_id"], []).append(a)
    rows = []
    for img in data["images"]:
        rows.append({
            "file_name": os.path.join(image_dir, img["file_name"]),
            "image_id": img["id"], "height": img["height"],
            "width": img["width"],
            "annotations": [
                {"bbox": a["bbox"],
                 "category_id": remap.get(a["category_id"], a["category_id"]),
                 "segmentation": a.get("segmentation"),
                 "iscrowd": a.get("iscrowd", 0)}
                for a in anns_by_img.get(img["id"], [])],
        })
    return rows


def register_ade20k_instance(root: str):
    base = os.path.join(root, "ADEChallengeData2016")
    register_dataset(
        "ade20k_instance_val",
        lambda: load_coco_instance_json(
            os.path.join(base, "ade20k_instance_val.json"),
            os.path.join(base, "images/validation")),
        {"class_names_key": "ADE_PANOPTIC_CLASSES", "evaluator_type": "coco"})


def register_ade20k_full(root: str):
    """ADE20k-Full 847-class semantic val (register_ade20k_full.py:944-964)."""
    base = os.path.join(root, "ADE20K_2021_17_01")
    register_dataset(
        "ade20k_full_sem_seg_val",
        lambda: load_semseg_pairs(os.path.join(base, "images_detectron2/val"),
                                  os.path.join(base, "annotations_detectron2/val"),
                                  ".jpg", ".tif"),
        {"class_names_key": "ADE20K_847", "ignore_label": 65535,
         "evaluator_type": "sem_seg"})


def register_coco_stuff_10k(root: str):
    """coco-stuff-10k semantic splits (register_coco_stuff_10k.py:196-216)."""
    base = os.path.join(root, "coco", "coco_stuff_10k")
    for split in ("train", "test"):
        register_dataset(
            f"coco_2017_{split}_stuff_10k_sem_seg",
            (lambda split=split: load_semseg_pairs(
                os.path.join(base, "images_detectron2", split),
                os.path.join(base, "annotations_detectron2", split),
                ".jpg", ".png")),
            {"ignore_label": 255, "evaluator_type": "sem_seg"})


def load_pascalvoc_interactive(dirname: str, split: str,
                               slice_size: int = 5) -> list:
    """PascalVOC interactive-segmentation eval rows: each row carries the
    instance-mask png + up to ``slice_size`` object ids
    (register_pascalvoc_eval.py:25-60; the cv2 read happens lazily in the
    mapper here instead of at registration time)."""
    with open(os.path.join(dirname, "ImageSets", "Segmentation",
                           split + ".txt")) as f:
        fileids = [ln.strip() for ln in f if ln.strip()]
    rows = []
    for field in fileids:
        rows.append({
            "file_name": os.path.join(dirname, "JPEGImages", field + ".jpg"),
            "inst_name": os.path.join(dirname, "SegmentationObject", field + ".png"),
            "semseg_name": os.path.join(dirname, "SegmentationClass", field + ".png"),
            "slice_size": slice_size,
        })
    return rows


def register_pascalvoc_interactive(root: str):
    register_dataset(
        "pascalvoc_val_Point",
        lambda: load_pascalvoc_interactive(os.path.join(root, "PascalVOC"), "val"),
        {"class_names_key": "PASCAL_CLASSES", "evaluator_type": "interactive"})


def register_all_segmentation(root: str):
    """One-call registration of every auxiliary segmentation dataset — the
    equivalent of importing datasets/registration/__init__.py with
    ``DATASET`` set (the active configs register COCO/ADE-sem/RefCOCO/VQA/
    ImageNet explicitly; these cover the rest of the reference's table)."""
    register_scannet_semseg(root)
    register_scannet_panoptic(root)
    register_sunrgbd_semseg(root)
    register_bdd_semseg(root)
    register_bdd_panoseg(root)
    register_ade20k_panoptic(root)
    register_ade20k_instance(root)
    register_ade20k_full(root)
    register_coco_stuff_10k(root)
    register_pascalvoc_interactive(root)
    # karpathy VLP arrow splits when the arrow pool exists under <root>/vlp
    vlp_root = os.path.join(root, "vlp")
    if os.path.isdir(vlp_root):
        from cullavo_tpu.data.vlp_datasets import register_all_vlp

        register_all_vlp(vlp_root)
