"""COCO panoptic dataset loading + mapping (detectron2-free).

Capability parity with the used subset of the reference's data layer:
  * ``rgb2id`` — panopticapi's RGB→segment-id encoding.
  * ``register_coco_panoptic`` — walks the panoptic JSON into records
    (datasets/registration/register_coco_panoptic_annos_semseg.py).
  * ``PanopticMapper`` — raw record → model input: image resize to 336²
    (bicubic, matching COCOPanopticNewBaselineDatasetMapper's
    ``Resize 336²`` at dataset_mappers/coco_panoptic_new_baseline_dataset_mapper.py:57),
    panoptic PNG → per-instance binary masks / classes / boxes / is_thing.

Everything returns numpy with static-size padding hooks for the SPMD trainer.
"""
from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from cullavo_tpu.data.registry import register_dataset


def rgb2id(color: np.ndarray) -> np.ndarray:
    """[H, W, 3] uint8 → [H, W] int32 (panopticapi encoding)."""
    color = color.astype(np.int64)
    return (color[..., 0] + 256 * color[..., 1] + 256 * 256 * color[..., 2]).astype(np.int64)


def id2rgb(ids: np.ndarray) -> np.ndarray:
    out = np.zeros(ids.shape + (3,), np.uint8)
    out[..., 0] = ids % 256
    out[..., 1] = (ids // 256) % 256
    out[..., 2] = (ids // 65536) % 256
    return out


def load_coco_panoptic_json(json_file: str, image_dir: str, panoptic_dir: str,
                            metadata: dict) -> list:
    """Panoptic annotation JSON → list of records (one per image)."""
    with open(json_file) as f:
        info = json.load(f)
    cat_id_to_contiguous = metadata.get("dataset_id_to_contiguous_id") or {
        c["id"]: i for i, c in enumerate(sorted(info.get("categories", []),
                                                key=lambda c: c["id"]))}
    thing_ids = metadata.get("thing_dataset_ids") or {
        c["id"] for c in info.get("categories", []) if c.get("isthing")}
    records = []
    for ann in info["annotations"]:
        image_id = ann["image_id"]
        file_name = ann["file_name"].replace(".png", ".jpg")
        records.append({
            "image_id": image_id,
            "file_name": os.path.join(image_dir, file_name),
            "pan_seg_file_name": os.path.join(panoptic_dir, ann["file_name"]),
            "segments_info": [
                {"id": s["id"],
                 "category_id": cat_id_to_contiguous.get(s["category_id"], s["category_id"]),
                 "iscrowd": s.get("iscrowd", 0),
                 "isthing": s["category_id"] in thing_ids}
                for s in ann["segments_info"]],
        })
    return records


def register_coco_panoptic(name: str, json_file: str, image_dir: str,
                           panoptic_dir: str, metadata: Optional[dict] = None):
    md = dict(metadata or {})
    register_dataset(name,
                     lambda: load_coco_panoptic_json(json_file, image_dir,
                                                     panoptic_dir, md),
                     md)


def resize_image(img: np.ndarray, size: int, method: str = "bicubic") -> np.ndarray:
    """Square resize via jax.image (host), uint8-safe."""
    import jax

    out = jax.image.resize(img.astype(np.float32), (size, size, img.shape[-1]),
                           method=method)
    return np.clip(np.asarray(out), 0, 255).astype(np.uint8)


class PanopticMapper:
    """record → {"image" [S,S,3] u8, "classes" [N], "boxes" [N,4] abs xyxy,
    "is_thing" [N], "masks" [N,S,S]}; filters crowd segments like
    datasets/build.py's crowd filter."""

    def __init__(self, image_size: int = 336, load_image=None):
        self.image_size = image_size
        self._load_image = load_image or self._default_loader

    @staticmethod
    def _default_loader(path: str) -> np.ndarray:
        from PIL import Image

        with Image.open(path) as im:
            return np.asarray(im.convert("RGB"))

    def __call__(self, record: dict) -> Optional[dict]:
        img = record.get("image")
        if img is None:
            img = self._load_image(record["file_name"])
        pan = record.get("pan_seg")
        if pan is None:
            pan = self._load_image(record["pan_seg_file_name"])
        seg_ids = rgb2id(pan)

        S = self.image_size
        H, W = seg_ids.shape
        img = resize_image(img, S)

        classes, boxes, is_thing, masks = [], [], [], []
        for seg in record["segments_info"]:
            if seg.get("iscrowd", 0):
                continue
            m = seg_ids == seg["id"]
            if not m.any():
                continue
            ys, xs = np.nonzero(m)
            # nearest-resize the mask to the model resolution
            yy = np.clip((np.arange(S) + 0.5) * H / S, 0, H - 1).astype(np.int64)
            xx = np.clip((np.arange(S) + 0.5) * W / S, 0, W - 1).astype(np.int64)
            m_resized = m[yy][:, xx]
            scale_x, scale_y = S / W, S / H
            boxes.append([xs.min() * scale_x, ys.min() * scale_y,
                          (xs.max() + 1) * scale_x, (ys.max() + 1) * scale_y])
            classes.append(seg["category_id"])
            is_thing.append(bool(seg.get("isthing", True)))
            masks.append(m_resized)
        if not classes:
            return None
        return {
            "image": img,
            "image_id": record.get("image_id"),
            "classes": np.asarray(classes, np.int32),
            "boxes": np.asarray(boxes, np.float32),
            "is_thing": np.asarray(is_thing, bool),
            "masks": np.stack(masks).astype(np.float32),
        }


def pad_targets(mapped: list, max_instances: int, mask_size: Optional[int] = None):
    """Stack mapped records into padded SPMD-ready target arrays (classes /
    masks / boxes normalized cxcywh / valid)."""
    B = len(mapped)
    first = next((m for m in mapped if m is not None), None)
    if first is None:
        raise ValueError("all records empty")
    S = first["image"].shape[0]
    ms = mask_size or S
    classes = np.zeros((B, max_instances), np.int32)
    boxes = np.zeros((B, max_instances, 4), np.float32)
    valid = np.zeros((B, max_instances), bool)
    masks = np.zeros((B, max_instances, ms, ms), np.float32)
    images = np.zeros((B, S, S, 3), np.uint8)
    for i, m in enumerate(mapped):
        if m is None:
            continue
        n = min(len(m["classes"]), max_instances)
        images[i] = m["image"]
        classes[i, :n] = m["classes"][:n]
        valid[i, :n] = True
        b = m["boxes"][:n] / S                      # normalize
        cx = (b[:, 0] + b[:, 2]) / 2
        cy = (b[:, 1] + b[:, 3]) / 2
        boxes[i, :n] = np.stack([cx, cy, b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]], -1)
        if ms != S:
            import jax
            mm = jax.image.resize(m["masks"][:n], (n, ms, ms), method="nearest")
            masks[i, :n] = np.asarray(mm)
        else:
            masks[i, :n] = m["masks"][:n]
    return {"image": images, "classes": classes, "boxes": boxes,
            "valid": valid, "masks": masks}
