"""Image/annotation transforms for the dataset mappers (detectron2-free).

Capability parity with the used subset of detectron2 transforms:
  * ``ResizeShortestEdge`` / square ``Resize`` (COCO panoptic mapper 336²).
  * ``large_scale_jitter`` — LSJ (scale 0.1–2.0 + fixed-size crop/pad), the
    coco instance LSJ mapper's augmentation
    (datasets/dataset_mappers/coco_instance_new_baseline_dataset_mapper.py).
  * ``random_flip`` — horizontal flip with box/mask adjustment.

All numpy, deterministic under an injected Generator, mask/box aware.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def resize(img: np.ndarray, h: int, w: int, method: str = "bilinear") -> np.ndarray:
    import jax

    out = jax.image.resize(img.astype(np.float32), (h, w) + img.shape[2:], method=method)
    out = np.asarray(out)
    if img.dtype == np.uint8:
        out = np.clip(out, 0, 255).astype(np.uint8)
    return out


def resize_shortest_edge(img: np.ndarray, short: int, max_size: Optional[int] = None):
    H, W = img.shape[:2]
    scale = short / min(H, W)
    if max_size is not None and max(H, W) * scale > max_size:
        scale = max_size / max(H, W)
    nh, nw = int(round(H * scale)), int(round(W * scale))
    return resize(img, nh, nw), (nh / H, nw / W)


def random_flip(record: dict, rng: np.random.Generator, prob: float = 0.5) -> dict:
    """Horizontal flip of image + boxes (abs xyxy) + masks."""
    if rng.random() >= prob:
        return record
    out = dict(record)
    img = record["image"]
    W = img.shape[1]
    out["image"] = img[:, ::-1].copy()
    if record.get("boxes") is not None and len(record["boxes"]):
        b = np.asarray(record["boxes"], np.float32).copy()
        b[:, [0, 2]] = W - b[:, [2, 0]]
        out["boxes"] = b
    if record.get("masks") is not None:
        out["masks"] = np.asarray(record["masks"])[:, :, ::-1].copy()
    return out


def large_scale_jitter(record: dict, rng: np.random.Generator,
                       out_size: int = 1024, scale_min: float = 0.1,
                       scale_max: float = 2.0, pad_value: int = 128) -> dict:
    """LSJ: random resize by s ∈ [scale_min, scale_max] of out_size/shortest,
    then fixed-size random crop (or pad) to out_size²; boxes/masks follow.
    Boxes clipped; fully-cropped-out instances keep zero-area boxes (callers
    filter by mask area)."""
    img = record["image"]
    H, W = img.shape[:2]
    s = rng.uniform(scale_min, scale_max) * out_size / max(H, W)
    nh, nw = max(1, int(round(H * s))), max(1, int(round(W * s)))
    img_r = resize(img, nh, nw)
    masks = record.get("masks")
    if masks is not None and len(masks):
        masks_r = (resize(np.asarray(masks, np.float32).transpose(1, 2, 0),
                          nh, nw, "nearest") > 0.5).transpose(2, 0, 1)
    else:
        masks_r = masks
    boxes = record.get("boxes")
    if boxes is not None and len(boxes):
        boxes_r = np.asarray(boxes, np.float32) * np.asarray([nw / W, nh / H,
                                                              nw / W, nh / H])
    else:
        boxes_r = boxes

    # crop/pad to out_size
    oy = rng.integers(0, max(nh - out_size, 0) + 1)
    ox = rng.integers(0, max(nw - out_size, 0) + 1)
    canvas = np.full((out_size, out_size, 3), pad_value, img.dtype)
    ch = min(out_size, nh - oy)
    cw = min(out_size, nw - ox)
    canvas[:ch, :cw] = img_r[oy:oy + ch, ox:ox + cw]

    out = dict(record)
    out["image"] = canvas
    if masks_r is not None and len(masks_r):
        mc = np.zeros((len(masks_r), out_size, out_size), np.float32)
        mc[:, :ch, :cw] = masks_r[:, oy:oy + ch, ox:ox + cw]
        out["masks"] = mc
    if boxes_r is not None and len(boxes_r):
        b = boxes_r - np.asarray([ox, oy, ox, oy], np.float32)
        b = np.clip(b, 0, out_size)
        out["boxes"] = b
    return out


def overlay_masks(image: np.ndarray, masks: np.ndarray, colors=None,
                  alpha: float = 0.5) -> np.ndarray:
    """Blend instance masks over an image (utils/visualizer.py mask overlay —
    load-bearing for step1/step2 debug imagery, numpy-only)."""
    from cullavo_tpu.data.text_format import COLOR_LIST, COLOR_RGB

    out = image.astype(np.float32).copy()
    names = colors or COLOR_LIST
    for i, m in enumerate(np.asarray(masks)):
        rgb = np.asarray(COLOR_RGB[names[i % len(names)]], np.float32)
        sel = m > 0.5
        out[sel] = (1 - alpha) * out[sel] + alpha * rgb
    return np.clip(out, 0, 255).astype(np.uint8)
