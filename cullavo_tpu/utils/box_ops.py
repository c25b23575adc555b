"""Box coordinate transforms and IoU losses (JAX).

Capability parity with the reference's box utilities
(modeling/utils/box_ops.py: cxcywh↔xyxy, pairwise IoU / generalized IoU),
re-implemented as batched jit-friendly functions.
"""
from __future__ import annotations

import jax.numpy as jnp


def box_cxcywh_to_xyxy(b):
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([cx - 0.5 * w, cy - 0.5 * h,
                            cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def box_xyxy_to_cxcywh(b):
    x0, y0, x1, y1 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([(x0 + x1) / 2, (y0 + y1) / 2,
                            x1 - x0, y1 - y0], axis=-1)


def box_area(b):
    return jnp.clip(b[..., 2] - b[..., 0], 0) * jnp.clip(b[..., 3] - b[..., 1], 0)


def pairwise_iou(a, b):
    """a: [N, 4], b: [M, 4] xyxy → iou [N, M], union [N, M]."""
    area_a = box_area(a)[:, None]
    area_b = box_area(b)[None, :]
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a + area_b - inter
    iou = inter / jnp.maximum(union, 1e-8)
    return iou, union


def generalized_box_iou(a, b):
    """Pairwise gIoU [N, M] (Rezatofighi et al.); boxes xyxy."""
    iou, union = pairwise_iou(a, b)
    lt = jnp.minimum(a[:, None, :2], b[None, :, :2])
    rb = jnp.maximum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    hull = jnp.maximum(wh[..., 0] * wh[..., 1], 1e-8)
    return iou - (hull - union) / hull


def masks_to_boxes(masks):
    """[N, H, W] binary masks → [N, 4] xyxy (0s for empty masks)."""
    N, H, W = masks.shape
    ys = jnp.arange(H)[None, :, None]
    xs = jnp.arange(W)[None, None, :]
    m = masks > 0.5
    big = jnp.array(10 ** 8)
    x0 = jnp.min(jnp.where(m, xs, big), axis=(1, 2))
    y0 = jnp.min(jnp.where(m, ys, big), axis=(1, 2))
    x1 = jnp.max(jnp.where(m, xs, -1), axis=(1, 2)) + 1
    y1 = jnp.max(jnp.where(m, ys, -1), axis=(1, 2)) + 1
    empty = ~jnp.any(m, axis=(1, 2))
    boxes = jnp.stack([x0, y0, x1, y1], axis=-1).astype(jnp.float32)
    return jnp.where(empty[:, None], 0.0, boxes)
