"""Training mappers for semantic-only and instance (LSJ) datasets.

Capability parity with the reference's training-mapper dispatch
(datasets/build.py:361-377):

* ``SemanticTrainMapper`` — ``mask_former_semantic``: a semantic label PNG
  becomes one binary mask per present class
  (mask_former_semantic_dataset_mapper.py:166-173), with scale + crop
  augmentation.  Output matches ``PanopticMapper``'s contract so
  ``pad_targets`` / the criterion consume it unchanged.
* ``InstanceTrainMapper`` — ``coco_instance_lsj``: COCO instance annotations
  (polygon/RLE) with large-scale-jitter + flip augmentation
  (coco_instance_new_baseline_dataset_mapper.py).

Both run on host workers (numpy), keeping the device graph static-shape:
``pad_targets`` pads to ``max_instances`` with validity masks.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from cullavo_tpu.data.coco_panoptic import resize_image
from cullavo_tpu.data.transforms import large_scale_jitter, random_flip


def _load_rgb(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def _load_label(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im)


class SemanticTrainMapper:
    """record {"file_name", "sem_seg_file_name"} → PanopticMapper-shaped
    training targets: one mask per class present in the label map
    (mask_former_semantic_dataset_mapper.py:166-173), ``ignore_label``
    pixels excluded, stuff semantics (``is_thing`` False)."""

    def __init__(self, image_size: int = 512, ignore_label: int = 255,
                 scale_range=(0.5, 2.0), flip_prob: float = 0.5,
                 load_image=None, load_label=None, seed: int = 0):
        self.image_size = image_size
        self.ignore_label = ignore_label
        self.scale_range = scale_range
        self.flip_prob = flip_prob
        self._load_image = load_image or _load_rgb
        self._load_label = load_label or _load_label
        self.rng = np.random.default_rng(seed)

    def __call__(self, record: dict) -> Optional[dict]:
        img = record.get("image")
        if img is None:
            img = self._load_image(record["file_name"])
        sem = record.get("sem_seg")
        if sem is None:
            sem = self._load_label(record["sem_seg_file_name"])
        sem = np.asarray(sem)
        if sem.ndim == 3:
            sem = sem[..., 0]

        # random scale then fixed-size crop/pad (the reference's
        # ResizeScale + FixedSizeCrop pair); label pads with ignore_label
        S = self.image_size
        H, W = sem.shape
        s = self.rng.uniform(*self.scale_range) * S / max(H, W)
        nh, nw = max(1, int(round(H * s))), max(1, int(round(W * s)))
        from cullavo_tpu.data.transforms import resize

        img_r = resize(img, nh, nw)
        yy = np.clip(((np.arange(nh) + 0.5) * H / nh), 0, H - 1).astype(np.int64)
        xx = np.clip(((np.arange(nw) + 0.5) * W / nw), 0, W - 1).astype(np.int64)
        sem_r = sem[yy][:, xx]                    # nearest label resize
        oy = int(self.rng.integers(0, max(nh - S, 0) + 1))
        ox = int(self.rng.integers(0, max(nw - S, 0) + 1))
        canvas = np.full((S, S, 3), 128, img.dtype)
        sem_c = np.full((S, S), self.ignore_label, sem.dtype)
        ch, cw = min(S, nh - oy), min(S, nw - ox)
        canvas[:ch, :cw] = img_r[oy:oy + ch, ox:ox + cw]
        sem_c[:ch, :cw] = sem_r[oy:oy + ch, ox:ox + cw]
        if self.rng.random() < self.flip_prob:
            canvas = canvas[:, ::-1].copy()
            sem_c = sem_c[:, ::-1].copy()

        classes = np.unique(sem_c)
        classes = classes[classes != self.ignore_label]
        if classes.size == 0:
            return None
        masks, boxes = [], []
        for cid in classes:
            m = sem_c == cid
            ys, xs = np.nonzero(m)
            boxes.append([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1])
            masks.append(m)
        return {
            "image": canvas,
            "image_id": record.get("image_id"),
            "classes": classes.astype(np.int32),
            "boxes": np.asarray(boxes, np.float32),
            "is_thing": np.zeros(len(classes), bool),
            "masks": np.stack(masks).astype(np.float32),
        }


class InstanceTrainMapper:
    """record {"file_name"|"image", "height", "width", "annotations":
    [{"bbox" xywh, "segmentation" polygons|RLE, "category_id", "iscrowd"}]}
    → LSJ-augmented instance training targets
    (coco_instance_new_baseline_dataset_mapper.py: LSJ + flip, crowd filter,
    empty-mask filter)."""

    def __init__(self, image_size: int = 512, scale_range=(0.1, 2.0),
                 flip_prob: float = 0.5, load_image=None, seed: int = 0):
        self.image_size = image_size
        self.scale_range = scale_range
        self.flip_prob = flip_prob
        self._load_image = load_image or _load_rgb
        self.rng = np.random.default_rng(seed)

    def __call__(self, record: dict) -> Optional[dict]:
        from cullavo_tpu.data.datasets import polygons_to_mask

        img = record.get("image")
        if img is None:
            img = self._load_image(record["file_name"])
        H = record.get("height", img.shape[0])
        W = record.get("width", img.shape[1])

        classes, masks, boxes = [], [], []
        for ann in record.get("annotations", []):
            if ann.get("iscrowd", 0):
                continue
            seg = ann.get("segmentation")
            if seg is None:
                continue
            m = polygons_to_mask(seg, H, W).astype(bool)
            if not m.any():
                continue
            x, y, w, h = ann["bbox"]
            classes.append(ann["category_id"])
            boxes.append([x, y, x + w, y + h])
            masks.append(m)
        if not classes:
            return None

        rec = {"image": img,
               "boxes": np.asarray(boxes, np.float32),
               "masks": np.stack(masks).astype(np.float32)}
        rec = random_flip(rec, self.rng, self.flip_prob)
        rec = large_scale_jitter(rec, self.rng, out_size=self.image_size,
                                 scale_min=self.scale_range[0],
                                 scale_max=self.scale_range[1])
        keep = rec["masks"].reshape(len(classes), -1).sum(-1) > 0
        if not keep.any():
            return None
        return {
            "image": rec["image"],
            "image_id": record.get("image_id"),
            "classes": np.asarray(classes, np.int32)[keep],
            "boxes": rec["boxes"][keep],
            "is_thing": np.ones(int(keep.sum()), bool),
            "masks": rec["masks"][keep],
        }
