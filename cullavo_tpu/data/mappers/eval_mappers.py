"""Eval-time mappers: registered dataset records → pipeline eval rows.

The reference builds these per-dataset inside ``build_eval_dataloader``
(datasets/build.py:319-351) with detectron2 mappers
(datasets/dataset_mappers/*); here they are plain callables producing the
row dicts the eval pipelines consume:

  * :class:`SemSegEvalMapper`     → ``XDecoderPipeline`` semantic rows
  * :class:`PanopticEvalMapper`   → rows with panoptic + instance GT so PQ
    and mask AP are computed (panoptic_evaluation.py / instance_evaluation.py)
  * :class:`RefCOCOEvalMapper`    → ``RefCOCOPipeline`` grounding rows
    (refcoco_dataset_mapper.py)
  * :class:`VQAEvalMapper`        → ``VQAPipeline`` rows
    (vqa_dataset_mapper.py:101-122)
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from cullavo_tpu.data.coco_panoptic import rgb2id
from cullavo_tpu.models.xdecoder.model import PIXEL_MEAN, PIXEL_STD


def load_image_rgb(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def load_mask_png(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im)


def normalize_np(img: np.ndarray) -> np.ndarray:
    """uint8 [H, W, 3] → X-Decoder-normalized float32 (model.normalize_images
    on host)."""
    mean = np.asarray(PIXEL_MEAN, np.float32)
    std = np.asarray(PIXEL_STD, np.float32)
    return (img.astype(np.float32) - mean) / std


class SemSegEvalMapper:
    """{"file_name", "sem_seg_file_name"} → {"image" (normalized),
    "sem_seg", "image_id"}."""

    def __init__(self, load_image=load_image_rgb, load_mask=load_mask_png):
        self.load_image = load_image
        self.load_mask = load_mask

    def __call__(self, record: dict) -> dict:
        img = record.get("image")
        if img is None:
            img = self.load_image(record["file_name"])
        sem = record.get("sem_seg")
        if sem is None:
            sem = self.load_mask(record["sem_seg_file_name"])
        return {"image": normalize_np(np.asarray(img)),
                "sem_seg": np.asarray(sem).astype(np.int64),
                "image_id": record.get("image_id", record.get("file_name"))}


class PanopticEvalMapper:
    """COCO-panoptic record (load_coco_panoptic_json format) → eval row with
    semantic + panoptic + instance ground truth:

      image       normalized float [H, W, 3]
      sem_seg     [H, W] category ids (255 = ignore)
      pan_seg_gt  [H, W] segment-id map (0 = void)
      segments_gt [{"id", "category_id", "isthing"}]
      instances_gt {"masks" [M, H, W] bool, "classes" [M]} (things only)
    """

    def __init__(self, ignore_label: int = 255, load_image=load_image_rgb):
        self.ignore = ignore_label
        self.load_image = load_image

    def __call__(self, record: dict) -> dict:
        img = record.get("image")
        if img is None:
            img = self.load_image(record["file_name"])
        pan = record.get("pan_seg")
        if pan is None:
            pan = self.load_image(record["pan_seg_file_name"])
        seg_ids = rgb2id(np.asarray(pan))

        H, W = seg_ids.shape
        sem = np.full((H, W), self.ignore, np.int64)
        pan_gt = np.zeros((H, W), np.int32)
        segments_gt = []
        inst_masks, inst_classes = [], []
        next_id = 0
        for seg in record["segments_info"]:
            m = seg_ids == seg["id"]
            if not m.any() or seg.get("iscrowd", 0):
                continue
            next_id += 1
            cat = int(seg["category_id"])
            sem[m] = cat
            pan_gt[m] = next_id
            segments_gt.append({"id": next_id, "category_id": cat,
                                "isthing": bool(seg.get("isthing", True))})
            if seg.get("isthing", True):
                inst_masks.append(m)
                inst_classes.append(cat)
        row = {"image": normalize_np(np.asarray(img)),
               "sem_seg": sem,
               "pan_seg_gt": pan_gt,
               "segments_gt": segments_gt,
               "image_id": record.get("image_id")}
        if inst_masks:
            row["instances_gt"] = {"masks": np.stack(inst_masks),
                                   "classes": np.asarray(inst_classes, np.int64)}
        return row


class RefCOCOEvalMapper:
    """load_refcoco record → {"image" (normalized), "text", "gt_mask",
    "category"} (refcoco_dataset_mapper.py semantics: polygon/RLE → mask)."""

    def __init__(self, load_image=load_image_rgb):
        self.load_image = load_image

    def __call__(self, record: dict) -> dict:
        from cullavo_tpu.data.datasets import polygons_to_mask, rle_to_mask

        img = record.get("image")
        if img is None:
            img = self.load_image(record["file_name"])
        gt = record.get("gt_mask")
        if gt is None:
            seg = record["segmentation"]
            if isinstance(seg, dict):
                gt = rle_to_mask(seg)
            else:
                gt = polygons_to_mask(seg, record["height"], record["width"])
        return {"image": normalize_np(np.asarray(img)),
                "text": record["text"],
                "gt_mask": np.asarray(gt),
                "category": record.get("category_id"),
                "image_id": record.get("image_id")}


class VQAEvalMapper:
    """load_vqa record → VQAPipeline row: CLIP-preprocessed pixel_values +
    question/answers passthrough (vqa_dataset_mapper.py:101-122)."""

    def __init__(self, image_size: Optional[int] = None,
                 load_image=load_image_rgb):
        self.image_size = image_size
        self.load_image = load_image

    def __call__(self, record: dict) -> dict:
        from cullavo_tpu.data.image_processing import CLIP_SIZE, preprocess_numpy

        img = record.get("image")
        if img is None:
            img = self.load_image(record["file_name"])
        size = self.image_size or CLIP_SIZE
        pix = preprocess_numpy([np.asarray(img)], size=size)[0]
        return {"question_id": record["question_id"],
                "question": record["question"],
                "pixel_values": pix,
                "answers": record.get("answers"),
                "question_type": record.get("question_type"),
                "answer_type": record.get("answer_type")}
