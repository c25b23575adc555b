"""Step-2 instruction-tuning data: ShareGPT4V / lbkllava conversation rows.

Capability parity with the reference's step2 path:
  * dataset registration/filtering — register_lbkllava_datasets.py:34-69
    (keep rows whose image exists; optional box annotations pass through),
  * conversation → prompt/label assembly with optional box-color augmentation
    — arch_cullavo.py:393-543 ``step2_process`` (multi-turn "USER:/ASSISTANT:"
    concat, labels masked over prompts, zero-image placeholder for text-only
    rows at :507),
run in the input pipeline (host), not inside model.forward.
"""
from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np

from cullavo_tpu.data.step1_synthesis import IGNORE_INDEX, PromptBuilder
from cullavo_tpu.data.text_format import COLOR_LIST, boxes2string, classes2string, draw_boxes
from cullavo_tpu.data.tokenizer import Tokenizer


def load_conversation_json(json_file: str, image_root: Optional[str] = None,
                           require_image: bool = False) -> list:
    """Rows: {"image": relpath|None, "conversations":
    [{"from": "human"|"gpt", "value": str}, ...], optional "boxes"/"classes"}.
    Filters rows with missing image files like the lbkllava registration."""
    with open(json_file) as f:
        rows = json.load(f)
    out = []
    for row in rows:
        img = row.get("image")
        if img and image_root:
            path = os.path.join(image_root, img)
            if not os.path.exists(path):
                continue
            row = {**row, "image_path": path}
        elif require_image and not img:
            continue
        out.append(row)
    return out


def synthesize_step2(
    record: dict,
    tokenizer: Tokenizer,
    rng: np.random.Generator,
    image: Optional[np.ndarray] = None,
    image_size: int = 336,
    box_color_augment: bool = True,
) -> dict:
    """One conversation row → (image, ids, labels).

    Multi-turn human/gpt pairs become USER/ASSISTANT turns; when the row has
    box annotations and the dice comes up, boxes are drawn on the image and a
    box-description turn is appended (the step2 color augmentation,
    arch_cullavo.py:437-505).  Text-only rows get a zero image (:507).
    """
    turns = record["conversations"]
    b = PromptBuilder(tokenizer).start()

    pairs = []
    for i in range(0, len(turns) - 1, 2):
        human, gpt = turns[i], turns[i + 1]
        if human.get("from") != "human" or gpt.get("from") != "gpt":
            continue
        q = human["value"].replace("<image>", "").strip()
        pairs.append((q, gpt["value"].strip()))

    img = image
    if img is None:
        img = np.zeros((image_size, image_size, 3), np.uint8)  # text-only rows
    boxes = record.get("boxes")
    if boxes is not None and box_color_augment and len(boxes) > 0 \
            and int(rng.integers(2)) == 0:
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        H, W = img.shape[:2]
        abs_boxes = boxes * np.asarray([W, H, W, H], np.float32)
        colors = COLOR_LIST[:len(boxes)]
        img = draw_boxes(img, abs_boxes, colors)
        classes = record.get("classes", ["object"] * len(boxes))
        pairs.append((
            "provide multiple object names with their numbering index and the "
            "objects' bounding box coordinates in the image.",
            f"Sure, it is {classes2string(classes)} at {boxes2string(boxes)}."))

    for q, a in pairs:
        b.add_turn(q, a)
    ids, labels = b.finish()
    return {"image": img, "input_ids": ids, "labels": labels}


def iter_step2_batches(rows: Sequence[dict], tokenizer: Tokenizer,
                       num_image_tokens: int, batch_size: int,
                       rng: np.random.Generator, image_loader=None,
                       image_size: int = 336, pad_to: Optional[int] = None):
    """Shuffled batches through the step-1 collate (shared padding logic)."""
    from cullavo_tpu.data.step1_synthesis import collate_step1

    order = rng.permutation(len(rows))
    for i in range(0, len(order) - batch_size + 1, batch_size):
        samples = []
        for j in order[i:i + batch_size]:
            row = rows[j]
            img = None
            if image_loader and row.get("image_path"):
                img = image_loader(row["image_path"])
            samples.append(synthesize_step2(row, tokenizer, rng, img,
                                            image_size=image_size))
        yield collate_step1(samples, tokenizer, num_image_tokens,
                            pad_to=pad_to, image_size=image_size)
