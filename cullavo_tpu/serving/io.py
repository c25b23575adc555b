"""Request wire-format helpers shared by the ``serve`` CLI (JSONL batch
mode) and the HTTP front-end (serving/server.py).

A request row is a plain dict:

    {"id": int, "prompt": str | "input_ids": [int, ...],
     "image": path(.npy [3,H,W] f32 | image file) | null,
     "max_new_tokens": int}

``request_from_row`` turns it into a ``serving.Request`` with the engine's
prompt contract: when an image is given, the prompt must carry either one
``<image>`` placeholder token (expanded here into the full image-token run,
data/step1_synthesis.py::expand_image_token) or the already-expanded run.
"""
from __future__ import annotations

import numpy as np

from cullavo_tpu.serving.engine import Request

__all__ = ["load_pixels", "request_from_row"]


def load_pixels(path: str, image_size: int) -> np.ndarray:
    """``.npy`` → as-is; anything else → PIL decode + CLIP preprocessing."""
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    from PIL import Image

    from cullavo_tpu.data.image_processing import preprocess_numpy

    im = np.asarray(Image.open(path).convert("RGB"))
    return preprocess_numpy([im], size=image_size)[0]


def request_from_row(row: dict, model_cfg, tokenizer) -> Request:
    """One JSON row → Request (shared by CLI serve + HTTP /generate)."""
    from cullavo_tpu.models.llava.modeling import expand_image_token

    n_img = model_cfg.num_image_tokens
    if "input_ids" in row:
        ids = np.asarray(row["input_ids"], np.int32)
    elif "prompt" in row:
        if tokenizer is None:
            raise ValueError(
                f"request {row.get('id')}: 'prompt' given but no tokenizer "
                "is configured (weights-only snapshot) — send 'input_ids'")
        ids = np.asarray(tokenizer.encode(row["prompt"]), np.int32)
    else:
        raise ValueError(
            f"request {row.get('id')}: needs 'input_ids' or 'prompt'")
    if ids.ndim != 1 or ids.size == 0:
        raise ValueError(f"request {row.get('id')}: input_ids must be a "
                         "non-empty 1-D token list")
    pix = None
    if row.get("image") is not None:
        img = row["image"]
        if isinstance(img, str):
            pix = load_pixels(img, model_cfg.vision.image_size)
        else:                       # inline nested list [3, H, W]
            pix = np.asarray(img, np.float32)
        if pix.shape != (3, model_cfg.vision.image_size,
                         model_cfg.vision.image_size):
            raise ValueError(
                f"request {row.get('id')}: image shape {pix.shape} != "
                f"(3, {model_cfg.vision.image_size}, "
                f"{model_cfg.vision.image_size})")
    if pix is not None:
        c = int(np.sum(ids == model_cfg.image_token_id))
        if c == 1:
            # expand the single <image> placeholder into the image run
            ids, _, _ = expand_image_token(
                ids, np.ones_like(ids), np.zeros_like(ids),
                model_cfg.image_token_id, n_img)
            ids = np.asarray(ids, np.int32)
        elif c != n_img:
            # silently decoding from unmerged text embeddings would return
            # garbage with no signal — fail loudly instead
            raise ValueError(
                f"request {row.get('id')}: image given but the prompt "
                f"holds {c} image tokens (expected 1 placeholder or the "
                f"expanded {n_img}-token run); check the tokenizer maps "
                "<image> to the image token id")
    return Request(req_id=row["id"], input_ids=ids, pixel_values=pix,
                   max_new_tokens=int(row.get("max_new_tokens", 32)),
                   adapter_id=int(row.get("adapter_id", 0)))
