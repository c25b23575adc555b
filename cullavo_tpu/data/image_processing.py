"""CLIP image preprocessing (LLaVA-1.5 front-end), jit-able and batched.

Reproduces HF ``CLIPImageProcessor`` semantics for llava-1.5: resize shortest
edge to 336 (bicubic), center-crop 336x336, rescale 1/255, normalize with the
CLIP mean/std.  The reference runs this per-sample on host inside the HF
processor (cullavo/arch_cullavo.py:316-321); here it is a batched XLA program
(and the resize+normalize+patchify chain fuses into the vision tower's first
matmul on TPU).

``preprocess_uint8`` is the device path: [B, H, W, 3] uint8 → [B, 3, 336, 336]
float.  ``preprocess_numpy`` is the host path for ragged input sizes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
CLIP_SIZE = 336


def _resize_shortest_then_crop(img: jax.Array, size: int) -> jax.Array:
    """[H, W, 3] float → [size, size, 3]; shortest-edge resize + center crop.

    Shapes must be static under jit; this helper is trace-time specialized to
    the input's (H, W).
    """
    H, W = img.shape[0], img.shape[1]
    if H <= W:
        new_h, new_w = size, max(size, int(round(W * size / H)))
    else:
        new_h, new_w = max(size, int(round(H * size / W))), size
    img = jax.image.resize(img, (new_h, new_w, 3), method="bicubic", antialias=True)
    top = (new_h - size) // 2
    left = (new_w - size) // 2
    return jax.lax.dynamic_slice(img, (top, left, 0), (size, size, 3))


@functools.partial(jax.jit, static_argnames=("size",))
def preprocess_uint8(images: jax.Array, size: int = CLIP_SIZE) -> jax.Array:
    """[B, H, W, 3] uint8 RGB → [B, 3, size, size] float32, CLIP-normalized."""
    x = images.astype(jnp.float32) / 255.0
    x = jax.vmap(lambda im: _resize_shortest_then_crop(im, size))(x)
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)
    x = (x - mean) / std
    return x.transpose(0, 3, 1, 2)


def preprocess_numpy(images: list[np.ndarray], size: int = CLIP_SIZE,
                     use_native: bool = True) -> np.ndarray:
    """Host path for ragged image sizes: list of [H, W, 3] uint8 → stacked
    [B, 3, size, size] float32.

    Uses the multithreaded C++ core (cullavo_tpu/native) when available;
    falls back to the jax.image path otherwise.
    """
    if use_native:
        try:
            from cullavo_tpu import native

            if native.available():
                fixed = []
                for im in images:
                    if im.ndim == 2:
                        im = np.stack([im] * 3, axis=-1)
                    if im.shape[-1] == 4:
                        im = im[..., :3]
                    fixed.append(im)
                return native.preprocess_batch(fixed, size=size,
                                               mean=CLIP_MEAN, std=CLIP_STD)
        except Exception:
            pass
    out = []
    for im in images:
        if im.ndim == 2:
            im = np.stack([im] * 3, axis=-1)
        if im.shape[-1] == 4:
            im = im[..., :3]
        x = jnp.asarray(im, jnp.float32) / 255.0
        x = _resize_shortest_then_crop(x, size)
        out.append(np.asarray(x))
    batch = np.stack(out)
    mean = np.asarray(CLIP_MEAN, np.float32)
    std = np.asarray(CLIP_STD, np.float32)
    batch = (batch - mean) / std
    return batch.transpose(0, 3, 1, 2)


def pad_to_divisible(images: "list[np.ndarray]", divisor: int = 32):
    """Batch ragged [H, W, C] images padded to a shared divisible size —
    detectron2 ImageList.from_tensors(size_divisibility=32) semantics
    (used by the seg eval path, xdecoder_model.py:437-440).
    Returns (batch [B, Hp, Wp, C], sizes [(H, W)])."""
    sizes = [(im.shape[0], im.shape[1]) for im in images]
    Hm = max(h for h, _ in sizes)
    Wm = max(w for _, w in sizes)
    Hp = -(-Hm // divisor) * divisor
    Wp = -(-Wm // divisor) * divisor
    C = images[0].shape[2]
    out = np.zeros((len(images), Hp, Wp, C), images[0].dtype)
    for i, im in enumerate(images):
        out[i, :im.shape[0], :im.shape[1]] = im
    return out, sizes


def sem_seg_postprocess(logits, padded_size, image_size, out_size):
    """Crop the valid region out of the padded prediction and resize to the
    original resolution (modeling/modules/postprocessing.py:9-38 semantics).
    logits: [C, Hp, Wp] → [C, out_h, out_w]."""
    import jax

    h, w = image_size
    cropped = logits[:, :h, :w]
    return jax.image.resize(cropped, (logits.shape[0], *out_size), method="bilinear")
