"""Independent pure-python/numpy oracle for bitsandbytes NF4 quantization.

Authored from the bnb ALGORITHM (the public quantize_4bit/dequantize_4bit
semantics used by the reference's Q-LoRA loader,
cullavo/load_cullavo.py:65-83: ``bnb_4bit_quant_type="nf4"``,
``bnb_4bit_use_double_quant=True``), NOT from ``ops/nf4.py`` — so the two
can cross-check each other in-environment while the real-bnb golden fixture
remains blocked (no CUDA/bitsandbytes here; see
tests/fixtures/make_nf4_golden.py for the command that produces it).

The algorithm:

1. Flatten the tensor; split into 64-value blocks.
2. Per block: absmax, normalize to [-1, 1], bin each value to the NEAREST of
   the 16 fixed NF4 codebook entries (the information-theoretically optimal
   4-bit normal-float code of the QLoRA paper; bnb's ``dQuantizeNF4`` is a
   comparison tree against the midpoints of adjacent entries, equal-to-
   midpoint goes to the LOWER code).
3. Pack two 4-bit codes per byte, FIRST value in the HIGH nibble.
4. Double quantization ("compress_statistics"): the fp32 absmax array is
   itself quantized — subtract its mean (the ``offset``), then
   ``quantize_blockwise`` with blocksize 256 using bnb's DYNAMIC 8-bit map
   (``create_dynamic_map(signed=True)`` — a sign + 7-exponent-level
   non-uniform code, NOT linear int8): per-256-block absmax normalize and
   bin to the nearest of the 256 dynamic-map entries (uint8 index).
5. Dequantize: absmax = dyn_map[idx] * per-block-absmax + offset;
   value = NF4_CODE[code] * absmax.
"""
from __future__ import annotations

import numpy as np

# the 16 NF4 codebook entries (QLoRA paper, public constants)
NF4_CODE = np.array([
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0,
], dtype=np.float32)

BLOCK = 64
ABSMAX_BLOCK = 256


def create_dynamic_map(signed: bool = True, max_exponent_bits: int = 7,
                       total_bits: int = 8) -> np.ndarray:
    """bnb's dynamic 8-bit quantization map (sorted, 2**total_bits entries).

    Dynamic tree quantization: one sign bit, a unary exponent indicator, and
    the remaining bits as a linear fraction in [0.1, 1) scaled by the decade
    10**(-(max_exponent_bits-1)+i).  Always contains 0 and ±(the fraction
    means of the largest decade, topped by exactly 1.0)."""
    data = []
    non_sign_bits = total_bits - 1
    additional_items = 2 ** (non_sign_bits - max_exponent_bits) - 1
    for i in range(max_exponent_bits):
        fraction_items = int(
            2 ** (i + non_sign_bits - max_exponent_bits) + 1 if signed
            else 2 ** (i + non_sign_bits - max_exponent_bits + 1) + 1)
        boundaries = np.linspace(0.1, 1, fraction_items)
        means = (boundaries[:-1] + boundaries[1:]) / 2.0
        data += ((10 ** (-(max_exponent_bits - 1) + i)) * means).tolist()
        if signed:
            data += (-(10 ** (-(max_exponent_bits - 1) + i)) * means).tolist()
    if additional_items > 0:
        boundaries = np.linspace(0.1, 1, additional_items + 1)
        means = (boundaries[:-1] + boundaries[1:]) / 2.0
        data += ((10 ** (-(max_exponent_bits - 1) + max_exponent_bits - 1))
                 * means).tolist()
        if signed:
            data += (-(10 ** (-(max_exponent_bits - 1) + max_exponent_bits - 1))
                     * means).tolist()
    data.append(0)
    data.append(1.0)
    assert len(data) == 2 ** total_bits, len(data)
    data.sort()
    return np.asarray(data, dtype=np.float32)


DYNAMIC_MAP = create_dynamic_map(signed=True)


def _nearest(code: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Index of the nearest entry of sorted ``code`` for each value
    (equal-distance ties resolve to the LOWER index, matching the
    strict-greater comparison trees of bnb's kernels)."""
    pos = np.searchsorted(code, values)
    pos = np.clip(pos, 1, len(code) - 1)
    lo, hi = code[pos - 1], code[pos]
    pick_hi = (values - lo) > (hi - values)
    return (pos - 1 + pick_hi.astype(np.int64)).astype(np.uint8)


def quantize_blockwise(a: np.ndarray, code: np.ndarray = DYNAMIC_MAP,
                       blocksize: int = ABSMAX_BLOCK):
    """bnb quantize_blockwise: per-block absmax normalize + nearest-code.
    Returns (uint8 idx [n], fp32 block absmax [ceil(n/blocksize)])."""
    n = a.shape[0]
    pad = (-n) % blocksize
    ap = np.pad(a.astype(np.float32), (0, pad)).reshape(-1, blocksize)
    absmax = np.max(np.abs(ap), axis=1)
    scale = np.where(absmax == 0, 1.0, absmax)
    normed = ap / scale[:, None]
    idx = _nearest(code, normed.reshape(-1)).reshape(ap.shape)
    return idx.reshape(-1)[:n], absmax.astype(np.float32)


def dequantize_blockwise(idx: np.ndarray, absmax: np.ndarray,
                         code: np.ndarray = DYNAMIC_MAP,
                         blocksize: int = ABSMAX_BLOCK) -> np.ndarray:
    n = idx.shape[0]
    pad = (-n) % blocksize
    vals = np.pad(code[idx.astype(np.int64)], (0, pad)).reshape(-1, blocksize)
    return (vals * absmax[:, None]).reshape(-1)[:n].astype(np.float32)


def quantize_4bit(x: np.ndarray, compress_statistics: bool = True) -> dict:
    """bnb quantize_4bit(quant_type="nf4") semantics.

    Returns a state dict:
      packed  uint8 [n/2]  — two codes per byte, first value HIGH nibble
      absmax  — fp32 [n/64] when compress_statistics=False, else uint8 codes
      absmax2 — fp32 per-256-block absmax of the centered absmax array
      offset  — fp32 scalar mean of the raw absmax array
    """
    flat = x.astype(np.float32).reshape(-1)
    assert flat.shape[0] % BLOCK == 0, flat.shape
    blocks = flat.reshape(-1, BLOCK)
    absmax = np.max(np.abs(blocks), axis=1).astype(np.float32)
    scale = np.where(absmax == 0, 1.0, absmax)
    normed = blocks / scale[:, None]
    codes = _nearest(NF4_CODE, normed.reshape(-1))
    packed = ((codes[0::2].astype(np.uint8) << 4)
              | codes[1::2].astype(np.uint8))
    state = {"packed": packed, "shape": x.shape}
    if not compress_statistics:
        state["absmax"] = absmax
        return state
    offset = np.float32(absmax.mean())
    centered = absmax - offset
    qidx, absmax2 = quantize_blockwise(centered)
    state.update({"absmax": qidx, "absmax2": absmax2, "offset": offset})
    return state


def dequantize_4bit(state: dict) -> np.ndarray:
    packed = state["packed"]
    codes = np.empty(packed.shape[0] * 2, np.uint8)
    codes[0::2] = packed >> 4
    codes[1::2] = packed & 0xF
    vals = NF4_CODE[codes.astype(np.int64)]
    if "offset" in state:
        absmax = dequantize_blockwise(state["absmax"], state["absmax2"]) \
            + state["offset"]
    else:
        absmax = state["absmax"]
    out = vals.reshape(-1, BLOCK) * absmax[:, None].astype(np.float32)
    return out.reshape(state["shape"]).astype(np.float32)
