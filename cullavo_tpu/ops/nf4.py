"""NF4 (NormalFloat-4) quantization — bitsandbytes-compatible semantics.

Replaces the external bitsandbytes dependency of the reference's Q-LoRA path
(cullavo/load_cullavo.py:65-83: nf4 storage, double quantization, bf16
compute) with TPU-native code:

  * ``quantize_nf4`` / ``dequantize_nf4`` — blockwise absmax NF4 with the
    QLoRA codebook (block 64), optional double quantization of the absmax
    scales (int8 blocks of 256 + fp32 per-block scale + global offset).
  * ``nf4_matmul`` — XLA path: codebook-gather dequant fused by XLA into the
    following matmul.
  * ``nf4_matmul_fused`` — Pallas kernel: dequantizes weight tiles in VMEM
    and feeds the MXU directly, so the weight stream stays 4-bit through HBM
    (the HBM-bandwidth win is the point of NF4 on TPU).

The NF4 codebook is the 16-entry normal-quantile grid from the QLoRA paper —
public constants, reproduced here for bit-faithful parity.
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NF4_CODE = np.array([
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0,
], dtype=np.float32)

# midpoints between adjacent codebook entries → nearest-value quantization
NF4_MIDPOINTS = (NF4_CODE[1:] + NF4_CODE[:-1]) / 2.0

BLOCK = 64          # values per absmax block (bnb nf4 default)
ABSMAX_BLOCK = 256  # absmax values per double-quant block

# bnb's double quantization ("compress_statistics") stores the absmax array
# through quantize_blockwise with the DYNAMIC 8-bit map — a sign +
# 7-exponent-level non-uniform code — NOT linear int8 (the independently
# authored ops/nf4_oracle.py implements the same algorithm from the bnb
# spec; the two cross-check in tests/test_ops.py)
from cullavo_tpu.ops.nf4_oracle import DYNAMIC_MAP  # noqa: E402

DYNAMIC_MIDPOINTS = (DYNAMIC_MAP[1:] + DYNAMIC_MAP[:-1]) / 2.0


@dataclasses.dataclass
class NF4Tensor:
    """Packed NF4 representation of a 2-D array (flattened blockwise)."""
    packed: jax.Array          # uint8 [n/2] — two 4-bit codes per byte (high nibble first)
    absmax: jax.Array          # fp32 [n/BLOCK], or uint8 dynamic-map codes
                               # when double-quantized (bnb quantize_blockwise)
    shape: tuple               # original shape
    dtype: object              # original dtype
    # double-quant fields (None when not double-quantized)
    absmax_scale: Optional[jax.Array] = None   # fp32 per-256-block absmax
    absmax_offset: Optional[jax.Array] = None  # fp32 scalar (mean of absmax)

    def tree_flatten(self):
        children = (self.packed, self.absmax, self.absmax_scale, self.absmax_offset)
        return children, (self.shape, self.dtype)

    @classmethod
    def tree_unflatten(cls, aux, children):
        packed, absmax, scale, offset = children
        return cls(packed, absmax, aux[0], aux[1], scale, offset)


jax.tree_util.register_pytree_node(
    NF4Tensor, NF4Tensor.tree_flatten, NF4Tensor.tree_unflatten)


def _encode_blockwise(x_flat: jax.Array):
    """fp32 [n] → (uint8 codes [n], fp32 absmax [n/BLOCK])."""
    n = x_flat.shape[0]
    assert n % BLOCK == 0, f"size {n} not a multiple of NF4 block {BLOCK}"
    blocks = x_flat.reshape(-1, BLOCK)
    absmax = jnp.max(jnp.abs(blocks), axis=1)
    scale = jnp.where(absmax == 0, 1.0, absmax)
    normed = blocks / scale[:, None]
    # nearest codebook entry via midpoint comparisons (bnb semantics).
    # 15 unrolled elementwise compares: the [n, BLOCK, 15] broadcast form is
    # ~20G elements at 7B scale and searchsorted's while-loop lowering both
    # crash the TPU AOT compiler; this form is flat elementwise code.
    codes = jnp.zeros(normed.shape, jnp.uint8)
    for m in NF4_MIDPOINTS.tolist():
        codes += (normed > m).astype(jnp.uint8)
    return codes.reshape(-1), absmax


def quantize_nf4(x: jax.Array, double_quant: bool = True) -> NF4Tensor:
    shape, dtype = x.shape, x.dtype
    x_flat = x.astype(jnp.float32).reshape(-1)
    codes, absmax = _encode_blockwise(x_flat)
    packed = (codes[0::2] << 4) | codes[1::2]

    if not double_quant:
        return NF4Tensor(packed, absmax, shape, dtype)

    # bnb double quant: offset = mean(absmax); quantize_blockwise of the
    # centered absmax with the dynamic 8-bit map over 256-blocks.  Nearest
    # dynamic-map entry via 255 unrolled midpoint compares (searchsorted's
    # while-loop lowering crashes the axon Mosaic helper; this form is flat
    # elementwise code, and the absmax array is only n/64 values)
    m = absmax.shape[0]
    pad = (-m) % ABSMAX_BLOCK
    offset = jnp.mean(absmax)
    centered = jnp.pad(absmax - offset, (0, pad))
    ab = centered.reshape(-1, ABSMAX_BLOCK)
    ab_absmax = jnp.max(jnp.abs(ab), axis=1)
    ab_scale = jnp.where(ab_absmax == 0, 1.0, ab_absmax)
    normed = ab / ab_scale[:, None]
    q = jnp.zeros(normed.shape, jnp.int32)
    for mp in DYNAMIC_MIDPOINTS.tolist():
        q += (normed > mp).astype(jnp.int32)
    return NF4Tensor(packed, q.reshape(-1)[:m].astype(jnp.uint8), shape, dtype,
                     absmax_scale=ab_scale, absmax_offset=offset)


def _decode_absmax(t: NF4Tensor) -> jax.Array:
    if t.absmax_scale is None:
        return t.absmax.astype(jnp.float32)
    m = t.absmax.shape[0]
    pad = (-m) % ABSMAX_BLOCK
    idx = jnp.pad(t.absmax.astype(jnp.int32), (0, pad)).reshape(-1, ABSMAX_BLOCK)
    ab = jnp.asarray(DYNAMIC_MAP)[idx] * t.absmax_scale[:, None]
    return ab.reshape(-1)[:m] + t.absmax_offset


def dequantize_nf4(t: NF4Tensor, dtype=None) -> jax.Array:
    """Packed NF4 → dense array of the original shape."""
    code = jnp.asarray(NF4_CODE)
    hi = (t.packed >> 4).astype(jnp.int32)
    lo = (t.packed & 0xF).astype(jnp.int32)
    idx = jnp.stack([hi, lo], axis=1).reshape(-1)
    vals = code[idx]
    absmax = _decode_absmax(t)
    vals = (vals.reshape(-1, BLOCK) * absmax[:, None]).reshape(t.shape)
    return vals.astype(dtype or t.dtype)


def nf4_matmul(x: jax.Array, w: NF4Tensor, dtype=None) -> jax.Array:
    """x @ dequant(w) — XLA fuses the gather+scale into the matmul input."""
    return x @ dequantize_nf4(w, dtype or x.dtype)


# ---------------------------------------------------------------------------
# fused Pallas dequant-matmul
# ---------------------------------------------------------------------------

def _codebook_lookup_chain(idx: jax.Array, dtype=jnp.float32) -> jax.Array:
    """16-way select chain: 15 eq + 15 select ≈ 30 VPU ops/weight."""
    vals = jnp.full(idx.shape, NF4_CODE[0], dtype)
    for i in range(1, 16):
        vals = jnp.where(idx == i, jnp.asarray(NF4_CODE[i], dtype), vals)
    return vals


def _codebook_lookup_mux(idx: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Binary mux-tree decode: 4 bit tests + 15 selects ≈ 19 VPU ops/weight
    (vs ~30 for the eq chain) — the conditions are the nibble's BITS, shared
    across tree levels, instead of 15 independent equality compares.
    This is the round-2 'arithmetic decode' lever (STATUS item 1)."""
    b0 = (idx & 1) != 0
    b1 = (idx & 2) != 0
    b2 = (idx & 4) != 0
    b3 = (idx & 8) != 0
    C = [jnp.asarray(v, dtype) for v in NF4_CODE]
    l1 = [jnp.where(b0, C[2 * i + 1], C[2 * i]) for i in range(8)]
    l2 = [jnp.where(b1, l1[2 * i + 1], l1[2 * i]) for i in range(4)]
    l3 = [jnp.where(b2, l2[2 * i + 1], l2[2 * i]) for i in range(2)]
    return jnp.where(b3, l3[1], l3[0])


def _codebook_lookup_lerp(idx: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """Arithmetic decode: the mux tree with each select A?B:A replaced by the
    exact-on-{0,1} lerp ``A + b*(B-A)`` — no boolean vectors at all, so the
    whole network runs at bf16 packing (2 lanes/register) without the i1
    relayout Mosaic rejects ("Invalid relayout ... vector<...xi1>" when a
    (8,128)-layout mask feeds a (16,128) bf16 select).

    NOT exact in bf16: the higher-level diffs round, leaving 1-2 ulp of
    drift on a few entries (measured max rel err 1.8% at entry 8) —
    tests/test_ops.py::test_nf4_decode_networks_agree bounds the drift.
    Opt-in EXPERIMENT (CULLAVO_NF4_DECODE=lerp_bf16), never the default,
    until an exact bf16 formulation exists; it also measured SLOWER than
    the sx kernel end-to-end (4.37 vs 8.34 img/s, STATUS.md)."""
    b0 = (idx & 1).astype(dtype)
    b1 = ((idx >> 1) & 1).astype(dtype)
    b2 = ((idx >> 2) & 1).astype(dtype)
    b3 = ((idx >> 3) & 1).astype(dtype)
    C = [jnp.asarray(v, dtype) for v in NF4_CODE]
    l1 = [C[2 * i] + b0 * (C[2 * i + 1] - C[2 * i]) for i in range(8)]
    l2 = [l1[2 * i] + b1 * (l1[2 * i + 1] - l1[2 * i]) for i in range(4)]
    l3 = [l2[2 * i] + b2 * (l2[2 * i + 1] - l2[2 * i]) for i in range(2)]
    return l3[0] + b3 * (l3[1] - l3[0])


def _codebook_lookup(idx: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Nibble → NF4 value; CULLAVO_NF4_DECODE selects the decode network
    (mux = default binary tree; chain = round-1 eq-select chain;
    lerp_bf16 = bf16 arithmetic tree)."""
    import os

    mode = os.environ.get("CULLAVO_NF4_DECODE", "mux")
    if mode == "chain":
        return _codebook_lookup_chain(idx, dtype)
    if mode.startswith("lerp"):
        return _codebook_lookup_lerp(idx, dtype)
    return _codebook_lookup_mux(idx, dtype)


def _nf4_matmul_kernel(x_ref, packed_ref, absmax_ref, o_ref, *, block_n: int,
                       k_dim: int):
    """Grid: (N // block_n,).  x [M, K] resident; weight tile dequantized in
    VMEM.  packed tile: [K, block_n/2] uint8 for columns j..j+block_n."""
    x = x_ref[:]
    packed = packed_ref[:]                      # [K, block_n // 2] uint8
    hi = (packed >> 4).astype(jnp.int32)
    lo = (packed & 0xF).astype(jnp.int32)
    idx = jnp.stack([hi, lo], axis=-1).reshape(k_dim, block_n)
    vals = _codebook_lookup(idx)                # [K, block_n] fp32
    absmax = absmax_ref[:].reshape(k_dim * block_n // BLOCK)
    vals = (vals.reshape(-1, BLOCK) * absmax[:, None]).reshape(k_dim, block_n)
    o_ref[:] = jnp.dot(x.astype(jnp.float32), vals,
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


def nf4_matmul_fused(x: jax.Array, w: NF4Tensor, block_n: int = 128) -> jax.Array:
    """Fused dequant-matmul.  ``w`` must be 2-D [K, N] (row-major blocks);
    absmax must be fp32 (call with double-quant pre-decoded for the hot path).
    """
    K, N = w.shape
    M = x.shape[0]
    assert x.shape[1] == K
    assert N % BLOCK == 0, f"N={N} must be a multiple of the NF4 block {BLOCK}"
    block_n = min(block_n, N)
    while N % block_n:
        block_n //= 2
    assert block_n % BLOCK == 0, (block_n, BLOCK)
    absmax = _decode_absmax(w)

    # layout: packed is flat over row-major [K, N]; a column tile j covers
    # interleaved bytes — repack to [K, N/2] bytes for clean tiling
    packed_2d = w.packed.reshape(K, N // 2)
    absmax_2d = absmax.reshape(K, N // BLOCK)

    kernel = functools.partial(_nf4_matmul_kernel, block_n=block_n, k_dim=K)
    out = pl.pallas_call(
        kernel,
        grid=(N // block_n,),
        in_specs=[
            pl.BlockSpec((M, K), lambda j: (0, 0)),
            pl.BlockSpec((K, block_n // 2), lambda j: (0, j)),
            pl.BlockSpec((K, block_n // BLOCK), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((M, block_n), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        interpret=jax.default_backend() == "cpu",
    )(x, packed_2d, absmax_2d)
    return out


def quantize_nf4_numpy_reference(x: np.ndarray):
    """Slow numpy oracle for tests: per-64-block absmax nearest-code quant."""
    flat = x.astype(np.float64).reshape(-1)
    blocks = flat.reshape(-1, BLOCK)
    absmax = np.max(np.abs(blocks), axis=1)
    scale = np.where(absmax == 0, 1.0, absmax)
    normed = blocks / scale[:, None]
    codes = np.array([[int(np.argmin(np.abs(NF4_CODE - v))) for v in row]
                      for row in normed], dtype=np.uint8)
    deq = NF4_CODE[codes] * absmax[:, None]
    return codes.reshape(-1), absmax, deq.reshape(x.shape)


# ---------------------------------------------------------------------------
# stacked-layer quantized linear (scan-friendly plain-dict representation)
# ---------------------------------------------------------------------------

def quantize_linear(w: jax.Array) -> dict:
    """[..., d_in, d_out] → {"q4": uint8 [..., d_in*d_out/2],
    "scale": fp32 [..., d_in*d_out/BLOCK]} — a plain dict so lax.scan can
    slice the leading (layer) axis; shape is re-supplied at matmul time."""
    *lead, d_in, d_out = w.shape
    flat = w.astype(jnp.float32).reshape((-1, d_in * d_out))

    def enc(row):
        codes, absmax = _encode_blockwise(row)
        packed = (codes[0::2] << 4) | codes[1::2]
        return packed, absmax

    packed, absmax = jax.vmap(enc)(flat)
    return {"q4": packed.reshape(tuple(lead) + (d_in * d_out // 2,)),
            "scale": absmax.reshape(tuple(lead) + (d_in * d_out // BLOCK,))}


def dequant_linear(q: dict, d_in: int, d_out: int, dtype=jnp.bfloat16) -> jax.Array:
    """Inverse of quantize_linear for ONE layer slice: q4 [n/2] → [d_in, d_out]."""
    code = jnp.asarray(NF4_CODE)
    hi = (q["q4"] >> 4).astype(jnp.int32)
    lo = (q["q4"] & 0xF).astype(jnp.int32)
    idx = jnp.stack([hi, lo], axis=-1).reshape(-1)
    vals = code[idx]
    vals = (vals.reshape(-1, BLOCK) * q["scale"].reshape(-1)[:, None])
    return vals.reshape(d_in, d_out).astype(dtype)


def nf4_linear(x: jax.Array, q: dict, d_in: int, d_out: int) -> jax.Array:
    """x @ dequant(q) — XLA fuses the codebook gather + scale into the
    matmul's weight feed; weights stream from HBM at 4.25 bits/param."""
    return x @ dequant_linear(q, d_in, d_out, x.dtype)


def is_quantized(w) -> bool:
    return isinstance(w, dict) and "q4" in w


# ---------------------------------------------------------------------------
# int8 per-channel quantization (the reference's load_in_8bit eval mode,
# pipeline/LLaVAVQAVALPipeline.py:94-102)
# ---------------------------------------------------------------------------

def quantize_linear_int8(w: jax.Array, layout: str = "kn",
                         outlier_idx=None, smooth_scale=None,
                         act_scale=None) -> dict:
    """[..., d_in, d_out] → {"q8": int8, "scale8": fp32 per output channel}.
    Per-out-channel absmax symmetric quantization (the reference's
    load_in_8bit eval mode, bitsandbytes Linear8bitLt).

    ``outlier_idx`` (static numpy int array, [mo]) — input channels whose
    activations are known (from calibration) to cross the LLM.int8 outlier
    threshold.  Their weight rows are zeroed in ``q8`` and stored separately:
      - ``o_w``  bf16 [mo, N]: the dequantized outlier rows (bnb dequantizes
        its int8 weight for the outlier product too — extract_outliers)
      - ``o_hot`` bf16 [K, mo]: one-hot column extractor so the runtime
        gathers x's outlier columns with a tiny matmul instead of a gather
      - ``o_mask`` bf16 [1, K]: zeros at outlier channels, to exclude them
        from the per-token activation quantization (LLM.int8 semantics)
    This makes the s8s8 prefill path (int8_linear_s8s8) pay ZERO dynamic
    cost for outlier decomposition — measured 14.06 vs 10.97 img/s at 7B
    for static vs per-call top_k outliers.

    ``smooth_scale`` (per-input-channel [K] positive array) — SmoothQuant
    scale migration: the weight is quantized as ``W' = diag(s) @ W`` and the
    reciprocal is stored (``sq_inv`` [1, K] bf16) so the runtime computes
    ``(x / s) @ W'`` — exact in fp, but the activation outlier channels are
    divided DOWN into quantizable range while the well-behaved weights
    absorb the scale.  Unlike the outlier decomposition this costs one
    fused elementwise multiply (zero epilogue traffic): measured 13.9 vs
    12.1 img/s at 7B for smooth vs static-outlier s8s8.  Calibrate
    ``s_k = amax_act_k**alpha / amax_w_k**(1-alpha)`` (SmoothQuant α≈0.5).
    Mutually exclusive with ``outlier_idx``.

    ``act_scale`` (requires ``smooth_scale``; scalar or [L] per stacked
    layer) — STATIC per-tensor activation scale for W8A8 serving
    (SmoothQuant's O3 config): the s8s8 runtime skips the per-token absmax
    reduction entirely and quantizes with this calibrated constant
    (``sa = max_k(act_absmax_k / s_k) / 127`` over the calibration set).
    Saves the VPU-bound per-token reduce (~0.6 ms per pass at 7B prefill,
    4 passes/layer) at the cost of clipping tokens that exceed the
    calibrated range — a serving-mode tradeoff, NOT bnb semantics.

    ``layout="nk"`` stores the quantized weight transposed ([..., d_out,
    d_in], key "q8t") so the dot contracts on the weight's MINOR dimension —
    an experimental decode-stream layout (see scripts/matmul_probe.py)."""
    if act_scale is not None and smooth_scale is None:
        raise ValueError("act_scale requires smooth_scale (static W8A8 is "
                         "only calibrated jointly with SmoothQuant migration)")
    if layout == "nk" and (smooth_scale is not None or outlier_idx is not None):
        # the nk path stores only {"q8t", "scale8"} — it has nowhere to put
        # sq_inv / o_w, so a calibrated nk dict would silently compute
        # x @ diag(s)W with no x/s correction (wrong by up to the clip range)
        raise ValueError("layout='nk' does not support smooth_scale/"
                         "outlier_idx calibration; use layout='kn'")
    if smooth_scale is not None:
        assert outlier_idx is None, "smooth_scale excludes outlier_idx"
        # [K] shared across stacked layers, or [..., K] per layer
        s = jnp.asarray(smooth_scale, jnp.float32)
        w = w.astype(jnp.float32) * s[..., :, None]
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    if layout == "nk":
        return {"q8t": jnp.swapaxes(q, -1, -2), "scale8": scale}
    if outlier_idx is not None and len(outlier_idx) > 0:
        import numpy as _np

        idx = _np.asarray(outlier_idx, _np.int32)
        K = w.shape[-2]
        jidx = jnp.asarray(idx)
        o_w = (jnp.take(q, jidx, axis=-2).astype(jnp.float32)
               * scale).astype(jnp.bfloat16)       # [..., mo, N]
        hot = _np.zeros((K, len(idx)), _np.float32)
        hot[idx, _np.arange(len(idx))] = 1.0
        mask = _np.ones((1, K), _np.float32)
        mask[0, idx] = 0.0
        q = jnp.moveaxis(jnp.moveaxis(q, -2, 0).at[jidx].set(0), 0, -2)
        lead = w.shape[:-2]                        # stacked layers, if any
        o_hot = jnp.broadcast_to(jnp.asarray(hot, jnp.bfloat16),
                                 lead + hot.shape)
        o_mask = jnp.broadcast_to(jnp.asarray(mask, jnp.bfloat16),
                                  lead + mask.shape)
        return {"q8": q, "scale8": scale,
                "o_w": o_w, "o_hot": o_hot, "o_mask": o_mask}
    if smooth_scale is not None:
        lead = w.shape[:-2]
        sq_inv = jnp.broadcast_to(
            (1.0 / s).astype(jnp.bfloat16)[..., None, :],
            lead + (1, w.shape[-2]))
        out = {"q8": q, "scale8": scale, "sq_inv": sq_inv}
        if act_scale is not None:
            # static W8A8: one f32 scale per (stacked) layer, shaped
            # lead + (1, 1) so the per-layer scan slice broadcasts over
            # [M, 1] exactly like the dynamic per-token sx.  act_scale may
            # be scalar OR [L]: append the (1, 1) axes to its own shape
            # first, then broadcast (a scalar reshaped to (L, 1, 1) raises)
            sa = jnp.asarray(act_scale, jnp.float32)
            sa = jnp.broadcast_to(sa.reshape(sa.shape + (1, 1)),
                                  lead + (1, 1))
            out["sa"] = sa
        return out
    return {"q8": q, "scale8": scale}


def int8_linear(x: jax.Array, q: dict) -> jax.Array:
    """x @ dequant(q8), scale applied per output channel AFTER the matmul.

    ``(x @ q8) * scale == x @ (q8 * scale)`` since the scale is constant per
    output column — but applying it after keeps the weight operand a pure
    int8→bf16 convert that XLA fuses into the dot's weight stream, where the
    pre-multiplied form materializes a full bf16 weight in HBM (3× decode
    weight traffic).  Also avoids bf16-rounding the dequantized weights."""
    if "sq_inv" in q:
        # SmoothQuant dicts store W' = diag(s) @ W; undo on the activation
        x = x * q["sq_inv"].reshape(1, -1).astype(x.dtype)
    if "q8t" in q:
        wt = q["q8t"].astype(x.dtype)                  # [N, K]
        y = jax.lax.dot_general(x, wt, (((x.ndim - 1,), (1,)), ((), ())))
    else:
        y = x @ q["q8"].astype(x.dtype)
    y = y * q["scale8"].reshape(1, -1).astype(x.dtype)
    if "o_w" in q:
        # static-outlier dicts zero the outlier rows out of q8; add their
        # exact (dequantized-row) product back regardless of x's dtype path
        y = y + ((x @ q["o_hot"].astype(x.dtype))
                 @ q["o_w"].astype(x.dtype))
    return y


def is_quantized_int8(w) -> bool:
    return isinstance(w, dict) and ("q8" in w or "q8t" in w)


def _nf4_linear_kernel(x_ref, q4_ref, scale_ref, o_ref, *, block_n: int, k_dim: int):
    """Fused dequant-matmul for the plain-dict layout: x [M, K] @ deq(q4).

    ``scale_ref`` holds the FULL [K, d_out/BLOCK] scale map (a narrow per-tile
    scale block would violate the (8, 128) VMEM tiling rule); the tile's
    columns are sliced inside."""
    x = x_ref[:]
    packed = q4_ref[:]                               # [K, block_n // 2]
    hi = (packed >> 4).astype(jnp.int32)
    lo = (packed & 0xF).astype(jnp.int32)
    idx = jnp.stack([hi, lo], axis=-1).reshape(k_dim, block_n)
    vals = _codebook_lookup(idx)
    j = pl.program_id(1)
    nsc = block_n // BLOCK
    scale = scale_ref[:, pl.ds(j * nsc, nsc)].reshape(k_dim * nsc)
    vals = (vals.reshape(-1, BLOCK) * scale[:, None]).reshape(k_dim, block_n)
    o_ref[:] = jnp.dot(x.astype(jnp.float32), vals,
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


def nf4_linear_pallas(x: jax.Array, q: dict, d_in: int, d_out: int,
                      block_n: int = 256, block_m: int = 256) -> jax.Array:
    """Pallas path for ``nf4_linear``: dequantize weight tiles in VMEM and
    feed the MXU — keeps the weight stream 4-bit through HBM and avoids the
    giant unpack/gather XLA graph (which crashes the TPU AOT compiler at 7B
    scale).  x: [..., d_in] (leading dims flattened; M padded to the tile)."""
    lead = x.shape[:-1]
    M = 1
    for s in lead:
        M *= s
    x2 = x.reshape(M, d_in)
    block_m = min(block_m, max(8, M))
    Mp = -(-M // block_m) * block_m
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    q4 = q["q4"].reshape(d_in, d_out // 2)
    scale = q["scale"].reshape(d_in, d_out // BLOCK).astype(jnp.float32)
    block_n = min(block_n, d_out)
    while d_out % block_n:
        block_n //= 2
    assert block_n % BLOCK == 0, (block_n, BLOCK)
    kernel = functools.partial(_nf4_linear_kernel, block_n=block_n, k_dim=d_in)
    out = pl.pallas_call(
        kernel,
        grid=(Mp // block_m, d_out // block_n),
        in_specs=[
            pl.BlockSpec((block_m, d_in), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, block_n // 2), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, d_out // BLOCK), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, d_out), x.dtype),
        interpret=jax.default_backend() == "cpu",
    )(x2, q4, scale)
    return out[:M].reshape(*lead, d_out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def nf4_linear_fused_vjp(x: jax.Array, q: dict, d_in: int, d_out: int):
    """Differentiable wrapper: Pallas fused forward; backward computes
    dx = dy @ W^T through the XLA dequant path (the base is frozen in Q-LoRA,
    so no weight gradient is produced)."""
    return nf4_linear_pallas(x, q, d_in, d_out)


def _nf4f_fwd(x, q, d_in, d_out):
    return nf4_linear_pallas(x, q, d_in, d_out), q


def _nf4f_bwd(d_in, d_out, q, dy):
    w = dequant_linear(q, d_in, d_out, dy.dtype)
    return (dy @ w.T, jax.tree.map(jnp.zeros_like, q))


nf4_linear_fused_vjp.defvjp(_nf4f_fwd, _nf4f_bwd)


# ---------------------------------------------------------------------------
# planar NF4: the TPU-compilable layout
# ---------------------------------------------------------------------------
# The flat byte-packed layout needs uint8 ops and lane-interleaving reshapes,
# both of which the Mosaic TPU compiler rejects.  The planar layout packs 8
# ROW-planes of 4-bit codes into one int32 word — plane i of word[k8, n] holds
# the code of element (i*K/8 + k8, n) — so dequantization is 8 shift-and-mask
# extractions of full contiguous [K/8, N] tiles with no reshuffle, and the
# matmul accumulates 8 contiguous row-block products.

def quantize_linear_planar(w: jax.Array) -> dict:
    """[..., d_in, d_out] → {"q4p": int32 [..., d_in/8, d_out],
    "scale": fp32 [..., d_in, d_out/BLOCK]} (row-plane permuted packing)."""
    *lead, d_in, d_out = w.shape
    assert d_in % 8 == 0 and d_out % BLOCK == 0, (d_in, d_out)
    flat = w.astype(jnp.float32).reshape((-1, d_in * d_out))

    def enc(row):
        codes, absmax = _encode_blockwise(row)
        codes = codes.reshape(d_in, d_out).astype(jnp.int32)
        k8 = d_in // 8
        words = jnp.zeros((k8, d_out), jnp.int32)
        for i in range(8):
            words = words | (codes[i * k8:(i + 1) * k8] << (4 * i))
        return words, absmax.reshape(d_in, d_out // BLOCK)

    words, scale = jax.vmap(enc)(flat)
    return {"q4p": words.reshape(tuple(lead) + (d_in // 8, d_out)),
            "scale": scale.reshape(tuple(lead) + (d_in, d_out // BLOCK))}


def dequant_linear_planar(q: dict, d_in: int, d_out: int, dtype=jnp.bfloat16):
    """Planar → dense [d_in, d_out] (XLA path; used by backward + tests)."""
    words = q["q4p"].reshape(d_in // 8, d_out)
    planes = [(words >> (4 * i)) & 0xF for i in range(8)]
    codes = jnp.concatenate(planes, axis=0)                      # [d_in, d_out]
    vals = jnp.asarray(NF4_CODE)[codes]
    scale = q["scale"].reshape(d_in, d_out // BLOCK)
    vals = vals.reshape(d_in, d_out // BLOCK, BLOCK) * scale[..., None]
    return vals.reshape(d_in, d_out).astype(dtype)


def is_quantized_planar(w) -> bool:
    return isinstance(w, dict) and "q4p" in w


def _nf4_planar_kernel(x_ref, w_ref, s_ref, o_ref, *, block_n: int, k_dim: int,
                       out_dtype):
    """s_ref: [8, K] — the transposed, sublane-padded scale rows for THIS
    N-block (rows 0..nsc-1 valid).  Dynamic-sublane reads and narrow dynamic
    lane slices both crash the axon Mosaic helper; per-block scale delivery
    through the BlockSpec + an in-kernel [8, K]→[K, 8] transpose avoids both.
    """
    import os

    k8 = k_dim // 8
    nsc = block_n // BLOCK
    bm = x_ref.shape[0]
    # CULLAVO_NF4_DECODE=lerp_bf16 runs the 16-way decode network on bf16
    # values (2 lanes/register) via the arithmetic lerp tree — boolean-mask
    # selects at bf16 layout crash Mosaic ("Invalid relayout ... xi1"), so
    # the scale expansion stays fp32 (native i1 layout) with one final cast.
    dt = (jnp.bfloat16 if os.environ.get("CULLAVO_NF4_DECODE", "mux")
          .endswith("bf16") else jnp.float32)
    st = s_ref[:].T                                              # [K, 8] fp32
    cbid = jax.lax.broadcasted_iota(jnp.int32, (k8, block_n), 1) // BLOCK
    cb_masks = [cbid == c for c in range(nsc)]   # hoisted out of the plane loop
    acc = jnp.zeros((bm, block_n), jnp.float32)
    for i in range(8):
        nib = (w_ref[:] >> (4 * i)) & 0xF                        # [K8, bn]
        vals = _codebook_lookup(nib, dt)
        st_i = st[i * k8:(i + 1) * k8, :]                        # [K8, 8]
        scale_exp = jnp.zeros((k8, block_n), jnp.float32)
        for c in range(nsc):
            scale_exp = jnp.where(cb_masks[c], st_i[:, c:c + 1], scale_exp)
        vals = (vals.astype(jnp.float32) * scale_exp).astype(jnp.bfloat16) \
            if dt == jnp.float32 else vals * scale_exp.astype(dt)
        acc += jnp.dot(x_ref[:, pl.ds(i * k8, k8)].astype(jnp.bfloat16), vals,
                       preferred_element_type=jnp.float32)
    o_ref[:] = acc.astype(out_dtype)


def _nf4_planar_sx_kernel(x_ref, w_ref, s_ref, o_ref, *, block_n: int,
                          k_dim: int, out_dtype):
    """Scale-on-x fused kernel: instead of select-expanding the per-64-block
    scales over the whole [k8, bn] weight tile (nsc lane-1 broadcast
    relayouts + nsc selects + 1 multiply PER WEIGHT), pre-scale the tiny x
    operand per scale chunk and run one [bm, k8] @ [k8, 64] dot per chunk:

        y[:, c] = (x_i * s[:, c]) @ vals[:, c]        (exact — s is per-k)

    Scale work drops from O(weights) to O(bm * k): ~45M ops -> ~0.5M per
    panel at decode M.  s_ref row c delivers scale column c along LANES, so
    the broadcast over bm rows is a cheap sublane replication (no transpose,
    no lane-1 broadcast).  Decode honors CULLAVO_NF4_DECODE: the default fp32
    mux tree, or lerp_bf16 — the boolean-free arithmetic tree at bf16 (2,1)
    register packing (2 lanes/op on the VPU), which only makes sense HERE
    because sx has no fp32 scale-expansion left to undo the packing."""
    k8 = k_dim // 8
    nsc = block_n // BLOCK
    bm = x_ref.shape[0]
    dt = (jnp.bfloat16 if os.environ.get("CULLAVO_NF4_DECODE", "mux")
          .endswith("bf16") else jnp.float32)
    acc = jnp.zeros((bm, block_n), jnp.float32)
    for i in range(8):
        nib = (w_ref[:] >> (4 * i)) & 0xF                        # [K8, bn]
        vals = _codebook_lookup(nib, dt).astype(jnp.bfloat16)
        xi = x_ref[:, pl.ds(i * k8, k8)].astype(jnp.float32)     # [bm, K8]
        cols = []
        for c in range(nsc):
            sc = s_ref[c:c + 1, pl.ds(i * k8, k8)]               # [1, K8]
            xs = (xi * sc).astype(jnp.bfloat16)
            cols.append(jnp.dot(xs, vals[:, c * BLOCK:(c + 1) * BLOCK],
                                preferred_element_type=jnp.float32))
        acc += jnp.concatenate(cols, axis=1)
    o_ref[:] = acc.astype(out_dtype)


def nf4_linear_planar(x: jax.Array, q: dict, d_in: int, d_out: int,
                      block_n: int = 256, block_m: int = 256,
                      force_bn: bool = False,
                      variant: Optional[str] = None) -> jax.Array:
    """Fused planar dequant-matmul (Mosaic-compilable at 7B scale).

    ``variant``: kernel inner-loop strategy — "sx" (scale-on-x chunk dots;
    default) or "scale_exp" (select-expanded scales); override with
    CULLAVO_NF4_KERNEL.  sx measured 7.31 vs 6.62 img/s end-to-end on the 7B
    NF4 bench (bench.py, batch 16) — the select-expansion's lane-1 broadcast
    relayouts were ~10% of the decode step.
    """
    if variant is None:
        variant = os.environ.get("CULLAVO_NF4_KERNEL", "sx")
    lead = x.shape[:-1]
    M = 1
    for s in lead:
        M *= s
    x2 = x.reshape(M, d_in)
    block_m = min(block_m if d_in <= 4096 else 128, max(8, M))
    Mp = -(-M // block_m) * block_m
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    words = q["q4p"].reshape(d_in // 8, d_out)
    scale = q["scale"].reshape(d_in, d_out // BLOCK).astype(jnp.float32)
    # large-K tiles (7B down-proj, d_in=11008) sit at the 16 MB scoped-VMEM
    # line at block_n=256 — halve the N tile there (decode is VPU-bound, so
    # tile size doesn't change throughput).  ``force_bn`` keeps the caller's
    # block_n (safe at decode-M where the x tile is small; see
    # scripts/nf4_decode_probe.py).  The sx kernel skips the clamp: without
    # the select-expanded scale plane it fits bn256 at d_in=11008.
    if d_in > 8192 and not force_bn and variant != "sx":
        block_n = min(block_n, 128)
    block_n = min(block_n, d_out)
    while d_out % block_n:
        block_n //= 2
    assert block_n % BLOCK == 0
    nsc = block_n // BLOCK
    assert nsc <= 8, (block_n, "scale rows are delivered sublane-padded to 8")
    nb = d_out // block_n
    # transposed, sublane-padded per-block scale rows: row 8j+c holds
    # scale[:, j*nsc + c]
    scale_t = scale.T.reshape(nb, nsc, d_in)
    scale_t = jnp.pad(scale_t, ((0, 0), (0, 8 - nsc), (0, 0))).reshape(nb * 8, d_in)
    kern_fn = _nf4_planar_sx_kernel if variant == "sx" else _nf4_planar_kernel
    kernel = functools.partial(kern_fn, block_n=block_n,
                               k_dim=d_in, out_dtype=x.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(Mp // block_m, d_out // block_n),
        in_specs=[
            pl.BlockSpec((block_m, d_in), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in // 8, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d_in), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, d_out), x.dtype),
        interpret=jax.default_backend() == "cpu",
    )(x2, words, scale_t)
    return out[:M].reshape(*lead, d_out)


def _nf4_dequant_kernel(w_ref, s_ref, o_ref, *, block_n: int, k_dim: int,
                        out_dtype):
    """Decode-only kernel: planar words [K/8, bn] + scale rows [8, K] →
    dense weight block [K, bn].  Plane i's rows land at the static sublane
    offset i*K/8 (static-offset writes are Mosaic-safe on axon; dynamic
    sublane indexing is not — see _nf4_planar_kernel)."""
    import os

    k8 = k_dim // 8
    nsc = block_n // BLOCK
    dt = (jnp.bfloat16 if os.environ.get("CULLAVO_NF4_DECODE", "mux")
          .endswith("bf16") else jnp.float32)
    st = s_ref[:].T                                              # [K, 8] fp32
    cbid = jax.lax.broadcasted_iota(jnp.int32, (k8, block_n), 1) // BLOCK
    cb_masks = [cbid == c for c in range(nsc)]   # hoisted out of the plane loop
    for i in range(8):
        nib = (w_ref[:] >> (4 * i)) & 0xF                        # [K8, bn]
        vals = _codebook_lookup(nib, dt)
        st_i = st[i * k8:(i + 1) * k8, :]                        # [K8, 8]
        scale_exp = jnp.zeros((k8, block_n), jnp.float32)
        for c in range(nsc):
            scale_exp = jnp.where(cb_masks[c], st_i[:, c:c + 1], scale_exp)
        if dt == jnp.float32:
            o_ref[i * k8:(i + 1) * k8, :] = (vals * scale_exp).astype(out_dtype)
        else:
            o_ref[i * k8:(i + 1) * k8, :] = (
                vals * scale_exp.astype(dt)).astype(out_dtype)


def nf4_dequant_planar_pallas(q: dict, d_in: int, d_out: int,
                              dtype=jnp.bfloat16, block_n: int = 256):
    """Planar NF4 → dense [d_in, d_out] via one Pallas decode pass.

    The fused kernel (nf4_linear_planar) re-decodes each weight tile once per
    M-tile, so at prefill shapes (M ≈ thousands) the VPU decode dominates the
    MXU matmul.  Decoding ONCE to bf16 and letting XLA run the matmul makes
    large-M NF4 matmul-bound; the fused kernel stays optimal for small-M
    (autoregressive decode), where it keeps the weight stream 4-bit in HBM."""
    words = q["q4p"].reshape(d_in // 8, d_out)
    scale = q["scale"].reshape(d_in, d_out // BLOCK).astype(jnp.float32)
    # scoped-VMEM budget: the [d_in, block_n] bf16 output block double-buffers;
    # keep it ≤ ~2 MB (the 7B down-proj d_in=11008 OOMs the 16 MB scoped VMEM
    # at block_n=256).  Floor 128: Mosaic requires full 128-lane blocks.
    block_n = min(block_n, max(128, (2 * 1024 * 1024 // (d_in * 2)) // 128 * 128))
    block_n = min(block_n, d_out)
    while d_out % block_n:
        block_n //= 2
    assert block_n % BLOCK == 0
    nsc = block_n // BLOCK
    assert nsc <= 8, (block_n, "scale rows are delivered sublane-padded to 8")
    nb = d_out // block_n
    scale_t = scale.T.reshape(nb, nsc, d_in)
    scale_t = jnp.pad(scale_t, ((0, 0), (0, 8 - nsc), (0, 0))).reshape(nb * 8, d_in)
    kernel = functools.partial(_nf4_dequant_kernel, block_n=block_n,
                               k_dim=d_in, out_dtype=dtype)
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((d_in // 8, block_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d_in), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d_in, block_n), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d_in, d_out), dtype),
        interpret=jax.default_backend() == "cpu",
    )(words, scale_t)


# M above this → decode-once + XLA matmul beats the fused kernel (the fused
# kernel re-decodes per M-tile).  Tunable for benchmarking.
_NF4_DEQ_M_THRESHOLD = int(__import__("os").environ.get("CULLAVO_NF4_DEQ_M", 512))


def s8s8_matmul_dynamic(x: jax.Array, w: jax.Array) -> jax.Array:
    """Per-call W8A8 matmul on the int8 MXU: per-out-channel weight quant +
    per-token activation quant + native s8s8 dot (int32 accumulate).

    The quantization passes are a few elementwise sweeps; the dot runs at
    the int8 MXU rate (2× bf16) — a win whenever the matmul is
    compute-bound (prefill M).  NOT bit-faithful to the bf16 product
    (~1%-relative); callers gate it behind explicit opt-ins."""
    wf = w.astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(wf), axis=0, keepdims=True),
                     1e-12) / 127.0                        # [1, N]
    wi = jnp.clip(jnp.round(wf / sw), -127, 127).astype(jnp.int8)
    K = x.shape[-1]
    lead = x.shape[:-1]
    x2 = x.reshape(-1, K).astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(x2), axis=-1, keepdims=True),
                     1e-12) / 127.0                        # [M, 1]
    xi = jnp.clip(jnp.round(x2 / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xi, wi, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * sx * sw).reshape(*lead, -1)


def nf4_linear_planar_auto(x: jax.Array, q: dict, d_in: int, d_out: int):
    """Pick fused (small M) vs decode-once+XLA-matmul (large M) by token count."""
    M = 1
    for s in x.shape[:-1]:
        M *= s
    if M >= _NF4_DEQ_M_THRESHOLD:
        w = nf4_dequant_planar_pallas(q, d_in, d_out, jnp.bfloat16)
        if (os.environ.get("CULLAVO_NF4_S8S8", "0") == "1"
                and jax.default_backend() == "tpu"):
            # opt-in W8A8 prefill for the NF4 storage mode: requantize the
            # decoded weights to int8 on the fly and run the int8 MXU.
            # DEVIATES from the reference's NF4 numerics (a second
            # quantization on top of NF4) — throughput experiments only.
            return s8s8_matmul_dynamic(x, w).astype(x.dtype)
        return (x.astype(jnp.bfloat16) @ w).astype(x.dtype)
    return nf4_linear_planar(x, q, d_in, d_out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def nf4_linear_planar_vjp(x: jax.Array, q: dict, d_in: int, d_out: int):
    return nf4_linear_planar_auto(x, q, d_in, d_out)


def _nf4p_fwd(x, q, d_in, d_out):
    return nf4_linear_planar_auto(x, q, d_in, d_out), q


def _nf4p_bwd(d_in, d_out, q, dy):
    # backward dx = dy @ W^T: decode once via the Pallas kernel on TPU (the
    # giant XLA unpack graph is slow and crashes the axon AOT helper at 7B);
    # XLA path elsewhere (CPU tests run the interpreter otherwise)
    if jax.default_backend() == "tpu":
        w = nf4_dequant_planar_pallas(q, d_in, d_out, jnp.bfloat16)
        return ((dy.astype(jnp.bfloat16) @ w.T).astype(dy.dtype),
                jax.tree.map(jnp.zeros_like, q))
    w = dequant_linear_planar(q, d_in, d_out, dy.dtype)
    return (dy @ w.T, jax.tree.map(jnp.zeros_like, q))


nf4_linear_planar_vjp.defvjp(_nf4p_fwd, _nf4p_bwd)


def quantize_linear_planar_numpy(w: "np.ndarray") -> dict:
    """Host-side planar NF4 quantization (numpy) — the production path:
    imported checkpoints live on host, and quantizing there avoids compiling
    a giant one-shot encode program through the TPU AOT helper."""
    w = np.asarray(w, np.float32)
    *lead, d_in, d_out = w.shape
    assert d_in % 8 == 0 and d_out % BLOCK == 0, (d_in, d_out)
    flat = w.reshape(-1, d_in * d_out)
    L = flat.shape[0]
    words_all = np.empty((L, d_in // 8, d_out), np.int32)
    scale_all = np.empty((L, d_in, d_out // BLOCK), np.float32)
    mids = NF4_MIDPOINTS.astype(np.float32)
    k8 = d_in // 8
    for l in range(L):
        blocks = flat[l].reshape(-1, BLOCK)
        absmax = np.abs(blocks).max(axis=1)
        scale = np.where(absmax == 0, 1.0, absmax)
        normed = blocks / scale[:, None]
        # threshold-count == searchsorted(mids, normed, 'left') but ~10x
        # faster on 45M-element tensors (searchsorted is scalar-looped)
        codes = np.zeros(normed.shape, np.int32)
        for m in mids:
            codes += (normed > m)
        codes = codes.reshape(d_in, d_out)
        words = np.zeros((k8, d_out), np.int32)
        for i in range(8):
            words |= codes[i * k8:(i + 1) * k8] << (4 * i)
        words_all[l] = words
        scale_all[l] = absmax.reshape(d_in, d_out // BLOCK)
    return {"q4p": words_all.reshape(tuple(lead) + (k8, d_out)),
            "scale": scale_all.reshape(tuple(lead) + (d_in, d_out // BLOCK))}


# ---------------------------------------------------------------------------
# fused int8 dequant-matmul (per-out-channel scale)
# ---------------------------------------------------------------------------
# XLA materializes ``q8.astype(bf16) * scale`` as a full bf16 weight in HBM
# before the matmul, tripling decode-phase weight traffic (int8 read + bf16
# write + bf16 read ≈ 26 ms/token measured at 7B vs ~8 ms for the int8
# stream alone).  This kernel keeps the weight int8 through HBM and converts
# tiles in VMEM.

def _int8_matmul_kernel(x_ref, w_ref, s_ref, o_ref):
    w = w_ref[:].astype(jnp.bfloat16) * s_ref[0:1, :].astype(jnp.bfloat16)
    o_ref[:] = jnp.dot(x_ref[:].astype(jnp.bfloat16), w,
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


def int8_linear_pallas(x: jax.Array, q: dict, block_n: int = 256,
                       block_m: int = 512) -> jax.Array:
    """x [..., K] @ dequant(q8 [K, N], scale8 [1, N]) with int8 HBM stream."""
    if "sq_inv" in q:
        x = x * q["sq_inv"].reshape(1, -1).astype(x.dtype)
    *lead_shape, d_in = x.shape
    d_out = q["q8"].shape[-1]
    M = 1
    for s in lead_shape:
        M *= s
    x2 = x.reshape(M, d_in)
    block_m = min(block_m if d_in <= 8192 else 128, max(8, M))
    Mp = -(-M // block_m) * block_m
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    block_n = min(block_n, d_out)
    while d_out % block_n:
        block_n //= 2
    w = q["q8"].reshape(d_in, d_out)
    scale = jnp.pad(q["scale8"].reshape(1, d_out).astype(jnp.float32),
                    ((0, 7), (0, 0)))                      # sublane-pad to 8
    out = pl.pallas_call(
        _int8_matmul_kernel,
        grid=(Mp // block_m, d_out // block_n),
        in_specs=[
            pl.BlockSpec((block_m, d_in), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, d_out), x.dtype),
        interpret=jax.default_backend() == "cpu",
    )(x2, w, scale)
    out = out[:M].reshape(*lead_shape, d_out)
    if "o_w" in q:
        # static-outlier dicts zero the outlier rows out of q8 (see
        # quantize_linear_int8); add their exact product outside the kernel
        out = out + ((x @ q["o_hot"].astype(x.dtype))
                     @ q["o_w"].astype(x.dtype))
    return out


@jax.custom_vjp
def int8_linear_fused_vjp(x: jax.Array, q: dict):
    return int8_linear_pallas(x, q)


def _int8f_fwd(x, q):
    return int8_linear_pallas(x, q), q


def _int8f_bwd(q, dy):
    # dx = dy @ (q8*scale)^T == (dy * scale) @ q8^T — scale is per column of
    # the forward weight, so fold it into dy and keep q8 an int8 stream
    dys = dy * q["scale8"].reshape(1, -1).astype(dy.dtype)
    dx = dys @ q["q8"].astype(dy.dtype).T
    if "sq_inv" in q:
        dx = dx * q["sq_inv"].reshape(1, -1).astype(dy.dtype)
    if "o_w" in q:
        # static-outlier dicts zero the outlier rows out of q8; route their
        # gradient through the stored dequantized rows
        dx = dx + ((dy @ q["o_w"].astype(dy.dtype).T)
                   @ q["o_hot"].astype(dy.dtype).T)
    return (dx, jax.tree.map(jnp.zeros_like, q))


int8_linear_fused_vjp.defvjp(_int8f_fwd, _int8f_bwd)


# M at or below this → fused Pallas kernel (weight stays int8 through HBM);
# above → XLA path (matmul is MXU-bound at prefill M, so the one-time bf16
# materialization is amortized).  Mirrors _NF4_DEQ_M_THRESHOLD.
_INT8_FUSED_M_THRESHOLD = int(__import__("os").environ.get("CULLAVO_INT8_FUSED_M", 64))


def _int8_linear_auto(x: jax.Array, q: dict) -> jax.Array:
    """Phase-aware dispatch: decode-sized M keeps the weight int8 in HBM via
    the Pallas kernel; prefill-sized M takes the XLA dense path."""
    M = 1
    for s in x.shape[:-1]:
        M *= s
    if M <= _INT8_FUSED_M_THRESHOLD and jax.default_backend() == "tpu":
        return int8_linear_pallas(x, q)
    return int8_linear(x, q)


@jax.custom_vjp
def int8_linear_auto_vjp(x: jax.Array, q: dict):
    return _int8_linear_auto(x, q)


def _int8a_fwd(x, q):
    return _int8_linear_auto(x, q), q


int8_linear_auto_vjp.defvjp(_int8a_fwd, _int8f_bwd)


# ---------------------------------------------------------------------------
# LLM.int8-style s8s8 matmul (native int8 MXU path for prefill)
# ---------------------------------------------------------------------------
# The reference's load_in_8bit eval mode runs bitsandbytes Linear8bitLt:
# per-row (token) int8 activation quantization, a native int8×int8 GEMM, and
# an fp16 side-matmul for "outlier" feature columns whose batch absmax
# exceeds a threshold (LLM.int8, threshold 6.0).  The convert-in-dot path
# above is *more* accurate (activations stay bf16) but runs the MXU at bf16
# rate; at prefill M the matmul is compute-bound and the int8 MXU path has
# 2× the MAC rate, so this is both closer to the reference's semantics and
# faster.  Static shapes: a fixed budget of ``max_outliers`` top-|x| columns
# is extracted (columns under the threshold inside that budget stay in the
# int8 operand and contribute zero to the fp16 part).

_S8S8_THRESHOLD = 6.0      # LLM.int8 outlier threshold (bnb default)
# static outlier-column budget (0 = plain per-token quant, no decomposition)
_S8S8_MAX_OUTLIERS = int(__import__("os").environ.get(
    "CULLAVO_S8S8_OUTLIERS", 64))


def _int8_s8s8_raw(x: jax.Array, q: dict,
                   threshold: float = _S8S8_THRESHOLD,
                   max_outliers: int = _S8S8_MAX_OUTLIERS) -> jax.Array:
    q8 = q["q8"]                                   # [K, N] int8
    s_col = q["scale8"].reshape(1, -1).astype(jnp.float32)   # [1, N]
    K = x.shape[-1]
    lead = x.shape[:-1]
    static_out = "o_w" in q

    if not (max_outliers > 0 and not static_out and "sq_inv" not in q):
        # hot path (smooth / static-outlier / plain): the per-linear
        # activation-quant chain was 31% of prefill device time as XLA
        # abs_reduce + round kLoop fusions (scripts/prefill_trace.py);
        # _s8s8_prequant replaces it with one fused Pallas VMEM pass at
        # prefill shapes.  bnb's own quantization is half-precision, so the
        # bf16 input domain is in-spec.  The quant + dot + epilogue is the
        # SAME numerics-critical chain as the grouped path — shared via
        # _s8s8_prequant/_s8s8_apply.
        xb = x.reshape(-1, K).astype(jnp.bfloat16)
        xi, sx = _s8s8_prequant(xb, q)
        y = _s8s8_apply(xi, sx, xb, q)
        return y.reshape(*lead, -1).astype(x.dtype)

    # dynamic LLM.int8 (bnb-exact reference mode): f32 math throughout
    x2 = x.reshape(-1, K).astype(jnp.float32)
    col_amax = jnp.max(jnp.abs(x2), axis=0)        # [K]
    oa, oidx = jax.lax.top_k(col_amax, max_outliers)
    is_out = oa >= threshold                       # [max_outliers]
    # zero outlier columns out of the int8 operand
    colmask = jnp.ones((K,), jnp.float32).at[oidx].set(
        jnp.where(is_out, 0.0, 1.0))
    x_in = x2 * colmask[None, :]
    sx = jnp.maximum(jnp.max(jnp.abs(x_in), axis=-1, keepdims=True),
                     1e-12) / 127.0                # [M, 1]
    xi = jnp.clip(jnp.round(x_in / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xi, q8, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * s_col       # [M, N]
    # fp side-matmul over the extracted columns against the SAME
    # int8-quantized weight rows (bnb dequantizes its int8 weight for
    # the outlier product too — weight precision is still 8-bit)
    w_out = q8[oidx, :].astype(jnp.float32) * s_col          # [mo, N]
    x_out = x2[:, oidx] * is_out[None, :].astype(jnp.float32)
    y = y + x_out @ w_out
    return y.reshape(*lead, -1).astype(x.dtype)


@jax.custom_vjp
def int8_linear_s8s8(x: jax.Array, q: dict):
    """LLM.int8-semantics forward; exact convert-in-dot backward (the
    backward matmuls are themselves large-M, but gradient fidelity matters
    more than the 2× there — and Q-LoRA never differentiates w.r.t. q)."""
    return _int8_s8s8_raw(x, q)


def _s8s8_fwd(x, q):
    return _int8_s8s8_raw(x, q), q


int8_linear_s8s8.defvjp(_s8s8_fwd, _int8f_bwd)


# M at or above this → s8s8 (compute-bound regime where the int8 MXU rate
# wins); below → convert-in-dot stream (decode M is memory-bound and the
# activation-quant VPU pass would be pure overhead).
_S8S8_MIN_M = int(__import__("os").environ.get("CULLAVO_S8S8_MIN_M", 1024))


def int8_linear_s8s8_auto(x: jax.Array, q: dict) -> jax.Array:
    """Phase-aware dispatch: prefill-sized M takes the native s8s8 MXU path,
    decode-sized M keeps the bf16 convert-in-dot weight stream."""
    M = 1
    for s in x.shape[:-1]:
        M *= s
    if M >= _S8S8_MIN_M and "q8" in q:
        return int8_linear_s8s8(x, q)
    return int8_linear(x, q)


def _row_absmax(x_in: jax.Array) -> jax.Array:
    """Per-row absmax of [M, K], K on the minor (lane) dimension.

    A direct ``max(|x|, axis=-1)`` lowers to a kLoop fusion on TPU whose
    own cost model reads ~546k cycles at [8974, 4096] (0.58 ms — ~117 GB/s
    effective, 7× off the HBM roofline; /tmp/prefill_hlo.txt
    abs_reduce_fusion backend_config).  Splitting the reduction so the
    HEAVY stage runs across the sublane dimension keeps all 128 lanes busy:
    [M, K] → [M, K/128, 128], max over the K/128 axis (lane-parallel),
    then one cheap [M, 128] lane reduce."""
    K = x_in.shape[-1]
    if K % 128 == 0 and K > 128:
        a = jnp.abs(x_in).reshape(x_in.shape[0], K // 128, 128)
        return jnp.max(jnp.max(a, axis=1), axis=-1, keepdims=True)
    return jnp.max(jnp.abs(x_in), axis=-1, keepdims=True)


def _quant_inv_scale(a: jax.Array) -> tuple:
    """Canonical per-row activation-quant scale from an f32 row absmax
    ``a``: returns (inv, sx) where codes = round(x_f32 · inv) and sx (f32)
    is EXACTLY 1/inv — the dequant scale matches the multiplier the codes
    were built with.

    Two rules make the Pallas kernel and the XLA fallback bit-identical by
    construction, neither of which holds for the obvious formulation:
    (1) constant-NUMERATOR divisions only — XLA rewrites division by a
    constant (``a/127``) into a reciprocal multiply in some fusion contexts
    but not others (measured: 1-ULP sx shift, whole rows of codes ±1);
    (2) the whole quant chain stays f32 with a single rounding point at the
    final round() — intermediate bf16 rounding points are NOT stable across
    compilation contexts (measured: XLA CPU runs fused bf16 elementwise
    chains at f32 precision and only rounds at fusion boundaries, so the
    same source computed different codes inside and outside the kernel)."""
    inv = jnp.float32(127.0) / jnp.maximum(a, 1e-12)
    sx = 1.0 / inv
    return inv, sx


def _quant_rows_kernel(*refs, has_mult: bool):
    """Fused per-row activation quantization: (x · s) → row absmax → int8.

    One VMEM pass replaces XLA's abs_reduce kLoop fusion (~0.6 ms per
    [9072, 4096] pass, ~120 GB/s effective — its minor-dim reduce windows
    tile as (1, 81, 11)) + the separate clamp_convert quant pass.  The
    smooth/outlier multiplier ``s`` arrives as an f32 [8, K] block (bf16
    [1, K] violates the sublane tile)."""
    if has_mult:
        x_ref, s_ref, xi_ref, sx_ref = refs
    else:
        (x_ref, xi_ref, sx_ref), s_ref = refs, None
    x = x_ref[:].astype(jnp.float32)               # [bm, K]
    if has_mult:
        x = x * s_ref[0:1, :]
    a = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    inv, sx = _quant_inv_scale(a)
    xi_ref[:] = jnp.clip(jnp.round(x * inv), -127, 127).astype(jnp.int8)
    sx_ref[:] = jnp.broadcast_to(sx, (x.shape[0], 128))


def _quant_rows_block(M: int, K: int = 4096) -> int:
    """Largest 8-multiple divisor of M whose VMEM footprint fits: per
    program ≈ bm·K·(2 bf16 in + 1 int8 out + ~7 for the f32 upcast and
    product temps) bytes + margin against the 16 MiB scoped limit
    (measured: bm=160 at K=11008 reports 16.73 M scoped with the pure-f32
    chain — ~9.5 B/elem).  → cap 256 at K=4096, 128 at K=11008."""
    cap = max(8, int(12 * 1024 * 1024 / (9.5 * K)) // 8 * 8)
    cap = min(cap, 256)
    best = 0
    b = 8
    while b <= cap:
        if M % b == 0:
            best = b
        b += 8
    return best


def quantize_rows_pallas(x2: jax.Array, mult) -> tuple:
    """(xi int8 [M, K], sx f32 [M, 1]) = fused row quant of ``x2 * mult``.
    ``mult`` is the [1, K]-broadcastable SmoothQuant sq_inv / LLM.int8
    o_mask (or None)."""
    M, K = x2.shape
    bm = _quant_rows_block(M, K)
    has_mult = mult is not None
    s_in = []
    in_specs = [pl.BlockSpec((bm, K), lambda i: (i, 0))]
    if has_mult:
        s8rows = jnp.broadcast_to(
            jnp.asarray(mult, jnp.float32).reshape(1, K), (8, K))
        s_in = [s8rows]
        in_specs = in_specs + [pl.BlockSpec((8, K), lambda i: (0, 0))]
    xi, sx = pl.pallas_call(
        functools.partial(_quant_rows_kernel, has_mult=has_mult),
        grid=(M // bm,),
        in_specs=tuple(in_specs),
        out_specs=(pl.BlockSpec((bm, K), lambda i: (i, 0)),
                   pl.BlockSpec((bm, 128), lambda i: (i, 0))),
        out_shape=(jax.ShapeDtypeStruct((M, K), jnp.int8),
                   jax.ShapeDtypeStruct((M, 128), jnp.float32)),
        interpret=jax.default_backend() == "cpu",
    )(x2.astype(jnp.bfloat16), *s_in)
    return xi, sx[:, :1]


def _quant_pallas_enabled(M: int, K: int) -> bool:
    mode = os.environ.get("CULLAVO_QUANT_PALLAS", "1")
    return (mode != "0" and K % 128 == 0 and M % 8 == 0
            and _quant_rows_block(M, K) >= 64)


def _s8s8_prequant(x2: jax.Array, q: dict):
    """Per-row activation quantization for the s8s8 hot path — shared by
    the single and grouped forms.  Fused Pallas kernel at prefill shapes,
    bit-identical pure-f32 XLA chain otherwise.  ``q`` supplies the
    calibration (sq_inv / o_mask); returns (xi int8 [M, K], sx f32 [M, 1])."""
    if "sa" in q:
        # static W8A8 (see quantize_linear_int8 act_scale): calibrated
        # per-layer constant replaces the per-token absmax reduce — the
        # reduce is a VPU-bound kLoop fusion (~0.6 ms per pass at 7B
        # prefill), 4 passes/layer
        x_in = x2 * q["sq_inv"].astype(jnp.bfloat16)
        sx = q["sa"].reshape(1, 1)
        xi = jnp.clip(jnp.round(x_in * (1.0 / sx).astype(jnp.bfloat16)),
                      -127, 127).astype(jnp.int8)
        return xi, sx
    mult = q.get("sq_inv") if "sq_inv" in q else q.get("o_mask")
    if _quant_pallas_enabled(*x2.shape):
        return quantize_rows_pallas(x2, mult)
    # pure-f32 chain, same ops as the Pallas kernel (see _quant_inv_scale
    # for why no intermediate bf16 rounding point is allowed)
    xf = x2.astype(jnp.float32)
    if mult is not None:
        xf = xf * jnp.asarray(mult, jnp.float32).reshape(1, -1)
    inv, sx = _quant_inv_scale(_row_absmax(xf))
    xi = jnp.clip(jnp.round(xf * inv), -127, 127).astype(jnp.int8)
    return xi, sx


def _s8s8_apply(xi, sx, x2, q):
    """int8 dot + epilogue (+ static-outlier side product) for pre-quantized
    activations."""
    s_col = q["scale8"].reshape(1, -1).astype(jnp.float32)
    acc = jax.lax.dot_general(xi, q["q8"], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * s_col
    if "o_w" in q:
        y = y + ((x2 @ q["o_hot"]) @ q["o_w"]).astype(jnp.float32)
    return y


@jax.custom_vjp
def int8_linear_s8s8_group(x: jax.Array, qs: tuple):
    """Grouped s8s8: several linears consuming the SAME input tensor (q/k/v;
    gate/up) share ONE activation-quantization pass.  All dicts must share
    the group's calibration (calibrate.py emits one scale per input tensor);
    the quant uses ``qs[0]``'s.  Returns a tuple of outputs in x.dtype."""
    K = x.shape[-1]
    lead = x.shape[:-1]
    x2 = x.reshape(-1, K).astype(jnp.bfloat16)
    xi, sx = _s8s8_prequant(x2, qs[0])
    return tuple(_s8s8_apply(xi, sx, x2, q).reshape(*lead, -1).astype(x.dtype)
                 for q in qs)


def _s8s8g_fwd(x, qs):
    return int8_linear_s8s8_group(x, qs), qs


def _s8s8g_bwd(qs, dys):
    dx = None
    for q, dy in zip(qs, dys):
        d = _int8f_bwd(q, dy)[0]
        dx = d if dx is None else dx + d
    return dx, jax.tree.map(jnp.zeros_like, qs)


int8_linear_s8s8_group.defvjp(_s8s8g_fwd, _s8s8g_bwd)


def _s8s8_mode() -> str:
    """Validated CULLAVO_INT8_S8S8 policy value ("auto" | "1" | "0")."""
    mode = os.environ.get("CULLAVO_INT8_S8S8", "auto")
    if mode not in ("auto", "1", "0"):
        raise ValueError(
            f"CULLAVO_INT8_S8S8={mode!r}: expected 'auto' (s8s8 only for "
            "calibrated dicts), '1' (force dynamic bnb-exact), or '0' (off)")
    return mode


def s8s8_group_enabled(ws, x) -> bool:
    """True when the grouped s8s8 path should run: every weight is an
    int8 dict with SmoothQuant calibration, the policy is on, and M is
    prefill-sized.  (Static-outlier dicts are excluded from grouping: their
    o_mask may differ per target.)  All group members must carry the SAME
    sq_inv values — enforced at quantize time by quantize_llm_weights;
    int8_linear_s8s8_group quantizes the shared input with qs[0]'s."""
    if _s8s8_mode() == "0":
        return False
    if not all(isinstance(w, dict) and "q8" in w and "sq_inv" in w
               for w in ws):
        return False
    M = 1
    for s in x.shape[:-1]:
        M *= s
    return M >= _S8S8_MIN_M


def int8_linear_policy(x: jax.Array, q: dict) -> jax.Array:
    """The default int8 linear for model towers: s8s8 (phase-aware) when
    the CULLAVO_INT8_S8S8 policy enables it, exact convert-in-dot
    otherwise.  Default "auto" = s8s8 only for dicts carrying activation
    calibration (``sq_inv`` SmoothQuant scales or ``o_w`` static LLM.int8
    outliers) — uncalibrated checkpoints never silently lose outlier
    protection; "1" forces the dynamic bnb-exact mode; "0" disables."""
    mode = _s8s8_mode()
    enabled = {"auto": "o_w" in q or "sq_inv" in q,
               "1": True, "0": False}[mode]
    if enabled and "q8" in q:
        return int8_linear_s8s8_auto(x, q)
    return int8_linear(x, q)


def synthetic_planar_nf4(L: int, K: int, N: int, key) -> dict:
    """Random planar-NF4 dict with the production memory layout (q4p int32
    nibble planes + [K, N/BLOCK] block scales) built ON DEVICE — for
    throughput benches where weight values are irrelevant and the C++
    host-quantize + tunnel upload path is too slow (bench.py,
    scripts/train7b_probe.py share this)."""
    return {
        "q4p": jax.random.randint(key, (L, K // 8, N), -(2 ** 31), 2 ** 31 - 1,
                                  jnp.int32),
        "scale": jax.random.uniform(jax.random.fold_in(key, 1),
                                    (L, K, N // BLOCK), jnp.float32,
                                    1e-3, 2e-3),
    }
