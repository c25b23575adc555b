"""Pallas TPU kernel for multi-scale deformable attention.

The SURVEY §2.5 plan for the reference's CUDA MSDeformAttn extension
(modeling/vision/encoder/ops/src/cuda/ms_deform_im2col_cuda.cuh:243-929).
The XLA gather implementation (ops/msdeform.py, the correctness baseline)
runs the op at ~205 ms on one v5e chip at deform-pixel-decoder shapes
(B=8, S=Q=5376, 8 heads x 64, L=3, P=4) — TPU gathers stream ~20 GB/s.

This kernel never gathers.  Bilinear sampling at (x, y) equals a dense
matmul against the level's value map with *tent* weights:

    out[q] = sum_hw  att_p * max(0, 1-|row(hw)-y_q|) * max(0, 1-|col(hw)-x_q|) * V[hw]

(nonzero only at the 4 corner cells, with exactly the bilinear corner
weights; taps outside the map vanish, reproducing grid_sample's zero
padding).  Per (batch, head, 128-query block) the kernel builds the
[128, HW_l] sampling matrix W arithmetically on the VPU — no scatter, no
gather — and contracts it with the VMEM-resident value map on the MXU.
This is the same reformulation that took the seg criterion's point
sampling from 5.37 s to 0.86 s/step (models/xdecoder/criterion.py).

The in-kernel `tpu.dynamic_gather` alternative is not available here: the
axon Mosaic helper compiles it only within a single 8-sublane tile
(verified: S=8 compiles, S>=128 crashes with HTTP 500).

Backward: custom VJP whose backward is the XLA implementation's AD
(bilinear weights are differentiable polynomials — the part the CUDA code
hand-derives in 6 col2im kernels).  Forward kernel and XLA path are
numerically interchangeable (parity tests in tests/test_ops.py), so mixing
them across fwd/bwd is exact.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from cullavo_tpu.ops.msdeform import ms_deform_attn as _ms_deform_attn_xla


def _level_kernel(xya_ref, v_ref, o_ref, *, Hl: int, Wl: int, P: int,
                  bq: int, hd: int):
    """One (batch, head, query-block) program for ONE level.

    xya_ref: [1, 1, bq, 4*P]   (x, y, att, pad) per point, level-local
    v_ref:   [1, HW, hd]       the level's value map for this (b, h)
    o_ref:   [1, 1, bq, hd]    this level's partial output
    """
    HW = Hl * Wl
    xya = xya_ref[0, 0].astype(jnp.float32)            # [bq, 4P]
    hw = jax.lax.broadcasted_iota(jnp.int32, (1, HW), 1)
    rowmap = (hw // Wl).astype(jnp.float32)            # [1, HW]
    colmap = (hw % Wl).astype(jnp.float32)

    W = jnp.zeros((bq, HW), jnp.float32)
    for p in range(P):
        x = xya[:, 4 * p + 0:4 * p + 1] * Wl - 0.5     # [bq, 1]
        y = xya[:, 4 * p + 1:4 * p + 2] * Hl - 0.5
        a = xya[:, 4 * p + 2:4 * p + 3]
        ty = jnp.maximum(0.0, 1.0 - jnp.abs(rowmap - y))   # [bq, HW]
        tx = jnp.maximum(0.0, 1.0 - jnp.abs(colmap - x))
        W = W + a * ty * tx
    # HIGHEST: f32 multi-pass on the MXU.  The sampling matrix is sparse
    # (4 nonzeros per point row) so bf16 single-pass rounding of W/V showed
    # up as ~3e-3 output error vs the exact XLA gather; full f32 passes
    # bring it to ~1e-6 and cost only the small [bq, HW]@[HW, hd] dot.
    o_ref[0, 0] = jnp.dot(W, v_ref[0].astype(jnp.float32),
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST
                          ).astype(o_ref.dtype)


def _level_partial(value_l, xya_l, Hl: int, Wl: int, P: int, block_q: int):
    """value_l [B, HW, Hh, hd]; xya_l [B, Hh, Q, 4P] → [B, Hh, Q, hd]."""
    B, HW, Hh, hd = value_l.shape
    Q = xya_l.shape[2]
    vf = value_l.transpose(0, 2, 1, 3).reshape(B * Hh, HW, hd)
    xf = xya_l.reshape(B * Hh, 1, Q, 4 * P)
    kernel = functools.partial(_level_kernel, Hl=Hl, Wl=Wl, P=P,
                               bq=block_q, hd=hd)
    out = pl.pallas_call(
        kernel,
        grid=(B * Hh, Q // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, 4 * P), lambda bh, qi: (bh, 0, qi, 0)),
            pl.BlockSpec((1, HW, hd), lambda bh, qi: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, hd), lambda bh, qi: (bh, 0, qi, 0)),
        # f32 partials: rounding each level's partial to a bf16 value dtype
        # before the cross-level sum would reintroduce the ~1e-3 error class
        # the f32/HIGHEST in-kernel dot exists to eliminate; the partial is
        # tiny next to the value map, so f32 here is free
        out_shape=jax.ShapeDtypeStruct((B * Hh, 1, Q, hd), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(xf, vf)
    return out.reshape(B, Hh, Q, hd)


def _fwd_padded(value, spatial_shapes, sampling_locations, attention_weights,
                block_q: int = 128):
    B, S, Hh, hd = value.shape
    Q = sampling_locations.shape[1]
    L = len(spatial_shapes)
    P = sampling_locations.shape[4]
    pad = (-Q) % block_q
    if pad:
        sampling_locations = jnp.pad(
            sampling_locations, ((0, 0), (0, pad)) + ((0, 0),) * 4)
        attention_weights = jnp.pad(
            attention_weights, ((0, 0), (0, pad)) + ((0, 0),) * 3)
    Qp = Q + pad
    # pack (x, y, att, 0) per point, head-major: [B, Hh, Q, L, 4P]
    loc = sampling_locations.transpose(0, 2, 1, 3, 4, 5)   # [B, Hh, Q, L, P, 2]
    att = attention_weights.transpose(0, 2, 1, 3, 4)       # [B, Hh, Q, L, P]
    xya = jnp.concatenate(
        [loc, att[..., None], jnp.zeros_like(att)[..., None]], axis=-1
    ).reshape(B, Hh, Qp, L, 4 * P)

    out = jnp.zeros((B, Hh, Qp, hd), jnp.float32)
    off = 0
    for l, (Hl, Wl) in enumerate(spatial_shapes):
        v_l = value[:, off:off + Hl * Wl]
        out = out + _level_partial(v_l, xya[:, :, :, l], Hl, Wl, P,
                                   block_q).astype(jnp.float32)
        off += Hl * Wl
    out = out[:, :, :Q].transpose(0, 2, 1, 3).reshape(B, Q, Hh * hd)
    return out.astype(value.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_pallas(value, spatial_shapes, sampling_locations,
                          attention_weights):
    """MSDeformAttn with a Pallas tent-matmul forward and XLA-AD backward.

    Same signature/semantics as ops.msdeform.ms_deform_attn:
    value [B, S, Hh, hd]; sampling_locations [B, Q, Hh, L, P, 2] in [0, 1];
    attention_weights [B, Q, Hh, L, P] → [B, Q, Hh*hd].  spatial_shapes
    must be a hashable tuple of (H_l, W_l).  Q is padded internally to a
    block multiple (pad rows dropped on return).
    """
    return _fwd_padded(value, spatial_shapes, sampling_locations,
                       attention_weights)


def _pallas_vjp_fwd(value, spatial_shapes, sampling_locations,
                    attention_weights):
    out = _fwd_padded(value, spatial_shapes, sampling_locations,
                      attention_weights)
    return out, (value, sampling_locations, attention_weights)


def _pallas_vjp_bwd(spatial_shapes, res, g):
    value, loc, att = res
    _, vjp = jax.vjp(
        lambda v, lo, w: _ms_deform_attn_xla(v, spatial_shapes, lo, w),
        value, loc, att)
    return vjp(g.astype(value.dtype))


ms_deform_attn_pallas.defvjp(
    lambda value, shapes, loc, att: _pallas_vjp_fwd(value, shapes, loc, att),
    _pallas_vjp_bwd)
