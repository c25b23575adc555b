"""Fused focal-modulation context kernel (FocalNet backbones).

The focal-modulation hot loop (models/xdecoder/focalnet.py::focal_modulation,
reference modeling/vision/backbone/focal.py) chains L depthwise convs
(kernels 3, 5, 7, 9) with GELU and per-level gating, plus a gated global
mean — a long elementwise/stencil chain that XLA executes as separate
HBM-roundtrip convs; the focal-T trunk measures ~10× off its VPU roofline
(STATUS.md).

This kernel computes the whole chain in one VMEM pass.  Layout trick:
channels are split across programs and each program holds its channel
slab's ENTIRE spatial map as flattened [c_blk, H*W] lanes — a k×k
depthwise conv is then k² masked lane-shifts (shift dy·W+dx, with a
column mask killing row wrap-around), the per-level GELU/gate/accumulate
are elementwise, and the global-mean term is a lane reduction — all
channel-local, so no cross-program communication.

Depthwise convs have no bias in focal modulation (focal.py f/focal layers);
zero-padding SAME semantics match the shifted-in zeros + column mask.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _gelu(x):
    # tanh-approximate gelu, matching jax.nn.gelu(approximate=True)
    return 0.5 * x * (1.0 + jnp.tanh(0.7978845608028654
                                     * (x + 0.044715 * x * x * x)))


def _focal_kernel(ctx_ref, gates_ref, w_ref, o_ref, *,
                  kernels: tuple, H: int, W: int, c_blk: int,
                  scaling: bool):
    HW = H * W
    L = len(kernels)
    ctx = ctx_ref[0].astype(jnp.float32)               # [c_blk, HW]
    gates = gates_ref[0].astype(jnp.float32)           # [8, HW] (L+1 used)
    wts = w_ref[...].astype(jnp.float32)               # [c_blk, WCOLS]

    # column index per flattened-HW lane, for masking row wrap-around
    col = jax.lax.broadcasted_iota(jnp.int32, (1, HW), 1) % W

    acc = jnp.zeros((c_blk, HW), jnp.float32)
    wcol = 0
    for l, k in enumerate(kernels):
        r = k // 2
        pad = r * W + r
        padded = jnp.pad(ctx, ((0, 0), (pad, pad)))
        conv = jnp.zeros((c_blk, HW), jnp.float32)
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                tap = wts[:, wcol:wcol + 1]            # [c_blk, 1]
                wcol += 1
                sh = pad + dy * W + dx
                xs = padded[:, sh:sh + HW]
                if dx:
                    ok = (col + dx >= 0) & (col + dx <= W - 1)
                    xs = jnp.where(ok, xs, 0.0)
                conv = conv + tap * xs
        ctx = _gelu(conv)
        acc = acc + ctx * gates[l:l + 1]
    ctx_global = _gelu(jnp.mean(ctx, axis=1, keepdims=True))   # [c_blk, 1]
    acc = acc + ctx_global * gates[L:L + 1]
    if scaling:
        acc = acc / (L + 1)
    o_ref[0] = acc.astype(o_ref.dtype)


def fused_focal_ctx(ctx, gates, level_weights, H: int, W: int,
                    kernels: tuple, scaling_modulator: bool,
                    c_blk: int = 32):
    """ctx [B, C, H*W]; gates [B, L+1, H*W]; level_weights [C, sum(k²)]
    (per-channel taps, levels concatenated row-major per k×k kernel).
    Returns ctx_all [B, C, H*W] — the gated multi-level context
    (everything in focal_modulation between the f-projection split and the
    ``h`` 1×1 conv)."""
    B, C, HW = ctx.shape
    assert HW == H * W
    L = len(kernels)
    while C % c_blk:
        c_blk //= 2
    # gates padded to 8 sublanes for the (8, 128) block tiling rule
    gates8 = jnp.pad(gates, ((0, 0), (0, 8 - (L + 1)), (0, 0)))
    wcols = sum(k * k for k in kernels)
    kernel = functools.partial(_focal_kernel, kernels=tuple(kernels),
                               H=H, W=W, c_blk=c_blk,
                               scaling=scaling_modulator)
    return pl.pallas_call(
        kernel,
        grid=(B, C // c_blk),
        in_specs=[
            pl.BlockSpec((1, c_blk, HW), lambda b, ci: (b, ci, 0)),
            pl.BlockSpec((1, 8, HW), lambda b, ci: (b, 0, 0)),
            pl.BlockSpec((c_blk, wcols), lambda b, ci: (ci, 0)),
        ],
        out_specs=pl.BlockSpec((1, c_blk, HW), lambda b, ci: (b, ci, 0)),
        out_shape=jax.ShapeDtypeStruct((B, C, HW), ctx.dtype),
        interpret=jax.default_backend() == "cpu",
    )(ctx, gates8, level_weights)


def pack_level_weights(level_kernels):
    """[k, k, C, 1] HWIO depthwise kernels (one per level) → [C, sum(k²)]
    with taps ordered (dy, dx) row-major per level, matching the kernel's
    tap loop."""
    cols = [k.reshape(k.shape[0] * k.shape[1], -1).T for k in level_kernels]
    return jnp.concatenate(cols, axis=1)
