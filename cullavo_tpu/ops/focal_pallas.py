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

Backward: custom VJP whose backward is the XLA chain's AD (the same
fwd-Pallas / bwd-XLA pattern as ops/msdeform_pallas.py) — training with
CULLAVO_FOCAL_PALLAS=1 differentiates fine.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _focal_kernel(ctx_ref, gates_ref, w_ref, o_ref, *,
                  kernels: tuple, H: int, W: int, c_blk: int, g_pad: int,
                  scaling: bool):
    HW = H * W
    L = len(kernels)
    ctx = ctx_ref[0].astype(jnp.float32)               # [c_blk, HW]
    gates = gates_ref[0].astype(jnp.float32)           # [g_pad, HW] (L+1 used)
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
        # accumulate per-dx so the row-wrap mask applies once per column
        # offset (k wheres) instead of once per tap (k² wheres) — fewer
        # live temporaries on the Mosaic stack and less VPU work
        for dx in range(-r, r + 1):
            s_dx = jnp.zeros((c_blk, HW), jnp.float32)
            for dy in range(-r, r + 1):
                # (dy, dx) row-major tap: base + (dy+r)*k + (dx+r)
                tap = wts[:, wcol + dy * k + dx + (k * k - 1) // 2]
                sh = pad + dy * W + dx
                s_dx = s_dx + tap[:, None] * padded[:, sh:sh + HW]
            if dx:
                ok = (col + dx >= 0) & (col + dx <= W - 1)
                s_dx = jnp.where(ok, s_dx, 0.0)
            conv = conv + s_dx
        wcol += k * k
        ctx = jax.nn.gelu(conv, approximate=True)
        acc = acc + ctx * gates[l:l + 1]
    ctx_global = jax.nn.gelu(jnp.mean(ctx, axis=1, keepdims=True),
                             approximate=True)         # [c_blk, 1]
    acc = acc + ctx_global * gates[L:L + 1]
    if scaling:
        acc = acc / (L + 1)
    o_ref[0] = acc.astype(o_ref.dtype)


# per-program f32 working-set ESTIMATE = 5 × [c_blk, HW] buffers (ctx,
# padded, conv, acc, shift temp).  Mosaic's real scoped-vmem stack runs
# ~4× the estimate (measured on chip: 21.55 MB actual at a 5.24 MB
# estimate, scripts/focal_probe.py stage1), so the budget the estimate is
# held under is 16 MB / 4.5 ≈ 3.5 MB.
_VMEM_BUDGET_BYTES = int(3.5 * 1024 * 1024)


def fits_fused_focal(C: int, HW: int, c_blk: int = 32) -> bool:
    """True when some channel block size keeps the kernel inside VMEM."""
    while C % c_blk:
        c_blk //= 2
    while c_blk > 8 and c_blk * HW * 4 * 5 > _VMEM_BUDGET_BYTES:
        c_blk //= 2
        while C % c_blk:
            c_blk //= 2
    return c_blk >= 1 and c_blk * HW * 4 * 5 <= _VMEM_BUDGET_BYTES


def _fused_focal_fwd(ctx, gates, level_weights, H: int, W: int,
                     kernels: tuple, scaling_modulator: bool, c_blk: int):
    B, C, HW = ctx.shape
    assert HW == H * W
    L = len(kernels)
    assert L + 1 <= 8 * ((L + 1 + 7) // 8)
    while C % c_blk:
        c_blk //= 2
    # shrink the channel block until the f32 working set fits VMEM
    while c_blk > 8 and c_blk * HW * 4 * 5 > _VMEM_BUDGET_BYTES:
        c_blk //= 2
        while C % c_blk:
            c_blk //= 2
    # gates padded to an 8-sublane multiple for the (8, 128) tiling rule
    g_pad = 8 * ((L + 1 + 7) // 8)
    gates8 = jnp.pad(gates, ((0, 0), (0, g_pad - (L + 1)), (0, 0)))
    wcols = sum(k * k for k in kernels)
    kernel = functools.partial(_focal_kernel, kernels=tuple(kernels),
                               H=H, W=W, c_blk=c_blk, g_pad=g_pad,
                               scaling=scaling_modulator)
    return pl.pallas_call(
        kernel,
        grid=(B, C // c_blk),
        in_specs=[
            pl.BlockSpec((1, c_blk, HW), lambda b, ci: (b, ci, 0)),
            pl.BlockSpec((1, g_pad, HW), lambda b, ci: (b, 0, 0)),
            pl.BlockSpec((c_blk, wcols), lambda b, ci: (ci, 0)),
        ],
        out_specs=pl.BlockSpec((1, c_blk, HW), lambda b, ci: (b, ci, 0)),
        out_shape=jax.ShapeDtypeStruct((B, C, HW), ctx.dtype),
        interpret=jax.default_backend() == "cpu",
    )(ctx, gates8, level_weights)


def _xla_focal_ctx(ctx, gates, level_weights, H, W, kernels, scaling):
    """The same chain in plain XLA ops on the [B, C, HW] layout — the VJP
    donor for the Pallas forward (and its numeric oracle in tests)."""
    B, C, HW = ctx.shape
    L = len(kernels)
    x = ctx.reshape(B, C, H, W).transpose(0, 2, 3, 1)        # NHWC
    acc = jnp.zeros_like(x)
    wcol = 0
    for l, k in enumerate(kernels):
        kw = level_weights[:, wcol:wcol + k * k].T.reshape(k, k, 1, C)
        wcol += k * k
        x = jax.lax.conv_general_dilated(
            x, kw.astype(x.dtype), window_strides=(1, 1),
            padding=[(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)
        x = jax.nn.gelu(x, approximate=True)
        g = gates[:, l].reshape(B, H, W)[..., None]
        acc = acc + x * g
    gl = jax.nn.gelu(jnp.mean(x, axis=(1, 2), keepdims=True),
                     approximate=True)
    acc = acc + gl * gates[:, L].reshape(B, H, W)[..., None]
    if scaling:
        acc = acc / (L + 1)
    return acc.transpose(0, 3, 1, 2).reshape(B, C, HW)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_focal_ctx(ctx, gates, level_weights, H: int, W: int,
                    kernels: tuple, scaling_modulator: bool,
                    c_blk: int = 32):
    """ctx [B, C, H*W]; gates [B, L+1, H*W]; level_weights [C, sum(k²)]
    (per-channel taps, levels concatenated row-major per k×k kernel).
    Returns ctx_all [B, C, H*W] — the gated multi-level context
    (everything in focal_modulation between the f-projection split and the
    ``h`` 1×1 conv).  Pallas forward, XLA-AD backward."""
    return _fused_focal_fwd(ctx, gates, level_weights, H, W,
                            tuple(kernels), scaling_modulator, c_blk)


def _vjp_fwd(ctx, gates, level_weights, H, W, kernels, scaling, c_blk):
    out = _fused_focal_fwd(ctx, gates, level_weights, H, W, tuple(kernels),
                           scaling, c_blk)
    return out, (ctx, gates, level_weights)


def _vjp_bwd(H, W, kernels, scaling, c_blk, res, g):
    ctx, gates, level_weights = res
    _, vjp = jax.vjp(
        lambda c, ga, lw: _xla_focal_ctx(c, ga, lw, H, W, tuple(kernels),
                                         scaling), ctx, gates, level_weights)
    return vjp(g.astype(ctx.dtype))


fused_focal_ctx.defvjp(_vjp_fwd, _vjp_bwd)


def pack_level_weights(level_kernels):
    """(k, k, 1, C) HWIO depthwise kernels (one per level, focalnet.py's
    ``focal{l}_w`` layout) → [C, sum(k²)] with taps ordered (dy, dx)
    row-major per level, matching the kernel's tap loop."""
    cols = [k.reshape(k.shape[0] * k.shape[1], -1).T for k in level_kernels]
    return jnp.concatenate(cols, axis=1)
