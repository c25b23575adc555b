"""FocalNet backbone (focal modulation network) in functional JAX.

Capability parity with the reference's FocalNet
(modeling/vision/backbone/focal.py:44-683) at the `xdecoder_test.yaml`
configuration: conv-embed stem (7x7/4), 4 stages of focal-modulation blocks
(depths [2,2,18,2], focal_level 4, focal_window 3, focal_factor 2 → depthwise
kernels 3/5/7/9), post-LN + layerscale + scaled modulator, stage-end 3x3/2
conv downsampling, per-output LayerNorm, feature pyramid {res2..res5}.

TPU-first: channel-last (NHWC) throughout so depthwise convs and 1x1
projections hit XLA's fused conv/matmul paths; per-stage ``lax.scan`` over
stacked block params (uniform shapes within a stage).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from cullavo_tpu.models.llava.clip_vit import layer_norm


@dataclasses.dataclass(frozen=True)
class FocalNetConfig:
    embed_dim: int = 192
    depths: Sequence[int] = (2, 2, 18, 2)
    focal_levels: Sequence[int] = (4, 4, 4, 4)
    focal_windows: Sequence[int] = (3, 3, 3, 3)
    focal_factor: int = 2
    mlp_ratio: float = 4.0
    patch_size: int = 4
    use_conv_embed: bool = True
    use_postln: bool = True
    use_postln_in_modulation: bool = False
    use_layerscale: bool = True
    layerscale_value: float = 1e-4
    scaling_modulator: bool = True
    # GELU variant policy.  None (default) = dtype-aware: exact erf for
    # f32 activations (matches the reference's nn.GELU — the torch-parity
    # harness asserts it), tanh-approx for bf16 (max |Δ| ≈ 1.5e-3 sits
    # below the bf16 half-ulp at the relevant magnitudes, i.e. within one
    # ulp of the exact value after bf16 rounding — and recovers the ~16%
    # the elementwise-bound focal eval pays for erf: 45.7 vs 38.4 img/s at
    # 512² batch 8).  True forces exact erf everywhere; False forces tanh.
    exact_gelu: "bool | None" = None
    use_dw: bool = False          # focal_dw variant: residual depthwise 3x3
                                  # before modulation and before the MLP, and
                                  # post-LN applied AFTER the MLP residual
                                  # (modeling/vision/backbone/focal_dw.py:147-195)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    layer_norm_eps: float = 1e-5

    @property
    def num_features(self):
        return [self.embed_dim * (2 ** i) for i in range(len(self.depths))]


def _dense(key, shape, dtype):
    return (jax.random.normal(key, shape) * 0.02).astype(dtype)


def init_focalnet_params(cfg: FocalNetConfig, key: jax.Array, dtype=jnp.float32):
    # ~8 dense inits per block + focal/dw kernels + stem/downsamples; size the
    # key pool from the config (64 was exhausted by real depths like (2,2,6,2))
    n_keys = 8 + sum(d * (8 + max(cfg.focal_levels) + 3) for d in cfg.depths)
    keys = jax.random.split(key, n_keys)
    ki = iter(keys)
    params: dict = {"stages": []}

    # stem: conv 7x7 s4 p2 (conv-embed) or patch_size conv; + LN
    C0 = cfg.embed_dim
    k_stem = 7 if cfg.use_conv_embed else cfg.patch_size
    params["stem"] = {
        "kernel": _dense(next(ki), (k_stem, k_stem, 3, C0), dtype),
        "bias": jnp.zeros((C0,), dtype),
        "norm": {"scale": jnp.ones((C0,), dtype), "bias": jnp.zeros((C0,), dtype)},
    }

    for i, depth in enumerate(cfg.depths):
        C = cfg.num_features[i]
        L = cfg.focal_levels[i]
        hidden = int(C * cfg.mlp_ratio)
        gamma = (jnp.full((depth, C), cfg.layerscale_value, dtype)
                 if cfg.use_layerscale else jnp.ones((depth, C), dtype))

        def stacked(shape):
            return jnp.stack([_dense(next(ki), shape, dtype) for _ in range(depth)])

        blocks = {
            "norm1_s": jnp.ones((depth, C), dtype), "norm1_b": jnp.zeros((depth, C), dtype),
            "f_w": stacked((C, 2 * C + L + 1)), "f_b": jnp.zeros((depth, 2 * C + L + 1), dtype),
            "h_w": stacked((C, C)), "h_b": jnp.zeros((depth, C), dtype),
            "proj_w": stacked((C, C)), "proj_b": jnp.zeros((depth, C), dtype),
            "norm2_s": jnp.ones((depth, C), dtype), "norm2_b": jnp.zeros((depth, C), dtype),
            "fc1_w": stacked((C, hidden)), "fc1_b": jnp.zeros((depth, hidden), dtype),
            "fc2_w": stacked((hidden, C)), "fc2_b": jnp.zeros((depth, C), dtype),
            "gamma1": gamma, "gamma2": gamma,
        }
        for l in range(L):
            ksize = cfg.focal_factor * l + cfg.focal_windows[i]
            blocks[f"focal{l}_w"] = jnp.stack(
                [_dense(next(ki), (ksize, ksize, 1, C), dtype) for _ in range(depth)])
        if cfg.use_dw:
            for name in ("dw1", "dw2"):
                blocks[f"{name}_w"] = jnp.stack(
                    [_dense(next(ki), (3, 3, 1, C), dtype) for _ in range(depth)])
                blocks[f"{name}_b"] = jnp.zeros((depth, C), dtype)

        stage = {"blocks": blocks}
        if i < len(cfg.depths) - 1:
            C2 = cfg.num_features[i + 1]
            kd = 3 if cfg.use_conv_embed else 2
            stage["downsample"] = {
                "kernel": _dense(next(ki), (kd, kd, C, C2), dtype),
                "bias": jnp.zeros((C2,), dtype),
                "norm": {"scale": jnp.ones((C2,), dtype), "bias": jnp.zeros((C2,), dtype)},
            }
        params["stages"].append(stage)

    params["out_norms"] = {
        str(i): {"scale": jnp.ones((cfg.num_features[i],), dtype),
                 "bias": jnp.zeros((cfg.num_features[i],), dtype)}
        for i in cfg.out_indices
    }
    return params


def _depthwise_conv(x, kernel):
    """NHWC depthwise conv, SAME-style padding k//2."""
    k = kernel.shape[0]
    C = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=[(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)


def _approx_gelu(x_dtype, exact_gelu) -> bool:
    """Resolve the GELU policy (see FocalNetConfig.exact_gelu)."""
    if exact_gelu is None:
        return x_dtype == jnp.bfloat16
    return not exact_gelu


def focal_modulation(x, w, focal_level: int, scaling_modulator: bool, eps: float,
                     exact_gelu=None):
    """x: [B, H, W, C] → [B, H, W, C].  The focal-modulation op:
    q/ctx/gates from one projection, hierarchical depthwise-conv contexts
    gated and summed (+ global mean context), modulated via a 1x1 ``h``."""
    import os

    C = x.shape[-1]
    fx = x @ w["f_w"] + w["f_b"]
    q = fx[..., :C]
    ctx = fx[..., C:2 * C]
    gates = fx[..., 2 * C:]

    B, H, W, _ = x.shape
    from cullavo_tpu.ops.focal_pallas import fits_fused_focal

    if (jax.default_backend() == "tpu"
            and os.environ.get("CULLAVO_FOCAL_PALLAS", "0") == "1"
            and focal_level + 1 <= 8 and fits_fused_focal(C, H * W)):
        # CULLAVO_FOCAL_PALLAS=1: one fused VMEM pass for the dwconv/gelu/
        # gate chain + global-mean term (ops/focal_pallas.py) instead of
        # XLA's per-op HBM roundtrips.  Opt-in until chip-validated;
        # differentiable (custom VJP = XLA-chain AD).  Oversized maps fall
        # through to the XLA path (VMEM guard).
        from cullavo_tpu.ops.focal_pallas import (fused_focal_ctx,
                                                  pack_level_weights)

        kernels = tuple(int(w[f"focal{l}_w"].shape[0])
                        for l in range(focal_level))
        lw = pack_level_weights([w[f"focal{l}_w"]
                                 for l in range(focal_level)])
        ctx_f = ctx.reshape(B, H * W, C).transpose(0, 2, 1)
        gates_f = gates.reshape(B, H * W, focal_level + 1).transpose(0, 2, 1)
        ctx_all = fused_focal_ctx(ctx_f, gates_f, lw, H, W, kernels,
                                  scaling_modulator)
        ctx_all = ctx_all.transpose(0, 2, 1).reshape(B, H, W, C)
    else:
        ctx_all = jnp.zeros_like(q)
        for l in range(focal_level):
            ctx = jax.nn.gelu(_depthwise_conv(ctx, w[f"focal{l}_w"]),
                              approximate=_approx_gelu(x.dtype, exact_gelu))
            ctx_all = ctx_all + ctx * gates[..., l:l + 1]
        ctx_global = jax.nn.gelu(jnp.mean(ctx, axis=(1, 2), keepdims=True),
                                 approximate=_approx_gelu(x.dtype, exact_gelu))
        ctx_all = ctx_all + ctx_global * gates[..., focal_level:focal_level + 1]
        if scaling_modulator:
            ctx_all = ctx_all / (focal_level + 1)

    out = q * (ctx_all @ w["h_w"] + w["h_b"])
    return out @ w["proj_w"] + w["proj_b"]


def focalnet_forward(params, cfg: FocalNetConfig, images: jax.Array,
                     remat: bool = False) -> dict:
    """images: [B, H, W, 3] (already normalized) → {"res2".."res5": [B, h, w, C]}.

    ``remat=True`` checkpoints each block in the per-stage scans (training:
    saves the stage-3 activations, the deep 18-block stage)."""
    eps = cfg.layer_norm_eps
    stem = params["stem"]
    stride = 4 if cfg.use_conv_embed else cfg.patch_size
    # conv-embed stem: kernel 7 stride 4, padding 2 in focal.py:310 but
    # padding 3 in focal_dw.py:393 — same output size at multiples of 4,
    # SHIFTED sampling (torch-parity harness caught the variant difference)
    pad = (3 if cfg.use_dw else 2) if cfg.use_conv_embed else 0
    x = jax.lax.conv_general_dilated(
        images, stem["kernel"], window_strides=(stride, stride),
        padding=[(pad, pad)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x + stem["bias"]
    x = layer_norm(x, stem["norm"]["scale"], stem["norm"]["bias"], eps)

    outs = {}
    for i, stage in enumerate(params["stages"]):
        L = cfg.focal_levels[i]

        def _mlp(y, w):
            y = jax.nn.gelu(y @ w["fc1_w"] + w["fc1_b"],
                            approximate=_approx_gelu(y.dtype, cfg.exact_gelu))
            return y @ w["fc2_w"] + w["fc2_b"]

        def block(h, w):
            if cfg.use_dw:
                h = h + _depthwise_conv(h, w["dw1_w"]) + w["dw1_b"]
            shortcut = h
            y = h
            if not cfg.use_postln:
                y = layer_norm(y, w["norm1_s"], w["norm1_b"], eps)
            y = focal_modulation(y, w, L, cfg.scaling_modulator, eps,
                                 exact_gelu=cfg.exact_gelu)
            if cfg.use_postln and not cfg.use_dw:
                # focal.py:183-188 post-LN: norm on the modulation BRANCH
                y = layer_norm(y, w["norm1_s"], w["norm1_b"], eps)
            h = shortcut + w["gamma1"] * y
            if cfg.use_postln and cfg.use_dw:
                # focal_dw.py:190-195 post-LN: norm applied to the residual
                # SUM (after gamma), before dw2 — unlike focal.py's branch
                # norm (caught by the torch-parity harness)
                h = layer_norm(h, w["norm1_s"], w["norm1_b"], eps)
            if cfg.use_dw:
                h = h + _depthwise_conv(h, w["dw2_w"]) + w["dw2_b"]
            if cfg.use_dw and cfg.use_postln:
                # focal_dw post-LN ordering: residual MLP first, norm after
                h = h + w["gamma2"] * _mlp(h, w)
                h = layer_norm(h, w["norm2_s"], w["norm2_b"], eps)
            elif cfg.use_postln:
                h = h + w["gamma2"] * layer_norm(_mlp(h, w), w["norm2_s"], w["norm2_b"], eps)
            else:
                h = h + w["gamma2"] * _mlp(layer_norm(h, w["norm2_s"], w["norm2_b"], eps), w)
            return h, None

        block_fn = (jax.checkpoint(block, policy=jax.checkpoint_policies.nothing_saveable)
                    if remat else block)
        x, _ = jax.lax.scan(block_fn, x, stage["blocks"])

        if str(i) in params["out_norms"]:
            n = params["out_norms"][str(i)]
            outs[f"res{i + 2}"] = layer_norm(x, n["scale"], n["bias"], eps)

        if "downsample" in stage:
            ds = stage["downsample"]
            kd = ds["kernel"].shape[0]
            pad_d = 1 if cfg.use_conv_embed else 0
            x = jax.lax.conv_general_dilated(
                x, ds["kernel"], window_strides=(2, 2), padding=[(pad_d, pad_d)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = x + ds["bias"]
            x = layer_norm(x, ds["norm"]["scale"], ds["norm"]["bias"], eps)

    return outs
