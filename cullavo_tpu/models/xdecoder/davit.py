"""DaViT backbone (dual attention: window-spatial + channel-group) in JAX.

Capability parity with modeling/vision/backbone/davit.py:320-615: per-stage
conv patch embeds (kernel 7/2/2/2, stride 4/2/2/2, pad 3/0/0/0, pre/post
norm), stages of dual blocks — SpatialBlock (depthwise 3x3 conv → pre-norm
windowed MSA → depthwise conv → pre-norm MLP) followed by ChannelBlock (same
shape with channel-group attention: softmax over the channel dimension) —
feature pyramid {res2..res5}.

NHWC; window partition via reshape (static shapes, window-divisible inputs
enforced by padding).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from cullavo_tpu.models.llava.clip_vit import layer_norm


@dataclasses.dataclass(frozen=True)
class DaViTConfig:
    embed_dims: Sequence[int] = (128, 256, 512, 1024)   # davit-d5 scale
    num_heads: Sequence[int] = (4, 8, 16, 32)
    num_groups: Sequence[int] = (4, 8, 16, 32)
    depths: Sequence[int] = (1, 1, 9, 1)                # dual blocks per stage
    window_size: int = 12
    mlp_ratio: float = 4.0
    patch_kernel: Sequence[int] = (7, 2, 2, 2)
    patch_stride: Sequence[int] = (4, 2, 2, 2)
    patch_pad: Sequence[int] = (3, 0, 0, 0)
    patch_prenorm: Sequence[bool] = (False, True, True, True)
    layer_norm_eps: float = 1e-5
    exact_gelu: "bool | None" = None   # GELU policy; see FocalNetConfig
    out_indices: Sequence[int] = (0, 1, 2, 3)


def _d(key, shape, dtype):
    return (jax.random.normal(key, shape) * 0.02).astype(dtype)


def init_davit_params(cfg: DaViTConfig, key: jax.Array, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 256))
    params: dict = {"stages": [], "patch_embeds": []}
    in_ch = 3
    for i, dim in enumerate(cfg.embed_dims):
        k = cfg.patch_kernel[i]
        pe = {"kernel": _d(next(ks), (k, k, in_ch, dim), dtype),
              "bias": jnp.zeros((dim,), dtype),
              "norm": {"scale": jnp.ones((in_ch if cfg.patch_prenorm[i] else dim,), dtype),
                       "bias": jnp.zeros((in_ch if cfg.patch_prenorm[i] else dim,), dtype)}}
        params["patch_embeds"].append(pe)
        blocks = []
        hidden = int(dim * cfg.mlp_ratio)
        for _ in range(cfg.depths[i]):
            def sub():
                return {
                    "conv1": _d(next(ks), (3, 3, 1, dim), dtype),
                    "conv1_b": jnp.zeros((dim,), dtype),
                    "ln_attn_s": jnp.ones((dim,), dtype), "ln_attn_b": jnp.zeros((dim,), dtype),
                    "qkv_w": _d(next(ks), (dim, 3 * dim), dtype),
                    "qkv_b": jnp.zeros((3 * dim,), dtype),
                    "proj_w": _d(next(ks), (dim, dim), dtype),
                    "proj_b": jnp.zeros((dim,), dtype),
                    "conv2": _d(next(ks), (3, 3, 1, dim), dtype),
                    "conv2_b": jnp.zeros((dim,), dtype),
                    "ln_ffn_s": jnp.ones((dim,), dtype), "ln_ffn_b": jnp.zeros((dim,), dtype),
                    "fc1_w": _d(next(ks), (dim, hidden), dtype),
                    "fc1_b": jnp.zeros((hidden,), dtype),
                    "fc2_w": _d(next(ks), (hidden, dim), dtype),
                    "fc2_b": jnp.zeros((dim,), dtype),
                }
            blocks.append({"spatial": sub(), "channel": sub()})
        params["stages"].append(blocks)
        in_ch = dim
    return params


def _dwconv(x, kernel, bias):
    C = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)
    return y + bias


def _mlp(x, w, exact_gelu=None):
    from cullavo_tpu.models.xdecoder.focalnet import _approx_gelu

    y = x @ w["fc1_w"] + w["fc1_b"]
    y = jax.nn.gelu(y, approximate=_approx_gelu(y.dtype, exact_gelu))
    return y @ w["fc2_w"] + w["fc2_b"]


def _window_attention(x, w, heads: int, window: int, eps: float):
    """x: [B, H, W, C] → same; non-overlapping window MSA with edge padding."""
    B, H, W, C = x.shape
    res = x
    y = layer_norm(x, w["ln_attn_s"], w["ln_attn_b"], eps)
    pad_b = (-H) % window
    pad_r = (-W) % window
    y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    Hp, Wp = H + pad_b, W + pad_r
    nh, nw = Hp // window, Wp // window
    y = y.reshape(B, nh, window, nw, window, C).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(B * nh * nw, window * window, C)

    hd = C // heads
    qkv = (y @ w["qkv_w"] + w["qkv_b"]).reshape(-1, window * window, 3, heads, hd)
    q, k, v = [qkv[:, :, j].transpose(0, 2, 1, 3) for j in range(3)]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * (hd ** -0.5)
    p = jax.nn.softmax(s, axis=-1).astype(y.dtype)
    a = jnp.einsum("bhqk,bhkd->bhqd", p, v, preferred_element_type=jnp.float32).astype(y.dtype)
    a = a.transpose(0, 2, 1, 3).reshape(-1, window * window, C)
    a = a @ w["proj_w"] + w["proj_b"]

    a = a.reshape(B, nh, nw, window, window, C).transpose(0, 1, 3, 2, 4, 5)
    a = a.reshape(B, Hp, Wp, C)[:, :H, :W]
    return res + a


def _channel_attention(x, w, groups: int, eps: float):
    """Channel-group attention (davit.py:155-177): softmax over channels."""
    B, H, W, C = x.shape
    N = H * W
    res = x
    y = layer_norm(x, w["ln_attn_s"], w["ln_attn_b"], eps).reshape(B, N, C)
    hd = C // groups
    qkv = (y @ w["qkv_w"] + w["qkv_b"]).reshape(B, N, 3, groups, hd)
    q, k, v = [qkv[:, :, j].transpose(0, 2, 1, 3) for j in range(3)]  # [B, g, N, hd]
    q = q * (N ** -0.5)
    attn = jax.nn.softmax(
        jnp.einsum("bgnd,bgne->bgde", q, k, preferred_element_type=jnp.float32),
        axis=-1).astype(y.dtype)
    out = jnp.einsum("bgde,bgne->bgnd", attn, v,
                     preferred_element_type=jnp.float32).astype(y.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
    out = out @ w["proj_w"] + w["proj_b"]
    return res + out.reshape(B, H, W, C)


def _dual_sub_block(x, w, attn_fn, eps, exact_gelu: bool = True):
    x = x + _dwconv(x, w["conv1"], w["conv1_b"])
    x = attn_fn(x, w)
    x = x + _dwconv(x, w["conv2"], w["conv2_b"])
    y = layer_norm(x, w["ln_ffn_s"], w["ln_ffn_b"], eps)
    return x + _mlp(y, w, exact_gelu)


def davit_forward(params, cfg: DaViTConfig, images: jax.Array) -> dict:
    """images [B, H, W, 3] → {"res2".."res5"} NHWC feature maps."""
    eps = cfg.layer_norm_eps
    x = images
    outs = {}
    for i, blocks in enumerate(params["stages"]):
        pe = params["patch_embeds"][i]
        if cfg.patch_prenorm[i]:
            x = layer_norm(x, pe["norm"]["scale"], pe["norm"]["bias"], eps)
        stride = cfg.patch_stride[i]
        pad = cfg.patch_pad[i]
        x = jax.lax.conv_general_dilated(
            x, pe["kernel"], (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + pe["bias"]
        if not cfg.patch_prenorm[i]:
            x = layer_norm(x, pe["norm"]["scale"], pe["norm"]["bias"], eps)

        for blk in blocks:
            x = _dual_sub_block(
                x, blk["spatial"],
                lambda y, w: _window_attention(y, w, cfg.num_heads[i],
                                               cfg.window_size, eps), eps,
                cfg.exact_gelu)
            x = _dual_sub_block(
                x, blk["channel"],
                lambda y, w: _channel_attention(y, w, cfg.num_groups[i], eps),
                eps, cfg.exact_gelu)

        if i in cfg.out_indices:
            # the reference emits RAW stage outputs — DaViT has no per-output
            # norm layers (davit.py:529-534; Swin-style norm{i} absent).
            # A scale-1/bias-0 LayerNorm here is NOT identity (it still
            # standardizes), which the torch-parity harness caught.
            outs[f"res{i + 2}"] = x
    return outs
