"""SAM-ViT backbone (ViTDet-style) in functional JAX.

Capability parity with modeling/vision/backbone/vit.py:26-581: 16x16 patch
embed + absolute position embedding, transformer blocks with windowed
attention (global attention at configured indexes), decomposed relative
position bias, and the SimpleFPN neck producing {res2..res5} via
transposed-conv up / conv down paths (vit.py:405-458).

NHWC; stacked-window attention via reshape; rel-pos via einsum gathers.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from cullavo_tpu.models.llava.clip_vit import layer_norm


@dataclasses.dataclass(frozen=True)
class SamVitConfig:
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768            # samvitb; L=1024
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    window_size: int = 14
    global_attn_indexes: Sequence[int] = (2, 5, 8, 11)
    use_rel_pos: bool = True
    out_dims: Sequence[int] = (128, 256, 512, 1024)
    layer_norm_eps: float = 1e-6


def _d(key, shape, dtype):
    return (jax.random.normal(key, shape) * 0.02).astype(dtype)


def init_sam_vit_params(cfg: SamVitConfig, key: jax.Array, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 16 + cfg.depth * 8))
    D = cfg.embed_dim
    hd = D // cfg.num_heads
    grid = cfg.img_size // cfg.patch_size
    hidden = int(D * cfg.mlp_ratio)
    params = {
        "patch_embed": {"kernel": _d(next(ks), (cfg.patch_size, cfg.patch_size, 3, D), dtype),
                        "bias": jnp.zeros((D,), dtype)},
        "pos_embed": _d(next(ks), (grid, grid, D), dtype),
        "blocks": [],
        "neck": _init_simple_fpn(ks, D, cfg.out_dims, dtype),
    }
    for i in range(cfg.depth):
        is_global = i in cfg.global_attn_indexes
        size = grid if is_global else cfg.window_size
        params["blocks"].append({
            "ln1_s": jnp.ones((D,), dtype), "ln1_b": jnp.zeros((D,), dtype),
            "qkv_w": _d(next(ks), (D, 3 * D), dtype), "qkv_b": jnp.zeros((3 * D,), dtype),
            "proj_w": _d(next(ks), (D, D), dtype), "proj_b": jnp.zeros((D,), dtype),
            "rel_h": jnp.zeros((2 * size - 1, hd), dtype),
            "rel_w": jnp.zeros((2 * size - 1, hd), dtype),
            "ln2_s": jnp.ones((D,), dtype), "ln2_b": jnp.zeros((D,), dtype),
            "fc1_w": _d(next(ks), (D, hidden), dtype), "fc1_b": jnp.zeros((hidden,), dtype),
            "fc2_w": _d(next(ks), (hidden, D), dtype), "fc2_b": jnp.zeros((D,), dtype),
        })
    return params


def _init_simple_fpn(ks, in_dim, out_dims, dtype):
    d4c = max(out_dims[0] * 2, in_dim // 2)
    d8c = max(out_dims[1], in_dim // 2)
    d32c = max(out_dims[3], in_dim * 2)

    def convT(cin, cout):
        return {"kernel": _d(next(ks), (2, 2, cout, cin), dtype),
                "bias": jnp.zeros((cout,), dtype)}

    def conv(cin, cout, k=1):
        return {"kernel": _d(next(ks), (k, k, cin, cout), dtype),
                "bias": jnp.zeros((cout,), dtype)}

    def gn(c):
        return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

    return {
        "down4": {"up1": convT(in_dim, d4c), "gn1": gn(d4c),
                  "up2": convT(d4c, d4c // 2), "gn2": gn(d4c // 2),
                  "conv": conv(d4c // 2, out_dims[0]), "gn3": gn(out_dims[0])},
        "down8": {"up1": convT(in_dim, d8c), "gn1": gn(d8c),
                  "conv": conv(d8c, out_dims[1]), "gn2": gn(out_dims[1])},
        "down16": {"conv": conv(in_dim, out_dims[2]), "gn": gn(out_dims[2])},
        "down32": {"conv1": conv(in_dim, d32c, k=2), "gn1": gn(d32c),
                   "conv2": conv(d32c, out_dims[3]), "gn2": gn(out_dims[3])},
    }


def _layer_norm_cf(x, scale, bias, eps):  # channels-last LN over C
    return layer_norm(x, scale, bias, eps)


def _group_norm1(x, p, eps=1e-5):
    """GroupNorm(1, C) == LayerNorm over (H, W, C) per sample."""
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(x, axis=(1, 2, 3), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _rel_pos_bias(q, rel_h, rel_w, H, W):
    """Decomposed rel-pos (vit.py add_decomposed_rel_pos): q [B*, H*W, hd]."""
    # coords: since query and key sizes equal, index = qi - ki + (S - 1)
    def get(rel, S):
        idx = (jnp.arange(S)[:, None] - jnp.arange(S)[None, :]) + (S - 1)
        return rel[idx]                                     # [S, S, hd]

    Rh = get(rel_h, H)
    Rw = get(rel_w, W)
    Bn = q.shape[0]
    r_q = q.reshape(Bn, H, W, -1)
    rel_h_term = jnp.einsum("bhwc,hkc->bhwk", r_q, Rh)
    rel_w_term = jnp.einsum("bhwc,wkc->bhwk", r_q, Rw)
    # bias[b, i, j, kh, kw] = rel_h[b, i, j, kh] + rel_w[b, i, j, kw]
    # (vit.py:358-361).  NB: the width term needs its new axis at position 3
    # — [:, :, None, :] would put it at 2, silently broadcasting H against
    # the KEY row whenever H == W (caught by the torch-parity harness).
    bias = rel_h_term[:, :, :, :, None] + rel_w_term[:, :, :, None, :]
    return bias.reshape(Bn, H * W, H * W)


def _attn(x, w, heads, eps, use_rel_pos):
    """x: [B*, S, S, C] (a window or the full map)."""
    Bn, H, W, C = x.shape
    hd = C // heads
    qkv = (x.reshape(Bn, H * W, C) @ w["qkv_w"] + w["qkv_b"])
    qkv = qkv.reshape(Bn, H * W, 3, heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv.reshape(3, Bn * heads, H * W, hd)
    s = jnp.einsum("bqd,bkd->bqk", q * (hd ** -0.5), k,
                   preferred_element_type=jnp.float32)
    if use_rel_pos:
        s = s + _rel_pos_bias(q, w["rel_h"], w["rel_w"], H, W)
    p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    o = jnp.einsum("bqk,bkd->bqd", p, v, preferred_element_type=jnp.float32)
    o = o.astype(x.dtype).reshape(Bn, heads, H, W, hd).transpose(0, 2, 3, 1, 4)
    o = o.reshape(Bn, H, W, C)
    return o @ w["proj_w"] + w["proj_b"]


def sam_vit_forward(params, cfg: SamVitConfig, images: jax.Array) -> dict:
    """images [B, H, W, 3] → {"res2".."res5"} NHWC."""
    eps = cfg.layer_norm_eps
    pe = params["patch_embed"]
    x = jax.lax.conv_general_dilated(
        images, pe["kernel"], (cfg.patch_size, cfg.patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + pe["bias"]
    B, H, W, D = x.shape
    pos = params["pos_embed"]
    if pos.shape[:2] != (H, W):
        pos = jax.image.resize(pos, (H, W, D), method="bilinear")
    x = x + pos[None]

    for i, w in enumerate(params["blocks"]):
        shortcut = x
        y = _layer_norm_cf(x, w["ln1_s"], w["ln1_b"], eps)
        is_global = i in cfg.global_attn_indexes
        if is_global:
            y = _attn(y, w, cfg.num_heads, eps, cfg.use_rel_pos)
        else:
            ws = cfg.window_size
            pad_b = (-H) % ws
            pad_r = (-W) % ws
            yp = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            Hp, Wp = H + pad_b, W + pad_r
            nh, nw = Hp // ws, Wp // ws
            yw = yp.reshape(B, nh, ws, nw, ws, D).transpose(0, 1, 3, 2, 4, 5)
            yw = yw.reshape(B * nh * nw, ws, ws, D)
            yw = _attn(yw, w, cfg.num_heads, eps, cfg.use_rel_pos)
            yw = yw.reshape(B, nh, nw, ws, ws, D).transpose(0, 1, 3, 2, 4, 5)
            y = yw.reshape(B, Hp, Wp, D)[:, :H, :W]
        x = shortcut + y
        y = _layer_norm_cf(x, w["ln2_s"], w["ln2_b"], eps)
        y = jax.nn.gelu(y @ w["fc1_w"] + w["fc1_b"], approximate=False)
        x = x + (y @ w["fc2_w"] + w["fc2_b"])

    return simple_fpn_forward(params["neck"], x)


def _convT(x, p):
    return jax.lax.conv_transpose(
        x, p["kernel"], (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWOI", "NHWC")) + p["bias"]


def _conv(x, p, stride=1):
    return jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["bias"]


def simple_fpn_forward(neck, x):
    """SimpleFPN (vit.py:405-458): one stride-16 map → 4-level pyramid."""
    g = jax.nn.gelu
    d4 = neck["down4"]
    y = g(_group_norm1(_convT(x, d4["up1"]), d4["gn1"]), approximate=False)
    y = _group_norm1(_convT(y, d4["up2"]), d4["gn2"])
    res2 = g(_group_norm1(_conv(y, d4["conv"]), d4["gn3"]), approximate=False)

    d8 = neck["down8"]
    y = _group_norm1(_convT(x, d8["up1"]), d8["gn1"])
    res3 = g(_group_norm1(_conv(y, d8["conv"]), d8["gn2"]), approximate=False)

    d16 = neck["down16"]
    res4 = g(_group_norm1(_conv(x, d16["conv"]), d16["gn"]), approximate=False)

    d32 = neck["down32"]
    y = _group_norm1(_conv(x, d32["conv1"], stride=2), d32["gn1"])
    res5 = g(_group_norm1(_conv(y, d32["conv2"]), d32["gn2"]), approximate=False)

    return {"res2": res2, "res3": res3, "res4": res4, "res5": res5}
