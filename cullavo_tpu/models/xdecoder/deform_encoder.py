"""Deformable-attention pixel decoder (functional JAX).

Capability parity with modeling/vision/encoder/transformer_encoder_deform.py
(MSDeformAttnPixelDecoder): 6-layer deformable-attention encoder over
{res3, res4, res5} (8 heads, 4 sampling points, level embeddings, sine PE,
reference points at pixel centers) + FPN-style fusion with res2 for the
mask features.  The deformable core is cullavo_tpu.ops.msdeform (the
TPU-native replacement for the CUDA MSDeformAttn extension).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from cullavo_tpu.models.llava.clip_vit import layer_norm
from cullavo_tpu.models.xdecoder.decoder import sine_position_embedding
from cullavo_tpu.models.xdecoder.fpn import _conv, _conv_kernel, group_norm
from cullavo_tpu.ops.msdeform import msdeform_attn_module_forward


@dataclasses.dataclass(frozen=True)
class DeformEncoderConfig:
    in_channels: Sequence[int] = (192, 384, 768, 1536)  # res2..res5
    conv_dim: int = 512
    mask_dim: int = 512
    num_layers: int = 6
    num_heads: int = 8
    num_points: int = 4
    ffn_dim: int = 1024
    gn_groups: int = 32
    layer_norm_eps: float = 1e-5


def _d(key, shape, dtype):
    return (jax.random.normal(key, shape) * 0.02).astype(dtype)


def init_deform_encoder_params(cfg: DeformEncoderConfig, key: jax.Array,
                               dtype=jnp.float32):
    ks = iter(jax.random.split(key, 128))
    D = cfg.conv_dim
    params: dict = {
        # 1x1 input projections + GN for res3..res5 (deform levels)
        "input_proj": [
            {"kernel": _conv_kernel(next(ks), 1, cin, D, dtype),
             "bias": jnp.zeros((D,), dtype),
             "norm": {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)}}
            for cin in cfg.in_channels[1:]],
        "level_embed": _d(next(ks), (3, D), dtype),
        "layers": [],
        # res2 lateral + output conv for the FPN fusion step
        "lateral": {"kernel": _conv_kernel(next(ks), 1, cfg.in_channels[0], D, dtype),
                    "bias": jnp.zeros((D,), dtype),
                    "norm": {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)}},
        "output": {"kernel": _conv_kernel(next(ks), 3, D, D, dtype),
                   "bias": jnp.zeros((D,), dtype),
                   "norm": {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)}},
        # 1x1 like the reference ("use 1x1 conv instead",
        # transformer_encoder_deform.py:244-252)
        "mask_features": {"kernel": _conv_kernel(next(ks), 1, D, cfg.mask_dim, dtype),
                          "bias": jnp.zeros((cfg.mask_dim,), dtype)},
    }
    L = 3
    for _ in range(cfg.num_layers):
        params["layers"].append({
            "attn": {
                "value_proj": {"w": _d(next(ks), (D, D), dtype), "b": jnp.zeros((D,), dtype)},
                "offset": {"w": jnp.zeros((D, cfg.num_heads * L * cfg.num_points * 2), dtype),
                           "b": _init_offset_bias(cfg, dtype)},
                "weight": {"w": jnp.zeros((D, cfg.num_heads * L * cfg.num_points), dtype),
                           "b": jnp.zeros((cfg.num_heads * L * cfg.num_points,), dtype)},
                "output": {"w": _d(next(ks), (D, D), dtype), "b": jnp.zeros((D,), dtype)},
            },
            "ln1_s": jnp.ones((D,), dtype), "ln1_b": jnp.zeros((D,), dtype),
            "fc1_w": _d(next(ks), (D, cfg.ffn_dim), dtype),
            "fc1_b": jnp.zeros((cfg.ffn_dim,), dtype),
            "fc2_w": _d(next(ks), (cfg.ffn_dim, D), dtype),
            "fc2_b": jnp.zeros((D,), dtype),
            "ln2_s": jnp.ones((D,), dtype), "ln2_b": jnp.zeros((D,), dtype),
        })
    return params


def _init_offset_bias(cfg, dtype):
    """Deformable-DETR offset init: points spread on a unit circle scaled by
    point index (ms_deform_attn.py _reset_parameters semantics)."""
    import numpy as np

    H, L, P = cfg.num_heads, 3, cfg.num_points
    thetas = np.arange(H) * (2 * np.pi / H)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)          # [H, 2]
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    bias = np.tile(grid[:, None, None, :], (1, L, P, 1))
    for p in range(P):
        bias[:, :, p] *= (p + 1)
    return jnp.asarray(bias.reshape(-1), dtype)


def deform_encoder_forward(params, cfg: DeformEncoderConfig, features: dict):
    """features {"res2".."res5"} NHWC → (mask_features, None, pyramid[3])."""
    eps = cfg.layer_norm_eps
    D = cfg.conv_dim
    lvls = ["res5", "res4", "res3"]          # coarse→fine like the FPN path
    srcs, poss, shapes = [], [], []
    for i, name in enumerate(lvls):
        f = features[name]
        proj = params["input_proj"][2 - i]    # input_proj stored res3→res5
        x = _conv(f, proj, padding="VALID")
        x = group_norm(x, proj["norm"]["scale"], proj["norm"]["bias"], cfg.gn_groups)
        B, H, W, _ = x.shape
        # level_embed folds into the positional stream, NOT the value stream:
        # the reference builds lvl_pos_embed = pos + level_embed and re-adds it
        # to the evolving src every layer for the query only
        # (transformer_encoder_deform.py:76,123-125)
        pos = sine_position_embedding(H, W, D)[None] + params["level_embed"][i]
        srcs.append(x.reshape(B, H * W, D))
        poss.append(jnp.broadcast_to(pos, (B, H * W, D)))
        shapes.append((H, W))

    src = jnp.concatenate(srcs, axis=1)
    pos = jnp.concatenate(poss, axis=1)
    B = src.shape[0]

    # reference points: pixel centers of each level, normalized, shared across levels
    ref_list = []
    for (H, W) in shapes:
        ys = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
        xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W
        yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
        ref_list.append(jnp.stack([xx, yy], -1).reshape(-1, 2))
    ref = jnp.concatenate(ref_list, axis=0)[None]                 # [1, S, 2]
    ref = jnp.broadcast_to(ref[:, :, None, :], (B, ref.shape[1], 3, 2))

    x = src
    for lw in params["layers"]:
        q = x + pos
        attn_out = msdeform_attn_module_forward(
            lw["attn"], q, x, shapes, ref, cfg.num_heads, 3, cfg.num_points)
        x = layer_norm(x + attn_out, lw["ln1_s"], lw["ln1_b"], eps)
        y = jax.nn.relu(x @ lw["fc1_w"] + lw["fc1_b"]) @ lw["fc2_w"] + lw["fc2_b"]
        x = layer_norm(x + y, lw["ln2_s"], lw["ln2_b"], eps)

    # split back to levels
    outs = []
    offset = 0
    for (H, W) in shapes:
        outs.append(x[:, offset:offset + H * W].reshape(B, H, W, D))
        offset += H * W

    # FPN fusion with res2 for mask features
    lat = params["lateral"]
    cur = group_norm(_conv(features["res2"], lat, padding="VALID"),
                     lat["norm"]["scale"], lat["norm"]["bias"], cfg.gn_groups)
    Hc, Wc = cur.shape[1:3]
    up = jax.image.resize(outs[-1], (B, Hc, Wc, D), method="bilinear")
    oc = params["output"]
    y = jax.nn.relu(group_norm(_conv(cur + up, oc), oc["norm"]["scale"],
                               oc["norm"]["bias"], cfg.gn_groups))
    mask_features = _conv(y, params["mask_features"])
    # middle return = res5 transformer output, like the reference's
    # transformer_encoder_features (transformer_encoder_deform.py:361) and
    # fpn_forward's transformer_features
    return mask_features, outs[0], outs
