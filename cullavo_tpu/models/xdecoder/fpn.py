"""FPN pixel decoder with transformer-encoded top level (functional JAX).

Capability parity with modeling/vision/encoder/transformer_encoder_fpn.py
(TransformerEncoderPixelDecoder at the active config: conv_dim=mask_dim=512,
GroupNorm, 6-layer post-norm transformer encoder on res5 with sine PE;
top-down path of 1x1 lateral (GN) + nearest-upsample + 3x3 output convs
(GN+ReLU); 3x3 mask-features head; returns (mask_features,
transformer_features, 3-level pyramid [res5', res4', res3'])).

NHWC layout; convs via lax.conv_general_dilated.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from cullavo_tpu.models.llava.clip_vit import layer_norm
from cullavo_tpu.models.xdecoder.decoder import sine_position_embedding


@dataclasses.dataclass(frozen=True)
class FPNConfig:
    in_channels: Sequence[int] = (192, 384, 768, 1536)  # res2..res5 (focal-L)
    conv_dim: int = 512
    mask_dim: int = 512
    gn_groups: int = 32
    enc_layers: int = 6
    enc_heads: int = 8
    enc_ffn: int = 2048
    layer_norm_eps: float = 1e-5


def _conv_kernel(key, k, cin, cout, dtype):
    fan_in = k * k * cin
    return (jax.random.normal(key, (k, k, cin, cout)) * (2.0 / fan_in) ** 0.5).astype(dtype)


def init_fpn_params(cfg: FPNConfig, key: jax.Array, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 256))  # sized for real configs (9-layer decoder / 6-layer encoder), not just tests
    D = cfg.conv_dim

    def gn():
        return {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)}

    params: dict = {
        # res5 path
        "input_proj": {"kernel": _conv_kernel(next(ks), 1, cfg.in_channels[-1], D, dtype),
                       "bias": jnp.zeros((D,), dtype)},
        "encoder_layers": [],
        "output_convs": [],   # index 0 = res5 level, then res4, res3, res2
        "lateral_convs": [],  # for res4, res3, res2
        "mask_features": {"kernel": _conv_kernel(next(ks), 3, D, cfg.mask_dim, dtype),
                          "bias": jnp.zeros((cfg.mask_dim,), dtype)},
    }
    for _ in range(cfg.enc_layers):
        params["encoder_layers"].append({
            "q_w": (jax.random.normal(next(ks), (D, D)) * 0.02).astype(dtype),
            "q_b": jnp.zeros((D,), dtype),
            "k_w": (jax.random.normal(next(ks), (D, D)) * 0.02).astype(dtype),
            "k_b": jnp.zeros((D,), dtype),
            "v_w": (jax.random.normal(next(ks), (D, D)) * 0.02).astype(dtype),
            "v_b": jnp.zeros((D,), dtype),
            "o_w": (jax.random.normal(next(ks), (D, D)) * 0.02).astype(dtype),
            "o_b": jnp.zeros((D,), dtype),
            "ln1_s": jnp.ones((D,), dtype), "ln1_b": jnp.zeros((D,), dtype),
            "fc1_w": (jax.random.normal(next(ks), (D, cfg.enc_ffn)) * 0.02).astype(dtype),
            "fc1_b": jnp.zeros((cfg.enc_ffn,), dtype),
            "fc2_w": (jax.random.normal(next(ks), (cfg.enc_ffn, D)) * 0.02).astype(dtype),
            "fc2_b": jnp.zeros((D,), dtype),
            "ln2_s": jnp.ones((D,), dtype), "ln2_b": jnp.zeros((D,), dtype),
        })
    # output convs: res5 (idx0) .. res2 (idx3)
    for _ in range(4):
        params["output_convs"].append({
            "kernel": _conv_kernel(next(ks), 3, D, D, dtype),
            "bias": jnp.zeros((D,), dtype), "norm": gn()})
    for cin in cfg.in_channels[-2::-1]:  # res4, res3, res2
        params["lateral_convs"].append({
            "kernel": _conv_kernel(next(ks), 1, cin, D, dtype),
            "bias": jnp.zeros((D,), dtype), "norm": gn()})
    return params


def group_norm(x: jax.Array, scale, bias, groups: int, eps: float = 1e-5):
    """NHWC group norm."""
    B, H, W, C = x.shape
    g = x.reshape(B, H, W, groups, C // groups).astype(jnp.float32)
    mean = jnp.mean(g, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(g, axis=(1, 2, 4), keepdims=True)
    g = (g - mean) * jax.lax.rsqrt(var + eps)
    out = g.reshape(B, H, W, C).astype(x.dtype)
    return out * scale + bias


def _conv(x, w, stride=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, w["kernel"], window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + w["bias"]


def _encoder_layer(w, x, pos, heads, eps):
    """Post-norm DETR encoder layer: q=k=x+pos, v=x."""
    B, N, D = x.shape
    hd = D // heads
    q = ((x + pos) @ w["q_w"] + w["q_b"]).reshape(B, N, heads, hd).transpose(0, 2, 1, 3)
    k = ((x + pos) @ w["k_w"] + w["k_b"]).reshape(B, N, heads, hd).transpose(0, 2, 1, 3)
    v = (x @ w["v_w"] + w["v_b"]).reshape(B, N, heads, hd).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * (hd ** -0.5)
    p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    a = jnp.einsum("bhqk,bhkd->bhqd", p, v, preferred_element_type=jnp.float32).astype(x.dtype)
    a = a.transpose(0, 2, 1, 3).reshape(B, N, D)
    x = layer_norm(x + (a @ w["o_w"] + w["o_b"]), w["ln1_s"], w["ln1_b"], eps)
    y = jax.nn.relu(x @ w["fc1_w"] + w["fc1_b"]) @ w["fc2_w"] + w["fc2_b"]
    return layer_norm(x + y, w["ln2_s"], w["ln2_b"], eps)


def fpn_forward(params, cfg: FPNConfig, features: dict):
    """features: {"res2".."res5": [B, H, W, C]} →
    (mask_features [B, H2, W2, mask_dim], transformer_features,
     multi_scale [res5', res4', res3'] each [B, h, w, conv_dim])."""
    eps = cfg.layer_norm_eps
    x5 = features["res5"]
    B, H5, W5, _ = x5.shape
    t = _conv(x5, params["input_proj"], padding="VALID")
    pos = sine_position_embedding(H5, W5, cfg.conv_dim)[None]
    seq = t.reshape(B, H5 * W5, cfg.conv_dim)
    pos = jnp.broadcast_to(pos, seq.shape)
    for lw in params["encoder_layers"]:
        seq = _encoder_layer(lw, seq, pos, cfg.enc_heads, eps)
    transformer_features = seq.reshape(B, H5, W5, cfg.conv_dim)

    oc = params["output_convs"][0]
    y = jax.nn.relu(group_norm(_conv(transformer_features, oc), oc["norm"]["scale"],
                               oc["norm"]["bias"], cfg.gn_groups))
    multi_scale = [y]

    for i, name in enumerate(["res4", "res3", "res2"]):
        lat = params["lateral_convs"][i]
        oc = params["output_convs"][i + 1]
        cur = group_norm(_conv(features[name], lat, padding="VALID"),
                         lat["norm"]["scale"], lat["norm"]["bias"], cfg.gn_groups)
        Hc, Wc = cur.shape[1], cur.shape[2]
        up = jax.image.resize(y, (B, Hc, Wc, y.shape[-1]), method="nearest")
        y = jax.nn.relu(group_norm(_conv(cur + up, oc), oc["norm"]["scale"],
                                   oc["norm"]["bias"], cfg.gn_groups))
        if len(multi_scale) < 3:
            multi_scale.append(y)

    mask_features = _conv(y, params["mask_features"])
    return mask_features, transformer_features, multi_scale
