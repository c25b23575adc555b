"""BLIP-2 vision tower (EVA-ViT-g architecture as shipped in HF Blip2).

TPU design mirrors cullavo_tpu/models/llava/clip_vit.py: patchify as one
matmul (MXU), scan over stacked layer params, pre-norm blocks.  Differences
from CLIP: fused QKV projection (bias-free), no pre-embedding LayerNorm,
GELU (not quick-GELU), learned position table over 257 positions.

Capability reference: the HF model the reference loads in
pipeline/BLIP2VQAVALPipeline.py:100-130.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cullavo_tpu.models.blip2.config import Blip2VisionConfig


def layer_norm(x, g, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)


def init_blip2_vision_params(cfg: Blip2VisionConfig, key, dtype=jnp.float32):
    D, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    P = cfg.patch_size
    ks = jax.random.split(key, 8)
    s = 0.02

    def nrm(k, shape, scale=s):
        return (jax.random.normal(k, shape) * scale).astype(dtype)

    return {
        "class_emb": nrm(ks[0], (D,)),
        "patch_kernel": nrm(ks[1], (3 * P * P, D)),
        "pos_emb": nrm(ks[2], (cfg.num_patches + 1, D)),
        "layers": {
            "qkv": nrm(ks[3], (L, D, 3 * D)),
            "proj": nrm(ks[4], (L, D, D)),
            "proj_b": jnp.zeros((L, D), dtype),
            "ln1": jnp.ones((L, D), dtype), "ln1_b": jnp.zeros((L, D), dtype),
            "ln2": jnp.ones((L, D), dtype), "ln2_b": jnp.zeros((L, D), dtype),
            "fc1": nrm(ks[5], (L, D, I)), "fc1_b": jnp.zeros((L, I), dtype),
            "fc2": nrm(ks[6], (L, I, D)), "fc2_b": jnp.zeros((L, D), dtype),
        },
        "post_ln": jnp.ones((D,), dtype), "post_ln_b": jnp.zeros((D,), dtype),
    }


def _act(name):
    return {"gelu": lambda x: jax.nn.gelu(x, approximate=False),
            "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
            "relu": jax.nn.relu}[name]


def blip2_vision_forward(params, cfg: Blip2VisionConfig, pixel_values,
                         compute_dtype=None):
    """pixel_values [B, 3, H, W] → last hidden [B, 1+P, D] (post-LN applied)."""
    B = pixel_values.shape[0]
    P, D = cfg.patch_size, cfg.hidden_size
    H = cfg.num_attention_heads
    hd = cfg.head_dim
    n = cfg.image_size // P
    dtype = compute_dtype or params["patch_kernel"].dtype
    act = _act(cfg.hidden_act)
    eps = cfg.layer_norm_eps

    # patchify-as-matmul: [B,3,H,W] → [B, n*n, 3*P*P] @ [3*P*P, D]
    x = pixel_values.astype(dtype).reshape(B, 3, n, P, n, P)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, n * n, 3 * P * P)
    x = x @ params["patch_kernel"].astype(dtype)
    cls = jnp.broadcast_to(params["class_emb"].astype(dtype), (B, 1, D))
    h = jnp.concatenate([cls, x], axis=1) + params["pos_emb"].astype(dtype)
    T = h.shape[1]

    def layer(carry, w):
        h = carry
        x = layer_norm(h, w["ln1"], w["ln1_b"], eps)
        qkv = (x @ w["qkv"].astype(dtype)).reshape(B, T, 3, H, hd)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * (hd ** -0.5)
        att = jax.nn.softmax(att, axis=-1).astype(dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", att, v).transpose(0, 2, 1, 3).reshape(B, T, D)
        h = h + (o @ w["proj"].astype(dtype) + w["proj_b"].astype(dtype))
        x = layer_norm(h, w["ln2"], w["ln2_b"], eps)
        x = act((x @ w["fc1"].astype(dtype) + w["fc1_b"].astype(dtype)).astype(jnp.float32)).astype(dtype)
        h = h + (x @ w["fc2"].astype(dtype) + w["fc2_b"].astype(dtype))
        return h, None

    h, _ = jax.lax.scan(layer, h, params["layers"])
    return layer_norm(h, params["post_ln"], params["post_ln_b"], eps)
