"""CLIP ViT vision tower (ViT-L/14-336 for LLaVA-1.5) in functional JAX.

Scan-over-layers with stacked params, like the LLaMA tower.  The patchify
"conv" is expressed as reshape + matmul so the whole embedding step is one
MXU matmul instead of a convolution (stride == kernel size makes them
mathematically identical).

Matches HF ``CLIPVisionModel`` semantics: class embedding prepended, learned
position embeddings, pre-LayerNorm transformer with QuickGELU MLP.  LLaVA
consumes ``hidden_states[vision_feature_layer]`` (default -2, i.e. the input
to the last layer) with the CLS token dropped ("default" select strategy) —
see cullavo/arch_cullavo.py:562-571 for the reference behavior.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.ad_checkpoint
import jax.numpy as jnp

from cullavo_tpu.models.llava.config import ClipVisionConfig
from cullavo_tpu.ops import nf4 as nf4_ops

Params = Any


def init_clip_vision_params(cfg: ClipVisionConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 12)
    L, D, I = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    P = cfg.patch_size

    def dense(k, shape, fan_in):
        return (jax.random.normal(k, shape) * (fan_in ** -0.5)).astype(dtype)

    return {
        "class_embedding": (jax.random.normal(ks[0], (D,)) * 0.02).astype(dtype),
        # patch embedding as a [P*P*3, D] matmul weight
        "patch_embedding": dense(ks[1], (P * P * 3, D), P * P * 3),
        "position_embedding": (jax.random.normal(ks[2], (cfg.num_positions, D)) * 0.02).astype(dtype),
        "pre_ln": {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
        "layers": {
            "ln1_scale": jnp.ones((L, D), dtype), "ln1_bias": jnp.zeros((L, D), dtype),
            "q": dense(ks[3], (L, D, D), D), "q_b": jnp.zeros((L, D), dtype),
            "k": dense(ks[4], (L, D, D), D), "k_b": jnp.zeros((L, D), dtype),
            "v": dense(ks[5], (L, D, D), D), "v_b": jnp.zeros((L, D), dtype),
            "o": dense(ks[6], (L, D, D), D), "o_b": jnp.zeros((L, D), dtype),
            "ln2_scale": jnp.ones((L, D), dtype), "ln2_bias": jnp.zeros((L, D), dtype),
            "fc1": dense(ks[7], (L, D, I), D), "fc1_b": jnp.zeros((L, I), dtype),
            "fc2": dense(ks[8], (L, I, D), I), "fc2_b": jnp.zeros((L, D), dtype),
        },
        "post_ln": {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
    }


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float) -> jax.Array:
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + eps)
    return (x * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def patchify(pixel_values: jax.Array, patch: int) -> jax.Array:
    """[B, 3, H, W] → [B, N, P*P*3] with channel-major layout matching a
    conv weight reshaped as [D, 3, P, P] → [3*P*P, D]."""
    B, C, H, W = pixel_values.shape
    gh, gw = H // patch, W // patch
    x = pixel_values.reshape(B, C, gh, patch, gw, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5)          # [B, gh, gw, C, P, P]
    return x.reshape(B, gh * gw, C * patch * patch)


def clip_vision_forward(
    params: Params,
    cfg: ClipVisionConfig,
    pixel_values: jax.Array,    # [B, 3, H, W]
    feature_layer: int = -2,
    lora: "dict | None" = None,   # stacked adapters w/ per-layer masks
    lora_scaling: float = 0.0,
    remat: bool = False,          # checkpoint each encoder layer
) -> jax.Array:
    """Returns hidden states after ``num_hidden_layers + feature_layer + 1``
    encoder layers (HF's ``hidden_states[feature_layer]``), shape [B, N+1, D].
    """
    B = pixel_values.shape[0]
    D, H = cfg.hidden_size, cfg.num_attention_heads
    hd = cfg.head_dim
    eps = cfg.layer_norm_eps
    dtype = params["patch_embedding"].dtype

    patches = patchify(pixel_values.astype(dtype), cfg.patch_size)
    x = patches @ params["patch_embedding"]                      # [B, N, D]
    cls = jnp.broadcast_to(params["class_embedding"], (B, 1, D))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"][None]
    x = layer_norm(x, params["pre_ln"]["scale"], params["pre_ln"]["bias"], eps)

    # run only up to the requested feature layer (LLaVA uses -2 → skip last)
    n_run = cfg.num_hidden_layers + feature_layer + 1 if feature_layer < 0 else feature_layer
    T = x.shape[1]

    def layer(h, scanned):
        w = scanned["w"] if isinstance(scanned, dict) and "w" in scanned else scanned
        ad = scanned.get("lora", {}) if isinstance(scanned, dict) else {}

        def mm(x, weight, bias, adapter):
            if nf4_ops.is_quantized_int8(weight):
                # int8 vision tower (quantize_vision_weights): s8s8 MXU at
                # the tower's prefill-sized M when calibrated, exact
                # convert-in-dot otherwise — same policy as llama.mm
                y = nf4_ops.int8_linear_policy(x, weight) + bias
            else:
                y = x @ weight + bias
            if adapter is not None:
                # saved by the remat policy below — recomputing the [M, r]
                # intermediate re-streams the full activation (llama.py
                # _adapter rationale)
                u = jax.ad_checkpoint.checkpoint_name(
                    x @ adapter["a"], "lora_u")
                upd = (u @ adapter["b"]) * adapter["mask"][0, 0]
                y = y + lora_scaling * upd.astype(y.dtype)
            return y

        residual = h
        y = layer_norm(h, w["ln1_scale"], w["ln1_bias"], eps)
        q = mm(y, w["q"], w["q_b"], ad.get("q")).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        k = mm(y, w["k"], w["k_b"], ad.get("k")).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        v = mm(y, w["v"], w["v_b"], ad.get("v")).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(h.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                          preferred_element_type=jnp.float32).astype(h.dtype)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, T, D)
        h = residual + mm(attn, w["o"], w["o_b"], ad.get("o"))
        residual = h
        y = layer_norm(h, w["ln2_scale"], w["ln2_bias"], eps)
        y = quick_gelu(mm(y, w["fc1"], w["fc1_b"], ad.get("fc1")))
        h = residual + mm(y, w["fc2"], w["fc2_b"], ad.get("fc2"))
        return h, None

    # static truncation of the stacked layer params to the first n_run layers
    scanned = {"w": jax.tree.map(lambda a: a[:n_run], params["layers"])}
    if lora:
        scanned["lora"] = jax.tree.map(lambda a: a[:n_run], lora)
    # per-layer remat: without it the backward keeps every layer's 577x577
    # attention scores live ([23, B, 16, 577, 577] fp32+bf16 = 6.2 GB at
    # B=8 — the single largest allocation of the unremated train step)
    layer_fn = (jax.checkpoint(
        layer,
        policy=jax.checkpoint_policies.save_only_these_names("lora_u"))
                if remat else layer)
    x, _ = jax.lax.scan(layer_fn, x, scanned)
    return x
