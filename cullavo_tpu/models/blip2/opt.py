"""OPT decoder (the BLIP-2 opt-2.7b/6.7b language tower) — TPU-native.

Same design as the LLaMA stack (cullavo_tpu/models/llava/llama.py): stacked
layer params + lax.scan, KV-cache decode with *logical* key positions so
right-padded batches decode correctly.  OPT specifics: learned positional
embeddings with a +2 offset indexed by mask-cumsum, pre-norm blocks with
LayerNorm (not RMSNorm), ReLU FFN, biases everywhere, tied lm_head.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from cullavo_tpu.models.blip2.config import OptConfig
from cullavo_tpu.models.blip2.vision import layer_norm

NEG_INF = -1e9


def init_opt_params(cfg: OptConfig, key, dtype=jnp.float32):
    D, F, L, V = cfg.hidden_size, cfg.ffn_dim, cfg.num_hidden_layers, cfg.vocab_size
    ks = jax.random.split(key, 10)
    s = 0.02

    def nrm(k, shape):
        return (jax.random.normal(k, shape) * s).astype(dtype)

    return {
        "embed_tokens": nrm(ks[0], (V, D)),
        "embed_positions": nrm(ks[1], (cfg.max_position_embeddings + 2, D)),
        "final_ln": jnp.ones((D,), dtype), "final_ln_b": jnp.zeros((D,), dtype),
        "layers": {
            "q": nrm(ks[2], (L, D, D)), "q_b": jnp.zeros((L, D), dtype),
            "k": nrm(ks[3], (L, D, D)), "k_b": jnp.zeros((L, D), dtype),
            "v": nrm(ks[4], (L, D, D)), "v_b": jnp.zeros((L, D), dtype),
            "o": nrm(ks[5], (L, D, D)), "o_b": jnp.zeros((L, D), dtype),
            "attn_ln": jnp.ones((L, D), dtype), "attn_ln_b": jnp.zeros((L, D), dtype),
            "fc1": nrm(ks[6], (L, D, F)), "fc1_b": jnp.zeros((L, F), dtype),
            "fc2": nrm(ks[7], (L, F, D)), "fc2_b": jnp.zeros((L, D), dtype),
            "final_ln": jnp.ones((L, D), dtype), "final_ln_b": jnp.zeros((L, D), dtype),
        },
    }


def opt_position_ids(attention_mask: jax.Array) -> jax.Array:
    """HF OPTLearnedPositionalEmbedding: cumsum(mask)*mask - 1 (offset +2 is
    applied at lookup)."""
    pos = jnp.cumsum(attention_mask, axis=1) * attention_mask - 1
    return jnp.maximum(pos, 0)


def opt_forward(
    params, cfg: OptConfig,
    inputs_embeds: jax.Array,                  # [B, T, D]
    attention_mask: jax.Array,                 # [B, S]
    position_ids: jax.Array,                   # [B, T] (logical, pre-offset)
    cache: Optional[dict] = None,
    cache_index: Optional[jax.Array] = None,
    key_position_ids: Optional[jax.Array] = None,
    stale_cache: bool = False,
):
    """Returns (hidden [B, T, D] after final LN, new_cache).

    ``stale_cache``: 1-token decode fast path — attention reads the cache
    WITHOUT the current position (``attention_mask`` must not include it);
    the cache is carried through the layer scan and each layer writes its
    fresh k/v in place at ``cache_index``; returns the updated full
    ``{"k", "v"}``.  Carry + per-layer DUS (not an outer full-cache DUS)
    is what lets XLA update the cache in place — see
    llava/llama.py::llama_forward's stale_cache note."""
    B, T, D = inputs_embeds.shape
    H, hd = cfg.num_attention_heads, cfg.head_dim
    dtype = inputs_embeds.dtype
    eps = cfg.layer_norm_eps

    h = inputs_embeds + params["embed_positions"].astype(dtype)[position_ids + 2]

    if cache is None:
        key_pos = jnp.arange(T)[None, :]
    elif key_position_ids is not None:
        key_pos = key_position_ids
    else:
        key_pos = jnp.arange(cache["k"].shape[3])[None, :]
    causal = position_ids[:, :, None] >= key_pos[:, None, :]
    ok = causal & attention_mask[:, None, :].astype(bool)
    bias = jnp.where(ok[:, None, :, :], 0.0, NEG_INF).astype(jnp.float32)

    def layer(carry, scanned):
        if stale_cache:
            h, kcar, vcar = carry
        else:
            h = carry
        w = scanned["w"]
        residual = h
        x = layer_norm(h, w["attn_ln"], w["attn_ln_b"], eps)
        q = (x @ w["q"].astype(dtype) + w["q_b"].astype(dtype)).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        k = (x @ w["k"].astype(dtype) + w["k_b"].astype(dtype)).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        v = (x @ w["v"].astype(dtype) + w["v_b"].astype(dtype)).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        out_cache = {}
        if cache is not None and stale_cache:
            from cullavo_tpu.models.llava.llama import sdpa_decode_stale

            li = scanned["li"]
            k_buf = jax.lax.dynamic_index_in_dim(kcar, li, 0, keepdims=False)
            v_buf = jax.lax.dynamic_index_in_dim(vcar, li, 0, keepdims=False)
            o = sdpa_decode_stale(q, k_buf.astype(dtype), v_buf.astype(dtype),
                                  k, v, bias)
            kcar = jax.lax.dynamic_update_slice(
                kcar, k.astype(kcar.dtype)[None], (li, 0, 0, cache_index, 0))
            vcar = jax.lax.dynamic_update_slice(
                vcar, v.astype(vcar.dtype)[None], (li, 0, 0, cache_index, 0))
        else:
            if cache is not None:
                kc = jax.lax.dynamic_update_slice(scanned["k_cache"], k, (0, 0, cache_index, 0))
                vc = jax.lax.dynamic_update_slice(scanned["v_cache"], v, (0, 0, cache_index, 0))
                out_cache = {"k": kc, "v": vc}
                k, v = kc, vc
            att = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * (hd ** -0.5)
            att = jax.nn.softmax(att + bias, axis=-1).astype(dtype)
            o = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, T, D)
        h = residual + (o @ w["o"].astype(dtype) + w["o_b"].astype(dtype))
        residual = h
        x = layer_norm(h, w["final_ln"], w["final_ln_b"], eps)
        x = jax.nn.relu((x @ w["fc1"].astype(dtype) + w["fc1_b"].astype(dtype)
                         ).astype(jnp.float32)).astype(dtype)
        h = residual + (x @ w["fc2"].astype(dtype) + w["fc2_b"].astype(dtype))
        return ((h, kcar, vcar) if stale_cache else h), out_cache

    scanned_in = {"w": params["layers"]}
    if cache is not None:
        if stale_cache:
            scanned_in["li"] = jnp.arange(cache["k"].shape[0])
        else:
            scanned_in.update({"k_cache": cache["k"], "v_cache": cache["v"]})
    init = (h, cache["k"], cache["v"]) if (cache is not None and stale_cache) else h
    h, caches = jax.lax.scan(layer, init, scanned_in)
    new_cache = None
    if cache is not None and stale_cache:
        h, ck, cv = h
        new_cache = {"k": ck, "v": cv}
    elif cache is not None:
        new_cache = {"k": caches["k"], "v": caches["v"]}
    h = layer_norm(h, params["final_ln"], params["final_ln_b"], eps)
    return h, new_cache


def opt_init_cache(cfg: OptConfig, batch: int, max_len: int, dtype=jnp.float32):
    L, H, hd = cfg.num_hidden_layers, cfg.num_attention_heads, cfg.head_dim
    z = jnp.zeros((L, batch, H, max_len, hd), dtype)
    return {"k": z, "v": z}
