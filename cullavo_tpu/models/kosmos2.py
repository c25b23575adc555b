"""KOSMOS-2 — TPU-native grounded VL decoder.

Replaces the HF wrapper the reference uses in pipeline/KOSMOS2VQAVALPipeline.py
with a first-class JAX model: the CLIP-L/14-224 vision tower is shared with
the LLaVA stack (models/llava/clip_vit.py), image features are pooled by a
64-latent-query cross-attention projection, and the 24-layer text decoder runs
as scan-over-layers with KV-cache greedy decode.

Architecture notes (vs LLaMA): sinusoidal positions with the M2M100 +2/pad
offset convention, sqrt(D) embedding scale, pre-norm blocks with an extra
LayerNorm on the attention output (inner_attn_ln) and inside the FFN
(ffn_layernorm over ffn_dim), GELU, tied lm_head.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cullavo_tpu.models.llava.config import ClipVisionConfig
from cullavo_tpu.models.llava.clip_vit import (clip_vision_forward,
                                               init_clip_vision_params,
                                               layer_norm)

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class Kosmos2TextConfig:
    vocab_size: int = 65037
    embed_dim: int = 2048
    layers: int = 24
    ffn_dim: int = 8192
    attention_heads: int = 32
    max_position_embeddings: int = 2048
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1
    scale_embedding: bool = True

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.attention_heads


@dataclasses.dataclass(frozen=True)
class Kosmos2Config:
    vision: ClipVisionConfig = dataclasses.field(
        default_factory=lambda: ClipVisionConfig(image_size=224))
    text: Kosmos2TextConfig = dataclasses.field(default_factory=Kosmos2TextConfig)
    latent_query_num: int = 64


def tiny_kosmos2_config() -> Kosmos2Config:
    return Kosmos2Config(
        vision=ClipVisionConfig(hidden_size=32, intermediate_size=64,
                                num_hidden_layers=2, num_attention_heads=4,
                                image_size=28, patch_size=14),
        text=Kosmos2TextConfig(vocab_size=130, embed_dim=32, layers=2,
                               ffn_dim=64, attention_heads=4,
                               max_position_embeddings=128),
        latent_query_num=3,
    )


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------

def init_kosmos2_params(cfg: Kosmos2Config, key, dtype=jnp.float32):
    tc = cfg.text
    D, F, L = tc.embed_dim, tc.ffn_dim, tc.layers
    ks = jax.random.split(key, 14)
    s = 0.02

    def nrm(k, shape):
        return (jax.random.normal(k, shape) * s).astype(dtype)

    def ln(shape=(L, D)):
        return jnp.ones(shape, dtype), jnp.zeros(shape, dtype)

    attn_ln, attn_ln_b = ln()
    inner_ln, inner_ln_b = ln()
    final_ln, final_ln_b = ln()
    ffn_ln, ffn_ln_b = ln((L, F))
    return {
        "vision": init_clip_vision_params(cfg.vision, ks[0], dtype),
        "projection": {
            "dense": {"w": nrm(ks[1], (cfg.vision.hidden_size, D)),
                      "b": jnp.zeros((D,), dtype)},
            "latent_query": nrm(ks[2], (cfg.latent_query_num, D)),
            "x_attn": {"q": {"w": nrm(ks[3], (D, D)), "b": jnp.zeros((D,), dtype)},
                       "k": {"w": nrm(ks[4], (D, D)), "b": jnp.zeros((D,), dtype)},
                       "v": {"w": nrm(ks[5], (D, D)), "b": jnp.zeros((D,), dtype)},
                       "o": {"w": nrm(ks[6], (D, D)), "b": jnp.zeros((D,), dtype)}},
        },
        "embed_tokens": nrm(ks[7], (tc.vocab_size, D)),
        "final_ln": jnp.ones((D,), dtype), "final_ln_b": jnp.zeros((D,), dtype),
        "layers": {
            "q": nrm(ks[8], (L, D, D)), "q_b": jnp.zeros((L, D), dtype),
            "k": nrm(ks[9], (L, D, D)), "k_b": jnp.zeros((L, D), dtype),
            "v": nrm(ks[10], (L, D, D)), "v_b": jnp.zeros((L, D), dtype),
            "o": nrm(ks[11], (L, D, D)), "o_b": jnp.zeros((L, D), dtype),
            "attn_ln": attn_ln, "attn_ln_b": attn_ln_b,
            "inner_ln": inner_ln, "inner_ln_b": inner_ln_b,
            "final_ln": final_ln, "final_ln_b": final_ln_b,
            "fc1": nrm(ks[12], (L, D, F)), "fc1_b": jnp.zeros((L, F), dtype),
            "fc2": nrm(ks[13], (L, F, D)), "fc2_b": jnp.zeros((L, D), dtype),
            "ffn_ln": ffn_ln, "ffn_ln_b": ffn_ln_b,
        },
    }


# ---------------------------------------------------------------------------
# pieces
# ---------------------------------------------------------------------------

def sinusoid_positions(position_ids: jax.Array, dim: int,
                       padding_idx: int) -> jax.Array:
    """M2M100-convention sinusoid rows for raw table indices ``position_ids``
    (the +offset is already folded into the ids); the padding row is zero."""
    half = dim // 2
    factor = math.log(10000.0) / (half - 1)
    freq = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -factor)
    ang = position_ids.astype(jnp.float32)[..., None] * freq
    emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, 1)])
    return jnp.where((position_ids == padding_idx)[..., None], 0.0, emb)


def kosmos2_position_ids(attention_mask: jax.Array, pad_idx: int) -> jax.Array:
    """HF create_position_ids_from_input_ids: cumsum over non-pad + pad_idx."""
    return jnp.cumsum(attention_mask, axis=1) * attention_mask + pad_idx


def kosmos2_text_forward(
    params, cfg: Kosmos2TextConfig,
    inputs_embeds: jax.Array,            # [B, T, D] (unscaled)
    attention_mask: jax.Array,           # [B, S]
    position_ids: jax.Array,             # [B, T] raw table indices (≥ pad+1)
    cache: Optional[dict] = None,
    cache_index: Optional[jax.Array] = None,
    key_position_ids: Optional[jax.Array] = None,
    stale_cache: bool = False,
):
    B, T, D = inputs_embeds.shape
    H, hd = cfg.attention_heads, cfg.head_dim
    dtype = inputs_embeds.dtype
    eps = cfg.layer_norm_eps
    scale = math.sqrt(D) if cfg.scale_embedding else 1.0

    h = inputs_embeds * scale + sinusoid_positions(
        position_ids, D, cfg.pad_token_id).astype(dtype)

    if cache is None:
        key_pos = position_ids
    else:
        key_pos = key_position_ids
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
        q = (x @ w["q"] + w["q_b"]).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        k = (x @ w["k"] + w["k_b"]).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        v = (x @ w["v"] + w["v_b"]).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
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
        o = layer_norm(o, w["inner_ln"], w["inner_ln_b"], eps)
        h = residual + (o @ w["o"] + w["o_b"])
        residual = h
        x = layer_norm(h, w["final_ln"], w["final_ln_b"], eps)
        x = jax.nn.gelu((x @ w["fc1"] + w["fc1_b"]).astype(jnp.float32),
                        approximate=False).astype(dtype)
        x = layer_norm(x, w["ffn_ln"], w["ffn_ln_b"], eps)
        h = residual + (x @ w["fc2"] + w["fc2_b"])
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


def kosmos2_image_features(params, cfg: Kosmos2Config, pixel_values,
                           compute_dtype=None):
    """pixel → [B, latent_query_num, D]: full CLIP stack → post-LN →
    L2-normalize → dense → latent-query cross-attention pooling."""
    vp = params["vision"]
    h = clip_vision_forward(vp, cfg.vision, pixel_values, feature_layer=-1)
    h = layer_norm(h, vp["post_ln"]["scale"], vp["post_ln"]["bias"],
                   cfg.vision.layer_norm_eps)
    h = h / jnp.linalg.norm(h.astype(jnp.float32), axis=-1, keepdims=True).astype(h.dtype)

    pj = params["projection"]
    h = h @ pj["dense"]["w"] + pj["dense"]["b"]
    B = h.shape[0]
    D = h.shape[-1]
    H = cfg.text.attention_heads
    hd = cfg.text.head_dim
    lat = jnp.broadcast_to(pj["latent_query"], (B,) + pj["latent_query"].shape)
    kv = jnp.concatenate([h, lat], axis=1)
    w = pj["x_attn"]
    Q, S = lat.shape[1], kv.shape[1]
    q = (lat @ w["q"]["w"] + w["q"]["b"]).reshape(B, Q, H, hd).transpose(0, 2, 1, 3)
    k = (kv @ w["k"]["w"] + w["k"]["b"]).reshape(B, S, H, hd).transpose(0, 2, 1, 3)
    v = (kv @ w["v"]["w"] + w["v"]["b"]).reshape(B, S, H, hd).transpose(0, 2, 1, 3)
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * (hd ** -0.5)
    att = jax.nn.softmax(att, axis=-1).astype(lat.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", att, v).transpose(0, 2, 1, 3).reshape(B, Q, D)
    return o @ w["o"]["w"] + w["o"]["b"]


def _scatter_image_embeds(inputs_embeds, image_embeds, img_mask):
    """Place image_embeds [B, N, D] at the True positions of img_mask [B, T]
    (each row has exactly N) — cumsum-rank gather, same trick as
    merge_image_features in models/llava/modeling.py."""
    rank = jnp.cumsum(img_mask.astype(jnp.int32), axis=1) - 1
    rank = jnp.clip(rank, 0, image_embeds.shape[1] - 1)
    gathered = jnp.take_along_axis(image_embeds, rank[..., None], axis=1)
    return jnp.where(img_mask[..., None], gathered.astype(inputs_embeds.dtype),
                     inputs_embeds)


def kosmos2_forward(params, cfg: Kosmos2Config, pixel_values, input_ids,
                    image_embeds_position_mask, attention_mask,
                    compute_dtype=None):
    """Returns logits [B, T, V] (lm_head tied to embed_tokens)."""
    feats = kosmos2_image_features(params, cfg, pixel_values, compute_dtype)
    emb = params["embed_tokens"][input_ids]
    emb = _scatter_image_embeds(emb, feats, image_embeds_position_mask.astype(bool))
    pos = kosmos2_position_ids(attention_mask, cfg.text.pad_token_id)
    h, _ = kosmos2_text_forward(params, cfg.text, emb, attention_mask, pos)
    return h @ params["embed_tokens"].T


def kosmos2_init_cache(cfg: Kosmos2TextConfig, batch, max_len, dtype=jnp.float32):
    z = jnp.zeros((cfg.layers, batch, cfg.attention_heads, max_len, cfg.head_dim), dtype)
    return {"k": z, "v": z}


def kosmos2_generate(params, cfg: Kosmos2Config, pixel_values, input_ids,
                     image_embeds_position_mask, attention_mask,
                     max_new_tokens: int, eos_token_id: int = -1,
                     compute_dtype=None):
    """Greedy KV-cache decode; returns [B, max_new_tokens]."""
    tc = cfg.text
    feats = kosmos2_image_features(params, cfg, pixel_values, compute_dtype)
    emb = params["embed_tokens"][input_ids]
    emb = _scatter_image_embeds(emb, feats, image_embeds_position_mask.astype(bool))
    B, T = input_ids.shape
    max_len = T + max_new_tokens
    pos0 = kosmos2_position_ids(attention_mask, tc.pad_token_id)

    cache = kosmos2_init_cache(tc, B, max_len, emb.dtype)
    full_mask = jnp.concatenate(
        [attention_mask, jnp.zeros((B, max_new_tokens), attention_mask.dtype)], axis=1)
    key_pos = jnp.concatenate(
        [pos0, jnp.zeros((B, max_new_tokens), pos0.dtype)], axis=1)
    h, cache = kosmos2_text_forward(params, tc, emb, full_mask, pos0, cache,
                                    jnp.int32(0), key_pos)
    # sample from each row's LAST VALID position (right-padded rows end
    # before the buffer edge)
    last_idx = jnp.sum(attention_mask, axis=1).astype(jnp.int32) - 1
    rows = jnp.arange(B)
    last_pos = pos0[rows, last_idx]
    h_last = h[rows, last_idx]
    tok0 = jnp.argmax(h_last @ params["embed_tokens"].T, -1).astype(jnp.int32)

    def body(state):
        i, tok, cache, full_mask, key_pos, last_pos, out, done = state
        out = out.at[:, i].set(jnp.where(done, out[:, i], tok))
        done = done | (tok == eos_token_id)
        idx = T + i
        new_pos = last_pos + 1
        emb = params["embed_tokens"][tok[:, None]]
        # stale-cache decode: stale-read attention + per-layer in-place
        # scatter inside the layer scan (see kosmos2_text_forward)
        h, cache = kosmos2_text_forward(params, tc, emb, full_mask,
                                        new_pos[:, None], cache, idx, key_pos,
                                        stale_cache=True)
        full_mask = full_mask.at[:, idx].set(1)
        key_pos = key_pos.at[:, idx].set(new_pos)
        nxt = jnp.argmax(h[:, -1] @ params["embed_tokens"].T, -1).astype(jnp.int32)
        return (i + 1, nxt, cache, full_mask, key_pos, new_pos, out, done)

    def cond(state):
        i, _, _, _, _, _, _, done = state
        return (i < max_new_tokens) & ~jnp.all(done)

    out = jnp.zeros((B, max_new_tokens), jnp.int32)
    done = jnp.zeros((B,), bool)
    state = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), tok0, cache, full_mask, key_pos, last_pos, out, done))
    return state[6]


# ---------------------------------------------------------------------------
# HF import
# ---------------------------------------------------------------------------

def import_kosmos2_torch(hf_model, cfg: Kosmos2Config, dtype=np.float32) -> dict:
    """Map torch Kosmos2ForConditionalGeneration to our param tree."""
    sd = {k: v.detach().cpu().numpy().astype(dtype)
          for k, v in hf_model.state_dict().items()}

    def t(name):
        return np.ascontiguousarray(sd[name].T)

    def g(name):
        return sd[name]

    vb = "vision_model.model"
    Lv, P = cfg.vision.num_hidden_layers, cfg.vision.patch_size

    def vstack(fmt, transpose=True):
        return np.stack([t(fmt.format(i)) if transpose else g(fmt.format(i))
                         for i in range(Lv)])

    pk = g(f"{vb}.embeddings.patch_embedding.weight")       # [D, 3, P, P]
    vision = {
        "class_embedding": g(f"{vb}.embeddings.class_embedding").reshape(-1),
        # clip_vit patchify flattens [3, P, P]-ordered patches
        "patch_embedding": pk.reshape(cfg.vision.hidden_size, 3 * P * P).T.copy(),
        "position_embedding": g(f"{vb}.embeddings.position_embedding.weight"),
        "pre_ln": {"scale": g(f"{vb}.pre_layrnorm.weight"),
                   "bias": g(f"{vb}.pre_layrnorm.bias")},
        "post_ln": {"scale": g(f"{vb}.post_layernorm.weight"),
                    "bias": g(f"{vb}.post_layernorm.bias")},
        "layers": {
            "q": vstack(vb + ".encoder.layers.{}.self_attn.q_proj.weight"),
            "q_b": vstack(vb + ".encoder.layers.{}.self_attn.q_proj.bias", False),
            "k": vstack(vb + ".encoder.layers.{}.self_attn.k_proj.weight"),
            "k_b": vstack(vb + ".encoder.layers.{}.self_attn.k_proj.bias", False),
            "v": vstack(vb + ".encoder.layers.{}.self_attn.v_proj.weight"),
            "v_b": vstack(vb + ".encoder.layers.{}.self_attn.v_proj.bias", False),
            "o": vstack(vb + ".encoder.layers.{}.self_attn.out_proj.weight"),
            "o_b": vstack(vb + ".encoder.layers.{}.self_attn.out_proj.bias", False),
            "ln1_scale": vstack(vb + ".encoder.layers.{}.layer_norm1.weight", False),
            "ln1_bias": vstack(vb + ".encoder.layers.{}.layer_norm1.bias", False),
            "ln2_scale": vstack(vb + ".encoder.layers.{}.layer_norm2.weight", False),
            "ln2_bias": vstack(vb + ".encoder.layers.{}.layer_norm2.bias", False),
            "fc1": vstack(vb + ".encoder.layers.{}.mlp.fc1.weight"),
            "fc1_b": vstack(vb + ".encoder.layers.{}.mlp.fc1.bias", False),
            "fc2": vstack(vb + ".encoder.layers.{}.mlp.fc2.weight"),
            "fc2_b": vstack(vb + ".encoder.layers.{}.mlp.fc2.bias", False),
        },
    }

    def dense(prefix):
        return {"w": t(prefix + ".weight"), "b": g(prefix + ".bias")}

    pj = "image_to_text_projection"
    projection = {
        "dense": dense(f"{pj}.dense"),
        "latent_query": g(f"{pj}.latent_query"),
        "x_attn": {"q": dense(f"{pj}.x_attn.q_proj"),
                   "k": dense(f"{pj}.x_attn.k_proj"),
                   "v": dense(f"{pj}.x_attn.v_proj"),
                   "o": dense(f"{pj}.x_attn.out_proj")},
    }

    tb = "text_model.model"
    Lt = cfg.text.layers

    def tstack(fmt, transpose=True):
        return np.stack([t(fmt.format(i)) if transpose else g(fmt.format(i))
                         for i in range(Lt)])

    return {
        "vision": vision,
        "projection": projection,
        "embed_tokens": g(f"{tb}.embed_tokens.weight"),
        "final_ln": g(f"{tb}.layer_norm.weight"),
        "final_ln_b": g(f"{tb}.layer_norm.bias"),
        "layers": {
            "q": tstack(tb + ".layers.{}.self_attn.q_proj.weight"),
            "q_b": tstack(tb + ".layers.{}.self_attn.q_proj.bias", False),
            "k": tstack(tb + ".layers.{}.self_attn.k_proj.weight"),
            "k_b": tstack(tb + ".layers.{}.self_attn.k_proj.bias", False),
            "v": tstack(tb + ".layers.{}.self_attn.v_proj.weight"),
            "v_b": tstack(tb + ".layers.{}.self_attn.v_proj.bias", False),
            "o": tstack(tb + ".layers.{}.self_attn.out_proj.weight"),
            "o_b": tstack(tb + ".layers.{}.self_attn.out_proj.bias", False),
            "inner_ln": tstack(tb + ".layers.{}.self_attn.inner_attn_ln.weight", False),
            "inner_ln_b": tstack(tb + ".layers.{}.self_attn.inner_attn_ln.bias", False),
            "attn_ln": tstack(tb + ".layers.{}.self_attn_layer_norm.weight", False),
            "attn_ln_b": tstack(tb + ".layers.{}.self_attn_layer_norm.bias", False),
            "final_ln": tstack(tb + ".layers.{}.final_layer_norm.weight", False),
            "final_ln_b": tstack(tb + ".layers.{}.final_layer_norm.bias", False),
            "fc1": tstack(tb + ".layers.{}.ffn.fc1.weight"),
            "fc1_b": tstack(tb + ".layers.{}.ffn.fc1.bias", False),
            "fc2": tstack(tb + ".layers.{}.ffn.fc2.weight"),
            "fc2_b": tstack(tb + ".layers.{}.ffn.fc2.bias", False),
            "ffn_ln": tstack(tb + ".layers.{}.ffn.ffn_layernorm.weight", False),
            "ffn_ln_b": tstack(tb + ".layers.{}.ffn.ffn_layernorm.bias", False),
        },
    }
