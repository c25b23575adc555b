"""BLIP-2 / InstructBLIP assembly: ViT-g → Q-Former → projection → LM.

TPU-native replacement for the HF checkpoints the reference wraps in
pipeline/BLIP2VQAVALPipeline.py and pipeline/InstructBLIPVQAVALPipeline.py.
The language tower is either the OPT decoder (models/blip2/opt.py) or the
LLaMA/Vicuna decoder (models/llava/llama.py — shared with CuLLaVO).

Greedy decode uses the same jit-while_loop KV-cache scheme as the LLaVA
generate (models/llava/modeling.py), with logical key positions.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cullavo_tpu.models.blip2.config import Blip2Config
from cullavo_tpu.models.blip2.opt import (init_opt_params, opt_forward,
                                          opt_init_cache)
from cullavo_tpu.models.blip2.qformer import init_qformer_params, qformer_forward
from cullavo_tpu.models.blip2.vision import (blip2_vision_forward,
                                             init_blip2_vision_params)


def init_blip2_params(cfg: Blip2Config, key, dtype=jnp.float32):
    kv, kq, kt, kp, kqt = jax.random.split(key, 5)
    D_q = cfg.qformer.hidden_size
    D_lm = cfg.lm_hidden_size
    params = {
        "vision": init_blip2_vision_params(cfg.vision, kv, dtype),
        "qformer": init_qformer_params(cfg.qformer, kq, dtype),
        "query_tokens": (jax.random.normal(kqt, (cfg.num_query_tokens, D_q))
                         * 0.02).astype(dtype),
        "projection": {
            "w": (jax.random.normal(kp, (D_q, D_lm)) * 0.02).astype(dtype),
            "b": jnp.zeros((D_lm,), dtype)},
    }
    if cfg.text_is_opt:
        params["language_model"] = init_opt_params(cfg.text, kt, dtype)
    elif cfg.text_is_t5:
        from cullavo_tpu.models.blip2.t5 import init_t5_params

        params["language_model"] = init_t5_params(cfg.text, kt, dtype)
    else:
        from cullavo_tpu.models.llava.llama import init_llama_params

        params["language_model"] = init_llama_params(cfg.text, kt, dtype)
    return params


def encode_image(params, cfg: Blip2Config, pixel_values,
                 qformer_text_ids=None, qformer_text_mask=None,
                 compute_dtype=None):
    """pixel_values → projected query features [B, Q, D_lm]."""
    img = blip2_vision_forward(params["vision"], cfg.vision, pixel_values,
                               compute_dtype)
    B = img.shape[0]
    queries = jnp.broadcast_to(params["query_tokens"],
                               (B,) + params["query_tokens"].shape)
    qh = qformer_forward(params["qformer"], cfg.qformer, queries, img,
                         text_ids=qformer_text_ids, text_mask=qformer_text_mask,
                         compute_dtype=compute_dtype)
    return qh @ params["projection"]["w"] + params["projection"]["b"]


def _lm_embed(params, cfg: Blip2Config, ids):
    return params["language_model"]["embed_tokens"][ids]


def _lm_logits(params, cfg: Blip2Config, hidden):
    lm = params["language_model"]
    if cfg.text_is_opt:
        return hidden @ lm["embed_tokens"].T          # tied head
    return hidden @ lm["lm_head"]


def _lm_forward(params, cfg: Blip2Config, embeds, mask, pos, cache=None,
                cache_index=None, key_position_ids=None, stale_cache=False):
    lm = params["language_model"]
    if cfg.text_is_opt:
        return opt_forward(lm, cfg.text, embeds, mask, pos, cache,
                           cache_index, key_position_ids,
                           stale_cache=stale_cache)
    from cullavo_tpu.models.llava.llama import llama_forward

    return llama_forward(lm, cfg.text, embeds, mask, pos, cache,
                         cache_index, key_position_ids,
                         stale_cache=stale_cache)


def blip2_forward(params, cfg: Blip2Config, pixel_values, input_ids,
                  attention_mask, qformer_text_ids=None,
                  qformer_text_mask=None, decoder_input_ids=None,
                  compute_dtype=None):
    """Full forward.  Decoder-only towers return logits [B, Q+T, V]; the T5
    tower encodes [queries; prompt] and returns decoder logits [B, Td, V]
    over ``decoder_input_ids`` (flan-t5 BLIP-2 is encoder-decoder)."""
    lang_img = encode_image(params, cfg, pixel_values, qformer_text_ids,
                            qformer_text_mask, compute_dtype)
    if cfg.text_is_t5:
        from cullavo_tpu.models.blip2.t5 import t5_forward

        lm = params["language_model"]
        text = lm["embed_tokens"][input_ids].astype(lang_img.dtype)
        embeds = jnp.concatenate([lang_img, text], axis=1)
        mask = jnp.concatenate(
            [jnp.ones(lang_img.shape[:2], attention_mask.dtype), attention_mask],
            axis=1)
        return t5_forward(lm, cfg.text, embeds, mask, decoder_input_ids)
    text = _lm_embed(params, cfg, input_ids).astype(lang_img.dtype)
    embeds = jnp.concatenate([lang_img, text], axis=1)
    Q = lang_img.shape[1]
    mask = jnp.concatenate(
        [jnp.ones((embeds.shape[0], Q), attention_mask.dtype), attention_mask],
        axis=1)
    pos = jnp.maximum(jnp.cumsum(mask, axis=1) * mask - 1, 0)
    h, _ = _lm_forward(params, cfg, embeds, mask, pos)
    return _lm_logits(params, cfg, h)


def _init_cache(cfg: Blip2Config, batch, max_len, dtype):
    if cfg.text_is_opt:
        return opt_init_cache(cfg.text, batch, max_len, dtype)
    from cullavo_tpu.models.llava.llama import init_kv_cache

    return init_kv_cache(cfg.text, batch, max_len, dtype)


def blip2_generate(params, cfg: Blip2Config, pixel_values, input_ids,
                   attention_mask, max_new_tokens: int,
                   eos_token_id: int = -1, qformer_text_ids=None,
                   qformer_text_mask=None, compute_dtype=None):
    """Greedy decode; returns [B, max_new_tokens] (post-EOS positions hold
    the pad repeat, as in HF greedy with early stop disabled)."""
    lang_img = encode_image(params, cfg, pixel_values, qformer_text_ids,
                            qformer_text_mask, compute_dtype)
    if cfg.text_is_t5:
        from cullavo_tpu.models.blip2.t5 import t5_generate

        lm = params["language_model"]
        text = lm["embed_tokens"][input_ids].astype(lang_img.dtype)
        embeds = jnp.concatenate([lang_img, text], axis=1)
        mask = jnp.concatenate(
            [jnp.ones(lang_img.shape[:2], attention_mask.dtype), attention_mask],
            axis=1)
        return t5_generate(lm, cfg.text, embeds, mask, max_new_tokens,
                           eos_token_id)
    B, Q = lang_img.shape[:2]
    text = _lm_embed(params, cfg, input_ids).astype(lang_img.dtype)
    embeds = jnp.concatenate([lang_img, text], axis=1)
    T = embeds.shape[1]
    max_len = T + max_new_tokens
    mask0 = jnp.concatenate(
        [jnp.ones((B, Q), attention_mask.dtype), attention_mask], axis=1)
    pos0 = jnp.maximum(jnp.cumsum(mask0, axis=1) * mask0 - 1, 0)

    cache = _init_cache(cfg, B, max_len, embeds.dtype)
    full_mask = jnp.concatenate(
        [mask0, jnp.zeros((B, max_new_tokens), mask0.dtype)], axis=1)
    key_pos = jnp.concatenate(
        [pos0, jnp.zeros((B, max_new_tokens), pos0.dtype)], axis=1)

    h, cache = _lm_forward(params, cfg, embeds, full_mask, pos0, cache,
                           jnp.int32(0), key_pos)
    # sample from each row's LAST VALID position (right-padded rows end
    # before the buffer edge)
    rows = jnp.arange(B)
    last_idx = jnp.sum(mask0, axis=1).astype(jnp.int32) - 1
    last_pos = pos0[rows, last_idx]
    logits = _lm_logits(params, cfg, h[rows, last_idx])
    tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def body(state):
        i, tok, cache, full_mask, key_pos, last_pos, out, done = state
        out = out.at[:, i].set(jnp.where(done, out[:, i], tok))
        done = done | (tok == eos_token_id)
        idx = T + i
        new_pos = last_pos + 1
        emb = _lm_embed(params, cfg, tok[:, None]).astype(embeds.dtype)
        # stale-cache decode: stale-read attention + per-layer in-place
        # scatter inside the layer scan (see opt_forward's stale_cache doc)
        h, cache = _lm_forward(params, cfg, emb, full_mask,
                               new_pos[:, None], cache, idx, key_pos,
                               stale_cache=True)
        full_mask = full_mask.at[:, idx].set(1)
        key_pos = key_pos.at[:, idx].set(new_pos)
        logits = _lm_logits(params, cfg, h[:, -1])
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (i + 1, nxt, cache, full_mask, key_pos, new_pos, out, done)

    def cond(state):
        i, _, _, _, _, _, _, done = state
        return (i < max_new_tokens) & ~jnp.all(done)

    out = jnp.zeros((B, max_new_tokens), jnp.int32)
    done = jnp.zeros((B,), bool)
    state = (jnp.int32(0), tok0, cache, full_mask, key_pos, last_pos, out, done)
    state = jax.lax.while_loop(cond, body, state)
    return state[6]


def blip2_beam_generate(params, cfg: Blip2Config, pixel_values, input_ids,
                        attention_mask, max_new_tokens: int,
                        num_beams: int = 5, length_penalty: float = 1.0,
                        eos_token_id: int = -1, pad_token_id: int = 0,
                        qformer_text_ids=None, qformer_text_mask=None,
                        compute_dtype=None):
    """Beam-search decode — the reference's BLIP-2 / InstructBLIP generation
    configuration (num_beams=5, length_penalty=-1, ≤10 new tokens;
    pipeline/BLIP2VQAVALPipeline.py:175, InstructBLIPVQAVALPipeline.py).

    T5 towers route to ``t5_beam_generate``; OPT / Vicuna (decoder-only)
    towers prefill once per batch row, expand the KV cache to
    batch×num_beams rows, and run the shared HF-semantics scorer
    (cullavo_tpu.models.beam)."""
    from cullavo_tpu.models.beam import beam_search

    lang_img = encode_image(params, cfg, pixel_values, qformer_text_ids,
                            qformer_text_mask, compute_dtype)
    if cfg.text_is_t5:
        from cullavo_tpu.models.blip2.t5 import t5_beam_generate

        lm = params["language_model"]
        text = lm["embed_tokens"][input_ids].astype(lang_img.dtype)
        embeds = jnp.concatenate([lang_img, text], axis=1)
        mask = jnp.concatenate(
            [jnp.ones(lang_img.shape[:2], attention_mask.dtype), attention_mask],
            axis=1)
        return t5_beam_generate(lm, cfg.text, embeds, mask, max_new_tokens,
                                num_beams=num_beams,
                                length_penalty=length_penalty,
                                eos_token_id=eos_token_id)

    B, Q = lang_img.shape[:2]
    nb = num_beams
    text = _lm_embed(params, cfg, input_ids).astype(lang_img.dtype)
    embeds = jnp.concatenate([lang_img, text], axis=1)
    T = embeds.shape[1]
    max_len = T + max_new_tokens + 1
    mask0 = jnp.concatenate(
        [jnp.ones((B, Q), attention_mask.dtype), attention_mask], axis=1)
    pos0 = jnp.maximum(jnp.cumsum(mask0, axis=1) * mask0 - 1, 0)

    cache = _init_cache(cfg, B, max_len, embeds.dtype)
    full_mask = jnp.concatenate(
        [mask0, jnp.zeros((B, max_new_tokens + 1), mask0.dtype)], axis=1)
    key_pos = jnp.concatenate(
        [pos0, jnp.zeros((B, max_new_tokens + 1), pos0.dtype)], axis=1)
    h, cache = _lm_forward(params, cfg, embeds, full_mask, pos0, cache,
                           jnp.int32(0), key_pos)
    rows = jnp.arange(B)
    last_idx = jnp.sum(mask0, axis=1).astype(jnp.int32) - 1
    last_pos = pos0[rows, last_idx]
    init_logits = _lm_logits(params, cfg, h[rows, last_idx]).astype(jnp.float32)

    # expand to contiguous batch×beam rows.  Batch axis differs per tower:
    # OPT cache is [L, B, H, S, hd]; LLaMA/Vicuna is S-major [L, S, B, KV, hd]
    bax = 1 if cfg.text_is_opt else 2
    cache = jax.tree.map(lambda a: jnp.repeat(a, nb, axis=bax), cache)
    full_mask = jnp.repeat(full_mask, nb, axis=0)
    key_pos = jnp.repeat(key_pos, nb, axis=0)
    last_pos = jnp.repeat(last_pos, nb, axis=0)
    init_logits = jnp.repeat(init_logits, nb, axis=0)

    def step_fn(tok, state, step_idx):
        cache, full_mask, key_pos = state
        idx = T + step_idx - 1                 # cache slot of the fed token
        new_pos = last_pos + step_idx
        emb = _lm_embed(params, cfg, tok[:, None]).astype(embeds.dtype)
        h, cache = _lm_forward(params, cfg, emb, full_mask,
                               new_pos[:, None], cache, idx, key_pos,
                               stale_cache=True)
        full_mask = full_mask.at[:, idx].set(1)
        key_pos = key_pos.at[:, idx].set(new_pos)
        logits = _lm_logits(params, cfg, h[:, -1]).astype(jnp.float32)
        return logits, (cache, full_mask, key_pos)

    def reorder_fn(state, flat_parent):
        cache, full_mask, key_pos = state
        # masks/positions are identical across beams of a batch (parents never
        # cross batches), so only the cache needs the gather
        cache = jax.tree.map(lambda a: jnp.take(a, flat_parent, axis=bax),
                             cache)
        return (cache, full_mask, key_pos)

    return beam_search(step_fn, reorder_fn, init_logits,
                       (cache, full_mask, key_pos), B, nb, max_new_tokens,
                       eos_token_id, pad_token_id=pad_token_id,
                       length_penalty=length_penalty)


# ---------------------------------------------------------------------------
# HF import
# ---------------------------------------------------------------------------

def import_blip2_torch(hf_model, cfg: Blip2Config, dtype=np.float32) -> dict:
    """Map a torch Blip2ForConditionalGeneration / InstructBlip… module to
    our param tree (weights transposed to [in, out])."""
    sd = {k: v.detach().cpu().numpy().astype(dtype)
          for k, v in hf_model.state_dict().items()}

    def t(name):
        return np.ascontiguousarray(sd[name].T)

    def g(name):
        return sd[name]

    vc, Lv = cfg.vision, cfg.vision.num_hidden_layers
    P = vc.patch_size
    # conv kernel [D, 3, P, P] → patch matmul [3*P*P, D] matching the
    # [B,3,P,P]-ordered patch flattening in blip2_vision_forward
    pk = g("vision_model.embeddings.patch_embedding.weight")
    patch_kernel = pk.reshape(vc.hidden_size, 3 * P * P).T.copy()

    def vstack(fmt, transpose=True):
        return np.stack([t(fmt.format(i)) if transpose else g(fmt.format(i))
                         for i in range(Lv)])

    vision = {
        "class_emb": g("vision_model.embeddings.class_embedding").reshape(-1),
        "patch_kernel": patch_kernel,
        "pos_emb": g("vision_model.embeddings.position_embedding").reshape(
            -1, vc.hidden_size),
        "layers": {
            "qkv": vstack("vision_model.encoder.layers.{}.self_attn.qkv.weight"),
            "proj": vstack("vision_model.encoder.layers.{}.self_attn.projection.weight"),
            "proj_b": vstack("vision_model.encoder.layers.{}.self_attn.projection.bias", False),
            "ln1": vstack("vision_model.encoder.layers.{}.layer_norm1.weight", False),
            "ln1_b": vstack("vision_model.encoder.layers.{}.layer_norm1.bias", False),
            "ln2": vstack("vision_model.encoder.layers.{}.layer_norm2.weight", False),
            "ln2_b": vstack("vision_model.encoder.layers.{}.layer_norm2.bias", False),
            "fc1": vstack("vision_model.encoder.layers.{}.mlp.fc1.weight"),
            "fc1_b": vstack("vision_model.encoder.layers.{}.mlp.fc1.bias", False),
            "fc2": vstack("vision_model.encoder.layers.{}.mlp.fc2.weight"),
            "fc2_b": vstack("vision_model.encoder.layers.{}.mlp.fc2.bias", False),
        },
        "post_ln": g("vision_model.post_layernorm.weight"),
        "post_ln_b": g("vision_model.post_layernorm.bias"),
    }

    def qdense(prefix):
        return {"w": t(prefix + ".weight"), "b": g(prefix + ".bias")}

    def qln(prefix):
        return {"g": g(prefix + ".weight"), "b": g(prefix + ".bias")}

    qlayers = []
    for i in range(cfg.qformer.num_hidden_layers):
        p = f"qformer.encoder.layer.{i}"
        layer = {
            "att": {"q": qdense(f"{p}.attention.attention.query"),
                    "k": qdense(f"{p}.attention.attention.key"),
                    "v": qdense(f"{p}.attention.attention.value"),
                    "o": qdense(f"{p}.attention.output.dense"),
                    "ln": qln(f"{p}.attention.output.LayerNorm")},
            "ffn_q": {"fc1": qdense(f"{p}.intermediate_query.dense"),
                      "fc2": qdense(f"{p}.output_query.dense"),
                      "ln": qln(f"{p}.output_query.LayerNorm")},
        }
        if i % cfg.qformer.cross_attention_frequency == 0:
            layer["cross"] = {"q": qdense(f"{p}.crossattention.attention.query"),
                              "k": qdense(f"{p}.crossattention.attention.key"),
                              "v": qdense(f"{p}.crossattention.attention.value"),
                              "o": qdense(f"{p}.crossattention.output.dense"),
                              "ln": qln(f"{p}.crossattention.output.LayerNorm")}
        if cfg.qformer.use_text_input:
            layer["ffn_t"] = {"fc1": qdense(f"{p}.intermediate.dense"),
                              "fc2": qdense(f"{p}.output.dense"),
                              "ln": qln(f"{p}.output.LayerNorm")}
        qlayers.append(layer)
    # BLIP-2 stores the embedding LN at qformer.layernorm; InstructBLIP at
    # qformer.embeddings.layernorm
    ln_name = ("qformer.layernorm" if "qformer.layernorm.weight" in sd
               else "qformer.embeddings.layernorm")
    qformer = {"layernorm": qln(ln_name), "layers": qlayers}
    if cfg.qformer.use_text_input:
        qformer["word_emb"] = g("qformer.embeddings.word_embeddings.weight")
        qformer["pos_emb"] = g("qformer.embeddings.position_embeddings.weight")

    params = {
        "vision": vision,
        "qformer": qformer,
        "query_tokens": g("query_tokens").reshape(cfg.num_query_tokens,
                                                  cfg.qformer.hidden_size),
        "projection": {"w": t("language_projection.weight"),
                       "b": g("language_projection.bias")},
    }

    if cfg.text_is_t5:
        from cullavo_tpu.models.blip2.t5 import import_t5_torch

        params["language_model"] = import_t5_torch(
            hf_model.language_model, cfg.text, dtype=dtype)
        return params

    Lt = cfg.text.num_hidden_layers
    if cfg.text_is_opt:
        base = "language_model.model.decoder"

        def ostack(fmt, transpose=True):
            return np.stack([t(fmt.format(i)) if transpose else g(fmt.format(i))
                             for i in range(Lt)])

        params["language_model"] = {
            "embed_tokens": g(f"{base}.embed_tokens.weight"),
            "embed_positions": g(f"{base}.embed_positions.weight"),
            "final_ln": g(f"{base}.final_layer_norm.weight"),
            "final_ln_b": g(f"{base}.final_layer_norm.bias"),
            "layers": {
                "q": ostack(base + ".layers.{}.self_attn.q_proj.weight"),
                "q_b": ostack(base + ".layers.{}.self_attn.q_proj.bias", False),
                "k": ostack(base + ".layers.{}.self_attn.k_proj.weight"),
                "k_b": ostack(base + ".layers.{}.self_attn.k_proj.bias", False),
                "v": ostack(base + ".layers.{}.self_attn.v_proj.weight"),
                "v_b": ostack(base + ".layers.{}.self_attn.v_proj.bias", False),
                "o": ostack(base + ".layers.{}.self_attn.out_proj.weight"),
                "o_b": ostack(base + ".layers.{}.self_attn.out_proj.bias", False),
                "attn_ln": ostack(base + ".layers.{}.self_attn_layer_norm.weight", False),
                "attn_ln_b": ostack(base + ".layers.{}.self_attn_layer_norm.bias", False),
                "fc1": ostack(base + ".layers.{}.fc1.weight"),
                "fc1_b": ostack(base + ".layers.{}.fc1.bias", False),
                "fc2": ostack(base + ".layers.{}.fc2.weight"),
                "fc2_b": ostack(base + ".layers.{}.fc2.bias", False),
                "final_ln": ostack(base + ".layers.{}.final_layer_norm.weight", False),
                "final_ln_b": ostack(base + ".layers.{}.final_layer_norm.bias", False),
            },
        }
    else:
        base = "language_model.model"

        def lstack(fmt):
            return np.stack([t(fmt.format(i)) for i in range(Lt)])

        def lgstack(fmt):
            return np.stack([g(fmt.format(i)) for i in range(Lt)])

        params["language_model"] = {
            "embed_tokens": g(f"{base}.embed_tokens.weight"),
            "lm_head": t("language_model.lm_head.weight"),
            "norm": g(f"{base}.norm.weight"),
            "layers": {
                "q": lstack(base + ".layers.{}.self_attn.q_proj.weight"),
                "k": lstack(base + ".layers.{}.self_attn.k_proj.weight"),
                "v": lstack(base + ".layers.{}.self_attn.v_proj.weight"),
                "o": lstack(base + ".layers.{}.self_attn.o_proj.weight"),
                "gate": lstack(base + ".layers.{}.mlp.gate_proj.weight"),
                "up": lstack(base + ".layers.{}.mlp.up_proj.weight"),
                "down": lstack(base + ".layers.{}.mlp.down_proj.weight"),
                "input_ln": lgstack(base + ".layers.{}.input_layernorm.weight"),
                "post_ln": lgstack(base + ".layers.{}.post_attention_layernorm.weight"),
            },
        }
    return params


def blip2_image_embed(params, cfg: Blip2Config, pixel_values,
                      compute_dtype=None):
    """L2-normalized pooled query embedding [B, D_q] — the image branch of
    the zoo ImageNet classification eval (cosine vs qformer text encodes)."""
    img = blip2_vision_forward(params["vision"], cfg.vision, pixel_values,
                               compute_dtype)
    B = img.shape[0]
    queries = jnp.broadcast_to(params["query_tokens"],
                               (B,) + params["query_tokens"].shape)
    qh = qformer_forward(params["qformer"], cfg.qformer, queries, img,
                         compute_dtype=compute_dtype)
    pooled = qh[:, 0]
    return pooled / jnp.linalg.norm(pooled.astype(jnp.float32), axis=-1,
                                    keepdims=True).astype(pooled.dtype)


def blip2_text_embed(params, cfg: Blip2Config, text_ids, text_mask,
                     compute_dtype=None):
    """L2-normalized pooled Q-Former text embedding [B, D_q]."""
    from cullavo_tpu.models.blip2.qformer import qformer_encode_text

    pooled = qformer_encode_text(params["qformer"], cfg.qformer, text_ids,
                                 text_mask, compute_dtype)
    return pooled / jnp.linalg.norm(pooled.astype(jnp.float32), axis=-1,
                                    keepdims=True).astype(pooled.dtype)
