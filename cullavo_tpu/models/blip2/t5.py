"""T5 v1.1 / Flan-T5 encoder-decoder — the BLIP-2 flan-t5-* language tower.

The reference's headline BLIP-2 checkpoint is Salesforce/blip2-flan-t5-xl
(pipeline/BLIP2VQAVALPipeline.py); this is its TPU-native decoder stack:
scan-over-layers encoder and decoder, shared relative-position bias computed
once outside the scan (T5 stores the bucket table only in layer 0), KV-cache
greedy decode with pre-computed cross-attention KV.

T5 specifics: RMS-style LayerNorm (no mean centering, no bias), UNscaled
dot-product attention (the 1/sqrt(d) is folded into initialization), additive
relative-position bias, gated-GELU FFN (v1.1), untied lm_head.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 2048          # flan-t5-xl
    d_kv: int = 64
    num_heads: int = 32
    d_ff: int = 5120
    num_layers: int = 24         # encoder
    num_decoder_layers: int = 24
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    decoder_start_token_id: int = 0
    pad_token_id: int = 0
    eos_token_id: int = 1

    @property
    def inner_dim(self) -> int:
        return self.num_heads * self.d_kv


def tiny_t5_config() -> T5Config:
    return T5Config(vocab_size=110, d_model=32, d_kv=8, num_heads=4, d_ff=48,
                    num_layers=2, num_decoder_layers=2,
                    relative_attention_num_buckets=8,
                    relative_attention_max_distance=16)


def t5_layer_norm(x, w, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * w).astype(x.dtype)


def init_t5_params(cfg: T5Config, key, dtype=jnp.float32):
    D, I, H, dk = cfg.d_model, cfg.d_ff, cfg.num_heads, cfg.d_kv
    ks = iter(jax.random.split(key, 40))

    def nrm(shape, scale=0.05):
        return (jax.random.normal(next(ks), shape) * scale).astype(dtype)

    def stack_block(L, cross):
        blk = {
            "q": nrm((L, D, H * dk)), "k": nrm((L, D, H * dk)),
            "v": nrm((L, D, H * dk)), "o": nrm((L, H * dk, D)),
            "ln1": jnp.ones((L, D), dtype),
            "wi0": nrm((L, D, I)), "wi1": nrm((L, D, I)), "wo": nrm((L, I, D)),
            "ln_ff": jnp.ones((L, D), dtype),
        }
        if cross:
            blk.update({"cq": nrm((L, D, H * dk)), "ck": nrm((L, D, H * dk)),
                        "cv": nrm((L, D, H * dk)), "co": nrm((L, H * dk, D)),
                        "ln_cross": jnp.ones((L, D), dtype)})
        return blk

    nb = cfg.relative_attention_num_buckets
    return {
        "embed_tokens": nrm((cfg.vocab_size, D), 1.0),
        "enc_rel_bias": nrm((nb, H), 1.0),
        "dec_rel_bias": nrm((nb, H), 1.0),
        "encoder": stack_block(cfg.num_layers, cross=False),
        "enc_final_ln": jnp.ones((D,), dtype),
        "decoder": stack_block(cfg.num_decoder_layers, cross=True),
        "dec_final_ln": jnp.ones((D,), dtype),
        "lm_head": nrm((D, cfg.vocab_size)),
    }


def _relative_position_bucket(rel_pos, bidirectional, num_buckets, max_distance):
    """jnp port of HF T5Attention._relative_position_bucket (exact)."""
    ret = jnp.zeros_like(rel_pos)
    n = -rel_pos
    if bidirectional:
        num_buckets //= 2
        ret = ret + (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / np.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


def relative_position_bias(table, q_pos, k_pos, bidirectional, cfg: T5Config):
    """table [num_buckets, H], positions [Tq], [Tk] → bias [1, H, Tq, Tk]."""
    rel = k_pos[None, :] - q_pos[:, None]
    bucket = _relative_position_bucket(
        rel, bidirectional, cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance)
    bias = table[bucket]                                   # [Tq, Tk, H]
    return bias.transpose(2, 0, 1)[None]


def _attn(x, kv, wq, wk, wv, wo, bias, H, dk, dtype):
    """UNscaled T5 attention with additive [*, H, Tq, Tk] bias."""
    B, T, _ = x.shape
    S = kv.shape[1]
    q = (x @ wq).reshape(B, T, H, dk).transpose(0, 2, 1, 3)
    k = (kv @ wk).reshape(B, S, H, dk).transpose(0, 2, 1, 3)
    v = (kv @ wv).reshape(B, S, H, dk).transpose(0, 2, 1, 3)
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) + bias
    att = jax.nn.softmax(att, axis=-1).astype(dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", att, v).transpose(0, 2, 1, 3).reshape(B, T, -1)
    return o @ wo


def _gated_ffn(x, w, dtype):
    h = jax.nn.gelu((x @ w["wi0"]).astype(jnp.float32), approximate=True)
    h = (h.astype(dtype) * (x @ w["wi1"]))
    return h @ w["wo"]


def t5_encode(params, cfg: T5Config, input_embeds, attention_mask):
    """[B, T, D] + [B, T] → encoder hidden [B, T, D]."""
    B, T, _ = input_embeds.shape
    H, dk = cfg.num_heads, cfg.d_kv
    dtype = input_embeds.dtype
    eps = cfg.layer_norm_epsilon
    pos = jnp.arange(T)
    bias = relative_position_bias(params["enc_rel_bias"], pos, pos, True, cfg)
    bias = bias + jnp.where(attention_mask[:, None, None, :].astype(bool), 0.0, NEG_INF)

    def layer(h, w):
        x = t5_layer_norm(h, w["ln1"], eps)
        h = h + _attn(x, x, w["q"], w["k"], w["v"], w["o"], bias, H, dk, dtype)
        x = t5_layer_norm(h, w["ln_ff"], eps)
        h = h + _gated_ffn(x, w, dtype)
        return h, None

    h, _ = jax.lax.scan(layer, input_embeds, params["encoder"])
    return t5_layer_norm(h, params["enc_final_ln"], eps)


def t5_decode_step(params, cfg: T5Config, dec_embeds, enc_hidden, enc_mask,
                   position_ids, self_cache=None, cache_index=None,
                   max_len: Optional[int] = None, stale_cache: bool = False):
    """Decoder forward.  Without a cache: full causal pass over dec_embeds.
    With a cache: dec_embeds are T new tokens written at cache_index.

    ``stale_cache``: 1-token decode fast path — attention reads the
    self-attn cache WITHOUT the current position; the cache is carried
    through the layer scan with per-layer in-place k/v writes at
    ``cache_index`` and returned as the updated full ``{"k","v"}`` (see
    llava/llama.py::llama_forward's stale_cache note).  T5 specifics:
    unscaled attention (scale=1) and the relative-position bucket-0 bias on
    the self position.
    """
    B, T, D = dec_embeds.shape
    H, dk = cfg.num_heads, cfg.d_kv
    dtype = dec_embeds.dtype
    eps = cfg.layer_norm_epsilon

    if self_cache is None:
        key_pos = position_ids
    else:
        key_pos = jnp.arange(self_cache["k"].shape[3])
    self_bias = relative_position_bias(params["dec_rel_bias"], position_ids,
                                       key_pos, False, cfg)
    causal = position_ids[:, None] >= key_pos[None, :]
    if self_cache is not None:
        # valid cache slots: written positions only — the current position is
        # excluded in stale mode (it is folded in out-of-band)
        last_valid = cache_index - 1 if stale_cache else cache_index + T - 1
        causal = causal & (key_pos[None, :] <= last_valid)
    self_bias = self_bias + jnp.where(causal[None, None], 0.0, NEG_INF)
    cross_bias = jnp.where(enc_mask[:, None, None, :].astype(bool), 0.0, NEG_INF)
    if stale_cache:
        # [1, H, 1, 1] bucket-0 relative bias for the (pos, pos) self pair
        self0_bias = relative_position_bias(params["dec_rel_bias"],
                                            position_ids, position_ids, False, cfg)

    def layer(carry, scanned):
        if stale_cache:
            h, kcar, vcar = carry
        else:
            h = carry
        w = scanned["w"]
        x = t5_layer_norm(h, w["ln1"], eps)
        q = (x @ w["q"]).reshape(B, T, H, dk).transpose(0, 2, 1, 3)
        k = (x @ w["k"]).reshape(B, T, H, dk).transpose(0, 2, 1, 3)
        v = (x @ w["v"]).reshape(B, T, H, dk).transpose(0, 2, 1, 3)
        out_cache = {}
        if self_cache is not None and stale_cache:
            from cullavo_tpu.models.llava.llama import sdpa_decode_stale

            li = scanned["li"]
            k_buf = jax.lax.dynamic_index_in_dim(kcar, li, 0, keepdims=False)
            v_buf = jax.lax.dynamic_index_in_dim(vcar, li, 0, keepdims=False)
            o = sdpa_decode_stale(q, k_buf.astype(dtype), v_buf.astype(dtype),
                                  k, v, self_bias, self_bias=self0_bias,
                                  scale=1.0)
            kcar = jax.lax.dynamic_update_slice(
                kcar, k.astype(kcar.dtype)[None], (li, 0, 0, cache_index, 0))
            vcar = jax.lax.dynamic_update_slice(
                vcar, v.astype(vcar.dtype)[None], (li, 0, 0, cache_index, 0))
        else:
            if self_cache is not None:
                kc = jax.lax.dynamic_update_slice(scanned["k_cache"], k, (0, 0, cache_index, 0))
                vc = jax.lax.dynamic_update_slice(scanned["v_cache"], v, (0, 0, cache_index, 0))
                out_cache = {"k": kc, "v": vc}
                k, v = kc, vc
            att = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) + self_bias
            att = jax.nn.softmax(att, axis=-1).astype(dtype)
            o = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, T, -1)
        h = h + o @ w["o"]
        x = t5_layer_norm(h, w["ln_cross"], eps)
        h = h + _attn(x, enc_hidden, w["cq"], w["ck"], w["cv"], w["co"],
                      cross_bias, H, dk, dtype)
        x = t5_layer_norm(h, w["ln_ff"], eps)
        h = h + _gated_ffn(x, w, dtype)
        return ((h, kcar, vcar) if stale_cache else h), out_cache

    scanned_in = {"w": params["decoder"]}
    if self_cache is not None:
        if stale_cache:
            scanned_in["li"] = jnp.arange(self_cache["k"].shape[0])
        else:
            scanned_in.update({"k_cache": self_cache["k"], "v_cache": self_cache["v"]})
    init = ((dec_embeds, self_cache["k"], self_cache["v"])
            if (self_cache is not None and stale_cache) else dec_embeds)
    h, caches = jax.lax.scan(layer, init, scanned_in)
    new_cache = None
    if self_cache is not None and stale_cache:
        h, ck, cv = h
        new_cache = {"k": ck, "v": cv}
    elif self_cache is not None:
        new_cache = {"k": caches["k"], "v": caches["v"]}
    h = t5_layer_norm(h, params["dec_final_ln"], eps)
    return h, new_cache


def t5_forward(params, cfg: T5Config, enc_embeds, enc_mask, decoder_input_ids):
    """Full encoder-decoder forward → logits [B, Td, V]."""
    enc = t5_encode(params, cfg, enc_embeds, enc_mask)
    dec_emb = params["embed_tokens"][decoder_input_ids]
    Td = decoder_input_ids.shape[1]
    h, _ = t5_decode_step(params, cfg, dec_emb, enc, enc_mask, jnp.arange(Td))
    return h @ params["lm_head"]


def t5_init_cache(cfg: T5Config, batch, max_len, dtype=jnp.float32):
    z = jnp.zeros((cfg.num_decoder_layers, batch, cfg.num_heads, max_len, cfg.d_kv), dtype)
    return {"k": z, "v": z}


def t5_generate(params, cfg: T5Config, enc_embeds, enc_mask,
                max_new_tokens: int, eos_token_id: Optional[int] = None):
    """Greedy decode from decoder_start_token; returns [B, max_new_tokens]."""
    eos = cfg.eos_token_id if eos_token_id is None else eos_token_id
    enc = t5_encode(params, cfg, enc_embeds, enc_mask)
    B = enc.shape[0]
    cache = t5_init_cache(cfg, B, max_new_tokens, enc.dtype)
    start = jnp.full((B, 1), cfg.decoder_start_token_id, jnp.int32)

    def step(tok, cache, i):
        emb = params["embed_tokens"][tok]
        # stale-cache decode: stale-read attention + per-layer in-place
        # scatter inside the layer scan (see t5_decode_step's doc)
        h, cache = t5_decode_step(params, cfg, emb, enc, enc_mask,
                                  jnp.full((1,), i, jnp.int32), cache, i,
                                  stale_cache=True)
        nxt = jnp.argmax(h[:, -1] @ params["lm_head"], -1).astype(jnp.int32)
        return nxt, cache

    tok0, cache = step(start, cache, jnp.int32(0))

    def body(state):
        i, tok, cache, out, done = state
        out = out.at[:, i].set(jnp.where(done, out[:, i], tok))
        done = done | (tok == eos)
        nxt, cache = step(tok[:, None], cache, i + 1)
        return (i + 1, nxt, cache, out, done)

    def cond(state):
        i, _, _, _, done = state
        return (i < max_new_tokens) & ~jnp.all(done)

    out = jnp.zeros((B, max_new_tokens), jnp.int32)
    done = jnp.zeros((B,), bool)
    state = jax.lax.while_loop(cond, body,
                               (jnp.int32(0), tok0, cache, out, done))
    return state[3]


def t5_beam_generate(params, cfg: T5Config, enc_embeds, enc_mask,
                     max_new_tokens: int, num_beams: int = 5,
                     length_penalty: float = 1.0,
                     eos_token_id: Optional[int] = None):
    """Beam-search decode — the reference's BLIP-2 generation configuration
    (pipeline/BLIP2VQAVALPipeline.py:175: num_beams=5, length_penalty=-1,
    ≤10 new tokens), HF scorer semantics via cullavo_tpu.models.beam."""
    from cullavo_tpu.models.beam import beam_search

    eos = cfg.eos_token_id if eos_token_id is None else eos_token_id
    enc = t5_encode(params, cfg, enc_embeds, enc_mask)
    B = enc.shape[0]
    # expand each batch row to num_beams contiguous beam rows
    enc_x = jnp.repeat(enc, num_beams, axis=0)
    mask_x = jnp.repeat(enc_mask, num_beams, axis=0)
    Bn = B * num_beams
    cache = t5_init_cache(cfg, Bn, max_new_tokens + 1, enc.dtype)

    def decode_one(tok, cache, i):
        emb = params["embed_tokens"][tok[:, None]]
        h, cache = t5_decode_step(params, cfg, emb, enc_x, mask_x,
                                  jnp.full((1,), i, jnp.int32), cache, i,
                                  stale_cache=True)
        return h[:, -1] @ params["lm_head"], cache

    start = jnp.full((Bn,), cfg.decoder_start_token_id, jnp.int32)
    init_logits, cache = decode_one(start, cache, jnp.int32(0))

    def step_fn(tok, cache, step_idx):
        logits, cache = decode_one(tok, cache, step_idx)
        return logits, cache

    def reorder_fn(cache, flat_parent):
        return jax.tree.map(lambda a: jnp.take(a, flat_parent, axis=1), cache)

    return beam_search(step_fn, reorder_fn, init_logits, cache, B, num_beams,
                       max_new_tokens, eos, pad_token_id=cfg.pad_token_id,
                       length_penalty=length_penalty)


# ---------------------------------------------------------------------------
# HF import (T5ForConditionalGeneration / the language tower of blip2-flan-t5)
# ---------------------------------------------------------------------------

def import_t5_torch(hf_model, cfg: T5Config, prefix: str = "",
                    dtype=np.float32) -> dict:
    sd = {k: v.detach().cpu().numpy().astype(dtype)
          for k, v in hf_model.state_dict().items()}

    def t(name):
        return np.ascontiguousarray(sd[prefix + name].T)

    def g(name):
        return sd[prefix + name]

    def stack_t(fmt, n):
        return np.stack([t(fmt.format(i)) for i in range(n)])

    def stack_g(fmt, n):
        return np.stack([g(fmt.format(i)) for i in range(n)])

    Le, Ld = cfg.num_layers, cfg.num_decoder_layers
    e = "encoder.block.{}.layer"
    d = "decoder.block.{}.layer"
    return {
        "embed_tokens": g("shared.weight"),
        "enc_rel_bias": g("encoder.block.0.layer.0.SelfAttention"
                          ".relative_attention_bias.weight"),
        "dec_rel_bias": g("decoder.block.0.layer.0.SelfAttention"
                          ".relative_attention_bias.weight"),
        "encoder": {
            "q": stack_t(e + ".0.SelfAttention.q.weight", Le),
            "k": stack_t(e + ".0.SelfAttention.k.weight", Le),
            "v": stack_t(e + ".0.SelfAttention.v.weight", Le),
            "o": stack_t(e + ".0.SelfAttention.o.weight", Le),
            "ln1": stack_g(e + ".0.layer_norm.weight", Le),
            "wi0": stack_t(e + ".1.DenseReluDense.wi_0.weight", Le),
            "wi1": stack_t(e + ".1.DenseReluDense.wi_1.weight", Le),
            "wo": stack_t(e + ".1.DenseReluDense.wo.weight", Le),
            "ln_ff": stack_g(e + ".1.layer_norm.weight", Le),
        },
        "enc_final_ln": g("encoder.final_layer_norm.weight"),
        "decoder": {
            "q": stack_t(d + ".0.SelfAttention.q.weight", Ld),
            "k": stack_t(d + ".0.SelfAttention.k.weight", Ld),
            "v": stack_t(d + ".0.SelfAttention.v.weight", Ld),
            "o": stack_t(d + ".0.SelfAttention.o.weight", Ld),
            "ln1": stack_g(d + ".0.layer_norm.weight", Ld),
            "cq": stack_t(d + ".1.EncDecAttention.q.weight", Ld),
            "ck": stack_t(d + ".1.EncDecAttention.k.weight", Ld),
            "cv": stack_t(d + ".1.EncDecAttention.v.weight", Ld),
            "co": stack_t(d + ".1.EncDecAttention.o.weight", Ld),
            "ln_cross": stack_g(d + ".1.layer_norm.weight", Ld),
            "wi0": stack_t(d + ".2.DenseReluDense.wi_0.weight", Ld),
            "wi1": stack_t(d + ".2.DenseReluDense.wi_1.weight", Ld),
            "wo": stack_t(d + ".2.DenseReluDense.wo.weight", Ld),
            "ln_ff": stack_g(d + ".2.layer_norm.weight", Ld),
        },
        "dec_final_ln": g("decoder.final_layer_norm.weight"),
        "lm_head": t("lm_head.weight"),
    }
