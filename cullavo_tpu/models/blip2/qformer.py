"""Q-Former: the BLIP-2 query transformer (BERT-style, post-norm residuals,
cross-attention to the frozen image encoder every ``cross_attention_frequency``
layers; separate FFN weights for query vs text positions).

The 12-layer/768-dim tower is a negligible FLOP fraction next to the ViT-g
and the LLM, so layers are a (static) python loop over per-layer param dicts
rather than a scan — the cross-attention layers are structurally different,
and unrolling 12 small layers compiles fast while letting XLA fuse freely.

InstructBLIP mode (cfg.use_text_input): instruction token embeddings are
concatenated after the learned queries; queries and text self-attend jointly,
only queries cross-attend, and only query outputs feed the language model.

Capability reference: the HF models wrapped by
pipeline/{BLIP2,InstructBLIP}VQAVALPipeline.py.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from cullavo_tpu.models.blip2.config import QFormerConfig
from cullavo_tpu.models.blip2.vision import _act, layer_norm

NEG_INF = -1e9


def init_qformer_params(cfg: QFormerConfig, key, dtype=jnp.float32):
    D, I, Dv = cfg.hidden_size, cfg.intermediate_size, cfg.encoder_hidden_size
    s = 0.02
    keys = iter(jax.random.split(key, 16 * cfg.num_hidden_layers + 8))

    def nrm(shape, scale=s):
        return (jax.random.normal(next(keys), shape) * scale).astype(dtype)

    def dense(d_in, d_out):
        return {"w": nrm((d_in, d_out)), "b": jnp.zeros((d_out,), dtype)}

    def ln():
        return {"g": jnp.ones((D,), dtype), "b": jnp.zeros((D,), dtype)}

    def attention(kv_dim):
        return {"q": dense(D, D), "k": dense(kv_dim, D), "v": dense(kv_dim, D),
                "o": dense(D, D), "ln": ln()}

    def ffn():
        return {"fc1": dense(D, I), "fc2": dense(I, D), "ln": ln()}

    layers = []
    for li in range(cfg.num_hidden_layers):
        layer = {"att": attention(D), "ffn_q": ffn()}
        if li % cfg.cross_attention_frequency == 0:
            layer["cross"] = attention(Dv)
        if cfg.use_text_input:
            layer["ffn_t"] = ffn()
        layers.append(layer)
    params = {"layernorm": ln(), "layers": layers}
    if cfg.use_text_input:
        params["word_emb"] = nrm((cfg.vocab_size, D))
        params["pos_emb"] = nrm((cfg.max_position_embeddings, D))
    return params


def _mha(x, kv, w, mask_bias, num_heads, head_dim, eps, dtype):
    """BERT attention block: projections → softmax → output dense →
    post-norm residual.  ``kv`` may be the image encoder output (cross)."""
    B, T, D = x.shape
    S = kv.shape[1]
    q = (x @ w["q"]["w"].astype(dtype) + w["q"]["b"].astype(dtype))
    k = (kv @ w["k"]["w"].astype(dtype) + w["k"]["b"].astype(dtype))
    v = (kv @ w["v"]["w"].astype(dtype) + w["v"]["b"].astype(dtype))
    q = q.reshape(B, T, num_heads, head_dim).transpose(0, 2, 1, 3)
    k = k.reshape(B, S, num_heads, head_dim).transpose(0, 2, 1, 3)
    v = v.reshape(B, S, num_heads, head_dim).transpose(0, 2, 1, 3)
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * (head_dim ** -0.5)
    if mask_bias is not None:
        att = att + mask_bias
    att = jax.nn.softmax(att, axis=-1).astype(dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", att, v).transpose(0, 2, 1, 3).reshape(B, T, D)
    o = o @ w["o"]["w"].astype(dtype) + w["o"]["b"].astype(dtype)
    return layer_norm(o + x, w["ln"]["g"], w["ln"]["b"], eps)


def _ffn(x, w, act, eps, dtype):
    h = act((x @ w["fc1"]["w"].astype(dtype) + w["fc1"]["b"].astype(dtype)
             ).astype(jnp.float32)).astype(dtype)
    h = h @ w["fc2"]["w"].astype(dtype) + w["fc2"]["b"].astype(dtype)
    return layer_norm(h + x, w["ln"]["g"], w["ln"]["b"], eps)


def qformer_forward(
    params, cfg: QFormerConfig,
    query_embeds: jax.Array,                   # [B, Q, D] learned queries
    encoder_hidden_states: jax.Array,          # [B, S, Dv] image features
    text_ids: Optional[jax.Array] = None,      # [B, Tt] instruction (InstructBLIP)
    text_mask: Optional[jax.Array] = None,     # [B, Tt] 1/0
    compute_dtype=None,
):
    """Returns query hidden states [B, Q, D]."""
    dtype = compute_dtype or query_embeds.dtype
    eps = cfg.layer_norm_eps
    act = _act(cfg.hidden_act)
    Q = query_embeds.shape[1]
    h = query_embeds.astype(dtype)
    if text_ids is not None:
        Tt = text_ids.shape[1]
        te = params["word_emb"].astype(dtype)[text_ids]
        te = te + params["pos_emb"].astype(dtype)[jnp.arange(Tt)][None]
        h = jnp.concatenate([h, te], axis=1)
    h = layer_norm(h, params["layernorm"]["g"], params["layernorm"]["b"], eps)

    self_bias = None
    if text_ids is not None:
        full = jnp.concatenate(
            [jnp.ones(query_embeds.shape[:2], text_mask.dtype), text_mask], axis=1)
        self_bias = jnp.where(full[:, None, None, :].astype(bool), 0.0, NEG_INF)

    for w in params["layers"]:
        h = _mha(h, h, w["att"], self_bias, cfg.num_attention_heads,
                 cfg.head_dim, eps, dtype)
        hq, ht = h[:, :Q], h[:, Q:]
        if "cross" in w:
            hq = _mha(hq, encoder_hidden_states.astype(dtype), w["cross"],
                      None, cfg.num_attention_heads, cfg.head_dim, eps, dtype)
        hq = _ffn(hq, w["ffn_q"], act, eps, dtype)
        if text_ids is not None:
            ht = _ffn(ht, w["ffn_t"], act, eps, dtype)
            h = jnp.concatenate([hq, ht], axis=1)
        else:
            h = hq
    return h[:, :Q]


def qformer_encode_text(params, cfg: QFormerConfig, text_ids, text_mask,
                        compute_dtype=None):
    """Text-only Q-Former pass (no queries, no cross-attention) → pooled
    [B, D] (first-token state).  This is the text branch of the zoo
    ImageNet classification evals (pipeline/BLIP2ImageNetPipeline.py:127-134:
    'This is {class}' texts through the Q-Former, cosine vs pooled image
    queries).  Requires ``use_text_input`` weights (stage-1 ITC checkpoints).
    """
    assert cfg.use_text_input, "text encode needs the text-input Q-Former"
    dtype = compute_dtype or params["word_emb"].dtype
    eps = cfg.layer_norm_eps
    act = _act(cfg.hidden_act)
    Tt = text_ids.shape[1]
    h = params["word_emb"].astype(dtype)[text_ids]
    h = h + params["pos_emb"].astype(dtype)[jnp.arange(Tt)][None]
    h = layer_norm(h, params["layernorm"]["g"], params["layernorm"]["b"], eps)
    bias = jnp.where(text_mask[:, None, None, :].astype(bool), 0.0, NEG_INF)
    for w in params["layers"]:
        h = _mha(h, h, w["att"], bias, cfg.num_attention_heads, cfg.head_dim,
                 eps, dtype)
        h = _ffn(h, w["ffn_t"], act, eps, dtype)
    return h[:, 0]
