"""X-Decoder mask-transformer decoder (functional JAX).

Capability parity with modeling/interface/xdecoder.py (9 decoder layers over a
3-level feature pyramid round-robin; 201 learnable queries whose last slot is
a class/caption token; structured self-attention mask separating object
queries / class token / caption tokens (causal) / grounding tokens
(xdecoder.py:148-154); per-layer prediction heads with mask-conditioned
cross-attention (attn-mask thresholding at 0.5, :423-485); class logits via
language-embedding similarity; autoregressive captioning over the CLIP token
window (:325-420)).

Layout is batch-first [B, Q, C]; the 9-layer loop is unrolled (level sizes
differ per layer so a scan would force padding); attention masks are boolean
"allowed" matrices (the torch convention is inverted).
"""
from __future__ import annotations

import dataclasses
import math
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from cullavo_tpu.models.llava.clip_vit import layer_norm

NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class XDecoderConfig:
    hidden_dim: int = 512
    num_queries: int = 201
    nheads: int = 8
    dim_feedforward: int = 2048
    dec_layers: int = 9           # DEC_LAYERS-1 (configs/xdecoder_test.yaml:135)
    pre_norm: bool = False
    mask_dim: int = 512
    dim_proj: int = 512
    contxt_len: int = 77
    num_feature_levels: int = 3
    in_channels: int = 512
    captioning_step: int = 50
    layer_norm_eps: float = 1e-5
    task_mask: bool = True
    task_bbox: bool = True
    task_grounding: bool = True
    task_captioning: bool = True


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_xdecoder_params(cfg: XDecoderConfig, key: jax.Array, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 1024))  # sized for real configs (9-layer decoder / 6-layer encoder), not just tests
    D, F = cfg.hidden_dim, cfg.dim_feedforward

    def dense(shape):
        return (jax.random.normal(next(ks), shape) * 0.02).astype(dtype)

    def attn_params():
        return {"q_w": dense((D, D)), "q_b": jnp.zeros((D,), dtype),
                "k_w": dense((D, D)), "k_b": jnp.zeros((D,), dtype),
                "v_w": dense((D, D)), "v_b": jnp.zeros((D,), dtype),
                "o_w": dense((D, D)), "o_b": jnp.zeros((D,), dtype),
                "ln_s": jnp.ones((D,), dtype), "ln_b": jnp.zeros((D,), dtype)}

    layers = []
    for _ in range(cfg.dec_layers):
        layers.append({
            "cross": attn_params(),
            "self": attn_params(),
            "ffn": {"fc1_w": dense((D, F)), "fc1_b": jnp.zeros((F,), dtype),
                    "fc2_w": dense((F, D)), "fc2_b": jnp.zeros((D,), dtype),
                    "ln_s": jnp.ones((D,), dtype), "ln_b": jnp.zeros((D,), dtype)},
        })

    params = {
        "layers": layers,
        "decoder_norm": {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
        "query_feat": dense((cfg.num_queries, D)),
        "query_embed": dense((cfg.num_queries, D)),
        "level_embed": dense((cfg.num_feature_levels, D)),
        "input_proj": [{"w": dense((cfg.in_channels, D)), "b": jnp.zeros((D,), dtype)}
                       for _ in range(cfg.num_feature_levels)],
        "class_embed": dense((D, cfg.dim_proj)),
        "caping_embed": dense((D, cfg.dim_proj)),
        "pos_embed_caping": dense((cfg.contxt_len, D)),
        "mask_embed": {"w0": dense((D, D)), "b0": jnp.zeros((D,), dtype),
                       "w1": dense((D, D)), "b1": jnp.zeros((D,), dtype),
                       "w2": dense((D, cfg.mask_dim)), "b2": jnp.zeros((cfg.mask_dim,), dtype)},
        "bbox_embed": {"w0": dense((D, D)), "b0": jnp.zeros((D,), dtype),
                       "w1": dense((D, D)), "b1": jnp.zeros((D,), dtype),
                       "w2": dense((D, 4)), "b2": jnp.zeros((4,), dtype)},
    }
    return params


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def sine_position_embedding(H: int, W: int, dim: int, temperature: float = 10000.0):
    """2-D sine PE, detectron2 convention (modeling/modules/position_encoding.py:18-64),
    normalized; returns [H*W, dim]."""
    n_steps = dim // 2
    eps = 1e-6
    scale = 2 * math.pi
    y = (jnp.arange(H, dtype=jnp.float32) + 1.0)[:, None] / (H + eps) * scale
    x = (jnp.arange(W, dtype=jnp.float32) + 1.0)[None, :] / (W + eps) * scale
    y = jnp.broadcast_to(y, (H, W))
    x = jnp.broadcast_to(x, (H, W))
    dim_t = temperature ** (2 * (jnp.arange(n_steps) // 2) / n_steps)
    pos_x = x[..., None] / dim_t
    pos_y = y[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1).reshape(H, W, n_steps)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1).reshape(H, W, n_steps)
    return jnp.concatenate([pos_y, pos_x], axis=-1).reshape(H * W, dim)


def _mha(w, q_in, k_in, v_in, heads: int, allowed: Optional[jax.Array]):
    """Multi-head attention; allowed: [B, Q, K] or [B, 1, Q, K] bool."""
    B, Q, D = q_in.shape
    K = k_in.shape[1]
    hd = D // heads
    q = (q_in @ w["q_w"] + w["q_b"]).reshape(B, Q, heads, hd).transpose(0, 2, 1, 3)
    k = (k_in @ w["k_w"] + w["k_b"]).reshape(B, K, heads, hd).transpose(0, 2, 1, 3)
    v = (v_in @ w["v_w"] + w["v_b"]).reshape(B, K, heads, hd).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * (hd ** -0.5)
    if allowed is not None:
        if allowed.ndim == 3:
            allowed = allowed[:, None]
        s = jnp.where(allowed, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(q_in.dtype), v,
                     preferred_element_type=jnp.float32).astype(q_in.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(B, Q, D)
    return out @ w["o_w"] + w["o_b"]


def _post_norm_attn(w, x, key_val, heads, allowed, q_pos, k_pos, eps):
    """Post-norm residual attention (pre_norm=False in the active config)."""
    q_in = x + q_pos if q_pos is not None else x
    k_in = key_val + k_pos if k_pos is not None else key_val
    attn = _mha(w, q_in, k_in, key_val, heads, allowed)
    return layer_norm(x + attn, w["ln_s"], w["ln_b"], eps)


def _ffn(w, x, eps):
    y = jax.nn.relu(x @ w["fc1_w"] + w["fc1_b"])
    y = y @ w["fc2_w"] + w["fc2_b"]
    return layer_norm(x + y, w["ln_s"], w["ln_b"], eps)


def _mlp3(w, x):
    y = jax.nn.relu(x @ w["w0"] + w["b0"])
    y = jax.nn.relu(y @ w["w1"] + w["b1"])
    return y @ w["w2"] + w["b2"]


def structured_self_attn_allowed(cfg: XDecoderConfig, with_caption: bool):
    """The xdecoder.py:148-154 mask as an "allowed" matrix.

    Object queries [0..nq-2], class token [nq-1], caption tokens [nq..].
    Object↔class blocked both ways; queries never attend captions; captions
    attend queries + causally among themselves.
    """
    nq, cl = cfg.num_queries, cfg.contxt_len
    n = nq + cl if with_caption else nq
    allowed = jnp.ones((n, n), bool)
    if with_caption:
        allowed = allowed.at[:nq, nq:].set(False)
        causal = jnp.tril(jnp.ones((cl, cl), bool))
        allowed = allowed.at[nq:, nq:].set(causal)
    allowed = allowed.at[:nq - 1, nq - 1].set(False)
    allowed = allowed.at[nq - 1, :nq - 1].set(False)
    return allowed


def grounding_self_attn_allowed(cfg: XDecoderConfig, num_extra: int):
    """Grounding-mode mask: base structure on the first nq slots, the extra
    (duplicated-query + grounding-token) block fully self-attending, blocks
    between base and extra disallowed (xdecoder.py:237-244)."""
    nq = cfg.num_queries
    base = structured_self_attn_allowed(cfg, with_caption=False)
    n = nq + num_extra
    allowed = jnp.zeros((n, n), bool)
    allowed = allowed.at[:nq, :nq].set(base)
    allowed = allowed.at[nq:, nq:].set(True)
    return allowed


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _prepare_memories(params, cfg, features: list):
    """features: list of 3 [B, H, W, C] maps (res5, res4, res3 order as fed by
    the pixel decoder) → per-level (src [B, HW, D], pos [B, HW, D], (H, W))."""
    mems = []
    for i, f in enumerate(features):
        B, H, W, C = f.shape
        pos = sine_position_embedding(H, W, cfg.hidden_dim)[None]
        proj = params["input_proj"][i]
        src = f.reshape(B, H * W, C) @ proj["w"] + proj["b"] + params["level_embed"][i]
        mems.append((src, jnp.broadcast_to(pos, src.shape), (H, W)))
    return mems


def forward_prediction_heads(params, cfg: XDecoderConfig, output, mask_features,
                             target_size, text_class_embeds=None,
                             num_grounding: int = 0, logit_scale=None):
    """output: [B, N, D]; mask_features: [B, Hm, Wm, mask_dim].

    Returns dict with class/mask/bbox/caption predictions and the
    cross-attention mask for the next layer (allowed-bool, [B, N, HW]).
    """
    nq = cfg.num_queries
    x = layer_norm(output, params["decoder_norm"]["scale"], params["decoder_norm"]["bias"],
                   cfg.layer_norm_eps)

    outputs_captioning = x[:, nq:] @ params["caping_embed"] if x.shape[1] > nq else None

    # class-token recomputation: similarity-weighted mix of object tokens
    normed = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-7)
    obj = normed[:, :nq - 1]
    cls = normed[:, nq - 1:nq]
    sim = jax.nn.softmax(jnp.einsum("bod,bcd->bco", obj, cls), axis=-1)[:, 0, :, None]
    cls_tok = jnp.sum(sim * x[:, :nq - 1], axis=1, keepdims=True)

    if num_grounding > 0:
        decoder_output = jnp.concatenate(
            [x[:, :nq - 1], cls_tok, x[:, nq:2 * nq - 1]], axis=1)
    else:
        decoder_output = jnp.concatenate([x[:, :nq - 1], cls_tok], axis=1)

    class_embed = decoder_output @ params["class_embed"]
    outputs_class = None
    if text_class_embeds is not None:
        v = class_embed / (jnp.linalg.norm(class_embed, axis=-1, keepdims=True) + 1e-7)
        scale = jnp.exp(logit_scale) if logit_scale is not None else 1.0
        outputs_class = scale * jnp.einsum("bqd,cd->bqc", v, text_class_embeds)

    mask_embed = _mlp3(params["mask_embed"], decoder_output)
    outputs_mask = jnp.einsum("bqc,bhwc->bqhw", mask_embed, mask_features)

    # next-layer cross-attn mask: bicubic+antialias-resized sigmoid > 0.5 —
    # exactly the reference (xdecoder.py:458 F.interpolate mode="bicubic",
    # antialias=True); jax.image.resize bicubic antialiases on downscale by
    # default and matches torch to ~2e-7 (torch-parity harness)
    B, N = decoder_output.shape[:2]
    Ht, Wt = target_size
    resized = jax.image.resize(outputs_mask, (B, N, Ht, Wt), method="bicubic")
    allowed = (jax.nn.sigmoid(resized) >= 0.5).reshape(B, N, Ht * Wt)
    # reference unmasks row nq ("fill False for cls token", xdecoder.py:464-465):
    # an empty slice in seg mode (N == nq), the first grounding query when the
    # grounding slots are present (N == 2nq-1)
    if N > nq:
        allowed = allowed.at[:, nq:nq + 1, :].set(True)
    # fully-masked rows fall back to attending everywhere (xdecoder.py:266)
    dead = ~jnp.any(allowed, axis=-1, keepdims=True)
    allowed = allowed | dead

    outputs_bbox = _mlp3(params["bbox_embed"], decoder_output)

    return {
        "outputs_class": outputs_class,
        "outputs_mask": outputs_mask,
        "outputs_bbox": outputs_bbox,
        "outputs_caption": class_embed,
        "outputs_captioning": outputs_captioning,
        "attn_allowed": jax.lax.stop_gradient(allowed),
    }


def xdecoder_forward(
    params,
    cfg: XDecoderConfig,
    features: list,               # 3 pyramid maps [B, H, W, C], coarse→fine
    mask_features,                # [B, Hm, Wm, mask_dim]
    text_class_embeds=None,       # [C, dim_proj] cached class embeddings
    logit_scale=None,
    grounding_tokens=None,        # [B, G, D] (task='seg' train / grounding_eval)
    grounding_token_mask=None,    # [B, G] bool; False = padded token slot
    caption_tokens=None,          # [B, contxt_len, D] (task='vlp' train)
    captioning_spatial_mask=None,  # [B, H, W] bool; True = region caption
                                   # tokens must NOT attend (xdecoder.py:372-378)
    task: str = "seg",
    is_train: bool = False,
    remat: bool = False,
):
    """Main decoder loop (xdecoder.py:193-323).  Returns dict with
    pred_logits / pred_masks / pred_boxes / pred_captions (+ aux_outputs).

    ``remat=True`` checkpoints each decoder layer (cross/self-attn + FFN +
    prediction head): the per-layer attention probability tensors
    ([B, h, Q', HW] over the finest level) are recomputed in the backward
    instead of saved — the deep-supervision predictions themselves stay
    live (the loss consumes every layer's outputs)."""
    mems = _prepare_memories(params, cfg, features)
    B = features[0].shape[0]
    nq = cfg.num_queries
    eps = cfg.layer_norm_eps

    output = jnp.broadcast_to(params["query_feat"][None], (B, nq, cfg.hidden_dim))
    query_pos = jnp.broadcast_to(params["query_embed"][None], (B, nq, cfg.hidden_dim))

    use_grounding = (grounding_tokens is not None and cfg.task_grounding and
                     ((is_train and task == "seg") or task == "grounding_eval"))
    use_caption = (caption_tokens is not None and cfg.task_captioning and
                   is_train and task == "vlp")

    num_grounding = 0
    if use_caption:
        cap = jax.lax.stop_gradient(caption_tokens)
        output = jnp.concatenate([output, cap], axis=1)
        cap_pos = caption_tokens + params["pos_embed_caping"][None]
        query_pos = jnp.concatenate([query_pos, cap_pos], axis=1)
        self_allowed = structured_self_attn_allowed(cfg, with_caption=True)[None]
    elif use_grounding:
        G = grounding_tokens.shape[1]
        num_grounding = G
        # duplicated object queries serve as grounding-conditioned queries
        output = jnp.concatenate([output, output[:, :-1]], axis=1)
        query_pos = jnp.concatenate([query_pos, query_pos[:, :-1]], axis=1)
        self_allowed = grounding_self_attn_allowed(cfg, (nq - 1) + G)[None]
        if grounding_token_mask is not None:
            # padded grounding slots are invisible to every query: the
            # reference packs only attention_mask-true token embeds
            # (xdecoder_model.py:609-611); a static-shape column mask is
            # the jit-friendly equivalent
            K = nq + (nq - 1) + G
            col = jnp.concatenate(
                [jnp.ones((grounding_token_mask.shape[0], K - G), bool),
                 grounding_token_mask.astype(bool)], axis=1)
            self_allowed = self_allowed & col[:, None, :]
        g_tokens = jax.lax.stop_gradient(grounding_tokens)
    else:
        self_allowed = structured_self_attn_allowed(cfg, with_caption=False)[None]

    g_tokens = g_tokens if use_grounding else None
    preds = []
    results = forward_prediction_heads(params, cfg, output, mask_features,
                                       mems[0][2], text_class_embeds,
                                       num_grounding, logit_scale)
    preds.append(results)
    attn_allowed = results["attn_allowed"]

    def layer_step(i, lw, output, g_tokens, attn_allowed):
        level = i % cfg.num_feature_levels
        src, pos, size = mems[level]

        ca_allowed = attn_allowed
        if use_caption:
            # caption tokens attend the full memory — except an optional
            # excluded region (referring captioning, xdecoder.py:372-378:
            # the reference nearest-resizes the mask per level and marks
            # those memory positions disallowed for rows >= num_queries)
            extra = jnp.ones((B, cfg.contxt_len, ca_allowed.shape[-1]), bool)
            if captioning_spatial_mask is not None:
                m = jax.image.resize(
                    captioning_spatial_mask.astype(jnp.float32),
                    (B, *size), method="nearest") > 0.5
                extra = extra & ~m.reshape(B, 1, -1)
            ca_allowed = jnp.concatenate([ca_allowed, extra], axis=1)
        output = _post_norm_attn(lw["cross"], output, src, cfg.nheads,
                                 ca_allowed, query_pos, pos, eps)

        if use_grounding:
            output = jnp.concatenate([output, g_tokens], axis=1)
            query_pos_g = jnp.concatenate([query_pos, grounding_tokens], axis=1)
        else:
            query_pos_g = query_pos

        output = _post_norm_attn(lw["self"], output, output, cfg.nheads,
                                 self_allowed, query_pos_g, query_pos_g, eps)
        output = _ffn(lw["ffn"], output, eps)

        if use_grounding:
            g_tokens = output[:, -num_grounding:]
            output = output[:, :-num_grounding]

        next_size = mems[(i + 1) % cfg.num_feature_levels][2]
        results = forward_prediction_heads(params, cfg, output, mask_features,
                                           next_size, text_class_embeds,
                                           num_grounding, logit_scale)
        return output, g_tokens, results

    for i, lw in enumerate(params["layers"]):
        fn = (jax.checkpoint(
                  functools.partial(layer_step, i),
                  policy=jax.checkpoint_policies.nothing_saveable)
              if remat else functools.partial(layer_step, i))
        output, g_tokens, results = fn(lw, output, g_tokens, attn_allowed)
        preds.append(results)
        attn_allowed = results["attn_allowed"]

    if task == "vlp":
        return {
            "pred_captionings": preds[-1]["outputs_captioning"],
            "pred_captions": preds[-1]["outputs_caption"],
            "aux_outputs": [{"pred_captionings": p["outputs_captioning"],
                             "pred_captions": p["outputs_caption"]} for p in preds[:-1]],
        }
    return {
        "pred_logits": preds[-1]["outputs_class"],
        "pred_masks": preds[-1]["outputs_mask"],
        "pred_boxes": preds[-1]["outputs_bbox"],
        "pred_captions": preds[-1]["outputs_caption"],
        "pred_gtext": preds[-1]["outputs_caption"],
        "aux_outputs": [{"pred_logits": p["outputs_class"],
                         "pred_masks": p["outputs_mask"],
                         "pred_boxes": p["outputs_bbox"],
                         "pred_captions": p["outputs_caption"]} for p in preds[:-1]],
    }


def forward_captioning(params, cfg: XDecoderConfig, features, mask_features,
                       token_embedding_fn, vocab_embs, token_ids_start,
                       captioning_mask=None):
    """Greedy autoregressive captioning (xdecoder.py:325-420): run the decoder
    with caption slots, take the captioning embedding at step t, pick the
    vocabulary token with the largest raw dot product, feed back.

    ``token_embedding_fn(ids) -> [B, T, hidden_dim]`` maps token ids to
    decoder-space embeddings — like the reference's per-step
    ``forward_language_token`` call (xdecoder.py:356), it must run the CLIP
    text transformer over the partial caption and project with lang_proj
    (contextual embeddings, NOT a raw table lookup).  ``vocab_embs`` [V, D]
    is the RAW token-embedding table: the reference scores with an
    unnormalized, unprojected dot against ``token_embedding.weight``
    (xdecoder.py:351-353,405-407 — the norm line is commented out there).
    ``captioning_mask`` [B, H, W] bool (True = excluded region) enables the
    reference's referring captioning: caption tokens cannot cross-attend the
    masked region (xdecoder.py:372-378).  Returns [B, contxt_len] token ids.
    """
    cl = cfg.contxt_len
    steps = min(cfg.captioning_step, cl - 1)   # reference loops captioning_step

    def step(carry, t):
        ids = carry
        cap_emb = token_embedding_fn(ids)
        out = xdecoder_forward(params, cfg, features, mask_features,
                               caption_tokens=cap_emb,
                               captioning_spatial_mask=captioning_mask,
                               task="vlp", is_train=True)
        cap_logits = out["pred_captionings"]          # [B, cl, dim_proj]
        logits_t = jnp.take_along_axis(
            cap_logits, jnp.full((cap_logits.shape[0], 1, 1), t), axis=1)[:, 0]
        nxt = jnp.argmax(logits_t @ vocab_embs.T, axis=-1)
        ids = jax.lax.dynamic_update_slice(ids, nxt[:, None].astype(ids.dtype),
                                           (0, t + 1))
        return ids, None

    B = features[0].shape[0]
    ids = jnp.full((B, cl), 0, jnp.int32).at[:, 0].set(token_ids_start)
    ids, _ = jax.lax.scan(step, ids, jnp.arange(steps))
    return ids
