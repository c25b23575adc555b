"""Vision-language contrastive losses (JAX, SPMD-native).

Capability parity with modeling/language/loss.py: ``vl_similarity``,
``vl_contrastive_loss`` (CLIP-style symmetric InfoNCE over globally gathered
features), ``vl_multilabel_contrastive_loss`` (multi-positive soft targets —
the hash-aware noun matching of ``ql_multi_contrastive_loss``), and the
image-text contrastive loss used by forward_vlp (xdecoder_model.py:412-420).

The reference's autograd-aware ``all_gather_grad`` (loss.py:33-39) is replaced
by ``jax.lax.all_gather(..., axis_name)`` inside shard_map — differentiable
by construction; pass ``axis_name=None`` for single-device use.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _maybe_gather(x: jax.Array, axis_name: Optional[str]):
    if axis_name is None:
        return x
    return jax.lax.all_gather(x, axis_name, tiled=True)


def vl_similarity(image_feat: jax.Array, text_feat: jax.Array,
                  temperature: jax.Array | float = 1.0) -> jax.Array:
    """Scaled cosine-style similarity logits (loss.py vl_similarity)."""
    scale = jnp.clip(jnp.exp(temperature), max=100.0) \
        if not isinstance(temperature, float) else temperature
    return scale * jnp.einsum("...id,...jd->...ij", image_feat, text_feat)


def soft_cross_entropy(logits: jax.Array, soft_targets: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(soft_targets * logp, axis=-1))


def vl_contrastive_loss(image_feat: jax.Array, text_feat: jax.Array,
                        temperature: jax.Array | float = 1.0,
                        axis_name: Optional[str] = None) -> jax.Array:
    """Symmetric InfoNCE; features pre-normalized ([N, D] per device)."""
    local_n = image_feat.shape[0]
    img_all = _maybe_gather(image_feat, axis_name)
    txt_all = _maybe_gather(text_feat, axis_name)
    logits = jnp.matmul(img_all, txt_all.T)
    scale = jnp.clip(jnp.exp(temperature), max=100.0) \
        if not isinstance(temperature, float) else temperature
    logits = logits * scale
    n = logits.shape[0]
    labels = jnp.arange(n)
    li = -jnp.mean(jnp.take_along_axis(jax.nn.log_softmax(logits, -1),
                                       labels[:, None], 1))
    lt = -jnp.mean(jnp.take_along_axis(jax.nn.log_softmax(logits.T, -1),
                                       labels[:, None], 1))
    return 0.5 * (li + lt)


def multilabel_contrastive_loss(image_feat: jax.Array, text_feat: jax.Array,
                                positive_mask: jax.Array,
                                temperature: jax.Array | float = 1.0) -> jax.Array:
    """Multi-positive soft-target contrastive (ql_multi_contrastive_loss
    semantics): ``positive_mask`` [N_img, N_txt] marks hash-matched pairs;
    targets are uniform over each row's positives."""
    logits = vl_similarity(image_feat, text_feat, temperature)
    pos = positive_mask.astype(jnp.float32)
    row_target = pos / jnp.maximum(pos.sum(-1, keepdims=True), 1.0)
    col_target = pos.T / jnp.maximum(pos.T.sum(-1, keepdims=True), 1.0)
    li = soft_cross_entropy(logits, row_target)
    lt = soft_cross_entropy(logits.T, col_target)
    return 0.5 * (li + lt)


def image_text_contrastive_loss(image_emb: jax.Array, text_emb: jax.Array,
                                logit_scale: jax.Array,
                                axis_name: Optional[str] = None) -> jax.Array:
    """The forward_vlp ITC loss (backbone-ensembled caption retrieval,
    xdecoder_model.py:412-420): normalize, gather, symmetric CE."""
    image_emb = image_emb / (jnp.linalg.norm(image_emb, axis=-1, keepdims=True) + 1e-7)
    text_emb = text_emb / (jnp.linalg.norm(text_emb, axis=-1, keepdims=True) + 1e-7)
    return vl_contrastive_loss(image_emb, text_emb, logit_scale, axis_name)


def fine_grained_itc_loss(query_emb: jax.Array, token_emb: jax.Array,
                          token_mask: jax.Array,
                          logit_scale: jax.Array) -> jax.Array:
    """The fine-grained query↔caption-token contrastive term of the
    reference's ``loss_itc`` (criterion.py:165-196): object-query embeddings
    vs the batch's caption TOKEN embeddings, soft targets weighted by token
    position (``mask * cumsum(mask)``), i2t and t2i combined 0.7/0.3.
    The decoder retrieval loss is coarse + 0.5 × this term
    (criterion.py:198 ``loss_contrast + loss_contrast_fine * 0.5``).

    query_emb [B, Q, D] (pred_captions object slots, un-normalized);
    token_emb [B, T, D] (caption token embeddings through lang_proj);
    token_mask [B, T] {0,1}.  Static-shape: the reference's boolean
    ``keep`` gather is replaced by -inf key bias / zero row weights."""
    B, Q, D = query_emb.shape
    T = token_emb.shape[1]
    v = query_emb / (jnp.linalg.norm(query_emb, axis=-1, keepdims=True) + 1e-7)
    t = token_emb / (jnp.linalg.norm(token_emb, axis=-1, keepdims=True) + 1e-7)
    scale = jnp.clip(jnp.exp(logit_scale), max=100.0)
    m = token_mask.astype(jnp.float32)
    w = m * jnp.cumsum(m, axis=1)                       # positional weights
    valid = m.reshape(B * T)                            # [BT]

    # soft targets: image b ↔ its own caption's tokens, position-weighted
    gt = (jnp.eye(B)[:, :, None] * w[None]).reshape(B, B * T)
    gt = gt / (gt.sum(axis=1, keepdims=True) + 1e-7)

    tt = t.reshape(B * T, D)
    # i2t: per-image logits = query-mean similarity to every batch token
    logits_vt = scale * jnp.einsum("bqd,kd->bqk", v, tt).mean(axis=1)  # [B, BT]
    bias = jnp.where(valid > 0, 0.0, -1e30)[None]
    loss_vt = -jnp.mean(jnp.sum(
        gt * jax.nn.log_softmax(logits_vt + bias, axis=-1), axis=-1))

    # t2i: per-token logits = query-mean similarity to every batch image
    logits_tv = scale * jnp.einsum("kd,bqd->kbq", tt, v).mean(axis=-1)  # [BT, B]
    ce_rows = -jnp.sum(gt.T * jax.nn.log_softmax(logits_tv, axis=-1), axis=-1)
    loss_tv = jnp.sum(ce_rows * valid) / jnp.maximum(jnp.sum(valid), 1.0)

    return loss_vt * 0.7 + loss_tv * 0.3
