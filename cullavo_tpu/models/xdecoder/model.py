"""GeneralizedXdecoder: full segmentation/VL model assembly (functional JAX).

Capability parity with modeling/architectures/xdecoder_model.py: FocalNet
backbone + FPN pixel decoder + X-Decoder predictor + CLIP-style language
encoder; training via Hungarian-matched set criterion (``forward_seg``,
:288-365) with grounding-token packing; inference paths ``evaluate``
(semantic/panoptic/instance, :436-505, 765-878) and ``evaluate_grounding``
(per-text conditioning + vl-similarity mask pick, :595-662).

Devices compute dense heads under jit; the panoptic stuff-merge sequential
scan runs on host numpy (it is per-image eval postprocessing, like the
reference's CPU loop).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cullavo_tpu.models.xdecoder import text_encoder as te
from cullavo_tpu.models.xdecoder.criterion import CriterionConfig, set_criterion
from cullavo_tpu.models.xdecoder.decoder import (XDecoderConfig,
                                                 init_xdecoder_params,
                                                 xdecoder_forward)
from cullavo_tpu.models.xdecoder.focalnet import (FocalNetConfig,
                                                  focalnet_forward,
                                                  init_focalnet_params)
from cullavo_tpu.models.xdecoder.fpn import FPNConfig, fpn_forward, init_fpn_params
from cullavo_tpu.models.xdecoder.text_encoder import (TextEncoderConfig,
                                                      init_text_encoder_params)

PIXEL_MEAN = (123.675, 116.28, 103.53)
PIXEL_STD = (58.395, 57.12, 57.375)


@dataclasses.dataclass(frozen=True)
class XDecoderModelConfig:
    # ``backbone`` holds the config matching ``backbone_name``
    # (FocalNetConfig | DaViTConfig | SamVitConfig); ``fpn`` holds the pixel
    # decoder config matching ``encoder_name`` (FPNConfig |
    # DeformEncoderConfig) — MODEL.BACKBONE.NAME / MODEL.ENCODER.NAME
    # dispatch, like the reference registries (SURVEY.md §1)
    backbone: object = dataclasses.field(default_factory=FocalNetConfig)
    fpn: object = dataclasses.field(default_factory=FPNConfig)
    decoder: XDecoderConfig = dataclasses.field(default_factory=XDecoderConfig)
    text: TextEncoderConfig = dataclasses.field(default_factory=TextEncoderConfig)
    criterion: CriterionConfig = dataclasses.field(default_factory=CriterionConfig)
    num_classes: int = 133
    object_mask_threshold: float = 0.8
    overlap_threshold: float = 0.8
    test_topk_per_image: int = 100
    backbone_name: str = "focal"
    encoder_name: str = "transformer_encoder_fpn"


def _backbone_apply(params, cfg: XDecoderModelConfig, images,
                    remat: bool = False):
    name = cfg.backbone_name
    if name in ("focal", "focal_dw"):
        return focalnet_forward(params, cfg.backbone, images, remat=remat)
    if name == "davit":
        from cullavo_tpu.models.xdecoder.davit import davit_forward

        return davit_forward(params, cfg.backbone, images)
    if name == "vit":
        from cullavo_tpu.models.xdecoder.sam_vit import sam_vit_forward

        return sam_vit_forward(params, cfg.backbone, images)
    raise KeyError(f"backbone {name!r}")


def _encoder_apply(params, cfg: XDecoderModelConfig, feats):
    if cfg.encoder_name == "transformer_encoder_fpn":
        return fpn_forward(params, cfg.fpn, feats)
    if cfg.encoder_name == "transformer_encoder_deform":
        from cullavo_tpu.models.xdecoder.deform_encoder import deform_encoder_forward

        return deform_encoder_forward(params, cfg.fpn, feats)
    raise KeyError(f"encoder {cfg.encoder_name!r}")


def _backbone_init(cfg: XDecoderModelConfig, key, dtype):
    name = cfg.backbone_name
    if name in ("focal", "focal_dw"):
        return init_focalnet_params(cfg.backbone, key, dtype)
    if name == "davit":
        from cullavo_tpu.models.xdecoder.davit import init_davit_params

        return init_davit_params(cfg.backbone, key, dtype)
    if name == "vit":
        from cullavo_tpu.models.xdecoder.sam_vit import init_sam_vit_params

        return init_sam_vit_params(cfg.backbone, key, dtype)
    raise KeyError(f"backbone {name!r}")


def _encoder_init(cfg: XDecoderModelConfig, key, dtype):
    if cfg.encoder_name == "transformer_encoder_fpn":
        return init_fpn_params(cfg.fpn, key, dtype)
    if cfg.encoder_name == "transformer_encoder_deform":
        from cullavo_tpu.models.xdecoder.deform_encoder import (
            init_deform_encoder_params)

        return init_deform_encoder_params(cfg.fpn, key, dtype)
    raise KeyError(f"encoder {cfg.encoder_name!r}")


def _backbone_last_channels(cfg: XDecoderModelConfig) -> int:
    bb = cfg.backbone
    if hasattr(bb, "num_features"):
        nf = bb.num_features
        return nf[-1] if not callable(nf) else nf()[-1]
    if hasattr(bb, "embed_dims"):
        return bb.embed_dims[-1]
    if hasattr(bb, "out_dims"):
        return bb.out_dims[-1]
    raise AttributeError(f"cannot infer channels for {type(bb).__name__}")


def tiny_xdecoder_config() -> XDecoderModelConfig:
    return XDecoderModelConfig(
        backbone=FocalNetConfig(embed_dim=16, depths=(1, 1, 1, 1),
                                focal_levels=(2, 2, 2, 2), focal_windows=(3, 3, 3, 3)),
        fpn=FPNConfig(in_channels=(16, 32, 64, 128), conv_dim=64, mask_dim=32,
                      gn_groups=8, enc_layers=2, enc_heads=4, enc_ffn=128),
        # dim_lang == hidden_dim == dim_proj, the reference invariant (all 512
        # there) — grounding tokens feed the decoder stream directly
        decoder=XDecoderConfig(hidden_dim=64, num_queries=9, nheads=4,
                               dim_feedforward=128, dec_layers=3, mask_dim=32,
                               dim_proj=64, contxt_len=8, in_channels=64),
        text=TextEncoderConfig(vocab_size=64, width=32, heads=4, layers=2,
                               context_length=8, dim_lang=64),
        criterion=CriterionConfig(num_classes=6, num_points=256),
        num_classes=6,
    )


def init_xdecoder_model_params(cfg: XDecoderModelConfig, key: jax.Array,
                               dtype=jnp.float32):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return {
        "backbone": _backbone_init(cfg, k1, dtype),
        "fpn": _encoder_init(cfg, k2, dtype),
        "decoder": init_xdecoder_params(cfg.decoder, k3, dtype),
        "text": init_text_encoder_params(cfg.text, k4, dtype),
        # res5 → lang-space projection for the backbone-ensemble retrieval ITC
        # (xdecoder_model.py:412-420 backbone branch)
        "backbone_proj": (jax.random.normal(
            k5, (_backbone_last_channels(cfg), cfg.text.dim_lang)) * 0.02
        ).astype(dtype),
    }


def normalize_images(images_uint8_nhwc: jax.Array) -> jax.Array:
    mean = jnp.asarray(PIXEL_MEAN, jnp.float32)
    std = jnp.asarray(PIXEL_STD, jnp.float32)
    return (images_uint8_nhwc.astype(jnp.float32) - mean) / std


def backbone_and_pixel_decoder(params, cfg: XDecoderModelConfig, images,
                               remat: bool = False):
    feats = _backbone_apply(params["backbone"], cfg, images, remat=remat)
    mask_features, _, pyramid = _encoder_apply(params["fpn"], cfg, feats)
    return mask_features, pyramid


def forward_seg_train(params, cfg: XDecoderModelConfig, images, targets,
                      text_class_embeds, rng, grounding_tokens=None,
                      data_axis=None, remat: bool = False):
    """Training forward: losses dict (xdecoder_model.py:288-365).

    With ``grounding_tokens`` [B, G, D] (padded per-image referring-phrase
    token embeddings) and targets carrying ``grounding_masks`` [B, G, H, W] +
    ``grounding_valid`` [B, G], the grounding BCE+dice terms are added
    (criterion.py forward_grounding semantics)."""
    from cullavo_tpu.models.xdecoder.criterion import (loss_groundings,
                                                       match_groundings)

    mask_features, pyramid = backbone_and_pixel_decoder(params, cfg, images,
                                                        remat=remat)
    out = xdecoder_forward(params["decoder"], cfg.decoder, pyramid, mask_features,
                           text_class_embeds=text_class_embeds,
                           logit_scale=params["text"]["logit_scale"],
                           grounding_tokens=grounding_tokens,
                           task="seg", is_train=True, remat=remat)
    nq = cfg.decoder.num_queries

    # criterion sees OBJECT queries only ([:nq-1]) — the class token and any
    # grounding-conditioned duplicate slots are excluded from seg matching
    # (xdecoder_model.py:338-345 slices every layer unconditionally)
    def _obj(o):
        return {k: (v[:, :nq - 1] if k in ("pred_logits", "pred_masks",
                                           "pred_boxes") and v is not None
                    else v)
                for k, v in o.items() if k != "aux_outputs"}

    crit_out = _obj(out)
    crit_out["aux_outputs"] = [_obj(a) for a in out.get("aux_outputs", [])]
    losses = set_criterion(crit_out, targets, cfg.criterion, rng, data_axis)
    if grounding_tokens is not None and "grounding_masks" in targets:
        # Hungarian-match ALL nq-1 grounding-conditioned queries to the G
        # phrase targets (matcher.py grounding_forward) — see
        # forward_joint_train for the rationale
        g_masks_all = out["pred_masks"][:, nq:]
        g_texts_all = out["pred_captions"][:, nq:]
        r_gmatch, r_ground = jax.random.split(jax.random.fold_in(rng, 17))
        g_src, g_valid, _ = match_groundings(
            g_masks_all, g_texts_all, targets["grounding_masks"],
            grounding_tokens, targets["grounding_valid"],
            params["text"]["logit_scale"], r_gmatch, cfg.criterion)
        g_masks = jnp.take_along_axis(g_masks_all, g_src[:, :, None, None],
                                      axis=1)
        bce, dice = loss_groundings(g_masks, targets["grounding_masks"],
                                    g_valid, r_ground, cfg.criterion)
        losses["loss_grounding_bce_0"] = cfg.criterion.weight_grounding_bce * bce
        losses["loss_grounding_dice_0"] = cfg.criterion.weight_grounding_dice * dice
    return losses


def forward_joint_train(params, cfg: XDecoderModelConfig, batch, rng,
                        data_axis=None, remat: bool = False):
    """Joint seg + caption + captioning + retrieval + grounding training step
    forward — the reference's headline multi-task objective
    (xdecoder_model.py:137-149 loss-weight table; forward_seg :288-365 +
    forward_vlp :378-420 over the merged COCO panoptic+caption+grounding
    batches built by data/coco_caption_grounding.py).

    ``batch`` (all static-shape, from ``collate_joint`` + class tokens):
      image [B,H,W,3] normalized; classes/masks/boxes/valid seg targets;
      labels_hash [B,N]; class_ids/class_mask [C+1,T] class-name tokens;
      caption_ids/caption_mask [B,P,T] + caption_hash/caption_valid;
      caption_text_ids/_mask [B,T]; grounding_ids/grounding_token_mask
      [B,G,T] + grounding_hash/grounding_valid + grounding_masks [B,G,h,w].

    Text embeddings are computed INSIDE the step so the text encoder trains
    (the reference's get_text_embeddings with grad).  Returns the loss dict
    with the reference's key names.
    """
    from cullavo_tpu.models.xdecoder.criterion import (loss_captionings,
                                                      loss_captions,
                                                      loss_grounding_ce,
                                                      loss_groundings,
                                                      match_groundings,
                                                      set_criterion)
    from cullavo_tpu.models.xdecoder.language_loss import (
        fine_grained_itc_loss, image_text_contrastive_loss)

    tp, tc = params["text"], cfg.text
    # -- text side (trained end-to-end)
    class_embs = te.forward_language(tp, tc, batch["class_ids"],
                                     batch["class_mask"], norm=True,
                                     remat=remat)
    B, P, T = batch["caption_ids"].shape
    cap_embs = te.forward_language(
        tp, tc, batch["caption_ids"].reshape(B * P, T),
        batch["caption_mask"].reshape(B * P, T),
        remat=remat).reshape(B, P, -1)
    G = batch["grounding_ids"].shape[1]
    _, g_cls = te.forward_language_token(
        tp, tc, batch["grounding_ids"].reshape(B * G, T),
        batch["grounding_token_mask"].reshape(B * G, T), remat=remat)
    # zero padded phrase slots: their EOT embeddings are garbage (all-zero
    # ids) and would otherwise inject noise into query self-attention
    grounding_tokens = (g_cls.reshape(B, G, -1)
                        * batch["grounding_valid"][:, :, None].astype(g_cls.dtype))
    cap_tok, cap_sent = te.forward_language_token(
        tp, tc, batch["caption_text_ids"], batch["caption_text_mask"],
        remat=remat)
    vocab_embs = tp["token_embedding"] @ tp["lang_proj"]
    logit_scale = tp["logit_scale"]

    # -- vision trunk (shared by both decoder passes)
    feats = _backbone_apply(params["backbone"], cfg, batch["image"], remat=remat)
    mask_features, _, pyramid = _encoder_apply(params["fpn"], cfg, feats)

    # -- seg pass: mask/class/box + caption + grounding losses
    out = xdecoder_forward(params["decoder"], cfg.decoder, pyramid,
                           mask_features, text_class_embeds=class_embs,
                           logit_scale=logit_scale,
                           grounding_tokens=grounding_tokens,
                           task="seg", is_train=True, remat=remat)
    targets = {k: batch[k] for k in ("classes", "masks", "boxes", "valid")}
    rng, r_crit, r_ground = jax.random.split(rng, 3)
    # Hungarian matching over OBJECT queries only ([:nq-1]) — the class token
    # and grounding-conditioned duplicate slots are excluded
    # (xdecoder_model.py:338-365 query-slot slicing)
    nq = cfg.decoder.num_queries

    def _obj(o):
        return {k: (v[:, :nq - 1] if k in ("pred_logits", "pred_masks",
                                           "pred_boxes") and v is not None
                    else v)
                for k, v in o.items() if k != "aux_outputs"}

    crit_out = _obj(out)
    crit_out["aux_outputs"] = [_obj(a) for a in out.get("aux_outputs", [])]
    raw, all_idx = set_criterion(
        crit_out, targets, cfg.criterion, r_crit, data_axis,
        return_indices="all")
    # reference key names (criterion.py: loss_mask_ce_0 / loss_bbox_0 / ...;
    # numeric suffixes already carry the reference layer_id — 0 = final)
    rename = {"loss_ce": "loss_mask_ce", "loss_mask_bce": "loss_mask_bce",
              "loss_mask_dice": "loss_mask_dice", "loss_bbox": "loss_bbox",
              "loss_giou": "loss_giou"}
    losses = {}
    for k, v in raw.items():
        for old, new in rename.items():
            if k == old:
                losses[f"{new}_0"] = v
                break
            if k.startswith(old + "_"):
                losses[f"{new}_{int(k[len(old) + 1:])}"] = v
                break
    crit = cfg.criterion

    # deep supervision (criterion.py:747-760 + yaml TOP_*_LAYERS: 3): the
    # text-side losses apply to the top-3 decoder predictions — reference
    # layer_id r supervises prediction preds[L-1-r] (the aux list is in
    # FORWARD order, aux[j] = prediction j; final = layer_id 0)
    aux = out.get("aux_outputs", [])
    L = len(aux) + 1

    def seg_pred(r):
        """Decoder prediction at reference layer_id r (full query axis)."""
        return out if r == 0 else aux[L - 1 - r]

    for r in range(min(crit.top_x_layers_caption, L)):
        losses[f"loss_caption_{r}"] = crit.weight_caption * loss_captions(
            seg_pred(r)["pred_captions"][:, :nq - 1], *all_idx[r],
            batch["classes"], batch["labels_hash"], class_embs, cap_embs,
            batch["caption_hash"], batch["caption_valid"], logit_scale)

    # grounding: Hungarian-match ALL nq-1 duplicated queries to the G
    # phrases (matcher.py grounding_forward) — the duplicated queries carry
    # no per-phrase binding, so a fixed slot↔phrase pairing would supervise
    # noise; matching mirrors evaluate_grounding's argmax at inference.
    # Re-matched per supervised layer, as the reference's loss_groundings
    # re-runs its grounding matcher inside every aux call (criterion.py:775)
    for r in range(min(crit.top_x_layers_grounding, L)):
        r_gmatch, r_gpts, r_ground = jax.random.split(r_ground, 3)
        p = seg_pred(r)
        g_masks_all = p["pred_masks"][:, nq:]         # [B, nq-1, Hm, Wm]
        g_texts_all = p["pred_captions"][:, nq:]
        g_src, g_valid, g_sim = match_groundings(
            g_masks_all, g_texts_all, batch["grounding_masks"],
            grounding_tokens, batch["grounding_valid"], logit_scale,
            r_gmatch, cfg.criterion)
        g_masks_pred = jnp.take_along_axis(
            g_masks_all, g_src[:, :, None, None], axis=1)  # [B, G, Hm, Wm]
        bce, dice = loss_groundings(g_masks_pred, batch["grounding_masks"],
                                    g_valid, r_gpts, cfg.criterion)
        losses[f"loss_grounding_bce_{r}"] = crit.weight_grounding_bce * bce
        losses[f"loss_grounding_dice_{r}"] = crit.weight_grounding_dice * dice
        losses[f"loss_grounding_ce_{r}"] = (
            crit.weight_grounding_ce
            * loss_grounding_ce(g_sim, g_src, g_valid, batch["grounding_hash"]))

    # -- vlp pass: captioning token CE + retrieval ITC (decoder + backbone)
    out_vlp = xdecoder_forward(params["decoder"], cfg.decoder, pyramid,
                               mask_features, caption_tokens=cap_tok,
                               task="vlp", is_train=True, remat=remat)
    aux_vlp = out_vlp.get("aux_outputs", [])
    Lv = len(aux_vlp) + 1

    def vlp_pred(r):
        return out_vlp if r == 0 else aux_vlp[Lv - 1 - r]

    for r in range(min(crit.top_x_layers_captioning, Lv)):
        losses[f"loss_captioning_{r}"] = crit.weight_captioning * loss_captionings(
            vlp_pred(r)["pred_captionings"], cap_tok, batch["caption_text_ids"],
            batch["caption_text_mask"], vocab_embs, logit_scale)
    for r in range(min(crit.top_x_layers_retrieval, Lv)):
        # reference loss_itc (criterion.py:165-198): coarse image↔caption
        # contrastive + 0.5 × the fine-grained query↔token term
        pc = vlp_pred(r)["pred_captions"]
        coarse = image_text_contrastive_loss(pc[:, nq - 1], cap_sent,
                                             logit_scale, data_axis)
        fine = fine_grained_itc_loss(pc[:, :nq - 1], cap_tok,
                                     batch["caption_text_mask"], logit_scale)
        losses[f"loss_retrieval_decoder_{r}"] = (
            crit.weight_retrieval_decoder * (coarse + 0.5 * fine))
    if "backbone_proj" in params:
        v5 = jnp.mean(feats["res5"], axis=(1, 2)) @ params["backbone_proj"]
        losses["loss_retrieval_backbone_0"] = (
            crit.weight_retrieval_backbone * image_text_contrastive_loss(
                v5, cap_sent, logit_scale, data_axis))
    return losses


def forward_eval(params, cfg: XDecoderModelConfig, images, text_class_embeds,
                 out_size: Optional[tuple] = None):
    """Dense eval forward: upsampled mask logits + class logits
    (xdecoder_model.py evaluate, :436-505)."""
    mask_features, pyramid = backbone_and_pixel_decoder(params, cfg, images)
    out = xdecoder_forward(params["decoder"], cfg.decoder, pyramid, mask_features,
                           text_class_embeds=text_class_embeds,
                           logit_scale=params["text"]["logit_scale"],
                           task="eval", is_train=False)
    mask_cls = out["pred_logits"]          # [B, Q, C+1]
    mask_pred = out["pred_masks"]          # [B, Q, h, w]
    if out_size is not None:
        B, Q = mask_pred.shape[:2]
        # reference upsamples bicubic+antialias (xdecoder_model.py:452-458);
        # jax bicubic matches torch's antialiased bicubic to ~2e-7
        mask_pred = jax.image.resize(mask_pred, (B, Q, *out_size), method="bicubic")
    return mask_cls, mask_pred, out["pred_boxes"]


@functools.lru_cache(maxsize=16)
def _resize_matrix(src: int, dst: int) -> np.ndarray:
    """1-D bilinear interpolation as a dense [dst, src] matrix — built by
    resizing the identity, so it reproduces ``jax.image.resize``'s bilinear
    weights exactly (resize is linear in its input).  Returned as numpy so
    the cached value is a safe constant under any jit trace."""
    eye = np.eye(src, dtype=np.float32)
    # ensure_compile_time_eval: jax ops stage into any active jit trace even
    # on concrete inputs — this forces an eager evaluation so the cached
    # value is a real numpy constant
    with jax.ensure_compile_time_eval():
        m = jax.image.resize(jnp.asarray(eye), (dst, src), method="bilinear")
    return np.asarray(m)


def resize_bilinear_matmul(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize of the last two axes via two matmul contractions.

    Numerically equal to ``jax.image.resize(x, (..., out_h, out_w),
    "bilinear")`` (same separable linear map).  NOTE: measured SLOWER than
    jax.image.resize inside the 512² eval graph (12.3 vs 18.1 img/s — the
    einsum intermediates force big layout transposes); kept as a tested
    utility for shapes where the gather lowering is the bottleneck."""
    *lead, h, w = x.shape
    A = jnp.asarray(_resize_matrix(h, out_h))              # [H, h]
    Bm = jnp.asarray(_resize_matrix(w, out_w))             # [W, w]
    y = jnp.einsum("Hh,...hw->...Hw", A, x.astype(jnp.float32))
    y = jnp.einsum("Ww,...Hw->...HW", Bm, y)
    return y.astype(x.dtype)


def semantic_inference(mask_cls, mask_pred, keep_background=False):
    """[Q, C+1], [Q, H, W] → [C, H, W] (xdecoder_model.py:765-772)."""
    probs = jax.nn.softmax(mask_cls, axis=-1)
    if not keep_background:
        probs = probs[..., :-1]
    return jnp.einsum("qc,qhw->chw", probs, jax.nn.sigmoid(mask_pred))


def semantic_inference_argmax(mask_cls, mask_pred, keep_background=False):
    """Fused ``argmax_c semantic_inference(...)`` → [H, W] int32.

    Equal to ``jnp.argmax(semantic_inference(...), 0)`` but ~10× faster at
    512²: the spatial axes are flattened so the contraction is one [C, Q] @
    [Q, H·W] matmul (the unflattened qhw einsum tiles poorly), and only the
    per-pixel argmax is materialized instead of the [C, H, W] fp32 map
    (537 MB per image at 512²/134 classes)."""
    Q, H, W = mask_pred.shape
    probs = jax.nn.softmax(mask_cls, axis=-1)
    if not keep_background:
        probs = probs[..., :-1]
    m = jax.nn.sigmoid(mask_pred.astype(jnp.float32)).reshape(Q, H * W)
    scores = jax.lax.dot_general(probs.astype(jnp.float32), m,
                                 (((0,), (0,)), ((), ())))     # [C, H*W]
    return jnp.argmax(scores, axis=0).astype(jnp.int32).reshape(H, W)


def instance_inference(mask_cls, mask_pred, num_classes: int, topk: int,
                       thing_mask: Optional[jax.Array] = None):
    """Top-k (query, class) detections (xdecoder_model.py:831-878).

    Returns dict of masks [K, H, W] (binary), scores [K], classes [K].
    """
    Q = mask_cls.shape[0]
    scores = jax.nn.softmax(mask_cls, axis=-1)[:, :-1]        # [Q, C]
    flat = scores.reshape(-1)
    if thing_mask is not None:
        flat = flat * jnp.tile(thing_mask.astype(flat.dtype), (Q,))
    top_scores, top_idx = jax.lax.top_k(flat, min(topk, flat.shape[0]))
    labels = top_idx % num_classes
    query_idx = top_idx // num_classes
    masks = mask_pred[query_idx]                              # [K, H, W] logits
    binary = (masks > 0).astype(jnp.float32)
    mask_score = jnp.sum(jax.nn.sigmoid(masks) * binary, axis=(1, 2)) / (
        jnp.sum(binary, axis=(1, 2)) + 1e-6)
    return {"masks": binary, "scores": top_scores * mask_score, "classes": labels}


def panoptic_inference_host(mask_cls: np.ndarray, mask_pred: np.ndarray,
                            thing_ids, object_mask_threshold=0.8,
                            overlap_threshold=0.8):
    """Host-side stuff-merge panoptic assembly (xdecoder_model.py:774-829).
    mask_cls [Q, C+1] logits; mask_pred [Q, H, W] logits."""
    num_classes = mask_cls.shape[-1] - 1
    probs = np.exp(mask_cls - mask_cls.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    scores = probs.max(-1)
    labels = probs.argmax(-1)
    sig = 1.0 / (1.0 + np.exp(-mask_pred))

    keep = (labels != num_classes) & (scores > object_mask_threshold)
    cur_scores, cur_classes, cur_masks = scores[keep], labels[keep], sig[keep]
    H, W = mask_pred.shape[-2:]
    panoptic = np.zeros((H, W), np.int32)
    segments = []
    if cur_masks.shape[0] == 0:
        return panoptic, segments
    prob_masks = cur_scores[:, None, None] * cur_masks
    mask_ids = prob_masks.argmax(0)
    seg_id = 0
    stuff_memory: dict[int, int] = {}
    for k in range(cur_classes.shape[0]):
        cls = int(cur_classes[k])
        isthing = cls in thing_ids
        mask = (mask_ids == k) & (cur_masks[k] >= 0.5)
        mask_area = int(mask.sum())
        original_area = int((cur_masks[k] >= 0.5).sum())
        if mask_area > 0 and original_area > 0:
            if mask_area / original_area < overlap_threshold:
                continue
            if not isthing and cls in stuff_memory:
                panoptic[mask] = stuff_memory[cls]
                continue
            seg_id += 1
            if not isthing:
                stuff_memory[cls] = seg_id
            panoptic[mask] = seg_id
            segments.append({"id": seg_id, "isthing": isthing, "category_id": cls})
    return panoptic, segments


def panoptic_inference_device(mask_cls, mask_pred, object_mask_threshold=0.8,
                              valid_hw=None):
    """Device part of the stuff-merge panoptic assembly
    (xdecoder_model.py:774-829) — everything per-PIXEL stays on device, so
    only two [H, W] maps and Q-sized vectors leave the chip instead of the
    [Q, H, W] f32 logits (101 × 512² × 4 B ≈ 106 MB/image on the old
    host path).

    Outputs: ``mask_ids`` [H, W] winner query id (argmax over kept queries'
    score-weighted sigmoid masks), ``winner_ok`` [H, W] (winner's own
    sigmoid ≥ 0.5 — the host's ``cur_masks[k] >= 0.5`` term evaluated at
    the winner), per-query ``mask_area``/``original_area`` (counts the
    overlap filter needs, restricted to ``valid_hw`` so padded margins
    never vote), and ``scores``/``labels``/``keep``.
    ``panoptic_assemble_host`` turns these into the id map + segment list
    with a Q-scalar loop + one LUT application."""
    Q, H, W = mask_pred.shape
    C = mask_cls.shape[-1] - 1
    probs = jax.nn.softmax(mask_cls.astype(jnp.float32), axis=-1)
    scores = jnp.max(probs, axis=-1)
    labels = jnp.argmax(probs, axis=-1)
    keep = (labels != C) & (scores > object_mask_threshold)
    sig = jax.nn.sigmoid(mask_pred.astype(jnp.float32)).reshape(Q, H * W)
    prob_masks = jnp.where(keep[:, None], scores[:, None] * sig, -1.0)
    mask_ids = jnp.argmax(prob_masks, axis=0)                  # [H*W]
    winner_sig = jnp.take_along_axis(sig, mask_ids[None], 0)[0]
    if valid_hw is None:
        valid = jnp.ones((H * W,), bool)
    else:
        row = jnp.arange(H)[:, None]
        col = jnp.arange(W)[None, :]
        valid = ((row < valid_hw[0]) & (col < valid_hw[1])).reshape(H * W)
    winner_ok = (winner_sig >= 0.5) & valid
    mask_area = jax.ops.segment_sum(winner_ok.astype(jnp.int32), mask_ids,
                                    num_segments=Q)
    original_area = jnp.sum((sig >= 0.5) & valid[None], axis=1)
    return {"mask_ids": mask_ids.reshape(H, W).astype(jnp.int32),
            "winner_ok": winner_ok.reshape(H, W),
            "mask_area": mask_area.astype(jnp.int32),
            "original_area": original_area.astype(jnp.int32),
            "scores": scores, "labels": labels.astype(jnp.int32),
            "keep": keep}


def panoptic_assemble_host(dev: dict, thing_ids,
                           overlap_threshold=0.8):
    """Host tail of the device-fused panoptic inference: the sequential
    seg-id / stuff-merge / overlap-filter loop over Q scalars, then one
    vectorized LUT application.  Identical output contract to
    ``panoptic_inference_host`` (winner masks partition the pixels, so the
    host's progressive ``panoptic[mask] = seg_id`` writes are
    order-independent and a query→seg_id LUT reproduces them exactly)."""
    mask_ids = np.asarray(dev["mask_ids"], np.int64)
    winner_ok = np.asarray(dev["winner_ok"], bool)
    mask_area = np.asarray(dev["mask_area"])
    original_area = np.asarray(dev["original_area"])
    labels = np.asarray(dev["labels"])
    keep = np.asarray(dev["keep"], bool)
    Q = mask_area.shape[0]
    lut = np.zeros((Q,), np.int32)
    segments: list = []
    seg_id = 0
    stuff_memory: dict[int, int] = {}
    for k in np.nonzero(keep)[0]:
        cls = int(labels[k])
        isthing = cls in thing_ids
        ma, oa = int(mask_area[k]), int(original_area[k])
        if ma > 0 and oa > 0:
            if ma / oa < overlap_threshold:
                continue
            if not isthing and cls in stuff_memory:
                lut[k] = stuff_memory[cls]
                continue
            seg_id += 1
            if not isthing:
                stuff_memory[cls] = seg_id
            lut[k] = seg_id
            segments.append({"id": seg_id, "isthing": isthing,
                             "category_id": cls})
    panoptic = lut[mask_ids] * winner_ok
    return panoptic.astype(np.int32), segments


def instance_inference_device(mask_cls, mask_pred, num_classes: int,
                              topk: int, thing_mask=None, valid_hw=None):
    """Device-fused ``instance_inference`` emitting COMPACT outputs: the
    top-k binary masks leave the chip bit-packed into int32 planes
    ([ceil(K/32), H, W] — 32× less transfer than f32 masks; uint8 ops crash
    the axon compile helper, int32 shifts compile).  ``valid_hw`` restricts
    the mask-score statistics to the unpadded image region (the host path
    computed them on cropped masks)."""
    Q = mask_cls.shape[0]
    H, W = mask_pred.shape[-2:]
    scores = jax.nn.softmax(mask_cls, axis=-1)[:, :-1]        # [Q, C]
    flat = scores.reshape(-1)
    if thing_mask is not None:
        flat = flat * jnp.tile(thing_mask.astype(flat.dtype), (Q,))
    K = min(topk, flat.shape[0])
    top_scores, top_idx = jax.lax.top_k(flat, K)
    labels = top_idx % num_classes
    query_idx = top_idx // num_classes
    masks = mask_pred[query_idx]                              # [K, H, W]
    if valid_hw is None:
        valid = jnp.ones((H, W), bool)
    else:
        valid = ((jnp.arange(H)[:, None] < valid_hw[0])
                 & (jnp.arange(W)[None, :] < valid_hw[1]))
    binary = (masks > 0) & valid[None]
    binf = binary.astype(jnp.float32)
    mask_score = jnp.sum(jax.nn.sigmoid(masks.astype(jnp.float32)) * binf,
                         axis=(1, 2)) / (jnp.sum(binf, axis=(1, 2)) + 1e-6)
    n_planes = -(-K // 32)
    pad = n_planes * 32 - K
    bits = jnp.pad(binary, ((0, pad), (0, 0), (0, 0))).reshape(
        n_planes, 32, H, W).astype(jnp.int32)
    planes = jnp.sum(bits << jnp.arange(32, dtype=jnp.int32)[None, :, None, None],
                     axis=1)                                  # [n_planes, H, W]
    return {"mask_planes": planes, "scores": top_scores * mask_score,
            "classes": labels.astype(jnp.int32)}


def unpack_mask_planes(planes: np.ndarray, k: int) -> np.ndarray:
    """[ceil(K/32), H, W] int32 bit planes → [K, H, W] bool (host tail of
    ``instance_inference_device``)."""
    planes = np.asarray(planes)
    n, H, W = planes.shape
    out = np.zeros((k, H, W), bool)
    for i in range(k):
        out[i] = (planes[i // 32] >> (i % 32)) & 1
    return out


def evaluate_grounding(params, cfg: XDecoderModelConfig, images,
                       text_ids, text_mask, out_size=None):
    """Referring segmentation (xdecoder_model.py:595-662): per-text token
    embeddings condition the decoder's grounding slots; the output mask is the
    grounding query whose caption embedding best matches the text class embed.

    text_ids/mask: [B, T_texts, L] — one referring phrase per batch element
    (B aligned with images).  Returns mask logits [B, H, W].
    """
    B = images.shape[0]
    token_emb, class_emb = te.forward_language_token(
        params["text"], cfg.text, text_ids.reshape(-1, text_ids.shape[-1]),
        text_mask.reshape(-1, text_mask.shape[-1]), norm=False)
    token_emb = token_emb.reshape(B, -1, token_emb.shape[-1])

    # project language tokens into decoder space? reference feeds lang_proj'd
    # token embeds directly as grounding tokens (dim_lang == hidden_dim)
    grounding_tokens = token_emb

    mask_features, pyramid = backbone_and_pixel_decoder(params, cfg, images)
    out = xdecoder_forward(params["decoder"], cfg.decoder, pyramid, mask_features,
                           grounding_tokens=grounding_tokens,
                           grounding_token_mask=text_mask.reshape(B, -1),
                           task="grounding_eval", is_train=False)
    nq = cfg.decoder.num_queries
    # grounding-conditioned outputs live at slots [nq : 2nq-1]
    g_masks = out["pred_masks"][:, nq:]
    g_caption = out["pred_captions"][:, nq:]

    v = g_caption / (jnp.linalg.norm(g_caption, axis=-1, keepdims=True) + 1e-7)
    t = class_emb.reshape(B, -1, class_emb.shape[-1])
    t = t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-7)
    sim = jnp.einsum("bqd,btd->bqt", v, t)[..., 0]            # first text
    best = jnp.argmax(sim, axis=-1)
    picked = jnp.take_along_axis(g_masks, best[:, None, None, None], axis=1)[:, 0]
    if out_size is not None:
        # reference: bicubic + antialias (xdecoder_model.py:631-636)
        picked = jax.image.resize(picked, (B, *out_size), method="bicubic")
    return picked


def forward_vlp_train(params, cfg: XDecoderModelConfig, images,
                      caption_token_embs, caption_token_ids, caption_mask,
                      vocab_embs, caption_sentence_embs=None,
                      backbone_proj=None, axis_name=None):
    """VLP training forward (xdecoder_model.py:378-420): captioning token CE
    + caption-retrieval ITC (+ the res5 backbone-ensemble ITC when a
    ``backbone_proj`` is given).

    caption_token_embs: [B, contxt_len, D_hidden] decoder-space caption token
    embeddings; vocab_embs: [V, dim_proj] projected vocabulary embeddings for
    the token CE; caption_sentence_embs: [B, dim_proj] projected sentence
    (EOT) embeddings for the retrieval ITC.
    """
    from cullavo_tpu.models.xdecoder.criterion import loss_captionings
    from cullavo_tpu.models.xdecoder.language_loss import (
        fine_grained_itc_loss, image_text_contrastive_loss)

    feats = _backbone_apply(params["backbone"], cfg, images)
    mask_features, _, pyramid = _encoder_apply(params["fpn"], cfg, feats)
    out = xdecoder_forward(params["decoder"], cfg.decoder, pyramid, mask_features,
                           caption_tokens=caption_token_embs, task="vlp",
                           is_train=True)
    losses = {}
    logit_scale = params["text"]["logit_scale"]
    crit = cfg.criterion
    losses["loss_captioning_0"] = crit.weight_captioning * loss_captionings(
        out["pred_captionings"], caption_token_embs, caption_token_ids,
        caption_mask, vocab_embs, logit_scale)
    # retrieval ITC: class-token caption embedding vs text sentence embedding
    if caption_sentence_embs is not None:
        nq = cfg.decoder.num_queries
        img_emb = out["pred_captions"][:, nq - 1]
        losses["loss_retrieval_decoder_0"] = (
            crit.weight_retrieval_decoder * image_text_contrastive_loss(
                img_emb, caption_sentence_embs, logit_scale, axis_name))
        if backbone_proj is not None:
            v = jnp.mean(feats["res5"], axis=(1, 2)) @ backbone_proj
            losses["loss_retrieval_backbone_0"] = (
                crit.weight_retrieval_backbone * image_text_contrastive_loss(
                    v, caption_sentence_embs, logit_scale, axis_name))
    return losses


def evaluate_classification(params, cfg: XDecoderModelConfig, images,
                            text_class_embeds):
    """Zero-shot classification via the class-token similarity
    (xdecoder_model.py:579-593): logits [B, C]."""
    mask_features, pyramid = backbone_and_pixel_decoder(params, cfg, images)
    out = xdecoder_forward(params["decoder"], cfg.decoder, pyramid, mask_features,
                           text_class_embeds=text_class_embeds,
                           logit_scale=params["text"]["logit_scale"],
                           task="eval", is_train=False)
    # full class-token row INCLUDING the background column — the reference
    # feeds pred_logits[idx, -1] to its top-1/5 accuracy unmodified
    # (xdecoder_model.py:592, classification_evaluation.py:48)
    return out["pred_logits"][:, -1]


def evaluate_retrieval_embedding(params, cfg: XDecoderModelConfig, images,
                                 ensemble: bool = True):
    """Image embeddings for retrieval eval (xdecoder_model.py:507-550):
    ``(class_token_emb, backbone_emb_or_None)``, each normalized.  The
    second embedding is the reference's retrieval_emsemble branch (:519-523,
    ENSEMBLE: True in the headline configs): res5 globally average-pooled
    through ``backbone_proj``; the evaluator averages the two score
    matrices 0.5/0.5 (retrieval_evaluation.py:160-166)."""
    feats = _backbone_apply(params["backbone"], cfg, images)
    mask_features, _, pyramid = _encoder_apply(params["fpn"], cfg, feats)
    out = xdecoder_forward(params["decoder"], cfg.decoder, pyramid, mask_features,
                           task="eval", is_train=False)
    nq = cfg.decoder.num_queries
    emb = out["pred_captions"][:, nq - 1]
    emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-7)
    emb2 = None
    if ensemble and "backbone_proj" in params:
        v5 = jnp.mean(feats["res5"], axis=(1, 2)) @ params["backbone_proj"]
        emb2 = v5 / (jnp.linalg.norm(v5, axis=-1, keepdims=True) + 1e-7)
    return emb, emb2


def evaluate_dispatch(params, cfg: XDecoderModelConfig, images, mode: str = "default",
                      text_class_embeds=None, text_ids=None, text_mask=None,
                      out_size=None):
    """Eval-mode dispatch mirroring GeneralizedXdecoder.forward's eval arm
    (xdecoder_model.py:305-315): retrieval | captioning | classification |
    grounding_refcoco | default (dense seg)."""
    if mode == "retrieval":
        return evaluate_retrieval_embedding(params, cfg, images)
    if mode == "classification":
        return evaluate_classification(params, cfg, images, text_class_embeds)
    if mode == "grounding_refcoco":
        return evaluate_grounding(params, cfg, images, text_ids, text_mask, out_size)
    if mode == "captioning":
        raise NotImplementedError(
            "use cullavo_tpu.models.xdecoder.decoder.forward_captioning with a "
            "tokenizer-backed token_embedding_fn")
    return forward_eval(params, cfg, images, text_class_embeds, out_size)
