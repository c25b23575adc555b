"""Forward parity of the native X-Decoder stack vs the REFERENCE's own torch
modules, through the checkpoint importers.

This is the proof layer the structural round-trip tests cannot give: the
mounted reference modules (focal.py, davit.py, vit.py,
transformer_encoder_fpn.py, interface/xdecoder.py, LangEncoder/transformer.py,
modules/matcher.py) are exec-loaded with stub detectron2/timm shims
(tests/ref_torch_stubs.py), built at tiny-but-real configs matching the
active yaml flags, their state_dicts exported through
checkpoint/xdecoder_import.py, and the native forward must reproduce the
torch forward numerically.  A transpose or qkv-packing bug in any importer
fails these tests.

All models run f32, eval mode, drop_path_rate=0 (the stub DropPath asserts
this).  Tolerances are atol≈1e-4 on O(1) outputs.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent))

import ref_torch_stubs as R  # noqa: E402

torch = pytest.importorskip("torch")


def _seed_all():
    torch.manual_seed(0)
    np.random.seed(0)


# ---------------------------------------------------------------------------
# FocalNet
# ---------------------------------------------------------------------------

def test_focalnet_forward_matches_reference():
    """Pyramid parity vs modeling/vision/backbone/focal.py:340-595 at the
    active xdecoder_test.yaml flags (conv embed, post-LN, layerscale,
    scaling modulator)."""
    from cullavo_tpu.checkpoint.xdecoder_import import import_focalnet
    from cullavo_tpu.models.xdecoder.focalnet import (FocalNetConfig,
                                                      focalnet_forward)

    _seed_all()
    focal = R.load("vision.backbone.focal")
    ref = focal.FocalNet(
        pretrain_img_size=64, patch_size=4, embed_dim=16,
        depths=[1, 2, 2, 1], focal_levels=[2, 2, 3, 2],
        focal_windows=[3, 3, 3, 3], drop_path_rate=0.0,
        use_conv_embed=True, use_postln=True,
        use_postln_in_modulation=False, scaling_modulator=True,
        use_layerscale=True)
    ref.eval()  # NB: the reference's train() override returns None

    cfg = FocalNetConfig(embed_dim=16, depths=(1, 2, 2, 1),
                         focal_levels=(2, 2, 3, 2), focal_windows=(3, 3, 3, 3),
                         use_conv_embed=True, use_postln=True,
                         use_postln_in_modulation=False,
                         scaling_modulator=True, use_layerscale=True)
    params = import_focalnet(R.state_dict_numpy(ref, "backbone."), cfg)

    x = np.random.default_rng(1).normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(x))
    outs = focalnet_forward(jax.tree.map(jnp.asarray, params), cfg,
                            jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert set(outs) == set(ref_outs) == {"res2", "res3", "res4", "res5"}
    for k in sorted(outs):
        got = np.asarray(outs[k]).transpose(0, 3, 1, 2)
        want = ref_outs[k].numpy()
        assert got.shape == want.shape, (k, got.shape, want.shape)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4,
                                   err_msg=k)


# ---------------------------------------------------------------------------
# DaViT
# ---------------------------------------------------------------------------

def test_davit_forward_matches_reference():
    """Pyramid parity vs modeling/vision/backbone/davit.py:320-615 (dual
    spatial-window / channel-group attention, conv-at-attn/ffn, prenorm
    patch embeds as the davitd3/d5 yaml configs set them)."""
    from cullavo_tpu.checkpoint.xdecoder_import import import_davit
    from cullavo_tpu.models.xdecoder.davit import DaViTConfig, davit_forward

    _seed_all()
    davit = R.load("vision.backbone.davit")
    ref = davit.DaViT(
        num_classes=0, depths=(1, 1, 2, 1), embed_dims=(16, 32, 64, 128),
        num_heads=(2, 4, 8, 16), num_groups=(2, 4, 8, 16),
        patch_size=(7, 2, 2, 2), patch_stride=(4, 2, 2, 2),
        patch_padding=(3, 0, 0, 0), patch_prenorm=(False, True, True, True),
        drop_path_rate=0.0, window_size=4, conv_at_attn=True,
        conv_at_ffn=True, out_indices=[0, 1, 2, 3])
    ref.eval()

    cfg = DaViTConfig(embed_dims=(16, 32, 64, 128), num_heads=(2, 4, 8, 16),
                      num_groups=(2, 4, 8, 16), depths=(1, 1, 2, 1),
                      window_size=4, patch_kernel=(7, 2, 2, 2),
                      patch_stride=(4, 2, 2, 2), patch_pad=(3, 0, 0, 0),
                      patch_prenorm=(False, True, True, True))
    params = import_davit(R.state_dict_numpy(ref, "backbone."), cfg)

    x = np.random.default_rng(2).normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(x))
    outs = davit_forward(jax.tree.map(jnp.asarray, params), cfg,
                         jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert set(outs) == set(ref_outs) == {"res2", "res3", "res4", "res5"}
    for k in sorted(outs):
        got = np.asarray(outs[k]).transpose(0, 3, 1, 2)
        want = ref_outs[k].numpy()
        assert got.shape == want.shape, (k, got.shape, want.shape)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4,
                                   err_msg=k)


# ---------------------------------------------------------------------------
# SAM-ViT
# ---------------------------------------------------------------------------

def test_sam_vit_forward_matches_reference():
    """Pyramid parity vs modeling/vision/backbone/vit.py:26-581 (windowed +
    global attention with decomposed rel-pos, SimpleFPN neck) — the samvitb/
    samvitl configs' backbone."""
    from functools import partial

    from cullavo_tpu.checkpoint.xdecoder_import import import_sam_vit
    from cullavo_tpu.models.xdecoder.sam_vit import (SamVitConfig,
                                                     sam_vit_forward)

    _seed_all()
    vit = R.load("vision.backbone.vit")
    ref = vit.ImageEncoderViT(
        img_size=64, patch_size=16, embed_dim=32, depth=4, num_heads=4,
        mlp_ratio=4.0, norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
        qkv_bias=True, use_rel_pos=True, global_attn_indexes=(1, 3),
        window_size=2, out_chans=16)
    ref.neck = vit.SimpleFPN(in_dim=32, out_dims=[8, 16, 32, 64])
    # rel-pos params are zero-init in the reference; randomize so the
    # decomposed rel-pos path is actually exercised
    with torch.no_grad():
        for blk in ref.blocks:
            blk.attn.rel_pos_h.normal_(std=0.5)
            blk.attn.rel_pos_w.normal_(std=0.5)
        ref.pos_embed.normal_(std=0.5)
    ref.eval()

    cfg = SamVitConfig(img_size=64, patch_size=16, embed_dim=32, depth=4,
                       num_heads=4, window_size=2, global_attn_indexes=(1, 3),
                       use_rel_pos=True, out_dims=(8, 16, 32, 64))
    params = import_sam_vit(R.state_dict_numpy(ref, "backbone."), cfg)

    x = np.random.default_rng(3).normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(x))
    outs = sam_vit_forward(jax.tree.map(jnp.asarray, params), cfg,
                           jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert set(outs) == set(ref_outs) == {"res2", "res3", "res4", "res5"}
    for k in sorted(outs):
        got = np.asarray(outs[k]).transpose(0, 3, 1, 2)
        want = ref_outs[k].numpy()
        assert got.shape == want.shape, (k, got.shape, want.shape)
        np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-4,
                                   err_msg=k)


# ---------------------------------------------------------------------------
# FPN pixel decoder
# ---------------------------------------------------------------------------

def test_fpn_pixel_decoder_matches_reference():
    """forward_features parity vs transformer_encoder_fpn.py:123-143,276-309
    (lateral+output convs top-down with GN+relu, 6-layer-style transformer
    encoder on res5, sine position embedding, mask_features conv)."""
    from cullavo_tpu.checkpoint.xdecoder_import import import_fpn
    from cullavo_tpu.models.xdecoder.fpn import FPNConfig, fpn_forward

    _seed_all()
    fpn_mod = R.load("vision.encoder.transformer_encoder_fpn")
    d2mod = sys.modules["detectron2.modeling"]
    shapes = {"res2": d2mod.ShapeSpec(channels=16, stride=4),
              "res3": d2mod.ShapeSpec(channels=32, stride=8),
              "res4": d2mod.ShapeSpec(channels=64, stride=16),
              "res5": d2mod.ShapeSpec(channels=128, stride=32)}
    # input_shape must go by KEYWORD: a positional dict triggers the
    # @configurable cfg path (modeling/utils/config.py:94-108)
    ref = fpn_mod.TransformerEncoderPixelDecoder(
        input_shape=shapes, transformer_dropout=0.0, transformer_nheads=4,
        transformer_dim_feedforward=128, transformer_enc_layers=2,
        transformer_pre_norm=False, conv_dim=64, mask_dim=32, mask_on=True,
        norm="GN")
    ref.eval()

    cfg = FPNConfig(in_channels=(16, 32, 64, 128), conv_dim=64, mask_dim=32,
                    gn_groups=32, enc_layers=2, enc_heads=4, enc_ffn=128)
    params = import_fpn(R.state_dict_numpy(ref, "pd."), cfg, prefix="pd.")

    rng = np.random.default_rng(4)
    feats_t = {k: torch.from_numpy(
        rng.normal(size=(2, shapes[k].channels, 64 // shapes[k].stride,
                         64 // shapes[k].stride)).astype(np.float32))
        for k in shapes}
    with torch.no_grad():
        mask_t, trans_t, multi_t = ref.forward_features(feats_t)

    feats_j = {k: jnp.asarray(v.numpy().transpose(0, 2, 3, 1))
               for k, v in feats_t.items()}
    mask_j, trans_j, multi_j = fpn_forward(jax.tree.map(jnp.asarray, params),
                                           cfg, feats_j)

    np.testing.assert_allclose(np.asarray(trans_j).transpose(0, 3, 1, 2),
                               trans_t.numpy(), atol=3e-4, rtol=1e-4,
                               err_msg="transformer features")
    assert len(multi_j) == len(multi_t) == 3
    for i, (mj, mt) in enumerate(zip(multi_j, multi_t)):
        np.testing.assert_allclose(np.asarray(mj).transpose(0, 3, 1, 2),
                                   mt.numpy(), atol=3e-4, rtol=1e-4,
                                   err_msg=f"multi_scale[{i}]")
    np.testing.assert_allclose(np.asarray(mask_j).transpose(0, 3, 1, 2),
                               mask_t.numpy(), atol=3e-4, rtol=1e-4,
                               err_msg="mask_features")


# ---------------------------------------------------------------------------
# CLIP-style text encoder (the reference's own 512-wide transformer)
# ---------------------------------------------------------------------------

def test_text_encoder_matches_reference():
    """forward_language / forward_language_token / compute_similarity parity
    vs LangEncoder/transformer.py + vlpencoder.py:130-186 (QuickGELU blocks,
    causal mask in autoregressive mode, EOT pooling at argmax id,
    lang_proj + logit-scaled cosine similarity)."""
    from cullavo_tpu.checkpoint.xdecoder_import import import_text_encoder
    from cullavo_tpu.models.xdecoder import text_encoder as te
    from cullavo_tpu.models.xdecoder.text_encoder import TextEncoderConfig

    _seed_all()
    tr = R.load("language.LangEncoder.transformer")
    vlp = R.load("language.vlpencoder")
    lang = tr.Transformer(context_length=8, vocab_size=64, width=32,
                          layers=2, heads=4, autogressive=True)
    proj = torch.nn.Parameter(torch.randn(32, 48) * 0.1)
    le = vlp.LanguageEncoder(tokenizer=None, tokenizer_type="clip",
                             lang_encoder=lang, lang_projection=proj,
                             max_token_num=8, queue_operator={})
    le.eval()

    cfg = TextEncoderConfig(vocab_size=64, width=32, heads=4, layers=2,
                            context_length=8, dim_lang=48, autoregressive=True)
    params = jax.tree.map(jnp.asarray, import_text_encoder(
        R.state_dict_numpy(le, "le."), cfg, prefix="le."))

    rng = np.random.default_rng(5)
    ids = rng.integers(1, 63, size=(3, 8)).astype(np.int64)
    ids[0, 5:] = 0   # right padding
    ids[0, 4] = 63   # EOT = max id, argmax pooling position
    ids[1, 7] = 63
    ids[2, 6] = 63
    mask = (ids != 0).astype(np.int64)

    with torch.no_grad():
        sent_t = le.forward_language((torch.from_numpy(ids),
                                      torch.from_numpy(mask)), norm=True)
        tok_t, cls_t = le.forward_language_token((torch.from_numpy(ids),
                                                  torch.from_numpy(mask)),
                                                 norm=False)

    sent_j = te.forward_language(params, cfg, jnp.asarray(ids),
                                 jnp.asarray(mask), norm=True)
    tok_j, cls_j = te.forward_language_token(params, cfg, jnp.asarray(ids),
                                             jnp.asarray(mask), norm=False)

    np.testing.assert_allclose(np.asarray(sent_j), sent_t.numpy(), atol=2e-5,
                               rtol=1e-4, err_msg="forward_language")
    np.testing.assert_allclose(np.asarray(cls_j), cls_t.numpy(), atol=2e-5,
                               rtol=1e-4, err_msg="class emb")
    np.testing.assert_allclose(np.asarray(tok_j), tok_t.numpy(), atol=2e-5,
                               rtol=1e-4, err_msg="token emb")

    # compute_similarity: cached class table + logit-scaled cosine
    t_emb = torch.randn(5, 48)
    le.default_text_embeddings = t_emb
    v = torch.randn(2, 4, 48)
    with torch.no_grad():
        sim_t = le.compute_similarity(v)
    sim_j = te.compute_similarity(params, jnp.asarray(v.numpy()),
                                  jnp.asarray(t_emb.numpy()))
    np.testing.assert_allclose(np.asarray(sim_j), sim_t.numpy(), atol=2e-4,
                               rtol=1e-4, err_msg="compute_similarity")


# ---------------------------------------------------------------------------
# XDecoder decoder (interface/xdecoder.py)
# ---------------------------------------------------------------------------

def _build_decoder_pair():
    """(reference XDecoder w/ LanguageEncoder, repo params dict, cfg, table)."""
    from cullavo_tpu.checkpoint.xdecoder_import import (
        import_text_encoder, import_xdecoder_predictor)
    from cullavo_tpu.models.xdecoder.decoder import XDecoderConfig

    _seed_all()
    tr = R.load("language.LangEncoder.transformer")
    vlp = R.load("language.vlpencoder")
    xd = R.load("interface.xdecoder")

    lang = tr.Transformer(context_length=8, vocab_size=64, width=32,
                          layers=2, heads=4, autogressive=True)
    proj = torch.nn.Parameter(torch.randn(32, 64) * 0.1)
    le = vlp.LanguageEncoder(tokenizer=None, tokenizer_type="clip",
                             lang_encoder=lang, lang_projection=proj,
                             max_token_num=8, queue_operator={})
    table = torch.randn(7, 64)
    table = table / table.norm(dim=-1, keepdim=True)
    le.default_text_embeddings = table

    task_switch = {"mask": True, "bbox": True, "caption": True,
                   "captioning": True, "retrieval": True, "grounding": True}
    ref = xd.XDecoder(
        le, in_channels=64, mask_classification=True, hidden_dim=64,
        dim_proj=64, num_queries=9, contxt_len=8, nheads=4,
        dim_feedforward=128, dec_layers=3, pre_norm=False, mask_dim=32,
        task_switch=task_switch, captioning_step=50,
        enforce_input_project=False)
    ref.eval()

    cfg = XDecoderConfig(hidden_dim=64, num_queries=9, nheads=4,
                         dim_feedforward=128, dec_layers=3, mask_dim=32,
                         dim_proj=64, contxt_len=8, in_channels=64)
    params = import_xdecoder_predictor(R.state_dict_numpy(ref, "p."), cfg,
                                       prefix="p.")
    tp = import_text_encoder(R.state_dict_numpy(le, "le."), None_or(2),
                             prefix="le.")
    return ref, jax.tree.map(jnp.asarray, params), cfg, table, tp


def None_or(layers):
    from cullavo_tpu.models.xdecoder.text_encoder import TextEncoderConfig
    return TextEncoderConfig(vocab_size=64, width=32, heads=4, layers=layers,
                             context_length=8, dim_lang=64)


def _decoder_inputs(B=2):
    rng = np.random.default_rng(6)
    feats = [rng.normal(size=(B, 64, s, s)).astype(np.float32)
             for s in (2, 4, 8)]
    maskf = rng.normal(size=(B, 32, 16, 16)).astype(np.float32) * 0.5
    return feats, maskf


def _cmp(out_j, out_t, keys, atol=3e-4):
    for k in keys:
        got = np.asarray(out_j[k])
        want = out_t[k].detach().numpy()
        assert got.shape == want.shape, (k, got.shape, want.shape)
        np.testing.assert_allclose(got, want, atol=atol, rtol=1e-3, err_msg=k)


def test_xdecoder_decoder_eval_matches_reference():
    """Seg-eval forward parity (9 queries incl. class token, 3 pyramid
    levels round-robin, structured self-attn mask, bicubic attn-mask
    thresholding, similarity class head) vs interface/xdecoder.py:193-323."""
    from cullavo_tpu.models.xdecoder.decoder import xdecoder_forward

    ref, params, cfg, table, _ = _build_decoder_pair()
    feats, maskf = _decoder_inputs()
    with torch.no_grad():
        out_t = ref([torch.from_numpy(f) for f in feats],
                    torch.from_numpy(maskf), task="seg", is_train=False)
    out_j = xdecoder_forward(
        params, cfg, [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats],
        jnp.asarray(maskf.transpose(0, 2, 3, 1)),
        text_class_embeds=jnp.asarray(table.numpy()),
        logit_scale=jnp.asarray(float(ref.lang_encoder.logit_scale)),
        task="eval", is_train=False)
    _cmp(out_j, out_t, ["pred_logits", "pred_masks", "pred_boxes",
                        "pred_captions"])
    assert len(out_j["aux_outputs"]) == len(out_t["aux_outputs"]) == 3
    for aj, at in zip(out_j["aux_outputs"], out_t["aux_outputs"]):
        _cmp(aj, at, ["pred_logits", "pred_masks", "pred_boxes",
                      "pred_captions"])


def test_xdecoder_decoder_seg_train_grounding_matches_reference():
    """Training seg forward WITH grounding tokens: duplicated query slots,
    grounding-token self-attention threading, per-layer slot slicing
    (xdecoder.py:235-245,276-294)."""
    from cullavo_tpu.models.xdecoder.decoder import xdecoder_forward

    ref, params, cfg, table, _ = _build_decoder_pair()
    feats, maskf = _decoder_inputs()
    G = 3
    g = np.random.default_rng(8).normal(size=(2, G, 64)).astype(np.float32)
    with torch.no_grad():
        out_t = ref([torch.from_numpy(f) for f in feats],
                    torch.from_numpy(maskf), task="seg", is_train=True,
                    extra={"grounding_tokens":
                           torch.from_numpy(g.transpose(1, 0, 2))})
    out_j = xdecoder_forward(
        params, cfg, [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats],
        jnp.asarray(maskf.transpose(0, 2, 3, 1)),
        text_class_embeds=jnp.asarray(table.numpy()),
        logit_scale=jnp.asarray(float(ref.lang_encoder.logit_scale)),
        grounding_tokens=jnp.asarray(g), task="seg", is_train=True)
    _cmp(out_j, out_t, ["pred_logits", "pred_masks", "pred_boxes",
                        "pred_captions"])
    for aj, at in zip(out_j["aux_outputs"], out_t["aux_outputs"]):
        _cmp(aj, at, ["pred_logits", "pred_masks", "pred_boxes",
                      "pred_captions"])


def test_xdecoder_decoder_vlp_matches_reference():
    """VLP (captioning) forward: caption slots appended causally, caption
    tokens attend full memory, caping_embed head (xdecoder.py:227-233,
    266-267, 303-309)."""
    from cullavo_tpu.models.xdecoder.decoder import xdecoder_forward

    ref, params, cfg, table, _ = _build_decoder_pair()
    feats, maskf = _decoder_inputs()
    cap = np.random.default_rng(9).normal(size=(2, 8, 64)).astype(np.float32)
    target_vlp = [{"caption_tokens": torch.from_numpy(cap[i:i + 1])}
                  for i in range(2)]
    with torch.no_grad():
        out_t = ref([torch.from_numpy(f) for f in feats],
                    torch.from_numpy(maskf), task="vlp", is_train=True,
                    target_vlp=target_vlp)
    out_j = xdecoder_forward(
        params, cfg, [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats],
        jnp.asarray(maskf.transpose(0, 2, 3, 1)),
        caption_tokens=jnp.asarray(cap), task="vlp", is_train=True)
    _cmp(out_j, out_t, ["pred_captionings", "pred_captions"])
    for aj, at in zip(out_j["aux_outputs"], out_t["aux_outputs"]):
        _cmp(aj, at, ["pred_captionings", "pred_captions"])


# ---------------------------------------------------------------------------
# Matcher costs + point sampling
# ---------------------------------------------------------------------------

def test_point_sample_matches_torch_grid_sample():
    """point_sample_batch == the reference's point_sample (grid_sample,
    align_corners=False, coords in [0,1] mapped to [-1,1])
    (modules/point_features.py:21-40)."""
    from cullavo_tpu.ops.point_sample import point_sample_batch

    R.install_stubs()
    pf = R.load("modules.point_features")
    rng = np.random.default_rng(11)
    x = rng.normal(size=(3, 5, 9, 13)).astype(np.float32)
    pts = rng.random(size=(3, 40, 2)).astype(np.float32)
    with torch.no_grad():
        want = pf.point_sample(torch.from_numpy(x), torch.from_numpy(pts),
                               align_corners=False).numpy()
    got = np.asarray(point_sample_batch(jnp.asarray(x), jnp.asarray(pts)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_match_costs_match_reference_matcher():
    """Cost-matrix parity vs HungarianMatcher.memory_efficient_forward
    (modules/matcher.py:106-168): softmax class cost + point-sampled
    sigmoid-CE and dice costs on SHARED points, fractional (non-binarized)
    gt labels — and the resulting assignments agree."""
    from scipy.optimize import linear_sum_assignment

    from cullavo_tpu.models.xdecoder.matcher import (compute_match_costs,
                                                     hungarian_match)

    matcher_mod = R.load("modules.matcher")
    _seed_all()
    B, Q, C1, N, H, W = 2, 7, 6, 4, 16, 16
    rng = np.random.default_rng(12)
    logits = rng.normal(size=(B, Q, C1)).astype(np.float32)
    masks = rng.normal(size=(B, Q, H, W)).astype(np.float32)
    tgt_cls = rng.integers(0, C1 - 1, size=(B, N)).astype(np.int64)
    tgt_masks = (rng.random((B, N, H, W)) > 0.6).astype(np.float32)
    P = 64
    coords = rng.random(size=(1, P, 2)).astype(np.float32)

    ref = matcher_mod.HungarianMatcher(cost_class=2.0, cost_mask=5.0,
                                       cost_dice=5.0, num_points=P)
    outputs = {"pred_logits": torch.from_numpy(logits),
               "pred_masks": torch.from_numpy(masks)}
    targets = [{"labels": torch.from_numpy(tgt_cls[b]),
                "masks": torch.from_numpy(tgt_masks[b])} for b in range(B)]
    # pin the shared sample points the reference draws with torch.rand
    real_rand = torch.rand

    def fake_rand(*shape, **kw):
        if tuple(shape) == (1, P, 2):
            return torch.from_numpy(coords.copy())
        return real_rand(*shape, **kw)

    # matcher.py:165 calls torch.from_numpy(i, dtype=...) which modern torch
    # rejects — shim it to as_tensor for the duration of the call
    real_from_numpy = torch.from_numpy

    def fake_from_numpy(a, dtype=None):
        t = real_from_numpy(np.asarray(a))
        return t.to(dtype) if dtype is not None else t

    torch.rand = fake_rand
    torch.from_numpy = fake_from_numpy
    try:
        with torch.no_grad():
            indices = ref.memory_efficient_forward(outputs, targets)
    finally:
        torch.rand = real_rand
        torch.from_numpy = real_from_numpy

    cost = compute_match_costs(
        jnp.asarray(logits), jnp.asarray(masks), jnp.asarray(tgt_cls),
        jnp.asarray(tgt_masks), jnp.ones((B, N), bool), jax.random.PRNGKey(0),
        num_points=P, cost_class=2.0, cost_mask=5.0, cost_dice=5.0,
        coords=jnp.broadcast_to(jnp.asarray(coords), (B, P, 2)))
    # same optimal assignment cost from both cost matrices
    for b in range(B):
        r_ref, c_ref = indices[b]
        cost_b = np.asarray(cost[b])
        r_j, c_j = linear_sum_assignment(cost_b)
        np.testing.assert_allclose(cost_b[r_j, c_j].sum(),
                                   cost_b[np.asarray(r_ref),
                                          np.asarray(c_ref)].sum(),
                                   rtol=1e-5)
    src, valid = hungarian_match(cost, jnp.full((B,), N, jnp.int32))
    src = np.asarray(src)
    for b in range(B):
        r_ref, c_ref = np.asarray(indices[b][0]), np.asarray(indices[b][1])
        order = np.argsort(c_ref)
        np.testing.assert_array_equal(src[b], r_ref[order])


def test_fine_grained_itc_matches_reference_math():
    """fine_grained_itc_loss == the fine-grained term of the reference's
    loss_itc (criterion.py:165-196) replicated in torch with its boolean
    ``keep`` gather (the static-shape -inf/zero-weight form must agree)."""
    from cullavo_tpu.models.xdecoder.language_loss import fine_grained_itc_loss

    rng = np.random.default_rng(13)
    B, Q, T, D = 3, 5, 6, 16
    vtk = rng.normal(size=(B, Q, D)).astype(np.float32)
    ttk = rng.normal(size=(B, T, D)).astype(np.float32)
    mask = np.ones((B, T), np.float32)
    mask[0, 4:] = 0
    mask[2, 2:] = 0
    logit_scale = np.float32(1.3)

    vt = torch.from_numpy(vtk)
    tt = torch.from_numpy(ttk)
    mk = torch.from_numpy(mask)
    ttk_mask = mk * torch.cumsum(mk, dim=1)
    vtk_n = vt / (vt.norm(dim=-1, keepdim=True) + 1e-7)
    ttk_n = tt / (tt.norm(dim=-1, keepdim=True) + 1e-7)
    keep = mk.reshape(-1).bool()
    scale = torch.exp(torch.tensor(logit_scale)).clamp(max=100)
    gt = (torch.eye(B)[:, :, None] * ttk_mask[None]).reshape(B, -1)[:, keep]
    gt = gt / (gt.sum(1, keepdim=True) + 1e-7)

    def soft_ce(x, target):
        return torch.sum(-target * torch.log_softmax(x, dim=-1), dim=-1).mean()

    logits = scale * (vtk_n @ ttk_n.reshape(-1, D)[keep].T).mean(1)
    loss_vt = soft_ce(logits, gt)
    logits_tv = scale * (ttk_n.reshape(-1, D) @ vtk_n.reshape(-1, D).T)
    logits_tv = logits_tv.reshape(B * T, B, Q).mean(dim=-1)[keep]
    loss_tv = soft_ce(logits_tv, gt.t())
    want = float(loss_vt * 0.7 + loss_tv * 0.3)

    got = float(fine_grained_itc_loss(jnp.asarray(vtk), jnp.asarray(ttk),
                                      jnp.asarray(mask),
                                      jnp.asarray(logit_scale)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


# ---------------------------------------------------------------------------
# Deformable pixel decoder
# ---------------------------------------------------------------------------

def test_deform_pixel_decoder_matches_reference():
    """MSDeformAttnPixelDecoder forward_features parity
    (transformer_encoder_deform.py:200-353: 6-layer MSDeformAttn encoder on
    res3-5 + FPN fusion for res2) — the samvitb/davit _deform configs' pixel
    decoder.  The reference's CUDA ext is stubbed to raise, so its own
    pure-torch grid_sample fallback runs (ms_deform_attn.py:116-121),
    which is exactly the functional spec of the Pallas/XLA kernel."""
    from cullavo_tpu.checkpoint.xdecoder_import import import_deform_encoder
    from cullavo_tpu.models.xdecoder.deform_encoder import (
        DeformEncoderConfig, deform_encoder_forward)

    _seed_all()
    dmod = R.load("vision.encoder.transformer_encoder_deform")
    d2mod = sys.modules["detectron2.modeling"]
    shapes = {"res2": d2mod.ShapeSpec(channels=16, stride=4),
              "res3": d2mod.ShapeSpec(channels=32, stride=8),
              "res4": d2mod.ShapeSpec(channels=64, stride=16),
              "res5": d2mod.ShapeSpec(channels=128, stride=32)}
    ref = dmod.MSDeformAttnPixelDecoder(
        input_shape=shapes, transformer_dropout=0.0, transformer_nheads=4,
        transformer_dim_feedforward=128, transformer_enc_layers=2,
        conv_dim=64, mask_dim=32, norm="GN",
        transformer_in_features=["res3", "res4", "res5"], common_stride=4)
    ref.eval()

    cfg = DeformEncoderConfig(in_channels=(16, 32, 64, 128), conv_dim=64,
                              mask_dim=32, num_layers=2, num_heads=4,
                              num_points=4, ffn_dim=128, gn_groups=32)
    params = import_deform_encoder(R.state_dict_numpy(ref, "pd."), cfg,
                                   prefix="pd.")

    rng = np.random.default_rng(15)
    feats_t = {k: torch.from_numpy(
        rng.normal(size=(2, shapes[k].channels, 64 // shapes[k].stride,
                         64 // shapes[k].stride)).astype(np.float32))
        for k in shapes}
    # transformer_encoder_deform.py:83 calls torch.from_numpy(x, dtype=...)
    # which modern torch rejects (the fork broke mask2former's as_tensor) —
    # shim it so the reference forward can run at all
    real_from_numpy = torch.from_numpy

    def fake_from_numpy(a, dtype=None, device=None):
        t = torch.as_tensor(np.asarray(a))
        return t.to(dtype) if dtype is not None else t

    torch.from_numpy = fake_from_numpy
    try:
        with torch.no_grad():
            mask_t, _, multi_t = ref.forward_features(feats_t)
    finally:
        torch.from_numpy = real_from_numpy

    feats_j = {k: jnp.asarray(v.numpy().transpose(0, 2, 3, 1))
               for k, v in feats_t.items()}
    mask_j, _, multi_j = deform_encoder_forward(
        jax.tree.map(jnp.asarray, params), cfg, feats_j)

    assert len(multi_j) == len(multi_t) == 3
    for i, (mj, mt) in enumerate(zip(multi_j, multi_t)):
        got = np.asarray(mj).transpose(0, 3, 1, 2)
        assert got.shape == tuple(mt.shape), (i, got.shape, mt.shape)
        np.testing.assert_allclose(got, mt.numpy(), atol=5e-4, rtol=1e-3,
                                   err_msg=f"multi_scale[{i}]")
    np.testing.assert_allclose(np.asarray(mask_j).transpose(0, 3, 1, 2),
                               mask_t.numpy(), atol=5e-4, rtol=1e-3,
                               err_msg="mask_features")


def test_focalnet_dw_forward_matches_reference():
    """FocalNet-DW parity vs modeling/vision/backbone/focal_dw.py — the
    ACTIVE xdecoder_focalt_lang.yaml backbone (NAME: focal_dw): residual
    depthwise convs around the modulation and the SUM-post-LN ordering that
    differs from focal.py's branch norm."""
    from cullavo_tpu.checkpoint.xdecoder_import import import_focalnet
    from cullavo_tpu.models.xdecoder.focalnet import (FocalNetConfig,
                                                      focalnet_forward)

    _seed_all()
    fdw = R.load("vision.backbone.focal_dw")
    ref = fdw.FocalNet(
        pretrain_img_size=64, patch_size=4, embed_dim=16,
        depths=[1, 2, 2, 1], focal_levels=[2, 2, 3, 2],
        focal_windows=[3, 3, 3, 3], drop_path_rate=0.0,
        use_conv_embed=True, use_postln=True,
        use_postln_in_modulation=False, scaling_modulator=True,
        use_layerscale=True)
    ref.eval()

    cfg = FocalNetConfig(embed_dim=16, depths=(1, 2, 2, 1),
                         focal_levels=(2, 2, 3, 2), focal_windows=(3, 3, 3, 3),
                         use_conv_embed=True, use_postln=True,
                         use_postln_in_modulation=False,
                         scaling_modulator=True, use_layerscale=True,
                         use_dw=True)
    params = import_focalnet(R.state_dict_numpy(ref, "backbone."), cfg)

    x = np.random.default_rng(21).normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(x))
    outs = focalnet_forward(jax.tree.map(jnp.asarray, params), cfg,
                            jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert set(outs) == set(ref_outs) == {"res2", "res3", "res4", "res5"}
    for k in sorted(outs):
        got = np.asarray(outs[k]).transpose(0, 3, 1, 2)
        want = ref_outs[k].numpy()
        assert got.shape == want.shape, (k, got.shape, want.shape)
        np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3,
                                   err_msg=k)


def test_criterion_losses_match_reference():
    """SetCriterion loss parity (criterion.py loss_labels / loss_masks /
    loss_boxes): same matched indices, same pinned sample points — the
    training objective's seg core, not just its cost matrices."""
    crit_mod = R.load("modules.criterion")
    _seed_all()
    B, Q, C1, N, H, W, P = 2, 7, 6, 4, 16, 16, 32
    rng = np.random.default_rng(17)
    logits = rng.normal(size=(B, Q, C1)).astype(np.float32)
    masks = rng.normal(size=(B, Q, H, W)).astype(np.float32)
    boxes = rng.normal(size=(B, Q, 4)).astype(np.float32)
    n_per = [4, 2]
    tgt_cls = rng.integers(0, C1 - 1, size=(B, N)).astype(np.int64)
    tgt_masks = (rng.random((B, N, H, W)) > 0.6).astype(np.float32)
    tgt_boxes = (rng.random((B, N, 4)) * 0.4 + 0.1).astype(np.float32)
    valid = np.zeros((B, N), bool)
    for b, n in enumerate(n_per):
        valid[b, :n] = True
    # deterministic src assignment in TARGET order
    src_idx = np.stack([rng.permutation(Q)[:N] for _ in range(B)])
    coords = rng.random((B, N, P, 2)).astype(np.float32)
    num_masks = float(sum(n_per))

    from cullavo_tpu.models.xdecoder.criterion import (CriterionConfig,
                                                       loss_boxes,
                                                       loss_labels,
                                                       loss_masks)

    cfg = CriterionConfig(num_classes=C1 - 1, eos_coef=0.1, num_points=P)
    ce_j = float(loss_labels(jnp.asarray(logits), jnp.asarray(tgt_cls),
                             jnp.asarray(src_idx), jnp.asarray(valid), cfg))
    bce_j, dice_j = loss_masks(
        jnp.asarray(masks), jnp.asarray(tgt_masks), jnp.asarray(src_idx),
        jnp.asarray(valid), num_masks, jax.random.PRNGKey(0), cfg,
        coords=jnp.asarray(coords.reshape(B * N, P, 2)))
    # repo sigmoids inside set_criterion before loss_boxes; reference
    # sigmoids inside loss_boxes — feed the sigmoided preds here
    l1_j, giou_j = loss_boxes(
        jax.nn.sigmoid(jnp.asarray(boxes)), jnp.asarray(tgt_boxes),
        jnp.asarray(src_idx), jnp.asarray(valid), num_masks)

    ref = crit_mod.SetCriterion(
        num_classes=C1 - 1, matcher=None, weight_dict={}, eos_coef=0.1,
        top_x_layers={"mask": 10, "box": 10, "caption": 10,
                      "captioning": 10, "retrieval": 10, "grounding": 10},
        losses=[], num_points=P, oversample_ratio=3.0,
        importance_sample_ratio=0.75, grounding_weight=None)
    outputs = {"pred_logits": torch.from_numpy(logits),
               "pred_masks": torch.from_numpy(masks),
               "pred_boxes": torch.from_numpy(boxes)}
    targets = [{"labels": torch.from_numpy(tgt_cls[b, :n]),
                "masks": torch.from_numpy(tgt_masks[b, :n]),
                "boxes": torch.from_numpy(tgt_boxes[b, :n])}
               for b, n in enumerate(n_per)]
    indices = [(torch.from_numpy(src_idx[b, :n]).long(),
                torch.arange(n)) for b, n in enumerate(n_per)]

    with torch.no_grad():
        ce_t = float(ref.loss_labels(outputs, targets, indices, num_masks,
                                     0, {})["loss_mask_ce_0"])
        # pin the reference's uncertainty sampling to the SAME per-mask
        # coords the repo side used (valid rows only, batch-concatenated)
        flat = np.concatenate([coords[b, :n] for b, n in enumerate(n_per)])
        real = crit_mod.get_uncertain_point_coords_with_randomness
        crit_mod.get_uncertain_point_coords_with_randomness = \
            lambda *a, **k: torch.from_numpy(flat)
        try:
            m = ref.loss_masks(outputs, targets, indices, num_masks, 0, {})
        finally:
            crit_mod.get_uncertain_point_coords_with_randomness = real
        bce_t = float(m["loss_mask_bce_0"])
        dice_t = float(m["loss_mask_dice_0"])
        bx = ref.loss_boxes(outputs, targets, indices, num_masks, 0, {})
        l1_t, giou_t = float(bx["loss_bbox_0"]), float(bx["loss_giou_0"])

    np.testing.assert_allclose(ce_j, ce_t, rtol=1e-5, err_msg="loss_labels")
    np.testing.assert_allclose(bce_j, bce_t, rtol=1e-5, err_msg="mask bce")
    np.testing.assert_allclose(dice_j, dice_t, rtol=1e-5, err_msg="mask dice")
    np.testing.assert_allclose(l1_j, l1_t, rtol=1e-5, err_msg="bbox l1")
    np.testing.assert_allclose(giou_j, giou_t, rtol=1e-5, err_msg="bbox giou")


def test_forward_captioning_greedy_matches_reference():
    """Autoregressive captioning decode parity (xdecoder.py:325-420):
    per-step contextual token embeddings via forward_language_token,
    greedy argmax against the RAW token-embedding table, token-id
    equality over the generated steps."""
    from cullavo_tpu.checkpoint.xdecoder_import import (
        import_text_encoder, import_xdecoder_predictor)
    from cullavo_tpu.models.xdecoder import text_encoder as te
    from cullavo_tpu.models.xdecoder.decoder import (XDecoderConfig,
                                                     forward_captioning)
    from cullavo_tpu.models.xdecoder.text_encoder import TextEncoderConfig

    _seed_all()
    tr = R.load("language.LangEncoder.transformer")
    vlp = R.load("language.vlpencoder")
    xd = R.load("interface.xdecoder")

    # width == dim_proj, the reference invariant the raw-table scoring needs
    lang = tr.Transformer(context_length=8, vocab_size=64, width=64,
                          layers=2, heads=4, autogressive=True)
    proj = torch.nn.Parameter(torch.randn(64, 64) * 0.1)

    class _Tok:
        def batch_decode(self, ids, skip_special_tokens=False):
            return [" ".join(map(str, row.tolist())) for row in ids]

    le = vlp.LanguageEncoder(tokenizer=_Tok(), tokenizer_type="clip",
                             lang_encoder=lang, lang_projection=proj,
                             max_token_num=8, queue_operator={})
    table = torch.randn(7, 64)
    le.default_text_embeddings = table / table.norm(dim=-1, keepdim=True)

    task_switch = {"mask": True, "bbox": True, "caption": True,
                   "captioning": True, "retrieval": True, "grounding": True}
    ref = xd.XDecoder(
        le, in_channels=64, mask_classification=True, hidden_dim=64,
        dim_proj=64, num_queries=9, contxt_len=8, nheads=4,
        dim_feedforward=128, dec_layers=3, pre_norm=False, mask_dim=32,
        task_switch=task_switch, captioning_step=5,
        enforce_input_project=False)
    ref.eval()

    cfg = XDecoderConfig(hidden_dim=64, num_queries=9, nheads=4,
                         dim_feedforward=128, dec_layers=3, mask_dim=32,
                         dim_proj=64, contxt_len=8, in_channels=64,
                         captioning_step=5)
    params = jax.tree.map(jnp.asarray, import_xdecoder_predictor(
        R.state_dict_numpy(ref, "p."), cfg, prefix="p."))
    tcfg = TextEncoderConfig(vocab_size=64, width=64, heads=4, layers=2,
                             context_length=8, dim_lang=64)
    tp = jax.tree.map(jnp.asarray, import_text_encoder(
        R.state_dict_numpy(le, "le."), tcfg, prefix="le."))

    feats, maskf = _decoder_inputs()
    start_id = 63
    with torch.no_grad():
        out_t = ref.forward_captioning(
            [torch.from_numpy(f) for f in feats], torch.from_numpy(maskf),
            extra={"start_token": torch.full((1, 8), start_id,
                                             dtype=torch.long),
                   "captioning_mask": None})
    ids_t = out_t["pred_captionings"].numpy()

    def token_embedding_fn(ids):
        tok, _ = te.forward_language_token(tp, tcfg, ids,
                                           jnp.ones_like(ids))
        return tok

    ids_j = np.asarray(forward_captioning(
        params, cfg, [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats],
        jnp.asarray(maskf.transpose(0, 2, 3, 1)), token_embedding_fn,
        tp["token_embedding"], start_id))

    # positions 0..steps: start + the 5 generated tokens (the reference
    # fills UNWRITTEN tail positions with the start id; the repo with 0 —
    # causality makes them irrelevant to the generated prefix)
    np.testing.assert_array_equal(ids_j[:, :6], ids_t[:, :6])


def test_panoptic_and_instance_inference_match_reference():
    """panoptic_inference (stuff-merge, xdecoder_model.py:774-829) and
    instance_inference (top-k + mask-score rescoring, :831-878) parity —
    the reference methods run against a stub `self` carrying the config
    attributes they read."""
    import types

    xm = R.load_isolated("architectures.xdecoder_model")
    from cullavo_tpu.models.xdecoder.model import (instance_inference,
                                                   panoptic_inference_host)

    _seed_all()
    Q, C, H, W = 10, 6, 24, 24
    rng = np.random.default_rng(23)
    mask_cls = (rng.normal(size=(Q, C + 1)) * 3).astype(np.float32)
    mask_pred = (rng.normal(size=(Q, H, W)) * 2).astype(np.float32)
    thing_ids = {0, 1, 2, 3}

    self_stub = types.SimpleNamespace(
        sem_seg_head=types.SimpleNamespace(num_classes=C),
        object_mask_threshold=0.25, overlap_threshold=0.5,
        metadata=types.SimpleNamespace(
            thing_dataset_id_to_contiguous_id={i: i for i in thing_ids}),
        num_queries=Q, test_topk_per_image=5, panoptic_on=False,
        device="cpu",
    )
    with torch.no_grad():
        pan_t, segs_t = xm.GeneralizedXdecoder.panoptic_inference(
            self_stub, torch.from_numpy(mask_cls), torch.from_numpy(mask_pred))
        inst_t = xm.GeneralizedXdecoder.instance_inference(
            self_stub, torch.from_numpy(mask_cls), torch.from_numpy(mask_pred),
            None)

    pan_j, segs_j = panoptic_inference_host(mask_cls, mask_pred, thing_ids,
                                            object_mask_threshold=0.25,
                                            overlap_threshold=0.5)
    np.testing.assert_array_equal(np.asarray(pan_j), pan_t.numpy())
    assert [(s["id"], s["isthing"], s["category_id"]) for s in segs_j] == \
           [(s["id"], s["isthing"], s["category_id"]) for s in segs_t]

    inst_j = instance_inference(jnp.asarray(mask_cls), jnp.asarray(mask_pred),
                                C, 5)
    order_j = np.argsort(-np.asarray(inst_j["scores"]))
    order_t = np.argsort(-inst_t.scores.numpy())
    np.testing.assert_allclose(
        np.asarray(inst_j["scores"])[order_j], inst_t.scores.numpy()[order_t],
        rtol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(inst_j["classes"])[order_j],
        inst_t.pred_classes.numpy()[order_t])
    np.testing.assert_array_equal(
        np.asarray(inst_j["masks"])[order_j],
        inst_t.pred_masks.numpy()[order_t])


# ---------------------------------------------------------------------------
# Full-stack evaluate() parity
# ---------------------------------------------------------------------------

def _tiny_ref_full_stack():
    """Tiny but REAL reference stack (FocalNet + FPN + lang + XDecoder head)
    plus the repo-side config and imported params — shared by the full-stack
    evaluate / evaluate_grounding parity tests."""
    from cullavo_tpu.checkpoint.xdecoder_import import (
        import_focalnet, import_fpn, import_text_encoder,
        import_xdecoder_predictor)
    from cullavo_tpu.models.xdecoder.decoder import XDecoderConfig
    from cullavo_tpu.models.xdecoder.focalnet import FocalNetConfig
    from cullavo_tpu.models.xdecoder.fpn import FPNConfig
    from cullavo_tpu.models.xdecoder.model import XDecoderModelConfig
    from cullavo_tpu.models.xdecoder.text_encoder import TextEncoderConfig

    _seed_all()
    focal = R.load("vision.backbone.focal")
    fpn_mod = R.load("vision.encoder.transformer_encoder_fpn")
    body = R.load("body.xdecoder_head")
    xm = R.load_isolated("architectures.xdecoder_model")
    tr = R.load("language.LangEncoder.transformer")
    vlp = R.load("language.vlpencoder")
    xd = R.load("interface.xdecoder")
    d2mod = sys.modules["detectron2.modeling"]

    # -- reference model pieces (tiny but real)
    bb = focal.FocalNet(
        pretrain_img_size=64, patch_size=4, embed_dim=16, depths=[1, 1, 1, 1],
        focal_levels=[2, 2, 2, 2], focal_windows=[3, 3, 3, 3],
        drop_path_rate=0.0, use_conv_embed=True, use_postln=True,
        scaling_modulator=True, use_layerscale=True)
    bb.eval()
    shapes = {"res2": d2mod.ShapeSpec(channels=16, stride=4),
              "res3": d2mod.ShapeSpec(channels=32, stride=8),
              "res4": d2mod.ShapeSpec(channels=64, stride=16),
              "res5": d2mod.ShapeSpec(channels=128, stride=32)}
    pd = fpn_mod.TransformerEncoderPixelDecoder(
        input_shape=shapes, transformer_dropout=0.0, transformer_nheads=4,
        transformer_dim_feedforward=128, transformer_enc_layers=2,
        transformer_pre_norm=False, conv_dim=64, mask_dim=32, mask_on=True,
        norm="GN")
    lang = tr.Transformer(context_length=8, vocab_size=64, width=32,
                          layers=2, heads=4, autogressive=True)
    le = vlp.LanguageEncoder(
        tokenizer=None, tokenizer_type="clip", lang_encoder=lang,
        lang_projection=torch.nn.Parameter(torch.randn(32, 64) * 0.1),
        max_token_num=8, queue_operator={})
    table = torch.randn(7, 64)
    table = table / table.norm(dim=-1, keepdim=True)
    le.default_text_embeddings = table
    task_switch = {"mask": True, "bbox": True, "caption": True,
                   "captioning": True, "retrieval": True, "grounding": True}
    pred = xd.XDecoder(
        le, in_channels=64, mask_classification=True, hidden_dim=64,
        dim_proj=64, num_queries=9, contxt_len=8, nheads=4,
        dim_feedforward=128, dec_layers=3, pre_norm=False, mask_dim=32,
        task_switch=task_switch, captioning_step=50,
        enforce_input_project=False)
    head = body.XdecoderHead(
        input_shape=shapes, num_classes=6, pixel_decoder=pd,
        loss_weight=1.0, ignore_value=255, transformer_predictor=pred,
        transformer_in_feature="multi_scale_pixel_decoder")
    head.eval()

    cfg = XDecoderModelConfig(
        backbone=FocalNetConfig(embed_dim=16, depths=(1, 1, 1, 1),
                                focal_levels=(2, 2, 2, 2),
                                focal_windows=(3, 3, 3, 3),
                                use_conv_embed=True, use_postln=True,
                                scaling_modulator=True, use_layerscale=True),
        fpn=FPNConfig(in_channels=(16, 32, 64, 128), conv_dim=64,
                      mask_dim=32, gn_groups=32, enc_layers=2, enc_heads=4,
                      enc_ffn=128),
        decoder=XDecoderConfig(hidden_dim=64, num_queries=9, nheads=4,
                               dim_feedforward=128, dec_layers=3,
                               mask_dim=32, dim_proj=64, contxt_len=8,
                               in_channels=64),
        text=TextEncoderConfig(vocab_size=64, width=32, heads=4, layers=2,
                               context_length=8, dim_lang=64),
        num_classes=6)
    params = {
        "backbone": import_focalnet(R.state_dict_numpy(bb, "backbone."),
                                    cfg.backbone),
        "fpn": import_fpn(R.state_dict_numpy(pd, "pd."), cfg.fpn,
                          prefix="pd."),
        "decoder": import_xdecoder_predictor(
            R.state_dict_numpy(pred, "p."), cfg.decoder, prefix="p."),
        "text": import_text_encoder(R.state_dict_numpy(le, "le."), cfg.text,
                                    prefix="le."),
    }
    params = jax.tree.map(jnp.asarray, params)
    return xm, bb, le, head, task_switch, cfg, params, table


def _eval_self_stub(xm, bb, head, task_switch):
    import types

    self_stub = types.SimpleNamespace(
        device="cpu",
        pixel_mean=torch.tensor([123.675, 116.280, 103.530]).view(3, 1, 1),
        pixel_std=torch.tensor([58.395, 57.120, 57.375]).view(3, 1, 1),
        size_divisibility=32, backbone=bb, sem_seg_head=head,
        task_switch=task_switch, metadata=types.SimpleNamespace(),
        sem_seg_postprocess_before_inference=False,
        semantic_on=True, panoptic_on=False, instance_on=False,
        num_queries=head.predictor.num_queries,
    )
    self_stub.semantic_inference = \
        lambda *a, **k: xm.GeneralizedXdecoder.semantic_inference(
            self_stub, *a, **k)
    return self_stub


def test_full_stack_evaluate_matches_reference():
    """END-TO-END eval parity: the reference's own
    ``GeneralizedXdecoder.evaluate`` wiring (normalize → ImageList →
    backbone → XdecoderHead(FPN + predictor) → bicubic upsample →
    semantic_inference, xdecoder_model.py:436-505) run on a stub ``self``
    with REAL submodules, vs the repo's ``normalize_images + forward_eval +
    semantic_inference`` through the checkpoint importers.  Every component
    is individually parity-tested above; this catches the WIRING (query
    slicing, normalization constants, padding, upsample, softmax-sigmoid
    composition)."""
    from cullavo_tpu.models.xdecoder.model import (forward_eval,
                                                   normalize_images,
                                                   semantic_inference)

    xm, bb, le, head, task_switch, cfg, params, table = _tiny_ref_full_stack()
    self_stub = _eval_self_stub(xm, bb, head, task_switch)

    rng = np.random.default_rng(29)
    raw = rng.uniform(0, 255, size=(64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        out = xm.GeneralizedXdecoder.evaluate(
            self_stub,
            [{"image": torch.from_numpy(raw.transpose(2, 0, 1)),
              "height": 64, "width": 64}])
    sem_t = out[0]["sem_seg"].numpy()

    img = normalize_images(jnp.asarray(raw[None]))         # [1, H, W, 3]
    mask_cls, mask_pred, _ = forward_eval(
        params, cfg, img, jnp.asarray(table.numpy()), out_size=(64, 64))
    sem_j = np.asarray(semantic_inference(mask_cls[0], mask_pred[0]))

    assert sem_j.shape == sem_t.shape
    np.testing.assert_allclose(sem_j, sem_t, atol=2e-3, rtol=1e-2)
    # and the class-assignment map itself agrees everywhere
    np.testing.assert_array_equal(sem_j.argmax(0), sem_t.argmax(0))


def test_full_stack_evaluate_grounding_matches_reference(monkeypatch):
    """Referring-segmentation eval parity: the reference's own
    ``GeneralizedXdecoder.evaluate_grounding`` (xdecoder_model.py:595-662 —
    per-text token embeds as grounding tokens, vl-similarity matched-query
    mask selection, bicubic+antialias upsample) vs the repo's
    ``evaluate_grounding``.  The text is PADDED (5 real tokens of 8): the
    reference packs only attention_mask-true embeds, the repo keeps static
    shapes and masks the padded grounding slots out of self-attention —
    both must produce the same mask."""
    from cullavo_tpu.models.xdecoder.model import (evaluate_grounding,
                                                   normalize_images)

    xm, bb, le, head, task_switch, cfg, params, table = _tiny_ref_full_stack()
    self_stub = _eval_self_stub(xm, bb, head, task_switch)

    # pinned "tokenization": 5 real tokens (EOT = max id at slot 4), 3 pad
    ids_np = np.array([[7, 13, 21, 5, 63, 0, 0, 0]], np.int64)
    mask_np = np.array([[1, 1, 1, 1, 1, 0, 0, 0]], np.int64)

    class _FakeTok:
        def __call__(self, txts, padding=None, truncation=None,
                     max_length=None, return_tensors=None):
            assert max_length == 8
            return {"input_ids": torch.from_numpy(ids_np),
                    "attention_mask": torch.from_numpy(mask_np)}

    le.tokenizer = _FakeTok()
    # the reference hardcodes .cuda() on the token tensors
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)

    rng = np.random.default_rng(31)
    raw = rng.uniform(0, 255, size=(64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        out = xm.GeneralizedXdecoder.evaluate_grounding(
            self_stub,
            [{"image": torch.from_numpy(raw.transpose(2, 0, 1)),
              "height": 64, "width": 64,
              "groundings": {"texts": [("a cat",)]}}])
    mask_t = out[0]["grounding_mask"].numpy()            # [1, 64, 64] logits

    img = normalize_images(jnp.asarray(raw[None]))
    mask_j = np.asarray(evaluate_grounding(
        params, cfg, img, jnp.asarray(ids_np.astype(np.int32))[None],
        jnp.asarray(mask_np.astype(np.int32))[None], out_size=(64, 64)))

    assert mask_j.shape == (1, 64, 64) and mask_t.shape == (1, 64, 64)
    np.testing.assert_allclose(mask_j[0], mask_t[0], atol=5e-3, rtol=1e-2)
    # the binarized referring mask agrees everywhere
    np.testing.assert_array_equal(mask_j[0] > 0, mask_t[0] > 0)


def test_full_stack_evaluate_classification_matches_reference():
    """Zero-shot classification eval parity: the reference's
    ``evaluate_classification`` (xdecoder_model.py:579-593) returns the
    class-token row of pred_logits UNMODIFIED — background column included —
    straight into top-1/5 accuracy; the repo must match that row exactly."""
    from cullavo_tpu.models.xdecoder.model import (evaluate_classification,
                                                   normalize_images)

    xm, bb, le, head, task_switch, cfg, params, table = _tiny_ref_full_stack()
    self_stub = _eval_self_stub(xm, bb, head, task_switch)

    rng = np.random.default_rng(37)
    raw = rng.uniform(0, 255, size=(64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        out = xm.GeneralizedXdecoder.evaluate_classification(
            self_stub,
            [{"image": torch.from_numpy(raw.transpose(2, 0, 1)),
              "height": 64, "width": 64}])
    logits_t = out[0]["pred_class"].numpy()

    img = normalize_images(jnp.asarray(raw[None]))
    logits_j = np.asarray(evaluate_classification(
        params, cfg, img, jnp.asarray(table.numpy())))[0]

    assert logits_j.shape == logits_t.shape            # background included
    np.testing.assert_allclose(logits_j, logits_t, atol=2e-3, rtol=1e-2)
    assert int(logits_j.argmax()) == int(logits_t.argmax())


def test_full_stack_evaluate_retrieval_matches_reference(monkeypatch):
    """Retrieval eval parity incl. the backbone ensemble: the reference's
    ``evaluate_retrieval`` (xdecoder_model.py:507-550) emits the class-token
    caption embedding AND (retrieval_emsemble, :519-523) res5 avg-pooled
    through backbone_proj; its evaluator normalizes each and averages the
    score matrices 0.5/0.5 (retrieval_evaluation.py:156-166).  The repo's
    ``evaluate_retrieval_embedding`` + RetrievalEvaluator must reproduce
    both embeddings and the ensembled scores."""
    from cullavo_tpu.data.evaluation.evaluators import RetrievalEvaluator
    from cullavo_tpu.models.xdecoder.model import (
        evaluate_retrieval_embedding, normalize_images)

    xm, bb, le, head, task_switch, cfg, params, table = _tiny_ref_full_stack()
    self_stub = _eval_self_stub(xm, bb, head, task_switch)
    self_stub.retrieval_emsemble = True
    bproj = torch.randn(128, 64) * 0.05                 # res5 ch → dim_proj
    self_stub.backbone_proj = bproj

    # two captions with pinned "tokenization"
    tok_table = {
        "a cat": (np.array([[9, 17, 63, 0, 0, 0, 0, 0]], np.int64),
                  np.array([[1, 1, 1, 0, 0, 0, 0, 0]], np.int64)),
        "a dog": (np.array([[9, 30, 44, 63, 0, 0, 0, 0]], np.int64),
                  np.array([[1, 1, 1, 1, 0, 0, 0, 0]], np.int64)),
    }

    class _FakeTok:
        def __call__(self, txts, padding=None, truncation=None,
                     max_length=None, return_tensors=None):
            if isinstance(txts, str):
                txts = [txts]
            ids = np.concatenate([tok_table[t][0] for t in txts])
            m = np.concatenate([tok_table[t][1] for t in txts])
            return {"input_ids": torch.from_numpy(ids),
                    "attention_mask": torch.from_numpy(m)}

    le.tokenizer = _FakeTok()
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)

    rng = np.random.default_rng(41)
    raw = rng.uniform(0, 255, size=(64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        out = xm.GeneralizedXdecoder.evaluate_retrieval(
            self_stub,
            [{"image": torch.from_numpy(raw.transpose(2, 0, 1)),
              "height": 64, "width": 64, "captions": ["a cat", "a dog"],
              "image_id": 5}])
    cap = out[0]["caption"]
    v_t = cap["image_embeds"][0].numpy()                # [1, D] un-normalized
    v2_t = cap["image_embeds"][1].numpy()
    t_t = cap["text_embeds"].numpy()                    # [2, D]

    params = dict(params)
    params["backbone_proj"] = jnp.asarray(bproj.numpy())
    img = normalize_images(jnp.asarray(raw[None]))
    emb_j, emb2_j = evaluate_retrieval_embedding(params, cfg, img)
    emb_j, emb2_j = np.asarray(emb_j), np.asarray(emb2_j)

    def _n(x):
        return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-7)

    np.testing.assert_allclose(emb_j[0], _n(v_t)[0], atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(emb2_j[0], _n(v2_t)[0], atol=2e-3, rtol=1e-2)

    # ensembled score parity through the repo evaluator
    ev = RetrievalEvaluator(ks=(1,))
    ev.add(emb_j[0], _n(t_t), image_id=5, image_emb2=emb2_j[0])
    sim_ref = 0.5 * (_n(v_t) @ _n(t_t).T) + 0.5 * (_n(v2_t) @ _n(t_t).T)
    img_n = _n(np.stack(ev.image_embs))
    img2_n = _n(np.stack(ev.image_embs2))
    txt_n = _n(np.stack(ev.text_embs))
    sim_repo = 0.5 * (img_n @ txt_n.T) + 0.5 * (img2_n @ txt_n.T)
    np.testing.assert_allclose(sim_repo, sim_ref, atol=2e-3, rtol=1e-2)
    assert set(ev.results()) == {"ir@1", "tr@1"}


def test_set_criterion_forward_deep_supervised_matches_reference():
    """FULL SetCriterion.forward parity: per-layer Hungarian matching,
    deep-supervised labels/masks/boxes losses, num_masks normalization and
    reference key numbering — randomness pinned on both sides (matcher
    per-row sample points + mask-loss uncertainty points per layer)."""
    import collections

    crit_mod = R.load("modules.criterion")
    matcher_mod = R.load("modules.matcher")
    _seed_all()
    B, Q, C1, N, H, W, P = 2, 7, 6, 4, 16, 16, 32
    L = 3  # predictions: final + 2 aux
    rng = np.random.default_rng(31)
    layers_np = [dict(
        logits=rng.normal(size=(B, Q, C1)).astype(np.float32),
        masks=rng.normal(size=(B, Q, H, W)).astype(np.float32),
        boxes=rng.normal(size=(B, Q, 4)).astype(np.float32),
    ) for _ in range(L)]
    n_per = [4, 2]
    tgt_cls = rng.integers(0, C1 - 1, size=(B, N)).astype(np.int64)
    tgt_masks = (rng.random((B, N, H, W)) > 0.6).astype(np.float32)
    tgt_boxes = (rng.random((B, N, 4)) * 0.4 + 0.1).astype(np.float32)
    valid = np.zeros((B, N), bool)
    for b, n in enumerate(n_per):
        valid[b, :n] = True
    # pinned randomness per reference layer_id
    match_coords = {r: rng.random((B, P, 2)).astype(np.float32)
                    for r in range(L)}
    loss_coords = {r: rng.random((B, N, P, 2)).astype(np.float32)
                   for r in range(L)}

    # ---- reference ----
    matcher = matcher_mod.HungarianMatcher(cost_class=2.0, cost_mask=5.0,
                                           cost_dice=5.0, num_points=P)
    ref = crit_mod.SetCriterion(
        num_classes=C1 - 1, matcher=matcher, weight_dict={}, eos_coef=0.1,
        top_x_layers={"mask": 10, "box": 10, "caption": 10,
                      "captioning": 10, "retrieval": 10, "grounding": 10},
        losses=["labels", "masks", "boxes"], num_points=P,
        oversample_ratio=3.0, importance_sample_ratio=0.75,
        grounding_weight=None)
    # reference layer order: final first, then aux REVERSED (ref_id 1, 2);
    # matcher draws torch.rand(1, P, 2) once per batch row per layer
    rand_q = collections.deque()
    for r in range(L):
        for b in range(B):
            rand_q.append(torch.from_numpy(match_coords[r][b:b + 1]))
    # the reference concatenates matched pairs in linear_sum_assignment's
    # src-ASCENDING order, not target order — derive each layer's pair
    # order from the (parity-proven) native matching so both sides sample
    # identical points per (src, tgt) pair
    from cullavo_tpu.models.xdecoder.criterion import (CriterionConfig,
                                                       set_criterion)

    cfg = CriterionConfig(num_classes=C1 - 1, eos_coef=0.1, num_points=P,
                          weight_ce=1.0, weight_mask=1.0, weight_dice=1.0,
                          weight_bbox=1.0, weight_giou=1.0)
    out_j = {
        "pred_logits": jnp.asarray(layers_np[-1]["logits"]),
        "pred_masks": jnp.asarray(layers_np[-1]["masks"]),
        "pred_boxes": jnp.asarray(layers_np[-1]["boxes"]),
        "aux_outputs": [
            {"pred_logits": jnp.asarray(l["logits"]),
             "pred_masks": jnp.asarray(l["masks"]),
             "pred_boxes": jnp.asarray(l["boxes"])} for l in layers_np[:-1]],
    }
    tgts = {"classes": jnp.asarray(tgt_cls), "masks": jnp.asarray(tgt_masks),
            "boxes": jnp.asarray(tgt_boxes), "valid": jnp.asarray(valid)}
    pinned = {r: {"match": jnp.asarray(match_coords[r]),
                  "loss": jnp.asarray(loss_coords[r].reshape(B * N, P, 2))}
              for r in range(L)}
    j_losses, all_idx = set_criterion(out_j, tgts, cfg, jax.random.PRNGKey(0),
                                      pinned_coords=pinned,
                                      return_indices="all")

    unc_q = collections.deque()
    for r in range(L):
        src_np = np.asarray(all_idx[r][0])
        chunks = []
        for b, n in enumerate(n_per):
            order_b = np.argsort(src_np[b, :n], kind="stable")
            chunks.append(loss_coords[r][b, order_b])
        unc_q.append(torch.from_numpy(np.concatenate(chunks)))

    real_rand, real_unc = torch.rand, \
        crit_mod.get_uncertain_point_coords_with_randomness

    def fake_rand(*shape, **kw):
        if tuple(shape) == (1, P, 2):
            return rand_q.popleft()
        return real_rand(*shape, **kw)

    # aux layers are predictions [0, 1] in forward order; the reference
    # reverses them (ref_id 1 = prediction 1, ref_id 2 = prediction 0)
    outputs = {
        "pred_logits": torch.from_numpy(layers_np[-1]["logits"]),
        "pred_masks": torch.from_numpy(layers_np[-1]["masks"]),
        "pred_boxes": torch.from_numpy(layers_np[-1]["boxes"]),
        "aux_outputs": [
            {"pred_logits": torch.from_numpy(l["logits"]),
             "pred_masks": torch.from_numpy(l["masks"]),
             "pred_boxes": torch.from_numpy(l["boxes"])}
            for l in layers_np[:-1]],
    }
    targets = [{"labels": torch.from_numpy(tgt_cls[b, :n]),
                "masks": torch.from_numpy(tgt_masks[b, :n]),
                "boxes": torch.from_numpy(tgt_boxes[b, :n])}
               for b, n in enumerate(n_per)]
    # matcher.from_numpy shim (matcher.py:165 calls it with dtype=)
    real_from_numpy = torch.from_numpy

    def fake_from_numpy(a, dtype=None, device=None):
        t = real_from_numpy(np.asarray(a))
        return t.to(dtype) if dtype is not None else t

    torch.rand = fake_rand
    torch.from_numpy = fake_from_numpy
    crit_mod.get_uncertain_point_coords_with_randomness = \
        lambda *a, **k: unc_q.popleft()
    try:
        with torch.no_grad():
            ref_losses = {k: float(v)
                          for k, v in ref(outputs, targets, extra={}).items()}
    finally:
        torch.rand = real_rand
        torch.from_numpy = real_from_numpy
        crit_mod.get_uncertain_point_coords_with_randomness = real_unc
    assert not rand_q and not unc_q   # every pinned draw consumed

    # ---- native losses were computed above (same pinned points) ----
    rename = {"loss_ce": "loss_mask_ce", "loss_mask_bce": "loss_mask_bce",
              "loss_mask_dice": "loss_mask_dice", "loss_bbox": "loss_bbox",
              "loss_giou": "loss_giou"}
    got = {}
    for k, v in j_losses.items():
        for old, new in rename.items():
            if k == old:
                got[f"{new}_0"] = float(v)
                break
            if k.startswith(old + "_"):
                got[f"{new}_{int(k[len(old) + 1:])}"] = float(v)
                break

    assert set(got) == set(ref_losses), (sorted(got), sorted(ref_losses))
    for k in sorted(ref_losses):
        np.testing.assert_allclose(got[k], ref_losses[k], rtol=2e-5,
                                   atol=1e-6, err_msg=k)
