"""X-Decoder stack tests: shapes, mask invariants, matcher parity, criterion."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cullavo_tpu.models.xdecoder.criterion import CriterionConfig, set_criterion
from cullavo_tpu.models.xdecoder.decoder import (XDecoderConfig,
                                                 grounding_self_attn_allowed,
                                                 init_xdecoder_params,
                                                 sine_position_embedding,
                                                 structured_self_attn_allowed,
                                                 xdecoder_forward)
from cullavo_tpu.models.xdecoder.focalnet import (FocalNetConfig,
                                                  focalnet_forward,
                                                  init_focalnet_params)
from cullavo_tpu.models.xdecoder.fpn import FPNConfig, fpn_forward, init_fpn_params
from cullavo_tpu.models.xdecoder.matcher import (batch_dice_cost,
                                                 batch_sigmoid_ce_cost,
                                                 compute_match_costs,
                                                 hungarian_match)
from cullavo_tpu.models.xdecoder.text_encoder import (TextEncoderConfig,
                                                      compute_similarity,
                                                      forward_language,
                                                      forward_language_token,
                                                      init_text_encoder_params)

TINY_DEC = XDecoderConfig(hidden_dim=64, num_queries=9, nheads=4,
                          dim_feedforward=128, dec_layers=3, mask_dim=32,
                          dim_proj=32, contxt_len=8, in_channels=64)


@pytest.fixture(scope="module")
def pipeline_outputs():
    """backbone → fpn → decoder on a tiny config."""
    fn_cfg = FocalNetConfig(embed_dim=16, depths=(1, 1, 1, 1),
                            focal_levels=(2, 2, 2, 2), focal_windows=(3, 3, 3, 3))
    fpn_cfg = FPNConfig(in_channels=(16, 32, 64, 128), conv_dim=64, mask_dim=32,
                        gn_groups=8, enc_layers=2, enc_heads=4, enc_ffn=128)
    k = jax.random.PRNGKey(0)
    fn_p = init_focalnet_params(fn_cfg, k)
    fpn_p = init_fpn_params(fpn_cfg, jax.random.PRNGKey(1))
    dec_p = init_xdecoder_params(TINY_DEC, jax.random.PRNGKey(2))
    images = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 3))
    feats = focalnet_forward(fn_p, fn_cfg, images)
    mask_features, tr_feats, pyramid = fpn_forward(fpn_p, fpn_cfg, feats)
    text_embeds = jax.random.normal(jax.random.PRNGKey(4), (7, 32))
    out = xdecoder_forward(dec_p, TINY_DEC, pyramid, mask_features,
                           text_class_embeds=text_embeds, logit_scale=jnp.zeros(()))
    return feats, mask_features, pyramid, out


def test_backbone_fpn_shapes(pipeline_outputs):
    feats, mask_features, pyramid, _ = pipeline_outputs
    assert feats["res2"].shape == (2, 16, 16, 16)
    assert feats["res5"].shape == (2, 2, 2, 128)
    assert mask_features.shape == (2, 16, 16, 32)   # res2 resolution, mask_dim
    assert [p.shape[1] for p in pyramid] == [2, 4, 8]  # res5', res4', res3'
    assert all(p.shape[-1] == 64 for p in pyramid)


def test_decoder_outputs(pipeline_outputs):
    *_, out = pipeline_outputs
    assert out["pred_logits"].shape == (2, TINY_DEC.num_queries, 7)
    assert out["pred_masks"].shape == (2, TINY_DEC.num_queries, 16, 16)
    assert out["pred_boxes"].shape == (2, TINY_DEC.num_queries, 4)
    assert len(out["aux_outputs"]) == TINY_DEC.dec_layers
    for v in (out["pred_logits"], out["pred_masks"]):
        assert bool(jnp.isfinite(v).all())


def test_structured_attn_mask():
    cfg = TINY_DEC
    nq, cl = cfg.num_queries, cfg.contxt_len
    m = np.asarray(structured_self_attn_allowed(cfg, with_caption=True))
    # object queries don't see class token or captions
    assert not m[0, nq - 1] and not m[0, nq]
    # class token doesn't see object queries but sees itself
    assert not m[nq - 1, 0] and m[nq - 1, nq - 1]
    # captions: causal among themselves, see queries
    assert m[nq + 3, nq + 2] and not m[nq + 2, nq + 3]
    assert m[nq + 1, 0]
    g = np.asarray(grounding_self_attn_allowed(cfg, 5))
    assert g[nq + 1, nq + 2] and not g[0, nq + 1] and not g[nq + 1, 0]


def test_sine_pe_shape_and_range():
    pe = sine_position_embedding(8, 4, 64)
    assert pe.shape == (32, 64)
    assert float(jnp.max(jnp.abs(pe))) <= 1.0 + 1e-6


def test_text_encoder():
    cfg = TextEncoderConfig(vocab_size=64, width=32, heads=4, layers=2,
                            context_length=16, dim_lang=32)
    p = init_text_encoder_params(cfg, jax.random.PRNGKey(0))
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 40, size=(3, 16)))
    ids = ids.at[:, 5].set(63)  # max id = EOT position marker
    mask = jnp.ones((3, 16), jnp.int32)
    emb = forward_language(p, cfg, ids, mask)
    assert emb.shape == (3, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1), 1.0, atol=1e-5)
    token, cls = forward_language_token(p, cfg, ids, mask, norm=True)
    assert token.shape == (3, 16, 32)
    sim = compute_similarity(p, emb[None], emb)
    assert sim.shape == (1, 3, 3)
    # causal: changing a later token must not affect earlier hidden states
    ids2 = ids.at[:, 10].set(7)
    t2, _ = forward_language_token(p, cfg, ids2, mask)
    t1, _ = forward_language_token(p, cfg, ids, mask)
    np.testing.assert_allclose(np.asarray(t1)[:, :10], np.asarray(t2)[:, :10], atol=1e-5)


def test_cost_functions_match_naive():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(5, 32)).astype(np.float32))
    t = jnp.asarray((rng.random((3, 32)) > 0.5).astype(np.float32))
    bce = np.asarray(batch_sigmoid_ce_cost(q, t))
    # naive
    import scipy.special as sp
    qn = np.asarray(q)
    tn = np.asarray(t)
    naive = np.zeros((5, 3))
    for i in range(5):
        for j in range(3):
            p = qn[i]
            naive[i, j] = np.mean(np.maximum(p, 0) - p * tn[j] + np.log1p(np.exp(-np.abs(p))))
    np.testing.assert_allclose(bce, naive, rtol=1e-5)
    dice = np.asarray(batch_dice_cost(q, t))
    probs = sp.expit(qn)
    for i in range(5):
        for j in range(3):
            d = 1 - (2 * (probs[i] * tn[j]).sum() + 1) / (probs[i].sum() + tn[j].sum() + 1)
            np.testing.assert_allclose(dice[i, j], d, rtol=1e-5)


def test_hungarian_matches_scipy():
    from scipy.optimize import linear_sum_assignment
    rng = np.random.default_rng(1)
    cost = rng.random((2, 6, 4)).astype(np.float32)
    n_valid = np.asarray([4, 2], np.int32)
    cost[1, :, 2:] = 1e8
    src, valid = jax.jit(hungarian_match)(jnp.asarray(cost), jnp.asarray(n_valid))
    src, valid = np.asarray(src), np.asarray(valid)
    for b, n in enumerate(n_valid):
        r, c = linear_sum_assignment(cost[b, :, :n])
        order = np.argsort(c)
        np.testing.assert_array_equal(src[b, :n], r[order])
        assert valid[b, :n].all() and not valid[b, n:].any()


def test_device_lap_env_forces_jv_on_cpu(monkeypatch):
    """CULLAVO_DEVICE_LAP=1 selects the device-side JV solver on the CPU
    backend (the path a TPU pod runs; used by dryrun_multichip so the
    multichip evidence covers the pod matcher, not the scipy callback) and
    still produces scipy-optimal assignments."""
    from scipy.optimize import linear_sum_assignment
    monkeypatch.setenv("CULLAVO_DEVICE_LAP", "1")
    rng = np.random.default_rng(5)
    cost = rng.random((2, 6, 4)).astype(np.float32)
    n_valid = np.asarray([4, 3], np.int32)
    src, valid = jax.jit(hungarian_match)(jnp.asarray(cost), jnp.asarray(n_valid))
    src, valid = np.asarray(src), np.asarray(valid)
    for b, n in enumerate(n_valid):
        r, c = linear_sum_assignment(cost[b, :, :n])
        total_ref = cost[b, r, c].sum()
        total_dev = cost[b, src[b, :n], np.arange(n)].sum()
        np.testing.assert_allclose(total_dev, total_ref, rtol=1e-6)
        assert valid[b, :n].all() and not valid[b, n:].any()


def test_criterion_losses_finite_and_sensitive(pipeline_outputs):
    *_, out = pipeline_outputs
    B, N, H, W = 2, 4, 16, 16
    rng = np.random.default_rng(0)
    targets = {
        "classes": jnp.asarray(rng.integers(0, 6, size=(B, N))),
        "masks": jnp.asarray((rng.random((B, N, H, W)) > 0.7).astype(np.float32)),
        "boxes": jnp.asarray(rng.random((B, N, 4)).astype(np.float32) * 0.5),
        "valid": jnp.asarray([[1, 1, 1, 0], [1, 0, 0, 0]], jnp.bool_),
    }
    cfg = CriterionConfig(num_classes=6, num_points=256, top_x_layers_class=2,
                          top_x_layers_mask=2, top_x_layers_box=2)
    losses = set_criterion(out, targets, cfg, jax.random.PRNGKey(0))
    assert "loss_ce" in losses and "loss_mask_bce" in losses and "loss_bbox" in losses
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k
    total = sum(losses.values())
    assert float(total) > 0


def test_model_assembly_eval_and_train():
    from cullavo_tpu.models.xdecoder.model import (
        forward_eval, forward_seg_train, init_xdecoder_model_params,
        instance_inference, panoptic_inference_host, semantic_inference,
        tiny_xdecoder_config)

    cfg = tiny_xdecoder_config()
    params = init_xdecoder_model_params(cfg, jax.random.PRNGKey(0))
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    text_embeds = jax.random.normal(jax.random.PRNGKey(2), (cfg.num_classes + 1, cfg.decoder.dim_proj))

    mask_cls, mask_pred, boxes = forward_eval(params, cfg, images, text_embeds,
                                              out_size=(64, 64))
    assert mask_cls.shape == (2, 9, 7)
    assert mask_pred.shape == (2, 9, 64, 64)

    sem = semantic_inference(mask_cls[0], mask_pred[0])
    assert sem.shape == (cfg.num_classes, 64, 64)

    inst = instance_inference(mask_cls[0], mask_pred[0], cfg.num_classes, topk=5)
    assert inst["masks"].shape == (5, 64, 64)
    assert inst["scores"].shape == (5,)

    pan, segs = panoptic_inference_host(np.asarray(mask_cls[0]),
                                        np.asarray(mask_pred[0]),
                                        thing_ids={0, 1, 2},
                                        object_mask_threshold=0.0)
    assert pan.shape == (64, 64)

    rng = np.random.default_rng(0)
    targets = {
        "classes": jnp.asarray(rng.integers(0, 6, size=(2, 3))),
        "masks": jnp.asarray((rng.random((2, 3, 16, 16)) > 0.7).astype(np.float32)),
        "boxes": jnp.asarray(rng.random((2, 3, 4)).astype(np.float32) * 0.5),
        "valid": jnp.asarray([[1, 1, 0], [1, 0, 0]], jnp.bool_),
    }
    losses = forward_seg_train(params, cfg, images, targets, text_embeds,
                               jax.random.PRNGKey(3))
    assert any(k.startswith("loss_ce") for k in losses)
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k


def test_grounding_eval_path():
    from cullavo_tpu.models.xdecoder.model import (
        evaluate_grounding, init_xdecoder_model_params, tiny_xdecoder_config)

    cfg = tiny_xdecoder_config()
    params = init_xdecoder_model_params(cfg, jax.random.PRNGKey(0))
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    rng = np.random.default_rng(0)
    # one phrase per image, context length 8; dim_lang == decoder hidden_dim
    # (the reference invariant) so tokens feed the decoder stream directly
    text_ids = jnp.asarray(rng.integers(1, 63, size=(2, 1, 8)))
    text_mask = jnp.ones((2, 1, 8), jnp.int32)
    pred = evaluate_grounding(params, cfg, images, text_ids, text_mask,
                              out_size=(64, 64))
    assert pred.shape == (2, 64, 64)
    assert np.isfinite(np.asarray(pred)).all()


def test_model_registry():
    from cullavo_tpu.models.build import (build_backbone, build_encoder,
                                          build_model)
    from cullavo_tpu.models.xdecoder.focalnet import FocalNetConfig

    cfg, params, fwd = build_backbone(
        "focal", FocalNetConfig(embed_dim=16, depths=(1, 1, 1, 1),
                                focal_levels=(2, 2, 2, 2),
                                focal_windows=(3, 3, 3, 3)))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    outs = fwd(params, cfg, x)
    assert set(outs) == {"res2", "res3", "res4", "res5"}

    import pytest as _pytest
    with _pytest.raises(KeyError):
        build_model("nonexistent_model")
    with _pytest.raises(KeyError):
        build_encoder("nonexistent_encoder")


def test_davit_and_samvit_smoke():
    from cullavo_tpu.models.xdecoder.davit import (DaViTConfig, davit_forward,
                                                   init_davit_params)
    from cullavo_tpu.models.xdecoder.sam_vit import (SamVitConfig,
                                                     init_sam_vit_params,
                                                     sam_vit_forward)

    dcfg = DaViTConfig(embed_dims=(8, 16, 32, 64), num_heads=(2, 2, 4, 4),
                       num_groups=(2, 2, 4, 4), depths=(1, 1, 1, 1), window_size=4)
    dp = init_davit_params(dcfg, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    outs = davit_forward(dp, dcfg, x)
    assert outs["res5"].shape == (1, 1, 1, 64)
    assert all(bool(jnp.isfinite(v).all()) for v in outs.values())

    vcfg = SamVitConfig(img_size=32, patch_size=16, embed_dim=16, depth=2,
                        num_heads=2, window_size=2, global_attn_indexes=(1,),
                        out_dims=(8, 16, 32, 64))
    vp = init_sam_vit_params(vcfg, jax.random.PRNGKey(2))
    outs = sam_vit_forward(vp, vcfg, x)
    assert outs["res2"].shape[1] == 8  # stride 4
    assert all(bool(jnp.isfinite(v).all()) for v in outs.values())


def test_xdecoder_train_step_decreases_loss():
    from cullavo_tpu.models.xdecoder.model import (init_xdecoder_model_params,
                                                   tiny_xdecoder_config)
    from cullavo_tpu.trainer.optimizer import xdecoder_optimizer
    from cullavo_tpu.trainer.step import TrainState
    from cullavo_tpu.trainer.xdecoder_step import make_xdecoder_train_step

    cfg = tiny_xdecoder_config()
    params = init_xdecoder_model_params(cfg, jax.random.PRNGKey(0))
    tx = xdecoder_optimizer(base_lr=5e-4, total_steps=40, grad_clip=1.0,
                            warmup_steps=2)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32)),
        "classes": jnp.asarray(rng.integers(0, 6, size=(2, 3))),
        "masks": jnp.asarray((rng.random((2, 3, 16, 16)) > 0.7).astype(np.float32)),
        "boxes": jnp.asarray(rng.random((2, 3, 4)).astype(np.float32) * 0.5),
        "valid": jnp.asarray([[1, 1, 0], [1, 0, 0]], jnp.bool_),
    }
    text_embeds = jax.random.normal(jax.random.PRNGKey(2), (7, cfg.decoder.dim_proj))
    step = jax.jit(make_xdecoder_train_step(cfg, tx))
    losses = []
    s = state
    for i in range(6):
        s, m = step(s, batch, text_embeds, jax.random.PRNGKey(0))
        losses.append(float(m["loss_total"]))
    assert losses[-1] < losses[0], losses
    assert int(s.step) == 6

    # mixed precision (the reference's Accelerate-bf16 configuration):
    # bf16 compute over f32 master params must also train — finite losses
    # that track the f32 trajectory, params stay f32
    step16 = jax.jit(make_xdecoder_train_step(cfg, tx,
                                              compute_dtype=jnp.bfloat16))
    s16 = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    losses16 = []
    for i in range(6):
        s16, m = step16(s16, batch, text_embeds, jax.random.PRNGKey(0))
        losses16.append(float(m["loss_total"]))
    assert all(np.isfinite(l) for l in losses16), losses16
    assert losses16[-1] < losses16[0], losses16
    assert abs(losses16[0] - losses[0]) / losses[0] < 0.05
    leaf = jax.tree.leaves(s16.trainable)[0]
    assert leaf.dtype == jnp.float32


def test_forward_captioning_greedy():
    """Autoregressive captioning decode produces valid token ids and is
    deterministic (xdecoder.py:325-420 capability)."""
    from cullavo_tpu.models.xdecoder.decoder import forward_captioning
    from cullavo_tpu.models.xdecoder.fpn import FPNConfig, fpn_forward, init_fpn_params
    from cullavo_tpu.models.xdecoder.focalnet import (FocalNetConfig,
                                                      focalnet_forward,
                                                      init_focalnet_params)
    from cullavo_tpu.models.xdecoder.text_encoder import (TextEncoderConfig,
                                                          init_text_encoder_params)

    dec_cfg = TINY_DEC
    fn_cfg = FocalNetConfig(embed_dim=16, depths=(1, 1, 1, 1),
                            focal_levels=(2, 2, 2, 2), focal_windows=(3, 3, 3, 3))
    fpn_cfg = FPNConfig(in_channels=(16, 32, 64, 128), conv_dim=64, mask_dim=32,
                        gn_groups=8, enc_layers=1, enc_heads=4, enc_ffn=128)
    # text dims: lang_proj output must match decoder hidden for token feeding
    text_cfg = TextEncoderConfig(vocab_size=64, width=32, heads=4, layers=1,
                                 context_length=dec_cfg.contxt_len, dim_lang=64)
    fn_p = init_focalnet_params(fn_cfg, jax.random.PRNGKey(0))
    fpn_p = init_fpn_params(fpn_cfg, jax.random.PRNGKey(1))
    dec_p = init_xdecoder_params(dec_cfg, jax.random.PRNGKey(2))
    text_p = init_text_encoder_params(text_cfg, jax.random.PRNGKey(3))

    images = jax.random.normal(jax.random.PRNGKey(4), (1, 64, 64, 3))
    feats = focalnet_forward(fn_p, fn_cfg, images)
    mask_features, _, pyramid = fpn_forward(fpn_p, fpn_cfg, feats)

    def token_embedding_fn(ids):
        emb = jnp.take(text_p["token_embedding"], ids, axis=0)
        return emb @ text_p["lang_proj"]

    vocab_embs = jax.random.normal(jax.random.PRNGKey(9), (64, dec_cfg.dim_proj)) * 0.1
    ids = forward_captioning(dec_p, dec_cfg, pyramid, mask_features,
                             token_embedding_fn, vocab_embs, 49)
    assert ids.shape == (1, dec_cfg.contxt_len)
    assert int(ids[0, 0]) == 49                      # start token kept
    assert (np.asarray(ids) >= 0).all() and (np.asarray(ids) < 64).all()
    ids2 = forward_captioning(dec_p, dec_cfg, pyramid, mask_features,
                              token_embedding_fn, vocab_embs, 49)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids2))  # greedy deterministic

    # referring captioning (xdecoder.py:372-378): an all-False exclusion
    # mask is a no-op; excluding half the image changes what caption
    # tokens can see (and, with random weights, the decoded ids)
    no_mask = jnp.zeros((1, 64, 64), bool)
    ids3 = forward_captioning(dec_p, dec_cfg, pyramid, mask_features,
                              token_embedding_fn, vocab_embs, 49,
                              captioning_mask=no_mask)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids3))
    half = jnp.zeros((1, 64, 64), bool).at[:, :, 32:].set(True)
    ids4 = forward_captioning(dec_p, dec_cfg, pyramid, mask_features,
                              token_embedding_fn, vocab_embs, 49,
                              captioning_mask=half)
    assert not np.array_equal(np.asarray(ids), np.asarray(ids4))


def test_misc_utils():
    from cullavo_tpu.utils.misc import (ExponentialSmoothing,
                                        cast_batch_to_dtype, stable_hash)

    b = {"a": jnp.ones((2, 2), jnp.float32), "i": jnp.ones((2,), jnp.int32)}
    out = cast_batch_to_dtype(b, jnp.bfloat16)
    assert out["a"].dtype == jnp.bfloat16 and out["i"].dtype == jnp.int32
    assert stable_hash("cat") == stable_hash("cat") != stable_hash("dog")
    sm = ExponentialSmoothing(0.5)
    assert sm.update(2.0) == 2.0 and sm.update(4.0) == 3.0


def test_hf_clip_text_import_matches_hf():
    """HF CLIPTextModelWithProjection → our text transformer: pooled
    (projected, normalized) embeddings match — the VQA topic classifier's
    CLIP scoring path (LLaVAVQAVALPipeline.py:104-116)."""
    import numpy as np

    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection

    from cullavo_tpu.models.xdecoder.text_encoder import (clip_text_config,
                                                          forward_language,
                                                          import_hf_clip_text)

    hf_cfg = CLIPTextConfig(vocab_size=99, hidden_size=32, intermediate_size=64,
                            num_hidden_layers=2, num_attention_heads=4,
                            max_position_embeddings=77, projection_dim=24,
                            hidden_act="quick_gelu", eos_token_id=98,
                            bos_token_id=97, attn_implementation="eager")
    torch.manual_seed(3)
    hf = CLIPTextModelWithProjection(hf_cfg).eval().float()
    cfg = clip_text_config(width=32, heads=4, layers=2, dim_lang=24)
    params = import_hf_clip_text(
        {k: v.detach().numpy() for k, v in hf.state_dict().items()}, cfg)

    rng = np.random.default_rng(4)
    B, T = 3, 9
    ids = rng.integers(1, 90, size=(B, T)).astype(np.int64)
    ids[:, -1] = 98                         # eos = max id → argmax pooling
    mask = np.ones((B, T), np.int64)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask)).text_embeds.numpy()
    ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
    out = np.asarray(forward_language(params, cfg, jnp.asarray(ids),
                                      jnp.asarray(mask)))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-4)


def test_semantic_inference_argmax_matches_unfused():
    import numpy as np

    from cullavo_tpu.models.xdecoder.model import (semantic_inference,
                                                   semantic_inference_argmax)

    rng = np.random.default_rng(5)
    Q, C, H, W = 7, 4, 6, 5
    cls = jnp.asarray(rng.normal(size=(Q, C + 1)).astype(np.float32))
    masks = jnp.asarray(rng.normal(size=(Q, H, W)).astype(np.float32))
    ref = np.argmax(np.asarray(semantic_inference(cls, masks)), axis=0)
    out = np.asarray(semantic_inference_argmax(cls, masks))
    np.testing.assert_array_equal(out, ref)


def test_resize_bilinear_matmul_matches_jax_image():
    import numpy as np

    from cullavo_tpu.models.xdecoder.model import resize_bilinear_matmul

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(2, 3, 16, 12)).astype(np.float32))
    ref = jax.image.resize(x, (2, 3, 48, 36), method="bilinear")
    out = resize_bilinear_matmul(x, 48, 36)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # non-integer scale too
    ref2 = jax.image.resize(x, (2, 3, 21, 29), method="bilinear")
    out2 = resize_bilinear_matmul(x, 21, 29)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               atol=2e-5, rtol=2e-5)


def test_lap_jv_matches_scipy():
    """Device-side JV assignment = scipy optimum (total cost) across shapes,
    including rectangular and batched-with-padding via
    hungarian_match_device."""
    import numpy as np
    from scipy.optimize import linear_sum_assignment

    from cullavo_tpu.models.xdecoder.matcher import (hungarian_match_device,
                                                     lap_jv)

    rng = np.random.default_rng(17)
    for (N, Q) in ((1, 5), (4, 4), (7, 20), (20, 101)):
        cost = rng.normal(size=(N, Q)).astype(np.float32) * 3.0
        cols = np.asarray(lap_jv(jnp.asarray(cost)))
        assert len(set(cols.tolist())) == N, "assignment must be injective"
        r, c = linear_sum_assignment(cost)
        ref_total = cost[r, c].sum()
        total = cost[np.arange(N), cols].sum()
        np.testing.assert_allclose(total, ref_total, rtol=1e-5)

    # batched with per-row padding: compare against the host callback path
    B, Q, N = 3, 12, 6
    cost = rng.normal(size=(B, Q, N)).astype(np.float32)
    n_valid = np.array([6, 3, 0], np.int32)
    rows_d, valid_d = hungarian_match_device(jnp.asarray(cost),
                                             jnp.asarray(n_valid))
    rows_d, valid_d = np.asarray(rows_d), np.asarray(valid_d)
    for b in range(B):
        n = n_valid[b]
        assert valid_d[b, :n].all() and not valid_d[b, n:].any()
        if n == 0:
            continue
        r, c = linear_sum_assignment(cost[b, :, :n])
        ref_total = cost[b][r, c].sum()
        total = cost[b][rows_d[b, :n], np.arange(n)].sum()
        np.testing.assert_allclose(total, ref_total, rtol=1e-5)


def test_panoptic_device_fusion_matches_host():
    """panoptic_inference_device + panoptic_assemble_host must reproduce
    panoptic_inference_host exactly (id maps up to identical seg-id
    assignment, identical segment lists) — the device-fused eval path ships
    two [H, W] maps + Q vectors instead of the [Q, H, W] logits."""
    from cullavo_tpu.models.xdecoder.model import (panoptic_assemble_host,
                                                   panoptic_inference_device,
                                                   panoptic_inference_host)

    rng = np.random.default_rng(3)
    Q, C, H, W = 12, 7, 24, 32
    thing_ids = {0, 2, 5}
    for trial in range(5):
        # pointy logits so several queries pass the keep threshold and
        # stuff classes repeat (exercising the stuff-merge path)
        mask_cls = np.asarray(rng.normal(size=(Q, C + 1)) * 4, np.float32)
        mask_pred = np.asarray(rng.normal(size=(Q, H, W)) * 2, np.float32)
        ref_pan, ref_segs = panoptic_inference_host(
            mask_cls, mask_pred, thing_ids, object_mask_threshold=0.3,
            overlap_threshold=0.6)
        dev = jax.jit(lambda c, m: panoptic_inference_device(
            c, m, object_mask_threshold=0.3))(jnp.asarray(mask_cls),
                                              jnp.asarray(mask_pred))
        pan, segs = panoptic_assemble_host(dev, thing_ids,
                                           overlap_threshold=0.6)
        np.testing.assert_array_equal(pan, ref_pan, err_msg=f"trial {trial}")
        assert segs == ref_segs, trial


def test_panoptic_device_valid_hw_restricts_areas():
    """With valid_hw the padded margin neither votes into the areas nor the
    id map — matching the host path's pre-cropped inputs."""
    from cullavo_tpu.models.xdecoder.model import (panoptic_assemble_host,
                                                   panoptic_inference_device,
                                                   panoptic_inference_host)

    rng = np.random.default_rng(4)
    Q, C, H, W, h, w = 8, 5, 32, 32, 20, 26
    thing_ids = {1}
    mask_cls = np.asarray(rng.normal(size=(Q, C + 1)) * 4, np.float32)
    full = np.asarray(rng.normal(size=(Q, H, W)) * 2, np.float32)
    ref_pan, ref_segs = panoptic_inference_host(
        mask_cls, full[:, :h, :w], thing_ids, object_mask_threshold=0.3,
        overlap_threshold=0.6)
    dev = panoptic_inference_device(jnp.asarray(mask_cls), jnp.asarray(full),
                                    object_mask_threshold=0.3,
                                    valid_hw=jnp.asarray([h, w]))
    pan, segs = panoptic_assemble_host(dev, thing_ids, overlap_threshold=0.6)
    np.testing.assert_array_equal(pan[:h, :w], ref_pan)
    assert segs == ref_segs
    assert (pan[h:, :] == 0).all() and (pan[:, w:] == 0).all()


def test_instance_device_fusion_matches_host():
    """instance_inference_device's bit-packed planes unpack to exactly the
    dense instance_inference outputs (masks, combined scores, classes)."""
    from cullavo_tpu.models.xdecoder.model import (instance_inference,
                                                   instance_inference_device,
                                                   unpack_mask_planes)

    rng = np.random.default_rng(5)
    Q, C, H, W, K = 10, 6, 16, 24, 37   # K spans >1 int32 plane
    mask_cls = np.asarray(rng.normal(size=(Q, C + 1)) * 2, np.float32)
    mask_pred = np.asarray(rng.normal(size=(Q, H, W)), np.float32)
    ref = instance_inference(jnp.asarray(mask_cls), jnp.asarray(mask_pred),
                             C, topk=K)
    dev = jax.jit(lambda c, m: instance_inference_device(
        c, m, C, topk=K))(jnp.asarray(mask_cls), jnp.asarray(mask_pred))
    masks = unpack_mask_planes(dev["mask_planes"], K)
    np.testing.assert_array_equal(masks, np.asarray(ref["masks"]) > 0.5)
    np.testing.assert_allclose(np.asarray(dev["scores"]),
                               np.asarray(ref["scores"]), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(dev["classes"]),
                                  np.asarray(ref["classes"]))


def test_instance_device_valid_hw_matches_cropped_host():
    from cullavo_tpu.models.xdecoder.model import (instance_inference,
                                                   instance_inference_device,
                                                   unpack_mask_planes)

    rng = np.random.default_rng(6)
    Q, C, H, W, h, w, K = 9, 5, 32, 32, 21, 27, 8
    mask_cls = np.asarray(rng.normal(size=(Q, C + 1)) * 2, np.float32)
    full = np.asarray(rng.normal(size=(Q, H, W)), np.float32)
    ref = instance_inference(jnp.asarray(mask_cls),
                             jnp.asarray(full[:, :h, :w]), C, topk=K)
    dev = instance_inference_device(jnp.asarray(mask_cls), jnp.asarray(full),
                                    C, topk=K, valid_hw=jnp.asarray([h, w]))
    masks = unpack_mask_planes(dev["mask_planes"], K)
    np.testing.assert_array_equal(masks[:, :h, :w],
                                  np.asarray(ref["masks"]) > 0.5)
    assert not masks[:, h:, :].any() and not masks[:, :, w:].any()
    np.testing.assert_allclose(np.asarray(dev["scores"]),
                               np.asarray(ref["scores"]), rtol=1e-5)
