"""W8A8 activation calibration (ops/calibrate.py): stats collection through
the model's own forward, SmoothQuant scale derivation, static outlier
selection, and the one-call calibrate→quantize path."""
import jax
import jax.numpy as jnp
import numpy as np

from cullavo_tpu.models.llava.config import tiny_llava_config
from cullavo_tpu.models.llava.modeling import init_llava_params, llava_forward
from cullavo_tpu.ops.calibrate import (calibrate_and_quantize_llm,
                                       collect_llm_act_stats,
                                       outlier_idx_from_stats,
                                       smooth_scales_from_stats)


def _batches(cfg, n=2, B=2, T=9, with_image=False, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        ids = rng.integers(4, 120, size=(B, T)).astype(np.int32)
        batch = {"input_ids": ids, "attention_mask": np.ones((B, T), np.int32),
                 "pixel_values": None}
        if with_image:
            n_img = cfg.num_image_tokens
            ids[:, 1:1 + n_img] = cfg.image_token_id
            batch["pixel_values"] = rng.normal(size=(
                B, 3, cfg.vision.image_size, cfg.vision.image_size)
            ).astype(np.float32)
        out.append(batch)
    return out


def test_collect_act_stats_shapes_and_monotonicity():
    cfg = tiny_llava_config(128)
    params = init_llava_params(cfg, jax.random.PRNGKey(0))
    stats = collect_llm_act_stats(params, cfg, _batches(cfg), jnp.float32)
    L = cfg.text.num_hidden_layers
    D = cfg.text.hidden_size
    H = cfg.text.num_attention_heads * cfg.text.head_dim
    inner = cfg.text.intermediate_size
    assert stats["attn_in"].shape == (L, D)
    assert stats["attn_out"].shape == (L, H)
    assert stats["mlp_in"].shape == (L, D)
    assert stats["mlp_down"].shape == (L, inner)
    assert all((v > 0).all() for v in stats.values())
    # elementwise-max across batches: a superset of batches never shrinks
    stats1 = collect_llm_act_stats(params, cfg, _batches(cfg, n=1),
                                   jnp.float32)
    assert all((stats[k] >= stats1[k] - 1e-6).all() for k in stats)


def test_calibrated_quantization_forward_parity():
    """calibrate→quantize params run the model close to the plain-int8
    exact path, and the smooth scales actually land in the dicts."""
    cfg = tiny_llava_config(128)
    params = init_llava_params(cfg, jax.random.PRNGKey(0))
    q = calibrate_and_quantize_llm(params, cfg, _batches(cfg),
                                   compute_dtype=jnp.float32)
    layers = q["language_model"]["layers"]
    assert "sq_inv" in layers["q"] and "sq_inv" in layers["down"]
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(4, 120, size=(2, 9)))
    mask = jnp.ones((2, 9), jnp.int32)
    full, _ = llava_forward(params, cfg, ids, None, mask)
    quant, _ = llava_forward(q, cfg, ids, None, mask)
    agree = (jnp.argmax(full, -1) == jnp.argmax(quant, -1)).mean()
    assert float(agree) > 0.85, float(agree)


def test_outlier_idx_from_stats_thresholding():
    L, D = 3, 16
    stats = {"attn_in": np.ones((L, D), np.float32),
             "attn_out": np.ones((L, D), np.float32),
             "mlp_in": np.ones((L, D), np.float32),
             "mlp_down": np.ones((L, D), np.float32)}
    stats["attn_in"][1, 5] = 9.0
    stats["attn_in"][2, 11] = 7.0
    stats["mlp_down"][0, 3] = 6.5
    idx = outlier_idx_from_stats(stats)
    np.testing.assert_array_equal(idx["q"], [5, 11])
    np.testing.assert_array_equal(idx["k"], [5, 11])
    np.testing.assert_array_equal(idx["down"], [3])
    assert "o" not in idx and "gate" not in idx
    # budget: keep the largest columns when over max_outliers
    idx = outlier_idx_from_stats(stats, max_outliers=1)
    np.testing.assert_array_equal(idx["q"], [5])


def test_smooth_scales_shapes_and_effect():
    cfg = tiny_llava_config(128)
    params = init_llava_params(cfg, jax.random.PRNGKey(0))
    stats = collect_llm_act_stats(params, cfg, _batches(cfg), jnp.float32)
    scales = smooth_scales_from_stats(stats, params)
    layers = params["language_model"]["layers"]
    for t, s in scales.items():
        assert s.shape == layers[t].shape[:-1], t
        assert (s > 0).all()


def test_group_scale_mismatch_rejected():
    """quantize_llm_weights must refuse per-member smooth scales for a
    group (q/k/v) — the grouped s8s8 path quantizes the shared input with
    qs[0]'s sq_inv, so distinct scales silently corrupt k/v outputs."""
    import pytest

    from cullavo_tpu.models.llava.lora import quantize_llm_weights

    cfg = tiny_llava_config(120)
    params = init_llava_params(cfg, jax.random.PRNGKey(0))
    L, K = params["language_model"]["layers"]["q"].shape[:2]
    good = np.ones((L, K), np.float32)
    bad = dict(q=good, k=good * 2.0, v=good)
    with pytest.raises(ValueError, match="group"):
        quantize_llm_weights(params, bits=8, smooth_scales=bad)
    # shared scales pass
    quantize_llm_weights(params, bits=8,
                         smooth_scales=dict(q=good, k=good, v=good))


def test_nk_layout_rejects_calibration():
    import pytest

    from cullavo_tpu.ops.nf4 import quantize_linear_int8

    w = jnp.asarray(np.random.default_rng(0).normal(size=(16, 8)),
                    jnp.float32)
    with pytest.raises(ValueError, match="nk"):
        quantize_linear_int8(w, layout="nk",
                             smooth_scale=np.ones(16, np.float32))
    with pytest.raises(ValueError, match="nk"):
        quantize_linear_int8(w, layout="nk",
                             outlier_idx=np.array([1], np.int32))


def test_s8s8_mode_env_validation(monkeypatch):
    """Unknown CULLAVO_INT8_S8S8 values raise a clear error from BOTH
    policy entry points (they used to diverge: KeyError vs silently-on)."""
    import pytest

    from cullavo_tpu.ops import nf4

    monkeypatch.setenv("CULLAVO_INT8_S8S8", "true")
    x = jnp.ones((4, 8), jnp.float32)
    q = nf4.quantize_linear_int8(jnp.ones((8, 4), jnp.float32))
    with pytest.raises(ValueError, match="CULLAVO_INT8_S8S8"):
        nf4.int8_linear_policy(x, q)
    with pytest.raises(ValueError, match="CULLAVO_INT8_S8S8"):
        nf4.s8s8_group_enabled((q, q), x)


def test_maybe_quantize_base_guard():
    """maybe_quantize_base quantizes once and no-ops on re-entry (the
    entry + pipeline both call it; double quantization must be impossible)."""
    from cullavo_tpu.models.llava.lora import maybe_quantize_base

    cfg = tiny_llava_config(120)
    params = init_llava_params(cfg, jax.random.PRNGKey(0))
    q1 = maybe_quantize_base(params, 8)
    assert isinstance(q1["language_model"]["layers"]["q"], dict)
    q2 = maybe_quantize_base(q1, 8)
    assert q2 is q1
    assert maybe_quantize_base(params, 0) is params


def test_maybe_quantize_base_host_numpy_nf4():
    """The checkpoint-import path hands maybe_quantize_base HOST (numpy)
    weights: planar-eligible targets must be encoded by the native C++
    quantizer (bit-identical to the numpy reference) without any device
    round-trip of the f32 originals, and the result must dequantize like
    quantize_linear_planar's."""
    import numpy as np

    from cullavo_tpu.models.llava.lora import LLM_TARGETS, maybe_quantize_base
    from cullavo_tpu.ops.nf4 import quantize_linear_planar_numpy

    rng = np.random.default_rng(0)
    layers = {t: rng.normal(size=(2, 16, 64)).astype(np.float32)
              for t in LLM_TARGETS}
    params = {"language_model": {"layers": dict(layers),
                                 "norm": np.ones((16,), np.float32)}}
    out = maybe_quantize_base(params, 4)
    for t in LLM_TARGETS:
        q = out["language_model"]["layers"][t]
        assert isinstance(q, dict), t
        ref = quantize_linear_planar_numpy(layers[t])
        for key in ref:
            np.testing.assert_array_equal(np.asarray(q[key]),
                                          np.asarray(ref[key]),
                                          err_msg=f"{t}/{key}")
    # untouched leaves pass through
    np.testing.assert_array_equal(
        np.asarray(out["language_model"]["norm"]), params["language_model"]["norm"])
    # re-entry no-ops
    assert maybe_quantize_base(out, 4) is out
