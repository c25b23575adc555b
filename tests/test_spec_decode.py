"""Speculative decode (prompt-lookup drafting) tests.

The exactness contract: ``generate_decode_spec`` must emit the SAME token
stream as plain greedy ``generate_decode`` for every prompt — drafting only
changes how many forwards it takes (a draft token is kept only when it
equals the argmax the model would have produced).  The reference has no
speculation (HF batch-1 greedy, pipeline/LLaVAVQAVALPipeline.py:171-180);
this is a TPU-native serving extension.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cullavo_tpu.models.llava.config import tiny_llava_config
from cullavo_tpu.models.llava.modeling import (GenerationConfig,
                                               generate_decode,
                                               generate_decode_spec,
                                               generate_prefill,
                                               init_llava_params)

VOCAB = 128


@pytest.fixture(scope="module")
def model():
    cfg = tiny_llava_config(VOCAB)
    params = init_llava_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _batch(cfg, rng, text_lens, bucket):
    """Right-padded multimodal prompt batch with per-row valid lengths."""
    n_img = cfg.num_image_tokens
    B = len(text_lens)
    ids = np.zeros((B, bucket), np.int32)
    mask = np.zeros((B, bucket), np.int32)
    for b, tl in enumerate(text_lens):
        T = 1 + n_img + tl
        row = rng.integers(3, VOCAB - 2, size=(T,)).astype(np.int32)
        row[1:1 + n_img] = cfg.image_token_id
        ids[b, :T] = row
        mask[b, :T] = 1
    pix = rng.normal(size=(B, 3, cfg.vision.image_size,
                           cfg.vision.image_size)).astype(np.float32)
    return jnp.asarray(ids), jnp.asarray(pix), jnp.asarray(mask)


def _greedy(cfg, params, ids, pix, mask, gen, max_len, kv_quant=None):
    state = generate_prefill(params, cfg, ids, pix, mask, max_len,
                             compute_dtype=jnp.float32, kv_quant=kv_quant)
    return np.asarray(generate_decode(params, cfg, state, gen,
                                      compute_dtype=jnp.float32))


def _spec(cfg, params, ids, pix, mask, gen, max_len, spec_k,
          kv_quant=None, extra_hist=None):
    state = generate_prefill(params, cfg, ids, pix, mask, max_len,
                             compute_dtype=jnp.float32, kv_quant=kv_quant)
    toks, stats = generate_decode_spec(
        params, cfg, state, gen, spec_k, ids, jnp.sum(mask, axis=1),
        compute_dtype=jnp.float32, extra_hist=extra_hist)
    return np.asarray(toks), jax.device_get(stats)


@pytest.mark.parametrize("spec_k", [2, 4])
def test_spec_equals_greedy(model, spec_k):
    """Random prompts (arbitrary acceptance), right-padded batch: the spec
    stream must equal plain greedy token-for-token, eos fill included."""
    cfg, params = model
    rng = np.random.default_rng(0)
    ids, pix, mask = _batch(cfg, rng, [4, 9, 1], bucket=1 + cfg.num_image_tokens + 10)
    max_len = ids.shape[1] + 16
    gen = GenerationConfig(max_new_tokens=11, do_sample=False, eos_token_id=-1)
    ref = _greedy(cfg, params, ids, pix, mask, gen, max_len)
    out, stats = _spec(cfg, params, ids, pix, mask, gen, max_len, spec_k)
    np.testing.assert_array_equal(out, ref)
    assert int(stats["windows"]) >= 1
    # every window emits at least one token per live row
    assert int(stats["emitted"]) >= int(stats["windows"])
    # return_state variant (the donation-aliasing form) emits the same stream
    state = generate_prefill(params, cfg, ids, pix, mask, max_len,
                             compute_dtype=jnp.float32)
    out2, _, fin = generate_decode_spec(
        params, cfg, state, gen, spec_k, ids, jnp.sum(mask, axis=1),
        compute_dtype=jnp.float32, return_state=True)
    np.testing.assert_array_equal(np.asarray(out2), ref)
    assert fin["cache"]["k"].shape == fin["cache"]["v"].shape


def test_spec_eos_early_stop(model):
    """A token the greedy stream actually produces is declared EOS: the spec
    stream must stop exactly there and pad with EOS, like generate_decode."""
    cfg, params = model
    rng = np.random.default_rng(1)
    ids, pix, mask = _batch(cfg, rng, [5, 7], bucket=1 + cfg.num_image_tokens + 8)
    max_len = ids.shape[1] + 12
    free = _greedy(cfg, params, ids, pix, mask,
                   GenerationConfig(max_new_tokens=8, do_sample=False,
                                    eos_token_id=-1), max_len)
    eos = int(free[0, 3])   # forces a mid-stream stop on row 0
    gen = GenerationConfig(max_new_tokens=8, do_sample=False, eos_token_id=eos)
    ref = _greedy(cfg, params, ids, pix, mask, gen, max_len)
    out, _ = _spec(cfg, params, ids, pix, mask, gen, max_len, spec_k=3)
    np.testing.assert_array_equal(out, ref)


def test_spec_int8_kv(model):
    """The quantized-cache decode path takes the same speculative window
    (spec and non-spec write identical per-vector-quantized k/v)."""
    cfg, params = model
    rng = np.random.default_rng(2)
    ids, pix, mask = _batch(cfg, rng, [6, 3], bucket=1 + cfg.num_image_tokens + 8)
    max_len = ids.shape[1] + 10
    gen = GenerationConfig(max_new_tokens=7, do_sample=False, eos_token_id=-1)
    ref = _greedy(cfg, params, ids, pix, mask, gen, max_len, kv_quant="int8")
    out, _ = _spec(cfg, params, ids, pix, mask, gen, max_len, spec_k=3,
                   kv_quant="int8")
    np.testing.assert_array_equal(out, ref)


def test_spec_oracle_acceptance(model):
    """``extra_hist`` seeded with the true continuation (the prompt-lookup
    ceiling: a perfectly repetitive context): near-every draft is accepted,
    so max_new tokens take ~max_new/spec_k windows — and the stream is still
    exactly the greedy one."""
    cfg, params = model
    rng = np.random.default_rng(3)
    bucket = 1 + cfg.num_image_tokens + 6
    ids, pix, mask = _batch(cfg, rng, [6], bucket=bucket)
    max_new, spec_k = 12, 4
    max_len = bucket + max_new + spec_k
    gen = GenerationConfig(max_new_tokens=max_new, do_sample=False,
                           eos_token_id=-1)
    ref = _greedy(cfg, params, ids, pix, mask, gen, max_len)
    # oracle corpus: [last prompt token, true continuation] — the bigram
    # lookup then always finds the next tokens
    last_prompt = np.asarray(ids)[0, int(np.sum(np.asarray(mask)[0])) - 1]
    extra = np.concatenate([[last_prompt], ref[0]]).astype(np.int32)[None]
    out, stats = _spec(cfg, params, ids, pix, mask, gen, max_len, spec_k,
                       extra_hist=jnp.asarray(extra))
    np.testing.assert_array_equal(out, ref)
    # 12 tokens at spec_k=4: first token free + ceil(11/4)=3 windows if every
    # draft lands; allow one extra window of slack
    assert int(stats["windows"]) <= 4, stats


def test_spec_rejects_sampling(model):
    cfg, params = model
    rng = np.random.default_rng(4)
    ids, pix, mask = _batch(cfg, rng, [2], bucket=1 + cfg.num_image_tokens + 4)
    state = generate_prefill(params, cfg, ids, pix, mask, ids.shape[1] + 4,
                             compute_dtype=jnp.float32)
    with pytest.raises(ValueError, match="greedy-only"):
        generate_decode_spec(params, cfg, state,
                             GenerationConfig(do_sample=True), 2,
                             ids, jnp.sum(mask, axis=1),
                             compute_dtype=jnp.float32)


def test_spec_window_attention_matches_sequential_int8_cache():
    """The verification window's intra-window attention over an int8 cache
    must see draft keys/values through the SAME quantized compute path a
    sequential decode would read them back from the cache with — otherwise
    near-tie argmaxes can diverge between the speculative and plain greedy
    streams (the ``win_q8`` contract of ``sdpa_decode_stale_smajor_q8``)."""
    from cullavo_tpu.models.llava.llama import (NEG_INF, quantize_kv,
                                                sdpa_decode_stale_smajor_q8)

    rng = np.random.default_rng(7)
    B, H, KV, hd, S0, W = 2, 4, 2, 8, 6, 3
    S = S0 + W
    n_rep = H // KV

    def f32(*shape):
        return jnp.asarray(rng.normal(size=shape), jnp.float32)

    # pre-window cache (quantized), window q/k/v full precision
    kq0, ks0 = quantize_kv(f32(S0, B, KV, hd))
    vq0, vs0 = quantize_kv(f32(S0, B, KV, hd))
    q = f32(B, H, W, hd)
    k_w = f32(W, B, KV, hd)           # window keys, S-major like the cache
    v_w = f32(W, B, KV, hd)
    kwq, kws = quantize_kv(k_w)
    vwq, vws = quantize_kv(v_w)

    def pad_cache(kq, ks, vq, vs, upto):
        z = jnp.zeros((S - kq.shape[0], B, KV, hd), jnp.int8)
        zs = jnp.zeros((S - ks.shape[0], B, KV), jnp.bfloat16)
        return (jnp.concatenate([kq, z]), jnp.concatenate([ks, zs]),
                jnp.concatenate([vq, z]), jnp.concatenate([vs, zs]))

    def rep(x):
        return jnp.repeat(x.transpose(1, 2, 0, 3), n_rep, axis=1)  # [B,H,W,hd]

    # window verify: base cache only, win slots masked, drafts via win_q8
    bias_w = jnp.where(jnp.arange(S)[None, None, None, :] < S0, 0.0, NEG_INF)
    out_win = sdpa_decode_stale_smajor_q8(
        q, *pad_cache(kq0, ks0, vq0, vs0, S0), rep(k_w), rep(v_w),
        bias_w, n_rep=n_rep, win_q8=(kwq, kws, vwq, vws))

    # sequential: step i reads slots < S0+i from the cache (window drafts
    # j < i already written quantized), its own k/v fresh
    for i in range(W):
        kq_i = jnp.concatenate([kq0, kwq[:i]])
        ks_i = jnp.concatenate([ks0, kws[:i]])
        vq_i = jnp.concatenate([vq0, vwq[:i]])
        vs_i = jnp.concatenate([vs0, vws[:i]])
        bias_i = jnp.where(jnp.arange(S)[None, None, None, :] < S0 + i,
                           0.0, NEG_INF)
        out_i = sdpa_decode_stale_smajor_q8(
            q[:, :, i:i + 1], *pad_cache(kq_i, ks_i, vq_i, vs_i, S0 + i),
            rep(k_w[i:i + 1]), rep(v_w[i:i + 1]), bias_i, n_rep=n_rep)
        np.testing.assert_allclose(np.asarray(out_win[:, :, i]),
                                   np.asarray(out_i[:, :, 0]),
                                   atol=2e-5, rtol=0)


@pytest.mark.parametrize("kv_quant", [None, "int8"])
def test_spec_wwin_kernel_wired_token_exact(model, kv_quant, monkeypatch):
    """CULLAVO_WWIN=1 routes the speculative verification forward through the
    fused W-window flash-decode kernel (ops/wwin_decode.py, interpret mode on
    CPU) — the emitted stream must still equal plain greedy token-for-token,
    for both cache dtypes.  The patch counter proves the kernel actually ran
    (the gate requires a 128-multiple cache length)."""
    from cullavo_tpu.ops import wwin_decode as ww

    cfg, params = model
    monkeypatch.setenv("CULLAVO_WWIN", "1")
    calls = {"n": 0}
    orig = (ww.wwin_decode_smajor if kv_quant is None
            else ww.wwin_decode_smajor_q8)
    name = ("wwin_decode_smajor" if kv_quant is None
            else "wwin_decode_smajor_q8")

    def counted(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(ww, name, counted)
    rng = np.random.default_rng(21)
    ids, pix, mask = _batch(cfg, rng, [5, 8, 2],
                            bucket=1 + cfg.num_image_tokens + 10)
    max_len = 128                       # the kernel's block_s granularity
    gen = GenerationConfig(max_new_tokens=9, do_sample=False, eos_token_id=-1)
    ref = _greedy(cfg, params, ids, pix, mask, gen, max_len,
                  kv_quant=kv_quant)
    out, _ = _spec(cfg, params, ids, pix, mask, gen, max_len, spec_k=3,
                   kv_quant=kv_quant)
    np.testing.assert_array_equal(out, ref)
    assert calls["n"] > 0, "wwin kernel was not used despite CULLAVO_WWIN=1"


def test_spec_wwin_engine_token_exact(model, monkeypatch):
    """The serving engine's spec path rides the wwin kernel when forced (the
    pool cache auto-rounds to 128 slots) and each stream stays token-exact vs
    the OFFLINE spec run through the same kernel (the engine contract every
    serving test uses).

    Seed note: the engine's quantum-chopped windows verify a given prefix at
    a different window offset than offline's continuous windows, so f32
    near-tie argmaxes can diverge between them on degenerate repeating
    streams — measured IDENTICALLY with the XLA window path (CULLAVO_WWIN=0)
    on seeds 22/25/26, i.e. a pre-existing documented caveat of window
    alignment, not a kernel property.  Seed 23 produces non-degenerate
    streams and is bitwise stable for both paths."""
    from cullavo_tpu.serving.engine import Request, ServingEngine

    cfg, params = model
    monkeypatch.setenv("CULLAVO_WWIN", "1")
    rng = np.random.default_rng(23)
    n_img = cfg.num_image_tokens
    bucket, spec_k = 24, 3

    def req(i, tl, budget):
        T = 1 + n_img + tl
        row = rng.integers(3, VOCAB - 2, size=(T,)).astype(np.int32)
        row[1:1 + n_img] = cfg.image_token_id
        pix = rng.normal(size=(3, cfg.vision.image_size,
                               cfg.vision.image_size)).astype(np.float32)
        return Request(req_id=i, input_ids=row, pixel_values=pix,
                       max_new_tokens=budget)

    reqs = [req(0, 4, 8), req(1, 9, 6), req(2, 2, 10), req(3, 7, 5)]
    gen = GenerationConfig(do_sample=False, eos_token_id=-1)
    eng = ServingEngine(params, cfg, gen, num_slots=3, max_len=70,
                        prompt_buckets=(bucket,), prefill_chunk=2,
                        quantum=4, compute_dtype=jnp.float32, spec_k=spec_k)
    assert eng.max_len % 128 == 0
    for r in reqs:
        eng.submit(r)
    got = eng.run()

    for r in reqs:
        ids = np.zeros((1, bucket), np.int32)
        mask = np.zeros((1, bucket), np.int32)
        ids[0, :len(r.input_ids)] = r.input_ids
        mask[0, :len(r.input_ids)] = 1
        out, _ = _spec(cfg, params, jnp.asarray(ids),
                       jnp.asarray(r.pixel_values[None]), jnp.asarray(mask),
                       GenerationConfig(max_new_tokens=r.max_new_tokens,
                                        do_sample=False, eos_token_id=-1),
                       eng.max_len, spec_k)
        assert got[r.req_id] == out[0].tolist()[:r.max_new_tokens], r.req_id


def test_spec_corpus_acceptance_bounds_and_extremes():
    """Model-free acceptance simulation (serving/spec_corpus): bounded by
    [1, spec_k]; an answer that copies a phrase already in the prompt is
    drafted near-perfectly, an unrelated random answer gets ~1."""
    import numpy as np

    from cullavo_tpu.serving.spec_corpus import measure_acceptance

    rng = np.random.default_rng(0)
    phrase = rng.integers(10, 200, size=(24,)).astype(np.int32)
    prompt = np.concatenate([rng.integers(10, 200, size=(40,)), phrase,
                             rng.integers(10, 200, size=(8,))]).astype(np.int32)
    copy_pair = (prompt, phrase.copy())           # answer = copy of the phrase
    rand_pair = (prompt,
                 rng.integers(210, 250, size=(24,)).astype(np.int32))

    hi = measure_acceptance([copy_pair], spec_k=4)
    lo = measure_acceptance([rand_pair], spec_k=4)
    assert 1.0 <= lo["tokens_per_forward"] <= 4.0
    assert 1.0 <= hi["tokens_per_forward"] <= 4.0
    assert hi["tokens_per_forward"] > 2.5         # near-perfect drafting
    assert lo["tokens_per_forward"] < 1.3         # nothing to look up


def test_spec_corpus_step1_pairs_shape():
    """The step1-synthesis corpus yields non-trivial (prompt, answer) pairs
    and a deterministic acceptance for a fixed seed."""
    from cullavo_tpu.serving.spec_corpus import measure_acceptance, step1_pairs

    pairs = step1_pairs(n_samples=4, seed=3)
    assert len(pairs) == 4
    for p, a in pairs:
        assert len(p) > 20 and len(a) >= 4
    r1 = measure_acceptance(pairs, spec_k=4)
    r2 = measure_acceptance(step1_pairs(n_samples=4, seed=3), spec_k=4)
    assert r1 == r2
    assert 1.0 <= r1["tokens_per_forward"] <= 4.0
