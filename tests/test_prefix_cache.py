"""Prefix-KV cache reuse tests (modeling.generate_prefill_prefix).

The serving engine caches the KV of a shared prompt head (system prompt,
or the whole image run for multi-question-per-image VQA) and later requests
prefill only their suffix — compute scales with the suffix length.  The
contract is TOKEN-EXACT reuse: same tokens, same positions, so the state
produced by prefix+suffix must be interchangeable with a full prefill of
the concatenated prompt (exact layout; attention numerics equal at f32 up
to reduction order).  Beyond the reference — its eval re-prefills the full
prompt per request (pipeline/LLaVAVQAVALPipeline.py:171-180).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cullavo_tpu.models.llava.config import tiny_llava_config
from cullavo_tpu.models.llava.modeling import (GenerationConfig,
                                               extract_prefix_state,
                                               generate_decode,
                                               generate_prefill,
                                               generate_prefill_prefix,
                                               init_llava_params)

VOCAB = 128


@pytest.fixture(scope="module")
def model():
    cfg = tiny_llava_config(VOCAB)
    params = init_llava_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _decode(cfg, params, state, n=8, eos=-1):
    gen = GenerationConfig(max_new_tokens=n, do_sample=False, eos_token_id=eos)
    return np.asarray(generate_decode(params, cfg, state, gen,
                                      compute_dtype=jnp.float32))


def _full_state(cfg, params, rows, pix, max_len, kv_quant=None):
    B = len(rows)
    T = max(len(r) for r in rows)
    ids = np.zeros((B, T), np.int32)
    mask = np.zeros((B, T), np.int32)
    for i, r in enumerate(rows):
        ids[i, :len(r)] = r
        mask[i, :len(r)] = 1
    return generate_prefill(params, cfg, jnp.asarray(ids),
                            None if pix is None else jnp.asarray(pix),
                            jnp.asarray(mask), max_len,
                            compute_dtype=jnp.float32, kv_quant=kv_quant)


@pytest.mark.parametrize("kv_quant", [None, "int8"])
def test_prefix_suffix_matches_full_prefill_text(model, kv_quant):
    """Text-only: two requests sharing a 12-token head; prefix+suffix decode
    streams equal the full-prefill streams token-for-token."""
    cfg, params = model
    rng = np.random.default_rng(0)
    head = rng.integers(4, VOCAB - 2, size=(12,)).tolist()
    tails = [rng.integers(4, VOCAB - 2, size=(n,)).tolist() for n in (5, 3)]
    rows = [head + t for t in tails]
    P, W = 12, 5
    max_len = P + W + 10

    ref_state = _full_state(cfg, params, rows, None, max_len, kv_quant)
    ref_toks = _decode(cfg, params, ref_state)

    pfx_state = _full_state(cfg, params, [head], None, max_len, kv_quant)
    prefix = extract_prefix_state(pfx_state, 0)
    sfx = np.zeros((2, W), np.int32)
    smask = np.zeros((2, W), np.int32)
    for i, t in enumerate(tails):
        sfx[i, :len(t)] = t
        smask[i, :len(t)] = 1
    state = generate_prefill_prefix(params, cfg, prefix, jnp.asarray(sfx),
                                    None, jnp.asarray(smask), P,
                                    compute_dtype=jnp.float32)
    # layout interchange: same write_idx, cur_pos, masks at valid slots
    assert int(state["write_idx"]) == P + W
    np.testing.assert_array_equal(np.asarray(state["cur_pos"]),
                                  [len(r) for r in rows])
    np.testing.assert_array_equal(
        np.asarray(state["full_mask"])[:, :P + W],
        np.asarray(ref_state["full_mask"])[:, :P + W])
    np.testing.assert_array_equal(
        np.asarray(state["key_pos"])[:, :P + W]
        * np.asarray(state["full_mask"])[:, :P + W],
        np.asarray(ref_state["key_pos"])[:, :P + W]
        * np.asarray(ref_state["full_mask"])[:, :P + W])
    toks = _decode(cfg, params, state)
    np.testing.assert_array_equal(toks, ref_toks)


def test_prefix_suffix_matches_full_prefill_image_in_suffix(model):
    """The image run rides in the suffix (multi-question-per-image layout
    where only the text head is shared): pixel merge must work through the
    stale-cache window path."""
    cfg, params = model
    rng = np.random.default_rng(1)
    n_img = cfg.num_image_tokens
    head = rng.integers(4, VOCAB - 2, size=(6,)).tolist()
    img_run = [cfg.image_token_id] * n_img
    tails = [rng.integers(4, VOCAB - 2, size=(n,)).tolist() for n in (4, 2)]
    rows = [head + img_run + t for t in tails]
    pix = rng.normal(size=(2, 3, cfg.vision.image_size,
                           cfg.vision.image_size)).astype(np.float32)
    P = 6
    W = n_img + 4
    max_len = P + W + 10

    ref_state = _full_state(cfg, params, rows, pix, max_len)
    ref_toks = _decode(cfg, params, ref_state)

    pfx_state = _full_state(cfg, params, [head], None, max_len)
    prefix = extract_prefix_state(pfx_state, 0)
    sfx = np.zeros((2, W), np.int32)
    smask = np.zeros((2, W), np.int32)
    for i, t in enumerate(tails):
        row = img_run + t
        sfx[i, :len(row)] = row
        smask[i, :len(row)] = 1
    state = generate_prefill_prefix(params, cfg, prefix, jnp.asarray(sfx),
                                    jnp.asarray(pix), jnp.asarray(smask), P,
                                    compute_dtype=jnp.float32)
    toks = _decode(cfg, params, state)
    np.testing.assert_array_equal(toks, ref_toks)


def test_prefix_reused_at_shorter_split(model):
    """A stored prefix longer than the reuse point: slots past prefix_len
    stay masked, so a 9-token stored prefix serves a P=6 split exactly."""
    cfg, params = model
    rng = np.random.default_rng(2)
    stored = rng.integers(4, VOCAB - 2, size=(9,)).tolist()
    P = 6
    tail = rng.integers(4, VOCAB - 2, size=(7,)).tolist()
    row = stored[:P] + tail
    max_len = 24

    ref_state = _full_state(cfg, params, [row], None, max_len)
    ref_toks = _decode(cfg, params, ref_state)

    pfx_state = _full_state(cfg, params, [stored], None, max_len)
    prefix = extract_prefix_state(pfx_state, 0)
    sfx = np.asarray([tail], np.int32)
    smask = np.ones_like(sfx)
    state = generate_prefill_prefix(params, cfg, prefix, jnp.asarray(sfx),
                                    None, jnp.asarray(smask), P,
                                    compute_dtype=jnp.float32)
    toks = _decode(cfg, params, state)
    np.testing.assert_array_equal(toks, ref_toks)


# ---------------------------------------------------------------------------
# engine-level prefix reuse
# ---------------------------------------------------------------------------

def _engine_request(cfg, rng, req_id, head, tail_len, max_new, pix):
    from cullavo_tpu.serving import Request

    tail = rng.integers(4, VOCAB - 2, size=(tail_len,)).tolist()
    ids = np.asarray(head + tail, np.int32)
    return Request(req_id=req_id, input_ids=ids, pixel_values=pix,
                   max_new_tokens=max_new)


def _offline_stream(cfg, params, req, bucket, max_len):
    ids = np.zeros((1, bucket), np.int32)
    mask = np.zeros((1, bucket), np.int32)
    T = len(req.input_ids)
    ids[0, :T] = req.input_ids
    mask[0, :T] = 1
    state = generate_prefill(
        params, cfg, jnp.asarray(ids),
        None if req.pixel_values is None else jnp.asarray(req.pixel_values[None]),
        jnp.asarray(mask), max_len, compute_dtype=jnp.float32)
    gen = GenerationConfig(max_new_tokens=req.max_new_tokens, do_sample=False,
                           eos_token_id=-1)
    out = np.asarray(generate_decode(params, cfg, state, gen,
                                     compute_dtype=jnp.float32))[0]
    return [int(t) for t in out][:req.max_new_tokens]


def test_engine_prefix_reuse_same_image(model):
    """Multi-question-per-image: 2 images x 3 questions each, shared
    SYSTEM+<image> head per image.  With the prefix cache on, questions 2-3
    of each image prefill only their suffix; every stream still equals the
    offline full-prefill run."""
    cfg, params = model
    from cullavo_tpu.serving import ServingEngine

    rng = np.random.default_rng(11)
    n_img = cfg.num_image_tokens
    sys_head = rng.integers(4, VOCAB - 2, size=(6,)).tolist()
    head = sys_head + [cfg.image_token_id] * n_img
    pixA = rng.normal(size=(3, cfg.vision.image_size,
                            cfg.vision.image_size)).astype(np.float32)
    pixB = rng.normal(size=(3, cfg.vision.image_size,
                            cfg.vision.image_size)).astype(np.float32)
    reqs = [
        _engine_request(cfg, rng, 0, head, 4, 6, pixA),
        _engine_request(cfg, rng, 1, head, 6, 5, pixA),
        _engine_request(cfg, rng, 2, head, 3, 6, pixA),
        _engine_request(cfg, rng, 3, head, 5, 4, pixB),
        _engine_request(cfg, rng, 4, head, 2, 6, pixB),
    ]
    bucket = len(head) + 8
    max_len = bucket + 16
    gen = GenerationConfig(do_sample=False, eos_token_id=-1)
    eng = ServingEngine(params, cfg, gen, num_slots=3, max_len=max_len,
                        prompt_buckets=(bucket,), prefill_chunk=2, quantum=3,
                        compute_dtype=jnp.float32,
                        prefix_cache=True, prefix_min=8,
                        suffix_buckets=(8, 16), max_prefixes=2)
    for r in reqs:
        eng.submit(r)
    results = eng.run()
    for r in reqs:
        assert results[r.req_id] == _offline_stream(cfg, params, r, bucket,
                                                    max_len), r.req_id
    # image A re-used twice, image B once (first request of each = miss)
    assert eng.counters["prefix_hits"] == 3
    assert eng.counters["prefix_misses"] == 2
    assert eng.counters["prefix_tokens_saved"] > 3 * len(sys_head)


def test_engine_prefix_reuse_text_corpus_and_eviction(model):
    """Text-only corpus sharing a 16-token system head; max_prefixes=1 with
    an interleaved image request forces LRU eviction — streams stay exact
    throughout."""
    cfg, params = model
    from cullavo_tpu.serving import ServingEngine

    rng = np.random.default_rng(12)
    head = rng.integers(4, VOCAB - 2, size=(16,)).tolist()
    pix = rng.normal(size=(3, cfg.vision.image_size,
                           cfg.vision.image_size)).astype(np.float32)
    img_head = [cfg.image_token_id] * cfg.num_image_tokens
    reqs = [
        _engine_request(cfg, rng, 0, head, 4, 5, None),
        _engine_request(cfg, rng, 1, head, 6, 5, None),
        _engine_request(cfg, rng, 2, img_head, 5, 4, pix),   # evicts the text prefix
        _engine_request(cfg, rng, 3, head, 3, 5, None),      # re-registers
        _engine_request(cfg, rng, 4, head, 5, 5, None),      # hits again
    ]
    buckets = (len(head) + 8, cfg.num_image_tokens + 8)
    max_len = max(buckets) + 16
    gen = GenerationConfig(do_sample=False, eos_token_id=-1)
    eng = ServingEngine(params, cfg, gen, num_slots=2, max_len=max_len,
                        prompt_buckets=buckets, prefill_chunk=1, quantum=2,
                        compute_dtype=jnp.float32,
                        prefix_cache=True, prefix_min=8,
                        suffix_buckets=(8, 16), max_prefixes=1)
    for r in reqs:
        eng.submit(r)
    results = eng.run()
    for r in reqs:
        b = next(x for x in buckets if len(r.input_ids) <= x)
        assert results[r.req_id] == _offline_stream(cfg, params, r, b,
                                                    max_len), r.req_id
    assert len(eng._prefix_reg) == 1
    assert eng.counters["prefix_hits"] >= 2


def test_engine_prefix_off_and_pacing(model):
    """prefix_cache=False keeps the round-4 behavior (no registry, no
    counters); admit_groups=1 pacing with more pending groups than one
    step admits still completes every request exactly."""
    cfg, params = model
    from cullavo_tpu.serving import ServingEngine

    rng = np.random.default_rng(13)
    head = rng.integers(4, VOCAB - 2, size=(12,)).tolist()
    reqs = [_engine_request(cfg, rng, i, head, 2 + i, 4, None)
            for i in range(5)]
    bucket = len(head) + 8
    max_len = bucket + 12
    gen = GenerationConfig(do_sample=False, eos_token_id=-1)
    eng = ServingEngine(params, cfg, gen, num_slots=4, max_len=max_len,
                        prompt_buckets=(bucket,), prefill_chunk=1, quantum=2,
                        compute_dtype=jnp.float32,
                        prefix_cache=False, admit_groups=1)
    for r in reqs:
        eng.submit(r)
    results = eng.run()
    for r in reqs:
        assert results[r.req_id] == _offline_stream(cfg, params, r, bucket,
                                                    max_len), r.req_id
    assert len(eng._prefix_reg) == 0
    assert eng.counters["prefix_hits"] == 0


def test_prefix_suffix_wwin_kernel_matches_xla(model, monkeypatch):
    """The suffix window through the wwin flash-decode kernel (interpret
    mode on CPU) must produce the same decode stream as the XLA stale
    window path — the default-on configuration for suffix widths ≤ 64."""
    cfg, params = model
    rng = np.random.default_rng(4)
    head = rng.integers(4, VOCAB - 2, size=(100,)).tolist()
    tail = rng.integers(4, VOCAB - 2, size=(20,)).tolist()
    P, W = 100, 24
    max_len = 256                  # 128-multiple: the kernel's S contract
    rows = [head + tail]

    pfx_state = _full_state(cfg, params, [head], None, max_len)
    prefix = extract_prefix_state(pfx_state, 0)
    sfx = np.zeros((1, W), np.int32)
    smask = np.zeros((1, W), np.int32)
    sfx[0, :len(tail)] = tail
    smask[0, :len(tail)] = 1

    # the env gate is read at TRACE time and jit caches ignore env vars —
    # clear the traced-program cache around each mode and COUNT kernel
    # invocations so the wwin run is provably not a stale-cache replay
    import cullavo_tpu.ops.wwin_decode as ww

    monkeypatch.setenv("CULLAVO_WWIN", "0")
    generate_prefill_prefix.clear_cache()
    st_xla = generate_prefill_prefix(params, cfg, prefix, jnp.asarray(sfx),
                                     None, jnp.asarray(smask), P,
                                     compute_dtype=jnp.float32)
    toks_xla = _decode(cfg, params, st_xla)

    calls = {"n": 0}
    orig = ww.wwin_decode_smajor

    def counted(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(ww, "wwin_decode_smajor", counted)
    monkeypatch.setenv("CULLAVO_WWIN", "1")
    monkeypatch.setenv("CULLAVO_WWIN_MAXW", "64")
    generate_prefill_prefix.clear_cache()
    st_win = generate_prefill_prefix(params, cfg, prefix, jnp.asarray(sfx),
                                     None, jnp.asarray(smask), P,
                                     compute_dtype=jnp.float32)
    toks_win = _decode(cfg, params, st_win)
    assert calls["n"] > 0, "wwin kernel unused despite CULLAVO_WWIN=1"
    np.testing.assert_array_equal(toks_win, toks_xla)

    ref_state = _full_state(cfg, params, rows, None, max_len)
    np.testing.assert_array_equal(toks_xla, _decode(cfg, params, ref_state))


def test_engine_prefix_never_splits_image_run(model):
    """A tight pool cache can force the reuse point BELOW the LCP; it must
    never land inside the image-token run (the suffix forward ranks image
    slots from 0 — a split would feed the trailing image tokens the wrong
    features and silently corrupt the stream).  The plan clamps to the run
    start instead; streams stay exactly offline-equal."""
    cfg, params = model
    from cullavo_tpu.serving import ServingEngine

    rng = np.random.default_rng(21)
    n_img = cfg.num_image_tokens
    sys_head = rng.integers(4, VOCAB - 2, size=(6,)).tolist()
    head = sys_head + [cfg.image_token_id] * n_img   # image run = [6, 6+n_img)
    pix = rng.normal(size=(3, cfg.vision.image_size,
                           cfg.vision.image_size)).astype(np.float32)
    max_new = 4
    reqs = [_engine_request(cfg, rng, 0, head, 5, max_new, pix),
            _engine_request(cfg, rng, 1, head, 3, max_new, pix)]
    bucket = len(head) + 8
    wb = 16
    # cache sized so the raw reuse cap = max_len - wb - max_new lands INSIDE
    # the image run (between 6 and 6 + n_img)
    max_len = wb + max_new + 6 + n_img // 2
    assert 6 < max_len - wb - max_new < 6 + n_img
    gen = GenerationConfig(do_sample=False, eos_token_id=-1)
    eng = ServingEngine(params, cfg, gen, num_slots=2, max_len=max_len,
                        prompt_buckets=(bucket,), prefill_chunk=1, quantum=2,
                        compute_dtype=jnp.float32,
                        prefix_cache=True, prefix_min=4,
                        suffix_buckets=(wb,), max_prefixes=2)
    for r in reqs:
        eng.submit(r)
    results = eng.run()
    for r in reqs:
        assert results[r.req_id] == _offline_stream(cfg, params, r, bucket,
                                                    max_len), r.req_id
    # the second request DID reuse (P clamped to the run start, not full)
    assert eng.counters["prefix_hits"] == 1


def test_engine_text_only_requests_do_not_serialize_admission(model):
    """All text-only requests share the (None, adapter) registry key; the
    same-key deferral must NOT push unrelated prompts (tiny LCP — no reuse
    possible) out of full-prefill groups, or admission degrades to one row
    per group."""
    cfg, params = model
    from cullavo_tpu.serving import ServingEngine

    rng = np.random.default_rng(22)
    reqs = [_engine_request(cfg, rng, i,
                            rng.integers(4, VOCAB - 2, size=(40,)).tolist(),
                            3, 4, None)
            for i in range(4)]
    bucket = 48
    gen = GenerationConfig(do_sample=False, eos_token_id=-1)
    eng = ServingEngine(params, cfg, gen, num_slots=4, max_len=bucket + 8,
                        prompt_buckets=(bucket,), prefill_chunk=4, quantum=2,
                        compute_dtype=jnp.float32,
                        prefix_cache=True, prefix_min=32)
    for r in reqs:
        eng.submit(r)
    results = eng.run()
    for r in reqs:
        assert results[r.req_id] == _offline_stream(cfg, params, r, bucket,
                                                    eng.max_len), r.req_id
    # one 4-row prefill group (pow2), not four 1-row groups
    assert eng.counters["prefill_rows"] == 4
    assert eng.counters["prefix_hits"] == 0
