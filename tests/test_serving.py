"""Continuous-batching serving engine tests.

The engine must be a pure scheduling layer: every request's token stream
equals the offline two-phase ``generate_prefill`` + ``generate_decode`` run
of that request alone (same bucket padding, same pool cache length) —
slot reuse, admission order, and quantum boundaries must not leak into the
numerics."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cullavo_tpu.models.llava.config import tiny_llava_config
from cullavo_tpu.models.llava.modeling import (GenerationConfig,
                                               generate_decode,
                                               generate_prefill,
                                               init_llava_params)
from cullavo_tpu.serving import Request, ServingEngine

VOCAB = 128


@pytest.fixture(scope="module")
def model():
    cfg = tiny_llava_config(VOCAB)
    params = init_llava_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _request(cfg, rng, req_id, text_len, max_new):
    n_img = cfg.num_image_tokens
    ids = rng.integers(3, VOCAB - 2, size=(1 + n_img + text_len,)).astype(np.int32)
    ids[1:1 + n_img] = cfg.image_token_id
    pix = rng.normal(size=(3, cfg.vision.image_size,
                           cfg.vision.image_size)).astype(np.float32)
    return Request(req_id=req_id, input_ids=ids, pixel_values=pix,
                   max_new_tokens=max_new)


def _offline(cfg, params, req, bucket, max_len, gen):
    """The reference stream: pad to the request's bucket, prefill alone,
    decode alone at the engine's cache length."""
    T = len(req.input_ids)
    ids = np.zeros((1, bucket), np.int32)
    mask = np.zeros((1, bucket), np.int32)
    ids[0, :T] = req.input_ids
    mask[0, :T] = 1
    state = generate_prefill(params, cfg, jnp.asarray(ids),
                             jnp.asarray(req.pixel_values[None]),
                             jnp.asarray(mask), max_len,
                             compute_dtype=jnp.float32)
    out = np.asarray(generate_decode(
        params, cfg, state,
        GenerationConfig(max_new_tokens=req.max_new_tokens,
                         do_sample=False, eos_token_id=gen.eos_token_id),
        compute_dtype=jnp.float32))[0]
    toks = []
    for t in out:
        toks.append(int(t))
        if int(t) == gen.eos_token_id:
            break
    return toks[:req.max_new_tokens]


def _buckets(cfg):
    n_img = cfg.num_image_tokens
    base = 1 + n_img
    return (base + 8, base + 16)


def test_serving_matches_offline(model):
    """Mixed prompt lengths and budgets, fewer slots than requests, small
    quantum: every emitted stream must equal the offline run token-for-token."""
    cfg, params = model
    rng = np.random.default_rng(0)
    buckets = _buckets(cfg)
    max_len = buckets[-1] + 12
    gen = GenerationConfig(do_sample=False, eos_token_id=-1)
    reqs = [
        _request(cfg, rng, 0, 3, 6),
        _request(cfg, rng, 1, 8, 10),
        _request(cfg, rng, 2, 14, 4),
        _request(cfg, rng, 3, 5, 12),
        _request(cfg, rng, 4, 15, 7),
        _request(cfg, rng, 5, 2, 1),    # finishes at admission
    ]
    eng = ServingEngine(params, cfg, gen, num_slots=3, max_len=max_len,
                        prompt_buckets=buckets, prefill_chunk=2, quantum=3,
                        compute_dtype=jnp.float32)
    for r in reqs:
        eng.submit(r)
    results = eng.run()
    assert set(results) == {r.req_id for r in reqs}
    for r in reqs:
        bucket = next(b for b in buckets if len(r.input_ids) <= b)
        ref = _offline(cfg, params, r, bucket, max_len, gen)
        assert results[r.req_id] == ref, (
            f"req {r.req_id}: engine {results[r.req_id]} != offline {ref}")


def test_serving_eos_retires_early(model):
    """A request whose stream hits EOS mid-quantum is trimmed at EOS and its
    slot is reused; the truncated stream equals the offline one."""
    cfg, params = model
    rng = np.random.default_rng(1)
    buckets = _buckets(cfg)
    max_len = buckets[-1] + 12
    probe = _request(cfg, rng, 0, 4, 10)
    # learn a token this request actually produces (greedy, deterministic),
    # then declare it EOS so the engine must early-stop exactly there
    free_run = _offline(cfg, params, probe, buckets[0], max_len,
                        GenerationConfig(do_sample=False, eos_token_id=-1))
    eos = free_run[2]
    gen = GenerationConfig(do_sample=False, eos_token_id=eos)
    reqs = [probe, _request(cfg, rng, 1, 9, 8)]
    eng = ServingEngine(params, cfg, gen, num_slots=2, max_len=max_len,
                        prompt_buckets=buckets, prefill_chunk=2, quantum=4,
                        compute_dtype=jnp.float32)
    for r in reqs:
        eng.submit(r)
    results = eng.run()
    for r in reqs:
        bucket = next(b for b in buckets if len(r.input_ids) <= b)
        ref = _offline(cfg, params, r, bucket, max_len, gen)
        assert results[r.req_id] == ref
    assert results[0][-1] == eos and len(results[0]) <= 10


def test_decode_quantum_uniform_matches_generate_decode(model):
    """The per-row scatter write path (vector write_idx) must equal the
    contiguous-slab path when all rows are uniform: decode_quantum on a
    fresh prefill == generate_decode tokens 2..k+1."""
    from cullavo_tpu.models.llava.modeling import decode_quantum

    cfg, params = model
    rng = np.random.default_rng(2)
    n_img = cfg.num_image_tokens
    T = 1 + n_img + 6
    ids = rng.integers(3, VOCAB - 2, size=(2, T)).astype(np.int32)
    ids[:, 1:1 + n_img] = cfg.image_token_id
    pix = rng.normal(size=(2, 3, cfg.vision.image_size,
                           cfg.vision.image_size)).astype(np.float32)
    mask = np.ones((2, T), np.int32)
    gen = GenerationConfig(max_new_tokens=9, do_sample=False, eos_token_id=-1)
    max_len = T + 9

    def fresh_state():
        return generate_prefill(params, cfg, jnp.asarray(ids),
                                jnp.asarray(pix), jnp.asarray(mask), max_len,
                                compute_dtype=jnp.float32)

    ref = np.asarray(generate_decode(params, cfg, fresh_state(), gen,
                                     compute_dtype=jnp.float32))
    state = fresh_state()
    first = jnp.argmax(state["logits"], axis=-1).astype(jnp.int32)
    first_np = np.asarray(first)        # before donation deletes it
    state["write_idx"] = jnp.full((2,), T, jnp.int32)     # vector → scatter path
    state["cur_tok"] = first
    state["done"] = jnp.zeros((2,), jnp.bool_)
    toks, _ = decode_quantum(params, cfg, state, gen, 8,
                             compute_dtype=jnp.float32)
    np.testing.assert_array_equal(first_np, ref[:, 0])
    np.testing.assert_array_equal(np.asarray(toks), ref[:, 1:9])


def test_serving_sharded_params_match_single_device(model):
    """Production serving shards the model over a mesh (TP/FSDP); the engine
    must produce identical streams with sharded params — sharding is a
    layout, never a numerics change."""
    from cullavo_tpu.parallel.mesh import MeshConfig, make_mesh, shard_params

    cfg, params = model
    rng = np.random.default_rng(3)
    buckets = _buckets(cfg)
    max_len = buckets[-1] + 10
    gen = GenerationConfig(do_sample=False, eos_token_id=-1)
    reqs = [_request(cfg, rng, i, tl, mn)
            for i, (tl, mn) in enumerate([(3, 6), (12, 9), (6, 4)])]

    def run(p, mesh=None):
        eng = ServingEngine(p, cfg, gen, num_slots=2, max_len=max_len,
                            prompt_buckets=buckets, prefill_chunk=2,
                            quantum=3, compute_dtype=jnp.float32)
        for r in reqs:
            eng.submit(r)
        if mesh is None:
            return eng.run()
        with mesh:
            return eng.run()

    ref = run(params)
    mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    sharded = shard_params(params, mesh)
    out = run(sharded, mesh)
    assert out == ref


def test_serving_rejects_duplicate_req_id(model):
    cfg, params = model
    rng = np.random.default_rng(4)
    buckets = _buckets(cfg)
    eng = ServingEngine(params, cfg,
                        GenerationConfig(do_sample=False, eos_token_id=-1),
                        num_slots=2, max_len=buckets[-1] + 8,
                        prompt_buckets=buckets, compute_dtype=jnp.float32)
    eng.submit(_request(cfg, rng, 7, 3, 4))
    with pytest.raises(ValueError, match="duplicate req_id 7"):
        eng.submit(_request(cfg, rng, 7, 5, 4))


def test_serving_batched_admission_and_latency(model):
    """write_slots (one dispatch per admission group, slot -1 = dropped)
    must admit identically to the per-request path, and the engine must
    expose TTFT/E2E latency stats for every request."""
    cfg, params = model
    rng = np.random.default_rng(5)
    buckets = _buckets(cfg)
    max_len = buckets[-1] + 10
    gen = GenerationConfig(do_sample=False, eos_token_id=-1)
    reqs = [_request(cfg, rng, i, tl, mn)
            for i, (tl, mn) in enumerate([(3, 6), (7, 1), (5, 8), (2, 5)])]
    eng = ServingEngine(params, cfg, gen, num_slots=2, max_len=max_len,
                        prompt_buckets=buckets, prefill_chunk=3, quantum=3,
                        compute_dtype=jnp.float32)
    eng._batched_admit = True  # force the write_slots path (opt-in by env)
    for r in reqs:
        eng.submit(r)
    results = eng.run()
    for r in reqs:
        bucket = next(b for b in buckets if len(r.input_ids) <= b)
        assert results[r.req_id] == _offline(cfg, params, r, bucket,
                                             max_len, gen)
    lat = eng.latency()
    assert lat["ttft"]["p50"] > 0 and lat["e2e"]["p95"] >= lat["ttft"]["p50"]
    assert all("done" in t for t in eng.times.values())


def test_open_loop_poisson_arrivals(model):
    """measure_open_loop: Poisson-timed submissions still produce the exact
    offline streams, and the latency stats cover every request."""
    cfg, params = model
    from cullavo_tpu.serving.benchmark import measure_open_loop

    rng = np.random.default_rng(6)
    buckets = _buckets(cfg)
    max_len = buckets[-1] + 10
    gen = GenerationConfig(do_sample=False, eos_token_id=-1)
    reqs = [_request(cfg, rng, i, tl, mn)
            for i, (tl, mn) in enumerate([(3, 6), (7, 4), (5, 8), (2, 5)])]

    engines = []

    def make_engine():
        eng = ServingEngine(params, cfg, gen, num_slots=2, max_len=max_len,
                            prompt_buckets=buckets, prefill_chunk=2,
                            quantum=3, compute_dtype=jnp.float32)
        engines.append(eng)
        return eng

    out = measure_open_loop(make_engine, reqs, rate_req_s=50.0)
    assert out["achieved_req_s"] > 0 and out["latency"]["e2e"]["p50"] > 0
    eng = engines[-1]
    assert set(eng.results) == {r.req_id for r in reqs}
    for r in reqs:
        bucket = next(b for b in buckets if len(r.input_ids) <= b)
        assert eng.results[r.req_id] == _offline(cfg, params, r, bucket,
                                                 max_len, gen)


def test_serving_spec_k_matches_plain_engine(model):
    """spec_k engine streams are token-exact vs the plain engine (and thus
    vs offline): prompt-lookup windows change only how many forwards a
    quantum takes, never the emitted greedy tokens.  Mixed budgets, slot
    reuse, and an oracle extra_hist row (guaranteed draft hits) included."""
    cfg, params = model
    rng = np.random.default_rng(11)
    buckets = _buckets(cfg)
    max_len = buckets[-1] + 14
    gen = GenerationConfig(do_sample=False, eos_token_id=-1)
    reqs = [
        _request(cfg, rng, 0, 4, 9),
        _request(cfg, rng, 1, 12, 6),
        _request(cfg, rng, 2, 7, 12),
        _request(cfg, rng, 3, 2, 4),
        _request(cfg, rng, 4, 15, 10),
    ]

    def run(spec_k, reqs):
        eng = ServingEngine(params, cfg, gen, num_slots=3, max_len=max_len,
                            prompt_buckets=buckets, prefill_chunk=2,
                            quantum=4, compute_dtype=jnp.float32,
                            spec_k=spec_k)
        for r in reqs:
            eng.submit(r)
        return eng.run()

    plain = run(None, reqs)
    spec = run(3, reqs)
    assert set(plain) == set(spec)
    for rid in plain:
        assert plain[rid] == spec[rid], rid

    # oracle corpus: seed one request's extra_hist with its own greedy
    # stream — every draft lands, stream still exact
    r = reqs[2]
    oracle = Request(req_id=99, input_ids=r.input_ids,
                     pixel_values=r.pixel_values,
                     max_new_tokens=r.max_new_tokens,
                     extra_hist=np.concatenate(
                         [[int(r.input_ids[-1])],
                          np.asarray(plain[2], np.int32)]).astype(np.int32))
    out = run(4, [oracle])
    assert out[99] == plain[2]


def test_serving_spec_rejects_sampling(model):
    """spec + sampling no longer raises (serve.yaml ships SPEC_K by
    default): the engine downgrades to plain quanta — see
    test_spec_auto_disabled_under_sampling for the end-to-end check."""
    cfg, params = model
    eng = ServingEngine(params, cfg,
                        GenerationConfig(do_sample=True, eos_token_id=-1),
                        num_slots=2, max_len=64, prompt_buckets=(32,),
                        spec_k=3)
    assert eng.spec_k is None


def test_spec_auto_disabled_under_sampling(model, capsys):
    """serve.yaml ships SPEC_K 4 by default, so a config that merely flips
    DO_SAMPLE must not crash at engine init: spec (greedy-only) is
    auto-disabled with a warning and the engine still serves."""
    cfg, params = model
    rng = np.random.default_rng(7)
    buckets = _buckets(cfg)
    gen = GenerationConfig(do_sample=True, temperature=1.0, eos_token_id=-1)
    eng = ServingEngine(params, cfg, gen, num_slots=2,
                        max_len=buckets[-1] + 8, prompt_buckets=buckets,
                        prefill_chunk=1, quantum=2,
                        compute_dtype=jnp.float32, spec_k=4)
    assert eng.spec_k is None
    eng.submit(_request(cfg, rng, 0, 3, 4))
    results = eng.run()
    assert len(results[0]) == 4


def test_engine_derates_slots_to_hbm_budget(model, monkeypatch):
    """A pool that cannot fit next to the weights derates num_slots with a
    warning instead of OOMing at the first quantum (the bf16-KV + spec
    128-rounded-cache failure mode, STATUS round 4); a budget too small for
    even one slot fails fast with the numbers."""
    cfg, params = model
    rng = np.random.default_rng(9)
    buckets = _buckets(cfg)
    gen = GenerationConfig(do_sample=False, eos_token_id=-1)

    probe = ServingEngine(params, cfg, gen, num_slots=4,
                          max_len=buckets[-1] + 8, prompt_buckets=buckets,
                          prefill_chunk=1, quantum=2,
                          compute_dtype=jnp.float32)
    per_slot = probe._pool_bytes_per_slot()
    weights = sum(getattr(v, "nbytes", 0) for v in jax.tree.leaves(params))

    # budget sized for exactly 2 slots after the 8% margin
    # (prefix_cache off so the prefix-registry reservation — max_prefixes
    # pool rows, also part of the fit since round 5 — doesn't shift the
    # arithmetic this test pins)
    monkeypatch.setenv("CULLAVO_SERVE_HBM_GB",
                       str((weights + 2.5 * per_slot) / 0.92 / 1e9))
    eng = ServingEngine(params, cfg, gen, num_slots=4,
                        max_len=buckets[-1] + 8, prompt_buckets=buckets,
                        prefill_chunk=1, quantum=2,
                        compute_dtype=jnp.float32, prefix_cache=False)
    assert eng.num_slots == 2 and len(eng.free) == 2
    for i in range(3):
        eng.submit(_request(cfg, rng, i, 3, 4))
    results = eng.run()
    assert sorted(results) == [0, 1, 2]
    assert all(len(v) == 4 for v in results.values())

    monkeypatch.setenv("CULLAVO_SERVE_HBM_GB",
                       str(weights / 0.92 / 1e9))
    with pytest.raises(ValueError, match="decode pool cannot fit"):
        ServingEngine(params, cfg, gen, num_slots=4,
                      max_len=buckets[-1] + 8, prompt_buckets=buckets,
                      prefill_chunk=1, quantum=2, compute_dtype=jnp.float32,
                      prefix_cache=False)
