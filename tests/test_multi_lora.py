"""Per-request multi-adapter serving (S-LoRA-style).

The multi-stacked adapter path must be a pure batching construct: a batch
whose rows all pick adapter k equals the single-stacked run with adapter k,
mixed batches equal per-row single runs, and the serving engine with
per-request ``adapter_id`` streams token-exact vs the offline generate with
that request's adapter.  Capability context: the reference holds two PEFT
adapter sets (step1 + 'step2', load_cullavo.py:23-59) but can only activate
one per forward; here each request selects its own.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cullavo_tpu.models.llava.config import tiny_llava_config
from cullavo_tpu.models.llava.lora import (LoraConfig, init_lora_params,
                                           stack_adapter_sets)
from cullavo_tpu.models.llava.modeling import (GenerationConfig,
                                               generate_decode,
                                               generate_prefill,
                                               init_llava_params,
                                               llava_forward)
from cullavo_tpu.serving import Request, ServingEngine

VOCAB = 128
SCALING = 0.25


@pytest.fixture(scope="module")
def model():
    cfg = tiny_llava_config(VOCAB)
    params = init_llava_params(cfg, jax.random.PRNGKey(0))
    lora_cfg = LoraConfig(r=4, alpha=1.0)
    sets = []
    for k in range(3):
        full = init_lora_params(params, cfg, lora_cfg, jax.random.PRNGKey(10 + k))
        lm = full["language_model"]
        # make adapters ACT (init_lora_params zeroes b, PEFT-style): random b
        lm = jax.tree.map(lambda a: a, lm)
        for tgt in lm.values():
            tgt["b"] = jax.random.normal(
                jax.random.PRNGKey(100 + k), tgt["b"].shape,
                tgt["b"].dtype) * 0.05
        sets.append(lm)
    return cfg, params, sets


def _inputs(cfg, rng, B, text_len):
    n_img = cfg.num_image_tokens
    T = 1 + n_img + text_len
    ids = rng.integers(3, VOCAB - 2, size=(B, T)).astype(np.int32)
    ids[:, 1:1 + n_img] = cfg.image_token_id
    pix = rng.normal(size=(B, 3, cfg.vision.image_size,
                           cfg.vision.image_size)).astype(np.float32)
    return jnp.asarray(ids), jnp.asarray(pix), jnp.ones((B, T), jnp.int32)


def test_multi_stack_matches_single_forward(model):
    """Uniform-k and mixed-row multi-stack forwards == single-stack runs."""
    cfg, params, sets = model
    stacked = {"language_model": stack_adapter_sets(sets)}
    rng = np.random.default_rng(0)
    ids, pix, mask = _inputs(cfg, rng, 3, 5)

    singles = []
    for k in range(3):
        logits, _ = llava_forward(params, cfg, ids, pix, mask,
                                  lora={"language_model": sets[k]},
                                  lora_scaling=SCALING)
        singles.append(np.asarray(logits))
    # adapters actually change the output
    assert not np.allclose(singles[0], singles[1], atol=1e-5)

    for k in range(3):
        logits, _ = llava_forward(params, cfg, ids, pix, mask, lora=stacked,
                                  lora_scaling=SCALING,
                                  adapter_ids=jnp.full((3,), k, jnp.int32))
        np.testing.assert_allclose(np.asarray(logits), singles[k],
                                   rtol=2e-5, atol=2e-5)

    mixed_ids = jnp.asarray([2, 0, 1], jnp.int32)
    logits, _ = llava_forward(params, cfg, ids, pix, mask, lora=stacked,
                              lora_scaling=SCALING, adapter_ids=mixed_ids)
    want = np.stack([singles[2][0], singles[0][1], singles[1][2]])
    np.testing.assert_allclose(np.asarray(logits), want, rtol=2e-5, atol=2e-5)


def test_multi_stack_requires_ids(model):
    cfg, params, sets = model
    stacked = {"language_model": stack_adapter_sets(sets)}
    rng = np.random.default_rng(1)
    ids, pix, mask = _inputs(cfg, rng, 2, 4)
    with pytest.raises(ValueError, match="adapter_ids"):
        llava_forward(params, cfg, ids, pix, mask, lora=stacked,
                      lora_scaling=SCALING)


def _offline_with_adapter(cfg, params, lora_lm, req, bucket, max_len, gen):
    """Single-adapter offline reference: pad to bucket, prefill+decode with
    the SINGLE-stacked adapter (the pre-existing code path)."""
    T = len(req.input_ids)
    ids = np.zeros((1, bucket), np.int32)
    mask = np.zeros((1, bucket), np.int32)
    ids[0, :T] = req.input_ids
    mask[0, :T] = 1
    lora = {"language_model": lora_lm} if lora_lm is not None else None
    state = generate_prefill(params, cfg, jnp.asarray(ids),
                             jnp.asarray(req.pixel_values[None]),
                             jnp.asarray(mask), max_len,
                             compute_dtype=jnp.float32,
                             lora=lora, lora_scaling=SCALING if lora else 0.0)
    out = np.asarray(generate_decode(
        params, cfg, state,
        GenerationConfig(max_new_tokens=req.max_new_tokens, do_sample=False,
                         eos_token_id=gen.eos_token_id),
        compute_dtype=jnp.float32,
        lora=lora, lora_scaling=SCALING if lora else 0.0))[0]
    toks = []
    for t in out:
        toks.append(int(t))
        if int(t) == gen.eos_token_id:
            break
    return toks[:req.max_new_tokens]


def test_engine_per_request_adapters(model):
    """Mixed adapter_ids across slots/waves: engine streams == offline
    single-adapter generates."""
    cfg, params, sets = model
    stacked = {"language_model": stack_adapter_sets(sets)}
    rng = np.random.default_rng(2)
    n_img = cfg.num_image_tokens
    buckets = (1 + n_img + 8, 1 + n_img + 16)
    max_len = buckets[-1] + 10
    gen = GenerationConfig(do_sample=False, eos_token_id=-1)

    def request(req_id, text_len, max_new, adapter_id):
        T = 1 + n_img + text_len
        ids = rng.integers(3, VOCAB - 2, size=(T,)).astype(np.int32)
        ids[1:1 + n_img] = cfg.image_token_id
        pix = rng.normal(size=(3, cfg.vision.image_size,
                               cfg.vision.image_size)).astype(np.float32)
        return Request(req_id=req_id, input_ids=ids, pixel_values=pix,
                       max_new_tokens=max_new, adapter_id=adapter_id)

    reqs = [request(0, 3, 6, 0), request(1, 8, 8, 2), request(2, 14, 4, 1),
            request(3, 5, 9, 2), request(4, 15, 7, 0)]
    eng = ServingEngine(params, cfg, gen, num_slots=2, max_len=max_len,
                        prompt_buckets=buckets, prefill_chunk=2, quantum=3,
                        compute_dtype=jnp.float32,
                        lora=stacked, lora_scaling=SCALING)
    for r in reqs:
        eng.submit(r)
    results = eng.run()
    for r in reqs:
        bucket = next(b for b in buckets if len(r.input_ids) <= b)
        ref = _offline_with_adapter(cfg, params, sets[r.adapter_id], r,
                                    bucket, max_len, gen)
        assert results[r.req_id] == ref, (
            f"req {r.req_id} (adapter {r.adapter_id}): "
            f"{results[r.req_id]} != {ref}")

    with pytest.raises(ValueError, match="adapter_id"):
        eng.submit(request(99, 3, 4, 7))


def test_load_serving_adapters_roundtrip(model, tmp_path):
    """SERVE.ADAPTERS config wiring: saved PEFT-style adapter dirs load back
    into a single stack (1 dir) or a multi stack (N dirs) with the
    adapter_config scaling."""
    cfg, params, sets = model
    from cullavo_tpu.checkpoint.store import save_adapters
    from cullavo_tpu.entry import _load_serving_adapters

    dirs = []
    for k, lm in enumerate(sets[:2]):
        d = str(tmp_path / f"adapter{k}")
        save_adapters(d, {"language_model": lm, "vision_tower": {}},
                      {"r": 4, "alpha": 1.0})
        dirs.append(d)

    lora, scale = _load_serving_adapters({"ADAPTERS": dirs[:1]}, cfg, params)
    assert scale == pytest.approx(0.25)
    a_single = lora["language_model"]["q"]["a"]
    np.testing.assert_array_equal(np.asarray(a_single),
                                  np.asarray(sets[0]["q"]["a"]))

    lora, scale = _load_serving_adapters({"ADAPTERS": dirs}, cfg, params)
    a_multi = lora["language_model"]["q"]["a"]
    assert a_multi.shape[1] == 2          # [L, K, D, r]
    np.testing.assert_array_equal(np.asarray(a_multi[:, 1]),
                                  np.asarray(sets[1]["q"]["a"]))

    assert _load_serving_adapters({}, cfg, params) == (None, 0.0)


def test_engine_single_adapter_runtime(model):
    """lora= with a SINGLE stack (no ids): the reference's eval mode —
    unmerged adapters over the base at generate time."""
    cfg, params, sets = model
    rng = np.random.default_rng(3)
    n_img = cfg.num_image_tokens
    bucket = 1 + n_img + 8
    max_len = bucket + 8
    gen = GenerationConfig(do_sample=False, eos_token_id=-1)
    ids = rng.integers(3, VOCAB - 2, size=(1 + n_img + 5,)).astype(np.int32)
    ids[1:1 + n_img] = cfg.image_token_id
    pix = rng.normal(size=(3, cfg.vision.image_size,
                           cfg.vision.image_size)).astype(np.float32)
    req = Request(req_id=0, input_ids=ids, pixel_values=pix, max_new_tokens=6)
    eng = ServingEngine(params, cfg, gen, num_slots=1, max_len=max_len,
                        prompt_buckets=(bucket,), prefill_chunk=1, quantum=2,
                        compute_dtype=jnp.float32,
                        lora={"language_model": sets[1]},
                        lora_scaling=SCALING)
    eng.submit(req)
    results = eng.run()
    ref = _offline_with_adapter(cfg, params, sets[1], req, bucket, max_len, gen)
    base = _offline_with_adapter(cfg, params, None, req, bucket, max_len, gen)
    assert results[0] == ref
    assert ref != base          # the adapter actually changed the stream
