"""Mesh-sharded inference: tensor/data-parallel generate must equal the
single-device result token-for-token (serving-scale path; params sharded with
the same NamedSharding rules as training)."""
import numpy as np

import jax
import jax.numpy as jnp

from cullavo_tpu.models.llava.config import tiny_llava_config
from cullavo_tpu.models.llava.modeling import (GenerationConfig, generate,
                                               init_llava_params, llava_forward)
from cullavo_tpu.parallel.mesh import (MeshConfig, batch_sharding, make_mesh,
                                       shard_params)


def _inputs(cfg, batch=4, text_len=6, seed=0):
    rng = np.random.default_rng(seed)
    n_img = cfg.num_image_tokens
    ids = rng.integers(4, 120, size=(batch, text_len + n_img)).astype(np.int32)
    ids[:, 1:1 + n_img] = cfg.image_token_id
    mask = np.ones_like(ids)
    pix = rng.normal(size=(batch, 3, cfg.vision.image_size,
                           cfg.vision.image_size)).astype(np.float32)
    return ids, mask, pix


def test_sharded_generate_matches_single_device():
    cfg = tiny_llava_config(128)
    params = init_llava_params(cfg, jax.random.PRNGKey(0))
    ids, mask, pix = _inputs(cfg)
    gen = GenerationConfig(max_new_tokens=6, do_sample=False, eos_token_id=-1)
    max_len = ids.shape[1] + 6

    ref = np.asarray(generate(params, cfg, jnp.asarray(ids), jnp.asarray(pix),
                              jnp.asarray(mask), gen, max_len=max_len))

    mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    sharded = shard_params(params, mesh)
    bs = batch_sharding(mesh)
    sids = jax.device_put(jnp.asarray(ids), bs)
    spix = jax.device_put(jnp.asarray(pix), bs)
    smask = jax.device_put(jnp.asarray(mask), bs)
    with mesh:
        out = np.asarray(generate(sharded, cfg, sids, spix, smask, gen,
                                  max_len=max_len))
    np.testing.assert_array_equal(out, ref)


def test_sharded_forward_logits_match():
    cfg = tiny_llava_config(128)
    params = init_llava_params(cfg, jax.random.PRNGKey(1))
    ids, mask, pix = _inputs(cfg, seed=2)

    ref, _ = llava_forward(params, cfg, jnp.asarray(ids), jnp.asarray(pix),
                           jnp.asarray(mask))
    mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    sharded = shard_params(params, mesh)
    bs = batch_sharding(mesh)
    with mesh:
        out, _ = jax.jit(lambda p, i, px, m: llava_forward(p, cfg, i, px, m))(
            sharded, jax.device_put(jnp.asarray(ids), bs),
            jax.device_put(jnp.asarray(pix), bs),
            jax.device_put(jnp.asarray(mask), bs))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_sharded_int8_generate_matches_single_device():
    """Quantized serving path: int8 LLM weights sharded over the mesh decode
    identically (the 7B int8 deployment layout on a v5e-8 slice)."""
    from cullavo_tpu.models.llava.lora import quantize_llm_weights

    cfg = tiny_llava_config(128)
    params = quantize_llm_weights(
        init_llava_params(cfg, jax.random.PRNGKey(3)), bits=8)
    ids, mask, pix = _inputs(cfg, seed=4)
    gen = GenerationConfig(max_new_tokens=5, do_sample=False, eos_token_id=-1)
    max_len = ids.shape[1] + 5

    ref = np.asarray(generate(params, cfg, jnp.asarray(ids), jnp.asarray(pix),
                              jnp.asarray(mask), gen, max_len=max_len))
    mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    sharded = shard_params(params, mesh)
    bs = batch_sharding(mesh)
    with mesh:
        out = np.asarray(generate(sharded, cfg,
                                  jax.device_put(jnp.asarray(ids), bs),
                                  jax.device_put(jnp.asarray(pix), bs),
                                  jax.device_put(jnp.asarray(mask), bs),
                                  gen, max_len=max_len))
    np.testing.assert_array_equal(out, ref)


def test_sharded_kv_int8_generate_matches_single_device():
    """int8 KV cache under TP/DP sharding: the cache (and its per-head scale
    planes) are created inside jit from sharded activations, so the mesh
    run must stay token-exact vs single-device with the SAME quantized
    cache (quantization decisions are deterministic)."""
    cfg = tiny_llava_config(128)
    params = init_llava_params(cfg, jax.random.PRNGKey(5))
    ids, mask, pix = _inputs(cfg, seed=6)
    gen = GenerationConfig(max_new_tokens=5, do_sample=False, eos_token_id=-1)
    max_len = ids.shape[1] + 5

    ref = np.asarray(generate(params, cfg, jnp.asarray(ids), jnp.asarray(pix),
                              jnp.asarray(mask), gen, max_len=max_len,
                              kv_quant="int8"))
    mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    sharded = shard_params(params, mesh)
    bs = batch_sharding(mesh)
    with mesh:
        out = np.asarray(generate(sharded, cfg,
                                  jax.device_put(jnp.asarray(ids), bs),
                                  jax.device_put(jnp.asarray(pix), bs),
                                  jax.device_put(jnp.asarray(mask), bs),
                                  gen, max_len=max_len, kv_quant="int8"))
    np.testing.assert_array_equal(out, ref)
