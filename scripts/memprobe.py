"""AOT memory analysis for the chunked-prefill + big-batch decode programs.

Compiles (without running) prefill/merge/decode at the requested operating
point and prints each program's argument/output/temp HBM sizes — the ground
truth for what fits on a 16 GB chip, since axon exposes no memory_stats().
"""
import os
import sys

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def report(tag, compiled):
    try:
        m = compiled.memory_analysis()
        log(f"[{tag}] args={m.argument_size_in_bytes/2**30:.2f}G "
            f"out={m.output_size_in_bytes/2**30:.2f}G "
            f"temp={m.temp_size_in_bytes/2**30:.2f}G "
            f"alias={m.alias_size_in_bytes/2**30:.2f}G "
            f"gen={getattr(m, 'generated_code_size_in_bytes', 0)/2**20:.1f}M")
    except Exception as e:
        log(f"[{tag}] memory_analysis unavailable: {e}")


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/cullavo_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import PROMPT_TEXT_TOKENS, build_llava7b_params

    from cullavo_tpu.models.llava.config import LlavaConfig
    from cullavo_tpu.models.llava.modeling import (GenerationConfig,
                                                   alloc_decode_state,
                                                   generate_decode,
                                                   generate_prefill,
                                                   merge_decode_state)

    quant = os.environ.get("BENCH_QUANT", "nf4")
    B = int(os.environ.get("BENCH_BATCH", 20))
    chunk = int(os.environ.get("BENCH_PREFILL_CHUNK", 10))
    decode_tokens = int(os.environ.get("BENCH_DECODE_TOKENS", 16))

    cfg = LlavaConfig()
    params = build_llava7b_params(quant, cfg)

    n_img = cfg.num_image_tokens
    T = 1 + n_img + PROMPT_TEXT_TOKENS
    max_len = T + decode_tokens
    rng = np.random.default_rng(0)
    ids = rng.integers(4, 32000, size=(chunk, T)).astype(np.int32)
    ids[:, 1:1 + n_img] = cfg.image_token_id
    mask = np.ones_like(ids)
    pix = rng.normal(size=(chunk, 3, 336, 336)).astype(np.float32)
    jids, jpix, jmask = jnp.asarray(ids), jnp.asarray(pix), jnp.asarray(mask)
    gen = GenerationConfig(max_new_tokens=decode_tokens, do_sample=False,
                           eos_token_id=-1)

    log("compiling prefill (chunk)...")
    pre = generate_prefill.lower(params, cfg, jids, jpix, jmask, max_len,
                                 compute_dtype=jnp.bfloat16).compile()
    report("prefill", pre)

    cs = jax.eval_shape(lambda: None)  # placeholder
    # build abstract chunk state from the prefill output avals
    cs_aval = jax.eval_shape(
        lambda p, i, px, m: generate_prefill(p, cfg, i, px, m, max_len,
                                             compute_dtype=jnp.bfloat16),
        params, jids, jpix, jmask)

    def abstract(x):
        return jax.ShapeDtypeStruct(x.shape, x.dtype)

    cs_abs = jax.tree.map(abstract, cs_aval)
    big_abs = jax.eval_shape(lambda c: alloc_decode_state(c, B), cs_abs)
    big_abs = jax.tree.map(abstract, big_abs)

    log("compiling merge...")
    mer = merge_decode_state.lower(big_abs, cs_abs, jnp.int32(0)).compile()
    report("merge", mer)

    log("compiling decode (full batch)...")
    dec = generate_decode.lower(params, cfg, big_abs, gen,
                                compute_dtype=jnp.bfloat16,
                                return_state=True).compile()
    report("decode", dec)


if __name__ == "__main__":
    main()
