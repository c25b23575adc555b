"""Phase-by-phase memory probe for chunked prefill + big-batch decode.

Runs build → chunk prefills → merges → decode with a barrier and a
memory_stats() dump between phases, to locate the OOM phase at a given
(BENCH_BATCH, BENCH_PREFILL_CHUNK, BENCH_QUANT) operating point.
"""
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def mem(tag):
    import jax

    try:
        s = jax.local_devices()[0].memory_stats()
        log(f"[{tag}] in_use={s.get('bytes_in_use', 0)/2**30:.2f}G "
            f"peak={s.get('peak_bytes_in_use', 0)/2**30:.2f}G "
            f"limit={s.get('bytes_limit', 0)/2**30:.2f}G")
    except Exception as e:
        log(f"[{tag}] memory_stats unavailable: {e}")


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
    mem("params")

    n_img = cfg.num_image_tokens
    T = 1 + n_img + PROMPT_TEXT_TOKENS
    max_len = T + decode_tokens
    rng = np.random.default_rng(0)
    ids = rng.integers(4, 32000, size=(B, T)).astype(np.int32)
    ids[:, 1:1 + n_img] = cfg.image_token_id
    mask = np.ones_like(ids)
    pix = rng.normal(size=(B, 3, 336, 336)).astype(np.float32)
    jids, jpix, jmask = jnp.asarray(ids), jnp.asarray(pix), jnp.asarray(mask)
    gen = GenerationConfig(max_new_tokens=decode_tokens, do_sample=False,
                           eos_token_id=-1)

    state = None
    for off in range(0, B, chunk):
        t0 = time.time()
        cs = generate_prefill(params, cfg, jids[off:off + chunk],
                              jpix[off:off + chunk], jmask[off:off + chunk],
                              max_len, compute_dtype=jnp.bfloat16)
        cs = jax.block_until_ready(cs)
        log(f"chunk@{off}: {time.time()-t0:.1f}s")
        mem(f"prefill@{off}")
        if state is None:
            state = jax.block_until_ready(alloc_decode_state(cs, B))
            mem("alloc")
        t0 = time.time()
        state = jax.block_until_ready(merge_decode_state(state, cs, off))
        del cs
        log(f"merge@{off}: {time.time()-t0:.1f}s")
        mem(f"merge@{off}")
    t0 = time.time()
    out, state = generate_decode(params, cfg, state, gen,
                                 compute_dtype=jnp.bfloat16, return_state=True)
    out = np.asarray(out)
    log(f"decode(+compile): {time.time()-t0:.1f}s tokens[:4]={out[0,:4].tolist()}")
    mem("decode")
    # timed second pass
    t0 = time.time()
    state2 = None
    for off in range(0, B, chunk):
        cs = generate_prefill(params, cfg, jids[off:off + chunk],
                              jpix[off:off + chunk], jmask[off:off + chunk],
                              max_len, compute_dtype=jnp.bfloat16)
        if state2 is None:
            state2 = alloc_decode_state(cs, B)
        state2 = merge_decode_state(state2, cs, off)
    t_pre = None
    out2, state2 = generate_decode(params, cfg, state2, gen,
                                   compute_dtype=jnp.bfloat16, return_state=True)
    np.asarray(out2)
    dt = time.time() - t0
    log(f"steady pass: {dt:.2f}s -> {B/dt:.2f} img/s")
    mem("steady")


if __name__ == "__main__":
    main()
