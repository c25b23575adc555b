"""Per-phase timing probe for the 7B VQA bench: prefill ms vs decode ms/token.

Separates the two jitted programs that bench.py times end-to-end, so kernel
changes can be attributed to the phase they affect.  Knobs (env):
  BENCH_QUANT=int8|nf4     weight format (default int8)
  BENCH_BATCH=N            batch size (default 4)
  CULLAVO_INT8_PALLAS=0|1|auto   int8 matmul dispatch (default auto)
  PROBE_DECODE_TOKENS=N    decode scan length (default 16)

Usage:  python scripts/decode_probe.py
Prints one JSON line with per-phase numbers.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/cullavo_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from bench import PROMPT_TEXT_TOKENS, build_llava7b_params
    from cullavo_tpu.models.llava.config import LlavaConfig
    from cullavo_tpu.models.llava.modeling import (GenerationConfig,
                                                   generate_decode,
                                                   generate_prefill)

    quant_mode = os.environ.get("BENCH_QUANT", "int8")
    batch = int(os.environ.get("BENCH_BATCH", 4))
    decode_tokens = int(os.environ.get("PROBE_DECODE_TOKENS", 16))
    int8_mode = os.environ.get("CULLAVO_INT8_PALLAS", "0")  # mirror llama.py default

    cfg = LlavaConfig()
    log(f"quant={quant_mode} batch={batch} int8_mode={int8_mode} "
        f"decode_tokens={decode_tokens}")
    params = build_llava7b_params(quant_mode, cfg)

    B = batch
    T = 1 + cfg.num_image_tokens + PROMPT_TEXT_TOKENS
    max_len = T + decode_tokens
    rng = np.random.default_rng(0)
    ids = rng.integers(4, 32000, size=(B, T)).astype(np.int32)
    ids[:, 1:1 + cfg.num_image_tokens] = cfg.image_token_id
    mask = np.ones_like(ids)
    pix = rng.normal(size=(B, 3, 336, 336)).astype(np.float32)
    gen = GenerationConfig(max_new_tokens=decode_tokens, do_sample=False,
                           eos_token_id=-1)
    jids, jpix, jmask = jnp.asarray(ids), jnp.asarray(pix), jnp.asarray(mask)

    log("compiling prefill...")
    t0 = time.time()
    state = jax.block_until_ready(generate_prefill(
        params, cfg, jids, jpix, jmask, max_len, compute_dtype=jnp.bfloat16))
    log(f"  prefill compile+run {time.time()-t0:.1f}s")
    # generate_decode DONATES its state: copy before every call so the
    # original prefill state stays alive across repeated timings
    def fresh_state():
        return jax.block_until_ready(
            jax.tree.map(lambda a: a + 0 if hasattr(a, "dtype") else a, state))

    log("compiling decode...")
    t0 = time.time()
    out = jax.block_until_ready(generate_decode(
        params, cfg, fresh_state(), gen, compute_dtype=jnp.bfloat16))
    log(f"  decode compile+run {time.time()-t0:.1f}s tokens[:4]={np.asarray(out)[0,:4].tolist()}")

    def med(f, n=6, setup=None):
        ts = []
        for _ in range(n):
            arg = setup() if setup else None
            t0 = time.time()
            out = f(arg)
            # host transfer of the smallest leaf — the only reliable axon
            # barrier (block_until_ready can return early on this platform)
            leaf = min(jax.tree.leaves(out), key=lambda a: a.size)
            np.asarray(leaf)
            ts.append(time.time() - t0)
        return float(np.median(ts))

    prefill_s = med(lambda _: generate_prefill(
        params, cfg, jids, jpix, jmask, max_len, compute_dtype=jnp.bfloat16))
    decode_s = med(lambda st: generate_decode(
        params, cfg, st, gen, compute_dtype=jnp.bfloat16), setup=fresh_state)

    total = prefill_s + decode_s
    print(json.dumps({
        "quant": quant_mode, "batch": B, "int8_mode": int8_mode,
        "prefill_ms": round(prefill_s * 1e3, 1),
        "decode_ms_per_token": round(decode_s * 1e3 / decode_tokens, 2),
        "decode_tokens": decode_tokens,
        "implied_img_per_s": round(B / total, 3),
    }))


if __name__ == "__main__":
    main()
