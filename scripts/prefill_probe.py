"""Prefill-shaped matmul probe: does the native s8s8 MXU dot beat the
bf16 convert-in-dot stream when COMPUTE-bound (large M)?

Decode-M already measured (scripts/matmul_probe.py): memory-bound, s8s8
ties conv.  Prefill M ≈ batch × T (e.g. 14 × 641 ≈ 9k) is MXU-bound at
bf16 — v5e's int8 MXU path has 2× the MAC rate, so an LLM.int8-style
s8s8 prefill (per-token activation quant, reference semantics at
bitsandbytes Linear8bitLt / pipeline/LLaVAVQAVALPipeline.py:94-102)
could halve prefill time.  This probe times ONLY the two contenders at
one 7B layer shape to keep axon compile time bounded.

Env: PROBE_M (default 8974 = 14*641), PROBE_L (default 4).
"""
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    M = int(os.environ.get("PROBE_M", 14 * 641))
    L = int(os.environ.get("PROBE_L", 4))
    R_LO, R_HI = 1, 3
    K, N = 4096, 11008
    flops = 2 * M * K * N

    w8 = jnp.stack([
        jax.jit(lambda key: jax.random.randint(key, (K, N), -127, 128,
                                               jnp.int32).astype(jnp.int8))(
            jax.random.PRNGKey(l)) for l in range(L)])
    scale = jnp.asarray(
        np.random.default_rng(1).random((L, 1, N), np.float32) * 0.01)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (M, K)).astype(np.float32)).astype(jnp.bfloat16)

    def repeated(dot, reps):
        @jax.jit
        def fn(x, *ws):
            def outer(r, c):
                def body(c, per_layer):
                    y = dot(c, *per_layer)
                    full = jnp.sum(y.astype(jnp.float32), axis=-1,
                                   keepdims=True)
                    return (y[:, :K] * 1e-3
                            + (full * 1e-9).astype(y.dtype)
                            + (r.astype(jnp.float32) * 1e-6).astype(y.dtype)
                            ).astype(c.dtype), None
                c, _ = jax.lax.scan(body, c, ws)
                return c
            return jax.lax.fori_loop(0, reps, outer, x)
        return fn

    def timed(name, dot):
        ts = {}
        for reps in (R_LO, R_HI):
            f = repeated(dot, reps)
            np.asarray(f(x, *(w8, scale)))   # compile (host pull = barrier)
            samples = []
            for _ in range(3):
                t0 = time.time()
                np.asarray(f(x, *(w8, scale)))
                samples.append(time.time() - t0)
            ts[reps] = float(np.median(samples))
        ms = (ts[R_HI] - ts[R_LO]) / ((R_HI - R_LO) * L) * 1e3
        print(json.dumps({"variant": name, "ms_per_dot": round(ms, 3),
                          "tflops": round(flops / ms / 1e9, 1),
                          "M": M}), flush=True)

    # current path: int8 weight, convert-to-bf16 fused into the dot
    timed("conv", lambda c, w, s: (c @ w.astype(jnp.bfloat16))
          * s.astype(jnp.bfloat16))

    # LLM.int8-style: per-row activation quant + native s8s8 dot
    def s8s8(c, w, s):
        cm = jnp.max(jnp.abs(c.astype(jnp.float32)), axis=-1, keepdims=True)
        sx = jnp.maximum(cm, 1e-12) / 127.0
        ci = jnp.clip(jnp.round(c.astype(jnp.float32) / sx),
                      -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(ci, w, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * sx * s).astype(jnp.bfloat16)

    timed("s8s8", s8s8)


if __name__ == "__main__":
    main()
