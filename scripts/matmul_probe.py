"""Decode-shaped matmul microbenchmark: where does the int8 per-token time go?

Times R repeats of a scan over L DISTINCT stacked weights at one 7B layer
shape ([M, 4096] @ [4096, 11008]) inside ONE jitted program, and reports the
slope between two R values — this cancels both the axon RPC overhead (every
eager op is a ~5-15 ms round trip) and the program fixed cost.  Stacking
matters: a single loop-invariant weight becomes VMEM-resident and measures
nothing.

Variants:
  bf16      — dense bf16 weights (2-byte traffic floor)
  conv      — int8 weights, convert-to-bf16 fused into the dot (current path)
  conv_pre  — int8 weights, scale premultiplied into the weight (old path)
  s8s8      — int8 x int8 native MXU dot (int32 accum), scales folded after

Env: PROBE_M (default 8), PROBE_L (default 24 layers).
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

    M = int(os.environ.get("PROBE_M", 8))
    L = int(os.environ.get("PROBE_L", 24))
    R_LO, R_HI = 2, 10
    K, N = 4096, 11008
    bytes_i8 = K * N
    bytes_bf16 = 2 * K * N

    def make_w8(l):
        return jax.jit(lambda key: jax.random.randint(
            key, (K, N), -127, 128, jnp.int32).astype(jnp.int8))(jax.random.PRNGKey(l))

    w8 = jnp.stack([make_w8(l) for l in range(L)])          # [L, K, N] int8
    scale = jnp.asarray(np.random.default_rng(1).random((L, 1, N), np.float32) * 0.01)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32)).astype(jnp.bfloat16)

    def repeated(dot, reps):
        @functools.partial(jax.jit, static_argnames=())
        def fn(x, *ws):
            def outer(r, c):
                def body(c, per_layer):
                    y = dot(c, *per_layer)
                    return (y[:, :K] * 1e-3
                            + (r.astype(jnp.float32) * 1e-6).astype(y.dtype)).astype(c.dtype), None
                c, _ = jax.lax.scan(body, c, ws)
                return c
            return jax.lax.fori_loop(0, reps, outer, x)
        return fn

    def timed(name, dot, ws, per_dot_bytes):
        ts = {}
        for reps in (R_LO, R_HI):
            f = repeated(dot, reps)
            np.asarray(f(x, *ws))  # compile + run (host transfer = barrier)
            samples = []
            for _ in range(5):
                t0 = time.time()
                np.asarray(f(x, *ws))
                samples.append(time.time() - t0)
            ts[reps] = float(np.median(samples))
        ms = (ts[R_HI] - ts[R_LO]) / ((R_HI - R_LO) * L) * 1e3
        print(json.dumps({"variant": name, "ms_per_dot": round(ms, 4),
                          "gb_per_s": round(per_dot_bytes / ms / 1e6, 1),
                          "fixed_ms_per_call": round(
                              (ts[R_LO] - 2 * (ts[R_HI] - ts[R_LO]) / 8) * 1e3, 2),
                          "M": M, "layers": L}), flush=True)

    timed("conv",
          lambda c, w, s: (c @ w.astype(jnp.bfloat16)) * s.astype(jnp.bfloat16),
          (w8, scale), bytes_i8)
    timed("conv_pre",
          lambda c, w, s: c @ (w.astype(jnp.bfloat16) * s.astype(jnp.bfloat16)),
          (w8, scale), bytes_i8)

    # transposed weight storage [N, K]: contraction on the rhs MINOR dim —
    # tests whether the convert-in-dot stream prefers lane-major K
    w8t = jnp.swapaxes(w8, 1, 2)  # [L, N, K]

    def conv_t(c, wt, s):
        y = jax.lax.dot_general(c, wt.astype(jnp.bfloat16),
                                (((1,), (1,)), ((), ())))
        return y * s[0].astype(jnp.bfloat16)

    timed("conv_t", conv_t, (w8t, scale), bytes_i8)

    def s8s8(c, w, s):
        cm = jnp.max(jnp.abs(c), axis=-1, keepdims=True).astype(jnp.float32)
        ci = jnp.clip(jnp.round(c.astype(jnp.float32) / cm * 127), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(ci, w, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * (cm / 127.0) * s).astype(jnp.bfloat16)

    timed("s8s8", s8s8, (w8, scale), bytes_i8)

    del w8
    wb = jnp.stack([make_w8(l).astype(jnp.bfloat16) for l in range(L)])
    timed("bf16", lambda c, w: c @ w, (wb,), bytes_bf16)


if __name__ == "__main__":
    main()
