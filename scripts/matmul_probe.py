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
                    # the carry must depend on EVERY output column: a bare
                    # y[:, :K] slice lets XLA push the slice into the dot and
                    # skip reading 64% of the weight (measured: a transposed
                    # int8 variant "achieved" 1261 GB/s — above HBM spec —
                    # until this row-sum forced the full contraction)
                    full = jnp.sum(y.astype(jnp.float32), axis=-1, keepdims=True)
                    return (y[:, :K] * 1e-3 + (full * 1e-9).astype(y.dtype)
                            + (r.astype(jnp.float32) * 1e-6).astype(y.dtype)).astype(c.dtype), None
                c, _ = jax.lax.scan(body, c, ws)
                return c
            return jax.lax.fori_loop(0, reps, outer, x)
        return fn

    ref_y = {}

    def timed(name, dot, ws, per_dot_bytes):
        # numeric parity vs the first variant (catches layout/DCE bugs that
        # would make a timing comparison meaningless)
        y = np.asarray(jax.jit(dot)(x, *[w[0] for w in ws]).astype(jnp.float32))
        if "ref" not in ref_y:
            ref_y["ref"] = y
        else:
            err = np.max(np.abs(y - ref_y["ref"])) / (np.max(np.abs(ref_y["ref"])) + 1e-9)
            if err > 2e-2:
                print(json.dumps({"variant": name, "parity_rel_err": float(err),
                                  "status": "MISMATCH"}), flush=True)
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

    # int8 packed 4-per-int32 (block layout along K: word row i, byte j holds
    # original row j*(K/4)+i) — tests whether an int32-typed stream reaches
    # the dense-bf16 HBM rate (875 GB/s vs int8's 630) with shift/mask decode
    # on the VPU.  Decode j gives rows [j*K/4, (j+1)*K/4) so the contraction
    # splits into 4 static x-slices; packing is a one-time weight transform.
    Kq = K // 4
    w8_np = np.asarray(w8, dtype=np.int32) & 0xFF          # [L, K, N] bytes
    w32_np = (w8_np[:, 0 * Kq:1 * Kq] | (w8_np[:, 1 * Kq:2 * Kq] << 8)
              | (w8_np[:, 2 * Kq:3 * Kq] << 16) | (w8_np[:, 3 * Kq:4 * Kq] << 24))
    w32 = jnp.asarray(w32_np.astype(np.int32))             # [L, K/4, N]

    def conv_p32(c, w, s):
        y = jnp.zeros((c.shape[0], N), jnp.float32)
        for j in range(4):
            b = (w >> (8 * j)) & 0xFF
            wj = ((b ^ 0x80) - 0x80).astype(jnp.bfloat16)
            y = y + jax.lax.dot_general(
                c[:, j * Kq:(j + 1) * Kq], wj, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return (y * s[0]).astype(jnp.bfloat16)

    if os.environ.get("PROBE_P32"):
        timed("conv_p32_xla", conv_p32, (w32, scale), bytes_i8)

    if os.environ.get("PROBE_P32") and (jax.default_backend() == "tpu" or os.environ.get("PROBE_PALLAS")):
        from jax.experimental import pallas as pl

        BN = int(os.environ.get("PROBE_BN", 512))

        def p32_kernel(x_ref, w_ref, s_ref, o_ref):
            acc = jnp.zeros((x_ref.shape[0], BN), jnp.float32)
            w = w_ref[...]
            for j in range(4):
                b = (w >> (8 * j)) & 0xFF
                wj = ((b ^ 0x80) - 0x80).astype(jnp.bfloat16)
                acc = acc + jax.lax.dot_general(
                    x_ref[:, j * Kq:(j + 1) * Kq], wj, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            o_ref[...] = (acc * s_ref[...]).astype(o_ref.dtype)

        def p32_pallas(c, w, s):
            return pl.pallas_call(
                p32_kernel,
                grid=(N // BN,),
                in_specs=[
                    pl.BlockSpec((M, K), lambda n: (0, 0)),
                    pl.BlockSpec((Kq, BN), lambda n: (0, n)),
                    pl.BlockSpec((1, BN), lambda n: (0, n)),
                ],
                out_specs=pl.BlockSpec((M, BN), lambda n: (0, n)),
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            )(c, w, s.astype(jnp.float32))

        def p32_pallas_dot(c, w, s):
            return p32_pallas(c, w, s)

        try:
            timed("p32_pallas", p32_pallas_dot,
                  (w32, scale.reshape(L, 1, N)), bytes_i8)
        except Exception as e:  # Mosaic-on-axon constraint hit
            print(json.dumps({"variant": "p32_pallas", "error": str(e)[:200]}),
                  flush=True)

    del w8
    wb = jnp.stack([make_w8(l).astype(jnp.bfloat16) for l in range(L)])
    timed("bf16", lambda c, w: c @ w, (wb,), bytes_bf16)


if __name__ == "__main__":
    main()
