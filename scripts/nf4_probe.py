"""NF4 decode-network A/B probe on the real chip (slope method).

Compares the planar fused kernel with the mux-tree decode (CULLAVO_NF4_DECODE
=mux) vs the round-1 select chain (=chain), the XLA dequant path, and the
dense-bf16 upper bound, at 7B layer shapes.

Method per the axon measurement rules (STATUS.md): R repeats inside ONE jit
over L distinct weights, the carry consumes every output column, a host
transfer of a reduced-but-dependent scalar is the only trusted barrier, and
slope = (t(2R) - t(R)) / R removes launch overhead.  Numbers on the shared
tunnel swing between runs — use for A/B direction only; decisions come from
bench.py end-to-end.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from cullavo_tpu.ops import nf4

    L = int(os.environ.get("PROBE_L", 4))
    M = int(os.environ.get("PROBE_M", 16))
    K = int(os.environ.get("PROBE_K", 4096))
    N = int(os.environ.get("PROBE_N", 11008))
    mode = os.environ.get("CULLAVO_NF4_DECODE", "mux")
    rng = np.random.default_rng(0)

    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32), jnp.bfloat16)
    log(f"quantizing {L} x [{K},{N}] on host (mode={mode})...")
    qs, dense = [], []
    for _ in range(L):
        w = rng.normal(size=(K, N)).astype(np.float32) * 0.02
        q = nf4.quantize_linear_planar_numpy(w)
        qs.append({k: jnp.asarray(v) for k, v in q.items()})
        dense.append(jnp.asarray(w, jnp.bfloat16))

    def run_fused(reps):
        def body(x, qs):
            acc = jnp.zeros((), jnp.float32)
            for r in range(reps):
                y = nf4.nf4_linear_planar(x, qs[r % L], K, N)
                acc += jnp.sum(y.astype(jnp.float32))
                x = x + 1e-6 * acc.astype(x.dtype)  # serialize iterations
            return acc
        return jax.jit(body)

    def run_dense(reps):
        def body(x, ds):
            acc = jnp.zeros((), jnp.float32)
            for r in range(reps):
                y = x @ ds[r % L]
                acc += jnp.sum(y.astype(jnp.float32))
                x = x + 1e-6 * acc.astype(x.dtype)
            return acc
        return jax.jit(body)

    def run_xla(reps):
        def body(x, qs):
            acc = jnp.zeros((), jnp.float32)
            for r in range(reps):
                w = nf4.dequant_linear_planar(qs[r % L], K, N)
                y = x @ w
                acc += jnp.sum(y.astype(jnp.float32))
                x = x + 1e-6 * acc.astype(x.dtype)
            return acc
        return jax.jit(body)

    # parity first
    y_fused = np.asarray(nf4.nf4_linear_planar(x, qs[0], K, N), np.float32)
    w_ref = np.asarray(nf4.dequant_linear_planar(qs[0], K, N), np.float32)
    y_ref = np.asarray(x, np.float32) @ w_ref
    err = np.abs(y_fused - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
    log(f"fused vs XLA-dequant rel err: {err:.2e}")
    assert err < 5e-2, err

    R = int(os.environ.get("PROBE_R", 8))
    results = {}
    for name, runner in [("fused", run_fused), ("xla", run_xla),
                         ("dense_bf16", run_dense)]:
        args = dense if name == "dense_bf16" else qs
        f1, f2 = runner(R), runner(2 * R)
        float(np.asarray(f1(x, args)))  # compile+warm
        float(np.asarray(f2(x, args)))
        t1 = time.perf_counter(); float(np.asarray(f1(x, args)))
        t1 = time.perf_counter() - t1
        t2 = time.perf_counter(); float(np.asarray(f2(x, args)))
        t2 = time.perf_counter() - t2
        per = (t2 - t1) / R * 1e3
        gbs = (K * N * 0.5 if name != "dense_bf16" else K * N * 2) / (per * 1e6)
        results[name] = per
        log(f"{name:10s}: {per:7.3f} ms/matmul  ({gbs:6.1f} GB/s weight stream)")
    print({"mode": mode, "M": M, "K": K, "N": N, **{k: round(v, 3) for k, v in results.items()}})


if __name__ == "__main__":
    main()
