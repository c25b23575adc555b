"""Decode-path NF4 dequant probe: gather vs mux-tree decode inside XLA.

The decode hot loop runs ``x @ dequant_linear_planar(w)`` per layer; the
planar dequant looks the nibble up via ``NF4_CODE[codes]`` — a vectorized
gather, which TPU lowers poorly.  This probe times the full-model-equivalent
weight panel at decode M with (a) the gather decode, (b) the mux select-tree
decode (`_codebook_lookup_mux`), (c) int8 convert-in-dot, (d) dense bf16.

Methodology per STATUS.md: slope over serialized scan steps with a
host-transfer barrier (naive timings on axon are 10-100x off).
"""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cullavo_tpu.ops import nf4 as nf4_ops

M, K, N = 16, 4096, 11008


def _planar_dequant_mux(q, d_in, d_out, dtype=jnp.bfloat16):
    words = q["q4p"].reshape(d_in // 8, d_out)
    planes = [(words >> (4 * i)) & 0xF for i in range(8)]
    codes = jnp.concatenate(planes, axis=0)
    vals = nf4_ops._codebook_lookup_mux(codes, jnp.float32)
    scale = q["scale"].reshape(d_in, d_out // nf4_ops.BLOCK)
    vals = vals.reshape(d_in, d_out // nf4_ops.BLOCK, nf4_ops.BLOCK) * scale[..., None]
    return vals.reshape(d_in, d_out).astype(dtype)


def timed(step_fn, x0, steps_lo=4, steps_hi=36, reps=5):
    @functools.partial(jax.jit, static_argnums=1)
    def run(x, T):
        def body(c, _):
            return step_fn(c), None
        y, _ = jax.lax.scan(body, x, None, length=T)
        return y

    best = []
    for T in (steps_lo, steps_hi):
        _ = np.asarray(run(x0, T))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = np.asarray(run(x0, T))  # host transfer = real barrier
            ts.append(time.perf_counter() - t0)
        best.append(min(ts))
    return (best[1] - best[0]) / (steps_hi - steps_lo)


def main():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32) * 0.02)
    qp = jax.jit(nf4_ops.quantize_linear_planar)(w)
    q8 = jax.jit(nf4_ops.quantize_linear_int8)(w)
    wb = w.astype(jnp.bfloat16)
    x0 = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32), jnp.bfloat16)

    def mk(mat):
        # output feeds next step's input slice -> serialized, DCE-proof
        def step(x):
            y = mat(x)                                  # [M, N]
            return x + y[:, :K].astype(x.dtype) * 1e-6
        return step

    # down-proj orientation: K=11008 contracting, N=4096
    wd = jnp.asarray(rng.standard_normal((N, K)).astype(np.float32) * 0.02)
    qpd = jax.jit(nf4_ops.quantize_linear_planar)(wd)
    xd = jnp.asarray(rng.standard_normal((M, N)).astype(np.float32), jnp.bfloat16)

    def mkd(mat):
        def step(x):
            y = mat(x)                                  # [M, 4096]
            # output feeds back as a scalar perturbation (serialized, DCE-proof)
            return x + (y.astype(jnp.float32).sum() * 1e-12).astype(x.dtype)
        return step

    variants = {   # name -> (step_fn, x_init)
        "pallas_fused":  mk(lambda x: nf4_ops.nf4_linear_planar(x, qp, K, N)),
        "pallas_bn128":  mk(lambda x: nf4_ops.nf4_linear_planar(x, qp, K, N,
                                                                block_n=128)),
        "pallas_bn512":  mk(lambda x: nf4_ops.nf4_linear_planar(x, qp, K, N,
                                                                block_n=512)),
        "down_default":  mkd(lambda x: nf4_ops.nf4_linear_planar(x, qpd, N, K)),
        "down_bn256":    mkd(lambda x: nf4_ops.nf4_linear_planar(x, qpd, N, K,
                                                                 block_n=256,
                                                                 force_bn=True)),
        "down_bn512":    mkd(lambda x: nf4_ops.nf4_linear_planar(x, qpd, N, K,
                                                                 block_n=512,
                                                                 force_bn=True)),
        "down_ksplit": None,  # filled below
        "sx_bn256":   mk(lambda x: nf4_ops.nf4_linear_planar(x, qp, K, N,
                                                             variant="sx")),
        "sx_bn128":   mk(lambda x: nf4_ops.nf4_linear_planar(x, qp, K, N,
                                                             block_n=128,
                                                             variant="sx")),
        "down_sx256": mkd(lambda x: nf4_ops.nf4_linear_planar(x, qpd, N, K,
                                                              block_n=256,
                                                              force_bn=True,
                                                              variant="sx")),
        "nf4_gather": mk(lambda x: x @ nf4_ops.dequant_linear_planar(qp, K, N, x.dtype)),
        "nf4_mux":    mk(lambda x: x @ _planar_dequant_mux(qp, K, N, x.dtype)),
        "int8":       mk(lambda x: nf4_ops.int8_linear(x, q8)),
        "bf16":       mk(lambda x: x @ wb),
    }
    # down-proj split-K: two planar halves, each d_in=5504 <= 8192 -> bn256
    H = N // 2
    qpd1 = jax.jit(nf4_ops.quantize_linear_planar)(wd[:H])
    qpd2 = jax.jit(nf4_ops.quantize_linear_planar)(wd[H:])
    variants["down_ksplit"] = mkd(
        lambda x: nf4_ops.nf4_linear_planar(x[:, :H], qpd1, H, K)
        + nf4_ops.nf4_linear_planar(x[:, H:], qpd2, H, K))

    import os
    for mode in os.environ.get("PROBE_ONLY", "").split(","):
        if mode:
            variants = {k: v for k, v in variants.items() if k in
                        os.environ["PROBE_ONLY"].split(",")}
            break
    for name, step in variants.items():
        xi = xd if name.startswith("down") else x0
        ms = timed(step, xi) * 1e3
        print(f"{name:12s} {ms:8.3f} ms/panel   (full 7B/token ~ {ms * 6467 / 45:7.1f} ms)")


if __name__ == "__main__":
    main()
