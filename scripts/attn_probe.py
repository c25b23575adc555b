"""Prefill-shaped attention microbenchmark: XLA sdpa vs Pallas flash.

Slope-timed (R repeats inside one jit, two R values, host-transfer barrier —
see scripts/matmul_probe.py for why this is REQUIRED on axon).  Shape matches
the 7B VQA prefill: [B, 32 heads, T=648, 128] with causal + key-padding mask.
XLA's sdpa materializes the [B, H, T, T] fp32 score/prob tensors in HBM
(~330 MB each at batch 6); flash never does.

Env: PROBE_B (default 6), PROBE_T (default 648), PROBE_L layers (default 8).
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

    from cullavo_tpu.ops.flash_attention import flash_attention

    B = int(os.environ.get("PROBE_B", 6))
    T = int(os.environ.get("PROBE_T", 648))
    L = int(os.environ.get("PROBE_L", 8))
    H, hd = 32, 128
    R_LO, R_HI = 1, 4

    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((L, 3, B, H, T, hd)).astype(np.float32) * 0.1
                      ).astype(jnp.bfloat16)
    mask = np.ones((B, T), np.int32)
    mask[:, -7:] = 0  # right padding (the 641-real-token prompt)
    mask = jnp.asarray(mask)
    positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)

    NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
    causal = positions[:, :, None] >= positions[:, None, :]
    ok = causal & mask[:, None, :].astype(bool)
    bias = jnp.where(ok[:, None, :, :], 0.0, NEG_INF).astype(jnp.float32)

    def sdpa(q, k, v):
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        probs = jax.nn.softmax(scores + bias, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    def flash(q, k, v):
        return flash_attention(q, k, v, q_positions=positions, kv_valid=mask,
                               causal=True)

    def repeated(attn, reps):
        @jax.jit
        def fn(qkv):
            def outer(r, c):
                def body(c, per_layer):
                    o = attn(per_layer[0] + c[:, :, :1, :1] * 1e-6,
                             per_layer[1], per_layer[2])
                    return o[:, :, :1, :1].astype(c.dtype) * 1e-3, None
                c, _ = jax.lax.scan(body, c, qkv)
                return c
            c0 = jnp.zeros((B, H, 1, 1), jnp.bfloat16)
            return jax.lax.fori_loop(0, reps, outer, c0)
        return fn

    for name, attn in (("sdpa", sdpa), ("flash", flash)):
        try:
            ts = {}
            for reps in (R_LO, R_HI):
                f = repeated(attn, reps)
                np.asarray(f(qkv))
                samples = []
                for _ in range(4):
                    t0 = time.time()
                    np.asarray(f(qkv))
                    samples.append(time.time() - t0)
                ts[reps] = float(np.median(samples))
            ms = (ts[R_HI] - ts[R_LO]) / ((R_HI - R_LO) * L) * 1e3
            print(json.dumps({"variant": name, "ms_per_layer": round(ms, 3),
                              "B": B, "T": T}), flush=True)
        except Exception as e:  # the axon helper can reject pallas lowerings
            print(json.dumps({"variant": name, "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
