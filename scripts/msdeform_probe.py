"""On-chip probe: MSDeformAttn core op at deform-pixel-decoder shapes.

Times the XLA gather implementation (ops/msdeform.py) at the shapes the
samvitb_deform config runs on a 512x512 image — B x S=5376 (64^2+32^2+16^2),
8 heads x 64, L=3 levels, P=4 points, Q=S (encoder self-deform) — using the
slope method with a host-transfer barrier (naive timings are 10-100x off on
axon; see STATUS.md).

Run on the real chip:  python scripts/msdeform_probe.py
Env: PROBE_B (default 8), PROBE_REPS (slope points, default 3).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("PROBE_IMPL", "xla") == "pallas":
        from cullavo_tpu.ops.msdeform_pallas import \
            ms_deform_attn_pallas as _op

        def ms_deform_attn(v, shapes, lo, wt):
            return _op(v, tuple(shapes), lo, wt)
    else:
        from cullavo_tpu.ops.msdeform import ms_deform_attn

    B = int(os.environ.get("PROBE_B", 8))
    shapes = ((64, 64), (32, 32), (16, 16))
    S = sum(h * w for h, w in shapes)
    Hh, hd, L, P = 8, 64, 3, 4
    Q = S
    print(f"B={B} S={S} Q={Q} heads={Hh}x{hd} L={L} P={P}", file=sys.stderr)

    key = jax.random.PRNGKey(0)
    kv, kl, kw = jax.random.split(key, 3)
    dtype = jnp.dtype(os.environ.get("PROBE_DTYPE", "float32"))
    value = jax.random.normal(kv, (B, S, Hh, hd), dtype)
    loc = jax.random.uniform(kl, (B, Q, Hh, L, P, 2), jnp.float32)
    w = jax.nn.softmax(jax.random.normal(kw, (B, Q, Hh, L * P)), -1).reshape(
        B, Q, Hh, L, P).astype(dtype)

    def run_n(v0, lo, wt, n):
        """n chained applications (output feeds next value) -> scalar."""
        def body(v, _):
            o = ms_deform_attn(v, shapes, lo, wt).reshape(B, Q, Hh, hd)
            return o.astype(v.dtype), ()
        v, _ = jax.lax.scan(body, v0, length=n)
        return jnp.sum(v.astype(jnp.float32))

    fns = {n: jax.jit(lambda v0, lo, wt, n=n: run_n(v0, lo, wt, n))
           for n in (1, 4)}
    for n, f in fns.items():
        t0 = time.time()
        float(f(value, loc, w))   # compile + run; host transfer is the barrier
        print(f"compile n={n}: {time.time()-t0:.1f}s", file=sys.stderr)

    reps = int(os.environ.get("PROBE_REPS", 3))
    times = {}
    for n, f in fns.items():
        best = min(
            (lambda t0=time.time(): (float(f(value, loc, w)),
                                     time.time() - t0)[1])()
            for _ in range(reps))
        times[n] = best
    per_call = (times[4] - times[1]) / 3
    print(f"t(1)={times[1]*1e3:.2f}ms t(4)={times[4]*1e3:.2f}ms "
          f"slope={per_call*1e3:.3f} ms/op  ({per_call*1e3/B:.3f} ms/op/image)")
    # context: 6 encoder layers per forward
    print(f"6-layer encoder deform cost ~= {6*per_call*1e3:.1f} ms/batch{B}")


if __name__ == "__main__":
    main()
