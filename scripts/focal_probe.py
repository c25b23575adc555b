"""Chip validation + timing for the fused focal-modulation kernel
(ops/focal_pallas.py) at real FocalNet stage shapes.

Stages follow focal-T at 512^2 eval input (configs/xdecoder_test.yaml):
stage1 [B, 128, 128,  96], stage2 [B, 64, 64, 192],
stage3 [B, 32, 32, 384],  stage4 [B, 16, 16, 768], focal_level 3
(focal.py FocalNet-T: focal_levels [3,3,3,3], windows [9,9,9,9]? — we use
the xdecoder_test config's levels/kernels via FOCAL_KERNELS below).

Usage: python scripts/focal_probe.py [stage_index...]
Env: FOCAL_PROBE_B (default 8), FOCAL_KERNELS (default "3,5,7,9").
"""
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cullavo_tpu.models.xdecoder.focalnet import _depthwise_conv
    from cullavo_tpu.ops.focal_pallas import fused_focal_ctx, pack_level_weights

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/cullavo_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    B = int(os.environ.get("FOCAL_PROBE_B", 8))
    kernels = tuple(int(k) for k in
                    os.environ.get("FOCAL_KERNELS", "3,5,7,9").split(","))
    L = len(kernels)
    stages = [(128, 128, 96), (64, 64, 192), (32, 32, 384), (16, 16, 768)]
    which = [int(a) for a in sys.argv[1:]] or list(range(len(stages)))

    print("device:", jax.devices()[0], flush=True)
    for si in which:
        H, W, C = stages[si]
        rng = np.random.default_rng(si)
        # NHWC inputs, like focal_modulation receives them — the fused path
        # pays its layout transposes, matching the real integration
        ctx = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32)
                          ).astype(jnp.bfloat16)
        gates = jnp.asarray(rng.normal(size=(B, H, W, L + 1)).astype(np.float32)
                            ).astype(jnp.bfloat16)
        kws = [jnp.asarray((rng.normal(size=(k, k, 1, C)) * 0.2
                            ).astype(np.float32)) for k in kernels]
        lw = pack_level_weights(kws).astype(jnp.bfloat16)

        def fused_path(c, g, w):
            cf = c.reshape(B, H * W, C).transpose(0, 2, 1)
            gf = g.reshape(B, H * W, L + 1).transpose(0, 2, 1)
            out = fused_focal_ctx(cf, gf, w, H, W, kernels, True)
            return out.transpose(0, 2, 1).reshape(B, H, W, C)

        fused = jax.jit(fused_path)

        def xla_chain(c, g):
            acc = jnp.zeros_like(c)
            cc = c
            for l, k in enumerate(kernels):
                cc = jax.nn.gelu(_depthwise_conv(cc, kws[l].astype(cc.dtype)),
                                 approximate=True)
                acc = acc + cc * g[..., l:l + 1]
            gl = jax.nn.gelu(jnp.mean(cc, axis=(1, 2), keepdims=True),
                             approximate=True)
            return (acc + gl * g[..., L:L + 1]) / (L + 1)

        xla = jax.jit(xla_chain)

        t0 = time.time()
        out_f = np.asarray(fused(ctx, gates, lw))
        t_compile_f = time.time() - t0
        t0 = time.time()
        out_x = np.asarray(xla(ctx, gates))
        t_compile_x = time.time() - t0
        err = np.max(np.abs(out_f.astype(np.float32) - out_x.astype(np.float32)))
        scale = np.max(np.abs(out_x.astype(np.float32))) + 1e-9

        def bench(fn, *args, iters=20):
            # slope method with host-transfer barrier (axon lesson)
            np.asarray(fn(*args))
            t0 = time.time()
            for _ in range(iters):
                r = fn(*args)
            np.asarray(r)
            return (time.time() - t0) / iters * 1e3

        ms_f = bench(fused, ctx, gates, lw)
        ms_x = bench(xla, ctx, gates)
        print(f"stage{si + 1} [{B},{H},{W},{C}] L={L}: "
              f"fused {ms_f:.2f} ms vs xla {ms_x:.2f} ms "
              f"({ms_x / ms_f:.2f}x)  maxerr {err:.4f} (rel {err / scale:.4f}) "
              f"compile {t_compile_f:.0f}s/{t_compile_x:.0f}s", flush=True)


if __name__ == "__main__":
    main()
