"""Secondary benchmark: X-Decoder (FocalNet-T, COCO panoptic config) eval
throughput on one TPU chip — the reference's seg-eval timing instrumentation
(pipeline/XDecoderPipeline.py:126-176) as a standalone number.

Random weights at the configs/xdecoder_test.yaml architecture; 512x512 eval
forward (backbone → FPN → 9-layer decoder → 201 queries → class+mask heads).
Prints ONE JSON line like bench.py (the primary driver metric stays bench.py).
"""
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/cullavo_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from cullavo_tpu.config import load_config
    from cullavo_tpu.models.from_config import xdecoder_model_config_from
    from cullavo_tpu.models.xdecoder.model import (forward_eval,
                                                   init_xdecoder_model_params)

    opt = load_config(["configs/xdecoder_test.yaml"])
    cfg = xdecoder_model_config_from(opt)
    log("init params (jit)...")
    params = jax.jit(lambda k: init_xdecoder_model_params(cfg, k))(
        jax.random.PRNGKey(0))
    params = jax.block_until_ready(params)

    import os

    B, H, W = int(os.environ.get("BENCH_XDEC_BATCH", 8)), 512, 512
    # fp32 by default: measured FASTER than bf16 here (17.0 vs 11.2 img/s at
    # batch 8) — focal modulation is depthwise-conv/elementwise-bound, not
    # MXU-bound, and the bf16 cast chain costs more than the matmuls save.
    dtype = jnp.dtype(os.environ.get("BENCH_XDEC_DTYPE", "float32"))
    params = jax.tree.map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, params)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32)).astype(dtype)
    text_embeds = jnp.asarray(
        rng.normal(size=(cfg.num_classes + 1,
                         cfg.decoder.dim_proj)).astype(np.float32)).astype(dtype)

    from cullavo_tpu.models.xdecoder.model import semantic_inference

    def eval_step(p, im, t):
        cls, masks, boxes = forward_eval(p, cfg, im, t, out_size=(H, W))
        # the full semantic-eval pipeline stays on device (the reference's
        # evaluate() path: upsample → per-class probs, xdecoder_model.py:
        # 452-505+765-772); transferring the argmax map keeps the host
        # transfer small while depending on every mask logit — the transfer
        # is the only reliable completion barrier on axon
        sem = jax.vmap(semantic_inference)(cls, masks)        # [B, C, H, W]
        return cls, jnp.argmax(sem, axis=1).astype(jnp.int32), boxes

    fn = jax.jit(eval_step)
    log("compiling eval forward...")
    t0 = time.time()
    out = fn(params, images, text_embeds)
    jax.tree.map(np.asarray, out)
    log(f"compile+first: {time.time()-t0:.1f}s")

    lat = []
    for _ in range(10):
        t0 = time.time()
        jax.tree.map(np.asarray, fn(params, images, text_embeds))
        lat.append(time.time() - t0)
    p50 = float(np.percentile(np.asarray(lat), 50))
    print(json.dumps({
        "metric": "xdecoder_focalt_seg_images_per_sec_per_chip",
        "value": round(B / p50, 4),
        "unit": "images/s",
        "vs_baseline": None,
        "p50_latency_s": round(p50, 4),
        "image_size": [H, W],
        "batch": B,
        "dtype": str(dtype),
        "backbone": "focal-t",
    }))


if __name__ == "__main__":
    main()
