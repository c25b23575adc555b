"""Secondary benchmark: X-Decoder (FocalNet-L, COCO panoptic config) eval
throughput on one TPU chip — the reference's seg-eval timing instrumentation
(pipeline/XDecoderPipeline.py:126-176) as a standalone number.

Random weights at the configs/xdecoder_test.yaml architecture; 512x512 eval
forward (backbone → FPN → 9-layer decoder → 201 queries → class+mask heads).
Prints ONE JSON line like bench.py (the primary driver metric stays bench.py).
"""
import json
import os
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

    opt = load_config([os.environ.get("BENCH_XDEC_CONFIG",
                                      "configs/xdecoder_test.yaml")])
    cfg = xdecoder_model_config_from(opt)
    gelu_mode = os.environ.get("BENCH_XDEC_GELU", "auto")
    if gelu_mode in ("exact", "tanh") and hasattr(cfg.backbone, "exact_gelu"):
        # auto (default): exact erf at f32, tanh at bf16 (within one bf16
        # ulp of exact — FocalNetConfig.exact_gelu); "exact"/"tanh" force
        import dataclasses

        cfg = dataclasses.replace(
            cfg, backbone=dataclasses.replace(cfg.backbone,
                                              exact_gelu=gelu_mode == "exact"))
    log("init params (jit)...")
    params = jax.jit(lambda k: init_xdecoder_model_params(cfg, k))(
        jax.random.PRNGKey(0))
    params = jax.block_until_ready(params)

    B, H, W = int(os.environ.get("BENCH_XDEC_BATCH", 8)), 512, 512
    # bf16 by default (the reference evaluates under Accelerate bf16):
    # 43.9 vs 35.0 img/s fp32 at batch 8 in fullsum mode.  The round-1
    # "bf16 slower" reading (11.2 vs 17.0) was taken when the bench was
    # dominated by the tunnel transfer of the argmax map — with that
    # artifact removed, bf16 wins as the bandwidth math says it should.
    dtype = jnp.dtype(os.environ.get("BENCH_XDEC_DTYPE", "bfloat16"))
    params = jax.tree.map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, params)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32)).astype(dtype)
    text_embeds = jnp.asarray(
        rng.normal(size=(cfg.num_classes + 1,
                         cfg.decoder.dim_proj)).astype(np.float32)).astype(dtype)

    from cullavo_tpu.models.xdecoder.model import semantic_inference_argmax

    # BENCH_XDEC_MODE: fullsum (default) = upsample + semantic inference
    # (the reference's evaluate() path) with a tiny reduced host transfer;
    # full = same but ships the [B, H, W] argmax map to the host — through
    # the REMOTE axon tunnel that 8 MB transfer alone costs ~490 ms/batch
    # (measured: full 11.2 vs fullsum 35.0 img/s, identical device compute),
    # an artifact a locally-attached host does not pay; up = upsample only;
    # net = network only (low-res masks); backbone = backbone+pixel-decoder
    # only.  The staged modes isolate where eval time goes.
    mode = os.environ.get("BENCH_XDEC_MODE", "fullsum")

    def eval_step(p, im, t):
        if mode == "trunk":
            from cullavo_tpu.models.xdecoder.model import _backbone_apply
            feats = _backbone_apply(p["backbone"], cfg, im)
            return tuple(jnp.sum(f.astype(jnp.float32))
                         for f in feats.values())
        if mode == "backbone":
            from cullavo_tpu.models.xdecoder.model import \
                backbone_and_pixel_decoder
            mask_features, pyramid = backbone_and_pixel_decoder(p, cfg, im)
            return (jnp.sum(mask_features.astype(jnp.float32)),
                    jnp.sum(pyramid[-1].astype(jnp.float32)), jnp.float32(0))
        cls, masks, boxes = forward_eval(
            p, cfg, im, t, out_size=(H, W) if mode != "net" else None)
        if mode in ("full", "fullsum"):
            # on-device semantic inference.  The optimization_barrier keeps
            # XLA from fusing the bilinear mask upsample into the semantic
            # matmul — fused, the eval runs 2-3x slower (59-150 ms/img vs
            # ~30; the op itself costs <1 ms/img in isolation,
            # scripts/seminf_probe.py).  Transferring the argmax map keeps
            # the host transfer small while depending on every mask logit —
            # the transfer is the only reliable completion barrier on axon.
            masks = jax.lax.optimization_barrier(masks)
            sem = jax.vmap(semantic_inference_argmax)(cls, masks)  # [B, H, W]
            if mode == "fullsum":
                # same compute, tiny host transfer: isolates the cost of
                # shipping the [B, H, W] argmax map through the axon tunnel
                # (a remote-tunnel artifact a local host does not pay)
                return cls, jnp.sum(sem, axis=(1, 2)), boxes
            return cls, sem, boxes
        return cls, jnp.sum(masks.astype(jnp.float32), axis=(1, 2, 3)), boxes

    fn = jax.jit(eval_step)
    log("compiling eval forward...")
    t0 = time.time()
    out = fn(params, images, text_embeds)
    jax.tree.map(np.asarray, out)
    log(f"compile+first: {time.time()-t0:.1f}s")

    # multi-run median + band: this bench shows 13.8-18.1 img/s spread across
    # identical runs on the shared tunnel (STATUS.md) — one number is a lie,
    # so run R groups of 10 and report the median group with the band
    runs = int(os.environ.get("BENCH_XDEC_RUNS", 3))
    group_ips = []
    for _ in range(runs):
        lat = []
        for _ in range(10):
            t0 = time.time()
            jax.tree.map(np.asarray, fn(params, images, text_embeds))
            lat.append(time.time() - t0)
        p50 = float(np.percentile(np.asarray(lat), 50))
        group_ips.append(B / p50)
    group_ips.sort()
    med = float(np.median(group_ips))
    backbone = opt.get("MODEL", {}).get("BACKBONE", {}).get("NAME", "focal-t")
    print(json.dumps({
        "metric": f"xdecoder_{backbone}_seg_images_per_sec_per_chip",
        "value": round(med, 4),
        "unit": "images/s",
        "vs_baseline": None,
        "median": round(med, 4),
        "band": [round(group_ips[0], 4), round(group_ips[-1], 4)],
        "runs": runs,
        "p50_latency_s": round(B / med, 4),
        "image_size": [H, W],
        "batch": B,
        "dtype": str(dtype),
        "backbone": backbone,
        "mode": mode,
    }))


if __name__ == "__main__":
    main()
