"""Benchmark: LLaVA-1.5-7B VQA-style decode throughput on one TPU chip.

Measures the BASELINE.json metric: images/sec/chip + p50 per-image latency for
the VQAv2-val workload shape (576 image tokens + question prompt, greedy
decode with KV cache).  Weights are random (values don't affect speed) at the
exact LLaVA-1.5-7B architecture; bf16 compute.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
``vs_baseline`` divides by an estimated A100 reference throughput for the
same workload (HF transformers + flash-attn2, batch 1 greedy ≈ 2.0 img/s) —
the reference repo publishes no numbers (BASELINE.md), so this anchor is an
engineering estimate, re-measured never copied.
"""
import json
import sys
import time

import numpy as np

A100_EST_IMG_PER_S = 2.0
PROMPT_TEXT_TOKENS = 64
DECODE_TOKENS = 16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from cullavo_tpu.models.llava.config import LlavaConfig
    from cullavo_tpu.models.llava.modeling import (GenerationConfig, generate,
                                                   init_llava_params)

    cfg = LlavaConfig()
    dev = jax.devices()[0]
    log("device:", dev, "building 7B params (bf16)...")

    t0 = time.time()
    params = init_llava_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    n_params = sum(int(np.prod(a.shape)) for a in jax.tree.leaves(params))
    log(f"params: {n_params/1e9:.2f}B in {time.time()-t0:.1f}s")

    B = 1
    n_img = cfg.num_image_tokens
    T = 1 + n_img + PROMPT_TEXT_TOKENS
    max_len = T + DECODE_TOKENS
    rng = np.random.default_rng(0)
    ids = rng.integers(4, 32000, size=(B, T)).astype(np.int32)
    ids[:, 1:1 + n_img] = cfg.image_token_id
    mask = np.ones_like(ids)
    pix = rng.normal(size=(B, 3, 336, 336)).astype(np.float32)

    gen = GenerationConfig(max_new_tokens=DECODE_TOKENS, do_sample=False,
                           eos_token_id=-1)

    args = (params, cfg, jnp.asarray(ids), jnp.asarray(pix), jnp.asarray(mask))

    log("compiling prefill+decode...")
    t0 = time.time()
    out = generate(*args, gen, max_len=max_len, compute_dtype=jnp.bfloat16)
    first = np.asarray(out)  # host transfer = true completion barrier
    log(f"compile+first run: {time.time()-t0:.1f}s tokens[:4]={first[0,:4].tolist()}")

    lat = []
    for _ in range(8):
        t0 = time.time()
        out = generate(*args, gen, max_len=max_len, compute_dtype=jnp.bfloat16)
        np.asarray(out)  # block: result must reach host to count as served
        lat.append(time.time() - t0)
    lat = np.asarray(lat)
    p50 = float(np.percentile(lat, 50))
    imgs_per_s = B / p50

    print(json.dumps({
        "metric": "llava7b_vqa_images_per_sec_per_chip",
        "value": round(imgs_per_s, 4),
        "unit": "images/s",
        "vs_baseline": round(imgs_per_s / A100_EST_IMG_PER_S, 4),
        "p50_latency_s": round(p50, 4),
        "decode_tokens": DECODE_TOKENS,
        "prompt_tokens": int(T),
        "batch": B,
        "params_b": round(n_params / 1e9, 3),
    }))


if __name__ == "__main__":
    main()
