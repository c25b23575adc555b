"""Chip probe: XDecoderPipeline eval throughput through the PRODUCT path
(per-image metrics included), batched vs the reference-shaped batch-1 loop.

bench_xdecoder.py measures the raw forward; this runs the actual pipeline
(bucketing, semantic argmax, confusion-matrix update per image) on synth
512² records — the number a real 5k-image val set would see.

Usage: SEG_PIPE_BATCH=8 SEG_PIPE_N=48 python scripts/seg_pipeline_probe.py
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from cullavo_tpu.config import load_config
    from cullavo_tpu.models.from_config import xdecoder_model_config_from
    from cullavo_tpu.models.xdecoder.model import init_xdecoder_model_params
    from cullavo_tpu.pipelines.xdecoder_pipeline import (EvalTasks,
                                                         XDecoderPipeline)

    B = int(os.environ.get("SEG_PIPE_BATCH", 8))
    N = int(os.environ.get("SEG_PIPE_N", 48))
    S = int(os.environ.get("SEG_PIPE_SIZE", 512))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    opt = load_config([os.path.join(repo, "configs/xdecoder_test.yaml")])
    cfg = xdecoder_model_config_from(opt)
    print("init params (jit)...", file=sys.stderr)
    params = jax.block_until_ready(jax.jit(
        lambda k: init_xdecoder_model_params(cfg, k))(jax.random.PRNGKey(0)))
    text_embeds = jax.random.normal(
        jax.random.PRNGKey(1), (cfg.num_classes + 1, cfg.decoder.dim_proj))

    rng = np.random.default_rng(0)
    rows = [{"image_id": i,
             "image": rng.normal(size=(S, S, 3)).astype(np.float32),
             "sem_seg": rng.integers(0, cfg.num_classes, (S, S)).astype(np.int64)}
            for i in range(N)]

    # SEG_PIPE_TASKS: semantic (default) | panoptic | instance | all — the
    # panoptic/instance modes exercise the round-4 device-fused inference
    # (compact id maps / bit-packed instance planes instead of [Q, H, W])
    mode = os.environ.get("SEG_PIPE_TASKS", "semantic")
    tasks = {
        "semantic": EvalTasks(semantic=True),
        "panoptic": EvalTasks(semantic=True, panoptic=True),
        "instance": EvalTasks(semantic=False, instance=True),
        "all": EvalTasks(semantic=True, panoptic=True, instance=True),
    }[mode]
    pipe = XDecoderPipeline(opt, cfg, params, text_embeds,
                            tasks=tasks, eval_batch=B)
    out = pipe.evaluate_model(list(rows), warmup=1,
                              thing_ids=frozenset(range(54)))
    t = out["timing"]
    print(json.dumps({
        "metric": "xdecoder_pipeline_eval_images_per_s",
        "tasks": mode,
        "value": round(t.get("images_per_s", 0.0), 2),
        "unit": "images/s", "eval_batch": B, "n_images": N,
        "image_size": S,
        "compute_s_per_batch": round(t["compute_s"], 4),
        "eval_s_per_batch": round(t["eval_s"], 4),
        "data_s_per_batch": round(t["data_s"], 4),
    }))


if __name__ == "__main__":
    main()
