"""X-Decoder segmentation training-step throughput on one TPU chip.

Full xdecoder_test.yaml architecture (focal-L backbone, FPN, 201-query
decoder) training at 512×512 with Hungarian-matched set criterion — the
reference's cullavo-adjacent seg training workload (XDecoder_Trainer +
SetCriterion).  Random images/targets; per-group AdamW; optional per-block
remat (XDEC_TRAIN_REMAT=1).

Prints ONE JSON line {"metric": "xdecoder_seg_train_images_per_sec", ...}.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("XDEC_TRAIN_BATCH", 8))
H = W = int(os.environ.get("XDEC_TRAIN_SIZE", 512))
MAX_INST = 20
STEPS = 6


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
    from cullavo_tpu.models.xdecoder.model import init_xdecoder_model_params
    from cullavo_tpu.trainer.optimizer import xdecoder_optimizer
    from cullavo_tpu.trainer.step import TrainState
    from cullavo_tpu.trainer.xdecoder_step import make_xdecoder_train_step

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    opt = load_config([os.path.join(repo, "configs/xdecoder_test.yaml")])
    cfg = xdecoder_model_config_from(opt)
    np_override = int(os.environ.get("XDEC_TRAIN_POINTS", 0))
    if np_override:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, criterion=dataclasses.replace(cfg.criterion,
                                               num_points=np_override))
    log("init params (jit)...")
    params = jax.block_until_ready(
        jax.jit(lambda k: init_xdecoder_model_params(cfg, k))(jax.random.PRNGKey(0)))

    tx = xdecoder_optimizer(base_lr=1e-4, total_steps=1000, grad_clip=0.01,
                            warmup_steps=10)
    state = TrainState(params, jax.jit(tx.init)(params), jnp.int32(0))
    state = jax.block_until_ready(state)

    rng = np.random.default_rng(0)
    masks = np.zeros((B, MAX_INST, H // 4, W // 4), np.float32)
    for b in range(B):
        for i in range(MAX_INST):
            y0, x0 = rng.integers(0, H // 8, 2)
            masks[b, i, y0:y0 + 40, x0:x0 + 40] = 1.0
    batch = {
        "image": jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32)),
        "classes": jnp.asarray(rng.integers(0, cfg.num_classes, size=(B, MAX_INST))),
        "masks": jnp.asarray(masks),
        "boxes": jnp.asarray(rng.random((B, MAX_INST, 4)).astype(np.float32) * 0.4 + 0.1),
        "valid": jnp.asarray(np.ones((B, MAX_INST), bool)),
    }
    text_embeds = jax.random.normal(jax.random.PRNGKey(2),
                                    (cfg.num_classes + 1, cfg.decoder.dim_proj))

    remat = os.environ.get("XDEC_TRAIN_REMAT", "1") == "1"
    # bf16 = the reference's mixed-precision training config (Accelerate
    # bf16); f32 master params stay in the optimizer
    dtype_name = os.environ.get("XDEC_TRAIN_DTYPE", "bf16")
    compute_dtype = jnp.bfloat16 if dtype_name == "bf16" else None
    joint = os.environ.get("XDEC_TRAIN_JOINT", "0") == "1"
    if joint:
        # the full multi-task objective (seg + caption + captioning +
        # retrieval + grounding, deep-supervised on the top-3 layers) —
        # VERDICT r2 #2's re-measure target
        from cullavo_tpu.trainer.xdecoder_step import (
            make_xdecoder_joint_train_step)

        T = cfg.text.context_length
        V = cfg.text.vocab_size
        P, G = 4, 2
        gm = np.zeros((B, G, H // 4, W // 4), np.float32)
        gm[:, :, 20:80, 20:80] = 1.0
        batch.update({
            "labels_hash": jnp.asarray(rng.integers(
                1, 1 << 30, size=(B, MAX_INST)).astype(np.int64)),
            "class_ids": jnp.asarray(rng.integers(
                1, V - 1, size=(cfg.num_classes + 1, T)).astype(np.int32)),
            "class_mask": jnp.ones((cfg.num_classes + 1, T), jnp.int32),
            "caption_ids": jnp.asarray(rng.integers(
                1, V - 1, size=(B, P, T)).astype(np.int32)),
            "caption_mask": jnp.ones((B, P, T), jnp.int32),
            "caption_hash": jnp.asarray(rng.integers(
                1, 1 << 30, size=(B, P)).astype(np.int64)),
            "caption_valid": jnp.ones((B, P), bool),
            "caption_text_ids": jnp.asarray(rng.integers(
                1, V - 1, size=(B, T)).astype(np.int32)),
            "caption_text_mask": jnp.ones((B, T), jnp.int32),
            "grounding_ids": jnp.asarray(rng.integers(
                1, V - 1, size=(B, G, T)).astype(np.int32)),
            "grounding_token_mask": jnp.ones((B, G, T), jnp.int32),
            "grounding_hash": jnp.asarray(rng.integers(
                1, 1 << 30, size=(B, G)).astype(np.int64)),
            "grounding_valid": jnp.ones((B, G), bool),
            "grounding_masks": jnp.asarray(gm),
        })
        jstep = jax.jit(make_xdecoder_joint_train_step(
            cfg, tx, remat=remat, compute_dtype=compute_dtype),
            donate_argnums=(0,))
        step = lambda st, b, te, k: jstep(st, b, k)
    else:
        step = jax.jit(make_xdecoder_train_step(cfg, tx, remat=remat,
                                                compute_dtype=compute_dtype),
                       donate_argnums=(0,))
    log(f"compiling train step (remat={remat}, dtype={dtype_name}, "
        f"joint={joint})...")
    t0 = time.time()
    state, m = step(state, batch, text_embeds, jax.random.PRNGKey(1))
    loss0 = float(np.asarray(m["loss_total"]))
    log(f"compile+step1 {time.time()-t0:.1f}s loss={loss0:.3f}")

    t0 = time.time()
    for s in range(STEPS):
        state, m = step(state, batch, text_embeds, jax.random.PRNGKey(s + 2))
    float(np.asarray(m["loss_total"]))       # host transfer barrier
    dt = (time.time() - t0) / STEPS

    if os.environ.get("XDEC_TRAIN_TRACE"):
        from _trace_util import trace_and_top_ops

        def one_step():
            nonlocal state
            state, mm = step(state, batch, text_embeds, jax.random.PRNGKey(99))
            float(np.asarray(mm["loss_total"]))

        log(json.dumps(trace_and_top_ops(one_step), indent=1))
    print(json.dumps({
        "metric": ("xdecoder_joint_train_images_per_sec_per_chip" if joint
                   else "xdecoder_seg_train_images_per_sec_per_chip"),
        "value": round(B / dt, 3),
        "unit": "images/s",
        "step_s": round(dt, 4),
        "batch": B, "image_size": [H, W], "max_instances": MAX_INST,
        "remat": remat, "backbone": "focal-l", "dtype": dtype_name,
    }))


if __name__ == "__main__":
    main()
