"""Q-LoRA training-step throughput on one TPU chip.

The 7B model needs the mesh (see STATUS: trainable+opt double-buffering
through the axon AOT helper wants ~22 GB), so this measures the single-chip
training path at a 1.3B-class LLaVA config — the same jitted step the
cullavo_step1 workload runs: int8 frozen base + LoRA r=64 adapters +
projector/lm_head/embed trainable, AdamW + cosine, remat, 576 image tokens
+ text (B=8, T=1024 by default).

Prints ONE JSON line: {"metric": "qlora_train_tokens_per_sec_per_chip", ...}.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("TRAIN_BENCH_BATCH", 8))
TEXT = int(os.environ.get("TRAIN_BENCH_TEXT", 447))
STEPS = 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/cullavo_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from cullavo_tpu.models.llava.config import (ClipVisionConfig, LlamaConfig,
                                                 LlavaConfig)
    from cullavo_tpu.models.llava.lora import (LoraConfig, init_lora_params,
                                               strip_trainable)
    from cullavo_tpu.ops.nf4 import quantize_linear_int8
    from cullavo_tpu.trainer.optimizer import cullavo_optimizer
    from cullavo_tpu.trainer.step import TrainState, make_train_step

    text = LlamaConfig(vocab_size=32064, hidden_size=2048,
                       intermediate_size=5504, num_hidden_layers=24,
                       num_attention_heads=16, num_key_value_heads=16,
                       max_position_embeddings=2048)
    cfg = LlavaConfig(text=text)
    n_llm = (24 * (4 * 2048 * 2048 + 3 * 2048 * 5504) + 2 * 32064 * 2048) / 1e9
    log(f"~{n_llm:.2f}B-param LLM; building params...")

    # frozen base: int8 LLM matmul weights, bf16 everything else
    L, D, I = text.num_hidden_layers, text.hidden_size, text.intermediate_size
    H, KV, hd = text.num_attention_heads, text.num_key_value_heads, text.head_dim
    shapes = {"q": (L, D, H * hd), "k": (L, D, KV * hd), "v": (L, D, KV * hd),
              "o": (L, H * hd, D), "gate": (L, D, I), "up": (L, D, I),
              "down": (L, I, D)}
    layers = {}
    for i, (name, shape) in enumerate(shapes.items()):
        fn = jax.jit(lambda k, s=shape: quantize_linear_int8(
            (jax.random.normal(k, s) * (s[-2] ** -0.5)).astype(jnp.bfloat16)))
        layers[name] = jax.block_until_ready(fn(jax.random.PRNGKey(i)))
    layers["input_ln"] = jnp.ones((L, D), jnp.bfloat16)
    layers["post_ln"] = jnp.ones((L, D), jnp.bfloat16)

    from cullavo_tpu.models.llava.clip_vit import init_clip_vision_params

    small = jax.jit(lambda k: {
        "vision_tower": init_clip_vision_params(cfg.vision, k, jnp.bfloat16),
        "projector": {
            "linear_1": {"kernel": (jax.random.normal(k, (cfg.vision.hidden_size, D)) * 0.02).astype(jnp.bfloat16),
                         "bias": jnp.zeros((D,), jnp.bfloat16)},
            "linear_2": {"kernel": (jax.random.normal(k, (D, D)) * 0.02).astype(jnp.bfloat16),
                         "bias": jnp.zeros((D,), jnp.bfloat16)},
        },
        "embed_tokens": (jax.random.normal(k, (text.vocab_size, D)) * 0.02).astype(jnp.bfloat16),
        "lm_head": (jax.random.normal(k, (D, text.vocab_size)) * 0.02).astype(jnp.bfloat16),
        "norm": jnp.ones((D,), jnp.bfloat16),
    })(jax.random.PRNGKey(99))
    small = jax.block_until_ready(small)
    params = {
        "vision_tower": small["vision_tower"],
        "projector": small["projector"],
        "language_model": {"embed_tokens": small["embed_tokens"],
                           "lm_head": small["lm_head"], "norm": small["norm"],
                           "layers": layers},
    }

    from cullavo_tpu.models.llava.lora import trainable_partition

    lora_cfg = LoraConfig()
    lora = jax.jit(lambda k: init_lora_params(params, cfg, lora_cfg, k,
                                              jnp.float32))(jax.random.PRNGKey(7))
    trainable = trainable_partition(params, lora)
    frozen = strip_trainable(params)
    tx = cullavo_optimizer(base_lr=2e-5, total_steps=1000, grad_clip=10.0)
    state = TrainState(trainable, jax.jit(tx.init)(trainable), jnp.int32(0))
    state = jax.block_until_ready(state)
    log("params ready; compiling step...")

    step_fn = jax.jit(make_train_step(cfg, lora_cfg, tx, remat=True,
                                      compute_dtype=jnp.bfloat16,
                                      loss_chunk=256),
                      donate_argnums=(0,))

    n_img = cfg.num_image_tokens
    T = 1 + n_img + TEXT
    rng = np.random.default_rng(0)
    ids = rng.integers(4, 32000, size=(B, T)).astype(np.int32)
    ids[:, 1:1 + n_img] = cfg.image_token_id
    batch = {
        "input_ids": jnp.asarray(ids),
        "pixel_values": jnp.asarray(rng.normal(size=(B, 3, 336, 336)).astype(np.float32)),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "labels": jnp.asarray(rng.integers(4, 32000, size=(B, T)).astype(np.int32)),
        "weights": jnp.ones((B,), jnp.float32),
    }

    t0 = time.time()
    state, metrics = step_fn(state, frozen, batch, jax.random.PRNGKey(0))
    loss0 = float(np.asarray(metrics["loss_llm"]))
    log(f"compile+first step {time.time()-t0:.1f}s loss={loss0:.3f}")

    t0 = time.time()
    for s in range(STEPS):
        state, metrics = step_fn(state, frozen, batch, jax.random.PRNGKey(s + 1))
    float(np.asarray(metrics["loss_llm"]))   # host transfer barrier
    dt = (time.time() - t0) / STEPS
    print(json.dumps({
        "metric": "qlora_train_tokens_per_sec_per_chip",
        "value": round(B * T / dt, 1),
        "unit": "tokens/s",
        "step_s": round(dt, 4),
        "samples_per_s": round(B / dt, 3),
        "batch": B, "seq_len": T, "llm_params_b": round(n_llm, 2),
        "trainable": "lora_r64+projector+lm_head+embed",
        "quant": "int8", "remat": True, "compute": "bf16(master fp32)",
    }))


if __name__ == "__main__":
    main()
