"""Full-7B quantized Q-LoRA training step on one real TPU chip.

Run from anywhere: ``python scripts/train7b_probe.py`` — random weights at
the exact LLaVA-1.5-7B architecture, NF4 base (C++ quantizer), LoRA r=64,
reference trainable set, AdamW+cosine, remat backward.

``PROBE_QUANT=int8``: the reference's other Q-LoRA base mode (BITS: 8 →
bitsandbytes Linear8bitLt, load_cullavo.py:65-83).  With SmoothQuant
calibration the training forward's base matmuls take the native s8s8 MXU
path (2× MAC rate at prefill-sized M; x-grads exact via the custom VJP) —
the backward's dy@W^T stays the bf16 convert-in-dot stream.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
os.environ["CULLAVO_NF4_PALLAS"] = "1"
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/cullavo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from cullavo_tpu.models.llava.config import LlavaConfig, LlamaConfig
from cullavo_tpu.models.llava.clip_vit import init_clip_vision_params
from cullavo_tpu.models.llava.lora import (LoraConfig, init_lora_params,
                                           strip_trainable, trainable_partition)
from cullavo_tpu.native import nf4_quantize_planar_native
from cullavo_tpu.trainer.optimizer import cullavo_optimizer
from cullavo_tpu.trainer.step import TrainState, make_train_step

def log(*a): print(*a, file=sys.stderr, flush=True)

cfg = LlavaConfig()
tc: LlamaConfig = cfg.text
L, D, I = tc.num_hidden_layers, tc.hidden_size, tc.intermediate_size
H, KV, hd = tc.num_attention_heads, tc.num_key_value_heads, tc.head_dim
shapes = {"q": (L, D, H*hd), "k": (L, D, KV*hd), "v": (L, D, KV*hd),
          "o": (L, H*hd, D), "gate": (L, D, I), "up": (L, D, I), "down": (L, I, D)}
t0 = time.time()
layers = {}
probe_quant = os.environ.get("PROBE_QUANT", "nf4")
for i, (name, shape) in enumerate(shapes.items()):
    if probe_quant == "int8":
        from cullavo_tpu.ops.nf4 import quantize_linear_int8
        # SmoothQuant-calibrated (synthetic scales — the COST is what the
        # probe prices): enables the s8s8 MXU forward in training
        sm = np.exp(np.random.default_rng(1234).normal(
            0.0, 0.3, shape[-2])).astype(np.float32)
        fn = jax.jit(lambda k, s=shape, sm=sm: quantize_linear_int8(
            (jax.random.normal(k, s) * (s[-2] ** -0.5)).astype(jnp.bfloat16),
            smooth_scale=sm))
        layers[name] = fn(jax.random.PRNGKey(i))
    elif os.environ.get("PROBE_NF4_HOST_QUANT"):
        # production import path: C++ host quantize + upload (slow over the
        # tunnel: ~minutes/weight; values don't affect a speed probe)
        host_rng = np.random.default_rng(i)
        n_el = int(np.prod(shape))
        block = host_rng.standard_normal(1 << 20, dtype=np.float32) * (shape[-2] ** -0.5)
        w = np.tile(block, n_el // (1 << 20) + 1)[:n_el].reshape(shape)
        q = nf4_quantize_planar_native(w); del w
        layers[name] = jax.device_put(jax.tree.map(jnp.asarray, q))
    else:
        from cullavo_tpu.ops.nf4 import synthetic_planar_nf4
        fn = jax.jit(lambda k, s=shape: synthetic_planar_nf4(*s, k))
        layers[name] = fn(jax.random.PRNGKey(i))
    jax.block_until_ready(layers[name]); log(f"  {name} ready")
layers["input_ln"] = jnp.ones((L, D), jnp.bfloat16)
layers["post_ln"] = jnp.ones((L, D), jnp.bfloat16)
small = jax.jit(lambda k: {
    "vision_tower": init_clip_vision_params(cfg.vision, k, jnp.bfloat16),
    "projector": {
        "linear_1": {"kernel": jax.random.normal(k, (cfg.vision.hidden_size, D)).astype(jnp.bfloat16) * 0.02,
                     "bias": jnp.zeros((D,), jnp.bfloat16)},
        "linear_2": {"kernel": jax.random.normal(k, (D, D)).astype(jnp.bfloat16) * 0.02,
                     "bias": jnp.zeros((D,), jnp.bfloat16)}},
    "embed_tokens": (jax.random.normal(k, (tc.vocab_size, D)) * 0.02).astype(jnp.bfloat16),
    "lm_head": (jax.random.normal(k, (D, tc.vocab_size)) * 0.02).astype(jnp.bfloat16),
    "norm": jnp.ones((D,), jnp.bfloat16)})(jax.random.PRNGKey(99))
small = jax.block_until_ready(small)
params = {"vision_tower": small["vision_tower"], "projector": small["projector"],
          "language_model": {"embed_tokens": small["embed_tokens"],
                             "lm_head": small["lm_head"], "norm": small["norm"],
                             "layers": layers}}
log(f"7B {probe_quant} base built in {time.time()-t0:.0f}s")

lora_cfg = LoraConfig()   # r=64, alpha=16, reference target set
lora = jax.jit(lambda k: init_lora_params(params, cfg, lora_cfg, k))(jax.random.PRNGKey(1))
lora = jax.block_until_ready(lora)
trainable = trainable_partition(params, lora)
frozen = strip_trainable(params)
tx = cullavo_optimizer(base_lr=2e-5, total_steps=100, grad_clip=10.0)
state = TrainState(trainable, jax.jit(tx.init)(trainable), jnp.zeros((), jnp.int32))
log("LoRA + optimizer ready")

B, text_len = int(os.environ.get("PROBE_B", 2)), int(os.environ.get("PROBE_TEXT", 71))
n_img = cfg.num_image_tokens
T = 1 + n_img + text_len
rng = np.random.default_rng(0)
ids = rng.integers(4, 32000, size=(B, T)).astype(np.int32)
ids[:, 1:1+n_img] = cfg.image_token_id
labels = ids.copy(); labels[:, :1+n_img+8] = -100
batch = {"input_ids": jnp.asarray(ids),
         "attention_mask": jnp.ones((B, T), jnp.int32),
         "labels": jnp.asarray(labels),
         "pixel_values": jnp.asarray(rng.normal(size=(B, 3, 336, 336)).astype(np.float32)),
         "weights": jnp.ones((B,), jnp.float32)}
step = jax.jit(make_train_step(cfg, lora_cfg, tx, remat=True,
                               compute_dtype=jnp.bfloat16, loss_chunk=256),
               donate_argnums=(0,))
# donation: trainable+opt state update in place (fp32 embed/lm_head +
# AdamW moments are ~8 GB at 7B; an undonated copy OOMs the 16 GB HBM)
if os.environ.get("PROBE_HLO"):
    # post-optimization HLO text (compile only, no execution) — with the
    # persistent cache warm this is fast; used to map trace fusion ids back
    # to source dots (PROBE_HLO=path writes there, =1 prints fusion lines)
    lowered = jax.jit(make_train_step(cfg, lora_cfg, tx, remat=True,
                                      compute_dtype=jnp.bfloat16,
                                      loss_chunk=256),
                      donate_argnums=(0,)).lower(
        state, frozen, batch, jax.random.PRNGKey(2))
    txt = lowered.compile().as_text()
    dest = os.environ["PROBE_HLO"]
    if dest != "1":
        open(dest, "w").write(txt)
        log(f"wrote {len(txt)/1e6:.1f} MB HLO to {dest}")
    else:
        for line in txt.splitlines():
            if "fusion" in line and "= " in line:
                print(line[:200])
    sys.exit(0)

log("compiling 7B Q-LoRA train step...")
t0 = time.time()
state, m = step(state, frozen, batch, jax.random.PRNGKey(2))
loss0 = float(m["loss_llm"]); log(f"compile+step1: {time.time()-t0:.0f}s loss={loss0:.4f}")
times, losses = [], [loss0]
for i in range(4):
    t0 = time.time()
    state, m = step(state, frozen, batch, jax.random.PRNGKey(3+i))
    losses.append(float(m["loss_llm"]))   # float() = host sync
    times.append(time.time()-t0)
print(f"7B Q-LoRA steps: losses={['%.4f'%l for l in losses]} "
      f"step_time p50={np.median(times):.2f}s grad_norm={float(m['grad_norm']):.3f}")

if os.environ.get("PROBE_TRACE"):
    import json as _json

    from _trace_util import trace_and_top_ops

    def one_step():
        global state
        state, mm = step(state, frozen, batch, jax.random.PRNGKey(42))
        float(mm["loss_llm"])         # host sync = true barrier on axon

    print(_json.dumps(trace_and_top_ops(one_step), indent=1))
