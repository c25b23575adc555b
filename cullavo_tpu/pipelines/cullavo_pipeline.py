"""CuLLaVO training/eval pipeline.

Capability parity with pipeline/CuLLaVOPipeline.py: step1/step2 Q-LoRA
training over LLaVA (forward_step: loss → backward → clip → step, :76-93) and
the step2_pre model-in-the-loop dataset generation "eval" (:95-133 — generate,
parse boxes/classes, draw, emit JSON rows, all-gather shards, rank0 writes).

The workload dispatch the reference does on *config file name*
(modeling/architectures/cullavo_model.py:45-57) is an explicit ``workload``
config key here: ``step1 | step2 | step2_pre``.
"""
from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cullavo_tpu.data.step1_synthesis import collate_step1, synthesize_step1
from cullavo_tpu.data.text_format import COLOR_LIST, draw_boxes, parse_boxes_and_classes
from cullavo_tpu.models.llava.config import LlavaConfig
from cullavo_tpu.models.llava.lora import (LoraConfig, init_lora_params,
                                           strip_trainable, trainable_partition)
from cullavo_tpu.models.llava.modeling import GenerationConfig, generate
from cullavo_tpu.pipelines.base import register_pipeline
from cullavo_tpu.trainer.optimizer import cullavo_optimizer
from cullavo_tpu.trainer.step import TrainState, make_train_step, shard_train_step


@register_pipeline("CuLLaVOPipeline")
class CuLLaVOPipeline:
    """Owns model config + tokenizer + data synthesis + the jitted step."""

    def __init__(self, cfg, model_cfg: LlavaConfig, tokenizer, params,
                 mesh=None, dataset_fn=None):
        self.cfg = cfg
        self.model_cfg = model_cfg
        self.tokenizer = tokenizer
        self.params = params
        self.mesh = mesh
        self.dataset_fn = dataset_fn
        self.workload = cfg.get("WORKLOAD", "step1")
        self._rng = np.random.default_rng(cfg.get("SEED", 0))

    # -- model ------------------------------------------------------------
    def initialize_model(self):
        opt = self.cfg.get("OPTIMIZER", {})
        llm_cfg = (self.cfg.get("MODEL", {}) or {}).get("LLM", {}) \
            if "MODEL" in self.cfg else {}
        bits = int(llm_cfg.get("BITS", 0) or 0) if hasattr(llm_cfg, "get") else 0
        # the reference's Q-LoRA base is quantized at load
        # (cullavo_step1.yaml LLM.BITS: 4 → NF4, load_cullavo.py:65-83;
        # BITS: 8 → LLM.int8) — apply it on the config path too, not
        # just when callers pre-quantize (maybe_quantize_base no-ops on
        # already-quantized dicts)
        from cullavo_tpu.models.llava.lora import maybe_quantize_base

        self.params = maybe_quantize_base(self.params, bits)
        def _opt_get(key, default):
            for src in (llm_cfg, opt):
                if hasattr(src, "get") and src.get(key) is not None:
                    return src.get(key)
            return default

        lora_cfg = LoraConfig(
            r=int(_opt_get("LORA_R", 64)),
            alpha=float(_opt_get("LORA_ALPHA", 16)),
            dropout=0.05,
            # the reference pins range(12, 23) of the 24-layer CLIP tower
            # (load_cullavo.py:106); configurable so tiny towers can carry
            # adapters too (real-layout train drill)
            vision_layer_start=int(_opt_get("LORA_VISION_START", 12)),
            vision_layer_stop=int(_opt_get("LORA_VISION_STOP", 23)))
        lora = init_lora_params(self.params, self.model_cfg, lora_cfg,
                                jax.random.PRNGKey(1))
        trainable = trainable_partition(self.params, lora)
        frozen = strip_trainable(self.params)
        lr = float(self.cfg.get("LR", 2e-5))
        steps = int(self.cfg.get("TOTAL_STEPS", 1000))
        tx = cullavo_optimizer(lr, steps,
                               eta_min=float(self.cfg.get("LAST_LR", 0.0)),
                               grad_clip=float(self.cfg.get("GRAD_MAX", 10.0)),
                               grad_accum=int(self.cfg.get("GRAD_CUM", 1)))
        state = TrainState(trainable, tx.init(trainable), jnp.zeros((), jnp.int32))
        # production memory configuration (see the training-memory commit):
        # per-layer remat, bf16 compute over fp32 masters (the reference's
        # Accelerate-bf16), chunked CE so [B,T,V] logits never materialize
        step_fn = make_train_step(self.model_cfg, lora_cfg, tx, remat=True,
                                  compute_dtype=jnp.bfloat16, loss_chunk=256)
        if self.mesh is not None:
            jitted = shard_train_step(step_fn, self.mesh, state, frozen)
        else:
            jitted = jax.jit(step_fn)
        self.state, self.frozen, self.step_fn = state, frozen, jitted
        self.lora_cfg = lora_cfg
        return state

    # -- data -------------------------------------------------------------
    def make_batch(self, records: list, pad_to: Optional[int] = None) -> dict:
        """step1: synthesize prompts in the input pipeline (not model.forward)."""
        samples = [synthesize_step1(r, self.tokenizer, self._rng) for r in records]
        batch = collate_step1(samples, self.tokenizer,
                              self.model_cfg.num_image_tokens, pad_to=pad_to,
                              image_size=self.model_cfg.vision.image_size)
        return {k: jnp.asarray(v) for k, v in batch.items()}

    # -- train ------------------------------------------------------------
    def forward_step(self, state, batch, rng):
        new_state, metrics = self.step_fn(state, self.frozen, batch, rng)
        return new_state, metrics

    # -- step2_pre data generation ---------------------------------------
    def generate_step2_rows(self, images_u8: np.ndarray, prompts_ids: np.ndarray,
                            attention_mask: np.ndarray, out_dir: str,
                            pixel_values: np.ndarray, max_new_tokens: int = 256,
                            parallel_ctx=None, batch_size: Optional[int] = None,
                            index_offset: int = 0):
        """Model-in-the-loop enrichment (arch_cullavo.py:341-543): sample a
        caption+boxes continuation, parse, rasterize, emit dataset rows.

        Generation runs in ``batch_size`` chunks (default: BATCH_SIZE config,
        8) — a real dataset is tens of thousands of rows, and one mega-batch
        would allocate a KV cache of hundreds of GB.  The final short chunk
        is padded by repetition so every chunk reuses ONE compiled program.
        ``pixel_values=None`` preprocesses each chunk from ``images_u8``
        lazily (full-dataset [N,3,336,336] fp32 is ~1.5 MB/image host RAM).
        ``index_offset``: this rank's global start index into the full
        record list — image filenames are ``step2_{offset+b}.png`` so a
        multi-process run (each rank generating its shard into a shared
        out_dir) never collides."""
        gen = GenerationConfig(max_new_tokens=max_new_tokens, do_sample=True,
                               temperature=0.9, top_k=50, top_p=0.95,
                               eos_token_id=self.tokenizer.eos_token_id)
        N = prompts_ids.shape[0]
        bs = int(batch_size or self.cfg.get("BATCH_SIZE", 8))
        bs = max(1, min(bs, N))
        rows = []
        os.makedirs(out_dir, exist_ok=True)
        for start in range(0, N, bs):
            sel = np.arange(start, min(start + bs, N))
            pad = np.concatenate([sel, np.full(bs - len(sel), sel[-1])]) \
                if len(sel) < bs else sel
            if pixel_values is None:
                from cullavo_tpu.data.image_processing import preprocess_numpy

                pix = preprocess_numpy([np.asarray(images_u8[b]) for b in pad],
                                       size=self.model_cfg.vision.image_size)
            else:
                pix = pixel_values[pad]
            out = generate(
                self.params, self.model_cfg, jnp.asarray(prompts_ids[pad]),
                jnp.asarray(pix), jnp.asarray(attention_mask[pad]),
                gen, max_len=prompts_ids.shape[1] + max_new_tokens,
                rng=jax.random.PRNGKey(int(self._rng.integers(1 << 31))))
            for j, b in enumerate(sel):
                text = self.tokenizer.decode(np.asarray(out[j]))
                boxes, classes, err = parse_boxes_and_classes(text)
                if err or boxes is None or len(boxes) == 0:
                    continue
                H, W = images_u8[b].shape[:2]
                abs_boxes = boxes * np.asarray([W, H, W, H], np.float32)
                colors = COLOR_LIST[:len(boxes)]
                drawn = draw_boxes(images_u8[b], abs_boxes, colors)
                img_name = f"step2_{index_offset + b}.png"
                self._save_png(os.path.join(out_dir, img_name), drawn)
                rows.append({"image": img_name, "boxes": boxes.tolist(),
                             "classes": classes, "text": text})
        if parallel_ctx is not None:
            gathered = parallel_ctx.allgather_objects(rows)
            rows = [r for shard in gathered for r in shard]
            if not parallel_ctx.is_main:
                return rows
        with open(os.path.join(out_dir, "lbk_new_version.json"), "w") as f:
            json.dump(rows, f)
        return rows

    @staticmethod
    def _save_png(path: str, arr: np.ndarray):
        try:
            from PIL import Image

            Image.fromarray(arr).save(path)
        except ImportError:
            np.save(path + ".npy", arr)

    def evaluate_model(self):
        raise NotImplementedError("use generate_step2_rows for step2_pre")
