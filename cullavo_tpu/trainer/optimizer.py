"""Optimizers and LR schedules.

Parity targets:
  * CuLLaVO: AdamW + cosine annealing to ``LAST_LR`` over steps*epochs with
    gradient clipping (trainer/cullavo_trainer.py:11-14, GRAD_MAX clip in
    pipeline/CuLLaVOPipeline.py:90-91) and gradient accumulation
    (``OPTIMIZER.GRAD_CUM`` → Accelerator, trainer/distributed_trainer.py:15).
  * X-Decoder: per-param-group AdamW/SGD with LR multipliers, zero weight
    decay for norms/biases/position embeddings, warmup-cosine or
    warmup-multistep schedules (trainer/xdecoder_trainer.py:31-167) — see
    ``xdecoder_optimizer``.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax


def cosine_annealing(base_lr: float, total_steps: int, eta_min: float = 0.0):
    """torch CosineAnnealingLR semantics: lr(t) = eta_min + (base-eta_min)
    * (1 + cos(pi * t / T)) / 2."""

    def schedule(step):
        t = jnp.minimum(step, total_steps)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * t / total_steps))
        return eta_min + (base_lr - eta_min) * cos

    return schedule


def warmup_cosine(base_lr: float, total_steps: int, warmup_steps: int,
                  warmup_factor: float = 1e-3):
    """detectron2 WarmupCosineLR semantics (linear warmup then cosine to 0)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        alpha = jnp.clip(step / jnp.maximum(warmup_steps, 1), 0.0, 1.0)
        wf = warmup_factor * (1 - alpha) + alpha
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * step / total_steps))
        return jnp.where(step < warmup_steps, base_lr * wf, base_lr * cos)

    return schedule


def warmup_multistep(base_lr: float, milestones: Sequence[int], gamma: float,
                     warmup_steps: int, warmup_factor: float = 1e-3):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        alpha = jnp.clip(step / jnp.maximum(warmup_steps, 1), 0.0, 1.0)
        wf = warmup_factor * (1 - alpha) + alpha
        decay = gamma ** jnp.sum(jnp.asarray([step >= m for m in milestones]))
        return jnp.where(step < warmup_steps, base_lr * wf, base_lr * decay)

    return schedule


def cullavo_optimizer(
    base_lr: float,
    total_steps: int,
    eta_min: float = 0.0,
    weight_decay: float = 0.0,
    grad_clip: float = 10.0,
    grad_accum: int = 1,
) -> optax.GradientTransformation:
    """AdamW + cosine annealing + total-norm clip (+ accumulation)."""
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(cosine_annealing(base_lr, total_steps, eta_min),
                    weight_decay=weight_decay),
    )
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx


def xdecoder_optimizer(
    base_lr: float,
    total_steps: int,
    weight_decay: float = 0.05,
    wd_norm: float = 0.0,
    wd_embed: float = 0.0,
    backbone_lr_multiplier: float = 0.1,
    lang_lr_multiplier: float = 0.1,
    grad_clip: float = 0.01,
    warmup_steps: int = 10,
    schedule: str = "cosine",
    milestones: Sequence[int] = (),
    gamma: float = 0.1,
    path_class: Optional[Callable[[tuple], str]] = None,
) -> optax.GradientTransformation:
    """Per-param-group AdamW mirroring trainer/xdecoder_trainer.py:35-167.

    ``path_class(path) -> {"backbone","lang","norm","embed","default"}``
    classifies each leaf; lr multipliers and wd overrides apply per class.
    """
    if schedule == "cosine":
        sched = warmup_cosine(base_lr, total_steps, warmup_steps)
    else:
        sched = warmup_multistep(base_lr, milestones, gamma, warmup_steps)

    def classify(path, _leaf) -> str:
        if path_class is not None:
            return path_class(path)
        names = "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path).lower()
        if "backbone" in names:
            return "backbone"
        if "lang" in names or "text" in names:
            return "lang"
        if any(t in names for t in ("norm", "ln", "bias", "_b")):
            return "norm"
        if "embed" in names or "query_feat" in names or "pos" in names:
            return "embed"
        return "default"

    def make_group(lr_mult: float, wd: float):
        return optax.adamw(lambda s: sched(s) * lr_mult, weight_decay=wd)

    transforms = {
        "backbone": make_group(backbone_lr_multiplier, weight_decay),
        "lang": make_group(lang_lr_multiplier, weight_decay),
        "norm": make_group(1.0, wd_norm),
        "embed": make_group(1.0, wd_embed),
        "default": make_group(1.0, weight_decay),
    }

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(classify, params)

    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.multi_transform(transforms, label_fn),
    )
