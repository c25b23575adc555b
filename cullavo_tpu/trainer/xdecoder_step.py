"""X-Decoder segmentation training step (jit + mesh).

The seg analogue of trainer/step.py: forward_seg_train → weighted loss sum
(criterion weight table, xdecoder_model.py:137-142) → per-param-group AdamW
(trainer/xdecoder_trainer.py:35-167 via cullavo_tpu.trainer.optimizer
.xdecoder_optimizer) → update, all one compiled program; DP sharding via the
same NamedSharding rules.
"""
from __future__ import annotations


import jax
import optax

from cullavo_tpu.models.xdecoder.model import (XDecoderModelConfig,
                                               forward_seg_train)
from cullavo_tpu.parallel.mesh import batch_sharding, param_sharding, replicated
from cullavo_tpu.trainer.step import TrainState


def _cast_compute(tree, compute_dtype):
    """f32 → compute-dtype cast for the forward (mixed precision: the
    optimizer keeps f32 master params; the cast is differentiable, so grads
    flow back in f32).  int/bool leaves pass through."""
    import jax.numpy as jnp

    def cast(a):
        return a.astype(compute_dtype) if a.dtype == jnp.float32 else a
    return jax.tree.map(cast, tree)


def make_xdecoder_train_step(cfg: XDecoderModelConfig,
                             tx: optax.GradientTransformation,
                             remat: bool = False,
                             compute_dtype=None):
    """Returns ``step_fn(state, batch, text_embeds, rng) -> (state, metrics)``.

    ``batch``: {"image" [B, H, W, 3] normalized, targets...,
    optional "grounding_tokens"}.  The whole model trains (state.trainable is
    the full param tree — the reference trains X-Decoder end-to-end).

    ``compute_dtype=jnp.bfloat16`` runs the forward/backward in bf16 with
    f32 master params in the optimizer — the reference's configuration
    (Accelerate mixed_precision: bf16, configs/accel/ddp_accel.yaml); the
    criterion's softmax/log statistics stay f32 internally.
    """
    import functools

    # remat per backbone block (forward_seg_train(remat=True)) — wrapping the
    # WHOLE forward in jax.checkpoint saves nothing at peak (the backward
    # re-runs the full forward with every residual live; see trainer/step.py)
    fwd = functools.partial(forward_seg_train, remat=remat)

    def loss_fn(params, batch, text_embeds, rng):
        targets = {k: batch[k] for k in
                   ("classes", "masks", "boxes", "valid") if k in batch}
        for k in ("grounding_masks", "grounding_valid"):
            if k in batch:
                targets[k] = batch[k]
        image = batch["image"]
        gtok = batch.get("grounding_tokens")
        if compute_dtype is not None:
            params = _cast_compute(params, compute_dtype)
            image = image.astype(compute_dtype)
            text_embeds = text_embeds.astype(compute_dtype)
            if gtok is not None:
                gtok = gtok.astype(compute_dtype)
        losses = fwd(params, cfg, image, targets, text_embeds, rng,
                     grounding_tokens=gtok)
        total = sum(losses.values())
        return total, losses

    def step_fn(state: TrainState, batch, text_embeds, rng):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable, batch, text_embeds, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.trainable)
        new_params = optax.apply_updates(state.trainable, updates)
        metrics = {"loss_total": total,
                   "grad_norm": optax.global_norm(grads), **losses}
        return TrainState(new_params, new_opt, state.step + 1), metrics

    return step_fn


def make_xdecoder_joint_train_step(cfg: XDecoderModelConfig,
                                   tx: optax.GradientTransformation,
                                   remat: bool = False,
                                   compute_dtype=None):
    """Joint multi-task step: mask + bbox + caption + captioning + retrieval
    + grounding in ONE compiled program (the reference's headline objective,
    xdecoder_model.py:137-149).  ``batch`` comes from
    data/coco_caption_grounding.collate_joint plus class_ids/class_mask.

    Returns ``step_fn(state, batch, rng) -> (state, metrics)``; metrics carry
    every loss key from the reference's weight table.
    ``compute_dtype=jnp.bfloat16``: mixed precision as in
    ``make_xdecoder_train_step`` (params + image cast; integer token ids and
    f32 targets untouched).
    """
    import functools

    from cullavo_tpu.models.xdecoder.model import forward_joint_train

    fwd = functools.partial(forward_joint_train, remat=remat)

    def loss_fn(params, batch, rng):
        if compute_dtype is not None:
            params = _cast_compute(params, compute_dtype)
            batch = dict(batch,
                         image=batch["image"].astype(compute_dtype))
        losses = fwd(params, cfg, batch, rng)
        total = sum(losses.values())
        return total, losses

    def step_fn(state: TrainState, batch, rng):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable, batch, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.trainable)
        new_params = optax.apply_updates(state.trainable, updates)
        metrics = {"loss_total": total,
                   "grad_norm": optax.global_norm(grads), **losses}
        return TrainState(new_params, new_opt, state.step + 1), metrics

    return step_fn


# batch leaves that are per-CLASS tables, not per-example rows — replicated
_REPLICATED_BATCH_KEYS = ("class_ids", "class_mask")


def shard_xdecoder_step(step_fn, mesh, state: TrainState, joint: bool = False,
                        batch_keys=None):
    """jit with mesh shardings.  ``joint=False``: the seg step signature
    (state, batch, text_embeds, rng); ``joint=True``: the joint multi-task
    step (state, batch, rng) with ``batch_keys`` naming the batch dict's keys
    (class-token tables replicate; everything else shards on batch)."""
    state_sh = TrainState(
        trainable=param_sharding(state.trainable, mesh),
        opt_state=param_sharding(state.opt_state, mesh),
        step=replicated(mesh))
    if joint:
        bsh = {k: (replicated(mesh) if k in _REPLICATED_BATCH_KEYS
                   else batch_sharding(mesh)) for k in (batch_keys or ())}
        in_sh = (state_sh, bsh, replicated(mesh))
    else:
        in_sh = (state_sh, batch_sharding(mesh), replicated(mesh),
                 replicated(mesh))
    # donate the state: the full-model params + fp32 AdamW moments are ~3x
    # model size — without donation XLA holds old AND new state at the
    # update, doubling peak HBM (same pattern as step.shard_train_step;
    # skip on CPU where donation is unsupported and warns)
    donate = (0,) if jax.default_backend() != "cpu" else ()
    return jax.jit(step_fn, in_shardings=in_sh,
                   out_shardings=(state_sh, replicated(mesh)),
                   donate_argnums=donate)
