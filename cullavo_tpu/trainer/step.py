"""The CuLLaVO training step: Q-LoRA fine-tuning of LLaVA under jit+mesh.

Replaces the reference's Accelerate loop (trainer/default_trainer.py:147-198 +
pipeline/CuLLaVOPipeline.py:76-93): forward → masked CE → backward → clip →
AdamW step, with gradient accumulation, all as ONE compiled XLA program per
step.  DP/FSDP/TP sharding is expressed with NamedSharding on the state; the
grad all-reduce the reference gets from DDP/NCCL falls out of jit's partitioner
(psum over the data axis).

Per-sample ``weights`` make empty-sample batches a no-op *uniformly across
ranks* — fixing the reference's rank-divergence hazard (SURVEY.md §5,
arch_cullavo.py:135,309).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from cullavo_tpu.models.llava.config import LlavaConfig
from cullavo_tpu.models.llava.lora import LoraConfig, apply_trainable
from cullavo_tpu.models.llava.modeling import llava_forward
from cullavo_tpu.parallel.mesh import batch_sharding, param_sharding, replicated


@dataclasses.dataclass
class TrainState:
    """Pytree train state (trainable params + optimizer state + step)."""
    trainable: Any
    opt_state: Any
    step: jax.Array

    def tree_flatten(self):
        return (self.trainable, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, _aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten)


def weighted_causal_lm_loss(logits, labels, attention_mask, weights,
                            ignore_index: int = -100):
    """Shifted CE with per-sample weights; mean over weighted valid tokens."""
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = (attention_mask[:, 1:] != 0) & (shift_labels != ignore_index)
    safe = jnp.where(valid, shift_labels, 0)
    logprobs = jax.nn.log_softmax(shift_logits, axis=-1)
    ll = jnp.take_along_axis(logprobs, safe[..., None], axis=-1)[..., 0]
    w = valid.astype(jnp.float32) * weights[:, None]
    total = jnp.sum(jnp.where(valid, -ll, 0.0) * w)
    denom = jnp.maximum(jnp.sum(w), 1.0)
    return total / denom


def make_train_step(
    cfg: LlavaConfig,
    lora_cfg: Optional[LoraConfig],
    tx: optax.GradientTransformation,
    remat: bool = True,
):
    """Returns ``step_fn(state, frozen_params, batch, rng) -> (state, metrics)``.

    ``frozen_params`` is the full base param tree (NF4/bf16, not updated);
    ``state.trainable`` holds LoRA adapters + projector + lm_head +
    embed_tokens (load_cullavo.py:128-138 trainable set).
    """
    scaling = lora_cfg.scaling if lora_cfg else 0.0
    dropout = lora_cfg.dropout if lora_cfg else 0.0

    def _forward(full, lora, input_ids, pixel_values, attention_mask, rng):
        logits, _ = llava_forward(full, cfg, input_ids, pixel_values,
                                  attention_mask, lora=lora,
                                  lora_scaling=scaling, lora_dropout=dropout,
                                  dropout_rng=rng)
        return logits

    fwd = (jax.checkpoint(_forward, policy=jax.checkpoint_policies.nothing_saveable)
           if remat else _forward)

    def loss_fn(trainable, frozen_params, batch, rng):
        full, lora = apply_trainable(frozen_params, trainable)
        logits = fwd(full, lora, batch["input_ids"], batch.get("pixel_values"),
                     batch["attention_mask"], rng)
        loss = weighted_causal_lm_loss(logits, batch["labels"],
                                       batch["attention_mask"], batch["weights"])
        return loss

    def step_fn(state: TrainState, frozen_params, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.trainable, frozen_params,
                                                  batch, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.trainable)
        new_trainable = optax.apply_updates(state.trainable, updates)
        gnorm = optax.global_norm(grads)
        new_state = TrainState(new_trainable, new_opt, state.step + 1)
        return new_state, {"loss_llm": loss, "grad_norm": gnorm}

    return step_fn


def shard_train_step(step_fn, mesh, state: TrainState, frozen_params):
    """jit the step with explicit shardings: trainable+opt state FSDP-sharded,
    frozen params FSDP/TP-sharded, batch sharded over (data, fsdp).

    ``state`` is donated, so its buffers must be exclusively owned: no leaf
    may alias ``frozen_params`` (pass the base tree through
    ``strip_trainable`` — asserted below) and no OTHER live TrainState may
    share its arrays (donation while a previous computation still reads the
    shared buffer is silent corruption under async dispatch, not an error).
    """
    state_ids = {id(leaf) for leaf in jax.tree.leaves(state)}
    for leaf in jax.tree.leaves(frozen_params):
        if id(leaf) in state_ids:
            raise ValueError(
                "frozen_params shares a buffer with the (donated) train state; "
                "use cullavo_tpu.models.llava.lora.strip_trainable on the base "
                "params before passing them as the frozen side")
    state_sh = TrainState(
        trainable=param_sharding(state.trainable, mesh),
        opt_state=param_sharding(state.opt_state, mesh),
        step=replicated(mesh),
    )
    frozen_sh = param_sharding(frozen_params, mesh)
    batch_sh = batch_sharding(mesh)
    rep = replicated(mesh)

    # Donation halves peak HBM for the state update on TPU.  On the CPU
    # backend (virtual-device tests) XLA's buffer reuse has been observed to
    # overwrite live unrelated outputs under donation — disable it there.
    donate = (0,) if jax.default_backend() != "cpu" else ()
    return jax.jit(
        step_fn,
        in_shardings=(state_sh, frozen_sh, batch_sh, rep),
        out_shardings=(state_sh, rep),
        donate_argnums=donate,
    )
