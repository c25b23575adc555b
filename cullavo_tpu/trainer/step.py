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


def chunked_weighted_causal_lm_loss(hidden, lm_head, labels, attention_mask,
                                    weights, chunk: int = 512,
                                    ignore_index: int = -100):
    """Shifted weighted CE computed in sequence chunks so the [B, T, V] fp32
    logits never materialize — each chunk's ``hidden @ lm_head`` + softmax is
    rematerialized in the backward.  Equal to ``weighted_causal_lm_loss(
    lm_logits(hidden), ...)`` (tested); at B=8 T=1024 V=32k the unchunked
    logits + softmax backward cost ~3 GB of the train step's peak."""
    B, T, D = hidden.shape
    h = hidden[:, :-1]
    lab = labels[:, 1:]
    valid = (attention_mask[:, 1:] != 0) & (lab != ignore_index)
    n = T - 1
    pad = (-n) % chunk
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        lab = jnp.pad(lab, ((0, 0), (0, pad)))
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
    nc = (n + pad) // chunk
    h = h.reshape(B, nc, chunk, D).transpose(1, 0, 2, 3)
    lab = jnp.where(valid, lab, 0).reshape(B, nc, chunk).transpose(1, 0, 2)
    valid = valid.reshape(B, nc, chunk).transpose(1, 0, 2)

    @jax.checkpoint
    def chunk_fn(carry, xs):
        h_c, lab_c, val_c = xs
        logits = jnp.einsum("btd,dv->btv", h_c, lm_head,
                            preferred_element_type=jnp.float32)
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logprobs, lab_c[..., None], axis=-1)[..., 0]
        w = val_c.astype(jnp.float32) * weights[:, None]
        total, denom = carry
        return (total + jnp.sum(jnp.where(val_c, -ll, 0.0) * w),
                denom + jnp.sum(w)), None

    (total, denom), _ = jax.lax.scan(chunk_fn, (jnp.float32(0), jnp.float32(0)),
                                     (h, lab, valid))
    return total / jnp.maximum(denom, 1.0)


def make_train_step(
    cfg: LlavaConfig,
    lora_cfg: Optional[LoraConfig],
    tx: optax.GradientTransformation,
    remat: bool = True,
    compute_dtype=None,
    loss_chunk: Optional[int] = None,
):
    """Returns ``step_fn(state, frozen_params, batch, rng) -> (state, metrics)``.

    ``frozen_params`` is the full base param tree (NF4/bf16, not updated);
    ``state.trainable`` holds LoRA adapters + projector + lm_head +
    embed_tokens (load_cullavo.py:128-138 trainable set).

    ``compute_dtype=jnp.bfloat16`` casts the (fp32 master) trainable leaves
    for the forward — the reference's Accelerate-bf16 mixed precision.
    Without it the fp32 trainable embeddings promote the WHOLE network to
    fp32 compute (doubled activation/remat memory + sub-MXU-rate matmuls).
    """
    scaling = lora_cfg.scaling if lora_cfg else 0.0
    dropout = lora_cfg.dropout if lora_cfg else 0.0

    def _cast(tree):
        if compute_dtype is None:
            return tree
        return jax.tree.map(
            lambda a: a.astype(compute_dtype)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, tree)

    def _forward(full, lora, input_ids, pixel_values, attention_mask, rng):
        # remat happens PER SCAN LAYER inside llama_forward — checkpointing
        # this whole function would leave the backward's full-forward
        # recompute holding every residual (a 1.3B step compiled to a 70 GB
        # HBM request that way)
        out, _ = llava_forward(full, cfg, input_ids, pixel_values,
                               attention_mask, lora=lora,
                               lora_scaling=scaling, lora_dropout=dropout,
                               dropout_rng=rng, remat=remat,
                               return_hidden=loss_chunk is not None)
        return out

    fwd = _forward

    def loss_fn(trainable, frozen_params, batch, rng):
        full, lora = apply_trainable(frozen_params, trainable)
        full, lora = _cast(full), _cast(lora)
        out = fwd(full, lora, batch["input_ids"], batch.get("pixel_values"),
                  batch["attention_mask"], rng)
        if loss_chunk is not None:
            lm = full["language_model"]
            head = lm["lm_head"] if "lm_head" in lm else lm["embed_tokens"].T
            return chunked_weighted_causal_lm_loss(
                out, head, batch["labels"], batch["attention_mask"],
                batch["weights"], chunk=loss_chunk)
        loss = weighted_causal_lm_loss(out, batch["labels"],
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
