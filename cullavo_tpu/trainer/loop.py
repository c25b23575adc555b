"""Training loop driver.

Capability parity with trainer/default_trainer.py:147-198 + the pipeline
``forward_step`` contract (pipeline/CuLLaVOPipeline.py:76-93): epochs ×
batches with gradient accumulation, loss meters, periodic checkpointing at
``updates_per_epoch // PERIOD`` boundaries, optional wandb scalars, LR/loss
progress logging.

TPU-first: the whole optimizer step is one jitted program (trainer/step.py);
this loop only feeds batches, tracks host-side meters, and checkpoints.
Per-step timing uses the data/compute split the reference scaffolds in
XDecoderPipeline.py:126-153, as first-class here.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Iterable, Optional

import jax

from cullavo_tpu.checkpoint.store import save_checkpoint
from cullavo_tpu.trainer.step import TrainState


class AverageMeter:
    """Running average (trainer/utils/misc.py:17-37 equivalent)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.sum = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1):
        self.sum += float(value) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


@dataclasses.dataclass
class LoopConfig:
    max_epochs: int = 1
    checkpoint_period: int = 0      # checkpoints per epoch (PERIOD); 0 = end only
    log_every: int = 10
    save_dir: Optional[str] = None
    wandb: bool = False
    # jax.profiler capture: trace steps [profile_start, profile_start +
    # profile_steps) into profile_dir (TensorBoard/xprof-loadable).  The
    # reference has no profiler at all (SURVEY §5); here it is a loop flag.
    profile_steps: int = 0
    profile_start: int = 3          # skip compile + warmup steps
    profile_dir: str = "/tmp/cullavo_trace"


def train_loop(
    state: TrainState,
    frozen_params: Any,
    step_fn: Callable,              # jitted (state, frozen, batch, rng) -> (state, metrics)
    data_iter_fn: Callable[[int], Iterable[dict]],  # epoch -> batch iterable
    steps_per_epoch: int,
    cfg: LoopConfig,
    rng: jax.Array,
    log_fn: Callable[[dict], None] = None,
    save_fn: Callable = None,       # (save_dir, global_step, state, epoch)
):
    """Runs the loop; returns the final state and the loss history.

    ``save_fn`` overrides the default npz ``save_checkpoint`` at the same
    call points (periodic + end of epoch) — the CuLLaVO entry passes one
    that additionally exports the reference ``epoch{N}`` adapter layout
    (BaseModel.save_pretrained parity, checkpoint/reference_layout.py)."""
    history = []
    loss_meter = AverageMeter()
    data_time = AverageMeter()
    step_time = AverageMeter()
    # ``steps_per_epoch`` is an ESTIMATE (len(records) // batch): mappers can
    # drop records (PanopticMapper → None) and tail buffers are discarded, so
    # the real epoch can be shorter and a PERIOD derived from the estimate
    # would silently never fire mid-epoch.  Epoch 0 uses the estimate;
    # every later epoch re-derives ckpt_every from the ACTUAL yielded count.
    ckpt_every = (steps_per_epoch // cfg.checkpoint_period
                  if cfg.checkpoint_period else 0)
    global_step = int(state.step)

    logger = log_fn or (lambda d: None)
    wandb_run = None
    if cfg.wandb and jax.process_index() == 0:
        try:
            import wandb

            wandb_run = wandb.run or wandb.init(project="cullavo_tpu")
        except Exception:
            wandb_run = None

    profiling = False
    for epoch in range(cfg.max_epochs):
        t_last = time.perf_counter()
        steps_this_epoch = 0
        for i, batch in enumerate(data_iter_fn(epoch)):
            steps_this_epoch = i + 1
            t_data = time.perf_counter()
            data_time.update(t_data - t_last)

            # >= so a resume whose step is already past profile_start still
            # captures a window (== never fires after restore)
            if (cfg.profile_steps and not profiling
                    and global_step >= cfg.profile_start):
                jax.profiler.start_trace(cfg.profile_dir)
                profiling = True

            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, frozen_params, batch, sub)
            # ONE host transfer for all metrics (per-key float() would be a
            # separate device RPC each — expensive on remote transports)
            metrics = jax.device_get(metrics)
            # headline loss: loss_llm (CuLLaVO) or loss_total (xdecoder) —
            # summing every loss_* key would double-count steps that report
            # a total plus its components
            if "loss_llm" in metrics:
                loss = float(metrics["loss_llm"])
            elif "loss_total" in metrics:
                loss = float(metrics["loss_total"])
            else:
                loss = float(sum(v for k, v in metrics.items()
                                 if k.startswith("loss")))
            t_step = time.perf_counter()
            step_time.update(t_step - t_data)
            t_last = t_step

            loss_meter.update(loss)
            global_step += 1
            if profiling and global_step >= cfg.profile_start + cfg.profile_steps:
                jax.block_until_ready(state.trainable)
                jax.profiler.stop_trace()
                profiling = False
            record = {"epoch": epoch, "step": global_step, "loss": loss,
                      **{k: float(v) for k, v in metrics.items()}}
            history.append(record)
            if wandb_run is not None:
                wandb_run.log(record, step=global_step)
            if cfg.log_every and global_step % cfg.log_every == 0:
                logger({"epoch": epoch, "step": global_step,
                        "loss_avg": loss_meter.avg,
                        "data_s": data_time.avg, "step_s": step_time.avg})
            if ckpt_every and cfg.save_dir and (i + 1) % ckpt_every == 0:
                (save_fn or (lambda d, s, st, e: save_checkpoint(d, s, st)))(
                    cfg.save_dir, global_step, state, epoch)
        if cfg.save_dir:
            (save_fn or (lambda d, s, st, e: save_checkpoint(d, s, st)))(
                cfg.save_dir, global_step, state, epoch)
        if cfg.checkpoint_period and steps_this_epoch:
            ckpt_every = steps_this_epoch // cfg.checkpoint_period
    if profiling:
        # the loop ended inside the capture window — flush the trace so it
        # is not lost and a later start_trace does not raise
        jax.profiler.stop_trace()
    return state, history
