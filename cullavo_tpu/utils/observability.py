"""Observability: profiler traces, per-step timing, structured logging.

The reference has only ad-hoc wall-clock scaffolding
(pipeline/XDecoderPipeline.py:126-176, tqdm bars in default_trainer.py:164-174,
SURVEY.md §5 "Tracing/profiling: none").  Here these are first-class:

  * ``profile_trace`` — context manager around ``jax.profiler`` capturing a
    TensorBoard-loadable trace for N steps.
  * ``StepTimer`` — warmup-aware data/compute split timing.
  * ``MetricsLogger`` — JSONL metrics stream + optional wandb mirroring
    (WANDB_API_KEY from the environment — the reference hardcodes a key at
    entry.py:39, which is exactly what not to do).
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """Capture a jax.profiler trace (open with TensorBoard / xprof)."""
    if not enabled:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Warmup-aware data/compute timing (XDecoderPipeline.py:126-153 as a
    reusable class)."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.data_times: list[float] = []
        self.compute_times: list[float] = []
        self._t = time.perf_counter()

    def data_ready(self):
        now = time.perf_counter()
        self.data_times.append(now - self._t)
        self._t = now

    def step_done(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        now = time.perf_counter()
        self.compute_times.append(now - self._t)
        self._t = now

    def summary(self) -> dict:
        d = self.data_times[self.warmup:] or self.data_times
        c = self.compute_times[self.warmup:] or self.compute_times
        mean = lambda xs: sum(xs) / max(len(xs), 1)
        return {"data_s": mean(d), "compute_s": mean(c),
                "steps": len(self.compute_times)}


class MetricsLogger:
    """JSONL metrics on rank 0 + optional wandb mirror."""

    def __init__(self, out_dir: Optional[str] = None, use_wandb: bool = False,
                 project: str = "cullavo_tpu"):
        self.enabled = jax.process_index() == 0
        self.file = None
        self.wandb_run = None
        if not self.enabled:
            return
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            self.file = open(os.path.join(out_dir, "metrics.jsonl"), "a")
        if use_wandb and os.environ.get("WANDB_API_KEY"):
            try:
                import wandb

                self.wandb_run = wandb.init(project=project, resume="allow")
            except Exception:
                self.wandb_run = None

    def log(self, metrics: dict, step: Optional[int] = None):
        if not self.enabled:
            return
        record = {"step": step, **{k: float(v) if hasattr(v, "__float__") else v
                                   for k, v in metrics.items()}}
        if self.file:
            self.file.write(json.dumps(record) + "\n")
            self.file.flush()
        if self.wandb_run is not None:
            self.wandb_run.log(metrics, step=step)

    def close(self):
        if self.file:
            self.file.close()
        if self.wandb_run is not None:
            self.wandb_run.finish()
