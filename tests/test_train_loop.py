"""train_loop driver tests: meters, history, checkpointing cadence, and the
first-class profiler capture (SURVEY §5 — the reference has no profiler)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cullavo_tpu.trainer.loop import AverageMeter, LoopConfig, train_loop
from cullavo_tpu.trainer.step import TrainState


def _toy_state():
    return TrainState(trainable={"w": jnp.ones((2, 2))}, opt_state=(),
                      step=jnp.int32(0))


def _step_fn(state, frozen, batch, rng):
    loss = jnp.sum(batch["x"]) * 0.0 + 1.0 / (1.0 + state.step.astype(jnp.float32))
    new = TrainState(trainable=state.trainable, opt_state=state.opt_state,
                      step=state.step + 1)
    return new, {"loss_llm": loss}


def _data(epoch):
    for _ in range(4):
        yield {"x": jnp.ones((2,))}


def test_train_loop_history_and_meters():
    state, history = train_loop(_toy_state(), None, _step_fn, _data,
                                steps_per_epoch=4,
                                cfg=LoopConfig(max_epochs=2, log_every=0),
                                rng=jax.random.PRNGKey(0))
    assert len(history) == 8
    assert int(state.step) == 8
    assert history[0]["loss"] > history[-1]["loss"]


def test_train_loop_profiler_capture(tmp_path):
    trace_dir = str(tmp_path / "trace")
    cfg = LoopConfig(max_epochs=1, log_every=0, profile_steps=2,
                     profile_start=1, profile_dir=trace_dir)
    train_loop(_toy_state(), None, _step_fn, _data, steps_per_epoch=4,
               cfg=cfg, rng=jax.random.PRNGKey(0))
    # a TensorBoard-loadable plugin dir must exist with at least one trace file
    found = []
    for root, _dirs, files in os.walk(trace_dir):
        found += [f for f in files if "trace" in f or f.endswith(".pb")]
    assert found, f"no trace files written under {trace_dir}"


def test_average_meter():
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == pytest.approx(2.0)
    m.reset()
    assert m.avg == 0.0
