"""Training-step tests: LoRA wiring, loss decrease, and multi-device sharding."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cullavo_tpu.models.llava.config import tiny_llava_config
from cullavo_tpu.models.llava.lora import (LoraConfig, init_lora_params,
                                           merge_lora, strip_trainable,
                                           trainable_partition)
from cullavo_tpu.models.llava.modeling import init_llava_params, llava_forward
from cullavo_tpu.parallel.mesh import MeshConfig, make_mesh
from cullavo_tpu.trainer.optimizer import cullavo_optimizer
from cullavo_tpu.trainer.step import (TrainState, make_train_step,
                                      shard_train_step, weighted_causal_lm_loss)


def _setup(seed=0, r=4, dropout=0.05):
    cfg = tiny_llava_config(128)
    lora_cfg = LoraConfig(r=r, dropout=dropout,
                          vision_layer_start=1, vision_layer_stop=2)
    params = init_llava_params(cfg, jax.random.PRNGKey(seed))
    lora = init_lora_params(params, cfg, lora_cfg, jax.random.PRNGKey(seed + 1))
    return cfg, lora_cfg, params, lora


def _batch(cfg, B=4, text=6, seed=0):
    rng = np.random.default_rng(seed)
    n_img = cfg.num_image_tokens
    T = 1 + n_img + text
    ids = rng.integers(4, 120, size=(B, T)).astype(np.int32)
    ids[:, 1:1 + n_img] = cfg.image_token_id
    labels = ids.copy()
    labels[:, :1 + n_img] = -100
    return {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "labels": jnp.asarray(labels),
        "pixel_values": jnp.asarray(rng.normal(size=(B, 3, 28, 28)).astype(np.float32)),
        "weights": jnp.ones((B,), jnp.float32),
    }


def test_lora_zero_b_is_identity():
    cfg, lora_cfg, params, lora = _setup()
    batch = _batch(cfg, B=2)
    base, _ = llava_forward(params, cfg, batch["input_ids"], batch["pixel_values"],
                            batch["attention_mask"])
    with_lora, _ = llava_forward(params, cfg, batch["input_ids"], batch["pixel_values"],
                                 batch["attention_mask"], lora=lora,
                                 lora_scaling=lora_cfg.scaling)
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_lora), atol=1e-6)


def test_lora_merge_matches_unmerged():
    cfg, lora_cfg, params, lora = _setup()
    # make B nonzero so adapters actually do something
    lora = jax.tree.map(lambda a: a + 0.01 if a.ndim == 3 else a, lora)
    batch = _batch(cfg, B=2)
    unmerged, _ = llava_forward(params, cfg, batch["input_ids"], batch["pixel_values"],
                                batch["attention_mask"], lora=lora,
                                lora_scaling=lora_cfg.scaling)
    merged_params = merge_lora(params, lora, lora_cfg)
    merged, _ = llava_forward(merged_params, cfg, batch["input_ids"],
                              batch["pixel_values"], batch["attention_mask"])
    np.testing.assert_allclose(np.asarray(unmerged), np.asarray(merged),
                               atol=5e-4, rtol=1e-3)
    # and it actually changed vs base
    base, _ = llava_forward(params, cfg, batch["input_ids"], batch["pixel_values"],
                            batch["attention_mask"])
    assert np.abs(np.asarray(base) - np.asarray(unmerged)).max() > 1e-3


def test_vision_lora_mask_restricts_layers():
    cfg, lora_cfg, params, lora = _setup()
    vt = lora["vision_tower"]
    assert set(vt.keys()) == {"q", "k", "v", "o", "fc1", "fc2"}
    mask = np.asarray(vt["q"]["mask"])[:, 0, 0]
    np.testing.assert_array_equal(mask, [0.0, 1.0])  # only layer 1 targeted


def test_train_step_decreases_loss():
    cfg, lora_cfg, params, lora = _setup()
    trainable = trainable_partition(params, lora)
    frozen = strip_trainable(params)
    tx = cullavo_optimizer(base_lr=3e-3, total_steps=50, grad_clip=10.0)
    state = TrainState(trainable, tx.init(trainable), jnp.zeros((), jnp.int32))
    step_fn = jax.jit(make_train_step(cfg, lora_cfg, tx, remat=False))
    batch = _batch(cfg)
    losses = []
    for i in range(8):
        state, metrics = step_fn(state, frozen, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss_llm"]))
    assert losses[-1] < losses[0] - 0.05, losses
    assert int(state.step) == 8


def test_weighted_loss_ignores_zero_weight_rows():
    cfg, *_ = _setup()
    B, T, V = 2, 6, 16
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(B, T, V)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, V, size=(B, T)).astype(np.int32))
    mask = jnp.ones((B, T), jnp.int32)
    both = weighted_causal_lm_loss(logits, labels, mask, jnp.asarray([1.0, 1.0]))
    only0 = weighted_causal_lm_loss(logits, labels, mask, jnp.asarray([1.0, 0.0]))
    row0 = weighted_causal_lm_loss(logits[:1], labels[:1], mask[:1], jnp.asarray([1.0]))
    np.testing.assert_allclose(float(only0), float(row0), rtol=1e-6)
    assert abs(float(both) - float(row0)) > 1e-6  # row 1 contributes when weighted


def test_sharded_train_step_matches_single_device():
    cfg, lora_cfg, params, lora = _setup()
    trainable = trainable_partition(params, lora)
    frozen = strip_trainable(params)
    tx = cullavo_optimizer(base_lr=1e-3, total_steps=50, grad_clip=10.0)
    state0 = TrainState(trainable, tx.init(trainable), jnp.zeros((), jnp.int32))
    batch = _batch(cfg, B=8)
    rng = jax.random.PRNGKey(0)

    step_fn = make_train_step(cfg, lora_cfg, tx, remat=False)
    _, m_single = jax.jit(step_fn)(state0, frozen, batch, rng)

    mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    jitted = shard_train_step(step_fn, mesh, state0, frozen)
    # donated state must own its buffers: no aliasing with state0 (which the
    # in-flight first computation may still be reading under async dispatch)
    trainable_copy = jax.tree.map(lambda a: None if a is None else jnp.copy(a), trainable)
    state0b = TrainState(trainable_copy, tx.init(trainable_copy), jnp.zeros((), jnp.int32))
    _, m_mesh = jitted(state0b, frozen, batch, rng)

    np.testing.assert_allclose(float(m_single["loss_llm"]), float(m_mesh["loss_llm"]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(m_single["grad_norm"]), float(m_mesh["grad_norm"]),
                               rtol=2e-4, atol=2e-4)


def test_grad_accumulation_equivalence():
    """Two half-batches with MultiSteps(2) == one full batch step.

    Dropout off: the LoRA dropout mask is drawn per activation shape, so a
    [4,T] batch and two [2,T] microbatches see different masks by design.
    """
    cfg, lora_cfg, params, lora = _setup(dropout=0.0)
    trainable = trainable_partition(params, lora)
    frozen = strip_trainable(params)
    batch = _batch(cfg, B=4)
    half0 = {k: v[:2] for k, v in batch.items()}
    half1 = {k: v[2:] for k, v in batch.items()}
    rng = jax.random.PRNGKey(0)

    tx_full = cullavo_optimizer(base_lr=1e-3, total_steps=10, grad_clip=1e9)
    s_full = TrainState(trainable, tx_full.init(trainable), jnp.zeros((), jnp.int32))
    step_full = jax.jit(make_train_step(cfg, lora_cfg, tx_full, remat=False))
    s_full, _ = step_full(s_full, frozen, batch, rng)

    tx_acc = cullavo_optimizer(base_lr=1e-3, total_steps=10, grad_clip=1e9, grad_accum=2)
    s_acc = TrainState(trainable, tx_acc.init(trainable), jnp.zeros((), jnp.int32))
    step_acc = jax.jit(make_train_step(cfg, lora_cfg, tx_acc, remat=False))
    s_acc, _ = step_acc(s_acc, frozen, half0, rng)
    s_acc, _ = step_acc(s_acc, frozen, half1, rng)

    a = jax.tree.leaves(s_full.trainable)
    b = jax.tree.leaves(s_acc.trainable)
    for x, y in zip(a, b):
        if x is None:
            continue
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5, rtol=1e-4)


def test_train_step_seeded_determinism():
    """Same seeds → bit-identical metrics across two fresh runs (SURVEY §7
    item 8: seeded determinism as a first-class trainer property)."""
    import jax
    import jax.numpy as jnp

    from cullavo_tpu.models.llava.config import tiny_llava_config
    from cullavo_tpu.models.llava.lora import (LoraConfig, init_lora_params,
                                               strip_trainable,
                                               trainable_partition)
    from cullavo_tpu.models.llava.modeling import init_llava_params
    from cullavo_tpu.trainer.optimizer import cullavo_optimizer
    from cullavo_tpu.trainer.step import TrainState, make_train_step

    def run():
        cfg = tiny_llava_config(128)
        lora_cfg = LoraConfig(r=4, vision_layer_start=1, vision_layer_stop=2)
        params = init_llava_params(cfg, jax.random.PRNGKey(0))
        lora = init_lora_params(params, cfg, lora_cfg, jax.random.PRNGKey(1))
        trainable = trainable_partition(params, lora)
        frozen = strip_trainable(params)
        tx = cullavo_optimizer(base_lr=1e-4, total_steps=10, grad_clip=10.0)
        state = TrainState(trainable, tx.init(trainable), jnp.zeros((), jnp.int32))
        step = jax.jit(make_train_step(cfg, lora_cfg, tx))
        rng = np.random.default_rng(7)
        n_img = cfg.num_image_tokens
        ids = rng.integers(4, 120, size=(2, 6 + n_img)).astype(np.int32)
        ids[:, 1:1 + n_img] = cfg.image_token_id
        batch = {"input_ids": ids, "attention_mask": np.ones_like(ids),
                 "labels": ids.copy(),
                 "pixel_values": rng.normal(size=(2, 3, 28, 28)).astype(np.float32),
                 "weights": np.ones((2,), np.float32)}
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        ms = []
        for i in range(3):
            state, m = step(state, frozen, batch, jax.random.PRNGKey(100 + i))
            ms.append(float(m["loss_llm"]))
        return ms

    a, b = run(), run()
    assert a == b, (a, b)


def test_lora_init_from_quantized_base():
    """Production order: quantize first, then attach adapters
    (load_cullavo.py:65-112) — shapes must come from the quantized dicts."""
    import jax

    from cullavo_tpu.models.llava.config import tiny_llava_config
    from cullavo_tpu.models.llava.lora import (LoraConfig, init_lora_params,
                                               quantize_llm_weights)
    from cullavo_tpu.models.llava.modeling import init_llava_params

    cfg = tiny_llava_config(128)
    params = init_llava_params(cfg, jax.random.PRNGKey(0))
    for bits in (8, 4):
        qparams = quantize_llm_weights(params, bits=bits)
        lora = init_lora_params(qparams, cfg, LoraConfig(r=4),
                                jax.random.PRNGKey(1))
        a = lora["language_model"]["q"]["a"]
        assert a.shape == (cfg.text.num_hidden_layers, cfg.text.hidden_size, 4)


def test_train_step_on_quantized_base_decreases_loss():
    """Q-LoRA over an NF4-quantized base (the production configuration,
    load_cullavo.py:65-112): quantize -> attach adapters -> train, with
    LoRA dropout active (exercises the per-layer rng split over quantized
    layer dicts)."""
    import jax
    import jax.numpy as jnp

    from cullavo_tpu.models.llava.config import tiny_llava_config
    from cullavo_tpu.models.llava.lora import (LoraConfig, init_lora_params,
                                               quantize_llm_weights,
                                               strip_trainable,
                                               trainable_partition)
    from cullavo_tpu.models.llava.modeling import init_llava_params
    from cullavo_tpu.trainer.optimizer import cullavo_optimizer
    from cullavo_tpu.trainer.step import TrainState, make_train_step

    cfg = tiny_llava_config(128)
    params = quantize_llm_weights(init_llava_params(cfg, jax.random.PRNGKey(0)),
                                  bits=4)
    lora_cfg = LoraConfig(r=4, dropout=0.05, vision_layer_start=1,
                          vision_layer_stop=2)
    lora = init_lora_params(params, cfg, lora_cfg, jax.random.PRNGKey(1))
    trainable = trainable_partition(params, lora)
    frozen = strip_trainable(params)
    tx = cullavo_optimizer(base_lr=5e-3, total_steps=20, grad_clip=10.0)
    state = TrainState(trainable, tx.init(trainable), jnp.zeros((), jnp.int32))
    step = jax.jit(make_train_step(cfg, lora_cfg, tx))

    rng = np.random.default_rng(5)
    n_img = cfg.num_image_tokens
    ids = rng.integers(4, 120, size=(2, 6 + n_img)).astype(np.int32)
    ids[:, 1:1 + n_img] = cfg.image_token_id
    batch = {"input_ids": jnp.asarray(ids),
             "attention_mask": jnp.ones_like(jnp.asarray(ids)),
             "labels": jnp.asarray(ids.copy()),
             "pixel_values": jnp.asarray(
                 rng.normal(size=(2, 3, 28, 28)).astype(np.float32)),
             "weights": jnp.ones((2,), jnp.float32)}
    losses = []
    for i in range(6):
        state, m = step(state, frozen, batch, jax.random.PRNGKey(10 + i))
        losses.append(float(m["loss_llm"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_add_step2_adapters():
    """Second adapter set (reference add_adapter_for_step2,
    load_cullavo.py:23-59): fresh zero-effect adapters over the same targets;
    merge_step1=True folds step1 deltas into the base first."""
    from cullavo_tpu.models.llava.lora import add_step2_adapters

    cfg, lora_cfg, params, step1 = _setup()
    step1 = jax.tree.map(lambda a: a + 0.01 if a.ndim == 3 else a, step1)
    base2, step2 = add_step2_adapters(params, step1, cfg, lora_cfg,
                                      jax.random.PRNGKey(7), merge_step1=True)
    # same adapter structure, fresh B=0 (new set starts as identity)
    assert set(step2["language_model"]) == set(step1["language_model"])
    for ab in step2["language_model"].values():
        assert float(jnp.abs(ab["b"]).max()) == 0.0
    # merged base2 equals base+step1 applied
    batch = _batch(cfg, B=2)
    with_step1, _ = llava_forward(params, cfg, batch["input_ids"],
                                  batch["pixel_values"], batch["attention_mask"],
                                  lora=step1, lora_scaling=lora_cfg.scaling)
    merged_out, _ = llava_forward(base2, cfg, batch["input_ids"],
                                  batch["pixel_values"], batch["attention_mask"])
    np.testing.assert_allclose(np.asarray(with_step1), np.asarray(merged_out),
                               atol=5e-4, rtol=1e-3)


def test_chunked_loss_matches_unchunked():
    """chunked_weighted_causal_lm_loss == weighted_causal_lm_loss(lm_logits),
    values AND gradients, incl. a padded tail chunk."""
    from cullavo_tpu.trainer.step import (chunked_weighted_causal_lm_loss,
                                          weighted_causal_lm_loss)

    rng = np.random.default_rng(11)
    B, T, D, V = 2, 11, 8, 16
    hidden = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    head = jnp.asarray(rng.normal(size=(D, V)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, V, size=(B, T)).astype(np.int32))
    labels = labels.at[0, 3].set(-100)
    mask = np.ones((B, T), np.int32)
    mask[1, -3:] = 0
    mask = jnp.asarray(mask)
    weights = jnp.asarray([1.0, 0.5], jnp.float32)

    def unchunked(h, w):
        logits = jnp.einsum("btd,dv->btv", h, w)
        return weighted_causal_lm_loss(logits, labels, mask, weights)

    def chunked(h, w):
        return chunked_weighted_causal_lm_loss(h, w, labels, mask, weights,
                                               chunk=4)

    ref, (gh_r, gw_r) = jax.value_and_grad(unchunked, argnums=(0, 1))(hidden, head)
    out, (gh, gw) = jax.value_and_grad(chunked, argnums=(0, 1))(hidden, head)
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(gh_r), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r), atol=1e-6)
