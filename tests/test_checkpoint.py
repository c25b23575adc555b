"""Checkpoint store tests: roundtrip, resume, adapters, HF export/import."""
import numpy as np

import jax
import jax.numpy as jnp

from cullavo_tpu.checkpoint.store import (latest_step, load_adapters,
                                          load_checkpoint, save_adapters,
                                          save_checkpoint)


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3), "lst": [jnp.ones(2), jnp.zeros(3)]},
        "opt": {"count": jnp.int32(5), "nothing": None},
        "step": jnp.int32(7),
    }
    save_checkpoint(str(tmp_path), 7, state)
    assert latest_step(str(tmp_path)) == 7
    loaded = load_checkpoint(str(tmp_path))
    np.testing.assert_array_equal(loaded["params"]["w"], np.arange(6.0).reshape(2, 3))
    np.testing.assert_array_equal(loaded["params"]["lst"][1], np.zeros(3))
    # None leaves are empty subtrees under jax flattening: absent without a
    # template, restored exactly with one
    assert "nothing" not in loaded["opt"]
    with_tpl = load_checkpoint(str(tmp_path), template=state)
    assert with_tpl["opt"]["nothing"] is None
    np.testing.assert_array_equal(with_tpl["params"]["lst"][0], np.ones(2))
    assert isinstance(with_tpl["params"]["lst"], list)
    assert int(loaded["step"]) == 7
    # multiple steps → latest wins
    save_checkpoint(str(tmp_path), 12, state)
    assert latest_step(str(tmp_path)) == 12


def test_checkpoint_trainstate_optax_resume(tmp_path):
    """The REAL resume path: a TrainState holding an optax chain's
    NamedTuple opt_state must round-trip structure-exactly via a template
    (the old path-string store pickled the dataclass into one dead blob and
    rebuilt NamedTuples as lists — optimizer resume was impossible)."""
    import optax

    from cullavo_tpu.checkpoint.store import load_checkpoint, save_checkpoint
    from cullavo_tpu.trainer.optimizer import cullavo_optimizer
    from cullavo_tpu.trainer.step import TrainState

    params = {"w": jnp.arange(4.0), "b": jnp.zeros(2)}
    tx = cullavo_optimizer(base_lr=1e-3, total_steps=10, grad_clip=1.0)
    state = TrainState(params, tx.init(params), jnp.int32(3))
    # advance one step so the moments are nonzero
    grads = {"w": jnp.ones(4), "b": jnp.ones(2)}
    updates, new_opt = tx.update(grads, state.opt_state, params)
    state = TrainState(optax.apply_updates(params, updates), new_opt,
                       jnp.int32(4))

    save_checkpoint(str(tmp_path), 4, state)
    template = TrainState(params, tx.init(params), jnp.int32(0))
    restored = load_checkpoint(str(tmp_path), template=template)
    assert isinstance(restored, TrainState)
    assert int(restored.step) == 4
    # structure-exact: tx.update must accept the restored opt_state
    _, after = tx.update(grads, restored.opt_state, restored.trainable)
    assert jax.tree_util.tree_structure(after) == \
        jax.tree_util.tree_structure(new_opt)
    for a, b in zip(jax.tree.leaves(restored.trainable),
                    jax.tree.leaves(state.trainable)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_adapters_roundtrip(tmp_path):
    lora = {"language_model": {"q": {"a": jnp.ones((2, 4, 2)), "b": jnp.zeros((2, 2, 4))}}}
    save_adapters(str(tmp_path / "ad"), lora, {"r": 2, "alpha": 16})
    loaded, cfg = load_adapters(str(tmp_path / "ad"))
    assert cfg["r"] == 2
    np.testing.assert_array_equal(loaded["language_model"]["q"]["a"], np.ones((2, 4, 2)))


def test_hf_export_reimport(tmp_path):
    from cullavo_tpu.checkpoint.hf_import import from_hf_state_dict
    from cullavo_tpu.checkpoint.store import export_hf
    from cullavo_tpu.models.llava.config import tiny_llava_config
    from cullavo_tpu.models.llava.modeling import init_llava_params

    cfg = tiny_llava_config(128)
    params = init_llava_params(cfg, jax.random.PRNGKey(0))
    export_hf(str(tmp_path / "hf"), params, cfg)

    from safetensors import safe_open

    state = {}
    with safe_open(str(tmp_path / "hf" / "model.safetensors"), framework="np") as f:
        for k in f.keys():
            state[k] = f.get_tensor(k)
    re = from_hf_state_dict(state, cfg)
    p1 = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(params)}
    p2 = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(re)}
    assert set(p1) == set(p2)
    for k in p1:
        np.testing.assert_allclose(np.asarray(p1[k]), np.asarray(p2[k]),
                                   atol=1e-6, err_msg=k)


def test_orbax_roundtrip(tmp_path):
    from cullavo_tpu.checkpoint.store import (load_checkpoint_orbax,
                                              save_checkpoint_orbax)

    state = {"w": jnp.arange(12.0).reshape(3, 4), "step": jnp.int32(5),
             "nested": {"b": jnp.ones(7)}}
    save_checkpoint_orbax(str(tmp_path), 5, state)
    loaded = load_checkpoint_orbax(str(tmp_path))
    np.testing.assert_array_equal(np.asarray(loaded["w"]),
                                  np.arange(12.0).reshape(3, 4))
    assert int(loaded["step"]) == 5
    np.testing.assert_array_equal(np.asarray(loaded["nested"]["b"]), np.ones(7))


def test_export_hf_roundtrip_through_entry_build(tmp_path):
    """Production import path end-to-end from DISK: export_hf writes a
    snapshot (safetensors + config.json), llava_config_from_json rebuilds
    the exact architecture, and entry._build_llava loads + host-NF4-
    quantizes it (BITS: 4) into a forward-runnable model."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cullavo_tpu import entry
    from cullavo_tpu.checkpoint.hf_import import llava_config_from_json
    from cullavo_tpu.checkpoint.store import export_hf
    from cullavo_tpu.models.llava.config import tiny_llava_config
    from cullavo_tpu.models.llava.modeling import (init_llava_params,
                                                   llava_forward)

    cfg = tiny_llava_config(128)
    params = init_llava_params(cfg, jax.random.PRNGKey(0))
    snap = str(tmp_path / "snapshot")
    export_hf(snap, params, cfg)

    assert llava_config_from_json(snap) == cfg

    loaded_cfg, loaded, _tok = entry._build_llava(
        {"MODEL": {"LLM": {"LOAD_PATH": snap, "BITS": 4}}})
    assert loaded_cfg == cfg
    assert isinstance(loaded["language_model"]["layers"]["q"], dict)

    rng = np.random.default_rng(0)
    n_img = cfg.num_image_tokens
    ids = rng.integers(3, 126, size=(1, 1 + n_img + 4)).astype(np.int32)
    ids[:, 1:1 + n_img] = cfg.image_token_id
    pix = rng.normal(size=(1, 3, cfg.vision.image_size,
                           cfg.vision.image_size)).astype(np.float32)
    mask = np.ones_like(ids)
    ref, _ = llava_forward(params, cfg, jnp.asarray(ids), jnp.asarray(pix),
                           jnp.asarray(mask))
    got, _ = llava_forward(loaded, cfg, jnp.asarray(ids), jnp.asarray(pix),
                           jnp.asarray(mask))
    assert np.isfinite(np.asarray(got)).all()
    # NF4 is lossy, but the quantized logits must track the originals
    c = np.corrcoef(np.asarray(ref).ravel(), np.asarray(got).ravel())[0, 1]
    assert c > 0.95, f"quantized logits decorrelated: r={c}"


def test_reference_layout_roundtrip():
    """save_reference_layout → load_reference_layout reproduces the trainable
    partition exactly (real PEFT key names + torch .pt extras — the
    BaseModel.save_pretrained/from_pretrained tree, modeling/BaseModel.py:20-136)."""
    import jax
    import numpy as np

    from cullavo_tpu.checkpoint.reference_layout import (load_reference_layout,
                                                         save_reference_layout)
    from cullavo_tpu.models.llava.config import tiny_llava_config
    from cullavo_tpu.models.llava.lora import (LoraConfig, init_lora_params,
                                               trainable_partition)
    from cullavo_tpu.models.llava.modeling import init_llava_params

    import tempfile

    cfg = tiny_llava_config(128)
    params = init_llava_params(cfg, jax.random.PRNGKey(0))
    lora_cfg = LoraConfig(r=4, vision_layer_start=1, vision_layer_stop=2)
    lora = init_lora_params(params, cfg, lora_cfg, jax.random.PRNGKey(1))
    # make B nonzero so the round-trip is non-trivial
    lora = jax.tree.map(lambda a: a + 0.25, lora)
    trainable = trainable_partition(params, lora)

    with tempfile.TemporaryDirectory() as d:
        ep = save_reference_layout(d, 3, trainable, lora_cfg)
        assert ep.endswith("epoch3")
        # the reference's RESUME_FROM points at the CuLLaVO.pt inside
        loaded = load_reference_layout(ep + "/CuLLaVO.pt", trainable)

    flat_a = {"/".join(map(str, p)): np.asarray(v)
              for p, v in jax.tree_util.tree_flatten_with_path(trainable)[0]}
    flat_b = {"/".join(map(str, p)): np.asarray(v)
              for p, v in jax.tree_util.tree_flatten_with_path(loaded)[0]}
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k], err_msg=k)


def test_reference_layout_tolerates_untransformed_modules():
    """The reference's step2 vision adapter trains WITHOUT out_proj
    (add_adapter_for_step2, cullavo/load_cullavo.py:23-32), so its
    safetensors carries no out_proj keys and its adapter_config.json's
    target_modules omits it.  load_reference_layout must load such genuine
    step2 checkpoints, leaving the absent module's adapters zeroed
    (lora_B=0 ⇒ identity), and still raise for keys the config claims."""
    import json
    import os
    import tempfile

    import jax
    import numpy as np
    import pytest

    from cullavo_tpu.checkpoint.reference_layout import (load_reference_layout,
                                                         save_reference_layout)
    from cullavo_tpu.models.llava.config import tiny_llava_config
    from cullavo_tpu.models.llava.lora import (LoraConfig, init_lora_params,
                                               trainable_partition)
    from cullavo_tpu.models.llava.modeling import init_llava_params

    cfg = tiny_llava_config(128)
    params = init_llava_params(cfg, jax.random.PRNGKey(0))
    lora_cfg = LoraConfig(r=4, vision_layer_start=0, vision_layer_stop=2)
    lora = init_lora_params(params, cfg, lora_cfg, jax.random.PRNGKey(1))
    lora = jax.tree.map(lambda a: a + 0.25, lora)
    trainable = trainable_partition(params, lora)

    from safetensors import safe_open
    from safetensors.numpy import save_file

    with tempfile.TemporaryDirectory() as d:
        ep = save_reference_layout(d, 1, trainable, lora_cfg)
        vis_dir = os.path.join(ep, "cullavo", "vision_tower")
        st_path = os.path.join(vis_dir, "adapter_model.safetensors")
        flat = {}
        with safe_open(st_path, framework="np") as f:
            for k in f.keys():
                flat[k] = f.get_tensor(k)
        # step2-style checkpoint: out_proj never transformed
        save_file({k: v for k, v in flat.items() if "out_proj" not in k},
                  st_path)
        cfg_path = os.path.join(vis_dir, "adapter_config.json")
        with open(cfg_path) as f:
            acfg = json.load(f)
        acfg["target_modules"] = [m for m in acfg["target_modules"]
                                  if m != "out_proj"]
        with open(cfg_path, "w") as f:
            json.dump(acfg, f)

        loaded = load_reference_layout(ep, trainable)
        np.testing.assert_array_equal(
            np.asarray(loaded["lora"]["vision_tower"]["o"]["a"]), 0.0)
        np.testing.assert_array_equal(
            np.asarray(loaded["lora"]["vision_tower"]["o"]["b"]), 0.0)
        # untouched targets still round-trip exactly
        np.testing.assert_array_equal(
            np.asarray(loaded["lora"]["vision_tower"]["q"]["a"]),
            np.asarray(trainable["lora"]["vision_tower"]["q"]["a"]))

        # a module the config DOES claim but whose keys are missing must
        # still raise (corrupt checkpoint, not an untransformed module)
        save_file({k: v for k, v in flat.items() if "q_proj" not in k},
                  st_path)
        with pytest.raises(KeyError):
            load_reference_layout(ep, trainable)
