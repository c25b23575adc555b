"""Checkpoint save/load.

Replaces the reference's split checkpoint format (modeling/BaseModel.py:20-69:
rank0 ``CuLLaVO.pt`` + per-tower PEFT adapter dirs + separate projector /
lm_head / embed_tokens ``.pt`` files) with:

  * ``save_checkpoint`` / ``load_checkpoint`` — one orbax-style sharded
    checkpoint holding params + optimizer state + step (the reference saves
    weights only; resume therefore restarted the schedule — SURVEY.md §5).
  * ``export_hf`` — HF-layout safetensors export of the merged LLaVA weights
    so checkpoints stay importable by the reference toolchain
    (to_hf_state_dict in cullavo_tpu/checkpoint/hf_import.py).
  * ``save_adapters`` / ``load_adapters`` — LoRA adapters in a PEFT-like
    directory layout (adapter_model.safetensors with flat names).
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint", "latest_step",
           "save_adapters", "load_adapters", "export_hf"]


def _flatten(tree: Any) -> dict:
    """ANY registered pytree (dicts/lists, TrainState, optax NamedTuples) →
    {jax keystr path: leaf}.  None leaves are empty subtrees in jax and
    simply don't appear — a ``template`` at load time restores them."""
    return {jax.tree_util.keystr(path): leaf
            for path, leaf in jax.tree_util.tree_leaves_with_path(tree)}


def _unflatten(flat: dict, template: Any = None) -> Any:
    """Rebuild a tree from keystr-keyed leaves.

    With ``template`` (a pytree of the SAME structure as what was saved,
    e.g. a freshly initialized TrainState), the exact pytree — dataclasses,
    optax NamedTuples, None leaves — is reconstructed, which is what
    optimizer resume requires.  Without it, keystr paths are parsed into
    plain dicts/lists (dataclass fields become dict keys): enough for
    params-only dict states, NOT for opt_states."""
    if template is not None:
        leaves_p = jax.tree_util.tree_leaves_with_path(template)
        treedef = jax.tree_util.tree_structure(template)
        missing = [jax.tree_util.keystr(p) for p, _ in leaves_p
                   if jax.tree_util.keystr(p) not in flat]
        if missing:
            raise KeyError(f"checkpoint missing {len(missing)} leaves, "
                           f"e.g. {missing[:3]}")
        return jax.tree_util.tree_unflatten(
            treedef, [flat[jax.tree_util.keystr(p)] for p, _ in leaves_p])

    import re

    token = re.compile(r"\[u?'([^']*)'\]|\[(\d+)\]|\.([A-Za-z_]\w*)")
    root: dict = {}
    for key, value in flat.items():
        parts = [m.group(1) if m.group(1) is not None
                 else (int(m.group(2)) if m.group(2) is not None
                       else m.group(3))
                 for m in token.finditer(key)]
        if not parts:                     # scalar root
            return value
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def fix(node):
        if isinstance(node, dict):
            keys = list(node.keys())
            if keys and all(isinstance(k, int) for k in keys) \
                    and sorted(keys) == list(range(len(keys))):
                return [fix(node[i]) for i in range(len(keys))]
            return {k: fix(v) for k, v in node.items()}
        return node

    return fix(root)


def save_checkpoint(ckpt_dir: str, step: int, state: Any):
    """Write ``{ckpt_dir}/step_{N}/`` with one npz of all leaves + a manifest.

    ``state`` may be ANY registered pytree — a plain params dict, a
    TrainState, optax NamedTuple opt_states.  Sharded arrays are gathered
    with ``jax.device_get`` here (fully-addressable required on process 0).

    Multi-host: call on every process; only process 0 writes.
    """
    if jax.process_index() != 0:
        return
    path = os.path.join(ckpt_dir, f"step_{step}")
    os.makedirs(path, exist_ok=True)
    flat = _flatten(jax.device_get(state))
    arrays = {k: np.asarray(v) for k, v in flat.items()}
    manifest = {"step": step, "keys": list(arrays)}
    np.savez(os.path.join(path, "arrays.npz"), **arrays)
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f)


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d.split("_")[1]) for d in os.listdir(ckpt_dir)
             if d.startswith("step_")]
    return max(steps) if steps else None


def load_checkpoint(ckpt_dir: str, step: Optional[int] = None,
                    template: Any = None) -> Any:
    """Load a checkpoint.  Pass ``template`` (e.g. a freshly initialized
    TrainState) to restore the exact pytree structure — REQUIRED for
    optimizer-state resume (NamedTuples can't be rebuilt from paths)."""
    step = step if step is not None else latest_step(ckpt_dir)
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = os.path.join(ckpt_dir, f"step_{step}")
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    data = np.load(os.path.join(path, "arrays.npz"))
    flat = {k: data[k] for k in manifest["keys"]}
    return _unflatten(flat, template=template)


def save_adapters(out_dir: str, lora_params: Any, lora_config: dict):
    """PEFT-like adapter export: flat-named safetensors + adapter_config.json
    (mirrors the layout BaseModel.save_pretrained produces via PEFT)."""
    if jax.process_index() != 0:
        return
    os.makedirs(out_dir, exist_ok=True)
    from safetensors.numpy import save_file

    # None leaves are empty subtrees under jax flattening — nothing to
    # filter, and load_adapters(template=...) restores them exactly
    flat = {k: np.asarray(v) for k, v in _flatten(jax.device_get(
        lora_params)).items()}
    save_file(flat, os.path.join(out_dir, "adapter_model.safetensors"))
    with open(os.path.join(out_dir, "adapter_config.json"), "w") as f:
        json.dump(lora_config, f)


def load_adapters(out_dir: str, template: Any = None) -> tuple:
    """Pass ``template`` (e.g. init_lora_params output) to restore the exact
    pytree incl. None leaves; without it, paths parse into dicts/lists."""
    from safetensors import safe_open

    flat = {}
    with safe_open(os.path.join(out_dir, "adapter_model.safetensors"),
                   framework="np") as f:
        for k in f.keys():
            flat[k] = f.get_tensor(k)
    with open(os.path.join(out_dir, "adapter_config.json")) as f:
        cfg = json.load(f)
    return _unflatten(flat, template=template), cfg


def export_hf(out_dir: str, params: Any, llava_cfg) -> None:
    """Merged-weight HF safetensors export (importable by transformers)."""
    if jax.process_index() != 0:
        return
    os.makedirs(out_dir, exist_ok=True)
    from safetensors.numpy import save_file

    from cullavo_tpu.checkpoint.hf_import import to_hf_state_dict

    state = to_hf_state_dict(jax.tree.map(np.asarray, params), llava_cfg)
    # safetensors serializes the raw buffer; transposed views MUST be
    # contiguized or the file silently holds the untransposed bytes
    state = {k: np.ascontiguousarray(v) for k, v in state.items()}
    save_file(state, os.path.join(out_dir, "model.safetensors"))
    # HF-compatible config.json so the export round-trips through
    # hf_import.llava_config_from_json (and transformers from_pretrained)
    import dataclasses as _dc
    import json as _json

    conf = {
        "model_type": "llava",
        "image_token_index": llava_cfg.image_token_id,
        "pad_token_id": llava_cfg.pad_token_id,
        "projector_hidden_act": llava_cfg.projector_hidden_act,
        "vision_feature_layer": llava_cfg.vision_feature_layer,
        "vision_feature_select_strategy":
            llava_cfg.vision_feature_select_strategy,
        "text_config": {"model_type": "llama",
                        **_dc.asdict(llava_cfg.text)},
        "vision_config": {"model_type": "clip_vision_model",
                          **_dc.asdict(llava_cfg.vision)},
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        _json.dump(conf, f, indent=1)


# ---------------------------------------------------------------------------
# orbax backend (sharded/async-capable; SURVEY §5 "single sharded checkpoint")
# ---------------------------------------------------------------------------

def save_checkpoint_orbax(ckpt_dir: str, step: int, state: Any):
    """Sharded checkpoint via orbax — preferred for multi-host / large states
    (each host writes its shards; restore honors target shardings)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"orbax_step_{step}"))
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, state)


def load_checkpoint_orbax(ckpt_dir: str, step: Optional[int] = None,
                          target: Any = None) -> Any:
    import orbax.checkpoint as ocp

    if step is None:
        steps = [int(d.split("_")[-1]) for d in os.listdir(ckpt_dir)
                 if d.startswith("orbax_step_")]
        if not steps:
            raise FileNotFoundError(f"no orbax checkpoints under {ckpt_dir}")
        step = max(steps)
    path = os.path.abspath(os.path.join(ckpt_dir, f"orbax_step_{step}"))
    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        return ckptr.restore(path, item=target)
    return ckptr.restore(path)
