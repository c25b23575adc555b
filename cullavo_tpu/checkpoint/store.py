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


def _flatten(tree: Any, prefix: str = "") -> dict:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    elif tree is None:
        out[prefix[:-1] + "#none"] = None
    else:
        out[prefix[:-1]] = tree
    return out


def _unflatten(flat: dict) -> Any:
    root: dict = {}
    for key, value in flat.items():
        is_none = key.endswith("#none")
        if is_none:
            key = key[:-len("#none")]
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = None if is_none else value

    def fix(node):
        if isinstance(node, dict):
            keys = list(node.keys())
            if keys and all(k.isdigit() for k in keys):
                return [fix(node[str(i)]) for i in range(len(keys))]
            return {k: fix(v) for k, v in node.items()}
        return node

    return fix(root)


def save_checkpoint(ckpt_dir: str, step: int, state: Any, overwrite: bool = True):
    """Write ``{ckpt_dir}/step_{N}/`` with one npz of all leaves + a manifest.

    Multi-host: call on every process; only process 0 writes (callers gather
    sharded arrays first or rely on fully-addressable arrays).
    """
    if jax.process_index() != 0:
        return
    path = os.path.join(ckpt_dir, f"step_{step}")
    os.makedirs(path, exist_ok=True)
    flat = _flatten(state)
    arrays = {}
    manifest = {"step": step, "keys": []}
    for k, v in flat.items():
        manifest["keys"].append(k)
        if v is None or k.endswith("#none"):
            continue
        arrays[k.replace("/", "|")] = np.asarray(v)
    np.savez(os.path.join(path, "arrays.npz"), **arrays)
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f)


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d.split("_")[1]) for d in os.listdir(ckpt_dir)
             if d.startswith("step_")]
    return max(steps) if steps else None


def load_checkpoint(ckpt_dir: str, step: Optional[int] = None) -> Any:
    step = step if step is not None else latest_step(ckpt_dir)
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = os.path.join(ckpt_dir, f"step_{step}")
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    data = np.load(os.path.join(path, "arrays.npz"))
    flat = {}
    for k in manifest["keys"]:
        if k.endswith("#none"):
            flat[k] = None
        else:
            flat[k] = data[k.replace("/", "|")]
    return _unflatten(flat)


def save_adapters(out_dir: str, lora_params: Any, lora_config: dict):
    """PEFT-like adapter export: flat-named safetensors + adapter_config.json
    (mirrors the layout BaseModel.save_pretrained produces via PEFT)."""
    if jax.process_index() != 0:
        return
    os.makedirs(out_dir, exist_ok=True)
    from safetensors.numpy import save_file

    flat = {k: np.asarray(v) for k, v in _flatten(lora_params).items()
            if v is not None}
    save_file(flat, os.path.join(out_dir, "adapter_model.safetensors"))
    with open(os.path.join(out_dir, "adapter_config.json"), "w") as f:
        json.dump(lora_config, f)


def load_adapters(out_dir: str) -> tuple:
    from safetensors import safe_open

    flat = {}
    with safe_open(os.path.join(out_dir, "adapter_model.safetensors"),
                   framework="np") as f:
        for k in f.keys():
            flat[k] = f.get_tensor(k)
    with open(os.path.join(out_dir, "adapter_config.json")) as f:
        cfg = json.load(f)
    return _unflatten(flat), cfg


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
