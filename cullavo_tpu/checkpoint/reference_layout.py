"""Reference-layout CuLLaVO checkpoint export/import.

The reference saves trained step1/step2 state via ``BaseModel.save_pretrained``
(modeling/BaseModel.py:20-69) as::

    SAVE_DIR/epoch{N}/CuLLaVO.pt                       # non-LLM weights (torch)
    SAVE_DIR/epoch{N}/cullavo/language_model/adapter_model.safetensors
    SAVE_DIR/epoch{N}/cullavo/language_model/adapter_config.json
    SAVE_DIR/epoch{N}/cullavo/vision_tower/adapter_model.safetensors
    SAVE_DIR/epoch{N}/cullavo/vision_tower/adapter_config.json
    SAVE_DIR/epoch{N}/cullavo/multi_modal_projector.pt
    SAVE_DIR/epoch{N}/cullavo/lm_head.pt
    SAVE_DIR/epoch{N}/cullavo/embed_tokens.pt

and loads it back by exact-name injection from the safetensors plus
``torch.load`` for the extras (``from_pretrained``, :71-136).  This module
produces/consumes that EXACT tree with real PEFT key names
(``base_model.model.<module path>.lora_{A,B}.weight``) and torch ``.pt``
payloads, so checkpoints interchange with the reference's PEFT stack in both
directions.  Our stacked ``[L, d_in, r]`` adapters slice/stack per layer and
transpose to torch's ``[r, d_in]`` / ``[d_out, r]`` convention.
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np

# our stacked-target name → HF module path inside the tower
_LLM_MODULES = {"q": "self_attn.q_proj", "k": "self_attn.k_proj",
                "v": "self_attn.v_proj", "o": "self_attn.o_proj",
                "gate": "mlp.gate_proj", "up": "mlp.up_proj",
                "down": "mlp.down_proj"}
_VIS_MODULES = {"q": "self_attn.q_proj", "k": "self_attn.k_proj",
                "v": "self_attn.v_proj", "o": "self_attn.out_proj",
                "fc1": "mlp.fc1", "fc2": "mlp.fc2"}
_LLM_PREFIX = "base_model.model.model.layers"
_VIS_PREFIX = "base_model.model.vision_model.encoder.layers"


def _torch_save(obj: dict, path: str) -> None:
    import torch

    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in obj.items()}, path)


def _torch_load(path: str) -> dict:
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.float().numpy() for k, v in raw.items()}


def _adapter_flat(lora_tree: dict, modules: dict, prefix: str) -> dict:
    """Stacked {target: {a [L, d_in, r], b [L, r, d_out], mask?}} →
    flat PEFT-named torch-convention arrays.  Vision targets carry a
    per-layer ``mask`` (layers_to_transform); masked-off layers are NOT
    exported, exactly as PEFT only materializes transformed layers."""
    flat = {}
    for t, ad in lora_tree.items():
        a, b = np.asarray(ad["a"]), np.asarray(ad["b"])
        mask = np.asarray(ad["mask"]).reshape(-1) if "mask" in ad else None
        for i in range(a.shape[0]):
            if mask is not None and mask[i] == 0:
                continue
            mod = f"{prefix}.{i}.{modules[t]}"
            flat[f"{mod}.lora_A.weight"] = np.ascontiguousarray(a[i].T)
            flat[f"{mod}.lora_B.weight"] = np.ascontiguousarray(b[i].T)
    return flat


def _adapter_unflat(flat: dict, template: dict, modules: dict,
                    prefix: str, target_modules=None) -> dict:
    """Inverse of ``_adapter_flat`` against a template tree (for shapes,
    dtypes, and the vision layer mask).

    ``target_modules``: the checkpoint's ``adapter_config.json``
    ``target_modules`` list, when available.  Reference trainings do not
    always transform every module our template carries — e.g. the step2
    vision adapter omits ``out_proj`` (add_adapter_for_step2,
    cullavo/load_cullavo.py:23-32) — so a template target whose module is
    absent from ``target_modules`` is left zeroed (``lora_B = 0`` makes the
    adapter an identity) instead of raising.  Missing keys for modules the
    config DOES claim to transform still raise."""
    out = {}
    for t, ad in template.items():
        a = np.zeros_like(np.asarray(ad["a"]))
        b = np.zeros_like(np.asarray(ad["b"]))
        mask = np.asarray(ad["mask"]).reshape(-1) if "mask" in ad else None
        short = modules[t].split(".")[-1]
        transformed = target_modules is None or short in target_modules
        for i in range(a.shape[0]):
            mod = f"{prefix}.{i}.{modules[t]}"
            ka, kb = f"{mod}.lora_A.weight", f"{mod}.lora_B.weight"
            if ka in flat:
                a[i] = np.asarray(flat[ka]).T
                b[i] = np.asarray(flat[kb]).T
            elif transformed and (mask is None or mask[i] != 0):
                raise KeyError(f"adapter key {ka} missing from checkpoint")
        out[t] = {"a": a, "b": b}
        if "mask" in ad:
            out[t]["mask"] = np.asarray(ad["mask"])
    return out


def save_reference_layout(save_dir: str, epoch: int, trainable: dict,
                          lora_cfg, other_state: Optional[dict] = None) -> str:
    """Write one ``epoch{N}`` tree in the reference's exact layout from a
    CuLLaVO trainable partition ({"lora", "projector", "lm_head",
    "embed_tokens"} — lora.trainable_partition).  ``other_state``: optional
    extra (non-LLM) weights for CuLLaVO.pt — the reference stores the
    filtered non-``cullavo*`` state dict there, which is empty for the pure
    LLaVA workloads.  Returns the epoch dir path."""
    if jax.process_index() != 0:
        return os.path.join(save_dir, f"epoch{epoch}")
    trainable = jax.tree.map(np.asarray, jax.device_get(trainable))
    ep = os.path.join(save_dir, f"epoch{epoch}")
    cullavo = os.path.join(ep, "cullavo")
    llm_dir = os.path.join(cullavo, "language_model")
    vis_dir = os.path.join(cullavo, "vision_tower")
    for d in (ep, cullavo, llm_dir, vis_dir):
        os.makedirs(d, exist_ok=True)
    _torch_save(dict(other_state or {}), os.path.join(ep, "CuLLaVO.pt"))

    from safetensors.numpy import save_file

    lora = trainable["lora"]

    def adapter_config(targets, layers_to_transform=None):
        cfg = {"peft_type": "LORA", "task_type": "CAUSAL_LM",
               "r": int(lora_cfg.r), "lora_alpha": float(lora_cfg.alpha),
               "lora_dropout": float(lora_cfg.dropout),
               "bias": "none", "target_modules": sorted(targets)}
        if layers_to_transform is not None:
            cfg["layers_to_transform"] = layers_to_transform
        return cfg

    llm_flat = _adapter_flat(lora.get("language_model", {}), _LLM_MODULES,
                             _LLM_PREFIX)
    save_file(llm_flat, os.path.join(llm_dir, "adapter_model.safetensors"))
    with open(os.path.join(llm_dir, "adapter_config.json"), "w") as f:
        json.dump(adapter_config(
            [m.split(".")[-1] for m in _LLM_MODULES.values()]), f)

    vis_tree = lora.get("vision_tower", {})
    vis_flat = _adapter_flat(vis_tree, _VIS_MODULES, _VIS_PREFIX)
    layers = None
    for ad in vis_tree.values():
        if "mask" in ad:
            layers = [int(i) for i in
                      np.nonzero(np.asarray(ad["mask"]).reshape(-1))[0]]
            break
    save_file(vis_flat, os.path.join(vis_dir, "adapter_model.safetensors"))
    with open(os.path.join(vis_dir, "adapter_config.json"), "w") as f:
        json.dump(adapter_config(
            [m.split(".")[-1] for m in _VIS_MODULES.values()], layers), f)

    proj = trainable["projector"]
    _torch_save({f"{lin}.{nm}": np.asarray(proj[lin]["kernel"]).T
                 if nm == "weight" else np.asarray(proj[lin]["bias"])
                 for lin in ("linear_1", "linear_2")
                 for nm in ("weight", "bias")},
                os.path.join(cullavo, "multi_modal_projector.pt"))
    if trainable.get("lm_head") is not None:
        _torch_save({"weight": np.asarray(trainable["lm_head"]).T},
                    os.path.join(cullavo, "lm_head.pt"))
    _torch_save({"weight": np.asarray(trainable["embed_tokens"])},
                os.path.join(cullavo, "embed_tokens.pt"))
    return ep


def load_reference_layout(path: str, trainable_template: dict) -> dict:
    """Read an ``epoch{N}`` tree (the dir itself, or its ``CuLLaVO.pt`` as
    the reference's RESUME_FROM points at) back into a trainable partition
    shaped like ``trainable_template``.  Mirrors ``from_pretrained``'s
    exact-name safetensors injection + torch extras (:71-136)."""
    if path.endswith(".pt"):
        path = os.path.dirname(path)
    cullavo = os.path.join(path, "cullavo")
    if not os.path.isdir(cullavo):
        raise FileNotFoundError(
            f"no 'cullavo' adapter dir under {path!r} (reference "
            f"BaseModel.from_pretrained layout)")

    from safetensors import safe_open

    def read_st(d):
        flat = {}
        with safe_open(os.path.join(d, "adapter_model.safetensors"),
                       framework="np") as f:
            for k in f.keys():
                flat[k] = f.get_tensor(k)
        return flat

    def read_targets(d):
        cfg_path = os.path.join(d, "adapter_config.json")
        if not os.path.isfile(cfg_path):
            return None
        with open(cfg_path) as f:
            return set(json.load(f).get("target_modules") or []) or None

    tmpl = jax.tree.map(np.asarray, jax.device_get(trainable_template))
    llm_dir = os.path.join(cullavo, "language_model")
    vis_dir = os.path.join(cullavo, "vision_tower")
    lora = {
        "language_model": _adapter_unflat(
            read_st(llm_dir), tmpl["lora"].get("language_model", {}),
            _LLM_MODULES, _LLM_PREFIX, read_targets(llm_dir)),
        "vision_tower": _adapter_unflat(
            read_st(vis_dir), tmpl["lora"].get("vision_tower", {}),
            _VIS_MODULES, _VIS_PREFIX, read_targets(vis_dir)),
    }
    proj_sd = _torch_load(os.path.join(cullavo, "multi_modal_projector.pt"))
    projector = {lin: {"kernel": proj_sd[f"{lin}.weight"].T,
                       "bias": proj_sd[f"{lin}.bias"]}
                 for lin in ("linear_1", "linear_2")}
    out = {"lora": lora, "projector": projector,
           "embed_tokens": _torch_load(
               os.path.join(cullavo, "embed_tokens.pt"))["weight"],
           "lm_head": None}
    if tmpl.get("lm_head") is not None:
        out["lm_head"] = _torch_load(
            os.path.join(cullavo, "lm_head.pt"))["weight"].T
    return jax.tree.map(lambda t, v: np.asarray(v, np.asarray(t).dtype),
                        tmpl, out)
