"""Import HuggingFace LLaVA weights (safetensors / state dicts) into the
stacked-params pytree used by cullavo_tpu.models.llava.

Handles both HF naming eras:
  * new (transformers >= 4.52): ``model.language_model.*``,
    ``model.vision_tower.*``, ``model.multi_modal_projector.*``
  * old (the reference's era):  ``language_model.model.*``,
    ``vision_tower.vision_model.*``, ``multi_modal_projector.*``

All linear weights are transposed from HF [out, in] to [in, out]; per-layer
tensors are stacked along a leading layer axis (scan-over-layers layout).
Capability reference: the HF ``from_pretrained`` load in
cullavo/load_cullavo.py:63-90.
"""
from __future__ import annotations

import glob
import os
from typing import Callable, Mapping

import numpy as np

from cullavo_tpu.models.llava.config import ClipVisionConfig, LlamaConfig, LlavaConfig

__all__ = ["from_hf_state_dict", "llava_config_from_json",
           "load_llava_safetensors", "to_hf_state_dict"]


def llava_config_from_json(model_dir: str) -> LlavaConfig:
    """Build a LlavaConfig from an HF snapshot's ``config.json`` — the
    shape source HF ``from_pretrained`` uses (load_cullavo.py:63-90), so any
    LLaVA-family size imports without hardcoding the 7B architecture.
    Falls back to the LLaVA-1.5-7B defaults if the file is absent."""
    import json

    path = os.path.join(model_dir, "config.json")
    if not os.path.exists(path):
        return LlavaConfig()
    with open(path) as f:
        hf = json.load(f)
    tc, vc = hf.get("text_config", {}), hf.get("vision_config", {})

    def take(cls, src, **extra):
        fields = {f.name for f in __import__("dataclasses").fields(cls)}
        kw = {k: v for k, v in src.items() if k in fields}
        kw.update(extra)
        return cls(**kw)

    text = take(LlamaConfig, tc)
    vision = take(ClipVisionConfig, vc)
    return LlavaConfig(
        vision=vision, text=text,
        projector_hidden_act=hf.get("projector_hidden_act", "gelu"),
        vision_feature_layer=hf.get("vision_feature_layer", -2),
        vision_feature_select_strategy=hf.get(
            "vision_feature_select_strategy", "default"),
        image_token_id=hf.get("image_token_index", 32000),
        pad_token_id=hf.get("pad_token_id", 32001))


def _normalize_key(key: str) -> str:
    """Map either HF naming era to a canonical one."""
    k = key
    if k.startswith("model.language_model."):
        k = "lm." + k[len("model.language_model."):]
    elif k.startswith("language_model.model."):
        k = "lm." + k[len("language_model.model."):]
    elif k.startswith("language_model.lm_head."):
        k = "lm_head." + k[len("language_model.lm_head."):]
    elif k.startswith("model.vision_tower.vision_model."):
        k = "vt." + k[len("model.vision_tower.vision_model."):]
    elif k.startswith("vision_tower.vision_model."):
        k = "vt." + k[len("vision_tower.vision_model."):]
    elif k.startswith("model.multi_modal_projector."):
        k = "proj." + k[len("model.multi_modal_projector."):]
    elif k.startswith("multi_modal_projector."):
        k = "proj." + k[len("multi_modal_projector."):]
    return k


def from_hf_state_dict(
    state: Mapping[str, np.ndarray],
    cfg: LlavaConfig,
    dtype=np.float32,
) -> dict:
    """Build the llava params pytree from a flat HF state dict of numpy arrays."""
    sd = {_normalize_key(k): np.asarray(v) for k, v in state.items()}

    def get(name: str) -> np.ndarray:
        return sd[name].astype(dtype)

    def stack(fmt: str, n: int, transpose: bool = False) -> np.ndarray:
        arrs = [get(fmt.format(i)) for i in range(n)]
        if transpose:
            arrs = [a.T for a in arrs]
        return np.stack(arrs)

    tc: LlamaConfig = cfg.text
    vc: ClipVisionConfig = cfg.vision
    Lt, Lv = tc.num_hidden_layers, vc.num_hidden_layers

    lm = {
        "embed_tokens": get("lm.embed_tokens.weight"),
        "layers": {
            "input_ln": stack("lm.layers.{}.input_layernorm.weight", Lt),
            "q": stack("lm.layers.{}.self_attn.q_proj.weight", Lt, True),
            "k": stack("lm.layers.{}.self_attn.k_proj.weight", Lt, True),
            "v": stack("lm.layers.{}.self_attn.v_proj.weight", Lt, True),
            "o": stack("lm.layers.{}.self_attn.o_proj.weight", Lt, True),
            "post_ln": stack("lm.layers.{}.post_attention_layernorm.weight", Lt),
            "gate": stack("lm.layers.{}.mlp.gate_proj.weight", Lt, True),
            "up": stack("lm.layers.{}.mlp.up_proj.weight", Lt, True),
            "down": stack("lm.layers.{}.mlp.down_proj.weight", Lt, True),
        },
        "norm": get("lm.norm.weight"),
    }
    if "lm_head.weight" in sd:
        lm["lm_head"] = get("lm_head.weight").T

    # HF CLIP has a historical typo: "pre_layrnorm"
    pre_ln = "vt.pre_layrnorm" if "vt.pre_layrnorm.weight" in sd else "vt.pre_layernorm"
    patch_w = get("vt.embeddings.patch_embedding.weight")  # [D, 3, P, P]
    D = patch_w.shape[0]
    vt = {
        "class_embedding": get("vt.embeddings.class_embedding"),
        "patch_embedding": patch_w.reshape(D, -1).T,        # [3*P*P, D]
        "position_embedding": get("vt.embeddings.position_embedding.weight"),
        "pre_ln": {"scale": get(f"{pre_ln}.weight"), "bias": get(f"{pre_ln}.bias")},
        "layers": {
            "ln1_scale": stack("vt.encoder.layers.{}.layer_norm1.weight", Lv),
            "ln1_bias": stack("vt.encoder.layers.{}.layer_norm1.bias", Lv),
            "q": stack("vt.encoder.layers.{}.self_attn.q_proj.weight", Lv, True),
            "q_b": stack("vt.encoder.layers.{}.self_attn.q_proj.bias", Lv),
            "k": stack("vt.encoder.layers.{}.self_attn.k_proj.weight", Lv, True),
            "k_b": stack("vt.encoder.layers.{}.self_attn.k_proj.bias", Lv),
            "v": stack("vt.encoder.layers.{}.self_attn.v_proj.weight", Lv, True),
            "v_b": stack("vt.encoder.layers.{}.self_attn.v_proj.bias", Lv),
            "o": stack("vt.encoder.layers.{}.self_attn.out_proj.weight", Lv, True),
            "o_b": stack("vt.encoder.layers.{}.self_attn.out_proj.bias", Lv),
            "ln2_scale": stack("vt.encoder.layers.{}.layer_norm2.weight", Lv),
            "ln2_bias": stack("vt.encoder.layers.{}.layer_norm2.bias", Lv),
            "fc1": stack("vt.encoder.layers.{}.mlp.fc1.weight", Lv, True),
            "fc1_b": stack("vt.encoder.layers.{}.mlp.fc1.bias", Lv),
            "fc2": stack("vt.encoder.layers.{}.mlp.fc2.weight", Lv, True),
            "fc2_b": stack("vt.encoder.layers.{}.mlp.fc2.bias", Lv),
        },
        "post_ln": {"scale": get("vt.post_layernorm.weight"),
                    "bias": get("vt.post_layernorm.bias")},
    }

    proj = {
        "linear_1": {"kernel": get("proj.linear_1.weight").T, "bias": get("proj.linear_1.bias")},
        "linear_2": {"kernel": get("proj.linear_2.weight").T, "bias": get("proj.linear_2.bias")},
    }
    return {"vision_tower": vt, "projector": proj, "language_model": lm}


def load_llava_safetensors(model_dir: str, cfg: LlavaConfig, dtype=np.float32) -> dict:
    """Load all ``*.safetensors`` shards under ``model_dir`` and import."""
    from safetensors import safe_open

    state: dict[str, np.ndarray] = {}
    files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no safetensors under {model_dir}")
    for path in files:
        with safe_open(path, framework="np") as f:
            for name in f.keys():
                state[name] = f.get_tensor(name)
    return from_hf_state_dict(state, cfg, dtype)


def import_torch_module(torch_model, cfg: LlavaConfig, dtype=np.float32) -> dict:
    """Import directly from an in-memory torch LlavaForConditionalGeneration."""
    state = {k: v.detach().to("cpu").float().numpy()
             for k, v in torch_model.state_dict().items()}
    return from_hf_state_dict(state, cfg, dtype)


def to_hf_state_dict(params: dict, cfg: LlavaConfig) -> dict:
    """Export back to HF (new-era) names — inverse of ``from_hf_state_dict``.

    Used by the checkpoint exporter so trained weights remain HF-importable
    (capability parity with BaseModel.save_pretrained, modeling/BaseModel.py:20-69).
    """
    out: dict[str, np.ndarray] = {}
    lm, vt, proj = params["language_model"], params["vision_tower"], params["projector"]
    out["model.language_model.embed_tokens.weight"] = np.asarray(lm["embed_tokens"])
    Lt = cfg.text.num_hidden_layers
    names = {"input_ln": ("input_layernorm.weight", False),
             "q": ("self_attn.q_proj.weight", True), "k": ("self_attn.k_proj.weight", True),
             "v": ("self_attn.v_proj.weight", True), "o": ("self_attn.o_proj.weight", True),
             "post_ln": ("post_attention_layernorm.weight", False),
             "gate": ("mlp.gate_proj.weight", True), "up": ("mlp.up_proj.weight", True),
             "down": ("mlp.down_proj.weight", True)}
    for key, (suffix, transpose) in names.items():
        stacked = np.asarray(lm["layers"][key])
        for i in range(Lt):
            a = stacked[i]
            out[f"model.language_model.layers.{i}.{suffix}"] = a.T if transpose else a
    out["model.language_model.norm.weight"] = np.asarray(lm["norm"])
    if "lm_head" in lm:
        out["lm_head.weight"] = np.asarray(lm["lm_head"]).T

    P = cfg.vision.patch_size
    D = cfg.vision.hidden_size
    out["model.vision_tower.vision_model.embeddings.class_embedding"] = np.asarray(vt["class_embedding"])
    out["model.vision_tower.vision_model.embeddings.patch_embedding.weight"] = (
        np.asarray(vt["patch_embedding"]).T.reshape(D, 3, P, P))
    out["model.vision_tower.vision_model.embeddings.position_embedding.weight"] = (
        np.asarray(vt["position_embedding"]))
    out["model.vision_tower.vision_model.pre_layrnorm.weight"] = np.asarray(vt["pre_ln"]["scale"])
    out["model.vision_tower.vision_model.pre_layrnorm.bias"] = np.asarray(vt["pre_ln"]["bias"])
    out["model.vision_tower.vision_model.post_layernorm.weight"] = np.asarray(vt["post_ln"]["scale"])
    out["model.vision_tower.vision_model.post_layernorm.bias"] = np.asarray(vt["post_ln"]["bias"])
    vnames = {"ln1_scale": ("layer_norm1.weight", False), "ln1_bias": ("layer_norm1.bias", False),
              "q": ("self_attn.q_proj.weight", True), "q_b": ("self_attn.q_proj.bias", False),
              "k": ("self_attn.k_proj.weight", True), "k_b": ("self_attn.k_proj.bias", False),
              "v": ("self_attn.v_proj.weight", True), "v_b": ("self_attn.v_proj.bias", False),
              "o": ("self_attn.out_proj.weight", True), "o_b": ("self_attn.out_proj.bias", False),
              "ln2_scale": ("layer_norm2.weight", False), "ln2_bias": ("layer_norm2.bias", False),
              "fc1": ("mlp.fc1.weight", True), "fc1_b": ("mlp.fc1.bias", False),
              "fc2": ("mlp.fc2.weight", True), "fc2_b": ("mlp.fc2.bias", False)}
    for key, (suffix, transpose) in vnames.items():
        stacked = np.asarray(vt["layers"][key])
        for i in range(cfg.vision.num_hidden_layers):
            a = stacked[i]
            out[f"model.vision_tower.vision_model.encoder.layers.{i}.{suffix}"] = (
                a.T if transpose else a)
    for lin in ("linear_1", "linear_2"):
        out[f"model.multi_modal_projector.{lin}.weight"] = np.asarray(proj[lin]["kernel"]).T
        out[f"model.multi_modal_projector.{lin}.bias"] = np.asarray(proj[lin]["bias"])
    return out


def llama_from_causal_lm_state_dict(state: Mapping[str, np.ndarray],
                                    cfg: LlamaConfig, dtype=np.float32) -> dict:
    """Text-only LlamaForCausalLM / MistralForCausalLM state dict → the
    ``language_model`` subtree (stacked layers).  Used by the VQA pipeline's
    LLaMA-2 question-topic classifier (LLaVAVQAVALPipeline.py:94-97)."""
    sd = {}
    for k, v in state.items():
        k = k[len("model."):] if k.startswith("model.") else k
        sd[k] = np.asarray(v)

    def get(name):
        return sd[name].astype(dtype)

    def stack(fmt, n, transpose=False):
        arrs = [get(fmt.format(i)) for i in range(n)]
        if transpose:
            arrs = [a.T for a in arrs]
        return np.stack(arrs)

    L = cfg.num_hidden_layers
    lm = {
        "embed_tokens": get("embed_tokens.weight"),
        "layers": {
            "input_ln": stack("layers.{}.input_layernorm.weight", L),
            "q": stack("layers.{}.self_attn.q_proj.weight", L, True),
            "k": stack("layers.{}.self_attn.k_proj.weight", L, True),
            "v": stack("layers.{}.self_attn.v_proj.weight", L, True),
            "o": stack("layers.{}.self_attn.o_proj.weight", L, True),
            "post_ln": stack("layers.{}.post_attention_layernorm.weight", L),
            "gate": stack("layers.{}.mlp.gate_proj.weight", L, True),
            "up": stack("layers.{}.mlp.up_proj.weight", L, True),
            "down": stack("layers.{}.mlp.down_proj.weight", L, True),
        },
        "norm": get("norm.weight"),
    }
    lm["lm_head"] = (get("lm_head.weight").T if "lm_head.weight" in sd
                     else lm["embed_tokens"].T)   # tied embeddings
    return lm
