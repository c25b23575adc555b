"""LoRA adapters for the stacked-params LLaVA stack.

Capability parity with the reference's PEFT setup (cullavo/load_cullavo.py:94-138):
  * LLM: r=64, alpha=16, dropout 0.05 on every linear (q/k/v/o/gate/up/down)
    — the reference targets "all linear names minus lm_head/out_proj".
  * Vision tower: same spec restricted to layers 12..22
    (``layers_to_transform=range(12, 23)``).
  * Separately-trainable full modules: projector, lm_head, embed_tokens.

TPU-first: adapters are stacked along the layer axis like the base weights,
so the scan-over-layers body computes ``x@W + scaling * (x@A)@B`` with no
per-layer Python.  Merging (``merge_lora``) folds adapters into the base for
zero-overhead inference.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from cullavo_tpu.models.llava.config import LlavaConfig

LLM_TARGETS = ("q", "k", "v", "o", "gate", "up", "down")
VISION_TARGETS = ("q", "k", "v", "o", "fc1", "fc2")


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    r: int = 64
    alpha: float = 16.0
    dropout: float = 0.05
    vision_layer_start: int = 12   # load_cullavo.py:106 range(12, 23)
    vision_layer_stop: int = 23

    @property
    def scaling(self) -> float:
        return self.alpha / self.r


def _shapes_of(layers: dict, targets) -> dict:
    """Logical [L, d_in, d_out] shapes — also for already-quantized weights
    (the production order loads → quantizes → THEN attaches LoRA,
    load_cullavo.py:65-112, so adapters must init from quantized bases)."""
    out = {}
    for t in targets:
        if t not in layers:
            continue
        w = layers[t]
        if isinstance(w, dict):
            if "q4p" in w:                 # planar NF4: q4p [L, d_in/8, d_out]
                L, k8, d_out = w["q4p"].shape
                out[t] = (L, k8 * 8, d_out)
            elif "q8" in w:                # int8 keeps the logical shape
                out[t] = w["q8"].shape
            elif "q8t" in w:               # transposed int8 decode layout
                L, d_out, d_in = w["q8t"].shape
                out[t] = (L, d_in, d_out)
            else:
                out[t] = None              # flat q4: caller supplies cfg dims
        else:
            out[t] = w.shape
    return out


def init_lora_params(params: Any, cfg: LlavaConfig, lora: LoraConfig,
                     key: jax.Array, dtype=jnp.float32) -> dict:
    """A/B pairs for each targeted stacked weight.  A ~ N(0, 1/in), B = 0."""
    out: dict = {"language_model": {}, "vision_tower": {}}
    keys = iter(jax.random.split(key, 32))

    tc = cfg.text
    cfg_dims = {"q": (tc.hidden_size, tc.num_attention_heads * tc.head_dim),
                "k": (tc.hidden_size, tc.num_key_value_heads * tc.head_dim),
                "v": (tc.hidden_size, tc.num_key_value_heads * tc.head_dim),
                "o": (tc.num_attention_heads * tc.head_dim, tc.hidden_size),
                "gate": (tc.hidden_size, tc.intermediate_size),
                "up": (tc.hidden_size, tc.intermediate_size),
                "down": (tc.intermediate_size, tc.hidden_size)}
    for t, shape in _shapes_of(params["language_model"]["layers"], LLM_TARGETS).items():
        if shape is None:                  # flat-packed NF4: use config dims
            shape = (tc.num_hidden_layers,) + cfg_dims[t]
        L, d_in, d_out = shape
        out["language_model"][t] = {
            "a": (jax.random.normal(next(keys), (L, d_in, lora.r)) * (d_in ** -0.5)).astype(dtype),
            "b": jnp.zeros((L, lora.r, d_out), dtype),
        }
    vl = params["vision_tower"]["layers"]
    Lv = vl["q"].shape[0]
    start, stop = lora.vision_layer_start, min(lora.vision_layer_stop, Lv)
    if start < stop:
        for t in VISION_TARGETS:
            if t not in vl:
                continue
            L, d_in, d_out = vl[t].shape
            # adapters exist for all layers; a mask zeroes untargeted layers so
            # the scan stays uniform (static shapes, no per-layer branching)
            mask = jnp.zeros((L, 1, 1), dtype).at[start:stop].set(1.0)
            out["vision_tower"][t] = {
                "a": (jax.random.normal(next(keys), (L, d_in, lora.r)) * (d_in ** -0.5)).astype(dtype) * mask,
                "b": jnp.zeros((L, lora.r, d_out), dtype),
                "mask": mask,
            }
    return out


def lora_matmul(x: jax.Array, w: jax.Array, adapter: Optional[dict],
                scaling: float, dropout_rng: Optional[jax.Array] = None,
                dropout: float = 0.0) -> jax.Array:
    """``x @ w`` plus the low-rank update when an adapter is present."""
    y = x @ w
    if adapter is None:
        return y
    xa = x
    if dropout_rng is not None and dropout > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout, x.shape)
        xa = jnp.where(keep, x / (1.0 - dropout), 0.0)
    update = (xa @ adapter["a"]) @ adapter["b"]
    if "mask" in adapter:
        update = update * adapter["mask"][0, 0]
    return y + scaling * update.astype(y.dtype)


def merge_lora(params: Any, lora_params: dict, lora: LoraConfig) -> Any:
    """Fold adapters into base weights (inference path; zero overhead)."""
    merged = jax.tree.map(lambda a: a, params)  # shallow copy of structure
    for tower, layers_key in (("language_model", "layers"), ("vision_tower", "layers")):
        adapters = lora_params.get(tower, {})
        base_layers = dict(merged[tower][layers_key])
        for t, ab in adapters.items():
            update = jnp.einsum("lir,lro->lio", ab["a"], ab["b"]) * lora.scaling
            if "mask" in ab:
                update = update * ab["mask"]
            base_layers[t] = (base_layers[t].astype(jnp.float32) +
                              update.astype(jnp.float32)).astype(base_layers[t].dtype)
        merged[tower] = {**merged[tower], layers_key: base_layers}
    return merged


def trainable_partition(params: Any, lora_params: dict):
    """Split into (trainable, frozen) following load_cullavo.py:128-138:
    LoRA adapters + projector + lm_head + embed_tokens train; rest frozen."""
    trainable = {
        "lora": lora_params,
        "projector": params["projector"],
        "lm_head": params["language_model"].get("lm_head"),
        "embed_tokens": params["language_model"]["embed_tokens"],
    }
    return trainable


def strip_trainable(params: Any) -> Any:
    """Remove the trainable leaves (projector / lm_head / embed_tokens) from
    the base tree, leaving only frozen weights.

    REQUIRED before passing the base tree as the frozen side of a train step:
    the trainable copies live in the TrainState, and donated state buffers
    must never alias frozen-param buffers (XLA would reuse the donated memory
    while the computation still reads it — see shard_train_step).
    """
    lm = {k: v for k, v in params["language_model"].items()
          if k not in ("lm_head", "embed_tokens")}
    out = {k: v for k, v in params.items() if k != "projector"}
    out["language_model"] = lm
    return out


def apply_trainable(params: Any, trainable: dict) -> tuple[Any, dict]:
    """Recombine trainable leaves into the full param tree; returns
    (full_params, lora_params)."""
    lm = dict(params["language_model"])
    lm["embed_tokens"] = trainable["embed_tokens"]
    if trainable.get("lm_head") is not None:
        lm["lm_head"] = trainable["lm_head"]
    full = {**params, "projector": trainable["projector"], "language_model": lm}
    return full, trainable["lora"]


def quantize_llm_weights(params: Any, bits: int = 4,
                         smooth_scales: Any = None,
                         act_scales: Any = None) -> Any:
    """Quantize the stacked LLaMA linear weights (the frozen Q-LoRA base).

    bits=4 → NF4 (load_cullavo.py:65-83 semantics); bits=8 → int8 per-channel
    (the reference's load_in_8bit eval mode).  Embeddings, lm_head, norms,
    projector, vision tower stay in high precision — bnb's
    ``llm_int8_skip_modules=[multi_modal_projector, lm_head]``.

    ``smooth_scales`` (bits=8 only): dict mapping target name → per-input-
    channel SmoothQuant migration scale ([K] or stacked [L, K], from
    activation calibration).  Calibrated dicts enable the s8s8 prefill path
    (ops/nf4.py int8_linear_s8s8_auto) — measured 13.73 vs 11.14 img/s at
    7B on one v5e chip.

    ``act_scales`` (bits=8, requires smooth_scales): dict mapping target →
    STATIC per-layer activation scale ([L], from
    calibrate.static_act_scales_from_stats) — W8A8 static serving mode:
    skips the per-token absmax reduce at runtime (clips out-of-range
    tokens; not bnb per-token semantics)."""
    from cullavo_tpu.ops.nf4 import (BLOCK, quantize_linear,
                                     quantize_linear_int8,
                                     quantize_linear_planar)

    if smooth_scales:
        # targets consuming the SAME tensor (q/k/v; gate/up) MUST share one
        # scale: the grouped s8s8 path (nf4.int8_linear_s8s8_group)
        # quantizes the shared input once with qs[0]'s sq_inv — distinct
        # per-member scales would silently compute (x/s_q)·diag(s_k)W_k,
        # wrong by s_k/s_q per channel.  calibrate.smooth_scales_from_stats
        # emits shared scales by construction; enforce it for other callers.
        import numpy as _np
        for scales in (smooth_scales, act_scales):
            if not scales:
                continue
            for group in (("q", "k", "v"), ("gate", "up")):
                present = [t for t in group if scales.get(t) is not None]
                ref = scales.get(present[0]) if present else None
                for t in present[1:]:
                    if not _np.array_equal(_np.asarray(ref),
                                           _np.asarray(scales[t])):
                        raise ValueError(
                            f"calibration scales for group {group} differ "
                            f"at {t!r}: members sharing an input tensor "
                            "must share ONE scale (int8_linear_s8s8_group "
                            "quantizes the shared input with qs[0]'s)")

    def quant(w, name=None):
        if bits == 8:
            sm = (smooth_scales or {}).get(name) if name else None
            sa = (act_scales or {}).get(name) if name else None
            return quantize_linear_int8(w, smooth_scale=sm, act_scale=sa)
        d_in, d_out = w.shape[-2], w.shape[-1]
        # planar layout (Mosaic-compilable fused kernel) when dims allow;
        # flat byte layout otherwise (tiny test models)
        if d_in % 8 == 0 and d_out % BLOCK == 0:
            return quantize_linear_planar(w)
        return quantize_linear(w)

    lm = dict(params["language_model"])
    layers = dict(lm["layers"])
    for t in LLM_TARGETS:
        layers[t] = quant(layers[t], t)
    lm["layers"] = layers
    return {**params, "language_model": lm}


def maybe_quantize_base(params: Any, bits: int) -> Any:
    """Config-driven base quantization (MODEL.LLM.BITS → 4 = NF4,
    8 = LLM.int8; reference load_cullavo.py:65-83).  No-op when bits is
    neither, or when the LLM linears are already quantized dicts (callers
    may pre-quantize with calibration — don't double-quantize).

    Quantizes ONE target at a time so the full-precision and quantized
    copies of the 7B base never coexist on a 16 GB chip: host (numpy)
    weights — the checkpoint-import path — are NF4-encoded by the C++
    quantizer before any upload (shipping the packed 4-bit stream instead
    of f32, and avoiding the giant one-shot on-device encode program);
    device weights are quantized per-target under jit with the input
    DONATED, so each bf16 original is freed as its quantized form lands."""
    if bits not in (4, 8) or any(
            isinstance(w, dict)
            for w in params["language_model"]["layers"].values()):
        return params
    import numpy as _np

    from cullavo_tpu.ops.nf4 import (BLOCK, quantize_linear,
                                     quantize_linear_int8,
                                     quantize_linear_planar)

    lm = dict(params["language_model"])
    layers = dict(lm["layers"])
    for t in LLM_TARGETS:
        w = layers[t]
        on_device = isinstance(w, jax.Array)
        planar = w.shape[-2] % 8 == 0 and w.shape[-1] % BLOCK == 0
        if bits == 4 and planar and not on_device:
            from cullavo_tpu.native import nf4_quantize_planar_native

            q = nf4_quantize_planar_native(_np.asarray(w, _np.float32))
            layers[t] = jax.tree.map(jnp.asarray, q)
        else:
            if bits == 4:
                fn = quantize_linear_planar if planar else quantize_linear
            else:
                fn = quantize_linear_int8
            jfn = jax.jit(fn, donate_argnums=0) if on_device else jax.jit(fn)
            layers[t] = jax.block_until_ready(jfn(w))
        layers[t] = dict(layers[t])
    lm["layers"] = layers
    return {**params, "language_model": lm}


def quantize_vision_weights(params: Any, smooth_scales: Any = None) -> Any:
    """int8-quantize the CLIP vision tower's linear weights (biases and
    norms stay bf16).  bitsandbytes' load_in_8bit quantizes EVERY nn.Linear
    outside the skip list — including the vision tower
    (cullavo/load_cullavo.py:65-83: skip = [multi_modal_projector,
    lm_head]) — so this matches the reference eval mode more closely than
    a bf16 tower and saves ~300 MB at CLIP-L scale.  With
    ``smooth_scales`` (keyed by VISION_TARGETS) the tower's prefill
    matmuls take the s8s8 MXU path — measured a small LOSS at CLIP-L
    sizes (13.93 vs 14.52 img/s e2e: the [M, 1024] matmuls are too small
    to amortize the activation-quant passes), so calibrate the vision
    tower only when its memory savings matter more than ~4% throughput."""
    from cullavo_tpu.ops.nf4 import quantize_linear_int8

    vt = dict(params["vision_tower"])
    layers = dict(vt["layers"])
    for t in VISION_TARGETS:
        sm = (smooth_scales or {}).get(t)
        layers[t] = quantize_linear_int8(layers[t], smooth_scale=sm)
    vt["layers"] = layers
    return {**params, "vision_tower": vt}


def add_step2_adapters(params: Any, step1_lora: dict, cfg: LlavaConfig,
                       lora: LoraConfig, key: jax.Array,
                       merge_step1: bool = False, dtype=jnp.float32):
    """Second adapter set for step-2 training — the functional equivalent of
    the reference's ``add_adapter_for_step2`` (load_cullavo.py:23-59), which
    attaches a fresh PEFT adapter named 'step2' (making it the active set;
    the step1 adapters stay loaded but inactive).

    Returns ``(base_params, step2_lora)``: a freshly-initialized adapter set
    over the same target modules/vision-layer range.  With
    ``merge_step1=True`` the step1 adapters are folded into the base first
    (only possible on an unquantized base) — the variant to use when step1's
    deltas should stay in effect during step2, which PEFT's inactive-adapter
    semantics silently drop in the reference.
    """
    base = params
    if merge_step1 and step1_lora:
        base = merge_lora(params, step1_lora, lora)
    return base, init_lora_params(base, cfg, lora, key, dtype)


def stack_adapter_sets(sets: list) -> dict:
    """Stack K structurally-identical LLM adapter dicts for per-request
    multi-adapter serving (S-LoRA-style): each ``{target: {a: [L, D, r],
    b: [L, r, N]}}`` becomes ``{target: {a: [L, K, D, r], b: [L, K, r, N]}}``
    — layer axis leading so ``lax.scan`` slices layers, adapter axis second
    so ``llama_forward(adapter_ids=...)`` selects per batch row.

    Pass the LANGUAGE-MODEL adapter subtree only (``lora["language_model"]``
    from ``init_lora_params``): vision-tower adapters carry per-layer masks,
    which the multi path rejects — serve vision adapters as one shared
    single stack.  The reference's analogue is its two PEFT adapter sets
    (step1 + 'step2', load_cullavo.py:23-59) of which only one can be active
    per forward; here each request picks its own.
    """
    if not sets:
        raise ValueError("stack_adapter_sets: need at least one adapter set")
    import jax

    structs = [jax.tree.structure(s) for s in sets]
    if any(st != structs[0] for st in structs[1:]):
        raise ValueError("adapter sets differ in structure: "
                         f"{[str(s) for s in structs]}")

    def stack(*leaves):
        shapes = {l.shape for l in leaves}
        if len(shapes) != 1:
            raise ValueError(f"adapter leaf shapes differ: {shapes}")
        return jnp.stack(leaves, axis=1)

    return jax.tree.map(stack, *sets)
