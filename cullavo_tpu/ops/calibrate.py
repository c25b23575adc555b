"""Activation calibration for W8A8 (s8s8) inference.

The s8s8 prefill path (ops/nf4.py::int8_linear_s8s8) needs per-channel
activation statistics to handle outlier channels — either SmoothQuant
migration scales (``smooth_scale``) or static LLM.int8 outlier indices
(``outlier_idx``), both consumed by ``quantize_linear_int8``.  This module
produces them from a few representative batches, using the model's own
forward (``llava_forward(act_stats=True)``) so the statistics see exactly
the tensors the quantized matmuls will see (image tokens included).

Reference context: bitsandbytes Linear8bitLt (the reference's load_in_8bit
eval mode, cullavo/load_cullavo.py:65-83 / pipeline/LLaVAVQAVALPipeline.py:
94-102) detects outlier columns dynamically per call; on TPU that costs a
top_k + gather chain per linear (measured 10.97 vs 13.73 img/s at 7B), so
calibration is done ONCE here and the hot path stays static.
SmoothQuant: Xiao et al., 2022 (arXiv:2211.10438) — s_k =
amax_act_k**alpha / amax_w_k**(1-alpha).
"""
from __future__ import annotations

from typing import Any, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

# activation-stat key → the LLM linear targets that consume that tensor
_STAT_TO_TARGETS = {
    "attn_in": ("q", "k", "v"),
    "attn_out": ("o",),
    "mlp_in": ("gate", "up"),
    "mlp_down": ("down",),
}


def collect_llm_act_stats(params: Any, cfg, batches: Iterable[dict],
                          compute_dtype=jnp.bfloat16) -> dict:
    """Run ``llava_forward(act_stats=True)`` over ``batches`` and reduce the
    per-channel absmax elementwise across them.

    Each batch dict: {"input_ids": [B, T], "attention_mask": [B, T],
    "pixel_values": [B, 3, H, W] or None}.  Returns
    {"attn_in"/"attn_out"/"mlp_in"/"mlp_down": np.ndarray [L, K]}."""
    from cullavo_tpu.models.llava.modeling import llava_forward

    # jit's own trace cache keys on input shapes — new batch shapes retrace
    # automatically
    fn = jax.jit(lambda p, ids, pix, mask: llava_forward(
        p, cfg, ids, pix, mask, act_stats=True, last_logit_only=True)[2])

    acc = None
    for batch in batches:
        ids = jnp.asarray(batch["input_ids"])
        mask = jnp.asarray(batch["attention_mask"])
        pix = batch.get("pixel_values")
        pix = jnp.asarray(pix, compute_dtype) if pix is not None else None
        stats = fn(params, ids, pix, mask)
        stats = {k: np.asarray(v, np.float32) for k, v in stats.items()}
        acc = stats if acc is None else {
            k: np.maximum(acc[k], stats[k]) for k in acc}
    if acc is None:
        raise ValueError("calibration needs at least one batch")
    return acc


def smooth_scales_from_stats(stats: dict, params: Any, alpha: float = 0.5,
                             clip: tuple = (1e-2, 1e2)) -> dict:
    """SmoothQuant migration scales per LLM target from activation stats +
    the (un-quantized) stacked weights.  Returns {target: [L, K] float32}
    for ``quantize_llm_weights(smooth_scales=...)``.

    Targets that consume the SAME tensor (q/k/v; gate/up) share ONE scale
    (weight amax maxed across the group): the runtime computes
    ``quantize(x * sq_inv)`` per linear, and identical ``sq_inv`` arrays
    let XLA CSE collapse the group's activation-quant passes into one."""
    layers = params["language_model"]["layers"]
    out = {}
    for stat_key, targets in _STAT_TO_TARGETS.items():
        a = np.maximum(stats[stat_key], 1e-6)            # [L, K]
        w_amax = np.maximum.reduce([
            np.abs(np.asarray(jax.device_get(layers[t]), np.float32))
            .max(axis=-1) for t in targets])             # [L, K]
        w_amax = np.maximum(w_amax, 1e-6)
        s = np.clip((a ** alpha) / (w_amax ** (1.0 - alpha)),
                    *clip).astype(np.float32)
        for t in targets:
            out[t] = s
    return out


def static_act_scales_from_stats(stats: dict, smooth_scales: dict) -> dict:
    """STATIC per-tensor activation scales for W8A8 serving (SmoothQuant O3):
    ``sa_l = max_k(absmax_act[l, k] / s[l, k]) / 127`` — the absmax of the
    SMOOTHED activation the runtime actually quantizes.  Returns
    {target: [L] float32} for ``quantize_llm_weights(act_scales=...)``.
    Tokens beyond the calibrated range clip at runtime; use enough
    representative batches."""
    out = {}
    for stat_key, targets in _STAT_TO_TARGETS.items():
        a = np.maximum(stats[stat_key], 1e-6)            # [L, K]
        for t in targets:
            s = np.asarray(smooth_scales[t], np.float32)
            out[t] = np.maximum((a / s).max(axis=-1) / 127.0,
                                1e-8).astype(np.float32)
    return out


def outlier_idx_from_stats(stats: dict, threshold: float = 6.0,
                           max_outliers: int = 64) -> dict:
    """Static LLM.int8 outlier channels per target: the up-to-
    ``max_outliers`` channels whose calibrated absmax crosses ``threshold``
    in ANY layer (the weight dicts share one index set across the stacked
    layers).  Returns {target: np.ndarray [mo] int32} with only non-empty
    entries, for ``quantize_linear_int8(outlier_idx=...)``."""
    out = {}
    for stat_key, targets in _STAT_TO_TARGETS.items():
        col = stats[stat_key].max(axis=0)                # [K]
        idx = np.nonzero(col >= threshold)[0]
        if len(idx) > max_outliers:
            idx = idx[np.argsort(col[idx])[::-1][:max_outliers]]
        for t in targets:
            if len(idx):
                out[t] = np.sort(idx).astype(np.int32)
    return out


def calibrate_and_quantize_llm(params: Any, cfg, batches: Iterable[dict],
                               alpha: float = 0.5,
                               compute_dtype=jnp.bfloat16,
                               stats: Optional[dict] = None,
                               static_act: bool = False) -> Any:
    """One-call W8A8 setup: collect stats → SmoothQuant scales → int8
    quantization with calibration baked in.  The returned params enable the
    s8s8 prefill path automatically (nf4.int8_linear_policy "auto").
    ``static_act=True`` additionally bakes static per-tensor activation
    scales (W8A8 static serving — skips the runtime per-token absmax)."""
    from cullavo_tpu.models.llava.lora import quantize_llm_weights

    if stats is None:
        stats = collect_llm_act_stats(params, cfg, batches, compute_dtype)
    scales = smooth_scales_from_stats(stats, params, alpha=alpha)
    act = static_act_scales_from_stats(stats, scales) if static_act else None
    return quantize_llm_weights(params, bits=8, smooth_scales=scales,
                                act_scales=act)
