"""LLaMA decoder in functional JAX, scan-over-layers with stacked params.

TPU-first design notes:
  * All per-layer weights are stacked along a leading layer axis and the
    forward pass is a single ``lax.scan`` — one compiled layer body instead of
    ``n_layers`` unrolled copies (fast compile, and FSDP sharding is one
    PartitionSpec per stacked tensor).
  * KV cache is a preallocated S-major ``[L, max_len, B, KV, hd]`` buffer updated with
    ``lax.dynamic_update_slice`` — static shapes throughout decode.
  * Matmuls run in the requested compute dtype (bf16 on TPU → MXU), softmax
    and normalization statistics in fp32.

Capability reference: the LLaMA-2-7B tower inside HF LLaVA used by the
reference (cullavo/arch_cullavo.py:546-677); this is a fresh implementation.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.ad_checkpoint
import jax.numpy as jnp

from cullavo_tpu.models.llava.config import LlamaConfig
from cullavo_tpu.ops import nf4 as nf4_ops

Params = Any

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_llama_params(cfg: LlamaConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 10)
    L, D, I = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    H, KV, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    def dense(k, shape):
        fan_in = shape[-2]
        return (jax.random.normal(k, shape) * (fan_in ** -0.5)).astype(dtype)

    params = {
        "embed_tokens": (jax.random.normal(ks[0], (cfg.vocab_size, D)) * 0.02).astype(dtype),
        "layers": {
            "input_ln": jnp.ones((L, D), dtype),
            "q": dense(ks[1], (L, D, H * hd)),
            "k": dense(ks[2], (L, D, KV * hd)),
            "v": dense(ks[3], (L, D, KV * hd)),
            "o": dense(ks[4], (L, H * hd, D)),
            "post_ln": jnp.ones((L, D), dtype),
            "gate": dense(ks[5], (L, D, I)),
            "up": dense(ks[6], (L, D, I)),
            "down": dense(ks[7], (L, I, D)),
        },
        "norm": jnp.ones((D,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense(ks[8], (D, cfg.vocab_size))
    return params


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    dtype = x.dtype
    x = x.astype(jnp.float32)
    x = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    return (x.astype(dtype)) * weight


def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float):
    """cos/sin tables for rotary embedding at the given positions [B, T]."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # [B, T, hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)               # [B, T, hd]
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [B, H, T, hd]; cos/sin: [B, T, hd].  HF rotate-half convention."""
    cos = cos[:, None, :, :]
    sin = sin[:, None, :, :]
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (x.astype(jnp.float32) * cos + rotated.astype(jnp.float32) * sin).astype(x.dtype)


def apply_rope_bthd(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """apply_rope for the packed-heads layout: x [B, T, H, hd] (a free
    reshape view of the projection output — no [B,H,T,hd] transpose)."""
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (x.astype(jnp.float32) * cos + rotated.astype(jnp.float32) * sin).astype(x.dtype)


def sdpa(q: jax.Array, k: jax.Array, v: jax.Array, bias: Optional[jax.Array]) -> jax.Array:
    """Scaled dot-product attention, fp32 softmax.  [B, H, T, hd] layout."""
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        scores = scores + bias
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def repeat_kv(x: jax.Array, n_rep: int) -> jax.Array:
    if n_rep == 1:
        return x
    return jnp.repeat(x, n_rep, axis=1)


def _wwin_ok(T: int, S: int, hd: int) -> bool:
    """Gate for the fused W-window flash-decode kernel (ops/wwin_decode.py).

    The kernel replaces the XLA cache part of the speculative-verification
    forward (stale_cache, T > 1): it reads the full stacked [L, S, B, KV, hd]
    cache directly (no per-layer slice copy) and keeps the [.., W, S]
    probabilities in VMEM.  Preconditions: S a multiple of the 128 kv-block
    (spec callers round their cache length up — bench.py / vqa_pipeline /
    serving engine) and, on a real TPU, a lane-aligned head dim.  Default ON
    for TPU (chip A/B in STATUS r4: W=4 verification forward 34-37 ms →
    ~21 ms at 7B shapes); CULLAVO_WWIN=0 forces the XLA path, =1 forces the
    kernel (CPU tests run it in interpret mode)."""
    import os

    if T <= 1 or S % 128 != 0:
        return False
    env = os.environ.get("CULLAVO_WWIN", "")
    if env == "0":
        return False
    # width cap: chip-validated for speculative windows (W ≈ spec_k) and for
    # prefix-cache suffix prefills up to W=64 (same-day A/B on the
    # 3-questions-per-image serving corpus: 7.99 vs 7.37 req/s over the XLA
    # window path — the [.., W, S] probabilities stay in VMEM).  Wider
    # windows (the 128 suffix bucket) stay on the XLA branch until measured;
    # CULLAVO_WWIN_MAXW overrides either way.
    if T > int(os.environ.get("CULLAVO_WWIN_MAXW", 64)):
        return False
    if env == "1":
        return True
    return jax.default_backend() == "tpu" and hd % 128 == 0


def _wwin_block(S: int) -> int:
    """kv-block size for the wwin kernel: CULLAVO_WWIN_BLOCK (chip tuning
    knob) when it divides S, else the 128 default."""
    import os

    bs = int(os.environ.get("CULLAVO_WWIN_BLOCK", 128))
    return bs if (bs % 128 == 0 and S % bs == 0) else 128


def round_cache_len(n: int) -> int:
    """Round a KV-cache length up to the wwin kernel's 128-slot block
    granularity (extra slots stay masked).  The ONE place the kernel's
    cache-length contract lives — every speculative caller (bench, VQA
    pipeline, serving engine, probes) rounds through this, so a future
    block-granularity change cannot silently drop one of them back to the
    unfused XLA window path (``_wwin_ok`` falls back when S % 128 != 0)."""
    return -(-n // 128) * 128


def sdpa_decode_stale(q, k_cache, v_cache, k_cur, v_cur, bias,
                      self_bias=None, scale=None):
    """One-token decode attention over a READ-ONLY cache plus the current
    token's k/v handled out-of-band (joint fp32 softmax over S+1 positions).

    Avoids the per-layer cache copy+restack that a scan-carried
    ``dynamic_update_slice`` cache costs (~2.8 GB/step at 7B batch 4): the
    cache is only read here; the caller scatters ``k_cur/v_cur`` into the
    cache once per decode step as an in-place while-carry update.

    q, k_cur, v_cur: [B, H, 1, hd]; k_cache, v_cache: [B, H, S, hd];
    bias: [B|1, H|1, 1, S] additive (NEG_INF on invalid/unwritten slots);
    self_bias: optional [B|1, H|1, 1, 1] additive bias on the current
    position (T5 relative-position bucket 0); scale: query scaling, default
    1/sqrt(hd) (pass 1.0 for T5's unscaled attention).
    """
    scale = q.shape[-1] ** -0.5 if scale is None else scale
    s_cache = jnp.einsum("bhqd,bhkd->bhqk", q, k_cache,
                         preferred_element_type=jnp.float32) * scale + bias
    s_self = jnp.sum(q.astype(jnp.float32) * k_cur.astype(jnp.float32),
                     axis=-1, keepdims=True) * scale          # [B, H, 1, 1]
    if self_bias is not None:
        s_self = s_self + self_bias
    m = jnp.maximum(jnp.max(s_cache, axis=-1, keepdims=True), s_self)
    e_c = jnp.exp(s_cache - m)
    e_s = jnp.exp(s_self - m)
    denom = jnp.sum(e_c, axis=-1, keepdims=True) + e_s
    out = jnp.einsum("bhqk,bhkd->bhqd", (e_c / denom).astype(q.dtype), v_cache,
                     preferred_element_type=jnp.float32)
    out = out + (e_s / denom) * v_cur.astype(jnp.float32)
    return out.astype(q.dtype)


def sdpa_smajor(q, k_cache, v_cache, bias, n_rep, scale=None):
    """Attention over an S-major cache slice ``[S, B, KV, hd]``.

    The LLaMA KV cache is stored ``[L, S, B, KV, hd]`` (sequence slot major)
    so that the plain row-major layout makes each written slot one contiguous
    slab: XLA's layout assignment then keeps the cache in its input layout
    instead of inserting a full cache-sized relayout copy at decode-program
    entry (measured: one 3.2 GB HLO temp per decode call at 7B batch 20 with
    the old [L, B, KV, S, hd] order).  q: [B, H, T, hd]; bias additive
    [B|1, 1|H, T, S]."""
    scale = q.shape[-1] ** -0.5 if scale is None else scale
    k = k_cache if n_rep == 1 else jnp.repeat(k_cache, n_rep, axis=2)
    v = v_cache if n_rep == 1 else jnp.repeat(v_cache, n_rep, axis=2)
    s = jnp.einsum("bhqd,sbhd->bhqs", q, k,
                   preferred_element_type=jnp.float32) * scale + bias
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqs,sbhd->bhqd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _window_scores(q, k_cur, scale):
    """Scores of the fresh decode window against itself: [B, H, W, W] with
    the intra-window causal mask (query i sees fresh keys j <= i).  For the
    classic one-token decode (W=1) this reduces to the q·k_cur dot with no
    mask — the speculative-verification window (W=spec_k) is the general
    case: the W fresh tokens are cur_tok + drafts, mutually causal."""
    W = q.shape[2]
    if W == 1:
        return jnp.sum(q.astype(jnp.float32) * k_cur.astype(jnp.float32),
                       axis=-1, keepdims=True) * scale        # [B, H, 1, 1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k_cur,
                   preferred_element_type=jnp.float32) * scale
    i = jnp.arange(W)
    return jnp.where((i[:, None] >= i[None, :])[None, None], s, NEG_INF)


def sdpa_decode_stale_smajor(q, k_cache, v_cache, k_cur, v_cur, bias,
                             n_rep=1, scale=None):
    """``sdpa_decode_stale`` for the S-major ``[S, B, KV, hd]`` cache slice
    (see ``sdpa_smajor`` for why the LLaMA cache is stored slot-major).
    q, k_cur, v_cur: [B, H, W, hd] (W=1 classic decode; W>1 speculative
    verification window, intra-window causal); bias: [B|1, 1|H, W, S].

    Windows with W in 2..7 run the CACHE dots at the 8-padded width;
    padded rows read garbage that is sliced away, the
    intra-window block stays at W with NEG_INF-padded columns so real rows'
    softmax denominators are untouched."""
    scale = q.shape[-1] ** -0.5 if scale is None else scale
    k = k_cache if n_rep == 1 else jnp.repeat(k_cache, n_rep, axis=2)
    v = v_cache if n_rep == 1 else jnp.repeat(v_cache, n_rep, axis=2)
    s_self = _window_scores(q, k_cur, scale)                  # [B, H, W, W]
    W = q.shape[2]
    pad = 0 if (W == 1 or W % 8 == 0) else (-W) % 8
    qp, bias_p = q, bias
    if pad:
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        bias_p = jnp.pad(jnp.broadcast_to(
            bias, (q.shape[0], bias.shape[1]) + bias.shape[2:]),
            ((0, 0), (0, 0), (0, pad), (0, 0)))
        s_self = jnp.pad(s_self, ((0, 0), (0, 0), (0, pad), (0, pad)),
                         constant_values=NEG_INF)
        k_cur = jnp.pad(k_cur, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v_cur = jnp.pad(v_cur, ((0, 0), (0, 0), (0, pad), (0, 0)))
    s_cache = jnp.einsum("bhqd,sbhd->bhqs", qp, k,
                         preferred_element_type=jnp.float32) * scale + bias_p
    m = jnp.maximum(jnp.max(s_cache, axis=-1, keepdims=True),
                    jnp.max(s_self, axis=-1, keepdims=True))
    e_c = jnp.exp(s_cache - m)
    e_s = jnp.exp(s_self - m)
    denom = (jnp.sum(e_c, axis=-1, keepdims=True)
             + jnp.sum(e_s, axis=-1, keepdims=True))
    out = jnp.einsum("bhqs,sbhd->bhqd", (e_c / denom).astype(q.dtype), v,
                     preferred_element_type=jnp.float32)
    out = out + jnp.einsum("bhqk,bhkd->bhqd", e_s / denom,
                           v_cur.astype(jnp.float32),
                           preferred_element_type=jnp.float32)
    return out[:, :, :W].astype(q.dtype)


def quantize_kv(x: jax.Array):
    """Symmetric per-vector int8 quantization over the head dim.

    x: [..., hd] float → (int8 [..., hd], scale [...] bf16).  One scale per
    (slot, batch, head) vector: fine enough that 16-token greedy decode is
    answer-stable at 7B, coarse enough that the scale plane is 1/128 the
    cache (and with no trailing size-1 axis, which TPU lane padding would
    blow up 128×)."""
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-8) / 127.0
    q = jnp.round(xf / scale[..., None]).astype(jnp.int8)
    return q, scale.astype(jnp.bfloat16)


def _fold_scale(s: jax.Array) -> jax.Array:
    """[S, B, H] per-key scales → [B, H, 1, S] broadcastable over scores."""
    return s.astype(jnp.float32).transpose(1, 2, 0)[:, :, None, :]


def sdpa_smajor_q8(q, k_q, k_s, v_q, v_s, bias, n_rep, scale=None):
    """``sdpa_smajor`` over an int8-quantized S-major cache slice.

    k_q/v_q: int8 [S, B, KV, hd]; k_s/v_s: [S, B, KV] per-vector scales.
    The scales fold OUTSIDE the dots — scores = (q·k_int8)·k_s and
    out = (p·v_s)·v_int8 — so both cache-sized operands stream as a pure
    int8→bf16 convert fused into the dot (the same XLA pattern that streams
    int8 *weights* at ~630 GB/s), halving decode's KV-cache HBM traffic."""
    scale = q.shape[-1] ** -0.5 if scale is None else scale
    if n_rep != 1:
        k_q, v_q = jnp.repeat(k_q, n_rep, 2), jnp.repeat(v_q, n_rep, 2)
        k_s, v_s = jnp.repeat(k_s, n_rep, 2), jnp.repeat(v_s, n_rep, 2)
    s = jnp.einsum("bhqd,sbhd->bhqs", q, k_q.astype(q.dtype),
                   preferred_element_type=jnp.float32)
    s = s * (_fold_scale(k_s) * scale) + bias
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqs,sbhd->bhqd", (p * _fold_scale(v_s)).astype(q.dtype),
                     v_q.astype(q.dtype), preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def sdpa_decode_stale_smajor_q8(q, k_q, k_s, v_q, v_s, k_cur, v_cur, bias,
                                n_rep=1, scale=None, win_q8=None):
    """``sdpa_decode_stale_smajor`` over an int8-quantized cache slice (see
    ``sdpa_smajor_q8`` for the scale-folding contract).  The fresh window's
    k/v stay full-precision, arrive ALREADY repeated to H heads (same
    contract as the bf16 variant), and join the softmax out-of-band
    (W=1 classic decode; W>1 speculative verification window).

    ``win_q8`` (speculative windows, W > 1): the window's QUANTIZED k/v as
    they are about to be written to the cache — ``(k_wq [W, B, KV, hd] int8,
    k_ws [W, B, KV], v_wq, v_ws)``, pre-head-repeat.  Intra-window query i
    then attends to draft keys j < i through the SAME int8 + folded-scale
    compute path a later sequential ``generate_decode`` step would use when
    reading those slots back from the cache, while the diagonal (each
    token's own k/v) stays full-precision exactly as the classic W=1 step
    keeps it.  Without this, near-tie argmaxes could diverge between the
    speculative and sequential streams under an int8 cache (the draft keys
    joined at full precision here but quantized there)."""
    scale = q.shape[-1] ** -0.5 if scale is None else scale
    if n_rep != 1:
        k_q, v_q = jnp.repeat(k_q, n_rep, 2), jnp.repeat(v_q, n_rep, 2)
        k_s, v_s = jnp.repeat(k_s, n_rep, 2), jnp.repeat(v_s, n_rep, 2)
    s_cache = jnp.einsum("bhqd,sbhd->bhqs", q, k_q.astype(q.dtype),
                         preferred_element_type=jnp.float32)
    s_cache = s_cache * (_fold_scale(k_s) * scale) + bias
    W = q.shape[2]
    if win_q8 is not None and W > 1:
        k_wq, k_ws, v_wq, v_ws = win_q8
        if n_rep != 1:
            k_wq, v_wq = jnp.repeat(k_wq, n_rep, 2), jnp.repeat(v_wq, n_rep, 2)
            k_ws, v_ws = jnp.repeat(k_ws, n_rep, 2), jnp.repeat(v_ws, n_rep, 2)
        # off-diagonal (j < i) scores: identical math to the cache read path
        s_w = jnp.einsum("bhqd,wbhd->bhqw", q, k_wq.astype(q.dtype),
                         preferred_element_type=jnp.float32)
        s_w = s_w * (_fold_scale(k_ws) * scale)               # [B, H, W, W]
        # diagonal: each window token's own key, full precision (as W=1)
        diag = jnp.sum(q.astype(jnp.float32) * k_cur.astype(jnp.float32),
                       axis=-1) * scale                       # [B, H, W]
        i = jnp.arange(W)
        eye = (i[:, None] == i[None, :])[None, None]
        lower = (i[:, None] > i[None, :])[None, None]
        s_self = jnp.where(eye, diag[..., :, None],
                           jnp.where(lower, s_w, NEG_INF))
    else:
        s_self = _window_scores(q, k_cur, scale)              # [B, H, W, W]
    m = jnp.maximum(jnp.max(s_cache, axis=-1, keepdims=True),
                    jnp.max(s_self, axis=-1, keepdims=True))
    e_c = jnp.exp(s_cache - m)
    e_s = jnp.exp(s_self - m)
    denom = (jnp.sum(e_c, axis=-1, keepdims=True)
             + jnp.sum(e_s, axis=-1, keepdims=True))
    p = (e_c / denom) * _fold_scale(v_s)
    out = jnp.einsum("bhqs,sbhd->bhqd", p.astype(q.dtype), v_q.astype(q.dtype),
                     preferred_element_type=jnp.float32)
    if win_q8 is not None and W > 1:
        p_self = e_s / denom                                  # [B, H, W, W]
        # draft values j < i through the cache compute path ...
        p_off = jnp.where(eye, 0.0, p_self) * _fold_scale(v_ws)
        out = out + jnp.einsum("bhqw,wbhd->bhqd", p_off.astype(q.dtype),
                               v_wq.astype(q.dtype),
                               preferred_element_type=jnp.float32)
        # ... and each token's own value full-precision (the diagonal)
        p_diag = jnp.sum(jnp.where(eye, p_self, 0.0), axis=-1)  # [B, H, W]
        out = out + p_diag[..., None] * v_cur.astype(jnp.float32)
    else:
        out = out + jnp.einsum("bhqk,bhkd->bhqd", e_s / denom,
                               v_cur.astype(jnp.float32),
                               preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def init_kv_cache(cfg: LlamaConfig, batch: int, max_len: int, dtype=jnp.bfloat16,
                  kv_quant: Optional[str] = None):
    """S-major KV cache ``[L, S, B, KV, hd]`` — see ``sdpa_smajor``.

    ``kv_quant="int8"`` stores int8 values + per-(slot, batch, head) bf16
    scale planes ``k_s/v_s [L, S, B, KV]`` — half the HBM footprint and half
    the per-decode-step cache read (which DOMINATES large-batch decode: at 7B
    NF4 batch 22 the bf16 cache read is 7.4 GB/step vs 4.4 GB of weights)."""
    L, KV, hd = cfg.num_hidden_layers, cfg.num_key_value_heads, cfg.head_dim
    if kv_quant == "int8":
        return {
            "k": jnp.zeros((L, max_len, batch, KV, hd), jnp.int8),
            "v": jnp.zeros((L, max_len, batch, KV, hd), jnp.int8),
            "k_s": jnp.zeros((L, max_len, batch, KV), jnp.bfloat16),
            "v_s": jnp.zeros((L, max_len, batch, KV), jnp.bfloat16),
        }
    assert kv_quant is None, f"unknown kv_quant {kv_quant!r}"
    return {
        "k": jnp.zeros((L, max_len, batch, KV, hd), dtype),
        "v": jnp.zeros((L, max_len, batch, KV, hd), dtype),
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def llama_forward(
    params: Params,
    cfg: LlamaConfig,
    inputs_embeds: jax.Array,            # [B, T, D]
    attention_mask: jax.Array,           # [B, S] 1/0; S = T (no cache) or max_len
    position_ids: jax.Array,             # [B, T]
    cache: Optional[dict] = None,
    cache_index: Optional[jax.Array] = None,  # int32 write offset: scalar, or
                                              # [B] per-row (serving slot pools)
    key_position_ids: Optional[jax.Array] = None,  # [B, S] logical pos per cache slot
    lora: Optional[dict] = None,              # stacked {target: {a, b}} adapters
    lora_scaling: float = 0.0,
    lora_dropout: float = 0.0,
    adapter_ids: Optional[jax.Array] = None,  # [B] int32: per-row adapter pick
                                              # when lora is MULTI-stacked
                                              # ({a: [L, K, D, r]}, see
                                              # lora.stack_adapter_sets)
    dropout_rng: Optional[jax.Array] = None,
    use_flash: Optional[bool] = None,         # None = auto (TPU only)
    stale_cache: bool = False,
    prefill_pad_len: Optional[int] = None,    # cache-building prefill (see below)
    remat: bool = False,                      # checkpoint each scan layer
    kv_quant: Optional[str] = None,           # "int8": quantized cache (see init_kv_cache)
    act_stats: bool = False,                  # collect per-channel activation absmax
):
    """Run the decoder stack; returns (final_hidden, new_cache).

    ``act_stats=True`` (calibration mode, cache-free forward only):
    additionally returns a third element — per-layer per-channel absmax of
    the four distinct linear inputs ``{"attn_in": [L, D], "attn_out":
    [L, H*hd], "mlp_in": [L, D], "mlp_down": [L, I]}`` — the statistics
    SmoothQuant calibration needs (ops/calibrate.py).  Padded positions are
    included (their activations are real embeddings of pad tokens; the max
    is dominated by valid tokens in practice).

    Without a cache the attention is causal over T with key-side padding
    masking.  With a cache, the T new tokens are written at ``cache_index``
    and attend over the full ``max_len`` buffer gated by ``attention_mask``;
    causality compares *logical* positions (``key_position_ids``) because
    with right-padded prompts a cache slot's buffer index differs from its
    token position.

    ``stale_cache`` (decode fast path, T must be 1): attention reads the
    cache WITHOUT the current position — ``attention_mask`` must NOT yet
    include it; the current token's k/v are folded into attention out-of-band
    (``sdpa_decode_stale``).  The cache is carried THROUGH the layer scan and
    each layer writes its fresh k/v with one tiny ``dynamic_update_slice`` at
    ``cache_index``; the returned ``{"k", "v"}`` is the updated full cache.
    Carrying + per-layer DUS (vs returning stacked ``k_new`` for an outer
    full-cache DUS) is what lets XLA update the multi-GB cache in place: with
    the outer-DUS form the cache was both an inner-scan operand and an
    outer-body write target, and XLA double-buffered it (two cache-sized HLO
    temps — the batch-20 decode OOM on a 16 GB chip).

    ``prefill_pad_len`` (prefill fast path, requires ``cache is None``):
    attention runs the plain causal-over-T path, and each layer additionally
    emits its k/v zero-padded to ``prefill_pad_len`` slots, so the scan's
    stacked ys ARE the full-length KV cache ``{"k", "v"}: [L, P, B, KV, hd]``.
    This builds the cache in ONE buffer — the previous scheme threaded a
    zero-initialized full-length cache through the scan as xs and stacked an
    updated copy as ys, holding TWO full cache-sized buffers (5.5 GB at 7B
    batch 8) at prefill peak, which was the batch-8 OOM.
    """
    B, T, D = inputs_embeds.shape
    H, KV, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    n_rep = H // KV
    compute_dtype = inputs_embeds.dtype
    if stale_cache:
        # T == 1 is the classic decode step; T > 1 is a speculative
        # verification window (cur_tok + T-1 draft tokens, intra-window
        # causal — see generate_decode_spec): same stale-read contract,
        # W fresh k/v folded out-of-band and written as one W-slot slab
        assert cache is not None, "stale_cache needs a cache"
    # per-row cache write positions (continuous-batching slot pools: each
    # row is an independent request mid-decode) use a batched scatter in
    # place of the contiguous-slab dynamic_update_slice; out-of-bounds rows
    # (exhausted slots) are DROPPED by the scatter, never clamped into a
    # live slot's cache
    per_row_idx = (cache_index is not None
                   and getattr(cache_index, "ndim", 0) == 1)
    if per_row_idx:
        assert stale_cache, "per-row cache_index requires the stale_cache path"
    # an existing quantized cache implies kv_quant (the dict carries scale
    # planes); a fresh prefill opts in via the kv_quant argument
    kv_q8 = kv_quant == "int8" or (cache is not None and "k_s" in cache)
    if use_flash is None:
        # Auto: the Pallas flash kernel is default-ON on TPU for prefill
        # when T is tile-aligned (+4.5% on the Q-LoRA train step at T=1024,
        # 6989 vs 6690 tok/s, identical loss) or long enough to amortize the
        # pad-to-128 copies: with the kernel's causal block-skip the padded
        # 641-token LLaVA prefill measures 11.14 vs 10.29 img/s e2e (+8.2%,
        # int8 7B batch 14).  Short unaligned prefills (topic-classifier
        # buckets) stay on XLA sdpa where the pad is relatively expensive.
        # CULLAVO_FLASH=1 forces it on, =0 forces it off.
        import os

        env = os.environ.get("CULLAVO_FLASH", "")
        use_flash = (jax.default_backend() == "tpu" and cache is None
                     and hd % 128 == 0 and cfg.sliding_window is None
                     and (env == "1" or (env != "0"
                                         and (T % 128 == 0 or T >= 384))))
    # packed-heads prefill (OPT-IN, measured e2e LOSER): heads stay lane
    # slices end-to-end (q/k/v projections → rope → flash → o-projection)
    # so the four per-layer [B,T,H,hd]↔[B,H,T,hd] transposes around the
    # attention custom call disappear — but the in-kernel 128-lane slices
    # of the [T, G·d] blocks cost more than the transposes they remove:
    # 15.00 vs 16.10 img/s (int8 7B batch 14, same-day A/B).  Kept as
    # CULLAVO_FLASH_PACKED=1 for re-testing on other topologies; MHA only
    # (GQA would need a lane-tiling repeat).
    use_packed = (use_flash and cache is None and hd % 128 == 0
                  and H == KV
                  and __import__("os").environ.get(
                      "CULLAVO_FLASH_PACKED", "0") == "1")

    cos, sin = rope_cos_sin(position_ids, hd, cfg.rope_theta)

    # additive bias [B, 1, T, S]
    if cache is None:
        key_pos = jnp.arange(T)[None, :]                       # [1, S]
    elif key_position_ids is not None:
        key_pos = key_position_ids                             # [B, S]
    else:
        key_pos = jnp.arange(cache["k"].shape[1])[None, :]
    if key_pos.ndim == 1:
        key_pos = key_pos[None, :]
    causal = position_ids[:, :, None] >= key_pos[:, None, :]   # [B, T, S]
    valid = attention_mask[:, None, :].astype(bool)            # [B, 1, S]
    ok = causal & valid
    if cfg.sliding_window is not None:
        # Mistral local attention: each query sees only the last W keys
        # (HF convention: key position > query position - W)
        ok = ok & (key_pos[:, None, :]
                   > position_ids[:, :, None] - cfg.sliding_window)
    bias = jnp.where(ok[:, None, :, :], 0.0, NEG_INF).astype(jnp.float32)

    # multi-stacked adapters: one [B, K] selection matrix shared by every
    # layer (adapter stacks are [L, K, ...] — the scan slices off L)
    adapter_onehot = None
    if lora:
        K_multi = next((t["a"].shape[1] for t in lora.values()
                        if isinstance(t, dict) and t.get("a") is not None
                        and t["a"].ndim == 4), None)
        if K_multi is not None:
            if adapter_ids is None:
                raise ValueError("multi-stacked lora adapters need "
                                 "adapter_ids ([B] int32 per-row picks)")
            adapter_onehot = jax.nn.one_hot(adapter_ids, K_multi,
                                            dtype=jnp.float32)

    def mm(x, w, ad, rng, dims=None):
        """x @ w with optional LoRA update (adapter ``ad`` may be None).
        ``w`` may be an NF4-quantized dict (cullavo_tpu.ops.nf4.quantize_linear)
        — the 4-bit Q-LoRA inference/training path (load_cullavo.py:65-83)."""
        if nf4_ops.is_quantized_planar(w):
            import os

            if jax.default_backend() == "tpu" and os.environ.get(
                    "CULLAVO_NF4_PALLAS", "1") == "1":
                # default on TPU: fused kernel for small M (weights stay
                # 4-bit in HBM), decode-once + XLA matmul for prefill M —
                # measured 3.98 img/s at 7B vs 1.22 for fused-everywhere
                # and the XLA graph crashes the AOT helper at 7B.
                # CULLAVO_NF4_PALLAS=0 opts out.
                y = nf4_ops.nf4_linear_planar_vjp(x, w, *dims)
            else:
                # XLA dequant path: weights stay 4-bit in HBM; the dequant is
                # plain shifts + a 16-entry gather that XLA fuses into the
                # matmul's weight feed
                y = x @ nf4_ops.dequant_linear_planar(w, *dims, dtype=x.dtype)
        elif nf4_ops.is_quantized(w):
            # byte-packed (non-planar) NF4 ALWAYS takes the XLA dequant:
            # the fused kernel's uint8 shift/mask ops and lane-interleaving
            # reshape are exactly what the Mosaic TPU compiler rejects
            # (nf4.py planar-layout rationale) — only planar dicts have a
            # TPU-compilable fused path
            y = nf4_ops.nf4_linear(x, w, *dims)
        elif nf4_ops.is_quantized_int8(w):
            import os

            mode = os.environ.get("CULLAVO_INT8_PALLAS", "0")
            if "q8" not in w:
                # the fused/auto kernels read q['q8']; the transposed
                # layout ('q8t') only has the XLA stream
                mode = "0"
            if jax.default_backend() == "tpu" and mode == "1":
                # fused everywhere: measured SLOWER end-to-end (5.0 vs 6.1
                # img/s) because prefill-M tiles re-read the weight; kept for
                # kernel benchmarking
                y = nf4_ops.int8_linear_fused_vjp(x, w)
            elif jax.default_backend() == "tpu" and mode == "auto":
                # phase-aware: fused Pallas at decode M, XLA at prefill M.
                # Also measured slower (42.6 vs 25.6 ms/token decode,
                # scripts/decode_probe.py) — XLA's convert-in-dot stream
                # beats the Pallas kernel at M=8; kept for tile tuning.
                y = nf4_ops.int8_linear_auto_vjp(x, w)
            else:
                # default policy: LLM.int8-style native s8s8 MXU dot at
                # prefill M for calibration-carrying dicts (SmoothQuant
                # sq_inv / static outlier o_w — measured 13.73 vs 11.14
                # img/s at 7B), exact bf16 convert-in-dot otherwise and at
                # decode M (memory-bound); CULLAVO_INT8_S8S8 overrides
                y = nf4_ops.int8_linear_policy(x, w)
        else:
            y = x @ w
        return _adapter(y, x, ad, rng)

    def _adapter(y, x, ad, rng):
        if ad is None:
            return y
        xa = x
        if dropout_rng is not None and lora_dropout > 0.0:
            keep = jax.random.bernoulli(rng, 1.0 - lora_dropout, x.shape)
            xa = jnp.where(keep, x / (1.0 - lora_dropout), jnp.zeros_like(x))
        a, b = ad["a"], ad["b"]
        if a.ndim == 3:
            # MULTI-stacked adapters ([K, D, r] per layer): each batch row
            # applies its own adapter via one-hot weight selection — the
            # selected [B, D, r]/[B, r, N] operands stream K x the (tiny)
            # adapter bytes, never K x the update compute (S-LoRA-style
            # serving, per-request adapter_ids)
            if "mask" in ad:
                raise NotImplementedError(
                    "multi-stacked adapters with per-layer masks (vision "
                    "tower style) are not supported — serve vision adapters "
                    "as a shared single stack")
            oh = adapter_onehot
            a_sel = jnp.einsum("bk,kdr->bdr", oh.astype(a.dtype), a)
            b_sel = jnp.einsum("bk,krn->brn", oh.astype(b.dtype), b)
            u = jax.ad_checkpoint.checkpoint_name(
                jnp.einsum("btd,bdr->btr", xa, a_sel), "lora_u")
            update = jnp.einsum("btr,brn->btn", u, b_sel)
            return y + lora_scaling * update.astype(y.dtype)
        # name the low-rank intermediate so the remat policy can SAVE it:
        # u is tiny ([M, r] bf16, ~176 MB across all targets x 32 layers at
        # B=6 T=1024) but recomputing it re-streams the 50-135 MB activation
        # per target per layer — measured 161 ms of remat time per 7B step
        u = jax.ad_checkpoint.checkpoint_name(xa @ a, "lora_u")
        return y + lora_scaling * (u @ b).astype(y.dtype)

    def mm_group(x, w, ad, names, rngs, dims_of):
        """q/k/v (or gate/up) share one activation-quantization pass when
        every member is a SmoothQuant-calibrated int8 dict and M is
        prefill-sized (nf4.int8_linear_s8s8_group) — the quant chain was
        ~30% of s8s8 prefill device time and XLA cannot CSE it across
        members because each dict's sq_inv is a distinct buffer."""
        ws = [w[n] for n in names]
        if nf4_ops.s8s8_group_enabled(ws, x):
            ys = nf4_ops.int8_linear_s8s8_group(x, tuple(ws))
            return [_adapter(y, x, ad.get(n), rng)
                    for n, y, rng in zip(names, ys, rngs)]
        return [mm(x, w[n], ad.get(n), rng, dims_of[n])
                for n, rng in zip(names, rngs)]

    def layer(carry, scanned):
        if stale_cache and kv_q8:
            h, kc, vc, ksc, vsc = carry
        elif stale_cache:
            h, kc, vc = carry
        else:
            h = carry
        w = scanned["w"]
        ad = scanned.get("lora") or {}
        rngs = scanned.get("rng")
        get_rng = (lambda i: jax.random.fold_in(rngs, i)) if rngs is not None else (lambda i: None)
        residual = h
        x = rms_norm(h, w["input_ln"], cfg.rms_norm_eps)
        amax_c = (lambda v: jnp.max(jnp.abs(v.astype(jnp.float32))
                                    .reshape(-1, v.shape[-1]), axis=0))
        st = {"attn_in": amax_c(x)} if act_stats else None
        yq, yk, yv = mm_group(x, w, ad, ("q", "k", "v"),
                              (get_rng(0), get_rng(1), get_rng(2)),
                              {"q": (D, H * hd), "k": (D, KV * hd),
                               "v": (D, KV * hd)})
        if use_packed:
            # packed-heads prefill: reshapes are free views, heads become
            # lane slices inside the flash kernel — no layout transposes
            q4 = apply_rope_bthd(yq.reshape(B, T, H, hd), cos, sin)
            k4 = apply_rope_bthd(yk.reshape(B, T, KV, hd), cos, sin)
            v4 = yv.reshape(B, T, KV, hd)
            k_smajor = lambda: k4.transpose(1, 0, 2, 3)      # [T, B, KV, hd]
            v_smajor = lambda: v4.transpose(1, 0, 2, 3)
        else:
            q = yq.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
            k = yk.reshape(B, T, KV, hd).transpose(0, 2, 1, 3)
            v = yv.reshape(B, T, KV, hd).transpose(0, 2, 1, 3)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            k_smajor = lambda: k.transpose(2, 0, 1, 3)       # [T, B, KV, hd]
            v_smajor = lambda: v.transpose(2, 0, 1, 3)

        ys = None
        if cache is None:
            if prefill_pad_len is not None:
                # cache-building prefill: pad this layer's k/v to the full
                # cache length (S-major slot order, see sdpa_smajor); the
                # scan stacks them into the cache directly
                if kv_q8:
                    kq, ks = quantize_kv(k_smajor())
                    vq, vs = quantize_kv(v_smajor())
                    zq = jnp.zeros((prefill_pad_len, B, KV, hd), jnp.int8)
                    zs = jnp.zeros((prefill_pad_len, B, KV), jnp.bfloat16)
                    ys = {"k_cache": jax.lax.dynamic_update_slice(zq, kq, (0,) * 4),
                          "v_cache": jax.lax.dynamic_update_slice(zq, vq, (0,) * 4),
                          "k_scale": jax.lax.dynamic_update_slice(zs, ks, (0,) * 3),
                          "v_scale": jax.lax.dynamic_update_slice(zs, vs, (0,) * 3)}
                else:
                    zeros = jnp.zeros((prefill_pad_len, B, KV, hd), compute_dtype)
                    ys = {"k_cache": jax.lax.dynamic_update_slice(
                              zeros, k_smajor().astype(compute_dtype),
                              (0, 0, 0, 0)),
                          "v_cache": jax.lax.dynamic_update_slice(
                              zeros, v_smajor().astype(compute_dtype),
                              (0, 0, 0, 0))}
            if use_packed:
                from cullavo_tpu.ops.flash_attention import flash_attention_packed

                # same right-padded bias-free causal contract as the
                # standard flash branch below
                attn = flash_attention_packed(
                    q4.reshape(B, T, H * hd), k4.reshape(B, T, KV * hd),
                    v4.reshape(B, T, KV * hd), H)
            elif use_flash:
                from cullavo_tpu.ops.flash_attention import flash_attention

                # q_positions=None → global iota, exact for right-padded
                # batches (valid tokens are a prefix, so logical position ==
                # row index; pad-row outputs are masked downstream) and it
                # selects the iota kernel, the one the axon Mosaic helper
                # compiles (no dynamic-sublane reads).  kv_valid=None under
                # the same right-padding contract: causality already hides
                # every padded key from every valid query, so the kernel
                # runs bias-free (saves a [bq, bk] add + bias read per
                # block).  Falls through to the shared o-proj/MLP tail
                # below (one copy to keep in sync).
                attn = flash_attention(q, repeat_kv(k, n_rep), repeat_kv(v, n_rep),
                                       q_positions=None,
                                       kv_valid=None, causal=True)
            else:
                attn = sdpa(q, repeat_kv(k, n_rep), repeat_kv(v, n_rep), bias)
        elif stale_cache and kv_q8:
            li = scanned["li"]
            kq, ks = quantize_kv(k.transpose(2, 0, 1, 3))   # [T, B, KV, hd]
            vq, vs = quantize_kv(v.transpose(2, 0, 1, 3))
            if _wwin_ok(T, kc.shape[1], hd):
                # fused W-window flash decode over the FULL stacked cache —
                # no per-layer slice copy, probabilities stay in VMEM
                from cullavo_tpu.ops.wwin_decode import wwin_decode_smajor_q8

                attn = wwin_decode_smajor_q8(
                    q, kc, ksc, vc, vsc, li,
                    repeat_kv(k, n_rep), repeat_kv(v, n_rep), bias,
                    n_rep=n_rep, win_q8=(kq, ks, vq, vs),
                    block_s=_wwin_block(kc.shape[1]))
            else:
                k_buf = jax.lax.dynamic_index_in_dim(kc, li, 0, keepdims=False)
                v_buf = jax.lax.dynamic_index_in_dim(vc, li, 0, keepdims=False)
                ks_buf = jax.lax.dynamic_index_in_dim(ksc, li, 0, keepdims=False)
                vs_buf = jax.lax.dynamic_index_in_dim(vsc, li, 0, keepdims=False)
                attn = sdpa_decode_stale_smajor_q8(
                    q, k_buf, ks_buf, v_buf, vs_buf,
                    repeat_kv(k, n_rep), repeat_kv(v, n_rep), bias, n_rep=n_rep,
                    win_q8=(kq, ks, vq, vs) if T > 1 else None)
            if per_row_idx and T == 1:
                # the production T=1 serving write — keep this EXACT index
                # pattern: both the T-unrolled 1-D form and the [B, T] 2-D
                # form measured ~35% slower engine throughput when applied
                # at T=1 (5.6 vs 8.5 req/s, 12-slot bf16 pool)
                rows = jnp.arange(B)[:, None]
                pos = cache_index[:, None]
                kc = kc.at[li, pos, rows].set(kq.transpose(1, 0, 2, 3), mode="drop")
                vc = vc.at[li, pos, rows].set(vq.transpose(1, 0, 2, 3), mode="drop")
                ksc = ksc.at[li, pos, rows].set(ks.transpose(1, 0, 2), mode="drop")
                vsc = vsc.at[li, pos, rows].set(vs.transpose(1, 0, 2), mode="drop")
            elif per_row_idx:
                # speculative W-slot windows: T static per-row scatters
                rows1 = jnp.arange(B)
                for j in range(T):
                    kc = kc.at[li, cache_index + j, rows1].set(kq[j], mode="drop")
                    vc = vc.at[li, cache_index + j, rows1].set(vq[j], mode="drop")
                    ksc = ksc.at[li, cache_index + j, rows1].set(ks[j], mode="drop")
                    vsc = vsc.at[li, cache_index + j, rows1].set(vs[j], mode="drop")
            else:
                kc = jax.lax.dynamic_update_slice(kc, kq[None], (li, cache_index, 0, 0, 0))
                vc = jax.lax.dynamic_update_slice(vc, vq[None], (li, cache_index, 0, 0, 0))
                ksc = jax.lax.dynamic_update_slice(ksc, ks[None], (li, cache_index, 0, 0))
                vsc = jax.lax.dynamic_update_slice(vsc, vs[None], (li, cache_index, 0, 0))
        elif stale_cache:
            li = scanned["li"]
            if _wwin_ok(T, kc.shape[1], hd):
                from cullavo_tpu.ops.wwin_decode import wwin_decode_smajor

                attn = wwin_decode_smajor(
                    q, kc, vc, li, repeat_kv(k, n_rep), repeat_kv(v, n_rep),
                    bias, n_rep=n_rep, block_s=_wwin_block(kc.shape[1]))
            else:
                k_buf = jax.lax.dynamic_index_in_dim(kc, li, 0, keepdims=False)
                v_buf = jax.lax.dynamic_index_in_dim(vc, li, 0, keepdims=False)
                attn = sdpa_decode_stale_smajor(
                    q, k_buf.astype(compute_dtype), v_buf.astype(compute_dtype),
                    repeat_kv(k, n_rep), repeat_kv(v, n_rep), bias, n_rep=n_rep)
            if per_row_idx and T == 1:
                # production T=1 pattern — see the kv_q8 branch note
                rows = jnp.arange(B)[:, None]
                pos = cache_index[:, None]
                kc = kc.at[li, pos, rows].set(
                    k.astype(kc.dtype).transpose(0, 2, 1, 3), mode="drop")
                vc = vc.at[li, pos, rows].set(
                    v.astype(vc.dtype).transpose(0, 2, 1, 3), mode="drop")
            elif per_row_idx:
                # speculative W-slot windows: T static per-row scatters
                rows1 = jnp.arange(B)
                ks_major = k.astype(kc.dtype).transpose(2, 0, 1, 3)  # [T,B,KV,hd]
                vs_major = v.astype(vc.dtype).transpose(2, 0, 1, 3)
                for j in range(T):
                    kc = kc.at[li, cache_index + j, rows1].set(ks_major[j],
                                                               mode="drop")
                    vc = vc.at[li, cache_index + j, rows1].set(vs_major[j],
                                                               mode="drop")
            else:
                # S-major write: one contiguous [1, 1, B, KV, hd] slab per layer
                kc = jax.lax.dynamic_update_slice(
                    kc, k.astype(kc.dtype).transpose(2, 0, 1, 3)[None],
                    (li, cache_index, 0, 0, 0))
                vc = jax.lax.dynamic_update_slice(
                    vc, v.astype(vc.dtype).transpose(2, 0, 1, 3)[None],
                    (li, cache_index, 0, 0, 0))
        elif kv_q8:
            idx = cache_index
            kq, ks = quantize_kv(k.transpose(2, 0, 1, 3))   # [T, B, KV, hd]
            vq, vs = quantize_kv(v.transpose(2, 0, 1, 3))
            new_k = jax.lax.dynamic_update_slice(scanned["k_cache"], kq, (idx, 0, 0, 0))
            new_v = jax.lax.dynamic_update_slice(scanned["v_cache"], vq, (idx, 0, 0, 0))
            new_ks = jax.lax.dynamic_update_slice(scanned["k_scale"], ks, (idx, 0, 0))
            new_vs = jax.lax.dynamic_update_slice(scanned["v_scale"], vs, (idx, 0, 0))
            attn = sdpa_smajor_q8(q, new_k, new_ks, new_v, new_vs, bias, n_rep)
            ys = {"k_cache": new_k, "v_cache": new_v,
                  "k_scale": new_ks, "v_scale": new_vs}
        else:
            k_buf, v_buf = scanned["k_cache"], scanned["v_cache"]
            idx = cache_index
            new_k = jax.lax.dynamic_update_slice(
                k_buf, k.astype(k_buf.dtype).transpose(2, 0, 1, 3),
                (idx, 0, 0, 0))
            new_v = jax.lax.dynamic_update_slice(
                v_buf, v.astype(v_buf.dtype).transpose(2, 0, 1, 3),
                (idx, 0, 0, 0))
            attn = sdpa_smajor(q, new_k.astype(compute_dtype),
                               new_v.astype(compute_dtype), bias, n_rep)
            ys = {"k_cache": new_k, "v_cache": new_v}

        if not use_packed:
            attn = attn.transpose(0, 2, 1, 3).reshape(B, T, H * hd)
        h = residual + mm(attn, w["o"], ad.get("o"), get_rng(3), (H * hd, D))

        residual = h
        x = rms_norm(h, w["post_ln"], cfg.rms_norm_eps)
        y_gate, y_up = mm_group(x, w, ad, ("gate", "up"),
                                (get_rng(4), get_rng(5)),
                                {"gate": (D, cfg.intermediate_size),
                                 "up": (D, cfg.intermediate_size)})
        gate = jax.nn.silu(y_gate.astype(jnp.float32)).astype(compute_dtype)
        down_in = gate * y_up
        h = residual + mm(down_in, w["down"], ad.get("down"), get_rng(6),
                          (cfg.intermediate_size, D))
        if act_stats:
            st.update({"attn_out": amax_c(attn), "mlp_in": amax_c(x),
                       "mlp_down": amax_c(down_in)})
            ys = {**(ys or {}), "act_stats": st}
        if stale_cache:
            return ((h, kc, vc, ksc, vsc) if kv_q8 else (h, kc, vc)), ys
        return h, ys

    scanned_in = {"w": params["layers"]}
    if lora:
        scanned_in["lora"] = lora
    if dropout_rng is not None and lora_dropout > 0.0:
        # input_ln is always a dense [L, D] array, even when the matmul
        # weights are quantized dicts (Q-LoRA training on an NF4 base)
        L = params["layers"]["input_ln"].shape[0]
        scanned_in["rng"] = jax.random.split(dropout_rng, L)
    if cache is not None:
        if stale_cache:
            # cache travels as scan CARRY (per-layer dynamic-slice read +
            # tiny DUS write) — only the layer index goes through xs
            scanned_in["li"] = jnp.arange(cache["k"].shape[0])
        else:
            scanned_in.update({"k_cache": cache["k"], "v_cache": cache["v"]})
            if kv_q8:
                scanned_in.update({"k_scale": cache["k_s"],
                                   "v_scale": cache["v_s"]})

    # per-layer rematerialization: the scan saves only each layer's carry
    # ([B, T, D] per layer) and recomputes layer internals in the backward.
    # Checkpointing the WHOLE forward instead does nothing for peak memory —
    # the backward re-runs the full forward with every residual live (a 1.3B
    # Q-LoRA step compiled to a 70 GB HBM request that way).
    # save_only_these_names('lora_u'): everything rematerializes EXCEPT the
    # tiny [M, r] LoRA intermediates — their recompute re-reads the full
    # activation per adapter target (7 targets/layer) for ~0 saved memory
    layer_fn = (jax.checkpoint(
        layer,
        policy=jax.checkpoint_policies.save_only_these_names("lora_u"))
                if remat else layer)
    if stale_cache and kv_q8:
        init = (inputs_embeds, cache["k"], cache["v"], cache["k_s"], cache["v_s"])
    elif stale_cache:
        init = (inputs_embeds, cache["k"], cache["v"])
    else:
        init = inputs_embeds
    final, scanned_out = jax.lax.scan(layer_fn, init, scanned_in)
    new_cache = None
    if stale_cache and kv_q8:
        final, ck, cv, cks, cvs = final
        new_cache = {"k": ck, "v": cv, "k_s": cks, "v_s": cvs}
    elif stale_cache:
        final, ck, cv = final
        new_cache = {"k": ck, "v": cv}
    elif (cache is not None) or prefill_pad_len is not None:
        new_cache = {"k": scanned_out["k_cache"], "v": scanned_out["v_cache"]}
        if kv_q8:
            new_cache.update({"k_s": scanned_out["k_scale"],
                              "v_s": scanned_out["v_scale"]})
    final = rms_norm(final, params["norm"], cfg.rms_norm_eps)
    if act_stats:
        return final, new_cache, scanned_out["act_stats"]
    return final, new_cache


def lm_logits(params: Params, cfg: LlamaConfig, hidden: jax.Array) -> jax.Array:
    head = params["lm_head"] if "lm_head" in params else params["embed_tokens"].T
    return jnp.einsum("btd,dv->btv", hidden, head, preferred_element_type=jnp.float32)
