"""Fused W-window decode attention over the stacked S-major KV cache.

The speculative-verification forward attends W fresh tokens (current token +
drafts) against the full stale cache.  The XLA lowering of that step pays
~15 ms/forward over a T=1 step at 7B shapes — constant in W — because the
per-layer cache slice ``kc[li]`` feeds an MXU dot and therefore materializes
as a copy (a VPU reduction, the W=1 case, fuses the slice away), and the f32
``[B, H, W, S]`` probability tensor round-trips HBM between the two dots
(measured in scripts/wwin_probe.py: 49 ms W=4 vs 32 ms W=1 attention-only at
L=32 B=16 S=640; static unrolling does not recover it).

This kernel is the structural fix: pallas reads cache blocks DIRECTLY from
the full stacked ``[L, S, B, KV, hd]`` buffer in HBM (the layer index is a
scalar-prefetch block offset — no slice, no copy), keeps the probabilities
in VMEM, and accumulates flash-style (online softmax) over S blocks.  The
tiny intra-window self-attention part stays in XLA and is merged with the
kernel's (m, l, acc) partial softmax outside.

Cache-part kernel I/O (grid = (B, S/block_s), S blocks innermost):
  q     [B, KV, Wq, hd]   fresh queries, GQA groups folded into rows
  kc/vc [L, S, B, KV, hd] full stacked cache (bf16) — blocks (bs, 1, KV, hd)
                          are contiguous (KV*hd) slabs per slot: efficient DMA
  bias  [B, Wq, S]        additive key-validity bias (NEG_INF = invalid slot)
  out   acc [B, KV, Wq, hd] f32 (unnormalized), m/l [B, KV, Wq] f32

The int8 variant streams the int8 cache + per-(slot, batch, head) scale
planes and folds the scales around the dots, mirroring
``sdpa_smajor_q8``'s convert-in-dot semantics (llama.py).

Capability parity: replaces the XLA cache part of
``sdpa_decode_stale_smajor`` / ``..._q8`` (models/llava/llama.py) for W>1;
reference equivalent is flash-attention-2's decode path (the reference
model runs HF generate with flash_attention_2, cullavo/load_cullavo.py:72).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
_VALID_FLOOR = 0.5 * NEG_INF      # scores below this are masked slots


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _cache_kernel(li_ref, q_ref, k_ref, v_ref, bias_ref,
                  acc_out, m_out, l_out, m_sc, l_sc, acc_sc, *, scale, nsb):
    sb = pl.program_id(1)

    @pl.when(sb == 0)
    def _init():
        m_sc[...] = jnp.full_like(m_sc, NEG_INF)
        l_sc[...] = jnp.zeros_like(l_sc)
        acc_sc[...] = jnp.zeros_like(acc_sc)

    q = q_ref[0]                         # [KV, Wq, hd]
    # match the XLA path's cache.astype(compute_dtype) semantics (a bf16
    # cache under f32 compute — CPU tests; on-chip both are bf16, a no-op).
    # Mosaic rejects kv-batched dots unless both batch dims sit at position
    # 0 ("batch dims must be equal"), and transposing the cache block into
    # that form relayouts the whole stream through the VPU (measured 50 ms
    # vs the 48.8 ms XLA forward it should beat) — so contract per kv head
    # with 2-D dots on STATIC slices: q[i]·k[:, i]ᵀ is tpu.matmul's native
    # transpose_rhs form and the [bs, KV, hd] block is never relayouted.
    k = k_ref[0, :, 0].astype(q.dtype)   # [bs, KV, hd]
    v = v_ref[0, :, 0].astype(q.dtype)
    bias = bias_ref[0]                   # [Wq, bs]
    KV = q.shape[0]

    s = jnp.stack([
        jax.lax.dot_general(q[i], k[:, i], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        for i in range(KV)])                           # [KV, Wq, bs]
    s = s * scale + bias[None]

    m_prev = m_sc[...]
    m_cur = jnp.max(s, axis=-1)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    # all-masked blocks: s == m_new == NEG_INF would exp to 1 — gate them
    p = jnp.where(s > _VALID_FLOOR, jnp.exp(s - m_new[..., None]), 0.0)
    l_sc[...] = l_sc[...] * alpha + jnp.sum(p, axis=-1)
    p8 = p.astype(v.dtype)
    pv = jnp.stack([
        jax.lax.dot_general(p8[i], v[:, i], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        for i in range(KV)])                           # [KV, Wq, hd]
    acc_sc[...] = acc_sc[...] * alpha[..., None] + pv
    m_sc[...] = m_new

    @pl.when(sb == nsb - 1)
    def _flush():
        acc_out[0] = acc_sc[...]
        m_out[0] = m_sc[...]
        l_out[0] = l_sc[...]


def _cache_kernel_q8(li_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref, bias_ref,
                     acc_out, m_out, l_out, m_sc, l_sc, acc_sc, *, scale, nsb):
    sb = pl.program_id(1)

    @pl.when(sb == 0)
    def _init():
        m_sc[...] = jnp.full_like(m_sc, NEG_INF)
        l_sc[...] = jnp.zeros_like(l_sc)
        acc_sc[...] = jnp.zeros_like(acc_sc)

    q = q_ref[0]                                        # [KV, Wq, hd]
    # per-head 2-D dots on static slices — see _cache_kernel for why the
    # batched form can't be used on Mosaic without relayouting the stream
    k = kq_ref[0, :, 0].astype(q.dtype)                 # [bs, KV, hd]
    v = vq_ref[0, :, 0].astype(q.dtype)
    # scale planes arrive as FULL [bs, B, KV] tiles (a per-b block of the
    # [L, S, B, KV] plane would put a 1-sized block on the sublane-tiled B
    # axis — rejected by the TPU lowering — and an in-kernel ref[.., b, ..]
    # slice is a dynamic-sublane read, which crashes the axon helper).  The
    # tile is ~100 KB; select batch b with a one-hot multiply-reduce.
    b = pl.program_id(0)
    oh_b = (jax.lax.broadcasted_iota(jnp.int32, ks_ref.shape[2:4], 0)
            == b)[None, :, :]                           # [1, B, KV]
    k_s = jnp.swapaxes(jnp.sum(jnp.where(
        oh_b, ks_ref[0].astype(jnp.float32), 0.0), axis=1), 0, 1)  # [KV, bs]
    v_s = jnp.swapaxes(jnp.sum(jnp.where(
        oh_b, vs_ref[0].astype(jnp.float32), 0.0), axis=1), 0, 1)
    bias = bias_ref[0]                                  # [Wq, bs]
    KV = q.shape[0]

    s = jnp.stack([
        jax.lax.dot_general(q[i], k[:, i], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        for i in range(KV)])                            # [KV, Wq, bs]
    # fold the per-key scales outside the dot (scores = (q·k_int8)·k_s)
    s = s * (k_s[:, None, :] * scale) + bias[None]

    m_prev = m_sc[...]
    m_cur = jnp.max(s, axis=-1)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.where(s > _VALID_FLOOR, jnp.exp(s - m_new[..., None]), 0.0)
    l_sc[...] = l_sc[...] * alpha + jnp.sum(p, axis=-1)
    # fold the value scales into p (out = (p·v_s)·v_int8)
    p8 = (p * v_s[:, None, :]).astype(v.dtype)
    pv = jnp.stack([
        jax.lax.dot_general(p8[i], v[:, i], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        for i in range(KV)])                            # [KV, Wq, hd]
    acc_sc[...] = acc_sc[...] * alpha[..., None] + pv
    m_sc[...] = m_new

    @pl.when(sb == nsb - 1)
    def _flush():
        acc_out[0] = acc_sc[...]
        m_out[0] = m_sc[...]
        l_out[0] = l_sc[...]


def _run_cache_part(li, q, bias, cache_operands, kernel, block_s):
    """Shared pallas_call wiring for the bf16/int8 cache-part kernels.

    q [B, KV, Wq, hd]; bias [B, Wq, S]; cache operands are the full stacked
    buffers; returns (acc [B, KV, Wq, hd] f32, m, l [B, KV, Wq] f32)."""
    B, KV, Wq, hd = q.shape
    S = cache_operands[0].shape[1]
    assert S % block_s == 0 and bias.shape == (B, Wq, S)
    nsb = S // block_s

    def cache_spec(op):
        # [L, S, B, KV, hd] → block (1, bs, 1, KV, hd) at (li, sb, b); the
        # 4-D scale planes [L, S, B, KV] ship FULL (B, KV) tiles instead —
        # a 1-sized block on the sublane-tiled B axis is rejected by the
        # TPU lowering (the kernel one-hot-selects its batch row)
        nd = op.ndim
        if nd == 5:
            return pl.BlockSpec(
                (1, block_s, 1, KV, hd),
                lambda b, sb, li_ref: (li_ref[0], sb, b, 0, 0))
        return pl.BlockSpec(
            (1, block_s, op.shape[2], op.shape[3]),
            lambda b, sb, li_ref: (li_ref[0], sb, 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nsb),
        in_specs=[
            pl.BlockSpec((1, KV, Wq, hd), lambda b, sb, li_ref: (b, 0, 0, 0)),
            *[cache_spec(op) for op in cache_operands],
            pl.BlockSpec((1, Wq, block_s), lambda b, sb, li_ref: (b, 0, sb)),
        ],
        out_specs=[
            pl.BlockSpec((1, KV, Wq, hd), lambda b, sb, li_ref: (b, 0, 0, 0)),
            pl.BlockSpec((1, KV, Wq), lambda b, sb, li_ref: (b, 0, 0)),
            pl.BlockSpec((1, KV, Wq), lambda b, sb, li_ref: (b, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((KV, Wq), jnp.float32),
            pltpu.VMEM((KV, Wq), jnp.float32),
            pltpu.VMEM((KV, Wq, hd), jnp.float32),
        ],
    )
    # cache blocks squeeze the layer axis inside the kernel refs
    acc, m, l = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, KV, Wq, hd), jnp.float32),
            jax.ShapeDtypeStruct((B, KV, Wq), jnp.float32),
            jax.ShapeDtypeStruct((B, KV, Wq), jnp.float32),
        ],
        interpret=_interpret(),
    )(jnp.asarray(li, jnp.int32).reshape(1), q, *cache_operands, bias)
    return acc, m, l


def _fold_gqa(x, n_rep, Wq):
    """[B, H, W, hd] → [B, KV, Wq, hd] grouping the n_rep repeated heads of
    each kv head into extra query rows (repeat_kv groups h = kv*n_rep + r),
    zero-padding rows to Wq."""
    B, H, W, hd = x.shape
    KV = H // n_rep
    x = x.reshape(B, KV, n_rep * W, hd)
    if n_rep * W < Wq:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, Wq - n_rep * W), (0, 0)))
    return x


def _unfold_gqa(x, n_rep, W):
    """[B, KV, Wq, ...] → [B, H, W, ...] (inverse of _fold_gqa)."""
    B, KV = x.shape[:2]
    x = x[:, :, :n_rep * W]
    return x.reshape(B, KV * n_rep, W, *x.shape[3:])


def _merge_self_window(q, k_cur, v_cur, acc, m, l, scale, win_q8=None,
                       n_rep=1):
    """Merge the kernel's cache-part partial softmax with the intra-window
    self-attention (tiny, stays in XLA).  Token-exact mirror of the tail of
    ``sdpa_decode_stale_smajor(_q8)`` (llama.py) including the win_q8
    semantics: off-diagonal draft keys/values go through the SAME
    int8-as-bf16 dot + f32 folded-scale path the sequential stream would
    use when reading them back from the cache, the diagonal stays full
    precision."""
    from cullavo_tpu.models.llava.llama import _fold_scale, _window_scores

    W = q.shape[2]
    if win_q8 is not None and W > 1:
        k_wq, k_ws, v_wq, v_ws = win_q8
        if n_rep != 1:
            k_wq, v_wq = jnp.repeat(k_wq, n_rep, 2), jnp.repeat(v_wq, n_rep, 2)
            k_ws, v_ws = jnp.repeat(k_ws, n_rep, 2), jnp.repeat(v_ws, n_rep, 2)
        s_w = jnp.einsum("bhqd,wbhd->bhqw", q, k_wq.astype(q.dtype),
                         preferred_element_type=jnp.float32)
        s_w = s_w * (_fold_scale(k_ws) * scale)              # [B, H, W, W]
        diag = jnp.sum(q.astype(jnp.float32) * k_cur.astype(jnp.float32),
                       axis=-1) * scale                      # [B, H, W]
        i = jnp.arange(W)
        eye = (i[:, None] == i[None, :])[None, None]
        lower = (i[:, None] > i[None, :])[None, None]
        s_self = jnp.where(eye, diag[..., :, None],
                           jnp.where(lower, s_w, NEG_INF))
    else:
        s_self = _window_scores(q, k_cur, scale)             # [B, H, W, W]
    m_tot = jnp.maximum(m[..., None], jnp.max(s_self, axis=-1, keepdims=True))
    e_s = jnp.exp(s_self - m_tot)
    corr = jnp.exp(m[..., None] - m_tot)
    denom = l[..., None] * corr + jnp.sum(e_s, axis=-1, keepdims=True)
    out = acc * corr
    if win_q8 is not None and W > 1:
        p_self = e_s / denom
        p_off = jnp.where(eye, 0.0, p_self) * _fold_scale(v_ws)
        out = out / denom + jnp.einsum(
            "bhqw,wbhd->bhqd", p_off.astype(q.dtype), v_wq.astype(q.dtype),
            preferred_element_type=jnp.float32)
        p_diag = jnp.sum(jnp.where(eye, p_self, 0.0), axis=-1)
        out = out + p_diag[..., None] * v_cur.astype(jnp.float32)
        return out.astype(q.dtype)
    out = out + jnp.einsum("bhqk,bhkd->bhqd", e_s,
                           v_cur.astype(jnp.float32),
                           preferred_element_type=jnp.float32)
    return (out / denom).astype(q.dtype)


def wwin_decode_smajor(q, kc, vc, li, k_cur, v_cur, bias, n_rep=1,
                       scale=None, block_s=128):
    """Drop-in W-window replacement for ``sdpa_decode_stale_smajor`` reading
    the FULL stacked bf16 cache (no per-layer slice copy).

    q/k_cur/v_cur: [B, H, W, hd]; kc/vc: [L, S, B, KV, hd]; li: scalar layer
    index; bias: [B|1, 1, W, S] additive key-validity.  S must be a multiple
    of ``block_s``."""
    B, H, W, hd = q.shape
    scale = hd ** -0.5 if scale is None else scale
    S = kc.shape[1]
    Wq = max(8, -(-(n_rep * W) // 8) * 8)
    qf = _fold_gqa(q, n_rep, Wq)
    bias_rows = jnp.broadcast_to(bias, (B, 1, W, S))[:, 0]
    bias_rows = jnp.broadcast_to(bias_rows[:, None], (B, n_rep, W, S))
    bias_rows = bias_rows.reshape(B, n_rep * W, S)
    if n_rep * W < Wq:
        bias_rows = jnp.pad(bias_rows, ((0, 0), (0, Wq - n_rep * W), (0, 0)))
    acc, m, l = _run_cache_part(
        li, qf, bias_rows, (kc, vc),
        functools.partial(_cache_kernel, scale=scale, nsb=S // block_s),
        block_s)
    acc = _unfold_gqa(acc, n_rep, W)
    m = _unfold_gqa(m, n_rep, W)
    l = _unfold_gqa(l, n_rep, W)
    k_cur_r = k_cur if k_cur.shape[1] == H else jnp.repeat(k_cur, n_rep, axis=1)
    v_cur_r = v_cur if v_cur.shape[1] == H else jnp.repeat(v_cur, n_rep, axis=1)
    return _merge_self_window(q, k_cur_r, v_cur_r, acc, m, l, scale)


def wwin_decode_smajor_q8(q, kc, ksc, vc, vsc, li, k_cur, v_cur, bias,
                          n_rep=1, scale=None, block_s=128, win_q8=None):
    """int8-cache W-window replacement for ``sdpa_decode_stale_smajor_q8``.

    kc/vc: int8 [L, S, B, KV, hd]; ksc/vsc: bf16 [L, S, B, KV] per-vector
    scales.  ``win_q8``: optional (kq, ks, vq, vs) fake-quantized intra-
    window tensors ([T, B, KV, hd] / [T, B, KV]) with the exact semantics of
    the XLA path."""
    B, H, W, hd = q.shape
    scale = hd ** -0.5 if scale is None else scale
    S = kc.shape[1]
    Wq = max(8, -(-(n_rep * W) // 8) * 8)
    qf = _fold_gqa(q, n_rep, Wq)
    bias_rows = jnp.broadcast_to(bias, (B, 1, W, S))[:, 0]
    bias_rows = jnp.broadcast_to(bias_rows[:, None], (B, n_rep, W, S))
    bias_rows = bias_rows.reshape(B, n_rep * W, S)
    if n_rep * W < Wq:
        bias_rows = jnp.pad(bias_rows, ((0, 0), (0, Wq - n_rep * W), (0, 0)))
    acc, m, l = _run_cache_part(
        li, qf, bias_rows, (kc, ksc, vc, vsc),
        functools.partial(_cache_kernel_q8, scale=scale, nsb=S // block_s),
        block_s)
    acc = _unfold_gqa(acc, n_rep, W)
    m = _unfold_gqa(m, n_rep, W)
    l = _unfold_gqa(l, n_rep, W)
    k_cur_r = k_cur if k_cur.shape[1] == H else jnp.repeat(k_cur, n_rep, axis=1)
    v_cur_r = v_cur if v_cur.shape[1] == H else jnp.repeat(v_cur, n_rep, axis=1)
    return _merge_self_window(q, k_cur_r, v_cur_r, acc, m, l, scale,
                              win_q8=win_q8, n_rep=n_rep)
