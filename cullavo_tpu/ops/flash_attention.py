"""Pallas TPU flash attention.

Replaces the reference's external flash-attn-2 dependency
(cullavo/load_cullavo.py:72, ``attn_implementation="flash_attention_2"``) with
TPU-native kernels:

  * ``flash_attention`` — fused causal/padded attention for training
    (online-softmax tiling, O(T) memory), with a custom VJP that
    recomputes attention probabilities blockwise in the backward pass.
  * ``flash_decode``   — single-token decode over an HBM-resident KV cache
    (used by the generation loop).

Design follows the standard flash algorithm mapped to TPU tiling rules
(/opt/skills/guides/pallas_guide.md): block sizes aligned to (≥8, 128),
fp32 softmax statistics in VMEM scratch, MXU matmuls with
``preferred_element_type=float32``.  A naive XLA reference implementation
(``mha_reference``) ships alongside for parity tests — the test pattern the
reference uses for its one native op (ops/test.py:35-48).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30


def mha_reference(q, k, v, bias=None, causal=True, positions=None, kv_valid=None):
    """Naive attention; q,k,v: [B, H, T, d].  Functional spec for the kernels."""
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    T, S = q.shape[2], k.shape[2]
    if causal:
        qpos = positions if positions is not None else jnp.arange(T)[None, :]
        kpos = jnp.arange(S)[None, :]
        mask = qpos[:, :, None] >= kpos[:, None, :]
        scores = jnp.where(mask[:, None], scores, NEG_INF)
    if kv_valid is not None:
        scores = jnp.where(kv_valid[:, None, None, :].astype(bool), scores, NEG_INF)
    if bias is not None:
        scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def flash_attention(q, k, v, q_positions=None, kv_valid=None, causal=True,
                    block_q=None, block_k=None):
    """Fused attention: q,k,v [B, H, T/S, d] (kv heads already repeated).

    q_positions: [B, T] logical positions (for padded/packed inputs).
                 Pass None for right-padded batches — global iota positions
                 are then used, which is exact for every valid (prefix) row
                 and selects the axon-safe iota kernel.
    kv_valid:    [B, S] 0/1 key validity.

    T/S need not be tile-aligned: inputs are zero-padded (padded keys masked
    via kv_valid, padded query rows discarded on return), so odd prompt
    lengths like LLaVA's 641 can use the kernel.  The bias-free fast path
    (causal + iota positions + kv_valid=None) only needs SUBLANE (8)
    alignment — k/v/q block slices are second-minor-dim offsets — so 641
    pads to just 648; paths carrying the kv bias need 128 because the bias
    lane slice at ``kb * block_k`` must be statically 128-aligned for the
    axon Mosaic helper.
    """
    if block_q is None:
        block_q = int(os.environ.get("CULLAVO_FLASH_BQ", 384))
    if block_k is None:
        block_k = int(os.environ.get("CULLAVO_FLASH_BK", 384))
    B, H, T, d = q.shape
    S = k.shape[2]
    # bias-free fast path soundness needs S >= T: padded keys live at
    # positions >= S, and with global iota positions the max valid query
    # position is T-1 — only S >= T makes every padded key causally
    # invisible to every valid query.  T > S (cross-attention-like shapes)
    # must carry the kv-validity bias.
    biasfree = causal and q_positions is None and kv_valid is None and S >= T
    align = 8 if biasfree else 128
    pad_t = (-T) % align
    pad_s = (-S) % align
    if pad_t or pad_s:
        if kv_valid is None and not biasfree:
            kv_valid = jnp.ones((B, S), jnp.int32)
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_t), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_s), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_s), (0, 0)))
        if kv_valid is not None:
            kv_valid = jnp.pad(kv_valid, ((0, 0), (0, pad_s)))
        if q_positions is not None:
            # continue each row's position run so padded rows stay causal-legal
            tail = q_positions[:, -1:] + 1 + jnp.arange(pad_t, dtype=q_positions.dtype)[None]
            q_positions = jnp.concatenate([q_positions, tail], axis=1)
        out = _flash_custom(q, k, v, q_positions, kv_valid, causal,
                            block_q, block_k)
        return out[:, :, :T]
    return _flash_custom(q, k, v, q_positions, kv_valid, causal, block_q, block_k)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _flash_custom(q, k, v, q_positions, kv_valid, causal, block_q, block_k):
    # inference path: no lse output (only the VJP needs it)
    o, _, _, _ = _flash_fwd_expanded(q, k, v, q_positions, kv_valid, causal,
                                     block_q, block_k, need_lse=False)
    return o


def _flash_fwd_expanded(q, k, v, q_positions, kv_valid, causal, block_q,
                        block_k, need_lse=True):
    """Shared canonicalization for the primal and VJP-forward calls (one
    copy — drift here would silently diverge grad from the primal).
    Returns (o, lse-or-None, q_positions, kv_valid) materialized."""
    B, H, T, d = q.shape
    iota = q_positions is None
    # causal + iota positions + no explicit key mask + S >= T → every
    # padded key (right padding) is already causally invisible to every
    # valid query, so the kv bias is mathematically redundant: drop it from
    # the kernel entirely (saves a [bq, bk] add + bias read per block).
    # S < T would let queries at positions >= S see zero-padded keys, so
    # that case keeps the bias (flash_attention synthesizes kv_valid).
    no_bias = iota and causal and kv_valid is None and k.shape[2] >= T
    if q_positions is None:
        q_positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    if kv_valid is None:
        kv_valid = jnp.ones((B, k.shape[2]), jnp.int32)
    qp = jnp.repeat(q_positions.astype(jnp.int32), H, axis=0)   # [B*H, T]
    kv = jnp.repeat(kv_valid.astype(jnp.int32), H, axis=0)      # [B*H, S]
    o, lse = _flash_fwd_core(q, k, v, qp, kv, causal, block_q, block_k,
                             iota_positions=iota, need_lse=need_lse,
                             no_bias=no_bias)
    return o, lse, q_positions, kv_valid


def _fwd_kernel_rows(qpos_ref, kvalid_ref, q_ref, k_ref, v_ref, o_ref,
                     *maybe_lse, block_k: int, causal: bool, sm_scale: float):
    # NOTE: this rows-kernel variant reads qpos_ref[bh, ...] with a dynamic
    # sublane index — validated in interpret mode; the axon Mosaic helper
    # rejects dynamic-sublane reads, so explicit q_positions on that backend
    # are untested on chip (the production LLaVA path always takes the iota
    # kernel below).
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32) * sm_scale
    bq, d = q.shape
    S = k_ref.shape[1]
    num_kb = S // block_k

    acc = jnp.zeros((bq, d), jnp.float32)
    m_i = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l_i = jnp.zeros((bq, 1), jnp.float32)

    # qpos/kvalid arrive as FULL [B*H, T]/[B*H, S] arrays (per-row blocks of
    # height 1 violate the (8, 128) tiling rule on real TPUs)
    qp = qpos_ref[bh, pl.ds(qi * bq, bq)].reshape(bq, 1)

    def body(kb, carry):
        acc, m_i, l_i = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)
        kpos = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
        mask = kvalid_ref[bh, pl.ds(kb * block_k, block_k)].reshape(1, block_k) != 0
        mask = jnp.broadcast_to(mask, (bq, block_k))
        if causal:
            mask = mask & (qp >= kpos)
        s = jnp.where(mask, s, NEG_INF)
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p.astype(jnp.float32), v_blk.astype(jnp.float32),
                                    preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc, m_i, l_i = jax.lax.fori_loop(0, num_kb, body, (acc, m_i, l_i))
    l_safe = jnp.where(l_i == 0.0, 1.0, l_i)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
    if maybe_lse:
        # lse is lane-replicated to honor the (8, 128) output tiling rule;
        # the wrapper reads lane 0.  Only emitted under grad — on the
        # inference prefill path the fp32 [T, 128] write would cost ~2x the
        # bytes of the attention output itself.
        maybe_lse[0][0] = jnp.broadcast_to(m_i + jnp.log(l_safe), (bq, 128))


def _causal_kb_bounds(qi: int, bq: int, S: int, block_k: int, causal: bool):
    """Static key-block bounds for one query block: (n_unmasked, num_kb).
    Blocks [0, n_unmasked) lie strictly below the causal diagonal (no mask
    needed); [n_unmasked, num_kb) straddle it; [num_kb, S/block_k) are fully
    masked and skipped.  Both are clamped to S//block_k so T > S shapes
    never index key blocks past S (the unclamped form read k_ref/v_ref out
    of bounds once qi*bq exceeded S)."""
    total_kb = S // block_k
    if not causal:
        return total_kb, total_kb
    num_kb = min(total_kb, (qi * bq + bq + block_k - 1) // block_k)
    return min((qi * bq) // block_k, num_kb), num_kb


def _online_softmax_qblock(q, read_kv, qi_base: int, n_unmasked: int,
                           num_kb: int, block_k: int, causal: bool,
                           sm_scale: float, bias_read=None):
    """Online-softmax pass of ONE query block over its key blocks — the
    numerics-critical flash body shared by the standard and packed-heads
    kernels (one copy: a fix here reaches both).

    ``read_kv(kb) -> (k_blk, v_blk)`` delivers the kb-th key/value block in
    the INPUT dtype (MXU-native rate for bf16 models); scores accumulate in
    f32 and probabilities round to the input dtype for the PV dot —
    flash-attention-2's own numerics for half inputs, exact math for f32.
    ``bias_read(kb) -> [1, block_k]`` optional additive f32 bias (key
    validity).  Returns (acc, m_i, l_i)."""
    bq, d = q.shape
    acc = jnp.zeros((bq, d), jnp.float32)
    m_i = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l_i = jnp.zeros((bq, 1), jnp.float32)

    def body(kb, carry, masked=True):
        acc, m_i, l_i = carry
        k_blk, v_blk = read_kv(kb)
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * sm_scale
        if bias_read is not None:
            s = s + bias_read(kb)
        if causal and masked:
            qpos = qi_base + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), 0)
            kpos = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), 1)
            s = jnp.where(qpos >= kpos, s, NEG_INF)
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p.astype(v_blk.dtype), v_blk,
                                    preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    carry = (acc, m_i, l_i)
    # full blocks strictly below the causal diagonal need NO causal mask
    # (every key in them precedes every query row of this block); only
    # blocks overlapping the diagonal pay the iota/where
    carry = jax.lax.fori_loop(0, n_unmasked,
                              functools.partial(body, masked=False), carry)
    for kb in range(n_unmasked, num_kb):   # diagonal blocks, static unroll
        carry = body(kb, carry)
    return carry


def _fwd_kernel_iota(*refs, block_q: int, block_k: int, causal: bool,
                     sm_scale: float, has_bias: bool, group: int):
    """Fast path: query positions are the global query indices (standard
    right-padded batches).  With ``has_bias`` a key-validity bias arrives as
    an additive fp32 [group, 8, S] block; the bias-free mode (causal +
    right-padded contract) omits that operand entirely — causality already
    hides every padded key from every valid query.  The axon Mosaic helper
    rejects dynamic-sublane reads (``ref[bh, ...]``), so per-row data is
    delivered via per-program BlockSpecs with static in-kernel indices.
    ``group`` (batch·head) rows are processed per program with a static
    unroll — at 7B prefill shapes the per-(b·h) compute is ~1 µs of MXU
    work, so per-program fixed overhead dominates a group=1 launch."""
    if has_bias:
        kvbias_ref, q_ref, k_ref, v_ref, o_ref, *maybe_lse = refs
    else:
        kvbias_ref = None
        q_ref, k_ref, v_ref, o_ref, *maybe_lse = refs
    T = q_ref.shape[1]
    S = k_ref.shape[1]
    bq = min(block_q, T)
    d = q_ref.shape[2]

    # ONE program per (batch·head)/group, ALL query blocks handled by a
    # static python unroll: the two-axis grid form paid ~47 µs of fixed
    # program overhead × (B·H · T/bq) programs — 126 ms of a 1.0 s prefill
    # at 7B batch 14 (scripts/prefill_trace.py custom-call row) for ~3 ms
    # of roofline compute.  Unrolling also makes the causal kv-block bound
    # a python int per block (no dynamic fori_loop trip count).
    for gi in range(group):
        for qi in range(T // bq):
            # operands keep the INPUT dtype (bf16 in the model → MXU native
            # rate; the old .astype(f32) form ran the score dots in f32 MXU
            # mode, ~4 ms/layer at 7B prefill shapes); accumulation and the
            # softmax state are f32, probabilities round to the input dtype
            # for the PV dot — flash-attention-2's own numerics for half
            # inputs, and exactly the old full-precision math for f32 inputs
            q = q_ref[gi, pl.ds(qi * bq, bq), :]
            n_unmasked, num_kb = _causal_kb_bounds(qi, bq, S, block_k, causal)

            def read_kv(kb, gi=gi):
                return (k_ref[gi, pl.ds(kb * block_k, block_k), :],
                        v_ref[gi, pl.ds(kb * block_k, block_k), :])

            bias_read = None
            if has_bias:
                def bias_read(kb, gi=gi):
                    return kvbias_ref[gi, 0:1, pl.ds(kb * block_k, block_k)]

            acc, m_i, l_i = _online_softmax_qblock(
                q, read_kv, qi * bq, n_unmasked, num_kb, block_k, causal,
                sm_scale, bias_read=bias_read)
            l_safe = jnp.where(l_i == 0.0, 1.0, l_i)
            o_ref[gi, pl.ds(qi * bq, bq), :] = (acc / l_safe).astype(o_ref.dtype)
            if maybe_lse:
                maybe_lse[0][gi, pl.ds(qi * bq, bq), :] = jnp.broadcast_to(
                    m_i + jnp.log(l_safe), (bq, 128))


def _fit_block(pref: int, T: int, step: int = 128) -> int:
    """Largest ``step``-multiple ≤ ``pref`` dividing T (the wrapper pads T
    to a step-multiple).  Bigger blocks cut the online-softmax bookkeeping
    passes (m/l updates, acc rescales): 384 measured 15.61 vs 128's 14.30
    img/s on the 7B prefill (768-padded T, v5e).  step=8 on the bias-free
    path (block slices are sublane offsets — no 128-lane bias slice), so
    T=648 runs unpadded with 216-blocks.  The old halve-until-divides loop
    degenerated for non-power-of-2 ratios (e.g. pref 384 at T=1024 → 1)."""
    pref = min(pref, T)
    best = 0
    b = step
    while b <= pref:
        if T % b == 0:
            best = b
        b += step
    if best:
        return best
    # sub-step T (tests, tiny models): largest divisor of T within pref
    for b in range(pref, 0, -1):
        if T % b == 0:
            return b
    return T


def _flash_group(bh: int, T: int, S: int, d: int, need_lse: bool,
                 has_bias: bool) -> int:
    """(batch·head) rows per program for the iota kernel: the largest of
    8/4/2/1 that divides ``bh`` and fits the VMEM budget.  Buffer estimate ×
    the ~4× Mosaic scoped-stack factor measured for the focal kernel
    (ops/focal_pallas.py) against a conservative 12 MiB budget;
    CULLAVO_FLASH_GROUP overrides."""
    env = os.environ.get("CULLAVO_FLASH_GROUP")
    if env:
        g = int(env)
        if bh % g:
            raise ValueError(f"CULLAVO_FLASH_GROUP={g} does not divide B*H={bh}")
        return g
    per = (2 * T + 2 * S) * d * 2                  # q,o + k,v bf16
    if need_lse:
        per += T * 128 * 4
    if has_bias:
        per += 8 * S * 4
    budget = 12 * 1024 * 1024
    for g in (8, 4, 2):
        if bh % g == 0 and 4 * g * per <= budget:
            return g
    return 1


def _flash_fwd_core(q, k, v, qp_rows, kv_rows, causal, block_q, block_k,
                    iota_positions=False, need_lse=True, no_bias=False):
    B, H, T, d = q.shape
    S = k.shape[2]
    step = 8 if (iota_positions and no_bias) else 128
    block_q = _fit_block(block_q, T, step)
    block_k = _fit_block(block_k, S, step)
    sm_scale = d ** -0.5

    qf = q.reshape(B * H, T, d)
    kf = k.reshape(B * H, S, d)
    vf = v.reshape(B * H, S, d)

    out_specs = [pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0))]
    out_shape = [jax.ShapeDtypeStruct((B * H, T, d), q.dtype)]
    if need_lse:
        out_specs.append(pl.BlockSpec((1, block_q, 128),
                                      lambda bh, qi: (bh, qi, 0)))
        out_shape.append(jax.ShapeDtypeStruct((B * H, T, 128), jnp.float32))
    out_specs, out_shape = tuple(out_specs), tuple(out_shape)
    data_specs = [
        pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0)),
        pl.BlockSpec((1, S, d), lambda bh, qi: (bh, 0, 0)),
        pl.BlockSpec((1, S, d), lambda bh, qi: (bh, 0, 0)),
    ]
    if iota_positions:
        G = _flash_group(B * H, T, S, d, need_lse, not no_bias)
        kernel = functools.partial(_fwd_kernel_iota, block_q=block_q,
                                   block_k=block_k, causal=causal,
                                   sm_scale=sm_scale, has_bias=not no_bias,
                                   group=G)
        # one program per G (batch·head) rows: the kernel unrolls the query
        # blocks (and the G rows) internally (see _fwd_kernel_iota) —
        # full-T q/o blocks here.  At 7B prefill shapes per-program fixed
        # overhead dominates a G=1 launch (448 programs × ~7 µs for ~1 µs
        # of MXU work each), so G amortizes it within the VMEM budget.
        one_out_specs = [pl.BlockSpec((G, T, d), lambda bh: (bh, 0, 0))]
        if need_lse:
            one_out_specs.append(pl.BlockSpec((G, T, 128),
                                              lambda bh: (bh, 0, 0)))
        data_in = [
            pl.BlockSpec((G, T, d), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((G, S, d), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((G, S, d), lambda bh: (bh, 0, 0)),
        ]
        operands = [qf, kf, vf]
        if not no_bias:
            kv_bias = jnp.where(kv_rows[:, None, :] != 0, 0.0,
                                NEG_INF).astype(jnp.float32)
            kv_bias = jnp.broadcast_to(kv_bias, (B * H, 8, S))
            data_in = [pl.BlockSpec((G, 8, S), lambda bh: (bh, 0, 0))] + data_in
            operands = [kv_bias] + operands
        res = pl.pallas_call(
            kernel,
            grid=(B * H // G,),
            in_specs=data_in,
            out_specs=tuple(one_out_specs),
            out_shape=out_shape,
            interpret=jax.default_backend() == "cpu",
        )(*operands)
    else:
        kernel = functools.partial(_fwd_kernel_rows, block_k=block_k,
                                   causal=causal, sm_scale=sm_scale)
        res = pl.pallas_call(
            kernel,
            grid=(B * H, T // block_q),
            in_specs=[
                pl.BlockSpec((B * H, T), lambda bh, qi: (0, 0)),
                pl.BlockSpec((B * H, S), lambda bh, qi: (0, 0)),
            ] + data_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=jax.default_backend() == "cpu",
        )(qp_rows, kv_rows, qf, kf, vf)
    o = res[0]                              # out_shape is a tuple either way
    lse = res[1][..., 0].reshape(B, H, T) if need_lse else None
    return o.reshape(B, H, T, d), lse


def _flash_fwd_vjp(q, k, v, q_positions, kv_valid, causal, block_q, block_k):
    o, lse, q_positions, kv_valid = _flash_fwd_expanded(
        q, k, v, q_positions, kv_valid, causal, block_q, block_k,
        need_lse=True)
    return o, (q, k, v, q_positions, kv_valid, o, lse)


def _flash_bwd(causal, block_q, block_k, res, do):
    """Backward via blockwise recomputation, CHUNKED over query blocks so
    peak memory is O(T * chunk), not O(T^2): a lax.scan accumulates dk/dv
    across chunks and stacks dq.  (A full [B, H, T, S] fp32 score tensor —
    the naive form — is ~1 GB per layer at B=8, H=32, T=S=2048, which OOMs
    exactly where flash-attn-2 would not.)"""
    q, k, v, q_positions, kv_valid, o, lse = res
    B, H, T, d = q.shape
    S = k.shape[2]
    scale = d ** -0.5

    # chunk size: largest divisor of T up to 512 (T here is only 8-aligned
    # on the bias-free fast path — e.g. 648 or 2000 — so a 128-multiple
    # picker would degenerate to one full-T chunk and materialize the
    # O(T·S) score tensor this chunking exists to prevent)
    ch = _fit_block(512, T, 8)
    nch = T // ch

    # Dot-operand dtype follows the INPUT dtype with f32 accumulation —
    # flash-attention-2's backward numerics (probabilities/ds round to the
    # input dtype before the MXU dots).  f32 callers keep fully exact math
    # (op_dt == f32 makes every cast below a no-op); bf16 callers get
    # bf16-operand dots, which run the v5e MXU at ~4x its f32-operand rate
    # (measured: the all-f32 form was ~220 ms of the 2.44 s 7B Q-LoRA
    # train step).
    op_dt = q.dtype
    kf = k.astype(op_dt)
    vf = v.astype(op_dt)
    kpos = jnp.arange(S)[None, None, :]
    kv_ok = (kv_valid[:, None, :] != 0)                     # [B, 1, S]

    def one_chunk(carry, xs):
        dk_acc, dv_acc = carry
        qc, oc, doc, lsec, qposc = xs                       # chunk-sliced
        scores = jnp.einsum("bhqd,bhkd->bhqk", qc.astype(op_dt), kf,
                            preferred_element_type=jnp.float32) * scale
        mask = kv_ok
        if causal:
            mask = mask & (qposc[:, :, None] >= kpos)       # [B, ch, S]
        p = jnp.exp(scores - lsec[..., None])
        p = jnp.where(mask[:, None], p, 0.0)
        do_f = doc.astype(op_dt)
        dv_c = jnp.einsum("bhqk,bhqd->bhkd", p.astype(op_dt), do_f,
                          preferred_element_type=jnp.float32)
        dp = jnp.einsum("bhqd,bhkd->bhqk", do_f, vf,
                        preferred_element_type=jnp.float32)
        delta = jnp.sum(doc.astype(jnp.float32) * oc.astype(jnp.float32),
                        axis=-1, keepdims=True)
        ds = p * (dp - delta) * scale
        ds_c = ds.astype(op_dt)
        dq_c = jnp.einsum("bhqk,bhkd->bhqd", ds_c, kf,
                          preferred_element_type=jnp.float32)
        dk_c = jnp.einsum("bhqk,bhqd->bhkd", ds_c, qc.astype(op_dt),
                          preferred_element_type=jnp.float32)
        return (dk_acc + dk_c, dv_acc + dv_c), dq_c

    def chunked(x, axis):
        return jnp.moveaxis(x.reshape(x.shape[:axis] + (nch, ch)
                                      + x.shape[axis + 1:]), axis, 0)

    xs = (chunked(q, 2), chunked(o, 2), chunked(do, 2),
          chunked(lse, 2), chunked(q_positions, 1))
    zeros = jnp.zeros((B, H, S, d), jnp.float32)
    (dk, dv), dq_chunks = jax.lax.scan(one_chunk, (zeros, zeros), xs)
    dq = jnp.moveaxis(dq_chunks, 0, 2).reshape(B, H, T, d)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None, None)


_flash_custom.defvjp(_flash_fwd_vjp, _flash_bwd)


# ---------------------------------------------------------------------------
# packed-heads forward: heads as lane slices, no layout transposes
# ---------------------------------------------------------------------------

def flash_attention_packed(q, k, v, num_heads, causal=True,
                           block_q=None, block_k=None):
    """Transpose-free attention on the packed-heads layout: q [B, T, H·d],
    k/v [B, S, H·d], head h occupying the lane slice [h·d, (h+1)·d) — the
    layout the q/k/v projections PRODUCE and the o-projection CONSUMES.
    Mathematically equal to ``flash_attention`` on [B, H, T, d] under the
    right-padded causal contract (global iota positions, no kv mask) — the
    production prefill configuration; the 4 per-layer [B,T,H,d]↔[B,H,T,d]
    transposes around the attention custom call (~24 ms/step at 7B prefill,
    docs/PERFORMANCE.md) disappear because heads become static 128-aligned
    lane offsets inside the kernel.

    Requires d % 128 == 0 (head dim = lane multiple) and causal=True;
    kv heads must already be repeated (pass MHA or pre-repeated GQA).
    Differentiable: the VJP restages to the [B, H, T, d] layout and reuses
    the standard flash backward (transposes in the backward only)."""
    if block_q is None:
        block_q = int(os.environ.get("CULLAVO_FLASH_BQ", 384))
    if block_k is None:
        block_k = int(os.environ.get("CULLAVO_FLASH_BK", 384))
    B, T, Hd = q.shape
    S = k.shape[1]
    d = Hd // num_heads
    if d % 128 or Hd % num_heads or not causal:
        raise ValueError(
            f"flash_attention_packed needs causal=True and head_dim a lane "
            f"multiple (got H={num_heads}, H*d={Hd}, causal={causal})")
    if S < T:
        # the packed kernel has no kv-validity bias: zero-padded keys are
        # only sound when causality hides them (S >= T, see flash_attention)
        raise ValueError(f"flash_attention_packed needs S >= T (got T={T}, "
                         f"S={S}); use flash_attention for T > S shapes")
    pad_t = (-T) % 8
    pad_s = (-S) % 8
    if pad_t or pad_s:
        q = jnp.pad(q, ((0, 0), (0, pad_t), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad_s), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_s), (0, 0)))
        return _packed_custom(q, k, v, num_heads, causal,
                              block_q, block_k)[:, :T]
    return _packed_custom(q, k, v, num_heads, causal, block_q, block_k)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _packed_custom(q, k, v, num_heads, causal, block_q, block_k):
    return _packed_fwd_core(q, k, v, num_heads, causal, block_q, block_k)


def _packed_fwd_core(q, k, v, H, causal, block_q, block_k):
    B, T, Hd = q.shape
    S = k.shape[1]
    d = Hd // H
    block_q = _fit_block(block_q, T, 8)
    block_k = _fit_block(block_k, S, 8)
    if os.environ.get("CULLAVO_FLASH_PACKED_BG", "1") == "1":
        # batch-grouped variant: ONE head per program delivered as a
        # BlockSpec LANE-OFFSET block (1 head = d lanes, statically
        # 128-aligned — the DMA does the head split, nothing is sliced
        # in-kernel), program overhead amortized by grouping Gb BATCH rows
        # per program (leading-dim ref reads, same shape contract as the
        # standard _fwd_kernel_iota — reused verbatim).  The head-grouped
        # form below pays in-kernel 128-lane slices of the [T, G·d] blocks,
        # which measured SLOWER than the transposes they remove
        # (15.00 vs 16.10 img/s, STATUS r2); this layout removes the
        # transposes without introducing any slice.
        Gb = _flash_group(B, T, S, d, need_lse=False, has_bias=False)
        kernel = functools.partial(
            _fwd_kernel_iota, block_q=block_q, block_k=block_k,
            causal=causal, sm_scale=d ** -0.5, has_bias=False, group=Gb)
        return pl.pallas_call(
            kernel,
            grid=(B // Gb, H),
            in_specs=[pl.BlockSpec((Gb, T, d), lambda bg, h: (bg, 0, h)),
                      pl.BlockSpec((Gb, S, d), lambda bg, h: (bg, 0, h)),
                      pl.BlockSpec((Gb, S, d), lambda bg, h: (bg, 0, h))],
            out_specs=pl.BlockSpec((Gb, T, d), lambda bg, h: (bg, 0, h)),
            out_shape=jax.ShapeDtypeStruct((B, T, Hd), q.dtype),
            interpret=jax.default_backend() == "cpu",
        )(q, k, v)
    # heads per program under the shared VMEM budget rule
    G = _flash_group(H, T, S, d, need_lse=False, has_bias=False)
    kernel = functools.partial(
        _fwd_kernel_iota_packed, block_q=block_q, block_k=block_k, d=d,
        causal=causal, sm_scale=d ** -0.5, group=G)
    return pl.pallas_call(
        kernel,
        grid=(B, H // G),
        in_specs=[pl.BlockSpec((1, T, G * d), lambda b, hg: (b, 0, hg)),
                  pl.BlockSpec((1, S, G * d), lambda b, hg: (b, 0, hg)),
                  pl.BlockSpec((1, S, G * d), lambda b, hg: (b, 0, hg))],
        out_specs=pl.BlockSpec((1, T, G * d), lambda b, hg: (b, 0, hg)),
        out_shape=jax.ShapeDtypeStruct((B, T, Hd), q.dtype),
        interpret=jax.default_backend() == "cpu",
    )(q, k, v)


def _fwd_kernel_iota_packed(q_ref, k_ref, v_ref, o_ref, *, block_q: int,
                            block_k: int, d: int, causal: bool,
                            sm_scale: float, group: int):
    """_fwd_kernel_iota with heads as static lane slices instead of a
    leading axis: same online-softmax body, causal block-skip, and
    input-dtype operands with f32 accumulation."""
    T = q_ref.shape[1]
    S = k_ref.shape[1]
    bq = min(block_q, T)
    for gi in range(group):
        lo = gi * d
        for qi in range(T // bq):
            q = q_ref[0, pl.ds(qi * bq, bq), lo:lo + d]
            n_unmasked, num_kb = _causal_kb_bounds(qi, bq, S, block_k, causal)

            def read_kv(kb, lo=lo):
                return (k_ref[0, pl.ds(kb * block_k, block_k), lo:lo + d],
                        v_ref[0, pl.ds(kb * block_k, block_k), lo:lo + d])

            carry = _online_softmax_qblock(
                q, read_kv, qi * bq, n_unmasked, num_kb, block_k, causal,
                sm_scale)
            acc, m_i, l_i = carry
            l_safe = jnp.where(l_i == 0.0, 1.0, l_i)
            o_ref[0, pl.ds(qi * bq, bq), lo:lo + d] = (
                acc / l_safe).astype(o_ref.dtype)


def _packed_vjp_fwd(q, k, v, num_heads, causal, block_q, block_k):
    o = _packed_fwd_core(q, k, v, num_heads, causal, block_q, block_k)
    return o, (q, k, v)


def _packed_vjp_bwd(num_heads, causal, block_q, block_k, res, do):
    """Backward restages to the standard [B, H, T, d] layout and
    differentiates through the standard flash path (its VJP saves o/lse
    from its own forward — one extra fused forward per backward, which
    per-layer remat pays anyway on the training path)."""
    q, k, v = res
    B, T, Hd = q.shape
    d = Hd // num_heads

    def to_std(x):
        return x.reshape(B, -1, num_heads, d).transpose(0, 2, 1, 3)

    _, vjp = jax.vjp(
        lambda a, b, c: _flash_custom(a, b, c, None, None, causal,
                                      block_q, block_k),
        to_std(q), to_std(k), to_std(v))
    dq, dk, dv = vjp(to_std(do))

    def to_packed(x):
        return x.transpose(0, 2, 1, 3).reshape(x.shape[0], -1, Hd)

    return to_packed(dq), to_packed(dk), to_packed(dv)


_packed_custom.defvjp(_packed_vjp_fwd, _packed_vjp_bwd)


# ---------------------------------------------------------------------------
# decode kernel: one new token against the KV cache
# ---------------------------------------------------------------------------

def _decode_kernel(qpos_ref, kvalid_ref, q_ref, k_ref, v_ref, o_ref,
                   *, block_k: int, sm_scale: float):
    bh = pl.program_id(0)
    q = q_ref[0].astype(jnp.float32) * sm_scale          # [1, d] row
    d = q.shape[-1]
    S = k_ref.shape[1]
    num_kb = S // block_k
    qp = qpos_ref[bh, 0]

    acc = jnp.zeros((1, d), jnp.float32)
    m_i = jnp.full((1, 1), -jnp.inf, jnp.float32)
    l_i = jnp.zeros((1, 1), jnp.float32)

    def body(kb, carry):
        acc, m_i, l_i = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)  # [1, bk]
        kpos = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
        mask = (kvalid_ref[bh, pl.ds(kb * block_k, block_k)].reshape(1, block_k) != 0)
        mask = mask & (qp >= kpos)
        s = jnp.where(mask, s, NEG_INF)
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v_blk, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc, m_i, l_i = jax.lax.fori_loop(0, num_kb, body, (acc, m_i, l_i))
    l_safe = jnp.where(l_i == 0.0, 1.0, l_i)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)


def flash_decode(q, k_cache, v_cache, q_position, kv_valid, block_k=256):
    """q: [B, H, 1, d]; caches [B, KV, S, d] (KV-grouped); returns [B, H, 1, d].

    q_position: [B] logical position of the new token; kv_valid: [B, S].
    """
    B, H, _, d = q.shape
    KV, S = k_cache.shape[1], k_cache.shape[2]
    group = H // KV
    pad_s = (-S) % 128
    if pad_s:
        # keep the kv lane slices 128-aligned (same rule as flash_attention);
        # an unaligned S would degrade block_k to a tiny odd value the Mosaic
        # helper rejects
        k_cache = jnp.pad(k_cache, ((0, 0), (0, 0), (0, pad_s), (0, 0)))
        v_cache = jnp.pad(v_cache, ((0, 0), (0, 0), (0, pad_s), (0, 0)))
        kv_valid = jnp.pad(kv_valid, ((0, 0), (0, pad_s)))
        S = S + pad_s
    block_k = min(block_k, S)
    while S % block_k:
        block_k //= 2
    sm_scale = d ** -0.5


    qf = q.reshape(B * H, 1, d)
    qp = jnp.repeat(q_position.astype(jnp.int32).reshape(B, 1), H, axis=0)  # [B*H, 1]
    kv = jnp.repeat(kv_valid.astype(jnp.int32), H, axis=0)                  # [B*H, S]
    kf = jnp.repeat(k_cache, group, axis=1).reshape(B * H, S, d)
    vf = jnp.repeat(v_cache, group, axis=1).reshape(B * H, S, d)

    kernel = functools.partial(_decode_kernel, block_k=block_k, sm_scale=sm_scale)
    o = pl.pallas_call(
        kernel,
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((B * H, 1), lambda bh: (0, 0)),
            pl.BlockSpec((B * H, S), lambda bh: (0, 0)),
            pl.BlockSpec((1, 1, d), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, S, d), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, S, d), lambda bh: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, d), lambda bh: (bh, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, 1, d), q.dtype),
        interpret=jax.default_backend() == "cpu",
    )(qp, kv, qf, kf, vf)
    return o.reshape(B, H, 1, d)
