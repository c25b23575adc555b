"""Fused W-window decode kernel vs the XLA stale-decode reference.

The pallas kernel (ops/wwin_decode.py) reads blocks straight from the full
stacked [L, S, B, KV, hd] cache with the layer index as a scalar-prefetch
offset; these tests pin it numerically to ``sdpa_decode_stale_smajor`` /
``..._q8`` (models/llava/llama.py) which slice the layer in XLA — same
math, different association, so agreement is to ~1e-5 in f32.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cullavo_tpu.models.llava.llama import (NEG_INF, quantize_kv,
                                            sdpa_decode_stale_smajor,
                                            sdpa_decode_stale_smajor_q8)
from cullavo_tpu.ops.wwin_decode import (wwin_decode_smajor,
                                         wwin_decode_smajor_q8)


def _setup(W, B=2, L=3, S=256, KV=4, n_rep=1, seed=0, dtype=jnp.float32):
    H = KV * n_rep
    hd = 128
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    kc = jax.random.normal(ks[0], (L, S, B, KV, hd), dtype)
    vc = jax.random.normal(ks[1], (L, S, B, KV, hd), dtype)
    q = jax.random.normal(ks[2], (B, H, W, hd), dtype)
    k_cur = jax.random.normal(ks[3], (B, H, W, hd), dtype)
    v_cur = jax.random.normal(ks[4], (B, H, W, hd), dtype)
    # per-row valid lengths: slots >= n_valid are masked
    n_valid = np.array([S - 7, S // 2] * (B // 2 + 1))[:B]
    bias = np.zeros((B, 1, W, S), np.float32)
    for b in range(B):
        bias[b, :, :, n_valid[b]:] = NEG_INF
    return kc, vc, q, k_cur, v_cur, jnp.asarray(bias)


@pytest.mark.parametrize("W,n_rep", [(2, 1), (4, 1), (8, 1), (3, 2), (4, 4)])
def test_wwin_matches_xla_bf16_cache(W, n_rep):
    kc, vc, q, k_cur, v_cur, bias = _setup(W, n_rep=n_rep)
    H = q.shape[1]
    rep = lambda x: x if n_rep == 1 else jnp.repeat(x, n_rep, axis=2)
    for li in (0, kc.shape[0] - 1):
        ref = sdpa_decode_stale_smajor(
            q, kc[li], vc[li],
            k_cur, v_cur, bias, n_rep=n_rep)
        out = wwin_decode_smajor(q, kc, vc, li, k_cur, v_cur, bias,
                                 n_rep=n_rep)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5,
                                   err_msg=f"W={W} n_rep={n_rep} li={li}")


def test_wwin_fully_masked_cache_rows():
    """A row whose cache is entirely invalid must take everything from the
    self window (the masked-block exp(0)=1 trap)."""
    kc, vc, q, k_cur, v_cur, bias = _setup(4)
    bias = bias.at[1].set(NEG_INF)           # batch row 1: no valid cache
    ref = sdpa_decode_stale_smajor(q, kc[1], vc[1], k_cur, v_cur, bias)
    out = wwin_decode_smajor(q, kc, vc, 1, k_cur, v_cur, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("with_win_q8", [False, True])
def test_wwin_matches_xla_q8_cache(with_win_q8):
    W = 4
    kc, vc, q, k_cur, v_cur, bias = _setup(W, seed=3)
    kq, ks_ = quantize_kv(kc)
    vq, vs_ = quantize_kv(vc)
    win_q8 = None
    if with_win_q8:
        kwq, kws = quantize_kv(k_cur.transpose(2, 0, 1, 3))   # [W, B, KV, hd]
        vwq, vws = quantize_kv(v_cur.transpose(2, 0, 1, 3))
        win_q8 = (kwq, kws, vwq, vws)
    li = 2
    ref = sdpa_decode_stale_smajor_q8(
        q, kq[li], ks_[li], vq[li], vs_[li], k_cur, v_cur, bias,
        win_q8=win_q8)
    out = wwin_decode_smajor_q8(q, kq, ks_, vq, vs_, li, k_cur, v_cur, bias,
                                win_q8=win_q8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_wwin_q8_gqa():
    W, n_rep = 4, 2
    kc, vc, q, k_cur, v_cur, bias = _setup(W, n_rep=n_rep, seed=5)
    kq, ks_ = quantize_kv(kc)
    vq, vs_ = quantize_kv(vc)
    # the XLA q8 path takes the window k/v already repeated to H heads
    li = 0
    ref = sdpa_decode_stale_smajor_q8(
        q, kq[li], ks_[li], vq[li], vs_[li], k_cur, v_cur, bias,
        n_rep=n_rep)
    out = wwin_decode_smajor_q8(q, kq, ks_, vq, vs_, li, k_cur, v_cur, bias,
                                n_rep=n_rep)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)
