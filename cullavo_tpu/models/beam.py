"""Jittable beam search — HF-semantics (transformers 4.57 BeamSearchScorer).

The reference's zoo evals decode BLIP-2 / InstructBLIP answers with
``num_beams=5, length_penalty=-1.0`` (pipeline/BLIP2VQAVALPipeline.py:175,
InstructBLIPVQAVALPipeline.py); this is the TPU-native equivalent: a fixed
``lax.scan`` over ``max_new_tokens`` steps with per-step top-2·nb candidate
selection, finished-hypothesis tracking, and cache reorder via a
caller-supplied gather — the scorer rules match transformers'
``BeamSearchScorer.process/finalize``:

  * candidate scores are summed log-probs; the top ``2·num_beams`` per batch
    are considered each step, in rank order;
  * an eos candidate with rank < num_beams becomes a finished hypothesis
    with score ``sum_logprobs / generated_len ** length_penalty`` (the eos
    token counts toward ``generated_len`` but is not stored);
  * non-eos candidates fill the next ``num_beams`` beams in rank order;
  * a batch is done (early_stopping=False) when it holds ``num_beams``
    hypotheses and the worst is >= the best attainable
    ``best_sum_logprobs / generated_len ** length_penalty``;
  * at the end, still-open beams join the hypothesis pool, the best
    hypothesis is emitted, and eos is appended when there is room.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

NEG_INF = -1.0e9


def beam_search(
    step_fn: Callable[[jax.Array, Any, jax.Array], tuple],
    reorder_fn: Callable[[Any, jax.Array], Any],
    init_logits: jax.Array,          # [B*nb, V] logits for the 1st generated token
    init_state: Any,                 # model state with B*nb batch-beam rows
    batch: int,
    num_beams: int,
    max_new_tokens: int,
    eos_token_id: int,
    pad_token_id: int = 0,
    length_penalty: float = 1.0,
):
    """Returns generated tokens [B, max_new_tokens] of the best hypothesis
    (eos-terminated, pad-filled), matching HF ``generate(num_beams=...)``
    output minus the prompt/decoder-start prefix.

    ``step_fn(tokens [B*nb], state, step_idx) -> (logits [B*nb, V], state)``
    feeds the tokens chosen at scan step t with ``step_idx = t + 1`` (the
    number of generated tokens already fixed).  ``reorder_fn(state,
    flat_parent [B*nb])`` gathers every cache row to its beam parent before
    the next step.
    """
    B, nb, T = batch, num_beams, max_new_tokens
    V = init_logits.shape[-1]
    k2 = 2 * nb

    beam_scores = jnp.full((B, nb), NEG_INF, jnp.float32).at[:, 0].set(0.0)
    seq = jnp.full((B, nb, T), pad_token_id, jnp.int32)
    hyp_score = jnp.full((B, nb), -jnp.inf, jnp.float32)
    hyp_seq = jnp.full((B, nb, T), pad_token_id, jnp.int32)
    hyp_len = jnp.zeros((B, nb), jnp.int32)
    done = jnp.zeros((B,), bool)

    def step(carry, t):
        (logits, state, beam_scores, seq, hyp_score, hyp_seq, hyp_len,
         done) = carry

        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        cand = (beam_scores.reshape(B * nb, 1) + logp).reshape(B, nb * V)
        vals, idx = jax.lax.top_k(cand, k2)               # [B, 2nb], rank order
        tok = (idx % V).astype(jnp.int32)
        parent = idx // V
        rank = jnp.arange(k2)[None, :]
        is_eos = tok == eos_token_id

        # --- finished hypotheses (eos candidates at rank < nb) -------------
        gen_len = (t + 1).astype(jnp.float32)             # eos counts
        eligible = is_eos & (rank < nb) & ~done[:, None]
        cand_norm = jnp.where(eligible, vals / gen_len ** length_penalty,
                              -jnp.inf)
        cand_seq = jnp.take_along_axis(seq, parent[:, :, None], axis=1)  # [B,2nb,T]
        all_scores = jnp.concatenate([hyp_score, cand_norm], axis=1)     # [B,nb+2nb]
        all_seq = jnp.concatenate([hyp_seq, cand_seq], axis=1)
        all_len = jnp.concatenate(
            [hyp_len, jnp.broadcast_to(t.astype(jnp.int32)[None, None], (B, k2))],
            axis=1)
        top_scores, top_i = jax.lax.top_k(all_scores, nb)
        hyp_score = top_scores
        hyp_seq = jnp.take_along_axis(all_seq, top_i[:, :, None], axis=1)
        hyp_len = jnp.take_along_axis(all_len, top_i, axis=1)

        # --- beam continuation (first nb non-eos candidates in rank order) -
        order = jnp.argsort(rank + is_eos * (4 * nb), axis=1)[:, :nb]    # [B, nb]
        new_scores = jnp.take_along_axis(vals, order, axis=1)
        new_tok = jnp.take_along_axis(tok, order, axis=1)
        new_parent = jnp.take_along_axis(parent, order, axis=1)

        frozen = done[:, None]
        new_scores = jnp.where(frozen, beam_scores, new_scores)
        new_parent = jnp.where(frozen, jnp.arange(nb)[None, :], new_parent)
        new_tok = jnp.where(frozen, pad_token_id, new_tok)

        seq = jnp.take_along_axis(seq, new_parent[:, :, None], axis=1)
        seq = seq.at[:, :, t].set(jnp.where(frozen, seq[:, :, t], new_tok))

        # --- done test (HF is_done, early_stopping=False) ------------------
        full = hyp_score[:, -1] > -jnp.inf                # nb hyps collected
        best_attainable = vals[:, 0] / gen_len ** length_penalty
        done = done | (full & (hyp_score[:, -1] >= best_attainable))

        # --- advance the model one step ------------------------------------
        # (skipped on the final iteration — those logits are never consumed;
        # saves one full batch×beams forward per decode.  The cache reorder
        # lives INSIDE the cond for the same reason: the last iteration's
        # full-cache gather would be discarded too.)
        flat_parent = (jnp.arange(B)[:, None] * nb + new_parent).reshape(-1)
        logits, state = jax.lax.cond(
            t + 1 < T,
            lambda s: step_fn(new_tok.reshape(-1),
                              reorder_fn(s, flat_parent), t + 1),
            lambda s: (logits, s),
            state)
        return (logits, state, new_scores.astype(jnp.float32), seq, hyp_score,
                hyp_seq, hyp_len, done), None

    carry = (init_logits, init_state, beam_scores, seq, hyp_score, hyp_seq,
             hyp_len, done)
    carry, _ = jax.lax.scan(step, carry, jnp.arange(T))
    (_logits, _state, beam_scores, seq, hyp_score, hyp_seq, hyp_len,
     done) = carry

    # --- finalize: open beams join the pool for non-done batches -----------
    open_norm = jnp.where(done[:, None], -jnp.inf,
                          beam_scores / jnp.float32(T) ** length_penalty)
    all_scores = jnp.concatenate([hyp_score, open_norm], axis=1)
    all_seq = jnp.concatenate([hyp_seq, seq], axis=1)
    all_len = jnp.concatenate(
        [hyp_len, jnp.full((B, nb), T, jnp.int32)], axis=1)
    best = jnp.argmax(all_scores, axis=1)
    out = jnp.take_along_axis(all_seq, best[:, None, None], axis=1)[:, 0]
    out_len = jnp.take_along_axis(all_len, best[:, None], axis=1)[:, 0]
    # append eos when there is room (HF decoded[…, sent_length] = eos)
    pos = jnp.arange(T)[None, :]
    out = jnp.where(pos == out_len[:, None], eos_token_id, out)
    out = jnp.where(pos > out_len[:, None], pad_token_id, out)
    return out
