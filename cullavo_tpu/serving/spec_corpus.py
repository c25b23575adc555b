"""Realistic spec-decode acceptance on the deployment text distribution.

The speculative-decode default (serve.yaml SPEC_K: 4) was priced on
random-weight greedy streams, whose repetitiveness inflates prompt-lookup
acceptance (STATUS round 4).  This module derives an acceptance number
someone can defend, with NO model in the loop:

  * the corpus is the repo's own step1 synthesis text
    (data/step1_synthesis.py — COCO class/box/color Q&A turns, the actual
    CuLLaVO deployment distribution; reference cullavo/utils/utils.py
    prompt tables);
  * drafting uses the PRODUCTION ``_ngram_draft`` (modeling.py) over the
    prompt+emitted history;
  * the "model" is assumed PERFECT: its argmax stream equals the true
    answer text.  Acceptance then measures exactly how draftable the
    deployment answers are from their own prompts — the quantity that
    decides whether a spec_k window beats the wwin break-even
    (~1.26 tokens/forward, STATUS round 4).  A real checkpoint's stream can
    only be less draftable than the true text where the model errs, so this
    is an upper bound for a good model and the right prior for the default.

Byte-level tokenization (data/tokenizer.ByteTokenizer) stands in for the
LLaMA SentencePiece vocab (no network in this environment); box/color
phrases keep their repetition structure either way, and the result is
labeled with the tokenizer used.
"""
from __future__ import annotations

import numpy as np


def step1_pairs(n_samples: int = 32, seed: int = 0):
    """Synthesize (prompt_ids, answer_ids) pairs from random COCO-shaped
    records through the REAL step1 pipeline.  The prompt is everything up to
    the last ASSISTANT turn; the answer is that turn's text — the stream
    spec decoding would verify in deployment."""
    from cullavo_tpu.data.step1_synthesis import synthesize_step1
    from cullavo_tpu.data.tokenizer import ByteTokenizer

    tok = ByteTokenizer()
    rng = np.random.default_rng(seed)
    pairs = []
    while len(pairs) < n_samples:
        n = int(rng.integers(2, 8))
        H = W = 96
        boxes = []
        for _ in range(n):
            x0, y0 = rng.uniform(0, W - 20), rng.uniform(0, H - 20)
            boxes.append([x0, y0, x0 + rng.uniform(10, W - x0),
                          y0 + rng.uniform(10, H - y0)])
        record = {
            "image": rng.integers(0, 255, (H, W, 3), dtype=np.uint8),
            "classes": rng.integers(0, 80, size=(n,)),
            "boxes": np.asarray(boxes, np.float32),
            "is_thing": np.ones((n,), bool),
        }
        out = synthesize_step1(record, tok, rng)
        if out is None:
            continue
        ids = np.asarray(out["input_ids"])
        labels = np.asarray(out["labels"])
        # answer spans = labeled positions; take the LAST contiguous span
        # (one verification stream per conversation keeps samples i.i.d.)
        lab = labels != -100
        if not lab.any():
            continue
        end = int(np.nonzero(lab)[0][-1]) + 1
        start = end
        while start > 0 and lab[start - 1]:
            start -= 1
        if end - start < 4:
            continue
        pairs.append((ids[:start], ids[start:end]))
    return pairs


def measure_acceptance(pairs, spec_k: int = 4, extra_hist=None) -> dict:
    """Simulate the decode_quantum_spec acceptance rule on known
    continuations: per forward, draft ``spec_k-1`` tokens with the
    production ``_ngram_draft`` over (prompt + emitted so far, current token
    last); a perfect verifier accepts the matched draft prefix and emits one
    more (the engine's ``a+1`` rule).  Returns tokens/forward plus the
    per-sample distribution."""
    import jax.numpy as jnp

    from cullavo_tpu.models.llava.modeling import _ngram_draft

    per_sample = []
    total_tokens = 0
    total_fwd = 0
    # one FIXED history capacity across samples: _ngram_draft is jitted, so
    # a per-sample cap would recompile for every conversation length
    pre0 = (np.asarray(extra_hist, np.int32)
            if extra_hist is not None else np.zeros((0,), np.int32))
    cap = 1 << int(np.ceil(np.log2(max(
        len(pre0) + len(p) + len(a) + 1 for p, a in pairs))))
    for prompt, answer in pairs:
        pre = pre0
        hist = np.zeros((1, cap), np.int32)
        hist[0, :len(pre)] = pre
        hist[0, len(pre):len(pre) + len(prompt)] = prompt
        hist_len = len(pre) + len(prompt)
        # the engine seeds the history with prompt + FIRST emitted token
        # (current token last); the first answer token plays that role
        cur = int(answer[0])
        hist[0, hist_len] = cur
        hist_len += 1
        emitted = 1
        n_fwd = 1          # the prefill forward emitted answer[0]
        while emitted < len(answer):
            draft = np.asarray(_ngram_draft(
                jnp.asarray(hist), jnp.asarray([hist_len], np.int32),
                jnp.asarray([cur], np.int32), spec_k))[0]
            true_next = answer[emitted:emitted + spec_k]
            a = 0
            while (a < len(draft) and a < len(true_next) - 1
                   and draft[a] == true_next[a]):
                a += 1
            e = min(a + 1, len(true_next))
            for j in range(e):
                hist[0, hist_len] = int(true_next[j])
                hist_len += 1
            cur = int(true_next[e - 1])
            emitted += e
            n_fwd += 1
        per_sample.append((len(answer), n_fwd))
        total_tokens += len(answer)
        total_fwd += n_fwd
    tpf = [t / f for t, f in per_sample]
    return {
        "tokens_per_forward": round(total_tokens / max(total_fwd, 1), 3),
        "tokens_per_forward_p10": round(float(np.percentile(tpf, 10)), 3),
        "tokens_per_forward_p50": round(float(np.percentile(tpf, 50)), 3),
        "tokens_per_forward_p90": round(float(np.percentile(tpf, 90)), 3),
        "n_samples": len(pairs),
        "answer_tokens": total_tokens,
        "spec_k": spec_k,
        "tokenizer": "byte",
        "corpus": "step1_synthesis",
    }


def step1_acceptance(spec_k: int = 4, n_samples: int = 32,
                     seed: int = 0) -> dict:
    """One-call: synthesize the corpus and measure acceptance (bench.py's
    ``spec_acceptance_corpus`` keys)."""
    return measure_acceptance(step1_pairs(n_samples, seed), spec_k)
