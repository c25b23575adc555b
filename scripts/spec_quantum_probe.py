"""Chip probe: decode_quantum vs decode_quantum_spec per-quantum cost at 7B.

The serving oracle-ceiling measurement lost to plain despite 6.9x fewer
forwards on CPU — this isolates WHERE the spec quantum spends its time:
per-forward cost (weight stream should be ~equal at W=1 vs W=4) vs loop
overhead vs the per-row W-slot cache scatter.

Usage: SPEC_SLOTS=12 SPEC_K=4 python scripts/spec_quantum_probe.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_llava7b_params, log  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from cullavo_tpu.models.llava.config import LlavaConfig
    from cullavo_tpu.models.llava.modeling import (GenerationConfig,
                                                   decode_quantum,
                                                   decode_quantum_spec,
                                                   generate_prefill)

    slots = int(os.environ.get("SPEC_SLOTS", 12))
    K = int(os.environ.get("SPEC_K", 4))
    Q = int(os.environ.get("SPEC_QUANTUM", 8))
    quant = os.environ.get("SPEC_QUANT", "int8")
    cfg = LlavaConfig()
    params = build_llava7b_params(quant, cfg)
    n_img = cfg.num_image_tokens
    T = 648
    from cullavo_tpu.models.llava.llama import round_cache_len

    # rounded so the wwin flash-decode kernel engages (CULLAVO_WWIN=0
    # A/Bs the unfused XLA window path at the same cache length)
    max_len = round_cache_len(T + 64)
    rng = np.random.default_rng(0)
    ids = rng.integers(4, 32000, size=(slots, T)).astype(np.int32)
    ids[:, 1:1 + n_img] = cfg.image_token_id
    mask = np.ones_like(ids)
    mask[:, 641:] = 0
    pix = rng.normal(size=(slots, 3, 336, 336)).astype(np.float32)
    gen = GenerationConfig(do_sample=False, eos_token_id=-1)

    log("prefill...")
    st = generate_prefill(params, cfg, jnp.asarray(ids), jnp.asarray(pix),
                          jnp.asarray(mask), max_len,
                          compute_dtype=jnp.bfloat16)
    pool = dict(st)
    pool["write_idx"] = jnp.broadcast_to(jnp.asarray(st["write_idx"],
                                                     jnp.int32), (slots,))
    pool["cur_tok"] = jnp.argmax(st["logits"], -1).astype(jnp.int32)
    pool["done"] = jnp.zeros((slots,), bool)
    cap = max_len + Q + K

    def timed(fn, n=6):
        fn()  # compile+warm is outside; still warm once
        ts = []
        for _ in range(n):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        return float(np.percentile(ts, 50))

    # plain quantum timing: SPEC_MODE=plain/spec selects one per process —
    # holding both donated program states at once OOMs the 16 GB chip
    mode = os.environ.get("SPEC_MODE", "spec")
    t_plain = None
    if mode == "plain":
        state = {"plain": pool}

        def plain():
            t, s2 = decode_quantum(params, cfg, state["plain"], gen, Q,
                                   compute_dtype=jnp.bfloat16)
            np.asarray(t)
            state["plain"] = s2

        t_plain = timed(plain)
        print(json.dumps({
            "metric": "spec_quantum_probe", "mode": "plain", "quant": quant,
            "slots": slots, "quantum": Q,
            "plain_quantum_s": round(t_plain, 4),
            "plain_per_forward_ms": round(1000 * t_plain / Q, 2)}))
        return

    # floor corpus (prompt only): acceptance ~0 with random weights, so
    # every window emits 1 token — spec_quantum_s / n_fwd prices the W-token
    # verification forward directly against the plain per-forward cost
    hist = np.zeros((slots, cap), np.int32)
    hlen = np.zeros((slots,), np.int32)
    first = np.asarray(pool["cur_tok"])
    for b in range(slots):
        hist[b, :641] = ids[b, :641]
        hist[b, 641] = int(first[b])
        hlen[b] = 642
    state = {"spec": pool,
             "hist": {"hist": jnp.asarray(hist), "hist_len": jnp.asarray(hlen)}}

    def spec():
        t, ne, s2, h2 = decode_quantum_spec(params, cfg, state["spec"],
                                            state["hist"], gen, Q, K,
                                            compute_dtype=jnp.bfloat16)
        np.asarray(t)
        state["spec"] = s2
        state["hist"] = h2

    t_spec = timed(spec)
    if os.environ.get("SPEC_TRACE"):
        from _trace_util import trace_and_top_ops

        log(json.dumps(trace_and_top_ops(spec), indent=1))
    nf = int(np.asarray(state["hist"]["n_fwd"]))
    print(json.dumps({
        "metric": "spec_quantum_probe", "mode": "spec", "quant": quant,
        "slots": slots, "quantum": Q, "spec_k": K,
        "spec_quantum_s": round(t_spec, 4),
        "total_spec_forwards": nf,
        "spec_per_forward_ms": round(1000 * 7 * t_spec / max(nf, 1), 2),
    }))


if __name__ == "__main__":
    main()
