"""Shared serving-throughput measurement (scripts/serve_bench.py + bench.py).

Synthesizes a VQA-shaped request stream with a long-tail of decode budgets
(geometric, the regime where static batching idles slots) and times one
engine pass end-to-end (prefill + scheduling + decode + harvest)."""
from __future__ import annotations

import time
from typing import Optional

import numpy as np

import jax.numpy as jnp

from cullavo_tpu.models.llava.modeling import GenerationConfig
from cullavo_tpu.serving.engine import Request, ServingEngine


def synth_requests(cfg, n_req: int, prompt_text_tokens: int = 64,
                   budget_mean: int = 16, budget_max: int = 48, seed: int = 0,
                   n_adapters: int = 1, shared_sys_tokens: int = 0,
                   questions_per_image: int = 1):
    """VQA-shaped request stream.

    ``shared_sys_tokens`` > 0 lays prompts out like the real deployment
    (data/step1_synthesis.py SYSTEM_PROMPT + <image> + question): the first
    ``shared_sys_tokens`` text ids are IDENTICAL across requests, then the
    image run, then a unique question tail.  ``questions_per_image`` > 1
    reuses each image for that many consecutive requests (VQAv2 averages ~3
    questions per image) — the pattern the engine's prefix-KV registry
    exploits.  Defaults reproduce the round-2..4 corpus exactly."""
    rng = np.random.default_rng(seed)
    n_img = cfg.num_image_tokens
    shared = rng.integers(4, 32000, size=(shared_sys_tokens,)).astype(np.int32)
    reqs = []
    pix = None
    for i in range(n_req):
        if shared_sys_tokens:
            tail_n = max(1, 1 + prompt_text_tokens - shared_sys_tokens)
            ids = np.concatenate([
                shared,
                np.full((n_img,), cfg.image_token_id, np.int32),
                rng.integers(4, 32000, size=(tail_n,)).astype(np.int32)])
        else:
            T = 1 + n_img + prompt_text_tokens
            ids = rng.integers(4, 32000, size=(T,)).astype(np.int32)
            ids[1:1 + n_img] = cfg.image_token_id
        if pix is None or i % max(1, questions_per_image) == 0:
            pix = rng.normal(size=(3, cfg.vision.image_size,
                                   cfg.vision.image_size)).astype(np.float32)
        budget = int(np.clip(rng.geometric(1.0 / budget_mean), 4, budget_max))
        reqs.append(Request(req_id=i, input_ids=ids, pixel_values=pix,
                            max_new_tokens=budget,
                            adapter_id=i % n_adapters))
    return reqs


def measure_serving(params, cfg, reqs, *, slots: int = 12, quantum: int = 8,
                    prefill_chunk: Optional[int] = None,
                    kv_quant: Optional[str] = None,
                    compute_dtype=jnp.bfloat16,
                    lora: Optional[dict] = None,
                    lora_scaling: float = 0.0,
                    arrival_rate: Optional[float] = None,
                    reps: int = 3,
                    spec_k: Optional[int] = None,
                    prefix_cache: bool = True,
                    admit_groups: Optional[int] = 1,
                    sweep_rates=None) -> dict:
    """One warm pass (compile) + ``reps`` timed passes; returns median+band."""
    bucket = -(-max(len(r.input_ids) for r in reqs) // 8) * 8
    max_len = bucket + max(r.max_new_tokens for r in reqs)
    chunk = prefill_chunk or max(1, slots // 2)

    def make_engine():
        return ServingEngine(params, cfg,
                             GenerationConfig(do_sample=False, eos_token_id=-1),
                             num_slots=slots, max_len=max_len,
                             prompt_buckets=(bucket,), prefill_chunk=chunk,
                             quantum=quantum, kv_quant=kv_quant,
                             compute_dtype=compute_dtype,
                             lora=lora, lora_scaling=lora_scaling,
                             spec_k=spec_k, prefix_cache=prefix_cache,
                             admit_groups=admit_groups)

    last_counters = {}

    def run():
        eng = make_engine()
        for r in reqs:
            eng.submit(r)
        res = eng.run()
        last_counters.clear()
        last_counters.update(eng.counters)
        return res, eng.latency()

    # compile + warm.  Staged submits walk EVERY power-of-two prefill-chunk
    # size (1, 2, 4, ... chunk) so open-loop passes — where arrivals admit
    # as small chunks — never hit a fresh 7B compile mid-measurement (one
    # un-warmed size measured TTFT p95 = 77 s at rate 6).
    warm = make_engine()
    done = 0
    cuts, k = [], 1
    while k <= chunk:
        cuts.append(done + k if cuts == [] else cuts[-1] + k)
        k *= 2
    for cut in cuts + [len(reqs)]:
        cut = min(cut, len(reqs))
        for r in reqs[done:cut]:
            warm.submit(r)
        done = max(done, cut)
        warm.run()
    del warm
    # multi-run median + band: single-run serving numbers swing with the
    # remote-tunnel state (observed 7.9-9.4 req/s for one config across
    # rounds) — quote the median of `reps` timed passes and the min/max band,
    # like bench_xdecoder does for the seg numbers
    reps = max(1, reps)
    rates, toks, lats = [], [], []
    for _ in range(reps):
        t0 = time.time()
        res, lat = run()
        dt = time.time() - t0
        total = sum(len(v) for v in res.values())
        rates.append(len(reqs) / dt)
        toks.append(total / dt)
        lats.append(lat)
    order = int(np.argsort(rates)[len(rates) // 2])
    out = {"requests_per_s": round(float(np.median(rates)), 3),
           "requests_per_s_band": [round(min(rates), 3), round(max(rates), 3)],
           "useful_tokens_per_s": round(float(np.median(toks)), 1),
           "wall_s": round(len(reqs) / float(np.median(rates)), 2),
           "n_requests": len(reqs), "reps": reps,
           "slots": slots, "quantum": quantum, "bucket": bucket,
           "kv_quant": kv_quant or "bf16", "spec_k": spec_k,
           "prefix_cache": prefix_cache, "admit_groups": admit_groups,
           "scheduler": dict(last_counters),
           "latency": lats[order]}
    if arrival_rate:
        out["open_loop"] = measure_open_loop(make_engine, reqs, arrival_rate)
    if sweep_rates:
        out["open_loop_sweep"] = sweep_open_loop(make_engine, reqs,
                                                 sweep_rates)
    return out


def measure_open_loop(make_engine, reqs, rate_req_s: float,
                      seed: int = 0) -> dict:
    """Open-loop pass: requests ARRIVE at Poisson times (exponential gaps at
    ``rate_req_s``) instead of all-at-once — the latency-under-load regime a
    closed-loop throughput number hides (TTFT includes queueing delay when
    arrivals outpace slot turnover).  Reuses the (already compiled) engine
    programs; returns achieved throughput + TTFT/E2E percentiles."""
    rng = np.random.default_rng(seed)
    gaps = rng.exponential(1.0 / rate_req_s, size=len(reqs))
    arrivals = np.cumsum(gaps)
    eng = make_engine()
    t0 = time.perf_counter()
    i = 0
    while i < len(reqs) or eng.pending or eng.active:
        now = time.perf_counter() - t0
        while i < len(reqs) and arrivals[i] <= now:
            eng.submit(reqs[i])
            i += 1
        if eng.pending or eng.active:
            eng.step()
        elif i < len(reqs):
            time.sleep(min(0.005, max(0.0, arrivals[i] - now)))
    dt = time.perf_counter() - t0
    return {"offered_req_s": round(rate_req_s, 3),
            "achieved_req_s": round(len(reqs) / dt, 3),
            "wall_s": round(dt, 2),
            "scheduler": dict(eng.counters),
            "latency": eng.latency()}


def sweep_open_loop(make_engine, reqs, rates) -> dict:
    """Open-loop offered-rate sweep (VERDICT r4 Weak #1: one saturated point
    measures queue drain, not steady state).

    The KNEE criterion is queueing stability, not achieved/offered: with a
    finite request window, achieved = n/(arrival span + drain) sits below
    offered at EVERY rate (measured ~86% across 2..6 req/s on an engine
    whose closed-loop capacity was 6.7), so a 95%-of-offered test never
    passes.  Instead a point is ``sustained`` when its TTFT p95 stays under
    a bound self-calibrated from the sweep's LOWEST rate (the unloaded
    reference): ``max(3x base, base + 1 s)`` — a growing queue pushes TTFT
    p95 to many seconds within the window (a saturated r4 point measured
    4.26 s; a mid-run compile measured 77 s).

    Caveat: with a finite stream the window may end before instability at
    rates just above capacity shows up (a 16-slot pool absorbs a 48-request
    burst), so read the knee TOGETHER with ``max_achieved_req_s`` — the
    realized ceiling — and the closed-loop number."""
    points = []
    for r in sorted(rates):
        p = measure_open_loop(make_engine, reqs, float(r))
        points.append(p)
    base = (points[0]["latency"].get("ttft") or {}).get("p95") or 0.5
    bound = max(3.0 * base, base + 1.0)
    knee = 0.0
    for p in points:
        ttft95 = (p["latency"].get("ttft") or {}).get("p95") or float("inf")
        p["sustained"] = ttft95 <= bound
        if p["sustained"]:
            knee = max(knee, p["offered_req_s"])
    return {"points": points,
            "max_sustainable_req_s": round(knee, 3),
            "max_achieved_req_s": round(
                max(p["achieved_req_s"] for p in points), 3),
            "ttft_p95_bound_s": round(bound, 3)}
