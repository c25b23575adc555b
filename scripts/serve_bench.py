"""Serving-engine benchmark: continuous batching vs static batches, 7B int8.

Workload: a stream of VQA-shaped requests (576 image tokens + text prompt,
bucket 648) whose decode budgets VARY per request — the regime where static
batching leaves slots idle (every row decodes to the batch max) and
iteration-level scheduling refills them.

  python scripts/serve_bench.py            # both modes, one JSON line
  SERVE_SLOTS=12 SERVE_N=60 SERVE_QUANTUM=8 SERVE_KV=int8 ...

Static baseline = chunked prefill + generate_decode(max_new = batch max)
over the same requests in arrival order, same batch size as the pool.
Each mode runs in its OWN subprocess: a 7B engine pass followed by the
static pass in one process OOMs on a 16 GB chip (HBM fragmentation), and
bench.py's one-mode-per-measurement discipline applies here too.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_llava7b_params
    from cullavo_tpu.models.llava.config import LlavaConfig
    from cullavo_tpu.models.llava.modeling import (GenerationConfig,
                                                   generate_decode,
                                                   generate_prefill)

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/cullavo_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    cfg = LlavaConfig()
    quant = os.environ.get("SERVE_QUANT", "int8")
    kv_quant = os.environ.get("SERVE_KV") or None
    slots = int(os.environ.get("SERVE_SLOTS", 12))
    n_req = int(os.environ.get("SERVE_N", 48))
    quantum = int(os.environ.get("SERVE_QUANTUM", 8))
    chunk = int(os.environ.get("SERVE_CHUNK", max(1, slots // 2)))
    max_new_max = int(os.environ.get("SERVE_MAX_NEW", 48))

    n_img = cfg.num_image_tokens
    bucket = -(-(1 + n_img + 64) // 8) * 8          # 648, sublane-aligned
    max_len = bucket + max_new_max

    mode = os.environ.get("SERVE_MODE")
    params = None
    if mode in ("engine", "static"):
        # only the per-mode subprocesses touch the chip — the parent holding
        # 7B params while a child runs would OOM the 16 GB chip
        log("device:", jax.devices()[0], f"building 7B params ({quant})...")
        params = build_llava7b_params(quant, cfg)

    from cullavo_tpu.serving.benchmark import measure_serving, synth_requests

    # SERVE_ADAPTERS=K: per-request multi-adapter serving (round-robin ids
    # over K random r=64 LoRA sets) — prices the S-LoRA-style selection path
    n_adapters = int(os.environ.get("SERVE_ADAPTERS", 0))
    lora, lora_scaling = None, 0.0
    if n_adapters and mode == "engine":
        from cullavo_tpu.models.llava.lora import (LoraConfig,
                                                   init_lora_params,
                                                   stack_adapter_sets)

        lcfg = LoraConfig()
        sets = []
        for k in range(n_adapters):
            full = jax.jit(lambda key: init_lora_params(
                params, cfg, lcfg, key, dtype=jnp.bfloat16))(
                jax.random.PRNGKey(100 + k))
            sets.append(jax.block_until_ready(full)["language_model"])
        lora = {"language_model":
                (stack_adapter_sets(sets) if n_adapters > 1 else sets[0])}
        lora_scaling = lcfg.scaling
        log(f"{n_adapters} adapter set(s) attached (r={lcfg.r})")

    # corpus shape: SERVE_SHARED=S shares the first S text tokens across
    # requests (the real system-prompt layout); SERVE_QPI=K reuses each
    # image for K consecutive requests (VQAv2 ≈ 3 questions/image) — the
    # patterns the engine's prefix-KV registry exploits (SERVE_PREFIX=0
    # disables the registry for A/B)
    shared = int(os.environ.get("SERVE_SHARED", 0))
    qpi = int(os.environ.get("SERVE_QPI", 1))
    reqs = synth_requests(cfg, n_req, prompt_text_tokens=64,
                          budget_mean=16, budget_max=max_new_max, seed=0,
                          n_adapters=max(1, n_adapters),
                          shared_sys_tokens=shared, questions_per_image=qpi)
    total_budget = sum(r.max_new_tokens for r in reqs)
    log(f"{n_req} requests, budgets 4..{max_new_max}, "
        f"total {total_budget} tokens")

    def run_static():
        # one-shot prefill: at these shapes the chunked merge's peak
        # (merged pool + two donated chunk caches) exceeds HBM while the
        # cache-building one-shot prefill holds a single cache buffer
        toks = 0
        for off in range(0, n_req, slots):
            batch = reqs[off:off + slots]
            B = len(batch)
            ids = np.zeros((B, bucket), np.int32)
            mask = np.zeros((B, bucket), np.int32)
            pix = np.zeros((B, 3, 336, 336), np.float32)
            for i, r in enumerate(batch):
                ids[i, :len(r.input_ids)] = r.input_ids
                mask[i, :len(r.input_ids)] = 1
                pix[i] = r.pixel_values
            mx = max(r.max_new_tokens for r in batch)
            st = generate_prefill(params, cfg, jnp.asarray(ids),
                                  jnp.asarray(pix), jnp.asarray(mask),
                                  max_len, compute_dtype=jnp.bfloat16,
                                  kv_quant=kv_quant)
            # return_state=True lets the donated prefill cache alias the
            # output cache (in-place decode) — without it decode holds TWO
            # cache-sized buffers at entry and OOMs at these shapes
            out, final = generate_decode(params, cfg, st,
                                         GenerationConfig(max_new_tokens=mx,
                                                          do_sample=False,
                                                          eos_token_id=-1),
                                         compute_dtype=jnp.bfloat16,
                                         return_state=True)
            np.asarray(out)   # completion barrier
            # drop the returned cache NOW: holding it across the next
            # batch's prefill keeps TWO cache-sized buffers live (OOM)
            del final, st
            toks += sum(r.max_new_tokens for r in batch)
        return toks

    if mode == "engine":
        log("compile+warm engine...")
        # SERVE_RATE=R adds an open-loop Poisson-arrival pass at R req/s
        # (TTFT/E2E under load, queueing delay included)
        rate = float(os.environ.get("SERVE_RATE", 0) or 0)
        spec_k = int(os.environ.get("SERVE_SPEC_K", 0) or 0)
        if spec_k and os.environ.get("SERVE_SPEC_ORACLE") == "1":
            # acceptance CEILING: run once plain to record each request's
            # greedy stream, then re-offer the stream as extra_hist so the
            # bigram lookup drafts it perfectly (the perfectly-repetitive-
            # context limit — extractive answers, copy-heavy continuations).
            # Random bench weights give acceptance ~0 otherwise, so floor
            # (SERVE_SPEC_ORACLE unset) and ceiling bracket the mechanism.
            from cullavo_tpu.serving.benchmark import ServingEngine
            from cullavo_tpu.models.llava.modeling import GenerationConfig
            import numpy as _np
            bucket = -(-max(len(r.input_ids) for r in reqs) // 8) * 8
            eng = ServingEngine(
                params, cfg, GenerationConfig(do_sample=False, eos_token_id=-1),
                num_slots=slots, max_len=bucket + max_new_max,
                prompt_buckets=(bucket,), prefill_chunk=chunk,
                quantum=quantum, kv_quant=kv_quant)
            for r in reqs:
                eng.submit(r)
            streams = eng.run()
            # free the pre-pass engine's multi-GB pool BEFORE measure_serving
            # allocates its own (two pools at 7B OOM a 16 GB chip)
            eng.pool = None
            eng.hist = None
            del eng
            import gc
            gc.collect()
            log("oracle pre-pass done; attaching extra_hist")
            from cullavo_tpu.serving.engine import Request as _Req
            reqs = [_Req(req_id=r.req_id, input_ids=r.input_ids,
                         pixel_values=r.pixel_values,
                         max_new_tokens=r.max_new_tokens,
                         adapter_id=r.adapter_id,
                         extra_hist=_np.concatenate(
                             [[int(r.input_ids[-1])],
                              _np.asarray(streams[r.req_id], _np.int32)]
                         ).astype(_np.int32))
                    for r in reqs]
        sweep = os.environ.get("SERVE_SWEEP", "")
        sweep_rates = [float(x) for x in sweep.split(",") if x] or None
        print(json.dumps(measure_serving(
            params, cfg, reqs, slots=slots, quantum=quantum,
            prefill_chunk=chunk, kv_quant=kv_quant,
            lora=lora, lora_scaling=lora_scaling,
            arrival_rate=rate or None, spec_k=spec_k or None,
            prefix_cache=os.environ.get("SERVE_PREFIX", "1") != "0",
            admit_groups=(None if os.environ.get("SERVE_ADMIT", "1")
                          in ("0", "none") else
                          int(os.environ.get("SERVE_ADMIT", "1"))),
            reps=int(os.environ.get("SERVE_REPS", 3)),
            sweep_rates=sweep_rates)))
        return
    if mode == "static":
        log("compile+warm static...")
        t0 = time.time()
        run_static()
        log(f"  first run {time.time()-t0:.1f}s")
        t0 = time.time()
        run_static()
        dt = time.time() - t0
        print(json.dumps({"requests_per_s": round(n_req / dt, 3),
                          "useful_tokens_per_s": round(total_budget / dt, 1),
                          "wall_s": round(dt, 2)}))
        return

    # parent: one subprocess per mode (fresh HBM each)
    results = {}
    for name in ("engine", "static"):
        log(f"=== mode {name} (subprocess) ===")
        env = {**os.environ, "SERVE_MODE": name}
        p = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, capture_output=True, text=True)
        sys.stderr.write(p.stderr[-2000:])
        if p.returncode != 0:
            log(f"mode {name} FAILED rc={p.returncode}")
            continue
        results[name] = json.loads(p.stdout.strip().splitlines()[-1])

    if "engine" not in results:
        raise SystemExit("engine mode failed")
    line = {
        "metric": "llava7b_serving_requests_per_sec",
        "value": results["engine"]["requests_per_s"],
        "unit": "requests/s",
        "engine": results["engine"],
        "slots": slots, "quantum": quantum, "n_requests": n_req,
        "quant": quant, "kv_quant": kv_quant or "bf16",
        "prompt_tokens": int(1 + n_img + 64), "bucket": bucket,
    }
    if "static" in results:
        line["static"] = results["static"]
        line["vs_baseline"] = round(
            results["engine"]["requests_per_s"]
            / max(results["static"]["requests_per_s"], 1e-9), 3)
    print(json.dumps(line))


if __name__ == "__main__":
    main()
