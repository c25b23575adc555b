"""Benchmark: LLaVA-1.5-7B VQA-style decode throughput on one TPU chip.

Measures the BASELINE.json metric: images/sec/chip + p50 per-image latency for
the VQAv2-val workload shape (576 image tokens + question prompt, greedy
decode with KV cache), in the reference's eval configuration: 4-bit NF4
LLM weights (cullavo/load_cullavo.py:65-83) with bf16 compute.  Weights are
random (values don't affect speed) at the exact LLaVA-1.5-7B architecture.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
``vs_baseline`` divides by an estimated A100 reference throughput for the
same workload (HF transformers + flash-attn2, batch 1 greedy ≈ 2.0 img/s) —
the reference repo publishes no numbers (BASELINE.md), so this anchor is an
engineering estimate, re-measured never copied.
"""
import json
import sys
import time
from typing import Optional

import numpy as np

A100_EST_IMG_PER_S = 2.0
PROMPT_TEXT_TOKENS = 64
DECODE_TOKENS = int(__import__("os").environ.get("BENCH_DECODE_TOKENS", 16))
# default batch per (quant, kv) mode: best measured point on a 16 GB v5e
# with the single-buffered S-major decode (int8 weighs 7.7 GiB on device,
# NF4 4.4 GiB — NF4's freed HBM goes to batch; the int8 KV cache halves the
# cache footprint, buying more batch: int8 peak 20-22, NF4 peak 28)
DEFAULT_BATCH = {("int8", None): 14, ("nf4", None): 22,
                 ("int8", "int8"): 20, ("nf4", "int8"): 28}
QUANT_MODES = ("nf4", "int8")   # tried in order; int8 compiles lighter


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_llava7b_params(quant_mode: str, cfg=None):
    """Random-weight LLaVA-1.5-7B params with a quantized LLM (int8 or nf4).

    Staged init: each stacked weight is created+quantized in its own jit call
    so bf16 and quantized copies never coexist on the 16 GB chip.  Shared by
    bench.py and scripts/decode_probe.py.
    """
    import jax
    import jax.numpy as jnp

    from cullavo_tpu.models.llava.config import LlavaConfig

    if cfg is None:
        cfg = LlavaConfig()
    t0 = time.time()
    from cullavo_tpu.models.llava.config import LlamaConfig

    tc: LlamaConfig = cfg.text
    L, D, I = tc.num_hidden_layers, tc.hidden_size, tc.intermediate_size
    H, KV, hd = tc.num_attention_heads, tc.num_key_value_heads, tc.head_dim
    shapes = {"q": (L, D, H * hd), "k": (L, D, KV * hd), "v": (L, D, KV * hd),
              "o": (L, H * hd, D), "gate": (L, D, I), "up": (L, D, I),
              "down": (L, I, D)}

    from cullavo_tpu.ops.nf4 import quantize_linear_int8

    layers = {}
    for i, (name, shape) in enumerate(shapes.items()):
        if quant_mode == "nf4":
            if __import__("os").environ.get("BENCH_NF4_HOST_QUANT"):
                # host quantize with the C++ core (the production path:
                # imported weights start on host) + one device_put of the
                # 4-bit stream.  NOT the default: the tunnel upload of the
                # packed stream can crawl at ~1 MB/s (measured 235 s for one
                # [32,4096,4096] weight), and weight VALUES don't affect a
                # throughput bench.
                from cullavo_tpu.native import nf4_quantize_planar_native

                host_rng = np.random.default_rng(i)
                n_el = int(np.prod(shape))
                block = (host_rng.standard_normal(1 << 20, dtype=np.float32)
                         * (shape[-2] ** -0.5))
                w = np.tile(block, n_el // (1 << 20) + 1)[:n_el].reshape(shape)
                t_q = time.time()
                q = nf4_quantize_planar_native(w)
                del w
                layers[name] = jax.device_put(jax.tree.map(jnp.asarray, q))
                jax.block_until_ready(layers[name])
                log(f"  {name}: quantize+upload {time.time()-t_q:.1f}s")
            else:
                # synthesize the planar NF4 dict directly on device: random
                # packed nibbles + positive block scales — same memory layout
                # and kernel path as real quantized weights, seconds to build
                from cullavo_tpu.ops.nf4 import synthetic_planar_nf4

                fn = jax.jit(lambda k, s=shape: synthetic_planar_nf4(*s, k))
                layers[name] = jax.block_until_ready(fn(jax.random.PRNGKey(i)))
        else:
            os_mod = __import__("os")
            layout = os_mod.environ.get("BENCH_INT8_LAYOUT", "kn")
            # activation-quant calibration mode for the s8s8 prefill path
            # (synthetic values — the COST is what the bench must price):
            #   smooth (default): SmoothQuant per-channel migration scales
            #   outliers: LLM.int8 static outlier channels (o_w side-matmul)
            #   static: smooth + static per-tensor activation scale (W8A8
            #           static serving — skips the per-token absmax reduce)
            #   none: plain per-token quant / exact convert-in-dot only
            calib = os_mod.environ.get("BENCH_INT8_CALIB", "smooth")
            o_idx = sm = sa = None
            if layout == "kn" and calib == "outliers":
                n_out = int(os_mod.environ.get("BENCH_INT8_OUTLIERS", 64))
                o_idx = np.random.default_rng(1234).permutation(
                    shape[-2])[:n_out]
            elif layout == "kn" and calib in ("smooth", "static"):
                sm = np.exp(np.random.default_rng(1234).normal(
                    0.0, 0.3, shape[-2])).astype(np.float32)
                if calib == "static":
                    # plausible smoothed-activation absmax for a synthetic
                    # workload (the COST is what the bench prices)
                    sa = np.full((shape[0],), 4.0 / 127.0, np.float32)
            fn = jax.jit(lambda k, s=shape: quantize_linear_int8(
                (jax.random.normal(k, s) * (s[-2] ** -0.5)).astype(jnp.bfloat16),
                layout=layout, outlier_idx=o_idx, smooth_scale=sm,
                act_scale=sa))
            layers[name] = jax.block_until_ready(fn(jax.random.PRNGKey(i)))
    layers["input_ln"] = jnp.ones((L, D), jnp.bfloat16)
    layers["post_ln"] = jnp.ones((L, D), jnp.bfloat16)
    log(f"quant mode: {quant_mode}")

    from cullavo_tpu.models.llava.clip_vit import init_clip_vision_params

    small = jax.jit(lambda k: {
        "vision_tower": init_clip_vision_params(cfg.vision, k, jnp.bfloat16),
        "projector": {
            "linear_1": {"kernel": jax.random.normal(k, (cfg.vision.hidden_size, D)).astype(jnp.bfloat16) * 0.02,
                         "bias": jnp.zeros((D,), jnp.bfloat16)},
            "linear_2": {"kernel": jax.random.normal(k, (D, D)).astype(jnp.bfloat16) * 0.02,
                         "bias": jnp.zeros((D,), jnp.bfloat16)},
        },
        "embed_tokens": (jax.random.normal(k, (tc.vocab_size, D)) * 0.02).astype(jnp.bfloat16),
        "lm_head": (jax.random.normal(k, (D, tc.vocab_size)) * 0.02).astype(jnp.bfloat16),
        "norm": jnp.ones((D,), jnp.bfloat16),
    })(jax.random.PRNGKey(99))
    small = jax.block_until_ready(small)
    params = {
        "vision_tower": small["vision_tower"],
        "projector": small["projector"],
        "language_model": {"embed_tokens": small["embed_tokens"],
                           "lm_head": small["lm_head"], "norm": small["norm"],
                           "layers": layers},
    }
    if (quant_mode == "int8" and __import__("os").environ.get(
            "BENCH_VISION_INT8", "0") == "1"):
        # bnb load_in_8bit quantizes the vision tower too (skip list is
        # only projector+lm_head).  Default OFF: measured 13.93 vs 14.52
        # img/s (kv-int8 b20) — CLIP-L matmuls are too small for W8A8, the
        # activation-quant passes dominate; int8 storage remains available
        # for memory-constrained configs / reference-fidelity runs
        from cullavo_tpu.models.llava.lora import (VISION_TARGETS,
                                                   quantize_vision_weights)

        vl = params["vision_tower"]["layers"]
        vsm = {t: np.exp(np.random.default_rng(77).normal(
            0.0, 0.3, vl[t].shape[-2])).astype(np.float32)
            for t in VISION_TARGETS}
        # jit ONLY the vision subtree: passing the whole params tree through
        # one jit returns fresh buffers for every leaf (no donation) — a
        # transient second ~7 GiB copy of the int8 LLM on a 16 GiB chip
        vt = jax.block_until_ready(jax.jit(
            lambda v: quantize_vision_weights(
                {"vision_tower": v}, smooth_scales=vsm)["vision_tower"])(
                    params["vision_tower"]))
        params = {**params, "vision_tower": vt}
    n_params = sum(int(np.prod(a.shape)) for a in jax.tree.leaves(params))
    log(f"leaves hold {n_params/1e9:.2f}B elements in {time.time()-t0:.1f}s")
    return params


def run_quant_mode(quant_mode: str, kv_quant: Optional[str] = None,
                   spec_k: Optional[int] = None) -> dict:
    """Measure one quant mode end-to-end; returns the result dict."""
    import os

    import jax
    import jax.numpy as jnp

    from cullavo_tpu.models.llava.config import LlavaConfig
    from cullavo_tpu.models.llava.modeling import (GenerationConfig,
                                                   generate_decode,
                                                   generate_prefill_chunked)

    cfg = LlavaConfig()
    log("device:", jax.devices()[0], f"building 7B params ({quant_mode})...")
    params = build_llava7b_params(quant_mode, cfg)

    kv_quant = kv_quant if kv_quant is not None else (
        os.environ.get("BENCH_KV") or None)
    B = int(os.environ.get("BENCH_BATCH",
                           DEFAULT_BATCH[(quant_mode, kv_quant)]))
    n_img = cfg.num_image_tokens
    T = 1 + n_img + PROMPT_TEXT_TOKENS
    # BENCH_PROMPT_PAD=<mult>: right-pad the prompt to a multiple of <mult>
    # with attention_mask zeros (the padded-batch decode contract) — the
    # workload stays 641 real tokens, but every prefill intermediate gets
    # a sublane-aligned M (641 is prime: [14, 641]-shaped reduces tile as
    # awkward (1, 81, 11) windows in XLA's loop emitter, prefill_hlo.txt)
    # default 8: prompt rows pad 641 → 648 (sublane-aligned M; token-exact
    # per the padded-prompt CPU equality check + padded-batch decode tests;
    # measured 16.02 vs 15.61 img/s).  The VQA pipeline's own buckets are
    # 64-multiples, so its production prompts are already aligned.
    pad_mult = int(os.environ.get("BENCH_PROMPT_PAD", 8))
    T_padded = -(-T // pad_mult) * pad_mult
    max_len = T_padded + DECODE_TOKENS
    rng = np.random.default_rng(0)
    ids = rng.integers(4, 32000, size=(B, T_padded)).astype(np.int32)
    ids[:, 1:1 + n_img] = cfg.image_token_id
    mask = np.ones_like(ids)
    mask[:, T:] = 0
    pix = rng.normal(size=(B, 3, 336, 336)).astype(np.float32)

    gen = GenerationConfig(max_new_tokens=DECODE_TOKENS, do_sample=False,
                           eos_token_id=-1)
    jids, jpix, jmask = jnp.asarray(ids), jnp.asarray(pix), jnp.asarray(mask)

    # chunked prefill: prefill CHUNK rows at a time into one merged cache,
    # decode the full batch once — the per-step weight-stream dequant is
    # batch-independent, so a big decode batch amortizes it (the NF4 lever)
    chunk = int(os.environ.get("BENCH_PREFILL_CHUNK", B))
    # BENCH_SPEC_K=<k>: greedy prompt-lookup speculative decode (realistic
    # non-oracle corpus — the prompt itself; random weights give arbitrary
    # acceptance, so this prices the window-verify overhead floor on the
    # decode-phase weight stream, the regime spec attacks at NF4)
    spec_k = int(os.environ.get("BENCH_SPEC_K", 0)) if spec_k is None else spec_k
    if spec_k:
        from cullavo_tpu.models.llava.modeling import generate_decode_spec
        from cullavo_tpu.models.llava.llama import round_cache_len
        max_len = round_cache_len(T_padded + DECODE_TOKENS + spec_k)
        plen = jnp.sum(jnp.asarray(mask), axis=1)

    spec_stats = {}

    def run():
        state = generate_prefill_chunked(params, cfg, jids, jpix, jmask,
                                         max_len, chunk,
                                         compute_dtype=jnp.bfloat16,
                                         kv_quant=kv_quant)
        # return_state=True lets the donated prefill cache alias the output
        # cache (in-place decode; one cache-sized buffer instead of two)
        if spec_k:
            out, stats, _ = generate_decode_spec(params, cfg, state, gen,
                                                 spec_k, jids, plen,
                                                 compute_dtype=jnp.bfloat16,
                                                 return_state=True)
            # honest acceptance accounting: random-weight greedy streams are
            # often degenerate/repetitive, which INFLATES prompt-lookup
            # acceptance — tokens/forward must be quoted next to the number
            st = jax.device_get(stats)
            # emitted counts tokens over ALL rows INCLUDING each row's
            # prefill-sampled first token, which no window produced
            # (generate_decode_spec docstring) — subtract B before dividing
            # by the batched window count; per-row tokens/forward is the
            # break-even-comparable number (wwin break-even ~1.26)
            spec_stats["tokens_per_forward"] = round(
                (float(st["emitted"]) - B)
                / max(float(st["windows"]) * B, 1.0), 3)
        else:
            out, _ = generate_decode(params, cfg, state, gen,
                                     compute_dtype=jnp.bfloat16,
                                     return_state=True)
        return np.asarray(out)  # host transfer = true completion barrier

    log("compiling prefill...")
    t0 = time.time()
    first = run()
    log(f"compile+first run: {time.time()-t0:.1f}s tokens[:4]={first[0,:4].tolist()}")

    lat = []
    for _ in range(8):
        t0 = time.time()
        run()
        lat.append(time.time() - t0)
    lat = np.asarray(lat)
    p50 = float(np.percentile(lat, 50))
    imgs_per_s = B / p50

    return {
        "metric": "llava7b_vqa_images_per_sec_per_chip",
        "value": round(imgs_per_s, 4),
        "unit": "images/s",
        "vs_baseline": round(imgs_per_s / A100_EST_IMG_PER_S, 4),
        "p50_latency_s": round(p50, 4),
        "decode_tokens": DECODE_TOKENS,
        "prompt_tokens": int(T),
        "batch": B,
        "prefill_chunk": chunk,
        "quant": quant_mode,
        "kv_quant": kv_quant or "bf16",
        "params_b": 7.06,
        **({"spec_k": spec_k, **{f"spec_{k}": v for k, v in spec_stats.items()}}
           if spec_k else {}),
    }


def main():
    import os

    import jax

    # persistent compilation cache: the 7B prefill/decode programs take
    # minutes to compile through the axon AOT helper; cache across runs
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/cullavo_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    # Default: measure BOTH storage modes — int8 (the reference's load_in_8bit
    # eval mode, the headline) and NF4 (the reference's Q-LoRA storage mode,
    # load_cullavo.py:65-83) — and emit one JSON line headlined by int8 with
    # the NF4 numbers as secondary keys.  BENCH_QUANT=int8|nf4 restricts to
    # one mode (and headlines it).
    want = os.environ.get("BENCH_QUANT", "both")
    if want in ("int8", "nf4"):
        print(json.dumps(run_quant_mode(want)))
        return
    res = {}
    serving = None
    # three measurements: the headline (int8 weights + SmoothQuant-calibrated
    # s8s8 prefill — the same W8A8 numerics class as the reference's
    # load_in_8bit / bitsandbytes Linear8bitLt eval mode; BENCH_INT8_CALIB=
    # none reverts to the exact bf16 convert-in-dot path), NF4 (the
    # reference's Q-LoRA storage mode), and the int8-KV serving config
    # (quantized decode cache: near-lossless for 16-token greedy decode but
    # not bit-exact, so it stays a secondary key)
    modes = [("int8", "int8", None, None), ("nf4", "nf4", None, None),
             ("kv_int8", "int8", "int8", None)]
    if os.environ.get("BENCH_SPEC_MODES", "1") == "1":
        # speculative-window secondary numbers (round 4: wwin kernel + spec
        # wins — int8 16.09→17.92, NF4 9.80→11.13 same-day).  The headline
        # stays the PLAIN config: spec is greedy-exact at f32 but bf16
        # near-tie argmaxes can flip tokens between the W-window and T=1
        # forwards, so it does not carry the bit-faithfulness claim.
        modes += [("int8_spec", "int8", None, 4), ("nf4_spec", "nf4", None, 4)]
    for name, quant, kv, sk in modes:
        # one mode crashing (tunnel wedge / OOM) must not lose the others'
        # numbers — the driver records exactly one JSON line per round
        try:
            res[name] = run_quant_mode(quant, kv_quant=kv, spec_k=sk)
        except Exception as e:  # noqa: BLE001
            log(f"bench mode {name} FAILED: {type(e).__name__}: {e}")
    if not res:
        raise SystemExit("all bench modes failed")
    # 4th measurement (secondary keys): continuous-batching serving
    # throughput — int8 weights, variable decode budgets (the regime the
    # engine exists for).  LAST so a failure never costs the quant numbers;
    # BENCH_SERVE=0 skips it.
    if os.environ.get("BENCH_SERVE", "1") == "1":
        try:
            from cullavo_tpu.models.llava.config import LlavaConfig
            from cullavo_tpu.serving.benchmark import (measure_serving,
                                                       synth_requests)

            cfg = LlavaConfig()
            params = build_llava7b_params("int8", cfg)
            # best measured serving point (STATUS r4): 16 slots + int8 KV
            # cache + spec_k=4 prompt-lookup windows through the wwin
            # flash-decode kernel — same-day A/B: 7.28 req/s vs 6.62
            # (spec, unfused XLA windows) vs 5.19 (plain);
            # BENCH_SERVE_SPEC_K=0 reverts to plain quanta
            # open-loop offered-rate sweep (VERDICT r4: one saturated point
            # measures drain, not steady state): 3 points bracketing the
            # knee; serving_knee_req_s = highest sustained offered rate.
            # BENCH_SERVE_SWEEP="" skips; reps default 5 (r4: 3 reps left a
            # 31% band on a degraded-tunnel day).
            sweep_env = os.environ.get("BENCH_SERVE_SWEEP", "4,6,8")
            serving = measure_serving(
                params, cfg,
                synth_requests(cfg, int(os.environ.get("BENCH_SERVE_N", 48))),
                slots=int(os.environ.get("BENCH_SERVE_SLOTS", 16)),
                kv_quant=os.environ.get("BENCH_SERVE_KV", "int8") or None,
                reps=int(os.environ.get("BENCH_SERVE_REPS", 5)),
                arrival_rate=float(os.environ.get("BENCH_SERVE_RATE", 6)),
                spec_k=int(os.environ.get("BENCH_SERVE_SPEC_K", 4)) or None,
                sweep_rates=[float(x) for x in sweep_env.split(",") if x]
                or None)
            # prefix-KV reuse A/B on the REALISTIC corpus (shared system
            # prompt + VQAv2-style ~3 questions/image): same requests, engine
            # prefix registry on vs off.  BENCH_SERVE_PREFIX=0 skips.
            if os.environ.get("BENCH_SERVE_PREFIX", "1") == "1":
                preq = synth_requests(
                    cfg, int(os.environ.get("BENCH_SERVE_N", 48)),
                    shared_sys_tokens=32, questions_per_image=3, seed=1)
                for tag, pc in (("prefix_on", True), ("prefix_off", False)):
                    serving[tag] = measure_serving(
                        params, cfg, preq,
                        slots=int(os.environ.get("BENCH_SERVE_SLOTS", 16)),
                        kv_quant=os.environ.get("BENCH_SERVE_KV", "int8")
                        or None,
                        reps=3,   # secondary A/B — bounded bench wall time
                        spec_k=int(os.environ.get("BENCH_SERVE_SPEC_K", 4))
                        or None, prefix_cache=pc)
            del params
            log(f"serving: {serving}")
        except Exception as e:  # noqa: BLE001
            log(f"bench mode serving FAILED: {type(e).__name__}: {e}")
    # headline preference order; fall back to ANY surviving mode so a
    # partial-failure run still emits its measured numbers (the per-mode
    # try/except contract)
    line = next((res[n] for n in ("int8", "kv_int8", "nf4", "int8_spec",
                                  "nf4_spec") if n in res),
                None) or next(iter(res.values()))
    for name in ("int8_spec", "nf4_spec"):
        if name in res and line is not res[name]:
            line[f"{name}_images_per_s"] = res[name]["value"]
            if "spec_tokens_per_forward" in res[name]:
                line[f"{name}_tokens_per_forward"] = (
                    res[name]["spec_tokens_per_forward"])
    for name in ("nf4", "kv_int8"):
        if name in res and line is not res[name]:
            line.update({
                f"{name}_images_per_s": res[name]["value"],
                f"{name}_vs_baseline": res[name]["vs_baseline"],
                f"{name}_batch": res[name]["batch"],
                f"{name}_p50_latency_s": res[name]["p50_latency_s"],
            })
    if serving:
        line.update({"serving_requests_per_s": serving["requests_per_s"],
                     "serving_requests_per_s_band":
                         serving["requests_per_s_band"],
                     "serving_reps": serving["reps"],
                     "serving_tokens_per_s": serving["useful_tokens_per_s"],
                     "serving_slots": serving["slots"],
                     "serving_kv": serving["kv_quant"]})
        ol = serving.get("open_loop")
        if ol:
            lat = ol.get("latency") or {}
            line.update({"serving_open_loop_offered_req_s": ol["offered_req_s"],
                         "serving_open_loop_achieved_req_s":
                             ol["achieved_req_s"],
                         "serving_open_loop_ttft_p50_s":
                             (lat.get("ttft") or {}).get("p50"),
                         "serving_open_loop_ttft_p95_s":
                             (lat.get("ttft") or {}).get("p95")})
        sw = serving.get("open_loop_sweep")
        if sw:
            line["serving_knee_req_s"] = sw["max_sustainable_req_s"]
            line["serving_max_achieved_req_s"] = sw["max_achieved_req_s"]
            line["serving_sweep"] = [
                {"offered": p["offered_req_s"], "achieved": p["achieved_req_s"],
                 "ttft_p95_s": (p["latency"].get("ttft") or {}).get("p95"),
                 "e2e_p95_s": (p["latency"].get("e2e") or {}).get("p95"),
                 "sustained": p["sustained"]} for p in sw["points"]]
        for tag in ("prefix_on", "prefix_off"):
            pr = serving.get(tag)
            if pr:
                line[f"serving_{tag}_req_s"] = pr["requests_per_s"]
                line[f"serving_{tag}_band"] = pr["requests_per_s_band"]
                if tag == "prefix_on":
                    line["serving_prefix_tokens_saved"] = (
                        pr.get("scheduler") or {}).get("prefix_tokens_saved")
    # realistic spec acceptance (host-side, model-free — serving/spec_corpus):
    # the defensible tokens/forward on the deployment text distribution,
    # replacing the random-weight synthetic stat as the default's basis
    if os.environ.get("BENCH_SPEC_CORPUS", "1") == "1":
        try:
            from cullavo_tpu.serving.spec_corpus import step1_acceptance

            line["spec_acceptance_corpus"] = step1_acceptance(
                spec_k=int(os.environ.get("BENCH_SERVE_SPEC_K", 4)) or 4,
                n_samples=32)
        except Exception as e:  # noqa: BLE001
            log(f"spec corpus acceptance FAILED: {type(e).__name__}: {e}")
    print(json.dumps(line))


if __name__ == "__main__":
    main()
