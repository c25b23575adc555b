"""Profile one 7B prefill+decode step and print the top HLO ops by device
time (jax.profiler trace → parse the trace.json.gz ourselves — no
TensorBoard in this environment).

Env: TRACE_QUANT (int8|nf4, default int8), BENCH_* as in bench.py.
Writes the trace under /tmp/jaxtrace and prints a JSON summary.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import DEFAULT_BATCH, PROMPT_TEXT_TOKENS, build_llava7b_params
    from cullavo_tpu.models.llava.config import LlavaConfig
    from cullavo_tpu.models.llava.modeling import (GenerationConfig,
                                                   generate_decode,
                                                   generate_prefill_chunked)

    quant = os.environ.get("TRACE_QUANT", "int8")
    cfg = LlavaConfig()
    params = build_llava7b_params(quant, cfg)
    B = int(os.environ.get("BENCH_BATCH", DEFAULT_BATCH[(quant, None)]))
    n_img = cfg.num_image_tokens
    T = 1 + n_img + PROMPT_TEXT_TOKENS
    # mirror bench.py's BENCH_PROMPT_PAD sublane alignment (default 8)
    pad_mult = int(os.environ.get("BENCH_PROMPT_PAD", 8))
    T_padded = -(-T // pad_mult) * pad_mult
    max_len = T_padded + 16
    rng = np.random.default_rng(0)
    ids = rng.integers(4, 32000, size=(B, T_padded)).astype(np.int32)
    ids[:, 1:1 + n_img] = cfg.image_token_id
    pix = rng.normal(size=(B, 3, 336, 336)).astype(np.float32)
    gen = GenerationConfig(max_new_tokens=16, do_sample=False, eos_token_id=-1)
    jids, jpix = jnp.asarray(ids), jnp.asarray(pix)
    jmask = jnp.ones_like(jids)
    jmask = jmask.at[:, T:].set(0)

    def run():
        state = generate_prefill_chunked(params, cfg, jids, jpix, jmask,
                                         max_len, B,
                                         compute_dtype=jnp.bfloat16)
        out, _ = generate_decode(params, cfg, state, gen,
                                 compute_dtype=jnp.bfloat16,
                                 return_state=True)
        return np.asarray(out)

    print("compiling...", file=sys.stderr)
    run()
    t0 = time.time()
    run()
    print(f"steady-state: {time.time()-t0:.3f}s", file=sys.stderr)

    from _trace_util import trace_and_top_ops

    print(json.dumps(trace_and_top_ops(run), indent=1))


if __name__ == "__main__":
    main()
