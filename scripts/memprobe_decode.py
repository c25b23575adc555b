"""Decode-only AOT memory analysis at an arbitrary batch (no prefill compile).

At a batch too big to fit, the TPU compiler's OOM report names the ops holding
the largest temps — the tool for hunting stray cache copies in the decode
program.
"""
import os
import sys


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/cullavo_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import PROMPT_TEXT_TOKENS, build_llava7b_params

    from cullavo_tpu.models.llava.config import LlavaConfig
    from cullavo_tpu.models.llava.modeling import (GenerationConfig,
                                                   generate_decode)

    quant = os.environ.get("BENCH_QUANT", "nf4")
    B = int(os.environ.get("BENCH_BATCH", 32))
    decode_tokens = int(os.environ.get("BENCH_DECODE_TOKENS", 16))

    cfg = LlavaConfig()
    params = build_llava7b_params(quant, cfg)
    tc = cfg.text
    L, KV, hd = tc.num_hidden_layers, tc.num_key_value_heads, tc.head_dim
    n_img = cfg.num_image_tokens
    T = 1 + n_img + PROMPT_TEXT_TOKENS
    max_len = T + decode_tokens

    st = {
        "logits": jax.ShapeDtypeStruct((B, tc.vocab_size), jnp.float32),
        "cache": {"k": jax.ShapeDtypeStruct((L, max_len, B, KV, hd), jnp.bfloat16),
                  "v": jax.ShapeDtypeStruct((L, max_len, B, KV, hd), jnp.bfloat16)},
        "full_mask": jax.ShapeDtypeStruct((B, max_len), jnp.int32),
        "key_pos": jax.ShapeDtypeStruct((B, max_len), jnp.int32),
        "cur_pos": jax.ShapeDtypeStruct((B,), jnp.int32),
        "write_idx": jax.ShapeDtypeStruct((), jnp.int32),
    }
    gen = GenerationConfig(max_new_tokens=decode_tokens, do_sample=False,
                           eos_token_id=-1)
    log(f"compiling decode at B={B} quant={quant}...")
    dec = generate_decode.lower(params, cfg, st, gen,
                                compute_dtype=jnp.bfloat16,
                                return_state=True).compile()
    m = dec.memory_analysis()
    log(f"[decode B={B}] args={m.argument_size_in_bytes/2**30:.2f}G "
        f"out={m.output_size_in_bytes/2**30:.2f}G "
        f"temp={m.temp_size_in_bytes/2**30:.2f}G "
        f"alias={m.alias_size_in_bytes/2**30:.2f}G")


if __name__ == "__main__":
    main()
