"""Dump the compiled (post-optimization) HLO of the 7B int8 prefill and
print the named fusions — used to diagnose why specific fusions run far
off the HBM roofline (e.g. the activation-quant abs_reduce chain).

Env: HLO_MATCH (substring filter, default 'abs'), BENCH_* as bench.py.
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import DEFAULT_BATCH, PROMPT_TEXT_TOKENS, build_llava7b_params
    from cullavo_tpu.models.llava.config import LlavaConfig
    from cullavo_tpu.models.llava.modeling import generate_prefill_chunked

    cfg = LlavaConfig()
    params = build_llava7b_params("int8", cfg)
    B = int(os.environ.get("BENCH_BATCH", DEFAULT_BATCH[("int8", None)]))
    n_img = cfg.num_image_tokens
    T = 1 + n_img + PROMPT_TEXT_TOKENS
    max_len = T + 16
    rng = np.random.default_rng(0)
    ids = rng.integers(4, 32000, size=(B, T)).astype(np.int32)
    ids[:, 1:1 + n_img] = cfg.image_token_id
    pix = rng.normal(size=(B, 3, 336, 336)).astype(np.float32)
    jids, jpix = jnp.asarray(ids), jnp.asarray(pix)
    jmask = jnp.ones_like(jids)

    fn = jax.jit(lambda p, i, x, m: generate_prefill_chunked(
        p, cfg, i, x, m, max_len, B, compute_dtype=jnp.bfloat16))
    lowered = fn.lower(params, jids, jpix, jmask)
    compiled = lowered.compile()
    txt = compiled.as_text()
    out = os.environ.get("HLO_OUT", "/tmp/prefill_hlo.txt")
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {out}", file=sys.stderr)
    match = os.environ.get("HLO_MATCH", "abs")
    # print computations whose name matches
    blocks = re.split(r"\n(?=%?\w[\w.\-]* \{| *ENTRY )", txt)
    hits = [b for b in blocks if match in b.split("{")[0]]
    print(f"{len(hits)} computations matching {match!r}", file=sys.stderr)
    for b in hits[:6]:
        print(b[:4000])
        print("=" * 70)


if __name__ == "__main__":
    main()
