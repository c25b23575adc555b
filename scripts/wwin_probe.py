"""W-window decode forward: where do the 15 ms go, and does static layer
indexing recover them?

The speculative verification forward (W tokens vs the stale S-major cache)
measures ~34-37 ms at 7B-ish shapes vs 19.8 ms for T=1 — the trace blames
per-layer cache k/v slice COPIES (a dynamic-slice feeding an MXU dot can't
fuse; W=1's VPU reduction can).  This probe times three layer-loop variants
over a synthetic 7B-shaped cache to pick the cheapest structure:

  scan    — lax.scan over layers, cache sliced with the traced index
            (the current model path)
  xs      — cache fed as scan xs (scan does the slicing)
  unroll  — python loop, STATIC slice index per layer

Env: WW_B (batch, 16), WW_S (cache slots, 640), WW_W (window, 4),
WW_L (layers, 32), WW_REPS (30).
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cullavo_tpu.models.llava.llama import sdpa_decode_stale_smajor  # noqa: E402

B = int(os.environ.get("WW_B", 16))
S = int(os.environ.get("WW_S", 640))
W = int(os.environ.get("WW_W", 4))
L = int(os.environ.get("WW_L", 32))
KV = H = 32
HD = 128
REPS = int(os.environ.get("WW_REPS", 30))

key = jax.random.PRNGKey(0)
kc = jax.random.normal(key, (L, S, B, KV, HD), jnp.bfloat16)
vc = jax.random.normal(key, (L, S, B, KV, HD), jnp.bfloat16)
q = jax.random.normal(key, (B, H, W, HD), jnp.bfloat16)
k_cur = jax.random.normal(key, (B, H, W, HD), jnp.bfloat16)
v_cur = jax.random.normal(key, (B, H, W, HD), jnp.bfloat16)
bias = jnp.zeros((B, 1, W, S), jnp.float32)


def body(kl, vl, x):
    return sdpa_decode_stale_smajor(x, kl, vl, k_cur, v_cur, bias)


@jax.jit
def run_scan(kc, vc, q):
    def layer(x, li):
        return body(kc[li], vc[li], x), None
    out, _ = jax.lax.scan(layer, q, jnp.arange(L))
    return out


@jax.jit
def run_xs(kc, vc, q):
    def layer(x, kv):
        kl, vl = kv
        return body(kl, vl, x), None
    out, _ = jax.lax.scan(layer, q, (kc, vc))
    return out


@jax.jit
def run_unroll(kc, vc, q):
    x = q
    for li in range(L):
        x = body(kc[li], vc[li], x)
    return x


def bench(fn, name):
    t0 = time.perf_counter()
    out = fn(kc, vc, q)
    _ = jax.device_get(out[0, 0, 0, :1])
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(kc, vc, q)
        _ = jax.device_get(out[0, 0, 0, :1])
        times.append((time.perf_counter() - t0) * 1e3)
    med = float(np.median(times))
    print(f"{name:8s} W={W} B={B} S={S} L={L}: {med:7.2f} ms/forward "
          f"(compile {compile_s:.1f}s)")
    return med


from cullavo_tpu.ops.wwin_decode import wwin_decode_smajor  # noqa: E402

BS = int(os.environ.get("WW_BLOCK_S", 128))


@jax.jit
def run_flash(kc, vc, q):
    def layer(x, li):
        return wwin_decode_smajor(x, kc, vc, li, k_cur, v_cur, bias,
                                  block_s=BS), None
    out, _ = jax.lax.scan(layer, q, jnp.arange(L))
    return out


print("devices:", jax.devices())
res = {}
for nm, fn in (("scan", run_scan), ("xs", run_xs), ("unroll", run_unroll),
               ("flash", run_flash)):
    if os.environ.get("WW_ONLY") and os.environ["WW_ONLY"] != nm:
        continue
    res[nm] = bench(fn, nm)

if "scan" in res and "flash" in res:
    a = np.asarray(run_scan(kc, vc, q), jnp.float32)
    b = np.asarray(run_flash(kc, vc, q), jnp.float32)
    print("max |flash - scan| over 32 layers:", float(np.max(np.abs(a - b))))
