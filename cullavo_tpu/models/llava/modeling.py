"""LLaVA-1.5 multimodal model: vision tower + projector + LLaMA, token merge,
masked-CE training loss, and KV-cache greedy/sampled generation.

Capability parity targets (fresh implementation, not a port):
  * ``<image>`` token expansion into 576 patch embeddings and the prompt/label
    bookkeeping around it — reference: HF ``_merge_input_ids_with_image_features``
    as used by cullavo/arch_cullavo.py:577-604 and the +575 label offset at
    arch_cullavo.py:37.
  * shifted cross-entropy masked by attention mask — arch_cullavo.py:646-665.
  * greedy / (temperature, top-k, top-p) sampled decode with KV cache —
    arch_cullavo.py:355-366 generate calls.

TPU-first: generation runs as one jitted ``lax.while_loop`` over a
preallocated cache (static shapes); the merge is a vectorized scatter, not a
per-sample Python loop.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp

from cullavo_tpu.models.llava import llama
from cullavo_tpu.models.llava.clip_vit import clip_vision_forward, init_clip_vision_params
from cullavo_tpu.models.llava.config import LlavaConfig
from cullavo_tpu.models.llava.llama import (init_llama_params, init_kv_cache,
                                            llama_forward, lm_logits)

Params = Any


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_llava_params(cfg: LlavaConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    Dv, Dt = cfg.vision.hidden_size, cfg.text.hidden_size
    return {
        "vision_tower": init_clip_vision_params(cfg.vision, k1, dtype),
        "projector": {
            "linear_1": {"kernel": (jax.random.normal(k2, (Dv, Dt)) * Dv ** -0.5).astype(dtype),
                         "bias": jnp.zeros((Dt,), dtype)},
            "linear_2": {"kernel": (jax.random.normal(k3, (Dt, Dt)) * Dt ** -0.5).astype(dtype),
                         "bias": jnp.zeros((Dt,), dtype)},
        },
        "language_model": init_llama_params(cfg.text, key, dtype),
    }


# ---------------------------------------------------------------------------
# vision features
# ---------------------------------------------------------------------------

def image_features(params: Params, cfg: LlavaConfig, pixel_values: jax.Array,
                   lora: Optional[dict] = None, lora_scaling: float = 0.0,
                   remat: bool = False) -> jax.Array:
    """[B, 3, H, W] → [B, num_image_tokens, D_text]."""
    hidden = clip_vision_forward(params["vision_tower"], cfg.vision, pixel_values,
                                 cfg.vision_feature_layer,
                                 lora=(lora or {}).get("vision_tower"),
                                 lora_scaling=lora_scaling, remat=remat)
    if cfg.vision_feature_select_strategy == "default":
        hidden = hidden[:, 1:]  # drop CLS
    proj = params["projector"]
    x = hidden @ proj["linear_1"]["kernel"] + proj["linear_1"]["bias"]
    x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)
    return x @ proj["linear_2"]["kernel"] + proj["linear_2"]["bias"]


# ---------------------------------------------------------------------------
# token merge
# ---------------------------------------------------------------------------

def merge_image_features(
    cfg: LlavaConfig,
    input_ids: jax.Array,        # [B, T] — with image positions already expanded
    inputs_embeds: jax.Array,    # [B, T, D] — text embeddings (image slots arbitrary)
    feats: jax.Array,            # [B, N, D]
) -> jax.Array:
    """Place image features at the ``image_token_id`` positions of each row.

    Assumes each row contains exactly N image-token slots (enforced by the
    prompt builder); positions may differ per row.  Vectorized scatter: for
    each row, the k-th image slot (in sequence order) receives ``feats[b, k]``.
    """
    B, T, D = inputs_embeds.shape
    is_img = input_ids == cfg.image_token_id                     # [B, T]
    # rank of each image slot within its row
    slot_rank = jnp.cumsum(is_img, axis=1) - 1                   # [B, T]
    slot_rank = jnp.clip(slot_rank, 0, feats.shape[1] - 1)
    gathered = jnp.take_along_axis(feats, slot_rank[..., None], axis=1)  # [B, T, D]
    return jnp.where(is_img[..., None], gathered.astype(inputs_embeds.dtype), inputs_embeds)


def expand_image_token(input_ids, attention_mask, labels, image_token_id: int,
                       num_image_tokens: int, ignore_index: int = -100):
    """Host-side helper (numpy) that expands a single ``<image>`` token into
    ``num_image_tokens`` positions — reproduces the +575 label-offset behavior
    of the reference prompt builder (arch_cullavo.py:28-39).  Operates on 1-D
    python/numpy sequences; used by the data pipeline, not inside jit.
    """
    import numpy as np
    out_ids, out_mask, out_labels = [], [], []
    for i, tok in enumerate(np.asarray(input_ids).tolist()):
        if tok == image_token_id:
            out_ids.extend([image_token_id] * num_image_tokens)
            out_mask.extend([1] * num_image_tokens)
            out_labels.extend([ignore_index] * num_image_tokens)
        else:
            out_ids.append(tok)
            out_mask.append(int(np.asarray(attention_mask)[i]) if attention_mask is not None else 1)
            out_labels.append(int(np.asarray(labels)[i]) if labels is not None else ignore_index)
    return (np.array(out_ids, np.int32), np.array(out_mask, np.int32),
            np.array(out_labels, np.int32))


# ---------------------------------------------------------------------------
# forward + loss
# ---------------------------------------------------------------------------

def llava_forward(
    params: Params,
    cfg: LlavaConfig,
    input_ids: jax.Array,           # [B, T] image tokens pre-expanded
    pixel_values: Optional[jax.Array],
    attention_mask: jax.Array,      # [B, T]
    position_ids: Optional[jax.Array] = None,
    cache: Optional[dict] = None,
    cache_index: Optional[jax.Array] = None,
    full_attention_mask: Optional[jax.Array] = None,  # [B, max_len] when cached
    key_position_ids: Optional[jax.Array] = None,     # [B, max_len] when cached
    lora: Optional[dict] = None,
    lora_scaling: float = 0.0,
    lora_dropout: float = 0.0,
    adapter_ids: Optional[jax.Array] = None,  # [B]: per-row pick for
                                              # multi-stacked LLM adapters
    dropout_rng: Optional[jax.Array] = None,
    last_logit_only: bool = False,
    stale_cache: bool = False,
    prefill_pad_len: Optional[int] = None,
    remat: bool = False,
    return_hidden: bool = False,
    kv_quant: Optional[str] = None,
    act_stats: bool = False,   # calibration: also return per-channel absmax
):
    embed = params["language_model"]["embed_tokens"]
    inputs_embeds = jnp.take(embed, jnp.clip(input_ids, 0, embed.shape[0] - 1), axis=0)
    if pixel_values is not None:
        # vision adapters are a SHARED single stack in multi-adapter serving
        # (llama._adapter multi path is LLM-only); checked there if violated
        feats = image_features(params, cfg, pixel_values, lora, lora_scaling,
                               remat=remat)
        inputs_embeds = merge_image_features(cfg, input_ids, inputs_embeds, feats)
    if position_ids is None:
        position_ids = jnp.cumsum(attention_mask, axis=1) - 1
        position_ids = jnp.maximum(position_ids, 0)
    mask = full_attention_mask if cache is not None else attention_mask
    stats = None
    out = llama_forward(params["language_model"], cfg.text,
                        inputs_embeds, mask, position_ids,
                        cache, cache_index, key_position_ids,
                        lora=(lora or {}).get("language_model"),
                        lora_scaling=lora_scaling,
                        lora_dropout=lora_dropout,
                        adapter_ids=adapter_ids,
                        dropout_rng=dropout_rng,
                        stale_cache=stale_cache,
                        prefill_pad_len=prefill_pad_len,
                        remat=remat, kv_quant=kv_quant,
                        act_stats=act_stats)
    if act_stats:
        hidden, new_cache, stats = out
    else:
        hidden, new_cache = out
    if last_logit_only:
        # only the last valid position feeds sampling — skips the [B, T, V]
        # logits tensor during prefill (vocab matmul over one position)
        last = jnp.sum(attention_mask, axis=1).astype(jnp.int32) - 1
        hidden = jnp.take_along_axis(hidden, last[:, None, None], axis=1)
    if return_hidden:
        # training fast path: the caller computes a CHUNKED vocab projection
        # + CE so the [B, T, V] fp32 logits never materialize
        return (hidden, new_cache, stats) if act_stats else (hidden, new_cache)
    logits = lm_logits(params["language_model"], cfg.text, hidden)
    return (logits, new_cache, stats) if act_stats else (logits, new_cache)


def causal_lm_loss(logits: jax.Array, labels: jax.Array, attention_mask: jax.Array,
                   ignore_index: int = -100):
    """Shifted masked cross-entropy: predict token t+1 from position t.

    Mirrors the reference loss (arch_cullavo.py:646-665): logits[:, :-1]
    vs labels[:, 1:], positions with ``ignore_index`` or mask==0 excluded,
    mean over valid positions.  Returns (loss, n_valid) — callers in SPMD
    settings psum both and divide (fixes the reference's per-rank-divergence
    hazard noted in SURVEY.md §5).
    """
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    shift_mask = (attention_mask[:, 1:] != 0) & (shift_labels != ignore_index)
    safe_labels = jnp.where(shift_mask, shift_labels, 0)
    logprobs = jax.nn.log_softmax(shift_logits, axis=-1)
    token_ll = jnp.take_along_axis(logprobs, safe_labels[..., None], axis=-1)[..., 0]
    n_valid = jnp.sum(shift_mask)
    loss = -jnp.sum(jnp.where(shift_mask, token_ll, 0.0)) / jnp.maximum(n_valid, 1)
    return loss, n_valid


# ---------------------------------------------------------------------------
# generation
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    max_new_tokens: int = 128
    do_sample: bool = False
    temperature: float = 0.9
    top_k: int = 50
    top_p: float = 0.95
    eos_token_id: int = 2


def _sample_token(logits: jax.Array, gen: GenerationConfig, key: jax.Array) -> jax.Array:
    """logits: [B, V] → [B] int32.  HF order: temperature → top-k → top-p."""
    if not gen.do_sample:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / gen.temperature
    if gen.top_k > 0:
        kth = jax.lax.top_k(logits, gen.top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, llama.NEG_INF, logits)
    if gen.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens until cumulative prob exceeds top_p (always keep first)
        cutoff_mask = cum - probs > gen.top_p
        cutoff_logit = jnp.min(jnp.where(cutoff_mask, jnp.inf, sorted_logits), axis=-1, keepdims=True)
        logits = jnp.where(logits < cutoff_logit, llama.NEG_INF, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


_PRESERVE_FP32_KEYS = ("scale", "scale8", "absmax",
                       "absmax_scale", "absmax_offset")


def _cast_params(params, compute_dtype, from_bf16: bool = True):
    """Cast float leaves to the compute dtype EXCEPT quantization scales —
    bf16-rounding a per-block absmax perturbs every weight it dequantizes
    (~0.2-0.4% rel), breaking bnb-parity; the kernels upcast scales to fp32
    internally, but only AFTER such a cast would have rounded them.
    ``from_bf16=False`` leaves existing bf16 leaves alone (the decode-phase
    cast, where the prefill already owns the dtype choice)."""
    src = ((jnp.float32, jnp.bfloat16, jnp.float16) if from_bf16
           else (jnp.float32, jnp.float16))

    def cast(path, a):
        if a.dtype not in src:
            return a
        last = path[-1] if path else None
        if getattr(last, "key", None) in _PRESERVE_FP32_KEYS:
            return a
        return a.astype(compute_dtype)

    return jax.tree_util.tree_map_with_path(cast, params)


@functools.partial(jax.jit, static_argnames=("cfg", "gen", "max_len",
                                             "compute_dtype", "kv_quant"))
def generate(
    params: Params,
    cfg: LlavaConfig,
    input_ids: jax.Array,         # [B, T] prompt, image tokens pre-expanded
    pixel_values: Optional[jax.Array],
    attention_mask: jax.Array,    # [B, T]
    gen: GenerationConfig,
    max_len: int,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    kv_quant: Optional[str] = None,
    lora: Optional[dict] = None,
    lora_scaling: float = 0.0,
    adapter_ids: Optional[jax.Array] = None,
):
    """Prefill + decode loop entirely under jit.  Returns [B, max_new_tokens]
    generated ids (right-padded with eos after stop)."""
    B, T = input_ids.shape
    if rng is None:
        rng = jax.random.PRNGKey(0)

    lm = _cast_params(params, compute_dtype)
    lora = _cast_params(lora, compute_dtype) if lora else None

    full_mask = jnp.zeros((B, max_len), jnp.int32)
    full_mask = jax.lax.dynamic_update_slice(full_mask, attention_mask.astype(jnp.int32), (0, 0))

    position_ids = jnp.cumsum(attention_mask, axis=1) - 1
    position_ids = jnp.maximum(position_ids, 0)
    key_pos = jnp.zeros((B, max_len), jnp.int32)
    key_pos = jax.lax.dynamic_update_slice(key_pos, position_ids.astype(jnp.int32), (0, 0))

    # cache-building prefill: the layer scan's stacked ys ARE the cache — one
    # full-length buffer instead of zero-init xs + updated-copy ys (see
    # llama_forward's prefill_pad_len doc; this was the batch-8 prefill OOM)
    logits, cache = llava_forward(lm, cfg, input_ids, pixel_values, attention_mask,
                                  position_ids, last_logit_only=True,
                                  prefill_pad_len=max_len, kv_quant=kv_quant,
                                  lora=lora, lora_scaling=lora_scaling,
                                  adapter_ids=adapter_ids)
    last_idx = jnp.sum(attention_mask, axis=1).astype(jnp.int32) - 1
    next_logits = logits[:, 0]

    rng, sub = jax.random.split(rng)
    next_tok = _sample_token(next_logits, gen, sub)

    out = jnp.full((B, gen.max_new_tokens), gen.eos_token_id, jnp.int32)
    out = out.at[:, 0].set(next_tok)
    done = next_tok == gen.eos_token_id
    # position of the next token to be *written into the cache* per row
    cur_pos = last_idx + 1          # [B]
    write_idx = jnp.int32(T)        # cache write offset (sequence is right-aligned)

    def cond(state):
        step, *_rest, done = state
        return (step < gen.max_new_tokens) & ~jnp.all(done)

    def body(state):
        step, tok, cur_pos, write_idx, full_mask, key_pos, cache, out, rng, done = state
        # stale-cache decode: attention reads the cache as-is (current token
        # folded in out-of-band); each layer scatters its fresh k/v in place
        # inside the layer scan (see llama_forward's stale_cache doc)
        pos = cur_pos[:, None]
        logits, cache = llava_forward(lm, cfg, tok[:, None], None,
                                      None, pos, cache, write_idx, full_mask,
                                      key_pos, stale_cache=True,
                                      lora=lora, lora_scaling=lora_scaling,
                                      adapter_ids=adapter_ids)
        full_mask = full_mask.at[:, write_idx].set(1)
        key_pos = key_pos.at[:, write_idx].set(cur_pos)
        rng, sub = jax.random.split(rng)
        nxt = _sample_token(logits[:, 0], gen, sub)
        nxt = jnp.where(done, gen.eos_token_id, nxt)
        out = out.at[:, step].set(nxt)
        done = done | (nxt == gen.eos_token_id)
        return (step + 1, nxt, cur_pos + 1, write_idx + 1, full_mask, key_pos, cache,
                out, rng, done)

    state = (jnp.int32(1), next_tok, cur_pos, write_idx, full_mask, key_pos, cache,
             out, rng, done)
    state = jax.lax.while_loop(cond, body, state)
    return state[7]


# ---------------------------------------------------------------------------
# two-phase generation (separate prefill / decode programs)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "max_len", "compute_dtype",
                                             "kv_quant"))
def generate_prefill(params, cfg: LlavaConfig, input_ids, pixel_values,
                     attention_mask, max_len: int, compute_dtype=jnp.bfloat16,
                     kv_quant: Optional[str] = None, lora: Optional[dict] = None,
                     lora_scaling: float = 0.0,
                     adapter_ids: Optional[jax.Array] = None):
    """Prefill phase: build the cache, return the sampling state.

    Split from the decode loop so each program compiles independently — the
    fused prefill+decode program for a 7B model can exceed the AOT compiler's
    capacity, and the split also halves recompile cost when either phase's
    shapes change.

    ``lora``: unmerged runtime adapters over a (possibly quantized) base —
    the reference's own eval mode (NF4 base + PEFT adapters attached,
    load_cullavo.py:63-138).  A MULTI-stacked LLM adapter dict
    (lora.stack_adapter_sets) applies per-row adapters selected by
    ``adapter_ids`` [B]; the ids travel in the state so decode keeps
    applying each row's adapter.
    """
    B, T = input_ids.shape
    lm = _cast_params(params, compute_dtype, from_bf16=False)
    full_mask = jnp.zeros((B, max_len), jnp.int32)
    full_mask = jax.lax.dynamic_update_slice(full_mask,
                                             attention_mask.astype(jnp.int32), (0, 0))
    position_ids = jnp.maximum(jnp.cumsum(attention_mask, axis=1) - 1, 0)
    key_pos = jnp.zeros((B, max_len), jnp.int32)
    key_pos = jax.lax.dynamic_update_slice(key_pos, position_ids.astype(jnp.int32), (0, 0))
    if adapter_ids is None:
        adapter_ids = jnp.zeros((B,), jnp.int32)
    # cache-building prefill (one cache-sized buffer; see llama_forward doc)
    lora_c = _cast_params(lora, compute_dtype, from_bf16=False) if lora else None
    logits, cache = llava_forward(lm, cfg, input_ids, pixel_values, attention_mask,
                                  position_ids, last_logit_only=True,
                                  prefill_pad_len=max_len, kv_quant=kv_quant,
                                  lora=lora_c, lora_scaling=lora_scaling,
                                  adapter_ids=adapter_ids)
    last_idx = jnp.sum(attention_mask, axis=1).astype(jnp.int32) - 1
    return {"logits": logits[:, 0], "cache": cache, "full_mask": full_mask,
            "key_pos": key_pos, "cur_pos": last_idx + 1,
            "write_idx": jnp.int32(T),
            "adapter_ids": jnp.asarray(adapter_ids, jnp.int32)}


@functools.partial(jax.jit, static_argnames=("total_batch",))
def alloc_decode_state(chunk_state: dict, total_batch: int) -> dict:
    """Allocate a zeroed full-batch decode state shaped like ``chunk_state``.

    Chunked prefill: NF4/int8 decode cost is dominated by the per-step full
    weight-stream dequant, which is batch-independent — so the throughput
    lever is decoding ONE large batch whose prefills ran in memory-sized
    chunks.  This allocates the merged state (cache batch axis = 1, the rest
    axis = 0); ``merge_decode_state`` then writes each chunk in place.
    """
    def z(a, axis):
        shape = list(a.shape)
        shape[axis] = total_batch
        return jnp.zeros(shape, a.dtype)
    out = {
        "logits": z(chunk_state["logits"], 0),
        # cache leaves are S-major [L, S, B, ...] (llama.sdpa_smajor): batch
        # axis 2 for values AND the int8-mode k_s/v_s scale planes
        "cache": {name: z(a, 2) for name, a in chunk_state["cache"].items()},
        "full_mask": z(chunk_state["full_mask"], 0),
        "key_pos": z(chunk_state["key_pos"], 0),
        "cur_pos": z(chunk_state["cur_pos"], 0),
        "write_idx": chunk_state["write_idx"],
    }
    if "adapter_ids" in chunk_state:
        out["adapter_ids"] = z(chunk_state["adapter_ids"], 0)
    return out


@functools.partial(jax.jit, donate_argnums=(0, 1))
def merge_decode_state(big: dict, chunk: dict, batch_offset) -> dict:
    """Write a prefill chunk's decode state into the donated full-batch state.

    BOTH inputs are DONATED: XLA aliases the multi-GB merged cache in place,
    and the chunk's buffers are released at the merge instead of surviving
    (via the caller's Python reference) into the next chunk's prefill — with
    the chunk alive, peak during prefill k+1 is merged + TWO chunk caches,
    which tipped batch 20 over a 16 GB chip.  All chunks must share the same
    prompt length T (``write_idx`` equal)."""
    off = jnp.asarray(batch_offset, jnp.int32)
    out = {
        "logits": jax.lax.dynamic_update_slice(
            big["logits"], chunk["logits"].astype(big["logits"].dtype), (off, 0)),
        "cache": {
            name: jax.lax.dynamic_update_slice(
                big["cache"][name], a,
                (0, 0, off) + (0,) * (a.ndim - 3))
            for name, a in chunk["cache"].items()
        },
        "full_mask": jax.lax.dynamic_update_slice(
            big["full_mask"], chunk["full_mask"], (off, 0)),
        "key_pos": jax.lax.dynamic_update_slice(
            big["key_pos"], chunk["key_pos"], (off, 0)),
        "cur_pos": jax.lax.dynamic_update_slice(
            big["cur_pos"], chunk["cur_pos"], (off,)),
        "write_idx": chunk["write_idx"],
    }
    if "adapter_ids" in chunk:
        out["adapter_ids"] = jax.lax.dynamic_update_slice(
            big["adapter_ids"], chunk["adapter_ids"], (off,))
    return out


def generate_prefill_chunked(params, cfg: LlavaConfig, input_ids, pixel_values,
                             attention_mask, max_len: int, chunk: int,
                             compute_dtype=jnp.bfloat16,
                             kv_quant: Optional[str] = None,
                             lora: Optional[dict] = None,
                             lora_scaling: float = 0.0,
                             adapter_ids=None):
    """Prefill ``input_ids`` in batch chunks of ``chunk`` rows, merging each
    into one full-batch decode state (see ``alloc_decode_state``).  Returns a
    state interchangeable with ``generate_prefill``'s.  A non-divisible batch
    runs one smaller final chunk (one extra compiled program shape)."""
    B = input_ids.shape[0]
    if chunk >= B:
        return generate_prefill(params, cfg, input_ids, pixel_values,
                                attention_mask, max_len,
                                compute_dtype=compute_dtype, kv_quant=kv_quant,
                                lora=lora, lora_scaling=lora_scaling,
                                adapter_ids=adapter_ids)
    state = None
    for off in range(0, B, chunk):
        cs = generate_prefill(params, cfg, input_ids[off:off + chunk],
                              None if pixel_values is None
                              else pixel_values[off:off + chunk],
                              attention_mask[off:off + chunk], max_len,
                              compute_dtype=compute_dtype, kv_quant=kv_quant,
                              lora=lora, lora_scaling=lora_scaling,
                              adapter_ids=None if adapter_ids is None
                              else adapter_ids[off:off + chunk])
        if state is None:
            state = alloc_decode_state(cs, B)
        state = merge_decode_state(state, cs, off)
        # true completion barrier (tiny host transfer): PJRT allocates a
        # dispatched program's outputs at ENQUEUE time, so without a barrier
        # the async loop materializes EVERY chunk's cache at once — exactly
        # the OOM chunking exists to avoid.  (block_until_ready can return
        # early through the remote-TPU tunnel; a device_get cannot.)
        jax.device_get(state["write_idx"])
    return state


@functools.partial(jax.jit, static_argnames=("row",))
def extract_prefix_state(state: dict, row: int) -> dict:
    """Slice ONE row of a prefill/decode state into a reusable 1-row prefix
    state (cache batch axis is 2 — S-major [L, S, B, ...] layout).  The
    serving engine stores these in its prefix registry: the first request
    with a given image/prompt head pays the full prefill, later requests
    continue from the stored KV via ``generate_prefill_prefix``."""
    r = row
    return {
        "cache": {name: jax.lax.slice_in_dim(a, r, r + 1, axis=2)
                  for name, a in state["cache"].items()},
        "full_mask": state["full_mask"][r:r + 1],
        "key_pos": state["key_pos"][r:r + 1],
        "write_idx": state["write_idx"],
    }


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def generate_prefill_prefix(params, cfg: LlavaConfig, prefix_state: dict,
                            suffix_ids, pixel_values, suffix_mask,
                            prefix_len, compute_dtype=jnp.bfloat16,
                            lora: Optional[dict] = None,
                            lora_scaling: float = 0.0,
                            adapter_ids: Optional[jax.Array] = None):
    """Prefill that CONTINUES from a cached KV prefix (prefix-cache reuse —
    beyond the reference, whose eval re-prefills the full prompt per request,
    pipeline/LLaVAVQAVALPipeline.py:171-180).

    ``prefix_state``: a 1-row state (``extract_prefix_state``) whose cache
    slots ``[0, prefix_len)`` hold the KV of tokens identical across the
    batch (same tokens, same positions — token-exact reuse).  ``suffix_ids``
    [B, W]: each row's REMAINING right-padded tokens; ``pixel_values`` rides
    along when the image run lives in the suffix.  Returns a state
    interchangeable with ``generate_prefill``'s where row b's prompt is
    ``prefix ++ suffix_b`` laid out in slots ``[0, prefix_len + W)``.

    Mechanics: the suffix runs as ONE ``stale_cache`` T=W window (the
    speculative-verification forward generalized to prefill width): attention
    reads the broadcast prefix cache gated to ``[0, prefix_len)`` plus the
    intra-window causal fresh block, and each layer writes its W-slot slab at
    ``prefix_len``.  Compute scales with W, not prefix+W — a request sharing
    a P-token head pays P/(P+W) less prefill FLOPs.  ``prefix_len`` is a
    DYNAMIC scalar: one compiled program per (W, cache mode), not per split
    point."""
    B, W = suffix_ids.shape
    prefix_len = jnp.asarray(prefix_len, jnp.int32)
    lm = _cast_params(params, compute_dtype, from_bf16=False)
    lora_c = _cast_params(lora, compute_dtype, from_bf16=False) if lora else None
    if adapter_ids is None:
        adapter_ids = jnp.zeros((B,), jnp.int32)

    # broadcast the 1-row prefix across the chunk (batch axis 2 for every
    # cache leaf, incl. int8 scale planes)
    cache = {name: jnp.repeat(a, B, axis=2)
             for name, a in prefix_state["cache"].items()}
    S = cache["k"].shape[1]
    # prefix-only attention gate: the stale-cache contract wants the window
    # slots NOT yet visible (fresh k/v fold in-band); stored slots past
    # prefix_len (a longer stored prefix reused at a shorter split) stay
    # masked too
    pfx_valid = (jnp.arange(S)[None, :] < prefix_len).astype(jnp.int32)
    full_mask = jnp.broadcast_to(pfx_valid, (B, S))
    key_pos = jnp.broadcast_to(
        jnp.where(pfx_valid > 0, jnp.arange(S)[None, :], 0), (B, S))

    suffix_pos = prefix_len + jnp.maximum(
        jnp.cumsum(suffix_mask, axis=1) - 1, 0)               # [B, W]
    logits, cache = llava_forward(
        lm, cfg, suffix_ids, pixel_values, suffix_mask, suffix_pos,
        cache, prefix_len, full_mask, key_pos,
        stale_cache=True, last_logit_only=True,
        lora=lora_c, lora_scaling=lora_scaling, adapter_ids=adapter_ids)

    sufl = jnp.sum(suffix_mask, axis=1).astype(jnp.int32)     # [B]
    full_mask = jax.lax.dynamic_update_slice(
        full_mask, suffix_mask.astype(jnp.int32), (0, prefix_len))
    key_pos = jax.lax.dynamic_update_slice(key_pos, suffix_pos,
                                           (0, prefix_len))
    return {"logits": logits[:, 0], "cache": cache, "full_mask": full_mask,
            "key_pos": key_pos, "cur_pos": prefix_len + sufl,
            "write_idx": (prefix_len + W).astype(jnp.int32),
            "adapter_ids": jnp.asarray(adapter_ids, jnp.int32)}


@functools.partial(jax.jit, static_argnames=("cfg", "gen", "num_steps",
                                             "compute_dtype"),
                   donate_argnums=(2,))
def decode_quantum(params, cfg: LlavaConfig, state: dict, gen: GenerationConfig,
                   num_steps: int, rng=None, compute_dtype=jnp.bfloat16,
                   lora: Optional[dict] = None, lora_scaling: float = 0.0):
    """Continuous-batching decode: run ``num_steps`` decode iterations over a
    slot POOL whose rows are independent requests mid-generation — per-row
    write positions (``state["write_idx"]``: [B]), per-row current tokens
    (``state["cur_tok"]``: [B]) and done flags (``state["done"]``: [B]).

    Unlike ``generate_decode`` this never samples from ``state["logits"]``
    (the serving engine samples each row's first token at admission, see
    serving/engine.py) and it RETURNS the updated pool state so the next
    quantum continues where this one stopped.  The state is DONATED: the
    multi-GB pool cache updates in place.  Rows whose write position runs
    past the cache length stop writing (scatter drop semantics in
    llama_forward's per-row path) — the engine retires slots before that.

    Returns (tokens [B, num_steps], new_state)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    lm = _cast_params(params, compute_dtype, from_bf16=False)
    lora_c = _cast_params(lora, compute_dtype, from_bf16=False) if lora else None
    adapter_ids = state.get("adapter_ids")

    def step(carry, _):
        tok, cur_pos, write_idx, full_mask, key_pos, cache, rng, done = carry
        logits, cache = llava_forward(lm, cfg, tok[:, None], None, None,
                                      cur_pos[:, None], cache, write_idx,
                                      full_mask, key_pos, stale_cache=True,
                                      lora=lora_c, lora_scaling=lora_scaling,
                                      adapter_ids=adapter_ids)
        rows = jnp.arange(tok.shape[0])
        full_mask = full_mask.at[rows, write_idx].set(1, mode="drop")
        key_pos = key_pos.at[rows, write_idx].set(cur_pos, mode="drop")
        rng, sub = jax.random.split(rng)
        nxt = _sample_token(logits[:, 0], gen, sub)
        nxt = jnp.where(done, gen.eos_token_id, nxt)
        done = done | (nxt == gen.eos_token_id)
        return (nxt, cur_pos + 1, write_idx + 1, full_mask, key_pos, cache,
                rng, done), nxt

    carry = (state["cur_tok"], state["cur_pos"], state["write_idx"],
             state["full_mask"], state["key_pos"], state["cache"], rng,
             state["done"])
    carry, toks = jax.lax.scan(step, carry, None, length=num_steps)
    new_state = {"logits": state["logits"], "cache": carry[5],
                 "full_mask": carry[3], "key_pos": carry[4],
                 "cur_pos": carry[1], "write_idx": carry[2],
                 "cur_tok": carry[0], "done": carry[7]}
    if adapter_ids is not None:
        new_state["adapter_ids"] = adapter_ids
    return toks.T, new_state


@functools.partial(jax.jit, static_argnames=("cfg", "gen", "num_steps",
                                             "spec_k", "compute_dtype"),
                   donate_argnums=(2, 3))
def decode_quantum_spec(params, cfg: LlavaConfig, state: dict,
                        hist_state: dict, gen: GenerationConfig,
                        num_steps: int, spec_k: int,
                        compute_dtype=jnp.bfloat16,
                        lora: Optional[dict] = None,
                        lora_scaling: float = 0.0):
    """``decode_quantum`` with prompt-lookup speculative windows
    (``generate_decode_spec`` machinery on the serving slot pool).

    Each loop iteration runs ONE ``spec_k``-token verification forward per
    pool row (per-row W-slot cache writes; rejected slots never get their
    ``full_mask`` bit).  A row emits between 1 and ``spec_k`` tokens per
    forward, so the quantum completes in between ``ceil(num_steps/spec_k)``
    and ``num_steps`` forwards — decode is weight-stream-bound (~6.6 GB per
    forward at 7B int8), so accepted drafts convert directly into serving
    throughput.  Greedy-only: a draft survives only when it equals the
    argmax, so the emitted stream is token-exact vs ``decode_quantum``.

    ``hist_state``: ``{"hist": [B, Hcap] int32, "hist_len": [B] int32}`` —
    the per-slot lookup corpus (prompt + emitted tokens, current token
    last), maintained by the engine at admission and by this function as
    tokens are emitted.  Donated alongside ``state``.

    Returns ``(tokens [B, num_steps], n_emit [B], new_state,
    new_hist_state)`` — row b's valid tokens are ``tokens[b, :n_emit[b]]``
    (done/idle rows emit 0)."""
    if gen.do_sample:
        raise ValueError("speculative decode is greedy-only (exactness "
                         "contract); use decode_quantum for sampling")
    assert spec_k >= 2, "spec_k < 2 is plain decode — use decode_quantum"
    lm = _cast_params(params, compute_dtype, from_bf16=False)
    lora_c = _cast_params(lora, compute_dtype, from_bf16=False) if lora else None
    adapter_ids = state.get("adapter_ids")
    B = state["cur_tok"].shape[0]
    W = spec_k
    eos = gen.eos_token_id

    out = jnp.full((B, num_steps + W), eos, jnp.int32)
    n_emit = jnp.zeros((B,), jnp.int32)

    def cond(c):
        done, n_emit = c[10], c[7]
        return jnp.any(~done & (n_emit < num_steps))

    def body(c):
        (cur_tok, cur_pos, write_idx, full_mask, key_pos, cache, out, n_emit,
         hist, hist_len, done, n_fwd) = c
        draft = _ngram_draft(hist, hist_len, cur_tok, W)       # [B, W-1]
        tokens_in = jnp.concatenate([cur_tok[:, None], draft], axis=1)
        pos = cur_pos[:, None] + jnp.arange(W)[None]
        logits, cache = llava_forward(lm, cfg, tokens_in, None, None, pos,
                                      cache, write_idx, full_mask, key_pos,
                                      stale_cache=True, lora=lora_c,
                                      lora_scaling=lora_scaling,
                                      adapter_ids=adapter_ids)
        t = jnp.argmax(logits, axis=-1).astype(jnp.int32)      # [B, W]
        match = draft == t[:, :-1]                             # [B, W-1]
        a = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
        j = jnp.arange(W)[None]
        within = (t == eos) & (j <= a[:, None])
        has_eos = jnp.any(within, axis=1)
        e = jnp.where(has_eos, jnp.argmax(within, axis=1) + 1, a + 1)
        e = jnp.where(done | (n_emit >= num_steps), 0, e)      # [B] emitted
        rows = jnp.arange(B)[:, None]
        keep = j < e[:, None]
        out = out.at[rows, jnp.where(keep, n_emit[:, None] + j,
                                     out.shape[1])].set(t, mode="drop")
        hist = hist.at[rows, jnp.where(keep, hist_len[:, None] + j,
                                       hist.shape[1])].set(t, mode="drop")
        mpos = jnp.where(keep, write_idx[:, None] + j, full_mask.shape[1])
        full_mask = full_mask.at[rows, mpos].set(1, mode="drop")
        key_pos = key_pos.at[rows, mpos].set(cur_pos[:, None] + j, mode="drop")
        last = jnp.take_along_axis(t, jnp.maximum(e - 1, 0)[:, None], 1)[:, 0]
        cur_tok = jnp.where(e > 0, last, cur_tok)
        done = done | (has_eos & (e > 0))
        return (cur_tok, cur_pos + e, write_idx + e, full_mask, key_pos,
                cache, out, n_emit + e, hist, hist_len + e, done, n_fwd + 1)

    carry = (state["cur_tok"], state["cur_pos"], state["write_idx"],
             state["full_mask"], state["key_pos"], state["cache"], out,
             n_emit, hist_state["hist"], hist_state["hist_len"],
             state["done"], jnp.int32(0))
    carry = jax.lax.while_loop(cond, body, carry)
    new_state = {"logits": state["logits"], "cache": carry[5],
                 "full_mask": carry[3], "key_pos": carry[4],
                 "cur_pos": carry[1], "write_idx": carry[2],
                 "cur_tok": carry[0], "done": carry[10]}
    if adapter_ids is not None:
        new_state["adapter_ids"] = adapter_ids
    n_emit = jnp.minimum(carry[7], num_steps)
    # n_fwd travels in hist_state (not the token outputs) so the engine can
    # report tokens/forward without changing the harvest contract
    hist_out = {"hist": carry[8], "hist_len": carry[9],
                "n_fwd": hist_state.get("n_fwd", jnp.int32(0)) + carry[11]}
    return carry[6][:, :num_steps], n_emit, new_state, hist_out


@functools.partial(jax.jit, donate_argnums=(0,))
def write_slot(pool: dict, chunk: dict, row, slot, first_tok, done0) -> dict:
    """Admit one prefilled request into a slot of the donated decode pool.

    ``chunk`` is a ``generate_prefill`` state (scalar ``write_idx``);
    ``row`` selects the request's row in it, ``slot`` the pool row to
    overwrite.  ``first_tok``/``done0`` come from sampling the chunk's
    prefill logits at admission.  row/slot/first_tok are traced, so ONE
    compiled program serves every (row, slot) combination of a given
    chunk/pool shape."""
    slot = jnp.asarray(slot, jnp.int32)
    row = jnp.asarray(row, jnp.int32)

    def row_of(a, axis):
        return jax.lax.dynamic_index_in_dim(a, row, axis, keepdims=True)

    cache = {
        name: jax.lax.dynamic_update_slice(
            pool["cache"][name], row_of(a, 2).astype(pool["cache"][name].dtype),
            (0, 0, slot) + (0,) * (a.ndim - 3))
        for name, a in chunk["cache"].items()
    }
    out = {
        "logits": pool["logits"],
        "cache": cache,
        "full_mask": jax.lax.dynamic_update_slice(
            pool["full_mask"], row_of(chunk["full_mask"], 0), (slot, 0)),
        "key_pos": jax.lax.dynamic_update_slice(
            pool["key_pos"], row_of(chunk["key_pos"], 0), (slot, 0)),
        "cur_pos": jax.lax.dynamic_update_slice(
            pool["cur_pos"], row_of(chunk["cur_pos"], 0), (slot,)),
        "write_idx": pool["write_idx"].at[slot].set(
            jnp.asarray(chunk["write_idx"], jnp.int32)),
        "cur_tok": pool["cur_tok"].at[slot].set(
            jnp.asarray(first_tok, jnp.int32)),
        "done": pool["done"].at[slot].set(jnp.asarray(done0, jnp.bool_)),
    }
    if "adapter_ids" in pool:
        out["adapter_ids"] = jax.lax.dynamic_update_slice(
            pool["adapter_ids"], row_of(chunk["adapter_ids"], 0), (slot,))
    return out


@functools.partial(jax.jit, donate_argnums=(0,))
def write_slots(pool: dict, chunk: dict, slots, first_toks, done0) -> dict:
    """Admit a whole prefill chunk into the donated decode pool in ONE
    dispatch: chunk row i goes to pool row ``slots[i]``; rows with
    ``slots[i] < 0`` are NOT admitted (scatter-drop semantics) — the
    engine marks prefill pad rows and finished-at-admission requests that
    way.  Per-request ``write_slot`` remains for single admissions; on a
    remote-tunnel backend one batched dispatch replaces chunk_b round
    trips (~5-15 ms each)."""
    slots = jnp.asarray(slots, jnp.int32)
    # negative indices WRAP in JAX indexing (-1 = last row) — mode="drop"
    # only drops out-of-bounds — so map the -1 sentinel to pool_rows (OOB)
    pool_rows = pool["full_mask"].shape[0]
    slots = jnp.where(slots < 0, pool_rows, slots)

    def rows_to(pool_a, chunk_a, axis):
        idx = (slice(None),) * axis + (slots,)
        return pool_a.at[idx].set(chunk_a.astype(pool_a.dtype), mode="drop")

    B = slots.shape[0]
    out = {
        "logits": pool["logits"],
        "cache": {name: rows_to(pool["cache"][name], a, 2)
                  for name, a in chunk["cache"].items()},
        "full_mask": rows_to(pool["full_mask"], chunk["full_mask"], 0),
        "key_pos": rows_to(pool["key_pos"], chunk["key_pos"], 0),
        "cur_pos": rows_to(pool["cur_pos"], chunk["cur_pos"], 0),
        "write_idx": pool["write_idx"].at[slots].set(
            jnp.broadcast_to(jnp.asarray(chunk["write_idx"], jnp.int32), (B,)),
            mode="drop"),
        "cur_tok": pool["cur_tok"].at[slots].set(
            jnp.asarray(first_toks, jnp.int32), mode="drop"),
        "done": pool["done"].at[slots].set(
            jnp.asarray(done0, jnp.bool_), mode="drop"),
    }
    if "adapter_ids" in pool:
        out["adapter_ids"] = rows_to(pool["adapter_ids"],
                                     chunk["adapter_ids"], 0)
    return out


@functools.partial(jax.jit, static_argnames=("cfg", "gen", "compute_dtype",
                                             "return_state"),
                   donate_argnums=(2,))
def generate_decode(params, cfg: LlavaConfig, state: dict, gen: GenerationConfig,
                    rng=None, compute_dtype=jnp.bfloat16, return_state=False,
                    lora: Optional[dict] = None, lora_scaling: float = 0.0):
    """Decode phase: fixed-length ``lax.scan`` over max_new_tokens (all rows
    run to the end; finished rows emit eos).

    The prefill ``state`` is DONATED and unusable after this call.  With
    ``return_state=True`` the final decode state is returned alongside the
    tokens — XLA then aliases the multi-GB input KV cache to the output
    cache and updates it in place; without a matching output the donation
    cannot alias and decode holds TWO cache-sized buffers at entry (the
    aliasing is what buys batch ≥10 on a 16 GB chip)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    lm = _cast_params(params, compute_dtype, from_bf16=False)

    # split BEFORE the first sample: reusing rng both inside the first
    # categorical draw and as the parent of the loop's splits correlates
    # token 1 with token 2 (single-use key discipline)
    rng, first_key = jax.random.split(rng)
    first = _sample_token(state["logits"], gen, first_key)
    done0 = first == gen.eos_token_id

    lora_c = _cast_params(lora, compute_dtype, from_bf16=False) if lora else None
    adapter_ids = state.get("adapter_ids")

    def step(carry, _):
        tok, cur_pos, write_idx, full_mask, key_pos, cache, rng, done = carry
        # stale-cache decode (see generate.body): stale-read attention +
        # per-layer in-place scatter inside the layer scan
        logits, cache = llava_forward(lm, cfg, tok[:, None], None, None,
                                      cur_pos[:, None], cache, write_idx,
                                      full_mask, key_pos, stale_cache=True,
                                      lora=lora_c, lora_scaling=lora_scaling,
                                      adapter_ids=adapter_ids)
        full_mask = full_mask.at[:, write_idx].set(1)
        key_pos = key_pos.at[:, write_idx].set(cur_pos)
        rng, sub = jax.random.split(rng)
        nxt = _sample_token(logits[:, 0], gen, sub)
        nxt = jnp.where(done, gen.eos_token_id, nxt)
        done = done | (nxt == gen.eos_token_id)
        return (nxt, cur_pos + 1, write_idx + 1, full_mask, key_pos, cache,
                rng, done), nxt

    carry = (first, state["cur_pos"], state["write_idx"], state["full_mask"],
             state["key_pos"], state["cache"], rng, done0)
    carry, rest = jax.lax.scan(step, carry, None, length=gen.max_new_tokens - 1)
    tokens = jnp.concatenate([first[:, None], rest.T], axis=1)
    if return_state:
        final_state = {"logits": state["logits"], "cache": carry[5],
                       "full_mask": carry[3], "key_pos": carry[4],
                       "cur_pos": carry[1], "write_idx": carry[2]}
        if adapter_ids is not None:
            final_state["adapter_ids"] = adapter_ids
        return tokens, final_state
    return tokens


# ---------------------------------------------------------------------------
# speculative decode (prompt-lookup drafting)
# ---------------------------------------------------------------------------

def _ngram_draft(hist, hist_len, cur_tok, k):
    """Device-side prompt-lookup drafting: propose the ``k-1`` tokens that
    followed the most recent previous occurrence of the current context in
    the token history (the classic prompt-lookup / n-gram speculation draft
    — no draft model).  Bigram context (prev_tok, cur_tok) preferred, unigram
    fallback, else repeat ``cur_tok`` (a harmless always-available draft).

    hist: [B, S] int32 history (prompt + emitted tokens, cur_tok LAST);
    hist_len: [B] valid lengths; returns [B, k-1] int32.  Pure jnp — the
    whole lookup runs inside the decode jit (axon PJRT has no host
    callbacks, and a per-step host round trip costs 5-15 ms on the tunnel).
    """
    B, S = hist.shape
    idx = jnp.arange(S)[None]
    # exclude the current occurrence itself (hist_len-1 holds cur_tok)
    limit = (hist_len - 1)[:, None]
    uni = (hist == cur_tok[:, None]) & (idx < limit)
    prev = jnp.take_along_axis(hist, jnp.maximum(hist_len - 2, 0)[:, None], 1)
    prev_hist = jnp.concatenate(
        [jnp.full((B, 1), -1, hist.dtype), hist[:, :-1]], axis=1)
    bi = uni & (prev_hist == prev) & (hist_len[:, None] >= 2)
    j_bi = jnp.max(jnp.where(bi, idx, -1), axis=1)
    j_uni = jnp.max(jnp.where(uni, idx, -1), axis=1)
    j = jnp.where(j_bi >= 0, j_bi, j_uni)                     # [B], -1 = none
    pos = j[:, None] + 1 + jnp.arange(k - 1)[None]
    valid = (j >= 0)[:, None] & (pos < hist_len[:, None])
    draft = jnp.take_along_axis(hist, jnp.clip(pos, 0, S - 1), axis=1)
    return jnp.where(valid, draft, cur_tok[:, None]).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("cfg", "gen", "spec_k",
                                             "compute_dtype", "return_state"),
                   donate_argnums=(2,))
def generate_decode_spec(params, cfg: LlavaConfig, state: dict,
                         gen: GenerationConfig, spec_k: int,
                         prompt_ids, prompt_len,
                         compute_dtype=jnp.bfloat16,
                         lora: Optional[dict] = None, lora_scaling: float = 0.0,
                         extra_hist=None, return_state: bool = False):
    """Greedy speculative decode with prompt-lookup drafting.

    Each iteration runs ONE forward over a ``spec_k``-token window
    (cur_tok + spec_k-1 drafted tokens, intra-window causal — see
    llama.sdpa_decode_stale_smajor) and emits the verified prefix:
    1..spec_k tokens per forward.  Token-exact vs ``generate_decode``
    greedy by construction — a draft token is only kept when it EQUALS the
    argmax the model would have produced, so the emitted stream is the
    greedy stream regardless of draft quality; drafting only changes how
    many forwards it takes.  Caveat on "token-exact": the verification
    logits come from a T=W matmul whose f32 reduction order differs from
    the T=1 step's by ~1 ulp, so an EXACT logit tie between two tokens can
    in principle resolve differently than sequential decode — immaterial
    for real checkpoints, observable with degenerate random-weight models
    that emit long runs of one token.  Decode at 7B is weight-stream-bound (~6.6 GB
    per forward at int8 vs ~45 MB of window activations), so a window
    forward costs nearly the same HBM traffic as a 1-token step: acceptance
    converts directly into throughput (ceiling spec_k×), while 0%%
    acceptance still emits 1 token per forward (the adversarial floor is
    near parity, not a regression).

    The reference has no speculation (HF greedy ``generate``,
    pipeline/LLaVAVQAVALPipeline.py:171-180) — this is a TPU-native serving
    extension: static shapes throughout (one compiled window program), the
    n-gram lookup runs on device inside the loop (no host sync), and the
    cache writes speculative k/v eagerly — rejected slots simply never get
    their ``full_mask`` bit and are overwritten by later windows.

    prompt_ids/prompt_len: the right-padded prompt and its per-row valid
    lengths — the lookup corpus.  ``extra_hist`` [B, E] optionally prepends
    extra lookup text (e.g. retrieved documents / a previous turn) without
    it being part of the prompt.  Returns (tokens [B, max_new_tokens],
    stats {"windows": scalar, "emitted": scalar}).  Note ``emitted``
    includes each row's prefill-sampled first token, which no window
    produced, so draft acceptance = (emitted - B - windows) /
    (windows * (spec_k - 1)) for B rows.
    """
    if gen.do_sample:
        raise ValueError("speculative decode is greedy-only (exactness "
                         "contract); use generate_decode for sampling")
    assert spec_k >= 2, "spec_k < 2 is plain greedy decode — use generate_decode"
    lm = _cast_params(params, compute_dtype, from_bf16=False)
    lora_c = _cast_params(lora, compute_dtype, from_bf16=False) if lora else None
    adapter_ids = state.get("adapter_ids")

    B = prompt_ids.shape[0]
    W = spec_k
    max_new = gen.max_new_tokens
    eos = gen.eos_token_id

    parts = ([jnp.asarray(extra_hist, jnp.int32)] if extra_hist is not None
             else [])
    parts += [jnp.asarray(prompt_ids, jnp.int32),
              jnp.zeros((B, max_new + W), jnp.int32)]
    hist = jnp.concatenate(parts, axis=1)
    hist_len = jnp.asarray(prompt_len, jnp.int32)
    if extra_hist is not None:
        # extra corpus sits at the FRONT so per-row prompt offsets stay
        # simple; rows must fill extra_hist fully (pad with a token id the
        # model never emits, e.g. the image token)
        hist_len = hist_len + extra_hist.shape[1]

    first = jnp.argmax(state["logits"], axis=-1).astype(jnp.int32)
    out = jnp.full((B, max_new + W), eos, jnp.int32).at[:, 0].set(first)
    rows1 = jnp.arange(B)
    hist = hist.at[rows1, hist_len].set(first)
    hist_len = hist_len + 1
    n_emit = jnp.ones((B,), jnp.int32)
    done = first == eos
    write_idx = jnp.broadcast_to(
        jnp.asarray(state["write_idx"], jnp.int32).reshape(-1), (B,))

    def cond(c):
        done, n_emit = c[10], c[7]
        return jnp.any(~done & (n_emit < max_new))

    def body(c):
        (cur_tok, cur_pos, write_idx, full_mask, key_pos, cache, out, n_emit,
         hist, hist_len, done, n_windows) = c
        draft = _ngram_draft(hist, hist_len, cur_tok, W)       # [B, W-1]
        tokens_in = jnp.concatenate([cur_tok[:, None], draft], axis=1)
        pos = cur_pos[:, None] + jnp.arange(W)[None]
        logits, cache = llava_forward(lm, cfg, tokens_in, None, None, pos,
                                      cache, write_idx, full_mask, key_pos,
                                      stale_cache=True, lora=lora_c,
                                      lora_scaling=lora_scaling,
                                      adapter_ids=adapter_ids)
        t = jnp.argmax(logits, axis=-1).astype(jnp.int32)      # [B, W]
        match = draft == t[:, :-1]                             # [B, W-1]
        a = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
        j = jnp.arange(W)[None]
        within = (t == eos) & (j <= a[:, None])
        has_eos = jnp.any(within, axis=1)
        e = jnp.where(has_eos, jnp.argmax(within, axis=1) + 1, a + 1)
        # done rows and rows that already emitted max_new stop advancing
        # (an exhausted row kept burning full windows — and walking
        # cur_pos/write_idx past the cache — while slower rows finished)
        e = jnp.where(done | (n_emit >= max_new), 0, e)        # [B] emitted
        rows = jnp.arange(B)[:, None]
        keep = j < e[:, None]
        # OOB index = drop: rows/positions beyond the verified prefix
        out = out.at[rows, jnp.where(keep, n_emit[:, None] + j,
                                     out.shape[1])].set(t, mode="drop")
        hist = hist.at[rows, jnp.where(keep, hist_len[:, None] + j,
                                       hist.shape[1])].set(t, mode="drop")
        # kv slot j holds tokens_in[j]; valid exactly when j < e (the
        # rejected slots keep full_mask 0 and get overwritten later)
        mpos = jnp.where(keep, write_idx[:, None] + j, full_mask.shape[1])
        full_mask = full_mask.at[rows, mpos].set(1, mode="drop")
        key_pos = key_pos.at[rows, mpos].set(cur_pos[:, None] + j, mode="drop")
        last = jnp.take_along_axis(t, jnp.maximum(e - 1, 0)[:, None], 1)[:, 0]
        cur_tok = jnp.where(e > 0, last, cur_tok)
        done = done | has_eos
        return (cur_tok, cur_pos + e, write_idx + e, full_mask, key_pos,
                cache, out, n_emit + e, hist, hist_len + e, done,
                n_windows + 1)

    carry = (first, state["cur_pos"], write_idx, state["full_mask"],
             state["key_pos"], state["cache"], out, n_emit, hist, hist_len,
             done, jnp.int32(0))
    carry = jax.lax.while_loop(cond, body, carry)
    out, n_emit, n_windows = carry[6], carry[7], carry[11]
    tokens = out[:, :max_new]
    stats = {"windows": n_windows,
             "emitted": jnp.sum(jnp.minimum(n_emit, max_new))}
    if return_state:
        # returning the final state makes the input-state donation usable:
        # XLA aliases the multi-GB cache input to the output and updates it
        # in place (without a matching output the spec program holds TWO
        # cache-sized buffers — the same aliasing contract generate_decode
        # documents)
        final_state = {"logits": state["logits"], "cache": carry[5],
                       "full_mask": carry[3], "key_pos": carry[4],
                       "cur_pos": carry[1], "write_idx": carry[2]}
        if adapter_ids is not None:
            final_state["adapter_ids"] = adapter_ids
        return tokens, stats, final_state
    return tokens, stats
