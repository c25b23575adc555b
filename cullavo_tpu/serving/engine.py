"""Continuous-batching serving engine for the LLaVA family.

The reference repo has no serving layer (its eval pipelines run fixed
batches, pipeline/LLaVAVQAVALPipeline.py:171-180 is batch-1 greedy); this
module is a TPU-native EXTENSION for production serving on top of the
existing generation machinery:

  * requests arrive at any time (``submit``) with their own prompt length,
    image, and token budget;
  * prompts are padded to a small set of BUCKET lengths and prefilled in
    fixed-size chunks (``generate_prefill`` — one compiled program per
    bucket, the axon/XLA static-shape discipline);
  * each prefilled request is written into a free row of a persistent
    decode POOL (``write_slot`` — donated, in-place) whose rows advance
    independently: per-row write positions / positions / done flags
    (``decode_quantum`` + llama_forward's per-row scatter path);
  * decode runs in fixed QUANTA of ``quantum`` tokens over the whole pool;
    between quanta the host harvests finished rows (EOS or budget) and
    admits queued requests into the freed slots.

Iteration-level scheduling (Orca/vLLM-style continuous batching) is the
throughput lever at 7B decode: the per-step weight stream is
batch-independent, so keeping every pool row busy amortizes it — a static
batch leaves slots idle for the duration of the longest request, this
engine refills them after at most one quantum.

Everything on-device is static-shaped: pool size, bucket set, quantum, and
prefill chunk are fixed at engine construction, so steady-state serving
compiles (num_buckets + 2) programs and never recompiles.
"""
from __future__ import annotations

import collections
import dataclasses
import os
import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from cullavo_tpu.models.llava.config import LlavaConfig
from cullavo_tpu.models.llava.modeling import (GenerationConfig,
                                               _sample_token,
                                               alloc_decode_state,
                                               decode_quantum,
                                               decode_quantum_spec,
                                               extract_prefix_state,
                                               generate_prefill,
                                               generate_prefill_prefix,
                                               write_slot, write_slots)


@dataclasses.dataclass
class Request:
    """One generation request.  ``input_ids`` must already contain the
    expanded image-token run when ``pixel_values`` is given (the pipeline's
    prompt-builder contract, data/step1_synthesis.py::expand_image_token)."""
    req_id: int
    input_ids: np.ndarray                       # [T] int32
    pixel_values: Optional[np.ndarray] = None   # [3, H, W] float32
    max_new_tokens: int = 16
    adapter_id: int = 0                         # row of the engine's stacked
                                                # adapters (0 when none)
    extra_hist: Optional[np.ndarray] = None     # [E] int32 extra lookup
                                                # corpus for spec_k engines
                                                # (retrieved text, prior
                                                # turns); prepended to the
                                                # prompt in the n-gram table


class ServingEngine:
    """Continuous-batching engine over a fixed slot pool.

    Parameters
    ----------
    params, cfg : the LLaVA params/config (quantized bases welcome).
    gen : sampling configuration (shared across requests; ``max_new_tokens``
        is ignored — each request carries its own budget).
    num_slots : decode pool rows (the decode batch).
    max_len : pool cache length; every admitted request needs
        ``bucket(T) + max_new_tokens <= max_len``.
    prompt_buckets : ascending prompt pad lengths; each bucket is one
        compiled prefill program.
    prefill_chunk : rows per prefill call (fixed — short groups are padded
        with inert rows so the program count stays static).
    quantum : decode steps between scheduler interventions.  Smaller =
        faster slot turnaround, more host round-trips.
    """

    def __init__(self, params, cfg: LlavaConfig, gen: GenerationConfig, *,
                 num_slots: int = 8, max_len: int, prompt_buckets=(128, 256),
                 prefill_chunk: int = 2, quantum: int = 8,
                 kv_quant: Optional[str] = None,
                 compute_dtype=jnp.bfloat16, seed: int = 0,
                 lora: Optional[dict] = None, lora_scaling: float = 0.0,
                 spec_k: Optional[int] = None,
                 prefix_cache: bool = True, prefix_min: int = 32,
                 suffix_buckets=(32, 64, 128),
                 max_prefixes: Optional[int] = None,
                 admit_groups: Optional[int] = 1):
        self.params = params
        self.cfg = cfg
        self.gen = gen
        # unmerged runtime adapters (quantized bases can't fold them in).
        # A MULTI-stacked LLM adapter dict (lora.stack_adapter_sets) serves
        # per-request adapters: each Request.adapter_id picks its row.
        self.lora = lora
        self.lora_scaling = float(lora_scaling)
        self._num_adapters = 1
        if lora:
            leaves = [a for t in (lora.get("language_model") or {}).values()
                      if isinstance(t, dict)
                      for a in [t.get("a")] if a is not None]
            if leaves and leaves[0].ndim == 4:
                self._num_adapters = int(leaves[0].shape[1])
        self.num_slots = int(num_slots)
        self.max_len = int(max_len)
        self.buckets = tuple(sorted(int(b) for b in prompt_buckets))
        self.prefill_chunk = int(prefill_chunk)
        self.quantum = int(quantum)
        # speculative decode (prompt-lookup windows inside each quantum,
        # decode_quantum_spec): greedy-only, token-exact vs plain quanta
        # (up to f32 near-tie argmax — see generate_decode_spec's caveat).
        # The per-slot lookup corpus lives in self.hist (device), filled at
        # admission with the prompt + first token
        self.spec_k = int(spec_k) if spec_k else None
        if self.spec_k is not None and gen.do_sample:
            # spec is greedy-only (a draft survives only when it equals the
            # argmax); serve.yaml ships SPEC_K 4 by default, so a config that
            # merely flips DO_SAMPLE must not crash — disable spec instead
            import sys

            print("[engine] do_sample=True disables speculative decoding "
                  "(spec_k is greedy-only); continuing with plain quanta",
                  file=sys.stderr)
            self.spec_k = None
        if self.spec_k is not None:
            # round the pool cache to the wwin flash-decode kernel's block
            # granularity (capacity only grows; extra slots stay masked)
            from cullavo_tpu.models.llava.llama import round_cache_len

            self.max_len = round_cache_len(self.max_len + self.spec_k)
        self.hist: Optional[dict] = None
        self.kv_quant = kv_quant
        self.compute_dtype = compute_dtype
        # -- prefix-KV cache (beyond the reference; vLLM-style automatic
        # prefix caching adapted to static shapes).  Requests sharing a
        # prompt head — the system prompt across a text corpus, or the whole
        # image run for multi-question-per-image VQA — prefill only their
        # suffix from a stored 1-row KV prefix (generate_prefill_prefix).
        # Registry keys: (image fingerprint | None, adapter_id), LRU-bounded;
        # each entry costs one pool-row of HBM (counted in the fit below).
        self.prefix_cache = bool(prefix_cache)
        self.prefix_min = int(prefix_min)       # min shared head worth reusing
        self.suffix_buckets = tuple(sorted(int(b) for b in suffix_buckets))
        # registry capacity must cover the distinct keys a full admission
        # drain registers before their repeats re-plan (one full group can
        # register prefill_chunk NEW images) — a cap of 2 measured near-zero
        # hits on a 3-questions-per-image stream (registered entries were
        # LRU-evicted by the next group before their repeats admitted)
        self.max_prefixes = (int(max_prefixes) if max_prefixes is not None
                             else max(4, self.num_slots // 2))
        self._prefix_reg: collections.OrderedDict = collections.OrderedDict()
        self._req_keys: dict = {}               # req_id -> registry key
        # scheduler stats (exposed via /stats and the serve bench)
        self.counters = {"prefix_hits": 0, "prefix_misses": 0,
                         "prefix_tokens_saved": 0, "prefill_rows": 0,
                         "prefill_pad_rows": 0}
        # admission pacing: at most this many prefill groups per step() while
        # decode rows are ACTIVE (bounds how long in-flight rows stall behind
        # prefills); an idle engine always drains its queue.  None = drain
        # every step (the round-4 behavior).
        self.admit_groups = admit_groups if admit_groups is None \
            else int(admit_groups)
        self._fit_slots_to_hbm()
        self._rng = jax.random.PRNGKey(seed)
        # one write_slots dispatch per admission group instead of per-slot
        # write_slot calls — measured slower on a v5e (see _admit), opt-in
        self._batched_admit = bool(int(
            os.environ.get("CULLAVO_SERVE_BATCHED_ADMIT", "0")))

        self.pool: Optional[dict] = None
        self.free: list = list(range(self.num_slots))
        self.pending: collections.deque = collections.deque()
        # slot -> [request, emitted-token list]
        self.active: dict = {}
        self.results: dict = {}
        # req_id -> {"submit"/"first_token"/"done": perf_counter seconds};
        # exposed as latency() — TTFT is first_token-submit, E2E done-submit
        # (done is observed at quantum harvest, so it quantizes to quantum
        # boundaries, as in any iteration-scheduled engine)
        self.times: dict = {}
        # pixel shape for inert pad rows, learned from the first image
        self._pix_shape = (3, cfg.vision.image_size, cfg.vision.image_size)

    # -- memory fit ---------------------------------------------------------
    def _pool_bytes_per_slot(self) -> int:
        """HBM bytes one decode-pool row costs at the (possibly spec-rounded)
        cache length: k+v planes, plus the int8 mode's bf16 scale planes
        ([L, S, B, KV] — llama.alloc cache layout).  The unquantized cache
        stores ``compute_dtype`` elements (4 bytes under float32 engines —
        a hardcoded 2 would under-count the pool 2x and defeat the fit)."""
        t = self.cfg.text
        kv_elems = (2 * t.num_hidden_layers * self.max_len
                    * t.num_key_value_heads * t.head_dim)
        if self.kv_quant == "int8":
            scale_elems = (2 * t.num_hidden_layers * self.max_len
                           * t.num_key_value_heads)
            return kv_elems + scale_elems * 2
        return kv_elems * jnp.dtype(self.compute_dtype).itemsize

    def _fit_slots_to_hbm(self) -> None:
        """Derate ``num_slots`` (with a warning) when the decode pool cannot
        fit next to the weights in device memory — e.g. the bf16-KV pool at
        16 slots with spec's 128-rounded cache needs ~0.45 GB more than a
        16 GB v5e has (STATUS round 4).  Budget: ``CULLAVO_SERVE_HBM_GB``
        env override, else the device's ``memory_stats`` bytes_limit; when
        neither is known (CPU tests) nothing changes.  An engine whose pool
        cannot fit even one slot fails fast with the numbers."""
        budget = None
        env = os.environ.get("CULLAVO_SERVE_HBM_GB")
        if env:
            budget = float(env) * 1e9
        else:
            try:
                stats = jax.local_devices()[0].memory_stats()
                budget = float(stats["bytes_limit"])
            except Exception:
                return
        weights = sum(
            getattr(v, "nbytes", 0)
            for v in jax.tree.leaves((self.params, self.lora or {})))
        avail = budget * 0.92 - weights          # 8% workspace margin
        per_slot = self._pool_bytes_per_slot()
        if self.prefix_cache:
            # each registry entry holds one pool-row-sized 1-row cache
            avail -= self.max_prefixes * per_slot
        fit = int(avail // per_slot)
        if fit < 1:
            raise ValueError(
                f"decode pool cannot fit: one slot needs {per_slot/1e9:.2f} "
                f"GB at max_len={self.max_len} kv_quant={self.kv_quant} but "
                f"only {max(avail, 0)/1e9:.2f} GB remain of the "
                f"{budget/1e9:.1f} GB budget after {weights/1e9:.2f} GB of "
                f"weights (set KV_QUANT: int8, shorten MAX_LEN, or raise "
                f"CULLAVO_SERVE_HBM_GB if the device is larger)")
        if fit < self.num_slots:
            import sys

            print(f"[engine] derating SLOTS {self.num_slots} -> {fit}: "
                  f"pool needs {self.num_slots * per_slot/1e9:.2f} GB "
                  f"(kv_quant={self.kv_quant}, max_len={self.max_len}"
                  f"{', spec-rounded' if self.spec_k else ''}) but only "
                  f"{avail/1e9:.2f} GB fit next to {weights/1e9:.2f} GB of "
                  f"weights in the {budget/1e9:.1f} GB budget",
                  file=sys.stderr)
            self.num_slots = fit    # the constructor builds self.free next

    # -- submission ---------------------------------------------------------
    def submit(self, req: Request) -> int:
        T = int(len(req.input_ids))
        b = self._bucket(T)
        if b + req.max_new_tokens > self.max_len:
            raise ValueError(
                f"request {req.req_id}: bucket({T})={b} + "
                f"max_new_tokens={req.max_new_tokens} exceeds max_len="
                f"{self.max_len}")
        if not (0 <= req.adapter_id < self._num_adapters):
            raise ValueError(
                f"request {req.req_id}: adapter_id {req.adapter_id} out of "
                f"range (engine serves {self._num_adapters} adapter(s))")
        # results are keyed by req_id — a duplicate would silently
        # overwrite another request's stream
        if (req.req_id in self.results
                or any(r.req_id == req.req_id for r in self.pending)
                or any(st[0].req_id == req.req_id
                       for st in self.active.values())):
            raise ValueError(f"duplicate req_id {req.req_id}")
        self.times[req.req_id] = {"submit": time.perf_counter()}
        self.pending.append(req)
        return req.req_id

    def _bucket(self, T: int) -> int:
        for b in self.buckets:
            if T <= b:
                return b
        raise ValueError(f"prompt length {T} exceeds the largest bucket "
                         f"{self.buckets[-1]}")

    # -- prefix registry ----------------------------------------------------
    def _req_key(self, req: Request):
        """Registry key: (image fingerprint | None, adapter_id).  Cached per
        req_id (the pixel hash reads ~1.3 MB)."""
        k = self._req_keys.get(req.req_id)
        if k is None:
            if req.pixel_values is not None:
                import hashlib

                fp = hashlib.md5(
                    np.ascontiguousarray(req.pixel_values)).hexdigest()
            else:
                fp = None
            k = (fp, int(req.adapter_id))
            self._req_keys[req.req_id] = k
        return k

    def _plan(self, req: Request):
        """Prefill plan for a request: ``("full", bucket)`` or
        ``("prefix", key, P, W_b)`` — reuse the registered prefix's first P
        tokens and prefill a W_b-bucket suffix (layout [0, P + W_b))."""
        ids = np.asarray(req.input_ids)
        if self.prefix_cache:
            key = self._req_key(req)
            entry = self._prefix_reg.get(key)
            if entry is not None:
                stored = entry["ids"]
                n = min(len(stored), len(ids), len(ids) - 1)  # ≥1-token suffix
                eq = stored[:n] == ids[:n]
                lcp = int(n if eq.all() else np.argmin(eq))
                # the reuse point must NOT split an image-token run: the
                # suffix forward ranks its image slots from 0
                # (merge_image_features), so a cut inside the run would hand
                # the trailing image tokens the WRONG features — silent
                # output corruption.  A cut at either boundary is exact
                # (run fully in the prefix, or fully in the suffix).
                img = np.nonzero(ids == self.cfg.image_token_id)[0]
                run = (int(img[0]), int(img[-1]) + 1) if img.size else None
                for wb in self.suffix_buckets:
                    # the reuse point may sit BELOW the LCP: the layout
                    # [0, P + wb) plus the decode budget must fit the pool
                    # cache, and P rounds down to a 32-multiple so requests
                    # with different question/budget lengths share one
                    # (P, wb) admission group (identical prefix tokens make
                    # any P ≤ LCP token-exact)
                    p = min(lcp, self.max_len - wb - req.max_new_tokens)
                    if run and run[0] < p < run[1]:
                        p = run[0]
                    if p >= 64:
                        p = (p // 32) * 32
                    if p >= self.prefix_min and len(ids) - p <= wb:
                        self._prefix_reg.move_to_end(key)       # LRU touch
                        return ("prefix", key, int(p), wb)
        return ("full", self._bucket(len(ids)))

    def _maybe_register(self, group, chunk):
        """Store new prefixes out of a finished prefill chunk: each row's
        cache IS the full KV of its prompt, so one device slice
        (extract_prefix_state) seeds the registry for later requests sharing
        that image/prompt head."""
        if not self.prefix_cache:
            return
        for i, r in enumerate(group):
            key = self._req_key(r)
            if key in self._prefix_reg or len(r.input_ids) < self.prefix_min + 1:
                continue
            self._prefix_reg[key] = {
                "ids": np.asarray(r.input_ids, np.int32),
                "state": extract_prefix_state(chunk, i)}
            while len(self._prefix_reg) > self.max_prefixes:
                self._prefix_reg.popitem(last=False)

    @staticmethod
    def _pow2_rows(n: int, cap: int) -> int:
        """Smallest power-of-two chunk that fits the group (≤ cap): single
        arrivals in open-loop serving prefill 1 row instead of padding to
        the full chunk (which wasted chunk-1 rows of prefill compute);
        compiles at most log2(cap) shapes per plan."""
        if os.environ.get("CULLAVO_SERVE_POW2_CHUNKS", "1") == "0":
            return cap
        b = 1
        while b < n:
            b *= 2
        return min(b, cap)

    # -- admission ----------------------------------------------------------
    def _admit(self, max_groups: Optional[int] = None):
        """Prefill queued requests (grouped by prefill plan, right-sized
        chunk rows) and write them into free slots.  ``max_groups`` bounds
        the prefill programs run this call (admission pacing — see
        ``admit_groups``)."""
        n_groups = 0
        while self.pending and self.free and (max_groups is None
                                              or n_groups < max_groups):
            self._admit_one_group()
            n_groups += 1

    def _admit_one_group(self):
        # take up to prefill_chunk pending requests sharing the first
        # pending request's plan, bounded by the free slots
        lead = self._plan(self.pending[0])
        group, rest = [], collections.deque()
        group_key_ids: dict = {}
        while self.pending and len(group) < min(self.prefill_chunk,
                                                len(self.free)):
            r = self.pending.popleft()
            if self._plan(r) != lead:
                rest.append(r)
                continue
            if lead[0] == "full" and self.prefix_cache:
                # defer same-key requests out of a full-prefill group: this
                # chunk REGISTERS its keys, so the deferred ones re-plan as
                # prefix hits next group instead of paying a second full
                # prefill.  Only when deferral would actually BUY a hit —
                # text-only requests all share the (None, adapter) key, and
                # deferring unrelated prompts (tiny LCP, no reuse possible)
                # would degrade admission to one row per group.
                key = self._req_key(r)
                earlier = group_key_ids.get(key)
                if earlier is not None:
                    ids_r = np.asarray(r.input_ids)
                    n = min(len(earlier), len(ids_r))
                    eq = earlier[:n] == ids_r[:n]
                    lcp = int(n if eq.all() else np.argmin(eq))
                    if lcp >= self.prefix_min:
                        rest.append(r)
                        continue
                else:
                    group_key_ids[key] = np.asarray(r.input_ids)
            group.append(r)
        # skipped (different-plan) requests keep their arrival order
        while rest:
            self.pending.appendleft(rest.pop())

        chunk_b = self._pow2_rows(len(group), self.prefill_chunk)
        self.counters["prefill_rows"] += chunk_b
        self.counters["prefill_pad_rows"] += chunk_b - len(group)
        aids = np.zeros((chunk_b,), np.int32)
        for i, r in enumerate(group):
            aids[i] = r.adapter_id

        if lead[0] == "prefix":
            _, key, P, wb = lead
            self.counters["prefix_hits"] += len(group)
            self.counters["prefix_tokens_saved"] += P * len(group)
            sfx = np.zeros((chunk_b, wb), np.int32)
            smask = np.zeros((chunk_b, wb), np.int32)
            for i, r in enumerate(group):
                row = np.asarray(r.input_ids, np.int32)[P:]
                sfx[i, :len(row)] = row
                smask[i, :len(row)] = 1
            for i in range(len(group), chunk_b):
                smask[i, 0] = 1          # inert pad rows (see full path)
            # the suffix carries the image run only when the shared head
            # ends before it (text-shared-prefix corpora); same-image reuse
            # has the whole run inside the prefix
            pix = None
            if any((np.asarray(r.input_ids)[P:] ==
                    self.cfg.image_token_id).any()
                   for r in group if r.pixel_values is not None):
                pix = np.zeros((chunk_b,) + self._pix_shape, np.float32)
                for i, r in enumerate(group):
                    if r.pixel_values is not None:
                        pix[i] = r.pixel_values
            chunk = generate_prefill_prefix(
                self.params, self.cfg, self._prefix_reg[key]["state"],
                jnp.asarray(sfx),
                None if pix is None else jnp.asarray(pix),
                jnp.asarray(smask), P,
                compute_dtype=self.compute_dtype,
                lora=self.lora, lora_scaling=self.lora_scaling,
                adapter_ids=jnp.asarray(aids))
        else:
            bucket = lead[1]
            if self.prefix_cache:
                self.counters["prefix_misses"] += len(group)
            ids = np.zeros((chunk_b, bucket), np.int32)
            mask = np.zeros((chunk_b, bucket), np.int32)
            any_pix = any(r.pixel_values is not None for r in group)
            pix = (np.zeros((chunk_b,) + self._pix_shape, np.float32)
                   if any_pix else None)
            for i, r in enumerate(group):
                T = len(r.input_ids)
                ids[i, :T] = np.asarray(r.input_ids, np.int32)
                mask[i, :T] = 1
                if r.pixel_values is not None:
                    pix[i] = r.pixel_values
            # inert pad rows (group < chunk): all-pad masks would make
            # last_idx negative in generate_prefill; give them 1 valid token
            for i in range(len(group), chunk_b):
                mask[i, 0] = 1
            chunk = generate_prefill(
                self.params, self.cfg, jnp.asarray(ids),
                None if pix is None else jnp.asarray(pix),
                jnp.asarray(mask), self.max_len,
                compute_dtype=self.compute_dtype, kv_quant=self.kv_quant,
                lora=self.lora, lora_scaling=self.lora_scaling,
                adapter_ids=jnp.asarray(aids))
        self._maybe_register(group, chunk)
        self._rng, sub = jax.random.split(self._rng)
        first = np.asarray(_sample_token(chunk["logits"], self.gen, sub))
        t_first = time.perf_counter()

        if self.pool is None:
            self.pool = alloc_decode_state(chunk, self.num_slots)
            self.pool["write_idx"] = jnp.zeros((self.num_slots,),
                                               jnp.int32)
            self.pool["cur_tok"] = jnp.zeros((self.num_slots,), jnp.int32)
            # idle rows decode as done (emit eos, write nothing useful)
            self.pool["done"] = jnp.ones((self.num_slots,), jnp.bool_)
        if self.spec_k is not None and self.hist is None:
            cap = self.max_len + self.quantum + self.spec_k
            self.hist = {
                "hist": jnp.zeros((self.num_slots, cap), jnp.int32),
                "hist_len": jnp.zeros((self.num_slots,), jnp.int32)}

        # slot -1 = not admitted (pad rows, finished-at-admission)
        slots_vec = np.full((chunk_b,), -1, np.int32)
        for i, r in enumerate(group):
            tok = int(first[i])
            out = [tok]
            self.times[r.req_id]["first_token"] = t_first
            if tok == self.gen.eos_token_id or r.max_new_tokens <= 1:
                # finished at admission — never occupies a slot
                self.results[r.req_id] = out
                self.times[r.req_id]["done"] = t_first
                self._req_keys.pop(r.req_id, None)
                continue
            slot = self.free.pop()
            slots_vec[i] = slot
            self.active[slot] = [r, out]
        if not (slots_vec >= 0).any():
            return
        if self._batched_admit:
            # one donated dispatch for the whole group — measured
            # SLOWER on a v5e (7B: 8.54→7.69 and 9.44→8.73 req/s):
            # the advanced-index cache scatter loses to per-slot
            # contiguous dynamic_update_slice slabs by more than the
            # saved ~10 ms dispatches; kept opt-in for re-testing
            # (CULLAVO_SERVE_BATCHED_ADMIT=1)
            self.pool = write_slots(
                self.pool, chunk, slots_vec, first,
                np.zeros((chunk_b,), bool))
        else:
            for i in np.nonzero(slots_vec >= 0)[0]:
                # done0=False: eos-at-admission rows never reach a slot
                self.pool = write_slot(self.pool, chunk, int(i),
                                       int(slots_vec[i]),
                                       int(first[i]), False)
        if self.spec_k is not None:
            cap = self.hist["hist"].shape[1]
            for i, r in enumerate(group):
                slot = int(slots_vec[i])
                if slot < 0:
                    continue
                # lookup corpus = valid prompt tokens + the first
                # sampled token (current token LAST, the _ngram_draft
                # contract); extra_hist (e.g. retrieved text) prepends
                row = np.zeros((cap,), np.int32)
                pre = (np.asarray(r.extra_hist, np.int32)
                       if getattr(r, "extra_hist", None) is not None
                       else np.zeros((0,), np.int32))
                T = len(r.input_ids)
                n = len(pre) + T + 1
                row[:len(pre)] = pre
                row[len(pre):len(pre) + T] = np.asarray(r.input_ids,
                                                        np.int32)
                row[len(pre) + T] = int(first[i])
                self.hist["hist"] = self.hist["hist"].at[slot].set(
                    jnp.asarray(row))
                self.hist["hist_len"] = self.hist["hist_len"].at[slot].set(n)

    # -- scheduling ---------------------------------------------------------
    def step(self):
        """One scheduler iteration: admit into free slots, then decode one
        quantum over the pool and harvest finished rows.  While rows are
        actively decoding, at most ``admit_groups`` prefill programs run per
        step (each prefill stalls every in-flight row for its duration — the
        open-loop TTFT/E2E tail); an idle engine drains its whole queue
        before the first quantum."""
        self._admit(None if not self.active else self.admit_groups)
        if not self.active:
            return
        self._rng, sub = jax.random.split(self._rng)
        if self.spec_k is not None:
            toks, n_emit, self.pool, self.hist = decode_quantum_spec(
                self.params, self.cfg, self.pool, self.hist, self.gen,
                self.quantum, self.spec_k, compute_dtype=self.compute_dtype,
                lora=self.lora, lora_scaling=self.lora_scaling)
            toks = np.asarray(toks)                 # [num_slots, quantum]
            n_emit = np.asarray(n_emit)
        else:
            toks, self.pool = decode_quantum(
                self.params, self.cfg, self.pool, self.gen, self.quantum,
                rng=sub, compute_dtype=self.compute_dtype,
                lora=self.lora, lora_scaling=self.lora_scaling)
            toks = np.asarray(toks)                 # [num_slots, quantum]
            n_emit = np.full((toks.shape[0],), toks.shape[1], np.int64)
        for slot in list(self.active):
            req, out = self.active[slot]
            for t in toks[slot][:n_emit[slot]]:
                t = int(t)
                out.append(t)
                if t == self.gen.eos_token_id or len(out) >= req.max_new_tokens:
                    break
            if (out and out[-1] == self.gen.eos_token_id) \
                    or len(out) >= req.max_new_tokens:
                self.results[req.req_id] = out[:req.max_new_tokens]
                self.times[req.req_id]["done"] = time.perf_counter()
                self._req_keys.pop(req.req_id, None)
                del self.active[slot]
                self.free.append(slot)

    def run(self) -> dict:
        """Drive until every submitted request has a result; returns
        {req_id: [token, ...]}."""
        while self.pending or self.active:
            self.step()
        return self.results

    def latency(self) -> dict:
        """Per-request latency stats over completed requests:
        {"ttft": {"p50": ..., "p95": ...}, "e2e": {...}} in seconds."""
        ttft = [t["first_token"] - t["submit"] for t in self.times.values()
                if "first_token" in t]
        e2e = [t["done"] - t["submit"] for t in self.times.values()
               if "done" in t]
        def pct(xs):
            return {"p50": round(float(np.percentile(xs, 50)), 4),
                    "p95": round(float(np.percentile(xs, 95)), 4)} if xs else {}
        return {"ttft": pct(ttft), "e2e": pct(e2e)}
