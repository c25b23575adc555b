"""VQA evaluation pipeline (LLaVA greedy decode → VQA accuracy).

Capability parity with pipeline/LLaVAVQAVALPipeline.py: batched greedy decode
with KV cache over the VQA question set, per-class accuracy bucketing (the
reference's LLaMA-2+CLIP topic classifier becomes an optional injected
``topic_fn``), per-class CSV + overall accuracy via the VQA consensus
evaluator, and the 10%-subset smoke mode as a first-class ``limit`` argument
(the reference hardcodes the break at :187-188).

TPU-first: questions are bucketed to static prompt lengths and decoded in
batches under one jitted generate program per bucket — not the reference's
batch-size-1 host loop.
"""
from __future__ import annotations

import csv
import os
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cullavo_tpu.data.evaluation.vqa_eval import VQAEvaluator
from cullavo_tpu.data.step1_synthesis import SYSTEM_PROMPT
from cullavo_tpu.models.llava.config import LlavaConfig
from cullavo_tpu.models.llava.modeling import (GenerationConfig, expand_image_token,
                                               generate)
from cullavo_tpu.pipelines.base import register_pipeline


def _bucket(n: int, buckets=(64, 96, 128, 192, 256)) -> int:
    for b in buckets:
        if n <= b:
            return b
    # beyond the table (the real 576-image-token prompt is ~650 ids): round
    # UP to the next 64-multiple — clamping here would silently truncate
    # image tokens and the question itself
    return -(-n // 64) * 64


@register_pipeline("LLaVAVQAVALPipeline")
class VQAPipeline:
    def __init__(self, cfg, model_cfg: LlavaConfig, tokenizer, params,
                 topic_fn: Optional[Callable[[str], str]] = None,
                 batch_size: int = 8, max_new_tokens: int = 16,
                 prefill_chunk: Optional[int] = None,
                 kv_quant: Optional[str] = None,
                 lora: Optional[dict] = None, lora_scaling: float = 0.0,
                 spec_k: Optional[int] = None):
        self.cfg = cfg
        self.model_cfg = model_cfg
        self.tokenizer = tokenizer
        self.params = params
        # unmerged runtime adapters over the (quantized) base — the
        # reference's eval configuration (NF4 base + attached PEFT adapters,
        # load_cullavo.py:63-138 with RESUME_FROM)
        self.lora = lora
        self.lora_scaling = float(lora_scaling)
        self.topic_fn = topic_fn
        self.batch_size = batch_size
        self.max_new_tokens = max_new_tokens
        # prefill in chunks of this many rows, decode the whole batch at once
        # (decode cost is dominated by the batch-independent weight stream —
        # see modeling.generate_prefill_chunked); None = fused generate
        self.prefill_chunk = prefill_chunk
        # "int8": quantized KV cache — halves decode's dominant HBM stream
        # and the cache footprint (llama.init_kv_cache); None = bf16 cache
        self.kv_quant = kv_quant
        # speculative decode window (prompt-lookup drafting, greedy-only,
        # token-exact vs plain greedy — modeling.generate_decode_spec);
        # None/0 = plain decode
        self.spec_k = spec_k
        self.evaluator = VQAEvaluator()
        self.per_topic: dict[str, VQAEvaluator] = {}

    def build_prompt(self, question: str) -> np.ndarray:
        text = SYSTEM_PROMPT + "<image>" + f" USER: {question} ASSISTANT:"
        ids = np.asarray(self.tokenizer.encode(text), np.int32)
        ids, mask, _ = expand_image_token(ids, None, None,
                                          self.tokenizer.image_token_id,
                                          self.model_cfg.num_image_tokens)
        return ids

    def answer_batch(self, questions: list, pixel_values: np.ndarray) -> list:
        """Greedy decode a batch; pads prompts to a shared bucket length."""
        id_rows = [self.build_prompt(q) for q in questions]
        L = _bucket(max(len(r) for r in id_rows))
        B = len(id_rows)
        ids = np.full((B, L), self.tokenizer.pad_token_id, np.int32)
        mask = np.zeros((B, L), np.int32)
        for i, row in enumerate(id_rows):
            assert len(row) <= L, (len(row), L)   # bucket never truncates
            ids[i, :len(row)] = row
            mask[i, :len(row)] = 1
        gen = GenerationConfig(max_new_tokens=self.max_new_tokens, do_sample=False,
                               eos_token_id=self.tokenizer.eos_token_id)
        if self.spec_k or (self.prefill_chunk and self.prefill_chunk < B):
            from cullavo_tpu.models.llava.modeling import (
                generate_decode, generate_decode_spec,
                generate_prefill_chunked)

            from cullavo_tpu.models.llava.llama import round_cache_len

            # spec cache lengths round to the wwin kernel's block granularity
            cache_len = (L + self.max_new_tokens if not self.spec_k
                         else round_cache_len(L + self.max_new_tokens
                                              + self.spec_k))
            state = generate_prefill_chunked(
                self.params, self.model_cfg, jnp.asarray(ids),
                jnp.asarray(pixel_values), jnp.asarray(mask),
                cache_len, self.prefill_chunk or B,
                compute_dtype=jnp.bfloat16, kv_quant=self.kv_quant,
                lora=self.lora, lora_scaling=self.lora_scaling)
            if self.spec_k:
                out, _, _ = generate_decode_spec(
                    self.params, self.model_cfg, state, gen, self.spec_k,
                    jnp.asarray(ids), jnp.sum(jnp.asarray(mask), axis=1),
                    compute_dtype=jnp.bfloat16, lora=self.lora,
                    lora_scaling=self.lora_scaling, return_state=True)
            else:
                out = generate_decode(self.params, self.model_cfg, state, gen,
                                      compute_dtype=jnp.bfloat16,
                                      lora=self.lora,
                                      lora_scaling=self.lora_scaling)
        else:
            out = generate(self.params, self.model_cfg, jnp.asarray(ids),
                           jnp.asarray(pixel_values), jnp.asarray(mask), gen,
                           max_len=L + self.max_new_tokens,
                           compute_dtype=jnp.bfloat16, kv_quant=self.kv_quant,
                           lora=self.lora, lora_scaling=self.lora_scaling)
        answers = []
        for b in range(B):
            toks = np.asarray(out[b]).tolist()
            if self.tokenizer.eos_token_id in toks:
                toks = toks[:toks.index(self.tokenizer.eos_token_id)]
            answers.append(self.tokenizer.decode(toks).strip())
        return answers

    def evaluate_model(self, dataset: Iterable[dict], limit: Optional[int] = None,
                       out_dir: Optional[str] = None) -> dict:
        """dataset rows: {"question_id", "question", "pixel_values" [3,H,W],
        "answers": [10 strings], optional "question_type"/"answer_type"}."""
        # fresh accumulators per run: a second evaluate_model on the same
        # pipeline object must not double-count the first run's answers
        self.evaluator = VQAEvaluator()
        self.per_topic = {}
        rows = list(dataset)
        if limit:
            rows = rows[:limit]
        for i in range(0, len(rows), self.batch_size):
            chunk = rows[i:i + self.batch_size]
            pix = np.stack([r["pixel_values"] for r in chunk])
            answers = self.answer_batch([r["question"] for r in chunk], pix)
            for r, ans in zip(chunk, answers):
                topic = self.topic_fn(r["question"]) if self.topic_fn else None
                self.evaluator.process(r["question_id"], ans, r["answers"],
                                       r.get("question_type"), r.get("answer_type"))
                if topic is not None:
                    self.per_topic.setdefault(topic, VQAEvaluator()).process(
                        r["question_id"], ans, r["answers"])
        results = self.evaluator.evaluate()
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            self.evaluator.dump_results(os.path.join(out_dir, "vqa_results.json"))
            # per-class CSV like problem_experiment/*.csv (LLaVAVQAVALPipeline.py:122-219)
            with open(os.path.join(out_dir, "vqa_per_class.csv"), "w", newline="") as f:
                w = csv.writer(f)
                w.writerow(["class", "accuracy", "n"])
                for topic, ev in sorted(self.per_topic.items()):
                    r = ev.evaluate()
                    w.writerow([topic, r["overall"], r["n"]])
                w.writerow(["TOTAL", results["overall"], results["n"]])
        return results


@register_pipeline("LLaVAVQATESTPipeline")
class VQATestPipeline(VQAPipeline):
    """VQAv2 test / test-dev submission run (LLaVAVQATESTPipeline.py:29-143).

    Same decode path as the val pipeline, but test rows carry no annotations
    (``answers`` is None/absent), so no accuracy is computed — the run's
    product is the EvalAI submission JSON (``vqa_submission.json``, a list of
    ``{"question_id", "answer"}``, the cullavo/eval/vqav2 convert format).
    """

    def evaluate_model(self, dataset: Iterable[dict], limit: Optional[int] = None,
                       out_dir: Optional[str] = None) -> dict:
        self.evaluator = VQAEvaluator()   # fresh per run (no double-count)
        rows = list(dataset)
        if limit:
            rows = rows[:limit]
        for i in range(0, len(rows), self.batch_size):
            chunk = rows[i:i + self.batch_size]
            pix = np.stack([r["pixel_values"] for r in chunk])
            answers = self.answer_batch([r["question"] for r in chunk], pix)
            for r, ans in zip(chunk, answers):
                self.evaluator.process(r["question_id"], ans, r.get("answers"))
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            self.evaluator.dump_results(
                os.path.join(out_dir, "vqa_submission.json"))
        return {"n": len(self.evaluator.results), "submission": True}


def topic_prompt(question: str) -> str:
    """The reference's EXACT in-context topic-word prompt
    (LLaVAVQAVALPipeline.py:147-153 — note the missing period/space after
    'asks', reproduced verbatim)."""
    return ("Choose object the question asks" +
            "ex) what color is the man's shirt? shirt. " +
            "ex) how many bikes have helmets? helmets. " +
            "ex) were there any books on the table? books. " +
            "ex) what is he on top of? he. " +
            f"ex) where are the dogs looking at? dogs. ex) {question}")


def make_topic_fn(llama_params, llava_cfg, llama_tok, clip_params, clip_cfg,
                  clip_tok, class_names=None, seed: int = 0,
                  max_new_tokens: int = 10):
    """Core of the reference's question-topic classifier over ALREADY-BUILT
    native towers: LLaMA picks the object word via in-context sampling
    (LLaVAVQAVALPipeline.py:147-158, temp 0.9 / top-p 0.9 / ≤10 new tokens,
    decoded text split at the first '.'), then the CLIP text tower embeds
    'a photo of {word}' and buckets to the argmax-cosine class vs the
    precomputed 'a photo of {class}' embeddings (:113-116, :159-169 — the
    reference's topk(k=1) over a [1, C] score row IS the argmax).

    ``llama_tok``: HF-tokenizer-like (callable → {"input_ids"} and
    ``.decode``); ``clip_tok``: callable(texts, padding=True,
    return_tensors="np") → {"input_ids", "attention_mask"}.
    Returns ``topic_fn(question) -> class_name``."""
    import jax

    from cullavo_tpu.models.xdecoder.text_encoder import forward_language
    from cullavo_tpu.utils import constants

    # the reference buckets over COCO_SEMANTIC_CLASSES (91 names,
    # LLaVAVQAVALPipeline.py:36,113)
    class_names = class_names or list(constants.COCO_SEMANTIC_CLASSES)

    enc = clip_tok([f"a photo of {cl}" for cl in class_names], padding=True,
                   return_tensors="np")
    class_embeds = forward_language(clip_params, clip_cfg,
                                    jnp.asarray(enc["input_ids"]),
                                    jnp.asarray(enc["attention_mask"]))

    gen = GenerationConfig(max_new_tokens=max_new_tokens, do_sample=True,
                           temperature=0.9, top_p=0.9, top_k=0,
                           eos_token_id=getattr(llama_tok, "eos_token_id", 2)
                           or 2)
    rng_holder = {"key": jax.random.PRNGKey(seed)}

    def topic_fn(question: str) -> str:
        prompt = topic_prompt(question)
        ids = llama_tok(prompt, return_tensors="np")
        rng_holder["key"], sub = jax.random.split(rng_holder["key"])
        # pad the prompt to a bucketed length so `generate` (static shapes)
        # compiles once per bucket, not once per question length
        n = ids["input_ids"].shape[1]
        L = _bucket(n)
        row = np.zeros((1, L), np.int32)
        row[0, :n] = ids["input_ids"][0]
        m = np.zeros((1, L), np.int32)
        m[0, :n] = 1
        out = generate(llama_params, llava_cfg, jnp.asarray(row), None,
                       jnp.asarray(m), gen, max_len=L + max_new_tokens,
                       rng=sub)
        toks = np.asarray(out)[0].tolist()
        if gen.eos_token_id in toks:
            toks = toks[:toks.index(gen.eos_token_id)]
        # ours decodes only NEW tokens == the reference's [len(prompt):]
        # slice (LLaVAVQAVALPipeline.py:158)
        word = llama_tok.decode(toks,
                                skip_special_tokens=True).strip().split(".")[0]
        q = clip_tok([f"a photo of {word}"], padding=True,
                     return_tensors="np")
        emb = forward_language(clip_params, clip_cfg,
                               jnp.asarray(q["input_ids"]),
                               jnp.asarray(q["attention_mask"]))
        idx = int(jnp.argmax(class_embeds @ emb[0]))
        return class_names[idx]

    return topic_fn


def make_reference_topic_fn(llama_model_dir: str, clip_model_dir: str,
                            class_names=None, seed: int = 0,
                            max_new_tokens: int = 10):
    """The reference's question-topic classifier from HF checkpoint dirs
    (LLaMA-2-7b-chat + CLIP-L/336 in the reference,
    cullavo/utils/utils.py:3-10); see ``make_topic_fn`` for the semantics.
    Wired as the default ``topic_fn`` via the ``MODEL.TOPIC`` config block
    (entry._eval_vl)."""
    import jax
    import transformers

    from cullavo_tpu.checkpoint.hf_import import llama_from_causal_lm_state_dict
    from cullavo_tpu.models.llava.config import LlamaConfig, LlavaConfig
    from cullavo_tpu.models.xdecoder.text_encoder import (clip_text_config,
                                                          import_hf_clip_text)

    lt = transformers.AutoTokenizer.from_pretrained(llama_model_dir)
    lm_hf = transformers.AutoModelForCausalLM.from_pretrained(llama_model_dir)
    hc = lm_hf.config
    lcfg = LlamaConfig(
        vocab_size=hc.vocab_size, hidden_size=hc.hidden_size,
        intermediate_size=hc.intermediate_size,
        num_hidden_layers=hc.num_hidden_layers,
        num_attention_heads=hc.num_attention_heads,
        num_key_value_heads=getattr(hc, "num_key_value_heads",
                                    hc.num_attention_heads),
        max_position_embeddings=hc.max_position_embeddings,
        rms_norm_eps=hc.rms_norm_eps,
        rope_theta=getattr(hc, "rope_theta", 10000.0),
        sliding_window=getattr(hc, "sliding_window", None))
    state = {k: v.detach().cpu().numpy() for k, v in lm_hf.state_dict().items()}
    del lm_hf
    lparams = {"language_model": jax.tree.map(
        jnp.asarray, llama_from_causal_lm_state_dict(state, lcfg))}
    del state
    cfg = LlavaConfig(text=lcfg)

    ct = transformers.AutoTokenizer.from_pretrained(clip_model_dir)
    clip_hf = transformers.CLIPTextModelWithProjection.from_pretrained(clip_model_dir)
    ccfg = clip_text_config(width=clip_hf.config.hidden_size,
                            heads=clip_hf.config.num_attention_heads,
                            layers=clip_hf.config.num_hidden_layers,
                            dim_lang=clip_hf.config.projection_dim)
    cparams = import_hf_clip_text(
        {k: v.detach().cpu().numpy() for k, v in clip_hf.state_dict().items()}, ccfg)
    del clip_hf
    return make_topic_fn(lparams, cfg, lt, cparams, ccfg, ct,
                         class_names=class_names, seed=seed,
                         max_new_tokens=max_new_tokens)


class _ByteHFTok:
    """ByteTokenizer dressed in the HF tokenizer calling convention, for the
    checkpoint-free tiny topic classifier (``MODEL.TOPIC: tiny``).  The CLIP
    side's EOT position is ``argmax(input_ids)`` (text_encoder
    forward_language), so with ``eot_is_max`` every row ends with the top
    vocab id."""

    def __init__(self, vocab_size: int, max_len: int = 77,
                 eot_is_max: bool = False):
        from cullavo_tpu.data.tokenizer import ByteTokenizer

        self._bt = ByteTokenizer()
        self.vocab_size = vocab_size
        self.max_len = max_len
        self.eot_is_max = eot_is_max
        self.eos_token_id = self._bt.eos_token_id

    def __call__(self, texts, padding=True, return_tensors="np"):
        if isinstance(texts, str):
            texts = [texts]
        rows = []
        for t in texts:
            ids = [i % (self.vocab_size - 1) for i in self._bt.encode(t)]
            ids = ids[:self.max_len - 1]
            if self.eot_is_max:
                ids.append(self.vocab_size - 1)
            rows.append(ids)
        L = min(self.max_len, max(len(r) for r in rows))
        out = np.zeros((len(rows), L), np.int32)
        mask = np.zeros((len(rows), L), np.int32)
        for i, r in enumerate(rows):
            out[i, :len(r)] = r[:L]
            mask[i, :len(r)] = 1
        return {"input_ids": out, "attention_mask": mask}

    def decode(self, ids, skip_special_tokens=True):
        return self._bt.decode(ids, skip_special_tokens)


def make_tiny_topic_fn(class_names=None, seed: int = 0,
                       max_new_tokens: int = 10):
    """Checkpoint-free topic classifier on tiny RANDOM towers (smoke/CI):
    the same code path as ``make_reference_topic_fn`` — in-context LLaMA
    sampling + CLIP text-match bucketing — with byte tokenizers, so the
    ``vl_test`` per-class CSV is produced end-to-end with no real weights
    (the tiny-model analogue of ``MODEL.TINY``)."""
    import jax

    from cullavo_tpu.models.llava.config import tiny_llava_config
    from cullavo_tpu.models.llava.modeling import init_llava_params
    from cullavo_tpu.models.xdecoder.text_encoder import (
        TextEncoderConfig, init_text_encoder_params)

    lcfg = tiny_llava_config(260)
    lparams = init_llava_params(lcfg, jax.random.PRNGKey(seed))
    lparams = {"language_model": lparams["language_model"]}
    ccfg = TextEncoderConfig(width=32, heads=4, layers=2, dim_lang=32,
                             vocab_size=260, context_length=64)
    cparams = init_text_encoder_params(ccfg, jax.random.PRNGKey(seed + 1))
    lt = _ByteHFTok(lcfg.text.vocab_size)
    ct = _ByteHFTok(ccfg.vocab_size, max_len=ccfg.context_length,
                    eot_is_max=True)
    return make_topic_fn(lparams, lcfg, lt, cparams, ccfg, ct,
                         class_names=class_names, seed=seed,
                         max_new_tokens=max_new_tokens)
