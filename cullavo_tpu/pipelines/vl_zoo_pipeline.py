"""Zero-shot VL benchmark pipelines for the HF model zoo.

Capability parity with the reference's per-model pipelines
(pipeline/BLIP2VQAVALPipeline.py, InstructBLIP*, KOSMOS2VQAVALPipeline.py,
BakLLaVAVQAVALPipeline.py, BLIP2ImageNetPipeline.py, …): each wraps a
HuggingFace checkpoint with its generation settings (BLIP-2: beam-5,
length-penalty −1, ≤10 new tokens at BLIP2VQAVALPipeline.py:175; KOSMOS-2:
fp32 load at :99) and runs the VQA / ImageNet harness.

One generic class replaces the five near-identical ~300-LoC files: the
model-specific part is reduced to a ``ModelSpec`` describing the processor
prompt format and generation kwargs.  These run the HF models as-is (the
reference does the same — they are baselines, not CuLLaVO itself); the
TPU-native path is the LLaVA pipeline in vqa_pipeline.py.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Iterable, Optional

import numpy as np

from cullavo_tpu.data.evaluation.vqa_eval import VQAEvaluator
from cullavo_tpu.pipelines.base import register_pipeline


@dataclasses.dataclass
class ModelSpec:
    name: str
    model_cls: str                      # transformers class name
    prompt: str = "Question: {q} Short answer:"
    gen_kwargs: dict = dataclasses.field(default_factory=dict)
    dtype: str = "float32"


MODEL_SPECS = {
    # pipeline/BLIP2VQAVALPipeline.py:100-217 (beam 5, len-penalty -1, ≤10 tok)
    "blip2": ModelSpec("Salesforce/blip2-flan-t5-xl",
                       "Blip2ForConditionalGeneration",
                       prompt="Question: {q} Short answer:",
                       gen_kwargs=dict(num_beams=5, max_new_tokens=10,
                                       length_penalty=-1.0)),
    # pipeline/InstructBLIPVQAVALPipeline.py
    "instructblip": ModelSpec("Salesforce/instructblip-vicuna-7b",
                              "InstructBlipForConditionalGeneration",
                              prompt="{q} Answer briefly.",
                              gen_kwargs=dict(num_beams=5, max_new_tokens=10,
                                              length_penalty=-1.0)),
    # pipeline/KOSMOS2VQAVALPipeline.py:99 (fp32 load) / :170 prompt (no
    # <grounding> prefix in the VQA eval) / :182-183 answer extraction
    "kosmos2": ModelSpec("microsoft/kosmos-2-patch14-224",
                         "Kosmos2ForConditionalGeneration",
                         prompt="Question: {q} Answer:",
                         gen_kwargs=dict(max_new_tokens=10)),
    # pipeline/BakLLaVAVQAVALPipeline.py (greedy, KV cache).  BakLLaVA also
    # has a TPU-native path: it is LLaVA-arch on a Mistral decoder, so
    # ``bakllava_config()`` + the safetensors importer runs it through
    # vqa_pipeline.py entirely in JAX (sliding-window attention included;
    # greedy-parity tested in test_llava_parity.py).
    "bakllava": ModelSpec("llava-hf/bakLlava-v1-hf",
                          "LlavaForConditionalGeneration",
                          prompt="USER: <image>\n{q} ASSISTANT:",
                          gen_kwargs=dict(do_sample=False, max_new_tokens=128)),
}


def native_bakllava_answer_fn(model_dir: str, max_new_tokens: int = 128):
    """TPU-native BakLLaVA: import the HF checkpoint once, answer via the
    JAX two-phase generate (inject as ``answer_fn`` into VLZooVQAPipeline)."""
    import jax.numpy as jnp

    from cullavo_tpu.checkpoint.hf_import import load_llava_safetensors
    from cullavo_tpu.data.image_processing import preprocess_numpy
    from cullavo_tpu.data.tokenizer import HFTokenizer
    from cullavo_tpu.models.llava.config import bakllava_config
    from cullavo_tpu.models.llava.modeling import (GenerationConfig,
                                                   expand_image_token, generate)

    cfg = bakllava_config()
    params = load_llava_safetensors(model_dir, cfg, dtype=np.float32)
    tok = HFTokenizer(model_dir)
    gen = GenerationConfig(max_new_tokens=max_new_tokens, do_sample=False,
                           eos_token_id=tok.eos_token_id)

    def answer(question: str, image) -> str:
        text = MODEL_SPECS["bakllava"].prompt.format(q=question)
        ids = tok.encode(text)
        ids, mask, _ = expand_image_token(ids, None, None, tok.image_token_id,
                                          cfg.num_image_tokens)
        ids = np.asarray(ids, np.int32)[None]
        pix = preprocess_numpy([np.asarray(image)], cfg.vision.image_size)
        out = generate(params, cfg, jnp.asarray(ids), jnp.asarray(pix),
                       jnp.asarray(np.asarray(mask, np.int32)[None]), gen,
                       max_len=ids.shape[1] + max_new_tokens)
        return tok.decode(np.asarray(out)[0], skip_special_tokens=True).strip()

    return answer


def _blip2_cfg_cls(kind: str):
    """kind -> (config, HF class name) shared by the answer and imagenet
    factories (was duplicated and could silently diverge)."""
    from cullavo_tpu.models.blip2.config import (Blip2Config,
                                                 blip2_flant5xl_config,
                                                 instructblip_vicuna7b_config)

    if kind == "flant5":
        return blip2_flant5xl_config(), "Blip2ForConditionalGeneration"
    if kind == "opt":
        return Blip2Config(), "Blip2ForConditionalGeneration"
    return (instructblip_vicuna7b_config(),
            "InstructBlipForConditionalGeneration")


@register_pipeline("VLZooVQAPipeline")
class VLZooVQAPipeline:
    """Runs any MODEL_SPECS entry (or a custom spec) on the VQA harness."""

    def __init__(self, cfg, spec: ModelSpec | str, model_path: Optional[str] = None,
                 answer_fn: Optional[Callable] = None):
        self.cfg = cfg
        self.spec = MODEL_SPECS[spec] if isinstance(spec, str) else spec
        self.model_path = model_path or self.spec.name
        self._answer_fn = answer_fn      # injectable for tests / JAX backends
        self.evaluator = VQAEvaluator()

    def _load(self):
        import torch
        import transformers

        cls = getattr(transformers, self.spec.model_cls)
        dtype = getattr(torch, self.spec.dtype)
        self.model = cls.from_pretrained(self.model_path, torch_dtype=dtype)
        self.model.eval()
        self.processor = transformers.AutoProcessor.from_pretrained(self.model_path)

    def answer(self, question: str, image) -> str:
        if self._answer_fn is not None:
            return self._answer_fn(question, image)
        if not hasattr(self, "model"):
            self._load()
        import torch

        text = self.spec.prompt.format(q=question)
        inputs = self.processor(images=image, text=text, return_tensors="pt")
        with torch.no_grad():
            out = self.model.generate(**inputs, **self.spec.gen_kwargs)
        ans = self.processor.batch_decode(out, skip_special_tokens=True)[0]
        # decoder-only models echo the prompt; strip it.  KOSMOS-2 follows
        # the reference's extraction (KOSMOS2VQAVALPipeline.py:182-183):
        # everything after the last 'Answer:'.
        if "Answer:" in text and "Answer:" in ans:
            return ans.split("Answer:")[-1].strip()
        if ans.startswith(text):
            ans = ans[len(text):]
        if "ASSISTANT:" in ans:
            ans = ans.split("ASSISTANT:")[-1]
        return ans.strip()

    def evaluate_model(self, dataset: Iterable[dict], limit: Optional[int] = None) -> dict:
        import itertools

        # lazy islice: list(dataset) would materialize every image before
        # the smoke subset is taken (the reference hardcodes a 10% break,
        # BLIP2VQAVALPipeline.py "Fast Computation")
        rows = itertools.islice(dataset, limit) if limit else dataset
        for r in rows:
            ans = self.answer(r["question"], r.get("image"))
            self.evaluator.process(r["question_id"], ans, r["answers"],
                                   r.get("question_type"), r.get("answer_type"))
        return self.evaluator.evaluate()


@register_pipeline("COCOCaptionPipeline")
class COCOCaptionPipeline:
    """X-Decoder captioning eval (pipeline/COCOCaptionPipeline.py): run the
    autoregressive captioning head per image, score with CIDEr."""

    def __init__(self, cfg, caption_fn: Callable[[np.ndarray], str]):
        from cullavo_tpu.data.evaluation.evaluators import CaptioningEvaluator

        self.cfg = cfg
        self.caption_fn = caption_fn
        self.evaluator = CaptioningEvaluator()

    def evaluate_model(self, dataset: Iterable[dict], limit: Optional[int] = None,
                       out_path: Optional[str] = None) -> dict:
        import itertools

        rows = itertools.islice(dataset, limit) if limit else dataset
        for r in rows:
            cand = self.caption_fn(r["image"])
            self.evaluator.add(r["image_id"], cand, r["references"])
        if out_path:
            self.evaluator.dump_results(out_path)
        return self.evaluator.results()


def native_blip2_imagenet_fns(hf_model_dir: Optional[str] = None,
                              class_names: list = (),
                              kind: str = "flant5"):
    """(image_embed_fn, class_embeds) for ImageNetPipeline — the TPU-native
    equivalent of BLIP2/InstructBLIPImageNetPipeline: Q-Former 'This is
    {class}' text encodes vs pooled image-query embeddings, cosine scored.

    Without ``hf_model_dir`` a tiny random text-input Q-Former + a
    ByteTokenizer drive the same path end-to-end (CLI smoke mode)."""
    import jax
    import jax.numpy as jnp

    from cullavo_tpu.models.blip2.modeling import (blip2_image_embed,
                                                   blip2_text_embed)

    if hf_model_dir is None:
        from cullavo_tpu.data.tokenizer import ByteTokenizer
        from cullavo_tpu.models.blip2 import tiny_blip2_config
        from cullavo_tpu.models.blip2.modeling import init_blip2_params

        # "llama_text" tiny = the only tiny config with text-input Q-Former
        # weights (what blip2_text_embed needs)
        cfg = tiny_blip2_config("llama_text")
        params = init_blip2_params(cfg, jax.random.PRNGKey(0))
        bt = ByteTokenizer()
        qv = cfg.qformer.vocab_size
        rows = [np.asarray(bt.encode(f"This is {c}"), np.int32)
                for c in class_names]
        rows = [np.where(r >= qv, 4 + r % max(qv - 4, 1), r) for r in rows]
        W = max(len(r) for r in rows)
        ids = np.zeros((len(rows), W), np.int32)
        mask = np.zeros((len(rows), W), np.int32)
        for i, r in enumerate(rows):
            ids[i, :len(r)] = r
            mask[i, :len(r)] = 1
        class_embeds = blip2_text_embed(params, cfg, jnp.asarray(ids),
                                        jnp.asarray(mask))
    else:
        import transformers

        from cullavo_tpu.models.blip2 import import_blip2_torch

        cfg, cls = _blip2_cfg_cls(kind)
        cfg = dataclasses.replace(
            cfg, qformer=dataclasses.replace(cfg.qformer, use_text_input=True))
        hf = getattr(transformers, cls).from_pretrained(hf_model_dir)
        params = jax.tree.map(jnp.asarray, import_blip2_torch(hf, cfg))
        proc = transformers.AutoProcessor.from_pretrained(hf_model_dir)
        del hf

        tok = getattr(proc, "qformer_tokenizer", None) or proc.tokenizer
        enc = tok([f"This is {c}" for c in class_names], padding=True,
                  return_tensors="np")
        class_embeds = blip2_text_embed(
            params, cfg, jnp.asarray(enc["input_ids"].astype(np.int32)),
            jnp.asarray(enc["attention_mask"].astype(np.int32)))

    image_size = cfg.vision.image_size

    def image_embed_fn(pixel_values):
        return blip2_image_embed(params, cfg, pixel_values)

    image_embed_fn.image_size = image_size
    return image_embed_fn, class_embeds


def native_blip2_answer_fn(model_cfg=None, params=None, tokenizer=None,
                           max_new_tokens: int = 10, num_beams: int = 5,
                           length_penalty: float = -1.0,
                           hf_model_dir: Optional[str] = None,
                           kind: str = "flant5"):
    """TPU-native BLIP-2 answerer for VLZooVQAPipeline: flan-T5 tower with
    the reference decode configuration (beam-5, length-penalty −1, ≤10 new
    tokens — BLIP2VQAVALPipeline.py:175), entirely in JAX.

    With no checkpoint (``model_cfg=None``: the CLI smoke / integration
    mode) a tiny random model + ByteTokenizer drive the full native path —
    answers are arbitrary strings, but every stage (ViT encode → Q-Former →
    T5 beam search → detokenize) runs end-to-end.  Real checkpoints go
    through models/blip2.import_blip2_torch and an HF tokenizer instead.

    ``hf_model_dir``: a local HF snapshot (blip2-flan-t5-*, blip2-opt-* or
    instructblip-vicuna-* per ``kind``) imported once through
    import_blip2_torch — the real-checkpoint TPU-native path (the reference
    runs these towers in torch; BLIP2VQAVALPipeline.py:100-217)."""
    if hf_model_dir is not None:
        return _hf_blip2_answer_fn(hf_model_dir, kind, max_new_tokens,
                                   num_beams, length_penalty)
    import jax
    import numpy as np

    from cullavo_tpu.data.tokenizer import ByteTokenizer
    from cullavo_tpu.models.blip2 import tiny_blip2_config
    from cullavo_tpu.models.blip2.modeling import (blip2_beam_generate,
                                                   init_blip2_params)

    if model_cfg is None:
        # instructblip smoke = instruction-aware Q-Former + tiny LLaMA
        # decoder (the "llama_text" tiny config); blip2 smoke = tiny flan-T5
        model_cfg = tiny_blip2_config(
            "llama_text" if kind == "instructblip" else "t5")
        params = init_blip2_params(model_cfg, jax.random.PRNGKey(0))
    if tokenizer is None:
        tokenizer = ByteTokenizer()
    vocab = model_cfg.text.vocab_size
    qf_vocab = model_cfg.qformer.vocab_size
    use_qf_text = model_cfg.qformer.use_text_input
    spec = MODEL_SPECS["instructblip" if kind == "instructblip" else "blip2"]
    S = model_cfg.vision.image_size

    def answer(question: str, image) -> str:
        text = spec.prompt.format(q=question)
        # fold oversized ids into the tiny vocab (smoke mode only; a real
        # checkpoint's tokenizer always fits its own vocab)
        ids = np.asarray(tokenizer.encode(text), np.int32)
        ids = np.where(ids >= vocab, 4 + ids % max(vocab - 4, 1), ids)
        pix = np.asarray(image, np.float32)
        if pix.ndim == 3 and pix.shape[0] == 3 and pix.shape[1:] != (S, S):
            ri = np.linspace(0, pix.shape[1] - 1, S).astype(int)
            ci = np.linspace(0, pix.shape[2] - 1, S).astype(int)
            pix = pix[:, ri][:, :, ci]
        kwargs = {}
        if use_qf_text:
            # instruction-aware Q-Former conditions on the question text
            # (InstructBLIPVQAVALPipeline.py: qformer_tokenizer input)
            qids = np.asarray(tokenizer.encode(text), np.int32)
            qids = np.where(qids >= qf_vocab,
                            4 + qids % max(qf_vocab - 4, 1), qids)
            kwargs = {"qformer_text_ids": qids[None],
                      "qformer_text_mask": np.ones((1, len(qids)), np.int32)}
        out = blip2_beam_generate(
            params, model_cfg, pix[None], ids[None],
            np.ones((1, len(ids)), np.int32), max_new_tokens,
            num_beams=num_beams, length_penalty=length_penalty,
            eos_token_id=1, **kwargs)
        toks = [int(t) for t in np.asarray(out)[0] if int(t) > 1]
        return tokenizer.decode(toks) if hasattr(tokenizer, "decode") \
            else " ".join(map(str, toks))

    return answer


def native_kosmos2_answer_fn(model_cfg=None, params=None, tokenizer=None,
                             max_new_tokens: int = 10,
                             hf_model_dir: Optional[str] = None):
    """TPU-native KOSMOS-2 answerer for VLZooVQAPipeline: latent-query
    pooled image tokens + sinusoidal decoder, greedy KV-cache decode
    (KOSMOS2VQAVALPipeline.py:99,170-183 — fp32 load, 'Question: {q}
    Answer:' prompt, everything after the last 'Answer:').

    With no checkpoint (``model_cfg=None``) a tiny random model +
    ByteTokenizer drive the full native path end-to-end (CLI smoke mode);
    real checkpoints go through models/kosmos2.import_kosmos2_torch."""
    if hf_model_dir is not None:
        return _hf_kosmos2_answer_fn(hf_model_dir, max_new_tokens)
    import jax
    import numpy as np

    from cullavo_tpu.data.tokenizer import ByteTokenizer
    from cullavo_tpu.models.kosmos2 import (init_kosmos2_params,
                                            kosmos2_generate,
                                            tiny_kosmos2_config)

    if model_cfg is None:
        model_cfg = tiny_kosmos2_config()
        params = init_kosmos2_params(model_cfg, jax.random.PRNGKey(0))
    if tokenizer is None:
        tokenizer = ByteTokenizer()
    vocab = model_cfg.text.vocab_size
    n_img = model_cfg.latent_query_num
    S = model_cfg.vision.image_size
    spec = MODEL_SPECS["kosmos2"]

    def answer(question: str, image) -> str:
        text = spec.prompt.format(q=question)
        tids = np.asarray(tokenizer.encode(text), np.int32)
        tids = np.where(tids >= vocab, 4 + tids % max(vocab - 4, 1), tids)
        # HF kosmos2 prompt layout: [bos, <image>*latent_query_num, text...]
        ids = np.concatenate([[1], np.full((n_img,), 3, np.int32), tids])
        img_mask = np.zeros_like(ids)
        img_mask[1:1 + n_img] = 1
        pix = np.asarray(image, np.float32)
        if pix.ndim == 3 and pix.shape[0] == 3 and pix.shape[1:] != (S, S):
            ri = np.linspace(0, pix.shape[1] - 1, S).astype(int)
            ci = np.linspace(0, pix.shape[2] - 1, S).astype(int)
            pix = pix[:, ri][:, :, ci]
        out = kosmos2_generate(
            params, model_cfg, pix[None], ids[None], img_mask[None],
            np.ones_like(ids)[None], max_new_tokens, eos_token_id=2)
        toks = [int(t) for t in np.asarray(out)[0] if int(t) > 2]
        ans = tokenizer.decode(toks) if hasattr(tokenizer, "decode") \
            else " ".join(map(str, toks))
        return ans.split("Answer:")[-1].strip() if "Answer:" in ans else ans

    return answer



def _hf_blip2_answer_fn(hf_model_dir: str, kind: str, max_new_tokens: int,
                        num_beams: int, length_penalty: float):
    """Real-checkpoint branch of native_blip2_answer_fn: HF snapshot →
    import_blip2_torch → JAX beam/greedy decode with the reference settings
    (BLIP2VQAVALPipeline.py:175; InstructBLIP adds qformer text input)."""
    import jax
    import jax.numpy as jnp
    import transformers

    from cullavo_tpu.data.image_processing import preprocess_numpy
    from cullavo_tpu.models.blip2 import blip2_generate, import_blip2_torch
    from cullavo_tpu.models.blip2.modeling import blip2_beam_generate

    cfg, cls = _blip2_cfg_cls(kind)
    hf = getattr(transformers, cls).from_pretrained(hf_model_dir)
    params = jax.tree.map(jnp.asarray, import_blip2_torch(hf, cfg))
    proc = transformers.AutoProcessor.from_pretrained(hf_model_dir)
    del hf

    def answer(question: str, image) -> str:
        text = MODEL_SPECS["blip2" if kind != "instructblip"
                           else "instructblip"].prompt.format(q=question)
        enc = proc.tokenizer(text, return_tensors="np")
        pix = preprocess_numpy([np.asarray(image)], cfg.vision.image_size)
        kwargs = {}
        if kind == "instructblip":
            q = proc.qformer_tokenizer(text, return_tensors="np")
            kwargs = {"qformer_text_ids": jnp.asarray(q["input_ids"]),
                      "qformer_text_mask": jnp.asarray(q["attention_mask"])}
        eos = (proc.tokenizer.eos_token_id
               if proc.tokenizer.eos_token_id is not None else -1)
        ids = jnp.asarray(enc["input_ids"].astype(np.int32))
        mask = jnp.asarray(enc["attention_mask"].astype(np.int32))
        if num_beams > 1:
            out = blip2_beam_generate(params, cfg, jnp.asarray(pix), ids, mask,
                                      max_new_tokens, num_beams=num_beams,
                                      length_penalty=length_penalty,
                                      eos_token_id=eos,
                                      pad_token_id=proc.tokenizer.pad_token_id or 0,
                                      **kwargs)
        else:
            out = blip2_generate(params, cfg, jnp.asarray(pix), ids, mask,
                                 max_new_tokens, eos_token_id=eos, **kwargs)
        return proc.tokenizer.decode(np.asarray(out)[0],
                                     skip_special_tokens=True).strip()

    return answer


def _hf_kosmos2_answer_fn(hf_model_dir: str, max_new_tokens: int):
    """Real-checkpoint branch of native_kosmos2_answer_fn: HF snapshot →
    import_kosmos2_torch → greedy JAX decode, 'Answer:' extraction
    (KOSMOS2VQAVALPipeline.py:182-183)."""
    import jax
    import jax.numpy as jnp
    import transformers

    from cullavo_tpu.models.kosmos2 import (Kosmos2Config,
                                            import_kosmos2_torch,
                                            kosmos2_generate)

    cfg = Kosmos2Config()
    hf = transformers.Kosmos2ForConditionalGeneration.from_pretrained(hf_model_dir)
    params = jax.tree.map(jnp.asarray, import_kosmos2_torch(hf, cfg))
    proc = transformers.AutoProcessor.from_pretrained(hf_model_dir)
    del hf

    def answer(question: str, image) -> str:
        text = MODEL_SPECS["kosmos2"].prompt.format(q=question)
        from PIL import Image

        im = image if isinstance(image, Image.Image) else Image.fromarray(
            np.asarray(image))
        enc = proc(images=im, text=text, return_tensors="np")
        out = kosmos2_generate(
            params, cfg, jnp.asarray(np.asarray(enc["pixel_values"])),
            jnp.asarray(enc["input_ids"].astype(np.int32)),
            jnp.asarray(enc["image_embeds_position_mask"].astype(np.int32)),
            jnp.asarray(enc["attention_mask"].astype(np.int32)),
            max_new_tokens,
            eos_token_id=(proc.tokenizer.eos_token_id
                          if proc.tokenizer.eos_token_id is not None else -1))
        txt = proc.tokenizer.decode(np.asarray(out)[0],
                                    skip_special_tokens=True)
        # reference extraction: text after the last 'Answer:'
        # (KOSMOS2VQAVALPipeline.py:182-183); generate returns only new
        # tokens here, so the split is a no-op unless the model echoes
        return txt.split("Answer:")[-1].strip()

    return answer
