"""X-Decoder language encoder: CLIP-style causal text transformer + projection.

Capability parity with the reference's vlpencoder + LangEncoder transformer
(modeling/language/vlpencoder.py:20-190, modeling/language/LangEncoder/
transformer.py: 512-wide, 12-layer, 8-head causal tower with QuickGELU MLP,
learned positional embeddings, final LayerNorm; sentence embedding taken at
the argmax token position — the CLIP end-of-text convention — projected by
``lang_proj`` and L2-normalized; ``logit_scale``-scaled cosine similarity
against cached class embeddings; train-time single random prompt template vs
eval-time mean over the ~81-template ensemble, vlpencoder.py:71-127).

Functional JAX, scan-over-layers; tokenizer-agnostic (takes ids + mask).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cullavo_tpu.models.llava.clip_vit import layer_norm, quick_gelu
from cullavo_tpu.utils.constants import get_prompt_templates


@dataclasses.dataclass(frozen=True)
class TextEncoderConfig:
    vocab_size: int = 49408       # CLIP BPE
    width: int = 512
    heads: int = 8
    layers: int = 12
    context_length: int = 77
    autoregressive: bool = True
    # the reference's TF-style LayerNorm uses eps=1e-12 INSIDE the sqrt
    # (LangEncoder/transformer.py:22-36) — NOT torch's 1e-5 default; with
    # std-0.02 embeddings the variance is small enough that 1e-5 shifts
    # activations ~0.5%/block (caught by the torch-parity harness)
    layer_norm_eps: float = 1e-12
    dim_lang: int = 512           # projection output


def init_text_encoder_params(cfg: TextEncoderConfig, key: jax.Array, dtype=jnp.float32):
    ks = jax.random.split(key, 12)
    W, L = cfg.width, cfg.layers

    def dense(k, shape):
        return (jax.random.normal(k, shape) * 0.02).astype(dtype)

    def stacked(k, shape):
        return (jax.random.normal(k, (L,) + shape) * 0.02).astype(dtype)

    return {
        "token_embedding": dense(ks[0], (cfg.vocab_size, W)),
        "positional_embedding": dense(ks[1], (cfg.context_length, W)),
        "layers": {
            "ln1_s": jnp.ones((L, W), dtype), "ln1_b": jnp.zeros((L, W), dtype),
            "qkv_w": stacked(ks[2], (W, 3 * W)), "qkv_b": jnp.zeros((L, 3 * W), dtype),
            "o_w": stacked(ks[3], (W, W)), "o_b": jnp.zeros((L, W), dtype),
            "ln2_s": jnp.ones((L, W), dtype), "ln2_b": jnp.zeros((L, W), dtype),
            "fc_w": stacked(ks[4], (W, 4 * W)), "fc_b": jnp.zeros((L, 4 * W), dtype),
            "proj_w": stacked(ks[5], (4 * W, W)), "proj_b": jnp.zeros((L, W), dtype),
        },
        "ln_final": {"scale": jnp.ones((W,), dtype), "bias": jnp.zeros((W,), dtype)},
        "lang_proj": dense(ks[6], (W, cfg.dim_lang)),
        "logit_scale": jnp.zeros((), dtype),  # exp(0)=1; CLIP init ln(1/0.07) set by loader
    }


def text_transformer_forward(params, cfg: TextEncoderConfig, input_ids,
                             attention_mask, remat: bool = False):
    """[B, T] ids → last hidden state [B, T, W].

    ``remat=True`` checkpoints each scan layer: the joint train step encodes
    134 class names + B·P captions + B·G phrases through this tower WITH
    gradients, and the saved per-layer FFN activations
    ([12, 134, 77, 2048] bf16) + attention probabilities
    ([12, 134, 8, 77, 77] f32) were the LARGEST allocations in the b4 OOM
    dump (~1.5 GB, image-batch-independent)."""
    B, T = input_ids.shape
    W, H = cfg.width, cfg.heads
    hd = W // H
    eps = cfg.layer_norm_eps

    x = jnp.take(params["token_embedding"], input_ids, axis=0)
    x = x + params["positional_embedding"][None, :T]

    if cfg.autoregressive:
        # the reference applies ONLY the causal mask in autoregressive mode —
        # key_padding_mask is None there (transformer.py:169: key padding
        # applies iff NOT autogressive), so padded keys stay visible; outputs
        # at positions <= EOT are unaffected for right-padded text
        ok = jnp.broadcast_to(jnp.tril(jnp.ones((T, T), bool))[None], (B, T, T))
    else:
        key_valid = attention_mask[:, None, :].astype(bool)  # [B, 1, T]
        ok = jnp.broadcast_to(key_valid, (B, T, T))
    bias = jnp.where(ok[:, None], 0.0, -1e30)

    def layer(h, w):
        y = layer_norm(h, w["ln1_s"], w["ln1_b"], eps)
        qkv = y @ w["qkv_w"] + w["qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * (hd ** -0.5)
        p = jax.nn.softmax(s + bias, axis=-1).astype(h.dtype)
        a = jnp.einsum("bhqk,bhkd->bhqd", p, v, preferred_element_type=jnp.float32)
        a = a.astype(h.dtype).transpose(0, 2, 1, 3).reshape(B, T, W)
        h = h + (a @ w["o_w"] + w["o_b"])
        y = layer_norm(h, w["ln2_s"], w["ln2_b"], eps)
        y = quick_gelu(y @ w["fc_w"] + w["fc_b"])
        h = h + (y @ w["proj_w"] + w["proj_b"])
        return h, None

    layer_fn = (jax.checkpoint(layer,
                               policy=jax.checkpoint_policies.nothing_saveable)
                if remat else layer)
    x, _ = jax.lax.scan(layer_fn, x, params["layers"])
    return layer_norm(x, params["ln_final"]["scale"], params["ln_final"]["bias"], eps)


def forward_language(params, cfg, input_ids, attention_mask, norm=True,
                     remat=False):
    """Sentence embeddings [B, dim_lang] at the argmax-id (EOT) position."""
    hidden = text_transformer_forward(params, cfg, input_ids, attention_mask,
                                      remat=remat)
    eot = jnp.argmax(input_ids, axis=-1)
    cls = jnp.take_along_axis(hidden, eot[:, None, None], axis=1)[:, 0]
    cls = cls @ params["lang_proj"]
    if norm:
        cls = cls / (jnp.linalg.norm(cls, axis=-1, keepdims=True) + 1e-7)
    return cls


def forward_language_token(params, cfg, input_ids, attention_mask, norm=False,
                           remat=False):
    """(token_emb [B, T, D], class_emb [B, D]) — both through lang_proj."""
    hidden = text_transformer_forward(params, cfg, input_ids, attention_mask,
                                      remat=remat)
    eot = jnp.argmax(input_ids, axis=-1)
    cls = jnp.take_along_axis(hidden, eot[:, None, None], axis=1)[:, 0]
    token = hidden @ params["lang_proj"]
    cls = cls @ params["lang_proj"]
    if norm:
        token = token / (jnp.linalg.norm(token, axis=-1, keepdims=True) + 1e-7)
        cls = cls / (jnp.linalg.norm(cls, axis=-1, keepdims=True) + 1e-7)
    return token, cls


def compute_similarity(params, v_emb, t_emb):
    """logit_scale.exp() * cosine(v, class-embeds); v [B, Q, D], t [C, D]."""
    v = v_emb / (jnp.linalg.norm(v_emb, axis=-1, keepdims=True) + 1e-7)
    return jnp.exp(params["logit_scale"]) * jnp.einsum("bqd,cd->bqc", v, t_emb)


def _clean(name: str) -> str:
    return name.replace("-other", "").replace("-merged", "").replace("-stuff", "")


def class_embeddings_ensembled(params, cfg, tokenize: Callable, class_names: Sequence[str],
                               add_background: bool = False):
    """Eval-time class embeddings: mean over the prompt-template ensemble per
    class, renormalized (vlpencoder.py:104-127).  ``tokenize(texts) →
    (ids [N, T], mask [N, T])`` numpy arrays."""
    templates = get_prompt_templates()
    out = []
    names = list(class_names) + (["A background in coco."] if add_background else [])
    # jit once: an eager 12-layer forward PER CLASS is minutes of pure
    # dispatch overhead at eval startup (133 classes x ~81 templates);
    # template counts are uniform so one compiled shape serves every class
    embed = jax.jit(lambda p, i, m: forward_language(p, cfg, i, m, norm=True))
    for name in names:
        if name == "A background in coco.":
            texts = [name]
        else:
            texts = [t.format(_clean(name)) for t in templates]
        ids, mask = tokenize(texts)
        emb = embed(params, jnp.asarray(ids), jnp.asarray(mask))
        mean = jnp.mean(emb, axis=0)
        out.append(mean / (jnp.linalg.norm(mean) + 1e-7))
    return jnp.stack(out)


def class_embeddings_train(params, cfg, tokenize, class_names, rng: np.random.Generator,
                           add_background: bool = False):
    """Train-time: one random template per class (vlpencoder.py:71-83)."""
    from cullavo_tpu.utils.constants import prompt_engineering

    texts = [prompt_engineering(_clean(c), topk=10000, suffix=".", rng=rng)
             for c in class_names]
    if add_background:
        texts.append("A background in coco.")
    ids, mask = tokenize(texts)
    return forward_language(params, cfg, jnp.asarray(ids), jnp.asarray(mask), norm=True)


def clip_text_config(width: int = 768, heads: int = 12, layers: int = 12,
                     dim_lang: int = 768) -> TextEncoderConfig:
    """HF CLIPTextModelWithProjection geometry (CLIP-L/336 defaults).

    HF CLIP LayerNorms use eps=1e-5 — unlike the reference's own text
    transformer whose TF-style LayerNorm hardcodes 1e-12 (the
    TextEncoderConfig default)."""
    return TextEncoderConfig(width=width, heads=heads, layers=layers,
                             dim_lang=dim_lang, layer_norm_eps=1e-5)


def import_hf_clip_text(state, cfg: TextEncoderConfig):
    """Map an HF ``CLIPModel`` / ``CLIPTextModelWithProjection`` state dict
    (numpy arrays) onto the text-transformer params.  Used by the VQA
    pipeline's question-topic classifier (LLaVAVQAVALPipeline.py:104-116
    embeds 'a photo of {class}' with CLIP-L text + projection)."""
    sd = {k.replace("text_model.", ""): np.asarray(v) for k, v in state.items()}
    L = cfg.layers

    def stack(fmt, transpose=False):
        arrs = [sd[fmt.format(i)] for i in range(L)]
        if transpose:
            arrs = [a.T for a in arrs]
        return np.stack(arrs)

    qkv_w = np.concatenate([
        stack("encoder.layers.{}.self_attn.q_proj.weight", True),
        stack("encoder.layers.{}.self_attn.k_proj.weight", True),
        stack("encoder.layers.{}.self_attn.v_proj.weight", True)], axis=2)
    qkv_b = np.concatenate([
        stack("encoder.layers.{}.self_attn.q_proj.bias"),
        stack("encoder.layers.{}.self_attn.k_proj.bias"),
        stack("encoder.layers.{}.self_attn.v_proj.bias")], axis=1)
    params = {
        "token_embedding": sd["embeddings.token_embedding.weight"],
        "positional_embedding": sd["embeddings.position_embedding.weight"],
        "layers": {
            "ln1_s": stack("encoder.layers.{}.layer_norm1.weight"),
            "ln1_b": stack("encoder.layers.{}.layer_norm1.bias"),
            "qkv_w": qkv_w, "qkv_b": qkv_b,
            "o_w": stack("encoder.layers.{}.self_attn.out_proj.weight", True),
            "o_b": stack("encoder.layers.{}.self_attn.out_proj.bias"),
            "ln2_s": stack("encoder.layers.{}.layer_norm2.weight"),
            "ln2_b": stack("encoder.layers.{}.layer_norm2.bias"),
            "fc_w": stack("encoder.layers.{}.mlp.fc1.weight", True),
            "fc_b": stack("encoder.layers.{}.mlp.fc1.bias"),
            "proj_w": stack("encoder.layers.{}.mlp.fc2.weight", True),
            "proj_b": stack("encoder.layers.{}.mlp.fc2.bias"),
        },
        "ln_final": {"scale": sd["final_layer_norm.weight"],
                     "bias": sd["final_layer_norm.bias"]},
        "lang_proj": sd["text_projection.weight"].T,
        # full CLIPModel state dicts carry logit_scale (log of ~100); text-
        # only exports don't — default exp(0)=1 ONLY in that case
        "logit_scale": np.asarray(state.get("logit_scale", np.zeros(())),
                                  np.float32).reshape(()),
    }
    return jax.tree.map(jnp.asarray, params)
