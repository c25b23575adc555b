"""HF parity tests for the TPU-native BLIP-2 / InstructBLIP family.

Same oracle pattern as test_llava_parity.py: tiny random HF modules, weights
imported through the production importer, logits/greedy-decode equality.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from cullavo_tpu.models.blip2 import (blip2_forward, blip2_generate,
                                      import_blip2_torch, tiny_blip2_config)


def _hf_cfg(cfg, text="opt"):
    from transformers import Blip2Config as HFBlip2Config
    from transformers import (Blip2QFormerConfig, Blip2VisionConfig, LlamaConfig,
                              OPTConfig)

    vision = Blip2VisionConfig(
        hidden_size=cfg.vision.hidden_size,
        intermediate_size=cfg.vision.intermediate_size,
        num_hidden_layers=cfg.vision.num_hidden_layers,
        num_attention_heads=cfg.vision.num_attention_heads,
        image_size=cfg.vision.image_size, patch_size=cfg.vision.patch_size,
        layer_norm_eps=cfg.vision.layer_norm_eps, hidden_act="gelu",
        attention_dropout=0.0)
    qformer = dict(
        hidden_size=cfg.qformer.hidden_size,
        num_hidden_layers=cfg.qformer.num_hidden_layers,
        num_attention_heads=cfg.qformer.num_attention_heads,
        intermediate_size=cfg.qformer.intermediate_size,
        cross_attention_frequency=cfg.qformer.cross_attention_frequency,
        encoder_hidden_size=cfg.qformer.encoder_hidden_size,
        vocab_size=cfg.qformer.vocab_size,
        max_position_embeddings=cfg.qformer.max_position_embeddings,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    if text == "opt":
        text_cfg = OPTConfig(
            vocab_size=cfg.text.vocab_size, hidden_size=cfg.text.hidden_size,
            ffn_dim=cfg.text.ffn_dim, num_hidden_layers=cfg.text.num_hidden_layers,
            num_attention_heads=cfg.text.num_attention_heads,
            max_position_embeddings=cfg.text.max_position_embeddings,
            word_embed_proj_dim=cfg.text.hidden_size, dropout=0.0,
            activation_function="relu", attn_implementation="eager")
    else:
        text_cfg = LlamaConfig(
            vocab_size=cfg.text.vocab_size, hidden_size=cfg.text.hidden_size,
            intermediate_size=cfg.text.intermediate_size,
            num_hidden_layers=cfg.text.num_hidden_layers,
            num_attention_heads=cfg.text.num_attention_heads,
            num_key_value_heads=cfg.text.num_key_value_heads,
            max_position_embeddings=cfg.text.max_position_embeddings,
            rms_norm_eps=cfg.text.rms_norm_eps, attn_implementation="eager")
    return HFBlip2Config(vision_config=vision.to_dict(), qformer_config=qformer,
                         text_config=text_cfg.to_dict(),
                         num_query_tokens=cfg.num_query_tokens,
                         image_token_index=cfg.text.vocab_size - 1)


def _inputs(cfg, batch=2, text_len=6, seed=0):
    rng = np.random.default_rng(seed)
    pix = rng.normal(size=(batch, 3, cfg.vision.image_size,
                           cfg.vision.image_size)).astype(np.float32)
    ids = rng.integers(3, cfg.text.vocab_size - 2,
                       size=(batch, text_len)).astype(np.int64)
    mask = np.ones_like(ids)
    return pix, ids, mask


def test_blip2_vision_matches_hf():
    from transformers import Blip2VisionModel

    cfg = tiny_blip2_config("opt")
    torch.manual_seed(0)
    hf_full = transformers.Blip2ForConditionalGeneration(_hf_cfg(cfg)).eval().float()
    params = jax.tree.map(jnp.asarray, import_blip2_torch(hf_full, cfg))
    pix, _, _ = _inputs(cfg)
    with torch.no_grad():
        ref = hf_full.vision_model(torch.tensor(pix)).last_hidden_state.numpy()
    from cullavo_tpu.models.blip2.vision import blip2_vision_forward

    out = np.asarray(blip2_vision_forward(params["vision"], cfg.vision,
                                          jnp.asarray(pix)))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_blip2_opt_logits_and_greedy_match_hf():
    cfg = tiny_blip2_config("opt")
    torch.manual_seed(1)
    hf = transformers.Blip2ForConditionalGeneration(_hf_cfg(cfg)).eval().float()
    params = jax.tree.map(jnp.asarray, import_blip2_torch(hf, cfg))
    pix, ids, mask = _inputs(cfg, seed=1)
    # modern HF expects the query slots as image tokens inside input_ids
    img_tok = np.full((ids.shape[0], cfg.num_query_tokens),
                      cfg.text.vocab_size - 1, ids.dtype)
    hf_ids = np.concatenate([img_tok, ids], axis=1)
    hf_mask = np.concatenate([np.ones_like(img_tok), mask], axis=1)

    with torch.no_grad():
        ref = hf(pixel_values=torch.tensor(pix), input_ids=torch.tensor(hf_ids),
                 attention_mask=torch.tensor(hf_mask)).logits.numpy()
    logits = np.asarray(blip2_forward(params, cfg, jnp.asarray(pix),
                                      jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(logits, ref, atol=3e-4, rtol=2e-3)

    new = 7
    with torch.no_grad():
        gen = hf.generate(pixel_values=torch.tensor(pix),
                          input_ids=torch.tensor(hf_ids),
                          attention_mask=torch.tensor(hf_mask),
                          max_new_tokens=new, do_sample=False, use_cache=True,
                          eos_token_id=None, pad_token_id=0)
    ref_new = gen[:, -new:].numpy()
    out = np.asarray(blip2_generate(params, cfg, jnp.asarray(pix),
                                    jnp.asarray(ids), jnp.asarray(mask), new))
    np.testing.assert_array_equal(out, ref_new)


def test_instructblip_vicuna_greedy_matches_hf():
    from transformers import (InstructBlipConfig, InstructBlipForConditionalGeneration,
                              InstructBlipQFormerConfig, InstructBlipVisionConfig,
                              LlamaConfig)

    cfg = tiny_blip2_config("llama_text")
    vision = InstructBlipVisionConfig(
        hidden_size=cfg.vision.hidden_size,
        intermediate_size=cfg.vision.intermediate_size,
        num_hidden_layers=cfg.vision.num_hidden_layers,
        num_attention_heads=cfg.vision.num_attention_heads,
        image_size=cfg.vision.image_size, patch_size=cfg.vision.patch_size,
        layer_norm_eps=cfg.vision.layer_norm_eps, hidden_act="gelu",
        attention_dropout=0.0)
    qf = InstructBlipQFormerConfig(
        hidden_size=cfg.qformer.hidden_size,
        num_hidden_layers=cfg.qformer.num_hidden_layers,
        num_attention_heads=cfg.qformer.num_attention_heads,
        intermediate_size=cfg.qformer.intermediate_size,
        cross_attention_frequency=cfg.qformer.cross_attention_frequency,
        encoder_hidden_size=cfg.qformer.encoder_hidden_size,
        vocab_size=cfg.qformer.vocab_size,
        max_position_embeddings=cfg.qformer.max_position_embeddings,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    text = LlamaConfig(
        vocab_size=cfg.text.vocab_size, hidden_size=cfg.text.hidden_size,
        intermediate_size=cfg.text.intermediate_size,
        num_hidden_layers=cfg.text.num_hidden_layers,
        num_attention_heads=cfg.text.num_attention_heads,
        num_key_value_heads=cfg.text.num_key_value_heads,
        max_position_embeddings=cfg.text.max_position_embeddings,
        rms_norm_eps=cfg.text.rms_norm_eps, attn_implementation="eager")
    hf_cfg = InstructBlipConfig(vision_config=vision.to_dict(),
                                qformer_config=qf.to_dict(),
                                text_config=text.to_dict(),
                                num_query_tokens=cfg.num_query_tokens,
                                image_token_index=cfg.text.vocab_size - 1)
    torch.manual_seed(2)
    hf = InstructBlipForConditionalGeneration(hf_cfg).eval().float()
    params = jax.tree.map(jnp.asarray, import_blip2_torch(hf, cfg))

    pix, ids, mask = _inputs(cfg, seed=2, text_len=5)
    rng = np.random.default_rng(3)
    q_ids = rng.integers(3, cfg.qformer.vocab_size - 1, size=(2, 4)).astype(np.int64)
    q_mask = np.ones_like(q_ids)

    img_tok = np.full((ids.shape[0], cfg.num_query_tokens),
                      cfg.text.vocab_size - 1, ids.dtype)
    hf_ids = np.concatenate([img_tok, ids], axis=1)
    hf_mask = np.concatenate([np.ones_like(img_tok), mask], axis=1)
    new = 6
    with torch.no_grad():
        gen = hf.generate(pixel_values=torch.tensor(pix),
                          qformer_input_ids=torch.tensor(q_ids),
                          qformer_attention_mask=torch.tensor(q_mask),
                          input_ids=torch.tensor(hf_ids),
                          attention_mask=torch.tensor(hf_mask),
                          max_new_tokens=new, do_sample=False, use_cache=True,
                          eos_token_id=None, pad_token_id=0)
    ref_new = gen[:, -new:].numpy()
    out = np.asarray(blip2_generate(
        params, cfg, jnp.asarray(pix), jnp.asarray(ids), jnp.asarray(mask),
        new, qformer_text_ids=jnp.asarray(q_ids),
        qformer_text_mask=jnp.asarray(q_mask)))
    np.testing.assert_array_equal(out, ref_new)
