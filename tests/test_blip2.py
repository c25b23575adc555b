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


def _tiny_instructblip():
    """(hf, cfg, params) for a tiny InstructBLIP (LLaMA/Vicuna tower,
    instruction-aware Q-Former) matched between HF and our import."""
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
    return hf, cfg, params


def test_instructblip_vicuna_greedy_matches_hf():
    hf, cfg, params = _tiny_instructblip()
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


def test_instructblip_vicuna_beam_search_matches_hf():
    """Beam search on the LLaMA/Vicuna (S-major KV cache) tower vs HF —
    the reference InstructBLIP decode config (beam 5, length-penalty -1,
    InstructBLIPVQAVALPipeline.py).  Regression guard: the beam batch×beam
    cache expansion once hardcoded the OPT [L, B, H, S, hd] batch axis and
    silently mis-expanded the S-major LLaMA cache."""
    from cullavo_tpu.models.blip2.modeling import blip2_beam_generate

    hf, cfg, params = _tiny_instructblip()
    pix, ids, mask = _inputs(cfg, seed=4, text_len=5)
    rng = np.random.default_rng(5)
    q_ids = rng.integers(3, cfg.qformer.vocab_size - 1, size=(2, 4)).astype(np.int64)
    q_mask = np.ones_like(q_ids)

    img_tok = np.full((ids.shape[0], cfg.num_query_tokens),
                      cfg.text.vocab_size - 1, ids.dtype)
    hf_ids = np.concatenate([img_tok, ids], axis=1)
    hf_mask = np.concatenate([np.ones_like(img_tok), mask], axis=1)
    new = 6
    for nb, lp in ((3, -1.0), (5, 1.0)):
        with torch.no_grad():
            gen = hf.generate(pixel_values=torch.tensor(pix),
                              qformer_input_ids=torch.tensor(q_ids),
                              qformer_attention_mask=torch.tensor(q_mask),
                              input_ids=torch.tensor(hf_ids),
                              attention_mask=torch.tensor(hf_mask),
                              max_new_tokens=new, do_sample=False,
                              num_beams=nb, length_penalty=lp,
                              early_stopping=False, use_cache=True,
                              eos_token_id=1, pad_token_id=0)
        ref_new = gen[:, hf_ids.shape[1]:].numpy()
        out = np.asarray(blip2_beam_generate(
            params, cfg, jnp.asarray(pix), jnp.asarray(ids),
            jnp.asarray(mask), new, num_beams=nb, length_penalty=lp,
            eos_token_id=1, pad_token_id=0,
            qformer_text_ids=jnp.asarray(q_ids),
            qformer_text_mask=jnp.asarray(q_mask)))
        width = ref_new.shape[1]
        np.testing.assert_array_equal(out[:, :width], ref_new,
                                      err_msg=f"beams={nb} lp={lp}")
        assert (out[:, width:] == 0).all()


def test_t5_logits_and_greedy_match_hf():
    """Flan-T5 (gated-gelu v1.1) tower vs HF T5ForConditionalGeneration."""
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration

    from cullavo_tpu.models.blip2.t5 import (import_t5_torch, t5_forward,
                                             t5_generate, tiny_t5_config)

    cfg = tiny_t5_config()
    hf_cfg = HFT5Config(
        vocab_size=cfg.vocab_size, d_model=cfg.d_model, d_kv=cfg.d_kv,
        num_heads=cfg.num_heads, d_ff=cfg.d_ff, num_layers=cfg.num_layers,
        num_decoder_layers=cfg.num_decoder_layers,
        relative_attention_num_buckets=cfg.relative_attention_num_buckets,
        relative_attention_max_distance=cfg.relative_attention_max_distance,
        feed_forward_proj="gated-gelu", tie_word_embeddings=False,
        dropout_rate=0.0, attn_implementation="eager",
        decoder_start_token_id=0)
    torch.manual_seed(5)
    hf = T5ForConditionalGeneration(hf_cfg).eval().float()
    hf.set_attn_implementation("eager")
    params = jax.tree.map(jnp.asarray, import_t5_torch(hf, cfg))

    rng = np.random.default_rng(6)
    B, Te, Td = 2, 9, 5
    enc_ids = rng.integers(3, cfg.vocab_size - 2, size=(B, Te)).astype(np.int64)
    enc_mask = np.ones((B, Te), np.int64)
    enc_mask[1, -3:] = 0
    dec_ids = rng.integers(3, cfg.vocab_size - 2, size=(B, Td)).astype(np.int64)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(enc_ids),
                 attention_mask=torch.tensor(enc_mask),
                 decoder_input_ids=torch.tensor(dec_ids)).logits.numpy()
    enc_embeds = params["embed_tokens"][jnp.asarray(enc_ids)]
    out = np.asarray(t5_forward(params, cfg, enc_embeds, jnp.asarray(enc_mask),
                                jnp.asarray(dec_ids)))
    np.testing.assert_allclose(out, ref, atol=3e-4, rtol=2e-3)

    new = 6
    with torch.no_grad():
        gen = hf.generate(input_ids=torch.tensor(enc_ids),
                          attention_mask=torch.tensor(enc_mask),
                          max_new_tokens=new, do_sample=False, use_cache=True,
                          eos_token_id=None, pad_token_id=0, min_length=new + 1)
    ref_new = gen[:, 1:1 + new].numpy()   # drop decoder_start
    out = np.asarray(t5_generate(params, cfg, enc_embeds,
                                 jnp.asarray(enc_mask), new, eos_token_id=-1))
    np.testing.assert_array_equal(out, ref_new)


def test_blip2_flant5_logits_and_greedy_match_hf():
    """End-to-end BLIP-2 with the flan-t5 tower (the reference's headline
    BLIP-2 eval checkpoint family)."""
    from transformers import T5Config as HFT5Config

    cfg = tiny_blip2_config("t5")
    t5 = cfg.text
    text_cfg = HFT5Config(
        vocab_size=t5.vocab_size, d_model=t5.d_model, d_kv=t5.d_kv,
        num_heads=t5.num_heads, d_ff=t5.d_ff, num_layers=t5.num_layers,
        num_decoder_layers=t5.num_decoder_layers,
        relative_attention_num_buckets=t5.relative_attention_num_buckets,
        relative_attention_max_distance=t5.relative_attention_max_distance,
        feed_forward_proj="gated-gelu", tie_word_embeddings=False,
        dropout_rate=0.0, decoder_start_token_id=0)
    from transformers import Blip2Config as HFBlip2Config

    base = _hf_cfg(tiny_blip2_config("opt"))   # only vision/qformer reused
    hf_cfg = HFBlip2Config(
        vision_config=base.vision_config.to_dict(),
        qformer_config=base.qformer_config.to_dict(),
        text_config=text_cfg.to_dict(),
        num_query_tokens=cfg.num_query_tokens,
        image_token_index=t5.vocab_size - 1)
    torch.manual_seed(9)
    hf = transformers.Blip2ForConditionalGeneration(hf_cfg).eval().float()
    hf.set_attn_implementation("eager")
    params = jax.tree.map(jnp.asarray, import_blip2_torch(hf, cfg))

    rng = np.random.default_rng(9)
    pix = rng.normal(size=(2, 3, 28, 28)).astype(np.float32)
    ids = rng.integers(3, t5.vocab_size - 2, size=(2, 6)).astype(np.int64)
    mask = np.ones_like(ids)
    dec_ids = rng.integers(3, t5.vocab_size - 2, size=(2, 4)).astype(np.int64)
    img_tok = np.full((2, cfg.num_query_tokens), t5.vocab_size - 1, ids.dtype)
    hf_ids = np.concatenate([img_tok, ids], axis=1)
    hf_mask = np.concatenate([np.ones_like(img_tok), mask], axis=1)

    with torch.no_grad():
        ref = hf(pixel_values=torch.tensor(pix), input_ids=torch.tensor(hf_ids),
                 attention_mask=torch.tensor(hf_mask),
                 decoder_input_ids=torch.tensor(dec_ids)).logits.numpy()
    out = np.asarray(blip2_forward(params, cfg, jnp.asarray(pix),
                                   jnp.asarray(ids), jnp.asarray(mask),
                                   decoder_input_ids=jnp.asarray(dec_ids)))
    np.testing.assert_allclose(out, ref, atol=3e-4, rtol=2e-3)

    new = 5
    with torch.no_grad():
        gen = hf.generate(pixel_values=torch.tensor(pix),
                          input_ids=torch.tensor(hf_ids),
                          attention_mask=torch.tensor(hf_mask),
                          max_new_tokens=new, do_sample=False, use_cache=True,
                          eos_token_id=None, pad_token_id=0,
                          min_new_tokens=new)
    ref_new = gen[:, 1:1 + new].numpy()
    out = np.asarray(blip2_generate(params, cfg, jnp.asarray(pix),
                                    jnp.asarray(ids), jnp.asarray(mask), new,
                                    eos_token_id=-1))
    np.testing.assert_array_equal(out, ref_new)


def test_blip2_qformer_classification_harness():
    """Zoo ImageNet capability: Q-Former image/text embeddings drive the
    CLIP-style classification pipeline (BLIP2ImageNetPipeline behavior)."""
    from cullavo_tpu.models.blip2 import init_blip2_params
    from cullavo_tpu.models.blip2.modeling import (blip2_image_embed,
                                                   blip2_text_embed)
    from cullavo_tpu.pipelines.imagenet_pipeline import ImageNetPipeline

    cfg = tiny_blip2_config("llama_text")   # text-input qformer weights
    params = init_blip2_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    C = 5
    t_ids = jnp.asarray(rng.integers(3, cfg.qformer.vocab_size - 1,
                                     size=(C, 6)))
    class_embeds = blip2_text_embed(params, cfg, t_ids,
                                    jnp.ones((C, 6), jnp.int32))
    assert class_embeds.shape == (C, cfg.qformer.hidden_size)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(class_embeds), axis=-1), 1.0, atol=1e-5)

    pipe = ImageNetPipeline(
        cfg=None,
        image_embed_fn=lambda pix: blip2_image_embed(params, cfg, pix),
        class_embeds=class_embeds,
        class_names=[f"c{i}" for i in range(C)], batch_size=2)
    data = [{"pixel_values": rng.normal(size=(3, 28, 28)).astype(np.float32),
             "label": i % C} for i in range(4)]
    out = pipe.evaluate_model(data)
    assert out["n"] == 4 and 0.0 <= out["top1"] <= 100.0


def test_opt_padded_batch_logits_match_hf():
    """OPT tower standalone vs HF, with right-padded rows — exercises the
    mask-cumsum learned-position path (OPTLearnedPositionalEmbedding)."""
    from transformers import OPTConfig as HFOPTConfig
    from transformers import OPTForCausalLM

    from cullavo_tpu.models.blip2.config import OptConfig
    from cullavo_tpu.models.blip2.opt import opt_forward, opt_position_ids

    cfg = OptConfig(vocab_size=120, hidden_size=32, ffn_dim=64,
                    num_hidden_layers=2, num_attention_heads=4,
                    max_position_embeddings=128)
    hf_cfg = HFOPTConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        ffn_dim=cfg.ffn_dim, num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        word_embed_proj_dim=cfg.hidden_size, dropout=0.0,
        activation_function="relu", attn_implementation="eager")
    torch.manual_seed(11)
    hf = OPTForCausalLM(hf_cfg).eval().float()

    sd = {f"language_model.{k}": v for k, v in hf.state_dict().items()}

    def t(name):
        return np.ascontiguousarray(sd[name].detach().numpy().T)

    def g(name):
        return sd[name].detach().numpy()

    base = "language_model.model.decoder"
    L = cfg.num_hidden_layers

    def ostack(fmt, transpose=True):
        return np.stack([t(fmt.format(i)) if transpose else g(fmt.format(i))
                         for i in range(L)])

    params = {
        "embed_tokens": g(f"{base}.embed_tokens.weight"),
        "embed_positions": g(f"{base}.embed_positions.weight"),
        "final_ln": g(f"{base}.final_layer_norm.weight"),
        "final_ln_b": g(f"{base}.final_layer_norm.bias"),
        "layers": {
            "q": ostack(base + ".layers.{}.self_attn.q_proj.weight"),
            "q_b": ostack(base + ".layers.{}.self_attn.q_proj.bias", False),
            "k": ostack(base + ".layers.{}.self_attn.k_proj.weight"),
            "k_b": ostack(base + ".layers.{}.self_attn.k_proj.bias", False),
            "v": ostack(base + ".layers.{}.self_attn.v_proj.weight"),
            "v_b": ostack(base + ".layers.{}.self_attn.v_proj.bias", False),
            "o": ostack(base + ".layers.{}.self_attn.out_proj.weight"),
            "o_b": ostack(base + ".layers.{}.self_attn.out_proj.bias", False),
            "attn_ln": ostack(base + ".layers.{}.self_attn_layer_norm.weight", False),
            "attn_ln_b": ostack(base + ".layers.{}.self_attn_layer_norm.bias", False),
            "fc1": ostack(base + ".layers.{}.fc1.weight"),
            "fc1_b": ostack(base + ".layers.{}.fc1.bias", False),
            "fc2": ostack(base + ".layers.{}.fc2.weight"),
            "fc2_b": ostack(base + ".layers.{}.fc2.bias", False),
            "final_ln": ostack(base + ".layers.{}.final_layer_norm.weight", False),
            "final_ln_b": ostack(base + ".layers.{}.final_layer_norm.bias", False),
        },
    }
    params = jax.tree.map(jnp.asarray, params)

    rng = np.random.default_rng(12)
    ids = rng.integers(3, 119, size=(2, 9)).astype(np.int64)
    mask = np.ones((2, 9), np.int64)
    mask[1, -3:] = 0                       # right padding on row 1
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask)).logits.numpy()
    emb = params["embed_tokens"][jnp.asarray(ids)]
    pos = opt_position_ids(jnp.asarray(mask))
    h, _ = opt_forward(params, cfg, emb, jnp.asarray(mask), pos)
    logits = np.asarray(h @ params["embed_tokens"].T)
    valid = mask.astype(bool)
    np.testing.assert_allclose(logits[valid], ref[valid], atol=3e-4, rtol=2e-3)


def test_blip2_padded_batch_matches_per_row():
    """Right-padded batched greedy decode equals per-row decode (the
    last-valid-position sampling fix)."""
    from cullavo_tpu.models.blip2 import init_blip2_params

    cfg = tiny_blip2_config("opt")
    params = init_blip2_params(cfg, jax.random.PRNGKey(7))
    rng = np.random.default_rng(8)
    T = 8
    ids = rng.integers(3, cfg.text.vocab_size - 2, size=(2, T)).astype(np.int32)
    mask = np.ones((2, T), np.int32)
    mask[1, -3:] = 0
    pix = rng.normal(size=(2, 3, 28, 28)).astype(np.float32)
    new = 5
    batched = np.asarray(blip2_generate(params, cfg, jnp.asarray(pix),
                                        jnp.asarray(ids), jnp.asarray(mask), new))
    for b in range(2):
        keep = T if b == 0 else T - 3
        solo = np.asarray(blip2_generate(
            params, cfg, jnp.asarray(pix[b:b + 1]),
            jnp.asarray(ids[b:b + 1, :keep]),
            jnp.asarray(mask[b:b + 1, :keep]), new))
        np.testing.assert_array_equal(batched[b], solo[0], err_msg=f"row {b}")


def test_t5_beam_search_matches_hf():
    """Beam-5 / length_penalty=-1 decode (the reference's BLIP-2 generation
    settings, BLIP2VQAVALPipeline.py:175) vs HF BeamSearchScorer."""
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration

    from cullavo_tpu.models.blip2.t5 import (import_t5_torch, t5_beam_generate,
                                             tiny_t5_config)

    cfg = tiny_t5_config()
    hf_cfg = HFT5Config(
        vocab_size=cfg.vocab_size, d_model=cfg.d_model, d_kv=cfg.d_kv,
        num_heads=cfg.num_heads, d_ff=cfg.d_ff, num_layers=cfg.num_layers,
        num_decoder_layers=cfg.num_decoder_layers,
        relative_attention_num_buckets=cfg.relative_attention_num_buckets,
        relative_attention_max_distance=cfg.relative_attention_max_distance,
        feed_forward_proj="gated-gelu", tie_word_embeddings=False,
        dropout_rate=0.0, attn_implementation="eager",
        decoder_start_token_id=0)
    torch.manual_seed(11)
    hf = T5ForConditionalGeneration(hf_cfg).eval().float()
    hf.set_attn_implementation("eager")
    params = jax.tree.map(jnp.asarray, import_t5_torch(hf, cfg))

    rng = np.random.default_rng(13)
    B, Te, new = 3, 7, 8
    enc_ids = rng.integers(3, cfg.vocab_size - 2, size=(B, Te)).astype(np.int64)
    enc_mask = np.ones((B, Te), np.int64)
    enc_mask[2, -2:] = 0
    enc_embeds = params["embed_tokens"][jnp.asarray(enc_ids)]

    for lp in (-1.0, 1.0):
        with torch.no_grad():
            ref = hf.generate(input_ids=torch.tensor(enc_ids),
                              attention_mask=torch.tensor(enc_mask),
                              max_new_tokens=new, num_beams=5,
                              length_penalty=lp, do_sample=False,
                              early_stopping=False, use_cache=True,
                              eos_token_id=1, pad_token_id=0).numpy()
        out = np.asarray(t5_beam_generate(params, cfg, enc_embeds,
                                          jnp.asarray(enc_mask), new,
                                          num_beams=5, length_penalty=lp,
                                          eos_token_id=1))
        ref_new = ref[:, 1:]                      # drop decoder_start
        width = ref_new.shape[1]
        np.testing.assert_array_equal(out[:, :width], ref_new,
                                      err_msg=f"length_penalty={lp}")
        assert (out[:, width:] == 0).all()


def test_blip2_opt_beam_search_matches_hf():
    """Decoder-only beam decode (num_beams=5, length_penalty=-1 — the
    reference's BLIP-2/InstructBLIP settings) vs HF generate."""
    from cullavo_tpu.models.blip2.modeling import blip2_beam_generate

    cfg = tiny_blip2_config("opt")
    torch.manual_seed(21)
    hf = transformers.Blip2ForConditionalGeneration(_hf_cfg(cfg)).eval().float()
    params = jax.tree.map(jnp.asarray, import_blip2_torch(hf, cfg))
    pix, ids, mask = _inputs(cfg, seed=21)
    img_tok = np.full((ids.shape[0], cfg.num_query_tokens),
                      cfg.text.vocab_size - 1, ids.dtype)
    hf_ids = np.concatenate([img_tok, ids], axis=1)
    hf_mask = np.concatenate([np.ones_like(img_tok), mask], axis=1)

    new, eos = 8, 1
    for lp in (-1.0, 1.0):
        with torch.no_grad():
            gen = hf.generate(pixel_values=torch.tensor(pix),
                              input_ids=torch.tensor(hf_ids),
                              attention_mask=torch.tensor(hf_mask),
                              max_new_tokens=new, num_beams=5,
                              length_penalty=lp, do_sample=False,
                              early_stopping=False, use_cache=True,
                              eos_token_id=eos, pad_token_id=0).numpy()
        ref_new = gen[:, hf_ids.shape[1]:]
        out = np.asarray(blip2_beam_generate(
            params, cfg, jnp.asarray(pix), jnp.asarray(ids), jnp.asarray(mask),
            new, num_beams=5, length_penalty=lp, eos_token_id=eos))
        width = ref_new.shape[1]
        np.testing.assert_array_equal(out[:, :width], ref_new,
                                      err_msg=f"length_penalty={lp}")
        assert (out[:, width:] == 0).all()


def test_blip2_opt_beam_padded_batch_matches_hf():
    """Mixed prompt lengths: ours right-padded vs HF left-padded (HF's
    required convention for decoder-only generate) — logical positions make
    the beams identical."""
    from cullavo_tpu.models.blip2.modeling import blip2_beam_generate

    cfg = tiny_blip2_config("opt")
    torch.manual_seed(31)
    hf = transformers.Blip2ForConditionalGeneration(_hf_cfg(cfg)).eval().float()
    params = jax.tree.map(jnp.asarray, import_blip2_torch(hf, cfg))
    pix, ids, mask = _inputs(cfg, batch=2, text_len=6, seed=31)
    # row 1 has a shorter prompt: right-pad ours, left-pad HF
    mask[1, -2:] = 0
    ids_l = ids.copy()
    ids_l[1] = np.concatenate([ids[1, -2:] * 0, ids[1, :-2]])   # left-padded
    mask_l = np.concatenate([np.zeros((1, 2)), np.ones((1, 4))],
                            axis=1).astype(ids.dtype)
    img_tok = np.full((2, cfg.num_query_tokens), cfg.text.vocab_size - 1,
                      ids.dtype)
    # HF layout: [pad..., image-token block, text] per its left-pad convention
    hf_ids = np.stack([
        np.concatenate([img_tok[0], ids[0]]),
        np.concatenate([ids_l[1, :2], img_tok[1], ids_l[1, 2:]]),
    ])
    hf_mask = np.stack([
        np.ones(hf_ids.shape[1], np.int64),
        np.concatenate([mask_l[0, :2], np.ones(cfg.num_query_tokens),
                        mask_l[0, 2:]]),
    ]).astype(np.int64)

    new, eos = 6, 1
    with torch.no_grad():
        gen = hf.generate(pixel_values=torch.tensor(pix),
                          input_ids=torch.tensor(hf_ids),
                          attention_mask=torch.tensor(hf_mask),
                          max_new_tokens=new, num_beams=3, length_penalty=-1.0,
                          do_sample=False, early_stopping=False, use_cache=True,
                          eos_token_id=eos, pad_token_id=0).numpy()
    ref_new = gen[:, hf_ids.shape[1]:]
    out = np.asarray(blip2_beam_generate(
        params, cfg, jnp.asarray(pix), jnp.asarray(ids), jnp.asarray(mask),
        new, num_beams=3, length_penalty=-1.0, eos_token_id=eos))
    width = ref_new.shape[1]
    np.testing.assert_array_equal(out[:, :width], ref_new)
