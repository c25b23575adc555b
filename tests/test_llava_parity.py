"""Logit-parity tests: cullavo_tpu JAX LLaVA vs HuggingFace torch (CPU).

A tiny random-weight LlavaForConditionalGeneration is the oracle; weights are
imported through the same path used for real checkpoints.  This is the test
pattern the reference applies to its one native op (ops/test.py:35-92) —
numeric parity against a trusted reference — extended to the whole model.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from cullavo_tpu.checkpoint.hf_import import import_torch_module, to_hf_state_dict
from cullavo_tpu.models.llava.config import tiny_llava_config
from cullavo_tpu.models.llava.modeling import (GenerationConfig, causal_lm_loss,
                                               generate, llava_forward)

VOCAB = 128


@pytest.fixture(scope="module")
def hf_and_jax():
    from transformers import (CLIPVisionConfig, LlamaConfig, LlavaConfig,
                              LlavaForConditionalGeneration)

    cfg = tiny_llava_config(VOCAB)
    hf_cfg = LlavaConfig(
        vision_config=CLIPVisionConfig(
            hidden_size=cfg.vision.hidden_size,
            intermediate_size=cfg.vision.intermediate_size,
            num_hidden_layers=cfg.vision.num_hidden_layers,
            num_attention_heads=cfg.vision.num_attention_heads,
            image_size=cfg.vision.image_size,
            patch_size=cfg.vision.patch_size,
        ),
        text_config=LlamaConfig(
            vocab_size=cfg.text.vocab_size,
            hidden_size=cfg.text.hidden_size,
            intermediate_size=cfg.text.intermediate_size,
            num_hidden_layers=cfg.text.num_hidden_layers,
            num_attention_heads=cfg.text.num_attention_heads,
            num_key_value_heads=cfg.text.num_key_value_heads,
            max_position_embeddings=cfg.text.max_position_embeddings,
            rms_norm_eps=cfg.text.rms_norm_eps,
        ),
        image_token_index=cfg.image_token_id,
        vision_feature_layer=cfg.vision_feature_layer,
        vision_feature_select_strategy=cfg.vision_feature_select_strategy,
    )
    torch.manual_seed(0)
    hf = LlavaForConditionalGeneration(hf_cfg).eval().float()
    params = import_torch_module(hf, cfg)
    params = jax.tree.map(jnp.asarray, params)
    return hf, params, cfg


def _make_inputs(cfg, batch=2, text_len=7, seed=3):
    rng = np.random.default_rng(seed)
    n_img = cfg.num_image_tokens
    ids = rng.integers(3, VOCAB - 2, size=(batch, text_len + n_img)).astype(np.int64)
    ids[:, 1:1 + n_img] = cfg.image_token_id  # expanded image block after BOS
    mask = np.ones_like(ids)
    pixels = rng.normal(size=(batch, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32)
    return ids, mask, pixels


def test_forward_logits_match(hf_and_jax):
    hf, params, cfg = hf_and_jax
    ids, mask, pixels = _make_inputs(cfg)

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids), pixel_values=torch.tensor(pixels),
                 attention_mask=torch.tensor(mask)).logits.numpy()

    logits, _ = llava_forward(params, cfg, jnp.asarray(ids), jnp.asarray(pixels),
                              jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4, rtol=2e-3)


def test_forward_text_only_padded(hf_and_jax):
    hf, params, cfg = hf_and_jax
    rng = np.random.default_rng(0)
    ids = rng.integers(3, VOCAB - 2, size=(2, 9)).astype(np.int64)
    mask = np.ones_like(ids)
    mask[1, 6:] = 0  # right padding on row 1

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask)).logits.numpy()
    logits, _ = llava_forward(params, cfg, jnp.asarray(ids), None, jnp.asarray(mask))
    # compare only valid positions
    np.testing.assert_allclose(np.asarray(logits)[0], ref[0], atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(logits)[1, :6], ref[1, :6], atol=2e-4, rtol=2e-3)


def test_loss_matches_hf(hf_and_jax):
    hf, params, cfg = hf_and_jax
    ids, mask, pixels = _make_inputs(cfg)
    labels = ids.copy()
    labels[:, :cfg.num_image_tokens + 3] = -100

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids), pixel_values=torch.tensor(pixels),
                 attention_mask=torch.tensor(mask), labels=torch.tensor(labels))
    logits, _ = llava_forward(params, cfg, jnp.asarray(ids), jnp.asarray(pixels),
                              jnp.asarray(mask))
    loss, n = causal_lm_loss(logits, jnp.asarray(labels), jnp.asarray(mask))
    assert n > 0
    np.testing.assert_allclose(float(loss), float(ref.loss), atol=1e-4, rtol=1e-4)


def test_greedy_generate_matches_hf(hf_and_jax):
    hf, params, cfg = hf_and_jax
    ids, mask, pixels = _make_inputs(cfg, batch=1, text_len=5)
    new_tokens = 12

    with torch.no_grad():
        ref = hf.generate(input_ids=torch.tensor(ids), pixel_values=torch.tensor(pixels),
                          attention_mask=torch.tensor(mask), max_new_tokens=new_tokens,
                          do_sample=False, use_cache=True,
                          eos_token_id=999,  # never stop (tiny vocab < 999 is invalid; use 2)
                          pad_token_id=0)
    ref_new = ref[:, ids.shape[1]:].numpy()

    gen = GenerationConfig(max_new_tokens=new_tokens, do_sample=False, eos_token_id=-1)
    out = generate(params, cfg, jnp.asarray(ids), jnp.asarray(pixels), jnp.asarray(mask),
                   gen, max_len=ids.shape[1] + new_tokens)
    np.testing.assert_array_equal(np.asarray(out)[0, :ref_new.shape[1]], ref_new[0])


def test_generate_padded_batch_consistent(hf_and_jax):
    """Right-padded batched decode must agree with per-row unpadded decode."""
    _, params, cfg = hf_and_jax
    rng = np.random.default_rng(7)
    n_img = cfg.num_image_tokens
    row0 = rng.integers(3, VOCAB - 2, size=(1, 6 + n_img)).astype(np.int64)
    row1 = rng.integers(3, VOCAB - 2, size=(1, 9 + n_img)).astype(np.int64)
    for r in (row0, row1):
        r[:, 1:1 + n_img] = cfg.image_token_id
    pix = rng.normal(size=(2, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32)

    T = row1.shape[1]
    ids = np.zeros((2, T), np.int64)
    mask = np.zeros((2, T), np.int64)
    ids[0, :row0.shape[1]] = row0[0]
    mask[0, :row0.shape[1]] = 1
    ids[1] = row1[0]
    mask[1] = 1

    gen = GenerationConfig(max_new_tokens=8, do_sample=False, eos_token_id=-1)
    batched = generate(params, cfg, jnp.asarray(ids), jnp.asarray(pix), jnp.asarray(mask),
                       gen, max_len=T + 8)
    solo0 = generate(params, cfg, jnp.asarray(row0), jnp.asarray(pix[:1]),
                     jnp.ones_like(jnp.asarray(row0)), gen, max_len=row0.shape[1] + 8)
    solo1 = generate(params, cfg, jnp.asarray(row1), jnp.asarray(pix[1:]),
                     jnp.ones_like(jnp.asarray(row1)), gen, max_len=T + 8)
    np.testing.assert_array_equal(np.asarray(batched)[0], np.asarray(solo0)[0])
    np.testing.assert_array_equal(np.asarray(batched)[1], np.asarray(solo1)[0])


def test_hf_roundtrip_export(hf_and_jax):
    hf, params, cfg = hf_and_jax
    exported = to_hf_state_dict(jax.tree.map(np.asarray, params), cfg)
    ref_state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    missing = set(ref_state) - set(exported)
    # rotary buffers etc. are not parameters; everything persistent must match
    assert not missing, f"missing keys: {sorted(missing)[:8]}"
    for k, v in exported.items():
        np.testing.assert_allclose(v, ref_state[k], atol=1e-6, err_msg=k)


def test_two_phase_generate_matches_fused(hf_and_jax):
    from cullavo_tpu.models.llava.modeling import generate_decode, generate_prefill

    _, params, cfg = hf_and_jax
    ids, mask, pixels = _make_inputs(cfg, batch=2, text_len=5)
    gen = GenerationConfig(max_new_tokens=8, do_sample=False, eos_token_id=-1)
    max_len = ids.shape[1] + 8
    fused = generate(params, cfg, jnp.asarray(ids), jnp.asarray(pixels),
                     jnp.asarray(mask), gen, max_len=max_len)
    state = generate_prefill(params, cfg, jnp.asarray(ids), jnp.asarray(pixels),
                             jnp.asarray(mask), max_len, compute_dtype=jnp.float32)
    split = generate_decode(params, cfg, state, gen, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(split))


def test_chunked_prefill_matches_unchunked(hf_and_jax):
    """Chunked prefill (memory-sized prefill chunks merged into one donated
    full-batch decode state) must be token-exact vs the one-shot prefill —
    the big-batch decode lever behind bench.py's BENCH_PREFILL_CHUNK."""
    from cullavo_tpu.models.llava.modeling import (generate_decode,
                                                   generate_prefill,
                                                   generate_prefill_chunked)

    _, params, cfg = hf_and_jax
    ids, mask, pixels = _make_inputs(cfg, batch=4, text_len=5)
    gen = GenerationConfig(max_new_tokens=8, do_sample=False, eos_token_id=-1)
    max_len = ids.shape[1] + 8
    state = generate_prefill(params, cfg, jnp.asarray(ids), jnp.asarray(pixels),
                             jnp.asarray(mask), max_len, compute_dtype=jnp.float32)
    ref = generate_decode(params, cfg, state, gen, compute_dtype=jnp.float32)
    for chunk in (1, 2, 3):   # 3 exercises the uneven final chunk (3+1)
        st = generate_prefill_chunked(params, cfg, jnp.asarray(ids),
                                      jnp.asarray(pixels), jnp.asarray(mask),
                                      max_len, chunk, compute_dtype=jnp.float32)
        out = generate_decode(params, cfg, st, gen, compute_dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out),
                                      err_msg=f"chunk={chunk}")


def test_bakllava_mistral_logits_match_hf():
    """BakLLaVA path: LLaVA arch with a Mistral decoder (GQA + sliding
    window).  Tiny HF MistralForCausalLM is the oracle; the window is set
    below the sequence length so the local-attention mask is exercised."""
    import dataclasses

    from transformers import MistralConfig, MistralForCausalLM

    from cullavo_tpu.models.llava.config import tiny_llava_config
    from cullavo_tpu.models.llava.llama import llama_forward

    cfg = dataclasses.replace(tiny_llava_config(VOCAB).text, sliding_window=5)
    hf_cfg = MistralConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        rms_norm_eps=cfg.rms_norm_eps, sliding_window=5,
        attn_implementation="eager")
    torch.manual_seed(1)
    hf = MistralForCausalLM(hf_cfg).eval().float()

    rng = np.random.default_rng(0)
    T = 12
    ids = rng.integers(4, VOCAB - 4, size=(2, T)).astype(np.int32)
    mask = np.ones((2, T), np.int32)
    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids.astype(np.int64)),
                 attention_mask=torch.tensor(mask.astype(np.int64)))
    ref_logits = out.logits.numpy()

    # build jax params directly from the HF module (text side only)
    def t(x):
        return jnp.asarray(x.detach().numpy())

    m = hf.model
    layers = {
        "q": jnp.stack([t(l.self_attn.q_proj.weight).T for l in m.layers]),
        "k": jnp.stack([t(l.self_attn.k_proj.weight).T for l in m.layers]),
        "v": jnp.stack([t(l.self_attn.v_proj.weight).T for l in m.layers]),
        "o": jnp.stack([t(l.self_attn.o_proj.weight).T for l in m.layers]),
        "gate": jnp.stack([t(l.mlp.gate_proj.weight).T for l in m.layers]),
        "up": jnp.stack([t(l.mlp.up_proj.weight).T for l in m.layers]),
        "down": jnp.stack([t(l.mlp.down_proj.weight).T for l in m.layers]),
        "input_ln": jnp.stack([t(l.input_layernorm.weight) for l in m.layers]),
        "post_ln": jnp.stack([t(l.post_attention_layernorm.weight) for l in m.layers]),
    }
    emb = t(m.embed_tokens.weight)
    jparams = {"layers": layers, "norm": t(m.norm.weight)}
    h, _ = llama_forward(jparams, cfg, emb[jnp.asarray(ids)],
                         jnp.asarray(mask), jnp.arange(T)[None, :].repeat(2, 0))
    logits = np.asarray(h @ t(hf.lm_head.weight).T)
    np.testing.assert_allclose(logits, ref_logits, atol=2e-4, rtol=2e-3)

    # sanity: window actually bites (full-causal config differs)
    cfg_nw = dataclasses.replace(cfg, sliding_window=None)
    h2, _ = llama_forward(jparams, cfg_nw, emb[jnp.asarray(ids)],
                          jnp.asarray(mask), jnp.arange(T)[None, :].repeat(2, 0))
    logits2 = np.asarray(h2 @ t(hf.lm_head.weight).T)
    assert np.abs(logits2 - ref_logits).max() > 1e-3


def test_bakllava_end_to_end_greedy_matches_hf():
    """Full BakLLaVA arch (LLaVA + Mistral decoder, sliding window) through
    the SAME import + generate path used for real checkpoints."""
    import dataclasses

    from transformers import (CLIPVisionConfig, LlavaConfig as HFLlavaConfig,
                              LlavaForConditionalGeneration, MistralConfig)

    from cullavo_tpu.models.llava.config import LlamaConfig, tiny_llava_config

    base = tiny_llava_config(VOCAB)
    cfg = dataclasses.replace(base, text=LlamaConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=160,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, sliding_window=6))
    hf_cfg = HFLlavaConfig(
        vision_config=CLIPVisionConfig(
            hidden_size=base.vision.hidden_size,
            intermediate_size=base.vision.intermediate_size,
            num_hidden_layers=base.vision.num_hidden_layers,
            num_attention_heads=base.vision.num_attention_heads,
            image_size=base.vision.image_size,
            patch_size=base.vision.patch_size),
        text_config=MistralConfig(
            vocab_size=VOCAB, hidden_size=64, intermediate_size=160,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=256, rms_norm_eps=1e-5, sliding_window=6,
            attn_implementation="eager"),
        image_token_index=cfg.image_token_id,
        vision_feature_layer=cfg.vision_feature_layer,
        vision_feature_select_strategy=cfg.vision_feature_select_strategy)
    torch.manual_seed(7)
    hf = LlavaForConditionalGeneration(hf_cfg).eval().float()
    params = jax.tree.map(jnp.asarray, import_torch_module(hf, cfg))

    ids, mask, pixels = _make_inputs(cfg, batch=1, text_len=9, seed=11)
    new_tokens = 10
    with torch.no_grad():
        ref = hf.generate(input_ids=torch.tensor(ids),
                          pixel_values=torch.tensor(pixels),
                          attention_mask=torch.tensor(mask),
                          max_new_tokens=new_tokens, do_sample=False,
                          use_cache=True, eos_token_id=999, pad_token_id=0)
    ref_new = ref[:, ids.shape[1]:].numpy()
    gen = GenerationConfig(max_new_tokens=new_tokens, do_sample=False,
                           eos_token_id=-1)
    out = generate(params, cfg, jnp.asarray(ids), jnp.asarray(pixels),
                   jnp.asarray(mask), gen, max_len=ids.shape[1] + new_tokens)
    np.testing.assert_array_equal(np.asarray(out)[0, :ref_new.shape[1]],
                                  ref_new[0])


def test_llama_causal_lm_import_matches_hf():
    """Text-only LlamaForCausalLM importer (the VQA topic classifier's
    LLaMA-2 load path, LLaVAVQAVALPipeline.py:94-97): logits parity."""
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    from cullavo_tpu.checkpoint.hf_import import llama_from_causal_lm_state_dict
    from cullavo_tpu.models.llava.config import LlamaConfig
    from cullavo_tpu.models.llava.llama import llama_forward, lm_logits

    cfg = LlamaConfig(vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=128,
                      rms_norm_eps=1e-6)
    hf_cfg = HFLlamaConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-6,
        attn_implementation="eager")
    torch.manual_seed(9)
    hf = LlamaForCausalLM(hf_cfg).eval().float()
    lm = jax.tree.map(jnp.asarray, llama_from_causal_lm_state_dict(
        {k: v.detach().numpy() for k, v in hf.state_dict().items()}, cfg))

    rng = np.random.default_rng(8)
    B, T = 2, 11
    ids = rng.integers(2, VOCAB, size=(B, T)).astype(np.int64)
    mask = np.ones((B, T), np.int64)
    mask[1, -4:] = 0
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask)).logits.numpy()
    emb = jnp.take(lm["embed_tokens"], jnp.asarray(ids), axis=0)
    pos = jnp.maximum(jnp.cumsum(jnp.asarray(mask), axis=1) - 1, 0)
    h, _ = llama_forward(lm, cfg, emb, jnp.asarray(mask), pos)
    out = np.asarray(lm_logits(lm, cfg, h))
    valid = np.asarray(mask, bool)
    np.testing.assert_allclose(out[valid], ref[valid], atol=3e-4, rtol=2e-3)
