"""HF parity tests for the TPU-native KOSMOS-2 (models/kosmos2.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from cullavo_tpu.models.kosmos2 import (import_kosmos2_torch, kosmos2_forward,
                                        kosmos2_generate, tiny_kosmos2_config)


@pytest.fixture(scope="module")
def hf_and_jax():
    from transformers import Kosmos2Config, Kosmos2ForConditionalGeneration
    from transformers.models.kosmos2.configuration_kosmos2 import Kosmos2TextConfig

    cfg = tiny_kosmos2_config()
    hf_cfg = Kosmos2Config(
        text_config=Kosmos2TextConfig(
            vocab_size=cfg.text.vocab_size, embed_dim=cfg.text.embed_dim,
            layers=cfg.text.layers, ffn_dim=cfg.text.ffn_dim,
            attention_heads=cfg.text.attention_heads,
            max_position_embeddings=cfg.text.max_position_embeddings,
            dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            layerdrop=0.0, attn_implementation="eager").to_dict(),
        vision_config=dict(
            hidden_size=cfg.vision.hidden_size,
            intermediate_size=cfg.vision.intermediate_size,
            num_hidden_layers=cfg.vision.num_hidden_layers,
            num_attention_heads=cfg.vision.num_attention_heads,
            image_size=cfg.vision.image_size, patch_size=cfg.vision.patch_size,
            attention_dropout=0.0),
        latent_query_num=cfg.latent_query_num,
        # force eager everywhere: HF's sdpa wrapper defaults is_causal=True for
        # modules that don't set it, silently causal-masking the latent-query
        # cross-attention pooling — eager is the reference semantics
        attn_implementation="eager")
    torch.manual_seed(3)
    hf = Kosmos2ForConditionalGeneration(hf_cfg).eval().float()
    hf.set_attn_implementation("eager")
    params = jax.tree.map(jnp.asarray, import_kosmos2_torch(hf, cfg))
    return hf, params, cfg


def _inputs(cfg, batch=2, text_len=5, seed=0):
    rng = np.random.default_rng(seed)
    pix = rng.normal(size=(batch, 3, cfg.vision.image_size,
                           cfg.vision.image_size)).astype(np.float32)
    N = cfg.latent_query_num
    T = N + text_len
    ids = rng.integers(4, cfg.text.vocab_size - 2, size=(batch, T)).astype(np.int64)
    img_mask = np.zeros((batch, T), np.int64)
    img_mask[:, :N] = 1          # image slots lead, as the processor lays out
    mask = np.ones((batch, T), np.int64)
    return pix, ids, img_mask, mask


def test_kosmos2_logits_match_hf(hf_and_jax):
    hf, params, cfg = hf_and_jax
    pix, ids, img_mask, mask = _inputs(cfg, seed=4)
    with torch.no_grad():
        ref = hf(pixel_values=torch.tensor(pix), input_ids=torch.tensor(ids),
                 image_embeds_position_mask=torch.tensor(img_mask),
                 attention_mask=torch.tensor(mask)).logits.numpy()
    out = np.asarray(kosmos2_forward(params, cfg, jnp.asarray(pix),
                                     jnp.asarray(ids), jnp.asarray(img_mask),
                                     jnp.asarray(mask)))
    np.testing.assert_allclose(out, ref, atol=3e-4, rtol=2e-3)


def test_kosmos2_greedy_matches_hf(hf_and_jax):
    hf, params, cfg = hf_and_jax
    pix, ids, img_mask, mask = _inputs(cfg, seed=5)
    new = 6
    with torch.no_grad():
        gen = hf.generate(pixel_values=torch.tensor(pix),
                          input_ids=torch.tensor(ids),
                          image_embeds_position_mask=torch.tensor(img_mask),
                          attention_mask=torch.tensor(mask),
                          max_new_tokens=new, do_sample=False, use_cache=True,
                          eos_token_id=None, pad_token_id=0)
    ref_new = gen[:, -new:].numpy()
    out = np.asarray(kosmos2_generate(params, cfg, jnp.asarray(pix),
                                      jnp.asarray(ids), jnp.asarray(img_mask),
                                      jnp.asarray(mask), new))
    np.testing.assert_array_equal(out, ref_new)


def test_kosmos2_padded_batch_matches_per_row():
    """Right-padded batched greedy decode equals per-row decode (logical
    key positions under the sinusoidal-position convention)."""
    from cullavo_tpu.models.kosmos2 import init_kosmos2_params

    cfg = tiny_kosmos2_config()
    params = init_kosmos2_params(cfg, jax.random.PRNGKey(8))
    rng = np.random.default_rng(9)
    N = cfg.latent_query_num
    T = N + 7
    ids = rng.integers(4, cfg.text.vocab_size - 2, size=(2, T)).astype(np.int32)
    img_mask = np.zeros((2, T), np.int32)
    img_mask[:, :N] = 1
    mask = np.ones((2, T), np.int32)
    mask[1, -3:] = 0                      # row 1 right-padded
    pix = rng.normal(size=(2, 3, cfg.vision.image_size,
                           cfg.vision.image_size)).astype(np.float32)
    new = 5
    batched = np.asarray(kosmos2_generate(
        params, cfg, jnp.asarray(pix), jnp.asarray(ids), jnp.asarray(img_mask),
        jnp.asarray(mask), new))
    for b in range(2):
        keep = T if b == 0 else T - 3
        solo = np.asarray(kosmos2_generate(
            params, cfg, jnp.asarray(pix[b:b + 1]),
            jnp.asarray(ids[b:b + 1, :keep]),
            jnp.asarray(img_mask[b:b + 1, :keep]),
            jnp.asarray(mask[b:b + 1, :keep]), new))
        np.testing.assert_array_equal(batched[b], solo[0], err_msg=f"row {b}")
