"""X-Decoder checkpoint importer: synthetic reference-layout state dict →
pytree with the exact structure/shapes of the native init."""
import numpy as np

import jax

from cullavo_tpu.checkpoint.xdecoder_import import (align_and_update,
                                                    import_xdecoder_checkpoint)
from cullavo_tpu.models.xdecoder.model import (init_xdecoder_model_params,
                                               tiny_xdecoder_config)


def _synthetic_reference_state(cfg):
    """Build a torch-layout state dict with the right shapes (values = iota)."""
    sd = {}
    rng = np.random.default_rng(0)

    def add(name, shape):
        sd[name] = rng.normal(size=shape).astype(np.float32) * 0.02

    b = cfg.backbone
    add("backbone.patch_embed.proj.weight", (b.embed_dim, 3, 7, 7))
    add("backbone.patch_embed.proj.bias", (b.embed_dim,))
    add("backbone.patch_embed.norm.weight", (b.embed_dim,))
    add("backbone.patch_embed.norm.bias", (b.embed_dim,))
    for i, depth in enumerate(b.depths):
        C = b.num_features[i]
        L = b.focal_levels[i]
        for d in range(depth):
            p = f"backbone.layers.{i}.blocks.{d}."
            add(p + "norm1.weight", (C,)); add(p + "norm1.bias", (C,))
            add(p + "modulation.f.weight", (2 * C + L + 1, C))
            add(p + "modulation.f.bias", (2 * C + L + 1,))
            add(p + "modulation.h.weight", (C, C, 1, 1))
            add(p + "modulation.h.bias", (C,))
            add(p + "modulation.proj.weight", (C, C))
            add(p + "modulation.proj.bias", (C,))
            add(p + "norm2.weight", (C,)); add(p + "norm2.bias", (C,))
            hidden = int(C * b.mlp_ratio)
            add(p + "mlp.fc1.weight", (hidden, C)); add(p + "mlp.fc1.bias", (hidden,))
            add(p + "mlp.fc2.weight", (C, hidden)); add(p + "mlp.fc2.bias", (C,))
            add(p + "gamma_1", (C,)); add(p + "gamma_2", (C,))
            for l in range(L):
                k = b.focal_factor * l + b.focal_windows[i]
                add(p + f"modulation.focal_layers.{l}.0.weight", (C, 1, k, k))
        if i < len(b.depths) - 1:
            C2 = b.num_features[i + 1]
            add(f"backbone.layers.{i}.downsample.proj.weight", (C2, C, 3, 3))
            add(f"backbone.layers.{i}.downsample.proj.bias", (C2,))
            add(f"backbone.layers.{i}.downsample.norm.weight", (C2,))
            add(f"backbone.layers.{i}.downsample.norm.bias", (C2,))
    for i in b.out_indices:
        add(f"backbone.norm{i}.weight", (b.num_features[i],))
        add(f"backbone.norm{i}.bias", (b.num_features[i],))

    f = cfg.fpn
    D = f.conv_dim
    pre = "sem_seg_head.pixel_decoder."
    add(pre + "input_proj.weight", (D, f.in_channels[-1], 1, 1))
    add(pre + "input_proj.bias", (D,))
    for i in range(f.enc_layers):
        base = pre + f"transformer.encoder.layers.{i}."
        add(base + "self_attn.in_proj_weight", (3 * D, D))
        add(base + "self_attn.in_proj_bias", (3 * D,))
        add(base + "self_attn.out_proj.weight", (D, D))
        add(base + "self_attn.out_proj.bias", (D,))
        add(base + "norm1.weight", (D,)); add(base + "norm1.bias", (D,))
        add(base + "linear1.weight", (f.enc_ffn, D)); add(base + "linear1.bias", (f.enc_ffn,))
        add(base + "linear2.weight", (D, f.enc_ffn)); add(base + "linear2.bias", (D,))
        add(base + "norm2.weight", (D,)); add(base + "norm2.bias", (D,))
    for name, cin in [("layer_4", D), ("layer_3", D), ("layer_2", D), ("layer_1", D)]:
        k = 3
        add(pre + name + ".weight", (D, cin, k, k))
        add(pre + name + ".bias", (D,))
        add(pre + name + ".norm.weight", (D,)); add(pre + name + ".norm.bias", (D,))
    for name, cin in [("adapter_3", f.in_channels[2]), ("adapter_2", f.in_channels[1]),
                      ("adapter_1", f.in_channels[0])]:
        add(pre + name + ".weight", (D, cin, 1, 1))
        add(pre + name + ".bias", (D,))
        add(pre + name + ".norm.weight", (D,)); add(pre + name + ".norm.bias", (D,))
    add(pre + "mask_features.weight", (f.mask_dim, D, 3, 3))
    add(pre + "mask_features.bias", (f.mask_dim,))

    d = cfg.decoder
    pp = "sem_seg_head.predictor."
    H = d.hidden_dim
    for i in range(d.dec_layers):
        for kind, sub in [("transformer_cross_attention_layers", "multihead_attn"),
                          ("transformer_self_attention_layers", "self_attn")]:
            add(pp + f"{kind}.{i}.{sub}.in_proj_weight", (3 * H, H))
            add(pp + f"{kind}.{i}.{sub}.in_proj_bias", (3 * H,))
            add(pp + f"{kind}.{i}.{sub}.out_proj.weight", (H, H))
            add(pp + f"{kind}.{i}.{sub}.out_proj.bias", (H,))
            add(pp + f"{kind}.{i}.norm.weight", (H,))
            add(pp + f"{kind}.{i}.norm.bias", (H,))
        add(pp + f"transformer_ffn_layers.{i}.linear1.weight", (d.dim_feedforward, H))
        add(pp + f"transformer_ffn_layers.{i}.linear1.bias", (d.dim_feedforward,))
        add(pp + f"transformer_ffn_layers.{i}.linear2.weight", (H, d.dim_feedforward))
        add(pp + f"transformer_ffn_layers.{i}.linear2.bias", (H,))
        add(pp + f"transformer_ffn_layers.{i}.norm.weight", (H,))
        add(pp + f"transformer_ffn_layers.{i}.norm.bias", (H,))
    add(pp + "decoder_norm.weight", (H,)); add(pp + "decoder_norm.bias", (H,))
    add(pp + "query_feat.weight", (d.num_queries, H))
    add(pp + "query_embed.weight", (d.num_queries, H))
    add(pp + "level_embed.weight", (d.num_feature_levels, H))
    add(pp + "class_embed", (H, d.dim_proj))
    add(pp + "caping_embed", (H, d.dim_proj))
    add(pp + "pos_embed_caping.weight", (d.contxt_len, H))
    for head, out in [("mask_embed", d.mask_dim), ("bbox_embed", 4)]:
        add(pp + f"{head}.layers.0.weight", (H, H)); add(pp + f"{head}.layers.0.bias", (H,))
        add(pp + f"{head}.layers.1.weight", (H, H)); add(pp + f"{head}.layers.1.bias", (H,))
        add(pp + f"{head}.layers.2.weight", (out, H)); add(pp + f"{head}.layers.2.bias", (out,))

    t = cfg.text
    pt = "sem_seg_head.predictor.lang_encoder."
    add(pt + "lang_encoder.token_embedding.weight", (t.vocab_size, t.width))
    add(pt + "lang_encoder.positional_embedding", (t.context_length, t.width))
    for i in range(t.layers):
        base = pt + f"lang_encoder.resblocks.{i}."
        add(base + "ln_1.weight", (t.width,)); add(base + "ln_1.bias", (t.width,))
        add(base + "attn.in_proj_weight", (3 * t.width, t.width))
        add(base + "attn.in_proj_bias", (3 * t.width,))
        add(base + "attn.out_proj.weight", (t.width, t.width))
        add(base + "attn.out_proj.bias", (t.width,))
        add(base + "ln_2.weight", (t.width,)); add(base + "ln_2.bias", (t.width,))
        add(base + "mlp.c_fc.weight", (4 * t.width, t.width))
        add(base + "mlp.c_fc.bias", (4 * t.width,))
        add(base + "mlp.c_proj.weight", (t.width, 4 * t.width))
        add(base + "mlp.c_proj.bias", (t.width,))
    add(pt + "lang_encoder.ln_final.weight", (t.width,))
    add(pt + "lang_encoder.ln_final.bias", (t.width,))
    add(pt + "lang_proj", (t.width, t.dim_lang))
    add(pt + "logit_scale", ())
    return sd


def test_import_matches_native_structure():
    cfg = tiny_xdecoder_config()
    sd = _synthetic_reference_state(cfg)
    imported = import_xdecoder_checkpoint(sd, cfg)
    native = init_xdecoder_model_params(cfg, jax.random.PRNGKey(0))

    flat_i = {jax.tree_util.keystr(k): np.shape(v)
              for k, v in jax.tree_util.tree_leaves_with_path(imported)}
    flat_n = {jax.tree_util.keystr(k): np.shape(v)
              for k, v in jax.tree_util.tree_leaves_with_path(native)}
    missing = set(flat_n) - set(flat_i)
    extra = set(flat_i) - set(flat_n)
    assert not missing, sorted(missing)[:6]
    assert not extra, sorted(extra)[:6]
    mismatched = [k for k in flat_n if flat_n[k] != flat_i[k]]
    assert not mismatched, [(k, flat_n[k], flat_i[k]) for k in mismatched[:5]]

    # imported weights run through the model
    import jax.numpy as jnp

    from cullavo_tpu.models.xdecoder.model import forward_eval

    imported = jax.tree.map(jnp.asarray, imported)
    images = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3)) * 0.1
    text_embeds = jax.random.normal(jax.random.PRNGKey(2),
                                    (7, cfg.decoder.dim_proj))
    mask_cls, mask_pred, _ = forward_eval(imported, cfg, images, text_embeds)
    assert bool(jnp.isfinite(mask_cls).all())


def test_align_and_update_partial():
    target = {"a": np.zeros((2, 2)), "b": {"c": np.zeros(3), "d": np.zeros(4)}}
    loaded = {"a": np.ones((2, 2)), "b": {"c": np.ones(5), "d": np.ones(4)}}
    msgs = []
    out = align_and_update(target, loaded, log=msgs.append)
    np.testing.assert_array_equal(out["a"], np.ones((2, 2)))
    np.testing.assert_array_equal(out["b"]["c"], np.zeros(3))   # shape mismatch kept
    np.testing.assert_array_equal(out["b"]["d"], np.ones(4))
    assert any("mismatch" in m for m in msgs)


def _davit_state(cfg):
    rng = np.random.default_rng(0)
    sd = {}

    def add(name, shape):
        sd["backbone." + name] = rng.normal(size=shape).astype(np.float32) * 0.02

    in_ch = 3
    for i, depth in enumerate(cfg.depths):
        dim = cfg.embed_dims[i]
        k = cfg.patch_kernel[i]
        add(f"convs.{i}.proj.weight", (dim, in_ch, k, k))
        add(f"convs.{i}.proj.bias", (dim,))
        nd = in_ch if cfg.patch_prenorm[i] else dim
        add(f"convs.{i}.norm.weight", (nd,))
        add(f"convs.{i}.norm.bias", (nd,))
        hidden = int(dim * cfg.mlp_ratio)
        for j in range(depth):
            for kind, attn in (("spatial", "window_attn"), ("channel", "channel_attn")):
                b = f"blocks.{i}.{j}.{kind}_block."
                add(b + "conv1.fn.dw.weight", (dim, 1, 3, 3))
                add(b + "conv1.fn.dw.bias", (dim,))
                add(b + f"{attn}.norm.weight", (dim,))
                add(b + f"{attn}.norm.bias", (dim,))
                add(b + f"{attn}.fn.qkv.weight", (3 * dim, dim))
                add(b + f"{attn}.fn.qkv.bias", (3 * dim,))
                add(b + f"{attn}.fn.proj.weight", (dim, dim))
                add(b + f"{attn}.fn.proj.bias", (dim,))
                add(b + "conv2.fn.dw.weight", (dim, 1, 3, 3))
                add(b + "conv2.fn.dw.bias", (dim,))
                add(b + "ffn.norm.weight", (dim,))
                add(b + "ffn.norm.bias", (dim,))
                add(b + "ffn.fn.net.fc1.weight", (hidden, dim))
                add(b + "ffn.fn.net.fc1.bias", (hidden,))
                add(b + "ffn.fn.net.fc2.weight", (dim, hidden))
                add(b + "ffn.fn.net.fc2.bias", (dim,))
        in_ch = dim
    return sd


def test_import_davit_structure():
    from cullavo_tpu.checkpoint.xdecoder_import import import_davit
    from cullavo_tpu.models.xdecoder.davit import (DaViTConfig, davit_forward,
                                                   init_davit_params)

    cfg = DaViTConfig(embed_dims=(8, 16, 32, 64), num_heads=(2, 2, 4, 4),
                      num_groups=(2, 2, 4, 4), depths=(1, 1, 1, 1), window_size=4)
    imported = import_davit(_davit_state(cfg), cfg)
    native = init_davit_params(cfg, jax.random.PRNGKey(0))
    flat_i = {jax.tree_util.keystr(k): np.shape(v)
              for k, v in jax.tree_util.tree_leaves_with_path(imported)}
    flat_n = {jax.tree_util.keystr(k): np.shape(v)
              for k, v in jax.tree_util.tree_leaves_with_path(native)}
    assert flat_i == flat_n, (set(flat_n) ^ set(flat_i),
                              [k for k in flat_n if flat_n.get(k) != flat_i.get(k)][:5])
    import jax.numpy as jnp
    imported = jax.tree.map(jnp.asarray, imported)
    out = davit_forward(imported, cfg, jnp.ones((1, 32, 32, 3)) * 0.1)
    assert out["res5"].shape == (1, 1, 1, 64)
    assert bool(jnp.isfinite(out["res5"]).all())


def _samvit_state(cfg):
    rng = np.random.default_rng(0)
    sd = {}

    def add(name, shape):
        sd["backbone." + name] = rng.normal(size=shape).astype(np.float32) * 0.02

    D = cfg.embed_dim
    grid = cfg.img_size // cfg.patch_size
    hd = D // cfg.num_heads
    hidden = int(D * cfg.mlp_ratio)
    add("patch_embed.proj.weight", (D, 3, cfg.patch_size, cfg.patch_size))
    add("patch_embed.proj.bias", (D,))
    add("pos_embed", (1, grid, grid, D))
    for i in range(cfg.depth):
        size = grid if i in cfg.global_attn_indexes else cfg.window_size
        b = f"blocks.{i}."
        add(b + "norm1.weight", (D,)); add(b + "norm1.bias", (D,))
        add(b + "attn.qkv.weight", (3 * D, D)); add(b + "attn.qkv.bias", (3 * D,))
        add(b + "attn.proj.weight", (D, D)); add(b + "attn.proj.bias", (D,))
        add(b + "attn.rel_pos_h", (2 * size - 1, hd))
        add(b + "attn.rel_pos_w", (2 * size - 1, hd))
        add(b + "norm2.weight", (D,)); add(b + "norm2.bias", (D,))
        add(b + "mlp.lin1.weight", (hidden, D)); add(b + "mlp.lin1.bias", (hidden,))
        add(b + "mlp.lin2.weight", (D, hidden)); add(b + "mlp.lin2.bias", (D,))
    od = cfg.out_dims
    d4c = max(od[0] * 2, D // 2)
    d8c = max(od[1], D // 2)
    d32c = max(od[3], D * 2)
    add("neck.down_4.0.weight", (D, d4c, 2, 2)); add("neck.down_4.0.bias", (d4c,))
    add("neck.down_4.1.weight", (d4c,)); add("neck.down_4.1.bias", (d4c,))
    add("neck.down_4.3.weight", (d4c, d4c // 2, 2, 2)); add("neck.down_4.3.bias", (d4c // 2,))
    add("neck.down_4.4.weight", (d4c // 2,)); add("neck.down_4.4.bias", (d4c // 2,))
    add("neck.down_4.5.weight", (od[0], d4c // 2, 1, 1)); add("neck.down_4.5.bias", (od[0],))
    add("neck.down_4.6.weight", (od[0],)); add("neck.down_4.6.bias", (od[0],))
    add("neck.down_8.0.weight", (D, d8c, 2, 2)); add("neck.down_8.0.bias", (d8c,))
    add("neck.down_8.1.weight", (d8c,)); add("neck.down_8.1.bias", (d8c,))
    add("neck.down_8.2.weight", (od[1], d8c, 1, 1)); add("neck.down_8.2.bias", (od[1],))
    add("neck.down_8.3.weight", (od[1],)); add("neck.down_8.3.bias", (od[1],))
    add("neck.down_16.0.weight", (od[2], D, 1, 1)); add("neck.down_16.0.bias", (od[2],))
    add("neck.down_16.1.weight", (od[2],)); add("neck.down_16.1.bias", (od[2],))
    add("neck.down_32.0.weight", (d32c, D, 2, 2)); add("neck.down_32.0.bias", (d32c,))
    add("neck.down_32.1.weight", (d32c,)); add("neck.down_32.1.bias", (d32c,))
    add("neck.down_32.2.weight", (od[3], d32c, 1, 1)); add("neck.down_32.2.bias", (od[3],))
    add("neck.down_32.3.weight", (od[3],)); add("neck.down_32.3.bias", (od[3],))
    return sd


def test_import_sam_vit_structure():
    from cullavo_tpu.checkpoint.xdecoder_import import import_sam_vit
    from cullavo_tpu.models.xdecoder.sam_vit import (SamVitConfig,
                                                     init_sam_vit_params,
                                                     sam_vit_forward)

    cfg = SamVitConfig(img_size=64, patch_size=16, embed_dim=32, depth=2,
                       num_heads=2, window_size=2, global_attn_indexes=(1,),
                       out_dims=(8, 16, 32, 64))
    imported = import_sam_vit(_samvit_state(cfg), cfg)
    native = init_sam_vit_params(cfg, jax.random.PRNGKey(0))
    flat_i = {jax.tree_util.keystr(k): np.shape(v)
              for k, v in jax.tree_util.tree_leaves_with_path(imported)}
    flat_n = {jax.tree_util.keystr(k): np.shape(v)
              for k, v in jax.tree_util.tree_leaves_with_path(native)}
    assert flat_i == flat_n, (set(flat_n) ^ set(flat_i),
                              [k for k in flat_n if flat_n.get(k) != flat_i.get(k)][:5])
    import jax.numpy as jnp
    imported = jax.tree.map(jnp.asarray, imported)
    out = sam_vit_forward(imported, cfg, jnp.ones((1, 64, 64, 3)) * 0.1)
    assert bool(jnp.isfinite(out["res5"]).all())


def _deform_state(cfg):
    rng = np.random.default_rng(0)
    sd = {}
    pre = "sem_seg_head.pixel_decoder."

    def add(name, shape):
        sd[pre + name] = rng.normal(size=shape).astype(np.float32) * 0.02

    D = cfg.conv_dim
    # ref input_proj order: 0 = res5 ... 2 = res3
    for i, cin in enumerate(cfg.in_channels[1:][::-1]):
        add(f"input_proj.{i}.0.weight", (D, cin, 1, 1))
        add(f"input_proj.{i}.0.bias", (D,))
        add(f"input_proj.{i}.1.weight", (D,))
        add(f"input_proj.{i}.1.bias", (D,))
    add("transformer.level_embed", (3, D))
    HLP = cfg.num_heads * 3 * cfg.num_points
    for i in range(cfg.num_layers):
        b = f"transformer.encoder.layers.{i}."
        add(b + "self_attn.value_proj.weight", (D, D))
        add(b + "self_attn.value_proj.bias", (D,))
        add(b + "self_attn.sampling_offsets.weight", (HLP * 2, D))
        add(b + "self_attn.sampling_offsets.bias", (HLP * 2,))
        add(b + "self_attn.attention_weights.weight", (HLP, D))
        add(b + "self_attn.attention_weights.bias", (HLP,))
        add(b + "self_attn.output_proj.weight", (D, D))
        add(b + "self_attn.output_proj.bias", (D,))
        add(b + "norm1.weight", (D,)); add(b + "norm1.bias", (D,))
        add(b + "linear1.weight", (cfg.ffn_dim, D)); add(b + "linear1.bias", (cfg.ffn_dim,))
        add(b + "linear2.weight", (D, cfg.ffn_dim)); add(b + "linear2.bias", (D,))
        add(b + "norm2.weight", (D,)); add(b + "norm2.bias", (D,))
    add("adapter_1.weight", (D, cfg.in_channels[0], 1, 1))
    add("adapter_1.bias", (D,))
    add("adapter_1.norm.weight", (D,)); add("adapter_1.norm.bias", (D,))
    add("layer_1.weight", (D, D, 3, 3)); add("layer_1.bias", (D,))
    add("layer_1.norm.weight", (D,)); add("layer_1.norm.bias", (D,))
    add("mask_features.weight", (cfg.mask_dim, D, 1, 1))  # 1x1 conv in the reference
    add("mask_features.bias", (cfg.mask_dim,))
    return sd


def test_import_deform_encoder_structure():
    from cullavo_tpu.checkpoint.xdecoder_import import import_deform_encoder
    from cullavo_tpu.models.xdecoder.deform_encoder import (
        DeformEncoderConfig, deform_encoder_forward, init_deform_encoder_params)

    cfg = DeformEncoderConfig(in_channels=(8, 16, 32, 64), conv_dim=32,
                              mask_dim=16, num_layers=2, num_heads=4,
                              num_points=2, ffn_dim=64, gn_groups=8)
    imported = import_deform_encoder(_deform_state(cfg), cfg)
    native = init_deform_encoder_params(cfg, jax.random.PRNGKey(0))
    flat_i = {jax.tree_util.keystr(k): np.shape(v)
              for k, v in jax.tree_util.tree_leaves_with_path(imported)}
    flat_n = {jax.tree_util.keystr(k): np.shape(v)
              for k, v in jax.tree_util.tree_leaves_with_path(native)}
    assert flat_i == flat_n, (set(flat_n) ^ set(flat_i),
                              [k for k in flat_n if flat_n.get(k) != flat_i.get(k)][:5])
    import jax.numpy as jnp
    imported = jax.tree.map(jnp.asarray, imported)
    feats = {"res2": jnp.ones((1, 16, 16, 8)), "res3": jnp.ones((1, 8, 8, 16)),
             "res4": jnp.ones((1, 4, 4, 32)), "res5": jnp.ones((1, 2, 2, 64))}
    mask_features, _, pyramid = deform_encoder_forward(imported, cfg, feats)
    assert bool(jnp.isfinite(mask_features).all())
