"""Import reference X-Decoder (torch) checkpoints into the JAX pytree.

Maps the reference's module names (GeneralizedXdecoder state_dict:
``backbone.*`` FocalNet, ``sem_seg_head.pixel_decoder.*`` FPN,
``sem_seg_head.predictor.*`` decoder, ``sem_seg_head.predictor.lang_encoder.*``
text tower) onto the stacked-parameter layout used here.  Linear weights are
transposed [out,in]→[in,out]; conv weights go OIHW→HWIO; per-layer tensors are
stacked along the leading axis.

Covers the focal + transformer_encoder_fpn + xdecoder active path
(configs/xdecoder_test.yaml).  ``align_and_update`` reproduces the partial
shape-checked load of utils/model.py:13-55.
"""
from __future__ import annotations

from typing import Mapping

import numpy as np

from cullavo_tpu.models.xdecoder.model import XDecoderModelConfig


def _t(a):  # linear [out, in] → [in, out]
    return np.ascontiguousarray(np.asarray(a).T)


def _conv(a):  # OIHW → HWIO
    return np.ascontiguousarray(np.transpose(np.asarray(a), (2, 3, 1, 0)))


def _dwconv(a):  # torch depthwise [C, 1, k, k] → HWIO [k, k, 1, C]
    return np.ascontiguousarray(np.transpose(np.asarray(a), (2, 3, 1, 0)))


def import_focalnet(sd: Mapping[str, np.ndarray], cfg, prefix="backbone.") -> dict:
    g = lambda k: np.asarray(sd[prefix + k])
    params: dict = {
        "stem": {"kernel": _conv(g("patch_embed.proj.weight")),
                 "bias": g("patch_embed.proj.bias"),
                 "norm": {"scale": g("patch_embed.norm.weight"),
                          "bias": g("patch_embed.norm.bias")}},
        "stages": [], "out_norms": {},
    }
    for i, depth in enumerate(cfg.depths):
        L = cfg.focal_levels[i]

        def st(fmt, conv=False, dw=False):
            rows = []
            for d in range(depth):
                a = g(f"layers.{i}.blocks.{d}." + fmt)
                rows.append(_dwconv(a) if dw else (_conv(a) if conv else a))
            return np.stack(rows)

        blocks = {
            "norm1_s": st("norm1.weight"), "norm1_b": st("norm1.bias"),
            "f_w": np.stack([_t(g(f"layers.{i}.blocks.{d}.modulation.f.weight"))
                             for d in range(depth)]),
            "f_b": st("modulation.f.bias"),
            "h_w": np.stack([np.asarray(
                g(f"layers.{i}.blocks.{d}.modulation.h.weight"))[:, :, 0, 0].T
                for d in range(depth)]),
            "h_b": st("modulation.h.bias"),
            "proj_w": np.stack([_t(g(f"layers.{i}.blocks.{d}.modulation.proj.weight"))
                                for d in range(depth)]),
            "proj_b": st("modulation.proj.bias"),
            "norm2_s": st("norm2.weight"), "norm2_b": st("norm2.bias"),
            "fc1_w": np.stack([_t(g(f"layers.{i}.blocks.{d}.mlp.fc1.weight"))
                               for d in range(depth)]),
            "fc1_b": st("mlp.fc1.bias"),
            "fc2_w": np.stack([_t(g(f"layers.{i}.blocks.{d}.mlp.fc2.weight"))
                               for d in range(depth)]),
            "fc2_b": st("mlp.fc2.bias"),
        }
        if f"{prefix}layers.{i}.blocks.0.dw1.weight" in sd:
            # focal_dw variant (focal_dw.py:147-153): residual depthwise 3x3
            # convs before the modulation and before the MLP
            blocks["dw1_w"] = st("dw1.weight", dw=True)
            blocks["dw1_b"] = st("dw1.bias")
            blocks["dw2_w"] = st("dw2.weight", dw=True)
            blocks["dw2_b"] = st("dw2.bias")
        if f"{prefix}layers.{i}.blocks.0.gamma_1" in sd:
            blocks["gamma1"] = st("gamma_1")
            blocks["gamma2"] = st("gamma_2")
        else:
            C = cfg.num_features[i]
            blocks["gamma1"] = np.ones((depth, C), np.float32)
            blocks["gamma2"] = np.ones((depth, C), np.float32)
        for l in range(L):
            blocks[f"focal{l}_w"] = np.stack([
                _dwconv(g(f"layers.{i}.blocks.{d}.modulation.focal_layers.{l}.0.weight"))
                for d in range(depth)])
        stage = {"blocks": blocks}
        if f"{prefix}layers.{i}.downsample.proj.weight" in sd:
            stage["downsample"] = {
                "kernel": _conv(g(f"layers.{i}.downsample.proj.weight")),
                "bias": g(f"layers.{i}.downsample.proj.bias"),
                "norm": {"scale": g(f"layers.{i}.downsample.norm.weight"),
                         "bias": g(f"layers.{i}.downsample.norm.bias")}}
        params["stages"].append(stage)
    for i in cfg.out_indices:
        params["out_norms"][str(i)] = {"scale": g(f"norm{i}.weight"),
                                       "bias": g(f"norm{i}.bias")}
    return params


def import_fpn(sd: Mapping[str, np.ndarray], cfg,
               prefix="sem_seg_head.pixel_decoder.") -> dict:
    g = lambda k: np.asarray(sd[prefix + k])

    def convgn(base):
        # with NORM: "GN" (the active configs) detectron2's use_bias is
        # False (transformer_encoder_fpn.py:49) — lateral/output convs carry
        # no bias key in a real checkpoint; zero matches exactly
        w = _conv(g(base + ".weight"))
        bias = (g(base + ".bias") if prefix + base + ".bias" in sd
                else np.zeros((w.shape[-1],), np.float32))
        return {"kernel": w, "bias": bias,
                "norm": {"scale": g(base + ".norm.weight"),
                         "bias": g(base + ".norm.bias")}}

    params = {
        "input_proj": {"kernel": _conv(g("input_proj.weight")),
                       "bias": g("input_proj.bias")},
        "encoder_layers": [],
        # reference names: layer_4 = res5 output conv, adapter_3/layer_3 = res4,
        # adapter_2/layer_2 = res3, adapter_1/layer_1 = res2
        "output_convs": [convgn("layer_4"), convgn("layer_3"),
                         convgn("layer_2"), convgn("layer_1")],
        "lateral_convs": [convgn("adapter_3"), convgn("adapter_2"),
                          convgn("adapter_1")],
        "mask_features": {"kernel": _conv(g("mask_features.weight")),
                          "bias": g("mask_features.bias")},
    }
    for i in range(cfg.enc_layers):
        base = f"transformer.encoder.layers.{i}."
        in_w = np.asarray(sd[prefix + base + "self_attn.in_proj_weight"])
        in_b = np.asarray(sd[prefix + base + "self_attn.in_proj_bias"])
        D = in_w.shape[1]
        params["encoder_layers"].append({
            "q_w": _t(in_w[:D]), "q_b": in_b[:D],
            "k_w": _t(in_w[D:2 * D]), "k_b": in_b[D:2 * D],
            "v_w": _t(in_w[2 * D:]), "v_b": in_b[2 * D:],
            "o_w": _t(g(base + "self_attn.out_proj.weight")),
            "o_b": g(base + "self_attn.out_proj.bias"),
            "ln1_s": g(base + "norm1.weight"), "ln1_b": g(base + "norm1.bias"),
            "fc1_w": _t(g(base + "linear1.weight")), "fc1_b": g(base + "linear1.bias"),
            "fc2_w": _t(g(base + "linear2.weight")), "fc2_b": g(base + "linear2.bias"),
            "ln2_s": g(base + "norm2.weight"), "ln2_b": g(base + "norm2.bias"),
        })
    return params


def import_xdecoder_predictor(sd: Mapping[str, np.ndarray], cfg,
                              prefix="sem_seg_head.predictor.") -> dict:
    g = lambda k: np.asarray(sd[prefix + k])

    def attn(base):
        in_w = g(base + ".in_proj_weight")
        in_b = g(base + ".in_proj_bias")
        D = in_w.shape[1]
        return {"q_w": _t(in_w[:D]), "q_b": in_b[:D],
                "k_w": _t(in_w[D:2 * D]), "k_b": in_b[D:2 * D],
                "v_w": _t(in_w[2 * D:]), "v_b": in_b[2 * D:],
                "o_w": _t(g(base + ".out_proj.weight")),
                "o_b": g(base + ".out_proj.bias")}

    layers = []
    for i in range(cfg.dec_layers):
        ca = attn(f"transformer_cross_attention_layers.{i}.multihead_attn")
        ca["ln_s"] = g(f"transformer_cross_attention_layers.{i}.norm.weight")
        ca["ln_b"] = g(f"transformer_cross_attention_layers.{i}.norm.bias")
        sa = attn(f"transformer_self_attention_layers.{i}.self_attn")
        sa["ln_s"] = g(f"transformer_self_attention_layers.{i}.norm.weight")
        sa["ln_b"] = g(f"transformer_self_attention_layers.{i}.norm.bias")
        ffn = {"fc1_w": _t(g(f"transformer_ffn_layers.{i}.linear1.weight")),
               "fc1_b": g(f"transformer_ffn_layers.{i}.linear1.bias"),
               "fc2_w": _t(g(f"transformer_ffn_layers.{i}.linear2.weight")),
               "fc2_b": g(f"transformer_ffn_layers.{i}.linear2.bias"),
               "ln_s": g(f"transformer_ffn_layers.{i}.norm.weight"),
               "ln_b": g(f"transformer_ffn_layers.{i}.norm.bias")}
        layers.append({"cross": ca, "self": sa, "ffn": ffn})

    params = {
        "layers": layers,
        "decoder_norm": {"scale": g("decoder_norm.weight"),
                         "bias": g("decoder_norm.bias")},
        "query_feat": g("query_feat.weight"),
        "query_embed": g("query_embed.weight"),
        "level_embed": g("level_embed.weight"),
        "input_proj": [],
        "class_embed": g("class_embed"),
        "caping_embed": g("caping_embed"),
        "pos_embed_caping": g("pos_embed_caping.weight"),
        "mask_embed": {"w0": _t(g("mask_embed.layers.0.weight")),
                       "b0": g("mask_embed.layers.0.bias"),
                       "w1": _t(g("mask_embed.layers.1.weight")),
                       "b1": g("mask_embed.layers.1.bias"),
                       "w2": _t(g("mask_embed.layers.2.weight")),
                       "b2": g("mask_embed.layers.2.bias")},
        "bbox_embed": {"w0": _t(g("bbox_embed.layers.0.weight")),
                       "b0": g("bbox_embed.layers.0.bias"),
                       "w1": _t(g("bbox_embed.layers.1.weight")),
                       "b1": g("bbox_embed.layers.1.bias"),
                       "w2": _t(g("bbox_embed.layers.2.weight")),
                       "b2": g("bbox_embed.layers.2.bias")},
    }
    for i in range(cfg.num_feature_levels):
        key = f"input_proj.{i}.weight"
        if prefix + key in sd:
            params["input_proj"].append(
                {"w": np.asarray(sd[prefix + key])[:, :, 0, 0].T,
                 "b": g(f"input_proj.{i}.bias")})
        else:  # nn.Sequential() identity when in_channels == hidden_dim
            D = cfg.hidden_dim
            params["input_proj"].append({"w": np.eye(D, dtype=np.float32),
                                         "b": np.zeros((D,), np.float32)})
    return params


def import_text_encoder(sd: Mapping[str, np.ndarray], cfg,
                        prefix="sem_seg_head.predictor.lang_encoder.") -> dict:
    g = lambda k: np.asarray(sd[prefix + k])
    L = cfg.layers
    fields = {
        "ln1_s": "ln_1.weight", "ln1_b": "ln_1.bias",
        "ln2_s": "ln_2.weight", "ln2_b": "ln_2.bias",
    }
    layers = {k: np.stack([g(f"lang_encoder.resblocks.{i}.{v}") for i in range(L)])
              for k, v in fields.items()}
    layers["qkv_w"] = np.stack([
        _t(g(f"lang_encoder.resblocks.{i}.attn.in_proj_weight")) for i in range(L)])
    layers["qkv_b"] = np.stack([
        g(f"lang_encoder.resblocks.{i}.attn.in_proj_bias") for i in range(L)])
    layers["o_w"] = np.stack([
        _t(g(f"lang_encoder.resblocks.{i}.attn.out_proj.weight")) for i in range(L)])
    layers["o_b"] = np.stack([
        g(f"lang_encoder.resblocks.{i}.attn.out_proj.bias") for i in range(L)])
    layers["fc_w"] = np.stack([
        _t(g(f"lang_encoder.resblocks.{i}.mlp.c_fc.weight")) for i in range(L)])
    layers["fc_b"] = np.stack([
        g(f"lang_encoder.resblocks.{i}.mlp.c_fc.bias") for i in range(L)])
    layers["proj_w"] = np.stack([
        _t(g(f"lang_encoder.resblocks.{i}.mlp.c_proj.weight")) for i in range(L)])
    layers["proj_b"] = np.stack([
        g(f"lang_encoder.resblocks.{i}.mlp.c_proj.bias") for i in range(L)])
    return {
        "token_embedding": g("lang_encoder.token_embedding.weight"),
        "positional_embedding": g("lang_encoder.positional_embedding"),
        "layers": layers,
        "ln_final": {"scale": g("lang_encoder.ln_final.weight"),
                     "bias": g("lang_encoder.ln_final.bias")},
        "lang_proj": np.asarray(sd[prefix + "lang_proj"]),
        "logit_scale": np.asarray(sd[prefix + "logit_scale"]),
    }


def import_davit(sd: Mapping[str, np.ndarray], cfg, prefix="backbone.") -> dict:
    """DaViT importer (modeling/vision/backbone/davit.py:330-615 module
    layout: convs.{i}.proj/norm patch embeds; blocks.{i}.{j}.spatial_block /
    channel_block each with conv1/2 (PreNorm→DepthWiseConv2d .fn.dw),
    window_attn|channel_attn (PreNorm .norm + .fn.qkv/.fn.proj), ffn
    (.norm + .fn.net.fc1/fc2))."""
    g = lambda k: np.asarray(sd[prefix + k])
    params: dict = {"stages": [], "patch_embeds": []}
    for i, depth in enumerate(cfg.depths):
        params["patch_embeds"].append({
            "kernel": _conv(g(f"convs.{i}.proj.weight")),
            "bias": g(f"convs.{i}.proj.bias"),
            "norm": {"scale": g(f"convs.{i}.norm.weight"),
                     "bias": g(f"convs.{i}.norm.bias")}})
        blocks = []
        for j in range(depth):
            sub = {}
            for kind, attn in (("spatial", "window_attn"),
                               ("channel", "channel_attn")):
                b = f"blocks.{i}.{j}.{kind}_block."
                sub[kind] = {
                    "conv1": _dwconv(g(b + "conv1.fn.dw.weight")),
                    "conv1_b": g(b + "conv1.fn.dw.bias"),
                    "ln_attn_s": g(b + f"{attn}.norm.weight"),
                    "ln_attn_b": g(b + f"{attn}.norm.bias"),
                    "qkv_w": _t(g(b + f"{attn}.fn.qkv.weight")),
                    "qkv_b": g(b + f"{attn}.fn.qkv.bias"),
                    "proj_w": _t(g(b + f"{attn}.fn.proj.weight")),
                    "proj_b": g(b + f"{attn}.fn.proj.bias"),
                    "conv2": _dwconv(g(b + "conv2.fn.dw.weight")),
                    "conv2_b": g(b + "conv2.fn.dw.bias"),
                    "ln_ffn_s": g(b + "ffn.norm.weight"),
                    "ln_ffn_b": g(b + "ffn.norm.bias"),
                    "fc1_w": _t(g(b + "ffn.fn.net.fc1.weight")),
                    "fc1_b": g(b + "ffn.fn.net.fc1.bias"),
                    "fc2_w": _t(g(b + "ffn.fn.net.fc2.weight")),
                    "fc2_b": g(b + "ffn.fn.net.fc2.bias"),
                }
            blocks.append(sub)
        params["stages"].append(blocks)
    return params


def import_sam_vit(sd: Mapping[str, np.ndarray], cfg, prefix="backbone.") -> dict:
    """SAM-ViT (ViTDet) importer (modeling/vision/backbone/vit.py:55-123 +
    D2ViT SimpleFPN neck :406-458)."""
    g = lambda k: np.asarray(sd[prefix + k])
    grid = cfg.img_size // cfg.patch_size
    pos = g("pos_embed")
    params: dict = {
        "patch_embed": {"kernel": _conv(g("patch_embed.proj.weight")),
                        "bias": g("patch_embed.proj.bias")},
        "pos_embed": pos.reshape(grid, grid, -1) if pos.ndim == 4 else pos,
        "blocks": [],
    }
    for i in range(cfg.depth):
        b = f"blocks.{i}."
        params["blocks"].append({
            "ln1_s": g(b + "norm1.weight"), "ln1_b": g(b + "norm1.bias"),
            "qkv_w": _t(g(b + "attn.qkv.weight")),
            "qkv_b": g(b + "attn.qkv.bias"),
            "proj_w": _t(g(b + "attn.proj.weight")),
            "proj_b": g(b + "attn.proj.bias"),
            "rel_h": g(b + "attn.rel_pos_h"),
            "rel_w": g(b + "attn.rel_pos_w"),
            "ln2_s": g(b + "norm2.weight"), "ln2_b": g(b + "norm2.bias"),
            "fc1_w": _t(g(b + "mlp.lin1.weight")), "fc1_b": g(b + "mlp.lin1.bias"),
            "fc2_w": _t(g(b + "mlp.lin2.weight")), "fc2_b": g(b + "mlp.lin2.bias"),
        })

    def convT(base):  # torch ConvTranspose2d [in, out, kH, kW] → HWOI
        # spatial FLIP required: sam_vit._convT uses jax.lax.conv_transpose
        # with transpose_kernel=False, which correlates without flipping —
        # torch's ConvTranspose2d output out[2i+a] uses w[a], the unflipped
        # jax form uses w[k-1-a] (verified numerically: err 3.06 unflipped,
        # 0.0 flipped for the 2x2 stride-2 neck upsamples)
        w = g(base + ".weight")
        return {"kernel": w.transpose(2, 3, 1, 0)[::-1, ::-1],
                "bias": g(base + ".bias")}

    def conv(base):
        return {"kernel": _conv(g(base + ".weight")), "bias": g(base + ".bias")}

    def gn(base):
        return {"scale": g(base + ".weight"), "bias": g(base + ".bias")}

    params["neck"] = {
        "down4": {"up1": convT("neck.down_4.0"), "gn1": gn("neck.down_4.1"),
                  "up2": convT("neck.down_4.3"), "gn2": gn("neck.down_4.4"),
                  "conv": conv("neck.down_4.5"), "gn3": gn("neck.down_4.6")},
        "down8": {"up1": convT("neck.down_8.0"), "gn1": gn("neck.down_8.1"),
                  "conv": conv("neck.down_8.2"), "gn2": gn("neck.down_8.3")},
        "down16": {"conv": conv("neck.down_16.0"), "gn": gn("neck.down_16.1")},
        "down32": {"conv1": conv("neck.down_32.0"), "gn1": gn("neck.down_32.1"),
                   "conv2": conv("neck.down_32.2"), "gn2": gn("neck.down_32.3")},
    }
    return params


def import_deform_encoder(sd: Mapping[str, np.ndarray], cfg,
                          prefix="sem_seg_head.pixel_decoder.") -> dict:
    """Deformable pixel decoder importer
    (modeling/vision/encoder/transformer_encoder_deform.py:200-292:
    input_proj Sequential(conv, GN) ordered res5→res3; transformer encoder
    layers with MSDeformAttn sampling_offsets/attention_weights/value_proj/
    output_proj; adapter_1/layer_1 FPN fusion for res2)."""
    g = lambda k: np.asarray(sd[prefix + k])

    def proj(i):          # ref input_proj.{i}: 0=res5 … — repo stores res3→res5
        return {"kernel": _conv(g(f"input_proj.{i}.0.weight")),
                "bias": g(f"input_proj.{i}.0.bias"),
                "norm": {"scale": g(f"input_proj.{i}.1.weight"),
                         "bias": g(f"input_proj.{i}.1.bias")}}

    def convgn(base):
        # with NORM: "GN" detectron2's use_bias is False — the FPN-fusion
        # convs carry no bias key in a real checkpoint; zero matches exactly
        w = _conv(g(base + ".weight"))
        bias = (g(base + ".bias") if prefix + base + ".bias" in sd
                else np.zeros((w.shape[-1],), np.float32))
        return {"kernel": w, "bias": bias,
                "norm": {"scale": g(base + ".norm.weight"),
                         "bias": g(base + ".norm.bias")}}

    params: dict = {
        "input_proj": [proj(2), proj(1), proj(0)],   # repo order res3, res4, res5
        "level_embed": g("transformer.level_embed"),
        "layers": [],
        "lateral": convgn("adapter_1"),
        "output": convgn("layer_1"),
        "mask_features": {"kernel": _conv(g("mask_features.weight")),
                          "bias": g("mask_features.bias")},
    }
    for i in range(cfg.num_layers):
        b = f"transformer.encoder.layers.{i}."
        params["layers"].append({
            "attn": {
                "value_proj": {"w": _t(g(b + "self_attn.value_proj.weight")),
                               "b": g(b + "self_attn.value_proj.bias")},
                "offset": {"w": _t(g(b + "self_attn.sampling_offsets.weight")),
                           "b": g(b + "self_attn.sampling_offsets.bias")},
                "weight": {"w": _t(g(b + "self_attn.attention_weights.weight")),
                           "b": g(b + "self_attn.attention_weights.bias")},
                "output": {"w": _t(g(b + "self_attn.output_proj.weight")),
                           "b": g(b + "self_attn.output_proj.bias")},
            },
            "ln1_s": g(b + "norm1.weight"), "ln1_b": g(b + "norm1.bias"),
            "fc1_w": _t(g(b + "linear1.weight")), "fc1_b": g(b + "linear1.bias"),
            "fc2_w": _t(g(b + "linear2.weight")), "fc2_b": g(b + "linear2.bias"),
            "ln2_s": g(b + "norm2.weight"), "ln2_b": g(b + "norm2.bias"),
        })
    return params


def import_backbone(state: Mapping[str, np.ndarray], cfg: XDecoderModelConfig,
                    prefix="backbone.") -> dict:
    name = getattr(cfg, "backbone_name", "focal")
    if name in ("focal", "focal_dw"):
        return import_focalnet(state, cfg.backbone, prefix)
    if name == "davit":
        return import_davit(state, cfg.backbone, prefix)
    if name == "vit":
        return import_sam_vit(state, cfg.backbone, prefix)
    raise KeyError(name)


def import_pixel_decoder(state: Mapping[str, np.ndarray],
                         cfg: XDecoderModelConfig,
                         prefix="sem_seg_head.pixel_decoder.") -> dict:
    if getattr(cfg, "encoder_name",
               "transformer_encoder_fpn") == "transformer_encoder_deform":
        return import_deform_encoder(state, cfg.fpn, prefix)
    return import_fpn(state, cfg.fpn, prefix)


def import_xdecoder_checkpoint(state: Mapping[str, np.ndarray],
                               cfg: XDecoderModelConfig) -> dict:
    """Full model import from a reference-layout state dict of numpy arrays,
    dispatching on cfg.backbone_name / cfg.encoder_name."""
    out = {
        "backbone": import_backbone(state, cfg),
        "fpn": import_pixel_decoder(state, cfg),
        "decoder": import_xdecoder_predictor(state, cfg.decoder),
        "text": import_text_encoder(state, cfg.text),
    }
    # retrieval-ensemble projection (xdecoder_model.py:121); zeros when the
    # checkpoint was trained without the retrieval ensemble
    if "backbone_proj" in state:
        out["backbone_proj"] = np.asarray(state["backbone_proj"])
    else:
        from cullavo_tpu.models.xdecoder.model import _backbone_last_channels

        out["backbone_proj"] = np.zeros(
            (_backbone_last_channels(cfg), cfg.text.dim_lang), np.float32)
    return out


def align_and_update(target: dict, loaded: dict, log=print) -> dict:
    """Shape-checked partial update (utils/model.py:31-55 semantics): leaves
    present in both trees with matching shapes are replaced; mismatches keep
    the target value and are reported."""
    import jax

    flat_t = {jax.tree_util.keystr(k): (k, v)
              for k, v in jax.tree_util.tree_leaves_with_path(target)}
    flat_l = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(loaded)}
    out = dict(flat_t)
    for key, val in flat_l.items():
        if key in flat_t:
            _, tv = flat_t[key]
            if tuple(np.shape(tv)) == tuple(np.shape(val)):
                out[key] = (flat_t[key][0], val)
            else:
                log(f"[align] shape mismatch {key}: {np.shape(tv)} vs {np.shape(val)}")
    # rebuild by unflattening in the target's canonical leaf order
    treedef = jax.tree_util.tree_structure(target)
    canonical = [jax.tree_util.keystr(k)
                 for k, _ in jax.tree_util.tree_leaves_with_path(target)]
    return jax.tree_util.tree_unflatten(treedef, [out[k][1] for k in canonical])
