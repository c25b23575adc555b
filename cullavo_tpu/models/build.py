"""Model registry: config names → builders.

Capability parity with the reference's registry-by-module-name pattern
(modeling/architectures/build.py + the per-component registries listed in
SURVEY.md §1): ``MODEL.NAME: cullavo_model | xdecoder_model``,
``MODEL.BACKBONE.NAME: focal | focal_dw | davit | vit``,
``MODEL.ENCODER.NAME: transformer_encoder_fpn | transformer_encoder_deform``.
Here registration is explicit (no filename magic), but config names match the
reference so configs carry over.
"""
from __future__ import annotations

from typing import Callable, Dict

_MODELS: Dict[str, Callable] = {}
_BACKBONES: Dict[str, Callable] = {}
_ENCODERS: Dict[str, Callable] = {}


def register_model(name):
    def deco(fn):
        _MODELS[name] = fn
        return fn
    return deco


def register_backbone(name):
    def deco(fn):
        _BACKBONES[name] = fn
        return fn
    return deco


def register_encoder(name):
    def deco(fn):
        _ENCODERS[name] = fn
        return fn
    return deco


def build_model(name: str, *a, **kw):
    if name not in _MODELS:
        raise KeyError(f"model {name!r}; have {sorted(_MODELS)}")
    return _MODELS[name](*a, **kw)


def build_backbone(name: str, *a, **kw):
    if name not in _BACKBONES:
        raise KeyError(f"backbone {name!r}; have {sorted(_BACKBONES)}")
    return _BACKBONES[name](*a, **kw)


def build_encoder(name: str, *a, **kw):
    if name not in _ENCODERS:
        raise KeyError(f"encoder {name!r}; have {sorted(_ENCODERS)}")
    return _ENCODERS[name](*a, **kw)


def _register_defaults():
    from cullavo_tpu.models.llava.config import LlavaConfig
    from cullavo_tpu.models.llava.modeling import init_llava_params
    from cullavo_tpu.models.xdecoder.davit import (DaViTConfig, davit_forward,
                                                   init_davit_params)
    from cullavo_tpu.models.xdecoder.deform_encoder import (
        DeformEncoderConfig, deform_encoder_forward, init_deform_encoder_params)
    from cullavo_tpu.models.xdecoder.focalnet import (FocalNetConfig,
                                                      focalnet_forward,
                                                      init_focalnet_params)
    from cullavo_tpu.models.xdecoder.fpn import (FPNConfig, fpn_forward,
                                                 init_fpn_params)
    from cullavo_tpu.models.xdecoder.model import (XDecoderModelConfig,
                                                   init_xdecoder_model_params)
    from cullavo_tpu.models.xdecoder.sam_vit import (SamVitConfig,
                                                     init_sam_vit_params,
                                                     sam_vit_forward)

    @register_model("cullavo_model")
    def _cullavo(cfg=None, key=None, dtype=None):
        import jax
        import jax.numpy as jnp

        cfg = cfg or LlavaConfig()
        return cfg, init_llava_params(cfg, key or jax.random.PRNGKey(0),
                                      dtype or jnp.float32)

    @register_model("xdecoder_model")
    def _xdecoder(cfg=None, key=None, dtype=None):
        import jax
        import jax.numpy as jnp

        cfg = cfg or XDecoderModelConfig()
        return cfg, init_xdecoder_model_params(cfg, key or jax.random.PRNGKey(0),
                                               dtype or jnp.float32)

    @register_backbone("focal")
    def _focal(cfg=None, key=None, **kw):
        import jax

        cfg = cfg or FocalNetConfig()
        return cfg, init_focalnet_params(cfg, key or jax.random.PRNGKey(0)), focalnet_forward

    @register_backbone("focal_dw")
    def _focal_dw(cfg=None, key=None, **kw):
        import jax

        cfg = cfg or FocalNetConfig(use_dw=True)
        return cfg, init_focalnet_params(cfg, key or jax.random.PRNGKey(0)), focalnet_forward

    @register_backbone("davit")
    def _davit(cfg=None, key=None, **kw):
        import jax

        cfg = cfg or DaViTConfig()
        return cfg, init_davit_params(cfg, key or jax.random.PRNGKey(0)), davit_forward

    @register_backbone("vit")
    def _vit(cfg=None, key=None, **kw):
        import jax

        cfg = cfg or SamVitConfig()
        return cfg, init_sam_vit_params(cfg, key or jax.random.PRNGKey(0)), sam_vit_forward

    @register_encoder("transformer_encoder_fpn")
    def _fpn(cfg=None, key=None, **kw):
        import jax

        cfg = cfg or FPNConfig()
        return cfg, init_fpn_params(cfg, key or jax.random.PRNGKey(0)), fpn_forward

    @register_encoder("transformer_encoder_deform")
    def _deform(cfg=None, key=None, **kw):
        import jax

        cfg = cfg or DeformEncoderConfig()
        return (cfg, init_deform_encoder_params(cfg, key or jax.random.PRNGKey(0)),
                deform_encoder_forward)


_register_defaults()
