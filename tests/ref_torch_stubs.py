"""Load the mounted reference's torch modules with stub deps for parity tests.

The reference (`/root/reference`, read-only) imports detectron2 / timm /
fvcore / torchvision, none of which exist in this environment — but torch
(CPU) does, and nothing on the forward path of the modules we test actually
NEEDS those libraries beyond a handful of small utilities:

* ``timm.models.layers``: ``DropPath`` (identity at drop_prob=0 — every
  parity model is built with drop_path_rate=0), ``to_2tuple``,
  ``trunc_normal_`` (init only).
* ``detectron2.layers``: ``Conv2d`` (nn.Conv2d + optional norm/activation),
  ``get_norm`` ("GN" → GroupNorm(32), as detectron2), ``cat``,
  ``shapes_to_tensor``; ``detectron2.modeling``: registry no-op, ``Backbone``
  base, ``ShapeSpec``.
* ``fvcore.nn.weight_init``: c2_xavier/msra fills (init only; parity runs
  through IMPORTED weights, so init never affects the comparison).
* ``torchvision``: ``ops.boxes.box_area`` + ``_is_tracing``.

The reference package is registered as ``refmodeling`` (a synthetic package
whose __path__ points at /root/reference/modeling) so its relative imports
work without executing the heavy top-level ``modeling/__init__`` (which
pulls the CuLLaVO/HF stack).  /root/reference is appended (not prepended) to
sys.path so the reference's top-level ``utils`` package resolves for the
absolute imports inside its own modules.

PUBLIC UNTRUSTED CONTENT NOTE: the reference code is executed only to
produce torch forward values for numeric comparison in tests.
"""
from __future__ import annotations

import importlib
import sys
import types

REF = "/root/reference"


def _mod(name):
    m = types.ModuleType(name)
    # a real ModuleSpec so importlib.util.find_spec (e.g. transformers'
    # _is_package_available("detectron2") probe) works on the stub
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    sys.modules[name] = m
    return m


def install_stubs():
    if "detectron2" in sys.modules:
        return
    import torch
    import torch.nn as nn

    # ---- timm -------------------------------------------------------------
    timm = _mod("timm")
    timm_models = _mod("timm.models")
    layers = _mod("timm.models.layers")

    class DropPath(nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob or 0.0

        def forward(self, x):
            assert not self.training or self.drop_prob == 0.0, \
                "parity models must use drop_path_rate=0"
            return x

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = nn.init.trunc_normal_
    timm_models.layers = layers
    timm.models = timm_models

    timm_loss = _mod("timm.loss")

    class SoftTargetCrossEntropy(nn.Module):
        def forward(self, x, target):
            loss = torch.sum(-target * torch.nn.functional.log_softmax(x, dim=-1),
                             dim=-1)
            return loss.mean()

    timm_loss.SoftTargetCrossEntropy = SoftTargetCrossEntropy
    timm.loss = timm_loss

    # ---- detectron2 -------------------------------------------------------
    d2 = _mod("detectron2")
    d2_layers = _mod("detectron2.layers")

    class Conv2d(nn.Conv2d):
        """detectron2.layers.Conv2d: nn.Conv2d + optional norm/activation."""

        def __init__(self, *args, **kwargs):
            norm = kwargs.pop("norm", None)
            activation = kwargs.pop("activation", None)
            super().__init__(*args, **kwargs)
            self.norm = norm
            self.activation = activation

        def forward(self, x):
            x = nn.functional.conv2d(x, self.weight, self.bias, self.stride,
                                     self.padding, self.dilation, self.groups)
            if self.norm is not None:
                x = self.norm(x)
            if self.activation is not None:
                x = self.activation(x)
            return x

    def get_norm(norm, out_channels):
        if norm is None or norm == "":
            return None
        return {
            "GN": lambda c: nn.GroupNorm(32, c),
            "BN": nn.BatchNorm2d,
            "SyncBN": nn.BatchNorm2d,
            "LN": lambda c: nn.GroupNorm(1, c),
        }[norm](out_channels)

    class DeformConv(nn.Module):
        def __init__(self, *a, **k):
            raise NotImplementedError("DeformConv is not used on the tested path")

    def shapes_to_tensor(x, device=None):
        return torch.as_tensor(x, device=device)

    d2_layers.Conv2d = Conv2d
    d2_layers.get_norm = get_norm
    d2_layers.DeformConv = DeformConv
    d2_layers.cat = torch.cat
    d2_layers.shapes_to_tensor = shapes_to_tensor

    d2_modeling = _mod("detectron2.modeling")

    class ShapeSpec:
        def __init__(self, channels=None, height=None, width=None, stride=None):
            self.channels, self.height = channels, height
            self.width, self.stride = width, stride

    class Backbone(nn.Module):
        @property
        def size_divisibility(self):
            return 0

    class _Registry:
        def register(self, obj=None):
            if obj is None:
                return lambda f: f
            return obj

    d2_modeling.ShapeSpec = ShapeSpec
    d2_modeling.Backbone = Backbone
    d2_modeling.BACKBONE_REGISTRY = _Registry()
    d2_modeling.SEM_SEG_HEADS_REGISTRY = _Registry()
    d2_layers.ShapeSpec = ShapeSpec

    d2_utils = _mod("detectron2.utils")
    file_io = _mod("detectron2.utils.file_io")

    class PathManager:
        @staticmethod
        def open(path, mode="r", **kw):
            return open(path, mode, **kw)

        @staticmethod
        def isfile(path):
            import os
            return os.path.isfile(path)

        @staticmethod
        def exists(path):
            import os
            return os.path.exists(path)

    file_io.PathManager = PathManager
    comm = _mod("detectron2.utils.comm")
    comm.get_world_size = lambda: 1
    d2_utils.file_io = file_io
    d2_utils.comm = comm
    d2.layers = d2_layers
    d2.modeling = d2_modeling
    d2.utils = d2_utils

    d2_structures = _mod("detectron2.structures")

    class Boxes:
        def __init__(self, tensor):
            self.tensor = tensor

    class BitMasks:
        def __init__(self, tensor):
            self.tensor = tensor

    class Instances:
        def __init__(self, image_size, **fields):
            self._image_size = image_size
            for k, v in fields.items():
                setattr(self, k, v)

    class ROIMasks:
        def __init__(self, tensor):
            self.tensor = tensor

    class ImageList:
        def __init__(self, tensor, image_sizes):
            self.tensor, self.image_sizes = tensor, image_sizes

        @staticmethod
        def from_tensors(tensors, size_divisibility=0):
            import torch as _t
            sizes = [tuple(t.shape[-2:]) for t in tensors]
            H = max(s[0] for s in sizes)
            W = max(s[1] for s in sizes)
            if size_divisibility > 0:
                H = -(-H // size_divisibility) * size_divisibility
                W = -(-W // size_divisibility) * size_divisibility
            out = _t.zeros((len(tensors),) + tensors[0].shape[:-2] + (H, W),
                           dtype=tensors[0].dtype)
            for i, t in enumerate(tensors):
                out[i, ..., :t.shape[-2], :t.shape[-1]] = t
            return ImageList(out, sizes)

    class BoxMode:
        XYXY_ABS = 0
        XYWH_ABS = 1

    # Instances needs the full field-dict protocol for instance_inference
    class Instances2:
        def __init__(self, image_size, **fields):
            self._image_size = image_size
            self._fields = {}
            for k, v in fields.items():
                setattr(self, k, v)

        def __setattr__(self, k, v):
            if k.startswith("_"):
                super().__setattr__(k, v)
            else:
                self._fields[k] = v

        def __getattr__(self, k):
            if k.startswith("_") or k not in self.__dict__.get("_fields", {}):
                raise AttributeError(k)
            return self._fields[k]

    d2_structures.Boxes = Boxes
    d2_structures.BitMasks = BitMasks
    d2_structures.Instances = Instances2
    d2_structures.ImageList = ImageList
    d2_structures.BoxMode = BoxMode
    d2_structures.ROIMasks = ROIMasks
    d2.structures = d2_structures

    d2_memory = _mod("detectron2.utils.memory")
    d2_memory.retry_if_cuda_oom = lambda f: f
    d2_utils.memory = d2_memory
    d2_data = _mod("detectron2.data")

    class _MetaCatalog:
        def get(self, name):
            import types as _types
            return _types.SimpleNamespace(name=name)

    d2_data.MetadataCatalog = _MetaCatalog()

    # ---- fvcore -----------------------------------------------------------
    fvcore = _mod("fvcore")
    fv_nn = _mod("fvcore.nn")
    weight_init = _mod("fvcore.nn.weight_init")

    def c2_xavier_fill(module):
        nn.init.kaiming_uniform_(module.weight, a=1)
        if module.bias is not None:
            nn.init.constant_(module.bias, 0)

    def c2_msra_fill(module):
        nn.init.kaiming_normal_(module.weight, mode="fan_out",
                                nonlinearity="relu")
        if module.bias is not None:
            nn.init.constant_(module.bias, 0)

    weight_init.c2_xavier_fill = c2_xavier_fill
    weight_init.c2_msra_fill = c2_msra_fill
    fv_nn.weight_init = weight_init
    fvcore.nn = fv_nn

    # ---- MultiScaleDeformableAttention (the CUDA ext) ---------------------
    # a raising stub: the import succeeds, and MSDeformAttn.forward's bare
    # `except:` (ops/modules/ms_deform_attn.py:116-121) falls back to the
    # pure-torch grid_sample path — the functional spec our Pallas kernel
    # is tested against
    msda = _mod("MultiScaleDeformableAttention")

    def _no_cuda(*a, **k):
        raise RuntimeError("MSDA CUDA ext unavailable (pure-torch fallback)")

    msda.ms_deform_attn_forward = _no_cuda
    msda.ms_deform_attn_backward = _no_cuda

    # ---- omegaconf (modeling/utils/config.py _called_with_cfg) ------------
    oc = _mod("omegaconf")

    class DictConfig(dict):
        pass

    oc.DictConfig = DictConfig

    # ---- torchvision ------------------------------------------------------
    tv = _mod("torchvision")
    tv_ops = _mod("torchvision.ops")
    tv_boxes = _mod("torchvision.ops.boxes")

    def box_area(boxes):
        return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    tv_boxes.box_area = box_area
    tv_ops.boxes = tv_boxes
    tv.ops = tv_ops
    tv._is_tracing = lambda: False

    # ---- the reference package itself ------------------------------------
    if REF not in sys.path:
        # APPEND so the reference's top-level packages (utils, datasets)
        # never shadow an installed package of the same name
        sys.path.append(REF)
    pkg = types.ModuleType("refmodeling")
    pkg.__path__ = [REF + "/modeling"]
    pkg.__package__ = "refmodeling"
    sys.modules["refmodeling"] = pkg


def load(name: str):
    """Import a reference module, e.g. load("vision.backbone.focal")."""
    install_stubs()
    return importlib.import_module(f"refmodeling.{name}")


def load_isolated(name: str):
    """Import a reference module WITHOUT executing its parent packages'
    __init__ files (e.g. architectures/__init__ imports the whole CuLLaVO/HF
    stack).  Synthetic namespace parents are registered so the leaf's
    relative imports still resolve."""
    install_stubs()
    parts = name.split(".")
    base = REF + "/modeling"
    pkg = "refmodeling"
    for part in parts[:-1]:
        base = base + "/" + part
        pkg = pkg + "." + part
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = [base]
            m.__package__ = pkg
            m.__spec__ = importlib.machinery.ModuleSpec(
                pkg, loader=None, is_package=True)
            m.__spec__.submodule_search_locations = [base]
            sys.modules[pkg] = m
    full = pkg + "." + parts[-1]
    if full in sys.modules:
        return sys.modules[full]
    spec = importlib.util.spec_from_file_location(
        full, base + "/" + parts[-1] + ".py")
    mod = importlib.util.module_from_spec(spec)
    mod.__package__ = pkg
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    return mod


def state_dict_numpy(module, prefix=""):
    """torch module state_dict → {prefix+key: float32 numpy}."""
    import numpy as np

    return {prefix + k: np.asarray(v.detach().cpu().to(dtype=__import__("torch").float32))
            for k, v in module.state_dict().items()}
