"""Dataset class-name constants and CLIP prompt templates.

The label sets (COCO panoptic/semantic, ADE20K 150/847, ImageNet-1k,
Cityscapes, BDD, ScanNet, SUN-RGBD, Pascal VOC) are public dataset metadata;
stored as JSON in ``assets/class_names.json`` and exposed lazily here.
Capability parity with the reference's ``utils/constants.py`` and
``utils/prompt_engineering.py``.
"""
from __future__ import annotations

import functools
import json
import os
import random

_ASSET = os.path.join(os.path.dirname(__file__), "assets", "class_names.json")

_NAMES = (
    "ADE20K_847", "ADE_PANOPTIC_CLASSES", "BDD_PANO", "BDD_SEM", "CITYSCAPES",
    "CITYSCAPES_THING", "COCO_PANOPTIC_CLASSES", "COCO_SEMANTIC_CLASSES",
    "IMAGENET_CLASSES", "IMAGENET_DEFAULT_TEMPLATES", "IMAGENET_FOLDER_NAMES",
    "IMAGENET_SIMPLE_TEMPLATES", "PASCAL_CLASSES", "SCAN_20", "SCAN_37",
    "SCAN_40", "SUN_RGBD_37", "CLIP_PROMPT_TEMPLATES",
)

__all__ = list(_NAMES) + ["get_prompt_templates", "prompt_engineering", "class_names_for"]


@functools.lru_cache(maxsize=1)
def _load() -> dict:
    with open(_ASSET) as f:
        return json.load(f)


def __getattr__(name: str):
    if name in _NAMES:
        return _load()[name]
    raise AttributeError(name)


def get_prompt_templates() -> list[str]:
    """The ~81 CLIP prompt-ensembling templates (OpenAI CLIP's public set)."""
    return list(_load()["CLIP_PROMPT_TEMPLATES"])


def prompt_engineering(classname, topk: int = 1, suffix: str = ".", rng=None) -> str:
    """Sample one of the first ``topk`` templates and fill in the class name.

    Same behavior as the reference sampler (utils/prompt_engineering.py:90-98).
    ``rng`` may be the ``random`` module, a ``random.Random``, or a numpy
    ``Generator``.
    """
    templates = get_prompt_templates()
    n = min(len(templates), topk)
    if rng is None:
        rng = random
    if hasattr(rng, "integers"):          # numpy Generator
        idx = int(rng.integers(n))
        pick = lambda seq: seq[int(rng.integers(len(seq)))]
    else:
        idx = rng.randrange(n)
        pick = rng.choice
    if isinstance(classname, (list, tuple)):
        classname = pick(classname)
    return templates[idx].replace(".", suffix).format(classname.replace(",", "").replace("+", " "))


_DATASET_CLASS_KEYS = {
    "coco": "COCO_PANOPTIC_CLASSES",
    "coco_panoptic": "COCO_PANOPTIC_CLASSES",
    "ade": "ADE_PANOPTIC_CLASSES",
    "ade20k_full": "ADE20K_847",
    "imagenet": "IMAGENET_CLASSES",
    "cityscapes": "CITYSCAPES",
    "bdd_sem": "BDD_SEM",
    "bdd_pano": "BDD_PANO",
    "scannet_20": "SCAN_20",
    "scannet_37": "SCAN_37",
    "scannet_40": "SCAN_40",
    "sunrgbd": "SUN_RGBD_37",
    "pascal": "PASCAL_CLASSES",
}


def class_names_for(dataset_name: str) -> list[str]:
    """Map a dataset name to its class-name list.

    Equivalent of the reference's ``get_class_names`` dispatch
    (modeling/utils/misc.py:179-219); matching by substring like the
    reference does, with a trailing "background" slot appended by callers
    that need it.
    """
    key = dataset_name.lower()
    for fragment, const in _DATASET_CLASS_KEYS.items():
        if fragment in key:
            return list(_load()[const])
    raise KeyError(f"no class-name list registered for dataset {dataset_name!r}")
