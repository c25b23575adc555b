"""Pipeline protocol — the duck-typed workload interface.

Capability parity with the reference pipeline contract
(trainer/default_trainer.py:39-42 dynamic import + SURVEY.md §1):
``initialize_model()``, ``get_dataloaders(split)``, ``forward_step(batch)``,
``evaluate_model()``.  Pipelines are plain classes registered by name; the
entry layer looks them up from config ``PIPELINE``.
"""
from __future__ import annotations

from typing import Callable, Dict, Protocol

_PIPELINES: Dict[str, Callable] = {}


def register_pipeline(name: str):
    def deco(cls):
        _PIPELINES[name] = cls
        return cls
    return deco


def build_pipeline(name: str, cfg, **kw):
    if name not in _PIPELINES:
        raise KeyError(f"pipeline {name!r} not registered; have {sorted(_PIPELINES)}")
    return _PIPELINES[name](cfg, **kw)


def list_pipelines():
    return sorted(_PIPELINES)


class Pipeline(Protocol):
    def initialize_model(self): ...
    def get_dataloaders(self, split: str): ...
    def forward_step(self, state, batch): ...
    def evaluate_model(self): ...
