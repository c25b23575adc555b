"""Configuration system.

Capability parity with the reference's YAML config loader
(``/root/reference/utils/arguments.py:9-90``): multi-file YAML merge with
later-file precedence, dotted-key nesting (``MODEL.BACKBONE.NAME`` creates
nested dicts), JSON ``--config_overrides``, and ``--overrides K V`` pairs whose
values are coerced to the type of the existing config entry (with the
"false"/"False" string → bool special case).

Unlike the reference — which mutates the ``opt`` dict at runtime from
pipelines (``hook_opt``/``hook_switcher``) — the config here is *frozen after
load*.  Per-dataset evaluation toggles are explicit arguments to the eval
entry points instead (see ``cullavo_tpu/pipelines``).
"""
from __future__ import annotations

import argparse
import copy
import json
from typing import Any, Iterable, Mapping

import yaml

__all__ = [
    "Config",
    "load_config",
    "merge_dotted",
    "apply_overrides",
    "load_opt_command",
]


def _coerce(new_value: str, old_value: Any) -> Any:
    """Coerce a CLI string to the type of the existing config value.

    Mirrors the reference's override coercion (utils/arguments.py:68-83):
    the *existing* value's type wins, and the strings "false"/"False" map to
    boolean False even though ``bool("False")`` is True in Python.
    """
    if isinstance(old_value, bool):
        if new_value in ("false", "False", "0"):
            return False
        if new_value in ("true", "True", "1"):
            return True
        return bool(new_value)
    if isinstance(old_value, int) and not isinstance(old_value, bool):
        return int(new_value)
    if isinstance(old_value, float):
        return float(new_value)
    if isinstance(old_value, (list, dict)):
        return json.loads(new_value)
    if old_value is None:
        # No type info: try JSON, fall back to raw string.
        try:
            return json.loads(new_value)
        except (json.JSONDecodeError, ValueError):
            return new_value
    return type(old_value)(new_value)


def merge_dotted(base: dict, updates: Mapping[str, Any]) -> dict:
    """Merge ``updates`` into ``base`` where keys may be dotted paths.

    ``{"MODEL.BACKBONE.NAME": "focal"}`` creates/updates
    ``base["MODEL"]["BACKBONE"]["NAME"]``.  Plain nested dicts in ``updates``
    are merged recursively; scalars/lists replace.
    """
    for key, value in updates.items():
        parts = key.split(".")
        node = base
        for part in parts[:-1]:
            nxt = node.get(part)
            if not isinstance(nxt, dict):
                nxt = {}
                node[part] = nxt
            node = nxt
        leaf = parts[-1]
        if isinstance(value, Mapping) and isinstance(node.get(leaf), dict):
            merge_dotted(node[leaf], value)
        else:
            node[leaf] = copy.deepcopy(value) if isinstance(value, (dict, list)) else value
    return base


def apply_overrides(cfg: dict, pairs: Iterable[str]) -> dict:
    """Apply ``K V`` override pairs with type coercion from existing values."""
    pairs = list(pairs)
    if len(pairs) % 2 != 0:
        raise ValueError(f"--overrides expects K V pairs, got odd count: {pairs}")
    for key, raw in zip(pairs[::2], pairs[1::2]):
        parts = key.split(".")
        node = cfg
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        old = node.get(parts[-1])
        node[parts[-1]] = _coerce(raw, old)
    return cfg


class Config:
    """Immutable view over a nested config dict.

    Attribute access and item access both work; nested dicts come back as
    ``Config``.  ``get`` mirrors ``dict.get``.  Mutation raises.
    """

    __slots__ = ("_data",)

    def __init__(self, data: dict):
        object.__setattr__(self, "_data", data)

    # -- read access ------------------------------------------------------
    def __getitem__(self, key: str) -> Any:
        value = self._data[key]
        return Config(value) if isinstance(value, dict) else value

    def __getattr__(self, key: str) -> Any:
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def get(self, key: str, default: Any = None) -> Any:
        value = self._data.get(key, default)
        return Config(value) if isinstance(value, dict) else value

    def __contains__(self, key: str) -> bool:
        return key in self._data

    def __iter__(self):
        return iter(self._data)

    def keys(self):
        return self._data.keys()

    def items(self):
        for k, v in self._data.items():
            yield k, (Config(v) if isinstance(v, dict) else v)

    def to_dict(self) -> dict:
        return copy.deepcopy(self._data)

    def __repr__(self) -> str:
        return f"Config({self._data!r})"

    def __eq__(self, other) -> bool:
        if isinstance(other, Config):
            return self._data == other._data
        return self._data == other

    # -- no mutation ------------------------------------------------------
    def __setattr__(self, key, value):
        raise TypeError("Config is immutable after load")

    def __setitem__(self, key, value):
        raise TypeError("Config is immutable after load")


def load_config(
    conf_files: Iterable[str],
    overrides: Iterable[str] = (),
    config_overrides_json: str | None = None,
) -> Config:
    """Load + merge YAML files (later files win), then apply overrides."""
    cfg: dict = {}
    for path in conf_files:
        with open(path) as f:
            loaded = yaml.safe_load(f) or {}
        merge_dotted(cfg, loaded)
    if config_overrides_json:
        merge_dotted(cfg, json.loads(config_overrides_json))
    apply_overrides(cfg, overrides)
    return Config(cfg)


def load_opt_command(argv: list[str] | None = None):
    """CLI-compatible entry parsing: ``command --conf_files ... --overrides K V ...``.

    Returns ``(Config, argparse.Namespace)`` — the same contract as the
    reference's ``load_opt_command`` (utils/arguments.py:50-90).
    """
    parser = argparse.ArgumentParser("cullavo_tpu")
    parser.add_argument("command", choices=["train", "eval", "serve"])
    parser.add_argument("--conf_files", nargs="+", required=True)
    parser.add_argument("--config_overrides", default=None,
                        help="JSON dict of dotted-key overrides")
    parser.add_argument("--overrides", nargs=argparse.REMAINDER, default=[])
    args = parser.parse_args(argv)
    cfg = load_config(args.conf_files, args.overrides, args.config_overrides)
    return cfg, args
