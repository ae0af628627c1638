"""YAML config system with ``includes:``, CLI dotlist overrides, and numeric coercion.

Behavioral parity with the reference's OmegaConf-based loader (reference
bin/utils.py:94-137 ``get_args``, :68-91 ``merge_with_dotlist``, :34-65
``convert_numeric_strings``, :140-148 ``get``) without the OmegaConf dependency:

- a config may list ``includes:`` files, merged lowest-precedence-first, with paths
  resolved relative to the including file when not found as given;
- CLI overrides are ``key.path=value`` dotlist entries whose values are YAML-parsed
  (``safe_load`` here — the reference uses ``unsafe_load``, an arbitrary-code hole
  we deliberately do not reproduce);
- after merging, numeric-looking strings (incl. scientific notation) are coerced to
  int/float throughout the tree;
- per-executor views (trainor/validator/ensemblor) inherit every top-level key that
  is not itself an executor section.
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import re
from typing import Any, Dict, Iterable, List, Optional, Tuple

import yaml

_NUMERIC_RE = re.compile(r"^-?(\d+\.?\d*|\d*\.?\d+)([eE][+-]?\d+)?$")

EXECUTOR_SECTIONS = ("trainor", "validator", "ensemblor")


class Config:
    """A thin attribute-access wrapper over a nested dict.

    Supports ``cfg.key``, ``cfg['key']``, ``cfg.get(key, default)``, ``in``,
    iteration over keys, and deep conversion back to plain containers.
    Missing attribute access raises AttributeError (like OmegaConf struct-less mode
    returning None is error-prone; we keep `.get` for optional keys).
    """

    def __init__(self, data: Optional[Dict[str, Any]] = None):
        object.__setattr__(self, "_data", {})
        for k, v in (data or {}).items():
            self._data[k] = _wrap(v)

    # -- mapping protocol ---------------------------------------------------
    def __getitem__(self, key):
        return self._data[key]

    def __setitem__(self, key, value):
        self._data[key] = _wrap(value)

    def __contains__(self, key):
        return key in self._data

    def __iter__(self):
        return iter(self._data)

    def __len__(self):
        return len(self._data)

    def keys(self):
        return self._data.keys()

    def values(self):
        return self._data.values()

    def items(self):
        return self._data.items()

    def get(self, key, default=None):
        return self._data.get(key, default)

    def pop(self, key, *default):
        return self._data.pop(key, *default)

    def setdefault(self, key, default=None):
        if key not in self._data:
            self[key] = default
        return self._data[key]

    def update(self, other):
        for k, v in (other.items() if hasattr(other, "items") else other):
            self[k] = v

    # -- attribute access ---------------------------------------------------
    def __getattr__(self, key):
        try:
            return self._data[key]
        except KeyError:
            raise AttributeError(key)

    def __setattr__(self, key, value):
        self._data[key] = _wrap(value)

    def __deepcopy__(self, memo):
        return Config(copy.deepcopy(self.to_dict(), memo))

    def __eq__(self, other):
        if isinstance(other, Config):
            return self.to_dict() == other.to_dict()
        if isinstance(other, dict):
            return self.to_dict() == other
        return NotImplemented

    def __repr__(self):
        return f"Config({json.dumps(self.to_dict(), indent=2, default=str)})"

    def to_dict(self) -> Dict[str, Any]:
        return _unwrap(self)


def _wrap(value):
    if isinstance(value, Config):
        return value
    if isinstance(value, dict):
        return Config(value)
    if isinstance(value, (list, tuple)):
        return [_wrap(v) for v in value]
    return value


def _unwrap(value):
    if isinstance(value, Config):
        return {k: _unwrap(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [_unwrap(v) for v in value]
    return value


# ---------------------------------------------------------------------------
# Merging / coercion / dotlist
# ---------------------------------------------------------------------------

def merge_dicts(base: Dict[str, Any], override: Dict[str, Any]) -> Dict[str, Any]:
    """Recursive dict merge; ``override`` wins, dicts merge, everything else replaces."""
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_dicts(out[k], v)
        else:
            out[k] = v
    return out


def coerce_numeric_strings(obj):
    """Recursively convert numeric-looking strings (incl. ``1e-8``) to numbers.

    Mirrors reference bin/utils.py:34-65.
    """
    if isinstance(obj, str):
        if _NUMERIC_RE.match(obj.strip()):
            try:
                if "." not in obj and "e" not in obj.lower():
                    return int(obj)
                return float(obj)
            except ValueError:
                return obj
        return obj
    if isinstance(obj, dict):
        return {k: coerce_numeric_strings(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [coerce_numeric_strings(v) for v in obj]
    if isinstance(obj, tuple):
        return tuple(coerce_numeric_strings(v) for v in obj)
    return obj


def set_dotted(tree: Dict[str, Any], key: str, value) -> None:
    """Set ``a.b.c`` in a nested dict, merging dict values (OmegaConf.update merge=True)."""
    parts = key.split(".")
    node = tree
    for part in parts[:-1]:
        nxt = node.get(part)
        if not isinstance(nxt, dict):
            nxt = {}
            node[part] = nxt
        node = nxt
    leaf = parts[-1]
    if isinstance(value, dict) and isinstance(node.get(leaf), dict):
        node[leaf] = merge_dicts(node[leaf], value)
    else:
        node[leaf] = value


def apply_dotlist(tree: Dict[str, Any], dotlist: Iterable[str]) -> Dict[str, Any]:
    """Apply ``key=value`` CLI overrides (reference bin/utils.py:68-91)."""
    if not isinstance(dotlist, (list, tuple)):
        raise ValueError("Input list must be a list or a tuple of strings")
    override: Dict[str, Any] = {}
    for arg in dotlist:
        if not isinstance(arg, str):
            raise ValueError("Input list must be a list or a tuple of strings")
        idx = arg.find("=")
        if idx == -1:
            key, value = arg, None
        else:
            key = arg[:idx]
            value = yaml.safe_load(arg[idx + 1:])
        set_dotted(override, key, value)
    return override


# ---------------------------------------------------------------------------
# Loading
# ---------------------------------------------------------------------------

def load_yaml(path: str) -> Dict[str, Any]:
    with open(path) as f:
        data = yaml.safe_load(f)
    return data or {}


def _load_with_includes(path: str) -> Dict[str, Any]:
    """Load a YAML file and recursively expand its ``includes:`` list, merged
    lowest-precedence-first, the file itself winning (reference
    bin/utils.py:104-121; recursion is a robustness improvement — the reference
    only expands one level)."""
    config = load_yaml(path)
    includes = config.get("includes", []) or []
    if not isinstance(includes, (list, tuple)):
        raise AttributeError(f"Includes must be a list, {type(includes)} provided")

    include_mapping: Dict[str, Any] = {}
    for include in includes:
        if not os.path.exists(include):
            include = os.path.join(os.path.dirname(path), include)
        include_mapping = merge_dicts(include_mapping, _load_with_includes(include))

    config = merge_dicts(include_mapping, config)
    config.pop("includes", None)
    return config


def load_config(path: str, dotlist: Optional[List[str]] = None) -> Tuple[Config, Config]:
    """Load a YAML config with ``includes:`` and dotlist overrides.

    Returns ``(config, override)`` — mirrors reference bin/utils.py:94-137:
    includes merge lowest-precedence-first, the file itself overrides its includes,
    the dotlist overrides everything, then numeric strings are coerced.
    """
    config = _load_with_includes(path)

    override = apply_dotlist({}, list(dotlist or []))
    config = merge_dicts(config, override)

    config = coerce_numeric_strings(config)
    override = coerce_numeric_strings(override)
    return Config(config), Config(override)


def get_args(argv: Optional[List[str]] = None) -> Tuple[Config, Config]:
    """CLI entrypoint parity: one positional config + dotlist overrides."""
    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str)
    args, others = parser.parse_known_args(argv)
    return load_config(args.config, others)


def executor_config(config: Config, mode: str) -> Config:
    """Per-executor config view inheriting all non-executor top-level keys
    (reference bin/utils.py:140-148)."""
    exec_config = copy.deepcopy(config.get(mode) or Config({}))
    if not isinstance(exec_config, Config):
        exec_config = Config(exec_config)
    for att in list(config.keys()):
        if att not in EXECUTOR_SECTIONS:
            exec_config[att] = copy.deepcopy(_unwrap(config[att]))
    return exec_config
