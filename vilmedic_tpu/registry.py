"""Explicit registries replacing the reference's ``eval(proto)`` dispatch.

The reference instantiates models/datasets/blocks/losses by evaluating the config's
``proto:`` string in the importing module's namespace
(see reference vilmedic/executors/utils.py:110 and :153). Here every extensible kind
has an explicit registry keyed by name, which keeps the ``proto:`` config surface
intact while removing arbitrary code execution.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

_REGISTRIES: Dict[str, Dict[str, Any]] = {}


def _registry(kind: str) -> Dict[str, Any]:
    return _REGISTRIES.setdefault(kind, {})


def register(kind: str, name: Optional[str] = None) -> Callable:
    """Decorator: register a class/function under ``kind`` with key ``name``.

    Lookup is case-sensitive on the registered name, with a case-insensitive
    fallback at resolution time (config files use e.g. ``RougeL`` vs ``rougel``).
    """

    def wrap(obj):
        key = name or obj.__name__
        reg = _registry(kind)
        if key in reg and reg[key] is not obj:
            raise ValueError(f"Duplicate registration for {kind}:{key}")
        reg[key] = obj
        return obj

    return wrap


def get(kind: str, name: str):
    reg = _registry(kind)
    if name in reg:
        return reg[name]
    lowered = {k.lower(): v for k, v in reg.items()}
    if name.lower() in lowered:
        return lowered[name.lower()]
    raise KeyError(
        f"Unknown {kind} proto {name!r}. Registered: {sorted(reg.keys())}"
    )


def available(kind: str):
    return sorted(_registry(kind).keys())


def build(kind: str, config: Any, **extra):
    """Instantiate ``config['proto']`` from registry ``kind`` with remaining keys
    as kwargs — the registry-based equivalent of the reference's
    ``eval(proto)(**kwargs)`` convention (reference vilmedic/executors/utils.py:110).
    """
    from .config.config import Config

    if isinstance(config, Config):
        config = config.to_dict()
    config = dict(config)
    proto = config.pop("proto")
    cls = get(kind, proto)
    return cls(**config, **extra)
