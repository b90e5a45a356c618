"""``_target_``-style object instantiation (Hydra-instantiate semantics).

The reference instantiates model configs, loggers, callbacks and the trainer
from YAML via ``hydra.utils.instantiate`` / ``_locate`` (reference:
run.py:18-32). This is the dependency-free equivalent: a dotted import path
resolver plus recursive ``_target_`` instantiation.
"""

from __future__ import annotations

import importlib
from typing import Any


def locate(path: str) -> Any:
    """Resolve a dotted path like ``package.module.ClassName`` to the object."""
    parts = path.split(".")
    for split in range(len(parts), 0, -1):
        module_name = ".".join(parts[:split])
        try:
            obj = importlib.import_module(module_name)
        except ImportError:
            continue
        for attr in parts[split:]:
            obj = getattr(obj, attr)
        return obj
    raise ImportError(f"could not locate {path!r}")


def instantiate(node: Any, **kwargs: Any) -> Any:
    """Recursively instantiate ``_target_`` nodes.

    dicts with a ``_target_`` key become ``locate(_target_)(**rest)``; nested
    dicts/lists are instantiated first. Non-target nodes pass through.
    """
    if isinstance(node, dict):
        resolved = {
            key: instantiate(val)
            for key, val in node.items()
            if key != "_target_"
        }
        resolved.update(kwargs)
        if "_target_" in node:
            return locate(node["_target_"])(**resolved)
        return resolved
    if isinstance(node, (list, tuple)):
        return type(node)(instantiate(item) for item in node)
    return node
