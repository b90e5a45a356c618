"""Flax msgpack (de)serialization for converted variable pytrees."""

from __future__ import annotations

import os
from typing import Any, Dict

from flax import serialization


def save_variables(path: str, variables: Dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(variables))


def load_variables(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())
