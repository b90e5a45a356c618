"""Atomic numpy IO helpers.

The reference relies on resume-by-file-existence in its offline jobs
(extract_features.py:106-110,131-134,164-167); atomic tmp+rename writes make
that resumability crash-safe (SURVEY.md §5 hardening note).
"""

from __future__ import annotations

import os
import tempfile

import numpy as np


def atomic_write_bytes(path: str, blob: bytes) -> None:
    directory = os.path.dirname(path) or "."
    os.makedirs(directory, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def atomic_save(path: str, array: np.ndarray) -> None:
    directory = os.path.dirname(path) or "."
    os.makedirs(directory, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp.npy")
    try:
        with os.fdopen(fd, "wb") as f:
            np.save(f, array)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
