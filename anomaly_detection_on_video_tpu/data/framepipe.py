"""ctypes binding for the native framepipe decode engine.

framepipe (native/framepipe/framepipe.cpp) is the C++/FFmpeg decode runtime
playing the role the reference delegates to decord: a background thread
decodes RGB24 chunks into a bounded ring so host decode overlaps TPU compute.
The binding auto-builds the shared library on first use (make, ~1s) and
callers fall back to the cv2 path when FFmpeg dev libraries are absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "framepipe",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libframepipe.so")
_lib = None
_lib_lock = threading.Lock()


def _load_library():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except (subprocess.SubprocessError, FileNotFoundError):
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.fp_stream_open.restype = ctypes.c_void_p
        lib.fp_stream_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
        lib.fp_stream_width.restype = ctypes.c_int
        lib.fp_stream_width.argtypes = [ctypes.c_void_p]
        lib.fp_stream_height.restype = ctypes.c_int
        lib.fp_stream_height.argtypes = [ctypes.c_void_p]
        lib.fp_stream_fps.restype = ctypes.c_double
        lib.fp_stream_fps.argtypes = [ctypes.c_void_p]
        lib.fp_stream_approx_frames.restype = ctypes.c_int64
        lib.fp_stream_approx_frames.argtypes = [ctypes.c_void_p]
        lib.fp_stream_next.restype = ctypes.c_int
        lib.fp_stream_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.fp_stream_error.restype = ctypes.c_char_p
        lib.fp_stream_error.argtypes = [ctypes.c_void_p]
        lib.fp_stream_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load_library() is not None


class NativeFrameSource:
    """Iterator of RGB uint8 chunks decoded by the native engine."""

    def __init__(self, path: str, chunk_frames: int, depth: int = 2):
        lib = _load_library()
        if lib is None:
            raise RuntimeError("framepipe native library unavailable")
        self._lib = lib
        self._handle = lib.fp_stream_open(
            path.encode(), int(chunk_frames), int(depth)
        )
        if not self._handle:
            raise FileNotFoundError(f"framepipe cannot open {path!r}")
        self.chunk_frames = chunk_frames
        self.width = lib.fp_stream_width(self._handle)
        self.height = lib.fp_stream_height(self._handle)
        self.fps = lib.fp_stream_fps(self._handle)

    def __iter__(self) -> Iterator[np.ndarray]:
        buf = np.empty((self.chunk_frames, self.height, self.width, 3), np.uint8)
        while True:
            n = self._lib.fp_stream_next(
                self._handle, buf.ctypes.data_as(ctypes.c_void_p)
            )
            if n == 0:
                return
            if n < 0:
                raise RuntimeError(
                    "framepipe decode error: "
                    + self._lib.fp_stream_error(self._handle).decode()
                )
            yield buf[:n].copy()

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.fp_stream_close(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.close()
        except Exception:
            pass
