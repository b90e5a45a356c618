"""Host-side video decode (reference: decord usage in src/dataset.py:154-159
and extract_features.py:112-148).

decord is not part of this stack; OpenCV's FFmpeg-backed VideoCapture does
the host decode. The reference's two decode modes are both kept:

- whole-video decode for normal-sized files;
- chunked decode (3,008 frames = 16 * 188 per chunk) for >1 GB videos so RAM
  stays bounded (extract_features.py:116-126), with the same chunk size so
  per-chunk feature caches stay layout-compatible.

``VideoFrameSource`` additionally supports background-thread prefetch of the
next chunk, the host half of the double-buffered host->device pipeline
(SURVEY.md §7.2 step 7).
"""

from __future__ import annotations

import hashlib
import os
import queue
import threading
from typing import Iterator, Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is present in this image
    cv2 = None

CHUNK_FRAMES = 16 * 188  # 3,008 (reference: extract_features.py:122)
LARGE_VIDEO_KB = 1024 ** 2  # 1 GB in KB (reference: extract_features.py:116)


def _decord_frames(path: str, start: int, count: Optional[int]) -> np.ndarray:
    """Reference-exact decode: decord.VideoReader + sequential indexing
    (src/dataset.py:154-159, extract_features.py:123-140 access ``vr[i]``
    in order — RGB already, no colorspace convert). Optional: decord is
    not part of this image; when installed it reproduces the byte stream
    the published feature zips were extracted from."""
    import decord  # optional dependency; import error surfaces to caller

    vr = decord.VideoReader(uri=path)
    stop = len(vr) if count is None else min(len(vr), start + count)
    frames = [np.asarray(vr[i].asnumpy()) for i in range(start, stop)]
    if not frames:
        raise ValueError(f"no frames decoded from {path!r} at start={start}")
    return np.stack(frames)


def decode_video_frames(
    path: str,
    start: int = 0,
    count: Optional[int] = None,
    backend: str = "cv2",
) -> np.ndarray:
    """Decode frames [start, start+count) to RGB uint8 (N, H, W, 3).

    backend "cv2" (default) is this framework's production decoder;
    "decord" is the reference's (src/dataset.py:154-159) and requires the
    optional decord package — use it to attribute feature diffs to decode
    vs model (see scripts/parity_check.py --decode-backend).
    """
    if backend == "decord":
        return _decord_frames(path, start, count)
    if backend != "cv2":
        raise ValueError(f"unknown decode backend {backend!r}")
    if cv2 is None:
        raise RuntimeError("OpenCV is required for video decode")
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video {path!r}")
    if start:
        cap.set(cv2.CAP_PROP_POS_FRAMES, start)
    frames = []
    while count is None or len(frames) < count:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {path!r} at start={start}")
    return np.stack(frames)


def decode_provenance(
    path: str,
    backend: str = "cv2",
    chunk_frames: int = CHUNK_FRAMES,
    max_frames: Optional[int] = None,
) -> dict:
    """Decode fingerprint: frame counts + per-chunk RGB checksums.

    The reference decodes with decord; this framework decodes with
    cv2/FFmpeg. A drift between the two (seek behavior, frame counts,
    colorspace rounding) would surface as a feature diff that the model
    parity harness cannot attribute — this fingerprint pins the decode
    axis. Two provenance reports whose ``chunk_sha256`` lists match decoded
    byte-identically; a mismatch names the first divergent chunk.

    Returns {backend, container_frame_count, decoded_frame_count, fps,
    frame_shape, chunk_frames, chunk_sha256: [hex, ...], sha256: hex}.
    """
    meta: dict = {"backend": backend, "chunk_frames": int(chunk_frames)}
    if backend == "cv2":
        if cv2 is None:
            raise RuntimeError("OpenCV is required for video decode")
        cap = cv2.VideoCapture(path)
        try:
            meta["container_frame_count"] = int(
                cap.get(cv2.CAP_PROP_FRAME_COUNT)
            )
            meta["fps"] = float(cap.get(cv2.CAP_PROP_FPS))
        finally:
            cap.release()
    elif backend == "decord":
        import decord

        vr = decord.VideoReader(uri=path)
        meta["container_frame_count"] = len(vr)
        meta["fps"] = float(getattr(vr, "get_avg_fps", lambda: 0.0)())
    else:
        raise ValueError(f"unknown decode backend {backend!r}")

    # stream sequentially (no seeks) — the same access pattern as the
    # production pipeline (iter_decoded_chunks) and the reference's
    # sequential vr[i] loop, so the fingerprint measures decode output,
    # not seek behavior
    if backend == "cv2":
        chunk_iter = iter_decoded_chunks(path, chunk_frames)
    else:

        def _decord_iter():
            import decord

            vr = decord.VideoReader(uri=path)
            for lo in range(0, len(vr), chunk_frames):
                hi = min(lo + chunk_frames, len(vr))
                yield np.stack(
                    [np.asarray(vr[i].asnumpy()) for i in range(lo, hi)]
                )

        chunk_iter = _decord_iter()

    total = hashlib.sha256()
    chunks = []
    decoded = 0
    shape = None
    for chunk in chunk_iter:
        if max_frames is not None and decoded + len(chunk) > max_frames:
            chunk = chunk[: max_frames - decoded]
        if not len(chunk):
            break
        shape = tuple(chunk.shape[1:])
        data = np.ascontiguousarray(chunk).tobytes()
        chunks.append(hashlib.sha256(data).hexdigest())
        total.update(data)
        decoded += len(chunk)
        if max_frames is not None and decoded >= max_frames:
            break
    meta["decoded_frame_count"] = decoded
    meta["frame_shape"] = list(shape) if shape else None
    meta["chunk_sha256"] = chunks
    meta["sha256"] = total.hexdigest()
    return meta


def video_num_frames(path: str) -> int:
    cap = cv2.VideoCapture(path)
    try:
        return int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    finally:
        cap.release()


def iter_decoded_chunks(
    path: str, chunk_frames: int = CHUNK_FRAMES
) -> Iterator[np.ndarray]:
    """Stream a video as sequential RGB chunks without seeking."""
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video {path!r}")
    try:
        chunk = []
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            chunk.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            if len(chunk) == chunk_frames:
                yield np.stack(chunk)
                chunk = []
        if chunk:
            yield np.stack(chunk)
    finally:
        cap.release()


class VideoFrameSource:
    """Double-buffered chunk decoder: a worker decodes ahead of the consumer.

    The consumer overlaps TPU compute on chunk N with host decode of chunk
    N+1 — the streaming pipeline the BASELINE.json north star asks for.
    Uses the native framepipe engine (C++/FFmpeg with its own decode thread
    and chunk ring, native/framepipe/) when available, else a Python thread
    over cv2.
    """

    def __init__(
        self,
        path: str,
        chunk_frames: int = CHUNK_FRAMES,
        depth: int = 2,
        native: Optional[bool] = None,
    ):
        self.path = path
        self._native = None
        if native is not False:
            try:
                from .framepipe import NativeFrameSource

                self._native = NativeFrameSource(path, chunk_frames, depth)
                return
            except (RuntimeError, FileNotFoundError):
                if native is True:
                    raise
        self._queue: "queue.Queue" = queue.Queue(maxsize=depth)
        self._thread = threading.Thread(
            target=self._worker, args=(chunk_frames,), daemon=True
        )
        self._thread.start()

    def _worker(self, chunk_frames: int) -> None:
        try:
            for chunk in iter_decoded_chunks(self.path, chunk_frames):
                self._queue.put(chunk)
            self._queue.put(None)
        except BaseException as exc:  # propagate decode errors to consumer
            self._queue.put(exc)

    def __iter__(self) -> Iterator[np.ndarray]:
        if self._native is not None:
            yield from self._native
            return
        while True:
            item = self._queue.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item


def is_large_video(path: str, threshold_kb: int = LARGE_VIDEO_KB) -> bool:
    """Reference chunking predicate: size in KB > 1024**2
    (extract_features.py:116, size field is KB)."""
    return os.path.getsize(path) / 1024 > threshold_kb


class TenCropVideoFrameDataset:
    """API-parity shim for the reference's clip dataset
    (src/dataset.py:145-195): indexable clips of a video, each preprocessed
    to the ten-crop tensor. The TPU-native pipeline (data/extraction.py)
    processes whole frame stacks instead — this class exists for users
    porting per-clip code; it decodes eagerly like the reference.

    Items are channels-last ``(10, frames_per_clip, H, W, 3)`` float32
    (the reference returns channels-first, (10, T, 3, H, W)).
    """

    def __init__(
        self,
        video_path_or_frames,
        frames_per_clip: int = 16,
        resize: int = 256,
        cropsize: int = 224,
    ):
        if isinstance(video_path_or_frames, str):
            frames = decode_video_frames(video_path_or_frames)
        else:
            frames = np.asarray(video_path_or_frames)
            if frames.dtype != np.uint8 or frames.ndim != 4:
                raise ValueError(
                    "expected a video path or a uint8 (frames, H, W, 3) array"
                )
        self.frames = frames
        self.frames_per_clip = frames_per_clip
        self.resize = resize
        self.cropsize = cropsize
        n_frames = frames.shape[0]
        self._n_clips = (n_frames - 1) // frames_per_clip + 1

    def __len__(self) -> int:
        return self._n_clips

    def __getitem__(self, idx: int) -> np.ndarray:
        from ..ops.gtransforms import preprocess_frames

        if not 0 <= idx < self._n_clips:
            raise IndexError(idx)
        clip = self.frames[idx * self.frames_per_clip : (idx + 1) * self.frames_per_clip]
        out = preprocess_frames(
            clip, self.resize, self.cropsize, self.frames_per_clip
        )
        return np.asarray(out[0])
