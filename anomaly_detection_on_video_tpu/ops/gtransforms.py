"""Fused group video transforms (the reference's gtransforms, TPU-style).

The reference implements preprocessing as five chained per-frame PIL/torch
stages with nested Python loops (reference: src/gtransforms.py:9-132,
composed at src/dataset.py:175-183):
    GroupResize(256) -> GroupTenCrop(224) -> ToTensorTenCrop
    -> GroupStandardizationTenCrop((x-114.75)/57.375) -> LoopPad(16)

Here the whole pipeline is one jit'd device function over a whole frame
stack: exact-PIL resize (two matmuls, ops/resize.py), ten-crop as pure
slicing, standardization fused elementwise, and loop-pad expressed as a
gather index map so every clip of a video is materialized in a single static
shape. This removes both hot Python loops flagged in SURVEY.md §3.3 (the
16x10 per-image normalize loop and per-crop processing).

Output layout is channels-last NDHWC (TPU/XLA-preferred); the reference's
(ncrops, clip_len, 3, H, W) tensors (src/dataset.py:193-195) correspond to
our (ncrops, clip_len, H, W, 3) up to the channel transpose.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .resize import resize_bilinear_exact, short_side_size

MEAN = 114.75
STD = 57.375


def ten_crop_positions(height: int, width: int, size: int = 224) -> List[Tuple[int, int]]:
    """Five-crop corner/center offsets, matching torchvision five_crop.

    Order: top-left, top-right, bottom-left, bottom-right, center (the
    reference's GroupTenCrop uses torchvision TenCrop, src/gtransforms.py:21-26).
    Center uses int(round(.)) like torchvision's center_crop.
    """
    return [
        (0, 0),
        (0, width - size),
        (height - size, 0),
        (height - size, width - size),
        (int(round((height - size) / 2.0)), int(round((width - size) / 2.0))),
    ]


def ten_crop(frames: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """``(..., H, W, C) -> (10, ..., size, size, C)`` ten-crop by slicing.

    Crops 0-4 are the five crops of the image; crops 5-9 are the five crops
    of the horizontally flipped image (torchvision TenCrop order).
    """
    height, width = frames.shape[-3], frames.shape[-2]
    positions = ten_crop_positions(height, width, size)
    crops = [
        frames[..., top : top + size, left : left + size, :]
        for top, left in positions
    ]
    flipped = frames[..., :, ::-1, :]
    crops += [
        flipped[..., top : top + size, left : left + size, :]
        for top, left in positions
    ]
    return jnp.stack(crops, axis=0)


def center_crop(frames: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """``(..., H, W, C) -> (..., size, size, C)`` center crop.

    Identical to crop index 4 of :func:`ten_crop` (torchvision order), so a
    center-crop pipeline produces exactly the ten-crop pipeline's fifth
    feature row at a tenth of the compute — the serving-mode trade
    (data/extraction.py ``crops="center"``).
    """
    height, width = frames.shape[-3], frames.shape[-2]
    top, left = ten_crop_positions(height, width, size)[4]
    return frames[..., top : top + size, left : left + size, :]


def standardize(x: jnp.ndarray, mean: float = MEAN, std: float = STD) -> jnp.ndarray:
    """Float standardization, (x - 114.75) / 57.375 per channel.

    Reference: GroupStandardizationTenCrop (src/gtransforms.py:41-73) — there
    a nested frames x crops Python loop; here one fused elementwise op.
    """
    return (x.astype(jnp.float32) - mean) * (1.0 / std)


def loop_pad_indices(n_frames: int, frames_per_clip: int = 16) -> np.ndarray:
    """Index map ``(n_clips, frames_per_clip)`` into a video's frame axis.

    Clips are non-overlapping windows of ``frames_per_clip`` frames
    (reference: src/dataset.py:171-173,188-191). A short final clip is
    loop-padded by repeating its own frames from the start (reference LoopPad,
    src/gtransforms.py:115-132): for a tail of length L, frame i of the padded
    clip is tail[i % L].
    """
    n_clips = (n_frames - 1) // frames_per_clip + 1
    idx = np.zeros((n_clips, frames_per_clip), dtype=np.int32)
    for clip in range(n_clips):
        start = clip * frames_per_clip
        length = min(frames_per_clip, n_frames - start)
        for i in range(frames_per_clip):
            idx[clip, i] = start + (i % length)
    return idx


@functools.partial(jax.jit, static_argnames=("resize", "cropsize", "frames_per_clip"))
def preprocess_frames(
    frames: jnp.ndarray,
    resize: int = 256,
    cropsize: int = 224,
    frames_per_clip: int = 16,
) -> jnp.ndarray:
    """Whole-video fused preprocessing: the reference's 5-stage Compose.

    frames: uint8 ``(n_frames, H, W, 3)`` (decoded on host).
    Returns float32 ``(n_clips, 10, frames_per_clip, cropsize, cropsize, 3)``,
    standardized, loop-padded — ready to batch (n_clips*10) onto the MXU.
    """
    n_frames, height, width = frames.shape[0], frames.shape[1], frames.shape[2]
    out_h, out_w = short_side_size(height, width, resize)
    resized = resize_bilinear_exact(frames, out_h, out_w)
    crops = ten_crop(resized, cropsize)  # (10, n_frames, c, c, 3) uint8
    clip_idx = jnp.asarray(loop_pad_indices(n_frames, frames_per_clip))
    # gather clips: (10, n_clips, frames_per_clip, c, c, 3)
    clips = crops[:, clip_idx]
    clips = standardize(clips)
    # -> (n_clips, 10, frames_per_clip, c, c, 3)
    return jnp.transpose(clips, (1, 0, 2, 3, 4, 5))


def pixel_minmax(x: jnp.ndarray, new_min: float = 0.0, new_max: float = 1.0) -> jnp.ndarray:
    """Per-image min-max normalization over all pixels of each crop image.

    API-parity port of the reference's unused GroupPixelMinmaxTenCrop
    alternative (src/gtransforms.py:76-86); operates per (..., H, W, C) image.
    """
    lo = jnp.min(x, axis=(-3, -2, -1), keepdims=True)
    hi = jnp.max(x, axis=(-3, -2, -1), keepdims=True)
    x = (x.astype(jnp.float32) - lo) / (hi - lo)
    return x * (new_max - new_min) + new_min


def rgb_channel_minmax(
    x: jnp.ndarray, new_min: float = 0.0, new_max: float = 1.0
) -> jnp.ndarray:
    """Per-channel min-max normalization (reference alternative
    GroupRGBChannelMinmaxTenCrop, src/gtransforms.py:89-112)."""
    lo = jnp.min(x, axis=(-3, -2), keepdims=True)
    hi = jnp.max(x, axis=(-3, -2), keepdims=True)
    x = (x.astype(jnp.float32) - lo) / (hi - lo)
    return x * (new_max - new_min) + new_min
