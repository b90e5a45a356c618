"""Bit-exact PIL bilinear resize as two MXU matmuls.

The reference preprocesses every frame with ``transforms.Resize(256,
BILINEAR)`` on PIL images (reference: src/gtransforms.py:9-18), i.e. Pillow's
two-pass separable resampler: a horizontal pass that rounds to uint8, then a
vertical pass that rounds to uint8, with triangle-filter coefficients
quantized to fixed point (Pillow ``Resample.c``, PRECISION_BITS = 32-8-2).
Feature parity with the reference hinges on reproducing those exact uint8
outputs (SURVEY.md §7.3 hard-part #1).

TPU-native design: each pass is a dense (out_size, in_size) coefficient
matrix — resize becomes two small matmuls over the pixel grid, executed in
int32 so the fixed-point rounding is reproduced bit-for-bit. Verified equal
to ``PIL.Image.resize(..., BILINEAR)`` on random images in
tests/test_gtransforms.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Pillow Resample.c fixed-point precision for 8-bit images.
PRECISION_BITS = 32 - 8 - 2


def short_side_size(height: int, width: int, size: int = 256) -> Tuple[int, int]:
    """torchvision ``Resize(int)`` target: scale so the short side == size.

    Mirrors torchvision's int-truncation of the long side (reference behavior
    of src/gtransforms.py:15 via transforms.Resize(256)).
    """
    if height <= width:
        return size, int(size * width / height)
    return int(size * height / width), size


@functools.lru_cache(maxsize=256)
def pil_resize_coeffs(in_size: int, out_size: int) -> np.ndarray:
    """Dense (out_size, in_size) int32 fixed-point triangle-filter matrix.

    Reproduces Pillow's ``precompute_coeffs`` for the BILINEAR filter
    (support=1.0): per output pixel, weights over a window of input pixels,
    normalized in double precision then quantized to round(w * 2^22).
    """
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 1.0 * filterscale
    matrix = np.zeros((out_size, in_size), dtype=np.int32)
    for xx in range(out_size):
        center = (xx + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        n = xmax - xmin
        w = np.empty(n, dtype=np.float64)
        for i in range(n):
            x = (xmin + i + 0.5 - center) / filterscale
            w[i] = max(0.0, 1.0 - abs(x))
        w /= w.sum()
        matrix[xx, xmin:xmax] = np.round(w * (1 << PRECISION_BITS)).astype(np.int32)
    return matrix


def _fixed_point_round(acc: jnp.ndarray) -> jnp.ndarray:
    """Pillow's clip8: add half, shift right by PRECISION_BITS, clamp."""
    half = 1 << (PRECISION_BITS - 1)
    return jnp.clip((acc + half) >> PRECISION_BITS, 0, 255)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_bilinear_exact(frames: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Resize uint8 frames ``(..., H, W, C)`` to ``(..., out_h, out_w, C)``.

    Two int32 matmuls with Pillow's rounding between passes (horizontal pass
    first, exactly like ImagingResample). Bit-identical to PIL BILINEAR.
    """
    in_h, in_w = frames.shape[-3], frames.shape[-2]
    wh = jnp.asarray(pil_resize_coeffs(in_h, out_h))
    ww = jnp.asarray(pil_resize_coeffs(in_w, out_w))
    x = frames.astype(jnp.int32)
    # horizontal pass: contract W -> out_w, then fixed-point round to uint8 range
    x = jnp.einsum("...hwc,vw->...hvc", x, ww, preferred_element_type=jnp.int32)
    x = _fixed_point_round(x)
    # vertical pass: contract H -> out_h
    x = jnp.einsum("...hwc,vh->...vwc", x, wh, preferred_element_type=jnp.int32)
    x = _fixed_point_round(x)
    return x.astype(jnp.uint8)
