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


_LO_BITS = 11  # split 2^22 fixed-point weights into two <=11-bit halves


def _exact_pass(x: jnp.ndarray, wq: np.ndarray, spec: str) -> jnp.ndarray:
    """One bit-exact resample pass as two f32 MXU matmuls + int32 rounding.

    With weights split as wq = hi * 2^11 + lo, every f32 product and
    accumulation is an integer below 2^24 and therefore exact: products are
    <= 255 * (2^11 - 1) < 2^19, and because Pillow weights per output pixel
    sum to 2^22, the hi-half sums stay <= 255 * 2^11 = 2^19 (lo-half sums
    <= n_taps * 2^19, fine for any practical scale factor). The int32
    recombination then reproduces Pillow's add-half-and-shift rounding
    bit-for-bit — PIL parity at MXU speed (a direct int32 einsum would run
    on the VPU and compiles pathologically slowly on TPU).
    """
    hi = jnp.asarray((wq >> _LO_BITS).astype(np.float32))
    lo = jnp.asarray((wq & ((1 << _LO_BITS) - 1)).astype(np.float32))
    kwargs = dict(
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )
    p_hi = jnp.einsum(spec, x, hi, **kwargs).astype(jnp.int32)
    p_lo = jnp.einsum(spec, x, lo, **kwargs).astype(jnp.int32)
    acc = p_hi * (1 << _LO_BITS) + p_lo
    return _fixed_point_round(acc).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_bilinear_exact(frames: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Resize uint8 frames ``(..., H, W, C)`` to ``(..., out_h, out_w, C)``.

    Two resample passes with Pillow's rounding between them (horizontal pass
    first, exactly like ImagingResample). Bit-identical to PIL BILINEAR.
    """
    in_h, in_w = frames.shape[-3], frames.shape[-2]
    x = frames.astype(jnp.float32)
    x = _exact_pass(x, pil_resize_coeffs(in_w, out_w), "...hwc,vw->...hvc")
    x = _exact_pass(x, pil_resize_coeffs(in_h, out_h), "...hwc,vh->...vwc")
    return x.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_bilinear_fast(frames: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """MXU-speed PIL-style resize: float32 matmuls with Pillow's quantized
    coefficients and round-half-up between passes.

    Near-exact vs PIL: coefficients are the same 2^-22-quantized values
    (exactly representable in f32); the only deviation is f32 product/sum
    rounding, which can misround a pixel whose exact pass value lies within
    ~3e-5 of an x.5 boundary (measured ~1e-5 of pixels, always ±1 LSB).
    Use for bf16 extraction throughput; parity runs use the exact path.
    """
    in_h, in_w = frames.shape[-3], frames.shape[-2]
    scale = np.float32(1.0 / (1 << PRECISION_BITS))
    wh = jnp.asarray(pil_resize_coeffs(in_h, out_h).astype(np.float32) * scale)
    ww = jnp.asarray(pil_resize_coeffs(in_w, out_w).astype(np.float32) * scale)
    x = frames.astype(jnp.float32)
    # Precision.HIGHEST: TPU default matmul precision truncates f32 inputs
    # to bf16 (one MXU pass), which corrupts ~13% of pixels by 1 LSB; the
    # highest precision setting keeps true f32 products
    x = jnp.einsum(
        "...hwc,vw->...hvc", x, ww,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    x = jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0)
    x = jnp.einsum(
        "...hwc,vh->...vwc", x, wh,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    x = jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0)
    return x.astype(jnp.uint8)
