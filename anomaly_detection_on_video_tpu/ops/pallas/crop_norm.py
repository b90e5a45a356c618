"""Pallas kernel: fused ten-crop + standardize + batch layout.

The extraction hot path turns resized uint8 frames into the I3D input batch
(reference semantics: GroupTenCrop + GroupStandardizationTenCrop,
src/gtransforms.py:21-73). The jnp path materializes a float32 10-crop
expansion and a large transpose; this kernel produces the final bf16 batch
in one pass per (clip, crop) program:

- crop windows overlap and sit at arbitrary (top, left) offsets, which
  BlockSpec-aligned blocking cannot express — each program DMAs its window
  (HBM -> VMEM scratch) manually;
- all ten crop offsets are compile-time constants for a given frame size, so
  the DMA per crop index is selected by ten ``@pl.when(j == k)`` branches
  with static slices (dynamic DMA offsets crash this environment's remote
  Mosaic compile helper — and static slices are faster anyway);
- the five flipped crops read from a pre-flipped copy of the frames (one
  cheap elementwise pass outside the kernel) so no in-kernel reversal of the
  interleaved (W, C) axis is needed;
- pixel layout inside the kernel is (frames, H, W*C): the channel-interleaved
  last dim keeps the innermost axis big enough (e.g. 341 * 3) for lane tiling.

Output batch order is (clip * 10 + crop), matching the extractor's
(n_clips, 10, 2048) feature contract.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..gtransforms import MEAN, STD, ten_crop_positions


def _crop_offsets(height: int, width: int, size: int) -> Tuple[List[int], List[int]]:
    positions = ten_crop_positions(height, width, size)  # five positions
    tops = [t for t, _ in positions] * 2
    lefts = [l for _, l in positions] * 2
    return tops, lefts


@functools.partial(
    jax.jit, static_argnames=("cropsize", "out_dtype_name", "interpret")
)
def ten_crop_standardize_pallas(
    frames: jnp.ndarray,  # (gc, fpc, H, W, 3) uint8
    cropsize: int = 224,
    out_dtype_name: str = "bfloat16",
    interpret: bool = False,
) -> jnp.ndarray:
    """(gc, fpc, H, W, 3) uint8 -> (gc*10, fpc, cropsize, cropsize, 3) dtype."""
    out_dtype = jnp.dtype(out_dtype_name)
    gc, fpc, height, width, channels = frames.shape
    assert channels == 3
    tops, lefts = _crop_offsets(height, width, cropsize)

    flat = frames.reshape(gc, fpc, height, width * 3)
    flipped = frames[:, :, :, ::-1, :].reshape(gc, fpc, height, width * 3)

    block_w = cropsize * 3
    # frames per program: keep (2 inputs + 1 output) x 2 pipeline buffers
    # well under the ~16 MB VMEM budget
    f_chunk = 2
    while fpc % f_chunk:
        f_chunk -= 1

    def kernel(orig_ref, flip_ref, out_ref):
        crop = pl.program_id(1)

        for k in range(10):
            src_ref = orig_ref if k < 5 else flip_ref
            top, left = tops[k], lefts[k] * 3

            @pl.when(crop == k)
            def _(src_ref=src_ref, top=top, left=left):
                # static (unaligned) vector slice of the whole-frame block;
                # Mosaic relays out unaligned static slices, while unaligned
                # *DMA* slices are rejected by tiling constraints
                window = src_ref[0, :, top : top + cropsize, left : left + block_w]
                # Mosaic has no direct uint8 -> float cast; hop through int32
                x = window.astype(jnp.int32).astype(jnp.float32)
                out_ref[0] = ((x - MEAN) * (1.0 / STD)).astype(out_dtype)

    frame_block = lambda i, j, f: (i, f, 0, 0)
    out = pl.pallas_call(
        kernel,
        grid=(gc, 10, fpc // f_chunk),
        in_specs=[
            pl.BlockSpec(
                (1, f_chunk, height, width * 3), frame_block,
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, f_chunk, height, width * 3), frame_block,
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, f_chunk, cropsize, block_w),
            lambda i, j, f: (i * 10 + j, f, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((gc * 10, fpc, cropsize, block_w), out_dtype),
        interpret=interpret,
    )(flat, flipped)
    return out.reshape(gc * 10, fpc, cropsize, cropsize, 3)
