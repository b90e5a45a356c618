"""Pallas fused I3D stem for TPU: conv + BN + ReLU + most of the maxpool.

The i3res50 stem (reference: src/i3d.py:209-213 — Conv3d 3->64 k(5,7,7)
s(2,2,2) p(2,3,3), BN, ReLU, MaxPool3d k(2,3,3) s(2,2,2)) is the worst
section of the XLA forward: ~47-52 ms of the 109 ms B=240 v5e forward at
~29% MFU. Two structural problems XLA cannot fix:

- C_in=3 starves the MXU contraction and C_out=64 fills half its width;
- the (..., 64) bf16 activation lane-pads 2x under (16, 128) tiling, so
  the stem -> relu -> maxpool chain moves ~17 GB of padded HBM traffic.

This kernel restructures the whole section:

- **phase-split im2col**: ``build_phase_input`` pre-splits the padded
  input into (h, w) stride-2 phases with a flattened in-phase (i, j) axis,
  so every (kh, kw) tap of the strided conv is ONE contiguous 2D slice;
  the in-kernel im2col (1029 tap-rows x 1972 positions) feeds a single
  ``(K, N) x (K, M)`` matmul — the only dot_general form Mosaic compiles
  without tiled-layout shape casts.
- **t-pair packing**: the two stem frames of each temporal-pool window are
  computed together as 128 output columns (weights duplicated with a
  2-frame shift by ``pack_stem_params``) — full MXU width at 1029/1470 =
  1.4x tap redundancy.
- **fused epilogue**: folded-BN affine, ReLU, the temporal max (row-half
  max of the packed pair) and the pool's h-axis max run on-register; only
  an h-pooled (B, T/4, 56, 64, 116) tensor is written. The remaining
  w-axis max is a cheap strided ``reduce_window`` left to XLA
  (lane-strided ops are unsupported in Mosaic): see ``stem_pool_w``.

Numerics: identical MAC set to the reference stem (f32 accumulation); the
f32 path matches ConvBN+pool to ~1e-6 (tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# stem geometry (i3res50): conv k(5,7,7) s(2,2,2) p(2,3,3); pool k(2,3,3)
# s(2,2,2). Fixed 224x224 crops (the ten-crop protocol) keep every shape
# static: 112x112 stem plane, 55x55 pooled plane.
KT, KH, KW, CIN = 5, 7, 7, 3
DT = 7  # temporal tap union of the packed output pair
K_ROWS = KH * KW * DT * CIN  # 1029
P_ROWS = 8  # pooled h rows per (program, u) (block sublane dim: 8|P_ROWS)
S_ROWS = 2 * P_ROWS + 1  # stem rows needed (overlapping pool windows)
I_BLK = S_ROWS + 4  # h-phase rows per tile (+3 conv halo, +1 so the
# largest tap's flat window (start 351 + M_FLAT) stays inside the tile)
JW = 116  # padded w-phase width; stem w positions computed per row
M_FLAT = S_ROWS * JW  # 1972 matmul positions per (tile, u)
N_HB = 7  # h tiles: 7 * P_ROWS = 56 pooled rows (55 valid + overhang)


def pack_stem_params(kernel, bn_scale, bn_bias, bn_mean, bn_var,
                     eps: float = 1e-5, dtype=jnp.bfloat16):
    """(5,7,7,3,64) conv kernel + BN -> (K_ROWS, 128) weights + f32 affine.

    Output columns are (j, c): j in {0, 1} selects stem frame 2u+j of the
    temporal pool pair; rows are ordered (kh, kw, dt, c) to match the
    kernel's im2col slices (dt = frame offset within the 7-frame window;
    j=0 uses dt=kt, j=1 uses dt=kt+2).
    """
    cout = kernel.shape[-1]
    w2 = jnp.zeros((KH, KW, DT, CIN, 2 * cout), kernel.dtype)
    k = jnp.transpose(kernel, (1, 2, 0, 3, 4))  # (kh, kw, kt, c, cout)
    w2 = w2.at[:, :, 0:KT, :, 0:cout].set(k)
    w2 = w2.at[:, :, 2:2 + KT, :, cout:2 * cout].set(k)
    w2 = w2.reshape(K_ROWS, 2 * cout).astype(dtype)

    g = bn_scale.astype(jnp.float32) * jax.lax.rsqrt(
        bn_var.astype(jnp.float32) + eps)
    b = bn_bias.astype(jnp.float32) - bn_mean.astype(jnp.float32) * g
    scale = jnp.tile(g, 2).reshape(2 * cout, 1)
    bias = jnp.tile(b, 2).reshape(2 * cout, 1)
    return w2, scale, bias


def build_phase_input(x: jnp.ndarray) -> jnp.ndarray:
    """(B, 16, 224, 224, 3) -> phase-split h-tiled (B, 7, 2, 2, 60, 2436).

    Pads t by (2, 2) and h/w by (3, 5) (conv padding 2/3 plus slack),
    splits h and w into stride-2 phases (p, q) with in-phase indices
    (i, j), flattens (t, c) t-major and (i, j) i-major, and pre-gathers
    the 7 overlapping h-window tiles (21 phase rows each) so every kernel
    block load is block-aligned.
    """
    b = x.shape[0]
    xp = jnp.pad(x, [(0, 0), (2, 2), (3, 7), (3, 5), (0, 0)])
    # (B, 20, 234, 232, 3) -> (B, 20t, 117i, 2p, 116j, 2q, 3c)
    xp = xp.reshape(b, 20, 117, 2, 116, 2, 3)
    # -> (B, p, q, t, c, i, j)
    xp = jnp.transpose(xp, (0, 3, 5, 1, 6, 2, 4))
    xp = xp.reshape(b, 2, 2, 60, 117 * 116)  # (t,c) t-major; (i,j) i-major
    tiles = [
        jax.lax.slice_in_dim(xp, 2 * P_ROWS * JW * hb,
                             2 * P_ROWS * JW * hb + I_BLK * JW, axis=4)
        for hb in range(N_HB)
    ]
    return jnp.stack(tiles, axis=1)  # (B, 7, 2, 2, 60, 2436)


def _stem_kernel(x_ref, w_ref, scale_ref, bias_ref, o_ref, im_ref, *,
                 acc_dtype):
    for u in range(4):
        # im2col rows (kh, kw, dt, c): the (t, c) slice [12u, 12u+21) covers
        # input frames 4u+dt, dt in [0, 7); the flat (i, j) slice starting
        # at (kh//2)*JW + kw//2 covers all S_ROWS x 112 positions of the
        # tap in one contiguous 2D window (per-row overhang is masked by
        # the pool epilogue / caller slicing). Built by explicit scratch
        # writes: a jnp.concatenate of slices at different lane offsets is
        # "offset mismatch on non-concat dimension" in Mosaic.
        for kh in range(KH):
            for kw in range(KW):
                start = (kh // 2) * JW + (kw // 2)
                row = (kh * KW + kw) * 21
                im_ref[row: row + 21] = x_ref[
                    0, 0, kh % 2, kw % 2, 12 * u: 12 * u + 21,
                    start: start + M_FLAT,
                ]
        im2col = im_ref[:]  # (1029, 1972)

        out = jax.lax.dot_general(
            w_ref[:], im2col, (((0,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
        )  # (128, 1972): rows (j, c), cols (stem row, w)
        out = out.astype(jnp.float32) * scale_ref[:] + bias_ref[:]
        out = jnp.maximum(out, 0.0)
        # temporal maxpool k2 s2: the packed pair is exactly the window
        y = jnp.maximum(out[0:64], out[64:128])  # (64, 1972)
        # pool h axis: stem rows 2r, 2r+1, 2r+2 live at lane offsets
        # 232r, 232r+116, 232r+232 of the flat (row, w) axis
        for rp in range(P_ROWS):
            a = y[:, 232 * rp: 232 * rp + JW]
            b = y[:, 232 * rp + JW: 232 * rp + 2 * JW]
            c = y[:, 232 * rp + 2 * JW: 232 * rp + 3 * JW]
            # out rows are (u, rp, c, w): the (64, JW) value only needs
            # leading unit dims (middle-unit reshapes are unsupported)
            o_ref[0, u, rp] = jnp.maximum(
                jnp.maximum(a, b), c
            ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("interpret", "out_dtype_name", "acc_dtype_name")
)
def stem_conv_pool_h(
    x: jnp.ndarray,  # (B, 16, 224, 224, 3) standardized pixels
    w2: jnp.ndarray,  # (K_ROWS, 128) from pack_stem_params
    scale: jnp.ndarray,  # (128, 1) f32
    bias: jnp.ndarray,  # (128, 1) f32
    interpret: bool = False,
    out_dtype_name: str = "bfloat16",
    acc_dtype_name: str = "float32",
) -> jnp.ndarray:
    """Fused stem minus the pool's w axis: (B, 4, 56, 64, 116) with dims
    (batch, t, pooled h row, channel, w); w still stem-resolution (112
    valid)."""
    b, t, h, w, c = x.shape
    if (t, h, w, c) != (16, 224, 224, 3):
        raise ValueError(f"fused stem requires (16,224,224,3) clips, got {x.shape}")
    xt = build_phase_input(x.astype(w2.dtype))
    kernel = functools.partial(_stem_kernel, acc_dtype=jnp.dtype(acc_dtype_name))
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b, N_HB),
        in_specs=[
            pl.BlockSpec((1, 1, 2, 2, 60, I_BLK * JW),
                         lambda i, j: (i, j, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full, full, full,
        ],
        out_specs=pl.BlockSpec((1, 4, P_ROWS, 64, JW),
                               lambda i, j: (i, 0, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b, 4, N_HB * P_ROWS, 64, JW), jnp.dtype(out_dtype_name)
        ),
        scratch_shapes=[pltpu.VMEM((K_ROWS, M_FLAT), w2.dtype)],
        interpret=interpret,
    )(xt, w2, scale, bias)


def stem_pool_w(y: jnp.ndarray, channels_last: bool = True) -> jnp.ndarray:
    """Finish the spatial maxpool along w (stride-2 window-3 on the last
    axis — lane-strided, so left to XLA) and lay out for the next stage.

    (B, 4, 56, 64, 116) -> (B, 4, 55, 55, 64) if channels_last else the
    flat channels-first (B, 4, 64, 56*55) the fused stage-1 kernel takes
    (row 55 is pool overhang, masked there).
    """
    pooled = jax.lax.reduce_window(
        y, -jnp.inf if jnp.issubdtype(y.dtype, jnp.floating) else 0,
        jax.lax.max, (1, 1, 1, 1, 3), (1, 1, 1, 1, 2), "valid",
    )[..., :55]  # (B, 4, 56row, 64c, 55w)
    if channels_last:
        return jnp.transpose(pooled[:, :, :55], (0, 1, 2, 4, 3))
    flat = jnp.transpose(pooled, (0, 1, 3, 2, 4))  # (B, 4, 64, 56, 55)
    return flat.reshape(*flat.shape[:3], 56 * 55)
