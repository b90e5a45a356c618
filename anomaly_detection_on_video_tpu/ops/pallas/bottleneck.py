"""Pallas fused bottleneck block for I3D stage 1 (TPU).

Stage 1 dominates the I3D forward after the stem (~31 ms of 109 ms at
B=240 on a v5e) and is HBM-bound, not MXU-bound: its 64-channel
intermediates (conv_a/conv_b outputs) are lane-padded 2x by the TPU's
(16, 128) tiling, so the XLA path moves ~20 GB of padded activations per
batch between HBM and the core. This kernel runs one whole bottleneck
block (reference: src/i3d.py:60-121 — conv_a k(3,1,1) + BN + ReLU, conv_b
k(1,3,3) + BN + ReLU, conv_c 1x1x1 + BN, projection shortcut, residual
ReLU) per (batch row, frame) program with every intermediate in VMEM.

Layout: activations are channels-first with a flattened spatial axis,
``(B, T, C, F)`` where ``F = 56 * 55`` (55x55 valid positions plus one
pool-overhang row that the tap masks treat as invalid). This makes every
convolution a probe-clean ``(K, N) x (K, M)`` dot_general:

- conv_a's temporal taps are three such matmuls over the (t-1, t, t+1)
  frame planes (zero at the ends — the reference's temporal padding);
- conv_b's 3x3 spatial taps are lane-rotations of the conv_a output
  (shift by 55*dh + dw) with iota masks reproducing zero padding exactly,
  concatenated into a (576, F) im2col;
- conv_c / the projection are plain 1x1 matmuls; BatchNorm (inference) is
  folded into per-channel f32 affines applied in the epilogues.

Weights arrive pre-packed by ``pack_block_params`` from the standard flax
parameter tree (models/i3d.py Bottleneck), so checkpoints are unchanged.
``flatten_nthwc``/``unflatten_ncf`` convert at the stage boundary.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H_ROWS = 56  # 55 valid + 1 pool-overhang row (masked as invalid source)
W_COLS = 55
F_FLAT = H_ROWS * W_COLS


def _fold_bn(bn_params, bn_stats, eps: float = 1e-5):
    var = bn_stats["var"].astype(jnp.float32)
    mean = bn_stats["mean"].astype(jnp.float32)
    gamma = bn_params["scale"].astype(jnp.float32)
    beta = bn_params["bias"].astype(jnp.float32)
    scale = gamma * jax.lax.rsqrt(var + eps)
    return scale, beta - mean * scale


def pack_block_params(params, batch_stats, dtype=jnp.bfloat16):
    """Flax Bottleneck params -> flat operand list for bottleneck_block.

    Layout contract with models/i3d.py::Bottleneck: branch_a conv kernel
    (tk,1,1,Cin,P) with tk in {1,3}; branch_b (1,3,3,P,P); branch_c
    (1,1,1,P,4P); optional proj (1,1,1,Cin,4P). All matmul weights are
    (K, N) = (in, out) so the kernel contracts dim 0 of both operands.
    """
    def conv_kernel(name):
        return params[name]["conv"]["kernel"]

    def affine(name):
        s, b = _fold_bn(params[name]["bn"], batch_stats[name]["bn"])
        return s.reshape(-1, 1), b.reshape(-1, 1)

    wa = conv_kernel("branch_a")  # (tk,1,1,Cin,P)
    tk = wa.shape[0]
    cin, planes = wa.shape[3], wa.shape[4]
    if tk == 1:  # temporal kernel 1 == kernel 3 with zero outer taps
        wa = jnp.pad(wa, [(1, 1)] + [(0, 0)] * 4)
    wa3 = wa.reshape(3, cin, planes).astype(dtype)
    wb = conv_kernel("branch_b").reshape(9 * planes, planes).astype(dtype)
    wc = conv_kernel("branch_c").reshape(planes, 4 * planes).astype(dtype)
    sa, ba = affine("branch_a")
    sb, bb = affine("branch_b")
    sc, bc = affine("branch_c")
    operands = [wa3, wb, wc, sa, ba, sb, bb, sc, bc]
    if "proj" in params:
        wp = conv_kernel("proj").reshape(cin, 4 * planes).astype(dtype)
        sp, bp = affine("proj")
        operands += [wp, sp, bp]
    return operands


def flatten_nthwc(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, 55, 55, C) channels-last -> (B, T, C, F_FLAT) channels-first
    flat (padding the overhang row with zeros)."""
    x = jnp.transpose(x, (0, 1, 4, 2, 3))
    x = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (0, H_ROWS - 55), (0, 0)])
    return x.reshape(*x.shape[:3], F_FLAT)


def unflatten_ncf(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, C, F_FLAT) -> (B, T, 55, 55, C) channels-last."""
    x = x.reshape(*x.shape[:3], H_ROWS, W_COLS)[:, :, :, :55]
    return jnp.transpose(x, (0, 1, 3, 4, 2))


def _dot0(w, x, acc=jnp.float32):
    """(K, N) x (K, M) -> (N, M), contracting dim 0 of both."""
    return jax.lax.dot_general(
        w, x, (((0,), (0,)), ((), ())), preferred_element_type=acc
    )


def _shift_lanes(v, s):
    """shifted[m] = v[m + s] with circular wrap (wrap is masked by caller)."""
    if s == 0:
        return v
    return jnp.concatenate([v[:, s:], v[:, :s]], axis=1)


def _bottleneck_kernel(
    cur_ref, prev_ref, next_ref, wa_ref, wb_ref, wc_ref, sa_ref, ba_ref,
    sb_ref, bb_ref, sc_ref, bc_ref, *rest, t: int, has_proj: bool,
    acc_dtype,
):
    if has_proj:
        wp_ref, sp_ref, bp_ref, o_ref = rest
    else:
        (o_ref,) = rest
    ti = pl.program_id(1)
    cur = cur_ref[0, 0]  # (cin, F)
    cdt = cur.dtype

    # conv_a: temporal k3 pad 1 — the end frames see zeros
    ya = _dot0(wa_ref[1], cur, acc_dtype)
    prev = jnp.where(ti > 0, prev_ref[0, 0], 0).astype(cdt)
    nxt = jnp.where(ti < t - 1, next_ref[0, 0], 0).astype(cdt)
    ya = ya + _dot0(wa_ref[0], prev, acc_dtype)
    ya = ya + _dot0(wa_ref[2], nxt, acc_dtype)
    ya = jnp.maximum(
        ya.astype(jnp.float32) * sa_ref[:] + ba_ref[:], 0.0
    ).astype(cdt)  # (planes, F)

    # conv_b: 3x3 taps as masked lane-rotations; source (h+dh, w+dw) must
    # be a valid position (h' <= 54 also excludes the overhang row)
    flat = jax.lax.broadcasted_iota(jnp.int32, (1, F_FLAT), 1)
    hh = flat // W_COLS
    ww = flat % W_COLS
    planes = ya.shape[0]
    yb = None
    taps = [(dh, dw) for dh in (-1, 0, 1) for dw in (-1, 0, 1)]
    for g in range(3):  # K=3*planes groups keep the im2col scratch small
        group = []
        for dh, dw in taps[3 * g: 3 * g + 3]:
            shifted = _shift_lanes(ya, dh * W_COLS + dw)
            valid = (
                (hh + dh >= 0) & (hh + dh <= 54)
                & (ww + dw >= 0) & (ww + dw <= 54)
            )
            group.append(jnp.where(valid, shifted, 0).astype(cdt))
        im_g = jnp.concatenate(group, axis=0)  # (3*planes, F)
        part = _dot0(wb_ref[3 * planes * g: 3 * planes * (g + 1)], im_g,
                     acc_dtype)
        yb = part if yb is None else yb + part
    yb = jnp.maximum(
        yb.astype(jnp.float32) * sb_ref[:] + bb_ref[:], 0.0
    ).astype(cdt)  # (planes, F)

    z = _dot0(wc_ref[:], yb, acc_dtype).astype(jnp.float32)
    z = z * sc_ref[:] + bc_ref[:]
    if has_proj:
        r = _dot0(wp_ref[:], cur, acc_dtype).astype(jnp.float32)
        r = r * sp_ref[:] + bp_ref[:]
    else:
        r = cur.astype(jnp.float32)
    o_ref[0, 0] = jnp.maximum(z + r, 0.0).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("has_proj", "interpret", "out_dtype_name")
)
def bottleneck_block(
    x: jnp.ndarray,  # (B, T, Cin, F_FLAT) channels-first flat
    *operands,
    has_proj: bool = False,
    interpret: bool = False,
    out_dtype_name: str = "bfloat16",
) -> jnp.ndarray:
    """Apply one fused bottleneck block. operands = pack_block_params(...)."""
    b, t, cin, f = x.shape
    if f != F_FLAT:
        raise ValueError(f"expected flat spatial {F_FLAT}, got {f}")
    planes = operands[0].shape[-1]
    kernel = functools.partial(
        _bottleneck_kernel, t=t, has_proj=has_proj, acc_dtype=jnp.float32
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    frame = lambda fn: pl.BlockSpec(
        (1, 1, cin, f), fn, memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(b, t),
        in_specs=[
            frame(lambda i, j: (i, j, 0, 0)),
            frame(lambda i, j: (i, jnp.maximum(j - 1, 0), 0, 0)),
            frame(lambda i, j: (i, jnp.minimum(j + 1, t - 1), 0, 0)),
        ] + [full] * len(operands),
        out_specs=pl.BlockSpec((1, 1, 4 * planes, f),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b, t, 4 * planes, f), jnp.dtype(out_dtype_name)
        ),
        interpret=interpret,
    )(x, x, x, *operands)
