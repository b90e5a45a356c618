"""TV-L1 dense optical flow on the TPU (duality-based, Zach et al. 2007).

The original two-stream I3D protocol (Carreira & Zisserman, CVPR 2017)
computes its flow stream with TV-L1, not Farneback; the reference repo
ships RGB-only (src/i3d.py builds one stream, extract_features.py:85-89
runs it on RGB), so this module — like ops/flow.py — extends the
framework to the full two-stream recipe. The host OpenCV build has no
TV-L1 (it lives in opencv-contrib), so this is a from-scratch JAX
implementation of the duality-based algorithm; numerics follow the IPOL
reference description (Sanchez et al., "TV-L1 Optical Flow Estimation",
IPOL 2013): per pyramid level, repeatedly warp the second frame and its
gradients to the current flow, then alternate

- a pointwise thresholding step on the linearized residual
  rho(u) = I1(x + u0) + (u - u0) . grad(I1) - I0, which solves the L1
  data term exactly (three cases: +/- lambda*theta*grad, or the exact
  zero-crossing), and
- a Chambolle-style projected dual ascent on the TV term:
  u = v + theta * div(p), p <- (p + (tau/theta) grad(u)) / (1 + (tau/theta)|grad(u)|).

TPU mapping: the inner iterations are pure VPU stencils (forward
differences / divergence as shifted subtracts) inside a lax.fori_loop;
the only expensive op class is the bilinear warp (a gather, which TPUs
execute near-serially), so warps are scheduled like ops/flow.py's
ITERATIONS: few at the fine levels, more at the cheap coarse levels.
[I1, I1x, I1y] pack into one 3-channel field so each warp is a single
gather. No per-warp median filter (OpenCV's variant adds one; the IPOL
algorithm does not) — documented divergence from cv2, not an accident.

Accuracy is asserted against ground-truth synthetic motion
(tests/test_tvl1.py): sub-pixel recovery of translations, and the
TV-prior's signature sharp motion boundary on piecewise-constant motion.
Output contract matches data/flow.compute_flow and ops/flow.compute_flow_device:
frame 0 gets zero flow, truncate to [-bound, bound], scale to [-1, 1].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .flow import FLOW_BOUND, _bilinear_warp, _downsample

TAU = 0.25  # dual ascent step
LAMBDA = 0.15  # data-term weight (images in [0, 255], IPOL convention)
THETA = 0.3  # coupling between the data and TV sub-problems
LEVELS = 4
PYR_SCALE = 0.5
# warps per level, fine -> coarse. Each warp is one gather over the
# 3-channel [I1, I1x, I1y] field — the dominant cost (see module doc) —
# and most of the displacement is already resolved at the coarse levels,
# so fine levels only need a couple of refinement warps.
WARPS = (2, 3, 5, 5)
INNER_ITERATIONS = 30  # fixed count (jit) instead of IPOL's eps-stopping
GRAD_EPS = 1e-8  # treat |grad|^2 below this as textureless (v = u)


def _forward_gradient(u: jnp.ndarray):
    """(B, H, W) -> forward differences (ux, uy), zero at the far edge."""
    ux = jnp.concatenate(
        [u[:, :, 1:] - u[:, :, :-1], jnp.zeros_like(u[:, :, :1])], axis=2
    )
    uy = jnp.concatenate(
        [u[:, 1:, :] - u[:, :-1, :], jnp.zeros_like(u[:, :1, :])], axis=1
    )
    return ux, uy


def _divergence(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """Discrete divergence, the negative adjoint of _forward_gradient.

    Backward differences with the standard boundary rule (first row/col
    keep the value; the far edge is handled for free because
    _forward_gradient zeroes the last column/row, so p stays zero there).
    """
    d1 = jnp.concatenate([p1[:, :, :1], p1[:, :, 1:] - p1[:, :, :-1]], axis=2)
    d2 = jnp.concatenate([p2[:, :1, :], p2[:, 1:, :] - p2[:, :-1, :]], axis=1)
    return d1 + d2


def _central_gradient(img: jnp.ndarray):
    """(B, H, W) centered differences, one-sided (halved) at the borders."""
    pad_x = jnp.pad(img, ((0, 0), (0, 0), (1, 1)), mode="edge")
    pad_y = jnp.pad(img, ((0, 0), (1, 1), (0, 0)), mode="edge")
    gx = 0.5 * (pad_x[:, :, 2:] - pad_x[:, :, :-2])
    gy = 0.5 * (pad_y[:, 2:, :] - pad_y[:, :-2, :])
    return gx, gy


def _tvl1_level(i0, i1, flow, warps: int, inner: int):
    """Run TV-L1 at one pyramid level.

    i0, i1: (B, H, W) grayscale; flow: (B, H, W, 2) (dx, dy) initial
    estimate. Returns the refined flow.
    """
    l_t = LAMBDA * THETA
    taut = TAU / THETA
    g1x, g1y = _central_gradient(i1)
    field = jnp.stack([i1, g1x, g1y], axis=-1)  # one gather per warp
    p = jnp.zeros((*flow.shape[:3], 4), jnp.float32)  # p1x p1y p2x p2y

    for _ in range(warps):
        warped = _bilinear_warp(field, flow)
        i1w, i1wx, i1wy = warped[..., 0], warped[..., 1], warped[..., 2]
        grad2 = i1wx * i1wx + i1wy * i1wy
        # residual at the warp point: rho(u) = rho_c + grad . u
        rho_c = i1w - i1wx * flow[..., 0] - i1wy * flow[..., 1] - i0

        def body(_, carry, i1wx=i1wx, i1wy=i1wy, grad2=grad2, rho_c=rho_c):
            u, p = carry
            rho = rho_c + i1wx * u[..., 0] + i1wy * u[..., 1]
            # exact minimizer of lambda|rho(v)| + |v - u|^2 / (2 theta):
            # step +/- l_t along grad, or jump to the zero crossing
            step = jnp.where(
                rho < -l_t * grad2,
                l_t,
                jnp.where(
                    rho > l_t * grad2, -l_t, -rho / jnp.maximum(grad2, GRAD_EPS)
                ),
            )
            step = jnp.where(grad2 > GRAD_EPS, step, 0.0)
            v1 = u[..., 0] + step * i1wx
            v2 = u[..., 1] + step * i1wy
            u1 = v1 + THETA * _divergence(p[..., 0], p[..., 1])
            u2 = v2 + THETA * _divergence(p[..., 2], p[..., 3])
            u1x, u1y = _forward_gradient(u1)
            u2x, u2y = _forward_gradient(u2)
            n1 = 1.0 + taut * jnp.sqrt(u1x * u1x + u1y * u1y)
            n2 = 1.0 + taut * jnp.sqrt(u2x * u2x + u2y * u2y)
            p = jnp.stack(
                [
                    (p[..., 0] + taut * u1x) / n1,
                    (p[..., 1] + taut * u1y) / n1,
                    (p[..., 2] + taut * u2x) / n2,
                    (p[..., 3] + taut * u2y) / n2,
                ],
                axis=-1,
            )
            return jnp.stack([u1, u2], axis=-1), p

        flow, p = lax.fori_loop(0, inner, body, (flow, p))
    return flow


def _flow_pair_batch_tvl1(prev: jnp.ndarray, cur: jnp.ndarray) -> jnp.ndarray:
    """Dense TV-L1 flow for grayscale pairs (B, H, W) -> (B, H, W, 2) px."""
    pyr_prev, pyr_cur = [prev], [cur]
    for _ in range(LEVELS - 1):
        pyr_prev.append(_downsample(pyr_prev[-1]))
        pyr_cur.append(_downsample(pyr_cur[-1]))

    flow = jnp.zeros((*pyr_prev[-1].shape, 2), jnp.float32)
    for level in reversed(range(LEVELS)):
        p, c = pyr_prev[level], pyr_cur[level]
        if flow.shape[1:3] != p.shape[1:3]:
            flow = jax.image.resize(
                flow, (flow.shape[0], *p.shape[1:3], 2), method="bilinear"
            ) / PYR_SCALE
        flow = _tvl1_level(p, c, flow, WARPS[level], INNER_ITERATIONS)
    return flow


@functools.partial(jax.jit, static_argnames=("bound",))
def compute_flow_tvl1(
    frames: jnp.ndarray, bound: float = FLOW_BOUND
) -> jnp.ndarray:
    """uint8 RGB (N, H, W, 3) -> float32 TV-L1 flow (N, H, W, 2) in [-1, 1].

    Same output contract as data/flow.compute_flow and
    ops/flow.compute_flow_device: frame 0 gets zero flow (chunk-boundary
    framing matches the RGB stream), truncation to [-bound, bound], scale
    to [-1, 1].
    """
    rgb = frames.astype(jnp.float32)
    # ITU-R BT.601 luma (cv2.cvtColor RGB2GRAY weights), kept in [0, 255]
    # — LAMBDA follows the IPOL convention for that range
    gray = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    flows = _flow_pair_batch_tvl1(gray[:-1], gray[1:])
    zero = jnp.zeros((1, *gray.shape[1:], 2), jnp.float32)
    out = jnp.concatenate([zero, flows], axis=0)
    return jnp.clip(out, -bound, bound) / bound
