#!/usr/bin/env python
"""int8 Pallas lever for stage 2: measure it, ship it or kill it.

ROOFLINE.md round 3 left one lever unpulled (VERDICT r3 #3): the isolated
2D int8 conv runs 357 TF/s while XLA's 3D lowering manages ~120, and the
round-2 Pallas bottleneck losses were measured in bf16 where entry/exit
relayouts cost more than the kernels saved — int8 halves those bytes. This
probe answers, with on-chip numbers, whether a hand-written int8 Pallas
conv can beat XLA's int8 3D conv at the stage-2 bottleneck shape
(B=240, T=2, 28x28, 128 planes — the k(1,3,3) workhorse):

  A. raw int8 matmul rate INSIDE a Pallas kernel (dim-0-contracting 2D
     dot_general, int8 x int8 -> int32 — the only dot Mosaic accepts);
  B. the 3x3 conv as masked lane-rotation im2col in int8 (the proven
     bf16 bottleneck-kernel pattern, ops/pallas/bottleneck.py) on
     pre-laid-out (C, F) int8 activations — kernel-only time;
  C. B plus the production integration cost: channels-last bf16 in ->
     quantize -> channels-first flat int8 -> kernel -> back (what
     FeatureExtractor(quantize=True) would actually pay);
  D. the XLA baselines at the same shape: int8 and bf16
     conv_general_dilated k(1,3,3).

Run ALONE on the real chip (Pallas remote compiles take minutes):

    python scripts/int8_pallas_probe.py

Results are recorded in docs/ROOFLINE.md ("int8 Pallas lever" section).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

H = W = 28
F = H * W  # 784 flat spatial
PLANES = 128
B, T = 240, 2


def force(out):
    import jax.numpy as jnp

    return float(jnp.sum(out.astype(jnp.float32)))


def bench(fn, args, reps=20):
    out = fn(*args)
    force(out)
    t0 = time.time()
    for _ in range(3):
        force(out)
    fc = (time.time() - t0) / 3  # force/readback cost, subtracted
    for _ in range(3):
        out = fn(*args)
    force(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    force(out)
    return (time.time() - t0 - fc) / reps


def emit(rec):
    print(json.dumps(rec), flush=True)


def probe_raw_matmul(interpret=False):
    """A: int8 (K,N) x (K,M) dot inside Pallas, per-program, grid over B*T."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, N, M = 512, 256, F  # stage-2 temporal-conv-like contraction

    def kernel(x_ref, w_ref, o_ref):
        acc = jax.lax.dot_general(
            w_ref[:], x_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        o_ref[0] = acc

    @jax.jit
    def run(x, w):
        return pl.pallas_call(
            kernel,
            grid=(B * T,),
            in_specs=[
                pl.BlockSpec((1, K, M), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, N, M), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * T, N, M), jnp.int32),
            interpret=interpret,
        )(x, w)

    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (B * T, K, M), -127, 127, jnp.int8)
    w = jax.random.randint(key, (K, N), -127, 127, jnp.int8)
    dt = bench(run, (x, w))
    flops = 2.0 * B * T * K * N * M
    return {"probe": "A_pallas_int8_matmul", "ms": round(dt * 1000, 2),
            "tf_per_s": round(flops / dt / 1e12, 1)}


def _conv3x3_kernel(x_ref, w_ref, s_ref, o_ref, *, out_int8: bool):
    """3x3 spatial conv on one (C, F) plane: masked lane-rotation im2col
    (the bf16 bottleneck pattern) in int8 with int32 accumulation."""
    import jax
    import jax.numpy as jnp

    x = x_ref[0]  # (C, F) int8
    flat = jax.lax.broadcasted_iota(jnp.int32, (1, F), 1)
    hh = flat // W
    ww = flat % W

    def shift(v, s):
        # circular roll by s lanes (works for either sign; wrap positions
        # are masked invalid below) — ops/pallas/bottleneck.py:_shift_lanes
        if s == 0:
            return v
        return jnp.concatenate([v[:, s:], v[:, :s]], axis=1)

    taps = [(dh, dw) for dh in (-1, 0, 1) for dw in (-1, 0, 1)]
    acc = None
    for g in range(3):
        group = []
        for dh, dw in taps[3 * g: 3 * g + 3]:
            shifted = shift(x, dh * W + dw)
            valid = (
                (hh + dh >= 0) & (hh + dh < H)
                & (ww + dw >= 0) & (ww + dw < W)
            )
            group.append(jnp.where(valid, shifted, 0).astype(jnp.int8))
        im = jnp.concatenate(group, axis=0)  # (3C, F) int8
        part = jax.lax.dot_general(
            w_ref[3 * PLANES * g: 3 * PLANES * (g + 1)], im,
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.int32,
        )
        acc = part if acc is None else acc + part
    y = acc.astype(jnp.float32) * s_ref[:]
    if out_int8:
        # production epilogue: requantize so activations travel HBM as int8
        o_ref[0] = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
    else:
        o_ref[0] = y.astype(jnp.bfloat16)


def make_conv3x3(out_int8=True, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = functools.partial(_conv3x3_kernel, out_int8=out_int8)
    out_dtype = jnp.int8 if out_int8 else jnp.bfloat16

    @jax.jit
    def run(x, w, s):
        return pl.pallas_call(
            kernel,
            grid=(B * T,),
            in_specs=[
                pl.BlockSpec((1, PLANES, F), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, PLANES, F), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * T, PLANES, F), out_dtype),
            interpret=interpret,
        )(x, w, s)

    return run


def probe_conv_kernel(interpret=False):
    """B: kernel-only int8 3x3 conv on pre-laid-out activations."""
    import jax
    import jax.numpy as jnp

    run = make_conv3x3(out_int8=True, interpret=interpret)
    key = jax.random.PRNGKey(1)
    x = jax.random.randint(key, (B * T, PLANES, F), -127, 127, jnp.int8)
    w = jax.random.randint(key, (9 * PLANES, PLANES), -5, 5, jnp.int8)
    s = jnp.full((PLANES, 1), 1e-3, jnp.float32)
    dt = bench(run, (x, w, s))
    flops = 2.0 * B * T * 9 * PLANES * PLANES * F
    return {"probe": "B_pallas_int8_conv3x3_kernel_only",
            "ms": round(dt * 1000, 2),
            "tf_per_s": round(flops / dt / 1e12, 1)}


def probe_conv_integrated(interpret=False):
    """C: B plus quantize + layout in/out from channels-last bf16."""
    import jax
    import jax.numpy as jnp

    run = make_conv3x3(out_int8=False, interpret=interpret)

    @jax.jit
    def integrated(x_nhwc, w, s, act_scale):
        q = jnp.clip(
            jnp.round(x_nhwc.astype(jnp.float32) / act_scale), -127, 127
        ).astype(jnp.int8)
        flat = jnp.transpose(q, (0, 1, 4, 2, 3)).reshape(
            B * T, PLANES, F
        )
        y = run(flat, w, s)  # (B*T, C, F) bf16
        y = y.reshape(B, T, PLANES, H, W)
        return jnp.transpose(y, (0, 1, 3, 4, 2))

    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (B, T, H, W, PLANES), jnp.bfloat16)
    w = jax.random.randint(key, (9 * PLANES, PLANES), -5, 5, jnp.int8)
    s = jnp.full((PLANES, 1), 1e-3, jnp.float32)
    dt = bench(integrated, (x, w, s, jnp.float32(0.05)))
    flops = 2.0 * B * T * 9 * PLANES * PLANES * F
    return {"probe": "C_pallas_int8_conv3x3_with_layout",
            "ms": round(dt * 1000, 2),
            "tf_per_s": round(flops / dt / 1e12, 1)}


def probe_xla_baselines():
    """D: XLA conv_general_dilated k(1,3,3) at the same shape, both dtypes."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(3)
    out = []
    for dt_name in ("int8", "bf16"):
        if dt_name == "int8":
            x = jax.random.randint(
                key, (B, T, H, W, PLANES), -127, 127, jnp.int8
            )
            w = jax.random.randint(
                key, (1, 3, 3, PLANES, PLANES), -5, 5, jnp.int8
            )
            kwargs = {"preferred_element_type": jnp.int32}
        else:
            x = jax.random.normal(key, (B, T, H, W, PLANES), jnp.bfloat16)
            w = jax.random.normal(key, (1, 3, 3, PLANES, PLANES), jnp.bfloat16)
            kwargs = {}

        @jax.jit
        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1, 1), [(0, 0), (1, 1), (1, 1)],
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), **kwargs
            )

        dt = bench(conv, (x, w))
        flops = 2.0 * B * T * 9 * PLANES * PLANES * F
        out.append({
            "probe": f"D_xla_conv_k133_{dt_name}",
            "ms": round(dt * 1000, 2),
            "tf_per_s": round(flops / dt / 1e12, 1),
        })
    return out


def verify_kernel_correctness(n_rows: int = 4):
    """Interpret-mode check: the Pallas conv matches lax conv EXACTLY
    (int8 x int8 -> int32 is exact integer arithmetic). Row order contract:
    w row ``tap * C + c_in`` -> HWIO kernel ``[dh+1, dw+1, c_in, :]`` with
    taps in row-major (dh, dw) order. Called by tests/test_pallas.py."""
    import jax
    import jax.numpy as jnp

    global B, T
    old = (B, T)
    B, T = n_rows, 1
    try:
        run = make_conv3x3(out_int8=True, interpret=True)
        key = jax.random.PRNGKey(4)
        x = jax.random.randint(key, (n_rows, PLANES, F), -8, 8, jnp.int8)
        w = jax.random.randint(key, (9 * PLANES, PLANES), -3, 3, jnp.int8)
        s = jnp.full((PLANES, 1), 1.0, jnp.float32)
        got = np.asarray(run(x, w, s)).astype(np.int32)
    finally:
        B, T = old

    xs = np.transpose(
        np.asarray(x, np.float32).reshape(n_rows, PLANES, H, W),
        (0, 2, 3, 1),
    )  # NHWC
    wk = np.asarray(w, np.float32).reshape(3, 3, PLANES, PLANES)  # HWIO
    ref = jax.lax.conv_general_dilated(
        xs, wk, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    ref = np.transpose(np.asarray(ref), (0, 3, 1, 2)).reshape(
        n_rows, PLANES, F
    )
    np.testing.assert_array_equal(got, np.clip(np.round(ref), -127, 127))
    return True


def main():
    import jax

    if "--verify" in sys.argv:
        verify_kernel_correctness()
        emit({"verify": "ok"})
        return
    emit({"device": jax.devices()[0].device_kind})
    for probe in (probe_raw_matmul, probe_conv_kernel,
                  probe_conv_integrated):
        try:
            emit(probe())
        except Exception as exc:
            emit({"probe": probe.__name__, "error": str(exc)[:500]})
    for rec in probe_xla_baselines():
        emit(rec)


if __name__ == "__main__":
    main()
