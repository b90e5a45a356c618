#!/usr/bin/env python
"""Stem reformulation probe: k(5,7,7) s(2,2,2) 3D conv vs the stride-2
temporal decomposition as ONE 2D conv (5 shifted frame views stacked into
channels, cin=15, k(7,7) s(2,2)).

Round 2 probed a cin=21 variant (7 padded taps) at 67.8 ms — worse than
3D's ~43 ms. This is the tighter formulation: only the 5 real taps, strided
slices (no gather), VALID padding. Same MAC set as the 3D stem.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    import jax
    import jax.numpy as jnp

    def force(out):
        return float(jnp.sum(out.astype(jnp.float32)))

    def bench(fn, args, reps=15):
        out = fn(*args)
        force(out)
        t0 = time.time()
        for _ in range(3):
            force(out)
        fc = (time.time() - t0) / 3
        for _ in range(3):
            out = fn(*args)
        force(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        force(out)
        return (time.time() - t0 - fc) / reps

    emit = lambda r: print(json.dumps(r), flush=True)
    key = jax.random.PRNGKey(0)
    B = 240
    w = jax.random.normal(key, (5, 7, 7, 3, 64), jnp.bfloat16)
    flops = 2 * B * 8 * 112 * 112 * 64 * (5 * 7 * 7 * 3)

    @jax.jit
    def stem3d(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (2, 2, 2), [(2, 2), (3, 3), (3, 3)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    @jax.jit
    def stem2d(x, w):
        xp = jnp.pad(x, ((0, 0), (2, 2), (3, 3), (3, 3), (0, 0)))
        # output frame t' sums taps xp[2t'+dt], dt=0..4: strided slices
        views = [xp[:, dt : dt + 16 : 2] for dt in range(5)]  # 5 x (B,8,...)
        stacked = jnp.concatenate(views, axis=-1)  # (B, 8, 230, 230, 15)
        b, t = stacked.shape[:2]
        flat = stacked.reshape(b * t, 230, 230, 15)
        w2 = jnp.concatenate(
            [w[dt] for dt in range(5)], axis=-2
        )  # (7, 7, 15, 64)
        y = jax.lax.conv_general_dilated(
            flat, w2, (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y.reshape(b, t, 112, 112, 64)

    # Exactness check in f32 at a small batch (bf16 differs by accumulation
    # order; f32 shows whether the MAC set itself matches)
    xs = jax.random.normal(key, (2, 16, 224, 224, 3), jnp.float32)
    ws = w.astype(jnp.float32)
    r3, r2 = stem3d(xs, ws), stem2d(xs, ws)
    err = float(jnp.max(jnp.abs(r3 - r2)))
    rel = err / float(jnp.max(jnp.abs(r3)))
    emit({"probe": "stem2d_vs_3d_f32", "max_abs_err": err,
          "max_rel_to_peak": round(rel, 8)})
    del xs, ws, r3, r2

    # B=240 stem2d OOMs (the cin=15 stacked intermediate + output exceed
    # HBM next to the input); A/B both at B=120 for a like-for-like ratio,
    # plus stem3d at the production B=240.
    for b in (120, 240):
        x = jax.random.normal(key, (b, 16, 224, 224, 3), jnp.bfloat16)
        fl = flops * b // B
        variants = [("stem3d_bf16", stem3d)]
        if b == 120:
            variants.append(("stem2d_bf16", stem2d))
        for name, fn in variants:
            ms = bench(fn, (x, w))
            emit({"probe": f"{name}_B{b}", "ms": round(ms * 1e3, 2),
                  "tflops_rate": round(fl / ms / 1e12, 1)})
        del x


if __name__ == "__main__":
    main()
