#!/usr/bin/env python
"""A/B probe: XLA 3D convs vs the same math expressed as 2D convs (round 3).

The int8 diagnostics showed 3D convs stuck near ~100 TF/s bf16 where the
2D NHWC path hits ~200 (and ~357 int8). Every I3D conv is (kt,1,1),
(1,kh,kw) or 1x1x1, so each maps to a 2D conv via a free reshape
(leading-dim merge for spatial, trailing HW merge for temporal). Measures
each pair with the reshapes INSIDE the jit — the integration-real cost.
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

    def bench(fn, args, reps=30):
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

    def run(name, fn, x, w, flops):
        try:
            jfn = jax.jit(fn)
            ms = bench(jfn, (x, w))
            emit({"probe": name, "ms": round(ms * 1e3, 2),
                  "tflops_rate": round(flops / ms / 1e12, 1)})
        except Exception as exc:
            emit({"probe": name, "error": repr(exc)[:200]})

    def conv(nd, x, w, strides, pad, **kw):
        dn = ("NDHWC", "DHWIO", "NDHWC") if nd == 3 else ("NHWC", "HWIO", "NHWC")
        return jax.lax.conv_general_dilated(
            x, w, strides, pad, dimension_numbers=dn, **kw)

    cases = []
    # spatial k(1,3,3) at stage-1/2/3 shapes
    for tag, (xs, cin, cout) in {
        "s1_spatial": ((B, 4, 55, 55, 64), 64, 64),
        "s2_spatial": ((B, 2, 28, 28, 128), 128, 128),
        "s3_spatial": ((B, 2, 14, 14, 256), 256, 256),
    }.items():
        flops = 2 * np.prod(xs[:4]) * cin * cout * 9
        cases.append((tag, xs, cin, cout, flops))

    for tag, xs, cin, cout, flops in cases:
        for dt in ("bf16", "int8"):
            if dt == "bf16":
                x = jax.random.normal(key, xs, jnp.bfloat16)
                w3 = jax.random.normal(key, (1, 3, 3, cin, cout), jnp.bfloat16)
                kw = {}
            else:
                x = jax.random.randint(key, xs, -127, 127, jnp.int8)
                w3 = jax.random.randint(
                    key, (1, 3, 3, cin, cout), -127, 127, jnp.int8)
                kw = {"preferred_element_type": jnp.int32}

            run(f"{tag}_3d_{dt}",
                lambda x, w: conv(3, x, w, (1, 1, 1),
                                  [(0, 0), (1, 1), (1, 1)], **kw),
                x, w3, flops)

            def f2d(x, w):
                b, t, h, wd, c = x.shape
                y = conv(2, x.reshape(b * t, h, wd, c), w.reshape(w.shape[1:]),
                         (1, 1), [(1, 1), (1, 1)], **kw)
                return y.reshape(b, t, h, wd, -1)

            run(f"{tag}_2d_{dt}", f2d, x, w3, flops)

    # temporal k(3,1,1) at stage-2 shape
    xs, cin, cout = (B, 2, 28, 28, 512), 512, 128
    flops = 2 * np.prod(xs[:4]) * cin * cout * 3
    for dt in ("bf16", "int8"):
        if dt == "bf16":
            x = jax.random.normal(key, xs, jnp.bfloat16)
            w3 = jax.random.normal(key, (3, 1, 1, cin, cout), jnp.bfloat16)
            kw = {}
        else:
            x = jax.random.randint(key, xs, -127, 127, jnp.int8)
            w3 = jax.random.randint(key, (3, 1, 1, cin, cout), -127, 127, jnp.int8)
            kw = {"preferred_element_type": jnp.int32}

        run(f"s2_temporal_3d_{dt}",
            lambda x, w: conv(3, x, w, (1, 1, 1),
                              [(1, 1), (0, 0), (0, 0)], **kw),
            x, w3, flops)

        def t2d(x, w):
            b, t, h, wd, c = x.shape
            y = conv(2, x.reshape(b, t, h * wd, c), w.reshape(3, 1, cin, -1),
                     (1, 1), [(1, 1), (0, 0)], **kw)
            return y.reshape(b, t, h, wd, -1)

        run(f"s2_temporal_2d_{dt}", t2d, x, w3, flops)


if __name__ == "__main__":
    main()
