#!/usr/bin/env python
"""Isolate the int8 gains per section: 3D conv microprobes + per-stage
int8 vs bf16 (round-3 follow-up to scripts/int8_probe.py's modest +8% e2e).
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
    from flax import linen as nn

    from anomaly_detection_on_video_tpu.models.i3d import (
        Bottleneck,
        calibrate_act_scales,
    )

    def force(out):
        return float(jnp.sum(out.astype(jnp.float32)))

    def bench(fn, args, reps=20):
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

    # --- 3D conv microprobes (NDHWC): does int8 get the fast path in 3D? --
    shapes = {
        "stage2_spatial_k133": ((B, 2, 28, 28, 128), (1, 3, 3, 128, 128)),
        "stage2_temporal_k311": ((B, 2, 28, 28, 512), (3, 1, 1, 512, 128)),
        "stem_k577": ((B, 16, 224, 224, 3), (5, 7, 7, 3, 64)),
    }
    for name, (xs, ws) in shapes.items():
        stride = (2, 2, 2) if name.startswith("stem") else (1, 1, 1)
        pad = [(k // 2, k // 2) for k in ws[:3]]
        for dt in ("bf16", "int8"):
            try:
                if dt == "bf16":
                    x = jax.random.normal(key, xs, jnp.bfloat16)
                    w = jax.random.normal(key, ws, jnp.bfloat16)
                    kwargs = {}
                else:
                    x = jax.random.randint(key, xs, -127, 127, jnp.int8)
                    w = jax.random.randint(key, ws, -127, 127, jnp.int8)
                    kwargs = {"preferred_element_type": jnp.int32}

                @jax.jit
                def conv(x, w):
                    return jax.lax.conv_general_dilated(
                        x, w, stride, pad,
                        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                        **kwargs,
                    )

                ms = bench(conv, (x, w))
                out_elems = np.prod(conv(x, w).shape[:-1])
                flops = 2 * out_elems * np.prod(ws[:4]) * ws[4]
                emit({
                    "probe": f"conv3d_{name}_{dt}",
                    "ms": round(ms * 1e3, 2),
                    "tflops_rate": round(flops / ms / 1e12, 1),
                })
                del x, w
            except Exception as exc:
                emit({"probe": f"conv3d_{name}_{dt}", "error": repr(exc)[:200]})

    # --- per-stage int8 vs bf16 through the real Bottleneck modules -------
    class StageOnly(nn.Module):
        planes: int
        blocks: int
        stride: int
        tks: tuple
        act_scales: object = None

        @nn.compact
        def __call__(self, x):
            for i in range(self.blocks):
                first = i == 0
                x = Bottleneck(
                    planes=self.planes,
                    spatial_stride=self.stride if first else 1,
                    temp_kernel=self.tks[i],
                    has_proj=first,
                    dtype=jnp.bfloat16,
                    act_scales=self.act_scales,
                    name=f"block{i}",
                )(x)
            return x

    stage_specs = {
        1: (64, 3, 1, (3, 3, 3), (B, 4, 55, 55, 64)),
        2: (128, 4, 2, (3, 1, 3, 1), (B, 2, 55, 55, 256)),
    }
    for stage, (planes, blocks, stride, tks, shape) in stage_specs.items():
        try:
            base = StageOnly(planes, blocks, stride, tks)
            x = jax.random.normal(key, shape, jnp.bfloat16)
            variables = jax.jit(base.init)(key, x)
            scales = calibrate_act_scales(base, variables, x)
            quant = StageOnly(planes, blocks, stride, tks, act_scales=scales)
            fn = jax.jit(quant.apply)
            ms = bench(fn, (variables, x))
            emit({
                "probe": f"stage{stage}_int8", "ms": round(ms * 1e3, 2),
            })
        except Exception as exc:
            emit({"probe": f"stage{stage}_int8", "error": repr(exc)[:200]})


if __name__ == "__main__":
    main()
