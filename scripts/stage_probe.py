#!/usr/bin/env python
"""Round-3 TPU perf probes (VERDICT r2 #3): the unexplored half of the gap.

Sections (each prints one JSON line, all guarded — a failed probe reports
instead of killing the run):
  1. stage-by-stage ablation of stages 1-4 (standalone jits at the real
     activation shapes, B=240 bf16): ms, XLA-cost FLOPs, bytes, MFU —
     extends docs/ROOFLINE.md's stem/stage-1 table to the full forward.
  2. batch sweep of the production extract pipeline (240 vs 480):
     amortization headroom.
  3. int8 microprobes: can this toolchain's conv/matmul path hit the 2x
     int8 MXU peak at all (guarding the known int-compile pathologies)?

Measurement rules (memory: tpu-bench-gotchas): dispatch N reps, force ONE
full-f32-sum readback, subtract the separately measured force cost;
block_until_ready lies under the axon tunnel; no sliced readbacks (DCE).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def emit(record):
    print(json.dumps(record), flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from anomaly_detection_on_video_tpu.models.i3d import Bottleneck

    PEAK = 197e12

    def force(out):
        return float(jnp.sum(out.astype(jnp.float32)))

    def force_cost(out, reps=3):
        force(out)
        t0 = time.time()
        for _ in range(reps):
            force(out)
        return (time.time() - t0) / reps

    def bench(fn, args, reps=20):
        out = fn(*args)  # compile
        fc = force_cost(out)
        for _ in range(3):
            out = fn(*args)
        force(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        force(out)
        dt = time.time() - t0 - fc
        return dt / reps, out

    def cost(fn, args):
        c = fn.lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))

    B = 240

    # ----- section 1: per-stage ablation ---------------------------------
    class StageOnly(nn.Module):
        planes: int
        blocks: int
        stride: int
        tks: tuple

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
                    name=f"block{i}",
                )(x)
            return x

    # (planes, blocks, stride, tks, input shape after the previous stage)
    stage_specs = {
        1: (64, 3, 1, (3, 3, 3), (B, 4, 55, 55, 64)),
        2: (128, 4, 2, (3, 1, 3, 1), (B, 2, 55, 55, 256)),
        3: (256, 6, 2, (3, 1, 3, 1, 3, 1), (B, 2, 28, 28, 512)),
        4: (512, 3, 2, (1, 3, 1), (B, 2, 14, 14, 1024)),
    }
    key = jax.random.PRNGKey(0)
    for stage, (planes, blocks, stride, tks, shape) in stage_specs.items():
        try:
            model = StageOnly(planes, blocks, stride, tks)
            x = jax.random.normal(key, shape, jnp.bfloat16)
            variables = jax.jit(model.init)(key, x)
            fn = jax.jit(model.apply)
            ms, _ = bench(fn, (variables, x))
            flops, byts = cost(fn, (variables, x))
            emit({
                "probe": f"stage{stage}", "ms": round(ms * 1e3, 2),
                "tflop": round(flops / 1e12, 3),
                "gb": round(byts / 1e9, 2),
                "mfu": round(flops / ms / PEAK, 3),
                "hbm_gbps": round(byts / ms / 1e9, 1),
            })
        except Exception as exc:
            emit({"probe": f"stage{stage}", "error": repr(exc)[:300]})

    # ----- section 2: batch sweep of the production pipeline -------------
    from anomaly_detection_on_video_tpu.data.extraction import FeatureExtractor

    rng = np.random.RandomState(0)
    for batch in (240, 480):
        try:
            n_clips = (batch // 10) * 2  # two lax.map groups
            frames = rng.randint(
                0, 256, (n_clips * 16, 240, 320, 3), np.uint8
            )
            ex = FeatureExtractor(dtype=jnp.bfloat16, batch=batch)
            padded = jax.device_put(ex.pad_frames(frames))
            fn = ex._extract
            ms, _ = bench(fn, (ex.variables, padded), reps=10)
            emit({
                "probe": f"pipeline_batch{batch}",
                "ms_per_chunk": round(ms * 1e3, 1),
                "clips_per_sec": round(n_clips / ms, 1),
            })
            del ex, padded
        except Exception as exc:
            emit({"probe": f"pipeline_batch{batch}", "error": repr(exc)[:300]})

    # ----- section 3: int8 microprobes -----------------------------------
    M, K, N = 8192, 2048, 2048
    a8 = jax.random.randint(key, (M, K), -127, 127, jnp.int8)
    b8 = jax.random.randint(key, (K, N), -127, 127, jnp.int8)
    abf = a8.astype(jnp.bfloat16)
    bbf = b8.astype(jnp.bfloat16)

    @jax.jit
    def mm_int8(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    @jax.jit
    def mm_bf16(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())))

    for name, fn, args in (
        ("matmul_bf16", mm_bf16, (abf, bbf)),
        ("matmul_int8", mm_int8, (a8, b8)),
    ):
        try:
            ms, _ = bench(fn, args, reps=50)
            emit({
                "probe": name, "us": round(ms * 1e6, 1),
                "tflops_rate": round(2 * M * K * N / ms / 1e12, 1),
            })
        except Exception as exc:
            emit({"probe": name, "error": repr(exc)[:300]})

    # int8 conv at a stage-2 shape (the healthy-MFU regime int8 would boost)
    x8 = jax.random.randint(key, (B * 2, 28, 28, 512), -127, 127, jnp.int8)
    w8 = jax.random.randint(key, (3, 3, 512, 128), -127, 127, jnp.int8)

    @jax.jit
    def conv_int8(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )

    @jax.jit
    def conv_bf16(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    for name, fn, args in (
        ("conv_bf16", conv_bf16, (x8.astype(jnp.bfloat16), w8.astype(jnp.bfloat16))),
        ("conv_int8", conv_int8, (x8, w8)),
    ):
        try:
            ms, _ = bench(fn, args, reps=30)
            flops = 2 * x8.shape[0] * 28 * 28 * 512 * 128 * 9
            emit({
                "probe": name, "ms": round(ms * 1e3, 2),
                "tflops_rate": round(flops / ms / 1e12, 1),
            })
        except Exception as exc:
            emit({"probe": name, "error": repr(exc)[:300]})


if __name__ == "__main__":
    main()
