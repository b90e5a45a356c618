#!/usr/bin/env python
"""Measure the int8 extraction pipeline vs bf16 on the real chip (round 3).

Prints JSON lines: bf16 pipeline clips/s, int8 pipeline clips/s, and the
feature agreement (cosine / max rel) between them on the same frames.
Measurement rules per memory:tpu-bench-gotchas (dispatch N, force one
full-sum readback, subtract the force cost).
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

    from anomaly_detection_on_video_tpu.data.extraction import FeatureExtractor

    def force(out):
        return float(jnp.sum(out.astype(jnp.float32)))

    def bench(fn, args, reps=10):
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

    n_clips = 94
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, (n_clips * 16, 240, 320, 3), np.uint8)

    base = FeatureExtractor(dtype=jnp.bfloat16)
    ref = base.extract_frames(frames)
    x = jax.device_put(base.pad_frames(frames))
    ms = bench(base._extract, (base.variables, x))
    emit = lambda r: print(json.dumps(r), flush=True)
    emit({
        "probe": "pipeline_bf16", "ms_per_chunk": round(ms * 1e3, 1),
        "clips_per_sec": round(n_clips / ms, 1),
    })

    quant = FeatureExtractor(
        dtype=jnp.bfloat16, variables=base.variables, quantize=True
    )
    out = quant.extract_frames(frames)  # calibrates + compiles
    cos = float(
        np.sum(ref * out) / (np.linalg.norm(ref) * np.linalg.norm(out))
    )
    rel = float(np.max(np.abs(ref - out)) / np.max(np.abs(ref)))
    ms_q = bench(quant._extract, (quant.variables, x))
    emit({
        "probe": "pipeline_int8", "ms_per_chunk": round(ms_q * 1e3, 1),
        "clips_per_sec": round(n_clips / ms_q, 1),
        "cosine_vs_bf16": round(cos, 6), "max_rel_vs_bf16": round(rel, 5),
        "speedup": round(ms / ms_q, 3),
    })


if __name__ == "__main__":
    main()
