#!/usr/bin/env python
"""Benchmark: I3D feature-extraction throughput (clips/sec/chip) on TPU.

Prints ONE JSON line:
    {"metric": "i3d_extraction_clips_per_sec_per_chip", "value": N,
     "unit": "clips/s", "vs_baseline": N}

Workload: the BASELINE.json config-1 shape — 16-frame clips at 224x224 under
the 10-crop protocol, full device pipeline (fused resize/ten-crop/normalize
preprocessing + batched (clips x crops) I3D forward), bf16 compute / f32
features, steady state with forced readback (block_until_ready is unreliable
under the axon tunnel, so completion is forced via a scalar fetch).

Baseline: A100 estimate for the reference implementation (torch fp32/TF32
I3D-R50 with its sequential 10-crop loop, extract_features.py:85-89)
~= 100 clips/s/chip (10 crop-forwards per clip at ~1000 crop-fwd/s).
"""

from __future__ import annotations

import json
import time

import numpy as np

A100_BASELINE_CLIPS_PER_SEC = 100.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from anomaly_detection_on_video_tpu.data.extraction import FeatureExtractor

    # 240x320 frames (the dominant UCF-Crime resolution); 94 clips per chunk
    n_clips = 94
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, (n_clips * 16, 240, 320, 3), np.uint8)

    extractor = FeatureExtractor(dtype=jnp.bfloat16)

    # warmup + compile
    feats = extractor.extract_frames(frames)
    assert feats.shape == (n_clips, 10, 2048), feats.shape

    x = jax.device_put(extractor.pad_frames(frames))
    # settle: the first post-compile dispatches are slow (backend autotune /
    # cache writes); sync a few rounds before measuring
    for _ in range(3):
        out = extractor._extract(extractor.variables, x)
        float(jnp.sum(out[0]))
    reps = 10
    # dispatch all reps, force completion once: per-call readbacks would
    # measure the axon tunnel's ~350 ms RTT instead of the device
    out = None
    t0 = time.time()
    for _ in range(reps):
        out = extractor._extract(extractor.variables, x)
    float(jnp.sum(out[0]))
    dt = time.time() - t0
    clips_per_sec = reps * n_clips / dt

    print(
        json.dumps(
            {
                "metric": "i3d_extraction_clips_per_sec_per_chip",
                "value": round(clips_per_sec, 2),
                "unit": "clips/s",
                "vs_baseline": round(clips_per_sec / A100_BASELINE_CLIPS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
