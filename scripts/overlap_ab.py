#!/usr/bin/env python
"""Interleaved A/B: serial per-chunk extraction vs the 1-deep dispatch
pipeline, same videos, same process (round 3, VERDICT #4 'measured e2e
gain'). Interleaving S/P repetitions bounds the host-noise problem (this
VM's decode rate swings 4-38 clips/s across minutes); medians reported.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    import cv2
    import jax.numpy as jnp

    from anomaly_detection_on_video_tpu.data.extraction import FeatureExtractor
    from anomaly_detection_on_video_tpu.data.video import VideoFrameSource

    rng = np.random.RandomState(1)
    tmp = tempfile.mkdtemp()
    path = os.path.join(tmp, "v.avi")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30.0, (320, 240))
    base = rng.randint(0, 256, (240, 320, 3), np.uint8)
    n_frames = 6 * 256
    for _ in range(n_frames):
        base = np.clip(
            base.astype(np.int16) + rng.randint(-12, 13, base.shape, np.int16),
            0, 255,
        ).astype(np.uint8)
        writer.write(base)
    writer.release()

    ex = FeatureExtractor(dtype=jnp.bfloat16)
    # warm both the per-chunk compile and the transfer path
    ex.extract_frames(rng.randint(0, 256, (256, 240, 320, 3), np.uint8))

    def run_serial():
        outs = []
        for chunk in VideoFrameSource(path, 256):
            outs.append(ex.extract_frames(chunk))  # dispatch + block
        return np.vstack(outs)

    def run_pipelined():
        return ex.extract_video(path, chunk_frames=256)

    times = {"serial": [], "pipelined": []}
    ref = None
    for rep in range(4):
        for name, fn in (("serial", run_serial), ("pipelined", run_pipelined)):
            t0 = time.time()
            out = fn()
            times[name].append(time.time() - t0)
            if ref is None:
                ref = out
            else:
                np.testing.assert_array_equal(ref, out)  # bit-equal modes

    n_clips = n_frames // 16
    med = {k: float(np.median(v)) for k, v in times.items()}
    print(json.dumps({
        "probe": "overlap_ab",
        "serial_s": [round(t, 2) for t in times["serial"]],
        "pipelined_s": [round(t, 2) for t in times["pipelined"]],
        "median_serial_clips_per_sec": round(n_clips / med["serial"], 2),
        "median_pipelined_clips_per_sec": round(n_clips / med["pipelined"], 2),
        "median_speedup": round(med["serial"] / med["pipelined"], 3),
    }), flush=True)


if __name__ == "__main__":
    main()
