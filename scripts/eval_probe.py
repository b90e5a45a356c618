#!/usr/bin/env python
"""Eval-path roofline: split eval throughput into host-assembly vs device.

VERDICT r4 weak #5: `eval_clips_per_sec` (385.6 in BENCH_r04) had no
measured split saying where the time goes. This probe times, on the same
workload as `bench.py`'s eval field (24 videos x 30 clips, MGFN reference
dims, batch_videos=8, pad_groups):

- assemble_only_s   — running the group-assembly generator to exhaustion
                      with no device work (pure host: np.zeros + copies);
- eval_serial_s     — full evaluate() with prefetch_assembly=False
                      (assembly serialized between dispatches);
- eval_prefetch_s   — full evaluate() with the default worker-thread
                      assembly (data/prefetch.py, depth 2);

each min-of-2 (this host swings 1.5-2x run-to-run). The serial-minus-
assembly difference approximates dispatch + readback + AUC; the
prefetch-vs-serial delta is what overlapping assembly actually buys.
Results recorded in docs/ROOFLINE.md ("eval roofline").

Run ALONE on the TPU (host contention poisons every number here):
    python scripts/eval_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

N_VIDEOS = 24
CLIPS = 30
BATCH_VIDEOS = 8


def build_state_and_dataset():
    import jax
    import jax.numpy as jnp

    from anomaly_detection_on_video_tpu.data.features import FeatureDataset
    from anomaly_detection_on_video_tpu.models import build_model
    from anomaly_detection_on_video_tpu.training import TrainState
    from anomaly_detection_on_video_tpu.training.optim import adam_with_l2

    _, model = build_model("mgfn")
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((2, 10, CLIPS, 2049), jnp.float32),
        train=True,
    )
    state = TrainState.create(model, variables, adam_with_l2())

    rng = np.random.RandomState(0)
    filenames, arrays, labels = [], {}, {}
    for i in range(N_VIDEOS):
        name = f"{'Normal' if i % 2 else 'Abuse'}_{i}_i3d.npy"
        arrays[name] = rng.randn(CLIPS, 10, 2048).astype(np.float32)
        frame_labels = np.zeros(CLIPS * 16, np.float32)
        if i % 2 == 0:
            frame_labels[: CLIPS * 8] = 1.0
        labels[name] = frame_labels.tolist()
        filenames.append(name)
    ds = FeatureDataset(filenames=filenames, _arrays=arrays, labels=labels)
    return state, ds


def main() -> None:
    state, ds = build_state_and_dataset()

    from anomaly_detection_on_video_tpu.training.runner import (
        eval_batches,
        eval_bucket,
        evaluate,
        make_eval_step,
    )

    eval_step = make_eval_step()
    kwargs = dict(
        eval_step=eval_step, batch_videos=BATCH_VIDEOS, pad_groups=True
    )

    # warm the compile + establish baseline
    evaluate(state, ds, **kwargs)

    # host-only assembly cost: rebuild exactly what evaluate() assembles
    def assemble_only():
        buckets = {}
        for batch in eval_batches(ds):
            n_clips = batch["feature"].shape[2]
            buckets.setdefault(eval_bucket(n_clips), []).append(batch)
        total = 0
        for bucket, items in buckets.items():
            for start in range(0, len(items), BATCH_VIDEOS):
                group = items[start : start + BATCH_VIDEOS]
                feats = np.zeros(
                    (BATCH_VIDEOS, 10, bucket, group[0]["feature"].shape[3]),
                    np.float32,
                )
                for k in range(BATCH_VIDEOS):
                    item = group[min(k, len(group) - 1)]
                    feats[k, :, : item["feature"].shape[2]] = item["feature"][0]
                total += feats.nbytes
        return total

    def timed(fn, n=2):
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return best

    assemble_s = timed(assemble_only)
    serial_s = timed(
        lambda: evaluate(state, ds, prefetch_assembly=False, **kwargs)
    )
    prefetch_s = timed(
        lambda: evaluate(state, ds, prefetch_assembly=True, **kwargs)
    )

    clips = N_VIDEOS * CLIPS
    report = {
        "workload": f"{N_VIDEOS} videos x {CLIPS} clips, batch_videos="
                    f"{BATCH_VIDEOS}, pad_groups, ten-crop 2049-d",
        "assemble_only_s": round(assemble_s, 3),
        "eval_serial_s": round(serial_s, 3),
        "eval_prefetch_s": round(prefetch_s, 3),
        "device_plus_readback_est_s": round(serial_s - assemble_s, 3),
        "host_assembly_fraction_of_serial": round(assemble_s / serial_s, 3),
        "prefetch_speedup": round(serial_s / prefetch_s, 3),
        "eval_clips_per_sec_serial": round(clips / serial_s, 1),
        "eval_clips_per_sec_prefetch": round(clips / prefetch_s, 1),
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
