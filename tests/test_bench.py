"""The driver consumes bench.py's single JSON line — pin its e2e schema."""

import jax.numpy as jnp
import pytest


@pytest.mark.slow
def test_bench_e2e_schema(tmp_path, monkeypatch):
    from bench import bench_e2e
    from anomaly_detection_on_video_tpu.data.extraction import FeatureExtractor

    pytest.importorskip("cv2")
    monkeypatch.chdir(tmp_path)
    ex = FeatureExtractor(dtype=jnp.float32, batch=20, precise_resize=False)
    out = bench_e2e(ex, n_videos=2, frames_per_video=64)
    assert out is not None
    required = {
        "e2e_clips_per_sec",
        "e2e_wall_s",
        "e2e_device_busy_s",
        "host_decode_clips_per_sec_per_core",
        "decode_workers",
        "host_cores",
    }
    assert required <= set(out)
    assert out["e2e_clips_per_sec"] > 0
    assert out["host_decode_clips_per_sec_per_core"] > 0


def test_compiled_flops_positive():
    """bench.py's MFU numerator: XLA cost analysis over the extract jits."""
    import numpy as np

    from bench import compiled_flops
    from anomaly_detection_on_video_tpu.data.extraction import FeatureExtractor

    ex = FeatureExtractor(dtype=jnp.float32, batch=10, precise_resize=False)
    frames = np.zeros((16, 64, 96, 3), np.uint8)
    flops = compiled_flops(ex, ex.pad_frames(frames))
    # one clip of 10-crop I3D is billions of FLOPs even at this tiny frame
    # size; anything small means the analysis read the wrong program
    assert flops > 1e9


@pytest.mark.slow
def test_bench_train_eval_serving_schema(tmp_path, monkeypatch):
    """The whole-framework bench sections (VERDICT r3 #1) must emit their
    schema fields at tiny scale: train_step_ms, eval_clips_per_sec,
    serving p50/p99."""
    import numpy as np

    from bench import bench_eval, bench_serving, bench_train_step
    from anomaly_detection_on_video_tpu.data.extraction import FeatureExtractor

    pytest.importorskip("cv2")
    monkeypatch.chdir(tmp_path)

    tiny = dict(dims=(16, 16, 32), depths=(1, 1, 1), dim_head=8, channels=24)
    train_rec, state = bench_train_step(
        steps=2, bags=2, model_overrides=tiny, segments=8
    )
    assert train_rec["train_step_ms"] > 0
    assert train_rec["train_bags"] == 4

    eval_rec = bench_eval(state, n_videos=4, clips=6, batch_videos=2, fdim=24)
    assert eval_rec["eval_clips_per_sec"] > 0
    assert eval_rec["eval_videos"] == 4

    # serving needs an I3D extractor for features AND a scorer whose
    # channel count matches the 2048-d extractor output: use a tiny-dims
    # scorer at channels=2048
    wide = dict(dims=(16, 16, 32), depths=(1, 1, 1), dim_head=8)
    _, state2048 = bench_train_step(
        steps=1, bags=2, model_overrides=wide, segments=8
    )
    extractor = FeatureExtractor(
        dtype=jnp.float32, batch=10, precise_resize=False
    )
    serving = bench_serving(
        extractor, state2048, n_videos=3, frames_per_video=32
    )
    assert serving["serving_latency_p50_ms"] > 0
    assert serving["serving_latency_p99_ms"] >= serving["serving_latency_p50_ms"]
    assert serving["serving_latency_max_ms"] >= serving["serving_latency_p99_ms"]
    assert serving["serving_videos"] == 3
