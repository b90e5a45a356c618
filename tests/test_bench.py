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
