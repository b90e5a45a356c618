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
