"""Native framepipe decode engine vs the cv2 path."""

import numpy as np
import pytest

from anomaly_detection_on_video_tpu.data import framepipe
from anomaly_detection_on_video_tpu.data.video import VideoFrameSource


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    import cv2

    path = str(tmp_path_factory.mktemp("fp") / "v.avi")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30, (96, 64))
    frames = []
    for t in range(37):
        # structured content: JPEG reconstructs gradients faithfully (random
        # noise would be destroyed by the codec and fail any closeness check)
        col = np.linspace(0, 200, 96, dtype=np.uint8)
        frame = np.stack(
            [np.tile(col + t, (64, 1)), np.tile(col, (64, 1)),
             np.full((64, 96), t * 3, np.uint8)], axis=-1)
        frames.append(frame)
        writer.write(frame[..., ::-1])  # BGR for cv2
    writer.release()
    return path, np.stack(frames)


@pytest.mark.skipif(not framepipe.available(), reason="framepipe not built")
def test_native_matches_cv2_decode(video):
    path, _ = video
    native = list(VideoFrameSource(path, chunk_frames=16, native=True))
    fallback = list(VideoFrameSource(path, chunk_frames=16, native=False))
    assert [c.shape for c in native] == [c.shape for c in fallback]
    assert [c.shape[0] for c in native] == [16, 16, 5]
    for a, b in zip(native, fallback):
        # MJPG decode is deterministic: both FFmpeg paths must agree exactly
        np.testing.assert_array_equal(a, b)


@pytest.mark.skipif(not framepipe.available(), reason="framepipe not built")
def test_native_geometry_and_close(video):
    path, golden = video
    src = framepipe.NativeFrameSource(path, chunk_frames=64)
    assert (src.width, src.height) == (96, 64)
    chunks = list(src)
    assert chunks[0].shape == (37, 64, 96, 3)
    # MJPG is lossy on write but decode matches the original within jpeg noise
    assert np.abs(chunks[0].astype(int) - golden.astype(int)).mean() < 20
    src.close()
    src.close()  # idempotent


@pytest.mark.skipif(not framepipe.available(), reason="framepipe not built")
def test_native_missing_file():
    with pytest.raises(FileNotFoundError):
        framepipe.NativeFrameSource("/nonexistent/v.avi", 16)
