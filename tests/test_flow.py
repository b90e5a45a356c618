"""Device optical flow (ops/flow.py): accuracy vs ground-truth motion and
agreement with the host cv2 path it replaces."""

import numpy as np
import pytest

from anomaly_detection_on_video_tpu.ops.flow import compute_flow_device

scipy_ndimage = pytest.importorskip("scipy.ndimage")


def smooth_image(seed=0, h=140, w=180, sigma=6, scale=255.0):
    rng = np.random.RandomState(seed)
    img = scipy_ndimage.gaussian_filter(rng.rand(h, w).astype(np.float32), sigma)
    img = (img - img.min()) / (np.ptp(img) + 1e-9) * scale
    return img


def to_rgb(*frames):
    stack = np.stack(frames).astype(np.uint8)
    return np.repeat(stack[..., None], 3, axis=-1)


@pytest.mark.parametrize("dx,dy", [(3.0, -2.0), (0.5, 1.25), (-4.0, 0.0)])
def test_recovers_synthetic_translation(dx, dy):
    img = smooth_image()
    shifted = scipy_ndimage.shift(img, (dy, dx), order=1, mode="nearest")
    flow = np.asarray(compute_flow_device(to_rgb(img, shifted))) * 20.0
    inner = flow[1, 30:-30, 30:-30].reshape(-1, 2)
    est = np.median(inner, axis=0)
    np.testing.assert_allclose(est, [dx, dy], atol=0.3)


def test_output_contract_matches_host_path():
    """Shape/range/zero-frame-0 contract of data/flow.compute_flow."""
    img = smooth_image(seed=1)
    shifted = scipy_ndimage.shift(img, (1.0, 2.0), order=1, mode="nearest")
    frames = to_rgb(img, shifted, img)
    flow = np.asarray(compute_flow_device(frames))
    assert flow.shape == (3, 140, 180, 2)
    assert flow.dtype == np.float32
    assert np.abs(flow).max() <= 1.0
    np.testing.assert_array_equal(flow[0], 0.0)


def test_agrees_with_cv2_farneback():
    cv2 = pytest.importorskip("cv2")
    img = smooth_image(seed=2, h=120, w=160, sigma=5)
    shifted = scipy_ndimage.shift(img, (-1.5, 2.5), order=1, mode="nearest")
    ours = np.asarray(compute_flow_device(to_rgb(img, shifted)))[1] * 20.0
    ref = cv2.calcOpticalFlowFarneback(
        img.astype(np.uint8), shifted.astype(np.uint8), None,
        pyr_scale=0.5, levels=3, winsize=15, iterations=3,
        poly_n=5, poly_sigma=1.2, flags=0,
    )
    inner = slice(20, -20)
    diff = np.abs(ours[inner, inner] - ref[inner, inner])
    # same algorithm family, different border/pyramid details: agree to a
    # fraction of a pixel on smooth motion
    assert np.median(diff) < 0.3, np.median(diff)


def test_extractor_flow_device_backend(rng):
    """FeatureExtractor(stream=flow, flow_backend=device) produces the
    same-shaped quantized flow pipeline inputs as the host backend."""
    import jax.numpy as jnp

    from anomaly_detection_on_video_tpu.data.extraction import FeatureExtractor

    ex = FeatureExtractor(
        dtype=jnp.float32, batch=10, stream="flow", flow_backend="device"
    )
    transform = ex._host_transform()
    img = smooth_image(seed=3, h=64, w=96)
    shifted = scipy_ndimage.shift(img, (1.0, -1.0), order=1, mode="nearest")
    chunk = to_rgb(img, shifted)
    out = transform(chunk)
    assert out.shape == (2, 64, 96, 2)
    assert out.dtype == np.uint8
    # frame 0 is zero flow -> quantized midpoint
    assert set(np.unique(out[0])) <= {127, 128}
