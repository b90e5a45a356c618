"""Feature-extractor pipeline tests: padding, grouping, pipeline parity."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anomaly_detection_on_video_tpu.data.extraction import FeatureExtractor
from anomaly_detection_on_video_tpu.ops.gtransforms import preprocess_frames
from anomaly_detection_on_video_tpu.ops.resize import (
    resize_bilinear_exact,
    resize_bilinear_fast,
)


@pytest.fixture(scope="module")
def extractor():
    return FeatureExtractor(dtype=jnp.float32, batch=20)


def test_pad_frames_loop_pad_semantics(extractor, rng):
    frames = rng.randint(0, 256, (21, 8, 8, 3), np.uint8)  # 2 clips, tail 5
    padded = extractor.pad_frames(frames)
    # tail clip: positions i -> tail[i % 5]
    tail = frames[16:]
    clip2 = padded[16:32]
    for i in range(16):
        np.testing.assert_array_equal(clip2[i], tail[i % 5])
    # group padding: repeats of the last clip up to group_clips clips
    assert padded.shape[0] == extractor.group_clips * 16


def test_extract_frames_matches_reference_pipeline(extractor, rng):
    """The grouped no-gather pipeline must equal the straightforward fused
    preprocess + per-clip forward (which itself is PIL-oracle-tested)."""
    frames = rng.randint(0, 256, (40, 64, 96, 3), np.uint8)  # 3 clips, tail 8
    feats = extractor.extract_frames(frames)
    assert feats.shape == (3, 10, 2048)

    clips = preprocess_frames(frames)  # (3, 10, 16, 224, 224, 3)
    flat = jnp.reshape(clips, (30, 16, 224, 224, 3))
    golden = extractor.model.apply(extractor.variables, flat).reshape(3, 10, -1)
    np.testing.assert_allclose(feats, np.asarray(golden), rtol=1e-5, atol=1e-5)


def test_fast_resize_close_to_exact(rng):
    img = jnp.asarray(rng.randint(0, 256, (4, 120, 160, 3), np.uint8))
    exact = np.asarray(resize_bilinear_exact(img, 256, 341)).astype(int)
    fast = np.asarray(resize_bilinear_fast(img, 256, 341)).astype(int)
    diff = np.abs(exact - fast)
    assert diff.max() <= 1
    assert (diff != 0).mean() < 0.02


def test_extract_video_chunked_equals_whole(extractor, rng, tmp_path):
    import cv2

    path = str(tmp_path / "v.avi")
    # MJPG intra-frame codec: decode is seek-independent and deterministic
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30, (96, 64))
    for i in range(40):
        writer.write(rng.randint(0, 255, (64, 96, 3), np.uint8))
    writer.release()

    whole = extractor.extract_video(path)
    chunked = extractor.extract_video(path, chunk_frames=16)
    assert whole.shape[0] == chunked.shape[0] == 3
    np.testing.assert_allclose(whole, chunked, rtol=1e-5, atol=1e-5)


def test_pipelined_extract_video_bit_equals_serial(extractor, rng, tmp_path):
    """extract_video's 1-deep dispatch pipeline (h2d/compute overlapping the
    previous readback) must be BIT-equal to the serial per-chunk path, with
    and without the per-chunk cache, including a resume where a mid-sequence
    chunk is already cached."""
    import cv2

    from anomaly_detection_on_video_tpu.data.video import VideoFrameSource

    path = str(tmp_path / "p.avi")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30, (96, 64))
    for i in range(3 * 32):  # 3 chunks of 2 clips at chunk_frames=32
        writer.write(rng.randint(0, 255, (64, 96, 3), np.uint8))
    writer.release()

    # serial oracle: materialize every chunk immediately
    serial = np.vstack([
        extractor.extract_frames(chunk)
        for chunk in VideoFrameSource(path, 32)
    ])
    pipelined = extractor.extract_video(path, chunk_frames=32)
    np.testing.assert_array_equal(serial, pipelined)

    # cached resume: pre-seed the MIDDLE chunk only; deferred readbacks must
    # not scramble output order or the cache writes of chunks 0 and 2
    cache = str(tmp_path / "cache")
    mid_path = extractor.chunk_cache_path(cache, path, 1)
    os.makedirs(os.path.dirname(mid_path), exist_ok=True)
    np.save(mid_path, serial[2:4])
    resumed = extractor.extract_video(path, chunk_frames=32, cache_dir=cache)
    np.testing.assert_array_equal(serial, resumed)
    for idx in (0, 2):
        assert os.path.exists(extractor.chunk_cache_path(cache, path, idx))


def test_mesh_sharded_extraction_matches_single(rng):
    """Clip-axis sharding over the 8-device CPU mesh must be numerically
    equivalent to single-device extraction."""
    import jax.numpy as jnp

    from anomaly_detection_on_video_tpu.parallel import local_mesh

    frames = rng.randint(0, 256, (40, 64, 96, 3), np.uint8)
    single = FeatureExtractor(dtype=jnp.float32, batch=10)
    mesh = local_mesh()
    sharded = FeatureExtractor(
        dtype=jnp.float32, batch=10, mesh=mesh,
        variables=single.variables,
    )
    assert sharded.group_clips == single.group_clips * mesh.devices.size
    a = single.extract_frames(frames)
    b = sharded.extract_frames(frames)
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


def test_flow_stream_extraction(rng):
    """Two-stream support: Farneback flow -> quantize -> 2-channel I3D."""
    import jax.numpy as jnp

    from anomaly_detection_on_video_tpu.data.flow import (
        compute_flow,
        flow_to_uint8,
    )

    frames = np.zeros((18, 64, 96, 3), np.uint8)
    # moving square => nonzero flow
    for t in range(18):
        frames[t, 20:40, 10 + 2 * t : 30 + 2 * t] = 200
    flow = compute_flow(frames)
    assert flow.shape == (18, 64, 96, 2)
    assert np.abs(flow).max() <= 1.0
    assert np.abs(flow[1:]).max() > 0.01  # motion detected

    ex = FeatureExtractor(dtype=jnp.float32, batch=10, stream="flow")
    feats = ex.extract_frames(flow_to_uint8(flow))
    assert feats.shape == (2, 10, 2048)
    assert np.isfinite(feats).all()


def test_flow_extractor_adapts_rgb_stem_weights(extractor, rng):
    """--stream both shares one pretrained RGB weight tree: the flow
    model's 2-channel stem bootstraps from it by the two-stream I3D recipe
    (mean over the RGB input axis, rescale 3/2 — Carreira & Zisserman
    2017 §4). Previously this crashed with a stem shape mismatch."""
    from anomaly_detection_on_video_tpu.data.extraction import (
        adapt_stem_channels,
    )

    flow_ex = FeatureExtractor(
        dtype=jnp.float32, batch=10, stream="flow",
        variables=extractor.variables, flow_backend="host",
    )
    k3 = np.asarray(extractor.variables["params"]["stem"]["conv"]["kernel"])
    k2 = np.asarray(flow_ex.variables["params"]["stem"]["conv"]["kernel"])
    assert k2.shape == k3.shape[:3] + (2,) + k3.shape[4:]
    expect = k3.mean(axis=3) * 1.5
    np.testing.assert_allclose(k2[..., 0, :], expect, rtol=1e-6)
    np.testing.assert_allclose(k2[..., 1, :], expect, rtol=1e-6)
    # past the stem everything is shared as-is
    flow_b0 = flow_ex.variables["params"]["stage1_block0"]
    rgb_b0 = extractor.variables["params"]["stage1_block0"]
    for a, b in zip(
        jax.tree_util.tree_leaves(flow_b0), jax.tree_util.tree_leaves(rgb_b0)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    feats = flow_ex.extract_frames(
        rng.randint(0, 256, (16, 64, 96, 2), np.uint8)
    )
    assert feats.shape == (1, 10, 2048)
    assert np.isfinite(feats).all()
    # no-op when channels already match
    same = adapt_stem_channels(extractor.variables, 3)
    assert same is extractor.variables


def test_extract_cli_flag_validation(capsys):
    """--batch < 1 dies at argparse; --flow-backend without a flow stream
    warns that it is ignored (both found by CLI probing)."""
    import pytest

    import extract_features

    with pytest.raises(SystemExit):
        extract_features.main(
            ["--videos", "v", "--outdir", "o", "--batch", "0"]
        )
    with pytest.raises(SystemExit):  # empty video dir exits cleanly later,
        extract_features.main(  # but the warning must print first
            ["--videos", "/nonexistent_dir_xyz", "--outdir", "/tmp/_efv",
             "--flow-backend", "tvl1"]
        )
    assert "--flow-backend has no effect" in capsys.readouterr().err


def test_pooled_extraction_matches_serial(rng, tmp_path):
    import cv2
    import jax.numpy as jnp

    from anomaly_detection_on_video_tpu.data.extraction import (
        extract_videos,
        extract_videos_pooled,
    )

    videos = []
    for i in range(3):
        path = str(tmp_path / f"v{i}.avi")
        writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30, (96, 64))
        for _ in range(20 + 16 * i):
            writer.write(rng.randint(0, 255, (64, 96, 3), np.uint8))
        writer.release()
        videos.append(path)

    ex = FeatureExtractor(dtype=jnp.float32, batch=10)
    serial_dir, pooled_dir = str(tmp_path / "serial"), str(tmp_path / "pooled")
    assert extract_videos(videos, serial_dir, ex, progress=False) == 3
    # chunk_frames=16 exercises multi-chunk assembly
    assert extract_videos_pooled(
        videos, pooled_dir, ex, decode_workers=2, chunk_frames=16, progress=False
    ) == 3
    for i in range(3):
        a = np.load(os.path.join(serial_dir, f"v{i}_i3d.npy"))
        b = np.load(os.path.join(pooled_dir, f"v{i}_i3d.npy"))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    # idempotent second run
    assert extract_videos_pooled(videos, pooled_dir, ex, progress=False) == 0


def test_pooled_flow_matches_serial(rng, tmp_path):
    """Pooled extraction honors extractor.stream: the Farneback transform
    runs in the decode workers and outputs land in '<stem>_flow.npy'."""
    import cv2
    import jax.numpy as jnp

    from anomaly_detection_on_video_tpu.data.extraction import (
        extract_videos,
        extract_videos_pooled,
    )

    path = str(tmp_path / "v0.avi")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30, (96, 64))
    for t in range(20):
        frame = np.zeros((64, 96, 3), np.uint8)
        frame[20:40, 5 + 2 * t : 25 + 2 * t] = 200  # moving square
        writer.write(frame)
    writer.release()

    ex = FeatureExtractor(dtype=jnp.float32, batch=10, stream="flow")
    serial_dir, pooled_dir = str(tmp_path / "serial"), str(tmp_path / "pooled")
    assert extract_videos([path], serial_dir, ex, progress=False) == 1
    assert extract_videos_pooled(
        [path], pooled_dir, ex, decode_workers=2, progress=False
    ) == 1
    a = np.load(os.path.join(serial_dir, "v0_flow.npy"))
    b = np.load(os.path.join(pooled_dir, "v0_flow.npy"))
    assert a.shape == (2, 10, 2048)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_pooled_error_shutdown_and_chunk_cache_resume(
    extractor, rng, tmp_path, monkeypatch
):
    """A consumer error must not wedge decode threads (timeout-put + stop
    event), and for 'large' videos an interrupted pooled run resumes from the
    per-chunk feature caches bit-identically."""
    import time

    import cv2

    import anomaly_detection_on_video_tpu.data.extraction as extraction_mod
    from anomaly_detection_on_video_tpu.data.extraction import (
        extract_videos_pooled,
    )

    path = str(tmp_path / "big.avi")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30, (96, 64))
    for _ in range(40):  # 3 chunks of 16
        writer.write(rng.randint(0, 255, (64, 96, 3), np.uint8))
    writer.release()
    golden = extractor.extract_video(path, chunk_frames=16)

    monkeypatch.setattr(extraction_mod, "is_large_video", lambda p: True)
    outdir = str(tmp_path / "out")

    real = extractor.dispatch_frames
    calls = {"n": 0}

    # the consumer's 1-deep pipeline dispatches chunk N before resolving
    # N-1, so a crash on dispatch 3 (chunk 2) still leaves chunk 0 resolved
    # and cached; chunk 1 (in flight) is lost — the resume re-extracts it
    def failing(chunk):
        calls["n"] += 1
        if calls["n"] > 2:
            raise RuntimeError("simulated mid-run crash")
        return real(chunk)

    monkeypatch.setattr(extractor, "dispatch_frames", failing)
    t0 = time.monotonic()
    with pytest.raises(RuntimeError, match="simulated"):
        extract_videos_pooled(
            [path], outdir, extractor,
            decode_workers=3, queue_chunks=1, chunk_frames=16, progress=False,
        )
    # generous bound (CPU runs share the machine): the point is that decode
    # threads are released instead of hanging forever in queue.put()
    assert time.monotonic() - t0 < 300
    # chunk 0 was cached before the crash; the final npy was not written
    assert os.path.exists(extractor.chunk_cache_path(outdir, path, 0))
    assert not os.path.exists(os.path.join(outdir, "big_i3d.npy"))

    resumed = {"n": 0}

    def counting(chunk):
        resumed["n"] += 1
        return real(chunk)

    monkeypatch.setattr(extractor, "dispatch_frames", counting)
    assert extract_videos_pooled(
        [path], outdir, extractor, decode_workers=2, chunk_frames=16,
        progress=False,
    ) == 1
    assert resumed["n"] == 2  # chunks 1 and 2 only; chunk 0 came from cache
    out = np.load(os.path.join(outdir, "big_i3d.npy"))
    np.testing.assert_allclose(out, golden, rtol=1e-5, atol=1e-5)


def test_empty_video_raises_clear_error(extractor, tmp_path):
    from anomaly_detection_on_video_tpu.data.extraction import (
        extract_videos_pooled,
    )

    path = str(tmp_path / "bad.avi")
    with open(path, "wb") as f:
        f.write(b"\x00" * 64)  # not a decodable video
    with pytest.raises((ValueError, FileNotFoundError, RuntimeError)):
        extractor.extract_video(path)
    with pytest.raises((ValueError, FileNotFoundError, RuntimeError)):
        extract_videos_pooled(
            [path], str(tmp_path / "out"), extractor, progress=False
        )


def test_two_stream_shared_decode(tmp_path, rng):
    """--stream both: one decode pass writes both <stem>_i3d.npy and
    <stem>_flow.npy, matching the single-stream outputs."""
    import jax.numpy as jnp

    from anomaly_detection_on_video_tpu.data.extraction import (
        FeatureExtractor,
        extract_videos,
        extract_videos_two_stream,
    )

    import cv2

    video = str(tmp_path / "two_stream.avi")
    writer = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"MJPG"), 30, (96, 64))
    for _ in range(24):
        writer.write(rng.randint(0, 255, (64, 96, 3), np.uint8))
    writer.release()
    rgb_ex = FeatureExtractor(dtype=jnp.float32, batch=10)
    flow_ex = FeatureExtractor(dtype=jnp.float32, batch=10, stream="flow",
                               flow_backend="host")
    both = tmp_path / "both"
    n = extract_videos_two_stream([video], str(both), rgb_ex, flow_ex,
                                  progress=False)
    assert n == 1
    single = tmp_path / "single"
    extract_videos([video], str(single), rgb_ex, progress=False)
    extract_videos([video], str(single), flow_ex, progress=False)
    for name in ("_i3d.npy", "_flow.npy"):
        stem = os.path.splitext(os.path.basename(video))[0]
        a = np.load(str(both / f"{stem}{name}"))
        b = np.load(str(single / f"{stem}{name}"))
        np.testing.assert_array_equal(a, b)
    # idempotent: second call decodes nothing
    assert extract_videos_two_stream([video], str(both), rgb_ex, flow_ex,
                                     progress=False) == 0


def test_pooled_two_stream_matches_serial(tmp_path, rng):
    """extract_videos_pooled(flow_extractor=...): the concurrent-decode
    two-stream driver matches the serial shared-decode path bit-exactly,
    across multiple videos and multi-chunk assembly, and resumes
    per-stream (an outdir holding only the RGB outputs re-extracts only
    flow)."""
    import cv2
    import jax.numpy as jnp

    from anomaly_detection_on_video_tpu.data.extraction import (
        FeatureExtractor,
        extract_videos_pooled,
        extract_videos_two_stream,
    )

    videos = []
    for i in range(2):
        path = str(tmp_path / f"v{i}.avi")
        writer = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"MJPG"), 30, (96, 64)
        )
        for _ in range(40):  # 2 chunks at chunk_frames=32
            writer.write(rng.randint(0, 255, (64, 96, 3), np.uint8))
        writer.release()
        videos.append(path)

    rgb_ex = FeatureExtractor(dtype=jnp.float32, batch=10)
    flow_ex = FeatureExtractor(
        dtype=jnp.float32, batch=10, stream="flow", flow_backend="host"
    )
    serial, pooled = str(tmp_path / "serial"), str(tmp_path / "pooled")
    # same chunk_frames on both paths: flow framing is chunk-relative
    # (frame 0 of each chunk gets zero flow), so chunking is part of the
    # contract being compared
    assert extract_videos_two_stream(
        videos, serial, rgb_ex, flow_ex, chunk_frames=32, progress=False
    ) == 2
    assert extract_videos_pooled(
        videos, pooled, rgb_ex, flow_extractor=flow_ex,
        decode_workers=2, chunk_frames=32, progress=False,
    ) == 2
    for i in range(2):
        for name in ("_i3d.npy", "_flow.npy"):
            a = np.load(os.path.join(serial, f"v{i}{name}"))
            b = np.load(os.path.join(pooled, f"v{i}{name}"))
            np.testing.assert_array_equal(a, b)

    # per-stream resume: delete the flow outputs; only flow re-extracts
    # (the pooled consumer goes through dispatch_frames)
    calls = []
    orig = flow_ex.dispatch_frames
    rgb_orig = rgb_ex.dispatch_frames
    for i in range(2):
        os.remove(os.path.join(pooled, f"v{i}_flow.npy"))
    flow_ex.dispatch_frames = lambda c: calls.append("flow") or orig(c)
    rgb_ex.dispatch_frames = lambda c: calls.append("rgb") or rgb_orig(c)
    try:
        assert extract_videos_pooled(
            videos, pooled, rgb_ex, flow_extractor=flow_ex,
            decode_workers=2, progress=False,
        ) == 2
    finally:
        del flow_ex.dispatch_frames, rgb_ex.dispatch_frames
    assert "rgb" not in calls and calls.count("flow") == 2
    # fully idempotent third run
    assert extract_videos_pooled(
        videos, pooled, rgb_ex, flow_extractor=flow_ex, progress=False
    ) == 0


def test_quantized_extractor_matches_full_precision(rng):
    """int8 extraction (quantize=True): first-chunk calibration, re-jit,
    and features that stay close to the f32 pipeline (the int8 MXU path
    runs 1.8x bf16 peak on v5e, docs/ROOFLINE.md round-3 table)."""
    frames = rng.randint(0, 256, (3 * 16, 48, 64, 3), np.uint8)
    # small geometry: CPU integer convs are slow; the quantization math is
    # size-independent and the TPU-scale numbers live in docs/ROOFLINE.md
    kw = dict(dtype=jnp.float32, batch=10, resize=64, cropsize=56)
    base = FeatureExtractor(**kw)
    quant = FeatureExtractor(**kw, variables=base.variables, quantize=True)
    assert quant._needs_calibration
    ref = base.extract_frames(frames)
    out = quant.extract_frames(frames)
    assert not quant._needs_calibration
    assert out.shape == ref.shape
    cos = float(
        np.sum(ref * out) / (np.linalg.norm(ref) * np.linalg.norm(out))
    )
    assert cos > 0.999, cos
    assert not np.array_equal(ref, out)  # actually quantized, not bypassed
    # second chunk reuses the calibrated pipeline (no re-jit churn)
    model_before = quant.model
    quant.extract_frames(frames)
    assert quant.model is model_before


def test_quantize_calibration_pinned_per_outdir(rng, tmp_path):
    """A quantized run pins its first-chunk calibration scales in the
    outdir (act_scales_<stream>.json); a resumed run loads them instead of
    re-calibrating on ITS first chunk, so one feature directory holds
    exactly one quantization definition."""
    import json

    frames_a = rng.randint(0, 256, (2 * 16, 48, 64, 3), np.uint8)
    frames_b = rng.randint(100, 256, (2 * 16, 48, 64, 3), np.uint8)
    kw = dict(dtype=jnp.float32, batch=10, resize=64, cropsize=56)
    variables = FeatureExtractor(**kw).variables

    ex1 = FeatureExtractor(**kw, variables=variables, quantize=True)
    ex1.pin_calibration(str(tmp_path))
    assert ex1._needs_calibration  # nothing pinned yet -> calibrate on A
    ex1.extract_frames(frames_a)
    sidecar = tmp_path / "act_scales_rgb.json"
    assert sidecar.exists()
    assert len(json.loads(sidecar.read_text())) > 0

    # "resume": a fresh extractor whose first chunk is B, pinned to the
    # same outdir -> loads A's scales without calibrating
    ex2 = FeatureExtractor(**kw, variables=variables, quantize=True)
    ex2.pin_calibration(str(tmp_path))
    assert not ex2._needs_calibration
    np.testing.assert_array_equal(
        ex2.extract_frames(frames_b), ex1.extract_frames(frames_b)
    )

    # without pinning, the resume would have calibrated on B instead and
    # produced a (slightly) different quantization
    ex3 = FeatureExtractor(**kw, variables=variables, quantize=True)
    assert not np.array_equal(
        ex3.extract_frames(frames_b), ex2.extract_frames(frames_b)
    )


def test_quantized_flow_extractor_matches_full_precision(rng):
    """int8 on the flow stream: calibration runs the flow transform chain
    (resize -> ten-crop -> uint8 dequantize) instead of RGB standardize."""
    flow_u8 = rng.randint(0, 256, (3 * 16, 48, 64, 2), np.uint8)
    kw = dict(dtype=jnp.float32, batch=10, resize=64, cropsize=56,
              stream="flow", flow_backend="host")
    base = FeatureExtractor(**kw)
    quant = FeatureExtractor(**kw, variables=base.variables, quantize=True)
    assert quant._needs_calibration
    ref = base.extract_frames(flow_u8)
    out = quant.extract_frames(flow_u8)
    assert not quant._needs_calibration
    assert out.shape == ref.shape
    cos = float(
        np.sum(ref * out) / (np.linalg.norm(ref) * np.linalg.norm(out))
    )
    assert cos > 0.999, cos
    assert not np.array_equal(ref, out)  # actually quantized, not bypassed


def test_flow_backend_pinned_per_outdir(tmp_path):
    """A flow feature directory records its Farneback backend; a resume with
    the other backend fails loudly instead of silently mixing the two
    numerically different flow definitions (round-2 advisor finding)."""
    import json

    from anomaly_detection_on_video_tpu.data.extraction import (
        record_flow_backend,
    )

    outdir = str(tmp_path / "flow_feats")
    record_flow_backend(outdir, "host")
    meta = json.load(open(os.path.join(outdir, "flow_backend.json")))
    assert meta == {"flow_backend": "host"}
    record_flow_backend(outdir, "host")  # same backend resumes fine
    with pytest.raises(ValueError, match="host.*device|device.*host"):
        record_flow_backend(outdir, "device")


def test_center_crop_features_equal_ten_crop_row4(rng):
    """crops="center" (the serving mode) must produce exactly the ten-crop
    pipeline's fifth feature row: same resize, crop 4, same forward."""
    frames = rng.randint(0, 256, (2 * 16, 48, 64, 3), np.uint8)
    kw = dict(dtype=jnp.float32, resize=64, cropsize=56)
    ten = FeatureExtractor(**kw, batch=20)
    # batch=80 -> 20-clip center groups: the device conv batch matches the
    # ten-crop run (2 clips x 10 crops), making the comparison bit-exact;
    # a different batch only changes XLA's accumulation order (~1e-7)
    center = FeatureExtractor(
        **kw, batch=80, crops="center", variables=ten.variables
    )
    assert center.group_clips == 20
    assert center.n_crops == 1
    out10 = ten.extract_frames(frames)
    out1 = center.extract_frames(frames)
    assert out1.shape == (2, 1, 2048)
    np.testing.assert_array_equal(out1, out10[:, 4:5])


def test_center_crop_rejects_unknown():
    with pytest.raises(ValueError, match="crops"):
        FeatureExtractor(dtype=jnp.float32, crops="five")


def test_crop_protocol_pinned_per_outdir(tmp_path):
    """Ten- and center-crop features are shape-incompatible under the same
    filenames; the crops.json pin makes mixing them in one outdir
    impossible. The canonical ten protocol writes no sidecar (the on-disk
    layout stays exactly the reference's)."""
    import json

    from anomaly_detection_on_video_tpu.data.extraction import (
        record_crop_protocol,
    )

    outdir = str(tmp_path / "feats")
    record_crop_protocol(outdir, "ten")
    assert not os.path.exists(os.path.join(outdir, "crops.json"))
    record_crop_protocol(outdir, "center")  # still empty: pins center
    meta = json.load(open(os.path.join(outdir, "crops.json")))
    assert meta == {"crops": "center"}
    record_crop_protocol(outdir, "center")  # same protocol resumes fine
    with pytest.raises(ValueError, match="center"):
        record_crop_protocol(outdir, "ten")


def test_crop_protocol_guards_legacy_ten_dirs(tmp_path):
    """Directories of features extracted before the pin existed are
    ten-crop by definition: a center run into one must fail loudly."""
    from anomaly_detection_on_video_tpu.data.extraction import (
        record_crop_protocol,
    )

    outdir = str(tmp_path)
    np.save(os.path.join(outdir, "v_i3d.npy"), np.zeros((1, 10, 4), np.float32))
    with pytest.raises(ValueError, match="ten"):
        record_crop_protocol(outdir, "center")
    record_crop_protocol(outdir, "ten")  # unpinned ten dir resumes fine


def test_extract_videos_center_crop_driver(rng, tmp_path):
    """extract_videos with the center-crop serving extractor: 1-crop
    features on disk, the protocol pinned, and a ten-crop resume into the
    same outdir rejected."""
    import cv2

    from anomaly_detection_on_video_tpu.data.extraction import extract_videos

    path = str(tmp_path / "v.avi")
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"MJPG"), 30, (96, 64)
    )
    for _ in range(2 * 16):
        writer.write(rng.randint(0, 255, (64, 96, 3), np.uint8))
    writer.release()

    outdir = str(tmp_path / "out")
    kw = dict(dtype=jnp.float32, resize=64, cropsize=56)
    center = FeatureExtractor(**kw, batch=40, crops="center")
    n = extract_videos([path], outdir, center, progress=False)
    assert n == 1
    feats = np.load(os.path.join(outdir, "v_i3d.npy"))
    assert feats.shape == (2, 1, 2048)
    assert os.path.exists(os.path.join(outdir, "crops.json"))

    ten = FeatureExtractor(**kw, batch=20, variables=center.variables)
    with pytest.raises(ValueError, match="center"):
        extract_videos([path], outdir, ten, progress=False)


def test_pin_calibration_skips_rebuild_on_matching_sidecar(rng, tmp_path):
    """Re-pinning a directory whose sidecar holds the already-applied
    scales must not rebuild the model / re-jit the pipeline (minutes of
    TPU compile in production) — the leader-pass pattern in the multihost
    int8 sweep."""
    frames = rng.randint(0, 256, (2 * 16, 48, 64, 3), np.uint8)
    kw = dict(dtype=jnp.float32, batch=10, resize=64, cropsize=56)
    variables = FeatureExtractor(**kw).variables

    ex = FeatureExtractor(**kw, variables=variables, quantize=True)
    ex.pin_calibration(str(tmp_path))
    ex.extract_frames(frames)  # calibrates + writes the sidecar
    model_before = ex.model
    ex.pin_calibration(str(tmp_path))  # the redundant re-entry
    assert ex.model is model_before


def test_pin_calibration_writes_sidecar_when_precalibrated(rng, tmp_path):
    """An extractor calibrated elsewhere (e.g. a previous split's outdir)
    must still pin its APPLIED scales into a fresh directory, keeping the
    one-quantization-per-directory guarantee for resumed runs."""
    import json

    frames = rng.randint(0, 256, (2 * 16, 48, 64, 3), np.uint8)
    kw = dict(dtype=jnp.float32, batch=10, resize=64, cropsize=56)
    variables = FeatureExtractor(**kw).variables

    ex = FeatureExtractor(**kw, variables=variables, quantize=True)
    ex.extract_frames(frames)  # calibrates unpinned
    assert not ex._needs_calibration
    second = tmp_path / "second_split"
    ex.pin_calibration(str(second))
    sidecar = second / "act_scales_rgb.json"
    assert sidecar.exists()
    assert json.loads(sidecar.read_text()) == ex._act_scales


def test_cached_chunks_skip_flow_transform(rng, tmp_path):
    """A resumed flow extraction must NOT re-run the (expensive) optical
    flow host-transform for chunks whose features are already cached: the
    cache check comes before the transform (same order as the pooled
    path's _cached_chunk)."""
    import cv2
    import jax.numpy as jnp

    path = str(tmp_path / "f.avi")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30, (96, 64))
    for _ in range(2 * 32):  # 2 chunks of 2 clips at chunk_frames=32
        writer.write(rng.randint(0, 255, (64, 96, 3), np.uint8))
    writer.release()

    ex = FeatureExtractor(
        dtype=jnp.float32, batch=10, stream="flow", flow_backend="host"
    )
    calls = []
    orig = ex._host_transform

    def counting_host_transform():
        inner = orig()

        def transform(chunk):
            calls.append(len(chunk))
            return inner(chunk)

        return transform

    ex._host_transform = counting_host_transform

    cache = str(tmp_path / "cache")
    first = ex.extract_video(path, chunk_frames=32, cache_dir=cache)
    assert len(calls) == 2  # both chunks transformed on the cold run
    for idx in (0, 1):
        assert os.path.exists(ex.chunk_cache_path(cache, path, idx))

    calls.clear()
    resumed = ex.extract_video(path, chunk_frames=32, cache_dir=cache)
    assert calls == []  # fully cached: zero flow recomputation
    np.testing.assert_array_equal(first, resumed)


def test_ensure_calibrated_pins_without_extraction(rng, tmp_path):
    """The multihost int8 leader must pin act_scales even when the first
    video's features already exist on disk (an extraction warm pass would
    skip-if-exists and never calibrate): ensure_calibrated calibrates on
    the video's first chunk directly and writes the sidecar; peers then
    load those exact scales."""
    import json

    import cv2
    import jax.numpy as jnp

    path = str(tmp_path / "v.avi")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30, (96, 64))
    for _ in range(2 * 16):
        writer.write(rng.randint(0, 255, (64, 96, 3), np.uint8))
    writer.release()

    kw = dict(dtype=jnp.float32, batch=10, resize=64, cropsize=56)
    variables = FeatureExtractor(**kw).variables
    ex = FeatureExtractor(**kw, variables=variables, quantize=True)
    outdir = str(tmp_path / "features")
    ex.ensure_calibrated(outdir, path)
    sidecar = os.path.join(outdir, "act_scales_rgb.json")
    assert os.path.exists(sidecar)
    assert not ex._needs_calibration
    scales = json.loads(open(sidecar).read())
    assert len(scales) > 0

    # a peer process pinning the same outdir loads the leader's scales
    # instead of calibrating on its own chunk
    peer = FeatureExtractor(**kw, variables=variables, quantize=True)
    peer.ensure_calibrated(outdir, path)
    assert peer._act_scales == ex._act_scales
    # full precision: no-op, no sidecar name collision
    FeatureExtractor(**kw, variables=variables).ensure_calibrated(
        outdir, path
    )


def test_two_stream_profile_stage_timers(rng, tmp_path):
    """--profile works for --stream both: the shared-decode two-stream path
    takes a StageTimer and reports decode/transform/device stages
    (previously the timer could not be passed and the report was empty)."""
    import cv2
    import jax.numpy as jnp

    from anomaly_detection_on_video_tpu.data.extraction import (
        extract_videos_two_stream,
    )
    from anomaly_detection_on_video_tpu.utils.profiling import StageTimer

    path = str(tmp_path / "t.avi")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30, (96, 64))
    for _ in range(32):
        writer.write(rng.randint(0, 255, (64, 96, 3), np.uint8))
    writer.release()

    kw = dict(dtype=jnp.float32, batch=10, resize=64, cropsize=56)
    variables = FeatureExtractor(**kw).variables
    rgb = FeatureExtractor(**kw, variables=variables)
    flow = FeatureExtractor(
        **kw, variables=variables, stream="flow", flow_backend="host"
    )
    timer = StageTimer()
    n = extract_videos_two_stream(
        [path], str(tmp_path / "out"), rgb, flow, progress=False, timer=timer
    )
    assert n == 1
    report = timer.report()
    for key in ("decode_wait", "host_transform", "device_extract"):
        assert key in report, report


def test_adaptive_groups_equal_fixed(rng):
    """Exact-fit serving groups (infer.py --group-mode adaptive) must be
    bit-equal to the fixed-group pipeline: same resize, same crops, same
    forward — only the pad-group size differs, and pad results are
    dropped either way. batch 160 ten-crop -> 16-clip fixed groups, so
    the 4-clip request genuinely takes the adaptive ladder (gc=4), not
    the fixed cap."""
    kw = dict(dtype=jnp.float32, batch=160, resize=64, cropsize=56)
    fixed = FeatureExtractor(**kw)
    adaptive = FeatureExtractor(
        **kw, variables=fixed.variables, adaptive_groups=True
    )
    assert fixed.group_clips == 16
    assert adaptive._group_for(4) == 4
    # a request with a loop-padded tail and an exact-multiple request
    for n_frames in (3 * 16 + 5, 4 * 16):
        frames = rng.randint(0, 256, (n_frames, 64, 80, 3), np.uint8)
        np.testing.assert_array_equal(
            fixed.extract_frames(frames), adaptive.extract_frames(frames)
        )


def test_group_ladder_properties(extractor):
    ex = FeatureExtractor(
        dtype=jnp.float32, batch=240, variables=extractor.variables,
        adaptive_groups=True,
    )
    cap = ex.group_clips  # 24 at ten-crop
    # fits the request, power-of-two rungs, capped
    for n_clips in range(1, cap + 5):
        gc = ex._group_for(n_clips)
        assert gc >= min(n_clips, cap)
        assert gc <= cap
        # single-shard rungs are powers of two, except the top rung which
        # clamps to the (possibly non-pow2) cap
        assert gc == cap or gc & (gc - 1) == 0
    # distinct compiled shapes bounded by the ladder
    assert len({ex._group_for(n) for n in range(1, 200)}) <= cap.bit_length() + 1
    # fixed mode: always the cap
    assert extractor._group_for(1) == extractor.group_clips
