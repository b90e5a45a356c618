"""In-process infer CLI tests: serving modes cheap enough to skip subprocess.

The heavyweight end-to-end CLI runs live in tests/test_integration.py; these
exercise serving-mode wiring (mesh-sharded extraction, center-crop) directly
through infer.main on the conftest's 8 virtual CPU devices.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def write_video(path, n_frames=40, size=(64, 48), seed=0):
    import cv2

    rng = np.random.RandomState(seed)
    writer = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"MJPG"), 30, size
    )
    assert writer.isOpened()
    for _ in range(n_frames):
        writer.write(rng.randint(0, 255, (size[1], size[0], 3), np.uint8))
    writer.release()


def make_sultani_checkpoint(ckpt_dir, channels=2048, metadata_extra=None):
    """Tiny-width Sultani checkpoint over the real feature interface,
    self-describing (hparams.json) so infer needs no --model-config flags."""
    from anomaly_detection_on_video_tpu.models import build_model
    from anomaly_detection_on_video_tpu.training import TrainState
    from anomaly_detection_on_video_tpu.training.checkpoints import (
        TopKCheckpointer,
    )
    from anomaly_detection_on_video_tpu.training.optim import adam_with_l2

    _, model = build_model("sultani", hidden_dims=(16, 8), channels=channels)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((2, 10, 32, channels + 1), jnp.float32),
        train=True,
    )
    ckpt = TopKCheckpointer(str(ckpt_dir))
    ckpt.save(
        step=1,
        state=TrainState.create(model, variables, adam_with_l2()),
        metric=0.5,
    )
    ckpt.wait()
    ckpt.write_metadata(
        {
            "model_name": "sultani",
            "model_config": {"hidden_dims": [16, 8], "channels": channels},
            **(metadata_extra or {}),
        }
    )


def test_infer_main_data_parallel_center_crop(tmp_path):
    """infer.py --data-parallel --crops center: the clip axis of extraction
    shards over the 8-device mesh (serving analog of extract_features.py
    --data-parallel) and the center-crop serving mode scores end to end."""
    import infer

    videos = tmp_path / "videos"
    videos.mkdir()
    write_video(videos / "Abuse_demo.avi", n_frames=40)
    make_sultani_checkpoint(tmp_path / "ckpts")

    outdir = tmp_path / "scores"
    infer.main(
        [
            "--videos", str(videos),
            "--checkpoint", str(tmp_path / "ckpts"),
            "--outdir", str(outdir),
            "--dtype", "float32",
            "--crops", "center",
            "--batch", "1",
            "--data-parallel",
            "--features-dir", str(tmp_path / "feats"),
            "--threshold", "0.5",
            "--min-event-frames", "2",
        ]
    )
    out = json.loads((outdir / "Abuse_demo_scores.json").read_text())
    assert out["n_clips"] == 3  # 40 frames -> 3 x 16-frame clips (loop-pad)
    assert len(out["frame_scores"]) == 3 * 16
    assert all(0.0 <= s <= 1.0 for s in out["frame_scores"])
    # --threshold emits the deployment event windows (ops/metrics
    # anomaly_events); must equal a direct recomputation from frame_scores
    from anomaly_detection_on_video_tpu.ops.metrics import anomaly_events

    assert out["threshold"] == 0.5
    assert out["events"] == anomaly_events(
        np.asarray(out["frame_scores"]), 0.5, min_frames=2
    )
    # center-crop features carry their own cache name, (n, 1, 2048)
    feats = np.load(tmp_path / "feats" / "Abuse_demo_i3d_center.npy")
    assert feats.shape == (3, 1, 2048)


def test_infer_cli_flag_validation():
    """Bogus numeric flags die at argparse with a named message, before
    any device/weights work."""
    import pytest

    import infer

    for argv in (
        ["--videos", "v", "--outdir", "o", "--checkpoint", "c",
         "--threshold", "7"],
        ["--videos", "v", "--outdir", "o", "--checkpoint", "c",
         "--batch", "0"],
        ["--checkpoint", "c", "--outdir", "o", "--serve", "99999"],
        ["--checkpoint", "c", "--outdir", "o", "--export", "e",
         "--export-max-clips", "0"],
        ["--checkpoint", "c", "--outdir", "o", "--videos", "v",
         "--serve", "8080", "--watch"],
    ):
        with pytest.raises(SystemExit):
            infer.main(argv)


def test_exported_scorer_corrupt_manifest(tmp_path):
    """A corrupt manifest raises a ValueError naming the file (so infer.py's
    --from-export handler turns it into a one-line error)."""
    import pytest

    from anomaly_detection_on_video_tpu.utils.aot import ExportedScorer

    (tmp_path / "manifest.json").write_text("not json{")
    with pytest.raises(ValueError, match="corrupt manifest.*manifest.json"):
        ExportedScorer(str(tmp_path))


def test_infer_main_stream_width_mismatch_fails_fast(tmp_path):
    """A scorer whose feature width cannot match the selected stream mode
    must die with a clear SystemExit BEFORE extraction starts — not with
    an opaque flax shape error on the first scored video."""
    import pytest

    import infer

    videos = tmp_path / "videos"
    videos.mkdir()
    write_video(videos / "Abuse_demo.avi", n_frames=40)
    # a 4096-d (two-stream) scorer, but no persisted data.stream: the CLI
    # defaults to --stream rgb (2048-d features)
    make_sultani_checkpoint(tmp_path / "ckpts", channels=4096)

    with pytest.raises(SystemExit, match="4096-d input.*--stream both"):
        infer.main(
            [
                "--videos", str(videos),
                "--checkpoint", str(tmp_path / "ckpts"),
                "--outdir", str(tmp_path / "scores"),
                "--dtype", "float32",
            ]
        )


def test_infer_main_two_stream_from_checkpoint_hparams(tmp_path):
    """A checkpoint trained with data.stream=both is scored two-stream with
    NO --stream flag: infer reads the persisted data config, extracts RGB +
    flow from one decode pass, concatenates to 4096-d, and scores."""
    import infer

    videos = tmp_path / "videos"
    videos.mkdir()
    write_video(videos / "Abuse_demo.avi", n_frames=40)
    make_sultani_checkpoint(
        tmp_path / "ckpts",
        channels=4096,
        metadata_extra={"data": {"stream": "both"}},
    )

    outdir = tmp_path / "scores"
    infer.main(
        [
            "--videos", str(videos),
            "--checkpoint", str(tmp_path / "ckpts"),
            "--outdir", str(outdir),
            "--dtype", "float32",
            "--crops", "center",
            "--batch", "1",
            "--flow-backend", "host",
            "--features-dir", str(tmp_path / "feats"),
        ]
    )
    out = json.loads((outdir / "Abuse_demo_scores.json").read_text())
    assert out["stream"] == "both"
    assert out["n_clips"] == 3
    assert all(0.0 <= s <= 1.0 for s in out["frame_scores"])
    # both streams cached under their own names
    rgb = np.load(tmp_path / "feats" / "Abuse_demo_i3d_center.npy")
    flow = np.load(tmp_path / "feats" / "Abuse_demo_flow_center.npy")
    assert rgb.shape == (3, 1, 2048)
    assert flow.shape == (3, 1, 2048)

    # second run hits the cache (no extraction) and scores identically
    (outdir / "Abuse_demo_scores.json").unlink()
    infer.main(
        [
            "--videos", str(videos),
            "--checkpoint", str(tmp_path / "ckpts"),
            "--outdir", str(outdir),
            "--dtype", "float32",
            "--crops", "center",
            "--batch", "1",
            "--flow-backend", "host",
            "--features-dir", str(tmp_path / "feats"),
        ]
    )
    out2 = json.loads((outdir / "Abuse_demo_scores.json").read_text())
    assert out2["clip_scores"] == out["clip_scores"]


def test_torch_weights_wrong_model_clean_error(tmp_path):
    """--torch-weights with a state dict that doesn't match the selected
    model (e.g. RTFM weights with --model omitted, which defaults to mgfn)
    must die with a named SystemExit, not a raw KeyError traceback."""
    import pytest
    import torch

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from torch_oracles import OracleRTFM

    import infer

    weights = tmp_path / "rtfm.pt"
    torch.save(OracleRTFM(channels=24, hidden=(16, 8)).state_dict(), weights)
    write_video(tmp_path / "Abuse_demo.avi", n_frames=20)
    with pytest.raises(SystemExit, match="does not look like a 'mgfn'"):
        infer.main([
            "--videos", str(tmp_path), "--outdir", str(tmp_path / "out"),
            "--torch-weights", str(weights),
        ])


def test_features_dir_pins_flow_backend(tmp_path):
    """--features-dir reuse with a different --flow-backend must fail with
    the pin error (extraction.record_flow_backend), exactly like
    extract_features.py — mixing flow definitions in one cache directory
    would silently change scores."""
    import pytest

    import infer

    make_sultani_checkpoint(tmp_path / "ckpts")
    write_video(tmp_path / "Abuse_demo.avi", n_frames=20)
    fdir = tmp_path / "cache"
    fdir.mkdir()
    (fdir / "flow_backend.json").write_text('{"flow_backend": "tvl1"}')
    with pytest.raises(SystemExit, match="tvl1"):
        infer.main([
            "--videos", str(tmp_path),
            "--outdir", str(tmp_path / "out"),
            "--checkpoint", str(tmp_path / "ckpts"),
            "--stream", "flow", "--flow-backend", "host",
            "--features-dir", str(fdir),
            "--dtype", "float32",
        ])


def test_find_videos_recurses_like_extract_features(tmp_path):
    """Both CLIs pointed at the same corpus directory must resolve the SAME
    video set: UCF-Crime corpora arrive in class subfolders (Abuse/,
    Arson/, ...), and infer.py used to scan only the top level."""
    import extract_features
    import infer

    (tmp_path / "Abuse").mkdir()
    (tmp_path / "Normal" / "sub").mkdir(parents=True)
    for rel in (
        "top_video.mp4",
        "Abuse/Abuse001_x264.mp4",
        "Normal/sub/Normal001_x264.avi",
        "Abuse/notes.txt",  # non-video: ignored
    ):
        (tmp_path / rel).write_bytes(b"x")

    got = infer.find_videos(str(tmp_path))
    assert got == extract_features.find_videos(str(tmp_path))
    assert [os.path.basename(p) for p in got] == [
        "Abuse001_x264.mp4", "Normal001_x264.avi", "top_video.mp4",
    ]
    # --watch polls directories that start out empty: no videos is not an
    # error here (unlike the extraction CLI's finder)
    empty = tmp_path / "empty"
    empty.mkdir()
    assert infer.find_videos(str(empty)) == []


def test_warn_duplicate_stems(capsys):
    """Stem-keyed outputs drop all but the first same-stem video; the CLIs
    must say so instead of silently skipping (recursive discovery makes
    same-stem videos in different class subfolders easy to hit)."""
    import extract_features

    dups = extract_features.warn_duplicate_stems(
        ["a/v1.mp4", "b/v1.avi", "c/v2.mp4"], what="scored"
    )
    assert set(dups) == {"v1"}
    err = capsys.readouterr().err
    assert "share the stem 'v1'" in err and "only the first" in err
    assert "v2" not in err

    assert extract_features.warn_duplicate_stems(["a/v1.mp4", "b/v2.mp4"]) == {}


def test_int8_threshold_envelope_warning(tmp_path):
    """--threshold + --dtype int8 must print the operating-envelope warning
    (docs/ROOFLINE.md round 4: bf16-derived absolute cuts do not transfer),
    before any device work."""
    import subprocess
    import sys as _sys

    env = dict(
        os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
        PYTHONPATH=REPO,
    )
    result = subprocess.run(
        [_sys.executable, os.path.join(REPO, "infer.py"),
         "--videos", str(tmp_path),  # empty dir: exits "no videos match"
         "--checkpoint", str(tmp_path),
         "--outdir", str(tmp_path / "out"),
         "--dtype", "int8", "--threshold", "0.5"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600,
    )
    assert "thresholds derived on bf16" in result.stderr.lower() or (
        "may not transfer" in result.stderr
    )
