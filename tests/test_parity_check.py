"""Offline plumbing tests for scripts/parity_check.py (VERDICT r2 #7).

Real weights are network-gated; these drive the harness end-to-end with
oracle-GENERATED weights so that the day the real artifacts exist, the
command is already known to work: small diffs for matching weights, large
for mismatched, and dual-implementation AUC agreement.
"""

import json
import os
import sys

import numpy as np
import pytest
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from torch_oracles import OracleMGFN, TorchI3Res50, randomize_bn_stats


def write_video(path, n_frames=40, size=(96, 64), seed=0):
    import cv2

    rng = np.random.RandomState(seed)
    writer = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"MJPG"), 30, size
    )
    assert writer.isOpened()
    for _ in range(n_frames):
        writer.write(rng.randint(0, 255, (size[1], size[0], 3), np.uint8))
    writer.release()


TINY_MGFN = dict(dims=(8, 8, 16), depths=(1, 1, 1), dim_head=4)


@pytest.mark.slow
def test_parity_check_i3d_and_mgfn_end_to_end(tmp_path):
    import parity_check
    from test_mgfn import oracle_to_hf_state_dict

    videos = tmp_path / "videos"
    videos.mkdir()
    write_video(videos / "Abuse001_x264.avi", n_frames=24)

    torch.manual_seed(0)
    i3d = TorchI3Res50()
    randomize_bn_stats(i3d, seed=1)
    i3d_path = str(tmp_path / "i3d.pt")
    torch.save(i3d.state_dict(), i3d_path)

    torch.manual_seed(1)
    mgfn = OracleMGFN(**TINY_MGFN)
    randomize_bn_stats(mgfn, seed=2)
    mgfn.eval()
    mgfn_path = str(tmp_path / "mgfn_hf.pt")
    torch.save(oracle_to_hf_state_dict(mgfn), mgfn_path)

    out_path = str(tmp_path / "report.json")
    report = parity_check.main([
        "--videos", str(videos),
        "--i3d-weights", i3d_path,
        "--mgfn-weights", mgfn_path,
        "--mgfn-config", json.dumps(TINY_MGFN),
        "--max-clips", "1",
        "--max-frames", "24",
        "--out", out_path,
    ])

    (video_rep,) = report["i3d"].values()
    diffs = video_rep["max_abs_diff"]
    # same weights through both implementations: parity-grade agreement
    for stage in ("stem", "stage1", "stage2", "stage3", "stage4", "features"):
        assert diffs[stage] < 1e-3, (stage, diffs)
    assert video_rep["missing_keys"] == []
    assert video_rep["pipeline"]["max_abs_diff"] < 1e-3
    (score_rep,) = report["mgfn_scores"].values()
    assert score_rep["max_abs_diff"] < 1e-4
    assert os.path.exists(out_path)


@pytest.mark.slow
def test_parity_check_detects_weight_mismatch(tmp_path):
    """The harness must actually discriminate: perturbed weights -> large
    reported diffs (guards against a trivially-green report)."""
    import jax
    import parity_check

    videos = tmp_path / "videos"
    videos.mkdir()
    write_video(videos / "Normal_001_x264.avi", n_frames=20)

    torch.manual_seed(0)
    i3d = TorchI3Res50()
    randomize_bn_stats(i3d, seed=1)
    sd = i3d.state_dict()
    frames = parity_check.decode_frames(
        str(videos / "Normal_001_x264.avi"), 20
    )
    _, torch_feats = parity_check.i3d_stage_parity(frames, sd, max_clips=1)
    # perturb one late-stage conv: the torch side changes, the JAX side
    # (converted from the UNperturbed dict) does not
    sd2 = {k: v.clone() for k, v in sd.items()}
    key = "layer4.0.conv2.weight"
    sd2[key] += 0.1 * torch.randn_like(sd2[key])
    report, _ = parity_check.i3d_stage_parity(frames, sd, max_clips=1)
    clean = report["max_abs_diff"]["features"]

    import anomaly_detection_on_video_tpu.utils.convert as convert_mod

    original = convert_mod.convert_i3res50_state_dict

    def convert_unperturbed(state_dict):
        return original(sd)

    convert_mod.convert_i3res50_state_dict = convert_unperturbed
    try:
        report2, _ = parity_check.i3d_stage_parity(frames, sd2, max_clips=1)
    finally:
        convert_mod.convert_i3res50_state_dict = original
    assert report2["max_abs_diff"]["features"] > 10 * max(clean, 1e-6)


@pytest.mark.slow
def test_parity_check_auc_summary(tmp_path):
    """--test-features + --gt + --mgfn-weights: both implementations score
    the same features to the same frame-level AUC."""
    import parity_check
    from test_mgfn import oracle_to_hf_state_dict

    torch.manual_seed(3)
    mgfn = OracleMGFN(**TINY_MGFN)
    randomize_bn_stats(mgfn, seed=4)
    mgfn.eval()
    mgfn_path = str(tmp_path / "mgfn_hf.pt")
    torch.save(oracle_to_hf_state_dict(mgfn), mgfn_path)

    rng = np.random.RandomState(0)
    feat_dir = tmp_path / "test"
    feat_dir.mkdir()
    gt = {}
    for i in range(4):
        prefix = "Normal_Videos" if i % 2 == 0 else "Abuse"
        name = f"{prefix}{i:03d}_x264_i3d.npy"
        n_clips = 3 + i
        np.save(feat_dir / name, rng.randn(n_clips, 10, 2048).astype(np.float32))
        gt[name[:-8]] = [float(i % 2)] * (n_clips * 16)
    gt_path = tmp_path / "gt.json"
    gt_path.write_text(json.dumps(gt))

    report = parity_check.main([
        "--mgfn-weights", mgfn_path,
        "--mgfn-config", json.dumps(TINY_MGFN),
        "--test-features", str(feat_dir),
        "--gt", str(gt_path),
    ])
    auc = report["auc"]
    assert 0.0 <= auc["jax"]["rec_auc"] <= 1.0
    assert auc["rec_auc_diff"] < 1e-6


def test_parity_check_rejects_no_op_flag_combos():
    """Flag combinations that would run NO check must error instead of
    printing an empty report with exit 0 (which reads as 'parity
    passed')."""
    import parity_check

    for argv in (
        ["--mgfn-weights", "w.pt"],                      # nothing to ride on
        ["--videos", "v"],                               # missing weights
        ["--i3d-weights", "w.pt"],                       # missing videos
        ["--test-features", "f"],                        # missing --gt
        ["--gt", "g.json"],                              # missing features
        ["--videos", "v", "--mgfn-weights", "w.pt"],     # videos unusable
    ):
        with pytest.raises(SystemExit) as exc:
            parity_check.main(argv)
        assert exc.value.code not in (0, None)


class _StubDecordReader:
    """decord.VideoReader stand-in: serves pre-decoded RGB frames with the
    reference's access surface (len, vr[i].asnumpy(), get_avg_fps)."""

    class _Frame:
        def __init__(self, arr):
            self._arr = arr

        def asnumpy(self):
            return self._arr

    def __init__(self, frames):
        self._frames = frames

    def __len__(self):
        return len(self._frames)

    def __getitem__(self, i):
        return self._Frame(self._frames[i])

    def get_avg_fps(self):
        return 30.0


def _stub_decord(monkeypatch, frames_by_path):
    import types

    mod = types.ModuleType("decord")
    mod.VideoReader = lambda uri: _StubDecordReader(frames_by_path[uri])
    monkeypatch.setitem(sys.modules, "decord", mod)


def test_decode_provenance_fingerprint(tmp_path):
    """data/video.py:decode_provenance pins the decode axis: stable
    per-chunk checksums, true decoded frame counts, max_frames truncation
    (VERDICT r3 missing #3 — decord-vs-cv2 attribution)."""
    from anomaly_detection_on_video_tpu.data.video import decode_provenance

    path = str(tmp_path / "Normal_001_x264.avi")
    write_video(path, n_frames=40)

    rep = decode_provenance(path, chunk_frames=16)
    assert rep["backend"] == "cv2"
    assert rep["decoded_frame_count"] == 40
    assert rep["container_frame_count"] == 40
    assert rep["frame_shape"] == [64, 96, 3]
    assert len(rep["chunk_sha256"]) == 3  # ceil(40/16)
    # deterministic: same video, same fingerprint
    assert decode_provenance(path, chunk_frames=16) == rep
    # different chunking, same total stream hash
    assert decode_provenance(path, chunk_frames=8)["sha256"] == rep["sha256"]

    short = decode_provenance(path, chunk_frames=16, max_frames=20)
    assert short["decoded_frame_count"] == 20
    assert len(short["chunk_sha256"]) == 2
    assert short["chunk_sha256"][0] == rep["chunk_sha256"][0]


def test_decode_backend_decord_and_both_attribution(tmp_path, monkeypatch):
    """backend='decord' mirrors the reference decoder (src/dataset.py:154-159)
    and --decode-backend both attributes drift to the first divergent chunk.
    decord is absent in this image, so a stub serves cv2's frames (identical
    decode) and then a perturbed copy (divergent decode)."""
    import parity_check
    from anomaly_detection_on_video_tpu.data.video import (
        decode_video_frames,
    )

    path = str(tmp_path / "Abuse001_x264.avi")
    write_video(path, n_frames=40)
    frames = decode_video_frames(path)

    _stub_decord(monkeypatch, {path: frames})
    np.testing.assert_array_equal(
        decode_video_frames(path, backend="decord"), frames
    )
    both = parity_check.decode_provenance_report(path, 40, "both")
    assert both["match"] is True
    assert both["cv2"]["chunk_sha256"] == both["decord"]["chunk_sha256"]

    bad = frames.copy()
    bad[20, 5, 5] ^= 0xFF  # one-byte decode drift; 40 frames fit one
    # default-sized chunk (3,008), so the divergence names chunk 0
    _stub_decord(monkeypatch, {path: bad})
    both = parity_check.decode_provenance_report(path, 40, "both")
    assert both["match"] is False
    assert both["first_divergent_chunk"] == 0

    # frame-count drift (decord sees one fewer frame) also breaks match
    _stub_decord(monkeypatch, {path: frames[:-1]})
    both = parity_check.decode_provenance_report(path, 40, "both")
    assert both["match"] is False


def test_decode_backend_decord_missing_is_reported(tmp_path, monkeypatch):
    """Without decord installed, --decode-backend both degrades to the cv2
    fingerprint plus an explanatory error, not a crash."""
    import builtins

    import parity_check

    path = str(tmp_path / "Normal_002_x264.avi")
    write_video(path, n_frames=8)

    real_import = builtins.__import__

    def no_decord(name, *args, **kwargs):
        if name == "decord":
            raise ImportError("No module named 'decord'")
        return real_import(name, *args, **kwargs)

    monkeypatch.delitem(sys.modules, "decord", raising=False)
    monkeypatch.setattr(builtins, "__import__", no_decord)
    rep = parity_check.decode_provenance_report(path, 8, "both")
    assert "chunk_sha256" in rep["cv2"]
    assert "error" in rep["decord"]
    assert "match" not in rep
