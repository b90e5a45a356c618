"""Operating-point selection (scripts/operating_point.py)."""

import json
import os
import sys

import numpy as np

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
    ),
)


def _write_scores(tmp_path, stem, frame_scores):
    path = tmp_path / "scores" / f"{stem}_scores.json"
    path.parent.mkdir(exist_ok=True)
    path.write_text(
        json.dumps(
            {
                "video": f"{stem}.avi",
                "n_clips": len(frame_scores) // 16 or 1,
                "frame_scores": frame_scores,
            }
        )
    )


def test_operating_point_perfect_separation(tmp_path, capsys):
    import operating_point

    _write_scores(tmp_path, "Abuse001_x264", [0.9, 0.8, 0.1, 0.2])
    _write_scores(tmp_path, "Normal_Videos_001_x264", [0.3, 0.7])
    gt = {
        "Abuse001_x264": [1.0, 1.0, 0.0, 0.0],
        "Normal_Videos_001_x264": [0.0, 1.0],
        "unscored_video": [1.0],  # present in GT only: ignored
    }
    (tmp_path / "gt.json").write_text(json.dumps(gt))

    operating_point.main(
        [
            "--scores", str(tmp_path / "scores"),
            "--gt", str(tmp_path / "gt.json"),
            "--per-video",
        ]
    )
    out = json.loads(capsys.readouterr().out.strip())
    # positives {0.9, 0.8, 0.7} vs negatives {0.1, 0.2, 0.3}: separable
    assert out["videos"] == 2
    assert out["frames"] == 6
    assert out["positive_frames"] == 3
    assert out["roc_auc"] == 1.0
    assert out["best_f1"]["f1"] == 1.0
    assert 0.3 < out["best_f1"]["threshold"] <= 0.7
    assert out["at_target_fpr"]["fpr"] == 0.0
    assert out["at_target_fpr"]["tpr"] == 1.0
    assert out["per_video_max_score"]["Abuse001_x264"] == 0.9


def test_operating_point_matches_brute_force_f1(tmp_path, capsys):
    import operating_point

    rng = np.random.RandomState(0)
    labels = (rng.rand(200) < 0.3).astype(float)
    scores = np.clip(
        labels * 0.4 + rng.rand(200) * 0.6, 0, 1
    )  # noisy but informative
    _write_scores(tmp_path, "Mix001_x264", scores.round(6).tolist())
    (tmp_path / "gt.json").write_text(
        json.dumps({"Mix001_x264": labels.tolist()})
    )
    operating_point.main(
        ["--scores", str(tmp_path / "scores"), "--gt", str(tmp_path / "gt.json")]
    )
    out = json.loads(capsys.readouterr().out.strip())

    # brute force the best F1 over every candidate threshold
    best = 0.0
    for t in np.unique(scores):
        pred = scores >= t
        tp = float((pred & (labels > 0)).sum())
        if tp == 0:
            continue
        precision = tp / pred.sum()
        recall = tp / labels.sum()
        best = max(best, 2 * precision * recall / (precision + recall))
    assert abs(out["best_f1"]["f1"] - best) < 1e-6  # output rounds to 6dp


def test_operating_point_per_class(tmp_path, capsys):
    """--per-class: the literature breakdown (per-class AUC vs all normal
    videos, abnormal-subset AUC, FAR on normal videos) joins correctly."""
    import operating_point

    from anomaly_detection_on_video_tpu.ops.metrics import (
        false_alarm_rate,
        roc_auc,
    )

    videos = {
        "Abuse001_x264": [0.9, 0.8, 0.1, 0.2],
        "Shooting002_x264": [0.7, 0.1, 0.6, 0.3],
        "Normal_Videos_001_x264": [0.3, 0.7, 0.2, 0.1],
    }
    gt = {
        "Abuse001_x264": [1.0, 1.0, 0.0, 0.0],
        "Shooting002_x264": [1.0, 0.0, 1.0, 0.0],
        "Normal_Videos_001_x264": [0.0, 0.0, 0.0, 0.0],
    }
    for stem, frames in videos.items():
        _write_scores(tmp_path, stem, frames)
    (tmp_path / "gt.json").write_text(json.dumps(gt))

    operating_point.main(
        [
            "--scores", str(tmp_path / "scores"),
            "--gt", str(tmp_path / "gt.json"),
            "--per-class",
        ]
    )
    out = json.loads(capsys.readouterr().out.strip())
    norm_s, norm_l = videos["Normal_Videos_001_x264"], gt["Normal_Videos_001_x264"]
    assert out["far"] == false_alarm_rate(norm_l, norm_s)
    assert set(out["per_class"]) == {"Abuse", "Shooting"}
    for cls, stem in [("Abuse", "Abuse001_x264"), ("Shooting", "Shooting002_x264")]:
        expect = roc_auc(gt[stem] + norm_l, videos[stem] + norm_s)
        assert out["per_class"][cls]["auc"] == expect
        assert out["per_class"][cls]["videos"] == 1
    assert out["abnormal_auc"] == roc_auc(
        gt["Abuse001_x264"] + gt["Shooting002_x264"],
        videos["Abuse001_x264"] + videos["Shooting002_x264"],
    )
