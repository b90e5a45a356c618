"""Metrics parity vs sklearn (the reference's metric stack, src/runner.py:73-76)."""

import numpy as np
import pytest
import sklearn.metrics as skm

from anomaly_detection_on_video_tpu.ops.metrics import (
    auc,
    frame_level_scores,
    pr_auc,
    precision_recall_curve,
    roc_auc,
    roc_curve,
)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("n", [10, 1000])
def test_roc_auc_matches_sklearn(seed, n):
    rng = np.random.RandomState(seed)
    labels = (rng.rand(n) > 0.7).astype(float)
    if labels.sum() in (0, n):
        labels[0], labels[-1] = 1.0, 0.0
    scores = np.round(rng.rand(n), 2)  # duplicates exercise threshold logic

    fpr_s, tpr_s, _ = skm.roc_curve(labels, scores)
    golden = skm.auc(fpr_s, tpr_s)
    np.testing.assert_allclose(roc_auc(labels, scores), golden, rtol=1e-12)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_pr_auc_matches_sklearn_trapezoid(seed):
    rng = np.random.RandomState(seed)
    labels = (rng.rand(500) > 0.8).astype(float)
    scores = np.round(rng.rand(500), 2)

    prec, rec, _ = skm.precision_recall_curve(labels, scores)
    golden = skm.auc(rec, prec)  # the reference's PR-AUC (trapezoid)
    np.testing.assert_allclose(pr_auc(labels, scores), golden, rtol=1e-12)


def test_curves_match_sklearn_exactly():
    labels = np.array([0, 0, 1, 1, 0, 1], float)
    scores = np.array([0.1, 0.4, 0.35, 0.8, 0.8, 0.35])
    fpr, tpr, _ = roc_curve(labels, scores)
    fpr_s, tpr_s, _ = skm.roc_curve(labels, scores, drop_intermediate=False)
    np.testing.assert_allclose(fpr, fpr_s, atol=1e-12)
    np.testing.assert_allclose(tpr, tpr_s, atol=1e-12)

    prec, rec, _ = precision_recall_curve(labels, scores)
    prec_s, rec_s, _ = skm.precision_recall_curve(labels, scores)
    np.testing.assert_allclose(prec, prec_s, atol=1e-12)
    np.testing.assert_allclose(rec, rec_s, atol=1e-12)


def test_auc_rejects_unsorted():
    with pytest.raises(ValueError):
        auc(np.array([0.0, 1.0, 0.5]), np.array([0.0, 1.0, 0.5]))


def test_frame_level_scores():
    out = frame_level_scores(np.array([0.25, 0.75]), frames_per_clip=16)
    assert out.shape == (32,)
    assert (out[:16] == 0.25).all() and (out[16:] == 0.75).all()


def test_false_alarm_rate():
    from anomaly_detection_on_video_tpu.ops.metrics import false_alarm_rate

    labels = np.array([0, 0, 0, 0, 1, 1], float)
    scores = np.array([0.9, 0.4, 0.6, 0.1, 0.8, 0.2])
    # negatives: 0.9, 0.4, 0.6, 0.1 -> 2 of 4 above 0.5
    assert false_alarm_rate(labels, scores) == 0.5
    # threshold is strict (score > threshold, not >=)
    assert false_alarm_rate(labels, scores, threshold=0.9) == 0.0
    assert false_alarm_rate(labels, scores, threshold=0.05) == 1.0
    # no negative frames: undefined
    assert np.isnan(false_alarm_rate(np.ones(3), np.ones(3)))


def test_anomaly_events():
    from anomaly_detection_on_video_tpu.ops.metrics import anomaly_events

    scores = np.array([0.1, 0.8, 0.9, 0.2, 0.7, 0.1, 0.6, 0.6, 0.6, 0.95])
    events = anomaly_events(scores, 0.5)
    assert [
        (e["start_frame"], e["end_frame"], e["frames"]) for e in events
    ] == [(1, 2, 2), (4, 4, 1), (6, 9, 4)]
    assert events[0]["peak"] == 0.9
    assert events[0]["mean"] == round((0.8 + 0.9) / 2, 6)
    # debounce: min_frames drops short blips
    events = anomaly_events(scores, 0.5, min_frames=2)
    assert [(e["start_frame"], e["end_frame"]) for e in events] == [
        (1, 2), (6, 9),
    ]
    # boundary runs (start/end of video) and the all-above / all-below edges
    assert anomaly_events(np.array([0.9, 0.9]), 0.5) == [
        {"start_frame": 0, "end_frame": 1, "frames": 2, "peak": 0.9,
         "mean": 0.9}
    ]
    assert anomaly_events(np.array([0.1, 0.2]), 0.5) == []
    # threshold is strict: a score exactly at threshold is not an event
    assert anomaly_events(np.array([0.5, 0.5]), 0.5) == []
