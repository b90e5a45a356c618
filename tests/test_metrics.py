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
