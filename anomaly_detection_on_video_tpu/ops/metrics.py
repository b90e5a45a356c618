"""Evaluation metrics: frame-level ROC-AUC and PR-AUC.

The reference computes sklearn ``roc_curve``/``auc`` and
``precision_recall_curve``/``auc`` over frame-level labels with clip scores
repeated x16 (reference: src/runner.py:66-79). These are dependency-free
numpy implementations matching sklearn's semantics exactly (verified in
tests/test_metrics.py):

- ROC: thresholds at distinct scores descending, trapezoidal AUC;
- PR curve: precision/recall at distinct thresholds, endpoint (recall=0,
  precision=1) appended, then — like the reference — *trapezoidal* AUC over
  (recall, precision), which is not average precision.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _binary_curve(labels: np.ndarray, scores: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Cumulative TP/FP counts at each distinct score threshold (desc)."""
    labels = np.asarray(labels, dtype=np.float64).ravel()
    scores = np.asarray(scores, dtype=np.float64).ravel()
    order = np.argsort(-scores, kind="mergesort")
    scores, labels = scores[order], labels[order]
    distinct = np.where(np.diff(scores))[0]
    threshold_idx = np.r_[distinct, labels.size - 1]
    tps = np.cumsum(labels)[threshold_idx]
    fps = 1 + threshold_idx - tps
    return tps, fps, scores[threshold_idx]


def roc_curve(labels: np.ndarray, scores: np.ndarray):
    """sklearn.metrics.roc_curve semantics (drop_intermediate=False
    equivalent for AUC purposes; includes the (0,0) origin point)."""
    tps, fps, thresholds = _binary_curve(labels, scores)
    tps = np.r_[0.0, tps]
    fps = np.r_[0.0, fps]
    tpr = tps / tps[-1] if tps[-1] > 0 else np.zeros_like(tps)
    fpr = fps / fps[-1] if fps[-1] > 0 else np.zeros_like(fps)
    return fpr, tpr, thresholds


def precision_recall_curve(labels: np.ndarray, scores: np.ndarray):
    """sklearn.metrics.precision_recall_curve semantics: arrays ordered by
    increasing threshold with the (recall=0, precision=1) endpoint last."""
    tps, fps, thresholds = _binary_curve(labels, scores)
    denom = tps + fps
    precision = np.where(denom > 0, tps / np.maximum(denom, 1), 0.0)
    # sklearn >= 1.9: recall is 1 for all thresholds when there are no
    # positives; full curve reversed with the (recall 0, precision 1) endpoint
    if tps[-1] == 0:
        recall = np.ones_like(tps)
    else:
        recall = tps / tps[-1]
    return (
        np.r_[precision[::-1], 1.0],
        np.r_[recall[::-1], 0.0],
        thresholds[::-1],
    )


def auc(x: np.ndarray, y: np.ndarray) -> float:
    """Trapezoidal area under a curve, sklearn.metrics.auc semantics
    (x may be increasing or decreasing)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    dx = np.diff(x)
    if dx.size == 0:
        raise ValueError("at least 2 points are required to compute AUC")
    direction = 1.0
    if np.any(dx < 0):
        if np.all(dx <= 0):
            direction = -1.0
        else:
            raise ValueError("x is neither increasing nor decreasing")
    return float(direction * np.trapezoid(y, x))


def roc_auc(labels: np.ndarray, scores: np.ndarray) -> float:
    fpr, tpr, _ = roc_curve(labels, scores)
    return auc(fpr, tpr)


def pr_auc(labels: np.ndarray, scores: np.ndarray) -> float:
    """The reference's PR-AUC: trapezoidal auc(recall, precision)
    (src/runner.py:75-76) — not average precision."""
    precision, recall, _ = precision_recall_curve(labels, scores)
    return auc(recall, precision)


def false_alarm_rate(
    labels: np.ndarray, scores: np.ndarray, threshold: float = 0.5
) -> float:
    """Fraction of negative frames scored above ``threshold`` (FP / (FP+TN)).

    The VAD literature's FAR metric (Sultani CVPR'18 §6, reported at 0.5 by
    the RTFM and MGFN papers), conventionally computed over the normal test
    videos only — pass the normal-video slice for that convention. Absent
    from the reference (src/runner.py:62-79 reports threshold-free AUCs
    only). NaN when there are no negative frames.
    """
    labels = np.asarray(labels, dtype=np.float64).ravel()
    scores = np.asarray(scores, dtype=np.float64).ravel()
    negative = labels == 0
    if not negative.any():
        return float("nan")
    return float(np.mean(scores[negative] > threshold))


def frame_level_scores(clip_scores: np.ndarray, frames_per_clip: int = 16) -> np.ndarray:
    """Repeat per-clip scores to frame level (src/runner.py:66-68)."""
    return np.repeat(np.asarray(clip_scores).ravel(), frames_per_clip)


def anomaly_events(
    frame_scores: np.ndarray, threshold: float, min_frames: int = 1
) -> list:
    """Contiguous frame runs scoring above ``threshold`` -> event windows.

    The inverse of the GT builder (data/gt.py, make_gt_ucf.py), which turns
    ``(start, end)`` event windows into frame labels: deployment consumes
    events, not frame scores. Returns, per event, inclusive
    ``start_frame``/``end_frame`` (the UCF-Crime annotation convention,
    reference make_gt_ucf.py:42-50), the frame count, and the peak/mean
    score inside the window. Runs shorter than ``min_frames`` are dropped
    (debounce). Thresholds come from ``scripts/operating_point.py``.
    """
    scores = np.asarray(frame_scores, dtype=np.float64).ravel()
    above = scores > threshold
    edges = np.flatnonzero(np.diff(np.r_[0, above.astype(np.int8), 0]))
    events = []
    for start, end in zip(edges[::2], edges[1::2]):  # end exclusive here
        if end - start < min_frames:
            continue
        window = scores[start:end]
        events.append(
            {
                "start_frame": int(start),
                "end_frame": int(end - 1),
                "frames": int(end - start),
                "peak": round(float(window.max()), 6),
                "mean": round(float(window.mean()), 6),
            }
        )
    return events
