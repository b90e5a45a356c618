#!/usr/bin/env python
"""Pick a deployment threshold from scored videos + frame-level GT.

The reference (and the training loop here) reports threshold-free AUCs
only (reference src/runner.py:73-76); a deployed detector needs an actual
operating point. This joins ``infer.py`` score JSONs with the GT-builder's
``ground_truth.json`` and reports, as one JSON line:

- frame-level ROC AUC and PR AUC over every joined video
- the best-F1 threshold (precision/recall/F1 at it)
- the threshold at a target false-positive rate (``--target-fpr``)
- per-video max scores for triage
- with ``--per-class``: the literature-standard breakdown (per-class AUC
  vs all normal videos, abnormal-subset AUC, FAR@0.5 on normal videos)

    python scripts/operating_point.py --scores scores/ \
        --gt ground_truth.json --target-fpr 0.01
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def join_scores_with_gt(scores_dir: str, gt: dict):
    """Per-video (frame scores, frame labels) for videos present in both."""
    videos = {}
    for path in sorted(glob.glob(os.path.join(scores_dir, "*_scores.json"))):
        with open(path) as f:
            rec = json.load(f)
        stem = os.path.basename(path)[: -len("_scores.json")]
        labels = gt.get(stem)
        if labels is None:  # GT keys may carry the _i3d suffix form
            labels = gt.get(f"{stem}_i3d")
        if labels is None:
            continue
        frames = np.asarray(rec["frame_scores"], np.float64)
        labels = np.asarray(labels, np.float64)
        n = min(len(frames), len(labels))  # loop-pad vs annotation tails
        videos[stem] = (frames[:n], labels[:n])
    if not videos:
        raise SystemExit(
            f"no video in {scores_dir!r} matches a ground-truth key"
        )
    scores = np.concatenate([s for s, _ in videos.values()])
    labels = np.concatenate([l for _, l in videos.values()])
    return scores, labels, videos


def operating_points(labels, scores, target_fpr=0.01):
    from anomaly_detection_on_video_tpu.ops.metrics import (
        pr_auc,
        precision_recall_curve,
        roc_auc,
        roc_curve,
    )

    out = {
        "frames": int(labels.size),
        "positive_frames": int(labels.sum()),
        "roc_auc": round(roc_auc(labels, scores), 6),
        "pr_auc": round(pr_auc(labels, scores), 6),
    }

    precision, recall, thresholds = precision_recall_curve(labels, scores)
    # curve arrays carry the (recall 0, precision 1) endpoint past the last
    # threshold; align to thresholds
    p, r = precision[: len(thresholds)], recall[: len(thresholds)]
    f1 = np.where(p + r > 0, 2 * p * r / np.maximum(p + r, 1e-12), 0.0)
    best = int(np.argmax(f1))
    out["best_f1"] = {
        "threshold": float(thresholds[best]),
        "f1": round(float(f1[best]), 6),
        "precision": round(float(p[best]), 6),
        "recall": round(float(r[best]), 6),
    }

    fpr, tpr, roc_thresholds = roc_curve(labels, scores)
    fpr, tpr = fpr[1:], tpr[1:]  # drop the (0,0) origin (no threshold)
    ok = fpr <= target_fpr
    if ok.any():
        idx = int(np.argmax(np.where(ok, tpr, -1.0)))
        out["at_target_fpr"] = {
            "target_fpr": target_fpr,
            "threshold": float(roc_thresholds[idx]),
            "fpr": round(float(fpr[idx]), 6),
            "tpr": round(float(tpr[idx]), 6),
        }
    else:
        out["at_target_fpr"] = {"target_fpr": target_fpr, "threshold": None}
    return out


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--scores", required=True,
                        help="directory of infer.py <stem>_scores.json")
    parser.add_argument("--gt", required=True,
                        help="ground_truth.json (make_gt_ucf.py)")
    parser.add_argument("--target-fpr", type=float, default=0.01)
    parser.add_argument("--per-video", action="store_true",
                        help="include per-video max frame scores")
    parser.add_argument("--per-class", action="store_true",
                        help="include the literature-standard breakdown "
                             "(per-class AUC, abnormal-subset AUC, FAR@0.5 "
                             "on normal videos — EvalResult.report)")
    args = parser.parse_args(argv)
    if not os.path.exists(args.gt):
        parser.error(f"--gt {args.gt!r}: no such file")
    if not os.path.exists(args.scores):
        parser.error(f"--scores {args.scores!r}: no such file or directory")

    with open(args.gt) as f:
        gt = json.load(f)
    scores, labels, videos = join_scores_with_gt(args.scores, gt)
    out = operating_points(labels, scores, args.target_fpr)
    out["videos"] = len(videos)
    if args.per_video:
        out["per_video_max_score"] = {
            k: round(float(s.max()), 6) if s.size else 0.0
            for k, (s, _) in sorted(videos.items())
        }
    if args.per_class:
        from anomaly_detection_on_video_tpu.training.runner import EvalResult

        report = EvalResult(
            rec_auc=out["roc_auc"], pr_auc=out["pr_auc"],
            preds=scores, labels=labels, videos=videos,
        ).report()
        out["far"] = report["far"]
        out["abnormal_auc"] = report["abnormal_auc"]
        out["per_class"] = report["per_class"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
