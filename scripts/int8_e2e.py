#!/usr/bin/env python
"""int8 end-to-end accuracy: score/AUC impact vs bf16, not just cosine.

`--dtype int8` extraction was validated only to feature-cosine level
(~0.99997 vs bf16); this measures what deployment actually cares about
(VERDICT r3 #2): the SAME synthetic corpus extracted at bf16 and at int8,
both scored through the SAME scorer TRAINED on the bf16 features — max and
mean clip-score delta, frame-level ROC-AUC under each feature set, and the
AUC delta. The serving protocol (center-crop, 1 crop) is measured the same
way. Eval protocol matches the reference validation loop
(/root/reference/src/runner.py:62-79: crop-averaged clip scores, x16
frame repeat, ROC over concatenated frames).

Corpus: synthetic videos where "Abuse*" clips contain a bright
high-contrast moving block in the second half and "Normal*" videos never
do — enough visual structure for the MIL objective to separate through a
(random-init, calibrated) I3D, so the trained scorer is non-degenerate and
the AUC comparison meaningful. Real-weight runs: pass --i3d-weights.

Runs on whatever device jax selects (the TPU under axon; results recorded
in docs/ROOFLINE.md were measured on the real chip).

    python scripts/int8_e2e.py --out int8_e2e.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def synth_video(n_frames: int, anomalous: bool, seed: int) -> np.ndarray:
    """(n_frames, 240, 320, 3) uint8; anomalies occupy the second half."""
    rng = np.random.RandomState(seed)
    frames = rng.randint(0, 90, (n_frames, 240, 320, 3), np.uint8)
    for t in range(n_frames):
        # common structure: a dim drifting square (both classes)
        x = (10 + 2 * t) % 240
        frames[t, 40:90, x : x + 50] = 140
        if anomalous and t >= n_frames // 2:
            # the anomaly: large bright flickering block, strong contrast
            y = (30 + 5 * t) % 120
            frames[t, y : y + 80, 60:220] = 255 if t % 2 else 10
    return frames


def gt_frames(n_frames: int, n_clips: int, anomalous: bool) -> list:
    """Frame-level GT over the feature timeline (n_clips * 16 frames)."""
    labels = np.zeros(n_clips * 16, np.float32)
    if anomalous:
        labels[min(n_frames // 2, len(labels)) :] = 1.0
    return labels.tolist()


def train_scorer(seg_features: dict, steps: int, seed: int = 0):
    """Train MGFN on the bf16 segment bags; returns the TrainState."""
    import jax
    import jax.numpy as jnp

    from anomaly_detection_on_video_tpu.data.features import add_magnitude
    from anomaly_detection_on_video_tpu.models import build_model
    from anomaly_detection_on_video_tpu.training import TrainState
    from anomaly_detection_on_video_tpu.training.optim import adam_with_l2
    from anomaly_detection_on_video_tpu.training.runner import make_train_step

    normal = [v for k, v in sorted(seg_features.items()) if "Normal" in k]
    abnormal = [v for k, v in sorted(seg_features.items()) if "Normal" not in k]
    bags = min(len(normal), len(abnormal))
    # normal-first concat, magnitude channel appended (the training
    # contract, data/features.py / reference src/dataset.py:121-124)
    feature = jnp.asarray(
        np.stack(
            [add_magnitude(f) for f in normal[:bags]]
            + [add_magnitude(f) for f in abnormal[:bags]]
        ).astype(np.float32)
    )
    _, model = build_model("mgfn")
    variables = jax.jit(model.init, static_argnames=("train",))(
        {
            "params": jax.random.PRNGKey(seed),
            "dropout": jax.random.PRNGKey(seed + 1),
        },
        feature[:2],
        train=True,
    )
    # lr 3e-5 + clip 1.0: the reference's 1e-3 (and even 3e-4) diverges to
    # nan within steps on these random-I3D features (the margin-200
    # magnitude-contrastive term explodes); 3e-5 converges smoothly
    # (sweep: /tmp-int8 debug, loss 0.8 -> 0.05-0.09 in 40 steps)
    state = TrainState.create(
        model, variables, adam_with_l2(learning_rate=3e-5, grad_clip=1.0)
    )
    step = make_train_step()
    normal_l = jnp.zeros(bags)
    abnormal_l = jnp.ones(bags)
    keys = jax.random.split(jax.random.PRNGKey(seed + 2), steps)
    loss = None
    for i in range(steps):
        state, loss = step(state, feature, normal_l, abnormal_l, keys[i])
    final = float(loss)
    print(f"trained {steps} steps, final loss {final:.4f}", file=sys.stderr)
    if not np.isfinite(final):
        raise SystemExit(
            "scorer training diverged (nan loss) — score deltas would be "
            "meaningless; lower the lr in train_scorer"
        )
    return state


def score_corpus(state, clip_features: dict) -> dict:
    """filename -> (n_clips,) crop-averaged clip scores."""
    from anomaly_detection_on_video_tpu.training.runner import make_eval_step
    from infer import score_features

    eval_step = make_eval_step()
    return {
        name: score_features(feats, state.apply_fn, state.variables, eval_step)
        for name, feats in sorted(clip_features.items())
    }


def auc_over(scores: dict, gt: dict) -> float:
    from anomaly_detection_on_video_tpu.ops.metrics import (
        frame_level_scores,
        roc_auc,
    )

    preds, labels = [], []
    for name in sorted(scores):
        preds.append(frame_level_scores(scores[name], 16))
        labels.append(np.asarray(gt[name], np.float32))
    return float(roc_auc(np.concatenate(labels), np.concatenate(preds)))


def compare(a: dict, b: dict, gt: dict, label: str) -> dict:
    deltas = np.concatenate(
        [np.abs(a[name] - b[name]) for name in sorted(a)]
    )
    rep = {
        "protocol": label,
        "max_abs_score_delta": round(float(deltas.max()), 6),
        "mean_abs_score_delta": round(float(deltas.mean()), 6),
        "auc_bf16": round(auc_over(a, gt), 6),
        "auc_int8": round(auc_over(b, gt), 6),
    }
    rep["auc_delta"] = round(abs(rep["auc_bf16"] - rep["auc_int8"]), 6)
    return rep


def build_extractors(variables):
    """The four extraction variants, built ONCE and reused across seeds.

    int8 activation scales calibrate on the first seed's first video and
    stay pinned for every later corpus — deployment-shaped (the CLIs pin
    calibration once per outdir, FeatureExtractor.pin_calibration) and it
    avoids re-paying minutes of TPU compile per seed.
    """
    import jax.numpy as jnp

    from anomaly_detection_on_video_tpu.data.extraction import FeatureExtractor

    bf16 = FeatureExtractor(dtype=jnp.bfloat16, variables=variables)
    return {
        "tencrop_bf16": bf16,
        "tencrop_int8": FeatureExtractor(
            dtype=jnp.bfloat16, variables=bf16.variables, quantize=True
        ),
        "center_bf16": FeatureExtractor(
            dtype=jnp.bfloat16, variables=bf16.variables, crops="center"
        ),
        "center_int8": FeatureExtractor(
            dtype=jnp.bfloat16, variables=bf16.variables, crops="center",
            quantize=True,
        ),
    }


def run_seed(args, extractors, seed: int) -> dict:
    """One full corpus -> extract (4 variants) -> train -> score -> report."""
    from anomaly_detection_on_video_tpu.data.segments import segment_features

    features = {k: {} for k in extractors}
    segs, gt = {}, {}
    n_clips = args.frames // 16
    for i in range(args.n_videos):
        anomalous = i % 2 == 1
        name = f"{'Abuse' if anomalous else 'Normal_Videos'}{i:03d}_x264"
        frames = synth_video(args.frames, anomalous, seed=1000 * seed + 10 + i)
        gt[name] = gt_frames(args.frames, n_clips, anomalous)
        for key, ex in extractors.items():
            # decode once per video (in-memory frames), extract per variant:
            # isolates quantization/crop effects from any decode variance
            features[key][name] = ex.extract_frames(frames)
        segs[name] = segment_features(features["tencrop_bf16"][name])
        print(f"seed {seed}: extracted {name} ({n_clips} clips x 4 variants)",
              file=sys.stderr)

    if args.dump_segments and seed == args.seeds[0]:
        # the bf16 ten-crop segment bags, as extracted: the exact feature
        # statistics the lr=1e-3 divergence was first recorded on —
        # consumed by scripts/dynamics_ab.py --features for the
        # cross-framework nan A/B on REAL extracted features
        np.savez_compressed(args.dump_segments, **segs)
        print(f"segments -> {args.dump_segments}", file=sys.stderr)

    state = train_scorer(segs, args.steps, seed=seed)

    scores = {k: score_corpus(state, v) for k, v in features.items()}
    report = {
        "seed": seed,
        "tencrop": compare(
            scores["tencrop_bf16"], scores["tencrop_int8"], gt, "tencrop"
        ),
        "center_serving": compare(
            scores["center_bf16"], scores["center_int8"], gt, "center"
        ),
    }
    # the serving-PROTOCOL cost, same scorer, same corpus, bf16 both: what
    # switching --crops center alone does to accuracy (VERDICT r4 weak #3)
    report["protocol_cost_bf16"] = {
        "auc_tencrop": report["tencrop"]["auc_bf16"],
        "auc_center": report["center_serving"]["auc_bf16"],
        "auc_delta_ten_minus_center": round(
            report["tencrop"]["auc_bf16"]
            - report["center_serving"]["auc_bf16"], 6,
        ),
    }
    return report


def _agg(values):
    arr = np.asarray(values, np.float64)
    return {
        "mean": round(float(arr.mean()), 6),
        "min": round(float(arr.min()), 6),
        "max": round(float(arr.max()), 6),
        "per_seed": [round(float(v), 6) for v in arr],
    }


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--n-videos", type=int, default=12,
                        help="total (half Normal, half Abuse)")
    parser.add_argument("--frames", type=int, default=256)
    parser.add_argument("--steps", type=int, default=150,
                        help="scorer training steps on the bf16 bags")
    parser.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2],
                        help="one full corpus+scorer run per seed: the "
                             "int8 and center-crop AUC deltas are reported "
                             "as mean/min/max across seeds, not one draw")
    parser.add_argument("--i3d-weights", default=None,
                        help="optional real I3D weights (local or hf://)")
    parser.add_argument("--dump-segments", default=None, metavar="NPZ",
                        help="save the first seed's bf16 segment bags "
                             "(scripts/dynamics_ab.py --features input)")
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)

    variables = None
    if args.i3d_weights:
        import torch

        from anomaly_detection_on_video_tpu.utils.convert import (
            convert_i3res50_state_dict,
        )
        from anomaly_detection_on_video_tpu.utils.hub import resolve_weights

        sd = torch.load(
            resolve_weights(args.i3d_weights),
            map_location="cpu",
            weights_only=True,
        )
        variables = convert_i3res50_state_dict(
            sd.get("model_state", sd) if isinstance(sd, dict) else sd
        )

    extractors = build_extractors(variables)
    runs = []
    for seed in args.seeds:
        runs.append(run_seed(args, extractors, seed))
        if args.out:
            # per-seed partial dump: an axon-tunnel hang mid-run must not
            # discard completed seeds (it did once — 2 of 3 seeds lost)
            with open(args.out + ".partial", "w") as f:
                json.dump(runs, f, indent=1)
    report = {
        "n_videos": args.n_videos,
        "clips_per_video": args.frames // 16,
        "scorer_train_steps": args.steps,
        "seeds": args.seeds,
        "i3d_weights": args.i3d_weights or "random-init (calibrated int8)",
        "aggregate": {
            "int8_auc_delta_tencrop": _agg(
                [r["tencrop"]["auc_delta"] for r in runs]
            ),
            "int8_auc_delta_center": _agg(
                [r["center_serving"]["auc_delta"] for r in runs]
            ),
            "int8_max_score_delta_tencrop": _agg(
                [r["tencrop"]["max_abs_score_delta"] for r in runs]
            ),
            "int8_max_score_delta_center": _agg(
                [r["center_serving"]["max_abs_score_delta"] for r in runs]
            ),
            "protocol_auc_cost_center_vs_tencrop_bf16": _agg(
                [
                    r["protocol_cost_bf16"]["auc_delta_ten_minus_center"]
                    for r in runs
                ]
            ),
            "auc_bf16_tencrop": _agg(
                [r["tencrop"]["auc_bf16"] for r in runs]
            ),
            "auc_bf16_center": _agg(
                [r["center_serving"]["auc_bf16"] for r in runs]
            ),
        },
        "per_seed": runs,
    }
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"report -> {args.out}", file=sys.stderr)
    return report


if __name__ == "__main__":
    main()
