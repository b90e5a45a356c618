#!/usr/bin/env python
"""Full-scale training-dynamics A/B: our train step vs a torch reference run.

Settles the standing question from the round-4 verdict: MGFN training on
synthetic-corpus features diverges to nan at the REFERENCE hyperparameters
(Adam lr=1e-3, weight_decay=5e-4 — configs/runner/default.yaml:5-7,
src/runner.py:53-59). Is that instability inherent to the objective at that
operating point, or a rebuild bug?

Method: identical initialization (the torch oracle's weights converted
through utils/convert.py), identical batches, identical batch order, f32,
full-scale MGFN (dims 64/128/1024, channels 2048, ten-crop, t=32,
batch 16+16 per the reference's data config). Two feature profiles:

- ``gauss``  — the structured synthetic bags the convergence bench trains on
  (unit-ish magnitude gaussians, data/synthetic.py);
- ``i3dlike`` — relu(gauss) * scale, matching the all-positive, large-norm
  statistics of features extracted by a random-init I3D (the corpus where
  the nan was first recorded — see docs/ROOFLINE.md, bench workloads).

Both sides train N steps at each lr; we record per-step losses and the
first non-finite step. Verdict rule: if torch and JAX agree (both nan at
the same order of step, or both stay finite), the dynamics match and the
instability is a property of the objective/data, not of this rebuild.

Selection dropout is off on both sides (rate 0): it is the one train-mode
op whose randomness cannot be matched across frameworks, and the torch
oracle does not model it. tests/test_mgfn.py pins gradient + trajectory
parity in f64 at these hparams; this script is the f32, full-scale,
many-step extension.

Writes docs/dynamics_ab.json. Run: python scripts/dynamics_ab.py
(CPU, ~10 min single-core).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np

N_STEPS = 30
# per class; the reference data config uses 16 (configs/data/default.yaml:1)
# but a full-reference-scale MGFN step is ~1 TFLOP of fwd+bwd — minutes per
# step on this 1-core host — and the divergence under test historically
# shows within ~10-25 steps at ANY batch (it also reproduced at 6+6 in
# scripts/int8_e2e.py). 8+8 keeps the model at full reference width while
# making the A/B runnable here; override with --batch-per-class.
BATCH = 8
T = 32
CHANNELS = 2048
LRS = (1e-3, 3e-5)
WEIGHT_DECAY = 5e-4


def make_batches(profile: str, seed: int, n_batches: int, batch: int = BATCH):
    """List of (video, nlabels, alabels) f32 batches, normal-first concat
    (src/runner.py:31), magnitude channel appended (src/dataset.py:121-124).
    """
    from anomaly_detection_on_video_tpu.data.features import add_magnitude

    rng = np.random.RandomState(seed)
    batches = []
    for _ in range(n_batches):
        raw = rng.randn(2 * batch, 10, T, CHANNELS).astype(np.float32)
        if profile == "i3dlike":
            # random-init-I3D feature statistics: post-ReLU (all positive),
            # large per-row norms (~sqrt(dim/2)*scale)
            raw = np.maximum(raw, 0.0) * 10.0
        else:
            scale = 1.0 + 0.5 * rng.rand(CHANNELS).astype(np.float32)
            raw = raw * scale / np.sqrt(CHANNELS)
        # anomalous half: one elevated contiguous window per bag
        for b in range(batch, 2 * batch):
            width = max(1, int(T * (0.15 + 0.35 * rng.rand())))
            start = rng.randint(0, T - width + 1)
            raw[b, :, start : start + width, :] *= 1.3
        video = add_magnitude(raw).astype(np.float32)
        batches.append(
            (
                video,
                np.zeros(batch, np.float32),
                np.ones(batch, np.float32),
            )
        )
    return batches


def run_torch(oracle_ctor, init_sd, batches, lr, n_steps):
    import torch

    from torch_oracles import oracle_losses

    torch.manual_seed(0)
    oracle = oracle_ctor()
    oracle.load_state_dict(init_sd)
    oracle.train()
    optimizer = torch.optim.Adam(
        oracle.parameters(), lr=lr, weight_decay=WEIGHT_DECAY
    )
    losses = []
    nan_step = None
    for i in range(n_steps):
        video, nlabels, alabels = batches[i % len(batches)]
        optimizer.zero_grad()
        out = oracle(torch.from_numpy(video), force_split=True)
        loss = oracle_losses(
            *out[:4],
            torch.from_numpy(alabels),
            torch.from_numpy(nlabels),
            out[4],
            video.shape[0],
        )
        val = float(loss.detach())
        losses.append(val)
        if i % 5 == 0:
            print(f"    torch step {i}: {val:.4g}", file=sys.stderr,
                  flush=True)
        if not np.isfinite(val):
            nan_step = i
            break
        loss.backward()
        optimizer.step()
    return {"losses": losses, "nan_step": nan_step}


def run_jax(model, variables, batches, lr, n_steps):
    import jax
    import jax.numpy as jnp

    from anomaly_detection_on_video_tpu.training.optim import adam_with_l2
    from anomaly_detection_on_video_tpu.training.runner import (
        TrainState,
        make_train_step,
    )

    state = TrainState.create(model, variables, adam_with_l2(lr, WEIGHT_DECAY))
    step_fn = make_train_step()
    losses = []
    nan_step = None
    for i in range(n_steps):
        video, nlabels, alabels = batches[i % len(batches)]
        state, loss = step_fn(
            state,
            jnp.asarray(video),
            jnp.asarray(nlabels),
            jnp.asarray(alabels),
            jax.random.PRNGKey(i),
        )
        val = float(loss)
        losses.append(val)
        if i % 5 == 0:
            print(f"    jax step {i}: {val:.4g}", file=sys.stderr,
                  flush=True)
        if not np.isfinite(val):
            nan_step = i
            break
    return {"losses": losses, "nan_step": nan_step}


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--steps", type=int, default=N_STEPS)
    parser.add_argument("--batch-per-class", type=int, default=BATCH)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", default=None,
                        help="output JSON (default docs/dynamics_ab.json)")
    parser.add_argument(
        "--profiles", nargs="*", default=["gauss", "i3dlike"],
        choices=["gauss", "i3dlike"],
        help="synthetic profiles to run (pass none with --features to run "
             "only the extracted-features A/B)",
    )
    parser.add_argument(
        "--features", default=None, metavar="NPZ",
        help="REAL extracted segment bags (scripts/int8_e2e.py "
             "--dump-segments): adds an 'extracted' profile training on "
             "them full-batch, the exact setup the lr=1e-3 divergence was "
             "first recorded on (normal/abnormal split by 'Normal' in the "
             "bag name, the reference labeling rule)",
    )
    args = parser.parse_args()

    # the image pins JAX_PLATFORMS=axon; env vars alone cannot force CPU
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import torch

    from torch_oracles import OracleMGFN, randomize_bn_stats
    from test_mgfn import oracle_to_hf_state_dict

    from anomaly_detection_on_video_tpu.models.mgfn import (
        MGFNConfig,
        MGFNForVideoAnomalyDetection,
    )
    from anomaly_detection_on_video_tpu.utils.convert import (
        convert_mgfn_state_dict,
    )

    torch.manual_seed(args.seed)
    init_oracle = OracleMGFN()
    randomize_bn_stats(init_oracle, seed=args.seed + 1)
    init_sd = {
        k: v.detach().clone() for k, v in init_oracle.state_dict().items()
    }
    variables = convert_mgfn_state_dict(oracle_to_hf_state_dict(init_oracle))
    model = MGFNForVideoAnomalyDetection(MGFNConfig(dropout_rate=0.0))

    report = {
        "config": {
            "steps": args.steps,
            "batch_per_class": args.batch_per_class,
            "t": T,
            "channels": CHANNELS,
            "weight_decay": WEIGHT_DECAY,
            "dropout": 0.0,
            "seed": args.seed,
        },
        "runs": {},
    }
    profile_batches = {
        profile: make_batches(
            profile, args.seed + 100, n_batches=8,
            batch=args.batch_per_class,
        )
        for profile in args.profiles
    }
    if args.features:
        from anomaly_detection_on_video_tpu.data.features import (
            add_magnitude,
        )

        with np.load(args.features) as npz:
            segs = {k: npz[k] for k in npz.files}
        normal = [v for k, v in sorted(segs.items()) if "Normal" in k]
        abnormal = [
            v for k, v in sorted(segs.items()) if "Normal" not in k
        ]
        bags = min(len(normal), len(abnormal))
        video = np.stack(
            [add_magnitude(f) for f in normal[:bags]]
            + [add_magnitude(f) for f in abnormal[:bags]]
        ).astype(np.float32)
        # full-batch every step, as scripts/int8_e2e.train_scorer trains
        profile_batches["extracted"] = [
            (video, np.zeros(bags, np.float32), np.ones(bags, np.float32))
        ]
        report["config"]["features"] = {
            "path": args.features,
            "bags_per_class": bags,
            "shape": list(video.shape),
        }
    for profile, batches in profile_batches.items():
        for lr in LRS:
            key = f"{profile}_lr{lr:g}"
            print(f"== {key}", flush=True)
            tr = run_torch(OracleMGFN, init_sd, batches, lr, args.steps)
            print(
                f"  torch: nan_step={tr['nan_step']} "
                f"last_loss={tr['losses'][-1]:.4g}",
                flush=True,
            )
            jr = run_jax(model, variables, batches, lr, args.steps)
            print(
                f"  jax:   nan_step={jr['nan_step']} "
                f"last_loss={jr['losses'][-1]:.4g}",
                flush=True,
            )
            agree = (tr["nan_step"] is None) == (jr["nan_step"] is None)
            report["runs"][key] = {
                "torch": tr,
                "jax": jr,
                "frameworks_agree": agree,
            }

    agree_all = all(r["frameworks_agree"] for r in report["runs"].values())
    report["verdict"] = (
        "dynamics match: torch and JAX agree on finite-vs-nan at every "
        "(profile, lr) operating point — any lr=1e-3 instability is a "
        "property of the objective/data, not of this rebuild"
        if agree_all
        else "MISMATCH: frameworks disagree at some operating point — "
        "investigate before trusting full-scale training"
    )
    out_path = args.out or os.path.join(REPO, "docs", "dynamics_ab.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v["frameworks_agree"] for k, v in report["runs"].items()}))
    print(report["verdict"])


if __name__ == "__main__":
    main()
