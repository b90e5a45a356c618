#!/usr/bin/env python
"""One-command, air-gapped demo of the full pipeline through the real CLIs.

The reference's workflow needs the network twice before anything runs
(UCF-Crime videos + published features, reference src/dataset.py:20-21,
extract_features.py:26-31). This demo proves every stage of THIS framework
offline, in one command, using synthetic inputs:

  1. extraction   a generated video -> extract_features.py ->
                  (n_clips, 10, 2048) clip features (the reference's
                  on-disk contract, random I3D weights — pass
                  --weights/--i3d-weights for real features)
  2. training     structured synthetic MIL bags (data/synthetic.py, the
                  magnitude signal the MIL objectives key on) written in
                  the same on-disk layout -> run.py -> frame-level AUC
                  (converges to >> 0.5; docs/convergence.json has curves)
  3. deployment   the trained checkpoint -> infer.py --export -> an AOT
                  StableHLO artifact directory (utils/aot.py)

Run: python scripts/demo.py [--workdir demo_run] [--epochs 16]
(CPU-friendly: ~5-10 min; most of it is step 1's I3D forward — pass
--skip-extract to do training + export only, ~2 min).
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def run_cli(script, *args):
    cmd = [sys.executable, os.path.join(REPO, script), *map(str, args)]
    print(f"\n$ {' '.join(cmd[1:])}", flush=True)
    result = subprocess.run(cmd, cwd=REPO, text=True, capture_output=True)
    sys.stdout.write(result.stdout)
    if result.returncode:
        sys.stderr.write(result.stderr)
        raise SystemExit(
            f"demo step failed: {script} exited {result.returncode}"
        )
    return result.stdout


def write_demo_video(path, n_frames=48, size=(320, 240), seed=0):
    import cv2

    rng = np.random.RandomState(seed)
    writer = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"MJPG"), 30, size
    )
    if not writer.isOpened():
        raise SystemExit(f"cv2 cannot write {path}")
    for t in range(n_frames):
        frame = rng.randint(0, 100, (size[1], size[0], 3), np.uint8)
        # a moving bright square, so the video has actual structure
        x = 20 + 4 * t
        frame[60:120, x : x + 60] = 230
        writer.write(frame)
    writer.release()


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--workdir", default="demo_run")
    parser.add_argument("--epochs", type=int, default=16,
                        help="training epochs for step 2 (16 reaches "
                             "AUC > 0.8 on the structured bags)")
    parser.add_argument("--skip-extract", action="store_true",
                        help="skip step 1 (the I3D forward is the slow "
                             "part on CPU)")
    args = parser.parse_args(argv)
    if args.epochs < 1:
        parser.error(f"--epochs must be >= 1 (got {args.epochs})")

    work = os.path.abspath(args.workdir)
    os.makedirs(work, exist_ok=True)
    print(f"demo workdir: {work}")

    # ------------------------------------------------- 1. extraction
    if not args.skip_extract:
        videos = os.path.join(work, "videos")
        os.makedirs(videos, exist_ok=True)
        write_demo_video(os.path.join(videos, "Demo001_x264.avi"))
        run_cli(
            "extract_features.py",
            "--videos", videos,
            "--outdir", os.path.join(work, "features"),
            "--split", "test",
            "--batch", "30",
        )
        feats = np.load(
            os.path.join(work, "features", "test", "Demo001_x264_i3d.npy")
        )
        print(
            f"extracted features: shape {feats.shape} "
            "(the reference's (n_clips, 10, 2048) contract)"
        )

    # ------------------------------------------------- 2. training
    from anomaly_detection_on_video_tpu.data.synthetic import (
        write_synthetic_dataset,
    )

    bags = os.path.join(work, "synthetic_bags")
    train_dir, test_dir, gt_path = write_synthetic_dataset(bags, seed=0)
    print(f"\nwrote structured synthetic bags under {bags}")

    ckpt_dir = os.path.join(work, "checkpoints")
    out = run_cli(
        "run.py",
        "runner=mgfn",
        "seed=0",
        f"data.train_path={train_dir}",
        f"data.test_path={test_dir}",
        f"data.ground_truth_path={gt_path}",
        "data.batch_size=4",
        "data.shuffle=true",
        f"trainer.max_epochs={args.epochs}",
        f"trainer.log_path={os.path.join(work, 'metrics.jsonl')}",
        f"trainer.checkpoint.dirpath={ckpt_dir}",
        "runner.optimizer.learning_rate=5e-4",
        # the convergence-bench scaled config (scripts/convergence_bench.py)
        "runner.model_config.channels=64",
        "runner.model_config.dims=[32,64,128]",
        "runner.model_config.depths=[2,2,1]",
        "runner.model_config.dim_head=16",
    )
    match = re.search(r"final valid/rec_auc=([0-9.]+)", out)
    auc = float(match.group(1)) if match else float("nan")
    print(f"trained MGFN frame-level AUC: {auc:.3f} (chance = 0.5)")

    # ------------------------------------------------- 3. deployment
    aot_dir = os.path.join(work, "scorer_aot")
    run_cli(
        "infer.py",
        "--checkpoint", ckpt_dir,
        "--outdir", os.path.join(work, "scores"),
        "--export", aot_dir,
        "--export-max-clips", "64",
    )

    print(
        "\ndemo complete. What just ran, with real data equivalents:\n"
        "  1. extract_features.py --videos <UCF-Crime dir> --weights "
        "converted_ref_i3d.pt\n"
        "  2. run.py runner=mgfn (against extracted segment features + "
        "make_gt_ucf.py output)\n"
        "  3. infer.py --videos <new videos> --checkpoint ... (or "
        "--from-export " + aot_dir + ")\n"
        "docs/MIGRATION.md maps every reference command onto these."
    )
    # at the default --epochs the structured bags are reliably learnable
    # (tests/test_convergence.py); a bad AUC then means something is broken
    if args.epochs >= 8 and not np.isnan(auc) and auc < 0.7:
        raise SystemExit(
            f"demo AUC {auc:.3f} is below the expected >= 0.7 at "
            f"--epochs {args.epochs} — the pipeline ran but training "
            "quality regressed"
        )


if __name__ == "__main__":
    main()
