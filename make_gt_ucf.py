#!/usr/bin/env python
"""Frame-level ground-truth builder CLI (reference: make_gt_ucf.py).

Builds ``ground_truth.json`` mapping each test video to a frame-level 0/1
label list (n_clips * 16 frames, annotated event windows set to 1).

Local mode:
    python make_gt_ucf.py --annotations Temporal_Anomaly_Annotation.txt \
        --features test.zip --out ground_truth/ground_truth_ucf_crime.json

HF mode (reference's default flow, requires network): omit --annotations /
--features to download them from jinmang2/ucf_crime and the feature hub.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--annotations", default=None,
                        help="temporal annotation txt (local path)")
    parser.add_argument("--features", default=None,
                        help="test feature zip or directory")
    parser.add_argument("--out", default="ground_truth/ground_truth_ucf_crime.json")
    parser.add_argument("--frames-per-clip", type=int, default=16)
    args = parser.parse_args(argv)
    if args.annotations and not os.path.exists(args.annotations):
        parser.error(f"--annotations {args.annotations!r}: no such file")
    if args.features and not os.path.exists(args.features):
        parser.error(f"--features {args.features!r}: no such file or directory")

    annotations, features = args.annotations, args.features
    if annotations is None or features is None:
        from huggingface_hub import hf_hub_download  # network mode
        from huggingface_hub.errors import LocalEntryNotFoundError

        try:
            if annotations is None:
                annotations = hf_hub_download(
                    repo_id="jinmang2/ucf_crime",
                    filename="Temporal_Anomaly_Annotation_for_Testing_Videos.txt",
                    subfolder="UCF_Crimes-Train-Test-Split",
                    repo_type="dataset",
                )
            if features is None:
                features = hf_hub_download(
                    repo_id="jinmang2/ucf_crime_tencrop_i3d_seg32",
                    filename="test.zip",
                    repo_type="dataset",
                )
        except LocalEntryNotFoundError:
            parser.error(
                "cannot download the annotations/features from the HF hub "
                "(no network or not cached); pass local files with "
                "--annotations and --features instead"
            )

    from anomaly_detection_on_video_tpu.data.gt import (
        build_ground_truth,
        save_ground_truth,
    )

    gt = build_ground_truth(annotations, features, args.frames_per_clip)
    save_ground_truth(gt, args.out)
    print(f"wrote ground truth for {len(gt)} videos -> {args.out}")


if __name__ == "__main__":
    main()
