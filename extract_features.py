#!/usr/bin/env python
"""Offline I3D feature extraction CLI (reference: extract_features.py).

Same role and on-disk contract as the reference entry point: per video a
``<stem>_i3d.npy`` of shape (n_clips, 10, 2048), then 32-segment pooled
train features (10, 32, 2048). TPU pipeline: cv2 host decode (double
buffered) -> fused resize/ten-crop/standardize on device -> batched
(clips x crops) I3D on the MXU.

Local mode (default, zero-egress friendly):
    python extract_features.py --videos <dir-or-files> --outdir out \
        [--split train|test] [--weights i3d.pt] [--model tushar-n-baseline]

HF-dataset mode, mirroring the reference's default flow
(extract_features.py:26-31, requires network):
    python extract_features.py --hf-dataset jinmang2/ucf_crime --outdir out
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

VIDEO_EXTS = (".mp4", ".avi", ".mkv", ".mov", ".webm")


def find_videos(spec: str):
    if os.path.isdir(spec):
        files = sorted(
            f
            for f in glob.glob(os.path.join(spec, "**", "*"), recursive=True)
            if f.lower().endswith(VIDEO_EXTS)
        )
    else:
        files = sorted(glob.glob(spec))
    if not files:
        raise SystemExit(f"no videos found under {spec!r}")
    return files


def warn_duplicate_stems(paths, what: str = "extracted") -> dict:
    """Warn when videos from different folders share a filename stem.

    Every on-disk artifact is stem-keyed (the reference's ``<stem>_i3d.npy``
    contract, extract_features.py:126), so of N same-stem videos only the
    first is ever processed — the rest skip as \"already done\". Recursive
    directory discovery makes this easy to hit (class subfolders can reuse
    names); say so up front instead of silently dropping videos.
    """
    by_stem: dict = {}
    for p in paths:
        stem = os.path.splitext(os.path.basename(p))[0]
        by_stem.setdefault(stem, []).append(p)
    dups = {s: ps for s, ps in by_stem.items() if len(ps) > 1}
    for stem, ps in sorted(dups.items()):
        print(
            f"warning: {len(ps)} videos share the stem {stem!r} "
            f"({', '.join(ps)}); outputs are stem-keyed, so only the first "
            f"will be {what}",
            file=sys.stderr,
        )
    return dups


def load_weights(path: str | None, model_name: str, flag: str = "--weights"):
    if path is None:
        print(
            f"WARNING: no {flag} given; using random initialization "
            "(features will not match any pretrained reference)",
            file=sys.stderr,
        )
        return None

    from anomaly_detection_on_video_tpu.utils.hub import resolve_weights

    # hf://org/repo/file specs download via the HF cache (the reference's
    # automatic weight fetch, src/i3d.py:354-359); local paths pass through
    path = resolve_weights(path)
    if path.endswith(".msgpack"):
        from anomaly_detection_on_video_tpu.utils.serialization import load_variables

        return load_variables(path)

    import torch

    from anomaly_detection_on_video_tpu.utils.convert import (
        convert_i3res50_state_dict,
        convert_pytorchvideo_resnet_state_dict,
    )

    state_dict = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state_dict, dict) and "model_state" in state_dict:
        state_dict = state_dict["model_state"]  # pytorchvideo .pyth layout
    if model_name == "tushar-n-baseline":
        return convert_i3res50_state_dict(state_dict)
    return convert_pytorchvideo_resnet_state_dict(state_dict)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--videos", help="video directory or glob")
    parser.add_argument("--hf-dataset", help="HF dataset id (network mode)")
    parser.add_argument("--outdir", required=True)
    parser.add_argument("--split", default=None, choices=[None, "train", "test"],
                        help="subdirectory under outdir; train also gets segments")
    parser.add_argument("--model", default="tushar-n-baseline")
    parser.add_argument("--weights", default=None, help="torch .pt state dict")
    parser.add_argument("--dtype", default="bfloat16",
                        choices=["bfloat16", "float32", "int8"],
                        help="compute dtype: float32 for bit-parity runs; "
                             "int8 quantizes the I3D convs (per-channel "
                             "weights + scales calibrated on the first "
                             "chunk, ~0.99999 feature cosine vs bf16) for "
                             "the MXU's 2x int8 path; applies to both "
                             "streams and every --model variant")
    parser.add_argument("--batch", type=int, default=240,
                        help="(clip, crop) forwards per device step "
                             "(240 saturates a v5e)")
    parser.add_argument("--segment-length", type=int, default=32)
    parser.add_argument("--no-segments", action="store_true")
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard the clip axis over all local devices")
    parser.add_argument("--profile", action="store_true",
                        help="report decode/device stage timers")
    parser.add_argument("--stream", default="rgb",
                        choices=["rgb", "flow", "both"],
                        help="two-stream support: RGB, optical-flow, or "
                             "both in one shared decode pass")
    parser.add_argument("--flow-backend", default=None,
                        choices=["host", "device", "tvl1"],
                        help="Farneback on the host (cv2), Farneback on the "
                             "TPU (ops/flow.py, ~13x faster), or TV-L1 on "
                             "the TPU (ops/tvl1.py — the original I3D "
                             "two-stream protocol's flow algorithm); "
                             "default: device on TPU, host elsewhere")
    parser.add_argument("--crops", default="ten", choices=["ten", "center"],
                        help="ten = the reference ten-crop protocol "
                             "((n_clips, 10, 2048), required for the "
                             "training contract); center = 1-crop serving "
                             "mode ((n_clips, 1, 2048), bit-equal to "
                             "ten-crop row 4 at a tenth of the FLOPs); the "
                             "protocol pins per outdir so resumes cannot "
                             "mix the two")
    parser.add_argument("--decode-workers", type=int, default=None,
                        help=">1 decodes that many videos concurrently to "
                             "keep the chip fed (one decode stream is ~8x "
                             "slower than the device); default auto-tunes "
                             "to one per host core (capped at 8), 1 = serial")
    parser.add_argument("--multihost", action="store_true",
                        help="multi-host sweep: initialize jax.distributed "
                             "(autodetected on TPU pods, or via "
                             "--coordinator), shard the video list across "
                             "processes into the shared outdir (idempotent "
                             "writes make overlap safe); process 0 builds "
                             "segments after a cross-host barrier")
    parser.add_argument("--coordinator", default=None,
                        help="host:port for jax.distributed when not "
                             "autodetectable (requires --num-processes and "
                             "--process-id)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("--compile-cache", default=None, metavar="DIR",
                        help="persistent XLA compilation cache directory: "
                             "repeated sweeps reuse compiled executables "
                             "instead of recompiling "
                             "(utils/compile_cache.py)")
    args = parser.parse_args(argv)
    if args.multihost and args.hf_dataset:
        parser.error("--multihost supports --videos local mode only")
    from anomaly_detection_on_video_tpu.utils.hub import (
        default_weight_spec,
        is_hub_spec,
    )

    if args.weights and not is_hub_spec(args.weights) and not os.path.isfile(
        args.weights
    ):
        parser.error(f"--weights {args.weights!r}: no such file (or use "
                     "hf://org/repo/file to fetch from the HF hub)")
    if args.hf_dataset and args.weights is None:
        # network mode with no --weights mirrors the reference's automatic
        # weight download (src/i3d.py:354-359) instead of random init
        try:
            args.weights = default_weight_spec(args.model)
            print(f"--weights not given; defaulting to {args.weights} "
                  "(reference network-mode flow)", file=sys.stderr)
        except ValueError:
            pass  # unknown model name: keep the random-init warning path
    if args.batch < 1:
        parser.error(f"--batch must be >= 1 (got {args.batch})")
    if args.flow_backend and args.stream == "rgb":
        print(
            "warning: --flow-backend has no effect with --stream rgb "
            "(no optical-flow stream is extracted)",
            file=sys.stderr,
        )
    videos_list = None
    if not args.hf_dataset:
        # fail fast on an empty/typo'd --videos BEFORE device init and the
        # (expensive) extractor build
        if not args.videos:
            parser.error("one of --videos / --hf-dataset is required")
        videos_list = find_videos(args.videos)
        warn_duplicate_stems(videos_list)

    if args.compile_cache:
        from anomaly_detection_on_video_tpu.utils.compile_cache import (
            enable_compile_cache,
        )

        enable_compile_cache(args.compile_cache)

    import jax
    import jax.numpy as jnp

    from anomaly_detection_on_video_tpu.data.extraction import (
        FeatureExtractor,
        extract_videos,
        extract_videos_pooled,
        extract_videos_two_stream,
        segment_video_features,
    )

    if args.multihost:
        from anomaly_detection_on_video_tpu.parallel import initialize_multihost

        initialize_multihost(
            coordinator=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
            autodetect=args.coordinator is None,
        )

    mesh = None
    if args.data_parallel and len(jax.local_devices()) > 1:
        from anomaly_detection_on_video_tpu.parallel import make_mesh

        # process-LOCAL mesh: under --multihost each process sweeps its own
        # video shard with its own chips; a global mesh would need lockstep
        # jit calls across hosts, which per-video sweeps don't have
        devices = jax.local_devices()
        mesh = make_mesh((len(devices),), ("data",), devices)

    # load once: --stream both builds two extractors (the flow stream's
    # 2-channel stem bootstraps from the same RGB tree in FeatureExtractor)
    try:
        weight_variables = load_weights(args.weights, args.model)
    except FileNotFoundError as exc:
        raise SystemExit(str(exc))  # hub fetch failed: user error, not a traceback

    def make_extractor(stream):
        return FeatureExtractor(
            model_name=args.model,
            variables=weight_variables,
            dtype=jnp.float32 if args.dtype == "float32" else jnp.bfloat16,
            batch=args.batch,
            # float32 runs are parity runs: use the PIL-bit-exact resize
            precise_resize=(args.dtype == "float32"),
            mesh=mesh,
            stream=stream,
            flow_backend=args.flow_backend if stream == "flow" else None,
            quantize=(args.dtype == "int8"),
            crops=args.crops,
        )

    extractor = make_extractor("rgb" if args.stream == "both" else args.stream)

    timer = None
    if args.profile:
        from anomaly_detection_on_video_tpu.utils.profiling import StageTimer

        timer = StageTimer()

    # one flow extractor for every split/branch (--stream both)
    flow_extractor = make_extractor("flow") if args.stream == "both" else None

    decode_workers = args.decode_workers
    if decode_workers is None:
        decode_workers = min(8, os.cpu_count() or 1)
    if timer is not None and decode_workers > 1:
        # the pooled path has no per-stage timers (decode runs in a
        # worker pool); fall back to the serial path so --profile works
        print("--profile forces --decode-workers 1 (serial path)",
              file=sys.stderr)
        decode_workers = 1

    def run_extraction(videos, outdir):
        """The one dispatch for every mode: pooled concurrent decode when
        decode_workers > 1, else the serial (profilable) path."""
        if args.stream == "both":
            if decode_workers > 1:
                # pooled two-stream: each decoded chunk feeds both streams,
                # with decode_workers videos decoding concurrently
                return extract_videos_pooled(
                    videos, outdir, extractor, flow_extractor=flow_extractor,
                    decode_workers=decode_workers,
                )
            return extract_videos_two_stream(
                videos, outdir, extractor, flow_extractor, timer=timer
            )
        if decode_workers > 1:
            return extract_videos_pooled(
                videos, outdir, extractor, decode_workers=decode_workers
            )
        return extract_videos(videos, outdir, extractor, timer=timer)

    if args.hf_dataset:
        from datasets import load_dataset  # network mode

        dataset = load_dataset(args.hf_dataset, "anomaly")
        extracted_modes = []
        for mode, split in dataset.items():
            if args.split and mode != args.split:
                continue  # --split narrows HF mode too
            videos = [s["video_path"] for s in split]
            outdir = os.path.join(args.outdir, "anomaly_features", mode)
            n = run_extraction(videos, outdir)
            extracted_modes.append(mode)
            print(f"{mode}: extracted {n} new videos -> {outdir}")
        train_dir = (
            os.path.join(args.outdir, "anomaly_features", "train")
            if "train" in extracted_modes
            else None
        )
    else:
        videos = videos_list
        outdir = os.path.join(args.outdir, args.split) if args.split else args.outdir
        pi, pc = (
            (jax.process_index(), jax.process_count())
            if args.multihost else (0, 1)
        )
        if pc > 1:
            from anomaly_detection_on_video_tpu.parallel import barrier

            if args.dtype == "int8":
                # one process must own calibration, or each host would
                # quantize with scales from ITS first chunk
                # (pin_calibration closes that race only within one host):
                # process 0 calibrates on the global first video and pins
                # act_scales_<stream>.json before anyone else starts —
                # UNCONDITIONALLY (an extraction warm pass would skip when
                # the first video's features already exist on disk, e.g. a
                # re-run over a seeded outdir, and never write the scales)
                if pi == 0:
                    extractor.ensure_calibrated(outdir, videos[0])
                    if flow_extractor is not None:
                        flow_extractor.ensure_calibrated(outdir, videos[0])
                barrier("int8 scales pinned")
            videos = videos[pi::pc]
        n = run_extraction(videos, outdir)
        who = f"[process {pi}/{pc}] " if pc > 1 else ""
        print(f"{who}extracted {n} new videos ({len(videos)} total) -> {outdir}")
        if pc > 1:
            from anomaly_detection_on_video_tpu.parallel import barrier

            # all features must exist before process 0 pools segments; the
            # coordinator barrier (not a device collective) tolerates the
            # minutes of skew uneven video shards produce
            barrier("extraction complete")
            if pi != 0:
                return
        train_dir = outdir if args.split in (None, "train") else None

    if timer is not None:
        print("pipeline stages:", timer.report())

    if args.crops == "center" and train_dir and not args.no_segments:
        # 32-segment pooling is the ten-crop training contract
        # ((10, 32, 2048), reference extract_features.py:159-185); 1-crop
        # features are a serving protocol and cannot feed it
        print("--crops center is a serving protocol; skipping 32-segment "
              "pooling (the training contract requires ten-crop)",
              file=sys.stderr)
        train_dir = None

    if train_dir and not args.no_segments:
        seg_dir = os.path.join(
            args.outdir, f"segment_features_{args.segment_length}"
        )
        written = segment_video_features(train_dir, seg_dir, args.segment_length)
        print(f"segmented {written} feature files -> {seg_dir}")


if __name__ == "__main__":
    main()
