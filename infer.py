#!/usr/bin/env python
"""Inference CLI: raw videos -> per-frame anomaly scores, in one command.

The deployment surface the reference leaves implicit (its runner only
evaluates pre-extracted features against GT, src/runner.py:42-79): this
drives the full TPU pipeline — streaming decode, fused ten-crop
preprocessing, batched I3D features, MGFN/RTFM scoring with padded-bucket
masking — and writes per-video score JSON (plus optional overlay figures).

    python infer.py --videos /data/videos --checkpoint ckpts/ --outdir scores
    python infer.py --videos v.mp4 --torch-weights mgfn_hf.pt --outdir scores
    python infer.py --videos /ingest --checkpoint ckpts/ --outdir scores --watch

``--watch`` turns the CLI into a minimal serving loop: the videos
directory is polled and every new video is scored as soon as its file
size is stable across two polls (i.e. the producer finished writing).
Scoring is idempotent (a video with an existing score JSON is skipped), so
the watcher can be restarted at any time. A ``_serving_stats.json``
heartbeat is written every poll.

``--serve PORT`` is the push-based alternative: an HTTP endpoint (stdlib)
where POST /score?name=v.mp4 with raw video bytes returns the score JSON,
with /healthz, /stats and /scores/<stem> alongside:

    python infer.py --checkpoint ckpts/ --outdir scores --serve 8080 \
        --crops center --compile-cache /var/xla_cache

``--threshold T`` (pick T with scripts/operating_point.py) additionally
emits anomaly *events* — contiguous frame windows scoring above T, with
inclusive start/end frames (the UCF annotation convention), peak and mean —
in the score JSON and HTTP responses; ``--min-event-frames`` debounces.

Checkpoints: an orbax directory written by run.py (``--checkpoint``), or a
torch MGFN state dict (``--torch-weights``, HF layout; ``--official`` for
the official-release layout, utils/convert.py). Features can be cached and
reused across runs (``--features-dir``, same on-disk contract as
extract_features.py). Two-stream checkpoints (trained with
``data.stream=both``) are detected from the persisted hparams and scored
on concatenated RGB + optical-flow features from one shared decode pass
(``--stream`` / ``--flow-backend`` override).

AOT deployment (utils/aot.py): ``--export DIR`` freezes the scorer —
weights baked in, lowered to serialized StableHLO per eval bucket for both
TPU and CPU — and ``--from-export DIR`` serves those artifacts without the
checkpoint, the model code path, or a Python-side trace:

    python infer.py --checkpoint ckpts/ --outdir x --export scorer_aot/
    python infer.py --from-export scorer_aot/ --videos v.mp4 --outdir scores
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

VIDEO_EXTS = (".mp4", ".avi", ".mkv", ".mov", ".webm", ".mpg", ".mpeg")


def find_videos(spec: str):
    if os.path.isdir(spec):
        # recursive, like extract_features.find_videos: corpora arrive in
        # class subfolders (the UCF-Crime layout), and both CLIs pointed at
        # the same directory must resolve the same video set. Unlike that
        # finder, an empty result is NOT an error here: --watch polls
        # directories that start out empty.
        return sorted(
            f
            for f in glob.glob(os.path.join(spec, "**", "*"), recursive=True)
            if f.lower().endswith(VIDEO_EXTS)
        )
    if os.path.isfile(spec):
        return [spec]
    return sorted(glob.glob(spec))


def build_scorer(args):
    """(apply_fn, variables, eval_step, model_name) for the scorer model.

    Model resolution: an orbax checkpoint written by run.py is
    self-describing (hparams.json, training/checkpoints.py); its persisted
    model class + config are used unless the user passes ``--model``
    explicitly, and individual ``--model-config`` keys override the
    persisted config (reference parity: save_hyperparameters,
    /root/reference/src/runner.py:23).
    """
    import jax
    import jax.numpy as jnp

    from anomaly_detection_on_video_tpu.config import instantiate, locate
    from anomaly_detection_on_video_tpu.config.compose import parse_value
    from anomaly_detection_on_video_tpu.models import build_model
    from anomaly_detection_on_video_tpu.training.checkpoints import (
        TopKCheckpointer,
    )
    from anomaly_detection_on_video_tpu.training.runner import make_eval_step

    # Fail fast on path typos: extraction is minutes of work, and scoring
    # with random weights would silently produce garbage.
    if args.checkpoint and not os.path.isdir(args.checkpoint):
        raise SystemExit(
            f"--checkpoint {args.checkpoint!r}: no such directory"
        )
    from anomaly_detection_on_video_tpu.utils.hub import (
        is_hub_spec,
        resolve_weights,
    )

    # hf://org/repo/file specs resolve through the HF cache (the
    # reference's automatic weight fetch, src/i3d.py:354-359)
    if args.torch_weights and not is_hub_spec(args.torch_weights) and not (
        os.path.isfile(args.torch_weights)
    ):
        raise SystemExit(
            f"--torch-weights {args.torch_weights!r}: no such file "
            "(or use hf://org/repo/file)"
        )
    i3d_weights = getattr(args, "i3d_weights", None)
    if i3d_weights and not is_hub_spec(i3d_weights) and not os.path.isfile(
        i3d_weights
    ):
        raise SystemExit(
            f"--i3d-weights {i3d_weights!r}: no such file "
            "(or use hf://org/repo/file)"
        )

    overrides = {}
    for kv in args.model_config or []:
        key, _, value = kv.partition("=")
        try:
            # YAML-style scalars like the run CLI (config/compose.py):
            # dims=[64,128,1024], mgfn_types=[gb,fb,fb], dropout_rate=0.7
            overrides[key] = parse_value(value)
        except ValueError as exc:
            raise SystemExit(f"--model-config {kv!r}: {exc}")

    metadata = (
        TopKCheckpointer.load_metadata(args.checkpoint)
        if args.checkpoint
        else None
    )
    if metadata and not args.model:
        node = dict(metadata.get("model_config") or {})
        node.update(overrides)
        model_name = metadata.get("model_name") or "mgfn"
        if "_target_" in node and metadata.get("model_class"):
            model = locate(metadata["model_class"])(instantiate(node))
        else:
            node.pop("_target_", None)
            _, model = build_model(model_name, **node)
    else:
        model_name = args.model or "mgfn"
        _, model = build_model(model_name, **overrides)

    if args.torch_weights:
        import torch

        from anomaly_detection_on_video_tpu.utils.convert import (
            convert_mgfn_state_dict,
            convert_official_mgfn_state_dict,
            convert_rtfm_state_dict,
            convert_sultani_state_dict,
        )

        try:
            resolved = resolve_weights(args.torch_weights)
        except FileNotFoundError as exc:
            # hub fetch failed: user error, not a traceback (same contract
            # as extract_features.py's --weights)
            raise SystemExit(str(exc))
        state_dict = torch.load(resolved, map_location="cpu", weights_only=True)
        if isinstance(state_dict, dict) and "state_dict" in state_dict:
            state_dict = state_dict["state_dict"]
        if model_name == "rtfm":
            convert = convert_rtfm_state_dict
        elif model_name == "sultani":
            convert = convert_sultani_state_dict
        else:
            convert = (
                convert_official_mgfn_state_dict
                if args.official
                else convert_mgfn_state_dict
            )
        try:
            variables = convert(state_dict)
        except (KeyError, ValueError) as exc:
            # e.g. RTFM weights routed through the MGFN converter because
            # --model was omitted: name the mismatch instead of a raw
            # KeyError traceback
            raise SystemExit(
                f"--torch-weights {args.torch_weights!r} does not look "
                f"like a {model_name!r} state dict "
                f"({type(exc).__name__}: {exc}); pass --model "
                "{mgfn,rtfm,sultani} matching the weights, or --official "
                "for the official MGFN release layout"
            )
    elif args.checkpoint:
        from anomaly_detection_on_video_tpu.training import TrainState
        from anomaly_detection_on_video_tpu.training.optim import adam_with_l2

        # train-mode init needs >= 2 bags (normal/abnormal halves); feature
        # dim = channels + 1 magnitude (2049 at the reference defaults)
        channels = getattr(getattr(model, "config", None), "channels", 2048)
        example = jnp.zeros((2, 10, 32, channels + 1), jnp.float32)
        init = jax.jit(model.init, static_argnames=("train",))(
            {
                "params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1),
            },
            example,
            train=True,
        )
        template = TrainState.create(model, init, adam_with_l2())
        ckpt = TopKCheckpointer(args.checkpoint)
        if ckpt.manager.latest_step() is None:
            raise SystemExit(
                f"--checkpoint {args.checkpoint!r}: directory contains no "
                "checkpoints (expected an orbax directory written by run.py)"
            )
        # --checkpoint-step picks latest (default) / best / an exact step.
        # Only step SELECTION errors map to the flag; a restore failure
        # (e.g. a --model-config override reshaping the model away from
        # the stored arrays) propagates as its own ValueError
        try:
            step = ckpt.resolve_step(
                getattr(args, "checkpoint_step", "latest")
            )
        except ValueError as exc:
            raise SystemExit(f"--checkpoint-step: {exc}")
        state = ckpt.restore(template, step=step)
        variables = state.variables
    else:
        raise SystemExit("one of --checkpoint / --torch-weights is required")

    return model.apply, variables, make_eval_step(), model_name, model


def score_features(features, apply_fn, variables, eval_step):
    """(n_clips, n_crops, 2048) f32 features -> (n_clips,) anomaly scores.

    n_crops is 10 under the reference protocol, 1 in --crops center
    serving mode; the scorers crop-average over whatever is there."""
    import jax.numpy as jnp

    from anomaly_detection_on_video_tpu.data.features import pad_eval_batch
    from anomaly_detection_on_video_tpu.training.runner import eval_bucket

    n_clips = features.shape[0]
    feats = pad_eval_batch(features, eval_bucket(n_clips))
    scores = eval_step(
        variables, apply_fn, jnp.asarray(feats),
        jnp.asarray([n_clips], np.int32),
    )
    return np.asarray(scores)[0, :n_clips, 0]


def new_serving_stats():
    """Shared counter structure for both serving modes (--watch heartbeat
    file and --serve /stats)."""
    import time

    return {
        "started_unix": round(time.time(), 1),
        "videos_scored": 0,
        "clips_scored": 0,
        "errors": 0,
    }


def record_scored(stats, res) -> None:
    stats["videos_scored"] += 1
    stats["clips_scored"] += res["n_clips"]
    stats["last_video"] = res["video"]
    stats["last_latency_s"] = res["latency_s"]


def serve_http(args, process) -> None:
    """HTTP scoring endpoint (``--serve PORT``), stdlib only.

    Routes:
      POST /score?name=<file>   raw video bytes -> score JSON (idempotent:
                                an already-scored stem returns its cached
                                JSON without re-extracting)
      GET  /scores/<stem>       previously written score JSON
      GET  /healthz             liveness (responds during scoring)
      GET  /stats               counters + last latency + uptime

    Scoring requests serialize on one lock (one device queue); healthz and
    stats are served from other threads so liveness probes don't time out
    behind a long video. SIGTERM/SIGINT finish the in-flight request and
    shut down cleanly — the serving analog of the trainer's
    preempt_signals.
    """
    import signal
    import threading
    import time
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, unquote, urlparse

    import jax

    score_lock = threading.Lock()
    stats = new_serving_stats()
    spool = os.path.join(args.outdir, "_spool")

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # requests go to stdout, one line
            print(f"{self.address_string()} {fmt % a}", flush=True)

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = urlparse(self.path).path
            if path == "/healthz":
                return self._json(
                    200,
                    {
                        "ok": True,
                        "device": jax.devices()[0].platform,
                        "scoring": score_lock.locked(),
                    },
                )
            if path == "/stats":
                return self._json(
                    200,
                    dict(
                        stats,
                        uptime_s=round(
                            time.time() - stats["started_unix"], 1
                        ),
                    ),
                )
            if path.startswith("/scores/"):
                stem = os.path.basename(unquote(path[len("/scores/"):]))
                score_path = os.path.join(
                    args.outdir, f"{stem}_scores.json"
                )
                if os.path.exists(score_path):
                    with open(score_path) as f:
                        return self._json(200, json.load(f))
                return self._json(404, {"error": f"{stem} not scored"})
            return self._json(404, {"error": f"unknown path {path!r}"})

        def _drain_body(self):
            """Read and discard the request body so closing the socket
            does not RST the queued response out from under the client."""
            remaining = int(self.headers.get("Content-Length") or 0)
            while remaining > 0:
                chunk = self.rfile.read(min(1 << 20, remaining))
                if not chunk:
                    break
                remaining -= len(chunk)

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/score":
                self._drain_body()
                return self._json(404, {"error": f"unknown path {url.path!r}"})
            name = os.path.basename(
                parse_qs(url.query).get("name", ["upload.mp4"])[0]
            )
            if name in ("", ".", ".."):  # basename of 'x/..' is '..': the
                self._drain_body()       # spool open would hit a directory
                return self._json(400, {"error": f"invalid name {name!r}"})
            stem = os.path.splitext(name)[0]
            score_path = os.path.join(args.outdir, f"{stem}_scores.json")
            if os.path.exists(score_path):  # idempotent per stem
                self._drain_body()
                with open(score_path) as f:
                    return self._json(200, json.load(f))
            length = int(self.headers.get("Content-Length") or 0)
            if length <= 0:
                return self._json(400, {"error": "empty request body"})
            # per-request spool subdir: concurrent same-name uploads must
            # not overwrite/delete each other's bytes mid-decode; the
            # basename (the score stem) is preserved inside it
            import tempfile

            os.makedirs(spool, exist_ok=True)
            req_dir = tempfile.mkdtemp(dir=spool)
            video_path = os.path.join(req_dir, name)
            try:
                remaining = length
                # inside the try: a failed write (disk full, client reset)
                # must still produce a JSON error and clean up the spool
                with open(video_path, "wb") as f:  # bounded memory/upload
                    while remaining > 0:
                        chunk = self.rfile.read(min(1 << 20, remaining))
                        if not chunk:
                            break
                        f.write(chunk)
                        remaining -= len(chunk)
                with score_lock:
                    if os.path.exists(score_path):
                        # a concurrent same-stem upload won the race while
                        # this one was spooling: serve its scores instead
                        # of paying extraction twice
                        with open(score_path) as f:
                            res = json.load(f)
                    else:
                        res = process(video_path)
                        record_scored(stats, res)
                return self._json(200, res)
            except Exception as exc:  # one bad upload must not kill serving
                stats["errors"] += 1
                return self._json(500, {"error": str(exc)})
            finally:
                import shutil

                shutil.rmtree(req_dir, ignore_errors=True)

    server = ThreadingHTTPServer((args.serve_host, args.serve), Handler)
    # ThreadingHTTPServer defaults daemon_threads=True, under which
    # server_close() never joins handlers and interpreter exit can kill an
    # in-flight scoring mid-write; non-daemon threads make the SIGTERM
    # path genuinely wait for the current request
    server.daemon_threads = False

    def _shutdown(signum, frame):
        print(f"signal {signum}: shutting down", flush=True)
        # shutdown() must not run on the serve_forever thread (deadlock)
        threading.Thread(target=server.shutdown, daemon=True).start()

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, _shutdown)
        except ValueError:
            pass  # not in the main thread
    print(
        f"serving on {args.serve_host}:{server.server_port}", flush=True
    )
    try:
        server.serve_forever()
    finally:
        server.server_close()


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--videos", default=None,
                        help="video file, directory, or glob (required "
                             "except under --serve, where videos arrive "
                             "over HTTP)")
    parser.add_argument("--outdir", required=True)
    parser.add_argument("--checkpoint", help="orbax checkpoint dir (run.py)")
    parser.add_argument("--checkpoint-step", default="latest",
                        help="which checkpoint to serve: latest (default), "
                             "best (highest recorded valid AUC), or an "
                             "exact step number")
    parser.add_argument("--torch-weights", help="torch MGFN state dict (.pt)")
    parser.add_argument("--official", action="store_true",
                        help="--torch-weights uses the official-release "
                             "layout instead of the HF layout")
    parser.add_argument("--model", default=None,
                        choices=["mgfn", "rtfm", "sultani"],
                        help="scorer family; defaults to the checkpoint's "
                             "persisted hparams.json (else mgfn)")
    parser.add_argument("--model-config", nargs="*", metavar="KEY=VALUE",
                        help="model config overrides (YAML-style values, "
                             "e.g. dims=[64,128,1024] mgfn_types=[gb,fb,fb]); "
                             "applied on top of the checkpoint's hparams")
    parser.add_argument("--i3d-model", default="tushar-n-baseline")
    parser.add_argument("--i3d-weights", default=None,
                        help="torch I3D state dict (.pt); random init if unset")
    parser.add_argument("--dtype", default="bfloat16",
                        choices=["bfloat16", "float32", "int8"],
                        help="I3D compute dtype; int8 quantizes the conv "
                             "path (calibrated on the first video's chunk, "
                             "~1e-5 feature cosine error)")
    parser.add_argument("--batch", type=int, default=240)
    parser.add_argument("--group-mode", default="adaptive",
                        choices=["adaptive", "fixed"],
                        help="extraction group sizing: 'adaptive' (default) "
                             "sizes each request's device group to the "
                             "video via a power-of-two ladder capped at "
                             "--batch — a short serving request no longer "
                             "pays a full fixed group's padding (transfer + "
                             "FLOPs); 'fixed' always uses the --batch-"
                             "derived group (bulk scoring of long videos: "
                             "one compiled shape)")
    parser.add_argument("--crops", default="ten", choices=["ten", "center"],
                        help="'ten' = the reference ten-crop protocol; "
                             "'center' = serving mode, one center crop per "
                             "clip (scores equal running the scorer on "
                             "ten-crop row 4; measured 1155 clips/s at the "
                             "default --batch, 1643 at --batch 960, vs 203 "
                             "ten-crop)")
    parser.add_argument("--stream", default=None,
                        choices=["rgb", "flow", "both"],
                        help="feature stream(s) to extract and score: "
                             "'both' concatenates RGB + optical-flow "
                             "features (4096-d) for checkpoints trained "
                             "with data.stream=both; defaults to the "
                             "checkpoint's persisted data.stream (else rgb)")
    parser.add_argument("--flow-backend", default=None,
                        choices=["host", "device", "tvl1"],
                        help="optical-flow algorithm for --stream flow/both "
                             "(see extract_features.py); default: device "
                             "Farneback on TPU, host cv2 elsewhere")
    parser.add_argument("--features-dir", default=None,
                        help="cache/reuse <stem>_i3d.npy features here")
    parser.add_argument("--compile-cache", default=None, metavar="DIR",
                        help="persistent XLA compilation cache directory: "
                             "serving restarts (--watch) and repeated runs "
                             "reuse compiled executables instead of "
                             "recompiling (utils/compile_cache.py)")
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard the clip axis of feature extraction "
                             "over all local devices (serving analog of "
                             "extract_features.py --data-parallel; scores "
                             "are bit-equal to single-device)")
    parser.add_argument("--frames-per-clip", type=int, default=16)
    parser.add_argument("--threshold", type=float, default=None,
                        help="emit anomaly EVENTS (contiguous frame runs "
                             "scoring above this) in the score JSON / HTTP "
                             "response — the deployment output; pick the "
                             "value with scripts/operating_point.py")
    parser.add_argument("--min-event-frames", type=int, default=1,
                        help="drop events shorter than this many frames "
                             "(debounce; only with --threshold)")
    parser.add_argument("--figure", action="store_true",
                        help="write a <stem>_scores.png overlay per video")
    parser.add_argument("--watch", action="store_true",
                        help="serving loop: poll --videos and score new "
                             "videos as they arrive (skip already-scored; "
                             "wait for file sizes to stabilize)")
    parser.add_argument("--poll-interval", type=float, default=5.0,
                        help="--watch poll period in seconds")
    parser.add_argument("--idle-exit", type=float, default=None,
                        help="--watch: exit after this many seconds with "
                             "no new videos (default: run forever)")
    parser.add_argument("--serve", type=int, default=None, metavar="PORT",
                        help="HTTP scoring endpoint (stdlib, no extra "
                             "deps): POST /score?name=v.mp4 with raw video "
                             "bytes returns the score JSON; GET /healthz, "
                             "/stats, /scores/<stem>. Scoring serializes "
                             "on the device; health/stats stay responsive. "
                             "Port 0 picks a free port (printed). SIGTERM "
                             "shuts down gracefully.")
    parser.add_argument("--serve-host", default="127.0.0.1",
                        help="--serve bind address (0.0.0.0 to expose)")
    parser.add_argument("--export", default=None, metavar="DIR",
                        help="AOT-export the scorer (weights baked in, "
                             "serialized StableHLO per eval bucket, for "
                             "both TPU and CPU) to DIR and exit; serve the "
                             "artifacts with --from-export (utils/aot.py)")
    parser.add_argument("--export-max-clips", type=int, default=1024,
                        help="--export covers every eval bucket a video of "
                             "up to this many clips can hit")
    parser.add_argument("--from-export", default=None, metavar="DIR",
                        help="score with an AOT artifact directory written "
                             "by --export instead of a checkpoint (no "
                             "model rebuild, no scorer recompile)")
    parser.add_argument("--warmup", type=int, default=0, metavar="CLIPS",
                        help="serving warmup: pre-compile the I3D forward "
                             "and every scorer eval bucket up to CLIPS "
                             "clips before accepting work, so first "
                             "requests don't pay XLA compiles (pairs with "
                             "--compile-cache across restarts)")
    args = parser.parse_args(argv)
    if args.watch and args.serve is not None:
        parser.error("--watch and --serve are mutually exclusive")
    if args.export and args.from_export:
        parser.error("--export and --from-export are mutually exclusive")
    if args.export and (args.watch or args.serve is not None):
        parser.error("--export writes the artifacts and exits; it cannot "
                     "be combined with --watch/--serve")
    if args.from_export and (args.checkpoint or args.torch_weights
                             or args.model or args.model_config):
        parser.error("--from-export replaces the checkpoint/model flags: "
                     "the artifact directory is self-describing")
    if args.export_max_clips < 1:
        parser.error("--export-max-clips must be >= 1")
    if args.serve is not None and not 0 <= args.serve <= 65535:
        # 0 = OS-assigned ephemeral port (the bound port is printed)
        parser.error(f"--serve port must be in [0, 65535] (got {args.serve})")
    if args.videos is None and args.serve is None and not args.export:
        parser.error("--videos is required (unless --serve or --export)")
    if args.batch < 1:
        parser.error(f"--batch must be >= 1 (got {args.batch})")
    if args.threshold is not None and not 0.0 <= args.threshold <= 1.0:
        # scores are sigmoid outputs in [0, 1]; an out-of-range threshold
        # silently produces no (or all-frame) events
        parser.error(
            f"--threshold must be in [0, 1] (got {args.threshold}; "
            "frame scores are sigmoid probabilities)"
        )
    if args.threshold is not None and args.dtype == "int8":
        # measured envelope (docs/ROOFLINE.md round 4): int8 preserves
        # ranking (AUC delta < 0.03) but shifts individual frame scores by
        # up to ~0.5 vs bf16 — an absolute cut tuned on bf16 scores can
        # flip events under int8
        print(
            "warning: --threshold with --dtype int8: absolute thresholds "
            "derived on bf16 scores may not transfer (frame scores shift "
            "up to ~0.5; AUC is stable). Re-derive the operating point on "
            "int8-scored data (scripts/operating_point.py); see "
            "docs/ROOFLINE.md.",
            file=sys.stderr,
        )
    if args.crops == "center":
        # the serving protocol trades accuracy for its ~8x throughput: on
        # the synthetic multi-seed measurement (scripts/int8_e2e.py,
        # docs/int8_e2e.json) center-crop costs AUC vs the reference
        # ten-crop eval protocol — an order of magnitude more than int8
        # does. Scorers are trained on ten-crop features; center-crop
        # scores only crop row 4.
        print(
            "note: --crops center is the throughput serving mode; it "
            "scores ONE center crop per clip and measurably costs accuracy "
            "vs the reference ten-crop protocol (multi-seed AUC deltas: "
            "docs/int8_e2e.json protocol_cost; docs/ROOFLINE.md). Use "
            "--crops ten where accuracy matters more than latency.",
            file=sys.stderr,
        )

    videos = find_videos(args.videos) if args.videos else []
    if not videos and not args.watch and args.serve is None and not args.export:
        raise SystemExit(f"no videos match {args.videos!r}")
    os.makedirs(args.outdir, exist_ok=True)

    if args.compile_cache:
        from anomaly_detection_on_video_tpu.utils.compile_cache import (
            enable_compile_cache,
        )

        enable_compile_cache(args.compile_cache)

    import jax.numpy as jnp

    from anomaly_detection_on_video_tpu.data.extraction import (
        FeatureExtractor,
        extract_video_two_stream,
        feature_filename,
    )
    from anomaly_detection_on_video_tpu.ops.metrics import (
        anomaly_events,
        frame_level_scores,
    )

    exported_scorer = None
    if args.from_export:
        from anomaly_detection_on_video_tpu.utils.aot import ExportedScorer

        try:
            exported_scorer = ExportedScorer(args.from_export)
        except (OSError, ValueError) as exc:
            raise SystemExit(f"--from-export: {exc}")
        want_crops = 10 if args.crops == "ten" else 1
        if exported_scorer.n_crops != want_crops:
            raise SystemExit(
                f"--from-export: this artifact was exported for "
                f"{exported_scorer.n_crops} crops per clip but --crops "
                f"{args.crops} extracts {want_crops}; re-export with the "
                "matching --crops"
            )

    stream = args.stream
    if stream is None and exported_scorer is not None:
        stream = exported_scorer.stream
    if stream is None and args.checkpoint:
        # self-describing checkpoints persist their training data config:
        # a data.stream=both run is scored two-stream without extra flags
        from anomaly_detection_on_video_tpu.training.checkpoints import (
            TopKCheckpointer,
        )

        meta = TopKCheckpointer.load_metadata(args.checkpoint) or {}
        stream = (meta.get("data") or {}).get("stream")
    stream = stream or "rgb"

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from extract_features import load_weights

    import jax

    mesh = None
    if args.data_parallel and len(jax.local_devices()) > 1:
        from anomaly_detection_on_video_tpu.parallel import make_mesh

        devices = jax.local_devices()
        mesh = make_mesh((len(devices),), ("data",), devices)

    def make_extractor(s):
        return FeatureExtractor(
            model_name=args.i3d_model,
            variables=i3d_variables,
            dtype=jnp.float32 if args.dtype == "float32" else jnp.bfloat16,
            quantize=(args.dtype == "int8"),
            batch=args.batch,
            frames_per_clip=args.frames_per_clip,
            crops=args.crops,
            mesh=mesh,
            stream=s,
            flow_backend=args.flow_backend if s == "flow" else None,
            adaptive_groups=args.group_mode == "adaptive",
        )

    # scorer first: its checkpoint/weights validation must fail fast,
    # before the (expensive, warning-emitting) I3D extractor is built
    if exported_scorer is not None:
        model_name = exported_scorer.model_name
        scorer_model = None
        score_fn = exported_scorer.score
    else:
        apply_fn, variables, eval_step, model_name, scorer_model = (
            build_scorer(args)
        )

        def score_fn(features):
            return score_features(features, apply_fn, variables, eval_step)

    # fail fast on a stream/scorer width mismatch: this CLI's extractor
    # emits 2048-d features per stream (4096-d concatenated for 'both'),
    # and a mismatched scorer would otherwise die mid-run on the first
    # video with an opaque flax shape error
    extracted_dim = 4096 if stream == "both" else 2048
    scorer_dim = (
        exported_scorer.channels
        if exported_scorer is not None
        else getattr(
            getattr(scorer_model, "config", None), "channels", extracted_dim
        )
    )
    # --export never extracts: any feature width is exportable (the width
    # is recorded in the manifest and re-validated at --from-export time)
    if scorer_dim != extracted_dim and not args.export:
        hint = (
            "retrain with data.stream=both or pass --model-config "
            "channels=4096"
            if stream == "both"
            else "pass --stream both (this scorer was trained on "
            "concatenated RGB+flow features)"
            if scorer_dim == 4096
            else f"pass --model-config channels={extracted_dim}"
        )
        raise SystemExit(
            f"--stream {stream} extracts {extracted_dim}-d features but "
            f"the {model_name} scorer expects {scorer_dim}-d input; {hint}"
        )

    if args.export:
        import time as _time

        from anomaly_detection_on_video_tpu.utils.aot import (
            export_buckets,
            export_scorer,
            save_scorer_export,
        )

        t0 = _time.time()
        n_crops = 10 if args.crops == "ten" else 1
        buckets = export_buckets(args.export_max_clips)
        blobs = export_scorer(
            apply_fn,
            variables,
            channels=scorer_dim,
            n_crops=n_crops,
            buckets=buckets,
        )
        manifest_path = save_scorer_export(
            args.export,
            blobs,
            model_name=model_name,
            channels=scorer_dim,
            n_crops=n_crops,
            stream=stream,
        )
        total_kb = sum(len(b) for b in blobs.values()) // 1024
        print(
            f"exported {model_name} scorer for buckets {buckets} "
            f"({n_crops} crops, {scorer_dim}-d, {total_kb} KB) in "
            f"{_time.time() - t0:.1f}s -> {manifest_path}"
        )
        return

    # load once, after the scorer validation above has had its chance to
    # fail fast: --stream both builds two extractors from this one tree
    # (the flow stream's 2-channel stem bootstraps from the RGB weights
    # inside FeatureExtractor)
    try:
        i3d_variables = load_weights(
            args.i3d_weights, args.i3d_model, flag="--i3d-weights"
        )
    except FileNotFoundError as exc:
        raise SystemExit(str(exc))  # hub fetch failed: user error

    extractor = make_extractor("rgb" if stream != "flow" else "flow")
    flow_extractor = make_extractor("flow") if stream == "both" else None
    if args.features_dir and stream in ("flow", "both"):
        # pin the flow definition of the cache directory exactly as
        # extract_features.py does (data/extraction.record_flow_backend):
        # the backends differ numerically, so a cache reused with another
        # backend would silently mix flow definitions across videos
        from anomaly_detection_on_video_tpu.data.extraction import (
            record_flow_backend,
        )

        fe = flow_extractor if stream == "both" else extractor
        try:
            record_flow_backend(args.features_dir, fe.flow_backend)
        except ValueError as exc:
            raise SystemExit(str(exc))
    if args.dtype == "int8":
        # pin calibration scales so watcher restarts / later runs quantize
        # identically to any features already cached (data/extraction.py
        # pin_calibration; extract_features.py does the same)
        extractor.pin_calibration(args.features_dir or args.outdir)
        if flow_extractor is not None:
            flow_extractor.pin_calibration(args.features_dir or args.outdir)

    if args.warmup > 0:
        import time as _time

        from anomaly_detection_on_video_tpu.training.runner import eval_bucket

        t0 = _time.time()
        # compiles fused preprocessing (per input resolution; 240x320
        # is the dominant UCF-Crime shape) + the I3D forward (shared
        # by every resolution — the expensive compile). Flow streams
        # consume quantized 2-channel flow; 127 is the zero-flow level.
        # Guard per extractor: int8 calibrates activation scales on the
        # first REAL chunk, and warming up on a constant chunk would pin
        # degenerate scales (each stream calibrates independently)
        for ex in filter(None, (extractor, flow_extractor)):
            if ex.quantize and getattr(ex, "_needs_calibration", False):
                print(
                    f"warmup: skipping {ex.stream} extractor (int8 awaits "
                    "calibration on the first real video)", flush=True,
                )
                continue
            ex.extract_frames(np.full(
                (args.frames_per_clip, 240, 320, ex.channels),
                127, np.uint8,
            ))
        # every scorer eval bucket a video of <= --warmup clips can hit
        from anomaly_detection_on_video_tpu.utils.aot import export_buckets

        buckets = set(export_buckets(args.warmup))
        if exported_scorer is not None:
            # AOT artifacts only exist for their exported buckets
            buckets = {b for b in buckets if b <= exported_scorer.buckets[-1]}
        n_crops = 10 if args.crops == "ten" else 1
        # the scorer's true feature width, validated against the stream
        # mode above (two-stream checkpoints carry channels=4096)
        fdim = scorer_dim
        for bucket in sorted(buckets):
            score_fn(np.zeros((bucket, n_crops, fdim), np.float32))
        print(
            f"warmup done in {_time.time() - t0:.1f}s "
            f"(eval buckets {sorted(buckets)})",
            flush=True,
        )

    from anomaly_detection_on_video_tpu.utils.npyio import atomic_save

    def cache_path(stem, s):
        if not args.features_dir:
            return None
        # center-crop features get their own cache name: they are (n, 1, C)
        # and must neither shadow nor be shadowed by the reference
        # ten-crop contract files (<stem>_i3d.npy, (n, 10, C))
        name = feature_filename(stem, s)
        if args.crops == "center":
            name = name[: -len(".npy")] + "_center.npy"
        return os.path.join(args.features_dir, name)

    def save_features(path, features):
        os.makedirs(args.features_dir, exist_ok=True)
        atomic_save(path, features)

    def load_or_extract(path, stem):
        """Features for the active stream mode, via the per-stream cache."""
        if stream == "both":
            rgb_p, flow_p = cache_path(stem, "rgb"), cache_path(stem, "flow")
            if rgb_p and os.path.exists(rgb_p) and os.path.exists(flow_p):
                rgb, flow = np.load(rgb_p), np.load(flow_p)
            else:
                rgb, flow = extract_video_two_stream(
                    extractor, flow_extractor, path
                )
                if rgb_p:
                    save_features(rgb_p, rgb)
                    save_features(flow_p, flow)
            # same feature-axis fusion as training's data.stream=both
            # (data/features._select_stream)
            return np.concatenate([rgb, flow], axis=-1)
        feat_path = cache_path(stem, stream)
        if feat_path and os.path.exists(feat_path):
            return np.load(feat_path)
        features = extractor.extract_video(path)
        if feat_path:
            save_features(feat_path, features)
        return features

    def process(path):
        import time as _time

        t0 = _time.time()
        stem = os.path.splitext(os.path.basename(path))[0]
        features = load_or_extract(path, stem)

        clip_scores = score_fn(features)
        frame_scores = frame_level_scores(clip_scores, args.frames_per_clip)

        out = {
            "video": os.path.basename(path),
            "model": model_name,
            "stream": stream,
            "n_clips": int(features.shape[0]),
            "frames_per_clip": args.frames_per_clip,
            "clip_scores": np.round(clip_scores, 6).tolist(),
            "frame_scores": np.round(frame_scores, 6).tolist(),
            "latency_s": round(_time.time() - t0, 3),
        }
        if args.threshold is not None:
            # deployment output: thresholded event windows, not raw scores
            # (the inverse of the GT builder's window -> frame expansion)
            out["threshold"] = args.threshold
            out["events"] = anomaly_events(
                frame_scores, args.threshold, args.min_event_frames
            )
        out_path = os.path.join(args.outdir, f"{stem}_scores.json")
        # atomic: the HTTP endpoint reads score JSONs concurrently, and a
        # kill mid-write must not leave a truncated file that poisons the
        # idempotency check forever
        tmp_path = out_path + ".tmp"
        with open(tmp_path, "w") as f:
            json.dump(out, f)
        os.replace(tmp_path, out_path)
        print(
            f"{stem}: {features.shape[0]} clips, "
            f"max score {clip_scores.max():.4f} -> {out_path}"
        )

        if args.figure:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots(figsize=(12, 3))
            ax.plot(frame_scores)
            if args.threshold is not None:
                ax.axhline(args.threshold, ls="--", lw=1, color="crimson")
            ax.set_ylim(0, 1.02)
            ax.set_xlabel("frame")
            ax.set_ylabel("anomaly score")
            ax.set_title(stem)
            fig.tight_layout()
            fig.savefig(os.path.join(args.outdir, f"{stem}_scores.png"), dpi=80)
            plt.close(fig)
        return out

    if args.serve is not None:
        serve_http(args, process)
        return

    if not args.watch:
        from extract_features import warn_duplicate_stems

        # score JSONs are stem-keyed: same-stem videos from different
        # subfolders would silently skip as "already scored"
        warn_duplicate_stems(videos, what="scored")
        for path in videos:
            try:
                process(path)
            except ValueError as exc:
                # e.g. a video longer than the largest exported AOT bucket,
                # or an undecodable file — a user problem, not a traceback
                raise SystemExit(f"{path}: {exc}")
        return

    # serving loop: score each video once its size is stable across two
    # polls (the producer finished writing); skip anything already scored
    import time

    # transient failures (the TPU tunnel's hour-long outages, OOM, races)
    # retry on a cooldown; permanent ones (undecodable file, over the AOT
    # bucket ceiling — ValueError from process) only retry if the producer
    # rewrites the file (size change)
    error_retry_s = max(30.0, 2.0 * args.poll_interval)

    def video_status(path, size):
        """``"done"`` (scored, or permanently failed at this size),
        ``"cooldown"`` (transient failure waiting out error_retry_s — still
        pending work for the idle-exit clock), or ``"ready"``."""
        stem = os.path.splitext(os.path.basename(path))[0]
        if os.path.exists(os.path.join(args.outdir, f"{stem}_scores.json")):
            return "done"
        # a permanently-failed video is skipped only while its size is
        # unchanged: if the producer re-writes/completes the file, it is
        # retried; transient failures retry after error_retry_s regardless
        err_path = os.path.join(args.outdir, f"{stem}_scores.error.json")
        if os.path.exists(err_path):
            try:
                with open(err_path) as f:
                    err = json.load(f)
            except (OSError, ValueError):
                return "ready"
            if err.get("size") != size:
                return "ready"
            if not err.get("retryable", False):
                return "done"
            try:
                age = time.time() - os.path.getmtime(err_path)
            except OSError:
                return "ready"
            return "cooldown" if age < error_retry_s else "ready"
        return "ready"

    # serving heartbeat: counters written atomically to
    # <outdir>/_serving_stats.json every poll, so an operator (or a probe)
    # can monitor a long-running watcher without parsing its stdout
    stats = new_serving_stats()

    def write_stats(n_watching):
        snap = dict(
            stats,
            watching=n_watching,
            uptime_s=round(time.time() - stats["started_unix"], 1),
        )
        tmp = os.path.join(args.outdir, "_serving_stats.json.tmp")
        with open(tmp, "w") as f:
            json.dump(snap, f)
        os.replace(tmp, os.path.join(args.outdir, "_serving_stats.json"))

    last_sizes = {}
    last_new = time.time()
    print(
        f"watching {args.videos!r} every {args.poll_interval:g}s "
        f"(idle-exit: {args.idle_exit})",
        flush=True,
    )
    while True:
        sizes = {}
        for path in find_videos(args.videos):
            try:
                sizes[path] = os.path.getsize(path)
            except OSError:
                continue  # vanished between listing and stat
        for path, size in sorted(sizes.items()):
            status = video_status(path, size)
            if status == "done":
                continue
            if status == "cooldown":
                # a transient failure waiting to retry is pending work:
                # don't let --idle-exit drain out from under it
                last_new = time.time()
                continue
            if last_sizes.get(path) != size:
                # new this poll or still growing: unfinished work, so the
                # idle-exit clock must not run out mid-copy
                last_new = time.time()
                continue
            try:
                record_scored(stats, process(path))
            except Exception as exc:  # one bad file must not kill serving
                stats["errors"] += 1
                print(f"warning: {path}: {exc}", file=sys.stderr)
                stem = os.path.splitext(os.path.basename(path))[0]
                # never touch <stem>_scores.json (a late failure, e.g. in
                # the figure writer, must not destroy valid scores); the
                # recorded size + retryable flag gate the retry in scored()
                if not os.path.exists(
                    os.path.join(args.outdir, f"{stem}_scores.json")
                ):
                    err_path = os.path.join(
                        args.outdir, f"{stem}_scores.error.json"
                    )
                    with open(err_path, "w") as f:
                        json.dump(
                            {
                                "video": os.path.basename(path),
                                "error": str(exc),
                                "size": size,
                                # ValueError (undecodable / over the AOT
                                # bucket ceiling, the one-shot path's
                                # SystemExit rule) and FileNotFoundError
                                # (unopenable bytes) are file problems —
                                # retried only if the file is rewritten;
                                # everything else (device outage, OOM) is
                                # assumed transient
                                "retryable": not isinstance(
                                    exc, (ValueError, FileNotFoundError)
                                ),
                            },
                            f,
                        )
            last_new = time.time()
        last_sizes = sizes
        write_stats(len(sizes))
        if args.idle_exit is not None and time.time() - last_new > args.idle_exit:
            print("idle; exiting watch loop", flush=True)
            return
        time.sleep(args.poll_interval)


if __name__ == "__main__":
    main()
