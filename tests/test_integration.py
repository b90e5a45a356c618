"""End-to-end integration: video -> features -> GT -> training -> AUC.

The full reference workflow (SURVEY.md §4 integration tier) on synthetic
videos through the actual CLI entry points, all on CPU.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    XLA_FLAGS="--xla_force_host_platform_device_count=2",
    PYTHONPATH=REPO,
    # the image's sitecustomize registers the axon TPU plugin (gated on
    # this var) and force-resets jax_platforms to "axon,cpu" at interpreter
    # start, overriding JAX_PLATFORMS above — the spawned CLIs would then
    # run through the TPU tunnel (and hang whenever it is down). Emptying
    # the gate keeps subprocess e2e tests on the host CPU unconditionally.
    PALLAS_AXON_POOL_IPS="",
)


def write_video(path, n_frames=40, size=(64, 48), seed=0):
    import cv2

    rng = np.random.RandomState(seed)
    writer = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"MJPG"), 30, size
    )
    assert writer.isOpened()
    for _ in range(n_frames):
        writer.write(rng.randint(0, 255, (size[1], size[0], 3), np.uint8))
    writer.release()


def run_cli(script, *args):
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, script), *args],
        capture_output=True,
        text=True,
        env=ENV,
        cwd=REPO,
        timeout=1200,
    )
    assert result.returncode == 0, (
        f"{script} failed:\nSTDOUT:{result.stdout}\nSTDERR:{result.stderr}"
    )
    return result


@pytest.mark.slow
def test_full_pipeline(tmp_path):
    videos = tmp_path / "videos"
    videos.mkdir()
    # names follow UCF conventions: Normal_* vs <class>* (abnormal)
    specs = [
        ("Normal_Videos_001_x264.avi", 40),
        ("Normal_Videos_002_x264.avi", 35),
        ("Abuse001_x264.avi", 40),
        ("Abuse002_x264.avi", 50),
    ]
    for i, (name, frames) in enumerate(specs):
        write_video(videos / name, n_frames=frames, seed=i)

    out = tmp_path / "features"

    # 1. extraction CLI: train split (with segments)
    run_cli(
        "extract_features.py",
        "--videos", str(videos),
        "--outdir", str(out),
        "--split", "train",
        "--dtype", "float32",
        "--batch", "8",
    )
    train_dir = out / "train"
    files = sorted(os.listdir(train_dir))
    assert files == sorted(f"{n[:-4]}_i3d.npy" for n, _ in specs)
    feats = np.load(train_dir / "Abuse002_x264_i3d.npy")
    assert feats.shape == (4, 10, 2048)  # ceil(50/16) clips
    seg_dir = out / "segment_features_32"
    segs = np.load(seg_dir / "Abuse002_x264_i3d.npy")
    assert segs.shape == (10, 32, 2048)

    # idempotency: second run extracts nothing new
    result = run_cli(
        "extract_features.py",
        "--videos", str(videos), "--outdir", str(out), "--split", "train",
        "--dtype", "float32", "--batch", "8", "--no-segments",
    )
    assert "extracted 0 new" in result.stdout

    # 2. reuse clip features as the "test" split + GT builder CLI
    test_dir = out / "test"
    test_dir.mkdir()
    for f in files:
        np.save(test_dir / f, np.load(train_dir / f))
    annot = tmp_path / "annots.txt"
    lines = []
    for name, frames in specs:
        stem = name[:-4]
        n_clips = -(-frames // 16)
        if "Normal" in name:
            lines.append(f"{stem}.mp4  Normal  -1  -1  -1  -1")
        else:
            lines.append(f"{stem}.mp4  Abuse  4  {n_clips * 16 - 2}  -1  -1")
    annot.write_text("\n".join(lines) + "\n")
    gt_path = tmp_path / "gt.json"
    run_cli(
        "make_gt_ucf.py",
        "--annotations", str(annot),
        "--features", str(test_dir),
        "--out", str(gt_path),
    )
    gt = json.load(open(gt_path))
    assert len(gt) == 4
    assert len(gt["Abuse002_x264"]) == 4 * 16

    # 3. training CLI: tiny MGFN over the segment features, eval on test
    run_dir = tmp_path / "run"
    result = run_cli(
        "run.py",
        "runner=mgfn",
        f"data.train_path={seg_dir}",
        f"data.test_path={test_dir}",
        f"data.ground_truth_path={gt_path}",
        "data.batch_size=2",
        # max_epochs alone would run 5 steps (1 step/epoch here); the
        # reference trainer's max_steps knob must cut training at step 3,
        # with log_every_n_steps thinning per-step metrics and
        # gradient_clip_val accepted (Lightning knob parity)
        "trainer.max_epochs=5",
        "trainer.max_steps=3",
        "trainer.log_every_n_steps=2",
        "trainer.gradient_clip_val=1.0",
        f"trainer.log_path={run_dir}/metrics.jsonl",
        f"trainer.checkpoint.dirpath={run_dir}/ckpt",
        # shrink the model so the CPU test is fast
        "runner.model_config.dims=[16,16,32]",
        "runner.model_config.depths=[1,1,1]",
        "runner.model_config.dim_head=8",
    )
    assert "valid/rec_auc=" in result.stdout
    assert "max_steps 3 reached at step 3" in result.stdout
    records = [json.loads(l) for l in open(run_dir / "metrics.jsonl")]
    keys = {k for r in records for k in r}
    assert {"train_loss", "valid/rec_auc", "valid/pr_auc"} <= keys
    # log_every_n_steps=2: of step indices 0..2, only index 1 hits the
    # every-2nd-step boundary
    assert [r["step"] for r in records if "train_loss" in r] == [1]
    # checkpoints written, self-describing (hparams.json, run.py)
    assert any(os.scandir(run_dir / "ckpt"))
    hparams = json.load(open(run_dir / "ckpt" / "hparams.json"))
    assert hparams["model_name"] == "mgfn"
    assert hparams["model_config"]["dims"] == [16, 16, 32]

    # 4. eval-only mode: score the trained checkpoint on the test split
    # without train features (train_path points nowhere on purpose)
    result = run_cli(
        "run.py",
        "runner=mgfn",
        "trainer.eval_only=true",
        "trainer.eval_report=true",
        f"data.test_path={test_dir}",
        f"data.ground_truth_path={gt_path}",
        f"trainer.checkpoint.dirpath={run_dir}/ckpt",
        "trainer.log_path=",
        "runner.model_config.dims=[16,16,32]",
        "runner.model_config.depths=[1,1,1]",
        "runner.model_config.dim_head=8",
    )
    eval_line = json.loads(result.stdout.strip().splitlines()[-1])
    assert eval_line["step"] >= 1
    assert 0.0 <= eval_line["valid/rec_auc"] <= 1.0
    assert 0.0 <= eval_line["valid/pr_auc"] <= 1.0
    # trainer.eval_report=true appends the literature-standard breakdown
    # (EvalResult.report): FAR on normal videos + per-class AUC
    assert 0.0 <= eval_line["valid/far"] <= 1.0
    report = eval_line["report"]
    assert report["normal_videos"] >= 1 and report["abnormal_videos"] >= 1
    assert report["far"] == eval_line["valid/far"]
    for cls, entry in report["per_class"].items():
        assert cls != "Normal" and entry["videos"] >= 1

    # 5. eval-only on an empty checkpoint dir is a clean error (evaluating
    # random weights would be meaningless, run.py)
    empty_ckpt = tmp_path / "empty-ckpt"
    empty_ckpt.mkdir()
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "run.py"),
         "runner=mgfn",
         "trainer.eval_only=true",
         f"data.test_path={test_dir}",
         f"data.ground_truth_path={gt_path}",
         f"trainer.checkpoint.dirpath={empty_ckpt}",
         "trainer.log_path=",
         "runner.model_config.dims=[16,16,32]",
         "runner.model_config.depths=[1,1,1]",
         "runner.model_config.dim_head=8"],
        capture_output=True, text=True, env=ENV, cwd=REPO, timeout=600,
    )
    assert result.returncode != 0
    assert "no checkpoint found" in result.stderr
    assert "Traceback" not in result.stderr


@pytest.mark.slow
def test_demo_script_mechanics(tmp_path):
    """scripts/demo.py --skip-extract: synthetic-bag training + AOT export
    run end to end through the real CLIs (the air-gapped quickstart;
    extraction is exercised by test_full_pipeline)."""
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "demo.py"),
         "--workdir", str(tmp_path / "demo"),
         "--skip-extract", "--epochs", "2"],
        capture_output=True, text=True, env=ENV, cwd=REPO, timeout=1200,
    )
    assert result.returncode == 0, (
        f"STDOUT:{result.stdout}\nSTDERR:{result.stderr}"
    )
    assert "demo complete" in result.stdout
    assert (tmp_path / "demo" / "scorer_aot" / "manifest.json").exists()
    assert any((tmp_path / "demo" / "checkpoints").iterdir())


def test_make_gt_cli_offline_hub_is_clean_error(tmp_path):
    """HF mode (no --annotations/--features) on a host with no network must
    print argparse's one-line error, not a LocalEntryNotFoundError traceback
    (make_gt_ucf.py). HF_HUB_OFFLINE pins the no-network condition."""
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "make_gt_ucf.py"),
         "--out", str(tmp_path / "gt.json")],
        capture_output=True, text=True, cwd=REPO, timeout=600,
        env=dict(ENV, HF_HUB_OFFLINE="1"),
    )
    assert result.returncode != 0
    assert "cannot download" in result.stderr
    assert "Traceback" not in result.stderr


def test_run_cli_missing_data_is_clean_error(tmp_path):
    """A bad data path (or, with no path, a failed hub download on a
    zero-network host) must exit with a one-line `data error:`, not a
    traceback (run.py load_split)."""
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "run.py"),
         "runner=mgfn",
         "data.test_path=/nonexistent/features_xyz",
         "trainer.log_path="],
        capture_output=True, text=True, env=ENV, cwd=REPO, timeout=600,
    )
    assert result.returncode != 0
    assert "data error:" in result.stderr
    assert "Traceback" not in result.stderr


@pytest.mark.slow
def test_run_cli_tensor_parallel(tmp_path):
    """The VERDICT r2 acceptance command: `run.py runner=mgfn seed=1
    trainer.tensor_parallel=2` must compose (root scalar override) and train
    on a virtual DP x TP mesh end-to-end."""
    rng = np.random.RandomState(0)
    seg_dir = tmp_path / "segments"
    test_dir = tmp_path / "test"
    seg_dir.mkdir()
    test_dir.mkdir()
    gt = {}
    for i in range(4):
        prefix = "Normal_Videos" if i % 2 == 0 else "Abuse"
        name = f"{prefix}{i:03d}_x264_i3d.npy"
        np.save(seg_dir / name, rng.randn(10, 32, 2048).astype(np.float32))
        np.save(test_dir / name, rng.randn(3, 10, 2048).astype(np.float32))
        gt[name[:-8]] = [0.0 if i % 2 == 0 else 1.0] * (3 * 16)
    gt_path = tmp_path / "gt.json"
    gt_path.write_text(json.dumps(gt))

    run_dir = tmp_path / "run"
    result = run_cli(
        "run.py",
        "runner=mgfn",
        "seed=1",
        "trainer.tensor_parallel=2",
        f"data.train_path={seg_dir}",
        f"data.test_path={test_dir}",
        f"data.ground_truth_path={gt_path}",
        "data.batch_size=2",
        "trainer.max_epochs=1",
        f"trainer.log_path={run_dir}/metrics.jsonl",
        "trainer.checkpoint.dirpath=",
        "runner.model_config.dims=[16,16,32]",
        "runner.model_config.depths=[1,1,1]",
        "runner.model_config.dim_head=8",
    )
    assert "valid/rec_auc=" in result.stdout


@pytest.mark.slow
def test_run_cli_preemption_checkpoint(tmp_path):
    """SIGTERM mid-training = graceful preemption: the step finishes, a
    final checkpoint is written, the process exits 0, and a resume run
    continues from the preemption step (trainer.preempt_signals)."""
    import signal
    import time

    rng = np.random.RandomState(0)
    seg_dir = tmp_path / "segments"
    test_dir = tmp_path / "test"
    seg_dir.mkdir()
    test_dir.mkdir()
    gt = {}
    for i in range(4):
        prefix = "Normal_Videos" if i % 2 == 0 else "Abuse"
        name = f"{prefix}{i:03d}_x264_i3d.npy"
        np.save(seg_dir / name, rng.randn(10, 32, 2048).astype(np.float32))
        np.save(test_dir / name, rng.randn(3, 10, 2048).astype(np.float32))
        gt[name[:-8]] = [0.0 if i % 2 == 0 else 1.0] * (3 * 16)
    gt_path = tmp_path / "gt.json"
    gt_path.write_text(json.dumps(gt))

    run_dir = tmp_path / "run"
    cli_args = [
        "runner=mgfn",
        f"data.train_path={seg_dir}",
        f"data.test_path={test_dir}",
        f"data.ground_truth_path={gt_path}",
        "data.batch_size=2",
        f"trainer.log_path={run_dir}/metrics.jsonl",
        f"trainer.checkpoint.dirpath={run_dir}/ckpt",
        "trainer.eval_every=1000",  # preemption must not wait on an eval
        "runner.model_config.dims=[16,16,32]",
        "runner.model_config.depths=[1,1,1]",
        "runner.model_config.dim_head=8",
    ]
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "run.py"),
         "trainer.max_epochs=100000", *cli_args],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=ENV, cwd=REPO,
    )
    # wait for the first logged train step (the signal handler is installed
    # at fit() entry, before step 1), then preempt
    metrics_path = run_dir / "metrics.jsonl"
    deadline = time.time() + 900
    while time.time() < deadline:
        if metrics_path.exists() and "train_loss" in metrics_path.read_text():
            break
        if proc.poll() is not None:
            break
        time.sleep(1.0)
    proc.send_signal(signal.SIGTERM)
    stdout, stderr = proc.communicate(timeout=600)
    assert proc.returncode == 0, f"STDOUT:{stdout}\nSTDERR:{stderr}"
    assert "checkpoint saved at step" in stdout
    records = [json.loads(l) for l in open(metrics_path)]
    preempt = [r for r in records if "preempted_at_step" in r]
    assert preempt and preempt[-1]["preempted_at_step"] >= 1
    assert any(os.scandir(run_dir / "ckpt"))

    # resume continues step numbering from the preemption checkpoint
    result = run_cli(
        "run.py", "trainer.max_epochs=1", "trainer.resume=true", *cli_args
    )
    assert "resumed from step" in result.stdout
    resumed = int(result.stdout.split("resumed from step")[1].split()[0])
    assert resumed == preempt[-1]["preempted_at_step"]


def test_run_cli_requires_model_selection():
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "run.py")],
        capture_output=True, text=True, env=ENV, cwd=REPO, timeout=300,
    )
    assert result.returncode != 0
    assert "runner=mgfn" in result.stderr


@pytest.mark.slow
def test_infer_cli_end_to_end(tmp_path):
    """infer.py: raw video + orbax checkpoint -> per-frame score JSON."""
    import jax
    import jax.numpy as jnp

    from anomaly_detection_on_video_tpu.models import build_model
    from anomaly_detection_on_video_tpu.training import TrainState
    from anomaly_detection_on_video_tpu.training.checkpoints import (
        TopKCheckpointer,
    )
    from anomaly_detection_on_video_tpu.training.optim import adam_with_l2

    videos = tmp_path / "videos"
    videos.mkdir()
    write_video(videos / "Abuse_demo.avi", n_frames=40)

    # a tiny-width MGFN checkpoint over the real 2048-d feature interface
    overrides = dict(dims=(16, 16, 32), depths=(1, 1, 1), dim_head=8)
    _, model = build_model("mgfn", **overrides)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((2, 10, 32, 2049), jnp.float32),
        train=True,
    )
    state = TrainState.create(model, variables, adam_with_l2())
    ckpt = TopKCheckpointer(str(tmp_path / "ckpts"))
    ckpt.save(step=1, state=state, metric=0.5)
    ckpt.wait()
    # self-describing checkpoint (as run.py writes): no --model-config flags
    # needed on the infer CLI even though the config is non-default
    ckpt.write_metadata(
        {
            "model_name": "mgfn",
            "model_class": (
                "anomaly_detection_on_video_tpu.models.mgfn."
                "MGFNForVideoAnomalyDetection"
            ),
            "model_config": {
                "_target_": (
                    "anomaly_detection_on_video_tpu.models.mgfn.MGFNConfig"
                ),
                "dims": [16, 16, 32],
                "depths": [1, 1, 1],
                "dim_head": 8,
            },
        }
    )

    outdir = tmp_path / "scores"
    run_cli(
        "infer.py",
        "--videos", str(videos),
        "--checkpoint", str(tmp_path / "ckpts"),
        "--outdir", str(outdir),
        "--dtype", "float32",
        "--batch", "10",
        "--figure",
        "--compile-cache", str(tmp_path / "xla_cache"),
    )
    # the persistent compilation cache captured this process's executables
    assert any((tmp_path / "xla_cache").iterdir())
    out = json.loads((outdir / "Abuse_demo_scores.json").read_text())
    assert out["n_clips"] == 3  # 40 frames -> 3 x 16-frame clips (loop-pad)
    assert len(out["frame_scores"]) == 3 * 16
    assert all(0.0 <= s <= 1.0 for s in out["frame_scores"])
    assert (outdir / "Abuse_demo_scores.png").exists()


@pytest.mark.slow
def test_infer_cli_watch_mode(tmp_path):
    """--watch serving loop: a video present at startup and one dropped in
    mid-run both get scored; already-scored videos are skipped; the loop
    exits on --idle-exit."""
    import time

    import jax
    import jax.numpy as jnp

    from anomaly_detection_on_video_tpu.models import build_model
    from anomaly_detection_on_video_tpu.training import TrainState
    from anomaly_detection_on_video_tpu.training.checkpoints import (
        TopKCheckpointer,
    )
    from anomaly_detection_on_video_tpu.training.optim import adam_with_l2

    videos = tmp_path / "videos"
    videos.mkdir()
    write_video(videos / "first.avi", n_frames=20)

    # a sultani checkpoint: cheapest scorer, and exercises the third family
    # through the serving surface
    _, model = build_model("sultani")
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((2, 10, 32, 2049), jnp.float32),
        train=True,
    )
    state = TrainState.create(model, variables, adam_with_l2())
    ckpt = TopKCheckpointer(str(tmp_path / "ckpts"))
    ckpt.save(step=1, state=state, metric=0.5)
    ckpt.wait()
    ckpt.write_metadata({"model_name": "sultani", "model_config": {}})

    outdir = tmp_path / "scores"
    proc = subprocess.Popen(
        [
            sys.executable, os.path.join(REPO, "infer.py"),
            "--videos", str(videos),
            "--checkpoint", str(tmp_path / "ckpts"),
            "--outdir", str(outdir),
            "--dtype", "float32",
            "--batch", "10",
            "--watch", "--poll-interval", "1", "--idle-exit", "45",
        ],
        env=ENV, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
    )
    try:
        deadline = time.time() + 600
        while not (outdir / "first_scores.json").exists():
            assert proc.poll() is None, proc.communicate()[0]
            assert time.time() < deadline, "first video never scored"
            time.sleep(2)
        write_video(videos / "second.avi", n_frames=35, seed=1)
        while not (outdir / "second_scores.json").exists():
            assert proc.poll() is None, proc.communicate()[0]
            assert time.time() < deadline, "dropped-in video never scored"
            time.sleep(2)
        # an undecodable file: scored once as a PERMANENT failure
        # (retryable=false) so it neither blocks --idle-exit nor retries
        (videos / "bad.avi").write_bytes(b"not a video" * 64)
        while not (outdir / "bad_scores.error.json").exists():
            assert proc.poll() is None, proc.communicate()[0]
            assert time.time() < deadline, "bad video never error-scored"
            time.sleep(2)
        out, _ = proc.communicate(timeout=300)  # idle-exit fires
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, out
    assert "idle; exiting watch loop" in out
    bad_err = json.loads((outdir / "bad_scores.error.json").read_text())
    assert bad_err["retryable"] is False
    assert not (outdir / "bad_scores.json").exists()

    first = json.loads((outdir / "first_scores.json").read_text())
    second = json.loads((outdir / "second_scores.json").read_text())
    assert first["model"] == "sultani"
    assert len(first["frame_scores"]) == 2 * 16  # ceil(20/16) clips
    assert len(second["frame_scores"]) == 3 * 16
    assert all(0.0 <= s <= 1.0 for s in second["frame_scores"])
    assert first["latency_s"] > 0

    # serving heartbeat: written atomically every poll
    stats = json.loads((outdir / "_serving_stats.json").read_text())
    assert stats["videos_scored"] == 2
    assert stats["clips_scored"] == 2 + 3
    assert stats["errors"] == 1  # the undecodable bad.avi
    assert stats["watching"] == 3
    assert stats["last_latency_s"] > 0
    assert stats["uptime_s"] > 0


@pytest.mark.slow
def test_infer_cli_http_serving(tmp_path):
    """--serve: POST a video's bytes, get its score JSON back; healthz and
    stats respond; repeat POSTs return the cached scores; SIGTERM shuts
    down gracefully."""
    import signal
    import time
    import urllib.request

    import jax
    import jax.numpy as jnp

    from anomaly_detection_on_video_tpu.models import build_model
    from anomaly_detection_on_video_tpu.training import TrainState
    from anomaly_detection_on_video_tpu.training.checkpoints import (
        TopKCheckpointer,
    )
    from anomaly_detection_on_video_tpu.training.optim import adam_with_l2

    video_path = tmp_path / "demo.avi"
    write_video(video_path, n_frames=20)

    _, model = build_model("sultani")
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((2, 10, 32, 2049), jnp.float32),
        train=True,
    )
    ckpt = TopKCheckpointer(str(tmp_path / "ckpts"))
    ckpt.save(
        step=1,
        state=TrainState.create(model, variables, adam_with_l2()),
        metric=0.5,
    )
    ckpt.wait()
    ckpt.write_metadata({"model_name": "sultani", "model_config": {}})

    outdir = tmp_path / "scores"
    log_path = tmp_path / "server.log"
    with open(log_path, "w") as log:
        proc = subprocess.Popen(
            [
                sys.executable, os.path.join(REPO, "infer.py"),
                "--checkpoint", str(tmp_path / "ckpts"),
                "--outdir", str(outdir),
                "--dtype", "float32",
                "--crops", "center",
                "--batch", "1",
                "--serve", "0",
                "--warmup", "4",
            ],
            env=ENV, cwd=REPO, stdout=log, stderr=subprocess.STDOUT,
        )
    try:
        deadline = time.time() + 600
        port = None
        while port is None:
            assert proc.poll() is None, log_path.read_text()
            assert time.time() < deadline, "server never came up"
            for line in log_path.read_text().splitlines():
                if line.startswith("serving on "):
                    port = int(line.rsplit(":", 1)[1])
            time.sleep(1)
        base = f"http://127.0.0.1:{port}"

        health = json.loads(urllib.request.urlopen(f"{base}/healthz").read())
        assert health["ok"] is True

        req = urllib.request.Request(
            f"{base}/score?name=demo.avi", data=video_path.read_bytes(),
            method="POST",
        )
        scored = json.loads(urllib.request.urlopen(req, timeout=600).read())
        assert scored["n_clips"] == 2  # ceil(20/16) clips
        assert len(scored["frame_scores"]) == 2 * 16
        assert all(0.0 <= s <= 1.0 for s in scored["frame_scores"])
        # persisted like the offline CLI would
        assert json.loads((outdir / "demo_scores.json").read_text()) == scored

        # idempotent: a repeat POST returns the cached JSON, no re-extract
        again = json.loads(urllib.request.urlopen(req, timeout=60).read())
        assert again == scored
        cached = json.loads(
            urllib.request.urlopen(f"{base}/scores/demo").read()
        )
        assert cached == scored

        stats = json.loads(urllib.request.urlopen(f"{base}/stats").read())
        assert stats["videos_scored"] == 1
        assert stats["clips_scored"] == 2
        assert stats["errors"] == 0

        # garbage bytes: 500, error counted, serving survives
        bad = urllib.request.Request(
            f"{base}/score?name=junk.avi", data=b"not a video",
            method="POST",
        )
        try:
            urllib.request.urlopen(bad, timeout=120)
            assert False, "expected HTTP 500"
        except urllib.error.HTTPError as err:
            assert err.code == 500
        stats = json.loads(urllib.request.urlopen(f"{base}/stats").read())
        assert stats["errors"] == 1

        # path-escape name: basename('x/..') is '..' — must be a clean 400
        # (not an IsADirectoryError crash that leaks the spool dir)
        evil = urllib.request.Request(
            f"{base}/score?name=x%2F..", data=b"zz", method="POST"
        )
        try:
            urllib.request.urlopen(evil, timeout=60)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as err:
            assert err.code == 400
        spool = outdir / "_spool"
        assert not spool.exists() or not any(spool.iterdir())

        proc.send_signal(signal.SIGTERM)
        assert proc.wait(timeout=120) == 0
    finally:
        if proc.poll() is None:
            proc.kill()
    log_text = log_path.read_text()
    assert "shutting down" in log_text
    assert "warmup done" in log_text  # compiles happened before serving


@pytest.mark.slow
def test_infer_cli_http_serving_concurrent(tmp_path):
    """--serve under actual concurrency (VERDICT r4 #6): N simultaneous
    POSTs of distinct videos through the ThreadingHTTPServer. Every
    response must carry ITS video's scores (the shared extractor +
    score_lock must not bleed state across requests), no errors, and a
    sequential re-POST must return bit-identical scores (determinism
    under queueing)."""
    import signal
    import threading
    import time
    import urllib.request

    import jax
    import jax.numpy as jnp

    from anomaly_detection_on_video_tpu.models import build_model
    from anomaly_detection_on_video_tpu.training import TrainState
    from anomaly_detection_on_video_tpu.training.checkpoints import (
        TopKCheckpointer,
    )
    from anomaly_detection_on_video_tpu.training.optim import adam_with_l2

    # distinct lengths -> distinct n_clips per video: a swapped response
    # would be caught by shape alone; distinct seeds catch value bleed
    specs = {f"vid{i}.avi": (20 + 16 * i, 7 + i) for i in range(4)}
    paths = {}
    for name, (n_frames, seed) in specs.items():
        paths[name] = tmp_path / name
        write_video(paths[name], n_frames=n_frames, seed=seed)

    _, model = build_model("sultani")
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((2, 10, 32, 2049), jnp.float32),
        train=True,
    )
    ckpt = TopKCheckpointer(str(tmp_path / "ckpts"))
    ckpt.save(
        step=1,
        state=TrainState.create(model, variables, adam_with_l2()),
        metric=0.5,
    )
    ckpt.wait()
    ckpt.write_metadata({"model_name": "sultani", "model_config": {}})

    outdir = tmp_path / "scores"
    log_path = tmp_path / "server.log"
    with open(log_path, "w") as log:
        proc = subprocess.Popen(
            [
                sys.executable, os.path.join(REPO, "infer.py"),
                "--checkpoint", str(tmp_path / "ckpts"),
                "--outdir", str(outdir),
                "--dtype", "float32",
                "--crops", "center",
                "--batch", "1",
                "--serve", "0",
                "--warmup", "4",
            ],
            env=ENV, cwd=REPO, stdout=log, stderr=subprocess.STDOUT,
        )
    try:
        deadline = time.time() + 600
        port = None
        while port is None:
            assert proc.poll() is None, log_path.read_text()
            assert time.time() < deadline, "server never came up"
            for line in log_path.read_text().splitlines():
                if line.startswith("serving on "):
                    port = int(line.rsplit(":", 1)[1])
            time.sleep(1)
        base = f"http://127.0.0.1:{port}"

        results, errors = {}, {}

        def post(name):
            req = urllib.request.Request(
                f"{base}/score?name={name}",
                data=paths[name].read_bytes(),
                method="POST",
            )
            try:
                results[name] = json.loads(
                    urllib.request.urlopen(req, timeout=600).read()
                )
            except Exception as exc:  # surfaced in the main thread
                errors[name] = exc

        threads = [
            threading.Thread(target=post, args=(name,)) for name in specs
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert not errors, errors

        for name, (n_frames, _) in specs.items():
            n_clips = -(-n_frames // 16)
            res = results[name]
            assert res["video"].endswith(name), (name, res["video"])
            assert res["n_clips"] == n_clips, (name, res)
            assert len(res["frame_scores"]) == n_clips * 16
            assert all(0.0 <= s <= 1.0 for s in res["frame_scores"])
        # distinct content must not produce identical score vectors
        # (value-level cross-request bleed)
        vectors = {
            name: tuple(res["frame_scores"][:16])
            for name, res in results.items()
        }
        assert len(set(vectors.values())) == len(vectors), vectors

        # queueing is serialized by score_lock: all four scored, no errors
        stats = json.loads(urllib.request.urlopen(f"{base}/stats").read())
        assert stats["videos_scored"] == len(specs)
        assert stats["errors"] == 0

        # determinism under concurrency: a sequential re-POST of each
        # video returns exactly the concurrent run's scores (idempotent
        # cache path, and the concurrent scores were not corrupted)
        for name in specs:
            req = urllib.request.Request(
                f"{base}/score?name={name}",
                data=paths[name].read_bytes(),
                method="POST",
            )
            again = json.loads(urllib.request.urlopen(req, timeout=120).read())
            assert again == results[name], name

        proc.send_signal(signal.SIGTERM)
        assert proc.wait(timeout=120) == 0
    finally:
        if proc.poll() is None:
            proc.kill()


@pytest.mark.slow
def test_infer_cli_torch_weights(tmp_path):
    """infer.py with a converted torch MGFN state dict (HF layout)."""
    import torch

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_mgfn import oracle_to_hf_state_dict
    from torch_oracles import OracleMGFN

    videos = tmp_path / "videos"
    videos.mkdir()
    write_video(videos / "Normal_demo.avi", n_frames=24)

    torch.manual_seed(0)
    oracle = OracleMGFN()  # full reference dims
    oracle.eval()
    weights = tmp_path / "mgfn_hf.pt"
    torch.save(oracle_to_hf_state_dict(oracle), str(weights))

    outdir = tmp_path / "scores"
    run_cli(
        "infer.py",
        "--videos", str(videos),
        "--torch-weights", str(weights),
        "--outdir", str(outdir),
        "--dtype", "float32",
        "--batch", "10",
    )
    out = json.loads((outdir / "Normal_demo_scores.json").read_text())
    assert out["n_clips"] == 2
    assert all(0.0 <= s <= 1.0 for s in out["frame_scores"])


def test_infer_cli_fails_fast_on_bad_paths(tmp_path):
    """A typo'd --checkpoint / --torch-weights / --i3d-weights path must be
    a clean error BEFORE any extraction work — scoring with random weights
    would silently produce garbage (deployment surface)."""
    videos = tmp_path / "videos"
    videos.mkdir()
    write_video(videos / "v.avi", n_frames=4)

    def infer(*args):
        return subprocess.run(
            [sys.executable, os.path.join(REPO, "infer.py"),
             "--videos", str(videos), "--outdir", str(tmp_path / "out"),
             *args],
            capture_output=True, text=True, env=ENV, cwd=REPO, timeout=600,
        )

    result = infer("--checkpoint", str(tmp_path / "nope"))
    assert result.returncode != 0
    assert "no such directory" in result.stderr
    assert "Traceback" not in result.stderr

    empty = tmp_path / "empty-ckpt"
    empty.mkdir()
    result = infer("--checkpoint", str(empty))
    assert result.returncode != 0
    assert "contains no checkpoints" in result.stderr

    result = infer("--torch-weights", str(tmp_path / "nope.pt"))
    assert result.returncode != 0
    assert "no such file" in result.stderr

    result = infer("--i3d-weights", str(tmp_path / "missing.pt"))
    assert result.returncode != 0
    assert "--i3d-weights" in result.stderr


def test_run_cli_help_cfg_and_error_surface():
    """Hydra-CLI conveniences (the reference gets these from Hydra itself):
    --help lists config groups, --cfg prints the composed config, and a
    mistyped override reads like a CLI error, not a traceback."""
    def run(*args):
        return subprocess.run(
            [sys.executable, os.path.join(REPO, "run.py"), *args],
            capture_output=True, text=True, env=ENV, cwd=REPO, timeout=300,
        )

    result = run("--help")
    assert result.returncode == 0
    assert "runner: default, mgfn, rtfm, sultani" in result.stdout
    assert "--multirun" in result.stdout

    result = run("runner=mgfn", "--cfg")
    assert result.returncode == 0
    composed = __import__("yaml").safe_load(result.stdout)
    assert composed["runner"]["model_class"].endswith(
        "MGFNForVideoAnomalyDetection"
    )
    assert "_choices_" not in composed

    result = run("badtoken")
    assert result.returncode != 0
    assert "config error" in result.stderr
    assert "Traceback" not in result.stderr

    result = run("nonexistent.key=1")
    assert result.returncode != 0
    assert "config error" in result.stderr and "+nonexistent" in result.stderr


def test_expand_multirun_grammar():
    sys.path.insert(0, REPO)
    from run import expand_multirun

    # cartesian product over bare comma lists, in argv order
    jobs = expand_multirun(["runner=mgfn", "seed=1,2", "data.batch_size=4,8"])
    assert len(jobs) == 4
    assert jobs[0] == ["runner=mgfn", "seed=1", "data.batch_size=4"]
    assert jobs[-1] == ["runner=mgfn", "seed=2", "data.batch_size=8"]
    # YAML collections and quoted values do NOT sweep
    assert expand_multirun(["a.b=[1,2]"]) == [["a.b=[1,2]"]]
    assert expand_multirun(["a.b='x,y'"]) == [["a.b='x,y'"]]
    assert expand_multirun(["runner=mgfn"]) == [["runner=mgfn"]]


@pytest.mark.slow
def test_run_cli_multirun(tmp_path):
    """`run.py -m seed=1,2` sweeps sequentially with per-job writer dirs
    (Hydra multirun role, reference run.py:15)."""
    rng = np.random.RandomState(0)
    seg_dir = tmp_path / "segments"
    test_dir = tmp_path / "test"
    seg_dir.mkdir()
    test_dir.mkdir()
    gt = {}
    for i in range(4):
        prefix = "Normal_Videos" if i % 2 == 0 else "Abuse"
        name = f"{prefix}{i:03d}_x264_i3d.npy"
        np.save(seg_dir / name, rng.randn(10, 32, 2048).astype(np.float32))
        np.save(test_dir / name, rng.randn(3, 10, 2048).astype(np.float32))
        gt[name[:-8]] = [0.0 if i % 2 == 0 else 1.0] * (3 * 16)
    gt_path = tmp_path / "gt.json"
    gt_path.write_text(json.dumps(gt))

    sweep = tmp_path / "sweep"
    result = run_cli(
        "run.py",
        "-m",
        "--multirun-dir", str(sweep),
        "runner=mgfn",
        "seed=1,2",
        f"data.train_path={seg_dir}",
        f"data.test_path={test_dir}",
        f"data.ground_truth_path={gt_path}",
        "data.batch_size=2",
        "trainer.max_epochs=1",
        f"trainer.checkpoint.dirpath={tmp_path}/unused-ckpt",
        "runner.model_config.dims=[16,16,32]",
        "runner.model_config.depths=[1,1,1]",
        "runner.model_config.dim_head=8",
    )
    assert "[multirun] job 0/2" in result.stdout
    jobs = [json.loads(l) for l in open(sweep / "multirun.jsonl")]
    assert [j["returncode"] for j in jobs] == [0, 0]
    assert "seed=1" in jobs[0]["overrides"] and "seed=2" in jobs[1]["overrides"]
    for j in jobs:
        records = [
            json.loads(l) for l in open(os.path.join(j["dir"], "metrics.jsonl"))
        ]
        assert any("valid/rec_auc" in r for r in records)
        # explicit writer overrides are respected, not redirected per-job:
        # the checkpoint dir was set on the CLI so hparams land there
        assert not os.path.isdir(os.path.join(j["dir"], "checkpoints"))
    assert os.path.isfile(tmp_path / "unused-ckpt" / "hparams.json")


def test_run_cli_oversized_batch_is_clean_error(tmp_path):
    """batch_size exceeding the dataset maps to a one-line `data error:`
    through run.py (runner.DataConfigError), not a traceback — and other
    ValueErrors mid-training keep their tracebacks (the except is narrow)."""
    seg_dir = tmp_path / "segments"
    test_dir = tmp_path / "test"
    seg_dir.mkdir()
    test_dir.mkdir()
    rng = np.random.RandomState(0)
    gt = {}
    for i in range(2):
        for prefix in ("Normal_", "Abuse"):
            name = f"{prefix}{i:03d}_x264_i3d.npy"
            np.save(seg_dir / name, rng.randn(10, 8, 32).astype(np.float32))
            np.save(test_dir / name, rng.randn(2, 10, 32).astype(np.float32))
            gt[name[:-8]] = [0.0 if prefix == "Normal_" else 1.0] * 32
    gt_path = tmp_path / "gt.json"
    gt_path.write_text(json.dumps(gt))
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "run.py"),
         "runner=mgfn",
         f"data.train_path={seg_dir}",
         f"data.test_path={test_dir}",
         f"data.ground_truth_path={gt_path}",
         "data.batch_size=16",
         "runner.model_config.channels=32",
         "runner.model_config.dims=[8,8,16]",
         "runner.model_config.depths=[1,1,1]",
         "runner.model_config.dim_head=4",
         "trainer.log_path="],
        capture_output=True, text=True, env=ENV, cwd=REPO, timeout=600,
    )
    assert result.returncode != 0
    assert "data error: batch_size=16 exceeds" in result.stderr
    assert "Traceback" not in result.stderr
