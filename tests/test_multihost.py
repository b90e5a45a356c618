"""2-process multi-host exercise on CPU (SURVEY §2.2 comm-backend row).

Real DCN multi-host needs multiple machines; this spawns two local processes
that rendezvous through jax.distributed (the same runtime path a TPU pod
uses), build a global mesh spanning both, and run a cross-host psum.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from anomaly_detection_on_video_tpu.parallel import (
    initialize_multihost,
    make_mesh,
)

initialize_multihost("localhost:{port}", num_processes=2, process_id={pid})
assert jax.process_count() == 2, jax.process_count()
devices = jax.devices()
assert len(devices) == 4, devices  # 2 local CPU devices x 2 processes

mesh = make_mesh()  # global 4-device data mesh spanning both processes
data = np.arange(8.0, dtype=np.float32)
sharding = NamedSharding(mesh, P("data"))
garr = jax.make_array_from_callback(
    (8,), sharding, lambda idx: data[idx]
)
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(garr)
print("TOTAL", float(total), flush=True)  # cross-host all-reduce -> 28.0
"""


EVAL_WORKER = r"""
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from anomaly_detection_on_video_tpu.data.features import FeatureDataset
from anomaly_detection_on_video_tpu.models import build_model
from anomaly_detection_on_video_tpu.parallel import (
    initialize_multihost,
    make_mesh,
)
from anomaly_detection_on_video_tpu.training import TrainState
from anomaly_detection_on_video_tpu.training.optim import adam_with_l2
from anomaly_detection_on_video_tpu.training.runner import (
    evaluate,
    make_eval_step,
)

initialize_multihost("localhost:{port}", num_processes=2, process_id={pid})
assert jax.process_count() == 2

# identical tiny model + test set on every process (same seeds)
config, model = build_model(
    "mgfn", dims=(16, 16, 32), depths=(1, 1, 1), dim_head=8, channels=24
)
variables = model.init(
    {{"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}},
    jnp.zeros((2, 10, 8, 25)),
    train=True,
)
state = TrainState.create(model, variables, adam_with_l2())

rng = np.random.RandomState(0)
n_videos = 6
arrays, labels = {{}}, {{}}
names = []
for i in range(n_videos):
    name = ("Normal_" if i % 2 == 0 else "Abuse_") + f"v{{i}}_i3d.npy"
    names.append(name)
    n_clips = 5 + i
    arrays[name] = rng.randn(n_clips, 10, 24).astype(np.float32)
    lab = np.zeros(n_clips * 16, np.float32)
    if i % 2:
        lab[: 3 * 16] = 1.0
    labels[name] = lab.tolist()
dataset = FeatureDataset(filenames=names, _arrays=arrays, labels=labels)

single = evaluate(
    state, dataset, eval_step=make_eval_step(), batch_videos=1
)

mesh = make_mesh()  # global 4-device data mesh spanning both processes
multi = evaluate(
    state, dataset, eval_step=make_eval_step(mesh),
    batch_videos=4, pad_groups=True,
)
assert abs(single.rec_auc - multi.rec_auc) < 1e-9, (single.rec_auc, multi.rec_auc)
assert abs(single.pr_auc - multi.pr_auc) < 1e-9
np.testing.assert_allclose(single.preds, multi.preds, atol=1e-6)

# tensor-parallel case: variables are GLOBAL arrays sharded over the model
# axis (as they come out of the multihost DP x TP train step) — the eval
# wrapper must pass them through with sharding intact (np.asarray on a
# non-fully-addressable array raises)
import types
from anomaly_detection_on_video_tpu.parallel.sharding import (
    tensor_parallel_specs,
)

mesh_tp = make_mesh((2, 2), ("data", "model"))
specs = tensor_parallel_specs(state.variables, mesh_tp)
tp_vars = jax.tree_util.tree_map(
    lambda x, s: jax.make_array_from_callback(
        np.asarray(x).shape, s, lambda idx, h=np.asarray(x): h[idx]
    ),
    state.variables, specs,
)
assert any(
    not l.is_fully_addressable
    for l in jax.tree_util.tree_leaves(tp_vars)
)
tp_state = types.SimpleNamespace(variables=tp_vars, apply_fn=state.apply_fn)
multi_tp = evaluate(
    tp_state, dataset, eval_step=make_eval_step(mesh_tp),
    batch_videos=4, pad_groups=True,
)
assert abs(single.rec_auc - multi_tp.rec_auc) < 1e-6, (
    single.rec_auc, multi_tp.rec_auc,
)
np.testing.assert_allclose(single.preds, multi_tp.preds, atol=1e-5)
print("EVAL_AUC", single.rec_auc, multi.rec_auc, flush=True)
"""


def _run_two_process(worker_template, tmp_path, success_token, **fmt):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    # keep the sitecustomize axon registration out of the workers (it
    # resets jax_platforms to "axon,cpu" at startup; see test_integration)
    env["PALLAS_AXON_POOL_IPS"] = ""
    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             worker_template.format(repo=repo, port=port, pid=pid, **fmt)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1200)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert success_token in out, f"process {pid} output:\n{out}"
    return outs


SWEEP_WORKER = r"""
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import extract_features
extract_features.main([
    "--videos", {videos!r},
    "--outdir", {outdir!r},
    "--split", "train",
    "--dtype", "float32",
    "--batch", "8",
    "--decode-workers", "1",
    "--multihost",
    "--coordinator", "localhost:{port}",
    "--num-processes", "2",
    "--process-id", "{pid}",
])
print("SWEEP_DONE", flush=True)
"""


TRAIN_WORKER = r"""
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from anomaly_detection_on_video_tpu.models import build_model
from anomaly_detection_on_video_tpu.parallel import (
    initialize_multihost,
    make_mesh,
)
from anomaly_detection_on_video_tpu.training import TrainState
from anomaly_detection_on_video_tpu.training.optim import adam_with_l2
from anomaly_detection_on_video_tpu.training.runner import make_train_step

initialize_multihost("localhost:{port}", num_processes=2, process_id={pid})
assert jax.process_count() == 2

# dropout_rate=0 + randomized params: as in tests/test_training.py, exact-
# zero ties in top-k selection would otherwise flip under the mesh's
# different reduction order (amplification noise, not a DP bug)
config, model = build_model(
    "mgfn", dims=(16, 16, 32), depths=(1, 1, 1), dim_head=8, channels=24,
    dropout_rate=0.0,
)


def fresh_state():
    variables = model.init(
        {{"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}},
        jnp.zeros((2, 10, 32, 25)),
        train=True,
    )
    leaves, treedef = jax.tree_util.tree_flatten(variables["params"])
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    leaves = [
        l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)
    ]
    variables = dict(
        variables, params=jax.tree_util.tree_unflatten(treedef, leaves)
    )
    return TrainState.create(model, variables, adam_with_l2())


rng = np.random.RandomState(1)
batches = [rng.randn(8, 10, 32, 25).astype(np.float32) for _ in range(3)]
nlab = np.zeros((4,), np.float32)
alab = np.ones((4,), np.float32)
keys = [np.asarray(jax.random.PRNGKey(100 + k)) for k in range(3)]

single_step = make_train_step()
s = fresh_state()
single_losses = []
for b, k in zip(batches, keys):
    s, loss = single_step(
        s, jnp.asarray(b), jnp.asarray(nlab), jnp.asarray(alab),
        jnp.asarray(k),
    )
    single_losses.append(float(loss))
single_params = jax.tree_util.tree_leaves(
    jax.tree_util.tree_map(np.asarray, s.params)
)

mesh = make_mesh()  # global 4-device data mesh spanning both processes
assert any(d.process_index != jax.process_index() for d in mesh.devices.flat)
multi_step = make_train_step(mesh)
m = fresh_state()  # host-local leaves: first step must replicate them
multi_losses = []
for b, k in zip(batches, keys):
    m, loss = multi_step(m, b, nlab, alab, k)
    multi_losses.append(float(loss))
assert not jax.tree_util.tree_leaves(m.params)[0].is_fully_addressable
multi_params = jax.tree_util.tree_leaves(
    jax.tree_util.tree_map(np.asarray, m.params)
)

np.testing.assert_allclose(single_losses, multi_losses, rtol=2e-5)
for a, b in zip(single_params, multi_params):
    np.testing.assert_allclose(a, b, atol=2e-5)
print("TRAIN_EQ", round(multi_losses[-1], 6), flush=True)
"""


@pytest.mark.slow
def test_two_process_mesh_psum(tmp_path):
    _run_two_process(WORKER, tmp_path, "TOTAL 28.0")


@pytest.mark.slow
def test_two_process_train_step_matches_single(tmp_path):
    """Three DP train steps on a 2-process global mesh must match the
    single-device run: the step globalizes each process's identical host
    batch, grads psum across hosts, and the updated params stay global."""
    _run_two_process(TRAIN_WORKER, tmp_path, "TRAIN_EQ")


RUN_WORKER = r"""
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import run
run.main([
    "runner=mgfn",
    "trainer.multihost=true",
    "trainer.coordinator=localhost:{port}",
    "trainer.num_processes=2",
    "trainer.process_id={pid}",
    "trainer.resume={resume}",
    "data.train_path={seg_dir}",
    "data.test_path={test_dir}",
    "data.ground_truth_path={gt_path}",
    "data.batch_size=4",
    "trainer.max_epochs=1",
    "trainer.log_path={run_dir}/metrics.jsonl",
    "trainer.checkpoint.dirpath={run_dir}/ckpt",
    "runner.model_config.dims=[16,16,32]",
    "runner.model_config.depths=[1,1,1]",
    "runner.model_config.dim_head=8",
])
print("RUN_DONE", flush=True)
"""


TP_CKPT_WORKER = r"""
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from anomaly_detection_on_video_tpu.models import build_model
from anomaly_detection_on_video_tpu.parallel import (
    barrier,
    initialize_multihost,
    make_mesh,
)
from anomaly_detection_on_video_tpu.training import VideoAnomalyDetectionRunner
from anomaly_detection_on_video_tpu.training.checkpoints import TopKCheckpointer

initialize_multihost("localhost:{port}", num_processes=2, process_id={pid})
assert jax.process_count() == 2

# 2x2 (data, model) mesh spanning both processes: weights shard
# tensor-parallel ACROSS the process boundary's device columns
mesh = make_mesh((2, 2), ("data", "model"))
_, model = build_model("sultani", channels=24, hidden_dims=(16, 8))
runner = VideoAnomalyDetectionRunner(model, mesh=mesh, seed=0)
rng = np.random.RandomState(0)
state = runner.init_state(rng.randn(4, 10, 8, 25).astype(np.float32))
leaves = jax.tree_util.tree_leaves(state.params)
assert any(not l.is_fully_replicated for l in leaves)  # actually TP-sharded
assert all(not l.is_fully_addressable for l in leaves)  # global arrays

if {pid} == 0:
    ckpt = TopKCheckpointer({ckpt_dir!r})
    # process-local save must assemble the TP-sharded leaves from this
    # process's addressable shards (training/checkpoints.py host_leaf)
    ckpt.save(step=1, state=state, metric=0.5)
    ckpt.wait()
    _, fresh_model = build_model("sultani", channels=24, hidden_dims=(16, 8))
    template = VideoAnomalyDetectionRunner(fresh_model, seed=1)
    t_state = template.init_state(rng.randn(4, 10, 8, 25).astype(np.float32))
    restored = ckpt.restore_latest(t_state)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        host = np.zeros(a.shape, a.dtype)
        for s in a.addressable_shards:
            host[s.index] = np.asarray(s.data)
        np.testing.assert_array_equal(host, np.asarray(b))
    print("TP_CKPT_OK", flush=True)
else:
    print("TP_CKPT_OK (peer)", flush=True)
barrier("done", timeout_s=600)
"""


@pytest.mark.slow
def test_two_process_training_cli(tmp_path):
    """`run.py trainer.multihost=true` trains DP across a 2-process global
    mesh end-to-end: every host contributes mesh shards, only process 0
    writes metrics/checkpoints, and the saved (cross-process replicated)
    state round-trips through orbax."""
    import json

    import numpy as np

    rng = np.random.RandomState(0)
    seg_dir = tmp_path / "segments"
    test_dir = tmp_path / "test"
    seg_dir.mkdir()
    test_dir.mkdir()
    gt = {}
    for i in range(8):
        prefix = "Normal_Videos" if i % 2 == 0 else "Abuse"
        name = f"{prefix}{i:03d}_x264_i3d.npy"
        np.save(seg_dir / name, rng.randn(10, 32, 2048).astype(np.float32))
        np.save(test_dir / name, rng.randn(3, 10, 2048).astype(np.float32))
        gt[name[:-8]] = [0.0 if i % 2 == 0 else 1.0] * (3 * 16)
    gt_path = tmp_path / "gt.json"
    gt_path.write_text(json.dumps(gt))
    run_dir = tmp_path / "run"

    outs = _run_two_process(
        RUN_WORKER, tmp_path, "RUN_DONE",
        seg_dir=str(seg_dir), test_dir=str(test_dir),
        gt_path=str(gt_path), run_dir=str(run_dir), resume="false",
    )
    # only process 0 logs and prints the final AUC line
    assert "valid/rec_auc=" in outs[0]
    assert "valid/rec_auc=" not in outs[1]
    records = [json.loads(l) for l in open(run_dir / "metrics.jsonl")]
    assert any("valid/rec_auc" in r for r in records)
    # the checkpoint was written by process 0 from global arrays
    hparams = json.load(open(run_dir / "ckpt" / "hparams.json"))
    assert hparams["model_name"] == "mgfn"
    assert any(
        entry.name.isdigit() for entry in os.scandir(run_dir / "ckpt")
    )

    # resume: every process restores the same checkpoint and training
    # continues from the saved step across the 2-process mesh
    outs = _run_two_process(
        RUN_WORKER, tmp_path, "RUN_DONE",
        seg_dir=str(seg_dir), test_dir=str(test_dir),
        gt_path=str(gt_path), run_dir=str(run_dir), resume="true",
    )
    assert "resumed from step" in outs[0]
    assert "resumed from step" in outs[1]
    assert "valid/rec_auc=" in outs[0]


@pytest.mark.slow
def test_two_process_preemption_stops_both(tmp_path):
    """SIGTERM delivered to only ONE process (the non-primary one, the
    hard case): the per-step all-gathered stop flag must stop BOTH
    processes at the same step boundary — uncoordinated stops would
    deadlock the next grads collective — and process 0 (which never saw
    the signal) must write the preemption checkpoint."""
    import json
    import re
    import signal
    import time

    import numpy as np

    rng = np.random.RandomState(0)
    seg_dir = tmp_path / "segments"
    test_dir = tmp_path / "test"
    seg_dir.mkdir()
    test_dir.mkdir()
    gt = {}
    for i in range(8):
        prefix = "Normal_Videos" if i % 2 == 0 else "Abuse"
        name = f"{prefix}{i:03d}_x264_i3d.npy"
        np.save(seg_dir / name, rng.randn(10, 32, 2048).astype(np.float32))
        np.save(test_dir / name, rng.randn(3, 10, 2048).astype(np.float32))
        gt[name[:-8]] = [0.0 if i % 2 == 0 else 1.0] * (3 * 16)
    gt_path = tmp_path / "gt.json"
    gt_path.write_text(json.dumps(gt))
    run_dir = tmp_path / "run"

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    # keep the sitecustomize axon registration out of the workers (it
    # resets jax_platforms to "axon,cpu" at startup; see test_integration)
    env["PALLAS_AXON_POOL_IPS"] = ""
    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             PREEMPT_WORKER.format(
                 repo=repo, port=port, pid=pid, seg_dir=str(seg_dir),
                 test_dir=str(test_dir), gt_path=str(gt_path),
                 run_dir=str(run_dir),
             )],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    try:
        # wait for lockstep training to be under way (process 0 logs steps)
        metrics_path = run_dir / "metrics.jsonl"
        deadline = time.time() + 900
        while time.time() < deadline:
            if (
                metrics_path.exists()
                and "train_loss" in metrics_path.read_text()
            ):
                break
            assert all(p.poll() is None for p in procs)
            time.sleep(1.0)
        procs[1].send_signal(signal.SIGTERM)  # non-primary only
        outs = [p.communicate(timeout=900)[0] for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert "RUN_DONE" in out, f"process {pid} output:\n{out}"
    # process 0 stopped via the all-gathered flag and saved; process 1 saw
    # the signal directly and (checkpointer-less) just stopped
    m0 = re.search(r"peer-process signal: checkpoint saved at step (\d+)",
                   outs[0])
    m1 = re.search(r"signal \d+: stopping at step (\d+)", outs[1])
    assert m0, outs[0]
    assert m1, outs[1]
    assert m0.group(1) == m1.group(1)  # the SAME step boundary
    assert any(
        entry.name.isdigit() for entry in os.scandir(run_dir / "ckpt")
    )


PREEMPT_WORKER = r"""
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import run
run.main([
    "runner=mgfn",
    "trainer.multihost=true",
    "trainer.coordinator=localhost:{port}",
    "trainer.num_processes=2",
    "trainer.process_id={pid}",
    "data.train_path={seg_dir}",
    "data.test_path={test_dir}",
    "data.ground_truth_path={gt_path}",
    "data.batch_size=4",
    "trainer.max_epochs=100000",
    "trainer.eval_every=100000",
    "trainer.log_path={run_dir}/metrics.jsonl",
    "trainer.checkpoint.dirpath={run_dir}/ckpt",
    "runner.model_config.dims=[16,16,32]",
    "runner.model_config.depths=[1,1,1]",
    "runner.model_config.dim_head=8",
])
print("RUN_DONE", flush=True)
"""


@pytest.mark.slow
def test_two_process_tp_checkpoint_save(tmp_path):
    """Process-local checkpointing of a state whose weights are
    tensor-parallel-sharded ACROSS processes: process 0 assembles every
    leaf from its addressable shards (the row-major (data, model) mesh
    layout guarantees coverage) and the save round-trips."""
    _run_two_process(
        TP_CKPT_WORKER, tmp_path, "TP_CKPT_OK",
        ckpt_dir=str(tmp_path / "ckpt"),
    )


@pytest.mark.slow
def test_two_process_extraction_sweep(tmp_path):
    """--multihost shards the video list across processes into one shared
    outdir; every video's features land, and only process 0 pools segments
    (after the cross-host barrier)."""
    import cv2
    import numpy as np

    rng = np.random.RandomState(0)
    videos = tmp_path / "videos"
    videos.mkdir()
    specs = [("Normal_Videos_001_x264.avi", 40), ("Abuse001_x264.avi", 35),
             ("Abuse002_x264.avi", 20)]
    for name, frames in specs:
        writer = cv2.VideoWriter(
            str(videos / name), cv2.VideoWriter_fourcc(*"MJPG"), 30, (64, 48)
        )
        for _ in range(frames):
            writer.write(rng.randint(0, 255, (48, 64, 3), np.uint8))
        writer.release()

    out = tmp_path / "features"
    outs = _run_two_process(
        SWEEP_WORKER, tmp_path, "SWEEP_DONE",
        videos=str(videos), outdir=str(out),
    )
    train = out / "train"
    for name, frames in specs:
        feats = np.load(train / f"{name[:-4]}_i3d.npy")
        assert feats.shape == (-(-frames // 16), 10, 2048)
    # the sweep actually split: neither process extracted everything
    for o in outs:
        assert "extracted 3 new" not in o
    # segments pooled exactly once, by process 0
    assert sum("segmented" in o for o in outs) == 1
    segs = np.load(out / "segment_features_32" / "Normal_Videos_001_x264_i3d.npy")
    assert segs.shape == (10, 32, 2048)


@pytest.mark.slow
def test_two_process_eval_matches_single(tmp_path):
    """Bucket-batched eval across 2 processes must equal single-process AUC
    (SURVEY §2.2 DP row: all-gather eval scores before AUC)."""
    _run_two_process(EVAL_WORKER, tmp_path, "EVAL_AUC")


@pytest.mark.slow
def test_pod_dryrun_preempt_resume(tmp_path):
    """__graft_entry__.dryrun_pod: 4 virtual hosts x 2 devices train DP x TP
    through the real CLI, one non-primary host is SIGTERMed (all stop at the
    same step, process 0 saves the TP-sharded checkpoint), and a second pod
    run resumes from it (VERDICT r3 #4 pod-shaped dryrun)."""
    import __graft_entry__ as g

    g.dryrun_pod(workdir=str(tmp_path))
