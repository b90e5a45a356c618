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
print("EVAL_AUC", single.rec_auc, multi.rec_auc, flush=True)
"""


def _run_two_process(worker_template, tmp_path, success_token):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             worker_template.format(repo=repo, port=port, pid=pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert success_token in out, f"process {pid} output:\n{out}"


@pytest.mark.slow
def test_two_process_mesh_psum(tmp_path):
    _run_two_process(WORKER, tmp_path, "TOTAL 28.0")


@pytest.mark.slow
def test_two_process_eval_matches_single(tmp_path):
    """Bucket-batched eval across 2 processes must equal single-process AUC
    (SURVEY §2.2 DP row: all-gather eval scores before AUC)."""
    _run_two_process(EVAL_WORKER, tmp_path, "EVAL_AUC")
