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


@pytest.mark.slow
def test_two_process_mesh_psum(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER.format(repo=repo, port=port, pid=pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert "TOTAL 28.0" in out, f"process {pid} output:\n{out}"
