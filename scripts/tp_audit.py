#!/usr/bin/env python
"""Tensor-parallel audit: what tensor_parallel_specs actually shards.

Quantifies the TP story per trainable model family (VERDICT r3 weak #5):
for tp = 2 and 4, the fraction of parameter + optimizer-moment bytes that
``parallel.tensor_parallel_specs`` shards over the mesh's ``model`` axis,
the resulting per-device bytes, and the largest replicated leaves — then
times the full-size MGFN train step (reference scale: 2049-d features,
dims 64/128/1024, 16+16 bags, reference src/runner.py:29-50 +
configuration_mgfn.py defaults) under pure DP vs DP x TP on the virtual
CPU mesh. Results are recorded in docs/TENSOR_PARALLEL.md.

Runs on a virtual CPU mesh; self-bootstraps into a CPU subprocess when the
interpreter is pinned to the TPU platform (same pattern as
__graft_entry__.py):

    python scripts/tp_audit.py --out docs/tp_audit.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DEVICES = 8

FAMILIES = {
    # family -> (config overrides, input feature dim incl. magnitude)
    "mgfn": ({}, 2049),        # reference defaults: dims (64,128,1024)
    "mgfn-4096": ({"channels": 4096}, 4097),  # two-stream concat features
    "rtfm": ({}, 2049),
    "sultani": ({}, 2049),
}


def _bootstrap() -> None:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # sitecustomize gate: keep CPU pinned
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={N_DEVICES}"
        ).strip()
    env["_TP_AUDIT_BOOTSTRAPPED"] = "1"
    raise SystemExit(
        subprocess.run([sys.executable] + sys.argv, env=env).returncode
    )


def leaf_name(path) -> str:
    import jax

    return jax.tree_util.keystr(path)


def audit_family(name: str, tp: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from anomaly_detection_on_video_tpu.models import build_model
    from anomaly_detection_on_video_tpu.parallel import (
        make_mesh,
        tensor_parallel_specs,
    )
    from anomaly_detection_on_video_tpu.training import TrainState
    from anomaly_detection_on_video_tpu.training.optim import adam_with_l2

    overrides, fdim = FAMILIES[name]
    _, model = build_model(name.split("-")[0], **overrides)
    feature = jnp.asarray(
        np.random.RandomState(0).randn(2, 10, 32, fdim).astype(np.float32)
    )
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        feature,
        train=True,
    )
    state = TrainState.create(model, variables, adam_with_l2())
    mesh = make_mesh((1, tp), ("data", "model"), jax.devices()[:tp])
    specs = tensor_parallel_specs(state, mesh)

    leaves, _ = jax.tree_util.tree_flatten_with_path(state)
    spec_leaves = jax.tree_util.tree_leaves(specs)
    total = sharded = 0
    n_leaves = n_sharded = 0
    replicated = []
    for (path, leaf), spec in zip(leaves, spec_leaves):
        if not hasattr(leaf, "nbytes"):
            continue
        nbytes = int(leaf.nbytes)
        total += nbytes
        n_leaves += 1
        if any(p is not None for p in spec.spec):
            sharded += nbytes
            n_sharded += 1
        elif nbytes > 0 and leaf.ndim > 0:
            replicated.append((nbytes, leaf_name(path), list(leaf.shape)))
    replicated.sort(reverse=True)
    per_device = sharded // tp + (total - sharded)
    return {
        "family": name,
        "tp": tp,
        "total_mib": round(total / 2**20, 3),
        "sharded_bytes_frac": round(sharded / total, 4),
        "sharded_leaf_frac": round(n_sharded / n_leaves, 4),
        "per_device_mib": round(per_device / 2**20, 3),
        "memory_vs_replicated": round(per_device / total, 4),
        "largest_replicated": [
            {"leaf": n, "shape": s, "kib": round(b / 1024, 1)}
            for b, n, s in replicated[:4]
        ],
    }


def time_mgfn_step(mesh_shape, steps: int = 8) -> dict:
    """Jit the full-size MGFN train step over the given (data, model) mesh
    and time it at the reference batch (16 normal + 16 abnormal bags)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from anomaly_detection_on_video_tpu.models import build_model
    from anomaly_detection_on_video_tpu.parallel import (
        make_mesh,
        shard_batch,
        tensor_parallel_specs,
    )
    from anomaly_detection_on_video_tpu.training import TrainState
    from anomaly_detection_on_video_tpu.training.optim import adam_with_l2
    from anomaly_detection_on_video_tpu.training.runner import make_train_step

    dp, tp = mesh_shape
    mesh = make_mesh((dp, tp), ("data", "model"), jax.devices()[: dp * tp])
    _, model = build_model("mgfn")
    feature = jnp.asarray(
        np.random.RandomState(0).randn(32, 10, 32, 2049).astype(np.float32)
    )
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        feature[:2],
        train=True,
    )
    state = TrainState.create(model, variables, adam_with_l2())
    if tp > 1:
        state = jax.tree_util.tree_map(
            jax.device_put, state, tensor_parallel_specs(state, mesh)
        )
    step = make_train_step(mesh, state=state if tp > 1 else None)
    batch = shard_batch(
        mesh,
        {
            "feature": feature,
            "normal": jnp.zeros(16),
            "abnormal": jnp.ones(16),
        },
    )
    rng = jax.random.PRNGKey(2)
    t_compile = time.perf_counter()
    state, loss = step(
        state, batch["feature"], batch["normal"], batch["abnormal"], rng
    )
    loss.block_until_ready()
    compile_s = time.perf_counter() - t_compile
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = step(
            state, batch["feature"], batch["normal"], batch["abnormal"], rng
        )
    loss.block_until_ready()
    dt = (time.perf_counter() - t0) / steps
    return {
        "mesh": {"data": dp, "model": tp},
        "step_ms": round(dt * 1000, 1),
        "compile_s": round(compile_s, 1),
        "loss": float(loss),
    }


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default=None)
    parser.add_argument("--steps", type=int, default=8)
    parser.add_argument("--no-timing", action="store_true",
                        help="audit shardings only (fast)")
    args = parser.parse_args(argv)

    if not os.environ.get("_TP_AUDIT_BOOTSTRAPPED"):
        import jax

        jax.config.update("jax_platforms", "cpu")
        if jax.local_device_count() < N_DEVICES:
            _bootstrap()

    report = {"audit": [], "mgfn_step_time_cpu": []}
    for family in FAMILIES:
        for tp in (2, 4):
            report["audit"].append(audit_family(family, tp))
            print(json.dumps(report["audit"][-1]))
    if not args.no_timing:
        for mesh_shape in ((8, 1), (4, 2), (2, 4)):
            rec = time_mgfn_step(mesh_shape, args.steps)
            report["mgfn_step_time_cpu"].append(rec)
            print(json.dumps(rec))
        # the CPU-mesh timing is a relative smoke signal only: 8 virtual
        # devices share ONE host core, so collective overheads dominate
        report["timing_caveat"] = (
            "virtual 8-device CPU mesh on a 1-core host; relative signal "
            "only, not TPU performance"
        )
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"report -> {args.out}", file=sys.stderr)
    return report


if __name__ == "__main__":
    main()
