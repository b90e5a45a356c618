"""Device-mesh construction for ICI/DCN scaling.

The reference has no distributed code at all (SURVEY.md §2.2); this is the
new TPU-first layer: a 1-D ``data`` mesh shards the MIL bag axis for
training and the clip axis for extraction; gradients psum over ICI
automatically under jit. Multi-host (DCN) initialization goes through
``jax.distributed.initialize`` before mesh construction.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axis_shapes: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a mesh over the available devices.

    Default: all local devices on one ``data`` axis. ``axis_shapes`` allows
    ND meshes (e.g. (4, 2) over ("data", "model")).
    """
    devices = list(devices if devices is not None else jax.devices())
    if axis_shapes is None:
        axis_shapes = (len(devices),)
    if int(np.prod(axis_shapes)) != len(devices):
        raise ValueError(
            f"mesh shape {axis_shapes} does not cover {len(devices)} devices"
        )
    if len(axis_shapes) != len(axis_names):
        raise ValueError("axis_shapes and axis_names must align")
    grid = np.asarray(devices).reshape(axis_shapes)
    return Mesh(grid, tuple(axis_names))


def local_mesh(max_devices: Optional[int] = None) -> Mesh:
    """1-D data mesh over up to ``max_devices`` local devices."""
    devices = jax.devices()
    if max_devices is not None:
        devices = devices[:max_devices]
    return make_mesh((len(devices),), ("data",), devices)


def initialize_multihost(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    autodetect: bool = False,
) -> None:
    """DCN multi-host init.

    On TPU pods pass ``autodetect=True``: ``jax.distributed.initialize()``
    discovers the coordinator/process topology from the TPU metadata. On
    other platforms pass ``coordinator``/``num_processes``/``process_id``
    explicitly (e.g. the 2-process CPU exercise in tests/test_multihost.py).
    With neither, this is a deliberate no-op (single-host run). After
    initialization ``jax.devices()`` is global and ``make_mesh()`` spans
    all hosts; collectives ride DCN between hosts.
    """
    if coordinator is None and not autodetect:
        return
    if coordinator is None:
        jax.distributed.initialize()
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def barrier(name: str, timeout_s: int = 86400) -> None:
    """Cross-process rendezvous through the coordination service.

    For coarse job-level sync (e.g. "every host finished its extraction
    shard") — NOT a device collective: ``multihost_utils.
    sync_global_devices`` compiles an all-reduce whose transport (Gloo on
    CPU) enforces its own ~30 s connect timeout, so processes whose work
    is minutes skewed (a per-video sweep on uneven shards) kill the run.
    The coordinator barrier has an explicit timeout and needs no device
    traffic. The default tolerates a full-corpus extraction sweep (hours);
    callers with tighter expectations pass their own. No-op single-process.
    """
    from jax._src import distributed

    client = getattr(distributed.global_state, "client", None)
    if client is None:
        return
    client.wait_at_barrier(name, timeout_in_ms=int(timeout_s * 1000))
