"""Persistent XLA compilation-cache control (serving cold-start).

The reference runs torch eagerly and has no compile step; under XLA every
jit target compiles once per process, and on TPU the big I3D forwards take
tens of seconds (minutes through a remote-compile toolchain). Pointing the
persistent cache at a directory makes serving restarts (infer.py
--watch), repeated extraction sweeps, and training relaunches reuse the
compiled executables across processes — cache keys cover the HLO, the
compile options, and the device topology, so entries are only ever reused
on matching hardware.

Exposed as ``--compile-cache DIR`` on infer.py / extract_features.py and
``trainer.compile_cache: DIR`` on run.py. JAX also honors the
``JAX_COMPILATION_CACHE_DIR`` environment variable natively; this helper
additionally drops the minimum-compile-time/entry-size thresholds so small
steps (which still cost round-trips on a remote toolchain) are cached too.
"""

from __future__ import annotations

import os

__all__ = ["enable_compile_cache"]


def enable_compile_cache(path: str) -> None:
    """Enable the persistent compilation cache at ``path``.

    Must run before the first jit compilation of the process (later
    compiles still cache, earlier ones are simply missed).
    """
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything: the defaults skip executables that compiled fast
    # or serialize small, but on a tunneled/remote toolchain even those
    # recompiles cost whole round-trips
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
