"""Persistent compilation cache (utils/compile_cache.py).

The cache is process-global jax config, so the unit test restores the
previous config in a finally block; CLI wiring is exercised in the
subprocess e2e (tests/test_integration.py) where isolation is free.
"""

import jax
import jax.numpy as jnp
import numpy as np

from anomaly_detection_on_video_tpu.utils.compile_cache import (
    enable_compile_cache,
)


def test_enable_compile_cache_writes_entries(tmp_path):
    cache_dir = tmp_path / "xla_cache"
    prev = {
        name: getattr(jax.config, name)
        for name in (
            "jax_compilation_cache_dir",
            "jax_persistent_cache_min_compile_time_secs",
            "jax_persistent_cache_min_entry_size_bytes",
        )
    }
    try:
        enable_compile_cache(str(cache_dir))
        assert jax.config.jax_compilation_cache_dir == str(cache_dir)

        # a fresh (not-yet-traced) jit target must serialize into the cache
        @jax.jit
        def probe(x):
            return jnp.tanh(x) @ x.T

        probe(np.ones((32, 32), np.float32)).block_until_ready()
        entries = list(cache_dir.iterdir())
        assert entries, "no compilation cache entries written"
    finally:
        for name, value in prev.items():
            jax.config.update(name, value)
