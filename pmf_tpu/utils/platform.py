"""Platform helpers: persistent compilation cache and reliable timing.

The axon TPU tunnel in this environment has two quirks that shape these
helpers: first compiles of novel kernels can take minutes (a persistent
compilation cache amortizes them across processes), and
``jax.block_until_ready`` can return without synchronizing — only an
actual device->host transfer reliably bounds execution.
"""

from __future__ import annotations

import os
import time

_CACHE_INITIALIZED = False


def setup_cache(cache_dir: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (idempotent)."""
    global _CACHE_INITIALIZED
    if _CACHE_INITIALIZED:
        return
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "PMF_TPU_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache"),
        )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    _CACHE_INITIALIZED = True


def device_sync(tree) -> float:
    """Force real synchronization via a scalar transfer; returns the sum."""
    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(tree)
    return float(jnp.sum(leaves[0].ravel()[0])) if leaves else 0.0


def measure_transfer_rtt(n: int = 5) -> float:
    """Measured scalar device->host round-trip (subtract from timings)."""
    import jax.numpy as jnp

    tiny = jnp.zeros((1,))
    float(tiny[0])
    t0 = time.perf_counter()
    for _ in range(n):
        float(tiny[0])
    return (time.perf_counter() - t0) / n
