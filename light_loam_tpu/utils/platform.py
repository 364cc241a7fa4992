"""JAX platform-selection helper for CLI entry points.

The hosting image preloads jax via sitecustomize with the platform
snapshotted from the container env (axon TPU), so setting
``JAX_PLATFORMS=cpu`` in a child process does NOT take by itself — the
live config must be updated too, or the process hangs initializing the
TPU plugin when the tunnel is down.  Every CLI calls this before doing
device work (same dance as tests/conftest.py, bench.py,
bench_accuracy.py).
"""

import os


def honor_jax_platforms_env() -> None:
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
