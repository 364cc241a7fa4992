import os

# Force a virtual 8-device CPU mesh for all tests: deterministic, no TPU
# needed, and exercises the same sharding code paths as a real slice.
# NOTE: the environment may pin JAX_PLATFORMS to a TPU plugin and preload
# jax via sitecustomize; backend selection happens lazily, so overriding the
# env here (before any backend is initialized) still routes tests to CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax may have been imported (and JAX_PLATFORMS snapshotted) by a
# sitecustomize before this conftest ran; update the live config too.
jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh; backend was initialized too "
    f"early: {jax.devices()}"
)
