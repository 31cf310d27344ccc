"""Test configuration.

In this container a sitecustomize registers the axon TPU PJRT plugin at
interpreter startup, so JAX is already imported before conftest runs and the
``JAX_PLATFORMS`` env var is too late.  Backends initialize lazily, though,
so ``jax.config.update("jax_platforms", "cpu")`` here still wins — the whole
suite runs on the 8-device virtual CPU mesh in minutes instead of
compile-bound hours on the tunneled TPU.  Set ``RUMI_TESTS_ON_TPU=1`` to
opt back into running on whatever accelerator is live.
"""

import os

# must land before the first backend init (lazy, so conftest-time is fine)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

if os.environ.get("RUMI_TESTS_ON_TPU") != "1":
    import jax

    jax.config.update("jax_platforms", "cpu")


def cpu_mesh_devices(n: int = 8):
    """Return n CPU devices or None (callers skip)."""
    import jax

    try:
        devs = jax.devices("cpu")
    except RuntimeError:
        return None
    return devs[:n] if len(devs) >= n else None
