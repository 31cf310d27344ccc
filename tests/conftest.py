"""Test configuration.

In this container a sitecustomize registers the axon TPU PJRT plugin at
interpreter startup, so JAX is already imported before conftest runs and
``JAX_PLATFORMS`` cannot be changed from Python.  Tests therefore run on
whatever backend is live (single TPU here; plain CPU elsewhere).  Multi-device
mesh tests fetch ``jax.devices("cpu")`` and skip unless the environment was
launched with ``XLA_FLAGS=--xla_force_host_platform_device_count=8`` (the
driver's dryrun harness and CI set this before Python starts).
"""

import os

# honored only when jax has not been imported yet (normal CPU environments)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()


def cpu_mesh_devices(n: int = 8):
    """Return n CPU devices or None (callers skip)."""
    import jax

    try:
        devs = jax.devices("cpu")
    except RuntimeError:
        return None
    return devs[:n] if len(devs) >= n else None
