"""Test environment: force CPU with 8 virtual devices.

NOTE: this image pre-imports jax at interpreter startup (PYTHONPATH
/root/.axon_site) with JAX_PLATFORMS=axon, so env vars set here are too late
for the import — but the backend itself initializes lazily, so
``jax.config.update`` + XLA_FLAGS set before first device use still work.

Multi-chip sharding tests run against this fake 8-device CPU mesh
(SURVEY §4: "multi-device tests under forced
xla_force_host_platform_device_count"); Pallas kernels run in interpret mode.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the slow tier's cost is almost entirely
# full-model CPU compiles; caching them on disk makes reruns (and the
# separate CLI invocations inside the integration tests) load in seconds.
from maskrcnn_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_sessionstart(session):
    """Fail loudly if the backend forcing was ignored (e.g. a pre-initialized
    TPU backend) — an '8-way' suite quietly running 1-way on another
    platform is worse than an error."""
    devices = jax.devices()
    platforms = {d.platform for d in devices}
    if platforms != {"cpu"} or len(devices) < 8:
        pytest.exit(
            f"test env requires a forced 8-device CPU backend, got "
            f"{len(devices)} device(s) on {sorted(platforms)}; run pytest "
            "from a shell with JAX_PLATFORMS=cpu "
            "XLA_FLAGS=--xla_force_host_platform_device_count=8 if the "
            "in-process forcing below is too late in your environment",
            returncode=3,
        )


@pytest.fixture
def rng():
    return np.random.RandomState(0)
