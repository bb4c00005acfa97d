"""Test configuration: run everything on an 8-device virtual CPU mesh.

Sharding/collective tests exercise the multi-chip code paths without TPU
hardware; numerical tests get deterministic CPU float behavior.

NOTE: this environment pre-imports jax at interpreter startup (sitecustomize
registers the axon TPU plugin), so setting JAX_PLATFORMS via os.environ here
is too late — the env var was read at import.  ``jax.config.update`` works
at any point before backend initialization, which is what we use.
"""

import os

# Read at CPU-client creation (no backend is initialized yet during conftest
# import, so this still takes effect).
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        "tests must run on CPU; backend selection failed")
    assert len(jax.devices()) >= 8, (
        "xla_force_host_platform_device_count did not take effect")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
