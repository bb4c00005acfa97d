"""Test configuration: run everything on an 8-device virtual CPU mesh.

Sharding/collective tests exercise the multi-chip code paths without TPU
hardware; numerical tests get deterministic CPU float behavior.
"""

import os

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
