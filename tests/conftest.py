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


def blocking_scenarios(tot_time, S, n_obs=2):
    """Tie-free obstacle scenarios: obstacles sit directly in the ego's
    near-field path (x in [8, 17] m, in-lane), so every candidate incurs a
    distinct non-zero obstacle cost and argsort has no exact ties — enabling
    tight (rtol<=1e-3) sharded-vs-single equivalence checks (VERDICT r1
    item 7) instead of the 0.3 bands that tie-flipping used to force."""
    import jax.numpy as jnp
    from mpc_mmd_tpu.dynamics import constant_velocity_obstacles

    xts, yts = [], []
    for i in range(S):
        x0 = jnp.asarray(np.resize([8.0 + 0.37 * i, 13.0 + 0.53 * i],
                                   n_obs))
        y0 = jnp.asarray(np.resize([1.75 - 0.11 * i, 0.6 + 0.13 * i],
                                   n_obs))
        z = jnp.zeros(n_obs)
        xt, yt, _ = constant_velocity_obstacles(x0, y0, z, z, z, tot_time)
        xts.append(xt)
        yts.append(yt)
    return jnp.stack(xts), jnp.stack(yts)
