"""Pallas kernels vs their XLA reference implementations (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpc_mmd_tpu.dynamics import rollout
from mpc_mmd_tpu.ops import fused_rollout


@pytest.mark.parametrize("L,T", [(256, 50), (1000, 30), (100, 20)])
def test_fused_rollout_matches_scan(rng, L, T):
    acc = jnp.asarray(rng.normal(1, 0.5, (L, T)), jnp.float32)
    steer = jnp.asarray(rng.normal(0, 0.1, (L, T)), jnp.float32)
    state0 = jnp.asarray([0.0, 1.75, 5.0, 0.0, 0.0], jnp.float32)
    x1, y1 = rollout(acc, steer, state0, 0.15, 2.5)
    x2, y2 = fused_rollout(acc, steer, state0, 0.15, 2.5, interpret=True)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_fused_rollout_per_lane_init_states(rng):
    L, T = 128, 25
    acc = jnp.asarray(rng.normal(1, 0.5, (L, T)), jnp.float32)
    steer = jnp.asarray(rng.normal(0, 0.1, (L, T)), jnp.float32)
    state0 = jnp.asarray(rng.normal(0, 1, (L, 5)), jnp.float32)
    x1, y1 = rollout(acc, steer, state0, 0.15, 2.5)
    x2, y2 = fused_rollout(acc, steer, state0, 0.15, 2.5, interpret=True)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)
