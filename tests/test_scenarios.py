"""Scenario generators vs reference semantics."""

import numpy as np
import jax.numpy as jnp
import pytest

from mpc_mmd_tpu.config import static_workload, dynamic_workload
from mpc_mmd_tpu.scenarios import (dynamic_cutin, ego_initial_state,
                                   static_grid)


def test_static_grid_matches_reference_rng():
    """Config k draws with numpy seed k exactly like main_mpc.py:10-21."""
    cfg = static_workload(num_obs=3, mode="cvar")
    batch = static_grid(cfg, 5)
    for k in range(5):
        np.random.seed(k)
        x_ref = np.random.choice(np.array([35, 40, 45, 50, 55, 60, 65, 70, 75]),
                                 (3,), replace=False)
        y_ref = np.random.choice(np.array([-1.75, 1.75]), (3,))
        np.testing.assert_allclose(np.asarray(batch.x_obs[k]), x_ref)
        np.testing.assert_allclose(np.asarray(batch.y_obs[k]), y_ref)
    # static: trajectories are constant
    np.testing.assert_allclose(np.asarray(batch.x_traj[0, 0]),
                               float(batch.x_obs[0, 0]))


def test_static_grid_no_duplicate_positions():
    cfg = static_workload(num_obs=6, mode="cvar")
    batch = static_grid(cfg, 10)
    for k in range(10):
        xs = np.asarray(batch.x_obs[k])
        assert len(np.unique(xs)) == 6


def test_dynamic_cutin_shapes_and_behavior():
    cfg = dynamic_workload(num_obs=4, mode="cvar")
    batch = dynamic_cutin(cfg, 6)
    assert batch.x_traj.shape == (6, 4, 100)
    xt = np.asarray(batch.x_traj)
    yt = np.asarray(batch.y_traj)
    # obstacles start in the left lane at their sampled x
    np.testing.assert_allclose(yt[:, :, 0], 1.75, atol=1e-3)
    np.testing.assert_allclose(xt[:, :, 0], np.asarray(batch.x_obs), atol=1e-2)
    # cut-in: obstacles converge toward the ego lane y=-1.75
    assert np.all(yt[:, :, -1] < 0.0)
    np.testing.assert_allclose(yt[:, :, -1], -1.75, atol=0.5)
    # forward motion with v_des ~ 6 m/s over 15 s
    dist = xt[:, :, -1] - xt[:, :, 0]
    assert np.all(dist > 20.0) and np.all(dist < 140.0)


def test_dynamic_cutin_trajectories_smooth():
    cfg = dynamic_workload(num_obs=2, mode="cvar")
    batch = dynamic_cutin(cfg, 2)
    yt = np.asarray(batch.y_traj)
    dt = cfg.horizon.dt
    vy = np.diff(yt, axis=2) / dt
    ay = np.diff(vy, axis=2) / dt
    assert np.max(np.abs(vy)) < 5.0
    assert np.max(np.abs(ay)) < 10.0


def test_ego_initial_state_presets():
    s_init, mean, cov, v_des = ego_initial_state("static")
    assert float(s_init[1]) == 1.75
    d_init, _, _, _ = ego_initial_state("dynamic")
    assert float(d_init[1]) == -1.75
    assert v_des == 15.0
    assert cov.shape == (8, 8)
