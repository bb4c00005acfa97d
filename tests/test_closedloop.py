"""Closed-loop synthetic episodes: progress, avoidance, det baseline."""

import dataclasses

import numpy as np
import pytest

from mpc_mmd_tpu.config import onroad_workload
from mpc_mmd_tpu.closedloop import (SyntheticPlant, make_route,
                                    perceive_obstacles, run_episode)


def tiny(mode, **kw):
    cfg = onroad_workload(num_reduced=3, num_obs=2, num_prime=20, mode=mode,
                          **kw)
    return cfg.replace(cem=dataclasses.replace(cfg.cem, maxiter_cem=3),
                       beta_cem=dataclasses.replace(cfg.beta_cem, maxiter=3))


def test_cvar_episode_progresses_without_collision():
    cfg = tiny("cvar")
    r = run_episode(cfg, route_kind="curved", obstacles_s_l=((70.0, 0.0),),
                    v_des=10.0, max_steps=40, goal_arc=150.0, seed=1)
    assert not r.collided
    assert len(r.ego_trace) == r.steps
    # forward progress along the route
    assert r.ego_trace[-1][0] > 20.0
    # speed responds to the controller (accelerates from 5 toward v_des)
    assert r.ego_trace[-1][2] > 5.2


def test_det_baseline_runs():
    cfg = tiny("det")
    r = run_episode(cfg, route_kind="straight", obstacles_s_l=(),
                    v_des=10.0, max_steps=15, goal_arc=100.0, seed=2,
                    noise_on_control=False)
    assert not r.collided
    assert r.ego_trace[-1][0] > 10.0


def test_mmd_opt_episode_step():
    cfg = tiny("mmd_opt")
    r = run_episode(cfg, route_kind="straight", obstacles_s_l=((40.0, 0.0),),
                    v_des=8.0, max_steps=6, goal_arc=100.0, seed=3)
    assert len(r.solve_times) == r.steps
    assert np.all(np.isfinite(r.ego_trace))


def test_perception_filter_and_padding():
    cfg = tiny("cvar")
    plant = SyntheticPlant(cfg, make_route("straight"),
                           [(30.0, 0.0), (-20.0, 0.0)])
    obs = perceive_obstacles(cfg, plant, (0.0, 0.0), 0.0)
    assert obs.shape == (2, 5)
    # obstacle behind the ego is filtered; padding dummy is far away
    assert obs[0][0] == pytest.approx(30.0, abs=1.0)
    assert np.linalg.norm(obs[1][:2]) > 300.0
