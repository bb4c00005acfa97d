"""Device MC validator vs an independent numpy oracle.

The oracle mirrors the reference's validation.py:42-171 (pure-numpy rollout
+ count reductions) — the reference's own cross-check pattern, automated.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mpc_mmd_tpu.config import static_workload
from mpc_mmd_tpu.qp import build_workspace
from mpc_mmd_tpu.validate import make_validator

from test_dynamics import numpy_rollout


def _setup():
    cfg = static_workload(num_reduced=4, num_obs=2, num_prime=30, mode="cvar",
                          noise_level=0.15)
    ws = build_workspace(cfg)
    # a plausible straight-line solution: constant velocity in x, y = 1.75
    t = np.linspace(0, 15, 100)
    rng = np.random.default_rng(1)
    # fit coefficients to x(t) = 5t, y(t) = 1.75
    P = np.asarray(ws.P, np.float64)
    cx = np.linalg.lstsq(P, 5.0 * t, rcond=None)[0]
    cy = np.linalg.lstsq(P, 1.75 * np.ones_like(t), rcond=None)[0]
    return cfg, ws, jnp.asarray(cx, jnp.float32), jnp.asarray(cy, jnp.float32)


def test_validator_counts_against_oracle():
    cfg, ws, cx, cy = _setup()
    n_mc = 400
    validator = make_validator(cfg, ws, n_mc=n_mc)
    init = jnp.asarray([0.0, 1.75, 5.0, 0.0, 0.0, 0.0])
    # obstacle directly in the ego path at x=15 (reached at t~3 s of the
    # 4.5 s sub-horizon) -> collisions certain
    x_obs = np.full((1, 2, 100), 0.0)
    x_obs[0, 0, :] = 15.0
    x_obs[0, 1, :] = 200.0  # far away
    y_obs = np.full((1, 2, 100), 1.75)
    stats = validator(cx[None], cy[None], init, jnp.asarray(x_obs, jnp.float32),
                      jnp.asarray(y_obs, jnp.float32), jax.random.PRNGKey(0))
    # the ego passes straight through the obstacle: every rollout collides
    assert float(stats.coll_fraction[0]) > 0.99
    assert int(stats.coll_count[0]) > 0.9 * n_mc

    # obstacle far away: no collisions
    x_obs2 = np.full((1, 2, 100), 500.0)
    stats2 = validator(cx[None], cy[None], init,
                       jnp.asarray(x_obs2, jnp.float32),
                       jnp.asarray(y_obs, jnp.float32), jax.random.PRNGKey(0))
    assert int(stats2.coll_count[0]) == 0
    assert float(stats2.coll_fraction[0]) == 0.0


def test_validator_statistics_match_numpy_oracle():
    """Collision fraction agrees with an independent numpy MC estimate."""
    cfg, ws, cx, cy = _setup()
    n_mc = 800
    T = cfg.horizon.num_prime
    validator = make_validator(cfg, ws, n_mc=n_mc)
    init = jnp.asarray([0.0, 1.75, 5.0, 0.0, 0.0, 0.0])
    # borderline obstacle: partially in path
    x_obs = np.full((1, 1, 100), 15.0)
    y_obs = np.full((1, 1, 100), 1.75 - 2.4)
    stats = validator(cx[None], cy[None], init, jnp.asarray(x_obs, jnp.float32),
                      jnp.asarray(y_obs, jnp.float32), jax.random.PRNGKey(3))
    frac_device = float(stats.coll_fraction[0])

    # numpy oracle with its own RNG (compare distributions, not draws)
    rng = np.random.default_rng(7)
    xdot = np.asarray(ws.Pdot, np.float64) @ np.asarray(cx, np.float64)
    ydot = np.asarray(ws.Pdot, np.float64) @ np.asarray(cy, np.float64)
    xddot = np.asarray(ws.Pddot, np.float64) @ np.asarray(cx, np.float64)
    yddot = np.asarray(ws.Pddot, np.float64) @ np.asarray(cy, np.float64)
    v = np.sqrt(xdot ** 2 + ydot ** 2)
    v_ext = np.hstack((v, v[-1]))
    acc = np.diff(v_ext) / cfg.horizon.dt
    acc = np.hstack((acc, acc[-1]))[:100][:T]
    kappa = (yddot * xdot - ydot * xddot) / (xdot ** 2 + ydot ** 2) ** 1.5
    steer = np.arctan(kappa * cfg.vehicle.wheel_base)[:T]

    acc_n = acc + cfg.noise.level * np.abs(acc) * rng.normal(size=(n_mc, T))
    steer_n = steer + cfg.noise.level * np.abs(steer) * rng.normal(size=(n_mc, T))
    x_r, y_r = numpy_rollout(acc_n, steer_n,
                             np.array([0.0, 1.75, 5.0, 0.0, 0.0]))
    viol = (1.0 - (x_r - 15.0) ** 2 / cfg.obstacles.a_obs ** 2
            - (y_r - (1.75 - 2.4)) ** 2 / cfg.obstacles.b_obs ** 2) > 0
    frac_numpy = np.mean(np.any(viol, axis=1))

    assert abs(frac_device - frac_numpy) < 0.1


def test_validator_batch_axis():
    cfg, ws, cx, cy = _setup()
    validator = make_validator(cfg, ws, n_mc=100)
    init = jnp.asarray([0.0, 1.75, 5.0, 0.0, 0.0, 0.0])
    S = 3
    x_obs = jnp.asarray(np.full((S, 1, 100), 500.0), jnp.float32)
    y_obs = jnp.asarray(np.full((S, 1, 100), 1.75), jnp.float32)
    stats = validator(jnp.stack([cx] * S), jnp.stack([cy] * S), init,
                      x_obs, y_obs, jax.random.PRNGKey(0))
    assert stats.coll_count.shape == (S,)
