"""Bicycle dynamics + noise vs an independent numpy oracle.

The numpy rollout mirrors the reference's validation oracle
(synthetic_static_obs/validation.py:21-40), which independently re-implements
the JAX dynamics — the same cross-check pattern, now automated.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mpc_mmd_tpu.config import NoiseConfig
from mpc_mmd_tpu.dynamics import (constant_velocity_obstacles,
                                  controls_from_trajectory, mother_product,
                                  perturb_controls, rollout, step)

DT = 0.15
L = 2.5


def numpy_rollout(acc, steer, state0, dt=DT, wheel_base=L):
    B, T = acc.shape
    state = np.tile(np.asarray(state0, dtype=np.float64), (B, 1))
    xs = np.zeros((B, T))
    ys = np.zeros((B, T))
    for t in range(T):
        xs[:, t] = state[:, 0]
        ys[:, t] = state[:, 1]
        x, y, vx, vy, psi = state.T
        v = np.sqrt(vx ** 2 + vy ** 2) + acc[:, t] * dt
        psi_n = psi + v * np.tan(steer[:, t]) / wheel_base * dt
        vx_n = v * np.cos(psi_n)
        vy_n = v * np.sin(psi_n)
        state = np.stack((x + vx_n * dt, y + vy_n * dt, vx_n, vy_n, psi_n), axis=1)
    return xs, ys


def test_rollout_matches_numpy_oracle(rng):
    B, T = 7, 40
    acc = rng.normal(0, 1, (B, T))
    steer = rng.normal(0, 0.1, (B, T))
    state0 = np.array([0.0, 1.75, 5.0, 0.0, 0.0])
    x_np, y_np = numpy_rollout(acc, steer, state0)
    x_j, y_j = rollout(jnp.asarray(acc, jnp.float32), jnp.asarray(steer, jnp.float32),
                       jnp.asarray(state0, jnp.float32), DT, L)
    np.testing.assert_allclose(np.asarray(x_j), x_np, atol=2e-3)
    np.testing.assert_allclose(np.asarray(y_j), y_np, atol=2e-3)


def test_single_step(rng):
    state = jnp.asarray(rng.normal(0, 1, (4, 5)), jnp.float32)
    acc = jnp.asarray(rng.normal(0, 1, 4), jnp.float32)
    steer = jnp.asarray(rng.normal(0, 0.1, 4), jnp.float32)
    nxt = step(acc, steer, state, DT, L)
    s = np.asarray(state, np.float64)
    v = np.sqrt(s[:, 2] ** 2 + s[:, 3] ** 2) + np.asarray(acc) * DT
    psi = s[:, 4] + v * np.tan(np.asarray(steer)) / L * DT
    np.testing.assert_allclose(nxt[:, 4], psi, atol=1e-5)
    np.testing.assert_allclose(nxt[:, 2], v * np.cos(psi), atol=1e-5)


def test_gaussian_noise_stats():
    key = jax.random.PRNGKey(1)
    T, n = 30, 4000
    acc = 2.0 * jnp.ones(T)
    steer = 0.3 * jnp.ones(T)
    cfgn = NoiseConfig(kind="gaussian", level=0.2)
    a_n, s_n = perturb_controls(key, acc, steer, n, cfgn)
    # E[a_noisy] = a, std = level*|a|
    np.testing.assert_allclose(np.mean(a_n), 2.0, atol=0.02)
    np.testing.assert_allclose(np.std(np.asarray(a_n)), 0.2 * 2.0, rtol=0.05)
    np.testing.assert_allclose(np.std(np.asarray(s_n)), 0.2 * 0.3, rtol=0.05)


def test_beta_noise_stats_and_bounds():
    key = jax.random.PRNGKey(2)
    T, n = 20, 2000
    acc = 1.5 * jnp.ones(T)
    steer = 0.4 * jnp.ones(T)
    cfgn = NoiseConfig(kind="beta", level=0.3, k_steer=0.01)
    a_n, s_n = perturb_controls(key, acc, steer, n, cfgn)
    pert_a = np.asarray(a_n) - 1.5
    # beta pert lies in level*(-1, 1)
    assert np.all(np.abs(pert_a) <= 0.3 + 1e-6)
    # Beta(2a,5a) mean = 2/7 -> pert mean = level*(2*2/7 - 1)
    np.testing.assert_allclose(np.mean(pert_a), 0.3 * (4 / 7 - 1), atol=0.01)
    # steer pert additionally scaled by k_steer
    assert np.all(np.abs(np.asarray(s_n) - 0.4) <= 0.01 * 0.3 + 1e-6)


def test_beta_zero_control_guard_and_validator_guard():
    """Pin the Beta(0, 0) hazard handling.  The reference's unguarded
    Beta(a|u|, b|u|) (cem_helper.py:427-436) never sees |u| exactly 0 only
    because its projection leaves float dirt in the boundary rows; our
    prefactored projection is exact, so perturb_controls floors |u| at 1e-8
    — at steer == 0 the draw degenerates to the same Bernoulli coin flip on
    {-level*k, +level*k} the reference de facto produces.  The validator
    keeps the reference's own +1e-5 guard (validation.py:64-87)."""
    from mpc_mmd_tpu.config import static_workload
    from mpc_mmd_tpu.validate import _mc_noise

    key = jax.random.PRNGKey(4)
    T, n = 10, 8
    acc = 1.0 * jnp.ones(T)
    steer = jnp.zeros(T)

    cfgn = NoiseConfig(kind="beta", level=0.3, k_steer=0.01)
    a_n, s_n = perturb_controls(key, acc, steer, n, cfgn)
    assert np.all(np.isfinite(np.asarray(a_n)))      # acc != 0: fine
    s = np.asarray(s_n)
    assert np.all(np.isfinite(s))                     # 1e-8 floor: no NaN
    # Beta(~0, ~0) -> Bernoulli on {0, 1}: pert = +-k_steer*level exactly
    assert np.all(np.isclose(np.abs(s), 0.01 * 0.3, atol=1e-6))

    cfg = static_workload(num_reduced=3, num_obs=2, num_prime=T,
                          mode="cvar", noise="beta", noise_level=0.3)
    a_v, s_v = _mc_noise(cfg, key, acc, steer, n)
    assert np.all(np.isfinite(np.asarray(a_v)))
    assert np.all(np.isfinite(np.asarray(s_v)))       # +1e-5 guard


def test_validator_beta_moments():
    """Validator beta draws follow the reference parameterization
    (validation.py:75-82): pert mean = level*(2*a/(a+b) - 1), steer
    additionally scaled by k_steer."""
    from mpc_mmd_tpu.config import static_workload
    from mpc_mmd_tpu.validate import _mc_noise

    T, n = 20, 4000
    acc = 1.5 * jnp.ones(T)
    steer = 0.4 * jnp.ones(T)
    cfg = static_workload(num_reduced=3, num_obs=2, num_prime=T,
                          mode="cvar", noise="beta", noise_level=0.3)
    a_v, s_v = _mc_noise(cfg, jax.random.PRNGKey(5), acc, steer, n)
    pert_a = np.asarray(a_v) - 1.5
    np.testing.assert_allclose(np.mean(pert_a), 0.3 * (4 / 7 - 1), atol=0.01)
    assert np.all(np.abs(pert_a) <= 0.3 + 1e-6)
    pert_s = np.asarray(s_v) - 0.4
    assert np.all(np.abs(pert_s) <= cfg.noise.k_steer * 0.3 + 1e-6)


def test_const_noise_shared_draw():
    """The reference applies the SAME const-noise samples to acc and steer
    (cem_helper.py:438-443); verify we reproduce that correlation."""
    key = jax.random.PRNGKey(3)
    T, n = 10, 50
    cfgn = NoiseConfig(kind="gaussian", level=0.0, acc_const=1.0, steer_const=2.0)
    a_n, s_n = perturb_controls(key, jnp.zeros(T), jnp.zeros(T), n, cfgn)
    np.testing.assert_allclose(np.asarray(s_n), 2.0 * np.asarray(a_n), atol=1e-6)


def test_mother_product_layout():
    k, T = 3, 5
    acc = jnp.arange(k * T, dtype=jnp.float32).reshape(k, T)
    steer = 100 + jnp.arange(k * T, dtype=jnp.float32).reshape(k, T)
    a_m, s_m = mother_product(acc, steer)
    assert a_m.shape == (k * k, T)
    for m in range(k * k):
        np.testing.assert_array_equal(a_m[m], acc[m // k])
        np.testing.assert_array_equal(s_m[m], steer[m % k])


def test_controls_from_trajectory_matches_numpy(rng):
    B, T = 5, 60
    xdot = rng.uniform(3, 10, (B, T))
    ydot = rng.normal(0, 1, (B, T))
    xddot = rng.normal(0, 1, (B, T))
    yddot = rng.normal(0, 1, (B, T))
    acc, steer = controls_from_trajectory(
        jnp.asarray(xdot), jnp.asarray(ydot), jnp.asarray(xddot),
        jnp.asarray(yddot), DT, L)
    v = np.sqrt(xdot ** 2 + ydot ** 2)
    v_ext = np.hstack((v, v[:, -1:]))
    acc_np = np.diff(v_ext, axis=1) / DT
    acc_np = np.hstack((acc_np, acc_np[:, -1:]))[:, :T]
    kappa = (yddot * xdot - ydot * xddot) / (xdot ** 2 + ydot ** 2) ** 1.5
    np.testing.assert_allclose(np.asarray(acc), acc_np, atol=1e-4)
    np.testing.assert_allclose(np.asarray(steer), np.arctan(kappa * L), atol=1e-5)


def test_constant_velocity_obstacles():
    x0 = jnp.array([10.0, 20.0])
    y0 = jnp.array([1.0, -1.0])
    vx = jnp.array([1.0, 0.0])
    vy = jnp.array([0.0, 2.0])
    psi = jnp.array([0.1, 0.2])
    t = jnp.linspace(0, 15, 100)
    xt, yt, pt = constant_velocity_obstacles(x0, y0, vx, vy, psi, t)
    assert xt.shape == (2, 100)
    np.testing.assert_allclose(xt[0], 10.0 + np.linspace(0, 15, 100), atol=1e-5)
    np.testing.assert_allclose(yt[1], -1.0 + 2 * np.linspace(0, 15, 100), atol=1e-5)
    np.testing.assert_allclose(pt[0], 0.1, atol=1e-6)
