"""Risk reductions vs numpy oracles and the reference Costs class."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

from mpc_mmd_tpu.config import static_workload
from mpc_mmd_tpu import risk as risk_mod


@pytest.fixture(scope="module")
def cfg():
    return static_workload(num_reduced=6, num_obs=2, num_prime=30, mode="cvar")


def test_f_bar_geometry(cfg):
    # rollout passing exactly through an obstacle center -> violation 1
    T = cfg.horizon.num_prime
    x_roll = jnp.broadcast_to(jnp.linspace(0, 50, T), (6, T))
    y_roll = jnp.zeros((6, T))
    x_obs = jnp.full((2, T), 25.0)
    y_obs = jnp.zeros((2, T))
    viol = risk_mod.f_bar_obs(cfg, x_roll, y_roll, x_obs, y_obs)
    assert viol.shape == (6,)
    assert float(viol[0]) > 0.9
    # far obstacle -> zero
    viol0 = risk_mod.f_bar_obs(cfg, x_roll, y_roll, x_obs + 1000, y_obs)
    np.testing.assert_array_equal(np.asarray(viol0), 0.0)


def test_cvar_reduce_masked_mean_semantics(rng):
    samples = jnp.asarray(np.sort(rng.uniform(0, 1, 50)))
    out = float(risk_mod.cvar_reduce(samples, 0.9))
    var = np.quantile(np.asarray(samples), 0.9)
    tail = np.asarray(samples)[np.asarray(samples) >= var]
    assert out == pytest.approx(tail.mean(), rel=1e-5)


def test_cvar_reduce_all_zero():
    # all-zero violations: quantile 0, mask covers everything, mean 0
    assert float(risk_mod.cvar_reduce(jnp.zeros(10), 0.98)) == 0.0


def test_saa_reduce(cfg):
    samples = jnp.asarray([0.0, 0.5, 0.0, 1.0, 0.0, 0.0])
    assert float(risk_mod.saa_reduce(samples, 6)) == pytest.approx(2 / 6)


def test_risk_matches_reference_costs(cfg):
    sys.path.insert(0, "/root/reference/synthetic_static_obs")
    try:
        from kernel_computation import kernel_matrix
        sys.path.insert(0, "/root/reference/synthetic_static_obs/optimizer")
        from costs import Costs
    except ImportError:
        pytest.skip("reference not available")
    R, T, O = 6, 30, 2
    prob = kernel_matrix(R, cfg.risk.ker_wt, jnp.eye(11))
    ref = Costs(prob, R, O, T, cfg.obstacles.a_obs, cfg.obstacles.b_obs,
                cfg.lane.y_lb, cfg.lane.y_ub, cfg.risk.alpha_quant,
                cfg.risk.alpha_quant_lane, cfg.lane.y_des_1, cfg.lane.y_des_2,
                cfg.lane.gamma_lane_des)
    rng = np.random.default_rng(5)
    x_roll = jnp.asarray(rng.uniform(0, 60, (R, T)), jnp.float32)
    y_roll = jnp.asarray(rng.uniform(-3, 3, (R, T)), jnp.float32)
    x_obs = jnp.asarray(rng.uniform(10, 50, (O, T)), jnp.float32)
    y_obs = jnp.asarray(rng.uniform(-2, 2, (O, T)), jnp.float32)
    beta = jnp.asarray(rng.dirichlet(np.ones(R)), jnp.float32)
    sigma = jnp.float32(2.0)

    got = float(risk_mod.mmd_obs(cfg, beta, sigma, x_roll, y_roll, x_obs, y_obs))
    want = float(ref.compute_mmd_obs(beta, sigma, x_roll, y_roll, x_obs, y_obs))
    assert got == pytest.approx(want, rel=1e-3, abs=1e-2)

    got = float(risk_mod.cvar_obs(cfg, x_roll, y_roll, x_obs, y_obs))
    want = float(ref.compute_cvar_obs(x_roll, y_roll, x_obs, y_obs))
    assert got == pytest.approx(want, rel=1e-4, abs=1e-5)

    got = float(risk_mod.saa_obs(cfg, x_roll, y_roll, x_obs, y_obs))
    want = float(ref.compute_saa_obs(x_roll, y_roll, x_obs, y_obs))
    assert got == pytest.approx(want, abs=1e-6)

    got = float(risk_mod.mmd_lane(cfg, beta, sigma, y_roll))
    want = float(ref.compute_mmd_lane(beta, sigma, y_roll))
    assert got == pytest.approx(want, rel=1e-3, abs=1e-2)

    got = float(risk_mod.cvar_lane(cfg, y_roll))
    want = float(ref.compute_cvar_lane(y_roll))
    assert got == pytest.approx(want, rel=1e-4, abs=1e-5)

    got = float(risk_mod.saa_lane(cfg, y_roll))
    want = float(ref.compute_saa_lane(y_roll))
    assert got == pytest.approx(want, abs=1e-6)

    # desired-lane variants
    got = float(risk_mod.cvar_lane_des(cfg, y_roll))
    want = float(ref.compute_lane_des_cvar(y_roll))
    assert got == pytest.approx(want, rel=1e-4, abs=1e-5)

    got = float(risk_mod.saa_lane_des(cfg, y_roll))
    want = float(ref.compute_lane_des_saa(y_roll))
    assert got == pytest.approx(want, abs=1e-6)
