"""Workspace / guess-QP vs the reference's Helper.compute_x_guess."""

import numpy as np
import jax.numpy as jnp
import pytest

from mpc_mmd_tpu.config import static_workload
from mpc_mmd_tpu.qp import (boundary_vectors, build_workspace, compute_guess,
                            refit_coefficients)


@pytest.fixture(scope="module")
def cfg():
    return static_workload(num_reduced=4, num_obs=2, num_prime=50, mode="cvar")


@pytest.fixture(scope="module")
def ws(cfg):
    return build_workspace(cfg)


def test_workspace_shapes(cfg, ws):
    nvar = cfg.horizon.nvar
    num = cfg.horizon.num
    assert ws.P.shape == (num, nvar)
    assert ws.A_eq_x.shape == (3, nvar)
    assert ws.A_eq_y.shape == (4, nvar)
    assert ws.A_lane.shape == (2 * (num - 1), nvar)
    assert ws.guess_kkt_x.shape == (nvar + 3, nvar + 3)
    assert ws.guess_kkt_y.shape == (nvar + 4, nvar + 4)
    assert ws.P_prime.shape == (cfg.horizon.num_prime, nvar)


def test_kkt_inverses(ws):
    for mat, inv in [(ws.guess_kkt_x, ws.guess_kkt_x_inv),
                     (ws.guess_kkt_y, ws.guess_kkt_y_inv),
                     (ws.proj_kkt_x, ws.proj_kkt_x_inv),
                     (ws.proj_kkt_y, ws.proj_kkt_y_inv)]:
        n = mat.shape[0]
        prod = np.asarray(mat, np.float64) @ np.asarray(inv, np.float64)
        np.testing.assert_allclose(prod, np.eye(n), atol=5e-4)


def test_guess_satisfies_equality_constraints(cfg, ws, rng):
    nb = cfg.cem.num_batch
    params = jnp.asarray(
        np.hstack((rng.uniform(5, 20, (nb, 4)), rng.normal(0, 1, (nb, 4)))),
        jnp.float32)
    init_state = jnp.asarray([0.0, 1.75, 5.0, 0.0, 0.0, 0.0])
    b_eq_x, b_eq_y = boundary_vectors(cfg, init_state)
    cx, cy = compute_guess(cfg, ws, params, b_eq_x, b_eq_y)
    # boundary conditions hold
    np.testing.assert_allclose(np.asarray(cx @ ws.A_eq_x.T), np.asarray(b_eq_x),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(cy @ ws.A_eq_y.T), np.asarray(b_eq_y),
                               atol=1e-3)


def test_guess_matches_reference(cfg, ws, rng):
    import sys
    sys.path.insert(0, "/root/reference/synthetic_static_obs")
    sys.path.insert(0, "/root/reference/synthetic_static_obs/optimizer")
    try:
        import cem as ref_cem
    except ImportError:
        pytest.skip("reference not available")
    prob = ref_cem.CEM(4, 2, 0.1, 50, "gaussian", 0.0, 0.0)
    nb = cfg.cem.num_batch
    params_np = np.hstack((rng.uniform(5, 20, (nb, 4)), rng.normal(0, 3, (nb, 4))))
    params = jnp.asarray(params_np, jnp.float32)
    init_state = jnp.asarray([0.0, 1.75, 5.0, 0.0, 0.0, 0.0])
    b_eq_x, b_eq_y = boundary_vectors(cfg, init_state)
    bx_r, by_r = prob.cem_helper.compute_boundary_vec(0.0, 5.0, 0.0, 1.75, 0.0, 0.0)
    np.testing.assert_allclose(np.asarray(b_eq_x), np.asarray(bx_r), atol=1e-6)
    np.testing.assert_allclose(np.asarray(b_eq_y), np.asarray(by_r), atol=1e-6)

    cx_ref, cy_ref = prob.cem_helper.compute_x_guess(bx_r, by_r, params)
    cx, cy = compute_guess(cfg, ws, params, b_eq_x, b_eq_y)
    np.testing.assert_allclose(np.asarray(cx), np.asarray(cx_ref),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(cy), np.asarray(cy_ref),
                               rtol=1e-3, atol=1e-3)


def test_refit_roundtrip(cfg, ws, rng):
    """Coefficients -> trajectory -> refit reconstructs the trajectory.

    The 0.05 ridge (matching the reference, cem_helper.py:556) biases weak
    Gram modes, so reconstruction is approximate — bound the relative error.
    """
    c = jnp.asarray(rng.normal(0, 3, (6, cfg.horizon.nvar)), jnp.float32)
    x = c @ ws.P_prime.T
    cx, cy = refit_coefficients(ws, x, x)
    x_rec = cx @ ws.P_prime.T
    err = np.linalg.norm(np.asarray(x_rec - x)) / np.linalg.norm(np.asarray(x))
    assert err < 0.1
    np.testing.assert_array_equal(np.asarray(cx), np.asarray(cy))


def test_refit_matches_reference(cfg, ws, rng):
    import sys
    sys.path.insert(0, "/root/reference/synthetic_static_obs")
    sys.path.insert(0, "/root/reference/synthetic_static_obs/optimizer")
    try:
        import cem as ref_cem
    except ImportError:
        pytest.skip("reference not available")
    prob = ref_cem.CEM(4, 2, 0.1, 50, "gaussian", 0.0, 0.0)
    x = jnp.asarray(rng.normal(0, 5, (16, 50)), jnp.float32)
    y = jnp.asarray(rng.normal(0, 2, (16, 50)), jnp.float32)
    cx_ref, cy_ref = prob.cem_helper.compute_coeff(x, y)
    cx, cy = refit_coefficients(ws, x, y)
    np.testing.assert_allclose(np.asarray(cx), np.asarray(cx_ref),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(cy), np.asarray(cy_ref),
                               rtol=1e-3, atol=1e-3)
