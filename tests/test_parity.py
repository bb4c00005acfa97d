"""End-to-end parity vs the actual reference implementation.

Parity standard (and why):

* **Deterministic stages** (sampling, guess QP, projection) match to float32
  round-off (<= ~1e-4) given identical inputs.
* **One full CEM iteration** matches in the returned control trajectory to
  <= 1e-3 (the BASELINE.json acceptance tolerance at num_prime=50).
* **Full 20-iteration solves** are *statistically* equivalent: identical risk
  quality, equivalent best costs.  Bitwise trajectory equality after 20
  iterations is not a meaningful target: the pipeline argsorts vectors with
  exact ties (e.g. every zero-violation candidate's MMD equals -ker_wt
  exactly, and CVaR of clear candidates is exactly 0), so candidate selection
  among equally-good optima is chaotic in float32 — the reference diverges
  from itself under any reordering of its own arithmetic.  Tests pin what is
  meaningful: risk values, solve quality, and constraint satisfaction.

These tests import and run the actual reference code (pure JAX) on CPU.
"""

import dataclasses
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/synthetic_static_obs")
sys.path.insert(0, "/root/reference/synthetic_static_obs/optimizer")

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

try:
    import cem as ref_cem_module
    HAVE_REF = True
except ImportError:
    HAVE_REF = False

from mpc_mmd_tpu import Solver, static_workload  # noqa: E402
import mpc_mmd_tpu.dynamics as dyn  # noqa: E402

pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference repo not available")

MEAN = jnp.asarray([15.0] * 4 + [0.0] * 4)
COV = jnp.asarray(np.diag([20.0] * 4 + [100.0] * 4), jnp.float32)
INIT = jnp.asarray([0.0, 1.75, 5.0, 0.0, 0.0, 0.0])
X_OBS = np.array([35.0, 50.0])
Y_OBS = np.array([-1.75, 1.75])


def _ref(num_reduced, num_prime, maxiter_cem=None):
    prob = ref_cem_module.CEM(num_reduced, 2, 0.1, num_prime, "gaussian", 0.0, 0.0)
    if maxiter_cem is not None:
        prob.maxiter_cem = maxiter_cem
    z = np.zeros(2)
    xt, yt, _ = prob.cem_helper.compute_obs_trajectories(X_OBS, Y_OBS, z, z, z)
    return prob, xt, yt


def _mine(num_reduced, num_prime, mode, maxiter_cem=None):
    cfg = static_workload(num_reduced=num_reduced, num_obs=2,
                          num_prime=num_prime, mode=mode)
    cfg = cfg.replace(solve_strategy="exact")
    if maxiter_cem is not None:
        cfg = cfg.replace(cem=dataclasses.replace(cfg.cem,
                                                  maxiter_cem=maxiter_cem))
    return Solver(cfg)


def _controls(ws, cfg, cx, cy, T):
    xd, yd = ws.Pdot @ cx, ws.Pdot @ cy
    xdd, ydd = ws.Pddot @ cx, ws.Pddot @ cy
    a, s = dyn.controls_from_trajectory(xd[None], yd[None], xdd[None],
                                        ydd[None], cfg.horizon.dt, 2.5)
    return np.asarray(a[0][:T]), np.asarray(s[0][:T])


def test_initial_sampling_bitexact():
    prob, _, _ = _ref(4, 20)
    solver = _mine(4, 20, "cvar")
    from mpc_mmd_tpu.sampling import initial_params
    ref_p = prob.cem_helper.sampling_param(MEAN, COV)
    my_p = initial_params(solver.cfg, MEAN, COV)
    np.testing.assert_array_equal(np.asarray(ref_p), np.asarray(my_p))


def test_projection_stage_parity():
    prob, xt, yt = _ref(4, 20)
    solver = _mine(4, 20, "cvar")
    cfg, ws = solver.cfg, solver.ws
    from mpc_mmd_tpu.qp import boundary_vectors, compute_guess
    from mpc_mmd_tpu.projection import project
    from mpc_mmd_tpu.sampling import initial_params

    params = initial_params(cfg, MEAN, COV)
    b_eq_x, b_eq_y = boundary_vectors(cfg, INIT)
    cx_g, cy_g = compute_guess(cfg, ws, params, b_eq_x, b_eq_y)

    nb, nvar = 100, 11
    lam0 = jnp.zeros((nb, nvar))
    sl0 = jnp.zeros((nb, 2 * 99))
    ref_out = prob.projection.compute_projection(
        xt, yt, b_eq_x, b_eq_y, lam0, lam0, cx_g, cy_g,
        prob.a_obs, prob.b_obs, sl0)
    pr = project(cfg, ws, cx_g, cy_g, b_eq_x, b_eq_y, lam0, lam0, sl0,
                 jnp.asarray(xt), jnp.asarray(yt))
    np.testing.assert_allclose(np.asarray(pr.c_x), np.asarray(ref_out[0]),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(pr.c_y), np.asarray(ref_out[1]),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(pr.res_norm), np.asarray(ref_out[8]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(pr.lamda_x), np.asarray(ref_out[9]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(pr.s_lane), np.asarray(ref_out[11]),
                               atol=1e-4)


def test_cvar_single_iteration_control_parity():
    """BASELINE.json acceptance: control match <= 1e-3 at num_prime=50."""
    prob, xt, yt = _ref(4, 50, maxiter_cem=1)
    solver = _mine(4, 50, "cvar", maxiter_cem=1)
    cx_r, cy_r, _, _ = prob.compute_cem_cvar(42, INIT, MEAN, COV, xt, yt, 15.0)
    r = solver.solve(42, INIT, MEAN, COV, jnp.asarray(xt), jnp.asarray(yt), 15.0)
    a_r, s_r = _controls(solver.ws, solver.cfg, jnp.asarray(cx_r),
                         jnp.asarray(cy_r), 50)
    a_m, s_m = _controls(solver.ws, solver.cfg, r.cx, r.cy, 50)
    assert np.max(np.abs(a_r - a_m)) <= 1e-3
    assert np.max(np.abs(s_r - s_m)) <= 1e-3


def test_mmd_opt_single_iteration_control_parity():
    """BASELINE.json acceptance for the flagship path: mmd_opt control
    match <= 1e-3 at num_prime=50 after one CEM iteration (vs
    compute_cem_mmd_opt, synthetic_static_obs/optimizer/cem.py:201-333)."""
    prob, xt, yt = _ref(4, 50, maxiter_cem=1)
    solver = _mine(4, 50, "mmd_opt", maxiter_cem=1)
    out = prob.compute_cem_mmd_opt(42, INIT, MEAN, COV, xt, yt, 15.0)
    cx_r, cy_r = out[0], out[1]
    r = solver.solve(42, INIT, MEAN, COV, jnp.asarray(xt), jnp.asarray(yt), 15.0)
    a_r, s_r = _controls(solver.ws, solver.cfg, jnp.asarray(cx_r),
                         jnp.asarray(cy_r), 50)
    a_m, s_m = _controls(solver.ws, solver.cfg, r.cx, r.cy, 50)
    assert np.max(np.abs(a_r - a_m)) <= 1e-3
    assert np.max(np.abs(s_r - s_m)) <= 1e-3


def test_cvar_full_solve_quality_equivalence():
    prob, xt, yt = _ref(4, 50)
    solver = _mine(4, 50, "cvar")
    ref_risk, my_risk = [], []
    for seed in range(3):
        out = prob.compute_cem_cvar(seed, INIT, MEAN, COV, xt, yt, 15.0)
        ref_risk.append(float(out[3]))
        r = solver.solve(seed, INIT, MEAN, COV, jnp.asarray(xt),
                         jnp.asarray(yt), 15.0)
        my_risk.append(float(r.risk_obs))
        # the returned solution must also satisfy the problem: boundary
        # conditions hold and the trajectory is finite (a solver that
        # "wins" by violating constraints must not pass)
        ws, cfgm = solver.ws, solver.cfg
        x_traj = np.asarray(ws.P @ r.cx)
        y_traj = np.asarray(ws.P @ r.cy)
        assert np.all(np.isfinite(x_traj)) and np.all(np.isfinite(y_traj))
        assert abs(x_traj[0] - float(INIT[0])) <= 1e-2
        assert abs(y_traj[0] - float(INIT[1])) <= 1e-2
        xd0 = float((ws.Pdot @ r.cx)[0])
        assert abs(xd0 - float(INIT[2])) <= 1e-2
    # two-sided: equivalent solve quality, neither regressed nor
    # suspiciously "better" than the reference optimizer on its own problem
    assert abs(np.mean(my_risk) - np.mean(ref_risk)) \
        <= 0.15 * abs(np.mean(ref_risk)) + 1e-3


def test_beta_noise_rollout_draw_parity():
    """Draw-level beta-noise parity: my perturb_controls + rollout vs the
    reference's fused compute_rollout_complete_baseline (cem_helper.py:
    403-464) under the SAME key — beta branch, shared const-noise draw."""
    prob = ref_cem_module.CEM(4, 2, 0.1, 20, "beta", 0.02, 0.01)
    helper = prob.cem_helper
    solver = _mine_noise(4, 20, "cvar", noise="beta",
                         acc_const=0.02, steer_const=0.01)
    cfg = solver.cfg

    T = 20
    acc = jnp.linspace(1.0, 2.0, T)
    steer = jnp.linspace(0.05, 0.2, T)
    init5 = jnp.asarray([0.0, 1.75, 5.0, 0.0, 0.0])
    key = jax.random.PRNGKey(7)

    x_ref, y_ref = helper.compute_rollout_complete_baseline(
        acc, steer, init5, key)
    a_n, s_n = dyn.perturb_controls(key, acc, steer, 4, cfg.noise)
    x_my, y_my = dyn.rollout(a_n, s_n, init5, cfg.horizon.dt,
                             cfg.vehicle.wheel_base)
    np.testing.assert_allclose(np.asarray(x_my), np.asarray(x_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(y_my), np.asarray(y_ref),
                               atol=1e-5)


def _mine_noise(num_reduced, num_prime, mode, noise="gaussian",
                acc_const=0.0, steer_const=0.0):
    cfg = static_workload(num_reduced=num_reduced, num_obs=2,
                          num_prime=num_prime, mode=mode, noise=noise,
                          acc_const_noise=acc_const,
                          steer_const_noise=steer_const)
    return Solver(cfg.replace(solve_strategy="exact"))


def test_mmd_opt_single_iteration_risk_parity():
    """mmd_opt: converged risk (== -ker_wt for clear candidates) matches
    exactly; sigma / inner-CEM residual match closely."""
    prob, xt, yt = _ref(3, 20, maxiter_cem=1)
    solver = _mine(3, 20, "mmd_opt", maxiter_cem=1)
    out = prob.compute_cem_mmd_opt(42, INIT, MEAN, COV, xt, yt, 15.0)
    cx_r, cy_r, lane_r, obs_r, beta_r, sigma_r, res_beta_r = out
    r = solver.solve(42, INIT, MEAN, COV, jnp.asarray(xt), jnp.asarray(yt), 15.0)
    assert float(r.risk_obs) == pytest.approx(float(obs_r), abs=1e-2)
    assert float(r.sigma) == pytest.approx(float(sigma_r), rel=0.01)
    assert float(jnp.sum(r.beta)) == pytest.approx(1.0, abs=1e-3)
    np.testing.assert_allclose(np.asarray(r.res_beta), np.asarray(res_beta_r),
                               atol=0.05)


def test_mmd_random_single_iteration_control_parity():
    """mmd_random control match <= 1e-3 at num_prime=50 after one CEM
    iteration (vs compute_cem_mmd_random, cem.py:335-462) — completes the
    control-parity coverage of all four static risk modes."""
    prob, xt, yt = _ref(4, 50, maxiter_cem=1)
    solver = _mine(4, 50, "mmd_random", maxiter_cem=1)
    cx_r, cy_r, _, _ = prob.compute_cem_mmd_random(42, INIT, MEAN, COV,
                                                   xt, yt, 15.0)
    r = solver.solve(42, INIT, MEAN, COV, jnp.asarray(xt), jnp.asarray(yt),
                     15.0)
    a_r, s_r = _controls(solver.ws, solver.cfg, jnp.asarray(cx_r),
                         jnp.asarray(cy_r), 50)
    a_m, s_m = _controls(solver.ws, solver.cfg, r.cx, r.cy, 50)
    assert np.max(np.abs(a_r - a_m)) <= 1e-3
    assert np.max(np.abs(s_r - s_m)) <= 1e-3


def test_saa_single_iteration_control_parity():
    """saa control match <= 1e-3 at num_prime=50 after one CEM iteration
    (vs compute_cem_saa, cem.py:590-714)."""
    prob, xt, yt = _ref(4, 50, maxiter_cem=1)
    solver = _mine(4, 50, "saa", maxiter_cem=1)
    cx_r, cy_r, _, _ = prob.compute_cem_saa(42, INIT, MEAN, COV, xt, yt,
                                            15.0)
    r = solver.solve(42, INIT, MEAN, COV, jnp.asarray(xt), jnp.asarray(yt),
                     15.0)
    a_r, s_r = _controls(solver.ws, solver.cfg, jnp.asarray(cx_r),
                         jnp.asarray(cy_r), 50)
    a_m, s_m = _controls(solver.ws, solver.cfg, r.cx, r.cy, 50)
    assert np.max(np.abs(a_r - a_m)) <= 1e-3
    assert np.max(np.abs(s_r - s_m)) <= 1e-3


def _ref_dynamic(num_reduced, num_prime, noise, noise_level,
                 maxiter_cem=None):
    """Load the synthetic_dynamic_obs reference CEM (module names clash
    with the static copies imported above — juggle sys.modules)."""
    clash = ("cem", "cem_helper", "compute_beta", "kernel_computation",
             "bernstein_coeff_order10_arbitinterval", "projection",
             "costs")
    saved_path = list(sys.path)
    saved_mods = {k: sys.modules.pop(k, None) for k in clash}
    sys.path.insert(0, "/root/reference/synthetic_dynamic_obs/optimizer")
    sys.path.insert(0, "/root/reference/synthetic_dynamic_obs")
    try:
        import cem as dyn_cem
        prob = dyn_cem.CEM(num_reduced, 2, noise_level, num_prime, noise,
                           0.0, 0.0)
    finally:
        sys.path[:] = saved_path
        for k in clash:
            sys.modules.pop(k, None)
        for k, v in saved_mods.items():
            if v is not None:
                sys.modules[k] = v
    if maxiter_cem is not None:
        prob.maxiter_cem = maxiter_cem
    return prob


def test_dynamic_beta_mmd_single_iteration_control_parity():
    """Dynamic-workload parity end to end: beta control noise with
    K_steer=0.05 and the single-lane band (synthetic_dynamic_obs deltas,
    cem.py:155 / cem_helper.py:24), mmd_opt mode, one CEM iteration,
    MOVING obstacle trajectories.  Controls <= 1e-3 like the static tests.
    Obstacles block the lane inside the horizon so MMD risks are distinct
    (all-clear candidates tie at exactly -ker_wt and the risk cut would
    flip on float dust — the argsort-ties caveat)."""
    from mpc_mmd_tpu.config import dynamic_workload

    R, T = 4, 50
    prob = _ref_dynamic(R, T, "beta", 0.3, maxiter_cem=1)
    init = jnp.asarray([0.0, -1.75, 5.0, 0.0, 0.0, 0.0])
    # cut-in-style moving obstacles in the single lane ahead
    tot = np.asarray(prob.tot_time)
    x_obs_t = jnp.asarray(np.stack([15.0 + 3.0 * tot, 30.0 + 2.0 * tot]),
                          jnp.float32)
    y_obs_t = jnp.asarray(np.stack([-1.75 + 0.0 * tot,
                                    -1.60 + 0.0 * tot]), jnp.float32)

    out = prob.compute_cem_mmd_opt(42, init, MEAN, COV, x_obs_t, y_obs_t,
                                   15.0)
    cx_r, cy_r = out[0], out[1]

    cfg = dynamic_workload(num_reduced=R, num_obs=2, noise="beta",
                           noise_level=0.3, num_prime=T, mode="mmd_opt")
    cfg = cfg.replace(solve_strategy="exact",
                      cem=dataclasses.replace(cfg.cem, maxiter_cem=1))
    solver = Solver(cfg)
    r = solver.solve(42, init, MEAN, COV, x_obs_t, y_obs_t, 15.0)

    a_r, s_r = _controls(solver.ws, solver.cfg, jnp.asarray(cx_r),
                         jnp.asarray(cy_r), T)
    a_m, s_m = _controls(solver.ws, solver.cfg, r.cx, r.cy, T)
    assert np.max(np.abs(a_r - a_m)) <= 1e-3
    assert np.max(np.abs(s_r - s_m)) <= 1e-3


@pytest.mark.skipif(not HAVE_REF, reason="reference not importable")
def test_gmm_noisy_init_state_parity():
    """3-mode GMM initial-state ensemble vs the reference helper
    (cem_helper.py:316-364, GMM params cem.py:145-153) — dead code in the
    reference's synthetic workloads, re-implemented for completeness with
    its quirks (shared key for draw+mode choice, zeroed v/psi
    perturbations, fixed-size where assembly) preserved."""
    from mpc_mmd_tpu.sampling import gmm_noisy_init_state

    prob, _, _ = _ref(10, 50)
    for idx_mpc in (0, 7, 123):
        ref = prob.cem_helper.compute_noisy_init_state(
            idx_mpc, 1.0, -0.5, 5.0, 0.3)
        got = gmm_noisy_init_state(idx_mpc, 1.0, -0.5, 5.0, 0.3,
                                   n=prob.num_reduced)
        for a, b in zip(ref, got):
            assert np.shape(a) == np.shape(b)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)
