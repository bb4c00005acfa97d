"""Pallas kernels vs their XLA reference implementations (interpret mode)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_mmd_tpu import static_workload
from mpc_mmd_tpu.dynamics import rollout
from mpc_mmd_tpu.linalg import eq_qp_solve
from mpc_mmd_tpu.ops import fused_rollout
from mpc_mmd_tpu.ops.qp_pallas import eq_qp_solve_pallas
from mpc_mmd_tpu.ops.topk_kernel_pallas import topk_kernel_matrices
from mpc_mmd_tpu.reduced_set import (select_reduced_set,
                                     select_reduced_set_batched)


@pytest.mark.parametrize("L,T", [(256, 50), (1000, 30), (100, 20)])
def test_fused_rollout_matches_scan(rng, L, T):
    acc = jnp.asarray(rng.normal(1, 0.5, (L, T)), jnp.float32)
    steer = jnp.asarray(rng.normal(0, 0.1, (L, T)), jnp.float32)
    state0 = jnp.asarray([0.0, 1.75, 5.0, 0.0, 0.0], jnp.float32)
    x1, y1 = rollout(acc, steer, state0, 0.15, 2.5)
    x2, y2 = fused_rollout(acc, steer, state0, 0.15, 2.5, interpret=True)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


@pytest.mark.parametrize("batch,n", [((37,), 4), ((3, 50), 6), ((1,), 11)])
def test_eq_qp_solve_pallas_matches_linalg(rng, batch, n):
    A = jnp.asarray(rng.normal(0, 1, batch + (n, n)), jnp.float32)
    C = jnp.einsum("...ij,...kj->...ik", A, A) + 2.0 * jnp.eye(n)
    r = jnp.asarray(rng.normal(0, 1, batch + (n,)), jnp.float32)
    b1, mu1 = eq_qp_solve(C, r)
    b2, mu2 = eq_qp_solve_pallas(C, r, interpret=True)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2),
                               rtol=1e-4, atol=1e-5)
    # constraint satisfied exactly-ish
    np.testing.assert_allclose(np.asarray(jnp.sum(b2, axis=-1)), 1.0,
                               atol=1e-4)


@pytest.mark.parametrize("C,S,M,k", [(2, 100, 9, 3), (1, 130, 25, 5)])
def test_topk_kernel_matrices_matches_xla(rng, C, S, M, k):
    samples = jnp.asarray(rng.normal(0, 1, (C, S, M + 1)), jnp.float32)
    samples = samples.at[:, :, -1].set(jnp.abs(samples[:, :, -1]) + 0.2)
    D = jnp.abs(jnp.asarray(rng.normal(0, 1, (C, M, M)), jnp.float32))
    D = D + jnp.swapaxes(D, 1, 2)

    row_sum, K_red, idx = topk_kernel_matrices(samples, D, k, interpret=True)

    # XLA fast-path reference (reduced_set.select_reduced_set inner loop)
    from mpc_mmd_tpu.reduced_set import _topk_indices
    idx_ref = jax.vmap(lambda s: _topk_indices(jnp.abs(s[:, :M]), k))(samples)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
    onehot = (idx_ref[..., None] == jnp.arange(M)).astype(jnp.float32)
    rows = jnp.einsum("cskr,crm->cskm", onehot, D)
    sig = samples[:, :, -1]
    K_mixed = jnp.exp(-rows / sig[:, :, None, None])
    np.testing.assert_allclose(np.asarray(row_sum),
                               np.asarray(jnp.sum(K_mixed, axis=3)),
                               rtol=1e-5, atol=1e-5)
    K_red_ref = jnp.einsum("cskm,csjm->cskj", K_mixed, onehot)
    np.testing.assert_allclose(np.asarray(K_red), np.asarray(K_red_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape,k", [((100, 100, 100), 10), ((7, 33), 5),
                                     ((600, 100), 11)])
def test_topk_pallas_matches_top_k(rng, shape, k):
    from mpc_mmd_tpu.ops.topk_pallas import topk_indices_pallas
    x = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
    ref = jax.lax.top_k(x, k)[1]
    got = topk_indices_pallas(x, k, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    # ties: first occurrence must win, matching top_k / stable argsort
    xt = jnp.round(x * 2) / 2
    np.testing.assert_array_equal(
        np.asarray(jax.lax.top_k(xt, k)[1]),
        np.asarray(topk_indices_pallas(xt, k, interpret=True)))


def test_topk_nan_lanes_rank_last(rng):
    """NaN entries never win a selection round while finite lanes remain,
    and every emitted index stays in range (a NaN lane used to make the
    kernel's ``x >= max`` mask all-false and emit the sentinel M)."""
    from mpc_mmd_tpu.ops.topk_pallas import (topk_indices_pallas,
                                             topk_onehot_pallas)
    from mpc_mmd_tpu.reduced_set import _topk

    M, k = 33, 5
    x = np.asarray(rng.normal(0, 1, (9, M)), np.float32)
    x[0, :] = np.nan                      # all-NaN row: indices still valid
    x[1, ::2] = np.nan                    # half-poisoned row
    x[2, x[2] > 0] = np.nan               # data-dependent poisoning
    xj = jnp.asarray(x)

    finite_ref = jnp.where(jnp.isnan(xj), -jnp.inf, xj)
    ref = np.asarray(jax.lax.top_k(finite_ref, k)[1])

    got_pallas = topk_indices_pallas(xj, k, interpret=True)
    got_fallback = _topk(xj, k)           # CPU argmax-rounds path
    got_oh, _ = topk_onehot_pallas(xj, k, interpret=True)
    for got in (got_pallas, got_fallback, got_oh):
        got = np.asarray(got)
        assert got.max() < M and got.min() >= 0
        # rows with >= k finite lanes match top_k-on-(-inf-masked) exactly
        np.testing.assert_array_equal(ref[1:], got[1:])
        # fully-degenerate all-NaN row: value-masking rounds re-emit index 0
        # (top_k's sort would emit 0..k-1); both are "arbitrary but
        # in-range", and the consumer (inner CEM) never selects such a
        # sample (its QP cost is NaN -> +inf)
        np.testing.assert_array_equal(got[0], np.zeros(k, got.dtype))


@pytest.mark.parametrize("shape,k", [((40, 50, 64), 10), ((7, 33), 5)])
def test_topk_onehot_pallas_matches(rng, shape, k):
    from mpc_mmd_tpu.ops.topk_pallas import topk_onehot_pallas
    x = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
    idx, oh = topk_onehot_pallas(x, k, interpret=True)
    ref_idx = jax.lax.top_k(x, k)[1]
    np.testing.assert_array_equal(np.asarray(ref_idx), np.asarray(idx))
    ref_oh = (np.asarray(idx)[..., None]
              == np.arange(shape[-1])).astype(np.float32)
    np.testing.assert_array_equal(ref_oh, np.asarray(oh))
    # absolute + slice_to variant (the in-kernel |samples[..., :M]| path)
    M = shape[-1] - 1
    idx2, oh2 = topk_onehot_pallas(x, k, interpret=True, absolute=True,
                                   slice_to=M)
    ref2 = jax.lax.top_k(jnp.abs(x[..., :M]), k)[1]
    np.testing.assert_array_equal(np.asarray(ref2), np.asarray(idx2))
    assert oh2.shape == shape[:-1] + (k, M)


def test_use_fused_inner_cem_env_override(monkeypatch):
    from mpc_mmd_tpu.reduced_set import use_fused_inner_cem
    cfg = static_workload(num_reduced=3, num_obs=2, num_prime=15,
                          mode="mmd_opt")
    # off by default (the fused kernel measured slower on v5e-lite)
    monkeypatch.delenv("MPC_MMD_FUSED_CEM", raising=False)
    assert use_fused_inner_cem(cfg) is False
    monkeypatch.setenv("MPC_MMD_FUSED_CEM", "1")
    assert use_fused_inner_cem(cfg) is True
    # exact mode must never take the fused path (parity tests rely on it)
    exact = cfg.replace(solve_strategy="exact")
    assert use_fused_inner_cem(exact) is False
    monkeypatch.setenv("MPC_MMD_FUSED_CEM", "0")
    assert use_fused_inner_cem(cfg) is False


def test_batched_inner_cem_matches_vmap(rng):
    cfg = static_workload(num_reduced=3, num_obs=2, num_prime=15,
                          mode="mmd_opt")
    cfg = cfg.replace(
        beta_cem=dataclasses.replace(cfg.beta_cem, maxiter=4))
    M = cfg.risk.num_mother
    Cn, nvar, T = 3, 11, 20
    cx = jnp.asarray(rng.normal(0, 1, (Cn, M, nvar)), jnp.float32)
    cy = jnp.asarray(rng.normal(0, 1, (Cn, M, nvar)), jnp.float32)
    xr = jnp.asarray(rng.normal(0, 1, (Cn, M, T)), jnp.float32)
    yr = jnp.asarray(rng.normal(0, 1, (Cn, M, T)), jnp.float32)

    ref = jax.vmap(lambda a, b, c, d: select_reduced_set(cfg, a, b, c, d))(
        cx, cy, xr, yr)
    got = select_reduced_set_batched(cfg, cx, cy, xr, yr, interpret=True)

    np.testing.assert_allclose(np.asarray(ref.res), np.asarray(got.res),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ref.beta), np.asarray(got.beta),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ref.sigma), np.asarray(got.sigma),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ref.x_red), np.asarray(got.x_red))
    np.testing.assert_array_equal(np.asarray(ref.y_red), np.asarray(got.y_red))


def test_fused_rollout_per_lane_init_states(rng):
    L, T = 128, 25
    acc = jnp.asarray(rng.normal(1, 0.5, (L, T)), jnp.float32)
    steer = jnp.asarray(rng.normal(0, 0.1, (L, T)), jnp.float32)
    state0 = jnp.asarray(rng.normal(0, 1, (L, 5)), jnp.float32)
    x1, y1 = rollout(acc, steer, state0, 0.15, 2.5)
    x2, y2 = fused_rollout(acc, steer, state0, 0.15, 2.5, interpret=True)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_g_selection_matches_xla_selection(rng):
    """The reduce-before-gather selection ("g") equals the one-hot einsum
    form up to sum reassociation; index-derived outputs are identical."""
    cfg = static_workload(num_reduced=3, num_obs=2, num_prime=15,
                          mode="mmd_opt")
    cfg = cfg.replace(
        beta_cem=dataclasses.replace(cfg.beta_cem, maxiter=4))
    M = cfg.risk.num_mother
    Cn, nvar, T = 3, 11, 20
    cx = jnp.asarray(rng.normal(0, 1, (Cn, M, nvar)), jnp.float32)
    cy = jnp.asarray(rng.normal(0, 1, (Cn, M, nvar)), jnp.float32)
    xr = jnp.asarray(rng.normal(0, 1, (Cn, M, T)), jnp.float32)
    yr = jnp.asarray(rng.normal(0, 1, (Cn, M, T)), jnp.float32)

    ref = select_reduced_set_batched(cfg, cx, cy, xr, yr, selection="xla")
    got = select_reduced_set_batched(cfg, cx, cy, xr, yr, selection="g")

    np.testing.assert_allclose(np.asarray(ref.res), np.asarray(got.res),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ref.beta), np.asarray(got.beta),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ref.sigma), np.asarray(got.sigma),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ref.x_red), np.asarray(got.x_red))
    np.testing.assert_array_equal(np.asarray(ref.y_red), np.asarray(got.y_red))


@pytest.mark.parametrize("maxiter", [1, 2, 4])
def test_elite_carry_matches_full_recompute(rng, monkeypatch, maxiter):
    """Carrying the elite rows' selection/QP results across inner-CEM
    iterations matches recomputing them: new_samples rows 0..n_el-1 ARE
    the elites (identity top block of the affine update, lane floor a
    no-op on clipped rows) and the per-row selection+QP is a pure
    function of (row, D).  Index-derived outputs (selected rollouts) are
    bit-identical; float outputs agree to rounding (the peeled first
    iteration compiles as a separate program from the scan body, so XLA
    may reassociate its reductions differently)."""
    cfg = static_workload(num_reduced=3, num_obs=2, num_prime=15,
                          mode="mmd_opt")
    cfg = cfg.replace(
        beta_cem=dataclasses.replace(cfg.beta_cem, maxiter=maxiter))
    M = cfg.risk.num_mother
    Cn, nvar, T = 3, 11, 20
    cx = jnp.asarray(rng.normal(0, 1, (Cn, M, nvar)), jnp.float32)
    cy = jnp.asarray(rng.normal(0, 1, (Cn, M, nvar)), jnp.float32)
    xr = jnp.asarray(rng.normal(0, 1, (Cn, M, T)), jnp.float32)
    yr = jnp.asarray(rng.normal(0, 1, (Cn, M, T)), jnp.float32)

    monkeypatch.setenv("MPC_MMD_ELITE_CARRY", "0")
    ref = select_reduced_set_batched(cfg, cx, cy, xr, yr)
    monkeypatch.setenv("MPC_MMD_ELITE_CARRY", "1")
    got = select_reduced_set_batched(cfg, cx, cy, xr, yr)

    np.testing.assert_allclose(np.asarray(ref.res), np.asarray(got.res),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(ref.beta), np.asarray(got.beta),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ref.sigma), np.asarray(got.sigma),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(ref.x_red),
                                  np.asarray(got.x_red))
    np.testing.assert_array_equal(np.asarray(ref.y_red),
                                  np.asarray(got.y_red))


@pytest.mark.parametrize("maxiter,carry", [(1, "1"), (2, "1"), (4, "1"),
                                           (4, "0")])
def test_xt_selection_matches_xla_selection(rng, monkeypatch, maxiter, carry):
    """The lane-major chain ("xt") equals the standard one-hot form.

    "xt" emits K_red straight into the QP kernel's (k*k, C*S) lane-major
    layout and keeps beta (k, C, S) through the scan — same math, different
    layouts — so float outputs agree to rounding (sum reassociation across
    the transposed einsums) and index-derived outputs are bit-identical."""
    cfg = static_workload(num_reduced=3, num_obs=2, num_prime=15,
                          mode="mmd_opt")
    cfg = cfg.replace(
        beta_cem=dataclasses.replace(cfg.beta_cem, maxiter=maxiter))
    M = cfg.risk.num_mother
    Cn, nvar, T = 3, 11, 20
    cx = jnp.asarray(rng.normal(0, 1, (Cn, M, nvar)), jnp.float32)
    cy = jnp.asarray(rng.normal(0, 1, (Cn, M, nvar)), jnp.float32)
    xr = jnp.asarray(rng.normal(0, 1, (Cn, M, T)), jnp.float32)
    yr = jnp.asarray(rng.normal(0, 1, (Cn, M, T)), jnp.float32)

    monkeypatch.setenv("MPC_MMD_ELITE_CARRY", carry)
    ref = select_reduced_set_batched(cfg, cx, cy, xr, yr, selection="xla")
    got = select_reduced_set_batched(cfg, cx, cy, xr, yr, selection="xt")

    np.testing.assert_allclose(np.asarray(ref.res), np.asarray(got.res),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ref.beta), np.asarray(got.beta),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ref.sigma), np.asarray(got.sigma),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ref.x_red), np.asarray(got.x_red))
    np.testing.assert_array_equal(np.asarray(ref.y_red), np.asarray(got.y_red))


def test_xt_selection_interpret_qp_kernel(rng):
    """"xt" through the Pallas transposed-QP entry (interpret mode) matches
    the plain-CPU fallback path."""
    cfg = static_workload(num_reduced=3, num_obs=2, num_prime=15,
                          mode="mmd_opt")
    cfg = cfg.replace(
        beta_cem=dataclasses.replace(cfg.beta_cem, maxiter=2))
    M = cfg.risk.num_mother
    Cn, nvar, T = 2, 11, 20
    cx = jnp.asarray(rng.normal(0, 1, (Cn, M, nvar)), jnp.float32)
    cy = jnp.asarray(rng.normal(0, 1, (Cn, M, nvar)), jnp.float32)
    xr = jnp.asarray(rng.normal(0, 1, (Cn, M, T)), jnp.float32)
    yr = jnp.asarray(rng.normal(0, 1, (Cn, M, T)), jnp.float32)

    ref = select_reduced_set_batched(cfg, cx, cy, xr, yr, selection="xt")
    got = select_reduced_set_batched(cfg, cx, cy, xr, yr, selection="xt",
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(ref.res), np.asarray(got.res),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ref.beta), np.asarray(got.beta),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(ref.x_red), np.asarray(got.x_red))


@pytest.mark.parametrize("kind", ["gaussian", "matern52"])
def test_batched_inner_cem_kernel_variants(rng, kind):
    """The selectable kernels (RiskConfig.kernel) run the same math in the
    per-candidate path and the batched production path."""
    cfg = static_workload(num_reduced=3, num_obs=2, num_prime=15,
                          mode="mmd_opt")
    cfg = cfg.replace(
        beta_cem=dataclasses.replace(cfg.beta_cem, maxiter=3),
        risk=dataclasses.replace(cfg.risk, kernel=kind))
    M = cfg.risk.num_mother
    Cn, nvar, T = 2, 11, 20
    cx = jnp.asarray(rng.normal(0, 1, (Cn, M, nvar)), jnp.float32)
    cy = jnp.asarray(rng.normal(0, 1, (Cn, M, nvar)), jnp.float32)
    xr = jnp.asarray(rng.normal(0, 1, (Cn, M, T)), jnp.float32)
    yr = jnp.asarray(rng.normal(0, 1, (Cn, M, T)), jnp.float32)

    ref = jax.vmap(lambda a, b, c, d: select_reduced_set(cfg, a, b, c, d))(
        cx, cy, xr, yr)
    got = select_reduced_set_batched(cfg, cx, cy, xr, yr, interpret=True)

    np.testing.assert_allclose(np.asarray(ref.res), np.asarray(got.res),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ref.beta), np.asarray(got.beta),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ref.sigma), np.asarray(got.sigma),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ref.x_red), np.asarray(got.x_red))
    # exact mode (argsort + take_along_axis chain) agrees too
    cfg_e = cfg.replace(solve_strategy="exact")
    ex = select_reduced_set(cfg_e, cx[0], cy[0], xr[0], yr[0])
    assert np.all(np.isfinite(np.asarray(ex.res)))


@pytest.mark.parametrize("kind", ["gaussian", "matern52"])
def test_solver_kernel_variants_end_to_end(rng, kind):
    """A full mmd_opt solve with a non-laplace kernel compiles and returns
    finite outputs (the config-reachability VERDICT r4 asked for)."""
    from mpc_mmd_tpu import Solver
    from mpc_mmd_tpu.dynamics import constant_velocity_obstacles

    cfg = static_workload(num_reduced=3, num_obs=2, num_prime=15,
                          mode="mmd_opt")
    cfg = cfg.replace(
        cem=dataclasses.replace(cfg.cem, num_batch=16, maxiter_cem=2),
        risk=dataclasses.replace(cfg.risk, kernel=kind))
    s = Solver(cfg)
    xt, yt, _ = constant_velocity_obstacles(
        jnp.asarray([35.0, 50.0]), jnp.asarray([-1.75, 1.75]),
        jnp.zeros(2), jnp.zeros(2), jnp.zeros(2), s.ws.tot_time)
    r = s.solve(7, jnp.asarray([0.0, 1.75, 5.0, 0.0, 0.0, 0.0]),
                jnp.asarray([15.0] * 4 + [0.0] * 4),
                jnp.asarray(np.diag([20.0] * 4 + [100.0] * 4), jnp.float32),
                xt, yt, 15.0)
    assert np.all(np.isfinite(np.asarray(r.cx)))
    assert np.isfinite(float(r.risk_obs))
