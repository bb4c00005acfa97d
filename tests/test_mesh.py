"""Multi-device sharding: sweep over an 8-device virtual CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mpc_mmd_tpu.config import static_workload
from mpc_mmd_tpu.parallel.mesh import (SCENARIO_AXIS, dryrun, make_mesh,
                                       sharded_sweep, sweep_statistics)
from mpc_mmd_tpu.qp import build_workspace
from mpc_mmd_tpu.scenarios import ego_initial_state, static_grid


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    return make_mesh(8)


def tiny_cfg():
    cfg = static_workload(num_reduced=3, num_obs=2, num_prime=15, mode="cvar")
    return cfg.replace(cem=dataclasses.replace(cfg.cem, maxiter_cem=2))


def test_sharded_sweep_runs_and_is_sharded(mesh):
    cfg = tiny_cfg()
    ws = build_workspace(cfg)
    sweep = sharded_sweep(cfg, ws, mesh)
    S = 16
    batch = static_grid(cfg, S)
    init_state, mean, cov, v_des = ego_initial_state("static")
    spec = NamedSharding(mesh, P(SCENARIO_AXIS))
    seeds = jax.device_put(jnp.arange(S, dtype=jnp.int32), spec)
    xt = jax.device_put(batch.x_traj, spec)
    yt = jax.device_put(batch.y_traj, spec)
    out = sweep(seeds, init_state, mean, cov, xt, yt, v_des)
    assert out.cx.shape == (S, 11)
    assert np.all(np.isfinite(np.asarray(out.cx)))
    # output actually sharded over the mesh
    assert len(out.cx.sharding.device_set) == 8


def test_sharded_matches_unsharded_quality(mesh):
    """Sharded solves equal single-device solves on tie-free scenarios:
    distinct non-zero obstacle costs per candidate pin the argsort order, so
    the shard_map program must match single-device solves elementwise
    (rtol 1e-3 on the full res trace and coefficients)."""
    from conftest import blocking_scenarios
    from mpc_mmd_tpu.solver import Solver
    cfg = tiny_cfg()
    ws = build_workspace(cfg)
    sweep = sharded_sweep(cfg, ws, mesh)
    S = 8
    init_state, mean, cov, v_des = ego_initial_state("static")
    xts, yts = blocking_scenarios(ws.tot_time, S)
    spec = NamedSharding(mesh, P(SCENARIO_AXIS))
    seeds = jax.device_put(jnp.arange(S, dtype=jnp.int32), spec)
    xt = jax.device_put(xts, spec)
    yt = jax.device_put(yts, spec)
    out = sweep(seeds, init_state, mean, cov, xt, yt, v_des)

    solver = Solver(cfg, ws)
    for i in [0, 3, 7]:
        r = solver.solve(i, init_state, mean, cov, xts[i], yts[i], v_des)
        assert float(r.risk_obs) > 0.0, "scenario not tie-free"
        np.testing.assert_allclose(np.asarray(out.res[i]),
                                   np.asarray(r.res), rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(out.cx[i]),
                                   np.asarray(r.cx), rtol=1e-3, atol=1e-3)


def test_sweep_statistics_psum(mesh):
    cfg = tiny_cfg()
    stats = sweep_statistics(cfg, mesh)
    spec = NamedSharding(mesh, P(SCENARIO_AXIS))
    risk = jax.device_put(jnp.asarray(np.arange(16, dtype=np.float32)), spec)
    n_acc, mean_r, max_r = stats(risk, jnp.float32(7.5))
    assert int(n_acc) == 8          # values 0..7 below threshold
    assert float(mean_r) == pytest.approx(7.5)
    assert float(max_r) == 15.0


def test_candidate_sharded_solve_matches_plain():
    """Latency mode: one solve's candidate axis sharded across 4 devices
    produces the same result as the unsharded solve."""
    from jax.sharding import Mesh
    from mpc_mmd_tpu.solver import Solver
    cfg = static_workload(num_reduced=3, num_obs=2, num_prime=15,
                          mode="mmd_opt")
    cfg = cfg.replace(cem=dataclasses.replace(cfg.cem, maxiter_cem=2),
                      beta_cem=dataclasses.replace(cfg.beta_cem, maxiter=2))
    cmesh = Mesh(np.array(jax.devices()[:4]), ("candidates",))
    ws = build_workspace(cfg)
    s_sh = Solver(cfg, ws, candidate_mesh=cmesh)
    s_pl = Solver(cfg, ws)
    batch = static_grid(cfg, 1)
    init_state, mean, cov, v_des = ego_initial_state("static")
    r1 = s_sh.solve(7, init_state, mean, cov, batch.x_traj[0],
                    batch.y_traj[0], v_des)
    r2 = s_pl.solve(7, init_state, mean, cov, batch.x_traj[0],
                    batch.y_traj[0], v_des)
    np.testing.assert_allclose(np.asarray(r1.res), np.asarray(r2.res),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(r1.cx), np.asarray(r2.cx),
                               atol=1e-4)


def test_dryrun_entrypoint():
    dryrun(8)
