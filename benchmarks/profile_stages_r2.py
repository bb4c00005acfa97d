"""Cumulative stage-split of the PRODUCTION solve body (round-2 close).

Like profile_stages.py but with the production batched inner CEM
(select_reduced_set_batched) and the full tail (risk sort, lane risk,
scalar cost, CEM update), so the per-stage deltas track the real
`solver._solve` body.  Run on TPU:  timeout 900 python benchmarks/profile_stages_r2.py
"""
import sys; sys.path.insert(0, "/root/repo")
import time
from functools import partial

from mpc_mmd_tpu.utils.compilation_cache import enable_persistent_cache
enable_persistent_cache()

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from mpc_mmd_tpu import fastrt_workload, static_workload
from mpc_mmd_tpu import risk as risk_mod
from mpc_mmd_tpu.dynamics import (constant_velocity_obstacles,
                                  controls_from_trajectory)
from mpc_mmd_tpu.projection import project
from mpc_mmd_tpu.qp import (boundary_vectors, build_workspace, compute_guess,
                            refit_coefficients)
from mpc_mmd_tpu.reduced_set import select_reduced_set_batched
from mpc_mmd_tpu.sampling import cem_update, initial_params, scalar_cost
from mpc_mmd_tpu.solver import _gather, batched_rollouts, resolve_rollout_backend

# PROFILE_PRESET=fastrt profiles the promoted operating point (outer 64x10
# + inner 64x12 — VERDICT r4 item 3: the stage mix at the 27 ms solve);
# default profiles the reference-budget program rounds 2-4 profiled.
import os as _os
_preset = _os.environ.get("PROFILE_PRESET", "default")
_make = {"default": static_workload, "fastrt": fastrt_workload}[_preset]
print("preset:", _preset, flush=True)
cfg = _make(num_reduced=10, num_obs=6, num_prime=50, mode="mmd_opt")
ws = build_workspace(cfg)
backend = resolve_rollout_backend(cfg)
print("backend:", backend, flush=True)
nb, T, M = cfg.cem.num_batch, cfg.horizon.num_prime, cfg.risk.num_mother
n_cost, n_el = cfg.cem.ellite_num_cost, cfg.cem.ellite_num
w_lane, w_obs = cfg.risk.weights()
n = cfg.obstacles.num_obs
xt, yt, _ = constant_velocity_obstacles(
    jnp.asarray(np.linspace(35, 75, n)), jnp.asarray(np.resize([-1.75, 1.75], n)),
    jnp.zeros(n), jnp.zeros(n), jnp.zeros(n), ws.tot_time)
init_state = jnp.asarray([0., 1.75, 5., 0., 0., 0.])
mean0 = jnp.asarray([15.] * 4 + [0.] * 4)
cov0 = jnp.asarray(np.diag([20.] * 4 + [100.] * 4), jnp.float32)
params0 = initial_params(cfg, mean0, cov0)
b_eq_x, b_eq_y = boundary_vectors(cfg, init_state)
state0 = jnp.asarray([0., 1.75, 5., 0., jnp.arctan2(0., 5.)], jnp.float32)
x_obs_T = xt[:, :T]
y_obs_T = yt[:, :T]

STAGES = ["guess+project", "+sort/controls", "+mother rollouts", "+refit",
          "+inner CEM", "+mmd risk", "+risk sort/gather",
          "+lane/cost/cem-update"]


def loop(stage):
    def body(carry, idx):
        lamx, lamy, params, m, c, sl = carry
        key = jax.random.PRNGKey(5 * idx + 7)
        cxb, cyb = compute_guess(cfg, ws, params, b_eq_x, b_eq_y)
        pr = project(cfg, ws, cxb, cyb, b_eq_x, b_eq_y, lamx, lamy, sl, xt, yt)
        out = pr.res_norm.sum()
        if stage >= 1:
            order = jnp.argsort(pr.res_norm)
            bundle = (pr.x, pr.y, pr.xdot, pr.ydot, pr.xddot, pr.yddot,
                      pr.c_x, pr.c_y, pr.res_norm, params)
            (x, y, xd, yd, xdd, ydd, c_x, c_y, res_p, params_p) = \
                _gather(bundle, order)
            acc, steer = controls_from_trajectory(xd, yd, xdd, ydd,
                                                  cfg.horizon.dt, 2.5)
            key, _ = jax.random.split(key)
            out = out + acc.sum()
        if stage >= 2:
            xr, yr = batched_rollouts(cfg, backend, key, acc[:, :T],
                                      steer[:, :T], state0, mother=True)
            out = out + xr.sum()
        if stage >= 3:
            cxr, cyr = refit_coefficients(ws, xr.reshape(nb * M, T),
                                          yr.reshape(nb * M, T))
            cxr = cxr.reshape(nb, M, -1)
            cyr = cyr.reshape(nb, M, -1)
            out = out + cxr.sum()
        if stage >= 4:
            rs = select_reduced_set_batched(cfg, cxr, cyr, xr, yr)
            out = out + rs.beta.sum()
        if stage >= 5:
            risk = jax.vmap(lambda b, sg, xr2, yr2: risk_mod.mmd_obs(
                cfg, b, sg, xr2, yr2, x_obs_T, y_obs_T))(
                rs.beta, rs.sigma, rs.x_red, rs.y_red)
            out = out + risk.sum()
        if stage >= 6:
            order2 = jnp.argsort(risk)[:n_cost]
            bundle2 = (risk, x, y, xd, yd, xdd, ydd, c_x, c_y, res_p,
                       params_p, steer, rs.y_red, rs.beta, rs.sigma)
            (risk_e, x_e, y_e, xd_e, yd_e, xdd_e, ydd_e, c_x_e, c_y_e,
             res_e, params_e, steer_e, y_roll_e, beta_e, sigma_e) = \
                _gather(bundle2, order2)
            out = out + risk_e.sum()
        if stage >= 7:
            risk_lane = jax.vmap(lambda b, sg, yr2: risk_mod.mmd_lane(
                cfg, b, sg, yr2))(beta_e, sigma_e, y_roll_e)
            cost_b = scalar_cost(cfg, w_obs * risk_e, w_lane * risk_lane,
                                 y_e, res_e, xd_e, yd_e, xdd_e, ydd_e,
                                 steer_e, 15.0)
            order3 = jnp.argsort(cost_b)
            params_elite = params_e[order3[:n_el]]
            cost_elite = cost_b[order3[:n_el]]
            key, _ = jax.random.split(key)
            m, c, params = cem_update(cfg, key, params_elite, cost_elite, m, c)
            out = out + cost_elite.sum()
        return (pr.lamda_x, pr.lamda_y, params, m, c, pr.s_lane), out

    carry0 = (jnp.zeros((nb, cfg.horizon.nvar)),
              jnp.zeros((nb, cfg.horizon.nvar)), params0, mean0, cov0,
              jnp.zeros((nb, 2 * (cfg.horizon.num - 1))))
    _, outs = lax.scan(body, carry0, jnp.arange(cfg.cem.maxiter_cem))
    return outs.sum()


import os
_sel = os.environ.get("PROFILE_STAGES")
stages = ([int(s) for s in _sel.split(",")] if _sel else range(len(STAGES)))
prev = 0.0
for stage in stages:
    f = jax.jit(partial(loop, stage))
    o = f(); np.asarray(o)
    t0 = time.time()
    for _ in range(3):
        o = f()
    np.asarray(o)     # value-fetch fence: block_until_ready has returned
    #                 # early through the axon relay (CLAUDE.md timing note)
    ms = (time.time() - t0) / 3 * 1000
    print(f"stage {stage} ({STAGES[stage]:22s}): {ms:7.1f} ms/solve "
          f"(delta {ms - prev:+7.1f})", flush=True)
    prev = ms
