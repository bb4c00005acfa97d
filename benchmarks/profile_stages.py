import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp, time
from functools import partial
from jax import lax
from mpc_mmd_tpu import static_workload
from mpc_mmd_tpu.qp import build_workspace, boundary_vectors, compute_guess, refit_coefficients
from mpc_mmd_tpu.projection import project
from mpc_mmd_tpu.sampling import initial_params, cem_update, scalar_cost
from mpc_mmd_tpu.dynamics import controls_from_trajectory, constant_velocity_obstacles
from mpc_mmd_tpu.solver import batched_rollouts, resolve_rollout_backend
from mpc_mmd_tpu.reduced_set import select_reduced_set
from mpc_mmd_tpu import risk as risk_mod

cfg = static_workload(num_reduced=10, num_obs=6, num_prime=50, mode='mmd_opt')
ws = build_workspace(cfg)
backend = resolve_rollout_backend(cfg)
print('backend:', backend, flush=True)
nb, T, R, M = 100, 50, 10, 100
n = 6
xt, yt, _ = constant_velocity_obstacles(jnp.asarray(np.linspace(35,75,n)), jnp.asarray(np.resize([-1.75,1.75],n)), jnp.zeros(n), jnp.zeros(n), jnp.zeros(n), ws.tot_time)
init_state = jnp.asarray([0.,1.75,5.,0.,0.,0.])
mean = jnp.asarray([15.]*4+[0.]*4)
cov = jnp.asarray(np.diag([20.]*4+[100.]*4), jnp.float32)
params0 = initial_params(cfg, mean, cov)
b_eq_x, b_eq_y = boundary_vectors(cfg, init_state)
state0 = jnp.asarray([0.,1.75,5.,0.,0.], jnp.float32)
x_obs_T = xt[:, :T]; y_obs_T = yt[:, :T]

def loop(stage):
    def body(carry, idx):
        lamx, lamy, params, m, c, sl = carry
        key = jax.random.PRNGKey(5*idx+7)
        cxb, cyb = compute_guess(cfg, ws, params, b_eq_x, b_eq_y)
        pr = project(cfg, ws, cxb, cyb, b_eq_x, b_eq_y, lamx, lamy, sl, xt, yt)
        out_scalar = pr.res_norm.sum()
        if stage >= 1:
            order = jnp.argsort(pr.res_norm)
            x, y, xd, yd, xdd, ydd = [a[order] for a in (pr.x, pr.y, pr.xdot, pr.ydot, pr.xddot, pr.yddot)]
            acc, steer = controls_from_trajectory(xd, yd, xdd, ydd, cfg.horizon.dt, 2.5)
            key, _ = jax.random.split(key)
            out_scalar = out_scalar + acc.sum()
        if stage >= 2:
            xr, yr = batched_rollouts(cfg, backend, key, acc[:, :T], steer[:, :T], state0, mother=True)
            out_scalar = out_scalar + xr.sum()
        if stage >= 3:
            cxr, cyr = refit_coefficients(ws, xr.reshape(nb*M, T), yr.reshape(nb*M, T))
            cxr = cxr.reshape(nb, M, -1); cyr = cyr.reshape(nb, M, -1)
            out_scalar = out_scalar + cxr.sum()
        if stage >= 4:
            rs = jax.vmap(lambda a,b,c2,d: select_reduced_set(cfg, a,b,c2,d))(cxr, cyr, xr, yr)
            out_scalar = out_scalar + rs.beta.sum()
        if stage >= 5:
            risk = jax.vmap(lambda b, sg, xr2, yr2: risk_mod.mmd_obs(cfg, b, sg, xr2, yr2, x_obs_T, y_obs_T))(rs.beta, rs.sigma, rs.x_red, rs.y_red)
            out_scalar = out_scalar + risk.sum()
        return (pr.lamda_x, pr.lamda_y, params, m, c, pr.s_lane), out_scalar
    carry0 = (jnp.zeros((nb,11)), jnp.zeros((nb,11)), params0, mean, cov, jnp.zeros((nb, 198)))
    _, outs = lax.scan(body, carry0, jnp.arange(20))
    return outs.sum()

for stage in range(6):
    f = jax.jit(partial(loop, stage))
    o = f(); o.block_until_ready()
    t0 = time.time()
    for _ in range(3): o = f()
    o.block_until_ready()
    print(f'stage {stage}: {(time.time()-t0)/3*1000:.1f} ms per solve(20 iters)', flush=True)
