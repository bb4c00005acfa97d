import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp, time
from mpc_mmd_tpu import Solver, static_workload
from mpc_mmd_tpu.dynamics import constant_velocity_obstacles
cfg = static_workload(num_reduced=10, num_obs=6, num_prime=50, mode='mmd_opt')
solver = Solver(cfg)
n=6
xt, yt, _ = constant_velocity_obstacles(jnp.asarray(np.linspace(35,75,n)), jnp.asarray(np.resize([-1.75,1.75],n)), jnp.zeros(n), jnp.zeros(n), jnp.zeros(n), solver.ws.tot_time)
init_state = jnp.asarray([0.,1.75,5.,0.,0.,0.])
mean = jnp.asarray([15.]*4+[0.]*4)
cov = jnp.asarray(np.diag([20.]*4+[100.]*4), jnp.float32)
t0=time.time(); r = solver.solve(42, init_state, mean, cov, xt, yt, 15.); r.cx.block_until_ready()
print('first', round(time.time()-t0,1), flush=True)
t0=time.time()
for k in range(5): r = solver.solve(43+k, init_state, mean, cov, xt, yt, 15.)
r.cx.block_until_ready()
print('mmd_opt per solve:', round((time.time()-t0)/5,4), 's', flush=True)
print('risk', float(r.risk_obs), 'sigma', float(r.sigma), flush=True)
# batch of 4 scenarios
S=4
xts = jnp.stack([xt]*S); yts = jnp.stack([yt]*S)
seeds = jnp.arange(S, dtype=jnp.int32)
t0=time.time(); rb = solver.solve_batch(seeds, init_state, mean, cov, xts, yts, 15.); rb.cx.block_until_ready()
print('batch4 first', round(time.time()-t0,1), flush=True)
t0=time.time()
for k in range(3): rb = solver.solve_batch(seeds+k*S, init_state, mean, cov, xts, yts, 15.)
rb.cx.block_until_ready()
dt = (time.time()-t0)/3
print('batch4 per batch:', round(dt,4), 's =>', round(S/dt,2), 'solves/s', flush=True)
