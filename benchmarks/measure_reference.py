"""Measure the reference implementation's solves/s on CPU (the only hardware
it supports out of the box) for the BASELINE.json config:
num_prime=50, 6 obstacles, num_reduced=10 (mother set 100), mmd_opt."""
import os, sys, time, json
os.environ.setdefault('JAX_PLATFORMS', 'cpu')
sys.path.insert(0, '/root/reference/synthetic_static_obs')
sys.path.insert(0, '/root/reference/synthetic_static_obs/optimizer')
import numpy as np
import jax.numpy as jnp
import cem

num_reduced, num_obs, num_prime = 10, 6, 50
prob = cem.CEM(num_reduced, num_obs, 0.1, num_prime, "gaussian", 0.0, 0.0)
x_obs = np.linspace(35, 75, num_obs); y_obs = np.resize([-1.75, 1.75], num_obs)
z = np.zeros(num_obs)
xt, yt, _ = prob.cem_helper.compute_obs_trajectories(x_obs, y_obs, z, z, z)
init_state = jnp.hstack((0.0, 1.75, 5.0, 0.0, 0.0, 0.0))
mean_param = jnp.hstack([15.]*4 + [0.]*4)
cov_param = np.diag(np.hstack([[20.]*4, [100.]*4]))

t0 = time.time()
out = prob.compute_cem_mmd_opt(1, init_state, mean_param, cov_param, xt, yt, 15.)
out[0].block_until_ready()
compile_time = time.time() - t0
print("compile+first:", compile_time, flush=True)

times = []
for k in range(5):
    t0 = time.time()
    out = prob.compute_cem_mmd_opt(k + 2, init_state, mean_param, cov_param, xt, yt, 15.)
    out[0].block_until_ready()
    times.append(time.time() - t0)
    print("solve", k, times[-1], flush=True)

result = {
    "config": "mmd_opt, num_prime=50, 6 obs, num_reduced=10 (mother=100), gaussian 0.1",
    "hardware": "CPU (reference supports single-device JAX only)",
    "mean_solve_s": float(np.mean(times)),
    "solves_per_s": float(1.0 / np.mean(times)),
    "compile_s": compile_time,
}
with open("/root/repo/benchmarks/reference_cpu_baseline.json", "w") as f:
    json.dump(result, f, indent=2)
print(json.dumps(result))
