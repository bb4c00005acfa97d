"""Measure the reference implementation's solves/s on CPU at the CERTIFIED
COMBINED BUDGET (the budget bench.py's headline runs), so the headline
vs_baseline ratio is apples-to-apples (VERDICT r4 weak #1 / item 2).

Budget mapping onto the reference's plain attributes (all read at trace
time by its jitted methods, so setting them on the instantiated objects
before the first call is exactly equivalent to editing the constants —
the same technique tests/test_parity.py:53-54 uses for maxiter_cem):

  outer CEM   num_batch 100 -> 64, maxiter_cem 20 -> 10
              (synthetic_static_obs/optimizer/cem.py:88-89,137;
               ellite_num_projection tracks num_batch, cem.py:139;
               the copies held by Projection and Helper are updated too,
               projection.py:50, cem_helper.py:97)
  inner beta-CEM  num_samples_cem 100 -> 64, maxiter_beta_cem 20 -> 12
              (synthetic_static_obs/compute_beta.py:14-15), with
              num_ellite_beta re-derived by the reference's own formula
              max(int(0.1*S)+1, 3) (compute_beta.py:26) = 7, matching
              config.BetaCEMConfig.num_ellite at S=64.

Problem shape: BASELINE.json config — mmd_opt, num_prime=50, 6 obstacles,
num_reduced=10 (mother 100), gaussian 0.1.  Writes
benchmarks/reference_cpu_fastrt_budget.json.
"""
import os, sys, time, json
os.environ.setdefault('JAX_PLATFORMS', 'cpu')
sys.path.insert(0, '/root/reference/synthetic_static_obs')
sys.path.insert(0, '/root/reference/synthetic_static_obs/optimizer')
import numpy as np
import jax.numpy as jnp
import cem

B_OUT, IT_OUT = 64, 10          # config.FASTRT_OUTER_BUDGET
S_IN, IT_IN = 64, 12            # config.REALTIME_INNER_BUDGET

num_reduced, num_obs, num_prime = 10, 6, 50
prob = cem.CEM(num_reduced, num_obs, 0.1, num_prime, "gaussian", 0.0, 0.0)
# outer budget (every holder of the constant)
prob.num_batch = B_OUT
prob.ellite_num_projection = B_OUT
prob.maxiter_cem = IT_OUT
prob.projection.num_batch = B_OUT
prob.cem_helper.num_batch = B_OUT
# inner budget
prob.prob2.num_samples_cem = S_IN
prob.prob2.maxiter_beta_cem = IT_IN
prob.prob2.num_ellite_beta = np.maximum(int(0.1 * S_IN) + 1, 3)

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
assert np.all(np.isfinite(np.asarray(out[0]))), "reference solve returned non-finite cx"

times = []
for k in range(5):
    t0 = time.time()
    out = prob.compute_cem_mmd_opt(k + 2, init_state, mean_param, cov_param, xt, yt, 15.)
    out[0].block_until_ready()
    times.append(time.time() - t0)
    print("solve", k, times[-1], flush=True)

result = {
    "config": "mmd_opt, num_prime=50, 6 obs, num_reduced=10 (mother=100), gaussian 0.1",
    "budget": "outer B=%dx%d, inner S=%dx%d (the certified combined budget"
              " bench.py headlines; reference default is 100x20 / 100x20)"
              % (B_OUT, IT_OUT, S_IN, IT_IN),
    "hardware": "CPU (reference supports single-device JAX only)",
    "mean_solve_s": float(np.mean(times)),
    "solves_per_s": float(1.0 / np.mean(times)),
    "compile_s": compile_time,
}
with open("/root/repo/benchmarks/reference_cpu_fastrt_budget.json", "w") as f:
    json.dump(result, f, indent=2)
print(json.dumps(result))
