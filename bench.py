"""Headline benchmark: risk-aware MPC solves/s on the current device.

Config pinned to BASELINE.json: mmd_opt cost, num_prime=50, 6 obstacles,
num_batch=100 candidates, num_reduced=10 (mother set = 100 rollouts),
gaussian noise 0.1 — the reference's heaviest published workload shape.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "solves/s", "vs_baseline": N}
vs_baseline is the speedup over the reference implementation's measured
solves/s on CPU (benchmarks/reference_cpu_baseline.json; the reference
publishes no numbers and supports no accelerator — SURVEY.md §6).
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mpc_mmd_tpu import Solver, static_workload
    from mpc_mmd_tpu.dynamics import constant_velocity_obstacles

    num_obs = 6
    cfg = static_workload(num_reduced=10, num_obs=num_obs, num_prime=50,
                          mode="mmd_opt", noise="gaussian", noise_level=0.1)
    solver = Solver(cfg)

    # Scenario batch: distinct obstacle configs, like main_mpc.py's sweep.
    # Default scenario batch sized for a single small chip: the mmd_opt inner
    # CEM materializes O(S * candidates * samples * k * mother) gather temps.
    S = int(os.environ.get("BENCH_SCENARIOS", "4"))
    rng = np.random.default_rng(0)
    grid = np.array([35, 40, 45, 50, 55, 60, 65, 70, 75], dtype=np.float64)
    x0 = np.stack([rng.choice(grid, num_obs, replace=False) for _ in range(S)])
    y0 = rng.choice(np.array([-1.75, 1.75]), (S, num_obs))
    zeros = jnp.zeros((S, num_obs))
    xt, yt, _ = jax.vmap(
        lambda a, b, c, d, e: constant_velocity_obstacles(
            a, b, c, d, e, solver.ws.tot_time)
    )(jnp.asarray(x0), jnp.asarray(y0), zeros, zeros, zeros)

    init_state = jnp.asarray([0.0, 1.75, 5.0, 0.0, 0.0, 0.0])
    mean = jnp.asarray([15.0] * 4 + [0.0] * 4)
    cov = jnp.asarray(np.diag([20.0] * 4 + [100.0] * 4), jnp.float32)
    seeds = jnp.arange(S, dtype=jnp.int32)

    # Warmup / compile
    out = solver.solve_batch(seeds, init_state, mean, cov, xt, yt, 15.0)
    out.cx.block_until_ready()

    # Steady-state timing
    reps = int(os.environ.get("BENCH_REPS", "3"))
    t0 = time.perf_counter()
    for r in range(reps):
        out = solver.solve_batch(seeds + r * S, init_state, mean, cov,
                                 xt, yt, 15.0)
    out.cx.block_until_ready()
    elapsed = time.perf_counter() - t0
    solves_per_s = S * reps / elapsed

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "benchmarks", "reference_cpu_baseline.json")
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            ref = json.load(f)
        if ref.get("solves_per_s"):
            vs_baseline = solves_per_s / ref["solves_per_s"]

    print(json.dumps({
        "metric": "mmd_opt MPC solves/s (num_prime=50, 6 obs, 100 candidates,"
                  " reduced set 10/100)",
        "value": round(solves_per_s, 3),
        "unit": "solves/s",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
    }))


if __name__ == "__main__":
    main()
