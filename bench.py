"""Headline benchmark: risk-aware MPC solves/s on the current device.

Config pinned to BASELINE.json: mmd_opt cost, num_prime=50, 6 obstacles,
num_batch=100 candidates, num_reduced=10 (mother set = 100 rollouts),
gaussian noise 0.1 — the reference's heaviest workload shape.

Prints ONE JSON line to stdout:
    {"metric": ..., "value": N, "unit": "solves/s", "vs_baseline": N}
vs_baseline is the speedup over the reference implementation's measured
solves/s on CPU (benchmarks/reference_cpu_baseline.json — the reference
publishes no numbers and supports no accelerator, SURVEY.md §6).

Secondary metrics (p99 single-solve latency, scenario batch used) go to
stderr.  The scenario batch adapts downward on device OOM (the mmd_opt
inner-CEM gathers are HBM-hungry on small chips).
"""

import json
import os
import sys
import time

import numpy as np


def _build(cfg):
    import jax
    import jax.numpy as jnp

    from mpc_mmd_tpu import Solver
    from mpc_mmd_tpu.dynamics import constant_velocity_obstacles

    solver = Solver(cfg)
    num_obs = cfg.obstacles.num_obs
    rng = np.random.default_rng(0)
    grid = np.array([35, 40, 45, 50, 55, 60, 65, 70, 75], dtype=np.float64)

    def scenarios(S):
        x0 = np.stack([rng.choice(grid, num_obs, replace=False)
                       for _ in range(S)])
        y0 = rng.choice(np.array([-1.75, 1.75]), (S, num_obs))
        zeros = jnp.zeros((S, num_obs))
        xt, yt, _ = jax.vmap(
            lambda a, b, c, d, e: constant_velocity_obstacles(
                a, b, c, d, e, solver.ws.tot_time)
        )(jnp.asarray(x0), jnp.asarray(y0), zeros, zeros, zeros)
        return xt, yt

    init_state = jnp.asarray([0.0, 1.75, 5.0, 0.0, 0.0, 0.0])
    mean = jnp.asarray([15.0] * 4 + [0.0] * 4)
    cov = jnp.asarray(np.diag([20.0] * 4 + [100.0] * 4), jnp.float32)
    return solver, scenarios, (init_state, mean, cov)


def main():
    import jax.numpy as jnp

    from mpc_mmd_tpu import static_workload

    cfg = static_workload(num_reduced=10, num_obs=6, num_prime=50,
                          mode="mmd_opt", noise="gaussian", noise_level=0.1)
    solver, scenarios, (init_state, mean, cov) = _build(cfg)
    reps = int(os.environ.get("BENCH_REPS", "3"))

    # Scenario batching interacts with HBM pressure (the inner-CEM gather
    # temps): on small chips single-stream beats batching, on big chips the
    # reverse.  Measure the candidate batch sizes and report the best.
    S_max = int(os.environ.get("BENCH_SCENARIOS", "4"))
    candidates = sorted({1, max(S_max // 2, 1), S_max})
    best = None
    for S in candidates:
        try:
            xt, yt = scenarios(S)
            seeds = jnp.arange(S, dtype=jnp.int32)
            if S == 1:
                out = solver.solve(0, init_state, mean, cov, xt[0], yt[0], 15.0)
                out.cx.block_until_ready()
                t0 = time.perf_counter()
                for r in range(reps * 2):
                    out = solver.solve(r + 1, init_state, mean, cov, xt[0],
                                       yt[0], 15.0)
                out.cx.block_until_ready()
                rate = reps * 2 / (time.perf_counter() - t0)
            else:
                out = solver.solve_batch(seeds, init_state, mean, cov, xt, yt,
                                         15.0)
                out.cx.block_until_ready()
                t0 = time.perf_counter()
                for r in range(reps):
                    out = solver.solve_batch(seeds + r * S, init_state, mean,
                                             cov, xt, yt, 15.0)
                out.cx.block_until_ready()
                rate = S * reps / (time.perf_counter() - t0)
            print(f"bench: batch {S}: {rate:.3f} solves/s", file=sys.stderr)
            if best is None or rate > best:
                best = rate
        except Exception as e:  # device OOM / kernel fault at this size
            print(f"bench: batch {S} failed ({type(e).__name__})",
                  file=sys.stderr)
    if best is None:
        raise SystemExit("bench failed at every batch size")
    solves_per_s = best

    # secondary: single-solve latency distribution
    try:
        xt1, yt1 = scenarios(1)
        lat = []
        for k in range(10):
            t0 = time.perf_counter()
            r = solver.solve(100 + k, init_state, mean, cov, xt1[0], yt1[0],
                             15.0)
            r.cx.block_until_ready()
            lat.append(time.perf_counter() - t0)
        print(json.dumps({"p50_solve_ms": round(1e3 * float(np.percentile(lat, 50)), 2),
                          "p99_solve_ms": round(1e3 * float(np.percentile(lat, 99)), 2),
                          "scenario_batch": S}), file=sys.stderr)
    except Exception:
        pass

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
