"""Headline benchmark: risk-aware MPC solves/s on the current device.

Config pinned to BASELINE.json: mmd_opt cost, num_prime=50, 6 obstacles,
num_batch=100 candidates, num_reduced=10 (mother set = 100 rollouts),
gaussian noise 0.1 — the reference's heaviest workload shape.

Prints ONE JSON line to stdout:
    {"metric": ..., "value": N, "unit": "solves/s", "vs_baseline": N}
vs_baseline is the speedup over the reference implementation's measured
solves/s on CPU (benchmarks/reference_cpu_baseline.json — the reference
publishes no numbers and supports no accelerator, SURVEY.md §6).

Structure is headline-first: ONE program variant (single-stream S=1) is
compiled (against the persistent XLA compilation cache, so only the very
first process on a machine pays the cold compile) and the headline JSON is
printed immediately after the first timed loop.  Optional extras — scenario
batching rates and the single-solve latency distribution — run AFTER the
headline and report to stderr, so a tunnel hiccup there can't cost the round
its number.  Set BENCH_SCENARIOS>1 to measure batched rates, BENCH_EXTRAS=0
to skip all extras.
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
    from mpc_mmd_tpu.utils.compilation_cache import enable_persistent_cache
    cache_dir = enable_persistent_cache()
    print(f"bench: jax compilation cache -> {cache_dir or 'disabled'}",
          file=sys.stderr)

    import jax.numpy as jnp

    from mpc_mmd_tpu import static_workload

    cfg = static_workload(num_reduced=10, num_obs=6, num_prime=50,
                          mode="mmd_opt", noise="gaussian", noise_level=0.1)
    solver, scenarios, (init_state, mean, cov) = _build(cfg)
    reps = int(os.environ.get("BENCH_REPS", "3"))

    # ---- headline: single-stream solves/s, ONE compiled program ----------
    # Timing fence: np.asarray VALUE FETCHES, not block_until_ready — the
    # axon relay has been observed returning from block_until_ready before
    # the compute landed (one glitched run read an absurd 2000+ solves/s).
    # A device->host copy of the result bytes cannot complete early, and
    # the chip executes its stream in order, so fetching the LAST output
    # fences the whole loop.
    xt1, yt1 = scenarios(1)
    t0 = time.perf_counter()
    out = solver.solve(0, init_state, mean, cov, xt1[0], yt1[0], 15.0)
    np.asarray(out.cx)
    print(f"bench: warmup (compile or cache hit) {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    t0 = time.perf_counter()
    for r in range(reps * 2):
        out = solver.solve(r + 1, init_state, mean, cov, xt1[0], yt1[0], 15.0)
    np.asarray(out.cx)
    solves_per_s = reps * 2 / (time.perf_counter() - t0)

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
    sys.stdout.flush()

    if os.environ.get("BENCH_EXTRAS", "1") == "0":
        return

    # ---- extras (stderr only; failures here never cost the headline) -----
    try:
        lat = []
        for k in range(10):
            t0 = time.perf_counter()
            r = solver.solve(100 + k, init_state, mean, cov, xt1[0], yt1[0],
                             15.0)
            np.asarray(r.cx)   # value-fetch fence (see headline loop)
            lat.append(time.perf_counter() - t0)
        print(json.dumps({
            "p50_solve_ms": round(1e3 * float(np.percentile(lat, 50)), 2),
            "p99_solve_ms": round(1e3 * float(np.percentile(lat, 99)), 2),
        }), file=sys.stderr)
    except Exception as e:
        print(f"bench: latency extras failed ({type(e).__name__})",
              file=sys.stderr)

    # Real-time operating point (config.realtime_workload: reduced
    # inner-CEM budget, certified quality-neutral — artifacts/realtime/):
    # record its latency distribution alongside the default preset's.
    try:
        from mpc_mmd_tpu import realtime_workload
        from mpc_mmd_tpu.config import REALTIME_INNER_BUDGET

        cfg_rt = realtime_workload(num_reduced=10, num_obs=6, num_prime=50,
                                   mode="mmd_opt", noise="gaussian",
                                   noise_level=0.1)
        solver_rt, _, _ = _build(cfg_rt)
        r = solver_rt.solve(0, init_state, mean, cov, xt1[0], yt1[0], 15.0)
        np.asarray(r.cx)
        lat = []
        for k in range(10):
            t0 = time.perf_counter()
            r = solver_rt.solve(200 + k, init_state, mean, cov, xt1[0],
                                yt1[0], 15.0)
            np.asarray(r.cx)   # value-fetch fence (see headline loop)
            lat.append(time.perf_counter() - t0)
        print(json.dumps({
            "realtime_budget": "S%dx%d" % REALTIME_INNER_BUDGET,
            "realtime_p50_ms": round(1e3 * float(np.percentile(lat, 50)), 2),
            "realtime_p99_ms": round(1e3 * float(np.percentile(lat, 99)), 2),
        }), file=sys.stderr)
    except Exception as e:
        print(f"bench: realtime extras failed ({type(e).__name__})",
              file=sys.stderr)

    # Scenario batching interacts with HBM pressure (the inner-CEM gather
    # temps): measure batched rates only when explicitly requested.
    S_max = int(os.environ.get("BENCH_SCENARIOS", "1"))
    best, best_S = solves_per_s, 1
    for S in sorted({s for s in (max(S_max // 2, 1), S_max) if s > 1}):
        try:
            xt, yt = scenarios(S)
            seeds = jnp.arange(S, dtype=jnp.int32)
            out = solver.solve_batch(seeds, init_state, mean, cov, xt, yt,
                                     15.0)
            np.asarray(out.cx)
            t0 = time.perf_counter()
            for r in range(reps):
                out = solver.solve_batch(seeds + r * S, init_state, mean,
                                         cov, xt, yt, 15.0)
            np.asarray(out.cx)   # value-fetch fence (see headline loop)
            rate = S * reps / (time.perf_counter() - t0)
            print(f"bench: batch {S}: {rate:.3f} solves/s", file=sys.stderr)
            if rate > best:
                best, best_S = rate, S
        except Exception as e:  # device OOM / kernel fault at this size
            print(f"bench: batch {S} failed ({type(e).__name__})",
                  file=sys.stderr)
    if best_S != 1:
        print(json.dumps({"best_batched_rate": round(best, 3),
                          "best_scenario_batch": best_S}), file=sys.stderr)


if __name__ == "__main__":
    main()
