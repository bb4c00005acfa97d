"""Inner-CEM budget sweep for the real-time operating point (VERDICT r2 #1).

The reference's inner beta-CEM budget — S=100 samples x 20 iterations
(compute_beta.py:14-15) — is a tuning choice, not spec, and the inner CEM
is 87% of solve latency (PROFILE_NOTES stage split: 158 ms of 182 ms on
v5e-lite).  This sweep measures blocking p50/p99 per-solve latency for a
grid of (num_samples_cem, maxiter) budgets at the production workload
shape; the acceptance pipeline then certifies the chosen point
quality-neutral (artifacts/realtime/).

    timeout 5400 python benchmarks/realtime_sweep.py
    RT_BUDGETS="100x20,64x12,48x8" RT_REPS=12 python benchmarks/realtime_sweep.py

One JSON line per budget; value-fetch fences (CLAUDE.md TIMING note).
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from mpc_mmd_tpu.utils.compilation_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from mpc_mmd_tpu import Solver, static_workload
    from mpc_mmd_tpu.dynamics import constant_velocity_obstacles

    budgets = os.environ.get(
        "RT_BUDGETS", "100x20,64x12,64x8,48x12,48x8,32x8").split(",")
    reps = int(os.environ.get("RT_REPS", "12"))

    base = static_workload(num_reduced=10, num_obs=6, num_prime=50,
                           mode="mmd_opt", noise="gaussian", noise_level=0.1)
    rng = np.random.default_rng(0)
    grid = np.array([35, 40, 45, 50, 55, 60, 65, 70, 75], dtype=np.float64)
    x0 = jnp.asarray(rng.choice(grid, 6, replace=False))
    y0 = jnp.asarray(rng.choice(np.array([-1.75, 1.75]), 6))
    z = jnp.zeros(6)
    init_state = jnp.asarray([0.0, 1.75, 5.0, 0.0, 0.0, 0.0])
    mean = jnp.asarray([15.0] * 4 + [0.0] * 4)
    cov = jnp.asarray(np.diag([20.0] * 4 + [100.0] * 4), jnp.float32)

    print(f"realtime_sweep: {jax.devices()[0].device_kind}, reps={reps}",
          file=sys.stderr)

    for b in budgets:
        S, it = (int(v) for v in b.split("x"))
        cfg = base.replace(beta_cem=dataclasses.replace(
            base.beta_cem, num_samples_cem=S, maxiter=it))
        solver = Solver(cfg)
        xt, yt, _ = constant_velocity_obstacles(x0, y0, z, z, z,
                                                solver.ws.tot_time)
        t0 = time.perf_counter()
        out = solver.solve(0, init_state, mean, cov, xt, yt, 15.0)
        np.asarray(out.cx)
        warm = time.perf_counter() - t0
        lat = []
        for k in range(reps):
            t0 = time.perf_counter()
            r = solver.solve(k + 1, init_state, mean, cov, xt, yt, 15.0)
            np.asarray(r.cx)       # value-fetch fence
            lat.append(time.perf_counter() - t0)
        # pipelined throughput (async dispatch, one final fence): device
        # time per solve without the per-call relay RTT
        t0 = time.perf_counter()
        for k in range(reps):
            r = solver.solve(100 + k, init_state, mean, cov, xt, yt, 15.0)
        np.asarray(r.cx)
        dev_ms = 1e3 * (time.perf_counter() - t0) / reps
        print(json.dumps({
            "budget": f"S={S} x maxiter={it}",
            "p50_ms": round(1e3 * float(np.percentile(lat, 50)), 1),
            "p99_ms": round(1e3 * float(np.percentile(lat, 99)), 1),
            "pipelined_device_ms": round(dev_ms, 1),
            "risk_obs": round(float(np.asarray(r.risk_obs)), 1),
            "warmup_s": round(warm, 1),
        }))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
