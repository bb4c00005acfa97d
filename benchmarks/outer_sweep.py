"""Outer-CEM budget sweep (VERDICT r3 item 2).

The outer CEM's num_batch=100 candidates x maxiter_cem=20 iterations
(synthetic_static_obs/optimizer/cem.py:88-89,137-140) is the same kind of
tuning-constant-not-spec that round 3 certified down on the INNER loop.
Solve cost is ~linear in num_batch x maxiter_cem (the inner beta-CEM, 87%
of latency, runs per candidate per outer iteration), so halving both is a
~4x throughput lever — IF quality holds, which artifacts/fast/ certifies
with the same paired acceptance protocol as the realtime preset.

    timeout 5400 python benchmarks/outer_sweep.py
    OUTER_BUDGETS="100x20,64x12" OUTER_INNER="100x20,64x12" \
        python benchmarks/outer_sweep.py

Budget syntax: num_batch x maxiter_cem (outer), S x maxiter (inner).
One JSON line per (outer, inner) pair; value-fetch fences (CLAUDE.md
TIMING note); pipelined solves/s is the headline-comparable number.
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

    outer = os.environ.get(
        "OUTER_BUDGETS", "100x20,100x14,100x12,64x20,64x14,64x12,64x10"
    ).split(",")
    inner = os.environ.get("OUTER_INNER", "100x20").split(",")
    reps = int(os.environ.get("OUTER_REPS", "12"))

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

    print(f"outer_sweep: {jax.devices()[0].device_kind}, reps={reps}",
          file=sys.stderr)

    for ib in inner:
        S_i, it_i = (int(v) for v in ib.split("x"))
        for ob in outer:
            B, it_o = (int(v) for v in ob.split("x"))
            cfg = base.replace(
                cem=dataclasses.replace(base.cem, num_batch=B,
                                        maxiter_cem=it_o),
                beta_cem=dataclasses.replace(base.beta_cem,
                                             num_samples_cem=S_i,
                                             maxiter=it_i))
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
            # pipelined throughput: async dispatch, one final fence
            t0 = time.perf_counter()
            for k in range(reps):
                r = solver.solve(100 + k, init_state, mean, cov, xt, yt, 15.0)
            np.asarray(r.cx)
            dt = time.perf_counter() - t0
            print(json.dumps({
                "outer": f"B={B} x maxiter_cem={it_o}",
                "inner": f"S={S_i} x {it_i}",
                "solves_per_s": round(reps / dt, 3),
                "p50_ms": round(1e3 * float(np.percentile(lat, 50)), 1),
                "p99_ms": round(1e3 * float(np.percentile(lat, 99)), 1),
                "pipelined_device_ms": round(1e3 * dt / reps, 1),
                "risk_obs": round(float(np.asarray(r.risk_obs)), 1),
                "warmup_s": round(warm, 1),
            }))
            sys.stdout.flush()


if __name__ == "__main__":
    main()
