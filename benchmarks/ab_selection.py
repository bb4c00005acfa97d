"""One-command selection-backend + scenario-chunk A/B on the attached chip.

The fused selection kernels and the lane-major ("xt") K_red chain lost to
the default XLA one-hot path specifically because the v5e-lite serializes
their grids on a single TensorCore (benchmarks/PROFILE_NOTES.md).  A future
multi-core allocation (v5p) changes that calculus; this script converts the
re-evaluation into a minutes-long decision instead of a re-derivation:

    timeout 3600 python benchmarks/ab_selection.py          # all variants
    AB_SELECTION=xla,fused AB_REPS=4 python benchmarks/ab_selection.py

Prints one JSON line per variant (solves/s + ms/solve) and a final verdict
line naming the fastest.  Uses the persistent compile cache, so re-runs on
the same chip skip compilation.  Timing fences use np.asarray value fetches
(NOT block_until_ready — see CLAUDE.md TIMING note on the axon relay).

Variants:
  selection backends (MPC_MMD_SELECTION): xla | fused | xt | g
  scenario chunk (MPC_MMD_SCENARIO_CHUNK): solve_batch with chunk 1 vs 2
    (the HBM-pressure knob; chunk>1 thrashed on v5e-lite, should win on
    big-HBM parts)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_solver(cfg):
    import jax
    import jax.numpy as jnp

    from mpc_mmd_tpu import Solver
    from mpc_mmd_tpu.dynamics import constant_velocity_obstacles

    solver = Solver(cfg)
    rng = np.random.default_rng(0)
    grid = np.array([35, 40, 45, 50, 55, 60, 65, 70, 75], dtype=np.float64)
    n_obs = cfg.obstacles.num_obs
    x0 = jnp.asarray(np.stack([rng.choice(grid, n_obs, replace=False)
                               for _ in range(4)]))
    y0 = jnp.asarray(rng.choice(np.array([-1.75, 1.75]), (4, n_obs)))
    z = jnp.zeros((4, n_obs))
    xt, yt, _ = jax.vmap(
        lambda a, b, c, d, e: constant_velocity_obstacles(
            a, b, c, d, e, solver.ws.tot_time))(x0, y0, z, z, z)
    init_state = jnp.asarray([0.0, 1.75, 5.0, 0.0, 0.0, 0.0])
    mean = jnp.asarray([15.0] * 4 + [0.0] * 4)
    cov = jnp.asarray(np.diag([20.0] * 4 + [100.0] * 4), jnp.float32)
    return solver, (init_state, mean, cov, xt, yt)


def time_variant(label, solver, args, reps):
    init_state, mean, cov, xt, yt = args
    t0 = time.perf_counter()
    out = solver.solve(0, init_state, mean, cov, xt[0], yt[0], 15.0)
    np.asarray(out.cx)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for r in range(reps):
        out = solver.solve(r + 1, init_state, mean, cov, xt[r % 4],
                           yt[r % 4], 15.0)
    np.asarray(out.cx)   # value-fetch fence
    dt = time.perf_counter() - t0
    rec = {"variant": label, "solves_per_s": round(reps / dt, 3),
           "ms_per_solve": round(1e3 * dt / reps, 1),
           "warmup_s": round(compile_s, 1)}
    print(json.dumps(rec))
    sys.stdout.flush()
    return rec


def main():
    from mpc_mmd_tpu.utils.compilation_cache import enable_persistent_cache
    enable_persistent_cache()

    from mpc_mmd_tpu import static_workload

    reps = int(os.environ.get("AB_REPS", "6"))
    backends = os.environ.get("AB_SELECTION", "xla,fused,xt,g").split(",")
    cfg = static_workload(num_reduced=10, num_obs=6, num_prime=50,
                          mode="mmd_opt", noise="gaussian", noise_level=0.1)
    if os.environ.get("AB_TINY", "0") == "1":   # CPU smoke-test shape
        import dataclasses
        cfg = static_workload(num_reduced=3, num_obs=2, num_prime=15,
                              mode="mmd_opt")
        cfg = cfg.replace(
            cem=dataclasses.replace(cfg.cem, maxiter_cem=2),
            beta_cem=dataclasses.replace(cfg.beta_cem, maxiter=2))
    import jax
    print(f"ab_selection: {jax.devices()[0].device_kind} x"
          f"{jax.device_count()}, reps={reps}", file=sys.stderr)

    results = []
    for sel in backends:
        os.environ["MPC_MMD_SELECTION"] = sel
        # MPC_MMD_FUSED_CEM is the legacy switch for the fused kernel;
        # MPC_MMD_SELECTION=fused routes there too (reduced_set.py:381)
        try:
            solver, args = build_solver(cfg)
            results.append(time_variant(f"selection={sel}", solver, args,
                                        reps))
        except Exception as e:   # kernel fault / OOM on this chip
            print(json.dumps({"variant": f"selection={sel}",
                              "error": f"{type(e).__name__}: {e}"[:200]}))
    os.environ.pop("MPC_MMD_SELECTION", None)

    # scenario-chunk A/B (solve_batch HBM-pressure knob)
    if os.environ.get("AB_CHUNK", "1") != "0":
        import jax.numpy as jnp
        from mpc_mmd_tpu import Solver
        for chunk in (1, 2):
            try:
                solver, args = build_solver(cfg)
                solver = Solver(cfg, solver.ws, scenario_chunk=chunk)
                init_state, mean, cov, xt, yt = args
                seeds = jnp.arange(4, dtype=jnp.int32)
                out = solver.solve_batch(seeds, init_state, mean, cov, xt,
                                         yt, 15.0)
                np.asarray(out.cx)
                t0 = time.perf_counter()
                for r in range(max(reps // 2, 1)):
                    out = solver.solve_batch(seeds + 4 * r, init_state,
                                             mean, cov, xt, yt, 15.0)
                np.asarray(out.cx)
                dt = time.perf_counter() - t0
                rec = {"variant": f"chunk={chunk}",
                       "solves_per_s": round(4 * max(reps // 2, 1) / dt, 3)}
                results.append(rec)
                print(json.dumps(rec))
            except Exception as e:
                print(json.dumps({"variant": f"chunk={chunk}",
                                  "error": f"{type(e).__name__}"[:200]}))

    timed = [r for r in results if "solves_per_s" in r]
    if timed:
        best = max(timed, key=lambda r: r["solves_per_s"])
        print(json.dumps({"fastest": best["variant"],
                          "solves_per_s": best["solves_per_s"]}))


if __name__ == "__main__":
    main()
