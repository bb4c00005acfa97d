#!/bin/bash
# Round-5 per-chip throughput sweep AT THE PROMOTED OPERATING POINT
# (VERDICT r4 item 3): the scenario-chunk default (1) and the
# single-stream headline were measured at the DEFAULT budget's ~2.4x
# larger working set; fastrt's smaller inner-CEM intermediates may fit
# more concurrent streams in HBM.  Runs bench.py (headline = fastrt) with
# BENCH_SCENARIOS=8 under chunk in {1, 2, 4}; the best batched rate per
# chunk prints on stderr ("bench: batch S: ...").  Results land in
# benchmarks/fastrt_throughput_sweep.log and PROFILE_NOTES.
set -x
cd "$(dirname "$0")/.."
for CHUNK in 1 2 4; do
  echo "=== MPC_MMD_SCENARIO_CHUNK=$CHUNK ==="
  timeout 3000 env BENCH_EXTRAS=0 BENCH_SCENARIOS=8 BENCH_REPS=5 \
    MPC_MMD_SCENARIO_CHUNK=$CHUNK python - <<'EOF'
import json, os, time, sys
sys.path.insert(0, os.getcwd())
import numpy as np
from mpc_mmd_tpu.utils.compilation_cache import enable_persistent_cache
enable_persistent_cache()
import jax.numpy as jnp
import bench
cfg = None
from mpc_mmd_tpu import fastrt_workload
cfg = fastrt_workload(num_reduced=10, num_obs=6, num_prime=50,
                      mode="mmd_opt", noise="gaussian", noise_level=0.1)
solver, scenarios, (init_state, mean, cov) = bench._build(cfg)
reps = int(os.environ.get("BENCH_REPS", "5"))
chunk = os.environ["MPC_MMD_SCENARIO_CHUNK"]
for S in (1, 2, 4, 8):
    try:
        xt, yt = scenarios(S)
        seeds = jnp.arange(S, dtype=jnp.int32)
        if S == 1:
            out = solver.solve(0, init_state, mean, cov, xt[0], yt[0], 15.0)
            np.asarray(out.cx)
            t0 = time.perf_counter()
            for r in range(reps * 2):
                out = solver.solve(r + 1, init_state, mean, cov, xt[0],
                                   yt[0], 15.0)
            np.asarray(out.cx)
            rate = reps * 2 / (time.perf_counter() - t0)
        else:
            out = solver.solve_batch(seeds, init_state, mean, cov, xt, yt,
                                     15.0)
            np.asarray(out.cx)
            t0 = time.perf_counter()
            for r in range(reps):
                out = solver.solve_batch(seeds + r * S, init_state, mean,
                                         cov, xt, yt, 15.0)
            np.asarray(out.cx)
            rate = S * reps / (time.perf_counter() - t0)
        print(json.dumps({"chunk": int(chunk), "S": S,
                          "solves_per_s": round(rate, 3)}), flush=True)
    except Exception as e:
        print(json.dumps({"chunk": int(chunk), "S": S,
                          "error": type(e).__name__}), flush=True)
EOF
done
