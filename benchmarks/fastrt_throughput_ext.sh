#!/bin/bash
# Extension of fastrt_throughput_sweep.sh: the first grid found the
# multi-stream NEGATIVE reverses at the fastrt working set (chunk=4, S=8:
# 42.8 solves/s vs 36.2 single-stream).  Walk further up the chunk/S
# curve to find the knee (each step catches OOM and moves on; chunk=8 at
# fastrt is ~3.3x the default-budget chunk-1 working set, the largest
# previously-safe size).
set -x
cd "$(dirname "$0")/.."
for CONF in "4 16" "8 8" "8 16" "4 32" "8 32"; do
  set -- $CONF
  CHUNK=$1 S=$2
  timeout 3000 env MPC_MMD_SCENARIO_CHUNK=$CHUNK BENCH_S=$S python - <<'EOF'
import json, os, time, sys
sys.path.insert(0, os.getcwd())
import numpy as np
from mpc_mmd_tpu.utils.compilation_cache import enable_persistent_cache
enable_persistent_cache()
import jax.numpy as jnp
import bench
from mpc_mmd_tpu import fastrt_workload
cfg = fastrt_workload(num_reduced=10, num_obs=6, num_prime=50,
                      mode="mmd_opt", noise="gaussian", noise_level=0.1)
solver, scenarios, (init_state, mean, cov) = bench._build(cfg)
S = int(os.environ["BENCH_S"]); chunk = int(os.environ["MPC_MMD_SCENARIO_CHUNK"])
reps = 5
try:
    xt, yt = scenarios(S)
    seeds = jnp.arange(S, dtype=jnp.int32)
    out = solver.solve_batch(seeds, init_state, mean, cov, xt, yt, 15.0)
    np.asarray(out.cx)
    t0 = time.perf_counter()
    for r in range(reps):
        out = solver.solve_batch(seeds + r * S, init_state, mean, cov, xt,
                                 yt, 15.0)
    np.asarray(out.cx)
    rate = S * reps / (time.perf_counter() - t0)
    print(json.dumps({"chunk": chunk, "S": S,
                      "solves_per_s": round(rate, 3)}), flush=True)
except Exception as e:
    print(json.dumps({"chunk": chunk, "S": S,
                      "error": type(e).__name__}), flush=True)
EOF
done
