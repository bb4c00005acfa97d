"""Speed-of-light / MFU statement for the headline solve (VERDICT r3 #7).

Pulls the compiled-executable cost analysis (XLA's own FLOP / byte counts)
for the production mmd_opt solve, divides by the measured pipelined device
time, and prints achieved FLOP/s + HBM bandwidth against chip peaks — the
auditable numbers behind BASELINE.md's "which bound sets the single-chip
ceiling" section.

    timeout 1800 python benchmarks/mfu_statement.py

Peaks default to TPU v5e (the v5e-lite bench chip): 197 TFLOP/s bf16 /
~98 TFLOP/s f32, 819 GB/s HBM; override with MFU_PEAK_TFLOPS /
MFU_PEAK_GBS for other parts.  MFU_PRESET selects the operating point
(default | fast | fastrt | realtime).  One JSON line to stdout.
"""

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

    from mpc_mmd_tpu import (Solver, fast_workload, fastrt_workload,
                             realtime_workload, static_workload)
    from mpc_mmd_tpu.dynamics import constant_velocity_obstacles

    preset = os.environ.get("MFU_PRESET", "default")
    make = {"default": static_workload, "fast": fast_workload,
            "fastrt": fastrt_workload, "realtime": realtime_workload}[preset]
    cfg = make(num_reduced=10, num_obs=6, num_prime=50,
               mode="mmd_opt", noise="gaussian", noise_level=0.1)
    solver = Solver(cfg)
    rng = np.random.default_rng(0)
    grid = np.array([35, 40, 45, 50, 55, 60, 65, 70, 75], dtype=np.float64)
    x0 = jnp.asarray(rng.choice(grid, 6, replace=False))
    y0 = jnp.asarray(rng.choice(np.array([-1.75, 1.75]), 6))
    z = jnp.zeros(6)
    xt, yt, _ = constant_velocity_obstacles(x0, y0, z, z, z,
                                            solver.ws.tot_time)
    init_state = jnp.asarray([0.0, 1.75, 5.0, 0.0, 0.0, 0.0])
    mean = jnp.asarray([15.0] * 4 + [0.0] * 4)
    cov = jnp.asarray(np.diag([20.0] * 4 + [100.0] * 4), jnp.float32)
    args = (0, init_state, mean, cov, xt, yt, 15.0)

    compiled = solver._solve.lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):     # older jax returns [dict]
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))

    # measured pipelined device time (async dispatch, one value-fetch fence)
    reps = int(os.environ.get("MFU_REPS", "12"))
    out = solver.solve(*args)
    np.asarray(out.cx)
    t0 = time.perf_counter()
    for k in range(reps):
        out = solver.solve(k + 1, *args[1:])
    np.asarray(out.cx)
    dev_s = (time.perf_counter() - t0) / reps

    peak_tflops = float(os.environ.get("MFU_PEAK_TFLOPS", "197"))
    peak_gbs = float(os.environ.get("MFU_PEAK_GBS", "819"))
    achieved_tflops = flops / dev_s / 1e12
    achieved_gbs = bytes_acc / dev_s / 1e9
    print(json.dumps({
        "preset": preset,
        "device": jax.devices()[0].device_kind,
        "xla_flops_per_solve": flops,
        "xla_bytes_accessed_per_solve": bytes_acc,
        "device_s_per_solve": round(dev_s, 4),
        "achieved_tflops": round(achieved_tflops, 4),
        "achieved_hbm_gbs": round(achieved_gbs, 2),
        "peak_tflops_assumed": peak_tflops,
        "peak_hbm_gbs_assumed": peak_gbs,
        "mfu_pct": round(100 * achieved_tflops / peak_tflops, 3),
        "hbm_util_pct": round(100 * achieved_gbs / peak_gbs, 2),
        "arithmetic_intensity_flops_per_byte":
            round(flops / bytes_acc, 3) if bytes_acc else None,
    }))


if __name__ == "__main__":
    main()
