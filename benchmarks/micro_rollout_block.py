"""Microbench: fused-rollout lane-block size on TPU.

The production mother-rollout stage is ~13.7 ms/solve (profile_stages_r2,
stage-2 delta) = 0.68 ms per outer iteration for (L=10^4 lanes, T=50).
The kernel's grid serializes L/_LANE_BLOCK blocks of T sequential steps
each; at the default block 1024 that is 500 step-chunks of only 8 vregs of
VPU work apiece — overhead-bound.  Bigger blocks mean fewer, wider chunks
(VMEM at (T=50, L=10112) x 4 arrays f32 is ~8 MB, inside the ~16 MB/core
budget).  This measures the kernel alone at production shape for several
block sizes, plus the XLA scan fallback for reference.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

import mpc_mmd_tpu.ops.rollout_pallas as rp
from mpc_mmd_tpu.dynamics import rollout

L, T = 10_000, 50
rng = np.random.default_rng(0)
acc = jnp.asarray(rng.normal(1.0, 0.5, (L, T)), jnp.float32)
steer = jnp.asarray(rng.normal(0.0, 0.05, (L, T)), jnp.float32)
state0 = jnp.asarray([0.0, 1.75, 5.0, 0.0, 0.0], jnp.float32)


def bench(name, fn, reps=20):
    x, y = fn(acc, steer, state0, 0.15, 2.5)
    x.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        x, y = fn(acc, steer, state0, 0.15, 2.5)
    x.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:24s} {dt*1e3:7.3f} ms/call", flush=True)
    return np.asarray(x)


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}  shape: ({L}, {T})", flush=True)
    ref = bench("xla scan", jax.jit(rollout, static_argnums=(3, 4)))
    for blk in (512, 1024, 2048, 4096, 16384):
        rp._LANE_BLOCK = blk
        # effective block after the kernel's 128-align + clamp-to-L rule
        eff = int(np.ceil(min(blk, L) / 128) * 128)
        # new block size -> new jit cache entry needed
        fn = rp.fused_rollout.__wrapped__
        got = bench(f"pallas block={blk} (eff {eff})",
                    jax.jit(fn, static_argnames=("dt", "wheel_base",
                                                 "interpret")))
        err = float(np.max(np.abs(got - ref)))
        if err > 1e-4:
            print(f"  MISMATCH block={blk}: {err}")
