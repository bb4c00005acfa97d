"""Microbench: f32 vs bf16 dtypes for the inner-CEM selection stage.

The (C, S, k, M) one-hot / K_mixed tensors dominate inner-iteration HBM
traffic (benchmarks/PROFILE_NOTES.md).  Measures whether carrying the
one-hot and kernel values in bfloat16 (f32 accumulation via
preferred_element_type) buys real time on v5e-lite, and what it does to
row_sum / K_red accuracy.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax import lax

C, S, M, k = 100, 100, 100, 10
maxiter = 20
rng = np.random.default_rng(0)
D = jnp.asarray(rng.uniform(0, 10, (C, M, M)), jnp.float32)
samples0 = jnp.asarray(rng.normal(0, 4, (C, S, M + 1)), jnp.float32)
sys.path.insert(0, "/root/repo")
from mpc_mmd_tpu.reduced_set import _topk


def make(dtype):
    Dd = D.astype(dtype)

    def body(samples, _):
        sigma = samples[..., -1]
        idx_top = _topk(samples, k, absolute=True, slice_to=M)
        onehot = (idx_top[..., None] == jnp.arange(M)).astype(dtype)
        rows = jnp.einsum("cskr,crm->cskm", onehot, Dd,
                          preferred_element_type=jnp.float32)
        K_mixed = jnp.exp(-rows / sigma[..., None, None]).astype(dtype)
        K_red = jnp.einsum("cskm,csjm->cskj", K_mixed, onehot,
                           preferred_element_type=jnp.float32)
        row_sum = jnp.sum(K_mixed.astype(jnp.float32), axis=-1)
        out = K_red.sum() * 1e-9 + row_sum.sum() * 1e-9
        return samples + out * 1e-9, (K_red[0, 0], row_sum[0, 0])

    return jax.jit(lambda s: lax.scan(body, s, None, length=maxiter))


for name, dtype in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
    f = make(dtype)
    out = f(samples0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(samples0)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{name}: {dt * 1e3 / maxiter:.3f} ms/iter", flush=True)
    if name == "f32":
        ref = (np.asarray(out[1][0], np.float64), np.asarray(out[1][1], np.float64))
    else:
        err_k = np.max(np.abs(np.asarray(out[1][0], np.float64) - ref[0]))
        err_r = np.max(np.abs(np.asarray(out[1][1], np.float64) - ref[1]))
        print(f"bf16 max abs err: K_red {err_k:.2e}, row_sum {err_r:.2e}")
