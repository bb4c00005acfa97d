"""Microbench: lowering alternatives for the inner-CEM selection contraction.

The xprof trace (benchmarks/PROFILE_NOTES.md) shows the selection einsum
``cskr,crm->cskm`` lowering to a convolution at ~98 us/iteration — the
largest single op in the inner-CEM loop.  Candidates measured here, each
inside a 20-iteration scan so XLA can fuse as it does in production:

  a) einsum    — current production form (one-hot @ distance rows)
  b) dotgen    — same contraction as an explicit batched ``lax.dot_general``
                 on a (C, S*k, M) reshape of the one-hot
  c) take      — flattened-table gather ``jnp.take(D_flat, c*M + idx)``
                 (no one-hot at all; measures whether XLA's TPU gather still
                 scalarizes at this shape, the original motivation for the
                 one-hot form)

Each variant also computes exp, row_sum and K_red so the comparison includes
the fusions the real loop depends on.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

C, S, M, k = 100, 100, 100, 10
maxiter = 20
rng = np.random.default_rng(0)
D = jnp.asarray(rng.uniform(0, 10, (C, M, M)), jnp.float32)
D_flat = D.reshape(C * M, M)
samples0 = jnp.asarray(rng.normal(0, 4, (C, S, M + 1)), jnp.float32)

sys.path.insert(0, "/root/repo")
from mpc_mmd_tpu.reduced_set import _topk


def make(variant):
    def body(samples, _):
        sigma = samples[..., -1]
        idx_top = _topk(samples, k, absolute=True, slice_to=M)   # (C, S, k)
        if variant == "take":
            idx_flat = (idx_top
                        + (jnp.arange(C) * M)[:, None, None]).reshape(-1)
            rows = jnp.take(D_flat, idx_flat, axis=0,
                            indices_are_sorted=False,
                            unique_indices=False).reshape(C, S, k, M)
            onehot = (idx_top[..., None] == jnp.arange(M)).astype(D.dtype)
        else:
            onehot = (idx_top[..., None] == jnp.arange(M)).astype(D.dtype)
            if variant == "einsum":
                rows = jnp.einsum("cskr,crm->cskm", onehot, D)
            else:  # dotgen
                oh2 = onehot.reshape(C, S * k, M)
                rows = lax.dot_general(
                    oh2, D, (((2,), (1,)), ((0,), (0,)))).reshape(C, S, k, M)
        K_mixed = jnp.exp(-rows / sigma[..., None, None])
        K_red = jnp.einsum("cskm,csjm->cskj", K_mixed, onehot)
        row_sum = jnp.sum(K_mixed, axis=-1)
        bump = (K_red.sum() + row_sum.sum()) * 1e-12
        return samples + bump, None

    return jax.jit(lambda s: lax.scan(body, s, None, length=maxiter)[0])


def bench(name, fn):
    out = fn(samples0)
    out.block_until_ready()
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(out)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / (reps * maxiter)
    print(f"{name:8s} {dt*1e3:7.3f} ms/iter")
    return out


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    outs = {v: bench(v, make(v)) for v in ("einsum", "dotgen", "take")}
    for v in ("dotgen", "take"):
        err = float(jnp.max(jnp.abs(outs[v] - outs["einsum"])))
        print(f"{v} vs einsum: max abs diff {err:.2e}")
