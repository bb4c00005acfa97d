"""Microbench: reduce-before-gather ("G") formulation of the selection stage.

The production inner-CEM selection (reduced_set.py:415-422) gathers k
distance rows per sample with a one-hot einsum ``cskr,crm->cskm`` (~2 GFLOP
per iteration at poor MXU utilization — PROFILE_NOTES.md) and only then
applies exp + row-sum.  But the row-sum part of its output is a *reduction*:
    row_sum[c,s,i] = sum_m exp(-D[c, idx_i, m] / sigma_s)
so the gather and the reduction commute.  The G formulation computes

    G[c,s,r] = sum_m exp(-D[c,r,m] * inv_sigma_s)      for ALL r

as one fused exp+reduce (XLA materializes only the (C,S,M) output; the
broadcast (C,S,M,M) exp volume is ~1e8/iter, measured cheap on the VPU),
then gathers the k needed entries with a tiny one-hot contraction.  K_red
(the (k,k) kernel among selected rows) no longer falls out of the rows
tensor, so it is recomputed from the *feature space* directly: gather the
(k, F) selected feature rows (F=22 << M=100, 5x cheaper than the rows
einsum) and take pairwise L1 there — numerically the same values D holds.

Variants (each in a 20-iteration scan like production):
  einsum — production form (one-hot rows gather + exp + K_red einsum)
  gform  — G row-sums + feature-space K_red (no (C,S,k,M) tensor at all)
  gtake  — G row-sums + K_red via flattened-table take of D[idx_i, idx_j]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from mpc_mmd_tpu.kernels import pairwise_l1
from mpc_mmd_tpu.reduced_set import _topk

C, S, M, k, F = 100, 100, 100, 10, 22
maxiter = 20
rng = np.random.default_rng(0)
feats = jnp.asarray(rng.uniform(0, 2, (C, M, F)), jnp.float32)
D = pairwise_l1(feats, feats)                     # (C, M, M)
D_flat = D.reshape(C, M * M)
samples0 = jnp.asarray(rng.normal(0, 4, (C, S, M + 1)), jnp.float32)


def make(variant):
    def body(samples, _):
        sigma = jnp.maximum(samples[..., -1], 0.01)  # production clip
        inv_sigma = 1.0 / sigma                                # (C, S)
        idx_top = _topk(samples, k, absolute=True, slice_to=M)  # (C, S, k)
        onehot = (idx_top[..., None] == jnp.arange(M)).astype(D.dtype)
        if variant == "einsum":
            rows = jnp.einsum("cskr,crm->cskm", onehot, D)
            K_mixed = jnp.exp(-rows / sigma[..., None, None])
            K_red = jnp.einsum("cskm,csjm->cskj", K_mixed, onehot)
            row_sum = jnp.sum(K_mixed, axis=-1)
        else:
            # fused exp+reduce over the broadcast (C,S,M,M); only the
            # (C,S,M) G output is materialized by XLA's loop fusion
            G = jnp.sum(
                jnp.exp(-D[:, None, :, :] * inv_sigma[:, :, None, None]),
                axis=-1)                                        # (C, S, M)
            row_sum = jnp.einsum("cskr,csr->csk", onehot, G)    # (C, S, k)
            if variant == "gform":
                fsel = jnp.einsum("cskr,crf->cskf", onehot, feats)
                d_sub = jnp.sum(
                    jnp.abs(fsel[:, :, :, None, :] - fsel[:, :, None, :, :]),
                    axis=-1)                                    # (C, S, k, k)
            else:  # gtake
                flat_idx = (idx_top[:, :, :, None] * M
                            + idx_top[:, :, None, :]).reshape(C, S * k * k)
                d_sub = jnp.take_along_axis(
                    D_flat, flat_idx, axis=1).reshape(C, S, k, k)
            K_red = jnp.exp(-d_sub / sigma[..., None, None])
        bump = (K_red.sum() + row_sum.sum()) * 1e-12
        return samples + bump, (row_sum, K_red)

    return jax.jit(lambda s: lax.scan(body, s, None, length=maxiter))


def bench(name, fn):
    out, aux = fn(samples0)
    out.block_until_ready()
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out, aux = fn(out)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / (reps * maxiter)
    print(f"{name:8s} {dt*1e3:7.3f} ms/iter", flush=True)
    return aux


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}", flush=True)
    ref = None
    for v in ("einsum", "gform", "gtake"):
        rs, kr = bench(v, make(v))
        if v == "einsum":
            ref = (rs, kr)
        else:
            e1 = float(jnp.max(jnp.abs(rs - ref[0])))
            e2 = float(jnp.max(jnp.abs(kr - ref[1])))
            print(f"  {v} vs einsum: row_sum {e1:.2e}  K_red {e2:.2e}")
