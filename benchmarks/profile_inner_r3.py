"""In-scan stage split of the CURRENT production inner-CEM iteration (r3).

Matches reduced_set.select_reduced_set_batched exactly: Pallas top-k,
one-hot selection einsums, Pallas QP, precomputed affine-GEMM CEM update
(B_t @ elites + Z_t), fused lane-floor sigma clip, one-hot best gathers.
Cumulative stages -> per-stage deltas of the ~0.35 ms iteration.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from mpc_mmd_tpu import static_workload
from mpc_mmd_tpu.reduced_set import _topk, _beta_qp

cfg = static_workload(num_reduced=10, num_obs=6, num_prime=50, mode='mmd_opt')
b = cfg.beta_cem
C, S, M, k, n_el = 100, 100, 100, 10, b.num_ellite
rng = np.random.default_rng(0)
D = jnp.asarray(rng.uniform(0, 10, (C, M, M)), jnp.float32)
samples0 = jnp.abs(jnp.asarray(rng.normal(0, 4, (C, S, M + 1)), jnp.float32))
B_all = jnp.asarray(rng.normal(0, 0.3, (b.maxiter, S, n_el)), jnp.float32)
Z_all = jnp.asarray(rng.normal(0, 0.1, (b.maxiter, S, M + 1)), jnp.float32)
lane_floor = jnp.full((M + 1,), -jnp.inf).at[-1].set(b.sigma_clip)


def chain(stage):
    def body(samples, uz):
        B_t, Z_t = uz
        acc = jnp.float32(0)
        sigma = samples[..., -1]
        idx_top = _topk(samples, k, absolute=True, slice_to=M)
        acc += idx_top.sum() * 1e-12
        cost = None
        if stage >= 1:  # selection einsums
            onehot = (idx_top[..., None] == jnp.arange(M)).astype(D.dtype)
            rows = jnp.einsum("cskr,crm->cskm", onehot, D)
            K_mixed = jnp.exp(-rows / sigma[..., None, None])
            K_red = jnp.einsum("cskm,csjm->cskj", K_mixed, onehot)
            row_sum = jnp.sum(K_mixed, axis=-1)
            acc += K_red.sum() * 1e-12
        if stage >= 2:  # QP
            beta_opt, cost = _beta_qp(K_red, row_sum, M, cfg)
            cost = jnp.where(jnp.isnan(cost), jnp.inf, cost)
            acc += cost.sum() * 1e-12
        if stage >= 3:  # elite gather + affine-GEMM update + lane floor
            idx_el = _topk(-cost, n_el)
            onehot_el = (idx_el[..., None] == jnp.arange(S)).astype(samples.dtype)
            elites = jnp.einsum("ces,csm->cem", onehot_el, samples)
            samples = jnp.maximum(
                jnp.einsum("se,cem->csm", B_t, elites) + Z_t, lane_floor)
        if stage >= 4:  # best-row gathers
            i_min = jnp.argmin(cost, axis=1)
            oh = (i_min[:, None] == jnp.arange(S)).astype(samples.dtype)
            acc += jnp.einsum("cs,csk->ck", oh, beta_opt).sum() * 1e-12
            acc += jnp.einsum("cs,cs->c", oh, samples[..., -1]).sum() * 1e-12
        return samples + acc * 0, acc

    return jax.jit(
        lambda s: lax.scan(body, s, (B_all, Z_all))[0])


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    prev = 0.0
    for stage in range(5):
        f = chain(stage)
        out = f(samples0); out.block_until_ready()
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(out)
        out.block_until_ready()
        per = (time.perf_counter() - t0) * 1e3 / (reps * b.maxiter)
        print(f"stage<= {stage}: {per:7.3f} ms/iter  (delta {per - prev:+.3f})",
              flush=True)
        prev = per
