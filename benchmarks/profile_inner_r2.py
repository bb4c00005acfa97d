"""In-scan stage split of the CURRENT production inner-CEM iteration (r2)."""
import sys, time
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
samples0 = jnp.asarray(rng.normal(0, 4, (C, S, M + 1)), jnp.float32)
u_all = jnp.asarray(rng.normal(0, 1, (b.maxiter, S - n_el, n_el)), jnp.float32)
z_all = jnp.asarray(rng.normal(0, 1, (b.maxiter, S - n_el, M + 1)), jnp.float32)
inv_sqrt = 1.0 / jnp.sqrt(n_el - 1.0)
sqrt_jit = jnp.sqrt(b.cov_jitter)


def timed(name, f, *args, iters=b.maxiter):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time(); out = f(*args); jax.block_until_ready(out)
    print(f'{name}: per-iter {(time.time()-t0)*1000/iters:.3f} ms', flush=True)


def chain(stage):
    def body(samples, uz):
        u, z = uz
        acc = jnp.float32(0)
        sigma = samples[..., -1]
        idx_top = _topk(jnp.abs(samples[..., :M]), k)
        acc += idx_top.sum() * 1e-12
        if stage >= 1:  # selection einsums
            onehot = (idx_top[..., None] == jnp.arange(M)).astype(D.dtype)
            rows = jnp.einsum("cskr,crm->cskm", onehot, D)
            K_mixed = jnp.exp(-rows / sigma[..., None, None])
            K_red = jnp.einsum("cskm,csjm->cskj", K_mixed, onehot)
            row_sum = jnp.sum(K_mixed, axis=-1)
            acc += K_red.sum() * 1e-12
        if stage >= 2:  # QP
            beta_opt, cost = _beta_qp(K_red, row_sum, M, cfg)
            acc += cost.sum() * 1e-12
        if stage >= 3:  # CEM update
            cost2 = jnp.where(jnp.isnan(cost), jnp.inf, cost)
            idx_el = _topk(-cost2, n_el)
            onehot_el = (idx_el[..., None] == jnp.arange(S)).astype(samples.dtype)
            elites = jnp.einsum("ces,csm->cem", onehot_el, samples)
            mean = jnp.mean(elites, axis=1)
            fresh = (mean[:, None]
                     + jnp.einsum("se,cem->csm", u, elites - mean[:, None])
                     * inv_sqrt + sqrt_jit * z[None])
            fresh = fresh.at[:, :, -1].set(jnp.clip(fresh[:, :, -1], b.sigma_clip))
            samples = jnp.concatenate((elites, fresh), axis=1)
        if stage >= 4:  # best-gather
            i_min = jnp.argmin(cost2, axis=1)
            oh = (i_min[:, None] == jnp.arange(S)).astype(samples.dtype)
            acc += jnp.einsum("cs,csk->ck", oh, beta_opt).sum() * 1e-12
            acc += jnp.einsum("cs,cs->c", oh, samples[..., -1]).sum() * 1e-12
        return samples + acc * 0, acc
    return jax.jit(lambda s0: lax.scan(body, s0, (u_all, z_all))[1].sum())


for st, name in [(0, "topk"), (1, "+selection"), (2, "+QP"), (3, "+update"),
                 (4, "+best")]:
    timed(name, chain(st), samples0)
