import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp, time
from functools import partial
from jax import lax
from mpc_mmd_tpu import static_workload
from mpc_mmd_tpu.linalg import eq_qp_solve

cfg = static_workload(num_reduced=10, num_obs=6, num_prime=50, mode='mmd_opt')
b = cfg.beta_cem
C, S, M, k, n_el = 100, 100, 100, 10, b.num_ellite
rng = np.random.default_rng(0)
D = jnp.asarray(rng.uniform(0,10,(C,M,M)), jnp.float32)
samples0 = jnp.asarray(rng.normal(0,4,(C,S,M+1)), jnp.float32)

def timed(name, f, *args, iters=20):
    out = f(*args); jax.block_until_ready(out)
    t0=time.time(); out = f(*args); jax.block_until_ready(out)
    print(f'{name}: per-iter {(time.time()-t0)*1000/iters:.2f} ms', flush=True)

def chain(stage):
    def body(samples, _):
        sigma = samples[:, :, -1]
        _, idx_top = jax.lax.top_k(jnp.abs(samples[:, :, :M]), k)
        delta = idx_top.sum() * 1e-12
        if stage >= 1:
            rows = jax.vmap(lambda d, i: d[i])(D, idx_top)
            E = jnp.exp(-rows / sigma[:, :, None, None])
            K_mixed_sum = E.sum(axis=3)
            delta = delta + K_mixed_sum.sum()*1e-12
        if stage >= 2:
            onehot = (idx_top[:, :, :, None] == jnp.arange(M)[None, None, None, :]).astype(E.dtype)
            K_red = jnp.einsum('cskm,csjm->cskj', E, onehot)
            delta = delta + K_red.sum()*1e-12
        if stage >= 3:
            cost_m = b.rho_beta * K_red + b.qp_reg * jnp.eye(k)
            beta = eq_qp_solve(cost_m, b.rho_beta/M * K_mixed_sum)
            delta = delta + beta.sum()*1e-12
        if stage >= 4:
            q = -2.0/M * K_mixed_sum
            mmd = jnp.einsum('csi,csij,csj->cs', beta, K_red, beta) + jnp.einsum('csi,csi->cs', q, beta)
            order = jnp.argsort(mmd, axis=1)
            elites = jnp.take_along_axis(samples, order[:, :n_el, None], axis=1)
            meanv = elites.mean(axis=1)
            key = jax.random.PRNGKey(0)
            u = jax.random.normal(key, (C, S-n_el, n_el))
            z = jax.random.normal(key, (C, S-n_el, M+1))
            fresh = meanv[:, None] + jnp.einsum('cse,cem->csm', u, elites - meanv[:, None])/3.16 + 0.22*z
            samples = jnp.concatenate((elites, fresh), axis=1)
        return samples + delta, None
    out, _ = lax.scan(body, samples0, None, length=20)
    return out.sum()

for stage in range(5):
    timed(f'stage {stage}', jax.jit(partial(chain, stage)))
