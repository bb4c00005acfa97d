import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp, time
from functools import partial
from jax import lax
from mpc_mmd_tpu import static_workload
from mpc_mmd_tpu.kernels import pairwise_l1
from mpc_mmd_tpu.linalg import eq_qp_solve

cfg = static_workload(num_reduced=10, num_obs=6, num_prime=50, mode='mmd_opt')
b = cfg.beta_cem
C, S, M, k, n_el = 100, 100, 100, 10, b.num_ellite
rng = np.random.default_rng(0)
cx = jnp.asarray(rng.normal(0,1,(C,M,11)), jnp.float32)
cy = jnp.asarray(rng.normal(0,1,(C,M,11)), jnp.float32)

def bench(name, fn, *args):
    out = fn(*args); jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
    t0=time.time()
    for _ in range(5): out = fn(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
    print(name, round((time.time()-t0)/5*1000,2), 'ms', flush=True)

# full inner CEM vmapped (scan of 20 iters)
from mpc_mmd_tpu.reduced_set import select_reduced_set
xr = jnp.asarray(rng.normal(0,1,(C,M,50)), jnp.float32)
yr = jnp.asarray(rng.normal(0,1,(C,M,50)), jnp.float32)
bench('full inner CEM (20 iters, 100 cand)', jax.jit(lambda a,b2,c,d: jax.vmap(lambda w,x,y,z: select_reduced_set(cfg, w,x,y,z))(a,b2,c,d)), cx, cy, xr, yr)

# D matrix alone
feats = jnp.concatenate((cx, cy), axis=2)
bench('D matrix (C,M,M)', jax.jit(lambda f: pairwise_l1(f, f)), feats)

# one inner iteration decomposed, batched over C
D = pairwise_l1(feats, feats)
samples = jnp.asarray(rng.normal(0,4,(C,S,M+1)), jnp.float32)

def iter_parts(D, samples, upto):
    sigma = samples[:, :, -1]
    idx_sorted = jnp.argsort(jnp.abs(samples[:, :, :M]), axis=2)
    idx_top = idx_sorted[:, :, M-k:]
    out = idx_top.sum()
    if upto >= 1:
        rows = jax.vmap(lambda d, i: d[i])(D, idx_top)  # (C,S,k,M)
        K_mixed = jnp.exp(-rows / sigma[:, :, None, None])
        out = out + K_mixed.sum()
    if upto >= 2:
        sub = jnp.take_along_axis(rows, jnp.broadcast_to(idx_top[:, :, None, :], (C, S, k, k)), axis=3)
        K_red = jnp.exp(-sub / sigma[:, :, None, None])
        out = out + K_red.sum()
    if upto >= 3:
        cost_m = b.rho_beta * K_red + b.qp_reg * jnp.eye(k)
        lincost = -b.rho_beta/M * jnp.sum(K_mixed, axis=3)
        beta = eq_qp_solve(cost_m, -lincost)
        out = out + beta.sum()
    if upto >= 4:
        q = -2.0/M * jnp.sum(K_mixed, axis=3)
        mmd = jnp.einsum('csi,csij,csj->cs', beta, K_red, beta) + jnp.einsum('csi,csi->cs', q, beta)
        order = jnp.argsort(mmd, axis=1)
        elites = jnp.take_along_axis(samples, order[:, :n_el, None], axis=1)
        mean = elites.mean(axis=1)
        out = out + mean.sum()
    if upto >= 5:
        key = jax.random.PRNGKey(0)
        u = jax.random.normal(key, (C, S-n_el, n_el))
        z = jax.random.normal(key, (C, S-n_el, M+1))
        fresh = mean[:, None] + jnp.einsum('cse,cem->csm', u, elites - mean[:, None])/3.1623 + 0.2236*z
        out = out + fresh.sum()
    return out

for upto in range(6):
    bench(f'iter upto {upto}', jax.jit(partial(iter_parts, upto=upto)), D, samples)
