import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp, time
from jax import lax
from mpc_mmd_tpu import static_workload
from mpc_mmd_tpu.reduced_set import select_reduced_set

cfg = static_workload(num_reduced=10, num_obs=6, num_prime=50, mode='mmd_opt')
C, M = 100, 100
rng = np.random.default_rng(0)
cx = jnp.asarray(rng.normal(0,1,(C,M,11)), jnp.float32)
cy = jnp.asarray(rng.normal(0,1,(C,M,11)), jnp.float32)
xr = jnp.asarray(rng.normal(0,1,(C,M,50)), jnp.float32)
yr = jnp.asarray(rng.normal(0,1,(C,M,50)), jnp.float32)

def bench(name, fn, *args):
    out = fn(*args); out.block_until_ready()
    t0=time.time()
    for _ in range(3): out = fn(*args)
    out.block_until_ready()
    print(name, round((time.time()-t0)/3*1000,2), 'ms', flush=True)

inner = lambda a,b,c,d: jax.vmap(lambda w,x,y,z: select_reduced_set(cfg, w,x,y,z))(a,b,c,d)

# single call
bench('single vmap(select)', jax.jit(lambda a,b,c,d: inner(a,b,c,d).beta.sum()), cx, cy, xr, yr)

# inside outer scan x20 with data dependence
def outer(a, b, c, d):
    def body(carry, _):
        rs = inner(a + carry*1e-9, b, c, d)
        return carry + rs.beta.sum(), None
    out, _ = lax.scan(body, jnp.float32(0.), None, length=20)
    return out
bench('scan20(vmap(select))', jax.jit(outer), cx, cy, xr, yr)

f = jax.jit(lambda a,b,c,d: inner(a,b,c,d).beta.sum())
out = f(cx, cy, xr, yr)
print('beta sum value:', float(out), flush=True)
rs = jax.jit(inner)(cx, cy, xr, yr)
print('beta[0]:', np.asarray(rs.beta[0]), flush=True)
print('sigma[0]:', float(rs.sigma[0]), 'res[0,-1]:', float(rs.res[0][-1]), flush=True)
t0=time.time(); rs2 = jax.jit(inner)(cx, cy, xr, yr); jax.block_until_ready(rs2); print('full tuple time:', (time.time()-t0)*1000, 'ms', flush=True)
