"""Micro-experiments for next-round perf decisions (v5e-lite)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

rng = np.random.default_rng(0)
C, S, M, k = 100, 100, 100, 10


def timeit(f, *a, n=20):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.time()
    for _ in range(n):
        o = f(*a)
    jax.block_until_ready(o)
    return (time.time() - t0) / n * 1e3


# 1) exp volume: f32 vs bf16 on the (C,S,k,M) kernel tensor
x32 = jnp.asarray(rng.normal(0, 1, (C, S, k, M)), jnp.float32)
x16 = x32.astype(jnp.bfloat16)
e32 = jax.jit(lambda x: jnp.exp(-jnp.abs(x)).sum(axis=-1))
e16 = jax.jit(lambda x: jnp.exp(-jnp.abs(x)).sum(axis=-1))
print(f"exp+rowsum f32: {timeit(e32, x32):.3f} ms", flush=True)
print(f"exp+rowsum bf16: {timeit(e16, x16):.3f} ms", flush=True)

# 2) top-k: argmax-and-mask rounds vs lax.top_k vs approx_max_k
absb = jnp.abs(jnp.asarray(rng.normal(0, 1, (C * S, M)), jnp.float32))


def topk_rounds(x):
    iota = jnp.arange(x.shape[-1])
    idxs = []
    for _ in range(k):
        i = jnp.argmax(x, axis=-1)
        idxs.append(i)
        x = jnp.where(iota == i[..., None], -jnp.inf, x)
    return jnp.stack(idxs, axis=-1)


t_rounds = timeit(jax.jit(topk_rounds), absb)
t_topk = timeit(jax.jit(lambda x: jax.lax.top_k(x, k)[1]), absb)
t_approx = timeit(jax.jit(
    lambda x: jax.lax.approx_max_k(x, k, recall_target=0.95)[1]), absb)
print(f"topk rounds: {t_rounds:.3f} ms  lax.top_k: {t_topk:.3f} ms  "
      f"approx_max_k: {t_approx:.3f} ms", flush=True)
ex = np.asarray(topk_rounds(absb))
ap = np.asarray(jax.lax.approx_max_k(absb, k, recall_target=0.95)[1])
recall = np.mean([len(set(ex[i]) & set(ap[i])) / k
                  for i in range(0, C * S, 37)])
print(f"approx recall vs exact: {recall:.4f}", flush=True)

# 3) one full inner-CEM selection stage f32 vs bf16 end-to-end
D = jnp.abs(jnp.asarray(rng.normal(0, 1, (C, M, M)), jnp.float32))
samples = jnp.asarray(rng.normal(0, 1, (C, S, M + 1)), jnp.float32)
samples = samples.at[..., -1].set(jnp.abs(samples[..., -1]) + 0.2)


def sel_stage(samples, D, dtype):
    sig = samples[..., M]
    idx = topk_rounds(jnp.abs(samples[..., :M]).reshape(C * S, M)).reshape(
        C, S, k)
    onehot = (idx[..., None] == jnp.arange(M)).astype(dtype)
    rows = jnp.einsum("cskr,crm->cskm", onehot, D.astype(dtype))
    E = jnp.exp(-rows / sig[..., None, None].astype(dtype))
    row_sum = jnp.sum(E, axis=-1)
    K_red = jnp.einsum("cskm,csjm->cskj", E, onehot)
    return row_sum.astype(jnp.float32), K_red.astype(jnp.float32)


f32 = jax.jit(lambda s, d: sel_stage(s, d, jnp.float32))
f16 = jax.jit(lambda s, d: sel_stage(s, d, jnp.bfloat16))
print(f"selection stage f32: {timeit(f32, samples, D):.3f} ms", flush=True)
print(f"selection stage bf16: {timeit(f16, samples, D):.3f} ms", flush=True)
r32, k32 = f32(samples, D)
r16, k16 = f16(samples, D)
err = float(jnp.max(jnp.abs(r32 - r16) / (jnp.abs(r32) + 1e-6)))
print(f"bf16 row_sum max rel err: {err:.2e}", flush=True)
print("DONE", flush=True)
