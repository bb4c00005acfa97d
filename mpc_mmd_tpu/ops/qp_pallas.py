"""Pallas TPU kernel: batched tiny equality-constrained QP solve.

Solves  min_b 1/2 b^T C b - r^T b  s.t. sum(b) = 1  for B independent
(n x n) SPD systems (n = num_reduced <= ~16, B = candidates x cem-samples,
~10^4 per CEM iteration).

XLA's lowering of the unrolled Cholesky (mpc_mmd_tpu.linalg.eq_qp_solve)
issues ~40 partially-fused kernels with (B, n, n) scatter round-trips —
~0.4 ms per call, 165 ms per solve.  Here the whole factorization +
substitutions run in registers inside one kernel: the batch lies on the
lane axis ((n*n, B) layout), every Cholesky/substitution scalar is one
(BB,)-wide vector op, and the only memory traffic is reading C, r and
writing b once.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE_BLOCK = 512


def _qp_kernel(c_ref, r_ref, b_ref, mu_ref, *, n: int):
    # c_ref: (n*n, BB); r_ref: (n, BB); b_ref: (n, BB)
    a = [[c_ref[i * n + j, :] for j in range(n)] for i in range(n)]
    rb = [r_ref[i, :] for i in range(n)]

    # Cholesky (scalar-unrolled, vectors of width BB)
    L = [[None] * n for _ in range(n)]
    inv_diag = [None] * n
    for j in range(n):
        s = a[j][j]
        for p in range(j):
            s = s - L[j][p] * L[j][p]
        inv_d = jax.lax.rsqrt(s)
        inv_diag[j] = inv_d
        L[j][j] = s * inv_d
        for i in range(j + 1, n):
            t = a[i][j]
            for p in range(j):
                t = t - L[i][p] * L[j][p]
            L[i][j] = t * inv_d

    def fwd(vec):
        y = []
        for i in range(n):
            s = vec[i]
            for p in range(i):
                s = s - L[i][p] * y[p]
            y.append(s * inv_diag[i])
        return y

    def bwd(y):
        x = [None] * n
        for i in range(n - 1, -1, -1):
            s = y[i]
            for p in range(i + 1, n):
                s = s - L[p][i] * x[p]
            x[i] = s * inv_diag[i]
        return x

    z = bwd(fwd(rb))
    ones = jnp.ones_like(rb[0])
    w = bwd(fwd([ones] * n))
    sum_z = z[0]
    sum_w = w[0]
    for i in range(1, n):
        sum_z = sum_z + z[i]
        sum_w = sum_w + w[i]
    mu = (sum_z - 1.0) / sum_w
    for i in range(n):
        b_ref[i, :] = z[i] - mu * w[i]
    mu_ref[0, :] = mu


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def eq_qp_solve_pallas_t(c_t: jnp.ndarray, r_t: jnp.ndarray, n: int,
                         interpret: bool = False):
    """Pre-transposed entry: solve B systems given lane-major operands.

    c_t: (n*n, B) with row i*n+j = C[..., i, j]; r_t: (n, B).  Returns
    (b_t (n, B), mu (B,)).  This is the kernel's native layout — producers
    that can emit it directly (e.g. a transposed-output einsum) skip the
    (B, n, n) -> (n*n, B) relayout that :func:`eq_qp_solve_pallas` pays.
    """
    B = c_t.shape[1]
    # Pick the lane block FIRST (128-aligned), then pad lanes up to a block
    # multiple — the old divisor-halving fallback could collapse to BB=128
    # on shapes whose padded size has a large prime factor (the same bug
    # the rollout kernel had at production shape).
    BB = int(np.ceil(min(_LANE_BLOCK, B) / 128) * 128)
    B_pad = int(np.ceil(B / BB) * BB)
    if B_pad != B:
        # identity-pad so the padded systems stay SPD
        eye_flat = jnp.eye(n).reshape(n * n, 1)
        c_t = jnp.concatenate(
            (c_t, jnp.tile(eye_flat, (1, B_pad - B))), axis=1)
        r_t = jnp.concatenate((r_t, jnp.zeros((n, B_pad - B))), axis=1)

    kernel = functools.partial(_qp_kernel, n=n)
    b_t, mu_t = pl.pallas_call(
        kernel,
        grid=(B_pad // BB,),
        in_specs=[
            pl.BlockSpec((n * n, BB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, BB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n, BB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, B_pad), c_t.dtype),
            jax.ShapeDtypeStruct((1, B_pad), c_t.dtype),
        ],
        interpret=interpret,
    )(c_t, r_t)
    return b_t[:, :B], mu_t[0, :B]


@functools.partial(jax.jit, static_argnames=("interpret",))
def eq_qp_solve_pallas(C: jnp.ndarray, r: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """Drop-in for :func:`mpc_mmd_tpu.linalg.eq_qp_solve` (C SPD).

    C: (..., n, n); r: (..., n).  Returns (..., n).
    """
    batch_shape = C.shape[:-2]
    n = C.shape[-1]
    B = int(np.prod(batch_shape)) if batch_shape else 1

    # (n*n, B) / (n, B) lane-major layouts
    c_t = C.reshape(B, n * n).T
    r_t = r.reshape(B, n).T
    b_t, mu = eq_qp_solve_pallas_t(c_t, r_t, n, interpret=interpret)
    return (b_t.T.reshape(batch_shape + (n,)),
            mu.reshape(batch_shape))
