"""Pallas TPU kernel: fused top-k selection + reduced-set kernel matrices.

One inner-CEM iteration's selection stage runs ~10 argmax+mask rounds, each
making multiple memory passes over the (C, S, M) sample tensor — ~0.19 s per
solve of pure HBM traffic.  This kernel performs, per (candidate,
sample-block) grid cell, entirely in VMEM:

    top-k by |beta| (k max+mask rounds in registers) ->
    one-hot selection matrix -> rows = onehot @ D (MXU) -> E = exp(-rows/sigma)
    -> K_mixed row-sums -> K_red columns

outputting only the compact results (row_sum (S,k), K_red (S,k,k), idx
(S,k)).  The equality-QP stays in its separate register kernel
(ops/qp_pallas.py) — fusing it here blew scoped VMEM and went launch-bound
(see git history for the reverted megakernel).

Numerics identical to the XLA fast path in reduced_set.py (same op order).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SAMPLE_BLOCK = 128


def _kernel(samples_ref, d_ref, rowsum_ref, kred_ref, idx_ref, *,
            M: int, k: int):
    samples = samples_ref[0]                     # (SB, M+1)
    D = d_ref[0]                                 # (M, M)
    SB = samples.shape[0]
    sigma = samples[:, M]

    # top-k by |beta|: k max+mask rounds, f32 throughout (Mosaic rejects
    # bool/int vector casts in this composition)
    absb = jnp.abs(samples[:, :M])
    iota_f = jax.lax.broadcasted_iota(jnp.int32, (SB, M), 1).astype(jnp.float32)
    onehot_cols = []
    idx_cols = []
    for _ in range(k):
        m = jnp.max(absb, axis=1, keepdims=True)
        first = jnp.min(jnp.where(absb >= m, iota_f, jnp.float32(M)),
                        axis=1, keepdims=True)
        oh = jnp.where(jnp.abs(iota_f - first) < 0.5, 1.0, 0.0)
        onehot_cols.append(oh)
        idx_cols.append(first[:, 0])
        absb = absb - oh * jnp.float32(3.0e38)
    onehot = jnp.stack(onehot_cols, axis=1)      # (SB, k, M) f32
    idx_ref[0] = jnp.stack(idx_cols, axis=1)     # f32 indices

    rows = jax.lax.dot_general(
        onehot.reshape(SB * k, M), D,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(SB, k, M)
    E = jnp.exp(-rows / sigma[:, None, None])
    rowsum_ref[0] = jnp.sum(E, axis=2)
    K_cols = [jnp.sum(E * onehot[:, j:j + 1, :], axis=2) for j in range(k)]
    kred_ref[0] = jnp.stack(K_cols, axis=2)      # (SB, k, k)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def topk_kernel_matrices(samples: jnp.ndarray, D: jnp.ndarray, k: int,
                         interpret: bool = False
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """samples: (C, S, M+1); D: (C, M, M).

    Returns (row_sum (C,S,k), K_red (C,S,k,k), idx (C,S,k) int32) for the
    top-k |beta| selection of every sample.
    """
    C, S_in, Mp1 = samples.shape
    M = Mp1 - 1
    SB = _SAMPLE_BLOCK
    S = int(np.ceil(S_in / SB) * SB)
    if S != S_in:
        pad = jnp.broadcast_to(samples[:, :1], (C, S - S_in, Mp1))
        samples = jnp.concatenate((samples, pad), axis=1)

    kernel = functools.partial(_kernel, M=M, k=k)
    rowsum, kred, idx = pl.pallas_call(
        kernel,
        grid=(C, S // SB),
        in_specs=[
            pl.BlockSpec((1, SB, Mp1), lambda c, s: (c, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, M), lambda c, s: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, SB, k), lambda c, s: (c, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SB, k, k), lambda c, s: (c, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SB, k), lambda c, s: (c, s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, S, k), jnp.float32),
            jax.ShapeDtypeStruct((C, S, k, k), jnp.float32),
            jax.ShapeDtypeStruct((C, S, k), jnp.float32),
        ],
        interpret=interpret,
    )(samples, D)
    return (rowsum[:, :S_in], kred[:, :S_in],
            idx[:, :S_in].astype(jnp.int32))
