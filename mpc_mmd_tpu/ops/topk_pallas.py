"""Pallas TPU kernel: row-wise top-k indices in one HBM pass.

The inner beta-CEM selects the k largest |beta| entries of every sample
(ref ``synthetic_static_obs/compute_beta.py:117-118`` does a full argsort).
On TPU every XLA formulation — ``lax.top_k`` (sort network), argsort slices,
k argmax-and-mask rounds — costs 0.2-0.4 ms per inner iteration at the
production shape (10^4 rows x 100 lanes) because the k data-dependent
rounds make repeated HBM passes over the 4 MB operand.  Profiled in-scan
(benchmarks/PROFILE_NOTES.md round 2): this stage alone was ~45% of the
inner-CEM iteration.

This kernel performs the k max+mask rounds entirely in VMEM per row-block:
one 4 MB read, a (rows, k) write, ~30 VPU passes over registers.  Semantics
match ``lax.top_k`` / stable argsort-descending: values descending,
first-occurrence index wins ties.

Indices are produced as f32 (Mosaic rejects some int vector casts in this
composition) and cast to int32 by the caller-facing wrapper.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_BLOCK = 512


def _kernel(x_ref, idx_ref, *, k: int, M: int, absolute: bool = False):
    x = x_ref[:, :M]                             # (B, M) (input may be wider)
    if absolute:
        x = jnp.abs(x)
    # NaN-last: with NaN lanes `x >= max` can be all-false, which would emit
    # the out-of-range sentinel M as the round's index.  Masking to -inf
    # keeps every emitted index in range (a NaN lane simply never wins).
    x = jnp.where(jnp.isnan(x), -jnp.inf, x)
    B = x.shape[0]
    iota_f = jax.lax.broadcasted_iota(jnp.int32, (B, M), 1).astype(jnp.float32)
    cols = []
    for _ in range(k):
        m = jnp.max(x, axis=1, keepdims=True)
        first = jnp.min(jnp.where(x >= m, iota_f, jnp.float32(M)),
                        axis=1, keepdims=True)
        cols.append(first[:, 0])
        x = jnp.where(jnp.abs(iota_f - first) < 0.5, -jnp.inf, x)
    idx_ref[...] = jnp.stack(cols, axis=1)       # (B, k) f32


def _kernel_onehot(x_ref, idx_ref, oh_ref, *, k: int, M: int,
                   absolute: bool):
    """Same rounds, but each round's winner mask is ALSO written out as the
    f32 one-hot row — its consumers (one-hot MXU gathers) otherwise pay a
    separate (rows, k, M) iota-compare pass over HBM (~47 us/iter profiled
    at the production shape).  With ``absolute`` the ranking key |x| is
    computed in VMEM, saving the caller another full-tensor abs pass."""
    x = x_ref[:, :M]                             # (B, M) (input may be wider)
    if absolute:
        x = jnp.abs(x)
    x = jnp.where(jnp.isnan(x), -jnp.inf, x)     # NaN-last (see _kernel)
    B = x.shape[0]
    iota_f = jax.lax.broadcasted_iota(jnp.int32, (B, M), 1).astype(jnp.float32)
    cols = []
    for j in range(k):
        m = jnp.max(x, axis=1, keepdims=True)
        first = jnp.min(jnp.where(x >= m, iota_f, jnp.float32(M)),
                        axis=1, keepdims=True)
        cols.append(first[:, 0])
        sel = jnp.abs(iota_f - first) < 0.5      # (B, M) winner mask
        oh_ref[:, j, :] = sel.astype(jnp.float32)
        x = jnp.where(sel, -jnp.inf, x)
    idx_ref[...] = jnp.stack(cols, axis=1)       # (B, k) f32


def _pad_rows(x: jnp.ndarray):
    """Flatten leading axes and zero-pad rows to a block multiple.

    Returns (xf (rows, W), rows_in, rows, B): the shared plumbing of every
    row-blocked kernel here — one place to change the block-size rule.
    """
    shape = x.shape
    rows_in = int(np.prod(shape[:-1]))
    xf = x.reshape(rows_in, shape[-1])
    B = min(_ROW_BLOCK, max(8, rows_in))
    rows = int(np.ceil(rows_in / B) * B)
    if rows != rows_in:
        xf = jnp.concatenate(
            (xf, jnp.zeros((rows - rows_in, shape[-1]), xf.dtype)), axis=0)
    return xf, rows_in, rows, B


@functools.partial(jax.jit,
                   static_argnames=("k", "interpret", "absolute", "slice_to"))
def topk_indices_pallas(x: jnp.ndarray, k: int, interpret: bool = False,
                        absolute: bool = False,
                        slice_to: int | None = None) -> jnp.ndarray:
    """Top-k indices (descending value order) along the last axis.

    x: (..., W) float32; ranking runs over the first ``slice_to`` lanes
    (default all) of ``|x|`` if ``absolute`` else ``x`` — applying
    abs/slice in VMEM saves the caller a full-tensor materialization.
    Returns (..., k) int32.  Ties: first index wins (matches lax.top_k and
    stable argsort on -x); NaN lanes rank last (never selected while any
    finite lane remains).
    """
    shape = x.shape
    W = shape[-1]
    M = W if slice_to is None else slice_to
    xf, rows_in, rows, B = _pad_rows(x)

    idx = pl.pallas_call(
        functools.partial(_kernel, k=k, M=M, absolute=absolute),
        grid=(rows // B,),
        in_specs=[pl.BlockSpec((B, W), lambda r: (r, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, k), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, k), jnp.float32),
        interpret=interpret,
    )(xf)
    return idx[:rows_in].astype(jnp.int32).reshape(shape[:-1] + (k,))


@functools.partial(jax.jit,
                   static_argnames=("k", "interpret", "absolute", "slice_to"))
def topk_onehot_pallas(x: jnp.ndarray, k: int, interpret: bool = False,
                       absolute: bool = False, slice_to: int | None = None):
    """Top-k indices AND their f32 one-hot rows along the last axis.

    x: (..., W) float32; ranking runs over the first ``slice_to`` lanes
    (default all W) of ``|x|`` if ``absolute`` else ``x``.  Returns
    (idx (..., k) int32, onehot (..., k, M) float32) with
    onehot[..., j, :] the indicator of idx[..., j].  Ties: first index wins
    (lax.top_k semantics); NaN lanes rank last.
    """
    shape = x.shape
    W = shape[-1]
    M = W if slice_to is None else slice_to
    xf, rows_in, rows, B = _pad_rows(x)

    idx, oh = pl.pallas_call(
        functools.partial(_kernel_onehot, k=k, M=M, absolute=absolute),
        grid=(rows // B,),
        in_specs=[pl.BlockSpec((B, W), lambda r: (r, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((B, k), lambda r: (r, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((B, k, M), lambda r: (r, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((rows, k), jnp.float32),
                   jax.ShapeDtypeStruct((rows, k, M), jnp.float32)),
        interpret=interpret,
    )(xf)
    return (idx[:rows_in].astype(jnp.int32).reshape(shape[:-1] + (k,)),
            oh[:rows_in].reshape(shape[:-1] + (k, M)))
