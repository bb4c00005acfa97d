"""Pallas TPU kernel: fused bicycle-kinematics rollout.

The XLA lowering of the rollout ``lax.scan`` issues ~10 small VPU kernels
per timestep with HBM round-trips for the carried state; at T=50 steps that
is launch/latency bound (~6.5 ms for 10k lanes on v5e).  This kernel keeps
the whole time loop on-chip: controls stream time-major through VMEM, the
5-vector state lives in registers/VMEM across all T steps, and positions are
written row-by-row — one kernel launch for the entire rollout.

Layout: controls and outputs are time-major (T, L) so each timestep touches
one contiguous lane row; the lane axis is blocked across the grid.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

_LANE_BLOCK = 1024


def pallas_available() -> bool:
    if not _HAVE_PALLAS:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "cpu")
    except Exception:
        return False


def _rollout_kernel(acc_ref, steer_ref, state0_ref, x_ref, y_ref, *,
                    T: int, dt: float, wheel_base: float):
    x = state0_ref[0, :]
    y = state0_ref[1, :]
    vx = state0_ref[2, :]
    vy = state0_ref[3, :]
    psi = state0_ref[4, :]

    def body(t, carry):
        x, y, vx, vy, psi = carry
        x_ref[t, :] = x
        y_ref[t, :] = y
        a_t = acc_ref[t, :]
        s_t = steer_ref[t, :]
        v = jnp.sqrt(vx * vx + vy * vy) + a_t * dt
        psi_n = psi + v * jnp.tan(s_t) / wheel_base * dt
        vx_n = v * jnp.cos(psi_n)
        vy_n = v * jnp.sin(psi_n)
        return (x + vx_n * dt, y + vy_n * dt, vx_n, vy_n, psi_n)

    jax.lax.fori_loop(0, T, body, (x, y, vx, vy, psi))


@functools.partial(jax.jit, static_argnames=("dt", "wheel_base", "interpret"))
def fused_rollout(acc: jnp.ndarray, steer: jnp.ndarray, state0: jnp.ndarray,
                  dt: float, wheel_base: float,
                  interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for :func:`mpc_mmd_tpu.dynamics.rollout`.

    acc, steer: (L, T) noisy control sequences; state0: (L, 5) or (5,).
    Returns x, y position stacks (L, T) — row t recorded before applying
    controls[t], matching the reference loop (cem_helper.py:451-461).
    """
    L, T = acc.shape
    if state0.ndim == 1:
        state0 = jnp.broadcast_to(state0[None, :], (L, 5))

    # time-major controls / outputs; state as (5, L)
    acc_t = acc.T
    steer_t = steer.T
    state_t = state0.T

    # Pick the lane block FIRST (128-aligned), then pad lanes up to a block
    # multiple.  The previous divisor-halving fallback collapsed to BL=128
    # at the production shape (L_pad = 10112 = 128 x 79, 79 prime): 79
    # serialized blocks of a single vreg row each — overhead-bound
    # (profiled 0.68 ms per call; one 10112-lane block runs the same math
    # in a fraction of that, VMEM ~8 MB at T=50 inside the ~16 MB budget).
    BL = int(np.ceil(min(_LANE_BLOCK, L) / 128) * 128)
    L_pad = int(np.ceil(L / BL) * BL)
    if L_pad != L:
        pad = L_pad - L
        acc_t = jnp.pad(acc_t, ((0, 0), (0, pad)))
        steer_t = jnp.pad(steer_t, ((0, 0), (0, pad)))
        state_t = jnp.pad(state_t, ((0, 0), (0, pad)))

    kernel = functools.partial(_rollout_kernel, T=T, dt=dt,
                               wheel_base=wheel_base)
    grid = (L_pad // BL,)
    x_t, y_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, BL), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, BL), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((5, BL), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((T, BL), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, BL), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, L_pad), acc.dtype),
            jax.ShapeDtypeStruct((T, L_pad), acc.dtype),
        ],
        interpret=interpret,
    )(acc_t, steer_t, state_t)
    return x_t[:, :L].T, y_t[:, :L].T
