"""Monte-Carlo statistical validation of solved trajectories.

Device-side, fully batched replacement for the reference's numpy validator
(``synthetic_static_obs/validation.py``): for each saved solve, re-extract
controls from the Bernstein coefficients, re-roll ``n_mc`` (default 1000)
independent noisy rollouts, and reduce to collision / lane-violation counts
(the max over time of the number of simultaneously-violating rollouts —
validation.py:153-169 semantics).

The reference validates one solve at a time in a Python loop over numpy
arrays (validation.py:323); here the whole result set validates as one
jitted program (vmap over solves, one flat rollout scan), and shards over a
device mesh for pod-scale sweeps via :mod:`mpc_mmd_tpu.parallel.mesh`.

The *independent numpy oracle* role of the reference validator is preserved
by tests/test_validate.py, which cross-checks this device validator against
a pure-numpy reimplementation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .config import ProblemConfig
from .dynamics import controls_from_trajectory, rollout
from .qp import Workspace


class ValidationStats(NamedTuple):
    coll_count: jnp.ndarray      # max simultaneous colliding rollouts (per solve)
    lane_count: jnp.ndarray      # lane lb+ub violation count (per solve)
    coll_fraction: jnp.ndarray   # fraction of rollouts that EVER collide


def _mc_noise(cfg: ProblemConfig, key: jax.Array, acc: jnp.ndarray,
              steer: jnp.ndarray, n_mc: int):
    """Validator noise model (validation.py:64-87): standard-normal gaussian
    (equivalent to the MVN-identity draws) or beta with the reference's
    +1e-5 guard on the steer shape parameters."""
    noise = cfg.noise
    T = acc.shape[-1]
    k1, k2, k3 = jax.random.split(key, 3)
    if noise.kind == "gaussian":
        acc_pert = noise.level * jnp.abs(acc) * jax.random.normal(k1, (n_mc, T))
        steer_pert = noise.level * jnp.abs(steer) * jax.random.normal(k2, (n_mc, T))
    else:
        b_acc = jax.random.beta(k1, noise.beta_a * jnp.abs(acc),
                                noise.beta_b * jnp.abs(acc), (n_mc, T))
        b_steer = jax.random.beta(k2, noise.beta_a * jnp.abs(steer) + 1e-5,
                                  noise.beta_b * jnp.abs(steer) + 1e-5,
                                  (n_mc, T))
        acc_pert = noise.level * (2.0 * b_acc - 1.0)
        steer_pert = noise.k_steer * noise.level * (2.0 * b_steer - 1.0)
    eps = jax.random.normal(k3, (n_mc, T))
    return (acc + acc_pert + noise.acc_const * eps,
            steer + steer_pert + noise.steer_const * eps)


def make_validator_core(cfg: ProblemConfig, ws: Workspace, n_mc: int = 1000):
    """Unjitted per-solve-keys validator core.

    Returns ``validate(cx, cy, init_state, x_obs_traj, y_obs_traj, keys)``
    where ``keys`` is (S, 2) uint32 — one PRNG key per solve, pre-split by
    the caller.  Taking keys (instead of one key split inside) keeps the
    mesh-sharded validator (parallel/mesh.sharded_validator) bitwise
    identical to the single-device path: keys split globally, then shard.
    """
    T = cfg.horizon.num_prime
    dt = cfg.horizon.dt
    L = cfg.vehicle.wheel_base
    a2, b2 = cfg.obstacles.a_obs ** 2, cfg.obstacles.b_obs ** 2

    def one(cx, cy, init_state, x_obs_traj, y_obs_traj, key):
        xdot = ws.Pdot @ cx
        ydot = ws.Pdot @ cy
        xddot = ws.Pddot @ cx
        yddot = ws.Pddot @ cy
        acc, steer = controls_from_trajectory(xdot[None], ydot[None],
                                              xddot[None], yddot[None], dt, L)
        acc, steer = acc[0][:T], steer[0][:T]

        acc_n, steer_n = _mc_noise(cfg, key, acc, steer, n_mc)
        psi0 = jnp.arctan2(init_state[3], init_state[2])
        state0 = jnp.stack([init_state[0], init_state[1], init_state[2],
                            init_state[3], psi0])
        x_roll, y_roll = rollout(acc_n, steer_n, state0, dt, L)   # (n_mc, T)

        # ellipse violation per (obs, rollout, t) — validation.py:103-110
        dx = x_roll[None, :, :] - x_obs_traj[:, None, :T]
        dy = y_roll[None, :, :] - y_obs_traj[:, None, :T]
        viol = (1.0 - dx ** 2 / a2 - dy ** 2 / b2) > 0.0

        # max over (obs, t) of #violating rollouts — validation.py:153-158
        simultaneous = jnp.sum(viol, axis=1)                      # (obs, T)
        coll_count = jnp.max(simultaneous)

        ever = jnp.any(jnp.any(viol, axis=0), axis=-1)            # (n_mc,)
        coll_fraction = jnp.mean(ever.astype(jnp.float32))

        # lane violations — validation.py:112-120,160-169
        lb = (cfg.lane.y_lb - y_roll) > 0.0
        ub = (y_roll - cfg.lane.y_ub) > 0.0
        lane_count = (jnp.max(jnp.sum(lb, axis=0))
                      + jnp.max(jnp.sum(ub, axis=0)))
        return coll_count, lane_count, coll_fraction

    def validate_keys(cx, cy, init_state, x_obs_traj, y_obs_traj, keys):
        cc, lc, cf = jax.vmap(one, in_axes=(0, 0, None, 0, 0, 0))(
            cx, cy, init_state, x_obs_traj, y_obs_traj, keys)
        return ValidationStats(cc, lc, cf)

    return validate_keys


def make_validator(cfg: ProblemConfig, ws: Workspace, n_mc: int = 1000):
    """Jitted batch validator.

    Returns ``validate(cx, cy, init_state, x_obs_traj, y_obs_traj, key)``
    with cx, cy: (S, nvar); x_obs_traj: (S, num_obs, num); output stats (S,).
    """
    core = make_validator_core(cfg, ws, n_mc)

    def validate(cx, cy, init_state, x_obs_traj, y_obs_traj, key):
        keys = jax.random.split(key, cx.shape[0])
        return core(cx, cy, init_state, x_obs_traj, y_obs_traj, keys)

    return jax.jit(validate)
