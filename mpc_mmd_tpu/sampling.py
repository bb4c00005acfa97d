"""Outer-CEM behavioral-parameter sampling, scalar cost and distribution update.

The 8-D behavioral parameter is [v_des_1..4, y_des_1..4] — desired speeds and
lateral offsets over four horizon segments.  The CEM keeps a full-covariance
Gaussian over it, updated with exponential elite weights and EMA smoothing.

Reference parity: cem_helper.py:122-150 (sampling), :232-262 (scalar cost),
:264-271 (elites), :280-314 (update + resample).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .config import ProblemConfig


def clip_v_params(params: jnp.ndarray, v_min: float, v_max: float) -> jnp.ndarray:
    """Clip the 4 desired-velocity columns; offsets stay free.  Ref :138-145."""
    v = jnp.clip(params[:, 0:4], v_min, v_max)
    return jnp.concatenate((v, params[:, 4:]), axis=1)


def sample_params(key: jax.Array, mean: jnp.ndarray, cov: jnp.ndarray,
                  n: int, cfg: ProblemConfig) -> jnp.ndarray:
    """Draw n behavioral-parameter samples.  Ref: cem_helper.py:122-150."""
    samples = jax.random.multivariate_normal(key, mean, cov, (n,))
    return clip_v_params(samples, cfg.vehicle.v_min, cfg.vehicle.v_max)


def initial_params(cfg: ProblemConfig, mean: jnp.ndarray, cov: jnp.ndarray
                   ) -> jnp.ndarray:
    """Initial batch: the reference reuses split(PRNGKey(0))[0] every solve
    (cem_helper.py:86,125-126) — deterministic across solves by design."""
    key, _ = jax.random.split(jax.random.PRNGKey(0))
    return sample_params(key, mean, cov, cfg.cem.num_batch, cfg)


def scalar_cost(cfg: ProblemConfig, risk_obs: jnp.ndarray, risk_lane: jnp.ndarray,
                y: jnp.ndarray, res_norm: jnp.ndarray,
                xdot: jnp.ndarray, ydot: jnp.ndarray,
                xddot: jnp.ndarray, yddot: jnp.ndarray,
                steering: jnp.ndarray, v_des) -> jnp.ndarray:
    """Scalarize per-candidate trajectory quality + weighted risk.

    All trajectory terms span the full horizon (num columns).  The desired-
    lane term is computed but zero-weighted, exactly like the reference
    (cem_helper.py:240,259).  Ref: cem_helper.py:232-262.
    """
    steering_vel = jnp.diff(steering, axis=1)
    steering_acc = jnp.diff(steering_vel, axis=1)
    v = jnp.sqrt(xdot ** 2 + ydot ** 2)

    cost_steering = jnp.linalg.norm(steering, axis=1)
    cost_steering_vel = jnp.linalg.norm(steering_vel, axis=1)
    cost_steering_acc = jnp.linalg.norm(steering_acc, axis=1)
    cost_steer_pen = jnp.linalg.norm(
        jnp.maximum(0.0, jnp.abs(steering) - cfg.vehicle.steer_max), axis=1)
    cost_steer_vel_pen = jnp.linalg.norm(
        jnp.maximum(0.0, jnp.abs(steering_vel) - 0.05), axis=1)

    return (res_norm
            + 0.1 * jnp.linalg.norm(v - v_des, axis=1)
            + 0.1 * (cost_steering + cost_steering_vel + cost_steering_acc)
            + 0.1 * (cost_steer_pen + cost_steer_vel_pen)
            + 0.02 * jnp.linalg.norm(yddot, axis=1)
            + 0.02 * jnp.linalg.norm(xddot, axis=1)
            + risk_obs + 0.0 * risk_lane)


def cem_update(cfg: ProblemConfig, key: jax.Array, params_elite: jnp.ndarray,
               cost_elite: jnp.ndarray, mean_prev: jnp.ndarray,
               cov_prev: jnp.ndarray
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exponential-weighted mean/cov EMA update + resample of the batch.

    Returns (mean, cov, next_params) with next_params = [elites; resampled].
    Ref: cem_helper.py:280-314.
    """
    c = cfg.cem
    w = jnp.exp(-(cost_elite - jnp.min(cost_elite)) / c.lamda)
    sum_w = jnp.sum(w)

    mean = (1.0 - c.alpha_mean) * mean_prev + c.alpha_mean * (
        jnp.sum(params_elite * w[:, None], axis=0) / sum_w)
    diffs = params_elite - mean
    cov_w = jnp.einsum("b,bi,bj->ij", w, diffs, diffs) / sum_w
    cov = ((1.0 - c.alpha_cov) * cov_prev + c.alpha_cov * cov_w
           + c.cov_jitter * jnp.eye(c.num_params))

    fresh = sample_params(key, mean, cov, c.num_batch - c.ellite_num, cfg)
    next_params = jnp.concatenate((params_elite, fresh), axis=0)
    return mean, cov, next_params


# ---------------------------------------------------------------------------
# 3-mode GMM initial-state ensemble (synthetic-workload variant).
# Ref: synthetic_static_obs/optimizer/cem_helper.py:316-364 with the GMM
# parameters from cem.py:145-153.  DEAD CODE in the reference's synthetic
# workloads (never called by any solve path); the CARLA-used 2-parameter
# variant is mpc_mmd_tpu/solver_frenet.py (noisy Frenet init states).
# Re-implemented for component completeness, reference quirks preserved:
#   * the SAME PRNG key drives both the MVN draw and the mode choice
#     (cem_helper.py:321,345 reuse `key` after the unused split);
#   * only x/y are actually perturbed — the v and psi perturbations are
#     multiplied by 0 (cem_helper.py:359-360);
#   * mode sub-ensembles assemble via fixed-size jnp.where whose zero fill
#     duplicates row 0 of a mode when it draws fewer members than its
#     preset share (sizes int(p_i * n) with mode 1 absorbing the remainder,
#     cem.py:149-153).
# ---------------------------------------------------------------------------

GMM_INIT_PROBS = (0.4, 0.2, 0.4)
GMM_INIT_MU = ((0.5, 0.0, 0.5, 0.0),
               (0.5, -0.1, 0.9, 0.01),
               (-0.2, 0.1, 1.0, -0.015))
GMM_INIT_SIGMA = ((0.1, 0.1, 1.0, 0.1),
                  (0.02, 0.01, 0.8, 0.05),
                  (0.1, 0.01, 0.1, 0.01))


def gmm_noisy_init_state(idx_mpc, x_init, y_init, vx_init, vy_init,
                         n: int, probs=GMM_INIT_PROBS, mu=GMM_INIT_MU,
                         sigma=GMM_INIT_SIGMA):
    """n perturbed initial states from the 3-mode position GMM.

    Returns (x, y, vx, vy, psi), each (n,).  See the block comment above
    for the reference citation and the preserved quirks.
    """
    import jax

    probs_a = jnp.asarray(probs)
    mu_a = jnp.asarray(mu)          # (3, 4): [x, y, v, psi] per mode
    sigma_a = jnp.asarray(sigma)

    sizes = [int(float(p) * n) for p in probs]
    sizes[0] = n - (sizes[1] + sizes[2])       # mode 1 absorbs remainder

    key = jax.random.PRNGKey(idx_mpc)
    key, _ = jax.random.split(key)             # subkey unused (ref :319)
    eps = jax.random.multivariate_normal(key, jnp.zeros(4), jnp.eye(4), (n,))

    # per-mode affine transforms of the shared standard draw: (3, n, 4)
    per_mode = eps[None, :, :] * sigma_a[:, None, :] + mu_a[:, None, :]

    modes = jnp.asarray([1, 2, 3])
    weight_samples = jax.random.choice(key, modes, (n,), p=probs_a)
    parts = [per_mode[m][jnp.where(weight_samples == m + 1,
                                   size=sizes[m])[0]]
             for m in range(3)]
    eps_sel = jnp.concatenate(parts, axis=0)   # (n, 4)

    v_init = jnp.sqrt(vx_init ** 2 + vy_init ** 2)
    psi_init = jnp.arctan2(vy_init, vx_init)
    x = x_init + eps_sel[:, 0]
    y = y_init + eps_sel[:, 1]
    v = v_init + 0.0 * eps_sel[:, 2]           # ref zeroes these (:359-360)
    psi = psi_init + 0.0 * eps_sel[:, 3]
    return x, y, v * jnp.cos(psi), v * jnp.sin(psi), psi
