"""Configuration surface for the TPU-native MPC-MMD engine.

One frozen-dataclass pytree replaces the reference's scattered constants
(hard-coded throughout ``synthetic_static_obs/optimizer/cem.py:20-199`` and
argparse CLIs duplicated across every entry script).  Every config object is
hashable so it can be a static argument under ``jax.jit``.

Numeric defaults reproduce the reference's "config surface"
(see SURVEY.md §2.5; sources cited per field).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Tuple


# ---------------------------------------------------------------------------
# Enums-as-strings (kept as plain strings so configs stay trivially hashable
# and serializable; validated at construction time).
# ---------------------------------------------------------------------------

RISK_MODES = ("mmd_opt", "mmd_random", "cvar", "saa", "det")
NOISE_KINDS = ("gaussian", "beta")


@dataclass(frozen=True)
class HorizonConfig:
    """Planning horizon.  Ref: synthetic_static_obs/optimizer/cem.py:37-52."""

    t_fin: float = 15.0          # total horizon in seconds
    num: int = 100               # trajectory samples over t_fin
    num_prime: int = 50          # rollout / risk-evaluation sub-horizon
    order: int = 10              # Bernstein polynomial order  (cem.py:46)

    @property
    def dt(self) -> float:
        return self.t_fin / self.num

    @property
    def nvar(self) -> int:
        return self.order + 1


@dataclass(frozen=True)
class VehicleConfig:
    """Bicycle-model limits.  Ref: synthetic_static_obs/optimizer/cem.py:24-35."""

    wheel_base: float = 2.5
    v_min: float = 0.1
    v_max: float = 30.0
    a_max: float = 18.0
    steer_max: float = 0.6
    steer_rate_max: float = 0.6
    kappa_max: float = 0.230
    a_centr: float = 1.5


@dataclass(frozen=True)
class ObstacleConfig:
    """Elliptical obstacle footprint.  Ref: cem.py:25,28-29."""

    num_obs: int = 6
    a_obs: float = 4.25
    b_obs: float = 2.75
    num_circles: int = 1


@dataclass(frozen=True)
class LaneConfig:
    """Lane geometry.  Ref: cem.py:155-156 (static values)."""

    y_lb: float = -2.25
    y_ub: float = 2.25
    y_des_1: float = -1.75
    y_des_2: float = 1.75
    gamma: float = 1.0           # lane-bound discount      (cem.py:123)
    gamma_lane_des: float = 0.3  # desired-lane margin      (cem.py:171)


@dataclass(frozen=True)
class GuessConfig:
    """Behavioral-parameter -> trajectory "guess" QP.

    Ref: cem.py:77-112 and cem_helper.py:169-230.
    """

    k_p_v: float = 2.0
    k_p: float = 2.0
    rho_v: float = 1.0
    rho_offset: float = 1.0
    weight_smoothness_x: float = 100.0
    weight_smoothness_y: float = 100.0
    num_segments: int = 4        # horizon split into segments (cem.py:97-112)


@dataclass(frozen=True)
class ProjectionConfig:
    """Alternating-minimization feasibility projection.

    Ref: cem.py:69-75,88,123-124 and optimizer/projection.py.
    """

    maxiter: int = 1             # AM iterations per CEM iter (cem.py:88)
    rho_ineq: float = 1.0
    rho_obs: float = 1.0
    rho_projection: float = 1.0
    rho_lane: float = 1.0
    gamma: float = 1.0
    gamma_obs: float = 1.0
    # 'det' baseline activates the obstacle penalty rows in the x/y QPs
    # (carla/optimizer/projection_det.py vs projection.py); the stochastic
    # variant drops them and handles obstacles purely through the risk cost.
    with_obstacle_terms: bool = False


@dataclass(frozen=True)
class CEMOuterConfig:
    """Outer CEM over behavioral parameters.  Ref: cem.py:88-121,136-140."""

    num_batch: int = 100
    ellite_num: int = 5
    ellite_num_cost: int = 20
    maxiter_cem: int = 20
    alpha_mean: float = 0.6
    alpha_cov: float = 0.6
    lamda: float = 0.9
    cov_jitter: float = 0.01     # cem_helper.py:290
    num_params: int = 8          # 4 desired velocities + 4 desired offsets


@dataclass(frozen=True)
class BetaCEMConfig:
    """Inner CEM for reduced-set (beta) selection.  Ref: compute_beta.py:8-37."""

    num_samples_cem: int = 100
    maxiter: int = 20
    ellite_frac: float = 0.1     # num_ellite = max(int(0.1*N)+1, 3)
    init_cov_scale: float = 20.0
    cov_jitter: float = 0.05
    sigma_clip: float = 0.01
    rho_beta: float = 1.0
    qp_reg: float = 0.05         # compute_beta.py:72

    @property
    def num_ellite(self) -> int:
        return max(int(self.ellite_frac * self.num_samples_cem) + 1, 3)


@dataclass(frozen=True)
class NoiseConfig:
    """Stochastic control-noise model.  Ref: cem_helper.py:402-443, cem.py:24,168-169."""

    kind: str = "gaussian"       # "gaussian" | "beta"
    level: float = 0.1           # sigma_acc == sigma_steer == noise_level
    acc_const: float = 0.0       # additive const noise scale (same draw for acc+steer!)
    steer_const: float = 0.0
    beta_a: float = 2.0
    beta_b: float = 5.0
    k_steer: float = 0.01        # 0.01 static / 0.05 dynamic (cem_helper.py:24)

    def __post_init__(self):
        if self.kind not in NOISE_KINDS:
            raise ValueError(f"noise kind must be one of {NOISE_KINDS}, got {self.kind!r}")


@dataclass(frozen=True)
class RiskConfig:
    """Risk-cost family and weights.  Ref: cem.py:142-143,158-166."""

    mode: str = "mmd_opt"        # "mmd_opt" | "mmd_random" | "cvar" | "saa" | "det"
    num_reduced: int = 10        # reduced-set size; num_mother = num_reduced**2
    ker_wt: float = 1000.0
    sigma_ker: float = 10.0
    alpha_quant: float = 0.98
    alpha_quant_lane: float = 0.98
    weight_mmd_lane: float = 0.0
    weight_mmd_obs: float = 1.0e3
    weight_cvar_lane: float = 0.0
    weight_cvar_obs: float = 1.0e3
    weight_saa_lane: float = 1.0e6
    weight_saa_obs: float = 1.0e6
    # desired-lane risk (zero in every reference config; carla cem.py:172-176)
    weight_lane_des: float = 0.0
    # MMD kernel family.  The reference ships gaussian and matern52
    # commented out (synthetic_static_obs/kernel_computation.py:21-53);
    # here they are config-reachable: kernels.kernel_of evaluates the
    # chosen kind from the cached distance matrices in reduced_set.py and
    # from the scalar violation distances in risk.py/kernels.mmd_vs_zero.
    kernel: str = "laplace"      # "laplace" | "gaussian" | "matern52"

    def __post_init__(self):
        if self.mode not in RISK_MODES:
            raise ValueError(f"risk mode must be one of {RISK_MODES}, got {self.mode!r}")
        from .kernels import KERNEL_KINDS
        if self.kernel not in KERNEL_KINDS:
            raise ValueError(f"kernel must be one of {KERNEL_KINDS}, "
                             f"got {self.kernel!r}")

    @property
    def num_mother(self) -> int:
        return self.num_reduced ** 2

    def weights(self) -> Tuple[float, float]:
        """(lane_weight, obs_weight) for the active mode."""
        return {
            "mmd_opt": (self.weight_mmd_lane, self.weight_mmd_obs),
            "mmd_random": (self.weight_mmd_lane, self.weight_mmd_obs),
            "cvar": (self.weight_cvar_lane, self.weight_cvar_obs),
            "saa": (self.weight_saa_lane, self.weight_saa_obs),
            "det": (0.0, 0.0),
        }[self.mode]


@dataclass(frozen=True)
class FrenetVariantConfig:
    """On-road (CARLA-equivalent) variant parameters.

    Ref: carla/optimizer/cem.py:146-153 (init-state perturbation),
    carla/optimizer/cem_helper.py:115,543-553 (path window, centripetal and
    desired-lane cost weights), carla/main_carla.py:322-323 (control = mean
    of the first num_mean_update steps).
    """

    init_mu: Tuple[float, float] = (0.3, 0.0)
    init_sigma: Tuple[float, float] = (0.05, 0.1)
    num_path: int = 600
    lookahead: float = 300.0
    smooth_threshold: float = 0.1
    weight_des_lane: float = 0.01
    weight_centr: float = 0.1
    num_mean_update: int = 4


@dataclass(frozen=True)
class ProblemConfig:
    """Top-level static configuration of one risk-aware MPC problem."""

    horizon: HorizonConfig = HorizonConfig()
    vehicle: VehicleConfig = VehicleConfig()
    obstacles: ObstacleConfig = ObstacleConfig()
    lane: LaneConfig = LaneConfig()
    guess: GuessConfig = GuessConfig()
    projection: ProjectionConfig = ProjectionConfig()
    cem: CEMOuterConfig = CEMOuterConfig()
    beta_cem: BetaCEMConfig = BetaCEMConfig()
    noise: NoiseConfig = NoiseConfig()
    risk: RiskConfig = RiskConfig()
    frenet: FrenetVariantConfig = FrenetVariantConfig()
    # Numerical strategy: "exact" re-solves KKT systems like the reference
    # (jnp.linalg.solve); "prefactored" bakes the constant KKT inverses in at
    # setup (host float64) and turns every solve into an MXU matmul.
    solve_strategy: str = "prefactored"
    # Rollout backend: "auto" resolves to the flat-lane lax.scan (XLA:TPU
    # compiles it to one fused on-chip loop — measured 50x the Pallas
    # rollout kernel at production shape, micro_rollout_block.py);
    # "scan" / "pallas" force one.
    rollout_backend: str = "auto"
    # MXU matmul precision for every dot/einsum in the solve ("default" |
    # "high" | "highest").  On TPU "default" runs f32 contractions as
    # single-pass bf16 with f32 accumulation — measured 17% faster than
    # "highest" at the baseline config with statistically equivalent solve
    # quality (the candidate flips it causes are the documented
    # argsort-tie behavior; final MMD residuals match within the normal
    # seed-to-seed band).  Pin "highest" for f32-exact contractions, e.g.
    # when comparing TPU traces against the CPU/reference pipeline.
    matmul_precision: str = "default"

    def replace(self, **kw) -> "ProblemConfig":
        return dataclasses.replace(self, **kw)

    def with_risk_mode(self, mode: str) -> "ProblemConfig":
        return self.replace(risk=dataclasses.replace(self.risk, mode=mode))


# ---------------------------------------------------------------------------
# Canonical workload presets (the reference's three workload directories
# collapse to configs; Appendix A of SURVEY.md lists the deltas).
# ---------------------------------------------------------------------------

def static_workload(num_reduced: int = 10, num_obs: int = 6, noise: str = "gaussian",
                    noise_level: float = 0.1, num_prime: int = 50,
                    mode: str = "mmd_opt", acc_const_noise: float = 0.0,
                    steer_const_noise: float = 0.0) -> ProblemConfig:
    """synthetic_static_obs equivalent (lane band ±2.25, K_steer=0.01)."""
    return ProblemConfig(
        horizon=HorizonConfig(num_prime=num_prime),
        obstacles=ObstacleConfig(num_obs=num_obs),
        noise=NoiseConfig(kind=noise, level=noise_level, k_steer=0.01,
                          acc_const=acc_const_noise, steer_const=steer_const_noise),
        risk=RiskConfig(mode=mode, num_reduced=num_reduced),
    )


# The certified real-time inner-CEM operating point (VERDICT r2 item 1).
# The reference's S=100 samples x 20 iterations (compute_beta.py:14-15) is a
# tuning constant, not spec, and the inner CEM is 87% of solve latency.
# Measured on v5e-lite (benchmarks/realtime_sweep.py): 64x12 runs
# p50/p99 = 101/105 ms blocking (77 ms device) vs 184/235 ms (159 ms
# device) for the default — inside the 0.15 s CARLA-loop budget
# (carla_simulation.py:25) with margin even through the axon relay.
# Quality: no significant difference vs the default budget on the
# discriminating acceptance cells (paired Wilcoxon p=0.43 on intersected
# scenarios, CI95 [-1.75%, +2.51%] collision diff; artifacts/realtime/).
REALTIME_INNER_BUDGET = (64, 12)


def realtime_workload(num_reduced: int = 10, num_obs: int = 6,
                      noise: str = "gaussian", noise_level: float = 0.1,
                      num_prime: int = 50, mode: str = "mmd_opt",
                      acc_const_noise: float = 0.0,
                      steer_const_noise: float = 0.0) -> ProblemConfig:
    """static_workload at the real-time inner-CEM budget (see
    REALTIME_INNER_BUDGET)."""
    cfg = static_workload(num_reduced=num_reduced, num_obs=num_obs,
                          noise=noise, noise_level=noise_level,
                          num_prime=num_prime, mode=mode,
                          acc_const_noise=acc_const_noise,
                          steer_const_noise=steer_const_noise)
    S, it = REALTIME_INNER_BUDGET
    return cfg.replace(beta_cem=dataclasses.replace(
        cfg.beta_cem, num_samples_cem=S, maxiter=it))


# The certified fast OUTER-CEM operating point (VERDICT r3 item 2).  The
# reference's num_batch=100 x maxiter_cem=20 (synthetic_static_obs/optimizer/
# cem.py:88-89,137-140) is a tuning constant, not spec — the same class the
# realtime cert traded on the inner loop.  Measured on v5e-lite
# (artifacts/fast/outer_grid.jsonl): B=64 x 12 iterations runs 18.5 solves/s
# p50/p99 = 75/76 ms blocking (54 ms device) vs 6.3 solves/s 182/184 ms for
# the default — a 2.9x throughput gain.  Quality (artifacts/fast/pooled.json,
# paired MC validation over the two noise-heaviest beta N=5 cells, pooled
# n=279): the fast budget is significantly SAFER than the default —
# collision-rate difference −3.04 pp, CI95 [−4.58, −1.47], Wilcoxon p=1.7e−5
# (the default's extra iterations over-converge the sampling distribution
# onto finite-sample risk-estimate noise; 64x14 shows the same sign at
# −2.04 pp, p=0.0016).  A >2.5 pp regression is excluded with margin.
FAST_OUTER_BUDGET = (64, 12)


def fast_workload(num_reduced: int = 10, num_obs: int = 6,
                  noise: str = "gaussian", noise_level: float = 0.1,
                  num_prime: int = 50, mode: str = "mmd_opt",
                  acc_const_noise: float = 0.0,
                  steer_const_noise: float = 0.0) -> ProblemConfig:
    """static_workload at the certified fast outer-CEM budget (see
    FAST_OUTER_BUDGET).  Inner-CEM budget stays at the reference default;
    stack realtime_workload's inner budget on top for the combined point
    (certified as quality-neutral, CI95 [−3.03, +0.59] pp)."""
    cfg = static_workload(num_reduced=num_reduced, num_obs=num_obs,
                          noise=noise, noise_level=noise_level,
                          num_prime=num_prime, mode=mode,
                          acc_const_noise=acc_const_noise,
                          steer_const_noise=steer_const_noise)
    B, it = FAST_OUTER_BUDGET
    return cfg.replace(cem=dataclasses.replace(
        cfg.cem, num_batch=B, maxiter_cem=it))


# The certified COMBINED operating point: fast outer budget pushed one step
# further down the grid (B=64 x maxiter_cem=10) stacked on the realtime
# inner-CEM budget (S=64 x 12).  Measured on v5e-lite
# (artifacts/fast/outer_grid.jsonl): 36.2 solves/s, p50/p99 = 52/58 ms
# blocking, 27.7 ms device — 5.7x the reference-budget rate.  Quality
# (artifacts/fast/pooled.json, same 600-config/cell paired MC protocol,
# pooled n=279): significantly SAFER than the reference budget —
# collision-rate difference −2.42 pp, CI95 [−4.03, −0.81], Wilcoxon
# p=7e−4, the favorable sign holding in both cells individually (beta 0.2
# p=0.026, beta 0.3 p=0.0098).  A >2.5 pp regression is excluded.
FASTRT_OUTER_BUDGET = (64, 10)


def fastrt_workload(num_reduced: int = 10, num_obs: int = 6,
                    noise: str = "gaussian", noise_level: float = 0.1,
                    num_prime: int = 50, mode: str = "mmd_opt",
                    acc_const_noise: float = 0.0,
                    steer_const_noise: float = 0.0) -> ProblemConfig:
    """static_workload at the certified combined budget: outer CEM at
    FASTRT_OUTER_BUDGET (64x10) + inner beta-CEM at REALTIME_INNER_BUDGET
    (64x12) — the fastest certified arm (cert label ``fastrt64x10``)."""
    cfg = static_workload(num_reduced=num_reduced, num_obs=num_obs,
                          noise=noise, noise_level=noise_level,
                          num_prime=num_prime, mode=mode,
                          acc_const_noise=acc_const_noise,
                          steer_const_noise=steer_const_noise)
    B, it_o = FASTRT_OUTER_BUDGET
    S, it_i = REALTIME_INNER_BUDGET
    return cfg.replace(
        cem=dataclasses.replace(cfg.cem, num_batch=B, maxiter_cem=it_o),
        beta_cem=dataclasses.replace(cfg.beta_cem, num_samples_cem=S,
                                     maxiter=it_i))


def dynamic_workload(num_reduced: int = 10, num_obs: int = 6, noise: str = "beta",
                     noise_level: float = 0.3, num_prime: int = 50,
                     mode: str = "mmd_opt", acc_const_noise: float = 0.0,
                     steer_const_noise: float = 0.0) -> ProblemConfig:
    """synthetic_dynamic_obs equivalent: lane band (-2.25,-1.25), K_steer=0.05.

    Ref deltas: synthetic_dynamic_obs/optimizer/cem.py:155 and cem_helper.py:24.
    """
    return ProblemConfig(
        horizon=HorizonConfig(num_prime=num_prime),
        obstacles=ObstacleConfig(num_obs=num_obs),
        lane=LaneConfig(y_lb=-2.25, y_ub=-1.25),
        noise=NoiseConfig(kind=noise, level=noise_level, k_steer=0.05,
                          acc_const=acc_const_noise, steer_const=steer_const_noise),
        risk=RiskConfig(mode=mode, num_reduced=num_reduced),
    )


def onroad_workload(num_reduced: int = 4, num_obs: int = 4, noise: str = "gaussian",
                    noise_level: float = 0.1, num_prime: int = 50,
                    mode: str = "mmd_opt", right_hand_lanes: bool = True,
                    acc_const_noise: float = 0.0,
                    steer_const_noise: float = 0.0) -> ProblemConfig:
    """CARLA-equivalent on-road closed-loop workload.

    Ref deltas: carla/optimizer/cem.py:26-36 (vehicle: wheel_base 2.875,
    a_obs 4.5/3.0), :161-176 (risk weights: mmd obs 0.1 / lane 0.01,
    cvar 100/25, saa 1000), :163-167 (town-dependent lane band), and the
    unscaled beta steer noise (carla cem_helper has no K_steer).
    """
    lane = (LaneConfig(y_lb=-0.3, y_ub=3.8, y_des_1=0.0, y_des_2=3.5)
            if right_hand_lanes else
            LaneConfig(y_lb=-3.8, y_ub=0.3, y_des_1=0.0, y_des_2=-3.5))
    return ProblemConfig(
        horizon=HorizonConfig(num_prime=num_prime),
        vehicle=VehicleConfig(wheel_base=2.875),
        obstacles=ObstacleConfig(num_obs=num_obs, a_obs=4.5, b_obs=3.0),
        lane=lane,
        noise=NoiseConfig(kind=noise, level=noise_level, k_steer=1.0,
                          acc_const=acc_const_noise, steer_const=steer_const_noise),
        risk=RiskConfig(mode=mode, num_reduced=num_reduced,
                        weight_mmd_lane=0.01, weight_mmd_obs=0.1,
                        weight_cvar_lane=25.0, weight_cvar_obs=100.0,
                        weight_saa_lane=1000.0, weight_saa_obs=1000.0,
                        sigma_ker=1.0e-2),
    )
