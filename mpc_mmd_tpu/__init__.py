"""mpc_mmd_tpu — a TPU-native risk-aware MPC / trajectory-optimization engine.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
MPC-MMD reference (Basant1861/MPC-MMD): batch-CEM trajectory optimization
over Bernstein-polynomial trajectories with alternating-minimization
feasibility projection, stochastic control-noise rollouts, and
MMD / CVaR / SAA risk costs with optimized reduced-set selection.
"""

from .config import (BetaCEMConfig, CEMOuterConfig, GuessConfig, HorizonConfig,
                     LaneConfig, NoiseConfig, ObstacleConfig, ProblemConfig,
                     ProjectionConfig, RiskConfig, VehicleConfig,
                     dynamic_workload, fast_workload, fastrt_workload,
                     realtime_workload, static_workload)
from .qp import Workspace, build_workspace
from .solver import SolveResult, Solver

__all__ = [
    "BetaCEMConfig", "CEMOuterConfig", "GuessConfig", "HorizonConfig",
    "LaneConfig", "NoiseConfig", "ObstacleConfig", "ProblemConfig",
    "ProjectionConfig", "RiskConfig", "VehicleConfig",
    "dynamic_workload", "fast_workload", "fastrt_workload",
    "realtime_workload", "static_workload",
    "Workspace", "build_workspace", "SolveResult", "Solver",
]

__version__ = "0.1.0"
