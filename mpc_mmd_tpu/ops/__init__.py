from .rollout_pallas import fused_rollout, pallas_available

__all__ = ["fused_rollout", "pallas_available"]
