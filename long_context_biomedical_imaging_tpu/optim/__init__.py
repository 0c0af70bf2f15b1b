from .optim_base import OptimManager, compute_total_updates

__all__ = ["OptimManager", "compute_total_updates"]
