from .metrics import METRICS, Metrics

__all__ = ["METRICS", "Metrics"]
