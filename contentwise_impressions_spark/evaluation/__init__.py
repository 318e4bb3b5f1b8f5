from .metrics import ranking_metrics

__all__ = ["ranking_metrics"]
