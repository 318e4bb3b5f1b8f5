from .dedup import dedup_exact, keep_last_by_timestamp
from .splits import deterministic_split, leave_last_out, min_activity_filter
from .topk import top_k_global, top_k_per_group

__all__ = [
    "dedup_exact",
    "keep_last_by_timestamp",
    "deterministic_split",
    "leave_last_out",
    "min_activity_filter",
    "top_k_global",
    "top_k_per_group",
]
