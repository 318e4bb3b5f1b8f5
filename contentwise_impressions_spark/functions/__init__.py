from .hashing import bucket_hash, deterministic_bucket
from .stats import gini_coefficient, shannon_entropy, herfindahl_index

__all__ = [
    "bucket_hash",
    "deterministic_bucket",
    "gini_coefficient",
    "shannon_entropy",
    "herfindahl_index",
]
