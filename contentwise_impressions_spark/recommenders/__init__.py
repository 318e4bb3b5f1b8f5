from .graph import p3alpha_similarity, rp3beta_similarity
from .nonpersonalized import global_effects, item_popularity

__all__ = [
    "p3alpha_similarity",
    "rp3beta_similarity",
    "global_effects",
    "item_popularity",
]
