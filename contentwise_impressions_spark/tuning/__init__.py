from .search import (
    Categorical,
    Integer,
    Real,
    fit_with_early_stopping,
    random_search,
    results_table,
)

__all__ = [
    "Categorical",
    "Integer",
    "Real",
    "random_search",
    "fit_with_early_stopping",
    "results_table",
]
