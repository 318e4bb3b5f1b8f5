from .search import (
    Categorical,
    Integer,
    Real,
    fit_with_early_stopping,
    latex_results,
    random_search,
    random_search_resumable,
    results_table,
)

__all__ = [
    "Categorical",
    "Integer",
    "Real",
    "random_search",
    "random_search_resumable",
    "fit_with_early_stopping",
    "results_table",
    "latex_results",
]
