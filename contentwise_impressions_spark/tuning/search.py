"""Hyperparameter search driver + early stopping + results gathering.

Reference (SURVEY.md §2.10):
- SearchBayesianSkopt — ParameterTuning/SearchBayesianSkopt.py:21-271:
  50 cases / 15 random starts of gp_minimize over Real/Integer/Categorical
  spaces, objective = validation MAP@cutoff, metadata + best model saved,
  optional refit on train+validation scored on test
  (run_parameter_search.py:263-268,679-684).
- Early stopping — Base/Incremental_Training_Early_Stopping.py:91-262:
  validate every N epochs, keep best, stop after K non-improving rounds.
- Results gathering — run_results_gathering.py / Utils/ResultFolderLoader.

skopt isn't available in this environment, so the search strategy is seeded
random search over the same space vocabulary (the reference's own first 15
evaluations are exactly this); the TRIAL LOOP structure — each case = one
Spark fit job + one evaluation job, driver-side state only — is the part
that transfers to gp_minimize unchanged.  Trials are independent Spark
jobs, so a ThreadPool can overlap them (scheduler pools), mirroring the
reference's process-pool KNN sweep (run_parameter_search.py:470-475).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Callable

import numpy as np
import pandas as pd


@dataclass(frozen=True)
class Real:
    low: float
    high: float
    prior: str = "uniform"  # or "log-uniform"


@dataclass(frozen=True)
class Integer:
    low: int
    high: int


@dataclass(frozen=True)
class Categorical:
    choices: tuple


def _sample(space: dict[str, Any], rng: np.random.Generator) -> dict[str, Any]:
    out = {}
    for name, dim in space.items():
        if isinstance(dim, Real):
            if dim.prior == "log-uniform":
                out[name] = float(
                    np.exp(rng.uniform(np.log(dim.low), np.log(dim.high)))
                )
            else:
                out[name] = float(rng.uniform(dim.low, dim.high))
        elif isinstance(dim, Integer):
            out[name] = int(rng.integers(dim.low, dim.high + 1))
        elif isinstance(dim, Categorical):
            out[name] = dim.choices[rng.integers(0, len(dim.choices))]
        else:
            raise TypeError(f"unknown dimension type for {name}: {dim!r}")
    return out


def random_search(
    space: dict[str, Any],
    objective: Callable[[dict[str, Any]], float],
    n_cases: int = 15,
    seed: int = 42,
    maximize: bool = True,
) -> tuple[dict[str, Any], pd.DataFrame]:
    """Seeded random search; returns (best_params, history).

    `objective(params) -> metric` runs one trial (fit + evaluate as Spark
    jobs).  History mirrors the reference's search metadata: params,
    metric, wall-clock per case, best-so-far flag.
    """
    rng = np.random.default_rng(seed)
    rows = []
    best_metric, best_params = None, None
    for case in range(n_cases):
        params = _sample(space, rng)
        t0 = time.perf_counter()
        metric = float(objective(params))
        elapsed = time.perf_counter() - t0
        better = (
            best_metric is None
            or (metric > best_metric if maximize else metric < best_metric)
        )
        if better:
            best_metric, best_params = metric, params
        rows.append(
            {
                "case": case,
                **{f"param_{k}": v for k, v in params.items()},
                "metric": metric,
                "train_eval_sec": round(elapsed, 3),
                "is_best": better,
            }
        )
    return best_params, pd.DataFrame(rows)


def fit_with_early_stopping(
    run_epochs: Callable[[int], None],
    evaluate: Callable[[], float],
    snapshot: Callable[[], Any],
    max_epochs: int = 100,
    validate_every: int = 5,
    patience: int = 5,
    maximize: bool = True,
) -> tuple[Any, int, float]:
    """The reference's early-stopping contract
    (Incremental_Training_Early_Stopping.py:91-262): train
    `validate_every` epochs at a time, keep the best snapshot, stop after
    `patience` non-improving validations.  Returns (best_model,
    best_epoch, best_metric)."""
    best, best_epoch, best_metric = None, 0, None
    worse = 0
    epoch = 0
    while epoch < max_epochs:
        step = min(validate_every, max_epochs - epoch)
        run_epochs(step)
        epoch += step
        metric = float(evaluate())
        if best_metric is None or (
            metric > best_metric if maximize else metric < best_metric
        ):
            best, best_epoch, best_metric = snapshot(), epoch, metric
            worse = 0
        else:
            worse += 1
            if worse >= patience:
                break
    return best, best_epoch, best_metric


def results_table(histories: dict[str, pd.DataFrame]) -> pd.DataFrame:
    """Gather per-algorithm search histories into the summary table the
    reference renders to LaTeX (ResultFolderLoader.py:482-860): best
    metric, best params, total search time per algorithm."""
    rows = []
    for algo, hist in histories.items():
        best = hist.loc[hist["metric"].idxmax()]
        rows.append(
            {
                "algorithm": algo,
                "best_metric": best["metric"],
                "n_cases": len(hist),
                "search_sec": hist["train_eval_sec"].sum(),
                **{
                    k.replace("param_", ""): v
                    for k, v in best.items()
                    if k.startswith("param_")
                },
            }
        )
    return pd.DataFrame(rows)


def random_search_resumable(
    space: dict[str, Any],
    objective: Callable[[dict[str, Any]], float],
    history_path: str,
    n_cases: int = 15,
    seed: int = 42,
    maximize: bool = True,
) -> tuple[dict[str, Any], pd.DataFrame]:
    """Resumable search: completed cases are replayed from the persisted
    history instead of re-running their trials.

    Reference: SearchBayesianSkopt.py:72-130 reloads the metadata zip and
    replays evaluated configs on restart.  Sampling is seeded, so case k
    always receives the same params — the history only needs (case,
    metric); params are re-derived, keeping the artifact engine-agnostic.
    """
    import os

    done: dict[int, float] = {}
    if os.path.exists(history_path):
        prev = pd.read_parquet(history_path)
        done = dict(zip(prev["case"].astype(int), prev["metric"].astype(float)))

    rng = np.random.default_rng(seed)
    rows = []
    best_metric, best_params = None, None
    for case in range(n_cases):
        params = _sample(space, rng)  # same stream → same params per case
        if case in done:
            metric, elapsed, resumed = done[case], 0.0, True
        else:
            t0 = time.perf_counter()
            metric = float(objective(params))
            elapsed = time.perf_counter() - t0
            resumed = False
        better = (
            best_metric is None
            or (metric > best_metric if maximize else metric < best_metric)
        )
        if better:
            best_metric, best_params = metric, params
        rows.append(
            {
                "case": case,
                **{f"param_{k}": v for k, v in params.items()},
                "metric": metric,
                "train_eval_sec": round(elapsed, 3),
                "is_best": better,
                "resumed": resumed,
            }
        )
        pd.DataFrame(rows).to_parquet(history_path, index=False)
    return best_params, pd.DataFrame(rows)


def latex_results(
    table: pd.DataFrame,
    caption: str = "Hyperparameter search results",
    float_fmt: str = "{:.4f}",
) -> str:
    """Render the results table as a LaTeX tabular — the
    run_results_gathering.py artifact (ResultFolderLoader.py:482-860
    writes accuracy / beyond-accuracy / time / hyperparameter tables).
    Hand-rolled (the reference hand-assembles its LaTeX too), so there is
    no template-engine dependency."""

    def fmt(v: Any) -> str:
        if isinstance(v, float):
            return float_fmt.format(v)
        return str(v).replace("_", r"\_")

    cols = list(table.columns)
    lines = [
        r"\begin{table}[t]",
        r"\centering",
        rf"\caption{{{caption}}}",
        r"\begin{tabular}{l" + "r" * (len(cols) - 1) + "}",
        r"\toprule",
        " & ".join(fmt(c) for c in cols) + r" \\",
        r"\midrule",
    ]
    for _, row in table.iterrows():
        lines.append(" & ".join(fmt(v) for v in row.tolist()) + r" \\")
    lines += [r"\bottomrule", r"\end{tabular}", r"\end{table}"]
    return "\n".join(lines)
