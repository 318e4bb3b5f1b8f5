"""Inequality / concentration statistics as single-pass DataFrame aggregates.

Reference implementations:
- Gini coefficient   — /root/reference/Utils/gini.py:8-28 (sorted-array
  formula ``sum((2i-n-1)*x) / (n*sum x)``) and the diversity variant at
  Base/Evaluation/metrics.py:426-442.
- Shannon entropy    — Base/Evaluation/metrics.py:515-530.
- Herfindahl index   — Base/Evaluation/metrics.py:472-479.

Each takes a DataFrame of per-entity counts/values and returns a 1-row
DataFrame.  The Gini's sorted-index sum is tie-decomposed: for rows with
equal x the index sum is a closed form of (count, count-of-smaller), so the
prefix window runs over DISTINCT values — for integer activity counts that
is orders of magnitude smaller than the row count (Zipf data collapses to
few distinct levels), instead of a global per-row sort.  The other two are
plain partial-aggregable sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gini_coefficient(df: DataFrame, value_col: str, out_col: str = "gini") -> DataFrame:
    """Exact Gini via the sorted-index formula (Utils/gini.py:8-28).

    gini = (sum(2*i*x_i) - (n+1)*sum(x)) / (n * sum(x)), x ascending, i in 1..n.

    Ties make the per-row rank arbitrary but the SUM tie-invariant: rows
    sharing value x occupy ranks (cl+1 .. cl+c) where cl = #rows with
    smaller x, so sum(i over the tie block) = c*cl + c*(c+1)/2.  The
    global window therefore runs over distinct x only (prefix count),
    never a per-row sort — same exact result.
    """
    xs = df.select(F.col(value_col).cast("double").alias("x"))
    grouped = xs.groupBy("x").agg(F.count("*").cast("double").alias("c"))
    w = Window.orderBy(F.col("x").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    with_prefix = grouped.withColumn(
        "cl", F.coalesce(F.sum("c").over(w), F.lit(0.0))
    )
    agg = with_prefix.agg(
        F.sum(F.col("x") * F.col("c")).alias("sx"),
        F.sum("c").alias("n"),
        F.sum(
            2.0
            * F.col("x")
            * (F.col("c") * F.col("cl") + F.col("c") * (F.col("c") + 1) / 2.0)
        ).alias("sxw"),
    )
    return agg.select(
        (
            (F.col("sxw") - (F.col("n") + 1) * F.col("sx"))
            / (F.col("n") * F.col("sx"))
        ).alias(out_col)
    )


def shannon_entropy(df: DataFrame, count_col: str, out_col: str = "entropy") -> DataFrame:
    """H = -sum(p * log2 p) over p = count/total (metrics.py:515-530)."""
    agg = df.agg(
        F.sum(F.col(count_col).cast("double")).alias("total"),
        F.sum(
            F.col(count_col).cast("double") * F.log2(F.col(count_col).cast("double"))
        ).alias("clogc"),
    )
    # -sum(c/T * log2(c/T)) = log2(T) - sum(c*log2 c)/T
    return agg.select(
        (F.log2(F.col("total")) - F.col("clogc") / F.col("total")).alias(out_col)
    )


def herfindahl_index(df: DataFrame, count_col: str, out_col: str = "herfindahl") -> DataFrame:
    """1 - sum(p^2) (metrics.py:472-479)."""
    agg = df.agg(
        F.sum(F.col(count_col).cast("double")).alias("total"),
        F.sum(F.pow(F.col(count_col).cast("double"), 2)).alias("sq"),
    )
    return agg.select(
        (F.lit(1.0) - F.col("sq") / F.pow(F.col("total"), 2)).alias(out_col)
    )
