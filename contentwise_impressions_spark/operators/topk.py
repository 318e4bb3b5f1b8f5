"""Top-K operators.

Reference analogs (SURVEY.md §2.5):
- nlargest global top-N          — Utils/dataset.py:1186-1187,1587-1591
- batch per-user top-K ranking   — Base/BaseRecommender.py:175-213
  (argpartition + sort over dense score rows)
- per-column similarity top-K    — Base/Recommender_utils.py:55-122

Physical notes: ``top_k_global`` lowers to TakeOrderedAndProject (no full
sort, per-partition heaps + driver merge — the argpartition analog).
``top_k_per_group`` is a row_number window: one shuffle on the group key,
sort bounded per group.  Ties are ALWAYS broken by explicit tiebreak columns
so results are engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_global(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """Global top-k by the given order → TakeOrderedAndProject."""
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order: list[Column],
    k: int,
    rank_col: str | None = "rank",
) -> DataFrame:
    """Top-k rows per group, rank attached (1-based) unless rank_col=None."""
    w = Window.partitionBy(*group_cols).orderBy(*order)
    out = df.withColumn("_rank", F.row_number().over(w)).filter(F.col("_rank") <= k)
    if rank_col is None:
        return out.drop("_rank")
    return out.withColumnRenamed("_rank", rank_col)
