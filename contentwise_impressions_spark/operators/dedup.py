"""Deduplication operators.

Reference analogs:
- key-subset dedup        — drop_duplicates(subset=[user,item]) at
  /root/reference/Utils/dataset.py:322-325,1129-1130.
- keep-last-by-timestamp  — sort + drop_duplicates(keep='last') at
  Data_manager/DataReader_utils.py:134-150.

Both shuffle on the dedup key — at 100 TB that is the minimal correct cost.
``dedup_exact`` lowers to a hash aggregate (map-side partial dedup first);
``keep_last_by_timestamp`` is a window over the same partitioning, with the
max-timestamp row kept deterministically (ties broken by a tag column when
provided).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_exact(df: DataFrame, keys: list[str]) -> DataFrame:
    """First-seen-agnostic exact dedup on a key subset.

    Note: like the reference's dask drop_duplicates, WHICH duplicate row
    survives is unspecified; use only when non-key columns are either
    dropped afterwards or functionally dependent on the keys.
    """
    return df.dropDuplicates(keys)


def keep_last_by_timestamp(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Keep, per key group, the row with the greatest timestamp.

    Reference: DataReader_utils.py:134-150 (sort_values then
    drop_duplicates(keep='last')).  Expressed as a row_number window so the
    survivor is deterministic; `tiebreak` columns disambiguate equal
    timestamps (the reference's behavior there was positional, i.e.
    undefined under parallel input).
    """
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
