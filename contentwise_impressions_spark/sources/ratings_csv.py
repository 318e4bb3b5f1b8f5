"""Generic ratings-file loader: CSV/`::`-separated → canonical URM triples.

Reference: Data_manager/DataReader_utils.py:96-170 (load_CSV_into_SparseBuilder):
reads (user, item, rating[, timestamp]) text files with arbitrary
separators, optionally drops duplicate (user, item) pairs keeping the
LAST by timestamp, and maps original string ids to contiguous indices via
IncrementalSparseMatrix's auto-mappers.

Spark shape: spark.read.csv (custom `sep` covers Movielens' `::`) →
keep-last window dedup → dense_rank ID mappers persisted as DataFrames —
the relational form of the reference's token→index dicts.  The per-corpus
Dataset readers (Movielens*/NetflixPrize/... — Data_manager/<name>/)
are this loader plus per-corpus column conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import keep_last_by_timestamp


def load_ratings_csv(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    header: bool = False,
    user_col: int = 0,
    item_col: int = 1,
    rating_col: int = 2,
    ts_col: int | None = 3,
    keep_last_by_ts: bool = True,
) -> DataFrame:
    """Read a ratings file → (user_token, item_token, rating, ts).

    Multi-char separators like Movielens' ``::`` are supported natively by
    Spark's CSV reader (sep can be multi-character).
    """
    df = spark.read.csv(path, sep=sep, header=header, inferSchema=False)
    cols = df.columns
    # try_cast, not cast: classic CSV-loader tolerance (malformed numerics
    # null-fill instead of failing the scan) — under Spark 4's default
    # ANSI mode a plain cast would abort the job on the first bad field
    out = df.select(
        F.col(cols[user_col]).alias("user_token"),
        F.col(cols[item_col]).alias("item_token"),
        F.col(cols[rating_col]).try_cast("double").alias("rating"),
        *(
            [F.col(cols[ts_col]).try_cast("bigint").alias("ts")]
            if ts_col is not None and ts_col < len(cols)
            else [F.lit(0).cast("bigint").alias("ts")]
        ),
    )
    if keep_last_by_ts:
        out = keep_last_by_timestamp(
            out, ["user_token", "item_token"], "ts", tiebreak=["rating"]
        )
    return out


def build_id_mapper(df: DataFrame, token_col: str, id_col: str) -> DataFrame:
    """token → contiguous 0-based index, ordered by token.

    The relational IncrementalSparseMatrix auto-mapper
    (Data_manager/IncrementalSparseMatrix.py:12-128): ids in sorted-token
    order = deterministic, reproducible mapping; the mapper TABLE is the
    artifact other stages join against (persist it next to the split
    parquet).  Ranks come from the two-phase distributed ranker
    (operators/neardup.distributed_ordered_ids) so a 10^9-token corpus
    never funnels through one global-window task.
    """
    from ..operators.neardup import distributed_ordered_ids

    ids = distributed_ordered_ids(
        df.select(token_col).distinct(), token_col, out_col=id_col
    )
    return ids.withColumn(id_col, (F.col(id_col) - 1).cast("bigint"))


def ratings_to_urm(ratings: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Apply ID mappers → ((user_id, item_id, value), user_map, item_map)."""
    user_map = build_id_mapper(ratings, "user_token", "user_id")
    item_map = build_id_mapper(ratings, "item_token", "item_id")
    urm = (
        ratings.join(user_map, "user_token")
        .join(item_map, "item_token")
        .select("user_id", "item_id", F.col("rating").alias("value"))
    )
    return urm, user_map, item_map
