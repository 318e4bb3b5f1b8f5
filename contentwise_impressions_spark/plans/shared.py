"""Session-scoped materialized intermediates shared across plan modules.

The reference materializes its URM / split matrices ONCE and feeds every
recommender from the cached artifact (the split-cache protocol,
reference Utils/dataset.py:271-284 and Utils/dataset.py:327-359); rebuilding
the CSR from the raw log per model would dominate its runtime.  The Spark
analog is `DataFrame.persist()`: the URM build (scan → filter → project →
dropDuplicates shuffle) runs once per (session, scale-factor dir) and every
query — and every *subtree repetition inside one query* (self-joins, norm
passes, split tagging) — reads the in-memory columnar copy instead of
re-scanning and re-shuffling the event log.

At 100 TB this is the difference between one URM-build shuffle per session
and one per query-subtree: MEMORY_AND_DISK spills gracefully when the
matrix outgrows executor memory, and a real deployment would hand this
same role to a bucketed parquet materialization (see sources/model_io.
cached_or_build for the on-disk variant).

Correctness note: values are unaffected — persist() only short-circuits
recomputation.  Keyed by applicationId so test suites that cycle sessions
rebuild instead of touching a stopped context.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..sources.interactions import events_as_interactions, implicit_urm
from ..sources.tables import load_table

_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def materialized(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return a persisted copy of `build()`, reused within this session."""
    key = (spark.sparkContext.applicationId, sf_dir, name)
    df = _CACHE.get(key)
    if df is None:
        df = build().persist(StorageLevel.MEMORY_AND_DISK)
        _CACHE[key] = df
    return df


def urm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Implicit URM (user_id, item_id, value=1.0), materialized per session."""
    return materialized(
        spark,
        sf_dir,
        "urm",
        lambda: implicit_urm(load_table(spark, sf_dir, "events")),
    )


def rated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit (user_id, item_id, rating=avg value) table, materialized."""

    def build() -> DataFrame:
        inter = events_as_interactions(load_table(spark, sf_dir, "events"))
        return (
            inter.filter(F.col("event_type").isin("view", "click", "purchase"))
            .groupBy("user_id", "item_id")
            .agg(F.avg("value").alias("rating"))
        )

    return materialized(spark, sf_dir, "rated", build)
