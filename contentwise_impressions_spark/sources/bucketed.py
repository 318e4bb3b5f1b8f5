"""Bucketed write-through materialization — the on-disk co-location layer.

`plans/shared.py` keeps hot intermediates in executor memory for one
session.  At 100 TB the durable equivalent is a BUCKETED parquet table:
`bucketBy(n, key)` pre-shuffles the data ONCE at write time into a fixed
hash layout, and every later join or aggregation on the bucket key is
bucket-local — Catalyst drops the Exchange on both pre-bucketed sides
(asserted in tests/test_plans.py), so repeated URM⋈similarity /
URM⋈split joins never pay the shuffle again.  This is Spark's native
analog of the reference's persisted split artifacts
(Utils/dataset.py:271-284 writes the URM/split matrices once and every
recommender memory-maps them).

Design notes for the 100 TB shape:
- bucket count is a LAYOUT constant, not a parallelism knob: pick it so
  one bucket of the biggest table fits an executor core's working set
  (AQE cannot re-split a pathological bucket — skewed keys belong in the
  salting path, not here).
- `sortBy` the bucket key inside buckets: sort-merge joins then skip the
  per-task sort too.
- both sides of a co-located join need the SAME bucket count; mixed
  counts fall back to a one-sided shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Materialize `df` as a bucketed managed parquet table (overwrite)."""
    writer = df.write.format("parquet").mode("overwrite").bucketBy(
        n_buckets, bucket_col
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(name)


def bucketed_or_build(
    spark: SparkSession,
    name: str,
    bucket_col: str,
    build,
    n_buckets: int = 16,
) -> DataFrame:
    """Read the bucketed table `name`, materializing it via `build()` on
    first use — the on-disk twin of plans/shared.materialized (and of the
    reference's split-cache protocol, sources/model_io.cached_or_build)."""
    if not spark.catalog.tableExists(name):
        write_bucketed(build(), name, bucket_col, n_buckets=n_buckets)
    return spark.table(name)
