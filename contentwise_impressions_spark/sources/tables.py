"""Parquet sources for the harness star schema + CW-shaped tables.

Mirrors the reference's lazy Dask parquet scans
(/root/reference/Utils/dataset.py:211-237) — ``spark.read.parquet`` is the
direct analog: lazy, columnar, schema-carrying.  Column pruning and predicate
pushdown reach the parquet reader automatically, which the reference did by
hand (dataset.py:539-541).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one harness table.

    The `events` table carries TIMESTAMP(NANOS) which Spark's vectorized
    reader rejects; we read nanos as int64 (legacy conf) and rebuild a
    microsecond TimestampType column with integer `div` (no double
    round-trip — ns epoch values exceed the 53-bit mantissa).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several tables at once; defaults to all of them."""
    use = names or TESTDATA_TABLES
    return {n: load_table(spark, sf_dir, n) for n in use}


def write_table(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Parquet sink (reference: Utils/dataset.py:240-268).

    ``partition_by`` gives hive-style partition pruning on re-read — the
    scale-out replacement for the reference's per-split .npz files
    (dataset.py:286-306).
    """
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def table_rows(sf_dir: str, name: str) -> int | None:
    """Exact row count of a base table from its parquet FOOTER — a pure
    metadata read (no Spark job), for data-derived width rules (guide
    §2.2: exchange/window widths sized by the data, not by the session's
    core count).  None when the footer isn't readable (caller falls back
    to the planner's default width)."""
    import os

    try:
        import pyarrow.parquet as pq

        path = os.path.join(sf_dir, f"{name}.parquet")
        return int(pq.ParquetFile(path).metadata.num_rows)
    except Exception:
        return None


def width_for_rows(rows: int | None, rows_per_task: int = 1 << 15) -> int | None:
    """Partition count for an explicit repartition over ~``rows`` rows:
    ceil(rows / rows_per_task), floor 2 — the same ~32k-rows-per-task
    rule the top-k merge uses (operators/ann._MERGE_ROWS_PER_PART).
    Scale-adaptive: grows linearly with data, independent of the local
    core count."""
    if rows is None:
        return None
    return max(2, -(-int(rows) // rows_per_task))
