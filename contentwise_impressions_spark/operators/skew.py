"""Skew-safe join: explicit key salting for Zipf-hot keys.

The interaction log's user/item keys are Zipf-distributed (SURVEY.md §1),
so a shuffle join on them concentrates the hottest keys in single tasks.
AQE's skew-join split (enabled in session.py) repairs this at runtime for
sort-merge joins, but two cases still need the explicit form at 100 TB:
aggregation-under-join pipelines where the skew reappears AFTER the first
repair, and engines/paths where AQE is off (streaming micro-batches,
speculative plans).  Salting is the declarative fix: split each hot fact
key across `n_salts` sub-keys and replicate the dimension row once per
salt — the join semantics are IDENTICAL (oracle-checked), only the
physical key space is widened so no task owns a whole hot key.

Cost model: replicates the dim side ×n_salts (bounded — use for mid-size
dims too big to broadcast but small enough to replicate) and widens the
shuffle key; the fact side is never replicated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """fact ⋈ dim on `key`, physically executed on (key, salt).

    The fact row's salt is a deterministic hash of its key — pmod into
    [0, n_salts) — plus a per-row spreader (xxhash64 over all columns) so
    rows OF THE SAME hot key fan out across salts; the dim side carries
    every salt value.  Row-set of the result is provably the plain join's
    (each fact row meets its dim row exactly once, at its own salt).
    """
    salts = fact.sparkSession.range(n_salts).select(
        F.col("id").cast("int").alias("_salt")
    )
    fact_s = fact.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts)).cast(
            "int"
        ),
    )
    dim_s = dim.crossJoin(salts)
    return fact_s.join(dim_s, [key, "_salt"], how).drop("_salt")
