"""As-of (point-in-time) and bounded-range temporal joins.

The reference has no theta/range/as-of joins (SURVEY.md §2.3) — its closest
construct is the interactions↔impressions id-equality join.  A training-data
pipeline needs the temporal versions constantly (attribute a click to the
impression that preceded it, join features as-of a label timestamp), and
Spark has no built-in as-of join — so these are the "operator Spark lacks"
case of the build brief, expressed as compositions of existing DataFrame
ops.

Scale design:

- ``asof_join_backward`` is the union-window formulation: tag both inputs,
  union, one window over (key, time) carrying the last right-side payload
  forward.  Cost = ONE shuffle on the key (same as any groupBy), zero pair
  explosion — the naive `left.ts >= right.ts` theta join is O(n·m) per key
  and collapses exactly when a user is active (the skew case that matters).
  This is the standard streaming/KDB formulation of as-of.
- ``range_join_within`` buckets time into `upper-lower`-wide epochs so the
  equi-join key (key, bucket) bounds each probe to ≤2 candidate buckets,
  then applies the exact interval predicate — turning an unbounded
  inequality join into an equi-join Catalyst can shuffle/broadcast
  normally (the same trick Databricks' range-join optimization applies
  from a hint).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.timeutil import epoch_seconds


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    right_tiebreak: str | None = None,
    tolerance_seconds: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, the LATEST right row of the same key with
    ``right.ts <= left.ts`` (ties on ts broken by the greatest
    ``right_tiebreak``), optionally only if the gap is within
    ``tolerance_seconds``.  Unmatched rows keep NULL payload (left join
    semantics).

    Output: all left columns + ``<payload><suffix>`` columns +
    ``<right_ts><suffix>`` matched timestamp.
    """
    right_payload = right_payload or []
    rts_out = f"{right_ts}{suffix}"

    lt = left.withColumn("_side", F.lit(1)).withColumn("_evt", F.col(left_ts))
    rt = right.select(
        *on,
        F.col(right_ts).alias("_evt"),
        F.col(right_ts).alias(rts_out),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_payload],
    ).withColumn("_side", F.lit(0))
    # deterministic intra-ts order: right rows first (<=), then by tiebreak
    tb = (
        F.col(f"{right_tiebreak}{suffix}")
        if right_tiebreak
        else F.lit(0)
    )
    merged = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_evt").asc(), F.col("_side").asc(), tb.asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [rts_out] + [f"{c}{suffix}" for c in right_payload]
    out = merged
    for c in carried:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    out = out.filter(F.col("_side") == 1).drop("_side", "_evt")

    if tolerance_seconds is not None:
        gap_ok = (
            epoch_seconds(left_ts) - epoch_seconds(rts_out)
        ) <= float(tolerance_seconds)
        for c in carried:
            out = out.withColumn(c, F.when(gap_ok, F.col(c)))
    return out


def range_join_within(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_seconds: float = 0.0,
    upper_seconds: float = 3600.0,
) -> DataFrame:
    """Inner join of right rows with ``right.ts − left.ts ∈ [lower, upper]``
    seconds for the same key — the bounded-interval ("range") join.

    Bucketing: epoch buckets of width ``upper−lower``; a left row's window
    spans at most two buckets, so it is replicated ≤2× and joined
    equi-style on (key, bucket) before the exact predicate filters.  Right
    columns are suffixed ``_r`` on name collision.
    """
    width = float(upper_seconds - lower_seconds)
    if width <= 0:
        raise ValueError("upper_seconds must exceed lower_seconds")

    overlap = set(left.columns) & set(right.columns)
    rsel = [
        F.col(c).alias(f"{c}_r") if c in overlap and c not in on else F.col(c)
        for c in right.columns
    ]
    rts = f"{right_ts}_r" if right_ts in overlap and right_ts not in on else right_ts

    lb = F.floor((epoch_seconds(left_ts) + lower_seconds) / width)
    probe = left.withColumn("_bkt", F.explode(F.array(lb, lb + 1)))
    build = right.select(*rsel).withColumn(
        "_bkt", F.floor(epoch_seconds(rts) / width)
    )
    diff = epoch_seconds(rts) - epoch_seconds(left_ts)
    return (
        probe.join(build, on=[*on, "_bkt"])
        .filter((diff >= lower_seconds) & (diff <= upper_seconds))
        .drop("_bkt")
    )
