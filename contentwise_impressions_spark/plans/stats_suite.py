"""Dataset-statistics suite — the notebook/paper statistics as one module.

Reference (§3.3): notebook_generate_statistics.ipynb drives
`paper_statistics` (dataset.py:642-938), `basic_statistics` (:941-1102),
`complex_statistics` (:1105-1170), distributions (:1292-1899), and saves a
JSON document.  The reference builds dozens of lazy Dask aggregates and
fuses them into one compute; under Spark the same fusion is automatic —
each method below is one or two wide aggregations sharing a cached scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.stats import gini_coefficient
from ..operators.topk import top_k_global


def paper_statistics(inter: DataFrame) -> dict:
    """Headline corpus numbers (dataset.py:642-938): cardinalities, per-
    entity activity min/mean/max — the two-level agg pattern."""
    row = inter.agg(
        F.count("*").alias("n_interactions"),
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("item_id").alias("n_items"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("max_ts"),
    ).collect()[0]
    out = row.asDict()
    for key in ("user_id", "item_id"):
        per = inter.groupBy(key).agg(F.count("*").alias("cnt"))
        stats = per.agg(
            F.min("cnt").alias("min"),
            F.avg("cnt").alias("mean"),
            F.max("cnt").alias("max"),
        ).collect()[0]
        out[f"per_{key}_activity"] = stats.asDict()
    out["density"] = out["n_interactions"] / (out["n_users"] * out["n_items"])
    return out


def complex_statistics(inter: DataFrame) -> dict:
    """Inequality + concentration (dataset.py:1105-1170,1201-1260)."""
    counts = inter.groupBy("user_id").agg(F.count("*").alias("cnt"))
    gini = gini_coefficient(counts, "cnt").collect()[0]["gini"]
    top = top_k_global(
        counts, [F.col("cnt").desc(), F.col("user_id").asc()], 20
    ).collect()
    return {
        "user_activity_gini": gini,
        "top20_users": [(r["user_id"], r["cnt"]) for r in top],
    }


def timestamp_distribution(inter: DataFrame) -> dict:
    """Calendar histograms (dataset.py:1460-1571) in one grouped agg each."""
    by_hour = {
        r["h"]: r["cnt"]
        for r in inter.groupBy(F.hour("ts").alias("h"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    by_dow = {
        r["d"]: r["cnt"]
        for r in inter.groupBy((F.weekday("ts") + 1).alias("d"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    return {"by_hour": by_hour, "by_isodow": by_dow}


def full_statistics(inter: DataFrame) -> dict:
    """The notebook's end-to-end JSON document (cells 7-53)."""
    inter = inter.cache()
    try:
        return {
            "paper": paper_statistics(inter),
            "complex": complex_statistics(inter),
            "timestamps": timestamp_distribution(inter),
        }
    finally:
        inter.unpersist()
