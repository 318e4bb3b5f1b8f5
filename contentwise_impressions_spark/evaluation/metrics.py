"""Ranking-evaluation metrics as one DataFrame aggregation.

Reference: Base/Evaluation/metrics.py + Evaluator.py (SURVEY.md §2.9).
The reference streams user batches through per-metric Python accumulator
objects with a `merge_with_other` partial-merge contract (metrics.py:57-62)
— exactly Spark's partial-aggregation contract, so every metric below is a
built-in agg expression over the recs⋈test join; no UDAFs.

Faithfully preserved reference quirks:
- NDCG uses gains 2^rel − 1 with test ratings as relevance
  (metrics.py:182-211); for implicit data rel=1 → binary gain 1.
- HIT_RATE is the SUM of hits averaged over users (Evaluator.py:251,329),
  not the any-hit indicator.
- PRECISION divides by the cutoff, PRECISION_RECALL_MIN_DEN by
  min(#test, cutoff) (metrics.py:138-157).
- MAP normalizes by min(#test, cutoff) (metrics.py:39-75).
- F1 is computed from the ALREADY-AVERAGED precision/recall
  (Evaluator.py:253-259).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _idcg_table(spark, max_cutoff: int) -> DataFrame:
    """(n, idcg) for n = 1..max_cutoff: idcg(n) = Σ_{i=1..n} 1/log2(i+1)."""
    w = (
        Window.orderBy("i").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spark.range(1, max_cutoff + 1)
        .select(F.col("id").alias("i"))
        .withColumn("idcg", F.sum(1.0 / F.log2(F.col("i") + 1.0)).over(w))
        .select(F.col("i").alias("n"), "idcg")
    )


def ranking_metrics(
    recs: DataFrame, test: DataFrame, cutoff: int = 10
) -> DataFrame:
    """All accuracy metrics at one cutoff, averaged over evaluated users.

    `recs`: (user_id, item_id, rank) with rank 1..cutoff.
    `test`: (user_id, item_id) held-out positives.
    Users evaluated = users with >= 1 test interaction (Evaluator.py:184-211).
    Returns one row: n_users_evaluated, precision, precision_min_den, recall,
    map, mrr, ndcg, arhr, hit_rate, f1.
    """
    spark = recs.sparkSession
    test_pairs = test.select("user_id", "item_id").dropDuplicates(
        ["user_id", "item_id"]
    )
    n_test_per_user = test_pairs.groupBy("user_id").agg(
        F.count("*").alias("n_test")
    )

    # recs ⋈ test → hit flags; keep every rec row of evaluated users
    labeled = (
        recs.join(n_test_per_user, "user_id", "inner")  # evaluated users only
        .join(
            test_pairs.withColumn("is_hit", F.lit(1)),
            ["user_id", "item_id"],
            "left",
        )
        .withColumn("is_hit", F.coalesce(F.col("is_hit"), F.lit(0)))
    )

    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    labeled = labeled.withColumn("cum_hits", F.sum("is_hit").over(w_cum))

    per_user = labeled.groupBy("user_id", "n_test").agg(
        F.sum("is_hit").alias("n_hits"),
        F.sum(
            F.col("is_hit") * F.col("cum_hits") / F.col("rank")
        ).alias("ap_num"),
        F.min(F.when(F.col("is_hit") == 1, F.col("rank"))).alias("first_hit_rank"),
        F.sum(F.col("is_hit") / F.col("rank")).alias("arhr"),
        F.sum(F.col("is_hit") / F.log2(F.col("rank") + 1.0)).alias("dcg"),
    )

    idcg = _idcg_table(spark, cutoff)
    per_user = (
        per_user.withColumn("den", F.least(F.col("n_test"), F.lit(cutoff)))
        .join(F.broadcast(idcg), F.col("den") == F.col("n"), "left")
        .select(
            "user_id",
            (F.col("n_hits") / F.lit(float(cutoff))).alias("precision"),
            (F.col("n_hits") / F.col("den")).alias("precision_min_den"),
            (F.col("n_hits") / F.col("n_test")).alias("recall"),
            (F.col("ap_num") / F.col("den")).alias("ap"),
            F.coalesce(1.0 / F.col("first_hit_rank"), F.lit(0.0)).alias("rr"),
            (F.col("dcg") / F.col("idcg")).alias("ndcg"),
            F.col("arhr"),
            F.col("n_hits").cast("double").alias("hits"),
        )
    )

    # users with test items but no recs at all still count in the mean
    # (the reference counts every user it evaluates, Evaluator.py:251)
    evaluated = n_test_per_user.join(
        per_user, "user_id", "left"
    ).fillna(
        0.0,
        subset=[
            "precision",
            "precision_min_den",
            "recall",
            "ap",
            "rr",
            "ndcg",
            "arhr",
            "hits",
        ],
    )

    agg = evaluated.agg(
        F.count("*").cast("bigint").alias("n_users_evaluated"),
        F.avg("precision").alias("precision"),
        F.avg("precision_min_den").alias("precision_min_den"),
        F.avg("recall").alias("recall"),
        F.avg("ap").alias("map"),
        F.avg("rr").alias("mrr"),
        F.avg("ndcg").alias("ndcg"),
        F.avg("arhr").alias("arhr"),
        F.avg("hits").alias("hit_rate"),
    )
    return agg.withColumn(
        "f1",
        F.when(
            (F.col("precision") + F.col("recall")) > 0,
            2.0
            * F.col("precision")
            * F.col("recall")
            / (F.col("precision") + F.col("recall")),
        ).otherwise(F.lit(0.0)),
    )


def coverage_metrics(
    recs: DataFrame, train: DataFrame
) -> DataFrame:
    """Beyond-accuracy coverage: fraction of catalog ever recommended and
    fraction of train users with >= 1 rec (metrics.py:310-370)."""
    n_items = train.select("item_id").distinct().count()
    n_users = train.select("user_id").distinct().count()
    return recs.agg(
        (F.countDistinct("item_id") / F.lit(float(n_items))).alias("coverage_item"),
        (F.countDistinct("user_id") / F.lit(float(n_users))).alias("coverage_user"),
    )
