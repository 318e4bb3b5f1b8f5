"""Scoring + ranking operators: URM × W joins, remove-seen, top-K recommend.

Reference:
- item-based scoring  scores = URM[users]·W   — Base/BaseSimilarityMatrixRecommender.py:77-96
- user-based scoring  scores = W[users]·URM   — :99-120
- remove-seen (−inf mask on train items)      — Base/BaseRecommender.py:114-121,172-173
- batch top-K ranking (argpartition + sort)   — Base/BaseRecommender.py:175-213

The reference materializes dense user×item score blocks and masks seen items
with −inf; relationally we never materialize the dense matrix: scores exist
only for (user, item) pairs reachable through the similarity join, and
remove-seen is a left_anti join — the plan the reference's blocking was
emulating by hand (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def item_based_scores(train: DataFrame, w_sparse: DataFrame) -> DataFrame:
    """scores[u, j] = Σ_i URM[u, i] · W[i, j].

    `train` is (user_id, item_id, value); `w_sparse` is (item_i, item_j, sim)
    — typically already top-K'd, which bounds the join fan-out to K per
    train row (the reference applies topK to W for the same reason).
    """
    return (
        train.join(w_sparse, train.item_id == w_sparse.item_i)
        .groupBy("user_id", "item_j")
        .agg(F.sum(F.col("value") * F.col("sim")).alias("score"))
        .select("user_id", F.col("item_j").alias("item_id"), "score")
    )


def user_based_scores(train: DataFrame, w_users: DataFrame) -> DataFrame:
    """scores[u, j] = Σ_v W[u, v] · URM[v, j] (W over user pairs).

    Joined on renamed string keys, not dataset-qualified refs: W's lineage
    may itself contain `train` (the KNN kernel is fit on it), and qualified
    refs against a shared ancestor trip Spark's ambiguous-self-join check."""
    t = train.select(
        F.col("user_id").alias("user_j"), "item_id", "value"
    )
    return (
        w_users.join(t, "user_j")
        .groupBy("user_i", "item_id")
        .agg(F.sum(F.col("sim") * F.col("value")).alias("score"))
        .select(F.col("user_i").alias("user_id"), "item_id", "score")
    )


def remove_seen(scores: DataFrame, train: DataFrame) -> DataFrame:
    """Drop (user, item) pairs present in train — the −inf mask, relationally."""
    return scores.join(
        train.select("user_id", "item_id"), ["user_id", "item_id"], "left_anti"
    )


def recommend_top_k(
    scores: DataFrame,
    k: int,
    train: DataFrame | None = None,
    round_digits: int | None = None,
) -> DataFrame:
    """Per-user top-K ranking: (user_id, item_id, score, rank).

    Reference: BaseRecommender.recommend() = remove-seen + argpartition
    top-K + exact sort of the K survivors (:175-213).  One window, ties
    broken by item_id for engine portability.

    `round_digits`: when scores are float SUMS (whose last-ulp value depends
    on accumulation order), rank on round(score, d) so independent engines
    produce identical orderings; exact ties fall to the item_id tiebreak.
    """
    if train is not None:
        scores = remove_seen(scores, train)
    order_score = (
        F.round(F.col("score"), round_digits)
        if round_digits is not None
        else F.col("score")
    )
    w = Window.partitionBy("user_id").orderBy(
        order_score.desc(), F.col("item_id").asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def toppop_scores(
    train: DataFrame, users: DataFrame, cutoff: int | None = None
) -> DataFrame:
    """Popularity score for each eval-user candidate item.

    Reference: TopPop fit = item nnz vector (NonPersonalizedRecommender
    .py:18-47); recommend broadcasts the same score row to every user.

    With `cutoff` set, the popularity table is truncated to the top
    ``cutoff + max per-user train degree`` items BEFORE the crossJoin — a
    correct upper bound because remove-seen can strike at most
    max-profile-length items from any user's list, so every user's final
    top-`cutoff` after remove-seen is provably inside the kept prefix.
    The truncation uses the same (score desc, item_id asc) order as
    recommend_top_k, keeping ties deterministic, and lowers to
    TakeOrderedAndProject (no global sort).  This bounds the candidate
    fan-out at |users|·(cutoff+max_deg) instead of |users|·|items| — the
    difference between a window over ~50 rows/user and one over the whole
    catalog per user at 100 TB.  Without `cutoff` the full table is kept
    (exact legacy shape).
    """
    pop = train.groupBy("item_id").agg(
        F.count("*").cast("double").alias("score")
    )
    if cutoff is not None:
        max_deg = (
            train.groupBy("user_id")
            .agg(F.count("*").alias("d"))
            .agg(F.max("d"))
            .first()[0]
            or 0
        )
        pop = pop.orderBy(
            F.col("score").desc(), F.col("item_id").asc()
        ).limit(int(cutoff) + int(max_deg))
    return users.select("user_id").crossJoin(F.broadcast(pop))
