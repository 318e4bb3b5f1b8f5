"""Non-personalized recommenders: TopPop, GlobalEffects, Random.

Reference: Base/NonPersonalizedRecommender.py —
- TopPop (:18-47): item popularity = column nnz of the URM.
- GlobalEffects (:66-136): shrunk global/item/user biases:
    mu     = mean of all ratings
    b_item = Σ_u (r_ui − mu) / (nnz_i + λ_item)
    b_user = Σ_i (r_ui − mu − b_item) / (nnz_u + λ_user)
- Random (:155-180): uniform seeded scores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def item_popularity(urm: DataFrame) -> DataFrame:
    """TopPop fit: (item_id, popularity)."""
    return urm.groupBy("item_id").agg(F.count("*").cast("bigint").alias("popularity"))


def global_effects(
    ratings: DataFrame,
    lambda_item: float = 25.0,
    lambda_user: float = 10.0,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shrunk biases over an explicit (user_id, item_id, rating) table.

    Returns (mu_df, item_bias_df, user_bias_df); mu_df is a 1-row frame.
    Three cheap aggs + one broadcast join — the reference's exact math
    (NonPersonalizedRecommender.py:75-120) without the CSC/CSR format
    gymnastics.
    """
    mu_df = ratings.agg(F.avg("rating").alias("mu"))
    with_mu = ratings.crossJoin(F.broadcast(mu_df))
    item_bias = with_mu.groupBy("item_id").agg(
        (
            F.sum(F.col("rating") - F.col("mu"))
            / (F.count("*") + F.lit(lambda_item))
        ).alias("item_bias")
    )
    user_bias = (
        with_mu.join(F.broadcast(item_bias), "item_id")
        .groupBy("user_id")
        .agg(
            (
                F.sum(F.col("rating") - F.col("mu") - F.col("item_bias"))
                / (F.count("*") + F.lit(lambda_user))
            ).alias("user_bias")
        )
    )
    return mu_df, item_bias, user_bias


def random_recommend(
    urm: DataFrame, k: int = 10, n_props: int = 64, seed: int = 42
) -> DataFrame:
    """Seeded Random top-k, bounded-proposal formulation — the 100 TB
    shape of NonPersonalizedRecommender.py:155-180.

    Top-k of uniform scores over the whole catalog ≡ a uniform random
    pick of k unseen items, so the legacy user×catalog candidate stream
    (the reference's dense per-user score row, and the per-user window
    over the entire catalog that goes with it) is replaced by the shared
    ``bounded_item_proposals`` stream: O(U·n_props) rows end to end.
    Scores are the same portable Lehmer/MINSTD mix the proposal stream
    uses (per-(user, item, seed) integers over int64 arithmetic), so the
    ranking is reproducible under any partitioning AND exactly
    replayable in ANSI SQL — the Random recommender carries a full
    DuckDB twin (the reference seeds NumPy for the same purpose:
    determinism, not a specific RNG stream).  Same shortfall contract
    as the bounded negative sampler: a user whose n_props proposals all
    collide with seen items gets fewer than k rows — probability nil at
    real seen/|catalog| ratios.
    """
    from ..operators.scoring import recommend_top_k
    from ..operators.splits import bounded_item_proposals

    users = urm.select("user_id").distinct()
    items = urm.select("item_id").distinct()
    # score mix deliberately differs from the proposal mix (item_id*7919
    # enters the first residue) so rank order is uncorrelated with which
    # proposals were drawn
    r1 = F.pmod(
        F.col("user_id") * F.lit(1_000_003)
        + F.col("item_id") * F.lit(7_919)
        + F.lit(int(seed)),
        F.lit(1_000_003_619),
    )
    r2 = F.pmod(r1 * F.lit(48_271), F.lit(2_147_483_647))
    cand = (
        bounded_item_proposals(users, items, n_props=n_props, epoch=seed)
        # drop the internal proposal ordinal BEFORE dedup: which `seq`
        # survives dropDuplicates is partitioning-dependent and must not
        # leak into the (deterministic) output schema
        .select("user_id", "item_id")
        .dropDuplicates(["user_id", "item_id"])
        .withColumn(
            "score", r2.cast("double") / F.lit(2_147_483_647.0)
        )
    )
    return recommend_top_k(cand, k, train=urm)
