"""Graph-based recommenders: P3alpha and RP3beta random-walk similarities.

Reference:
- P3alpha — GraphBased/P3alphaRecommender.py:33-141: L1-normalize URM per
  user (Pui) and per item (Piu), raise transition probs to alpha
  elementwise, W = Piu · Pui (blocked matmul), then per-column topK.
- RP3beta — GraphBased/RP3betaRecommender.py:32-153: same walk, then each
  column j is divided by popularity(j)^beta before topK.

Spark shape: the matmul is the standard relational form — self-join of the
normalized URM on user, groupBy (i, j), sum of products.  Degrees are tiny
per-key aggregates joined back (broadcast).  For implicit URMs the
transition probs are (1/deg)^alpha, so the whole walk stays exact-arithmetic
until the final float division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.similarity import similarity_top_k


def _degrees(urm: DataFrame, key: str, out: str) -> DataFrame:
    return urm.groupBy(key).agg(F.sum("value").cast("double").alias(out))


def p3alpha_similarity(
    urm: DataFrame, alpha: float = 1.0, top_k: int | None = 100
) -> DataFrame:
    """W[i,j] = Σ_u Piu[i,u]^α · Pui[u,j]^α over the co-interaction join.

    Piu[i,u] = r_ui / deg(i);  Pui[u,j] = r_uj / deg(u).
    """
    deg_u = _degrees(urm, "user_id", "deg_u")
    deg_i = _degrees(urm, "item_id", "deg_i")
    a = (
        urm.join(F.broadcast(deg_i), "item_id")
        .select(
            "user_id",
            F.col("item_id").alias("item_i"),
            F.pow(F.col("value") / F.col("deg_i"), alpha).alias("p_iu"),
        )
    )
    b = (
        urm.join(F.broadcast(deg_u), "user_id")
        .select(
            "user_id",
            F.col("item_id").alias("item_j"),
            F.pow(F.col("value") / F.col("deg_u"), alpha).alias("p_uj"),
        )
    )
    w = (
        a.join(b, "user_id")
        .filter(F.col("item_i") != F.col("item_j"))
        .groupBy("item_i", "item_j")
        .agg(F.sum(F.col("p_iu") * F.col("p_uj")).alias("sim"))
    )
    if top_k is not None:
        w = similarity_top_k(w, top_k, round_digits=9)
    return w


def rp3beta_similarity(
    urm: DataFrame, alpha: float = 1.0, beta: float = 0.6, top_k: int | None = 100
) -> DataFrame:
    """P3alpha walk re-ranked by inverse item popularity^beta.

    Reference divides column j of W by pop(j)^beta
    (RP3betaRecommender.py:118-133).
    """
    w = p3alpha_similarity(urm, alpha=alpha, top_k=None)
    pop = urm.groupBy(F.col("item_id").alias("item_j")).agg(
        F.count("*").cast("double").alias("pop_j")
    )
    w = (
        w.join(F.broadcast(pop), "item_j")
        .select(
            "item_i",
            "item_j",
            (F.col("sim") / F.pow(F.col("pop_j"), beta)).alias("sim"),
        )
    )
    if top_k is not None:
        w = similarity_top_k(w, top_k, round_digits=9)
    return w


def item_pagerank(
    urm: DataFrame, damping: float = 0.85, n_iters: int = 2
) -> DataFrame:
    """(item_id, pagerank): power iteration over the item co-occurrence
    graph — the random-walk centrality extension of the P3alpha machinery
    (no reference analog; the reference's closest artifact is TopPop).

    Graph: w(i,j) = #users co-interacting with i and j (i≠j); transitions
    row-L1-normalized.  The co-occurrence graph is symmetric so every node
    has out-edges — no dangling-mass correction needed.  Rank starts
    uniform and runs `n_iters` fixed iterations of
    r' = (1−d)/N + d·Pᵀr — each iteration is one join + groupBy-sum
    (shuffle on item), so at scale the cost is n_iters similarity-sized
    shuffles and the plan stays fully declarative (SQL-oracle replayable;
    a convergence-threshold variant would just wrap this in the driver
    loop with localCheckpoint like operators/dedup.connected_components).
    """
    edges = (
        urm.select("user_id", F.col("item_id").alias("item_i"))
        .join(urm.select("user_id", F.col("item_id").alias("item_j")), "user_id")
        .filter(F.col("item_i") != F.col("item_j"))
        .groupBy("item_i", "item_j")
        .agg(F.count("*").cast("double").alias("w"))
    )
    out_w = edges.groupBy("item_i").agg(F.sum("w").alias("out_w"))
    trans = edges.join(out_w, "item_i").select(
        "item_i", "item_j", (F.col("w") / F.col("out_w")).alias("p")
    )
    nodes = edges.select(F.col("item_i").alias("item_id")).distinct()
    n = nodes.count()
    r = nodes.withColumn("pagerank", F.lit(1.0 / n))
    for _ in range(n_iters):
        contrib = (
            trans.join(r, trans.item_i == r.item_id)
            .groupBy(F.col("item_j").alias("item_id"))
            .agg(F.sum(F.col("p") * F.col("pagerank")).alias("c"))
        )
        r = nodes.join(contrib, "item_id", "left").select(
            "item_id",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))
            ).alias("pagerank"),
        )
    return r
