"""Matrix-factorization recommenders: IALS via MLlib ALS, PureSVD, NMF.

Reference:
- IALS — MatrixFactorization/IALSRecommender.py:40-211: implicit ALS with
  confidence C = 1 + alpha·r (linear) or 1 + alpha·log(1 + r/eps).  MLlib's
  ``ALS(implicitPrefs=True, alpha=...)`` implements exactly this model
  (Hu/Koren/Volinsky 2008), so the Spark build delegates to it — the one
  reference algorithm with a drop-in MLlib twin (SURVEY.md §2.7).
- PureSVD — MatrixFactorization/PureSVDRecommender.py:33-45: rank-k
  truncated SVD of the URM; user factors U, item factors (Σ·Vᵀ)ᵀ.  Here:
  randomized SVD (Halko et al. 2011) with the two matmuls distributed as
  join+agg and only the k×k work on the driver — the same structure
  sklearn's randomized_svd uses, scaled out.
- NMF — MatrixFactorization/NMFRecommender.py:36-73 (sklearn NMF):
  multiplicative-update NMF in numpy at test scale (sklearn is not in this
  environment); each update is two matmuls, the documented scale path is
  distributing them like PureSVD's.

Stochastic/iterative fits are validated by recommendation quality and
shape, not weight equality (SURVEY.md §7 hard-parts note).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType


def ials_factors(
    urm: DataFrame,
    rank: int = 16,
    reg: float = 0.1,
    alpha: float = 20.0,
    max_iter: int = 10,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Fit implicit ALS; returns (user_factors, item_factors) as
    (id, features array<float>) DataFrames — the long-format analog of the
    reference's USER_factors/ITEM_factors dense arrays."""
    from pyspark.ml.recommendation import ALS

    als = ALS(
        rank=rank,
        maxIter=max_iter,
        regParam=reg,
        alpha=alpha,
        implicitPrefs=True,
        seed=seed,
        userCol="user_id",
        itemCol="item_id",
        ratingCol="value",
        coldStartStrategy="drop",
        intermediateStorageLevel="MEMORY_AND_DISK",
    )
    model = als.fit(
        urm.select(
            F.col("user_id").cast("int"),
            F.col("item_id").cast("int"),
            F.col("value").cast("float"),
        )
    )
    uf = model.userFactors.select(
        F.col("id").cast("bigint").alias("user_id"), F.col("features")
    )
    itf = model.itemFactors.select(
        F.col("id").cast("bigint").alias("item_id"), F.col("features")
    )
    return uf, itf


def mf_scores(user_factors: DataFrame, item_factors: DataFrame) -> DataFrame:
    """scores[u,i] = U[u]·V[i] — factor join + zip_with dot product
    (BaseMatrixFactorizationRecommender.py:165-197).  Item side broadcast
    (|items|·rank floats is small even at catalog scale)."""
    u = user_factors.select("user_id", F.col("features").alias("uf"))
    i = item_factors.select("item_id", F.col("features").alias("vf"))
    dot = F.aggregate(
        F.zip_with("uf", "vf", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    return u.crossJoin(F.broadcast(i)).select(
        "user_id", "item_id", dot.alias("score")
    )


def ials_recommend(
    urm: DataFrame, k: int = 10, **als_kwargs
) -> DataFrame:
    """End-to-end IALS top-k with remove-seen."""
    from ..operators.scoring import recommend_top_k

    uf, itf = ials_factors(urm, **als_kwargs)
    scores = mf_scores(uf, itf)
    return recommend_top_k(scores, k, train=urm, round_digits=9)


# ---------------------------------------------------------------------------
# PureSVD — randomized range finder with distributed matmuls
# ---------------------------------------------------------------------------
def _matmul_urm_dense(
    urm: DataFrame, dense: np.ndarray, key: str, other: str
) -> np.ndarray:
    """Distributed sparse×dense matmul: Σ_other value · dense[other, :]
    grouped by `key` — the only distributed primitive randomized SVD needs.

    Stays declarative: broadcast-join the triples against the (id, features)
    table, posexplode, one hash agg on (key, component).  Map-side partial
    aggregation plays the role of the reference's blocked accumulation.
    Returns a dense (max_key+1, r) driver array (k+p columns only).
    """
    spark = urm.sparkSession
    r = dense.shape[1]
    schema = StructType(
        [
            StructField("_oid", LongType()),
            StructField("_feat", ArrayType(DoubleType())),
        ]
    )
    fdf = spark.createDataFrame(
        [(i, dense[i].tolist()) for i in range(dense.shape[0])], schema
    )
    agg = (
        urm.select(F.col(key).alias("_kid"), F.col(other).alias("_oid"), "value")
        .join(F.broadcast(fdf), "_oid")
        .select("_kid", "value", F.posexplode("_feat").alias("_pos", "_f"))
        .groupBy("_kid", "_pos")
        .agg(F.sum(F.col("value") * F.col("_f")).alias("_s"))
        .collect()
    )
    n = max((row["_kid"] for row in agg), default=-1) + 1
    out = np.zeros((n, r))
    for row in agg:
        out[row["_kid"], row["_pos"]] = row["_s"]
    return out


def pure_svd_item_factors(
    urm: DataFrame, k: int = 16, n_oversample: int = 8, n_iter: int = 4, seed: int = 42
) -> DataFrame:
    """Rank-k right singular vectors scaled by Σ: (item_id, features).

    Randomized SVD: Y = (AᵀA)^q Aᵀ Ω via alternating distributed matmuls,
    QR on the driver (only (n_items × k+p)), final small SVD.  Matches
    PureSVDRecommender's factors up to sign/rotation — consumers use scores
    U·Vᵀ which are rotation-invariant.
    """
    rng = np.random.default_rng(seed)
    n_items = int(urm.agg(F.max("item_id")).collect()[0][0]) + 1
    omega = rng.standard_normal((n_items, k + n_oversample))
    # power iterations: Q spans range of (Aᵀ A)^q (Aᵀ Ω̃)
    y = omega
    for _ in range(n_iter):
        z = _matmul_urm_dense(urm, y, key="user_id", other="item_id")  # A·y
        y = _matmul_urm_dense(urm, z, key="item_id", other="user_id")  # Aᵀ·z
        y, _ = np.linalg.qr(y)
    # project: B = A·Q  (n_users × k+p), small SVD of B
    b = _matmul_urm_dense(urm, y, key="user_id", other="item_id")
    _, s, vt = np.linalg.svd(b, full_matrices=False)
    v_items = y @ vt.T[:, :k]  # right singular vectors in item space
    factors = v_items * s[:k]  # scale by Σ (reference: (Σ·Vᵀ)ᵀ)
    spark = urm.sparkSession
    schema = StructType(
        [
            StructField("item_id", LongType()),
            StructField("features", ArrayType(DoubleType())),
        ]
    )
    rows = [(i, factors[i].tolist()) for i in range(factors.shape[0])]
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# NMF — multiplicative updates (driver numpy at test scale)
# ---------------------------------------------------------------------------
def nmf_factors(
    urm: DataFrame, k: int = 8, n_iter: int = 50, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """Lee–Seung multiplicative-update NMF (frobenius), the algorithm behind
    sklearn NMF(solver='mu') the reference calls (NMFRecommender.py:36-73).

    Driver-side numpy over the collected sparse URM — same scale envelope
    as the reference (which was also single-node).  Scale path: distribute
    the two matmuls per update like PureSVD's range finder.
    """
    rows = urm.select("user_id", "item_id", "value").collect()
    n_u = max(r[0] for r in rows) + 1
    n_i = max(r[1] for r in rows) + 1
    a = np.zeros((n_u, n_i))
    for r in rows:
        a[r[0], r[1]] = r[2]
    rng = np.random.default_rng(seed)
    w = rng.random((n_u, k)) + 1e-3
    h = rng.random((k, n_i)) + 1e-3
    for _ in range(n_iter):
        h *= (w.T @ a) / np.maximum(w.T @ w @ h, 1e-10)
        w *= (a @ h.T) / np.maximum(w @ h @ h.T, 1e-10)
    spark = urm.sparkSession
    schema_u = StructType(
        [
            StructField("user_id", LongType()),
            StructField("features", ArrayType(DoubleType())),
        ]
    )
    schema_i = StructType(
        [
            StructField("item_id", LongType()),
            StructField("features", ArrayType(DoubleType())),
        ]
    )
    uf = spark.createDataFrame(
        [(i, w[i].tolist()) for i in range(n_u)], schema_u
    )
    itf = spark.createDataFrame(
        [(j, h[:, j].tolist()) for j in range(n_i)], schema_i
    )
    return uf, itf


def estimate_cold_user_factors(
    urm_cold: DataFrame, item_factors: DataFrame
) -> DataFrame:
    """Factors for users absent at training time:
    U_cold[u] = Σ_{i∈profile(u)} V[i] / sqrt(|profile(u)|).

    Reference: BaseMatrixFactorizationRecommender.py:100-156
    (_estimate_user_factors / italgo of the cold-user ITEM_factors average
    scaled by sqrt of profile length).  One broadcast join + posexplode agg
    — the same shape as the randomized-SVD matmul primitive.
    """
    joined = urm_cold.join(F.broadcast(item_factors), "item_id")
    per_component = (
        joined.select(
            "user_id", F.posexplode("features").alias("pos", "f")
        )
        .groupBy("user_id", "pos")
        .agg(F.sum("f").alias("s"))
    )
    profile_len = urm_cold.groupBy("user_id").agg(F.count("*").alias("n"))
    return (
        per_component.join(F.broadcast(profile_len), "user_id")
        .withColumn("c", F.col("s") / F.sqrt(F.col("n")))
        .groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "c"))
            ).alias("_pairs")
        )
        .select(
            "user_id",
            F.transform(F.col("_pairs"), lambda p: p.getField("c")).alias(
                "features"
            ),
        )
    )
