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

import sys

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

try:  # by-value pickling: executors need no PYTHONPATH (see slim.py note)
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

from ..functions.blasctl import limit_blas_threads  # noqa: E402


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
    # float64 at the fit boundary: ALS emits array<float>, but the serving
    # kernel (mf_topk) upcasts to float64 before its GEMM while the
    # crossJoin twin's zip_with would multiply in float32 — casting HERE
    # makes both formulations compute in float64 by construction, so
    # kernel/twin equivalence holds exactly, not modulo ~1e-7 near-ties.
    uf = model.userFactors.select(
        F.col("id").cast("bigint").alias("user_id"),
        F.col("features").cast("array<double>").alias("features"),
    )
    itf = model.itemFactors.select(
        F.col("id").cast("bigint").alias("item_id"),
        F.col("features").cast("array<double>").alias("features"),
    )
    return uf, itf


def mf_scores(user_factors: DataFrame, item_factors: DataFrame) -> DataFrame:
    """FULL scores[u,i] = U[u]·V[i] — factor join + zip_with dot product
    (BaseMatrixFactorizationRecommender.py:165-197).

    Test-scale oracle ONLY: this materializes the user×catalog cross
    product, the definitional 100× scale-killer.  Every serving path goes
    through :func:`operators.mf_topk.mf_recommend_top_k` (bounded blocked
    GEMM); tests pin that operator's equivalence against this twin."""
    u = user_factors.select("user_id", F.col("features").alias("uf"))
    i = item_factors.select("item_id", F.col("features").alias("vf"))
    dot = F.aggregate(
        F.zip_with("uf", "vf", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    return u.crossJoin(F.broadcast(i)).select(
        "user_id", "item_id", dot.alias("score")
    )


def ials_recommend(
    urm: DataFrame, k: int = 10, users: DataFrame | None = None, **als_kwargs
) -> DataFrame:
    """End-to-end IALS top-k with remove-seen, served by the bounded
    blocked-GEMM top-k (never a user×catalog score stream; MLlib's
    ``recommendForUserSubset`` is the same blocked shape, but the shared
    kernel keeps the repo-wide deterministic (round(score), item_id)
    ordering contract).  `users`: optional subset to serve."""
    from ..operators.mf_topk import mf_recommend_top_k

    uf, itf = ials_factors(urm, **als_kwargs)
    return mf_recommend_top_k(
        uf, itf, k, train=urm.select("user_id", "item_id"), users=users,
        round_digits=9,
    )


# ---------------------------------------------------------------------------
# PureSVD — randomized range finder with distributed matmuls
# ---------------------------------------------------------------------------
def _matmul_urm_df(
    urm: DataFrame, fac: DataFrame, key: str, other: str
) -> DataFrame:
    """Distributed sparse×dense matmul AS A DATAFRAME: (key, features)
    with features[p] = Σ_other value · fac.features[other][p] — the only
    distributed primitive randomized SVD needs, chainable so power-
    iteration intermediates never leave the cluster.

    Join the triples against the (id, features) table, posexplode, one
    hash agg on (key, component), re-assemble the array.  Map-side
    partial aggregation plays the role of the reference's blocked
    accumulation."""
    return (
        urm.select(
            F.col(key).alias("_kid"), F.col(other).alias("_oid"), "value"
        )
        .join(fac.select(F.col("_id").alias("_oid"), "_feat"), "_oid")
        .select("_kid", "value", F.posexplode("_feat").alias("_pos", "_f"))
        .groupBy("_kid", "_pos")
        .agg(F.sum(F.col("value") * F.col("_f")).alias("_s"))
        .groupBy("_kid")
        .agg(F.array_sort(F.collect_list(F.struct("_pos", "_s"))).alias("_ps"))
        .select(
            F.col("_kid").alias("_id"),
            F.transform("_ps", lambda s: s["_s"]).alias("_feat"),
        )
    )


def pure_svd_item_factors(
    urm: DataFrame, k: int = 16, n_oversample: int = 8, n_iter: int = 4, seed: int = 42
) -> DataFrame:
    """Rank-k right singular vectors scaled by Σ: (item_id, features).

    Randomized SVD with the ENTIRE power chain on the cluster: the
    alternating matmuls Y_{q+1} = AᵀA·Y_q are chained DataFrames — the
    user-side intermediate A·Y never reaches the driver — and ONE collect
    brings back [(AᵀA)^q Ω | (AᵀA)^{q+1} Ω] (n_items × 2(k+p)).  The
    driver then does only small linear algebra: Q,R = qr(Y_q); with
    W = Y_{q+1}, BᵀB = QᵀAᵀAQ = (QᵀW)R⁻¹, and eigh(BᵀB) supplies the
    singular values/right vectors of B = AQ without ever materializing B
    (n_users × r stays distributed).  Matches PureSVDRecommender's
    factors up to sign/rotation — consumers use scores U·Vᵀ which are
    rotation-invariant (PureSVDRecommender.py:33-45).

    Per-iteration driver QR is dropped; the epilogue orthonormalizes via
    a rank-truncated SVD of the collected Y, so a rank-deficient URM
    (catalog smaller than k+p) or an underflown trailing direction yields
    zero-padded factors instead of a singular solve (the energy pytest
    gate guards the capture fraction).
    """
    rng = np.random.default_rng(seed)
    spark = urm.sparkSession
    n_items = int(urm.agg(F.max("item_id")).collect()[0][0]) + 1
    r = k + n_oversample
    omega = rng.standard_normal((n_items, r))
    schema = StructType(
        [
            StructField("_id", LongType()),
            StructField("_feat", ArrayType(DoubleType())),
        ]
    )
    y = spark.createDataFrame(
        [(i, omega[i].tolist()) for i in range(n_items)], schema
    )
    w = None
    for _ in range(n_iter + 1):
        if w is not None:
            y = w
        z = _matmul_urm_df(urm, y, key="user_id", other="item_id")  # A·y
        w = _matmul_urm_df(urm, z, key="item_id", other="user_id")  # Aᵀ·z
    # ONE collect: Y_q and Y_{q+1} side by side (items absent from the URM
    # have no product rows — they stay zero, exactly as a dense matmul)
    both = y.select("_id", F.col("_feat").alias("_y")).join(
        w.select("_id", F.col("_feat").alias("_w")), "_id", "full_outer"
    )
    ymat = np.zeros((n_items, r))
    wmat = np.zeros((n_items, r))
    for row in both.collect():
        if row["_y"] is not None:
            ymat[row["_id"]] = row["_y"]
        if row["_w"] is not None:
            wmat[row["_id"]] = row["_w"]
    # rank-robust orthonormalization: SVD of Y instead of plain QR+solve —
    # when rank(Y) < r (catalog smaller than k+p, or trailing power-chain
    # directions underflown) triangular R is singular and solve() raises or
    # amplifies float noise into the factors; truncating Y's spectrum at a
    # relative tolerance drops exactly the collapsed directions, and the
    # projection AᵀA·Q = W·(V_y Σ_y⁻¹) needs no inverse of R at all.
    # Directions with σ_i/σ_1 below ~eps^(1/(2q+2)) are unrecoverable
    # without per-iteration reorthonormalization (the documented tradeoff
    # of the one-collect chain); the oversampling buffer p absorbs them
    # and σ=0 columns are returned as zeros, matching a dense SVD's Σ·Vᵀ.
    u_y, s_y, vt_y = np.linalg.svd(ymat, full_matrices=False)
    tol = max(ymat.shape) * np.finfo(np.float64).eps * (
        float(s_y[0]) if s_y.size else 0.0
    )
    rk = int(np.sum(s_y > tol))
    factors = np.zeros((n_items, k))
    if rk > 0:
        q_mat = u_y[:, :rk]
        proj = vt_y[:rk].T / s_y[:rk]  # V_y Σ_y⁻¹ on the kept directions
        btb = q_mat.T @ (wmat @ proj)  # BᵀB = QᵀAᵀAQ
        btb = 0.5 * (btb + btb.T)
        eigvals, eigvecs = np.linalg.eigh(btb)
        order = np.argsort(eigvals)[::-1][: min(k, rk)]
        s = np.sqrt(np.clip(eigvals[order], 0.0, None))
        v_items = q_mat @ eigvecs[:, order]  # right singular vecs, item space
        factors[:, : len(order)] = v_items * s  # Σ·Vᵀ scaling (reference)
    out_schema = StructType(
        [
            StructField("item_id", LongType()),
            StructField("features", ArrayType(DoubleType())),
        ]
    )
    rows = [(i, factors[i].tolist()) for i in range(factors.shape[0])]
    return spark.createDataFrame(rows, out_schema)


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


def _gram_small(fac: DataFrame, k: int) -> np.ndarray:
    """k×k Gram Σ_rows f·fᵀ of a (id, features) table — per-partition
    partial outer products via mapInPandas, summed on the driver (k²
    floats per partition; the only thing that ever leaves the cluster)."""
    schema = StructType([StructField("_g", ArrayType(DoubleType()))])

    def partial(batches):
        limit_blas_threads()  # Spark tasks are the parallel unit
        acc = np.zeros((k, k))
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf["features"].to_numpy())
            acc += m.T @ m
            seen = True
        if seen:
            yield pd.DataFrame({"_g": [acc.ravel().tolist()]})

    parts = fac.select("features").mapInPandas(partial, schema).collect()
    out = np.zeros((k, k))
    for row in parts:
        out += np.asarray(row["_g"]).reshape(k, k)
    return out


def _mu_update(
    fac: DataFrame,
    num: DataFrame,
    gram: np.ndarray,
    id_col: str,
    k: int,
    eps: float,
) -> DataFrame:
    """One Lee–Seung multiplicative update, id-local:
    f ← f ⊙ num / max(G·f, eps).  `num` is the distributed matmul result
    (_id, _feat); G is the k×k gram as driver literals (the matvec is a
    codegen expression, k² literal terms)."""
    import functools
    import operator

    den = F.array(
        *[
            functools.reduce(
                operator.add,
                [
                    F.element_at("features", q + 1) * float(gram[p, q])
                    for q in range(k)
                ],
            )
            for p in range(k)
        ]
    )
    zeros = F.array_repeat(F.lit(0.0), k)
    return (
        fac.join(
            num.select(F.col("_id").alias(id_col), F.col("_feat").alias("_n")),
            id_col,
            "left",
        )
        .select(
            id_col,
            F.zip_with(
                F.zip_with(
                    "features",
                    F.coalesce("_n", zeros),
                    lambda f, n_: f * n_,
                ),
                den,
                lambda fn, d: fn / F.greatest(d, F.lit(eps)),
            ).alias("features"),
        )
        .localCheckpoint()
    )


def nmf_factors_distributed(
    urm: DataFrame,
    k: int = 8,
    n_iter: int = 20,
    seed: int = 42,
    eps: float = 1e-10,
    init: tuple[DataFrame, DataFrame] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Lee–Seung multiplicative-update NMF with BOTH factor matrices and
    both matmuls distributed — the scale path :func:`nmf_factors`'s
    docstring promises (that driver twin stays as the small-fixture
    equivalence oracle).

    Per iteration, the only driver traffic is two k×k Grams:
      H ← H ⊙ (AᵀW) / ((WᵀW)·H)   — AᵀW is the item-keyed distributed
                                     matmul (same primitive as PureSVD's
                                     range finder); (WᵀW) is k² floats.
      W ← W ⊙ (A·H) / ((HᵀH)·W)
    The ⊙ / ÷ steps are id-local codegen expressions; localCheckpoint per
    update keeps plans shallow (the iterative-loop rule).

    `init`: optional (W0, H0) DataFrames (user_id/item_id, features) —
    used by the equivalence test to seed both paths identically; default
    is per-id seeded uniform(1e-3, 1+1e-3), reproducible under any
    partitioning.
    """
    spark = urm.sparkSession
    users = urm.select("user_id").distinct()
    items = urm.select("item_id").distinct()

    def _uniform_init(ids: DataFrame, id_col: str, salt: int) -> DataFrame:
        schema = StructType(
            [
                StructField(id_col, LongType()),
                StructField("features", ArrayType(DoubleType())),
            ]
        )

        def gen(batches, _k=k, _seed=seed, _salt=salt, _col=id_col):
            for pdf in batches:
                rows = [
                    (
                        int(fid),
                        (
                            np.random.default_rng((_seed, _salt, int(fid)))
                            .random(_k)
                            + 1e-3
                        ).tolist(),
                    )
                    for fid in pdf[_col]
                ]
                yield pd.DataFrame(rows, columns=[_col, "features"])

        return ids.select(F.col(id_col).cast("bigint")).mapInPandas(
            gen, schema
        )

    if init is not None:
        w_fac, h_fac = init
        w_fac = w_fac.localCheckpoint()
        h_fac = h_fac.localCheckpoint()
    else:
        w_fac = _uniform_init(users, "user_id", 7).localCheckpoint()
        h_fac = _uniform_init(items, "item_id", 8).localCheckpoint()

    for _ in range(n_iter):
        gw = _gram_small(w_fac, k)  # WᵀW, k² floats
        num_h = _matmul_urm_df(
            urm,
            w_fac.select(F.col("user_id").alias("_id"), F.col("features").alias("_feat")),
            key="item_id",
            other="user_id",
        )
        h_fac = _mu_update(h_fac, num_h, gw, "item_id", k, eps)
        gh = _gram_small(h_fac, k)  # HHᵀ over item rows
        num_w = _matmul_urm_df(
            urm,
            h_fac.select(F.col("item_id").alias("_id"), F.col("features").alias("_feat")),
            key="user_id",
            other="item_id",
        )
        w_fac = _mu_update(w_fac, num_w, gh, "user_id", k, eps)
    return w_fac, h_fac


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
