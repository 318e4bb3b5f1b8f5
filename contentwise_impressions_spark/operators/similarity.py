"""The similarity kernel — AᵀA as a self-join, all metric variants.

Reference: Base/Similarity/Compute_Similarity_Python.py:213-388 computes
blocked column-wise AᵀA with NumPy, then derives cosine / jaccard / dice /
tversky / asymmetric variants from the dot products and per-column norms
(:80-114, :252-336); Compute_Similarity_Euclidean.py:21-244 derives distance
similarities from the same quantities.  The Cython twin
(Compute_Similarity_Cython.pyx) exists only for speed and has no Spark
equivalent — Tungsten codegen covers it.

Spark shape: one self-equi-join on the row key + groupBy(i,j) sum — the
relational matmul.  Physical notes for 100 TB:
- the join shuffles on user_id once; both sides are THE SAME scan (Spark
  reuses the exchange under AQE);
- skewed power-users explode the pair count (deg² pairs per user); the
  `max_row_degree` cap mirrors the standard practical fix (drop or sample
  hyper-active rows before the self-join) — the reference never needed it
  because it blocked over dense columns instead;
- per-column top-K (similarityMatrixTopK, Base/Recommender_utils.py:55-122)
  is a row_number window partitioned by item_j.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

EPS = 1e-6


def pair_dots(
    urm: DataFrame,
    row: str = "user_id",
    col: str = "item_id",
    val: str = "value",
    max_row_degree: int | None = None,
) -> DataFrame:
    """All co-occurring column pairs with their dot product: (i, j, dot).

    i != j (the reference zeroes the diagonal — Compute_Similarity_Python
    :310).  Produces BOTH directions, like the dense AᵀA.
    """
    base = urm.select(
        F.col(row).alias("_row"), F.col(col).alias("_col"), F.col(val).alias("_val")
    )
    if max_row_degree is not None:
        w = Window.partitionBy("_row")
        base = (
            base.withColumn("_deg", F.count("*").over(w))
            .filter(F.col("_deg") <= max_row_degree)
            .drop("_deg")
        )
    a = base.select(
        F.col("_row"), F.col("_col").alias("item_i"), F.col("_val").alias("vi")
    )
    b = base.select(
        F.col("_row"), F.col("_col").alias("item_j"), F.col("_val").alias("vj")
    )
    return (
        a.join(b, "_row")
        .filter(F.col("item_i") != F.col("item_j"))
        .groupBy("item_i", "item_j")
        .agg(F.sum(F.col("vi") * F.col("vj")).alias("dot"))
    )


def column_norms(
    urm: DataFrame, col: str = "item_id", val: str = "value"
) -> DataFrame:
    """Per-column nnz count and sum-of-squares (the reference's
    sumOfSquared, Compute_Similarity_Python.py:240-250)."""
    return urm.groupBy(F.col(col).alias("item")).agg(
        F.count("*").cast("double").alias("nnz"),
        F.sum(F.col(val) * F.col(val)).cast("double").alias("sq"),
    )


def _join_norms(dots: DataFrame, norms: DataFrame) -> DataFrame:
    ni = norms.select(
        F.col("item").alias("item_i"),
        F.col("nnz").alias("nnz_i"),
        F.col("sq").alias("sq_i"),
    )
    nj = norms.select(
        F.col("item").alias("item_j"),
        F.col("nnz").alias("nnz_j"),
        F.col("sq").alias("sq_j"),
    )
    return dots.join(F.broadcast(ni), "item_i").join(F.broadcast(nj), "item_j")


def similarity_scores(
    urm: DataFrame,
    kind: str = "cosine",
    row: str = "user_id",
    col: str = "item_id",
    val: str = "value",
    shrink: float = 0.0,
    alpha: float = 0.5,
    tversky_alpha: float = 1.0,
    tversky_beta: float = 1.0,
) -> DataFrame:
    """(item_i, item_j, sim) for one similarity kind.

    Formulas match Compute_Similarity_Python.py:
    - cosine     dot / (‖i‖‖j‖ + shrink + 1e-6)            (:315-321)
    - asymmetric dot / (sq_i^α · sq_j^(1-α) + shrink+eps)   (:252-254,315)
    - jaccard    dot / (ni + nj − dot + shrink+eps)         (:324-326)
    - dice       dot / (ni + nj + shrink+eps)               (:328-330)
    - tversky    dot / (dot + α(ni−dot) + β(nj−dot) + shrink+eps)  (:332-336)
    - euclidean  1 / (d + shrink + eps), d² = sq_i+sq_j−2·dot
      (Compute_Similarity_Euclidean.py:200-244)
    For binary (implicit) data nnz == sumOfSquared, as in the reference's
    binarized path (:80-83).
    """
    dots = pair_dots(urm, row, col, val)
    full = _join_norms(dots, column_norms(urm, col, val))
    d, s = F.col("dot"), F.lit(shrink) + F.lit(EPS)
    ni, nj = F.col("nnz_i"), F.col("nnz_j")
    sqi, sqj = F.col("sq_i"), F.col("sq_j")
    if kind == "cosine":
        sim = d / (F.sqrt(sqi) * F.sqrt(sqj) + s)
    elif kind == "asymmetric":
        sim = d / (F.pow(sqi, alpha) * F.pow(sqj, 1.0 - alpha) + s)
    elif kind == "jaccard":
        sim = d / (ni + nj - d + s)
    elif kind == "dice":
        sim = d / (ni + nj + s)
    elif kind == "tversky":
        sim = d / (
            d
            + F.lit(tversky_alpha) * (ni - d)
            + F.lit(tversky_beta) * (nj - d)
            + s
        )
    elif kind == "euclidean":
        sim = 1.0 / (F.sqrt(F.greatest(sqi + sqj - 2.0 * d, F.lit(0.0))) + s)
    else:
        raise ValueError(f"unknown similarity kind: {kind}")
    return full.select("item_i", "item_j", sim.alias("sim"))


def mean_centered(
    urm: DataFrame,
    by: str,
    row: str = "user_id",
    col: str = "item_id",
    val: str = "value",
) -> DataFrame:
    """Subtract the per-`by` mean from values (adjusted-cosine/pearson prep).

    Reference: Compute_Similarity_Python.py:121-190 — adjusted cosine
    subtracts row (user) means, pearson subtracts column (item) means,
    computed over the nonzero support only.
    """
    w = Window.partitionBy(by)
    return urm.select(
        row, col, (F.col(val) - F.avg(val).over(w)).alias(val)
    )


def similarity_top_k(
    sims: DataFrame,
    k: int,
    group: str = "item_j",
    order_val: str = "sim",
    round_digits: int | None = None,
) -> DataFrame:
    """Keep the K best neighbors per column (similarityMatrixTopK,
    Base/Recommender_utils.py:55-122), deterministic tie-break on item_i.

    `round_digits`: rank on round(sim, d) when sim is a float SUM whose
    last ulp depends on accumulation order (see recommend_top_k)."""
    order_col = (
        F.round(F.col(order_val), round_digits)
        if round_digits is not None
        else F.col(order_val)
    )
    w = Window.partitionBy(group).orderBy(
        order_col.desc(), F.col("item_i").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
