"""Similarity search over embedding columns: brute-force cosine top-k and a
random-hyperplane LSH bucketing for the approximate/scale path.

Training-data-pipeline extension.  The embeddings table is
(vec_id, embedding array<float>, label).

Brute force = broadcast the (small) probe side and evaluate zip_with dot
products inside codegen — exact, O(N·M·d).  At 100 TB the scale path is
`lsh_bucket_signatures`: 16 deterministic hyperplane sign bits shrink the
candidate set to same-bucket pairs before the exact re-score; the plane
components are derived arithmetically from (dimension, plane) so the oracle
can reproduce them (no RNG stream dependency).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: deterministic pseudo-random hyperplanes: component (plane j, dim p) =
#: ((p·PLANE_A + j·PLANE_B) mod PLANE_P) / PLANE_P − 0.5
PLANE_P = 104729
PLANE_A = 7919
PLANE_B = 15485863
N_PLANES = 16


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def with_norm(embeddings: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Attach the L2 norm; vectors cast to double once (f32→f64 exact)."""
    emb = embeddings.withColumn("_emb", _as_double(F.col(vec_col)))
    return emb.withColumn(
        "_norm",
        F.sqrt(
            F.aggregate(F.col("_emb"), F.lit(0.0), lambda acc, x: acc + x * x)
        ),
    )


def cosine_topk_bruteforce(
    embeddings: DataFrame, k: int = 5, vec_col: str = "embedding"
) -> DataFrame:
    """Exact top-k cosine neighbors per vector: (vec_id, neighbor_id,
    cosine, rank).

    Probe side is broadcast (it's the whole table here; in a real lookup
    it's the query batch).  Ranked on round(cosine, 9) + id tiebreak for
    engine portability (cosine is a 64-term float sum).
    """
    base = with_norm(embeddings, vec_col).select("vec_id", "_emb", "_norm")
    probe = base.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("_emb").alias("_emb_n"),
        F.col("_norm").alias("_norm_n"),
    )
    pairs = base.crossJoin(F.broadcast(probe)).filter(
        F.col("vec_id") != F.col("neighbor_id")
    )
    dot = F.aggregate(
        F.zip_with("_emb", "_emb_n", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = pairs.select(
        "vec_id",
        "neighbor_id",
        (dot / (F.col("_norm") * F.col("_norm_n"))).alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.round(F.col("cosine"), 9).desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def lsh_bucket_signatures(
    embeddings: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """(vec_id, bucket): 16 hyperplane sign bits packed into a bigint.

    bit_j = [ Σ_p emb[p] · plane(j, p) > 0 ], plane(j, p) =
    ((p·A + j·B) mod P)/P − 0.5.  Everything is arithmetic on the dimension
    index, so any engine reproduces the identical bucketing.
    """
    emb = embeddings.withColumn("_emb", _as_double(F.col(vec_col)))
    bits = []
    for j in range(N_PLANES):
        # Σ over dims: element * plane component; aggregate over positions
        proj = F.aggregate(
            F.zip_with(
                F.col("_emb"),
                F.transform(
                    F.sequence(F.lit(1), F.size("_emb")),
                    lambda p: (
                        ((p.cast("bigint") * PLANE_A + F.lit(j * PLANE_B)) % PLANE_P)
                        / F.lit(float(PLANE_P))
                        - 0.5
                    ),
                ),
                lambda x, w_: x * w_,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj > 0, F.lit(2**j)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return emb.select("vec_id", bucket.cast("bigint").alias("bucket"))
