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

    Implementation: the index side (all vectors) is broadcast as ONE numpy
    matrix; probe rows stream through an Arrow-batched mapInPandas kernel
    doing a blocked BLAS matmul + per-row argpartition — the vectorized-UDF
    fast path (a pure zip_with/aggregate formulation measured ~10× slower:
    higher-order array functions don't enter whole-stage codegen).  Each
    probe partition is embarrassingly parallel; at 100 TB the index side
    becomes an IVF/LSH-bucketed join (see lsh_bucket_signatures) and this
    kernel re-scores only candidates.

    Ranked on round(cosine, 9) + id tiebreak for engine portability
    (cosine is a float sum; last ulp depends on accumulation order).
    """
    import sys as _sys

    try:  # by-value pickling (see recommenders/slim.py note)
        from pyspark import cloudpickle as _cp

        _cp.register_pickle_by_value(_sys.modules[__name__])
    except Exception:  # pragma: no cover
        pass

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    spark = embeddings.sparkSession
    index_rows = embeddings.select("vec_id", vec_col).collect()
    ids = np.array([r[0] for r in index_rows], dtype=np.int64)
    mat = np.array([r[1] for r in index_rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    order = np.argsort(ids, kind="stable")
    ids, mat, norms = ids[order], mat[order], norms[order]
    bc = spark.sparkContext.broadcast((ids, mat, norms))

    out_schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("cosine", DoubleType()),
            StructField("rank", IntegerType()),
        ]
    )

    def kernel(batches):
        b_ids, b_mat, b_norms = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            probe_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            probe = np.array(list(pdf[vec_col]), dtype=np.float64)
            p_norms = np.sqrt((probe * probe).sum(axis=1))
            cos = (probe @ b_mat.T) / np.outer(p_norms, b_norms)
            out = []
            for r in range(cos.shape[0]):
                row = cos[r]
                self_mask = b_ids == probe_ids[r]
                row = np.where(self_mask, -np.inf, row)
                # rank on (round(cos,9) desc, id asc): ids are ascending, so
                # a stable sort on -rounded gives the id tiebreak for free
                rounded = np.round(row, 9)
                top = np.argsort(-rounded, kind="stable")[:k]
                for rk, idx in enumerate(top, start=1):
                    out.append(
                        (
                            int(probe_ids[r]),
                            int(b_ids[idx]),
                            float(row[idx]),
                            rk,
                        )
                    )
            yield pd.DataFrame(
                out, columns=["vec_id", "neighbor_id", "cosine", "rank"]
            )

    return embeddings.select("vec_id", vec_col).mapInPandas(kernel, out_schema)


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
