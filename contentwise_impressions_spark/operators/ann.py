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


def ivf_assignments(
    embeddings: DataFrame,
    n_list: int = 8,
    n_iters: int = 2,
    vec_col: str = "embedding",
    distances: DataFrame | None = None,
) -> DataFrame:
    """(vec_id, list_id): IVF coarse quantizer — deterministic k-means.

    The IVF scale path for ANN: cluster the corpus into `n_list` inverted
    lists with a few Lloyd iterations, then search only same-list
    candidates (`ivf_topk`).  Everything is declarative DataFrame algebra
    (posexplode → broadcast-join centroids → groupBy argmin window →
    re-average), so Catalyst owns the physical plan and a SQL oracle can
    replay it exactly:

    - seeds: the `n_list` vec_ids ranked by (vec_id·P1 mod 997, vec_id) —
      the engine's multiplicative-hash convention, no RNG stream.
    - assignment: argmin over round(Σ(x−y)², 9) with centroid-id tiebreak
      (float-sum portability, see plans/mlops.py header).
    - update: per-(list, dim) AVG.

    At 100 TB the same plan holds: centroids are always tiny (n_list × d →
    broadcast), assignment is a map-side join + partial agg, and only the
    corpus scan scales.
    """
    d = (
        distances
        if distances is not None
        else _ivf_final_distances(embeddings, n_list, n_iters, vec_col)
    )
    w = Window.partitionBy("vec_id").orderBy(F.round("d2", 9), F.col("c"))
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("vec_id", F.col("c").alias("list_id"))
    )


def _ivf_final_distances(
    embeddings: DataFrame,
    n_list: int = 8,
    n_iters: int = 2,
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, c, d2) against the final Lloyd-iteration centroids — the
    shared sub-plan behind assignments (argmin) and probe lists (top
    n_probe)."""
    from ..functions.hashing import P1

    e = embeddings.select(
        "vec_id", F.posexplode(_as_double(F.col(vec_col))).alias("pos", "x")
    )
    w_seed = Window.orderBy(
        (F.col("vec_id").cast("bigint") * P1) % 997, F.col("vec_id")
    )
    seeds = (
        embeddings.select("vec_id")
        .withColumn("c", F.row_number().over(w_seed) - 1)
        .filter(F.col("c") < n_list)
    )
    cent = e.join(seeds, "vec_id").select("c", "pos", F.col("x").alias("y"))
    d = None
    for it in range(n_iters):
        d = (
            e.join(F.broadcast(cent), "pos")
            .groupBy("vec_id", "c")
            .agg(F.sum((F.col("x") - F.col("y")) ** 2).alias("d2"))
        )
        if it == n_iters - 1:
            break
        w = Window.partitionBy("vec_id").orderBy(F.round("d2", 9), F.col("c"))
        assign = (
            d.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("vec_id", F.col("c").alias("list_id"))
        )
        cent = (
            assign.join(e, "vec_id")
            .groupBy(F.col("list_id").alias("c"), "pos")
            .agg(F.avg("x").alias("y"))
        )
    return d


def ivf_probe_lists(
    embeddings: DataFrame,
    n_list: int = 8,
    n_iters: int = 2,
    n_probe: int = 2,
    vec_col: str = "embedding",
    distances: DataFrame | None = None,
) -> DataFrame:
    """(vec_id, list_id, probe_rank ≤ n_probe): each vector's n_probe
    nearest inverted lists — the standard IVF recall knob.  probe_rank 1
    is the home list (== ivf_assignments)."""
    d = (
        distances
        if distances is not None
        else _ivf_final_distances(embeddings, n_list, n_iters, vec_col)
    )
    w = Window.partitionBy("vec_id").orderBy(F.round("d2", 9), F.col("c"))
    return (
        d.withColumn("probe_rank", F.row_number().over(w))
        .filter(F.col("probe_rank") <= n_probe)
        .select("vec_id", F.col("c").alias("list_id"), "probe_rank")
    )


def ivf_topk(
    embeddings: DataFrame,
    k: int = 3,
    n_list: int = 8,
    n_iters: int = 2,
    vec_col: str = "embedding",
    n_probe: int = 1,
    distances: DataFrame | None = None,
) -> DataFrame:
    """Approximate cosine top-k restricted to IVF-list candidates.

    (vec_id, neighbor_id, cosine, rank) — the candidate set is the union
    of the probe's `n_probe` nearest inverted lists (the standard IVF
    recall/latency knob: 1 = home list only; more lists monotonically
    grow the candidate set), re-scored exactly; Σ_l n_probe·n_l² pair
    support instead of n² brute force.  The assignment stays declarative
    (Catalyst plan, oracle-replayable); the re-score reuses the
    broadcast-BLAS kernel shape of `cosine_topk_bruteforce` because the
    relational within-list pair join materializes the candidate rows ×
    d — a skewed cluster makes that quadratic (measured 5× slower at
    sf0.1).
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
    n_probe = max(1, n_probe)
    pl = ivf_probe_lists(
        embeddings,
        n_list=n_list,
        n_iters=n_iters,
        n_probe=n_probe,
        vec_col=vec_col,
        distances=distances,
    )
    # ONE job: vectors replicated per probe rank; rank 1 is the home list
    rows = embeddings.select("vec_id", vec_col).join(pl, "vec_id").collect()
    uniq = sorted({r["vec_id"] for r in rows})
    ids = np.array(uniq, dtype=np.int64)
    n = len(ids)
    mat = np.zeros((n, len(rows[0][vec_col])))
    lists = np.zeros(n, dtype=np.int64)
    probe_mat = np.full((n, n_probe), -1, dtype=np.int64)
    for r in rows:
        p = int(np.searchsorted(ids, r["vec_id"]))
        probe_mat[p, r["probe_rank"] - 1] = r["list_id"]
        if r["probe_rank"] == 1:
            mat[p] = r[vec_col]
            lists[p] = r["list_id"]
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((ids, mat, norms, lists, probe_mat))

    out_schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("cosine", DoubleType()),
            StructField("rank", IntegerType()),
        ]
    )

    def kernel(batches):
        b_ids, b_mat, b_norms, b_lists, b_probe = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pos = np.searchsorted(b_ids, pdf["vec_id"].to_numpy(dtype=np.int64))
            out = []
            for p in pos:
                # candidates: vectors whose HOME list is any of p's probes
                mask = b_lists == b_probe[p, 0]
                for q in range(1, b_probe.shape[1]):
                    mask |= b_lists == b_probe[p, q]
                cand = np.nonzero(mask)[0]
                cand = cand[cand != p]
                if len(cand) == 0:
                    continue
                cos = (b_mat[cand] @ b_mat[p]) / (b_norms[cand] * b_norms[p])
                # rank on (round(cos,9) desc, id asc): cand ids ascend, so
                # a stable sort on -rounded gives the id tiebreak for free
                top = np.argsort(-np.round(cos, 9), kind="stable")[:k]
                for rk, c in enumerate(top, start=1):
                    out.append(
                        (
                            int(b_ids[p]),
                            int(b_ids[cand[c]]),
                            float(cos[c]),
                            rk,
                        )
                    )
            yield pd.DataFrame(
                out, columns=["vec_id", "neighbor_id", "cosine", "rank"]
            )

    probes = spark.createDataFrame(
        [(int(i),) for i in ids], "vec_id bigint"
    ).repartition(max(2, spark.sparkContext.defaultParallelism))
    return probes.mapInPandas(kernel, out_schema)


def cosine_pairs_above(
    embeddings: DataFrame, threshold: float, vec_col: str = "embedding"
) -> DataFrame:
    """(doc_i, doc_j, cosine) for every pair with round(cosine, 9) ≥
    threshold, doc_i < doc_j — embedding-cosine near-duplicate detection.

    Same broadcast-BLAS shape as `cosine_topk_bruteforce`; each probe only
    scores ids greater than itself so every pair is emitted once.  The
    threshold compares the ROUNDED cosine so a boundary pair can't flip
    membership between engines (float-sum last-ulp rule).  Scale path:
    LSH-bucket or IVF-list the corpus first and run this kernel per
    bucket — the thresholding algebra is unchanged.
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
        LongType,
        StructField,
        StructType,
    )

    spark = embeddings.sparkSession
    rows = embeddings.select("vec_id", vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    order = np.argsort(ids, kind="stable")
    ids, mat = ids[order], mat[order]
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((ids, mat, norms))

    out_schema = StructType(
        [
            StructField("doc_i", LongType()),
            StructField("doc_j", LongType()),
            StructField("cosine", DoubleType()),
        ]
    )

    def kernel(batches):
        b_ids, b_mat, b_norms = bc.value
        n = len(b_ids)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pos = np.searchsorted(b_ids, pdf["vec_id"].to_numpy(dtype=np.int64))
            out = []
            for p in pos:
                if p + 1 >= n:
                    continue
                cos = (b_mat[p + 1 :] @ b_mat[p]) / (
                    b_norms[p + 1 :] * b_norms[p]
                )
                hit = np.nonzero(np.round(cos, 9) >= threshold)[0]
                for h in hit:
                    out.append(
                        (int(b_ids[p]), int(b_ids[p + 1 + h]), float(cos[h]))
                    )
            yield pd.DataFrame(out, columns=["doc_i", "doc_j", "cosine"])

    probes = spark.createDataFrame(
        [(int(i),) for i in ids], "vec_id bigint"
    ).repartition(max(2, spark.sparkContext.defaultParallelism))
    return probes.mapInPandas(kernel, out_schema)
