"""Learned sparse item-item models: SLIM-ElasticNet and EASE_R.

Reference:
- SLIM-EN — SLIM_ElasticNet/SLIMElasticNetRecommender.py:41-149: one
  ElasticNet regression per item column (target = URM[:, j], predictors =
  all other columns, positive coefficients), keep topK coefficients.  The
  reference loops columns SEQUENTIALLY (:130-140 logs items/sec); the
  problem is embarrassingly parallel per item, which is exactly what
  ``applyInPandas`` over item groups gives us.  sklearn isn't available in
  this environment, so the kernel is a direct numpy coordinate-descent for
  the same objective (1/(2n)||y−Xw||² + α·l1_ratio·|w| +
  α(1−l1_ratio)/2·||w||², positive=True — sklearn's parameterization).
- EASE_R — EASE_R/EASE_R_Recommender.py:40-79: closed form
  B = P / (−diag(P)), P = (G + λI)⁻¹, G = XᵀX, diag(B) = 0.  The Gram
  matrix is computed DISTRIBUTED (pair-dots join); only the O(n_items³)
  inverse runs on the driver — same wall the reference has; blocked /
  conjugate-gradient alternatives are the documented scale path.
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

# UDF kernels below close over functions from this module; register it for
# by-value pickling so executors don't need the package on their PYTHONPATH
# (the grading driver imports __spark_entry__.py from an arbitrary CWD).
try:  # pragma: no cover - depends on pyspark internals
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:
    pass

from ..functions.blasctl import limit_blas_threads  # noqa: E402

#: This repo's chosen EASE_R Tikhonov operating point.  NOTE it is NOT
#: the reference default — EASE_R_Recommender.py:40 defaults
#: l2_norm=1e3; 10.0 is the value every EASE_R path here has always
#: used (kept for artifact/oracle continuity, and the conditioning at
#: the harness's small URMs is fine at 10).  Shared with
#: plans/modelops.q_ease_r_gram so the oracled Gram stage G = XᵀX + λI
#: stays the EXACT input these solvers consume if this value ever moves.
EASE_R_L2 = 10.0


def _elastic_net_cd(
    x: np.ndarray,
    y: np.ndarray,
    alpha: float,
    l1_ratio: float,
    max_iter: int = 100,
    tol: float = 1e-4,
    positive: bool = True,
) -> np.ndarray:
    """Coordinate descent for ElasticNet (sklearn objective/parameterization)."""
    n, p = x.shape
    w = np.zeros(p)
    l1 = alpha * l1_ratio * n
    l2 = alpha * (1.0 - l1_ratio) * n
    col_sq = (x * x).sum(axis=0)
    resid = y - x @ w
    for _ in range(max_iter):
        w_max, d_w_max = 0.0, 0.0
        for j in range(p):
            if col_sq[j] == 0.0:
                continue
            w_j = w[j]
            if w_j != 0.0:
                resid += w_j * x[:, j]
            rho = x[:, j] @ resid
            if positive and rho < 0:
                w_new = 0.0
            else:
                w_new = np.sign(rho) * max(abs(rho) - l1, 0.0) / (col_sq[j] + l2)
                if positive:
                    w_new = max(w_new, 0.0)
            w[j] = w_new
            if w_new != 0.0:
                resid -= w_new * x[:, j]
            d_w_max = max(d_w_max, abs(w_new - w_j))
            w_max = max(w_max, abs(w_new))
        if w_max == 0.0 or d_w_max / max(w_max, 1e-12) < tol:
            break
    return w


def slim_elasticnet(
    urm: DataFrame,
    alpha: float = 1e-4,
    l1_ratio: float = 0.1,
    top_k: int = 10,
    max_items_broadcast: int = 20000,
) -> DataFrame:
    """Fit SLIM-EN; returns (item_i, item_j, weight) with <= top_k rows per
    item_j (weight = coefficient of item_i predicting item_j).

    Parallelization: the URM (as a dense user×item array) is broadcast;
    items are distributed one-per-row and each ``applyInPandas`` group fits
    its column independently — the Spark translation of the reference's
    per-column loop, with the 300-seconds-per-progress-log sequential wall
    (SLIMElasticNetRecommender.py:130-140) removed.

    Scale honesty: broadcasting the URM bounds this at ~max_items_broadcast
    items × users that fit in executor memory.  Beyond that, use
    :func:`slim_elasticnet_distributed` — the co-occurrence-neighborhood
    fit (exact for SLIM's sparsity pattern under positive=True) with no
    driver materialization and no item cap; this broadcast twin remains
    as the small-fixture equivalence oracle.
    """
    rows = urm.select("user_id", "item_id", "value").collect()
    n_u = max(r[0] for r in rows) + 1
    n_i = max(r[1] for r in rows) + 1
    if n_i > max_items_broadcast:
        raise ValueError(
            f"slim_elasticnet broadcast path supports <= {max_items_broadcast} items"
        )
    mat = np.zeros((n_u, n_i), dtype=np.float64)
    for r in rows:
        mat[r[0], r[1]] = r[2]
    spark = urm.sparkSession
    bc = spark.sparkContext.broadcast(mat)

    out_schema = StructType(
        [
            StructField("item_i", LongType()),
            StructField("item_j", LongType()),
            StructField("weight", DoubleType()),
        ]
    )

    def fit_columns(pdf: pd.DataFrame) -> pd.DataFrame:
        limit_blas_threads()  # Spark tasks are the parallel unit
        x_full = bc.value
        recs = []
        for j in pdf["item_id"]:
            j = int(j)
            y = x_full[:, j].copy()
            x = x_full.copy()
            x[:, j] = 0.0  # exclude self-regression (reference zeroes col j)
            w = _elastic_net_cd(x, y, alpha=alpha, l1_ratio=l1_ratio)
            nz = np.flatnonzero(w)
            if len(nz) > top_k:
                keep = nz[np.argsort(-w[nz], kind="stable")[:top_k]]
            else:
                keep = nz
            for i in keep:
                recs.append((int(i), j, float(w[i])))
        return pd.DataFrame(recs, columns=["item_i", "item_j", "weight"])

    items = urm.select("item_id").distinct()
    # explicit task-count repartition (r16): per-item fits are compute-
    # heavy but byte-tiny; AQE size-based coalescing would serialize them
    par = urm.sparkSession.sparkContext.defaultParallelism
    return items.repartition(8 * par, "item_id").groupBy(
        "item_id"
    ).applyInPandas(fit_columns, out_schema)


def _elastic_net_cd_gram(
    g: np.ndarray,
    bvec: np.ndarray,
    n: int,
    alpha: float,
    l1_ratio: float,
    max_iter: int = 100,
    tol: float = 1e-4,
    positive: bool = True,
    skip: int | None = None,
) -> np.ndarray:
    """Covariance-update coordinate descent on a precomputed Gram.

    Identical update rule to :func:`_elastic_net_cd` — for data CD,
    rho_i = xᵢᵀ(y − Xw + xᵢwᵢ) = b_i − (Gw)_i + G_ii·w_i — but every
    sweep is O(p²) independent of the user count, which is what lets the
    distributed fit ship only a p×p Gram per target column instead of a
    users×p submatrix.  ``skip`` masks the target's own column (the
    self-regression exclusion; the broadcast twin zeroes the column)."""
    p = len(bvec)
    w = np.zeros(p)
    l1 = alpha * l1_ratio * n
    l2 = alpha * (1.0 - l1_ratio) * n
    col_sq = np.diag(g).copy()
    if skip is not None:
        col_sq[skip] = 0.0
    gw = np.zeros(p)  # G @ w, maintained incrementally
    for _ in range(max_iter):
        w_max, d_w_max = 0.0, 0.0
        for i in range(p):
            if col_sq[i] == 0.0:
                continue
            w_i = w[i]
            rho = bvec[i] - gw[i] + col_sq[i] * w_i
            if positive and rho < 0:
                w_new = 0.0
            else:
                w_new = np.sign(rho) * max(abs(rho) - l1, 0.0) / (
                    col_sq[i] + l2
                )
                if positive:
                    w_new = max(w_new, 0.0)
            if w_new != w_i:
                gw += (w_new - w_i) * g[:, i]
                w[i] = w_new
            d_w_max = max(d_w_max, abs(w_new - w_i))
            w_max = max(w_max, abs(w_new))
        if w_max == 0.0 or d_w_max / max(w_max, 1e-12) < tol:
            break
    return w


def slim_elasticnet_distributed(
    urm: DataFrame,
    alpha: float = 1e-4,
    l1_ratio: float = 0.1,
    top_k: int = 10,
    max_predictors: int | None = None,
) -> DataFrame:
    """SLIM-EN with NO driver URM materialization and no item cap — the
    scale path :func:`slim_elasticnet`'s docstring promises.

    Exact-support restriction: with ``positive=True`` and a non-negative
    URM, any predictor column i with zero co-occurrence with target j has
    rho_i = xᵢᵀ(y − Xw) = 0 − xᵢᵀXw ≤ 0 at EVERY step of coordinate
    descent, so its coefficient is exactly 0.  Each column's regression
    can therefore be restricted to its co-occurrence neighborhood N(j)
    without approximation (``max_predictors=None``).  With
    ``max_predictors=M`` the predictor set is further truncated to the M
    most co-occurring columns — the fsSLIM feature-selection variant
    (Ning & Karypis 2011 §3.3), the knob for pathological hub items.

    Scale shape: the co-occurrence support is a user-keyed self-join
    (Σ_u deg(u)² pair work — the similarity family's budget), predictor
    interaction triples ship through ONE equi-join + groupBy(item_j), and
    each task builds a local p×p Gram by chunked slab GEMM then runs
    covariance-update CD (O(p²) per sweep, independent of user count).
    Nothing larger than one target's neighborhood ever sits in one
    process; the driver never sees the URM.

    Reference: SLIM_ElasticNet/SLIMElasticNetRecommender.py:41-149 (the
    per-column loop; sequential there, parallel-by-column here).
    """
    from pyspark.sql import Window

    spark = urm.sparkSession
    u = urm.select("user_id", "item_id", "value")
    # sklearn's objective scales the penalties by the DESIGN-MATRIX row
    # count; the broadcast twin densifies to (max_user_id+1) rows, so the
    # distributed fit must use the same n for bit-comparable coefficients
    n_scale = int(u.agg(F.max("user_id")).collect()[0][0]) + 1
    a, b = u.alias("a"), u.alias("b")
    pairs = (
        a.join(b, F.col("a.user_id") == F.col("b.user_id"))
        .filter(F.col("a.item_id") != F.col("b.item_id"))
        .groupBy(
            F.col("b.item_id").alias("item_j"),
            F.col("a.item_id").alias("item_i"),
        )
        .agg(F.count("*").alias("cooc"))
    )
    if max_predictors is not None:
        wnd = Window.partitionBy("item_j").orderBy(
            F.col("cooc").desc(), F.col("item_i").asc()
        )
        pairs = (
            pairs.withColumn("_r", F.row_number().over(wnd))
            .filter(F.col("_r") <= max_predictors)
            .drop("_r")
        )
    groups = pairs.select("item_j", "item_i").unionByName(
        u.select(
            F.col("item_id").alias("item_j"), F.col("item_id").alias("item_i")
        ).distinct()
    )
    ship = groups.join(
        u.select(F.col("item_id").alias("item_i"), "user_id", "value"),
        "item_i",
    )

    out_schema = StructType(
        [
            StructField("item_i", LongType()),
            StructField("item_j", LongType()),
            StructField("weight", DoubleType()),
        ]
    )

    def fit_group(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        j = int(key[0])
        ids = np.sort(pdf["item_i"].unique())
        pos = np.searchsorted(ids, pdf["item_i"].to_numpy())
        u_codes, _ = pd.factorize(pdf["user_id"], sort=True)
        p, m = len(ids), int(u_codes.max()) + 1
        vals = pdf["value"].to_numpy(dtype=np.float64)
        # local Gram via bounded user-chunk slabs (see ease_r_blocked)
        g = np.zeros((p, p))
        chunk = max(256, 32_000_000 // max(p, 1) // 8)
        order = np.argsort(u_codes, kind="stable")
        indptr = np.searchsorted(u_codes[order], np.arange(m + 1))
        for c0 in range(0, m, chunk):
            c1 = min(c0 + chunk, m)
            lo, hi = indptr[c0], indptr[c1]
            slab = np.zeros((c1 - c0, p))
            sel = order[lo:hi]
            slab[u_codes[sel] - c0, pos[sel]] = vals[sel]
            g += slab.T @ slab
        jpos = int(np.searchsorted(ids, j))
        w = _elastic_net_cd_gram(
            g, g[:, jpos].copy(), n_scale, alpha, l1_ratio, skip=jpos
        )
        nz = np.flatnonzero(w)
        if len(nz) > top_k:
            keep = nz[np.argsort(-w[nz], kind="stable")[:top_k]]
        else:
            keep = nz
        return pd.DataFrame(
            {
                "item_i": ids[keep].astype(np.int64),
                "item_j": np.full(len(keep), j, dtype=np.int64),
                "weight": w[keep].astype(np.float64),
            }
        )

    # explicit task-count repartition (r16) — same rationale as
    # slim_elastic_net's per-item grid above
    par = ship.sparkSession.sparkContext.defaultParallelism
    return ship.repartition(8 * par, "item_j").groupBy(
        "item_j"
    ).applyInPandas(fit_group, out_schema)


def ease_r(
    urm: DataFrame,
    l2: float = EASE_R_L2,
    top_k: int | None = 10,
    max_driver_items: int = 4096,
) -> DataFrame:
    """EASE_R closed form; returns (item_i, item_j, weight).

    Gram distributed (self-join + agg, same kernel as the similarity
    family); inverse on the driver (reference does the same —
    EASE_R_Recommender.py:64).

    SIZE-GATED: the driver inverse is O(n_items³) time and O(n_items²)
    memory, so above ``max_driver_items`` (default 4096 ≈ a 128 MB dense
    Gram) this delegates to :func:`ease_r_cg` — the exact distributed
    solver — instead of attempting an infeasible dense inverse.  Same
    contract as ``blocked_topk``'s ``feat_broadcast_mb`` gate: the naive
    formulation is reachable only below the budget where it is cheap,
    and a naive caller at catalog scale gets the scale path
    automatically.  Both paths converge to the same weights
    (equivalence-tested), so the gate changes cost, not semantics.
    """
    from ..operators.similarity import pair_dots, similarity_top_k

    n_items = int(urm.agg(F.max("item_id")).collect()[0][0]) + 1
    if n_items > max_driver_items:
        return ease_r_cg(urm, l2=l2, top_k=top_k)
    dots = pair_dots(urm).collect()
    diag = (
        urm.groupBy("item_id")
        .agg(F.sum(F.col("value") * F.col("value")).alias("sq"))
        .collect()
    )
    g = np.zeros((n_items, n_items))
    for row in dots:
        g[row["item_i"], row["item_j"]] = row["dot"]
    for row in diag:
        g[row["item_id"], row["item_id"]] = row["sq"]
    g[np.diag_indices(n_items)] += l2
    p = np.linalg.inv(g)
    b = p / (-np.diag(p))
    np.fill_diagonal(b, 0.0)
    spark = urm.sparkSession
    schema = StructType(
        [
            StructField("item_i", LongType()),
            StructField("item_j", LongType()),
            StructField("sim", DoubleType()),
        ]
    )
    nz = np.argwhere(np.abs(b) > 1e-12)
    w = spark.createDataFrame(
        [(int(i), int(j), float(b[i, j])) for i, j in nz], schema
    )
    if top_k is not None:
        w = similarity_top_k(w, top_k, round_digits=9)
    return w


def ease_r_blocked(
    urm: DataFrame,
    l2: float = EASE_R_L2,
    n_blocks: int = 4,
    top_k: int | None = 10,
    block_map: DataFrame | None = None,
) -> DataFrame:
    """Distributed EASE_R scale path: shard items into blocks, solve the
    closed form independently per block inside ``applyInPandas``.

    The exact EASE_R inverse is O(n_items³) on one node
    (EASE_R_Recommender.py:64) — the documented wall.  Sharding the item
    catalog into B blocks and fitting EASE within each block drops the
    cost to Σ O((n/B)³) spread across executors, with NO driver-side
    linear algebra and NO global Gram broadcast: each task receives only
    its block's (user, item, value) triples and builds its local Gram
    with one GEMM.  Cross-block weights are approximated as 0 — the
    practical sharding an operator would use at catalog scales where the
    global closed form is infeasible (items sharded by category/locale).
    With ``n_blocks=1`` the result is EXACTLY ``ease_r`` (tested).

    `block_map`: optional (item_id, block) assignment; defaults to
    ``item_id % n_blocks`` (deterministic, oracle-reproducible).
    """
    spark = urm.sparkSession
    if block_map is None:
        block_map = (
            urm.select("item_id")
            .distinct()
            .select("item_id", (F.col("item_id") % n_blocks).alias("block"))
        )

    out_schema = StructType(
        [
            StructField("item_i", LongType()),
            StructField("item_j", LongType()),
            StructField("sim", DoubleType()),
        ]
    )

    def fit_block(pdf: pd.DataFrame) -> pd.DataFrame:
        limit_blas_threads()  # Spark tasks are the parallel unit
        ids = np.sort(pdf["item_id"].unique())
        pos = np.searchsorted(ids, pdf["item_id"].to_numpy())
        u_codes, _ = pd.factorize(pdf["user_id"], sort=True)
        n, m = len(ids), int(u_codes.max()) + 1
        vals = pdf["value"].to_numpy().astype(np.float64)
        # Gram accumulated in user chunks: never materialize the full
        # dense (m × n) matrix, only a bounded (chunk × n) slab per GEMM
        g = np.zeros((n, n))
        chunk = max(256, 32_000_000 // max(n, 1) // 8)
        order = np.argsort(u_codes, kind="stable")
        indptr = np.searchsorted(u_codes[order], np.arange(m + 1))
        for c0 in range(0, m, chunk):
            c1 = min(c0 + chunk, m)
            lo, hi = indptr[c0], indptr[c1]
            slab = np.zeros((c1 - c0, n))
            sel = order[lo:hi]
            slab[u_codes[sel] - c0, pos[sel]] = vals[sel]
            g += slab.T @ slab
        g[np.diag_indices(n)] += l2
        p = np.linalg.inv(g)
        b = p / (-np.diag(p))
        np.fill_diagonal(b, 0.0)
        nz = np.argwhere(np.abs(b) > 1e-12)
        return pd.DataFrame(
            {
                "item_i": ids[nz[:, 0]],
                "item_j": ids[nz[:, 1]],
                "sim": b[nz[:, 0], nz[:, 1]],
            }
        )

    w = (
        urm.join(block_map, "item_id")
        .select("block", "user_id", "item_id", "value")
        # explicit task-count repartition (r16): per-block inverses are
        # compute-heavy; AQE size-based coalescing would co-schedule them
        .repartition(int(n_blocks), "block")
        .groupBy("block")
        .applyInPandas(fit_block, out_schema)
    )
    if top_k is not None:
        from ..operators.similarity import similarity_top_k

        w = similarity_top_k(w, top_k, round_digits=9)
    return w


def ease_r_cg(
    urm: DataFrame,
    l2: float = EASE_R_L2,
    n_iters: int = 200,
    tol: float = 1e-12,
    top_k: int | None = 10,
    cols_per_chunk: int = 256,
) -> DataFrame:
    """Global EXACT EASE_R without the O(n_items³) driver inverse: solve
    (G + λI) P = I column-block-wise with conjugate gradient inside an
    Arrow-batched ``mapInPandas`` kernel.

    This closes the gap the blocked path leaves open (cross-block weights
    approximated as 0 in ``ease_r_blocked``): every column here is solved
    against the FULL Gram, so the result converges to ``ease_r``'s closed
    form (equivalence tested) — while the driver never materializes or
    inverts a dense n×n matrix (EASE_R_Recommender.py:64, the reference's
    wall).

    Scale shape:
    - the Gram is computed DISTRIBUTED (pair-dots self-join + agg) and
      broadcast SPARSE as flat CSR arrays — O(nnz_G) bytes, not O(n²);
      nnz_G = Σ_u deg(u)² pair support, the same budget the similarity
      family already pays.
    - the unit-vector right-hand sides are the distributed input: each
      executor task CG-solves a bounded chunk of columns simultaneously
      (matrix-form CG — every step is a level-3 BLAS-ish batched op).
    - G + λI is symmetric positive definite, so CG is guaranteed to
      converge; λ lower-bounds the spectrum and thereby the rate.
    - CSR·X matvec uses the cumsum-difference segment sum (not
      np.add.reduceat, whose empty-segment semantics return arr[start]
      instead of 0 for items with no co-occurrences).

    B[:, c] = −P[:, c] / P[c, c], diag forced to 0 — identical
    postprocessing to ``ease_r``.
    """
    from ..operators.similarity import pair_dots, similarity_top_k

    spark = urm.sparkSession
    try:  # Arrow transfer for the Gram collect (vanilla driver session)
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    except Exception:  # pragma: no cover
        pass

    dots = pair_dots(urm).toPandas()
    diag = (
        urm.groupBy("item_id")
        .agg(F.sum(F.col("value") * F.col("value")).alias("sq"))
        .toPandas()
    )
    ids = np.sort(diag["item_id"].to_numpy(dtype=np.int64))
    n = len(ids)
    rows = np.concatenate(
        [
            np.searchsorted(ids, dots["item_i"].to_numpy(dtype=np.int64)),
            np.searchsorted(ids, diag["item_id"].to_numpy(dtype=np.int64)),
        ]
    )
    cols = np.concatenate(
        [
            np.searchsorted(ids, dots["item_j"].to_numpy(dtype=np.int64)),
            np.searchsorted(ids, diag["item_id"].to_numpy(dtype=np.int64)),
        ]
    )
    data = np.concatenate(
        [
            dots["dot"].to_numpy(dtype=np.float64),
            diag["sq"].to_numpy(dtype=np.float64),
        ]
    )
    order = np.argsort(rows, kind="stable")
    rows, cols, data = rows[order], cols[order], data[order]
    indptr = np.searchsorted(rows, np.arange(n + 1)).astype(np.int64)
    bc = spark.sparkContext.broadcast((ids, indptr, cols, data))

    out_schema = StructType(
        [
            StructField("item_i", LongType()),
            StructField("item_j", LongType()),
            StructField("sim", DoubleType()),
        ]
    )

    def kernel(batches):
        limit_blas_threads()  # Spark tasks are the parallel unit
        b_ids, b_indptr, b_cols, b_data = bc.value
        nn = len(b_ids)

        def matvec(x):
            # y = (G + λI)·x for multi-RHS x (nn × B): gather + segment sum
            contrib = b_data[:, None] * x[b_cols, :]
            csum = np.concatenate(
                [np.zeros((1, x.shape[1])), np.cumsum(contrib, axis=0)]
            )
            return csum[b_indptr[1:]] - csum[b_indptr[:-1]] + l2 * x

        for pdf in batches:
            if len(pdf) == 0:
                continue
            col_pos = np.searchsorted(
                b_ids, pdf["item_id"].to_numpy(dtype=np.int64)
            )
            out_i: list[np.ndarray] = []
            out_j: list[np.ndarray] = []
            out_s: list[np.ndarray] = []
            for c0 in range(0, len(col_pos), cols_per_chunk):
                cs = col_pos[c0 : c0 + cols_per_chunk]
                bsz = len(cs)
                # CG on (G+λI)·X = E_cs, all columns at once
                x = np.zeros((nn, bsz))
                r = np.zeros((nn, bsz))
                r[cs, np.arange(bsz)] = 1.0
                p = r.copy()
                rs = (r * r).sum(axis=0)
                for _ in range(n_iters):
                    ap = matvec(p)
                    denom = (p * ap).sum(axis=0)
                    alive = denom > 0
                    alpha = np.where(alive, rs / np.where(alive, denom, 1.0), 0.0)
                    x += p * alpha
                    r -= ap * alpha
                    rs_new = (r * r).sum(axis=0)
                    if rs_new.max() < tol:
                        break
                    beta = np.where(rs > 0, rs_new / np.where(rs > 0, rs, 1.0), 0.0)
                    p = r + p * beta
                    rs = rs_new
                pdiag = x[cs, np.arange(bsz)]
                b = x / (-pdiag)
                b[cs, np.arange(bsz)] = 0.0
                nz_i, nz_c = np.nonzero(np.abs(b) > 1e-12)
                out_i.append(b_ids[nz_i])
                out_j.append(b_ids[cs[nz_c]])
                out_s.append(b[nz_i, nz_c])
            yield pd.DataFrame(
                {
                    "item_i": np.concatenate(out_i) if out_i else [],
                    "item_j": np.concatenate(out_j) if out_j else [],
                    "sim": np.concatenate(out_s) if out_s else [],
                }
            )

    # task count from the DATA (n items / CG column-chunk width), not from
    # the session's core count — the r16 rule every other kernel site
    # follows (guide §2.2); n is already known driver-side from the
    # broadcast Gram build above
    probes = (
        urm.select("item_id")
        .distinct()
        .repartition(max(2, -(-n // cols_per_chunk)))
    )
    w = probes.mapInPandas(kernel, out_schema)
    if top_k is not None:
        w = similarity_top_k(w, top_k, round_digits=9)
    return w
