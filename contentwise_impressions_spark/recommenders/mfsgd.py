"""Explicit-rating MF-SGD variants: FunkSVD and AsySVD.

Reference:
- FunkSVD — MatrixFactorization/Cython/MatrixFactorization_Cython.py:195-225
  (class MatrixFactorization_FunkSVD_Cython) with the pointwise epoch kernel
  in MatrixFactorization_Cython_Epoch.pyx:286-390: pred = g + b_u + b_i +
  w_u·h_i, err = r − pred, SGD on the regularized squared loss with separate
  bias/user/item regs.
- AsySVD — MatrixFactorization_Cython.py:227-266 (class
  MatrixFactorization_AsySVD_Cython; Koren 2008) with the epoch kernel at
  MatrixFactorization_Cython_Epoch.pyx:393-520: TWO item-factor matrices
  X and Y; the user profile is the y-sum over the user's rated items divided
  by sqrt(profile length); pred = g + b_u + b_i + p_u·x_i; per sample every
  rated item's y_l gets the gradient err·x_i − reg·y_l.  Final user factors
  are re-estimated as (URM·Y)/sqrt(profile length)
  (MatrixFactorization_Cython.py:287-309).
- AdaGrad option — …Epoch.pyx adaptive_gradient (useAdaGrad branch):
  cache += g², step = lr·g/(√cache + 1e-8); selected by sgd_mode='adagrad'
  exactly like the reference fit()'s sgd_mode argument.

Spark decomposition — the same bucketed parallel-minibatch shape as
``recommenders.bpr.bpr_mf_fit`` (per-bucket local SGD over co-bucketed
users + per-bucket item working sets, per-id delta averaging, factor state
never on the driver; only the scalar global bias crosses per epoch).  The
reference samples uniformly with replacement; the deterministic analog is
one ordered pass over the rated pairs per epoch — equivalence is by
prediction quality (RMSE gates), not weight equality, exactly as for BPR.

State layout: each id's ``features`` array is [params… | adagrad cache…]
(cache half present only in adagrad mode, sliced off on return).  For
FunkSVD and AsySVD-X the params are [factors…, bias]; AsySVD-Y params are
[factors…]; user-bias rows are [b_u].
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import bucket_hash

try:  # by-value pickling: executors need no PYTHONPATH (see slim.py note)
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

from ..functions.blasctl import limit_blas_threads  # noqa: E402
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .bpr import _init_factors

_DELTA = StructType(
    [
        StructField("kind", StringType()),
        StructField("fid", LongType()),
        StructField("delta", ArrayType(DoubleType())),
    ]
)


def _avg_deltas(deltas: DataFrame) -> DataFrame:
    """Per-(kind, fid) element-wise average of bucket deltas.

    A diverged bucket (NaN/Inf anywhere in a delta) is dropped ROW-wise
    before averaging so one bad bucket cannot poison the shared factor
    state — the healthy buckets' average still applies, and the global-
    bias row of the same bucket is filtered by the same predicate (the
    driver-side `_collect_g_delta` NaN check is then just a backstop)."""
    finite = deltas.filter(
        ~F.exists(
            "delta", lambda x: F.isnan(x) | (F.abs(x) > F.lit(1e300))
        )
    )
    return (
        finite.select("kind", "fid", F.posexplode("delta").alias("pos", "d"))
        .groupBy("kind", "fid", "pos")
        .agg(F.avg("d").alias("d"))
        .groupBy("kind", "fid")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "d"))).alias("pd"))
        .select(
            "kind", "fid", F.transform("pd", lambda s: s["d"]).alias("delta")
        )
    )


def _apply_delta(
    fac: DataFrame, avg: DataFrame, kind: str, id_col: str, width: int
) -> DataFrame:
    zeros = F.array_repeat(F.lit(0.0), width)
    return (
        fac.join(
            avg.filter(F.col("kind") == kind).select(
                F.col("fid").alias(id_col), "delta"
            ),
            id_col,
            "left",
        )
        .select(
            id_col,
            F.zip_with(
                "features", F.coalesce("delta", zeros), lambda x, y: x + y
            ).alias("features"),
        )
        .localCheckpoint()
    )


def _with_state(fac: DataFrame, extra: int) -> DataFrame:
    """Append `extra` zero slots (bias and/or adagrad cache) to features."""
    if extra == 0:
        return fac.localCheckpoint()
    return fac.select(
        fac.columns[0],
        F.concat(
            "features", F.array_repeat(F.lit(0.0), extra)
        ).alias("features"),
    ).localCheckpoint()


def _slice_params(fac: DataFrame, width: int) -> DataFrame:
    """Drop the adagrad cache half: features[:width]."""
    return fac.select(
        fac.columns[0], F.slice("features", 1, width).alias("features")
    )


def _tagged_row(tag: str, id_col, b2=None, r=None, feats=None):
    null_id = F.lit(None).cast("bigint")
    return [
        F.lit(tag).alias("_tag"),
        F.col(id_col).alias("a") if isinstance(id_col, str) else id_col.alias("a"),
        (null_id if b2 is None else F.col(b2)).alias("b2"),
        (F.lit(None).cast("double") if r is None else F.col(r)).alias("r"),
        (
            F.lit(None).cast("array<double>") if feats is None else F.col(feats)
        ).alias("feats"),
    ]


def _user_bucket(B: int):
    """Portable deterministic user->bucket assignment (functions/hashing).

    The epoch decomposition is bucket-agnostic (any co-bucketing of users
    is a valid parallel minibatch split), so the PORTABLE multiplicative
    hash is used instead of xxhash64 — making the fit's exact epoch-0
    sample stream reproducible by an external SQL engine (the
    ``funk_svd_epoch0_stream`` oracle certifies it row-for-row)."""
    return bucket_hash(F.col("user_id"), mod=B).cast("int")


def epoch0_stream(ratings: DataFrame, n_buckets: int) -> DataFrame:
    """(bucket, seq, user_id, item_id, rating): the deterministic ordered
    sample stream the bucketed SGD consumes at every epoch — exactly the
    rows and per-bucket order ``epoch_task`` iterates (its
    ``sort_values(["a", "b2"])`` pass over tag-'t' rows; the reference's
    single-threaded analog is the ordered rated-pairs sweep in
    MatrixFactorization_Cython_Epoch.pyx:286-390).

    SQL-expressible by construction (portable bucket hash + row_number),
    so the DuckDB oracle checks the fit's input decomposition row-for-row
    even though the SGD fit itself is iterative/rows-only."""
    B = int(n_buckets)
    samples = ratings.select(
        "user_id", "item_id", F.col("rating").cast("double").alias("rating")
    ).withColumn("bucket", _user_bucket(B))
    w = Window.partitionBy("bucket").orderBy("user_id", "item_id")
    return samples.select(
        "bucket",
        F.row_number().over(w).cast("bigint").alias("seq"),
        "user_id",
        "item_id",
        "rating",
    )


def _mean_rating(samples: DataFrame) -> float:
    return float(samples.agg(F.avg("rating")).collect()[0][0] or 0.0)


def _collect_g_delta(avg: DataFrame) -> np.ndarray | None:
    grow = avg.filter(F.col("kind") == "g").select("delta").collect()
    if not grow or grow[0][0] is None:
        return None
    arr = np.asarray(grow[0][0], dtype=np.float64)
    return None if np.isnan(arr).any() else arr


def _ada_step(
    params: np.ndarray, grad: np.ndarray, cache: np.ndarray, lr: float
) -> tuple[np.ndarray, np.ndarray]:
    """AdaGrad (…Epoch.pyx adaptive_gradient, useAdaGrad branch):
    cache += g²; step = lr·g/(√cache + 1e-8)."""
    c2 = cache + grad * grad
    return params + lr * grad / (np.sqrt(c2) + 1e-8), c2


def funk_svd_fit(
    ratings: DataFrame,
    rank: int = 8,
    epochs: int = 5,
    lr: float = 0.02,
    user_reg: float = 0.01,
    item_reg: float = 0.01,
    bias_reg: float = 0.01,
    use_bias: bool = True,
    sgd_mode: str = "sgd",
    seed: int = 42,
    n_buckets: int | None = None,
) -> tuple[DataFrame, DataFrame, float]:
    """FunkSVD: returns (user_factors, item_factors, global_bias).

    Factor DataFrames carry ``features`` arrays of length rank+1 — the
    LAST slot is the id's bias term (0.0 when use_bias=False), so scoring
    is one zip_with dot after :func:`scoring_factors` pads the other
    side's bias slot with 1.  State stays distributed end to end; only
    the scalar global bias crosses the driver per epoch.

    ``sgd_mode='adagrad'`` turns on per-parameter adaptive steps (the
    reference's sgd_mode fit argument) — scale-free in the rating
    magnitude, which is what makes biases converge in few epochs on
    wide-range ratings.
    """
    if sgd_mode not in ("sgd", "adagrad"):
        raise ValueError(f"unknown sgd_mode: {sgd_mode}")
    ada = sgd_mode == "adagrad"
    spark = ratings.sparkSession
    if n_buckets is None:
        n_buckets = spark.sparkContext.defaultParallelism
    B = int(n_buckets)
    W = rank + 1  # factor slots + bias slot
    SW = 2 * W if ada else W

    samples = (
        ratings.select("user_id", "item_id", F.col("rating").cast("double"))
        .withColumn("_b", _user_bucket(B))
        .persist()
    )
    samples.count()
    # init the global bias at the mean — the reference inits 0 and learns
    # it; starting at mu removes bias burn-in, same optimum
    g = _mean_rating(samples) if use_bias else 0.0
    g_cache = 0.0

    users = ratings.select("user_id").distinct()
    items = ratings.select("item_id").distinct()
    u_fac = _with_state(_init_factors(users, "user_id", rank, seed, 3), SW - rank)
    i_fac = _with_state(_init_factors(items, "item_id", rank, seed, 4), SW - rank)

    _lr, _ur, _ir, _br = (
        float(lr),
        float(user_reg),
        float(item_reg),
        float(bias_reg),
    )
    _bias, _ada, _W = bool(use_bias), ada, int(W)

    for _ in range(epochs):
        g_now, gc_now = g, g_cache

        def epoch_task(
            pdf: pd.DataFrame, *, _g=g_now, _gc=gc_now
        ) -> pd.DataFrame:
            limit_blas_threads()  # Spark tasks are the parallel unit
            t = pdf[pdf["_tag"] == "t"].sort_values(["a", "b2"])
            empty = pd.DataFrame({"kind": [], "fid": [], "delta": []}).astype(
                {"kind": "str", "fid": "int64"}
            )
            if len(t) == 0:
                return empty
            uu = {
                int(a): np.asarray(f, dtype=np.float64)
                for a, f in zip(
                    pdf.loc[pdf["_tag"] == "u", "a"],
                    pdf.loc[pdf["_tag"] == "u", "feats"],
                )
            }
            vv = {
                int(a): np.asarray(f, dtype=np.float64)
                for a, f in zip(
                    pdf.loc[pdf["_tag"] == "i", "a"],
                    pdf.loc[pdf["_tag"] == "i", "feats"],
                )
            }
            orig_u, orig_v = dict(uu), dict(vv)
            gl, gcl = _g, _gc
            for u, i, r in zip(
                t["a"].to_numpy(), t["b2"].to_numpy(), t["r"].to_numpy()
            ):
                u, i = int(u), int(i)
                wu_all, hi_all = uu[u], vv[i]
                wu, hi = wu_all[:_W], hi_all[:_W]
                w, h = wu[:-1], hi[:-1]
                pred = w @ h + (gl + wu[-1] + hi[-1] if _bias else 0.0)
                err = r - pred
                gu = np.empty(_W)
                gu[:-1] = err * h - _ur * w
                gu[-1] = (err - _br * wu[-1]) if _bias else 0.0
                gi = np.empty(_W)
                gi[:-1] = err * w - _ir * h
                gi[-1] = (err - _br * hi[-1]) if _bias else 0.0
                if _ada:
                    nw, cu = _ada_step(wu, gu, wu_all[_W:], _lr)
                    nh, ci = _ada_step(hi, gi, hi_all[_W:], _lr)
                    uu[u] = np.concatenate((nw, cu))
                    vv[i] = np.concatenate((nh, ci))
                    if _bias:
                        gg = err - _br * gl
                        gcl += gg * gg
                        gl += _lr * gg / (np.sqrt(gcl) + 1e-8)
                else:
                    uu[u] = wu + _lr * gu
                    vv[i] = hi + _lr * gi
                    if _bias:
                        gl += _lr * (err - _br * gl)
            rows = [
                ("u", fid, (uu[fid] - orig_u[fid]).tolist())
                for fid in sorted(uu)
                if uu[fid] is not orig_u[fid]
            ] + [
                ("i", fid, (vv[fid] - orig_v[fid]).tolist())
                for fid in sorted(vv)
                if vv[fid] is not orig_v[fid]
            ]
            if _bias:
                rows.append(("g", 0, [gl - _g, gcl - _gc]))
            if not rows:
                return empty
            return pd.DataFrame(rows, columns=["kind", "fid", "delta"])

        needs = samples.select("_b", "item_id").dropDuplicates(
            ["_b", "item_id"]
        )
        i_side = needs.join(i_fac, "item_id").select(
            "_b", *_tagged_row("i", "item_id", feats="features")
        )
        u_side = u_fac.select(
            _user_bucket(B).alias("_b"),
            *_tagged_row("u", "user_id", feats="features"),
        )
        t_side = samples.select(
            "_b", *_tagged_row("t", "user_id", b2="item_id", r="rating")
        )
        unioned = t_side.unionByName(u_side).unionByName(i_side)
        deltas = unioned.repartition(B, "_b").groupBy("_b").applyInPandas(epoch_task, _DELTA)
        avg = _avg_deltas(deltas).persist()
        if use_bias:
            gd = _collect_g_delta(avg)
            if gd is not None:
                g += float(gd[0])
                g_cache += float(gd[1])
        u_fac = _apply_delta(u_fac, avg, "u", "user_id", SW)
        i_fac = _apply_delta(i_fac, avg, "i", "item_id", SW)
        avg.unpersist()

    samples.unpersist()
    if ada:
        u_fac, i_fac = _slice_params(u_fac, W), _slice_params(i_fac, W)
    return u_fac, i_fac, g


def scoring_factors(
    u_fac: DataFrame, i_fac: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Pad ([f…, b_u] → [f…, b_u, 1]) and ([f…, b_i] → [f…, 1, b_i]) so the
    plain zip_with dot equals f·h + b_u + b_i — reuses factor.mf_scores."""
    u = u_fac.select(
        "user_id", F.concat("features", F.array(F.lit(1.0))).alias("features")
    )
    rank1 = F.size("features") - 1
    i = i_fac.select(
        "item_id",
        F.concat(
            F.slice("features", 1, rank1),
            F.array(F.lit(1.0)),
            F.slice("features", F.size("features"), 1),
        ).alias("features"),
    )
    return u, i


def predict_ratings(
    pairs: DataFrame, u_fac: DataFrame, i_fac: DataFrame, g: float
) -> DataFrame:
    """Rating predictions g + b_u + b_i + w·h for (user_id, item_id) pairs,
    with graceful cold fallbacks: a missing side contributes 0, so a cold
    user/item degrades to the bias model (exactly how GlobalEffects
    handles unseen ids) instead of a hard 0 score.  Expects bias-in-last-
    slot factor layout from :func:`funk_svd_fit` / :func:`asy_user_factors`."""
    u = u_fac.select("user_id", F.col("features").alias("_uf"))
    i = i_fac.select("item_id", F.col("features").alias("_if"))
    dot = F.aggregate(
        F.zip_with(
            F.slice("_uf", 1, F.size("_uf") - 1),
            F.slice("_if", 1, F.size("_if") - 1),
            lambda a, b: a * b,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    bu = F.element_at("_uf", F.size("_uf"))
    bi = F.element_at("_if", F.size("_if"))
    return (
        pairs.select("user_id", "item_id")
        .join(u, "user_id", "left")
        .join(F.broadcast(i), "item_id", "left")
        .select(
            "user_id",
            "item_id",
            (
                F.lit(float(g))
                + F.coalesce(bu, F.lit(0.0))
                + F.coalesce(bi, F.lit(0.0))
                + F.coalesce(
                    F.when(
                        F.col("_uf").isNotNull() & F.col("_if").isNotNull(),
                        dot,
                    ),
                    F.lit(0.0),
                )
            ).alias("score"),
        )
    )


def asy_svd_fit(
    ratings: DataFrame,
    rank: int = 8,
    epochs: int = 5,
    lr: float = 0.02,
    y_reg: float = 0.01,
    x_reg: float = 0.01,
    bias_reg: float = 0.01,
    use_bias: bool = True,
    sgd_mode: str = "sgd",
    seed: int = 42,
    n_buckets: int | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame, float]:
    """AsySVD: returns (item_factors_X, item_factors_Y, user_bias, g).

    X rows are ``features`` length rank+1 (last slot = item bias);
    Y rows are length rank; user_bias rows are (user_id, features=[b_u]).
    Users are represented only through the items they rated — use
    :func:`asy_user_factors` to materialize user factors for scoring
    (MatrixFactorization_Cython.py:287-309).

    Bucketing: samples co-bucket by user, and because each bucket's
    samples ARE its users' rated pairs, one distinct-items working set
    serves both X and Y.  The profile sum Σ y_l is maintained
    incrementally, which removes the re-summing cost — but each sample
    still sweeps all deg(u) of the user's y vectors (the reference's own
    per-sample update, …Epoch.pyx:393-520), so an epoch is
    O(Σ_u deg(u)² · rank): pathological power users dominate a bucket's
    wall-clock, the same quadratic the reference pays.
    ``sgd_mode='adagrad'`` as in :func:`funk_svd_fit`.
    """
    if sgd_mode not in ("sgd", "adagrad"):
        raise ValueError(f"unknown sgd_mode: {sgd_mode}")
    ada = sgd_mode == "adagrad"
    spark = ratings.sparkSession
    if n_buckets is None:
        n_buckets = spark.sparkContext.defaultParallelism
    B = int(n_buckets)
    XW, YW, BW = rank + 1, rank, 1
    SX = 2 * XW if ada else XW
    SY = 2 * YW if ada else YW
    SB = 2 * BW if ada else BW

    samples = (
        ratings.select("user_id", "item_id", F.col("rating").cast("double"))
        .withColumn("_b", _user_bucket(B))
        .persist()
    )
    samples.count()
    g = _mean_rating(samples) if use_bias else 0.0
    g_cache = 0.0

    users = ratings.select("user_id").distinct()
    items = ratings.select("item_id").distinct()
    x_fac = _with_state(_init_factors(items, "item_id", rank, seed, 5), SX - rank)
    y_fac = _with_state(_init_factors(items, "item_id", rank, seed, 6), SY - rank)
    ub = _with_state(
        users.select("user_id", F.array().cast("array<double>").alias("features")),
        SB,
    )

    _lr, _yr, _xr, _br = float(lr), float(y_reg), float(x_reg), float(bias_reg)
    _bias, _ada = bool(use_bias), ada
    _XW, _YW = int(XW), int(YW)

    for _ in range(epochs):
        g_now, gc_now = g, g_cache

        def epoch_task(
            pdf: pd.DataFrame, *, _g=g_now, _gc=gc_now
        ) -> pd.DataFrame:
            limit_blas_threads()  # Spark tasks are the parallel unit
            t = pdf[pdf["_tag"] == "t"].sort_values(["a", "b2"])
            empty = pd.DataFrame({"kind": [], "fid": [], "delta": []}).astype(
                {"kind": "str", "fid": "int64"}
            )
            if len(t) == 0:
                return empty
            xx = {
                int(a): np.asarray(f, dtype=np.float64)
                for a, f in zip(
                    pdf.loc[pdf["_tag"] == "x", "a"],
                    pdf.loc[pdf["_tag"] == "x", "feats"],
                )
            }
            yy = {
                int(a): np.asarray(f, dtype=np.float64)
                for a, f in zip(
                    pdf.loc[pdf["_tag"] == "y", "a"],
                    pdf.loc[pdf["_tag"] == "y", "feats"],
                )
            }
            bu = {
                int(a): np.asarray(f, dtype=np.float64)
                for a, f in zip(
                    pdf.loc[pdf["_tag"] == "b", "a"],
                    pdf.loc[pdf["_tag"] == "b", "feats"],
                )
            }
            orig_x, orig_y, orig_b = dict(xx), dict(yy), dict(bu)
            gl, gcl = _g, _gc
            ua = t["a"].to_numpy()
            ia = t["b2"].to_numpy()
            ra = t["r"].to_numpy()
            starts = np.flatnonzero(np.concatenate(([True], ua[1:] != ua[:-1])))
            bounds = np.concatenate((starts, [len(ua)]))
            for s0, s1 in zip(bounds[:-1], bounds[1:]):
                u = int(ua[s0])
                seen = [int(i) for i in ia[s0:s1]]
                inv_sq = 1.0 / np.sqrt(float(len(seen)))
                ysum = np.sum([yy[l][:_YW] for l in seen], axis=0)
                for k in range(s0, s1):
                    i, r = int(ia[k]), float(ra[k])
                    xi_all = xx[i]
                    xi = xi_all[:_XW]
                    x, bi = xi[:-1], xi[-1]
                    bu_u = bu[u][0]
                    profile = ysum * inv_sq
                    pred = profile @ x + (gl + bu_u + bi if _bias else 0.0)
                    err = r - pred
                    # y updates use the CURRENT x_i (reference order:
                    # USER factors first, then ITEM factors)
                    for l in seen:
                        yl_all = yy[l]
                        yl = yl_all[:_YW]
                        gy = err * x - _yr * yl
                        if _ada:
                            ny, cy = _ada_step(yl, gy, yl_all[_YW:], _lr)
                            yy[l] = np.concatenate((ny, cy))
                        else:
                            ny = yl + _lr * gy
                            yy[l] = ny
                        ysum = ysum + (ny - yl)
                    gx = np.empty(_XW)
                    gx[:-1] = err * profile - _xr * x
                    gx[-1] = (err - _br * bi) if _bias else 0.0
                    if _ada:
                        nx, cx = _ada_step(xi, gx, xi_all[_XW:], _lr)
                        xx[i] = np.concatenate((nx, cx))
                        if _bias:
                            gb = err - _br * bu_u
                            nb, cb = _ada_step(
                                bu[u][:1], np.array([gb]), bu[u][1:], _lr
                            )
                            bu[u] = np.concatenate((nb, cb))
                            gg = err - _br * gl
                            gcl += gg * gg
                            gl += _lr * gg / (np.sqrt(gcl) + 1e-8)
                    else:
                        xx[i] = xi + _lr * gx
                        if _bias:
                            bu[u] = bu[u] + _lr * np.array([err - _br * bu_u])
                            gl += _lr * (err - _br * gl)
            rows = (
                [
                    ("x", fid, (xx[fid] - orig_x[fid]).tolist())
                    for fid in sorted(xx)
                    if xx[fid] is not orig_x[fid]
                ]
                + [
                    ("y", fid, (yy[fid] - orig_y[fid]).tolist())
                    for fid in sorted(yy)
                    if yy[fid] is not orig_y[fid]
                ]
                + [
                    ("b", fid, (bu[fid] - orig_b[fid]).tolist())
                    for fid in sorted(bu)
                    if bu[fid] is not orig_b[fid]
                ]
            )
            if _bias:
                rows.append(("g", 0, [gl - _g, gcl - _gc]))
            if not rows:
                return empty
            return pd.DataFrame(rows, columns=["kind", "fid", "delta"])

        needs = samples.select("_b", "item_id").dropDuplicates(
            ["_b", "item_id"]
        )
        x_side = needs.join(x_fac, "item_id").select(
            "_b", *_tagged_row("x", "item_id", feats="features")
        )
        y_side = needs.join(y_fac, "item_id").select(
            "_b", *_tagged_row("y", "item_id", feats="features")
        )
        b_side = ub.select(
            _user_bucket(B).alias("_b"),
            *_tagged_row("b", "user_id", feats="features"),
        )
        t_side = samples.select(
            "_b", *_tagged_row("t", "user_id", b2="item_id", r="rating")
        )
        unioned = (
            t_side.unionByName(x_side).unionByName(y_side).unionByName(b_side)
        )
        deltas = unioned.repartition(B, "_b").groupBy("_b").applyInPandas(epoch_task, _DELTA)
        avg = _avg_deltas(deltas).persist()
        if use_bias:
            gd = _collect_g_delta(avg)
            if gd is not None:
                g += float(gd[0])
                g_cache += float(gd[1])
        x_fac = _apply_delta(x_fac, avg, "x", "item_id", SX)
        y_fac = _apply_delta(y_fac, avg, "y", "item_id", SY)
        ub = _apply_delta(ub, avg, "b", "user_id", SB)
        avg.unpersist()

    samples.unpersist()
    if ada:
        x_fac = _slice_params(x_fac, XW)
        y_fac = _slice_params(y_fac, YW)
        ub = _slice_params(ub, BW)
    return x_fac, y_fac, ub, g


def asy_user_factors(
    ratings: DataFrame, y_fac: DataFrame, ub: DataFrame | None = None
) -> DataFrame:
    """User factors from item profiles: (Σ_{l∈R(u)} y_l)/sqrt(|R(u)|),
    with the learned user bias appended as the last slot
    (MatrixFactorization_Cython.py:287-309) — a join + posexplode
    aggregation, fully distributed (also the COLD-user estimator: any
    user with rated items gets factors without having been in the fit)."""
    prof = (
        ratings.select("user_id", "item_id")
        .join(y_fac, "item_id")
        .select("user_id", F.posexplode("features").alias("pos", "v"))
        .groupBy("user_id", "pos")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        .groupBy("user_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "s"))).alias("ps"),
            # n is deg(u) in every (user, pos) group — take any one
            F.first("n").alias("_deg"),
        )
        .select(
            "user_id",
            F.transform("ps", lambda s: s["s"] / F.sqrt(F.col("_deg"))).alias(
                "features"
            ),
        )
    )
    if ub is None:
        return prof
    return prof.join(
        ub.select("user_id", F.element_at("features", 1).alias("_bu")),
        "user_id",
        "left",
    ).select(
        "user_id",
        F.concat("features", F.array(F.coalesce("_bu", F.lit(0.0)))).alias(
            "features"
        ),
    )
