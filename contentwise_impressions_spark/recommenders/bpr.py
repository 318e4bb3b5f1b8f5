"""BPR matrix factorization with impression-aware negative sampling.

Reference:
- MF-BPR SGD kernels — MatrixFactorization/Cython/
  MatrixFactorization_Cython_Epoch.pyx:662-709 (gradient of log σ(−x_uij)
  with per-factor regularization) driven by
  MatrixFactorization_Cython.py:1-340.
- Impression-aware sampling — MatrixFactorizationImpressions_Cython_Epoch
  .pyx:1010-1084: negatives drawn *inside* the user's impression list minus
  seen (:1047-1049) or *outside* (uniform minus seen minus impressions,
  :1069-1079).

Spark decomposition (SURVEY.md §7 phase 5):
1. The SAMPLER is a DataFrame program — deterministic (hash-ordered) and
   independently checkable; at scale it's one anti-join + window per epoch.
2. The SGD is parallel minibatch with factor averaging: each partition
   updates a local copy of the factors over its triplets, partitions' deltas
   are averaged per id.  Sequential-SGD equivalence is by recommendation
   quality, not weight equality (reference kernels are order-dependent).
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

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

from ..functions.hashing import bucket_hash


def bpr_triplets(
    train: DataFrame,
    impressions: DataFrame | None = None,
    mode: str = "outside",
    items: DataFrame | None = None,
    n_props: int = 64,
    epoch: int = 0,
) -> DataFrame:
    """One (user_id, pos_item, neg_item) triplet per train positive.

    mode='inside':  negative = hash-first item among the user's impressions
                    minus seen (…Epoch.pyx:1047-1049) — already bounded by
                    the impression list.
    mode='outside': negative = first unseen item among `n_props` bounded
                    pseudo-random proposals per user (:1069-1079).  The
                    former formulation enumerated the user×item complement
                    (O(U·I) rows) just to keep one row per user; the
                    proposal generator is O(U·n_props) — the same Lehmer
                    mix as plans/mlops._bounded_negatives, reproducible in
                    the SQL twin.  A user whose n_props proposals all hit
                    seen∪impressions yields no triplet THIS epoch — the
                    fits pass ``epoch=N`` so the salted proposals rotate
                    and the user is redrawn next epoch, matching the
                    reference's per-epoch uniform redraw instead of
                    excluding heavy users from the whole run.
    ``epoch`` salts the deterministic pick; epoch=0 is byte-identical to
    the SQL twins of the registered sampler queries.  Deterministic
    arithmetic replaces the reference's uniform draw so the sampler is
    engine-reproducible; distributionally both are arbitrary-but-fixed
    picks.
    """
    if items is None:
        items = train.select("item_id").distinct()
    seen = train.select("user_id", "item_id")
    users = train.select("user_id").distinct()
    if mode == "inside":
        cand = (
            _inside_candidates(seen, impressions)
            .withColumn(
                "_ord",
                bucket_hash(
                    F.col("item_id"),
                    F.col("user_id") + F.lit(int(epoch)),
                ),
            )
            .withColumn("_tie", F.col("item_id"))
        )
    elif mode == "outside":
        # shared proposal stream (single source of truth for the Lehmer
        # mix that the SQL twins replicate — operators/splits.py)
        from ..operators.splits import bounded_item_proposals

        cand = (
            bounded_item_proposals(users, items, n_props=n_props, epoch=epoch)
            .select("user_id", "item_id", F.col("seq").alias("_ord"))
            .withColumn("_tie", F.col("_ord"))
            .join(seen, ["user_id", "item_id"], "left_anti")
        )
        if impressions is not None:
            cand = cand.join(
                impressions.select("user_id", "item_id"),
                ["user_id", "item_id"],
                "left_anti",
            )
    else:
        raise ValueError(f"unknown sampling mode: {mode}")
    w = Window.partitionBy("user_id").orderBy(
        F.col("_ord").asc(), F.col("_tie").asc()
    )
    neg = (
        cand.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("user_id", F.col("item_id").alias("neg_item"))
    )
    return train.select(
        "user_id", F.col("item_id").alias("pos_item")
    ).join(neg, "user_id", "inner")


def _inside_candidates(
    seen: DataFrame, impressions: DataFrame | None
) -> DataFrame:
    if impressions is None:
        raise ValueError("mode='inside' requires impressions")
    return (
        impressions.select("user_id", "item_id")
        .dropDuplicates(["user_id", "item_id"])
        .join(seen, ["user_id", "item_id"], "left_anti")
    )


def _init_factors(
    ids: DataFrame, id_col: str, rank: int, seed: int, salt: int
) -> DataFrame:
    """Deterministic distributed init: each id seeds its own rng, so the
    init is reproducible under ANY partitioning (no driver-side matrix)."""
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("features", ArrayType(DoubleType())),
        ]
    )

    def init(batches, _rank=rank, _seed=seed, _salt=salt, _col=id_col):
        for pdf in batches:
            rows = [
                (
                    int(fid),
                    np.random.default_rng((_seed, _salt, int(fid)))
                    .normal(0.0, 0.1, _rank)
                    .tolist(),
                )
                for fid in pdf[_col]
            ]
            yield pd.DataFrame(rows, columns=[_col, "features"])

    return ids.select(F.col(id_col).cast("bigint")).mapInPandas(init, schema)


def bpr_mf_fit(
    train: DataFrame,
    rank: int = 16,
    epochs: int = 5,
    lr: float = 0.05,
    reg: float = 0.002,
    seed: int = 42,
    impressions: DataFrame | None = None,
    mode: str = "outside",
    n_buckets: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Parallel minibatch BPR: per-bucket local SGD + delta averaging.

    Returns (user_factors, item_factors) DataFrames (id, features).

    Scale shape — factor state NEVER funnels through the driver (the
    round-3 review's remaining hotspot): factors live in DataFrames
    end-to-end.  Each epoch:

    1. triplets are bucketed by user hash; a bucket's task receives its
       users' factor rows (co-bucketed — each user in exactly one bucket,
       no replication) plus the factors of exactly the items its triplets
       touch (the per-bucket WORKING SET, built by a distinct+join — an
       item's row replicates only to buckets that use it);
    2. local sequential SGD per bucket over its (sorted) triplets;
    3. per-id deltas are averaged across buckets with a groupBy and
       joined back into the factor DataFrames (zip_with add);
       localCheckpoint truncates the per-epoch lineage.

    Driver memory is O(1) and per-epoch shuffle volume is
    O(|triplets| + (n_users + Σ_bucket |working set|)·rank) — linear.
    Sequential-SGD equivalence is by recommendation quality, not weight
    equality (reference kernels are order-dependent; so is bucketing).
    """
    spark = train.sparkSession
    if n_buckets is None:
        n_buckets = spark.sparkContext.defaultParallelism
    B = int(n_buckets)

    users = train.select("user_id").distinct()
    items = train.select("item_id").distinct()
    if impressions is not None:
        items = items.unionByName(
            impressions.select("item_id")
        ).distinct()
    u_fac = _init_factors(users, "user_id", rank, seed, 1).localCheckpoint()
    i_fac = _init_factors(items, "item_id", rank, seed, 2).localCheckpoint()

    out_schema = StructType(
        [
            StructField("kind", StringType()),
            StructField("fid", LongType()),
            StructField("delta", ArrayType(DoubleType())),
        ]
    )
    null_id = F.lit(None).cast("bigint")

    _lr, _reg = float(lr), float(reg)

    def epoch_task(pdf: pd.DataFrame) -> pd.DataFrame:
        limit_blas_threads()  # Spark tasks are the parallel unit
        t = pdf[pdf["_tag"] == "t"].sort_values(["a", "b2", "c"])
        empty = pd.DataFrame({"kind": [], "fid": [], "delta": []}).astype(
            {"kind": "str", "fid": "int64"}
        )
        if len(t) == 0:
            return empty
        urows = pdf[pdf["_tag"] == "u"]
        irows = pdf[pdf["_tag"] == "i"]
        uu = {
            int(a): np.asarray(f, dtype=np.float64)
            for a, f in zip(urows["a"], urows["feats"])
        }
        vv = {
            int(a): np.asarray(f, dtype=np.float64)
            for a, f in zip(irows["a"], irows["feats"])
        }
        orig_u, orig_v = dict(uu), dict(vv)  # updates rebind, never mutate
        for u, i, j in zip(
            t["a"].to_numpy(), t["b2"].to_numpy(), t["c"].to_numpy()
        ):
            u, i, j = int(u), int(i), int(j)
            xu, vi, vj = uu[u], vv[i], vv[j]
            x_uij = xu @ (vi - vj)
            sig = 1.0 / (1.0 + np.exp(x_uij))
            uu[u] = xu + _lr * (sig * (vi - vj) - _reg * xu)
            vv[i] = vi + _lr * (sig * xu - _reg * vi)
            vv[j] = vj + _lr * (-sig * xu - _reg * vj)
        rows = [
            ("u", fid, (uu[fid] - orig_u[fid]).tolist())
            for fid in sorted(uu)
            if uu[fid] is not orig_u[fid]
        ] + [
            ("i", fid, (vv[fid] - orig_v[fid]).tolist())
            for fid in sorted(vv)
            if vv[fid] is not orig_v[fid]
        ]
        if not rows:
            return empty
        return pd.DataFrame(rows, columns=["kind", "fid", "delta"])

    zeros = F.array_repeat(F.lit(0.0), rank)
    for ep in range(epochs):
        # fresh epoch-salted negatives (the reference redraws uniformly
        # every epoch; a user whose proposals all collided is recovered)
        triplets = (
            bpr_triplets(train, impressions=impressions, mode=mode, epoch=ep)
            .withColumn(
                "_b", F.pmod(F.xxhash64("user_id"), F.lit(B)).cast("int")
            )
            .persist()
        )
        # per-bucket item working set: only the factor rows a bucket's
        # triplets touch travel to it
        needs = (
            triplets.select("_b", F.col("pos_item").alias("item_id"))
            .unionByName(
                triplets.select("_b", F.col("neg_item").alias("item_id"))
            )
            .dropDuplicates(["_b", "item_id"])
        )
        i_side = needs.join(i_fac, "item_id").select(
            "_b",
            F.lit("i").alias("_tag"),
            F.col("item_id").alias("a"),
            null_id.alias("b2"),
            null_id.alias("c"),
            F.col("features").alias("feats"),
        )
        u_side = u_fac.select(
            F.pmod(F.xxhash64("user_id"), F.lit(B)).cast("int").alias("_b"),
            F.lit("u").alias("_tag"),
            F.col("user_id").alias("a"),
            null_id.alias("b2"),
            null_id.alias("c"),
            F.col("features").alias("feats"),
        )
        t_side = triplets.select(
            "_b",
            F.lit("t").alias("_tag"),
            F.col("user_id").alias("a"),
            F.col("pos_item").alias("b2"),
            F.col("neg_item").alias("c"),
            F.lit(None).cast("array<double>").alias("feats"),
        )
        unioned = t_side.unionByName(u_side).unionByName(i_side)
        deltas = unioned.repartition(B, "_b").groupBy("_b").applyInPandas(epoch_task, out_schema)
        avg = (
            deltas.select(
                "kind", "fid", F.posexplode("delta").alias("pos", "d")
            )
            .groupBy("kind", "fid", "pos")
            .agg(F.avg("d").alias("d"))
            .groupBy("kind", "fid")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "d"))).alias("pd")
            )
            .select(
                "kind", "fid", F.transform("pd", lambda s: s["d"]).alias("delta")
            )
        )
        u_fac = (
            u_fac.join(
                avg.filter(F.col("kind") == "u").select(
                    F.col("fid").alias("user_id"), "delta"
                ),
                "user_id",
                "left",
            )
            .select(
                "user_id",
                F.zip_with(
                    "features",
                    F.coalesce("delta", zeros),
                    lambda x, y: x + y,
                ).alias("features"),
            )
            .localCheckpoint()
        )
        i_fac = (
            i_fac.join(
                avg.filter(F.col("kind") == "i").select(
                    F.col("fid").alias("item_id"), "delta"
                ),
                "item_id",
                "left",
            )
            .select(
                "item_id",
                F.zip_with(
                    "features",
                    F.coalesce("delta", zeros),
                    lambda x, y: x + y,
                ).alias("features"),
            )
            .localCheckpoint()
        )
        triplets.unpersist()

    return u_fac, i_fac


def slim_bpr_fit(
    train: DataFrame,
    epochs: int = 5,
    lr: float = 0.05,
    reg_pos: float = 0.0025,
    reg_neg: float = 0.00025,
    top_k: int = 10,
    impressions: DataFrame | None = None,
    mode: str = "outside",
) -> DataFrame:
    """SLIM-BPR: learn a sparse item-item W with BPR updates.

    Reference: SLIM_BPR/Cython/SLIM_BPR_Cython_Epoch.pyx:59-1421 driven by
    SLIM_BPR_Cython.py:50-220 — score x_ui = Σ_{l∈S(u), l≠i} W[l,i]; per
    triplet (u,i,j) the gradient touches W rows restricted to the user's
    profile, with separate positive/negative regularization.  The dense/
    sparse/symmetric storage auto-select (SLIM_BPR_Cython.py:97-114) is
    obsolete here.

    DRIVER-SIDE TEST-SCALE TWIN (documented ceiling, like the NMF twin in
    recommenders/factor.py): W is a DENSE n_items × n_items matrix during
    training — O(n_i²) driver memory, fine to ~20k items, a wall beyond.
    The distributed scale path for learning a sparse item-item W is SLIM
    ElasticNet (recommenders/slim.py: per-column CD inside applyInPandas,
    embarrassingly parallel over items) or EASE_R blocked/CG; this twin
    exists for parity with the reference's BPR-flavored W updates
    (triplet sampling shares the distributed bpr_triplets program).
    Returns (item_i, item_j, sim, rank) with top_k rows per item_j.
    """
    spark = train.sparkSession
    n_i = int(train.agg(F.max("item_id")).collect()[0][0]) + 1
    w = np.zeros((n_i, n_i))

    profiles: dict[int, np.ndarray] = {}
    for row in (
        train.groupBy("user_id")
        .agg(F.sort_array(F.collect_list("item_id")).alias("items"))
        .collect()
    ):
        profiles[row["user_id"]] = np.array(row["items"], dtype=np.int64)

    for ep in range(epochs):
        triplets = (
            bpr_triplets(train, impressions=impressions, mode=mode, epoch=ep)
            .orderBy("user_id", "pos_item")
            .collect()
        )
        for row in triplets:
            u, i, j = row["user_id"], row["pos_item"], row["neg_item"]
            prof = profiles[u]
            mask = prof[prof != i]
            x_uij = w[mask, i].sum() - w[mask, j].sum()
            sig = 1.0 / (1.0 + np.exp(x_uij))
            w[mask, i] += lr * (sig - reg_pos * w[mask, i])
            w[mask, j] -= lr * (sig + reg_neg * w[mask, j])
            w[i, i] = 0.0
            w[j, j] = 0.0

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    nz = np.argwhere(np.abs(w) > 1e-12)
    schema = StructType(
        [
            StructField("item_i", LongType()),
            StructField("item_j", LongType()),
            StructField("sim", DoubleType()),
        ]
    )
    wdf = spark.createDataFrame(
        [(int(a), int(b), float(w[a, b])) for a, b in nz], schema
    )
    from ..operators.similarity import similarity_top_k

    return similarity_top_k(wdf, top_k, round_digits=9)


def slim_bpr_fit_distributed(
    train: DataFrame,
    epochs: int = 5,
    lr: float = 0.05,
    reg_pos: float = 0.0025,
    reg_neg: float = 0.00025,
    top_k: int = 10,
    impressions: DataFrame | None = None,
    mode: str = "outside",
    n_buckets: int | None = None,
) -> DataFrame:
    """SLIM-BPR with W as a SPARSE DISTRIBUTED table — no dense n_items²
    matrix anywhere (the driver twin's documented ceiling removed).

    Reference semantics: SLIM_BPR/Cython/SLIM_BPR_Cython_Epoch.pyx:59-1421
    (per-triplet gradient restricted to the user's profile rows, separate
    positive/negative regularization).  Spark decomposition — the bucketed
    parallel-minibatch shape of :func:`bpr_mf_fit`:

    - triplets co-bucket by user with the user PROFILES (seen-item lists);
    - each bucket receives exactly the W entries whose TARGET column is
      one of its triplets' pos/neg items (an equi-join on item_c — a W
      entry ships only to buckets that will read it);
    - local sequential updates over a sparse {(l, c): w} dict; per-entry
      deltas are averaged across buckets and full-outer-merged into W
      (new support appears as the union of profile-rows × touched-targets
      — the same co-occurrence support class SLIM-EN's solution has);
    - W never leaves the cluster; the diagonal is never touched because
      l ranges over prof(u)\\{i} and the negative j is unseen by
      construction.

    Returns (item_i, item_j, sim, rank), top_k rows per item_j.
    """
    from ..operators.similarity import similarity_top_k

    spark = train.sparkSession
    if n_buckets is None:
        n_buckets = spark.sparkContext.defaultParallelism
    B = int(n_buckets)

    # profiles are epoch-invariant — checkpoint once, not one groupBy
    # per epoch through the lazily-rebuilt p_side
    profiles = (
        train.groupBy("user_id")
        .agg(F.sort_array(F.collect_list("item_id")).alias("items"))
        .localCheckpoint()
    )

    w_schema = StructType(
        [
            StructField("item_l", LongType()),
            StructField("item_c", LongType()),
            StructField("w", DoubleType()),
        ]
    )
    w_df = spark.createDataFrame([], w_schema).localCheckpoint()

    _lr, _rp, _rn = float(lr), float(reg_pos), float(reg_neg)

    def epoch_task(pdf: pd.DataFrame) -> pd.DataFrame:
        limit_blas_threads()  # Spark tasks are the parallel unit
        t = pdf[pdf["_tag"] == "t"].sort_values(["a", "b2", "c"])
        empty = pd.DataFrame({"item_l": [], "item_c": [], "d": []}).astype(
            {"item_l": "int64", "item_c": "int64", "d": "float64"}
        )
        if len(t) == 0:
            return empty
        prows = pdf[pdf["_tag"] == "p"]
        prof = {
            int(a): np.asarray(arr, dtype=np.int64)
            for a, arr in zip(prows["a"], prows["arr"])
        }
        wrows = pdf[pdf["_tag"] == "w"]
        ws: dict[tuple[int, int], float] = {
            (int(l), int(c)): float(v)
            for l, c, v in zip(wrows["a"], wrows["b2"], wrows["val"])
        }
        orig = dict(ws)
        for u, i, j in zip(
            t["a"].to_numpy(), t["b2"].to_numpy(), t["c"].to_numpy()
        ):
            u, i, j = int(u), int(i), int(j)
            mask = prof[u]
            mask = mask[mask != i]
            x_uij = 0.0
            for l in mask:
                x_uij += ws.get((l, i), 0.0) - ws.get((l, j), 0.0)
            sig = 1.0 / (1.0 + np.exp(x_uij))
            for l in mask:
                li, lj = (int(l), i), (int(l), j)
                wi = ws.get(li, 0.0)
                wj = ws.get(lj, 0.0)
                ws[li] = wi + _lr * (sig - _rp * wi)
                ws[lj] = wj - _lr * (sig + _rn * wj)
        rows = [
            (l, c, v - orig.get((l, c), 0.0))
            for (l, c), v in sorted(ws.items())
            if v != orig.get((l, c), 0.0)
        ]
        if not rows:
            return empty
        return pd.DataFrame(rows, columns=["item_l", "item_c", "d"])

    out_schema = StructType(
        [
            StructField("item_l", LongType()),
            StructField("item_c", LongType()),
            StructField("d", DoubleType()),
        ]
    )
    null_id = F.lit(None).cast("bigint")
    null_arr = F.lit(None).cast("array<bigint>")
    null_val = F.lit(None).cast("double")

    for ep in range(epochs):
        # fresh epoch-salted negatives (reference redraws every epoch)
        triplets = (
            bpr_triplets(train, impressions=impressions, mode=mode, epoch=ep)
            .withColumn(
                "_b", F.pmod(F.xxhash64("user_id"), F.lit(B)).cast("int")
            )
            .persist()
        )
        targets = (
            triplets.select("_b", F.col("pos_item").alias("item_c"))
            .unionByName(triplets.select("_b", F.col("neg_item").alias("item_c")))
            .dropDuplicates(["_b", "item_c"])
        )
        w_side = targets.join(w_df, "item_c").select(
            "_b",
            F.lit("w").alias("_tag"),
            F.col("item_l").alias("a"),
            F.col("item_c").alias("b2"),
            null_id.alias("c"),
            null_arr.alias("arr"),
            F.col("w").alias("val"),
        )
        p_side = profiles.select(
            F.pmod(F.xxhash64("user_id"), F.lit(B)).cast("int").alias("_b"),
            F.lit("p").alias("_tag"),
            F.col("user_id").alias("a"),
            null_id.alias("b2"),
            null_id.alias("c"),
            F.col("items").alias("arr"),
            null_val.alias("val"),
        )
        t_side = triplets.select(
            "_b",
            F.lit("t").alias("_tag"),
            F.col("user_id").alias("a"),
            F.col("pos_item").alias("b2"),
            F.col("neg_item").alias("c"),
            null_arr.alias("arr"),
            null_val.alias("val"),
        )
        unioned = t_side.unionByName(p_side).unionByName(w_side)
        deltas = unioned.repartition(B, "_b").groupBy("_b").applyInPandas(epoch_task, out_schema)
        avg = deltas.groupBy("item_l", "item_c").agg(F.avg("d").alias("d"))
        w_df = (
            w_df.join(avg, ["item_l", "item_c"], "full_outer")
            .select(
                "item_l",
                "item_c",
                (
                    F.coalesce("w", F.lit(0.0)) + F.coalesce("d", F.lit(0.0))
                ).alias("w"),
            )
            .filter(F.col("w") != 0.0)
            .localCheckpoint()
        )
        triplets.unpersist()

    wdf = w_df.select(
        F.col("item_l").alias("item_i"),
        F.col("item_c").alias("item_j"),
        F.col("w").alias("sim"),
    )
    return similarity_top_k(wdf, top_k, round_digits=9)
