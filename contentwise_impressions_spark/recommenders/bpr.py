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
) -> DataFrame:
    """One (user_id, pos_item, neg_item) triplet per train positive.

    mode='inside':  negative = hash-first item among the user's impressions
                    minus seen (…Epoch.pyx:1047-1049).
    mode='outside': negative = hash-first item among catalog minus seen
                    minus impressions (:1069-1079).
    Hash order replaces the reference's uniform draw so the sampler is
    engine-reproducible; distributionally both are arbitrary-but-fixed picks.
    """
    if items is None:
        items = train.select("item_id").distinct()
    seen = train.select("user_id", "item_id")
    users = train.select("user_id").distinct()
    if mode == "inside":
        if impressions is None:
            raise ValueError("mode='inside' requires impressions")
        cand = impressions.select("user_id", "item_id").dropDuplicates(
            ["user_id", "item_id"]
        ).join(seen, ["user_id", "item_id"], "left_anti")
    elif mode == "outside":
        cand = users.crossJoin(F.broadcast(items)).join(
            seen, ["user_id", "item_id"], "left_anti"
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
        bucket_hash(F.col("item_id"), F.col("user_id")), F.col("item_id").asc()
    )
    neg = (
        cand.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("user_id", F.col("item_id").alias("neg_item"))
    )
    return train.select(
        "user_id", F.col("item_id").alias("pos_item")
    ).join(neg, "user_id", "inner")


def bpr_mf_fit(
    train: DataFrame,
    rank: int = 16,
    epochs: int = 5,
    lr: float = 0.05,
    reg: float = 0.002,
    seed: int = 42,
    impressions: DataFrame | None = None,
    mode: str = "outside",
) -> tuple[DataFrame, DataFrame]:
    """Parallel minibatch BPR: per-partition local SGD + delta averaging.

    Returns (user_factors, item_factors) DataFrames (id, features).
    """
    spark = train.sparkSession
    n_u = int(train.agg(F.max("user_id")).collect()[0][0]) + 1
    n_i = int(train.agg(F.max("item_id")).collect()[0][0]) + 1
    rng = np.random.default_rng(seed)
    u_fac = rng.normal(0.0, 0.1, (n_u, rank))
    i_fac = rng.normal(0.0, 0.1, (n_i, rank))

    triplets = bpr_triplets(
        train, impressions=impressions, mode=mode
    ).repartition("user_id")
    triplets = triplets.persist()
    triplets.count()

    out_schema = StructType(
        [
            StructField("kind", StringType()),
            StructField("fid", LongType()),
            StructField("delta", ArrayType(DoubleType())),
        ]
    )

    for _ in range(epochs):
        bc_u = spark.sparkContext.broadcast(u_fac)
        bc_i = spark.sparkContext.broadcast(i_fac)

        def epoch(pdfs, _lr=lr, _reg=reg):
            uu = bc_u.value.copy()
            vv = bc_i.value.copy()
            touched_u, touched_i = set(), set()
            for pdf in pdfs:
                for u, i, j in zip(
                    pdf["user_id"].to_numpy(),
                    pdf["pos_item"].to_numpy(),
                    pdf["neg_item"].to_numpy(),
                ):
                    xu, vi, vj = uu[u], vv[i], vv[j]
                    x_uij = xu @ (vi - vj)
                    sig = 1.0 / (1.0 + np.exp(x_uij))
                    uu[u] = xu + _lr * (sig * (vi - vj) - _reg * xu)
                    vv[i] = vi + _lr * (sig * xu - _reg * vi)
                    vv[j] = vj + _lr * (-sig * xu - _reg * vj)
                    touched_u.add(int(u))
                    touched_i.add(int(i))
                    touched_i.add(int(j))
            rows = [
                ("u", fid, (uu[fid] - bc_u.value[fid]).tolist())
                for fid in touched_u
            ] + [
                ("i", fid, (vv[fid] - bc_i.value[fid]).tolist())
                for fid in touched_i
            ]
            yield pd.DataFrame(rows, columns=["kind", "fid", "delta"])

        deltas = (
            triplets.mapInPandas(epoch, out_schema)
            .select(
                "kind", "fid", F.posexplode("delta").alias("pos", "d")
            )
            .groupBy("kind", "fid", "pos")
            .agg(F.avg("d").alias("d"))
            .collect()
        )
        for row in deltas:
            if row["kind"] == "u":
                u_fac[row["fid"], row["pos"]] += row["d"]
            else:
                i_fac[row["fid"], row["pos"]] += row["d"]
        bc_u.unpersist()
        bc_i.unpersist()

    triplets.unpersist()
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
        [(i, u_fac[i].tolist()) for i in range(n_u)], schema_u
    )
    itf = spark.createDataFrame(
        [(j, i_fac[j].tolist()) for j in range(n_i)], schema_i
    )
    return uf, itf


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

    Parallel shape: the triplet sampler is the shared DataFrame op
    (bpr_triplets); updates run per-partition over broadcast W with delta
    averaging — same strategy as bpr_mf_fit; at harness scale a single
    driver pass is equivalent and cheaper, so partitions are coalesced.
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

    triplets = (
        bpr_triplets(train, impressions=impressions, mode=mode)
        .orderBy("user_id", "pos_item")
        .collect()
    )
    for _ in range(epochs):
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
