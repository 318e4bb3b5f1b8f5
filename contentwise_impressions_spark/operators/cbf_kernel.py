"""Blocked top-K kernel for content/hybrid item similarity.

Why this exists: the relational AᵀA (self-join on the feature key +
groupBy pair) materializes EVERY co-occurring pair.  Content features are
low-cardinality (a brand covers 4% of a 20k-item catalog), so the pair
support is effectively all-pairs — the join output is O(n_items²) rows and
no physical plan makes a quadratic output cheap.  When the feature space is
small-dimensional, the exact answer that never materializes the pair table
is a blocked matmul with streaming per-row top-K — the same argpartition
pattern the reference uses for its dense blocks
(Compute_Similarity_Python.py:276-298 block-wise AᵀA, topK at :345-360).

Kernel layout (per probe batch, inside Arrow-batched mapInPandas):
- ICM part: dense (n_items × n_features) matrix broadcast once;
  probe block × matrixᵀ is one BLAS call.
- CF part (hybrid): the user→items adjacency broadcast as CSR-style numpy
  arrays; a probe item's CF dot row is a bincount over the items of its
  users (Σ_u deg(u)² total work — the SPARSE pair support, not all-pairs).
- combined scores → round(9) → argsort top-K, id tiebreak.

Scale ceiling: broadcast is O(n_items·n_features + nnz_cf).  Past that,
shard the probe side (this already happens — it's the distributed input)
and the index side by item range, merging per-shard top-K — noted, not
needed at harness scale.
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

try:  # by-value pickling (see recommenders/slim.py note)
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

_OUT = StructType(
    [
        StructField("item_i", LongType()),
        StructField("item_j", LongType()),
        StructField("sim", DoubleType()),
        StructField("rank", IntegerType()),
    ]
)


def hybrid_cosine_topk_kernel(
    icm: DataFrame,
    cf: DataFrame | None,
    k: int = 5,
    icm_weight: float = 1.0,
    eps: float = 1e-6,
) -> DataFrame:
    """(item_i, item_j, sim, rank): cosine top-K over [ICM·w ⊕ URMᵀ].

    `icm`: (item_id, feature, value); `cf`: (user_id, item_id, value) or
    None for pure CBF.  Exactly equals the feature-union join formulation
    (ItemKNN_CFCBF_Hybrid_Recommender.py:20-29 + Compute_Similarity) —
    dot(i,j) = w²·icm_dot + cf_dot; ‖i‖² = w²·icm_sq + cf_deg.
    """
    spark = icm.sparkSession

    icm_pdf = icm.select("item_id", "feature", "value").toPandas()
    cf_pdf = (
        cf.select("user_id", "item_id", "value").toPandas()
        if cf is not None
        else None
    )
    feats = sorted(icm_pdf["feature"].unique())
    f_idx = {f: p for p, f in enumerate(feats)}
    item_set = set(icm_pdf["item_id"].tolist())
    if cf_pdf is not None:
        item_set |= set(cf_pdf["item_id"].tolist())
    items = sorted(item_set)
    i_idx = {it: p for p, it in enumerate(items)}
    n_items, n_feats = len(items), len(feats)
    dense = np.zeros((n_items, n_feats))
    dense[
        icm_pdf["item_id"].map(i_idx).to_numpy(),
        icm_pdf["feature"].map(f_idx).to_numpy(),
    ] = icm_pdf["value"].to_numpy() * icm_weight

    if cf_pdf is not None:
        u_codes, _ = pd.factorize(cf_pdf["user_id"], sort=True)
        i_codes = cf_pdf["item_id"].map(i_idx).to_numpy()
        vals = cf_pdf["value"].to_numpy()
        cf_deg = np.bincount(i_codes, weights=vals * vals, minlength=n_items)
        order_u = np.argsort(u_codes, kind="stable")
        splits_u = np.searchsorted(u_codes[order_u], np.arange(1, u_codes.max() + 1))
        user_items = np.split(i_codes[order_u], splits_u)
        order_i = np.argsort(i_codes, kind="stable")
        splits_i = np.searchsorted(i_codes[order_i], np.arange(1, n_items))
        item_users = np.split(u_codes[order_i], splits_i)
    else:
        user_items, item_users, cf_deg = [], [], np.zeros(n_items)

    ids = np.array(items, dtype=np.int64)
    norms = np.sqrt((dense * dense).sum(axis=1) + cf_deg)
    bc = spark.sparkContext.broadcast(
        (ids, dense, norms, user_items, item_users)
    )

    def kernel(batches):
        b_ids, b_dense, b_norms, b_user_items, b_item_users = bc.value
        id_to_pos = {int(v): p for p, v in enumerate(b_ids)}
        n = len(b_ids)
        margin = min(n, k + 64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pos_arr = np.array(
                [id_to_pos[int(it)] for it in pdf["item_id"]], dtype=np.int64
            )
            block = b_dense[pos_arr] @ b_dense.T  # one GEMM per batch
            out = []
            for r, pos in enumerate(pos_arr):
                row = block[r]
                if len(b_item_users):
                    cand = b_item_users[pos]
                    if len(cand):
                        js = np.concatenate([b_user_items[u] for u in cand])
                        row = row + np.bincount(js, minlength=n).astype(
                            np.float64
                        )
                sims = row / (b_norms[pos] * b_norms + eps)
                sims[pos] = -np.inf
                rounded = np.round(sims, 9)
                # top-k with id tiebreak: argpartition a margin of
                # candidates, fall back to a full sort only when the tie
                # block at the boundary could overflow the margin
                part = np.argpartition(-rounded, margin - 1)[:margin]
                boundary = rounded[part].min()
                if (rounded == boundary).sum() > (
                    rounded[part] == boundary
                ).sum():
                    part = np.arange(n)
                order = np.lexsort((part, -rounded[part]))
                top = part[order[:k]]
                for rk, j in enumerate(top, start=1):
                    out.append(
                        (int(b_ids[j]), int(b_ids[pos]), float(sims[j]), rk)
                    )
            yield pd.DataFrame(out, columns=["item_i", "item_j", "sim", "rank"])

    probes = spark.createDataFrame(
        [(int(i),) for i in items], "item_id bigint"
    ).repartition(max(2, spark.sparkContext.defaultParallelism))
    return probes.mapInPandas(kernel, _OUT)
