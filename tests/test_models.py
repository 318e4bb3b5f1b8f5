"""Sanity tests for the iterative model-fit operators (no SQL oracle —
validated by shape, invariants, and recommendation quality, mirroring the
reference's own strategy for stochastic algorithms)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from contentwise_impressions_spark.recommenders.bpr import bpr_triplets
from contentwise_impressions_spark.recommenders.factor import (
    ials_factors,
    mf_scores,
    nmf_factors,
    pure_svd_item_factors,
)
from contentwise_impressions_spark.recommenders.slim import (
    _elastic_net_cd,
    ease_r,
    slim_elasticnet,
)
from contentwise_impressions_spark.sources.interactions import implicit_urm
from contentwise_impressions_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def urm(spark, sf_dir):
    u = implicit_urm(load_table(spark, sf_dir, "events")).cache()
    u.count()
    return u


def test_ials_factors_shapes(spark, urm):
    uf, itf = ials_factors(urm, rank=4, max_iter=3)
    assert uf.count() == urm.select("user_id").distinct().count()
    assert itf.count() == urm.select("item_id").distinct().count()
    assert len(uf.first()["features"]) == 4


def test_mf_scores_match_manual_dot(spark, urm):
    uf, itf = ials_factors(urm, rank=4, max_iter=2)
    s = mf_scores(uf.limit(2), itf.limit(3)).collect()
    u_map = {r["user_id"]: r["features"] for r in uf.limit(2).collect()}
    i_map = {r["item_id"]: r["features"] for r in itf.limit(3).collect()}
    for row in s:
        expect = sum(
            a * b for a, b in zip(u_map[row["user_id"]], i_map[row["item_id"]])
        )
        assert abs(row["score"] - expect) < 1e-6


def test_pure_svd_captures_energy(spark, urm):
    f_ = pure_svd_item_factors(urm, k=4)
    norms = f_.select(
        F.aggregate("features", F.lit(0.0), lambda a, x: a + x * x).alias("sq")
    ).agg(F.sum("sq")).collect()[0][0]
    total = urm.agg(F.sum(F.col("value") * F.col("value"))).collect()[0][0]
    # Σ σ_k² <= ||A||_F², and a rank-4 basis should capture a real fraction
    assert 0 < norms <= total * 1.0001
    assert norms > 0.1 * total


def test_pure_svd_rank_deficient_catalog(spark):
    """k + n_oversample larger than the catalog rank: the truncated-SVD
    epilogue must return zero-padded factors (σ=0 directions), not a
    singular-solve crash or NaN garbage, and still capture the energy of
    the tiny catalog exactly (full-rank basis ⇒ Σσ² = ||A||_F²)."""
    import numpy as np

    rows = [
        (u, i, 1.0 + ((u * 7 + i * 3) % 5))
        for u in range(12)
        for i in range(6)
        if (u + i) % 3 != 0
    ]
    urm = spark.createDataFrame(rows, "user_id long, item_id long, value double")
    f_ = pure_svd_item_factors(urm, k=16, n_oversample=8).collect()
    mat = np.array([r["features"] for r in sorted(f_, key=lambda r: r["item_id"])])
    assert mat.shape == (6, 16)
    assert np.isfinite(mat).all()
    total = sum(v * v for _, _, v in rows)
    # rank(A) <= 6 < 16, so the 16-column basis is exhaustive: energy equal
    assert abs((mat**2).sum() - total) < 1e-6 * total
    # the padded σ=0 columns are exactly zero
    assert np.abs(mat[:, 6:]).max() == 0.0


def test_elastic_net_cd_recovers_sparse_signal():
    import numpy as np

    rng = np.random.default_rng(0)
    x = rng.random((200, 10))
    w_true = np.zeros(10)
    w_true[[2, 5]] = [0.8, 0.5]
    y = x @ w_true
    w = _elastic_net_cd(x, y, alpha=1e-4, l1_ratio=0.5)
    assert abs(w[2] - 0.8) < 0.1 and abs(w[5] - 0.5) < 0.1
    assert (w[[0, 1, 3, 4, 6, 7, 8, 9]] < 0.15).all()


def test_slim_elasticnet_invariants(spark, urm):
    w = slim_elasticnet(urm, top_k=5).cache()
    assert w.filter(F.col("item_i") == F.col("item_j")).count() == 0  # no diag
    assert w.filter(F.col("weight") < 0).count() == 0  # positive=True
    per_j = w.groupBy("item_j").count().agg(F.max("count")).collect()[0][0]
    assert per_j <= 5


def test_slim_distributed_matches_broadcast(spark, urm):
    """The co-occurrence-neighborhood distributed fit must reproduce the
    dense-broadcast twin: same support, same coefficients (the two CD
    kernels differ only in floating-point assembly of the inner
    products)."""
    from contentwise_impressions_spark.recommenders.slim import (
        slim_elasticnet_distributed,
    )

    a = slim_elasticnet(urm, top_k=5).toPandas()
    b = slim_elasticnet_distributed(urm, top_k=5).toPandas()
    ka = a.sort_values(["item_j", "item_i"]).reset_index(drop=True)
    kb = b.sort_values(["item_j", "item_i"]).reset_index(drop=True)
    assert list(map(tuple, ka[["item_i", "item_j"]].to_numpy())) == list(
        map(tuple, kb[["item_i", "item_j"]].to_numpy())
    )
    assert np.allclose(
        ka["weight"].to_numpy(), kb["weight"].to_numpy(), atol=1e-6
    )


def test_slim_distributed_plan_is_cogrouped_no_driver_urm(spark, urm):
    """Scale pin: the distributed fit is a join + groupBy(item_j) +
    FlatMapGroupsInPandas — no cartesian, no driver URM collect (the only
    action during plan construction is the scalar max-user aggregate)."""
    from contentwise_impressions_spark.recommenders.slim import (
        slim_elasticnet_distributed,
    )

    df = slim_elasticnet_distributed(urm, top_k=5)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "FlatMapGroupsInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rating_model_rmse_gates(spark):
    """FunkSVD/AsySVD (adagrad, fixed seed/buckets) must beat the
    GlobalEffects RMSE baseline on the held-out hash split at sf0.01 —
    the explicit-rating analog of the MAP@10 gates.  Observed at sf0.01:
    GE 46.88, funk 46.18, asy 46.21."""
    from contentwise_impressions_spark.plans import all_queries

    rows = {
        r["model"]: r
        for r in all_queries()["rating_model_quality_gates"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    assert set(rows) == {"global_effects", "funk_svd", "asy_svd"}
    assert rows["funk_svd"]["beats_global_effects"]
    assert rows["asy_svd"]["beats_global_effects"]


def test_ease_r_no_diagonal_and_topk(spark, urm):
    w = ease_r(urm, l2=50.0, top_k=5).cache()
    assert w.filter(F.col("item_i") == F.col("item_j")).count() == 0
    assert w.groupBy("item_j").count().agg(F.max("count")).collect()[0][0] <= 5


def test_nmf_nonnegative(spark, urm):
    uf, itf = nmf_factors(urm, k=4, n_iter=10)
    neg = uf.select(
        F.size(F.filter("features", lambda x: x < 0)).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert neg == 0


def test_nmf_distributed_matches_driver_twin(spark, urm):
    """The distributed MU fit must reproduce the driver-numpy twin when
    seeded with the identical init (the two paths differ only in the
    floating-point order of the matmul sums)."""
    from contentwise_impressions_spark.recommenders.factor import (
        nmf_factors_distributed,
    )

    rows = urm.select("user_id", "item_id").collect()
    n_u = max(r[0] for r in rows) + 1
    n_i = max(r[1] for r in rows) + 1
    k, n_iter = 4, 10
    rng = np.random.default_rng(42)  # same stream/order as nmf_factors
    w0 = rng.random((n_u, k)) + 1e-3
    h0 = rng.random((k, n_i)) + 1e-3
    w0_df = spark.createDataFrame(
        [(i, w0[i].tolist()) for i in range(n_u)],
        "user_id long, features array<double>",
    )
    h0_df = spark.createDataFrame(
        [(j, h0[:, j].tolist()) for j in range(n_i)],
        "item_id long, features array<double>",
    )
    uf_d, itf_d = nmf_factors_distributed(
        urm, k=k, n_iter=n_iter, init=(w0_df, h0_df)
    )
    uf_t, itf_t = nmf_factors(urm, k=k, n_iter=n_iter, seed=42)
    for d, t, idc in ((uf_d, uf_t, "user_id"), (itf_d, itf_t, "item_id")):
        a = {r[idc]: np.asarray(r["features"]) for r in d.collect()}
        b = {r[idc]: np.asarray(r["features"]) for r in t.collect()}
        # the twin densifies 0..n-1; the distributed path only carries ids
        # present in the URM — compare on the shared support
        assert set(a) <= set(b)
        for fid in a:
            assert np.allclose(a[fid], b[fid], rtol=1e-5, atol=1e-8), fid


def test_nmf_distributed_nonnegative_and_converging(spark, urm):
    from contentwise_impressions_spark.recommenders.factor import (
        nmf_factors_distributed,
    )

    uf, itf = nmf_factors_distributed(urm, k=4, n_iter=5)
    neg = (
        uf.select(F.size(F.filter("features", lambda x: x < 0)).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert neg == 0
    assert itf.count() == urm.select("item_id").distinct().count()


def test_slim_bpr_distributed_single_bucket_matches_twin(spark, urm):
    """With one bucket the distributed SLIM-BPR processes the identical
    (user, pos, neg) sequence as the driver twin — weights must agree
    (up to the float summation-order of x_uij)."""
    from contentwise_impressions_spark.recommenders.bpr import (
        slim_bpr_fit,
        slim_bpr_fit_distributed,
    )

    t = slim_bpr_fit(urm.select("user_id", "item_id"), epochs=2, top_k=5)
    d = slim_bpr_fit_distributed(
        urm.select("user_id", "item_id"), epochs=2, top_k=5, n_buckets=1
    )
    a = {(r["item_i"], r["item_j"]): r["sim"] for r in t.collect()}
    b = {(r["item_i"], r["item_j"]): r["sim"] for r in d.collect()}
    assert set(a) == set(b)
    for k in a:
        assert abs(a[k] - b[k]) < 1e-9, k


def test_slim_bpr_distributed_multibucket_invariants(spark, urm):
    from contentwise_impressions_spark.recommenders.bpr import (
        slim_bpr_fit_distributed,
    )

    w = slim_bpr_fit_distributed(
        urm.select("user_id", "item_id"), epochs=2, top_k=5, n_buckets=4
    ).cache()
    assert w.count() > 0
    assert w.filter(F.col("item_i") == F.col("item_j")).count() == 0
    per_j = w.groupBy("item_j").count().agg(F.max("count")).collect()[0][0]
    assert per_j <= 5


def test_bpr_triplets_are_valid(spark, urm):
    trip = bpr_triplets(urm, mode="outside").cache()
    # every triplet's negative is NOT in the user's seen set
    bad = trip.join(
        urm.select("user_id", F.col("item_id").alias("neg_item")),
        ["user_id", "neg_item"],
        "inner",
    ).count()
    assert bad == 0
    # one triplet per positive
    assert trip.count() == urm.count()


def test_bpr_triplets_epoch_salt_redraws(spark, urm):
    """The fits redraw negatives per epoch (the reference's uniform
    redraw): a later-epoch sample must differ from epoch 0 while staying
    valid, and epoch=0 must stay byte-identical to the unsalted sampler
    (= the SQL twin the registered queries are oracled against)."""
    e0 = bpr_triplets(urm, mode="outside").collect()
    e0b = bpr_triplets(urm, mode="outside", epoch=0).collect()
    assert sorted(map(tuple, e0)) == sorted(map(tuple, e0b))
    e1 = bpr_triplets(urm, mode="outside", epoch=1).cache()
    # still one triplet per positive and negatives still unseen
    assert e1.count() == urm.count()
    assert (
        e1.join(
            urm.select("user_id", F.col("item_id").alias("neg_item")),
            ["user_id", "neg_item"],
            "inner",
        ).count()
        == 0
    )
    neg0 = {(r["user_id"], r["neg_item"]) for r in e0}
    neg1 = {(r["user_id"], r["neg_item"]) for r in e1.collect()}
    assert neg0 != neg1  # the draw actually rotated


def test_cold_user_factor_estimation(spark, urm):
    from contentwise_impressions_spark.recommenders.factor import (
        estimate_cold_user_factors,
    )

    uf, itf = ials_factors(urm, rank=4, max_iter=2)
    # pretend two users are cold: estimate from their profiles
    cold = urm.filter(F.col("user_id").isin(0, 1)).select("user_id", "item_id")
    est = estimate_cold_user_factors(cold, itf)
    rows = {r["user_id"]: r["features"] for r in est.collect()}
    assert set(rows) == {0, 1}
    # manual check for user 0: sum of its items' factors / sqrt(len)
    import math

    items0 = [r["item_id"] for r in cold.filter(F.col("user_id") == 0).collect()]
    fac = {r["item_id"]: r["features"] for r in itf.collect()}
    expect = [
        sum(fac[i][p] for i in items0 if i in fac) / math.sqrt(len(items0))
        for p in range(4)
    ]
    got = rows[0]
    for a, b in zip(got, expect):
        assert abs(a - b) < 1e-6

def test_ease_r_blocked_one_block_equals_exact(spark, urm):
    from contentwise_impressions_spark.recommenders.slim import ease_r_blocked

    exact = {
        (r["item_i"], r["item_j"]): r["sim"]
        for r in ease_r(urm, l2=50.0, top_k=5).collect()
    }
    blocked = {
        (r["item_i"], r["item_j"]): r["sim"]
        for r in ease_r_blocked(urm, l2=50.0, n_blocks=1, top_k=5).collect()
    }
    assert set(exact) == set(blocked)
    for k in exact:
        assert abs(exact[k] - blocked[k]) < 1e-8


def test_ease_r_blocked_sharded_invariants(spark, urm):
    from contentwise_impressions_spark.recommenders.slim import ease_r_blocked

    w = ease_r_blocked(urm, l2=50.0, n_blocks=4, top_k=5).cache()
    assert w.filter(F.col("item_i") == F.col("item_j")).count() == 0
    assert w.groupBy("item_j").count().agg(F.max("count")).collect()[0][0] <= 5
    # sharding invariant: weights never cross block boundaries
    assert (
        w.filter(F.col("item_i") % 4 != F.col("item_j") % 4).count() == 0
    )


def test_bpr_training_reduces_loss(spark, urm):
    """BPR quality gate: trained factors must beat the seeded random init
    on the model's own objective (mean log σ(x_uij) over the triplets).
    Deterministic given the seed — validates the SGD actually optimizes,
    without flaky ranking-metric thresholds."""
    import numpy as np

    from contentwise_impressions_spark.recommenders.bpr import (
        bpr_mf_fit,
        bpr_triplets,
    )

    rank, seed = 8, 42
    trip = np.array(
        [
            (r["user_id"], r["pos_item"], r["neg_item"])
            for r in bpr_triplets(urm, mode="outside").collect()
        ]
    )
    n_u = int(trip[:, 0].max()) + 1
    n_i = int(trip[:, [1, 2]].max()) + 1
    rng = np.random.default_rng(seed)
    u0 = rng.normal(0.0, 0.1, (n_u, rank))
    i0 = rng.normal(0.0, 0.1, (n_i, rank))

    def mean_loss(u, i):
        x = (u[trip[:, 0]] * (i[trip[:, 1]] - i[trip[:, 2]])).sum(axis=1)
        return float(np.mean(np.log1p(np.exp(-x))))

    uf, itf = bpr_mf_fit(urm, rank=rank, epochs=5, seed=seed)
    u_fit = np.zeros((n_u, rank))
    for r in uf.collect():
        if r["user_id"] < n_u:
            u_fit[r["user_id"]] = r["features"]
    i_fit = np.zeros((n_i, rank))
    for r in itf.collect():
        if r["item_id"] < n_i:
            i_fit[r["item_id"]] = r["features"]
    loss0, loss1 = mean_loss(u0, i0), mean_loss(u_fit, i_fit)
    assert loss1 < loss0 * 0.95, (loss0, loss1)


def test_ease_r_cg_equals_exact(spark, urm):
    """Global CG variant converges to the closed-form EASE_R weights:
    identical top-k membership, sims within CG tolerance."""
    from contentwise_impressions_spark.recommenders.slim import ease_r_cg

    exact = {
        (r["item_i"], r["item_j"]): r["sim"]
        for r in ease_r(urm, l2=50.0, top_k=5).collect()
    }
    cg = {
        (r["item_i"], r["item_j"]): r["sim"]
        for r in ease_r_cg(urm, l2=50.0, top_k=5).collect()
    }
    assert set(exact) == set(cg)
    for k in exact:
        assert abs(exact[k] - cg[k]) < 1e-6


def test_ease_r_size_gate_delegates_to_cg(spark, urm, monkeypatch):
    """Above ``max_driver_items`` the O(n³) driver inverse must never run:
    ease_r delegates to the distributed CG solver and still returns the
    closed-form weights; below the gate the inverse path runs and CG is
    never touched."""
    import contentwise_impressions_spark.recommenders.slim as slim_mod

    exact = {
        (r["item_i"], r["item_j"]): r["sim"]
        for r in ease_r(urm, l2=50.0, top_k=5).collect()
    }

    # above the gate → CG path, numerically equal to the closed form
    gated = {
        (r["item_i"], r["item_j"]): r["sim"]
        for r in ease_r(urm, l2=50.0, top_k=5, max_driver_items=2).collect()
    }
    assert set(gated) == set(exact)
    for k in exact:
        assert abs(exact[k] - gated[k]) < 1e-6

    # the gate actually routes: CG invoked above the gate, not below it
    calls = []

    def spy(urm_, **kw):
        calls.append(kw)
        raise RuntimeError("cg-called")

    monkeypatch.setattr(slim_mod, "ease_r_cg", spy)
    try:
        ease_r(urm, l2=50.0, top_k=5, max_driver_items=2)
    except RuntimeError:
        pass
    assert len(calls) == 1  # delegated
    ease_r(urm, l2=50.0, top_k=5)  # default gate >> fixture catalog
    assert len(calls) == 1  # inverse path, no delegation


def test_ivf_sampled_training_degenerates_to_full(spark):
    """ivf_sampled_distances with sample_keep == sample_mod (keep every
    vector) must reproduce the full-data Lloyd run EXACTLY — the sampled
    trainer is the same algorithm with a filtered training set, nothing
    else.  Also pin that the real sample (~20%) yields a valid coarse
    quantizer: every vector assigned, n_list lists, and recall@3 against
    brute force within 0.15 of the full-training IVF (representative
    centroids, not identical ones)."""
    from contentwise_impressions_spark.operators.ann import (
        _ivf_final_distances,
        cosine_topk_bruteforce,
        ivf_sampled_distances,
        ivf_topk,
    )
    from contentwise_impressions_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    full = {
        (r["vec_id"], r["c"]): r["d2"]
        for r in _ivf_final_distances(emb, n_list=8, n_iters=2).collect()
    }
    degen = {
        (r["vec_id"], r["c"]): r["d2"]
        for r in ivf_sampled_distances(
            emb, n_list=8, n_iters=2, sample_keep=997, sample_mod=997
        ).collect()
    }
    assert full.keys() == degen.keys()
    assert all(abs(full[k] - degen[k]) < 1e-9 for k in full)

    def topk_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["vec_id"], set()).add(r["neighbor_id"])
        return out

    exact = topk_sets(cosine_topk_bruteforce(emb, k=3))
    full_ivf = topk_sets(ivf_topk(emb, k=3, n_list=8, n_iters=2))
    sampled = topk_sets(
        ivf_topk(
            emb,
            k=3,
            n_list=8,
            n_iters=2,
            distances=ivf_sampled_distances(
                emb, n_list=8, n_iters=2, sample_keep=200
            ),
        )
    )

    def recall(approx):
        hits = sum(
            len(approx.get(v, set()) & nbrs) for v, nbrs in exact.items()
        )
        return hits / sum(len(n) for n in exact.values())

    r_full, r_sampled = recall(full_ivf), recall(sampled)
    assert set(sampled) == set(exact)  # every vector got candidates
    assert r_sampled >= r_full - 0.15, (r_sampled, r_full)


def test_ivf_nprobe_recall_monotone(spark):
    """Opening the IVF recall knob (n_probe 1 -> 2) must not lose recall
    against the exact brute force: the candidate set is a superset, so
    per-vector recall@k is monotonically non-decreasing."""
    from contentwise_impressions_spark.operators.ann import (
        cosine_topk_bruteforce,
        ivf_topk,
    )
    from contentwise_impressions_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")

    def topk_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["vec_id"], set()).add(r["neighbor_id"])
        return out

    exact = topk_sets(cosine_topk_bruteforce(emb, k=3))
    p1 = topk_sets(ivf_topk(emb, k=3, n_list=8, n_iters=2, n_probe=1))
    p2 = topk_sets(ivf_topk(emb, k=3, n_list=8, n_iters=2, n_probe=2))

    def recall(approx):
        hits = sum(len(approx.get(v, set()) & e) for v, e in exact.items())
        total = sum(len(e) for e in exact.values())
        return hits / total

    r1, r2 = recall(p1), recall(p2)
    assert r2 >= r1, (r1, r2)
    # probing 2 of 8 lists (~25% of the corpus) has to buy real recall;
    # measured 0.48 vs 0.29 single-list at this scale
    assert r2 > 0.3


def test_ivf_sq8_recall_gate(spark):
    """IVF-routed SQ8 (the FAISS IndexIVFScalarQuantizer analog): the
    routing is the SAME home-list restriction as plain ivf_topk, so the
    8-bit codec may cost only a small recall delta on top of the routing
    loss — gate recall@3 vs exact brute force within 0.1 of plain IVF's
    and above an absolute floor.  Also pin the routing invariant: every
    emitted pair shares a home list."""
    from contentwise_impressions_spark.operators.ann import (
        cosine_topk_bruteforce,
        ivf_assignments,
        ivf_topk,
    )
    from contentwise_impressions_spark.operators.ann import ivf_probe_lists
    from contentwise_impressions_spark.operators.sq import (
        sq8_ivf_residual_topk,
        sq8_ivf_topk,
    )
    from contentwise_impressions_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    home = ivf_assignments(emb, n_list=8, n_iters=2)
    lists = {r["vec_id"]: r["list_id"] for r in home.collect()}

    def topk_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["vec_id"], set()).add(r["neighbor_id"])
        return out

    exact = topk_sets(cosine_topk_bruteforce(emb, k=3))
    ivf = topk_sets(ivf_topk(emb, k=3, n_list=8, n_iters=2))

    def gated(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["vec_id"], set()).add(r["neighbor_id"])
            assert lists[r["vec_id"]] == lists[r["neighbor_id"]], r
        return out

    sq8 = gated(sq8_ivf_topk(emb, home, k=3))
    res = gated(sq8_ivf_residual_topk(emb, home, k=3))
    probes2 = ivf_probe_lists(emb, n_list=8, n_iters=2, n_probe=2).select(
        "vec_id", "list_id"
    )
    mp = topk_sets(sq8_ivf_topk(emb, home, k=3, probes=probes2))

    def recall(approx):
        hits = sum(len(approx.get(v, set()) & e) for v, e in exact.items())
        return hits / sum(len(e) for e in exact.values())

    r_ivf, r_sq8, r_res = recall(ivf), recall(sq8), recall(res)
    assert set(sq8) == set(exact)  # every vector got candidates
    assert set(res) == set(exact)
    assert r_sq8 >= r_ivf - 0.1, (r_sq8, r_ivf)
    # opening the knob (n_probe=2) must not lose recall: the candidate
    # set is a superset of the home-list one
    assert recall(mp) >= r_sq8, (recall(mp), r_sq8)
    # the residual codec spends its 8 bits on the within-list spread —
    # it may not lose recall vs the raw-coordinate codec beyond noise
    assert r_res >= r_sq8 - 0.05, (r_res, r_sq8)
    # measured 0.2907 vs plain IVF 0.2907 at sf0.001 (the codec loses no
    # top-3 neighbor at this scale); the floor is generous headroom
    assert r_sq8 > 0.2, r_sq8


def test_model_quality_gates(spark, sf_dir):
    """The rows-only fits emit a deterministic MAP@10 quality row; pin
    floors (generous vs observed sf0.001 values) so a silently-degenerate
    fit — all-zero factors, empty W — fails loudly rather than 'rows came
    back'."""
    from contentwise_impressions_spark.plans import all_queries

    rows = {
        r["model"]: r
        for r in all_queries()["model_quality_gates"](spark, sf_dir).collect()
    }
    assert set(rows) == {"toppop", "ials", "bpr_mf", "slim_elasticnet", "ease_r"}
    for r in rows.values():
        assert 0.0 <= r["map10"] <= 1.0
    # observed at sf0.001: toppop 0.0059, bpr_mf 0.028, slim 0.0055,
    # ease_r 0.0007, ials 0.0 (tiny split) — floors at ~half the observed
    assert rows["toppop"]["map10"] > 0.003
    assert rows["bpr_mf"]["map10"] > 0.012
    assert rows["slim_elasticnet"]["map10"] > 0.002
    assert rows["bpr_mf"]["beats_toppop"]
    assert rows["toppop"]["beats_toppop"]


def test_semantic_dedup_min_id_rule(spark):
    """Hand-built clusters: within a cluster, every vector with a lower-id
    near-duplicate (cos >= tau) is pruned; the lowest id survives, and
    near-orthogonal cluster-mates survive too."""
    from contentwise_impressions_spark.operators.ann import semantic_dedup

    rows = [
        # cluster A: 0 and 1 are near-identical, 2 is orthogonal-ish
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        # cluster B: 10 and 11 near-identical
        (10, [0.0, 0.0, 1.0, 0.0]),
        (11, [0.0, 0.0, 0.999, 0.01]),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    assign = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (10, 1), (11, 1)], ["vec_id", "list_id"]
    )
    out = {
        r["vec_id"]: r["pruned"]
        for r in semantic_dedup(
            emb, threshold=0.9, assignments=assign
        ).collect()
    }
    assert out == {0: False, 1: True, 2: False, 10: False, 11: True}


def test_semantic_dedup_threshold_monotone(spark):
    """Lowering tau can only prune MORE vectors (superset property)."""
    from contentwise_impressions_spark.operators.ann import (
        ivf_assignments,
        semantic_dedup,
    )
    from contentwise_impressions_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    assign = ivf_assignments(emb, n_list=8, n_iters=2).cache()
    pruned_hi = {
        r["vec_id"]
        for r in semantic_dedup(emb, 0.6, assignments=assign).collect()
        if r["pruned"]
    }
    pruned_lo = {
        r["vec_id"]
        for r in semantic_dedup(emb, 0.3, assignments=assign).collect()
        if r["pruned"]
    }
    assert pruned_hi <= pruned_lo
    assert len(pruned_lo) > len(pruned_hi)
    assign.unpersist()


def test_semantic_dedup_subblocked_matches_single_task(spark):
    """A forced skewed clustering (every vector in ONE inverted list) with a
    tiny block_rows must sub-block into an n_sub x n_sub task grid and still
    produce exactly the single-task answer — the hot-cluster memory cap
    cannot change the keep/prune decisions."""
    from contentwise_impressions_spark.operators.ann import semantic_dedup
    from contentwise_impressions_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    n = emb.count()
    assign = emb.selectExpr("vec_id", "CAST(0 AS BIGINT) AS list_id")
    one_task = {
        r["vec_id"]: r["pruned"]
        for r in semantic_dedup(
            emb, 0.4, assignments=assign, block_rows=1 << 30
        ).collect()
    }
    # block_rows << cluster size forces n_sub = ceil(n/8) sub-blocks
    blocked = {
        r["vec_id"]: r["pruned"]
        for r in semantic_dedup(
            emb, 0.4, assignments=assign, block_rows=8
        ).collect()
    }
    assert len(one_task) == n
    assert blocked == one_task
    assert any(one_task.values()) and not all(one_task.values())


def test_semantic_dedup_zero_norm_vectors_inert(spark):
    """A degenerate all-zero embedding has no direction: it is never pruned
    and never prunes a cluster-mate (no NaN cosine leaks into the flags)."""
    from contentwise_impressions_spark.operators.ann import semantic_dedup

    rows = [
        (0, [0.0, 0.0, 0.0, 0.0]),  # zero vector, lowest id
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),  # near-dup of 1 -> pruned
        (3, [0.0, 0.0, 0.0, 0.0]),  # zero vector, higher id
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    assign = spark.createDataFrame(
        [(i, 0) for i in range(4)], ["vec_id", "list_id"]
    )
    out = {
        r["vec_id"]: r["pruned"]
        for r in semantic_dedup(emb, 0.9, assignments=assign).collect()
    }
    assert out == {0: False, 1: False, 2: True, 3: False}


def test_random_recommend_bounded_and_valid(spark, urm):
    from contentwise_impressions_spark.recommenders.nonpersonalized import (
        random_recommend,
    )

    recs = random_recommend(urm, k=5, seed=7).cache()
    # never recommends seen items
    assert (
        recs.join(
            urm.select("user_id", "item_id"), ["user_id", "item_id"], "inner"
        ).count()
        == 0
    )
    per_u = recs.groupBy("user_id").count().agg(F.max("count")).first()[0]
    assert per_u <= 5
    # deterministic: the hash-scored pick reproduces exactly
    again = random_recommend(urm, k=5, seed=7).collect()
    assert sorted(map(tuple, recs.collect())) == sorted(map(tuple, again))
    # a different seed rotates the picks
    other = random_recommend(urm, k=5, seed=8).collect()
    assert sorted(map(tuple, other)) != sorted(map(tuple, again))


# ---------------------------------------------------------------------------
# bounded MF top-k serving (operators/mf_topk.py)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def mf_factors(spark, urm):
    uf, itf = ials_factors(urm, rank=4, max_iter=3)
    uf = uf.cache()
    itf = itf.cache()
    uf.count(), itf.count()
    return uf, itf


def _rec_tuples(df):
    return sorted(
        (r["user_id"], r["item_id"], r["rank"]) for r in df.collect()
    )


def test_mf_topk_equals_crossjoin_twin_broadcast_path(spark, urm, mf_factors):
    """The bounded operator must equal the full-crossJoin formulation —
    identical (user, item, rank) triples under the shared (round(score,9)
    desc, item_id asc) ordering."""
    from contentwise_impressions_spark.operators.mf_topk import (
        mf_recommend_top_k,
    )
    from contentwise_impressions_spark.operators.scoring import (
        recommend_top_k,
    )

    uf, itf = mf_factors
    train = urm.select("user_id", "item_id")
    want = _rec_tuples(
        recommend_top_k(mf_scores(uf, itf), 5, train=train, round_digits=9)
    )
    got = _rec_tuples(mf_recommend_top_k(uf, itf, 5, train=train))
    assert got == want


def test_mf_topk_blocked_path_equals_broadcast_path(spark, urm, mf_factors):
    """item_broadcast_mb=0 forces the UB×IB grid; tiny item blocks force
    real multi-block merging.  Must agree with the gated fast path."""
    from contentwise_impressions_spark.operators.mf_topk import (
        mf_recommend_top_k,
    )

    uf, itf = mf_factors
    train = urm.select("user_id", "item_id")
    fast = _rec_tuples(mf_recommend_top_k(uf, itf, 5, train=train))
    blocked = _rec_tuples(
        mf_recommend_top_k(
            uf, itf, 5, train=train, item_broadcast_mb=0.0, item_block_rows=3
        )
    )
    assert blocked == fast


def test_mf_topk_remove_seen_and_user_subset(spark, urm, mf_factors):
    from contentwise_impressions_spark.operators.mf_topk import (
        mf_recommend_top_k,
    )

    uf, itf = mf_factors
    train = urm.select("user_id", "item_id")
    users = uf.select("user_id").limit(7)
    recs = mf_recommend_top_k(uf, itf, 5, train=train, users=users).cache()
    # only the requested users, never a seen item, exactly k each (the
    # catalog is large enough that every user has >= 5 unseen items)
    assert recs.select("user_id").distinct().count() == users.count()
    assert (
        recs.join(train, ["user_id", "item_id"], "inner").count() == 0
    )
    per_u = recs.groupBy("user_id").count().select("count").distinct().collect()
    assert [r["count"] for r in per_u] == [5]


def test_mf_topk_plan_has_no_user_catalog_crossjoin(spark, urm, mf_factors):
    """The serving plan must not contain a cartesian/broadcast-nested-loop
    user×catalog expansion — the round-6 verdict's scale-killer pin."""
    from contentwise_impressions_spark.operators.mf_topk import (
        mf_recommend_top_k,
    )

    uf, itf = mf_factors
    df = mf_recommend_top_k(
        uf, itf, 5, train=urm.select("user_id", "item_id")
    )
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_mf_topk_lazy_input_computes_fit_once(spark, urm, mf_factors):
    """A NON-checkpointed factor lineage must be evaluated once, not once
    per driver action (count/first/collect used to re-run it 3×): the
    operator persists its input across its own actions."""
    from contentwise_impressions_spark.operators.mf_topk import (
        mf_recommend_top_k,
    )

    uf, itf = mf_factors
    evals = spark.sparkContext.accumulator(0)

    def tag(batches):
        for pdf in batches:
            evals.add(len(pdf))
            yield pdf

    lazy_itf = itf.mapInPandas(tag, itf.schema)  # uncached "fit" lineage
    n_items = itf.count()
    recs = mf_recommend_top_k(
        uf, lazy_itf, 5, train=urm.select("user_id", "item_id")
    )
    assert recs.count() > 0
    # persist materializes the lineage exactly once (count); first() and
    # the Arrow collect read the cache.  Allow cache-miss slack of one
    # extra partition read, never the 3× full re-run of before.
    assert evals.value <= n_items + max(1, n_items // 4), evals.value


def test_mf_topk_broadcast_registry_bounded(spark, urm, mf_factors):
    """Repeated serving calls must not accumulate item-factor broadcasts
    without bound: the per-session registry evicts beyond its cap."""
    from contentwise_impressions_spark.operators import mf_topk as m

    uf, itf = mf_factors
    train = urm.select("user_id", "item_id")
    for _ in range(m._LIVE_CAP + 3):
        m.mf_recommend_top_k(uf, itf, 3, train=train).count()
    live = m._LIVE[spark.sparkContext.applicationId]
    assert len(live) <= m._LIVE_CAP


# ---------------------------------------------------------------------------
# product quantization (operators/pq.py)
# ---------------------------------------------------------------------------
def test_pq_codes_valid_and_deterministic(spark, sf_dir):
    """Every vector gets exactly M codes in [0, K); a re-run is
    byte-identical (integer-grid Lloyd has no RNG or float-order
    dependence)."""
    from contentwise_impressions_spark.operators.pq import pq_codes
    from contentwise_impressions_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    c1 = sorted(map(tuple, pq_codes(emb, m=8, k=8, dsub=8).collect()))
    n_vec = emb.count()
    assert len(c1) == n_vec * 8
    assert all(0 <= code < 8 for _, _, code in c1)
    c2 = sorted(map(tuple, pq_codes(emb, m=8, k=8, dsub=8).collect()))
    assert c1 == c2


def test_pq_adc_recall_floor_and_k_monotone(spark, sf_dir):
    """ADC recall@3 vs the exact brute force: far above the random-ranking
    baseline at K=8, and opening the codebook (K=8 → 32) must not lose
    recall on i.i.d. gaussian embeddings (PQ's hardest case — real
    embeddings with low intrinsic dimension compress far better; the gate
    is the knob's direction, not an absolute fidelity claim)."""
    from contentwise_impressions_spark.operators.ann import (
        cosine_topk_bruteforce,
    )
    from contentwise_impressions_spark.operators.pq import pq_adc_topk
    from contentwise_impressions_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r["vec_id"], r["neighbor_id"])
        for r in cosine_topk_bruteforce(emb, k=3).collect()
    }
    n_vec = emb.count()

    def recall(kcent):
        got = {
            (r["vec_id"], r["neighbor_id"])
            for r in pq_adc_topk(emb, k=3, m=8, kcent=kcent, dsub=8).collect()
        }
        return len(got & exact) / len(exact)

    r8, r32 = recall(8), recall(32)
    random_baseline = 3.0 / max(n_vec - 1, 1)
    assert r8 > 10 * random_baseline, (r8, random_baseline)
    assert r32 >= r8 * 0.9, (r8, r32)  # knob direction (slack for ties)


def test_pq_adc_score_matches_manual_lut(spark, sf_dir):
    """ADC score of one pair equals the hand-computed LUT dot from the
    codes and codebook — pins the exact-integer contract end to end."""
    import numpy as np

    from contentwise_impressions_spark.operators.pq import (
        pq_adc_topk,
        pq_codebooks,
        pq_codes,
    )
    from contentwise_impressions_spark.operators.ann import QUANT
    from contentwise_impressions_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cb_df = pq_codebooks(emb, m=8, k=8, dsub=8).cache()
    adc = pq_adc_topk(emb, k=1, m=8, kcent=8, dsub=8, codebooks=cb_df)
    row = adc.orderBy("vec_id").first()
    p, v, score = row["vec_id"], row["neighbor_id"], row["adc_cosine"]

    cb = np.zeros((8, 8, 8))
    for r in cb_df.collect():
        cb[r["sub"], r["c"], r["pos"] - r["sub"] * 8] = float(r["y"])
    codes = {
        (r["vec_id"], r["sub"]): r["code"]
        for r in pq_codes(emb, cb_df, m=8, k=8, dsub=8)
        .filter(F.col("vec_id") == v)
        .collect()
    }
    pe = np.floor(
        np.asarray(
            emb.filter(F.col("vec_id") == p).first()["embedding"],
            dtype=np.float64,
        )
        * QUANT
        + 0.5
    )
    dot = sum(
        float(pe[s * 8 : (s + 1) * 8] @ cb[s, codes[(v, s)]]) for s in range(8)
    )
    r2 = sum(float(cb[s, codes[(v, s)]] @ cb[s, codes[(v, s)]]) for s in range(8))
    manual = dot / (np.sqrt((pe * pe).sum()) * np.sqrt(r2))
    assert score == manual, (score, manual)


def test_ivfpq_candidates_same_list_and_deterministic(spark, sf_dir):
    """Composed IVF-PQ serving: every returned neighbor shares the
    probe's IVF home list (the pruning invariant), per-probe results are
    bounded by k, and a re-run is byte-identical."""
    from contentwise_impressions_spark.operators.ann import ivf_assignments
    from contentwise_impressions_spark.operators.pq import ivfpq_topk
    from contentwise_impressions_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    got = ivfpq_topk(emb, k=3, n_list=8, m=8, kcent=8, dsub=8).cache()
    lists = {
        r["vec_id"]: r["list_id"]
        for r in ivf_assignments(emb, n_list=8, n_iters=2).collect()
    }
    rows = got.collect()
    assert rows and all(
        lists[r["vec_id"]] == lists[r["neighbor_id"]] for r in rows
    )
    per_probe = got.groupBy("vec_id").count().agg(F.max("count")).collect()
    assert per_probe[0][0] <= 3
    again = sorted(map(tuple, ivfpq_topk(emb, k=3, n_list=8, m=8, kcent=8, dsub=8).collect()))
    assert sorted(map(tuple, rows)) == again


def test_ivfpq_nprobe_recall_monotone(spark, sf_dir):
    """Opening the IVF-PQ probe knob (n_probe 1 → 2) must not lose recall
    against the exact brute force — candidate sets are supersets and the
    ADC scoring of a pair is probe-count-invariant (same knob contract as
    ivf_topk)."""
    from contentwise_impressions_spark.operators.ann import (
        cosine_topk_bruteforce,
    )
    from contentwise_impressions_spark.operators.pq import ivfpq_topk
    from contentwise_impressions_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r["vec_id"], r["neighbor_id"])
        for r in cosine_topk_bruteforce(emb, k=3).collect()
    }

    def recall(n_probe):
        got = {
            (r["vec_id"], r["neighbor_id"])
            for r in ivfpq_topk(
                emb, k=3, n_list=8, m=8, kcent=8, dsub=8, n_probe=n_probe
            ).collect()
        }
        return len(got & exact) / len(exact)

    r1, r2 = recall(1), recall(2)
    assert r2 >= r1 * 0.95, (r1, r2)  # slack only for ADC near-ties


def test_pq_sampled_training_degenerates_to_full(spark):
    """pq_codebooks with sample_keep == sample_mod must reproduce the
    full-corpus Lloyd run bit-for-bit (same algorithm, filtered training
    set only) — the pin the operator docstring promises.  The real ~20%
    sample must still produce a complete codebook (every (sub, c) cell
    when the sample populates all clusters, and every corpus vector
    encodable) with ADC recall within 0.15 of the full-trained ADC."""
    from contentwise_impressions_spark.operators.ann import (
        cosine_topk_bruteforce,
    )
    from contentwise_impressions_spark.operators.pq import (
        pq_adc_topk,
        pq_codebooks,
        pq_codes,
    )
    from contentwise_impressions_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    kw = dict(m=8, k=8, n_iters=2, dsub=8)
    full = {
        (r["sub"], r["c"], r["pos"]): r["y"]
        for r in pq_codebooks(emb, **kw).collect()
    }
    degen = {
        (r["sub"], r["c"], r["pos"]): r["y"]
        for r in pq_codebooks(
            emb, sample_keep=997, sample_mod=997, **kw
        ).collect()
    }
    assert full == degen  # exact integer-grid equality, not approximate

    cb = pq_codebooks(emb, sample_keep=200, **kw)
    n_vec = emb.count()
    codes = pq_codes(emb, codebooks=cb, **kw)
    # every corpus vector (not just sampled ones) encodable in all subspaces
    assert codes.count() == n_vec * 8

    def topk_sets(df, col="neighbor_id"):
        out = {}
        for r in df.collect():
            out.setdefault(r["vec_id"], set()).add(r[col])
        return out

    exact = topk_sets(cosine_topk_bruteforce(emb, k=3))
    full_adc = topk_sets(pq_adc_topk(emb, k=3, kcent=8, **{k: v for k, v in kw.items() if k != "k"}))
    cb_s = pq_codebooks(emb, sample_keep=200, **kw)
    samp_adc = topk_sets(
        pq_adc_topk(emb, k=3, kcent=8, codebooks=cb_s,
                    **{k: v for k, v in kw.items() if k != "k"})
    )

    def recall(approx):
        hits = sum(len(approx.get(v, set()) & n) for v, n in exact.items())
        return hits / sum(len(n) for n in exact.values())

    assert set(samp_adc) == set(exact)
    assert recall(samp_adc) >= recall(full_adc) - 0.15


def test_sampled_trainer_guards_fail_fast(spark):
    """Both sampled trainers must refuse a sample smaller than their
    cluster count instead of silently dropping seeds at the cent-seed
    join and training fewer lists than asked (round-11 ADVICE)."""
    import pytest as _pytest

    from contentwise_impressions_spark.operators.ann import (
        ivf_sampled_distances,
    )
    from contentwise_impressions_spark.operators.pq import pq_codebooks
    from contentwise_impressions_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    with _pytest.raises(ValueError, match="IVF training sample"):
        ivf_sampled_distances(emb, n_list=8, sample_keep=1, sample_mod=997)
    with _pytest.raises(ValueError, match="PQ training sample"):
        pq_codebooks(emb, k=32, sample_keep=1, sample_mod=997)


def test_refine_recovers_adc_compression_error(spark):
    """IndexRefine quality gate: exact-rescoring the ADC top-10 shortlist
    must not lose recall@3 vs raw ADC top-3 against the same-list exact
    ground truth (the reachable candidate set both share), and whenever
    the true top-3 sits inside the shortlist the refine recovers it —
    the accuracy knob's whole point (Jégou et al. 2011 §V.C)."""
    from contentwise_impressions_spark.operators.ann import ivf_topk
    from contentwise_impressions_spark.operators.pq import (
        ivfpq_topk,
        refine_exact_topk,
    )
    from contentwise_impressions_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    # exact same-list ground truth: full-precision cosine, IVF-pruned —
    # the candidate set ivfpq/refine can reach (ivf_topk scores exact)
    exact = {
        (r["vec_id"], r["neighbor_id"])
        for r in ivf_topk(emb, k=3, n_list=8, n_iters=2).collect()
    }
    short = ivfpq_topk(
        emb, k=10, n_list=8, ivf_iters=2, m=8, kcent=8, pq_iters=2, dsub=8
    ).cache()
    adc3 = {
        (r["vec_id"], r["neighbor_id"])
        for r in short.filter(F.col("rank") <= 3).collect()
    }
    refined = {
        (r["vec_id"], r["neighbor_id"])
        for r in refine_exact_topk(emb, short, k=3).collect()
    }
    short.unpersist()
    r_adc = len(adc3 & exact) / len(exact)
    r_ref = len(refined & exact) / len(exact)
    # refine can only fix ADC ordering errors inside the shortlist, never
    # introduce new ones (exact scores); tiny slack for rank-3 ties
    assert r_ref >= r_adc - 0.005, (r_ref, r_adc)
    # and on this corpus it must actually BUY recall (compression error
    # at m=8/K=8 on gaussian data is large enough that refine visibly
    # corrects it; fails if the refine stage is wired to ADC scores)
    assert r_ref > r_adc, (r_ref, r_adc)


def test_sq8_adc_recall_close_to_exact(spark):
    """SQ8 quality gate: with an 8-bit per-dim codec the reconstruction
    error is ~1/255 of each dim's range, so the ADC top-1 neighbor must
    agree with the exact full-precision top-1 for nearly every probe
    (FAISS QT_8bit is routinely recall@1 ≈ 1 on raw data); and the ADC
    cosine must sit within a loose absolute band of the exact cosine on
    the agreeing pairs."""
    from contentwise_impressions_spark.operators.ann import (
        cosine_topk_bruteforce,
    )
    from contentwise_impressions_spark.operators.sq import sq8_topk
    from contentwise_impressions_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    exact = {
        r["vec_id"]: (r["neighbor_id"], r["cosine"])
        for r in cosine_topk_bruteforce(emb, k=1)
        .filter(F.col("rank") == 1)
        .collect()
    }
    sq = {
        r["vec_id"]: (r["neighbor_id"], r["cosine"])
        for r in sq8_topk(emb, k=1).filter(F.col("rank") == 1).collect()
    }
    assert set(sq) == set(exact)
    agree = [v for v in exact if sq[v][0] == exact[v][0]]
    assert len(agree) / len(exact) >= 0.9, len(agree) / len(exact)
    for v in agree:
        assert abs(sq[v][1] - exact[v][1]) < 0.05, (v, sq[v], exact[v])


def test_residual_pq_reconstruction_beats_raw(spark):
    """IVFADC quality gate (Jégou et al. 2011 §III): at equal code size
    (same m, kcent), PQ trained on coarse-centroid residuals must
    reconstruct the corpus with LOWER total squared error than raw-vector
    PQ — residuals concentrate near the origin, so the codebook budget
    covers within-list structure instead of re-describing centroids."""
    import numpy as np

    from contentwise_impressions_spark.operators.ann import ivf_assignments
    from contentwise_impressions_spark.operators.pq import (
        _sub_frame,
        pq_codebooks,
        pq_codes,
    )
    from contentwise_impressions_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    m, kcent, iters, dsub = 8, 8, 2, 8
    d = m * dsub
    frame = _sub_frame(emb, "embedding", dsub)
    xs = {
        (r["vec_id"], r["pos"]): r["xq"] for r in frame.collect()
    }
    ids = sorted({v for v, _ in xs})
    xmat = np.array([[xs[(v, p)] for p in range(d)] for v in ids])

    def recon(codebooks_df, codes_df, shift):
        cb = np.zeros((m, kcent, dsub))
        for r in codebooks_df.collect():
            cb[r["sub"], r["c"], r["pos"] - r["sub"] * dsub] = r["y"]
        cd = {(r["vec_id"], r["sub"]): r["code"] for r in codes_df.collect()}
        out = np.zeros_like(xmat, dtype=np.float64)
        for vi, v in enumerate(ids):
            for s in range(m):
                out[vi, s * dsub : (s + 1) * dsub] = cb[s, cd[(v, s)]]
        return out + shift

    # raw PQ
    cb_raw = pq_codebooks(emb, m, kcent, iters, dsub)
    codes_raw = pq_codes(emb, cb_raw, m, kcent, iters, dsub)
    err_raw = ((recon(cb_raw, codes_raw, 0.0) - xmat) ** 2).sum()
    # residual PQ (same grid-rounded centroids the operator uses)
    home = ivf_assignments(emb, n_list=8, n_iters=2)
    eh = frame.join(home, "vec_id")
    cent = eh.groupBy("list_id", "sub", "pos").agg(
        F.floor(F.sum("xq") / F.count(F.lit(1)) + F.lit(0.5))
        .cast("bigint")
        .alias("cq")
    )
    res = eh.join(cent, ["list_id", "sub", "pos"]).select(
        "vec_id", "sub", "pos", (F.col("xq") - F.col("cq")).alias("xq")
    )
    cb_res = pq_codebooks(emb, m, kcent, iters, dsub, frame=res)
    codes_res = pq_codes(emb, cb_res, m, kcent, iters, dsub, frame=res)
    hm = {r["vec_id"]: r["list_id"] for r in home.collect()}
    cq = {(r["list_id"], r["pos"]): r["cq"] for r in cent.collect()}
    shift = np.array(
        [[cq[(hm[v], p)] for p in range(d)] for v in ids], dtype=np.float64
    )
    err_res = ((recon(cb_res, codes_res, shift) - xmat) ** 2).sum()
    assert err_res < err_raw, (err_res, err_raw)


def test_multiprobe_recall_monotone(spark):
    """The n_probe knob must be monotone: searching two lists can only
    GROW the candidate set, so recall@3 against the exact brute-force
    ground truth must be >= the single-probe run's (and candidate pairs
    a strict superset on this corpus, where list boundaries split true
    neighbor pairs)."""
    from contentwise_impressions_spark.operators.ann import (
        cosine_topk_bruteforce,
    )
    from contentwise_impressions_spark.operators.pq import ivfpq_topk
    from contentwise_impressions_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    exact = {
        (r["vec_id"], r["neighbor_id"])
        for r in cosine_topk_bruteforce(emb, k=3).collect()
    }
    got = {}
    for np_ in (1, 2):
        got[np_] = {
            (r["vec_id"], r["neighbor_id"])
            for r in ivfpq_topk(
                emb, k=3, n_list=8, ivf_iters=2, m=8, kcent=8,
                pq_iters=2, dsub=8, n_probe=np_,
            ).collect()
        }
    r1 = len(got[1] & exact) / len(exact)
    r2 = len(got[2] & exact) / len(exact)
    assert r2 >= r1, (r1, r2)
    assert r2 > r1  # on this corpus the second list visibly buys recall


def test_ials_normal_eq_matches_dense_numpy(spark, sf_dir):
    """ials_normal_eq emits exactly the Hu/Koren user-step system: build
    the SAME pinned factors and confidence dense in numpy and compare
    A_u / b_u entrywise (the DuckDB twin pins cross-engine replay; this
    pins the MATH — that the relational program really is
    YᵀY + α·Σ n·yyᵀ + λI and Σ (1+αn)·y)."""
    from contentwise_impressions_spark.functions.hashing import P1, P2
    from contentwise_impressions_spark.plans.modelops import (
        _IALS_NE_ALPHA,
        _IALS_NE_RANK,
        _IALS_NE_REG,
        q_ials_normal_eq,
    )
    from contentwise_impressions_spark.sources.interactions import (
        INTERACTION_EVENT_TYPES,
        events_as_interactions,
    )

    got = {
        (r["user_id"], r["f"], r["g"]): (r["a_val"], r["b_val"])
        for r in q_ials_normal_eq(spark, sf_dir).collect()
    }
    inter = (
        events_as_interactions(load_table(spark, sf_dir, "events"))
        .filter(F.col("event_type").isin(*INTERACTION_EVENT_TYPES))
        .groupBy("user_id", "item_id")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    items = sorted({r["item_id"] for r in inter})
    r_, alpha, reg = _IALS_NE_RANK, _IALS_NE_ALPHA, _IALS_NE_REG
    y = np.array(
        [
            [(i * P1 + (f + 1) * P2) % 7 - 3 for f in range(r_)]
            for i in items
        ],
        dtype=np.float64,
    )
    idx = {i: k for k, i in enumerate(items)}
    g0 = y.T @ y
    users: dict[int, list] = {}
    for row in inter:
        users.setdefault(row["user_id"], []).append(row)
    for u, rows in users.items():
        a_u = g0.copy()
        b_u = np.zeros(r_)
        for row in rows:
            yv = y[idx[row["item_id"]]]
            a_u += alpha * row["n"] * np.outer(yv, yv)
            b_u += (1 + alpha * row["n"]) * yv
        a_u += reg * np.eye(r_)
        for f in range(r_):
            for g in range(r_):
                av, bv = got[(u, f, g)]
                assert av == pytest.approx(a_u[f, g], abs=1e-9), (u, f, g)
                assert bv == b_u[f]
    assert len(got) == len(users) * r_ * r_


def test_pure_svd_range_finder_matches_dense_numpy(spark, sf_dir):
    """pure_svd_range_finder emits exactly Z = Xᵀ(X·Ω) for the pinned
    grid Ω — dense numpy replica over the same implicit URM."""
    from contentwise_impressions_spark.functions.hashing import P1, P2
    from contentwise_impressions_spark.plans.modelops import (
        _IALS_NE_RANK,
        q_pure_svd_range_finder,
    )

    urm_rows = (
        implicit_urm(load_table(spark, sf_dir, "events"))
        .select("user_id", "item_id")
        .collect()
    )
    users = sorted({r["user_id"] for r in urm_rows})
    items = sorted({r["item_id"] for r in urm_rows})
    u_idx = {u: k for k, u in enumerate(users)}
    i_idx = {i: k for k, i in enumerate(items)}
    x = np.zeros((len(users), len(items)))
    for r in urm_rows:
        x[u_idx[r["user_id"]], i_idx[r["item_id"]]] = 1.0
    r_ = _IALS_NE_RANK
    omega = np.array(
        [
            [(i * P1 + (f + 1) * P2) % 7 - 3 for f in range(r_)]
            for i in items
        ],
        dtype=np.float64,
    )
    z = x.T @ (x @ omega)
    got = {
        (r["item_id"], r["f"]): r["z"]
        for r in q_pure_svd_range_finder(spark, sf_dir).collect()
    }
    assert len(got) == len(items) * r_
    for i in items:
        for f in range(r_):
            assert got[(i, f)] == z[i_idx[i], f], (i, f)


def test_nmf_mu_step_matches_dense_numpy(spark, sf_dir):
    """nmf_mu_step emits exactly the Lee–Seung H-update factors: dense
    numpy replica num = WᵀA, den = (WᵀW)H₀ over the same pinned grids."""
    from contentwise_impressions_spark.functions.hashing import P1, P2
    from contentwise_impressions_spark.plans.modelops import (
        _IALS_NE_RANK,
        q_nmf_mu_step,
    )

    urm_rows = (
        implicit_urm(load_table(spark, sf_dir, "events"))
        .select("user_id", "item_id")
        .collect()
    )
    users = sorted({r["user_id"] for r in urm_rows})
    items = sorted({r["item_id"] for r in urm_rows})
    u_idx = {u: k for k, u in enumerate(users)}
    i_idx = {i: k for k, i in enumerate(items)}
    a = np.zeros((len(users), len(items)))
    for r in urm_rows:
        a[u_idx[r["user_id"]], i_idx[r["item_id"]]] = 1.0
    r_ = _IALS_NE_RANK
    w = np.array(
        [[(u * P1 + (f + 1) * P2) % 7 for f in range(r_)] for u in users],
        dtype=np.float64,
    )
    h0 = np.array(
        [[(i * P1 + (g + 1) * P2) % 5 for g in range(r_)] for i in items],
        dtype=np.float64,
    ).T  # (k, n_items)
    num = w.T @ a
    den = (w.T @ w) @ h0
    got = {
        (r["item_id"], r["f"]): (r["h0"], r["num"], r["den"])
        for r in q_nmf_mu_step(spark, sf_dir).collect()
    }
    assert len(got) == len(items) * r_
    for i in items:
        for f in range(r_):
            hv, nv, dv = got[(i, f)]
            assert hv == h0[f, i_idx[i]]
            assert nv == num[f, i_idx[i]]
            assert dv == den[f, i_idx[i]]


def test_ease_r_cg_matvec_matches_dense_numpy(spark, sf_dir):
    """ease_r_cg_matvec emits exactly q = (XᵀX + λI)p for the pinned
    direction p: dense numpy replica over the same implicit URM (the
    DuckDB twin pins cross-engine replay; this pins the MATH — that the
    factored two-pass program really is the Gram matvec the CG kernel
    runs per iteration)."""
    from contentwise_impressions_spark.functions.hashing import P1, P2
    from contentwise_impressions_spark.plans.modelops import (
        q_ease_r_cg_matvec,
    )
    from contentwise_impressions_spark.recommenders.slim import EASE_R_L2

    urm_rows = (
        implicit_urm(load_table(spark, sf_dir, "events"))
        .select("user_id", "item_id")
        .collect()
    )
    users = sorted({r["user_id"] for r in urm_rows})
    items = sorted({r["item_id"] for r in urm_rows})
    u_idx = {u: k for k, u in enumerate(users)}
    i_idx = {i: k for k, i in enumerate(items)}
    x = np.zeros((len(users), len(items)))
    for r in urm_rows:
        x[u_idx[r["user_id"]], i_idx[r["item_id"]]] = 1.0
    p = np.array([(i * P1 + P2) % 7 - 3 for i in items], dtype=np.float64)
    q = x.T @ (x @ p) + EASE_R_L2 * p
    got = {
        r["item_id"]: (r["p"], r["q"])
        for r in q_ease_r_cg_matvec(spark, sf_dir).collect()
    }
    assert len(got) == len(items)
    for i in items:
        pv, qv = got[i]
        assert pv == p[i_idx[i]]
        assert qv == q[i_idx[i]], i


def test_funk_svd_grad_step_matches_dense_numpy(spark, sf_dir):
    """funk_svd_grad_step emits exactly the reference per-sample SGD
    gradients at the pinned epoch-0 factors
    (MatrixFactorization_Cython_Epoch.pyx:286-347): dense numpy replica
    e = n − W·H, gW = e·H − reg·W, gH = e·W − reg·H."""
    from contentwise_impressions_spark.functions.hashing import P1, P2
    from contentwise_impressions_spark.plans.modelops import (
        _IALS_NE_RANK,
        q_funk_svd_grad_step,
    )
    from contentwise_impressions_spark.sources.interactions import (
        INTERACTION_EVENT_TYPES,
        events_as_interactions,
    )

    cnt = (
        events_as_interactions(load_table(spark, sf_dir, "events"))
        .filter(F.col("event_type").isin(*INTERACTION_EVENT_TYPES))
        .groupBy("user_id", "item_id")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    r_, reg = _IALS_NE_RANK, 1
    got = {
        (r["user_id"], r["item_id"], r["f"]): (
            r["err"], r["grad_user"], r["grad_item"],
        )
        for r in q_funk_svd_grad_step(spark, sf_dir).collect()
    }
    assert len(got) == len(cnt) * r_
    for row in cnt:
        u, i, n = row["user_id"], row["item_id"], row["n"]
        w = np.array([(u * P1 + (f + 1) * P2) % 7 - 3 for f in range(r_)])
        h = np.array([(i * P1 + (f + 1) * P2) % 5 - 2 for f in range(r_)])
        e = n - int(w @ h)
        for f in range(r_):
            ev, gw, gh = got[(u, i, f)]
            assert ev == e
            assert gw == e * h[f] - reg * w[f]
            assert gh == e * w[f] - reg * h[f]
