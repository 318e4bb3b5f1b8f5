"""Bench-session hygiene: shared payload caches must be releasable.

Round-4 postmortem: the official bench ran 112 queries in ONE session while
the shared kernel payloads (ICM/URM/adjacency/embedding builds) were
deliberately never unpersisted — by the late-alphabet queries, accumulated
MEMORY_AND_DISK partitions and localCheckpoints inflated UNRELATED queries
up to 6x (value_outliers 10.0 s polluted vs 1.5 s clean, code unchanged).
bench.py now calls ``release_session_payloads`` between query families;
these tests pin that the release (a) actually empties every cache layer and
(b) keeps a cheap query's cost flat after a heavy persisted-payload query.
"""

from __future__ import annotations

import time

from contentwise_impressions_spark.plans import shared
from contentwise_impressions_spark.plans.registry import all_queries
from contentwise_impressions_spark.plans.shared import release_session_payloads

SF = "/root/testdata/sf0.01"


def _jvm_persistent_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _run(spark, name: str) -> float:
    qs = all_queries()
    t0 = time.perf_counter()
    qs[name](spark, SF).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def test_family_warmups_cover_shared_payload_modules(spark):
    """Every plan module that materializes session-shared payloads must
    expose a bench warmup (so the bench attributes build cost to a family
    line, not to whichever query touches the payload first) — and each
    warmup must actually populate a cache layer."""
    from contentwise_impressions_spark.operators import blocked_topk
    from contentwise_impressions_spark.plans.registry import bench_warmups

    warmups = bench_warmups()
    for fam in ("recsys", "mlops", "modelops", "cbfops",
                "textops", "selectionops"):
        assert fam in warmups, fam
    # dedupops splits its warmup into labeled parts (LSH pair
    # materialization vs ANN/PQ index builds) so regressions localize
    for part in ("dedupops/lsh", "dedupops/ann_index"):
        assert part in warmups, part
    release_session_payloads(spark)
    warmups["cbfops"](spark, SF)
    assert blocked_topk._CACHE  # the kernel payloads are pre-built
    release_session_payloads(spark)
    warmups["recsys"](spark, SF)
    assert shared._CACHE  # the URM is pre-materialized
    release_session_payloads(spark)


def test_release_empties_every_cache_layer(spark):
    """After release_session_payloads: the Python-side caches are empty and
    the JVM block manager holds zero persistent RDDs (persists AND
    localCheckpoints — the two accumulation vectors from round 4)."""
    from contentwise_impressions_spark.operators import blocked_topk

    release_session_payloads(spark)  # clean slate (session fixture is shared)
    # touch the three cache layers: a shared.materialized intermediate, a
    # blocked-kernel payload, and a localCheckpoint (minhash clusters)
    _run(spark, "itemcbf_cosine_topk")
    _run(spark, "minhash_dedup_clusters")
    assert blocked_topk._CACHE or shared._CACHE
    dropped = release_session_payloads(spark)
    assert dropped > 0
    assert not blocked_topk._CACHE
    assert not shared._CACHE
    assert _jvm_persistent_rdd_count(spark) == 0


def test_dedupops_subfamily_split_is_total_and_warmup_scoped(spark):
    """Round-13 verdict: the session-cached residual-PQ artifacts crowded
    five LSH-family queries 2-4x in-suite because all 39 dedupops queries
    ran as ONE bench family with both payload groups resident.  Pin the
    fix's shape: every bench-enabled dedupops query is assigned to one of
    the three sub-families (none left in the base module family, which
    would prefix-match BOTH warmups), and each warmup-backed sub-family
    matches exactly its own warmup key under bench.py's matching rule."""
    from contentwise_impressions_spark.plans.registry import (
        bench_query_families,
        bench_warmups,
    )

    fams = bench_query_families()
    warmups = bench_warmups()
    sub = {n: f for n, f in fams.items() if f.startswith("dedupops")}
    assert sub, "dedupops queries missing from the bench family map"
    allowed = {"dedupops/embed", "dedupops/ann_index", "dedupops/lsh"}
    assert set(sub.values()) <= allowed, sorted(set(sub.values()) - allowed)
    assert "dedupops" not in fams.values()  # base family would double-warm
    for fam in sorted(set(sub.values())):
        matched = [
            k for k in warmups if k == fam or k.startswith(f"{fam}/")
        ]
        assert len(matched) <= 1, (fam, matched)
    # the five round-13 victims all live in families WITHOUT the ANN
    # index payloads
    for victim in (
        "incremental_dedup_flags",
        "hard_negative_pairs",
        "minhash_dedup_clusters",
        "lsh_recall_stats",
        "eval_contamination",
    ):
        assert sub[victim] != "dedupops/ann_index", victim


def test_lsh_query_cost_flat_after_ann_index_payloads_released(spark):
    """The cross-sub-family pin the round-13 verdict asked for: an LSH
    query's cost must stay within 2x of its isolated cost when it runs
    after the ANN index payloads (IVF distances, PQ codebooks, residual-PQ
    centroid/code tables) were materialized and then released — exactly
    the boundary bench.py now crosses between the dedupops/ann_index and
    dedupops/lsh sub-families."""
    from contentwise_impressions_spark.plans.registry import bench_warmups

    release_session_payloads(spark)
    warmups = bench_warmups()
    warmups["dedupops/lsh"](spark, SF)
    _run(spark, "lsh_recall_stats")  # JIT/codegen warm-up
    t_iso = min(_run(spark, "lsh_recall_stats") for _ in range(3))
    release_session_payloads(spark)
    # the round-13 crowding source: the full ANN index build, residual-PQ
    # artifacts included
    warmups["dedupops/ann_index"](spark, SF)
    release_session_payloads(spark)
    warmups["dedupops/lsh"](spark, SF)
    _run(spark, "lsh_recall_stats")  # settle run, mirroring t_iso's warm-up
    t_after = min(_run(spark, "lsh_recall_stats") for _ in range(3))
    # structural gate above is the real pin; this wall-clock check gets an
    # absolute floor (sub-second plans are steal/GC-noise-dominated on this
    # VM) and ONE re-measure before failing — a loaded host inflates a
    # single triple far more often than a genuine payload re-accumulation,
    # which would survive the retry (r14 ADVICE).
    bound = 2.0 * max(t_iso, 0.5)
    if t_after > bound:
        # keep the first (failed) measurement visible in CI output so a
        # real regression trend isn't masked by the retry (r15 ADVICE)
        print(
            f"lsh wall-clock gate retry: first triple {t_after:.3f}s > "
            f"bound {bound:.3f}s (t_iso {t_iso:.3f}s) — re-measuring"
        )
        _run(spark, "lsh_recall_stats")  # re-settle
        t_after = min(_run(spark, "lsh_recall_stats") for _ in range(3))
    release_session_payloads(spark)
    assert t_after <= bound


def test_cheap_query_cost_flat_after_heavy_payload_query(spark):
    """A cheap scan-and-aggregate query must stay within 2x of its isolated
    cost when run after a heavy persisted-payload query + release — pins
    the de-pollution so silent re-accumulation fails loudly."""
    release_session_payloads(spark)
    _run(spark, "value_histogram")  # JIT/codegen warm-up for the cheap plan
    t_iso = min(_run(spark, "value_histogram") for _ in range(3))
    # heavy: builds and persists the ICM+CF payloads and runs the GEMM grid
    _run(spark, "cfcbf_hybrid_topk")
    release_session_payloads(spark)
    # one untimed settle run, mirroring the pre-t_iso warm-up: the GEMM grid
    # leaves JVM GC churn that decays within one run and is not the retained-
    # payload pollution this test pins (a re-accumulated persisted payload
    # would still slow the settled triple).
    _run(spark, "value_histogram")
    t_after = min(_run(spark, "value_histogram") for _ in range(3))
    # floor the baseline: sub-100ms plans are scheduler-noise-dominated
    assert t_after <= 2.0 * max(t_iso, 0.1)


def test_ivfpq_persist_before_fanout_pin(spark):
    """Regression pin for the r15 scale fix: ivfpq_topk must persist its
    trained artifacts (codebook, probe table, index payload) so the
    sizing count and the serving union don't re-execute the Lloyd/encode
    subtrees per consumer (BENCH_sf1 measured the family 5.2-7.1x warm
    at 10x data before the pin, 1.07-1.51x after).  And the blocks must
    stay sweepable: release_session_payloads' JVM block-manager sweep is
    what keeps the no-unpersist contract leak-free between families."""
    from contentwise_impressions_spark.operators.pq import ivfpq_topk
    from contentwise_impressions_spark.sources.tables import load_table

    release_session_payloads(spark, blocking=True)
    emb = load_table(spark, SF, "embeddings")
    out = ivfpq_topk(emb, k=3, n_list=8, ivf_iters=2)
    n_cached = len(spark.sparkContext._jsc.getPersistentRDDs())
    assert n_cached >= 3, (
        f"expected the codebook/probe-table/index-payload persists, "
        f"found {n_cached} persistent RDDs"
    )
    assert out.count() > 0  # serving reads through the caches
    release_session_payloads(spark, blocking=True)
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) == 0


def test_overlap_jobs_runs_all_and_propagates_failure(spark):
    """The r16 warmup-overlap helper must (a) run every thunk to
    completion — a dropped build would leave a family payload cold and
    silently shift its cost onto the first timed query — and (b) surface
    a thunk's exception like the serial form did, AFTER all thunks
    settle (so one failed chain can't strand another mid-build)."""
    import pytest

    done: list[str] = []
    shared.overlap_jobs(
        lambda: done.append("a"),
        lambda: done.append("b"),
        lambda: done.append("c"),
    )
    assert sorted(done) == ["a", "b", "c"]

    seen: list[str] = []

    def boom() -> None:
        raise RuntimeError("chain failed")

    with pytest.raises(RuntimeError, match="chain failed"):
        shared.overlap_jobs(lambda: seen.append("x"), boom)
    assert seen == ["x"]  # the healthy chain still completed
