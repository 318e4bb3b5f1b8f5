"""Physical-plan regression tests: the scale properties (pushdown, pruning,
broadcast) must survive refactors, not just the result values."""

from __future__ import annotations

import pytest

from contentwise_impressions_spark.plans import all_queries

QUERIES = all_queries()


def _formatted_plan(df):
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_pricing_summary_pushdown_and_pruning(spark, sf_dir):
    plan = _formatted_plan(QUERIES["pricing_summary"](spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection pruned to the 7 needed columns — no full-row scan
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_partkey" not in read and "l_orderkey" not in read


def test_filter_project_reads_four_columns(spark, sf_dir):
    plan = _formatted_plan(QUERIES["filter_project"](spark, sf_dir))
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "event_id" not in read  # unused column pruned at the scan
    assert "EqualTo(event_type,click)" in plan


def test_dim_joins_are_broadcast(spark, sf_dir):
    plan = _formatted_plan(QUERIES["region_customer_rollup"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_recommend_pipeline_no_cartesian_without_broadcast(spark, sf_dir):
    # the candidate fan-out must be a broadcast nested loop over the tiny
    # popularity table, never a shuffled cartesian
    plan = _formatted_plan(QUERIES["toppop_recommendations"](spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_similarity_partial_aggregation(spark, sf_dir):
    # pair-dot aggregation must partial-aggregate map-side (reference's
    # blocked accumulation analog)
    plan = _formatted_plan(QUERIES["item_cosine_topk"](spark, sf_dir))
    assert "partial_" in plan.lower() or "HashAggregate" in plan


def test_ivf_centroid_join_is_broadcast(spark, sf_dir):
    # the centroid side is n_list × d rows — it must ship to the corpus
    # as a broadcast, never shuffle the corpus for a sort-merge join.
    # r16: the distance pass is a map-only Arrow kernel over the scan
    # (centroid matrix a broadcast variable), so the corpus crosses no
    # Exchange at all before the per-vector argmin window.
    plan = _formatted_plan(QUERIES["ann_ivf_assignments"](spark, sf_dir))
    assert "MapInPandas" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    """Both sides pre-bucketed on the join key with the same bucket count:
    the sort-merge join must read buckets directly — NO Exchange on either
    side (the 100 TB co-location layer, sources/bucketed.py)."""
    from contentwise_impressions_spark.sources.bucketed import bucketed_or_build
    from contentwise_impressions_spark.sources.interactions import implicit_urm
    from contentwise_impressions_spark.sources.tables import load_table

    urm_t = bucketed_or_build(
        spark,
        "test_urm_bucketed",
        "item_id",
        lambda: implicit_urm(load_table(spark, sf_dir, "events")),
        n_buckets=4,
    )
    pop_t = bucketed_or_build(
        spark,
        "test_pop_bucketed",
        "item_id",
        lambda: implicit_urm(load_table(spark, sf_dir, "events"))
        .groupBy("item_id")
        .count(),
        n_buckets=4,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = urm_t.join(pop_t, "item_id")
        plan = _formatted_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and the bucketed result equals the plain-scan join
        plain = implicit_urm(load_table(spark, sf_dir, "events"))
        expect = plain.join(plain.groupBy("item_id").count(), "item_id").count()
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS test_urm_bucketed")
        spark.sql("DROP TABLE IF EXISTS test_pop_bucketed")


def test_salted_join_widens_the_shuffle_key(spark, sf_dir):
    """The salted join must physically key on (user_id, _salt) — the salt
    column has to reach the join, not be optimized away."""
    plan = _formatted_plan(QUERIES["salted_user_nation_counts"](spark, sf_dir))
    assert "_salt" in plan, plan


def test_asof_join_is_single_key_shuffle_no_join(spark, sf_dir):
    # the union-window as-of formulation must contain NO join operator at
    # all (that's the point: no theta-join pair explosion) and exactly one
    # window over the user-key partitioning
    plan = _formatted_plan(QUERIES["click_attribution"](spark, sf_dir))
    assert "Join" not in plan, "as-of must not lower to a join"
    assert "Window" in plan


def test_range_join_is_equi_join_not_nested_loop(spark, sf_dir):
    # the bucketed range join must lower to a hash-partitioned equi join
    # (on key+bucket), never BroadcastNestedLoopJoin / CartesianProduct
    plan = _formatted_plan(QUERIES["view_to_click_conversions"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan


def test_sql_text_query_pushes_filters_to_scans(spark, sf_dir):
    # spark.sql text must optimize exactly like the DataFrame API: both
    # date predicates and the segment filter reach the parquet scans
    plan = _formatted_plan(QUERIES["sql_shipping_priority"](spark, sf_dir))
    assert "EqualTo(c_mktsegment,BUILDING)" in plan
    assert "LessThan(o_orderdate" in plan
    assert "GreaterThan(l_shipdate" in plan


def test_rollup_is_single_scan(spark, sf_dir):
    # ROLLUP must expand grouping sets over ONE scan of the fact table
    plan = _formatted_plan(QUERIES["revenue_rollup"](spark, sf_dir))
    import re

    scans = re.findall(r"^\(\d+\) Scan parquet", plan, flags=re.M)
    assert len(scans) == 1
    assert "Expand" in plan


def test_partitioned_sink_prunes_partitions_on_reread(spark, sf_dir, tmp_path):
    # write_table(partition_by=...) must give hive-style partition pruning:
    # a filter on the partition column becomes a PartitionFilter (directories
    # skipped at planning), not a data filter over a full scan
    from pyspark.sql import functions as F

    from contentwise_impressions_spark.sources.tables import (
        load_table,
        write_table,
    )

    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "ev_parted")
    write_table(ev, out, partition_by=["event_type"])
    back = (
        spark.read.parquet(out)
        .filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .count()
    )
    plan = _formatted_plan(back)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "event_type" in pf[0], plan


def test_literal_rank_limits_lower_to_distributed_topk(spark, sf_dir):
    # a literal `row_number <= k` over an empty-partition window must lower
    # to TakeOrderedAndProject (per-partition heaps + merge), not a
    # single-task global Window sort
    for name in ("toppop", "remove_top_popular"):
        phys = (
            QUERIES[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in phys, name


def test_popularity_bias_has_no_per_row_global_sort(spark, sf_dir):
    # the tie-decomposed share/gini must window over DISTINCT counts only:
    # no row_number anywhere in the plan
    plan = _formatted_plan(QUERIES["popularity_bias_stats"](spark, sf_dir))
    assert "row_number" not in plan


def test_blocked_kernel_is_cogrouped_not_driver_side(spark, sf_dir):
    # the CBF/hybrid kernel must be a shuffled block product
    # (FlatMapGroupsInPandas after one exchange on the block keys) with no
    # cartesian/nested-loop fallback — and never a collected driver matrix
    plan = _formatted_plan(QUERIES["itemcbf_cosine_topk"](spark, sf_dir))
    assert "FlatMapGroupsInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ann_ivf_rescore_shuffles_on_list_key(spark, sf_dir):
    # IVF re-score = cogrouped per-list GEMM; the full index must not be
    # broadcast (only the tiny centroid join may broadcast)
    plan = _formatted_plan(QUERIES["ann_ivf_topk"](spark, sf_dir))
    assert "FlatMapGroupsInPandas" in plan
    assert "list_id" in plan
    assert "CartesianProduct" not in plan


def test_ngram_jaccard_stop_shingle_filter_before_pair_join(spark, sf_dir):
    # the df cap must land before the pair self-join: a filter on the
    # aggregated document frequency feeding the shingle equi-join
    plan = _formatted_plan(QUERIES["ngram_jaccard_topn"](spark, sf_dir))
    assert "_df" in plan
    # the pair join stays an equi-join of some kind (broadcast at tiny SF,
    # shuffled at scale) — never a nested-loop/cartesian
    joins = (
        plan.count("SortMergeJoin")
        + plan.count("ShuffledHashJoin")
        + plan.count("BroadcastHashJoin")
    )
    assert joins >= 1
    assert "CartesianProduct" not in plan


def test_conversion_funnel_is_single_user_shuffle_one_job(spark, sf_dir):
    """The fused funnel must keep exactly one data-scale exchange (the
    hash partition on user_id shared by all three stacked windows and the
    per-user dedup) plus the single-partition final-count exchange — the
    round-4 formulation ran three separate actions over an uncached join
    chain (20.3 s at sf0.1 vs ~0.6 s fused)."""
    import re

    plan = _formatted_plan(QUERIES["conversion_funnel"](spark, sf_dir))
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchanges == 2, plan  # user-hash + final SinglePartition
    assert "SinglePartition" in plan
    assert "Join" not in plan  # min-timestamp windows, not a self-join chain


def test_passage_chunks_is_shuffle_free(spark, sf_dir):
    # the chunker is a pure map stage (split/slice/array_join + explode):
    # ANY exchange would mean it stopped being embarrassingly parallel
    plan = _formatted_plan(QUERIES["passage_chunks"](spark, sf_dir))
    assert "Exchange" not in plan
    assert "Generate" in plan  # the explode fan-out stays in codegen


def test_shard_manifest_single_rollup_exchange(spark, sf_dir):
    # shard assignment is a narrow map; the only shuffle allowed is the
    # 16-key partial-agg rollup
    plan = _formatted_plan(QUERIES["training_shard_manifest"](spark, sf_dir))
    # formatted plans list each operator once in the tree and once in the
    # detail section; one physical Exchange therefore appears <= 2 times
    assert plan.count("Exchange") <= 2
    assert "CartesianProduct" not in plan


def test_dsir_ratio_table_is_broadcast(spark, sf_dir):
    # the O(B) log-ratio model table must broadcast onto the token
    # stream — a sort-merge join here would shuffle the whole stream
    plan = _formatted_plan(QUERIES["dsir_importance_weights"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_hard_pairs_is_cogrouped_kernel(spark, sf_dir):
    plan = _formatted_plan(QUERIES["hard_negative_pairs"](spark, sf_dir))
    assert "FlatMapGroupsInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_incremental_dedup_band_equi_join(spark, sf_dir):
    # the ingest-batch check must be an equi-join on (band, bucket) —
    # never a nested-loop over the corpus
    plan = _formatted_plan(QUERIES["incremental_dedup_flags"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_negative_samples_is_cartesian_free(spark, sf_dir):
    # bounded-proposal generator: O(users·n_props) rows, never the full
    # user×item complement — no cartesian/nested-loop anywhere, and the
    # item-index join stays a broadcast equi-join
    for q in (
        "negative_samples",
        "negative_sample_eval",
        "bpr_triplets_outside",
    ):
        plan = _formatted_plan(QUERIES[q](spark, sf_dir))
        assert "CartesianProduct" not in plan, q
        assert "BroadcastNestedLoopJoin" not in plan, q


def test_split_invariants_is_one_fused_job(spark, sf_dir):
    # all five assertion counters from one groupBy + one global agg —
    # the former shape ran seven actions incl. three overlap joins
    plan = _formatted_plan(QUERIES["split_invariants"](spark, sf_dir))
    for j in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert j not in plan


def test_multi_cutoff_eval_is_single_pass(spark, sf_dir):
    # per-cutoff metrics come from ONE stack() unpivot over one per-user
    # aggregate — the former unionByName-of-branches shape recomputed the
    # whole labeled-recs pipeline once per cutoff (3.6x the single-cutoff
    # query); a Union of parallel eval pipelines must not come back
    plan = _formatted_plan(QUERIES["toppop_eval_multi_cutoff"](spark, sf_dir))
    assert "Union" not in plan


def test_random_recommendations_is_cartesian_free(spark, sf_dir):
    # bounded-proposal Random recommender: no user x catalog candidate
    # stream (top-k of uniform over a random subset IS a uniform pick)
    plan = _formatted_plan(QUERIES["random_recommendations"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dedup_survivors_one_kept_per_cluster(spark, sf_dir):
    """Exactly one survivor per cluster; the survivor is a longest member
    (min doc_id among longest), and singleton clusters keep themselves."""
    import pandas as pd

    from pyspark.sql import functions as F
    from contentwise_impressions_spark.sources.tables import load_table

    out = QUERIES["dedup_survivors"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    pdf = out.join(docs, "doc_id").toPandas()
    assert len(pdf) == docs.count()  # every document gets a verdict
    for cid, grp in pdf.groupby("cluster_id"):
        assert grp["kept"].sum() == 1, cid
        assert (grp["cluster_size"] == len(grp)).all()
        winner = grp[grp["kept"] == 1].iloc[0]
        best = grp.sort_values(
            ["n_chars", "doc_id"], ascending=[False, True]
        ).iloc[0]
        assert winner["doc_id"] == best["doc_id"], cid


def test_cluster_prototypes_are_home_list_members(spark, sf_dir):
    """Prototypes carry ranks 1..m with no gaps per cluster, and each
    prototype's list is its own IVF home assignment."""
    protos = QUERIES["cluster_prototype_sample"](spark, sf_dir).toPandas()
    assign = {
        r["vec_id"]: r["list_id"]
        for r in QUERIES["ann_ivf_assignments"](spark, sf_dir).collect()
    }
    assert protos["proto_rank"].between(1, 4).all()
    for lid, grp in protos.groupby("list_id"):
        assert sorted(grp["proto_rank"]) == list(range(1, len(grp) + 1))
    for r in protos.itertuples():
        assert assign[r.vec_id] == r.list_id


def test_rolling_window_is_streaming_frame_not_self_join(spark, sf_dir):
    """The trailing-7d rollup must be ONE hash shuffle on o_custkey feeding
    a RANGE-frame WindowExec — never the quadratic range self-join
    formulation (`o2.date BETWEEN o1.date - 7d AND o1.date`)."""
    import re

    plan = _formatted_plan(QUERIES["rolling_7d_revenue"](spark, sf_dir))
    assert "Join" not in plan, plan
    assert "Window" in plan
    exchanges = re.findall(r"^\(\d+\) Exchange", plan, re.M)
    assert len(exchanges) == 1, plan  # the o_custkey hash partition only
    assert "hashpartitioning(o_custkey" in plan


def test_bloom_prejoin_probe_is_broadcast_no_cartesian(spark, sf_dir):
    """The Bloom set-bit relation (≤ k·m rows) and the member dim must
    reach the fact scan as broadcasts; the probe must never plan as a
    cartesian or data-scale sort-merge join."""
    plan = _formatted_plan(QUERIES["bloom_prejoin_stats"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_six_way_star_join_broadcasts_dims_pushes_filters(spark, sf_dir):
    """TPC-H Q5 shape: the region filter and the order-date range must
    reach their scans as pushed filters, the region→nation→supplier
    chain must broadcast, and nothing may plan as a cartesian."""
    plan = _formatted_plan(QUERIES["local_supplier_volume"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(r_name,ASIA)" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_q17_decorrelation_is_window_not_self_join(spark, sf_dir):
    """small_quantity_revenue must decorrelate the per-part average as a
    WINDOW over the brand-filtered slice — one partkey shuffle, exactly
    one lineitem scan, and the brand filter pushed into the part scan.
    The naive decorrelation (join lineitem to an aggregated copy of
    itself) scans the fact twice."""
    plan = _formatted_plan(QUERIES["small_quantity_revenue"](spark, sf_dir))
    assert "Window" in plan
    assert plan.count("lineitem.parquet") <= 2, plan  # tree + details of ONE scan
    assert "EqualTo(p_brand,Brand#13)" in plan


def test_q18_aggregates_first_then_takeordered(spark, sf_dir):
    """large_volume_orders must shrink via the HAVING aggregate before any
    dimension join and finish with TakeOrderedAndProject (top-20 without
    a global sort materialization)."""
    plan = _formatted_plan(QUERIES["large_volume_orders"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    # the sum_qty > 250 filter runs on the aggregate output, not post-join
    assert "sum_qty" in plan


def test_q22_anti_join_with_pushed_date(spark, sf_dir):
    """dormant_rich_customers: the NOT EXISTS must plan as a left-anti
    equi-join and the date predicate must reach the orders scan."""
    plan = _formatted_plan(QUERIES["dormant_rich_customers"](spark, sf_dir))
    assert "LeftAnti" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_bfs_is_bounded_equi_join_iteration(spark, sf_dir):
    """part_bfs_hops: every frontier expansion must be an equi-join (no
    nested loop anywhere) and the hop bound must keep the plan finite —
    4 frontier joins + the seed attachment."""
    plan = _formatted_plan(QUERIES["part_bfs_hops"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_scd2_is_single_user_shuffle(spark, sf_dir):
    """user_state_history: both window passes must share ONE user_id hash
    partition — no join, no second shuffle."""
    import re

    plan = _formatted_plan(QUERIES["user_state_history"](spark, sf_dir))
    assert "Join" not in plan, plan
    # exactly one HASH exchange (both windows share the user_id
    # partition); the only other exchange is the presentation orderBy's
    # range partition
    hashes = re.findall(r"hashpartitioning\(user_id", plan)
    assert len(hashes) >= 1
    exchanges = re.findall(r"^\(\d+\) Exchange", plan, re.M)
    assert len(exchanges) <= 2, plan


def test_q21_decorrelates_to_single_fact_scan(spark, sf_dir):
    """lone_returner_suppliers: the EXISTS + NOT-EXISTS pair must collapse
    into ONE per-order aggregate — one lineitem scan plus the supplier
    broadcast, and a distributed TakeOrderedAndProject for the LIMIT."""
    import re

    plan = _formatted_plan(QUERIES["lone_returner_suppliers"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    scans = re.findall(r"^\(\d+\) Scan parquet", plan, re.M)
    assert len(scans) == 2, plan  # lineitem once + supplier broadcast
    assert "CartesianProduct" not in plan


def test_q19_pushes_disjunctive_conjuncts_to_both_scans(spark, sf_dir):
    """disjunctive_brand_revenue: the OR of mixed-side conjunctions must
    still produce derivable pushed filters on BOTH parquet scans."""
    plan = _formatted_plan(QUERIES["disjunctive_brand_revenue"](spark, sf_dir))
    pushed = [
        ln for ln in plan.splitlines() if "PushedFilters" in ln and "Or(" in ln
    ]
    assert len(pushed) >= 2, plan  # quantity OR on lineitem, brand/size OR on part


def test_q16_blacklist_is_broadcast_anti_join(spark, sf_dir):
    """part_supplier_counts: NOT IN over a non-nullable key must plan as a
    broadcast LEFT ANTI hash join, never a nested-loop NAAJ."""
    plan = _formatted_plan(QUERIES["part_supplier_counts"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pit_join_lowers_to_window_no_join(spark, sf_dir):
    """purchase_state_pit_join: the interval-containment join must be
    absent from the physical plan — one tagged union + one user-keyed
    window only."""
    plan = _formatted_plan(QUERIES["purchase_state_pit_join"](spark, sf_dir))
    assert "Join" not in plan, plan
    assert "Union" in plan and "Window" in plan


def test_journey_patterns_no_event_self_join(spark, sf_dir):
    """user_journey_patterns: funnel matching must be a per-user string
    regex, never an event-log self-join."""
    import re

    plan = _formatted_plan(QUERIES["user_journey_patterns"](spark, sf_dir))
    assert "Join" not in plan, plan
    scans = re.findall(r"^\(\d+\) Scan parquet", plan, re.M)
    assert len(scans) == 1, plan


def test_snapshot_diff_is_one_scan_no_join(spark, sf_dir):
    """snapshot_diff_parts: the v1×v2 full-outer reconciliation must
    collapse to ONE conditional-aggregation scan of the log."""
    import re

    plan = _formatted_plan(QUERIES["snapshot_diff_parts"](spark, sf_dir))
    assert "Join" not in plan, plan
    scans = re.findall(r"^\(\d+\) Scan parquet", plan, re.M)
    assert len(scans) == 1, plan


def test_adamic_adar_wedges_are_equi_joins(spark, sf_dir):
    """part_adamic_adar: wedge enumeration and the existing-edge exclusion
    must be hash equi-joins (middle-vertex key / pair key), with the
    degree table broadcast."""
    plan = _formatted_plan(QUERIES["part_adamic_adar"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # degrees ride a broadcast
    assert "LeftAnti" in plan  # existing edges excluded


def test_hll_rollup_total_reads_registers_not_events(spark, sf_dir):
    """hll_register_rollup: the total level must merge the cached daily
    REGISTER table — the events scan count stays bounded by the daily
    build + the two exact-distinct verification branches, and the
    register merge is a plain aggregate."""
    from contentwise_impressions_spark.plans.shared import (
        release_session_payloads,
    )

    release_session_payloads(spark)
    df = QUERIES["hll_register_rollup"](spark, sf_dir)
    plan = _formatted_plan(df)
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan, plan


def test_q7_nation_dim_broadcasts_twice_one_fact_shuffle(spark, sf_dir):
    """nation_trade_volume: both nation roles (and supplier/customer)
    must ride broadcasts — the only shuffle join is lineitem ⋈ orders."""
    import re

    plan = _formatted_plan(QUERIES["nation_trade_volume"](spark, sf_dir))
    assert len(re.findall(r"BroadcastHashJoin", plan)) >= 4, plan
    assert "CartesianProduct" not in plan


def test_q14_share_is_single_scan_single_aggregate(spark, sf_dir):
    """promo_revenue_share: promo and total sums must come from ONE
    grouped aggregate over one lineitem scan — never two scans diffed."""
    import re

    plan = _formatted_plan(QUERIES["promo_revenue_share"](spark, sf_dir))
    scans = re.findall(r"^\(\d+\) Scan parquet", plan, re.M)
    assert len(scans) == 2, plan  # lineitem once + part broadcast


def test_q2_min_cost_semi_filters_broadcast_before_agg(spark, sf_dir):
    """min_cost_part_supplier: the region-supplier and part filters must
    reach the fact as BROADCAST left-semi joins BEFORE the catalog
    aggregate (the fact is filtered first, then aggregated once), and the
    decorrelated min join-back must never lower to a nested loop."""
    import re

    plan = _formatted_plan(QUERIES["min_cost_part_supplier"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert re.search(r"BroadcastHashJoin LeftSemi", plan), plan
    # column pruning: the part scan must not read p_name/p_retailprice
    reads = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert not any("p_retailprice" in r or "p_name" in r for r in reads), plan


def test_q9_profit_both_fact_passes_semi_filtered(spark, sf_dir):
    """nation_profit_rollup: the self-derived cost catalog forces two
    lineitem passes — BOTH must carry the broadcast left-semi part
    filter (the 'red' slice is what's scanned twice, never the full
    fact), the catalog join-back must stay an equi hash join, and no
    nested loop may appear."""
    import re

    plan = _formatted_plan(QUERIES["nation_profit_rollup"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    semis = re.findall(r"BroadcastHashJoin LeftSemi", plan)
    assert len(semis) >= 2, plan  # one per fact pass


def _broadcast_exchange_subtrees(plan: str) -> list[str]:
    """Operator-tree text under each BroadcastExchange node of a
    formatted explain (the first section is the indented tree; a node's
    subtree is the run of lines with a strictly longer tree prefix)."""
    import re

    tree = plan.split("\n\n")[0].splitlines()

    def prefix(ln: str) -> int:
        return len(re.match(r"^[\s:+\-*]*", ln).group(0))

    subs = []
    for i, ln in enumerate(tree):
        if "BroadcastExchange" in ln:
            d, j, sub = prefix(ln), i + 1, []
            while j < len(tree) and prefix(tree[j]) > d:
                sub.append(tree[j])
                j += 1
            subs.append("\n".join(sub))
    return subs


def test_q10_top20_broadcasts_into_customer_not_vice_versa(spark, sf_dir):
    """top_returning_customers: the 20-row top side must broadcast INTO
    the customer scan (customer scales with SF — 15M rows at sf100 must
    never cross the wire for 20 output rows); no nested loop.

    Structural, not existence-only: the BroadcastExchange subtree must
    CONTAIN the top-20 (TakeOrderedAndProject) and must NOT contain the
    customer scan — at test SF, AQE could legally broadcast customer too,
    which an "any BroadcastHashJoin exists" assertion would miss."""
    import re

    plan = _formatted_plan(QUERIES["top_returning_customers"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
    # operator id of the customer scan, from the details section
    cust = [
        m.group(1)
        for m in re.finditer(r"\((\d+)\) Scan parquet", plan)
        if re.search(
            rf"\({m.group(1)}\) Scan parquet[^\n]*\n(?:[^\n]+\n)*?"
            rf"[^\n]*Location[^\n]*customer\.parquet",
            plan,
        )
    ]
    assert cust, plan
    subs = _broadcast_exchange_subtrees(plan)
    assert any("TakeOrderedAndProject" in s for s in subs), plan
    assert not any(f"({cust[0]})" in s for s in subs), plan
    reads = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert not any("c_mktsegment" in r for r in reads), plan  # pruned


def test_q6_all_predicates_pushed_and_pruned(spark, sf_dir):
    """forecast_revenue_change: every range bound must reach the parquet
    scan as a PushedFilter (shipdate window, discount band, quantity
    cap) and the ReadSchema must carry only the four needed columns —
    the Q6 shape IS the pushdown-purity benchmark."""
    plan = _formatted_plan(QUERIES["forecast_revenue_change"](spark, sf_dir))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, plan
    joined = " ".join(pushed)
    for frag in (
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.05)",
        "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24",
    ):
        assert frag in joined, (frag, joined)
    reads = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert reads and not any(
        c in reads[0] for c in ("l_tax", "l_returnflag", "l_orderkey")
    ), reads


def test_q12_single_orderkey_shuffle_no_nested_loop(spark, sf_dir):
    """late_shipment_priorities: the mixed-side date predicate must stay
    a post-join Filter/join-condition on an EQUI join (never a nested
    loop), and the lineitem date window must push to the scan."""
    plan = _formatted_plan(QUERIES["late_shipment_priorities"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    pushed = " ".join(
        ln for ln in plan.splitlines() if "PushedFilters" in ln
    )
    assert "l_shipdate" in pushed, plan


def test_window_widths_are_data_derived(spark, sf_dir):
    # r17 (§2.2): the two window rows that scaled <0.8 in the r16 driver
    # block pin their one window exchange to a footer-derived width
    # (REPARTITION_BY_NUM) instead of the session shuffle default; the
    # explicit repartition satisfies the window's required distribution,
    # so no exchange is added.
    for name, key in (
        ("rolling_7d_revenue", "o_custkey"),
        ("dedup_survivors", "cluster_id"),
    ):
        plan = _formatted_plan(QUERIES[name](spark, sf_dir))
        assert "REPARTITION_BY_NUM" in plan, name
        assert f"hashpartitioning({key}" in plan, name
