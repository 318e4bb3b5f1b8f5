"""Regenerate PLANS.md: formatted physical plans of the headline queries.

Each pick names the scale property its plan demonstrates; the same
properties are regression-pinned in tests/test_plans.py.  Run from the
repo root: ``python tools_dump_plans.py``.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from contentwise_impressions_spark.plans import all_queries  # noqa: E402
from contentwise_impressions_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

PICKS = [
    ("pricing_summary", "scan sharing: filter+projection pushdown, one wide agg"),
    ("sql_shipping_priority", "SQL text -> same Catalyst pipeline; filters at all 3 scans"),
    ("region_customer_rollup", "dimension chain stays broadcast"),
    ("item_cosine_topk", "A^T A self-join with map-side partial aggregation"),
    ("toppop_recommendations", "remove-seen anti-join + per-user top-K window"),
    ("click_attribution", "as-of join lowered to union + ONE key-partitioned window (no join)"),
    ("view_to_click_conversions", "range join as bucketed equi-join"),
    ("toppop", "literal rank limit lowered to TakeOrderedAndProject"),
    ("revenue_rollup", "grouping sets expand over a single scan"),
    ("users_covering_traffic", "tie-decomposed prefix window over distinct counts"),
    ("hash_split_sizes", "deterministic hash split: narrow map + partial agg, no data shuffle"),
    ("corpus_bigrams", "array-native bigram fan-out inside codegen; shuffle is O(distinct bigrams)"),
    ("itemcbf_cosine_topk", "blocked cosine kernel, TRIANGULAR block grid (sym halves shuffle+GEMM) + ASYMMETRIC replication: light feature side broadcast per executor (size-gated), heavy adjacency side keeps minimal blocked replication; tagged-union -> FlatMapGroupsInPandas, window merge; no unbounded driver matrix"),
    ("ann_ivf_topk", "IVF re-score: shuffle on (list_id, sub-block), broadcast-centroid assignment stays relational"),
    ("ngram_jaccard_topn", "stop-shingle df cap before the pair self-join; shuffle keyed once on shingle"),
    ("passage_chunks", "chunker is pure codegen: explode over sequence + slice/array_join, ZERO shuffle"),
    ("bm25_search_topk", "search serving: term filter pushed below the weight joins, TakeOrderedAndProject top-K"),
    ("dsir_importance_weights", "O(B) model state: per-bucket log-ratio table broadcast onto the token stream"),
    ("incremental_dedup_flags", "batch-vs-index band equi-join: no corpus self-pairing, index side reusable"),
    ("negative_samples", "bounded proposal sampler: O(U*64) explode + broadcast item-index equi-join -> NO user x item cartesian complement"),
    ("split_invariants", "all five assertion counters from ONE fused groupBy + global agg; join-free (was 7 actions incl. 3 overlap joins)"),
    ("toppop_eval_multi_cutoff", "per-cutoff metrics from ONE stack() unpivot over one per-user aggregate — no Union of per-cutoff eval pipelines"),
    ("mf_serving_topk", "bounded MF serving: broadcast-GEMM mapInPandas -> per-user k+deg over-fetch; partial WindowGroupLimit trims candidates MAP-SIDE before the single user-keyed Exchange; remove-seen anti-join; NO user x catalog materialization"),
    ("mf_serving_topk_blocked", "same kernel forced onto the any-scale UB x IB blocked grid (applyInPandas per block pair) — the 100 TB path when item factors exceed the broadcast gate"),
    ("ann_ivfpq_topk", "composed IVF-PQ serving: coarse-quantizer candidate pruning x PQ code compression; index side ships 8 codes/vector, probes build M x K LUTs against the broadcast codebook — the 10^9-vector serving shape"),
    ("image_ahash_dedup", "image near-dup: decode+aHash in ONE map-side Arrow kernel; only 16 B/image reaches the duplicate-group shuffle — pixels never cross the wire"),
    ("dedup_survivors", "survivor selection: cluster labeling + per-cluster argmax window over (id, len, cluster) rows only; LSH-bounded partition keys"),
    ("hll_distinct_sketch", "portable HLL: max-per-register partial-aggregates map-side, m=64 rows per group shuffle — mergeable-sketch distinct counting"),
    ("countmin_heavy_hitters", "Count-Min probe: d x w counter table built with map-side combine then BROADCAST back to candidate keys; only the key list shuffles"),
    ("weighted_sample_topk", "A-ES weighted sample = stateless map + TakeOrderedAndProject (per-partition heaps, no global sort)"),
    ("rolling_7d_revenue", "RANGE window frame: one key shuffle + streaming frame pointer — no quadratic range self-join"),
    ("bloom_prejoin_stats", "Bloom prejoin: set-bit relation + member dim broadcast onto the fact; runtime-filter pushdown, no cartesian"),
    ("order_priority_rollup", "ROLLUP grouping sets: Expand x3 -> partial agg -> ONE shuffle of |groups| rows"),
    ("local_supplier_volume", "TPC-H Q5 6-way star: broadcast dim chain, pushed region/date filters, single fact-fact shuffle"),
    ("item_triangle_stats", "degree-ordered triangle counting: O(m^1.5) wedge bound, equi-joins only, quantile edge cutoff"),
    ("small_quantity_revenue", "TPC-H Q17 correlated scalar subquery decorrelated to a per-part WINDOW - fact scanned once"),
    ("customer_order_distribution", "TPC-H Q13 outer join with the aggregate pushed BELOW the join (orders pre-shrunk to one row per custkey)"),
    ("part_bfs_hops", "level-synchronous BFS (round-10 rebuild): ONE collect_set edge shuffle, size-gated broadcast frontiers probe the persisted edges in place, visited anti-join prunes re-expansion; recursive-CTE oracle"),
    ("user_state_history", "SCD2 interval build: two window passes sharing ONE user_id hash partition, no join"),
    ("daily_value_gapfill", "dense calendar resample: sequence() explode + single ignore-nulls window scan (no self-join LOCF)"),
    ("cdc_final_state", "CDC/MERGE apply: join-free keep-last window + delete-tombstone filter"),
    ("video_frame_stats", "video path: posexplode frame fan-out + COLUMNAR substring slice -> Arrow resize kernel, no exchange before the sort"),
    ("lone_returner_suppliers", "TPC-H Q21 EXISTS+NOT EXISTS chain decorrelated to ONE per-order aggregate; fact scanned once"),
    ("part_supplier_counts", "TPC-H Q16 NOT-IN blacklist as broadcast LEFT ANTI before the scan fans out; two-phase COUNT DISTINCT"),
    ("disjunctive_brand_revenue", "TPC-H Q19 disjunctive mixed-side predicate: derivable conjuncts pushed to BOTH scans, residual on the broadcast join"),
    ("part_adamic_adar", "link prediction: support-2 prune bounds the wedge join; middle degrees broadcast; existing-edge anti-join"),
    ("order_association_rules", "market-basket rules: one collect_set shuffle -> pair counts; item counts + global N broadcast; exact-int ratios"),
    ("stream_enriched_counts", "stream-static enrichment: per-micro-batch BroadcastHashJoin (stateless) below the watermarked window agg"),
    ("purchase_state_pit_join", "point-in-time SCD2 join lowered to ONE tagged-union window pass — zero joins; twin is the naive interval range join"),
    ("user_journey_patterns", "sequential pattern match: per-user journey built by codegen array ops, regex instead of an event-log self-join"),
    ("part_label_propagation", "sync label propagation x3: per-round equi-join + modal-label window, rounds chained through cached label tables"),
    ("mmr_diversified_topk", "MMR re-rank: blocked GEMM retrieval, then per-query equi-join sims + 3 unrolled window-argmax greedy steps — nothing data-scale after retrieval"),
    ("multi_touch_attribution", "linear attribution: 1h range join lowered to the epoch-bucketed equi-join; touch counts from ONE window, no second join"),
    ("event_cube_stats", "CUBE lattice: single Expand x4 over one scan -> partial-agg shuffle of |groups| rows; grouping_id disambiguates"),
    ("min_cost_part_supplier", "TPC-H Q2 correlated MIN decorrelated: broadcast left-semi region/part filters BEFORE the single catalog shuffle; grouped-MIN join-back, top-100"),
    ("ann_refined_topk", "IVF-PQ shortlist -> exact refine: pair set joins the vector table twice (|probes| x C rows), dot product is codegen zip_with/aggregate — no Arrow kernel, no N^2"),
]


def main() -> None:
    spark = get_spark("plans-dump", shuffle_partitions=8)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    qs = all_queries()

    def fmt(df):
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    out = [
        "# PLANS — formatted physical plans of headline queries",
        "",
        "Generated by `python tools_dump_plans.py` (sf0.001; plans are",
        "scale-invariant in shape).  Each plan is the evidence for the scale",
        "property named in the heading; regression-pinned in tests/test_plans.py.",
        "",
    ]
    for name, why in PICKS:
        plan = fmt(qs[name](spark, SF_DIR))
        keep = []
        for ln in plan.splitlines():
            if ln.startswith("(") and ") " in ln[:6]:
                keep.append(ln)
            elif (
                any(
                    k in ln
                    for k in (
                        "PushedFilters",
                        "ReadSchema",
                        "PartitionFilters",
                        "Arguments: ",
                    )
                )
                and len(ln) < 400
            ):
                keep.append(ln)
            elif not ln.startswith("(") and ("+-" in ln or ln.strip().startswith("*")):
                keep.append(ln)
        out += [f"## {name} — {why}", "", "```", *keep[:80], "```", ""]
    Path("PLANS.md").write_text("\n".join(out))
    print(f"PLANS.md written: {len(out)} blocks")
    spark.stop()


if __name__ == "__main__":
    main()
