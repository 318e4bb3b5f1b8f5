"""Query registry: every implemented operator exposed as a named query.

Each :class:`QuerySpec` pairs a Spark DataFrame program (the engine under
test) with an equivalent ANSI-SQL string for the DuckDB oracle.  Specs with
``oracle=None`` are non-SQL-expressible (streaming, iterative ML) and get the
driver's weaker rows-only check.

Column-name discipline: the driver sorts columns by name before hashing, so
every computed column is aliased identically in both the DataFrame program
and the SQL (see repo README / driver contract).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    #: include in bench.py timing (False for iterative model FITS, whose
    #: reference analog is a training budget, not a query — BASELINE.md)
    bench: bool = True


_REGISTRY: dict[str, QuerySpec] = {}


def register(spec: QuerySpec) -> QuerySpec:
    if spec.name in _REGISTRY:
        raise ValueError(f"duplicate query name: {spec.name}")
    _REGISTRY[spec.name] = spec
    return spec


def _load_all_modules() -> None:
    # import for side effect: each module registers its QuerySpecs
    from . import relational  # noqa: F401
    from . import recsys  # noqa: F401
    from . import textops  # noqa: F401
    from . import mlops  # noqa: F401
    from . import dedupops  # noqa: F401
    from . import modelops  # noqa: F401
    from . import impressionops  # noqa: F401
    from . import cbfops  # noqa: F401
    from . import pipelineops  # noqa: F401
    from . import selectionops  # noqa: F401


#: Names surfaced FIRST to the correctness driver, which verifies queries in
#: registration order up to a fixed budget (50 per round).  Evidence ledger
#: entering round 10 (computed from the CORRECTNESS_r0{1..9}.json key sets —
#: the authoritative source; rounds 8's file never landed): r9 evidence for
#: 50 queries, r7 for 46, r5 for 40, r4 for 36, r3 for 13, and exactly one
#: oracled query (stream_tumbling_counts) never rotated in.  Round-10
#: rotation: (1) the round-10 specs as they landed, (2) the three queries
#: whose kernels changed this round (BFS rebuild; triangle/excess-stock
#: persists moved to the payload registry), (3) stream_tumbling_counts,
#: (4) ALL thirteen r3-vintage rows, (5) the twelve r4 rows the round-9
#: verdict named, then the remaining r4 rows up to the 50 budget (rolled
#: names are recorded inline below so the r11 front writes itself).
DRIVER_PRIORITY: list[str] = [
    # --- round-10 front (driver verifies in order, budget 50/round) ---
    # NEW in round 10 — zero driver evidence yet
    "stream_popularity_store",
    "tuning_end_to_end",
    "stream_enriched_counts",
    "lone_returner_suppliers",
    "part_supplier_counts",
    "disjunctive_brand_revenue",
    "part_adamic_adar",
    "order_association_rules",
    "purchase_state_pit_join",
    "user_journey_patterns",
    "part_label_propagation",
    "mmr_diversified_topk",
    "part_name_linkage",
    "multi_touch_attribution",
    "event_cube_stats",
    "stream_user_profiles",
    "hll_register_rollup",
    "snapshot_diff_parts",
    "user_retention_cohorts",
    "user_rfm_segments",
    "event_transition_matrix",
    # (doc_top_terms / audio_frame_energy / token_top_docs /
    # stream_hopping_counts / user_survival_curve / data_quality_checks /
    # nation_trade_volume / promo_revenue_share, also new in r10, wait
    # for the r11 front: the 50 budget is full and the verdict-named r4
    # rows below must stay in)
    # kernels changed in round 10 (BFS edge build + size-gated broadcast
    # traversal; excess-stock / triangle persists routed through the
    # session payload registry) -> must re-enter the gate
    "part_bfs_hops",
    "excess_stock_suppliers",
    "item_triangle_stats",
    # the ONLY oracled query with zero driver evidence in rounds 1-9
    "stream_tumbling_counts",
    # r3-vintage evidence (6 rounds stale) -- all thirteen
    "click_attribution",
    "click_position_heatmap",
    "cold_entities",
    "corpus_cleaning_funnel",
    "decayed_toppop",
    "doc_fingerprints",
    "doc_repetition_stats",
    "eval_contamination",
    "feature_pruning",
    "impression_list_invariants",
    "impression_urm",
    "simhash_neardup_pairs",
    "view_to_click_conversions",
    # r4-vintage -- the twelve rows the round-9 verdict called out by name
    # (rolled from the r8/r9 fronts), then the rest up to the 50 budget
    "doc_bpe_token_stats",
    "doc_packing_stats",
    "global_effects_item_bias",
    "global_effects_user_bias",
    "hash_split_sizes",
    "hopping_window_counts",
    "itemknn_recommendations",
    "minhash_dedup_clusters",
    "minhash_lsh_candidates",
    "minhash_signatures",
    "item_pagerank",
    "ngram_jaccard_topn",
    # (bm25_weighted_itemknn / bpr_triplets_inside /
    # centered_similarities / confidence_matrix / corpus_bigrams / diversity_similarity / p3alpha_topk / pii_scrub_stats / props_json_stats /
    # remove_top_popular / rmse_global_effects / rp3beta_topk /
    # simhash_fingerprints /
    # stratified_sample_sizes / tfidf_weights / toppop_beyond_accuracy /
    # toppop_eval_metrics / toppop_eval_multi_cutoff /
    # toppop_recommendations / tumbling_window_counts /
    # user_holdout_sizes / user_sessions / weighted_ndcg /
    # zorder_layout_stats -- the youngest remaining r4 rows -- roll to
    # the r11 front together with the forty r5-vintage rows; ledger
    # derived
    # from the CORRECTNESS_r0{1..9}.json key sets: after this round every
    # query's driver evidence is r7+ except those, and new r10 specs are
    # prepended above as they land)
]


def _ordered() -> dict[str, QuerySpec]:
    front = [n for n in DRIVER_PRIORITY if n in _REGISTRY]
    rest = [n for n in _REGISTRY if n not in set(front)]
    return {n: _REGISTRY[n] for n in [*front, *rest]}


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all_modules()
    return {name: spec.fn for name, spec in _ordered().items()}


def all_oracle_sql() -> dict[str, str]:
    _load_all_modules()
    return {
        name: spec.oracle for name, spec in _ordered().items() if spec.oracle
    }


def bench_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all_modules()
    return {n: s.fn for n, s in _ordered().items() if s.bench}


def bench_query_families() -> dict[str, str]:
    """Query name → payload-sharing family (the registering plan module).

    bench.py runs queries grouped by family and releases the session
    payload caches between families: queries inside one module share
    materialized payloads (the ANN embedding payload across ann_*, the ICM
    payload across itemcbf/cfcbf, the URM across mlops), while blocks
    cached for a FINISHED family only crowd executor memory and inflate
    later, unrelated queries (round-4 verdict measured up to 6x)."""
    _load_all_modules()
    return {
        n: s.fn.__module__.rsplit(".", 1)[-1]
        for n, s in _ordered().items()
        if s.bench
    }


def bench_warmups() -> dict[str, Callable[[SparkSession, str], None]]:
    """Family → warmup callable that materializes the family's shared
    payloads.  bench.py times each as its own ``family_warmup`` line so
    per-query numbers reflect plan cost, not first-touch build attribution
    (round-5 verdict: cfcbf_hybrid_topk carried a 15 s ICM/CF build)."""
    import importlib

    _load_all_modules()
    out: dict[str, Callable[[SparkSession, str], None]] = {}
    for modname in (
        "relational",
        "recsys",
        "textops",
        "mlops",
        "dedupops",
        "modelops",
        "impressionops",
        "cbfops",
        "pipelineops",
        "selectionops",
    ):
        mod = importlib.import_module(f".{modname}", __package__)
        # a module exposes either one `bench_warmup` callable or a
        # `BENCH_WARMUPS` dict of labeled parts (keyed "<family>/<label>"
        # here) so big build blocks get their own timing line and a
        # regression localizes to the part that moved (round-9 verdict:
        # the single 13.6 s dedupops line hid which payload grew)
        parts = getattr(mod, "BENCH_WARMUPS", None)
        if parts:
            for label, fn in parts.items():
                out[f"{modname}/{label}"] = fn
            continue
        fn = getattr(mod, "bench_warmup", None)
        if fn is not None:
            out[modname] = fn
    return out


def utc(spark: SparkSession) -> SparkSession:
    """Pin the session timezone so calendar functions (hour/day/...) agree
    with the oracle, which always interprets naive parquet timestamps as-is."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
