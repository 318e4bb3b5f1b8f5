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
#: entering round 11 (computed from the CORRECTNESS_r0{1..10}.json key sets —
#: the authoritative source): r10 evidence for 50 queries, r9 for 47, r7 for
#: 46, r5 for 40, r4 for 24, and 8 round-10-late specs with no evidence at
#: all.  Round-11 rotation: (1) the spec NEW this round
#: (tuning_refit_metrics, the oracled refit stage of the tuning composite),
#: (2) the 8 zero-evidence round-10 specs (user_survival_curve's oracle also
#: changed this round — lint-ratchet casts), (3) ALL twenty-four r4-vintage
#: rows (7 rounds stale), (4) the alphabetically-first seventeen r5-vintage
#: rows, filling the 50 budget.
DRIVER_PRIORITY: list[str] = [
    # --- round-13 front (driver verifies in order, budget 50/round) ---
    # Ledger entering round 13 (from the CORRECTNESS_r* key sets): r12
    # evidence for 50 queries, r11 for 50, r10 for 50, r9 for 44, r7 for
    # 29, and 7 round-12-late specs with none.  Front order: (1) the
    # seven zero-evidence round-12-late specs (TPC-H Q2/Q9/Q10 shapes,
    # the chained stream rollup, the stream-join->agg conversions, the
    # ANN exact-refine stage, and the first custom-Python-DataSource
    # streaming query ever driver-gated), (2) ALL twenty-nine r7-vintage
    # rows (6 rounds stale), (3) the alphabetically-first fourteen
    # r9-vintage rows, filling the 50 budget.
    # round-12-late specs with ZERO driver evidence
    "stream_chained_rollup",
    "min_cost_part_supplier",
    "ann_refined_topk",
    "nation_profit_rollup",
    "stream_join_hourly_conversions",
    "stream_synthetic_counts",
    "top_returning_customers",
    # r7-vintage evidence (6 rounds stale) -- all remaining twenty-nine
    "latest_event_per_user",
    "leave_last_out_sizes",
    "negative_sample_eval",
    "negative_samples",
    "nmf_user_factors",
    "part_name_tokens",
    "popularity_bias_stats",
    "pricing_summary",
    "pure_svd_factors",
    "region_customer_rollup",
    "revenue_rollup",
    "salted_user_nation_counts",
    "slim_elasticnet_weights",
    "split_invariants",
    "split_sizes",
    "sql_shipping_priority",
    "token_position",
    "top_events_per_type",
    "top_orders_by_revenue",
    "toppop",
    "urm_density",
    "user_activity_deciles",
    "user_activity_gini",
    "users_covering_traffic",
    "value_histogram",
    "value_outliers",
    "value_quantiles",
    "weekday_hour_traffic",
    "weekly_cohort_retention",
    # r9-vintage (4 rounds stale) -- alphabetically-first fourteen
    "ann_ivf_assignments",
    "ann_lsh_buckets",
    "asy_svd_recommendations",
    "bloom_prejoin_stats",
    "bm25_weights",
    "bpr_mf_recommendations",
    "cdc_final_state",
    "cluster_prototype_sample",
    "countmin_heavy_hitters",
    "customer_order_distribution",
    "daily_value_gapfill",
    "dedup_survivors",
    "doc_quality",
    "doc_token_stats",
    # (the remaining thirty r9-vintage rows roll to the r14 front:
    # dormant_rich_customers / ease_r_cg_weights / ease_r_weights /
    # exact_dedup_docs / funk_svd_epoch0_stream / funk_svd_recommendations /
    # hll_distinct_sketch / ials_recommendations / image_ahash_dedup /
    # item_cosine_topk / langid / large_volume_orders /
    # local_supplier_volume / media_embedding_histogram / mf_serving_topk /
    # mf_serving_topk_blocked / model_quality_gates /
    # nation_weighted_median_price / order_priority_rollup /
    # rating_model_quality_gates / rolling_7d_revenue /
    # small_quantity_revenue / stream_dedup_events /
    # stream_sessionization_counts / stream_view_click_pairs / tag_tokens /
    # token_chi2_topk / user_state_history / video_frame_stats /
    # weighted_sample_topk — after those the r10 block (50 rows) rotates.
    # Any spec registered during round 13 AFTER this front filled lands
    # at position 51+ and MUST open the r14 front.  Round-13 registered
    # NINE such specs, all with DuckDB twins and zero driver evidence
    # yet — they MUST open the r14 front, then the thirty rolled
    # r9-vintage rows above:
    # ratings_source_scan (pushFilters through the Python DataSource) /
    # logbin_value_quantiles (portable quantile sketch) /
    # slim_en_support (SLIM-EN deterministic stages) /
    # forecast_revenue_change (Q6) / important_part_stock (Q11) /
    # late_shipment_priorities (Q12) / ann_sq8_topk (SQ8 codec) /
    # ann_ivfpq_residual_topk (FAISS IVFADC residual encoding) /
    # ann_ivfpq_multiprobe_topk (the n_probe=2 recall knob).)
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
