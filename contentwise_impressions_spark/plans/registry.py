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
#: registration order up to a fixed budget (50 per round).  Cumulative status
#: after round 4: EVERY oracled query has a green driver row (r1-r4); the
#: only specs with zero driver evidence are the rows-only ones (the r4
#: budget was spent on oracled queries).  This round's rotation therefore
#: fronts the 14 rows-only specs (``model_quality_gates`` first — one green
#: row certifies the IALS/BPR/SLIM-EN/EASE_R fits against TopPop at once,
#: and ``sketch_summary`` scalarized this round so the driver canonicalizer
#: can finally hash it), then every query whose plan/kernel changed this
#: round, then re-verification of the OLDEST greens (r1 vintage) to keep
#: the cumulative evidence fresh.
DRIVER_PRIORITY: list[str] = [
    # rows-only specs — the only registered queries with no driver row ever
    "model_quality_gates",
    "sketch_summary",
    "tag_tokens_porter",
    "random_recommendations",
    "ials_recommendations",
    "pure_svd_factors",
    "nmf_user_factors",
    "slim_elasticnet_weights",
    "ease_r_weights",
    "ease_r_blocked_weights",
    "ease_r_cg_weights",
    "slim_bpr_weights",
    "bpr_mf_recommendations",
    "custom_w_recommendations",
    # plans/kernels touched in round 5 — need fresh green rows
    "conversion_funnel",
    "semantic_dedup_flags",
    "cfcbf_hybrid_topk",
    "itemcbf_cosine_topk",
    "user_cosine_topk",
    "userknn_recommendations",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "ann_ivf_topk_nprobe2",
    "embedding_neardup_pairs",
    "multimodal_decode_stats",
    "audio_decode_stats",
    "jpeg_decode_stats",
    "duplicated_span_stats",
    "span_scrubbed_docs",
    "unigram_ppl_buckets",
    "ann_retrieval_topk",
    "token_budget_mixture",
    "source_quality_rollup",
    # new round-5 data-selection family
    "dsir_importance_weights",
    "quality_classifier_scores",
    "blocklist_filter_stats",
    "incremental_dedup_flags",
    "passage_chunks",
    "bm25_search_topk",
    "batch_drift_stats",
    "png_decode_stats",
    "bpe_learned_merges",
    "bpe_compression_stats",
    "training_shard_manifest",
    "lang_temperature_sampling",
    "embedding_outlier_flags",
    "hard_negative_pairs",
    "doc_novelty_stats",
    "lsh_recall_stats",
    "minhash_jaccard_estimates",
    # oldest greens (r1 vintage, never re-checked since) — refresh
    "pricing_summary",
    "filter_project",
    "january_traffic",
    "active_users",
    "latest_event_per_user",
    "events_of_known_customers",
    "top_orders_by_revenue",
    "region_customer_rollup",
    "revenue_rollup",
    "sql_shipping_priority",
    "hourly_event_type_pivot",
    "user_activity_gini",
    "user_activity_deciles",
    "users_covering_traffic",
    "value_histogram",
    "value_quantiles",
    "value_outliers",
    "event_type_entropy",
    "event_type_herfindahl",
    "fd_violations",
    "part_name_tokens",
    "token_position",
    "weekday_hour_traffic",
    "salted_user_nation_counts",
    "top_events_per_type",
    "clickers_never_purchased",
    "corpus_cardinalities",
    "split_sizes",
    "urm_density",
    "toppop",
    "kcore_filter",
    "split_invariants",
    "exact_dedup_docs",
    "doc_token_stats",
    "doc_quality",
    "langid",
    "tag_tokens",
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
        fn = getattr(mod, "bench_warmup", None)
        if fn is not None:
            out[modname] = fn
    return out


def utc(spark: SparkSession) -> SparkSession:
    """Pin the session timezone so calendar functions (hour/day/...) agree
    with the oracle, which always interprets naive parquet timestamps as-is."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
