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
#: registration order up to a fixed budget (50 per round).  Cumulative
#: status after round 5: every registered query has at least one driver
#: row; the freshest evidence per query is r2 for 44 queries, r3 for 16,
#: r4 for 39, r5 for 50.  Round-6 rotation: (1) the three NEW round-6
#: specs (FunkSVD/AsySVD + the RMSE gate), (2) every query whose plan,
#: kernel, or oracle changed this round (bounded negative sampling, fused
#: split_invariants, the asymmetric-replication cosine kernel, the
#: distributed SLIM-EN fit feeding both its spec and model_quality_gates),
#: then (3) refresh of the OLDEST evidence (r2 vintage) up to the budget.
DRIVER_PRIORITY: list[str] = [
    # new in round 6 — zero driver evidence yet
    "funk_svd_recommendations",
    "asy_svd_recommendations",
    "rating_model_quality_gates",
    # plans/kernels/oracles changed in round 6
    "negative_samples",
    "negative_sample_eval",
    "bpr_triplets_outside",
    "split_invariants",
    "cfcbf_hybrid_topk",
    "itemcbf_cosine_topk",
    "slim_elasticnet_weights",
    "model_quality_gates",
    "nmf_user_factors",
    "pure_svd_factors",
    # oldest driver evidence (r2 vintage) — refresh
    "pricing_summary",
    "filter_project",
    "region_customer_rollup",
    "top_orders_by_revenue",
    "active_users",
    "corpus_cardinalities",
    "latest_event_per_user",
    "user_activity_gini",
    "event_type_entropy",
    "event_type_herfindahl",
    "value_histogram",
    "users_covering_traffic",
    "hourly_event_type_pivot",
    "clickers_never_purchased",
    "events_of_known_customers",
    "part_name_tokens",
    "token_position",
    "weekday_hour_traffic",
    "january_traffic",
    "top_events_per_type",
    "fd_violations",
    "salted_user_nation_counts",
    "sql_shipping_priority",
    "revenue_rollup",
    "value_quantiles",
    "user_activity_deciles",
    "toppop",
    "split_sizes",
    "leave_last_out_sizes",
    "kcore_filter",
    "urm_density",
    "cold_start_split_sizes",
    "popularity_bias_stats",
    "weekly_cohort_retention",
    "item_pmi_topk",
    "value_outliers",
    "item_similarity_family",
    "item_cosine_topk",
    "exact_dedup_docs",
    "doc_token_stats",
    # budget line (~50) — r2 stragglers below roll into the round-7 front
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
