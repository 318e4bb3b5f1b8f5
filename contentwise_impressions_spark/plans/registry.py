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


#: Names surfaced FIRST to the correctness driver, which verifies queries in
#: registration order up to a fixed budget (50 per round).  Cumulative status
#: after round 3: every oracled query EXCEPT the 13 listed first below has a
#: green driver row (r1: relational/recsys/textops core; r2: temporal joins;
#: r3: eval/KNN/graph/dedup/ANN/LLM-pipeline).  This round's rotation fronts
#: the final 12 never-checked oracled queries plus ``doc_packing_stats``
#: (r3 red was an oracle HUGEINT cast, fixed; engine output verified exact),
#: then new quality-gate queries, then re-verification of the r3 greens.
DRIVER_PRIORITY: list[str] = [
    # oracle cast fixed this round — needs a fresh green row
    "doc_packing_stats",
    # the last 12 oracled queries with no driver verdict in any round
    "user_holdout_sizes",
    "props_json_stats",
    "hash_split_sizes",
    "corpus_bigrams",
    "doc_bpe_token_stats",
    "stratified_sample_sizes",
    "tumbling_window_counts",
    "hopping_window_counts",
    "bpr_triplets_inside",
    "bpr_triplets_outside",
    "user_sessions",
    "zorder_layout_stats",
    # NEW this round — real-decode multimodal stats, zero driver evidence
    "multimodal_decode_stats",
    "audio_decode_stats",
    "pii_scrub_stats",
    "semantic_dedup_flags",
    # re-verify the heavy r3 greens (kernel/payload changes this round)
    "cfcbf_hybrid_topk",
    "itemcbf_cosine_topk",
    "user_cosine_topk",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "ann_ivf_topk_nprobe2",
    "embedding_neardup_pairs",
    # r3 greens, most-load-bearing first (fills the remaining budget)
    "toppop_eval_metrics",
    "toppop_eval_multi_cutoff",
    "toppop_beyond_accuracy",
    "weighted_ndcg",
    "rmse_global_effects",
    "diversity_similarity",
    "negative_sample_eval",
    "p3alpha_topk",
    "rp3beta_topk",
    "minhash_lsh_candidates",
    "minhash_dedup_clusters",
    "itemknn_recommendations",
    "userknn_recommendations",
    "centered_similarities",
    "bm25_weighted_itemknn",
    "global_effects_item_bias",
    "global_effects_user_bias",
    "toppop_recommendations",
    "confidence_matrix",
    "remove_top_popular",
    "negative_samples",
    "item_pagerank",
    "minhash_signatures",
    "simhash_fingerprints",
    "ngram_jaccard_topn",
    "tfidf_weights",
    "bm25_weights",
    "ann_lsh_buckets",
    "ann_ivf_assignments",
    "impression_urm",
    "click_position_heatmap",
    "impression_list_invariants",
    "cold_entities",
    "feature_pruning",
    "click_attribution",
    "view_to_click_conversions",
    "decayed_toppop",
    "doc_fingerprints",
    "doc_repetition_stats",
    "corpus_cleaning_funnel",
    "simhash_neardup_pairs",
    "eval_contamination",
    # rows-only specs (weaker check — after every oracled one); the
    # quality-gate row first: it certifies all five fits in one signal
    "model_quality_gates",
    "sketch_summary",
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


def utc(spark: SparkSession) -> SparkSession:
    """Pin the session timezone so calendar functions (hour/day/...) agree
    with the oracle, which always interprets naive parquet timestamps as-is."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
