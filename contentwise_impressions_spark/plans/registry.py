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
    # --- round-16 front (driver verifies in order, budget 50/round) ---
    # Ledger entering round 16 (from the CORRECTNESS_r* key sets): r15
    # evidence for 50 queries, r14/r13 for 50 each, r12 for 50, r11 for
    # 43, and THREE round-15-late specs with none.  Front order: (1) the
    # three zero-evidence round-15-late specs (the oracled deterministic
    # model stages ials_normal_eq / pure_svd_range_finder / nmf_mu_step),
    # (2) ALL forty-three remaining r11-vintage rows (4 rounds stale;
    # NOTE the r15 ledger comment listed 42 of them -- it missed
    # blocklist_filter_stats, the artifacts are authoritative), (3) the
    # alphabetically-first four r12-vintage rows, filling the 50 budget.
    # round-15-late specs with ZERO driver evidence
    "ials_normal_eq",
    "pure_svd_range_finder",
    "nmf_mu_step",
    # r11-vintage evidence (4 rounds stale) -- all remaining forty-three
    "blocklist_filter_stats",
    "bm25_search_topk",
    "bm25_weighted_itemknn",
    "bpe_compression_stats",
    "bpe_learned_merges",
    "bpr_triplets_inside",
    "centered_similarities",
    "confidence_matrix",
    "conversion_funnel",
    "corpus_bigrams",
    "custom_w_recommendations",
    "data_quality_checks",
    "diversity_similarity",
    "doc_novelty_stats",
    "doc_top_terms",
    "dsir_importance_weights",
    "duplicated_span_stats",
    "ease_r_blocked_weights",
    "embedding_neardup_pairs",
    "nation_trade_volume",
    "p3alpha_topk",
    "pii_scrub_stats",
    "promo_revenue_share",
    "props_json_stats",
    "remove_top_popular",
    "rmse_global_effects",
    "rp3beta_topk",
    "simhash_fingerprints",
    "stratified_sample_sizes",
    "stream_hopping_counts",
    "tfidf_weights",
    "token_top_docs",
    "toppop_beyond_accuracy",
    "toppop_eval_metrics",
    "toppop_eval_multi_cutoff",
    "toppop_recommendations",
    "tumbling_window_counts",
    "tuning_refit_metrics",
    "user_holdout_sizes",
    "user_sessions",
    "user_survival_curve",
    "weighted_ndcg",
    "zorder_layout_stats",
    # r12-vintage (4 rounds stale) -- alphabetically-first four
    "active_users",
    "ann_ivf_sampled_topk",
    "ann_ivfpq_topk",
    "ann_pq_adc_topk",
    # (the remaining forty-six r12-vintage rows roll to the r17 front:
    # ann_pq_codes / bpr_triplets_outside / cfcbf_hybrid_topk /
    # clickers_never_purchased / cold_start_split_sizes /
    # corpus_cardinalities / custom_w_serving_topk / embedding_outlier_flags /
    # event_type_entropy / event_type_herfindahl / events_of_known_customers /
    # fd_violations / filter_project / hard_negative_pairs /
    # hourly_event_type_pivot / incremental_dedup_flags / item_pmi_topk /
    # item_similarity_family / itemcbf_cosine_topk / january_traffic /
    # jpeg_decode_stats / kcore_filter / lang_temperature_sampling /
    # lsh_recall_stats / minhash_jaccard_estimates / multimodal_decode_stats /
    # multires_event_rollup / nation_market_share / passage_chunks /
    # png_decode_stats / priority_late_orders / quality_classifier_scores /
    # random_recommendations / semantic_dedup_flags / sketch_summary /
    # slim_bpr_weights / source_quality_rollup / span_scrubbed_docs /
    # stream_view_click_outer / tag_tokens_porter / token_budget_mixture /
    # top_revenue_suppliers / training_shard_manifest / unigram_ppl_buckets /
    # user_cosine_topk / userknn_recommendations --
    # then the remaining r12 rows + r13 block rotate.  Any spec
    # registered during round 16 AFTER this front filled lands at
    # position 51+ and MUST open the r17 front; record each here as it
    # registers.
    # Round-16 late specs so far:
    # ease_r_cg_matvec (the EASE-R conjugate-gradient iteration's
    # matvec oracled — q = (XᵀX + λI)p factored as Xᵀ(Xp) + λp over a
    # pinned integer-grid direction, two linear-in-nnz passes, Gram
    # never materialized; only the CG scalar chain stays rows-only —
    # r15 verdict task 4) /
    # funk_svd_grad_step (the per-sample FunkSVD SGD gradient at pinned
    # epoch-0 integer-grid factors oracled — e = n − W·H,
    # gW = e·H − reg·W, gH = e·W − reg·H, the exact local_gradient_*
    # lines of MatrixFactorization_Cython_Epoch.pyx:286-347; only the
    # order-dependent accumulation stays rows-only — r15 verdict
    # task 5) /
    # bpe_round0_pairs (BPE training's round-0 pair statistics oracled —
    # count-weighted adjacent-symbol counts over the word-frequency
    # table with the trainer's exact argmax order; rnk 1 IS
    # bpe_learned_merges' first merge, only the iterative
    # re-segmentation of rounds 1+ stays rows-only).
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
    """Query name → payload-sharing family (the registering plan module by
    default; a module may re-assign its queries to labeled sub-families
    via a ``BENCH_QUERY_FAMILIES`` dict when its payloads split into
    disjoint groups).

    bench.py runs queries grouped by family and releases the session
    payload caches between families: queries inside one family share
    materialized payloads (the ANN embedding payload across ann_*, the ICM
    payload across itemcbf/cfcbf, the URM across mlops), while blocks
    cached for a FINISHED family only crowd executor memory and inflate
    later, unrelated queries (round-4 verdict measured up to 6x; the
    round-13 verdict measured 2-4x on five LSH queries crowded by the
    session-cached residual-PQ artifacts — the dedupops sub-family split
    releases the ANN index payloads before the text-dedup queries run)."""
    import importlib

    _load_all_modules()
    out: dict[str, str] = {}
    overrides: dict[str, dict[str, str]] = {}
    for n, s in _ordered().items():
        if not s.bench:
            continue
        modname = s.fn.__module__.rsplit(".", 1)[-1]
        if modname not in overrides:
            mod = importlib.import_module(s.fn.__module__)
            overrides[modname] = getattr(mod, "BENCH_QUERY_FAMILIES", {})
        out[n] = overrides[modname].get(n, modname)
    return out


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
