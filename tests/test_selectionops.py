"""Unit tests for the data-selection family (plans/selectionops.py).

The sf0.001 oracle-parity sweep already certifies the VALUES of all three
queries; these tests prove the parts parity can't — that the quality
classifier actually LEARNS (the synthetic corpus's lang signal is weak by
construction, so learning is asserted on a separable fixture), and the
DSIR / blocklist invariants that hold for any input.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from contentwise_impressions_spark.plans.selectionops import (
    _BLOCKLIST,
    q_blocklist_filter_stats,
    q_dsir_importance_weights,
    quality_classifier_scores,
)


@pytest.fixture()
def separable(spark):
    """20 docs: positives draw from buckets {0,1}, negatives from {2,3} —
    linearly separable by construction."""
    feats_rows = []
    labels_rows = []
    for d in range(20):
        y = 1.0 if d < 10 else 0.0
        b0, b1 = (0, 1) if y else (2, 3)
        feats_rows += [
            (d, b0, 0.5),
            (d, b1, 0.5),
            (d, -1, 1.0),  # bias pseudo-bucket
        ]
        labels_rows.append((d, y))
    feats = spark.createDataFrame(
        feats_rows, "doc_id long, bucket long, x double"
    )
    labels = spark.createDataFrame(labels_rows, "doc_id long, y double")
    return feats, labels


def test_classifier_learns_separable(separable):
    feats, labels = separable
    out = quality_classifier_scores(feats, labels, n_iters=25, lr=8.0)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 20
    # perfect separation on a separable problem
    for d, r in rows.items():
        assert r["predicted"] == (r["label"] == 1)
    # trained log-loss beats the w=0 starting point (ln 2 per doc)
    ll = -sum(
        math.log(r["score"] if r["label"] else 1.0 - r["score"])
        for r in rows.values()
    ) / len(rows)
    assert ll < math.log(2.0) * 0.5


def test_classifier_zero_iters_is_coin_flip(separable):
    feats, labels = separable
    out = quality_classifier_scores(feats, labels, n_iters=0)
    assert all(abs(r["score"] - 0.5) < 1e-12 for r in out.collect())


def test_dsir_weights_sum_algebra(spark, sf_dir):
    # Σ_docs logw·? — invariant: every doc appears once, n_tokens > 0,
    # log_weight finite, and target_like == (log_weight > 0)
    out = q_dsir_importance_weights(spark, sf_dir).collect()
    assert len(out) == len({r["doc_id"] for r in out})
    for r in out:
        assert r["n_tokens"] > 0
        assert math.isfinite(r["log_weight"])
        assert r["target_like"] == (r["log_weight"] > 0.0)


def test_blocklist_counts_consistent(spark, sf_dir):
    from contentwise_impressions_spark.sources.tables import load_table

    out = {r["source"]: r for r in q_blocklist_filter_stats(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    assert sum(r["n_docs"] for r in out.values()) == n_docs
    # a doc counted as flagged must contribute ≥ 1 hit, and vice versa
    for r in out.values():
        assert (r["n_hits"] == 0) == (r["n_flagged"] == 0)
        assert r["n_hits"] >= r["n_flagged"]
    # cross-check one source against a direct token scan
    direct = (
        docs.select(
            "source",
            F.explode(
                F.filter(F.split("text", " "), lambda t: t != "")
            ).alias("tok"),
        )
        .filter(F.col("tok").isin(*_BLOCKLIST))
        .groupBy("source")
        .count()
        .collect()
    )
    for row in direct:
        assert out[row["source"]]["n_hits"] == row["count"]
