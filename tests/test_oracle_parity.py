"""Differential test: every registered query vs its DuckDB oracle at sf0.001."""

from __future__ import annotations

import pytest

from contentwise_impressions_spark.plans import all_oracle_sql, all_queries

from .diffcheck import assert_frames_match, duckdb_conn

QUERIES = all_queries()
ORACLES = all_oracle_sql()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, sf_dir, con):
    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    oracle_pdf = con.execute(ORACLES[name]).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)


def test_every_query_has_oracle_or_is_declared():
    # queries without oracles are allowed (weaker rows-only check) but must
    # be intentional; keep the list explicit here.
    # iterative/stochastic model fits: no SQL twin exists; the driver
    # records the weaker rows-only check for these (documented in modelops)
    allowed_no_oracle: set[str] = {
        # MAP@10-vs-TopPop gate over the stochastic fits below — quality
        # floors pinned in tests/test_models.py::test_model_quality_gates
        "model_quality_gates",
        "ials_recommendations",
        "pure_svd_factors",
        "slim_elasticnet_weights",
        "ease_r_weights",
        "nmf_user_factors",
        "bpr_mf_recommendations",
        # explicit-rating MF-SGD fits + their RMSE-vs-GlobalEffects gate —
        # floors pinned in tests/test_models.py::test_rating_model_rmse_gates
        "funk_svd_recommendations",
        "asy_svd_recommendations",
        "rating_model_quality_gates",
        "slim_bpr_weights",
        "custom_w_recommendations",
        # random_recommendations converted to hash-green in round 12
        # (portable Lehmer-mix draw + scores, full SQL twin)
        "ease_r_blocked_weights",
        "ease_r_cg_weights",
        # sketch estimates are implementation-defined (DuckDB's HLL/quantile
        # sketches differ); bounded vs exact in test_properties instead
        "sketch_summary",
        # Porter stemming is not SQL-expressible offline (DuckDB fts
        # extension needs network); golden-tested in test_porter instead
        "tag_tokens_porter",
        # BPE training is iterative re-segmentation under each round's
        # argmax — not SQL-expressible; reference-pinned in test_bpe
        "bpe_learned_merges",
        "bpe_compression_stats",
        # driver-orchestrated search loop (seeded sampler + per-case
        # distributed fit/evaluate) — gated in test_tuning instead
        "tuning_end_to_end",
    }
    missing = set(QUERIES) - set(ORACLES) - allowed_no_oracle
    assert not missing, f"queries missing oracle SQL: {sorted(missing)}"
