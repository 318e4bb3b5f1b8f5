"""Edge cases for the contrastive hard-pair miner and shard hashing that
the oracle-parity sweep can't isolate (degenerate inputs, id structure)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from contentwise_impressions_spark.operators.ann import hard_pairs_cross


@pytest.fixture()
def labeled_vecs(spark):
    # labels: 0 for ids < 3, 1 for the rest; vec 99 is a ZERO vector
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.9, 0.1], 0),
        (2, [0.0, 1.0], 0),
        (10, [1.0, 0.05], 1),
        (11, [0.1, 1.0], 1),
        (99, [0.0, 0.0], 1),  # degenerate: no direction
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    )


def test_hard_pairs_basic_and_zero_norm_guard(labeled_vecs):
    queries = labeled_vecs.filter(F.col("vec_id") == 0)
    corpus = labeled_vecs.filter(F.col("vec_id") != 0)
    out = {r["vec_id"]: r for r in hard_pairs_cross(queries, corpus).collect()}
    r = out[0]
    # positive: nearest same-label (1, cosine ~0.994); negative: nearest
    # different-label (10, cosine ~0.999)
    assert r["pos_id"] == 1 and r["neg_id"] == 10
    assert r["neg_cosine"] > r["pos_cosine"] > 0.9
    # the zero vector must never be mined — even though it shares the
    # query's candidate block — and must not poison the block via NaN
    assert r["neg_id"] != 99


def test_hard_pairs_zero_norm_query_emits_nothing(labeled_vecs):
    queries = labeled_vecs.filter(F.col("vec_id") == 99)
    corpus = labeled_vecs.filter(F.col("vec_id") != 99)
    assert hard_pairs_cross(queries, corpus).count() == 0


def test_hard_pairs_missing_category_is_null(spark):
    vecs = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (10, [0.9, 0.1], 1)],
        "vec_id long, embedding array<double>, label long",
    )
    out = hard_pairs_cross(
        vecs.filter(F.col("vec_id") == 0), vecs.filter(F.col("vec_id") != 0)
    ).collect()
    assert len(out) == 1
    r = out[0]
    # no same-label corpus vector exists → pos side NULL, neg side found
    assert r["pos_id"] is None and r["pos_cosine"] is None
    assert r["neg_id"] == 10


def test_shard_hash_mixes_structured_ids(spark):
    """The shard bucket must come from the SCRAMBLED key: doc_id % 16 of
    all-even ids would leave half the shards empty."""
    from contentwise_impressions_spark.plans.pipelineops import (
        _N_SHARDS,
        q_training_shard_manifest,
    )
    from contentwise_impressions_spark.sources.tables import load_table

    # direct check on the registered query's assignment arithmetic with
    # an adversarial id set: only even ids
    docs = spark.createDataFrame(
        [(2 * i, "a b c") for i in range(400)], "doc_id long, text string"
    )
    from contentwise_impressions_spark.plans.pipelineops import (
        _HASH_MOD_BIG,
        _ORDER_A,
    )

    from contentwise_impressions_spark.plans.pipelineops import _ORDER_A2

    shards = (
        docs.select(
            F.pmod(
                ((F.col("doc_id") * _ORDER_A) % _HASH_MOD_BIG * _ORDER_A2)
                % _HASH_MOD_BIG,
                F.lit(_N_SHARDS),
            ).alias("shard")
        )
        .groupBy("shard")
        .count()
        .collect()
    )
    counts = {r["shard"]: r["count"] for r in shards}
    assert len(counts) == _N_SHARDS  # every shard non-empty
    assert max(counts.values()) <= 3 * min(counts.values())


def test_persist_ivf_index_roundtrip(spark, sf_dir, tmp_path):
    """Index lifecycle: build-to-parquet, reload, serve — the loaded
    assignments must be bit-identical to a fresh build and feed
    semantic_dedup to the same flags."""
    from contentwise_impressions_spark.operators.ann import (
        ivf_assignments,
        persist_ivf_index,
        semantic_dedup,
    )
    from contentwise_impressions_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf_index")
    built = persist_ivf_index(spark, path, emb, n_list=4, n_iters=2)
    # second call must LOAD (marker present), not rebuild
    loaded = persist_ivf_index(spark, path, emb, n_list=4, n_iters=2)
    fresh = ivf_assignments(emb, n_list=4, n_iters=2)
    as_set = lambda df: {(r["vec_id"], r["list_id"]) for r in df.collect()}
    assert as_set(loaded) == as_set(fresh) == as_set(built)
    # serving from the loaded index reproduces the fresh-build flags
    a = {
        (r["vec_id"], r["pruned"])
        for r in semantic_dedup(emb, n_list=4, assignments=loaded).collect()
    }
    b = {
        (r["vec_id"], r["pruned"])
        for r in semantic_dedup(emb, n_list=4, assignments=fresh).collect()
    }
    assert a == b
