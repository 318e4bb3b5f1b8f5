"""Production MinHash signature-quality gates (SURVEY §2 dedup family).

Round-5 verdict: the 8-component signature's 1/8 Jaccard resolution was
the one undersized knob in the dedup stack.  The signature is now
MINHASH_COMPONENTS=64 with 16×4 banding (threshold ≈ 0.5); these gates
pin the accuracy claims with the repo's own instruments so a future
width/banding change that degrades the sketch fails loudly.

Observed at sf0.01 with 64 components: mean |est − exact| ≈ 0.097
(theory: ≤ 1/√64 ≈ 0.06 for mid-range Jaccard, worse near the banding
threshold), banding recall at τ=0.35 = 1.0 with 102 candidates.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from contentwise_impressions_spark.operators.neardup import (
    DEFAULT_ROWS_PER_BAND,
    MINHASH_A,
    MINHASH_B,
    MINHASH_COMPONENTS,
)
from contentwise_impressions_spark.plans import all_queries

SF = "/root/testdata/sf0.01"


def test_signature_width_is_production_scale():
    assert MINHASH_COMPONENTS >= 64
    assert len(MINHASH_A) == len(MINHASH_B) == MINHASH_COMPONENTS
    assert len(set(MINHASH_A)) == MINHASH_COMPONENTS  # distinct hash fns
    assert MINHASH_COMPONENTS % DEFAULT_ROWS_PER_BAND == 0


def test_jaccard_estimate_error_within_tenth(spark):
    est = all_queries()["minhash_jaccard_estimates"](spark, SF)
    row = est.agg(
        F.count("*").alias("n"), F.avg("abs_err").alias("avg_err")
    ).collect()[0]
    assert row["n"] > 0
    assert row["avg_err"] <= 0.1


def test_banding_recall_at_threshold(spark):
    row = all_queries()["lsh_recall_stats"](spark, SF).collect()[0]
    assert row["n_true_pairs"] > 0
    # 16×4 banding: P(candidate | j=0.35) per band = 0.35^4, over 16 bands
    # ≈ 0.21 at the very edge — but true pairs at τ are concentrated well
    # above it on this corpus; the gate pins the observed end-to-end 1.0
    # with slack for corpus drift
    assert row["recall"] >= 0.9
