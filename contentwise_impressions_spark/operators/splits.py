"""Train/validation/test split operators.

Reference analogs (SURVEY.md §2.8):
- random 70/10/20 after dedup — Utils/dataset.py:322-325
- leave-latest-out timestamp split — Data_manager/split_functions/
  split_data_on_timestamp.py:16-92
- min-activity (k-core-ish) filter — Data_manager/Utility.py:11-22
- per-user percentage holdout — split_functions/split_train_validation.py:17-78

Seeded NumPy randomness does not transport across engines, so the
checkable splits here use :mod:`..functions.hashing` (deterministic
multiplicative hash of the keys).  ``randomSplit``-based variants are also
provided for API parity; they are validated by proportions/disjointness,
not row membership (SURVEY.md §4 'Seeded reproducibility').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import deterministic_bucket


def deterministic_split(
    df: DataFrame,
    key1: str,
    key2: str | None,
    fractions: list[float] = (0.7, 0.1, 0.2),
    split_col: str = "split",
) -> DataFrame:
    """Tag each row with a split id 0..len(fractions)-1, hash-deterministic.

    Scale note: purely row-local (no shuffle, no state) — every executor
    assigns its own rows, unlike sort-based sampling.
    """
    k2 = F.col(key2) if key2 is not None else None
    return df.withColumn(
        split_col, deterministic_bucket(F.col(key1), k2, list(fractions))
    )


def random_split(
    df: DataFrame, fractions: list[float] = (0.7, 0.1, 0.2), seed: int = 42
) -> list[DataFrame]:
    """Seeded randomSplit — API parity with dask random_split (dataset.py:325)."""
    return df.randomSplit(list(fractions), seed=seed)


def leave_last_out(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    min_interactions: int = 3,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Leave-latest-out: newest row per user → test (split=2), second newest
    → validation (split=1), rest → train (split=0); users with fewer than
    `min_interactions` rows are all-train.

    Reference: split_data_on_timestamp.py:16-92.  One shuffle on user_id;
    the per-user sort is bounded by profile length.
    """
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in (tiebreak or [])]
    w = Window.partitionBy(user_col).orderBy(*order)
    wc = Window.partitionBy(user_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_cnt", F.count("*").over(wc))
        .withColumn(
            "split",
            F.when(F.col("_cnt") < min_interactions, F.lit(0))
            .when(F.col("_rn") == 1, F.lit(2))
            .when(F.col("_rn") == 2, F.lit(1))
            .otherwise(F.lit(0)),
        )
        .drop("_rn", "_cnt")
    )


def min_activity_filter(
    df: DataFrame, key_col: str, min_count: int
) -> DataFrame:
    """Keep rows whose `key_col` group has >= min_count rows.

    Reference: Data_manager/Utility.py:11-22 (and the threshold filter at
    Utils/dataset.py:1593-1603).  Window-count + filter: one shuffle on the
    key, no second scan, no driver collect.
    """
    w = Window.partitionBy(key_col)
    return (
        df.withColumn("_cnt", F.count("*").over(w))
        .filter(F.col("_cnt") >= min_count)
        .drop("_cnt")
    )


def per_user_holdout(
    df: DataFrame,
    user_col: str = "user_id",
    item_col: str = "item_id",
    train_fraction: float = 0.8,
) -> DataFrame:
    """Per-user percentage holdout, hash-ordered for determinism.

    Reference: split_train_validation.py:17-78 shuffles each user profile
    and keeps p% in train.  We order each profile by the portable item-hash
    (a deterministic 'shuffle') and tag the first ceil(p*n) rows train(0),
    rest test(1).
    """
    from ..functions.hashing import bucket_hash

    w = Window.partitionBy(user_col).orderBy(
        bucket_hash(F.col(item_col), F.col(user_col)), F.col(item_col)
    )
    wc = Window.partitionBy(user_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_cnt", F.count("*").over(wc))
        .withColumn(
            "split",
            F.when(
                F.col("_rn") <= F.ceil(F.lit(train_fraction) * F.col("_cnt")),
                F.lit(0),
            ).otherwise(F.lit(1)),
        )
        .drop("_rn", "_cnt")
    )


def bounded_item_proposals(
    users: DataFrame,
    items: DataFrame,
    n_props: int = 64,
    epoch: int = 0,
) -> DataFrame:
    """(user_id, item_id, seq): ``n_props`` deterministic pseudo-random
    item proposals per user — the shared negative-sampling proposal
    stream.

    Single source of truth for the Lehmer/MINSTD mix (constants 1000003 /
    1000003619 / 48271 / 16807 over portable int64 arithmetic, exactly
    reproducible in ANSI SQL) consumed by
    ``plans/mlops._bounded_negatives`` + its SQL twins and
    ``recommenders.bpr.bpr_triplets(mode='outside')`` — one site to keep
    the Spark samplers and the DuckDB oracles in lock-step.  ``epoch``
    salts the stream so fits can redraw per epoch; epoch=0 is the
    SQL-twin arithmetic.  O(U·n_props) rows end to end; the item-index
    join is a broadcast equi-join against the two-phase distributed rank
    (no single-task sort at catalog scale, never a user×item complement).
    """
    from .neardup import distributed_ordered_ids

    n_items = items.count()  # dimension-scale action: the item vocabulary
    idx = distributed_ordered_ids(
        items.select("item_id"), "item_id", out_col="_sid"
    ).select("item_id", (F.col("_sid") - 1).alias("idx"))
    props = users.select("user_id").withColumn(
        "seq", F.explode(F.sequence(F.lit(0), F.lit(n_props - 1)))
    )
    m1 = F.pmod(
        F.col("user_id") * F.lit(1000003)
        + F.col("seq")
        + F.lit(int(epoch) * 7919),
        F.lit(1000003619),
    )
    m2 = F.pmod(m1 * F.lit(48271), F.lit(2147483647))
    m3 = F.pmod(m2 * F.lit(16807), F.lit(2147483647))
    return (
        props.withColumn("idx", F.pmod(m3, F.lit(n_items)))
        .join(F.broadcast(idx), "idx")
        .select("user_id", "item_id", "seq")
    )
