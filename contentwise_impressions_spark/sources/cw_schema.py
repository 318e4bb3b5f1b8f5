"""Canonical ContentWise table schemas + a deterministic impressions builder.

Schemas mirror /root/reference/Utils/dataset.py:91-147 exactly (types from
the docstrings; sentinels are VALUES, never NULL — FIXTURES.md).  The
harness testdata has no CW-shaped tables, so `impressions_from_events`
derives an impressions-direct-link analog from the events log with pure
set-aggregation arithmetic — deterministically reproducible by the DuckDB
oracle (sorted collect_set ≡ list(DISTINCT … ORDER BY …)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    ByteType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

#: Utils/dataset.py:91-122
INTERACTIONS_SCHEMA = StructType(
    [
        StructField("utc_ts_milliseconds", LongType(), False),
        StructField("user_id", IntegerType(), False),
        StructField("item_id", IntegerType(), False),
        StructField("item_type", ByteType(), False),  # 0..3
        StructField("series_id", IntegerType(), False),
        StructField("episode_number", IntegerType(), False),
        StructField("series_length", IntegerType(), False),
        StructField("recommendation_id", IntegerType(), False),  # -1 sentinel
        StructField("interaction_type", ByteType(), False),  # 0..3
        StructField("explicit_rating", FloatType(), False),  # -1.0 sentinel
        StructField("vision_factor", FloatType(), False),  # -1.0 sentinel
    ]
)

#: Utils/dataset.py:124-134
IMPRESSIONS_DIRECT_LINK_SCHEMA = StructType(
    [
        StructField("recommendation_id", IntegerType(), False),
        StructField("row_position", IntegerType(), False),
        StructField("recommendation_list_length", IntegerType(), False),
        StructField("recommended_series_list", ArrayType(IntegerType(), False), False),
    ]
)

#: Utils/dataset.py:136-147
IMPRESSIONS_NON_DIRECT_LINK_SCHEMA = StructType(
    [
        StructField("user_id", IntegerType(), False),
        StructField("row_position", IntegerType(), False),
        StructField("recommendation_list_length", IntegerType(), False),
        StructField("recommended_series_list", ArrayType(IntegerType(), False), False),
    ]
)


def impressions_from_events(interactions: DataFrame) -> DataFrame:
    """Derive an impressions-direct-link analog from the interaction log.

    One 'recommendation' per (user, day): the sorted set of items the user
    touched that day plays recommended_series_list; rec_id = user·1000+day;
    row_position = day mod 5.  All derivations are integer/set arithmetic →
    exactly reproducible in any engine.
    """
    by_day = interactions.withColumn(
        "day", F.dayofmonth("ts").cast("int")
    )
    return by_day.groupBy("user_id", "day").agg(
        F.sort_array(F.collect_set("item_id")).alias("recommended_series_list")
    ).select(
        (F.col("user_id") * 1000 + F.col("day")).cast("bigint").alias(
            "recommendation_id"
        ),
        F.col("user_id"),
        (F.col("day") % 5).cast("int").alias("row_position"),
        F.size("recommended_series_list").cast("int").alias(
            "recommendation_list_length"
        ),
        "recommended_series_list",
    )
