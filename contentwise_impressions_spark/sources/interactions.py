"""events → interaction-log adapter.

The reference's central input is the `interactions` event log
(/root/reference/Utils/dataset.py:91-122).  The harness's `events` table is
the synthetic analog (FIXTURES.md §6): ``user_id`` maps directly and the
item id is carried in the ``props`` JSON payload as ``{"k": N}``.

We parse the item id with a regexp rather than a JSON path so the DuckDB
correctness oracle can express the identical computation
(``regexp_extract(props, '([0-9]+)', 1)`` is portable to both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: event types that count as an "interaction" (view/click/purchase ≅ the
#: reference's interaction_type enum 0..3, dataset.py:113-118).  `signup`
#: and `error` are impression-/noise-shaped and excluded from the URM.
INTERACTION_EVENT_TYPES = ("view", "click", "purchase")


def events_as_interactions(events: DataFrame) -> DataFrame:
    """Project the events stream into (ts, user_id, item_id, event_type, value).

    Reference analog: the `interactions` table schema, Utils/dataset.py:91-122.
    """
    return events.select(
        F.col("ts"),
        F.col("user_id").cast("bigint").alias("user_id"),
        F.regexp_extract(F.col("props"), r"([0-9]+)", 1)
        .cast("bigint")
        .alias("item_id"),
        F.col("event_type"),
        F.col("value"),
    )


def implicit_urm(events: DataFrame) -> DataFrame:
    """Implicit user–rating matrix in long format: (user_id, item_id, value=1).

    The relational encoding of the reference's scipy CSR URM
    (Utils/dataset.py:327-359): distinct interacted (user, item) pairs with
    an all-ones value column (implicit feedback is asserted at
    Utils/assertions_on_data_for_experiments.py:12-24).
    """
    inter = events_as_interactions(events)
    return (
        inter.filter(F.col("event_type").isin(*INTERACTION_EVENT_TYPES))
        .select("user_id", "item_id")
        .dropDuplicates(["user_id", "item_id"])
        .withColumn("value", F.lit(1.0))
    )
