"""Impression-pipeline operators (the CW-specific array-column path).

Reference query lifecycle §3.1: explode recommended_series_list, join back
to interactions, build impression URMs (Utils/dataset.py:401-508); the
clicked-position heatmap (dataset.py:1901-1996) and the array invariants
from the consistency suite (test_dataset_consistency.py:294-434).

The impressions table is derived deterministically from events
(sources/cw_schema.py) so every query here carries a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.cw_schema import impressions_from_events
from ..sources.interactions import events_as_interactions
from ..sources.tables import load_table
from .registry import QuerySpec, register, utc

#: oracle CTEs shared by the impression queries: interactions + derived
#: impressions (list(DISTINCT ... ORDER BY) ≡ Spark sort_array(collect_set))
_IMP_CTES = """
    inter AS (
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT) AS item_id,
               ts, event_type
        FROM events
    ),
    imp AS (
        SELECT CAST(user_id * 1000 + dayofmonth(ts) AS BIGINT) AS recommendation_id,
               user_id,
               CAST(dayofmonth(ts) % 5 AS INT) AS row_position,
               CAST(len(list(DISTINCT item_id ORDER BY item_id)) AS INT)
                   AS recommendation_list_length,
               list(DISTINCT item_id ORDER BY item_id) AS recommended_series_list
        FROM inter
        GROUP BY user_id, dayofmonth(ts)
    )
"""


def _inter(spark: SparkSession, sf_dir: str) -> DataFrame:
    utc(spark)
    return events_as_interactions(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# explode + count → impression URM (dataset.py:401-452,454-508)
# ---------------------------------------------------------------------------
def q_impression_urm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode rec lists back to (user, item) with impression multiplicity.

    The reference's direct-link URM build: explode the array column, join
    impressions to users, count multiplicity (dataset.py:404-452).  The
    non-direct-link variant (dataset.py:454-508) is the same plan keyed by
    user_id — the reference forced it partition-sequential to cap RAM at
    >120 GB; the shuffle does it for free here (SURVEY.md §4).
    """
    imp = impressions_from_events(_inter(spark, sf_dir))
    return (
        imp.select(
            "user_id", F.explode("recommended_series_list").alias("item_id")
        )
        .groupBy("user_id", "item_id")
        .agg(F.count("*").cast("bigint").alias("value"))
    )


register(
    QuerySpec(
        "impression_urm",
        q_impression_urm,
        f"""
        WITH {_IMP_CTES},
        ex AS (
            SELECT user_id, UNNEST(recommended_series_list) AS item_id FROM imp
        )
        SELECT user_id, item_id, CAST(COUNT(*) AS BIGINT) AS value
        FROM ex GROUP BY 1, 2
        """,
        doc="impression URM via explode+count (dataset.py:401-508)",
    )
)


# ---------------------------------------------------------------------------
# clicked-position heatmap (dataset.py:1901-1996)
# ---------------------------------------------------------------------------
def q_click_position_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position of the interacted item inside its recommendation list,
    crossed with row_position — the reference's heatmap matrix.

    array_position is 1-based with 0 = not found; the reference's np.where
    yields -1 for not-found (dataset.py:1905-1923) — we keep 0 as the
    sentinel and document the shift.
    """
    inter = _inter(spark, sf_dir)
    imp = impressions_from_events(inter)
    clicks = inter.filter(F.col("event_type") == "click").withColumn(
        "recommendation_id",
        (F.col("user_id") * 1000 + F.dayofmonth("ts")).cast("bigint"),
    )
    joined = clicks.join(
        imp.select(
            "recommendation_id", "row_position", "recommended_series_list"
        ),
        "recommendation_id",
    )
    return (
        joined.withColumn(
            "pos_in_list",
            F.array_position(
                F.col("recommended_series_list"), F.col("item_id")
            ).cast("bigint"),
        )
        .groupBy("row_position", "pos_in_list")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


register(
    QuerySpec(
        "click_position_heatmap",
        q_click_position_heatmap,
        f"""
        WITH {_IMP_CTES},
        clicks AS (
            SELECT *, CAST(user_id * 1000 + dayofmonth(ts) AS BIGINT)
                   AS recommendation_id
            FROM inter WHERE event_type = 'click'
        ),
        joined AS (
            SELECT i.row_position,
                   CAST(COALESCE(list_position(i.recommended_series_list,
                                               c.item_id), 0) AS BIGINT)
                       AS pos_in_list
            FROM clicks c JOIN imp i USING (recommendation_id)
        )
        SELECT row_position, pos_in_list, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM joined GROUP BY 1, 2
        """,
        doc="clicked-position heatmap (dataset.py:1901-1996)",
    )
)


# ---------------------------------------------------------------------------
# array invariants (test_dataset_consistency.py:294-434)
# ---------------------------------------------------------------------------
def q_impression_list_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The consistency suite's array checks as one aggregate: non-empty
    lists, declared length == size(list), clicked item ∈ its list."""
    inter = _inter(spark, sf_dir)
    imp = impressions_from_events(inter)
    base = imp.agg(
        F.count("*").cast("bigint").alias("n_recommendations"),
        F.sum(
            F.when(F.size("recommended_series_list") == 0, 1).otherwise(0)
        ).cast("bigint").alias("n_empty_lists"),
        F.sum(
            F.when(
                F.col("recommendation_list_length")
                != F.size("recommended_series_list"),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("n_length_mismatch"),
    )
    clicks = inter.filter(F.col("event_type") == "click").withColumn(
        "recommendation_id",
        (F.col("user_id") * 1000 + F.dayofmonth("ts")).cast("bigint"),
    )
    contained = (
        clicks.join(
            imp.select("recommendation_id", "recommended_series_list"),
            "recommendation_id",
        )
        .agg(
            F.sum(
                F.when(
                    F.array_position(
                        F.col("recommended_series_list"), F.col("item_id")
                    )
                    == 0,
                    1,
                ).otherwise(0)
            ).cast("bigint").alias("n_clicks_not_in_list")
        )
    )
    return base.crossJoin(contained)


register(
    QuerySpec(
        "impression_list_invariants",
        q_impression_list_invariants,
        f"""
        WITH {_IMP_CTES},
        base AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_recommendations,
                   CAST(SUM(CASE WHEN len(recommended_series_list) = 0
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_empty_lists,
                   CAST(SUM(CASE WHEN recommendation_list_length
                                 <> len(recommended_series_list)
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_length_mismatch
            FROM imp
        ),
        clicks AS (
            SELECT *, CAST(user_id * 1000 + dayofmonth(ts) AS BIGINT)
                   AS recommendation_id
            FROM inter WHERE event_type = 'click'
        ),
        contained AS (
            SELECT CAST(SUM(CASE WHEN COALESCE(list_position(
                        i.recommended_series_list, c.item_id), 0) = 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks_not_in_list
            FROM clicks c JOIN imp i USING (recommendation_id)
        )
        SELECT * FROM base CROSS JOIN contained
        """,
        doc="array-column consistency checks "
        "(test_dataset_consistency.py:294-434)",
    )
)
