"""SQL surface: the harness tables as temp views.

The reference has no SQL layer at all (SURVEY.md intro) — every "query" is
a hand-fused dataflow program.  On Spark the SQL surface is free: register
the tables once and any ANSI query planner-optimizes through the exact
same Catalyst pipeline as the DataFrame API (they compile to the same
logical plans).  `spark.sql` queries and DataFrame queries interoperate —
a registered view can be read by either.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .tables import TESTDATA_TABLES, load_table


def register_views(
    spark: SparkSession, sf_dir: str, *names: str
) -> list[str]:
    """Create (or replace) one temp view per harness table; returns the
    view names.  Views are lazy — no scan happens until a query runs."""
    use = names or TESTDATA_TABLES
    for n in use:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
    return list(use)
