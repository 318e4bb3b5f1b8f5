"""Timestamp → epoch-seconds conversion that is safe for every Spark
timestamp flavor.

Parquet written by pandas/pyarrow without a timezone reads back as
``TIMESTAMP_NTZ`` under Spark 4's ``inferTimestampNTZ`` default, and
``CAST(ts AS DOUBLE)`` is rejected for that type
(DATATYPE_MISMATCH.CAST_WITHOUT_SUGGESTION).  Routing through an
intermediate ``TIMESTAMP`` cast is allowed for both NTZ and tz-aware
inputs; with the engine-wide UTC session timezone the result equals
DuckDB's ``epoch(ts)`` on the same parquet (sub-second precision kept,
unlike ``unix_timestamp`` which truncates to whole seconds).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_seconds(col: Column | str) -> Column:
    """Epoch seconds (double, microsecond precision) of a TIMESTAMP or
    TIMESTAMP_NTZ column.  Equals DuckDB ``epoch(ts)`` under the UTC
    session timezone set by :mod:`..session`."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("double")
