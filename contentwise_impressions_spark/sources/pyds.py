"""Python DataSource (Spark 4 V2 extension API) for ratings text files.

The reference consumes `(user, item, rating[, ts])` text files with
arbitrary separators (Data_manager/DataReader_utils.py:96-170,
load_CSV_into_SparseBuilder); `sources/ratings_csv.load_ratings_csv` is
the production path (Spark's JVM CSV reader handles multi-char seps like
MovieLens' ``::`` natively and is the fast scan).  This module carries
the SAME format as a registered **Python DataSource** — the Spark 4
extension surface for formats the engine lacks a native reader for —
so the repo demonstrates the full source-extension API, not only the
built-in readers:

    spark.dataSource.register(RatingsDataSource)
    spark.read.format("ratings").option("sep", "::").load(path)

Engine mechanics worth knowing at scale:

- ``partitions()`` returns one :class:`InputPartition` per input file —
  Spark schedules one Python task per partition, so a directory of N
  shard files scans with N-way parallelism exactly like a native source.
- ``read()`` yields plain tuples; the worker Arrow-batches them back to
  the JVM.  A Python source is a per-row Python loop — fine for the
  long-tail formats this API exists for, NOT for the hot path (the
  repo-wide UDF discipline).  For hot formats use the JVM reader.
- ``pushFilters()`` (Spark 4.1; requires
  ``spark.sql.python.filterPushdown.enabled=true`` — the engine REFUSES
  a reader that overrides pushFilters while the flag is off, so the
  capability cannot silently degrade) implements source-side filtering:
  EqualTo on the token columns and numeric bounds on ``rating`` are
  consumed here (rows are dropped before serialization, the only saving
  a full-scan text source can offer), everything else is returned to
  Spark for post-scan evaluation.  Filters arrive ONLY for top-level
  AND conjuncts, mirroring the JVM pushdown contract.

Parity with the production loader is pinned by
tests/test_sources.py::test_python_datasource_matches_csv_loader; the
pushdown path by ::test_python_datasource_pushdown_prunes_rows.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

RATINGS_SCHEMA = (
    "user_token string, item_token string, rating double, ts bigint"
)
_COLS = ("user_token", "item_token", "rating", "ts")


class _FilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class RatingsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ratings source requires a path")
        self.sep = options.get("sep", ",")
        self.header = options.get("header", "false").lower() == "true"
        self.pushed: list[Filter] = []

    def pushFilters(self, filters):  # noqa: N802 (API name)
        for f in filters:
            # attribute paths are tuples; only top-level columns exist here
            col = f.attribute[0] if getattr(f, "attribute", None) else None
            if isinstance(f, EqualTo) and col in ("user_token", "item_token"):
                self.pushed.append(f)
            elif (
                isinstance(
                    f,
                    (
                        GreaterThan,
                        GreaterThanOrEqual,
                        LessThan,
                        LessThanOrEqual,
                    ),
                )
                and col == "rating"
            ):
                self.pushed.append(f)
            else:
                yield f  # unsupported -> Spark evaluates post-scan

    def partitions(self):
        import glob
        import os

        if os.path.isdir(self.path):
            files = sorted(glob.glob(os.path.join(self.path, "*")))
        else:
            files = sorted(glob.glob(self.path)) or [self.path]
        return [_FilePartition(p) for p in files]

    def _keep(self, row: tuple) -> bool:
        vals = dict(zip(_COLS, row))
        for f in self.pushed:
            col, v = f.attribute[0], vals[f.attribute[0]]
            if isinstance(f, EqualTo) and v != f.value:
                return False
            if isinstance(f, GreaterThan) and not v > f.value:
                return False
            if isinstance(f, GreaterThanOrEqual) and not v >= f.value:
                return False
            if isinstance(f, LessThan) and not v < f.value:
                return False
            if isinstance(f, LessThanOrEqual) and not v <= f.value:
                return False
        return True

    def read(self, partition: _FilePartition):
        first = True
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                if first and self.header:
                    first = False
                    continue
                first = False
                line = line.rstrip("\n")
                if not line:
                    continue
                parts = line.split(self.sep)
                row = (
                    parts[0],
                    parts[1],
                    float(parts[2]),
                    int(parts[3]) if len(parts) > 3 else 0,
                )
                if self._keep(row):
                    yield row


class RatingsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ratings"

    def schema(self) -> str:
        return RATINGS_SCHEMA

    def reader(self, schema) -> RatingsReader:
        return RatingsReader(self.options)
