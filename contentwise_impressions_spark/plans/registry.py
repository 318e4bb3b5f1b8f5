"""Query registry: every implemented operator exposed as a named query.

Each :class:`QuerySpec` pairs a Spark DataFrame program (the engine under
test) with an equivalent ANSI-SQL string for the DuckDB oracle.  Specs with
``oracle=None`` are non-SQL-expressible (streaming, iterative ML) and get the
driver's weaker rows-only check.

Column-name discipline: the driver sorts columns by name before hashing, so
every computed column is aliased identically in both the DataFrame program
and the SQL (see repo README / driver contract).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    #: include in bench.py timing (False for iterative model FITS, whose
    #: reference analog is a training budget, not a query — BASELINE.md)
    bench: bool = True


_REGISTRY: dict[str, QuerySpec] = {}


def register(spec: QuerySpec) -> QuerySpec:
    if spec.name in _REGISTRY:
        raise ValueError(f"duplicate query name: {spec.name}")
    _REGISTRY[spec.name] = spec
    return spec


def _load_all_modules() -> None:
    # import for side effect: each module registers its QuerySpecs
    from . import relational  # noqa: F401
    from . import recsys  # noqa: F401
    from . import textops  # noqa: F401
    from . import mlops  # noqa: F401
    from . import dedupops  # noqa: F401
    from . import modelops  # noqa: F401
    from . import impressionops  # noqa: F401
    from . import cbfops  # noqa: F401
    from . import pipelineops  # noqa: F401


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all_modules()
    return {name: spec.fn for name, spec in _REGISTRY.items()}


def all_oracle_sql() -> dict[str, str]:
    _load_all_modules()
    return {
        name: spec.oracle for name, spec in _REGISTRY.items() if spec.oracle
    }


def bench_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all_modules()
    return {n: s.fn for n, s in _REGISTRY.items() if s.bench}


def utc(spark: SparkSession) -> SparkSession:
    """Pin the session timezone so calendar functions (hour/day/...) agree
    with the oracle, which always interprets naive parquet timestamps as-is."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
