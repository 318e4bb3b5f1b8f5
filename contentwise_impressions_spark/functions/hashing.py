"""Portable deterministic hashing used for splits and sampling.

The reference seeds NumPy everywhere (seed 42 — Utils/dataset.py:325,
PureSVDRecommender.py:33) for reproducibility.  Spark's rand()/randomSplit()
are seeded too, but their streams differ from NumPy's AND from any SQL
oracle's, so "same seed" never means "same rows" across engines.

For operators whose OUTPUT must be checkable row-for-row against an
independent engine (the DuckDB oracle), we instead derive pseudo-randomness
from the data itself with multiplicative hashing over integer keys.  This is
also the 100 TB-scale answer: a hash of the row needs no shuffle, no
broadcast state, and assigns every row its split independently on whatever
executor holds it.

Constants are small enough that ``key * PRIME`` never overflows int64 for
any realistic id (< 2^40), so Java (wrapping) and DuckDB (checked) arithmetic
agree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: primes used by the 2-key bucket hash; mirrored in oracle SQL.
P1 = 1_000_003
P2 = 7_919
MOD = 997


def bucket_hash(key1: Column, key2: Column | None = None, mod: int = MOD) -> Column:
    """((key1*P1 + key2*P2) mod `mod`) — portable across Spark/DuckDB."""
    expr = key1.cast("bigint") * F.lit(P1)
    if key2 is not None:
        expr = expr + key2.cast("bigint") * F.lit(P2)
    return F.pmod(expr, F.lit(mod))


def deterministic_bucket(
    key1: Column, key2: Column | None, fractions: list[float], mod: int = MOD
) -> Column:
    """Map rows into len(fractions) buckets with the given proportions.

    Drop-in deterministic analog of ``DataFrame.randomSplit(fractions, seed)``
    (reference: dask random_split at Utils/dataset.py:322-325) that an
    external SQL engine can reproduce exactly.
    Returns an int column: 0..len(fractions)-1.
    """
    total = sum(fractions)
    h = bucket_hash(key1, key2, mod)
    out = F.lit(len(fractions) - 1)
    acc = 0.0
    # build nested WHEN from the last threshold backwards
    thresholds = []
    for f in fractions[:-1]:
        acc += f / total
        thresholds.append(int(round(acc * mod)))
    expr = None
    for i, t in enumerate(thresholds):
        cond = h < F.lit(t)
        expr = F.when(cond, F.lit(i)) if expr is None else expr.when(cond, F.lit(i))
    return out if expr is None else expr.otherwise(out)


def bucket_sql(key1: str, key2: str | None = None, mod: int = MOD) -> str:
    """The DuckDB-SQL rendering of :func:`bucket_hash` for oracle queries."""
    if key2 is None:
        inner = f"(CAST({key1} AS BIGINT) * {P1})"
    else:
        inner = f"(CAST({key1} AS BIGINT) * {P1} + CAST({key2} AS BIGINT) * {P2})"
    return f"(({inner} % {mod} + {mod}) % {mod})"


#: second multiplier for the 2-round avalanche mix (pairs with P1); the
#: modulus primes the mix shares with the sketch queries.
P_MIX = 1_000_033
P_BIG = 1_000_000_007


def avalanche(key: Column, a1: int = P1, a2: int = P_MIX) -> Column:
    """Two multiply-mod rounds interleaved with xor-shifts — the portable
    structure-breaking mix (plain multiplicative hashing leaves small
    structured ids on a lattice; see plans/relational.py's portable-HLL
    notes).  Every op is exact in Spark AND DuckDB (products stay under
    2^51, inside DuckDB's checked int64), so :func:`avalanche_sql`
    reproduces the value bit-for-bit.  Output mixes over [0, 2^30) (the
    final xor can carry slightly past P_BIG); reduce with % as needed.
    """
    h1 = F.pmod(key.cast("bigint") * a1, F.lit(P_BIG))
    h1x = h1.bitwiseXOR(F.shiftright(h1, 13))
    h2 = F.pmod(h1x * a2, F.lit(P_BIG))
    return h2.bitwiseXOR(F.shiftright(h2, 7))


def avalanche_sql(key: str, a1: int = P1, a2: int = P_MIX) -> str:
    """DuckDB-SQL rendering of :func:`avalanche` for oracle twins."""
    h1 = f"(CAST({key} AS BIGINT) * {a1} % {P_BIG})"
    h1x = f"xor({h1}, {h1} >> 13)"
    h2 = f"({h1x} * {a2} % {P_BIG})"
    return f"xor({h2}, {h2} >> 7)"
