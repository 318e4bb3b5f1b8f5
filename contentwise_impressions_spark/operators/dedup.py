"""Deduplication operators.

Reference analogs:
- key-subset dedup        — drop_duplicates(subset=[user,item]) at
  /root/reference/Utils/dataset.py:322-325,1129-1130.
- keep-last-by-timestamp  — sort + drop_duplicates(keep='last') at
  Data_manager/DataReader_utils.py:134-150.

Both shuffle on the dedup key — at 100 TB that is the minimal correct cost.
``dedup_exact`` lowers to a hash aggregate (map-side partial dedup first);
``keep_last_by_timestamp`` is a window over the same partitioning, with the
max-timestamp row kept deterministically (ties broken by a tag column when
provided).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_exact(df: DataFrame, keys: list[str]) -> DataFrame:
    """First-seen-agnostic exact dedup on a key subset.

    Note: like the reference's dask drop_duplicates, WHICH duplicate row
    survives is unspecified; use only when non-key columns are either
    dropped afterwards or functionally dependent on the keys.
    """
    return df.dropDuplicates(keys)


def keep_last_by_timestamp(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Keep, per key group, the row with the greatest timestamp.

    Reference: DataReader_utils.py:134-150 (sort_values then
    drop_duplicates(keep='last')).  Expressed as a row_number window so the
    survivor is deterministic; `tiebreak` columns disambiguate equal
    timestamps (the reference's behavior there was positional, i.e.
    undefined under parallel input).
    """
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 30,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """Connected components by alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014) — the duplicate-CLUSTER resolution step that turns near-dup
    candidate PAIRS (MinHash-LSH / SimHash / embedding-cosine) into
    transitive groups, so a 100 TB corpus can keep one representative per
    cluster.

    Why this algorithm: naive min-label propagation needs O(diameter)
    rounds (a 10^6-long chain of near-dups = 10^6 shuffles); star
    contraction converges in O(log^2 n) rounds regardless of shape, each
    round a groupBy-min plus a join — all shuffle-partitioned on node id.
    Each round is localCheckpoint()ed: iterative self-joins otherwise grow
    an exponential lineage that would stall the scheduler long before the
    data hurts.

    Returns (node, component) for every node appearing in `edges`, with
    component = MIN node id reachable — deterministic, so downstream
    "keep the representative" filters are reproducible.

    Adaptive small-case path: near-dup candidate graphs are usually a
    tiny fraction of the corpus (LSH has already filtered), so when the
    deduped edge count is ≤ `driver_threshold` the exact same answer
    comes from one collect + union-find on the driver — one job instead
    of ~6 shuffles per star round.  Above the threshold the distributed
    star contraction runs (the 100 TB path); set `driver_threshold=0` to
    force it.
    """
    # canonical loop-free edge list, oriented u > v; BIGINT node ids
    raw = edges.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    ).filter(F.col("a") != F.col("b"))
    e = (
        raw.select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    if driver_threshold > 0 and e.count() <= driver_threshold:
        return _union_find_on_driver(e)
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _checksum(df: DataFrame) -> tuple[int, int]:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
        ).collect()[0]
        return int(row["n"]), int(row["h"])

    prev = _checksum(e)
    for _ in range(max_iterations):
        # large-star over the full (symmetrized) neighborhood: every
        # neighbor v > u re-links to m = min(N(u) ∪ {u}); output is
        # canonical (v > m always) because m <= u < v
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            sym.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star on the larger→smaller orientation: u and all its
        # smaller neighbors link to m = min(N⁻(u) ∪ {u})
        mins2 = large.groupBy("u").agg(F.min("v").alias("m"))
        with_m = large.join(mins2, "u")
        small = (
            with_m.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(with_m.select(F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        e = small.localCheckpoint(eager=True)
        cur = _checksum(e)
        if cur == prev:
            break
        prev = cur

    # at the fixpoint the edge set is a star forest: every non-root points
    # at its component minimum; roots map to themselves
    roots = e.groupBy("u").agg(F.min("v").alias("component"))
    return nodes.join(roots, nodes.node == roots.u, "left").select(
        "node", F.coalesce("component", "node").alias("component")
    )


def _union_find_on_driver(e: DataFrame) -> DataFrame:
    """Exact min-label components for a small edge list: collect once,
    union-find with path halving, return (node, component).  Union always
    hangs the larger root index under the smaller, and node ids are
    factorized in sorted order — so every root is its component's minimum
    id by construction."""
    import numpy as np

    pdf = e.toPandas()
    uv = np.concatenate([pdf["u"].to_numpy(np.int64), pdf["v"].to_numpy(np.int64)])
    ids, inv = np.unique(uv, return_inverse=True)
    half = len(pdf)
    parent = np.arange(len(ids), dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return int(x)

    for a, b in zip(inv[:half], inv[half:]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    comp = np.array([find(i) for i in range(len(ids))], dtype=np.int64)
    out = [(int(ids[i]), int(ids[comp[i]])) for i in range(len(ids))]
    return e.sparkSession.createDataFrame(out, "node bigint, component bigint")
