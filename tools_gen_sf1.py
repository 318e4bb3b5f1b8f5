"""Generate a 10x scale-up of the sf0.1 test tables at /tmp/sf1.

Scaling model: "10x activity over a fixed catalog" — the axis real
deployments grow on (traffic and users grow ~linearly; catalogs don't):

- ``customer`` / ``orders`` / ``lineitem``: 10 key-shifted copies of the
  transaction side (custkey/orderkey += i * STRIDE); ``l_partkey`` /
  ``l_suppkey`` are NOT shifted, so the part/supplier catalog stays fixed
  and the co-order part graph (part_bfs_hops) densifies instead of
  splitting into disjoint replicas.
- ``events``: 10 copies with shifted ``event_id`` / ``user_id`` — 10x
  users over the same item catalog (props, which carry the item ids, are
  untouched), aligned with the shifted custkeys so user<->customer joins
  keep working per copy.
- ``documents``: 10 copies with shifted ``doc_id`` and a per-copy token
  suffix (copy 0 verbatim), so the corpus grows 10x with DISJOINT shingle
  spaces — MinHash/LSH bucket counts scale linearly instead of every
  bucket becoming a 10x-duplicate cluster (which would quadratically
  inflate candidate pairs and measure an artifact, not the design).
- ``embeddings``: 10 copies with shifted ``vec_id``; copy 0 verbatim,
  copies 1-9 carry a deterministic per-(vector, copy, dim) hash jitter of
  at most ±0.01 in EXACT multiples of the fixed-point grid step 2^-22
  (operators/ann.py QUANT), so each original vector becomes a cluster of
  10 NEAR-duplicates instead of verbatim twins.  Verbatim copies made
  every recall-vs-exact column read 1.0 by dataset shape (identical
  coordinates can never split across IVF lists — the round-14 verdict's
  degenerate-recall finding); with jitter, siblings near Voronoi
  boundaries can route apart and the sf1 recall columns become
  informative (n_probe=1 vs 2 differentiate).  The jitter is pure SQL
  over seeded ids (no RNG stream) and the values are written once to
  parquet, so both engines read identical doubles and the integer-exact
  quantized twins replay unchanged.
- ``part`` / ``supplier`` / ``region`` / ``nation``: verbatim (fixed
  dimensions).

Deterministic (pure SQL over the driver's seeded tables), written with
DuckDB so generation doesn't need a Spark session.  Events' TIMESTAMP(NANOS)
round-trips to microsecond TIMESTAMP, which sources/tables.load_table
accepts unchanged (its nanos branch only fires on int64-nanos columns).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
COPIES = 10
STRIDE = 1_000_000_000


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SRC}/{t}.parquet')"
        )

    sqls = {
        "region": "SELECT * FROM region",
        "nation": "SELECT * FROM nation",
        "supplier": "SELECT * FROM supplier",
        "part": "SELECT * FROM part",
        "customer": f"""
            SELECT c_custkey + i * {STRIDE} AS c_custkey, c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM customer CROSS JOIN range({COPIES}) t(i)
        """,
        "orders": f"""
            SELECT o_orderkey + i * {STRIDE} AS o_orderkey,
                   o_custkey + i * {STRIDE} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM orders CROSS JOIN range({COPIES}) t(i)
        """,
        "lineitem": f"""
            SELECT l_orderkey + i * {STRIDE} AS l_orderkey,
                   l_partkey, l_suppkey, l_linenumber, l_quantity,
                   l_extendedprice, l_discount, l_tax, l_returnflag,
                   l_linestatus, l_shipdate
            FROM lineitem CROSS JOIN range({COPIES}) t(i)
        """,
        "events": f"""
            SELECT event_id + i * {STRIDE} AS event_id, ts,
                   user_id + i * {STRIDE} AS user_id,
                   event_type, value, props
            FROM events CROSS JOIN range({COPIES}) t(i)
        """,
        "documents": f"""
            SELECT doc_id + i * {STRIDE} AS doc_id,
                   CASE WHEN i = 0 THEN text
                        ELSE regexp_replace(text, '(\\S+)',
                                            '\\1_c' || i, 'g') END AS text,
                   lang, source,
                   CAST(length(CASE WHEN i = 0 THEN text
                        ELSE regexp_replace(text, '(\\S+)',
                                            '\\1_c' || i, 'g') END)
                        AS BIGINT) AS n_chars
            FROM documents CROSS JOIN range({COPIES}) t(i)
        """,
        # jitter = ((vec_id*P1 + dim*P2 + copy*9973) mod 83887 - 41943)
        # grid steps of 2^-22 (= 2.384185791015625e-07, exactly
        # representable), i.e. |jitter| <= 0.01 — ~10% of a typical entry
        "embeddings": f"""
            SELECT vec_id + i * {STRIDE} AS vec_id,
                   CASE WHEN i = 0 THEN embedding
                        ELSE list_transform(
                            embedding,
                            (x, d) -> x + CAST(
                                (vec_id * 1000003 + d * 7919 + i * 9973)
                                    % 83887 - 41943 AS DOUBLE)
                                * 2.384185791015625e-07)
                   END AS embedding,
                   label
            FROM embeddings CROSS JOIN range({COPIES}) t(i)
        """,
    }
    for t, sql in sqls.items():
        out = f"{DST}/{t}.parquet"
        con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}')"
        ).fetchone()[0]
        print(f"{t}: {n} rows -> {out}")


if __name__ == "__main__":
    main()
