"""Local replica of the driver's Spark-vs-DuckDB differential check.

Runs each registered query through both engines on the same parquet tables
and compares row count, column names, and values (order-insensitive, float
tolerance) — so oracle mismatches are caught in pytest before the driver
round runs.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

TABLES = (
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
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = pd.to_datetime(out[c]).dt.tz_localize(None).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(out[c]):
            out[c] = out[c].astype("float64")
        elif pd.api.types.is_integer_dtype(out[c]):
            out[c] = out[c].astype("int64")
    # sort exact-typed columns first; floats only as rounded tie-breakers so
    # last-ulp engine differences can't reorder rows
    exact = [c for c in out.columns if not pd.api.types.is_float_dtype(out[c])]
    floats = [c for c in out.columns if pd.api.types.is_float_dtype(out[c])]
    for c in floats:
        out[f"_r_{c}"] = out[c].round(6)
    sort_cols = exact + [f"_r_{c}" for c in floats]
    out = out.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
    return out.drop(columns=[f"_r_{c}" for c in floats])


def assert_frames_match(
    spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = "query"
) -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs "
        f"{sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(oracle_pdf)}"
    )
    a = canonicalize(spark_pdf)
    b = canonicalize(oracle_pdf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        # The driver's canonical hash is dtype-sensitive: an int64 Spark
        # column vs a float64 oracle column (DuckDB HUGEINT from SUM(BIGINT))
        # hash-mismatches even on identical values.  Replicate that here so
        # uncast oracle sums fail in pytest, not in the driver round
        # (bit us in r1 doc_fingerprints and r3 doc_packing_stats).
        a_float = np.issubdtype(av.dtype, np.floating)
        b_float = np.issubdtype(bv.dtype, np.floating)
        assert a_float == b_float, (
            f"{name}: column {c} dtype class mismatch — spark {av.dtype} vs "
            f"oracle {bv.dtype}; if the oracle sums integers, wrap in "
            f"CAST(... AS BIGINT) (DuckDB HUGEINT surfaces as float64)"
        )
        if np.issubdtype(av.dtype, np.floating):
            ok = np.isclose(av, bv, rtol=1e-6, atol=1e-9, equal_nan=True)
        elif np.issubdtype(av.dtype, np.datetime64):
            # NaT == NaT is False in numpy; the driver hashes nulls as
            # equal, so matching NaTs must count as matching here too
            # (first hit: user_state_history's open SCD2 intervals)
            ok = (av == bv) | (np.isnat(av) & np.isnat(bv))
        else:
            ok = av == bv
        bad = ~np.asarray(ok)
        assert not bad.any(), (
            f"{name}: column {c} differs at {bad.sum()} rows; "
            f"first: spark={av[bad][:3]} oracle={bv[bad][:3]}"
        )
