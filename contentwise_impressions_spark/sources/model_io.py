"""Model persistence: the DataIO zip (npz + json) as parquet + JSON.

Reference: Base/DataIO.py:102-232 saves a model as a zip of per-attribute
npz/json files and reloads it attribute-by-attribute.  The Spark analog:
each DataFrame-valued attribute is a parquet subdirectory, scalars go into
one ``meta.json`` — readable by any engine, partition-prunable, and safe to
write from a cluster (no driver-side zip assembly).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def save_model(
    path: str,
    dataframes: dict[str, DataFrame],
    metadata: dict | None = None,
) -> None:
    """Persist DataFrame attributes + scalar metadata under `path`."""
    base = Path(path)
    base.mkdir(parents=True, exist_ok=True)
    for name, df in dataframes.items():
        df.write.mode("overwrite").parquet(str(base / name))
    meta = dict(metadata or {})
    meta["_attributes"] = sorted(dataframes)
    with open(base / "meta.json", "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)


def load_model(
    spark: SparkSession, path: str
) -> tuple[dict[str, DataFrame], dict]:
    """Reload (dataframes, metadata) written by :func:`save_model`."""
    base = Path(path)
    with open(base / "meta.json") as f:
        meta = json.load(f)
    names = meta.pop("_attributes", [])
    dfs = {n: spark.read.parquet(str(base / n)) for n in names}
    return dfs, meta


def cached_or_build(
    spark: SparkSession,
    path: str,
    build,
    verify=None,
):
    """Split-cache protocol: reuse the parquet cache if present and valid,
    else build, verify, save, and return.

    Reference: Data_manager/DataReader.py:107-167 and Utils/dataset.py:
    271-284 — try the cached artifact, fall back to building it, always
    running the consistency check before trusting either side.
    """
    marker = Path(path) / "_SUCCESS_META"
    if marker.exists():
        df = spark.read.parquet(str(Path(path) / "data"))
        if verify is None or verify(df):
            return df
    df = build()
    if verify is not None and not verify(df):
        raise ValueError(f"built artifact failed verification: {path}")
    df.write.mode("overwrite").parquet(str(Path(path) / "data"))
    os.makedirs(path, exist_ok=True)
    marker.write_text("ok")
    return spark.read.parquet(str(Path(path) / "data"))
