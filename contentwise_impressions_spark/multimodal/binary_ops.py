"""Multimodal (image/audio/video) column plumbing.

Training-data-pipeline extension: media travel as opaque ``binary`` columns
with a typed metadata struct; decode / feature-extraction / frame-sampling
run as Arrow-batched ``mapInPandas`` stages.  The actual codecs (PIL,
ffmpeg, torchaudio, …) are NOT in this container, so the decode kernel is
STUBBED: `decode_media(..., allow_fake=False)` raises NotImplementedError
exactly where the real library call belongs, and `allow_fake=True`
substitutes a deterministic byte-statistics decoder so the Spark-side
contract — schema, batch shape, partitioning, null behavior — is real and
tested end-to-end.

Design notes for 100 TB of media:
- binary payloads ride the SAME row as their metadata; column pruning means
  metadata-only queries never read the bytes (parquet column chunks).
- decode fan-out is per-row-independent → mapInPandas with small
  `maxRecordsPerBatch` so a batch of 100 MB payloads fits in Arrow memory.
- frame sampling emits multiple rows per input (posexplode of frame
  indices) BEFORE decode, so the expensive kernel sees exactly the frames
  it must touch.
"""

from __future__ import annotations

import sys
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # by-value pickling: executors need no PYTHONPATH (see slim.py note)
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

#: typed metadata carried alongside every media payload
MEDIA_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),  # image | audio | video
        StructField("format", StringType()),  # png/jpeg/wav/mp4/...
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("n_bytes", LongType()),
    ]
)


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic binary payload + metadata from each document —
    the test harness's media source (no real media in the container)."""
    payload = F.encode(F.col("text"), "utf-8").cast(BinaryType())
    return docs.select(
        "doc_id",
        payload.alias("media_bytes"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake").alias("format"),
            (F.col("n_chars") % 640 + 1).cast("int").alias("width"),
            (F.col("n_chars") % 480 + 1).cast("int").alias("height"),
            F.lit(0).cast("bigint").alias("duration_ms"),
            F.length(payload).cast("bigint").alias("n_bytes"),
        ).alias("media_meta"),
    )


_DECODE_OUT = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_intensity", DoubleType()),
    ]
)


def decode_media(media: DataFrame, allow_fake: bool = False) -> DataFrame:
    """Decode payloads to (doc_id, width, height, mean_intensity).

    The real implementation belongs at the marked line (PIL/libvips etc.);
    `allow_fake=True` uses byte statistics as a stand-in so the distributed
    plumbing is exercised for real.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not allow_fake:
                raise NotImplementedError(
                    "media decode requires an image/audio library not present "
                    "in this environment; pass allow_fake=True for the "
                    "deterministic byte-statistics stand-in"
                )
            out = []
            for doc_id, blob, meta in zip(
                pdf["doc_id"], pdf["media_bytes"], pdf["media_meta"]
            ):
                arr = np.frombuffer(blob, dtype=np.uint8)
                out.append(
                    (
                        doc_id,
                        meta["width"],
                        meta["height"],
                        float(arr.mean()) if arr.size else 0.0,
                    )
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "mean_intensity"]
            )

    return media.mapInPandas(kernel, _DECODE_OUT)


_FEATURE_OUT = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("embedding", ArrayType(DoubleType())),
    ]
)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic 'feature extractor': byte histogram → fixed-dim vector.

    Stand-in for a vision/audio encoder; the contract (Arrow batches in,
    (id, array<double>) out, one row per input) is the real one.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media_bytes"]):
                arr = np.frombuffer(blob, dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
                total = max(hist.sum(), 1)
                out.append((doc_id, (hist / total).tolist()))
            yield pd.DataFrame(out, columns=["doc_id", "embedding"])

    return media.mapInPandas(kernel, _FEATURE_OUT)


def sample_frames(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Expand each video row into (doc_id, frame_idx, frame_ts_ms) rows —
    the pre-decode fan-out, pure column arithmetic (no UDF)."""
    n_frames = F.greatest(
        (F.col("media_meta.duration_ms") / every_ms).cast("int"), F.lit(1)
    )
    return media.select(
        "doc_id",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias(
            "frame_idx", "_"
        ),
    ).select(
        "doc_id",
        F.col("frame_idx").cast("int"),
        (F.col("frame_idx") * every_ms).cast("bigint").alias("frame_ts_ms"),
    )


_RESIZE_OUT = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_bytes", BinaryType()),
        StructField("media_meta", MEDIA_SCHEMA),
    ]
)


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize each payload's pixel grid to (width × height) —
    nearest-neighbor resampling over the byte matrix.

    For real formats the codec decode belongs before the resample
    (decode_media's marked line); the fake format IS a raw byte grid, so
    the resampling math here is real numpy, and the contract — binary in,
    binary out, metadata struct rewritten to the new dimensions — is the
    production one.  Row-independent → mapInPandas, no shuffle.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for doc_id, blob, meta in zip(
                pdf["doc_id"], pdf["media_bytes"], pdf["media_meta"]
            ):
                w0 = max(int(meta["width"]), 1)
                arr = np.frombuffer(blob, dtype=np.uint8)
                h0 = max(len(arr) // w0, 1)
                grid = np.resize(arr, (h0, w0))  # pad/truncate to the grid
                rows = (np.arange(height) * h0 // height).clip(0, h0 - 1)
                cols = (np.arange(width) * w0 // width).clip(0, w0 - 1)
                resized = grid[np.ix_(rows, cols)]
                out.append(
                    (
                        doc_id,
                        resized.tobytes(),
                        {
                            "media_type": meta["media_type"],
                            "format": meta["format"],
                            "width": width,
                            "height": height,
                            "duration_ms": meta["duration_ms"],
                            "n_bytes": width * height,
                        },
                    )
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "media_bytes", "media_meta"]
            )

    return media.mapInPandas(kernel, _RESIZE_OUT)
