"""Multimodal (image/audio/video) column plumbing.

Training-data-pipeline extension: media travel as opaque ``binary`` columns
with a typed metadata struct; decode / feature-extraction / frame-sampling
run as Arrow-batched ``mapInPandas`` stages.

Decode status: PPM/PGM (netpbm P6/P5), BMP (BITMAPINFOHEADER, 8/24/32 bpp
uncompressed), baseline-sequential JPEG (`multimodal/jpeg.py` — marker
walk, Huffman entropy decode, IDCT, 4:2:0 upsample, restart markers),
PNG (`multimodal/png.py` — CRC-checked chunk walk, zlib inflate, all
five scanline unfilters, palette) and RIFF/WAVE PCM all decode FOR REAL
via pure-numpy/stdlib codecs, end-to-end through the same mapInPandas
kernel a production decoder would use.  The remaining compressed codecs
(mp3/mp4 — ffmpeg/torchaudio are NOT in this container) stay stubbed:
`decode_media(..., allow_fake=False)` raises NotImplementedError exactly
where the library call belongs, and `allow_fake=True` substitutes a
deterministic byte-statistics decoder so the Spark-side contract —
schema, batch shape, partitioning, null behavior — is exercised for
every format.

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


# ---------------------------------------------------------------------------
# pure-numpy raster codecs (no external image library)
# ---------------------------------------------------------------------------
def _ppm_tokens(buf: bytes, n: int) -> tuple[list[bytes], int]:
    """First `n` whitespace-separated netpbm header tokens ('#' comments
    skipped), plus the offset of the byte AFTER the single whitespace that
    terminates the last token (= raster start)."""
    toks: list[bytes] = []
    i = 0
    while len(toks) < n:
        while i < len(buf) and buf[i : i + 1].isspace():
            i += 1
        if i < len(buf) and buf[i] == 0x23:  # '#' comment to end of line
            while i < len(buf) and buf[i] not in (0x0A, 0x0D):
                i += 1
            continue
        j = i
        while j < len(buf) and not buf[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated netpbm header")
        toks.append(buf[i:j])
        i = j
    return toks, i + 1  # exactly one whitespace after maxval, then raster


def _decode_ppm(buf: bytes):
    """netpbm P6 (RGB) / P5 (gray) with maxval < 256 → (H, W, C) uint8."""
    import numpy as np

    (magic, w, h, maxval), off = _ppm_tokens(bytes(buf), 4)
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"unsupported netpbm magic {magic!r}")
    w, h, maxval = int(w), int(h), int(maxval)
    if maxval >= 256:
        raise ValueError("16-bit netpbm not supported")
    c = 3 if magic == b"P6" else 1
    raster = np.frombuffer(buf, np.uint8, count=w * h * c, offset=off)
    return raster.reshape(h, w, c)


def encode_ppm(img) -> bytes:
    """(H, W) or (H, W, 1|3) uint8 → netpbm P5/P6 bytes (test/reference
    encoder for the decoder above)."""
    import numpy as np

    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    magic = b"P6" if c == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + a.tobytes()


def _decode_bmp(buf: bytes):
    """Uncompressed BMP (BITMAPINFOHEADER, 8/24/32 bpp) → (H, W, C) uint8.
    8 bpp is returned as grayscale via the palette's blue channel (the
    common grayscale-palette case); 24/32 bpp BGR(A) → RGB."""
    import numpy as np

    b = bytes(buf)
    if b[:2] != b"BM":
        raise ValueError("not a BMP file")
    off = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    if comp != 0 or bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    flip = h > 0
    h = abs(h)
    row_bytes = (w * bpp // 8 + 3) // 4 * 4
    raster = np.frombuffer(b, np.uint8, count=row_bytes * h, offset=off)
    raster = raster.reshape(h, row_bytes)
    if bpp == 8:
        # palette: 4-byte BGRA entries right after the 54-byte headers
        pal = np.frombuffer(b, np.uint8, count=256 * 4, offset=54).reshape(
            256, 4
        )
        img = pal[raster[:, :w], 0][:, :, None]  # blue channel
    else:
        nc = bpp // 8
        img = raster[:, : w * nc].reshape(h, w, nc)[:, :, :3][:, :, ::-1]
    return img[::-1] if flip else img


def encode_wav(samples, sample_rate: int = 8000) -> bytes:
    """(n,) or (n, channels) int16 PCM → RIFF/WAVE bytes (test/reference
    encoder for `_decode_wav`)."""
    import numpy as np

    a = np.asarray(samples, dtype="<i2")
    if a.ndim == 1:
        a = a[:, None]
    n_ch = a.shape[1]
    data = a.tobytes()
    byte_rate = sample_rate * n_ch * 2
    fmt = (
        b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")  # PCM
        + n_ch.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (n_ch * 2).to_bytes(2, "little")  # block align
        + (16).to_bytes(2, "little")  # bits per sample
    )
    chunks = fmt + b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def _decode_wav(buf: bytes):
    """RIFF/WAVE PCM (8-bit unsigned / 16-bit signed) → ((n, ch) int32
    samples centred at 0, sample_rate).  Walks the chunk list, so extra
    chunks (LIST/INFO, fact) before ``data`` are handled."""
    import numpy as np

    b = bytes(buf)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i, n_ch, rate, bits = 12, None, None, None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = int.from_bytes(b[i + 4 : i + 8], "little")
        if i + 8 + size > len(b):
            # the declared size runs past the buffer — fail with the real
            # cause instead of letting a silently-truncated body surface
            # as a confusing numpy frombuffer error downstream
            raise ValueError(
                f"truncated WAVE file: chunk {cid!r} declares {size} bytes "
                f"but only {len(b) - i - 8} remain"
            )
        body = b[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            audio_fmt = int.from_bytes(body[0:2], "little")
            if audio_fmt != 1:
                raise ValueError(f"unsupported WAVE format code {audio_fmt}")
            n_ch = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            if n_ch is None:
                raise ValueError("WAVE data chunk before fmt chunk")
            if bits == 16:
                a = np.frombuffer(body, "<i2", count=size // 2).astype(
                    np.int32
                )
            elif bits == 8:
                a = (
                    np.frombuffer(body, np.uint8, count=size).astype(np.int32)
                    - 128
                )
            else:
                raise ValueError(f"unsupported PCM bit depth {bits}")
            return a.reshape(-1, n_ch), rate
        i += 8 + size + (size & 1)  # chunks are word-aligned
    raise ValueError("no data chunk in WAVE file")


#: formats the pure-numpy codecs decode for real
# module-scope import (not lazy inside the kernel): both this module and
# multimodal.jpeg are registered for by-value pickling, so the function
# reference ships with the task — a worker never imports the package
from .jpeg import decode_jpeg as _decode_jpeg  # noqa: E402
from .jpeg import encode_jpeg as _encode_jpeg  # noqa: E402
from .png import decode_png as _decode_png  # noqa: E402
from .png import encode_png as _encode_png  # noqa: E402

_REAL_DECODERS = {
    "ppm": _decode_ppm,
    "pgm": _decode_ppm,
    "bmp": _decode_bmp,
    "jpeg": _decode_jpeg,
    "jpg": _decode_jpeg,
    "png": _decode_png,
}


def decode_media(media: DataFrame, allow_fake: bool = False) -> DataFrame:
    """Decode payloads to (doc_id, width, height, mean_intensity).

    PPM/PGM/BMP payloads decode FOR REAL (pure-numpy codecs above) —
    width/height come from the decoded raster, mean_intensity from the
    pixels.  Other formats need a codec library not in this container:
    the marked line raises unless `allow_fake=True` substitutes the
    deterministic byte-statistics stand-in (contract still exercised).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for doc_id, blob, meta in zip(
                pdf["doc_id"], pdf["media_bytes"], pdf["media_meta"]
            ):
                dec = _REAL_DECODERS.get((meta["format"] or "").lower())
                if dec is not None:
                    img = dec(blob)
                    out.append(
                        (
                            doc_id,
                            int(img.shape[1]),
                            int(img.shape[0]),
                            float(img.mean()) if img.size else 0.0,
                        )
                    )
                    continue
                if not allow_fake:
                    # an mp3/mp4 codec call belongs HERE
                    raise NotImplementedError(
                        f"no codec for format {meta['format']!r} in this "
                        "environment (pure-numpy decoders cover ppm/pgm/"
                        "bmp/jpeg/png); pass allow_fake=True for the "
                        "deterministic byte-statistics stand-in"
                    )
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


_AUDIO_OUT = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("mean_amplitude", DoubleType()),
        StructField("rms_amplitude", DoubleType()),
        StructField("peak_amplitude", LongType()),
    ]
)


def decode_audio(media: DataFrame) -> DataFrame:
    """Decode WAV payloads to per-clip waveform statistics.

    PCM WAV decodes FOR REAL (`_decode_wav`); compressed audio (mp3/ogg —
    no codec library in this container) raises at the marked line.  Sums
    run in int64 over the integer samples, so mean/RMS are exact ratios —
    bit-identical to an arithmetic oracle.  Row-independent → mapInPandas,
    no shuffle; payload bytes never leave their row.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for doc_id, blob, meta in zip(
                pdf["doc_id"], pdf["media_bytes"], pdf["media_meta"]
            ):
                if (meta["format"] or "").lower() != "wav":
                    # an mp3/ogg/flac codec call belongs HERE
                    raise NotImplementedError(
                        f"no audio codec for format {meta['format']!r} in "
                        "this environment (pure-numpy decoder covers PCM "
                        "wav)"
                    )
                samples, rate = _decode_wav(blob)
                flat = samples.astype(np.int64).ravel()
                n = flat.size
                out.append(
                    (
                        doc_id,
                        n,
                        rate,
                        n * 1000 // (rate * samples.shape[1]),
                        float(flat.sum()) / n if n else 0.0,
                        float(np.sqrt((flat * flat).sum() / n)) if n else 0.0,
                        int(np.abs(flat).max()) if n else 0,
                    )
                )
            yield pd.DataFrame(out, columns=[f.name for f in _AUDIO_OUT])

    return media.mapInPandas(kernel, _AUDIO_OUT)


_AUDIO_FRAME_OUT = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("sum_sq", LongType()),
        StructField("zero_crossings", LongType()),
        StructField("rms", DoubleType()),
    ]
)


def audio_frame_features(media: DataFrame, frame: int = 64) -> DataFrame:
    """Frame-level audio features from PCM WAV payloads: fixed
    ``frame``-sample windows (last partial frame kept) → per-frame RMS
    energy and zero-crossing count — the front half of every classical
    audio featurizer (energy/VAD gates, ZCR voicing heuristics).

    Exactness contract: sums run in int64 over the integer samples and
    zero crossings count strict sign flips between CONSECUTIVE samples
    WITHIN a frame (int64 products), so everything except the final rms
    sqrt is integer arithmetic and an arithmetic oracle reproduces it
    bit-for-bit.  Row-independent mapInPandas, no shuffle; payload bytes
    never leave their row.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import numpy as np

        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media_bytes"]):
                samples, _rate = _decode_wav(blob)
                s = samples[:, 0].astype(np.int64)
                n = len(s)
                for f in range((n + frame - 1) // frame):
                    seg = s[f * frame : (f + 1) * frame]
                    m = len(seg)
                    sum_sq = int((seg * seg).sum())
                    zc = int(((seg[:-1] * seg[1:]) < 0).sum())
                    out.append(
                        (
                            int(doc_id),
                            f,
                            m,
                            sum_sq,
                            zc,
                            round(math.sqrt(sum_sq / m), 6) if m else 0.0,
                        )
                    )
            yield pd.DataFrame(out, columns=[f.name for f in _AUDIO_FRAME_OUT])

    return media.mapInPandas(kernel, _AUDIO_FRAME_OUT)


def attach_generated_audio(
    docs: DataFrame, sample_rate: int = 8000
) -> DataFrame:
    """Real mono 16-bit PCM WAV payloads (deterministic per-doc sawtooth:
    sample i of doc d is ((i*7 + d*13) mod 2001) − 1000) — the audio twin
    of `attach_generated_media`, decodable without any codec library."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = d % 480 + 16
                i = np.arange(n, dtype=np.int64)
                wave = ((i * 7 + d * 13) % 2001 - 1000).astype(np.int16)
                blob = encode_wav(wave, sample_rate)
                out.append(
                    (
                        doc_id,
                        blob,
                        {
                            "media_type": "audio",
                            "format": "wav",
                            "width": 0,
                            "height": 0,
                            "duration_ms": n * 1000 // sample_rate,
                            "n_bytes": len(blob),
                        },
                    )
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "media_bytes", "media_meta"]
            )

    return docs.select("doc_id").mapInPandas(kernel, _RESIZE_OUT)


def attach_generated_video(docs: DataFrame) -> DataFrame:
    """Deterministic raw-video payloads: doc d carries n = d%7+2 gray
    frames of w×h = (d%5+4)×(d%3+3) pixels concatenated frame-major, with
    pixel(f, r, c) = (d·31 + f·17 + r·5 + c·3) mod 251, at 1 frame per
    second (duration_ms = n·1000).  The video twin of
    `attach_generated_audio`: sliceable columnar (frame f at offset
    f·w·h) and arithmetically reproducible by a SQL oracle."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h, n = d % 5 + 4, d % 3 + 3, d % 7 + 2
                f = np.arange(n, dtype=np.int64)[:, None, None]
                r = np.arange(h, dtype=np.int64)[None, :, None]
                c = np.arange(w, dtype=np.int64)[None, None, :]
                vid = ((d * 31 + f * 17 + r * 5 + c * 3) % 251).astype(
                    np.uint8
                )
                blob = vid.tobytes()
                out.append(
                    (
                        doc_id,
                        blob,
                        {
                            "media_type": "video",
                            "format": "rawvideo",
                            "width": w,
                            "height": h,
                            "duration_ms": n * 1000,
                            "n_bytes": len(blob),
                        },
                    )
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "media_bytes", "media_meta"]
            )

    return docs.select("doc_id").mapInPandas(kernel, _RESIZE_OUT)


def attach_generated_media(docs: DataFrame, fmt: str = "ppm") -> DataFrame:
    """Real raster payloads (deterministic per-doc gradient images encoded
    as actual PPM/PGM bytes) — lets the decode path run WITHOUT the fake
    stand-in anywhere media libraries are unavailable."""
    if fmt not in ("ppm", "pgm", "jpeg", "png"):
        raise ValueError(
            "generated media supports fmt in {'ppm','pgm','jpeg','png'}"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                w = int(n_chars) % 31 + 2
                h = int(doc_id) % 23 + 2
                yy, xx = np.mgrid[0:h, 0:w]
                base = (xx * 7 + yy * 13 + int(doc_id)) % 256
                img = (
                    np.stack([base, (base + 85) % 256, (base + 170) % 256], -1)
                    if fmt in ("ppm", "jpeg", "png")
                    else base[:, :, None]
                ).astype(np.uint8)
                if fmt == "jpeg":
                    blob = _encode_jpeg(img)
                elif fmt == "png":
                    # cycle the row filter so every decoder unfilter path
                    # (None/Sub/Up/Average/Paeth) runs on real data
                    blob = _encode_png(img, filter_mode="cycle")
                else:
                    blob = encode_ppm(img)
                out.append(
                    (
                        doc_id,
                        blob,
                        {
                            "media_type": "image",
                            "format": fmt,
                            "width": w,
                            "height": h,
                            "duration_ms": 0,
                            "n_bytes": len(blob),
                        },
                    )
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "media_bytes", "media_meta"]
            )

    return docs.select("doc_id", "n_chars").mapInPandas(kernel, _RESIZE_OUT)


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
    media: DataFrame, every_ms: int = 1000, with_payload: bool = False
) -> DataFrame:
    """Expand each video row into (doc_id, frame_idx, frame_ts_ms) rows —
    the pre-decode fan-out, pure column arithmetic (no UDF).

    ``with_payload=True`` additionally emits each frame's bytes +
    per-frame metadata, for payloads laid out as concatenated raw pixel
    grids (frame f at byte offset f·width·height — the
    `attach_generated_video` layout): the slice is a columnar
    ``substring`` over the binary, so the fan-out stays NARROW — no
    shuffle, and the full-video blob is never duplicated through an
    exchange.  Real containerized codecs (mp4 …) cannot be sliced
    columnar; their frame extraction belongs inside the decode kernel.
    """
    n_frames = F.greatest(
        (F.col("media_meta.duration_ms") / every_ms).cast("int"), F.lit(1)
    )
    base = media.select(
        "doc_id",
        "media_bytes",
        "media_meta",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias(
            "frame_idx", "_"
        ),
    ).select(
        "doc_id",
        "media_bytes",
        "media_meta",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        (F.col("frame_idx") * every_ms).cast("bigint").alias("frame_ts_ms"),
    )
    if not with_payload:
        return base.select("doc_id", "frame_idx", "frame_ts_ms")
    frame_size = (
        F.col("media_meta.width").cast("bigint") * F.col("media_meta.height")
    )
    return base.select(
        "doc_id",
        "frame_idx",
        "frame_ts_ms",
        F.expr(
            # offset in BIGINT: at real scale (large frames x long videos)
            # frame_idx * frame_bytes overflows 32-bit int before substring;
            # width is widened BEFORE the multiply so width*height itself
            # can't overflow on gigapixel frames either
            "substring(media_bytes, "
            "cast(frame_idx as bigint)"
            " * (bigint(media_meta.width) * media_meta.height) + 1, "
            "int(bigint(media_meta.width) * media_meta.height))"
        ).alias("media_bytes"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("raw").alias("format"),
            F.col("media_meta.width").alias("width"),
            F.col("media_meta.height").alias("height"),
            F.lit(0).cast("bigint").alias("duration_ms"),
            frame_size.cast("bigint").alias("n_bytes"),
        ).alias("media_meta"),
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


_AHASH_OUT = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("ahash_hi", LongType()),
        StructField("ahash_lo", LongType()),
    ]
)


def image_ahash(media: DataFrame) -> DataFrame:
    """Perceptual average-hash (aHash) from REALLY-decoded pixels:
    (doc_id, ahash_hi, ahash_lo) — the 64-bit grid hash split into two
    32-bit halves so neither engine ever shifts into the sign bit.

    The classic image near-dup fingerprint (the LAION-style pipeline
    step): decode → channel-sum grayscale → 8×8 area buckets → one bit
    per bucket, set iff the bucket's mean exceeds the image mean.  Every
    comparison is EXACT integer arithmetic (``block_sum * total_count >
    total_sum * block_count`` — no float means), so the bits are
    bit-reproducible by any engine from the same pixels; lossless input
    formats (ppm/pgm/bmp/png) therefore admit an analytic SQL twin.
    Pixels land in bucket ``(x*8)//w, (y*8)//h``; images narrower than 8
    leave the unhit buckets at 0 on both sides.

    Row-independent Arrow kernel (mapInPandas) → map-side only; the
    downstream duplicate grouping shuffles 16 bytes per image, never
    pixels.  100 TB shape: decode cost dominates and scales with
    executors; the hash table is O(corpus) rows of fixed width.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for doc_id, blob, meta in zip(
                pdf["doc_id"], pdf["media_bytes"], pdf["media_meta"]
            ):
                dec = _REAL_DECODERS.get((meta["format"] or "").lower())
                if dec is None:
                    # a codec-library call for mp3/mp4-style formats
                    # belongs HERE (same guard as decode_media)
                    raise NotImplementedError(
                        f"no codec for format {meta['format']!r}; aHash "
                        "needs real pixels (ppm/pgm/bmp/jpeg/png)"
                    )
                img = dec(blob)
                if img.ndim == 2:
                    img = img[:, :, None]
                g = img.astype(np.int64).sum(axis=2)  # channel-sum gray
                h, w = g.shape
                bx = (np.arange(w, dtype=np.int64) * 8) // w
                by = (np.arange(h, dtype=np.int64) * 8) // h
                idx = (by[:, None] * 8 + bx[None, :]).ravel()
                bsum = np.zeros(64, np.int64)
                bcnt = np.zeros(64, np.int64)
                np.add.at(bsum, idx, g.ravel())
                np.add.at(bcnt, idx, 1)
                tsum = int(g.sum())
                tcnt = h * w
                bits = (bsum * tcnt) > (tsum * bcnt)  # empty bucket -> 0
                lo = int(sum(1 << i for i in range(32) if bits[i]))
                hi = int(sum(1 << (i - 32) for i in range(32, 64) if bits[i]))
                out.append((doc_id, hi, lo))
            yield pd.DataFrame(out, columns=["doc_id", "ahash_hi", "ahash_lo"])

    return media.mapInPandas(kernel, _AHASH_OUT)
