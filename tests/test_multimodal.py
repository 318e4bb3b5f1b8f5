"""Multimodal binary-column plumbing tests.

PPM/PGM/BMP decode is REAL (pure-numpy codecs); compressed formats stay
stubbed behind allow_fake (no codec libraries in this container)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from contentwise_impressions_spark.multimodal import (
    attach_fake_media,
    attach_generated_media,
    decode_media,
    encode_ppm,
    extract_features,
    sample_frames,
)
from contentwise_impressions_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    m = attach_fake_media(docs).cache()
    m.count()
    return m


def test_media_schema(media):
    assert dict(media.dtypes)["media_bytes"] == "binary"
    meta_fields = {f.name for f in media.schema["media_meta"].dataType.fields}
    assert meta_fields == {
        "media_type", "format", "width", "height", "duration_ms", "n_bytes",
    }


def test_decode_stub_raises_without_fake(media):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, Py4JJavaError)):
        decode_media(media, allow_fake=False).collect()


def test_decode_fake_path(media):
    out = decode_media(media, allow_fake=True)
    rows = out.collect()
    assert len(rows) == media.count()
    assert all(0.0 <= r["mean_intensity"] <= 255.0 for r in rows)


def test_decode_real_ppm_roundtrip(spark, sf_dir):
    """Real pixel bytes through the real decoder — no fake stand-in."""
    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = attach_generated_media(docs, fmt="ppm")
    out = {r["doc_id"]: r for r in decode_media(media, allow_fake=False).collect()}
    # recompute expectations with the same deterministic generator
    for row in docs.select("doc_id", "n_chars").collect():
        d, n = int(row["doc_id"]), int(row["n_chars"])
        w, h = n % 31 + 2, d % 23 + 2
        yy, xx = np.mgrid[0:h, 0:w]
        base = (xx * 7 + yy * 13 + d) % 256
        img = np.stack([base, (base + 85) % 256, (base + 170) % 256], -1)
        got = out[d]
        assert (got["width"], got["height"]) == (w, h)
        assert abs(got["mean_intensity"] - img.mean()) < 1e-9


def test_decode_real_pgm(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(10)
    media = attach_generated_media(docs, fmt="pgm")
    rows = decode_media(media, allow_fake=False).collect()
    assert len(rows) == 10
    assert all(0.0 <= r["mean_intensity"] <= 255.0 for r in rows)


def test_encode_decode_ppm_pixels_exact():
    from contentwise_impressions_spark.multimodal.binary_ops import _decode_ppm

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (9, 13, 3), dtype=np.uint8)
    assert np.array_equal(_decode_ppm(encode_ppm(img)), img)
    gray = rng.integers(0, 256, (5, 4), dtype=np.uint8)
    assert np.array_equal(_decode_ppm(encode_ppm(gray))[:, :, 0], gray)


def test_decode_ppm_header_comments():
    from contentwise_impressions_spark.multimodal.binary_ops import _decode_ppm

    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    blob = b"P6 # a comment\n# another\n 2\t2 # dims\n255\n" + img.tobytes()
    assert np.array_equal(_decode_ppm(blob), img)


def _bmp24(img: np.ndarray) -> bytes:
    """Minimal BITMAPINFOHEADER 24bpp bottom-up encoder (test reference)."""
    h, w, _ = img.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    raster = b"".join(
        img[r, :, ::-1].tobytes() + b"\x00" * pad for r in range(h - 1, -1, -1)
    )
    off = 54
    size = off + len(raster)
    return (
        b"BM"
        + size.to_bytes(4, "little")
        + b"\x00" * 4
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(raster).to_bytes(4, "little")
        + b"\x00" * 16
        + raster
    )


def test_decode_bmp24_exact():
    from contentwise_impressions_spark.multimodal.binary_ops import _decode_bmp

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)  # w=5 forces padding
    assert np.array_equal(_decode_bmp(_bmp24(img)), img)


def test_decode_bmp_via_spark(spark, sf_dir):
    """BMP blobs built row-wise, decoded through the distributed kernel."""
    rng = np.random.default_rng(3)
    rows = []
    expect = {}
    for d in range(8):
        img = rng.integers(0, 256, (d % 4 + 2, d % 5 + 2, 3), dtype=np.uint8)
        expect[d] = img
        rows.append(
            (
                d,
                bytearray(_bmp24(img)),
                ("image", "bmp", img.shape[1], img.shape[0], 0, 0),
            )
        )
    from contentwise_impressions_spark.multimodal import MEDIA_SCHEMA
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("media_bytes", BinaryType()),
            StructField("media_meta", MEDIA_SCHEMA),
        ]
    )
    media = spark.createDataFrame(rows, schema)
    got = {r["doc_id"]: r for r in decode_media(media, allow_fake=False).collect()}
    for d, img in expect.items():
        assert (got[d]["width"], got[d]["height"]) == (img.shape[1], img.shape[0])
        assert abs(got[d]["mean_intensity"] - img.mean()) < 1e-9


def test_extract_features_shape(media):
    feats = extract_features(media, dim=16)
    row = feats.first()
    assert len(row["embedding"]) == 16
    assert abs(sum(row["embedding"]) - 1.0) < 1e-9
    assert feats.count() == media.count()


def test_sample_frames_fanout(spark, media):
    vids = media.withColumn(
        "media_meta",
        F.col("media_meta").withField("duration_ms", F.lit(3500).cast("bigint")),
    )
    frames = sample_frames(vids, every_ms=1000)
    per_doc = frames.groupBy("doc_id").count().agg(F.min("count"), F.max("count")).first()
    assert per_doc[0] == 3 and per_doc[1] == 3
    assert frames.filter(F.col("frame_ts_ms") == 2000).count() == media.count()


def test_resize_media_contract(spark, sf_dir):
    import pyspark.sql.functions as F

    from contentwise_impressions_spark.multimodal.binary_ops import (
        attach_fake_media,
        resize_media,
    )
    from contentwise_impressions_spark.sources.tables import load_table

    media = attach_fake_media(load_table(spark, sf_dir, "documents"))
    out = resize_media(media, width=8, height=6).cache()
    assert out.count() == media.count()
    bad = out.filter(
        (F.col("media_meta.width") != 8)
        | (F.col("media_meta.height") != 6)
        | (F.length("media_bytes") != 48)
    ).count()
    assert bad == 0
    # deterministic: same input → same bytes
    a = {r["doc_id"]: bytes(r["media_bytes"]) for r in out.limit(20).collect()}
    b = {
        r["doc_id"]: bytes(r["media_bytes"])
        for r in resize_media(media, 8, 6)
        .join(spark.createDataFrame([(i,) for i in a], "doc_id bigint"), "doc_id")
        .collect()
    }
    assert a == b


# ---------------------------------------------------------------------------
# audio: pure-numpy RIFF/WAVE PCM codec
# ---------------------------------------------------------------------------
def test_wav_roundtrip_mono16():
    from contentwise_impressions_spark.multimodal.binary_ops import (
        _decode_wav,
        encode_wav,
    )

    wave = ((np.arange(123, dtype=np.int64) * 37) % 4001 - 2000).astype(
        np.int16
    )
    samples, rate = _decode_wav(encode_wav(wave, 16000))
    assert rate == 16000
    assert samples.shape == (123, 1)
    np.testing.assert_array_equal(samples[:, 0], wave.astype(np.int32))


def test_wav_roundtrip_stereo16():
    from contentwise_impressions_spark.multimodal.binary_ops import (
        _decode_wav,
        encode_wav,
    )

    st = np.stack(
        [np.arange(50, dtype=np.int16), -np.arange(50, dtype=np.int16)], -1
    )
    samples, rate = _decode_wav(encode_wav(st, 44100))
    assert rate == 44100
    np.testing.assert_array_equal(samples, st.astype(np.int32))


def test_wav_8bit_and_extra_chunk():
    """8-bit PCM decodes centred at 0; unknown chunks before data skip."""
    from contentwise_impressions_spark.multimodal.binary_ops import _decode_wav

    raw = np.array([0, 128, 255, 200], dtype=np.uint8)
    fmt = (
        b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (1).to_bytes(2, "little")
        + (8000).to_bytes(4, "little")
        + (8000).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (8).to_bytes(2, "little")
    )
    junk = b"LIST" + (4).to_bytes(4, "little") + b"INFO"
    data = b"data" + len(raw).to_bytes(4, "little") + raw.tobytes()
    body = fmt + junk + data
    buf = b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body
    samples, rate = _decode_wav(buf)
    assert rate == 8000
    np.testing.assert_array_equal(samples[:, 0], [-128, 0, 127, 72])


def test_decode_audio_via_spark(spark, sf_dir):
    """Generated WAV bytes through the distributed decode — exact stats."""
    from contentwise_impressions_spark.multimodal import (
        attach_generated_audio,
        decode_audio,
    )

    docs = load_table(spark, sf_dir, "documents").limit(20)
    out = {
        r["doc_id"]: r
        for r in decode_audio(attach_generated_audio(docs)).collect()
    }
    for d, row in out.items():
        n = int(d) % 480 + 16
        i = np.arange(n, dtype=np.int64)
        v = (i * 7 + int(d) * 13) % 2001 - 1000
        assert row["n_samples"] == n
        assert row["sample_rate"] == 8000
        assert row["duration_ms"] == n * 1000 // 8000
        assert row["mean_amplitude"] == float(v.sum()) / n
        assert row["peak_amplitude"] == int(np.abs(v).max())
        assert abs(row["rms_amplitude"] - np.sqrt((v * v).sum() / n)) < 1e-12


def test_decode_audio_rejects_unknown_format(media):
    from contentwise_impressions_spark.multimodal import decode_audio

    with pytest.raises(Exception, match="NotImplementedError|no audio codec"):
        decode_audio(media.limit(1)).collect()


def test_decode_wav_truncated_chunk_raises_clear_error():
    """A chunk whose declared size overruns the buffer must raise a
    descriptive ValueError, not a numpy frombuffer error on a silently
    truncated body."""
    import numpy as np
    import pytest

    from contentwise_impressions_spark.multimodal.binary_ops import (
        _decode_wav,
        encode_wav,
    )

    good = encode_wav(np.arange(100, dtype=np.int16), 8000)
    cut = good[:-37]  # drop the tail of the 16-bit data chunk
    with pytest.raises(ValueError, match="truncated WAVE"):
        _decode_wav(cut)


def test_jpeg_roundtrip_444_gray_rst_and_420():
    """Pure-numpy baseline JPEG codec: encode → decode recovers the image
    within the flat-quant error bound across 4:4:4 / grayscale / restart
    markers; 4:2:0 keeps luma within the subsampling bound."""
    from contentwise_impressions_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    h, w = 37, 53  # non-multiple-of-8 on purpose
    yy, xx = np.mgrid[0:h, 0:w]
    img = (
        np.stack([(yy * 3 + xx * 2) % 256, (yy * 5) % 256, (xx * 7) % 256], -1)
        .astype(np.uint8)
    )
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == (h, w, 3) and out.dtype == np.uint8
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3

    gray = ((yy * 11 + xx * 13) % 256).astype(np.uint8)
    gout = decode_jpeg(encode_jpeg(gray))
    assert gout.shape == (h, w)
    assert np.abs(gout.astype(int) - gray.astype(int)).max() <= 3

    # restart markers must not perturb the pixels
    rout = decode_jpeg(encode_jpeg(img, restart_interval=3))
    assert np.array_equal(rout, out)

    # 4:2:0: chroma is subsampled (lossy), luma must stay tight
    sout = decode_jpeg(encode_jpeg(img, subsample=True, restart_interval=2))
    assert sout.shape == (h, w, 3)
    luma = lambda a: (  # noqa: E731
        0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    )
    assert np.abs(luma(sout.astype(float)) - luma(img.astype(float))).max() < 10


def test_jpeg_rejects_non_baseline_and_truncated():
    import pytest

    from contentwise_impressions_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01\x02")
    blob = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    # flip SOF0 into SOF2 (progressive) — must refuse, not mis-decode
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC2
    with pytest.raises(ValueError, match="coding process"):
        decode_jpeg(bytes(blob))


def test_decode_real_jpeg_via_spark(spark, sf_dir):
    """decode_media handles real JPEG payloads WITHOUT allow_fake: the
    mapInPandas kernel runs the pure-numpy baseline decoder end-to-end."""
    from contentwise_impressions_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    docs = load_table(spark, sf_dir, "documents").limit(40)
    media = attach_generated_media(docs, fmt="jpeg")
    out = {r["doc_id"]: r for r in decode_media(media, allow_fake=False).collect()}
    assert len(out) == 40
    for row in docs.select("doc_id", "n_chars").collect():
        d, n = int(row["doc_id"]), int(row["n_chars"])
        w, h = n % 31 + 2, d % 23 + 2
        yy, xx = np.mgrid[0:h, 0:w]
        base = (xx * 7 + yy * 13 + d) % 256
        img = np.stack(
            [base, (base + 85) % 256, (base + 170) % 256], -1
        ).astype(np.uint8)
        expected = decode_jpeg(encode_jpeg(img))  # driver-side twin
        got = out[d]
        assert (got["width"], got["height"]) == (w, h)
        assert abs(got["mean_intensity"] - expected.mean()) < 1e-9
        # and the decode is actually faithful, not just schema-correct
        assert abs(expected.astype(float).mean() - img.mean()) < 4.0


# ---------------------------------------------------------------------------
# PNG codec (multimodal/png.py)
# ---------------------------------------------------------------------------
def test_png_roundtrip_all_filters_and_shapes():
    import numpy as np

    from contentwise_impressions_spark.multimodal.png import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(11)
    for _ in range(40):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        gray = bool(rng.integers(0, 2))
        img = rng.integers(0, 256, (h, w) if gray else (h, w, 3)).astype(
            np.uint8
        )
        for mode in ("none", "cycle"):  # cycle hits Sub/Up/Average/Paeth
            out = decode_png(encode_png(img, filter_mode=mode))
            assert out.shape == img.shape
            assert (out == img).all()


def test_png_palette_and_alpha_decode():
    import struct
    import zlib

    import numpy as np

    from contentwise_impressions_spark.multimodal.png import (
        _SIG,
        _chunk,
        decode_png,
    )

    rng = np.random.default_rng(3)
    # palette (color type 3)
    pal = (np.arange(768) % 256).astype(np.uint8).reshape(256, 3)
    idx = rng.integers(0, 256, (5, 7)).astype(np.uint8)
    lines = b"".join(b"\x00" + idx[r].tobytes() for r in range(5))
    blob = (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 7, 5, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", pal.tobytes())
        + _chunk(b"IDAT", zlib.compress(lines))
        + _chunk(b"IEND", b"")
    )
    dec = decode_png(blob)
    assert dec.shape == (5, 7, 3) and (dec == pal[idx]).all()
    # RGBA (color type 6)
    rgba = rng.integers(0, 256, (4, 3, 4)).astype(np.uint8)
    lines = b"".join(b"\x00" + rgba[r].tobytes() for r in range(4))
    blob = (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 4, 8, 6, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(lines))
        + _chunk(b"IEND", b"")
    )
    assert (decode_png(blob) == rgba).all()


def test_png_rejects_corruption():
    import numpy as np
    import pytest

    from contentwise_impressions_spark.multimodal.png import (
        decode_png,
        encode_png,
    )

    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    blob = bytearray(encode_png(img))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\x00" + bytes(blob[1:]))
    blob[20] ^= 0xFF  # flip a byte inside IHDR → CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(blob))


def test_decode_real_png_via_spark(spark, sf_dir):
    import numpy as np

    from contentwise_impressions_spark.multimodal import (
        attach_generated_media,
        decode_media,
    )
    from contentwise_impressions_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(12)
    media = attach_generated_media(docs, fmt="png")
    out = {r["doc_id"]: r for r in decode_media(media, allow_fake=False).collect()}
    for row in docs.select("doc_id", "n_chars").collect():
        d, n_chars = row["doc_id"], row["n_chars"]
        w, h = n_chars % 31 + 2, d % 23 + 2
        yy, xx = np.mgrid[0:h, 0:w]
        base = (xx * 7 + yy * 13 + d) % 256
        expected = np.stack(
            [base, (base + 85) % 256, (base + 170) % 256], -1
        ).astype(np.uint8)
        got = out[d]
        assert (got["width"], got["height"]) == (w, h)
        # PNG is lossless — decoded mean equals the raster mean exactly
        assert abs(got["mean_intensity"] - expected.mean()) < 1e-9


def test_jpeg_multi_scan_and_noninterleaved_sampling():
    """T.81 coverage: per-component baseline scans (B.2.3), single-
    component non-interleaved MCU order under sampling factors > 1
    (A.2.2), and 0xFF fill bytes before markers (B.1.1.2)."""
    import numpy as np

    from contentwise_impressions_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(5)
    # separate per-component scans must roundtrip like interleaved
    for h, w in [(16, 16), (27, 32), (9, 21)]:
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, separate_scans=True))
        assert out.shape == img.shape
        assert np.abs(out.astype(float) - img.astype(float)).max() <= 4.0
        # 4:2:0 + separate scans (chroma is pooled → compare smoothly)
        yy, xx = np.mgrid[0:h, 0:w]
        base = (xx * 3 + yy * 5) % 256
        smooth = np.stack(
            [base, (base + 40) % 256, (base + 80) % 256], -1
        ).astype(np.uint8)
        out = decode_jpeg(
            encode_jpeg(smooth, subsample=True, separate_scans=True)
        )
        assert np.abs(out.astype(float) - smooth.astype(float)).mean() <= 20.0
    # single-component scan with sampling factors 2x2 is NON-interleaved:
    # patching the SOF of a 1x1 gray stream to 2x2 must still decode
    # cleanly (same entropy data, component raster block order)
    img = rng.integers(0, 256, (16, 32)).astype(np.uint8)
    blob = bytearray(encode_jpeg(img))
    sof_at = bytes(blob).find(b"\xff\xc0")
    blob[sof_at + 11] = 0x22  # h=v: 1x1 -> 2x2
    out = decode_jpeg(bytes(blob))
    assert out.shape == img.shape
    assert np.abs(out.astype(float) - img.astype(float)).max() <= 4.0
    # optional 0xFF fill bytes before a marker are legal
    filled = bytes(encode_jpeg(img)).replace(b"\xff\xc0", b"\xff\xff\xff\xc0", 1)
    assert (decode_jpeg(filled) == decode_jpeg(bytes(encode_jpeg(img)))).all()


def test_jpeg_separate_scans_ignores_restart_interval():
    # separate_scans writes no RSTn markers, so it must also suppress the
    # DRI segment — a DRI with no restarts is a self-inconsistent stream
    import numpy as np

    from contentwise_impressions_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (14, 19, 3)).astype(np.uint8)
    blob = encode_jpeg(img, restart_interval=2, separate_scans=True)
    assert b"\xff\xdd" not in blob.split(b"\xff\xda")[0]  # no DRI emitted
    out = decode_jpeg(blob)
    assert np.abs(out.astype(float) - img.astype(float)).max() <= 4.0


# ---------------------------------------------------------------------------
# perceptual average-hash (image near-dup fingerprint)
# ---------------------------------------------------------------------------
def _ahash_reference(img: np.ndarray) -> tuple[int, int]:
    """Independent pure-python aHash: per-pixel loop, exact integer rule."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, _ = img.shape
    bsum = [0] * 64
    bcnt = [0] * 64
    tsum = 0
    for y in range(h):
        for x in range(w):
            g = int(img[y, x].astype(np.int64).sum())
            i = (y * 8 // h) * 8 + (x * 8 // w)
            bsum[i] += g
            bcnt[i] += 1
            tsum += g
    bits = [1 if bsum[i] * (h * w) > tsum * bcnt[i] else 0 for i in range(64)]
    lo = sum(b << i for i, b in enumerate(bits[:32]))
    hi = sum(b << i for i, b in enumerate(bits[32:]))
    return hi, lo


def test_image_ahash_matches_reference_and_groups_duplicates(spark, sf_dir):
    """Spark kernel bits == the per-pixel reference on every image, and
    identical rasters (the generator repeats mod doc_id/n_chars cycles)
    land in the same duplicate group."""
    from contentwise_impressions_spark.multimodal.binary_ops import image_ahash

    docs = load_table(spark, sf_dir, "documents").limit(60)
    media = attach_generated_media(docs, fmt="png")
    got = {r["doc_id"]: (r["ahash_hi"], r["ahash_lo"])
           for r in image_ahash(media).collect()}
    assert len(got) == docs.count()
    for row in docs.select("doc_id", "n_chars").collect():
        d, n = int(row["doc_id"]), int(row["n_chars"])
        w, h = n % 31 + 2, d % 23 + 2
        yy, xx = np.mgrid[0:h, 0:w]
        base = (xx * 7 + yy * 13 + d) % 256
        img = np.stack([base, (base + 85) % 256, (base + 170) % 256],
                       -1).astype(np.uint8)
        assert got[d] == _ahash_reference(img), f"doc {d}"


def test_image_ahash_identical_pixels_identical_hash(spark):
    """Two docs whose generator rasters coincide (same w, h, doc_id mod
    256 — pixel values depend on doc_id only through mod 256) must
    collide; a third, different raster must not collide with them."""
    from contentwise_impressions_spark.multimodal.binary_ops import image_ahash

    # doc_ids 0 and 256*23 = 5888: same mod-256 AND same mod-23 -> same
    # raster for equal n_chars; doc 1 differs
    rows = [(0, 40), (5888, 40), (1, 40)]
    docs = spark.createDataFrame(rows, "doc_id long, n_chars long")
    media = attach_generated_media(docs, fmt="png")
    got = {r["doc_id"]: (r["ahash_hi"], r["ahash_lo"])
           for r in image_ahash(media).collect()}
    assert got[0] == got[5888]
    assert got[0] != got[1]


def test_sample_frames_with_payload_slices_exact_frames(spark, sf_dir):
    """with_payload=True must emit exactly the frame-f byte slice of the
    concatenated raw grid (offset f·w·h, length w·h) with per-frame
    metadata — verified against a numpy re-derivation of the generator."""
    import numpy as np

    from contentwise_impressions_spark.multimodal import (
        attach_generated_video,
        sample_frames,
    )
    from contentwise_impressions_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(40)
    vids = attach_generated_video(docs)
    frames = sample_frames(vids, every_ms=1000, with_payload=True)
    rows = frames.collect()
    n_docs = docs.count()
    assert len(rows) == sum(
        d % 7 + 2 for d in [r["doc_id"] for r in docs.collect()]
    )
    for r in rows[:200]:
        d, f = int(r["doc_id"]), int(r["frame_idx"])
        w, h = d % 5 + 4, d % 3 + 3
        rr = np.arange(h, dtype=np.int64)[:, None]
        cc = np.arange(w, dtype=np.int64)[None, :]
        expect = ((d * 31 + f * 17 + rr * 5 + cc * 3) % 251).astype(
            np.uint8
        )
        assert bytes(r["media_bytes"]) == expect.tobytes(), (d, f)
        assert r["media_meta"]["width"] == w
        assert r["media_meta"]["height"] == h
        assert r["media_meta"]["n_bytes"] == w * h
        assert r["frame_ts_ms"] == f * 1000
    assert n_docs == 40
