"""Multimodal binary-column plumbing tests (decode stubbed per brief)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from contentwise_impressions_spark.multimodal import (
    attach_fake_media,
    decode_media,
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
