"""Training-data pipeline operators, batch 2: semi-structured columns,
deterministic hash splits, corpus n-gram statistics, hopping windows.

These extend the reference's surface (SURVEY.md §2.2/§2.8 analogs) with the
operations a large-scale training-data pipeline needs:

* JSON property extraction — the reference's tables are fully structured
  (Utils/dataset.py:91-147); industrial event logs carry a semi-structured
  payload column.  ``get_json_object`` stays inside whole-stage codegen (no
  Python UDF), and at 100 TB the extraction is a per-row map — no shuffle.
* Deterministic hash split — the reference splits with seeded randomness
  (Utils/dataset.py:322-325, seed 42); NumPy seeds don't reproduce across
  engines or re-runs on different partitionings.  A multiplicative-hash
  bucket of the key is the scale-safe idiom: stable under re-partitioning,
  no RNG state, no shuffle, and any engine reproduces membership exactly.
* Corpus bigrams — boilerplate/template detection over documents; the
  array-native formulation (slice+zip_with, then one explode) keeps the
  quadratic token fan-out inside the JVM.
* Hopping (sliding) windows — the overlap generalization of the tumbling
  window already in streaming/ingest.py; each event lands in exactly
  duration/slide windows, expressed with the built-in ``F.window``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import QuerySpec, register, utc


# ---------------------------------------------------------------------------
# JSON property extraction over the events payload column
# ---------------------------------------------------------------------------
def q_props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type stats of the JSON payload field ``$.k``.

    `get_json_object` is a JVM-side expression (codegen, no UDF); the
    aggregation is a partial-agg groupBy on a low-cardinality key — the
    map side reduces each partition to |event_type| rows before the
    (tiny) shuffle.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


register(
    QuerySpec(
        "props_json_stats",
        q_props_json_stats,
        """
        WITH ex AS (
            SELECT event_type,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(k) AS BIGINT) AS n_with_k,
               CAST(SUM(k) AS BIGINT) AS sum_k,
               MIN(k) AS min_k,
               MAX(k) AS max_k
        FROM ex GROUP BY 1
        """,
        doc="semi-structured JSON payload extraction (pipeline extension)",
    )
)


# ---------------------------------------------------------------------------
# deterministic multiplicative-hash split (reproducible train/val/test)
# ---------------------------------------------------------------------------
#: Knuth's multiplicative constant; bucket = key*A mod 1000 spreads
#: sequential ids uniformly.  Pure int64 arithmetic → every engine agrees.
_HASH_A = 2654435761
_HASH_MOD = 1000
_TRAIN_LT = 700  # buckets [0,700) → train
_VAL_LT = 800  # [700,800) → validation; rest → test


def q_hash_split_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """70/10/20 document split by hash bucket of the key — the scale-safe
    replacement for seeded randomSplit (Utils/dataset.py:322-325).

    Membership is a pure function of doc_id: stable under re-partitioning,
    re-runs, and engine changes (seeded RNG streams are not — SURVEY §4).
    The split is a narrow map + partial agg; NO shuffle of the data itself
    is ever needed to split at 100 TB (contrast randomSplit, which must
    replay the RNG in partition order).  sum_doc_id pins exact membership,
    not just sizes.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = (F.col("doc_id") * F.lit(_HASH_A)) % F.lit(_HASH_MOD)
    split = (
        F.when(bucket < _TRAIN_LT, F.lit("train"))
        .when(bucket < _VAL_LT, F.lit("validation"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(split.alias("split"), "doc_id")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("doc_id").alias("sum_doc_id"),
        )
    )


register(
    QuerySpec(
        "hash_split_sizes",
        q_hash_split_sizes,
        f"""
        WITH b AS (
            SELECT doc_id, (doc_id * {_HASH_A}) % {_HASH_MOD} AS bucket
            FROM documents
        )
        SELECT CASE WHEN bucket < {_TRAIN_LT} THEN 'train'
                    WHEN bucket < {_VAL_LT} THEN 'validation'
                    ELSE 'test' END AS split,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
        FROM b GROUP BY 1
        """,
        doc="deterministic hash-bucket train/val/test split "
        "(scale-safe analog of dataset.py:322-325 randomSplit)",
    )
)


# ---------------------------------------------------------------------------
# corpus bigram frequencies (boilerplate / template detection)
# ---------------------------------------------------------------------------
def q_corpus_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide bigram counts + document frequency.

    Bigram construction is array-native (slice + zip_with) so the token
    fan-out happens inside codegen; one explode then a single partial-agg
    groupBy.  At 100 TB the map-side combine collapses each partition to
    its local vocabulary before the shuffle — the shuffle volume is
    O(distinct bigrams), not O(tokens).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        docs.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(
            F.count("*").alias("cnt"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
    )


register(
    QuerySpec(
        "corpus_bigrams",
        q_corpus_bigrams,
        """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS w
            FROM documents
        ),
        b AS (
            SELECT doc_id,
                   UNNEST(list_transform(range(1, len(w)),
                                         i -> w[i] || ' ' || w[i + 1])) AS bigram
            FROM toks
        )
        SELECT bigram,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
        FROM b GROUP BY 1
        """,
        doc="corpus bigram frequency — boilerplate detection "
        "(pipeline extension)",
    )
)


# ---------------------------------------------------------------------------
# BPE-ish regex tokenization (token counting beyond whitespace)
# ---------------------------------------------------------------------------
#: GPT-style coarse lexer classes: alphabetic runs, digit runs, single
#: non-alphanumeric marks.  Same RE2-compatible syntax in Java and DuckDB.
_BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def q_doc_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts under a BPE-ish regex lexer.

    `regexp_extract_all` + `size` stay inside whole-stage codegen — the
    whole query is a narrow map + no shuffle (per-doc output), the shape
    you want when lexing 100 TB of text.
    """
    docs = load_table(spark, sf_dir, "documents")
    # idx=0 = whole match: Spark defaults to capture group 1, DuckDB to 0
    all_toks = F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), F.lit(0))
    alpha = F.regexp_extract_all(F.col("text"), F.lit(r"[a-z]+"), F.lit(0))
    return docs.select(
        "doc_id",
        F.size(all_toks).cast("bigint").alias("n_bpe_tokens"),
        F.size(alpha).cast("bigint").alias("n_alpha_tokens"),
        (F.size(all_toks) - F.size(alpha)).cast("bigint").alias("n_other_tokens"),
    )


register(
    QuerySpec(
        "doc_bpe_token_stats",
        q_doc_bpe_token_stats,
        f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS BIGINT)
                 AS n_bpe_tokens,
               CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT)
                 AS n_alpha_tokens,
               CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS BIGINT)
                 - CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT)
                 AS n_other_tokens
        FROM documents
        """,
        doc="BPE-ish regex token counting (pipeline extension)",
    )
)


# ---------------------------------------------------------------------------
# stratified deterministic sampling (training-mixture reweighting)
# ---------------------------------------------------------------------------
#: per-language keep-rate in percent — the mixture a curation pipeline
#: targets (upsample the head language, thin the tail).
_STRATA_PCT = {"en": 50, "es": 20, "fr": 20}
_DEFAULT_PCT = 10


def q_stratified_sample_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic sample: keep doc iff hash-bucket < rate.

    The deterministic twin of ``df.sampleBy`` (class-balanced mixture
    sampling): membership is a pure function of (doc_id), rates vary per
    stratum, nothing is shuffled, and any engine reproduces the sample
    exactly — at 100 TB the sample IS the dataset you ship, so
    reproducibility beats RNG.  sum_sampled_doc_id pins exact membership.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = (F.col("doc_id") * F.lit(_HASH_A)) % F.lit(100)
    rate = F.lit(_DEFAULT_PCT)
    for lang, pct in _STRATA_PCT.items():
        rate = F.when(F.col("lang") == lang, F.lit(pct)).otherwise(rate)
    kept = (bucket < rate).cast("bigint")
    return (
        docs.select("lang", "doc_id", kept.alias("kept"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("kept").alias("n_sampled"),
            F.sum(F.col("kept") * F.col("doc_id")).alias("sum_sampled_doc_id"),
        )
    )


def _strata_case_sql() -> str:
    whens = " ".join(
        f"WHEN lang = '{lang}' THEN {pct}" for lang, pct in _STRATA_PCT.items()
    )
    return f"CASE {whens} ELSE {_DEFAULT_PCT} END"


register(
    QuerySpec(
        "stratified_sample_sizes",
        q_stratified_sample_sizes,
        f"""
        WITH b AS (
            SELECT lang, doc_id,
                   CASE WHEN (doc_id * {_HASH_A}) % 100 < {_strata_case_sql()}
                        THEN 1 ELSE 0 END AS kept
            FROM documents
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(kept) AS BIGINT) AS n_sampled,
               CAST(SUM(kept * doc_id) AS BIGINT) AS sum_sampled_doc_id
        FROM b GROUP BY 1
        """,
        doc="stratified deterministic hash sampling — mixture reweighting "
        "(deterministic twin of sampleBy)",
    )
)


# ---------------------------------------------------------------------------
# weighted sampling without replacement (Efraimidis-Spirakis)
# ---------------------------------------------------------------------------
_WSAMPLE_K = 50


def q_weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample WITHOUT replacement (k=50, weight = n_chars): the
    Efraimidis-Spirakis one-pass formulation, P(doc in sample) ∝ weight.

    The A-ES key trick makes weighted sampling a TOP-K — key = ln(u)/w
    with u ∈ (0,1] (monotone twin of u^(1/w)); the k largest keys ARE the
    sample.  With u derived from the portable avalanche mix instead of an
    RNG the sample is a pure function of the data: reproducible under any
    partitioning, engine, or retry — at 100 TB the sample is the dataset
    you ship.  Plan shape: stateless map + TakeOrderedAndProject
    (per-partition heaps, no sort, no shuffle beyond k rows/partition);
    the rank window runs over the k survivors only.  Keys are rounded to
    9 digits (house convention) so a sub-ulp ln() difference cannot
    reorder the cross-engine tiebreak.

    Completes the sampling family: stratified (class-balanced),
    temperature (mixture), hash-split (partition), A-ES (weighted
    without replacement).
    """
    from pyspark.sql import Window

    from ..functions.hashing import avalanche

    docs = load_table(spark, sf_dir, "documents")
    u = (avalanche(F.col("doc_id")) + 1).cast("double") / F.lit(
        float(1 << 30)
    )
    skey = F.round(
        F.log(u) / F.greatest(F.col("n_chars"), F.lit(1)), 9
    )
    top = (
        docs.select(
            "doc_id",
            F.col("n_chars").cast("bigint").alias("weight"),
            skey.alias("skey"),
        )
        .orderBy(F.col("skey").desc(), "doc_id")
        .limit(_WSAMPLE_K)
    )
    w = Window.orderBy(F.col("skey").desc(), "doc_id")
    return top.select(
        "doc_id",
        "weight",
        F.row_number().over(w).cast("int").alias("sample_rank"),
    )


def _wsample_sql() -> str:
    from ..functions.hashing import avalanche_sql

    return f"""
        WITH k AS (
            SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
                   ROUND(LN(CAST({avalanche_sql("doc_id")} + 1 AS DOUBLE)
                            / {float(1 << 30)!r})
                         / GREATEST(n_chars, 1), 9) AS skey
            FROM documents
        )
        SELECT doc_id, weight,
               CAST(ROW_NUMBER() OVER (ORDER BY skey DESC, doc_id)
                    AS INT) AS sample_rank
        FROM k
        QUALIFY sample_rank <= {_WSAMPLE_K}
        """


register(
    QuerySpec(
        "weighted_sample_topk",
        q_weighted_sample_topk,
        _wsample_sql(),
        doc="Efraimidis-Spirakis weighted sampling without replacement as "
        "deterministic top-k (portable avalanche mix in place of RNG)",
    )
)


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering — multi-dimensional data layout
# ---------------------------------------------------------------------------
_ZBITS = 8  # 8 bits per dimension → 16-bit z-value, 256 "files" of 256 cells


def q_zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order file-assignment stats: per target file, the bounding box of
    both clustering dimensions (user bucket × hour bucket).

    The layout op behind multi-dimensional data skipping: sort events by the
    interleaved-bit (Morton) value of the two dimensions, cut into files,
    and every file's min/max on EACH dimension stays narrow — so a filter on
    either dimension prunes most files at scan time (parquet min/max stats).
    Bit interleaving is pure integer arithmetic (shift/and/sum of disjoint
    bits) inside codegen; the whole query is map + one partial-agg groupBy.
    At scale the write path is ``repartitionByRange(zvalue)`` +
    ``sortWithinPartitions(zvalue)`` — same expression, no extra shuffle
    beyond the one range partitioning.
    """
    utc(spark)
    ev = load_table(spark, sf_dir, "events")
    x = (F.col("user_id") * F.lit(_HASH_A)) % F.lit(1 << _ZBITS)
    y = (F.unix_timestamp("ts") / F.lit(3600)).cast("bigint") % F.lit(1 << _ZBITS)
    z = F.lit(0)
    for i in range(_ZBITS):
        z = z + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        z = z + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i)
    file_id = F.shiftright(z, _ZBITS)  # top 8 bits → 256 files
    return (
        ev.select(
            file_id.alias("file_id"), x.alias("xb"), y.alias("yb")
        )
        .groupBy("file_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.max("xb") - F.min("xb")).alias("x_span"),
            (F.max("yb") - F.min("yb")).alias("y_span"),
        )
    )


def _zvalue_sql() -> str:
    terms = []
    for i in range(_ZBITS):
        terms.append(f"((((xb >> {i}) & 1)) << {2 * i + 1})")
        terms.append(f"((((yb >> {i}) & 1)) << {2 * i})")
    return " + ".join(terms)


register(
    QuerySpec(
        "zorder_layout_stats",
        q_zorder_layout_stats,
        f"""
        WITH d AS (
            SELECT (user_id * {_HASH_A}) % {1 << _ZBITS} AS xb,
                   CAST(floor(epoch(ts) / 3600) AS BIGINT) % {1 << _ZBITS} AS yb
            FROM events
        ),
        z AS (SELECT xb, yb, ({_zvalue_sql()}) >> {_ZBITS} AS file_id FROM d)
        SELECT file_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(MAX(xb) - MIN(xb) AS BIGINT) AS x_span,
               CAST(MAX(yb) - MIN(yb) AS BIGINT) AS y_span
        FROM z GROUP BY 1
        """,
        doc="Z-order clustering layout stats — multi-dimensional data "
        "skipping (pipeline extension)",
    )
)


# ---------------------------------------------------------------------------
# hopping (sliding) window aggregation
# ---------------------------------------------------------------------------
def q_hopping_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hour windows sliding every hour — each event lands in exactly two.

    The built-in ``F.window(ts, duration, slide)`` is the batch twin of the
    Structured Streaming hopping window (streaming/ingest.py applies the
    tumbling special case); state per window is bounded by the watermark in
    the streaming path.  The expansion factor is duration/slide (here 2),
    applied before the partial agg, so shuffle volume stays
    O(windows × types).
    """
    utc(spark)
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "2 hours", "1 hour").alias("w"),
            "event_type",
        )
        .agg(F.count("*").alias("cnt"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


register(
    QuerySpec(
        "hopping_window_counts",
        q_hopping_window_counts,
        """
        SELECT CAST(date_trunc('hour', ts) - o.h * INTERVAL 1 HOUR
                    AS TIMESTAMP) AS window_start,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               SUM(value) AS sum_value
        FROM events CROSS JOIN (VALUES (0), (1)) o(h)
        GROUP BY 1, 2
        """,
        doc="hopping-window agg (sliding generalization of the tumbling "
        "window in streaming/ingest.py)",
    )
)


# ---------------------------------------------------------------------------
# multimodal decode: real raster bytes through the distributed kernel
# ---------------------------------------------------------------------------
def q_multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document image stats decoded from REAL PPM bytes.

    The media source generates a deterministic gradient image per doc,
    encodes it as actual netpbm P6 bytes, and the decode stage parses the
    header + raster with the pure-numpy codec (multimodal/binary_ops.py,
    no fake stand-in).  The oracle never sees the bytes — it recomputes
    the same pixel statistics arithmetically (pixel (x,y,c) has value
    (x*7 + y*13 + doc_id + c*85) mod 256), so the driver check certifies
    the full encode→Arrow→decode round trip.  Extension (the reference
    has no media surface); scale shape: row-independent mapInPandas, no
    shuffle, payload bytes never leave their row.
    """
    from ..multimodal import attach_generated_media, decode_media

    docs = load_table(spark, sf_dir, "documents")
    media = attach_generated_media(docs, fmt="ppm")
    return decode_media(media, allow_fake=False).select(
        "doc_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        "mean_intensity",
    )


register(
    QuerySpec(
        "multimodal_decode_stats",
        q_multimodal_decode_stats,
        """
        WITH px AS (
            SELECT doc_id,
                   CAST(n_chars % 31 + 2 AS INT) AS width,
                   CAST(doc_id % 23 + 2 AS INT) AS height
            FROM documents
        )
        SELECT p.doc_id, p.width, p.height,
               AVG(CAST((x.x * 7 + y.y * 13 + p.doc_id + c.c * 85) % 256
                        AS DOUBLE)) AS mean_intensity
        FROM px p,
             LATERAL (SELECT UNNEST(generate_series(0, p.width - 1)) AS x) x,
             LATERAL (SELECT UNNEST(generate_series(0, p.height - 1)) AS y) y,
             (SELECT UNNEST([0, 1, 2]) AS c) c
        GROUP BY 1, 2, 3
        """,
        doc="real PPM decode statistics (multimodal/binary_ops.py pure-"
        "numpy codec; oracle recomputes the deterministic raster)",
    )
)


def q_audio_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-clip waveform stats decoded from REAL PCM WAV bytes.

    The audio source generates a deterministic mono 16-bit sawtooth per
    doc (sample i of doc d = (i*7 + d*13) mod 2001 − 1000, n = d%480+16
    samples at 8 kHz), encodes it as an actual RIFF/WAVE file, and the
    decode stage walks the chunk list + parses PCM with the pure-numpy
    codec (multimodal/binary_ops.py `_decode_wav`).  The oracle never
    sees the bytes — it recomputes the same statistics arithmetically,
    certifying the full encode→Arrow→decode round trip.  Sums run in
    int64 over integer samples, so mean/RMS are exact ratios in both
    engines.  Extension (the reference has no media surface); scale
    shape: row-independent mapInPandas, no shuffle.
    """
    from ..multimodal import attach_generated_audio, decode_audio

    docs = load_table(spark, sf_dir, "documents")
    return decode_audio(attach_generated_audio(docs, sample_rate=8000))


register(
    QuerySpec(
        "audio_decode_stats",
        q_audio_decode_stats,
        """
        WITH au AS (
            SELECT doc_id, CAST(doc_id % 480 + 16 AS BIGINT) AS n_samples
            FROM documents
        ),
        s AS (
            SELECT a.doc_id, a.n_samples,
                   (i.i * 7 + a.doc_id * 13) % 2001 - 1000 AS v
            FROM au a,
                 LATERAL (SELECT UNNEST(generate_series(
                     0, CAST(a.n_samples - 1 AS INT))) AS i) i
        )
        SELECT doc_id,
               n_samples,
               CAST(8000 AS INT) AS sample_rate,
               CAST(n_samples * 1000 // 8000 AS BIGINT) AS duration_ms,
               CAST(SUM(v) AS DOUBLE) / n_samples AS mean_amplitude,
               SQRT(CAST(SUM(v * v) AS DOUBLE) / n_samples)
                   AS rms_amplitude,
               CAST(MAX(ABS(v)) AS BIGINT) AS peak_amplitude
        FROM s
        GROUP BY doc_id, n_samples
        """,
        doc="real PCM WAV decode statistics (multimodal/binary_ops.py "
        "pure-numpy RIFF/WAVE codec; oracle recomputes the deterministic "
        "sawtooth)",
    )
)


# ---------------------------------------------------------------------------
# compressed-codec decode certification (JPEG lossy bound / PNG lossless)
# ---------------------------------------------------------------------------
def _decode_certification(
    spark: SparkSession, sf_dir: str, fmt: str, bound: float
) -> DataFrame:
    """Shared certification pipeline for the real image codecs.

    The media source encodes the deterministic gradient raster (pixel
    (x, y, c) = (x*7 + y*13 + doc_id + c*85) mod 256) as real `fmt`
    bytes, the decode stage runs the pure-numpy codec (no fake
    stand-in), and `decode_faithful` = |decoded mean − arithmetic raster
    mean| < `bound`, where Spark recomputes the arithmetic mean from the
    same formula the oracle uses — a broken decoder flips the flag and
    the driver's hash check goes red.  Scale shape: row-independent
    mapInPandas decode, one join on doc_id, no payload shuffle.
    """
    from ..multimodal import attach_generated_media, decode_media

    docs = load_table(spark, sf_dir, "documents")
    # the docs table is a single parquet split at test scale — spread the
    # CPU-bound encode+decode kernel across every core (measured 29 s
    # serial vs ~2 s repartitioned at sf0.1)
    par = spark.sparkContext.defaultParallelism
    media = attach_generated_media(docs.repartition(par), fmt=fmt)
    decoded = decode_media(media, allow_fake=False)
    dims = docs.select(
        "doc_id",
        (F.col("n_chars") % 31 + 2).cast("int").alias("w"),
        (F.col("doc_id") % 23 + 2).cast("int").alias("h"),
    )
    # arithmetic raster mean from the generator formula (SQL-expressible)
    arith = (
        dims.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.col("w") - 1)).alias("x"),
            F.col("h"),
        )
        .select(
            "doc_id",
            "x",
            F.explode(F.sequence(F.lit(0), F.col("h") - 1)).alias("y"),
        )
        .select(
            "doc_id",
            "x",
            "y",
            F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("c"),
        )
        .groupBy("doc_id")
        .agg(
            F.avg(
                F.pmod(
                    F.col("x") * 7
                    + F.col("y") * 13
                    + F.col("doc_id")
                    + F.col("c") * 85,
                    F.lit(256),
                ).cast("double")
            ).alias("arith_mean")
        )
    )
    return decoded.join(arith, "doc_id").select(
        "doc_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        (
            F.abs(F.col("mean_intensity") - F.col("arith_mean")) < bound
        ).alias("decode_faithful"),
    )


def q_jpeg_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real baseline-JPEG decode certification (multimodal/jpeg.py: marker
    walk, Huffman entropy decode, batched IDCT).  DCT quantization is
    lossy, so the faithfulness bound is 2.0 (measured roundtrip max 0.37
    — a 5x margin)."""
    return _decode_certification(spark, sf_dir, "jpeg", 2.0)


register(
    QuerySpec(
        "jpeg_decode_stats",
        q_jpeg_decode_stats,
        """
        SELECT doc_id,
               CAST(n_chars % 31 + 2 AS INT) AS width,
               CAST(doc_id % 23 + 2 AS INT) AS height,
               TRUE AS decode_faithful
        FROM documents
        """,
        doc="real baseline-JPEG decode certification (multimodal/jpeg.py "
        "pure-numpy codec; Spark recomputes the arithmetic raster mean and "
        "flags any decode drifting past the quantization bound — the "
        "oracle's constant TRUE column goes red if the decoder breaks)",
    )
)


# ---------------------------------------------------------------------------
# token-budget mixture sampling (training-data mixing)
# ---------------------------------------------------------------------------
#: target mixture shares (percent of the token budget per language) and
#: the global budget as a percent of corpus tokens — Pile/DoReMi-style
#: domain reweighting constants, shared with the SQL twin
_MIX_PCT = {"en": 50, "zh": 20, "de": 15, "fr": 10, "es": 5}
_MIX_BUDGET_PCT = 40


def q_token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic token-budget mixture sample: per-language sampling
    rates sized so kept tokens hit a weighted share of a global token
    budget (the Pile / DoReMi-style domain-reweighting pass).

    budget = 40% of corpus tokens; language b's target is its mixture
    percent of that budget; rate_b = min(1, target_b / tokens_b); a doc
    is kept iff its multiplicative-hash bucket clears the rate — pure
    function of doc_id, so the sample is byte-reproducible in any engine
    (at 100 TB the sample IS the shipped dataset).  One aggregation for
    per-language token totals (broadcast back — dimension-sized), one
    stateless keep-flag pass, one rollup.  Expected-vs-realized share
    lands in `realized_budget_share` (hash sampling concentrates near the
    rate; exactness is not the contract, determinism is).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.size(
            F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        ).cast("bigint").alias("n_tokens"),
    )
    per_lang = toks.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").alias("tokens_total"),
    )
    total = per_lang.agg(
        F.sum("tokens_total").cast("bigint").alias("corpus_tokens")
    )
    mix = F.lit(0)
    for lang, pct in _MIX_PCT.items():
        mix = F.when(F.col("lang") == lang, F.lit(pct)).otherwise(mix)
    rated = (
        per_lang.crossJoin(F.broadcast(total))
        .withColumn(
            # FLOOR before the cast: DuckDB's double->BIGINT cast rounds
            # while Spark's truncates (the doc_packing_stats lesson)
            "target_tokens",
            F.floor(F.col("corpus_tokens") * _MIX_BUDGET_PCT * mix / 10000)
            .cast("bigint"),
        )
        .withColumn(
            "rate",
            F.least(
                F.lit(1.0),
                F.col("target_tokens").cast("double")
                / F.col("tokens_total").cast("double"),
            ),
        )
    )
    kept = (
        toks.join(F.broadcast(rated.select("lang", "rate")), "lang")
        .withColumn(
            "kept",
            (
                (F.col("doc_id") * F.lit(_HASH_A)) % F.lit(1000000)
                < F.col("rate") * 1000000.0
            ).cast("bigint"),
        )
        .groupBy("lang")
        .agg(
            F.sum("kept").alias("n_docs_kept"),
            F.sum(F.col("kept") * F.col("n_tokens")).alias("tokens_kept"),
        )
    )
    return (
        rated.join(kept, "lang")
        .select(
            "lang",
            "n_docs",
            "tokens_total",
            "target_tokens",
            "n_docs_kept",
            "tokens_kept",
            (
                F.col("tokens_kept").cast("double")
                / (F.col("corpus_tokens") * _MIX_BUDGET_PCT / 100.0)
            ).alias("realized_budget_share"),
        )
    )


def _mix_case_sql() -> str:
    whens = " ".join(
        f"WHEN lang = '{lang}' THEN {pct}" for lang, pct in _MIX_PCT.items()
    )
    return f"CASE {whens} ELSE 0 END"


register(
    QuerySpec(
        "token_budget_mixture",
        q_token_budget_mixture,
        f"""
        WITH toks AS (
            SELECT doc_id, lang,
                   CAST(len(list_filter(string_split(text, ' '),
                                        t -> t <> '')) AS BIGINT) AS n_tokens
            FROM documents
        ),
        per_lang AS (
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS tokens_total
            FROM toks GROUP BY 1
        ),
        tot AS (
            SELECT CAST(SUM(tokens_total) AS BIGINT) AS corpus_tokens
            FROM per_lang
        ),
        rated AS (
            SELECT p.*, t.corpus_tokens,
                   CAST(FLOOR(t.corpus_tokens * {_MIX_BUDGET_PCT}
                        * ({_mix_case_sql()}) / 10000) AS BIGINT)
                       AS target_tokens
            FROM per_lang p CROSS JOIN tot t
        ),
        rated2 AS (
            SELECT *,
                   LEAST(1.0, CAST(target_tokens AS DOUBLE)
                              / CAST(tokens_total AS DOUBLE)) AS rate
            FROM rated
        ),
        kept AS (
            SELECT t.lang,
                   CAST(SUM(CASE WHEN (t.doc_id * {_HASH_A}) % 1000000
                                      < r.rate * 1000000.0
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_docs_kept,
                   CAST(SUM(CASE WHEN (t.doc_id * {_HASH_A}) % 1000000
                                      < r.rate * 1000000.0
                                 THEN t.n_tokens ELSE 0 END) AS BIGINT)
                       AS tokens_kept
            FROM toks t JOIN rated2 r USING (lang)
            GROUP BY 1
        )
        SELECT r.lang, r.n_docs, r.tokens_total, r.target_tokens,
               k.n_docs_kept, k.tokens_kept,
               CAST(k.tokens_kept AS DOUBLE)
                   / (r.corpus_tokens * {_MIX_BUDGET_PCT} / 100.0)
                   AS realized_budget_share
        FROM rated2 r JOIN kept k USING (lang)
        """,
        doc="deterministic token-budget mixture sampling (Pile/DoReMi-"
        "style domain reweighting; byte-reproducible hash sample)",
    )
)


# ---------------------------------------------------------------------------
# RAG-prep passage chunking: sliding token windows with overlap
# ---------------------------------------------------------------------------
_CHUNK_W = 32  # window length (tokens)
_CHUNK_S = 24  # stride (tokens) → 8-token overlap between neighbors


def q_passage_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per retrieval passage: sliding W=32-token windows at
    stride 24 (8-token overlap) with the chunk TEXT rebuilt — the
    chunk-for-embedding pass of a RAG indexing pipeline.

    n_chunks = 1 + ceil(max(n − W, 0) / S); chunk k covers tokens
    [k·S + 1, min(k·S + W, n)] (1-based, inclusive), so every token is
    covered, neighbors overlap by W − S, and only the final chunk may be
    short.  Scale shape: pure codegen — split/slice/array_join + one
    explode; NO shuffle, NO UDF; embarrassingly parallel at any corpus
    size (the chunker is the map stage feeding the ANN index builds).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    n = F.size("toks").cast("bigint")
    n_chunks = 1 + F.floor(
        (F.greatest(n - _CHUNK_W, F.lit(0)) + _CHUNK_S - 1) / _CHUNK_S
    ).cast("bigint")
    base = docs.select("doc_id", toks.alias("toks")).filter(
        F.size("toks") > 0
    )
    start = (F.col("chunk_idx") * _CHUNK_S + 1).cast("int")
    clen = F.least(F.lit(_CHUNK_W).cast("bigint"), n - (start - 1)).cast(
        "int"
    )
    return (
        base.withColumn(
            "chunk_idx",
            F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            start.cast("bigint").alias("start_tok"),
            clen.cast("bigint").alias("n_chunk_tokens"),
            F.array_join(F.slice("toks", start, clen), " ").alias(
                "chunk_text"
            ),
        )
    )


register(
    QuerySpec(
        "passage_chunks",
        q_passage_chunks,
        f"""
        WITH base AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS toks
            FROM documents
        ),
        sized AS (
            SELECT doc_id, toks, len(toks) AS n,
                   1 + CAST(floor((greatest(len(toks) - {_CHUNK_W}, 0)
                                   + {_CHUNK_S} - 1) / {_CHUNK_S}) AS BIGINT)
                       AS n_chunks
            FROM base WHERE len(toks) > 0
        )
        SELECT doc_id,
               CAST(i.i AS BIGINT) AS chunk_idx,
               CAST(i.i * {_CHUNK_S} + 1 AS BIGINT) AS start_tok,
               CAST(least({_CHUNK_W}, n - i.i * {_CHUNK_S}) AS BIGINT)
                   AS n_chunk_tokens,
               array_to_string(
                   toks[(i.i * {_CHUNK_S} + 1):
                        (i.i * {_CHUNK_S}
                         + least({_CHUNK_W}, n - i.i * {_CHUNK_S}))],
                   ' ') AS chunk_text
        FROM sized, range(0, 100000) i(i)
        WHERE i.i < n_chunks
        """,
        doc="RAG passage chunking: 32-token windows, stride 24, rebuilt "
        "chunk text (codegen slice/array_join, shuffle-free)",
    )
)


# ---------------------------------------------------------------------------
# PNG decode certification (lossless)
# ---------------------------------------------------------------------------
def q_png_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real PNG decode certification (multimodal/png.py: CRC-validated
    chunk walk, zlib inflate, all five scanline unfilters — the encoder
    CYCLES the row filter so every unfilter path runs).  PNG is
    LOSSLESS, so the faithfulness bound is exact: 1e-9."""
    return _decode_certification(spark, sf_dir, "png", 1e-9)


register(
    QuerySpec(
        "png_decode_stats",
        q_png_decode_stats,
        """
        SELECT doc_id,
               CAST(n_chars % 31 + 2 AS INT) AS width,
               CAST(doc_id % 23 + 2 AS INT) AS height,
               TRUE AS decode_faithful
        FROM documents
        """,
        doc="real PNG decode certification (multimodal/png.py pure-"
        "python/numpy codec: CRC chunk walk, zlib inflate, all five "
        "unfilters exercised via cycling encoder; LOSSLESS 1e-9 bound "
        "vs the oracle's arithmetic raster mean)",
    )
)


# ---------------------------------------------------------------------------
# image near-dup: perceptual average-hash over really-decoded pixels
# ---------------------------------------------------------------------------
def q_image_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-level near-dup grouping by perceptual average-hash: every
    image fingerprinted from its REALLY-decoded PNG pixels (CRC chunk
    walk → inflate → unfilter → aHash bits), then grouped by the 64-bit
    hash into duplicate classes (size + canonical min-id).

    The multimodal counterpart of MinHash text dedup (the LAION-style
    image-dedup pass).  aHash's integer-exact bit rule
    (multimodal/binary_ops.image_ahash) + a lossless codec make the
    fingerprint engine-reproducible, so the SQL twin re-derives the bits
    analytically from the generator raster — the oracle goes red if any
    stage of decode or hashing drifts by one bit.  Decode+hash is a
    row-independent Arrow kernel (map-side, scales with executors); the
    grouping shuffles 16 bytes/image on the hash key — at 100 TB the
    pixels never cross the wire.
    """
    from pyspark.sql import Window

    from ..multimodal.binary_ops import attach_generated_media, image_ahash

    docs = load_table(spark, sf_dir, "documents")
    # single parquet split at test scale — spread the CPU-bound
    # encode+decode kernel across every core (same shape as
    # _decode_certification above)
    par = spark.sparkContext.defaultParallelism
    media = attach_generated_media(docs.repartition(par), fmt="png")
    hashed = image_ahash(media)
    w = Window.partitionBy("ahash_hi", "ahash_lo")
    return hashed.select(
        "doc_id",
        "ahash_hi",
        "ahash_lo",
        F.count("*").over(w).cast("bigint").alias("group_size"),
        F.min("doc_id").over(w).alias("canonical_id"),
    )


register(
    QuerySpec(
        "image_ahash_dedup",
        q_image_ahash_dedup,
        """
        WITH dims AS (
            SELECT doc_id, CAST(n_chars % 31 + 2 AS BIGINT) AS w,
                   CAST(doc_id % 23 + 2 AS BIGINT) AS h
            FROM documents
        ),
        px AS (
            SELECT doc_id, w, h, x.i AS x, y.i AS y,
                   (x.i * 7 + y.i * 13 + doc_id) % 256
                 + (x.i * 7 + y.i * 13 + doc_id + 85) % 256
                 + (x.i * 7 + y.i * 13 + doc_id + 170) % 256 AS g
            FROM dims, range(0, 32) x(i), range(0, 24) y(i)
            WHERE x.i < w AND y.i < h
        ),
        blocks AS (
            SELECT doc_id, (y * 8) // h AS by, (x * 8) // w AS bx,
                   SUM(g) AS bs, COUNT(*) AS bc
            FROM px GROUP BY 1, 2, 3
        ),
        tot AS (SELECT doc_id, SUM(g) AS ts, COUNT(*) AS tc FROM px GROUP BY 1),
        bits AS (
            SELECT b.doc_id, b.by * 8 + b.bx AS i,
                   CASE WHEN b.bs * t.tc > t.ts * b.bc THEN 1 ELSE 0 END AS bit
            FROM blocks b JOIN tot t USING (doc_id)
        ),
        hashes AS (
            SELECT doc_id,
                   CAST(SUM(CASE WHEN i >= 32 THEN bit::BIGINT << (i - 32)
                                 ELSE 0 END) AS BIGINT) AS ahash_hi,
                   CAST(SUM(CASE WHEN i < 32 THEN bit::BIGINT << i
                                 ELSE 0 END) AS BIGINT) AS ahash_lo
            FROM bits GROUP BY 1
        )
        SELECT doc_id, ahash_hi, ahash_lo,
               CAST(COUNT(*) OVER (PARTITION BY ahash_hi, ahash_lo)
                    AS BIGINT) AS group_size,
               MIN(doc_id) OVER (PARTITION BY ahash_hi, ahash_lo)
                    AS canonical_id
        FROM hashes
        """,
        doc="perceptual-hash image dedup: aHash bits from really-decoded "
        "PNG pixels (integer-exact threshold), duplicate classes by "
        "64-bit fingerprint — multimodal twin of MinHash text dedup",
    )
)


# ---------------------------------------------------------------------------
# training-shard manifest: deterministic export sharding
# ---------------------------------------------------------------------------
_N_SHARDS = 16
#: order-key / shard-hash arithmetic: (doc_id * A) mod P is a PERMUTATION
#: of [0, P) because P = 1e9+7 is prime and A is not a multiple of P —
#: which requires doc_id < P (beyond that, order keys collide; at larger
#: id spaces swap in xxhash64).  Shards take a SECOND multiply-mod round
#: before the % 16: one round is not enough for small structured ids
#: (doc_id·A < P never wraps, so low bits stay structured — doc_id·A
#: % 16 with A odd degenerates to doc_id % 16 and all-even ids would
#: leave half the shards empty); after the second round every tested id
#: stride fills all 16 shards near-uniformly (tests/test_hard_pairs.py).
_ORDER_A = 1_000_003
_ORDER_A2 = 1_000_033
_HASH_MOD_BIG = 1_000_000_007


def q_training_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard manifest for the training-export step: docs assigned to
    one of 16 shards by a double multiply-mod hash (see the _ORDER_A
    note: one scramble round does not wrap for small structured ids, so
    the second round is what actually mixes the low bits), with
    doc/token totals and an order-key span — the webdataset/TFRecord shard-prep pass that turns a cleaned
    corpus into shuffled, evenly-sized training files.

    Determinism does the shuffling: shard = hash(doc_id) bucket, and the
    WITHIN-shard read order is the multiplicative order key (a fixed
    pseudo-random permutation of doc ids), so any engine reproduces the
    exact same shard contents in the exact same order with zero RNG
    state and zero data shuffle — assignment is a narrow map, the rollup
    one partial-agg groupBy (the same scale logic as hash_split_sizes).
    min/max order keys pin the permutation, sum_doc_id exact membership.
    """
    docs = load_table(spark, sf_dir, "documents")
    okey = (F.col("doc_id") * _ORDER_A) % _HASH_MOD_BIG
    n_toks = F.size(
        F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    ).cast("bigint")
    per_doc = docs.select(
        F.pmod((okey * _ORDER_A2) % _HASH_MOD_BIG, F.lit(_N_SHARDS)).alias(
            "shard"
        ),
        "doc_id",
        okey.alias("okey"),
        n_toks.alias("n_toks"),
    )
    return per_doc.groupBy("shard").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("n_tokens"),
        F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
        F.min("okey").cast("bigint").alias("min_order_key"),
        F.max("okey").cast("bigint").alias("max_order_key"),
    )



register(
    QuerySpec(
        "training_shard_manifest",
        q_training_shard_manifest,
        f"""
        WITH per_doc AS (
            SELECT ((((doc_id * {_ORDER_A}) % {_HASH_MOD_BIG})
                        * {_ORDER_A2}) % {_HASH_MOD_BIG})
                       % {_N_SHARDS} AS shard,
                   doc_id,
                   (doc_id * {_ORDER_A}) % {_HASH_MOD_BIG} AS okey,
                   len(list_filter(string_split(text, ' '), t -> t <> ''))
                       AS n_toks
            FROM documents
        )
        SELECT shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
               CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
               CAST(MIN(okey) AS BIGINT) AS min_order_key,
               CAST(MAX(okey) AS BIGINT) AS max_order_key
        FROM per_doc GROUP BY 1
        """,
        doc="deterministic training-export sharding: hash shard "
        "assignment + multiplicative order-key permutation (narrow map "
        "+ one partial-agg rollup; no shuffle of the data itself)",
    )
)


# ---------------------------------------------------------------------------
# video frame pipeline: sample → slice → resize → per-frame stats
# (the frame-sampling + resize plumbing as ONE registered, oracled path)
# ---------------------------------------------------------------------------
def q_video_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame mean intensity of every sampled frame of every document's
    deterministic raw video, after nearest-neighbor resize to 8×6.

    The full video path in one plan: `attach_generated_video` (doc d =
    d%7+2 gray frames of (d%5+4)×(d%3+3) px, pixel = (d·31+f·17+r·5+c·3)
    mod 251) → `sample_frames(with_payload=True)` (posexplode fan-out +
    COLUMNAR substring slice — narrow, the full-video blob never crosses
    an exchange) → `resize_media` (numpy nearest-neighbor over the byte
    grid, Arrow-batched) → `decode_media` byte statistics.  The oracle
    recomputes the resample arithmetically (src_row = r·h div 6, src_col
    = c·w div 8) — integer pixel sums, so the mean is an exact ratio in
    both engines.  Scale shape: every stage is row-independent
    mapInPandas or narrow column ops; the only exchange is the
    presentation sort.
    """
    from ..multimodal import (
        attach_generated_video,
        decode_media,
        resize_media,
        sample_frames,
    )

    docs = load_table(spark, sf_dir, "documents")
    vids = attach_generated_video(docs)
    frames = sample_frames(vids, every_ms=1000, with_payload=True)
    # frame identity rides the doc_id through the (doc_id, bytes, meta)
    # operator contract: sid = doc_id·64 + frame_idx (n_frames ≤ 8 < 64)
    keyed = frames.select(
        (F.col("doc_id") * 64 + F.col("frame_idx")).alias("doc_id"),
        "media_bytes",
        "media_meta",
    )
    stats = decode_media(resize_media(keyed, width=8, height=6), allow_fake=True)
    return stats.select(
        F.expr("CAST(doc_id DIV 64 AS BIGINT)").alias("doc_id"),
        (F.col("doc_id") % 64).cast("int").alias("frame_idx"),
        ((F.col("doc_id") % 64) * 1000).cast("bigint").alias("frame_ts_ms"),
        "width",
        "height",
        "mean_intensity",
    ).orderBy("doc_id", "frame_idx")


register(
    QuerySpec(
        "video_frame_stats",
        q_video_frame_stats,
        """
        WITH v AS (
            SELECT doc_id,
                   doc_id % 5 + 4 AS w,
                   doc_id % 3 + 3 AS h,
                   doc_id % 7 + 2 AS nf
            FROM documents
        ),
        fr AS (
            SELECT v.*, f.f
            FROM v, LATERAL (SELECT UNNEST(generate_series(
                0, CAST(v.nf - 1 AS INT))) AS f) f
        ),
        px AS (
            SELECT doc_id, f,
                   (doc_id * 31 + f * 17
                    + ((r.r * h) // 6) * 5
                    + ((c.c * w) // 8) * 3) % 251 AS val
            FROM fr,
                 LATERAL (SELECT UNNEST(generate_series(0, 5)) AS r) r,
                 LATERAL (SELECT UNNEST(generate_series(0, 7)) AS c) c
        )
        SELECT doc_id,
               CAST(f AS INT) AS frame_idx,
               CAST(f * 1000 AS BIGINT) AS frame_ts_ms,
               CAST(8 AS INT) AS width,
               CAST(6 AS INT) AS height,
               CAST(SUM(val) AS DOUBLE) / 48 AS mean_intensity
        FROM px
        GROUP BY doc_id, f
        ORDER BY doc_id, frame_idx
        """,
        doc="video frame pipeline: posexplode frame fan-out + columnar "
        "frame slice + numpy nearest-neighbor resize + byte statistics, "
        "oracle recomputes the resample arithmetically",
    )
)


# ---------------------------------------------------------------------------
# media feature extraction: byte-histogram embedding per document video
# (the encoder stand-in as a first-class, oracled query — contract:
# Arrow batches in, (id, array<double>) out, one row per input)
# ---------------------------------------------------------------------------
def q_media_embedding_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-dim normalized byte-histogram 'embedding' of each document's
    raw video payload (`extract_features` over `attach_generated_video`).

    A real vision encoder is a model forward pass the container lacks;
    the byte histogram keeps the exact production contract (mapInPandas
    kernel, fixed-dim array<double> out) while staying arithmetically
    reproducible: the payload is the headerless pixel grid, so the
    oracle rebuilds the histogram from the pixel formula with dense
    bins (val div 16, zeros included) and the normalized ratios are
    exact double divisions of identical integers.  Scale shape:
    row-independent kernel, no shuffle but the presentation sort.
    """
    from ..multimodal import attach_generated_video, extract_features

    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(attach_generated_video(docs), dim=16)
    # posexplode for the comparison surface: the differential checker
    # sorts on every non-float column and array cells are unhashable
    # there; the array contract itself is what extract_features returns
    return feats.select(
        "doc_id",
        F.posexplode("embedding").alias("bin", "weight"),
    ).select(
        "doc_id", F.col("bin").cast("int").alias("bin"), "weight"
    ).orderBy("doc_id", "bin")


register(
    QuerySpec(
        "media_embedding_histogram",
        q_media_embedding_histogram,
        """
        WITH v AS (
            SELECT doc_id,
                   doc_id % 5 + 4 AS w,
                   doc_id % 3 + 3 AS h,
                   doc_id % 7 + 2 AS nf
            FROM documents
        ),
        px AS (
            SELECT doc_id, w * h * nf AS total,
                   (doc_id * 31 + f.f * 17 + r.r * 5 + c.c * 3) % 251 AS val
            FROM v,
                 LATERAL (SELECT UNNEST(generate_series(
                     0, CAST(nf - 1 AS INT))) AS f) f,
                 LATERAL (SELECT UNNEST(generate_series(
                     0, CAST(h - 1 AS INT))) AS r) r,
                 LATERAL (SELECT UNNEST(generate_series(
                     0, CAST(w - 1 AS INT))) AS c) c
        ),
        cnt AS (
            SELECT doc_id, total, val // 16 AS bin, COUNT(*) AS n
            FROM px GROUP BY doc_id, total, val // 16
        ),
        dense AS (
            SELECT d.doc_id, d.total, b.bin, COALESCE(c.n, 0) AS n
            FROM (SELECT DISTINCT doc_id, total FROM cnt) d
            CROSS JOIN (SELECT UNNEST(generate_series(0, 15)) AS bin) b
            LEFT JOIN cnt c
              ON c.doc_id = d.doc_id AND c.bin = b.bin
        )
        SELECT doc_id, CAST(bin AS INT) AS bin,
               CAST(n AS DOUBLE) / total AS weight
        FROM dense ORDER BY doc_id, bin
        """,
        doc="byte-histogram media embedding (extract_features over the "
        "deterministic raw-video source): mapInPandas encoder contract "
        "with dense-bin arithmetic oracle",
    )
)


def q_audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-level RMS energy + zero-crossing counts over really-decoded
    PCM WAV clips (64-sample frames) — the audio counterpart of the
    video frame pipeline: the framing/featurization front half of every
    classical audio pipeline (energy/VAD gating, ZCR voicing).

    The oracle never sees the bytes: it regenerates the deterministic
    sawtooth arithmetically and recomputes per-frame int64 sums and
    strict sign-flip counts, certifying encode → Arrow → chunk-walk →
    PCM decode → framing end-to-end (one drifted sample flips a sum).
    Scale shape: row-independent mapInPandas fan-out to ≤8 frame rows
    per clip; no shuffle before the presentation sort.
    """
    from ..multimodal.binary_ops import (
        attach_generated_audio,
        audio_frame_features,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = attach_generated_audio(docs, sample_rate=8000)
    return audio_frame_features(media, frame=64).orderBy(
        "doc_id", "frame_idx"
    )


register(
    QuerySpec(
        "audio_frame_energy",
        q_audio_frame_energy,
        """
        WITH dims AS (
            SELECT doc_id, CAST(doc_id % 480 + 16 AS BIGINT) AS n
            FROM documents
        ),
        s AS (
            SELECT doc_id, i.i AS i,
                   (i.i * 7 + doc_id * 13) % 2001 - 1000 AS v,
                   CAST(i.i // 64 AS INT) AS frame_idx
            FROM dims, range(0, 496) i(i)
            WHERE i.i < n
        ),
        lagged AS (
            SELECT *, LAG(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
            FROM s
        ),
        z AS (
            SELECT doc_id, frame_idx,
                   CAST(COUNT(*) AS INT) AS n_samples,
                   CAST(SUM(v * v) AS BIGINT) AS sum_sq,
                   CAST(SUM(CASE WHEN i % 64 <> 0 AND v * pv < 0
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS zero_crossings
            FROM lagged GROUP BY 1, 2
        )
        SELECT doc_id, frame_idx, n_samples, sum_sq, zero_crossings,
               ROUND(sqrt(CAST(sum_sq AS DOUBLE) / n_samples), 6) AS rms
        FROM z
        ORDER BY doc_id, frame_idx
        """,
        doc="frame-level audio features (RMS + zero crossings) over real "
        "WAV decode; arithmetic oracle certifies the codec round trip",
    )
)
