"""Text-analysis / dedup operator suite over the `documents` table.

These extend the reference's surface with the large-scale training-data
pipeline operators (exact dedup, near-dup, quality scoring, token stats);
the tag-tokenize operator mirrors Data_manager/TagPreprocessing.py:20-62.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import QuerySpec, register


# ---------------------------------------------------------------------------
# token counting + quality features
# ---------------------------------------------------------------------------
def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token count, distinct tokens, mean token length."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.withColumn(
        "tokens", F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    )
    return toks.select(
        "doc_id",
        F.size("tokens").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("tokens")).cast("bigint").alias("n_distinct_tokens"),
        (
            F.aggregate(
                F.col("tokens"), F.lit(0.0), lambda acc, t: acc + F.length(t)
            )
            / F.size("tokens")
        ).alias("avg_token_len"),
    )


register(
    QuerySpec(
        "doc_token_stats",
        q_doc_token_stats,
        """
        WITH toks AS (
            SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tokens
            FROM documents
        )
        SELECT doc_id,
               CAST(len(tokens) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(tokens)) AS BIGINT) AS n_distinct_tokens,
               CAST(list_sum(list_transform(tokens, t -> length(t))) AS DOUBLE)
                 / len(tokens) AS avg_token_len
        FROM toks
        """,
        doc="token counting (training-data pipeline extension)",
    )
)


# ---------------------------------------------------------------------------
# exact dedup by content hash
# ---------------------------------------------------------------------------
def q_exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate groups: docs sharing identical text.

    Canonical exact-dedup: group on the content (at scale: on sha2(text) so
    the shuffle key is 32 bytes, not the document); survivors = min(doc_id).
    Output: one row per duplicated text group.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.sha2(F.col("text"), 256).alias("text_hash"))
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .filter(F.col("n_copies") > 1)
    )


register(
    QuerySpec(
        "exact_dedup_docs",
        q_exact_dedup_docs,
        """
        SELECT sha256(text) AS text_hash,
               CAST(COUNT(*) AS BIGINT) AS n_copies,
               MIN(doc_id) AS keeper_doc_id
        FROM documents GROUP BY 1 HAVING COUNT(*) > 1
        """,
        doc="exact dedup via content hash",
    )
)


# ---------------------------------------------------------------------------
# quality scoring (length / punctuation / stopword ratios)
# ---------------------------------------------------------------------------
_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality features per document."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.withColumn(
        "tokens", F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    )
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    return toks.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        F.size("tokens").cast("bigint").alias("n_tokens"),
        (
            F.size(F.filter(F.col("tokens"), lambda t: F.array_contains(stop_arr, t)))
            .cast("double")
            / F.size("tokens")
        ).alias("stopword_ratio"),
        (
            F.length(F.regexp_replace(F.col("text"), r"[^.,!?;:]", "")).cast("double")
            / F.length("text")
        ).alias("punct_ratio"),
    )


register(
    QuerySpec(
        "doc_quality",
        q_doc_quality,
        f"""
        WITH toks AS (
            SELECT doc_id, text,
                   list_filter(string_split(text, ' '), t -> t <> '') AS tokens
            FROM documents
        )
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(len(tokens) AS BIGINT) AS n_tokens,
               CAST(len(list_filter(tokens,
                    t -> list_contains({list(_STOPWORDS)!r}, t))) AS DOUBLE)
                 / len(tokens) AS stopword_ratio,
               CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
                 / length(text) AS punct_ratio
        FROM toks
        """,
        doc="quality scoring (training-data pipeline extension)",
    )
)


# ---------------------------------------------------------------------------
# language-ID heuristic (training-data pipeline extension)
# ---------------------------------------------------------------------------
_LANG_WORDS = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "les", "des", "une", "est"),
}


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language ID: argmax of per-language keyword counts.

    Deterministic priority on ties: en > es > fr > unknown.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.withColumn(
        "tokens", F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    )
    hits = {}
    for lang, words in _LANG_WORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        hits[lang] = F.size(
            F.filter(F.col("tokens"), lambda t: F.array_contains(arr, t))
        ).cast("bigint")
    out = toks.select(
        "doc_id",
        hits["en"].alias("en_hits"),
        hits["es"].alias("es_hits"),
        hits["fr"].alias("fr_hits"),
    )
    return out.withColumn(
        "predicted_lang",
        F.when(
            (F.col("en_hits") >= F.col("es_hits"))
            & (F.col("en_hits") >= F.col("fr_hits"))
            & (F.col("en_hits") > 0),
            F.lit("en"),
        )
        .when(
            (F.col("es_hits") >= F.col("fr_hits")) & (F.col("es_hits") > 0),
            F.lit("es"),
        )
        .when(F.col("fr_hits") > 0, F.lit("fr"))
        .otherwise(F.lit("unknown")),
    )


def _lang_hits_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in _LANG_WORDS[lang])
    return (
        f"CAST(len(list_filter(tokens, t -> list_contains([{words}], t))) "
        f"AS BIGINT)"
    )


register(
    QuerySpec(
        "langid",
        q_langid,
        f"""
        WITH toks AS (
            SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tokens
            FROM documents
        ),
        h AS (
            SELECT doc_id,
                   {_lang_hits_sql("en")} AS en_hits,
                   {_lang_hits_sql("es")} AS es_hits,
                   {_lang_hits_sql("fr")} AS fr_hits
            FROM toks
        )
        SELECT doc_id, en_hits, es_hits, fr_hits,
               CASE WHEN en_hits >= es_hits AND en_hits >= fr_hits AND en_hits > 0 THEN 'en'
                    WHEN es_hits >= fr_hits AND es_hits > 0 THEN 'es'
                    WHEN fr_hits > 0 THEN 'fr'
                    ELSE 'unknown' END AS predicted_lang
        FROM h
        """,
        doc="n-gram/stopword language-ID heuristic (pipeline extension)",
    )
)


# ---------------------------------------------------------------------------
# document fingerprinting (order-sensitive positional hash)
# ---------------------------------------------------------------------------
def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fingerprint = Σ_pos sid(token) · (1000003 + pos·7919), exact BIGINT.

    Order-sensitive (re-ordered docs fingerprint differently), integer-exact
    in any engine.  Token ids from a dense_rank over the corpus vocabulary;
    at scale substitute xxhash64 ids (same algebra, shuffle-free).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        ).alias("pos0", "token"),
    ).withColumn("pos", (F.col("pos0") + 1).cast("bigint"))
    vocab = toks.select("token").distinct()
    from pyspark.sql import Window as W

    ids = vocab.withColumn(
        "tid", F.dense_rank().over(W.orderBy("token")).cast("bigint")
    )
    return (
        toks.join(ids, "token")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("tid") * (F.lit(1000003) + F.col("pos") * F.lit(7919))
            ).alias("fingerprint")
        )
    )


register(
    QuerySpec(
        "doc_fingerprints",
        q_doc_fingerprints,
        """
        WITH toks AS (
            SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tokens
            FROM documents
        ),
        pos AS (
            -- parallel unnests zip: token with its 1-based position
            SELECT doc_id,
                   CAST(unnest(range(1, len(tokens) + 1)) AS BIGINT) AS pos,
                   unnest(tokens) AS token
            FROM toks
        ),
        ids AS (
            SELECT token, CAST(DENSE_RANK() OVER (ORDER BY token) AS BIGINT) AS tid
            FROM (SELECT DISTINCT token FROM pos)
        )
        SELECT doc_id,
               CAST(SUM(tid * (1000003 + pos * 7919)) AS BIGINT) AS fingerprint
        FROM pos JOIN ids USING (token)
        GROUP BY doc_id
        """,
        doc="order-sensitive document fingerprint (pipeline extension)",
    )
)


# ---------------------------------------------------------------------------
# tag tokenize + light stemming (Data_manager/TagPreprocessing.py:20-62)
# ---------------------------------------------------------------------------
def q_tag_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize p_type as tags: lower, strip punctuation, light suffix-strip.

    The reference Porter-stems with NLTK (TagPreprocessing.py:20-62); we
    apply a deterministic suffix rule (ses→s, s→ε) — divergence documented,
    validated by its own oracle rather than reference equality.
    """
    part = load_table(spark, sf_dir, "part")
    toks = part.select(
        "p_partkey",
        F.explode(
            F.split(F.regexp_replace(F.lower(F.col("p_type")), r"[^a-z ]", ""), " ")
        ).alias("tag"),
    ).filter(F.col("tag") != "")
    stemmed = toks.withColumn(
        "stem", F.regexp_replace(F.col("tag"), r"(ses|s)$", "")
    )
    return stemmed.groupBy("stem").agg(
        F.count("*").alias("cnt"),
        F.countDistinct("p_partkey").alias("n_parts"),
    )


register(
    QuerySpec(
        "tag_tokens",
        q_tag_tokens,
        """
        WITH toks AS (
            SELECT p_partkey,
                   UNNEST(string_split(regexp_replace(lower(p_type), '[^a-z ]', '', 'g'), ' ')) AS tag
            FROM part
        )
        SELECT regexp_replace(tag, '(ses|s)$', '') AS stem,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(COUNT(DISTINCT p_partkey) AS BIGINT) AS n_parts
        FROM toks WHERE tag <> ''
        GROUP BY 1
        """,
        doc="tag tokenize + stem (TagPreprocessing.py:20-62)",
    )
)


def q_tag_tokens_porter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Porter-faithful twin of `tag_tokens` (TagPreprocessing.py:20-62
    Porter-stems every tag with NLTK; functions/porter.py implements the
    published 1980 algorithm, golden-tested against the paper's examples).

    Scale shape: the stemmer is a per-token Python rewrite, so it runs as
    an Arrow-batched pandas UDF over the DISTINCT token vocabulary only —
    |vocab| ≪ |token stream| — and the stream is mapped through the
    stemmed vocabulary with a broadcast join.  Rows-only driver check: a
    SQL oracle cannot express Porter (DuckDB's fts/stem extension is not
    loadable offline); the stemmer itself is validated by the golden
    pytest, the surrounding plan by the oracled `tag_tokens`.
    """
    from ..functions.porter import porter_stem

    part = load_table(spark, sf_dir, "part")
    toks = part.select(
        "p_partkey",
        F.explode(
            F.split(F.regexp_replace(F.lower(F.col("p_type")), r"[^a-z ]", ""), " ")
        ).alias("tag"),
    ).filter(F.col("tag") != "")

    @F.pandas_udf("string")
    def stem_udf(s: pd.Series) -> pd.Series:
        return s.map(porter_stem)

    vocab = toks.select("tag").distinct().withColumn("stem", stem_udf("tag"))
    return (
        toks.join(F.broadcast(vocab), "tag")
        .groupBy("stem")
        .agg(
            F.count("*").alias("cnt"),
            F.countDistinct("p_partkey").alias("n_parts"),
        )
    )


register(
    QuerySpec(
        "tag_tokens_porter",
        q_tag_tokens_porter,
        None,
        doc="Porter-stemmed tag tokens (TagPreprocessing.py:20-62); "
        "rows-only — Porter is not SQL-expressible offline",
    )
)


def bench_warmup(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the family's shared payloads (repetition stats, BPE
    word vocabulary, and the BPE TRAINING itself — a training budget,
    not a query, like the model fits) — bench family build line, so
    `bpe_compression_stats` times the tokenizer APPLY rather than
    absorbing the k training rounds on first touch.

    r16: the repetition-stats build and the BPE chain (vocab → k
    training rounds) are independent — run as concurrent jobs (guide
    §2.6).  Payload contents unchanged; the BPE driver-side cache is
    touched by exactly one thread."""
    from .shared import overlap_jobs

    def chain_bpe() -> None:
        _bpe_vocab(spark, sf_dir).count()
        _bpe_merges(spark, sf_dir)

    overlap_jobs(
        lambda: q_doc_repetition_stats(spark, sf_dir).count(),
        chain_bpe,
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition quality (training-data-pipeline extension)
# ---------------------------------------------------------------------------
def q_doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition features + keep flag — the Gopher/C4 family
    of repetition filters (Rae et al. 2021 §A1.1) adapted to occurrence
    fractions: top-unigram share, top-bigram share, duplicate-token share.

    keep ⟺ top_unigram_frac ≤ 0.12 ∧ top_bigram_frac ≤ 0.20 ∧
    dup_token_frac ≤ 0.60 (thresholds sit inside this corpus's observed
    range so both outcomes occur; at 100 TB they are config).  Everything
    is one explode + two grouped counts per n-gram order — map-side
    combinable, no shuffle beyond the doc_id key.  Materialized per
    session (plans/shared.py): the cleaning funnel is a second consumer."""
    from . import shared

    return shared.materialized(
        spark,
        sf_dir,
        "doc_repetition",
        lambda: _build_repetition_stats(spark, sf_dir),
    )


def _build_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.filter(F.split(F.col("text"), " "), lambda t: t != "").alias("tokens"),
    )
    uni = (
        toks.select("doc_id", F.explode("tokens").alias("tok"))
        .groupBy("doc_id", "tok")
        .count()
        .groupBy("doc_id")
        .agg(
            F.max("count").alias("_mx_uni"),
            F.sum("count").alias("n_tokens"),
            F.count("*").alias("_nd"),
        )
    )
    # zip_with over two shifted slices, NOT transform+element_at over a
    # position sequence: the positional-lookup form measured 6.5x slower
    # at sf0.1 (8.1 s vs 1.2 s for this pass — it was the whole cost of
    # the repetition materialization); n1 = 0 for docs under 2 tokens
    # yields an empty array, same as the former explicit branch
    n1 = F.greatest(F.size("tokens") - 1, F.lit(0))
    bigrams = toks.select(
        "doc_id",
        F.zip_with(
            F.slice("tokens", 1, n1),
            F.slice("tokens", 2, n1),
            lambda a, b: F.concat_ws(" ", a, b),
        ).alias("bgs"),
    )
    bi = (
        bigrams.select("doc_id", F.explode("bgs").alias("bg"))
        .groupBy("doc_id", "bg")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("_mx_bi"), F.sum("count").alias("_nb"))
    )
    out = (
        uni.join(bi, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            (F.col("_mx_uni") / F.col("n_tokens")).alias("top_unigram_frac"),
            F.coalesce(F.col("_mx_bi") / F.col("_nb"), F.lit(0.0)).alias(
                "top_bigram_frac"
            ),
            (F.lit(1.0) - F.col("_nd") / F.col("n_tokens")).alias(
                "dup_token_frac"
            ),
        )
        .withColumn(
            "keep",
            (F.col("top_unigram_frac") <= 0.12)
            & (F.col("top_bigram_frac") <= 0.20)
            & (F.col("dup_token_frac") <= 0.60),
        )
    )
    return out


register(
    QuerySpec(
        "doc_repetition_stats",
        q_doc_repetition_stats,
        """
        WITH toks AS (
            SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tokens
            FROM documents
        ),
        uni AS (
            SELECT doc_id, tokens[i.i] AS tok
            FROM toks, range(1, 100001) i(i) WHERE i.i <= len(tokens)
        ),
        uc AS (SELECT doc_id, tok, COUNT(*) AS c FROM uni GROUP BY 1, 2),
        us AS (
            SELECT doc_id, MAX(c) AS mx_uni, SUM(c) AS n, COUNT(*) AS nd
            FROM uc GROUP BY 1
        ),
        big AS (
            SELECT doc_id, tokens[i.i] || ' ' || tokens[i.i + 1] AS bg
            FROM toks, range(1, 100000) i(i) WHERE i.i <= len(tokens) - 1
        ),
        bc AS (SELECT doc_id, bg, COUNT(*) AS c FROM big GROUP BY 1, 2),
        bs AS (
            SELECT doc_id, MAX(c) AS mx_bi, SUM(c) AS nb FROM bc GROUP BY 1
        )
        SELECT us.doc_id,
               CAST(us.n AS BIGINT) AS n_tokens,
               us.mx_uni * 1.0 / us.n AS top_unigram_frac,
               COALESCE(bs.mx_bi * 1.0 / bs.nb, 0.0) AS top_bigram_frac,
               1.0 - us.nd * 1.0 / us.n AS dup_token_frac,
               (us.mx_uni * 1.0 / us.n <= 0.12
                AND COALESCE(bs.mx_bi * 1.0 / bs.nb, 0.0) <= 0.20
                AND 1.0 - us.nd * 1.0 / us.n <= 0.60) AS keep
        FROM us LEFT JOIN bs ON us.doc_id = bs.doc_id
        """,
        doc="Gopher-style repetition filters: top-unigram/bigram share, "
        "duplicate-token share, keep flag (pipeline extension)",
    )
)


# ---------------------------------------------------------------------------
# corpus cleaning funnel (training-data-pipeline extension)
# ---------------------------------------------------------------------------
def q_corpus_cleaning_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row funnel of documents surviving each cleaning stage
    cumulatively: total → language-ID 'en' → quality (stopword ratio ≥
    0.05) → repetition keep → exact-dedup representative (min doc_id per
    identical text).  The composition every training-data pipeline runs
    before tokenization; each stage reuses the registered operator's exact
    predicate, and the whole funnel is ONE pass over per-doc flags (a
    five-counter aggregate, no per-stage rescan)."""
    docs = load_table(spark, sf_dir, "documents")
    # langid + quality are per-row expressions and exact-dedup is a window
    # over text — all three flags come from ONE corpus scan; only the
    # repetition flag (grouped n-gram counts) needs a second branch + join
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    hits = {}
    for lang_key, words in _LANG_WORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        hits[lang_key] = F.size(
            F.filter(toks, lambda t: F.array_contains(arr, t))
        )
    lang_ok = (
        (hits["en"] >= hits["es"]) & (hits["en"] >= hits["fr"]) & (hits["en"] > 0)
    )
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    q_ok = (
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast(
            "double"
        )
        / F.size(toks)
        >= 0.05
    )
    w_rep = Window.partitionBy("text")
    base = docs.select(
        "doc_id",
        lang_ok.alias("_lang_ok"),
        q_ok.alias("_q_ok"),
        (F.col("doc_id") == F.min("doc_id").over(w_rep)).alias("_rep_first"),
    )
    rep = q_doc_repetition_stats(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("_rep_ok")
    )
    flags = base.join(rep, "doc_id")
    return flags.agg(
        F.count("*").cast("bigint").alias("n_total"),
        F.sum(F.col("_lang_ok").cast("int")).cast("bigint").alias("n_lang"),
        F.sum((F.col("_lang_ok") & F.col("_q_ok")).cast("int"))
        .cast("bigint")
        .alias("n_quality"),
        F.sum((F.col("_lang_ok") & F.col("_q_ok") & F.col("_rep_ok")).cast("int"))
        .cast("bigint")
        .alias("n_repetition"),
        F.sum(
            (
                F.col("_lang_ok")
                & F.col("_q_ok")
                & F.col("_rep_ok")
                & F.col("_rep_first")
            ).cast("int")
        )
        .cast("bigint")
        .alias("n_dedup_rep"),
    )


register(
    QuerySpec(
        "corpus_cleaning_funnel",
        q_corpus_cleaning_funnel,
        f"""
        WITH toks AS (
            SELECT doc_id, text,
                   list_filter(string_split(text, ' '), t -> t <> '') AS tokens
            FROM documents
        ),
        lang AS (
            SELECT doc_id,
                   ({_lang_hits_sql("en")} >= {_lang_hits_sql("es")}
                    AND {_lang_hits_sql("en")} >= {_lang_hits_sql("fr")}
                    AND {_lang_hits_sql("en")} > 0) AS lang_ok
            FROM toks
        ),
        qual AS (
            SELECT doc_id,
                   (CAST(len(list_filter(tokens,
                        t -> list_contains({list(_STOPWORDS)!r}, t))) AS DOUBLE)
                     / len(tokens) >= 0.05) AS q_ok
            FROM toks
        ),
        uni AS (
            SELECT doc_id, tokens[i.i] AS tok
            FROM toks, range(1, 100001) i(i) WHERE i.i <= len(tokens)
        ),
        uc AS (SELECT doc_id, tok, COUNT(*) AS c FROM uni GROUP BY 1, 2),
        us AS (
            SELECT doc_id, MAX(c) AS mx_uni, SUM(c) AS n, COUNT(*) AS nd
            FROM uc GROUP BY 1
        ),
        big AS (
            SELECT doc_id, tokens[i.i] || ' ' || tokens[i.i + 1] AS bg
            FROM toks, range(1, 100000) i(i) WHERE i.i <= len(tokens) - 1
        ),
        bc AS (SELECT doc_id, bg, COUNT(*) AS c FROM big GROUP BY 1, 2),
        bs AS (SELECT doc_id, MAX(c) AS mx_bi, SUM(c) AS nb FROM bc GROUP BY 1),
        rep AS (
            SELECT us.doc_id,
                   (us.mx_uni * 1.0 / us.n <= 0.12
                    AND COALESCE(bs.mx_bi * 1.0 / bs.nb, 0.0) <= 0.20
                    AND 1.0 - us.nd * 1.0 / us.n <= 0.60) AS rep_ok
            FROM us LEFT JOIN bs ON us.doc_id = bs.doc_id
        ),
        ded AS (
            SELECT doc_id,
                   doc_id = MIN(doc_id) OVER (PARTITION BY text) AS rep_first
            FROM documents
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(SUM(CASE WHEN l.lang_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_lang,
               CAST(SUM(CASE WHEN l.lang_ok AND q.q_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
               CAST(SUM(CASE WHEN l.lang_ok AND q.q_ok AND r.rep_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_repetition,
               CAST(SUM(CASE WHEN l.lang_ok AND q.q_ok AND r.rep_ok AND d.rep_first THEN 1 ELSE 0 END) AS BIGINT) AS n_dedup_rep
        FROM documents doc
        JOIN lang l USING (doc_id)
        JOIN qual q USING (doc_id)
        JOIN rep r USING (doc_id)
        JOIN ded d USING (doc_id)
        """,
        doc="corpus cleaning funnel: langid -> quality -> repetition -> "
        "exact-dedup representative, one-pass five-counter aggregate "
        "(pipeline extension)",
    )
)


# ---------------------------------------------------------------------------
# sequence packing (training-data-pipeline extension)
# ---------------------------------------------------------------------------
def q_doc_packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: documents concatenated in doc_id order
    and chunked into fixed context windows of C=1024 tokens.  Per doc:
    its start offset in the token stream, the first window it lands in,
    and how many windows it spans (boundary-crossing docs span > 1).

    Scale shape: the global running sum is NOT an empty-frame window
    (which funnels the corpus through one task) — docs hash into doc_id
    range groups, cumsum runs per group in parallel, and each group adds
    a precomputed offset (per-group totals are tiny: broadcast join).
    The oracle uses the plain global window — identical output.
    """
    C = 1024
    group_width = 1000
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(
            F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        ).cast("bigint").alias("n_tokens"),
        (F.col("doc_id") / group_width).cast("bigint").alias("_g"),
    )
    w_in = (
        Window.partitionBy("_g")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = toks.withColumn("_cum_in", F.sum("n_tokens").over(w_in))
    totals = toks.groupBy("_g").agg(F.sum("n_tokens").alias("_gt"))
    w_g = Window.orderBy("_g").rowsBetween(
        Window.unboundedPreceding, -1
    )  # offsets = totals of PRECEDING groups; |groups| rows — tiny window
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_gt").over(w_g), F.lit(0))
    ).select("_g", "_off")
    packed = local.join(F.broadcast(offsets), "_g").select(
        "doc_id",
        "n_tokens",
        (F.col("_cum_in") + F.col("_off") - F.col("n_tokens")).alias(
            "start_offset"
        ),
    )
    return packed.select(
        "doc_id",
        "n_tokens",
        "start_offset",
        (F.col("start_offset") / C).cast("bigint").alias("first_window"),
        F.when(F.col("n_tokens") > 0,
            ((F.col("start_offset") + F.col("n_tokens") - 1) / C).cast("bigint")
            - (F.col("start_offset") / C).cast("bigint")
            + 1,
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("n_windows_spanned"),
    )


register(
    QuerySpec(
        "doc_packing_stats",
        q_doc_packing_stats,
        """
        WITH toks AS (
            SELECT doc_id,
                   CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens
            FROM documents
        ),
        cum AS (
            SELECT doc_id, n_tokens,
                   -- CAST: DuckDB windowed SUM(BIGINT) yields HUGEINT, which
                   -- the driver canonicalizes as float64 and hash-mismatches
                   -- Spark's BIGINT even on identical values (same trap as
                   -- round-1 doc_fingerprints; guarded by test_oracle_lint).
                   CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tokens AS start_offset
            FROM toks
        )
        SELECT doc_id, n_tokens, start_offset,
               CAST(start_offset // 1024 AS BIGINT) AS first_window,
               CAST(CASE WHEN n_tokens > 0
                    THEN (start_offset + n_tokens - 1) // 1024
                         - start_offset // 1024 + 1
                    ELSE 0 END AS BIGINT) AS n_windows_spanned
        FROM cum
        """,
        doc="GPT-style sequence packing: concat-and-chunk window "
        "assignment, two-phase distributed cumsum (pipeline extension)",
    )
)


# ---------------------------------------------------------------------------
# PII detection + redaction (training-data scrubbing)
# ---------------------------------------------------------------------------
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+1-555-[0-9]{4}"
_PII_IP = r"10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


def q_pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII detection counts + redacted length.

    The synthetic corpus carries no PII, so — like the generated-media
    queries — both engines deterministically inject the same tokens first
    (doc_id%3==0 gets an email, %5==0 a phone, %7==0 an IPv4, all derived
    from doc_id), then run REAL regex detection and redaction.  The parity
    check therefore certifies that the scrub patterns behave identically
    across regex engines (Java util.regex vs DuckDB RE2) — exactly the
    reproducibility a cross-engine cleaning pipeline needs.  Patterns are
    deliberately backtracking-free (character classes + bounded repeats)
    so they stay in RE2's guaranteed-linear subset: at 100 TB a
    pathological backtracking pattern on adversarial text is a task-kill.
    Pure codegen (regexp_count / regexp_replace), row-independent, no
    shuffle; extension — the reference has no scrubbing surface.
    """
    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" call +1-555-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" host 10."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit ("."),
                    ((F.col("doc_id") * 7) % 256).cast("string"),
                    F.lit("."),
                    ((F.col("doc_id") * 13) % 256).cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("t"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE,
            "<PHONE>",
        ),
        _PII_IP,
        "<IP>",
    )
    return aug.select(
        "doc_id",
        F.regexp_count(F.col("t"), F.lit(_PII_EMAIL)).alias("n_emails"),
        F.regexp_count(F.col("t"), F.lit(_PII_PHONE)).alias("n_phones"),
        F.regexp_count(F.col("t"), F.lit(_PII_IP)).alias("n_ips"),
        F.length(redacted).cast("bigint").alias("n_chars_redacted"),
        (
            F.regexp_count(F.col("t"), F.lit(_PII_EMAIL))
            + F.regexp_count(F.col("t"), F.lit(_PII_PHONE))
            + F.regexp_count(F.col("t"), F.lit(_PII_IP))
            == 0
        ).alias("pii_free"),
    )


register(
    QuerySpec(
        "pii_scrub_stats",
        q_pii_scrub_stats,
        rf"""
        WITH aug AS (
            SELECT doc_id,
                   text
                   || CASE WHEN doc_id % 3 = 0
                           THEN ' contact user' || CAST(doc_id AS VARCHAR)
                                || '@example.com' ELSE '' END
                   || CASE WHEN doc_id % 5 = 0
                           THEN ' call +1-555-'
                                || lpad(CAST(doc_id % 10000 AS VARCHAR),
                                        4, '0') ELSE '' END
                   || CASE WHEN doc_id % 7 = 0
                           THEN ' host 10.'
                                || CAST(doc_id % 256 AS VARCHAR) || '.'
                                || CAST((doc_id * 7) % 256 AS VARCHAR) || '.'
                                || CAST((doc_id * 13) % 256 AS VARCHAR)
                           ELSE '' END AS t
            FROM documents
        ),
        counted AS (
            SELECT doc_id,
                   CAST(len(regexp_extract_all(t,
                       '{_PII_EMAIL}')) AS INT) AS n_emails,
                   CAST(len(regexp_extract_all(t,
                       '{_PII_PHONE}')) AS INT)
                       AS n_phones,
                   CAST(len(regexp_extract_all(t,
                       '{_PII_IP}')) AS INT) AS n_ips,
                   CAST(length(regexp_replace(regexp_replace(regexp_replace(
                       t, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                       '{_PII_PHONE}',
                       '<PHONE>', 'g'),
                       '{_PII_IP}', '<IP>', 'g')) AS BIGINT)
                       AS n_chars_redacted
            FROM aug
        )
        SELECT doc_id, n_emails, n_phones, n_ips, n_chars_redacted,
               (n_emails + n_phones + n_ips) = 0 AS pii_free
        FROM counted
        """,
        doc="PII detection + redaction over deterministically-injected "
        "tokens — certifies cross-engine regex agreement of the scrub "
        "patterns (training-data cleaning extension)",
    )
)


# ---------------------------------------------------------------------------
# unigram-LM perplexity scoring + CCNet-style quality buckets
# ---------------------------------------------------------------------------
def q_unigram_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram cross-entropy + head/middle/tail quality
    bucket — the CCNet perplexity-bucketing pass (Wenzek et al. 2020,
    arXiv:1911.00359) with the KenLM 5-gram model replaced by the
    corpus's own unigram LM (the SQL-expressible proxy; the bucketing
    algebra is identical).

    xent(doc) = avg over tokens of ln(total_tokens / count(token)) —
    self-trained, so every token is in-vocabulary by construction.
    Buckets split at the exact 1/3 and 2/3 cross-entropy quantiles
    (value thresholds, ties to the lower bucket): 1 = head (most
    predictable), 2 = middle, 3 = tail.  Scale shape: one token groupBy
    for the vocabulary, one shuffle join tokens x vocab (no agg on the
    hot key, so token skew only widens a map-side join fan-in), one
    per-doc aggregation; exact `percentile` for the two cuts is the
    oracle-checkable stand-in with approx_percentile as the documented
    100 TB path (same contract as `value_quantiles`).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        ).alias("tok"),
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").cast("double").alias("total"))
    xe = (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.avg(F.log(F.col("total") / F.col("cnt"))).alias("xent"),
        )
    )
    cuts = xe.agg(
        F.expr("percentile(xent, 1.0D/3.0D)").alias("c1"),
        F.expr("percentile(xent, 2.0D/3.0D)").alias("c2"),
    )
    return xe.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "n_tokens",
        "xent",
        F.when(F.col("xent") <= F.col("c1"), 1)
        .when(F.col("xent") <= F.col("c2"), 2)
        .otherwise(3)
        .cast("int")
        .alias("ppl_bucket"),
    )


register(
    QuerySpec(
        "unigram_ppl_buckets",
        q_unigram_ppl_buckets,
        """
        WITH toks AS (
            SELECT doc_id,
                   UNNEST(list_filter(string_split(text, ' '),
                                      t -> t <> '')) AS tok
            FROM documents
        ),
        vocab AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY 1),
        tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM vocab),
        xe AS (
            SELECT t.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   AVG(ln(tot.total / v.cnt)) AS xent
            FROM toks t JOIN vocab v USING (tok) CROSS JOIN tot
            GROUP BY 1
        ),
        cuts AS (
            SELECT quantile_cont(xent, 1.0/3.0) AS c1,
                   quantile_cont(xent, 2.0/3.0) AS c2
            FROM xe
        )
        SELECT doc_id, n_tokens, xent,
               CAST(CASE WHEN xent <= c1 THEN 1
                         WHEN xent <= c2 THEN 2
                         ELSE 3 END AS INT) AS ppl_bucket
        FROM xe CROSS JOIN cuts
        """,
        doc="CCNet-style perplexity bucketing (arXiv:1911.00359) with a "
        "self-trained unigram LM (SQL-expressible proxy for KenLM)",
    )
)


# ---------------------------------------------------------------------------
# per-source reputation rollup (FineWeb-style source scoring)
# ---------------------------------------------------------------------------
def q_source_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus reputation signals: volume, language spread,
    punctuation ratio, and exact-duplicate rate — the rollup a
    FineWeb-style pipeline uses to score and prune whole sources before
    doc-level filtering.

    Exact-dup flag = the document's text occurs more than once corpus-wide
    (one groupBy on text with map-side combine; joined back on the same
    key so the exchange is shared).  Everything else is a stateless map +
    one partial-agg rollup on the low-cardinality source key.
    """
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "doc_id",
        "source",
        "lang",
        "text",
        F.size(
            F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        ).cast("bigint").alias("n_tokens"),
        (
            F.length(F.regexp_replace(F.col("text"), r"[^.,!?;:]", ""))
            .cast("double")
            / F.length("text")
        ).alias("punct_ratio"),
    )
    dup = (
        docs.groupBy("text")
        .agg(F.count("*").alias("occ"))
        .select("text", (F.col("occ") > 1).cast("int").alias("is_dup"))
    )
    return (
        per_doc.join(dup, "text")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
            F.sum("n_tokens").cast("bigint").alias("tokens_total"),
            F.avg("punct_ratio").alias("avg_punct_ratio"),
            F.avg(F.col("is_dup").cast("double")).alias("dup_doc_rate"),
        )
    )


register(
    QuerySpec(
        "source_quality_rollup",
        q_source_quality_rollup,
        """
        WITH per_doc AS (
            SELECT doc_id, source, lang, text,
                   CAST(len(list_filter(string_split(text, ' '),
                                        t -> t <> '')) AS BIGINT) AS n_tokens,
                   CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
                        AS DOUBLE) / length(text) AS punct_ratio
            FROM documents
        ),
        dup AS (
            SELECT text,
                   CASE WHEN COUNT(*) > 1 THEN 1 ELSE 0 END AS is_dup
            FROM documents GROUP BY 1
        )
        SELECT p.source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT p.lang) AS BIGINT) AS n_langs,
               CAST(SUM(p.n_tokens) AS BIGINT) AS tokens_total,
               AVG(p.punct_ratio) AS avg_punct_ratio,
               AVG(CAST(d.is_dup AS DOUBLE)) AS dup_doc_rate
        FROM per_doc p JOIN dup d ON p.text = d.text
        GROUP BY 1
        """,
        doc="per-source reputation rollup (FineWeb-style source scoring: "
        "volume, language spread, punctuation, exact-dup rate)",
    )
)


# ---------------------------------------------------------------------------
# BPE tokenizer training (Sennrich arXiv:1508.07909)
# ---------------------------------------------------------------------------
_BPE_N_MERGES = 8


def _bpe_vocab(spark: SparkSession, sf_dir: str):
    from . import shared
    from ..operators.bpe import word_vocab

    return shared.materialized(
        spark,
        sf_dir,
        "bpe_vocab",
        lambda: word_vocab(load_table(spark, sf_dir, "documents")),
    )


def _bpe_merges(spark: SparkSession, sf_dir: str):
    """Learned merges, computed once per session (k bounded jobs over the
    persisted word-frequency table; the O(k) merge list is the only
    driver-side state — same class as the Bayesian tuner's history)."""
    from ..operators.bpe import bpe_train_merges

    key = (spark.sparkContext.applicationId, sf_dir, "bpe_merges")
    if key not in _BPE_CACHE:
        _BPE_CACHE[key] = bpe_train_merges(
            _bpe_vocab(spark, sf_dir), n_merges=_BPE_N_MERGES
        )
    return _BPE_CACHE[key]


_BPE_CACHE: dict = {}


def q_bpe_learned_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(merge_rank, left, right, pair_count): the BPE merge table learned
    from the corpus — tokenizer TRAINING, not application (the lexer
    queries above tokenize with fixed rules).  Training runs on the
    word-frequency table with count-weighted pair statistics; every
    round's segmentation + pair count is distributed, and only the
    argmax pair (one row) leaves the cluster per round.

    No SQL oracle for the loop (iterative re-segmentation under the
    previous argmax is not SQL-expressible): rows-only for the driver;
    the learned merges are pinned against an independent pure-python
    reference in tests/test_bpe.py, and round 0's pair statistics +
    argmax order are oracled separately as bpe_round0_pairs (rnk 1
    there IS this query's first merge)."""
    merges = _bpe_merges(spark, sf_dir)
    return spark.createDataFrame(
        [(i + 1, l, r, c) for i, (l, r, c) in enumerate(merges)],
        "merge_rank int, left string, right string, pair_count bigint",
    )


register(
    QuerySpec(
        "bpe_learned_merges",
        q_bpe_learned_merges,
        None,
        doc="BPE tokenizer training (arXiv:1508.07909): count-weighted "
        "pair stats over the persisted word-frequency table, one scalar "
        "argmax per round; rows-only (iterative), reference-pinned in "
        "tests/test_bpe.py",
        bench=False,  # training budget, not a query (like the model fits)
    )
)


def q_bpe_compression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_symbols_char, n_symbols_bpe): per-doc symbol counts
    before/after the learned merges — the compression the trained
    tokenizer achieves (row-independent mapInPandas apply; rows-only,
    invariants pinned in tests/test_bpe.py)."""
    from ..operators.bpe import bpe_encoded_lengths

    merges = [(l, r) for l, r, _ in _bpe_merges(spark, sf_dir)]
    return bpe_encoded_lengths(
        load_table(spark, sf_dir, "documents"), merges
    )


register(
    QuerySpec(
        "bpe_compression_stats",
        q_bpe_compression_stats,
        None,
        doc="trained-tokenizer compression: per-doc symbol counts before/"
        "after the learned BPE merges (rows-only; invariants in "
        "tests/test_bpe.py)",
    )
)


def q_bpe_round0_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DETERMINISTIC stage of BPE training oracled (the same
    rows-only→oracled conversion move as ials_normal_eq /
    funk_svd_grad_step, applied to the tokenizer family): round 0's
    count-weighted pair statistics and argmax ordering, BEFORE any merge
    rewrites sequences.  With no merges applied, a word's symbols are
    exactly its characters + the end-of-word marker
    (operators/bpe.apply_merges on the empty rule list), so the pair
    table is pure relational algebra: explode each vocab word's
    character positions, pair each symbol with its successor (EOW at the
    boundary), sum word counts.  rnk 1 IS the first learned merge of
    bpe_learned_merges — certifying the trainer's argmax tiebreak
    (count desc, then lexicographic) under the oracle; only the
    iterative re-segmentation of rounds 1+ stays rows-only.

    Top-50 by the trainer's own (pair_count desc, lhs, rhs) order keeps
    the output bounded.  The unpartitioned rank window is bounded BY
    CONSTRUCTION: after the groupBy the table has at most
    |alphabet|·(|alphabet|+1) rows (single characters × characters+EOW
    — ~9k for printable ASCII), whatever the corpus size; the corpus-
    sized work (the position explode + pair sum) is fully distributed
    with map-side combine."""
    from ..operators.bpe import EOW

    vocab = _bpe_vocab(spark, sf_dir)
    pairs = (
        vocab.select(
            "w",
            "count",
            F.explode(F.sequence(F.lit(1), F.length("w"))).alias("i"),
        )
        .select(
            F.expr("substring(w, i, 1)").alias("lhs"),
            F.when(F.col("i") == F.length("w"), F.lit(EOW))
            .otherwise(F.expr("substring(w, i + 1, 1)"))
            .alias("rhs"),
            "count",
        )
        .groupBy("lhs", "rhs")
        .agg(F.sum("count").cast("bigint").alias("pair_count"))
    )
    win = Window.orderBy(F.col("pair_count").desc(), "lhs", "rhs")
    return (
        pairs.select(
            F.row_number().over(win).cast("int").alias("rnk"),
            "lhs",
            "rhs",
            "pair_count",
        )
        .filter(F.col("rnk") <= 50)
    )


register(
    QuerySpec(
        "bpe_round0_pairs",
        q_bpe_round0_pairs,
        """
        WITH vocab AS (
            SELECT w, CAST(COUNT(*) AS BIGINT) AS count
            FROM (
                SELECT UNNEST(string_split(text, ' ')) AS w FROM documents
            )
            WHERE w <> ''
            GROUP BY w
        ),
        pos AS (
            SELECT w, count, UNNEST(range(1, length(w) + 1)) AS i
            FROM vocab
        ),
        pairs AS (
            SELECT substr(w, CAST(i AS INT), 1) AS lhs,
                   CASE WHEN i = length(w) THEN '</w>'
                        ELSE substr(w, CAST(i + 1 AS INT), 1) END AS rhs,
                   CAST(SUM(count) AS BIGINT) AS pair_count
            FROM pos GROUP BY 1, 2
        )
        SELECT CAST(ROW_NUMBER() OVER (
                   ORDER BY pair_count DESC, lhs, rhs
               ) AS INT) AS rnk,
               lhs, rhs, pair_count
        FROM pairs
        QUALIFY rnk <= 50
        """,
        doc="BPE round-0 pair statistics oracled (arXiv:1508.07909): "
        "count-weighted adjacent-symbol counts over the word-frequency "
        "table with the trainer's exact argmax order (count desc, "
        "lexicographic) — rnk 1 is bpe_learned_merges' first merge; "
        "only the iterative re-segmentation stays rows-only",
        bench=False,  # sub-stage of the bpe training family
    )
)


# ---------------------------------------------------------------------------
# chi-square feature selection: tokens most associated with each language
# (the classic supervised vocabulary-selection step before training a
# classifier — exact 2×2 contingency arithmetic, no approximation)
# ---------------------------------------------------------------------------
def q_token_chi2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 tokens per language by chi-square association with that
    language, over document-level token presence.

    Scale shape: token presence is one explode + (token, lang) groupBy —
    shuffles keyed on token, never on document; the per-language doc
    counts and the corpus total are tiny broadcast relations; the final
    per-language top-5 is a bounded window over ≤|vocab| rows.  All
    contingency cells are exact int64 counts; the chi-square is computed
    with the SAME expression shape in both engines (cast-to-double before
    squaring — a·d and b·c fit int64, their squared difference does not),
    so the statistic is bit-identical and the (chi2 desc, token) ranking
    deterministic.  Tokens present in < 5 or all documents are excluded
    (degenerate margins).
    """
    docs = load_table(spark, sf_dir, "documents")
    pres = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.col("text"), " "), lambda t: t != "")
            )
        ).alias("token"),
    )
    tok_lang = pres.groupBy("token", "lang").agg(
        F.count("*").cast("bigint").alias("a")
    )
    tok_tot = pres.groupBy("token").agg(
        F.count("*").cast("bigint").alias("t")
    )
    lang_tot = docs.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("nl")
    )
    n_tot = docs.agg(F.count("*").cast("bigint").alias("n"))
    cells = (
        tok_lang.join(tok_tot, "token")
        .join(F.broadcast(lang_tot), "lang")
        .crossJoin(F.broadcast(n_tot))
        .filter((F.col("t") >= 5) & (F.col("t") < F.col("n")))
        .select(
            "lang",
            "token",
            "a",
            (F.col("t") - F.col("a")).alias("b"),
            (F.col("nl") - F.col("a")).alias("c"),
            (F.col("n") - F.col("nl") - F.col("t") + F.col("a")).alias("d"),
            "n",
        )
    )
    num = F.col("n").cast("double") * F.pow(
        (F.col("a") * F.col("d") - F.col("b") * F.col("c")).cast("double"),
        F.lit(2.0),
    )
    den = (
        (F.col("a") + F.col("b")).cast("double")
        * (F.col("c") + F.col("d")).cast("double")
        * (F.col("a") + F.col("c")).cast("double")
        * (F.col("b") + F.col("d")).cast("double")
    )
    scored = cells.withColumn("chi2", num / den)
    w = Window.partitionBy("lang").orderBy(
        F.col("chi2").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
        .select("lang", "rank", "token", "a", "chi2")
        .orderBy("lang", "rank")
    )


register(
    QuerySpec(
        "token_chi2_topk",
        q_token_chi2_topk,
        """
        WITH pres AS (
            SELECT DISTINCT doc_id, lang, tok.token
            FROM documents,
                 LATERAL (SELECT UNNEST(string_split(text, ' ')) AS token)
                     tok
            WHERE tok.token <> ''
        ),
        tok_lang AS (
            SELECT token, lang, CAST(COUNT(*) AS BIGINT) AS a
            FROM pres GROUP BY token, lang
        ),
        tok_tot AS (
            SELECT token, CAST(COUNT(*) AS BIGINT) AS t
            FROM pres GROUP BY token
        ),
        lang_tot AS (
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS nl
            FROM documents GROUP BY lang
        ),
        n_tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        cells AS (
            SELECT lang, token, a, t - a AS b, nl - a AS c,
                   n - nl - t + a AS d, n
            FROM tok_lang JOIN tok_tot USING (token)
                          JOIN lang_tot USING (lang), n_tot
            WHERE t >= 5 AND t < n
        ),
        scored AS (
            SELECT lang, token, a,
                   CAST(n AS DOUBLE)
                       * POW(CAST(a * d - b * c AS DOUBLE), 2.0)
                       / (CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
                          * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE))
                       AS chi2
            FROM cells
        )
        SELECT lang, rank, token, a, chi2 FROM (
            SELECT lang, token, a, chi2,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY lang ORDER BY chi2 DESC, token
                   ) AS INT) AS rank
            FROM scored
        ) WHERE rank <= 5
        ORDER BY lang, rank
        """,
        doc="chi-square token-language association, top-5 per language: "
        "exact 2x2 contingency counts, token-keyed shuffles only",
    )
)
