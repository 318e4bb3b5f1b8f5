"""Text-analysis / dedup operator suite over the `documents` table.

These extend the reference's surface with the large-scale training-data
pipeline operators (exact dedup, near-dup, quality scoring, token stats);
the tag-tokenize operator mirrors Data_manager/TagPreprocessing.py:20-62.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
