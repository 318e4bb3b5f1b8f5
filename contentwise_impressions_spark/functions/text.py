"""IR feature weighting (TF-IDF, BM25) and text feature helpers.

Reference: Base/IR_feature_weighting.py —
- TF_IDF (:55-78):   w = sqrt(tf) · ln(N / (1 + df))
- okapi_BM_25 (:13-50): idf = ln(N / (1 + df));
  len_norm = (1−B) + B·row_sum/avg(row_sum);
  w = tf·(K1+1) / (K1·len_norm + tf) · idf
where N = number of rows (docs), df = nonzeros per column (term), and
row_sum = Σ tf per doc.  Both are two cheap aggregates joined back onto the
(doc, term, tf) triples — no UDF, fully partial-aggregable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def term_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, token, tf) from whitespace tokenization."""
    return (
        docs.select(
            "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("double").alias("tf"))
    )


def _doc_count(tf: DataFrame) -> DataFrame:
    return tf.select(F.countDistinct("doc_id").alias("n_docs"))


def tf_idf(tf: DataFrame) -> DataFrame:
    """(doc_id, token, weight) — TF_IDF, IR_feature_weighting.py:55-78."""
    df = tf.groupBy("token").agg(F.count("*").cast("double").alias("df"))
    n = _doc_count(tf)
    return (
        tf.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            (F.sqrt("tf") * F.log(F.col("n_docs") / (1.0 + F.col("df")))).alias(
                "weight"
            ),
        )
    )


def bm25(tf: DataFrame, k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """(doc_id, token, weight) — okapi BM25, IR_feature_weighting.py:13-50."""
    df = tf.groupBy("token").agg(F.count("*").cast("double").alias("df"))
    doc_len = tf.groupBy("doc_id").agg(F.sum("tf").alias("row_sum"))
    avg_len = doc_len.agg(F.avg("row_sum").alias("avg_len"))
    n = _doc_count(tf)
    return (
        tf.join(F.broadcast(df), "token")
        .join(F.broadcast(doc_len), "doc_id")
        .crossJoin(F.broadcast(avg_len))
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            (
                F.col("tf")
                * (k1 + 1.0)
                / (
                    k1
                    * ((1.0 - b) + b * F.col("row_sum") / F.col("avg_len"))
                    + F.col("tf")
                )
                * F.log(F.col("n_docs") / (1.0 + F.col("df")))
            ).alias("weight"),
        )
    )
