"""Distributed BPE tokenizer TRAINING (Sennrich et al. 2016,
arXiv:1508.07909) — learn merge rules from the corpus, the way real
tokenizers (GPT-2 BPE, SentencePiece-BPE) are built from a pretraining
corpus.

Training runs on the WORD-FREQUENCY table, not the raw token stream —
the classic trick that makes BPE training tractable: pair statistics are
identical when each distinct word contributes (its pairs × its corpus
count), and the vocabulary table is orders of magnitude smaller than the
corpus.  Per merge round:

1. every vocab word is segmented by the merges learned so far and emits
   its adjacent symbol pairs weighted by word count — a row-independent
   Arrow-batched ``mapInPandas`` over the PERSISTED vocab table
   (merge state, O(k) strings, ships inside the closure);
2. one groupBy (left, right) sum with map-side combine;
3. the arg-max pair (count desc, then lexicographic — fully
   deterministic) comes back as ONE scalar row per round — the only
   thing that ever leaves the cluster, same class as the kernel sizing
   counts.

At 100 TB the vocab table is still millions of rows — every step above
stays distributed; k rounds = k bounded jobs over the cached vocab.

No SQL oracle for the LOOP: the iterative re-segmentation is not
SQL-expressible (each round rewrites sequences under the previous
round's argmax), so the training queries are rows-only;
tests/test_bpe.py pins the learned merges against an independent
pure-python reference implementation.  Round 0's pair statistics and
argmax order ARE oracled (plans/textops.q_bpe_round0_pairs, r16): with
no merges applied the segmentation is chars+EOW, pure relational
algebra, so the driver hash-checks the stage every round consumes.
"""

from __future__ import annotations

import sys
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # by-value pickling (see recommenders/slim.py note)
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

#: end-of-word marker (Sennrich convention) so merges cannot cross words
EOW = "</w>"


def apply_merges(syms: list[str], merges: list[tuple[str, str]]) -> list[str]:
    """Apply learned merges IN ORDER, each replacing all non-overlapping
    occurrences left-to-right (the training-time segmentation rule)."""
    for left, right in merges:
        out: list[str] = []
        i = 0
        n = len(syms)
        while i < n:
            if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, count) corpus word-frequency table — the BPE training input."""
    return (
        docs.select(
            F.explode(
                F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("count"))
    )


def bpe_train_merges(
    vocab: DataFrame, n_merges: int = 8
) -> list[tuple[str, str, int]]:
    """Learn `n_merges` BPE merge rules from a persisted (w, count) vocab.

    Returns [(left, right, pair_count)] in learned order.  Deterministic:
    the per-round argmax breaks count ties lexicographically on
    (left, right)."""
    merges: list[tuple[str, str]] = []
    out: list[tuple[str, str, int]] = []
    for _ in range(int(n_merges)):
        mlist = list(merges)

        def pair_counts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for w, cnt in zip(pdf["w"], pdf["count"]):
                    syms = apply_merges(list(w) + [EOW], mlist)
                    c = int(cnt)
                    for a, b in zip(syms, syms[1:]):
                        rows.append((a, b, c))
                yield pd.DataFrame(
                    rows, columns=["left", "right", "cnt"]
                ).astype({"left": "str", "right": "str", "cnt": "int64"})

        top = (
            vocab.mapInPandas(
                pair_counts, "left string, right string, cnt bigint"
            )
            .groupBy("left", "right")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.col("c").desc(), F.col("left"), F.col("right"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        t = top[0]
        merges.append((t["left"], t["right"]))
        out.append((t["left"], t["right"], int(t["c"])))
    return out


def bpe_encoded_lengths(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_symbols_char, n_symbols_bpe): per-doc symbol counts
    before/after applying the learned merges — the compression the
    trained tokenizer achieves, row-independent mapInPandas."""
    mlist = list(merges)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in (text or "").split(" ") if w]
                n_char = sum(len(w) + 1 for w in words)  # + EOW each
                n_bpe = sum(
                    len(apply_merges(list(w) + [EOW], mlist)) for w in words
                )
                rows.append((int(did), n_char, n_bpe))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_symbols_char", "n_symbols_bpe"]
            ).astype("int64")

    return docs.select(id_col, text_col).mapInPandas(
        kernel, "doc_id bigint, n_symbols_char bigint, n_symbols_bpe bigint"
    )
