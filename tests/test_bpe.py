"""BPE training (operators/bpe.py) pinned against an independent
pure-python reference implementation of Sennrich et al. 2016."""

from __future__ import annotations

from collections import Counter

import pytest

from contentwise_impressions_spark.operators.bpe import (
    EOW,
    apply_merges,
    bpe_encoded_lengths,
    bpe_train_merges,
    word_vocab,
)


def _reference_bpe(word_counts: dict[str, int], n_merges: int):
    """Sennrich's algorithm, straight from the paper's pseudocode:
    vocabulary of space-separated symbol sequences, argmax pair count
    (ties broken lexicographically), merge everywhere."""
    vocab = {tuple(list(w) + [EOW]): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        merges.append((left, right, cnt))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


CORPUS = (
    "low low low low low lower lower newest newest newest "
    "newest newest newest widest widest widest"
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(0, CORPUS), (1, "low lower newest"), (2, "")],
        "doc_id long, text string",
    )


def test_learned_merges_match_reference(docs, spark):
    vocab = word_vocab(docs)
    got = bpe_train_merges(vocab, n_merges=6)
    counts = Counter()
    for row in CORPUS.split() + "low lower newest".split():
        counts[row] += 1
    expect = _reference_bpe(dict(counts), 6)
    assert got == expect
    # the classic corpus learns 'est</w>' pieces early
    pieces = {l + r for l, r, _ in got}
    assert any("est" in p for p in pieces)


def test_apply_merges_left_to_right_nonoverlap():
    # 'aaa' with merge (a,a): left-to-right non-overlap → ['aa', 'a']
    assert apply_merges(list("aaa"), [("a", "a")]) == ["aa", "a"]
    # ordered application: second merge sees the first's output
    assert apply_merges(list("ab") + [EOW], [("a", "b"), ("ab", EOW)]) == [
        "ab" + EOW
    ]


def test_encoded_lengths_invariants(docs):
    merges = [(l, r) for l, r, _ in bpe_train_merges(word_vocab(docs), 4)]
    rows = {r["doc_id"]: r for r in bpe_encoded_lengths(docs, merges).collect()}
    assert set(rows) == {0, 1, 2}
    for r in rows.values():
        # merging only ever shrinks, and the empty doc stays at zero
        assert 0 <= r["n_symbols_bpe"] <= r["n_symbols_char"]
    assert rows[2]["n_symbols_char"] == 0
    # with >0 merges on this corpus, doc 0 must actually compress
    assert rows[0]["n_symbols_bpe"] < rows[0]["n_symbols_char"]


def test_round0_pairs_rank1_is_first_learned_merge(spark, sf_dir):
    """bpe_round0_pairs' rnk-1 row must equal the trainer's first merge
    (same corpus, same argmax tiebreak) — the oracled deterministic
    stage really is round 0 of bpe_learned_merges.  And the whole table
    must match the reference pair counter at the initial (no-merge)
    segmentation."""
    from collections import Counter as C

    from contentwise_impressions_spark.plans.textops import (
        _bpe_vocab,
        q_bpe_round0_pairs,
    )

    got = {
        (r["lhs"], r["rhs"]): (r["rnk"], r["pair_count"])
        for r in q_bpe_round0_pairs(spark, sf_dir).collect()
    }
    vocab = {
        r["w"]: r["count"] for r in _bpe_vocab(spark, sf_dir).collect()
    }
    pairs: C = C()
    for w, c in vocab.items():
        syms = list(w) + [EOW]
        for a, b in zip(syms, syms[1:]):
            pairs[(a, b)] += c
    ranked = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    expect = {
        pair: (i + 1, cnt) for i, (pair, cnt) in enumerate(ranked)
    }
    assert got == expect
    first = bpe_train_merges(_bpe_vocab(spark, sf_dir), n_merges=1)[0]
    rank1 = next(k for k, (rnk, _) in got.items() if rnk == 1)
    assert rank1 == (first[0], first[1])
    assert got[rank1][1] == first[2]
