"""Pure-Python Porter stemmer (Porter, "An algorithm for suffix
stripping", Program 14(3) 1980) — dependency-free replacement for the
NLTK PorterStemmer the reference uses in tag preprocessing
(Data_manager/TagPreprocessing.py:20-62).

This is the ORIGINAL published algorithm (steps 1a-5b with the m-measure
conditions exactly as specified).  NLTK's default mode adds a handful of
extensions (an irregular-forms pool and tweaked 1a/1c rules); those
divergences affect a small closed word set and are documented here rather
than replicated — the published algorithm is the citable contract.

Vectorization note: stemming is inherently per-token string rewriting
with data-dependent branching — not expressible in Spark SQL expressions.
The engine applies it through an Arrow-batched pandas UDF over DISTINCT
tokens only (the token vocabulary is orders of magnitude smaller than the
token stream), then maps the stream through the vocabulary with a
broadcast join — Python cost is O(|vocab|), not O(|corpus|).
"""

from __future__ import annotations

import sys

try:  # by-value pickling: pandas-UDF closures reference this module, and
    # workers may not have the repo on their import path (see slim.py note)
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

_VOWELS = "aeiou"


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _m(stem: str) -> int:
    """m = number of VC sequences in [C](VC){m}[V]."""
    m = 0
    prev_v = False
    for i in range(len(stem)):
        v = not _is_cons(stem, i)
        if not v and prev_v:
            m += 1
        prev_v = v
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    if len(word) < 3:
        return False
    return (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
        and word[-1] not in "wxy"
    )


def porter_stem(word: str) -> str:
    """Stem one lowercase word; non-alpha input is returned unchanged."""
    w = word
    if len(w) <= 2 or not w.isalpha():
        return w

    # ---- step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # ---- step 1b
    if w.endswith("eed"):
        if _m(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w, flag = w[:-2], True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w, flag = w[:-3], True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w = w + "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _m(w) == 1 and _cvc(w):
                w = w + "e"

    # ---- step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # ---- step 2 (m>0 conditions)
    step2 = [
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
        ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
        ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
        ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
        ("biliti", "ble"),
    ]
    for suf, rep in step2:
        if w.endswith(suf):
            if _m(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # ---- step 3 (m>0 conditions)
    step3 = [
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ]
    for suf, rep in step3:
        if w.endswith(suf):
            if _m(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # ---- step 4 (m>1 conditions; (m>1 and (*S or *T)) for -ion)
    step4 = [
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ]
    for suf in step4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if suf == "ion":
                if _m(stem) > 1 and stem and stem[-1] in "st":
                    w = stem
            elif _m(stem) > 1:
                w = stem
            break

    # ---- step 5a
    if w.endswith("e"):
        stem = w[:-1]
        if _m(stem) > 1 or (_m(stem) == 1 and not _cvc(stem)):
            w = stem

    # ---- step 5b
    if _m(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w
