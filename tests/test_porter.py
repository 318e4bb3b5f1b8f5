"""Golden tests for the pure-Python Porter stemmer.

Vocabulary: the worked examples published in Porter, "An algorithm for
suffix stripping" (Program 14(3), 1980) — steps 1a through 5b.  The
reference stems tags with NLTK (Data_manager/TagPreprocessing.py:20-62);
NLTK's default mode layers extensions on this same algorithm, so the
published examples are the citable contract.
"""

import pytest

from contentwise_impressions_spark.functions.porter import porter_stem

GOLDEN = {
    # step 1a
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat",
    # step 1b (+ cleanup)
    "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file",
    # step 1c
    "happy": "happi", "sky": "sky",
    # step 2
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic",
    "differentli": "differ", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic",
    "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl",
    # step 3
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "homologou": "homolog",
    "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
}


@pytest.mark.parametrize("word,stem", sorted(GOLDEN.items()))
def test_published_examples(word, stem):
    assert porter_stem(word) == stem


def test_short_and_nonalpha_unchanged():
    assert porter_stem("a") == "a"
    assert porter_stem("at") == "at"
    assert porter_stem("x1y") == "x1y"


def test_idempotent_on_stems():
    # stems of the golden set re-stem to themselves or a stable fixpoint
    for stem in GOLDEN.values():
        assert porter_stem(porter_stem(stem)) == porter_stem(stem)
