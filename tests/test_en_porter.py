"""Porter stemmer (resources/en_porter.py): the paper's canonical step
examples, published vocabulary pairs, analyzer-chain integration
(en_porter dictionary), retrieval co-matching across derivational
families, and best-effort surface-form inversion for highlighting."""

from __future__ import annotations

import pytest

from searchengine_spark.resources.en_porter import (porter_stem,
                                                    porter_surface_forms)

# the Porter 1980 paper's own step examples + classic published pairs
CASES = {
    # step 1a
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat",
    # step 1b (+ fixups)
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
    # full chains
    "generalization": "gener", "oscillators": "oscil",
    "connection": "connect", "connections": "connect",
    "connected": "connect", "connecting": "connect",
}


def test_porter_canonical_pairs():
    bad = {w: (porter_stem(w), e) for w, e in CASES.items()
           if porter_stem(w) != e}
    assert not bad, bad


def test_porter_short_words_untouched():
    for w in ("a", "is", "be", "by", "s", ""):
        assert porter_stem(w) == w


def test_porter_analyzer_chain():
    """en_porter rides the analyzer: stop words drop, irregulars map
    first, everything else stems."""
    from searchengine_spark.functions.analysis import analyze_text
    out = analyze_text("the connections were relational and happy",
                       "general", dictionary="en_porter")
    # 'the'/'and'/'were' are in the en stop list; the rest stem
    assert out == ["connect", "relat", "happi"]
    # irregular map takes precedence over the rule for mapped forms
    from searchengine_spark.resources.en_morph import EN_IRREGULAR
    if EN_IRREGULAR:
        form, lemma = next(iter(sorted(EN_IRREGULAR.items())))
        assert analyze_text(form, "general",
                            dictionary="en_porter") == [lemma]


def test_porter_surface_forms_roundtrip():
    for lemma in ("connect", "hop", "relat", "happi", "file"):
        forms = porter_surface_forms(lemma)
        assert lemma in forms
        for f in forms:
            assert porter_stem(f) == lemma
    assert "connections" in porter_surface_forms("connect")
    assert "hopping" in porter_surface_forms("hop")
    assert "happy" in porter_surface_forms("happi")


def test_porter_retrieval_family_comatch(spark):
    """An en_porter index co-retrieves a whole derivational family under
    any member's query form."""
    from pyspark.sql import functions as F

    from searchengine_spark.operators.indexer import build_index
    from searchengine_spark.operators.search import search
    fam = ["connection", "connected", "connecting", "connects",
           "generalization"]
    rows = [(f"c{i:02d}", 0, "user", f"alpha {w} beta", None,
             "2026-01-01 00:00:00") for i, w in enumerate(fam)]
    rows.append(("c99", 0, "user", "alpha beta gamma", None,
                 "2026-01-01 00:00:00"))
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp"))
    idx = build_index(t, mode="general", dictionary="en_porter")
    hits = {r["conv_id"] for r in
            search(idx, "connection", k=10, mode="bm25").collect()}
    assert hits == {"c00", "c01", "c02", "c03"}  # the connect family
    hits2 = {r["conv_id"] for r in
             search(idx, "generalizations", k=10, mode="bm25").collect()}
    assert hits2 == {"c04"}
