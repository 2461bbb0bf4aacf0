"""Prefix-doubling suffix-rank exact-substring dedup (functions/suffix.py).

Contract: row-identical output to the windowed relaxation
(dedup_repeated_ngrams) at window == min_len — same covered tokens, same
first-occurrence rule, same reassembly — while doing O(n log L) work
instead of O(n·L). Plus suffix-rank correctness (window identity ==
string equality) and doc-boundary isolation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from searchengine_spark.functions.suffix import (dedup_exact_substr,
                                                 suffix_window_ranks)
from searchengine_spark.functions.text import dedup_repeated_ngrams

BOILER = " please subscribe to our channel and hit the bell icon now"
FIXED = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
         "eiusmod tempor incididunt ut labore")


@pytest.fixture(scope="module")
def shaped(spark, corpus_df):
    """The driver-oracle shaping: every 50th doc replaced by one fixed
    paragraph (mutual full-doc duplicates), every 3rd doc gets an
    11-token boilerplate suffix."""
    docs = (corpus_df.orderBy("conv_id", "turn_idx").limit(120)
            .withColumn("doc_id",
                        F.row_number().over(
                            Window.orderBy("conv_id", "turn_idx")) - 1)
            .select("doc_id", "text"))
    return docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 50 == 9, F.lit(FIXED))
        .when(F.col("doc_id") % 3 == 0, F.concat("text", F.lit(BOILER)))
        .otherwise(F.col("text"))).persist()


def _collect(df):
    return {r["doc_id"]: (r["text"], r["n_removed"]) for r in df.collect()}


@pytest.mark.parametrize("L", [5, 8, 11])
def test_parity_with_windowed_op(shaped, L):
    sa = _collect(dedup_exact_substr(shaped, min_len=L))
    win = _collect(dedup_repeated_ngrams(shaped, window=L))
    assert sa == win
    # the shaping actually removes something at window<=11
    assert any(n for _, n in sa.values())


def test_full_doc_duplicates_empty(spark):
    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta")
            for i in range(3)] + [(9, "totally different text here ok")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = _collect(dedup_exact_substr(df, min_len=8))
    assert out[0][0] != "" and out[0][1] == 0  # first kept whole
    assert out[1] == ("", 8) and out[2] == ("", 8)
    assert out[9][1] == 0


def test_no_cross_document_matches(spark):
    """The concatenated rank stream must never match a span that only
    exists ACROSS a doc boundary: docs 0+1 concatenated spell doc 2's
    text, but no single doc duplicates it."""
    rows = [(0, "p q r"), (1, "s t u"), (2, "p q r s t u")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = _collect(dedup_exact_substr(df, min_len=6))
    assert all(n == 0 for _, n in out.values())
    assert out[2][0] == "p q r s t u"


def test_min_len_longer_than_docs_passthrough(spark):
    rows = [(0, "a b c"), (1, "a b c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = _collect(dedup_exact_substr(df, min_len=10))
    assert out[0] == ("a b c", 0) and out[1] == ("a b c", 0)
    # at min_len == doc length the exact duplicate IS caught
    out2 = _collect(dedup_exact_substr(df, min_len=3))
    assert out2[0] == ("a b c", 0) and out2[1] == ("", 3)


@pytest.mark.parametrize("L", [3, 4, 7])
def test_window_ranks_are_exact_string_identity(spark, L):
    """(ra, rb) equality must coincide EXACTLY with window string
    equality — brute-force over every window pair of a mixed corpus."""
    rows = [(0, "a b c a b c a b x y z w"),
            (1, "c a b c a b x q a b c a"),
            (2, "z w a b c a b c a b x y")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    words = F.filter(F.split(F.col("text"), r"\s+"),
                     lambda w: w != F.lit(""))
    base = (df.select(F.col("doc_id").alias("_id"), words.alias("_w"))
            .withColumn("_n", F.size("_w")))
    ranks = {(r["_id"], r["pos"]): (r["ra"], r["rb"])
             for r in suffix_window_ranks(base, L).collect()}
    texts = {r["doc_id"]: r["text"].split() for r in df.collect()}
    wins = {(d, p): tuple(t[p:p + L]) for d, t in texts.items()
            for p in range(len(t) - L + 1)}
    assert set(ranks) == set(wins)
    keys = list(wins)
    for i in range(len(keys)):
        for j in range(i + 1, len(keys)):
            a, b = keys[i], keys[j]
            assert ((wins[a] == wins[b]) == (ranks[a] == ranks[b])), (a, b)
