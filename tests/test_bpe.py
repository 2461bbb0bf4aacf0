"""BPE merge training + subword encoding (functions/bpe.py)."""

from __future__ import annotations

import pytest

from searchengine_spark.functions.bpe import (EOW, _encode_word, bpe_encode,
                                              bpe_merges_df, train_bpe)


@pytest.fixture(scope="module")
def corpus(spark):
    # the classic Sennrich example frequencies: low×5 lower×2 newest×6
    # widest×3 — one word per row times its count, plus punctuation noise
    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    rows = [(i, w + "!") for i, w in enumerate(words)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _reference_bpe(word_counts: dict, n_merges: int) -> list:
    """Independent minimal loop (the Sennrich pseudocode) for parity."""
    vocab = {tuple(list(w) + [EOW]): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        stats: dict = {}
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                stats[(sym[i], sym[i + 1])] = \
                    stats.get((sym[i], sym[i + 1]), 0) + c
        if not stats or max(stats.values()) < 2:
            break
        pair = min(p for p, c in stats.items()
                   if c == max(stats.values()))
        merges.append(pair)
        a, b = pair
        nv: dict = {}
        for sym, c in vocab.items():
            i, ns = 0, []
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(sym[i])
                    i += 1
            nv[tuple(ns)] = nv.get(tuple(ns), 0) + c
        vocab = nv
    return merges


def test_merges_match_reference(corpus):
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    model = train_bpe(corpus, n_merges=10)
    assert model["merges"] == _reference_bpe(counts, 10)
    # the classic first merges on this corpus: ('e','s') then ('es','t')
    assert model["merges"][0] == ("e", "s")
    assert model["merges"][1] == ("es", "t")


def test_uniform_weighting_ignores_counts(corpus, spark):
    """Uniform weighting depends only on the word SET: a corpus with the
    same types at different frequencies learns the same merges."""
    m1 = train_bpe(corpus, n_merges=10, weighting="uniform")
    other = spark.createDataFrame(
        [(0, "low lower"), (1, "newest widest newest")],
        "doc_id long, text string")
    m2 = train_bpe(other, n_merges=10, weighting="uniform")
    assert m1["merges"] == m2["merges"]
    ref = _reference_bpe({w: 1 for w in ("low", "lower", "newest",
                                         "widest")}, 10)
    assert m1["merges"] == ref


def test_encode_greedy_rank_order(corpus):
    model = train_bpe(corpus, n_merges=10)
    ranks = model["ranks"]
    # a training word round-trips through its learned merges
    enc = _encode_word("newest", ranks)
    assert "".join(enc) == "newest" + EOW
    assert len(enc) < len("newest") + 1  # actually merged something
    # unseen characters stay single symbols (open vocabulary)
    zz = _encode_word("zq", ranks)
    assert zz == ["z", "q", EOW] or zz == ["z", "q" + EOW]
    out = {r["doc_id"]: (r["subwords"], r["n_subwords"])
           for r in bpe_encode(corpus, model).collect()}
    for did, (sub, n) in out.items():
        assert n == len(sub) and n >= 1
        assert "".join(sub).endswith(EOW)


def test_merges_df_shape(corpus, spark):
    model = train_bpe(corpus, n_merges=6)
    rows = bpe_merges_df(spark, model).collect()
    assert [(r["rank"], r["left"], r["right"]) for r in rows] == \
        [(i, p[0], p[1]) for i, p in enumerate(model["merges"])]
    assert len(rows) <= 6


def test_validation(corpus):
    with pytest.raises(ValueError, match="weighting"):
        train_bpe(corpus, weighting="tfidf")
