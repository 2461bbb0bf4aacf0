"""rescore_search: two-phase BM25 + proximity rescoring must equal the
explicit composition of its independently golden-tested primitives
(search top-n ⊕ span_search spans)."""

from __future__ import annotations

import pytest

from searchengine_spark.operators.search import (rescore_search, search,
                                                 span_search)

from tests.test_span import span_corpus  # noqa: F401 (pytest fixture)


def _expected(idx, query, k, n, window, weight, ordered=False):
    base = [(r["doc_id"], r["score"]) for r in
            search(idx, query, k=n, mode="bm25").collect()]
    spans = {r["doc_id"]: r["span"] for r in
             span_search(idx, query, window=window, k=10 ** 6,
                         ordered=ordered).collect()}
    combined = [(d, s + (weight / (1.0 + spans[d]) if d in spans else 0.0))
                for d, s in base]
    combined.sort(key=lambda p: (-round(p[1], 9), p[0]))
    return combined[:k]


@pytest.mark.parametrize("query,window", [("alpha beta", 3),
                                          ("alpha beta gamma", 6)])
def test_rescore_matches_composition(span_corpus, query, window):
    idx, _ = span_corpus
    got = [(r["doc_id"], r["score"]) for r in
           rescore_search(idx, query, k=15, n=40, window=window,
                          weight=2.0).collect()]
    exp = _expected(idx, query, 15, 40, window, 2.0)
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (_, gs), (_, es) in zip(got, exp):
        assert abs(gs - es) < 1e-9


def test_rescore_ordered(span_corpus):
    idx, _ = span_corpus
    got = [(r["doc_id"], r["score"]) for r in
           rescore_search(idx, "beta alpha", k=15, n=40, window=4,
                          weight=2.0, ordered=True).collect()]
    exp = _expected(idx, "beta alpha", 15, 40, 4, 2.0, ordered=True)
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (_, gs), (_, es) in zip(got, exp):
        assert abs(gs - es) < 1e-9


def test_rescore_zero_weight_is_plain_search(span_corpus):
    idx, _ = span_corpus
    got = [(r["doc_id"], round(r["score"], 9)) for r in
           rescore_search(idx, "alpha beta", k=10, n=40, window=3,
                          weight=0.0).collect()]
    plain = [(r["doc_id"], round(r["score"], 9)) for r in
             search(idx, "alpha beta", k=10, mode="bm25").collect()]
    assert got == plain


def test_rescore_promotes_proximal_doc(span_corpus):
    # with a huge weight, every doc with an in-window span must outrank
    # every doc without one
    idx, _ = span_corpus
    rows = rescore_search(idx, "alpha beta gamma", k=40, n=40, window=4,
                          weight=1000.0).collect()
    spans = {r["doc_id"] for r in
             span_search(idx, "alpha beta gamma", window=4,
                         k=10 ** 6).collect()}
    flags = [r["doc_id"] in spans for r in rows]
    assert True in flags
    assert flags == sorted(flags, reverse=True)  # all boosted docs first
