"""minimum-should-match (`min_match=`) parity vs brute force.

bm25 mode scores docs matching ANY query term; min_match=m keeps docs
matching >= m distinct resolved terms (m=1 == plain OR, m=n == AND).
No reference analog (its query language is conjunctive-only, Q6 at
services/SearchingServiceImpl.java:95-108) — this is the standard
Lucene/Elasticsearch middle ground.
"""

from __future__ import annotations

import pytest

from searchengine_spark.operators.search import search, search_many
from tests.golden_model import golden_analyze, K1, B

K = 10
MULTI = ["лес дом", "система файл код", "ошибка лес", "timeout лес merge"]


def _golden_min_match(g, query: str, m: int, k: int = K):
    qterms = sorted(set(golden_analyze(query, g.mode)))
    found = [t for t in qterms if g.df.get(t, 0) > 0]
    acc: dict[int, float] = {}
    nt: dict[int, int] = {}
    for t in found:
        idf = g._idf(t)
        for did in range(g.n_docs):
            tf = g.tf[did].get(t, 0)
            if tf:
                s = idf * (tf * (K1 + 1.0)) / (
                    tf + K1 * (1.0 - B + B * g.dl[did] / g.avgdl))
                acc[did] = acc.get(did, 0.0) + s
                nt[did] = nt.get(did, 0) + 1
    scored = [(d, v) for d, v in acc.items() if nt[d] >= m]
    scored.sort(key=lambda p: (-round(p[1], 9), p[0]))
    return scored[:k]


def _got(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def _check(got, expected, ctx):
    assert len(got) == len(expected), (ctx, got, expected)
    for (gd, gs), (ed, es) in zip(got, expected):
        assert gd == ed and abs(gs - es) < 1e-9, (ctx, got, expected)


@pytest.mark.parametrize("query", MULTI)
@pytest.mark.parametrize("m", [2, 3])
def test_min_match_brute_force(index_general, golden_general, query, m):
    got = _got(search(index_general, query, k=K, min_match=m))
    expected = _golden_min_match(golden_general, query, m)
    _check(got, expected, (query, m))


def test_min_match_one_equals_plain(index_general):
    q = "ошибка лес"
    plain = _got(search(index_general, q, k=K))
    mm = _got(search(index_general, q, k=K, min_match=1))
    _check(mm, plain, "m=1")


def test_min_match_above_arity_empty(index_general):
    assert search(index_general, "лес дом", k=K, min_match=5).count() == 0


def test_min_match_ref_compat_raises(index_ref):
    with pytest.raises(ValueError, match="min_match"):
        search(index_ref, "лес дом", mode="ref_compat", min_match=2)


def test_min_match_invalid_raises(index_general):
    with pytest.raises(ValueError, match="min_match"):
        search(index_general, "лес дом", min_match=0)


def test_min_match_with_exclude(index_general, golden_general):
    # threshold applies to surviving docs after the NOT anti-join
    q, m = "система файл код", 2
    got = _got(search(index_general, q, k=K, min_match=m, exclude="ошибка"))
    banned = {did for did in range(golden_general.n_docs)
              if golden_general.tf[did].get("ошибка", 0) > 0}
    expected = [(d, s) for d, s in
                _golden_min_match(golden_general, q, m, k=golden_general.n_docs)
                if d not in banned][:K]
    _check(got, expected, "min_match+exclude")


def test_min_match_batched_equals_single(index_general):
    qs = {"a": "лес дом", "b": "система файл код", "c": "ошибка лес"}
    mm = {"a": 2, "b": 3}  # c absent -> default 1 (plain OR)
    batched = search_many(index_general, qs, k=K, min_match=mm)
    rows = {(r["query_id"], r["rank"]): (r["doc_id"], r["score"])
            for r in batched.collect()}
    for qid, q in qs.items():
        single = _got(search(index_general, q, k=K, min_match=mm.get(qid, 1)))
        got = [rows[(qid, i + 1)] for i in range(len(single))]
        _check(got, single, ("batched", qid))
        assert (qid, len(single) + 1) not in rows


def test_min_match_batched_shared_int(index_general):
    qs = {"a": "лес дом", "b": "ошибка лес"}
    batched = search_many(index_general, qs, k=K, min_match=2)
    rows = {(r["query_id"], r["rank"]): (r["doc_id"], r["score"])
            for r in batched.collect()}
    for qid, q in qs.items():
        single = _got(search(index_general, q, k=K, min_match=2))
        got = [rows[(qid, i + 1)] for i in range(len(single))]
        _check(got, single, ("batched-int", qid))
