"""Batched multi-query search == per-query search, row for row."""

from __future__ import annotations

import pytest

from searchengine_spark.operators.search import search, search_many
from tests.conftest import load_queries

QUERIES = {f"q{i}": q for i, q in enumerate(load_queries()[:8])}


@pytest.mark.parametrize("mode", ["bm25", "ref_compat"])
def test_search_many_matches_single(index_general, index_ref, mode):
    index = index_general if mode == "bm25" else index_ref
    batch = search_many(index, QUERIES, k=10, mode=mode).collect()
    by_q: dict[str, list] = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, qtext in QUERIES.items():
        single = search(index, qtext, k=10, mode=mode).collect()
        got = sorted(by_q.get(qid, []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in single], (mode, qid)
        for g, s in zip(got, single):
            assert abs(g["score"] - s["score"]) < 1e-9, (mode, qid)
            assert g["conv_id"] == s["conv_id"] and g["turn_idx"] == s["turn_idx"]


@pytest.mark.parametrize("mode", ["bm25", "ref_compat"])
def test_search_many_offset_matches_single(index_general, index_ref, mode):
    """Batched pagination == per-query search(offset=): page 2 of every
    query in one job, absolute ranks preserved."""
    index = index_general if mode == "bm25" else index_ref
    batch = search_many(index, QUERIES, k=5, mode=mode, offset=5).collect()
    by_q: dict[str, list] = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, qtext in QUERIES.items():
        single = search(index, qtext, k=5, mode=mode, offset=5).collect()
        got = sorted(by_q.get(qid, []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in single], (mode, qid)
        assert all(r["rank"] > 5 for r in got)
        for g, s in zip(got, single):
            assert abs(g["score"] - s["score"]) < 1e-9, (mode, qid)


def test_search_many_empty_and_unknown(index_general):
    out = search_many(index_general, {"a": "", "b": "zzzznotaword"}, k=5).collect()
    assert out == []


@pytest.mark.parametrize("mode", ["bm25", "ref_compat"])
def test_search_many_scoped_matches_single(index_general, index_ref, mode):
    """Batched + scope == per-query scoped search, row for row (including
    ref_compat's per-scope df prune / arity adjustment)."""
    index = index_general if mode == "bm25" else index_ref
    scope = "conv00000"  # conv000000..conv000009 — a strict subset
    batch = search_many(index, QUERIES, k=10, mode=mode, scope=scope).collect()
    by_q: dict[str, list] = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, qtext in QUERIES.items():
        single = search(index, qtext, k=10, mode=mode, scope=scope).collect()
        got = sorted(by_q.get(qid, []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in single], (mode, qid)
        for g, s in zip(got, single):
            assert abs(g["score"] - s["score"]) < 1e-9, (mode, qid)


def test_search_many_snippets_match_single(index_general):
    """Each batched hit is highlighted with its OWN query's word set and
    equals the single-query snippet string exactly."""
    qs = {k: v for k, v in list(QUERIES.items())[:3]}
    batch = search_many(index_general, qs, k=5, with_snippets=True).collect()
    by_q: dict[str, list] = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append(r)
    assert all("snippet" in r.asDict() for r in batch)
    for qid, qtext in qs.items():
        single = search(index_general, qtext, k=5, with_snippets=True).collect()
        got = sorted(by_q.get(qid, []), key=lambda r: r["rank"])
        assert [(r["doc_id"], r["snippet"]) for r in got] == \
               [(r["doc_id"], r["snippet"]) for r in single], qid
