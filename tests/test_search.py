"""Query-path parity: Spark engine vs golden model, rank-identical top-k.

Covers ref_compat (conjunctive AND + 80% prune + normalized tf-sum) and BM25,
compressed-vs-flat equivalence, and block-max pruning exactness.
"""

from __future__ import annotations

import pytest

from searchengine_spark.operators.search import search, search_flat
from tests.conftest import load_queries

QUERIES = load_queries()
K = 10


def _spark_topk(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def _assert_rank_identical(got, expected, ctx):
    assert len(got) == len(expected), (ctx, got, expected)
    for (gd, gs), (ed, es) in zip(got, expected):
        assert gd == ed, (ctx, got, expected)
        assert abs(gs - es) < 1e-9, (ctx, gd, gs, es)


@pytest.mark.parametrize("query", QUERIES)
def test_ref_compat_rank_identical(index_ref, golden_ref, query):
    got = _spark_topk(search(index_ref, query, k=K, mode="ref_compat"))
    expected = golden_ref.search(query, k=K, mode="ref_compat")
    _assert_rank_identical(got, expected, ("ref_compat", query))


@pytest.mark.parametrize("query", QUERIES)
def test_bm25_rank_identical(index_general, golden_general, query):
    got = _spark_topk(search(index_general, query, k=K, mode="bm25"))
    expected = golden_general.search(query, k=K, mode="bm25")
    _assert_rank_identical(got, expected, ("bm25", query))


@pytest.mark.parametrize("query", QUERIES[:6])
def test_pruned_equals_exhaustive(index_general, query):
    pruned = _spark_topk(search(index_general, query, k=K, mode="bm25", prune_blocks=True))
    full = _spark_topk(search(index_general, query, k=K, mode="bm25", prune_blocks=False))
    _assert_rank_identical(pruned, full, ("wand", query))


@pytest.mark.parametrize("query", QUERIES[:6])
def test_flat_equals_compressed(index_ref, golden_ref, query):
    flat = [(r["doc_id"], r["score"]) for r in
            search_flat(index_ref, query, k=K, mode="ref_compat").collect()]
    expected = golden_ref.search(query, k=K, mode="ref_compat")
    _assert_rank_identical(flat, expected, ("flat", query))


def test_empty_query(index_general):
    assert search(index_general, "", k=K).count() == 0
    assert search(index_general, "   !!! ", k=K).count() == 0


def test_metadata_projection(index_general, golden_general):
    """Q9: top-k rows carry the doc metadata, matching the source row."""
    rows = search(index_general, "лес дом", k=5, mode="bm25").collect()
    assert rows, "expected matches for 'лес дом'"
    by_key = {(d["conv_id"], d["turn_idx"]): d for d in golden_general.docs}
    for r in rows:
        src = by_key[(r["conv_id"], r["turn_idx"])]
        assert r["role"] == src["role"]
        assert (r["tool"] or None) == (src["tool"] or None)
