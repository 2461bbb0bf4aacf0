"""Batched query-language replay: query_search_many == a loop of
query_search, row-for-row, across the grammar matrix (terms, phrases,
spans, OR-groups, NOT clauses, metadata qualifiers, degenerate/empty
queries) × modes × scope × offset × snippets — on the tiny positional
corpus shared with test_querylang."""

from __future__ import annotations

from searchengine_spark.operators.querylang import (query_search,
                                                    query_search_many)

from tests.test_querylang import qpos_index  # noqa: F401 (pytest fixture)

# every grammar feature + the per-query empty/no-op semantics, replayed
# as ONE batch
QUERIES = {
    "t1": "alpha gamma",                          # plain terms
    "t2": "alpha -gamma",                         # NOT term
    "p1": '"alpha beta"',                         # phrase filter
    "p2": 'gamma "alpha beta"',                   # phrase + bare term
    "np": 'alpha -"beta gamma"',                  # NOT phrase
    "s1": 'beta "alpha gamma"~1',                 # span clause
    "s2": 'beta "alpha gamma"~2',                 # looser span
    "ns": 'alpha -"alpha gamma"~1',               # NOT span
    "rx": '/.*ta/ gamma',                         # regex OR-group
    "nrx": 'alpha -/.*mma/',                      # NOT regex
    "deadrx": 'alpha /zz.*q/',                    # no-match regex → dead
    "xq": "alpha exists:tool",                    # exists qualifier
    "nxq": "alpha -exists:tool",                  # negated exists
    "os1": 'beta "alpha gamma"~2!',               # ordered span
    "os2": 'beta "alpha gamma"~1!',               # ordered span: no match
    "os3": 'beta "gamma alpha"~1!',               # order-sensitivity
    "nos": 'alpha -"gamma alpha"~1!',             # NOT ordered span
    "g1": "(gamma|delta) alpha",                  # OR-group
    "g2": '(gamma|epsilon) "alpha beta" -delta',  # group ∩ phrase ∩ NOT
    "q1": "alpha role:assistant",                 # qualifier-only (site-like)
    "q2": "alpha site:x00 tool:bash",             # two qualifiers
    "q3": "alpha -tool:bash",                     # negated (null-safe)
    "qp": '"alpha beta" role:user',               # qualifier + phrase
    "dead": 'alpha "beta zzznope"',               # unmatchable positive
    "noop": 'alpha -"beta zzznope"',              # unmatchable NOT → no-op
    "notonly": "-alpha",                          # no positive words
    "deadgrp": "(zzznope|yyynope) alpha",         # unsatisfiable group
}


def _opt_cols(df):
    return [c for c in ("title", "snippet") if c in df.columns]


def _single_rows(index, qstr, **kw):
    df = query_search(index, qstr, k=kw.pop("k", 10), **kw)
    cols = ["doc_id", "score"] + _opt_cols(df)
    return [tuple(r[c] for c in cols) for r in df.collect()]


def _batched_rows(index, queries, **kw):
    df = query_search_many(index, queries, k=kw.pop("k", 10), **kw)
    cols = ["doc_id", "score"] + _opt_cols(df)
    out: dict[str, list] = {}
    for r in df.orderBy("query_id", "rank").collect():
        out.setdefault(r["query_id"], []).append(
            tuple(r[c] for c in cols))
    return out


def _assert_parity(index, queries, **kw):
    got = _batched_rows(index, queries, **kw)
    nonempty = 0
    for qid, qstr in queries.items():
        exp = _single_rows(index, qstr, **kw)
        assert got.get(qid, []) == exp, (
            f"{qid!r} ({qstr!r}, {kw}): batched {got.get(qid, [])} "
            f"!= single {exp}")
        nonempty += bool(exp)
    assert nonempty >= 3  # the matrix must be non-vacuous


def test_parity_bm25(qpos_index):
    _assert_parity(qpos_index, QUERIES, mode="bm25")


def test_parity_bm25_scoped(qpos_index):
    _assert_parity(qpos_index, QUERIES, mode="bm25", scope="x00")


def test_parity_ref_compat(qpos_index):
    _assert_parity(qpos_index, QUERIES, mode="ref_compat")


def test_parity_ref_compat_scoped(qpos_index):
    _assert_parity(qpos_index, QUERIES, mode="ref_compat", scope="x00")


def test_parity_offset(qpos_index):
    sub = {q: QUERIES[q] for q in ("t1", "p1", "g1", "q1")}
    _assert_parity(qpos_index, sub, offset=2)


def test_parity_snippets(qpos_index):
    sub = {q: QUERIES[q] for q in ("t1", "p2", "g1", "np")}
    _assert_parity(qpos_index, sub, with_snippets=True)


def test_parity_titles(qpos_index):
    sub = {q: QUERIES[q] for q in ("t1", "p1", "q1", "g1")}
    _assert_parity(qpos_index, sub, with_titles=True)
    _assert_parity(qpos_index, sub, with_titles=True, with_snippets=True)


def test_all_empty_batch(qpos_index):
    out = query_search_many(
        qpos_index, {"a": "-alpha", "b": "", "c": 'alpha "beta zzznope"'})
    assert out.count() == 0


def test_empty_scope(qpos_index):
    assert query_search_many(qpos_index, {"a": "alpha"},
                             scope="nope").count() == 0
