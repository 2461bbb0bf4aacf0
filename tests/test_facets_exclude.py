"""NOT-clause (``search(..., exclude=)``) and facet counts (``search_facets``).

Golden checks are brute-force loops over the GoldenIndex's tf tables —
independent of every engine code path (anti-join, WAND phase-1 routing,
bucket pruning).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.search import search, search_facets
from tests.golden_model import golden_analyze

K = 10

# (query, exclude): mid-frequency exclusions + one ultra-hot (ошибку ~60% df —
# exclusion must NOT be df-pruned even in ref_compat mode)
CASES = [("лес дом", "вода"), ("ошибка лес", "дом"),
         ("запрос индекс", "лесом"), ("лес дом", "ошибку")]


def _banned(golden, exclude):
    xterms = sorted(set(golden_analyze(exclude, golden.mode)))
    return {did for did in range(golden.n_docs)
            if any(golden.tf[did].get(t, 0) for t in xterms)}


def _golden_bm25_not(golden, query, exclude, k):
    full = golden.search(query, k=golden.n_docs, mode="bm25")
    banned = _banned(golden, exclude)
    return [(d, s) for d, s in full if d not in banned][:k]


def _golden_ref_not(golden, query, exclude, k):
    """ref_compat with NOT: conjunctive matches minus banned docs, tf-sum
    normalized by the max over the SURVIVORS (the documented semantics)."""
    qterms = sorted(set(golden_analyze(query, golden.mode)))
    found = [t for t in qterms if golden.df.get(t, 0) > 0
             and golden.df[t] / golden.n_docs < 0.8]
    if not found:
        return []
    banned = _banned(golden, exclude)
    matches = {}
    for did in range(golden.n_docs):
        if did in banned:
            continue
        if all(golden.tf[did].get(t, 0) > 0 for t in found):
            matches[did] = float(sum(golden.tf[did][t] for t in found))
    if not matches:
        return []
    mx = max(matches.values())
    scored = sorted(((d, v / mx) for d, v in matches.items()),
                    key=lambda p: (-round(p[1], 9), p[0]))
    return scored[:k]


def _topk(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def _assert_rank_identical(got, expected, ctx):
    assert len(got) == len(expected), (ctx, got, expected)
    for (gd, gs), (ed, es) in zip(got, expected):
        assert gd == ed, (ctx, got, expected)
        assert abs(gs - es) < 1e-9, (ctx, gd, gs, es)


@pytest.mark.parametrize("query,exclude", CASES)
def test_bm25_exclude_golden(index_general, golden_general, query, exclude):
    got = _topk(search(index_general, query, k=K, mode="bm25",
                       exclude=exclude))
    expected = _golden_bm25_not(golden_general, query, exclude, K)
    _assert_rank_identical(got, expected, ("bm25-not", query, exclude))
    # and the exclusion is real: no excluded doc in an unlimited result
    banned = _banned(golden_general, exclude)
    all_hits = _topk(search(index_general, query, k=golden_general.n_docs,
                            mode="bm25", exclude=exclude))
    assert not ({d for d, _ in all_hits} & banned)


@pytest.mark.parametrize("query,exclude", CASES[:2])
def test_ref_compat_exclude_golden(index_ref, golden_ref, query, exclude):
    got = _topk(search(index_ref, query, k=K, mode="ref_compat",
                       exclude=exclude))
    expected = _golden_ref_not(golden_ref, query, exclude, K)
    _assert_rank_identical(got, expected, ("ref-not", query, exclude))


@pytest.mark.parametrize("query,exclude", CASES[:2])
def test_exclude_wand_parity(index_general, query, exclude):
    """Forced block-max pruning with a NOT clause == exhaustive decode:
    θ must come from post-exclusion candidates (distributed phase 1)."""
    pruned = _topk(search(index_general, query, k=K, mode="bm25",
                          exclude=exclude, prune_blocks=True))
    full = _topk(search(index_general, query, k=K, mode="bm25",
                        exclude=exclude, prune_blocks=False))
    _assert_rank_identical(pruned, full, ("wand-not", query, exclude))


def test_exclude_absent_term_noop(index_general):
    plain = _topk(search(index_general, "лес дом", k=K, mode="bm25"))
    noop = _topk(search(index_general, "лес дом", k=K, mode="bm25",
                        exclude="феноменальность"))
    _assert_rank_identical(noop, plain, "absent-exclude")


def test_exclude_everything(index_general):
    """Excluding a query's own term empties the result (docs matching only
    the other term survive — verify against golden)."""
    got = _topk(search(index_general, "лесом", k=K, mode="bm25",
                       exclude="лес"))
    assert got == []


def test_exclude_with_scope(index_general, golden_general):
    """NOT composes with scope: survivors are in-scope AND not banned."""
    prefix = "conv0000"  # conv000000..conv000009: a contiguous sub-range
    got = _topk(search(index_general, "лес дом", k=K, mode="bm25",
                       scope=prefix, exclude="вода"))
    banned = _banned(golden_general, "вода")
    full = golden_general.search("лес дом", k=golden_general.n_docs,
                                 mode="bm25")
    expected = [(d, s) for d, s in full if d not in banned
                and golden_general.docs[d]["conv_id"].startswith(prefix)][:K]
    # scoped BM25 keeps corpus-wide idf/avgdl → golden scores carry over
    _assert_rank_identical(got, expected, "scope+not")


def test_search_many_exclude_parity(index_general):
    """Batched per-query NOT == per-query search(..., exclude=), row for
    row (the batched contract)."""
    from searchengine_spark.operators.search import search_many
    batch = {"a": "лес дом", "b": "ошибка лес"}
    excl = {"a": "вода", "b": "дом"}
    out = search_many(index_general, batch, k=K, mode="bm25", exclude=excl)
    rows = {(r["query_id"], r["rank"]): (r["doc_id"], r["score"])
            for r in out.collect()}
    for qid, qtext in batch.items():
        single = _topk(search(index_general, qtext, k=K, mode="bm25",
                              exclude=excl[qid]))
        got = [rows[(qid, i + 1)] for i in range(len(single))]
        _assert_rank_identical(got, single, ("many-not", qid))
        assert len([key for key in rows if key[0] == qid]) == len(single)


def test_search_many_exclude_shared_ref(index_ref):
    """One shared NOT string applies to every batch member; ref_compat
    normalization is over each query's survivors."""
    from searchengine_spark.operators.search import search_many
    batch = {"a": "лес дом", "b": "ошибка лес"}
    out = search_many(index_ref, batch, k=K, mode="ref_compat",
                      exclude="вода")
    rows = {(r["query_id"], r["rank"]): (r["doc_id"], r["score"])
            for r in out.collect()}
    for qid, qtext in batch.items():
        single = _topk(search(index_ref, qtext, k=K, mode="ref_compat",
                              exclude="вода"))
        got = [rows[(qid, i + 1)] for i in range(len(single))]
        _assert_rank_identical(got, single, ("many-not-ref", qid))


# ---------------------------------------------------------------------------
# facets
# ---------------------------------------------------------------------------

def _golden_facets(golden, query, by, require_all, exclude=None, prefix=None):
    qterms = sorted(set(golden_analyze(query, golden.mode)))
    found = [t for t in qterms if golden.df.get(t, 0) > 0]
    banned = _banned(golden, exclude) if exclude else frozenset()
    counts: dict[str, int] = {}
    if not found:
        return counts
    for did in range(golden.n_docs):
        if did in banned:
            continue
        if prefix and not golden.docs[did]["conv_id"].startswith(prefix):
            continue
        n_hit = sum(1 for t in found if golden.tf[did].get(t, 0))
        ok = (n_hit == len(found)) if require_all else (n_hit > 0)
        if ok:
            key = golden.docs[did][by]
            key = str(key) if key is not None else None
            counts[key] = counts.get(key, 0) + 1
    return counts


def _facet_dict(df):
    return {r["facet"]: r["n_docs"] for r in df.collect()}


def test_facets_by_role_any(index_general, golden_general):
    got = _facet_dict(search_facets(index_general, "лес дом", by="role"))
    expected = _golden_facets(golden_general, "лес дом", "role", False)
    assert got == expected
    assert sum(got.values()) > 0


def test_facets_by_tool_require_all(index_general, golden_general):
    got = _facet_dict(search_facets(index_general, "лес дом", by="tool",
                                    require_all=True))
    expected = _golden_facets(golden_general, "лес дом", "tool", True)
    assert got == expected


def test_facets_expression_scope_exclude(index_general, golden_general):
    """Facet by a Column expression, composed with scope and NOT."""
    got = _facet_dict(search_facets(
        index_general, "лес дом", by=F.substring(F.col("conv_id"), 1, 8),
        scope="conv0000", exclude="вода"))
    expected: dict[str, int] = {}
    per_doc = _golden_facets(golden_general, "лес дом", "conv_id", False,
                             exclude="вода", prefix="conv0000")
    for conv, n in per_doc.items():
        key = conv[:8]
        expected[key] = expected.get(key, 0) + n
    assert got == expected


def test_facets_empty_query(index_general):
    assert search_facets(index_general, "и в на").count() == 0


def test_facets_multi_dimension(index_general, golden_general):
    """Multi-panel facets in ONE job == each single-dimension panel; dict
    form takes expressions; list form rejects bare Columns."""
    out = search_facets(index_general, "лес дом", by=["role", "tool"])
    assert out.columns == ["dim", "facet", "n_docs"]
    rows = out.collect()
    for dim in ("role", "tool"):
        got = {r["facet"]: r["n_docs"] for r in rows if r["dim"] == dim}
        expected = _golden_facets(golden_general, "лес дом", dim, False)
        assert got == expected, dim
    assert rows  # non-vacuous
    # dict form with an expression dimension + composition with NOT
    out2 = search_facets(
        index_general, "лес дом",
        by={"conv8": F.substring(F.col("conv_id"), 1, 8), "role": "role"},
        exclude="вода")
    got_role = {r["facet"]: r["n_docs"] for r in out2.collect()
                if r["dim"] == "role"}
    exp_role = _golden_facets(golden_general, "лес дом", "role", False,
                              exclude="вода")
    assert got_role == exp_role
    with pytest.raises(TypeError):
        search_facets(index_general, "лес дом", by=[F.col("role")])
    # multi empty-query schema
    assert search_facets(index_general, "и в на",
                         by=["role", "tool"]).columns == \
        ["dim", "facet", "n_docs"]


def test_metric_facets_match_brute_force(index_general):
    from searchengine_spark.operators.search import search, search_facets
    q = "поиск запрос"
    got = {r["facet"]: (r["n_docs"], r["avg_dl"], r["max_dl"])
           for r in search_facets(index_general, q, by="role",
                                  metrics={"avg_dl": F.avg("dl"),
                                           "max_dl": F.max("dl")}).collect()}
    docs = {r["doc_id"]: r for r in index_general["docs"].collect()}
    match_ids = [r["doc_id"] for r in
                 search(index_general, q, k=10 ** 6, mode="bm25").collect()]
    exp = {}
    for d in match_ids:
        role, dl = docs[d]["role"], docs[d]["dl"]
        n, s, mx = exp.get(role, (0, 0, 0))
        exp[role] = (n + 1, s + dl, max(mx, dl))
    exp = {k: (n, s / n, mx) for k, (n, s, mx) in exp.items()}
    assert set(got) == set(exp)
    for k in got:
        assert got[k][0] == exp[k][0] and got[k][2] == exp[k][2]
        assert abs(got[k][1] - exp[k][1]) < 1e-9


def test_metric_facets_reject_multi_dim(index_general):
    from searchengine_spark.operators.search import search_facets
    with pytest.raises(ValueError):
        search_facets(index_general, "поиск", by=["role", "tool"],
                      metrics={"m": F.avg("dl")})
