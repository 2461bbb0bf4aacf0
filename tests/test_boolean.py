"""Recursive boolean queries (operators/boolean.py): parser shape,
unbounded-NOT rejection, candidate-set algebra vs brute force, ranked
parity with search(scope=<set>), and count semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.boolean import (bool_count, bool_search,
                                                  parse_bool)
from searchengine_spark.operators.search import search
from tests.golden_model import golden_analyze


def test_parse_shapes():
    assert parse_bool("a AND b") == ("and", [("term", "a"), ("term", "b")])
    assert parse_bool("a OR b AND c") == \
        ("or", [("term", "a"), ("and", [("term", "b"), ("term", "c")])])
    assert parse_bool('(a OR "x y") AND NOT c') == \
        ("and", [("or", [("term", "a"), ("phrase", "x y")]),
                 ("not", ("term", "c"))])
    assert parse_bool('"a b"~3 AND role:user') == \
        ("and", [("span", "a b", 3, False), ("qual", "role", "user")])
    assert parse_bool('"a b"~3! OR c')[1][0] == ("span", "a b", 3, True)


def test_parse_rejections():
    for bad in ["NOT a", "a OR NOT b", "NOT a AND NOT b",
                "a b", "(a OR b) c", "a AND", "(a OR b", "a )"]:
        with pytest.raises(ValueError):
            parse_bool(bad)


def _golden_docsets(g):
    """term → set of golden doc ids containing it."""
    sets: dict = {}
    for did in range(g.n_docs):
        for t in g.tf[did]:
            sets.setdefault(t, set()).add(did)
    return sets


def _gset(g, sets, word):
    seq = golden_analyze(word, g.mode)
    return sets.get(seq[0], set()) if seq else set()


EXPRS = [
    ("лес AND дом", lambda s: s("лес") & s("дом")),
    ("лес OR дом", lambda s: s("лес") | s("дом")),
    ("(лес OR дом) AND ошибка", lambda s: (s("лес") | s("дом")) & s("ошибка")),
    ("лес AND NOT дом", lambda s: s("лес") - s("дом")),
    ("(лес AND NOT дом) OR (ошибка AND система)",
     lambda s: (s("лес") - s("дом")) | (s("ошибка") & s("система"))),
    ("лес AND (дом OR (ошибка AND NOT система))",
     lambda s: s("лес") & (s("дом") | (s("ошибка") - s("система")))),
]


@pytest.mark.parametrize("expr,fn", EXPRS)
def test_candidate_algebra_brute_force(index_general, golden_general,
                                       expr, fn):
    g = golden_general
    sets = _golden_docsets(g)
    expected = fn(lambda w: _gset(g, sets, w))
    got = bool_count(index_general, expr).collect()[0]["n_matches"]
    assert got == len(expected), expr


@pytest.mark.parametrize("expr,fn", EXPRS)
def test_ranked_parity_with_scoped_search(index_general, golden_general,
                                          expr, fn):
    """bool_search == search over the tree's scoring words restricted to
    the brute-force candidate set."""
    g = golden_general
    sets = _golden_docsets(g)
    cand = sorted(fn(lambda w: _gset(g, sets, w)))
    got = [(r["doc_id"], round(r["score"], 9))
           for r in bool_search(index_general, expr, k=10).collect()]
    if not cand:
        assert got == []
        return
    spark = index_general["docs"].sparkSession
    cdf = spark.createDataFrame([(int(d),) for d in cand], "doc_id long")
    from searchengine_spark.operators.boolean import _scoring_words
    words = sorted(set(_scoring_words(parse_bool(expr))))
    ref = [(r["doc_id"], round(r["score"], 9))
           for r in search(index_general, " ".join(words), k=10,
                           scope=cdf).collect()]
    assert got == ref, expr


def test_qualifier_leaf_and_count_vs_ranked(index_general):
    """role: qualifier branches widen the candidate set; the COUNT sees
    qualifier-only matches while the ranked page needs a scoring term."""
    n_or = bool_count(index_general,
                      "лес OR role:user").collect()[0]["n_matches"]
    n_term = bool_count(index_general, "лес").collect()[0]["n_matches"]
    n_role = index_general["docs"].filter(
        F.col("role") == "user").count()
    assert n_or >= max(n_term, n_role)
    hits = bool_search(index_general, "лес OR role:user", k=10).collect()
    assert hits  # ranked page exists and scores only the term side


@pytest.fixture(scope="module")
def index_pos(corpus_df):
    from searchengine_spark.operators.indexer import build_index
    idx = build_index(corpus_df, mode="general", bucket_range=256,
                      block_size=32, with_positions=True)
    idx["postings"].count()
    return idx


def test_phrase_leaf(index_pos, golden_general):
    """A phrase leaf constrains candidates positionally: its doc count
    equals phrase_search's match count, and AND-ing never grows it."""
    from searchengine_spark.operators.search import phrase_search
    # pick a REAL adjacent lemma pair from the corpus (surface forms and
    # lemmas coincide for these fixture families, so the raw pair is a
    # valid query string)
    seq = next(s for s in (golden_analyze(d["text"], golden_general.mode)
                           for d in golden_general.docs) if len(s) >= 2)
    phrase = f"{seq[0]} {seq[1]}"
    n_ph = phrase_search(index_pos, phrase, k=10**6).count()
    n_bool = bool_count(index_pos,
                        f'"{phrase}"').collect()[0]["n_matches"]
    assert n_bool == n_ph and n_ph > 0
    n_and = bool_count(index_pos,
                       f'"{phrase}" AND дом').collect()[0]["n_matches"]
    assert n_and <= n_bool


def test_snippets_and_pagination_passthrough(index_general):
    page1 = bool_search(index_general, "лес OR дом", k=5,
                        with_snippets=True).collect()
    assert page1 and all("snippet" in r.asDict() for r in page1)
    page2 = bool_search(index_general, "лес OR дом", k=5, offset=5).collect()
    ids1 = {r["doc_id"] for r in page1}
    assert all(r["doc_id"] not in ids1 for r in page2)


def test_bool_search_many_matches_single(index_general):
    """Batched boolean replay == per-query bool_search row-for-row,
    with shared leaves resolved once."""
    from searchengine_spark.operators.boolean import bool_search_many
    exprs = {
        "q1": "лес AND дом",
        "q2": "(лес OR дом) AND ошибка",
        "q3": "лес AND NOT дом",
        "q4": "(лес AND NOT дом) OR (ошибка AND система)",
    }
    batched = bool_search_many(index_general, exprs, k=10)
    got = {}
    for r in batched.collect():
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], round(r["score"], 9)))
    for qid, e in exprs.items():
        single = [(r["doc_id"], round(r["score"], 9))
                  for r in bool_search(index_general, e, k=10).collect()]
        assert got.get(qid, []) == single, e


def test_bool_search_many_per_query_params(index_general):
    from searchengine_spark.operators.boolean import bool_search_many
    exprs = {"a": "лес AND дом", "b": "лес OR ошибка"}
    k1d = {"a": 0.9}
    batched = bool_search_many(index_general, exprs, k=5, k1=k1d,
                               b={"a": 0.4})
    got = {}
    for r in batched.collect():
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], round(r["score"], 9)))
    sa = [(r["doc_id"], round(r["score"], 9))
          for r in bool_search(index_general, exprs["a"], k=5,
                               k1=0.9, b=0.4).collect()]
    sb = [(r["doc_id"], round(r["score"], 9))
          for r in bool_search(index_general, exprs["b"], k=5).collect()]
    assert got["a"] == sa and got["b"] == sb


def test_bool_select_full_match_set(index_general, golden_general):
    """bool_select exports EVERY candidate with its BM25 score — the
    candidate ids equal the brute-force algebra, scores equal
    search_select over the same scope."""
    from searchengine_spark.operators.boolean import bool_select
    from searchengine_spark.operators.search import search_select
    expr = "(лес OR дом) AND NOT ошибка"
    g = golden_general
    sets = _golden_docsets(g)
    exp_ids = (_gset(g, sets, "лес") | _gset(g, sets, "дом")) \
        - _gset(g, sets, "ошибка")
    out = {r["doc_id"]: r["score"]
           for r in bool_select(index_general, expr).collect()}
    assert set(out) == exp_ids
    spark = index_general["docs"].sparkSession
    cdf = spark.createDataFrame([(int(d),) for d in sorted(exp_ids)],
                                "doc_id long")
    ref = {r["doc_id"]: r["score"]
           for r in search_select(index_general, "лес дом",
                                  scope=cdf).collect()}
    assert out == ref
