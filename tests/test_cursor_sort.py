"""search_after cursor pagination and sort_by field-ordered retrieval."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.search import search

Q = "поиск запрос"


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


# ---------- search_after ----------

def test_cursor_page_equals_offset_page(index_general):
    page1 = search(index_general, Q, k=10, mode="bm25").collect()
    cursor = (page1[-1]["score"], page1[-1]["doc_id"])
    via_cursor = _rows(search(index_general, Q, k=10, mode="bm25",
                              search_after=cursor))
    via_offset = _rows(search(index_general, Q, k=10, mode="bm25", offset=10))
    assert via_cursor == via_offset


def test_cursor_walk_covers_all_matches_once(index_general):
    allm = _rows(search(index_general, Q, k=10 ** 6, mode="bm25"))
    got, cursor = [], None
    while True:
        page = search(index_general, Q, k=7, mode="bm25",
                      search_after=cursor).collect()
        if not page:
            break
        got.extend((r["doc_id"], r["score"]) for r in page)
        cursor = (page[-1]["score"], page[-1]["doc_id"])
    assert got == allm  # no skips, no repeats, exact order


def test_cursor_with_scope_and_exclude(index_general):
    kw = dict(mode="bm25", scope="conv00", exclude="индекс")
    page1 = search(index_general, Q, k=5, **kw).collect()
    if len(page1) < 5:
        pytest.skip("scoped match set too small for a second page")
    cursor = (page1[-1]["score"], page1[-1]["doc_id"])
    assert _rows(search(index_general, Q, k=5, search_after=cursor, **kw)) \
        == _rows(search(index_general, Q, k=5, offset=5, **kw))


def test_cursor_with_collapse(index_general):
    kw = dict(mode="bm25", collapse="conv_id", per_group=1)
    page1 = search(index_general, Q, k=5, **kw).collect()
    cursor = (page1[-1]["score"], page1[-1]["doc_id"])
    assert _rows(search(index_general, Q, k=5, search_after=cursor, **kw)) \
        == _rows(search(index_general, Q, k=5, offset=5, **kw))


def test_cursor_rejects_ref_compat_and_offset(index_ref, index_general):
    with pytest.raises(ValueError):
        search(index_ref, Q, mode="ref_compat", search_after=(1.0, 3))
    with pytest.raises(ValueError):
        search(index_general, Q, mode="bm25", search_after=(1.0, 3), offset=5)


# ---------- sort_by ----------

def _brute_sorted(index, q, key, k, asc=False):
    m = search(index, q, k=10 ** 6, mode="bm25") \
        .select("doc_id", "score", F.col(key).alias("_k")).collect()
    rows = sorted(m, key=lambda r: r["doc_id"])            # tie-break asc
    rows = sorted(rows, key=lambda r: r["_k"], reverse=not asc)  # stable
    return [(r["doc_id"], r["score"]) for r in rows[:k]]


def test_sort_by_ts_desc_matches_brute_force(index_general):
    exp = _brute_sorted(index_general, Q, "ts", k=10, asc=False)
    got = _rows(search(index_general, Q, k=10, mode="bm25", sort_by="ts"))
    assert got == exp


def test_sort_by_ts_asc_matches_brute_force(index_general):
    exp = _brute_sorted(index_general, Q, "ts", k=10, asc=True)
    got = _rows(search(index_general, Q, k=10, mode="bm25",
                       sort_by="ts", sort_asc=True))
    assert got == exp


def test_sort_with_cursor_walks_in_key_order(index_general):
    exp = _brute_sorted(index_general, Q, "ts", k=10 ** 6, asc=False)
    docs = {r["doc_id"]: r for r in index_general["docs"].collect()}
    got, cursor = [], None
    while True:
        page = search(index_general, Q, k=6, mode="bm25", sort_by="ts",
                      search_after=cursor).collect()
        if not page:
            break
        got.extend((r["doc_id"], r["score"]) for r in page)
        last = page[-1]
        cursor = (docs[last["doc_id"]]["ts"], last["doc_id"])
    assert got == exp


def test_sort_by_expression_and_offset(index_general):
    # expression key + offset paging compose
    exp = _brute_sorted(index_general, Q, "turn_idx", k=12, asc=True)[6:12]
    got = _rows(search(index_general, Q, k=6, mode="bm25", offset=6,
                       sort_by=F.col("turn_idx"), sort_asc=True))
    assert got == exp


def test_sort_rejects_ref_compat(index_ref):
    with pytest.raises(ValueError):
        search(index_ref, Q, mode="ref_compat", sort_by="ts")


# ---------- batched, fielded, grammar forms ----------

Q2 = "запрос индекс"


def test_batched_cursor_matches_single(index_general):
    from searchengine_spark.operators.search import search_many
    cursors = {}
    for qid, q in [("a", Q), ("b", Q2)]:
        p1 = search(index_general, q, k=6, mode="bm25").collect()
        cursors[qid] = (p1[-1]["score"], p1[-1]["doc_id"])
    got = search_many(index_general, {"a": Q, "b": Q2}, k=6, mode="bm25",
                      search_after=cursors).toPandas()
    for qid, q in [("a", Q), ("b", Q2)]:
        single = _rows(search(index_general, q, k=6, mode="bm25",
                              search_after=cursors[qid]))
        part = got[got["query_id"] == qid]
        assert list(zip(part["doc_id"], part["score"])) == single


def test_batched_sort_matches_single(index_general):
    from searchengine_spark.operators.search import search_many
    got = search_many(index_general, {"a": Q, "b": Q2}, k=8, mode="bm25",
                      sort_by="ts").toPandas()
    for qid, q in [("a", Q), ("b", Q2)]:
        single = _rows(search(index_general, q, k=8, mode="bm25",
                              sort_by="ts"))
        part = got[got["query_id"] == qid]
        assert list(zip(part["doc_id"], part["score"])) == single


def test_batched_rejects_ref_compat_cursor(index_ref):
    from searchengine_spark.operators.search import search_many
    with pytest.raises(ValueError):
        search_many(index_ref, {"a": Q}, mode="ref_compat",
                    search_after=(1.0, 3))


@pytest.fixture(scope="module")
def fielded_idx(corpus_df):
    from searchengine_spark.operators.fielded import build_fielded_index
    return build_fielded_index(corpus_df, mode="general")


def test_bm25f_cursor_page_equals_offset(fielded_idx):
    from searchengine_spark.operators.fielded import bm25f_search
    p1 = bm25f_search(fielded_idx, Q, k=8).collect()
    cursor = (p1[-1]["score"], p1[-1]["doc_id"])
    via_cursor = _rows(bm25f_search(fielded_idx, Q, k=8,
                                    search_after=cursor))
    via_offset = _rows(bm25f_search(fielded_idx, Q, k=8, offset=8))
    assert via_cursor == via_offset


def test_bm25f_sort_matches_brute_force(fielded_idx):
    from searchengine_spark.operators.fielded import bm25f_search
    allm = bm25f_search(fielded_idx, Q, k=10 ** 6).collect()
    rows = sorted(allm, key=lambda r: r["doc_id"])
    rows = sorted(rows, key=lambda r: r["ts"], reverse=True)
    exp = [(r["doc_id"], r["score"]) for r in rows[:10]]
    got = _rows(bm25f_search(fielded_idx, Q, k=10, sort_by="ts"))
    assert got == exp


def test_bm25f_batched_cursor_matches_single(fielded_idx):
    from searchengine_spark.operators.fielded import (bm25f_search,
                                                      bm25f_search_many)
    cursors = {}
    for qid, q in [("a", Q), ("b", Q2)]:
        p1 = bm25f_search(fielded_idx, q, k=5).collect()
        cursors[qid] = (p1[-1]["score"], p1[-1]["doc_id"])
    got = bm25f_search_many(fielded_idx, {"a": Q, "b": Q2}, k=5,
                            search_after=cursors).toPandas()
    for qid, q in [("a", Q), ("b", Q2)]:
        single = _rows(bm25f_search(fielded_idx, q, k=5,
                                    search_after=cursors[qid]))
        part = got[got["query_id"] == qid]
        assert list(zip(part["doc_id"], part["score"])) == single


def test_grammar_cursor_equals_offset(index_general):
    from searchengine_spark.operators.querylang import query_search
    qs = f'{Q} -ошибка'
    p1 = query_search(index_general, qs, k=6).collect()
    cursor = (p1[-1]["score"], p1[-1]["doc_id"])
    via_cursor = _rows(query_search(index_general, qs, k=6,
                                    search_after=cursor))
    via_offset = _rows(query_search(index_general, qs, k=6, offset=6))
    assert via_cursor == via_offset


# ---------- boost_by (function-score) ----------

def _brute_boosted(index, q, k, factor_of):
    m = search(index, q, k=10 ** 6, mode="bm25") \
        .select("doc_id", "score").collect()
    rows = [(r["doc_id"], r["score"] * factor_of(r["doc_id"])) for r in m]
    rows.sort(key=lambda t: (-round(t[1], 9), t[0]))
    return rows[:10] if k == 10 else rows[:k]


def test_boost_matches_brute_force(index_general):
    boost = F.lit(1.0) / (F.lit(1.0) + F.col("doc_id").cast("double") / F.lit(100.0))
    got = _rows(search(index_general, Q, k=10, mode="bm25", boost_by=boost))
    exp = _brute_boosted(index_general, Q, 10,
                         lambda d: 1.0 / (1.0 + d / 100.0))
    assert [d for d, _ in got] == [d for d, _ in exp]
    assert max(abs(a - b) for (_, a), (_, b) in zip(got, exp)) < 1e-12


def test_boost_composes_with_cursor_and_collapse(index_general):
    boost = F.lit(1.0) / (F.lit(1.0) + F.col("doc_id").cast("double") / F.lit(100.0))
    kw = dict(mode="bm25", boost_by=boost, collapse="conv_id", per_group=2)
    p1 = search(index_general, Q, k=5, **kw).collect()
    cursor = (p1[-1]["score"], p1[-1]["doc_id"])
    assert _rows(search(index_general, Q, k=5, search_after=cursor, **kw)) \
        == _rows(search(index_general, Q, k=5, offset=5, **kw))


def test_boost_batched_matches_single(index_general):
    from searchengine_spark.operators.search import search_many
    boost = F.lit(1.0) / (F.lit(1.0) + F.col("doc_id").cast("double") / F.lit(100.0))
    got = search_many(index_general, {"a": Q, "b": Q2}, k=8, mode="bm25",
                      boost_by=boost).toPandas()
    for qid, q in [("a", Q), ("b", Q2)]:
        single = _rows(search(index_general, q, k=8, mode="bm25",
                              boost_by=boost))
        part = got[got["query_id"] == qid]
        assert list(zip(part["doc_id"], part["score"])) == single


def test_boost_bm25f_matches_brute_force(fielded_idx):
    from searchengine_spark.operators.fielded import bm25f_search
    boost = F.lit(1.0) / (F.lit(1.0) + F.col("doc_id").cast("double") / F.lit(100.0))
    allm = bm25f_search(fielded_idx, Q, k=10 ** 6).collect()
    rows = [(r["doc_id"], r["score"] * (1.0 / (1.0 + r["doc_id"] / 100.0)))
            for r in allm]
    rows.sort(key=lambda t: (-round(t[1], 9), t[0]))
    got = _rows(bm25f_search(fielded_idx, Q, k=10, boost_by=boost))
    assert [d for d, _ in got] == [d for d, _ in rows[:10]]
    assert max(abs(a - b) for (_, a), (_, b)
               in zip(got, rows[:10])) < 1e-9


def test_boost_rejects_ref_compat(index_ref):
    with pytest.raises(ValueError):
        search(index_ref, Q, mode="ref_compat", boost_by=F.lit(2.0))


# ---------- positional families (phrase / near / span) ----------

@pytest.fixture(scope="module")
def pos_idx(corpus_df):
    from searchengine_spark.operators.indexer import build_index
    idx = build_index(corpus_df, mode="general", bucket_range=256,
                      block_size=32, with_positions=True)
    idx["postings"].count()
    idx["terms"].count()
    return idx


def test_phrase_cursor_page_equals_offset(pos_idx):
    from searchengine_spark.operators.search import phrase_search
    # adjacent bigrams are rare in the fixture corpus; a single-term
    # phrase (n_matches = tf) gives a real multi-page ranking to walk
    ph = "запрос"
    allm = phrase_search(pos_idx, ph, k=10 ** 6).collect()
    assert len(allm) >= 6  # corpus sanity: enough matches to page
    half = max(1, len(allm) // 2)
    p1 = phrase_search(pos_idx, ph, k=half).collect()
    cur = (p1[-1]["n_matches"], p1[-1]["doc_id"])
    got = [(r["doc_id"], r["n_matches"]) for r in
           phrase_search(pos_idx, ph, k=half, search_after=cur).collect()]
    exp = [(r["doc_id"], r["n_matches"]) for r in
           phrase_search(pos_idx, ph, k=half, offset=half).collect()]
    assert got == exp and got


def test_near_cursor_page_equals_offset(pos_idx):
    from searchengine_spark.operators.search import near_search
    p1 = near_search(pos_idx, "запрос", "индекс", max_dist=6, k=4).collect()
    if len(p1) < 4:
        pytest.skip("near match set too small")
    cur = (p1[-1]["n_pairs"], p1[-1]["doc_id"])
    got = [(r["doc_id"], r["n_pairs"]) for r in
           near_search(pos_idx, "запрос", "индекс", max_dist=6, k=4,
                       search_after=cur).collect()]
    exp = [(r["doc_id"], r["n_pairs"]) for r in
           near_search(pos_idx, "запрос", "индекс", max_dist=6, k=4,
                       offset=4).collect()]
    assert got == exp


def test_span_cursor_walk_covers_all(pos_idx):
    from searchengine_spark.operators.search import span_search
    q = "запрос индекс"
    allm = [(r["doc_id"], r["span"]) for r in
            span_search(pos_idx, q, window=10, k=10 ** 6).collect()]
    got, cur = [], None
    while True:
        page = span_search(pos_idx, q, window=10, k=5,
                           search_after=cur).collect()
        if not page:
            break
        got.extend((r["doc_id"], r["span"]) for r in page)
        cur = (page[-1]["span"], page[-1]["doc_id"])
    assert got == allm


def test_batched_phrase_cursor_matches_single(pos_idx):
    from searchengine_spark.operators.search import (phrase_search,
                                                     phrase_search_many)
    ph = "запрос индекс"
    p1 = phrase_search(pos_idx, ph, k=3).collect()
    cur = {"a": (p1[-1]["n_matches"], p1[-1]["doc_id"])}
    got = phrase_search_many(pos_idx, {"a": ph}, k=3,
                             search_after=cur).toPandas()
    single = phrase_search(pos_idx, ph, k=3,
                           search_after=cur["a"]).toPandas()
    assert got["doc_id"].tolist() == single["doc_id"].tolist()


# ---------- search_count ----------

def test_count_matches_brute_force_and_zero(index_general):
    from searchengine_spark.operators.search import search_count
    n = search_count(index_general, Q).collect()[0]["n_matches"]
    brute = search(index_general, Q, k=10 ** 6, mode="bm25").count()
    assert n == brute > 0
    zero = search_count(index_general, "абракадабрище").collect()
    assert [r["n_matches"] for r in zero] == [0]  # one row, zero included


# ---------- grammar × new-control composition ----------

def test_grammar_boost_sort_cursor_compose(index_general):
    from searchengine_spark.operators.querylang import query_search
    qs = f"{Q} -ошибка"
    boost = F.lit(1.0) / (F.lit(1.0) + F.col("doc_id").cast("double") / F.lit(50.0))
    # boosted grammar ranking == search with the same NOT clause + boost
    got = _rows(query_search(index_general, qs, k=8, boost_by=boost))
    exp = _rows(search(index_general, Q, k=8, mode="bm25",
                       exclude="ошибка", boost_by=boost))
    assert got == exp
    # sorted grammar page 2 via cursor == via offset
    p1 = query_search(index_general, qs, k=5, sort_by="ts").collect()
    docs = {r["doc_id"]: r for r in index_general["docs"].collect()}
    cur = (docs[p1[-1]["doc_id"]]["ts"], p1[-1]["doc_id"])
    via_cursor = _rows(query_search(index_general, qs, k=5, sort_by="ts",
                                    search_after=cur))
    via_offset = _rows(query_search(index_general, qs, k=5, sort_by="ts",
                                    offset=5))
    assert via_cursor == via_offset
