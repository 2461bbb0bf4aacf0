"""Full match-set export (`search_select` / `query_select`) parity.

The export op returns EVERY matching doc with its score — the
retrieval→training-pipeline bridge (Elasticsearch scroll, done as a
DataFrame). No reference analog (its API returns flat ranked hits only,
reference: controllers/ApiController.java:55-58). Checks: the export's
membership and scores equal `search`'s over a full-k retrieval, its size
equals `search_count`, NOT/min_match/scope compose, ref_compat's
normalized scores match Q7, and with_text carries the corpus text.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from searchengine_spark.operators.querylang import query_select
from searchengine_spark.operators.search import (search, search_count,
                                                 search_select)

BIGK = 10_000  # larger than any fixture match set


def _ranked(df):
    return [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]


def _exported(df):
    rows = df.collect()
    return sorted(((r["doc_id"], round(r["score"], 9)) for r in rows),
                  key=lambda p: (-p[1], p[0]))


def test_select_equals_search_full_k(index_general):
    q = "ошибка лес"
    exp = _exported(search_select(index_general, q))
    full = _ranked(search(index_general, q, k=BIGK, prune_blocks=False))
    assert exp == sorted(full, key=lambda p: (-p[1], p[0]))


def test_select_size_equals_count(index_general):
    q = "система файл код"
    n = search_count(index_general, q).collect()[0]["n_matches"]
    assert search_select(index_general, q).count() == n


def test_select_min_match_and_nt(index_general):
    q = "система файл код"
    rows = search_select(index_general, q, min_match=2).collect()
    assert rows, "fixture corpus should have >=2-term matches"
    assert all(r["nt"] >= 2 for r in rows)
    # min_match=1 is a superset
    all_rows = search_select(index_general, q).collect()
    assert {r["doc_id"] for r in rows} <= {r["doc_id"] for r in all_rows}


def test_select_exclude(index_general):
    q = "ошибка лес"
    banned = {r["doc_id"] for r in
              search_select(index_general, "дом").collect()}
    kept = {r["doc_id"] for r in
            search_select(index_general, q, exclude="дом").collect()}
    assert kept and not (kept & banned)


def test_select_scope(index_general):
    q = "ошибка лес"
    scoped = search_select(index_general, q, scope="conv00")
    rows = scoped.collect()
    assert rows and all(r["conv_id"].startswith("conv00") for r in rows)
    # scoped set == full set restricted to the scope
    full = {r["doc_id"]: round(r["score"], 9)
            for r in search_select(index_general, q).collect()
            if r["conv_id"].startswith("conv00")}
    assert {r["doc_id"]: round(r["score"], 9) for r in rows} == full


def test_select_ref_compat_normalized(index_ref, golden_ref):
    q = "лес дом"
    rows = search_select(index_ref, q, mode="ref_compat").collect()
    assert rows
    # conjunction arity, and max score == 1.0 exactly once normalized
    assert all(r["nt"] == 2 for r in rows)
    assert abs(max(r["score"] for r in rows) - 1.0) < 1e-12
    # scores match the ranked path on its top-k
    ranked = search(index_ref, q, k=10, mode="ref_compat").collect()
    by_id = {r["doc_id"]: r["score"] for r in rows}
    for r in ranked:
        assert abs(by_id[r["doc_id"]] - r["score"]) < 1e-9


def test_select_with_text(index_general, corpus_pdf):
    rows = (search_select(index_general, "ошибка", with_text=True)
            .limit(5).collect())
    assert rows and all(isinstance(r["text"], str) and r["text"]
                        for r in rows)


def test_select_unknown_terms_empty(index_general):
    assert search_select(index_general, "zzzz_unknown_zzzz").count() == 0


def test_query_select_grammar(index_general):
    # NOT clause + qualifier through the grammar == manual composition
    got = {r["doc_id"]: round(r["score"], 9) for r in
           query_select(index_general, "ошибка лес -дом").collect()}
    want = {r["doc_id"]: round(r["score"], 9) for r in
            search_select(index_general, "ошибка лес",
                          exclude="дом").collect()}
    assert got == want and got


def test_query_select_min_directive(index_general):
    got = {r["doc_id"] for r in
           query_select(index_general, "система файл код min:2").collect()}
    want = {r["doc_id"] for r in
            search_select(index_general, "система файл код",
                          min_match=2).collect()}
    assert got == want and got

