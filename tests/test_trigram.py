"""Char-trigram infix index: true substring wildcards without a full
dictionary walk (the Lucene/ES ngram-filter pattern).

Invariants: trigram-resolved glob expansion returns IDENTICAL rows to the
full-pattern dictionary walk for every glob class (suffix, infix,
contains, multi-star); patterns whose literals yield no 3-gram fall back
to the walk; ``suggest_pattern`` auto-routes through the trigram index
when the dictionary is too large to driver-cache; the sidecar survives
``save_index``/``load_index`` with gram-bucket partition dirs pruned at
scan planning; the grammar's wildcard terms resolve identically with and
without the sidecar.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import searchengine_spark.operators.search as S
from searchengine_spark.operators.suggest import (
    _pattern_grams, build_trigram_index, suggest_infix, suggest_pattern)

PATTERNS = ["*рев*", "*ка", "с*ма", "* время*", "*таймаут", "me*ge", "*erge"]


@pytest.fixture(scope="module")
def tg_index(index_general):
    build_trigram_index(index_general)
    yield index_general
    index_general.pop("trigrams", None)


def _rows(df):
    return [(r["term"], r["df"]) for r in df.collect()]


def test_pattern_grams():
    # '*frag*': one unanchored chunk ≥3 chars
    assert _pattern_grams(["", "frag", ""]) == ["fra", "rag"]
    # suffix '*ka': boundary gram from the $ anchor
    assert _pattern_grams(["", "ka"]) == ["ka$"]
    # prefix+suffix 'a*b': anchors only, too short for interior grams
    assert _pattern_grams(["ab", "cd"]) == ["^ab", "cd$"]
    # no usable literal
    assert _pattern_grams(["", "ab", ""]) == []


def test_infix_matches_dictionary_walk(tg_index):
    for p in PATTERNS:
        walk = _rows(suggest_pattern(tg_index, p, k=50))
        fast = _rows(suggest_infix(tg_index, p, k=50))
        assert fast == walk, p
    assert any(_rows(suggest_infix(tg_index, p, k=50)) for p in PATTERNS)


def test_no_gram_pattern_falls_back(tg_index):
    # 2-char unanchored literal yields no 3-gram → suggest_pattern path
    walk = _rows(suggest_pattern(tg_index, "*ма*", k=50))
    fast = _rows(suggest_infix(tg_index, "*ма*", k=50))
    assert fast == walk


def test_suggest_pattern_autoroutes_when_not_cached(tg_index, monkeypatch):
    """Above TERMS_LOCAL_MAX the dictionary isn't driver-cached;
    suggest_pattern must take the trigram path and return the same rows."""
    base = {p: _rows(suggest_pattern(tg_index, p, k=50)) for p in PATTERNS}
    monkeypatch.setattr(S, "TERMS_LOCAL_MAX", 0)
    tg_index.pop("_terms_pdf", None)
    for p in PATTERNS:
        assert _rows(suggest_pattern(tg_index, p, k=50)) == base[p], p


def test_save_load_round_trip_with_pruning(tg_index, tmp_path, monkeypatch):
    from searchengine_spark.plans.manifest import load_index, save_index
    spark = tg_index["docs"].sparkSession
    save_index(tg_index, str(tmp_path / "idx"))
    loaded = load_index(spark, str(tmp_path / "idx"))
    assert "trigrams" in loaded
    build = {p: _rows(suggest_infix(tg_index, p, k=50)) for p in PATTERNS}
    for p in PATTERNS:
        assert _rows(suggest_infix(loaded, p, k=50)) == build[p], p
    # cold probes prune gram_bucket partition dirs at scan planning
    monkeypatch.setattr(S, "TERMS_LOCAL_MAX", 0)
    df = suggest_infix(loaded, "*рев*", k=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "gram_bucket" in plan and "PartitionFilters: []" not in plan


def test_grammar_wildcards_identical_with_sidecar(index_general, monkeypatch):
    """query_search with an infix wildcard returns the same ranking with
    and without the trigram sidecar, cached or paged dictionary."""
    from searchengine_spark.operators.querylang import query_search
    q = "дом *рев*"
    index_general.pop("trigrams", None)
    base = [(r["doc_id"], round(r["score"], 9))
            for r in query_search(index_general, q, k=10).collect()]
    assert base
    build_trigram_index(index_general)
    try:
        monkeypatch.setattr(S, "TERMS_LOCAL_MAX", 0)
        index_general.pop("_terms_pdf", None)
        got = [(r["doc_id"], round(r["score"], 9))
               for r in query_search(index_general, q, k=10).collect()]
        assert got == base
    finally:
        index_general.pop("trigrams", None)


def test_maintenance_carries_sidecar(spark, corpus_df):
    """upsert_turns/delete_turns refresh the trigram sidecar
    incrementally; the refreshed rows EQUAL a fresh build over the new
    dictionary (added terms appear, dropped terms vanish, surviving
    terms carry their updated df)."""
    from searchengine_spark.operators.indexer import build_index
    from searchengine_spark.operators.suggest import (build_trigram_index,
                                                      suggest_infix)
    from searchengine_spark.operators.upsert import delete_turns, upsert_turns

    idx = build_index(corpus_df.limit(300), mode="general",
                      bucket_range=256, block_size=32)
    idx["postings"].count()
    build_trigram_index(idx)

    delta = spark.createDataFrame(
        [("zzconv", 0, "user", None, None,
          "инкрементальнейшее словослияние zqx")],
        "conv_id string, turn_idx int, role string, tool string, "
        "ts timestamp, text string")
    up = upsert_turns(idx, delta)
    assert up.get("trigrams") is not None

    def rows(ix):
        return sorted((r["gram"], r["term_id"], r["term"], int(r["df"]),
                       r["gram_bucket"])
                      for r in ix["trigrams"].collect())

    fresh = dict(up)
    build_trigram_index(fresh)
    assert rows(up) == rows(fresh)
    # the new term is reachable through the gram path
    assert any(r["term"] == "zqx"
               for r in suggest_infix(up, "*zq*", k=5).collect()) or \
        any(r["term"].startswith("zq")
            for r in suggest_infix(up, "zq*", k=5).collect())

    # delete the upserted doc: its unique terms drop out of the sidecar
    dn = delete_turns(up, F.col("conv_id") == "zzconv")
    assert dn.get("trigrams") is not None
    fresh2 = dict(dn)
    build_trigram_index(fresh2)
    assert rows(dn) == rows(fresh2)
    assert not any(r["term"] == "zqx" for r in dn["trigrams"].collect())
