"""Positional postings + phrase queries: engine vs a pure-Python brute-force
golden over the fixture corpus (adjacency on the analyzed lemma stream)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.functions.analysis import analyze_text
from searchengine_spark.operators.search import phrase_search


@pytest.fixture(scope="module")
def pos_index(corpus_df):
    from searchengine_spark.operators.indexer import build_index
    idx = build_index(corpus_df, mode="general", bucket_range=256,
                      block_size=32, with_positions=True)
    idx["postings"].count()
    idx["terms"].count()
    return idx


def _golden_phrase(corpus_pdf, phrase: str) -> dict[tuple, int]:
    qseq = analyze_text(phrase, "general")
    out: dict[tuple, int] = {}
    for rec in corpus_pdf.to_dict("records"):
        toks = analyze_text(rec["text"], "general")
        n = sum(1 for i in range(len(toks) - len(qseq) + 1)
                if toks[i:i + len(qseq)] == qseq)
        if n:
            out[(rec["conv_id"], rec["turn_idx"])] = n
    return out


def _dedup_golden(corpus_pdf, phrase):
    # corpus_pdf may contain duplicate (conv_id, turn_idx) rows (the fixture
    # plants dups); the engine indexes the deterministic pick — text is
    # identical across dups, so first-seen is fine
    seen, out = set(), []
    for rec in corpus_pdf.to_dict("records"):
        key = (rec["conv_id"], rec["turn_idx"])
        if key not in seen:
            seen.add(key)
            out.append(rec)
    import pandas as pd
    return _golden_phrase(pd.DataFrame(out), phrase)


@pytest.mark.parametrize("phrase", [
    "ошибка сервер",      # hot + mid lemmas, inflected in text
    "поиск запрос",
    "merge retry",        # latin agentic tokens
])
def test_phrase_matches_golden(pos_index, corpus_pdf, phrase):
    exp = _dedup_golden(corpus_pdf, phrase)
    got = {(r["conv_id"], r["turn_idx"]): r["n_matches"]
           for r in phrase_search(pos_index, phrase, k=10_000).collect()}
    assert got == exp, (phrase, got, exp)


def test_phrase_absent_term_empty(pos_index):
    assert phrase_search(pos_index, "абракадабрище ошибка", k=10).count() == 0


def test_phrase_topk_ordering(pos_index, corpus_pdf):
    phrase = "ошибка сервер"
    exp = _dedup_golden(corpus_pdf, phrase)
    if len(exp) < 2:
        pytest.skip("need ≥2 matching docs for ordering")
    rows = phrase_search(pos_index, phrase, k=3).collect()
    counts = [r["n_matches"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert len(rows) <= 3


def test_phrase_search_many_matches_per_query(pos_index):
    """Batched phrase search == per-query phrase_search for every member,
    with 1..k ranks; a phrase containing an absent term contributes no rows
    (the single-query semantics)."""
    from searchengine_spark.operators.search import phrase_search_many
    phrases = {"p1": "ошибка сервер", "p2": "поиск запрос",
               "p3": "merge retry", "p4": "абракадабрище ошибка",
               "p5": "поиск запрос поиск"}  # duplicate term → two slots
    got = phrase_search_many(pos_index, phrases, k=10).collect()
    by_q: dict[str, list] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert "p4" not in by_q
    for qid, phrase in phrases.items():
        exp = phrase_search(pos_index, phrase, k=10).collect()
        rows = by_q.get(qid, [])
        assert [(r["doc_id"], r["n_matches"]) for r in rows] == \
               [(r["doc_id"], r["n_matches"]) for r in exp], (qid, phrase)
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))


def test_phrase_search_many_scoped(pos_index):
    """A batch-shared scope (non-contiguous predicate → semi-join path)
    matches per-query scoped phrase_search."""
    from searchengine_spark.operators.search import phrase_search_many
    scope = F.col("doc_id") % 2 == 0
    phrases = {"p1": "ошибка сервер", "p2": "поиск запрос"}
    got = phrase_search_many(pos_index, phrases, k=10, scope=scope).collect()
    by_q: dict[str, list] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    saw = 0
    for qid, phrase in phrases.items():
        exp = phrase_search(pos_index, phrase, k=10, scope=scope).collect()
        rows = by_q.get(qid, [])
        assert [(r["doc_id"], r["n_matches"]) for r in rows] == \
               [(r["doc_id"], r["n_matches"]) for r in exp], (qid, phrase)
        saw += len(rows)
    assert saw  # non-vacuous


def _golden_near(corpus_pdf, ta, tb, w):
    la, lb = analyze_text(ta, "general")[0], analyze_text(tb, "general")[0]
    out, seen = {}, set()
    for rec in corpus_pdf.to_dict("records"):
        key = (rec["conv_id"], rec["turn_idx"])
        if key in seen:
            continue
        seen.add(key)
        toks = analyze_text(rec["text"], "general")
        pa = [i for i, t in enumerate(toks) if t == la]
        pb = [i for i, t in enumerate(toks) if t == lb]
        n = sum(1 for x in pa for y in pb if abs(x - y) <= w)
        if n:
            out[key] = n
    return out


@pytest.mark.parametrize("ta,tb,w", [
    ("ошибка", "сервер", 3),
    ("поиск", "запрос", 5),
])
def test_near_search_matches_golden(pos_index, corpus_pdf, ta, tb, w):
    from searchengine_spark.operators.search import near_search
    exp = _golden_near(corpus_pdf, ta, tb, w)
    got = {(r["conv_id"], r["turn_idx"]): r["n_pairs"]
           for r in near_search(pos_index, ta, tb, max_dist=w, k=10_000).collect()}
    assert got == exp, (ta, tb, w, got, exp)


def test_near_search_many_matches_per_query(pos_index):
    """Batched proximity == per-query near_search for every member, with
    1..k ranks; a pair with an absent term contributes no rows."""
    from searchengine_spark.operators.search import near_search, near_search_many
    batch = {"n1": ("ошибка", "сервер"), "n2": ("поиск", "запрос"),
             "n3": ("абракадабрище", "ошибка")}
    got = near_search_many(pos_index, batch, max_dist=3, k=10).collect()
    by_q: dict[str, list] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert "n3" not in by_q
    saw = 0
    for qid, (ta, tb) in batch.items():
        exp = near_search(pos_index, ta, tb, max_dist=3, k=10).collect()
        rows = by_q.get(qid, [])
        assert [(r["doc_id"], r["n_pairs"]) for r in rows] == \
               [(r["doc_id"], r["n_pairs"]) for r in exp], (qid, ta, tb)
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        saw += len(rows)
    assert saw  # non-vacuous


# --- NOT-clause tests on a purpose-built corpus (the fixture transcripts
# have ≤1 doc per test phrase, so an exclusion there can't bite partially) —
XDOCS = [
    "alpha beta gamma alpha beta",             # 2 phrase matches, has gamma
    "alpha beta delta",                        # 1 match, no gamma
    "alpha beta alpha beta alpha beta gamma",  # 3 matches, has gamma
    "alpha delta beta",                        # 0 phrase matches
    "alpha beta epsilon",                      # 1 match, no gamma
]


@pytest.fixture(scope="module")
def xpos_index(spark):
    import pandas as pd
    from searchengine_spark.operators.indexer import build_index
    rows = [(f"x{i:03d}", 0, "user", t, None, "2026-01-01 00:00:00")
            for i, t in enumerate(XDOCS)]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text",
                                      "tool", "ts"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    sdf = spark.createDataFrame(
        pdf, schema="conv_id string, turn_idx int, role string, text string,"
                    " tool string, ts timestamp")
    return build_index(sdf, mode="general", bucket_range=256, block_size=32,
                       with_positions=True)


def test_phrase_exclude(xpos_index):
    """Phrase NOT == full phrase result minus docs containing the excluded
    term anywhere; match counts unchanged; absent NOT term is a no-op."""
    full = {r["conv_id"]: r["n_matches"]
            for r in phrase_search(xpos_index, "alpha beta", k=10).collect()}
    assert full == {"x000": 2, "x001": 1, "x002": 3, "x004": 1}
    got = {r["conv_id"]: r["n_matches"]
           for r in phrase_search(xpos_index, "alpha beta", k=10,
                                  exclude="gamma").collect()}
    assert got == {"x001": 1, "x004": 1}
    noop = {r["conv_id"]: r["n_matches"]
            for r in phrase_search(xpos_index, "alpha beta", k=10,
                                   exclude="zzznotaword").collect()}
    assert noop == full


def test_phrase_search_many_exclude(xpos_index):
    """Batched phrase NOT == per-query phrase_search(..., exclude=); a
    term excluded by one query can still appear in another's hits."""
    from searchengine_spark.operators.search import phrase_search_many
    phrases = {"p1": "alpha beta", "p2": "beta delta"}
    excl = {"p1": "gamma", "p2": "epsilon"}
    got = phrase_search_many(xpos_index, phrases, k=10,
                             exclude=excl).collect()
    by_q: dict[str, list] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    saw = 0
    for qid, phrase in phrases.items():
        exp = phrase_search(xpos_index, phrase, k=10,
                            exclude=excl[qid]).collect()
        rows = by_q.get(qid, [])
        assert [(r["doc_id"], r["n_matches"]) for r in rows] == \
               [(r["doc_id"], r["n_matches"]) for r in exp], qid
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        saw += len(rows)
    assert saw  # non-vacuous
    # p1's NOT (gamma) bit: x000/x002 gone from p1 only; p2 ("beta delta",
    # NOT epsilon) matches x001 alone — x003's "delta beta" is reversed
    assert {r["conv_id"] for r in by_q["p1"]} == {"x001", "x004"}
    assert {r["conv_id"] for r in by_q["p2"]} == {"x001"}


def test_near_search_many_exclude(xpos_index):
    """Batched proximity NOT (shared string) == per-query near_search(...,
    exclude=); the ban actually removes docs."""
    from searchengine_spark.operators.search import near_search, near_search_many
    batch = {"n1": ("alpha", "beta"), "n2": ("beta", "delta")}
    got = near_search_many(xpos_index, batch, max_dist=2, k=10,
                           exclude="gamma").collect()
    by_q: dict[str, list] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, (ta, tb) in batch.items():
        exp = near_search(xpos_index, ta, tb, max_dist=2, k=10,
                          exclude="gamma").collect()
        rows = by_q.get(qid, [])
        assert [(r["doc_id"], r["n_pairs"]) for r in rows] == \
               [(r["doc_id"], r["n_pairs"]) for r in exp], qid
    assert {r["conv_id"] for r in by_q["n1"]} == {"x001", "x003", "x004"}


def test_phrase_near_pagination(xpos_index):
    """offset slices the same global ranking: page1 + page2 == full top-4,
    single and batched, with ABSOLUTE ranks in the batched form."""
    from searchengine_spark.operators.search import (
        near_search, phrase_search_many)
    full = phrase_search(xpos_index, "alpha beta", k=4).collect()
    p1 = phrase_search(xpos_index, "alpha beta", k=2).collect()
    p2 = phrase_search(xpos_index, "alpha beta", k=2, offset=2).collect()
    assert [(r["conv_id"], r["n_matches"]) for r in p1 + p2] == \
           [(r["conv_id"], r["n_matches"]) for r in full]
    assert len(full) == 4  # non-vacuous
    nfull = near_search(xpos_index, "alpha", "beta", max_dist=2, k=4).collect()
    np2 = near_search(xpos_index, "alpha", "beta", max_dist=2, k=2,
                      offset=2).collect()
    assert [(r["conv_id"], r["n_pairs"]) for r in np2] == \
           [(r["conv_id"], r["n_pairs"]) for r in nfull[2:4]]
    bp2 = phrase_search_many(xpos_index, {"p1": "alpha beta"}, k=2,
                             offset=2).collect()
    assert [(r["rank"], r["conv_id"]) for r in bp2] == \
           [(i + 3, full[i + 2]["conv_id"]) for i in range(len(bp2))]
    assert bp2  # non-vacuous


def test_positional_save_load_round_trip(pos_index, corpus_pdf, spark,
                                         tmp_path_factory):
    from searchengine_spark.plans.manifest import load_index, save_index
    path = str(tmp_path_factory.mktemp("pos_saved"))
    save_index(pos_index, path, term_buckets=8)
    loaded = load_index(spark, path)
    assert loaded["stats"].get("positions") is True
    phrase = "поиск запрос"
    exp = {(r["conv_id"], r["turn_idx"]): r["n_matches"]
           for r in phrase_search(pos_index, phrase, k=10_000).collect()}
    got = {(r["conv_id"], r["turn_idx"]): r["n_matches"]
           for r in phrase_search(loaded, phrase, k=10_000).collect()}
    assert got == exp


def test_positional_upsert_matches_rebuild(pos_index, corpus_df, spark):
    """Upserting a delta into a positional index must answer phrase queries
    identically to a full positional rebuild of the mutated corpus
    (the touched-block rewrite re-encodes the pos column)."""
    from searchengine_spark.operators.indexer import build_index
    from searchengine_spark.operators.upsert import upsert_turns

    first = corpus_df.select("conv_id").orderBy("conv_id").first()["conv_id"]
    new_text = "поиск запрос поиск запрос ошибка"
    delta = spark.createDataFrame(
        [(first, 0, "user", new_text, None, "2026-03-01 00:00:00"),
         ("zzz_new_conv", 0, "user", "запрос поиск запрос", None,
          "2026-03-01 00:01:00")],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    upserted = upsert_turns(pos_index, delta)
    assert upserted["stats"].get("positions") is True

    mutated = (corpus_df.filter(~((F.col("conv_id") == first) & (F.col("turn_idx") == 0)))
               .unionByName(delta))
    rebuilt = build_index(mutated, mode="general", bucket_range=256,
                          block_size=32, with_positions=True)
    for phrase in ("поиск запрос", "запрос поиск запрос"):
        got = {(r["conv_id"], r["turn_idx"]): r["n_matches"]
               for r in phrase_search(upserted, phrase, k=10_000).collect()}
        exp = {(r["conv_id"], r["turn_idx"]): r["n_matches"]
               for r in phrase_search(rebuilt, phrase, k=10_000).collect()}
        assert got == exp, (phrase, got, exp)
