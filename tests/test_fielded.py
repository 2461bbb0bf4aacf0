"""BM25F fielded scoring vs an independent pure-Python golden model."""

from __future__ import annotations

import math
import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.fielded import bm25f_search, build_fielded_index

SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"

DOCS = [
    "merge scan pipelines run the merge stage nightly and write parquet output",
    "scan results feed the report generator with aggregated counters daily",
    "the nightly job does a full table scan before any merge may start here",
    "unrelated text about gardens and weather patterns over the long winter",
    "merge conflicts in the scan merge scan merge tooling are resolved by hand",
]


def _mk(spark):
    rows = [(f"c{i:03d}", 0, "user", t, None, "2026-01-01 00:00:00")
            for i, t in enumerate(DOCS)]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return spark.createDataFrame(pdf, schema=SCHEMA)


def _toks(s):
    return [w for w in re.sub(r"[^a-zа-я0-9\s]", " ", s.lower()).split()]


def _golden_bm25f(query_terms, k1=1.2, b=0.75, w_title=2.0, w_body=1.0):
    titles = [_toks(t[:60]) for t in DOCS]
    bodies = [_toks(t) for t in DOCS]
    n = len(DOCS)
    av_t = sum(len(t) for t in titles) / n
    av_b = sum(len(t) for t in bodies) / n
    scores = {}
    for t in query_terms:
        df = max(sum(t in d for d in titles), sum(t in d for d in bodies))
        if df == 0:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for i in range(n):
            s = (w_title * titles[i].count(t) / (1 - b + b * len(titles[i]) / av_t)
                 + w_body * bodies[i].count(t) / (1 - b + b * len(bodies[i]) / av_b))
            if s > 0:
                scores[i] = scores.get(i, 0.0) + idf * s / (k1 + s)
    return scores


@pytest.fixture(scope="module")
def findex(spark):
    return build_fielded_index(_mk(spark), mode="general")


def test_bm25f_matches_golden(spark, findex):
    got = bm25f_search(findex, "merge scan", k=5).collect()
    want = _golden_bm25f(["merge", "scan"])
    assert [int(r["conv_id"][1:]) for r in got] == \
           [i for i, _ in sorted(want.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))]
    for r in got:
        assert abs(r["score"] - want[int(r["conv_id"][1:])]) < 1e-9


def test_bm25f_title_boost_changes_ranking(spark, findex):
    """A term in the title (leading 60 chars) must outrank the same term
    buried in the body, all else near-equal: doc 0 ('merge' twice, once in
    title) beats doc 2 ('merge' once, beyond the title)."""
    got = [int(r["conv_id"][1:]) for r in bm25f_search(findex, "merge", k=5).collect()]
    assert got.index(0) < got.index(2)
    # and the no-match doc never appears
    assert 3 not in got


def test_bm25f_empty_query(spark, findex):
    assert bm25f_search(findex, "zzzznotaword", k=5).collect() == []


def test_bm25f_scoped_contiguous(spark, findex):
    """Scoped BM25F == full ranking filtered to the scope (idf/avgdl stay
    index-wide — same filtered-search semantics as the main path's scoped
    BM25). conv_id <= 'c002' is a contiguous doc_id range, exercising the
    range-check + bucket-prune path."""
    full = bm25f_search(findex, "merge scan", k=5).collect()
    want = [(r["conv_id"], round(r["score"], 9)) for r in full
            if r["conv_id"] <= "c002"]
    got = bm25f_search(findex, "merge scan", k=5,
                       scope=F.col("conv_id") <= "c002").collect()
    assert [(r["conv_id"], round(r["score"], 9)) for r in got] == want
    assert len(want) > 2  # non-vacuous AND k=2 below truncates in-scope
    # k SMALLER than the in-scope scoring set: detects scope applied after
    # (instead of before) the top-k cut — the global top-2 is NOT the
    # in-scope top-2 here
    got2 = bm25f_search(findex, "merge scan", k=2,
                        scope=F.col("conv_id") <= "c002").collect()
    assert [(r["conv_id"], round(r["score"], 9)) for r in got2] == want[:2]


def test_bm25f_scoped_noncontiguous_and_prefix(spark, findex):
    """Non-contiguous predicate scope (semi-join fallback) and a prefix
    string scope that covers everything."""
    full = bm25f_search(findex, "merge scan", k=5).collect()
    keep = {"c000", "c002", "c004"}
    want = [(r["conv_id"], round(r["score"], 9)) for r in full
            if r["conv_id"] in keep]
    got = bm25f_search(findex, "merge scan", k=5,
                       scope=F.col("conv_id").isin(*sorted(keep))).collect()
    assert [(r["conv_id"], round(r["score"], 9)) for r in got] == want
    allg = bm25f_search(findex, "merge scan", k=5, scope="c00").collect()
    assert [(r["conv_id"], round(r["score"], 9)) for r in allg] == \
           [(r["conv_id"], round(r["score"], 9)) for r in full]
    # small k + a keep-set excluding the global winners: the scoped top-1
    # must be a doc OUTSIDE the global top-k prefix (scope before cut)
    keep2 = {"c001", "c002"}
    want2 = [(r["conv_id"], round(r["score"], 9)) for r in full
             if r["conv_id"] in keep2][:1]
    got2 = bm25f_search(findex, "merge scan", k=1,
                        scope=F.col("conv_id").isin(*sorted(keep2))).collect()
    assert [(r["conv_id"], round(r["score"], 9)) for r in got2] == want2
    assert want2 and want2[0][0] != full[0]["conv_id"]


def test_bm25f_scoped_empty(spark, findex):
    assert bm25f_search(findex, "merge scan", k=5, scope="zzz").collect() == []


def test_bm25f_offset_pagination(spark, findex_many):
    """Page 2 == rows k..2k of the full ranking, with and without
    pruning."""
    full = bm25f_search(findex_many, "merge scan", k=8).collect()
    for pb in (False, True):
        page2 = bm25f_search(findex_many, "merge scan", k=4, offset=4,
                             prune_blocks=pb).collect()
        assert [(r["doc_id"], round(r["score"], 9)) for r in page2] == \
               [(r["doc_id"], round(r["score"], 9)) for r in full[4:8]], pb


def test_bm25f_search_many_matches_per_query(spark, findex):
    """Batched BM25F == per-query bm25f_search for every member, with 1..k
    ranks; an all-absent query contributes no rows. Scoped batch matches
    scoped per-query search."""
    from searchengine_spark.operators.fielded import bm25f_search_many
    batch = {"qa": "merge scan", "qb": "merge", "qc": "zzzznotaword"}
    got = bm25f_search_many(findex, batch, k=5).collect()
    by_q: dict[str, list] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert "qc" not in by_q
    for qid, q in batch.items():
        exp = bm25f_search(findex, q, k=5).collect()
        rows = by_q.get(qid, [])
        assert [(r["conv_id"], round(r["score"], 9)) for r in rows] == \
               [(r["conv_id"], round(r["score"], 9)) for r in exp], (qid, q)
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    # shared scope (non-contiguous predicate → semi-join path)
    scope = F.col("conv_id").isin("c000", "c002", "c004")
    gsc = bm25f_search_many(findex, {"qa": "merge scan"}, k=5,
                            scope=scope).collect()
    esc = bm25f_search(findex, "merge scan", k=5, scope=scope).collect()
    assert [(r["conv_id"], round(r["score"], 9)) for r in gsc] == \
           [(r["conv_id"], round(r["score"], 9)) for r in esc]
    assert esc  # non-vacuous


def test_bm25f_snippets_and_titles(spark, findex):
    """with_snippets / with_titles mirror the main path's Q9/Q10: ranks
    and scores unchanged, title is the leading text window, snippet
    highlights a query surface form."""
    plain = bm25f_search(findex, "merge scan", k=5).collect()
    rich = bm25f_search(findex, "merge scan", k=5,
                        with_snippets=True, with_titles=True).collect()
    assert [(r["conv_id"], round(r["score"], 9)) for r in rich] == \
           [(r["conv_id"], round(r["score"], 9)) for r in plain]
    assert plain  # non-vacuous
    for r in rich:
        assert r["title"] and DOCS[int(r["conv_id"][1:])].startswith(
            r["title"].split()[0])
        assert "<b>" in r["snippet"]
        assert "<b>merge</b>" in r["snippet"] or "<b>scan</b>" in r["snippet"]
    # empty-result schema carries the extra columns
    none = bm25f_search(findex, "zzzznotaword", k=5,
                        with_snippets=True, with_titles=True)
    assert none.columns[-2:] == ["title", "snippet"]
    assert none.count() == 0


def test_bm25f_search_many_exclude_parity(spark, findex):
    """Batched per-query NOT == per-query bm25f_search(..., exclude=) row
    for row; a term excluded by one query still scores another's; a
    shared-string NOT applies batch-wide."""
    from searchengine_spark.operators.fielded import bm25f_search_many
    batch = {"qa": "merge scan", "qb": "scan nightly"}
    excl = {"qa": "nightly", "qb": "conflicts"}
    got = bm25f_search_many(findex, batch, k=5, exclude=excl).collect()
    by_q: dict[str, list] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, q in batch.items():
        exp = bm25f_search(findex, q, k=5, exclude=excl[qid]).collect()
        rows = by_q.get(qid, [])
        assert [(r["conv_id"], round(r["score"], 9)) for r in rows] == \
               [(r["conv_id"], round(r["score"], 9)) for r in exp], qid
        assert exp  # non-vacuous
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    # qa excludes 'nightly' yet qb scores it: qb must still rank docs 0/2
    assert any(r["conv_id"] in ("c000", "c002") for r in by_q["qb"])
    # shared NOT string
    gsh = bm25f_search_many(findex, batch, k=5, exclude="merge").collect()
    for qid, q in batch.items():
        exp = bm25f_search(findex, q, k=5, exclude="merge").collect()
        rows = [r for r in gsh if r["query_id"] == qid]
        assert [(r["conv_id"], round(r["score"], 9)) for r in rows] == \
               [(r["conv_id"], round(r["score"], 9)) for r in exp], qid


def test_bm25f_search_many_snippets(spark, findex):
    """Batched fielded snippets: each hit highlighted with ITS OWN query's
    words; ranks/scores unchanged vs the plain batch."""
    from searchengine_spark.operators.fielded import bm25f_search_many
    batch = {"qa": "merge", "qb": "nightly"}
    plain = bm25f_search_many(findex, batch, k=5).collect()
    rich = bm25f_search_many(findex, batch, k=5, with_snippets=True).collect()
    assert [(r["query_id"], r["rank"], r["conv_id"], round(r["score"], 9))
            for r in rich] == \
           [(r["query_id"], r["rank"], r["conv_id"], round(r["score"], 9))
            for r in plain]
    for r in rich:
        want = "merge" if r["query_id"] == "qa" else "nightly"
        assert f"<b>{want}</b>" in r["snippet"], (r["query_id"], r["snippet"])


def test_bm25f_search_many_offset(spark, findex):
    """Batched fielded pagination: page 2 carries ABSOLUTE ranks and
    matches the single-query offset slice."""
    from searchengine_spark.operators.fielded import bm25f_search_many
    full = bm25f_search(findex, "merge scan", k=5).collect()
    page2 = bm25f_search_many(findex, {"qa": "merge scan"}, k=2,
                              offset=2).collect()
    assert [(r["rank"], r["conv_id"], round(r["score"], 9))
            for r in page2] == \
           [(i + 3, full[i + 2]["conv_id"], round(full[i + 2]["score"], 9))
            for i in range(len(page2))]
    assert page2  # non-vacuous


def _mk_many(spark, n=32):
    """Skewed corpus: two short hot docs carry huge tf for both query
    terms; everyone else is a long doc with tf=1 placed past the title
    window — the regime where block-max pruning has real units to skip."""
    rows = []
    for i in range(n):
        if i < 2:
            words = ["merge"] * 30 + ["scan"] * 30
        elif i % 2 == 0:
            words = ["filler"] * 25 + ["merge"]
        else:
            words = ["filler"] * 25 + ["scan"]
        rows.append((f"c{i:03d}", 0, "user", " ".join(words), None,
                     "2026-01-01 00:00:00"))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text",
                                      "tool", "ts"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return spark.createDataFrame(pdf, schema=SCHEMA)


@pytest.fixture(scope="module")
def findex_many(spark):
    # tiny geometry → many blocks and many doc buckets, so pruning has
    # real units to skip
    return build_fielded_index(_mk_many(spark), mode="general",
                               bucket_range=4, block_size=2)


def test_bm25f_prune_exact(spark, findex_many):
    """(term, bucket) block-max pruning is EXACT: rank- and score-identical
    to the exhaustive decode, plain and scoped, across k values."""
    for q in ("merge scan", "merge", "scan filler"):
        for k in (1, 3, 5):
            ex = bm25f_search(findex_many, q, k=k, prune_blocks=False).collect()
            pr = bm25f_search(findex_many, q, k=k, prune_blocks=True).collect()
            assert [(r["doc_id"], round(r["score"], 9)) for r in pr] == \
                   [(r["doc_id"], round(r["score"], 9)) for r in ex], (q, k)
    scope = F.col("conv_id") <= "c011"
    ex = bm25f_search(findex_many, "merge scan", k=3, scope=scope,
                      prune_blocks=False).collect()
    pr = bm25f_search(findex_many, "merge scan", k=3, scope=scope,
                      prune_blocks=True).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in pr] == \
           [(r["doc_id"], round(r["score"], 9)) for r in ex]


def test_bm25f_exclude(spark, findex):
    """NOT clause == full ranking minus docs containing the excluded term
    in any field (scores unchanged — NOT filters, it doesn't reweight);
    an absent NOT term is a no-op."""
    full = bm25f_search(findex, "merge scan", k=5).collect()
    # 'nightly' appears in docs 0 and 2 only
    want = [(r["conv_id"], round(r["score"], 9)) for r in full
            if int(r["conv_id"][1:]) not in (0, 2)]
    got = bm25f_search(findex, "merge scan", k=5, exclude="nightly").collect()
    assert [(r["conv_id"], round(r["score"], 9)) for r in got] == want
    assert want  # non-vacuous
    noop = bm25f_search(findex, "merge scan", k=5,
                        exclude="zzzznotaword").collect()
    assert [(r["conv_id"], round(r["score"], 9)) for r in noop] == \
           [(r["conv_id"], round(r["score"], 9)) for r in full]


def test_bm25f_exclude_disables_prune_exactly(spark, findex_many):
    """exclude + forced prune == exclude + exhaustive (a NOT clause turns
    the fielded WAND off; results must be identical either way)."""
    a = bm25f_search(findex_many, "merge scan", k=8, prune_blocks=True,
                     exclude="filler")
    b = bm25f_search(findex_many, "merge scan", k=8, prune_blocks=False,
                     exclude="filler")
    ra = [(r["doc_id"], round(r["score"], 9)) for r in a.collect()]
    rb = [(r["doc_id"], round(r["score"], 9)) for r in b.collect()]
    assert ra == rb
    # only the two hot docs lack 'filler'
    assert {d for d, _ in ra} == {0, 1}


def test_bm25f_prune_actually_skips(spark, findex_many):
    """The keep-set is a STRICT subset of the candidate (term, bucket)
    pairs — pruning does real work, not a no-op."""
    from searchengine_spark.operators.fielded import _bm25f_keep_set
    from searchengine_spark.operators.search import _query_terms
    vocab = _query_terms("merge scan", "general", "fixture")
    idx = findex_many
    n_docs = idx["stats"]["n_docs"]
    import math
    field_blocks, idf_of = {}, {}
    for name, fl in idx["fields"].items():
        rows = fl["terms"].filter(F.col("term").isin(vocab)).collect()
        tids = [r["term_id"] for r in rows]
        field_blocks[name] = (fl["postings"].filter(
            F.col("term_id").isin(tids)), rows)
        for r in rows:
            d = r["df_field"]
            idf_of[r["term"]] = max(
                idf_of.get(r["term"], 0.0),
                math.log(1.0 + (n_docs - d + 0.5) / (d + 0.5)))
    keep = _bm25f_keep_set(idx, field_blocks, idf_of,
                           {"title": 2.0, "body": 1.0},
                           {"title": 0.75, "body": 0.75}, 2, 1.2)
    assert keep is not None
    bpb = -(-idx["stats"]["bucket_range"] // idx["stats"]["block_size"])
    total = set()
    for name, (blocks, rows) in field_blocks.items():
        tname = {r["term_id"]: r["term"] for r in rows}
        for r in blocks.select("term_id", "block_id").collect():
            total.add((tname[r["term_id"]], r["block_id"] // bpb))
    kept = {(r["term"], r["bucket"]) for r in keep.collect()}
    assert kept < total, (len(kept), len(total))


def test_bm25f_save_load_round_trip(spark, findex, tmp_path):
    """Saved+loaded fielded index returns identical rows, and the loaded
    query plan prunes the per-field postings scan by term_bucket."""
    from searchengine_spark.operators.fielded import (
        load_fielded_index, save_fielded_index)
    path = str(tmp_path / "fidx")
    save_fielded_index(findex, path, term_buckets=8)
    loaded = load_fielded_index(spark, path)
    want = bm25f_search(findex, "merge scan", k=5).collect()
    got = bm25f_search(loaded, "merge scan", k=5).collect()
    assert [(r["conv_id"], round(r["score"], 9)) for r in got] == \
           [(r["conv_id"], round(r["score"], 9)) for r in want]
    # partition pruning reaches the scan: PartitionFilters on term_bucket
    plan = bm25f_search(loaded, "merge scan", k=5)._jdf \
        .queryExecution().executedPlan().toString()
    assert "term_bucket" in plan
