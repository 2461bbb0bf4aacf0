"""Passage retrieval (maxP): chunk indexing, parent fold, agg variants."""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.passages import (build_passage_index,
                                                   passage_search)


@pytest.fixture(scope="module")
def pindex(spark):
    filler = " ".join(f"word{i}" for i in range(8))
    rows = [
        # doc 0: needle concentrated in its SECOND chunk (tokens 8..15)
        ("d0", f"{filler} needle needle needle needle stone stone stone stone"),
        # doc 1: one needle diluted across a long doc (chunk 0)
        ("d1", "needle " + " ".join(f"pad{i}" for i in range(15))),
        # doc 2: no needle at all
        ("d2", filler + " " + filler),
        # doc 3: needle in BOTH of its chunks
        ("d3", "needle alpha beta gamma delta epsilon zeta eta "
               "needle one two three four five six seven"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    return build_passage_index(docs, chunk_tokens=8, overlap=0)


def test_passage_maxp_ranks_concentrated_doc_first(spark, pindex):
    out = passage_search(pindex, "needle", k=10, agg="max").collect()
    got = {r["parent_id"]: r for r in out}
    assert "d2" not in got
    assert set(got) == {"d0", "d1", "d3"}
    # d0's best passage has tf=4 in an 8-token chunk: highest maxP score
    assert out[0]["parent_id"] == "d0"
    assert got["d0"]["best_chunk"] == 1 and got["d0"]["n_chunks"] == 1
    assert got["d1"]["best_chunk"] == 0 and got["d1"]["n_chunks"] == 1
    assert got["d3"]["n_chunks"] == 2

def test_passage_agg_consistency(spark, pindex):
    """sum == mean * n_chunks per parent; max <= sum; single-chunk parents
    agree across all three aggregations."""
    mx = {r["parent_id"]: r for r in
          passage_search(pindex, "needle", k=10, agg="max").collect()}
    sm = {r["parent_id"]: r for r in
          passage_search(pindex, "needle", k=10, agg="sum").collect()}
    mn = {r["parent_id"]: r for r in
          passage_search(pindex, "needle", k=10, agg="mean").collect()}
    for p in mx:
        assert abs(sm[p]["score"]
                   - mn[p]["score"] * sm[p]["n_chunks"]) < 1e-9
        assert mx[p]["score"] <= sm[p]["score"] + 1e-12
        if mx[p]["n_chunks"] == 1:
            assert abs(mx[p]["score"] - sm[p]["score"]) < 1e-12


def test_passage_matches_search_select_fold(spark, pindex):
    """maxP score == the max of the same index's search_select passage
    scores folded by parent — the operator is exactly that composition."""
    from searchengine_spark.operators.search import search_select
    per = (search_select(pindex, "needle", mode="bm25")
           .select(F.substring_index("conv_id", "#", 1).alias("p"), "score")
           .groupBy("p").agg(F.max("score").alias("s")).collect())
    want = {r["p"]: r["s"] for r in per}
    got = {r["parent_id"]: r["score"] for r in
           passage_search(pindex, "needle", k=10, agg="max").collect()}
    assert set(got) == set(want)
    for p in got:
        assert abs(got[p] - want[p]) < 1e-12


def test_passage_bad_agg_raises(spark, pindex):
    with pytest.raises(ValueError):
        passage_search(pindex, "needle", agg="median")


def test_passage_with_text_returns_best_chunk(spark, pindex):
    out = passage_search(pindex, "needle", k=10, agg="max",
                         with_text=True).collect()
    got = {r["parent_id"]: r for r in out}
    assert set(got) == {"d0", "d1", "d3"}
    # d0's best chunk (ordinal 1) is its second 8-token window
    assert got["d0"]["chunk_text"] == \
        "needle needle needle needle stone stone stone stone"
    assert got["d1"]["chunk_text"].startswith("needle pad0")
    # ordering preserved after the text join
    assert [r["parent_id"] for r in out][0] == "d0"


def test_upsert_passage_docs_matches_rebuild(spark):
    """Replace one doc with a SHORTER text (fewer chunks — stale-ordinal
    hazard), insert a new doc, pure-delete a third: the maintained index
    must rank identically to a fresh build over the modified corpus."""
    from searchengine_spark.operators.passages import upsert_passage_docs
    base_rows = [
        ("d0", "needle one two three four five six seven "
               "needle needle alpha beta gamma delta epsilon zeta"),
        ("d1", "needle " + " ".join(f"pad{i}" for i in range(15))),
        ("d2", " ".join(f"word{i}" for i in range(16))),
    ]
    docs = spark.createDataFrame(base_rows, "doc_id string, text string")
    idx = build_passage_index(docs, chunk_tokens=8, overlap=0)

    # d0 shrinks to ONE chunk, d3 is new, d2 is deleted (empty text)
    new_rows = [("d0", "needle stone stone"),
                ("d3", "needle fresh insert"),
                ("d2", "")]
    delta = spark.createDataFrame(new_rows, "doc_id string, text string")
    up = upsert_passage_docs(idx, delta)

    mod = {r[0]: r[1] for r in base_rows} | {r[0]: r[1] for r in new_rows}
    mod_rows = [(k, v) for k, v in sorted(mod.items()) if v]
    rebuilt = build_passage_index(
        spark.createDataFrame(mod_rows, "doc_id string, text string"),
        chunk_tokens=8, overlap=0)

    def ranked(ix):
        return [(r["parent_id"], r["best_chunk"], r["n_chunks"],
                 round(r["score"], 9))
                for r in passage_search(ix, "needle", k=10).collect()]

    assert ranked(up) == ranked(rebuilt)
    # geometry rides along and stale chunks are gone
    assert up["passage_chunk_tokens"] == 8
    n_d0 = up["docs"].filter("conv_id like 'd0#%'").count()
    assert n_d0 == 1
    assert up["docs"].filter("conv_id like 'd2#%'").count() == 0


def test_passage_search_many_matches_single(spark, pindex):
    """Batched passage retrieval row-for-row equals per-query maxP."""
    from searchengine_spark.operators.passages import passage_search_many
    qs = {"qa": "needle", "qb": "stone needle"}
    batched = passage_search_many(pindex, qs, k=10, agg="max").collect()
    for qid, q in qs.items():
        single = passage_search(pindex, q, k=10, agg="max").collect()
        got = [(r["parent_id"], r["best_chunk"], r["n_chunks"],
                round(r["score"], 9))
               for r in batched if r["query_id"] == qid]
        want = [(r["parent_id"], r["best_chunk"], r["n_chunks"],
                 round(r["score"], 9)) for r in single]
        assert got == want, qid
    # ranks are dense 1..n per query
    for qid in qs:
        ranks = [r["rank"] for r in batched if r["query_id"] == qid]
        assert ranks == list(range(1, len(ranks) + 1))


def test_passage_query_search_grammar(spark):
    """Grammar maxP: phrase + NOT clauses resolve on the positional
    passage index and fold to parents exactly like the term path."""
    from searchengine_spark.operators.passages import passage_query_search
    rows = [
        ("d0", "alpha beta needle stone gamma delta epsilon zeta "
               "needle alpha one two three four five six"),
        ("d1", "needle stone " + " ".join(f"p{i}" for i in range(14))),
        ("d2", "stone needle " + " ".join(f"q{i}" for i in range(14))),
        ("d3", "needle alone here without the stone word pair "
               "one two three four five six seven eight"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    idx = build_passage_index(docs, chunk_tokens=8, overlap=0,
                              with_positions=True)
    # phrase "needle stone": d0 chunk0, d1 chunk0 — NOT alpha bans d0
    out = passage_query_search(idx, '"needle stone" -alpha', k=10).collect()
    got = {r["parent_id"] for r in out}
    assert got == {"d1"}
    # without the ban both phrase matches fold
    out2 = passage_query_search(idx, '"needle stone"', k=10).collect()
    assert {r["parent_id"] for r in out2} == {"d0", "d1"}
    # plain ranked term via the grammar == term path
    a = passage_query_search(idx, "needle", k=10).collect()
    b = passage_search(idx, "needle", k=10).collect()
    assert [(r["parent_id"], round(r["score"], 9)) for r in a] == \
           [(r["parent_id"], round(r["score"], 9)) for r in b]


def test_stream_passage_docs_matches_rebuild(spark, tmp_path_factory):
    """Passage index maintained from a document stream == from-scratch
    passage rebuild of the final corpus; replay is idempotent."""
    import os
    from searchengine_spark.plans.manifest import commit_snapshot, read_current
    from searchengine_spark.plans.manifest import load_index, save_index
    from searchengine_spark.streaming.stream_index import stream_passage_docs

    root = str(tmp_path_factory.mktemp("pstream_root"))
    src = str(tmp_path_factory.mktemp("pstream_src"))
    ckpt = str(tmp_path_factory.mktemp("pstream_ckpt"))

    base_rows = [
        ("d0", "needle one two three four five six seven "
               "needle needle eight nine ten eleven twelve thirteen"),
        ("d1", "needle " + " ".join(f"p{i}" for i in range(15))),
    ]
    docs = spark.createDataFrame(base_rows, "doc_id string, text string")
    base = build_passage_index(docs, chunk_tokens=8, overlap=0)
    save_index(base, f"{root}/snap-00000")
    commit_snapshot(root, "snap-00000")

    # batch 1 replaces d0 with a SHORTER doc; batch 2 inserts d2
    b1 = [("d0", "needle stone stone")]
    b2 = [("d2", "needle fresh stream doc")]
    spark.createDataFrame(b1, "doc_id string, text string") \
        .write.parquet(f"{src}/b1")
    spark.createDataFrame(b2, "doc_id string, text string") \
        .write.parquet(f"{src}/b2")

    q = stream_passage_docs(spark, f"{src}/*", root, ckpt,
                            chunk_tokens=8, overlap=0)
    q.awaitTermination(120)

    final_rows = {r[0]: r[1] for r in base_rows} | dict(b1) | dict(b2)
    rebuilt = build_passage_index(
        spark.createDataFrame(sorted(final_rows.items()),
                              "doc_id string, text string"),
        chunk_tokens=8, overlap=0)

    cur = read_current(root)
    final = load_index(spark, cur)
    final["passage_sep"] = "#"

    def ranked(ix):
        return [(r["parent_id"], r["best_chunk"], r["n_chunks"],
                 round(r["score"], 9))
                for r in passage_search(ix, "needle", k=10).collect()]

    assert ranked(final) == ranked(rebuilt)
    # stale d0 chunks are gone
    assert final["docs"].filter("conv_id like 'd0#%'").count() == 1

    # replay with the same checkpoint: no new snapshot committed
    q2 = stream_passage_docs(spark, f"{src}/*", root, ckpt,
                             chunk_tokens=8, overlap=0)
    q2.awaitTermination(120)
    assert read_current(root) == cur


def test_passage_highlight(spark, pindex):
    from pyspark.sql import functions as F  # noqa: F811
    out = passage_search(pindex, "needle", k=10, agg="max",
                         highlight=True).collect()
    got = {r["parent_id"]: r for r in out}
    assert "<b>needle</b>" in got["d0"]["snippet"]
    assert got["d0"]["chunk_text"].startswith("needle")


def test_passage_geometry_persists_through_save_load_and_maintenance(
        spark, tmp_path_factory):
    """stats['passage'] rides save/load AND the upsert/delete/compact
    rebuilds, so a loaded passage index upserts with no explicit
    geometry arguments."""
    from searchengine_spark.operators.compact import compact_index
    from searchengine_spark.operators.passages import upsert_passage_docs
    from searchengine_spark.plans.manifest import commit_snapshot, read_current
    from searchengine_spark.plans.manifest import load_index, save_index

    root = str(tmp_path_factory.mktemp("pgeo_root"))
    docs = spark.createDataFrame(
        [("d0", "needle one two three four five six seven eight nine"),
         ("d1", "needle alpha beta")],
        "doc_id string, text string")
    idx = build_passage_index(docs, chunk_tokens=8, overlap=2)
    save_index(idx, f"{root}/snap-00000")
    commit_snapshot(root, "snap-00000")

    loaded = load_index(spark, read_current(root))
    assert loaded["stats"]["passage"] == \
        {"sep": "#", "chunk_tokens": 8, "overlap": 2}
    # no explicit geometry: resolved from stats
    delta = spark.createDataFrame([("d2", "needle fresh")],
                                  "doc_id string, text string")
    up = upsert_passage_docs(loaded, delta)
    assert up["stats"]["passage"]["chunk_tokens"] == 8
    assert up["docs"].filter("conv_id like 'd2#%'").count() == 1
    # compaction carries it too
    comp = compact_index(up, reassign_ids=True)
    assert comp["stats"]["passage"]["overlap"] == 2


def test_persisted_passage_merge_writes_delta_layer(spark, tmp_path_factory):
    """merge_passage_docs_into_path persists the chained delete+upsert as
    ONE delta layer (compose_deltas) — the snapshot dir carries
    postings_delta/keys/touched and names its parent — and a chain of
    two merges loads rank-identical to a fresh rebuild of the final
    corpus."""
    import json
    import os

    from searchengine_spark.operators.passages import (
        build_passage_index, merge_passage_docs_into_path)
    from searchengine_spark.plans.manifest import commit_snapshot, read_current
    from searchengine_spark.plans.manifest import load_index, save_index

    root = str(tmp_path_factory.mktemp("proot"))
    base_rows = [
        ("d0", "needle one two three four five six seven "
               "needle needle alpha beta gamma delta epsilon zeta"),
        ("d1", "needle " + " ".join(f"pad{i}" for i in range(15))),
        ("d2", " ".join(f"word{i}" for i in range(16))),
    ]
    docs = spark.createDataFrame(base_rows, "doc_id string, text string")
    idx = build_passage_index(docs, chunk_tokens=8, overlap=0)
    save_index(idx, os.path.join(root, "snap-000000"))
    commit_snapshot(root, "snap-000000")

    d1 = spark.createDataFrame(
        [("d0", "needle stone stone"), ("d3", "needle fresh insert")],
        "doc_id string, text string")
    p1 = merge_passage_docs_into_path(spark, root, d1,
                                      chunk_tokens=8, overlap=0)
    # the committed layer is a DELTA, not a full rewrite
    assert os.path.isdir(os.path.join(p1, "postings_delta"))
    assert not os.path.isdir(os.path.join(p1, "postings"))
    with open(os.path.join(p1, "stats.json")) as f:
        assert json.load(f)["parent"] == "snap-000000"

    d2 = spark.createDataFrame(
        [("d2", ""), ("d3", "needle rewritten much longer text here "
                            "with a second chunk needle inside it yes")],
        "doc_id string, text string")
    p2 = merge_passage_docs_into_path(spark, root, d2,
                                      chunk_tokens=8, overlap=0)
    assert os.path.isdir(os.path.join(p2, "postings_delta"))
    assert read_current(root) == p2

    mod = {r[0]: r[1] for r in base_rows}
    mod.update({r[0]: r[1] for r in d1.collect()})
    mod.update({r[0]: r[1] for r in d2.collect()})
    rebuilt = build_passage_index(
        spark.createDataFrame(
            [(k, v) for k, v in sorted(mod.items()) if v],
            "doc_id string, text string"),
        chunk_tokens=8, overlap=0)
    loaded = load_index(spark, read_current(root))

    def ranked(ix):
        return [(r["parent_id"], r["best_chunk"], r["n_chunks"],
                 round(r["score"], 9))
                for r in passage_search(ix, "needle", k=10).collect()]

    assert ranked(loaded) == ranked(rebuilt)
    # chunk counts reconcile through the chain (stale ordinals gone)
    assert loaded["docs"].filter("conv_id like 'd0#%'").count() == 1
    assert loaded["docs"].filter("conv_id like 'd2#%'").count() == 0
    assert loaded["docs"].filter("conv_id like 'd3#%'").count() == 2
