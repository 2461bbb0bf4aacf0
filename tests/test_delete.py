"""Incremental delete vs full rebuild: delete_turns must leave an index
query-equivalent to rebuilding on the filtered corpus (the deletion half
of the reference's page re-index,
services/IndexingPageServiceImpl.java:37-135, as its own operator)."""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.indexer import build_index
from searchengine_spark.operators.search import phrase_search, search
from searchengine_spark.operators.upsert import delete_turns

SCHEMA = ("conv_id string, turn_idx int, role string, text string, "
          "tool string, ts timestamp")
VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "unique"]


def _mk_df(spark, rows):
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text",
                                      "tool", "ts"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return spark.createDataFrame(pdf, schema=SCHEMA)


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(20260818)
    rows = [(f"c{i % 7}", i // 7, "user",
             " ".join(rng.choice(VOCAB) for _ in range(rng.randint(2, 12))),
             None, "2026-01-01 00:00:00")
            for i in range(56)]
    # make 'unique' live only in the doomed conversation c3
    rows = [(c, t, r, x.replace("unique", "beta") if c != "c3" else x, tl, ts)
            for c, t, r, x, tl, ts in rows]
    return rows


def _ranked(index, q, mode="bm25"):
    return [(r["conv_id"], r["turn_idx"], round(r["score"], 9))
            for r in search(index, q, k=50, mode=mode).collect()]


def test_delete_matches_rebuild(spark, corpus):
    rows = corpus
    base = build_index(_mk_df(spark, rows), mode="general",
                       bucket_range=64, block_size=8)
    deleted = delete_turns(base, F.col("conv_id") == "c3")
    rebuilt = build_index(
        _mk_df(spark, [r for r in rows if r[0] != "c3"]), mode="general",
        bucket_range=64, block_size=8)
    dd = {r["term"]: r["df"] for r in deleted["terms"].collect()}
    rb = {r["term"]: r["df"] for r in rebuilt["terms"].collect()}
    assert dd == rb
    assert "unique" not in dd  # df hit 0 → lemma dropped
    for s in ("n_docs", "total_tokens"):
        assert deleted["stats"][s] == rebuilt["stats"][s]
    assert abs(deleted["stats"]["avgdl"] - rebuilt["stats"]["avgdl"]) < 1e-12
    # BM25 parity: same stats+df+dl → identical scores, keyed by conv/turn
    for q in ("alpha", "alpha gamma", "beta delta epsilon"):
        assert _ranked(deleted, q) == _ranked(rebuilt, q)
    # the deleted conversation is gone from results and docs
    assert deleted["docs"].filter(F.col("conv_id") == "c3").count() == 0
    hits = search(deleted, "unique", k=10).count()
    assert hits == 0


def test_delete_keys_df_and_positional(spark, corpus):
    rows = corpus
    base = build_index(_mk_df(spark, rows), mode="general",
                       bucket_range=64, block_size=8, with_positions=True)
    doomed = [(c, t) for c, t, *_ in rows if (t % 3 == 0 and c in
                                              ("c1", "c4"))]
    keys = spark.createDataFrame(doomed, "conv_id string, turn_idx int")
    deleted = delete_turns(base, keys)
    keep = [r for r in rows if (r[0], r[1]) not in set(doomed)]
    rebuilt = build_index(_mk_df(spark, keep), mode="general",
                          bucket_range=64, block_size=8,
                          with_positions=True)
    dd = {r["term"]: r["df"] for r in deleted["terms"].collect()}
    rb = {r["term"]: r["df"] for r in rebuilt["terms"].collect()}
    assert dd == rb
    # positional parity: phrase matching still exact after the rewrite
    pd_ = [(r["conv_id"], r["turn_idx"], r["n_matches"]) for r in
           phrase_search(deleted, "alpha beta", k=50).collect()]
    pr = [(r["conv_id"], r["turn_idx"], r["n_matches"]) for r in
          phrase_search(rebuilt, "alpha beta", k=50).collect()]
    assert pd_ == pr and pd_


def test_delete_from_path_snapshot_flow(spark, corpus, tmp_path_factory):
    """Persisted DELETE: save → commit → delete_from_path → CURRENT flips →
    loaded snapshot matches the in-memory delete (term df + ranking)."""
    from searchengine_spark.operators.upsert import delete_from_path
    from searchengine_spark.plans.manifest import commit_snapshot, read_current
    from searchengine_spark.plans.manifest import load_index, save_index
    rows = corpus
    base = build_index(_mk_df(spark, rows), mode="general",
                       bucket_range=64, block_size=8)
    root = str(tmp_path_factory.mktemp("delroot"))
    save_index(base, f"{root}/snap-00000")
    commit_snapshot(root, "snap-00000")
    keys = spark.createDataFrame(
        [("c3", t) for t in range(8)], "conv_id string, turn_idx int")
    new_dir = delete_from_path(spark, root, keys)
    assert read_current(root) == new_dir
    loaded = load_index(spark, new_dir)
    mem = delete_turns(base, F.col("conv_id") == "c3")
    ld = {r["term"]: r["df"] for r in loaded["terms"].collect()}
    md = {r["term"]: r["df"] for r in mem["terms"].collect()}
    assert ld == md
    assert _ranked(loaded, "alpha gamma") == _ranked(mem, "alpha gamma")


def test_delete_edges(spark, corpus):
    rows = corpus
    base = build_index(_mk_df(spark, rows), mode="general",
                       bucket_range=64, block_size=8)
    # empty delete set → same index content, new dict
    same = delete_turns(base, F.col("conv_id") == "nope")
    assert same["stats"] == base["stats"]
    assert same["docs"].count() == base["docs"].count()
    # micro-batch guard (fraction forced to 0 → floor still allows 100k;
    # use an absurd fraction instead: every row > 25% default on a tiny
    # corpus is permitted by the 100k floor, so force the ceiling down)
    with pytest.raises(ValueError, match="micro-batches"):
        import searchengine_spark.operators.upsert as U
        orig = U.MAX_DELTA_ABS
        U.MAX_DELTA_ABS = 10
        try:
            delete_turns(base, F.lit(True), max_delta_fraction=0.0)
        finally:
            U.MAX_DELTA_ABS = orig


def test_retention_sweep(spark, tmp_path):
    """TTL sweep: ts-cutoff predicate deletes exactly the old turns as an
    O(|deleted|) delta commit; the swept index equals a fresh rebuild of
    the survivors, the pre-sweep snapshot stays time-travelable, and a
    no-match sweep commits nothing."""
    from pyspark.sql import functions as F

    from searchengine_spark.operators.indexer import build_index
    from searchengine_spark.operators.upsert import (load_index_as_of,
                                                     retention_sweep)
    from searchengine_spark.plans.manifest import (commit_snapshot,
                                                   list_snapshots,
                                                   read_current, save_index)
    rows = [(f"c{i:03d}", 0, "user", f"alpha beta w{i % 7}", None,
             f"2026-01-{1 + i % 20:02d} 00:00:00") for i in range(40)]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp"))
    root = str(tmp_path / "ret")
    import os
    os.makedirs(root)
    save_index(build_index(t, mode="general"), os.path.join(root,
                                                            "snap-00000"))
    commit_snapshot(root, "snap-00000")
    cutoff = "2026-01-08 00:00:00"
    new_dir, n = retention_sweep(
        spark, root, F.col("ts") < F.to_timestamp(F.lit(cutoff)))
    expected_kept = t.filter(F.col("ts") >= F.to_timestamp(F.lit(cutoff)))
    assert n == 40 - expected_kept.count() and n > 0
    swept = load_index_as_of(spark, root)
    fresh = build_index(expected_kept, mode="general")
    # compare the term→df dictionaries and doc sets exactly
    d1 = {r["term"]: r["df"] for r in swept["terms"].collect()}
    d2 = {r["term"]: r["df"] for r in fresh["terms"].collect()}
    assert d1 == d2
    assert ({r["conv_id"] for r in swept["docs"].collect()}
            == {r["conv_id"] for r in expected_kept.collect()})
    # delta commit + audit window
    snaps = list_snapshots(root)
    assert snaps[-1]["kind"] == "delta" and snaps[-1]["current"]
    pre = load_index_as_of(spark, root, "snap-00000")
    assert pre["docs"].count() == 40
    # no-match sweep: nothing committed
    cur_before = read_current(root)
    same, n0 = retention_sweep(
        spark, root, F.col("conv_id") == "zzz_nomatch")
    assert n0 == 0 and same == cur_before
    assert read_current(root) == cur_before
