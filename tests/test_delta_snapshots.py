"""Incremental (delta) snapshots: merge_into_path/delete_from_path with
incremental=True must write O(|delta|) bytes per micro-batch (rewritten
blocks + delta docs + touched set, no full index copy), and load_index
must resolve the parent chain back to an index query-identical to the
in-memory upsert/delete chain. compact_into_path collapses the chain into
a full snapshot."""

from __future__ import annotations

import json
import os

import pandas as pd
from pyspark.sql import functions as F

from searchengine_spark.operators.indexer import build_index
from searchengine_spark.operators.search import phrase_search, search
from searchengine_spark.operators.upsert import delete_from_path, delete_turns, merge_into_path, upsert_turns
from searchengine_spark.plans.manifest import commit_snapshot, read_current
from searchengine_spark.plans.manifest import load_index, save_index

SCHEMA = ("conv_id string, turn_idx int, role string, text string, "
          "tool string, ts timestamp")

BASE = [("c%02d" % (i // 4), i % 4, "user",
         t, None, "2026-01-01 00:00:00")
        for i, t in enumerate(
            (w1 + " " + w2 + " " + w3)
            for w1 in ("alpha", "beta", "gamma", "delta")
            for w2 in ("alpha", "epsilon", "zeta")
            for w3 in ("omega", "beta"))]


def _mk_df(spark, rows):
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text",
                                      "tool", "ts"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return spark.createDataFrame(pdf, schema=SCHEMA)


def _ranked(index, q, mode="bm25"):
    return [(r["conv_id"], r["turn_idx"], round(r["score"], 9))
            for r in search(index, q, k=50, mode=mode).collect()]


def _stats_json(path):
    with open(os.path.join(path, "stats.json")) as f:
        return json.load(f)


def test_delta_chain_matches_inmemory(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("delta_root"))
    base = build_index(_mk_df(spark, BASE), mode="general",
                       bucket_range=8, block_size=4)
    save_index(base, f"{root}/snap-00000")
    commit_snapshot(root, "snap-00000")

    d1 = [("c00", 1, "user", "alpha omega rewrite one", None,
           "2026-02-01 00:00:00"),
          ("zz_new", 0, "user", "zeta zeta fresh", None,
           "2026-02-01 00:00:00")]
    d2 = [("c02", 0, "user", "beta beta second rewrite", None,
           "2026-02-02 00:00:00")]
    s1 = merge_into_path(spark, root, _mk_df(spark, d1), incremental=True)
    s2 = merge_into_path(spark, root, _mk_df(spark, d2), incremental=True)
    s3 = delete_from_path(spark, root, _mk_df(
        spark, [("c01", t, "user", "", None, "2026-01-01 00:00:00")
                for t in range(4)]).select("conv_id", "turn_idx"),
        incremental=True)
    assert read_current(root) == s3

    # delta layout: no full postings/docs copies, parent chain recorded
    for s, parent in ((s1, "snap-00000"), (s2, os.path.basename(s1)),
                      (s3, os.path.basename(s2))):
        st = _stats_json(s)
        assert st["parent"] == parent
        assert not os.path.exists(os.path.join(s, "postings"))
        assert not os.path.exists(os.path.join(s, "docs"))
        assert os.path.exists(os.path.join(s, "postings_delta"))
    # the delta snapshots carry far fewer blocks than the full index
    full_blocks = base["postings"].count()
    d1_blocks = spark.read.parquet(f"{s1}/postings_delta").count()
    assert 0 < d1_blocks < full_blocks / 2

    # chain-resolved load == the same chain applied in memory
    mem = upsert_turns(base, _mk_df(spark, d1))
    mem = upsert_turns(mem, _mk_df(spark, d2))
    mem = delete_turns(mem, F.col("conv_id") == "c01")
    loaded = load_index(spark, read_current(root))
    ld = {r["term"]: r["df"] for r in loaded["terms"].collect()}
    md = {r["term"]: r["df"] for r in mem["terms"].collect()}
    assert ld == md
    for s_ in ("n_docs", "total_tokens"):
        assert loaded["stats"][s_] == mem["stats"][s_]
    for q in ("alpha", "beta omega", "zeta"):
        assert _ranked(loaded, q) == _ranked(mem, q)
        assert _ranked(loaded, q, "ref_compat") == _ranked(mem, q,
                                                           "ref_compat")
    assert loaded["docs"].filter(F.col("conv_id") == "c01").count() == 0


def test_delta_then_compact_collapses_chain(spark, tmp_path_factory):
    from searchengine_spark.operators.compact import compact_into_path
    root = str(tmp_path_factory.mktemp("delta_cmp"))
    base = build_index(_mk_df(spark, BASE), mode="general",
                       bucket_range=64, block_size=8)
    save_index(base, f"{root}/snap-00000")
    commit_snapshot(root, "snap-00000")
    merge_into_path(spark, root, _mk_df(
        spark, [("c03", 2, "user", "omega omega compacted", None,
                 "2026-02-01 00:00:00")]), incremental=True)
    chained = load_index(spark, read_current(root))
    new_dir = compact_into_path(spark, root, reassign_ids=True)
    st = _stats_json(new_dir)
    assert "parent" not in st  # full snapshot — chain reset
    assert os.path.exists(os.path.join(new_dir, "postings"))
    loaded = load_index(spark, new_dir)
    assert not loaded["stats"].get("tf_bounds")
    for q in ("alpha", "omega"):
        assert _ranked(loaded, q) == _ranked(chained, q)


def test_delta_positional_phrase(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("delta_pos"))
    base = build_index(_mk_df(spark, BASE), mode="general",
                       bucket_range=64, block_size=8, with_positions=True)
    save_index(base, f"{root}/snap-00000")
    commit_snapshot(root, "snap-00000")
    merge_into_path(spark, root, _mk_df(
        spark, [("c00", 0, "user", "alpha beta alpha beta", None,
                 "2026-02-01 00:00:00")]), incremental=True)
    loaded = load_index(spark, read_current(root))
    mem = upsert_turns(base, _mk_df(
        spark, [("c00", 0, "user", "alpha beta alpha beta", None,
                 "2026-02-01 00:00:00")]))
    pl = [(r["conv_id"], r["turn_idx"], r["n_matches"]) for r in
          phrase_search(loaded, "alpha beta", k=50).collect()]
    pm = [(r["conv_id"], r["turn_idx"], r["n_matches"]) for r in
          phrase_search(mem, "alpha beta", k=50).collect()]
    assert pl == pm and pl


def test_streaming_incremental_snapshots(spark, tmp_path_factory):
    """The log-structured streaming sink with delta snapshots: merges write
    O(|batch|) layers; the periodic compaction writes a full snapshot and
    resets the chain; final results match a rebuild."""
    from searchengine_spark.streaming.stream_index import stream_index_turns
    root = str(tmp_path_factory.mktemp("inc_root"))
    src = str(tmp_path_factory.mktemp("inc_src"))
    ckpt = str(tmp_path_factory.mktemp("inc_ckpt"))
    base_rows = BASE[:12]
    base = build_index(_mk_df(spark, base_rows), mode="general",
                       bucket_range=64, block_size=8)
    save_index(base, f"{root}/snap-00000")
    commit_snapshot(root, "snap-00000")
    drop = [("zz", 0, "user", "omega alpha streamed", None,
             "2026-02-01 00:00:00")]
    _mk_df(spark, drop).write.parquet(f"{src}/d1")
    stream_index_turns(spark, f"{src}/*", root, ckpt, available_now=True,
                       incremental_snapshots=True,
                       compact_every=2).awaitTermination(120)
    cur = read_current(root)
    assert _stats_json(cur).get("parent")  # 1 merge < compact_every → delta
    loaded = load_index(spark, cur)
    rebuilt = build_index(_mk_df(spark, base_rows + drop), mode="general",
                          bucket_range=64, block_size=8)
    ld = {r["term"]: r["df"] for r in loaded["terms"].collect()}
    rb = {r["term"]: r["df"] for r in rebuilt["terms"].collect()}
    assert ld == rb
    # incompatible flags rejected
    import pytest as _pytest
    with _pytest.raises(ValueError, match="main index"):
        stream_index_turns(spark, f"{src}/*", root, ckpt, fielded=True,
                           incremental_snapshots=True)


def test_time_travel_rollback_and_expire(spark, tmp_path_factory):
    """Iceberg-style history ops on the snapshot protocol: VERSION AS OF
    loads pin an immutable version, rollback is a pointer flip, the next
    commit branches under a fresh ordinal (never reusing a name), and
    expire_snapshots GC-keeps exactly CURRENT's parent chain."""
    from searchengine_spark.operators.upsert import expire_snapshots, load_index_as_of, rollback_to
    from searchengine_spark.plans.manifest import list_snapshots
    import pytest
    root = str(tmp_path_factory.mktemp("tt_root"))
    base = build_index(_mk_df(spark, BASE), mode="general",
                       bucket_range=8, block_size=4)
    save_index(base, f"{root}/snap-00000")
    commit_snapshot(root, "snap-00000")
    before = _ranked(load_index_as_of(spark, root), "alpha omega")

    d1 = [("c00", 1, "user", "alpha omega rewrite one", None,
           "2026-02-01 00:00:00")]
    merge_into_path(spark, root, _mk_df(spark, d1), incremental=True)
    after = _ranked(load_index_as_of(spark, root), "alpha omega")
    assert after != before
    # VERSION AS OF: the old snapshot still answers with the old results
    assert _ranked(load_index_as_of(spark, root, "snap-00000"),
                   "alpha omega") == before

    snaps = list_snapshots(root)
    assert [(s["snapshot"], s["kind"], s["current"]) for s in snaps] == \
        [("snap-00000", "full", False), ("snap-00001", "delta", True)]
    assert snaps[1]["parent"] == "snap-00000"
    assert 0 < snaps[1]["bytes"] < snaps[0]["bytes"]

    # rollback: pointer flip only; the abandoned snapshot stays readable
    rollback_to(root, "snap-00000")
    assert os.path.basename(read_current(root)) == "snap-00000"
    assert _ranked(load_index_as_of(spark, root), "alpha omega") == before
    assert _ranked(load_index_as_of(spark, root, "snap-00001"),
                   "alpha omega") == after

    # a new commit after rollback branches under a FRESH ordinal
    d2 = [("c02", 0, "user", "beta beta branched", None,
           "2026-02-02 00:00:00")]
    merge_into_path(spark, root, _mk_df(spark, d2), incremental=True)
    assert os.path.basename(read_current(root)) == "snap-00002"
    assert _stats_json(f"{root}/snap-00002")["parent"] == "snap-00000"

    # expire: keeps CURRENT's chain {00002, 00000}, drops the abandoned
    # branch 00001; time travel to it then raises
    assert expire_snapshots(root) == ["snap-00001"]
    assert sorted(s["snapshot"] for s in list_snapshots(root)) == \
        ["snap-00000", "snap-00002"]
    assert _ranked(load_index_as_of(spark, root), "beta") == \
        _ranked(load_index_as_of(spark, root, "snap-00002"), "beta")
    with pytest.raises(ValueError):
        load_index_as_of(spark, root, "snap-00001")
    with pytest.raises(ValueError):
        rollback_to(root, "snap-99999")
