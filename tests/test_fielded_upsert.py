"""Fielded (BM25F) incremental upsert == fresh rebuild of the merged corpus.

Covers: modified existing turn (df shifts both ways), brand-new turns,
a term whose df drops to 0 (dictionary row deleted, postings gone), and
the persisted path (save → load → upsert → search).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.fielded import (
    bm25f_search, build_fielded_index, load_fielded_index,
    save_fielded_index, upsert_fielded)

SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"

BASE = [
    ("c000", 0, "merge scan pipelines run the merge stage nightly and write output"),
    ("c001", 0, "scan results feed the report generator with aggregated counters"),
    ("c002", 0, "the nightly job does a full table scan before any merge may start"),
    ("c003", 0, "unrelated text about gardens and weather patterns over the winter"),
    ("c004", 0, "zanzibar appears only here so its df goes to zero when replaced"),
]

DELTA = [
    # replaces c004: kills "zanzibar" (df -> 0), adds "merge" occurrences
    ("c004", 0, "merge merge tooling notes replace the old exotic text"),
    # replaces c001: drops "scan", keeps the rest
    ("c001", 0, "results feed the report generator with aggregated counters"),
    # brand-new turns
    ("c005", 0, "fresh conversation about scan schedulers and merge windows"),
    ("c006", 0, "gardens gardens gardens and one lonely scan at the end"),
]


def _df(spark, rows):
    pdf = pd.DataFrame(
        [(c, i, "user", t, None, "2026-01-01 00:00:00") for c, i, t in rows],
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return spark.createDataFrame(pdf, schema=SCHEMA)


def _merged_rows():
    keys = {(c, i) for c, i, _ in DELTA}
    return [r for r in BASE if (r[0], r[1]) not in keys] + DELTA


def _search_set(index, query, k=20):
    return {(r["conv_id"], r["turn_idx"], round(r["score"], 9))
            for r in bm25f_search(index, query, k=k).collect()}


@pytest.fixture(scope="module")
def pair(spark):
    base = build_fielded_index(_df(spark, BASE))
    up = upsert_fielded(base, _df(spark, DELTA))
    rebuilt = build_fielded_index(_df(spark, _merged_rows()))
    return up, rebuilt


def test_terms_match_rebuild(pair):
    up, rebuilt = pair
    for name in ("title", "body"):
        got = {r["term"]: r["df_field"]
               for r in up["fields"][name]["terms"].collect()}
        want = {r["term"]: r["df_field"]
                for r in rebuilt["fields"][name]["terms"].collect()}
        assert got == want, f"field {name} dictionary diverged"
        assert "zanzibar" not in got


def test_wand_bounds_match_rebuild(pair):
    """Per-term (max_tf, min_dl) after an upsert equal a fresh rebuild's
    exactly — touched terms are re-derived from their blocks' maxima, and
    block bounds are exact in both paths (no staleness, no loosening)."""
    up, rebuilt = pair
    for name in ("title", "body"):
        got = {r["term"]: (r["max_tf"], r["min_dl"])
               for r in up["fields"][name]["terms"].collect()}
        want = {r["term"]: (r["max_tf"], r["min_dl"])
                for r in rebuilt["fields"][name]["terms"].collect()}
        assert got == want, f"field {name} WAND bounds diverged"
        assert all(mt is not None and md is not None
                   for mt, md in got.values())
        # block-level bounds agree with the dictionary-level roll-up
        blk = {r["term_id"]: (r["_mt"], r["_md"])
               for r in up["fields"][name]["postings"]
               .groupBy("term_id")
               .agg(F.max("block_max_tf").alias("_mt"),
                    F.min("block_min_dl").alias("_md")).collect()}
        ids = {r["term"]: r["term_id"]
               for r in up["fields"][name]["terms"].collect()}
        for t, b in got.items():
            assert blk[ids[t]] == b, (name, t)


def test_stats_match_rebuild(pair):
    up, rebuilt = pair
    assert up["stats"]["n_docs"] == rebuilt["stats"]["n_docs"] == 7
    for name in ("title", "body"):
        assert up["fields"][name]["total_tokens"] == \
            rebuilt["fields"][name]["total_tokens"]
        assert up["fields"][name]["avgdl"] == pytest.approx(
            rebuilt["fields"][name]["avgdl"])


@pytest.mark.parametrize("query", ["merge scan", "gardens", "report counters"])
def test_search_matches_rebuild(pair, query):
    up, rebuilt = pair
    assert _search_set(up, query) == _search_set(rebuilt, query)


def test_dead_term_unsearchable(pair):
    up, _ = pair
    assert bm25f_search(up, "zanzibar", k=5).count() == 0


def test_upsert_loaded_index(spark, tmp_path):
    base = build_fielded_index(_df(spark, BASE))
    path = str(tmp_path / "fidx")
    save_fielded_index(base, path)
    loaded = load_fielded_index(spark, path)
    up = upsert_fielded(loaded, _df(spark, DELTA))
    rebuilt = build_fielded_index(_df(spark, _merged_rows()))
    assert _search_set(up, "merge scan") == _search_set(rebuilt, "merge scan")
    # and the upserted index round-trips through save/load again
    path2 = str(tmp_path / "fidx2")
    save_fielded_index(up, path2)
    again = load_fielded_index(spark, path2)
    assert _search_set(again, "merge scan") == _search_set(rebuilt, "merge scan")


def test_merge_fielded_snapshot_flow(spark, tmp_path):
    from searchengine_spark.operators.fielded import merge_fielded_into_path
    from searchengine_spark.plans.manifest import commit_snapshot, read_current

    root = str(tmp_path / "froot")
    base = build_fielded_index(_df(spark, BASE))
    save_fielded_index(base, f"{root}/snap-00000")
    commit_snapshot(root, "snap-00000")
    new_dir = merge_fielded_into_path(spark, root, _df(spark, DELTA))
    assert read_current(root) == new_dir
    loaded = load_fielded_index(spark, new_dir)
    rebuilt = build_fielded_index(_df(spark, _merged_rows()))
    assert _search_set(loaded, "merge scan") == _search_set(rebuilt, "merge scan")


def test_field_name_mismatch_rejected(spark):
    base = build_fielded_index(_df(spark, BASE))
    with pytest.raises(ValueError, match="field names"):
        upsert_fielded(base, _df(spark, DELTA),
                       fields={"only_body": F.col("text")})


def test_delete_fielded_matches_rebuild(spark):
    """delete_fielded == build_fielded_index over the filtered corpus:
    per-field df parity (df->0 term dropped), exact avgdl/total_tokens,
    BM25F rank+score parity, and exact per-term WAND bound columns."""
    from searchengine_spark.operators.fielded import delete_fielded
    base = build_fielded_index(_df(spark, BASE),
                               bucket_range=64, block_size=8)
    deleted = delete_fielded(base, F.col("conv_id").isin("c003", "c004"))
    rebuilt = build_fielded_index(
        _df(spark, [r for r in BASE if r[0] not in ("c003", "c004")]),
        bucket_range=64, block_size=8)
    for fname in ("title", "body"):
        dd = {r["term"]: (r["df_field"], r["max_tf"], r["min_dl"])
              for r in deleted["fields"][fname]["terms"].collect()}
        rb = {r["term"]: (r["df_field"], r["max_tf"], r["min_dl"])
              for r in rebuilt["fields"][fname]["terms"].collect()}
        assert dd == rb
        assert "zanzibar" not in dd  # df hit 0 -> dictionary row dropped
        assert deleted["fields"][fname]["total_tokens"] == \
            rebuilt["fields"][fname]["total_tokens"]
        assert abs(deleted["fields"][fname]["avgdl"]
                   - rebuilt["fields"][fname]["avgdl"]) < 1e-12
    assert deleted["stats"]["n_docs"] == rebuilt["stats"]["n_docs"]
    for q in ("merge scan", "gardens", "zanzibar"):
        assert _search_set(deleted, q) == _search_set(rebuilt, q)
    # keys-DataFrame form + empty-delete no-op
    keys = spark.createDataFrame([("c000", 0)],
                                 "conv_id string, turn_idx int")
    d2 = delete_fielded(base, keys)
    assert d2["stats"]["n_docs"] == base["stats"]["n_docs"] - 1
    d3 = delete_fielded(base, F.col("conv_id") == "nope")
    assert d3["stats"]["n_docs"] == base["stats"]["n_docs"]


def test_delete_fielded_snapshot_flow(spark, tmp_path):
    """Persisted fielded DELETE: save -> commit -> delete_fielded_from_path
    -> CURRENT flips -> loaded snapshot matches the in-memory delete."""
    from searchengine_spark.operators.fielded import (
        delete_fielded, delete_fielded_from_path)
    from searchengine_spark.plans.manifest import commit_snapshot, read_current
    base = build_fielded_index(_df(spark, BASE))
    root = str(tmp_path)
    save_fielded_index(base, f"{root}/snap-00000")
    commit_snapshot(root, "snap-00000")
    new_dir = delete_fielded_from_path(
        spark, root, F.col("conv_id") == "c003")
    assert read_current(root) == new_dir
    loaded = load_fielded_index(spark, new_dir)
    mem = delete_fielded(base, F.col("conv_id") == "c003")
    for fname in ("title", "body"):
        ld = {r["term"]: r["df_field"]
              for r in loaded["fields"][fname]["terms"].collect()}
        md = {r["term"]: r["df_field"]
              for r in mem["fields"][fname]["terms"].collect()}
        assert ld == md
    assert _search_set(loaded, "merge scan") == _search_set(mem, "merge scan")


def test_fielded_time_travel_rollback_expire(spark, tmp_path_factory):
    """The generic snapshot-history ops work on fielded roots: AS-OF loads
    pin the old ranking, rollback flips the pointer, expiry GCs the
    abandoned snapshot."""
    import os
    import pytest
    from searchengine_spark.operators.fielded import (
        bm25f_search, build_fielded_index, load_fielded_index_as_of,
        merge_fielded_into_path, save_fielded_index)
    from searchengine_spark.operators.upsert import expire_snapshots, rollback_to
    from searchengine_spark.plans.manifest import commit_snapshot, list_snapshots, read_current
    root = str(tmp_path_factory.mktemp("f_tt"))
    base = build_fielded_index(_df(spark, BASE), mode="general")
    save_fielded_index(base, f"{root}/snap-00000")
    commit_snapshot(root, "snap-00000")

    def ranked(idx):
        return [(r["conv_id"], r["turn_idx"], round(r["score"], 9))
                for r in bm25f_search(idx, "merge scan", k=20).collect()]

    before = ranked(load_fielded_index_as_of(spark, root))
    merge_fielded_into_path(
        spark, root,
        _df(spark, [("c000", 0, "merge merge merge rewritten heavily")]))
    after = ranked(load_fielded_index_as_of(spark, root))
    assert after != before
    assert ranked(load_fielded_index_as_of(spark, root, "snap-00000")) \
        == before
    snaps = list_snapshots(root)
    assert [s["snapshot"] for s in snaps] == ["snap-00000", "snap-00001"]
    assert all(s["kind"] == "full" for s in snaps)
    rollback_to(root, "snap-00000")
    assert os.path.basename(read_current(root)) == "snap-00000"
    # fielded snapshots are full -> only CURRENT itself is live
    assert expire_snapshots(root) == ["snap-00001"]
    assert ranked(load_fielded_index_as_of(spark, root)) == before
    with pytest.raises(ValueError):
        load_fielded_index_as_of(spark, root, "snap-00001")
