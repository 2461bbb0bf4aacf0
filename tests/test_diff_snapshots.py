"""diff_snapshots: natural-key doc/term diffs between index versions."""

import pandas as pd

from searchengine_spark.operators.indexer import build_index
from searchengine_spark.operators.upsert import diff_snapshots, merge_into_path, delete_from_path
from searchengine_spark.plans.manifest import commit_snapshot
from searchengine_spark.plans.manifest import save_index

SCHEMA = ("conv_id string, turn_idx int, role string, text string, "
          "tool string, ts timestamp")

BASE = [("c00", 0, "user", "alpha beta gamma", None, None),
        ("c00", 1, "user", "alpha beta", None, None),
        ("c01", 0, "user", "beta gamma delta", None, None),
        ("c02", 0, "user", "alpha delta", None, None)]


def _mk_df(spark, rows):
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text",
                                      "tool", "ts"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return spark.createDataFrame(pdf, schema=SCHEMA)


def test_diff_after_merge_and_delete(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("diff_root"))
    base = build_index(_mk_df(spark, BASE), mode="general",
                       bucket_range=8, block_size=4)
    save_index(base, f"{root}/snap-00000")
    commit_snapshot(root, "snap-00000")

    # merge: one replaced turn (new vocab "omega"), one brand-new turn
    merge_into_path(spark, root, _mk_df(spark, [
        ("c00", 0, "user", "alpha omega", None, None),
        ("c03", 0, "user", "omega omega", None, None)]))
    # then delete conversation c01 entirely
    delete_from_path(spark, root, "conv_id = 'c01'")

    d = diff_snapshots(spark, root, "snap-00000")
    added = {(r["conv_id"], r["turn_idx"])
             for r in d["docs_added"].collect()}
    removed = {(r["conv_id"], r["turn_idx"])
               for r in d["docs_removed"].collect()}
    # (c00, 0) was REPLACED in place: same natural key, so neither set
    assert added == {("c03", 0)}
    assert removed == {("c01", 0)}
    changed = {r["term"]: (r["df_a"], r["df_b"])
               for r in d["terms_changed"].collect()}
    # omega is new; gamma lost both its docs (c00t0 rewrite + c01 delete);
    # beta lost two of three; delta lost one of two
    assert changed["omega"] == (None, 2)
    assert changed["gamma"] == (2, None)
    assert changed["beta"] == (3, 1)
    assert changed["delta"] == (2, 1)
    assert "alpha" not in changed  # df 3 → 3: c01 never had alpha
    s = d["summary"]
    assert s["n_docs_a"] == 4 and s["n_docs_b"] == 4
    assert s["docs_added"] == 1 and s["docs_removed"] == 1
    assert s["terms_changed"] == len(changed)


def test_diff_identity_is_empty(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("diff_id_root"))
    base = build_index(_mk_df(spark, BASE), mode="general",
                       bucket_range=8, block_size=4)
    save_index(base, f"{root}/snap-00000")
    commit_snapshot(root, "snap-00000")
    d = diff_snapshots(spark, root, "snap-00000", "snap-00000")
    assert d["summary"]["docs_added"] == 0
    assert d["summary"]["docs_removed"] == 0
    assert d["summary"]["terms_changed"] == 0
