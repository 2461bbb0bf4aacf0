"""Scatter-gather sharded serving (operators/sharded.py).

search_sharded over K independently built shards must equal search over
the combined build — score AND rank identical — because every shard
scores under corpus-global (n_docs, avgdl, df). This is the serve-in-place
half of the shard story (merge_indexes is the build half); the distributed
analog of the reference's per-site lemma lookups
(services/SearchingServiceImpl.java:203-270).
"""

from __future__ import annotations

import random

import pandas as pd
import pytest

from searchengine_spark.operators.indexer import build_index
from searchengine_spark.operators.search import search
from searchengine_spark.operators.sharded import search_sharded, sharded_stats

SCHEMA = ("conv_id string, turn_idx int, role string, text string, "
          "tool string, ts timestamp")
VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "omega"]


def _mk_df(spark, rows):
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text",
                                      "tool", "ts"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return spark.createDataFrame(pdf, schema=SCHEMA)


@pytest.fixture(scope="module")
def rows():
    rng = random.Random(20260819)
    return [(f"c{i % 9}", i // 9, "user",
             " ".join(rng.choice(VOCAB) for _ in range(rng.randint(2, 12))),
             None, "2026-01-01 00:00:00")
            for i in range(120)]


def _build(spark, rs):
    return build_index(_mk_df(spark, rs), mode="general",
                       bucket_range=64, block_size=8)


@pytest.fixture(scope="module")
def combined(spark, rows):
    return _build(spark, rows)


@pytest.fixture(scope="module")
def shards2(spark, rows):
    left = [r for r in rows if r[0] in ("c0", "c1", "c2", "c3")]
    right = [r for r in rows if r[0] not in ("c0", "c1", "c2", "c3")]
    return [_build(spark, left), _build(spark, right)]


@pytest.fixture(scope="module")
def shards3_interleaved(spark, rows):
    # docs interleaved across shards (NOT conv-contiguous): exercises the
    # cross-shard (conv_id, turn_idx) tie-break merge
    parts = [[r for i, r in enumerate(rows) if i % 3 == j] for j in range(3)]
    return [_build(spark, p) for p in parts]


def _key(df):
    return [(r["conv_id"], r["turn_idx"], round(r["score"], 9))
            for r in df.collect()]


QUERIES = ["alpha", "alpha gamma", "beta delta epsilon", "omega zeta"]


@pytest.mark.parametrize("q", QUERIES)
def test_sharded_equals_combined(shards2, combined, q):
    got = _key(search_sharded(shards2, q, k=50))
    expected = _key(search(combined, q, k=50, mode="bm25"))
    assert got == expected


@pytest.mark.parametrize("q", QUERIES[:2])
def test_interleaved_shards_equal_combined(shards3_interleaved, combined, q):
    got = _key(search_sharded(shards3_interleaved, q, k=50))
    expected = _key(search(combined, q, k=50, mode="bm25"))
    assert got == expected


def test_sharded_pruned_equals_exhaustive(shards2, q="alpha gamma"):
    pruned = _key(search_sharded(shards2, q, k=20, prune_blocks=True))
    full = _key(search_sharded(shards2, q, k=20, prune_blocks=False))
    assert pruned == full


def test_sharded_offset(shards2, combined):
    q = "alpha gamma"
    got = _key(search_sharded(shards2, q, k=10, offset=10))
    expected = _key(search(combined, q, k=10, offset=10, mode="bm25"))
    assert got == expected


def test_sharded_min_match_and_exclude(shards2, combined):
    q = "beta delta epsilon"
    got = _key(search_sharded(shards2, q, k=30, min_match=2, exclude="omega"))
    expected = _key(search(combined, q, k=30, mode="bm25",
                           min_match=2, exclude="omega"))
    assert got == expected


def test_sharded_scope(shards2, combined):
    q = "alpha gamma"
    got = _key(search_sharded(shards2, q, k=30, scope="c1"))
    expected = _key(search(combined, q, k=30, mode="bm25", scope="c1"))
    assert got == expected


def test_global_stats_assembly(shards2, combined):
    g = sharded_stats(shards2, "alpha omega")
    assert g["n_docs"] == combined["stats"]["n_docs"]
    assert abs(g["avgdl"] - combined["stats"]["avgdl"]) < 1e-9
    cdf = {r["term"]: r["df"] for r in combined["terms"].collect()
           if r["term"] in ("alpha", "omega")}
    assert g["df_of"] == cdf


def test_sharded_oov_empty(shards2):
    assert search_sharded(shards2, "nonexistentzz", k=10).count() == 0


def test_shard_column_present(shards2):
    rows = search_sharded(shards2, "alpha", k=5).collect()
    assert {r["shard"] for r in rows} <= {0, 1}


def test_batched_sharded_equals_combined(shards2, combined):
    from searchengine_spark.operators.search import search_many
    from searchengine_spark.operators.sharded import search_many_sharded
    qs = {"a": "alpha gamma", "b": "beta delta epsilon", "c": "omega zeta"}
    got = {}
    for r in search_many_sharded(shards2, qs, k=30).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["conv_id"], r["turn_idx"], round(r["score"], 9)))
    exp = {}
    for r in search_many(combined, qs, k=30, mode="bm25").collect():
        exp.setdefault(r["query_id"], []).append(
            (r["rank"], r["conv_id"], r["turn_idx"], round(r["score"], 9)))
    assert got == exp and set(got) == set(qs)


def test_batched_sharded_offset_and_min_match(shards2, combined):
    from searchengine_spark.operators.search import search_many
    from searchengine_spark.operators.sharded import search_many_sharded
    qs = {"a": "alpha gamma", "b": "beta delta epsilon"}
    got = [(r["query_id"], r["rank"], r["conv_id"], r["turn_idx"],
            round(r["score"], 9))
           for r in search_many_sharded(shards2, qs, k=5, offset=5,
                                        min_match={"b": 2}).collect()]
    exp = [(r["query_id"], r["rank"], r["conv_id"], r["turn_idx"],
            round(r["score"], 9))
           for r in search_many(combined, qs, k=5, offset=5, mode="bm25",
                                min_match={"b": 2}).collect()]
    assert got == exp
