"""span_search (unordered n-term windowed proximity): golden brute-force
parity on a randomized corpus, plus scope/exclude/offset contracts."""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.search import span_search

VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]


def _min_span(tokens: list[str], terms: set[str]) -> "int | None":
    """Exact brute-force tightest window: O(P^2) scan over positions."""
    pos = [(i, t) for i, t in enumerate(tokens) if t in terms]
    best = None
    for si, (i, _) in enumerate(pos):
        seen = set()
        for j, t in pos[si:]:
            seen.add(t)
            if len(seen) == len(terms):
                w = j - i
                best = w if best is None else min(best, w)
                break
    return best


@pytest.fixture(scope="module")
def span_corpus(spark):
    from searchengine_spark.operators.indexer import build_index
    rng = random.Random(20260818)
    texts = [" ".join(rng.choice(VOCAB) for _ in range(rng.randint(3, 40)))
             for _ in range(60)]
    rows = [(f"s{i:03d}", 0, "user", t, None, "2026-01-01 00:00:00")
            for i, t in enumerate(texts)]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text",
                                      "tool", "ts"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    sdf = spark.createDataFrame(
        pdf, schema="conv_id string, turn_idx int, role string, text string,"
                    " tool string, ts timestamp")
    idx = build_index(sdf, mode="general", bucket_range=16, block_size=8,
                      with_positions=True)
    return idx, texts


@pytest.mark.parametrize("terms,window", [
    ("alpha beta", 3),
    ("alpha beta gamma", 5),
    ("alpha beta gamma delta", 8),
])
def test_span_golden(span_corpus, terms, window):
    idx, texts = span_corpus
    tset = set(terms.split())
    exp = sorted(
        (f"s{i:03d}", s) for i, t in enumerate(texts)
        if (s := _min_span(t.split(), tset)) is not None and s <= window)
    got = span_search(idx, terms, window=window, k=1000).collect()
    assert sorted((r["conv_id"], r["span"]) for r in got) == exp
    assert exp  # non-vacuous at these windows on this corpus
    # ranked tightest-first, doc_id tiebreak
    ranks = [(r["span"], r["doc_id"]) for r in got]
    assert ranks == sorted(ranks)


def test_span_scope_exclude_offset(span_corpus):
    idx, texts = span_corpus
    full = span_search(idx, "alpha beta gamma", window=6, k=1000).collect()
    assert len(full) > 4
    # conv-prefix scope == post-filter of the unscoped result
    scoped = span_search(idx, "alpha beta gamma", window=6, k=1000,
                         scope="s00").collect()
    assert [(r["conv_id"], r["span"]) for r in scoped] == \
           [(r["conv_id"], r["span"]) for r in full
            if r["conv_id"].startswith("s00")]
    # exclude bans docs containing the NOT term anywhere
    banned = {f"s{i:03d}" for i, t in enumerate(texts)
              if "zeta" in t.split()}
    xs = span_search(idx, "alpha beta gamma", window=6, k=1000,
                     exclude="zeta").collect()
    assert [(r["conv_id"], r["span"]) for r in xs] == \
           [(r["conv_id"], r["span"]) for r in full
            if r["conv_id"] not in banned]
    # absolute-rank pagination
    p1 = span_search(idx, "alpha beta gamma", window=6, k=3).collect()
    p2 = span_search(idx, "alpha beta gamma", window=6, k=3,
                     offset=3).collect()
    assert [(r["conv_id"], r["span"]) for r in p1 + p2] == \
           [(r["conv_id"], r["span"]) for r in full[:6]]


def test_span_many_matches_single(span_corpus):
    """Batched spans == per-query span_search rows (shared window),
    including a dropped unmatchable query and per-query windows."""
    from searchengine_spark.operators.search import span_search_many
    idx, _ = span_corpus
    qs = {"qa": "alpha beta", "qb": "alpha beta gamma",
          "qx": "alpha zzznope"}
    got = span_search_many(idx, qs, window=4, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["conv_id"], r["span"]))
    assert "qx" not in by_q
    for qid in ("qa", "qb"):
        exp = [(i + 1, r["conv_id"], r["span"]) for i, r in enumerate(
            span_search(idx, qs[qid], window=4, k=5).collect())]
        assert by_q[qid] == exp and exp
    # per-query windows via (words, window) values
    got2 = span_search_many(
        idx, {"t1": ("alpha beta", 2), "t2": ("alpha beta gamma", 7)},
        k=5).collect()
    by_q2 = {}
    for r in got2:
        by_q2.setdefault(r["query_id"], []).append((r["conv_id"], r["span"]))
    assert by_q2["t1"] == [(r["conv_id"], r["span"]) for r in
                           span_search(idx, "alpha beta", window=2,
                                       k=5).collect()]
    assert by_q2["t2"] == [(r["conv_id"], r["span"]) for r in
                           span_search(idx, "alpha beta gamma", window=7,
                                       k=5).collect()]


def test_span_many_exclude_offset(span_corpus):
    from searchengine_spark.operators.search import span_search_many
    idx, _ = span_corpus
    qs = {"qa": "alpha beta", "qb": "beta gamma"}
    got = span_search_many(idx, qs, window=3, k=4, offset=2,
                           exclude={"qa": "zeta"}).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["conv_id"], r["span"]))
    exp_a = [(i + 3, r["conv_id"], r["span"]) for i, r in enumerate(
        span_search(idx, "alpha beta", window=3, k=4, offset=2,
                    exclude="zeta").collect())]
    exp_b = [(i + 3, r["conv_id"], r["span"]) for i, r in enumerate(
        span_search(idx, "beta gamma", window=3, k=4, offset=2).collect())]
    assert by_q.get("qa", []) == exp_a
    assert by_q.get("qb", []) == exp_b and exp_b


def test_span_edge_cases(span_corpus):
    idx, _ = span_corpus
    # absent term → empty; single term → width-0 spans (presence)
    assert span_search(idx, "alpha zzznope", window=5, k=10).count() == 0
    single = span_search(idx, "alpha", window=0, k=1000).collect()
    assert single and all(r["span"] == 0 for r in single)
    # non-positional index refuses
    from searchengine_spark.operators.indexer import build_index
    spark = idx["docs"].sparkSession
    flat = build_index(idx["docs"].select("conv_id", "turn_idx", "role",
                                          "text", "tool", "ts"),
                       mode="general")
    with pytest.raises(ValueError, match="positions"):
        span_search(flat, "alpha beta", window=3, k=10)


def _min_ordered_span(tokens: list[str], seq: list[str]) -> "int | None":
    """Brute force: tightest in-order chain (strictly increasing positions,
    one token per slot)."""
    import itertools
    pos_of = {}
    for i, t in enumerate(tokens):
        pos_of.setdefault(t, []).append(i)
    if any(t not in pos_of for t in seq):
        return None
    best = None
    for combo in itertools.product(*[pos_of[t] for t in seq]):
        if all(combo[i] < combo[i + 1] for i in range(len(combo) - 1)):
            w = combo[-1] - combo[0]
            best = w if best is None else min(best, w)
    return best


@pytest.mark.parametrize("terms,window", [
    ("alpha beta", 4),
    ("beta alpha", 4),
    ("alpha beta gamma", 8),
    ("gamma beta alpha", 8),
    ("alpha beta alpha", 10),   # duplicate lemma: needs two distinct alphas
])
def test_ordered_span_golden(span_corpus, terms, window):
    idx, texts = span_corpus
    seq = terms.split()
    exp = sorted(
        (f"s{i:03d}", s) for i, t in enumerate(texts)
        if (s := _min_ordered_span(t.split(), seq)) is not None
        and s <= window)
    got = span_search(idx, terms, window=window, k=1000,
                      ordered=True).collect()
    assert sorted((r["conv_id"], r["span"]) for r in got) == exp
    assert exp  # non-vacuous on this corpus


def test_ordered_span_subset_of_unordered(span_corpus):
    idx, _ = span_corpus
    uno = {(r["doc_id"], r["span"]) for r in
           span_search(idx, "alpha beta gamma", window=6, k=1000).collect()}
    order = {r["doc_id"]: r["span"] for r in
             span_search(idx, "alpha beta gamma", window=6, k=1000,
                         ordered=True).collect()}
    # ordered docs ⊆ unordered docs; ordered span ≥ the unordered minimum
    assert set(order) <= {d for d, _ in uno}
    umin = {}
    for d, s in uno:
        umin[d] = min(s, umin.get(d, 10 ** 9))
    assert all(order[d] >= umin[d] for d in order)


def test_ordered_span_window_nminus1_is_phrase(span_corpus):
    from searchengine_spark.operators.search import phrase_search
    idx, _ = span_corpus
    q = "alpha beta"
    ph = {r["doc_id"] for r in
          phrase_search(idx, q, k=1000).collect()}
    sp = {r["doc_id"] for r in
          span_search(idx, q, window=1, k=1000, ordered=True).collect()}
    assert sp == ph and ph


def test_ordered_span_batched_equals_single(span_corpus):
    from searchengine_spark.operators.search import span_search_many
    idx, _ = span_corpus
    qs = {"a": ("alpha beta", 4), "b": ("gamma beta alpha", 8),
          "c": ("alpha beta alpha", 10), "d": ("zeta epsilon", 6)}
    batched = span_search_many(idx, qs, k=1000, ordered=True)
    rows = {}
    for r in batched.collect():
        rows.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["span"]))
    for qid, (words, w) in qs.items():
        single = [(i + 1, r["doc_id"], r["span"]) for i, r in enumerate(
            span_search(idx, words, window=w, k=1000,
                        ordered=True).collect())]
        assert rows.get(qid, []) == single, qid
    assert any(rows.values())
