"""Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003 — the MOSS
local fingerprinting algorithm): selection == an independent pure-Python
reference on varied/repetitive/short docs, plus the paper's guarantee
(any shared run of >= w+k-1 tokens shares a fingerprint)."""

from __future__ import annotations

import hashlib
import re

import pytest

from searchengine_spark.functions.text import winnow_fingerprints

K, W = 5, 4


def _toks(text: str) -> list[str]:
    return [w for w in re.sub(r"[^a-z0-9 ]", " ", text.lower()).split() if w]


def _ref_winnow(text: str, k: int = K, w: int = W) -> set[tuple[int, int]]:
    t = _toks(text)
    if len(t) < k:
        return set()
    hs = [int(hashlib.md5(" ".join(t[i:i + k]).encode()).hexdigest()[:8], 16)
          for i in range(len(t) - k + 1)]
    sel = set()
    for p in range(max(len(hs) - w, 0) + 1):
        win = hs[p:p + w]
        m = min(win)
        # rightmost minimum (robust winnowing)
        idx = max(i for i, v in enumerate(win) if v == m)
        sel.add((p + idx, m))
    return sel


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2, "a b a b a b a b a b a b"),          # forced hash ties in-window
    (3, "one two three four"),               # < k tokens -> no output
    (4, "one two three four five"),          # exactly one k-gram
    (5, "x " * 30),                          # all-identical grams
]


def test_winnowing_matches_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got: dict[int, set] = {}
    for r in winnow_fingerprints(df, k=K, w=W).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    for doc_id, text in DOCS:
        assert got.get(doc_id, set()) == _ref_winnow(text), (doc_id, text)
    assert 3 not in got and len(got[4]) == 1


def test_winnowing_shared_run_guarantee(spark):
    shared = "copied passage tokens run through both documents verbatim here"
    a = "unique lead in words then " + shared + " and a tail"
    b = "totally different opening text " + shared + " closing words differ"
    df = spark.createDataFrame([(0, a), (1, b)], "doc_id long, text string")
    rows = winnow_fingerprints(df, k=K, w=W).collect()
    fps = {0: set(), 1: set()}
    for r in rows:
        fps[r["doc_id"]].add(r["fp"])
    assert len(_toks(shared)) >= W + K - 1
    assert fps[0] & fps[1], "shared >= w+k-1 run must share a fingerprint"
    # density sanity: ~2/(w+1) of the k-grams get selected, never all
    n_grams = len(_toks(a)) - K + 1
    assert len(fps[0]) < n_grams


def test_winnow_neardup_pairs(spark):
    """Pair detection: a planted shared passage links exactly the two
    docs that carry it; min_shared filters; the boilerplate df cap
    removes ubiquitous fingerprints from pairing."""
    from searchengine_spark.functions.dedup import winnow_neardup_pairs
    shared = ("quick brown foxes jump over lazy dogs beside the quiet "
              "river bank every single morning while distant church bells "
              "ring across the misty valley announcing another market day "
              "to sleepy villagers")
    footer = "standard footer text repeated across every document here"
    docs = [
        (0, "intro words before the passage " + shared + " tail zero " + footer),
        (1, "other document leading text " + shared + " ending one " + footer),
        (2, "entirely unrelated content about databases and queries " + footer),
        (3, "more unrelated material concerning distributed systems " + footer),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r["shared"]
           for r in winnow_neardup_pairs(df, k=5, w=4, min_shared=5,
                                         max_fp_df=None).collect()}
    linked = {p for p, s in got.items() if s >= 5}
    assert (0, 1) in linked
    # the footer alone (shorter shared run) must not clear min_shared=5
    assert (2, 3) not in linked
    # df cap: fingerprints present in >3 docs (the footer's) are dropped,
    # the planted pair must survive on its own shared passage
    got2 = {(r["id_a"], r["id_b"]): r["shared"]
            for r in winnow_neardup_pairs(df, k=5, w=4, min_shared=5,
                                          max_fp_df=3).collect()}
    assert (0, 1) in got2
    assert got2[(0, 1)] <= got[(0, 1)]
