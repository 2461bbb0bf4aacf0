"""Deterministic sampling / data-mixing: golden parity with a pure-Python
reimplementation of the selection contract, plus layout-independence."""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from searchengine_spark.functions.sampling import (
    HASH_SPACE, det_hash_col, stratified_sample, token_budget_mix)

_P, _A, _C = 1_000_000_007, 1103515245, 12345


def _h(key: int, salt: int = 0) -> int:
    return (((key % _P) + salt) * _A + _C) % HASH_SPACE


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(20260818)
    rows = [(i, rng.choice(["web", "code", "chat"]), rng.randint(1, 500))
            for i in range(400)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "source", "n_tokens"])
    sdf = spark.createDataFrame(
        pdf, schema="doc_id long, source string, n_tokens int")
    return sdf, rows


def test_det_hash_matches_python(corpus):
    sdf, rows = corpus
    got = {r["doc_id"]: r["h"] for r in
           sdf.select("doc_id",
                      det_hash_col(F.col("doc_id"), salt=7).alias("h"))
           .collect()}
    assert got == {i: _h(i, 7) for i, _, _ in rows}


def test_stratified_sample_exact(corpus):
    sdf, rows = corpus
    fr = {"web": 0.25, "code": 0.9}
    exp = {i for i, s, _ in rows
           if s in fr and _h(i) < int(fr[s] * HASH_SPACE)}
    got = {r["doc_id"] for r in
           stratified_sample(sdf, fr, "source", "doc_id").collect()}
    assert got == exp and got  # chat defaults to 0.0 → dropped
    # default_fraction keeps unmapped strata at the given rate
    got2 = {r["doc_id"] for r in
            stratified_sample(sdf, fr, "source", "doc_id",
                              default_fraction=1.0).collect()}
    assert got2 == exp | {i for i, s, _ in rows if s == "chat"}
    # layout-independent: same rows after an adversarial repartition
    got3 = {r["doc_id"] for r in
            stratified_sample(sdf.repartition(13, "n_tokens"), fr,
                              "source", "doc_id").collect()}
    assert got3 == exp
    # salt changes the sample
    got4 = {r["doc_id"] for r in
            stratified_sample(sdf, fr, "source", "doc_id", salt=1).collect()}
    assert got4 != exp


def _golden_mix(rows, budgets, salt=0):
    keep = set()
    for s in {s for _, s, _ in rows}:
        if s not in budgets:
            continue
        left = budgets[s]
        for i, _, tok in sorted((r for r in rows if r[1] == s),
                                key=lambda r: (_h(r[0], salt), r[0])):
            if tok <= left:
                left -= tok
                keep.add(i)
            else:
                break
    return keep


def test_token_budget_mix_golden(corpus):
    sdf, rows = corpus
    budgets = {"web": 4_000, "code": 1_500}
    exp = _golden_mix(rows, budgets)
    got = {r["doc_id"] for r in
           token_budget_mix(sdf, budgets, "source", "n_tokens",
                            "doc_id").collect()}
    assert got == exp and got
    # schema untouched, helper columns dropped
    out = token_budget_mix(sdf, budgets, "source", "n_tokens", "doc_id")
    assert out.columns == ["doc_id", "source", "n_tokens"]
    # few buckets → boundary-bucket path exercised hard
    got2 = {r["doc_id"] for r in
            token_budget_mix(sdf, budgets, "source", "n_tokens", "doc_id",
                             n_buckets=4).collect()}
    assert got2 == exp
    # per-stratum token sums within budget, and maximal (next row overflows)
    by_s = {}
    for i, s, tok in rows:
        if i in got:
            by_s[s] = by_s.get(s, 0) + tok
    for s, b in budgets.items():
        assert by_s[s] <= b


def test_token_budget_mix_edges(corpus):
    sdf, rows = corpus
    total_web = sum(t for _, s, t in rows if s == "web")
    # budget >= stratum total keeps the whole stratum
    got = {r["doc_id"] for r in
           token_budget_mix(sdf, {"web": total_web}, "source", "n_tokens",
                            "doc_id").collect()}
    assert got == {i for i, s, _ in rows if s == "web"}
    # zero budget / absent strata → empty
    assert token_budget_mix(sdf, {"web": 0}, "source", "n_tokens",
                            "doc_id").count() == 0
    assert token_budget_mix(sdf, {}, "source", "n_tokens",
                            "doc_id").count() == 0


def _pack_golden(rows, L, salt=0):
    """Pure-Python packing reimplementation: hash-order stream, chunk at L."""
    ordered = sorted(((i, t) for i, _, t in rows if t > 0),
                     key=lambda x: (_h(x[0], salt), x[0]))
    out, start = [], 0
    for i, t in ordered:
        end = start + t
        s = start
        while s < end:
            seq = s // L
            s1 = min(end, (seq + 1) * L)
            out.append((i, seq, s - seq * L, s - start, s1 - s))
            s = s1
        start = end
    return sorted(out)


def test_pack_sequences_golden(corpus):
    from searchengine_spark.functions.sampling import pack_sequences
    sdf, rows = corpus
    L = 777
    got = sorted(tuple(r) for r in pack_sequences(
        sdf, L, "n_tokens", "doc_id").collect())
    exp = _pack_golden(rows, L)
    assert got == exp
    # every sequence except possibly the last is exactly full
    total = sum(t for _, _, t in rows)
    per_seq = {}
    for _, seq, _, _, n in exp:
        per_seq[seq] = per_seq.get(seq, 0) + n
    last = max(per_seq)
    assert all(v == L for s, v in per_seq.items() if s != last)
    assert sum(per_seq.values()) == total


def test_pack_sequences_layout_independent(corpus):
    from searchengine_spark.functions.sampling import pack_sequences
    sdf, rows = corpus
    a = sorted(tuple(r) for r in pack_sequences(
        sdf, 512, "n_tokens", "doc_id", n_buckets=8).collect())
    b = sorted(tuple(r) for r in pack_sequences(
        sdf.repartition(13), 512, "n_tokens", "doc_id",
        n_buckets=1024).collect())
    assert a == b


def test_pack_sequences_empty_and_validation(corpus, spark):
    from searchengine_spark.functions.sampling import pack_sequences
    sdf, _ = corpus
    assert pack_sequences(sdf.filter(F.lit(False)), 128, "n_tokens",
                          "doc_id").count() == 0
    with pytest.raises(ValueError):
        pack_sequences(sdf, 0, "n_tokens", "doc_id")


def test_temperature_budgets_math():
    from searchengine_spark.functions.sampling import temperature_budgets
    # no clamping: floor shares + leftover to largest strata
    b = temperature_budgets({"a": 300, "b": 150, "c": 50}, 0.5, 100)
    import math
    w = {s: math.sqrt(n) for s, n in [("a", 300), ("b", 150), ("c", 50)]}
    ws = sum(w.values())
    floors = {s: int(100 * w[s] / ws) for s in w}
    rem = 100 - sum(floors.values())
    for s in sorted(w, key=lambda s: (-{"a": 300, "b": 150, "c": 50}[s], s))[:rem]:
        floors[s] += 1
    assert b == floors and sum(b.values()) == 100
    # alpha=1 is proportional, alpha=0 uniform
    p = temperature_budgets({"a": 300, "b": 100}, 1.0, 100)
    assert p == {"a": 75, "b": 25}
    u = temperature_budgets({"a": 300, "b": 100}, 0.0, 100)
    assert u == {"a": 50, "b": 50}
    # clamping: a tiny stratum caps at its size, excess re-distributed
    c = temperature_budgets({"a": 1000, "b": 5}, 0.0, 100)
    assert c["b"] == 5 and c["a"] == 95
    # budget above corpus: everything kept
    full = temperature_budgets({"a": 10, "b": 5}, 0.5, 1000)
    assert full == {"a": 10, "b": 5}
    with pytest.raises(ValueError):
        temperature_budgets({"a": 1}, 1.5, 10)


def test_temperature_mix_doc_budget_golden(corpus):
    """Doc-count mixing: each stratum contributes exactly its water-filled
    target, taken as the hash-order prefix (golden recomputation)."""
    from searchengine_spark.functions.sampling import (temperature_budgets,
                                                       temperature_mix)
    sdf, rows = corpus
    sizes: dict = {}
    for _, s, _ in rows:
        sizes[s] = sizes.get(s, 0) + 1
    budgets = temperature_budgets(sizes, 0.5, 120)
    got = {r["doc_id"] for r in
           temperature_mix(sdf, "source", "doc_id",
                           alpha=0.5, budget=120).collect()}
    expected = set()
    for s in sizes:
        members = sorted((d for d, src, _ in rows if src == s),
                         key=lambda d: (_h(d), d))
        expected.update(members[:budgets[s]])
    assert got == expected and len(got) == 120


def test_temperature_mix_token_budget(corpus):
    """Token mixing: per-stratum kept token sums stay within the
    water-filled token targets and are maximal hash-order prefixes."""
    from searchengine_spark.functions.sampling import (temperature_budgets,
                                                       temperature_mix)
    sdf, rows = corpus
    sizes: dict = {}
    for _, s, t in rows:
        sizes[s] = sizes.get(s, 0) + t
    budgets = temperature_budgets(sizes, 0.5, 30_000)
    out = temperature_mix(sdf, "source", "doc_id", alpha=0.5,
                          budget=30_000, token_col="n_tokens").collect()
    kept = {r["doc_id"] for r in out}
    toks = {r[0]: r[2] for r in rows}
    src = {r[0]: r[1] for r in rows}
    for s, cap in budgets.items():
        members = sorted((d for d, sc, _ in rows if sc == s),
                         key=lambda d: (_h(d), d))
        run, exp = 0, set()
        for d in members:
            if run + toks[d] > cap:
                break
            run += toks[d]
            exp.add(d)
        assert {d for d in kept if src[d] == s} == exp, s


def test_split_corpus_deterministic_and_disjoint(corpus):
    from searchengine_spark.functions.sampling import split_corpus
    sdf, rows = corpus
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = {r["doc_id"]: r["split"]
           for r in split_corpus(sdf, fr, "doc_id").collect()}
    # every row assigned exactly once; golden recomputation via the LCG
    assert len(got) == len(rows)
    for d, _, _ in rows:
        h = _h(d)
        if h < int(0.8 * HASH_SPACE):
            want = "train"
        elif h < int(0.9 * HASH_SPACE):
            want = "val"
        else:
            want = "test"
        assert got[d] == want, d
    # proportions roughly honored on 400 rows
    from collections import Counter
    c = Counter(got.values())
    assert 280 <= c["train"] <= 360 and c["val"] >= 15 and c["test"] >= 15
    # partial fractions drop the remainder
    part = split_corpus(sdf, {"train": 0.5}, "doc_id").count()
    assert part == sum(1 for d, _, _ in rows
                       if _h(d) < int(0.5 * HASH_SPACE))
    import pytest as _pt
    with _pt.raises(ValueError):
        split_corpus(sdf, {"a": 0.9, "b": 0.2}, "doc_id")
