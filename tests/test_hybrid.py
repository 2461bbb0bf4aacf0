"""Hybrid (BM25 + embedding-cosine) fusion vs a pure-Python brute force."""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.hybrid import hybrid_fuse, hybrid_search
from searchengine_spark.operators.search import search

Q = "поиск запрос"
DIM = 16


@pytest.fixture(scope="module")
def emb_df(spark, index_general):
    n = index_general["stats"]["n_docs"]
    rng = np.random.RandomState(7)
    mat = rng.normal(size=(n, DIM))
    rows = [(int(i), [float(x) for x in mat[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture(scope="module")
def qvec(emb_df):
    return [float(x) for x in
            emb_df.filter(F.col("vec_id") == 3).first()["embedding"]]


def _lex_list(index, n):
    rows = search(index, Q, k=n, mode="bm25").collect()
    return [(r["doc_id"], float(r["score"])) for r in rows]


def _vec_list(emb_df, qvec, n):
    pdf = emb_df.toPandas()
    mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    q = np.asarray(qvec, dtype=np.float64)
    cos = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    cos = np.round(cos, 6)  # cosine_topk stores 6 dp
    order = sorted(range(len(cos)), key=lambda i: (-cos[i], i))[:n]
    return [(int(pdf["vec_id"][i]), float(cos[i])) for i in order]


def _ranks(lst):
    order = sorted(lst, key=lambda t: (-round(t[1], 6), t[0]))
    return {d: i + 1 for i, (d, _) in enumerate(order)}


def _brute_rrf(lex, vec, k, rrf_k=60):
    lr, vr = _ranks(lex), _ranks(vec)
    fused = {d: (1.0 / (rrf_k + lr[d]) if d in lr else 0.0)
             + (1.0 / (rrf_k + vr[d]) if d in vr else 0.0)
             for d in set(lr) | set(vr)}
    top = sorted(fused, key=lambda d: (-round(fused[d], 9), d))[:k]
    return [(d, fused[d], lr.get(d, 0), vr.get(d, 0)) for d in top]


def _brute_linear(lex, vec, k, alpha):
    lr, vr = _ranks(lex), _ranks(vec)
    def norm(lst):
        ss = [s for _, s in lst]
        lo, hi = min(ss), max(ss)
        return {d: ((s - lo) / (hi - lo) if hi > lo else 1.0) for d, s in lst}
    ln, vn = norm(lex), norm(vec)
    fused = {d: alpha * ln.get(d, 0.0) + (1 - alpha) * vn.get(d, 0.0)
             for d in set(ln) | set(vn)}
    top = sorted(fused, key=lambda d: (-round(fused[d], 9), d))[:k]
    return [(d, fused[d], lr.get(d, 0), vr.get(d, 0)) for d in top]


def test_rrf_matches_brute_force(index_general, emb_df, qvec):
    got = hybrid_search(index_general, Q, emb_df, qvec, k=10,
                        n_lex=20, n_vec=20).collect()
    exp = _brute_rrf(_lex_list(index_general, 20),
                     _vec_list(emb_df, qvec, 20), k=10)
    assert [r["doc_id"] for r in got] == [d for d, *_ in exp]
    assert [(r["lex_rank"], r["vec_rank"]) for r in got] \
        == [(lr, vr) for _, _, lr, vr in exp]
    assert max(abs(r["score"] - s) for r, (_, s, *_ ) in zip(got, exp)) < 1e-12


def test_linear_matches_brute_force(index_general, emb_df, qvec):
    got = hybrid_search(index_general, Q, emb_df, qvec, k=10,
                        method="linear", alpha=0.3,
                        n_lex=20, n_vec=20).collect()
    exp = _brute_linear(_lex_list(index_general, 20),
                        _vec_list(emb_df, qvec, 20), k=10, alpha=0.3)
    assert [r["doc_id"] for r in got] == [d for d, *_ in exp]
    assert max(abs(r["score"] - s) for r, (_, s, *_ ) in zip(got, exp)) < 1e-12


def test_single_list_docs_carry_rank_zero(index_general, emb_df, qvec):
    # random embeddings vs lexical matches: with short lists the overlap is
    # tiny, so both one-sided cases appear in the fused top-k
    got = hybrid_search(index_general, Q, emb_df, qvec, k=20,
                        n_lex=10, n_vec=10).collect()
    assert any(r["lex_rank"] == 0 and r["vec_rank"] > 0 for r in got)
    assert any(r["vec_rank"] == 0 and r["lex_rank"] > 0 for r in got)
    # a doc in BOTH lists fuses both reciprocal terms exactly
    both = [r for r in got if r["lex_rank"] > 0 and r["vec_rank"] > 0]
    for r in both:
        assert abs(r["score"] - (1 / (60 + r["lex_rank"])
                                 + 1 / (60 + r["vec_rank"]))) < 1e-12


def test_vec_hits_hook_equals_default(index_general, emb_df, qvec):
    from searchengine_spark.functions.similarity import cosine_topk
    vh = cosine_topk(emb_df, qvec, k=20)
    got = hybrid_search(index_general, Q, emb_df, qvec, k=10,
                        n_lex=20, n_vec=20, vec_hits=vh).collect()
    base = hybrid_search(index_general, Q, emb_df, qvec, k=10,
                         n_lex=20, n_vec=20).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in base]


def test_fuse_rejects_unknown_method(index_general, emb_df, qvec):
    with pytest.raises(ValueError):
        hybrid_search(index_general, Q, emb_df, qvec, method="borda")


# ---------- batched hybrid ----------

Q2 = "запрос индекс"


@pytest.fixture(scope="module")
def qvec2(emb_df):
    return [float(x) for x in
            emb_df.filter(F.col("vec_id") == 11).first()["embedding"]]


def test_cosine_topk_many_matches_single(emb_df, qvec, qvec2):
    from searchengine_spark.functions.similarity import (cosine_topk,
                                                         cosine_topk_many)
    got = cosine_topk_many(emb_df, {"a": qvec, "b": qvec2}, k=15).toPandas()
    for qid, qv in [("a", qvec), ("b", qvec2)]:
        single = cosine_topk(emb_df, qv, k=15).toPandas()
        part = got[got["query_id"] == qid]
        assert part["vec_id"].tolist() == single["vec_id"].tolist()
        assert (part["cos"].to_numpy()
                == single["cos"].to_numpy()).all()


@pytest.mark.parametrize("method", ["rrf", "linear"])
def test_hybrid_many_matches_single(index_general, emb_df, qvec, qvec2,
                                    method):
    from searchengine_spark.operators.hybrid import hybrid_search_many
    got = hybrid_search_many(index_general, {"a": Q, "b": Q2}, emb_df,
                             {"a": qvec, "b": qvec2}, k=8, method=method,
                             n_lex=20, n_vec=20).toPandas()
    for qid, q, qv in [("a", Q, qvec), ("b", Q2, qvec2)]:
        single = hybrid_search(index_general, q, emb_df, qv, k=8,
                               method=method, n_lex=20, n_vec=20).toPandas()
        part = got[got["query_id"] == qid]
        assert part["doc_id"].tolist() == single["doc_id"].tolist()
        assert (abs(part["score"].to_numpy()
                    - single["score"].to_numpy()).max() < 1e-12)
        assert part["lex_rank"].tolist() == single["lex_rank"].tolist()
        assert part["vec_rank"].tolist() == single["vec_rank"].tolist()


def test_hybrid_many_rejects_mismatched_keys(index_general, emb_df, qvec):
    from searchengine_spark.operators.hybrid import hybrid_search_many
    with pytest.raises(ValueError):
        hybrid_search_many(index_general, {"a": Q}, emb_df,
                           {"b": qvec}, k=5)


def test_hybrid_snippets_and_titles(index_general, emb_df, qvec):
    got = hybrid_search(index_general, Q, emb_df, qvec, k=10,
                        n_lex=20, n_vec=20,
                        with_snippets=True, with_titles=True).collect()
    base = hybrid_search(index_general, Q, emb_df, qvec, k=10,
                         n_lex=20, n_vec=20).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in base]
    assert all(r["snippet"] is not None for r in got)
    # lexical hits highlight; vector-only hits render the fallback
    lex_hits = [r for r in got if r["lex_rank"] > 0]
    assert lex_hits and all("<b>" in r["snippet"] for r in lex_hits)


def test_fuse_rankings_two_arms_equals_hybrid_fuse(spark):
    """Unit-weight two-arm fuse_rankings == hybrid_fuse row-for-row."""
    from searchengine_spark.operators.hybrid import fuse_rankings, hybrid_fuse
    lex = spark.createDataFrame(
        [(1, 5.0), (2, 4.0), (3, 3.0), (4, 1.0)], "doc_id long, score double")
    vec = spark.createDataFrame(
        [(3, 0.9), (5, 0.8), (1, 0.2)], "doc_id long, cos double")
    a = [(r["doc_id"], round(r["score"], 9), r["lex_rank"], r["vec_rank"])
         for r in hybrid_fuse(lex, vec, k=10).collect()]
    b = [(r["doc_id"], round(r["score"], 9), r["lex_rank"], r["vec_rank"])
         for r in fuse_rankings({"lex": lex, "vec": vec}, k=10,
                                score_cols={"vec": "cos"}).collect()]
    assert a == b


def test_fuse_rankings_three_arms_weighted_golden(spark):
    """Three weighted arms match a hand computation (absent arm → no
    contribution; ties broken by doc_id)."""
    from searchengine_spark.operators.hybrid import fuse_rankings
    arms = {
        "a": spark.createDataFrame([(1, 3.0), (2, 2.0), (3, 1.0)],
                                   "doc_id long, score double"),
        "b": spark.createDataFrame([(2, 9.0), (4, 5.0)],
                                   "doc_id long, score double"),
        "c": spark.createDataFrame([(3, 0.5), (1, 0.4), (4, 0.3)],
                                   "doc_id long, score double"),
    }
    w = {"a": 1.0, "b": 2.0, "c": 0.5}
    got = {r["doc_id"]: (round(r["score"], 9), r["a_rank"], r["b_rank"],
                         r["c_rank"])
           for r in fuse_rankings(arms, k=10, rrf_k=60,
                                  weights=w).collect()}
    ranks = {"a": {1: 1, 2: 2, 3: 3}, "b": {2: 1, 4: 2},
             "c": {3: 1, 1: 2, 4: 3}}
    for d in (1, 2, 3, 4):
        want = sum(w[arm] / (60 + ranks[arm][d])
                   for arm in arms if d in ranks[arm])
        assert abs(got[d][0] - round(want, 9)) < 1e-9, d
        assert got[d][1:] == tuple(ranks[arm].get(d, 0) for arm in arms)
