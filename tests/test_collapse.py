"""Field collapsing (search(collapse=)) and grammar time qualifiers
(before:/after:).

Collapse ground truth is brute force: rank EVERY match (a huge-k search of
the same index), keep each group's best per_group rows in pandas with the
engine's exact ordering (round(score, 9) desc, doc_id asc), then take the
global top-k — the collapsed engine result must match row for row.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.querylang import (parse_query,
                                                    query_search)
from searchengine_spark.operators.search import search

Q = "ошибка лес"  # hot + rare conjunction: many matches, many convs


def _brute_collapse(all_hits: pd.DataFrame, per_group: int, k: int,
                    key: str = "conv_id") -> pd.DataFrame:
    df = all_hits.copy()
    df["_r9"] = df["score"].round(9)
    df = df.sort_values(["_r9", "doc_id"], ascending=[False, True],
                        kind="mergesort")
    df["_rank_in_g"] = df.groupby(key).cumcount()
    kept = df[df["_rank_in_g"] < per_group]
    return kept.head(k).drop(columns=["_r9", "_rank_in_g"]).reset_index(drop=True)


def _pdf(sdf) -> pd.DataFrame:
    return sdf.toPandas()


@pytest.mark.parametrize("per_group", [1, 2])
def test_collapse_bm25_matches_brute_force(index_general, per_group):
    allm = _pdf(search(index_general, Q, k=10 ** 6, mode="bm25"))
    assert allm["conv_id"].nunique() < len(allm)  # collapse must bite
    exp = _brute_collapse(allm, per_group, k=10)
    got = _pdf(search(index_general, Q, k=10, mode="bm25",
                      collapse="conv_id", per_group=per_group))
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert (got["score"] - exp["score"]).abs().max() < 1e-9
    # at most per_group rows per conversation in the page
    assert got.groupby("conv_id").size().max() <= per_group


def test_collapse_ref_compat_matches_brute_force(index_ref):
    allm = _pdf(search(index_ref, Q, k=10 ** 6, mode="ref_compat"))
    exp = _brute_collapse(allm, 1, k=10)
    got = _pdf(search(index_ref, Q, k=10, mode="ref_compat",
                      collapse="conv_id"))
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    # the global rank-1 row survives collapse, so the tf-sum normalizer is
    # the same max as the uncollapsed run — scores must match exactly
    assert (got["score"] - exp["score"]).abs().max() < 1e-9
    assert got["score"].iloc[0] == 1.0


def test_collapse_disables_pruning_not_results(index_general):
    # prune_blocks=True is silently gated off under collapse (a global
    # top-k θ is unsound there) — results identical either way
    a = _pdf(search(index_general, Q, k=10, collapse="conv_id",
                    prune_blocks=True))
    b = _pdf(search(index_general, Q, k=10, collapse="conv_id",
                    prune_blocks=False))
    assert a["doc_id"].tolist() == b["doc_id"].tolist()


def test_collapse_expression_key(index_general):
    # Column-expression key: collapse by role instead of conv_id
    got = _pdf(search(index_general, Q, k=10, collapse=F.col("role"),
                      per_group=1))
    assert len(got) == got["role"].nunique()
    allm = _pdf(search(index_general, Q, k=10 ** 6))
    exp = _brute_collapse(allm, 1, k=10, key="role")
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()


def test_collapse_through_grammar(index_general):
    got = _pdf(query_search(index_general, Q, k=10, collapse="conv_id"))
    direct = _pdf(search(index_general, Q, k=10, collapse="conv_id"))
    assert got["doc_id"].tolist() == direct["doc_id"].tolist()


# ---------- batched and fielded forms ----------

Q2 = "запрос индекс"


@pytest.mark.parametrize("mode", ["bm25", "ref_compat"])
def test_batched_collapse_matches_single(index_general, index_ref, mode):
    from searchengine_spark.operators.search import search_many
    index = index_general if mode == "bm25" else index_ref
    got = _pdf(search_many(index, {"a": Q, "b": Q2}, k=8, mode=mode,
                           collapse="conv_id", per_group=2))
    for qid, q in [("a", Q), ("b", Q2)]:
        single = _pdf(search(index, q, k=8, mode=mode,
                             collapse="conv_id", per_group=2))
        part = got[got["query_id"] == qid]
        assert part["doc_id"].tolist() == single["doc_id"].tolist()
        assert (part["score"].to_numpy()
                - single["score"].to_numpy()).max() < 1e-9


def test_batched_grammar_collapse_matches_single(index_general):
    from searchengine_spark.operators.querylang import query_search_many
    got = _pdf(query_search_many(index_general, {"a": Q, "b": Q2}, k=8,
                                 collapse="conv_id"))
    for qid, q in [("a", Q), ("b", Q2)]:
        single = _pdf(query_search(index_general, q, k=8,
                                   collapse="conv_id"))
        assert got[got["query_id"] == qid]["doc_id"].tolist() \
            == single["doc_id"].tolist()


@pytest.fixture(scope="module")
def fielded_corpus_index(corpus_df):
    from searchengine_spark.operators.fielded import build_fielded_index
    return build_fielded_index(corpus_df, mode="general")


def test_bm25f_collapse_matches_brute_force(fielded_corpus_index):
    from searchengine_spark.operators.fielded import bm25f_search
    allm = _pdf(bm25f_search(fielded_corpus_index, Q, k=10 ** 6))
    assert allm["conv_id"].nunique() < len(allm)
    exp = _brute_collapse(allm, 1, k=10)
    got = _pdf(bm25f_search(fielded_corpus_index, Q, k=10,
                            collapse="conv_id"))
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert (got["score"] - exp["score"]).abs().max() < 1e-9


def test_bm25f_batched_collapse_matches_single(fielded_corpus_index):
    from searchengine_spark.operators.fielded import (bm25f_search,
                                                      bm25f_search_many)
    got = _pdf(bm25f_search_many(fielded_corpus_index, {"a": Q, "b": Q2},
                                 k=8, collapse="conv_id", per_group=2))
    for qid, q in [("a", Q), ("b", Q2)]:
        single = _pdf(bm25f_search(fielded_corpus_index, q, k=8,
                                   collapse="conv_id", per_group=2))
        assert got[got["query_id"] == qid]["doc_id"].tolist() \
            == single["doc_id"].tolist()


# ---------- before:/after: time qualifiers ----------

def test_parse_query_time_qualifiers():
    q = parse_query("scan after:2026-01-01 -before:2026-02-01T12:00:00")
    assert q["qualifiers"] == [("after", "2026-01-01", False),
                               ("before", "2026-02-01T12:00:00", True)]


def test_time_qualifiers_match_scope_predicate(index_general):
    lo, hi = (index_general["docs"]
              .select(F.expr("percentile(cast(ts as double), 0.25)"),
                      F.expr("percentile(cast(ts as double), 0.75)"))
              .first())
    lo_s = pd.Timestamp(lo, unit="s").isoformat()
    hi_s = pd.Timestamp(hi, unit="s").isoformat()
    got = _pdf(query_search(index_general,
                            f"ошибка after:{lo_s} before:{hi_s}", k=10))
    pred = ((F.col("ts") >= F.lit(lo_s).cast("timestamp"))
            & (F.col("ts") < F.lit(hi_s).cast("timestamp")))
    exp = _pdf(search(index_general, "ошибка", k=10, scope=pred))
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert (got["score"] - exp["score"]).abs().max() < 1e-9
    assert got["ts"].min() >= pd.Timestamp(lo_s)
    assert got["ts"].max() < pd.Timestamp(hi_s)


def test_time_qualifier_bad_value_raises(index_general):
    with pytest.raises(ValueError, match="ISO 8601"):
        query_search(index_general, "ошибка after:notadate", k=5)
