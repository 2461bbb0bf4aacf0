"""eval_retrieval: hand-computed graded metrics on constructed runs."""

import math

import pytest

from searchengine_spark.operators.evaluate import eval_retrieval


def test_eval_retrieval_hand_computed(spark):
    run = spark.createDataFrame(
        [("q1", 5, 1), ("q1", 1, 2), ("q1", 2, 3),   # d1 rel2 @2, d2 rel1 @3
         ("q2", 7, 1), ("q2", 8, 2)],                # nothing relevant
        "query_id string, doc_id long, rank int")
    j = spark.createDataFrame(
        [("q1", 1, 2), ("q1", 2, 1), ("q1", 3, 1),
         ("q2", 9, 1),
         ("q3", 4, 1)],                              # judged, never run
        "query_id string, doc_id long, rel int")
    out = {r["query_id"]: r for r in eval_retrieval(run, j, k=3).collect()}

    q1 = out["q1"]
    assert q1["n_rel"] == 3
    assert abs(q1["precision"] - 2 / 3) < 1e-12
    assert abs(q1["recall"] - 2 / 3) < 1e-12
    assert abs(q1["rr"] - 0.5) < 1e-12
    dcg = 3 / math.log2(3) + 1 / math.log2(4)
    idcg = 3 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert abs(q1["ndcg"] - dcg / idcg) < 1e-12

    q2 = out["q2"]
    assert (q2["n_rel"], q2["precision"], q2["recall"], q2["rr"],
            q2["ndcg"]) == (1, 0.0, 0.0, 0.0, 0.0)

    q3 = out["q3"]                                   # judged but no run rows
    assert q3["precision"] == 0.0 and q3["ndcg"] == 0.0 and q3["n_rel"] == 1


def test_eval_retrieval_rank_from_score(spark):
    """Without a rank column, ranks derive from (round(score, 9) desc,
    doc_id asc) — the engine tie-break: equal scores rank the smaller
    doc_id first."""
    run = spark.createDataFrame(
        [("q", 10, 5.0), ("q", 2, 7.0), ("q", 1, 5.0)],
        "query_id string, doc_id long, score double")
    j = spark.createDataFrame([("q", 1, 1)],
                              "query_id string, doc_id long, rel int")
    row = eval_retrieval(run, j, k=3).collect()[0]
    assert abs(row["rr"] - 0.5) < 1e-12          # doc 1 ties 5.0, wins rank 2
    assert abs(row["ndcg"] - (1 / math.log2(3))) < 1e-12


def test_eval_retrieval_cutoff(spark):
    """Relevant docs past the cutoff don't count."""
    run = spark.createDataFrame([("q", i, i) for i in range(1, 6)],
                                "query_id string, doc_id long, rank int")
    j = spark.createDataFrame([("q", 5, 1)],
                              "query_id string, doc_id long, rel int")
    row = eval_retrieval(run, j, k=3).collect()[0]
    assert row["recall"] == 0.0 and row["rr"] == 0.0
    row5 = eval_retrieval(run, j, k=5).collect()[0]
    assert row5["recall"] == 1.0 and abs(row5["rr"] - 0.2) < 1e-12
