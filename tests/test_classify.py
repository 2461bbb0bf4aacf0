"""Multinomial NB classifier: training math, scoring, argmax, edge cases."""

import math

import pytest
from pyspark.sql import functions as F

from searchengine_spark.functions.classify import (nb_classify, nb_score,
                                                   train_nb)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # class "db": database-flavored vocabulary
        (0, "db", "scan merge join index scan btree page scan merge"),
        (1, "db", "join merge scan index page btree join scan"),
        (2, "db", "index page scan btree merge join page index"),
        # class "ml": ml-flavored vocabulary
        (3, "ml", "gradient tensor epoch batch gradient loss tensor"),
        (4, "ml", "loss epoch gradient tensor batch loss epoch"),
        (5, "ml", "tensor batch loss gradient epoch tensor batch"),
        # shared-vocab doc leaning db
        (6, "db", "scan scan merge batch"),
        # zero-token doc (punctuation only)
        (7, "ml", "!!! ... ???"),
    ]
    return spark.createDataFrame(rows, "doc_id long, label string, text string")


def test_train_model_math(spark, corpus):
    m = train_nb(corpus, label_col="label")
    assert m["labels"] == ["db", "ml"]
    # priors from doc counts: 4 db, 4 ml of 8
    assert abs(m["priors"]["db"] - math.log(4 / 8)) < 1e-12
    # vocab = union of both classes' terms
    vocab = {r["term"] for r in m["cond"].select("term").distinct().collect()}
    assert m["vocab"] == len(vocab)
    # hand-check one conditional: c("scan", db) = 6, N_db = 29 tokens
    n_db = sum(len(t.split()) for _, y, t in corpus.collect() if y == "db")
    c_scan = sum(t.split().count("scan") for _, y, t in corpus.collect()
                 if y == "db")
    got = {(r["label"], r["term"]): r["logp"] for r in m["cond"].collect()}
    want = math.log((c_scan + 1.0) / (n_db + 1.0 * (m["vocab"] + 1)))
    assert abs(got[("db", "scan")] - want) < 1e-12
    # OOV mass uses the same denominator with c=0
    assert abs(m["oov"]["db"]
               - math.log(1.0 / (n_db + m["vocab"] + 1))) < 1e-12


def test_classify_separable_corpus(spark, corpus):
    m = train_nb(corpus, label_col="label")
    held = spark.createDataFrame(
        [(100, "btree page merge index"), (101, "epoch loss tensor")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["pred"] for r in nb_classify(held, m).collect()}
    assert got == {100: "db", 101: "ml"}


def test_score_matrix_covers_all_docs_and_labels(spark, corpus):
    m = train_nb(corpus, label_col="label")
    sm = nb_score(corpus, m).collect()
    assert len(sm) == 8 * 2
    # the zero-token doc scores prior-only under every label
    z = {r["label"]: r for r in sm if r["doc_id"] == 7}
    for y in ("db", "ml"):
        assert z[y]["n_tokens"] == 0
        assert abs(z[y]["score"] - m["priors"][y]) < 1e-12


def test_classify_matches_scorematrix_argmax(spark, corpus):
    m = train_nb(corpus, label_col="label")
    sm = nb_score(corpus, m).collect()
    best = {}
    for r in sm:
        k = (-round(r["score"], 9), r["label"])
        if r["doc_id"] not in best or k < best[r["doc_id"]][0]:
            best[r["doc_id"]] = (k, r["label"])
    got = {r["doc_id"]: r["pred"] for r in nb_classify(corpus, m).collect()}
    assert got == {d: y for d, (_, y) in best.items()}


def test_self_classification_accuracy(spark, corpus):
    """On the lexically separable training set itself the classifier is
    near-perfect (the zero-token doc falls to the prior tie-break)."""
    m = train_nb(corpus, label_col="label")
    out = nb_classify(corpus, m).collect()
    right = sum(1 for r in out
                if r["pred"] == ("db" if r["doc_id"] in (0, 1, 2, 6) else "ml"))
    assert right >= 7  # everything except possibly the empty doc


def test_save_load_scores_identically(spark, corpus, tmp_path):
    from searchengine_spark.functions.classify import load_nb, save_nb
    m = train_nb(corpus, label_col="label")
    save_nb(m, str(tmp_path / "nb"))
    m2 = load_nb(spark, str(tmp_path / "nb"))
    a = {(r["doc_id"], r["label"]): r["score"]
         for r in nb_score(corpus, m).collect()}
    b = {(r["doc_id"], r["label"]): r["score"]
         for r in nb_score(corpus, m2).collect()}
    assert a.keys() == b.keys()
    for k in a:
        # same stored doubles; per-doc summation ORDER may differ after
        # the parquet round-trip — equality holds at the engine's 9-dp
        # quantization (what nb_classify's argmax tie-break uses)
        assert round(a[k], 9) == round(b[k], 9), k
    pa = {r["doc_id"]: r["pred"] for r in nb_classify(corpus, m).collect()}
    pb = {r["doc_id"]: r["pred"] for r in nb_classify(corpus, m2).collect()}
    assert pa == pb
