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


def test_bigram_features_exact(spark, corpus):
    """ngram=2 features = unigrams + '_'-joined adjacent bigrams, in
    order, matching a Python reference on the raw tokenization."""
    from searchengine_spark.functions.classify import features_col
    rows = spark.createDataFrame(
        [(0, "scan merge join"), (1, "loss"), (2, "!!!")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["f"] for r in rows.select(
        "doc_id", features_col(F.col("text"), ngram=2).alias("f")).collect()}
    assert got[0] == ["scan", "merge", "join", "scan_merge", "merge_join"]
    assert got[1] == ["loss"]
    assert got[2] == []


def test_bigram_model_trains_and_separates(spark, corpus):
    m1 = train_nb(corpus, label_col="label", ngram=1)
    m2 = train_nb(corpus, label_col="label", ngram=2)
    assert m2["ngram"] == 2 and m2["vocab"] > m1["vocab"]
    # bigram vocab includes cross-word features
    vocab = {r["term"] for r in m2["cond"].select("term").distinct().collect()}
    assert "scan_merge" in vocab
    held = spark.createDataFrame(
        [(100, "btree page merge index"), (101, "epoch loss tensor")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["pred"] for r in nb_classify(held, m2).collect()}
    assert got == {100: "db", 101: "ml"}
    # n_tokens counts FEATURES (unigrams + bigrams): 4 + 3 = 7
    nt = {r["doc_id"]: r["n_tokens"]
          for r in nb_score(held, m2).collect() if r["label"] == "db"}
    assert nt[100] == 7


def test_complement_nb_weight_math(spark, corpus):
    """CNB weight w(t,y) = -log((Σ_{y'≠y} c(t,y') + α) / (N_¬y + α(V+1)))
    — hand-checked against raw counts."""
    m = train_nb(corpus, label_col="label", complement=True)
    assert m["complement"] is True
    import re

    def _tok(t):  # same normalization as tokens_col
        return [w for w in re.sub("[^a-z0-9 ]", " ", t.lower()).split() if w]

    rows = [(y, t) for _, y, t in corpus.collect()]
    n_db = sum(len(_tok(t)) for y, t in rows if y == "db")
    n_ml = sum(len(_tok(t)) for y, t in rows if y == "ml")
    c_scan_ml = sum(_tok(t).count("scan") for y, t in rows if y == "ml")
    got = {(r["label"], r["term"]): r["logp"] for r in m["cond"].collect()}
    v = m["vocab"]
    # weight of "scan" under db comes from ML's counts (the complement)
    want = -math.log((c_scan_ml + 1.0) / (n_ml + 1.0 * (v + 1)))
    assert abs(got[("db", "scan")] - want) < 1e-12
    # the dense grid covers every (label, term) cell
    assert len(got) == 2 * v
    # complement denominators: N_¬db == N_ml
    assert abs(m["oov"]["db"] + math.log(1.0 / (n_ml + v + 1))) < 1e-12


def test_complement_nb_classifies_imbalanced(spark):
    """Class imbalance: 12 'db' docs vs 2 'ml' docs. CNB estimates each
    class's weights from the complement (abundant) data and still calls
    the rare class on its own vocabulary."""
    rows = [(i, "db", "scan merge join index btree page") for i in range(12)]
    rows += [(100, "ml", "gradient tensor epoch loss"),
             (101, "ml", "tensor loss gradient batch")]
    df = spark.createDataFrame(rows, "doc_id long, label string, text string")
    m = train_nb(df, label_col="label", complement=True)
    held = spark.createDataFrame(
        [(200, "gradient loss epoch"), (201, "merge scan btree")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["pred"] for r in nb_classify(held, m).collect()}
    assert got == {200: "ml", 201: "db"}


def test_cnb_save_load_round_trip(spark, corpus, tmp_path):
    from searchengine_spark.functions.classify import load_nb, save_nb
    m = train_nb(corpus, label_col="label", ngram=2, complement=True)
    save_nb(m, str(tmp_path / "cnb"))
    m2 = load_nb(spark, str(tmp_path / "cnb"))
    assert m2["ngram"] == 2 and m2["complement"] is True
    a = {(r["doc_id"], r["label"]): round(r["score"], 9)
         for r in nb_score(corpus, m).collect()}
    b = {(r["doc_id"], r["label"]): round(r["score"], 9)
         for r in nb_score(corpus, m2).collect()}
    assert a == b
