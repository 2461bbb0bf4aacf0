"""T2-T4 analysis-chain parity: pandas UDF == builtin path == pure Python."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.functions.analysis import (
    analyze_text, lemmatize_tokens_builtin, make_analyze_udf, tokenize_col_builtin)

EDGE_TEXTS = [
    "",
    "   ",
    "!!! ??? ... 123",
    "Леса и Дома — в ГОРОДЕ!",
    "ошибку ошибкой ОШИБКА",
    "timeout merge TRACEBACK жил-был кот",
    "и в на но ах ой",
    "под уже очень",          # multi-analysis drop + non-drop tags
    "unknownword фывапр",     # OOV latin + OOV cyrillic
    None,
]


@pytest.mark.parametrize("mode", ["general", "ref_compat"])
def test_udf_matches_pure_python(spark, mode):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(EDGE_TEXTS)], "i int, text string")
    got = {r["i"]: r["lemmas"] for r in
           df.withColumn("lemmas", make_analyze_udf(mode)(F.col("text"))).collect()}
    for i, t in enumerate(EDGE_TEXTS):
        expected = analyze_text(t, mode)
        assert sorted(got[i]) == sorted(expected), (mode, t, got[i], expected)


@pytest.mark.parametrize("mode", ["general", "ref_compat"])
def test_builtin_path_matches_pure_python(spark, mode):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(EDGE_TEXTS)], "i int, text string")
    toks = df.select("i", F.explode(tokenize_col_builtin(F.col("text"), mode)).alias("word"))
    lem = lemmatize_tokens_builtin(toks, "word", mode)
    got: dict[int, list[str]] = {i: [] for i in range(len(EDGE_TEXTS))}
    for r in lem.select("i", "lemma").collect():
        got[r["i"]].append(r["lemma"])
    for i, t in enumerate(EDGE_TEXTS):
        assert sorted(got[i]) == sorted(analyze_text(t, mode)), (mode, t)


def test_udf_matches_on_fixture_corpus(spark, corpus_pdf):
    sample = corpus_pdf.head(300)
    df = spark.createDataFrame(sample[["text"]].assign(i=range(len(sample))), "text string, i long")
    for mode in ("general", "ref_compat"):
        got = {r["i"]: r["lemmas"] for r in
               df.withColumn("lemmas", make_analyze_udf(mode)(F.col("text"))).collect()}
        for i, t in enumerate(sample["text"]):
            assert sorted(got[i]) == sorted(analyze_text(t, mode))


def test_ref_compat_strips_latin_and_digits():
    assert analyze_text("timeout 42 лесом merge", "ref_compat") == ["лес"]
    assert analyze_text("timeout 42 лесом merge", "general") == ["timeout", "42", "лес", "merge"]


def test_particles_dropped_any_analysis():
    # "под" has analyses [С, ПРЕДЛ] — ANY drop-tag match drops it
    assert analyze_text("под лесом", "ref_compat") == ["лес"]
    # "уже"/"очень" carry only non-drop tags — kept
    assert analyze_text("уже очень", "general") == ["уже", "очень"]


def test_fused_tf_udf_matches_analysis(spark, corpus_pdf):
    """analyze_tf_col (T2-T5 fused) == Counter(analyze_text) per row, and
    dl == total token count after filtering."""
    from collections import Counter
    from searchengine_spark.functions.analysis import analyze_tf_col
    sample = corpus_pdf.head(300)
    df = spark.createDataFrame(sample[["text"]].assign(i=range(len(sample))), "text string, i long")
    for mode in ("general", "ref_compat"):
        got = {r["i"]: r["tt"] for r in
               df.withColumn("tt", analyze_tf_col(F.col("text"), mode)).collect()}
        for i, t in enumerate(sample["text"]):
            lemmas = analyze_text(t, mode)
            tt = got[i]
            assert dict(zip(tt["terms"], tt["tfs"])) == dict(Counter(lemmas)), (mode, i)
            assert tt["dl"] == len(lemmas)
