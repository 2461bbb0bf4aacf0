"""en_simple rule dictionary: S-stemmer semantics, three-path parity,
end-to-end retrieval + snippet highlighting through the rules."""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.functions.analysis import (analyze_col,
                                                   analyze_text,
                                                   analyze_tf_col)
from searchengine_spark.resources.en_morph import (s_stem, s_stem_series,
                                                   surface_forms)


def test_s_stem_rules():
    assert s_stem("tables") == "table"        # rule 3
    assert s_stem("queries") == "query"       # rule 1
    assert s_stem("indexes") == "indexe"      # rule 2 drops only the s
    assert s_stem("classes") == "classe"      # rule 2
    assert s_stem("glass") == "glass"         # -ss guard
    assert s_stem("status") == "status"       # -us guard
    assert s_stem("goes") == "goes"           # -oes guard
    assert s_stem("gas") == "gas"             # length guard (deviation)
    assert s_stem("dog") == "dog"


def test_s_stem_series_matches_scalar():
    import pandas as pd
    words = ["tables", "queries", "indexes", "glass", "status", "goes",
             "gas", "dog", "keys", "boxes", "eies", "aies", "trees"]
    got = s_stem_series(pd.Series(words)).tolist()
    assert got == [s_stem(w) for w in words]


def test_surface_forms_inverse_image():
    # every generated surface must stem back to the lemma
    for lemma in ["table", "query", "key", "have", "good", "index"]:
        for form in surface_forms(lemma):
            from searchengine_spark.resources.en_morph import EN_IRREGULAR
            stem = EN_IRREGULAR.get(form, s_stem(form))
            assert stem == lemma, (lemma, form)
    assert "queries" in surface_forms("query")
    assert "tables" in surface_forms("table")
    assert "men" in surface_forms("man")


def test_analyze_text_en():
    out = analyze_text("The queries and tables were merged; indices ran.",
                       dictionary="en_simple")
    # the/and/were are stops; queries→query tables→table indices→index
    # (irregular), ran→run (irregular), merged→merged (no -ed rule)
    assert out == ["query", "table", "merged", "index", "run"]


def test_three_path_parity_en(spark):
    rows = [(i, t) for i, t in enumerate([
        "The keys and tables were sorted by queries.",
        "glass status goes gas dogs boxes indices",
        "Men found mice; children said so.",
        "", "   ", "plain words here"])]
    df = spark.createDataFrame(rows, "id long, text string")
    a = df.select("id", analyze_col(F.col("text"),
                                    dictionary="en_simple").alias("t"))
    b = df.select("id", analyze_tf_col(F.col("text"),
                                       dictionary="en_simple").alias("tt"))
    la = {r["id"]: r["t"] for r in a.collect()}
    for r in b.collect():
        # reconstruct the multiset from (terms, tfs) and compare
        ms = {}
        for t, tf in zip(r["tt"]["terms"], r["tt"]["tfs"]):
            ms[t] = tf
        want = {}
        for t in la[r["id"]]:
            want[t] = want.get(t, 0) + 1
        assert ms == want
        assert r["tt"]["dl"] == len(la[r["id"]])
    for i, (_, text) in enumerate(rows):
        assert sorted(la[i]) == sorted(
            analyze_text(text, dictionary="en_simple"))


def test_en_index_retrieval_and_snippets(spark):
    """Plural and singular forms co-retrieve under en_simple, and the
    snippet highlights the PLURAL surface form for a singular query."""
    from searchengine_spark.operators.indexer import build_index
    from searchengine_spark.operators.search import search
    rows = [
        ("c0", 0, "user", "The tables were scanned quickly.", None, None),
        ("c1", 0, "user", "One table only.", None, None),
        ("c2", 0, "user", "Nothing relevant here.", None, None),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    idx = build_index(t, dictionary="en_simple")
    hits = search(idx, "table", k=10, with_snippets=True).collect()
    got = {r["conv_id"]: r for r in hits}
    assert set(got) == {"c0", "c1"}
    assert "<b>tables</b>" in got["c0"]["snippet"]
    assert "<b>table</b>" in got["c1"]["snippet"]
    # plural query hits the singular doc too (query analysis stems it)
    hits2 = {r["conv_id"] for r in search(idx, "tables", k=10).collect()}
    assert hits2 == {"c0", "c1"}


def test_en_phrase_search_stems_inflections(spark):
    """Positional phrase matching under en_simple: the phrase's words
    stem (tables scans → table scan) and stop words vanish from the
    position stream, so "table the scan" matches too (the standard
    analyzed-phrase contraction); reversed order never matches."""
    from searchengine_spark.operators.indexer import build_index
    from searchengine_spark.operators.search import phrase_search
    rows = [
        ("c0", 0, "user", "The tables scans run nightly.", None, None),
        ("c1", 0, "user", "table the scan", None, None),   # stop word gap
        ("c2", 0, "user", "scan tables", None, None),       # wrong order
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    idx = build_index(t, dictionary="en_simple", with_positions=True)
    hits = {r["conv_id"] for r in
            phrase_search(idx, "table scan", k=10).collect()}
    # c0: tables scans → table scan adjacent; c1: 'the' is a stop word so
    # table/scan are adjacent in the KEPT stream (analyzed-phrase
    # semantics); c2 is reversed → no match
    assert hits == {"c0", "c1"}
