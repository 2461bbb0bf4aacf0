"""Collection/site-scoped search (reference GET /api/search?site=,
services/SearchingServiceImpl.java:47-56,237-270) + Q9 title projection +
per-collection statistics parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from searchengine_spark.operators.search import search
from tests.conftest import load_queries

QUERIES = load_queries()
K = 10
PREFIX = "conv00001"  # convs 10..19 of the 60-conv fixture corpus


def _rows(df):
    return [(r["conv_id"], r["turn_idx"], round(r["score"], 9)) for r in df.collect()]


def test_bm25_scope_equals_postfilter(index_general):
    """Scoped BM25 == unscoped ranking filtered to the scope (global idf and
    avgdl — filtered-search semantics)."""
    for query in QUERIES[:6]:
        got = _rows(search(index_general, query, k=K, mode="bm25", scope=PREFIX))
        full = search(index_general, query, k=10_000, mode="bm25").collect()
        exp = [(r["conv_id"], r["turn_idx"], round(r["score"], 9))
               for r in full if r["conv_id"].startswith(PREFIX)][:K]
        assert got == exp, query


def test_ref_scope_equals_subindex(corpus_df, index_ref):
    """Scoped ref_compat == ref_compat over an index built from ONLY the
    scoped docs: per-scope df drives the 80% prune and conjunction arity
    (the reference's per-site lemma table), tf-sum and its normalization are
    scope-local."""
    from searchengine_spark.operators.indexer import build_index
    sub = build_index(corpus_df.filter(F.col("conv_id").startswith(PREFIX)),
                      mode="ref_compat", bucket_range=256, block_size=32)
    for query in QUERIES[:6]:
        got = _rows(search(index_ref, query, k=K, mode="ref_compat", scope=PREFIX))
        exp = _rows(search(sub, query, k=K, mode="ref_compat"))
        assert got == exp, query


def test_scope_predicate_non_contiguous(index_general):
    """Arbitrary Column predicate (non-contiguous doc_id set → semi-join
    path): scoped == unscoped filtered."""
    pred = F.col("role") == "user"
    query = QUERIES[0]
    got = _rows(search(index_general, query, k=K, mode="bm25", scope=pred))
    full = search(index_general, query, k=10_000, mode="bm25").collect()
    exp = [(r["conv_id"], r["turn_idx"], round(r["score"], 9))
           for r in full if r["role"] == "user"][:K]
    assert got == exp


def test_scope_no_match_returns_empty(index_general):
    assert search(index_general, QUERIES[0], k=K, scope="zzz_nothing").count() == 0


def test_titles_projected(index_general):
    hits = search(index_general, QUERIES[0], k=3, mode="bm25", with_titles=True)
    rows = hits.collect()
    assert rows and "title" in hits.columns
    docs = {(r["conv_id"], r["turn_idx"]): r["text"]
            for r in index_general["docs"].collect()}
    for r in rows:
        text = docs[(r["conv_id"], r["turn_idx"])]
        assert r["title"] == text[:60]  # no <title> markup → leading chars


def test_extract_title_markup(spark):
    from searchengine_spark.functions.text import extract_title
    df = spark.createDataFrame(
        [("<html><title>页面 Title </title><body>x</body></html>",),
         ("plain text only here",)], "text string")
    got = [r["t"] for r in df.select(extract_title(F.col("text")).alias("t")).collect()]
    assert got[0] == "页面 Title"  # inner text, trimmed
    assert got[1] == "plain text only here"


def test_statistics_per_collection(index_general, corpus_df):
    from searchengine_spark.operators.indexer import statistics_per_collection
    out = {r["collection"]: r for r in
           statistics_per_collection(index_general, prefix_len=9).collect()}
    # every conv-prefix group's doc count matches a direct recount
    direct = {r["c"]: r["n"] for r in corpus_df.dropDuplicates(["conv_id", "turn_idx"])
              .groupBy(F.substring("conv_id", 1, 9).alias("c"))
              .agg(F.count("*").alias("n")).collect()}
    assert {k: v["n_docs"] for k, v in out.items()} == direct
    for r in out.values():
        assert r["n_lemmas"] <= r["n_tokens"]
        assert r["n_lemmas"] > 0
