"""Q10 snippets + Q11 pagination (SURVEY.md §2.4).

Snippet semantics under test (reference:
services/SearchingServiceImpl.java:418-505): pick a "sentence"
([^.!?;]* around a query word, case-insensitive), require a word-boundary
match, wrap each query-word occurrence in <b>, trim long sentences to
~120 chars around the first hit, fall back to the no-match string.
Pagination: the reference declares offset/limit but ignores them
(controllers/ApiController.java:55-58) — ours is real.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from searchengine_spark.functions.snippets import CAP, NO_MATCH, make_snippet
from searchengine_spark.operators.search import search


class TestMakeSnippet:
    def test_basic_highlight(self):
        out = make_snippet("Alpha beta gamma. Next sentence here.", ["beta"])
        assert out == "Alpha <b>beta</b> gamma"

    def test_case_insensitive(self):
        out = make_snippet("ALPHA Beta gamma", ["beta"])
        assert "<b>Beta</b>" in out

    def test_word_boundary_no_partial(self):
        assert make_snippet("alphabet soup", ["alpha"]) == NO_MATCH

    def test_multiple_words_highlighted(self):
        out = make_snippet("alpha and beta walk in", ["alpha", "beta"])
        assert "<b>alpha</b>" in out and "<b>beta</b>" in out

    def test_sentence_isolation(self):
        out = make_snippet("First part. target here. trailing part", ["target"])
        assert "First part" not in out and "<b>target</b> here" in out

    def test_no_match_fallback(self):
        assert make_snippet("nothing relevant", ["missing"]) == NO_MATCH
        assert make_snippet("", ["word"]) == NO_MATCH
        assert make_snippet("text", []) == NO_MATCH

    def test_long_sentence_trimmed(self):
        text = "x " * 200 + "needle" + " y" * 200
        out = make_snippet(text, ["needle"])
        assert "<b>needle</b>" in out
        assert len(out) <= max(CAP, 300) + 2  # ellipses allowed
        assert out.startswith("…")


class TestSearchSnippets:
    def test_snippet_column_on_hits(self, index_general):
        hits = search(index_general, "timeout", k=5, mode="bm25",
                      with_snippets=True).collect()
        assert len(hits) > 0
        for r in hits:
            assert "<b>timeout</b>" in r["snippet"].lower() or r["snippet"] == NO_MATCH

    def test_snippet_ref_compat(self, index_ref):
        # retrieval is lemma-based; expand_query_words highlights every
        # surface form of the query lemma, so each true hit gets a highlight
        hits = search(index_ref, "лес", k=5, mode="ref_compat",
                      with_snippets=True).collect()
        assert hits and all("<b>" in r["snippet"] for r in hits)

    def test_expand_query_words_covers_forms(self):
        from searchengine_spark.functions.snippets import expand_query_words
        words = expand_query_words("лес", "ref_compat")
        assert "лес" in words and "лесом" in words  # inflected form included


class TestPagination:
    def test_offset_slices_ranking(self, index_general):
        full = search(index_general, "ошибку лес", k=20, mode="bm25").collect()
        page2 = search(index_general, "ошибку лес", k=10, mode="bm25",
                       offset=10).collect()
        want = [(r["doc_id"], round(r["score"], 9)) for r in full[10:20]]
        got = [(r["doc_id"], round(r["score"], 9)) for r in page2]
        assert got == want

    def test_offset_ref_compat_scores_globally_normalized(self, index_ref):
        full = search(index_ref, "лес дом", k=20, mode="ref_compat").collect()
        page2 = search(index_ref, "лес дом", k=10, mode="ref_compat",
                       offset=10).collect()
        want = [(r["doc_id"], round(r["score"], 9)) for r in full[10:20]]
        got = [(r["doc_id"], round(r["score"], 9)) for r in page2]
        assert got == want

    def test_offset_past_end_empty(self, index_general):
        n = search(index_general, "timeout", k=10000, mode="bm25").count()
        assert search(index_general, "timeout", k=10, mode="bm25",
                      offset=n).count() == 0


class TestSnippetDictionaryThreading:
    """r2 VERDICT "What's wrong" #1: a hit retrieved via an inflected form
    outside the fixture's families must still highlight — the snippet word
    expansion must use the INDEX's dictionary, not the fixture."""

    def test_ru_full_inflection_highlighted(self, spark):
        import pandas as pd
        from searchengine_spark.operators.indexer import build_index

        rows = [("c0", 0, "user", "вчера она могла ответить на вопрос быстро",
                 None, "2026-01-01 00:00:00"),
                ("c1", 0, "user", "совсем другой текст про погоду и сад",
                 None, "2026-01-01 00:00:00")]
        pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role",
                                          "text", "tool", "ts"])
        pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        df = spark.createDataFrame(
            pdf, "conv_id string, turn_idx int, role string, text string, "
                 "tool string, ts timestamp")
        # 'могла' and 'мочь' share the lemma 'мочь' in ru_full ONLY — the
        # fixture dictionary knows neither form
        from searchengine_spark.resources.vocab import LEMMA_OF
        assert "могла" not in LEMMA_OF and "мочь" not in LEMMA_OF
        index = build_index(df, mode="general", dictionary="ru_full",
                            bucket_range=256, block_size=32)
        hits = search(index, "мочь", k=5, with_snippets=True).collect()
        assert len(hits) == 1
        assert "<b>могла</b>" in hits[0]["snippet"]

    def test_expand_uses_named_dictionary(self):
        from searchengine_spark.functions.snippets import expand_query_words
        fixture_words = set(expand_query_words("мочь", "general", "fixture"))
        full_words = set(expand_query_words("мочь", "general", "ru_full"))
        assert "могла" not in fixture_words
        assert "могла" in full_words


def test_make_fragments_multi(spark):
    """ES-style multi-fragment highlighting: up to N distinct matching
    sentences, joined by ' … '; degenerates to the single snippet for
    one-match docs; no-match fallback kept."""
    from searchengine_spark.functions.snippets import (NO_MATCH,
                                                       make_fragments,
                                                       make_snippet)
    words = ["merge", "scan"]
    text = ("the merge ran fine. nothing here. a scan followed. "
            "another merge happened. tail sentence.")
    got = make_fragments(text, words, n_fragments=3)
    parts = got.split(" … ")
    assert parts == ["the <b>merge</b> ran fine",
                     "a <b>scan</b> followed",
                     "another <b>merge</b> happened"]
    # n_fragments caps the count
    assert len(make_fragments(text, words, 2).split(" … ")) == 2
    # single-match text == the classic snippet
    one = "only one merge lives here. the rest is quiet."
    assert make_fragments(one, words, 3) == make_snippet(one, words)
    assert make_fragments("no hits at all.", words, 3) == NO_MATCH


def test_search_n_fragments(index_general):
    from pyspark.sql import functions as F  # noqa: F401
    from searchengine_spark.operators.search import search
    rows = search(index_general, "ошибка", k=5, with_snippets=True,
                  n_fragments=2).collect()
    assert rows and all("snippet" in r.asDict() for r in rows)
    assert all(r["snippet"] for r in rows)
