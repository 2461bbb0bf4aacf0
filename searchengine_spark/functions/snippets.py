"""Q10: snippet generation + highlight (SURVEY.md §2.4).

Re-expresses the reference's snippet builder
(reference: services/SearchingServiceImpl.java:418-505 — regex a "sentence"
``[^.!?;]*<query word>[^.!?;]*`` case-insensitively, verify word-boundary
match, wrap matches in ``<b>``, trim context to 120 chars per side and cap
the total at ~300 chars truncated to 249; fallback string when nothing
matches, :177-181).

Applied ONLY to the k winner rows (top-k first, snippets after — the
reference likewise snippets only intersected pages), as an Arrow-batched
pandas UDF: k rows of regex work, never the corpus.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, functions as F, types as T

NO_MATCH = "Нет совпадений для подсветки"
SIDE = 120     # chars of context per side (SearchingServiceImpl.java:455-505)
CAP = 249      # total hard cap after the 300-char check


def _query_words(query: str, mode: str) -> list[str]:
    pat = r"[^а-я\s]" if mode == "ref_compat" else r"[^a-zа-я0-9\s]"
    return sorted(set(re.sub(pat, " ", (query or "").lower()).split()))


def expand_query_words(query: str, mode: str,
                       dictionary: str = "fixture") -> list[str]:
    """Literal query words + every dictionary surface form of their lemmas.

    The reference highlights ONLY the literal query words (case variants,
    services/SearchingServiceImpl.java:392-405), so a page matched through an
    inflected form renders the no-match fallback (:177-181). Since retrieval
    is lemma-based, we extend highlighting to all surface forms that
    lemmatize into the query's lemma set — a strict superset of the
    reference's matches; ``make_snippet`` itself is unchanged.

    ``dictionary`` must be the INDEX's dictionary: expanding from a smaller
    dictionary than the one retrieval used re-creates the reference's
    no-match bug for hits reached through inflections outside it."""
    from searchengine_spark.functions.analysis import (analyze_text,
                                                       get_dictionary,
                                                       get_post_rule)
    lemma_of, _ = get_dictionary(dictionary)
    words = set(_query_words(query, mode))
    lemmas = set(analyze_text(query, mode, dictionary=dictionary))
    words |= lemmas
    for form, lemma in lemma_of.items():
        if lemma in lemmas:
            words.add(form)
    rule = get_post_rule(dictionary)
    if rule is not None:
        # rule dictionary: expand via the rules' exact finite inverse
        # image instead of a reverse-map scan
        for lemma in lemmas:
            words |= rule[2](lemma)
    return sorted(words)


def make_snippet(text: str, words: list[str]) -> str:
    if not text or not words:
        return NO_MATCH
    alt = "|".join(re.escape(w) for w in words)
    sent_re = re.compile(rf"[^.!?;]*\b(?:{alt})\b[^.!?;]*", re.IGNORECASE)
    m = sent_re.search(text)
    if not m:
        return NO_MATCH
    sentence = m.group(0).strip()
    word_re = re.compile(rf"\b({alt})\b", re.IGNORECASE)
    highlighted = word_re.sub(r"<b>\1</b>", sentence)
    if len(highlighted) <= SIDE * 2 + 60:
        return highlighted
    first = highlighted.find("<b>")
    lo = max(0, first - SIDE)
    hi = min(len(highlighted), first + SIDE)
    out = ("…" if lo > 0 else "") + highlighted[lo:hi] + ("…" if hi < len(highlighted) else "")
    return out[:CAP] if len(out) > 300 else out


def snippet_col(text: Column, query: str, mode: str = "general",
                dictionary: str = "fixture") -> Column:
    words = expand_query_words(query, mode, dictionary)

    @F.pandas_udf(T.StringType())
    def snip(texts: pd.Series) -> pd.Series:
        return texts.apply(lambda t: make_snippet(t, words))

    return snip(text)


def _highlight_one(sentence: str, word_re) -> str:
    """Highlight + trim ONE already-extracted fragment — exactly
    ``make_snippet``'s per-sentence semantics (same 300-char keep
    threshold, same ±120-char window around the first hit)."""
    highlighted = word_re.sub(r"<b>\1</b>", sentence)
    if len(highlighted) <= SIDE * 2 + 60:
        return highlighted
    first = highlighted.find("<b>")
    lo = max(0, first - SIDE)
    hi = min(len(highlighted), first + SIDE)
    out = ("…" if lo > 0 else "") + highlighted[lo:hi] \
        + ("…" if hi < len(highlighted) else "")
    return out[:CAP] if len(out) > 300 else out


def make_fragments(text: str, words: list[str], n_fragments: int = 3) -> str:
    """Multi-fragment highlighting — the Elasticsearch
    ``number_of_fragments`` behavior the reference lacks (its snippet is
    the FIRST matching sentence only,
    reference: services/SearchingServiceImpl.java:418-453): up to
    ``n_fragments`` distinct matching sentences, each highlighted and
    trimmed with the single-snippet rules, joined by ' … '. Falls back to
    the reference's no-match string."""
    import itertools
    if not text or not words:
        return NO_MATCH
    alt = "|".join(re.escape(w) for w in words)
    sent_re = re.compile(rf"[^.!?;]*\b(?:{alt})\b[^.!?;]*", re.IGNORECASE)
    word_re = re.compile(rf"\b({alt})\b", re.IGNORECASE)
    frags = [_highlight_one(m.group(0).strip(), word_re)
             for m in itertools.islice(sent_re.finditer(text), n_fragments)]
    if not frags:
        return NO_MATCH
    return " … ".join(frags)


def fragments_col(text: Column, query: str, mode: str = "general",
                  dictionary: str = "fixture",
                  n_fragments: int = 3) -> Column:
    """Column form of ``make_fragments`` (same dictionary-expanded word
    set as ``snippet_col``); applied to k winner rows only, like Q10."""
    words = expand_query_words(query, mode, dictionary)

    @F.pandas_udf(T.StringType())
    def snip(texts: pd.Series) -> pd.Series:
        return texts.apply(lambda t: make_fragments(t, words, n_fragments))

    return snip(text)
