"""Text-analysis chain: normalize → tokenize → POS/stop filter → lemmatize.

Re-expresses the reference's chain (reference: dto/indexing/Lemmatizator.java)
Spark-first:

- T2 normalize+tokenize  — lowercase, strip charset, split on whitespace
  (Lemmatizator.java:97-102: lowercase Locale.ROOT, ``[^а-я\\s]``→space,
  trim, split ``\\s+``). ``ref_compat`` mode keeps the Cyrillic-only charset;
  ``general`` mode widens to ``[a-zа-я0-9]`` for agentic transcripts.
- T3 stop filter          — drop a word when ANY of its morph analyses is
  МЕЖД/ПРЕДЛ/СОЮЗ (Lemmatizator.java:12,84-95).
- T4 lemmatize            — FIRST normal form wins (Lemmatizator.java:47-52);
  dictionary-driven here (broadcast map). OOV: dropped in ``ref_compat``
  (no normal form → skip), identity in ``general``.
- T5 per-doc tf           — done downstream by ``explode → groupBy`` (one
  shuffle shared with the df aggregation), not inside the UDF.

Two equivalent implementations, equality-tested:

- ``analyze_col`` (default): a **vectorized pandas UDF** `text →
  array<string>` of lemmas. Pure pandas string ops + dict ``.map`` — no
  per-row Python. This is the north-rule path (Arrow-batched).
- ``analyze_col_builtin``: pure ``pyspark.sql.functions`` (lower /
  regexp_replace / split / filter) with the dictionary applied later via a
  broadcast join — stays entirely in whole-stage codegen; useful as a
  cross-check and for clusters where Python workers are the bottleneck.

``analyze_text`` is the identical pure-Python function for driver-side query
analysis (reference Q1: services/SearchingServiceImpl.java:38-41) and the
golden model.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

from searchengine_spark.resources.vocab import LEMMA_OF, STOP_WORDS

REF_COMPAT_PATTERN = r"[^а-я\s]"   # Lemmatizator.java:99 (after lowercasing)
GENERAL_PATTERN = r"[^a-zа-я0-9\s]"


def _pattern(mode: str) -> str:
    if mode == "ref_compat":
        return REF_COMPAT_PATTERN
    if mode == "general":
        return GENERAL_PATTERN
    raise ValueError(f"unknown analysis mode: {mode}")


def analyze_text(text: str, mode: str = "general",
                 lemma_of: dict[str, str] | None = None,
                 stop_words: frozenset[str] | None = None) -> list[str]:
    """Pure-Python analysis of one string; normative semantics."""
    lemma_of = LEMMA_OF if lemma_of is None else lemma_of
    stop_words = STOP_WORDS if stop_words is None else stop_words
    cleaned = re.sub(_pattern(mode), " ", (text or "").lower())
    out: list[str] = []
    for w in cleaned.split():
        if w in stop_words:
            continue
        lemma = lemma_of.get(w)
        if lemma is None:
            if mode == "ref_compat":
                continue  # no normal form → skip (Lemmatizator.java:47-52)
            lemma = w
        out.append(lemma)
    return out


def make_analyze_udf(mode: str = "general",
                     lemma_of: dict[str, str] | None = None,
                     stop_words: frozenset[str] | None = None):
    """Vectorized pandas UDF: text → array<string> of lemmas."""
    lemma_of = LEMMA_OF if lemma_of is None else lemma_of
    stop_words = STOP_WORDS if stop_words is None else stop_words
    pat = _pattern(mode)
    lemma_series_src = pd.Series(lemma_of)
    stop_list = sorted(stop_words)
    ref_compat = mode == "ref_compat"

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def analyze(texts: pd.Series) -> pd.Series:
        toks = texts.fillna("").str.lower().str.replace(pat, " ", regex=True).str.split()
        ex = toks.explode()
        keep = ex.notna() & ~ex.isin(stop_list)
        ex = ex[keep]
        mapped = ex.map(lemma_series_src)
        if ref_compat:
            mapped = mapped.dropna()
        else:
            mapped = mapped.fillna(ex)
        out = mapped.groupby(level=0).agg(list)
        return out.reindex(texts.index).apply(lambda v: v if isinstance(v, list) else [])

    return analyze


def analyze_col(text: Column, mode: str = "general") -> Column:
    """Default analysis: the vectorized pandas UDF (Arrow-batched)."""
    return make_analyze_udf(mode)(text)


def tokenize_col_builtin(text: Column, mode: str = "general") -> Column:
    """T2 with pure built-ins: array of raw (pre-lemma) tokens, JVM-side."""
    pat = _pattern(mode)
    arr = F.split(F.trim(F.regexp_replace(F.lower(text), pat, " ")), r"\s+")
    return F.filter(arr, lambda w: w != F.lit(""))


def lemmatize_tokens_builtin(tokens_df: DataFrame, token_col: str = "word",
                             mode: str = "general") -> DataFrame:
    """T3+T4 via broadcast join against the dictionary (JVM-side path).

    ``tokens_df`` has one row per raw token; returns rows with a ``lemma``
    column, stop words and (ref_compat) OOV words filtered out.
    """
    spark = tokens_df.sparkSession
    dict_rows = [(w, l, w in STOP_WORDS) for w, l in LEMMA_OF.items()]
    dict_df = spark.createDataFrame(dict_rows, "word string, lemma string, is_stop boolean")
    joined = tokens_df.join(F.broadcast(dict_df), token_col, "left")
    joined = joined.filter(~F.coalesce(F.col("is_stop"), F.lit(False)))
    if mode == "ref_compat":
        joined = joined.filter(F.col("lemma").isNotNull())
    else:
        joined = joined.withColumn("lemma", F.coalesce(F.col("lemma"), F.col(token_col)))
    return joined.drop("is_stop")
