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

# Named dictionaries behind one registry so the chosen dictionary serializes
# with the index (stats["dictionary"]) and query-side analysis (Q1) always
# matches the index side. "fixture": the committed test vocabulary.
# "ru_full": fixture ∪ the paradigm-generated Russian map (resources/
# ru_morph.py) — tens of thousands of real word forms for ref_compat recall.
_DICTIONARIES: dict[str, tuple[dict[str, str], frozenset[str]]] = {}


def get_dictionary(name: str = "fixture") -> tuple[dict[str, str], frozenset[str]]:
    if name not in _DICTIONARIES:
        if name == "fixture":
            _DICTIONARIES[name] = (LEMMA_OF, STOP_WORDS)
        elif name == "ru_full":
            from searchengine_spark.resources.ru_morph import (
                full_lemma_of, full_stop_words)
            _DICTIONARIES[name] = (full_lemma_of(), full_stop_words())
        elif name == "en_simple":
            from searchengine_spark.resources.en_morph import (
                EN_IRREGULAR, EN_STOP_WORDS)
            _DICTIONARIES[name] = (EN_IRREGULAR, EN_STOP_WORDS)
        elif name == "en_porter":
            # same stop list + irregular map; Porter replaces the
            # S-stemmer as the rule fallback (resources/en_porter.py)
            from searchengine_spark.resources.en_morph import (
                EN_IRREGULAR, EN_STOP_WORDS)
            _DICTIONARIES[name] = (EN_IRREGULAR, EN_STOP_WORDS)
        else:
            raise ValueError(f"unknown dictionary: {name}")
    return _DICTIONARIES[name]


def get_post_rule(name: str):
    """Rule-based fallback for RULE dictionaries: what to do with a word
    the lemma map misses (map dictionaries fall back to identity in
    ``general`` mode). Returns ``(word_fn, series_fn, surface_forms_fn)``
    or ``None`` — ``surface_forms_fn`` is the rules' exact finite inverse
    image for one lemma, used by snippet highlighting in place of a
    reverse-map scan."""
    if name == "en_simple":
        from searchengine_spark.resources.en_morph import (s_stem,
                                                           s_stem_series,
                                                           surface_forms)
        return (s_stem, s_stem_series, surface_forms)
    if name == "en_porter":
        from searchengine_spark.resources.en_porter import (
            porter_stem, porter_stem_series, porter_surface_forms)
        return (porter_stem, porter_stem_series, porter_surface_forms)
    return None


def _pattern(mode: str) -> str:
    if mode == "ref_compat":
        return REF_COMPAT_PATTERN
    if mode == "general":
        return GENERAL_PATTERN
    raise ValueError(f"unknown analysis mode: {mode}")


def analyze_text(text: str, mode: str = "general",
                 lemma_of: dict[str, str] | None = None,
                 stop_words: frozenset[str] | None = None,
                 dictionary: str = "fixture") -> list[str]:
    """Pure-Python analysis of one string; normative semantics."""
    d_lem, d_stop = get_dictionary(dictionary)
    lemma_of = d_lem if lemma_of is None else lemma_of
    stop_words = d_stop if stop_words is None else stop_words
    rule = get_post_rule(dictionary)
    cleaned = re.sub(_pattern(mode), " ", (text or "").lower())
    out: list[str] = []
    for w in cleaned.split():
        if w in stop_words:
            continue
        lemma = lemma_of.get(w)
        if lemma is None:
            if mode == "ref_compat":
                continue  # no normal form → skip (Lemmatizator.java:47-52)
            lemma = rule[0](w) if rule else w
        out.append(lemma)
    return out


def make_analyze_udf(mode: str = "general",
                     lemma_of: dict[str, str] | None = None,
                     stop_words: frozenset[str] | None = None,
                     dictionary: str = "fixture"):
    """Vectorized pandas UDF: text → array<string> of lemmas.

    Regrouping exploded tokens back into per-row lists is done with a
    searchsorted over the (nondecreasing) exploded index instead of
    ``groupby(level=0).agg(list)`` — the groupby-into-lists path allocates
    millions of tiny Python objects per Arrow batch and measured ~6-10×
    slower end-to-end inside Spark workers.
    """
    import numpy as np

    d_lem, d_stop = get_dictionary(dictionary)
    lemma_of = d_lem if lemma_of is None else lemma_of
    stop_words = d_stop if stop_words is None else stop_words
    pat = _pattern(mode)
    lemma_series_src = pd.Series(lemma_of)
    stop_set = frozenset(stop_words)
    ref_compat = mode == "ref_compat"
    post_rule = get_post_rule(dictionary)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def analyze(texts: pd.Series) -> pd.Series:
        tser = texts.reset_index(drop=True)
        toks = tser.fillna("").str.lower().str.replace(pat, " ", regex=True).str.split()
        ex = toks.explode()
        keep = ex.notna() & ~ex.isin(stop_set)
        ex = ex[keep]
        mapped = ex.map(lemma_series_src)
        if ref_compat:
            mapped = mapped.dropna()  # no normal form → skip (Lemmatizator.java:47-52)
        else:
            mapped = mapped.fillna(post_rule[1](ex) if post_rule else ex)
        idx = mapped.index.to_numpy()  # nondecreasing row ids post-explode
        vals = mapped.to_numpy()
        bounds = np.searchsorted(idx, np.arange(len(tser) + 1))
        return pd.Series(
            [vals[bounds[i]:bounds[i + 1]].tolist() for i in range(len(tser))],
            index=texts.index)

    return analyze


def analyze_col(text: Column, mode: str = "general",
                dictionary: str = "fixture") -> Column:
    """Default analysis: the vectorized pandas UDF (Arrow-batched)."""
    return make_analyze_udf(mode, dictionary=dictionary)(text)


# T2-T5 fused: the index build consumes per-doc (term, tf) pairs, so counting
# inside the UDF (SURVEY.md §2.2 T5's preferred form) makes the tf stage
# shuffle-free — explode(arrays_zip(terms, tfs)) is a narrow JVM op, and the
# first real shuffle of the build is the df/postings aggregation.
TT_SCHEMA = T.StructType([
    T.StructField("terms", T.ArrayType(T.StringType())),
    T.StructField("tfs", T.ArrayType(T.IntegerType())),
    T.StructField("dl", T.IntegerType()),
])


def make_analyze_tf_udf(mode: str = "general",
                        lemma_of: dict[str, str] | None = None,
                        stop_words: frozenset[str] | None = None,
                        dictionary: str = "fixture"):
    """Vectorized pandas UDF: text → struct(terms, tfs, dl) with per-doc
    term frequencies already counted (same T2/T3/T4 semantics as
    ``make_analyze_udf``; equality-tested against it)."""
    import numpy as np

    d_lem, d_stop = get_dictionary(dictionary)
    lemma_of = d_lem if lemma_of is None else lemma_of
    stop_words = d_stop if stop_words is None else stop_words
    pat = _pattern(mode)
    lemma_series_src = pd.Series(lemma_of)
    stop_set = frozenset(stop_words)
    ref_compat = mode == "ref_compat"
    post_rule = get_post_rule(dictionary)

    @F.pandas_udf(TT_SCHEMA)
    def analyze_tf(texts: pd.Series) -> pd.DataFrame:
        tser = texts.reset_index(drop=True)
        toks = tser.fillna("").str.lower().str.replace(pat, " ", regex=True).str.split()
        ex = toks.explode()
        keep = ex.notna() & ~ex.isin(stop_set)
        ex = ex[keep]
        mapped = ex.map(lemma_series_src)
        if ref_compat:
            mapped = mapped.dropna()
        else:
            mapped = mapped.fillna(post_rule[1](ex) if post_rule else ex)
        tok_idx = mapped.index.to_numpy()  # nondecreasing row ids
        n_rows = len(tser)
        tok_bounds = np.searchsorted(tok_idx, np.arange(n_rows + 1))
        dl = np.diff(tok_bounds).astype("int32")
        cnt = pd.DataFrame({"r": tok_idx, "t": mapped.to_numpy()}).groupby(
            ["r", "t"], sort=False).size()
        r = cnt.index.get_level_values(0).to_numpy()
        terms = cnt.index.get_level_values(1).to_numpy()
        tfs = cnt.to_numpy().astype("int32")
        order = np.argsort(r, kind="stable")
        r, terms, tfs = r[order], terms[order], tfs[order]
        bounds = np.searchsorted(r, np.arange(n_rows + 1))
        return pd.DataFrame({
            "terms": [terms[bounds[i]:bounds[i + 1]].tolist() for i in range(n_rows)],
            "tfs": [tfs[bounds[i]:bounds[i + 1]].tolist() for i in range(n_rows)],
            "dl": dl,
        }, index=texts.index)

    return analyze_tf


def analyze_tf_col(text: Column, mode: str = "general",
                   dictionary: str = "fixture") -> Column:
    """Fused analysis+tf-count UDF column (struct terms/tfs/dl)."""
    return make_analyze_tf_udf(mode, dictionary=dictionary)(text)


# Positional variant: adds the token positions of each term occurrence.
# ``poss`` is the per-doc CONCATENATION of each term's sorted position list
# (term order matches ``terms``; boundaries recoverable from ``tfs`` since a
# term's position count == its tf). Positions index the KEPT-lemma stream
# (post stop-filter, post lemmatization), 0-based — phrase adjacency is
# evaluated over what the index actually stores, the same convention the
# oracle reproduces.
TTP_SCHEMA = T.StructType([
    T.StructField("terms", T.ArrayType(T.StringType())),
    T.StructField("tfs", T.ArrayType(T.IntegerType())),
    T.StructField("dl", T.IntegerType()),
    T.StructField("poss", T.ArrayType(T.IntegerType())),
])


def make_analyze_tf_pos_udf(mode: str = "general",
                            lemma_of: dict[str, str] | None = None,
                            stop_words: frozenset[str] | None = None,
                            dictionary: str = "fixture"):
    """Vectorized pandas UDF: text → struct(terms, tfs, dl, poss)."""
    import numpy as np

    d_lem, d_stop = get_dictionary(dictionary)
    lemma_of = d_lem if lemma_of is None else lemma_of
    stop_words = d_stop if stop_words is None else stop_words
    pat = _pattern(mode)
    lemma_series_src = pd.Series(lemma_of)
    stop_set = frozenset(stop_words)
    ref_compat = mode == "ref_compat"
    post_rule = get_post_rule(dictionary)

    @F.pandas_udf(TTP_SCHEMA)
    def analyze_tf_pos(texts: pd.Series) -> pd.DataFrame:
        tser = texts.reset_index(drop=True)
        toks = tser.fillna("").str.lower().str.replace(pat, " ", regex=True).str.split()
        ex = toks.explode()
        keep = ex.notna() & ~ex.isin(stop_set)
        ex = ex[keep]
        mapped = ex.map(lemma_series_src)
        if ref_compat:
            mapped = mapped.dropna()
        else:
            mapped = mapped.fillna(post_rule[1](ex) if post_rule else ex)
        tok_idx = mapped.index.to_numpy()  # nondecreasing row ids
        n_rows = len(tser)
        tok_bounds = np.searchsorted(tok_idx, np.arange(n_rows + 1))
        dl = np.diff(tok_bounds).astype("int32")
        # position within each row's kept-lemma stream
        pos = (np.arange(len(tok_idx)) - tok_bounds[tok_idx]).astype("int32")
        g = pd.DataFrame({"r": tok_idx, "t": mapped.to_numpy(), "p": pos})
        # sorted by (row, term, position): positions per (row, term) stay asc
        g = g.sort_values(["r", "t", "p"], kind="stable")
        cnt = g.groupby(["r", "t"], sort=False).size()
        r = cnt.index.get_level_values(0).to_numpy()
        terms = cnt.index.get_level_values(1).to_numpy()
        tfs = cnt.to_numpy().astype("int32")
        bounds = np.searchsorted(r, np.arange(n_rows + 1))
        pvals = g["p"].to_numpy()
        pb = np.searchsorted(g["r"].to_numpy(), np.arange(n_rows + 1))
        return pd.DataFrame({
            "terms": [terms[bounds[i]:bounds[i + 1]].tolist() for i in range(n_rows)],
            "tfs": [tfs[bounds[i]:bounds[i + 1]].tolist() for i in range(n_rows)],
            "dl": dl,
            "poss": [pvals[pb[i]:pb[i + 1]].tolist() for i in range(n_rows)],
        }, index=texts.index)

    return analyze_tf_pos


def analyze_tf_pos_col(text: Column, mode: str = "general",
                       dictionary: str = "fixture") -> Column:
    return make_analyze_tf_pos_udf(mode, dictionary=dictionary)(text)


def tf_pos_pairs(docs: DataFrame, tt_col: str = "tt") -> DataFrame:
    """(doc_id, dl, term, tf, positions array<int>) rows from the positional
    struct — the concatenated ``poss`` is re-split per term with a slice over
    the running tf offsets, all JVM-side."""
    offs = F.expr(
        f"transform({tt_col}.tfs, (x, i) -> "
        f"aggregate(slice({tt_col}.tfs, 1, i), 0, (a, b) -> a + b))")
    z = docs.select(
        "doc_id", "dl", F.col(f"{tt_col}.poss").alias("_poss"),
        F.explode(F.arrays_zip(
            F.col(f"{tt_col}.terms").alias("term"),
            F.col(f"{tt_col}.tfs").alias("tf"),
            offs.alias("off"))).alias("x"))
    return z.select(
        "doc_id", "dl", F.col("x.term").alias("term"),
        F.col("x.tf").cast("long").alias("tf"),
        F.slice("_poss", F.col("x.off") + 1, F.col("x.tf")).alias("positions"))


def tf_pairs(docs: DataFrame, tt_col: str = "tt") -> DataFrame:
    """(doc_id, dl, term, tf) rows from the fused struct — narrow ops only
    (explode of pre-counted pairs; no shuffle)."""
    return (docs
            .select("doc_id", "dl",
                    F.explode(F.arrays_zip(F.col(f"{tt_col}.terms").alias("term"),
                                           F.col(f"{tt_col}.tfs").alias("tf"))).alias("x"))
            .select("doc_id", "dl", F.col("x.term").alias("term"),
                    F.col("x.tf").cast("long").alias("tf")))


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
