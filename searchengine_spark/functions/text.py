"""Text-analysis operators for large-scale training-data pipelines.

All built from pyspark.sql built-ins (whole-stage codegen, no Python in the
hot path): token counting, quality scoring, heuristic language ID, document
fingerprinting. Each has an ANSI-SQL oracle in ``__spark_entry__.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TOKEN_PATTERN = "[^a-z0-9 ]"  # latin corpus normalization (documents table)


def tokens_col(text: Column) -> Column:
    """Whitespace tokens of lowercased, punctuation-stripped text."""
    arr = F.split(F.regexp_replace(F.lower(text), TOKEN_PATTERN, " "), " +")
    return F.filter(arr, lambda w: w != F.lit(""))


def token_count(text: Column) -> Column:
    return F.size(tokens_col(text))


def quality_metrics(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality features: token count, char count, avg token length,
    punctuation ratio, digit ratio — the standard cheap quality filters."""
    text = F.col(text_col)
    toks = tokens_col(text)
    n_chars = F.length(text)
    stripped_len = F.length(F.regexp_replace(text, r"[a-zA-Z0-9\s]", ""))
    digits_len = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        n_chars.alias("n_chars"),
        F.round(
            F.aggregate(toks, F.lit(0), lambda acc, w: acc + F.length(w)).cast("double")
            / F.greatest(F.size(toks), F.lit(1)), 6).alias("avg_token_len"),
        F.round(stripped_len.cast("double") / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(digits_len.cast("double") / F.greatest(n_chars, F.lit(1)), 6).alias("digit_ratio"),
    )


# tiny per-language stopword marker sets for the n-gram/stopword heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
    "ru": ["и", "в", "на", "не", "что"],
}


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: argmax of per-language marker-stopword hits.

    Pure built-ins: one pass computing all language scores as columns, then a
    greatest/when chain — no UDF, no shuffle. Ties break by language code
    (deterministic). Returns (id, lang_pred, lang_hits).
    """
    toks = tokens_col_raw(F.col(text_col))
    scores = {lang: F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in marks])))
              for lang, marks in _LANG_MARKERS.items()}
    best = None
    for lang in sorted(scores):  # ties → first alphabetically
        cond = F.lit(True)
        for other in sorted(scores):
            if other < lang:
                cond = cond & (scores[lang] > scores[other])
            elif other > lang:
                cond = cond & (scores[lang] >= scores[other])
        best = F.when(cond, F.lit(lang)) if best is None else best.when(cond, F.lit(lang))
    hits = None
    for c in scores.values():
        hits = c if hits is None else hits + c
    return df.select(F.col(id_col), best.alias("lang_pred"), hits.alias("lang_hits"))


def tokens_col_raw(text: Column) -> Column:
    """Tokens keeping unicode letters (for lang-id over mixed scripts)."""
    arr = F.split(F.lower(text), r"\s+")
    return F.filter(arr, lambda w: w != F.lit(""))


def html_to_text(text: Column) -> Column:
    """T1 analog (reference: Jsoup.parse(html).text() at
    dto/indexing/PageIndexer.java:93): strip script/style blocks, tags, and
    common entities; collapse whitespace. Pure built-ins — regex-based, good
    enough for indexing (not a sanitizer)."""
    t = F.regexp_replace(text, r"(?is)<script[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"(?s)<[^>]+>", " ")
    for ent, rep in [("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"),
                     ("&gt;", ">"), ("&quot;", "\""), ("&#39;", "'")]:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


# BPE-ish pre-tokenizer: word pieces, numbers, and single punctuation marks —
# the shape GPT-2-style byte-pair pre-tokenization produces before merges.
BPE_PATTERN = r"[A-Za-zА-Яа-яЁё]+|[0-9]+|[^\sA-Za-zА-Яа-яЁё0-9]"


def token_count_bpe(text: Column) -> Column:
    """Pre-tokenizer token count (proxy for LLM token budgeting at corpus
    scale; the true BPE merge table only shrinks counts)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0))


def extract_title(text: Column, fallback_chars: int = 60) -> Column:
    """Q9 title analog (reference extracts the substring between
    ``<title>``/``</title>`` per hit, services/SearchingServiceImpl.java:159-169):
    the <title> content when markup is present, else the first
    ``fallback_chars`` characters of the text (transcript turns are plain
    text, so the fallback is the common path)."""
    t = F.trim(F.regexp_extract(text, r"(?is)<title[^>]*>(.*?)</title>", 1))
    return F.when(t != "", t).otherwise(F.substring(text, 1, fallback_chars))


# PII redaction patterns, applied IN ORDER (earlier replacements can
# shadow later matches — e.g. a card number is consumed before the phone
# pattern sees its tail). Regexes stay inside the subset shared by Java
# (Spark codegen) and RE2 (DuckDB oracles): no backrefs, no lookaround.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("card", r"\b(?:\d{4}[ -]){3}\d{4}\b", "<CARD>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def scrub_pii(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """PII redaction for training-data pipelines: emails, SSNs, card
    numbers, phone numbers, and IPv4s replaced by typed placeholder
    tokens, with per-category redaction counts. One sequential
    regexp_replace chain per row — pure codegen, no UDF, no shuffle;
    counts are taken on the text as each pattern sees it (post the
    previous replacements), so Σ counts == placeholder insertions.
    Returns (id, text_clean, n_<category>..., n_pii)."""
    t = F.col(text_col)
    counts = []
    for name, pat, rep in PII_PATTERNS:
        counts.append(F.size(F.regexp_extract_all(t, F.lit(pat), 0))
                      .alias(f"n_{name}"))
        t = F.regexp_replace(t, pat, rep)
    out = df.select(F.col(id_col), t.alias("text_clean"), *counts)
    total = None
    for name, _, _ in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("n_pii", total)


def clean_lines(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", min_words: int = 3,
                min_lines: int = 1) -> DataFrame:
    """C4-style line-level cleaning: keep lines with ≥ ``min_words``
    whitespace words that end in terminal punctuation (. ! ? ") and don't
    mention javascript; dedupe repeated lines WITHIN the doc (keep first);
    drop whole docs containing "lorem ipsum" or "{" or with fewer than
    ``min_lines`` surviving lines — the published C4 heuristics
    re-expressed as one codegen projection + filter (array ops, no UDF,
    no shuffle). Returns (id, text_clean, n_lines, n_kept) for surviving
    docs."""
    text = F.col(text_col)
    lines = F.transform(F.split(text, "\n"), F.trim)
    kept = F.filter(
        lines,
        lambda ln: (F.size(F.split(ln, r"\s+")) >= F.lit(int(min_words)))
        & ln.rlike('[.!?"]$')
        & ~F.lower(ln).contains("javascript"))
    deduped = F.array_distinct(kept)  # order-preserving, keeps first
    return (df.select(
        F.col(id_col),
        F.array_join(deduped, "\n").alias("text_clean"),
        F.size(lines).alias("n_lines"),
        F.size(deduped).alias("n_kept"),
        F.lower(text).contains("lorem ipsum").alias("_lorem"),
        text.contains("{").alias("_brace"))
        .filter((F.col("n_kept") >= int(min_lines))
                & ~F.col("_lorem") & ~F.col("_brace"))
        .drop("_lorem", "_brace"))


def repetition_metrics(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals: duplicate-line fraction and
    top-bigram fraction per doc — the MassiveText "repetitious text"
    filters. Both run entirely inside codegen (no shuffle, no UDF): the
    bigram mode count is the longest run in the doc's SORTED bigram array
    (aggregate over sort_array — O(n log n) per row), so the operator is
    one narrow projection at any corpus size. Returns
    (id, n_lines, dup_line_frac, n_bigrams, top_bigram_frac)."""
    text = F.col(text_col)
    lines = F.filter(F.transform(F.split(text, "\n"), F.trim),
                     lambda ln: ln != F.lit(""))
    n_lines = F.size(lines)
    dup_frac = F.when(n_lines == 0, F.lit(0.0)).otherwise(F.round(
        F.lit(1.0) - F.size(F.array_distinct(lines)).cast("double")
        / F.greatest(n_lines, F.lit(1)), 6))
    toks = tokens_col(text)
    n = F.size(toks)
    m = F.greatest(n - 1, F.lit(0))
    bigrams = F.zip_with(F.slice(toks, 1, m), F.slice(toks, 2, m),
                         lambda a, b: F.concat_ws(" ", a, b))
    acc0 = F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                    F.lit(0).alias("best"))

    def step(acc, e):
        run = F.when(e == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(e.alias("prev"), run.alias("run"),
                        F.greatest(acc["best"], run).alias("best"))

    top = F.aggregate(F.sort_array(bigrams), acc0, step,
                      lambda a: a["best"])
    top_frac = F.round(top.cast("double") / F.greatest(m, F.lit(1)), 6)
    return df.select(F.col(id_col), n_lines.alias("n_lines"),
                     dup_frac.alias("dup_line_frac"),
                     m.alias("n_bigrams"),
                     top_frac.alias("top_bigram_frac"))


def drop_hot_lines(df: DataFrame, max_docs: int = 10,
                   min_words: int = 3, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """CORPUS-level line deduplication — the cross-document boilerplate
    killer (headers, footers, cookie banners, license blurbs appear
    verbatim in thousands of docs; ``clean_lines`` only dedupes WITHIN a
    doc). A line that occurs in more than ``max_docs`` distinct documents
    is dropped from every document; lines shorter than ``min_words``
    words are exempt from counting (short connectives repeat naturally
    and removing them would shred innocent text — the C4 heuristic).

    Returns (id, text, n_dropped) with each doc's surviving lines
    rejoined in their original order; a doc whose every line was hot
    drops out entirely (it WAS boilerplate). Plan: one posexplode over the
    corpus, one (line → distinct-doc count) hash aggregation (map-side
    combined; the hot-line table is tiny by definition — hotness is the
    filter — so the second pass is a broadcast-able anti-join), one
    per-doc reassembly aggregation (array_sort of (ord, line) structs —
    doc-sized groups, no window). Three shuffles total at any corpus
    size."""
    lines = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), "\n"))
        .alias("ord", "line"))
    countable = F.size(F.filter(F.split(F.trim(F.col("line")), r"\s+"),
                                lambda w: w != F.lit(""))) >= min_words
    lines = lines.withColumn("_countable", countable)
    hot = (lines.filter(F.col("_countable"))
           .groupBy("line")
           .agg(F.count_distinct(F.col("_id")).alias("_nd"))
           .filter(F.col("_nd") > max_docs)
           .select("line"))
    kept = lines.join(
        hot.withColumn("_hot", F.lit(True)), "line", "left") \
        .filter(~(F.col("_countable") & F.coalesce(F.col("_hot"),
                                                   F.lit(False))))
    dropped = lines.groupBy("_id").agg(F.count("*").alias("_n_lines"))
    out = (kept.groupBy("_id")
           .agg(F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(
                            F.struct(F.col("ord"), F.col("line")))),
                        lambda s: s.getField("line")),
                    "\n").alias("text"),
                F.count("*").alias("_n_kept")))
    return (out.join(dropped, "_id")
            .select(F.col("_id").alias(id_col), "text",
                    (F.col("_n_lines") - F.col("_n_kept")).cast("int")
                    .alias("n_dropped")))


def dedup_repeated_ngrams(df: DataFrame, window: int = 50,
                          min_occurrences: int = 2,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """ExactSubstr-style repeated-span removal (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better") as a
    token-window approximation: any ``window``-token span whose exact text
    occurs at least ``min_occurrences`` times in the corpus is removed
    from every occurrence EXCEPT the first (first = smallest
    ``(doc_id, pos)``), and each document's surviving tokens are rejoined
    with single spaces. The reference pipeline uses suffix arrays on a
    single machine; fixed-width window hashing is the standard
    distributed relaxation (a repeated substring of >= ``window`` tokens
    is covered by its repeated windows, so every such span is caught —
    at the cost of whitespace normalization in the rebuilt text).

    Tokens split on whitespace only (casing/punctuation preserved), the
    same convention as ``chunk_documents``. Docs shorter than ``window``
    tokens contribute no windows and pass through untouched. A document
    whose every token is covered (an exact duplicate of an earlier doc)
    comes back with ``text = ''`` — keep or drop is the caller's call.
    Overlap note: a token is removed when ANY non-canonical duplicated
    window covers it, so the kept "first occurrence" of one span can
    still lose tokens to a different overlapping duplicated span —
    greedy cover, deterministic.

    Returns (id, text, n_removed) with n_removed = tokens cut.

    Plan shape (no windows-over-data, no UDFs, every stage key-partitioned):
    one posexplode to the token stream; one O(n*window) projection to
    per-position window hashes (md5 — 128-bit, so hash-equality stands in
    for string equality even at 10^12 windows; the lambda closes over a
    projected column attribute only); a (hash -> count, first-occurrence)
    hash aggregation (map-side combined — hot boilerplate windows collapse
    in the mapper, so skew stays in the combiner); an occurrence join on
    the hash (1 row per hash on the build side); a covered-position
    explode + distinct; a left-anti join and per-doc reassembly
    aggregation (doc-sized groups)."""
    words = F.filter(F.split(F.col(text_col), r"\s+"),
                     lambda w: w != F.lit(""))
    base = (df.select(F.col(id_col).alias("_id"), words.alias("_w"))
            .withColumn("_n", F.size("_w"))
            .filter(F.col("_n") > 0))
    # _w is a projected attribute, so the transform lambda re-reads the
    # array per element (cheap) rather than re-running the tokenizer
    # (the HOF capture trap — see analysis notes).
    nw = F.col("_n") - F.lit(window) + 1
    wins = F.transform(
        F.sequence(F.lit(0), nw - 1),
        lambda i: F.md5(F.array_join(F.slice("_w", i + 1, window), " ")))
    occ = (base.filter(F.col("_n") >= window)
           .select("_id", F.posexplode(wins).alias("pos", "h")))
    dup = (occ.groupBy("h")
           .agg(F.count("*").alias("_c"),
                F.min(F.struct(F.col("_id"), F.col("pos"))).alias("_first"))
           .filter(F.col("_c") >= min_occurrences)
           .select("h", "_first"))
    cut = (occ.join(dup, "h")
           .filter(~((F.col("_id") == F.col("_first._id"))
                     & (F.col("pos") == F.col("_first.pos")))))
    cutpos = (cut.select(
        "_id", F.explode(F.sequence(
            F.col("pos"), F.col("pos") + F.lit(window - 1))).alias("tokpos"))
        .distinct())
    toks = base.select("_id", F.posexplode("_w").alias("tokpos", "tok"))
    kept = toks.join(cutpos, ["_id", "tokpos"], "left_anti")
    agg = (kept.groupBy("_id")
           .agg(F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(
                            F.struct(F.col("tokpos"), F.col("tok")))),
                        lambda s: s.getField("tok")),
                    " ").alias("text"),
                F.count("*").alias("_n_kept")))
    return (base.select("_id", "_n").join(agg, "_id", "left")
            .select(F.col("_id").alias(id_col),
                    F.coalesce(F.col("text"), F.lit("")).alias("text"),
                    (F.col("_n") - F.coalesce(F.col("_n_kept"), F.lit(0)))
                    .cast("int").alias("n_removed")))


def _ngrams_col(text: Column, n: int) -> Column:
    """Word n-gram OCCURRENCES (non-distinct — dedup's ``shingles_col``
    is the distinct-per-doc variant). Same zip_with-of-shifted-views
    construction: lambdas touch scalar elements only, so the tokenizer
    runs O(n) times per row, never per n-gram index."""
    toks = tokens_col(text)
    acc = toks
    for j in range(1, n):
        shifted = F.slice(toks, j + 1, F.greatest(F.size(toks) - j, F.lit(1)))
        acc = F.zip_with(acc, shifted, lambda x, y: F.concat(x, F.lit(" "), y))
    return F.filter(acc, lambda s: s.isNotNull())


def ngram_counts(df: DataFrame, n: int = 2, k: int = 100,
                 min_count: int = 2, text_col: str = "text") -> DataFrame:
    """Top-k corpus n-grams by occurrence count — the corpus-statistics
    staple behind boilerplate detection ("most common 10-grams ARE the
    boilerplate"), template mining, and tokenizer/vocab analysis.
    Returns (ngram, n_occurrences) ordered by count desc, ngram asc.

    Plan: one explode + one partial+final hash aggregation over the
    corpus, count floor, then TakeOrderedAndProject for the top-k — the
    same shape as the index build's df stage; no shuffle beyond the one
    aggregation."""
    grams = df.select(F.explode(_ngrams_col(F.col(text_col), n))
                      .alias("ngram"))
    cnt = grams.groupBy("ngram").agg(F.count("*").alias("n_occurrences"))
    return (cnt.filter(F.col("n_occurrences") >= min_count)
            .orderBy(F.col("n_occurrences").desc(), F.col("ngram").asc())
            .limit(k))


def collocations(df: DataFrame, k: int = 50, min_count: int = 5,
                 text_col: str = "text") -> DataFrame:
    """PMI-scored bigram collocations — classical phrase mining (Church &
    Hanks pointwise mutual information): bigrams whose observed frequency
    most exceeds what their words' independent frequencies predict are
    multi-word units ("new york", "lock contention"), the candidates for
    phrase-aware tokenization and query suggestion.

    PMI = ln( P(ab) / (P(a)·P(b)) ) with P from corpus counts; the
    ``min_count`` floor removes the low-count PMI explosion (a hapax pair
    of two hapax words maxes PMI — noise, not signal). Returns
    (w1, w2, n_ab, pmi) ordered by pmi desc (9-dp tie-break), words asc.

    Plan: one explode for unigram counts, one for bigram pairs, each a
    partial+final hash agg; two vocab-sized joins to attach word counts;
    the corpus totals reduce via two 1-row aggregates cross-joined
    (broadcast) — never a global window. Top-k is
    TakeOrderedAndProject."""
    toks = df.select(F.explode(tokens_col(F.col(text_col))).alias("w"))
    uni = toks.groupBy("w").agg(F.count("*").alias("c"))
    n_tok = uni.agg(F.sum("c").cast("double").alias("n_tok"))
    pairs_col = F.zip_with(
        tokens_col(F.col(text_col)),
        F.slice(tokens_col(F.col(text_col)), 2,
                F.greatest(F.size(tokens_col(F.col(text_col))) - 1,
                           F.lit(1))),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")))
    bi_all = (df.select(F.explode(pairs_col).alias("p"))
              .select("p.w1", "p.w2").filter(F.col("w2").isNotNull())
              .groupBy("w1", "w2").agg(F.count("*").alias("n_ab")))
    # P(ab) denominates over ALL corpus bigrams; the floor only gates
    # which pairs are reported
    n_bi = bi_all.agg(F.sum("n_ab").cast("double").alias("n_bi"))
    bi = bi_all.filter(F.col("n_ab") >= min_count)
    j = (bi.join(uni.select(F.col("w").alias("w1"),
                            F.col("c").alias("c1")), "w1")
         .join(uni.select(F.col("w").alias("w2"),
                          F.col("c").alias("c2")), "w2")
         .crossJoin(F.broadcast(n_bi)).crossJoin(F.broadcast(n_tok)))
    pmi = F.log((F.col("n_ab") / F.col("n_bi"))
                / ((F.col("c1") / F.col("n_tok"))
                   * (F.col("c2") / F.col("n_tok"))))
    return (j.select("w1", "w2", "n_ab", pmi.alias("pmi"))
            .orderBy(F.round(F.col("pmi"), 9).desc(),
                     F.col("w1").asc(), F.col("w2").asc())
            .limit(k))


def chunk_documents(df: DataFrame, chunk_tokens: int = 128,
                    overlap: int = 32, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Split documents into overlapping token-window passages — the
    docs→passages operator every passage-retrieval / RAG / context-window
    pipeline runs before indexing or embedding. Windows slide by
    ``chunk_tokens - overlap`` whitespace tokens; the final window covers
    the tail (it may be shorter, it is never empty), docs with at most
    ``chunk_tokens`` tokens yield exactly one chunk, and empty docs yield
    none. Chunk text preserves the original casing/punctuation (tokens
    split on whitespace only) so passages remain real text.

    Returns (id, chunk_idx, n_tokens, text) with (id, chunk_idx) as the
    stable passage key — feed it straight to ``build_index`` (conv_id =
    doc key, turn_idx = chunk_idx) or an embedding stage. Pure codegen:
    one split + one explode over a driver-computed arithmetic chunk
    count; no UDF, no shuffle — chunking is a projection, parallel over
    whatever partitioning the corpus scan has."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    words = F.filter(F.split(F.col(text_col), r"\s+"),
                     lambda w: w != F.lit(""))
    n = F.size(words)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)).cast("double") / F.lit(stride)),
        F.lit(1)).cast("int")
    base = df.select(F.col(id_col), words.alias("_w"), n.alias("_n"),
                     n_chunks.alias("_nc")).filter(F.col("_n") > 0)
    ci = F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias("chunk_idx")
    out = base.select(F.col(id_col), ci, "_w")
    piece = F.slice(F.col("_w"), F.col("chunk_idx") * stride + 1,
                    chunk_tokens)
    return out.select(
        F.col(id_col), F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(piece).alias("n_tokens"),
        F.array_join(piece, " ").alias("text"))


GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 min_words: int = 50, max_words: int = 100_000,
                 min_mean_len: float = 3.0, max_mean_len: float = 10.0,
                 max_symbol_ratio: float = 0.1,
                 max_bullet_frac: float = 0.9,
                 max_ellipsis_frac: float = 0.3,
                 min_alpha_frac: float = 0.8,
                 min_stops: int = 2) -> DataFrame:
    """The Gopher/MassiveText document-quality rule battery (the named
    filter set large-scale text pipelines run first; defaults are the
    published thresholds): word-count bounds, mean-word-length bounds,
    symbol-to-word ratio (# and ellipsis), bullet-started and
    ellipsis-ended line fractions, alphabetic-word fraction, and a
    required-stop-word count. Complements ``repetition_metrics`` (the
    repetition half of the same paper's rules) and ``clean_lines`` (the
    C4 line-level battery).

    Returns one row per doc with every measured signal plus per-rule
    booleans and an overall ``passes`` — keep the signals rather than
    filtering in place so a pipeline can tune thresholds without
    re-scanning the corpus. Pure codegen (split/filter/aggregate on
    arrays; no UDF, no shuffle — one projection over the corpus scan)."""
    text = F.col(text_col)
    words = F.filter(F.split(text, r"\s+"), lambda w: w != F.lit(""))
    n_words = F.size(words)
    mean_len = (F.aggregate(words, F.lit(0).cast("long"),
                            lambda acc, w: acc + F.length(w)).cast("double")
                / F.greatest(n_words, F.lit(1)).cast("double"))
    # symbols: '#' occurrences + '...'/'…' occurrences, per word
    n_hash = F.length(text) - F.length(F.regexp_replace(text, "#", ""))
    n_ell = ((F.length(text)
              - F.length(F.regexp_replace(text, r"\.\.\.", "")))
             / F.lit(3)).cast("long") \
        + (F.length(text) - F.length(F.regexp_replace(text, "…", "")))
    symbol_ratio = ((n_hash + n_ell).cast("double")
                    / F.greatest(n_words, F.lit(1)).cast("double"))
    lines = F.filter(F.transform(F.split(text, "\n"),
                                 lambda l: F.trim(l)),
                     lambda l: l != F.lit(""))
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_frac = (F.size(F.filter(lines,
                                   lambda l: l.rlike(r"^[-*•‣◦]")))
                   .cast("double") / n_lines)
    ellipsis_frac = (F.size(F.filter(lines,
                                     lambda l: l.rlike(r"(\.\.\.|…)$")))
                     .cast("double") / n_lines)
    alpha_frac = (F.size(F.filter(words, lambda w: w.rlike("[A-Za-zА-Яа-я]")))
                  .cast("double") / F.greatest(n_words, F.lit(1)).cast("double"))
    lower_toks = tokens_col(text)
    n_stop = F.size(F.array_intersect(
        F.array_distinct(lower_toks),
        F.array(*[F.lit(s) for s in GOPHER_STOPS])))
    out = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_frac"),
        ellipsis_frac.alias("ellipsis_frac"),
        alpha_frac.alias("alpha_frac"),
        n_stop.alias("n_stop"))
    rules = {
        "ok_words": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "ok_mean_len": (F.col("mean_word_len") >= min_mean_len)
        & (F.col("mean_word_len") <= max_mean_len),
        "ok_symbols": F.col("symbol_ratio") < max_symbol_ratio,
        "ok_bullets": F.col("bullet_frac") < max_bullet_frac,
        "ok_ellipsis": F.col("ellipsis_frac") < max_ellipsis_frac,
        "ok_alpha": F.col("alpha_frac") >= min_alpha_frac,
        "ok_stops": F.col("n_stop") >= min_stops,
    }
    for name, pred in rules.items():
        out = out.withColumn(name, pred)
    passes = None
    for name in rules:
        passes = F.col(name) if passes is None else (passes & F.col(name))
    return out.withColumn("passes", passes)


def train_unigram_lm(df: DataFrame, text_col: str = "text",
                     smoothing: str = "laplace") -> dict:
    """Train a unigram language model over a corpus — the model half of
    the CCNet-style perplexity quality filter (CCNet scores Common Crawl
    against a Wikipedia-trained LM and keeps the low-perplexity tail; at
    transcript scale the same signal separates fluent turns from
    boilerplate/garbage). Unigram is the scale-honest choice: the model
    IS a (term, logp) DataFrame, trainable in one aggregation over any
    corpus size and joinable at scoring time — no n-gram state explosion.

    ``smoothing="laplace"`` (the default) gives add-one probabilities
    P(w) = (c(w)+1)/(N+V) and an OOV mass of 1/(N+V) so the model can
    score FOREIGN corpora (the CCNet setup: train on a clean reference,
    score the crawl); ``smoothing=None`` gives the exact MLE c(w)/N
    (self-scoring only — OOV is impossible on the training corpus).

    Returns {"probs": DataFrame[term, logp double], "oov_logp": float,
    "n_tokens": int, "vocab": int}. Plan: one explode + one hash
    aggregation (partial+final) over the corpus; N and V reduce to the
    driver from the vocab-sized aggregate, never from the token stream."""
    toks = df.select(F.explode(tokens_col(F.col(text_col))).alias("term"))
    cnt = toks.groupBy("term").agg(F.count("*").alias("c"))
    cnt = cnt.localCheckpoint(eager=False)  # train once, score many
    row = cnt.agg(F.sum("c").alias("n"), F.count("*").alias("v")).collect()[0]
    n, v = int(row["n"] or 0), int(row["v"] or 0)
    if smoothing == "laplace":
        import math
        probs = cnt.select("term", F.log((F.col("c") + F.lit(1.0))
                                         / F.lit(float(n + v))).alias("logp"))
        oov = math.log(1.0 / (n + v)) if n + v else 0.0
    elif smoothing is None:
        probs = cnt.select("term",
                           F.log(F.col("c") / F.lit(float(n))).alias("logp"))
        oov = None
    else:
        raise ValueError(f"unknown smoothing: {smoothing!r}")
    return {"probs": probs, "oov_logp": oov, "n_tokens": n, "vocab": v}


def unigram_lm_perplexity(df: DataFrame, lm: "dict | None" = None,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Per-document unigram-LM perplexity — the CCNet quality signal:
    ppl = exp(-mean token log-probability). Low ppl ⇒ the doc looks like
    the LM's training corpus; the standard training-data filter keeps the
    low/middle tail and drops the high-ppl garbage.

    ``lm=None`` self-scores: the MLE model is trained on ``df`` itself
    (in-domain perplexity — no OOV by construction). Pass a
    ``train_unigram_lm`` result to score a foreign corpus under a clean
    reference model (the CCNet setup); unseen tokens take the model's
    smoothed OOV mass.

    Returns (id, n_tokens, log_ppl, ppl). Plan: one explode, one join of
    the token stream against the vocab-sized model (AQE broadcasts it
    when it fits; OOV via left join + coalesce so no token is dropped),
    one per-doc aggregation — two shuffles total at any corpus size, all
    codegen."""
    toks = df.select(F.col(id_col).alias("_id"),
                     F.explode(tokens_col(F.col(text_col))).alias("term"))
    if lm is None:
        lm = train_unigram_lm(df, text_col=text_col, smoothing=None)
    probs = lm["probs"]
    if lm.get("oov_logp") is None:
        joined = toks.join(probs, "term")
    else:
        joined = toks.join(probs, "term", "left").withColumn(
            "logp", F.coalesce(F.col("logp"), F.lit(float(lm["oov_logp"]))))
    agg = joined.groupBy("_id").agg(
        F.count("*").alias("n_tokens"), F.avg("logp").alias("_mlp"))
    return agg.select(F.col("_id").alias(id_col), "n_tokens",
                      (-F.col("_mlp")).alias("log_ppl"),
                      F.exp(-F.col("_mlp")).alias("ppl"))


def train_bigram_lm(df: DataFrame, text_col: str = "text",
                    alpha: float = 0.4) -> dict:
    """Bigram LM with STUPID BACKOFF (Brants et al. 2007, "Large Language
    Models in Machine Translation") — the web-scale n-gram smoothing:
    relative frequencies with a fixed backoff factor and NO normalization
    pass, which is what makes it trainable as two hash aggregations at
    any corpus size:

        S(w | v) = c(v, w) / c(v)          when the bigram was seen
                 = alpha · S1(w)           otherwise
        S1(w)    = (c(w) + 1) / (N + V)    (add-one unigram base, so OOV
                                            scores the shared 1/(N+V))

    ``c(v)`` is the CONTEXT count (occurrences of v with a following
    token), so every seen bigram's score is a true relative frequency.
    Scores are not probabilities (the Stupid Backoff point) — the scorer
    reports the score-perplexity exp(−mean log S), monotone with the
    real thing and just as good a quality filter.

    Returns {"bigrams": DataFrame[v, w, logs], "unigrams":
    DataFrame[term, logp], "oov_logp": float, "alpha": alpha,
    "n_tokens": N, "vocab": V}."""
    import math

    a = float(alpha)
    if not 0.0 < a <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    t = df.select(tokens_col(F.col(text_col)).alias("_w")) \
        .filter(F.size("_w") > 0)
    # adjacent pairs from the materialized token array (zip_with over
    # shifted slices — arguments evaluate once per row, the HOF contract)
    sz1 = F.greatest(F.size("_w") - F.lit(1), F.lit(0))
    pairs = t.select(F.explode(F.zip_with(
        F.slice("_w", F.lit(1), sz1), F.slice("_w", F.lit(2), sz1),
        lambda v, w: F.struct(v.alias("v"), w.alias("w")))).alias("p")) \
        .select("p.v", "p.w")
    big = pairs.groupBy("v", "w").agg(F.count("*").alias("c")) \
        .localCheckpoint(eager=False)
    ctx = big.groupBy("v").agg(F.sum("c").alias("cv"))
    uni = (t.select(F.explode("_w").alias("term"))
           .groupBy("term").agg(F.count("*").alias("c"))
           .localCheckpoint(eager=False))
    row = uni.agg(F.sum("c").alias("n"), F.count("*").alias("v")).collect()[0]
    n, v = int(row["n"] or 0), int(row["v"] or 0)
    unigrams = uni.select("term", F.log((F.col("c") + F.lit(1.0))
                                        / F.lit(float(n + v))).alias("logp"))
    bigrams = (big.join(ctx, "v")
               .select("v", "w",
                       F.log(F.col("c") / F.col("cv")).alias("logs")))
    return {"bigrams": bigrams.localCheckpoint(eager=False),
            "unigrams": unigrams.localCheckpoint(eager=False),
            "oov_logp": math.log(1.0 / (n + v)) if n + v else 0.0,
            "alpha": a, "n_tokens": n, "vocab": v}


def bigram_lm_perplexity(df: DataFrame, lm: "dict | None" = None,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Per-document Stupid-Backoff score-perplexity
    (see ``train_bigram_lm``): exp(−mean log S) with the first token
    scored by the unigram base and every later token by its bigram score
    (backing off to alpha·S1 on unseen bigrams, OOV at the shared
    add-one floor). Fluent in-domain text scores low; shuffled or
    garbage text loses its bigram hits and pays the backoff penalty —
    the signal a unigram model can't see.

    ``lm=None`` self-scores (trains on ``df``). Returns
    (id, n_tokens, log_ppl, ppl). Plan: one pair-explode, TWO
    model-sized left joins (bigram table on (v, w), unigram on w — AQE
    broadcasts when they fit), one per-doc aggregation."""
    import math

    if lm is None:
        lm = train_bigram_lm(df, text_col=text_col)
    a, oov = float(lm["alpha"]), float(lm["oov_logp"])
    t = df.select(F.col(id_col).alias("_id"),
                  tokens_col(F.col(text_col)).alias("_w")) \
        .filter(F.size("_w") > 0)
    sz1 = F.greatest(F.size("_w") - F.lit(1), F.lit(0))
    prevs = F.concat(F.array(F.lit(None).cast("string")),
                     F.slice("_w", F.lit(1), sz1))
    pairs = t.select("_id", F.explode(F.zip_with(
        prevs, F.col("_w"),
        lambda v, w: F.struct(v.alias("v"), w.alias("w")))).alias("p")) \
        .select("_id", "p.v", "p.w")
    joined = (pairs
              .join(lm["bigrams"].withColumnRenamed("logs", "_lb"),
                    ["v", "w"], "left")
              .join(lm["unigrams"].select(F.col("term").alias("w"),
                                          F.col("logp").alias("_lu")),
                    "w", "left")
              .withColumn("_u", F.coalesce(F.col("_lu"), F.lit(oov)))
              .withColumn("_s", F.when(F.col("v").isNull(), F.col("_u"))
                          .otherwise(F.coalesce(
                              F.col("_lb"),
                              F.lit(math.log(a)) + F.col("_u")))))
    agg = joined.groupBy("_id").agg(
        F.count("*").alias("n_tokens"), F.avg("_s").alias("_mls"))
    return agg.select(F.col("_id").alias(id_col), "n_tokens",
                      (-F.col("_mls")).alias("log_ppl"),
                      F.exp(-F.col("_mls")).alias("ppl"))


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic document fingerprint: md5 of whitespace-normalized,
    lowercased text — the exact-dedup key at corpus scale."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.select(F.col(id_col), F.md5(norm).alias("fp"))


def winnow_fingerprints(df: DataFrame, k: int = 5, w: int = 4,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003,
    the MOSS algorithm — public): token k-gram hashes, then from every
    window of ``w`` consecutive hashes keep the minimum (RIGHTMOST on
    ties, the paper's robust-winnowing rule). Guarantees: any shared run
    of ≥ w+k-1 tokens between two docs shares ≥1 selected fingerprint,
    and density ≈ 2/(w+1) — the standard partial-overlap / plagiarism
    dedup key where ``fingerprint`` (whole-doc md5) only catches exact
    copies.

    Pure-codegen plan: tokenize once per row, hash each k-gram (first 8
    md5 hex digits as int64 — cross-engine reproducible, unlike
    xxhash64), window-min via higher-order array functions, explode the
    DISTINCT selections. No shuffle until the caller aggregates; arrays
    pass between lambdas as materialized columns (never re-evaluated per
    element). Output: (id_col, pos, fp) — one row per selected
    fingerprint, pos = 0-based k-gram position. A doc shorter than
    k+w-1 tokens contributes the min over whatever full k-grams it has
    (single window), matching the paper's boundary behavior."""
    toks = tokens_col(F.col(text_col))
    d = df.select(F.col(id_col), toks.alias("_t")) \
        .filter(F.size("_t") >= k)
    grams = F.transform(
        F.sequence(F.lit(0), F.size("_t") - k),
        lambda i: F.concat_ws(" ", F.slice("_t", i + 1, F.lit(k))))
    d = d.select(id_col, grams.alias("_g"))
    hashes = F.transform(
        "_g", lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10)
        .cast("long"))
    d = d.select(id_col, hashes.alias("_h"))
    # robust winnowing: window p covers hashes[p .. p+w-1]; pick the min,
    # rightmost occurrence on ties -> global pos = p + w - idx_in_reversed
    n_win = F.greatest(F.size("_h") - w, F.lit(0))
    sel = F.transform(
        F.sequence(F.lit(0), n_win),
        lambda p: F.struct(
            (p + F.least(F.size("_h") - p, F.lit(w))
             - F.array_position(
                 F.reverse(F.slice("_h", p + 1, F.lit(w))),
                 F.array_min(F.slice("_h", p + 1, F.lit(w))))
             ).cast("long").alias("pos"),
            F.array_min(F.slice("_h", p + 1, F.lit(w))).alias("fp")))
    return (d.select(id_col, F.explode(sel).alias("_s"))
            .select(id_col, F.col("_s.pos").alias("pos"),
                    F.col("_s.fp").alias("fp"))
            .distinct())


def corpus_profile(df: DataFrame, by: "str | list[str]" = "lang",
                   text_col: str = "text") -> DataFrame:
    """Per-stratum corpus profile: doc/token/char totals and the exact
    token-count distribution (mean, p50/p90/p99) — the standard
    profiling pass before building a training mixture (token budgets per
    language/source come straight out of this table).

    Percentiles are EXACT (Spark's ``percentile``, linear interpolation —
    the distribution fits because it aggregates per stratum, not per
    corpus). Plan: one projection + one hash aggregation keyed by the
    stratum columns; output is |strata| rows. At 100 TB the exact
    percentile holds because each group's sketch state is the aggregated
    counts-by-value map, not the row stream — for pathological strata
    with millions of DISTINCT lengths swap in ``percentile_approx``.
    """
    keys = [by] if isinstance(by, str) else list(by)
    base = df.select(*keys, token_count(F.col(text_col)).alias("n_tokens"),
                     F.length(F.col(text_col)).alias("n_chars"))
    pct = F.expr("percentile(n_tokens, array(0.5, 0.9, 0.99))")
    return (base.groupBy(*keys)
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").alias("total_tokens"),
                 F.sum("n_chars").alias("total_chars"),
                 F.avg("n_tokens").alias("mean_tokens"),
                 pct.alias("_p"))
            .select(*keys, "n_docs", "total_tokens", "total_chars",
                    "mean_tokens",
                    F.col("_p")[0].alias("p50_tokens"),
                    F.col("_p")[1].alias("p90_tokens"),
                    F.col("_p")[2].alias("p99_tokens")))
