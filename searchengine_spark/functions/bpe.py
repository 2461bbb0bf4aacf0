"""Byte-pair-encoding merge training + subword encoding.

The LEARNED half of the tokenizer story (``functions/text.py``'s
``token_count_bpe`` counts with a fixed BPE-ish regex;
``functions/vocab.py`` builds word-level id vocabularies): classic BPE
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units") learns a merge list from the corpus and encodes any
text into subwords from a closed symbol set.

Scale shape — the honest distributed formulation: BPE training operates
on the WORD-FREQUENCY DICTIONARY, not the token stream (the reference
implementation and SentencePiece both do this), so the corpus-scale
work is ONE hash aggregation (word → count); the merge loop then runs
driver-side over the ≤ ``max_words`` most frequent word types — the
same dictionary-fits-on-the-driver contract as the term cache, with the
cap making it explicit (SentencePiece trains on a sample the same way).
Encoding is an Arrow-batched pandas UDF applying merge RANKS with a
per-batch memo (each distinct word encodes once per batch) — the
standard greedy lowest-rank-first procedure.

Determinism: ties in pair frequency break on the lexicographically
smallest pair, word selection ties on the lexicographically smallest
word — byte-stable across runs, layouts, and engines (the committed
expected-merges oracle relies on this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from searchengine_spark.functions.text import tokens_col

__all__ = ["train_bpe", "bpe_merges_df", "bpe_encode"]

EOW = "</w>"  # end-of-word marker symbol (its own symbol, never merged away)


def _pair_stats(vocab: "dict[tuple, int]") -> dict:
    stats: dict = {}
    for sym, c in vocab.items():
        for i in range(len(sym) - 1):
            p = (sym[i], sym[i + 1])
            stats[p] = stats.get(p, 0) + c
    return stats


def _merge_vocab(vocab: "dict[tuple, int]", pair: tuple) -> dict:
    a, b = pair
    ab = a + b
    out: dict = {}
    for sym, c in vocab.items():
        i, ns = 0, []
        while i < len(sym):
            if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                ns.append(ab)
                i += 2
            else:
                ns.append(sym[i])
                i += 1
        out[tuple(ns)] = out.get(tuple(ns), 0) + c
    return out


def train_bpe(df: DataFrame, n_merges: int = 200, text_col: str = "text",
              weighting: str = "counts", max_words: int = 50_000) -> dict:
    """Learn a BPE merge list from the corpus (module docstring).

    ``weighting="counts"`` (default) weights each word type by its
    corpus frequency — the classic objective; ``"uniform"`` weights
    every type equally (vocabulary-level learning: the result depends
    only on the word SET, making it reproducible across corpus scales
    that share a vocabulary). ``max_words`` caps the driver-side
    dictionary at the most frequent types (count desc, word asc).

    Stops early when no pair occurs at least twice. Returns
    {"merges": [(left, right), ...] in rank order,
    "ranks": {(left, right): rank}, "n_words": int}."""
    if weighting not in ("counts", "uniform"):
        raise ValueError("weighting must be 'counts' or 'uniform'")
    words = (df.select(F.explode(tokens_col(F.col(text_col))).alias("w"))
             .groupBy("w").agg(F.count("*").alias("c"))
             .orderBy(F.col("c").desc(), F.col("w").asc())
             .limit(int(max_words)).collect())
    vocab: dict = {}
    for r in words:
        sym = tuple(list(r["w"]) + [EOW])
        vocab[sym] = vocab.get(sym, 0) + (int(r["c"])
                                          if weighting == "counts" else 1)
    merges: list = []
    for _ in range(int(n_merges)):
        stats = _pair_stats(vocab)
        if not stats:
            break
        bc = max(stats.values())
        if bc < 2:
            break
        # tie-break: highest count, then lexicographically smallest pair
        pair = min(p for p, c in stats.items() if c == bc)
        merges.append(pair)
        vocab = _merge_vocab(vocab, pair)
    return {"merges": merges,
            "ranks": {p: i for i, p in enumerate(merges)},
            "n_words": len(words)}


def bpe_merges_df(spark, model: dict) -> DataFrame:
    """The learned merge list as (rank int, left, right) — the exportable
    tokenizer artifact (and the oracle surface)."""
    rows = [(i, p[0], p[1]) for i, p in enumerate(model["merges"])]
    return spark.createDataFrame(rows, "rank int, left string, right string")


def _encode_word(word: str, ranks: dict) -> list:
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        a, b = sym[best_i], sym[best_i + 1]
        # merge EVERY occurrence of the chosen pair, left to right
        i, ns = 0, []
        while i < len(sym):
            if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                ns.append(a + b)
                i += 2
            else:
                ns.append(sym[i])
                i += 1
        sym = ns
    return sym


def bpe_encode(df: DataFrame, model: dict, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Encode each document into its BPE subword sequence:
    (id, subwords array<string>, n_subwords). Greedy lowest-rank-first
    merging (the standard BPE encoder), one Arrow-batched pandas UDF
    with a per-batch word memo — each distinct word in a batch encodes
    once. Unseen characters pass through as single-char symbols (open
    vocabulary, BPE's point)."""
    ranks = dict(model["ranks"])

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def enc(texts):
        import pandas as pd
        import re
        memo: dict = {}
        out = []
        for t in texts:
            toks = [w for w in
                    re.sub(r"[^a-z0-9 ]", " ", (t or "").lower()).split()
                    if w]
            sub: list = []
            for w in toks:
                if w not in memo:
                    memo[w] = _encode_word(w, ranks)
                sub.extend(memo[w])
            out.append(sub)
        return pd.Series(out)

    return (df.select(F.col(id_col), enc(F.col(text_col)).alias("subwords"))
            .withColumn("n_subwords", F.size("subwords")))
