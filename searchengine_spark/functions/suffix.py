"""Suffix-array (prefix-doubling) exact-substring deduplication.

The corpus-scale formulation of ExactSubstr (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better"): find every
token span of length >= ``min_len`` that occurs at least twice across
the corpus and cut all occurrences except the first. The single-machine
reference builds one suffix array over the concatenated corpus; the
known distributed pattern is PREFIX DOUBLING — O(log L) rounds of
(shift-join + dense re-ranking), each a key-partitioned shuffle over
O(n) rows (Manber-Myers lifted onto a dataflow engine).

Why this beats the windowed relaxation (functions/text.py
``dedup_repeated_ngrams``) at 100 TB: the windowed op materializes a
length-``window`` string hash PER TOKEN POSITION — O(n·L) hashing work
and bytes through the first shuffle (window=50 → 50× write
amplification). Here every round carries exactly one integer rank per
position: O(n log L) total work, O(n) bytes per shuffle, and exact
equality (integer ranks, no hash-collision caveat).

Equality argument (why ranks at ONE power of two suffice): after the
doubling rounds, rank_P(i) is an injective id of the exact P-token
sequence starting at i (P = largest power of two <= min_len). Two
positions start identical ``min_len``-windows iff

    rank_P(i) == rank_P(j)  AND  rank_P(i+L-P) == rank_P(j+L-P)

— the two P-spans [i, i+P) and [i+L-P, i+L) overlap and cover the whole
window, so the pair (rank_P(i), rank_P(i+L-P)) IS the window's identity.
Detection is then one hash aggregation on that pair, exactly the
windowed op's shape but with 16 bytes per position instead of L tokens.

Doc boundaries: only window starts with the full window inside their
document are candidates, and both P-spans of a candidate lie inside the
window — so ranks computed over the concatenated stream can never
declare a cross-document match. Positions past the stream end rank as
-1 (shorter-suffix sentinel), the standard Manber-Myers convention.

Output contract is IDENTICAL to ``dedup_repeated_ngrams(window=min_len,
min_occurrences)`` — same covered tokens (a duplicated span >= L is
covered by its duplicated L-windows and vice versa), same first-
occurrence rule (min (doc_id, pos)), same whitespace-normalized
reassembly — which the parity pytest asserts row for row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from searchengine_spark.operators.indexer import assign_dense_ids

__all__ = ["dedup_exact_substr", "suffix_window_ranks"]


def _dense_group_ids(df: DataFrame, cols: list[str],
                     out: str) -> DataFrame:
    """Deterministic injective id per distinct combination of ``cols``
    (the doubling re-rank). Rank ORDER is irrelevant for equality
    detection, so any stable 1:1 mapping works; ids come from the
    three-level prefix-sum assigner (no single-partition window)."""
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
    distinct = df.select(*cols).distinct().withColumn("_k", key)
    return assign_dense_ids(distinct, "_k", ["_k"], out).drop("_k")


def suffix_window_ranks(base: DataFrame, min_len: int) -> DataFrame:
    """Prefix-doubling ranks over the concatenated token stream of
    ``base`` (``_id``, ``_w`` token array, ``_n`` size), returning one
    row per in-document window start:
    (_id, pos, ra, rb) where (ra, rb) is the injective identity of the
    exact ``min_len``-token window at (_id, pos).

    log2(P) doubling rounds, P = largest power of two <= min_len; each
    round is one shift-join plus one dense re-rank, all O(n) rows."""
    if min_len < 1:
        raise ValueError("min_len must be >= 1")
    p = 1
    while p * 2 <= min_len:
        p *= 2
    # global positions: contiguous per-doc blocks at deterministic
    # offsets (block ORDER is irrelevant — only within-doc contiguity
    # matters, and windows never cross docs)
    key = F.lpad(F.col("_id").cast("string"), 18, "0")  # zero-padded: the
    # prefix-sum assigner requires a string key (offset ORDER is anyway
    # irrelevant here — only per-doc contiguity matters)
    sizes = base.select(key.alias("_sk"), F.col("_id"),
                        F.col("_n").alias("count"))
    from searchengine_spark.operators.indexer import _prefix_sum_offsets
    offs = (_prefix_sum_offsets(sizes.select("_sk", "count"),
                                "_sk", "count", "_off")
            .join(sizes.select("_sk", "_id"), "_sk").drop("_sk"))
    toks = (base.join(offs, "_id")
            .select("_id", "_off", F.posexplode("_w").alias("pos", "tok"))
            .withColumn("gpos", F.col("_off") + F.col("pos"))
            .drop("_off"))
    # rank_1: injective id of the single token
    t_ids = _dense_group_ids(toks, ["tok"], "_gid")
    cur = (toks.join(t_ids, "tok")
           .select("gpos", F.col("_gid").alias("r"))
           .localCheckpoint(eager=False))
    step = 1
    while step < p:
        shifted = cur.select((F.col("gpos") - step).alias("gpos"),
                             F.col("r").alias("r2"))
        paired = (cur.join(shifted, "gpos", "left")
                  .select("gpos", "r",
                          F.coalesce("r2", F.lit(-1)).alias("r2")))
        ids = _dense_group_ids(paired, ["r", "r2"], "_gid")
        cur = (paired.join(ids, ["r", "r2"])
               .select("gpos", F.col("_gid").alias("r"))
               .localCheckpoint(eager=False))  # truncate per-round lineage
        step *= 2
    # window identity = ranks at the two overlapping P-spans; candidate
    # starts are the positions whose full window fits inside their doc
    starts = (base.join(offs, "_id")
              .select("_id", "_off",
                      F.explode(F.sequence(
                          F.lit(0), F.col("_n") - F.lit(min_len))).alias("pos"))
              .withColumn("gpos", F.col("_off") + F.col("pos")))
    ra = cur.select(F.col("gpos"), F.col("r").alias("ra"))
    rb = cur.select((F.col("gpos") - F.lit(min_len - p)).alias("gpos"),
                    F.col("r").alias("rb"))
    return (starts.join(ra, "gpos").join(rb, "gpos")
            .select("_id", "pos", "ra", "rb"))


def dedup_exact_substr(df: DataFrame, min_len: int = 50,
                       min_occurrences: int = 2,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Corpus-wide exact-substring dedup via prefix-doubling suffix
    ranks: every ``min_len``-token span occurring >= ``min_occurrences``
    times is removed from all occurrences except the first (min
    (doc_id, pos)); surviving tokens rejoin with single spaces. Returns
    (id, text, n_removed) — row-identical to ``dedup_repeated_ngrams``
    with ``window=min_len`` (module docstring), at O(n log L) work
    instead of O(n·L).

    Docs shorter than ``min_len`` tokens pass through; a fully-covered
    doc returns ``text = ''``."""
    words = F.filter(F.split(F.col(text_col), r"\s+"),
                     lambda w: w != F.lit(""))
    base = (df.select(F.col(id_col).alias("_id"), words.alias("_w"))
            .withColumn("_n", F.size("_w"))
            .filter(F.col("_n") > 0)
            .localCheckpoint(eager=False))  # read once, used by 3 stages
    occ = suffix_window_ranks(base.filter(F.col("_n") >= min_len), min_len)
    dup = (occ.groupBy("ra", "rb")
           .agg(F.count("*").alias("_c"),
                F.min(F.struct(F.col("_id"), F.col("pos"))).alias("_first"))
           .filter(F.col("_c") >= min_occurrences)
           .select("ra", "rb", "_first"))
    cut = (occ.join(dup, ["ra", "rb"])
           .filter(~((F.col("_id") == F.col("_first._id"))
                     & (F.col("pos") == F.col("_first.pos")))))
    cutpos = (cut.select(
        "_id", F.explode(F.sequence(
            F.col("pos"),
            F.col("pos") + F.lit(min_len - 1))).alias("tokpos"))
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
