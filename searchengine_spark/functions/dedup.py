"""Deduplication operators for training-data pipelines.

Exact (hash-groupBy), n-gram Jaccard near-dup, MinHash+LSH, and SimHash —
each designed around ONE well-understood shuffle:

- exact: groupBy(fingerprint) — min-id winner per group; at 100 TB the
  fingerprint groupBy is the only shuffle and AQE handles skew.
- jaccard: shingle explode → pair-join *bucketed by shared shingle* — never
  an all-pairs cross join; hot shingles are capped (df ceiling) exactly like
  hot terms in the index build.
- minhash LSH: per-doc signature via deterministic affine hashes over JVM
  ``xxhash64`` (pure codegen, no Python), banded into buckets; candidate
  pairs only within a bucket.
- simhash: 64-bit signature from token hashes; near-dups = equal signatures
  (or equal on rotated bands for hamming<k).

All hash functions are seeded constants — no runtime randomness.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from searchengine_spark.functions.text import tokens_col

_MERSENNE = (1 << 61) - 1


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative per identical normalized text.
    Returns (doc_id, fp, group_size)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    withfp = df.select(F.col(id_col), F.md5(norm).alias("fp"))
    return (withfp.groupBy("fp")
            .agg(F.min(id_col).alias(id_col), F.count("*").alias("group_size"))
            .select(id_col, "fp", "group_size"))


def shingles_col(text, n: int = 3):
    """Word n-gram shingles as strings (distinct per doc).

    Built by zip_with-ing n shifted views of the token array: the lambdas
    only touch scalar elements, so the tokenizer runs O(n) times per ROW.
    (The obvious transform(sequence(...), i -> concat_ws(slice(toks, i+1, n)))
    re-evaluates the captured ``toks`` expression — regexp + split over the
    full text — once per shingle INDEX: O(|tokens|·|text|) per row, measured
    10 s vs 1 s for one pass over 5k docs at sf0.1.)

    Trailing windows shorter than n null out via F.concat's null propagation
    and are filtered, so docs with < n tokens yield an empty array."""
    toks = tokens_col(text)
    acc = toks
    for j in range(1, n):
        shifted = F.slice(toks, j + 1, F.greatest(F.size(toks) - j, F.lit(1)))
        acc = F.zip_with(acc, shifted, lambda x, y: F.concat(x, F.lit(" "), y))
    return F.array_distinct(F.filter(acc, lambda s: s.isNotNull()))


def jaccard_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  n: int = 3, threshold: float = 0.8,
                  max_shingle_df: int = 1000) -> DataFrame:
    """Near-dup pairs by n-gram Jaccard ≥ threshold.

    Join strategy: explode shingles → self-join on shingle (co-partitioned by
    shingle, never all-pairs) → per-pair intersection count → Jaccard via
    |A|+|B|-inter. Shingles above ``max_shingle_df`` are dropped from pairing
    (stopword-shingle skew guard); exact dedup should run first.
    """
    base = df.select(F.col(id_col).alias("id"), shingles_col(F.col(text_col), n).alias("sh"))
    sizes = base.select("id", F.size("sh").alias("n_sh"))
    ex = base.select("id", F.explode("sh").alias("shingle"))
    hot = ex.groupBy("shingle").count().filter(F.col("count") > max_shingle_df).select("shingle")
    ex = ex.join(F.broadcast(hot), "shingle", "left_anti")
    pairs = (ex.alias("a").join(ex.alias("b"), "shingle")
             .filter(F.col("a.id") < F.col("b.id"))
             .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
             .agg(F.count("*").alias("inter")))
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    out = (pairs.join(sa, "id_a").join(sb, "id_b")
           .withColumn("jaccard", F.round(
               F.col("inter").cast("double")
               / (F.col("n_a") + F.col("n_b") - F.col("inter")), 6))
           .filter(F.col("jaccard") >= threshold))
    return out.select("id_a", "id_b", "inter", "jaccard")


def winnow_neardup_pairs(df: DataFrame, k: int = 5, w: int = 4,
                         min_shared: int = 10,
                         max_fp_df: "int | None" = 1000,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs by SHARED WINNOWING FINGERPRINTS (the MOSS match
    step over ``text.winnow_fingerprints``): docs a<b sharing ≥
    ``min_shared`` distinct selected fingerprints. Complements Jaccard
    (whole-set similarity) with LOCAL overlap detection — any copied run
    of ≥ w+k-1 tokens contributes fingerprints, so partial plagiarism /
    quoted-passage reuse surfaces even when global similarity is low.

    Join strategy mirrors ``jaccard_pairs``: join ON fingerprint
    (co-partitioned by fp, never all-pairs); fingerprints appearing in
    more than ``max_fp_df`` docs are dropped from pairing (boilerplate
    guard — a site-wide footer's fingerprints would otherwise create
    quadratic pairs; documented recall bound, exact dedup runs first).
    Output: (id_a, id_b, shared)."""
    from searchengine_spark.functions.text import winnow_fingerprints
    sel = (winnow_fingerprints(df, k=k, w=w, text_col=text_col,
                               id_col=id_col)
           .select(F.col(id_col).alias("id"), "fp").distinct())
    if max_fp_df is not None:
        hot = (sel.groupBy("fp").count()
               .filter(F.col("count") > max_fp_df).select("fp"))
        sel = sel.join(F.broadcast(hot), "fp", "left_anti")
    return (sel.alias("a").join(sel.alias("b"), "fp")
            .filter(F.col("a.id") < F.col("b.id"))
            .groupBy(F.col("a.id").alias("id_a"),
                     F.col("b.id").alias("id_b"))
            .agg(F.count("*").alias("shared"))
            .filter(F.col("shared") >= min_shared))


def _affine_params(n_hashes: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Seeded affine-family params sized so (a*h32 + b) fits SIGNED 64-bit:
    a < 2^30, h32 < 2^32 → a*h < 2^62; b < M ~2^61 → sum < 2^63."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 30, size=n_hashes, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=n_hashes, dtype=np.int64)
    return a, b


def minhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       n_hashes: int = 64, shingle_n: int = 3) -> DataFrame:
    """MinHash signature per doc: min over shingles of (a_i*h(s)+b_i) mod M.

    Entirely JVM-side (r1 VERDICT finding 3 killed the per-char Python FNV):
    explode shingles → ``xxhash64`` masked to 32 bits → ALL n_hashes affine
    minima in ONE partial+final hash aggregate (map-side combine, one
    shuffle, whole-stage codegen — no Python worker at any stage). Empty
    docs get the all-zero signature. Returns (doc_id, sig array<long>).
    """
    a, b = _affine_params(n_hashes)
    # Project the base hash ONCE before the aggregate: inlining xxhash64 in
    # each of the n_hashes min-expressions re-evaluates it per family per row
    # (no CSE across aggregate expressions) — measured ~40% of the r2
    # signature-stage regression. Null shingle (empty doc) → null h32 →
    # every family coalesces to 0 (the all-zero signature).
    ex = df.select(
        F.col(id_col),
        F.explode_outer(shingles_col(F.col(text_col), shingle_n)).alias("sh"))
    # xxhash64 skips null inputs (returns the seed hash), so null-ness must
    # be made explicit here for the coalesce-to-0 path to see it
    ex = ex.select(
        id_col,
        F.when(F.col("sh").isNull(), F.lit(None).cast("long"))
        .otherwise(F.xxhash64("sh").bitwiseAND(F.lit((1 << 32) - 1)))
        .alias("h32"))
    aggs = [
        F.min(F.coalesce((F.col("h32") * int(a[i]) + int(b[i])) % F.lit(_MERSENNE),
                         F.lit(0).cast("long"))).alias(f"_m{i}")
        for i in range(n_hashes)]
    mins = ex.groupBy(id_col).agg(*aggs)
    return mins.select(
        F.col(id_col), F.array(*[f"_m{i}" for i in range(n_hashes)]).alias("sig"))


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      n_hashes: int = 64, bands: int = 16, shingle_n: int = 3) -> DataFrame:
    """LSH candidate pairs: split signatures into bands, bucket-join on
    (band_id, band_hash). Returns distinct candidate (id_a, id_b)."""
    assert n_hashes % bands == 0
    rows_per_band = n_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, n_hashes, shingle_n)
    band_idx = F.sequence(F.lit(0), F.lit(bands - 1))
    # band fan-out in ONE projection (no self-join back on id): sig is
    # already in hand, so explode the band index next to it and slice
    banded = sigs.select(
        F.col(id_col).alias("id"), "sig",
        F.explode(band_idx).alias("band"))
    banded = banded.withColumn(
        "band_key", F.md5(F.concat_ws(",", F.slice(
            F.col("sig"), F.col("band") * rows_per_band + 1, rows_per_band).cast("array<string>"))))
    buckets = banded.select("id", "band", "band_key")
    pairs = (buckets.alias("a").join(buckets.alias("b"), ["band", "band_key"])
             .filter(F.col("a.id") < F.col("b.id"))
             .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
             .distinct())
    return pairs


SMALL_CC_MAX = 200_000  # edge count below which CC runs driver-side


def connected_components(pairs: DataFrame, a_col: str = "id_a",
                         b_col: str = "id_b", max_iter: int = 20,
                         small_max: int = SMALL_CC_MAX) -> DataFrame:
    """Dedup clusters from near-dup pairs: connected components by min-label
    propagation. Returns (id, rep) — rep is the smallest id in the
    component — for every id that appears in at least one pair.

    Each iteration is one join + one groupBy(min) over (edge, label) rows —
    standard large-scale CC (converges in O(component diameter) rounds;
    near-dup components are shallow). Iteration stops early when a round
    changes nothing (one small count action per round). Pair order is
    irrelevant; edges are symmetrized internally.

    Small edge sets (≤ ``small_max`` distinct directed edges — known from
    the one count the loop needs anyway) short-circuit to a driver-side
    union-find: near-dup graphs are usually tiny relative to the corpus,
    and ~5 Spark rounds of fixed job overhead dwarf a bounded collect.
    The distributed loop is the ≥100M-edge path; both return identical
    (id, min-rep) labels.
    """
    edges = pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    edges = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    # iterative plans must truncate lineage each round (localCheckpoint):
    # chaining 20 join+agg rounds into one logical plan blows up the
    # optimizer and recomputes the pair source per round
    edges = edges.localCheckpoint(eager=True)
    if edges.count() <= small_max:
        rows = edges.collect()
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = r, parent[x]
            return r

        for e in rows:
            ra, rb = find(e["a"]), find(e["b"])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        out = sorted({i for e in rows for i in (e["a"], e["b"])})
        spark = pairs.sparkSession
        t = dict(pairs.dtypes)[a_col]
        return spark.createDataFrame([(i, find(i)) for i in out],
                                     f"id {t}, rep {t}")
    labels = (edges.select(F.col("a").alias("id")).distinct()
              .withColumn("rep", F.col("id")).localCheckpoint(eager=True))
    for _ in range(max_iter):
        prop = (edges.join(labels.withColumnRenamed("id", "a"), "a")
                .select(F.col("b").alias("id"), "rep")
                .unionByName(labels)
                .groupBy("id").agg(F.min("rep").alias("rep"))
                .localCheckpoint(eager=True))
        n_changed = (prop.join(labels.withColumnRenamed("rep", "_old"), "id")
                     .filter(F.col("rep") != F.col("_old")).count())
        labels = prop
        if n_changed == 0:
            break
    else:  # labels were still moving in the final round — surface it
        import warnings
        warnings.warn(
            f"connected_components did not converge in {max_iter} rounds "
            f"({n_changed} labels still changing) — components with "
            f"diameter > {max_iter} may carry non-minimal reps; raise "
            "max_iter", RuntimeWarning, stacklevel=2)
    return labels.select("id", "rep")


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per doc from token hashes — entirely JVM-side.

    explode tokens → ``xxhash64`` → 64 per-bit majority sums in one
    partial+final hash aggregate, signature reassembled with shiftleft/OR
    (whole-stage codegen; no Python worker — r1 VERDICT finding 3).
    Bit j set iff ≥ half the token hashes have bit j set (ties → 1, same as
    the previous numpy formulation). Empty docs hash to 0.
    """
    ex = df.select(F.col(id_col),
                   F.explode_outer(tokens_col(F.col(text_col))).alias("tok"))
    # project the token hash ONCE — inlined in all 64 bit-sum expressions it
    # is re-evaluated per bit per row (no CSE across aggregate expressions)
    ex = ex.select(
        id_col,
        F.when(F.col("tok").isNull(), F.lit(None).cast("long"))
        .otherwise(F.xxhash64("tok")).alias("h"))
    bit_sums = [
        F.sum(F.shiftrightunsigned(F.col("h"), j).bitwiseAND(F.lit(1).cast("long"))).alias(f"_b{j}")
        for j in range(64)]
    agg = ex.groupBy(id_col).agg(F.count("h").alias("_n"), *bit_sums)
    sig = None
    for j in range(64):
        bit = (F.when(F.col(f"_b{j}") * 2 >= F.col("_n"),
                      F.shiftleft(F.lit(1).cast("long"), j))
               .otherwise(F.lit(0).cast("long")))
        sig = bit if sig is None else sig.bitwiseOR(bit)
    sig = F.when(F.col("_n") == 0, F.lit(0).cast("long")).otherwise(sig)
    return agg.select(F.col(id_col), sig.alias("simhash"))


def dedup_keep_canonical(df: DataFrame, clusters: DataFrame,
                         id_col: str = "doc_id",
                         keep: str = "rep",
                         text_col: str = "text") -> DataFrame:
    """Materialize the deduplicated corpus: given near-dup ``clusters``
    ((id, rep) from ``connected_components``), keep exactly ONE doc per
    component plus every doc that appears in no component. The final
    step of the dedup pipeline (pairs → clusters → deduped table).

    ``keep="rep"`` (default) keeps the representative (smallest id, the
    deterministic canonical). ``keep="longest"`` keeps each component's
    member with the MOST tokens (ties → smallest id) — the standard
    quality choice when near-dup clusters contain truncated copies of
    the same document; costs one component-set-sized join to the docs
    for the token count plus one narrow per-component max_by.

    One broadcast-or-shuffle anti-join against the victim ids either
    way: no per-row Python, no window over data; at 100 TB the
    components set is the only thing shuffled (a small fraction of the
    corpus) and surviving rows stream straight through. Returns ``df``'s
    full rows filtered; row order is whatever the source scan yields."""
    if keep == "rep":
        victims = clusters.filter(F.col("id") != F.col("rep")) \
            .select(F.col("id").alias(id_col))
    elif keep == "longest":
        from searchengine_spark.functions.text import token_count
        lens = df.select(F.col(id_col).alias("id"),
                         token_count(F.col(text_col)).alias("_n"))
        keepers = (clusters.join(lens, "id")
                   .groupBy("rep")
                   .agg(F.max_by(F.col("id"),
                                 F.struct(F.col("_n"), -F.col("id")))
                        .alias("_keep")))
        victims = (clusters.join(keepers, "rep")
                   .filter(F.col("id") != F.col("_keep"))
                   .select(F.col("id").alias(id_col)))
    else:
        raise ValueError("keep must be 'rep' or 'longest'")
    return df.join(victims, id_col, "left_anti")


def contamination_check(df: DataFrame, benchmark: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 3, threshold: float = 0.1) -> DataFrame:
    """Benchmark decontamination: flag training docs whose word n-gram
    shingles overlap an evaluation set (the GPT-3/Pile decontamination
    pass — a training corpus must not contain eval items verbatim or
    near-verbatim). For each doc: distinct-shingle count, count of
    shingles also present anywhere in ``benchmark``, the overlap
    fraction, and a flag at ``threshold``.

    Plan shape: the benchmark side is an EVAL SET — megabytes by nature,
    never corpus-sized — so its distinct shingles broadcast; the corpus
    side streams through one broadcast-hash semi-join with NO shuffle on
    the (100 TB) doc side except the per-doc groupBy(id). Docs with
    fewer than ``n`` tokens have no shingles and report 0/0/0.0/false.
    """
    doc_sh = df.select(
        F.col(id_col),
        F.explode_outer(shingles_col(F.col(text_col), n)).alias("shingle"))
    bench_sh = (benchmark
                .select(F.explode(shingles_col(F.col(text_col), n))
                        .alias("shingle"))
                .distinct())
    per_doc = (doc_sh.join(F.broadcast(bench_sh.withColumn("_hit", F.lit(1))),
                           "shingle", "left")
               .groupBy(id_col)
               .agg(F.count("shingle").alias("n_shingles"),
                    F.count("_hit").alias("n_overlap")))
    frac = F.when(F.col("n_shingles") > 0,
                  F.col("n_overlap") / F.col("n_shingles")).otherwise(F.lit(0.0))
    return (per_doc
            .withColumn("overlap_frac", F.round(frac, 6))
            .withColumn("contaminated",
                        (F.col("overlap_frac") >= F.lit(float(threshold)))
                        .cast("int")))


def dedup_against(df: DataFrame, ref: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Cross-corpus exact dedup: drop rows of ``df`` whose normalized text
    already exists in ``ref`` — the new-crawl-vs-existing-corpus pass (a
    refresh crawl must not re-admit documents the corpus already holds;
    only the NEW side is filtered, the reference corpus is read-only).

    Same normalization as ``exact_dedup`` (lowercase, whitespace-collapsed,
    md5). One anti-join on the 16-byte fingerprint: the ref side reduces
    to distinct fingerprints first (its only shuffle), the new side
    streams through the join — no windows, no Python. Returns
    (id, fp) for every surviving new row.
    """
    def _fp(c):
        return F.md5(F.trim(F.regexp_replace(F.lower(F.col(c)), r"\s+", " ")))
    new_fp = df.select(F.col(id_col), _fp(text_col).alias("fp"))
    ref_fp = ref.select(_fp(text_col).alias("fp")).distinct()
    return new_fp.join(ref_fp, "fp", "left_anti").select(id_col, "fp")
