"""Deduplication operators for training-data pipelines.

Exact (hash-groupBy), n-gram Jaccard near-dup, MinHash+LSH, and SimHash —
each designed around ONE well-understood shuffle:

- exact: groupBy(fingerprint) — min-id winner per group; at 100 TB the
  fingerprint groupBy is the only shuffle and AQE handles skew.
- jaccard: shingle explode → pair-join *bucketed by shared shingle* — never
  an all-pairs cross join; hot shingles are capped (df ceiling) exactly like
  hot terms in the index build.
- minhash LSH: per-doc signature via deterministic affine hashes (numpy,
  Arrow-batched), banded into buckets; candidate pairs only within a bucket.
- simhash: 64-bit signature from token hashes; near-dups = equal signatures
  (or equal on rotated bands for hamming<k).

All hash functions are seeded constants — no runtime randomness.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

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
    """Word n-gram shingles as strings (sorted-distinct per doc)."""
    toks = tokens_col(text)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return F.array_distinct(F.filter(sh, lambda s: F.size(F.split(s, " ")) >= n))


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


def _affine_params(n_hashes: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n_hashes, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=n_hashes, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       n_hashes: int = 64, shingle_n: int = 3) -> DataFrame:
    """MinHash signature per doc: min over shingles of (a_i*h(s)+b_i) mod M.

    Vectorized pandas UDF: the (shingles × hashes) min is one numpy matrix op
    per Arrow batch. Returns (doc_id, sig array<long>).
    """
    a, b = _affine_params(n_hashes)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig(sh_lists: pd.Series) -> pd.Series:
        out = []
        for lst in sh_lists:
            if lst is None or len(lst) == 0:
                out.append([0] * n_hashes)
                continue
            h = np.array([np.uint64(hash64(s)) for s in lst], dtype=np.uint64)
            vals = (h[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
            out.append(vals.min(axis=0).astype(np.int64).tolist())
        return pd.Series(out)

    return df.select(F.col(id_col), sig(shingles_col(F.col(text_col), shingle_n)).alias("sig"))


def hash64(s: str) -> int:
    """Deterministic 64-bit string hash (FNV-1a), seedless and portable."""
    h = 0xCBF29CE484222325
    for ch in s.encode("utf-8"):
        h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      n_hashes: int = 64, bands: int = 16, shingle_n: int = 3) -> DataFrame:
    """LSH candidate pairs: split signatures into bands, bucket-join on
    (band_id, band_hash). Returns distinct candidate (id_a, id_b)."""
    assert n_hashes % bands == 0
    rows_per_band = n_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, n_hashes, shingle_n)
    band_idx = F.sequence(F.lit(0), F.lit(bands - 1))
    banded = sigs.select(
        F.col(id_col).alias("id"),
        F.explode(band_idx).alias("band"),
    ).join(sigs.select(F.col(id_col).alias("id"), "sig"), "id")
    banded = banded.withColumn(
        "band_key", F.md5(F.concat_ws(",", F.slice(
            F.col("sig"), F.col("band") * rows_per_band + 1, rows_per_band).cast("array<string>"))))
    buckets = banded.select("id", "band", "band_key")
    pairs = (buckets.alias("a").join(buckets.alias("b"), ["band", "band_key"])
             .filter(F.col("a.id") < F.col("b.id"))
             .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
             .distinct())
    return pairs


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per doc from token FNV hashes (vectorized numpy)."""

    @F.pandas_udf(T.LongType())
    def sh(tok_lists: pd.Series) -> pd.Series:
        out = []
        for lst in tok_lists:
            if lst is None or len(lst) == 0:
                out.append(0)
                continue
            hs = np.array([hash64(t) for t in lst], dtype=np.uint64)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
            v = np.where(bits.sum(axis=0) * 2 >= len(hs), 1, 0).astype(np.uint64)
            out.append(int((v << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64).astype(np.int64)))
        return pd.Series(out, dtype="int64")

    return df.select(F.col(id_col), sh(tokens_col(F.col(text_col))).alias("simhash"))
