"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k vs a query vector — pure
  built-ins (F.zip_with dot product in whole-stage codegen), the correctness
  baseline. Distributed top-k via TakeOrderedAndProject; at 100 TB this is
  one scan, no shuffle.
- ``lsh_bucket_topk``: random-hyperplane LSH scale path — sign-bucket the
  corpus once (seeded projection matrix, Arrow-batched numpy matmul), probe
  only the query's bucket (+ optional multi-probe neighbors). Approximate;
  returns the exact cosine within the probed buckets.
- ``ivf_topk``: IVF-style two-stage — coarse centroids (seeded kmeans-lite
  over a sample), search only the closest ``n_probe`` partitions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def cosine_col(vec_col, qvec: list[float]):
    q = F.array(*[F.lit(float(x)) for x in qvec])
    v = F.transform(vec_col, lambda x: x.cast("double"))
    qn = float(np.sqrt(np.dot(qvec, qvec)))
    return _dot(v, q) / (F.sqrt(_dot(v, v)) * F.lit(qn))


def cosine_topk(df: DataFrame, qvec: list[float], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact brute-force cosine top-k (the baseline every ANN variant is
    measured against). Rounded to 6 dp for deterministic ordering."""
    scored = df.select(F.col(id_col), F.round(cosine_col(F.col(vec_col), qvec), 6).alias("cos"))
    return scored.orderBy(F.col("cos").desc(), F.col(id_col).asc()).limit(k)


def _planes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    return np.random.RandomState(seed).normal(size=(dim, n_planes))


def lsh_bucket_ids(df: DataFrame, dim: int, n_planes: int = 12,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   seed: int = 42) -> DataFrame:
    """Random-hyperplane signature per vector (one numpy matmul per batch)."""
    planes = _planes(dim, n_planes, seed)

    @F.pandas_udf(T.IntegerType())
    def bucket(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy())
        signs = (mat @ planes) > 0
        return pd.Series((signs * (1 << np.arange(n_planes))).sum(axis=1).astype("int32"))

    return df.withColumn("bucket", bucket(F.col(vec_col)))


def lsh_bucket_topk(df: DataFrame, qvec: list[float], k: int = 10, n_planes: int = 12,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    multiprobe: int = 0, seed: int = 42) -> DataFrame:
    """Approximate top-k: probe the query's sign bucket (+ buckets at hamming
    distance ≤ multiprobe). Cosine within probed buckets is exact."""
    dim = len(qvec)
    planes = _planes(dim, n_planes, seed)
    qsig = int(((np.asarray(qvec) @ planes) > 0).dot(1 << np.arange(n_planes)))
    probes = {qsig}
    for r in range(multiprobe):
        probes |= {p ^ (1 << i) for p in list(probes) for i in range(n_planes)}
    bucketed = lsh_bucket_ids(df, dim, n_planes, vec_col, id_col, seed)
    cand = bucketed.filter(F.col("bucket").isin(sorted(probes)))
    return cosine_topk(cand, qvec, k, vec_col, id_col)


def cosine_neardup_pairs(df: DataFrame, threshold: float = 0.95,
                         vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ threshold).

    Exact all-pairs formulation: self-join (cross within the corpus) with the
    cosine in whole-stage codegen — the correctness baseline, quadratic, for
    modest slices. The scale path is ``lsh_neardup_pairs``: bucket once with
    random hyperplanes, compare only within buckets."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    va = F.transform(F.col("_va"), lambda x: x.cast("double"))
    vb = F.transform(F.col("_vb"), lambda x: x.cast("double"))
    cos = _dot(va, vb) / (F.sqrt(_dot(va, va)) * F.sqrt(_dot(vb, vb)))
    return (a.join(b, F.col("id_a") < F.col("id_b"))
            .withColumn("cos", F.round(cos, 6))
            .filter(F.col("cos") >= threshold)
            .select("id_a", "id_b", "cos"))


def lsh_neardup_pairs(df: DataFrame, dim: int, threshold: float = 0.95,
                      n_planes: int = 8, vec_col: str = "embedding",
                      id_col: str = "vec_id", seed: int = 42) -> DataFrame:
    """Near-dup pairs at scale: candidates = pairs sharing an LSH sign bucket
    (collision probability rises with cosine), verified with the exact
    cosine. Misses pairs split across buckets — recall tunes via n_planes /
    band repetition; the within-bucket join replaces the quadratic blowup
    with per-bucket quadratic cost."""
    bucketed = lsh_bucket_ids(df, dim, n_planes, vec_col, id_col, seed)
    a = bucketed.select("bucket", F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = bucketed.select("bucket", F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    va = F.transform(F.col("_va"), lambda x: x.cast("double"))
    vb = F.transform(F.col("_vb"), lambda x: x.cast("double"))
    cos = _dot(va, vb) / (F.sqrt(_dot(va, va)) * F.sqrt(_dot(vb, vb)))
    return (a.join(b, ["bucket"]).filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cos", F.round(cos, 6))
            .filter(F.col("cos") >= threshold)
            .select("id_a", "id_b", "cos").distinct())


def ivf_topk(df: DataFrame, qvec: list[float], k: int = 10, n_centroids: int = 16,
             n_probe: int = 2, vec_col: str = "embedding", id_col: str = "vec_id",
             seed: int = 42) -> DataFrame:
    """IVF: assign every vector to its nearest seeded-sample centroid
    (Arrow-batched argmax), search the n_probe centroids nearest the query.

    At scale the assignment is computed once at ingest and stored as a
    partition column, so a query scans n_probe/n_centroids of the data."""
    sample = df.select(vec_col).orderBy(F.col(id_col)).limit(n_centroids * 8).collect()
    mat = np.vstack([np.asarray(r[0], dtype=float) for r in sample])
    rng = np.random.RandomState(seed)
    cents = mat[rng.choice(len(mat), size=min(n_centroids, len(mat)), replace=False)]
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)

    @F.pandas_udf(T.IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy()).astype(float)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series((m @ cents.T).argmax(axis=1).astype("int32"))

    q = np.asarray(qvec, dtype=float)
    q = q / max(np.linalg.norm(q), 1e-12)
    probe_ids = np.argsort(-(cents @ q))[:n_probe].tolist()
    assigned = df.withColumn("centroid", assign(F.col(vec_col)))
    cand = assigned.filter(F.col("centroid").isin([int(i) for i in probe_ids]))
    return cosine_topk(cand, qvec, k, vec_col, id_col)
