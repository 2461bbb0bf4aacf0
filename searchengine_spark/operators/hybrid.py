"""Hybrid retrieval: fuse lexical (BM25) and vector (embedding-cosine)
rankings into one result list.

No reference analog (srcCreate/searchEngine is lexical-only); this is the
standard modern-retrieval composition of the engine's two hash-verified
ranking families — the inverted-index BM25 top-k (`operators/search.py`)
and the embedding cosine top-k / persisted ANN indexes
(`functions/similarity.py`) — so an LLM-data or RAG pipeline can serve
one blended list instead of reconciling two.

Fusion methods
--------------
- ``rrf`` (reciprocal-rank fusion, Cormack/Clarke/Buettcher SIGIR'09):
  ``score(d) = Σ_lists 1 / (rrf_k + rank_list(d))`` over the lists that
  contain *d*. Rank-only, so it needs no score calibration between BM25
  (unbounded) and cosine ([-1, 1]) — the reason it is the default
  everywhere (Elasticsearch, Vespa, OpenSearch all ship it).
- ``linear``: min-max normalize each list's scores to [0, 1] within its
  top-n, then ``alpha·lex + (1-alpha)·vec`` (a missing side contributes
  0). Score-aware but calibration-sensitive; offered for workloads with
  comparable score distributions.

Scale shape (the part that must survive 100 TB)
-----------------------------------------------
Each side is already a top-n: the lexical list comes out of the block-max
WAND engine (TakeOrderedAndProject, partition-pruned postings), the vector
list out of brute-force cosine (one scan + TakeOrdered) or a persisted
IVF/LSH/PQ index (partition-pruned probes). Fusion therefore operates on
≤ n_lex + n_vec rows — a driver-chosen constant independent of corpus
size — so the rank windows here are single-partition BY DESIGN (documented
bounded input, same contract as the engine's top-k slice windows), and the
final metadata join broadcasts the k winners against the docs table
exactly like the main path's Q9 projection.

Determinism: ranks are assigned by (round(score, 6) desc, doc_id asc) on
both sides — 6 dp is the engine's cross-system comparison precision
(cosine scores are already stored rounded to 6 dp by ``cosine_topk``), so
rank assignment is reproducible between the JVM, numpy, and a SQL oracle.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

RRF_K = 60  # the SIGIR'09 constant; every mainstream engine defaults to it


def _ranked(df: DataFrame, score_col: str, n: "int | None") -> DataFrame:
    """(doc_id, score) → (doc_id, score, rank); rank by (round(score,6)
    desc, doc_id asc). Single-partition window — input is a top-n list
    (module docstring), never corpus-sized."""
    w = Window.orderBy(F.round(F.col("_s"), 6).desc(),
                       F.col("doc_id").asc())
    out = df.select("doc_id", F.col(score_col).alias("_s")) \
            .withColumn("rank", F.row_number().over(w))
    if n is not None:
        out = out.filter(F.col("rank") <= int(n))
    return out


def hybrid_fuse(lex: DataFrame, vec: DataFrame, k: int = 10,
                method: str = "rrf", rrf_k: int = RRF_K,
                alpha: float = 0.5,
                lex_score: str = "score", vec_score: str = "cos",
                n_lex: "int | None" = None,
                n_vec: "int | None" = None) -> DataFrame:
    """Fuse two ranked lists into (doc_id, score, lex_rank, vec_rank).

    ``lex``/``vec`` are (doc_id, <score>) DataFrames — top-n lists from any
    ranking source sharing one doc_id space. A doc absent from a list gets
    rank 0 in that list's output column (0 = "not retrieved"; real ranks
    are 1-based) and contributes nothing to the fused score from that side.
    ``n_lex``/``n_vec`` optionally re-cut the inputs (rank ≤ n) so callers
    can pass longer lists and fuse a prefix."""
    if method not in ("rrf", "linear"):
        raise ValueError(f"unknown fusion method {method!r}")
    lr = _ranked(lex, lex_score, n_lex)
    vr = _ranked(vec, vec_score, n_vec)
    if method == "linear":
        # min-max within each list; a constant list (max == min) maps to 1.0
        def norm(df):
            w = Window.partitionBy()
            rng = F.max("_s").over(w) - F.min("_s").over(w)
            return df.withColumn(
                "_n", F.when(rng > 0, (F.col("_s") - F.min("_s").over(w)) / rng)
                       .otherwise(F.lit(1.0)))
        lr, vr = norm(lr), norm(vr)
    j = (lr.select(F.col("doc_id"), F.col("rank").alias("lex_rank"),
                   *([F.col("_n").alias("_ln")] if method == "linear" else []))
           .join(vr.select(F.col("doc_id"), F.col("rank").alias("vec_rank"),
                           *([F.col("_n").alias("_vn")] if method == "linear" else [])),
                 "doc_id", "full_outer"))
    if method == "rrf":
        fused = (F.coalesce(F.lit(1.0) / (F.lit(int(rrf_k)) + F.col("lex_rank")), F.lit(0.0))
                 + F.coalesce(F.lit(1.0) / (F.lit(int(rrf_k)) + F.col("vec_rank")), F.lit(0.0)))
    else:
        fused = (F.lit(float(alpha)) * F.coalesce(F.col("_ln"), F.lit(0.0))
                 + F.lit(1.0 - float(alpha)) * F.coalesce(F.col("_vn"), F.lit(0.0)))
    out = j.select(
        "doc_id", fused.alias("score"),
        F.coalesce(F.col("lex_rank"), F.lit(0)).alias("lex_rank"),
        F.coalesce(F.col("vec_rank"), F.lit(0)).alias("vec_rank"))
    return out.orderBy(F.round(F.col("score"), 9).desc(),
                       F.col("doc_id").asc()).limit(int(k))


def fuse_rankings(arms: "dict[str, DataFrame]", k: int = 10,
                  rrf_k: int = RRF_K,
                  weights: "dict[str, float] | None" = None,
                  score_cols: "dict[str, str] | None" = None,
                  n_cut: "int | None" = None) -> DataFrame:
    """N-ARM weighted reciprocal-rank fusion — ``hybrid_fuse``
    generalized past two lists: fuse ANY number of ranked arms (BM25,
    exact/ANN cosine, a recency prior, a sharded run, an external
    reranker — anything producing (doc_id, score) over one doc_id
    space):

        score(d) = Σ_arm w_arm / (rrf_k + rank_arm(d))

    with absent-from-arm contributing nothing (rank column 0 = "not
    retrieved", real ranks 1-based — the ``hybrid_fuse`` convention).
    ``weights`` defaults to 1.0 per arm (classic multi-list RRF);
    ``score_cols`` names each arm's score column (default "score");
    ``n_cut`` re-cuts every arm to its top-n before fusing. Each arm
    ranks at the fusion's 6-dp quantization like ``hybrid_fuse``, so a
    two-arm call with unit weights is row-identical to it.

    Plan: |arms| single-partition rank windows over top-n lists (never
    corpus-sized) + a sequence of doc_id full-outer joins — bounded by
    Σ n_arm rows at every step."""
    if not arms:
        raise ValueError("fuse_rankings needs at least one arm")
    w_of = {a: float((weights or {}).get(a, 1.0)) for a in arms}
    joined = None
    for name in arms:  # insertion order: deterministic output columns
        sc = (score_cols or {}).get(name, "score")
        r = _ranked(arms[name], sc, n_cut) \
            .select("doc_id", F.col("rank").alias(f"{name}_rank"))
        joined = r if joined is None else \
            joined.join(r, "doc_id", "full_outer")
    fused = None
    for name in arms:
        part = F.coalesce(F.lit(w_of[name])
                          / (F.lit(int(rrf_k)) + F.col(f"{name}_rank")),
                          F.lit(0.0))
        fused = part if fused is None else fused + part
    out = joined.select(
        "doc_id", fused.alias("score"),
        *[F.coalesce(F.col(f"{n}_rank"), F.lit(0)).alias(f"{n}_rank")
          for n in arms])
    return out.orderBy(F.round(F.col("score"), 9).desc(),
                       F.col("doc_id").asc()).limit(int(k))


def hybrid_search_many(index: dict, queries: "dict[str, str]",
                       emb: DataFrame, qvecs: "dict[str, list[float]]",
                       k: int = 10, method: str = "rrf", n_lex: int = 100,
                       n_vec: int = 100, rrf_k: int = RRF_K,
                       alpha: float = 0.5, scope=None,
                       exclude: "dict[str, str] | str | None" = None,
                       id_col: str = "vec_id",
                       vec_hits: "DataFrame | None" = None) -> DataFrame:
    """Batched hybrid retrieval: MANY (text query, query vector) pairs in
    a fixed number of Spark jobs. Returns (query_id, rank, doc_id,
    conv_id, turn_idx, role, tool, ts, score, lex_rank, vec_rank) — the
    batched-family convention, rank 1..k per query.

    The lexical side is ``search_many`` (one decode pass over the batch's
    union vocabulary); the vector side is ``cosine_topk_many`` (ONE
    embedding-table scan scoring every query vector) — or any
    (query_id, id, cos) DataFrame via ``vec_hits``, e.g. a union of
    persisted-ANN probes. Fusion is per-query: rank windows partitioned
    by query_id, a (query_id, doc_id) full outer join, and a per-query
    top-k window — rows identical to per-query ``hybrid_search``.
    ``queries`` and ``qvecs`` must share key sets; ``exclude`` is the
    batched NOT clause passed to ``search_many``. Like the single path,
    ``scope``/``exclude`` constrain only the LEXICAL arm — pre-filter
    ``emb`` (or pass scoped ``vec_hits``) to constrain the vector arm."""
    from searchengine_spark.operators.search import search_many
    if set(queries) != set(qvecs):
        raise ValueError("queries and qvecs must share the same query ids")
    lex = search_many(index, queries, k=n_lex, mode="bm25", scope=scope,
                      exclude=exclude).select("query_id", "doc_id", "score")
    if vec_hits is None:
        from searchengine_spark.functions.similarity import cosine_topk_many
        vec_hits = cosine_topk_many(emb, qvecs, k=n_vec, id_col=id_col)
    id_name = [c for c in vec_hits.columns
               if c not in ("query_id", "cos", "score")][0]
    vec = vec_hits.select("query_id",
                          F.col(id_name).cast("long").alias("doc_id"),
                          "cos")

    def ranked(df, score_col):
        w = Window.partitionBy("query_id").orderBy(
            F.round(F.col("_s"), 6).desc(), F.col("doc_id").asc())
        return (df.select("query_id", "doc_id",
                          F.col(score_col).alias("_s"))
                .withColumn("rank", F.row_number().over(w)))

    lr, vr = ranked(lex, "score"), ranked(vec, "cos")
    if method == "linear":
        def norm(df):
            w = Window.partitionBy("query_id")
            rng = F.max("_s").over(w) - F.min("_s").over(w)
            return df.withColumn(
                "_n", F.when(rng > 0,
                             (F.col("_s") - F.min("_s").over(w)) / rng)
                       .otherwise(F.lit(1.0)))
        lr, vr = norm(lr), norm(vr)
    elif method != "rrf":
        raise ValueError(f"unknown fusion method {method!r}")
    keys = ["query_id", "doc_id"]
    j = (lr.select(*keys, F.col("rank").alias("lex_rank"),
                   *([F.col("_n").alias("_ln")] if method == "linear" else []))
           .join(vr.select(*keys, F.col("rank").alias("vec_rank"),
                           *([F.col("_n").alias("_vn")] if method == "linear" else [])),
                 keys, "full_outer"))
    if method == "rrf":
        fused = (F.coalesce(F.lit(1.0) / (F.lit(int(rrf_k)) + F.col("lex_rank")), F.lit(0.0))
                 + F.coalesce(F.lit(1.0) / (F.lit(int(rrf_k)) + F.col("vec_rank")), F.lit(0.0)))
    else:
        fused = (F.lit(float(alpha)) * F.coalesce(F.col("_ln"), F.lit(0.0))
                 + F.lit(1.0 - float(alpha)) * F.coalesce(F.col("_vn"), F.lit(0.0)))
    w_q = Window.partitionBy("query_id").orderBy(
        F.round(F.col("score"), 9).desc(), F.col("doc_id").asc())
    topk = (j.select(*keys, fused.alias("score"),
                     F.coalesce(F.col("lex_rank"), F.lit(0)).alias("lex_rank"),
                     F.coalesce(F.col("vec_rank"), F.lit(0)).alias("vec_rank"))
            .withColumn("rank", F.row_number().over(w_q))
            .filter(F.col("rank") <= int(k)))
    docs_meta = index["docs"].select("doc_id", "conv_id", "turn_idx",
                                     "role", "tool", "ts")
    return (docs_meta.join(F.broadcast(topk), "doc_id")
            .select("query_id", "rank", "doc_id", "conv_id", "turn_idx",
                    "role", "tool", "ts", "score", "lex_rank", "vec_rank")
            .orderBy("query_id", "rank"))


def hybrid_search(index: dict, query: str, emb: DataFrame, qvec: list[float],
                  k: int = 10, method: str = "rrf", n_lex: int = 100,
                  n_vec: int = 100, rrf_k: int = RRF_K, alpha: float = 0.5,
                  scope=None, exclude: "str | None" = None,
                  id_col: str = "vec_id",
                  vec_hits: "DataFrame | None" = None,
                  with_snippets: bool = False,
                  with_titles: bool = False) -> DataFrame:
    """Hybrid top-k over a built index + an embedding table. Returns
    (doc_id, conv_id, turn_idx, role, tool, ts, score, lex_rank, vec_rank
    [, title][, snippet]).

    ``with_titles``/``with_snippets`` mirror the main path's Q9/Q10
    surface over the k fused winners (one Arrow pass over k rows);
    snippets highlight the LEXICAL query's expanded word set — a doc
    retrieved only by the vector side gets the no-match fallback snippet,
    which is the honest rendering (nothing lexical matched it).

    The lexical side is ``search(index, query, k=n_lex, mode="bm25",
    scope=, exclude=)`` — the full engine path (dictionary resolution,
    partition-pruned postings, block-max WAND). The vector side defaults
    to exact brute-force cosine (``cosine_topk``); pass ``vec_hits`` (any
    (id, cos) DataFrame, e.g. ``ivf_index_topk`` / ``lsh_index_topk`` /
    ``ivfpq_index_topk`` output over a persisted ANN index) to take the
    sublinear probe path instead — fusion is rank-based, so swapping the
    vector source never changes the contract.

    doc_id space: ``emb[id_col]`` (or ``vec_hits``' id column) must hold
    the INDEX's dense doc ids — the ``(conv_id, turn_idx)``-ordered ids
    ``build_index`` assigns (its ``docs`` table is the mapping). An
    embedding pipeline over the same corpus gets this for free by keying
    vectors on (conv_id, turn_idx) and joining ``index["docs"]`` once at
    embedding-build time."""
    from searchengine_spark.operators.search import search
    lex = search(index, query, k=n_lex, mode="bm25",
                 scope=scope, exclude=exclude).select("doc_id", "score")
    if vec_hits is None:
        from searchengine_spark.functions.similarity import cosine_topk
        vec_hits = cosine_topk(emb, qvec, k=n_vec, id_col=id_col)
    id_name = [c for c in vec_hits.columns if c not in ("cos", "score")][0]
    vec = vec_hits.select(F.col(id_name).cast("long").alias("doc_id"),
                          F.col("cos"))
    fused = hybrid_fuse(lex, vec, k=k, method=method, rrf_k=rrf_k,
                        alpha=alpha, n_vec=n_vec)
    need_text = with_snippets or with_titles
    docs_meta = index["docs"].select("doc_id", "conv_id", "turn_idx",
                                     "role", "tool", "ts",
                                     *(["text"] if need_text else []))
    # k fused winners vs the corpus: broadcast, never a shuffle (Q9 shape)
    out = (docs_meta.join(F.broadcast(fused), "doc_id")
           .select("doc_id", "conv_id", "turn_idx", "role", "tool", "ts",
                   "score", "lex_rank", "vec_rank",
                   *(["text"] if need_text else []))
           .orderBy(F.round(F.col("score"), 9).desc(),
                    F.col("doc_id").asc()))
    if with_titles:
        from searchengine_spark.functions.text import extract_title
        out = out.withColumn("title", extract_title(F.col("text")))
        if not with_snippets:
            out = out.drop("text")
    if with_snippets:
        from searchengine_spark.functions.snippets import snippet_col
        out = out.withColumn(
            "snippet",
            snippet_col(F.col("text"), query, index.get("mode", "general"),
                        index.get("dictionary", "fixture"))).drop("text")
    return out
