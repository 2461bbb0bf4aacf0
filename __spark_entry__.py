"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship end-to-end engine query (index build +
BM25 top-k) over the sf0.001 documents corpus. ``queries()`` exposes one
entry per implemented operator from SURVEY.md §2 plus the training-pipeline
operators; ``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL for every
SQL-expressible one. Column names and float rounding are aligned on both
sides (the driver hash-compares values).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

SF0001 = "/root/testdata/sf0.001"

# fixed query terms present in the documents vocabulary (deterministic corpus)
AND3 = ["spark", "merge", "hash"]
BM25_Q = ["scan", "merge"]
K = 10

_INDEX_CACHE: dict[tuple[str, str], dict] = {}

# ---------------------------------------------------------------------------
# Disk-backed side-index cache (VERDICT r3 #1).  The shaped side indexes
# (general/positional/fielded/en_simple/passages/collapse) are deterministic
# functions of (sf_dir, recipe); building them per-process made every driver
# correctness entry pay an index build.  First touch builds and persists via
# save_index (bucket-partitioned parquet — the same layout production serves
# from); later processes load_index and get partition-pruned scans.  Bump
# _SIDECACHE_VER whenever any build recipe below changes.
# ---------------------------------------------------------------------------
_SIDECACHE_VER = "r5a"  # r5: ru_full dictionary expanded (hushing gen-pl
# fix + new vocab) — any ru-analyzed cached index must rebuild
_SIDECACHE_ROOT = os.environ.get(
    "SPARK_GRAFT_INDEX_CACHE", "/tmp/searchengine_sidecache")
_SIDECACHE_OFF = os.environ.get("SPARK_GRAFT_INDEX_CACHE_OFF", "") == "1"


def _disk_cached_index(spark: SparkSession, sf_dir: str, name: str,
                       builder: Callable[[], dict],
                       kind: str = "general") -> dict:
    """Memoize ``builder()`` under (sf_dir, name): in-process dict first,
    then the persisted snapshot on disk.  ``kind`` picks the save/load pair
    ("general" → plans.manifest, "fielded" → operators.fielded).  The
    completion marker is written atomically (tmp+rename) AFTER a successful
    save, so a killed writer never leaves a half-snapshot that loads."""
    key = (sf_dir, name)
    if key in _INDEX_CACHE:
        return _INDEX_CACHE[key]
    if kind == "fielded":
        from searchengine_spark.operators.fielded import (
            load_fielded_index as _load, save_fielded_index as _save)
    else:
        from searchengine_spark.plans.manifest import (
            load_index as _load, save_index as _save)
    if _SIDECACHE_OFF:
        _INDEX_CACHE[key] = builder()
        return _INDEX_CACHE[key]
    import json as _json
    import shutil as _shutil
    sfb = os.path.basename(sf_dir.rstrip("/")) or "sf"
    path = os.path.join(_SIDECACHE_ROOT, _SIDECACHE_VER, sfb, name)
    marker = os.path.join(path, "_complete.json")
    if not os.path.exists(marker):
        # build into a private dir, then one atomic rename publishes it —
        # concurrent writers race safely (loser discards its copy) and a
        # killed writer never leaves a half-snapshot at the published path
        tmp_dir = f"{path}.tmp.{os.getpid()}"
        _shutil.rmtree(tmp_dir, ignore_errors=True)
        idx = builder()
        _save(idx, tmp_dir)
        with open(os.path.join(tmp_dir, "_complete.json"), "w") as f:
            _json.dump({"name": name, "kind": kind,
                        "ver": _SIDECACHE_VER}, f)
        try:
            os.rename(tmp_dir, path)
        except OSError:  # another writer published first — use theirs
            _shutil.rmtree(tmp_dir, ignore_errors=True)
    _INDEX_CACHE[key] = _load(spark, path)
    return _INDEX_CACHE[key]


def _positional_index_for(spark: SparkSession, sf_dir: str) -> dict:
    """Positional index over the documents-as-transcripts corpus (phrase /
    span / querylang-proximity entries all share it)."""
    from searchengine_spark.operators.indexer import build_index
    return _disk_cached_index(
        spark, sf_dir, "positional",
        lambda: build_index(_docs_as_transcripts(spark, sf_dir),
                            mode="general", with_positions=True))


def _fielded_index_for(spark: SparkSession, sf_dir: str) -> dict:
    """BM25F per-field index (bm25f/querylang-fielded/upsert entries)."""
    from searchengine_spark.operators.fielded import build_fielded_index
    return _disk_cached_index(
        spark, sf_dir, "fielded",
        lambda: build_fielded_index(_docs_as_transcripts(spark, sf_dir),
                                    mode="general"),
        kind="fielded")


def _grouped_index_for(spark: SparkSession, sf_dir: str) -> dict:
    """Index over the grouped-transcript shaping (collapse/grouped top-k)."""
    from searchengine_spark.operators.indexer import build_index
    return _disk_cached_index(
        spark, sf_dir, "collapse",
        lambda: build_index(_docs_as_grouped_transcripts(spark, sf_dir),
                            mode="general"))


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _docs_as_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → input_hint transcript shape (one turn per doc).

    conv_id zero-padded so lexicographic (conv_id, turn_idx) order ==
    numeric doc_id order; the engine's dense doc_id then equals the original
    doc_id, making engine output directly oracle-comparable.
    """
    d = _docs(spark, sf_dir)
    return d.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        (F.lit("2026-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("doc_id").cast("double"))).alias("ts"),
    )


def _index_for(spark: SparkSession, sf_dir: str) -> dict:
    from searchengine_spark.operators.indexer import build_index
    return _disk_cached_index(
        spark, sf_dir, "general",
        lambda: build_index(_docs_as_transcripts(spark, sf_dir),
                            mode="general"))


def _orig_doc_id(col: str = "conv_id"):
    return F.substring(F.col(col), 4, 8).cast("long").alias("doc_id")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full inverted-index build + block-max BM25 top-k search."""
    from searchengine_spark.operators.search import search
    index = _index_for(spark, SF0001)
    hits = search(index, " ".join(BM25_Q), k=K, mode="bm25")
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


# --------------------------------------------------------------------------
# queries(): (spark, sf_dir) -> DataFrame, one per operator
# --------------------------------------------------------------------------

def _q_tokenize_tf(spark, sf_dir):
    """T2+T5: tokenize + per-doc term frequency (documents corpus)."""
    from searchengine_spark.functions.text import tokens_col
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("term"))
    return toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))


def _q_term_df(spark, sf_dir):
    """A1: document frequency per term."""
    return (_q_tokenize_tf(spark, sf_dir)
            .groupBy("term").agg(F.count("*").alias("df")))


def _q_dictionary_lookup(spark, sf_dir):
    """Q2: point lookup of query terms in the dictionary (IN-list pushdown)."""
    return _q_term_df(spark, sf_dir).filter(F.col("term").isin(AND3 + BM25_Q))


def _q_high_df_prune(spark, sf_dir):
    """Q3: drop terms with df/N ≥ 0.8 (survivors listed with df_frac)."""
    d = _docs(spark, sf_dir)
    n = d.count()
    return (_q_term_df(spark, sf_dir)
            .withColumn("df_frac", F.round(F.col("df") / F.lit(float(n)), 6))
            .filter(F.col("df_frac") < 0.8)
            .filter(F.col("df") >= 50))  # keep output small + stable


def _q_conjunctive_and(spark, sf_dir):
    """Q6: docs containing ALL of the 3 query terms, with tf_sum."""
    tf = _q_tokenize_tf(spark, sf_dir).filter(F.col("term").isin(AND3))
    agg = tf.groupBy("doc_id").agg(F.count("*").alias("nt"), F.sum("tf").alias("tf_sum"))
    return agg.filter(F.col("nt") == len(AND3)).select("doc_id", "tf_sum")


def _q_ref_topk(spark, sf_dir):
    """Q7/Q8 ref_compat: conjunctive AND + tf-sum normalized by result max,
    canonical (score desc, doc_id) top-k — run through the REAL engine
    (index build + compressed-postings search)."""
    from searchengine_spark.operators.search import search
    index = _index_for(spark, sf_dir)
    hits = search(index, " ".join(AND3), k=K, mode="ref_compat")
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _q_bm25_topk(spark, sf_dir):
    """Q5/Q7/Q8 BM25: block-max pruned top-k through the real engine."""
    from searchengine_spark.operators.search import search
    index = _index_for(spark, sf_dir)
    hits = search(index, " ".join(BM25_Q), k=K, mode="bm25")
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _q_hot_cached_topk(spark, sf_dir):
    """Driver-side hot-query tier (operators/hot.py): the SAME BM25 top-k
    as q7_bm25_topk answered from cached decoded postings + dictionary in
    numpy — the first call populates (one fetch job per term), the second
    runs with ZERO Spark jobs; this entry returns the warm pass's rows, so
    the oracle (the q7 BM25 SQL) gates the hot tier's scoring + ordering
    end-to-end."""
    from searchengine_spark.operators.hot import hot_search
    index = _index_for(spark, sf_dir)
    hot_search(index, " ".join(BM25_Q), k=K)          # cold populate
    pdf = hot_search(index, " ".join(BM25_Q), k=K)    # warm: zero jobs
    rows = [(int(r.doc_id), round(float(r.score), 6))
            for r in pdf.itertuples(index=False)]
    return spark.createDataFrame(rows, "doc_id long, score double")


def _q_hot_ref_topk(spark, sf_dir):
    """The REFERENCE's ranking mode (ref_compat: Q3 prune + conjunctive
    AND + tf-sum normalized by the match max) answered by the driver-side
    hot tier — warm pass zero Spark jobs; oracle = the q7_ref_topk SQL,
    so the reference-semantics path is value-hash gated through the
    cache tier too."""
    from searchengine_spark.operators.hot import hot_search
    index = _index_for(spark, sf_dir)
    hot_search(index, " ".join(AND3), k=K, mode="ref_compat")
    pdf = hot_search(index, " ".join(AND3), k=K, mode="ref_compat")
    rows = [(int(r.doc_id), round(float(r.score), 6))
            for r in pdf.itertuples(index=False)]
    return spark.createDataFrame(rows, "doc_id long, score double")


DYM_QUERY = "merqe hashh spark zzznope"  # two misspellings, one exact, one junk


def _q_did_you_mean(spark, sf_dir):
    """Whole-query spell correction (suggest.did_you_mean): each token
    corrects to the closest dictionary term by (edit distance asc,
    df desc, term asc) in ONE dictionary scan — exact tokens self-correct
    at dist 0, unreachable tokens yield NULL (flattened to ''/-1 for the
    hash compare). Oracle recomputes with DuckDB levenshtein."""
    from searchengine_spark.operators.suggest import did_you_mean
    out = did_you_mean(_index_for(spark, sf_dir), DYM_QUERY)
    return out.select(
        "pos", "word",
        F.coalesce(F.col("corrected"), F.lit("")).alias("corrected"),
        F.coalesce(F.col("dist"), F.lit(-1)).cast("int").alias("dist"))




def _q_top_hits(spark, sf_dir):
    """Per-facet top hits (search_top_hits — ES top_hits aggregation):
    the 3 best BM25 matches inside every doc_id%10 facet bucket, one
    match-set window — the "best per category" panel."""
    from searchengine_spark.operators.search import search_top_hits
    index = _index_for(spark, sf_dir)
    out = search_top_hits(index, " ".join(BM25_Q),
                          by=F.substring(F.col("conv_id"), 11, 1), m=3)
    return out.select("facet", "rank", _orig_doc_id(),
                      F.round("score", 6).alias("score"))


MMR_K, MMR_N, MMR_LAM = 8, 30, 0.7


def _q_sim_mmr_topk(spark, sf_dir):
    """MMR diversification (similarity.mmr_rerank — Carbonell-Goldstein
    maximal marginal relevance): exact cosine top-30 candidates in one
    corpus scan, then the greedy lam*rel − (1−lam)*max-sim-to-selected
    head rerank driver-side. Oracle: the SAME greedy unrolled as 8 chained
    argmax CTEs over DuckDB list_cosine_similarity, every compared
    quantity rounded to 6 dp half-away-from-zero on both sides."""
    from searchengine_spark.functions.similarity import mmr_rerank
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in
            emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    out = mmr_rerank(emb, qvec, k=MMR_K, n=MMR_N, lam=MMR_LAM)
    return out.select("rank", "vec_id", F.round("cos", 6).alias("cos"),
                      F.round("mmr", 6).alias("mmr"))



def _mmr_sql(k: int, n: int, lam: float) -> str:
    """Oracle for sim_mmr_topk: the MMR greedy unrolled as k chained
    argmax CTEs (step i picks the best remaining candidate against the
    union of picks 1..i-1); every compared quantity rounds to 6 dp, the
    cosine formula is the sim_cosine_topk oracle's dot/norms shape."""
    lam = float(lam)
    dot = "list_dot_product"
    sim = (f"round({dot}(c.v, p.v) / (sqrt({dot}(c.v, c.v)) "
           f"* sqrt({dot}(p.v, p.v))), 6)")
    steps, union_sel = [], ["s1"]
    for i in range(2, int(k) + 1):
        prev = " union all ".join(f"select vec_id, v from {t}"
                                  for t in union_sel)
        steps.append(f"""s{i} as materialized (
  select c.vec_id, c.rel, c.v, {i} as rank,
         round({lam!r} * c.rel - {1.0 - lam!r} * (
             select max({sim}) from ({prev}) p), 6) as mmr
  from cand c
  where c.vec_id not in (select vec_id from ({prev}))
  order by mmr desc, c.vec_id asc limit 1)""")
        union_sel.append(f"s{i}")
    final = " union all ".join(
        f"select rank, vec_id, round(rel, 6) as cos, round(mmr, 6) as mmr "
        f"from {t}" for t in union_sel)
    return f"""
with q as (select embedding::DOUBLE[] as qv from embeddings where vec_id = 0),
base as (select vec_id, embedding::DOUBLE[] as v from embeddings),
cand as materialized (select vec_id,
                round({dot}(v, (select qv from q))
                      / (sqrt({dot}(v, v))
                         * sqrt({dot}((select qv from q),
                                      (select qv from q)))), 6) as rel,
                v
         from base order by rel desc, vec_id asc limit {int(n)}),
s1 as materialized (select vec_id, rel, v, 1 as rank, rel as mmr from cand
       order by rel desc, vec_id asc limit 1),
{",".join(steps)}
select rank, vec_id, cos, mmr from ({final}) order by rank
"""


TUNED_K1, TUNED_B = 0.9, 0.4  # query-time similarity params for q_bm25_tuned


def _q_bm25_tuned_topk(spark, sf_dir):
    """Query-time BM25 similarity parameters (search(k1=, b=), the
    Elasticsearch per-query similarity surface): the standard BM25 query
    ranked under k1=0.9, b=0.4. Stored block-max bounds (built under
    k1=1.2, b=0.75) are stale for this query, so WAND runs on the
    stats-independent idf·f(block_max_tf, block_min_dl) bound evaluated
    at the QUERY's constants — exact for any k1≥0, 0≤b≤1."""
    from searchengine_spark.operators.search import search
    index = _index_for(spark, sf_dir)
    hits = search(index, " ".join(BM25_Q), k=K, mode="bm25",
                  k1=TUNED_K1, b=TUNED_B)
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _q_significant_bigrams(spark, sf_dir):
    """significant_text for PHRASES: adjacent-lemma bigrams
    over-represented in the match set vs the cached corpus bigram
    background, JLH-scored like significant_terms."""
    from searchengine_spark.operators.search import significant_bigrams
    index = _index_for(spark, sf_dir)
    rows = significant_bigrams(index, " ".join(BM25_Q), k=20)
    return rows.select("bigram", "fg_df", "bg_df",
                       F.round("score", 6).alias("score"))


def _q_prf_topk(spark, sf_dir):
    """Pseudo-relevance-feedback expansion (RM3-lite): bm25 first pass on
    the standard query, top-3 NEW lemmas from the top-5 hits by
    (feedback tf desc, df asc, term asc), second pass with the expansion
    terms at weight 0.5 through the caret-boost machinery (WAND stays
    exact on both passes)."""
    from searchengine_spark.operators.search import prf_search
    hits = prf_search(_index_for(spark, sf_dir), " ".join(BM25_Q), k=K,
                      fb_docs=5, fb_terms=3, fb_weight=0.5)
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _q_term_boost(spark, sf_dir):
    """Lucene caret boost through the grammar (`merge^2 scan`): the
    boosted term's additive contribution doubles via idf scaling, so
    WAND bounds and the cache scorer stay exact under the boost."""
    from searchengine_spark.operators.querylang import query_search
    hits = query_search(_index_for(spark, sf_dir), "merge^2 scan", k=K)
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


NOT_T = "hash"  # NOT-clause term (mid-frequency in the documents corpus)


def _q_bm25_not_topk(spark, sf_dir):
    """NOT clause: BM25 top-k for the standard query excluding docs that
    contain NOT_T — one anti-join over the excluded term's postings; WAND θ
    comes from post-exclusion candidates so pruning stays exact."""
    from searchengine_spark.operators.search import search
    index = _index_for(spark, sf_dir)
    hits = search(index, " ".join(BM25_Q), k=K, mode="bm25", exclude=NOT_T)
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _q_significant_terms(spark, sf_dir):
    """significant_terms aggregation: JLH-scored over-represented terms in
    the standard query's match set vs the corpus background (fg from one
    re-analysis of the MATCHED docs, bg from the dictionary's exact df)."""
    from searchengine_spark.operators.search import significant_terms
    index = _index_for(spark, sf_dir)
    rows = significant_terms(index, " ".join(BM25_Q), k=20)
    return rows.select("term", "fg_df", "bg_df",
                       F.round("score", 6).alias("score"))


def _a5_term_vectors(spark, sf_dir):
    """Term-vectors API (term_vectors — ES _termvectors): per-doc
    (term, tf, corpus df) rows for three docs, re-derived through the
    index's own analysis chain + one dictionary join."""
    from searchengine_spark.operators.search import term_vectors
    index = _index_for(spark, sf_dir)
    return term_vectors(index, [7, 11, 42])


def _q_explain_score(spark, sf_dir):
    """Score debugging: per-(doc, term) BM25 breakdown for the standard
    query's top-k — tf/dl/df/idf/weight rows whose per-doc weight sums
    reproduce the search scores (explain_score; Elasticsearch _explain
    analog — the reference assembles its score invisibly,
    services/SearchingServiceImpl.java:300-329)."""
    from searchengine_spark.operators.search import explain_score
    index = _index_for(spark, sf_dir)
    rows = explain_score(index, " ".join(BM25_Q), k=K)
    return rows.select(_orig_doc_id(), "term", "tf", "dl", "df",
                       F.round("idf", 6).alias("idf"),
                       F.round("weight", 6).alias("weight"))


def _a6_doc_term_weights(spark, sf_dir):
    """Corpus-wide sparse BM25 document vectors (doc_term_weights): every
    doc's (term, tf, weight) under the index's exact scoring formula —
    the classical sparse-feature export; per-doc sums over a query's
    terms reproduce search scores."""
    from searchengine_spark.operators.search import doc_term_weights
    index = _index_for(spark, sf_dir)
    # dense doc_id == original doc_id under the zero-padded conv shaping
    rows = doc_term_weights(index, as_terms=True)
    return rows.select("doc_id", "term", "tf",
                       F.round("weight", 6).alias("weight"))


def _q_min_match(spark, sf_dir):
    """minimum-should-match: BM25 over the 3-term query keeping only docs
    matching >= 2 distinct terms — the OR/AND middle ground
    (search(min_match=2); no reference analog, its query language is
    conjunctive-only: services/SearchingServiceImpl.java:95-108)."""
    from searchengine_spark.operators.search import search
    index = _index_for(spark, sf_dir)
    hits = search(index, " ".join(AND3), k=K, mode="bm25", min_match=2)
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _q_select_all(spark, sf_dir):
    """Full match-set EXPORT (search_select — the scroll / select-by-query
    surface): EVERY doc matching >= 2 of the 3 query terms, with its
    distinct-matched-term count and BM25 score — no top-k; the result is
    the training-subset DataFrame a pipeline writes out."""
    from searchengine_spark.operators.search import search_select
    index = _index_for(spark, sf_dir)
    rows = search_select(index, " ".join(AND3), mode="bm25", min_match=2)
    return rows.select(_orig_doc_id(), "nt",
                       F.round("score", 6).alias("score"))


def _q_querylang_select(spark, sf_dir):
    """Grammar full match-set export (query_select): every doc matching
    'scan merge -hash' — any ranked term, NOT clause applied — with nt and
    BM25 score, no top-k."""
    from searchengine_spark.operators.querylang import query_select
    index = _index_for(spark, sf_dir)
    rows = query_select(index, "scan merge -hash", mode="bm25")
    return rows.select(_orig_doc_id(), "nt",
                       F.round("score", 6).alias("score"))


def _q_facets(spark, sf_dir):
    """Facet counts over the query's FULL match set (match=any): matching
    docs grouped by doc_id's last digit — a 10-way facet over this corpus's
    otherwise-degenerate metadata (role/tool facets are exercised in pytest
    on the transcript fixtures)."""
    from searchengine_spark.operators.search import search_facets
    index = _index_for(spark, sf_dir)
    return search_facets(index, " ".join(BM25_Q),
                         by=F.substring(F.col("conv_id"), 11, 1))


def _q_facets_multi(spark, sf_dir):
    """Multi-dimension facet panel in ONE job: the same match set counted
    by doc_id's last digit AND its tens digit (dict form, expression
    dims) — one decode, one explode, one aggregation."""
    from searchengine_spark.operators.search import search_facets
    index = _index_for(spark, sf_dir)
    return search_facets(
        index, " ".join(BM25_Q),
        by={"last": F.substring(F.col("conv_id"), 11, 1),
            "tens": F.substring(F.col("conv_id"), 10, 1)})


def _q_bm25_page2(spark, sf_dir):
    """Q11 pagination: second page (offset=K) of the BM25 ranking."""
    from searchengine_spark.operators.search import search
    index = _index_for(spark, sf_dir)
    hits = search(index, " ".join(BM25_Q), k=K, mode="bm25", offset=K)
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


SCOPE_PREFIX = "doc000001"  # conv_id prefix ≡ doc_id in [100, 199]


def _q_scoped_bm25_topk(spark, sf_dir):
    """Site-scoped search (reference GET /api/search?site=,
    SearchingServiceImpl.java:237-270): BM25 top-k restricted to a conv_id
    prefix — candidates scoped, idf/avgdl corpus-wide."""
    from searchengine_spark.operators.search import search
    index = _index_for(spark, sf_dir)
    hits = search(index, " ".join(BM25_Q), k=K, mode="bm25", scope=SCOPE_PREFIX)
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _q_scoped_ref_topk(spark, sf_dir):
    """Site-scoped ref_compat search: per-SCOPE df drives the 80% prune and
    the conjunction arity (the reference's per-site lemma frequency)."""
    from searchengine_spark.operators.search import search
    index = _index_for(spark, sf_dir)
    hits = search(index, " ".join(AND3), k=K, mode="ref_compat", scope=SCOPE_PREFIX)
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _q_statistics_per_collection(spark, sf_dir):
    """A3 per-collection detail: per-site page AND lemma counts analog
    (collection = conv_id prefix; tokenizer = the oracle-matched latin one)."""
    from searchengine_spark.functions.text import tokens_col
    from searchengine_spark.operators.indexer import statistics_per_collection
    index = _index_for(spark, sf_dir)
    return statistics_per_collection(index, prefix_len=9,
                                     tokens=tokens_col(F.col("text")))


def _q_phrase_topk(spark, sf_dir):
    """Exact phrase query over a POSITIONAL index (delta+varint-encoded
    token positions per posting block; adjacency via base-alignment):
    docs containing the phrase "scan merge", ranked by occurrence count."""
    from searchengine_spark.operators.indexer import build_index
    from searchengine_spark.operators.search import phrase_search
    key = (sf_dir, "positional")
    _INDEX_CACHE[key] = _positional_index_for(spark, sf_dir)
    hits = phrase_search(_INDEX_CACHE[key], " ".join(BM25_Q), k=K)
    return hits.select(_orig_doc_id(), "n_matches")


def _q_phrase_not(spark, sf_dir):
    """Phrase NOT: the same phrase top-k minus docs containing NOT_T
    anywhere (one anti-join over the excluded term's postings; match
    counts unchanged)."""
    from searchengine_spark.operators.indexer import build_index
    from searchengine_spark.operators.search import phrase_search
    key = (sf_dir, "positional")
    _INDEX_CACHE[key] = _positional_index_for(spark, sf_dir)
    hits = phrase_search(_INDEX_CACHE[key], " ".join(BM25_Q), k=K,
                         exclude=NOT_T)
    return hits.select(_orig_doc_id(), "n_matches")


QL_QUERY = 'scan "hash join" -spark'      # terms + phrase filter + NOT term
QL_NOTPHRASE = 'scan merge -"hash join"'  # ranked terms + NOT-phrase clause
QL_QUALIFIED = "scan merge site:doc000001 -spark"  # qualifier + NOT term
QL_SPAN = 'scan merge "spark hash"~8'     # ranked terms + span clause
QL_OSPAN = 'scan merge "spark hash"~8!'   # ranked terms + ORDERED span
# percolation: registered saved searches covering the grammar matrix
PERC_QUERIES = {
    "pt": "scan hash",                     # any-term match set
    "pp": 'scan "hash join"',              # phrase clause
    "pn": "scan -merge",                   # NOT term
    "pm2": "scan merge hash min:2",        # minimum-should-match
    "pq": "scan merge site:doc000001",     # metadata qualifier
    "ps": 'scan "spark hash"~8',           # span clause
}
# ts in _docs_as_transcripts = 2026-01-01 + doc_id seconds, so this window
# is exactly docs 10 ≤ doc_id < 100
QL_TIME = "scan merge after:2026-01-01T00:00:10 before:2026-01-01T00:01:40"
COLLAPSE_GROUPS = 50  # conv groups in the collapse entry's corpus shaping
SPAN_Q, SPAN_W = "spark merge hash", 12   # standalone span_search args


def _q_span_topk(spark, sf_dir):
    """Unordered n-term proximity (span_search): docs where all three query
    lemmas co-occur within SPAN_W positions, ranked tightest-window-first.
    The minimal-window scan runs in codegen (aggregate over sorted
    (pos, slot) structs — one positional decode, one shuffle)."""
    from searchengine_spark.operators.indexer import build_index
    from searchengine_spark.operators.search import span_search
    key = (sf_dir, "positional")
    _INDEX_CACHE[key] = _positional_index_for(spark, sf_dir)
    hits = span_search(_INDEX_CACHE[key], SPAN_Q, window=SPAN_W, k=K)
    return hits.select(_orig_doc_id(), "span")


def _q_ordered_span_topk(spark, sf_dir):
    """ORDERED span (span_search(ordered=True) — SpanNear inOrder=true):
    the three lemmas must occur in query order within SPAN_W positions;
    the in-order chain DP replaces the min-cover scan in the same
    one-decode + one-aggregate plan."""
    from searchengine_spark.operators.indexer import build_index
    from searchengine_spark.operators.search import span_search
    key = (sf_dir, "positional")
    _INDEX_CACHE[key] = _positional_index_for(spark, sf_dir)
    hits = span_search(_INDEX_CACHE[key], SPAN_Q, window=SPAN_W, k=K,
                       ordered=True)
    return hits.select(_orig_doc_id(), "span")


def _q_querylang_qualified(spark, sf_dir):
    """Query language with a metadata qualifier: site:PREFIX restricts to
    the conv_id prefix (the reference's site=) as a docs-table predicate
    ANDed into the scope; -spark bans docs containing the term."""
    from searchengine_spark.operators.querylang import query_search
    hits = query_search(_index_for(spark, sf_dir), QL_QUALIFIED, k=K,
                        mode="bm25")
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _q_querylang_span(spark, sf_dir):
    """Query language with a span clause: '"spark hash"~8' keeps only docs
    whose tightest spark..hash window is ≤ 8 positions; ranking is BM25
    over ALL positive words (scan, merge + the span's constituents)."""
    from searchengine_spark.operators.indexer import build_index
    from searchengine_spark.operators.querylang import query_search
    key = (sf_dir, "positional")
    _INDEX_CACHE[key] = _positional_index_for(spark, sf_dir)
    hits = query_search(_INDEX_CACHE[key], QL_SPAN, k=K, mode="bm25")
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _q_querylang_ospan(spark, sf_dir):
    """Query language with an ORDERED span clause: '"spark hash"~8!' keeps
    only docs where spark occurs BEFORE hash within 8 positions (the
    in-order chain DP of span_search(ordered=True) as a grammar filter);
    ranking stays BM25 over all positive words."""
    from searchengine_spark.operators.indexer import build_index
    from searchengine_spark.operators.querylang import query_search
    key = (sf_dir, "positional")
    _INDEX_CACHE[key] = _positional_index_for(spark, sf_dir)
    hits = query_search(_INDEX_CACHE[key], QL_OSPAN, k=K, mode="bm25")
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _q_querylang_regex(spark, sf_dir):
    """Regex grammar term: '/s.an/' expands against the dictionary
    (anchored full-match, top-16 by df — suggest_regex) into an OR-group:
    docs containing any expansion, every expansion ranked with the bare
    term 'merge'."""
    from searchengine_spark.operators.querylang import query_search
    hits = query_search(_index_for(spark, sf_dir), "merge /s.an/", k=K,
                        mode="bm25")
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _q_querylang_exists(spark, sf_dir):
    """exists: qualifier over a corpus shaping where even doc_ids carry
    tool='bash' and odd ones none — 'exists:tool' restricts the ranked
    match set to the even half as a null-check docs predicate."""
    from searchengine_spark.operators.indexer import build_index
    from searchengine_spark.operators.querylang import query_search
    key = (sf_dir, "tooled")
    if key not in _INDEX_CACHE:
        docs = _docs_as_transcripts(spark, sf_dir).withColumn(
            "tool",
            F.when(F.substring("conv_id", 4, 8).cast("long") % 2 == 0,
                   F.lit("bash")))
        _INDEX_CACHE[key] = build_index(docs, mode="general")
    hits = query_search(_INDEX_CACHE[key],
                        " ".join(BM25_Q) + " exists:tool", k=K, mode="bm25")
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _q_synonyms(spark, sf_dir):
    """Query-time synonym expansion: synonyms={'merge': ['hash']} turns
    the bare term into the OR-group (merge|hash) — docs containing either
    variant qualify, all of {scan, merge, hash} rank."""
    from searchengine_spark.operators.querylang import query_search
    hits = query_search(_index_for(spark, sf_dir), "scan merge", k=K,
                        mode="bm25", synonyms={"merge": ["hash"]})
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _q_percolate(spark, sf_dir):
    """Percolation (operators/percolate.py — reverse search): match every
    doc against the registered grammar queries in ONE inverted dataflow
    (analyze batch once, literal-map fan-outs per requirement family) —
    the saved-search/alerting operator. Output: (query_id, doc_id), one
    row per doc in each query's full match set."""
    from searchengine_spark.operators.percolate import percolate
    out = percolate(PERC_QUERIES, _docs_as_transcripts(spark, sf_dir))
    return out.select("query_id", _orig_doc_id())


N_PERC_SCALED = 5000  # registry size for the scaled percolation entries
N_PERC_DISPATCH = 10000  # == percolate.TABLE_TIER_MIN: exercises auto-dispatch


def _perc_scaled_registry(spark, sf_dir,
                          n_queries: int = N_PERC_SCALED) -> dict[str, str]:
    """Deterministic registry over the corpus vocab — shared by the
    dict-path (q_percolate_scaled), table-path (q_percolate_table) and
    auto-dispatch (q_percolate_dispatch, n=10,000) entries, and mirrored
    exactly by their common parameterized DuckDB oracle."""
    from searchengine_spark.functions.text import tokens_col
    d = _docs(spark, sf_dir)
    vocab = [r["term"] for r in
             d.select(F.explode(tokens_col(F.col("text"))).alias("term"))
             .distinct().orderBy("term").collect()]
    n = len(vocab)
    queries = {}
    for i in range(n_queries):
        a = i % n
        b = (i * 7 + 3) % n
        if b == a:
            b = (b + 1) % n
        q = f"{vocab[a]} {vocab[b]} min:2"
        if i % 3 == 0:
            q += f" -{vocab[(i * 5 + 1) % n]}"
        queries[f"q{i:05d}"] = q
    return queries


def _q_percolate_table(spark, sf_dir):
    """Table-native percolation (percolate_table): the SAME 5,000-query
    registry as q_percolate_scaled, but registered as a DataFrame —
    grammar compile runs DISTRIBUTED (Arrow-batched parse+analysis), the
    requirement postings are DataFrames, and every kernel is a join, so
    neither the driver nor the plan holds per-query state (the
    10^5–10^6-saved-search alerting tier). Same oracle as the dict
    path — the two tiers must agree row-for-row."""
    from searchengine_spark.operators.percolate import percolate_table
    qdf = spark.createDataFrame(
        list(_perc_scaled_registry(spark, sf_dir).items()),
        "query_id string, query string")
    batch = _docs_as_transcripts(spark, sf_dir).filter(
        F.substring("conv_id", 4, 8).cast("long") < 200)
    out = percolate_table(qdf, batch)
    return out.groupBy("query_id").agg(F.count("*").alias("n_matches"))


def _q_percolate_scaled(spark, sf_dir):
    """Percolation at alerting-tier registry scale (VERDICT r3 #2): a
    deterministically generated 5,000-query registry (two required terms
    via min:2, every third query adds a NOT term — >10k requirement
    entries, far past LIT_MAP_MAX) percolates a 200-doc batch in ONE
    inverted pass.  Above the literal-map cap the requirement fan-outs
    run as broadcast joins of the (term → query) postings — the
    ES-percolator "index the queries" design — so the plan is
    independent of |registry|.  Output: per-query match counts."""
    from searchengine_spark.operators.percolate import percolate
    queries = _perc_scaled_registry(spark, sf_dir)
    batch = _docs_as_transcripts(spark, sf_dir).filter(
        F.substring("conv_id", 4, 8).cast("long") < 200)
    out = percolate(queries, batch)
    return (out.groupBy("query_id")
            .agg(F.count("*").alias("n_matches")))


def _q_percolate_dispatch(spark, sf_dir):
    """Tier AUTO-DISPATCH through the public percolate() API (VERDICT r4
    #2): the same deterministic registry construction at n=10,000 ==
    TABLE_TIER_MIN, so percolate() routes to the table-native tier
    (distributed compile, join-only kernels) without the caller naming
    it. The oracle is the scaled-registry SQL parameterized at 10,000 —
    dispatch is only correct if the two tiers are row-identical."""
    from searchengine_spark.operators import percolate as P
    from searchengine_spark.operators.percolate import percolate
    queries = _perc_scaled_registry(spark, sf_dir,
                                    n_queries=N_PERC_DISPATCH)
    assert len(queries) >= P.TABLE_TIER_MIN  # really the dispatched path
    batch = _docs_as_transcripts(spark, sf_dir).filter(
        F.substring("conv_id", 4, 8).cast("long") < 200)
    out = percolate(queries, batch)
    return (out.groupBy("query_id")
            .agg(F.count("*").alias("n_matches")))


def _q_percolate_scored(spark, sf_dir):
    """Scored percolation (percolate(with_scores=True) — the ES
    percolator's _score analog): same match set as q_percolate plus
    tf_sum = Σtf of each query's ranked terms in the doc, carried free
    inside the ranked aggregation (events are per-position rows)."""
    from searchengine_spark.operators.percolate import percolate
    out = percolate(PERC_QUERIES, _docs_as_transcripts(spark, sf_dir),
                    with_scores=True)
    return out.select("query_id", _orig_doc_id(),
                      F.col("tf_sum").cast("long").alias("tf_sum"))


def _q_querylang(spark, sf_dir):
    """Unified query language (operators/querylang.py): bare terms rank via
    BM25 (phrase constituents included), the quoted phrase is a positional
    hard filter riding the scoped-search machinery as a doc-set scope, and
    the -term NOT clause anti-joins — all in one query string."""
    from searchengine_spark.operators.indexer import build_index
    from searchengine_spark.operators.querylang import query_search
    key = (sf_dir, "positional")
    _INDEX_CACHE[key] = _positional_index_for(spark, sf_dir)
    hits = query_search(_INDEX_CACHE[key], QL_QUERY, k=K, mode="bm25")
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _docs_as_grouped_transcripts(spark, sf_dir):
    """documents → transcript shape with REAL multi-turn conversations:
    conv_id = doc_id % COLLAPSE_GROUPS (zero-padded), turn_idx =
    doc_id // COLLAPSE_GROUPS. Zero-padding makes lexicographic
    (conv_id, turn_idx) order == (group, turn) numeric order, so the
    engine's dense doc_id ordering is (group, turn) and the ORIGINAL
    doc_id = turn_idx * COLLAPSE_GROUPS + group is recoverable from the
    output columns."""
    d = _docs(spark, sf_dir)
    g = COLLAPSE_GROUPS
    return d.select(
        F.format_string("grp%04d", F.col("doc_id") % g).alias("conv_id"),
        (F.col("doc_id") / g).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        (F.lit("2026-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("doc_id").cast("double"))).alias("ts"),
    )


def _q_collapse_topk(spark, sf_dir):
    """Field collapsing (search(collapse=)): top-k with at most ONE hit per
    conversation — rank every match, keep each conv's best by the exact
    (score desc, doc_id) order, then global top-k. The corpus is shaped
    into COLLAPSE_GROUPS multi-turn conversations so collapsing actually
    bites (docs sharing a conv compete)."""
    from searchengine_spark.operators.indexer import build_index
    from searchengine_spark.operators.search import search
    key = (sf_dir, "collapse")
    _INDEX_CACHE[key] = _grouped_index_for(spark, sf_dir)
    hits = search(_INDEX_CACHE[key], " ".join(BM25_Q), k=K, mode="bm25",
                  collapse="conv_id")
    return hits.select(
        (F.col("turn_idx").cast("long") * COLLAPSE_GROUPS
         + F.substring("conv_id", 4, 4).cast("long")).alias("doc_id"),
        F.round("score", 6).alias("score"))


def _q_querylang_time(spark, sf_dir):
    """Query-language time-range qualifiers: after:/before: become one ts
    predicate on the docs table ANDed into the scope (same path as site:/
    role:), so candidates, conjunction and WAND θ all evaluate within the
    time window while idf/avgdl stay corpus-wide."""
    from searchengine_spark.operators.querylang import query_search
    hits = query_search(_index_for(spark, sf_dir), QL_TIME, k=K, mode="bm25")
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _q_querylang_group(spark, sf_dir):
    """Query-language OR-group (synonym set): 'merge (scan|hash)' ranks by
    BM25 over {merge, scan, hash} restricted to docs containing scan OR
    hash — the group resolves to a docs-containing-any candidate set
    riding the doc-set scope path (no positional index needed)."""
    from searchengine_spark.operators.querylang import query_search
    index = _index_for(spark, sf_dir)
    hits = query_search(index, "merge (scan|hash)", k=K, mode="bm25")
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _q_querylang_notphrase(spark, sf_dir):
    """Query language with a NOT-phrase clause: docs containing the exact
    analyzed phrase are banned from the BM25 ranking (positional match set
    → one anti-join via search(exclude_docs=))."""
    from searchengine_spark.operators.indexer import build_index
    from searchengine_spark.operators.querylang import query_search
    key = (sf_dir, "positional")
    _INDEX_CACHE[key] = _positional_index_for(spark, sf_dir)
    hits = query_search(_INDEX_CACHE[key], QL_NOTPHRASE, k=K, mode="bm25")
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _q_batched_span(spark, sf_dir):
    """Batched span queries: TWO unordered-window proximity queries (with
    PER-QUERY windows) matched in one Spark job — one positional decode
    over the union vocabulary, one groupBy(query_id, doc_id) minimal-window
    aggregate; rows identical to per-query span_search."""
    from searchengine_spark.operators.indexer import build_index
    from searchengine_spark.operators.search import span_search_many
    key = (sf_dir, "positional")
    _INDEX_CACHE[key] = _positional_index_for(spark, sf_dir)
    out = span_search_many(
        _INDEX_CACHE[key],
        {"sa": (SPAN_Q, SPAN_W), "sb": ("scan merge hash", 9)}, k=K)
    return out.select("query_id", _orig_doc_id(), "span")


def _q_rescore_topk(spark, sf_dir):
    """Two-phase proximity rescoring (rescore_search — the ES rescorer
    pattern): BM25 top-100 candidates, then final = bm25 + 1/(1+span)
    for candidates whose tightest all-lemma window is <= 8; docs outside
    the window keep plain bm25, docs outside the top-100 are never
    rescored."""
    from searchengine_spark.operators.indexer import build_index
    from searchengine_spark.operators.search import rescore_search
    key = (sf_dir, "positional")
    _INDEX_CACHE[key] = _positional_index_for(spark, sf_dir)
    hits = rescore_search(_INDEX_CACHE[key], " ".join(BM25_Q), k=K, n=100,
                          window=8, weight=1.0)
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _q_batched_ordered_span(spark, sf_dir):
    """Batched ORDERED span queries (span_search_many(ordered=True)): the
    in-order chain DP with per-query arity/window riding the same shared
    one-decode + one-aggregate stage."""
    from searchengine_spark.operators.indexer import build_index
    from searchengine_spark.operators.search import span_search_many
    key = (sf_dir, "positional")
    _INDEX_CACHE[key] = _positional_index_for(spark, sf_dir)
    out = span_search_many(
        _INDEX_CACHE[key],
        {"sa": (SPAN_Q, SPAN_W), "sb": ("merge scan", 9)}, k=K,
        ordered=True)
    return out.select("query_id", _orig_doc_id(), "span")


def _q_batched_phrase(spark, sf_dir):
    """Batched phrase queries: TWO phrases matched in one Spark job over the
    positional index (one decode pass over the union of phrase vocabularies,
    per-phrase slot alignment, window ranking) — rows identical to
    per-phrase phrase_search."""
    from searchengine_spark.operators.indexer import build_index
    from searchengine_spark.operators.search import phrase_search_many
    key = (sf_dir, "positional")
    _INDEX_CACHE[key] = _positional_index_for(spark, sf_dir)
    out = phrase_search_many(
        _INDEX_CACHE[key], {"pa": " ".join(BM25_Q), "pb": "hash join"}, k=K)
    return out.select("query_id", _orig_doc_id(), "n_matches")


def _q_batched_near(spark, sf_dir):
    """Batched proximity queries: TWO (term_a, term_b) pairs matched in one
    Spark job over the positional index (one decode pass over the union of
    the pairs' terms, bucketized pair join, per-query window ranking) —
    rows identical to per-query near_search."""
    from searchengine_spark.operators.indexer import build_index
    from searchengine_spark.operators.search import near_search_many
    key = (sf_dir, "positional")
    _INDEX_CACHE[key] = _positional_index_for(spark, sf_dir)
    out = near_search_many(
        _INDEX_CACHE[key], {"na": ("scan", "hash"), "nb": ("hash", "join")},
        max_dist=4, k=K)
    return out.select("query_id", _orig_doc_id(), "n_pairs")


BATCH_Q2 = ["hash", "scan"]


def _q_batched_bm25(spark, sf_dir):
    """Batched top-k: TWO queries scored in one Spark job (union of block
    scans, per-query window ranking) — rows identical to per-query search."""
    from searchengine_spark.operators.search import search_many
    index = _index_for(spark, sf_dir)
    out = search_many(index, {"qa": " ".join(BM25_Q), "qb": " ".join(BATCH_Q2)},
                      k=K, mode="bm25")
    return out.select("query_id", _orig_doc_id(),
                      F.round("score", 6).alias("score"))


def _q_batched_not(spark, sf_dir):
    """Batched NOT clause: per-query exclusions ride the shared decode pass
    and one (query_id, doc_id) anti-join — rows identical to per-query
    search(..., exclude=)."""
    from searchengine_spark.operators.search import search_many
    index = _index_for(spark, sf_dir)
    out = search_many(index, {"qa": " ".join(BM25_Q), "qb": " ".join(BATCH_Q2)},
                      k=K, mode="bm25",
                      exclude={"qa": NOT_T, "qb": "merge"})
    return out.select("query_id", _orig_doc_id(),
                      F.round("score", 6).alias("score"))


def _q_batched_scoped(spark, sf_dir):
    """Batched top-k restricted to one collection scope (query-log replay
    over the reference's per-site search): one decode pass for both queries,
    scope as a doc-range check + bucket-level block pruning before decode."""
    from searchengine_spark.operators.search import search_many
    index = _index_for(spark, sf_dir)
    out = search_many(index, {"qa": " ".join(BM25_Q), "qb": " ".join(BATCH_Q2)},
                      k=K, mode="bm25", scope=SCOPE_PREFIX)
    return out.select("query_id", _orig_doc_id(),
                      F.round("score", 6).alias("score"))


MLT_DOC = 150        # more-like-this source doc (present at every sf)
SUGGEST_PREFIX = "s"  # autocomplete probe (6 dictionary terms)
FUZZY_WORD = "bat"    # misspelling probe (6 terms at dist ≤2 — exercises
#                       the dist-then-df-then-term tie ordering)


def _q_suggest(spark, sf_dir):
    """Prefix autocomplete (operators/suggest.py): the K most frequent
    dictionary terms starting with SUGGEST_PREFIX, (term, df) by
    (df desc, term asc). Dictionary-only — zero postings access; zero
    Spark jobs on a driver-cached dictionary."""
    from searchengine_spark.operators.suggest import suggest
    return suggest(_index_for(spark, sf_dir), SUGGEST_PREFIX, k=K)


def _q_suggest_fuzzy(spark, sf_dir):
    """Fuzzy "did-you-mean" (operators/suggest.py): dictionary terms within
    2 edits of FUZZY_WORD, (term, dist, df) by (dist asc, df desc,
    term asc) — one length-banded dictionary scan with early-exit
    levenshtein, no postings access."""
    from searchengine_spark.operators.suggest import suggest_corrections
    return suggest_corrections(_index_for(spark, sf_dir), FUZZY_WORD,
                               max_dist=2, k=K)


def _q_querylang_wildcard(spark, sf_dir):
    """Query-language wildcard: 'merge sca*' expands sca* against the
    dictionary (top-16 by df) into an OR-group — BM25 over {merge} ∪ the
    expansions, candidates restricted to docs containing any expansion."""
    from searchengine_spark.operators.querylang import query_search
    hits = query_search(_index_for(spark, sf_dir), "merge sca*", k=K,
                        mode="bm25")
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _q_querylang_wildcard_suffix(spark, sf_dir):
    """SUFFIX wildcard '*can' — the Lucene leading-wildcard class: no
    prefix narrows the dictionary, so expansion is a full-pattern
    dictionary scan (suggest_pattern) into the top-16-by-df OR-group;
    ranking semantics identical to the prefix form."""
    from searchengine_spark.operators.querylang import query_search
    hits = query_search(_index_for(spark, sf_dir), "merge *can", k=K,
                        mode="bm25")
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _q_trigram_infix(spark, sf_dir):
    """Char-3-gram dictionary sidecar (build_trigram_index /
    suggest_infix): the leading-wildcard glob `*er` resolved by
    intersecting the pattern's padded 3-grams (here the boundary gram
    `er$`) against the bucket-pruned gram→term index and verifying the
    survivors — identical rows to the full dictionary walk without
    visiting every term (the Lucene/ES ngram-filter answer to leading
    wildcards)."""
    from searchengine_spark.operators.suggest import (build_trigram_index,
                                                      suggest_infix)
    index = _index_for(spark, sf_dir)
    if index.get("trigrams") is None:
        build_trigram_index(index)
    out = suggest_infix(index, "*er", k=16)
    return out.select("term", F.col("df").cast("long").alias("df"))


BOOL_EXPR = "(merge AND (scan OR hash)) AND NOT stream"


def _q_bool_search(spark, sf_dir):
    """Recursive boolean query (operators/boolean.py — Lucene
    BooleanQuery nesting): the tree decides candidates by doc-set
    algebra (AND → semi-join, OR → union, AND NOT → anti-join), the
    ranking is ordinary BM25 over the tree's scoring terms restricted to
    the candidates via the DataFrame-scope path."""
    from searchengine_spark.operators.boolean import bool_search
    hits = bool_search(_index_for(spark, sf_dir), BOOL_EXPR, k=K)
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


BOOL_EXPR2 = "scan OR (stream AND NOT hash)"


def _q_batched_bool(spark, sf_dir):
    """Batched boolean replay (bool_search_many): two trees ranked in one
    shared job — distinct leaves resolve once, candidates ride
    search_many's scope_clauses hook; rows identical to per-query
    bool_search."""
    from searchengine_spark.operators.boolean import bool_search_many
    out = bool_search_many(_index_for(spark, sf_dir),
                           {"b1": BOOL_EXPR, "b2": BOOL_EXPR2}, k=K)
    return out.select("query_id", _orig_doc_id(),
                      F.round("score", 6).alias("score"))


def _q_bool_select(spark, sf_dir):
    """Full match-set export for a boolean tree (bool_select — the
    scroll surface × the algebra): every candidate doc with its
    distinct-matched-term count and BM25 score, no top-k."""
    from searchengine_spark.operators.boolean import bool_select
    out = bool_select(_index_for(spark, sf_dir), BOOL_EXPR)
    return out.select(_orig_doc_id(), F.col("nt").cast("long").alias("nt"),
                      F.round("score", 6).alias("score"))


def _q_percolate_bool(spark, sf_dir):
    """Boolean-tree PERCOLATION (reverse search over AND/OR/NOT trees):
    both registered boolean expressions matched against the whole doc
    batch in one inverted dataflow — leaf satisfaction via the shared
    kernels, then a per-query boolean expression over each doc's
    satisfied-leaf set. Full match sets vs SQL set algebra."""
    from searchengine_spark.operators.percolate import percolate_bool
    docs = _docs(spark, sf_dir)
    out = percolate_bool({"b1": BOOL_EXPR, "b2": BOOL_EXPR2}, docs,
                         key_cols=["doc_id"])
    return out.select("query_id", "doc_id")


def _q_bool_count(spark, sf_dir):
    """Candidate-set size of the same boolean tree (the `_count` twin —
    qualifier-only branches would count here even though they rank
    nothing)."""
    from searchengine_spark.operators.boolean import bool_count
    return bool_count(_index_for(spark, sf_dir), BOOL_EXPR)


def _q_querylang_count(spark, sf_dir):
    """Grammar total-hits count (query_count): |docs matching >= 2 of
    {merge, scan, hash} restricted to docs containing scan or hash| —
    OR-group candidate set + min:2 directive, one row even when zero."""
    from searchengine_spark.operators.querylang import query_count
    return query_count(_index_for(spark, sf_dir), "merge (scan|hash) min:2")


def _q_querylang_fuzzy(spark, sf_dir):
    """Grammar fuzzy term 'scn~1' (Lucene fuzzy query): expands against
    the dictionary to the terms within 1 edit (dist asc, df desc, term
    asc; cap 8) and runs as that OR-group next to 'merge'."""
    from searchengine_spark.operators.querylang import query_search
    hits = query_search(_index_for(spark, sf_dir), "merge scn~1", k=K,
                        mode="bm25")
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _q_querylang_min(spark, sf_dir):
    """Grammar min: directive — 'spark merge hash min:2' == the standalone
    minimum-should-match query (q_min_match) resolved through the
    query-string language."""
    from searchengine_spark.operators.querylang import query_search
    hits = query_search(_index_for(spark, sf_dir), " ".join(AND3) + " min:2",
                        k=K, mode="bm25")
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _q_more_like_this(spark, sf_dir):
    """More-like-this (operators/suggest.py): re-analyze doc MLT_DOC,
    select its 5 most characteristic lemmas by (tf desc, df asc,
    term asc), BM25-search them with the source doc removed — one docs
    point lookup + one ordinary ranked query."""
    from searchengine_spark.operators.suggest import more_like_this
    hits = more_like_this(_index_for(spark, sf_dir), MLT_DOC, k=K,
                          n_terms=5)
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _q_querylang_facets(spark, sf_dir):
    """Facet panel over a grammar query's FULL match set
    (querylang.query_facets): docs matching any of QL_QUERY's ranked terms
    within the phrase clause's candidates, minus the NOT term's docs,
    counted by doc_id's last digit — grammar resolution + one facet job."""
    from searchengine_spark.operators.indexer import build_index
    from searchengine_spark.operators.querylang import query_facets
    key = (sf_dir, "positional")
    _INDEX_CACHE[key] = _positional_index_for(spark, sf_dir)
    return query_facets(_INDEX_CACHE[key], QL_QUERY,
                        by=F.substring(F.col("conv_id"), 11, 1))


def _q_batched_querylang(spark, sf_dir):
    """Batched query-LANGUAGE replay (query_search_many): FOUR grammar
    queries — terms+phrase+NOT-term, span clause, OR-group, NOT-phrase —
    in one amortized plan: ONE positional decode resolves every phrase and
    span clause in the batch, OR-group doc sets ride the scoring decode,
    and per-query candidates/bans apply as one (query_id, doc_id)
    semi-/anti-join; rows identical to per-query query_search."""
    from searchengine_spark.operators.indexer import build_index
    from searchengine_spark.operators.querylang import query_search_many
    key = (sf_dir, "positional")
    _INDEX_CACHE[key] = _positional_index_for(spark, sf_dir)
    out = query_search_many(
        _INDEX_CACHE[key],
        {"qa": QL_QUERY, "qb": QL_SPAN, "qc": "merge (scan|hash)",
         "qd": QL_NOTPHRASE}, k=K, mode="bm25")
    return out.select("query_id", _orig_doc_id(),
                      F.round("score", 6).alias("score"))


def _q_near_topk(spark, sf_dir):
    """Two-term proximity query over the positional index: docs where
    'scan' and 'hash' occur within 4 positions, ranked by close-pair count."""
    from searchengine_spark.operators.indexer import build_index
    from searchengine_spark.operators.search import near_search
    key = (sf_dir, "positional")
    _INDEX_CACHE[key] = _positional_index_for(spark, sf_dir)
    hits = near_search(_INDEX_CACHE[key], "scan", "hash", max_dist=4, k=K)
    return hits.select(_orig_doc_id(), "n_pairs")


def _q_querylang_bm25f(spark, sf_dir):
    """Query language ranked by BM25F (querylang.query_search_bm25f):
    QL_QUERY's phrase clause resolves on the positional MAIN index, its
    NOT term anti-joins, and the ranked pass runs the fielded
    title(2×)/body scorer over the shared doc_id space."""
    from searchengine_spark.operators.fielded import build_fielded_index
    from searchengine_spark.operators.indexer import build_index
    from searchengine_spark.operators.querylang import query_search_bm25f
    pkey = (sf_dir, "positional")
    _INDEX_CACHE[pkey] = _positional_index_for(spark, sf_dir)
    fkey = (sf_dir, "fielded")
    _INDEX_CACHE[fkey] = _fielded_index_for(spark, sf_dir)
    hits = query_search_bm25f(_INDEX_CACHE[pkey], _INDEX_CACHE[fkey],
                              QL_QUERY, k=K)
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _q_bm25f_topk(spark, sf_dir):
    """Fielded scoring (BM25F, Robertson & Zaragoza): title (leading 60
    chars, the reference's title analog) weighted 2×, body 1×, per-field
    length norm, one saturation after the field blend. Per-field
    block-compressed postings over a shared doc_id space."""
    from searchengine_spark.operators.fielded import bm25f_search, build_fielded_index
    key = (sf_dir, "fielded")
    _INDEX_CACHE[key] = _fielded_index_for(spark, sf_dir)
    hits = bm25f_search(_INDEX_CACHE[key], " ".join(BM25_Q), k=K)
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _q_bm25f_scoped(spark, sf_dir):
    """Fielded scoping: BM25F top-k restricted to a collection (conv_id
    prefix 'doc000000' == doc_id 0..99 — a contiguous doc range, so the
    scope is a codegen range check + bucket-level block pruning before any
    decode; idf/avgdl stay index-wide, the standard filtered-search
    semantics matching the main path's scoped BM25)."""
    from searchengine_spark.operators.fielded import bm25f_search, build_fielded_index
    key = (sf_dir, "fielded")
    _INDEX_CACHE[key] = _fielded_index_for(spark, sf_dir)
    hits = bm25f_search(_INDEX_CACHE[key], " ".join(BM25_Q), k=K,
                        scope="doc000000")
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _q_bm25f_not(spark, sf_dir):
    """Fielded NOT clause: BM25F top-k excluding docs that contain NOT_T in
    ANY field (title nests inside body in this layout, so the oracle's
    body-token check is the exact any-field condition)."""
    from searchengine_spark.operators.fielded import bm25f_search, build_fielded_index
    key = (sf_dir, "fielded")
    _INDEX_CACHE[key] = _fielded_index_for(spark, sf_dir)
    hits = bm25f_search(_INDEX_CACHE[key], " ".join(BM25_Q), k=K,
                        exclude=NOT_T)
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _q_batched_bm25f(spark, sf_dir):
    """Batched BM25F: TWO fielded queries scored in one Spark job (one
    decode pass per field over the union of the batch's term_ids, per-query
    fan-out + window ranking) — rows identical to per-query bm25f_search."""
    from searchengine_spark.operators.fielded import (
        bm25f_search_many, build_fielded_index)
    key = (sf_dir, "fielded")
    _INDEX_CACHE[key] = _fielded_index_for(spark, sf_dir)
    out = bm25f_search_many(
        _INDEX_CACHE[key],
        {"qa": " ".join(BM25_Q), "qb": " ".join(BATCH_Q2)}, k=K)
    return out.select("query_id", _orig_doc_id(),
                      F.round("score", 6).alias("score"))


def _q_batched_bm25f_not(spark, sf_dir):
    """Batched fielded NOT: per-query exclusions ride the same per-field
    union decode; one (query_id, doc_id) anti-join — rows identical to
    per-query bm25f_search(..., exclude=)."""
    from searchengine_spark.operators.fielded import (
        bm25f_search_many, build_fielded_index)
    key = (sf_dir, "fielded")
    _INDEX_CACHE[key] = _fielded_index_for(spark, sf_dir)
    out = bm25f_search_many(
        _INDEX_CACHE[key],
        {"qa": " ".join(BM25_Q), "qb": " ".join(BATCH_Q2)}, k=K,
        exclude={"qa": NOT_T, "qb": "merge"})
    return out.select("query_id", _orig_doc_id(),
                      F.round("score", 6).alias("score"))


def _q_snippets(spark, sf_dir):
    """Q10 snippets: highlighted sentence fragment for each top-k hit."""
    from searchengine_spark.operators.search import search
    index = _index_for(spark, sf_dir)
    hits = search(index, " ".join(BM25_Q), k=K, mode="bm25", with_snippets=True)
    return hits.select(_orig_doc_id(), "snippet")


# delta applied by the S6 upsert query: two replaced docs + one new doc
UPSERT_REPLACE = {7: "replacement text about spark merge operations",
                  11: "another replacement mentioning hash scan pipelines"}
UPSERT_NEW_TEXT = "entirely new document exercising upsert insert path"


def _q_upsert_term_df(spark, sf_dir):
    """S6 incremental upsert: merge a 3-row delta (2 replace + 1 insert) into
    the built index; return the maintained dictionary (term, df)."""
    from searchengine_spark.operators.upsert import upsert_turns
    index = _index_for(spark, sf_dir)
    rows = [(f"doc{did:08d}", 0, "user", text, None)
            for did, text in UPSERT_REPLACE.items()]
    rows.append(("zzz_upsert_new", 0, "user", UPSERT_NEW_TEXT, None))
    delta = spark.createDataFrame(
        [(c, t, r, x, tool, "2026-02-01 00:00:00") for c, t, r, x, tool in rows],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    upserted = upsert_turns(index, delta)
    return upserted["terms"].select("term", "df")


def _q_delete_term_df(spark, sf_dir):
    """Incremental DELETE (the GDPR/unlearn path): remove every doc with
    doc_id % 50 == 3 from the built index via one touched-block rewrite;
    return the maintained dictionary (term, df). Oracle = df over the
    filtered corpus."""
    from searchengine_spark.operators.upsert import delete_turns
    index = _index_for(spark, sf_dir)
    pred = (F.substring("conv_id", 4, 8).cast("long") % 50) == 3
    deleted = delete_turns(index, pred)
    return deleted["terms"].select("term", "df")


def _chained_compacted_index(spark, sf_dir):
    """upsert the s6 delta into the built index, then compact with id
    reassignment — the maintenance round-trip (operators/compact.py)."""
    key = (sf_dir, "compacted")
    if key not in _INDEX_CACHE:
        from searchengine_spark.operators.compact import compact_index
        from searchengine_spark.operators.upsert import upsert_turns
        index = _index_for(spark, sf_dir)
        rows = [(f"doc{did:08d}", 0, "user", text, None)
                for did, text in UPSERT_REPLACE.items()]
        rows.append(("zzz_upsert_new", 0, "user", UPSERT_NEW_TEXT, None))
        delta = spark.createDataFrame(
            [(c, t, r, x, tool, "2026-02-01 00:00:00")
             for c, t, r, x, tool in rows],
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        _INDEX_CACHE[key] = compact_index(upsert_turns(index, delta),
                                          reassign_ids=True)
    return _INDEX_CACHE[key]


def _tt_root_for(spark, sf_dir):
    """Snapshot root shared by the time-travel and snapshot-diff entries:
    the built index persisted as snap-00000, then the s6 delta MERGEd as
    an incremental snapshot (CURRENT → snap-00001)."""
    import shutil
    from searchengine_spark.operators.upsert import merge_into_path
    from searchengine_spark.plans.manifest import commit_snapshot
    from searchengine_spark.plans.manifest import save_index
    key = (sf_dir, "ttroot")
    if key not in _INDEX_CACHE:
        root = f"/root/repo/.tt_cache/{os.path.basename(sf_dir)}"
        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root, exist_ok=True)
        save_index(_index_for(spark, sf_dir), f"{root}/snap-00000")
        commit_snapshot(root, "snap-00000")
        rows = [(f"doc{did:08d}", 0, "user", text, None)
                for did, text in UPSERT_REPLACE.items()]
        rows.append(("zzz_upsert_new", 0, "user", UPSERT_NEW_TEXT, None))
        delta = spark.createDataFrame(
            [(c, t, r, x, tool, "2026-02-01 00:00:00")
             for c, t, r, x, tool in rows],
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        merge_into_path(spark, root, delta, incremental=True)
        _INDEX_CACHE[key] = root
    return _INDEX_CACHE[key]


def _q_time_travel(spark, sf_dir):
    """Snapshot time travel (the Iceberg VERSION AS OF analog,
    operators/upsert.py): persist the built index as snap-00000, MERGE the
    s6 delta as an incremental snapshot (CURRENT → snap-00001), then query
    BOTH versions from one root — the AS-OF load of snap-00000 must score
    against the ORIGINAL corpus while CURRENT scores against the modified
    one. Returns (version, doc_id, score) for the two rankings."""
    from searchengine_spark.operators.upsert import load_index_as_of
    from searchengine_spark.operators.search import search
    root = _tt_root_for(spark, sf_dir)
    old = load_index_as_of(spark, root, "snap-00000")
    cur = load_index_as_of(spark, root)  # CURRENT == snap-00001
    q = " ".join(BM25_Q)
    a = search(old, q, k=K).select(
        F.lit("as_of").alias("version"), _orig_doc_id(),
        F.round("score", 6).alias("score"))
    b = search(cur, q, k=K).select(
        F.lit("current").alias("version"), _orig_doc_id(),
        F.round("score", 6).alias("score"))
    return a.unionByName(b)


def _q_diff_snapshots(spark, sf_dir):
    """Snapshot diff (the Iceberg changelog-inspection analog): the
    dictionary-level diff between snap-00000 and CURRENT of the
    time-travel root — every term whose df moved under the s6 delta,
    with added terms df_a = -1 and dropped terms df_b = -1."""
    from searchengine_spark.operators.upsert import diff_snapshots
    root = _tt_root_for(spark, sf_dir)
    d = diff_snapshots(spark, root, "snap-00000")
    return d["terms_changed"].select(
        "term",
        F.coalesce(F.col("df_a"), F.lit(-1)).cast("long").alias("df_a"),
        F.coalesce(F.col("df_b"), F.lit(-1)).cast("long").alias("df_b"))


def _q_compact_term_df(spark, sf_dir):
    """S8 compaction: the compacted chain's dictionary must still equal df
    over the modified corpus (compaction rewrites every block from the
    index itself — no text re-analysis — and must not disturb the terms)."""
    compacted = _chained_compacted_index(spark, sf_dir)
    return compacted["terms"].select("term", "df")


def _q_compacted_topk(spark, sf_dir):
    """BM25 top-k through the compacted chain index: stored WAND bounds are
    exact again (tf_bounds cleared by compact_index) and scores must match
    the modified corpus' stats exactly."""
    from searchengine_spark.operators.search import search
    compacted = _chained_compacted_index(spark, sf_dir)
    hits = search(compacted, " ".join(BM25_Q), k=K, mode="bm25")
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _q_merged_bm25f(spark, sf_dir):
    """Fielded shard merge: build the corpus as two fielded shard indexes,
    fold with merge_fielded_indexes (rigid shift per field, no decode) —
    BM25F through the merged index must equal the single-build ground
    truth exactly (per-field df/avgdl fold exactly; fielded bounds are
    stats-independent, so there is no compaction debt)."""
    from searchengine_spark.operators.compact import merge_fielded_indexes
    from searchengine_spark.operators.fielded import (
        bm25f_search, build_fielded_index)
    key = (sf_dir, "merged_fielded")
    if key not in _INDEX_CACHE:
        t = _docs_as_transcripts(spark, sf_dir)
        n = _docs(spark, sf_dir).count()
        cut = f"doc{n // 2:08d}"
        fa = build_fielded_index(t.filter(F.col("conv_id") < cut),
                                 mode="general")
        fb = build_fielded_index(t.filter(F.col("conv_id") >= cut),
                                 mode="general")
        _INDEX_CACHE[key] = merge_fielded_indexes(fa, fb)
    hits = bm25f_search(_INDEX_CACHE[key], " ".join(BM25_Q), k=K)
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _shards_for(spark, sf_dir):
    """Two independent shard builds over contiguous conv_id halves — shared
    by the merge entries (build half) and the scatter-gather entry (serve
    half)."""
    key = (sf_dir, "shards")
    if key not in _INDEX_CACHE:
        from searchengine_spark.operators.indexer import build_index
        t = _docs_as_transcripts(spark, sf_dir)
        n = _docs(spark, sf_dir).count()
        cut = f"doc{n // 2:08d}"
        ia = build_index(t.filter(F.col("conv_id") < cut), mode="general")
        ib = build_index(t.filter(F.col("conv_id") >= cut), mode="general")
        _INDEX_CACHE[key] = [ia, ib]
    return _INDEX_CACHE[key]


def _merged_index_for(spark, sf_dir):
    """Per-shard build pattern: split the corpus into two contiguous halves
    by conv_id, build each shard independently, fold with merge_indexes
    (metadata-only shift of the right shard's blocks — no decode)."""
    key = (sf_dir, "merged")
    if key not in _INDEX_CACHE:
        from searchengine_spark.operators.compact import merge_indexes
        ia, ib = _shards_for(spark, sf_dir)
        _INDEX_CACHE[key] = merge_indexes(ia, ib)
    return _INDEX_CACHE[key]


def _q_sharded_topk(spark, sf_dir):
    """Scatter-gather serving (operators/sharded.py): BM25 top-k over the
    two shard indexes IN PLACE — per-shard search under corpus-global
    (n_docs, avgdl, df) assembled from the shard dictionaries, then a
    bounded rank merge. Must equal the whole-corpus SQL exactly (the
    distributed-IDF problem solved by global stats)."""
    from searchengine_spark.operators.sharded import search_sharded
    shards = _shards_for(spark, sf_dir)
    hits = search_sharded(shards, " ".join(BM25_Q), k=K)
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _q_merge_term_df(spark, sf_dir):
    """S9 shard merge: the merged dictionary (shared terms df-summed,
    right-only terms re-identified) must equal df over the whole corpus."""
    merged = _merged_index_for(spark, sf_dir)
    return merged["terms"].select("term", "df")


def _q_merged_topk(spark, sf_dir):
    """BM25 top-k through the merged shard index: df/n_docs/avgdl merge
    exactly, so scores are identical to a single build over the union."""
    from searchengine_spark.operators.search import search
    merged = _merged_index_for(spark, sf_dir)
    hits = search(merged, " ".join(BM25_Q), k=K, mode="bm25")
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _q_batched_sharded(spark, sf_dir):
    """Batched scatter-gather (search_many_sharded): a 2-query log replayed
    over the two shard indexes in place — one search_many per shard under
    corpus-global stats, one bounded per-query rank merge; rows identical
    to the combined index's batched top-k."""
    from searchengine_spark.operators.sharded import search_many_sharded
    shards = _shards_for(spark, sf_dir)
    out = search_many_sharded(
        shards, {"qa": " ".join(BM25_Q), "qb": " ".join(BATCH_Q2)}, k=K)
    return out.select("query_id", _orig_doc_id(),
                      F.round("score", 6).alias("score"))


def _q_upsert_fielded_df(spark, sf_dir):
    """S6 upsert of a FIELDED (BM25F) index: merge the same 3-row delta and
    return the maintained title-field dictionary (term, df). The upsert
    rewrites only touched (term_id, bucket) groups per field; df/avgdl are
    maintained exactly (operators/fielded.py upsert_fielded)."""
    from searchengine_spark.operators.fielded import (
        build_fielded_index, upsert_fielded)
    key = (sf_dir, "fielded")
    _INDEX_CACHE[key] = _fielded_index_for(spark, sf_dir)
    rows = [(f"doc{did:08d}", 0, "user", text, None)
            for did, text in UPSERT_REPLACE.items()]
    rows.append(("zzz_upsert_new", 0, "user", UPSERT_NEW_TEXT, None))
    delta = spark.createDataFrame(
        [(c, t, r, x, tool, "2026-02-01 00:00:00") for c, t, r, x, tool in rows],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    upserted = upsert_fielded(_INDEX_CACHE[key], delta)
    return upserted["fields"]["title"]["terms"].select(
        "term", F.col("df_field").alias("df"))


def _q_index_geometry(spark, sf_dir):
    """A4 (engine extension): physical-layout inspection from postings
    metadata only — verifies the block layout itself against ground truth
    (Σ n per term == df; blocks per doc-bucket == ceil(count/block_size))."""
    from searchengine_spark.operators.indexer import index_geometry
    index = _index_for(spark, sf_dir)
    return index_geometry(index).select("term", "df", "n_blocks",
                                        "n_postings")


def _q_metadata_projection(spark, sf_dir):
    """Q9: join top-k winners back to the source table for metadata + the
    title analog (reference extracts <title> per hit; plain text falls back
    to a leading-chars title)."""
    from searchengine_spark.functions.text import extract_title
    topk = _q_bm25_topk(spark, sf_dir)
    d = _docs(spark, sf_dir).select(
        "doc_id", "lang", "source", extract_title(F.col("text")).alias("title"))
    return topk.join(d, "doc_id").select("doc_id", "score", "lang", "source", "title")


def _q_statistics(spark, sf_dir):
    """A3: corpus statistics per source (doc count, token count)."""
    from searchengine_spark.functions.text import token_count
    d = _docs(spark, sf_dir)
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count(F.col("text"))).alias("n_tokens"))


def _q_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling (training-data mixing): strata =
    doc_id%3 buckets standing in for sources, per-stratum keep rates via
    the portable LCG hash — one codegen filter, reproducible across runs,
    layouts, and engines (the oracle recomputes the selection in SQL)."""
    from searchengine_spark.functions.sampling import stratified_sample
    d = _docs(spark, sf_dir).withColumn(
        "source", F.concat(F.lit("s"), (F.col("doc_id") % 3).cast("string")))
    out = stratified_sample(d, {"s0": 0.5, "s1": 0.2}, "source", "doc_id")
    return out.select("doc_id", "source")


def _q_token_budget_mix(spark, sf_dir):
    """Deterministic token-budget mixing: cap each stratum at a token
    budget taking docs in hash order (a reproducible shuffle). Engine plan
    is the bucketed two-phase prefix sum (no stratum on one partition);
    the oracle is the equivalent naive windowed cumsum."""
    from searchengine_spark.functions.sampling import token_budget_mix
    from searchengine_spark.functions.text import tokens_col
    d = (_docs(spark, sf_dir)
         .withColumn("source", F.concat(F.lit("s"),
                                        (F.col("doc_id") % 3).cast("string")))
         .withColumn("n_tokens", F.size(tokens_col(F.col("text")))))
    out = token_budget_mix(d, {"s0": 20_000, "s1": 8_000}, "source",
                           "n_tokens", "doc_id")
    return out.select("doc_id", "source",
                      F.col("n_tokens").cast("long").alias("n_tokens"))


def _q_temperature_mix(spark, sf_dir):
    """Temperature-based corpus mixing (the multilingual-LM size^alpha
    rule): a 60/30/10 source shaping, alpha=0.5, 100-doc budget —
    targets are the floor shares with rounding leftovers to the largest
    strata (no stratum clamps at this shaping, so the closed form is
    SQL-expressible), realized as each stratum's exact hash-order
    prefix (the deterministic reproducible shuffle)."""
    from searchengine_spark.functions.sampling import temperature_mix
    d = _docs(spark, sf_dir).withColumn(
        "source",
        F.when(F.col("doc_id") % 10 < 6, "big")
        .when(F.col("doc_id") % 10 < 9, "mid").otherwise("small"))
    out = temperature_mix(d, "source", "doc_id", alpha=0.5, budget=100)
    return out.select("doc_id", "source")


def _q_split_corpus(spark, sf_dir):
    """Deterministic train/val/test split: one portable-LCG hash draw per
    row, cumulative thresholds → disjoint named splits, reproducible
    across runs/layouts/engines."""
    from searchengine_spark.functions.sampling import split_corpus
    out = split_corpus(_docs(spark, sf_dir),
                       {"train": 0.8, "val": 0.1, "test": 0.1}, "doc_id")
    return out.select("doc_id", "split")


def _q_bpe_merges(spark, sf_dir):
    """LEARNED BPE merges (Sennrich 2016): one corpus-scale word-count
    aggregation, then the driver-side merge loop over the word-type
    dictionary (the reference/SentencePiece formulation). Uniform type
    weights here so the merge list depends only on the word SET — both
    sf dirs share the exact same 31-word vocabulary, making the result
    sf-independent and the oracle a committed expected table generated
    by an independent reimplementation
    (tests/data/make_expected_bpe.py)."""
    from searchengine_spark.functions.bpe import bpe_merges_df, train_bpe
    model = train_bpe(_docs(spark, sf_dir), n_merges=40,
                      weighting="uniform")
    return bpe_merges_df(spark, model)


def _q_pack_sequences(spark, sf_dir):
    """Sequence packing: the corpus' tokens laid on one deterministic
    hash-ordered stream, cut into 512-token training sequences; one row
    per (doc, sequence) slice. Engine plan is the bucketed two-phase
    prefix sum (every bucket windows within itself — 1/B of the corpus);
    the oracle is the equivalent naive global cumsum + series explode."""
    from searchengine_spark.functions.sampling import pack_sequences
    from searchengine_spark.functions.text import tokens_col
    d = _docs(spark, sf_dir).withColumn(
        "n_tokens", F.size(tokens_col(F.col("text"))))
    return pack_sequences(d, 512, "n_tokens", "doc_id")


def _q_contamination(spark, sf_dir):
    """Benchmark decontamination: 3-gram shingle overlap of every doc vs a
    synthetic eval set (every 25th doc). The planted members must report
    overlap 1.0; sharing is n-gram-level so unrelated docs score low."""
    from searchengine_spark.functions.dedup import contamination_check
    d = _docs(spark, sf_dir)
    bench = d.filter(F.col("doc_id") % 25 == 0)
    out = contamination_check(d, bench, n=3, threshold=0.5)
    return out.withColumn("contaminated", F.col("contaminated").cast("long"))


def _q_dedup_cross(spark, sf_dir):
    """Cross-corpus exact dedup: new-crawl docs (all) anti-joined against
    an existing corpus (every 5th doc) on the normalized fingerprint —
    the planted members drop, the rest survive."""
    from searchengine_spark.functions.dedup import dedup_against
    d = _docs(spark, sf_dir)
    return dedup_against(d, d.filter(F.col("doc_id") % 5 == 0))


def _q_grouped_topk(spark, sf_dir):
    """Conversation-level ranking (search_grouped): per-turn BM25 over the
    full match set aggregated per conversation (sum), top-k GROUPS with
    match count + best turn — over the same multi-turn shaping the
    collapse entry uses (doc_id % COLLAPSE_GROUPS conversations)."""
    from searchengine_spark.operators.indexer import build_index
    from searchengine_spark.operators.search import search_grouped
    key = (sf_dir, "collapse")
    _INDEX_CACHE[key] = _grouped_index_for(spark, sf_dir)
    idx = _INDEX_CACHE[key]
    g = search_grouped(idx, " ".join(BM25_Q), k=K, agg="sum", mode="bm25")
    best_meta = idx["docs"].select(F.col("doc_id").alias("best_doc_id"),
                                   "conv_id", "turn_idx")
    return (g.join(best_meta, "best_doc_id")
            .select(F.substring("group", 4, 4).cast("long").alias("grp"),
                    F.round("score", 6).alias("score"),
                    F.col("n_turns").cast("long").alias("n_turns"),
                    (F.col("turn_idx").cast("long") * COLLAPSE_GROUPS
                     + F.substring("conv_id", 4, 4).cast("long"))
                    .alias("best_doc_id"),
                    F.round("best_doc_score", 6).alias("best_doc_score")))


def _q_dedup_exact(spark, sf_dir):
    """S2/dedup: exact dedup by normalized-text fingerprint."""
    from searchengine_spark.functions.dedup import exact_dedup
    return exact_dedup(_docs(spark, sf_dir))


def _q_dedup_jaccard(spark, sf_dir):
    """Near-dup pairs: 3-gram Jaccard ≥ 0.2 over a doc_id<150 slice."""
    from searchengine_spark.functions.dedup import jaccard_pairs
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 150)
    return jaccard_pairs(d, threshold=0.2)


def _q_sim_cosine_topk(spark, sf_dir):
    """ANN baseline: brute-force cosine top-k vs the vec_id=0 embedding."""
    from searchengine_spark.functions.similarity import cosine_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    return cosine_topk(emb, qvec, k=K)


def _q_search_after(spark, sf_dir):
    """Cursor (search_after) pagination: page 2 of the BM25 ranking via the
    page-1 tail cursor — must equal the offset-10 slice, at LIMIT k cost."""
    from searchengine_spark.operators.search import search
    index = _index_for(spark, sf_dir)
    q = " ".join(BM25_Q)
    page1 = search(index, q, k=K, mode="bm25").collect()
    cursor = (page1[-1]["score"], page1[-1]["doc_id"])
    hits = search(index, q, k=K, mode="bm25", search_after=cursor)
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _q_sort_recent(spark, sf_dir):
    """Field-sorted retrieval: BM25 match set ordered by ts desc (recency
    feed), top-10, scores still computed. Under the entry's shaping
    ts = 2026-01-01 + doc_id s, so ts desc == doc_id desc in the oracle."""
    from searchengine_spark.operators.search import search
    index = _index_for(spark, sf_dir)
    hits = search(index, " ".join(BM25_Q), k=K, mode="bm25", sort_by="ts")
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _q_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval: BM25 top-100 (real engine) + exact cosine top-100
    fused by reciprocal-rank fusion (k=60), top-10. Embedding ids == the
    index's dense doc ids under the zero-padded conv shaping."""
    from searchengine_spark.operators.hybrid import hybrid_search
    index = _index_for(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    hits = hybrid_search(index, " ".join(BM25_Q), emb, qvec, k=K,
                         n_lex=100, n_vec=100)
    return hits.select("doc_id", F.round("score", 6).alias("score"),
                       F.col("lex_rank").cast("long").alias("lex_rank"),
                       F.col("vec_rank").cast("long").alias("vec_rank"))


def _q_multi_fusion(spark, sf_dir):
    """N-arm weighted RRF (fuse_rankings): BM25 top-100 + exact cosine
    top-100 + a recency prior (ts desc, weight 0.5) fused in one call —
    the ensemble-serving shape past two arms. Embedding ids == dense doc
    ids under this corpus shaping; ts = base + doc_id seconds, so the
    recency ranking is doc_id desc in the oracle."""
    from searchengine_spark.operators.hybrid import fuse_rankings
    from searchengine_spark.operators.search import search
    from searchengine_spark.functions.similarity import cosine_topk
    index = _index_for(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in
            emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    lex = search(index, " ".join(BM25_Q), k=100).select("doc_id", "score")
    vec = cosine_topk(emb, qvec, k=100) \
        .select(F.col("vec_id").cast("long").alias("doc_id"), "cos")
    rec = (index["docs"]
           .select("doc_id", F.col("ts").cast("double").alias("score"))
           .orderBy(F.col("score").desc(), F.col("doc_id").asc())
           .limit(100))
    out = fuse_rankings({"lex": lex, "vec": vec, "rec": rec}, k=K,
                        weights={"lex": 1.0, "vec": 1.0, "rec": 0.5},
                        score_cols={"vec": "cos"})
    return out.select("doc_id", F.round("score", 6).alias("score"),
                      F.col("lex_rank").cast("long").alias("lex_rank"),
                      F.col("vec_rank").cast("long").alias("vec_rank"),
                      F.col("rec_rank").cast("long").alias("rec_rank"))


def _q_count(spark, sf_dir):
    """Total-hits count with a NOT clause: |docs matching any of BM25_Q,
    not containing NOT_T)| — exactly one row, zero included."""
    from searchengine_spark.operators.search import search_count
    index = _index_for(spark, sf_dir)
    return search_count(index, " ".join(BM25_Q), exclude=NOT_T)


def _q_facets_minute(spark, sf_dir):
    """Date-histogram facet: the BM25 match set bucketed by minute(ts)
    (ts = 2026-01-01 + doc_id s under the entry's shaping, so buckets are
    doc_id // 60) — the timeline panel of a search UI, counted by the
    multi-dim facet path in one job."""
    from searchengine_spark.operators.search import search_facets
    index = _index_for(spark, sf_dir)
    expr = F.date_format(F.date_trunc("minute", F.col("ts")),
                         "yyyy-MM-dd HH:mm")
    return search_facets(index, " ".join(BM25_Q), by={"minute": expr})


def _q_boost_recent(spark, sf_dir):
    """Function-score ranking: BM25 × recency decay 1/(1 + age_minutes),
    age anchored at the NEWEST doc's ts (= base + (n_docs-1) s under the
    shaping) so age ≥ 0 and the denominator ≥ 1 at every sf. The boost
    column is a pure docs expression — the engine multiplies it into each
    match's score before the top-k."""
    from searchengine_spark.operators.search import search
    index = _index_for(spark, sf_dir)
    base = 1767225600.0  # epoch of 2026-01-01 00:00:00 UTC (entry shaping)
    newest = base + float(index["stats"]["n_docs"] - 1)
    age_min = (F.lit(newest) - F.col("ts").cast("double")) / F.lit(60.0)
    boost = F.lit(1.0) / (F.lit(1.0) + age_min)
    hits = search(index, " ".join(BM25_Q), k=K, mode="bm25", boost_by=boost)
    return hits.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _q_facets_metrics(spark, sf_dir):
    """Metric facets (terms aggregation with sub-metrics): the BM25 match
    set bucketed by doc_id % 5 with per-facet count + avg/max analyzed
    doc length — one groupBy carries count and metrics together."""
    from searchengine_spark.operators.search import search_facets
    index = _index_for(spark, sf_dir)
    out = search_facets(index, " ".join(BM25_Q),
                        by=_orig_doc_id() % 5,
                        metrics={"avg_dl": F.avg("dl"),
                                 "max_dl": F.max("dl")})
    return out.select("facet", "n_docs",
                      F.round("avg_dl", 6).alias("avg_dl"),
                      F.col("max_dl").cast("long").alias("max_dl"))


HYBRID_ANN_OVERLAP_FLOOR = 0.7  # fused-top-k overlap, ANN arm vs exact arm
# (measured 0.9 at both sf dirs with n_probe=16 on the near-orthogonal
# synthetic corpus — the hardest regime for ANN; floor set with margin)


def _q_hybrid_ann(spark, sf_dir):
    """Hybrid with the PERSISTED IVF ANN as the vector arm, gated vs the
    exact-vector hybrid: the lexical arm must be IDENTICAL (same ranks for
    shared docs — fusion is rank-based, so the lex side is untouched by
    the vector source), and the fused top-k must overlap the exact fusion
    above a stated floor. This ties the partition-pruned ANN path into
    the hybrid surface with a quantitative gate instead of rows-only."""
    from searchengine_spark.functions.similarity import ivf_index_topk
    from searchengine_spark.operators.hybrid import hybrid_search
    index = _index_for(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    q = " ".join(BM25_Q)
    ann = ivf_index_topk(_ann_index_for(spark, sf_dir, "ivf"), qvec,
                         k=100, n_probe=16)
    approx = hybrid_search(index, q, emb, qvec, k=K, n_lex=100, n_vec=100,
                           vec_hits=ann).collect()
    exact = hybrid_search(index, q, emb, qvec, k=K,
                          n_lex=100, n_vec=100).collect()
    lex_a = {r["doc_id"]: r["lex_rank"] for r in approx}
    lex_e = {r["doc_id"]: r["lex_rank"] for r in exact}
    shared = set(lex_a) & set(lex_e)
    overlap = len(shared) / float(K)
    lex_match = all(lex_a[d] == lex_e[d] for d in shared)
    return _gate_df(spark, [
        ("n_returned", float(len(approx))),
        ("lex_ranks_match", 1.0 if lex_match else 0.0),
        ("overlap_ok", 1.0 if overlap >= HYBRID_ANN_OVERLAP_FLOOR else 0.0),
    ])


HYB_Q2 = ["spark", "hash"]  # second batched-hybrid query (in-vocab terms)


def _q_hybrid_batched(spark, sf_dir):
    """Batched hybrid: two (text query, query vector) pairs — one lexical
    batch job + ONE embedding scan scoring both vectors — fused per query
    by RRF; per-query rows identical to single hybrid_search."""
    from searchengine_spark.operators.hybrid import hybrid_search_many
    index = _index_for(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    vrows = {r["vec_id"]: r["embedding"]
             for r in emb.filter(F.col("vec_id").isin([0, 1])).collect()}
    hits = hybrid_search_many(
        index, {"a": " ".join(BM25_Q), "b": " ".join(HYB_Q2)}, emb,
        {"a": [float(x) for x in vrows[0]],
         "b": [float(x) for x in vrows[1]]},
        k=K, n_lex=100, n_vec=100)
    return hits.select("query_id", F.col("rank").cast("long").alias("rank"),
                       "doc_id", F.round("score", 6).alias("score"),
                       F.col("lex_rank").cast("long").alias("lex_rank"),
                       F.col("vec_rank").cast("long").alias("vec_rank"))


def _q_text_quality(spark, sf_dir):
    """Quality scoring: token/char counts, avg token length, punct/digit ratio."""
    from searchengine_spark.functions.text import quality_metrics
    return quality_metrics(_docs(spark, sf_dir))


def _q_text_chunks(spark, sf_dir):
    """Docs→passages chunking: 40-token windows overlapping by 10 — the
    pre-index/pre-embed split every passage-retrieval pipeline runs. The
    value hash covers every chunk's full text."""
    from searchengine_spark.functions.text import chunk_documents
    return chunk_documents(_docs(spark, sf_dir), chunk_tokens=40, overlap=10)


def _q10_fragments(spark, sf_dir):
    """Multi-fragment highlighting (ES number_of_fragments; the reference
    snippets only the FIRST matching sentence): docs reshaped into
    multi-sentence text, up to 3 highlighted fragments joined by ' … ',
    value hash over every full fragment string."""
    from searchengine_spark.functions.snippets import fragments_col
    docs = _docs(spark, sf_dir).withColumn(
        "text", F.regexp_replace(F.col("text"), " batch ", ". "))
    return docs.select(
        "doc_id",
        fragments_col(F.col("text"), " ".join(BM25_Q),
                      n_fragments=3).alias("snippet"))


def _q_text_hot_lines(spark, sf_dir):
    """Corpus-level line dedup (drop_hot_lines): synthetic boilerplate
    appended per doc — a footer in EVERY doc (hot), one in every 7th
    (hot), one in every 100th (below the floor, kept) — then lines in
    more than 10 distinct docs are dropped and docs reassembled. The
    value hash covers every reassembled doc string."""
    from searchengine_spark.functions.text import drop_hot_lines
    docs = _docs(spark, sf_dir).withColumn(
        "text",
        F.concat(F.regexp_replace(F.col("text"), " batch ", ".\n"),
                 F.lit("\nsubscribe to our newsletter today"),
                 F.when(F.col("doc_id") % 7 == 0,
                        F.lit("\nfollow us for updates now"))
                 .otherwise(F.lit("")),
                 F.when(F.col("doc_id") % 100 == 0,
                        F.lit("\nrare footer line here"))
                 .otherwise(F.lit(""))))
    return drop_hot_lines(docs, max_docs=10)


def _passage_index_for(spark, sf_dir):
    """Chunk-level index (40-token windows, 10 overlap — the text_chunks
    shaping) over zero-padded string parent ids."""
    from searchengine_spark.operators.passages import build_passage_index

    def _build():
        docs = _docs(spark, sf_dir).select(
            F.format_string("doc%08d", F.col("doc_id")).alias("doc_id"),
            "text")
        return build_passage_index(docs, chunk_tokens=40, overlap=10)

    return _disk_cached_index(spark, sf_dir, "passages", _build)


def _q_passage_topk(spark, sf_dir):
    """maxP passage retrieval (passage_search): docs chunked into 40-token
    windows (overlap 10), BM25 over the PASSAGE corpus (passage-level
    df/avgdl/N), every matching passage folded to its parent doc by max
    score with the best passage ordinal, doc-level top-10."""
    from searchengine_spark.operators.passages import passage_search
    index = _passage_index_for(spark, sf_dir)
    out = passage_search(index, " ".join(BM25_Q), k=K, agg="max")
    return out.select(
        F.substring("parent_id", 4, 8).cast("long").alias("doc_id"),
        "best_chunk", "n_chunks", F.round("score", 6).alias("score"))


def _q_batched_passage(spark, sf_dir):
    """Batched maxP (passage_search_many): two queries' doc-level top-10
    from ONE decode pass over the passage index — per-query rows
    identical to single passage_search."""
    from searchengine_spark.operators.passages import passage_search_many
    index = _passage_index_for(spark, sf_dir)
    out = passage_search_many(
        index, {"qa": " ".join(BM25_Q), "qb": "hash join"}, k=K, agg="max")
    return out.select(
        "query_id", "rank",
        F.substring("parent_id", 4, 8).cast("long").alias("doc_id"),
        "best_chunk", "n_chunks", F.round("score", 6).alias("score"))


def _q_eval_retrieval(spark, sf_dir):
    """Retrieval-quality eval harness (eval_retrieval): precision/recall/
    RR/nDCG@10 of the engine's own batched BM25 run against deterministic
    graded judgments (doc_id<300 pool: rel 2 on %11, rel 1 on even). The
    oracle recomputes the full run (rank-exact BM25 SQL) AND the metrics."""
    from searchengine_spark.operators.evaluate import eval_retrieval
    from searchengine_spark.operators.search import search_many
    index = _index_for(spark, sf_dir)
    run = (search_many(index,
                       {"qa": " ".join(BM25_Q), "qb": " ".join(BATCH_Q2)},
                       k=K, mode="bm25")
           .select("query_id", _orig_doc_id(), "score"))
    rel = (F.when(F.col("doc_id") % 11 == 0, 2)
           .when(F.col("doc_id") % 2 == 0, 1).otherwise(0))
    j = (_docs(spark, sf_dir).select("doc_id").filter(F.col("doc_id") < 300)
         .select(F.explode(F.array(F.lit("qa"), F.lit("qb")))
                 .alias("query_id"),
                 "doc_id", rel.alias("rel")))
    out = eval_retrieval(run, j, k=K)
    return out.select("query_id", "n_rel",
                      F.round("precision", 6).alias("precision"),
                      F.round("recall", 6).alias("recall"),
                      F.round("rr", 6).alias("rr"),
                      F.round("ndcg", 6).alias("ndcg"))


_SPAN_FIXED = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed "
               "do eiusmod tempor incididunt ut labore et dolore magna "
               "aliqua")
_SPAN_SUFFIX = " please subscribe to our channel and hit the bell icon now"


def _q_text_span_dedup(spark, sf_dir):
    """ExactSubstr-style repeated-span removal (dedup_repeated_ngrams):
    every 50th doc is replaced by one fixed 19-token paragraph (mutual
    full-doc duplicates — all but the first come back EMPTY), every
    other 3rd doc gets an 11-token boilerplate suffix (cut everywhere
    but its first occurrence), window=8. The value hash covers every
    rebuilt doc string + its removed-token count."""
    from searchengine_spark.functions.text import dedup_repeated_ngrams
    docs = _docs(spark, sf_dir).withColumn(
        "text",
        F.when(F.col("doc_id") % 50 == 9, F.lit(_SPAN_FIXED))
        .when(F.col("doc_id") % 3 == 0,
              F.concat(F.col("text"), F.lit(_SPAN_SUFFIX)))
        .otherwise(F.col("text")))
    return dedup_repeated_ngrams(docs, window=8)


def _q_text_sa_dedup(spark, sf_dir):
    """Exact-substring dedup via PREFIX-DOUBLING SUFFIX RANKS
    (functions/suffix.py — the corpus-scale ExactSubstr formulation:
    O(log L) shift-join + re-rank rounds over O(n) integer rows, vs the
    windowed op's O(n·L) string hashing). Same corpus shaping and the
    SAME oracle as text_span_dedup: the two formulations are
    contractually row-identical at window == min_len, so the value hash
    pins both the dedup output AND the equivalence."""
    from searchengine_spark.functions.suffix import dedup_exact_substr
    docs = _docs(spark, sf_dir).withColumn(
        "text",
        F.when(F.col("doc_id") % 50 == 9, F.lit(_SPAN_FIXED))
        .when(F.col("doc_id") % 3 == 0,
              F.concat(F.col("text"), F.lit(_SPAN_SUFFIX)))
        .otherwise(F.col("text")))
    return dedup_exact_substr(docs, min_len=8)


def _q_text_ngram_counts(spark, sf_dir):
    """Corpus top-50 trigrams by occurrence count (boilerplate/template
    mining staple): one explode + one hash agg + TakeOrderedAndProject."""
    from searchengine_spark.functions.text import ngram_counts
    return ngram_counts(_docs(spark, sf_dir), n=3, k=50, min_count=2)


def _q_text_collocations(spark, sf_dir):
    """PMI-scored bigram collocations (Church-Hanks phrase mining), count
    floor 5, top-30 by PMI with 9-dp tie-breaks."""
    from searchengine_spark.functions.text import collocations
    rows = collocations(_docs(spark, sf_dir), k=30, min_count=5)
    return rows.select("w1", "w2", "n_ab",
                       F.round("pmi", 6).alias("pmi"))


def _en_index_for(spark, sf_dir):
    """en_simple-analyzed index over a plural-shaped corpus: every doc
    gets one deterministic extra token cycling (tables, table, queries,
    query, <none>) by doc_id%5, so the S-stemmer path is actually load-
    bearing in retrieval (the base corpus has no plural forms)."""
    from searchengine_spark.operators.indexer import build_index

    def _build():
        d = _docs(spark, sf_dir)
        extra = F.element_at(
            F.array(F.lit("tables"), F.lit("table"), F.lit("queries"),
                    F.lit("query"), F.lit("")),
            (F.col("doc_id") % 5 + 1).cast("int"))
        t = d.select(
            F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
            F.lit(0).alias("turn_idx"), F.lit("user").alias("role"),
            F.concat_ws(" ", F.col("text"), extra).alias("text"),
            F.lit(None).cast("string").alias("tool"),
            F.lit(None).cast("timestamp").alias("ts"))
        return build_index(t, dictionary="en_simple")

    return _disk_cached_index(spark, sf_dir, "en_simple", _build)


def _porter_index_for(spark, sf_dir):
    """en_porter-analyzed index over a derivation-shaped corpus: every
    doc gets one extra token cycling (connection, connected, connecting,
    generalization, <none>) by doc_id%5, so the full Porter algorithm is
    load-bearing in retrieval (the base vocab has no derivations)."""
    from searchengine_spark.operators.indexer import build_index

    def _build():
        d = _docs(spark, sf_dir)
        extra = F.element_at(
            F.array(F.lit("connection"), F.lit("connected"),
                    F.lit("connecting"), F.lit("generalization"),
                    F.lit("")),
            (F.col("doc_id") % 5 + 1).cast("int"))
        t = d.select(
            F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
            F.lit(0).alias("turn_idx"), F.lit("user").alias("role"),
            F.concat_ws(" ", F.col("text"), extra).alias("text"),
            F.lit(None).cast("string").alias("tool"),
            F.lit(None).cast("timestamp").alias("ts"))
        return build_index(t, dictionary="en_porter")

    return _disk_cached_index(spark, sf_dir, "en_porter", _build)


def _q_bm25_porter_topk(spark, sf_dir):
    """BM25 top-10 through the FULL Porter stemmer (resources/
    en_porter.py — the Porter 1980 algorithm as the en analyzer's rule
    fallback): the whole connection/connected/connecting family
    co-retrieves under 'connection', and 'generalizations' reaches
    'generalization' through the gener- chain. Oracle: the same BM25 SQL
    over stems resolved via a COMMITTED (word → stem) map computed by an
    independent CV-pattern reimplementation
    (tests/data/make_expected_porter.py) — any corpus word the two
    implementations stem differently breaks the value hash."""
    from searchengine_spark.operators.search import search
    out = search(_porter_index_for(spark, sf_dir),
                 "connection generalizations", k=K, mode="bm25")
    return out.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _q_pipeline_pack_token_ids(spark, sf_dir):
    """Tokenize → encode (32-term vocab + <unk>) → GPT-style packing into
    512-token sequences on the deterministic hash-ordered stream; one row
    per token as (seq_id, pos, token_id)."""
    from searchengine_spark.functions.vocab import (build_vocab,
                                                    pack_token_ids)
    docs = _docs(spark, sf_dir)
    vocab = build_vocab(docs, size=32)
    out = pack_token_ids(docs, vocab, seq_len=512)
    return out.select(F.col("seq_id").cast("long").alias("seq_id"),
                      F.col("pos").cast("long").alias("pos"),
                      "token_id")


def _q_bm25_en_topk(spark, sf_dir):
    """BM25 top-10 through the en_simple analyzer (English stop list +
    irregular map + Harman S-stemmer): plural surface forms (tables,
    queries) and singulars co-retrieve under the stemmed lemmas."""
    from searchengine_spark.operators.search import search
    out = search(_en_index_for(spark, sf_dir), "table query", k=K,
                 mode="bm25")
    return out.select(_orig_doc_id(), F.round("score", 6).alias("score"))


def _q_pipeline_encode_ids(spark, sf_dir):
    """Tokenize-to-ids: frequency-ordered vocab (id 0 = <unk>, terms by
    count desc / term asc, capped at 32) built by the distributed
    prefix-sum id assigner, then every doc encoded as exploded
    (doc_id, pos, token_id) rows with UNK fallback."""
    from searchengine_spark.functions.vocab import build_vocab, encode_ids
    docs = _docs(spark, sf_dir)
    vocab = build_vocab(docs, size=32)
    out = encode_ids(docs, vocab)
    return out.select("doc_id", F.col("pos").cast("int").alias("pos"),
                      "token_id")


def _q_corpus_profile(spark, sf_dir):
    """Per-(lang, source) corpus profile: doc/token/char totals + exact
    token-count percentiles — the pre-mixing budget table."""
    from searchengine_spark.functions.text import corpus_profile
    out = corpus_profile(_docs(spark, sf_dir), by=["lang", "source"])
    return out.select(
        "lang", "source", F.col("n_docs").cast("long").alias("n_docs"),
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.col("total_chars").cast("long").alias("total_chars"),
        F.round("mean_tokens", 6).alias("mean_tokens"),
        F.round("p50_tokens", 6).alias("p50_tokens"),
        F.round("p90_tokens", 6).alias("p90_tokens"),
        F.round("p99_tokens", 6).alias("p99_tokens"))


def _q_text_nb_classify(spark, sf_dir):
    """fasttext/CCNet-style linear quality classifier as multinomial NB:
    train on the documents table (label = lang, add-1 smoothing over the
    global vocab + OOV slot, log priors from doc counts), self-classify
    every doc; score is the length-normalized log-joint, argmax with
    (round-9 desc, label asc) tie-breaks."""
    from searchengine_spark.functions.classify import nb_classify, train_nb
    docs = _docs(spark, sf_dir)
    model = train_nb(docs, label_col="lang")
    out = nb_classify(docs, model)
    return out.select("doc_id", "pred",
                      F.col("n_tokens").cast("long").alias("n_tokens"),
                      F.round("score", 6).alias("score"))


def _q_text_cnb_classify(spark, sf_dir):
    """Complement NB (Rennie et al. 2003) — the class-imbalance-robust
    variant: each label's weights are estimated from every OTHER label's
    counts (w(t,y) = −log((Σ_{y'≠y} c(t,y') + α)/(N_¬y + α(V+1)))), the
    dense vocab×labels conditional grid, argmax with the engine-canonical
    (round-9 desc, label asc) tie-break."""
    from searchengine_spark.functions.classify import nb_classify, train_nb
    docs = _docs(spark, sf_dir)
    model = train_nb(docs, label_col="lang", complement=True)
    out = nb_classify(docs, model)
    return out.select("doc_id", "pred",
                      F.col("n_tokens").cast("long").alias("n_tokens"),
                      F.round("score", 6).alias("score"))


def _q_text_gopher(spark, sf_dir):
    """Gopher/MassiveText document-quality rule battery: measured signals
    (word count, mean word length, symbol/bullet/ellipsis/alpha
    fractions, stop-word count) + the overall pass flag, published
    thresholds."""
    from searchengine_spark.functions.text import gopher_rules
    out = gopher_rules(_docs(spark, sf_dir))
    return out.select(
        "doc_id", F.col("n_words").cast("long").alias("n_words"),
        F.round("mean_word_len", 6).alias("mean_word_len"),
        F.round("symbol_ratio", 6).alias("symbol_ratio"),
        F.round("bullet_frac", 6).alias("bullet_frac"),
        F.round("ellipsis_frac", 6).alias("ellipsis_frac"),
        F.round("alpha_frac", 6).alias("alpha_frac"),
        F.col("n_stop").cast("long").alias("n_stop"),
        F.col("passes").cast("int").alias("passes"))


def _q_text_unigram_ppl(spark, sf_dir):
    """CCNet-style quality signal: per-doc unigram-LM perplexity,
    self-scored (MLE model trained on the corpus itself — the in-domain
    score; no OOV by construction)."""
    from searchengine_spark.functions.text import unigram_lm_perplexity
    out = unigram_lm_perplexity(_docs(spark, sf_dir))
    return out.select("doc_id", "n_tokens",
                      F.round("log_ppl", 6).alias("log_ppl"),
                      F.round("ppl", 4).alias("ppl"))


def _q_text_bigram_ppl(spark, sf_dir):
    """Stupid-Backoff bigram-LM score-perplexity (Brants 2007 — the
    web-scale smoothing: relative frequencies + fixed backoff, no
    normalization pass), self-scored: first token at the add-one unigram
    base, later tokens at c(v,w)/c(v) or alpha·S1(w) on unseen bigrams.
    The order-sensitive signal unigram perplexity can't see."""
    from searchengine_spark.functions.text import bigram_lm_perplexity
    out = bigram_lm_perplexity(_docs(spark, sf_dir))
    return out.select("doc_id", F.col("n_tokens").cast("long").alias("n_tokens"),
                      F.round("log_ppl", 6).alias("log_ppl"),
                      F.round("ppl", 4).alias("ppl"))


def _q_text_unigram_xppl(spark, sf_dir):
    """The CCNet setup proper: train a Laplace-smoothed unigram LM on the
    even-doc_id half (the 'clean reference'), score the odd half (the
    'crawl') — unseen tokens take the model's OOV mass."""
    from searchengine_spark.functions.text import (train_unigram_lm,
                                                   unigram_lm_perplexity)
    docs = _docs(spark, sf_dir)
    lm = train_unigram_lm(docs.filter(F.col("doc_id") % 2 == 0))
    out = unigram_lm_perplexity(docs.filter(F.col("doc_id") % 2 == 1), lm=lm)
    return out.select("doc_id", "n_tokens",
                      F.round("log_ppl", 6).alias("log_ppl"),
                      F.round("ppl", 4).alias("ppl"))


def _q_text_pii_scrub(spark, sf_dir):
    """PII redaction: deterministic synthetic PII appended per doc (an
    email + a phone), then the sequential regex scrub — the value hash
    verifies the full redacted string and every per-category count."""
    from searchengine_spark.functions.text import scrub_pii
    docs = _docs(spark, sf_dir).withColumn(
        "text", F.concat(F.col("text"), F.lit(" contact doc"),
                         F.col("doc_id").cast("string"),
                         F.lit("@example.com or 555-123-4567")))
    return scrub_pii(docs)


def _q_text_clean_lines(spark, sf_dir):
    """C4-style line cleaning over a deterministic line shaping (' batch '
    → sentence break, terminal '.' appended): ≥3-word lines ending in
    terminal punctuation survive, within-doc duplicates dedupe keep-first,
    docs with no surviving line drop."""
    from searchengine_spark.functions.text import clean_lines
    docs = _docs(spark, sf_dir).withColumn(
        "text", F.concat(F.regexp_replace(F.col("text"), " batch ", ".\n"),
                         F.lit(".")))
    return clean_lines(docs)


def _q_text_repetition(spark, sf_dir):
    """Gopher-style repetition metrics over the same line shaping:
    duplicate-line fraction (array ops) + top-bigram fraction (longest
    run in the sorted bigram array — codegen aggregate, no shuffle)."""
    from searchengine_spark.functions.text import repetition_metrics
    docs = _docs(spark, sf_dir).withColumn(
        "text", F.concat(F.regexp_replace(F.col("text"), " batch ", ".\n"),
                         F.lit(".")))
    return repetition_metrics(docs)


def _q_text_fingerprint(spark, sf_dir):
    """Document fingerprinting: md5 of normalized text."""
    from searchengine_spark.functions.text import fingerprint
    return fingerprint(_docs(spark, sf_dir))


def _q_text_winnowing(spark, sf_dir):
    """Winnowing fingerprints (Schleimer et al. 2003 / MOSS): k-gram
    md5-prefix hashes, rightmost-min per w-window — the partial-overlap
    dedup key (any shared >=w+k-1-token run shares a fingerprint). Pure
    codegen; parity with an independent Python reference pinned by
    tests/test_winnowing.py. Oracle recomputes the selection in SQL."""
    from searchengine_spark.functions.text import winnow_fingerprints
    return winnow_fingerprints(_docs(spark, sf_dir), k=5, w=4)


def _q_lang_id(spark, sf_dir):
    """Heuristic language ID via marker-stopword hits (argmax, ties by code)."""
    from searchengine_spark.functions.text import lang_id
    return lang_id(_docs(spark, sf_dir))


def _q_dedup_winnow_pairs(spark, sf_dir):
    """MOSS-style near-dup pairs: docs sharing >=10 distinct winnowing
    fingerprints (fp-bucketed join, boilerplate df cap) — local-overlap
    dedup beside the whole-set Jaccard family. Oracle wraps the
    text_winnowing selection SQL with the same pair join."""
    from searchengine_spark.functions.dedup import winnow_neardup_pairs
    out = winnow_neardup_pairs(_docs(spark, sf_dir), k=5, w=4,
                               min_shared=10)
    return out.select("id_a", "id_b",
                      F.col("shared").cast("long").alias("shared"))


def _gate_df(spark, rows: list[tuple[str, float]]):
    """Quantitative-gate result: (metric, value) rows, hash-compared against
    an oracle that computes the SQL-expressible metrics exactly and pins the
    expected outcome (1.0) of each checked bound. A bound that fails makes
    the Spark side emit 0.0 → hash mismatch → driver FAIL, so approximate
    operators get a REAL correctness gate instead of a rows-only pass."""
    return spark.createDataFrame(
        [(m, float(round(v, 6))) for m, v in rows], "metric string, value double")


# Quantitative floors for the approximate operators. Values are deterministic
# (all hash families are seeded) — measured at sf0.001 and sf0.01 and set
# with margin; the oracle asserts the *_ok gates are 1.0.
MINHASH_RECALL_FLOOR = 0.9       # recall of LSH candidates vs jaccard≥0.8 truth
MINHASH_PRECISION_FLOOR = 0.5    # candidate precision vs jaccard≥0.2
SIMHASH_SEP_MARGIN_BITS = 8.0    # mean hamming: random pairs − near-dup pairs
# recall@10 vs exact cosine top-k. Context for the floors: the synthetic
# embeddings have NO planted high-similarity neighbors of vec 0 — the true
# top-10 sit at cos≈0.3, the hardest (near-orthogonal) regime for ANN. The
# multi-band 8×8 LSH measures 0.5 (sf0.001) / 0.7 (sf0.01); IVF n_probe=4/16
# measures 0.6 / 0.7. On real embedding workloads (neighbors at cos≥0.7)
# the same constructions are ≥0.97 by the collision formula.
ANN_RECALL_FLOOR_LSH = 0.4
ANN_RECALL_FLOOR_IVF = 0.5
# IVF-PQ with re-rank probes the same cells as IVF and repairs the PQ
# distortion on the shortlist, so its floor matches IVF's
ANN_RECALL_FLOOR_IVFPQ = 0.5
LSH_NEARDUP_RECALL_FLOOR = 0.75  # banded 4×16 measures 0.89 / 0.92


def _q_dedup_minhash(spark, sf_dir):
    """MinHash+LSH candidate generation, gated on precision/recall vs the
    hash-verified n-gram-Jaccard ground truth (VERDICT r2 #1): recall of
    true near-dups (jaccard ≥ 0.8) and precision vs weak near-dups
    (jaccard ≥ 0.2), both computed in Spark from the REAL operator output;
    the oracle recomputes n_truth exactly in SQL and pins both gates at 1.0."""
    from searchengine_spark.functions.dedup import jaccard_pairs, minhash_lsh_pairs
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    cand = minhash_lsh_pairs(d, n_hashes=32, bands=8).persist()
    truth_hi = jaccard_pairs(d, threshold=0.8).select("id_a", "id_b")
    truth_lo = jaccard_pairs(d, threshold=0.2).select("id_a", "id_b")
    n_cand = cand.count()
    n_truth = truth_hi.count()
    hit_hi = cand.join(truth_hi, ["id_a", "id_b"], "inner").count()
    hit_lo = cand.join(truth_lo, ["id_a", "id_b"], "inner").count()
    recall = hit_hi / n_truth if n_truth else 1.0
    precision = hit_lo / n_cand if n_cand else 1.0
    return _gate_df(spark, [
        ("n_truth_pairs_j08", float(n_truth)),
        ("recall_ok", 1.0 if recall >= MINHASH_RECALL_FLOOR else 0.0),
        ("precision_ok", 1.0 if precision >= MINHASH_PRECISION_FLOOR else 0.0),
    ])


SIMHASH_SHIFT = 101  # deterministic dissimilar pairing: (i, (i+SHIFT) % 200)


def _q_dedup_simhash(spark, sf_dir):
    """SimHash signatures, gated on hamming-vs-jaccard monotonicity
    (VERDICT r2 #1): near-dup pairs (jaccard ≥ 0.5 ground truth) must have a
    mean hamming distance ≥ SIMHASH_SEP_MARGIN_BITS below that of a
    deterministic random pairing. The oracle recomputes the truth-pair count
    in SQL and pins the separation gate at 1.0."""
    from searchengine_spark.functions.dedup import jaccard_pairs, simhash
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    sigs = simhash(d).persist()
    truth = jaccard_pairs(d, threshold=0.5).select("id_a", "id_b")
    n_truth = truth.count()
    sa = sigs.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("_ha"))
    sb = sigs.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("_hb"))
    ham = F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
    sim_rows = (truth.join(sa, "id_a").join(sb, "id_b")
                .agg(F.avg(ham).alias("h")).collect())
    mean_sim = sim_rows[0]["h"]
    n_ids = d.count()
    rand_pairs = (sigs.select(F.col("doc_id").alias("id_a"))
                  .withColumn("id_b", (F.col("id_a") + SIMHASH_SHIFT) % n_ids)
                  .join(truth, ["id_a", "id_b"], "left_anti"))
    mean_rand = (rand_pairs.join(sa, "id_a").join(sb, "id_b")
                 .agg(F.avg(ham).alias("h")).collect()[0]["h"])
    sep_ok = (mean_sim is None or
              (mean_rand or 0.0) - mean_sim >= SIMHASH_SEP_MARGIN_BITS)
    return _gate_df(spark, [
        ("n_truth_pairs_j05", float(n_truth)),
        ("separation_ok", 1.0 if sep_ok else 0.0),
    ])


_ANN_CACHE: dict[tuple[str, str], dict] = {}


def _ann_index_for(spark, sf_dir: str, kind: str) -> dict:
    """Persisted ANN index per sf_dir (bucket/centroid computed at ingest,
    stored as a parquet partition column — queries prune, never re-hash)."""
    key = (sf_dir, kind)
    if key not in _ANN_CACHE:
        from searchengine_spark.functions.similarity import (
            build_ivf_index, build_lsh_index, load_ann_index)
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        dim = len(emb.select("embedding").first()["embedding"])
        path = f"/root/repo/.ann_cache/{os.path.basename(sf_dir)}/{kind}"
        if kind == "lsh":
            # OR-construction (8 tables × 8 planes): the single-table layout
            # could not clear any honest recall floor on moderate-similarity
            # neighbors (p^8 collapses at cos≈0.3) — B× storage is the
            # standard price for 1-(1-p^r)^B recall
            build_lsh_index(emb, dim, path, n_planes=8, n_bands=8)
        elif kind == "ivfpq":
            # same sqrt-cell sizing as IVF; m=8 subspaces × 4-bit codes
            # → 8 B/vector vs 256 B raw (32×) in the scoring scan
            from searchengine_spark.functions.similarity import (
                build_ivfpq_index)
            n = emb.count()
            build_ivfpq_index(emb, dim, path,
                              n_centroids=max(8, int(n ** 0.5)),
                              m=8, nbits=4, iters=2)
        elif kind == "opq":
            # IVF-PQ under a learned orthogonal rotation (OPQ): same
            # layout and budgets as the plain-PQ index, rotation in meta
            from searchengine_spark.functions.similarity import (
                build_ivfpq_index)
            n = emb.count()
            build_ivfpq_index(emb, dim, path,
                              n_centroids=max(8, int(n ** 0.5)),
                              m=8, nbits=4, iters=2, opq=True)
        else:
            # standard IVF sizing: n_centroids ~ sqrt(n). A fixed 16 cells
            # let per-cell population grow linearly with the corpus, and
            # recall@10 at a fixed probe count decayed with sf (0.7 at
            # sf0.01 -> 0.4 at sf0.1); sqrt cells + a fixed ~25% probe
            # FRACTION holds recall flat-or-better (0.6/0.8/0.7 measured).
            n = emb.count()
            build_ivf_index(emb, dim, path,
                            n_centroids=max(8, int(n ** 0.5)), iters=2)
        _ANN_CACHE[key] = load_ann_index(spark, path)
    return _ANN_CACHE[key]


def _ann_gates(spark, ann_df, exact_df, k: int, floor: float):
    """Shared ANN gate computation: recall@k vs the exact cosine top-k
    (itself hash-verified as sim_cosine_topk), self-hit (the query vector is
    in the corpus, so rank-1 must be vec_id 0 at cos 1.0), and the returned
    row count (SQL-predictable)."""
    ann_rows = ann_df.collect()
    exact_ids = {r["vec_id"] for r in exact_df.collect()}
    ann_ids = [r["vec_id"] for r in ann_rows]
    recall = (len(exact_ids & set(ann_ids)) / len(exact_ids)) if exact_ids else 1.0
    self_hit = bool(ann_rows) and ann_rows[0]["vec_id"] == 0 and ann_rows[0]["cos"] >= 0.999999
    return _gate_df(spark, [
        ("n_returned", float(len(ann_rows))),
        ("self_hit", 1.0 if self_hit else 0.0),
        ("recall_ok", 1.0 if recall >= floor else 0.0),
    ])


def _q_sim_lsh_topk(spark, sf_dir):
    """LSH ANN over the PERSISTED bucket-partitioned index, gated on
    recall@10 vs the exact cosine top-k (VERDICT r2 #1): the real
    partition-pruned query runs, and the oracle pins recall/self-hit/row
    count instead of a rows-only pass."""
    from searchengine_spark.functions.similarity import cosine_topk, lsh_index_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    ann = lsh_index_topk(_ann_index_for(spark, sf_dir, "lsh"), qvec, k=K, multiprobe=1)
    return _ann_gates(spark, ann, cosine_topk(emb, qvec, k=K), K,
                      ANN_RECALL_FLOOR_LSH)


SEMDEDUP_RECALL_FLOOR = 0.35  # within-cluster pair recall vs exact all-pairs
# (measured 0.46 at sf0.01 / 0.53 at sf0.001 with n_clusters=4, seed 42; the
# synthetic embedding space has no pairs above cos 0.5, so 0.35 is the one
# regime with ground-truth pairs)


def _q_sim_semantic_dedup(spark, sf_dir):
    """SemDeDup quantitative gate: cluster → within-cluster exact pairs →
    components → keep-canonical. Checks, each pinned at 1.0 by the
    oracle: cluster pairs ⊆ exact all-pairs (within-cluster cosines are
    exact, so precision is 1 BY CONSTRUCTION — violated only by a bug),
    kept + victims exactly partition the corpus, no two kept docs form a
    ≥-threshold within-cluster pair (component canonicals are unique),
    and pair recall vs the exact truth ≥ the calibrated floor (the
    clustering is the only approximation)."""
    from searchengine_spark.functions.similarity import (
        cosine_neardup_pairs, semantic_dedup)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    r = semantic_dedup(emb, 64, threshold=0.35, n_clusters=4)
    exact = {(x["id_a"], x["id_b"])
             for x in cosine_neardup_pairs(emb, threshold=0.35).collect()}
    cp = {(x["id_a"], x["id_b"]) for x in r["pairs"].collect()}
    kept = {x["vec_id"] for x in r["kept"].select("vec_id").collect()}
    victims = {x["id"] for x in
               r["components"].filter(F.col("id") != F.col("rep")).collect()}
    recall = len(cp & exact) / max(len(exact), 1)
    clash = sum(1 for a, b in cp if a in kept and b in kept)
    return _gate_df(spark, [
        ("pairs_subset_of_exact", 1.0 if cp <= exact else 0.0),
        ("partition_exact", 1.0 if len(kept) + len(victims) == n else 0.0),
        ("no_kept_neardup_pair", 1.0 if clash == 0 else 0.0),
        ("recall_ok", 1.0 if recall >= SEMDEDUP_RECALL_FLOOR else 0.0),
    ])


def _q_sim_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs (exact all-pairs on a vec_id<300 slice)."""
    from searchengine_spark.functions.similarity import cosine_neardup_pairs
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(F.col("vec_id") < 300)
    return cosine_neardup_pairs(emb, threshold=0.35)


def _q_dedup_clusters(spark, sf_dir):
    """Dedup groups: connected components (min-label propagation) over the
    exact cosine near-dup pairs — the pairs→clusters step every dedup
    pipeline needs before keeping one doc per group."""
    from searchengine_spark.functions.dedup import connected_components
    pairs = _q_sim_neardup(spark, sf_dir)
    return connected_components(pairs)


def _q_dedup_keep_one(spark, sf_dir):
    """End of the dedup pipeline: near-dup pairs → connected components →
    materialized deduplicated table (keep the smallest id per component,
    keep all singletons). Returns the surviving vec_ids; the oracle
    recomputes the components with a recursive CTE."""
    from searchengine_spark.functions.dedup import (connected_components,
                                                    dedup_keep_canonical)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .filter(F.col("vec_id") < 300)
    clusters = connected_components(_q_sim_neardup(spark, sf_dir))
    return dedup_keep_canonical(emb, clusters, id_col="vec_id") \
        .select("vec_id")


def _q_sim_lsh_neardup(spark, sf_dir):
    """LSH-bucketed near-dup pairs, gated against the hash-verified exact
    pairs (sim_neardup_pairs): every LSH pair must BE an exact pair with the
    identical cosine (precision 1.0 by construction — the within-bucket
    cosine is exact, so a violation means the bucketing corrupted the math),
    and recall must clear a floor. n_exact is recomputed exactly in SQL."""
    from searchengine_spark.functions.similarity import (
        cosine_neardup_pairs, lsh_neardup_pairs)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(F.col("vec_id") < 300)
    dim = len(emb.select("embedding").first()["embedding"])
    lshp = lsh_neardup_pairs(emb, dim, threshold=0.35, n_planes=4).persist()
    exact = cosine_neardup_pairs(emb, threshold=0.35).persist()
    n_lsh = lshp.count()
    n_exact = exact.count()
    n_outside = lshp.join(exact, ["id_a", "id_b", "cos"], "left_anti").count()
    recall = n_lsh / n_exact if n_exact else 1.0
    return _gate_df(spark, [
        ("n_exact_pairs", float(n_exact)),
        ("subset_of_exact", 1.0 if n_outside == 0 else 0.0),
        ("recall_ok", 1.0 if recall >= LSH_NEARDUP_RECALL_FLOOR else 0.0),
    ])


def _q_sim_ivf_topk(spark, sf_dir):
    """IVF ANN over the PERSISTED centroid-partitioned index (k-means with
    Lloyd steps at build), gated on recall@10 vs the exact cosine top-k —
    same gate family as sim_lsh_topk."""
    from searchengine_spark.functions.similarity import cosine_topk, ivf_index_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    idx = _ann_index_for(spark, sf_dir, "ivf")
    n_probe = max(2, round(0.25 * len(idx["centroids"])))  # fixed probe FRACTION
    ann = ivf_index_topk(idx, qvec, k=K, n_probe=n_probe)
    return _ann_gates(spark, ann, cosine_topk(emb, qvec, k=K), K,
                      ANN_RECALL_FLOOR_IVF)


def _q_sim_ivfpq_topk(spark, sf_dir):
    """IVF-PQ ANN over the PERSISTED centroid-partitioned index: PQ codes
    (m=8 × 4 bits — 32× smaller than the raw vectors) scored against a
    driver-side lookup table reading ONLY the codes column of the probed
    partitions, then exact-cosine re-rank of the shortlist. Gated on
    recall@10 vs the exact cosine top-k plus a scores-are-exact check (the
    approximation may cost recall, never score fidelity)."""
    from searchengine_spark.functions.similarity import cosine_topk, ivfpq_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in
            emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    idx = _ann_index_for(spark, sf_dir, "ivfpq")
    n_probe = max(2, round(0.25 * len(idx["centroids"])))
    ann = ivfpq_topk(idx, qvec, k=K, n_probe=n_probe, rerank=5 * K).collect()
    exact = {r["vec_id"]: r["cos"] for r in
             cosine_topk(emb, qvec, k=K).collect()}
    recall = (len(set(exact) & {r["vec_id"] for r in ann}) / len(exact)
              if exact else 1.0)
    self_hit = bool(ann) and ann[0]["vec_id"] == 0 and ann[0]["cos"] >= 0.999999
    # re-ranked scores must BE the exact cosine for every overlapping id
    scores_exact = all(r["cos"] == exact[r["vec_id"]] for r in ann
                       if r["vec_id"] in exact)
    return _gate_df(spark, [
        ("n_returned", float(len(ann))),
        ("self_hit", 1.0 if self_hit else 0.0),
        ("recall_ok", 1.0 if recall >= ANN_RECALL_FLOOR_IVFPQ else 0.0),
        ("scores_exact", 1.0 if scores_exact else 0.0),
    ])


def _q_sim_hard_negatives(spark, sf_dir):
    """Contrastive hard-negative mining: for each anchor (anchor →
    positives map), the top-5 most-similar corpus vectors excluding the
    anchor itself and its positives — one shared-norm corpus scan for
    the whole anchor batch, literal anti-join for the exclusions."""
    from searchengine_spark.functions.similarity import mine_hard_negatives
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = mine_hard_negatives(emb, {0: [1, 2], 7: [3]}, k=5)
    return out.select("anchor_id", "vec_id",
                      F.round("cos", 6).alias("cos"), "rank")


def _q_sim_opq_topk(spark, sf_dir):
    """OPQ: IVF-PQ under a LEARNED orthogonal rotation (Ge et al. 2013) —
    the rotation balances variance across PQ subspaces before coding.
    Gated like the plain IVF-PQ row (recall@10 vs exact cosine, self-hit,
    scores-exact via the re-rank) plus the OPQ-specific quantitative
    claims: the stored rotation is orthogonal, and it reconstructs the
    normalized training sample AT LEAST as well as plain PQ under the
    same budgets (each alternation half-step is non-increasing in
    quantization error)."""
    import numpy as np
    from searchengine_spark.functions.similarity import (
        _pq_reconstruct, _pq_train, cosine_topk, ivfpq_topk)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in
            emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    idx = _ann_index_for(spark, sf_dir, "opq")
    n_probe = max(2, round(0.25 * len(idx["centroids"])))
    ann = ivfpq_topk(idx, qvec, k=K, n_probe=n_probe, rerank=5 * K).collect()
    exact = {r["vec_id"]: r["cos"] for r in
             cosine_topk(emb, qvec, k=K).collect()}
    recall = (len(set(exact) & {r["vec_id"] for r in ann}) / len(exact)
              if exact else 1.0)
    self_hit = bool(ann) and ann[0]["vec_id"] == 0 and ann[0]["cos"] >= 0.999999
    scores_exact = all(r["cos"] == exact[r["vec_id"]] for r in ann
                      if r["vec_id"] in exact)
    R = np.asarray(idx["rotation"], dtype=float)
    orthogonal = bool(np.allclose(R @ R.T, np.eye(len(R)), atol=1e-9))
    # reconstruction: OPQ (stored books under R) vs plain PQ, same sample
    sample = emb.select("embedding").orderBy(F.col("vec_id")) \
        .limit(8192).collect()
    mat = np.vstack([np.asarray(r[0], dtype=float) for r in sample])
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    books = np.asarray(idx["codebooks"], dtype=float)
    plain = _pq_train(mat, m=8, nbits=4, iters=8, seed=42)
    err_plain = float(((mat - _pq_reconstruct(mat, plain)) ** 2).sum())
    err_opq = float(((mat @ R - _pq_reconstruct(mat @ R, books)) ** 2).sum())
    return _gate_df(spark, [
        ("n_returned", float(len(ann))),
        ("self_hit", 1.0 if self_hit else 0.0),
        ("recall_ok", 1.0 if recall >= ANN_RECALL_FLOOR_IVFPQ else 0.0),
        ("scores_exact", 1.0 if scores_exact else 0.0),
        ("rotation_orthogonal", 1.0 if orthogonal else 0.0),
        ("opq_no_worse", 1.0 if err_opq <= err_plain + 1e-9 else 0.0),
    ])


def _q_token_count_bpe(spark, sf_dir):
    """BPE-ish pre-tokenizer token counts per doc."""
    from searchengine_spark.functions.text import token_count_bpe
    d = _docs(spark, sf_dir)
    return d.select("doc_id", token_count_bpe(F.col("text")).alias("n_bpe_tokens"))


def _q_sessionize_events(spark, sf_dir):
    """Gap-based sessionization of the events table (30-min gap)."""
    from searchengine_spark.functions.events import sessionize_events_batch
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return sessionize_events_batch(ev, gap_seconds=1800.0)


def _q_event_type_rollup(spark, sf_dir):
    """Per-event-type count/sum/avg rollup."""
    from searchengine_spark.functions.events import event_type_rollup
    return event_type_rollup(spark.read.parquet(f"{sf_dir}/events.parquet"))


def _q_multimodal_features(spark, sf_dir):
    """Multimodal plumbing: synthetic media table → image feature extraction
    (decode stubbed, Spark plumbing real; rows-only check).

    ``luma_hist array<double>`` is flattened to 8 scalar columns here so the
    driver's pandas canonicalization (sort + hash) works on hashable values.
    """
    from pyspark.sql import functions as F
    from searchengine_spark.functions.multimodal import image_features, synthetic_media_df
    feats = image_features(synthetic_media_df(spark, n=48))
    return feats.select(
        "media_id", "mean_r", "mean_g", "mean_b",
        *[F.col("luma_hist")[i].alias(f"luma_h{i}") for i in range(8)])


def _q_multimodal_audio(spark, sf_dir):
    """Audio windowed RMS/ZCR features (stubbed PCM decode; rows-only)."""
    from searchengine_spark.functions.multimodal import audio_features, synthetic_media_df
    return audio_features(synthetic_media_df(spark, n=48), window_ms=500)


def _q_multimodal_png(spark, sf_dir):
    """Image features over REALLY-ENCODED PNG payloads: the engine's own
    pure numpy+zlib PNG codec (functions/multimodal.py png_decode — chunk
    parse, inflate, all five scanline unfilters) decodes payloads written
    by png_encode (the table cycles every filter type). The oracle is a
    committed expected table recomputed from the closed-form SOURCE
    pixels, never through the codecs — an encode OR decode bug breaks
    the value hash (VERDICT r3 #4)."""
    from searchengine_spark.functions.multimodal import (
        image_features, synthetic_real_media_df)
    feats = image_features(synthetic_real_media_df(spark, n=32))
    return feats.select(
        "media_id", "mean_r", "mean_g", "mean_b",
        *[F.col("luma_hist")[i].alias(f"luma_h{i}") for i in range(8)])


def _q_multimodal_wav(spark, sf_dir):
    """Audio RMS/ZCR over REALLY-ENCODED RIFF/WAVE payloads (wav_decode:
    fmt/data parse, PCM16 → mono float at the FILE's sample rate); same
    committed round-trip oracle construction as multimodal_png."""
    from searchengine_spark.functions.multimodal import (
        audio_features, synthetic_real_media_df)
    return audio_features(synthetic_real_media_df(spark, n=32),
                          window_ms=500)


# Keys the round-4 driver correctness artifact already hash-verified
# (the first 50 of the r4 registry order — see CORRECTNESS_r04.json).
# The driver hashes only the FIRST 50 queries() entries per round, so
# queries() below rotates these to the BACK: round 5's official window
# then lands on 50 rows that have only ever been builder-verified
# (VERDICT r4 wrong-#1 / next-#1).
_DRIVER_SAMPLED_R04 = frozenset({
    "t2_t5_tokenize_tf", "a1_term_df", "q2_dictionary_lookup",
    "q3_high_df_prune", "q6_conjunctive_and", "q7_ref_topk",
    "q7_bm25_topk", "q_hot_cached_topk", "q_hot_ref_topk",
    "q_did_you_mean", "q_bm25_tuned", "q_term_boost", "q_prf_topk",
    "q_significant_bigrams", "q_multi_fusion", "q_bm25_not_topk",
    "q_min_match", "q_select_all", "q_querylang_select",
    "q_explain_score", "a5_term_vectors", "a6_doc_term_weights",
    "q_significant_terms", "q_facets", "q_top_hits", "q_facets_multi",
    "q_count", "q_facets_minute", "q_facets_metrics", "q_boost_recent",
    "q9_metadata_projection", "q10_snippets", "q11_bm25_page2",
    "q2_scoped_bm25_topk", "q2_scoped_ref_topk", "q_phrase_topk",
    "q_phrase_not", "q_querylang", "q_querylang_group",
    "q_querylang_time", "q_collapse_topk", "q_querylang_notphrase",
    "q_querylang_qualified", "q_querylang_span", "q_querylang_ospan",
    "q_percolate", "q_percolate_scaled", "q_percolate_table",
    "q_percolate_scored", "q_querylang_regex",
})

# Families the r4 judge called out as never officially driver-sampled,
# in the order we most want official hashes for: the LLM-data-pipeline
# components (dedup / similarity / pipeline / text / multimodal), then
# index-maintenance (s6–s10, shard/compact/merge), then bm25f/en/passage.
_ROTATE_FRONT = [
    "dedup_exact", "dedup_jaccard_pairs", "dedup_minhash_lsh",
    "dedup_simhash", "dedup_contamination", "dedup_cross_corpus",
    "dedup_clusters", "dedup_keep_one",
    "sim_cosine_topk", "sim_mmr_topk", "sim_lsh_topk", "sim_ivf_topk",
    "sim_ivfpq_topk", "sim_opq_topk", "sim_hard_negatives",
    "sim_neardup_pairs", "sim_lsh_neardup_pairs", "sim_semantic_dedup",
    "pipeline_stratified_sample", "pipeline_token_budget_mix",
    "pipeline_temperature_mix", "pipeline_bpe_merges",
    "pipeline_split_corpus", "pipeline_pack_sequences",
    "pipeline_encode_ids", "pipeline_pack_token_ids",
    "text_quality", "text_pii_scrub", "text_lang_id",
    "text_fingerprint", "text_token_count_bpe", "text_gopher",
    "text_repetition", "text_chunks", "text_clean_lines",
    "text_hot_lines", "text_span_dedup", "text_sa_dedup",
    "text_ngram_counts", "text_collocations", "text_nb_classify",
    "text_cnb_classify", "text_unigram_ppl", "q_percolate_dispatch",
    "multimodal_features", "multimodal_audio", "multimodal_png",
    "multimodal_wav",
    "s6_upsert_term_df", "s7_delete_term_df", "s6_upsert_fielded_df",
    "s8_compact_term_df", "s9_merge_term_df", "s10_diff_snapshots",
    "q_compacted_topk", "q_merged_topk", "q_sharded_topk",
    "q_bm25f_topk", "q_bm25_en_topk", "q_bm25_porter_topk",
    "q_passage_topk", "events_sessionize", "events_type_rollup",
    "corpus_profile", "q_hybrid_rrf", "q_hybrid_ann",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    base = {
        "t2_t5_tokenize_tf": _q_tokenize_tf,
        "a1_term_df": _q_term_df,
        "q2_dictionary_lookup": _q_dictionary_lookup,
        "q3_high_df_prune": _q_high_df_prune,
        "q6_conjunctive_and": _q_conjunctive_and,
        "q7_ref_topk": _q_ref_topk,
        "q7_bm25_topk": _q_bm25_topk,
        "q_hot_cached_topk": _q_hot_cached_topk,
        "q_hot_ref_topk": _q_hot_ref_topk,
        "q_did_you_mean": _q_did_you_mean,
        "q_bm25_tuned": _q_bm25_tuned_topk,
        "q_term_boost": _q_term_boost,
        "q_prf_topk": _q_prf_topk,
        "q_significant_bigrams": _q_significant_bigrams,
        "q_multi_fusion": _q_multi_fusion,
        "q_bm25_not_topk": _q_bm25_not_topk,
        "q_min_match": _q_min_match,
        "q_select_all": _q_select_all,
        "q_querylang_select": _q_querylang_select,
        "q_explain_score": _q_explain_score,
        "a5_term_vectors": _a5_term_vectors,
        "a6_doc_term_weights": _a6_doc_term_weights,
        "q_significant_terms": _q_significant_terms,
        "q_facets": _q_facets,
        "q_top_hits": _q_top_hits,
        "q_facets_multi": _q_facets_multi,
        "q_count": _q_count,
        "q_facets_minute": _q_facets_minute,
        "q_facets_metrics": _q_facets_metrics,
        "q_boost_recent": _q_boost_recent,
        "q9_metadata_projection": _q_metadata_projection,
        "q10_snippets": _q_snippets,
        "q11_bm25_page2": _q_bm25_page2,
        "q2_scoped_bm25_topk": _q_scoped_bm25_topk,
        "q2_scoped_ref_topk": _q_scoped_ref_topk,
        "q_phrase_topk": _q_phrase_topk,
        "q_phrase_not": _q_phrase_not,
        "q_querylang": _q_querylang,
        "q_querylang_group": _q_querylang_group,
        "q_querylang_time": _q_querylang_time,
        "q_collapse_topk": _q_collapse_topk,
        "q_querylang_notphrase": _q_querylang_notphrase,
        "q_querylang_qualified": _q_querylang_qualified,
        "q_querylang_span": _q_querylang_span,
        "q_querylang_ospan": _q_querylang_ospan,
        "q_percolate": _q_percolate,
        "q_percolate_scaled": _q_percolate_scaled,
        "q_percolate_table": _q_percolate_table,
        "q_percolate_dispatch": _q_percolate_dispatch,
        "q_percolate_scored": _q_percolate_scored,
        "q_querylang_regex": _q_querylang_regex,
        "q_querylang_exists": _q_querylang_exists,
        "q_synonyms": _q_synonyms,
        "q_span_topk": _q_span_topk,
        "q_ordered_span_topk": _q_ordered_span_topk,
        "q_batched_span": _q_batched_span,
        "q_batched_ordered_span": _q_batched_ordered_span,
        "q_rescore_topk": _q_rescore_topk,
        "q_batched_phrase": _q_batched_phrase,
        "q_near_topk": _q_near_topk,
        "q_batched_near": _q_batched_near,
        "q_batched_bm25": _q_batched_bm25,
        "q_batched_querylang": _q_batched_querylang,
        "q_suggest": _q_suggest,
        "q_suggest_fuzzy": _q_suggest_fuzzy,
        "q_querylang_wildcard": _q_querylang_wildcard,
        "q_querylang_wildcard_suffix": _q_querylang_wildcard_suffix,
        "q_trigram_infix": _q_trigram_infix,
        "q_bool_search": _q_bool_search,
        "q_batched_bool": _q_batched_bool,
        "q_bool_count": _q_bool_count,
        "q_bool_select": _q_bool_select,
        "q_percolate_bool": _q_percolate_bool,
        "q_querylang_min": _q_querylang_min,
        "q_querylang_fuzzy": _q_querylang_fuzzy,
        "q_querylang_count": _q_querylang_count,
        "q_querylang_facets": _q_querylang_facets,
        "q_querylang_bm25f": _q_querylang_bm25f,
        "q_more_like_this": _q_more_like_this,
        "q_batched_not": _q_batched_not,
        "q_batched_scoped": _q_batched_scoped,
        "q_bm25f_topk": _q_bm25f_topk,
        "q_bm25f_scoped": _q_bm25f_scoped,
        "q_bm25f_not": _q_bm25f_not,
        "q_batched_bm25f": _q_batched_bm25f,
        "q_batched_bm25f_not": _q_batched_bm25f_not,
        "s6_upsert_term_df": _q_upsert_term_df,
        "s7_delete_term_df": _q_delete_term_df,
        "s6_upsert_fielded_df": _q_upsert_fielded_df,
        "s8_compact_term_df": _q_compact_term_df,
        "s10_diff_snapshots": _q_diff_snapshots,
        "q_compacted_topk": _q_compacted_topk,
        "s9_merge_term_df": _q_merge_term_df,
        "q_merged_topk": _q_merged_topk,
        "q_sharded_topk": _q_sharded_topk,
        "q_batched_sharded": _q_batched_sharded,
        "q_merged_bm25f": _q_merged_bm25f,
        "a4_index_geometry": _q_index_geometry,
        "a3_statistics": _q_statistics,
        "a3_statistics_per_collection": _q_statistics_per_collection,
        "pipeline_stratified_sample": _q_stratified_sample,
        "pipeline_token_budget_mix": _q_token_budget_mix,
        "pipeline_temperature_mix": _q_temperature_mix,
        "pipeline_bpe_merges": _q_bpe_merges,
        "pipeline_split_corpus": _q_split_corpus,
        "pipeline_pack_sequences": _q_pack_sequences,
        "q_grouped_topk": _q_grouped_topk,
        "dedup_contamination": _q_contamination,
        "dedup_cross_corpus": _q_dedup_cross,
        "dedup_exact": _q_dedup_exact,
        "dedup_jaccard_pairs": _q_dedup_jaccard,
        "dedup_minhash_lsh": _q_dedup_minhash,
        "dedup_simhash": _q_dedup_simhash,
        "sim_cosine_topk": _q_sim_cosine_topk,
        "sim_mmr_topk": _q_sim_mmr_topk,
        "q_hybrid_rrf": _q_hybrid_rrf,
        "q_hybrid_batched": _q_hybrid_batched,
        "q_hybrid_ann": _q_hybrid_ann,
        "q_search_after": _q_search_after,
        "q_sort_recent": _q_sort_recent,
        "sim_lsh_topk": _q_sim_lsh_topk,
        "sim_ivf_topk": _q_sim_ivf_topk,
        "sim_ivfpq_topk": _q_sim_ivfpq_topk,
        "sim_opq_topk": _q_sim_opq_topk,
        "sim_hard_negatives": _q_sim_hard_negatives,
        "sim_neardup_pairs": _q_sim_neardup,
        "sim_semantic_dedup": _q_sim_semantic_dedup,
        "dedup_clusters": _q_dedup_clusters,
        "dedup_keep_one": _q_dedup_keep_one,
        "q_time_travel": _q_time_travel,
        "sim_lsh_neardup_pairs": _q_sim_lsh_neardup,
        "text_token_count_bpe": _q_token_count_bpe,
        "events_sessionize": _q_sessionize_events,
        "events_type_rollup": _q_event_type_rollup,
        "text_quality": _q_text_quality,
        "text_pii_scrub": _q_text_pii_scrub,
        "text_clean_lines": _q_text_clean_lines,
        "text_repetition": _q_text_repetition,
        "text_chunks": _q_text_chunks,
        "q10_fragments": _q10_fragments,
        "text_hot_lines": _q_text_hot_lines,
        "text_span_dedup": _q_text_span_dedup,
        "text_sa_dedup": _q_text_sa_dedup,
        "q_eval_retrieval": _q_eval_retrieval,
        "q_passage_topk": _q_passage_topk,
        "q_batched_passage": _q_batched_passage,
        "text_ngram_counts": _q_text_ngram_counts,
        "text_collocations": _q_text_collocations,
        "text_gopher": _q_text_gopher,
        "text_nb_classify": _q_text_nb_classify,
        "text_cnb_classify": _q_text_cnb_classify,
        "corpus_profile": _q_corpus_profile,
        "pipeline_encode_ids": _q_pipeline_encode_ids,
        "q_bm25_en_topk": _q_bm25_en_topk,
        "q_bm25_porter_topk": _q_bm25_porter_topk,
        "pipeline_pack_token_ids": _q_pipeline_pack_token_ids,
        "text_unigram_ppl": _q_text_unigram_ppl,
        "text_bigram_ppl": _q_text_bigram_ppl,
        "text_unigram_xppl": _q_text_unigram_xppl,
        "text_fingerprint": _q_text_fingerprint,
        "text_winnowing": _q_text_winnowing,
        "dedup_winnow_pairs": _q_dedup_winnow_pairs,
        "text_lang_id": _q_lang_id,
        "multimodal_features": _q_multimodal_features,
        "multimodal_audio": _q_multimodal_audio,
        "multimodal_png": _q_multimodal_png,
        "multimodal_wav": _q_multimodal_wav,
    }
    # Rotation (r5): priority never-driver-sampled rows first, then the
    # remaining never-sampled rows, then the 50 rows r4 already hashed.
    front = {k: base[k] for k in _ROTATE_FRONT if k in base}
    mid = {k: v for k, v in base.items()
           if k not in front and k not in _DRIVER_SAMPLED_R04}
    back = {k: v for k, v in base.items()
           if k in _DRIVER_SAMPLED_R04}
    out = {**front, **mid, **back}
    assert len(out) == len(base), "registry rotation dropped entries"
    return out


# --------------------------------------------------------------------------
# oracle_sql(): DuckDB-equivalent SQL (same aliases, same rounding)
# --------------------------------------------------------------------------

_TOKS = ("select doc_id, unnest(list_filter(string_split_regex("
         "regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'), "
         "x -> x <> '')) as term from documents")

_TF = f"select doc_id, term, count(*) as tf from ({_TOKS}) group by doc_id, term"
_DF = f"select term, count(*) as df from ({_TF}) group by term"
_DL = f"select doc_id, count(*) as dl from ({_TOKS}) group by doc_id"

# the passage corpus (40-token windows, overlap 10 → stride 30) + its
# passage-level BM25 ingredients — shared by the single and batched
# passage oracles
_PASSAGE_CTES = """w as (select doc_id,
                              list_filter(string_split_regex(text, '\\s+'),
                                          x -> x <> '') as words
                       from documents),
            c as (select doc_id, words,
                         greatest(cast(ceil((len(words) - 10) * 1.0 / 30)
                                       as bigint), 1) as nc
                  from w where len(words) > 0),
            e as (select doc_id, words, unnest(range(nc)) as ci from c),
            ch as (select doc_id, cast(ci as int) as chunk_idx,
                          array_to_string(words[ci * 30 + 1 : ci * 30 + 40],
                                          ' ') as text
                   from e),
            ctoks as (select doc_id, chunk_idx,
                             unnest(list_filter(string_split_regex(
                               regexp_replace(lower(text), '[^a-z0-9 ]',
                                              ' ', 'g'), ' +'),
                               x -> x <> '')) as term
                      from ch),
            ctf as (select doc_id, chunk_idx, term, count(*) as tf
                    from ctoks group by doc_id, chunk_idx, term),
            cdf as (select term, count(*) as df from ctf group by term),
            cdl as (select doc_id, chunk_idx, count(*) as dl
                    from ctoks group by doc_id, chunk_idx),
            stats as (select count(*) as n, avg(dl) as avgdl from cdl)"""

# the corpus after the S6 upsert delta (2 replaced docs + 1 insert) — the
# ground truth for the upsert/compact chain oracles
_MOD_DOCS = """select doc_id, text from documents where doc_id not in (7, 11)
              union all select 7, 'replacement text about spark merge operations'
              union all select 11, 'another replacement mentioning hash scan pipelines'
              union all select 10000001, 'entirely new document exercising upsert insert path'"""


def _jaccard_truth_sql(id_cap: int, threshold: float) -> str:
    """Count of n-gram-Jaccard ≥ threshold pairs over doc_id < id_cap — the
    exact ground truth the approximate dedup gates are measured against
    (same shingle/hot-shingle rules as the hash-green dedup_jaccard_pairs)."""
    return f"""
        with toks as (
          select doc_id, list_filter(string_split_regex(
            regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
            x -> x <> '') as t
          from documents where doc_id < {id_cap}),
        sh as (
          select doc_id, list_distinct([array_to_string(t[i:i+2], ' ')
                 for i in range(1, len(t) - 1)]) as shingles
          from toks where len(t) >= 3),
        ex as (select doc_id, unnest(shingles) as shingle from sh),
        hot as (select shingle from ex group by shingle having count(*) > 1000),
        ex2 as (select * from ex where shingle not in (select shingle from hot)),
        pairs as (
          select a.doc_id as id_a, b.doc_id as id_b, count(*) as inter
          from ex2 a join ex2 b using (shingle) where a.doc_id < b.doc_id
          group by a.doc_id, b.doc_id),
        sizes as (select doc_id, len(shingles) as n_sh from sh)
        select count(*) as cnt
        from pairs join sizes sa on sa.doc_id = id_a
                   join sizes sb on sb.doc_id = id_b
        where inter * 1.0 / (sa.n_sh + sb.n_sh - inter) >= {threshold}"""


def _bm25_sql(terms: list[str], k: int, offset: int = 0, scope: str = "",
              exclude: "list[str] | None" = None,
              min_match: int = 0,
              k1: float = 1.2, b: float = 0.75) -> str:
    """BM25 oracle; ``scope`` is an extra predicate on tf.doc_id (candidates
    scoped, idf/avgdl stay corpus-wide — the engine's filtered-search
    semantics for ``search(..., scope=)``); ``exclude`` models the NOT
    clause (drop docs containing ANY excluded term); ``min_match`` models
    minimum-should-match (keep docs matching >= m distinct terms — the tf
    CTE is one row per (term, doc), so count(*) is the distinct-term
    count)."""
    tl = ", ".join(f"'{t}'" for t in terms)
    sc = f" and {scope}" if scope else ""
    xc = ""
    if exclude:
        xl = ", ".join(f"'{t}'" for t in exclude)
        xc = (f" and tf.doc_id not in "
              f"(select doc_id from tf where term in ({xl}))")
    hv = f"\n  having count(*) >= {int(min_match)}" if min_match > 1 else ""
    return f"""
with tf as ({_TF}), dfv as ({_DF}), dl as ({_DL}),
stats as (select count(*) as n, avg(dl) as avgdl from dl),
scored as (
  select tf.doc_id,
         sum( ln(1.0 + (stats.n - dfv.df + 0.5) / (dfv.df + 0.5))
              * (tf.tf * {k1 + 1.0!r}) / (tf.tf + {k1!r} * ({1.0 - b!r} + {b!r} * dl.dl / stats.avgdl)) ) as s
  from tf join dfv using (term) join dl using (doc_id) cross join stats
  where tf.term in ({tl}){sc}{xc}
  group by tf.doc_id{hv})
select doc_id, round(s, 6) as score from scored
order by round(s, 9) desc, doc_id asc limit {k} offset {offset}
"""


def _bm25_rank_sql(terms: list[str], k: int) -> str:
    """Rank-exact BM25 top-k (doc_id, rank) — the engine's full ordering
    (round(s, 9) desc, doc_id asc) exposed as 1-based ranks, for oracles
    that consume positions rather than scores (retrieval eval)."""
    tl = ", ".join(f"'{t}'" for t in terms)
    return f"""
with tf as ({_TF}), dfv as ({_DF}), dl as ({_DL}),
stats as (select count(*) as n, avg(dl) as avgdl from dl),
scored as (
  select tf.doc_id,
         sum( ln(1.0 + (stats.n - dfv.df + 0.5) / (dfv.df + 0.5))
              * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) as s
  from tf join dfv using (term) join dl using (doc_id) cross join stats
  where tf.term in ({tl})
  group by tf.doc_id)
select doc_id, rank from (
  select doc_id,
         row_number() over (order by round(s, 9) desc, doc_id asc) as rank
  from scored) where rank <= {k}
"""


def _bm25_collapse_sql(terms: list[str], k: int, n_groups: int) -> str:
    """Field-collapsing oracle: BM25-score every match, keep each group's
    best row (group = doc_id % n_groups — the entry's conv shaping), then
    the global top-k. Tie-breaks mirror the engine's dense-doc_id order,
    which under the zero-padded shaping is (group, turn) =
    (doc_id % n_groups, doc_id // n_groups)."""
    tl = ", ".join(f"'{t}'" for t in terms)
    return f"""
with tf as ({_TF}), dfv as ({_DF}), dl as ({_DL}),
stats as (select count(*) as n, avg(dl) as avgdl from dl),
scored as (
  select tf.doc_id,
         sum( ln(1.0 + (stats.n - dfv.df + 0.5) / (dfv.df + 0.5))
              * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) as s
  from tf join dfv using (term) join dl using (doc_id) cross join stats
  where tf.term in ({tl})
  group by tf.doc_id),
c as (select doc_id, s from scored
      qualify row_number() over (partition by doc_id % {n_groups}
                                 order by round(s, 9) desc,
                                          doc_id // {n_groups}) = 1)
select doc_id, round(s, 6) as score from c
order by round(s, 9) desc, doc_id % {n_groups}, doc_id // {n_groups}
limit {k}
"""


def _hybrid_ctes(qid: str, terms: list[str], vec_id: int) -> str:
    """Per-query CTE block for the batched-hybrid oracle: BM25 top-100 cut
    by the engine ordering (round 9) then ranked at the fusion quantization
    (round 6), cosine top-100 likewise, RRF-fused, per-query rank."""
    tl = ", ".join(f"'{t}'" for t in terms)
    return f"""
lex_cut_{qid} as (
  select doc_id, s from (
    select tf.doc_id,
           sum( ln(1.0 + (stats.n - dfv.df + 0.5) / (dfv.df + 0.5))
                * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) as s
    from tf join dfv using (term) join dl using (doc_id) cross join stats
    where tf.term in ({tl}) group by tf.doc_id)
  order by round(s, 9) desc, doc_id asc limit 100),
lex_{qid} as (select doc_id, row_number() over (
                 order by round(s, 6) desc, doc_id asc) as lex_rank
              from lex_cut_{qid}),
qv_{qid} as (select embedding::DOUBLE[] as qv from embeddings
             where vec_id = {vec_id}),
cs_{qid} as (select vec_id,
              round(list_dot_product(embedding::DOUBLE[], (select qv from qv_{qid}))
              / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                 * sqrt(list_dot_product((select qv from qv_{qid}), (select qv from qv_{qid})))), 6) as c
             from embeddings),
vec_cut_{qid} as (select vec_id as doc_id, c from cs_{qid}
                  order by c desc, vec_id asc limit 100),
vec_{qid} as (select doc_id, row_number() over (
                 order by round(c, 6) desc, doc_id asc) as vec_rank
              from vec_cut_{qid}),
top_{qid} as (
  select '{qid}' as query_id,
         row_number() over (order by round(s, 9) desc, doc_id asc) as rank,
         doc_id, round(s, 6) as score, lex_rank, vec_rank
  from (select coalesce(l.doc_id, v.doc_id) as doc_id,
               coalesce(1.0::DOUBLE / (60 + lex_rank), 0.0)
               + coalesce(1.0::DOUBLE / (60 + vec_rank), 0.0) as s,
               coalesce(lex_rank, 0) as lex_rank,
               coalesce(vec_rank, 0) as vec_rank
        from lex_{qid} l full join vec_{qid} v on l.doc_id = v.doc_id))"""


def _phrase_sql(terms: list[str], k: int, exclude: str = "") -> str:
    """Exact-phrase oracle: token positions via parallel unnest (zips
    positionally in DuckDB), slot alignment by base = pos - qidx, a doc
    matches at base iff all |phrase| distinct slots appear there.
    ``exclude`` bans docs containing that token anywhere (NOT clause)."""
    vals = ", ".join(f"('{t}', {i})" for i, t in enumerate(terms))
    wc = (f"where doc_id not in (select doc_id from tp "
          f"where term = '{exclude}')" if exclude else "")
    return f"""
with arrs as (select doc_id, list_filter(string_split_regex(
    regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
    x -> x <> '') as arr from documents),
tp as (select doc_id, unnest(arr) as term,
       unnest(range(len(arr))) as pos from arrs),
q as (select * from (values {vals}) as t(term, qidx)),
al as (select tp.doc_id, tp.pos - q.qidx as base, q.qidx
       from tp join q using (term)),
b as (select doc_id, base from al group by doc_id, base
      having count(distinct qidx) = {len(terms)}),
m as (select doc_id, cast(count(*) as bigint) as n_matches
      from b group by doc_id)
select doc_id, n_matches from m {wc}
order by n_matches desc, doc_id asc limit {k}
"""


def _span_pm_ctes(terms: list[str], window: int) -> str:
    """CTE block ending in ``pm`` = docs whose tightest window containing
    one occurrence of EVERY term is ≤ ``window`` (n-way positional join —
    fine at oracle scale; the engine uses a one-pass codegen scan)."""
    srcs = ",\n".join(
        f"a{i} as (select doc_id, pos as p{i} from tp where term = '{t}')"
        for i, t in enumerate(terms))
    joins = "a0 " + " ".join(f"join a{i} using (doc_id)"
                             for i in range(1, len(terms)))
    ps = ", ".join(f"p{i}" for i in range(len(terms)))
    return f"""{srcs},
spans as (select doc_id, greatest({ps}) - least({ps}) as s from {joins}),
pm as (select doc_id from spans group by doc_id having min(s) <= {window})"""


def _ospan_pm_ctes(terms: list[str], window: int) -> str:
    """CTE block ending in ``pm`` = docs whose tightest IN-ORDER window
    over ``terms`` (p0 < p1 < ... strictly increasing) is ≤ ``window`` —
    the '"..."~N!' grammar clause's match set."""
    srcs = ",\n".join(
        f"a{i} as (select doc_id, pos as p{i} from tp where term = '{t}')"
        for i, t in enumerate(terms))
    joins = "a0 " + " ".join(f"join a{i} using (doc_id)"
                             for i in range(1, len(terms)))
    cond = " and ".join(f"p{i} < p{i + 1}" for i in range(len(terms) - 1))
    last = f"p{len(terms) - 1}"
    return f"""{srcs},
spans as (select doc_id, {last} - p0 as s from {joins} where {cond}),
pm as (select doc_id from spans group by doc_id having min(s) <= {window})"""


def _querylang_sql(terms: list[str], phrase: list[str], k: int,
                   not_terms: "list[str] | None" = None,
                   not_phrase: bool = False,
                   span_window: "int | None" = None,
                   ordered: bool = False,
                   scope: str = "") -> str:
    """Query-language oracle: BM25 over ``terms`` (the positive phrase's
    constituents must already be included by the caller, mirroring
    query_search's pos_words), with the phrase's positional match set as a
    candidate filter (or a banned set when ``not_phrase``), and docs
    containing any of ``not_terms`` removed. With ``span_window`` the
    quoted clause is a SPAN ('"..."~N'): pm = docs whose tightest window
    over the clause words is ≤ N instead of exact adjacency (``ordered``
    additionally requires the words in clause order — '"..."~N!'').
    ``scope`` is
    an extra predicate on tf.doc_id (site:/role: qualifier analog).
    idf/dl/avgdl stay corpus-wide (candidate filters don't change
    collection statistics)."""
    tl = ", ".join(f"'{t}'" for t in terms)
    conds = []
    if phrase:
        conds.append(f"tf.doc_id {'not in' if not_phrase else 'in'} "
                     f"(select doc_id from pm)")
    if not_terms:
        xl = ", ".join(f"'{t}'" for t in not_terms)
        conds.append(f"tf.doc_id not in "
                     f"(select doc_id from tf where term in ({xl}))")
    if scope:
        conds.append(scope)
    cond = " and ".join(conds) or "true"
    if phrase and span_window is not None and ordered:
        pm_block = _ospan_pm_ctes(phrase, span_window)
    elif phrase and span_window is not None:
        pm_block = _span_pm_ctes(phrase, span_window)
    elif phrase:
        vals = ", ".join(f"('{t}', {i})" for i, t in enumerate(phrase))
        pm_block = f"""q as (select * from (values {vals}) as t(term, qidx)),
al as (select tp.doc_id, tp.pos - q.qidx as base, q.qidx
       from tp join q using (term)),
pm as (select doc_id from al group by doc_id, base
       having count(distinct qidx) = {len(phrase)})"""
    else:
        pm_block = "pm as (select null::bigint as doc_id where false)"
    return f"""
with tf as ({_TF}), dfv as ({_DF}), dl as ({_DL}),
stats as (select count(*) as n, avg(dl) as avgdl from dl),
arrs as (select doc_id, list_filter(string_split_regex(
    regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
    x -> x <> '') as arr from documents),
tp as (select doc_id, unnest(arr) as term,
       unnest(range(len(arr))) as pos from arrs),
{pm_block},
scored as (
  select tf.doc_id,
         sum( ln(1.0 + (stats.n - dfv.df + 0.5) / (dfv.df + 0.5))
              * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) as s
  from tf join dfv using (term) join dl using (doc_id) cross join stats
  where tf.term in ({tl}) and {cond}
  group by tf.doc_id)
select doc_id, round(s, 6) as score from scored
order by round(s, 9) desc, doc_id asc limit {k}
"""


def _bm25f_sql(terms: list[str], k: int, where: str = "") -> str:
    """BM25F oracle: title (substr 60) w=2, body w=1, b=0.75 per field,
    k1=1.2, idf over max-field df (== field union for the nested title
    layout; the engine documents the same max-df contract). ``where``
    filters the SCORED set (idf/avgdl stay corpus-wide) — the engine's
    filtered-search semantics for ``bm25f_search(..., scope=)``."""
    tl = ", ".join(f"'{t}'" for t in terms)
    wc = f"where {where}" if where else ""
    return f"""
with tt as (select doc_id, unnest(list_filter(string_split_regex(
       regexp_replace(lower(substr(text, 1, 60)), '[^a-z0-9 ]', ' ', 'g'),
       ' +'), x -> x <> '')) as term from documents),
tb as ({_TOKS}),
tf_t as (select doc_id, term, count(*) as tf from tt group by doc_id, term),
tf_b as (select doc_id, term, count(*) as tf from tb group by doc_id, term),
dl_t as (select doc_id, count(*) as dl from tt group by doc_id),
dl_b as (select doc_id, count(*) as dl from tb group by doc_id),
n as (select count(*) as n from documents),
av_t as (select sum(dl) * 1.0 / (select n from n) as a from dl_t),
av_b as (select sum(dl) * 1.0 / (select n from n) as a from dl_b),
df_t as (select term, count(*) as df from tf_t group by term),
df_b as (select term, count(*) as df from tf_b group by term),
dfu as (select coalesce(df_t.term, df_b.term) as term,
               greatest(coalesce(df_t.df, 0), coalesce(df_b.df, 0)) as df
        from df_t full join df_b on df_t.term = df_b.term),
pairs as (
  select coalesce(a.doc_id, b.doc_id) as doc_id,
         coalesce(a.term, b.term) as term,
         2.0 * coalesce(a.tf, 0)
           / (0.25 + 0.75 * coalesce(lt.dl, 0) / (select a from av_t))
         + 1.0 * coalesce(b.tf, 0)
           / (0.25 + 0.75 * coalesce(lb.dl, 0) / (select a from av_b))
         as s
  from (select * from tf_t where term in ({tl})) a
  full join (select * from tf_b where term in ({tl})) b
    on a.doc_id = b.doc_id and a.term = b.term
  left join dl_t lt on lt.doc_id = coalesce(a.doc_id, b.doc_id)
  left join dl_b lb on lb.doc_id = coalesce(a.doc_id, b.doc_id)),
scored as (
  select p.doc_id,
         sum(ln(1.0 + ((select n from n) - dfu.df + 0.5)
                / (dfu.df + 0.5)) * p.s / (1.2 + p.s)) as score
  from pairs p join dfu using (term) group by p.doc_id)
select doc_id, round(score, 6) as score from scored {wc}
order by round(score, 9) desc, doc_id asc limit {k}
"""


def _span_sql(terms: list[str], window: int, k: int) -> str:
    """Standalone span_search oracle: tightest window per doc via the
    n-way positional join, ranked (span asc, doc_id asc)."""
    srcs = ",\n".join(
        f"a{i} as (select doc_id, pos as p{i} from tp where term = '{t}')"
        for i, t in enumerate(terms))
    joins = "a0 " + " ".join(f"join a{i} using (doc_id)"
                             for i in range(1, len(terms)))
    ps = ", ".join(f"p{i}" for i in range(len(terms)))
    return f"""
with arrs as (select doc_id, list_filter(string_split_regex(
    regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
    x -> x <> '') as arr from documents),
tp as (select doc_id, unnest(arr) as term,
       unnest(range(len(arr))) as pos from arrs),
{srcs},
spans as (select doc_id, greatest({ps}) - least({ps}) as s from {joins}),
m as (select doc_id, cast(min(s) as bigint) as span
      from spans group by doc_id)
select doc_id, span from m where span <= {window}
order by span asc, doc_id asc limit {k}
"""


def _rescore_sql(terms: list[str], n: int, k: int, window: int,
                 weight: float) -> str:
    """rescore_search oracle: BM25 top-n cut by the engine ordering, min
    unordered span per doc, final = s + weight/(1+span) when span ≤ window
    else s, top-k by the combined score."""
    tl = ", ".join(f"'{t}'" for t in terms)
    srcs = ",\n".join(
        f"a{i} as (select doc_id, pos as p{i} from tp where term = '{t}')"
        for i, t in enumerate(terms))
    joins = "a0 " + " ".join(f"join a{i} using (doc_id)"
                             for i in range(1, len(terms)))
    ps = ", ".join(f"p{i}" for i in range(len(terms)))
    return f"""
with tf as ({_TF}), dfv as ({_DF}), dl as ({_DL}),
stats as (select count(*) as nd, avg(dl) as avgdl from dl),
scored as (
  select tf.doc_id,
         sum( ln(1.0 + (stats.nd - dfv.df + 0.5) / (dfv.df + 0.5))
              * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) as s
  from tf join dfv using (term) join dl using (doc_id) cross join stats
  where tf.term in ({tl})
  group by tf.doc_id),
topn as (select doc_id, s from scored
         order by round(s, 9) desc, doc_id asc limit {n}),
arrs as (select doc_id, list_filter(string_split_regex(
    regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
    x -> x <> '') as arr from documents),
tp as (select doc_id, unnest(arr) as term,
       unnest(range(len(arr))) as pos from arrs),
{srcs},
sp as (select doc_id, greatest({ps}) - least({ps}) as w from {joins}),
m as (select doc_id, min(w) as span from sp group by doc_id),
fin as (select topn.doc_id,
               topn.s + case when m.span is not null and m.span <= {window}
                             then {weight} / (1 + m.span) else 0 end as f
        from topn left join m using (doc_id))
select doc_id, round(f, 6) as score from fin
order by round(f, 9) desc, doc_id asc limit {k}
"""


def _ordered_span_sql(terms: list[str], window: int, k: int) -> str:
    """Ordered span oracle: same n-way positional join with the strict
    in-order constraint p0 < p1 < ... — span = last − first."""
    srcs = ",\n".join(
        f"a{i} as (select doc_id, pos as p{i} from tp where term = '{t}')"
        for i, t in enumerate(terms))
    joins = "a0 " + " ".join(f"join a{i} using (doc_id)"
                             for i in range(1, len(terms)))
    cond = " and ".join(f"p{i} < p{i + 1}" for i in range(len(terms) - 1))
    last = f"p{len(terms) - 1}"
    return f"""
with arrs as (select doc_id, list_filter(string_split_regex(
    regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
    x -> x <> '') as arr from documents),
tp as (select doc_id, unnest(arr) as term,
       unnest(range(len(arr))) as pos from arrs),
{srcs},
spans as (select doc_id, {last} - p0 as s from {joins} where {cond}),
m as (select doc_id, cast(min(s) as bigint) as span
      from spans group by doc_id)
select doc_id, span from m where span <= {window}
order by span asc, doc_id asc limit {k}
"""


def _near_sql(ta: str, tb: str, w: int, k: int) -> str:
    """Two-term proximity oracle: distinct close (pa, pb) position pairs
    within ``w`` per doc, ranked by pair count."""
    return f"""
with arrs as (select doc_id, list_filter(string_split_regex(
    regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
    x -> x <> '') as arr from documents),
tp as (select doc_id, unnest(arr) as term,
       unnest(range(len(arr))) as pos from arrs),
a as (select doc_id, pos as pa from tp where term = '{ta}'),
b as (select doc_id, pos as pb from tp where term = '{tb}'),
p as (select distinct a.doc_id, pa, pb
      from a join b using (doc_id) where abs(pa - pb) <= {w}),
m as (select doc_id, cast(count(*) as bigint) as n_pairs
      from p group by doc_id)
select doc_id, n_pairs from m
order by n_pairs desc, doc_id asc limit {k}
"""


def oracle_sql() -> dict[str, str]:
    and3 = ", ".join(f"'{t}'" for t in AND3)
    lookup = ", ".join(f"'{t}'" for t in sorted(set(AND3 + BM25_Q)))
    d = {
        "t2_t5_tokenize_tf": _TF,
        "a1_term_df": _DF,
        "q2_dictionary_lookup": f"select * from ({_DF}) where term in ({lookup})",
        "q3_high_df_prune": f"""
            with n as (select count(*) as n from documents)
            select term, df, round(df / (select n from n), 6) as df_frac
            from ({_DF}) where df / (select n from n) < 0.8 and df >= 50""",
        "q6_conjunctive_and": f"""
            select doc_id, cast(sum(tf) as bigint) as tf_sum from ({_TF})
            where term in ({and3}) group by doc_id
            having count(*) = {len(AND3)}""",
        # ref_compat models the full reference query path, including the Q3
        # 80%-df prune: terms with df/N ≥ 0.8 silently drop out of the AND
        "q7_ref_topk": f"""
            with tf as ({_TF}), dfv as ({_DF}),
            n as (select count(*) as n from documents),
            qt as (select term from dfv
                   where term in ({and3})
                     and df * 1.0 / (select n from n) < 0.8),
            m as (
              select doc_id, sum(tf) as tf_sum from tf
              where term in (select term from qt) group by doc_id
              having count(*) = (select count(*) from qt))
            select doc_id, round(tf_sum / (select max(tf_sum) from m), 6) as score
            from m order by tf_sum desc, doc_id asc limit {K}""",
        "q7_bm25_topk": _bm25_sql(BM25_Q, K),
        "q_hot_cached_topk": _bm25_sql(BM25_Q, K),
        "q_hot_ref_topk": f"""
            with tf as ({_TF}), dfv as ({_DF}),
            n as (select count(*) as n from documents),
            qt as (select term from dfv
                   where term in ({and3})
                     and df * 1.0 / (select n from n) < 0.8),
            m as (
              select doc_id, sum(tf) as tf_sum from tf
              where term in (select term from qt) group by doc_id
              having count(*) = (select count(*) from qt))
            select doc_id, round(tf_sum / (select max(tf_sum) from m), 6) as score
            from m order by tf_sum desc, doc_id asc limit {K}""",
        "q_bm25_tuned": _bm25_sql(BM25_Q, K, k1=TUNED_K1, b=TUNED_B),
        "q_did_you_mean": f"""
with dfv as ({_DF}),
toks(pos, word) as (values (0, 'merqe'), (1, 'hashh'), (2, 'spark'), (3, 'zzznope')),
cand as (select t.pos, t.word, d.term, d.df,
                levenshtein(t.word, d.term) as dist
         from toks t join dfv d
           on abs(length(d.term) - length(t.word)) <= 2
         where levenshtein(t.word, d.term) <= 2),
best as (select pos, term as corrected, dist,
                row_number() over (partition by pos
                    order by dist asc, df desc, term asc) as rn
         from cand)
select cast(t.pos as int) as pos, t.word,
       coalesce(b.corrected, '') as corrected,
       cast(coalesce(b.dist, -1) as int) as dist
from toks t left join (select * from best where rn = 1) b using (pos)
""",
        "q_significant_bigrams": f"""
            with t as (select doc_id, list_filter(string_split_regex(
                         regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                         ' +'), x -> x <> '') as w
                       from documents),
            tf as ({_TF}), dl as ({_DL}),
            stats as (select count(*) as n from dl),
            mset as (select distinct doc_id from tf
                     where term in ({", ".join(f"'{t}'" for t in BM25_Q)})),
            nfg as (select count(*) as n_fg from mset),
            bgr as (select doc_id,
                           unnest(list_distinct(
                             [w[i] || ' ' || w[i + 1]
                              for i in range(1, len(w))])) as bigram
                    from t where len(w) >= 2),
            fg as (select bigram, count(*) as fg_df
                   from bgr join mset using (doc_id) group by bigram),
            bg as (select bigram, count(*) as bg_df from bgr group by bigram),
            j as (select fg.bigram, fg.fg_df, bg.bg_df,
                         (fg.fg_df * 1.0 / nfg.n_fg
                          - bg.bg_df * 1.0 / stats.n)
                         * ((fg.fg_df * 1.0 / nfg.n_fg)
                            / (bg.bg_df * 1.0 / stats.n)) as score
                  from fg join bg using (bigram)
                  cross join nfg cross join stats
                  where fg.fg_df >= 2)
            select bigram, fg_df, bg_df, round(score, 6) as score from j
            where score > 0
            order by round(score, 9) desc, bigram asc limit 20""",
        "q_prf_topk": f"""
            with tf as ({_TF}), dfv as ({_DF}), dl as ({_DL}),
            stats as (select count(*) as n, avg(dl) as avgdl from dl),
            first as (
              select tf.doc_id,
                     sum( ln(1.0 + (stats.n - dfv.df + 0.5) / (dfv.df + 0.5))
                          * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) as s
              from tf join dfv using (term) join dl using (doc_id) cross join stats
              where tf.term in ('merge', 'scan')
              group by tf.doc_id
              order by round(s, 9) desc, tf.doc_id asc limit 5),
            fbtf as (select tf.term, sum(tf.tf) as c
                     from tf where tf.doc_id in (select doc_id from first)
                       and tf.term not in ('merge', 'scan')
                     group by tf.term),
            sel as (select f.term from fbtf f join dfv using (term)
                    order by f.c desc, dfv.df asc, f.term asc limit 3),
            scored as (
              select tf.doc_id,
                     sum( ln(1.0 + (stats.n - dfv.df + 0.5) / (dfv.df + 0.5))
                          * (case when tf.term in ('merge', 'scan')
                                  then 1.0 else 0.5 end)
                          * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) as s
              from tf join dfv using (term) join dl using (doc_id) cross join stats
              where tf.term in ('merge', 'scan')
                 or tf.term in (select term from sel)
              group by tf.doc_id)
            select doc_id, round(s, 6) as score from scored
            order by round(s, 9) desc, doc_id asc limit {K}""",
        "q_term_boost": f"""
            with tf as ({_TF}), dfv as ({_DF}), dl as ({_DL}),
            stats as (select count(*) as n, avg(dl) as avgdl from dl),
            scored as (
              select tf.doc_id,
                     sum( ln(1.0 + (stats.n - dfv.df + 0.5) / (dfv.df + 0.5))
                          * (case when tf.term = 'merge'
                                  then 2.0 else 1.0 end)
                          * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) as s
              from tf join dfv using (term) join dl using (doc_id) cross join stats
              where tf.term in ('merge', 'scan')
              group by tf.doc_id)
            select doc_id, round(s, 6) as score from scored
            order by round(s, 9) desc, doc_id asc limit {K}""",
        "q_bm25_not_topk": _bm25_sql(BM25_Q, K, exclude=[NOT_T]),
        "q_min_match": _bm25_sql(AND3, K, min_match=2),
        "q_select_all": f"""
with tf as ({_TF}), dfv as ({_DF}), dl as ({_DL}),
stats as (select count(*) as n, avg(dl) as avgdl from dl),
scored as (
  select tf.doc_id, count(*) as nt,
         sum( ln(1.0 + (stats.n - dfv.df + 0.5) / (dfv.df + 0.5))
              * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) as s
  from tf join dfv using (term) join dl using (doc_id) cross join stats
  where tf.term in ({", ".join(f"'{t}'" for t in AND3)})
  group by tf.doc_id
  having count(*) >= 2)
select doc_id, cast(nt as bigint) as nt, round(s, 6) as score from scored""",
        "q_querylang_select": f"""
with tf as ({_TF}), dfv as ({_DF}), dl as ({_DL}),
stats as (select count(*) as n, avg(dl) as avgdl from dl),
scored as (
  select tf.doc_id, count(*) as nt,
         sum( ln(1.0 + (stats.n - dfv.df + 0.5) / (dfv.df + 0.5))
              * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) as s
  from tf join dfv using (term) join dl using (doc_id) cross join stats
  where tf.term in ('scan', 'merge')
    and tf.doc_id not in (select doc_id from tf where term = 'hash')
  group by tf.doc_id)
select doc_id, cast(nt as bigint) as nt, round(s, 6) as score from scored""",
        "q_querylang_min": _bm25_sql(AND3, K, min_match=2),
        "q_querylang_count": f"""
            with tf as ({_TF}),
            grp as (select distinct doc_id from tf
                    where term in ('scan', 'hash')),
            m as (select tf.doc_id from tf
                  where tf.term in ('merge', 'scan', 'hash')
                    and tf.doc_id in (select doc_id from grp)
                  group by tf.doc_id having count(*) >= 2)
            select cast(count(*) as bigint) as n_matches from m""",
        "q_querylang_fuzzy": f"""
            with tf as ({_TF}), dfv as ({_DF}), dl as ({_DL}),
            stats as (select count(*) as n, avg(dl) as avgdl from dl),
            wq as (select term from ({_DF})
                   where levenshtein(term, 'scn') <= 1
                   order by levenshtein(term, 'scn') asc, df desc, term asc
                   limit 8),
            scored as (
              select tf.doc_id,
                     sum( ln(1.0 + (stats.n - dfv.df + 0.5) / (dfv.df + 0.5))
                          * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) as s
              from tf join dfv using (term) join dl using (doc_id) cross join stats
              where (tf.term = 'merge' or tf.term in (select term from wq))
                and tf.doc_id in (select doc_id from tf
                                  where term in (select term from wq))
              group by tf.doc_id)
            select doc_id, round(s, 6) as score from scored
            order by round(s, 9) desc, doc_id asc limit {K}""",
        "a6_doc_term_weights": f"""
with tf as ({_TF}), dfv as ({_DF}), dl as ({_DL}),
stats as (select count(*) as n, avg(dl) as avgdl from dl)
select tf.doc_id, tf.term, tf.tf,
       round( ln(1.0 + (stats.n - dfv.df + 0.5) / (dfv.df + 0.5))
              * (tf.tf * 2.2)
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)), 6)
           as weight
from tf join dfv using (term) join dl using (doc_id) cross join stats""",
        "a5_term_vectors": f"""
with tf as ({_TF}), dfv as ({_DF})
select tf.doc_id, tf.term, tf.tf, dfv.df
from tf join dfv using (term)
where tf.doc_id in (7, 11, 42)
order by tf.doc_id, tf.term""",
        "q_significant_terms": f"""
with tf as ({_TF}), dfv as ({_DF}), dl as ({_DL}),
stats as (select count(*) as n from dl),
mset as (select distinct doc_id from tf
         where term in ({", ".join(f"'{t}'" for t in BM25_Q)})),
nfg as (select count(*) as n_fg from mset),
fg as (select term, count(*) as fg_df
       from tf join mset using (doc_id) group by term),
j as (select fg.term, fg.fg_df, dfv.df as bg_df,
             (fg.fg_df * 1.0 / nfg.n_fg - dfv.df * 1.0 / stats.n)
             * ((fg.fg_df * 1.0 / nfg.n_fg) / (dfv.df * 1.0 / stats.n))
             as score
      from fg join dfv using (term) cross join nfg cross join stats
      where fg.fg_df >= 2)
select term, fg_df, bg_df, round(score, 6) as score from j
where score > 0
order by round(score, 9) desc, term asc limit 20
""",
        "q_explain_score": f"""
with tf as ({_TF}), dfv as ({_DF}), dl as ({_DL}),
stats as (select count(*) as n, avg(dl) as avgdl from dl),
scored as (
  select tf.doc_id,
         sum( ln(1.0 + (stats.n - dfv.df + 0.5) / (dfv.df + 0.5))
              * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) as s
  from tf join dfv using (term) join dl using (doc_id) cross join stats
  where tf.term in ({", ".join(f"'{t}'" for t in BM25_Q)})
  group by tf.doc_id),
topd as (select doc_id from scored
         order by round(s, 9) desc, doc_id asc limit {K})
select tf.doc_id, tf.term, tf.tf, dl.dl, dfv.df,
       round(ln(1.0 + (stats.n - dfv.df + 0.5) / (dfv.df + 0.5)), 6) as idf,
       round(ln(1.0 + (stats.n - dfv.df + 0.5) / (dfv.df + 0.5))
             * (tf.tf * 2.2)
             / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)), 6) as weight
from tf join dfv using (term) join dl using (doc_id) cross join stats
where tf.term in ({", ".join(f"'{t}'" for t in BM25_Q)})
  and tf.doc_id in (select doc_id from topd)
""",
        "q_facets": f"""
            with tf as ({_TF}),
            m as (select distinct doc_id from tf
                  where term in ({", ".join(f"'{t}'" for t in BM25_Q)}))
            select cast(doc_id % 10 as varchar) as facet,
                   cast(count(*) as bigint) as n_docs
            from m group by 1""",
        "q_facets_multi": f"""
            with tf as ({_TF}),
            m as (select distinct doc_id from tf
                  where term in ({", ".join(f"'{t}'" for t in BM25_Q)}))
            select 'last' as dim, cast(doc_id % 10 as varchar) as facet,
                   cast(count(*) as bigint) as n_docs from m group by 2
            union all
            select 'tens' as dim, cast((doc_id // 10) % 10 as varchar) as facet,
                   cast(count(*) as bigint) as n_docs from m group by 2""",
        "q_count": f"""
            with tf as ({_TF})
            select cast(count(distinct doc_id) as bigint) as n_matches
            from tf where term in ({", ".join(f"'{t}'" for t in BM25_Q)})
              and doc_id not in (select doc_id from tf where term = '{NOT_T}')""",
        "q_top_hits": f"""
with tf as ({_TF}), dfv as ({_DF}), dl as ({_DL}),
stats as (select count(*) as n, avg(dl) as avgdl from dl),
scored as (
  select tf.doc_id,
         sum( ln(1.0 + (stats.n - dfv.df + 0.5) / (dfv.df + 0.5))
              * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) as s
  from tf join dfv using (term) join dl using (doc_id), stats
  where tf.term in ({", ".join(f"'{t}'" for t in BM25_Q)})
  group by tf.doc_id),
ranked as (
  select cast(doc_id % 10 as varchar) as facet, doc_id, s,
         row_number() over (partition by doc_id % 10
             order by round(s, 9) desc, doc_id asc) as rank
  from scored)
select facet, cast(rank as int) as rank, doc_id, round(s, 6) as score
from ranked where rank <= 3
""",
        "q_facets_minute": f"""
            with tf as ({_TF}),
            m as (select distinct doc_id from tf
                  where term in ({", ".join(f"'{t}'" for t in BM25_Q)}))
            select 'minute' as dim,
                   strftime(timestamp '2026-01-01'
                            + to_seconds(doc_id), '%Y-%m-%d %H:%M') as facet,
                   cast(count(*) as bigint) as n_docs
            from m group by 2""",
        "q_facets_metrics": f"""
            with tf as ({_TF}), dl as ({_DL}),
            m as (select distinct doc_id from tf
                  where term in ({", ".join(f"'{t}'" for t in BM25_Q)}))
            select cast(m.doc_id % 5 as varchar) as facet,
                   cast(count(*) as bigint) as n_docs,
                   round(avg(dl.dl), 6) as avg_dl,
                   cast(max(dl.dl) as bigint) as max_dl
            from m join dl using (doc_id) group by 1""",
        "q_boost_recent": f"""
with tf as ({_TF}), dfv as ({_DF}), dl as ({_DL}),
stats as (select count(*) as n, avg(dl) as avgdl from dl),
scored as (
  select tf.doc_id,
         sum( ln(1.0 + (stats.n - dfv.df + 0.5) / (dfv.df + 0.5))
              * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) as s
  from tf join dfv using (term) join dl using (doc_id) cross join stats
  where tf.term in ({", ".join(f"'{t}'" for t in BM25_Q)})
  group by tf.doc_id),
boosted as (
  select doc_id,
         s * (1.0::DOUBLE / (1.0::DOUBLE
              + ((select count(*) from documents) - 1 - doc_id) / 60.0)) as s
  from scored)
select doc_id, round(s, 6) as score from boosted
order by round(s, 9) desc, doc_id asc limit {K}""",
        "q11_bm25_page2": _bm25_sql(BM25_Q, K, offset=K),
        # cursor paging: page 2 via search_after == the offset slice
        "q_search_after": _bm25_sql(BM25_Q, K, offset=K),
        # ts desc == doc_id desc under the entry's ts = base + doc_id s shaping
        "q_sort_recent": f"""
with tf as ({_TF}), dfv as ({_DF}), dl as ({_DL}),
stats as (select count(*) as n, avg(dl) as avgdl from dl),
scored as (
  select tf.doc_id,
         sum( ln(1.0 + (stats.n - dfv.df + 0.5) / (dfv.df + 0.5))
              * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) as s
  from tf join dfv using (term) join dl using (doc_id) cross join stats
  where tf.term in ({", ".join(f"'{t}'" for t in BM25_Q)})
  group by tf.doc_id)
select doc_id, round(s, 6) as score from scored
order by doc_id desc limit {K}""",
        # scoped search: SCOPE_PREFIX 'doc000001' ≡ doc_id in [100, 199]
        "q2_scoped_bm25_topk": _bm25_sql(
            BM25_Q, K, scope="tf.doc_id between 100 and 199"),
        "q2_scoped_ref_topk": f"""
            with tf as ({_TF}),
            stf as (select * from tf where doc_id between 100 and 199),
            n as (select count(*) as n from documents
                  where doc_id between 100 and 199),
            sdf as (select term, count(*) as df from stf group by term),
            qt as (select term from sdf where term in ({and3})
                   and df * 1.0 / (select n from n) < 0.8),
            m as (
              select doc_id, sum(tf) as tf_sum from stf
              where term in (select term from qt) group by doc_id
              having count(*) = (select count(*) from qt))
            select doc_id, round(tf_sum / (select max(tf_sum) from m), 6) as score
            from m order by tf_sum desc, doc_id asc limit {K}""",
        "q_phrase_topk": _phrase_sql(list(BM25_Q), K),
        "q_phrase_not": _phrase_sql(list(BM25_Q), K, exclude=NOT_T),
        "q_querylang": _querylang_sql(
            ["scan", "hash", "join"], ["hash", "join"], K,
            not_terms=["spark"]),
        # OR-group: rank over {merge, scan, hash}, candidates restricted to
        # docs containing scan OR hash
        "q_querylang_time": _bm25_sql(
            list(BM25_Q), K,
            scope="tf.doc_id >= 10 and tf.doc_id < 100"),
        "q_collapse_topk": _bm25_collapse_sql(
            list(BM25_Q), K, COLLAPSE_GROUPS),
        "q_querylang_group": _bm25_sql(
            ["merge", "scan", "hash"], K,
            scope="tf.doc_id in (select doc_id from tf "
                  "where term in ('scan', 'hash'))"),
        "q_querylang_notphrase": _querylang_sql(
            list(BM25_Q), ["hash", "join"], K, not_phrase=True),
        "q_querylang_qualified": _bm25_sql(
            list(BM25_Q), K, scope="tf.doc_id between 100 and 199",
            exclude=["spark"]),
        "q_querylang_span": _querylang_sql(
            ["scan", "merge", "spark", "hash"], ["spark", "hash"], K,
            span_window=8),
        "q_querylang_ospan": _querylang_sql(
            ["scan", "merge", "spark", "hash"], ["spark", "hash"], K,
            span_window=8, ordered=True),
        # regex grammar term: wq = the anchored-full-match expansions
        # (top-16 by df desc, term asc — the engine's expansion budget)
        "q_querylang_regex": f"""
            with tf as ({_TF}), dfv as ({_DF}), dl as ({_DL}),
            stats as (select count(*) as n, avg(dl) as avgdl from dl),
            wq as (select term from ({_DF})
                   where regexp_full_match(term, 's.an')
                   order by df desc, term asc limit 16),
            scored as (
              select tf.doc_id,
                     sum( ln(1.0 + (stats.n - dfv.df + 0.5) / (dfv.df + 0.5))
                          * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) as s
              from tf join dfv using (term) join dl using (doc_id) cross join stats
              where (tf.term = 'merge' or tf.term in (select term from wq))
                and tf.doc_id in (select doc_id from tf
                                  where term in (select term from wq))
              group by tf.doc_id)
            select doc_id, round(s, 6) as score from scored
            order by round(s, 9) desc, doc_id asc limit {K}""",
        # exists:tool over the tooled shaping == doc_id parity predicate
        "q_querylang_exists": _bm25_sql(
            BM25_Q, K, scope="tf.doc_id % 2 = 0"),
        # synonyms={'merge': ['hash']}: group (merge|hash) as candidate
        # constraint, {scan, merge, hash} ranked
        "q_synonyms": _bm25_sql(
            ["merge", "scan", "hash"], K,
            scope="tf.doc_id in (select doc_id from tf "
                  "where term in ('hash', 'merge'))"),
        # percolation: each registered query's FULL match set under the
        # grammar's semantics — any ranked term (≥ m with min:), clause
        # filters, NOT terms, qualifiers
        "q_percolate": f"""
with tf as ({_TF}),
arrs as (select doc_id, list_filter(string_split_regex(
    regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
    x -> x <> '') as arr from documents),
tp as (select doc_id, unnest(arr) as term,
       unnest(range(len(arr))) as pos from arrs),
alp as (select tp.doc_id, tp.pos - q.qidx as base, q.qidx
        from tp join (values ('hash', 0), ('join', 1)) as q(term, qidx)
        using (term)),
pmp as (select doc_id from alp group by doc_id, base
        having count(distinct qidx) = 2),
sa0 as (select doc_id, pos as p0 from tp where term = 'spark'),
sa1 as (select doc_id, pos as p1 from tp where term = 'hash'),
pms as (select doc_id from (
          select doc_id, greatest(p0, p1) - least(p0, p1) as s
          from sa0 join sa1 using (doc_id))
        group by doc_id having min(s) <= 8),
m_pt as (select distinct doc_id from tf where term in ('scan', 'hash')),
m_pp as (select distinct doc_id from tf
         where term in ('scan', 'hash', 'join')
         and doc_id in (select doc_id from pmp)),
m_pn as (select distinct doc_id from tf where term = 'scan'
         and doc_id not in (select doc_id from tf where term = 'merge')),
m_pm2 as (select doc_id from tf where term in ('scan', 'merge', 'hash')
          group by doc_id having count(distinct term) >= 2),
m_pq as (select distinct doc_id from tf where term in ('scan', 'merge')
         and doc_id between 100 and 199),
m_ps as (select distinct doc_id from tf
         where term in ('scan', 'spark', 'hash')
         and doc_id in (select doc_id from pms))
select 'pt' as query_id, doc_id from m_pt
union all select 'pp', doc_id from m_pp
union all select 'pn', doc_id from m_pn
union all select 'pm2', doc_id from m_pm2
union all select 'pq', doc_id from m_pq
union all select 'ps', doc_id from m_ps
""",
        "q_percolate_scaled": f"""
with tf as ({_TF}),
tfb as (select doc_id, term from tf where doc_id < 200),
vocab as (select term,
                 cast(row_number() over (order by term) - 1 as bigint) as r
          from (select distinct term from tf)),
nv as (select cast(count(*) as bigint) as n from vocab),
qraw as (select i, i % n as ar, (i * 7 + 3) % n as br0,
                case when i % 3 = 0 then (i * 5 + 1) % n end as cr
         from range({N_PERC_SCALED}) t(i), nv),
q as (select qraw.i, ar,
             case when br0 = ar then (br0 + 1) % n else br0 end as br, cr
      from qraw, nv),
qt as (select q.i, a.term as ta, b.term as tb, c.term as tc
       from q join vocab a on a.r = q.ar
              join vocab b on b.r = q.br
              left join vocab c on c.r = q.cr),
mm as (select qt.i as qi, tfb.doc_id, qt.tc
       from qt join tfb on tfb.term in (qt.ta, qt.tb)
       group by qt.i, tfb.doc_id, qt.tc
       having count(distinct tfb.term) >= 2),
ok as (select qi, doc_id from mm
       where not exists (select 1 from tfb
                         where tfb.doc_id = mm.doc_id
                           and tfb.term = mm.tc))
select 'q' || lpad(cast(qi as varchar), 5, '0') as query_id,
       cast(count(*) as bigint) as n_matches
from ok group by 1
""",
        "q_percolate_scored": f"""
with tf as ({_TF}),
arrs as (select doc_id, list_filter(string_split_regex(
    regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
    x -> x <> '') as arr from documents),
tp as (select doc_id, unnest(arr) as term,
       unnest(range(len(arr))) as pos from arrs),
alp as (select tp.doc_id, tp.pos - q.qidx as base, q.qidx
        from tp join (values ('hash', 0), ('join', 1)) as q(term, qidx)
        using (term)),
pmp as (select doc_id from alp group by doc_id, base
        having count(distinct qidx) = 2),
sa0 as (select doc_id, pos as p0 from tp where term = 'spark'),
sa1 as (select doc_id, pos as p1 from tp where term = 'hash'),
pms as (select doc_id from (
          select doc_id, greatest(p0, p1) - least(p0, p1) as s
          from sa0 join sa1 using (doc_id))
        group by doc_id having min(s) <= 8),
m_pt as (select doc_id, cast(sum(tf) as bigint) as tf_sum from tf
         where term in ('scan', 'hash') group by doc_id),
m_pp as (select doc_id, cast(sum(tf) as bigint) as tf_sum from tf
         where term in ('scan', 'hash', 'join')
         and doc_id in (select doc_id from pmp) group by doc_id),
m_pn as (select doc_id, cast(sum(tf) as bigint) as tf_sum from tf
         where term = 'scan'
         and doc_id not in (select doc_id from tf where term = 'merge')
         group by doc_id),
m_pm2 as (select doc_id, cast(sum(tf) as bigint) as tf_sum from tf
          where term in ('scan', 'merge', 'hash')
          group by doc_id having count(distinct term) >= 2),
m_pq as (select doc_id, cast(sum(tf) as bigint) as tf_sum from tf
         where term in ('scan', 'merge')
         and doc_id between 100 and 199 group by doc_id),
m_ps as (select doc_id, cast(sum(tf) as bigint) as tf_sum from tf
         where term in ('scan', 'spark', 'hash')
         and doc_id in (select doc_id from pms) group by doc_id)
select 'pt' as query_id, doc_id, tf_sum from m_pt
union all select 'pp', doc_id, tf_sum from m_pp
union all select 'pn', doc_id, tf_sum from m_pn
union all select 'pm2', doc_id, tf_sum from m_pm2
union all select 'pq', doc_id, tf_sum from m_pq
union all select 'ps', doc_id, tf_sum from m_ps
""",
        "q_span_topk": _span_sql(SPAN_Q.split(), SPAN_W, K),
        "q_ordered_span_topk": _ordered_span_sql(SPAN_Q.split(), SPAN_W, K),
        "q_rescore_topk": _rescore_sql(BM25_Q, 100, K, 8, 1.0),
        "q_batched_span": f"""
            with a as ({_span_sql(SPAN_Q.split(), SPAN_W, K)}),
                 b as ({_span_sql(["scan", "merge", "hash"], 9, K)})
            select 'sa' as query_id, doc_id, span from a
            union all
            select 'sb' as query_id, doc_id, span from b""",
        "q_batched_ordered_span": f"""
            with a as ({_ordered_span_sql(SPAN_Q.split(), SPAN_W, K)}),
                 b as ({_ordered_span_sql(["merge", "scan"], 9, K)})
            select 'sa' as query_id, doc_id, span from a
            union all
            select 'sb' as query_id, doc_id, span from b""",
        "q_batched_phrase": f"""
            with a as ({_phrase_sql(list(BM25_Q), K)}),
                 b as ({_phrase_sql(["hash", "join"], K)})
            select 'pa' as query_id, doc_id, n_matches from a
            union all
            select 'pb' as query_id, doc_id, n_matches from b""",
        "q_batched_bm25": f"""
            with a as ({_bm25_sql(BM25_Q, K)}),
                 b as ({_bm25_sql(BATCH_Q2, K)})
            select 'qa' as query_id, doc_id, score from a
            union all
            select 'qb' as query_id, doc_id, score from b""",
        "q_batched_not": f"""
            with a as ({_bm25_sql(BM25_Q, K, exclude=[NOT_T])}),
                 b as ({_bm25_sql(BATCH_Q2, K, exclude=["merge"])})
            select 'qa' as query_id, doc_id, score from a
            union all
            select 'qb' as query_id, doc_id, score from b""",
        "q_batched_scoped": f"""
            with a as ({_bm25_sql(BM25_Q, K, scope="tf.doc_id between 100 and 199")}),
                 b as ({_bm25_sql(BATCH_Q2, K, scope="tf.doc_id between 100 and 199")})
            select 'qa' as query_id, doc_id, score from a
            union all
            select 'qb' as query_id, doc_id, score from b""",
        "q_batched_querylang": f"""
            with a as ({_querylang_sql(["scan", "hash", "join"],
                                       ["hash", "join"], K,
                                       not_terms=["spark"])}),
                 b as ({_querylang_sql(["scan", "merge", "spark", "hash"],
                                       ["spark", "hash"], K,
                                       span_window=8)}),
                 c as ({_bm25_sql(["merge", "scan", "hash"], K,
                                  scope="tf.doc_id in (select doc_id from tf "
                                        "where term in ('scan', 'hash'))")}),
                 d as ({_querylang_sql(list(BM25_Q), ["hash", "join"], K,
                                       not_phrase=True)})
            select 'qa' as query_id, doc_id, score from a
            union all select 'qb' as query_id, doc_id, score from b
            union all select 'qc' as query_id, doc_id, score from c
            union all select 'qd' as query_id, doc_id, score from d""",
        "q_querylang_facets": f"""
            with tf as ({_TF}),
            arrs as (select doc_id, list_filter(string_split_regex(
                regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
                x -> x <> '') as arr from documents),
            tp as (select doc_id, unnest(arr) as term,
                   unnest(range(len(arr))) as pos from arrs),
            q as (select * from (values ('hash', 0), ('join', 1))
                  as t(term, qidx)),
            al as (select tp.doc_id, tp.pos - q.qidx as base, q.qidx
                   from tp join q using (term)),
            pm as (select doc_id from al group by doc_id, base
                   having count(distinct qidx) = 2),
            m as (select distinct tf.doc_id from tf
                  where tf.term in ('scan', 'hash', 'join')
                    and tf.doc_id in (select doc_id from pm)
                    and tf.doc_id not in (select doc_id from tf
                                          where term = 'spark'))
            select cast(doc_id % 10 as varchar) as facet,
                   cast(count(*) as bigint) as n_docs
            from m group by 1""",
        "q_suggest": f"""
            select term, cast(df as bigint) as df from ({_DF})
            where term like '{SUGGEST_PREFIX}%'
            order by df desc, term asc limit {K}""",
        "q_suggest_fuzzy": f"""
            select term, cast(levenshtein('{FUZZY_WORD}', term) as int) as dist,
                   cast(df as bigint) as df
            from ({_DF}) where levenshtein('{FUZZY_WORD}', term) <= 2
            order by dist asc, df desc, term asc limit {K}""",
        "q_querylang_wildcard": f"""
            with tf as ({_TF}), dfv as ({_DF}), dl as ({_DL}),
            stats as (select count(*) as n, avg(dl) as avgdl from dl),
            wq as (select term from ({_DF}) where term like 'sca%'
                   order by df desc, term asc limit 16),
            scored as (
              select tf.doc_id,
                     sum( ln(1.0 + (stats.n - dfv.df + 0.5) / (dfv.df + 0.5))
                          * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) as s
              from tf join dfv using (term) join dl using (doc_id) cross join stats
              where (tf.term = 'merge' or tf.term in (select term from wq))
                and tf.doc_id in (select doc_id from tf
                                  where term in (select term from wq))
              group by tf.doc_id)
            select doc_id, round(s, 6) as score from scored
            order by round(s, 9) desc, doc_id asc limit {K}""",
        "q_querylang_wildcard_suffix": f"""
            with tf as ({_TF}), dfv as ({_DF}), dl as ({_DL}),
            stats as (select count(*) as n, avg(dl) as avgdl from dl),
            wq as (select term from ({_DF}) where term like '%can'
                   order by df desc, term asc limit 16),
            scored as (
              select tf.doc_id,
                     sum( ln(1.0 + (stats.n - dfv.df + 0.5) / (dfv.df + 0.5))
                          * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) as s
              from tf join dfv using (term) join dl using (doc_id) cross join stats
              where (tf.term = 'merge' or tf.term in (select term from wq))
                and tf.doc_id in (select doc_id from tf
                                  where term in (select term from wq))
              group by tf.doc_id)
            select doc_id, round(s, 6) as score from scored
            order by round(s, 9) desc, doc_id asc limit {K}""",
        "q_trigram_infix": f"""
            select term, cast(df as bigint) as df
            from ({_DF}) where term like '%er'
            order by df desc, term asc limit 16""",
        "q_bool_search": f"""
            with tf as ({_TF}), dfv as ({_DF}), dl as ({_DL}),
            stats as (select count(*) as n, avg(dl) as avgdl from dl),
            cand as (
              (select doc_id from tf where term = 'merge'
               intersect
               (select doc_id from tf where term = 'scan'
                union
                select doc_id from tf where term = 'hash'))
              except
              select doc_id from tf where term = 'stream'),
            scored as (
              select tf.doc_id,
                     sum( ln(1.0 + (stats.n - dfv.df + 0.5) / (dfv.df + 0.5))
                          * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) as s
              from tf join dfv using (term) join dl using (doc_id) cross join stats
              where tf.term in ('hash', 'merge', 'scan')
                and tf.doc_id in (select doc_id from cand)
              group by tf.doc_id)
            select doc_id, round(s, 6) as score from scored
            order by round(s, 9) desc, doc_id asc limit {K}""",
        "q_bool_count": f"""
            with tf as ({_TF}),
            cand as (
              (select doc_id from tf where term = 'merge'
               intersect
               (select doc_id from tf where term = 'scan'
                union
                select doc_id from tf where term = 'hash'))
              except
              select doc_id from tf where term = 'stream')
            select cast(count(*) as bigint) as n_matches from cand""",
        "q_batched_bool": f"""
            with tf as ({_TF}), dfv as ({_DF}), dl as ({_DL}),
            stats as (select count(*) as n, avg(dl) as avgdl from dl),
            cand1 as (
              (select doc_id from tf where term = 'merge'
               intersect
               (select doc_id from tf where term = 'scan'
                union
                select doc_id from tf where term = 'hash'))
              except
              select doc_id from tf where term = 'stream'),
            cand2 as (
              select doc_id from tf where term = 'scan'
              union
              (select doc_id from tf where term = 'stream'
               except
               select doc_id from tf where term = 'hash')),
            s1 as (
              select 'b1' as query_id, tf.doc_id,
                     sum( ln(1.0 + (stats.n - dfv.df + 0.5) / (dfv.df + 0.5))
                          * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) as s
              from tf join dfv using (term) join dl using (doc_id) cross join stats
              where tf.term in ('hash', 'merge', 'scan')
                and tf.doc_id in (select doc_id from cand1)
              group by tf.doc_id
              order by round(s, 9) desc, tf.doc_id asc limit {K}),
            s2 as (
              select 'b2' as query_id, tf.doc_id,
                     sum( ln(1.0 + (stats.n - dfv.df + 0.5) / (dfv.df + 0.5))
                          * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) as s
              from tf join dfv using (term) join dl using (doc_id) cross join stats
              where tf.term in ('scan', 'stream')
                and tf.doc_id in (select doc_id from cand2)
              group by tf.doc_id
              order by round(s, 9) desc, tf.doc_id asc limit {K})
            select query_id, doc_id, round(s, 6) as score from s1
            union all
            select query_id, doc_id, round(s, 6) as score from s2""",
        "q_bool_select": f"""
            with tf as ({_TF}), dfv as ({_DF}), dl as ({_DL}),
            stats as (select count(*) as n, avg(dl) as avgdl from dl),
            cand as (
              (select doc_id from tf where term = 'merge'
               intersect
               (select doc_id from tf where term = 'scan'
                union
                select doc_id from tf where term = 'hash'))
              except
              select doc_id from tf where term = 'stream')
            select tf.doc_id, cast(count(*) as bigint) as nt,
                   round(sum( ln(1.0 + (stats.n - dfv.df + 0.5)
                                 / (dfv.df + 0.5))
                          * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ), 6) as score
            from tf join dfv using (term) join dl using (doc_id)
            cross join stats
            where tf.term in ('hash', 'merge', 'scan')
              and tf.doc_id in (select doc_id from cand)
            group by tf.doc_id""",
        "q_percolate_bool": f"""
            with tf as ({_TF}),
            cand1 as (
              (select doc_id from tf where term = 'merge'
               intersect
               (select doc_id from tf where term = 'scan'
                union
                select doc_id from tf where term = 'hash'))
              except
              select doc_id from tf where term = 'stream'),
            cand2 as (
              select doc_id from tf where term = 'scan'
              union
              (select doc_id from tf where term = 'stream'
               except
               select doc_id from tf where term = 'hash'))
            select 'b1' as query_id, doc_id from cand1
            union all
            select 'b2' as query_id, doc_id from cand2""",
        "q_more_like_this": f"""
            with tf as ({_TF}), dfv as ({_DF}), dl as ({_DL}),
            stats as (select count(*) as n, avg(dl) as avgdl from dl),
            sel as (select tf.term from tf join dfv using (term)
                    where tf.doc_id = {MLT_DOC}
                    order by tf.tf desc, dfv.df asc, tf.term asc limit 5),
            scored as (
              select tf.doc_id,
                     sum( ln(1.0 + (stats.n - dfv.df + 0.5) / (dfv.df + 0.5))
                          * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) as s
              from tf join dfv using (term) join dl using (doc_id) cross join stats
              where tf.term in (select term from sel)
                and tf.doc_id <> {MLT_DOC}
              group by tf.doc_id)
            select doc_id, round(s, 6) as score from scored
            order by round(s, 9) desc, doc_id asc limit {K}""",
        "q_querylang_bm25f": _bm25f_sql(
            ["scan", "hash", "join"], K,
            where="""doc_id in (
                with arrs as (select doc_id, list_filter(string_split_regex(
                    regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                    ' +'), x -> x <> '') as arr from documents),
                tp as (select doc_id, unnest(arr) as term,
                       unnest(range(len(arr))) as pos from arrs),
                q as (select * from (values ('hash', 0), ('join', 1))
                      as t(term, qidx)),
                al as (select tp.doc_id, tp.pos - q.qidx as base, q.qidx
                       from tp join q using (term)),
                pm as (select doc_id from al group by doc_id, base
                       having count(distinct qidx) = 2)
                select doc_id from pm)
              and doc_id not in (select doc_id from tb
                                 where term = 'spark')"""),
        "q_bm25f_topk": _bm25f_sql(list(BM25_Q), K),
        # fielded scoping: conv prefix 'doc000000' == doc_id 0..99
        "q_bm25f_scoped": _bm25f_sql(list(BM25_Q), K,
                                     where="doc_id between 0 and 99"),
        "q_bm25f_not": _bm25f_sql(
            list(BM25_Q), K,
            where=f"doc_id not in (select doc_id from tb "
                  f"where term = '{NOT_T}')"),
        "q_batched_bm25f": f"""
            with a as ({_bm25f_sql(list(BM25_Q), K)}),
                 b as ({_bm25f_sql(list(BATCH_Q2), K)})
            select 'qa' as query_id, doc_id, score from a
            union all
            select 'qb' as query_id, doc_id, score from b""",
        "q_batched_bm25f_not": f"""
            with a as ({_bm25f_sql(list(BM25_Q), K,
                        where=f"doc_id not in (select doc_id from tb "
                              f"where term = '{NOT_T}')")}),
                 b as ({_bm25f_sql(list(BATCH_Q2), K,
                        where="doc_id not in (select doc_id from tb "
                              "where term = 'merge')")})
            select 'qa' as query_id, doc_id, score from a
            union all
            select 'qb' as query_id, doc_id, score from b""",
        "q_near_topk": _near_sql("scan", "hash", 4, K),
        "q_batched_near": f"""
            with a as ({_near_sql("scan", "hash", 4, K)}),
                 b as ({_near_sql("hash", "join", 4, K)})
            select 'na' as query_id, doc_id, n_pairs from a
            union all
            select 'nb' as query_id, doc_id, n_pairs from b""",
        "a3_statistics_per_collection": f"""
            with t as ({_TOKS}),
            d as (select doc_id,
                  'doc' || lpad(cast(doc_id // 100 as varchar), 6, '0') as collection
                  from documents)
            select d.collection,
                   cast(count(distinct d.doc_id) as bigint) as n_docs,
                   cast(count(t.term) as bigint) as n_tokens,
                   cast(count(distinct t.term) as bigint) as n_lemmas
            from d left join t using (doc_id)
            group by d.collection""",
        # q10: same sentence/highlight/trim rules as functions/snippets.py
        # (mirrors reference services/SearchingServiceImpl.java:418-505);
        # expand_query_words('scan merge','general') == ['merge','scan']
        "q10_snippets": f"""
            with b as ({_bm25_sql(BM25_Q, K)}),
            s as (
              select b.doc_id,
                trim(regexp_extract(d.text,
                     '[^.!?;]*\\b(?:merge|scan)\\b[^.!?;]*', 0, 'i')) as sent
              from b join documents d using (doc_id)),
            h as (
              select doc_id,
                case when sent = '' then NULL
                     else regexp_replace(sent, '\\b(merge|scan)\\b',
                                         '<b>\\1</b>', 'gi') end as hl
              from s)
            select doc_id,
              case when hl is null then 'Нет совпадений для подсветки'
                   when length(hl) <= 300 then hl
                   else (case when greatest(strpos(hl,'<b>')-1-120, 0) > 0
                              then '…' else '' end)
                        || substr(hl, greatest(strpos(hl,'<b>')-1-120,0)+1,
                                  least(length(hl), strpos(hl,'<b>')-1+120)
                                  - greatest(strpos(hl,'<b>')-1-120,0))
                        || (case when least(length(hl), strpos(hl,'<b>')-1+120)
                                      < length(hl) then '…' else '' end)
              end as snippet
            from h""",
        "s6_upsert_term_df": f"""
            with docs as (
              select doc_id, text from documents where doc_id not in (7, 11)
              union all select 7, 'replacement text about spark merge operations'
              union all select 11, 'another replacement mentioning hash scan pipelines'
              union all select 10000001, 'entirely new document exercising upsert insert path'
            ),
            toks as (select doc_id, unnest(list_filter(string_split_regex(
              regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
              x -> x <> '')) as term from docs)
            select term, cast(count(distinct doc_id) as bigint) as df
            from toks group by term""",
        "s7_delete_term_df": """
            with docs as (
              select doc_id, text from documents where doc_id % 50 <> 3),
            toks as (select doc_id, unnest(list_filter(string_split_regex(
              regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
              x -> x <> '')) as term from docs)
            select term, cast(count(distinct doc_id) as bigint) as df
            from toks group by term""",
        # compaction must leave the chain's dictionary == df over the
        # modified corpus, and BM25 through the compacted index == BM25
        # recomputed from the modified corpus (stats maintained exactly)
        "s8_compact_term_df": f"""
            with docs as ({_MOD_DOCS}),
            toks as (select doc_id, unnest(list_filter(string_split_regex(
              regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
              x -> x <> '')) as term from docs)
            select term, cast(count(distinct doc_id) as bigint) as df
            from toks group by term""",
        "q_compacted_topk": _bm25_sql(BM25_Q, K).replace(
            "from documents", f"from ({_MOD_DOCS})"),
        # snapshot diff: per-term df before (original corpus) vs after
        # (the s6-modified corpus), changed rows only, null → -1
        "s10_diff_snapshots": f"""
            with dfa as ({_DF}),
            dfb as ({_DF.replace("from documents",
                                 f"from ({_MOD_DOCS})")})
            select coalesce(a.term, b.term) as term,
                   cast(coalesce(a.df, -1) as bigint) as df_a,
                   cast(coalesce(b.df, -1) as bigint) as df_b
            from dfa a full join dfb b on a.term = b.term
            where a.df is null or b.df is null or a.df <> b.df""",
        # time travel: the AS-OF version answers from the ORIGINAL corpus,
        # CURRENT (one incremental MERGE later) from the modified one
        "q_time_travel": f"""
            with a as ({_bm25_sql(BM25_Q, K)}),
                 b as ({_bm25_sql(BM25_Q, K).replace(
                     "from documents", f"from ({_MOD_DOCS})")})
            select 'as_of' as version, doc_id, score from a
            union all
            select 'current' as version, doc_id, score from b""",
        # shard merge: merged dictionary == whole-corpus df; merged BM25 ==
        # single-build BM25 (df/n_docs/avgdl fold exactly)
        "s9_merge_term_df": _DF,
        "q_merged_topk": _bm25_sql(BM25_Q, K),
        "q_sharded_topk": _bm25_sql(BM25_Q, K),
        "q_batched_sharded": f"""
            with a as ({_bm25_sql(BM25_Q, K)}),
                 b as ({_bm25_sql(BATCH_Q2, K)})
            select 'qa' as query_id, doc_id, score from a
            union all
            select 'qb' as query_id, doc_id, score from b""",
        "q_merged_bm25f": _bm25f_sql(list(BM25_Q), K),
        # layout invariant: blocks per (term, doc-bucket) == ceil(cnt/128)
        # under the default geometry (bucket_range 65536, block_size 128)
        "a4_index_geometry": f"""
            with tf as ({_TF}),
            tb as (select term, doc_id // 65536 as bucket, count(*) as cnt
                   from tf group by term, bucket)
            select term, cast(sum(cnt) as bigint) as df,
                   cast(sum(cast(ceil(cnt / 128.0) as bigint)) as bigint)
                     as n_blocks,
                   cast(sum(cnt) as bigint) as n_postings
            from tb group by term""",
        "s6_upsert_fielded_df": """
            with docs as (
              select doc_id, text from documents where doc_id not in (7, 11)
              union all select 7, 'replacement text about spark merge operations'
              union all select 11, 'another replacement mentioning hash scan pipelines'
              union all select 10000001, 'entirely new document exercising upsert insert path'
            ),
            toks as (select doc_id, unnest(list_filter(string_split_regex(
              regexp_replace(lower(substr(text, 1, 60)), '[^a-z0-9 ]', ' ', 'g'),
              ' +'), x -> x <> '')) as term from docs)
            select term, cast(count(distinct doc_id) as bigint) as df
            from toks group by term""",
        "q9_metadata_projection": f"""
            with b as ({_bm25_sql(BM25_Q, K)})
            select b.doc_id, b.score, d.lang, d.source,
                   coalesce(nullif(trim(regexp_extract(d.text,
                            '(?is)<title[^>]*>(.*?)</title>', 1)), ''),
                            substr(d.text, 1, 60)) as title
            from b join documents d using (doc_id)""",
        "a3_statistics": f"""
            select d.source, count(distinct d.doc_id) as n_docs,
                   count(t.term) as n_tokens
            from documents d left join ({_TOKS}) t using (doc_id)
            group by d.source""",
        # sampling thresholds are PRE-TRUNCATED literals (int(frac * 2^31))
        # because Spark's double→long cast truncates while DuckDB's rounds
        "pipeline_stratified_sample": """
            with s as (select doc_id,
                       's' || cast(doc_id % 3 as varchar) as source,
                       ((doc_id % 1000000007) * 1103515245 + 12345)
                         % 2147483648 as h
                       from documents)
            select doc_id, source from s
            where (source = 's0' and h < 1073741824)
               or (source = 's1' and h < 429496729)""",
        "pipeline_token_budget_mix": f"""
            with dl as ({_DL}),
            base as (select d.doc_id,
                     's' || cast(d.doc_id % 3 as varchar) as source,
                     coalesce(dl.dl, 0) as n_tokens,
                     ((d.doc_id % 1000000007) * 1103515245 + 12345)
                       % 2147483648 as h
                     from documents d left join dl on dl.doc_id = d.doc_id),
            cum as (select doc_id, source, n_tokens,
                    sum(n_tokens) over (partition by source
                                        order by h, doc_id
                                        rows unbounded preceding) as c
                    from base where source in ('s0', 's1'))
            select doc_id, source, cast(n_tokens as bigint) as n_tokens
            from cum
            where (source = 's0' and c <= 20000)
               or (source = 's1' and c <= 8000)""",
        "pipeline_temperature_mix": """
            with base as (
              select doc_id,
                     case when doc_id % 10 < 6 then 'big'
                          when doc_id % 10 < 9 then 'mid'
                          else 'small' end as source,
                     ((doc_id % 1000000007) * 1103515245 + 12345)
                       % 2147483648 as h
              from documents),
            sz as (select source, count(*) as n from base group by source),
            tot as (select sum(pow(n, 0.5)) as w from sz),
            tgt0 as (select source, n,
                            cast(floor(100 * pow(n, 0.5)
                                       / (select w from tot)) as bigint) as t
                     from sz),
            lo as (select 100 - sum(t) as rem from tgt0),
            tgt as (select source,
                           t + case when rnk <= (select rem from lo)
                                    then 1 else 0 end as t
                    from (select source, n, t,
                                 row_number() over (order by n desc,
                                                    source asc) as rnk
                          from tgt0)),
            rk as (select b.doc_id, b.source,
                          row_number() over (partition by b.source
                                             order by b.h, b.doc_id) as rn
                   from base b)
            select doc_id, source
            from rk join tgt using (source) where rn <= t""",
        # the naive formulation of sequence packing: ONE global cumsum over
        # the hash-ordered token stream (the engine's bucketed two-phase
        # prefix sum must reproduce it exactly), then per-doc slice explode
        "pipeline_pack_sequences": f"""
            with dl as ({_DL}),
            base as (select doc_id, dl as n,
                     ((doc_id % 1000000007) * 1103515245 + 12345)
                       % 2147483648 as h
                     from dl where dl > 0),
            cum as (select doc_id, n,
                    cast(sum(n) over (order by h, doc_id
                                      rows unbounded preceding) as bigint) as e
                    from base),
            placed as (select doc_id, e - n as s, e from cum),
            sliced as (select doc_id, s, e,
                       unnest(range(s // 512, (e - 1) // 512 + 1)) as seq_id
                       from placed)
            select doc_id, cast(seq_id as bigint) as seq_id,
                   cast(greatest(s, seq_id * 512) - seq_id * 512 as bigint)
                     as seq_pos,
                   cast(greatest(s, seq_id * 512) - s as bigint) as tok_from,
                   cast(least(e, (seq_id + 1) * 512)
                        - greatest(s, seq_id * 512) as bigint) as n_toks
            from sliced""",
        # grouped retrieval: per-turn BM25 (OR over the query terms) summed
        # per conversation (grp = doc_id % COLLAPSE_GROUPS under the entry's
        # transcript shaping); best turn by (round(s,9) desc, doc_id asc)
        "q_grouped_topk": f"""
with tf as ({_TF}), dfv as ({_DF}), dl as ({_DL}),
stats as (select count(*) as n, avg(dl) as avgdl from dl),
scored as (
  select tf.doc_id,
         sum( ln(1.0 + (stats.n - dfv.df + 0.5) / (dfv.df + 0.5))
              * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) as s
  from tf join dfv using (term) join dl using (doc_id) cross join stats
  where tf.term in ({", ".join(f"'{t}'" for t in BM25_Q)})
  group by tf.doc_id),
g as (select doc_id % {COLLAPSE_GROUPS} as grp, sum(s) as gs,
             count(*) as n_turns
      from scored group by 1),
best as (select doc_id % {COLLAPSE_GROUPS} as grp,
                doc_id as best_doc_id, s as bs
         from scored
         qualify row_number() over (partition by doc_id % {COLLAPSE_GROUPS}
                                    order by round(s, 9) desc, doc_id asc) = 1)
select cast(g.grp as bigint) as grp, round(g.gs, 6) as score,
       cast(g.n_turns as bigint) as n_turns,
       cast(best.best_doc_id as bigint) as best_doc_id,
       round(best.bs, 6) as best_doc_score
from g join best using (grp)
order by round(g.gs, 9) desc, g.grp asc limit {K}""",
        # contamination: distinct 3-gram shingles per doc vs the synthetic
        # eval set (every 25th doc); contaminated compares the ROUNDED frac
        "dedup_contamination": """
            with toks as (
              select doc_id, list_filter(string_split_regex(
                regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
                x -> x <> '') as t
              from documents),
            sh as (
              select doc_id,
                     case when len(t) >= 3 then
                       list_distinct([array_to_string(t[i:i+2], ' ')
                                      for i in range(1, len(t) - 1)])
                     else [] end as shingles
              from toks),
            bsh as (select distinct unnest(shingles) as shingle
                    from sh where doc_id % 25 = 0),
            ex as (select doc_id, unnest(shingles) as shingle from sh),
            cnt as (select doc_id, count(*) as n_shingles,
                    sum(case when shingle in (select shingle from bsh)
                        then 1 else 0 end) as n_overlap
                    from ex group by doc_id),
            j as (select s.doc_id,
                  coalesce(cnt.n_shingles, 0) as n_shingles,
                  coalesce(cnt.n_overlap, 0) as n_overlap,
                  round(case when coalesce(cnt.n_shingles, 0) > 0
                        then cnt.n_overlap * 1.0 / cnt.n_shingles
                        else 0.0 end, 6) as overlap_frac
                  from sh s left join cnt using (doc_id))
            select doc_id, cast(n_shingles as bigint) as n_shingles,
                   cast(n_overlap as bigint) as n_overlap, overlap_frac,
                   cast(case when overlap_frac >= 0.5 then 1 else 0 end
                        as bigint) as contaminated
            from j""",
        "dedup_cross_corpus": """
            with fp as (select doc_id,
                        md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) as fp
                        from documents)
            select doc_id, fp from fp
            where fp not in (select fp from fp where doc_id % 5 = 0)""",
        "dedup_exact": """
            with fp as (select doc_id,
                        md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) as fp
                        from documents)
            select min(doc_id) as doc_id, fp, count(*) as group_size
            from fp group by fp""",
        "dedup_jaccard_pairs": """
            with toks as (
              select doc_id, list_filter(string_split_regex(
                regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
                x -> x <> '') as t
              from documents where doc_id < 150),
            sh as (
              select doc_id, list_distinct([array_to_string(t[i:i+2], ' ')
                     for i in range(1, len(t) - 1)]) as shingles
              from toks where len(t) >= 3),
            ex as (select doc_id, unnest(shingles) as shingle from sh),
            hot as (select shingle from ex group by shingle having count(*) > 1000),
            ex2 as (select * from ex where shingle not in (select shingle from hot)),
            pairs as (
              select a.doc_id as id_a, b.doc_id as id_b, count(*) as inter
              from ex2 a join ex2 b using (shingle) where a.doc_id < b.doc_id
              group by a.doc_id, b.doc_id),
            sizes as (select doc_id, len(shingles) as n_sh from sh)
            select id_a, id_b, inter,
                   round(inter * 1.0 / (sa.n_sh + sb.n_sh - inter), 6) as jaccard
            from pairs join sizes sa on sa.doc_id = id_a
                       join sizes sb on sb.doc_id = id_b
            where inter * 1.0 / (sa.n_sh + sb.n_sh - inter) >= 0.2""",
        "q_multi_fusion": f"""
            with tf as ({_TF}), dfv as ({_DF}), dl as ({_DL}),
            stats as (select count(*) as n, avg(dl) as avgdl from dl),
            scored as (
              select tf.doc_id,
                     sum( ln(1.0 + (stats.n - dfv.df + 0.5) / (dfv.df + 0.5))
                          * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) as s
              from tf join dfv using (term) join dl using (doc_id) cross join stats
              where tf.term in ({", ".join(f"'{t}'" for t in BM25_Q)})
              group by tf.doc_id),
            lex_cut as (select doc_id, s from scored
                        order by round(s, 9) desc, doc_id asc limit 100),
            lex as (select doc_id, row_number() over (
                        order by round(s, 6) desc, doc_id asc) as lex_rank
                    from lex_cut),
            qv as (select embedding::DOUBLE[] as qv from embeddings where vec_id = 0),
            cs as (select vec_id,
                    round(list_dot_product(embedding::DOUBLE[], (select qv from qv))
                    / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                       * sqrt(list_dot_product((select qv from qv), (select qv from qv)))), 6) as c
                   from embeddings),
            vec_cut as (select vec_id as doc_id, c from cs
                        order by c desc, vec_id asc limit 100),
            vec as (select doc_id, row_number() over (
                        order by round(c, 6) desc, doc_id asc) as vec_rank
                    from vec_cut),
            rec_cut as (select doc_id from documents
                        order by doc_id desc limit 100),
            rec as (select doc_id, row_number() over (
                        order by doc_id desc) as rec_rank from rec_cut),
            j as (select coalesce(lex.doc_id, vec.doc_id, rec.doc_id)
                           as doc_id,
                         lex_rank, vec_rank, rec_rank
                  from lex
                  full join vec on lex.doc_id = vec.doc_id
                  full join rec on coalesce(lex.doc_id, vec.doc_id)
                                   = rec.doc_id),
            fused as (
              select doc_id,
                     coalesce(1.0::DOUBLE / (60 + lex_rank), 0.0)
                     + coalesce(1.0::DOUBLE / (60 + vec_rank), 0.0)
                     + coalesce(0.5::DOUBLE / (60 + rec_rank), 0.0) as s,
                     coalesce(lex_rank, 0) as lex_rank,
                     coalesce(vec_rank, 0) as vec_rank,
                     coalesce(rec_rank, 0) as rec_rank
              from j)
            select doc_id, round(s, 6) as score,
                   lex_rank, vec_rank, rec_rank
            from fused order by round(s, 9) desc, doc_id asc limit {K}""",
        "q_hybrid_rrf": f"""
            with tf as ({_TF}), dfv as ({_DF}), dl as ({_DL}),
            stats as (select count(*) as n, avg(dl) as avgdl from dl),
            scored as (
              select tf.doc_id,
                     sum( ln(1.0 + (stats.n - dfv.df + 0.5) / (dfv.df + 0.5))
                          * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) as s
              from tf join dfv using (term) join dl using (doc_id) cross join stats
              where tf.term in ({", ".join(f"'{t}'" for t in BM25_Q)})
              group by tf.doc_id),
            -- engine lexical list: cut top-100 by the engine ordering
            -- (round 9), then rank by the fusion quantization (round 6)
            lex_cut as (select doc_id, s from scored
                        order by round(s, 9) desc, doc_id asc limit 100),
            lex as (select doc_id, row_number() over (
                        order by round(s, 6) desc, doc_id asc) as lex_rank
                    from lex_cut),
            qv as (select embedding::DOUBLE[] as qv from embeddings where vec_id = 0),
            cs as (select vec_id,
                    round(list_dot_product(embedding::DOUBLE[], (select qv from qv))
                    / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                       * sqrt(list_dot_product((select qv from qv), (select qv from qv)))), 6) as c
                   from embeddings),
            vec_cut as (select vec_id as doc_id, c from cs
                        order by c desc, vec_id asc limit 100),
            vec as (select doc_id, row_number() over (
                        order by round(c, 6) desc, doc_id asc) as vec_rank
                    from vec_cut),
            fused as (
              select coalesce(lex.doc_id, vec.doc_id) as doc_id,
                     coalesce(1.0::DOUBLE / (60 + lex_rank), 0.0)
                     + coalesce(1.0::DOUBLE / (60 + vec_rank), 0.0) as s,
                     coalesce(lex_rank, 0) as lex_rank,
                     coalesce(vec_rank, 0) as vec_rank
              from lex full join vec on lex.doc_id = vec.doc_id)
            select doc_id, round(s, 6) as score, lex_rank, vec_rank
            from fused order by round(s, 9) desc, doc_id asc limit {K}""",
        "q_hybrid_batched": f"""
            with tf as ({_TF}), dfv as ({_DF}), dl as ({_DL}),
            stats as (select count(*) as n, avg(dl) as avgdl from dl),
            {_hybrid_ctes("a", BM25_Q, 0)},
            {_hybrid_ctes("b", HYB_Q2, 1)}
            select * from top_a where rank <= {K}
            union all
            select * from top_b where rank <= {K}""",
        "sim_mmr_topk": _mmr_sql(MMR_K, MMR_N, MMR_LAM),
        "sim_cosine_topk": f"""
            with q as (select embedding::DOUBLE[] as qv from embeddings where vec_id = 0),
            s as (select vec_id,
                   list_dot_product(embedding::DOUBLE[], (select qv from q))
                   / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                      * sqrt(list_dot_product((select qv from q), (select qv from q)))) as c
                  from embeddings)
            select vec_id, round(c, 6) as cos from s
            order by round(c, 6) desc, vec_id asc limit {K}""",
        "text_quality": """
            with toks as (
              select doc_id, list_filter(string_split_regex(
                regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
                x -> x <> '') as t
              from documents)
            select d.doc_id,
                   len(t.t) as n_tokens,
                   length(d.text) as n_chars,
                   round(list_sum(list_transform(t.t, x -> length(x))) * 1.0
                         / greatest(len(t.t), 1), 6) as avg_token_len,
                   round(length(regexp_replace(d.text, '[a-zA-Z0-9\\s]', '', 'g')) * 1.0
                         / greatest(length(d.text), 1), 6) as punct_ratio,
                   round(length(regexp_replace(d.text, '[^0-9]', '', 'g')) * 1.0
                         / greatest(length(d.text), 1), 6) as digit_ratio
            from documents d join toks t using (doc_id)""",
        "text_fingerprint": """
            select doc_id,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) as fp
            from documents""",
        "text_winnowing": """
            with a as (select doc_id, list_filter(string_split_regex(
                         regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                         ' +'), x -> x <> '') as t
                       from documents),
            b as (select doc_id, t, len(t) as n from a where len(t) >= 5),
            g0 as (select doc_id,
                          [array_to_string(t[i+1:i+5], ' ')
                           for i in range(n - 4)] as grams
                   from b),
            h as (select doc_id,
                         unnest(range(len(grams))) as i,
                         ('0x' || substr(md5(unnest(grams)), 1, 8))::bigint
                             as hv
                  from g0),
            wins as (select doc_id,
                            unnest(range(greatest(len(grams) - 4, 0) + 1))
                                as p
                     from g0),
            cand as (select w.doc_id, w.p, h.i, h.hv
                     from wins w join h on h.doc_id = w.doc_id
                                       and h.i between w.p and w.p + 3),
            pick as (select doc_id, p, i, hv,
                            row_number() over (partition by doc_id, p
                                               order by hv asc, i desc) as rn
                     from cand)
            select distinct doc_id,
                   cast(i as bigint) as pos, cast(hv as bigint) as fp
            from pick where rn = 1""",
        # PII scrub: same synthetic shaping + the same ordered regex
        # chain (counts taken on the text each pattern actually sees)
        "text_pii_scrub": r"""
            with s0 as (select doc_id,
                   text || ' contact doc' || doc_id
                        || '@example.com or 555-123-4567' as t
              from documents),
            c1 as (select doc_id,
                   len(regexp_extract_all(t,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                       as n_email,
                   regexp_replace(t,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g') as t from s0),
            c2 as (select doc_id, n_email,
                   len(regexp_extract_all(t, '\b\d{3}-\d{2}-\d{4}\b'))
                       as n_ssn,
                   regexp_replace(t, '\b\d{3}-\d{2}-\d{4}\b',
                                  '<SSN>', 'g') as t from c1),
            c3 as (select doc_id, n_email, n_ssn,
                   len(regexp_extract_all(t, '\b(?:\d{4}[ -]){3}\d{4}\b'))
                       as n_card,
                   regexp_replace(t, '\b(?:\d{4}[ -]){3}\d{4}\b',
                                  '<CARD>', 'g') as t from c2),
            c4 as (select doc_id, n_email, n_ssn, n_card,
                   len(regexp_extract_all(t, '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b'))
                       as n_phone,
                   regexp_replace(t, '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b',
                                  '<PHONE>', 'g') as t from c3),
            c5 as (select doc_id, n_email, n_ssn, n_card, n_phone,
                   len(regexp_extract_all(t,
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) as n_ip,
                   regexp_replace(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                                  '<IP>', 'g') as t from c4)
            select doc_id, t as text_clean, n_email, n_ssn, n_card,
                   n_phone, n_ip,
                   n_email + n_ssn + n_card + n_phone + n_ip as n_pii
            from c5""",
        # C4-style line cleaning over the ' batch ' → sentence-break
        # shaping; dedupe keep-first via row_number over line order
        "text_clean_lines": r"""
            with s as (select doc_id,
                   regexp_replace(text, ' batch ', '.' || chr(10), 'g')
                   || '.' as t from documents),
            ln as (select doc_id, ord, trim(l) as line from (
                     select doc_id,
                            unnest(string_split(t, chr(10))) as l,
                            unnest(range(len(string_split(t, chr(10)))))
                                as ord
                     from s)),
            k as (select * from ln
                  where len(list_filter(string_split_regex(line, '\s+'),
                            x -> x <> '')) >= 3
                    and regexp_matches(line, '[.!?"]$')
                    and not contains(lower(line), 'javascript')),
            d as (select * from (
                    select doc_id, ord, line,
                           row_number() over (partition by doc_id, line
                                              order by ord) as rn from k)
                  where rn = 1),
            agg as (select doc_id,
                    string_agg(line, chr(10) order by ord) as text_clean,
                    cast(count(*) as int) as n_kept from d group by doc_id),
            nl as (select doc_id,
                   cast(len(string_split(t, chr(10))) as int) as n_lines,
                   contains(lower(t), 'lorem ipsum') as lorem,
                   contains(t, '{') as brace from s)
            select a.doc_id, a.text_clean, nl.n_lines, a.n_kept
            from agg a join nl using (doc_id)
            where a.n_kept >= 1 and not nl.lorem and not nl.brace""",
        # repetition metrics over the same shaping: dup-line fraction +
        # top-bigram fraction (mode bigram count / total bigrams)
        "text_repetition": r"""
            with s as (select doc_id,
                   regexp_replace(text, ' batch ', '.' || chr(10), 'g')
                   || '.' as t from documents),
            ln as (select doc_id, trim(l) as line from (
                     select doc_id, unnest(string_split(t, chr(10))) as l
                     from s)
                   where trim(l) <> ''),
            lf as (select doc_id, cast(count(*) as int) as n_lines,
                   round(1.0 - count(distinct line) * 1.0 / count(*), 6)
                       as dup_line_frac
                   from ln group by doc_id),
            arrs as (select doc_id, list_filter(string_split_regex(
                regexp_replace(lower(t), '[^a-z0-9 ]', ' ', 'g'), ' +'),
                x -> x <> '') as arr from s),
            tp as (select doc_id, unnest(arr) as term,
                   unnest(range(len(arr))) as pos from arrs),
            bg as (select a.doc_id, a.term || ' ' || b.term as g
                   from tp a join tp b
                   on a.doc_id = b.doc_id and b.pos = a.pos + 1),
            bc as (select doc_id, g, count(*) as c from bg
                   group by doc_id, g),
            bt as (select doc_id, cast(sum(c) as int) as n_bigrams,
                   round(max(c) * 1.0 / sum(c), 6) as top_bigram_frac
                   from bc group by doc_id)
            select s.doc_id,
                   coalesce(lf.n_lines, 0) as n_lines,
                   coalesce(lf.dup_line_frac, 0.0) as dup_line_frac,
                   coalesce(bt.n_bigrams, 0) as n_bigrams,
                   coalesce(bt.top_bigram_frac, 0.0) as top_bigram_frac
            from s left join lf using (doc_id)
                   left join bt using (doc_id)""",
        "text_chunks": r"""
            with w as (
              select doc_id,
                     list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> '') as words
              from documents),
            c as (select doc_id, words,
                         greatest(cast(ceil((len(words) - 10) * 1.0 / 30)
                                       as bigint), 1) as nc
                  from w where len(words) > 0),
            e as (select doc_id, words,
                         unnest(range(nc)) as ci
                  from c)
            select doc_id, cast(ci as int) as chunk_idx,
                   cast(len(words[ci * 30 + 1 : ci * 30 + 40]) as int)
                       as n_tokens,
                   array_to_string(words[ci * 30 + 1 : ci * 30 + 40], ' ')
                       as text
            from e""",
        "q10_fragments": f"""
            with s as (select doc_id, replace(text, ' batch ', '. ') as t
                       from documents),
            fr as (select doc_id, list_transform(
                     regexp_extract_all(t,
                       '[^.!?;]*\\b(?:merge|scan)\\b[^.!?;]*', 0, 'i')[1:3],
                     x -> trim(x)) as frs
                   from s),
            hl as (select doc_id, list_transform(frs,
                     x -> regexp_replace(x, '\\b(merge|scan)\\b',
                                         '<b>\\1</b>', 'gi')) as hls
                   from fr),
            tr as (select doc_id, list_transform(hls,
                     hl -> case when length(hl) <= 300 then hl
                           else (case when greatest(strpos(hl,'<b>')-1-120, 0)
                                           > 0 then '…' else '' end)
                                || substr(hl,
                                     greatest(strpos(hl,'<b>')-1-120,0)+1,
                                     least(length(hl), strpos(hl,'<b>')-1+120)
                                     - greatest(strpos(hl,'<b>')-1-120,0))
                                || (case when least(length(hl),
                                               strpos(hl,'<b>')-1+120)
                                              < length(hl)
                                    then '…' else '' end)
                           end) as ts
                   from hl)
            select doc_id,
                   case when len(ts) = 0 then 'Нет совпадений для подсветки'
                        else array_to_string(ts, ' … ') end as snippet
            from tr""",
        "text_hot_lines": r"""
            with s as (
              select doc_id,
                     replace(text, ' batch ', '.' || chr(10))
                     || chr(10) || 'subscribe to our newsletter today'
                     || (case when doc_id % 7 = 0
                         then chr(10) || 'follow us for updates now'
                         else '' end)
                     || (case when doc_id % 100 = 0
                         then chr(10) || 'rare footer line here'
                         else '' end) as t
              from documents),
            ln as (select doc_id,
                          unnest(string_split(t, chr(10))) as line,
                          unnest(range(len(string_split(t, chr(10)))))
                              as ord
                   from s),
            cl as (select *,
                          len(list_filter(string_split_regex(trim(line),
                              '\s+'), x -> x <> '')) >= 3 as countable
                   from ln),
            hot as (select line from cl where countable
                    group by line having count(distinct doc_id) > 10),
            kept as (select * from cl
                     where not (countable
                                and line in (select line from hot))),
            tot as (select doc_id, count(*) as n_lines from cl
                    group by doc_id),
            agg as (select doc_id,
                           string_agg(line, chr(10) order by ord) as text,
                           count(*) as n_kept
                    from kept group by doc_id)
            select a.doc_id, a.text,
                   cast(t.n_lines - a.n_kept as int) as n_dropped
            from agg a join tot t using (doc_id)""",
        "q_batched_passage": f"""
            with {_PASSAGE_CTES},
            qt as (select * from (values ('qa', 'scan'), ('qa', 'merge'),
                                         ('qb', 'hash'), ('qb', 'join'))
                   as t(query_id, term)),
            scored as (
              select qt.query_id, tf.doc_id, tf.chunk_idx,
                     sum( ln(1.0 + (stats.n - cdf.df + 0.5) / (cdf.df + 0.5))
                          * (tf.tf * 2.2)
                          / (tf.tf + 1.2 * (0.25 + 0.75 * cdl.dl
                                            / stats.avgdl)) ) as s
              from ctf tf join qt using (term) join cdf using (term)
              join cdl on tf.doc_id = cdl.doc_id
                      and tf.chunk_idx = cdl.chunk_idx
              cross join stats
              group by qt.query_id, tf.doc_id, tf.chunk_idx),
            rk as (select query_id, doc_id, chunk_idx, s,
                          row_number() over (partition by query_id, doc_id
                                             order by round(s, 9) desc,
                                                      chunk_idx asc) as rn
                   from scored),
            byd as (select query_id, doc_id, max(s) as s,
                           cast(count(*) as bigint) as n_chunks,
                           max(case when rn = 1 then chunk_idx end)
                               as best_chunk
                    from rk group by query_id, doc_id),
            fin as (select query_id, doc_id, s, n_chunks, best_chunk,
                           row_number() over (partition by query_id
                                              order by round(s, 9) desc,
                                                       doc_id asc) as rank
                    from byd)
            select query_id, cast(rank as int) as rank, doc_id,
                   cast(best_chunk as int) as best_chunk, n_chunks,
                   round(s, 6) as score
            from fin where rank <= {K}""",
        "q_passage_topk": f"""
            with {_PASSAGE_CTES},
            scored as (
              select tf.doc_id, tf.chunk_idx,
                     sum( ln(1.0 + (stats.n - cdf.df + 0.5) / (cdf.df + 0.5))
                          * (tf.tf * 2.2)
                          / (tf.tf + 1.2 * (0.25 + 0.75 * cdl.dl
                                            / stats.avgdl)) ) as s
              from ctf tf join cdf using (term)
              join cdl on tf.doc_id = cdl.doc_id
                      and tf.chunk_idx = cdl.chunk_idx
              cross join stats
              where tf.term in ('scan', 'merge')
              group by tf.doc_id, tf.chunk_idx),
            rk as (select doc_id, chunk_idx, s,
                          row_number() over (partition by doc_id
                                             order by round(s, 9) desc,
                                                      chunk_idx asc) as rn
                   from scored),
            byd as (select doc_id, max(s) as s,
                           cast(count(*) as bigint) as n_chunks,
                           max(case when rn = 1 then chunk_idx end)
                               as best_chunk
                    from rk group by doc_id)
            select doc_id, cast(best_chunk as int) as best_chunk,
                   n_chunks, round(s, 6) as score
            from byd order by round(s, 9) desc, doc_id asc limit {K}""",
        "q_eval_retrieval": f"""
            with ra as ({_bm25_rank_sql(BM25_Q, K)}),
            rb as ({_bm25_rank_sql(BATCH_Q2, K)}),
            run as (select 'qa' as query_id, doc_id, rank from ra
                    union all
                    select 'qb' as query_id, doc_id, rank from rb),
            jq as (select q.query_id, d.doc_id,
                          case when d.doc_id % 11 = 0 then 2
                               when d.doc_id % 2 = 0 then 1 end as rel
                   from (select 'qa' as query_id union all select 'qb') q
                   cross join documents d
                   where d.doc_id < 300
                     and (d.doc_id % 11 = 0 or d.doc_id % 2 = 0)),
            nrel as (select query_id, count(*) as n_rel
                     from jq group by query_id),
            ideal as (select query_id,
                             sum((pow(2.0, rel) - 1) / log2(ir + 1)) as idcg
                      from (select query_id, rel,
                                   row_number() over (
                                     partition by query_id
                                     order by rel desc, doc_id asc) as ir
                            from jq)
                      where ir <= {K} group by query_id),
            hits as (select r.query_id, r.rank, coalesce(jq.rel, 0) as rel
                     from run r left join jq
                       on r.query_id = jq.query_id
                      and r.doc_id = jq.doc_id),
            got as (select query_id,
                           sum((pow(2.0, rel) - 1) / log2(rank + 1)) as dcg,
                           sum(case when rel > 0 then 1 else 0 end) as n_hit,
                           max(case when rel > 0
                               then 1.0::double / rank end) as rr
                    from hits group by query_id)
            select n.query_id, cast(n.n_rel as bigint) as n_rel,
                   round(coalesce(g.n_hit, 0) * 1.0::double / {K}, 6)
                       as precision,
                   round(coalesce(g.n_hit, 0) * 1.0::double / n.n_rel, 6)
                       as recall,
                   round(coalesce(g.rr, 0.0), 6) as rr,
                   round(coalesce(g.dcg, 0.0) / i.idcg, 6) as ndcg
            from nrel n join ideal i using (query_id)
            left join got g using (query_id)""",
        "text_span_dedup": f"""
            with s as (
              select doc_id,
                     case when doc_id % 50 = 9 then '{_SPAN_FIXED}'
                          when doc_id % 3 = 0 then text || '{_SPAN_SUFFIX}'
                          else text end as text
              from documents),
            w as (select doc_id,
                         list_filter(string_split_regex(text, '\\s+'),
                                     x -> x <> '') as words
                  from s),
            base as (select doc_id, words, len(words) as n
                     from w where len(words) > 0),
            occ as (select doc_id, words, unnest(range(n - 7)) as pos
                    from base where n >= 8),
            wins as (select doc_id, pos,
                            array_to_string(words[pos + 1 : pos + 8], ' ')
                                as win
                     from occ),
            rk as (select doc_id, pos,
                          row_number() over (partition by win
                                             order by doc_id, pos) as rn,
                          count(*) over (partition by win) as c
                   from wins),
            cp as (select distinct doc_id, tokpos from
                     (select doc_id, unnest(range(pos, pos + 8)) as tokpos
                      from rk where c >= 2 and rn > 1)),
            toks as (select doc_id, unnest(words) as tok,
                            unnest(range(len(words))) as tokpos
                     from base),
            kept as (select t.doc_id, t.tokpos, t.tok
                     from toks t left join cp
                       on t.doc_id = cp.doc_id and t.tokpos = cp.tokpos
                     where cp.doc_id is null),
            agg as (select doc_id,
                           string_agg(tok, ' ' order by tokpos) as text,
                           count(*) as n_kept
                    from kept group by doc_id)
            select b.doc_id, coalesce(a.text, '') as text,
                   cast(b.n - coalesce(a.n_kept, 0) as int) as n_removed
            from base b left join agg a using (doc_id)""",
        "text_ngram_counts": r"""
            with toks as (
              select doc_id, list_filter(string_split_regex(
                regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
                x -> x <> '') as t
              from documents),
            g as (select unnest([array_to_string(t[i:i+2], ' ')
                                 for i in range(1, len(t) - 1)]) as ngram
                  from toks where len(t) >= 3),
            c as (select ngram, count(*) as n_occurrences from g
                  group by ngram)
            select ngram, cast(n_occurrences as bigint) as n_occurrences
            from c where n_occurrences >= 2
            order by n_occurrences desc, ngram asc limit 50""",
        "text_collocations": f"""
            with tk as (
              select doc_id, list_filter(string_split_regex(
                regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
                x -> x <> '') as t
              from documents),
            bg as (select unnest([t[i] || ' ' || t[i+1]
                                  for i in range(1, len(t))]) as bg
                   from tk where len(t) >= 2),
            bi as (select string_split(bg, ' ')[1] as w1,
                          string_split(bg, ' ')[2] as w2,
                          count(*) as n_ab
                   from bg group by 1, 2),
            nbi as (select sum(n_ab) * 1.0 as n_bi from bi),
            uni as (select term as w, count(*) as c from ({_TOKS})
                    group by term),
            ntok as (select sum(c) * 1.0 as n_tok from uni),
            j as (select bi.w1, bi.w2, bi.n_ab,
                         ln((bi.n_ab * 1.0 / nbi.n_bi)
                            / ((ua.c * 1.0 / ntok.n_tok)
                               * (ub.c * 1.0 / ntok.n_tok))) as pmi
                  from bi join uni ua on ua.w = bi.w1
                          join uni ub on ub.w = bi.w2
                  cross join nbi cross join ntok
                  where bi.n_ab >= 5)
            select w1, w2, cast(n_ab as bigint) as n_ab,
                   round(pmi, 6) as pmi
            from j order by round(pmi, 9) desc, w1, w2 limit 30""",
        "pipeline_pack_token_ids": r"""
            with w as (
              select doc_id,
                     list_filter(string_split_regex(
                       regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                       ' +'), x -> x <> '') as words
              from documents),
            base as (select doc_id, len(words) as n,
                            ((doc_id % 1000000007) * 1103515245 + 12345)
                              % 2147483648 as h
                     from w where len(words) > 0),
            cum as (select doc_id,
                           cast(sum(n) over (order by h, doc_id
                                             rows unbounded preceding)
                                - n as bigint) as s
                    from base),
            toks as (select doc_id, unnest(words) as term,
                            unnest(range(len(words))) as pos
                     from w),
            cnt as (select term, count(*) as c from toks group by 1),
            ids as (select term,
                           row_number() over (order by c desc, term asc)
                             as token_id
                    from cnt),
            enc as (select t.doc_id, t.pos,
                           cast(coalesce(i.token_id, 0) as bigint)
                             as token_id
                    from toks t
                    left join (select * from ids where token_id < 32) i
                      using (term)),
            off as (select c.s + e.pos as o, e.token_id
                    from enc e join cum c using (doc_id))
            select cast(o // 512 as bigint) as seq_id,
                   cast(o % 512 as bigint) as pos, token_id
            from off""",
        "q_bm25_en_topk": f"""
            with m as (
              select doc_id,
                     text || ' ' ||
                     (case cast(doc_id % 5 as int)
                        when 0 then 'tables' when 1 then 'table'
                        when 2 then 'queries' when 3 then 'query'
                        else '' end) as text
              from documents),
            toks as (select doc_id,
                            unnest(list_filter(string_split_regex(
                              regexp_replace(lower(text), '[^a-z0-9 ]',
                                             ' ', 'g'), ' +'),
                              x -> x <> '')) as w
                     from m),
            kept as (
              select doc_id,
                     case when len(w) <= 3 then w
                          when w like '%ies' then
                            case when w like '%eies' or w like '%aies'
                                 then w
                                 else substr(w, 1, len(w) - 3) || 'y' end
                          when w like '%es' then
                            case when w like '%aes' or w like '%ees'
                                      or w like '%oes'
                                 then w
                                 else substr(w, 1, len(w) - 1) end
                          when w like '%s' then
                            case when w like '%us' or w like '%ss'
                                 then w
                                 else substr(w, 1, len(w) - 1) end
                          else w end as term
              from toks
              where w not in ('a','an','the','and','or','but','if','then',
                              'else','of','to','in','on','at','by','for',
                              'with','from','as','that','this','these',
                              'those','it','its','is','are','was','were',
                              'be','been','being','am','do','does','did',
                              'not','no','so','such','than','too','very',
                              'will','would','can','could','may','might',
                              'shall','should')),
            tf as (select doc_id, term, count(*) as tf
                   from kept group by 1, 2),
            dfv as (select term, count(*) as df from tf group by 1),
            dl as (select doc_id, count(*) as dl from kept group by 1),
            stats as (select count(*) as n, avg(dl) as avgdl from dl),
            scored as (
              select tf.doc_id,
                     sum( ln(1.0 + (stats.n - dfv.df + 0.5)
                             / (dfv.df + 0.5))
                          * (tf.tf * 2.2)
                          / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                                            / stats.avgdl)) ) as s
              from tf join dfv using (term) join dl using (doc_id)
              cross join stats
              where tf.term in ('table', 'query')
              group by tf.doc_id)
            select doc_id, round(s, 6) as score from scored
            order by round(s, 9) desc, doc_id asc limit {K}""",
        "q_bm25_porter_topk": f"""
            with map as (select * from read_parquet(
              '/root/repo/tests/data/expected_porter_map.parquet')),
            m as (
              select doc_id,
                     lower(text) || ' ' ||
                     (case cast(doc_id % 5 as int)
                        when 0 then 'connection' when 1 then 'connected'
                        when 2 then 'connecting'
                        when 3 then 'generalization'
                        else '' end) as text
              from documents),
            toks as (select doc_id,
                            unnest(list_filter(string_split_regex(
                              regexp_replace(lower(text), '[^a-z0-9 ]',
                                             ' ', 'g'), ' +'),
                              x -> x <> '')) as word
                     from m),
            kept as (select t.doc_id, mp.stem as term
                     from toks t join map mp using (word)),
            tf as (select doc_id, term, count(*) as tf
                   from kept group by 1, 2),
            dfv as (select term, count(*) as df from tf group by 1),
            dl as (select doc_id, count(*) as dl from kept group by 1),
            stats as (select count(*) as n, avg(dl) as avgdl from dl),
            scored as (
              select tf.doc_id,
                     sum( ln(1.0 + (stats.n - dfv.df + 0.5)
                             / (dfv.df + 0.5))
                          * (tf.tf * 2.2)
                          / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                                            / stats.avgdl)) ) as s
              from tf join dfv using (term) join dl using (doc_id)
              cross join stats
              where tf.term in (select distinct stem from map
                                where word in ('connection',
                                               'generalizations'))
              group by tf.doc_id)
            select doc_id, round(s, 6) as score from scored
            order by round(s, 9) desc, doc_id asc limit {K}""",
        "pipeline_encode_ids": r"""
            with w as (
              select doc_id,
                     list_filter(string_split_regex(
                       regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                       ' +'), x -> x <> '') as words
              from documents),
            toks as (select doc_id, unnest(words) as term,
                            unnest(range(len(words))) as pos
                     from w),
            cnt as (select term, count(*) as c from toks group by 1),
            ids as (select term,
                           row_number() over (order by c desc, term asc)
                             as token_id
                    from cnt)
            select t.doc_id, cast(t.pos as int) as pos,
                   cast(coalesce(i.token_id, 0) as bigint) as token_id
            from toks t
            left join (select * from ids where token_id < 32) i
              using (term)""",
        "corpus_profile": r"""
            with t as (
              select lang, source,
                     len(list_filter(string_split_regex(
                       regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                       ' +'), x -> x <> '')) as n_tokens,
                     length(text) as n_chars
              from documents)
            select lang, source,
                   cast(count(*) as bigint) as n_docs,
                   cast(sum(n_tokens) as bigint) as total_tokens,
                   cast(sum(n_chars) as bigint) as total_chars,
                   round(avg(n_tokens), 6) as mean_tokens,
                   round(quantile_cont(n_tokens, 0.5), 6) as p50_tokens,
                   round(quantile_cont(n_tokens, 0.9), 6) as p90_tokens,
                   round(quantile_cont(n_tokens, 0.99), 6) as p99_tokens
            from t group by lang, source""",
        "text_nb_classify": r"""
            with toks as (
              select doc_id, lang,
                     unnest(list_filter(string_split_regex(
                       regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                       ' +'), x -> x <> '')) as term
              from documents),
            cnt as (select lang as label, term, count(*) as c
                    from toks group by 1, 2),
            v as (select count(distinct term) as v from cnt),
            tot as (select label, sum(c) as n from cnt group by 1),
            dc as (select lang as label, count(*) as dcnt
                   from documents group by 1),
            nd as (select count(*) as nd from documents),
            lab as (select dc.label, ln(dc.dcnt * 1.0 / nd.nd) as logprior,
                           (coalesce(tot.n, 0) + 1.0 * (v.v + 1)) as den
                    from dc cross join nd cross join v
                    left join tot on tot.label = dc.label),
            tl as (select t.doc_id, l.label, l.den, coalesce(c.c, 0) as c
                   from toks t cross join lab l
                   left join cnt c on c.label = l.label
                                  and c.term = t.term),
            per as (select doc_id, label, count(*) as n_tokens,
                           sum(ln((c + 1.0) / den)) as s
                    from tl group by 1, 2),
            base as (select d.doc_id, l.label, l.logprior
                     from documents d cross join lab l),
            sc as (select b.doc_id, b.label,
                          coalesce(p.n_tokens, 0) as n_tokens,
                          (b.logprior + coalesce(p.s, 0.0))
                          / (coalesce(p.n_tokens, 0) + 1.0) as score
                   from base b left join per p
                     on p.doc_id = b.doc_id and p.label = b.label),
            rk as (select doc_id, label, n_tokens, score,
                          row_number() over (partition by doc_id
                                             order by round(score, 9) desc,
                                                      label asc) as rn
                   from sc)
            select doc_id, label as pred,
                   cast(n_tokens as bigint) as n_tokens,
                   round(score, 6) as score
            from rk where rn = 1""",
        "text_cnb_classify": r"""
            with toks as (
              select doc_id, lang,
                     unnest(list_filter(string_split_regex(
                       regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                       ' +'), x -> x <> '')) as term
              from documents),
            cnt as (select lang as label, term, count(*) as c
                    from toks group by 1, 2),
            v as (select count(distinct term) as v from cnt),
            termtot as (select term, sum(c) as tc from cnt group by 1),
            tot as (select label, sum(c) as n from cnt group by 1),
            grand as (select sum(c) as g from cnt),
            dc as (select lang as label, count(*) as dcnt
                   from documents group by 1),
            nd as (select count(*) as nd from documents),
            lab as (select dc.label, ln(dc.dcnt * 1.0 / nd.nd) as logprior,
                           ((grand.g - coalesce(tot.n, 0))
                            + 1.0 * (v.v + 1)) as den
                    from dc cross join nd cross join v cross join grand
                    left join tot on tot.label = dc.label),
            tl as (select t.doc_id, l.label, l.den,
                          coalesce(tt.tc, 0) - coalesce(c.c, 0) as cc
                   from toks t cross join lab l
                   left join termtot tt on tt.term = t.term
                   left join cnt c on c.label = l.label
                                  and c.term = t.term),
            per as (select doc_id, label, count(*) as n_tokens,
                           sum(-ln((cc + 1.0) / den)) as s
                    from tl group by 1, 2),
            base as (select d.doc_id, l.label, l.logprior
                     from documents d cross join lab l),
            sc as (select b.doc_id, b.label,
                          coalesce(p.n_tokens, 0) as n_tokens,
                          (b.logprior + coalesce(p.s, 0.0))
                          / (coalesce(p.n_tokens, 0) + 1.0) as score
                   from base b left join per p
                     on p.doc_id = b.doc_id and p.label = b.label),
            rk as (select doc_id, label, n_tokens, score,
                          row_number() over (partition by doc_id
                                             order by round(score, 9) desc,
                                                      label asc) as rn
                   from sc)
            select doc_id, label as pred,
                   cast(n_tokens as bigint) as n_tokens,
                   round(score, 6) as score
            from rk where rn = 1""",
        "text_gopher": r"""
            with w as (
              select doc_id, text,
                     list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> '') as words,
                     list_filter(list_transform(string_split(text, chr(10)),
                                                l -> trim(l)),
                                 l -> l <> '') as lines,
                     list_distinct(list_filter(string_split_regex(
                         regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                         ' +'), x -> x <> '')) as toks
              from documents),
            m as (
              select doc_id,
                cast(len(words) as bigint) as n_words,
                list_sum(list_transform(words, x -> len(x))) * 1.0
                  / greatest(len(words), 1) as mean_word_len,
                ((len(text) - len(replace(text, '#', '')))
                 + (len(text) - len(replace(text, '...', ''))) // 3
                 + (len(text) - len(replace(text, '…', '')))) * 1.0
                  / greatest(len(words), 1) as symbol_ratio,
                len(list_filter(lines,
                    l -> regexp_matches(l, '^[-*•‣◦]'))) * 1.0
                  / greatest(len(lines), 1) as bullet_frac,
                len(list_filter(lines,
                    l -> regexp_matches(l, '(\.\.\.|…)$'))) * 1.0
                  / greatest(len(lines), 1) as ellipsis_frac,
                len(list_filter(words,
                    x -> regexp_matches(x, '[A-Za-zА-Яа-я]'))) * 1.0
                  / greatest(len(words), 1) as alpha_frac,
                cast(len(list_intersect(toks,
                    ['the','be','to','of','and','that','have','with']))
                  as bigint) as n_stop
              from w)
            select doc_id, n_words,
                   round(mean_word_len, 6) as mean_word_len,
                   round(symbol_ratio, 6) as symbol_ratio,
                   round(bullet_frac, 6) as bullet_frac,
                   round(ellipsis_frac, 6) as ellipsis_frac,
                   round(alpha_frac, 6) as alpha_frac,
                   n_stop,
                   cast(n_words between 50 and 100000
                        and mean_word_len between 3.0 and 10.0
                        and symbol_ratio < 0.1
                        and bullet_frac < 0.9
                        and ellipsis_frac < 0.3
                        and alpha_frac >= 0.8
                        and n_stop >= 2 as int) as passes
            from m""",
        "text_bigram_ppl": r"""
            with t as (select doc_id, list_filter(string_split_regex(
                         regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                         ' +'), x -> x <> '') as w
                       from documents),
            tw as (select doc_id, w from t where len(w) > 0),
            toks as (select doc_id, unnest(w) as term from tw),
            uni as (select term, count(*) as c from toks group by term),
            nv as (select sum(c) as n, count(*) as v from uni),
            pairs as (select doc_id, w[i] as pv, w[i+1] as pw
                      from (select doc_id, w, unnest(range(1, len(w))) as i
                            from tw)),
            big as (select pv, pw, count(*) as c from pairs group by pv, pw),
            ctx as (select pv, sum(c) as cv from big group by pv),
            rows_ as (select doc_id,
                             case when i = 1 then null else w[i-1] end as pv,
                             w[i] as pw
                      from (select doc_id, w,
                                   unnest(range(1, len(w) + 1)) as i
                            from tw)),
            sc as (select r.doc_id,
                          case when r.pv is null
                               then ln((coalesce(u.c, 0) + 1.0)
                                       / (nv.n + nv.v))
                               when b.c is not null
                               then ln(b.c * 1.0 / cx.cv)
                               else ln(0.4) + ln((coalesce(u.c, 0) + 1.0)
                                                 / (nv.n + nv.v)) end as s
                   from rows_ r cross join nv
                   left join uni u on u.term = r.pw
                   left join big b on b.pv = r.pv and b.pw = r.pw
                   left join ctx cx on cx.pv = r.pv),
            agg as (select doc_id, count(*) as n_tokens, avg(s) as mls
                    from sc group by doc_id)
            select doc_id, cast(n_tokens as bigint) as n_tokens,
                   round(-mls, 6) as log_ppl, round(exp(-mls), 4) as ppl
            from agg""",
        "text_unigram_ppl": f"""
            with toks as ({_TOKS}),
            cnt as (select term, count(*) as c from toks group by term),
            tot as (select count(*) as n from toks),
            lp as (select doc_id, count(*) as nt,
                          avg(ln(c * 1.0 / tot.n)) as mlp
                   from toks join cnt using (term) cross join tot
                   group by doc_id)
            select doc_id, cast(nt as bigint) as n_tokens,
                   round(-mlp, 6) as log_ppl, round(exp(-mlp), 4) as ppl
            from lp""",
        "text_unigram_xppl": f"""
            with toks as ({_TOKS}),
            tr as (select term, count(*) as c from toks
                   where doc_id % 2 = 0 group by term),
            sz as (select sum(c) * 1.0 as n, count(*) * 1.0 as v from tr),
            sc as (select t.doc_id, count(*) as nt,
                          avg(ln(coalesce(tr.c + 1.0, 1.0) / (sz.n + sz.v)))
                              as mlp
                   from toks t left join tr using (term) cross join sz
                   where t.doc_id % 2 = 1
                   group by t.doc_id)
            select doc_id, cast(nt as bigint) as n_tokens,
                   round(-mlp, 6) as log_ppl, round(exp(-mlp), 4) as ppl
            from sc""",
        "sim_neardup_pairs": """
            with e as (select vec_id, embedding::DOUBLE[] as v
                       from embeddings where vec_id < 300),
            p as (
              select a.vec_id as id_a, b.vec_id as id_b,
                     round(list_dot_product(a.v, b.v)
                           / (sqrt(list_dot_product(a.v, a.v))
                              * sqrt(list_dot_product(b.v, b.v))), 6) as cos
              from e a join e b on a.vec_id < b.vec_id)
            select id_a, id_b, cos from p where cos >= 0.35""",
        "dedup_clusters": """
            with recursive
            e as (select vec_id, embedding::DOUBLE[] as v
                  from embeddings where vec_id < 300),
            p as (
              select a.vec_id as id_a, b.vec_id as id_b,
                     round(list_dot_product(a.v, b.v)
                           / (sqrt(list_dot_product(a.v, a.v))
                              * sqrt(list_dot_product(b.v, b.v))), 6) as cos
              from e a join e b on a.vec_id < b.vec_id),
            f as (select id_a, id_b from p where cos >= 0.35),
            ed as (select id_a as a, id_b as b from f
                   union select id_b, id_a from f),
            reach(id, r) as (
              select a, a from ed
              union
              select ed.a, reach.r from ed join reach on ed.b = reach.id)
            select id, min(r) as rep from reach group by id""",
        "dedup_keep_one": """
            with recursive
            e as (select vec_id, embedding::DOUBLE[] as v
                  from embeddings where vec_id < 300),
            p as (
              select a.vec_id as id_a, b.vec_id as id_b,
                     round(list_dot_product(a.v, b.v)
                           / (sqrt(list_dot_product(a.v, a.v))
                              * sqrt(list_dot_product(b.v, b.v))), 6) as cos
              from e a join e b on a.vec_id < b.vec_id),
            f as (select id_a, id_b from p where cos >= 0.35),
            ed as (select id_a as a, id_b as b from f
                   union select id_b, id_a from f),
            reach(id, r) as (
              select a, a from ed
              union
              select ed.a, reach.r from ed join reach on ed.b = reach.id),
            rep as (select id, min(r) as rep from reach group by id),
            victims as (select id from rep where id <> rep)
            select vec_id from e
            where vec_id not in (select id from victims)""",
        "text_token_count_bpe": """
            select doc_id,
                   cast(len(regexp_extract_all(text,
                     '[A-Za-zА-Яа-яЁё]+|[0-9]+|[^\\sA-Za-zА-Яа-яЁё0-9]')) as int)
                   as n_bpe_tokens
            from documents""",
        "events_sessionize": """
            with marked as (
              select user_id, event_id, ts, coalesce(value, 0.0) as value,
                case when lag(ts) over w is null
                       or epoch(ts) - epoch(lag(ts) over w) > 1800 then 1
                     else 0 end as is_new
              from events
              window w as (partition by user_id order by ts, event_id)),
            numbered as (
              select *, sum(is_new) over (partition by user_id
                                          order by ts, event_id) as sess
              from marked)
            select user_id, min(ts) as session_start, max(ts) as session_end,
                   cast(count(*) as bigint) as n_events,
                   round(sum(value), 6) as value_sum
            from numbered group by user_id, sess""",
        "events_type_rollup": """
            select event_type, cast(count(*) as bigint) as n,
                   round(sum(value), 6) as value_sum,
                   round(avg(value), 6) as value_avg
            from events group by event_type""",
        "text_lang_id": """
            with toks as (
              select doc_id, list_distinct(list_filter(
                string_split_regex(lower(text), '\\s+'), x -> x <> '')) as t
              from documents),
            hits as (
              select doc_id,
                len(list_intersect(t, ['der','die','und','das','ist'])) as de_h,
                len(list_intersect(t, ['the','and','of','to','is'])) as en_h,
                len(list_intersect(t, ['el','la','de','que','los'])) as es_h,
                len(list_intersect(t, ['le','la','et','les','des'])) as fr_h,
                len(list_intersect(t, ['и','в','на','не','что'])) as ru_h
              from toks)
            select doc_id,
              case
                when de_h >= en_h and de_h >= es_h and de_h >= fr_h and de_h >= ru_h then 'de'
                when en_h >= es_h and en_h >= fr_h and en_h >= ru_h then 'en'
                when es_h >= fr_h and es_h >= ru_h then 'es'
                when fr_h >= ru_h then 'fr'
                else 'ru'
              end as lang_pred,
              de_h + en_h + es_h + fr_h + ru_h as lang_hits
            from hits""",
        # Quantitative gates for the approximate operators (VERDICT r2 #1):
        # the oracle recomputes every SQL-expressible metric exactly and pins
        # each checked bound's expected outcome at 1.0 — a bound that fails
        # Spark-side emits 0.0 and the value-hash mismatches (driver FAIL).
        "dedup_minhash_lsh": f"""
            select 'n_truth_pairs_j08' as metric,
                   cast(cnt as double) as value
            from ({_jaccard_truth_sql(200, 0.8)})
            union all select 'recall_ok', 1.0
            union all select 'precision_ok', 1.0""",
        "dedup_simhash": f"""
            select 'n_truth_pairs_j05' as metric,
                   cast(cnt as double) as value
            from ({_jaccard_truth_sql(200, 0.5)})
            union all select 'separation_ok', 1.0""",
        "q_hybrid_ann": f"""
            select 'n_returned' as metric, cast({K} as double) as value
            union all select 'lex_ranks_match', 1.0
            union all select 'overlap_ok', 1.0""",
        "sim_lsh_topk": f"""
            select 'n_returned' as metric,
                   cast(least({K}, (select count(*) from embeddings)) as double)
                   as value
            union all select 'self_hit', 1.0
            union all select 'recall_ok', 1.0""",
        "sim_ivf_topk": f"""
            select 'n_returned' as metric,
                   cast(least({K}, (select count(*) from embeddings)) as double)
                   as value
            union all select 'self_hit', 1.0
            union all select 'recall_ok', 1.0""",
        "sim_semantic_dedup": """
            select 'pairs_subset_of_exact' as metric, 1.0 as value
            union all select 'partition_exact', 1.0
            union all select 'no_kept_neardup_pair', 1.0
            union all select 'recall_ok', 1.0""",
        "sim_ivfpq_topk": f"""
            select 'n_returned' as metric,
                   cast(least({K}, (select count(*) from embeddings)) as double)
                   as value
            union all select 'self_hit', 1.0
            union all select 'recall_ok', 1.0
            union all select 'scores_exact', 1.0""",
        "sim_opq_topk": f"""
            select 'n_returned' as metric,
                   cast(least({K}, (select count(*) from embeddings)) as double)
                   as value
            union all select 'self_hit', 1.0
            union all select 'recall_ok', 1.0
            union all select 'scores_exact', 1.0
            union all select 'rotation_orthogonal', 1.0
            union all select 'opq_no_worse', 1.0""",
        "sim_hard_negatives": """
            with e as (select vec_id, embedding::DOUBLE[] as v
                       from embeddings),
            anchors as (select * from (values (0), (7)) a(aid)),
            banned as (select * from (values (0, 0), (0, 1), (0, 2),
                                             (7, 7), (7, 3)) b(aid, vid)),
            cos as (
              select a.aid, e.vec_id,
                     round(list_dot_product(q.v, e.v)
                           / (sqrt(list_dot_product(q.v, q.v))
                              * sqrt(list_dot_product(e.v, e.v))), 6) as cos
              from anchors a join e q on q.vec_id = a.aid
              cross join e),
            kept as (select c.aid, c.vec_id, c.cos
                     from cos c left join banned b
                       on b.aid = c.aid and b.vid = c.vec_id
                     where b.aid is null),
            rk as (select aid, vec_id, cos,
                          row_number() over (partition by aid
                                             order by cos desc,
                                                      vec_id asc) as rank
                   from kept)
            select cast(aid as bigint) as anchor_id, vec_id,
                   cos, cast(rank as int) as rank
            from rk where rank <= 5""",
        "sim_lsh_neardup_pairs": """
            with e as (select vec_id, embedding::DOUBLE[] as v
                       from embeddings where vec_id < 300),
            p as (
              select a.vec_id as id_a, b.vec_id as id_b,
                     round(list_dot_product(a.v, b.v)
                           / (sqrt(list_dot_product(a.v, a.v))
                              * sqrt(list_dot_product(b.v, b.v))), 6) as cos
              from e a join e b on a.vec_id < b.vec_id)
            select 'n_exact_pairs' as metric,
                   cast(count(*) as double) as value from p where cos >= 0.35
            union all select 'subset_of_exact', 1.0
            union all select 'recall_ok', 1.0""",
        # Multimodal stubs are seeded-deterministic pure functions of n=48
        # (independent of sf), so the full value-hash oracle is a committed
        # expected table generated by an independent numpy recomputation
        # (tests/data/make_expected_multimodal.py).
        "pipeline_bpe_merges": """
            select * from read_parquet(
              '/root/repo/tests/data/expected_bpe_merges.parquet')""",
        "pipeline_split_corpus": f"""
            with h as (select doc_id,
                       ((doc_id % 1000000007) * 1103515245 + 12345)
                         % 2147483648 as hv
                       from documents)
            select doc_id,
                   case when hv < {int(0.8 * 2**31)} then 'train'
                        when hv < {int(0.9 * 2**31)} then 'val'
                        else 'test' end as split
            from h""",
        "multimodal_features": """
            select * from read_parquet(
              '/root/repo/tests/data/expected_multimodal_features.parquet')""",
        "multimodal_audio": """
            select * from read_parquet(
              '/root/repo/tests/data/expected_multimodal_audio.parquet')""",
        "multimodal_png": """
            select * from read_parquet(
              '/root/repo/tests/data/expected_multimodal_png.parquet')""",
        "multimodal_wav": """
            select * from read_parquet(
              '/root/repo/tests/data/expected_multimodal_wav.parquet')""",
    }
    # suffix-rank exact-substring dedup: contractually row-identical to
    # the windowed op at window == min_len → literally the same oracle
    d["text_sa_dedup"] = d["text_span_dedup"]
    # table-native percolation is contractually row-identical to the
    # dict path on the shared 5,000-query registry → same oracle
    d["q_percolate_table"] = d["q_percolate_scaled"]
    # MOSS match step: pair join wrapped around the SAME winnowing
    # selection SQL (threshold/df-cap mirror the entry's parameters)
    d["dedup_winnow_pairs"] = f"""
        with sel as ({d["text_winnowing"]}),
        capped as (select doc_id, fp from (
                     select doc_id, fp,
                            count(*) over (partition by fp) as fdf
                     from (select distinct doc_id, fp from sel))
                   where fdf <= 1000)
        select a.doc_id as id_a, b.doc_id as id_b,
               cast(count(*) as bigint) as shared
        from capped a join capped b
          on a.fp = b.fp and a.doc_id < b.doc_id
        group by 1, 2 having count(*) >= 10"""
    # auto-dispatch entry: the same parameterized registry SQL at
    # n=10,000 (== TABLE_TIER_MIN, the threshold that flips the tier)
    d["q_percolate_dispatch"] = d["q_percolate_scaled"].replace(
        f"range({N_PERC_SCALED})", f"range({N_PERC_DISPATCH})")
    return d
