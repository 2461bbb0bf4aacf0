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
    key = (sf_dir, "general")
    if key not in _INDEX_CACHE:
        from searchengine_spark.operators.indexer import build_index
        _INDEX_CACHE[key] = build_index(_docs_as_transcripts(spark, sf_dir), mode="general")
    return _INDEX_CACHE[key]


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
    if key not in _INDEX_CACHE:
        _INDEX_CACHE[key] = build_index(
            _docs_as_transcripts(spark, sf_dir), mode="general",
            with_positions=True)
    hits = phrase_search(_INDEX_CACHE[key], " ".join(BM25_Q), k=K)
    return hits.select(_orig_doc_id(), "n_matches")


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


def _q_near_topk(spark, sf_dir):
    """Two-term proximity query over the positional index: docs where
    'scan' and 'hash' occur within 4 positions, ranked by close-pair count."""
    from searchengine_spark.operators.indexer import build_index
    from searchengine_spark.operators.search import near_search
    key = (sf_dir, "positional")
    if key not in _INDEX_CACHE:
        _INDEX_CACHE[key] = build_index(
            _docs_as_transcripts(spark, sf_dir), mode="general",
            with_positions=True)
    hits = near_search(_INDEX_CACHE[key], "scan", "hash", max_dist=4, k=K)
    return hits.select(_orig_doc_id(), "n_pairs")


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


def _q_text_quality(spark, sf_dir):
    """Quality scoring: token/char counts, avg token length, punct/digit ratio."""
    from searchengine_spark.functions.text import quality_metrics
    return quality_metrics(_docs(spark, sf_dir))


def _q_text_fingerprint(spark, sf_dir):
    """Document fingerprinting: md5 of normalized text."""
    from searchengine_spark.functions.text import fingerprint
    return fingerprint(_docs(spark, sf_dir))


def _q_lang_id(spark, sf_dir):
    """Heuristic language ID via marker-stopword hits (argmax, ties by code)."""
    from searchengine_spark.functions.text import lang_id
    return lang_id(_docs(spark, sf_dir))


def _q_dedup_minhash(spark, sf_dir):
    """MinHash+LSH candidate pairs (not SQL-expressible → rows-only check)."""
    from searchengine_spark.functions.dedup import minhash_lsh_pairs
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    return minhash_lsh_pairs(d, n_hashes=32, bands=8)


def _q_dedup_simhash(spark, sf_dir):
    """SimHash signatures (not SQL-expressible → rows-only check)."""
    from searchengine_spark.functions.dedup import simhash
    return simhash(_docs(spark, sf_dir).filter(F.col("doc_id") < 200))


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
            build_lsh_index(emb, dim, path, n_planes=8)
        else:
            build_ivf_index(emb, dim, path, n_centroids=16, iters=2)
        _ANN_CACHE[key] = load_ann_index(spark, path)
    return _ANN_CACHE[key]


def _q_sim_lsh_topk(spark, sf_dir):
    """LSH ANN over the PERSISTED bucket-partitioned index (rows-only:
    approximate by construction)."""
    from searchengine_spark.functions.similarity import lsh_index_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    return lsh_index_topk(_ann_index_for(spark, sf_dir, "lsh"), qvec, k=K, multiprobe=1)


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


def _q_sim_lsh_neardup(spark, sf_dir):
    """LSH-bucketed near-dup pairs (scale path; rows-only — recall < 1)."""
    from searchengine_spark.functions.similarity import lsh_neardup_pairs
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(F.col("vec_id") < 300)
    dim = len(emb.select("embedding").first()["embedding"])
    return lsh_neardup_pairs(emb, dim, threshold=0.35, n_planes=4)


def _q_sim_ivf_topk(spark, sf_dir):
    """IVF ANN over the PERSISTED centroid-partitioned index (k-means with
    Lloyd steps at build; rows-only: approximate by construction)."""
    from searchengine_spark.functions.similarity import ivf_index_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    return ivf_index_topk(_ann_index_for(spark, sf_dir, "ivf"), qvec, k=K, n_probe=4)


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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "t2_t5_tokenize_tf": _q_tokenize_tf,
        "a1_term_df": _q_term_df,
        "q2_dictionary_lookup": _q_dictionary_lookup,
        "q3_high_df_prune": _q_high_df_prune,
        "q6_conjunctive_and": _q_conjunctive_and,
        "q7_ref_topk": _q_ref_topk,
        "q7_bm25_topk": _q_bm25_topk,
        "q9_metadata_projection": _q_metadata_projection,
        "q10_snippets": _q_snippets,
        "q11_bm25_page2": _q_bm25_page2,
        "q2_scoped_bm25_topk": _q_scoped_bm25_topk,
        "q2_scoped_ref_topk": _q_scoped_ref_topk,
        "q_phrase_topk": _q_phrase_topk,
        "q_near_topk": _q_near_topk,
        "q_batched_bm25": _q_batched_bm25,
        "s6_upsert_term_df": _q_upsert_term_df,
        "a3_statistics": _q_statistics,
        "a3_statistics_per_collection": _q_statistics_per_collection,
        "dedup_exact": _q_dedup_exact,
        "dedup_jaccard_pairs": _q_dedup_jaccard,
        "dedup_minhash_lsh": _q_dedup_minhash,
        "dedup_simhash": _q_dedup_simhash,
        "sim_cosine_topk": _q_sim_cosine_topk,
        "sim_lsh_topk": _q_sim_lsh_topk,
        "sim_ivf_topk": _q_sim_ivf_topk,
        "sim_neardup_pairs": _q_sim_neardup,
        "dedup_clusters": _q_dedup_clusters,
        "sim_lsh_neardup_pairs": _q_sim_lsh_neardup,
        "text_token_count_bpe": _q_token_count_bpe,
        "events_sessionize": _q_sessionize_events,
        "events_type_rollup": _q_event_type_rollup,
        "text_quality": _q_text_quality,
        "text_fingerprint": _q_text_fingerprint,
        "text_lang_id": _q_lang_id,
        "multimodal_features": _q_multimodal_features,
        "multimodal_audio": _q_multimodal_audio,
    }


# --------------------------------------------------------------------------
# oracle_sql(): DuckDB-equivalent SQL (same aliases, same rounding)
# --------------------------------------------------------------------------

_TOKS = ("select doc_id, unnest(list_filter(string_split_regex("
         "regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'), "
         "x -> x <> '')) as term from documents")

_TF = f"select doc_id, term, count(*) as tf from ({_TOKS}) group by doc_id, term"
_DF = f"select term, count(*) as df from ({_TF}) group by term"
_DL = f"select doc_id, count(*) as dl from ({_TOKS}) group by doc_id"


def _bm25_sql(terms: list[str], k: int, offset: int = 0, scope: str = "") -> str:
    """BM25 oracle; ``scope`` is an extra predicate on tf.doc_id (candidates
    scoped, idf/avgdl stay corpus-wide — the engine's filtered-search
    semantics for ``search(..., scope=)``)."""
    tl = ", ".join(f"'{t}'" for t in terms)
    sc = f" and {scope}" if scope else ""
    return f"""
with tf as ({_TF}), dfv as ({_DF}), dl as ({_DL}),
stats as (select count(*) as n, avg(dl) as avgdl from dl),
scored as (
  select tf.doc_id,
         sum( ln(1.0 + (stats.n - dfv.df + 0.5) / (dfv.df + 0.5))
              * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) as s
  from tf join dfv using (term) join dl using (doc_id) cross join stats
  where tf.term in ({tl}){sc}
  group by tf.doc_id)
select doc_id, round(s, 6) as score from scored
order by round(s, 9) desc, doc_id asc limit {k} offset {offset}
"""


def oracle_sql() -> dict[str, str]:
    and3 = ", ".join(f"'{t}'" for t in AND3)
    lookup = ", ".join(f"'{t}'" for t in sorted(set(AND3 + BM25_Q)))
    return {
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
        "q11_bm25_page2": _bm25_sql(BM25_Q, K, offset=K),
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
        "q_phrase_topk": f"""
            with arrs as (select doc_id, list_filter(string_split_regex(
                regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
                x -> x <> '') as arr from documents),
            tp as (select doc_id, unnest(arr) as term,
                   unnest(range(len(arr))) as pos from arrs),
            q as (select * from (values ('scan', 0), ('merge', 1)) as t(term, qidx)),
            al as (select tp.doc_id, tp.pos - q.qidx as base, q.qidx
                   from tp join q using (term)),
            b as (select doc_id, base from al group by doc_id, base
                  having count(distinct qidx) = 2),
            m as (select doc_id, cast(count(*) as bigint) as n_matches
                  from b group by doc_id)
            select doc_id, n_matches from m
            order by n_matches desc, doc_id asc limit {K}""",
        "q_batched_bm25": f"""
            with a as ({_bm25_sql(BM25_Q, K)}),
                 b as ({_bm25_sql(BATCH_Q2, K)})
            select 'qa' as query_id, doc_id, score from a
            union all
            select 'qb' as query_id, doc_id, score from b""",
        "q_near_topk": f"""
            with arrs as (select doc_id, list_filter(string_split_regex(
                regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
                x -> x <> '') as arr from documents),
            tp as (select doc_id, unnest(arr) as term,
                   unnest(range(len(arr))) as pos from arrs),
            a as (select doc_id, pos as pa from tp where term = 'scan'),
            b as (select doc_id, pos as pb from tp where term = 'hash'),
            p as (select distinct a.doc_id, pa, pb
                  from a join b using (doc_id) where abs(pa - pb) <= 4),
            m as (select doc_id, cast(count(*) as bigint) as n_pairs
                  from p group by doc_id)
            select doc_id, n_pairs from m
            order by n_pairs desc, doc_id asc limit {K}""",
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
        # dedup_minhash_lsh / dedup_simhash / sim_lsh_topk / multimodal_features:
        # custom hash/LSH/binary ops — not SQL-expressible → rows-only checks.
    }
