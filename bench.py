"""Bench harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Sections:
- engine: deterministic synthetic transcripts (scaled to sf) → inverted-index
  build wall + turns/sec, then per-query top-k latency (bm25 pruned/exhaustive
  + ref_compat) on the materialized index.
- table ops: the driver-contract operators over the sf-dir documents /
  embeddings tables (tokenize/df/dedup/cosine/quality).

Corpus generation + parquet staging are excluded from timed sections.
Run `python bench_scaling.py` for the N-vs-4N scaling-efficiency evidence.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

SEARCH_QUERIES = {
    "search_bm25_rare": ("лесом", "bm25", "auto"),
    "search_bm25_hot": ("ошибку", "bm25", True),  # force WAND phase-1 path
    "search_bm25_hot_exhaustive": ("ошибку", "bm25", False),
    "search_bm25_mixed": ("timeout лес merge", "bm25", "auto"),
    "search_ref_and2": ("лес дом", "ref_compat", "auto"),
    "search_ref_and3": ("запрос индекс система", "ref_compat", "auto"),
}


def _stage_transcripts(spark, sf: float, cpus: int) -> tuple[str, int]:
    from searchengine_spark.sources.fixtures import conv_lengths, transcripts_df_dist
    n_conv = max(200, int(120_000 * sf))
    path = f"/tmp/searchengine_bench/transcripts_sf{sf}"
    marker = os.path.join(path, "_staged.json")
    if os.path.exists(marker):
        with open(marker) as f:
            return path, json.load(f)["n_turns"]
    df = transcripts_df_dist(spark, n_conv, partitions=cpus * 2)
    df.write.mode("overwrite").parquet(path)
    n_turns = int(conv_lengths(n_conv).sum())
    with open(marker, "w") as f:
        json.dump({"n_conv": n_conv, "n_turns": n_turns}, f)
    return path, n_turns


def run(sf_dir: str, cpus: int, include_build: bool = True) -> dict:
    from searchengine_spark.plans.session import get_spark
    from searchengine_spark.operators.indexer import build_index
    from searchengine_spark.operators.search import search

    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    # 2× cpus shuffle partitions: the encode/applyInPandas stages need more
    # tasks than cores to balance (measured ~5× on the sf1.0 build); AQE
    # coalesces the small stages back down.
    spark = get_spark("bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(2 * cpus, 64))
    queries: dict[str, float] = {}
    extras: dict = {}

    # --- engine: index build throughput -----------------------------------
    tpath, n_turns = _stage_transcripts(spark, sf, cpus)
    transcripts = spark.read.parquet(tpath)
    t0 = time.time()
    index = build_index(transcripts, mode="general")
    index["postings"].count()
    index["terms"].count()
    build_s = time.time() - t0
    queries["index_build"] = round(build_s, 3)
    extras["index_build_turns_per_sec"] = round(n_turns / build_s, 1)
    extras["n_turns"] = n_turns

    # --- engine: query latency ---------------------------------------------
    # Cold pass once (first-touch includes cache population), then a
    # median-of-N warm protocol (VERDICT r2 #2: single-shot timings made
    # driver runs variance-dominated — medians + IQR make them robust).
    warm_reps = int(os.environ.get("SPARK_GRAFT_WARM_REPS", "5"))
    lat_cold = []
    warm_median: dict[str, float] = {}
    warm_iqr: dict[str, float] = {}
    for name, (q, mode, prune) in SEARCH_QUERIES.items():
        t0 = time.time()
        search(index, q, k=10, mode=mode, prune_blocks=prune).collect()
        dt = time.time() - t0
        queries[name] = round(dt, 3)
        lat_cold.append(dt)
    for name, (q, mode, prune) in SEARCH_QUERIES.items():
        reps = []
        for _ in range(warm_reps):
            t0 = time.time()
            search(index, q, k=10, mode=mode, prune_blocks=prune).collect()
            reps.append(time.time() - t0)
        reps.sort()
        warm_median[name] = round(reps[len(reps) // 2], 3)
        warm_iqr[name] = round(reps[(3 * len(reps)) // 4] - reps[len(reps) // 4], 3)
    # driver-side hot tier (operators/hot.py): populate once (one decode
    # job per term + winner-metadata fill), then repeats answer with ZERO
    # Spark jobs — median of warm_reps, parity pinned by tests/test_hot.py
    from searchengine_spark.operators.hot import hot_search
    hot_q = "ошибку"
    hot_search(index, hot_q, k=10)  # cold populate (not timed here)
    hot_reps = []
    for _ in range(warm_reps):
        t0 = time.time()
        hot_search(index, hot_q, k=10)
        hot_reps.append(time.time() - t0)
    hot_reps.sort()
    queries["search_bm25_hot_cached"] = round(hot_reps[len(hot_reps) // 2], 4)
    lat_cold.sort()
    warm_meds = sorted(warm_median.values())
    extras["search_p50_sec"] = round(lat_cold[len(lat_cold) // 2], 3)
    extras["search_p50_warm_sec"] = round(warm_meds[len(warm_meds) // 2], 3)
    extras["search_warm_median"] = warm_median
    extras["search_warm_iqr"] = warm_iqr
    extras["search_warm_reps"] = warm_reps

    # --- serving throughput (QPS) — VERDICT r4 #4 --------------------------
    # A 100 TB serving story is throughput-bound, not single-query-latency
    # bound. Two tiers:
    # (a) search_many: 64 distinct queries scored in ONE Spark job (block
    #     scans union, per-query window rank) — the distributed batch tier.
    # (b) hot_search_many: a Zipf-ish 256-request log over 8 hot queries
    #     answered driver-side from the per-term cache — the front tier.
    from searchengine_spark.operators.search import search_many
    terms = [r["term"] for r in index["terms"]
             .orderBy(F.desc("df"), "term").limit(40).collect()]
    nt_ = len(terms)
    qlog = {f"s{i:03d}": f"{terms[i % nt_]} {terms[(i * 7 + 3) % nt_]}"
            for i in range(64)}
    batch_walls = []
    for _ in range(3):
        t0 = time.time()
        search_many(index, qlog, k=10).collect()
        batch_walls.append(time.time() - t0)
    batch_walls.sort()
    bw = batch_walls[len(batch_walls) // 2]
    queries["serving_batched_64"] = round(bw, 3)
    extras["serving_qps_batched_64"] = round(64 / bw, 1)
    hot_mix = [terms[[0, 1, 0, 2, 0, 1, 3, 0][i % 8]] for i in range(256)]
    for q in set(hot_mix):
        hot_search(index, q, k=10)  # populate (first-touch, untimed)
    hot_lat = []
    t0 = time.time()
    for q in hot_mix:
        t1 = time.time()
        hot_search(index, q, k=10)
        hot_lat.append(time.time() - t1)
    hot_wall = time.time() - t0
    hot_lat.sort()
    extras["serving_qps_hot"] = round(256 / hot_wall, 1)
    extras["serving_hot_p50_ms"] = round(
        hot_lat[len(hot_lat) // 2] * 1000, 2)
    extras["serving_hot_p95_ms"] = round(
        hot_lat[(95 * len(hot_lat)) // 100] * 1000, 2)
    queries["serving_hot_mix_256"] = round(hot_wall, 3)

    # --- maintenance ops on the main index --------------------------------
    # upsert → compact: the LSM maintenance path. Compaction rewrites every
    # block from the index itself (no re-analysis), so its wall vs
    # index_build is the measured cost of restoring exact bounds + dense
    # ids. Shard builds → merge: the per-shard build pattern; merge is a
    # metadata-only shift (no block decode), timed apart from the builds.
    from searchengine_spark.operators.compact import (
        compact_index, merge_indexes)
    from searchengine_spark.operators.upsert import upsert_turns
    delta = spark.createDataFrame(
        [("zzzz_bench_upsert", 0, "user", "ошибка merge timeout индекс",
          None, "2026-02-01 00:00:00")],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string").withColumn(
            "ts", F.col("ts").cast("timestamp"))
    t0 = time.time()
    up = upsert_turns(index, delta)
    up["postings"].count()
    queries["maint_upsert"] = round(time.time() - t0, 3)
    t0 = time.time()
    comp = compact_index(up, reassign_ids=True)
    comp["postings"].count()
    compact_s = time.time() - t0
    queries["maint_compact"] = round(compact_s, 3)
    extras["compact_turns_per_sec"] = round(n_turns / compact_s, 1)
    t0 = time.time()
    cut = f"conv{max(200, int(120_000 * sf)) // 2:06d}"  # fixtures' n_conv
    half_a = transcripts.filter(F.col("conv_id") < cut)
    half_b = transcripts.filter(F.col("conv_id") >= cut)
    ia = build_index(half_a, mode="general")
    ia["postings"].count(); ia["terms"].count()
    ib = build_index(half_b, mode="general")
    ib["postings"].count(); ib["terms"].count()
    queries["shard_index_builds"] = round(time.time() - t0, 3)
    t0 = time.time()
    merged = merge_indexes(ia, ib, check_disjoint=False)  # disjoint by construction
    merged["postings"].count()
    queries["maint_merge"] = round(time.time() - t0, 3)
    # scatter-gather serving over the two shards IN PLACE (no merge):
    # per-shard search under global stats + bounded rank merge
    from searchengine_spark.operators.sharded import search_sharded
    t0 = time.time()
    search_sharded([ia, ib], "ошибка файл", k=10).collect()
    queries["q_sharded_topk"] = round(time.time() - t0, 3)
    # drop the maintenance indexes' references: their eager-checkpointed
    # blocks (4+ full index copies) otherwise stay cached and pressure the
    # sections below (ContextCleaner frees the RDD blocks after GC)
    del up, comp, ia, ib, merged
    import gc
    gc.collect()

    # --- table ops over the sf-dir corpus ---------------------------------
    import __spark_entry__ as E
    # bench measures true build cost: bypass the persisted side-index cache
    # so every *_index_build line times a real build, never a parquet load
    E._SIDECACHE_OFF = True
    # the documents-corpus index build is a one-time cost — time it apart so
    # q7 measures query latency, not lazy cache population
    t0 = time.time()
    docs_idx = E._index_for(spark, sf_dir)
    docs_idx["postings"].count(); docs_idx["terms"].count()
    queries["docs_index_build"] = round(time.time() - t0, 3)
    # positional index build timed apart (phrase query then measures latency)
    from searchengine_spark.operators.indexer import build_index as _bi
    t0 = time.time()
    pkey = (sf_dir, "positional")
    E._INDEX_CACHE[pkey] = _bi(E._docs_as_transcripts(spark, sf_dir),
                               mode="general", with_positions=True)
    E._INDEX_CACHE[pkey]["postings"].count()
    E._INDEX_CACHE[pkey]["terms"].count()
    queries["phrase_index_build"] = round(time.time() - t0, 3)
    # fielded (BM25F) index build timed apart, query latency measured after
    t0 = time.time()
    fkey = (sf_dir, "fielded")
    from searchengine_spark.operators.fielded import build_fielded_index
    E._INDEX_CACHE[fkey] = build_fielded_index(
        E._docs_as_transcripts(spark, sf_dir), mode="general")
    queries["fielded_index_build"] = round(time.time() - t0, 3)
    t0 = time.time()
    ckey = (sf_dir, "collapse")
    E._INDEX_CACHE[ckey] = build_index(
        E._docs_as_grouped_transcripts(spark, sf_dir), mode="general")
    queries["grouped_index_build"] = round(time.time() - t0, 3)
    # en_simple + passage side indexes timed apart (VERDICT r3 #1: their
    # first-touch cost used to land inside q_bm25_en_topk / q_passage_topk,
    # conflating one-time builds with query latency)
    t0 = time.time()
    en_idx = E._en_index_for(spark, sf_dir)
    en_idx["postings"].count(); en_idx["terms"].count()
    queries["en_index_build"] = round(time.time() - t0, 3)
    t0 = time.time()
    p_idx = E._passage_index_for(spark, sf_dir)
    p_idx["postings"].count(); p_idx["terms"].count()
    queries["passage_index_build"] = round(time.time() - t0, 3)
    # Porter side index timed apart too (VERDICT r4 #3: its first-touch
    # build landed inside q_bm25_porter_topk — 3.32 s reported vs the
    # 0.35 s en_simple twin)
    t0 = time.time()
    por_idx = E._porter_index_for(spark, sf_dir)
    por_idx["postings"].count(); por_idx["terms"].count()
    queries["porter_index_build"] = round(time.time() - t0, 3)
    # 100k-query percolation registry: generation is staging (untimed),
    # the one-time distributed compile gets its own line (the analog of
    # the *_index_build lines — it IS the alerting tier's index build)
    from searchengine_spark.operators.percolate import compile_query_table
    _pbase = E._perc_scaled_registry(spark, sf_dir)
    _pvq = list(_pbase.values())
    _perc_queries = {f"q{i:06d}": _pvq[i % len(_pvq)]
                     for i in range(100_000)}
    _perc_batch = E._docs_as_transcripts(spark, sf_dir).filter(
        F.substring("conv_id", 4, 8).cast("long") < 200)
    _perc_qdf = spark.createDataFrame(sorted(_perc_queries.items()),
                                      "query_id string, query string")
    t0 = time.time()
    _perc_req = compile_query_table(_perc_qdf).localCheckpoint(eager=True)
    queries["percolate_100k_compile"] = round(time.time() - t0, 3)
    table_ops = ["t2_t5_tokenize_tf", "a1_term_df", "q6_conjunctive_and",
                 "q_bm25f_topk", "q_bm25f_scoped", "q_bm25f_not",
                 "q_batched_bm25f", "q_batched_scoped",
                 "q7_bm25_topk", "q_hot_cached_topk", "q_hot_ref_topk", "q_bm25_not_topk", "q_batched_not",
                 "q_search_after", "q_sort_recent", "q_count", "q_boost_recent",
                 "q_facets", "q_top_hits", "q_facets_multi", "q_facets_metrics",
                 "q2_scoped_bm25_topk", "q_phrase_topk",
                 "q_batched_phrase", "q_querylang", "q_batched_querylang",
                 "q_querylang_wildcard", "q_suggest", "q_more_like_this", "q_did_you_mean",
                 "q_span_topk", "q_percolate", "q_percolate_scored", "q_percolate_scaled", "q_percolate_table",
                 "q_percolate_100k", "q_percolate_100k_match",
                 "q_collapse_topk", "q_grouped_topk",
                 "text_pii_scrub", "text_clean_lines", "text_repetition",
                 "text_chunks", "text_gopher", "text_unigram_ppl",
                 "text_ngram_counts", "text_collocations", "text_hot_lines",
                 "q_select_all", "q_querylang_select", "a6_doc_term_weights",
                 "a3_statistics_per_collection",
                 "dedup_exact", "dedup_minhash_lsh",
                 "dedup_contamination", "dedup_cross_corpus",
                 "pipeline_stratified_sample", "pipeline_token_budget_mix",
                 "pipeline_temperature_mix", "sim_hard_negatives",
                 "pipeline_bpe_merges", "pipeline_split_corpus",
                 "pipeline_pack_sequences", "pipeline_encode_ids",
                 "pipeline_pack_token_ids", "text_nb_classify",
                 "corpus_profile", "q_passage_topk", "q_batched_passage",
                 "q_bm25_en_topk", "q_bm25_porter_topk",
                 "q_eval_retrieval", "text_span_dedup", "text_sa_dedup",
                 "text_winnowing", "dedup_winnow_pairs",
                 "q_bm25_tuned", "q_trigram_infix", "text_cnb_classify",
                 "q_bool_search", "q_batched_bool", "text_bigram_ppl",
                 "q_term_boost", "q_prf_topk", "q_significant_bigrams", "q_multi_fusion",
                 "sim_cosine_topk", "sim_mmr_topk", "q_hybrid_rrf", "q_hybrid_batched", "text_quality", "text_lang_id",
                 "events_sessionize", "text_token_count_bpe", "sim_neardup_pairs",
                 "multimodal_png", "multimodal_wav",
                 "sim_semantic_dedup"]
    qmap = E.queries()

    # dedup_minhash_lsh's driver entry is now a QUANTITATIVE GATE (candidate
    # pairs + two exact-Jaccard ground truths + verification joins) — for
    # latency, time the raw operator the gate wraps, not the verification.
    def _minhash_op(spark_, sf_dir_):
        from searchengine_spark.functions.dedup import minhash_lsh_pairs
        d = E._docs(spark_, sf_dir_).filter(F.col("doc_id") < 200)
        return minhash_lsh_pairs(d, n_hashes=32, bands=8)

    # sim_semantic_dedup's entry is likewise a gate (exact all-pairs
    # verification); time the raw cluster→pairs→components→keep pipeline
    # at the operator's own √n cluster default (the 100 TB-shaped config —
    # n_clusters=4 at sf0.1 was near-all-pairs, VERDICT r3 #2)
    def _semdedup_op(spark_, sf_dir_):
        from searchengine_spark.functions.similarity import semantic_dedup
        emb = spark_.read.parquet(f"{sf_dir_}/embeddings.parquet")
        return semantic_dedup(emb, 64, threshold=0.35)["kept"]

    # percolation at the 100k-registry alerting tier (VERDICT r4 #2):
    # percolate() auto-dispatches to the table-native tier above
    # TABLE_TIER_MIN — distributed compile, join-only kernels, plan and
    # driver state O(1) in |registry|
    def _percolate_100k_op(spark_, sf_dir_):
        # full path: driver registry dict → auto-dispatch → distributed
        # compile → join kernels (first-touch cost of a fresh registry)
        from searchengine_spark.operators.percolate import percolate
        out = percolate(_perc_queries, _perc_batch)
        return out.groupBy("query_id").agg(F.count("*").alias("n"))

    def _percolate_100k_match_op(spark_, sf_dir_):
        # steady-state: registry compiled ONCE (timed above as
        # percolate_100k_compile — what a streaming alerting deployment
        # amortizes across micro-batches) → per-batch match cost only
        from searchengine_spark.operators.percolate import percolate_table
        out = percolate_table(_perc_qdf.limit(0), _perc_batch,
                              compiled=_perc_req)
        return out.groupBy("query_id").agg(F.count("*").alias("n"))

    bench_fns = dict(qmap)
    bench_fns["dedup_minhash_lsh"] = _minhash_op
    bench_fns["sim_semantic_dedup"] = _semdedup_op
    bench_fns["q_percolate_100k"] = _percolate_100k_op
    bench_fns["q_percolate_100k_match"] = _percolate_100k_match_op
    for name in table_ops:
        t0 = time.time()
        df = bench_fns[name](spark, sf_dir)
        df.count() if name not in ("q7_bm25_topk", "q_bm25_not_topk",
                                   "sim_cosine_topk",
                                   "q2_scoped_bm25_topk", "q_phrase_topk") else df.collect()
        queries[name] = round(time.time() - t0, 3)

    total = round(sum(queries.values()), 3)
    return {"metric": "headline_suite_wall_seconds", "value": total, "unit": "sec",
            "queries": queries, "sf": sf, **extras}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    print(json.dumps(run(sf_dir, cpus)))


if __name__ == "__main__":
    main()
