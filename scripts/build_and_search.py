"""Cluster entry point: build (or load) an index and serve queries.

Ships via spark-submit with the engine zipped as --py-files — no repo
checkout needed on the executors:

    scripts/make_pyfiles.sh
    spark-submit --master <cluster> \
        --py-files dist/searchengine_spark.zip \
        scripts/build_and_search.py \
        --input /path/to/transcripts_parquet \
        --index-out /path/to/index \
        --query "первый запрос" --query "timeout merge"

Prints one JSON line of build metrics + per-query latency (the same shape
bench.py emits). On a real cluster, swap --master and point --input at the
Iceberg/parquet table; nothing else changes.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="transcripts parquet path")
    ap.add_argument("--index-out", default=None, help="save the index here")
    ap.add_argument("--mode", default="general", choices=["general", "ref_compat"])
    ap.add_argument("--query", action="append", default=[], help="repeatable")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--staged", default=None,
                    help="checkpoint dir: resumable 2-stage build via the manifest")
    ap.add_argument("--n-parts", type=int, default=8)
    args = ap.parse_args()

    import os
    builder = SparkSession.builder.appName("searchengine-build")
    # honored only when this process launches its own JVM (plain `python
    # scripts/build_and_search.py` locally); under real spark-submit the
    # driver JVM already exists and --driver-memory governs instead
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    builder = builder.config("spark.driver.memory", mem)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from searchengine_spark.operators.indexer import build_index
    from searchengine_spark.operators.search import search
    from searchengine_spark.plans.manifest import (
        finalize_index, record_postings_metrics, save_index,
        stage_partitions)

    transcripts = spark.read.parquet(args.input)
    t0 = time.time()
    if args.staged:
        stage_partitions(transcripts, args.staged, n_parts=args.n_parts, mode=args.mode)
        index = finalize_index(spark, args.staged, mode=args.mode)
    else:
        index = build_index(transcripts, mode=args.mode)
    index["postings"].count()
    index["terms"].count()
    build_s = time.time() - t0
    n_turns = index["stats"]["n_docs"]

    out: dict = {
        "metric": "spark_submit_build",
        "build_wall_s": round(build_s, 2),
        "n_turns": n_turns,
        "turns_per_sec": round(n_turns / build_s, 1),
        "total_tokens": index["stats"]["total_tokens"],
        "queries": {},
    }
    if args.staged or args.index_out:
        # per-bucket postings lineage (postings/sec, compressed bytes)
        # beside the staging manifest's per-partition docs/sec rows
        mpath = args.staged or args.index_out
        out["postings_metrics"] = record_postings_metrics(
            index, mpath, elapsed_s=build_s)
    if args.index_out:
        t0 = time.time()
        save_index(index, args.index_out)
        out["save_wall_s"] = round(time.time() - t0, 2)

    for q in args.query:
        t0 = time.time()
        hits = search(index, q, k=args.k, mode="bm25" if args.mode == "general" else "ref_compat")
        n = len(hits.collect())
        out["queries"][q] = {"latency_s": round(time.time() - t0, 3), "hits": n}

    print(json.dumps(out, ensure_ascii=False))
    spark.stop()


if __name__ == "__main__":
    main()
