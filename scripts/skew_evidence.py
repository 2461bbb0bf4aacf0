"""Adversarial-skew evidence (VERDICT r4 #5): one sf1.0-scale index build
over a fixture with a deliberately ULTRA-HOT term (appended to every turn,
df == n_turns) — the worst case for the A1 term aggregation — reporting:

- per-TASK time balance of the heaviest build stages (Spark status REST
  API: max/median task duration per stage). The salted doc-range bucketing
  (operators/indexer.py M5) is what keeps the hot term from funnelling
  through one reducer; the acceptance bar is max/median <= 1.5 on every
  heavy stage.
- per-BUCKET postings/payload balance from the manifest lineage
  (plans/manifest.record_postings_metrics). NOTE the two axes measure
  different things: task time covers the salted BUILD shuffle; the
  term_id%16 save-bucket histogram shows the hot term's storage footprint
  (all its blocks share one term_id, hence one save bucket — by design;
  within a bucket the rows are many independent parquet row groups, so
  serving scans still parallelize).

Usage: python scripts/skew_evidence.py [sf] [cpus] [nohot]  (default 1.0 32)
``nohot`` builds the SAME corpus without the hot term — the control run
that separates data skew (persists in the hot run only) from host
scheduling tail (shows up in both; this box runs 32 threads on ~19
effective SMT cores, so local[32] runs carry a capacity tail that has
nothing to do with keys).
Prints one JSON line: {"n_turns", "build_s", "turns_per_sec", stage rows,
bucket balance, "max_med_task_ratio"}.
"""

from __future__ import annotations

import json
import os
import sys
import statistics
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    hot = "nohot" not in sys.argv[3:]

    from pyspark.sql import functions as F

    from searchengine_spark.operators.indexer import build_index
    from searchengine_spark.plans.manifest import record_postings_metrics
    from searchengine_spark.plans.session import get_spark
    from searchengine_spark.sources.fixtures import (conv_lengths,
                                                     transcripts_df_dist)

    spark = get_spark("skew-evidence", master=f"local[{cpus}]",
                      shuffle_partitions=max(2 * cpus, 64),
                      extra_conf={  # status REST API is the task-balance probe
                          "spark.ui.enabled": "true",
                          "spark.ui.retainedStages": "2000",
                          "spark.ui.retainedTasks": "200000"})
    sc = spark.sparkContext
    n_conv = max(200, int(120_000 * sf))
    n_turns = int(conv_lengths(n_conv).sum())

    # stage the hot-term corpus (untimed): every turn carries the same
    # token -> df(hotterm) == n_turns, the adversarial Zipf-head case
    suffix = "hot" if hot else "plain"
    path = f"/tmp/searchengine_skew/transcripts_sf{sf}_{suffix}"
    marker = os.path.join(path, "_staged.json")
    if not os.path.exists(marker):
        df = transcripts_df_dist(spark, n_conv, partitions=cpus * 2)
        if hot:
            df = df.withColumn(
                "text", F.concat_ws(" ", "text", F.lit("hotterm")))
        df.write.mode("overwrite").parquet(path)
        with open(marker, "w") as f:
            json.dump({"n_conv": n_conv, "n_turns": n_turns}, f)
    transcripts = spark.read.parquet(path)

    t0 = time.time()
    index = build_index(transcripts, mode="general")
    index["postings"].count()
    index["terms"].count()
    build_s = time.time() - t0

    # hot term really is ultra-hot (hot runs only)
    hot_df = None
    if hot:
        hot_df = index["terms"].filter(F.col("term") == "hotterm") \
            .select("df").collect()[0]["df"]
        assert hot_df == n_turns, (hot_df, n_turns)

    # per-task balance of the heavy stages via the status REST API
    app_id = sc.applicationId
    base = f"{sc.uiWebUrl}/api/v1/applications/{app_id}/stages"
    with urllib.request.urlopen(base + "?status=complete") as r:
        stages = json.load(r)
    heavy = sorted(stages, key=lambda s: -(s.get("executorRunTime") or 0))[:5]
    stage_rows, worst = [], 0.0
    for st in heavy:
        sid, att = st["stageId"], st["attemptId"]
        with urllib.request.urlopen(
                f"{base}/{sid}/{att}/taskList?length=5000") as r:
            tasks = json.load(r)
        durs = sorted(t["duration"] for t in tasks
                      if t.get("duration") is not None)
        if len(durs) < 4:
            continue  # driver-ish stages carry no balance signal
        med = statistics.median(durs)
        ratio = round(durs[-1] / med, 3) if med else None
        worst = max(worst, ratio or 0.0)
        stage_rows.append({
            "stage": sid, "name": st["name"].split("\n")[0][:60],
            "tasks": len(durs), "task_ms_median": round(med, 1),
            "task_ms_max": durs[-1], "max_med_ratio": ratio})

    # per-bucket postings balance from the manifest lineage
    mdir = f"/tmp/searchengine_skew/metrics_sf{sf}_{suffix}"
    totals = record_postings_metrics(index, mdir, elapsed_s=build_s)
    buckets = [json.loads(line) for line in
               open(os.path.join(mdir, "postings_metrics.jsonl"))
               if json.loads(line)["kind"] == "bucket"]
    pcounts = sorted(b["postings"] for b in buckets)
    bucket_ratio = round(pcounts[-1] / statistics.median(pcounts), 3)

    print(json.dumps({
        "sf": sf, "cpus": cpus, "hot": hot, "n_turns": n_turns,
        "hot_term_df": hot_df, "build_s": round(build_s, 1),
        "turns_per_sec": round(n_turns / build_s, 1),
        "postings_per_sec": totals["postings_per_sec"],
        "bytes_per_posting": totals["bytes_per_posting"],
        "max_med_task_ratio": round(worst, 3),
        "stages": stage_rows,
        "save_bucket_max_med_postings_ratio": bucket_ratio,
    }))


if __name__ == "__main__":
    main()
