"""Scaling-efficiency evidence: identical index-build job at N and 4N cores.

The north rule requires ≥0.8 throughput scaling efficiency between N and 4N
executors; this sandbox has no cluster, so (per the driver instruction) we
run the SAME job on the SAME staged input at local[8] and local[32] — each in
a fresh JVM subprocess so no cache/JIT leaks between runs — and report
throughput at both plus efficiency = (turns_per_sec_4N / turns_per_sec_N) / 4.

Usage: python bench_scaling.py [sf] [N]   (default sf=0.1, N=8 → compares
local[N] vs local[4N])

Pick N so 4N ≤ the PHYSICAL core count: this box advertises 32 vCPUs but
has ~19 effective cores (SMT), so local[32] is hardware-capped at ~2.4×
local[8] (max possible efficiency ≈ 0.6 regardless of software). N=2 → 8
keeps both runs inside real cores and measures the engine, not the SMT
ceiling.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from searchengine_spark.plans.session import get_spark
from searchengine_spark.operators.indexer import build_index
# shuffle_partitions is FIXED across both runs: the partition count is part
# of the job (data layout), the core count is the variable. Letting it track
# cpus made the small run do less total per-task work and skewed the ratio.
spark = get_spark("scaling", master="local[{cpus}]", shuffle_partitions={parts})
transcripts = spark.read.parquet({tpath!r})
t0 = time.time()
index = build_index(transcripts, mode="general")
index["postings"].count()
index["terms"].count()
elapsed = time.time() - t0
print("RESULT " + json.dumps({{"cpus": {cpus}, "elapsed_s": elapsed}}))
"""


def run_at(cpus: int, tpath: str, parts: int = 64) -> float:
    repo = os.path.dirname(os.path.abspath(__file__))
    code = CHILD.format(repo=repo, cpus=cpus, tpath=tpath, parts=parts)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])["elapsed_s"]
    raise RuntimeError(f"child failed (cpus={cpus}):\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main():
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    # stage once (shared input for both runs)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from searchengine_spark.plans.session import get_spark
    import bench
    spark = get_spark("stage", master="local[32]", shuffle_partitions=32)
    tpath, n_turns = bench._stage_transcripts(spark, sf, 32)
    spark.stop()

    t_n = run_at(n, tpath)
    t_4n = run_at(4 * n, tpath)
    thr_n = n_turns / t_n
    thr_4n = n_turns / t_4n
    eff = (thr_4n / thr_n) / 4.0
    result = {
        "metric": "scaling_efficiency_N_to_4N", "unit": "ratio",
        "sf": sf, "n_turns": n_turns, "n_cores": n,
        f"local{n}_elapsed_s": round(t_n, 2),
        f"local{n}_turns_per_sec": round(thr_n, 1),
        f"local{4*n}_elapsed_s": round(t_4n, 2),
        f"local{4*n}_turns_per_sec": round(thr_4n, 1),
        "value": round(eff, 3),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
