"""Streaming ingestion dedup guard: exact content dedup ACROSS micro-batches.

The batch exact-dedup operator (functions/dedup.py dedup_exact) answers
"dedupe this corpus"; an ingestion pipeline needs the streaming twin —
"drop every incoming doc whose content was already ingested, ever" — the
guard that sits in front of an index or training-data sink. No reference
analog (the reference's only dedup is the crawl frontier's visited-URL
set, reference: dto/indexing/SiteIndexer.java:23,38 — a URL identity
check, not content dedup).

Spark-first shape: readStream → foreachBatch; each micro-batch

  1. fingerprints its rows (md5 of whitespace-normalized lowercased text —
     the SAME fingerprint the batch dedup family uses, so batch and stream
     agree on what "duplicate" means),
  2. keeps first-seen WITHIN the batch (min (conv_id, turn_idx) per fp),
  3. anti-joins the accumulated fingerprint STATE (everything ingested by
     previous batches),
  4. appends the survivors to the output and their fingerprints to the
     state — both under batch-keyed directory names written with
     mode("overwrite"), so a replayed batch rewrites its own files instead
     of duplicating them.

Exactly-once: the commit pointer records the last applied batch_id
(the stream_index protocol); replays of committed batches no-op, and the
state read EXCLUDES the in-flight batch's own directory so a crashed-
then-replayed batch never anti-joins against its own half-written
fingerprints. State is fingerprints only (16 bytes/doc) — at 10^12 docs
that is a parquet table joined by a uniform hash key, shuffle-free on the
batch side when broadcastable and skew-free by construction otherwise.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from searchengine_spark.streaming.stream_index import TURN_SCHEMA

KEY = ["conv_id", "turn_idx"]


def _fp(text_col: str):
    return F.md5(F.trim(F.regexp_replace(F.lower(F.col(text_col)),
                                         r"\s+", " ")))


def _read_ptr(out_root: str) -> dict:
    from searchengine_spark.plans.manifest import read_pointer
    return read_pointer(out_root)


def _state_dirs(out_root: str, exclude_batch: int) -> list[str]:
    fps = os.path.join(out_root, "fps")
    if not os.path.isdir(fps):
        return []
    return sorted(
        os.path.join(fps, d) for d in os.listdir(fps)
        if d.startswith("batch_") and int(d.split("_")[1]) != exclude_batch)


def dedup_stream_batch(out_root: str, text_col: str = "text"):
    """foreachBatch callback: first-seen-wins content dedup against all
    previously ingested batches; idempotent on replayed batch ids."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        ptr = _read_ptr(out_root)
        last = ptr.get("batch_id")
        if last is not None and batch_id <= last:
            return  # checkpoint replay of an already-committed batch
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        fp = batch_df.withColumn("fp", _fp(text_col))
        # within-batch keep-first: fp-partitioned window (partitions are
        # duplicate-group-sized, never corpus-sized)
        w = Window.partitionBy("fp").orderBy(*[F.col(c) for c in KEY])
        firsts = (fp.withColumn("_r", F.row_number().over(w))
                  .filter(F.col("_r") == 1).drop("_r"))
        dirs = _state_dirs(out_root, exclude_batch=batch_id)
        if dirs:
            state = spark.read.parquet(*dirs).select("fp").distinct()
            firsts = firsts.join(state, "fp", "left_anti")
        firsts = firsts.localCheckpoint(eager=True)  # one computation, two writes
        tag = f"batch_{batch_id:08d}"
        (firsts.select("fp")
         .write.mode("overwrite")
         .parquet(os.path.join(out_root, "fps", tag)))
        (firsts.drop("fp")
         .write.mode("overwrite")
         .parquet(os.path.join(out_root, "out", tag)))
        # same atomic pointer flip as the index catalog: the state tag
        # and batch_id commit together (plans/manifest commit protocol)
        from searchengine_spark.plans.manifest import commit_snapshot
        os.makedirs(out_root, exist_ok=True)
        commit_snapshot(out_root, tag, batch_id=batch_id)

    return apply


def stream_dedup_turns(spark: SparkSession, source_dir: str, out_root: str,
                       checkpoint_dir: str, available_now: bool = True,
                       text_col: str = "text",
                       max_files_per_trigger: int = 1):
    """Run the dedup guard over parquet drops in ``source_dir``; surviving
    rows land under ``out_root``/out/. ``available_now=True`` drains then
    stops (test/backfill mode); swap the source for Kafka/CDC in
    production — the sink is unchanged."""
    stream = (spark.readStream.schema(TURN_SCHEMA)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(source_dir))
    writer = (stream.writeStream
              .foreachBatch(dedup_stream_batch(out_root, text_col=text_col))
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("update"))
    if available_now:
        return writer.trigger(availableNow=True).start()
    return writer.start()


def read_deduped(spark: SparkSession, out_root: str) -> DataFrame:
    """All survivors ingested so far (committed batches)."""
    out = os.path.join(out_root, "out")
    last = _read_ptr(out_root).get("batch_id")
    dirs = [os.path.join(out, d) for d in sorted(os.listdir(out))
            if d.startswith("batch_")
            and (last is None or int(d.split("_")[1]) <= last)] \
        if os.path.isdir(out) else []
    if not dirs:
        return spark.createDataFrame([], TURN_SCHEMA)
    return spark.read.parquet(*dirs)
