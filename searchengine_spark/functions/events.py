"""Batch event-stream operators over the events table
(event_id, ts, user_id, event_type, value, props).

``sessionize_events_batch`` is the batch twin of
``streaming.stateful.sessionize_events``: same session semantics (gap-based
split per user), expressed relationally — lag window to mark session
starts, running sum to number sessions, one aggregation for the rollup.
All JVM built-ins; two shuffles (both on user_id, so AQE reuses the
exchange)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize_events_batch(events: DataFrame, gap_seconds: float = 1800.0,
                            user_col: str = "user_id", ts_col: str = "ts",
                            value_col: str = "value") -> DataFrame:
    """One row per (user, session): start/end ts, event count, value sum.
    A session breaks when the gap to the previous event exceeds
    ``gap_seconds``."""
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    # parquet may carry TIMESTAMP_NTZ, which won't cast to double directly;
    # routing via timestamp (UTC session tz) matches DuckDB's epoch(ts)
    ts_s = F.col(ts_col).cast("timestamp").cast("double")
    prev = F.lag(ts_col).over(w).cast("timestamp").cast("double")
    is_new = F.when(prev.isNull() | (ts_s - prev > F.lit(float(gap_seconds))), 1).otherwise(0)
    numbered = events.withColumn("_new", is_new) \
                     .withColumn("_sess", F.sum("_new").over(w))
    return (numbered.groupBy(user_col, "_sess")
            .agg(F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 F.count("*").alias("n_events"),
                 F.round(F.sum(F.coalesce(F.col(value_col), F.lit(0.0))), 6).alias("value_sum"))
            .drop("_sess"))


def event_type_rollup(events: DataFrame) -> DataFrame:
    """Per event-type counts + value stats (the cheap monitoring rollup)."""
    return (events.groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 6).alias("value_sum"),
                 F.round(F.avg("value"), 6).alias("value_avg")))
