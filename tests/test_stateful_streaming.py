"""Custom stateful streaming ops (applyInPandasWithState): sessionization
and running per-conversation stats. Both verified against batch-computed
expectations on deterministic inputs."""

from __future__ import annotations

import pandas as pd

from searchengine_spark.streaming.stateful import (
    conversation_running_stats, sessionize_events)

EV_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"
TURN_SCHEMA = ("conv_id string, turn_idx int, role string, text string, "
               "tool string, ts timestamp")


def _write(spark, path, pdf, schema):
    spark.createDataFrame(pdf, schema).write.mode("overwrite").parquet(path)


def test_sessionize_events(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("ev_src"))
    ckpt = str(tmp_path_factory.mktemp("ev_ckpt"))
    rows = [
        # user 1: two sessions separated by > 30 min
        (0, "2024-01-01 00:00:00", 1, "click", 1.0),
        (1, "2024-01-01 00:10:00", 1, "click", 2.0),
        (2, "2024-01-01 01:00:00", 1, "click", 4.0),
        (3, "2024-01-01 01:05:00", 1, "click", 8.0),
        # user 2: one session
        (4, "2024-01-01 00:00:00", 2, "view", 10.0),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    _write(spark, f"{src}/d1", pdf, EV_SCHEMA)

    stream = spark.readStream.schema(EV_SCHEMA).parquet(f"{src}/*")
    sessions = sessionize_events(stream, gap_seconds=1800)
    q = (sessions.writeStream.format("memory").queryName("sess")
         .outputMode("append").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["user_id"], str(r["session_start"])): (r["n_events"], r["value_sum"])
           for r in spark.sql("select * from sess").collect()}
    # the first user-1 session closed when the 01:00 event arrived (> gap);
    # the second session and user 2's stay open awaiting timeout
    assert got[(1, "2024-01-01 00:00:00")] == (2, 3.0)


def test_conversation_running_stats_across_batches(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("rt_src"))
    ckpt = str(tmp_path_factory.mktemp("rt_ckpt"))

    def turn(conv, idx, text):
        return (conv, idx, "user", text, None, pd.Timestamp("2026-01-01"))

    b1 = pd.DataFrame([turn("a", 0, "xx"), turn("a", 1, "yyy"), turn("b", 0, "z")],
                      columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    _write(spark, f"{src}/d1", b1, TURN_SCHEMA)

    def drain(name):
        # memory sink can't recover a checkpoint → collect via foreachBatch
        rows: list = []

        def sink(batch_df, _bid):
            rows.extend(batch_df.collect())

        stream = spark.readStream.schema(TURN_SCHEMA) \
            .option("maxFilesPerTrigger", 1).parquet(f"{src}/*")
        q = (conversation_running_stats(stream)
             .writeStream.foreachBatch(sink)
             .outputMode("update").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return {r["conv_id"]: (r["n_turns"], r["n_chars"]) for r in rows}

    got1 = drain("run1")
    assert got1["a"] == (2, 5) and got1["b"] == (1, 1)

    # second drop: state carries across a RESTARTED query (same checkpoint)
    b2 = pd.DataFrame([turn("a", 2, "wwww")],
                      columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    _write(spark, f"{src}/d2", b2, TURN_SCHEMA)
    got2 = drain("run2")
    assert got2["a"] == (3, 9)  # 2+1 turns, 5+4 chars — state survived restart


def test_batch_and_streaming_sessionize_agree(spark, tmp_path_factory):
    """Closed sessions from the stateful stream == batch sessionization minus
    each user's final (still-open) session, on identical input."""
    from searchengine_spark.functions.events import sessionize_events_batch
    src = str(tmp_path_factory.mktemp("agree_src"))
    ckpt = str(tmp_path_factory.mktemp("agree_ckpt"))
    rows, eid = [], 0
    for u in (1, 2, 3):
        t = pd.Timestamp("2024-01-01 00:00:00")
        for s in range(u):           # user u has u sessions
            for i in range(3):
                rows.append((eid, t, u, "e", float(u * 10 + i)))
                eid += 1
                t += pd.Timedelta(minutes=5)
            t += pd.Timedelta(hours=2)  # > gap → next session
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    _write(spark, f"{src}/d1", pdf, EV_SCHEMA)

    stream = spark.readStream.schema(EV_SCHEMA).parquet(f"{src}/*")
    q = (sessionize_events(stream, gap_seconds=1800)
         .writeStream.format("memory").queryName("agree")
         .outputMode("append").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    streamed = {(r["user_id"], str(r["session_start"]), str(r["session_end"]),
                 r["n_events"], round(r["value_sum"], 6))
                for r in spark.sql("select * from agree").collect()}

    batch_df = sessionize_events_batch(
        spark.createDataFrame(pdf, EV_SCHEMA), gap_seconds=1800).collect()
    by_user_last = {}
    batch = set()
    for r in batch_df:
        key = (r["user_id"], str(r["session_start"]), str(r["session_end"]),
               r["n_events"], round(r["value_sum"], 6))
        batch.add(key)
        last = by_user_last.get(r["user_id"])
        if last is None or str(r["session_start"]) > last[1]:
            by_user_last[r["user_id"]] = key
    closed_batch = batch - set(by_user_last.values())
    assert streamed == closed_batch
    assert len(batch) == 1 + 2 + 3  # sanity: u sessions per user u
