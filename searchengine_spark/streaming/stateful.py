"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no streaming or session state at all (SURVEY.md §2.7);
these are the scale capabilities a transcript/event pipeline needs on top:

- ``sessionize_events``: classic event sessionization — group a user's
  event stream into sessions separated by ≥ gap of inactivity, emitting one
  row per CLOSED session (event count, value sum, duration). State = the
  open session per user; a processing-time timeout flushes sessions whose
  users go quiet. This is the canonical ``applyInPandasWithState`` shape:
  watermark bounds state, timeouts emit, the grouping key partitions state.

- ``conversation_running_stats``: per-conversation running turn/char
  counters maintained across micro-batches (state = two counters), emitting
  the updated totals each batch — the streaming twin of A3 statistics kept
  incrementally instead of recomputed.

Both are pure-batch-testable: drive with a file-source stream and
``trigger(availableNow=True)``.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = ("user_id long, session_start timestamp, session_end timestamp, "
                  "n_events int, value_sum double")
SESSION_STATE = "start long, end long, n int, vsum double"

RUNNING_SCHEMA = "conv_id string, n_turns long, n_chars long"
RUNNING_STATE = "n long, chars long"


def _sessionize_fn(gap_seconds: float):
    gap_us = int(gap_seconds * 1_000_000)

    def fn(key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (user_id,) = key
        out = []

        def close(s):
            out.append((user_id, pd.Timestamp(s[0], unit="us"),
                        pd.Timestamp(s[1], unit="us"), int(s[2]), float(s[3])))

        if state.hasTimedOut:
            if state.exists:
                close(state.get)
                state.remove()
        else:
            cur = list(state.get) if state.exists else None
            # applyInPandasWithState may deliver the group's micro-batch as
            # MULTIPLE chunks with no global ts ordering; sorting chunks
            # independently could close/split sessions on out-of-order events
            # across chunk boundaries. Materialize + concat + one sort (state
            # per user is bounded by its micro-batch slice).
            chunks = [pdf for pdf in pdfs if len(pdf)]
            if chunks:
                pdf = pd.concat(chunks, ignore_index=True).sort_values("ts")
                for ts, val in zip(pdf["ts"].astype("int64") // 1000,
                                   pdf["value"].fillna(0.0)):
                    if cur is not None and ts - cur[1] > gap_us:
                        close(cur)
                        cur = None
                    if cur is None:
                        cur = [int(ts), int(ts), 0, 0.0]
                    cur[1] = int(ts)
                    cur[2] += 1
                    cur[3] += float(val)
            if cur is not None:
                state.update(tuple(cur))
                state.setTimeoutDuration(int(gap_seconds * 1000))
        yield pd.DataFrame(out, columns=["user_id", "session_start",
                                         "session_end", "n_events", "value_sum"])

    return fn


def sessionize_events(events_stream: DataFrame, gap_seconds: float = 1800.0) -> DataFrame:
    """Sessionize a stream of (user_id, ts, value, …) events: one output row
    per closed session. Open sessions flush via processing-time timeout."""
    return (events_stream
            .groupBy("user_id")
            .applyInPandasWithState(
                _sessionize_fn(gap_seconds),
                outputStructType=SESSION_SCHEMA,
                stateStructType=SESSION_STATE,
                outputMode="append",
                timeoutConf=GroupStateTimeout.ProcessingTimeTimeout))


def _running_fn(key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState):
    (conv_id,) = key
    n, chars = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        chars += int(pdf["text"].fillna("").str.len().sum())
    state.update((int(n), int(chars)))
    yield pd.DataFrame([(conv_id, int(n), int(chars))],
                       columns=["conv_id", "n_turns", "n_chars"])


def conversation_running_stats(turns_stream: DataFrame) -> DataFrame:
    """Per-conversation cumulative (n_turns, n_chars) maintained as stream
    state; each micro-batch emits the conversations it touched with their
    updated running totals."""
    return (turns_stream
            .groupBy("conv_id")
            .applyInPandasWithState(
                _running_fn,
                outputStructType=RUNNING_SCHEMA,
                stateStructType=RUNNING_STATE,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
