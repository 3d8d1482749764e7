"""Gap-based sessionization — a custom stateful streaming operator built
on ``applyInPandasWithState`` (the harness Spark gives for operators its
built-ins can't express; SURVEY §2.9 maps the reference's "custom
stateful" seam here).

Semantics: events for a key belong to one session while consecutive
events are ≤ ``gap_s`` apart; an event arriving later CLOSES the previous
session (emitted downstream) and starts a new one. State per key is three
scalars (start, last-seen, count) — O(keys) memory, not O(events) — and
lives in the Spark state store (checkpointed, recoverable, partitioned by
the grouping key, so the operator scales out exactly like a shuffle).

Deterministic by construction: sessions close on the DATA (the next
event's gap), not on wall-clock timeouts, so replaying the same batches
yields the same sessions — the property the engine's exactly-once story
needs. Open sessions simply persist in state until a later event (or a
final sentinel batch) closes them.

Batch parity: ``sessionize_batch`` computes identical sessions with a
window-function plan for backfill / oracle checks.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id long, session_start timestamp, session_end timestamp, n_events long"
# state: session start / last event (epoch seconds) and event count
STATE_SCHEMA = "start double, last double, n long"


def sessionize_stream(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Streaming sessionizer: ``events`` needs ``user_id`` and ``ts``
    columns; emits one row per CLOSED session."""

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        ts: list[float] = []
        for pdf in pdfs:
            ts.extend(pdf["ts"].astype("int64") / 1e9)  # epoch seconds
        ts.sort()
        start, last, n = state.get if state.exists else (None, None, 0)
        closed: list[tuple[int, float, float, int]] = []
        for t in ts:
            if last is None:
                start, last, n = t, t, 1
            elif t - last > gap_s:
                closed.append((user_id, start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        if start is not None:
            state.update((float(start), float(last), int(n)))
        if closed:
            out = pd.DataFrame(
                closed, columns=["user_id", "session_start", "session_end", "n_events"]
            )
            out["session_start"] = pd.to_datetime(out["session_start"], unit="s")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="s")
            yield out

    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, OUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
        )
    )


def sessionize_batch(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Batch-mode sessions (ALL sessions, open ones included): classic
    gaps-and-islands — lag + cumulative session id per key, one shuffle."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    # microsecond-exact gap test (unix_timestamp would truncate to seconds)
    gapped = events.select("user_id", "event_id", "ts").withColumn(
        "new_session",
        (
            F.coalesce(
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > gap_s * 1_000_000,
                F.lit(True),
            )
        ).cast("int"),
    )
    sessions = gapped.withColumn("session_id", F.sum("new_session").over(w))
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("session_id")
    )
