"""Watermarked windowed aggregation over an event stream (T5 family).

The sync layer deliberately avoids watermarks (keyed last-write-wins with
unbounded lateness — see pipeline.py); ANALYTICS streams are the opposite
case: aggregates must eventually finalize, so late data is bounded with
``withWatermark`` and windows close when the watermark passes. This is
the standard Spark shape: state is scoped per (window, keys) and evicted
at watermark — memory stays bounded no matter how long the stream runs,
which is the property that matters at 100 TB/day.

Works identically on a batch DataFrame (watermark is a no-op there), so
the same code serves backfill and live streams.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    group_cols: tuple[str, ...] = ("event_type",),
    agg_col: str | None = "value",
) -> DataFrame:
    """Tumbling (or sliding, with ``slide``) windowed counts + sum.

    Output: window_start, window_end, *group_cols, n_events[, total_value].
    In append mode a window emits once, when the watermark passes its end
    — the exactly-once-per-window contract downstream sinks want.
    """
    df = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    win: Column = (
        F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    )
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if agg_col is not None:
        aggs.append(F.sum(F.col(agg_col).cast("decimal(18,4)")).cast("double").alias("total_value"))
    return (
        df.groupBy(win.alias("win"), *[F.col(c) for c in group_cols])
        .agg(*aggs)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *[F.col(c) for c in group_cols],
            *[F.col(a) for a in (["n_events"] + (["total_value"] if agg_col else []))],
        )
    )


def dedupe_stream(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exactly-once-per-key dedup (at-least-once source → effectively
    -once downstream): ``dropDuplicatesWithinWatermark`` keeps one row per key
    and evicts its dedup state once the watermark passes the row's event time
    — bounded state no matter how long the stream runs, which plain
    ``dropDuplicates`` (unbounded state) cannot promise. Duplicates arriving
    within the watermark horizon are suppressed across micro-batches; a
    duplicate arriving later than the horizon is by contract late data.

    On a batch DataFrame this degrades to exact ``dropDuplicates`` — same
    code path serves backfill and live ingest, like windowed_event_counts.
    """
    keys = list(key_cols)
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)
