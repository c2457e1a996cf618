"""Event-time window aggregations (streaming-native surface).

The reference has no event-time operators (SURVEY §2.8) — these are
extension surface: the same `F.window`/`F.session_window` expressions
work identically over a batch DataFrame and a watermarked stream, so
each is oracle-checkable in batch and reusable in
streaming/ingest_stream.py pipelines.

Tumbling/sliding slots are epoch-aligned exactly like Spark's
implementation, so the DuckDB oracles reproduce them with integer
microsecond arithmetic (no float time math).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tumbling_counts(events: DataFrame, ts: str = "ts", key: str = "event_type",
                    width: str = "1 hour") -> DataFrame:
    """Per-hour-per-key counts + decimal-path value sums."""
    return (
        events.groupBy(F.window(ts, width).alias("w"), key)
        .agg(
            F.count(F.lit(1)).alias("n"),
            # round-before-cast keeps the decimal->double conversion
            # correctly rounded at any scale (see analytics.dsum)
            F.round(F.sum(F.col("value").cast("decimal(28,10)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), key, "n", "sum_value")
    )


def sliding_counts(events: DataFrame, ts: str = "ts",
                   width: str = "1 hour", slide: str = "30 minutes") -> DataFrame:
    """Overlapping 1h windows every 30min; each event lands in 2 slots."""
    return (
        events.groupBy(F.window(ts, width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


def session_counts(events: DataFrame, ts: str = "ts", key: str = "user_id",
                   gap: str = "5 minutes") -> DataFrame:
    """Session windows per key: a gap >= 5min starts a new session.

    Batch/streaming dual-use: `session_window` is the streaming
    stateful-session operator; in batch Catalyst compiles it to the
    same gap-merge. The oracle states it relationally (lag + running
    break-count), which is also the classic sessionization pattern.
    """
    return (
        events.groupBy(F.session_window(ts, gap).alias("w"), key)
        .agg(F.count(F.lit(1)).alias("n_events"), F.max(ts).alias("last_event"))
        .select(
            key,
            F.col("w.start").alias("session_start"),
            "last_event",
            "n_events",
        )
    )
