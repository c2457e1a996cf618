"""Streaming dedup and stream-stream joins.

The reference dedups arrival-ordered within one bounded file (SURVEY
§2.3 J2) and against a static table (J1). A continuously-ingesting
pipeline needs both as *unbounded* operators:

- ``streaming_dedup``: exactly-once keys within the watermark horizon
  via ``dropDuplicatesWithinWatermark`` — state is bounded (old keys
  age out with the watermark), which is the only dedup that survives
  an unbounded stream; a global ``dropDuplicates`` would grow state
  forever.
- ``interval_join``: stream-stream inner join with an event-time
  range predicate. Watermarks on BOTH sides let Spark discard
  outdated join state; without the time bound the state store would
  buffer both streams indefinitely.

Both are asserted equal to their batch equivalents in
tests/test_streaming_joins.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .event_time import as_event_time as _as_event_time


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static equi-join — in-flight dimension enrichment.

    The static side is re-planned inside every micro-batch (so a dim
    refreshed on disk is picked up at the next trigger) and broadcast
    by default: dimension tables are small by definition, and the
    broadcast keeps the stream side shuffle-free. Pass
    ``broadcast_dim=False`` for a large static side and let stats/AQE
    choose. No watermark or state store is involved — unlike
    stream-stream joins, the static side is fully available, so
    nothing buffers.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on, how)


def streaming_dedup(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """First occurrence per key within the watermark horizon."""
    stream = _as_event_time(stream, ts_col)
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(key_cols)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "15 minutes",
    delay: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join with an event-time interval bound:
    right rows join left rows with ``left_ts <= right_ts <= left_ts +
    upper`` (after ``lower`` offset). Both sides carry watermarks so
    buffered state is evicted as event time advances.

    ``how`` extends to the outer modes (``leftOuter``, ``rightOuter``,
    ``fullOuter``): matches emit immediately, but an UNMATCHED row can
    only emit (null-padded) once the watermark has passed its whole
    join window — eviction is the proof no future match exists — so in
    append-mode drains the rows younger than (max event time - delay)
    stay buffered and never surface. The same watermark+range bound
    that keeps inner-join state finite is what makes outer results
    decidable at all on unbounded inputs."""
    l = _as_event_time(left, left_ts).withWatermark(left_ts, delay).alias("l")
    r = _as_event_time(right, right_ts).withWatermark(right_ts, delay).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (
            F.col(f"r.{right_ts}")
            >= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {lower}")
        )
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper}")
        )
    )
    return l.join(r, cond, how)


def interval_join_spread(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "15 minutes",
    delay: str = "30 minutes",
    spread_seconds: int | None = None,
) -> DataFrame:
    """:func:`interval_join` with the time-bucket skew spread (r5
    brief #5): stream-stream joins shuffle BOTH sides (and keep state)
    on the equi-key, so one hot key pins a single state partition for
    the stream's lifetime — worse than batch, where AQE can at least
    split the materialized partition. The spread adds a derived
    equi-column tb = floor(event_time / W), W >= the interval span, to
    both sides — the left exploded to its <= 2 candidate buckets
    (every true match agrees on the right row's bucket, so results
    are exactly :func:`interval_join`'s, pytest-asserted) — and the
    join state now shards on (key, tb): a key hot over HOURS spreads
    across its hour's buckets, and old buckets' state evicts on the
    same watermark. Residual hot-key-AND-hot-instant skew is
    irreducible by any keying. ``spread_seconds`` defaults to the
    interval span. Inner mode only: the spread duplicates UNMATCHED
    left rows across buckets, so outer-mode null-padding would need a
    post-join dedup that append-mode cannot express — use
    :func:`interval_join` for outer modes (its state skew is the
    price of the null proof). Output columns: left's then right's, in
    their original order (the plain join's layout)."""
    spark = left.sparkSession
    # evaluate the interval literals in seconds once, on the driver —
    # as a DELTA against the same base timestamp, so the session
    # timezone cancels out
    base = F.lit("2000-01-01 00:00:00").cast("timestamp")
    row = spark.range(1).select(
        (F.unix_timestamp(base + F.expr(f"INTERVAL {lower}")) - F.unix_timestamp(base)).alias("a"),
        (F.unix_timestamp(base + F.expr(f"INTERVAL {upper}")) - F.unix_timestamp(base)).alias("b"),
    ).collect()[0]
    lo_s, up_s = int(row["a"]), int(row["b"])
    w = spread_seconds if spread_seconds is not None else max(up_s - lo_s, 1)

    l0 = _as_event_time(left, left_ts)
    r0 = _as_event_time(right, right_ts)
    lo_b = F.floor((F.unix_timestamp(F.col(left_ts)) + F.lit(lo_s)) / w)
    hi_b = F.floor((F.unix_timestamp(F.col(left_ts)) + F.lit(up_s)) / w)
    l = (
        l0.withColumn("__tb", F.explode(F.array_distinct(F.array(lo_b, hi_b))))
        .withWatermark(left_ts, delay)
        .alias("l")
    )
    r = (
        r0.withColumn("__tb", F.floor(F.unix_timestamp(F.col(right_ts)) / w))
        .withWatermark(right_ts, delay)
        .alias("r")
    )
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col("l.__tb") == F.col("r.__tb"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {lower}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper}"))
    )
    out = l.join(r, cond, "inner")
    return out.select(
        *[F.col(f"l.{c}") for c in left.columns],
        *[F.col(f"r.{c}") for c in right.columns],
    )
