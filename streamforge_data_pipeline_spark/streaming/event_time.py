"""Event-time plumbing shared by every streaming entry point.

``withWatermark`` requires TIMESTAMP (LTZ); parquet written with
isAdjustedToUTC=false (pandas/pyarrow default, including the driver's
testdata) loads as TIMESTAMP_NTZ, which Spark rejects with
EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE. Every event-time operator in this
package routes its input through :func:`as_event_time` so the NTZ case
can never reach a watermark.

The NTZ->LTZ cast interprets the naive value in the session timezone.
The engine pins sessions to UTC (session.py), so the cast is a pure
relabel — no wall-clock shift — and window alignment is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def as_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Coerce ``ts_col`` to watermark-compatible TIMESTAMP_LTZ.

    No-op when the column is already TIMESTAMP; NTZ is cast in place.
    Works identically on batch and streaming DataFrames, so batch/stream
    parity tests can normalize both sides with the same call.
    """
    if isinstance(df.schema[ts_col].dataType, T.TimestampNTZType):
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def watermarked(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """``withWatermark`` that tolerates NTZ inputs (the common parquet
    case). Use this instead of calling ``withWatermark`` directly."""
    return as_event_time(df, ts_col).withWatermark(ts_col, delay)
