"""Time-series regularization operators (gap-fill, LOCF).

Hypertable-style engines resample irregular event streams onto a
regular grid. Spark has no gap-fill primitive; the scalable form is
dimension-cross-join: build the (key x bucket) grid declaratively
(sequence + explode — no driver-side loop, no collect), left-join the
observed aggregate onto it, and carry values forward with an
ignore-nulls window. Everything is ANSI-expressible, so the DuckDB
oracle checks it end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def gap_fill_daily(
    observed: DataFrame,
    key: str,
    day_col: str,
    value_col: str,
) -> DataFrame:
    """Fill missing (key, day) cells over each key's global span.

    ``observed`` has one row per (key, day) present in the data. The
    output has one row per (key, day-in-[global min, global max]) with
    ``value`` zero-filled, ``value_locf`` carrying the last observed
    value forward (null before a key's first observation), and
    ``is_filled`` marking synthesized rows.

    Scale notes: the grid generator is a broadcast single-row span
    crossed with the distinct-key relation — |keys| x |days| rows
    materialized straight into the join, never on the driver. The
    left join and the LOCF window share one hash partitioning on key;
    days-per-span is bounded, so per-key partitions stay small even
    at 10^9 keys.
    """
    # Three subtrees (span, key set, join probe) read `observed`;
    # without a persist each re-scans and re-aggregates the source.
    observed = observed.persist()
    span = observed.agg(
        F.min(day_col).alias("__d0"), F.max(day_col).alias("__d1")
    )
    days = span.select(
        F.explode(F.sequence("__d0", "__d1")).alias(day_col)
    )
    grid = observed.select(key).distinct().crossJoin(F.broadcast(days))
    joined = grid.join(observed, [key, day_col], "left")
    w = (
        Window.partitionBy(key)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = joined.select(
        key,
        day_col,
        F.coalesce(F.col(value_col), F.lit(0.0)).alias(value_col),
        F.last(value_col, ignorenulls=True).over(w).alias(f"{value_col}_locf"),
        F.col(value_col).isNull().alias("is_filled"),
    )
    from streamforge_data_pipeline_spark.functions import finalize_released

    return finalize_released(out, observed)
