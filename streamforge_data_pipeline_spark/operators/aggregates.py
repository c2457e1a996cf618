"""Aggregation operators (SURVEY §2.4).

A1 error-category counts (map.merge hash agg,
BackgroundCsvProcessor.java:127,144), A2 upload summary counters
(:125-133,174-205), A3 distinct key set (ItemRepository.java:16-17),
A4 keyed last-value job status (CsvUploadService.java:20,46-49).

All are partial-aggregate (map-side combine) shapes: Spark computes
per-partition partials before the single shuffle, so counters over
100 TB move only one row per (partition x group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def error_counts(validated: DataFrame, error: str = "error") -> DataFrame:
    """A1: per-error-category counts over rejected rows."""
    return (
        validated.filter(F.col(error).isNotNull())
        .groupBy(error)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def upload_summary(validated: DataFrame, error: str = "error") -> DataFrame:
    """A2: processed/failed/inserted in one pass (count(col) skips nulls)."""
    return validated.agg(
        F.count(F.lit(1)).alias("processed_rows"),
        F.count(error).alias("failed_rows"),
        (F.count(F.lit(1)) - F.count(error)).alias("inserted_rows"),
    )


def distinct_keys(df: DataFrame, key: str, alias: str | None = None) -> DataFrame:
    """A3: distinct projection (materialized only if broadcast)."""
    return df.select(F.col(key).alias(alias or key)).distinct()


def latest_per_key(df: DataFrame, key, order) -> DataFrame:
    """A4: last-write-wins per key — row_number desc == 1."""
    w = Window.partitionBy(key).orderBy(F.desc(order))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
