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


def decayed_counts(
    df: DataFrame,
    key: str = "event_type",
    ts: str = "ts",
    max_age_days: int = 40,
) -> DataFrame:
    """Recency-weighted activity profile: per key, the exponentially
    decayed event count with a one-day half-life — the freshness
    signal a curation pipeline uses to weight recent behavior over
    stale history without a sliding-window re-scan. Emits
    (key, n_events, decayed_count).

    Exactness (the determinize-the-risky-stages move for decay):
    weights are 2^-age, but summing doubles is order-sensitive, so
    each event contributes the INTEGER 2^(max_age_days - age) (pow of
    two: exactly representable, CAST exact in both engines), the sum
    is exact int64 arithmetic (order-independent), and ONE final
    division by 2^max_age_days — an exact IEEE op — recovers the
    decayed value, rounded to 6 dp. Events older than
    ``max_age_days`` contribute 0 (each would add < 2^-40 ~ 1e-12 —
    a documented truncation, not a float accident). Overflow bound:
    n_events * 2^max_age_days < 2^63 holds through ~8M events/key at
    the default; raise awareness, not the exponent, past that (or
    shard the sum by age bucket).

    Scale shape: one narrow projection (datediff + pow) then one
    partial-agg hash aggregation — map-side combinable, key-bounded
    output; the corpus max-date rides in as a broadcast 1-row scalar.
    """
    maxd = df.agg(F.max(F.to_date(ts)).alias("__maxd"))
    age = F.datediff(F.col("__maxd"), F.to_date(ts))
    w = F.when(
        (age >= 0) & (age <= max_age_days),
        F.pow(F.lit(2.0), (F.lit(max_age_days) - age)).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return (
        df.crossJoin(F.broadcast(maxd))
        .select(F.col(key), w.alias("__w"))
        .groupBy(key)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(
                F.sum("__w") / F.pow(F.lit(2.0), F.lit(max_age_days)), 6
            ).alias("decayed_count"),
        )
    )


def column_stats(df: DataFrame, numeric_round: int = 4) -> DataFrame:
    """ANALYZE-style per-column statistics — the table the cost-based
    optimizer (and any curation dashboard) reads: one row per column
    with (n_rows, n_nulls, null_frac, ndv, min/max). Numeric columns
    report min/max as rounded doubles; date/timestamp columns as
    ISO dates; other columns as strings — min_num/max_num and
    min_str/max_str are disjoint, so the output schema is fixed
    regardless of the input schema.

    ndv is EXACT count(distinct) — this is the oracle-checked
    reference; the 100 TB ANALYZE pass swaps in the mergeable
    KMV/HLL estimators this repo already carries (kmv_distinct,
    approx_count_distinct) per the established exact/approx pairing.
    Each column is one aggregate over a single-column projection
    (column-pruned scan); columns are independent jobs, so a wide
    table fans out trivially."""
    from pyspark.sql import types as T

    out = None
    for f in df.schema.fields:
        c = F.col("__c")
        numeric = isinstance(
            f.dataType,
            (T.LongType, T.IntegerType, T.ShortType, T.ByteType,
             T.DoubleType, T.FloatType, T.DecimalType),
        )
        temporal = isinstance(
            f.dataType, (T.DateType, T.TimestampType, T.TimestampNTZType)
        )
        if numeric:
            mn = F.round(F.min(c).cast("double"), numeric_round)
            mx = F.round(F.max(c).cast("double"), numeric_round)
            mns, mxs = F.lit(None).cast("string"), F.lit(None).cast("string")
        elif temporal:
            mn, mx = F.lit(None).cast("double"), F.lit(None).cast("double")
            mns = F.min(F.to_date(c)).cast("string")
            mxs = F.max(F.to_date(c)).cast("string")
        else:
            mn, mx = F.lit(None).cast("double"), F.lit(None).cast("double")
            mns = F.min(c.cast("string"))
            mxs = F.max(c.cast("string"))
        nulls = F.sum(F.when(c.isNull(), 1).otherwise(0))
        row = (
            df.select(F.col(f.name).alias("__c"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                nulls.cast("long").alias("n_nulls"),
                F.round(nulls / F.count(F.lit(1)), 4).alias("null_frac"),
                F.countDistinct("__c").cast("long").alias("ndv"),
                mn.alias("min_num"),
                mx.alias("max_num"),
                mns.alias("min_str"),
                mxs.alias("max_str"),
            )
            .select(
                F.lit(f.name).alias("column"),
                "n_rows", "n_nulls", "null_frac", "ndv",
                "min_num", "max_num", "min_str", "max_str",
            )
        )
        out = row if out is None else out.unionAll(row)
    return out
