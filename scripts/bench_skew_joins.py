#!/usr/bin/env python
"""Planted-skew A/B for the interval/range join family (r5 brief #5).

Corpus: sf1-scale planted skew — N events over 24h, ONE hot user
carrying ~50% of rows. For each join the script measures:

- wall time of the end-to-end join (noop sink, AQE on — the realistic
  engine config; AQE's skew split is part of the baseline story), and
- shuffle-key balance: rows per shuffle partition under the join's
  actual key, reported as max/mean ratio (1.0 = perfectly even; the
  plain plan's hot key gives ~0.5 * partitions).

Joins:
1. batch interval join, plain (key)-keyed vs time-bucket spread
   (operators.joins.batch_interval_join) — the profiler-routed plan
   (skew_aware_interval_join) picks the spread on this corpus.
2. range_join under a hot VALUE with a non-broadcast bands side,
   plain vs salt_buckets=32.

Usage: python scripts/bench_skew_joins.py [N_EVENTS]
Prints one JSON line for PERF_NOTES.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from streamforge_data_pipeline_spark.operators.joins import (  # noqa: E402
    batch_interval_join,
    range_join,
)
from streamforge_data_pipeline_spark.session import get_session  # noqa: E402

PARTS = 32


def balance(df, *key_cols) -> float:
    """max/mean rows per hash partition under the given shuffle key."""
    counts = [
        r["n"]
        for r in df.groupBy(
            F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(PARTS)).alias("p")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    mean = sum(counts) / max(len(counts), 1)
    return round(max(counts) / max(mean, 1e-9), 2)


def timed(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_session("bench-skew-joins")
    spark.sparkContext.setLogLevel("ERROR")

    half = n // 2
    tail = spark.range(half).select(
        (F.col("id") % 5000 + 1).alias("user_id"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=(F.col("id") * 97) % 86400)).alias("ts"),
        F.col("id").alias("event_id"),
        ((F.col("id") * 37) % 100).cast("double").alias("value"),
    )
    hot = spark.range(half).select(
        F.lit(999_999).alias("user_id"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=(F.col("id") * 131) % 86400)).alias("ts"),
        (F.col("id") + 10_000_000).alias("event_id"),
        F.lit(42.0).alias("value"),  # the hot VALUE for the range join
    )
    ev = tail.unionByName(hot).repartition(PARTS).localCheckpoint(eager=True)
    left = ev.select("user_id", "ts", "event_id")
    right = ev.select("user_id", "ts", F.col("event_id").alias("r_event_id"))

    out: dict = {"n_events": n, "hot_share": 0.5, "partitions": PARTS}

    # ---- 1. interval join (60s window keeps the hot-key pair volume sane)
    plain = batch_interval_join(
        left, right.withColumnRenamed("r_event_id", "event_id"),
        "user_id", lower_s=1, upper_s=60, time_bucketed=False,
    )
    spread = batch_interval_join(
        left, right.withColumnRenamed("r_event_id", "event_id"),
        "user_id", lower_s=1, upper_s=60, time_bucketed=True,
    )
    out["interval_plain_s"] = timed(plain)
    out["interval_spread_s"] = timed(spread)
    out["interval_rows_equal"] = plain.count() == spread.count()
    out["interval_key_balance_plain"] = balance(left, "user_id")
    w = 59
    lb = left.withColumn("__tb", F.floor((F.unix_timestamp("ts") + 1) / w))
    out["interval_key_balance_spread"] = balance(lb, "user_id", "__tb")

    # ---- 2. range join under a hot value, non-broadcast bands
    bands = spark.createDataFrame(
        [(f"b{i}", float(i), float(i + 1)) for i in range(100)],
        "label string, lo double, hi double",
    )
    probe = ev.select("event_id", "value")
    plain_r = range_join(
        probe, bands, "value", "lo", "hi", 1.0, broadcast_bands=False
    )
    salted_r = range_join(
        probe, bands, "value", "lo", "hi", 1.0,
        broadcast_bands=False, salt_buckets=32,
    )
    out["range_plain_s"] = timed(plain_r)
    out["range_salted_s"] = timed(salted_r)
    out["range_rows_equal"] = plain_r.count() == salted_r.count()
    pb = probe.withColumn("__bucket", F.floor(F.col("value") / 1.0))
    out["range_key_balance_plain"] = balance(pb, "__bucket")
    pbs = pb.withColumn(
        "__salt", F.pmod(F.xxhash64("event_id", "value"), F.lit(32))
    )
    out["range_key_balance_salted"] = balance(pbs, "__bucket", "__salt")

    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
