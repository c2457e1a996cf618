"""Binned range-join semantics + plan shape.

The point of range_join is turning an interval-containment theta join
(which Spark plans as BroadcastNestedLoopJoin) into a bucket equi-join
with a residual filter — same rows, hash-joinable plan.
"""

from streamforge_data_pipeline_spark.operators.joins import range_join


def _bands(spark):
    return spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 10.0, 25.0), ("wide", 25.0, 100.0)],
        "label string, lo double, hi double",
    )


def test_boundary_semantics(spark):
    probe = spark.createDataFrame(
        [(1, 0.0),    # at lo of a -> a
         (2, 9.99),   # inside a
         (3, 10.0),   # at hi of a == lo of b -> b only
         (4, 25.0),   # -> wide (spans multiple buckets at width 10)
         (5, 99.99),  # inside wide, last bucket
         (6, 100.0),  # at hi of wide -> no match
         (7, -1.0)],  # below all bands -> no match
        "id long, v double",
    )
    out = range_join(
        probe, _bands(spark), value_col="v", lo_col="lo", hi_col="hi", bucket_width=10.0
    )
    got = {r["id"]: r["label"] for r in out.collect()}
    assert got == {1: "a", 2: "a", 3: "b", 4: "wide", 5: "wide"}


def test_band_narrower_than_bucket(spark):
    bands = spark.createDataFrame(
        [("tiny", 3.0, 4.0)], "label string, lo double, hi double"
    )
    probe = spark.createDataFrame(
        [(1, 3.5), (2, 4.5)], "id long, v double"
    )
    out = range_join(probe, bands, "v", "lo", "hi", bucket_width=100.0)
    assert {r["id"] for r in out.collect()} == {1}


def test_no_nested_loop_join(spark):
    probe = spark.createDataFrame([(1, 5.0)], "id long, v double")
    out = range_join(probe, _bands(spark), "v", "lo", "hi", 10.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


# --- skew-aware interval joins (r5 brief #5) -----------------------------


def _planted_events(spark, n_tail=400, hot=400):
    """One hot user carrying ~half the events, spread over hours."""
    from pyspark.sql import functions as F

    tail = spark.range(n_tail).select(
        (F.col("id") % 50 + 1).alias("user_id"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=(F.col("id") * 97) % 86400)).alias("ts"),
        F.col("id").alias("event_id"),
    )
    hot_df = spark.range(hot).select(
        F.lit(999).alias("user_id"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=(F.col("id") * 131) % 86400)).alias("ts"),
        (F.col("id") + 1_000_000).alias("event_id"),
    )
    return tail.unionByName(hot_df)


def test_time_bucketed_interval_join_is_exact(spark):
    """The (key, time-bucket) spread must return EXACTLY the plain
    interval join's rows — every true pair agrees on the right row's
    bucket, and the left's <=2-bucket explode covers it."""
    from streamforge_data_pipeline_spark.operators.joins import batch_interval_join

    ev = _planted_events(spark)
    left = ev.select("user_id", "ts", "event_id")
    right = ev.select("user_id", "ts", "event_id")
    plain = batch_interval_join(
        left, right, "user_id", lower_s=1, upper_s=1800, time_bucketed=False
    )
    spread = batch_interval_join(
        left, right, "user_id", lower_s=1, upper_s=1800, time_bucketed=True
    )
    assert plain.count() > 0
    assert plain.exceptAll(spread).count() == 0
    assert spread.exceptAll(plain).count() == 0


def test_skew_aware_interval_join_routes_by_profile(spark):
    """Profiler loop closed: the hot corpus must route to the
    time-bucketed plan (visible as the __tb equi-key in the physical
    plan); a near-uniform corpus must stay on the plain plan."""
    from streamforge_data_pipeline_spark.operators.joins import (
        skew_aware_interval_join,
    )

    ev = _planted_events(spark)
    left = ev.select("user_id", "ts", "event_id")
    hotplan = skew_aware_interval_join(
        left, left, "user_id", lower_s=1, upper_s=1800, hot_share=0.2
    )._jdf.queryExecution().executedPlan().toString()
    assert "__tb" in hotplan
    uniform = ev.filter("user_id < 900").select("user_id", "ts", "event_id")
    coldplan = skew_aware_interval_join(
        uniform, uniform, "user_id", lower_s=1, upper_s=1800, hot_share=0.2
    )._jdf.queryExecution().executedPlan().toString()
    assert "__tb" not in coldplan


def test_salted_range_join_is_exact(spark):
    """Shuffle-join salt spread: identical rows to the broadcast plan
    even when half the probe lands in one value bucket."""
    from pyspark.sql import functions as F

    from streamforge_data_pipeline_spark.operators.joins import range_join

    probe = spark.range(2000).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 2 == 0, 42.0)
        .otherwise((F.col("id") % 100).cast("double"))
        .alias("value"),
    )
    bands = spark.createDataFrame(
        [("low", 0.0, 40.0), ("mid", 40.0, 60.0), ("high", 60.0, 100.0)],
        "label string, lo double, hi double",
    )
    base = range_join(probe, bands, "value", "lo", "hi", 25.0)
    salted = range_join(
        probe, bands, "value", "lo", "hi", 25.0,
        broadcast_bands=False, salt_buckets=8,
    )
    cols = ["event_id", "label"]
    assert base.select(cols).exceptAll(salted.select(cols)).count() == 0
    assert salted.select(cols).exceptAll(base.select(cols)).count() == 0
