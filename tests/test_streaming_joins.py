"""Streaming dedup and stream-stream interval join match their batch
equivalents after the stream drains (availableNow trigger)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamforge_data_pipeline_spark.session import load
from streamforge_data_pipeline_spark.streaming.joins_stream import (
    interval_join,
    streaming_dedup,
)

from tests.conftest import SF_SMALL


def _drain(df, name: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_streaming_dedup_matches_batch_distinct(spark, tmp_path):
    src = str(tmp_path / "dup_events")
    ev = load(spark, SF_SMALL, "events").select("event_id", "ts", "user_id")
    # inject duplicates: every event twice
    ev.union(ev).write.mode("overwrite").parquet(src)
    batch = spark.read.parquet(src)

    stream = spark.readStream.schema(batch.schema).parquet(src)
    _drain(streaming_dedup(stream, ["event_id"]), "dedup_out")

    got = spark.table("dedup_out")
    assert got.count() == ev.count()
    assert got.select("event_id").distinct().count() == ev.count()


def test_interval_join_matches_batch(spark, tmp_path):
    ev = load(spark, SF_SMALL, "events").select("event_id", "ts", "user_id")
    left_b = ev.filter(F.col("event_id") % 2 == 0).limit(2000)
    right_b = ev.filter(F.col("event_id") % 2 == 1).limit(2000)
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    left_b.write.mode("overwrite").parquet(lsrc)
    right_b.write.mode("overwrite").parquet(rsrc)
    lb, rb = spark.read.parquet(lsrc), spark.read.parquet(rsrc)

    expected = {
        (r["l_id"], r["r_id"])
        for r in lb.alias("l")
        .join(
            rb.alias("r"),
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("r.ts") >= F.col("l.ts"))
            & (F.col("r.ts") <= F.col("l.ts") + F.expr("INTERVAL 15 minutes")),
        )
        .select(F.col("l.event_id").alias("l_id"), F.col("r.event_id").alias("r_id"))
        .collect()
    }

    ls = spark.readStream.schema(lb.schema).parquet(lsrc)
    rs = spark.readStream.schema(rb.schema).parquet(rsrc)
    joined = interval_join(ls, rs, "user_id").select(
        F.col("l.event_id").alias("l_id"), F.col("r.event_id").alias("r_id")
    )
    _drain(joined, "ij_out")
    got = {(r["l_id"], r["r_id"]) for r in spark.table("ij_out").collect()}
    assert got == expected and expected


def test_stream_static_enrichment_matches_batch(spark, tmp_path):
    from streamforge_data_pipeline_spark.streaming.joins_stream import enrich_stream

    src = str(tmp_path / "enrich_events")
    ev = load(spark, SF_SMALL, "events").select("event_id", "user_id", "event_type")
    ev.write.mode("overwrite").parquet(src)
    batch = spark.read.parquet(src)
    # static dim: per-user tier derived deterministically
    dim = (
        batch.select("user_id").distinct()
        .withColumn("tier", F.when(F.col("user_id") % 3 == 0, "gold").otherwise("std"))
    )

    expected = {
        (r["event_id"], r["tier"])
        for r in batch.join(dim, "user_id", "left").collect()
    }

    stream = spark.readStream.schema(batch.schema).parquet(src)
    _drain(enrich_stream(stream, dim, "user_id"), "enrich_out")
    got = {(r["event_id"], r["tier"]) for r in spark.table("enrich_out").collect()}
    assert got == expected and got


def test_interval_join_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    """Outer-mode semantics: an unmatched left row emits null-padded
    only once the watermark (max event time - delay) has passed its
    whole join window; younger unmatched rows stay buffered and never
    surface in the drain. Matched rows emit regardless."""
    from datetime import datetime

    def ts(s):
        return datetime.fromisoformat("2024-03-01 " + s)

    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    schema = "event_id long, ts timestamp, user_id long"
    spark.createDataFrame(
        [
            (1, ts("01:00:00"), 10),  # matched by right event 100
            (2, ts("01:00:00"), 20),  # unmatched; window end 01:15 < watermark
            (3, ts("05:00:00"), 90),  # watermark pusher; too young to flush
        ],
        schema,
    ).write.parquet(lsrc)
    spark.createDataFrame(
        [
            (100, ts("01:05:00"), 10),
            (200, ts("05:00:00"), 80),  # right-side watermark pusher
        ],
        schema,
    ).write.parquet(rsrc)
    lb = spark.readStream.schema(schema).parquet(lsrc)
    rb = spark.readStream.schema(schema).parquet(rsrc)

    out = interval_join(lb, rb, key="user_id", how="leftOuter").select(
        F.col("l.event_id").alias("l_id"), F.col("r.event_id").alias("r_id")
    )
    _drain(out, "lo_join_out")
    got = {(r["l_id"], r["r_id"]) for r in spark.table("lo_join_out").collect()}
    # watermark after the data batch: 05:00 - 30min = 04:30 -> row 2's
    # window [01:00, 01:15] is closed (emits null-padded); row 3's
    # window reaches 05:15 > 04:30 (stays buffered, absent).
    assert got == {(1, 100), (2, None)}, got


def test_interval_join_inner_never_emits_unmatched(spark, tmp_path):
    """Same corpus through the default inner mode: only the match."""
    from datetime import datetime

    def ts(s):
        return datetime.fromisoformat("2024-03-01 " + s)

    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    schema = "event_id long, ts timestamp, user_id long"
    spark.createDataFrame(
        [(1, ts("01:00:00"), 10), (2, ts("01:00:00"), 20)], schema
    ).write.parquet(lsrc)
    spark.createDataFrame([(100, ts("01:05:00"), 10)], schema).write.parquet(rsrc)
    lb = spark.readStream.schema(schema).parquet(lsrc)
    rb = spark.readStream.schema(schema).parquet(rsrc)
    out = interval_join(lb, rb, key="user_id").select(
        F.col("l.event_id").alias("l_id"), F.col("r.event_id").alias("r_id")
    )
    _drain(out, "in_join_out")
    got = {(r["l_id"], r["r_id"]) for r in spark.table("in_join_out").collect()}
    assert got == {(1, 100)}, got


def test_interval_join_spread_matches_plain(spark, tmp_path):
    """The (key, time-bucket) state spread returns EXACTLY the plain
    stream-stream interval join's pairs after a drain (r5 brief #5)."""
    from streamforge_data_pipeline_spark.streaming.joins_stream import (
        interval_join_spread,
    )

    ev = load(spark, SF_SMALL, "events").select("event_id", "ts", "user_id")
    # plant a hot key: clone a quarter of the events onto one user
    hot = ev.filter(F.col("event_id") % 4 == 0).withColumn(
        "user_id", F.lit(999_999)
    ).withColumn("event_id", F.col("event_id") + 10_000_000)
    both = ev.unionByName(hot)
    left_b = both.filter(F.col("event_id") % 2 == 0).limit(3000)
    right_b = both.filter(F.col("event_id") % 2 == 1).limit(3000)
    lsrc, rsrc = str(tmp_path / "ls"), str(tmp_path / "rs")
    left_b.write.mode("overwrite").parquet(lsrc)
    right_b.write.mode("overwrite").parquet(rsrc)
    lb, rb = spark.read.parquet(lsrc), spark.read.parquet(rsrc)

    expected = {
        (r["l_id"], r["r_id"])
        for r in lb.alias("l")
        .join(
            rb.alias("r"),
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("r.ts") >= F.col("l.ts"))
            & (F.col("r.ts") <= F.col("l.ts") + F.expr("INTERVAL 15 minutes")),
        )
        .select(F.col("l.event_id").alias("l_id"), F.col("r.event_id").alias("r_id"))
        .collect()
    }

    ls = spark.readStream.schema(lb.schema).parquet(lsrc)
    rs = spark.readStream.schema(rb.schema).parquet(rsrc)
    joined = interval_join_spread(
        ls, rs, "user_id", lower="0 seconds", upper="15 minutes",
        delay="10 days",
    )
    out = joined.select(
        ls["event_id"].alias("l_id"), rs["event_id"].alias("r_id")
    )
    _drain(out, "spread_out")
    got = {(r["l_id"], r["r_id"]) for r in spark.table("spread_out").collect()}
    assert got == expected and expected


def test_interval_join_spread_rejects_narrow_bucket(spark):
    """r6 advice: a spread bucket narrower than the interval span leaves
    true matches in interior buckets with no left copy — must raise, not
    silently drop rows."""
    import pytest

    from streamforge_data_pipeline_spark.streaming.joins_stream import (
        interval_join_spread,
    )

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")], "k long, ts string"
    )
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:05:00")], "k long, ts string"
    )
    with pytest.raises(ValueError, match="narrower than the interval span"):
        interval_join_spread(
            left, right, "k", lower="0 seconds", upper="15 minutes",
            spread_seconds=60,
        )


def test_drain_spread_outer_parity_with_native(spark, tmp_path):
    """r6 brief #6: the drain-time outer composition over the spread
    plan (spread-inner ∪ watermark-final null-pads) must equal the
    NATIVE outer interval join on the same time-sliced sources, for
    all three outer modes."""
    import time
    from datetime import datetime

    from streamforge_data_pipeline_spark.streaming.joins_stream import (
        drain_interval_join_spread,
        interval_join,
    )

    def ts(s):
        return datetime.fromisoformat("2024-03-01 " + s)

    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    lschema = "l_id long, ts timestamp, user_id long"
    rschema = "r_id long, ts timestamp, user_id long"
    # slice 1
    spark.createDataFrame(
        [(1, ts("01:00:00"), 10), (2, ts("01:00:00"), 20)], lschema
    ).write.mode("append").parquet(lsrc)
    spark.createDataFrame(
        [(100, ts("01:05:00"), 10), (150, ts("01:20:00"), 55)], rschema
    ).write.mode("append").parquet(rsrc)
    time.sleep(1.1)
    # slice 2: watermark pushers + a young unmatched row on each side
    spark.createDataFrame(
        [(3, ts("05:00:00"), 90)], lschema
    ).write.mode("append").parquet(lsrc)
    spark.createDataFrame(
        [(200, ts("05:00:00"), 80)], rschema
    ).write.mode("append").parquet(rsrc)

    for how in ("leftOuter", "rightOuter", "fullOuter"):
        lb = spark.readStream.schema(lschema).parquet(lsrc)
        rb = spark.readStream.schema(rschema).parquet(rsrc)
        native = interval_join(lb, rb, key="user_id", how=how).select(
            F.col("l.l_id").alias("l_id"), F.col("r.r_id").alias("r_id")
        )
        name = f"native_{how.lower()}"
        _drain(native, name)
        want = {
            (r["l_id"], r["r_id"]) for r in spark.table(name).collect()
        }

        got_df = drain_interval_join_spread(
            spark,
            spark.readStream.schema(lschema).parquet(lsrc),
            spark.readStream.schema(rschema).parquet(rsrc),
            spark.read.schema(lschema).parquet(lsrc),
            spark.read.schema(rschema).parquet(rsrc),
            key="user_id",
            how=how,
        )
        got = {(r["l_id"], r["r_id"]) for r in got_df.collect()}
        assert got == want, (how, got, want)
        assert got, how
