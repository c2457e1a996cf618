"""Streaming depth: (1) event-time tumbling + sliding windows over a
stream match the batch operators bit-for-bit; (2) applyInPandasWithState
keyed accumulators match batch aggregation after the stream drains.

Streams are watermarked via streaming.event_time.watermarked, which
coerces the parquet TIMESTAMP_NTZ event column to LTZ before
``withWatermark`` (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE otherwise); the
batch side is normalized with the same ``as_event_time`` call so both
plans aggregate the identical column type."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamforge_data_pipeline_spark.operators.windows import (
    sliding_counts,
    tumbling_counts,
)
from streamforge_data_pipeline_spark.session import load
from streamforge_data_pipeline_spark.streaming.event_time import (
    as_event_time,
    watermarked,
)
from streamforge_data_pipeline_spark.streaming.stateful import running_user_totals

from tests.conftest import SF_SMALL


def _stage_events(spark, tmp_path):
    src = str(tmp_path / "events_src")
    load(spark, SF_SMALL, "events").write.mode("overwrite").parquet(src)
    return src


def test_stream_tumbling_window_matches_batch(spark, tmp_path):
    src = _stage_events(spark, tmp_path)
    batch_df = spark.read.parquet(src)
    expected = {
        (str(r["window_start"]), r["event_type"], r["n"], r["sum_value"])
        for r in tumbling_counts(as_event_time(batch_df, "ts")).collect()
    }
    assert expected

    stream = watermarked(
        spark.readStream.schema(batch_df.schema).parquet(src), "ts", "10 minutes"
    )
    q = (
        tumbling_counts(stream)
        .writeStream.format("memory")
        .queryName("tumbling_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (str(r["window_start"]), r["event_type"], r["n"], r["sum_value"])
        for r in spark.table("tumbling_out").collect()
    }
    assert got == expected


def test_stream_sliding_window_matches_batch(spark, tmp_path):
    src = _stage_events(spark, tmp_path)
    batch_df = spark.read.parquet(src)
    expected = {
        (str(r["window_start"]), r["n"])
        for r in sliding_counts(as_event_time(batch_df, "ts")).collect()
    }
    assert expected

    stream = watermarked(
        spark.readStream.schema(batch_df.schema).parquet(src), "ts", "10 minutes"
    )
    q = (
        sliding_counts(stream)
        .writeStream.format("memory")
        .queryName("sliding_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (str(r["window_start"]), r["n"])
        for r in spark.table("sliding_out").collect()
    }
    assert got == expected


def test_stateful_running_totals_match_batch(spark, tmp_path):
    src = _stage_events(spark, tmp_path)
    batch_df = spark.read.parquet(src)
    expected = {
        (r["user_id"], r["n_events"], r["last_event_id"])
        for r in batch_df.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("event_id").alias("last_event_id"),
        )
        .collect()
    }

    stream = spark.readStream.schema(batch_df.schema).parquet(src)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("running_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # last emitted row per user is the final accumulator
    final = (
        spark.table("running_out")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("last_event_id").alias("last_event_id"),
        )
    )
    got = {
        (r["user_id"], r["n_events"], r["last_event_id"]) for r in final.collect()
    }
    assert got == expected


def test_stream_session_window_matches_batch(spark, tmp_path):
    """Session windows are the genuinely STATEFUL window (gap-merge
    needs cross-batch state); the streamed drain must agree with the
    batch gap-merge exactly."""
    from streamforge_data_pipeline_spark.operators.windows import session_counts

    src = _stage_events(spark, tmp_path)
    batch_df = spark.read.parquet(src)
    expected = {
        (r["user_id"], str(r["session_start"]), str(r["last_event"]), r["n_events"])
        for r in session_counts(as_event_time(batch_df, "ts")).collect()
    }
    assert expected

    stream = watermarked(
        spark.readStream.schema(batch_df.schema).parquet(src), "ts", "10 minutes"
    )
    q = (
        session_counts(stream)
        .writeStream.format("memory")
        .queryName("session_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], str(r["session_start"]), str(r["last_event"]), r["n_events"])
        for r in spark.table("session_out").collect()
    }
    assert got == expected


def test_stream_session_window_merges_across_batches(spark, tmp_path):
    """Split the source into TIME-CONTIGUOUS slices at one file per
    trigger so sessions ARRIVE in pieces — the state store must merge
    fragments across micro-batches into the same sessions the batch
    plan sees. Slices must be time-ordered (random file order makes
    events arbitrarily late and the watermark rightly drops them —
    that's the semantics under test in test_streaming_late_data, not
    here); mtimes are forced increasing because the file source
    processes in modification-time order."""
    import os
    import time

    from pyspark.sql import Window as W

    from streamforge_data_pipeline_spark.operators.windows import session_counts

    src = str(tmp_path / "events_many")
    ev = load(spark, SF_SMALL, "events")
    sliced = ev.withColumn(
        "__slice", F.ntile(8).over(W.orderBy("ts"))
    )
    base = time.time() - 1000
    for i in range(1, 9):
        part = str(tmp_path / f"slice_{i}")
        sliced.filter(F.col("__slice") == i).drop("__slice").coalesce(
            1
        ).write.mode("overwrite").parquet(part)
        os.makedirs(src, exist_ok=True)
        for fn in os.listdir(part):
            if fn.endswith(".parquet"):
                dst = os.path.join(src, f"{i:02d}.parquet")
                os.rename(os.path.join(part, fn), dst)
                os.utime(dst, (base + i, base + i))
    batch_df = spark.read.parquet(src)
    expected = {
        (r["user_id"], str(r["session_start"]), str(r["last_event"]), r["n_events"])
        for r in session_counts(as_event_time(batch_df, "ts")).collect()
    }

    stream = watermarked(
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        "ts",
        "10 minutes",
    )
    q = (
        session_counts(stream)
        .writeStream.format("memory")
        .queryName("session_merge_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], str(r["session_start"]), str(r["last_event"]), r["n_events"])
        for r in spark.table("session_merge_out").collect()
    }
    assert got == expected
