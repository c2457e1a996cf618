"""Streaming SCD2 maintenance: CDC batches applied sequentially keep
exact history; streaming session windows match the batch operator."""

from __future__ import annotations

import os
from datetime import datetime

from streamforge_data_pipeline_spark.operators.windows import session_counts
from streamforge_data_pipeline_spark.session import load
from streamforge_data_pipeline_spark.streaming.scd2_stream import (
    read_current,
    start_scd2_maintenance,
)

from tests.conftest import SF_SMALL

T1 = datetime(2021, 1, 1)
T2 = datetime(2021, 6, 1)


def _run_batch(spark, src, store, ckpt):
    stream = spark.readStream.schema(
        "k LONG, seg STRING, bal DOUBLE, eff_ts TIMESTAMP"
    ).parquet(src)
    q = start_scd2_maintenance(
        stream, store_root=store, checkpoint=ckpt,
        key="k", attrs=["seg", "bal"],
    )
    q.awaitTermination()


def test_streaming_scd2_two_batches(spark, tmp_path):
    src = str(tmp_path / "updates")
    store = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: insert A and B (B twice in one batch -> latest wins)
    spark.createDataFrame(
        [(1, "A", 10.0, T1), (2, "B", 5.0, T1),
         (2, "B", 20.0, datetime(2021, 2, 1))],
        "k long, seg string, bal double, eff_ts timestamp",
    ).write.mode("overwrite").parquet(src)
    _run_batch(spark, src, store, ckpt)

    snap1 = {(r["k"], r["is_current"]): r for r in read_current(spark, store).collect()}
    assert len(snap1) == 2
    assert snap1[(2, True)]["bal"] == 20.0  # in-batch CDC compaction

    # batch 2 (new file): change A, no-op B, insert C
    spark.createDataFrame(
        [(1, "A", 11.0, T2), (2, "B", 20.0, T2), (3, "C", 7.0, T2)],
        "k long, seg string, bal double, eff_ts timestamp",
    ).write.mode("append").parquet(src)
    _run_batch(spark, src, store, ckpt)

    snap2 = {(r["k"], r["is_current"]): r for r in read_current(spark, store).collect()}
    assert len(snap2) == 4
    assert snap2[(1, False)]["valid_to"] == T2 and snap2[(1, False)]["bal"] == 10.0
    assert snap2[(1, True)]["bal"] == 11.0
    assert snap2[(2, True)]["bal"] == 20.0 and snap2[(2, True)]["valid_to"] is None
    assert snap2[(3, True)]["bal"] == 7.0
    # versioned snapshots double as time travel (v=0 is the reserved
    # seed slot; batch N commits v=N+1)
    assert sorted(d for d in os.listdir(store) if d.startswith("v=")) == ["v=1", "v=2"]

    # batch 3: change A AGAIN — its closed history row must pass through
    # untouched (not re-match the update on key), and exactly one open
    # row must exist per key afterwards.
    T3 = datetime(2022, 1, 1)
    spark.createDataFrame(
        [(1, "A", 12.0, T3)],
        "k long, seg string, bal double, eff_ts timestamp",
    ).write.mode("append").parquet(src)
    _run_batch(spark, src, store, ckpt)

    rows3 = read_current(spark, store).collect()
    open_rows = [r for r in rows3 if r["is_current"]]
    assert sorted(r["k"] for r in open_rows) == [1, 2, 3]  # exactly one open per key
    a_hist = sorted(
        (r for r in rows3 if r["k"] == 1 and not r["is_current"]),
        key=lambda r: r["valid_from"],
    )
    assert [(r["bal"], r["valid_to"]) for r in a_hist] == [(10.0, T2), (11.0, T3)]
    a_open = [r for r in open_rows if r["k"] == 1]
    assert len(a_open) == 1 and a_open[0]["bal"] == 12.0
    assert len(rows3) == 5  # 3 open + 2 history rows for A, none for B/C


def test_read_current_skips_torn_snapshot(spark, tmp_path):
    from streamforge_data_pipeline_spark.streaming.scd2_stream import (
        vacuum_snapshots,
    )

    store = str(tmp_path / "dim")
    spark.createDataFrame([(1,)], "k long").write.parquet(
        os.path.join(store, "v=0")
    )
    # simulate a crash mid-write of v=1: data files but no _SUCCESS
    spark.createDataFrame([(2,)], "k long").write.parquet(
        os.path.join(store, "v=1")
    )
    os.remove(os.path.join(store, "v=1", "_SUCCESS"))
    # torn snapshot is invisible to readers (and to a recovering writer)
    assert read_current(spark, store).collect()[0]["k"] == 1
    # vacuum removes the partial even when it's newer than the current
    assert vacuum_snapshots(store, keep=3) == [1]
    assert sorted(os.listdir(store)) == ["v=0"]


def test_stream_session_window_matches_batch(spark, tmp_path):
    from streamforge_data_pipeline_spark.streaming.event_time import (
        as_event_time,
        watermarked,
    )

    src = str(tmp_path / "events_src")
    load(spark, SF_SMALL, "events").write.mode("overwrite").parquet(src)
    batch_df = spark.read.parquet(src)
    key = lambda r: (r["user_id"], str(r["session_start"]), r["n_events"])
    expected = {key(r) for r in session_counts(as_event_time(batch_df, "ts")).collect()}
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
    got = {key(r) for r in spark.table("session_out").collect()}
    assert got == expected


def test_vacuum_keeps_newest_versions(spark, tmp_path):
    import os

    from streamforge_data_pipeline_spark.streaming.scd2_stream import (
        vacuum_snapshots,
    )

    store = str(tmp_path / "dim")
    for v in range(5):
        spark.createDataFrame([(v,)], "k long").write.parquet(
            os.path.join(store, f"v={v}")
        )
    dropped = vacuum_snapshots(store, keep=2)
    assert dropped == [0, 1, 2]
    assert sorted(os.listdir(store)) == ["v=3", "v=4"]
    assert read_current(spark, store).collect()[0]["k"] == 4
    # keep clamps to 1: never drops the current snapshot
    assert vacuum_snapshots(store, keep=0) == [3]
    assert read_current(spark, store).collect()[0]["k"] == 4

def test_seeded_bootstrap_then_stream(spark, tmp_path):
    """CDC onboarding: a pre-existing dimension seeds v=0; the first
    streamed batch merges against it (not against None) and commits
    v=1. Seeding a non-empty store must refuse."""
    import pytest

    from streamforge_data_pipeline_spark.streaming.scd2_stream import (
        seed_snapshot,
    )

    src = str(tmp_path / "updates")
    store = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ckpt")

    initial = spark.createDataFrame(
        [(1, "A", 10.0, T1, None, True), (2, "B", 5.0, T1, None, True)],
        "k long, seg string, bal double, valid_from timestamp,"
        " valid_to timestamp, is_current boolean",
    )
    seed_snapshot(initial, store)
    with pytest.raises(ValueError):
        seed_snapshot(initial, store)

    spark.createDataFrame(
        [(1, "A", 11.0, T2), (3, "C", 7.0, T2)],
        "k long, seg string, bal double, eff_ts timestamp",
    ).write.mode("overwrite").parquet(src)
    _run_batch(spark, src, store, ckpt)

    snap = {(r["k"], r["is_current"]): r for r in read_current(spark, store).collect()}
    assert snap[(1, False)]["bal"] == 10.0 and snap[(1, False)]["valid_to"] == T2
    assert snap[(1, True)]["bal"] == 11.0
    assert snap[(2, True)]["bal"] == 5.0 and snap[(2, True)]["valid_to"] is None
    assert snap[(3, True)]["bal"] == 7.0
    assert sorted(d for d in os.listdir(store) if d.startswith("v=")) == ["v=0", "v=1"]
