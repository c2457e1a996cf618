"""Streaming ANALYZE (E49's twin, r10): slicing invariance against the
batch column_stats (all columns: sums, exact ndv via the value log,
monotone presentation transforms deferred to read), and replay
idempotence of the batch_id-partitioned journal."""

from __future__ import annotations

import datetime

from streamforge_data_pipeline_spark.operators.aggregates import column_stats
from streamforge_data_pipeline_spark.sources.store import TableStore
from streamforge_data_pipeline_spark.streaming.column_stats_stream import (
    _commit_batch,
    read_column_stats,
    start_stream_column_stats,
)

SCHEMA = "id long, ts timestamp_ntz, kind string, value double"


def _rows(lo, hi):
    base = datetime.datetime(2024, 3, 1, 10, 0, 0)
    out = []
    for i in range(lo, hi):
        out.append(
            (
                i,
                base + datetime.timedelta(hours=i * 7 % 200),
                None if i % 7 == 0 else f"k{i % 5}",
                None if i % 11 == 0 else round(i * 0.3125, 4),
            )
        )
    return out


def _stats_map(df):
    return {
        r["column"]: (
            r["n_rows"], r["n_nulls"], r["null_frac"], r["ndv"],
            r["min_num"], r["max_num"], r["min_str"], r["max_str"],
        )
        for r in df.collect()
    }


def test_slicing_invariance_matches_batch(spark, tmp_path):
    rows = _rows(0, 90)
    truth = _stats_map(column_stats(spark.createDataFrame(rows, SCHEMA)))

    src = str(tmp_path / "src")
    for chunk in (rows[:25], rows[25:60], rows[60:]):
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    store = TableStore(str(tmp_path / "store"))
    q = start_stream_column_stats(
        spark,
        src,
        store,
        checkpoint_dir=str(tmp_path / "ckpt"),
        schema=SCHEMA,
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    assert _stats_map(read_column_stats(spark, store)) == truth


def test_replay_idempotence(spark, tmp_path):
    rows = _rows(0, 60)
    store = TableStore(str(tmp_path / "store"))
    b0 = spark.createDataFrame(rows[:30], SCHEMA)
    b1 = spark.createDataFrame(rows[30:], SCHEMA)
    _commit_batch(b0, store, 0)
    _commit_batch(b1, store, 1)
    before = _stats_map(read_column_stats(spark, store))
    _commit_batch(b1, store, 1)  # at-least-once redelivery
    assert _stats_map(read_column_stats(spark, store)) == before
    truth = _stats_map(column_stats(spark.createDataFrame(rows, SCHEMA)))
    assert before == truth
