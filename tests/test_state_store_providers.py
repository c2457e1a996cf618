"""Both applyInPandasWithState operators must run green under BOTH
state-store providers: the default HDFS-backed one the sandbox uses
and the RocksDB provider the stateful docstrings promise for cluster
scale (session.enable_rocksdb_state). Results must be identical and
the RocksDB runs must show the provider actually engaged."""

from __future__ import annotations

import time

import pytest

from streamforge_data_pipeline_spark.session import enable_rocksdb_state
from streamforge_data_pipeline_spark.streaming.stateful import (
    dedup_stream,
    running_user_totals,
)


@pytest.fixture
def provider_toggle(spark, request):
    use_rocksdb = request.param
    enable_rocksdb_state(spark, enabled=use_rocksdb)
    yield use_rocksdb
    enable_rocksdb_state(spark, enabled=False)


def _write(spark, path, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)


def _assert_rocksdb_engaged(query, expect: bool):
    progress = query.lastProgress
    ops = progress.get("stateOperators") or []
    assert ops, "no state operator reported"
    metrics = str(ops[0].get("customMetrics", {}))
    # only the RocksDB provider exposes rocksdb*-prefixed custom
    # metrics; the HDFS provider reports loadedMapCache* instead (both
    # report SnapshotLastUploaded on Spark 4.1, so that is no signal)
    engaged = "rocksdb" in metrics.lower()
    assert engaged == expect, metrics[:300]


@pytest.mark.parametrize("provider_toggle", [False, True],
                         ids=["hdfs", "rocksdb"], indirect=True)
def test_dedup_stream_under_provider(spark, tmp_path, provider_toggle):
    src = str(tmp_path / "src")
    _write(spark, src, [(10, "alpha"), (11, "beta"), (12, "alpha")],
           "doc_id long, text string")
    time.sleep(1.1)
    _write(spark, src, [(20, "alpha"), (21, "gamma")],
           "doc_id long, text string")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = f"provider_dedup_{'rocks' if provider_toggle else 'hdfs'}"
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    _assert_rocksdb_engaged(q, provider_toggle)
    by_id = {r["doc_id"]: r["dup_of"] for r in spark.table(name).collect()}
    # cross-batch state held regardless of provider
    assert by_id == {10: None, 11: None, 12: 10, 20: 10, 21: None}


@pytest.mark.parametrize("provider_toggle", [False, True],
                         ids=["hdfs", "rocksdb"], indirect=True)
def test_running_totals_under_provider(spark, tmp_path, provider_toggle):
    src = str(tmp_path / "src")
    schema = "user_id long, event_id long, value double"
    _write(spark, src, [(1, 100, 2.0), (1, 101, 3.0), (2, 200, 5.0)], schema)
    time.sleep(1.1)
    _write(spark, src, [(1, 102, 4.0)], schema)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = f"provider_totals_{'rocks' if provider_toggle else 'hdfs'}"
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    _assert_rocksdb_engaged(q, provider_toggle)
    final = {}
    for r in spark.table(name).collect():
        final[r["user_id"]] = (r["n_events"], r["total_value"], r["last_event_id"])
    # accumulators crossed the batch boundary under both providers
    assert final[1] == (3, 9.0, 102)
    assert final[2] == (1, 5.0, 200)
