"""JobPool admission semantics (reference AsyncConfig.java:13-21:
bounded pool + bounded queue + rejection) — unit-level with stub
queries, plus one real Structured Streaming handover."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from streamforge_data_pipeline_spark.sources.datagen import generate_intake, write_csv
from streamforge_data_pipeline_spark.sources.store import TableStore
from streamforge_data_pipeline_spark.streaming.ingest_stream import start_stream_ingest
from streamforge_data_pipeline_spark.streaming.job_pool import JobPool
from streamforge_data_pipeline_spark.streaming.status import StatusStore


class StubQuery:
    def __init__(self):
        self.isActive = True

    def stop(self):
        self.isActive = False


def test_n_plus_first_job_queues_then_rejects():
    pool = JobPool(max_concurrent=2, queue_capacity=1)
    status = StatusStore()
    queries = [StubQuery() for _ in range(4)]
    starts = []

    def mk(i):
        def start():
            starts.append(i)
            return queries[i]
        return start

    assert pool.submit("j0", mk(0), status) == "RUNNING"
    assert pool.submit("j1", mk(1), status) == "RUNNING"
    # pool full -> queued (start_fn NOT called yet)
    assert pool.submit("j2", mk(2), status) == "QUEUED"
    assert status.get("j2").step == "QUEUED"
    assert starts == [0, 1]
    # queue full -> rejected
    assert pool.submit("j3", mk(3), status) == "REJECTED"
    assert status.get("j3").step == "REJECTED"
    assert pool.active_count() == 2 and pool.queued_count() == 1


def test_pump_starts_queued_jobs_oldest_first():
    pool = JobPool(max_concurrent=1, queue_capacity=10)
    status = StatusStore()
    q0, q1, q2 = StubQuery(), StubQuery(), StubQuery()
    order = []
    pool.submit("a", lambda: (order.append("a"), q0)[1], status)
    pool.submit("b", lambda: (order.append("b"), q1)[1], status)
    pool.submit("c", lambda: (order.append("c"), q2)[1], status)
    assert order == ["a"] and pool.queued_count() == 2
    assert pool.pump() == 0  # nothing finished yet
    q0.stop()
    assert pool.pump() == 1
    assert order == ["a", "b"]
    q1.stop()
    assert pool.pump() == 1
    assert order == ["a", "b", "c"]
    q2.stop()
    assert pool.active_count() == 0


def test_real_streaming_handover(spark, tmp_path):
    """Two availableNow ingest jobs through a 1-slot pool: the second
    runs only after the first finishes, and both commit their rows."""
    pool = JobPool(max_concurrent=1, queue_capacity=5)
    status = StatusStore()
    jobs = {}
    for name in ("ja", "jb"):
        in_dir = str(tmp_path / f"in_{name}")
        write_csv(generate_intake(spark, 500), in_dir)
        store = TableStore(str(tmp_path / f"store_{name}"))
        ckpt = str(tmp_path / f"ckpt_{name}")
        jobs[name] = (in_dir, store, ckpt)

    def mk(name):
        in_dir, store, ckpt = jobs[name]
        return lambda: start_stream_ingest(spark, in_dir, store, ckpt, name, status)

    assert pool.submit("ja", mk("ja"), status) == "RUNNING"
    assert pool.submit("jb", mk("jb"), status) == "QUEUED"
    pool.query("ja").awaitTermination(120)
    assert pool.pump() == 1
    pool.query("jb").awaitTermination(120)
    pool.pump()
    assert pool.active_count() == 0
    for name in ("ja", "jb"):
        _, store, _ = jobs[name]
        assert store.read(spark, "items").count() == 500
