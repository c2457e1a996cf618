"""Streaming eval-split maintenance (E50's twin, r10): slicing
invariance against the batch rule, monotone demotion (the
contamination-safe direction), and replay idempotence of the
batch_id-partitioned journal."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from streamforge_data_pipeline_spark.operators.sampling import (
    eval_split_assign,
)
from streamforge_data_pipeline_spark.sources.store import TableStore
from streamforge_data_pipeline_spark.streaming.eval_split_stream import (
    _commit_batch,
    read_assignments,
    start_stream_eval_split,
)

SCHEMA = "doc_id long, source string, text string"


def _rows(lo, hi):
    return [
        (i, f"src{i % 3}", f"text body {i}") for i in range(lo, hi)
    ]


def _batch_truth(spark, rows, k_val, k_test):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        (r["doc_id"], r["source"]): r["split"]
        for r in eval_split_assign(
            df, k_val=k_val, k_test=k_test
        ).collect()
    }


def _drain(spark, tmp_path, files, k_val, k_test, max_files=1):
    src = str(tmp_path / "src")
    for i, rows in enumerate(files):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    store = TableStore(str(tmp_path / "store"))
    q = start_stream_eval_split(
        spark,
        src,
        store,
        checkpoint_dir=str(tmp_path / "ckpt"),
        schema=SCHEMA,
        k_val=k_val,
        k_test=k_test,
        max_files_per_trigger=max_files,
    )
    q.awaitTermination()
    return store


def _view(spark, store, k_val, k_test):
    return {
        (r["doc_id"], r["source"]): r["split"]
        for r in read_assignments(
            spark, store, k_val=k_val, k_test=k_test
        ).collect()
    }


def test_slicing_invariance_matches_batch(spark, tmp_path):
    """3-file drain == 1-file drain == the batch window, bit-for-bit
    (ids, strata, splits)."""
    rows = _rows(0, 90)
    truth = _batch_truth(spark, rows, k_val=5, k_test=5)
    sliced = _view(
        spark,
        _drain(
            spark,
            tmp_path / "a",
            [rows[:30], rows[30:50], rows[50:]],
            5,
            5,
        ),
        5,
        5,
    )
    onebatch = _view(
        spark,
        _drain(spark, tmp_path / "b", [rows], 5, 5, max_files=100),
        5,
        5,
    )
    assert sliced == truth
    assert onebatch == truth


def test_assignments_demote_monotonically(spark, tmp_path):
    """The E50 invariant under growth: as batches land, a doc's split
    may only move val -> test -> train (demotion), never back toward
    eval membership — the contamination-safe direction."""
    order = {"val": 0, "test": 1, "train": 2}
    store = TableStore(str(tmp_path / "store"))
    seen: dict = {}
    rows = _rows(0, 120)
    for b, lo in enumerate(range(0, 120, 30)):
        bdf = spark.createDataFrame(rows[lo : lo + 30], SCHEMA)
        _commit_batch(bdf, store, "source", "doc_id", 4, 4, b)
        now = _view(spark, store, 4, 4)
        for key, split in now.items():
            if key in seen:
                assert order[split] >= order[seen[key]], (key, seen[key], split)
        seen = now
    assert seen == _batch_truth(spark, rows, 4, 4)


def test_replay_idempotence(spark, tmp_path):
    """Re-committing a batch (at-least-once redelivery) rewrites its
    own batch_id partitions with identical rows — the drained view is
    unchanged."""
    store = TableStore(str(tmp_path / "store"))
    rows = _rows(0, 60)
    b0 = spark.createDataFrame(rows[:30], SCHEMA)
    b1 = spark.createDataFrame(rows[30:], SCHEMA)
    _commit_batch(b0, store, "source", "doc_id", 4, 4, 0)
    _commit_batch(b1, store, "source", "doc_id", 4, 4, 1)
    before = _view(spark, store, 4, 4)
    _commit_batch(b1, store, "source", "doc_id", 4, 4, 1)  # replay
    assert _view(spark, store, 4, 4) == before
    assert before == _batch_truth(spark, rows, 4, 4)
