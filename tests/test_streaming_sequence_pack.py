"""Streaming pack accounting (E51's twin, r10): slicing invariance
against the batch pack, replay idempotence of the batch_id-partitioned
journal, and high-water-mark plan pinning (the training-run manifest
read)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamforge_data_pipeline_spark.operators.sampling import sequence_pack
from streamforge_data_pipeline_spark.sources.store import TableStore
from streamforge_data_pipeline_spark.streaming.sequence_pack_stream import (
    ACCT_TABLE,
    _commit_batch,
    read_pack_plan,
    start_stream_sequence_pack,
)

SCHEMA = "doc_id long, text string"
CTX, SHARDS = 32, 4


def _rows(lo, hi):
    return [
        (i, " ".join(f"tok{j}" for j in range((i * 7) % 23 + 1)))
        for i in range(lo, hi)
    ]


def _batch_truth(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return sorted(
        map(tuple, sequence_pack(df, ctx_len=CTX, n_shards=SHARDS).collect())
    )


def _drain(spark, tmp_path, files, max_files=1):
    src = str(tmp_path / "src")
    for rows in files:
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    store = TableStore(str(tmp_path / "store"))
    q = start_stream_sequence_pack(
        spark,
        src,
        store,
        checkpoint_dir=str(tmp_path / "ckpt"),
        schema=SCHEMA,
        n_shards=SHARDS,
        max_files_per_trigger=max_files,
    )
    q.awaitTermination()
    return store


def _view(spark, store, **kw):
    return sorted(
        map(tuple, read_pack_plan(spark, store, ctx_len=CTX, **kw).collect())
    )


def test_slicing_invariance_matches_batch(spark, tmp_path):
    """3-file drain == 1-file drain == the batch pack, row-for-row."""
    rows = _rows(0, 60)
    truth = _batch_truth(spark, rows)
    sliced = _view(
        spark,
        _drain(
            spark,
            tmp_path / "a",
            [rows[:20], rows[20:40], rows[40:]],
        ),
    )
    whole = _view(spark, _drain(spark, tmp_path / "b", [rows], max_files=10))
    assert sliced == truth
    assert whole == truth


def test_replay_idempotent(spark, tmp_path):
    """Redelivering a batch (same batch_id) rewrites its own journal
    partition with identical rows — the plan is unchanged."""
    rows = _rows(0, 40)
    store = _drain(spark, tmp_path, [rows[:25], rows[25:]])
    before = _view(spark, store)
    replay = spark.createDataFrame(rows[:25], SCHEMA)
    _commit_batch(replay, store, SHARDS, "doc_id", "text", batch_id=0)
    assert _view(spark, store) == before
    # journal stays one row per (doc, batch) — no duplicate inflation
    acct = store.read(spark, ACCT_TABLE)
    assert acct.count() == acct.dropDuplicates(["doc_id", "batch_id"]).count()


def test_upto_batch_pins_the_plan(spark, tmp_path):
    """read_pack_plan(upto_batch=B) re-derives the plan over batches
    <= B exactly — equal to the batch pack of those docs — and keeps
    returning it after later batches land (the pinned manifest)."""
    rows = _rows(0, 60)
    store = _drain(spark, tmp_path, [rows[:30], rows[30:]])
    pinned = _view(spark, store, upto_batch=0)
    assert pinned == _batch_truth(spark, rows[:30])
    # new docs appended after the pin do not move it
    _commit_batch(
        spark.createDataFrame(_rows(60, 80), SCHEMA),
        store,
        SHARDS,
        "doc_id",
        "text",
        batch_id=2,
    )
    assert _view(spark, store, upto_batch=0) == pinned
    assert _view(spark, store) == _batch_truth(spark, rows + _rows(60, 80))
