"""Cross-micro-batch streaming exact dedup (applyInPandasWithState):
annotate-don't-drop contract, deterministic within-batch first-wins,
state persistence across batches, and TTL smoke."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from streamforge_data_pipeline_spark.streaming.stateful import dedup_stream


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _drain(spark, src, name, ttl_minutes=None, max_files=1):
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", max_files)
        .parquet(src)
    )
    writer = (
        dedup_stream(stream, ttl_minutes=ttl_minutes)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
    )
    # availableNow + ProcessingTimeTimeout keeps scheduling batches to
    # service future state timeouts and never terminates; Trigger.Once
    # drains exactly the present data for the TTL variant.
    if ttl_minutes is None:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        q = writer.trigger(once=True).start()
        q.awaitTermination(120)
        q.stop()
    return spark.table(name).collect()


def test_dedup_stream_annotates_first_and_duplicates(spark, tmp_path):
    src = str(tmp_path / "src")
    # batch 1 written first (older mtime -> processed first)
    _write_batch(
        spark,
        src,
        [(10, "alpha"), (11, "beta"), (12, "alpha")],  # in-batch dup of 10
    )
    time.sleep(1.1)
    _write_batch(
        spark,
        src,
        [(20, "alpha"), (21, "gamma"), (22, "beta")],  # cross-batch dups
    )

    rows = _drain(spark, src, "dedup_out")
    assert len(rows) == 6  # annotate, never drop
    by_id = {r["doc_id"]: r for r in rows}
    # one winner per distinct content, everyone else points at it
    for content_ids in ([10, 12, 20], [11, 22], [21]):
        winners = [i for i in content_ids if by_id[i]["dup_of"] is None]
        assert len(winners) == 1
        w = winners[0]
        for i in content_ids:
            if i != w:
                assert by_id[i]["dup_of"] == w
    # batch 1's in-batch dup resolves to the LOWEST id (10, not 12),
    # and batch 2's "alpha" arrival must point at a batch-1 id —
    # proof the state crossed the micro-batch boundary.
    assert by_id[12]["dup_of"] == 10
    assert by_id[20]["dup_of"] in (10, 12)
    assert by_id[22]["dup_of"] == 11
    # distinct hashes: 3 contents
    assert len({r["content_hash"] for r in rows}) == 3


def test_dedup_stream_matches_batch_exact_dedup(spark, tmp_path):
    """Filtering dup_of IS NULL reproduces the batch exact-dedup key
    set regardless of how files were split into micro-batches."""
    src = str(tmp_path / "src")
    rows1 = [(i, f"text-{i % 7}") for i in range(0, 20)]
    rows2 = [(i, f"text-{i % 7}") for i in range(20, 40)]
    _write_batch(spark, src, rows1)
    time.sleep(1.1)
    _write_batch(spark, src, rows2)

    got = _drain(spark, src, "dedup_parity")
    kept = {r["doc_id"] for r in got if r["dup_of"] is None}
    batch = spark.read.parquet(src)
    expected = {
        r["doc_id"]
        for r in batch.groupBy(F.sha2(F.col("text").cast("binary"), 256))
        .agg(F.min("doc_id").alias("doc_id"))
        .collect()
    }
    # the stream's winners are first-ARRIVAL; with batch-1 ids below
    # batch-2 ids and in-batch min-id ordering, they coincide with the
    # batch operator's min-id winners.
    assert kept == expected
    assert len(got) == 40


class _FakeState:
    """Minimal GroupState double for unit-testing the update fn."""

    def __init__(self, value=None):
        self._v = value
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None

    def setTimeoutDuration(self, ms):
        pass


def test_dedup_group_spanning_chunks_global_min_wins():
    """applyInPandasWithState delivers one key's batch rows as an
    ITERATOR of pandas chunks (split at arrow.maxRecordsPerBatch).
    The lowest-id-wins contract is over the whole micro-batch, so the
    winner must be the min across ALL chunks — a per-chunk decision
    would crown chunk 1's minimum (50) even though a later chunk holds
    doc 7. Spark gives tests no deterministic control over chunk
    placement, hence the direct-invocation double."""
    import pandas as pd

    from streamforge_data_pipeline_spark.streaming.stateful import (
        _make_dedup_update,
    )

    update = _make_dedup_update(None)
    state = _FakeState()
    chunks = iter(
        [
            pd.DataFrame({"doc_id": [50, 90]}),
            pd.DataFrame({"doc_id": [7, 60]}),  # global min in chunk 2
        ]
    )
    (out,) = list(update(("hash-x",), chunks, state))
    got = dict(zip(out["doc_id"], out["dup_of"]))
    assert got[7] is None or pd.isna(got[7])  # winner is unannotated
    assert all(got[i] == 7 for i in (50, 60, 90))
    assert state.get == (7,)
    # a second batch for the same key defers to the stored winner
    chunks2 = iter([pd.DataFrame({"doc_id": [3]})])
    (out2,) = list(update(("hash-x",), chunks2, state))
    assert list(out2["dup_of"]) == [7]  # state won, even vs a lower id
    assert state.get == (7,)


def test_dedup_stream_ttl_path_runs(spark, tmp_path):
    """TTL smoke: the ProcessingTimeTimeout variant drains green and
    produces the same annotations within a single horizon."""
    src = str(tmp_path / "src")
    _write_batch(spark, src, [(1, "x"), (2, "x"), (3, "y")])
    rows = _drain(spark, src, "dedup_ttl", ttl_minutes=5)
    by_id = {r["doc_id"]: r["dup_of"] for r in rows}
    assert by_id == {1: None, 2: 1, 3: None}


def test_stream_simhash_dedup_cross_batch_probe(spark, tmp_path):
    """SimHash ingestion twin (r7): a batch-2 doc within Hamming<=3 of
    a batch-1 admit must log origin='index' with the indexed id and
    its hamming; the admitted fingerprint index must hold no residual
    pairs within the radius."""
    import time

    from streamforge_data_pipeline_spark.operators.dedup import (
        simhash_near_pairs,
    )
    from streamforge_data_pipeline_spark.sources.store import TableStore
    from streamforge_data_pipeline_spark.streaming.simhash_dedup_stream import (
        start_stream_simhash_dedup,
    )

    base = " ".join(f"tok{i:03d}" for i in range(80))
    near = " ".join(
        ("tok999" if i == 40 else f"tok{i:03d}") for i in range(80)
    )  # one token swapped: few fingerprint bits flip
    src = str(tmp_path / "sh_src")
    spark.createDataFrame(
        [(1, base), (2, "completely different words entirely here")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(
        [(10, near), (11, base)],  # 11 = exact dup of 1; 10 = near
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(src)

    store = TableStore(str(tmp_path / "sh_store"))
    q = start_stream_simhash_dedup(
        spark, src, store,
        checkpoint_dir=str(tmp_path / "sh_ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination()

    log = {r["doc_id"]: r for r in store.read(spark, "simhash_dup_log").collect()}
    assert log[1]["origin"] == "admitted" and log[2]["origin"] == "admitted"
    # in-batch resolution runs FIRST: 10 and 11 are near-dups of each
    # other, so they cluster and min-id 10 is the representative — 11
    # logs 'batch' dup_of 10, and rep 10 probes the index, hitting the
    # batch-1 admit (doc 1). The log resolves transitively
    # (11 -> 10 -> 1), the documented near_dedup_stream contract.
    assert log[11]["origin"] == "batch" and log[11]["dup_of"] == 10
    assert log[10]["origin"] == "index" and log[10]["dup_of"] == 1
    assert log[10]["hamming"] is not None and log[10]["hamming"] <= 3
    # residual check: the admitted index holds no within-radius pairs
    idx = store.read(spark, "simhash_index")
    residual = simhash_near_pairs(idx, "doc_id", max_hamming=3).count()
    assert residual == 0
    assert sorted(
        r["doc_id"] for r in idx.collect()
    ) == [1, 2]
