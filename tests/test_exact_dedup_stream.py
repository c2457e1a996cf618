"""foreachBatch all-JVM exact dedup ingestion (streaming/
exact_dedup_stream): contract parity with the applyInPandasWithState
op, first-ARRIVAL-wins across batches, idempotent re-runs."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from streamforge_data_pipeline_spark.sources.store import TableStore
from streamforge_data_pipeline_spark.streaming.exact_dedup_stream import (
    _resolve_batch,
    start_stream_exact_dedup,
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _drain(spark, src, tmp_path, tag, max_files=1):
    store = TableStore(str(tmp_path / f"store_{tag}"))
    q = start_stream_exact_dedup(
        spark,
        src,
        store,
        checkpoint_dir=str(tmp_path / f"ckpt_{tag}"),
        max_files_per_trigger=max_files,
    )
    q.awaitTermination()
    return store


def test_exact_dedup_stream_annotates_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batch(spark, src, [(10, "alpha"), (11, "beta"), (12, "alpha")])
    time.sleep(1.1)
    # doc 5 has a LOWER id than batch-1's winner but arrives later:
    # first-ARRIVAL-wins means it must point at 10, not claim the hash
    _write_batch(spark, src, [(5, "alpha"), (21, "gamma")])

    store = _drain(spark, src, tmp_path, "basic")
    rows = store.read(spark, "exact_dedup_log").collect()
    assert len(rows) == 5  # annotate, never drop
    by_id = {r["doc_id"]: r["dup_of"] for r in rows}
    assert by_id == {10: None, 11: None, 12: 10, 5: 10, 21: None}
    # index holds one row per distinct content
    idx = {r["content_hash"]: r["first_id"]
           for r in store.read(spark, "hash_index").collect()}
    assert len(idx) == 3 and set(idx.values()) == {10, 11, 21}


def test_exact_dedup_stream_matches_state_op_and_batch(spark, tmp_path):
    """Same corpus through (a) this engine, (b) the applyInPandasWithState
    op, (c) the batch exact-dedup aggregate — identical keep sets."""
    from streamforge_data_pipeline_spark.streaming.stateful import dedup_stream

    src = str(tmp_path / "src")
    rows1 = [(i, f"text-{i % 7}") for i in range(0, 20)]
    rows2 = [(i, f"text-{i % 7}") for i in range(20, 40)]
    _write_batch(spark, src, rows1)
    time.sleep(1.1)
    _write_batch(spark, src, rows2)

    store = _drain(spark, src, tmp_path, "parity")
    jvm = {
        (r["doc_id"], r["dup_of"])
        for r in store.read(spark, "exact_dedup_log").collect()
    }

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("state_op_parity")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    state = {
        (r["doc_id"], r["dup_of"])
        for r in spark.table("state_op_parity").collect()
    }
    assert jvm == state

    batch = spark.read.parquet(src)
    expected_kept = {
        r["doc_id"]
        for r in batch.groupBy(F.sha2(F.col("text").cast("binary"), 256))
        .agg(F.min("doc_id").alias("doc_id"))
        .collect()
    }
    assert {d for d, dup in jvm if dup is None} == expected_kept


def test_exact_dedup_stream_rerun_is_idempotent(spark, tmp_path):
    """Re-delivering an already-decided batch (at-least-once) must not
    duplicate log rows, steal winners, or grow the index."""
    store = TableStore(str(tmp_path / "store_idem"))
    batch = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], "doc_id long, text string"
    )
    _resolve_batch(spark, batch, store, "hash_index", "exact_dedup_log",
                   "doc_id", "text")
    first = sorted(
        (r["doc_id"], r["dup_of"])
        for r in store.read(spark, "exact_dedup_log").collect()
    )
    _resolve_batch(spark, batch, store, "hash_index", "exact_dedup_log",
                   "doc_id", "text")
    again = sorted(
        (r["doc_id"], r["dup_of"])
        for r in store.read(spark, "exact_dedup_log").collect()
    )
    assert first == again == [(1, None), (2, 1), (3, None)]
    assert store.read(spark, "hash_index").count() == 2


def test_exact_dedup_stream_no_python_in_batch_plan(spark, tmp_path):
    """The per-batch resolution must be pure JVM — that is the point of
    this engine. Build the same batch plan the foreachBatch commit runs
    and assert no Python eval node."""
    store = TableStore(str(tmp_path / "store_plan"))
    batch = spark.createDataFrame([(1, "a"), (2, "a")], "doc_id long, text string")
    _resolve_batch(spark, batch, store, "hash_index", "exact_dedup_log",
                   "doc_id", "text")
    # the second-batch shape (index now exists) is the steady state
    hashed = spark.createDataFrame(
        [(3, "a"), (4, "b")], "doc_id long, text string"
    ).select(
        F.col("doc_id"),
        F.sha2(F.col("text").cast("binary"), 256).alias("content_hash"),
    )
    idx = store.read(spark, "hash_index")
    plan = (
        hashed.groupBy("content_hash")
        .agg(F.min("doc_id").alias("batch_first"))
        .join(idx, "content_hash", "left")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_exact_dedup_stream_crash_between_appends_recovers(spark, tmp_path):
    """Index-first commit: simulate a crash AFTER the index append but
    BEFORE the log append by deleting the log and re-running the
    batch. The replay must re-derive byte-identical annotations from
    the index (first-arrival ids unchanged), append the log exactly
    once, and not grow the index."""
    import shutil

    store = TableStore(str(tmp_path / "store_crash"))
    batch = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], "doc_id long, text string"
    )
    _resolve_batch(spark, batch, store, "hash_index", "exact_dedup_log",
                   "doc_id", "text")
    expected = sorted(
        (r["doc_id"], r["dup_of"])
        for r in store.read(spark, "exact_dedup_log").collect()
    )
    # crash window: log never happened, index did
    shutil.rmtree(store.path("exact_dedup_log"))
    _resolve_batch(spark, batch, store, "hash_index", "exact_dedup_log",
                   "doc_id", "text")
    replayed = sorted(
        (r["doc_id"], r["dup_of"])
        for r in store.read(spark, "exact_dedup_log").collect()
    )
    assert replayed == expected == [(1, None), (2, 1), (3, None)]
    assert store.read(spark, "hash_index").count() == 2


def test_exact_dedup_stream_batch_id_marker_gates_guard(spark, tmp_path):
    """With monotonically increasing batch_ids IN ONE RUN the replay
    guard is skipped (fresh batches) yet a re-delivered batch_id still
    takes the guarded path and stays idempotent — and a DIFFERENT
    run_id over the same store must re-enable the guard (batch ids are
    not comparable across checkpoint lineages)."""
    store = TableStore(str(tmp_path / "store_marker"))
    b0 = spark.createDataFrame([(1, "x"), (2, "x")], "doc_id long, text string")
    b1 = spark.createDataFrame([(3, "x"), (4, "z")], "doc_id long, text string")
    _resolve_batch(spark, b0, store, "hash_index", "exact_dedup_log",
                   "doc_id", "text", batch_id=0, run_id="runA")
    _resolve_batch(spark, b1, store, "hash_index", "exact_dedup_log",
                   "doc_id", "text", batch_id=1, run_id="runA")
    once = sorted(
        (r["doc_id"], r["dup_of"])
        for r in store.read(spark, "exact_dedup_log").collect()
    )
    assert once == [(1, None), (2, 1), (3, 1), (4, None)]
    # at-least-once redelivery of batch 1 (same run): marker says
    # replay -> guard
    _resolve_batch(spark, b1, store, "hash_index", "exact_dedup_log",
                   "doc_id", "text", batch_id=1, run_id="runA")
    # fresh run over the same store with RESET batch ids: guard must
    # still drop everything already decided
    _resolve_batch(spark, b0, store, "hash_index", "exact_dedup_log",
                   "doc_id", "text", batch_id=0, run_id="runB")
    _resolve_batch(spark, b1, store, "hash_index", "exact_dedup_log",
                   "doc_id", "text", batch_id=1, run_id="runB")
    again = sorted(
        (r["doc_id"], r["dup_of"])
        for r in store.read(spark, "exact_dedup_log").collect()
    )
    assert again == once
    assert store.read(spark, "hash_index").count() == 2


def test_replay_guard_safe_directions(spark, tmp_path):
    """Missing marker, empty marker, foreign lineage, non-owning
    lineage, and None ids must all take the guarded (safe) path; only
    same-lineage + owns-store + strictly-higher batch id skips."""
    from streamforge_data_pipeline_spark.streaming.exact_dedup_stream import (
        _replay_guard_decision,
    )

    store = TableStore(str(tmp_path / "store_guard"))
    m = "log__last_batch"
    sch = "run_id string, batch_id long, owns_store boolean"
    assert _replay_guard_decision(spark, store, m, False, None, None)[0]
    # no marker yet: guard; ownership granted only over an empty store
    assert _replay_guard_decision(spark, store, m, False, 5, "A") == (True, True)
    assert _replay_guard_decision(spark, store, m, True, 5, "A") == (True, False)
    store.overwrite(spark.createDataFrame([("A", 3, True)], sch), m)
    assert _replay_guard_decision(spark, store, m, True, 4, "A") == (False, True)
    assert _replay_guard_decision(spark, store, m, True, 3, "A") == (True, True)
    # foreign lineage over an existing store: guard, never owns
    assert _replay_guard_decision(spark, store, m, True, 99, "B") == (True, False)
    # a lineage that never owned the store guards at every batch id
    store.overwrite(spark.createDataFrame([("B", 7, False)], sch), m)
    assert _replay_guard_decision(spark, store, m, True, 8, "B") == (True, False)
    # empty-but-readable marker (crash inside the overwrite)
    store.overwrite(spark.createDataFrame([], sch), m)
    assert _replay_guard_decision(spark, store, m, True, 99, "A")[0]


def test_bucketed_index_layout_same_log_and_pruned_probe(spark, tmp_path):
    """r5 brief #3: with index_buckets the index is hash-partitioned
    (hb= directories) and the probe scan is partition-pruned to the
    batch's buckets — while the decision log stays byte-identical to
    the unbucketed run."""
    src = str(tmp_path / "srcb")
    _write_batch(spark, src, [(10, "alpha"), (11, "beta"), (12, "alpha")])
    time.sleep(1.1)
    _write_batch(spark, src, [(5, "alpha"), (21, "gamma")])

    plain = _drain(spark, src, tmp_path, "plain")

    store = TableStore(str(tmp_path / "store_bk"))
    q = start_stream_exact_dedup(
        spark,
        src,
        store,
        checkpoint_dir=str(tmp_path / "ckpt_bk"),
        max_files_per_trigger=1,
        index_buckets=16,
    )
    q.awaitTermination()

    want = sorted(
        (r["doc_id"], r["content_hash"], r["dup_of"])
        for r in plain.read(spark, "exact_dedup_log").collect()
    )
    got = sorted(
        (r["doc_id"], r["content_hash"], r["dup_of"])
        for r in store.read(spark, "exact_dedup_log").collect()
    )
    assert got == want

    # layout: hive hb= partition directories
    subdirs = [
        d for d in os.listdir(store.path("hash_index")) if d.startswith("hb=")
    ]
    assert subdirs, "index not hash-partitioned"
    # index content matches the plain index (modulo the hb column)
    idx = store.read(spark, "hash_index")
    assert "hb" in idx.columns
    assert sorted(
        (r["content_hash"], r["first_id"])
        for r in idx.select("content_hash", "first_id").collect()
    ) == sorted(
        (r["content_hash"], r["first_id"])
        for r in plain.read(spark, "hash_index").collect()
    )
    # the probe's pruned read: an hb IN-list lands in PartitionFilters
    pruned = idx.filter(F.col("hb").isin([1, 2, 3]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "hb" in plan.split(
        "PartitionFilters: ["
    )[1].split("]")[0]


def test_bucketed_index_crash_between_appends_recovers(spark, tmp_path):
    """The index-first commit idempotency argument is layout-agnostic:
    crash after the bucketed index append, replay the batch — the log
    gains exactly one decision row per doc."""
    store = TableStore(str(tmp_path / "store_bkc"))
    batch = spark.createDataFrame(
        [(1, "aa"), (2, "bb"), (3, "aa")], "doc_id long, text string"
    )
    import shutil

    _resolve_batch(spark, batch, store, "hash_index", "log", "doc_id", "text",
                   index_buckets=8)
    # simulate: crash happened AFTER index append but BEFORE log append
    shutil.rmtree(store.path("log"))
    _resolve_batch(spark, batch, store, "hash_index", "log", "doc_id", "text",
                   index_buckets=8)
    rows = {r["doc_id"]: r["dup_of"] for r in store.read(spark, "log").collect()}
    assert rows == {1: None, 2: None, 3: 1}
    idx = store.read(spark, "hash_index")
    assert idx.count() == 2  # no double-index


def test_index_layout_flip_raises(spark, tmp_path):
    """r6 advice: toggling index_buckets over an existing index would
    mix flat and hive-partitioned files in one parquet dir — the guard
    refuses at open with an error naming the config flip, instead of
    letting partition discovery fail (or silently drop hb) batches
    later."""
    import pytest

    store = TableStore(str(tmp_path / "store_flip"))
    batch = spark.createDataFrame(
        [(1, "aa"), (2, "bb")], "doc_id long, text string"
    )
    _resolve_batch(spark, batch, store, "hash_index", "log", "doc_id", "text")
    with pytest.raises(ValueError, match="index_buckets"):
        _resolve_batch(spark, batch, store, "hash_index", "log", "doc_id",
                       "text", index_buckets=8)

    # the reverse flip (bucketed -> flat), and a bucket-COUNT flip
    store2 = TableStore(str(tmp_path / "store_flip2"))
    _resolve_batch(spark, batch, store2, "hash_index", "log", "doc_id", "text",
                   index_buckets=8)
    with pytest.raises(ValueError, match="index_buckets"):
        _resolve_batch(spark, batch, store2, "hash_index", "log", "doc_id",
                       "text")
    with pytest.raises(ValueError, match="index_buckets"):
        _resolve_batch(spark, batch, store2, "hash_index", "log", "doc_id",
                       "text", index_buckets=16)
    # same setting keeps working
    _resolve_batch(spark, batch, store2, "hash_index", "log", "doc_id", "text",
                   index_buckets=8)


def test_index_layout_sniff_presidecar(spark, tmp_path):
    """An index written before the layout sidecar existed is adjudicated
    by directory sniff: flat dir + bucketed config still raises."""
    import os as _os

    import pytest

    store = TableStore(str(tmp_path / "store_sniff"))
    batch = spark.createDataFrame([(1, "aa")], "doc_id long, text string")
    _resolve_batch(spark, batch, store, "hash_index", "log", "doc_id", "text")
    # simulate a pre-r7 store: drop the sidecar
    import shutil

    shutil.rmtree(store.path("hash_index__layout"))
    with pytest.raises(ValueError, match="flat"):
        _resolve_batch(spark, batch, store, "hash_index", "log", "doc_id",
                       "text", index_buckets=4)
    # matching config re-stamps the sidecar and proceeds
    _resolve_batch(spark, batch, store, "hash_index", "log", "doc_id", "text")
    assert _os.path.exists(store.path("hash_index__layout"))


def test_auto_index_buckets_flat_first_then_migrates(spark, tmp_path):
    """r6 brief #5, policy fixed by the r7 sf1 A/B: auto starts every
    NEW index flat (the measured winner while the index is small), and
    MIGRATES to the bucketed layout only once the on-disk index
    crosses the size threshold under a trickle-shaped batch — one
    partitioned rewrite, sidecar restamped, decisions unchanged."""
    import os as _os

    store = TableStore(str(tmp_path / "store_auto"))
    trickle = spark.createDataFrame(
        [(1, "aa"), (2, "bb"), (3, "aa"), (4, "cc")],
        "doc_id long, text string",
    )
    _resolve_batch(spark, trickle, store, "hash_index", "log", "doc_id",
                   "text", index_buckets="auto")
    # new index: flat, whatever the first batch looked like
    assert not any(
        d.startswith("hb=") for d in _os.listdir(store.path("hash_index"))
    )
    assert store.read(spark, "hash_index__layout").collect()[0][
        "index_buckets"
    ] == 0

    # below the size threshold: stays flat
    more = spark.createDataFrame(
        [(9, "aa"), (10, "zz")], "doc_id long, text string"
    )
    _resolve_batch(spark, more, store, "hash_index", "log", "doc_id",
                   "text", index_buckets="auto")
    assert store.read(spark, "hash_index__layout").collect()[0][
        "index_buckets"
    ] == 0

    # threshold crossed + trickle batch: migrates to bucketed
    third = spark.createDataFrame(
        [(20, "qq"), (21, "aa")], "doc_id long, text string"
    )
    _resolve_batch(spark, third, store, "hash_index", "log", "doc_id",
                   "text", index_buckets="auto", auto_migrate_bytes=1)
    assert any(
        d.startswith("hb=") for d in _os.listdir(store.path("hash_index"))
    )
    migrated_b = store.read(spark, "hash_index__layout").collect()[0][
        "index_buckets"
    ]
    assert migrated_b == 64  # next_pow2(16*k) floored at 2^6
    # decisions unchanged across the migration
    log = {r["doc_id"]: r["dup_of"] for r in store.read(spark, "log").collect()}
    assert log == {1: None, 2: None, 3: 1, 4: None, 9: 1, 10: None,
                   20: None, 21: 1}
    # index contents preserved (plus the hb column)
    idx = store.read(spark, "hash_index")
    assert "hb" in idx.columns and idx.count() == 5
    # later batches adopt the migrated layout
    _resolve_batch(spark, spark.createDataFrame(
        [(30, "zz")], "doc_id long, text string"
    ), store, "hash_index", "log", "doc_id", "text", index_buckets="auto")
    assert {
        r["doc_id"]: r["dup_of"] for r in store.read(spark, "log").collect()
    }[30] == 10


def test_auto_index_buckets_bulk_batch_never_migrates(spark, tmp_path):
    """Even past the size threshold, a bulk-shaped batch (distinct
    count above AUTO_BULK_K) must NOT trigger migration — it would
    read most buckets through the IN-list anyway (the r6.6 regime)."""
    from streamforge_data_pipeline_spark.streaming.exact_dedup_stream import (
        AUTO_BULK_K,
    )

    store = TableStore(str(tmp_path / "store_auto_b"))
    seed = spark.createDataFrame([(1, "aa")], "doc_id long, text string")
    _resolve_batch(spark, seed, store, "hash_index", "log", "doc_id", "text",
                   index_buckets="auto")
    bulk = spark.range(2, AUTO_BULK_K + 200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("d"), F.col("id")).alias("text"),
    )
    _resolve_batch(spark, bulk, store, "hash_index", "log", "doc_id", "text",
                   index_buckets="auto", auto_migrate_bytes=1)
    assert store.read(spark, "hash_index__layout").collect()[0][
        "index_buckets"
    ] == 0


def test_compact_partitioned_index_preserves_probe_and_layout(spark, tmp_path):
    """OPTIMIZE-style maintenance for the bucketed dedup index (r7):
    per-partition compaction must cut the file count while leaving the
    hive layout, the layout sidecar, and every subsequent probe
    decision untouched."""
    import glob
    import os as _os

    store = TableStore(str(tmp_path / "store_cp"))
    # several batches -> several files per touched hb partition
    for i in range(4):
        batch = spark.createDataFrame(
            [(i * 10 + j, f"doc-{j % 3}-{i % 2}") for j in range(6)],
            "doc_id long, text string",
        )
        _resolve_batch(spark, batch, store, "hash_index", "log", "doc_id",
                       "text", index_buckets=8)
    before = len(
        glob.glob(_os.path.join(store.path("hash_index"), "**", "part-*"),
                  recursive=True)
    )
    idx_before = sorted(
        (r["content_hash"], r["first_id"], r["hb"])
        for r in store.read(spark, "hash_index").collect()
    )
    after = store.compact_partitioned(spark, "hash_index", ["hb"])
    assert after < before, (before, after)
    assert sorted(
        (r["content_hash"], r["first_id"], r["hb"])
        for r in store.read(spark, "hash_index").collect()
    ) == idx_before
    # layout sidecar untouched, next batch still probes + annotates
    assert store.read(spark, "hash_index__layout").collect()[0][
        "index_buckets"
    ] == 8
    nxt = spark.createDataFrame(
        [(999, "doc-0-0"), (1000, "brand new")], "doc_id long, text string"
    )
    _resolve_batch(spark, nxt, store, "hash_index", "log", "doc_id", "text",
                   index_buckets=8)
    log = {r["doc_id"]: r["dup_of"] for r in store.read(spark, "log").collect()}
    assert log[999] == 0 and log[1000] is None
