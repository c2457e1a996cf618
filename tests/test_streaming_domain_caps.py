"""Continuous per-domain admission caps: cross-batch invariants the
one-batch drain oracle cannot see (streaming/domain_caps_stream)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from streamforge_data_pipeline_spark.sources.store import TableStore
from streamforge_data_pipeline_spark.streaming.domain_caps_stream import (
    JOURNAL_TABLE,
    LOG_TABLE,
    _commit_batch,
    read_counts,
)


def _docs(spark, ids, dom_of):
    rows = [(i, f"http://{dom_of(i)}.example.com/p/{i}") for i in ids]
    return spark.createDataFrame(rows, "doc_id long, url string")


def test_cap_holds_across_batches(spark, tmp_path):
    """3 batches x 30 docs over 3 domains with k=5: admitted never
    exceeds k per domain, admission is first-come (later batches admit
    only while the counter has room), counts state stays bounded."""
    store = TableStore(str(tmp_path / "store"))
    dom = lambda i: f"dom{i % 3}"  # noqa: E731
    for b in range(3):
        batch = _docs(spark, range(b * 30, (b + 1) * 30), dom)
        _commit_batch(spark, batch, store, 5, "doc_id", "url", b)

    log = store.read(spark, LOG_TABLE)
    assert log.count() == 90  # one decision per doc
    admitted = log.filter("admitted").groupBy("domain").count().collect()
    assert {r["domain"]: r["count"] for r in admitted} == {
        f"dom{j}.example.com": 5 for j in range(3)
    }
    # first-come: every admitted doc came from batch 0 (30 docs over 3
    # domains = 10/domain in batch 0, already > k=5)
    assert log.filter("admitted").agg(F.max("doc_id")).collect()[0][0] < 30
    # cumulative rank replays the decision: admitted == (rk <= k)
    assert log.filter(
        (F.col("rk") <= 5) != F.col("admitted")
    ).count() == 0
    # counter state is domain-bounded, not corpus-bounded
    counts = read_counts(spark, store).collect()
    assert len(counts) == 3
    assert all(r["n_admitted"] == 5 for r in counts)
    assert all(r["n_seen"] == 30 for r in counts)


def test_partially_filled_domain_admits_across_batches(spark, tmp_path):
    """A domain below its cap keeps admitting in later batches, and
    ranks continue cumulatively (n_seen-based, never repeating)."""
    store = TableStore(str(tmp_path / "store"))
    _commit_batch(spark, _docs(spark, range(3), lambda i: "solo"),
                  store, 5, "doc_id", "url", 0)
    _commit_batch(spark, _docs(spark, range(3, 6), lambda i: "solo"),
                  store, 5, "doc_id", "url", 1)
    log = store.read(spark, LOG_TABLE).orderBy("rk").collect()
    assert [r["rk"] for r in log] == [1, 2, 3, 4, 5, 6]
    assert [r["admitted"] for r in log] == [True] * 5 + [False]


def test_ranks_never_repeat_after_rejections(spark, tmp_path):
    """The r8 ADVICE rk defect: once a batch has rejections, later
    batches must NOT reuse rk values (n_seen feeds rk, not
    n_admitted) — and admitted == (rk <= k) still replays the cap."""
    store = TableStore(str(tmp_path / "store"))
    _commit_batch(spark, _docs(spark, range(8), lambda i: "dom"),
                  store, 5, "doc_id", "url", 0)  # 3 rejections
    _commit_batch(spark, _docs(spark, range(8, 12), lambda i: "dom"),
                  store, 5, "doc_id", "url", 1)
    log = store.read(spark, LOG_TABLE).collect()
    rks = sorted(r["rk"] for r in log)
    assert rks == list(range(1, 13))  # cumulative arrival rank, no dups
    assert all((r["rk"] <= 5) == r["admitted"] for r in log)


def test_replay_is_idempotent(spark, tmp_path):
    """Re-committing the same batch_id (at-least-once foreachBatch)
    overwrites its own log/journal partitions with identical rows —
    no duplicate decisions, no inflated counters."""
    store = TableStore(str(tmp_path / "store"))
    batch = _docs(spark, range(10), lambda i: "dom")
    _commit_batch(spark, batch, store, 5, "doc_id", "url", 0)
    _commit_batch(spark, batch, store, 5, "doc_id", "url", 0)  # replay
    log = store.read(spark, LOG_TABLE)
    assert log.count() == 10
    counts = read_counts(spark, store).collect()
    assert len(counts) == 1 and counts[0]["n_admitted"] == 5


def test_crash_between_log_and_journal_is_repaired(spark, tmp_path):
    """The r8 ADVICE crash window: log partition written, journal
    partial lost. The replayed batch must repair the counters (and a
    later batch must not over-admit)."""
    import shutil

    store = TableStore(str(tmp_path / "store"))
    batch = _docs(spark, range(10), lambda i: "dom")
    _commit_batch(spark, batch, store, 5, "doc_id", "url", 0)
    # simulate the crash: journal partition for batch 0 vanishes
    shutil.rmtree(store.path(JOURNAL_TABLE))
    # foreachBatch redelivers batch 0
    _commit_batch(spark, batch, store, 5, "doc_id", "url", 0)
    counts = read_counts(spark, store).collect()
    assert len(counts) == 1 and counts[0]["n_admitted"] == 5
    # a later batch sees full counters: nothing more admitted
    _commit_batch(spark, _docs(spark, range(10, 20), lambda i: "dom"),
                  store, 5, "doc_id", "url", 1)
    log = store.read(spark, LOG_TABLE)
    assert log.filter("admitted").count() == 5
    assert log.count() == 20


def test_domain_share_journal_slicing_invariant(spark, tmp_path):
    """The partial-aggregate journal is additive: shares after 3
    batches equal the batch operator over the union, and a replayed
    batch_id overwrites its own partition (no double count)."""
    from streamforge_data_pipeline_spark.operators.web import domain_share
    from streamforge_data_pipeline_spark.streaming.domain_share_stream import (
        _commit_batch as share_commit,
        read_shares,
    )

    store = TableStore(str(tmp_path / "store"))
    dom = lambda i: f"dom{i % 4}"  # noqa: E731
    full = _docs(spark, range(60), dom)
    for b in range(3):
        share_commit(spark, _docs(spark, range(b * 20, (b + 1) * 20), dom),
                     store, "doc_id", "url", b)
    streamed = {(r["domain"], r["n_docs"], r["share"])
                for r in read_shares(spark, store).collect()}
    batch = {(r["domain"], r["n_docs"], r["share"])
             for r in domain_share(full, url_col="url").collect()}
    assert streamed == batch
    # replay batch 1: dynamic partition overwrite absorbs it
    share_commit(spark, _docs(spark, range(20, 40), dom),
                 store, "doc_id", "url", 1)
    replayed = {(r["domain"], r["n_docs"], r["share"])
                for r in read_shares(spark, store).collect()}
    assert replayed == batch


def test_shard_export_journal_matches_batch_manifest(spark, tmp_path):
    """Streamed shard export over 3 batches: the journal-maintained
    manifest (counts, token sums, DECIMAL checksums — all additive)
    equals the batch shard_manifest over the union; the written shard
    data validates against it; a replayed batch journal is absorbed."""
    from streamforge_data_pipeline_spark.operators.sampling import shard_manifest
    from streamforge_data_pipeline_spark.streaming.shard_export_stream import (
        SHARDS_TABLE,
        _commit_batch as shard_commit,
        read_manifest,
    )

    rows = [(i, f"tok{i % 7} tok{i % 5} tok{i % 3}") for i in range(90)]
    full = spark.createDataFrame(rows, "doc_id long, text string")
    store = TableStore(str(tmp_path / "store"))
    for b in range(3):
        batch = full.filter((F.col("doc_id") >= b * 30) & (F.col("doc_id") < (b + 1) * 30))
        shard_commit(spark, batch, store, 8, "doc_id", "text", b)

    streamed = {r["shard"]: tuple(r) for r in read_manifest(spark, store).collect()}
    batch_m = {r["shard"]: tuple(r) for r in shard_manifest(full, n_shards=8).collect()}
    assert streamed == batch_m
    # the exported data is complete
    assert spark.read.parquet(store.path(SHARDS_TABLE)).count() == 90
    # journal replay of batch 1 (no data rewrite) is absorbed
    batch1 = full.filter((F.col("doc_id") >= 30) & (F.col("doc_id") < 60))
    shard_commit(spark, batch1, store, 8, "doc_id", "text", 1, write_data=False)
    again = {r["shard"]: tuple(r) for r in read_manifest(spark, store).collect()}
    assert again == batch_m


def test_decayed_counts_journal_slicing_invariant(spark, tmp_path):
    """Decay via the day-bucketed journal: 3-batch ingestion equals
    the batch decayed_counts, and advancing the clock (a later-day
    batch) re-weights existing state at read time without rewriting
    the journal's earlier partitions."""
    import datetime as dt
    from streamforge_data_pipeline_spark.operators.aggregates import (
        decayed_counts,
    )
    from streamforge_data_pipeline_spark.streaming.domain_share_stream import (
        _commit_decay_batch,
        read_decayed_counts,
    )

    base = dt.datetime(2024, 5, 1, 8, 0, 0)
    rows = [(i, "click" if i % 2 else "view", base + dt.timedelta(days=i % 5))
            for i in range(60)]
    full = spark.createDataFrame(rows, "event_id long, event_type string, ts timestamp")
    store = TableStore(str(tmp_path / "store"))
    for b in range(3):
        batch = full.filter((F.col("event_id") % 3) == b)
        _commit_decay_batch(spark, batch, store, "event_type", "ts", b)
    streamed = {r["event_type"]: tuple(r)
                for r in read_decayed_counts(spark, store).collect()}
    batch_ref = {r["event_type"]: tuple(r)
                 for r in decayed_counts(full).collect()}
    assert streamed == batch_ref
    # clock advance: one new event 2 days later halves old weights
    late = spark.createDataFrame(
        [(999, "view", base + dt.timedelta(days=6))],
        "event_id long, event_type string, ts timestamp")
    _commit_decay_batch(spark, late, store, "event_type", "ts", 3)
    streamed2 = {r["event_type"]: tuple(r)
                 for r in read_decayed_counts(spark, store).collect()}
    batch2 = {r["event_type"]: tuple(r)
              for r in decayed_counts(full.unionByName(late)).collect()}
    assert streamed2 == batch2
