"""Cross-batch invariants of the composed ingestion-time funnel
(streaming/curation_funnel_stream) — the behavior the one-batch drain
oracle cannot see."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from streamforge_data_pipeline_spark.sources.store import TableStore
from streamforge_data_pipeline_spark.streaming.curation_funnel_stream import (
    FUNNEL_JOURNAL,
    SURVIVOR_LOG,
    _commit_batch,
    read_funnel,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, url string")


def _mk_rows(ids, text_of, dom_of):
    return [
        (i, text_of(i), f"http://{dom_of(i)}.example.com/p/{i}") for i in ids
    ]


GOOD = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"


def test_multi_batch_funnel_invariants(spark, tmp_path):
    """3 batches: content seen in batch 0 never survives stage 1
    again; per-domain admissions never exceed k across batches; stage
    counts are monotone within every batch partial."""
    store = TableStore(str(tmp_path / "store"))
    text_of = lambda i: GOOD if i % 10 == 0 else f"{GOOD} unique{i}"  # noqa: E731
    dom_of = lambda i: f"dom{i % 2}"  # noqa: E731
    for b in range(3):
        _commit_batch(
            spark,
            _docs(spark, _mk_rows(range(b * 30, (b + 1) * 30), text_of, dom_of)),
            store,
            b,
            k_domain=5,
        )
    log = spark.read.parquet(store.path(SURVIVOR_LOG))
    # the duplicate content (text_of on i%10==0) passes stage 1 exactly once
    dup_hash_rows = log.filter(F.col("content_md5") == log.filter("doc_id = 0").select("content_md5").collect()[0][0])
    assert dup_hash_rows.filter("stage >= 1").count() == 1
    assert dup_hash_rows.count() == 9  # one per duplicate arrival
    # domain cap holds across batches
    admitted = log.filter("stage >= 4").groupBy("domain").count().collect()
    assert all(r["count"] <= 5 for r in admitted)
    # first-come: all admissions happened in batch 0 (30 docs over 2
    # domains = 15/domain in batch 0, already > k=5)
    assert log.filter("stage >= 4").agg(F.max("doc_id")).collect()[0][0] < 30
    # per-batch partials are monotone in stage
    j = spark.read.parquet(store.path(FUNNEL_JOURNAL)).collect()
    per_batch = {}
    for r in j:
        per_batch.setdefault(r["batch_id"], {})[r["stage"]] = r["n_docs"]
    for stages in per_batch.values():
        seq = [stages.get(i, 0) for i in range(5)]
        assert all(a >= b for a, b in zip(seq, seq[1:])), seq


def test_funnel_replay_is_idempotent_and_crash_repairs(spark, tmp_path):
    """Replaying a batch_id rewrites its own partitions with identical
    rows; losing the journal partition between the two writes (the
    crash window) is repaired by the replay."""
    store = TableStore(str(tmp_path / "store"))
    rows = _mk_rows(range(20), lambda i: f"{GOOD} u{i}", lambda i: "solo")
    _commit_batch(spark, _docs(spark, rows), store, 0, k_domain=5)
    before = sorted(map(tuple, read_funnel(spark, store).collect()))
    _commit_batch(spark, _docs(spark, rows), store, 0, k_domain=5)  # replay
    assert sorted(map(tuple, read_funnel(spark, store).collect())) == before
    # crash window: journal partition vanishes, log survives
    shutil.rmtree(store.path(FUNNEL_JOURNAL))
    _commit_batch(spark, _docs(spark, rows), store, 0, k_domain=5)
    assert sorted(map(tuple, read_funnel(spark, store).collect())) == before
    # a later batch sees the repaired state: no re-admission
    _commit_batch(spark, _docs(spark, rows), store, 1, k_domain=5)
    log = spark.read.parquet(store.path(SURVIVOR_LOG))
    # batch 1's docs are all content-duplicates of batch 0: none pass stage 1
    assert log.filter("batch_id = 1 AND stage >= 1").count() == 0
    assert log.filter("stage >= 4").count() == 5


def test_id_ordered_slicing_matches_batch_funnel(spark, tmp_path):
    """With id-ordered arrival (the crawl discipline the module
    documents) the multi-batch funnel report equals the batch
    operator over the union — for every stage except the domain cap,
    whose global (hash, id) rank is order-free only at one batch; the
    cap count still agrees because both admit exactly k per
    over-subscribed domain."""
    from streamforge_data_pipeline_spark.plans.curation import curation_funnel

    store = TableStore(str(tmp_path / "store"))
    text_of = lambda i: GOOD if i % 7 == 0 else f"{GOOD} unique{i} x{i % 3}"  # noqa: E731
    dom_of = lambda i: f"dom{i % 3}"  # noqa: E731
    rows = _mk_rows(range(60), text_of, dom_of)
    for b in range(3):
        _commit_batch(
            spark, _docs(spark, rows[b * 20 : (b + 1) * 20]), store, b,
            k_domain=4,
        )
    streamed = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in read_funnel(spark, store).collect()
    }
    full = _docs(spark, rows)
    batch = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in curation_funnel(
            full.select("doc_id", "text"), full.select("doc_id", "url"),
            k_domain=4,
        ).collect()
    }
    for stage in (0, 1, 2, 3):
        assert streamed[stage] == batch[stage], (stage, streamed, batch)
    assert streamed[4][0] == batch[4][0]  # same admission COUNT per cap
