"""Continuous near-dup ingestion (near_dedup_stream): postcondition
tests — the final corpus is near-dup-free at tau, every rejection
resolves (transitively) to an admitted doc, and nothing is lost or
double-admitted across micro-batches or re-runs."""

from __future__ import annotations

import time

from streamforge_data_pipeline_spark.operators.minhash import minhash_lsh_dedup
from streamforge_data_pipeline_spark.sources.store import TableStore
from streamforge_data_pipeline_spark.streaming.near_dedup_stream import (
    start_stream_near_dedup,
)

# 30 DISTINCT tokens per letter family + a variant tail: same-family
# docs share 27 of ~29 trigrams (Jaccard ~0.93 — high enough that the
# 16-perm banding is certain to candidate them; periodic "x y z "*10
# texts collapse to ~5 distinct shingles and land near J=0.67, where
# banded LSH legitimately misses ~40% of pairs). Cross-family: J=0.
_BASE = {
    letter: " ".join(f"{letter}{i}" for i in range(30))
    for letter in ("a", "b", "c")
}


def _doc(letter: str, variant: int) -> str:
    return _BASE[letter] + f" tail{variant}"


def _write(spark, path, rows):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _drain(spark, inbox, store, ckpt):
    q = start_stream_near_dedup(spark, inbox, store, checkpoint_dir=ckpt)
    q.awaitTermination()


def test_stream_near_dedup_end_to_end(spark, tmp_path):
    inbox = str(tmp_path / "inbox")
    ckpt = str(tmp_path / "ckpt")
    store = TableStore(str(tmp_path / "store"))

    # batch 1: two 'a' near-dups (in-batch pair) + one 'b'
    _write(spark, inbox, [(1, _doc("a", 1)), (2, _doc("a", 2)), (3, _doc("b", 1))])
    time.sleep(1.1)
    # batch 2: another 'a' (dup of the admitted rep), a 'b' near-dup,
    # and a genuinely new 'c'
    _write(spark, inbox, [(4, _doc("a", 3)), (5, _doc("b", 2)), (6, _doc("c", 1))])

    _drain(spark, inbox, store, ckpt)

    corpus = store.read(spark, "corpus")
    log = store.read(spark, "near_dup_log")
    corpus_ids = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    log_rows = {r["doc_id"]: r for r in log.collect()}

    # every input id decided exactly once
    assert set(log_rows) == {1, 2, 3, 4, 5, 6}
    assert log.count() == 6

    # admitted set: one 'a' rep (1 or 2), the 'b' (3), the 'c' (6)
    admitted = {i for i, r in log_rows.items() if r["origin"] == "admitted"}
    assert admitted == corpus_ids
    assert 3 in corpus_ids and 6 in corpus_ids
    assert len(corpus_ids & {1, 2}) == 1 and 4 not in corpus_ids
    assert 5 not in corpus_ids

    # postcondition: the admitted corpus is near-dup-free at tau
    assert minhash_lsh_dedup(corpus, tau=0.5).count() == 0

    # every rejection resolves transitively to an admitted doc
    def resolve(i: int, hops=0) -> int:
        assert hops < 5
        r = log_rows[i]
        return i if r["dup_of"] is None else resolve(r["dup_of"], hops + 1)

    for i in {1, 2, 3, 4, 5, 6} - admitted:
        assert resolve(i) in corpus_ids

    # index-origin rejections carry the exact jaccard that justified them
    for i, r in log_rows.items():
        if r["origin"] == "index":
            assert r["jaccard"] is not None and r["jaccard"] >= 0.5


def test_stream_near_dedup_rerun_is_idempotent(spark, tmp_path):
    """Draining the same inbox with a FRESH checkpoint (forced
    re-processing) must not double-admit or re-log anything."""
    inbox = str(tmp_path / "inbox")
    store = TableStore(str(tmp_path / "store"))
    _write(spark, inbox, [(1, _doc("a", 1)), (2, _doc("b", 1))])

    _drain(spark, inbox, store, str(tmp_path / "ckpt1"))
    first_corpus = sorted(
        r["doc_id"] for r in store.read(spark, "corpus").collect()
    )
    _drain(spark, inbox, store, str(tmp_path / "ckpt2"))

    assert (
        sorted(r["doc_id"] for r in store.read(spark, "corpus").collect())
        == first_corpus
    )
    assert store.read(spark, "near_dup_log").count() == 2


def test_crash_between_log_and_corpus_appends_backfills(spark, tmp_path):
    """Log-first commit window: simulate dying AFTER the log append but
    BEFORE the corpus append by deleting the corpus table, then
    re-deliver the batch. The replay guard must backfill the admitted
    docs into the corpus from the replayed rows (closing the
    documented window) without duplicating any log rows."""
    import shutil

    from streamforge_data_pipeline_spark.streaming.near_dedup_stream import (
        _resolve_batch,
    )

    store = TableStore(str(tmp_path / "store_bf"))
    batch = spark.createDataFrame(
        [(1, _doc("a", 1)), (2, _doc("a", 2)), (3, _doc("b", 1))],
        "doc_id long, text string",
    )
    _resolve_batch(spark, batch, store, "corpus", "near_dup_log", 0.5)
    admitted = sorted(r["doc_id"] for r in store.read(spark, "corpus").collect())
    log_rows = store.read(spark, "near_dup_log").count()
    assert admitted  # sanity: something was admitted

    shutil.rmtree(store.path("corpus"))  # the crash window
    _resolve_batch(spark, batch, store, "corpus", "near_dup_log", 0.5)

    assert (
        sorted(r["doc_id"] for r in store.read(spark, "corpus").collect())
        == admitted
    )
    assert store.read(spark, "near_dup_log").count() == log_rows
