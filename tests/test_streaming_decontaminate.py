"""Continuous eval-set decontamination (streaming/decontaminate_stream):
verdicts equal the batch operator's, multi-batch slicing changes
nothing (decisions are per-doc pure functions of the static eval
index), and only clean docs are admitted."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from streamforge_data_pipeline_spark.sources.store import TableStore
from streamforge_data_pipeline_spark.streaming.decontaminate_stream import (
    start_stream_decontaminate,
)


def _drain(spark, src, tmp_path, tag, eval_docs, **kw):
    store = TableStore(str(tmp_path / f"store_{tag}"))
    q = start_stream_decontaminate(
        spark, src, store,
        checkpoint_dir=str(tmp_path / f"ckpt_{tag}"),
        eval_docs=eval_docs,
        **kw,
    )
    q.awaitTermination()
    return store


def test_stream_decontaminate_verdicts_and_admission(spark, tmp_path):
    eval_docs = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")],
        "doc_id long, text string",
    )
    # doc 1 shares the eval 3-grams, doc 2 is clean, doc 3 is too
    # short to shingle (logged clean, n_shingles 0, frac NULL)
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [
            (1, "alpha beta gamma delta zeta"),
            (2, "totally different content here today"),
            (3, "two words"),
        ],
        "doc_id long, text string",
    ).write.parquet(src)

    store = _drain(spark, src, tmp_path, "one", eval_docs,
                   max_files_per_trigger=10_000)
    log = {r["doc_id"]: r for r in store.read(spark, "decontam_log").collect()}
    assert log[1]["contaminated"] and log[1]["n_hits"] == 2
    assert not log[2]["contaminated"] and log[2]["overlap_frac"] == 0.0
    assert not log[3]["contaminated"] and log[3]["n_shingles"] == 0
    assert log[3]["overlap_frac"] is None
    admitted = {
        r["doc_id"] for r in store.read(spark, "train_corpus").collect()
    }
    assert admitted == {2, 3}


def test_stream_decontaminate_slicing_invariant(spark, tmp_path):
    """Time-sliced multi-batch drain produces the identical verdict
    log as the one-batch drain — per-doc decisions against a static
    index cannot depend on batching."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    eval_docs = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 5 != 0).select("doc_id", "text")

    src_one = str(tmp_path / "one_src")
    train.coalesce(1).write.parquet(src_one)
    src_sliced = str(tmp_path / "sliced_src")
    for s in range(3):
        train.filter(F.col("doc_id") % 3 == s).coalesce(1).write.mode(
            "append"
        ).parquet(src_sliced)
        if s < 2:
            time.sleep(1.1)

    one = _drain(spark, src_one, tmp_path, "o", eval_docs,
                 max_files_per_trigger=10_000)
    sliced = _drain(spark, src_sliced, tmp_path, "s", eval_docs,
                    max_files_per_trigger=1)

    def rows(store):
        return sorted(
            tuple(r) for r in store.read(spark, "decontam_log").collect()
        )

    assert rows(one) == rows(sliced)
    assert rows(one), "corpus should produce verdicts"
    # contaminated docs exist in this corpus (near-dups cross the split)
    assert any(r[-1] for r in rows(one))


def test_stream_decontaminate_matches_batch_operator(spark, tmp_path):
    """Cross-operator parity: the streaming log's CONTAMINATED rows
    must equal operators.text.decontaminate's output (same stats) on
    the same deterministic split."""
    from streamforge_data_pipeline_spark.functions import hash60
    from streamforge_data_pipeline_spark.operators.text import decontaminate

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    is_train = hash60(F.col("doc_id").cast("string")) % 100 < 80
    src = str(tmp_path / "train_src")
    docs.filter(is_train).write.parquet(src)

    store = _drain(spark, src, tmp_path, "parity",
                   docs.filter(~is_train), max_files_per_trigger=10_000)
    got = sorted(
        (r["doc_id"], r["n_hits"], r["n_shingles"], r["overlap_frac"])
        for r in store.read(spark, "decontam_log")
        .filter("contaminated")
        .collect()
    )
    want = sorted(
        (r["doc_id"], r["n_hits"], r["n_shingles"], r["overlap_frac"])
        for r in decontaminate(docs).collect()
    )
    assert got == want and got
