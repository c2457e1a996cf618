#!/usr/bin/env python
"""Multi-batch soak of the continuous near-dup ingestion at sf1
(r4 brief #5): stream the 50k-doc / 32-file sf1 documents table
through start_stream_near_dedup in ~11 micro-batches and record
per-batch wall time plus admitted-corpus / decision-log growth.

The claim under test: per-batch probe cost is |batch| x BANDS rows
against the admitted corpus INDEX — not a corpus re-join — so batch
latency must stay flat (within noise) while the admitted corpus grows
across the run. Postconditions: every doc decided exactly once,
admitted == corpus, and the admitted corpus is near-dup-free at tau
(the batch pipeline finds zero pairs in it — the cross-check against
the batch answer).

Usage: python scripts/soak_near_dedup_sf1.py [SF_DIR] [FILES_PER_TRIGGER]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamforge_data_pipeline_spark.operators.minhash import (  # noqa: E402
    minhash_lsh_dedup,
)
from streamforge_data_pipeline_spark.session import get_session  # noqa: E402
from streamforge_data_pipeline_spark.sources.store import TableStore  # noqa: E402
from streamforge_data_pipeline_spark.streaming import near_dedup_stream  # noqa: E402

TAU = 0.5


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf1"
    per_trigger = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    src = os.path.join(sf_dir, "documents.parquet")
    spark = get_session("soak-near-dedup")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="sfdp_soak_")
    store = TableStore(os.path.join(work, "store"))

    # per-batch timing + state growth via a _resolve_batch wrapper —
    # the streaming engine's trigger durations include source listing;
    # the resolve wall time is the claim under test
    batches: list[dict] = []
    orig = near_dedup_stream._resolve_batch

    def timed_resolve(spark_, batch_df, store_, corpus_table, log_table, tau,
                      **kwargs):
        t0 = time.monotonic()
        n_in = batch_df.count()
        orig(spark_, batch_df, store_, corpus_table, log_table, tau, **kwargs)
        wall = time.monotonic() - t0
        corpus_n = store_.read(spark_, corpus_table).count()
        log_n = store_.read(spark_, log_table).count()
        batches.append(
            {
                "batch": len(batches),
                "rows_in": n_in,
                "resolve_s": round(wall, 1),
                "corpus_total": corpus_n,
                "log_total": log_n,
            }
        )
        print(f"batch {len(batches)-1}: {n_in} rows in {wall:.1f}s "
              f"(corpus {corpus_n}, log {log_n})", flush=True)

    near_dedup_stream._resolve_batch = timed_resolve
    try:
        q = near_dedup_stream.start_stream_near_dedup(
            spark,
            src,
            store,
            checkpoint_dir=os.path.join(work, "ckpt"),
            tau=TAU,
            max_files_per_trigger=per_trigger,
        )
        q.awaitTermination()
    finally:
        near_dedup_stream._resolve_batch = orig

    # ---- postconditions vs the batch pipeline
    corpus = store.read(spark, "corpus")
    log = store.read(spark, "near_dup_log")
    n_docs = spark.read.parquet(src).count()
    assert log.count() == n_docs, (log.count(), n_docs)
    assert log.select("doc_id").distinct().count() == n_docs
    admitted = log.filter("origin = 'admitted'").count()
    assert admitted == corpus.count(), (admitted, corpus.count())
    residual_pairs = minhash_lsh_dedup(corpus, tau=TAU).count()
    assert residual_pairs == 0, residual_pairs

    steady = [b["resolve_s"] for b in batches[1:]]  # batch 0 = plan warmup
    result = {
        "sf_dir": sf_dir,
        "files_per_trigger": per_trigger,
        "n_batches": len(batches),
        "docs": n_docs,
        "admitted": admitted,
        "residual_near_dup_pairs": residual_pairs,
        "batch_resolve_s": [b["resolve_s"] for b in batches],
        "corpus_growth": [b["corpus_total"] for b in batches],
        "steady_min_s": min(steady) if steady else None,
        "steady_max_s": max(steady) if steady else None,
        "flat_within": round(max(steady) / max(min(steady), 1e-9), 2)
        if steady
        else None,
    }
    print(json.dumps(result), flush=True)
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
