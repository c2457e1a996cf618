#!/usr/bin/env python
"""Multi-batch soak of the continuous SEMANTIC near-dup ingestion at
sf1: stream the 50k-vector sf1 embeddings table through
start_stream_semantic_dedup in ~11 micro-batches and record per-batch
wall time plus admitted-corpus / decision-log growth.

The claim under test: per-batch probe cost is |batch reps| x
|corpus rows in the SAME quantizer cells| against the admitted corpus
— never an all-corpus cross join — so batch latency must stay flat
(within the in-cell corpus-growth term) while the admitted corpus
grows. Postconditions: every vector decided exactly once, admitted ==
corpus, and the admitted corpus is cosine-dup-free at tau within every
cell (the batch SemDeDup machinery finds zero non-keep rows in it).

Usage: python scripts/soak_semantic_dedup_sf1.py [SF_DIR] [FILES_PER_TRIGGER]
Prints one JSON line. SF_DIR must use the multi-file layout
(datagen_star --multi-file) so the file source has batches to trigger.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from streamforge_data_pipeline_spark.operators.similarity import (  # noqa: E402
    semantic_dedup_fixed_cells,
)
from streamforge_data_pipeline_spark.session import get_session  # noqa: E402
from streamforge_data_pipeline_spark.sources.store import TableStore  # noqa: E402
from streamforge_data_pipeline_spark.streaming import (  # noqa: E402
    semantic_dedup_stream,
)

TAU = 0.4


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf1mf"
    per_trigger = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    src = os.path.join(sf_dir, "embeddings.parquet")
    spark = get_session("soak-semantic-dedup")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="sfdp_soak_sd_")
    store = TableStore(os.path.join(work, "store"))

    batches: list[dict] = []
    orig = semantic_dedup_stream._resolve_batch

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

    semantic_dedup_stream._resolve_batch = timed_resolve
    try:
        q = semantic_dedup_stream.start_stream_semantic_dedup(
            spark,
            src,
            store,
            checkpoint_dir=os.path.join(work, "ckpt"),
            tau=TAU,
            max_files_per_trigger=per_trigger,
        )
        q.awaitTermination()
    finally:
        semantic_dedup_stream._resolve_batch = orig

    # ---- postconditions vs the batch pipeline
    corpus = store.read(spark, "vec_corpus")
    log = store.read(spark, "semantic_dup_log")
    n_vecs = spark.read.parquet(src).count()
    assert log.count() == n_vecs, (log.count(), n_vecs)
    assert log.select("vec_id").distinct().count() == n_vecs
    admitted = log.filter("origin = 'admitted'").count()
    assert admitted == corpus.count(), (admitted, corpus.count())
    residual = (
        semantic_dedup_fixed_cells(corpus, n_cells=8, tau=TAU)
        .filter(~F.col("keep"))
        .count()
    )
    assert residual == 0, residual

    steady = [b["resolve_s"] for b in batches[1:]]  # batch 0 = plan warmup
    result = {
        "sf_dir": sf_dir,
        "files_per_trigger": per_trigger,
        "n_batches": len(batches),
        "vectors": n_vecs,
        "admitted": admitted,
        "residual_semantic_dup_rows": residual,
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
