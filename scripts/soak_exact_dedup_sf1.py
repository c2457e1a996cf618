#!/usr/bin/env python
"""A/B soak of the JVM exact-dedup ingestion stream at sf1: plain
append-only index vs the hash-partitioned (`index_buckets`) layout
(r5 brief #3). Streams the sf1 documents table through
start_stream_exact_dedup in ~11 micro-batches per mode and records,
per batch, the resolve wall time and the number of index FILES the
probe actually reads (partition pruning evidence — with buckets the
probe touches only the hb= directories the batch's hashes can hit).

Postconditions per mode: every doc decided exactly once; the two
modes' decision logs are identical sets.

Usage: python scripts/soak_exact_dedup_sf1.py [SF_DIR] [FILES_PER_TRIGGER] [BUCKETS]
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

from pyspark.sql import functions as F  # noqa: E402

from streamforge_data_pipeline_spark.session import get_session  # noqa: E402
from streamforge_data_pipeline_spark.sources.store import TableStore  # noqa: E402
from streamforge_data_pipeline_spark.streaming import exact_dedup_stream  # noqa: E402


def run_mode(spark, src, buckets, files_per_trigger=3, auto_migrate_bytes=None):
    work = tempfile.mkdtemp(prefix="sfdp_soak_xd_")
    store = TableStore(os.path.join(work, "store"))
    batches = []
    orig = exact_dedup_stream._resolve_batch

    def timed(spark_, batch_df, store_, index_table, log_table, id_col, text,
              **kwargs):
        t0 = time.monotonic()
        orig(spark_, batch_df, store_, index_table, log_table, id_col, text,
             **kwargs)
        wall = round(time.monotonic() - t0, 2)
        # files the NEXT batch's probe would read under this batch's
        # hb pruning (measured on the current index state)
        idx_files_probe = idx_files_total = 0
        resolved_buckets = kwargs.get("index_buckets")
        if resolved_buckets == "auto":
            # the guard's sidecar records what auto resolved to
            lrows = store_.read(spark_, f"{index_table}__layout").collect()
            resolved_buckets = (
                (lrows[0]["index_buckets"] or None) if lrows else None
            )
        if os.path.exists(store_.path(index_table)):
            idx = store_.read(spark_, index_table)
            idx_files_total = len(idx.inputFiles())
            if resolved_buckets:
                # one representative batch-bucket set: this batch's own
                hbs = [
                    r["hb"]
                    for r in batch_df.select(
                        F.pmod(
                            F.xxhash64(F.sha2(F.col(text).cast("binary"), 256)),
                            F.lit(resolved_buckets),
                        ).alias("hb")
                    ).distinct().collect()
                ]
                idx_files_probe = len(
                    [f for f in idx.inputFiles()
                     if any(f"/hb={h}/" in f for h in hbs)]
                )
            else:
                idx_files_probe = idx_files_total
        batches.append({"resolve_s": wall, "idx_files_total": idx_files_total,
                        "idx_files_probe": idx_files_probe})
        print(f"  batch {len(batches)-1}: {wall}s "
              f"(probe files {idx_files_probe}/{idx_files_total})", flush=True)

    exact_dedup_stream._resolve_batch = timed
    try:
        q = exact_dedup_stream.start_stream_exact_dedup(
            spark, src, store,
            checkpoint_dir=os.path.join(work, "ckpt"),
            max_files_per_trigger=files_per_trigger,
            index_buckets=buckets,
            auto_migrate_bytes=auto_migrate_bytes,
        )
        q.awaitTermination()
    finally:
        exact_dedup_stream._resolve_batch = orig
    log = store.read(spark, "exact_dedup_log")
    decided = log.select("doc_id").distinct().count()
    total = log.count()
    rows = sorted(
        (r["doc_id"], r["dup_of"]) for r in log.select("doc_id", "dup_of").collect()
    )
    shutil.rmtree(work, ignore_errors=True)
    return batches, decided, total, rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf1mf"
    buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    src = os.path.join(sf_dir, "documents.parquet")
    spark = get_session("soak-exact-dedup")
    spark.sparkContext.setLogLevel("ERROR")

    print("plain:", flush=True)
    plain_b, plain_decided, plain_total, plain_rows = run_mode(spark, src, None)
    print(f"bucketed ({buckets}):", flush=True)
    bk_b, bk_decided, bk_total, bk_rows = run_mode(spark, src, buckets)

    assert plain_decided == plain_total == bk_decided == bk_total
    assert plain_rows == bk_rows, "decision logs differ between layouts"

    steady_p = [b["resolve_s"] for b in plain_b[1:]]
    steady_k = [b["resolve_s"] for b in bk_b[1:]]
    print(json.dumps({
        "sf_dir": sf_dir,
        "docs": plain_total,
        "index_buckets": buckets,
        "plain_resolve_s": [b["resolve_s"] for b in plain_b],
        "bucketed_resolve_s": [b["resolve_s"] for b in bk_b],
        "plain_steady_mean_s": round(sum(steady_p) / max(len(steady_p), 1), 2),
        "bucketed_steady_mean_s": round(sum(steady_k) / max(len(steady_k), 1), 2),
        "bucketed_probe_files": [b["idx_files_probe"] for b in bk_b],
        "bucketed_total_files": [b["idx_files_total"] for b in bk_b],
        "logs_identical": plain_rows == bk_rows,
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
