#!/usr/bin/env python
"""Multi-batch soak of the continuous per-domain admission caps +
the partial-aggregate share journal at sf1 (r8): stream the 50k-doc
sf1mf documents table (synthesized URLs) through
start_stream_domain_caps-style commits in many micro-batches and
record per-batch wall time plus state growth.

Claims under test:
- per-batch cost is |batch| ranked against a BOUNDED counter state
  (one broadcast row per domain) — batch latency stays flat while the
  decision log grows;
- the cap invariant holds globally after any number of batches
  (no domain ever exceeds k admitted);
- every doc is decided exactly once;
- the share journal's summed counts equal one batch aggregation of
  everything ingested (the additive-algebra claim at scale).

Usage: python scripts/soak_domain_caps_sf1.py [SF_DIR] [N_BATCHES]
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

from streamforge_data_pipeline_spark.registry import _with_urls  # noqa: E402
from streamforge_data_pipeline_spark.session import get_session, load  # noqa: E402
from streamforge_data_pipeline_spark.sources.store import TableStore  # noqa: E402
from streamforge_data_pipeline_spark.streaming import (  # noqa: E402
    domain_caps_stream,
    domain_share_stream,
)

K = 2000  # per-domain cap sized so sf1 domains are partially admitted


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf1mf"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_session("soak-domain-caps")
    spark.sparkContext.setLogLevel("ERROR")

    docs = _with_urls(load(spark, sf_dir, "documents")).localCheckpoint(
        eager=True
    )
    n_docs = docs.count()
    work = tempfile.mkdtemp(prefix="sfdp_soak_dc_")
    store = TableStore(os.path.join(work, "store"))

    batches: list[dict] = []
    for b in range(n_batches):
        batch = docs.filter(F.col("doc_id") % n_batches == b)
        t0 = time.monotonic()
        domain_caps_stream._commit_batch(
            spark, batch, store, K, "doc_id", "url", b
        )
        domain_share_stream._commit_batch(
            spark, batch, store, "doc_id", "url", b
        )
        batches.append(
            {"batch": b, "wall_s": round(time.monotonic() - t0, 2)}
        )

    log = store.read(spark, domain_caps_stream.LOG_TABLE)
    n_decided = log.count()
    over_cap = (
        log.filter("admitted")
        .groupBy("domain")
        .count()
        .filter(F.col("count") > K)
        .count()
    )
    dup_decisions = n_decided - log.select("doc_id").distinct().count()
    # additive-journal check: summed journal == one-shot batch agg
    journal = (
        store.read(spark, domain_share_stream.JOURNAL_TABLE)
        .groupBy("domain")
        .agg(F.sum("n_docs").alias("n"))
    )
    from streamforge_data_pipeline_spark.operators.web import domain_share

    batch_counts = domain_share(docs, url_col="url").select(
        "domain", F.col("n_docs").alias("n")
    )
    mismatch = (
        journal.join(batch_counts, "domain", "full")
        .filter(
            F.coalesce(journal["n"], F.lit(-1))
            != F.coalesce(batch_counts["n"], F.lit(-2))
        )
        .count()
    )
    shutil.rmtree(work, ignore_errors=True)
    walls = [b["wall_s"] for b in batches]
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_docs": n_docs,
                "n_batches": n_batches,
                "k": K,
                "decided": n_decided,
                "dup_decisions": dup_decisions,
                "domains_over_cap": over_cap,
                "journal_vs_batch_mismatches": mismatch,
                "batch_walls_s": walls,
                "first3_mean_s": round(sum(walls[:3]) / 3, 2),
                "last3_mean_s": round(sum(walls[-3:]) / 3, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
