"""Continuous SEMANTIC near-dup ingestion: the embedding-space twin of
near_dedup_stream — arriving vector files are cosine-dedup-resolved
WITHIN their micro-batch, probed against the already-admitted corpus
inside the same quantizer cell, and only novel vectors are appended;
every decision is logged.

Per micro-batch (foreachBatch — blocking, sequential, per-batch
atomic):

1. in-batch resolution: semantic_dedup_fixed_cells (within-cell
   all-pairs cosine >= tau -> connected components -> min-id
   canonical); non-canonical members are logged (origin='batch',
   dup_of=the cluster representative).
2. cell probe: representatives join the corpus table ON THE CELL KEY
   only — the deterministic argmax quantizer assigns both sides, so
   the probe cost is |batch reps| x |corpus rows in the same cells|,
   never an all-corpus cross join; cosine >= tau hits are logged
   (origin='index', dup_of=the lowest-id indexed match, cosine
   rounded to 4 dp).
3. admission: surviving representatives append to the corpus table —
   which IS the next batch's probe index.

Contrast with near_dedup_stream (the token/MinHash twin): same
log-first commit order, same marker-gated replay guard, same
admitted-backfill crash repair — the only moving part swapped is the
candidate structure (LSH bands -> quantizer cells) and the verifier
(exact Jaccard -> double-fold cosine). The quantizer is the FIXED
argmax cell, not trained k-means, for the same reason
semantic_dedup_cells exists: deterministic assignments make the
single-batch drain DuckDB-oracle-checkable, and cells never drift
between batches.

Scale notes: the probe join is keyed on (cell) with the corpus side
readable from a cell-bucketed layout at 100 TB; within a cell the
candidate volume is |batch∩cell| x |corpus∩cell| — the quantizer's
fan-out bound, same regime the batch SemDeDup operator documents. A
trained k-means quantizer (semantic_dedup) drops in by persisting its
centroids next to the corpus table; the argmax cells keep this module
self-contained. Every stage boundary localCheckpoints: the composition
references upstream subtrees multiplicatively (CC iterations, the
probe reading its input twice, the post-append log reads), the exact
lineage trap PERF_NOTES' iterative-lineage lesson records.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from streamforge_data_pipeline_spark.functions import dot_double
from streamforge_data_pipeline_spark.operators.similarity import (
    argmax_cell,
    semantic_dedup_fixed_cells,
)
from streamforge_data_pipeline_spark.sources.store import TableStore

N_CELLS = 8


def _resolve_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    store: TableStore,
    corpus_table: str,
    log_table: str,
    tau: float,
    batch_id: int | None = None,
    run_id: str | None = None,
) -> None:
    from streamforge_data_pipeline_spark.streaming.exact_dedup_stream import (
        _replay_guard_decision,
    )

    marker = f"{log_table}__last_batch"
    log_exists = os.path.exists(store.path(log_table))
    guard, owns = _replay_guard_decision(
        spark, store, marker, log_exists, batch_id, run_id
    )
    if guard:
        if log_exists:
            seen_log = store.read(spark, log_table)
            # crash-window repair: 'admitted' log rows whose corpus row
            # is missing are re-appended from the replayed batch before
            # the guard drops them (the log is the decision source; the
            # probe index converges to it — see near_dedup_stream).
            replay_admitted = batch_df.join(
                seen_log.filter(F.col("origin") == "admitted").select("vec_id"),
                "vec_id",
                "left_semi",
            )
            if os.path.exists(store.path(corpus_table)):
                replay_admitted = replay_admitted.join(
                    store.read(spark, corpus_table).select("vec_id"),
                    "vec_id",
                    "left_anti",
                )
            replay_admitted = replay_admitted.localCheckpoint(eager=True)
            if replay_admitted.count():
                store.append(replay_admitted, corpus_table)
            batch_df = batch_df.join(
                seen_log.select("vec_id"), "vec_id", "left_anti"
            )
        if os.path.exists(store.path(corpus_table)):
            batch_df = batch_df.join(
                store.read(spark, corpus_table).select("vec_id"),
                "vec_id",
                "left_anti",
            )
    if batch_id is not None and run_id is not None:
        store.overwrite(
            spark.createDataFrame(
                [(run_id, batch_id, owns)],
                "run_id string, batch_id long, owns_store boolean",
            ),
            marker,
        )
    batch_df = batch_df.localCheckpoint(eager=True)

    # ---- 1. in-batch semantic resolution
    res = semantic_dedup_fixed_cells(
        batch_df, n_cells=N_CELLS, tau=tau, id_col="vec_id",
        vec_col="embedding",
    ).localCheckpoint(eager=True)
    members = res.filter(~F.col("keep"))
    batch_log = members.select(
        "vec_id",
        F.col("group_id").alias("dup_of"),
        F.lit(None).cast("double").alias("cosine"),
        F.lit("batch").alias("origin"),
    )
    reps = batch_df.join(
        res.filter(F.col("keep")).select("vec_id"), "vec_id", "left_semi"
    ).localCheckpoint(eager=True)

    # ---- 2. probe the admitted corpus within the quantizer cell. The
    # checkpoint pins decisions to the pre-append corpus state (the
    # probe's lazy plan would otherwise self-match after the append).
    if os.path.exists(store.path(corpus_table)):
        index = store.read(spark, corpus_table)
        # zero-norm guard on BOTH probe sides (r5 advice): 0/0 cosine is
        # NaN and Spark's NaN >= tau is TRUE, so an unguarded zero
        # vector would log as a duplicate of every same-cell corpus row.
        probe_side = reps.select(
            "vec_id",
            F.col("embedding").alias("__v"),
            argmax_cell("embedding", N_CELLS).alias("cell"),
            F.sqrt(dot_double(F.col("embedding"), F.col("embedding"))).alias("__n"),
        ).filter(F.col("__n") > 0)
        index_side = index.select(
            F.col("vec_id").alias("__c_id"),
            F.col("embedding").alias("__cv"),
            argmax_cell("embedding", N_CELLS).alias("cell"),
            F.sqrt(dot_double(F.col("embedding"), F.col("embedding"))).alias("__cn"),
        ).filter(F.col("__cn") > 0)
        hits = (
            probe_side.join(index_side, "cell")
            .withColumn(
                "__sim",
                dot_double(F.col("__v"), F.col("__cv"))
                / (F.col("__n") * F.col("__cn")),
            )
            .filter(F.col("__sim") >= tau)
            # deterministic pick: the LOWEST indexed id among matches,
            # carrying its cosine (struct min orders by id first)
            .groupBy("vec_id")
            .agg(F.min(F.struct(F.col("__c_id"), F.col("__sim"))).alias("__m"))
            .select(
                "vec_id",
                F.col("__m.__c_id").alias("dup_of"),
                F.round(F.col("__m.__sim"), 4).alias("cosine"),
            )
        )
        probed = (
            reps.select("vec_id")
            .join(hits, "vec_id", "left")
            .localCheckpoint(eager=True)
        )
        index_log = probed.filter(F.col("dup_of").isNotNull()).select(
            "vec_id", "dup_of", "cosine", F.lit("index").alias("origin")
        )
        novel_ids = probed.filter(F.col("dup_of").isNull()).select("vec_id")
    else:
        index_log = None
        novel_ids = reps.select("vec_id")

    # ---- 3. log FIRST, then admit (same crash-ordering argument as
    # near_dedup_stream: the log is the replay guard's source of truth;
    # a log-committed/corpus-missing batch is backfilled on redelivery)
    admitted = reps.join(novel_ids, "vec_id", "left_semi")
    log = batch_log if index_log is None else batch_log.unionByName(index_log)
    admitted_log = admitted.select(
        "vec_id",
        F.lit(None).cast("long").alias("dup_of"),
        F.lit(None).cast("double").alias("cosine"),
        F.lit("admitted").alias("origin"),
    )
    store.append(log.unionByName(admitted_log), log_table)
    store.append(admitted, corpus_table)


def start_stream_semantic_dedup(
    spark: SparkSession,
    input_dir: str,
    store: TableStore,
    checkpoint_dir: str,
    tau: float = 0.4,
    corpus_table: str = "vec_corpus",
    log_table: str = "semantic_dup_log",
    max_files_per_trigger: int = 1,
    available_now: bool = True,
    path_glob_filter: str | None = None,
) -> StreamingQuery:
    """Tail ``input_dir`` for parquet embedding files and run the
    resolve/probe/admit pipeline per micro-batch. Returns the running
    query; with ``available_now`` it drains the present files and
    stops. ``path_glob_filter`` scopes a mixed-table directory to the
    embedding files."""
    reader = spark.readStream.schema(
        "vec_id long, embedding array<float>"
    ).option("maxFilesPerTrigger", max_files_per_trigger)
    if path_glob_filter is not None:
        reader = reader.option("pathGlobFilter", path_glob_filter)
    stream = reader.parquet(input_dir)

    run_id = os.path.abspath(checkpoint_dir)

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        _resolve_batch(
            batch_df.sparkSession,
            batch_df,
            store,
            corpus_table,
            log_table,
            tau,
            batch_id=batch_id,
            run_id=run_id,
        )

    writer = stream.writeStream.foreachBatch(commit).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
