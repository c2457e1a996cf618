"""Continuous per-domain admission caps: the streaming twin of
operators.web.domain_caps — the C4/RefinedWeb anti-dominance rule
applied AT INGESTION TIME, so a crawl that suddenly floods one domain
is capped as it arrives instead of in a later batch sweep.

Contract (the r7 streaming-dedup-matrix shape — resolve/probe/admit/
log): per micro-batch (foreachBatch, blocking, per-batch atomic):

1. normalize each new doc's URL to its domain (pure Column exprs);
2. rank the batch's docs WITHIN domain by (hash60(id), id) — the
   deterministic order every sampler in this repo uses;
3. probe the bounded per-domain counter state: a doc admits iff
   prior_admitted + batch_rank <= k;
4. append one decision row per doc (doc_id, domain, rk, admitted) to
   the log — rk is the doc's cumulative rank within its domain, so
   the log REPLAYS the cap decision (admitted == rk <= k always);
5. overwrite the counter state with prior + newly admitted.

State: one row per domain (domain, n_admitted) — bounded by domain
cardinality (~10^7 for a 10^10-page crawl), broadcastable to the
probe join; never corpus-sized. The decision log is append-only,
guarded by the exact_dedup_stream lineage marker (at-least-once
foreachBatch: a replayed batch would re-append decisions; the marker
gates a log anti-join to exactly the replay/fresh-lineage cases).

Drain semantics: with an empty store and one batch, rk is exactly the
batch-wide within-domain rank, so the decision log equals the batch
domain_caps ranking with an admitted flag — SQL-oracle-checkable.
Cross-batch cap invariants (never more than k admitted per domain,
first-come admission across batches) are pytest-asserted.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from streamforge_data_pipeline_spark.functions import hash60
from streamforge_data_pipeline_spark.operators.web import normalized_host
from streamforge_data_pipeline_spark.sources.store import TableStore
from streamforge_data_pipeline_spark.streaming.exact_dedup_stream import (
    _replay_guard_decision,
)

LOG_TABLE = "domain_cap_log"
COUNTS_TABLE = "domain_cap_counts"
MARKER_TABLE = "domain_cap_marker"


def _commit_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    store: TableStore,
    k: int,
    id_col: str,
    url_col: str,
    batch_id: int | None = None,
    run_id: str | None = None,
) -> None:
    from pyspark.sql import Window

    log_exists = os.path.exists(store.path(LOG_TABLE))
    guard, owns = _replay_guard_decision(
        spark, store, MARKER_TABLE, log_exists, batch_id, run_id
    )
    if batch_id is not None and run_id is not None:
        # marker BEFORE any append: crash mid-commit -> guarded re-run
        store.overwrite(
            spark.createDataFrame(
                [(run_id, batch_id, owns)],
                "run_id string, batch_id long, owns_store boolean",
            ),
            MARKER_TABLE,
        )

    d = (
        batch_df.select(
            F.col(id_col).alias("doc_id"),
            normalized_host(url_col).alias("domain"),
            hash60(F.col(id_col).cast("string")).alias("h"),
        )
        .dropDuplicates(["doc_id"])
    )
    if guard and log_exists:
        seen = store.read(spark, LOG_TABLE).select("doc_id").distinct()
        d = d.join(seen, "doc_id", "left_anti")

    counts_exist = os.path.exists(store.path(COUNTS_TABLE))
    if counts_exist:
        prior = store.read(spark, COUNTS_TABLE)
    else:
        prior = spark.createDataFrame([], "domain string, n_admitted long")

    w = Window.partitionBy("domain").orderBy("h", "doc_id")
    decided = (
        d.withColumn("__rkb", F.row_number().over(w))
        .join(F.broadcast(prior), "domain", "left")
        .select(
            "doc_id",
            "domain",
            (F.coalesce(F.col("n_admitted"), F.lit(0)) + F.col("__rkb"))
            .cast("int")
            .alias("rk"),
        )
        .withColumn("admitted", F.col("rk") <= k)
        .localCheckpoint(eager=True)  # decisions feed log AND counts
    )
    store.append(decided.select("doc_id", "domain", "rk", "admitted"), LOG_TABLE)
    new_counts = (
        decided.filter("admitted")
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("__new"))
        .join(prior, "domain", "full")
        .select(
            "domain",
            (
                F.coalesce(F.col("n_admitted"), F.lit(0))
                + F.coalesce(F.col("__new"), F.lit(0))
            ).alias("n_admitted"),
        )
        .localCheckpoint(eager=True)  # we overwrite our own input path
    )
    store.overwrite(new_counts, COUNTS_TABLE)


def start_stream_domain_caps(
    spark: SparkSession,
    input_dir: str,
    store: TableStore,
    checkpoint_dir: str,
    schema: str,
    k: int = 20,
    id_col: str = "doc_id",
    url_col: str = "url",
    max_files_per_trigger: int = 1,
    available_now: bool = True,
    path_glob_filter: str | None = None,
) -> StreamingQuery:
    """Tail ``input_dir`` for (id, url) parquet and run the capped
    admission per micro-batch."""
    reader = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", max_files_per_trigger
    )
    if path_glob_filter:
        reader = reader.option("pathGlobFilter", path_glob_filter)
    stream = reader.parquet(input_dir)

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        _commit_batch(
            batch_df.sparkSession,
            batch_df,
            store,
            k,
            id_col,
            url_col,
            batch_id=batch_id,
            run_id=checkpoint_dir,
        )

    writer = stream.writeStream.foreachBatch(commit).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
