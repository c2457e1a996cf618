"""Streaming SCD2 maintenance: a CDC-style update stream keeps a
slowly-changing dimension current via foreachBatch + the batch
scd2_apply operator.

Snapshots are versioned (``v=<batch_id>`` subdirectories) so each
microbatch reads the previous snapshot and writes a new one — never
overwriting the files it is reading, which is the classic
parquet-self-overwrite corruption trap. At scale the same pattern
backs onto a table format with atomic commits (Delta/Iceberg); the
versioned-directory scheme is the dependency-free equivalent with the
same read-committed behavior, and old versions double as time travel.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.streaming import StreamingQuery

from streamforge_data_pipeline_spark.operators.merge import scd2_apply


def _committed(root: str, d: str) -> bool:
    """A snapshot directory counts only once Spark's commit protocol
    has written its _SUCCESS marker. A crash mid-write of v=N leaves a
    partial directory; treating it as current would both serve a torn
    snapshot and make the recovering re-run of batch N merge against
    its own partial output, silently losing rows."""
    return os.path.isfile(os.path.join(root, d, "_SUCCESS"))


def _versions(root: str, committed_only: bool = True) -> list[int]:
    if not os.path.isdir(root):
        return []
    return sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(root)
        if d.startswith("v=")
        and d.split("=", 1)[1].isdigit()
        and (not committed_only or _committed(root, d))
    )


def _latest_version(spark: SparkSession, root: str) -> int | None:
    versions = _versions(root)
    return max(versions) if versions else None


def read_current(spark: SparkSession, root: str) -> DataFrame | None:
    """Latest committed SCD2 snapshot, or None before the first one."""
    v = _latest_version(spark, root)
    if v is None:
        return None
    return spark.read.parquet(os.path.join(root, f"v={v}"))


def seed_snapshot(initial: DataFrame, store_root: str) -> None:
    """Bootstrap an existing dimension into the versioned store as
    ``v=0`` before the update stream starts — the CDC-onboarding step
    (batch backfill first, stream takes over). ``initial`` must already
    carry the SCD2 bookkeeping columns (valid_from/valid_to/is_current).
    Batches commit at ``v=batch_id + 1``, so the seed slot can never be
    overwritten by a replayed batch 0."""
    if _versions(os.fspath(store_root), committed_only=False):
        raise ValueError(f"store {store_root!r} is not empty; refusing to seed")
    initial.write.mode("error").parquet(os.path.join(store_root, "v=0"))


def start_scd2_maintenance(
    updates_stream: DataFrame,
    store_root: str,
    checkpoint: str,
    key: str,
    attrs: list[str],
    eff_col: str = "eff_ts",
) -> StreamingQuery:
    """Maintain an SCD2 dimension from a stream of update rows.

    Within a microbatch, the latest update per key wins (by
    ``eff_col``, ties by the other columns' hash) — intermediate
    states inside one batch are collapsed, the standard CDC-compaction
    semantics. Batches then apply sequentially, so history across
    batches is preserved exactly.

    Batch N commits snapshot ``v=N+1`` (idempotent: a recovering
    replay of batch N overwrites its own version, never a neighbor);
    ``v=0`` is reserved for an optional :func:`seed_snapshot`
    bootstrap of a pre-existing dimension.
    """
    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        w = Window.partitionBy(key).orderBy(
            F.col(eff_col).desc(), F.xxhash64(*[F.col(c) for c in attrs])
        )
        latest = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        current = read_current(spark, store_root)
        if current is None:
            merged = latest.select(
                key,
                *attrs,
                F.col(eff_col).alias("valid_from"),
                F.lit(None).cast("timestamp").alias("valid_to"),
                F.lit(True).alias("is_current"),
            )
        else:
            merged = scd2_apply(current, latest, key=key, attrs=attrs,
                                eff_col=eff_col)
        merged.write.mode("overwrite").parquet(
            os.path.join(store_root, f"v={batch_id + 1}")
        )

    return (
        updates_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def vacuum_snapshots(root: str, keep: int = 3) -> list[int]:
    """Delete all but the newest ``keep`` committed snapshot versions
    plus any marker-less partial directories (crashed writes); returns
    the dropped version numbers. The current committed version is
    never dropped (keep is clamped to >= 1), so readers of
    read_current() are safe; concurrent readers of an older version
    should pin it before a vacuum, same contract as table-format
    VACUUM. Single-writer assumption: don't vacuum while a merge batch
    is in flight, or its in-progress (marker-less) output is removed."""
    import shutil

    keep = max(1, keep)
    committed = _versions(root, committed_only=True)
    partial = [v for v in _versions(root, committed_only=False) if v not in committed]
    drop = sorted(committed[:-keep] + partial)
    for v in drop:
        shutil.rmtree(os.path.join(root, f"v={v}"))
    return drop
