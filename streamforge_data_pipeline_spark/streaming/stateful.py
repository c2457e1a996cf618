"""Custom stateful streaming operators (applyInPandasWithState).

The reference's only state is the job-status map (SURVEY §2.8); a
training-data pipeline needs richer keyed state — running per-key
counters, session accumulation — maintained incrementally as events
stream in. `applyInPandasWithState` is Spark's arbitrary-stateful
operator: state lives in the state store (checkpointed, fault
tolerant), batches arrive as pandas frames per key.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_event_id", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("last_id", T.LongType()),
    ]
)


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Keyed running aggregates: per user, cumulative event count,
    value total, and the max event id seen — updated per micro-batch,
    emitted on every update (the streaming analog of the job-status
    last-write-wins map, generalized to arbitrary accumulators)."""

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, total, last_id = state.get
        else:
            n, total, last_id = 0, 0.0, -1
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                last_id = max(last_id, int(pdf["event_id"].max()))
        state.update((n, total, last_id))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "last_event_id": [last_id],
            }
        )

    return events_stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


DEDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("dup_of", T.LongType()),
    ]
)

DEDUP_STATE_SCHEMA = T.StructType([T.StructField("first_id", T.LongType())])


def dedup_stream(
    docs_stream: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    ttl_minutes: int | None = None,
) -> DataFrame:
    """Cross-micro-batch exact content dedup: the streaming counterpart
    of operators/dedup.exact_dedup, for continuous corpus ingestion.
    Every arriving row is emitted annotated — ``dup_of`` NULL for the
    first occurrence of its sha256(content), else the doc_id that
    claimed the hash first — so a downstream filter keeps uniques while
    the duplicate stream still feeds observability counts. Within one
    batch the LOWEST doc_id wins (sorted before the scan), matching the
    batch operator's deterministic first-wins; across batches the
    winner is whoever the state saw first.

    Why custom state instead of the built-in
    ``dropDuplicatesWithinWatermark``: the built-in silently DROPS
    duplicates and scopes state by event-time watermark; training-data
    ingestion wants the annotate-don't-drop shape (same as
    lsh_probe_dedup's output contract) and processing-time state TTL
    (``ttl_minutes``) independent of any event-time column. TTL is the
    standard bounded-state trade: a duplicate arriving after its
    hash's state expired is re-admitted as a first — size the TTL to
    the dedup horizon the pipeline contracts for (set None for
    unbounded state: exactness for as long as the store holds).
    Operational caveat: drain TTL'd queries with ``Trigger.Once`` or a
    processing-time trigger — ``availableNow`` keeps scheduling
    batches to service future state timeouts and never terminates
    (pinned in tests/test_streaming_dedup.py).

    Scale notes: state per key is ONE long (the winning doc_id) keyed
    by the 64-char hash — ~80 bytes/doc in the state store; at cluster
    scale run it RocksDB-backed via session.enable_rocksdb_state
    (wired + green under both providers in
    tests/test_state_store_providers.py); the shuffle key is the hash,
    so arriving
    batches partition evenly regardless of content skew. The pandas
    frames per key are duplicate groups — tiny; no batch-wide
    collection anywhere.
    """
    hashed = docs_stream.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.sha2(F.col(text).cast("binary"), 256).alias("content_hash"),
    )
    update = _make_dedup_update(ttl_minutes)
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    return hashed.groupBy("content_hash").applyInPandasWithState(
        update,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


def _make_dedup_update(ttl_minutes: int | None):
    """Build dedup_stream's per-key state function. Module-level (not a
    closure inside dedup_stream) so the cross-chunk contract is unit-
    testable with a fake GroupState and hand-built chunk iterators —
    chunk boundaries are an Arrow batching artifact Spark won't let a
    test place deterministically."""

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        first = state.get[0] if state.exists else None
        # Accumulate ACROSS every pandas chunk before deciding the
        # winner: applyInPandasWithState delivers a key's batch rows as
        # an iterator of chunks (split at arrow.maxRecordsPerBatch), so
        # computing min per-chunk would pin "first" to chunk 1's
        # minimum and break the documented lowest-id-wins determinism
        # for duplicate groups larger than one chunk (pinned in
        # tests/test_streaming_dedup.py::test_dedup_group_spanning_chunks).
        ids: list[int] = []
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf["doc_id"])
        ids.sort()
        if first is None and ids:
            first = ids[0]
            dups: list[Any] = [None] + [first] * (len(ids) - 1)
        else:
            dups = [first] * len(ids)
        state.update((first,))
        if ttl_minutes is not None:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        if ids:
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "content_hash": [key[0]] * len(ids),
                    "dup_of": dups,
                }
            )

    return update
