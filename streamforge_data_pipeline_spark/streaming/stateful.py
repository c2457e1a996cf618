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

from pyspark.sql import DataFrame
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
