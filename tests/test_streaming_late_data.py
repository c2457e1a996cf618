"""Watermark late-data semantics (r4 brief #4): genuinely LATE rows —
behind the advanced watermark — must be dropped, bounded-late rows
within the watermark must be counted, and windows the watermark has
not passed must stay unemitted in append mode.

Mechanics: three parquet files processed as separate micro-batches
(maxFilesPerTrigger=1, modtimes force order). Spark's watermark for
batch N derives from event times through batch N-1 (one-batch lag),
so the late row is injected two batches after the data that advances
the watermark past its window. The final no-data micro-batch
(noDataMicroBatches, on by default) flushes every window the final
watermark passed; append-mode memory sink then contains exactly the
finalized windows."""

from __future__ import annotations

import glob
import os
import shutil
import time
from datetime import datetime

from streamforge_data_pipeline_spark.operators.windows import (
    session_counts,
    tumbling_counts,
)
from streamforge_data_pipeline_spark.streaming.event_time import watermarked

BASE = "2024-03-01 "


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(BASE + s)


def _write_batches(spark, tmp_path, batches, schema):
    """One plain parquet FILE per micro-batch, modtime-ordered so the
    file stream source (maxFilesPerTrigger=1) processes them in
    sequence."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    now = time.time()
    for i, rows in enumerate(batches):
        tmp = str(tmp_path / f"_tmp_b{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(tmp)
        (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        target = os.path.join(src, f"b{i}.parquet")
        shutil.move(part, target)
        shutil.rmtree(tmp)
        t = now - 120 + i * 30
        os.utime(target, (t, t))
    return src


def _run_append(stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_tumbling_drops_late_keeps_bounded_late(spark, tmp_path):
    schema = "ts timestamp, event_type string, value double"
    batches = [
        # b0: max event time 03:00 -> watermark 02:00 from b1 on
        [(_ts("00:30:00"), "click", 1.0), (_ts("03:00:00"), "click", 1.0)],
        # b1 (wm 02:00): [00:00,01:00) finalizes and emits with n=1;
        # 03:30 pushes the NEXT watermark to 02:30
        [(_ts("03:30:00"), "click", 1.0)],
        # b2 (wm 02:30):
        [
            (_ts("00:40:00"), "click", 1.0),  # LATE: window closed -> dropped
            (_ts("02:30:00"), "click", 1.0),  # bounded-late: exactly at wm -> counted
            (_ts("05:00:00"), "click", 1.0),  # fresh: final wm 04:00
        ],
    ]
    src = _write_batches(spark, tmp_path, batches, schema)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    _run_append(tumbling_counts(watermarked(stream, "ts", "1 hour")), "late_tumbling")
    got = {
        (str(r["window_start"]), r["n"]) for r in spark.table("late_tumbling").collect()
    }
    assert got == {
        (BASE + "00:00:00", 1),  # n=1: the late 00:40 row did NOT inflate it
        (BASE + "02:00:00", 1),  # the bounded-late 02:30 row counted
        (BASE + "03:00:00", 2),  # 03:00 + 03:30
        # [05:00,06:00) absent: watermark (04:00) never passed it
    }


def test_session_drops_late_keeps_unclosed_session_unemitted(spark, tmp_path):
    schema = "ts timestamp, user_id long"
    batches = [
        # user 7: session [00:00, 00:07) (5-min gap), then a 03:00 session
        [(_ts("00:00:00"), 7), (_ts("00:02:00"), 7), (_ts("03:00:00"), 7)],
        # b1 (wm 02:00): emits 7's first session with n_events=2
        [(_ts("03:30:00"), 9)],
        # b2 (wm 02:30): the 00:03 row would have extended 7's CLOSED
        # first session -> dropped; 06:00 pushes the final wm to 05:00
        [(_ts("00:03:00"), 7), (_ts("06:00:00"), 9)],
    ]
    src = _write_batches(spark, tmp_path, batches, schema)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    _run_append(session_counts(watermarked(stream, "ts", "1 hour")), "late_session")
    got = {
        (r["user_id"], str(r["session_start"]), r["n_events"])
        for r in spark.table("late_session").collect()
    }
    assert got == {
        (7, BASE + "00:00:00", 2),  # late 00:03 did not extend it to 3
        (7, BASE + "03:00:00", 1),
        (9, BASE + "03:30:00", 1),
        # user 9's 06:00 session absent: still open at final wm 05:00
    }
