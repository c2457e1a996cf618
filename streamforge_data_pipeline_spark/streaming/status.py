"""Job-status state (A4 / §2.8 state machine).

The reference keeps a ConcurrentHashMap<String, Status> with
last-write-wins per jobId (CsvUploadService.java:20,46-49). Two
Spark-native statements of the same fact:

- relational: latest row per job_id over a status-event relation
  (window row_number desc — aggregates.latest_per_key);
- service-side: a StreamingQueryListener that mirrors streaming
  progress into an in-process dict for the polling endpoint
  (GET /api/uploads/status, CsvUploadController.java:59-68).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from streamforge_data_pipeline_spark.operators.aggregates import latest_per_key
from streamforge_data_pipeline_spark.schemas import JOB_STEPS


@dataclass
class Status:
    """CsvUploadService.java:25 — Status(step, message, processed, total)."""

    step: str
    message: str = ""
    processed_rows: int = 0
    total_rows: int = 0


NOT_FOUND = Status("NOT_FOUND", "unknown job")


@dataclass
class StatusStore:
    """Thread-safe last-write-wins map; progress updates throttled by
    the caller (every 5000 rows in the reference, :134)."""

    _lock: threading.Lock = field(default_factory=threading.Lock)
    _statuses: dict[str, Status] = field(default_factory=dict)

    def put(self, job_id: str, status: Status) -> None:
        assert status.step in JOB_STEPS, status.step
        with self._lock:
            self._statuses[job_id] = status

    def get(self, job_id: str) -> Status:
        with self._lock:
            return self._statuses.get(job_id, NOT_FOUND)


def status_latest(status_events: DataFrame) -> DataFrame:
    """Relational latest-status-per-job (batch analog of the map)."""
    return latest_per_key(status_events, "job_id", "seq")
