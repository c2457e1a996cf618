"""Bounded admission for streaming jobs (reference parity:
config/AsyncConfig.java:13-21 — ThreadPoolTaskExecutor with
corePoolSize 5, maxPoolSize 10, queueCapacity 500; a submit beyond a
full queue is rejected by the executor's abort policy).

The Spark analog: a streaming query occupies a long-lived slot in the
shared SparkSession, so an unbounded ``start_stream_ingest`` loop in
a multi-tenant service would pile up state stores, file-source
listings and scheduler pressure. ``JobPool`` gates starts:

- at most ``max_concurrent`` ACTIVE queries (default 10 = reference
  maxPoolSize);
- up to ``queue_capacity`` deferred jobs (default 500), started
  oldest-first as slots free;
- beyond that, REJECTED — recorded in the job's StatusStore entry,
  mirroring how the reference surfaces RejectedExecutionException.

Slot release is detected by polling ``StreamingQuery.isActive`` — a
``pump()`` runs on every submit, and callers (or a
StreamingQueryListener wired to ``attach_listener``) can pump on
query termination for immediate handover.
"""

from __future__ import annotations

import threading
from collections import deque
from dataclasses import dataclass, field
from typing import Callable

from streamforge_data_pipeline_spark.streaming.status import Status, StatusStore

MAX_CONCURRENT = 10  # AsyncConfig.java:16 (maxPoolSize)
QUEUE_CAPACITY = 500  # AsyncConfig.java:17 (queueCapacity)


@dataclass
class _Pending:
    job_id: str
    start_fn: Callable[[], object]
    status: StatusStore


@dataclass
class JobPool:
    max_concurrent: int = MAX_CONCURRENT
    queue_capacity: int = QUEUE_CAPACITY
    _active: dict[str, object] = field(default_factory=dict)
    _queue: deque = field(default_factory=deque)
    _lock: threading.Lock = field(default_factory=threading.Lock)

    def submit(
        self,
        job_id: str,
        start_fn: Callable[[], object],
        status: StatusStore | None = None,
    ) -> str:
        """Start the job now, queue it, or reject it.

        ``start_fn`` is a zero-arg closure returning a (duck-typed)
        StreamingQuery; it runs only when a slot is available, so a
        queued job costs nothing until admitted. Returns "RUNNING",
        "QUEUED" or "REJECTED" (also recorded in ``status``).
        """
        status = status or StatusStore()
        with self._lock:
            self._prune_locked()
            if len(self._active) < self.max_concurrent:
                return self._start_locked(_Pending(job_id, start_fn, status))
            if len(self._queue) < self.queue_capacity:
                self._queue.append(_Pending(job_id, start_fn, status))
                status.put(job_id, Status("QUEUED", f"behind {len(self._queue) - 1} jobs"))
                return "QUEUED"
            status.put(
                job_id,
                Status("REJECTED", f"pool full: {self.max_concurrent} active, "
                                   f"{len(self._queue)} queued"),
            )
            return "REJECTED"

    def pump(self) -> int:
        """Release finished queries' slots and start queued jobs,
        oldest first. Returns how many queued jobs were started."""
        started = 0
        with self._lock:
            self._prune_locked()
            while self._queue and len(self._active) < self.max_concurrent:
                self._start_locked(self._queue.popleft())
                started += 1
        return started

    def query(self, job_id: str):
        with self._lock:
            return self._active.get(job_id)

    def active_count(self) -> int:
        with self._lock:
            self._prune_locked()
            return len(self._active)

    def queued_count(self) -> int:
        with self._lock:
            return len(self._queue)

    # -- internals (call with lock held) --

    def _prune_locked(self) -> None:
        for job_id in [j for j, q in self._active.items() if not getattr(q, "isActive", False)]:
            del self._active[job_id]

    def _start_locked(self, p: _Pending) -> str:
        self._active[p.job_id] = p.start_fn()
        return "RUNNING"

    def attach_listener(self, spark) -> None:
        """Pump immediately when any streaming query terminates (best
        effort — polling via submit()/pump() is the guaranteed path)."""
        from pyspark.sql.streaming import StreamingQueryListener

        pool = self

        class _PumpOnTerminate(StreamingQueryListener):
            def onQueryStarted(self, event):  # noqa: N802
                pass

            def onQueryProgress(self, event):  # noqa: N802
                pass

            def onQueryIdle(self, event):  # noqa: N802
                pass

            def onQueryTerminated(self, event):  # noqa: N802
                pool.pump()

        spark.streams.addListener(_PumpOnTerminate())
