"""Streaming observability — per-micro-batch metrics capture.

The reference runs on Kinesis Data Analytics, which exports Flink job
metrics (records in/out, state size, watermark lag) to CloudWatch for
free; a Spark deployment gets the same signals from
``StreamingQueryListener`` progress events. This module packages the
listener so every job built on this engine can record throughput and
state-store growth per micro-batch — the two numbers that predict trouble
at scale (falling processedRowsPerSecond = the job can't keep up;
unbounded state rows = a missing watermark or an unclosable window).

Driver-side and allocation-light: one small dict per micro-batch, kept in
a bounded deque — safe to leave attached for the life of a job. For a
real deployment, subclass and forward to the metrics system of record
instead of (or as well as) the ring buffer.
"""

from __future__ import annotations

import threading
from collections import deque
from typing import Any

from pyspark.sql.streaming import StreamingQueryListener


class BatchMetricsListener(StreamingQueryListener):
    """Record per-batch progress for every streaming query on the session.

    Each entry: query name/id, batchId, numInputRows, input/processed
    rows-per-second, event-time watermark, and total state rows across
    stateful operators (session windows, tumbling aggs, dedup state)."""

    def __init__(self, max_entries: int = 10_000) -> None:
        # the listener bus appends from its own thread while callers read;
        # snapshot/append under a lock (iterating a deque that another
        # thread mutates raises RuntimeError)
        self._lock = threading.Lock()
        self.records: deque[dict[str, Any]] = deque(maxlen=max_entries)

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        state_rows = sum(op.numRowsTotal for op in p.stateOperators)
        with self._lock:
            self.records.append(
                {
                    "name": p.name,
                    "id": str(p.id),
                    "batch_id": p.batchId,
                    "num_input_rows": p.numInputRows,
                    "input_rows_per_sec": p.inputRowsPerSecond,
                    "processed_rows_per_sec": p.processedRowsPerSecond,
                    "watermark": p.eventTime.get("watermark"),
                    "state_rows": state_rows,
                }
            )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def for_query(self, name: str) -> list[dict[str, Any]]:
        with self._lock:
            snapshot = list(self.records)
        return [r for r in snapshot if r["name"] == name]


def attach_metrics(spark, max_entries: int = 10_000) -> BatchMetricsListener:
    """Attach a fresh recorder to the session; detach with
    ``spark.streams.removeListener(listener)`` when done."""
    listener = BatchMetricsListener(max_entries)
    spark.streams.addListener(listener)
    return listener
