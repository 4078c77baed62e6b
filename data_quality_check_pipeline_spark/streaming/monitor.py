"""Streaming progress monitoring: per-micro-batch progress as a durable
artifact plus a throughput-degradation summary.

The batch pipeline already lands metrics artifacts per run (metrics.py:
JSON + Prometheus + alert rules + dashboard); a long-running stream had
NOTHING — operators of an unbounded 10^12-clip ingest need per-batch
input rate, processing rate and trigger latency to see lag building
BEFORE the checkpoint falls hours behind. Reference parity:
metrics_collector.py's run-level metrics, re-expressed for the
micro-batch axis.

Mechanism: a ``StreamingQueryListener`` (driver-side, event-pushed — no
polling thread, works for unbounded streams, keeps recording across
query restarts) appends one JSON line per micro-batch to
``<out_root>/monitoring/stream_progress.jsonl``. JSONL, not a Spark
table: progress rows are driver-scale (one per trigger, not per clip),
must be appendable without a snapshot commit, and are read by humans /
scrapers while the stream is live. Same driver-local write contract as
report.py's artifacts.

``summary()`` folds the file into one dict (batch count, row totals,
rate percentiles) and flags DEGRADED batches — non-empty batches whose
processed rows/sec fell below ``degraded_frac`` x the median non-empty
batch. The CLI prints it after a drain; an operator tails the JSONL.
"""

from __future__ import annotations

import json
import os
import statistics

from pyspark.sql.streaming.listener import StreamingQueryListener

PROGRESS_FILE = "stream_progress.jsonl"
STREAM_QUERY_NAME = "clip_quality_stream"


class StreamProgressRecorder(StreamingQueryListener):
    """Append one JSONL record per micro-batch of the named query.

    Listener callbacks arrive on a background py4j thread AFTER the
    batch commits, possibly after ``awaitTermination`` returns — readers
    that need the final batch should poll via :meth:`wait_for_batches`
    rather than assuming synchronous delivery.

    Only events whose progress ``name`` matches ``query_name`` are
    recorded (a session-global listener sees every query in the
    session); pass ``query_name=None`` to record all queries.
    """

    def __init__(self, out_root: str, query_name: str | None = STREAM_QUERY_NAME):
        self._dir = os.path.join(out_root, "monitoring")
        self.path = os.path.join(self._dir, PROGRESS_FILE)
        self.query_name = query_name
        self._spark = None  # set by attach()

    # -- listener callbacks -------------------------------------------
    def onQueryStarted(self, event):
        pass

    def onQueryIdle(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        if self.query_name is not None and p.name != self.query_name:
            return
        dur = dict(p.durationMs or {})
        rec = {
            "ts": p.timestamp,
            "query_name": p.name,
            "query_id": str(p.id),
            "run_id": str(p.runId),
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "input_rows_per_second": p.inputRowsPerSecond,
            "processed_rows_per_second": p.processedRowsPerSecond,
            "trigger_execution_ms": dur.get("triggerExecution"),
            "add_batch_ms": dur.get("addBatch"),
        }
        os.makedirs(self._dir, exist_ok=True)
        # single-line append + flush: one event at a time per listener
        # bus, so lines never interleave; a crash loses at most the
        # in-flight line (the artifact is advisory, the data-path
        # exactly-once guards live in the sink, not here)
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
            f.flush()

    def onQueryTerminated(self, event):
        pass

    # -- lifecycle -----------------------------------------------------
    def attach(self, spark) -> "StreamProgressRecorder":
        spark.streams.addListener(self)
        self._spark = spark
        return self

    def detach(self) -> None:
        if self._spark is not None:
            self._spark.streams.removeListener(self)
            self._spark = None

    # -- readers ---------------------------------------------------------
    def records(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def wait_for_batches(self, n: int, timeout_s: float = 10.0) -> list[dict]:
        """Poll until >= n recorded batches (events are async) or timeout;
        returns whatever is recorded either way."""
        import time

        deadline = time.time() + timeout_s
        recs = self.records()
        while len(recs) < n and time.time() < deadline:
            time.sleep(0.2)
            recs = self.records()
        return recs

    def summary(self, degraded_frac: float = 0.5) -> dict:
        return summarize_progress(self.records(), degraded_frac)


def summarize_progress(records: list[dict], degraded_frac: float = 0.5) -> dict:
    """Fold progress records into one operator-facing dict.

    Degradation check deliberately compares processed rows/sec of
    NON-EMPTY batches only: availableNow drains end with an empty
    trailing batch and idle periods emit zero-row triggers, whose rates
    are meaningless (same reason the profile sink skips empty batches).
    """
    nonempty = [r for r in records if r.get("num_input_rows")]
    rates = [
        r["processed_rows_per_second"]
        for r in nonempty
        if r.get("processed_rows_per_second")
    ]
    degraded = []
    if len(rates) >= 3:
        med = statistics.median(rates)
        floor = degraded_frac * med
        degraded = [
            {
                "batch_id": r["batch_id"],
                "processed_rows_per_second": r["processed_rows_per_second"],
                "median": med,
            }
            for r in nonempty
            if r.get("processed_rows_per_second")
            and r["processed_rows_per_second"] < floor
        ]
    total_rows = sum(r.get("num_input_rows") or 0 for r in records)
    exec_ms = [
        r["trigger_execution_ms"]
        for r in nonempty
        if r.get("trigger_execution_ms") is not None
    ]
    return {
        "batches": len(records),
        "nonempty_batches": len(nonempty),
        "total_input_rows": total_rows,
        "trigger_execution_ms_sum": sum(exec_ms),
        "median_processed_rows_per_second": (
            statistics.median(rates) if rates else None
        ),
        "degraded_batches": degraded,
    }
