"""Streaming progress monitoring: per-micro-batch JSONL artifact +
degradation summary (streaming/monitor.py).

The artifact contract is what an operator of an unbounded ingest relies
on, so the Spark test asserts the RECORDED numbers against the corpus
(source rows per batch are pre-filter, so they must sum to the corpus
size), not just file existence.
"""

import os

from data_quality_check_pipeline_spark.streaming.monitor import (
    PROGRESS_FILE,
    StreamProgressRecorder,
    summarize_progress,
)
from data_quality_check_pipeline_spark.streaming.stream import (
    start_quality_stream,
)


class TestRecorderLive:
    def test_drain_records_progress(self, spark, corpus, tmp_path):
        df, _, path = corpus
        src = str(tmp_path / "src")
        os.makedirs(src)
        os.symlink(path, os.path.join(src, "clips.parquet"))
        out = str(tmp_path / "out")
        q = start_quality_stream(
            spark, src, out, str(tmp_path / "ckpt"), available_now=True
        )
        q.awaitTermination(timeout=600)
        rec = q.progress_recorder
        try:
            assert rec is not None
            # events are async; the data batch must arrive, the trailing
            # empty availableNow batch may or may not have fired yet
            recs = rec.wait_for_batches(1, timeout_s=15.0)
            assert recs, "no progress events recorded"
            assert rec.path == os.path.join(
                out, "monitoring", PROGRESS_FILE
            )
            ids = [r["batch_id"] for r in recs]
            assert len(ids) == len(set(ids)), "duplicate batch ids"
            # source-level input rows are pre-filter: they sum to the
            # corpus size (every nonzero batch), regardless of verdicts
            assert sum(r["num_input_rows"] for r in recs) == len(df)
            assert all(
                r["query_name"].startswith("clip_quality_stream@")
                for r in recs
            )
            data_batches = [r for r in recs if r["num_input_rows"]]
            assert all(
                r["trigger_execution_ms"] > 0 for r in data_batches
            )
            s = rec.summary()
            assert s["total_input_rows"] == len(df)
            assert s["nonempty_batches"] == len(data_batches)
        finally:
            rec.detach()

    def test_listener_scoped_to_own_stream(self, spark, corpus, tmp_path):
        """Two sequential streams in one session: each out_root's
        artifact holds only its own query's batches (the session-global
        listener filters on the per-stream-identity query name)."""
        _, _, path = corpus
        outs = []
        for leg in ("a", "b"):
            src = str(tmp_path / f"src_{leg}")
            os.makedirs(src)
            os.symlink(path, os.path.join(src, "clips.parquet"))
            out = str(tmp_path / f"out_{leg}")
            q = start_quality_stream(
                spark, src, out, str(tmp_path / f"ckpt_{leg}"),
                available_now=True,
            )
            q.awaitTermination(timeout=600)
            q.progress_recorder.wait_for_batches(1, timeout_s=15.0)
            outs.append((out, q.progress_recorder))
        try:
            names = set()
            for out, rec in outs:
                recs = rec.records()
                assert recs
                qn = {r["query_name"] for r in recs}
                assert len(qn) == 1, "foreign query leaked into artifact"
                names |= qn
            assert len(names) == 2, "streams shared a query name"
        finally:
            for _, rec in outs:
                rec.detach()


class TestSummarize:
    def _rec(self, batch_id, rows, rps, ms=1000):
        return {
            "batch_id": batch_id,
            "num_input_rows": rows,
            "processed_rows_per_second": rps,
            "trigger_execution_ms": ms,
        }

    def test_degraded_batch_flagged(self):
        recs = [
            self._rec(0, 100, 1000.0),
            self._rec(1, 100, 900.0),
            self._rec(2, 100, 1100.0),
            self._rec(3, 100, 100.0),  # < 0.5 * median(=950..1000)
            self._rec(4, 0, 0.0),  # trailing empty: excluded
        ]
        s = summarize_progress(recs)
        assert s["batches"] == 5
        assert s["nonempty_batches"] == 4
        assert s["total_input_rows"] == 400
        assert [d["batch_id"] for d in s["degraded_batches"]] == [3]

    def test_empty_batches_never_degrade(self):
        recs = [self._rec(i, 100, 1000.0) for i in range(3)] + [
            self._rec(3, 0, 0.0),
            self._rec(4, 0, 0.0),
        ]
        s = summarize_progress(recs)
        assert s["degraded_batches"] == []

    def test_too_few_batches_no_verdict(self):
        # medians over 1-2 batches are noise — no degradation verdict
        recs = [self._rec(0, 100, 1000.0), self._rec(1, 100, 10.0)]
        assert summarize_progress(recs)["degraded_batches"] == []

    def test_empty_records(self):
        s = summarize_progress([])
        assert s["batches"] == 0
        assert s["total_input_rows"] == 0
        assert s["median_processed_rows_per_second"] is None

    def test_records_missing_file(self, tmp_path):
        rec = StreamProgressRecorder(str(tmp_path))
        assert rec.records() == []
        assert rec.summary()["batches"] == 0
