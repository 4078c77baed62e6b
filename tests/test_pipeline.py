"""Pipeline orchestration tests: gates, quarantine, lineage resume,
idempotency, versioning — the control-plane parity with the reference
(tests/test_pipeline.py:763-823 threshold-branch tests are the model)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from data_quality_check_pipeline_spark.control import (
    CONTINUE,
    DISCARD,
    HALT,
    QUARANTINE,
    Thresholds,
    threshold_gate,
)
from data_quality_check_pipeline_spark.pipeline import (
    CLEAN_TABLE,
    LINEAGE_TABLE,
    QUARANTINE_TABLE,
    RunConfig,
    run_pipeline,
)
from data_quality_check_pipeline_spark.sources.tables import TableStore


class TestThresholdGate:
    def test_continue_within_hard_threshold(self):
        g = threshold_gate(1000, 30)  # 3% < 5%
        assert g.decision == CONTINUE

    def test_quarantine_above_hard(self):
        g = threshold_gate(1000, 100)  # 10% fail, 90% pass >= 80%
        assert g.decision == QUARANTINE

    def test_review_path_timeout_default(self):
        g = threshold_gate(1000, 300)  # 30% fail -> review; no file -> default
        assert g.decision == QUARANTINE and g.reviewed

    def test_review_file_decision(self, tmp_path):
        f = tmp_path / "decision.json"
        f.write_text(json.dumps({"decision": "halt"}))
        g = threshold_gate(
            1000, 300, review_decision_file=str(f), non_interactive=True
        )
        assert g.decision == HALT and g.reviewed

    def test_discard_decision(self, tmp_path):
        f = tmp_path / "decision.json"
        f.write_text(json.dumps({"decision": "discard"}))
        g = threshold_gate(1000, 300, review_decision_file=str(f))
        assert g.decision == DISCARD


class TestRunPipeline:
    def test_counts_and_tables(self, spark, corpus, oracle_df, out_root):
        _, _, path = corpus
        cfg = RunConfig(out_root=out_root, run_id="t1",
                        source_fingerprint="fp")
        m = run_pipeline(spark, path, cfg)
        store = TableStore(spark, out_root)
        expected_kept = int(oracle_df["keep"].sum())
        assert m["quality"]["kept"] == expected_kept
        assert store.read(CLEAN_TABLE).count() == expected_kept
        assert (
            store.read(QUARANTINE_TABLE).count()
            == len(oracle_df) - expected_kept
        )
        assert m["gate"]["decision"] == CONTINUE
        # metrics file written
        assert os.path.exists(
            os.path.join(out_root, "metrics", "metrics_t1.json")
        )
        # per-PII-type counters surface in the metrics quality block
        # (the synthetic corpus plants email/phone/tox PII)
        assert m["quality"]["pii_emails"] + m["quality"]["pii_phones"] > 0
        # per-module reports written (reference reports/*.txt parity)
        rep = os.path.join(out_root, "reports")
        for name in ("validation", "expectations", "profile",
                     "statistical", "mask_sample", "dlq"):
            p = os.path.join(rep, f"{name}_report_t1.txt")
            assert os.path.exists(p), p
        with open(os.path.join(rep, "validation_report_t1.txt")) as f:
            vtxt = f.read()
        assert "DROP REASONS" in vtxt and "keep rate" in vtxt
        with open(os.path.join(rep, "dlq_report_t1.txt")) as f:
            assert "quarantined clip(s), limit 20" in f.read()
        with open(os.path.join(rep, "mask_sample_report_t1.txt")) as f:
            mtxt = f.read()
        assert "before:" in mtxt and "emails=" in mtxt

    def test_resume_completes_pending_shards(
        self, spark, corpus, oracle_df, out_root
    ):
        _, _, path = corpus
        # run only shards {0,1} by faking a partial lineage: run with
        # n_shards=4 then delete two lineage rows is fiddly — instead run
        # twice with the same fingerprint and assert no duplicates appear.
        cfg = RunConfig(
            out_root=out_root, run_id="r1", n_shards=4,
            source_fingerprint="same",
        )
        run_pipeline(spark, path, cfg)
        store = TableStore(spark, out_root)
        n1 = store.read(CLEAN_TABLE).count()
        m2 = run_pipeline(
            spark,
            path,
            RunConfig(
                out_root=out_root, run_id="r2", n_shards=4,
                source_fingerprint="same",
            ),
        )
        assert m2.get("skipped") is True
        assert store.read(CLEAN_TABLE).count() == n1  # no dup appends
        # lineage has exactly 4 complete shards
        lin = store.read(LINEAGE_TABLE)
        assert lin.filter(F.col("status") == "complete").count() == 4
        # and the union of shard totals covers the corpus exactly
        assert (
            lin.agg(F.sum("total")).collect()[0][0] == len(oracle_df)
        )
        # per-shard profiling metrics ride in the lineage rows (north
        # rule): the langid distribution partitions the corpus exactly,
        # and the dedup tally matches the oracle's duplicate flags
        assert (
            lin.select(F.explode("lang_hist").alias("lang", "n"))
            .agg(F.sum("n")).collect()[0][0] == len(oracle_df)
        )
        exp_dups = int(
            oracle_df["drop_reasons"]
            .apply(lambda rs: "duplicate_clip_id" in rs).sum()
        )
        assert (
            lin.agg(F.sum("dup_count")).collect()[0][0] == exp_dups
        )

    def test_unstamped_runs_never_false_match_lineage(
        self, spark, corpus, out_root
    ):
        """Regression: two UNstamped runs (source_fingerprint='') into
        the same out_root used to false-match each other's lineage rows
        ('' == '') and the second run silently skipped every shard —
        processing nothing while reporting success. Resume guards exist
        only when the run is stamped."""
        _, _, path = corpus
        m1 = run_pipeline(
            spark, path,
            RunConfig(out_root=out_root, run_id="u1", with_audio=False),
        )
        m2 = run_pipeline(
            spark, path,
            RunConfig(out_root=out_root, run_id="u2", with_audio=False),
        )
        assert m2.get("skipped") is None
        assert m2["quality"]["total"] == m1["quality"]["total"] > 0

    def test_pushgateway_transport_called(self, spark, corpus, out_root):
        _, _, path = corpus
        seen = []
        cfg = RunConfig(
            out_root=out_root, run_id="pg", source_fingerprint="pg",
            with_audio=False, module_reports=False,
            pushgateway_url="http://gw:9091",
            push_transport=lambda url, data, hdrs: seen.append((url, data)),
        )
        run_pipeline(spark, path, cfg)
        assert seen
        url, payload = seen[0]
        assert url == "http://gw:9091/metrics/job/clip_quality"
        assert b"clip_quality_quality_kept" in payload

    def test_force_reruns(self, spark, corpus, out_root):
        _, _, path = corpus
        cfg = RunConfig(out_root=out_root, run_id="a",
                        source_fingerprint="x")
        run_pipeline(spark, path, cfg)
        m = run_pipeline(
            spark,
            path,
            RunConfig(
                out_root=out_root, run_id="b", source_fingerprint="x",
                force=True,
            ),
        )
        assert not m.get("skipped")

    def test_kept_rows_partitioned_by_lang(self, spark, corpus, out_root):
        _, _, path = corpus
        run_pipeline(
            spark, path,
            RunConfig(out_root=out_root, run_id="p",
                      source_fingerprint="fp2"),
        )
        snap_dirs = [
            d
            for d in os.listdir(os.path.join(out_root, CLEAN_TABLE))
            if d.startswith("snap_")
        ]
        langs = {
            p.split("=")[1]
            for d in snap_dirs
            for p in os.listdir(os.path.join(out_root, CLEAN_TABLE, d))
            if p.startswith("lang=")
        }
        assert langs == {"en", "fr", "de", "es", "it"}


class TestTableStore:
    def test_overwrite_append_timetravel_rollback(self, spark, out_root):
        store = TableStore(spark, out_root)
        df1 = spark.range(5).withColumnRenamed("id", "v")
        df2 = spark.range(5, 8).withColumnRenamed("id", "v")
        s1 = store.write("t", df1, mode="overwrite")
        s2 = store.write("t", df2, mode="append")
        assert store.read("t").count() == 8
        assert store.read("t", s1).count() == 5  # time travel
        store.rollback("t", s1)
        assert store.read("t").count() == 5
        assert {s["id"] for s in store.snapshots("t")} == {s1, s2}

    def test_read_survives_expired_empty_snapshot_in_read_set(
        self, spark, out_root
    ):
        """An EMPTY partitioned snapshot referenced by kept snapshots'
        read_sets must stay skippable after its manifest entry expires
        (the skip is filesystem-derived, not manifest-derived)."""
        store = TableStore(spark, out_root)
        df = spark.range(3).selectExpr("id as v", "'en' as lang")
        store.write("t", df, mode="overwrite", partition_by=["lang"])
        # empty write: partitionBy writes no data files at all
        store.write(
            "t", df.filter("v < 0"), mode="append", partition_by=["lang"]
        )
        for i in range(6):  # push the empty snapshot past keep_last
            store.write(
                "t",
                spark.range(10 + i, 11 + i).selectExpr(
                    "id as v", "'fr' as lang"
                ),
                mode="append",
                partition_by=["lang"],
            )
        store.expire_snapshots("t", keep_last=3)
        assert store.read("t").count() == 9  # 3 + 6 appends, no crash

    def test_expire_snapshots(self, spark, out_root):
        store = TableStore(spark, out_root)
        sids = [
            store.write("t", spark.range(i + 1), mode="overwrite")
            for i in range(8)
        ]
        expired = store.expire_snapshots("t", keep_last=3)
        assert set(expired) == set(sids[:5])
        assert len(store.snapshots("t")) == 3
        # expired data dirs are gone, survivors readable
        assert store.read("t").count() == 8
        live = {d for s in store.snapshots("t") for d in s["read_set"]}
        on_disk = {
            d for d in os.listdir(os.path.join(out_root, "t"))
            if d.startswith("snap_")
        }
        assert on_disk == live

    def test_idempotency_fingerprint(self, spark, out_root):
        store = TableStore(spark, out_root)
        store.write(
            "t", spark.range(3), properties={"source_fingerprint": "abc"}
        )
        assert store.is_unchanged("t", "abc")
        assert not store.is_unchanged("t", "xyz")

    def test_concurrent_appends_all_commit(self, spark, out_root):
        """Two committers appending to the SAME table concurrently (the
        shape of a streaming sink + a batch requeue sharing an out_root)
        must both land: the manifest read-modify-write is serialized by
        the per-table advisory lock, and each append resolves its parent
        chain from the manifest as seen INSIDE the lock — no lost
        updates."""
        import threading

        store = TableStore(spark, out_root)
        store.write("t", spark.range(0, 1))
        errs: list = []

        def appender(lo):
            try:
                for i in range(lo, lo + 4):
                    store.write(
                        "t",
                        spark.range(10 * i, 10 * i + 2),
                        mode="append",
                    )
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        ts = [
            threading.Thread(target=appender, args=(lo,))
            for lo in (1, 100)
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs
        # 1 overwrite + 8 appends all present; rows = 1 + 8*2
        assert len(store.snapshots("t")) == 9
        assert store.read("t").count() == 17

    def test_crashed_holder_lock_is_exclusive(self, spark, out_root):
        """r03 ADVICE: the old O_EXCL + mtime-stale break raced — two
        waiters could both pass the staleness check and the loser's
        pending delete stole the winner's FRESH lock, letting a third
        committer in. The lock is now kernel-owned (fcntl.flock on a
        persistent file): a crashed holder's lock releases with its fd,
        there is no break heuristic to race, and the critical section
        stays mutually exclusive under a stampede of waiters arriving
        at a leftover lock file at once."""
        import os as _os
        import threading
        import time as _time

        store = TableStore(spark, out_root)
        _os.makedirs(_os.path.join(out_root, "t"), exist_ok=True)
        lock = _os.path.join(out_root, "t", ".manifest.lock")
        # a crashed holder leaves the FILE behind (flock died with it);
        # ancient mtime — under the old scheme every waiter would race
        # to break this
        with open(lock, "w") as f:
            f.write("99999")
        _os.utime(lock, (1, 1))
        state = {"n": 0}
        overlaps: list = []
        errs: list = []
        gate = threading.Barrier(8)

        def committer():
            try:
                gate.wait()
                with store._table_lock("t", timeout_s=30, stale_s=60):
                    state["n"] += 1
                    if state["n"] > 1:
                        overlaps.append(1)
                    _time.sleep(0.02)
                    state["n"] -= 1
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        ts = [threading.Thread(target=committer) for _ in range(8)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs and not overlaps
        # the lock file is PERSISTENT now (the flock target) and the
        # lock is free again after the stampede
        assert _os.path.exists(lock)
        with store._table_lock("t", timeout_s=1):
            pass

    def test_expire_grace_protects_inflight_unknown_dirs(
        self, spark, out_root
    ):
        """An unreferenced snap dir UNKNOWN to the manifest (a concurrent
        writer's parquet landed, manifest commit pending) survives
        expire within the grace period; a committed-but-expired dir is
        reaped immediately; a stale unknown dir (backdated mtime) is
        reaped as a true orphan."""
        import os as _os

        store = TableStore(spark, out_root)
        for i in range(4):
            store.write("t", spark.range(i + 1), mode="overwrite")
        tdir = _os.path.join(out_root, "t")
        fresh = _os.path.join(tdir, "snap_inflight00000001")
        _os.makedirs(fresh)
        stale = _os.path.join(tdir, "snap_crashedorphan01")
        _os.makedirs(stale)
        _os.utime(stale, (1, 1))  # ancient mtime
        store.expire_snapshots("t", keep_last=2)
        on_disk = {
            d for d in _os.listdir(tdir) if d.startswith("snap_")
        }
        live = {
            d
            for s in store.snapshots("t")
            for d in s["read_set"]
        }
        assert "snap_inflight00000001" in on_disk  # grace respected
        assert "snap_crashedorphan01" not in on_disk  # true orphan gone
        assert on_disk == live | {"snap_inflight00000001"}

    def test_crashed_holder_never_wedges_table(self, spark, out_root):
        """A lock file left by a crashed process must not wedge the
        table forever. With the kernel-owned flock (r03 ADVICE) there is
        nothing to 'break': the crashed holder's flock died with its fd,
        so the leftover FILE is immediately lockable — no stale window,
        no timeout wait."""
        import os as _os
        import time as _time

        store = TableStore(spark, out_root)
        _os.makedirs(_os.path.join(out_root, "t"), exist_ok=True)
        lock = _os.path.join(out_root, "t", ".manifest.lock")
        with open(lock, "w") as f:
            f.write("99999")
        _os.utime(lock, (1, 1))  # crashed long ago
        t0 = _time.time()
        store.write("t", spark.range(3))  # must not TimeoutError
        assert store.read("t").count() == 3
        # and acquisition was instant — no stale_s/backoff wait involved
        # (generous bound: the write itself dominates)
        assert _time.time() - t0 < 60

    def test_minmax_scan_pruning(self, spark, out_root):
        """Iceberg's real scale lever: per-file min/max stats recorded at
        write (footer metadata only) let a predicate read skip files that
        provably cannot match — a key-range query over a 100-TB table
        touches the overlapping files, not the table."""
        import pyspark.sql.functions as F

        store = TableStore(spark, out_root)
        # snapshot 1: ids 0..99, range-partitioned into 4 files with
        # disjoint id ranges (file-level pruning inside ONE snap dir)
        store.write("t", spark.range(0, 100).repartitionByRange(4, "id"))
        # snapshot 2 (append): ids 1000..1099, hive-partitioned by lang
        # (partition-path stats)
        df2 = spark.range(1000, 1100).withColumn(
            "lang", F.when(F.col("id") % 2 == 0, "en").otherwise("de")
        ).coalesce(1)
        store.write("t", df2, mode="append", partition_by=["lang"])

        full = store.read("t")
        n_files = sum(
            len(s.get("files") or []) for s in store.snapshots("t")
        )
        assert n_files >= 6  # 4 range files + 2 lang partitions

        # id-range prune: every snap-1 file except the last range file
        # skipped, snap-2 files kept
        ss: dict = {}
        got = store.read("t", prune=[("id", ">=", 1000)], scan_stats=ss)
        assert ss["files_skipped"] >= 4 and ss["files_kept"] >= 2
        assert {r["id"] for r in got.collect()} == set(range(1000, 1100))

        # partition-column prune from the hive path (lang=de)
        ss2: dict = {}
        got2 = store.read("t", prune=[("lang", "=", "de")], scan_stats=ss2)
        # conservative: snap-1 files have NO lang stats -> kept; only
        # the lang=en file of snap 2 is provably non-matching
        assert ss2["files_skipped"] == 1
        # pruning is advisory: caller still applies the real filter
        assert got2.filter(F.col("lang") == "de").count() == 50

        # file-level prune WITHIN snap 1 (disjoint range files): ids
        # 0..24 live in one of the 4 range files
        ss3: dict = {}
        got3 = store.read("t", prune=[("id", "<=", 10)], scan_stats=ss3)
        assert 0 < ss3["files_kept"] < 6
        assert got3.filter(F.col("id") <= 10).count() == 11

        # provably-empty prune -> empty frame with the table schema
        ss4: dict = {}
        got4 = store.read("t", prune=[("id", "<", 0)], scan_stats=ss4)
        assert got4.count() == 0 and ss4["files_kept"] == 0
        assert set(got4.columns) == set(full.columns)

        # combined predicates AND-compose
        got5 = store.read(
            "t", prune=[("id", ">=", 1000), ("lang", "=", "en")]
        )
        assert got5.filter(
            (F.col("id") >= 1000) & (F.col("lang") == "en")
        ).count() == 50

        # disjunctive membership ('in'): a file survives when ANY value
        # can land in its [min, max] — the IVF multi-cell probe shape
        # that AND-composed '=' cannot express
        ss6: dict = {}
        got6 = store.read(
            "t", prune=[("id", "in", [5, 1050])], scan_stats=ss6
        )
        assert ss6["files_skipped"] > 0
        assert got6.filter(F.col("id").isin(5, 1050)).count() == 2

        # a bare-string 'in' value is ONE value, not its characters:
        # ("lang", "in", "de") must keep the lang=de file (iterating the
        # chars 'd','e' would prove neither lands in ["de","de"] and
        # silently drop matching data)
        ss7: dict = {}
        got7 = store.read("t", prune=[("lang", "in", "de")], scan_stats=ss7)
        assert got7.filter(F.col("lang") == "de").count() == 50
        assert ss7["files_skipped"] == 1  # same pruning as =['de']

        # a bare NON-iterable scalar behaves like '=' instead of
        # raising TypeError mid-read (the int analogue of the same
        # one-value mistake)
        ss8: dict = {}
        got8 = store.read("t", prune=[("id", "in", 5)], scan_stats=ss8)
        assert got8.filter(F.col("id") == 5).count() == 1
        assert ss8["files_skipped"] > 0

    def test_cluster_by_write_makes_pruning_selective(
        self, spark, out_root
    ):
        """Sort-order clustering at write time: the SAME interleaved
        frame written plain leaves every file spanning the whole key
        domain (pruning skips nothing), written with cluster_by each
        file covers a disjoint range and a point/range prune touches
        O(result) files — Iceberg's sort-order lever."""
        import pyspark.sql.functions as F

        store = TableStore(spark, out_root)
        # adversarial layout: round-robin repartition interleaves ids
        # across all files, the arrival-order worst case
        interleaved = spark.range(0, 1000).repartition(8)
        store.write("plain", interleaved)
        store.write(
            "clustered", interleaved, cluster_by=["id"], target_files=8
        )

        # mid-domain band: every round-robin file spans it (no skips),
        # while disjoint-range clustered files isolate it to <=2 files
        band = [("id", ">=", 495), ("id", "<=", 505)]
        ss_p: dict = {}
        store.read("plain", prune=band, scan_stats=ss_p)
        assert ss_p["files_skipped"] == 0  # every file overlaps

        ss_c: dict = {}
        got = store.read("clustered", prune=band, scan_stats=ss_c)
        assert ss_c["files_kept"] <= 2 and ss_c["files_skipped"] >= 6
        assert got.filter(
            (F.col("id") >= 495) & (F.col("id") <= 505)
        ).count() == 11
        # clustering reorders files, never rows-as-a-set
        assert store.read("clustered").count() == 1000
        assert store.current_snapshot("clustered")["cluster_by"] == ["id"]

    def test_compact_recluster_restores_pruning(self, spark, out_root):
        """Append-heavy degradation + the compaction cure: every append
        lands in arrival order, so after N appends a key prune reads
        everything; compact(cluster_by=...) re-sorts the view into
        disjoint-range files, and the spec is STICKY — a later
        append + argless compact keeps the clustering."""
        store = TableStore(spark, out_root)
        # 4 appends, each spanning the full id domain (ids k, k+4, ...)
        full = spark.range(0, 800)
        for k in range(4):
            store.write(
                "t", full.filter(f"id % 4 = {k}").coalesce(2),
                mode="append",
            )
        ss0: dict = {}
        store.read("t", prune=[("id", "<", 50)], scan_stats=ss0)
        # degraded: every append's low-range file overlaps the prune
        assert ss0["files_kept"] >= 4

        sid = store.compact("t", target_files=8, cluster_by=["id"])
        assert sid is not None
        ss1: dict = {}
        got = store.read("t", prune=[("id", "<", 50)], scan_stats=ss1)
        assert ss1["files_skipped"] >= 6
        assert ss1["files_kept"] < ss0["files_kept"]
        assert got.count() < 800  # files actually dropped from the scan
        assert {r["id"] for r in got.collect()} >= set(range(50))
        assert store.read("t").count() == 800

        # stickiness: append (no spec) then argless compact re-clusters
        store.write("t", spark.range(800, 900).coalesce(1), mode="append")
        sid2 = store.compact("t", target_files=8)
        assert sid2 is not None
        snap = store.current_snapshot("t")
        assert snap["cluster_by"] == ["id"]
        ss2: dict = {}
        store.read("t", prune=[("id", "<", 50)], scan_stats=ss2)
        assert ss2["files_skipped"] >= 6
        assert store.read("t").count() == 900

        # single-dir view: inherited spec no-ops, an EXPLICIT re-layout
        # request still rewrites (sort-order change)
        assert store.compact("t") is None
        assert store.compact("t", target_files=4, cluster_by=["id"])
        assert store.read("t").count() == 900

    def test_prune_keeps_legacy_snapshots_without_stats(
        self, spark, out_root
    ):
        """Manifests written before file stats existed (no 'files' key)
        must be read fully under prune — never silently dropped."""
        import json as _json
        import os as _os

        store = TableStore(spark, out_root)
        store.write("t", spark.range(0, 10).coalesce(1))
        mp = _os.path.join(out_root, "t", "manifest.json")
        with open(mp) as f:
            m = _json.load(f)
        for s in m["snapshots"]:
            s.pop("files", None)
        with open(mp, "w") as f:
            _json.dump(m, f)
        ss: dict = {}
        got = store.read("t", prune=[("id", ">=", 1000)], scan_stats=ss)
        assert got.count() == 10  # kept despite non-matching range
        assert ss["files_unknown"] == 1 and ss["files_skipped"] == 0

    def test_read_survives_schema_widening_append(self, spark, out_root):
        """An out_root written by an older release appends a WIDER schema
        after an upgrade (r02 ADVICE: lineage gained dup_count/lang_hist).
        The append-chain read must union old and new snapshots with nulls
        for absent columns — a strict unionByName would crash the resume
        path in _completed_shards with AnalysisException."""
        store = TableStore(spark, out_root)
        old = spark.createDataFrame([(1, "a")], "id long, x string")
        store.write("t", old, mode="overwrite")
        new = spark.createDataFrame(
            [(2, "b", 7)], "id long, x string, extra long"
        )
        store.write("t", new, mode="append")
        got = {
            (r["id"], r["x"], r["extra"])
            for r in store.read("t").collect()
        }
        assert got == {(1, "a", None), (2, "b", 7)}
        # narrowing direction too (new snapshot missing an old column)
        store2 = TableStore(spark, out_root)
        store2.write("u", new, mode="overwrite")
        store2.write("u", old, mode="append")
        assert store2.read("u").count() == 2


class TestMergeShardReport:
    """Run-level report merge: shard pieces fold into whole-run figures
    (not last-shard-wins), weighted by each shard's kept rows."""

    def test_weighted_merge(self):
        from data_quality_check_pipeline_spark.pipeline import (
            _merge_shard_report,
        )

        rd: dict = {}
        s0 = {
            "ge": [{"name": "be_between:dur_ms", "success": False,
                    "pass_rate": 0.5, "mostly": 0.99}],
            "completeness": {"rows": 100, "columns": {
                "transcript": {"missing": 10, "completeness_pct": 90.0}}},
            "stats": {"dur_ms_avg": 1000.0, "dur_ms_min": 5.0,
                      "dur_ms_max": 50.0},
        }
        s1 = {
            "ge": [{"name": "be_between:dur_ms", "success": True,
                    "pass_rate": 1.0, "mostly": 0.99}],
            "completeness": {"rows": 300, "columns": {
                "transcript": {"missing": 2, "completeness_pct": 99.3}}},
            "stats": {"dur_ms_avg": 2000.0, "dur_ms_min": 1.0,
                      "dur_ms_max": 40.0},
        }
        _merge_shard_report(rd, s0, weight=100)
        _merge_shard_report(rd, s1, weight=300)

        # ge: (0.5*100 + 1.0*300) / 400 = 0.875 -> still a FAIL at 0.99
        ge = {e["name"]: e for e in rd["ge"]}
        assert ge["be_between:dur_ms"]["pass_rate"] == 0.875
        assert ge["be_between:dur_ms"]["success"] is False
        # completeness: 12 missing of 400 rows
        comp = rd["completeness"]
        assert comp["rows"] == 400
        assert comp["columns"]["transcript"]["missing"] == 12
        assert comp["columns"]["transcript"]["completeness_pct"] == 97.0
        # stats: weighted avg, global min/max
        assert rd["stats"]["dur_ms_avg"] == 1750.0
        assert rd["stats"]["dur_ms_min"] == 1.0
        assert rd["stats"]["dur_ms_max"] == 50.0

    def test_fail_in_early_shard_not_masked(self):
        """A contract FAIL in shard 0 that passes in shard 1 must stay a
        FAIL at run level when the merged rate is below mostly."""
        from data_quality_check_pipeline_spark.pipeline import (
            _merge_shard_report,
        )

        rd: dict = {}
        _merge_shard_report(rd, {"ge": [
            {"name": "not_be_null:clip_id", "success": False,
             "pass_rate": 0.0, "mostly": 1.0}]}, weight=50)
        _merge_shard_report(rd, {"ge": [
            {"name": "not_be_null:clip_id", "success": True,
             "pass_rate": 1.0, "mostly": 1.0}]}, weight=50)
        assert rd["ge"][0]["success"] is False
        assert rd["ge"][0]["pass_rate"] == 0.5


class TestSnapshotGcOrphans:
    def test_orphan_dirs_from_earlier_rounds_are_swept(self, spark, tmp_path):
        """A snapshot dir whose manifest entry was dropped in an earlier
        expire round while a then-keeper still referenced it must be
        deleted once no surviving snapshot references it — not leak
        forever."""
        import os

        store = TableStore(spark, str(tmp_path))
        sid_a = store.write("t", spark.range(1), mode="overwrite")
        for i in range(5):
            store.write("t", spark.range(i + 2), mode="append")
        # round 1: A's entry expires but its dir stays (appends B..F
        # reference it in their read_sets)
        assert store.expire_snapshots("t", keep_last=5) == [sid_a]
        tdir = os.path.join(str(tmp_path), "t")
        assert f"snap_{sid_a}" in os.listdir(tdir)
        # rounds 2+: enough overwrites that nothing references A anymore
        for i in range(5):
            store.write("t", spark.range(1), mode="overwrite")
        store.expire_snapshots("t", keep_last=5)
        assert f"snap_{sid_a}" not in os.listdir(tdir)
        # survivors still read fine
        assert store.read("t").count() == 1


class TestCrashResumeGuards:
    def test_lineage_loss_does_not_duplicate_clean_rows(
        self, spark, corpus, oracle_df, out_root
    ):
        """Crash between a shard's clean append and its lineage row: the
        rerun reprocesses the shard but the (fingerprint, shard,
        n_shards) snapshot-property guard skips the re-append — no clip
        is duplicated."""
        import shutil

        _, _, path = corpus
        cfg = RunConfig(out_root=out_root, run_id="cr1",
                        source_fingerprint="crash-f", n_shards=2)
        run_pipeline(spark, path, cfg)
        store = TableStore(spark, out_root)
        n_clean = store.read(CLEAN_TABLE).count()
        n_distinct = (
            store.read(CLEAN_TABLE).select("clip_id").distinct().count()
        )
        assert n_clean == n_distinct
        # simulate the crash: lineage (the resume marker) lost AFTER the
        # table appends committed
        shutil.rmtree(os.path.join(out_root, "lineage"))
        cfg2 = RunConfig(out_root=out_root, run_id="cr2",
                         source_fingerprint="crash-f", n_shards=2)
        run_pipeline(spark, path, cfg2)
        assert store.read(CLEAN_TABLE).count() == n_clean
        assert (
            store.read(CLEAN_TABLE).select("clip_id").distinct().count()
            == n_distinct
        )


class TestHaltedRun:
    def test_halted_run_is_not_a_perfect_run(
        self, spark, corpus, out_root
    ):
        """A HALTed zero-work run must not write keep_pct=100 metrics
        (which would poison the trend history) and must be marked."""
        from data_quality_check_pipeline_spark.control import (
            HALT,
            Thresholds,
        )

        _, _, path = corpus
        cfg = RunConfig(
            out_root=out_root, run_id="halted1",
            source_fingerprint="halt-f",
            thresholds=Thresholds(
                hard_failure_pct=0.0, review_pass_rate=101.0,
                timeout_action=HALT,
            ),
        )
        metrics = run_pipeline(spark, path, cfg)
        assert metrics["halted"] is True
        assert metrics["gate"]["decision"] == HALT
        assert metrics["quality"]["keep_pct"] is None
        assert metrics["trend"]["skipped"] == "halted"
        # the saved document must not feed 100.0 into later trend windows
        from data_quality_check_pipeline_spark.metrics import (
            quality_trend_alert,
        )

        r = quality_trend_alert(
            f"{out_root}/metrics", current_keep_pct=50.0, window=5
        )
        assert r["runs"] == 0  # the halted run contributed no data point


class TestSourceFingerprint:
    def test_detects_nested_rewrites(self, tmp_path):
        """A rewrite >= 2 directory levels deep must change the
        fingerprint (top-level listdir missed lang=/date=/part backfills
        and falsely skipped the run)."""
        import sys
        import time as _t

        sys.path.insert(0, "/root/repo")
        from jobs.run_quality_pipeline import source_fingerprint

        deep = tmp_path / "lang=en" / "date=2026-08-01"
        os.makedirs(deep)
        f = deep / "part-0.parquet"
        f.write_bytes(b"v1")
        fp1 = source_fingerprint(str(tmp_path))
        _t.sleep(0.01)
        f.write_bytes(b"v2-bigger")  # nested rewrite
        fp2 = source_fingerprint(str(tmp_path))
        assert fp1 != fp2
        # stable when nothing changed
        assert source_fingerprint(str(tmp_path)) == fp2


class TestGuardRollbackAndForce:
    def test_rollback_redo_is_not_blocked_by_stale_history(
        self, spark, tmp_path
    ):
        """_find_committed_write must only match snapshots REACHABLE from
        the current view: after a rollback, the rolled-back append's
        manifest entry remains but its data is not in the table — the
        redo must NOT be skipped."""
        from data_quality_check_pipeline_spark.pipeline import (
            _find_committed_write,
        )

        store = TableStore(spark, str(tmp_path))
        base = store.write("t", spark.range(5), mode="overwrite")
        store.write("t", spark.range(3), mode="append",
                    properties={"shard": 0, "n_shards": 1,
                                "source_fingerprint": "fp"})
        match = {"shard": 0, "n_shards": 1, "source_fingerprint": "fp"}
        assert _find_committed_write(store, "t", match) is not None
        store.rollback("t", base)  # shard-0 data no longer in the view
        assert _find_committed_write(store, "t", match) is None

    def test_guard_memory_survives_snapshot_gc(self, spark, tmp_path):
        from data_quality_check_pipeline_spark.pipeline import (
            _find_committed_write,
        )

        store = TableStore(spark, str(tmp_path))
        store.write("t", spark.range(1), mode="overwrite",
                    properties={"shard": 0, "n_shards": 1,
                                "source_fingerprint": "fp"})
        for _ in range(7):
            store.write("t", spark.range(1), mode="append")
        store.expire_snapshots("t", keep_last=3)
        # the shard-0 manifest entry is GC'd but its data is still part
        # of the current view: the guard must still remember it
        assert _find_committed_write(
            store, "t",
            {"shard": 0, "n_shards": 1, "source_fingerprint": "fp"},
        ) is not None


class TestCrossRunDedup:
    """The batch pipeline's incremental dedup stage: kept clips are
    mined against signature history persisted in the out_root
    (content_hash_history / audio_fp_history), duplicates quarantine
    with TERMINAL reasons, survivors' signatures accumulate."""

    def _write(self, tmp_path, name, pdf):
        import pyarrow as pa
        import pyarrow.parquet as pq

        p = str(tmp_path / name)
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), p)
        return p

    def _keep_ids(self, spark, pdf):
        from data_quality_check_pipeline_spark.pipeline import (
            flag_clips,
            score_clips,
        )

        sdf = spark.createDataFrame(pdf)
        return [
            r["clip_id"]
            for r in flag_clips(score_clips(sdf))
            .filter("keep").select("clip_id").collect()
        ]

    @pytest.fixture(scope="class")
    def halves(self, spark):
        from data_quality_check_pipeline_spark.synth import generate_clips

        pdf, _ = generate_clips(60)
        first = pdf.iloc[:30].reset_index(drop=True)
        second = pdf.iloc[30:].reset_index(drop=True)
        return (
            first, second,
            self._keep_ids(spark, first), self._keep_ids(spark, second),
        )

    def test_content_dedup_across_and_within_runs(
        self, spark, tmp_path, halves
    ):
        first, second, valid1, valid2 = halves
        assert len(valid1) >= 2 and len(valid2) >= 2
        out = str(tmp_path / "tables")
        p1 = self._write(tmp_path, "c1.parquet", first)
        cfg1 = RunConfig(out_root=out, run_id="r1",
                         source_fingerprint="fpA", dedup_content=True,
                         module_reports=False)
        m1 = run_pipeline(spark, p1, cfg1)
        store = TableStore(spark, out)
        kept1 = m1["quality"]["kept"]
        assert kept1 == len(valid1)  # first run: nothing to dedup
        assert store.read("content_hash_history").count() == len(valid1)

        # second corpus: cross-run exact dup of k1, a within-run dup
        # pair cloned from held-out valid row y, plus the rest of the
        # second half (y excluded so the pair is fresh content)
        k1 = valid1[0]
        y = valid2[0]
        row_k1 = first[first.clip_id == k1].copy()
        row_y = second[second.clip_id == y].copy()
        assert row_y.iloc[0]["transcript"] not in set(first.transcript)
        ctdup = row_k1.assign(clip_id="zzz_ctdup")
        w1 = row_y.assign(clip_id="zzz_w1")
        w2 = row_y.assign(clip_id="zzz_w2")
        import pandas as pd

        corpus2 = pd.concat(
            [second[second.clip_id != y], ctdup, w1, w2],
            ignore_index=True,
        )
        p2 = self._write(tmp_path, "c2.parquet", corpus2)
        cfg2 = RunConfig(out_root=out, run_id="r2",
                         source_fingerprint="fpB", dedup_content=True,
                         module_reports=False)
        m2 = run_pipeline(spark, p2, cfg2)

        clean_ids = {
            r["clip_id"] for r in store.read(CLEAN_TABLE).collect()
        }
        assert "zzz_ctdup" not in clean_ids     # cross-run dup dropped
        assert "zzz_w1" in clean_ids            # within-run survivor
        assert "zzz_w2" not in clean_ids        # within-run dup dropped
        q = store.read(QUARANTINE_TABLE)
        dup_rows = {
            r["clip_id"]: (list(r["reasons"]), r["stage"])
            for r in q.filter(
                F.array_contains("reasons", "duplicate_content")
            ).collect()
        }
        assert set(dup_rows) == {"zzz_ctdup", "zzz_w2"}
        assert all(stage == "dedup" for _, stage in dup_rows.values())
        # clean table holds no duplicated transcript across both runs
        dup_texts = (
            store.read(CLEAN_TABLE)
            .groupBy("transcript").count().filter("count > 1").count()
        )
        assert dup_texts == 0
        # history accumulated survivors only (one hash per kept text)
        assert (
            store.read("content_hash_history").count()
            == store.read(CLEAN_TABLE).count()
        )
        # metrics report what landed
        assert m2["quality"]["kept"] == len(clean_ids) - kept1

    def test_dup_quarantine_is_terminal_for_requeue(
        self, spark, tmp_path, halves
    ):
        from data_quality_check_pipeline_spark.pipeline import (
            active_quarantine,
            requeue_quarantine,
        )

        first, second, valid1, valid2 = halves
        out = str(tmp_path / "tables")
        p1 = self._write(tmp_path, "c1.parquet", first)
        cfg1 = RunConfig(out_root=out, run_id="r1",
                         source_fingerprint="fpA", dedup_content=True,
                         module_reports=False)
        run_pipeline(spark, p1, cfg1)
        import pandas as pd

        # same corpus under fresh ids: every valid clip is a cross-run
        # content dup
        clones = first.copy()
        clones["clip_id"] = ["dup_" + c for c in first["clip_id"]]
        p2 = self._write(tmp_path, "c2.parquet", clones)
        cfg2 = RunConfig(out_root=out, run_id="r2",
                         source_fingerprint="fpB", dedup_content=True,
                         module_reports=False)
        m2 = run_pipeline(spark, p2, cfg2)
        assert m2["quality"]["kept"] == 0
        store = TableStore(spark, out)
        n_clean = store.read(CLEAN_TABLE).count()

        # requeue over the clone corpus: dup quarantines are terminal,
        # so nothing may be re-driven into clips_clean
        res = requeue_quarantine(spark, cfg2, p2)
        assert store.read(CLEAN_TABLE).count() == n_clean
        dup_ids = {"dup_" + v for v in valid1}
        if res.get("requeued"):
            # only non-dup (validation-failure) clips were re-driven
            requeued_kept = res.get("kept", 0)
            assert requeued_kept == 0 or not (
                dup_ids
                & {
                    r["clip_id"]
                    for r in store.read(CLEAN_TABLE).collect()
                }
            )
        # the dup clips remain visible in active quarantine
        active = {
            r["clip_id"]
            for r in active_quarantine(
                store.read(QUARANTINE_TABLE)
            ).collect()
        }
        assert dup_ids <= active

    def test_audio_dedup_across_runs(self, spark, tmp_path, halves):
        """The synthetic corpus's own tones are fingerprint-degenerate
        (nearly everything within hamming 2 of everything — see the
        probe in this test's history), so this test plants CONTROLLED
        tones under valid rows: distinct frequencies 180 Hz apart
        measure >= hamming 2 apart, an exact byte copy measures 0, and
        the stage runs with max_hamming=1."""
        import numpy as np
        import pandas as pd

        from data_quality_check_pipeline_spark.udfs.audio import (
            fingerprint_batch,
        )

        first, second, valid1, valid2 = halves

        def with_tone(row, freq, seed):
            sr, dur = int(row["sr_hz"]), int(row["dur_ms"])
            n = max(1, int(sr * dur / 1000))
            rng = np.random.RandomState(seed)
            t = np.arange(n) / sr
            x = 9000 * np.sin(2 * np.pi * freq * t) + rng.normal(
                0, 60.0, n
            )
            return np.clip(x, -32768, 32767).astype("<i2").tobytes()

        rows1 = (
            first[first.clip_id.isin(valid1[:6])]
            .copy().reset_index(drop=True)
        )
        z_src = second[second.clip_id == valid2[0]].copy()
        z_src = z_src.reset_index(drop=True)

        # the spectral fingerprint buckets frequencies RELATIVE to each
        # row's sample rate, so fixed spacing cannot guarantee
        # separation across mixed-sr rows — pick each row's tone
        # greedily, verifying the actual fingerprint stays > max_hamming
        # (=1) from everything already chosen
        def ham(a, b):
            return bin((a ^ b) & ((1 << 64) - 1)).count("1")

        chosen_fps: list[int] = []

        def plant(row, seed):
            for freq in range(200, 3500, 150):
                payload = with_tone(row, freq, seed)
                fp = int(
                    fingerprint_batch([payload], ["pcm_s16le"])[0]
                )
                if fp != 0 and all(ham(fp, g) > 1 for g in chosen_fps):
                    chosen_fps.append(fp)
                    return payload
            raise AssertionError("no separable tone found for row")

        rows1["bytes"] = [
            plant(r, i) for i, r in rows1.iterrows()
        ]
        rows1["codec"] = "pcm_s16le"
        z_src["bytes"] = [plant(z_src.iloc[0], 100)]
        z_src["codec"] = "pcm_s16le"

        out = str(tmp_path / "tables")
        p1 = self._write(tmp_path, "a1.parquet", rows1)
        cfg1 = RunConfig(out_root=out, run_id="r1",
                         source_fingerprint="fpA", dedup_audio=True,
                         dedup_audio_max_hamming=1,
                         module_reports=False)
        m1 = run_pipeline(spark, p1, cfg1)
        store = TableStore(spark, out)
        assert m1["quality"]["kept"] == len(rows1)
        assert store.read("audio_fp_history").count() == len(rows1)

        # run 2: control z (far tone, must survive) + an exact byte
        # copy of a run-1 clip under a new id (hamming 0 vs history)
        z = valid2[0]
        audup = rows1.iloc[[1]].assign(clip_id="zzz_audup")
        corpus2 = pd.concat([z_src, audup], ignore_index=True)
        p2 = self._write(tmp_path, "a2.parquet", corpus2)
        cfg2 = RunConfig(out_root=out, run_id="r2",
                         source_fingerprint="fpB", dedup_audio=True,
                         dedup_audio_max_hamming=1,
                         module_reports=False)
        run_pipeline(spark, p2, cfg2)

        clean_ids = {
            r["clip_id"] for r in store.read(CLEAN_TABLE).collect()
        }
        assert "zzz_audup" not in clean_ids
        assert z in clean_ids
        q = store.read(QUARANTINE_TABLE)
        audup_reasons = [
            list(r["reasons"])
            for r in q.filter(F.col("clip_id") == "zzz_audup").collect()
        ]
        assert ["near_duplicate_audio"] in audup_reasons
        # the dup's fingerprint did NOT enter history; z's did
        fps_hist = store.read("audio_fp_history")
        assert fps_hist.filter(
            F.col("clip_id") == "zzz_audup"
        ).count() == 0
        assert fps_hist.filter(F.col("clip_id") == z).count() == 1


class TestCompaction:
    """TableStore.compact — the Iceberg rewrite_data_files analogue for
    append-heavy history tables: one snapshot dir replaces the N-dir
    read_set; rows, fingerprint idempotency, time travel, crash/replay
    property memory, and the optimistic commit-conflict abort."""

    def test_compact_collapses_read_set_and_preserves_rows(
        self, spark, tmp_path
    ):
        store = TableStore(spark, str(tmp_path))
        for i in range(4):
            store.write(
                "h", spark.range(i * 10, i * 10 + 10),
                mode="append" if i else "overwrite",
                properties={"source_fingerprint": f"b{i}"},
            )
        pre = store.current_snapshot("h")
        assert len(pre["read_set"]) == 4
        before = {r["id"] for r in store.read("h").collect()}

        sid = store.compact("h")
        assert sid is not None
        cur = store.current_snapshot("h")
        assert cur["id"] == sid and cur["mode"] == "compact"
        assert cur["read_set"] == [f"snap_{sid}"]
        assert {r["id"] for r in store.read("h").collect()} == before
        # ingest idempotency survives: the last batch's fingerprint rode
        # along on the compaction snapshot
        assert store.is_unchanged("h", "b3")
        assert cur["properties"]["compaction_of"] == pre["id"]
        # time travel to the pre-compaction snapshot still works
        assert store.read("h", pre["id"]).count() == 40
        # idempotent: a single-dir view has nothing to compact
        assert store.compact("h") is None

    def test_expire_after_compact_keeps_view_and_guard_memory(
        self, spark, tmp_path
    ):
        import os

        from data_quality_check_pipeline_spark.pipeline import (
            _find_committed_write,
        )

        store = TableStore(spark, str(tmp_path))
        props = {"shard": 0, "n_shards": 1, "source_fingerprint": "fp"}
        store.write("h", spark.range(10), mode="overwrite",
                    properties=props)
        for i in range(3):
            store.write("h", spark.range(10 * (i + 1), 10 * (i + 2)),
                        mode="append")
        store.compact("h")
        store.expire_snapshots("h", keep_last=1, orphan_grace_s=0)
        assert store.read("h").count() == 40
        # old snap dirs really are gone (small-file cleanup happened)
        dirs = [d for d in os.listdir(str(tmp_path / "h"))
                if d.startswith("snap_")]
        assert len(dirs) == 1
        # crash/replay guards keep their memory through compact+expire
        # via expired_props (data is still part of the current view)
        assert _find_committed_write(store, "h", props) is not None

    def test_commit_conflict_aborts_not_clobbers(
        self, spark, tmp_path, monkeypatch
    ):
        """A concurrent append landing during the rewrite must abort
        the compaction (optimistic concurrency) — blind-committing
        would silently drop the append from the current view."""
        store = TableStore(spark, str(tmp_path))
        store.write("h", spark.range(10), mode="overwrite")
        store.write("h", spark.range(10, 20), mode="append")

        orig_read = TableStore.read

        def read_then_append(self, name, *a, **k):
            monkeypatch.setattr(TableStore, "read", orig_read)
            out = orig_read(self, name, *a, **k)
            store.write("h", spark.range(20, 30), mode="append")
            return out

        monkeypatch.setattr(TableStore, "read", read_then_append)
        assert store.compact("h") is None  # conflict -> abort
        # the concurrent append is intact; nothing lost
        assert store.read("h").count() == 30
        # a clean re-run compacts all three appends
        sid = store.compact("h")
        assert sid is not None
        assert store.read("h").count() == 30
        assert store.current_snapshot("h")["read_set"] == [f"snap_{sid}"]


class TestHistoryBefore:
    """_history_before: the batch replay-safe history read. A
    crash-rerun of a shard whose history append already committed must
    see the PARENT snapshot (mining against its own signatures would
    quarantine every clip as a dup of itself)."""

    def test_parent_current_and_first_append_cases(self, spark, tmp_path):
        from data_quality_check_pipeline_spark.pipeline import (
            _history_before,
        )

        store = TableStore(spark, str(tmp_path))
        props = {"shard": 0, "n_shards": 1, "source_fingerprint": "fp"}
        store.write("hh", spark.range(5), mode="overwrite",
                    properties={"run_id": "r0"})
        store.write("hh", spark.range(5, 8), mode="append",
                    properties=props)
        # own append committed -> parent view (5 rows, not 8)
        h = _history_before(store, "hh", props)
        assert {r["id"] for r in h.collect()} == set(range(5))
        # no matching append (fresh shard) -> current view
        h2 = _history_before(
            store, "hh",
            {"shard": 1, "n_shards": 1, "source_fingerprint": "fp"},
        )
        assert h2.count() == 8
        # own append is the table's FIRST snapshot -> no history at all
        store.write("h0", spark.range(3), mode="overwrite",
                    properties=props)
        assert _history_before(store, "h0", props) is None
        # missing table -> None
        assert _history_before(store, "nope", props) is None


class TestHistoryAutoCompaction:
    def test_history_compacts_and_dedup_still_works(
        self, spark, tmp_path
    ):
        """history_compact_dirs: past the fragmentation threshold the
        pipeline folds the history table into one snapshot dir; dedup
        keeps catching cross-run dups off the compacted view."""
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from data_quality_check_pipeline_spark.synth import generate_clips

        pdf, _ = generate_clips(30)
        out = str(tmp_path / "tables")

        def run(tag, frame):
            p = str(tmp_path / f"{tag}.parquet")
            pq.write_table(
                pa.Table.from_pandas(frame, preserve_index=False), p
            )
            cfg = RunConfig(out_root=out, run_id=tag,
                            source_fingerprint=tag, dedup_content=True,
                            history_compact_dirs=1,
                            module_reports=False)
            return run_pipeline(spark, p, cfg)

        m1 = run("r1", pdf)
        clones = pdf.copy()
        clones["clip_id"] = ["d_" + c for c in pdf["clip_id"]]
        m2 = run("r2", clones)
        assert m2["quality"]["kept"] == 0  # all valid clones deduped
        store = TableStore(spark, out)
        cur = store.current_snapshot("content_hash_history")
        # run 2's append pushed the view past 1 dir -> auto-compacted
        assert cur["mode"] == "compact" and len(cur["read_set"]) == 1
        # a third clone wave still dedups off the COMPACTED history
        clones2 = pdf.copy()
        clones2["clip_id"] = ["e_" + c for c in pdf["clip_id"]]
        m3 = run("r3", clones2)
        assert m3["quality"]["kept"] == 0
        assert store.read("content_hash_history").count() == m1[
            "quality"]["kept"]


class TestMixtureSampleSplit:
    """--sample-lang / --split pipeline stage: deterministic mixture
    sampling + stable split labels on the kept branch (operators/
    sampling.py), with partition layout and accounting."""

    def test_sample_split_deterministic_across_sharding(
        self, spark, corpus, oracle_df, out_root, tmp_path
    ):
        import glob

        _, _, path = corpus
        rates = {"en": 0.4, "fr": 1.0}
        splits = {"train": 0.8, "val": 0.1, "test": 0.1}
        cfg1 = RunConfig(
            out_root=out_root, run_id="s1", source_fingerprint="fps1",
            sample_rates=rates, sample_default_rate=0.7, sample_seed=3,
            split_fractions=splits, split_seed=5,
        )
        m1 = run_pipeline(spark, path, cfg1)
        clean = TableStore(spark, out_root).read(CLEAN_TABLE)
        assert "split" in clean.columns
        got1 = {
            (r["clip_id"], r["split"])
            for r in clean.select("clip_id", "split").collect()
        }
        # accounting: landed + sampled_out == validation-kept; sampling
        # dropped something but not everything, and never quarantined
        expected_kept = int(oracle_df["keep"].sum())
        assert (
            m1["quality"]["kept"] + m1["quality"]["sampled_out"]
            == expected_kept
        )
        assert 0 < m1["quality"]["sampled_out"] < expected_kept
        assert m1["quality"]["kept"] == len(got1)
        assert (
            m1["quality"]["dropped"] == len(oracle_df) - expected_kept
        )
        # keep_pct stays a QUALITY metric: mixture selection must not
        # deflate it (a spurious trend-degradation alert otherwise
        # fires the first time sampling is enabled)
        assert m1["quality"]["keep_pct"] == pytest.approx(
            100.0 * expected_kept / len(oracle_df)
        )
        # physical layout: split is a partition level under lang
        assert glob.glob(
            os.path.join(
                out_root, "clips_clean", "snap_*", "lang=*", "split=*",
                "*.parquet",
            )
        )
        # the per-lang rates actually bite: en is sampled hardest
        by_lang = {
            r["lang"]: r["n"]
            for r in clean.groupBy("lang").count()
            .withColumnRenamed("count", "n").collect()
        }
        base = oracle_df[oracle_df["keep"]]["lang"].value_counts()
        assert by_lang["en"] / base["en"] < 0.55
        assert by_lang["fr"] == base["fr"]
        # a 2-shard run into a fresh root selects the SAME clips with
        # the SAME splits — the decision is the clip's, not the run's
        out2 = str(tmp_path / "tables2")
        cfg2 = RunConfig(
            out_root=out2, run_id="s2", n_shards=2,
            source_fingerprint="fps1",
            sample_rates=rates, sample_default_rate=0.7, sample_seed=3,
            split_fractions=splits, split_seed=5,
        )
        run_pipeline(spark, path, cfg2)
        got2 = {
            (r["clip_id"], r["split"])
            for r in TableStore(spark, out2).read(CLEAN_TABLE)
            .select("clip_id", "split").collect()
        }
        assert got1 == got2

    def test_temperature_mix_stage(
        self, spark, corpus, oracle_df, out_root
    ):
        """--sample-temperature 0 (uniform mixture): every language
        lands ~the rarest language's count, accounting still balances,
        and mixing policies are mutually exclusive."""
        _, _, path = corpus
        cfg = RunConfig(
            out_root=out_root, run_id="t0",
            sample_temperature=0.0, sample_seed=3,
        )
        m = run_pipeline(spark, path, cfg)
        expected_kept = int(oracle_df["keep"].sum())
        assert (
            m["quality"]["kept"] + m["quality"]["sampled_out"]
            == expected_kept
        )
        assert 0 < m["quality"]["sampled_out"] < expected_kept
        by_lang = {
            r["lang"]: r["n"]
            for r in TableStore(spark, out_root).read(CLEAN_TABLE)
            .groupBy("lang").count().withColumnRenamed("count", "n")
            .collect()
        }
        # uniform target: every lang within Bernoulli noise of the
        # rarest (the corpus langs are Zipfian, so without the mixture
        # the head lang would dominate by >5x)
        n_min = min(by_lang.values())
        assert max(by_lang.values()) < 1.6 * n_min
        with pytest.raises(ValueError, match="mutually exclusive"):
            RunConfig(
                out_root=out_root, sample_temperature=0.5,
                sample_rates={"en": 0.4},
            )

    def test_dsir_selection_stage(
        self, spark, corpus, oracle_df, out_root, tmp_path
    ):
        """--sample-dsir-target/--sample-dsir-frac: the landed set is
        enriched toward the target domain (an English-only target over
        the multilingual corpus), the drop is accounted as sampled_out
        (valid data, never quarantined), and the stage log carries the
        selection audit trail."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        _, _, path = corpus
        # target domain: kept English transcripts (language is a clean
        # n-gram-profile proxy on the synthetic corpus)
        en = oracle_df[
            oracle_df["keep"] & (oracle_df["lang"] == "en")
        ]["transcript_clean"].head(60)
        tgt_path = str(tmp_path / "dsir_target.parquet")
        pq.write_table(
            pa.table({"text": list(en)}), tgt_path
        )

        base = RunConfig(out_root=str(tmp_path / "base"), run_id="b")
        run_pipeline(spark, path, base)
        base_langs = {
            r["lang"]: r["n"]
            for r in TableStore(spark, base.out_root).read(CLEAN_TABLE)
            .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        base_en_share = base_langs["en"] / sum(base_langs.values())

        cfg = RunConfig(
            out_root=out_root, run_id="d1",
            dsir_target=tgt_path, dsir_frac=0.5,
        )
        m = run_pipeline(spark, path, cfg)
        expected_kept = int(oracle_df["keep"].sum())
        assert (
            m["quality"]["kept"] + m["quality"]["sampled_out"]
            == expected_kept
        )
        assert 0 < m["quality"]["sampled_out"] < expected_kept
        stage = next(
            s for s in m["stages"] if s["stage"] == "dsir_select"
        )
        assert stage["keep_frac"] == 0.5
        assert "threshold_key" in stage
        sel_langs = {
            r["lang"]: r["n"]
            for r in TableStore(spark, out_root).read(CLEAN_TABLE)
            .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        sel_en_share = sel_langs["en"] / sum(sel_langs.values())
        assert sel_en_share > base_en_share + 0.15
        # config contract: target and frac go together; frac in (0, 1]
        with pytest.raises(ValueError, match="go together"):
            RunConfig(out_root=out_root, dsir_frac=0.5)
        with pytest.raises(ValueError, match="dsir_frac"):
            RunConfig(
                out_root=out_root, dsir_target=tgt_path, dsir_frac=1.5
            )

    def test_quality_curriculum_drops_bottom_bin(
        self, spark, corpus, oracle_df, out_root, tmp_path
    ):
        """--curriculum snr_db=0,1: quantile-bin the kept branch by SNR
        and drop bin 0 entirely. The landed set is exactly the clips
        above the recorded median edge (value-threshold semantics), the
        drop is accounted as sampled_out (valid data, never
        quarantined), and the stage log carries the audit trail."""
        _, _, path = corpus
        base = RunConfig(out_root=str(tmp_path / "base"), run_id="b")
        mb = run_pipeline(spark, path, base)
        base_clean = TableStore(spark, base.out_root).read(CLEAN_TABLE)
        snr = {
            r["clip_id"]: r["snr_db"]
            for r in base_clean.select("clip_id", "snr_db").collect()
        }

        cfg = RunConfig(
            out_root=out_root, run_id="c1",
            curriculum_col="snr_db", curriculum_rates=[0.0, 1.0],
        )
        m = run_pipeline(spark, path, cfg)
        stage = next(
            s for s in m["stages"] if s["stage"] == "curriculum"
        )
        (edge,) = stage["bin_edges"]
        landed = {
            r["clip_id"]
            for r in TableStore(spark, out_root).read(CLEAN_TABLE)
            .select("clip_id").collect()
        }
        expected_kept = int(oracle_df["keep"].sum())
        assert mb["quality"]["kept"] == expected_kept
        assert (
            m["quality"]["kept"] + m["quality"]["sampled_out"]
            == expected_kept
        )
        assert m["quality"]["kept"] == len(landed) > 0
        assert stage["curriculum_out"] == m["quality"]["sampled_out"] > 0
        # value-threshold semantics: kept iff snr_db strictly above the
        # median edge (rows equal to an edge take the lower bin ->
        # dropped). The logged edges are rounded to 4 decimals, so the
        # per-side checks carry slack; the separation check is exact.
        kept_snr = [snr[c] for c in landed]
        drop_snr = [s for c, s in snr.items() if c not in landed]
        assert all(s > edge - 1e-3 for s in kept_snr)
        assert all(s <= edge + 1e-3 for s in drop_snr)
        assert min(kept_snr) > max(drop_snr)
        with pytest.raises(ValueError, match="go together"):
            RunConfig(out_root=out_root, curriculum_col="snr_db")
        with pytest.raises(ValueError, match="curriculum_rates"):
            RunConfig(
                out_root=out_root, curriculum_col="snr_db",
                curriculum_rates=[0.5],
            )
        with pytest.raises(ValueError, match="curriculum_edges"):
            RunConfig(
                out_root=out_root, curriculum_col="snr_db",
                curriculum_rates=[0.0, 0.5, 1.0],
                curriculum_edges=[36.0],
            )

    def test_curriculum_pinned_edges_shard_invariant(
        self, spark, corpus, tmp_path
    ):
        """With pinned curriculum_edges the verdict is a pure row
        function: 1-shard and 2-shard runs land the IDENTICAL clip set
        (derived edges are per-shard quantiles and can't promise this —
        the log carries them for audit instead)."""
        _, _, path = corpus

        def run(tag, shards):
            out = str(tmp_path / tag)
            run_pipeline(
                spark, path,
                RunConfig(
                    out_root=out, run_id=tag, n_shards=shards,
                    source_fingerprint=f"fp{tag}",
                    curriculum_col="snr_db",
                    curriculum_rates=[0.3, 1.0],
                    curriculum_edges=[36.0],
                ),
            )
            return {
                r["clip_id"]
                for r in TableStore(spark, out).read(CLEAN_TABLE)
                .select("clip_id").collect()
            }

        one, two = run("cs1", 1), run("cs2", 2)
        assert one == two and len(one) > 0

    def test_sampled_out_leaves_no_dedup_signature(
        self, spark, corpus, out_root
    ):
        """Sampling runs BEFORE dedup mining: the content-hash history
        must contain signatures ONLY for clips that actually landed —
        a sampled-out clip's content never entered the corpus, so a
        later re-upload must not quarantine against it."""
        _, _, path = corpus
        cfg = RunConfig(
            out_root=out_root, run_id="sd1", source_fingerprint="fpsd",
            dedup_content=True,
            sample_rates={}, sample_default_rate=0.5, sample_seed=2,
        )
        m = run_pipeline(spark, path, cfg)
        store = TableStore(spark, out_root)
        landed = store.read(CLEAN_TABLE).count()
        hist = store.read("content_hash_history").count()
        assert m["quality"]["sampled_out"] > 0
        assert landed == m["quality"]["kept"]
        assert hist == landed


class TestIncrementalRead:
    """TableStore.read_incremental: append-only deltas for downstream
    consumers, with honest failures whenever the chain cannot express
    the delta (Iceberg incremental-scan parity)."""

    def test_appends_only_the_delta(self, spark, out_root):
        from data_quality_check_pipeline_spark.sources.tables import (
            IncrementalReadError,
        )

        store = TableStore(spark, out_root)
        mk = lambda lo, hi: spark.createDataFrame(  # noqa: E731
            [(i, f"v{i}") for i in range(lo, hi)], "id long, v string"
        )
        s1 = store.write("t", mk(0, 100), mode="overwrite")
        s2 = store.write("t", mk(100, 150), mode="append")
        store.write("t", mk(150, 170), mode="append")
        got = {
            r["id"] for r in store.read_incremental("t", s1).collect()
        }
        assert got == set(range(100, 170))
        got2 = {
            r["id"] for r in store.read_incremental("t", s2).collect()
        }
        assert got2 == set(range(150, 170))
        # anchored at current: empty, schema intact
        cur = store.current_snapshot("t")["id"]
        empty = store.read_incremental("t", cur)
        assert empty.count() == 0 and empty.columns == ["id", "v"]
        # unknown anchor
        import pytest as _pytest

        with _pytest.raises(IncrementalReadError, match="not in"):
            store.read_incremental("t", "deadbeef00000000")

    def test_non_append_history_refuses(self, spark, out_root):
        from data_quality_check_pipeline_spark.sources.tables import (
            IncrementalReadError,
        )

        store = TableStore(spark, out_root)
        mk = lambda lo, hi: spark.createDataFrame(  # noqa: E731
            [(i,) for i in range(lo, hi)], "id long"
        )
        s1 = store.write("t2", mk(0, 10), mode="overwrite")
        store.write("t2", mk(10, 20), mode="append")
        store.write("t2", mk(0, 5), mode="overwrite")  # history rewrite
        import pytest as _pytest

        with _pytest.raises(IncrementalReadError, match="non-append"):
            store.read_incremental("t2", s1)
        # compact also breaks the delta: new dirs would re-deliver
        s3 = store.current_snapshot("t2")["id"]
        store.write("t2", mk(5, 8), mode="append")
        store.compact("t2")
        with _pytest.raises(IncrementalReadError):
            store.read_incremental("t2", s3)


class TestReadChangelog:
    """TableStore.read_changelog: row-level net CDC between an anchor
    and the current snapshot — the escape hatch read_incremental's
    honest refusal points at. Deletes-then-inserts applied to the
    anchored copy must land exactly on the current table."""

    @staticmethod
    def _mk(spark, lo, hi, tag="v"):
        return spark.createDataFrame(
            [(i, f"{tag}{i}") for i in range(lo, hi)],
            "id long, v string",
        )

    def _apply(self, anchored, changes):
        dels = changes.filter(F.col("_change_type") == "delete").drop(
            "_change_type"
        )
        ins = changes.filter(F.col("_change_type") == "insert").drop(
            "_change_type"
        )
        return anchored.exceptAll(dels).unionByName(ins)

    def _rows(self, df):
        return sorted((r["id"], r["v"]) for r in df.collect())

    def test_cdc_replays_upsert_delete_append(self, spark, out_root):
        store = TableStore(spark, out_root)
        s1 = store.write("cdc", self._mk(spark, 0, 100),
                         mode="overwrite")
        store.upsert("cdc", self._mk(spark, 10, 20, "w"), "id")
        store.delete_where("cdc", "id", list(range(50, 55)))
        store.write("cdc", self._mk(spark, 100, 110), mode="append")

        # the append-only contract is honestly broken...
        from data_quality_check_pipeline_spark.sources.tables import (
            IncrementalReadError,
        )

        with pytest.raises(IncrementalReadError):
            store.read_incremental("cdc", s1)
        # ...and the changelog expresses the same history as net rows
        ch = store.read_changelog("cdc", s1)
        dels = self._rows(
            ch.filter(F.col("_change_type") == "delete").drop(
                "_change_type"
            )
        )
        ins = self._rows(
            ch.filter(F.col("_change_type") == "insert").drop(
                "_change_type"
            )
        )
        assert dels == sorted(
            [(i, f"v{i}") for i in range(10, 20)]
            + [(i, f"v{i}") for i in range(50, 55)]
        )
        assert ins == sorted(
            [(i, f"w{i}") for i in range(10, 20)]
            + [(i, f"v{i}") for i in range(100, 110)]
        )
        # replay: anchored copy + changelog == current table, exactly
        replayed = self._apply(store.read("cdc", s1), ch)
        assert self._rows(replayed) == self._rows(store.read("cdc"))

    def test_cdc_net_zero_and_empty_anchor_at_current(
        self, spark, out_root
    ):
        store = TableStore(spark, out_root)
        s1 = store.write("cdc0", self._mk(spark, 0, 30),
                         mode="overwrite")
        # an upsert that replaces rows with IDENTICAL images rewrites
        # a dir but changes nothing — net CDC stays empty
        store.upsert("cdc0", self._mk(spark, 5, 10), "id")
        ch = store.read_changelog("cdc0", s1)
        assert ch.count() == 0
        assert ch.columns == ["id", "v", "_change_type"]
        cur = store.current_snapshot("cdc0")["id"]
        assert store.read_changelog("cdc0", cur).count() == 0

    def test_cdc_across_compact_still_replays(self, spark, out_root):
        store = TableStore(spark, out_root)
        s1 = store.write("cdc1", self._mk(spark, 0, 40),
                         mode="overwrite")
        store.upsert("cdc1", self._mk(spark, 0, 5, "w"), "id")
        store.compact("cdc1")
        store.write("cdc1", self._mk(spark, 40, 45), mode="append")
        ch = store.read_changelog("cdc1", s1)
        replayed = self._apply(store.read("cdc1", s1), ch)
        assert self._rows(replayed) == self._rows(store.read("cdc1"))

    def test_cdc_refusals(self, spark, out_root):
        import shutil

        from data_quality_check_pipeline_spark.sources.tables import (
            IncrementalReadError,
        )

        store = TableStore(spark, out_root)
        s1 = store.write("cdc2", self._mk(spark, 0, 20),
                         mode="overwrite")
        up = store.upsert("cdc2", self._mk(spark, 0, 3, "w"), "id")
        with pytest.raises(IncrementalReadError, match="not in"):
            store.read_changelog("cdc2", "deadbeef00000000")
        # a differing dir reclaimed from disk (race with expire /
        # manual cleanup) must refuse, never emit a partial delta
        shutil.rmtree(
            os.path.join(out_root, "cdc2", f"snap_{up['snapshot']}")
        )
        with pytest.raises(IncrementalReadError, match="expired"):
            store.read_changelog("cdc2", s1)


class TestSketchProfileStage:
    def test_profile_rows_drift_and_corpus_estimates(
        self, spark, corpus, out_root
    ):
        """--profile-cols: one sketch row lands per shard; run-level
        drift is quiet across hash-sharded shards of one corpus; the
        corpus-lifetime profile answers from sketch rows alone with
        rows == landed clips exactly."""
        from data_quality_check_pipeline_spark.operators.profile import (
            corpus_profile,
        )
        from data_quality_check_pipeline_spark.pipeline import (
            PROFILE_TABLE,
        )

        _, _, path = corpus
        cfg = RunConfig(
            out_root=out_root, run_id="pp1", source_fingerprint="fpp",
            n_shards=2, profile_cols=["lang", "codec"],
        )
        m = run_pipeline(spark, path, cfg)
        store = TableStore(spark, out_root)
        assert store.read(PROFILE_TABLE).count() == 2
        assert m["profile_drift"]["batches"] == 2
        assert m["profile_drift"]["findings"] == []
        est = {
            r["column"]: r
            for r in corpus_profile(
                store, PROFILE_TABLE, ["lang", "codec"]
            ).collect()
        }
        assert est["lang"]["rows"] == m["quality"]["kept"]
        assert 0 < est["lang"]["approx_distinct"] <= 10
        assert 0 < est["codec"]["approx_distinct"] <= 10
        assert est["lang"]["nulls"] == 0


class TestTokenPackingStage:
    def test_pack_assignments_rederivable(
        self, spark, corpus, out_root
    ):
        """--pack-tokens: every (lang, split, pack_shard) group's
        chunk/offset assignments must equal the deterministic
        clip_id-ordered prefix-sum fold over n_tokens — globally
        unique chunk identity, replay-derivable from the output
        alone."""
        _, _, path = corpus
        cfg = RunConfig(
            out_root=out_root, run_id="pk", source_fingerprint="fpk",
            n_shards=2, pack_budget=400,
            split_fractions={"train": 0.9, "val": 0.1},
        )
        run_pipeline(spark, path, cfg)
        rows = (
            TableStore(spark, out_root).read(CLEAN_TABLE)
            .select(
                "clip_id", "lang", "split", "pack_shard", "chunk_id",
                "start_offset", "n_tokens",
            )
            .collect()
        )
        assert len(rows) > 0
        groups: dict = {}
        for r in rows:
            groups.setdefault(
                (r["lang"], r["split"], r["pack_shard"]), []
            ).append(r)
        for key, g in groups.items():
            off = 0
            for r in sorted(g, key=lambda r: r["clip_id"]):
                assert r["start_offset"] == off, (key, r["clip_id"])
                assert r["chunk_id"] == off // 400
                off += r["n_tokens"]

    def test_pack_run_scopes_chunk_identity_across_runs(
        self, spark, corpus, out_root
    ):
        """Two runs appended to one out_root each restart chunk ids;
        without pack_run in the group key their chunks would alias —
        with it, every (pack_run, lang, pack_shard) group's
        assignments stay independently re-derivable."""
        _, _, path = corpus
        for run_id, fp in (("pr1", "fp_a"), ("pr2", "fp_b")):
            run_pipeline(
                spark, path,
                RunConfig(
                    out_root=out_root, run_id=run_id,
                    source_fingerprint=fp, force=True,
                    pack_budget=400,
                ),
            )
        rows = (
            TableStore(spark, out_root).read(CLEAN_TABLE)
            .select(
                "clip_id", "lang", "pack_run", "pack_shard",
                "chunk_id", "start_offset", "n_tokens",
            )
            .collect()
        )
        runs = {r["pack_run"] for r in rows}
        assert runs == {"pr1", "pr2"}
        # the SAME (lang, pack_shard, chunk_id) exists under both runs:
        # the aliasing pack_run exists to disambiguate
        bare = {}
        for r in rows:
            bare.setdefault(
                (r["lang"], r["pack_shard"], r["chunk_id"]), set()
            ).add(r["pack_run"])
        assert any(len(v) == 2 for v in bare.values())
        # per (pack_run, lang, pack_shard): assignments re-derivable
        groups: dict = {}
        for r in rows:
            groups.setdefault(
                (r["pack_run"], r["lang"], r["pack_shard"]), []
            ).append(r)
        for key, g in groups.items():
            off = 0
            for r in sorted(g, key=lambda r: r["clip_id"]):
                assert r["start_offset"] == off, key
                assert r["chunk_id"] == off // 400
                off += r["n_tokens"]


class TestDecontaminationStage:
    """--decontam-heldout: kept clips overlapping an eval set in word
    n-grams quarantine terminally, BEFORE dedup (no history signature),
    and the flagged set matches a pure-Python shingle oracle exactly."""

    K = 4

    @staticmethod
    def _shingles(text, k):
        toks = text.strip().lower().split()
        if len(toks) < k:
            return {" ".join(toks)}
        return {
            " ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)
        }

    def test_contaminated_clips_quarantine_terminally(
        self, spark, tmp_path
    ):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from data_quality_check_pipeline_spark.pipeline import (
            flag_clips,
            requeue_quarantine,
            score_clips,
        )
        from data_quality_check_pipeline_spark.synth import generate_clips

        pdf, _ = generate_clips(40)
        sdf = spark.createDataFrame(pdf)
        valid = {
            r["clip_id"]: r["transcript"]
            for r in flag_clips(score_clips(sdf))
            .filter("keep").select("clip_id", "transcript").collect()
        }
        assert len(valid) >= 3
        ids = sorted(valid)
        a, b = ids[0], ids[1]
        # heldout: clip a's full transcript, a 4-word snippet from the
        # middle of clip b's, and an unrelated row
        b_toks = valid[b].split()
        assert len(b_toks) >= self.K
        mid = max(0, len(b_toks) // 2 - self.K // 2)
        snippet = " ".join(b_toks[mid:mid + self.K])
        heldout = pd.DataFrame(
            {"text": [valid[a], snippet, "zz unrelated heldout row zz"]}
        )
        hpath = str(tmp_path / "heldout.parquet")
        pq.write_table(
            pa.Table.from_pandas(heldout, preserve_index=False), hpath
        )
        # the exact expected flag set, from an independent shingle oracle
        held_sh = set().union(
            *(self._shingles(t, self.K) for t in heldout["text"])
        )
        expected = {
            cid for cid, t in valid.items()
            if self._shingles(t, self.K) & held_sh
        }
        assert a in expected and b in expected

        cpath = str(tmp_path / "clips.parquet")
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False), cpath
        )
        out = str(tmp_path / "tables")
        cfg = RunConfig(
            out_root=out, run_id="rdc", source_fingerprint="fpD",
            dedup_content=True, module_reports=False,
            decontam_heldout=hpath, decontam_k=self.K,
        )
        m = run_pipeline(spark, cpath, cfg)
        store = TableStore(spark, out)
        clean_ids = {
            r["clip_id"] for r in store.read(CLEAN_TABLE).collect()
        }
        assert clean_ids == set(valid) - expected
        assert m["quality"]["kept"] == len(valid) - len(expected)
        q = {
            r["clip_id"]: (list(r["reasons"]), r["stage"])
            for r in store.read(QUARANTINE_TABLE)
            .filter(F.array_contains("reasons", "eval_contamination"))
            .collect()
        }
        assert set(q) == expected
        assert all(
            stage == "decontaminate" for _, stage in q.values()
        )
        # BEFORE dedup: contaminated clips left no signature history
        hist_n = store.read("content_hash_history").count()
        assert hist_n == len(valid) - len(expected)
        # terminal: requeue never re-drives a contaminated clip
        res = requeue_quarantine(spark, cfg, cpath)
        assert store.read(CLEAN_TABLE).count() == len(clean_ids)
        assert not (
            expected
            & {r["clip_id"] for r in store.read(CLEAN_TABLE).collect()}
        )
        assert "requeued" in res
