"""File-level copy-on-write carry-forward (sources/tables.py):
upsert/delete_where rewrite only the FILES whose min/max stats overlap
the keys and hard-link every provably-clean file into the new snapshot
dir; read_changelog cancels shared-inode files out of its diff.

Why it matters: the ingest layout is hash-sharded, so every snapshot
DIR spans the whole clip_id domain and dir-granular COW rewrites the
entire table on any correction (measured: a 100-clip correction on a
160k-clip table rewrote all 4 dirs). With id-clustered FILES inside
the dirs, file-level COW bounds the rewrite to the overlapping files
— the layout corrections/takedowns actually run against at 100 TB.
"""

import glob
import os

import pytest
from pyspark.sql import functions as F

from data_quality_check_pipeline_spark.sources.tables import TableStore


def _base_df(spark, n=800):
    return spark.range(0, n).select(
        F.format_string("clip_%04d", F.col("id")).alias("clip_id"),
        (F.col("id") % 7).cast("long").alias("v"),
    )


@pytest.fixture()
def store(spark, tmp_path):
    s = TableStore(spark, str(tmp_path / "ts"))
    # one dir, 8 id-clustered files with disjoint clip_id ranges
    s.write("t", _base_df(spark), cluster_by=["clip_id"],
            target_files=8)
    return s


def _inodes(dirpath):
    return {
        os.stat(p).st_ino
        for p in glob.glob(os.path.join(dirpath, "**", "*.parquet"),
                           recursive=True)
    }


def _snap_dir(store, name, sid):
    return os.path.join(store.root, name, f"snap_{sid}")


class TestDeleteFileCow:
    def test_rewrites_only_overlapping_files(self, spark, store):
        base_sid = store.current_snapshot("t")["id"]
        res = store.delete_where(
            "t", "clip_id", ["clip_0010", "clip_0011"]
        )
        assert res["dirs_rewritten"] == 1
        assert res["files_rewritten"] == 1
        assert res["files_carried"] == 7
        assert res["n_deleted"] == 2
        out = store.read("t")
        assert out.count() == 798
        assert out.filter(
            F.col("clip_id").isin("clip_0010", "clip_0011")
        ).count() == 0
        # full content check: survivors untouched, v values intact
        got = {r["clip_id"]: r["v"] for r in out.collect()}
        want = {
            f"clip_{i:04d}": i % 7
            for i in range(800) if i not in (10, 11)
        }
        assert got == want
        # carried files are the SAME inode (hard link, zero copy)
        base_inodes = _inodes(_snap_dir(store, "t", base_sid))
        new_inodes = _inodes(_snap_dir(store, "t", res["snapshot"]))
        assert len(new_inodes & base_inodes) == 7
        assert len(new_inodes - base_inodes) >= 1  # the rewritten file

    def test_pruned_read_selective_after_cow(self, spark, store):
        store.delete_where("t", "clip_id", ["clip_0010"])
        scan = {}
        n = store.read(
            "t", prune=[("clip_id", "=", "clip_0700")], scan_stats=scan
        ).filter(F.col("clip_id") == "clip_0700").count()
        assert n == 1
        # carried + rewritten files all have stats; point query skips
        # most of the 8 files
        assert scan["files_skipped"] >= 6
        assert scan["files_unknown"] == 0


class TestUpsertFileCow:
    def test_rewrites_only_overlapping_files(self, spark, store):
        base_sid = store.current_snapshot("t")["id"]
        inc = spark.createDataFrame(
            [("clip_0010", 100), ("clip_0011", 101), ("clip_9999", 7)],
            "clip_id string, v long",
        )
        res = store.upsert("t", inc, "clip_id")
        assert res["n_updated"] == 2
        assert res["n_inserted"] == 1
        assert res["dirs_rewritten"] == 1
        assert res["files_carried"] == 7
        # clip_9999 sorts past every file's max -> only the 0010/0011
        # range file overlaps... unless the last file's open-ended max
        # catches it; allow 1-2 but never the whole dir
        assert res["files_rewritten"] <= 2
        out = store.read("t")
        got = {r["clip_id"]: r["v"] for r in out.collect()}
        want = {f"clip_{i:04d}": i % 7 for i in range(800)}
        want.update({"clip_0010": 100, "clip_0011": 101,
                     "clip_9999": 7})
        assert got == want
        base_inodes = _inodes(_snap_dir(store, "t", base_sid))
        new_inodes = _inodes(_snap_dir(store, "t", res["snapshot"]))
        assert len(new_inodes & base_inodes) == 7

    def test_schema_widening_disables_carry(self, spark, store):
        inc = spark.createDataFrame(
            [("clip_0010", 100, 0.9)],
            "clip_id string, v long, conf double",
        )
        res = store.upsert("t", inc, "clip_id")
        assert res["n_updated"] == 1
        assert res["files_carried"] == 0  # mixed-schema dir forbidden
        out = store.read("t")
        assert "conf" in out.columns
        got = {
            r["clip_id"]: (r["v"], r["conf"])
            for r in out.filter(
                F.col("clip_id").isin("clip_0010", "clip_0011")
            ).collect()
        }
        assert got == {"clip_0010": (100, 0.9),
                       "clip_0011": (11 % 7, None)}

    def test_partitioned_carry_keeps_partition_paths(
        self, spark, tmp_path
    ):
        s = TableStore(spark, str(tmp_path / "tp"))
        df = _base_df(spark).withColumn(
            "part", (F.col("v") % 2).cast("int")
        )
        s.write("tp", df, partition_by=["part"],
                cluster_by=["clip_id"], target_files=8)
        inc = spark.createDataFrame(
            [("clip_0010", 100, 0)], "clip_id string, v long, part int"
        )
        res = s.upsert("tp", inc, "clip_id")
        assert res["n_updated"] == 1
        assert res["files_carried"] > 0
        out = s.read("tp")
        assert out.count() == 800
        # carried files keep their hive path -> partition col intact
        assert out.filter(F.col("part").isNull()).count() == 0
        assert out.filter(
            (F.col("clip_id") == "clip_0010") & (F.col("v") == 100)
        ).count() == 1

    def test_legacy_dir_without_stats_full_rewrite(self, spark, store):
        # simulate a pre-stats manifest entry
        import json

        mp = store._manifest_path("t")
        with open(mp) as f:
            m = json.load(f)
        for snap in m["snapshots"]:
            snap.pop("files", None)
        store._save_manifest("t", m)
        inc = spark.createDataFrame(
            [("clip_0010", 100)], "clip_id string, v long"
        )
        res = store.upsert("t", inc, "clip_id")
        assert res["n_updated"] == 1
        assert res["files_carried"] == 0
        got = {r["clip_id"]: r["v"] for r in store.read("t").collect()}
        assert got["clip_0010"] == 100
        assert len(got) == 800


class TestChangelogInodeCancel:
    def test_diff_reads_only_rewritten_files(self, spark, store):
        anchor = store.current_snapshot("t")["id"]
        inc = spark.createDataFrame(
            [("clip_0010", 100), ("clip_0011", 101)],
            "clip_id string, v long",
        )
        store.upsert("t", inc, "clip_id")
        scan = {}
        ch = store.read_changelog("t", anchor, scan_stats=scan)
        rows = {
            (r["clip_id"], r["v"], r["_change_type"])
            for r in ch.collect()
        }
        assert rows == {
            ("clip_0010", 10 % 7, "delete"),
            ("clip_0011", 11 % 7, "delete"),
            ("clip_0010", 100, "insert"),
            ("clip_0011", 101, "insert"),
        }
        # 7 carried files cancel on BOTH sides; only the rewritten
        # file and its old image are diffed
        assert scan["files_cancelled"] == 14
        assert scan["files_diffed"] == 2

    def test_equivalence_vs_full_diff(self, spark, store):
        anchor = store.current_snapshot("t")["id"]
        store.upsert(
            "t",
            spark.createDataFrame(
                [("clip_0500", 42), ("clip_9999", 1)],
                "clip_id string, v long",
            ),
            "clip_id",
        )
        store.delete_where("t", "clip_id", ["clip_0001"])
        ch = store.read_changelog("t", anchor)
        old = store.read("t", snapshot_id=anchor)
        new = store.read("t")
        want_ins = {
            tuple(r) for r in new.exceptAll(old).collect()
        }
        want_del = {
            tuple(r) for r in old.exceptAll(new).collect()
        }
        got_ins = {
            tuple(r)[:-1] for r in ch.filter(
                F.col("_change_type") == "insert"
            ).collect()
        }
        got_del = {
            tuple(r)[:-1] for r in ch.filter(
                F.col("_change_type") == "delete"
            ).collect()
        }
        assert got_ins == want_ins
        assert got_del == want_del


def test_list_tables(spark, tmp_path):
    s = TableStore(spark, str(tmp_path / "r"))
    df = spark.createDataFrame([("x", 1)], "clip_id string, v long")
    s.write("bravo", df)
    s.write("alpha", df)
    (tmp_path / "r" / "not_a_table").mkdir()
    assert s.list_tables() == ["alpha", "bravo"]


class TestReleaseManagement:
    """row_count from manifest metadata, timestamp time travel, and
    release tags (survive expiry; --export-snapshot accepts them)."""

    def test_row_count_metadata_only_and_fallback(self, spark, store):
        assert store.row_count("t") == 800
        store.delete_where("t", "clip_id", ["clip_0010", "clip_0011"])
        assert store.row_count("t") == 798
        assert store.row_count("t") == store.read("t").count()
        # legacy manifest without per-file rows: Spark-count fallback
        import json

        with open(store._manifest_path("t")) as f:
            m = json.load(f)
        for snap in m["snapshots"]:
            for fent in snap.get("files") or []:
                fent.pop("rows", None)
        store._save_manifest("t", m)
        assert store.row_count("t") == 798

    def test_as_of_timestamp(self, spark, store):
        v1 = store.current_snapshot("t")
        inc = spark.createDataFrame(
            [("clip_0010", 100)], "clip_id string, v long"
        )
        store.upsert("t", inc, "clip_id")
        v2 = store.current_snapshot("t")
        mid = (v1["ts"] + v2["ts"]) / 2.0
        old = store.read("t", as_of_ts=mid)
        assert old.filter("clip_id = 'clip_0010'").first()["v"] == 3
        new = store.read("t", as_of_ts=v2["ts"])
        assert new.filter("clip_id = 'clip_0010'").first()["v"] == 100
        with pytest.raises(KeyError, match="at or before"):
            store.read("t", as_of_ts=v1["ts"] - 1)

    def test_tag_survives_expiry_until_dropped(self, spark, store):
        rel_sid = store.tag("t", "rel-1")
        assert store.tags("t") == {"rel-1": rel_sid}
        # immutable: moving the tag must raise, re-tagging is a no-op
        assert store.tag("t", "rel-1") == rel_sid
        for i in range(6):
            store.write(
                "t",
                spark.createDataFrame(
                    [(f"extra_{i}", 0)], "clip_id string, v long"
                ),
                mode="append",
            )
        with pytest.raises(ValueError, match="untag first"):
            store.tag("t", "rel-1", store.current_snapshot("t")["id"])
        expired = store.expire_snapshots(
            "t", keep_last=2, orphan_grace_s=0
        )
        assert rel_sid not in expired
        # the tagged release is still fully readable
        assert store.row_count("t", tag="rel-1") == 800
        assert store.read("t", tag="rel-1").count() == 800
        # drop the tag -> next expiry reclaims it
        store.untag("t", "rel-1")
        expired = store.expire_snapshots(
            "t", keep_last=2, orphan_grace_s=0
        )
        assert rel_sid in expired
        with pytest.raises(KeyError, match="unknown tag"):
            store.read("t", tag="rel-1")


class TestReviewFindings:
    """Round-4 code-review fixes: as-of follows the live branch after
    a rollback, keep_last=0 is not a slice no-op, and hard takedown
    refuses while tags pin the purged bytes."""

    def test_as_of_ignores_rolled_back_branch(self, spark, store):
        v1 = store.current_snapshot("t")["id"]
        store.upsert(
            "t",
            spark.createDataFrame(
                [("clip_0010", 666)], "clip_id string, v long"
            ),
            "clip_id",
        )
        store.rollback("t", v1)  # discard the bad correction
        now = store.current_snapshot("t")["ts"] + 1e6
        got = store.read("t", as_of_ts=now)
        # a raw max-by-ts would resurrect the discarded 666 row
        assert got.filter("clip_id = 'clip_0010'").first()["v"] == 3
        assert store.row_count("t", as_of_ts=now) == 800

    def test_expire_keep_last_zero_keeps_only_pinned(
        self, spark, store
    ):
        for i in range(3):
            store.write(
                "t",
                spark.createDataFrame(
                    [(f"x{i}", 0)], "clip_id string, v long"
                ),
                mode="append",
            )
        expired = store.expire_snapshots(
            "t", keep_last=0, orphan_grace_s=0
        )
        assert len(expired) == 3  # all but current (pinned)
        assert [s["id"] for s in store.snapshots("t")] == [
            store.current_snapshot("t")["id"]
        ]
        assert store.read("t").count() == 803  # data intact

    def test_hard_takedown_refuses_while_tagged(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from data_quality_check_pipeline_spark.pipeline import (
            CLEAN_TABLE,
            RunConfig,
            run_pipeline,
        )
        from data_quality_check_pipeline_spark.synth import (
            generate_clips,
        )
        from data_quality_check_pipeline_spark.takedown import (
            apply_takedown,
        )

        df, _ = generate_clips(300)
        src = str(tmp_path / "clips.parquet")
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False), src
        )
        root = str(tmp_path / "t")
        run_pipeline(spark, src, RunConfig(out_root=root, run_id="r1",
                                           module_reports=False))
        store = TableStore(spark, root)
        store.tag(CLEAN_TABLE, "rel-1")
        victim = store.read(CLEAN_TABLE).select("clip_id").first()[0]
        with pytest.raises(ValueError, match="untag those releases"):
            apply_takedown(spark, root, [victim], mode="purge",
                           takedown_id="td1", hard=True)
        # nothing committed: the row is still present, and the same
        # takedown id is NOT burned (fail-fast preceded the marker)
        assert store.read(CLEAN_TABLE).filter(
            F.col("clip_id") == victim
        ).count() == 1
        store.untag(CLEAN_TABLE, "rel-1")
        rep = apply_takedown(spark, root, [victim], mode="purge",
                             takedown_id="td1", hard=True,
                             orphan_grace_s=0)
        assert not rep["skipped_already_applied"]
        assert rep["tables"][CLEAN_TABLE]["n_deleted"] == 1
        assert "hard_expired" in rep


def test_only_files_composes_with_prune(spark, store):
    """White-box: _union_snapshot_dirs applies min/max pruning WITHIN
    an explicit only_files subset (no caller combines them today, but
    the contract must hold for future COW reads with predicates)."""
    m = store._load_manifest("t")
    snap = store.current_snapshot("t")
    d = snap["read_set"][0]
    finfo = {
        f"snap_{s['id']}": s.get("files") for s in m["snapshots"]
    }[d]
    allow = [f["path"] for f in finfo]  # all 8 files explicitly
    scan = {}
    df = store._union_snapshot_dirs(
        "t", m, [d], snap["schema"],
        prune=[("clip_id", "=", "clip_0700")],
        scan_stats=scan, only_files={d: allow},
    )
    assert df.filter("clip_id = 'clip_0700'").count() == 1
    assert scan["files_kept"] + scan["files_skipped"] == len(allow)
    assert scan["files_skipped"] >= 6  # point query prunes the subset


class TestHintUnclustered:
    """_hint_unclustered only advises cluster-compaction when clustering
    is actually the cause: schema-drift carry fallback gets the
    schema-drift message, a single-file table gets no hint at all."""

    @staticmethod
    def _call(caplog, out, **kw):
        import logging

        from data_quality_check_pipeline_spark.sources.tables import (
            TableStore,
        )

        ts = TableStore.__new__(TableStore)  # helper never touches self
        with caplog.at_level(
            logging.WARNING,
            logger="data_quality_check_pipeline_spark.sources.tables",
        ):
            ts._hint_unclustered("t", "clip_id", out, **kw)
        return [r.getMessage() for r in caplog.records]

    DEGENERATE = {
        "dirs_untouched": 0, "files_carried": 0, "dirs_rewritten": 2,
    }

    def test_unclustered_layout_gets_compact_hint(self, caplog):
        msgs = self._call(caplog, dict(self.DEGENERATE), total_files=64)
        assert len(msgs) == 1 and "cluster_by" in msgs[0]

    def test_schema_drift_fallback_blames_schema_not_layout(self, caplog):
        msgs = self._call(
            caplog, dict(self.DEGENERATE),
            carry_safe=False, total_files=64,
        )
        assert len(msgs) == 1
        assert "schema drift" in msgs[0]
        assert "cluster_by" not in msgs[0]

    def test_single_file_table_is_silent(self, caplog):
        assert self._call(
            caplog, dict(self.DEGENERATE), total_files=1
        ) == []

    def test_bounded_rewrite_is_silent(self, caplog):
        out = {
            "dirs_untouched": 3, "files_carried": 5, "dirs_rewritten": 1,
        }
        assert self._call(caplog, out, total_files=64) == []
