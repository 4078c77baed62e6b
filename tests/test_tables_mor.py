"""Merge-on-read equality deletes (sources/tables.py delete_keys_mor):
the Iceberg v2 delete-file analogue. A takedown against 100 TB must
not cost data I/O proportional to the touched files (COW's floor):
MOR commits a KB-sized key file and applies it as a broadcast
anti-join at scan time, scoped to the data dirs that existed at
delete time (the sequence-number rule at dir granularity). compact()
is the materialization point; data-restructuring maintenance refuses
while deletes are pending (their file moves would escape the scope
and resurrect rows).
"""

import glob
import os

import pytest
from pyspark.sql import functions as F

from data_quality_check_pipeline_spark.sources.tables import TableStore


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.format_string("clip_%04d", F.col("id")).alias("clip_id"),
        (F.col("id") % 7).cast("long").alias("v"),
    )


def _ids(df):
    return sorted(r["clip_id"] for r in df.select("clip_id").collect())


def _inodes(root):
    return {
        p: os.stat(p).st_ino
        for p in glob.glob(
            os.path.join(root, "snap_*", "**", "*.parquet"),
            recursive=True,
        )
    }


@pytest.fixture()
def store(spark, tmp_path):
    s = TableStore(spark, str(tmp_path / "ts"))
    s.write("t", _df(spark, 0, 100), cluster_by=["clip_id"],
            target_files=4)
    s.write("t", _df(spark, 100, 200), mode="append")
    return s


class TestMorDelete:
    def test_read_excludes_keys_without_touching_data(self, store):
        before = _inodes(os.path.join(store.root, "t"))
        res = store.delete_keys_mor(
            "t", "clip_id", ["clip_0003", "clip_0150", "clip_9999"]
        )
        assert res["snapshot"] and res["n_keys"] == 3
        assert res["dirs_in_scope"] == 2
        after = _inodes(os.path.join(store.root, "t"))
        assert before == after  # zero data files written or rewritten
        got = _ids(store.read("t"))
        assert "clip_0003" not in got and "clip_0150" not in got
        assert len(got) == 198  # clip_9999 never existed: no-op key

    def test_key_col_renamed_in_race_window_refuses(
        self, spark, store, monkeypatch
    ):
        """Pre-lock validation saw clip_id; a rename commits before
        the lock lands (renames only refuse once deletes are PENDING,
        so this window is real). Committing the stale entry would mint
        a delete matching no column — silently removing zero rows."""
        orig = TableStore._table_lock
        fired = {"done": False}

        def hijack(self, name, *a, **k):
            if not fired["done"]:
                fired["done"] = True
                # independent handle: its own locking nests cleanly
                TableStore(spark, self.root).rename_column(
                    "t", "clip_id", "cid"
                )
            return orig(self, name, *a, **k)

        monkeypatch.setattr(TableStore, "_table_lock", hijack)
        with pytest.raises(KeyError, match="vanished"):
            store.delete_keys_mor("t", "clip_id", ["clip_0003"])
        # no stale entry committed, no orphan key file left behind
        assert not store.current_snapshot("t").get("delete_files")
        assert not glob.glob(
            os.path.join(store.root, "t", "deletes_*")
        )

    def test_time_travel_and_row_count(self, store):
        pre = store.current_snapshot("t")["id"]
        store.delete_keys_mor("t", "clip_id", ["clip_0000", "clip_0001"])
        # pre-delete snapshot still shows the rows
        assert len(_ids(store.read("t", snapshot_id=pre))) == 200
        assert store.row_count("t", snapshot_id=pre) == 200
        # deletes-pending count falls back to a real (delete-applied)
        # count — manifest arithmetic cannot subtract unmatched keys
        assert store.row_count("t") == 198

    def test_stacked_deletes_and_second_key_col(self, store):
        store.delete_keys_mor("t", "clip_id", ["clip_0005"])
        store.delete_keys_mor("t", "v", [3])
        got = store.read("t")
        assert got.filter(F.col("v") == 3).count() == 0
        assert "clip_0005" not in _ids(got)
        # 200 rows - 1 id - (v==3 rows not already removed)
        v3 = 200 // 7 + (1 if 3 < 200 % 7 else 0)  # ids ≡3 mod 7
        expect = 200 - 1 - (v3 - (1 if 5 % 7 == 3 else 0))
        assert got.count() == expect

    def test_append_after_delete_is_out_of_scope(self, store):
        store.delete_keys_mor("t", "clip_id", ["clip_0042"])
        # the same key re-arrives in a NEW dir: outside the delete's
        # applies_to scope, it must be visible (Iceberg sequence rule)
        store.write(
            "t",
            store.spark.createDataFrame(
                [("clip_0042", 99)], "clip_id string, v long"
            ),
            mode="append",
        )
        got = store.read("t").filter(F.col("clip_id") == "clip_0042")
        rows = got.collect()
        assert len(rows) == 1 and rows[0]["v"] == 99

    def test_null_keys_survive_and_null_key_refused(self, store, spark):
        store.write(
            "t",
            spark.createDataFrame(
                [(None, 7)], "clip_id string, v long"
            ),
            mode="append",
        )
        store.delete_keys_mor("t", "clip_id", ["clip_0001"])
        assert store.read("t").filter(
            F.col("clip_id").isNull()
        ).count() == 1
        with pytest.raises(ValueError, match="non-NULL"):
            store.delete_keys_mor("t", "clip_id", [None, "x"])

    def test_unknown_key_col_refused(self, store):
        with pytest.raises(KeyError, match="nope"):
            store.delete_keys_mor("t", "nope", ["x"])

    def test_prune_composes_with_deletes(self, store):
        store.delete_keys_mor("t", "clip_id", ["clip_0001"])
        stats = {}
        got = store.read(
            "t", prune=[("clip_id", "in", ["clip_0001", "clip_0002"])],
            scan_stats=stats,
        ).filter(F.col("clip_id").isin(["clip_0001", "clip_0002"]))
        assert _ids(got) == ["clip_0002"]
        assert stats["files_skipped"] > 0  # clustered layout pruned


class TestMorCompactAndMaintenance:
    def test_compact_materializes(self, store):
        store.delete_keys_mor("t", "clip_id", ["clip_0003"])
        sid = store.compact("t")
        assert sid is not None
        snap = store.current_snapshot("t")
        assert not snap.get("delete_files")
        assert snap["properties"]["materialized_delete_files"] == 1
        got = _ids(store.read("t"))
        assert "clip_0003" not in got and len(got) == 199
        # back on the manifest-count fast path
        assert store.row_count("t") == 199

    def test_compact_single_dir_still_materializes(self, spark, tmp_path):
        s = TableStore(spark, str(tmp_path / "ts1"))
        s.write("t", _df(spark, 0, 50))
        s.delete_keys_mor("t", "clip_id", ["clip_0007"])
        assert s.compact("t") is not None  # no-op early return bypassed
        assert len(_ids(s.read("t"))) == 49
        assert not s.current_snapshot("t").get("delete_files")

    def test_restructuring_ops_refuse_until_compact(self, store, spark):
        store.delete_keys_mor("t", "clip_id", ["clip_0003"])
        with pytest.raises(RuntimeError, match="pending"):
            store.binpack("t", small_file_bytes=1 << 30)
        with pytest.raises(RuntimeError, match="pending"):
            store.delete_where("t", "clip_id", ["clip_0004"])
        with pytest.raises(RuntimeError, match="pending"):
            store.delete_below("t", "v", 2)
        with pytest.raises(RuntimeError, match="pending"):
            store.upsert(
                "t",
                spark.createDataFrame(
                    [("clip_0004", 1)], "clip_id string, v long"
                ),
                "clip_id",
            )
        with pytest.raises(RuntimeError, match="key column"):
            store.rename_column("t", "clip_id", "cid")
        with pytest.raises(RuntimeError, match="key column"):
            store.drop_column("t", "clip_id")
        store.compact("t")
        # all unblocked after materialization
        store.delete_where("t", "clip_id", ["clip_0004"])
        assert len(_ids(store.read("t"))) == 198

    def test_rename_other_column_carries_deletes(self, store):
        store.delete_keys_mor("t", "clip_id", ["clip_0003"])
        store.rename_column("t", "v", "val")
        snap = store.current_snapshot("t")
        assert len(snap["delete_files"]) == 1  # carried, not dropped
        got = store.read("t")
        assert "val" in got.columns
        assert "clip_0003" not in _ids(got)

    def test_second_append_carries_deletes(self, store, spark):
        store.delete_keys_mor("t", "clip_id", ["clip_0003"])
        store.write("t", _df(spark, 200, 210), mode="append")
        snap = store.current_snapshot("t")
        assert len(snap["delete_files"]) == 1
        got = _ids(store.read("t"))
        assert "clip_0003" not in got and len(got) == 209


class TestMorChangelog:
    def test_delete_emits_cdc_deletes(self, store):
        anchor = store.current_snapshot("t")["id"]
        store.delete_keys_mor(
            "t", "clip_id", ["clip_0003", "clip_0150", "clip_9999"]
        )
        log = store.read_changelog("t", anchor).collect()
        assert sorted(
            (r["clip_id"], r["_change_type"]) for r in log
        ) == [("clip_0003", "delete"), ("clip_0150", "delete")]

    def test_rollback_emits_cdc_inserts(self, store):
        anchor_pre = store.current_snapshot("t")["id"]
        store.delete_keys_mor("t", "clip_id", ["clip_0003"])
        deleted = store.current_snapshot("t")["id"]
        store.rollback("t", anchor_pre)
        log = store.read_changelog("t", deleted).collect()
        assert [(r["clip_id"], r["_change_type"]) for r in log] == [
            ("clip_0003", "insert")
        ]

    def test_stacked_overlapping_deletes_emit_once(self, store):
        anchor = store.current_snapshot("t")["id"]
        store.delete_keys_mor("t", "clip_id", ["clip_0003", "clip_0004"])
        store.delete_keys_mor("t", "clip_id", ["clip_0004", "clip_0005"])
        log = store.read_changelog("t", anchor).collect()
        assert sorted(r["clip_id"] for r in log) == [
            "clip_0003", "clip_0004", "clip_0005"
        ]
        assert {r["_change_type"] for r in log} == {"delete"}

    def test_delete_plus_append_compose(self, store, spark):
        anchor = store.current_snapshot("t")["id"]
        store.delete_keys_mor("t", "clip_id", ["clip_0003"])
        store.write("t", _df(spark, 200, 202), mode="append")
        log = store.read_changelog("t", anchor)
        by = {
            r["clip_id"]: r["_change_type"] for r in log.collect()
        }
        assert by == {
            "clip_0003": "delete",
            "clip_0200": "insert",
            "clip_0201": "insert",
        }

    def test_incremental_read_refuses_across_mor(self, store, spark):
        from data_quality_check_pipeline_spark.sources.tables import (
            IncrementalReadError,
        )

        anchor = store.current_snapshot("t")["id"]
        store.delete_keys_mor("t", "clip_id", ["clip_0003"])
        with pytest.raises(IncrementalReadError, match="non-append"):
            store.read_incremental("t", anchor)


class TestMorLifecycle:
    def test_expire_keeps_then_sweeps_delete_dirs(self, store, spark):
        store.delete_keys_mor("t", "clip_id", ["clip_0003"])
        ddirs = glob.glob(os.path.join(store.root, "t", "deletes_*"))
        assert len(ddirs) == 1
        # referenced by current: survives an aggressive expire
        store.expire_snapshots("t", keep_last=1, orphan_grace_s=0)
        assert os.path.isdir(ddirs[0])
        assert len(_ids(store.read("t"))) == 199
        # after the materializing compact ages the carrier out: swept
        store.compact("t")
        store.expire_snapshots("t", keep_last=1, orphan_grace_s=0)
        assert not os.path.isdir(ddirs[0])
        assert len(_ids(store.read("t"))) == 199

    def test_fsck_delete_files(self, store):
        store.delete_keys_mor("t", "clip_id", ["clip_0003"])
        rep = store.fsck("t", deep=True)
        assert rep["ok"], rep["findings"]
        # losing the key file is an error (silent resurrection)
        ddir = glob.glob(os.path.join(store.root, "t", "deletes_*"))[0]
        for p in glob.glob(os.path.join(ddir, "*.parquet")):
            os.unlink(p)
        rep = store.fsck("t")
        assert not rep["ok"]
        assert any(
            f["kind"] == "missing_delete_file" for f in rep["findings"]
        )

    def test_fsck_deep_count_mismatch(self, store):
        store.delete_keys_mor("t", "clip_id", ["clip_0003"])
        m = store._load_manifest("t")
        m["snapshots"][-1]["delete_files"][0]["n_keys"] = 5
        store._save_manifest("t", m)
        rep = store.fsck("t", deep=True)
        assert any(
            f["kind"] == "delete_key_count_mismatch"
            for f in rep["findings"]
        )

    def test_read_meta_deletes(self, store):
        store.delete_keys_mor("t", "clip_id", ["clip_0003", "clip_0004"])
        rows = store.read_meta("t", "deletes").collect()
        assert len(rows) == 1
        assert rows[0]["key_col"] == "clip_id"
        assert rows[0]["n_keys"] == 2
        assert rows[0]["dirs_in_scope"] == 2
        store.compact("t")
        assert store.read_meta("t", "deletes").count() == 0

    def test_branch_handle_refuses(self, store, spark):
        b = TableStore(spark, store.root, default_branch="wap-x")
        with pytest.raises(RuntimeError, match="mainline-only"):
            b.delete_keys_mor("t", "clip_id", ["clip_0003"])

    def test_schema_widened_old_dir_survives(self, spark, tmp_path):
        # dir written BEFORE the key column existed: all its rows have
        # NULL for the key -> never deleted, and the anti-join must not
        # crash on the missing column
        s = TableStore(spark, str(tmp_path / "ts2"))
        s.write(
            "t",
            spark.createDataFrame([(1,), (2,)], "v long"),
        )
        s.write(
            "t",
            spark.createDataFrame(
                [("a", 3), ("b", 4)], "clip_id string, v long"
            ),
            mode="append",
        )
        s.delete_keys_mor("t", "clip_id", ["a"])
        got = s.read("t")
        assert got.count() == 3
        assert got.filter(F.col("clip_id") == "a").count() == 0


class TestMorPredicateDelete:
    """delete_below_mor: the predicate (retention-TTL) MOR variant —
    manifest-only, not even a key file; reads filter at scan time."""

    def test_commit_writes_nothing_and_read_filters(self, store):
        tdir = os.path.join(store.root, "t")
        before = _inodes(tdir)
        res = store.delete_below_mor("t", "v", 3)
        assert res["snapshot"] and res["dirs_in_scope"] == 2
        assert _inodes(tdir) == before  # no data files touched
        assert not glob.glob(os.path.join(tdir, "deletes_*"))
        got = store.read("t")
        assert got.filter(F.col("v") < 3).count() == 0
        assert got.count() == sum(1 for i in range(200) if i % 7 >= 3)
        assert store.row_count("t") == got.count()

    def test_nulls_survive(self, store, spark):
        store.write(
            "t",
            spark.createDataFrame([(None, None)],
                                  "clip_id string, v long"),
            mode="append",
        )
        store.delete_below_mor("t", "v", 100)  # would kill every row
        got = store.read("t")
        assert got.count() == 1
        assert got.first()["v"] is None

    def test_append_after_is_out_of_scope(self, store, spark):
        store.delete_below_mor("t", "v", 100)
        store.write(
            "t",
            spark.createDataFrame([("late", 1)],
                                  "clip_id string, v long"),
            mode="append",
        )
        rows = store.read("t").collect()
        assert [(r["clip_id"], r["v"]) for r in rows] == [("late", 1)]

    def test_castability_checked_at_commit(self, store):
        with pytest.raises(ValueError, match="cast"):
            store.delete_below_mor("t", "v", "not-a-number")
        with pytest.raises(KeyError, match="nope"):
            store.delete_below_mor("t", "nope", 3)
        with pytest.raises(ValueError, match="unsupported"):
            store.delete_below_mor("t", "v", None)
        with pytest.raises(ValueError, match="unsupported"):
            store.delete_below_mor("t", "v", True)

    def test_timestamp_cutoff(self, spark, tmp_path):
        import datetime as dt

        s = TableStore(spark, str(tmp_path / "tst"))
        rows = [
            ("a", dt.datetime(2026, 1, 1)),
            ("b", dt.datetime(2026, 6, 1)),
            ("c", None),
        ]
        s.write(
            "t",
            spark.createDataFrame(rows, "clip_id string, ts timestamp"),
        )
        s.delete_below_mor("t", "ts", dt.datetime(2026, 3, 1))
        got = sorted(r["clip_id"] for r in s.read("t").collect())
        assert got == ["b", "c"]  # a expired; NULL ts survives

    def test_stacks_with_equality_delete(self, store):
        store.delete_keys_mor("t", "clip_id", ["clip_0006"])  # v == 6
        store.delete_below_mor("t", "v", 3)
        got = store.read("t")
        assert got.filter(F.col("v") < 3).count() == 0
        assert "clip_0006" not in _ids(got)
        assert got.count() == sum(
            1 for i in range(200) if i % 7 >= 3 and i != 6
        )

    def test_cdc_emits_pred_deletes_then_rollback_inserts(self, store):
        anchor = store.current_snapshot("t")["id"]
        store.delete_below_mor("t", "v", 1)  # v == 0 rows
        deleted = store.current_snapshot("t")["id"]
        log = store.read_changelog("t", anchor).collect()
        expect = sorted(
            f"clip_{i:04d}" for i in range(200) if i % 7 == 0
        )
        assert sorted(r["clip_id"] for r in log) == expect
        assert {r["_change_type"] for r in log} == {"delete"}
        store.rollback("t", anchor)
        log2 = store.read_changelog("t", deleted).collect()
        assert sorted(r["clip_id"] for r in log2) == expect
        assert {r["_change_type"] for r in log2} == {"insert"}

    def test_cdc_pred_and_equality_overlap_net_once(self, store):
        anchor = store.current_snapshot("t")["id"]
        store.delete_keys_mor("t", "clip_id", ["clip_0000"])  # v == 0
        store.delete_below_mor("t", "v", 1)  # also covers clip_0000
        log = store.read_changelog("t", anchor).collect()
        expect = sorted(
            f"clip_{i:04d}" for i in range(200) if i % 7 == 0
        )
        assert sorted(r["clip_id"] for r in log) == expect
        assert {r["_change_type"] for r in log} == {"delete"}

    def test_compact_materializes_and_maintenance_gate(self, store):
        store.delete_below_mor("t", "v", 3)
        with pytest.raises(RuntimeError, match="pending"):
            store.delete_where("t", "clip_id", ["clip_0005"])
        with pytest.raises(RuntimeError, match="key column"):
            store.rename_column("t", "v", "val")
        meta = store.read_meta("t", "deletes").collect()
        assert len(meta) == 1 and meta[0]["path"].startswith("<pred")
        n = store.row_count("t")
        store.compact("t")
        snap = store.current_snapshot("t")
        assert not snap.get("delete_files")
        assert store.row_count("t") == n
        assert store.read("t").filter(F.col("v") < 3).count() == 0
        store.rename_column("t", "v", "val")  # unblocked
        assert "val" in store.read("t").columns

    def test_expire_with_pending_pred_is_safe(self, store):
        store.delete_below_mor("t", "v", 3)
        n = store.row_count("t")
        store.expire_snapshots("t", keep_last=1, orphan_grace_s=0)
        assert store.row_count("t") == n
        rep = store.fsck("t", deep=True)
        assert rep["ok"], rep["findings"]

    def test_fsck_flags_pred_col_gone_from_schema(self, store):
        store.delete_below_mor("t", "v", 3)
        assert store.fsck("t", deep=True)["ok"]
        # simulate manifest corruption: the pred column vanishes from
        # the carrying snapshot's recorded schema — the scan-time
        # filter would silently match nothing (rows resurrect)
        m = store._load_manifest("t")
        snap = m["snapshots"][-1]
        sch = __import__("json").loads(snap["schema"])
        sch["fields"] = [
            f for f in sch["fields"] if f["name"] != "v"
        ]
        snap["schema"] = __import__("json").dumps(sch)
        store._save_manifest("t", m)
        rep = store.fsck("t")
        assert not rep["ok"]
        assert any(
            f["kind"] == "delete_pred_col_missing"
            for f in rep["findings"]
        )
