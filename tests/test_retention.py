"""delete_below: predicate (retention) copy-on-write delete.

The three-way file classification is the point: wholly-dead files drop
with ZERO bytes read (the Iceberg metadata-delete fast path — sound
only because the manifest records per-column null counts alongside
min/max), provably-clean files carry by hard link, and only boundary
files are read + rewritten. NULLs always survive (`col < cutoff` is
NULL-false, matching delete_where's key semantics)."""

import datetime
import json
import os

import pytest


@pytest.fixture()
def store(spark, tmp_path):
    from data_quality_check_pipeline_spark.sources.tables import TableStore

    return TableStore(spark, str(tmp_path / "warehouse"))


def _batch(spark, lo, hi, nulls=0):
    rows = [(i, float(i), f"c{i}") for i in range(lo, hi)]
    rows += [(10_000 + j, None, f"n{lo}_{j}") for j in range(nulls)]
    return spark.createDataFrame(rows, "id long, ts double, payload string")


def _ids(df):
    return sorted(r["id"] for r in df.collect())


class TestDeleteBelow:
    def _mk(self, spark, store):
        # three append snapshots with disjoint ts ranges: the age-
        # clustered layout a time-partitioned ingest produces naturally
        store.write("t", _batch(spark, 0, 100).coalesce(1))
        store.write("t", _batch(spark, 100, 200).coalesce(1), mode="append")
        store.write("t", _batch(spark, 200, 300).coalesce(1), mode="append")

    def test_drops_dead_files_rewrites_boundary_only(self, spark, store):
        self._mk(spark, store)
        out = store.delete_below("t", "ts", 150.0)
        # snapshot 1 (ts 0..99) is wholly dead: dropped, never read;
        # snapshot 2 (100..199) is the boundary: rewritten;
        # snapshot 3 (200..299) provably clean: untouched dir
        assert out["n_deleted"] == 150
        assert out["files_dropped"] == 1, out
        assert out["files_rewritten"] == 1, out
        assert out["dirs_untouched"] == 1, out
        assert _ids(store.read("t")) == list(range(150, 300))
        # manifest row counts stay exact after the metadata drop
        assert store.row_count("t") == 150
        cur = store.current_snapshot("t")
        assert cur["mode"] == "delete"
        assert cur["properties"]["delete_predicate"] == "ts < 150.0"

    def test_nulls_survive_and_block_the_whole_file_drop(
        self, spark, store
    ):
        # a file whose every non-NULL ts is below the cutoff but which
        # holds NULL rows: min/max alone says "dead" — the null-count
        # guard must force a rewrite so the NULLs survive
        store.write("t", _batch(spark, 0, 50, nulls=5).coalesce(1))
        out = store.delete_below("t", "ts", 100.0)
        assert out["files_dropped"] == 0, out
        assert out["files_rewritten"] == 1, out
        assert out["n_deleted"] == 50
        left = store.read("t").collect()
        assert len(left) == 5
        assert all(r["ts"] is None for r in left)

    def test_noop_commits_nothing(self, spark, store):
        self._mk(spark, store)
        before = store.current_snapshot("t")["id"]
        out = store.delete_below("t", "ts", 0.0)  # nothing is < 0
        assert out["snapshot"] is None
        assert out["n_deleted"] == 0
        assert store.current_snapshot("t")["id"] == before

    def test_everything_dead(self, spark, store):
        self._mk(spark, store)
        out = store.delete_below("t", "ts", 10_000.0)
        assert out["n_deleted"] == 300
        assert out["files_dropped"] == 3, out
        assert store.read("t").count() == 0
        assert store.row_count("t") == 0
        # old snapshots stay time-travelable until expire
        assert store.read("t", snapshot_id=out["snapshot"]).count() == 0

    def test_missing_null_counts_degrade_to_rewrite(self, spark, store):
        # manifests written before the nulls field existed (or by a
        # writer whose footers lack null_count) must never take the
        # whole-file-drop shortcut — strip the field and assert the
        # delete still lands with identical surviving rows
        self._mk(spark, store)
        mp = store._manifest_path("t")
        m = json.load(open(mp))
        for s in m["snapshots"]:
            for f in s.get("files") or []:
                f.pop("nulls", None)
        json.dump(m, open(mp, "w"))
        out = store.delete_below("t", "ts", 150.0)
        assert out["files_dropped"] == 0, out
        assert out["n_deleted"] == 150
        assert _ids(store.read("t")) == list(range(150, 300))

    def test_incremental_consumers_honestly_refuse(self, spark, store):
        from data_quality_check_pipeline_spark.sources.tables import (
            IncrementalReadError,
        )

        store.write("t", _batch(spark, 0, 100).coalesce(1))
        anchor = store.current_snapshot("t")["id"]
        store.write("t", _batch(spark, 100, 200).coalesce(1), mode="append")
        store.delete_below("t", "ts", 50.0)
        with pytest.raises(IncrementalReadError):
            store.read_incremental("t", anchor)

    def test_timestamp_column(self, spark, store):
        base = datetime.datetime(2026, 1, 1)
        rows = [
            (i, base + datetime.timedelta(days=i)) for i in range(10)
        ]
        df = spark.createDataFrame(rows, "id long, ingest_ts timestamp")
        store.write("t", df.coalesce(1))
        out = store.delete_below(
            "t", "ingest_ts", base + datetime.timedelta(days=4)
        )
        assert out["n_deleted"] == 4
        assert _ids(store.read("t")) == list(range(4, 10))

    def test_carry_links_not_copies(self, spark, store):
        # within one snapshot dir: per-file classification (not per
        # dir) — the clean file hard-links forward
        a = _batch(spark, 0, 50).coalesce(1)
        b = _batch(spark, 200, 250).coalesce(1)
        store.write("t", a.unionByName(b).repartitionByRange(2, "ts"))
        out = store.delete_below("t", "ts", 100.0)
        assert out["files_carried"] >= 1, out
        assert out["n_deleted"] == 50
        # the carried file shares an inode with its source (zero copy)
        root = store._dir("t")
        by_ino: dict = {}
        for r, _d, files in os.walk(root):
            for f in files:
                if f.endswith(".parquet"):
                    ino = os.stat(os.path.join(r, f)).st_ino
                    by_ino.setdefault(ino, []).append(os.path.join(r, f))
        assert any(len(v) > 1 for v in by_ino.values()), (
            "expected at least one hard-linked carried file"
        )
