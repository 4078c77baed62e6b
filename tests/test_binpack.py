"""TableStore.binpack: incremental small-file compaction.

compact() rewrites the whole view; binpack merges ONLY the files under
a size threshold and hard-links everything else forward — the routine
maintenance op whose cost is proportional to the small-file bytes, not
the table. Rows are preserved exactly; the read_set still collapses to
one dir (the other half of the small-file tax)."""

import os

import pytest


@pytest.fixture()
def store(spark, tmp_path):
    from data_quality_check_pipeline_spark.sources.tables import TableStore

    return TableStore(spark, str(tmp_path / "warehouse"))


def _rows(spark, lo, hi, pay=40):
    return spark.createDataFrame(
        [(i, "x" * pay + str(i)) for i in range(lo, hi)],
        "id long, payload string",
    )


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def _file_sizes(store, name):
    out = {}
    for root, _d, files in os.walk(store._dir(name)):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out[p] = (os.path.getsize(p), os.stat(p).st_ino)
    return out


THRESH = 10_000  # bytes: the big fixture file lands well above this


class TestBinpack:
    def _mk(self, spark, store):
        # one big file + three KB-scale appends (the streaming-
        # micro-batch shape that accretes small files at 100 TB)
        store.write("t", _rows(spark, 0, 30_000).coalesce(1))
        for lo in (30_000, 30_010, 30_020):
            store.write(
                "t", _rows(spark, lo, lo + 10).coalesce(1), mode="append"
            )

    def test_merges_smalls_links_bigs(self, spark, store):
        self._mk(spark, store)
        big_inode = next(
            ino for _p, (sz, ino) in _file_sizes(store, "t").items()
            if sz >= THRESH
        )
        before = _ids(store.read("t"))
        out = store.binpack("t", small_file_bytes=THRESH)
        assert out["snapshot"] is not None
        assert out["files_merged"] == 3
        assert out["files_carried"] == 1
        assert out["dirs_absorbed"] == 4
        # rows preserved exactly; the view is now ONE dir
        assert _ids(store.read("t")) == before
        assert store.row_count("t") == 30_030
        cur = store.current_snapshot("t")
        assert cur["mode"] == "binpack"
        assert cur["read_set"] == [f"snap_{cur['id']}"]
        # the big file carried by hard link: same inode in the new dir
        new_dir = os.path.join(store._dir("t"), f"snap_{cur['id']}")
        new_inodes = {
            ino for p, (_sz, ino) in _file_sizes(store, "t").items()
            if p.startswith(new_dir)
        }
        assert big_inode in new_inodes
        # merged output: fewer files than went in (3 smalls -> 1)
        n_new = sum(
            1 for p in _file_sizes(store, "t") if p.startswith(new_dir)
        )
        assert n_new == 2, n_new  # 1 merged + 1 carried
        # physical integrity holds (manifest lists exactly these files)
        assert store.fsck("t", deep=True)["ok"]

    def test_noop_below_two_smalls(self, spark, store):
        store.write("t", _rows(spark, 0, 30_000).coalesce(1))
        store.write("t", _rows(spark, 30_000, 30_010).coalesce(1),
                    mode="append")
        before = store.current_snapshot("t")["id"]
        out = store.binpack("t", small_file_bytes=THRESH)
        assert out["snapshot"] is None
        assert store.current_snapshot("t")["id"] == before

    def test_sticky_cluster_spec_survives_binpack(self, spark, store):
        # binpack records no cluster spec (merged files are unsorted)
        # but must not RESET stickiness: the next plain compact() still
        # finds the layout through the binpack snapshot
        store.write("t", _rows(spark, 0, 30_000).coalesce(1))
        store.compact("t", cluster_by=["id"])
        for lo in (40_000, 40_010, 40_020):
            store.write(
                "t", _rows(spark, lo, lo + 10).coalesce(1), mode="append"
            )
        out = store.binpack("t", small_file_bytes=THRESH)
        assert out["snapshot"] is not None
        assert store.current_snapshot("t").get("cluster_by", []) == []
        # one more append so the plain compact() actually runs (a
        # single-dir view is its no-op case) — the sticky walk must
        # cross the binpack snapshot to the cluster-compact's spec
        store.write(
            "t", _rows(spark, 60_000, 60_010).coalesce(1), mode="append"
        )
        store.compact("t")
        assert store.current_snapshot("t")["cluster_by"] == ["id"]

    def test_incremental_consumers_refuse_across(self, spark, store):
        from data_quality_check_pipeline_spark.sources.tables import (
            IncrementalReadError,
        )

        self._mk(spark, store)
        anchor = store.snapshots("t")[0]["id"]
        store.binpack("t", small_file_bytes=THRESH)
        with pytest.raises(IncrementalReadError):
            store.read_incremental("t", anchor)

    def test_bloom_sidecars_inherit_and_fsck_clean(self, spark, store):
        store.write(
            "t", _rows(spark, 0, 30_000).coalesce(1), bloom_cols=["id"]
        )
        for lo in (30_000, 30_010, 30_020):
            store.write(
                "t", _rows(spark, lo, lo + 10).coalesce(1), mode="append"
            )
        out = store.binpack("t", small_file_bytes=THRESH)
        assert out["snapshot"] is not None
        res = store.fsck("t", deep=True)
        assert res["ok"], res["findings"]
        assert res["findings"] == []  # sidecar covers carried + merged
        # point-id prune still engages through the inherited blooms
        stats = {}
        got = store.read("t", prune=[("id", "=", 30_005)], scan_stats=stats)
        assert got.filter("id = 30005").count() == 1
        assert stats["files_skipped"] >= 1, stats

    def test_partitioned_table_binpack(self, spark, store):
        df = spark.createDataFrame(
            [(i, "en" if i % 2 else "de", "x" * 40) for i in range(20_000)],
            "id long, lang string, payload string",
        )
        store.write("t", df.coalesce(1), partition_by=["lang"])
        for lo in (50_000, 50_010):
            store.write(
                "t",
                spark.createDataFrame(
                    [(i, "en", "y") for i in range(lo, lo + 10)],
                    "id long, lang string, payload string",
                ).coalesce(1),
                mode="append",
                partition_by=["lang"],
            )
        out = store.binpack("t", small_file_bytes=THRESH)
        assert out["snapshot"] is not None
        got = store.read("t")
        assert got.count() == 20_020
        # partition values survive for merged AND carried rows
        assert got.filter("lang = 'de'").count() == 10_000
        assert got.filter("id >= 50000 and lang = 'en'").count() == 20
        assert store.fsck("t", deep=True)["ok"]
