"""Schema evolution: metadata-only column rename + drop in TableStore.

Contract: rename rewrites NO data (old dirs keep their written names;
reads map at scan time, retroactively like Iceberg), prune/bloom probes
translate back to the written names per dir, post-rename appends land
natively, file-level COW refuses until one compact() normalizes the
files, and the mapping survives snapshot GC (it lives in the
manifest-level rename log, not the rename snapshot entry).
"""

import glob
import os

import pytest
from pyspark.sql import functions as F

from data_quality_check_pipeline_spark.sources.tables import TableStore


def _df(spark, lo, hi, col="v"):
    return spark.range(lo, hi).select(
        F.format_string("clip_%04d", F.col("id")).alias("clip_id"),
        F.col("id").cast("long").alias(col),
    )


@pytest.fixture()
def store(spark, tmp_path):
    s = TableStore(spark, str(tmp_path / "ts"))
    s.write("t", _df(spark, 0, 800), cluster_by=["v"], target_files=8)
    return s


def _mtime_inodes(store):
    return {
        p: os.stat(p).st_ino
        for p in glob.glob(
            os.path.join(store.root, "t", "**", "*.parquet"),
            recursive=True,
        )
    }


class TestRename:
    def test_metadata_only_read_mapping(self, spark, store):
        before = _mtime_inodes(store)
        sid = store.rename_column("t", "v", "value")
        assert _mtime_inodes(store) == before  # zero data moved
        out = store.read("t")
        assert "value" in out.columns and "v" not in out.columns
        got = {r["clip_id"]: r["value"] for r in out.collect()}
        assert got["clip_0013"] == 13 and len(got) == 800
        snap = store.current_snapshot("t")
        assert snap["id"] == sid and snap["mode"] == "rename"
        assert snap["cluster_by"] == ["value"]  # spec follows the name
        # retroactive semantics: time travel shows the new name too
        old_sid = snap["parent"]
        assert "value" in store.read("t", snapshot_id=old_sid).columns

    def test_prune_translates_to_written_names(self, spark, store):
        store.rename_column("t", "v", "value")
        scan = {}
        n = (
            store.read(
                "t",
                prune=[("value", ">=", 100), ("value", "<", 150)],
                scan_stats=scan,
            )
            .filter((F.col("value") >= 100) & (F.col("value") < 150))
            .count()
        )
        assert n == 50
        # stats are keyed 'v' in the pre-rename files; translation
        # keeps the clustered layout selective
        assert scan["files_skipped"] >= 6

    def test_append_after_rename_unions_both_eras(self, spark, store):
        store.rename_column("t", "v", "value")
        store.write(
            "t", _df(spark, 800, 900, col="value"), mode="append"
        )
        out = store.read("t")
        assert out.count() == 900
        assert out.filter(F.col("value").isNull()).count() == 0
        assert store.row_count("t") == 900

    def test_chained_renames(self, spark, store):
        store.rename_column("t", "v", "v2")
        store.write("t", _df(spark, 800, 850, col="v2"), mode="append")
        store.rename_column("t", "v2", "v3")
        out = store.read("t")
        assert out.columns == ["clip_id", "v3"]
        assert out.count() == 850
        assert out.filter(F.col("v3").isNull()).count() == 0

    def test_cow_refuses_then_compact_unblocks(self, spark, store):
        store.rename_column("t", "v", "value")
        with pytest.raises(RuntimeError, match="rename/drop\\) is pending"):
            store.delete_where("t", "clip_id", ["clip_0010"])
        with pytest.raises(RuntimeError, match="rename/drop\\) is pending"):
            store.upsert(
                "t",
                spark.createDataFrame(
                    [("clip_0010", 5)], ["clip_id", "value"]
                ),
                "clip_id",
            )
        with pytest.raises(RuntimeError, match="rename/drop\\) is pending"):
            store.backfill_blooms("t", ["clip_id"])
        sid = store.compact("t", target_files=8)
        assert sid is not None
        res = store.delete_where("t", "clip_id", ["clip_0010"])
        assert res["n_deleted"] == 1
        out = store.read("t")
        assert out.count() == 799
        assert "value" in out.columns

    def test_mapping_survives_snapshot_gc(self, spark, store):
        store.rename_column("t", "v", "value")
        for k in range(3):
            store.write(
                "t", _df(spark, 800 + k, 801 + k, col="value"),
                mode="append",
            )
        # expire everything but the newest — including the rename ENTRY
        store.expire_snapshots("t", keep_last=1, orphan_grace_s=0)
        modes = {s["mode"] for s in store.snapshots("t")}
        assert "rename" not in modes  # the entry is gone...
        out = store.read("t")  # ...but the mapping is not
        assert "value" in out.columns and "v" not in out.columns
        assert out.filter(F.col("value").isNull()).count() == 0

    def test_guards(self, spark, tmp_path):
        store = TableStore(spark, str(tmp_path / "tg"))
        store.write(
            "t",
            spark.createDataFrame(
                [("a", 1, "en")], ["clip_id", "v", "lang"]
            ),
            partition_by=["lang"],
        )
        with pytest.raises(KeyError, match="no column"):
            store.rename_column("t", "nope", "x")
        with pytest.raises(ValueError, match="already exists"):
            store.rename_column("t", "v", "clip_id")
        with pytest.raises(ValueError, match="partition column"):
            store.rename_column("t", "lang", "language")
        staged = TableStore(
            spark, str(tmp_path / "tg"), default_branch="b"
        )
        with pytest.raises(RuntimeError, match="mainline-only"):
            staged.rename_column("t", "v", "x")

    def test_drop_column_metadata_only(self, spark, store):
        before = _mtime_inodes(store)
        store.drop_column("t", "v")
        assert _mtime_inodes(store) == before  # bytes stay (NOT erasure)
        out = store.read("t")
        assert out.columns == ["clip_id"]
        assert out.count() == 800
        snap = store.current_snapshot("t")
        assert snap["mode"] == "drop_column"
        assert snap["cluster_by"] == []  # spec drops the column too

    def test_drop_then_readd_is_a_new_column(self, spark, store):
        """Pre-drop dirs must contribute NULL for a re-added same-name
        column — never their stored old bytes — and their old stats
        must not answer prune probes for the new column."""
        store.drop_column("t", "v")
        store.write(
            "t",
            spark.createDataFrame(
                [("clip_9000", 7)], ["clip_id", "v"]
            ),
            mode="append",
        )
        out = store.read("t")
        assert out.count() == 801
        assert out.filter(F.col("v").isNotNull()).count() == 1
        assert (
            out.filter(F.col("clip_id") == "clip_0013")
            .collect()[0]["v"] is None
        )
        # prune on the NEW v: old dirs keep conservatively (their 'v'
        # stats are the retired column's), the row still arrives
        scan = {}
        n = (
            store.read("t", prune=[("v", "=", 7)], scan_stats=scan)
            .filter(F.col("v") == 7)
            .count()
        )
        assert n == 1

    def test_drop_erasure_two_step(self, spark, store):
        """drop_column + compact + expire = physical erasure of the
        retired column's bytes (the takedown-hard contract shape)."""
        import pyarrow.parquet as pq

        store.drop_column("t", "v")
        store.compact("t", target_files=4)
        store.expire_snapshots("t", keep_last=1, orphan_grace_s=0)
        files = glob.glob(
            os.path.join(store.root, "t", "**", "*.parquet"),
            recursive=True,
        )
        assert files
        for f in files:
            assert "v" not in pq.ParquetFile(f).schema_arrow.names
        assert store.read("t").count() == 800

    def test_drop_guards(self, spark, tmp_path):
        store = TableStore(spark, str(tmp_path / "tdg"))
        store.write(
            "t",
            spark.createDataFrame(
                [("a", 1, "en")], ["clip_id", "v", "lang"]
            ),
            partition_by=["lang"],
        )
        with pytest.raises(KeyError, match="no column"):
            store.drop_column("t", "nope")
        with pytest.raises(ValueError, match="partition column"):
            store.drop_column("t", "lang")
        store.drop_column("t", "v")
        with pytest.raises(RuntimeError, match="rename/drop\\) is pending"):
            store.delete_where("t", "clip_id", ["a"])

    def test_rename_then_drop_chain(self, spark, store):
        store.rename_column("t", "v", "value")
        store.drop_column("t", "value")
        out = store.read("t")
        assert out.columns == ["clip_id"]
        assert out.count() == 800

    def test_bloom_probe_translates(self, spark, tmp_path):
        store = TableStore(spark, str(tmp_path / "tb"))
        store.write(
            "t", _df(spark, 0, 800), bloom_cols=["clip_id"],
            target_files=8,
        )
        store.rename_column("t", "clip_id", "cid")
        scan = {}
        n = (
            store.read(
                "t", prune=[("cid", "=", "clip_0700")], scan_stats=scan
            )
            .filter(F.col("cid") == "clip_0700")
            .count()
        )
        assert n == 1
        # hash-sharded layout: min/max spans everything, only the bloom
        # (keyed 'clip_id' in the sidecar) can skip — translation works
        assert scan["files_skipped"] > 0
