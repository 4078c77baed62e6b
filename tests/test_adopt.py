"""Zero-copy adoption of existing parquet into TableStore
(``adopt_files`` — the Iceberg ``add_files`` analogue).

Contract: no data copied (shared inodes), footer-derived stats make
pruning work immediately, hive partition layout survives, replays are
idempotent per unchanged source, and downstream maintenance (COW
delete, expire) treats adopted files like written ones — except that
expiring a snapshot only drops this table's LINKS, never the source.
"""

import glob
import os

import pytest
from pyspark.sql import functions as F

from data_quality_check_pipeline_spark.sources.tables import TableStore

N = 800


def _src(spark, tmp_path, name="src"):
    p = str(tmp_path / name)
    (
        spark.range(0, N)
        .select(
            F.format_string("clip_%04d", F.col("id")).alias("clip_id"),
            (F.col("id") % 4).cast("long").alias("shard"),
            F.col("id").cast("long").alias("v"),
        )
        .repartitionByRange(8, "v")
        .sortWithinPartitions("v")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(p)
    )
    return p


def _inodes(dirpath):
    return {
        os.stat(f).st_ino
        for f in glob.glob(
            os.path.join(dirpath, "**", "*.parquet"), recursive=True
        )
    }


class TestAdoptFiles:
    def test_zero_copy_with_working_pruning(self, spark, tmp_path):
        src = _src(spark, tmp_path)
        store = TableStore(spark, str(tmp_path / "ts"))
        sid = store.adopt_files("t", src)
        snap = store.current_snapshot("t")
        assert snap["id"] == sid
        assert snap["partition_by"] == ["shard"]
        assert snap["properties"]["adopted_from"] == src
        out = store.read("t")
        assert out.count() == N
        assert {r["shard"] for r in out.select("shard").distinct()
                .collect()} == {0, 1, 2, 3}
        # zero copy: every adopted file is the SAME inode as the source
        src_inodes = _inodes(src)
        snap_inodes = _inodes(
            os.path.join(store.root, "t", f"snap_{sid}")
        )
        assert snap_inodes == src_inodes
        # footer stats landed -> range pruning selective immediately
        scan = {}
        n = (
            store.read(
                "t",
                prune=[("v", ">=", 100), ("v", "<", 150)],
                scan_stats=scan,
            )
            .filter((F.col("v") >= 100) & (F.col("v") < 150))
            .count()
        )
        assert n == 50
        assert scan["files_skipped"] > scan["files_kept"]
        # manifest-metadata COUNT(*) agrees without touching data
        assert store.row_count("t") == N

    def test_idempotent_replay_and_source_change(self, spark, tmp_path):
        src = _src(spark, tmp_path)
        store = TableStore(spark, str(tmp_path / "ts"))
        sid1 = store.adopt_files("t", src)
        sid2 = store.adopt_files("t", src)  # unchanged source: no-op
        assert sid1 == sid2
        assert store.read("t").count() == N
        assert len(store.snapshots("t")) == 1
        # a CHANGED source is a new adoption (fingerprint covers the
        # file listing + sizes + mtimes)
        extra = str(tmp_path / "src2")
        spark.createDataFrame(
            [("clip_9999", 0, 9999)], ["clip_id", "shard", "v"]
        ).write.mode("overwrite").parquet(extra)
        sid3 = store.adopt_files("t", extra)
        assert sid3 != sid1
        assert store.read("t").count() == N + 1

    def test_append_onto_written_table(self, spark, tmp_path):
        store = TableStore(spark, str(tmp_path / "ts"))
        store.write(
            "t",
            spark.createDataFrame(
                [("clip_a", 0, -1)], ["clip_id", "shard", "v"]
            ),
        )
        src = _src(spark, tmp_path)
        store.adopt_files("t", src)
        assert store.read("t").count() == N + 1

    def test_cow_maintenance_on_adopted_files(self, spark, tmp_path):
        src = _src(spark, tmp_path)
        store = TableStore(spark, str(tmp_path / "ts"))
        store.adopt_files("t", src)
        res = store.delete_where("t", "clip_id", ["clip_0010"])
        assert res["n_deleted"] == 1
        assert res["files_carried"] > 0  # clean adopted files carried
        assert store.read("t").count() == N - 1
        # the COW rewrite never mutates the SOURCE: full source intact
        assert (
            spark.read.parquet(src)
            .filter(F.col("clip_id") == "clip_0010")
            .count()
            == 1
        )

    def test_expire_drops_links_not_source(self, spark, tmp_path):
        src = _src(spark, tmp_path)
        store = TableStore(spark, str(tmp_path / "ts"))
        sid = store.adopt_files("t", src)
        store.write(
            "t",
            spark.createDataFrame(
                [("clip_b", 0, -2)], ["clip_id", "shard", "v"]
            ),
            mode="overwrite",
        )
        store.expire_snapshots("t", keep_last=1, orphan_grace_s=0)
        assert not os.path.exists(
            os.path.join(store.root, "t", f"snap_{sid}")
        )
        assert spark.read.parquet(src).count() == N  # source untouched

    def test_empty_source_refused(self, spark, tmp_path):
        empty = tmp_path / "empty"
        empty.mkdir()
        store = TableStore(spark, str(tmp_path / "ts"))
        with pytest.raises(FileNotFoundError, match="no parquet"):
            store.adopt_files("t", str(empty))
