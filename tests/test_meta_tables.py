"""Metadata tables (TableStore.read_meta — the Iceberg tbl.snapshots /
tbl.files / tbl.refs / tbl.history analogue): the table's bookkeeping
as DataFrames, driver-side metadata only, so operational questions
answer with SQL."""

import json

import pytest
from pyspark.sql import functions as F

from data_quality_check_pipeline_spark.sources.tables import TableStore


@pytest.fixture()
def store(spark, tmp_path):
    s = TableStore(spark, str(tmp_path / "ts"))
    df = spark.range(0, 200).select(
        F.format_string("c%03d", F.col("id")).alias("clip_id"),
        F.col("id").alias("v"),
    )
    s.write("t", df, cluster_by=["v"], target_files=4)
    s.write(
        "t",
        spark.createDataFrame([("x1", 999)], ["clip_id", "v"]),
        mode="append",
        properties={"run_id": "r9"},
    )
    return s


class TestMetaTables:
    def test_snapshots(self, spark, store):
        snaps = store.read_meta("t", "snapshots")
        rows = {r["snapshot_id"]: r for r in snaps.collect()}
        assert len(rows) == 2
        cur = store.current_snapshot("t")
        r = rows[cur["id"]]
        assert r["mode"] == "append" and r["n_dirs"] == 2
        assert json.loads(r["properties"])["run_id"] == "r9"
        # manifest-derived row counts match the data
        assert (
            snaps.agg(F.sum("n_rows")).collect()[0][0]
            == store.read("t").count()
        )

    def test_files_is_the_skipping_surface(self, spark, store):
        files = store.read_meta("t", "files").collect()
        assert len(files) >= 5  # >=4 clustered + 1 append
        assert sum(f["rows"] for f in files) == 201
        # per-file stats JSON carries the clustered v ranges
        vs = [
            json.loads(f["stats"]).get("v")
            for f in files
            if json.loads(f["stats"]).get("v")
        ]
        # every NON-EMPTY file has v stats (an empty range partition
        # may land a rows=0 file with none)
        assert len(vs) == sum(1 for f in files if f["rows"])
        # disjoint ranges on the clustered files
        spans = sorted((lo, hi) for lo, hi in vs if hi <= 200)
        assert len(spans) >= 4
        assert all(
            spans[i][1] <= spans[i + 1][0]
            for i in range(len(spans) - 1)
        )

    def test_refs_and_history(self, spark, store):
        store.tag("t", "rel-1")
        staged = TableStore(spark, store.root, default_branch="b")
        staged.write(
            "t",
            spark.createDataFrame([("x2", 1)], ["clip_id", "v"]),
            mode="append",
        )
        refs = {
            (r["name"], r["type"]): r["snapshot_id"]
            for r in store.read_meta("t", "refs").collect()
        }
        assert refs[("rel-1", "tag")] == store.current_snapshot("t")["id"]
        assert ("b", "branch") in refs
        hist = store.read_meta("t", "history").collect()
        assert len(hist) == 2 and all(r["live"] for r in hist)
        assert hist[0]["snapshot_id"] == store.current_snapshot("t")["id"]
        # the branch handle's history walks from the branch head
        bh = staged.read_meta("t", "history").collect()
        assert len(bh) == 3
        assert bh[0]["snapshot_id"] == refs[("b", "branch")]

    def test_unknown_kind(self, spark, store):
        with pytest.raises(ValueError, match="unknown kind"):
            store.read_meta("t", "nope")
