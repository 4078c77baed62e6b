"""TableStore.fsck: physical integrity audit.

Reads list DIRECTORIES (manifest stats only prune), so a lost file
silently loses rows and an alien parquet file silently adds them —
fsck is the read-only check that catches both, plus footer/row-count
drift (deep), sidecar health and dangling refs, before a publish or
export trusts the table."""

import gzip
import json
import os

import pytest


@pytest.fixture()
def store(spark, tmp_path):
    from data_quality_check_pipeline_spark.sources.tables import TableStore

    return TableStore(spark, str(tmp_path / "warehouse"))


def _mk(spark, store, bloom=False):
    df = spark.createDataFrame(
        [(i, f"c{i}") for i in range(40)], "id long, payload string"
    )
    store.write(
        "t", df.coalesce(2), bloom_cols=["id"] if bloom else None
    )
    store.write(
        "t",
        spark.createDataFrame([(100, "x")], "id long, payload string"),
        mode="append",
    )
    return store


def _data_files(store, name):
    out = []
    for root, _d, files in os.walk(store._dir(name)):
        for f in files:
            if f.endswith(".parquet"):
                out.append(os.path.join(root, f))
    return sorted(out)


class TestFsck:
    def test_healthy_table_is_ok(self, spark, store):
        _mk(spark, store, bloom=True)
        res = store.fsck("t", deep=True)
        assert res["ok"], res["findings"]
        assert res["findings"] == []
        assert res["files_checked"] >= 3
        assert res["dirs_checked"] == 2

    def test_missing_file_detected(self, spark, store):
        _mk(spark, store)
        os.remove(_data_files(store, "t")[0])
        res = store.fsck("t")
        assert not res["ok"]
        assert any(
            f["kind"] == "missing_file" and f["level"] == "error"
            for f in res["findings"]
        )

    def test_unlisted_file_detected(self, spark, store):
        _mk(spark, store)
        # an alien parquet dropped into a snapshot dir WOULD be read
        # as table data — that is exactly what fsck must flag
        src = _data_files(store, "t")[0]
        alien = os.path.join(os.path.dirname(src), "part-alien.parquet")
        with open(src, "rb") as a, open(alien, "wb") as b:
            b.write(a.read())
        res = store.fsck("t")
        assert not res["ok"]
        assert any(
            f["kind"] == "unlisted_file" and f["path"] == "part-alien.parquet"
            for f in res["findings"]
        )

    def test_deep_catches_replaced_file(self, spark, store):
        _mk(spark, store)
        files = _data_files(store, "t")
        # replace a 20-row file with a valid 1-row parquet: same name,
        # readable footer, wrong rows — only the deep footer pass sees it
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(pa.table({"id": [1], "payload": ["z"]}), files[0])
        assert store.fsck("t")["ok"]  # shallow: file exists, non-empty
        res = store.fsck("t", deep=True)
        assert not res["ok"]
        assert any(
            f["kind"] == "row_count_mismatch" for f in res["findings"]
        )

    def test_deep_catches_truncated_file(self, spark, store):
        _mk(spark, store)
        f = _data_files(store, "t")[0]
        with open(f, "r+b") as fh:
            fh.truncate(os.path.getsize(f) // 2)
        res = store.fsck("t", deep=True)
        assert not res["ok"]
        assert any(f["kind"] == "corrupt_file" for f in res["findings"])

    def test_dangling_tag_detected(self, spark, store):
        _mk(spark, store)
        store.tag("t", "rel-1")
        mp = store._manifest_path("t")
        m = json.load(open(mp))
        m["tags"]["rel-1"] = "feedfacedeadbeef"
        json.dump(m, open(mp, "w"))
        res = store.fsck("t")
        assert not res["ok"]
        assert any(f["kind"] == "dangling_tag" for f in res["findings"])

    def test_sidecar_degradation_warns_but_stays_ok(self, spark, store):
        from data_quality_check_pipeline_spark.sources import blooms

        _mk(spark, store, bloom=True)
        # corrupt the sidecar: blooms degrade to may-contain (never a
        # wrong answer), so fsck warns without failing the table
        sc = None
        for s in store.snapshots("t"):
            p = os.path.join(
                store._dir("t"), f"snap_{s['id']}", blooms.SIDECAR_NAME
            )
            if os.path.exists(p):
                sc = p
                break
        assert sc is not None
        with gzip.open(sc, "wt") as fh:
            fh.write("{not json")
        res = store.fsck("t")
        assert res["ok"]
        assert any(
            f["kind"] == "unreadable_sidecar" and f["level"] == "warn"
            for f in res["findings"]
        )

    def test_cow_and_carry_stay_clean(self, spark, store):
        # the COW maintenance ops must leave a table fsck passes:
        # carried hard links, dropped files, rewritten boundaries
        store.write(
            "t",
            spark.createDataFrame(
                [(i, float(i)) for i in range(100)], "id long, ts double"
            ).repartitionByRange(4, "ts"),
        )
        store.delete_below("t", "ts", 30.0)
        store.delete_where("t", "id", [55, 56])
        store.compact("t")
        res = store.fsck("t", deep=True)
        assert res["ok"], res["findings"]
