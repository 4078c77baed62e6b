"""TableStore.upsert — merge-by-key in one atomic snapshot (the
Iceberg MERGE INTO shape under re-deliveries / transcript corrections).

Contracts pinned here: surgical COW (untouched dirs carry forward),
pure-insert degradation to an append snapshot (incremental chain
preserved), honest IncrementalReadError across a real replacement,
NULL/duplicate incoming-key rejection, NULL-key stored rows surviving,
time travel to the pre-merge value, clustering re-applied, schema
widening, and the optimistic-commit abort under a concurrent writer.
"""

from contextlib import contextmanager

import pytest

from data_quality_check_pipeline_spark.sources.tables import (
    IncrementalReadError,
    TableStore,
)


@pytest.fixture()
def store3(spark, tmp_path):
    """Three id-range appends: [0,100) [100,200) [200,300)."""
    store = TableStore(spark, str(tmp_path / "t"))
    for lo in (0, 100, 200):
        df = spark.createDataFrame(
            [(i, f"v{i}") for i in range(lo, lo + 100)],
            "id long, v string",
        )
        store.write(
            "tab", df,
            mode="append" if store.exists("tab") else "overwrite",
        )
    return store


def _rows(store, name="tab"):
    return {
        r["id"]: r["v"] for r in store.read(name).collect()
    }


class TestUpsert:
    def test_replace_and_insert_one_snapshot(self, spark, store3):
        pre = store3.current_snapshot("tab")["id"]
        inc = spark.createDataFrame(
            [(150, "corrected"), (350, "new")], "id long, v string"
        )
        res = store3.upsert("tab", inc, "id")
        assert res["n_updated"] == 1
        assert res["n_inserted"] == 1
        # only the [100,200) dir overlaps id=150; 350 is beyond every
        # file's max but the batch range [150,350] overlaps [200,300)?
        # no — precise key pruning: {150, 350} hits only [100,200)
        assert res["dirs_rewritten"] == 1
        assert res["dirs_untouched"] == 2
        assert res["aborted"] is False
        rows = _rows(store3)
        assert len(rows) == 301
        assert rows[150] == "corrected"
        assert rows[350] == "new"
        assert rows[151] == "v151"
        # exactly one snapshot added; parent = pre-merge current
        cur = store3.current_snapshot("tab")
        assert cur["mode"] == "upsert"
        assert cur["parent"] == pre
        # time travel still sees the pre-merge value
        old = {
            r["id"]: r["v"]
            for r in store3.read("tab", snapshot_id=pre).collect()
        }
        assert old[150] == "v150"
        assert 350 not in old

    def test_pure_insert_degrades_to_append(self, spark, store3):
        anchor = store3.current_snapshot("tab")["id"]
        inc = spark.createDataFrame(
            [(i, f"v{i}") for i in range(400, 410)], "id long, v string"
        )
        res = store3.upsert("tab", inc, "id")
        assert res["n_updated"] == 0
        assert res["n_inserted"] == 10
        assert res["dirs_rewritten"] == 0
        cur = store3.current_snapshot("tab")
        assert cur["mode"] == "append"
        # append-only chain intact: incremental consumers see the delta
        delta = store3.read_incremental("tab", anchor)
        assert sorted(r["id"] for r in delta.collect()) == list(
            range(400, 410)
        )
        assert len(_rows(store3)) == 310

    def test_replacement_breaks_incremental_chain(self, spark, store3):
        anchor = store3.current_snapshot("tab")["id"]
        inc = spark.createDataFrame(
            [(150, "corrected")], "id long, v string"
        )
        store3.upsert("tab", inc, "id")
        with pytest.raises(IncrementalReadError):
            store3.read_incremental("tab", anchor)

    def test_null_and_duplicate_keys_rejected(self, spark, store3):
        with pytest.raises(ValueError, match="NULL"):
            store3.upsert(
                "tab",
                spark.createDataFrame(
                    [(None, "x")], "id long, v string"
                ),
                "id",
            )
        with pytest.raises(ValueError, match="not unique"):
            store3.upsert(
                "tab",
                spark.createDataFrame(
                    [(150, "a"), (150, "b")], "id long, v string"
                ),
                "id",
            )

    def test_null_key_stored_rows_survive(self, spark, tmp_path):
        store = TableStore(spark, str(tmp_path / "t"))
        base = spark.createDataFrame(
            [(1, "a"), (None, "keepme"), (2, "b")], "id long, v string"
        )
        store.write("tab", base)
        inc = spark.createDataFrame([(1, "A")], "id long, v string")
        res = store.upsert("tab", inc, "id")
        assert res["n_updated"] == 1
        rows = store.read("tab").collect()
        assert {r["v"] for r in rows} == {"A", "keepme", "b"}

    def test_empty_incoming_noop(self, spark, store3):
        pre = store3.current_snapshot("tab")["id"]
        inc = spark.createDataFrame([], "id long, v string")
        res = store3.upsert("tab", inc, "id")
        assert res["snapshot"] is None
        assert store3.current_snapshot("tab")["id"] == pre

    def test_absent_table_created(self, spark, tmp_path):
        store = TableStore(spark, str(tmp_path / "t"))
        inc = spark.createDataFrame([(1, "a")], "id long, v string")
        res = store.upsert("tab", inc, "id")
        assert res["n_inserted"] == 1
        assert _rows(store) == {1: "a"}

    def test_clustering_reapplied_keeps_pruning(self, spark, tmp_path):
        store = TableStore(spark, str(tmp_path / "t"))
        df = spark.createDataFrame(
            [(i, f"v{i}") for i in range(1000)], "id long, v string"
        )
        store.write("tab", df, cluster_by=["id"], target_files=8)
        inc = spark.createDataFrame(
            [(500, "corrected")], "id long, v string"
        )
        res = store.upsert("tab", inc, "id")
        assert res["n_updated"] == 1
        cur = store.current_snapshot("tab")
        assert cur["cluster_by"] == ["id"]
        # a point read over the merged table still skips files
        stats = {}
        out = store.read(
            "tab", prune=[("id", "=", 500)], scan_stats=stats
        )
        assert [
            r["v"] for r in out.filter("id = 500").collect()
        ] == ["corrected"]
        assert stats["files_skipped"] > 0

    def test_schema_widening(self, spark, store3):
        inc = spark.createDataFrame(
            [(150, "corrected", 0.9)], "id long, v string, conf double"
        )
        res = store3.upsert("tab", inc, "id")
        assert res["n_updated"] == 1
        out = store3.read("tab")
        assert "conf" in out.columns
        got = {
            r["id"]: r["conf"]
            for r in out.filter("id in (150, 151)").collect()
        }
        assert got[150] == 0.9
        assert got[151] is None

    def test_concurrent_commit_aborts(self, spark, store3):
        """A commit landing between the rewrite and the manifest lock
        must abort (optimistic concurrency, same contract as
        delete_where/compact) — never silently drop the other writer."""
        orig_lock = store3._table_lock
        fired = {"done": False}

        @contextmanager
        def hooked(name, **kw):
            if not fired["done"] and name == "tab":
                fired["done"] = True
                extra = spark.createDataFrame(
                    [(9999, "other")], "id long, v string"
                )
                store3.write("tab", extra, mode="append")
            with orig_lock(name, **kw):
                yield

        store3._table_lock = hooked
        try:
            inc = spark.createDataFrame(
                [(150, "corrected")], "id long, v string"
            )
            res = store3.upsert("tab", inc, "id")
        finally:
            store3._table_lock = orig_lock
        assert res["aborted"] is True
        assert res["snapshot"] is None
        rows = _rows(store3)
        assert rows[150] == "v150"  # replacement did not land
        assert rows[9999] == "other"  # the concurrent append did
        # re-run succeeds
        res2 = store3.upsert(
            "tab",
            spark.createDataFrame(
                [(150, "corrected")], "id long, v string"
            ),
            "id",
        )
        assert res2["aborted"] is False
        assert _rows(store3)[150] == "corrected"
