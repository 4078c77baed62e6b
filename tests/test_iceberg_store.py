"""IcebergStore generates its maintenance surface as SQL strings against
a real Iceberg catalog that this sandbox cannot run (no
iceberg-spark-runtime jar) — so pin the GENERATED SQL with a recording
fake session, the same fake-dependency pattern as the Airflow DAG spec
and GE-adapter tests. These tests exist because the shim claims surface
parity with TableStore ("swap stores without touching callers"): the
strings it emits ARE its behavior."""

from __future__ import annotations

import re

import pytest


class _Result:
    def __init__(self, rows):
        self._rows = rows

    def collect(self):
        return self._rows


class _Row(dict):
    def __getitem__(self, k):
        if isinstance(k, int):
            return list(self.values())[k]
        return super().__getitem__(k)


class _FakeCatalog:
    def __init__(self):
        self.dropped = []

    def dropTempView(self, name):
        self.dropped.append(name)
        return True


class _FakeSpark:
    """Records every spark.sql() string; canned answers by pattern."""

    def __init__(self, answers=None):
        self.sqls: list[str] = []
        self.answers = answers or {}
        self.catalog = _FakeCatalog()

    def sql(self, q):
        self.sqls.append(q)
        for pat, rows in self.answers.items():
            if re.search(pat, q):
                return _Result(rows)
        return _Result([])


class _FakeDF:
    def __init__(self):
        self.views = []

    def createOrReplaceTempView(self, name):
        self.views.append(name)


@pytest.fixture()
def store():
    from data_quality_check_pipeline_spark.sources.tables import (
        IcebergStore,
    )

    spark = _FakeSpark(
        answers={
            r"SUM\(file_size_in_bytes\)": [_Row(b=64 * 1024 * 1024)],
        }
    )
    return IcebergStore(spark, "cat", "db"), spark


class TestIcebergCompact:
    def test_sort_order_is_one_unquoted_column_list(self, store):
        s, spark = store
        s.compact("t", cluster_by=["clip_id", "ts"])
        call = [q for q in spark.sqls if "rewrite_data_files" in q][-1]
        # the sort_order argument is ONE SQL string literal holding a
        # comma-separated column list — per-column quotes would nest
        # inside the literal and break the CALL's parse
        assert "sort_order => 'clip_id, ts'" in call
        assert "''" not in call
        assert "strategy => 'sort'" in call

    def test_target_files_maps_to_file_size_bytes(self, store):
        s, spark = store
        s.compact("t", target_files=8)
        call = [q for q in spark.sqls if "rewrite_data_files" in q][-1]
        # 64 MiB table / 8 target files = 8 MiB per file
        assert "'target-file-size-bytes', '8388608'" in call

    def test_bloom_cols_set_table_properties(self, store):
        s, spark = store
        s.compact("t", bloom_cols=["clip_id"])
        props = [q for q in spark.sqls if "TBLPROPERTIES" in q]
        assert len(props) == 1
        assert (
            "write.parquet.bloom-filter-enabled.column.clip_id" in props[0]
        )

    def test_plain_compact_has_no_options(self, store):
        s, spark = store
        s.compact("t")
        call = [q for q in spark.sqls if "rewrite_data_files" in q][-1]
        assert call.endswith("(table => 'cat.db.t')")


class TestIcebergUpsert:
    def test_view_is_unique_and_dropped(self, store):
        s, spark = store
        df = _FakeDF()
        s.upsert("t", df, "clip_id")
        (view,) = df.views
        # uuid-suffixed: a fixed name lets a concurrent upsert on the
        # same session swap the MERGE source mid-flight
        assert view.startswith("_upsert_src_") and len(view) > len(
            "_upsert_src_"
        )
        merge = [q for q in spark.sqls if q.startswith("MERGE INTO")][-1]
        assert f"USING {view} s" in merge
        assert "ON t.clip_id = s.clip_id" in merge
        assert spark.catalog.dropped == [view]

    def test_view_dropped_even_when_merge_fails(self, store):
        s, spark = store
        df = _FakeDF()
        boom = RuntimeError("no catalog")
        orig = spark.sql

        def failing(q):
            if q.startswith("MERGE INTO"):
                raise boom
            return orig(q)

        spark.sql = failing
        with pytest.raises(RuntimeError):
            s.upsert("t", df, "clip_id")
        assert spark.catalog.dropped == df.views

    def test_two_upserts_use_distinct_views(self, store):
        s, _ = store
        d1, d2 = _FakeDF(), _FakeDF()
        s.upsert("a", d1, "k")
        s.upsert("b", d2, "k")
        assert d1.views[0] != d2.views[0]


class TestIcebergDeleteTags:
    def test_delete_where_quotes_string_keys(self, store):
        s, spark = store
        s.delete_where("t", "clip_id", ["a'b", "c"])
        call = [q for q in spark.sqls if q.startswith("DELETE")][-1]
        assert "IN ('a''b', 'c')" in call

    def test_delete_where_pins_cow_after_prior_mor(self, store):
        """write.delete.mode is a sticky table property: a prior
        delete_keys_mor left merge-on-read set, which would silently
        turn the documented COW delete into a MOR one."""
        s, spark = store
        s.delete_keys_mor("t", "clip_id", ["a"])
        s.delete_where("t", "clip_id", ["b"])
        alter = [q for q in spark.sqls if q.startswith("ALTER")][-1]
        assert "'write.delete.mode'='copy-on-write'" in alter
        delete = [q for q in spark.sqls if q.startswith("DELETE")][-1]
        assert spark.sqls.index(alter) < spark.sqls.index(delete)

    def test_delete_below_pins_cow_after_prior_mor(self, store):
        s, spark = store
        s.delete_below_mor("t", "snr_db", 10.0)
        s.delete_below("t", "snr_db", 20.0)
        alter = [q for q in spark.sqls if q.startswith("ALTER")][-1]
        assert "'write.delete.mode'='copy-on-write'" in alter
        delete = [q for q in spark.sqls if q.startswith("DELETE")][-1]
        assert "WHERE snr_db < 20.0" in delete
        assert spark.sqls.index(alter) < spark.sqls.index(delete)

    def test_tag_untag_roundtrip_sql(self, store):
        s, spark = store
        s.tag("t", "v1.0", snapshot_id=42)
        s.untag("t", "v1.0")
        assert "CREATE TAG `v1.0` AS OF VERSION 42" in spark.sqls[-2]
        assert "DROP TAG `v1.0`" in spark.sqls[-1]


class TestIcebergMorDeletes:
    def test_delete_keys_mor_flips_mode_then_deletes(self, store):
        s, spark = store
        s.delete_keys_mor("t", "clip_id", ["a'b", "c"])
        alter = [q for q in spark.sqls if q.startswith("ALTER")][-1]
        assert "'write.delete.mode'='merge-on-read'" in alter
        assert "'format-version'='2'" in alter
        delete = [q for q in spark.sqls if q.startswith("DELETE")][-1]
        assert "IN ('a''b', 'c')" in delete
        # ordering: mode flip BEFORE the delete, else it rewrites COW
        assert spark.sqls.index(alter) < spark.sqls.index(delete)

    def test_delete_below_mor_flips_mode_then_deletes(self, store):
        s, spark = store
        s.delete_below_mor("t", "snr_db", 36.0)
        alter = [q for q in spark.sqls if q.startswith("ALTER")][-1]
        assert "'write.delete.mode'='merge-on-read'" in alter
        delete = [q for q in spark.sqls if q.startswith("DELETE")][-1]
        assert "WHERE snr_db < 36.0" in delete
        assert spark.sqls.index(alter) < spark.sqls.index(delete)

    def test_delete_below_mor_quotes_string_cutoff(self, store):
        s, spark = store
        s.delete_below_mor("t", "day", "2026-01-01")
        delete = [q for q in spark.sqls if q.startswith("DELETE")][-1]
        assert "WHERE day < '2026-01-01'" in delete
