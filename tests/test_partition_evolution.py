"""Partition-spec evolution: append snapshots may change partition_by
without rewriting earlier data — the Iceberg partition-evolution
contract. Each snapshot dir is its own partition-discovery root (an old
unpartitioned file stores lang IN the file; a new hive-partitioned file
recovers it from the path), so the union is value-correct across specs,
manifest min/max pruning keeps skipping per-file regardless of which
spec produced the file, and compact() normalizes the whole table onto
one spec when the mixture gets expensive."""

import pytest


@pytest.fixture()
def store(spark, tmp_path):
    from data_quality_check_pipeline_spark.sources.tables import TableStore

    return TableStore(spark, str(tmp_path / "warehouse"))


def _rows(df):
    return sorted((r["id"], r["lang"], r["v"]) for r in df.collect())


class TestPartitionEvolution:
    def test_mixed_specs_read_value_correct(self, spark, store):
        df1 = spark.createDataFrame(
            [(1, "en", 1.0), (2, "de", 2.0)], "id long, lang string, v double"
        )
        store.write("t", df1)  # snapshot 1: unpartitioned
        df2 = spark.createDataFrame(
            [(3, "en", 3.0), (4, "fr", 4.0)], "id long, lang string, v double"
        )
        # snapshot 2: the table evolves to hive-partitioning by lang —
        # snapshot 1's files are NOT rewritten
        store.write("t", df2, mode="append", partition_by=["lang"])
        assert _rows(store.read("t")) == [
            (1, "en", 1.0), (2, "de", 2.0), (3, "en", 3.0), (4, "fr", 4.0),
        ]

    def test_pruning_spans_both_specs(self, spark, store):
        store.write(
            "t",
            spark.createDataFrame(
                [(1, "en", 1.0), (2, "de", 2.0)],
                "id long, lang string, v double",
            ),
        )
        store.write(
            "t",
            spark.createDataFrame(
                [(3, "en", 3.0), (4, "fr", 4.0)],
                "id long, lang string, v double",
            ),
            mode="append",
            partition_by=["lang"],
        )
        stats = {}
        out = store.read("t", prune=[("lang", "=", "fr")], scan_stats=stats)
        # value-correct AND the prune actually skipped files from BOTH
        # spec generations (old files via footer min/max, new files via
        # the exact hive-path stats)
        assert _rows(out.filter("lang = 'fr'")) == [(4, "fr", 4.0)]
        assert stats["files_skipped"] >= 2, stats
        assert stats["files_unknown"] == 0, stats

    def test_compact_normalizes_onto_requested_spec(self, spark, store):
        store.write(
            "t",
            spark.createDataFrame(
                [(1, "en", 1.0), (2, "de", 2.0)],
                "id long, lang string, v double",
            ),
        )
        store.write(
            "t",
            spark.createDataFrame(
                [(3, "en", 3.0), (4, "fr", 4.0)],
                "id long, lang string, v double",
            ),
            mode="append",
            partition_by=["lang"],
        )
        sid = store.compact("t", partition_by=["lang"])
        assert sid is not None
        cur = store.current_snapshot("t")
        assert cur["partition_by"] == ["lang"]
        assert _rows(store.read("t")) == [
            (1, "en", 1.0), (2, "de", 2.0), (3, "en", 3.0), (4, "fr", 4.0),
        ]
        # post-compact the whole table is one spec: an equality prune on
        # the partition column reads exactly the matching partitions
        stats = {}
        store.read("t", prune=[("lang", "=", "de")], scan_stats=stats)
        assert stats["files_kept"] == 1, stats

    def test_files_meta_records_per_snapshot_spec(self, spark, store):
        store.write(
            "t",
            spark.createDataFrame([(1, "en", 1.0)],
                                  "id long, lang string, v double"),
        )
        store.write(
            "t",
            spark.createDataFrame([(2, "fr", 2.0)],
                                  "id long, lang string, v double"),
            mode="append",
            partition_by=["lang"],
        )
        snaps = store.snapshots("t")
        specs = [s.get("partition_by") or [] for s in snaps]
        assert specs == [[], ["lang"]]
