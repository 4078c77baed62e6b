"""Training-shard export (operators/export.py): deterministic shuffle,
one ordered file per shard, pure-Python hash parity, decision-kind
independence (DESIGN #23), and manifest-based integrity verification."""

import glob
import os
import shutil

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from data_quality_check_pipeline_spark.operators.export import (
    export_training_shards,
    verify_export,
    with_export_shard,
)
from data_quality_check_pipeline_spark.operators.sampling import (
    with_split,
)
from data_quality_check_pipeline_spark.oracle_hash import spark_xxhash64


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (f"clip_{i:06d}", f"lang_{i % 5}", (i * 37) % 400 + 1)
        for i in range(2000)
    ]
    return spark.createDataFrame(
        rows, "clip_id string, lang string, n_tokens int"
    )


def _expected_shard(key: str, n: int, seed: int = 0) -> int:
    return spark_xxhash64(key, "export_shard", seed) % n


def _expected_order(key: str, seed: int = 0) -> int:
    return spark_xxhash64(key, "export_order", seed)


class TestShardAssignment:
    def test_matches_pure_python_and_partition_invariant(
        self, spark, docs_df
    ):
        got = {
            r["clip_id"]: r["shard"]
            for r in with_export_shard(docs_df, "clip_id", 8).collect()
        }
        assert got == {
            k: _expected_shard(k, 8) for k in got
        }
        got2 = {
            r["clip_id"]: r["shard"]
            for r in with_export_shard(
                docs_df.repartition(13, "lang"), "clip_id", 8
            ).collect()
        }
        assert got == got2
        # roughly uniform shard sizes
        from collections import Counter

        sizes = Counter(got.values())
        assert len(sizes) == 8
        # ~Binomial(2000, 1/8): mean 250, sd ~15 — stay within ~4 sd
        assert all(abs(n - 250) < 60 for n in sizes.values()), sizes

    def test_shard_independent_of_split_at_equal_seed(
        self, spark, docs_df
    ):
        """DESIGN #23 pin: shard assignment is a new hash-decision kind
        — at the SAME seed as with_split, the joint distribution must
        stay a product (no shard starved of any split)."""
        df = with_export_shard(
            with_split(
                docs_df, "clip_id",
                {"train": 0.8, "val": 0.1, "test": 0.1}, seed=0,
            ),
            "clip_id", 4, seed=0,
        )
        joint = {
            (r["shard"], r["split"]): r["n"]
            for r in df.groupBy("shard", "split")
            .agg(F.count(F.lit(1)).alias("n")).collect()
        }
        for s in range(4):
            tot = sum(joint.get((s, sp), 0)
                      for sp in ("train", "val", "test"))
            assert joint.get((s, "val"), 0) > 0
            assert joint.get((s, "test"), 0) > 0
            assert abs(joint[(s, "train")] / tot - 0.8) < 0.08

    def test_errors(self, spark, docs_df):
        with pytest.raises(ValueError, match="n_shards"):
            with_export_shard(docs_df, "clip_id", 0)


class TestExport:
    @pytest.fixture()
    def exported(self, spark, docs_df, tmp_path):
        out = str(tmp_path / "export")
        mf = export_training_shards(
            docs_df, "clip_id", out, 8, token_col="n_tokens"
        )
        return out, mf

    def test_manifest_and_files(self, spark, docs_df, exported):
        out, mf = exported
        assert mf["total_rows"] == 2000
        assert mf["total_tokens"] == (
            docs_df.agg(F.sum("n_tokens")).collect()[0][0]
        )
        assert sorted(s["shard"] for s in mf["shards"]) == list(range(8))
        # one file per shard, each INTERNALLY ordered by the
        # independent order hash — the global shuffle trainers stream
        for s in mf["shards"]:
            files = glob.glob(os.path.join(out, s["path"], "*.parquet"))
            assert len(files) == 1, s
            keys = pq.read_table(files[0]).column("clip_id").to_pylist()
            assert len(keys) == s["rows"]
            assert all(
                _expected_shard(k, 8) == s["shard"] for k in keys
            )
            assert keys == sorted(
                keys, key=lambda k: (_expected_order(k), k)
            )
        assert verify_export(spark, out)["ok"]

    def test_reexport_is_bit_identical(self, spark, docs_df, exported):
        out, mf = exported
        out2 = out + "_again"
        mf2 = export_training_shards(
            docs_df.repartition(7), "clip_id", out2, 8,
            token_col="n_tokens",
        )
        assert mf == mf2
        for k in range(8):
            a = pq.read_table(
                glob.glob(os.path.join(out, f"shard={k}", "*.parquet"))[0]
            ).column("clip_id").to_pylist()
            b = pq.read_table(
                glob.glob(os.path.join(out2, f"shard={k}", "*.parquet"))[0]
            ).column("clip_id").to_pylist()
            assert a == b

    def test_verify_catches_corruption(self, spark, docs_df, exported):
        out, mf = exported
        # a lost shard directory
        shutil.rmtree(os.path.join(out, "shard=3"))
        res = verify_export(spark, out)
        assert not res["ok"]
        assert any(
            m["shard"] == 3 and m["field"] == "rows"
            for m in res["mismatches"]
        )

    def test_empty_shards_and_null_keys(self, spark, tmp_path):
        df = spark.createDataFrame(
            [("a", 1), ("b", 2)], "clip_id string, n_tokens int"
        )
        out = str(tmp_path / "tiny")
        mf = export_training_shards(df, "clip_id", out, 16)
        assert mf["total_rows"] == 2
        assert sum(1 for s in mf["shards"] if s["rows"] == 0) == 14
        assert verify_export(spark, out)["ok"]
        bad = spark.createDataFrame(
            [(None, 1)], "clip_id string, n_tokens int"
        )
        with pytest.raises(ValueError, match="NULL"):
            export_training_shards(bad, "clip_id", out, 4)
