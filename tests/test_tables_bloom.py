"""Per-file key-membership bloom sidecars (sources/blooms.py).

The contract under test, in order of load-bearing-ness:

1. BIT-FOR-BIT parity between the Spark-side distributed bloom build
   and a pure-Python re-derivation from the raw file values via the
   committed ``oracle_hash.spark_xxhash64`` — every other guarantee
   (no false negatives, driver-side membership tests) reduces to this.
2. NO FALSE NEGATIVES end-to-end: a pruned read / bounded COW rewrite
   never loses a row that exists.
3. The scale claim: on an UNCLUSTERED (hash-sharded) layout — where
   min/max stats span the key domain and range pruning keeps every
   file — a small takedown/correction batch rewrites only the
   bloom-positive files and hard-links the rest forward (DESIGN.md
   #41-42's documented degeneration, now bounded).
4. Conservative degradation everywhere uncertain: missing sidecar,
   unsupported column type, type-mismatched predicate values.
"""

import base64
import os

import pytest
from pyspark.sql import functions as F

from data_quality_check_pipeline_spark.oracle_hash import (
    Int32,
    spark_xxhash64,
)
from data_quality_check_pipeline_spark.sources import blooms
from data_quality_check_pipeline_spark.sources.tables import TableStore

N = 20_000
N_FILES = 16


def _clip(i: int) -> str:
    return f"clip_{i:07d}"


@pytest.fixture(scope="module")
def bloom_store(spark, tmp_path_factory):
    """A hash-sharded (UNclustered) 16-file table with blooms on
    clip_id: every file's [min, max] spans the whole id domain, so any
    pruning observed below is the bloom's doing, not min/max."""
    root = str(tmp_path_factory.mktemp("bloomts"))
    ts = TableStore(spark, root)
    df = (
        spark.range(N)
        .select(
            F.format_string("clip_%07d", F.col("id")).alias("clip_id"),
            (F.col("id") * 7).alias("score"),
        )
        .repartition(N_FILES, F.xxhash64("clip_id"))
    )
    sid = ts.write("t", df, bloom_cols=["clip_id"])
    return ts, root, sid


class TestBuildParity:
    def test_sidecar_bitmap_matches_pure_python(self, bloom_store):
        """Recompute every file's bloom from its raw parquet values with
        the pure-Python spark-parity xxhash64; the bitmaps must be
        byte-identical to what the distributed build recorded."""
        import pyarrow.parquet as pq

        ts, root, sid = bloom_store
        data_dir = os.path.join(root, "t", f"snap_{sid}")
        sc = blooms.load_sidecar(data_dir)
        assert sc is not None and set(sc) == {"clip_id"}
        assert len(sc["clip_id"]) == N_FILES
        total_rows = 0
        for rel, entry in sc["clip_id"].items():
            vals = pq.read_table(
                os.path.join(data_dir, rel), columns=["clip_id"]
            )["clip_id"].to_pylist()
            total_rows += len(vals)
            m, k = entry["m"], entry["k"]
            assert entry["t"] == "str"
            bits = 0
            for v in vals:
                for i in range(k):
                    bits |= 1 << (
                        spark_xxhash64(v, blooms.BLOOM_DOMAIN, Int32(i))
                        % m
                    )
            expect = base64.b64encode(
                bits.to_bytes(m // 8, "little")
            ).decode("ascii")
            assert entry["b64"] == expect, f"bitmap mismatch for {rel}"
        assert total_rows == N

    def test_long_column_parity(self, spark, tmp_path):
        ts = TableStore(spark, str(tmp_path / "ts"))
        df = spark.range(500).select(
            (F.col("id") * 1_000_003 - 250).alias("k"),
            F.lit("x").alias("pad"),
        ).coalesce(1)
        sid = ts.write("t", df, bloom_cols=["k"])
        sc = blooms.load_sidecar(
            os.path.join(str(tmp_path / "ts"), "t", f"snap_{sid}")
        )
        (entry,) = sc["k"].values()
        assert entry["t"] == "long"
        tester = blooms.BloomTester([0, 1_000_003 - 250, -250])
        assert tester.any_maybe_present(entry)
        # a value far outside the inserted set: overwhelmingly pruned
        # (fpp ~1%; a flaky-free assertion needs a deterministic miss,
        # so check 50 absent values — all present would be ~1e-100)
        absent = blooms.BloomTester([10**15 + i for i in range(50)])
        per_key = absent._positions(entry["m"], entry["k"], "long")
        bits = int.from_bytes(base64.b64decode(entry["b64"]), "little")
        assert not all(
            all((bits >> p) & 1 for p in probes) for probes in per_key
        )


class TestReadPrune:
    def test_present_keys_prune_most_files_and_lose_nothing(
        self, bloom_store
    ):
        ts, _, _ = bloom_store
        present = [_clip(i) for i in (42, 7_777, 19_999)]
        ss = {}
        got = (
            ts.read("t", prune=[("clip_id", "in", present)], scan_stats=ss)
            .where(F.col("clip_id").isin(present))
            .count()
        )
        assert got == len(present)  # no false negatives
        # 3 keys live in <= 3 files; fpp adds at most a few
        assert ss["files_kept"] <= 6
        assert ss["files_kept"] + ss["files_skipped"] == N_FILES

    def test_inrange_absent_key_prunes(self, bloom_store):
        """A key INSIDE every file's [min, max] (min/max keeps all 16
        files) must still be pruned by the blooms."""
        ts, _, _ = bloom_store
        ss = {}
        out = ts.read(
            "t", prune=[("clip_id", "=", "clip_0010000x")], scan_stats=ss
        )
        assert ss["files_skipped"] >= N_FILES - 2  # fpp slack
        assert (
            out.where(F.col("clip_id") == "clip_0010000x").count() == 0
        )

    def test_every_sampled_key_survives_pruned_read(self, bloom_store):
        """No-false-negative sweep: one pruned read for 200 sampled
        ids must return every one of them."""
        ts, _, _ = bloom_store
        sample = [_clip(i) for i in range(0, N, N // 200)]
        got = (
            ts.read("t", prune=[("clip_id", "in", sample)])
            .where(F.col("clip_id").isin(sample))
            .count()
        )
        assert got == len(sample)

    def test_probe_key_cap_stands_down_conservatively(self):
        """Above MAX_PROBE_KEYS the driver-side membership test would
        be quadratic noise — the tester must answer may-contain even
        where a small batch would get a provable miss (the all-zero
        bitmap)."""
        zero = {"m": 8192, "k": 4, "t": "str", "b64": ""}
        small = blooms.BloomTester(["a"])
        assert not small.any_maybe_present(zero)
        big = blooms.BloomTester(
            [f"k{i}" for i in range(blooms.MAX_PROBE_KEYS + 1)]
        )
        assert big.any_maybe_present(zero)

    def test_type_mismatched_value_is_conservative(self, bloom_store):
        ts, _, _ = bloom_store
        ss = {}
        ts.read("t", prune=[("clip_id", "in", [123])], scan_stats=ss)
        # int predicate on a string column: bloom cannot decide, min/max
        # cannot compare — every file stays (never wrong, just unselective)
        assert ss["files_skipped"] == 0


class TestCowBounds:
    def test_takedown_and_correction_bounded_on_unclustered_layout(
        self, spark, tmp_path
    ):
        ts = TableStore(spark, str(tmp_path / "ts"))
        df = (
            spark.range(N)
            .select(
                F.format_string("clip_%07d", F.col("id")).alias("clip_id"),
                (F.col("id") * 7).alias("score"),
            )
            .repartition(N_FILES, F.xxhash64("clip_id"))
        )
        ts.write("t", df, bloom_cols=["clip_id"])

        # takedown of 3 ids: only the bloom-positive files rewrite
        doomed = [_clip(i) for i in (42, 7_777, 19_999)]
        st = {}
        ts.delete_where("t", "clip_id", doomed, stats_out=st)
        assert st["n_deleted"] == 3
        assert st["files_rewritten"] <= 6  # 3 + fpp slack, not 16
        assert st["files_carried"] >= N_FILES - 6
        left = ts.read("t")
        assert left.count() == N - 3
        assert left.where(F.col("clip_id").isin(doomed)).count() == 0

        # carried files keep their blooms (inode inheritance): a SECOND
        # takedown is still bounded, including within carried files
        st2 = {}
        ts.delete_where("t", "clip_id", [_clip(1)], stats_out=st2)
        assert st2["n_deleted"] == 1
        assert st2["files_rewritten"] <= 2
        assert ts.read("t").count() == N - 4

        # correction upsert: bounded rewrite, merged row lands
        up = spark.createDataFrame(
            [(_clip(2), -1), ("clip_new_row", -2)],
            "clip_id string, score long",
        )
        st3 = {}
        ts.upsert("t", up, "clip_id", stats_out=st3)
        assert st3["n_updated"] == 1 and st3["n_inserted"] == 1
        assert st3["files_rewritten"] <= 2
        final = ts.read("t")
        assert final.count() == N - 4 + 1
        assert final.where(F.col("clip_id") == _clip(2)).first()[
            "score"
        ] == -1

    def test_sidecar_covers_every_file_after_cow(self, bloom_store):
        """After the module fixture's table goes through a delete, the
        new snapshot dir's sidecar must cover ALL its parquet files
        (fresh ones computed, carried ones inherited)."""
        ts, root, _ = bloom_store
        st = {}
        ts.delete_where("t", "clip_id", [_clip(5)], stats_out=st)
        assert st["n_deleted"] == 1
        snap = ts.current_snapshot("t")
        assert snap["bloom_cols"] == ["clip_id"]
        data_dir = os.path.join(root, "t", f"snap_{snap['id']}")
        sc = blooms.load_sidecar(data_dir)
        rels = {f["path"] for f in snap["files"]}
        assert set(sc["clip_id"]) >= rels
        # and the table still answers correctly after the COW
        assert ts.read("t").where(
            F.col("clip_id") == _clip(5)
        ).count() == 0


class TestSpecLifecycle:
    def test_append_inherits_blooms(self, spark, tmp_path):
        ts = TableStore(spark, str(tmp_path / "ts"))
        mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
            F.format_string("c%05d", F.col("id")).alias("clip_id"),
            F.col("id").alias("v"),
        )
        ts.write("t", mk(0, 1000), bloom_cols=["clip_id"])
        ts.write("t", mk(1000, 2000), mode="append")
        snap = ts.current_snapshot("t")
        assert snap["bloom_cols"] == ["clip_id"]
        for d in snap["read_set"]:
            sc = blooms.load_sidecar(
                os.path.join(str(tmp_path / "ts"), "t", d)
            )
            assert sc and "clip_id" in sc
        ss = {}
        got = ts.read(
            "t", prune=[("clip_id", "=", "c01500")], scan_stats=ss
        ).where(F.col("clip_id") == "c01500").count()
        assert got == 1

    def test_compact_can_add_blooms_to_bloomless_table(
        self, spark, tmp_path
    ):
        ts = TableStore(spark, str(tmp_path / "ts"))
        df = spark.range(2000).select(
            F.format_string("c%05d", F.col("id")).alias("clip_id"),
            F.col("id").alias("v"),
        ).repartition(4, F.xxhash64("clip_id"))
        ts.write("t", df)  # no blooms
        sid = ts.compact("t", bloom_cols=["clip_id"])
        assert sid is not None  # bloom request rewrites a single-dir table
        snap = ts.current_snapshot("t")
        assert snap["bloom_cols"] == ["clip_id"]
        st = {}
        ts.delete_where("t", "clip_id", ["c00042"], stats_out=st)
        assert st["n_deleted"] == 1
        assert st["files_carried"] > 0  # bounded despite unclustered

    def test_backfill_adds_blooms_without_rewriting_or_committing(
        self, spark, tmp_path
    ):
        """The 100-TB shape: blooms land on an existing append-chain
        table as in-place derived metadata — no data rewrite, no new
        snapshot, incremental anchors untouched — and immediately
        bound reads and COW."""
        ts = TableStore(spark, str(tmp_path / "ts"))
        mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
            F.format_string("c%05d", F.col("id")).alias("clip_id"),
            F.col("id").alias("v"),
        ).repartition(4, F.xxhash64("clip_id"))
        anchor = ts.write("t", mk(0, 2000))
        ts.write("t", mk(2000, 4000), mode="append")
        before = ts.current_snapshot("t")
        res = ts.backfill_blooms("t", ["clip_id"])
        assert res["dirs_built"] == 2 and res["files_built"] == 8
        after = ts.current_snapshot("t")
        assert after["id"] == before["id"]  # no new snapshot
        assert after["bloom_cols"] == ["clip_id"]
        assert len(ts.snapshots("t")) == 2
        # incremental anchor still valid (nothing was committed)
        assert ts.read_incremental("t", anchor).count() == 2000
        # blooms effective immediately: bounded lookup + takedown
        ss = {}
        got = ts.read(
            "t", prune=[("clip_id", "=", "c03000")], scan_stats=ss
        ).where(F.col("clip_id") == "c03000").count()
        assert got == 1
        assert ss["files_skipped"] >= 5  # of 8, minus fpp slack
        st = {}
        ts.delete_where("t", "clip_id", ["c00042"], stats_out=st)
        assert st["n_deleted"] == 1
        assert st["files_carried"] > 0
        # idempotent: a second backfill builds nothing
        res2 = ts.backfill_blooms("t", ["clip_id"])
        assert res2["files_built"] == 0 and res2["dirs_built"] == 0

    def test_unsupported_column_type_skips_quietly(self, spark, tmp_path):
        ts = TableStore(spark, str(tmp_path / "ts"))
        df = spark.range(100).select(
            F.col("id").cast("double").alias("score"),
            F.lit("x").alias("pad"),
        )
        sid = ts.write("t", df, bloom_cols=["score"])
        sc = blooms.load_sidecar(
            os.path.join(str(tmp_path / "ts"), "t", f"snap_{sid}")
        )
        assert sc is None  # no parity hash for double: no sidecar
        assert ts.read("t").count() == 100  # table fully usable

    def test_all_null_key_file_prunes_and_rows_survive(
        self, spark, tmp_path
    ):
        ts = TableStore(spark, str(tmp_path / "ts"))
        df = spark.createDataFrame(
            [(None, 1), (None, 2)], "clip_id string, v long"
        ).coalesce(1)
        ts.write("t", df, bloom_cols=["clip_id"])
        ss = {}
        ts.read("t", prune=[("clip_id", "=", "anything")], scan_stats=ss)
        assert ss["files_skipped"] == 1  # all-zero bloom: holds no keys
        st = {}
        ts.delete_where("t", "clip_id", ["anything"], stats_out=st)
        assert st["n_deleted"] == 0
        assert ts.read("t").count() == 2  # NULL-key rows always survive
