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


class TestWebdatasetExport:
    @pytest.fixture(scope="class")
    def wds(self, spark, tmp_path_factory):
        from data_quality_check_pipeline_spark.operators.export import (
            export_webdataset_shards,
        )

        rows = [
            (
                f"clip_{i:04d}",
                f"lang_{i % 3}",
                i,
                None if i == 7 else (f"pcm{i}".encode() * 4),
            )
            for i in range(60)
        ]
        df = spark.createDataFrame(
            rows,
            "clip_id string, lang string, n int, bytes binary",
        )
        out = str(tmp_path_factory.mktemp("wds"))
        manifest = export_webdataset_shards(
            df, "clip_id", out, n_shards=4, payload_ext="pcm"
        )
        return df, out, manifest

    def test_membership_order_and_metadata(self, wds):
        import json as _json
        import tarfile

        df, out, manifest = wds
        assert manifest["total_rows"] == 60
        keys = [r["clip_id"] for r in df.select("clip_id").collect()]
        expected = {k: _expected_shard(k, 4) for k in keys}
        got_order: dict = {}
        metas: dict = {}
        payload: dict = {}
        for s in manifest["shards"]:
            with tarfile.open(os.path.join(out, s["path"])) as tar:
                for m in tar:
                    key, ext = m.name.rsplit(".", 1)
                    if ext == "json":
                        got_order.setdefault(s["shard"], []).append(key)
                        metas[key] = _json.load(tar.extractfile(m))
                    else:
                        payload[key] = tar.extractfile(m).read()
        flat = [k for ks in got_order.values() for k in ks]
        assert sorted(flat) == sorted(keys)
        assert {k: s for s, ks in got_order.items() for k in ks} == (
            expected
        )
        # within-shard order is the deterministic shuffle order
        for s, ks in got_order.items():
            assert ks == sorted(ks, key=lambda k: (_expected_order(k), k))
        # metadata roundtrip (rendered JVM-side via to_json) + NULL
        # payload contract: missing member, json still present
        assert metas["clip_0003"] == {"lang": "lang_0", "n": 3}
        assert payload["clip_0003"] == b"pcm3" * 4
        assert metas["clip_0007"] == {"lang": "lang_1", "n": 7}
        assert "clip_0007" not in payload

    def test_verify_detects_tampering(self, wds):
        import shutil as _shutil
        import tarfile

        from data_quality_check_pipeline_spark.operators.export import (
            verify_webdataset,
        )

        _, out, manifest = wds
        assert verify_webdataset(out) == {"ok": True, "mismatches": []}
        # drop the last sample of the first non-empty shard
        victim = next(s for s in manifest["shards"] if s["rows"] > 1)
        path = os.path.join(out, victim["path"])
        backup = path + ".bak"
        _shutil.copy(path, backup)
        try:
            with tarfile.open(path) as tar:
                members = tar.getmembers()
                blobs = [
                    (m, tar.extractfile(m).read()) for m in members[:-2]
                ]
            with tarfile.open(path, "w") as tar:
                import io

                for m, blob in blobs:
                    tar.addfile(m, io.BytesIO(blob))
            res = verify_webdataset(out)
            assert not res["ok"]
            assert {m["shard"] for m in res["mismatches"]} == {
                victim["shard"]
            }
            assert {m["field"] for m in res["mismatches"]} == {
                "rows", "checksum"
            }
        finally:
            os.replace(backup, path)
        assert verify_webdataset(out)["ok"]

    def test_verify_reports_truncated_tar(self, wds):
        import shutil as _shutil

        from data_quality_check_pipeline_spark.operators.export import (
            verify_webdataset,
        )

        _, out, manifest = wds
        victim = next(s for s in manifest["shards"] if s["rows"] > 0)
        path = os.path.join(out, victim["path"])
        backup = path + ".bak"
        _shutil.copy(path, backup)
        try:
            with open(path, "r+b") as f:
                f.truncate(1024)  # garble: mid-member cut
            res = verify_webdataset(out)  # a FINDING, never a crash
            assert not res["ok"]
            fields = {
                m["field"] for m in res["mismatches"]
                if m["shard"] == victim["shard"]
            }
            # depending on where the cut lands, tarfile either raises
            # (reported as 'readable') or clean-EOFs early (fewer
            # samples -> rows/checksum mismatch); both must be findings
            assert fields and fields <= {"rows", "checksum", "readable"}
        finally:
            os.replace(backup, path)
        assert verify_webdataset(out)["ok"]

    def test_reexport_is_byte_identical(self, spark, wds, tmp_path):
        import hashlib

        from data_quality_check_pipeline_spark.operators.export import (
            export_webdataset_shards,
        )

        df, out, manifest = wds

        def _sha(d, name):
            h = hashlib.sha256()
            h.update(open(os.path.join(d, name), "rb").read())
            return h.hexdigest()

        out2 = str(tmp_path / "again")
        m2 = export_webdataset_shards(
            df.repartition(7, "lang"),  # adversarial input layout
            "clip_id", out2, n_shards=4, payload_ext="pcm",
        )
        assert m2["shards"] == manifest["shards"]
        for s in manifest["shards"]:
            if s["path"]:
                assert _sha(out, s["path"]) == _sha(out2, s["path"])

    def test_null_key_refused(self, spark, tmp_path):
        from data_quality_check_pipeline_spark.operators.export import (
            export_webdataset_shards,
        )

        df = spark.createDataFrame(
            [("a", b"x"), (None, b"y")],
            "clip_id string, bytes binary",
        )
        with pytest.raises(Exception, match="NULL clip_id"):
            export_webdataset_shards(
                df, "clip_id", str(tmp_path / "nk"), n_shards=2
            )

    def test_roundtrip_read_webdataset(self, spark, wds):
        from data_quality_check_pipeline_spark.operators.export import (
            read_webdataset,
        )

        df, out, manifest = wds
        assert manifest["schema_ddl"] == (
            "clip_id string, lang string, n int, bytes binary"
        )
        back = read_webdataset(spark, out)
        assert back.schema == df.schema
        orig = sorted(
            df.collect(), key=lambda r: r["clip_id"]
        )
        got = sorted(back.collect(), key=lambda r: r["clip_id"])
        assert [tuple(r) for r in got] == [
            (r["clip_id"], r["lang"], r["n"],
             bytearray(r["bytes"]) if r["bytes"] is not None else None)
            for r in orig
        ]

    def test_resume_rewrites_only_missing_or_stale(
        self, spark, wds, tmp_path
    ):
        """Crash-resume at shard granularity: after losing the manifest,
        deleting one tar and corrupting another, resume=True rewrites
        exactly those two shards — verified survivors keep their inode
        untouched — and the final manifest equals the original."""
        import shutil as _shutil

        from data_quality_check_pipeline_spark.operators.export import (
            WDS_MANIFEST_NAME,
            export_webdataset_shards,
            verify_webdataset,
        )

        df, orig_out, orig_manifest = wds
        out = str(tmp_path / "resume")
        os.makedirs(out)
        for s in orig_manifest["shards"]:
            _shutil.copy(
                os.path.join(orig_out, s["path"]),
                os.path.join(out, s["path"]),
            )
        nonempty = [s for s in orig_manifest["shards"] if s["rows"] > 0]
        lost, stale, survivor = nonempty[0], nonempty[1], nonempty[2]
        os.remove(os.path.join(out, lost["path"]))
        with open(os.path.join(out, stale["path"]), "r+b") as f:
            f.truncate(777)
        surv_stat = os.stat(os.path.join(out, survivor["path"]))

        mf = export_webdataset_shards(
            df, "clip_id", out, n_shards=4, payload_ext="pcm",
            resume=True,
        )
        assert mf == orig_manifest
        assert os.path.exists(os.path.join(out, WDS_MANIFEST_NAME))
        assert verify_webdataset(out) == {"ok": True, "mismatches": []}
        # the verified survivor was NOT rewritten (same inode + mtime)
        after = os.stat(os.path.join(out, survivor["path"]))
        assert (after.st_ino, after.st_mtime_ns) == (
            surv_stat.st_ino, surv_stat.st_mtime_ns
        )

    def test_overwrite_clears_stale_tars_and_verify_flags_unknown(
        self, spark, wds, tmp_path
    ):
        import shutil as _shutil

        from data_quality_check_pipeline_spark.operators.export import (
            export_webdataset_shards,
            verify_webdataset,
        )

        df, _, _ = wds
        out = str(tmp_path / "ow")
        export_webdataset_shards(
            df, "clip_id", out, n_shards=4, payload_ext="pcm"
        )
        # a foreign copy the manifest doesn't know: verify flags it
        _shutil.copy(
            os.path.join(out, "shard-00000.tar"),
            os.path.join(out, "shard-00099.tar"),
        )
        res = verify_webdataset(out)
        assert not res["ok"]
        assert res["mismatches"] == [{
            "shard": 99, "field": "unknown_tar",
            "manifest": None, "files": "shard-00099.tar",
        }]
        # non-matching names are never touched or reported
        _shutil.copy(
            os.path.join(out, "shard-00000.tar"),
            os.path.join(out, "shard-manual-copy.tar"),
        )
        # a NARROWER re-export (overwrite semantics) removes every
        # stale numeric tar — a trainer's shard-*.tar glob must see
        # only the new export (+ untouched foreign files)
        export_webdataset_shards(
            df, "clip_id", out, n_shards=2, payload_ext="pcm"
        )
        assert sorted(
            p for p in os.listdir(out) if p.endswith(".tar")
        ) == ["shard-00000.tar", "shard-00001.tar",
              "shard-manual-copy.tar"]
        os.remove(os.path.join(out, "shard-manual-copy.tar"))
        assert verify_webdataset(out)["ok"]

    def test_resume_refuses_spec_change(self, spark, wds, tmp_path):
        from data_quality_check_pipeline_spark.operators.export import (
            export_webdataset_shards,
        )

        df, _, _ = wds
        out = str(tmp_path / "spec")
        export_webdataset_shards(
            df, "clip_id", out, n_shards=4, payload_ext="pcm"
        )
        # resuming with a changed structure (different meta set) must
        # refuse loudly — kept tars would carry stale metadata
        with pytest.raises(ValueError, match="different spec"):
            export_webdataset_shards(
                df, "clip_id", out, n_shards=4, payload_ext="pcm",
                meta_cols=("lang",), resume=True,
            )

    def test_nonstring_key_refused(self, spark, tmp_path):
        from data_quality_check_pipeline_spark.operators.export import (
            export_webdataset_shards,
        )

        df = spark.createDataFrame([(1, b"x")], "doc_id long, bytes binary")
        with pytest.raises(TypeError, match="must be a string"):
            export_webdataset_shards(
                df, "doc_id", str(tmp_path / "k"), n_shards=2
            )


class TestProvenance:
    """Manifest provenance (which table snapshot produced the export)
    plus the time-travel re-export contract the CLI's
    ``--export-snapshot`` builds on: exporting AS OF a pre-correction
    snapshot reproduces the pre-correction release bit-for-bit."""

    def test_parquet_manifest_carries_provenance(
        self, spark, docs_df, tmp_path
    ):
        import json

        out = str(tmp_path / "prov")
        prov = {"table": "clips_clean", "snapshot": "abc123"}
        mf = export_training_shards(
            docs_df, "clip_id", out, 4, provenance=prov
        )
        assert mf["provenance"] == prov
        with open(os.path.join(out, "manifest.json")) as f:
            assert json.load(f)["provenance"] == prov
        assert verify_export(spark, out)["ok"]

    def test_wds_manifest_carries_provenance(self, spark, tmp_path):
        import json

        from data_quality_check_pipeline_spark.operators.export import (
            WDS_MANIFEST_NAME,
            export_webdataset_shards,
            verify_webdataset,
        )

        df = spark.createDataFrame(
            [(f"c{i}", b"pcm" * 4) for i in range(20)],
            "clip_id string, bytes binary",
        )
        out = str(tmp_path / "wdsprov")
        prov = {"table": "clips_clean", "snapshot": "deadbeef"}
        mf = export_webdataset_shards(
            df, "clip_id", out, 2, provenance=prov
        )
        assert mf["provenance"] == prov
        with open(os.path.join(out, WDS_MANIFEST_NAME)) as f:
            assert json.load(f)["provenance"] == prov
        assert verify_webdataset(out)["ok"]

    def test_snapshot_reexport_matches_pre_correction_rows(
        self, spark, docs_df, tmp_path
    ):
        from data_quality_check_pipeline_spark.sources.tables import (
            TableStore,
        )

        store = TableStore(spark, str(tmp_path / "store"))
        sid_a = store.write("t", docs_df, cluster_by=["clip_id"])
        # a correction supersedes one row AFTER the release snapshot
        fixed = spark.createDataFrame(
            [("clip_000007", "lang_X", 999)],
            "clip_id string, lang string, n_tokens int",
        )
        store.upsert("t", fixed, "clip_id")

        out_a = str(tmp_path / "rel_a")
        mf_a = export_training_shards(
            store.read("t", snapshot_id=sid_a), "clip_id", out_a, 4,
            token_col="n_tokens",
            provenance={"table": "t", "snapshot": sid_a},
        )
        out_orig = str(tmp_path / "rel_orig")
        mf_orig = export_training_shards(
            docs_df, "clip_id", out_orig, 4, token_col="n_tokens"
        )
        # identical shard checksums/rows/tokens: the time-travel export
        # IS the original release, untouched by the later correction
        assert mf_a["shards"] == mf_orig["shards"]
        assert mf_a["total_tokens"] == mf_orig["total_tokens"]
        # and the current view would differ (the correction landed)
        assert store.read("t").filter(
            F.col("lang") == "lang_X"
        ).count() == 1


class TestEpochShuffle:
    """epoch_shard_order: per-epoch deterministic shard permutation +
    buffer seeds — multi-epoch order diversity without rewriting a byte."""

    @pytest.fixture(scope="class")
    def wds8(self, spark, tmp_path_factory):
        from data_quality_check_pipeline_spark.operators.export import (
            export_webdataset_shards,
        )

        df = spark.createDataFrame(
            [(f"c{i:03d}", i, f"x{i}".encode()) for i in range(48)],
            "clip_id string, n int, bytes binary",
        )
        out = str(tmp_path_factory.mktemp("wds_epoch"))
        manifest = export_webdataset_shards(
            df, "clip_id", out, n_shards=8, payload_ext="pcm"
        )
        return out, manifest

    def test_permutation_reproducible_and_epoch_distinct(self, wds8):
        from data_quality_check_pipeline_spark.operators.export import (
            epoch_shard_order,
        )

        out, manifest = wds8
        orders = {
            e: [s["shard"] for s in epoch_shard_order(out, e)]
            for e in range(4)
        }
        for e, order in orders.items():
            # exact coverage: every shard exactly once per epoch
            assert sorted(order) == list(range(8)), e
            # resume-safe: recomputing the same epoch gives the same plan
            assert order == [
                s["shard"] for s in epoch_shard_order(manifest, e)
            ]
        distinct = {tuple(o) for o in orders.values()}
        assert len(distinct) >= 3, orders

    def test_buffer_seed_distinct_across_epochs_and_domains(self, wds8):
        from data_quality_check_pipeline_spark.operators.export import (
            epoch_shard_order,
        )
        from data_quality_check_pipeline_spark.oracle_hash import (
            Int32, spark_xxhash64,
        )

        out, manifest = wds8
        e0 = epoch_shard_order(out, 0)
        e1 = epoch_shard_order(out, 1)
        s0 = {s["shard"]: s["buffer_seed"] for s in e0}
        s1 = {s["shard"]: s["buffer_seed"] for s in e1}
        assert all(s0[k] != s1[k] for k in s0)
        # domain separation (DESIGN #23): the buffer seed is NOT the
        # permutation hash — equal (shard, seed, epoch) inputs under the
        # two domains must disagree
        seed = int(manifest["seed"])
        for s in e0:
            assert s["buffer_seed"] == spark_xxhash64(
                Int32(s["shard"]), "export_epoch_buffer", seed, 0
            )
            assert s["buffer_seed"] != spark_xxhash64(
                Int32(s["shard"]), "export_epoch", seed, 0
            )

    def test_parquet_manifest_supported(self, spark, docs_df, tmp_path):
        from data_quality_check_pipeline_spark.operators.export import (
            epoch_shard_order,
            export_training_shards,
        )

        out = str(tmp_path / "pq_epoch")
        export_training_shards(docs_df, "clip_id", out, n_shards=4)
        order = [s["shard"] for s in epoch_shard_order(out, 2)]
        assert sorted(order) == [0, 1, 2, 3]

    def test_read_webdataset_visits_shards_in_epoch_order(
        self, spark, wds8
    ):
        import tarfile

        from data_quality_check_pipeline_spark.operators.export import (
            epoch_shard_order,
            read_webdataset,
        )

        out, manifest = wds8
        # expected: concatenation of each tar's stored key order, tars
        # visited in the epoch-1 permutation
        expected = []
        for s in epoch_shard_order(out, 1):
            with tarfile.open(os.path.join(out, s["path"])) as tar:
                for m in tar:
                    key, ext = m.name.rsplit(".", 1)
                    if ext == "json":
                        expected.append(key)
        got = [
            r["clip_id"]
            for r in read_webdataset(spark, out, epoch=1).collect()
        ]
        assert got == expected
        # a different epoch visits in a different order, same multiset
        got0 = [
            r["clip_id"]
            for r in read_webdataset(spark, out, epoch=0).collect()
        ]
        assert got0 != got and sorted(got0) == sorted(got)
