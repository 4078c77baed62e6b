"""Pre-release QA gate tests: the composite verdict over the clean
table, the data-contract suite, cross-table consistency, split leakage
and profile drift (release.py). Each underlying operator has its own
deep tests — these pin the composition: which checks run, how failures
surface, and that an asked-for gate never silently passes."""

import pytest
from pyspark.sql import functions as F

from data_quality_check_pipeline_spark.pipeline import (
    CLEAN_TABLE,
    RunConfig,
    run_pipeline,
)
from data_quality_check_pipeline_spark.release import release_check
from data_quality_check_pipeline_spark.sources.tables import TableStore


class TestReleaseCheck:
    def test_green_release_all_checks_pass(
        self, spark, corpus, out_root
    ):
        """A healthy split+profiled run passes every check, including
        the opt-in leakage gate (synthetic transcripts are distinct)
        and the drift check auto-derived from the profile history."""
        _, _, path = corpus
        run_pipeline(
            spark, path,
            RunConfig(
                out_root=out_root, run_id="rel1", n_shards=2,
                source_fingerprint="frel",
                split_fractions={"train": 0.8, "val": 0.1, "test": 0.1},
                profile_cols=["lang", "codec"],
                profile_numeric={"snr_db": (0.0, 60.0, 20)},
            ),
        )
        v = release_check(spark, out_root, leakage_jaccard=0.8)
        assert v["ok"], v
        c = v["checks"]
        assert set(c) == {
            "clean_table", "expectations", "quarantine_consistency",
            "split_leakage", "profile_drift",
        }
        assert c["clean_table"]["rows"] > 0
        assert c["expectations"]["failed"] == []
        assert c["quarantine_consistency"]["clean_and_quarantined"] == 0
        assert c["split_leakage"]["leaking"] == 0
        # 2 shards profiled -> drift had something to compare, quietly
        assert c["profile_drift"]["batches"] == 2
        assert c["profile_drift"]["findings"] == []

    def test_missing_out_root_and_no_split_gate(self, spark, tmp_path):
        """No clean table = immediate failure; asking for the leakage
        gate against an unsplit table FAILS the check rather than
        silently passing."""
        v = release_check(spark, str(tmp_path / "nowhere"))
        assert not v["ok"]
        assert v["checks"]["clean_table"] == {
            "ok": False, "reason": "missing"
        }

    def test_leakage_gate_requires_split_column(
        self, spark, corpus, out_root
    ):
        _, _, path = corpus
        run_pipeline(
            spark, path,
            RunConfig(out_root=out_root, run_id="rel2",
                      module_reports=False),
        )
        v = release_check(spark, out_root, leakage_jaccard=0.8)
        assert not v["ok"]
        assert v["checks"]["split_leakage"] == {
            "ok": False, "reason": "no split column"
        }
        # without the opt-in gate the same table releases fine
        assert release_check(spark, out_root)["ok"]

    def test_unpacked_backlog_fails_until_repacked(
        self, spark, corpus, out_root
    ):
        """On a packed table, a NULL-pack_run backlog (what corrections
        leave behind) fails pack_completeness with the repack hint;
        --repack-tokens restores a green release. An unpacked table
        never grows the check."""
        from data_quality_check_pipeline_spark.corrections import (
            PACK_COLS,
        )
        from data_quality_check_pipeline_spark.repack import (
            repack_unpacked,
        )

        _, _, path = corpus
        run_pipeline(
            spark, path,
            RunConfig(out_root=out_root, run_id="rel4",
                      module_reports=False, pack_budget=200),
        )
        v = release_check(spark, out_root)
        assert v["ok"]
        assert v["checks"]["pack_completeness"] == {
            "ok": True, "unpacked": 0
        }
        store = TableStore(spark, out_root)
        clean = store.read(CLEAN_TABLE)
        types = dict(clean.dtypes)
        rows = clean.orderBy("clip_id").limit(2)
        for c in PACK_COLS:
            rows = rows.withColumn(c, F.lit(None).cast(types[c]))
        store.upsert(CLEAN_TABLE, rows, "clip_id")
        v = release_check(spark, out_root)
        assert not v["ok"]
        pc = v["checks"]["pack_completeness"]
        assert pc["unpacked"] == 2 and "repack" in pc["hint"]
        repack_unpacked(spark, out_root, budget=200)
        assert release_check(spark, out_root)["ok"]

    def test_contract_violations_fail_the_release(
        self, spark, corpus, out_root
    ):
        """Plant the two classes of corruption the gate exists for: a
        clean row that violates the data contract (NULL clip_id +
        duplicate id), and a clip present in BOTH clean and active
        quarantine. The verdict names the failing checks."""
        _, _, path = corpus
        run_pipeline(
            spark, path,
            RunConfig(out_root=out_root, run_id="rel3",
                      module_reports=False),
        )
        store = TableStore(spark, out_root)
        clean = store.read(CLEAN_TABLE)
        good = clean.limit(1)
        # a contract-violating row: NULL id (not_be_null + be_unique
        # stay rate-based, so ALSO duplicate an existing id)
        bad = good.withColumn("clip_id", F.lit(None).cast("string"))
        dup = good  # re-appending an existing row duplicates its id
        quarantined_id = good.select("clip_id").first()["clip_id"]
        store.write(
            CLEAN_TABLE, bad.unionByName(dup), mode="append",
            partition_by=["lang"],
        )
        # the same clip also shows up as actively quarantined
        from data_quality_check_pipeline_spark.pipeline import (
            QUARANTINE_TABLE,
        )

        qrow = spark.createDataFrame(
            [(quarantined_id, ["planted"], "HIGH", "test", "r", 0)],
            "clip_id string, reasons array<string>, severity string, "
            "stage string, run_id string, retry_count int",
        ).withColumn("ts", F.current_timestamp())
        store.write(QUARANTINE_TABLE, qrow, mode="append")
        v = release_check(spark, out_root)
        assert not v["ok"]
        c = v["checks"]
        failed_exp = set(c["expectations"]["failed"])
        assert any(n.startswith("be_unique") for n in failed_exp)
        assert c["quarantine_consistency"]["clean_and_quarantined"] == 1


class TestPendingMorAdvisory:
    def test_pending_mor_deletes_advisory(self, spark, corpus, out_root):
        """Pending merge-on-read deletes never FAIL the gate (reads
        are delete-applied) but surface as an advisory with the
        compact hint; the materializing compact clears it."""
        _, _, path = corpus
        run_pipeline(
            spark, path,
            RunConfig(out_root=out_root, run_id="rmor",
                      n_shards=1, source_fingerprint="fmor"),
        )
        store = TableStore(spark, out_root)
        cid = store.read(CLEAN_TABLE).orderBy("clip_id").first()[
            "clip_id"
        ]
        store.delete_keys_mor(CLEAN_TABLE, "clip_id", [cid])
        v = release_check(spark, out_root)
        assert v["ok"], v
        adv = v["checks"]["pending_mor_deletes"]
        assert adv["ok"] and adv["pending"] == 1
        assert "compact" in adv["hint"]
        store.compact(CLEAN_TABLE)
        v2 = release_check(spark, out_root)
        assert v2["ok"]
        assert "pending_mor_deletes" not in v2["checks"]
