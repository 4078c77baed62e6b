"""Takedown propagation (takedown.py) + the TableStore.delete_where
primitive under it: surgical COW deletes with dir-level stat pruning,
purge-vs-block signature semantics, terminal markers, idempotency,
and physical erasure under hard expiry."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from data_quality_check_pipeline_spark.pipeline import (
    AUDIO_FP_TABLE,
    CLEAN_TABLE,
    CONTENT_HASH_TABLE,
    QUARANTINE_TABLE,
    RunConfig,
    _find_committed_write,
    active_quarantine,
    run_pipeline,
)
from data_quality_check_pipeline_spark.operators.dedup import (
    content_hash_expr,
)
from data_quality_check_pipeline_spark.sources.tables import (
    IncrementalReadError,
    TableStore,
)
from data_quality_check_pipeline_spark.takedown import (
    TAKEDOWN_REASON,
    apply_takedown,
    takedown_id_for,
)


class TestDeleteWhere:
    @pytest.fixture()
    def store3(self, spark, tmp_path):
        """Three id-clustered appends: [0,100) [100,200) [200,300)."""
        store = TableStore(spark, str(tmp_path / "t"))
        for lo in (0, 100, 200):
            df = spark.createDataFrame(
                [(i, f"v{i}") for i in range(lo, lo + 100)],
                "id long, v string",
            )
            store.write(
                "tab", df,
                mode="append" if store.exists("tab") else "overwrite",
                properties={"batch": lo},
            )
        return store

    def test_surgical_rewrite_prunes_untouched_dirs(self, spark, store3):
        pre = store3.current_snapshot("tab")["id"]
        res = store3.delete_where("tab", "id", [150, 160, 199])
        assert res["n_deleted"] == 3
        # only the [100,200) dir overlaps the keys
        assert res["dirs_rewritten"] == 1
        assert res["dirs_untouched"] == 2
        cur = store3.current_snapshot("tab")
        assert cur["mode"] == "delete" and cur["id"] == res["snapshot"]
        got = {r["id"] for r in store3.read("tab").collect()}
        assert got == set(range(300)) - {150, 160, 199}
        # time travel still sees the pre-delete rows (COW contract)
        assert store3.read("tab", pre).count() == 300
        # incremental consumers honestly fail over the delete
        with pytest.raises(IncrementalReadError, match="non-append"):
            store3.read_incremental("tab", pre)

    def test_absent_keys_commit_nothing(self, spark, store3):
        cur = store3.current_snapshot("tab")["id"]
        # provably absent (outside every dir's min/max): zero IO
        res = store3.delete_where("tab", "id", [5000])
        assert res == {
            "snapshot": None, "n_deleted": 0, "dirs_rewritten": 0,
            "dirs_untouched": 3, "files_rewritten": 0,
            "files_carried": 0, "aborted": False,
        }
        assert store3.current_snapshot("tab")["id"] == cur
        # in-range but nonexistent: dirs overlap, still no commit
        store3.delete_where("tab", "id", [150])
        res2 = store3.delete_where("tab", "id", [150])
        assert res2["n_deleted"] == 0 and res2["snapshot"] is None
        assert res2["dirs_rewritten"] == 1  # stats can't disprove it
        with pytest.raises(ValueError, match="non-NULL"):
            store3.delete_where("tab", "id", [1, None])
        assert store3.delete_where("tab", "id", [])["n_deleted"] == 0

    def test_null_keys_survive_and_replay_guard_holds(
        self, spark, tmp_path
    ):
        store = TableStore(spark, str(tmp_path / "t2"))
        df = spark.createDataFrame(
            [(None, "a"), ("k1", "b"), ("k2", "c")], "id string, v string"
        )
        store.write("tab", df, properties={"marker": "m1"})
        res = store.delete_where("tab", "id", ["k1"])
        assert res["n_deleted"] == 1
        got = {(r["id"], r["v"]) for r in store.read("tab").collect()}
        # the NULL-id row survives (three-valued logic trap)
        assert got == {(None, "a"), ("k2", "c")}
        # the rewritten dir is absorbed: the crash/replay guard still
        # sees the original commit as part of the current view
        assert _find_committed_write(store, "tab", {"marker": "m1"})

    def test_hard_expiry_physically_removes_rows(self, spark, store3):
        store3.delete_where("tab", "id", [150])
        store3.expire_snapshots("tab", keep_last=1, orphan_grace_s=0)
        root = os.path.join(store3.root, "tab")
        files = glob.glob(
            os.path.join(root, "snap_*", "**", "*.parquet"),
            recursive=True,
        )
        assert files
        import duckdb

        n = duckdb.sql(
            f"select count(*) n from read_parquet({files!r}) "
            "where id = 150"
        ).fetchone()[0]
        assert n == 0  # the bytes are gone, not just unreferenced
        assert store3.read("tab").count() == 299


def _write_parquet(pdf, path):
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)


@pytest.fixture(scope="module")
def small_corpus(corpus, tmp_path_factory):
    """~600-clip stride sample (the synthetic corpus front-loads its
    planted defects — a head slice would be all drops, DESIGN #22)."""
    df, _, _ = corpus
    sub = df.iloc[::5].reset_index(drop=True)
    d = tmp_path_factory.mktemp("takedown_corpus")
    path = str(d / "clips.parquet")
    _write_parquet(sub, path)
    return sub, path


class TestTakedownPurge:
    @pytest.fixture()
    def rooted(self, spark, small_corpus, tmp_path):
        _, path = small_corpus
        root = str(tmp_path / "tables")
        cfg = RunConfig(
            out_root=root, run_id="p1", dedup_content=True,
            dedup_audio=True, dedup_audio_max_hamming=0,
        )
        run_pipeline(spark, path, cfg)
        return root

    def _pick_targets(self, spark, root, n=3):
        store = TableStore(spark, root)
        rows = (
            store.read(CLEAN_TABLE)
            .select("clip_id", "transcript",
                    content_hash_expr("transcript").alias("h"))
            .orderBy("clip_id")
            .limit(n)
            .collect()
        )
        return store, rows

    def test_purge_forgets_and_readmits(
        self, spark, small_corpus, rooted, tmp_path
    ):
        pdf, _ = small_corpus
        store, rows = self._pick_targets(spark, rooted)
        ids = [r["clip_id"] for r in rows]
        hashes = {r["h"] for r in rows}
        rep = apply_takedown(spark, rooted, ids, mode="purge")
        assert rep["tables"][CLEAN_TABLE]["n_deleted"] == 3
        assert rep["found_in_clean"] == 3 and rep["not_in_clean"] == 0
        clean = store.read(CLEAN_TABLE)
        assert clean.filter(F.col("clip_id").isin(ids)).count() == 0
        # every per-clip memory is gone
        assert (
            store.read(CONTENT_HASH_TABLE)
            .filter(F.col("text_hash").isin(list(hashes)))
            .count() == 0
        )
        assert (
            store.read(AUDIO_FP_TABLE)
            .filter(F.col("clip_id").isin(ids))
            .count() == 0
        )
        # terminal markers landed
        q = store.read(QUARANTINE_TABLE).filter(
            F.col("clip_id").isin(ids)
        )
        assert (
            q.filter(F.array_contains("reasons", TAKEDOWN_REASON))
            .count() == 3
        )
        # a re-upload of the SAME content under new ids is judged on
        # its own and re-admitted — the corpus genuinely forgot it
        re_pdf = pdf[pdf["clip_id"].isin(ids)].copy()
        re_pdf["clip_id"] = ["re_" + c for c in re_pdf["clip_id"]]
        re_path = str(tmp_path / "reupload.parquet")
        _write_parquet(re_pdf, re_path)
        cfg2 = RunConfig(
            out_root=rooted, run_id="p2", dedup_content=True,
            dedup_audio=True, dedup_audio_max_hamming=0,
        )
        m2 = run_pipeline(spark, re_path, cfg2)
        assert m2["quality"]["kept"] == 3
        # idempotency: the same order is a no-op on re-run
        pre = store.current_snapshot(CLEAN_TABLE)["id"]
        rep2 = apply_takedown(spark, rooted, list(reversed(ids)),
                              mode="purge")
        assert rep2["skipped_already_applied"]
        assert rep2["takedown_id"] == takedown_id_for(ids, "purge")
        assert store.current_snapshot(CLEAN_TABLE)["id"] == pre

    def test_requeue_never_resurrects_takedown(
        self, spark, small_corpus, rooted
    ):
        from data_quality_check_pipeline_spark.pipeline import (
            requeue_quarantine,
        )

        _, path = small_corpus
        store, rows = self._pick_targets(spark, rooted, n=2)
        ids = [r["clip_id"] for r in rows]
        apply_takedown(spark, rooted, ids, mode="purge")
        cfg = RunConfig(
            out_root=rooted, run_id="rq", dedup_content=True,
            dedup_audio=True, dedup_audio_max_hamming=0,
        )
        out = requeue_quarantine(spark, cfg, path, max_retries=3)
        assert (
            store.read(CLEAN_TABLE)
            .filter(F.col("clip_id").isin(ids)).count() == 0
        ), out
        # and the takedown rows stay visible to quarantine consumers
        act = active_quarantine(store.read(QUARANTINE_TABLE))
        assert (
            act.filter(
                F.col("clip_id").isin(ids)
                & F.array_contains("reasons", TAKEDOWN_REASON)
            ).count() == 2
        )

    def test_hard_purge_physically_erases(self, spark, rooted):
        store, rows = self._pick_targets(spark, rooted, n=1)
        cid = rows[0]["clip_id"]
        rep = apply_takedown(
            spark, rooted, [cid], mode="purge", hard=True,
            orphan_grace_s=0,
        )
        assert CLEAN_TABLE in rep["hard_expired"]
        files = glob.glob(
            os.path.join(rooted, CLEAN_TABLE, "snap_*", "**",
                         "*.parquet"),
            recursive=True,
        )
        assert files
        import duckdb

        n = duckdb.sql(
            f"select count(*) n from read_parquet({files!r}, "
            f"union_by_name=true) where clip_id = '{cid}'"
        ).fetchone()[0]
        assert n == 0


class TestTakedownBlock:
    def test_block_registers_hashes_and_blocks_reuploads(
        self, spark, small_corpus, tmp_path
    ):
        """Pipeline ran WITHOUT --dedup-content (no hash history):
        block force-registers the transcript hashes, so a later
        dedup-enabled run quarantines the re-upload terminally."""
        pdf, path = small_corpus
        root = str(tmp_path / "tables")
        run_pipeline(spark, path, RunConfig(out_root=root, run_id="b1"))
        store = TableStore(spark, root)
        rows = (
            store.read(CLEAN_TABLE)
            .select("clip_id", content_hash_expr("transcript").alias("h"))
            .orderBy("clip_id").limit(2).collect()
        )
        ids = [r["clip_id"] for r in rows]
        hashes = [r["h"] for r in rows]
        rep = apply_takedown(spark, root, ids, mode="block")
        assert rep["blocked_hashes_registered"] == 2
        assert rep["unblockable_null_transcript"] == []
        assert store.read(CLEAN_TABLE).filter(
            F.col("clip_id").isin(ids)
        ).count() == 0
        # the signatures STAYED (were created): that's the whole point
        assert store.read(CONTENT_HASH_TABLE).filter(
            F.col("text_hash").isin(hashes)
        ).count() == 2
        re_pdf = pdf[pdf["clip_id"].isin(ids)].copy()
        re_pdf["clip_id"] = ["re_" + c for c in re_pdf["clip_id"]]
        re_path = str(tmp_path / "reupload.parquet")
        _write_parquet(re_pdf, re_path)
        m2 = run_pipeline(
            spark, re_path,
            RunConfig(out_root=root, run_id="b2", dedup_content=True),
        )
        assert m2["quality"]["kept"] == 0  # both blocked
        q = store.read(QUARANTINE_TABLE)
        assert q.filter(
            F.col("clip_id").isin([f"re_{c}" for c in ids])
            & F.array_contains("reasons", "duplicate_content")
        ).count() == 2

    def test_block_and_purge_are_distinct_orders(self, spark):
        assert takedown_id_for(["a", "b"], "purge") != takedown_id_for(
            ["a", "b"], "block"
        )
        assert takedown_id_for(["b", "a"], "purge") == takedown_id_for(
            ["a", "b"], "purge"
        )
        with pytest.raises(ValueError, match="mode"):
            apply_takedown(None, "/nonexistent", ["x"], mode="nuke")
        with pytest.raises(ValueError, match="empty"):
            apply_takedown(None, "/nonexistent", [None], mode="purge")


class TestTakedownCrashOrdering:
    """The history-phase-before-clean-delete contract: every derived
    input (content hashes, DSIR transcripts) comes FROM clips_clean, so
    a crash between the clean delete and the history commits used to
    re-run with an empty derivation and silently skip the purge."""

    @pytest.fixture()
    def rooted(self, spark, small_corpus, tmp_path):
        _, path = small_corpus
        root = str(tmp_path / "tables")
        cfg = RunConfig(
            out_root=root, run_id="p1", dedup_content=True,
            dedup_audio=True, dedup_audio_max_hamming=0,
        )
        run_pipeline(spark, path, cfg)
        return root

    def test_hard_with_block_raises(self):
        with pytest.raises(ValueError, match="purge-only"):
            apply_takedown(
                None, "/nonexistent", ["x"], mode="block", hard=True
            )

    def test_crash_before_clean_delete_converges(
        self, spark, rooted, monkeypatch
    ):
        store = TableStore(spark, rooted)
        row = (
            store.read(CLEAN_TABLE)
            .select("clip_id", content_hash_expr("transcript").alias("h"))
            .orderBy("clip_id").first()
        )
        cid, h = row["clip_id"], row["h"]

        real = TableStore.delete_where

        def crash_on_clean(self, name, key_col, keys, **kw):
            if name == CLEAN_TABLE:
                raise RuntimeError("injected crash before clean delete")
            return real(self, name, key_col, keys, **kw)

        monkeypatch.setattr(TableStore, "delete_where", crash_on_clean)
        with pytest.raises(RuntimeError, match="injected crash"):
            apply_takedown(spark, rooted, [cid], mode="purge")
        monkeypatch.undo()

        # the dedup memory is ALREADY purged (history phase ran first),
        # the clean row survives, and no marker landed
        assert store.read(CONTENT_HASH_TABLE).filter(
            F.col("text_hash") == h
        ).count() == 0
        assert store.read(CLEAN_TABLE).filter(
            F.col("clip_id") == cid
        ).count() == 1

        # re-run converges: hashes re-derive from the intact clean
        # table, the history deletes replay as no-ops, the clean
        # delete lands, the marker anchors idempotency
        rep = apply_takedown(spark, rooted, [cid], mode="purge")
        assert not rep["skipped_already_applied"]
        assert rep["tables"][CLEAN_TABLE]["n_deleted"] == 1
        assert store.read(CLEAN_TABLE).filter(
            F.col("clip_id") == cid
        ).count() == 0
        rep2 = apply_takedown(spark, rooted, [cid], mode="purge")
        assert rep2["skipped_already_applied"]

    def test_skip_path_heals_hard_expiry(self, spark, rooted):
        """A crash between the marker (last anchored commit) and the
        expiry used to leave purged bytes on disk forever; the replay
        now re-drives the idempotent expiry."""
        store = TableStore(spark, rooted)
        cid = store.read(CLEAN_TABLE).orderBy("clip_id").first()["clip_id"]
        # soft purge == hard purge that crashed right after its marker
        apply_takedown(spark, rooted, [cid], mode="purge")
        rep = apply_takedown(
            spark, rooted, [cid], mode="purge", hard=True,
            orphan_grace_s=0,
        )
        assert rep["skipped_already_applied"]
        assert CLEAN_TABLE in rep["hard_expired"]
        files = glob.glob(
            os.path.join(rooted, CLEAN_TABLE, "snap_*", "**",
                         "*.parquet"),
            recursive=True,
        )
        import duckdb

        n = duckdb.sql(
            f"select count(*) n from read_parquet({files!r}, "
            f"union_by_name=true) where clip_id = '{cid}'"
        ).fetchone()[0]
        assert n == 0

    def test_purge_forgets_dsir_model(self, spark, rooted):
        """dsir_model_table= runs selection.dsir_model_forget before
        the clean delete: the merged model equals a recompute over the
        corpus without the removed clips."""
        from data_quality_check_pipeline_spark.operators.selection import (
            dsir_corpus_hist,
            feature_hist,
            incremental_dsir_model_run,
        )

        store = TableStore(spark, rooted)
        clean = store.read(CLEAN_TABLE)
        incremental_dsir_model_run(
            store, "dsir_model", clean, "transcript",
            source_fingerprint="seed",
        )
        cid = clean.orderBy("clip_id").first()["clip_id"]
        rep = apply_takedown(
            spark, rooted, [cid], mode="purge",
            dsir_model_table="dsir_model",
        )
        assert rep["dsir_model_forgot"] == 1
        merged = {
            (r["feat"], r["n"])
            for r in dsir_corpus_hist(store, "dsir_model").collect()
        }
        expect = {
            (r["feat"], r["n"])
            for r in feature_hist(
                store.read(CLEAN_TABLE), "transcript", (1, 2), 8192
            ).collect()
        }
        assert merged == expect


class TestTakedownDefer:
    """defer=True: table deletes commit as merge-on-read equality-
    delete files (delete_keys_mor) — O(keys), no data file touched —
    with the same purge/block semantics, idempotency anchor, and a
    per-table replay guard for the crash window before the marker."""

    @pytest.fixture()
    def rooted(self, spark, small_corpus, tmp_path):
        _, path = small_corpus
        root = str(tmp_path / "tables")
        cfg = RunConfig(
            out_root=root, run_id="p1", dedup_content=True,
            dedup_audio=True, dedup_audio_max_hamming=0,
        )
        run_pipeline(spark, path, cfg)
        return root

    def test_hard_with_defer_raises(self):
        with pytest.raises(ValueError, match="defer"):
            apply_takedown(
                None, "/nonexistent", ["x"], mode="purge",
                hard=True, defer=True,
            )

    def test_deferred_purge_moves_no_data_files(self, spark, rooted):
        store = TableStore(spark, rooted)
        rows = (
            store.read(CLEAN_TABLE)
            .select("clip_id", content_hash_expr("transcript").alias("h"))
            .orderBy("clip_id").limit(2).collect()
        )
        ids = [r["clip_id"] for r in rows]
        hashes = [r["h"] for r in rows]
        n_before = store.row_count(CLEAN_TABLE)
        pre_files = sorted(
            glob.glob(
                os.path.join(rooted, CLEAN_TABLE, "snap_*", "**",
                             "*.parquet"),
                recursive=True,
            )
        )
        rep = apply_takedown(spark, rooted, ids, mode="purge",
                             defer=True)
        assert rep["defer"] is True
        for t in (CLEAN_TABLE, CONTENT_HASH_TABLE, AUDIO_FP_TABLE):
            assert rep["tables"][t]["mor"] is True, t
            assert rep["tables"][t]["snapshot"]
        # logically gone NOW, across the clean table AND the dedup
        # memory (purge semantics)
        assert store.read(CLEAN_TABLE).filter(
            F.col("clip_id").isin(ids)
        ).count() == 0
        assert store.row_count(CLEAN_TABLE) == n_before - 2
        assert store.read(CONTENT_HASH_TABLE).filter(
            F.col("text_hash").isin(hashes)
        ).count() == 0
        assert store.read(AUDIO_FP_TABLE).filter(
            F.col("clip_id").isin(ids)
        ).count() == 0
        # ... yet not one data file moved: that is MOR's whole point
        post_files = sorted(
            glob.glob(
                os.path.join(rooted, CLEAN_TABLE, "snap_*", "**",
                             "*.parquet"),
                recursive=True,
            )
        )
        assert post_files == pre_files
        cur = store.current_snapshot(CLEAN_TABLE)
        assert cur["mode"] == "mor_delete"
        assert cur.get("delete_files")
        # terminal marker + idempotency, same as the COW path
        q = store.read(QUARANTINE_TABLE)
        assert q.filter(
            F.col("clip_id").isin(ids)
            & F.array_contains("reasons", TAKEDOWN_REASON)
        ).count() == 2
        rep2 = apply_takedown(spark, rooted, ids, mode="purge",
                              defer=True)
        assert rep2["skipped_already_applied"]

    def test_defer_composes_with_pending_predicate_delete(
        self, spark, rooted
    ):
        """A pending --delete-below-defer predicate entry (pred_id,
        no "path" key) must not crash the deferred takedown's replay
        guard — the two deferred-delete kinds are advertised as
        stackable until the next compact."""
        store = TableStore(spark, rooted)
        store.delete_below_mor(CLEAN_TABLE, "dur_ms", -1)
        cid = store.read(CLEAN_TABLE).orderBy("clip_id").first()[
            "clip_id"
        ]
        rep = apply_takedown(spark, rooted, [cid], mode="purge",
                             defer=True)
        assert rep["tables"][CLEAN_TABLE]["mor"] is True
        assert store.read(CLEAN_TABLE).filter(
            F.col("clip_id") == cid
        ).count() == 0
        # both entry kinds pending on the same snapshot
        kinds = {
            ("pred" if "pred_id" in e else "keys")
            for e in store.current_snapshot(CLEAN_TABLE)[
                "delete_files"
            ]
        }
        assert kinds == {"pred", "keys"}
        # and the replay guard still recognizes its own entry
        rep2 = apply_takedown(spark, rooted, [cid], mode="purge",
                              defer=True)
        assert rep2["skipped_already_applied"]

    def test_crash_before_marker_does_not_stack_delete_files(
        self, spark, rooted, monkeypatch
    ):
        store = TableStore(spark, rooted)
        cid = store.read(CLEAN_TABLE).orderBy("clip_id").first()[
            "clip_id"
        ]
        real = TableStore.write

        def crash_on_marker(self, name, df, **kw):
            if name == QUARANTINE_TABLE:
                raise RuntimeError("injected crash before marker")
            return real(self, name, df, **kw)

        monkeypatch.setattr(TableStore, "write", crash_on_marker)
        with pytest.raises(RuntimeError, match="injected crash"):
            apply_takedown(spark, rooted, [cid], mode="purge",
                           defer=True)
        monkeypatch.undo()
        rep = apply_takedown(spark, rooted, [cid], mode="purge",
                             defer=True)
        assert not rep["skipped_already_applied"]
        # the replay detected the already-committed MOR delete and did
        # NOT mint a second key file for the same order
        assert rep["tables"][CLEAN_TABLE].get("replayed") is True
        cur = store.current_snapshot(CLEAN_TABLE)
        assert len(cur.get("delete_files") or []) == 1
        assert store.read(CLEAN_TABLE).filter(
            F.col("clip_id") == cid
        ).count() == 0

    def test_maintenance_refuses_until_compact_materializes(
        self, spark, rooted
    ):
        store = TableStore(spark, rooted)
        rows = store.read(CLEAN_TABLE).orderBy("clip_id").limit(
            2
        ).collect()
        cid = rows[0]["clip_id"]
        apply_takedown(spark, rooted, [cid], mode="purge", defer=True)
        n_after = store.row_count(CLEAN_TABLE)
        # data-restructuring maintenance refuses while deletes pend
        with pytest.raises(RuntimeError, match="pending"):
            store.delete_where(CLEAN_TABLE, "clip_id",
                               [rows[1]["clip_id"]])
        # compact() is the materialization point: pending deletes are
        # applied into the rewrite and cleared; the view is unchanged
        store.compact(CLEAN_TABLE, cluster_by=["clip_id"])
        cur = store.current_snapshot(CLEAN_TABLE)
        assert not cur.get("delete_files")
        assert store.row_count(CLEAN_TABLE) == n_after
        assert store.read(CLEAN_TABLE).filter(
            F.col("clip_id") == cid
        ).count() == 0
        # ... and COW maintenance works again
        res = store.delete_where(CLEAN_TABLE, "clip_id",
                                 [rows[1]["clip_id"]])
        assert res["n_deleted"] == 1

    def test_deferred_block_registers_hashes(
        self, spark, small_corpus, tmp_path
    ):
        pdf, path = small_corpus
        root = str(tmp_path / "tables")
        run_pipeline(spark, path, RunConfig(out_root=root, run_id="b1"))
        store = TableStore(spark, root)
        row = (
            store.read(CLEAN_TABLE)
            .select("clip_id", content_hash_expr("transcript").alias("h"))
            .orderBy("clip_id").first()
        )
        rep = apply_takedown(spark, root, [row["clip_id"]],
                             mode="block", defer=True)
        assert rep["tables"][CLEAN_TABLE]["mor"] is True
        assert rep["blocked_hashes_registered"] == 1
        # block semantics survive the defer: the signature STAYS
        assert store.read(CONTENT_HASH_TABLE).filter(
            F.col("text_hash") == row["h"]
        ).count() == 1
        assert store.read(CLEAN_TABLE).filter(
            F.col("clip_id") == row["clip_id"]
        ).count() == 0
