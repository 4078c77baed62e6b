"""Write-audit-publish branches in TableStore.

Contract: a branch-scoped handle lands snapshots invisibly to mainline
(reads fork from current), ``publish_branch`` fast-forwards mainline
atomically (refusing when mainline moved since the fork), ``drop_branch``
discards the staged view AND its replay-skip evidence (reachability),
expire keeps live branch heads, and mainline-mutating maintenance ops
refuse on a branch handle.
"""

import pytest
from pyspark.sql import functions as F

from data_quality_check_pipeline_spark.sources.tables import TableStore


def _df(spark, ids, v=0):
    return spark.createDataFrame(
        [(f"clip_{i:04d}", v) for i in ids], ["clip_id", "v"]
    )


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "ts")


class TestBranchIsolation:
    def test_branch_writes_invisible_until_publish(self, spark, root):
        main = TableStore(spark, root)
        main.write("t", _df(spark, range(10)))
        staged = TableStore(spark, root, default_branch="wap-r1")
        staged.write("t", _df(spark, range(10, 14)), mode="append")
        # mainline view unchanged; branch view = fork + staged rows
        assert main.read("t").count() == 10
        assert staged.read("t").count() == 14
        assert main.read("t", branch="wap-r1").count() == 14
        assert main.branches("t") == {
            "wap-r1": staged.current_snapshot("t")["id"]
        }
        # publish: mainline fast-forwards, ref gone
        sid = main.publish_branch("t", "wap-r1")
        assert main.read("t").count() == 14
        assert main.current_snapshot("t")["id"] == sid
        assert main.branches("t") == {}

    def test_branch_forks_from_current_before_first_commit(
        self, spark, root
    ):
        main = TableStore(spark, root)
        main.write("t", _df(spark, range(5)))
        staged = TableStore(spark, root, default_branch="b")
        # no branch commit yet: the branch view IS the fork view
        assert staged.read("t").count() == 5
        assert staged.exists("t")
        # explicit unknown branch on a read raises (typo protection)
        with pytest.raises(KeyError, match="unknown branch"):
            main.read("t", branch="nope")

    def test_two_branches_fork_independently(self, spark, root):
        main = TableStore(spark, root)
        main.write("t", _df(spark, range(5)))
        b1 = TableStore(spark, root, default_branch="b1")
        b2 = TableStore(spark, root, default_branch="b2")
        b1.write("t", _df(spark, [100]), mode="append")
        b2.write("t", _df(spark, [200, 201]), mode="append")
        assert b1.read("t").count() == 6
        assert b2.read("t").count() == 7
        assert main.read("t").count() == 5

    def test_row_count_is_branch_aware(self, spark, root):
        main = TableStore(spark, root)
        main.write("t", _df(spark, range(5)))
        staged = TableStore(spark, root, default_branch="b")
        staged.write("t", _df(spark, [9]), mode="append")
        assert staged.row_count("t") == 6
        assert main.row_count("t") == 5


class TestPublishSemantics:
    def test_publish_refuses_after_concurrent_mainline_commit(
        self, spark, root
    ):
        main = TableStore(spark, root)
        main.write("t", _df(spark, range(5)))
        staged = TableStore(spark, root, default_branch="b")
        staged.write("t", _df(spark, [9]), mode="append")
        # mainline moves AFTER the fork: publishing would discard it
        main.write("t", _df(spark, [50]), mode="append")
        with pytest.raises(RuntimeError, match="not an ancestor"):
            main.publish_branch("t", "b")
        # staged data still intact for a fresh-fork re-run
        assert staged.read("t").count() == 6
        assert main.read("t").count() == 6  # 5 + concurrent 1

    def test_publish_unknown_branch_raises(self, spark, root):
        main = TableStore(spark, root)
        main.write("t", _df(spark, range(3)))
        with pytest.raises(KeyError, match="unknown branch"):
            main.publish_branch("t", "nope")

    def test_multi_commit_branch_publishes_whole_chain(
        self, spark, root
    ):
        main = TableStore(spark, root)
        main.write("t", _df(spark, range(3)))
        staged = TableStore(spark, root, default_branch="b")
        staged.write("t", _df(spark, [10]), mode="append")
        staged.write("t", _df(spark, [11]), mode="append")
        main.publish_branch("t", "b")
        got = {
            r["clip_id"] for r in main.read("t").collect()
        }
        assert got == {f"clip_{i:04d}" for i in [0, 1, 2, 10, 11]}


class TestDropAndReplay:
    def test_drop_branch_restores_reprocessability(self, spark, root):
        """The crash-replay guard keys on REACHABILITY: a shard
        committed to a live branch skips on re-run; after drop_branch
        the same properties are unreachable and a re-run re-lands."""
        from data_quality_check_pipeline_spark.pipeline import (
            _find_committed_write,
        )

        main = TableStore(spark, root)
        main.write("t", _df(spark, range(3)))
        staged = TableStore(spark, root, default_branch="b")
        staged.write(
            "t", _df(spark, [10]), mode="append",
            properties={"shard_fp": "s0"},
        )
        assert _find_committed_write(staged, "t", {"shard_fp": "s0"})
        main.drop_branch("t", "b")
        assert main.read("t").count() == 3
        # the dead branch's commit no longer counts as committed — on
        # either the mainline handle or a fresh same-name branch handle
        assert _find_committed_write(main, "t", {"shard_fp": "s0"}) is None
        fresh = TableStore(spark, root, default_branch="b")
        assert (
            _find_committed_write(fresh, "t", {"shard_fp": "s0"}) is None
        )

    def test_expire_keeps_live_branch_head_drops_dead(self, spark, root):
        import os

        main = TableStore(spark, root)
        main.write("t", _df(spark, range(3)))
        staged = TableStore(spark, root, default_branch="b")
        sid = staged.write("t", _df(spark, [10]), mode="append")
        # bury the branch snapshot under newer mainline commits
        for k in range(3):
            main.write("t", _df(spark, [20 + k]), mode="append")
        main.expire_snapshots("t", keep_last=1, orphan_grace_s=0)
        assert os.path.exists(
            os.path.join(root, "t", f"snap_{sid}")
        )  # live branch head pinned
        assert staged.read("t").count() == 4
        main.drop_branch("t", "b")
        main.expire_snapshots("t", keep_last=1, orphan_grace_s=0)
        assert not os.path.exists(os.path.join(root, "t", f"snap_{sid}"))


class TestWapPipeline:
    def test_run_audit_publish_cycle(self, spark, corpus, tmp_path):
        """Full WAP cycle on the real pipeline: a --wap run stages
        EVERY table (clean, quarantine, signature history, lineage) on
        the branch with mainline byte-untouched, release_check audits
        the branch view, publish fast-forwards all of it."""
        from data_quality_check_pipeline_spark.pipeline import (
            RunConfig,
            run_pipeline,
        )
        from data_quality_check_pipeline_spark.release import (
            release_check,
        )

        _, _, path = corpus
        out = str(tmp_path / "wap_out")
        cfg = RunConfig(
            out_root=out, run_id="w1", n_shards=2,
            source_fingerprint="fp-w1", dedup_content=True,
            wap_branch="wap-w1", module_reports=False,
        )
        m = run_pipeline(spark, path, cfg)
        kept = m["quality"]["kept"]
        assert kept > 0
        main = TableStore(spark, out)
        # mainline: NOTHING landed anywhere, including the history
        for t in ("clips_clean", "clips_quarantine",
                  "content_hash_history", "lineage"):
            assert not main.exists(t), t
            assert "wap-w1" in main.branches(t), t
        # the audit judges the branch view
        verdict = release_check(spark, out, branch="wap-w1")
        assert verdict["ok"], verdict
        for t in main.list_tables():
            if "wap-w1" in main.branches(t):
                main.publish_branch(t, "wap-w1")
        assert main.read("clips_clean").count() == kept
        assert main.exists("content_hash_history")
        assert main.branches("clips_clean") == {}

    def test_drop_leaves_no_trace_and_rerun_lands(
        self, spark, corpus, tmp_path
    ):
        """Audit-failed verdict: dropping the branch leaves mainline
        (and the signature histories) with no trace, and a mainline
        re-run of the SAME fingerprinted shards re-processes fully —
        the replay guard must not skip on the dead branch's records."""
        from data_quality_check_pipeline_spark.pipeline import (
            RunConfig,
            run_pipeline,
        )

        _, _, path = corpus
        out = str(tmp_path / "wap_out2")
        cfg = dict(
            out_root=out, run_id="w2", n_shards=2,
            source_fingerprint="fp-w2", dedup_content=True,
            module_reports=False,
        )
        m1 = run_pipeline(
            spark, path, RunConfig(wap_branch="wap-w2", **cfg)
        )
        main = TableStore(spark, out)
        for t in main.list_tables():
            if "wap-w2" in main.branches(t):
                main.drop_branch(t, "wap-w2")
        assert not main.exists("clips_clean")
        assert not main.exists("content_hash_history")
        # mainline re-run, same run_id + fingerprint: must re-land
        m2 = run_pipeline(spark, path, RunConfig(**cfg))
        assert m2["quality"]["kept"] == m1["quality"]["kept"]
        assert main.read("clips_clean").count() == m2["quality"]["kept"]


class TestBranchMaintenanceRefusal:
    def test_mainline_ops_refuse_on_branch_handle(self, spark, root):
        main = TableStore(spark, root)
        main.write("t", _df(spark, range(4)))
        staged = TableStore(spark, root, default_branch="b")
        staged.write("t", _df(spark, [9]), mode="append")
        for op, call in {
            "compact": lambda: staged.compact("t", target_files=2),
            "delete_where": lambda: staged.delete_where(
                "t", "clip_id", ["clip_0001"]
            ),
            "upsert": lambda: staged.upsert(
                "t", _df(spark, [1], v=5), "clip_id"
            ),
            "rollback": lambda: staged.rollback(
                "t", main.current_snapshot("t")["id"]
            ),
            "tag": lambda: staged.tag("t", "rel"),
            "expire_snapshots": lambda: staged.expire_snapshots("t"),
            "adopt_files": lambda: staged.adopt_files("t", "/nowhere"),
        }.items():
            with pytest.raises(RuntimeError, match="mainline-only"):
                call()
