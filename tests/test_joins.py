"""asof_join / interval_join operator tests: planted semantics, a
pure-Python oracle on random data, tolerance, direction, tie handling,
and the bounded-join guard on degenerate intervals."""

import random

import pytest
from pyspark.sql import functions as F

from data_quality_check_pipeline_spark.operators.joins import (
    asof_join,
    interval_join,
)


def _rows(df):
    return sorted(
        tuple(r[c] for c in df.columns) for r in df.collect()
    )


class TestAsofJoin:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [
                (1, "u", 100.0, "p1"),
                (2, "u", 205.0, "p2"),
                (3, "u", 205.0, "p3"),   # equal ts to a right row
                (4, "v", 50.0, "p4"),    # v never has a right row
                (5, "w", 10.0, "p5"),    # before w's first right row
            ],
            "event_id long, user string, ts double, tag string",
        )
        right = spark.createDataFrame(
            [
                ("u", 90.0, "a"),
                ("u", 205.0, "b"),
                ("u", 300.0, "c"),
                ("w", 20.0, "d"),
            ],
            "user string, rts double, rtag string",
        )
        return left, right

    def test_backward_semantics(self, spark):
        left, right = self._frames(spark)
        out = {
            r["event_id"]: (r["rts_r"], r["rtag_r"])
            for r in asof_join(
                left, right, ["user"], "ts", "rts"
            ).collect()
        }
        assert out[1] == (90.0, "a")
        assert out[2] == (205.0, "b")   # equal ts matches
        assert out[3] == (205.0, "b")
        assert out[4] == (None, None)   # key with no right rows
        assert out[5] == (None, None)   # before first right row
        # left columns intact, row count preserved
        assert len(out) == 5

    def test_forward_and_tolerance(self, spark):
        left, right = self._frames(spark)
        fwd = {
            r["event_id"]: r["rts_r"]
            for r in asof_join(
                left, right, ["user"], "ts", "rts",
                direction="forward",
            ).collect()
        }
        assert fwd[1] == 205.0 and fwd[2] == 205.0 and fwd[3] == 205.0
        assert fwd[4] is None and fwd[5] == 20.0
        tol = {
            r["event_id"]: r["rts_r"]
            for r in asof_join(
                left, right, ["user"], "ts", "rts", tolerance_s=5.0
            ).collect()
        }
        # backward: event 1's match (90 @ ts 100) is 10s old -> nulled
        assert tol[1] is None and tol[2] == 205.0

    def test_matches_python_oracle_on_random_data(self, spark):
        rng = random.Random(11)
        # ~10% NULL timestamps on both sides: the oracle below treats
        # them as non-matching order keys (the DuckDB/pandas contract)
        left_rows = [
            (
                i,
                f"k{rng.randrange(5)}",
                None if rng.random() < 0.1
                else float(rng.randrange(1000)),
            )
            for i in range(80)
        ]
        right_rows = [
            (
                f"k{rng.randrange(5)}",
                None if rng.random() < 0.1
                else float(rng.randrange(1000)),
                i,
            )
            for i in range(60)
        ]
        left = spark.createDataFrame(
            left_rows, "lid long, k string, ts double"
        )
        right = spark.createDataFrame(
            right_rows, "k string, rts double, rid long"
        )
        got = {
            r["lid"]: r["rts_r"]
            for r in asof_join(left, right, ["k"], "ts", "rts").collect()
        }
        for lid, k, ts in left_rows:
            cand = [
                rts for rk, rts, _ in right_rows
                if rk == k and ts is not None and rts is not None
                and rts <= ts
            ]
            assert got[lid] == (max(cand) if cand else None), lid

    def test_timestamp_inputs_and_tolerance(self, spark):
        left = spark.createDataFrame(
            [(1, "u", "2024-01-01 00:10:00"),
             (2, "u", "2024-01-01 03:00:00")],
            "event_id long, user string, ts_s string",
        ).withColumn("ts", F.col("ts_s").cast("timestamp_ntz")).drop("ts_s")
        right = spark.createDataFrame(
            [("u", "2024-01-01 00:00:00")],
            "user string, rts_s string",
        ).withColumn(
            "rts", F.col("rts_s").cast("timestamp_ntz")
        ).drop("rts_s")
        out = {
            r["event_id"]: r["rts_r"]
            for r in asof_join(
                left, right, ["user"], "ts", "rts",
                tolerance_s=3600.0,
            ).collect()
        }
        assert out[1] is not None       # 10 min old: within tolerance
        assert out[2] is None           # 3 h old: nulled

    def test_plan_one_exchange_no_join(self, spark):
        """Pin the scale shape: the union + running-last plan shuffles
        ONCE on the key and contains no join operator at all (a naive
        formulation would plan a SortMergeJoin + aggregate)."""
        left, right = self._frames(spark)
        q = asof_join(left, right, ["user"], "ts", "rts")
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1
        assert "Join" not in plan and "Cartesian" not in plan
        assert "Window" in plan

    def test_errors(self, spark):
        left, right = self._frames(spark)
        with pytest.raises(ValueError, match="direction"):
            asof_join(left, right, ["user"], "ts", "rts",
                      direction="sideways")
        with pytest.raises(ValueError, match="collide"):
            asof_join(
                left.withColumn("rts_r", F.lit(1)), right,
                ["user"], "ts", "rts",
            )
        with pytest.raises(ValueError, match="payload"):
            asof_join(left, right.select("user"), ["user"], "ts", "rts")

    def test_null_timestamps_never_match(self, spark):
        """DuckDB/pandas ASOF contract: NULL order keys match nothing.
        Unguarded, a NULL-ts right row sorts nulls-FIRST under asc and
        becomes a match-everything state row in backward mode, and a
        NULL-ts left row sorts nulls-LAST under desc and picks up the
        oldest state in forward mode."""
        left, right = self._frames(spark)
        left = left.unionByName(
            spark.createDataFrame(
                [(6, "u", None, "p6")],
                "event_id long, user string, ts double, tag string",
            )
        )
        right = right.unionByName(
            spark.createDataFrame(
                [("v", None, "z")],
                "user string, rts double, rtag string",
            )
        )
        for direction in ("backward", "forward"):
            out = {
                r["event_id"]: (r["rts_r"], r["rtag_r"])
                for r in asof_join(
                    left, right, ["user"], "ts", "rts",
                    direction=direction,
                ).collect()
            }
            # key v's only right row has a NULL ts: still no match
            assert out[4] == (None, None), direction
            # the NULL-ts left row is kept, with NULL right columns
            assert out[6] == (None, None), direction
            assert len(out) == 6, direction


class TestIntervalJoin:
    def test_containment_and_boundaries(self, spark):
        pts = spark.createDataFrame(
            [(1, 5.0), (2, 10.0), (3, 10.5), (4, 99.0)],
            "pid long, x double",
        )
        iv = spark.createDataFrame(
            [("a", 0.0, 10.0), ("b", 10.0, 20.0), ("c", 50.0, 40.0)],
            "name string, lo double, hi double",  # c is inverted
        )
        got = {
            (r["pid"], r["name"])
            for r in interval_join(
                pts, iv, "x", "lo", "hi", bucket_width=4.0
            ).collect()
        }
        # closed bounds on both ends; point 10 hits BOTH intervals;
        # inverted interval matches nothing; 99 matches nothing
        assert got == {(1, "a"), (2, "a"), (2, "b"), (3, "b")}

    def test_matches_naive_between_join(self, spark):
        rng = random.Random(3)
        pts = spark.createDataFrame(
            [(i, float(rng.randrange(200))) for i in range(60)],
            "pid long, x double",
        )
        ivs = []
        for i in range(25):
            lo = float(rng.randrange(200))
            ivs.append((i, lo, lo + rng.randrange(40)))
        iv = spark.createDataFrame(ivs, "iid long, lo double, hi double")
        got = {
            (r["pid"], r["iid"])
            for r in interval_join(
                pts, iv, "x", "lo", "hi", bucket_width=16.0
            ).collect()
        }
        naive = {
            (r["pid"], r["iid"])
            for r in pts.crossJoin(iv)
            .filter(F.col("x").between(F.col("lo"), F.col("hi")))
            .collect()
        }
        assert got == naive and len(naive) > 0

    def test_oversized_interval_guard(self, spark):
        pts = spark.createDataFrame([(1, 5.0)], "pid long, x double")
        iv = spark.createDataFrame(
            [("wide", 0.0, 1e9), ("ok", 0.0, 10.0)],
            "name string, lo double, hi double",
        )
        stats: dict = {}
        got = {
            r["name"]
            for r in interval_join(
                pts, iv, "x", "lo", "hi", bucket_width=1.0,
                max_buckets_per_interval=100, stats_out=stats,
            ).collect()
        }
        assert got == {"ok"} and stats["oversized_intervals"] == 1
        with pytest.raises(ValueError, match="bucket_width"):
            interval_join(pts, iv, "x", "lo", "hi", bucket_width=0)
