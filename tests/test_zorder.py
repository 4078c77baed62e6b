"""Z-order (Morton-curve) clustering in TableStore.

Evidence contract: after a ``zorder_by=[x, y]`` rewrite,
``read(prune=...)`` must be selective on BOTH columns, where a linear
``cluster_by=[x, y]`` sort serves only the leading key. The z-value
itself is parity-checked against a pure-Python re-derivation
(bisect bucket + bit interleave over the same collected boundaries).
"""

from bisect import bisect_right

import pytest
from pyspark.sql import functions as F

from data_quality_check_pipeline_spark.sources.tables import (
    TableStore,
    _zorder_column,
)

N = 4096
FILES = 16


def _grid_df(spark):
    """Two INDEPENDENT uniform dims: x row-major, y decorrelated via a
    multiplicative hash — x-sorted order is y-shuffled, the worst case
    for a linear sort layout."""
    return spark.range(0, N).select(
        F.col("id").alias("i"),
        (F.col("id") / F.lit(N / 64)).cast("long").alias("x"),
        F.pmod(F.col("id") * F.lit(2654435761), F.lit(N)).alias("y"),
    )


def _pruned_count(store, table, col, lo, hi, scan):
    df = store.read(
        table,
        prune=[(col, ">=", lo), (col, "<", hi)],
        scan_stats=scan,
    )
    return df.filter(
        (F.col(col) >= F.lit(lo)) & (F.col(col) < F.lit(hi))
    ).count()


class TestZorderLayout:
    def test_prunes_on_both_dimensions(self, spark, tmp_path):
        store = TableStore(spark, str(tmp_path / "z"))
        df = _grid_df(spark)

        # linear sort on (x, y): leading key prunes, trailing key can't
        store.write("lin", df, cluster_by=["x", "y"], target_files=FILES)
        sx, sy = {}, {}
        nx = _pruned_count(store, "lin", "x", 8, 12, sx)
        ny = _pruned_count(store, "lin", "y", 512, 768, sy)
        assert nx == 4 * (N // 64) and sx["files_skipped"] >= FILES - 3
        assert ny == 256 and sy["files_skipped"] <= 1  # y spans every file

        # z-order on (x, y): BOTH dimensions prune
        store.write("zed", df, zorder_by=["x", "y"], target_files=FILES)
        zx, zy = {}, {}
        nzx = _pruned_count(store, "zed", "x", 8, 12, zx)
        nzy = _pruned_count(store, "zed", "y", 512, 768, zy)
        assert nzx == 4 * (N // 64) and nzy == 256  # values identical
        assert zx["files_skipped"] >= FILES // 2
        assert zy["files_skipped"] >= FILES // 2
        # no rows lost in the re-layout
        assert store.read("zed").count() == N

    def test_compact_zorder_is_sticky(self, spark, tmp_path):
        store = TableStore(spark, str(tmp_path / "zs"))
        store.write("t", _grid_df(spark))  # arrival order, no layout
        s0 = {}
        store.read(
            "t", prune=[("y", ">=", 512), ("y", "<", 768)], scan_stats=s0
        )
        sid = store.compact("t", zorder_by=["x", "y"], target_files=FILES)
        assert sid is not None
        assert store.current_snapshot("t")["zorder_by"] == ["x", "y"]
        # append some rows (arrival order), then a PLAIN compact: the
        # sticky walk must recall the z-order layout
        extra = _grid_df(spark).limit(64)
        store.write("t", extra, mode="append")
        sid2 = store.compact("t", target_files=FILES)
        assert sid2 is not None
        snap = store.current_snapshot("t")
        assert snap["zorder_by"] == ["x", "y"]
        assert snap["cluster_by"] == []
        scan = {}
        n = _pruned_count(store, "t", "y", 512, 768, scan)
        truth = (
            store.read("t")
            .filter((F.col("y") >= 512) & (F.col("y") < 768))
            .count()
        )
        assert n == truth
        assert scan["files_skipped"] >= FILES // 2

    def test_upsert_preserves_zorder_layout(self, spark, tmp_path):
        store = TableStore(spark, str(tmp_path / "zu"))
        store.write(
            "t", _grid_df(spark), zorder_by=["x", "y"],
            target_files=FILES,
        )
        inc = _grid_df(spark).where(F.col("i") < 4).withColumn(
            "y", F.col("y") + F.lit(0)  # same schema, updated rows
        )
        res = store.upsert("t", inc, "i")
        assert res["n_updated"] == 4
        assert store.current_snapshot("t")["zorder_by"] == ["x", "y"]
        scan = {}
        _pruned_count(store, "t", "y", 512, 768, scan)
        assert scan["files_skipped"] > 0

    def test_guards(self, spark, tmp_path):
        store = TableStore(spark, str(tmp_path / "zg"))
        df = _grid_df(spark).withColumn("s", F.lit("a"))
        with pytest.raises(ValueError, match="mutually exclusive"):
            store.write(
                "t", df, cluster_by=["x"], zorder_by=["y"]
            )
        with pytest.raises(ValueError, match="numeric/date/timestamp"):
            store.write("t", df, zorder_by=["s", "x"])
        with pytest.raises(ValueError, match="duplicate"):
            store.write("t", df, zorder_by=["x", "x"])
        store.write("t", df, cluster_by=["x"])
        with pytest.raises(ValueError, match="mutually exclusive"):
            store.compact("t", cluster_by=["x"], zorder_by=["y"])

    def test_null_and_constant_columns(self, spark, tmp_path):
        store = TableStore(spark, str(tmp_path / "zn"))
        df = _grid_df(spark).select(
            "i",
            F.when(F.col("i") % 8 == 0, None)
            .otherwise(F.col("x")).alias("x"),
            F.lit(7).alias("c"),
            "y",
        )
        # constant column contributes no bits; NULLs bucket to 0 — the
        # write must succeed and lose nothing
        store.write("t", df, zorder_by=["x", "c", "y"],
                    target_files=FILES)
        out = store.read("t")
        assert out.count() == N
        assert out.filter(F.col("x").isNull()).count() == N // 8
        scan = {}
        n = _pruned_count(store, "t", "y", 512, 768, scan)
        assert n == 256
        assert scan["files_skipped"] > 0


class TestZValueParity:
    def test_matches_python_rederivation(self, spark):
        """The Spark CASE-tree bucket + bit-interleave expression ==
        bisect_right bucket + Python interleave over the same collected
        percentile boundaries."""
        bits = 4
        nb = 1 << bits
        df = spark.range(0, 2000).select(
            F.col("id").alias("i"),
            (F.col("id") % 50).cast("double").alias("x"),
            F.pmod(F.col("id") * 37, F.lit(97)).cast("double").alias("y"),
        )
        z = _zorder_column(df, ["x", "y"], bits=bits)
        got = {
            r["i"]: r["z"]
            for r in df.withColumn("z", z).collect()
        }
        probs = [i / nb for i in range(1, nb)]
        row = df.agg(
            F.percentile_approx("x", probs, 10_000).alias("bx"),
            F.percentile_approx("y", probs, 10_000).alias("by"),
        ).collect()[0]
        bx = sorted(set(float(v) for v in row["bx"]))
        by = sorted(set(float(v) for v in row["by"]))

        def bucket(v, bounds):
            b = bisect_right(bounds, v)
            if len(bounds) < nb - 1:  # MSB-align low-cardinality dims
                b = b * (nb - 1) // len(bounds)
            return b

        def interleave(vx, vy):
            ix, iy = bucket(vx, bx), bucket(vy, by)
            out = 0
            for bit in range(bits):
                out |= ((ix >> bit) & 1) << (bit * 2)
                out |= ((iy >> bit) & 1) << (bit * 2 + 1)
            return out

        for r in df.collect():
            assert got[r["i"]] == interleave(r["x"], r["y"]), r

    def test_zorder_locality_beats_linear_on_trailing_dim(self, spark):
        """Direct curve property, no files involved: sort rows by
        z-value, cut into 16 equal runs — the max per-run y-extent must
        be far below the full domain (a linear x-sort leaves it at
        ~full domain)."""
        df = _grid_df(spark)
        z = _zorder_column(df, ["x", "y"], bits=8)
        rows = sorted(
            df.withColumn("z", z).collect(), key=lambda r: r["z"]
        )
        run = len(rows) // 16
        z_extents = []
        for k in range(16):
            chunk = rows[k * run:(k + 1) * run]
            ys = [r["y"] for r in chunk]
            z_extents.append(max(ys) - min(ys))
        lin = sorted(rows, key=lambda r: (r["x"], r["y"]))
        lin_extents = []
        for k in range(16):
            chunk = lin[k * run:(k + 1) * run]
            ys = [r["y"] for r in chunk]
            lin_extents.append(max(ys) - min(ys))
        # linear: every x-run spans ~the whole y domain
        assert min(lin_extents) > N * 0.9
        # z-order: each run stays inside a bounded y band
        assert max(z_extents) <= N // 2
