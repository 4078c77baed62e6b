"""Statistical outlier detection: IQR and z-score row flags.

Capability parity with /root/reference/src/statistical_validator.py
(:35-75 IQR bounds + :51-61 row flags; :80-108 z-scores; :113-171 date
distribution checks). Two-pass pattern: a tiny aggregate computes the
bounds, which are folded into the row predicate as LITERALS (no join, no
broadcast needed — the bounds travel in the plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .profile import numeric_summary


def with_iqr_outliers(
    df: DataFrame, col: str, out: str = "is_outlier",
    severity_out: str | None = "outlier_severity",
    relative_error: float = 1e-4,
) -> tuple[DataFrame, dict]:
    """Flag rows outside [q1 - 1.5*IQR, q3 + 1.5*IQR]; severity HIGH when
    more than 3*IQR from the median (statistical_validator.py:51-61)."""
    s = numeric_summary(df, col, relative_error)
    if s.get("empty"):
        res = df.withColumn(out, F.lit(False))
        if severity_out:
            res = res.withColumn(
                severity_out, F.lit(None).cast("string")
            )
        return res, s
    c = F.col(col).cast("double")
    flag = c.isNotNull() & ~c.between(s["lower"], s["upper"])
    res = df.withColumn(out, flag)
    if severity_out:
        far = F.abs(c - F.lit(s["median"])) > F.lit(3.0 * s["iqr"])
        res = res.withColumn(
            severity_out,
            F.when(flag & far, "HIGH").when(flag, "MEDIUM"),
        )
    return res, s


def with_zscore_outliers(
    df: DataFrame, col: str, threshold: float = 3.0, out: str = "is_outlier"
) -> tuple[DataFrame, dict]:
    """|x - mean| / std > threshold (statistical_validator.py:80-108,
    threshold from config.py:172)."""
    row = df.agg(
        F.mean(F.col(col)).alias("mean"), F.stddev(F.col(col)).alias("std")
    ).collect()[0]
    if row["mean"] is None:
        # empty input / all-null column: nothing to flag (mean over zero
        # rows is SQL NULL — float(None) would crash instead)
        return (
            df.withColumn(out, F.lit(False)),
            {"mean": None, "std": 0.0},
        )
    mean, std = float(row["mean"]), float(row["std"] or 0.0)
    c = F.col(col).cast("double")
    flag = (
        c.isNotNull() & (F.lit(std) > 0)
        & (F.abs(c - F.lit(mean)) / F.lit(std) > threshold)
    )
    return df.withColumn(out, flag), {"mean": mean, "std": std}


def with_date_bounds_flag(
    df: DataFrame,
    col: str,
    min_year: int = 1920,
    max_year: int = 2026,
    out: str = "date_out_of_bounds",
) -> DataFrame:
    """Per-row timestamp-sanity flag: year outside [min_year, max_year]
    (parity: reference statistical_validator.py:113-150, which flags
    year<1920 / year>2026 rows). NULL dates flag true — an unparseable or
    missing timestamp is exactly the corruption this rule exists to catch.
    Pure Column expr; no shuffle."""
    y = F.year(F.col(col))
    return df.withColumn(
        out, y.isNull() | (y < min_year) | (y > max_year)
    )


def value_clustering(
    df: DataFrame, col: str, max_share: float = 0.5
) -> dict:
    """Detect a single value holding more than ``max_share`` of rows
    (statistical_validator.py:157-161 month-clustering; graft: language-
    bucket skew detection that drives the salting policy)."""
    # ONE pass: groupBy counts (map-side combine), then the total and the
    # winning group reduce from the tiny grouped result — no second scan.
    # max(struct(n, value)) picks the top count with a deterministic
    # max-value tie-break.
    row = (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.sum("n").alias("total"),
            F.max(
                F.struct(F.col("n"), F.col(col).alias("v"))
            ).alias("top"),
        )
        .collect()[0]
    )
    total = int(row["total"] or 0)
    if not total:
        return {"skewed": False, "top_value": None, "share": 0.0}
    share = row["top"]["n"] / total
    return {
        "skewed": share > max_share,
        "top_value": row["top"]["v"],
        "share": share,
    }


def exact_percentiles(
    df,
    col: str,
    ps: tuple = (0.25, 0.5, 0.75),
    n_rows: int | None = None,
    n_parts: int | None = None,
) -> list:
    """Exact percentiles of ``df[col]`` by distributed rank-pick,
    bit-identical to Spark's ``percentile(col, array(ps))`` aggregate
    (same interpolation: ``(hi-pos)*v[lo] + (pos-lo)*v[hi]`` over the
    ascending non-null values, ``pos = p*(n-1)``).

    Why not the builtin: ``percentile`` is a TypedImperativeAggregate
    that builds a value->count map and merges/sorts it on ONE reducer —
    at 583k distinct values that merge measured 1.9 s while this path
    runs 1.2 s (r06), and the gap grows with cardinality. Shape here is
    scale-honest (guide §2): range-repartition (parallel sort), one
    per-partition count pass (collects n_parts longs), then a
    per-partition ``row_number`` window — no single-partition sort, no
    driver-side value map; only the <= 2*len(ps) picked rows reach the
    driver.

    ``n_rows``: pass the known non-null count to skip the count job.
    Falls back to the builtin for empty/tiny inputs (rank-pick job
    overhead beats the map merge only at real cardinalities).
    """
    import math

    from pyspark.sql import Window

    nn = df.filter(F.col(col).isNotNull())
    n = n_rows if n_rows is not None else nn.count()
    if n < 100_000:
        row = nn.agg(
            F.expr(
                f"percentile({col}, array({','.join(str(p) for p in ps)}))"
            ).alias("q")
        ).collect()[0]
        return [None if row["q"] is None else float(x) for x in row["q"]]
    spark = df.sparkSession
    P = n_parts or spark.sparkContext.defaultParallelism
    parts = nn.repartitionByRange(P, F.col(col)).cache()
    try:
        cnts = {
            r["pid"]: r["cnt"]
            for r in parts.groupBy(
                F.spark_partition_id().alias("pid")
            ).agg(F.count(F.lit(1)).alias("cnt")).collect()
        }
        offs, acc = {}, 0
        for pid in sorted(cnts):
            offs[pid] = acc
            acc += cnts[pid]
        meta, want = {}, set()
        for p in ps:
            pos = p * (n - 1)
            lo, hi = math.floor(pos), math.ceil(pos)
            meta[p] = (pos, lo, hi)
            want |= {lo, hi}
        local_want: dict = {}
        for r in want:
            for pid in sorted(offs):
                if offs[pid] <= r < offs[pid] + cnts[pid]:
                    local_want.setdefault(pid, set()).add(
                        r - offs[pid] + 1
                    )
                    break
        w = Window.partitionBy(F.spark_partition_id()).orderBy(col)
        dfp = parts.withColumn(
            "_pid", F.spark_partition_id()
        ).withColumn("_lrn", F.row_number().over(w))
        cond = None
        for pid, lrns in local_want.items():
            c = (F.col("_pid") == pid) & F.col("_lrn").isin(list(lrns))
            cond = c if cond is None else (cond | c)
        byrank = {
            offs[r["_pid"]] + r["_lrn"] - 1: r[col]
            for r in dfp.filter(cond).collect()
        }
    finally:
        parts.unpersist()
    out = []
    for p in ps:
        pos, lo, hi = meta[p]
        out.append(
            float(byrank[lo]) if hi == lo
            else (hi - pos) * byrank[lo] + (pos - lo) * byrank[hi]
        )
    return out
