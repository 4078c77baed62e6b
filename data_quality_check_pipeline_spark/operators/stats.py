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
