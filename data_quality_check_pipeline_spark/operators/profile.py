"""Profiling aggregates — single-pass ``df.agg`` bundles.

Capability parity with /root/reference/src/profiler.py (completeness, type,
format, uniqueness profiling — each a separate full pandas pass there) and
src/data_contract.py SLAs; here one hash-aggregate job computes every
corpus-level scalar, and the histogram queries are separate small groupBys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exprs import null_or_empty


def completeness(df: DataFrame, cols: list[str] | None = None) -> dict:
    """Null-rate per column under the reference null semantics (profiler.py:
    46-73: NaN ∪ empty ∪ 'nan'). ONE aggregate pass for all columns."""
    cols = cols or [c for c, t in df.dtypes if t != "binary"]
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        aggs.append(F.sum(null_or_empty(c).cast("long")).alias(f"null_{c}"))
    row = df.agg(*aggs).collect()[0]
    total = row["_rows"]
    return {
        "rows": int(total),
        "columns": {
            c: {
                "missing": int(row[f"null_{c}"] or 0),
                "completeness_pct": (
                    100.0 * (total - int(row[f"null_{c}"] or 0)) / total
                    if total
                    else 100.0
                ),
            }
            for c in cols
        },
    }


def uniqueness(df: DataFrame, key: str) -> dict:
    """Duplicate stats on a key (profiler.py:273-290 / data_contract.py:
    112-144 duplicate SLA). count vs approx/exact distinct in one pass."""
    row = df.agg(
        F.count(key).alias("non_null"),
        F.count_distinct(F.col(key)).alias("distinct"),
    ).collect()[0]
    dups = int(row["non_null"]) - int(row["distinct"])
    return {
        "non_null": int(row["non_null"]),
        "distinct": int(row["distinct"]),
        "duplicates": dups,
        "dup_pct": 100.0 * dups / row["non_null"] if row["non_null"] else 0.0,
    }


def histogram(df: DataFrame, col: str, lower: bool = False) -> DataFrame:
    """Value histogram (profiler.py:146-188 phone-format histogram analogue:
    codec / lang / severity distributions). Partial aggregation map-side;
    output is ~cardinality(col) rows."""
    c = F.lower(F.trim(F.col(col))) if lower else F.col(col)
    return (
        df.groupBy(c.alias(col))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc_nulls_last(col))
    )


def reason_histogram(flagged: DataFrame) -> DataFrame:
    """Drop-reason histogram from the reasons array (severity tally parity,
    profiler.py:329-332)."""
    return (
        flagged.select(F.explode("reasons").alias("reason"))
        .groupBy("reason")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("reason"))
    )


def keep_stats(flagged: DataFrame) -> dict:
    """Validation pass/fail summary in one pass (validator.py:309-321)."""
    row = flagged.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.col("keep").cast("long")).alias("kept"),
    ).collect()[0]
    total, kept = int(row["total"]), int(row["kept"] or 0)
    return {
        "total": total,
        "kept": kept,
        "dropped": total - kept,
        "keep_pct": 100.0 * kept / total if total else 100.0,
    }


def freshness(df: DataFrame, ts_col: str, max_age_hours: float = 24.0) -> dict:
    """Freshness SLA (data_contract.py:146-182)."""
    row = df.agg(F.max(F.col(ts_col)).alias("max_ts")).collect()[0]
    import datetime as _dt

    max_ts = row["max_ts"]
    if max_ts is None:
        return {"fresh": False, "max_ts": None}
    if isinstance(max_ts, _dt.date) and not isinstance(
        max_ts, _dt.datetime
    ):
        # DateType columns collect as datetime.date — promote to
        # midnight so the subtraction below is datetime - datetime
        max_ts = _dt.datetime.combine(max_ts, _dt.time.min)
    age_h = (
        _dt.datetime.now(tz=getattr(max_ts, "tzinfo", None)) - max_ts
    ).total_seconds() / 3600.0
    return {"fresh": age_h <= max_age_hours, "max_ts": str(max_ts),
            "age_hours": age_h}


def numeric_summary(df: DataFrame, col: str,
                    relative_error: float = 1e-4) -> dict:
    """IQR bounds + mean/std (statistical_validator.py:35-75). Uses
    approx quantiles (percentile_approx) — the scalable choice; tests use a
    tight relative error."""
    q = df.agg(
        F.percentile_approx(
            F.col(col), [0.25, 0.5, 0.75], int(1 / relative_error)
        ).alias("q"),
        F.mean(F.col(col)).alias("mean"),
        F.stddev(F.col(col)).alias("std"),
    ).collect()[0]
    if q["q"] is None or q["mean"] is None:
        # empty input / all-null column: percentile_approx returns SQL
        # NULL — return an explicit empty summary instead of iterating
        # None (callers like with_iqr_outliers then flag zero rows)
        return {
            "q1": None, "median": None, "q3": None, "iqr": None,
            "mean": None, "std": 0.0, "lower": None, "upper": None,
            "empty": True,
        }
    q1, med, q3 = [float(x) for x in q["q"]]
    iqr = q3 - q1
    return {
        "q1": q1, "median": med, "q3": q3, "iqr": iqr,
        "mean": float(q["mean"]), "std": float(q["std"] or 0.0),
        "lower": q1 - 1.5 * iqr, "upper": q3 + 1.5 * iqr,
    }
