"""Temporal / range join operators Spark lacks natively.

The reference engine has no analogue (single-table pandas); these are
the standard custom operators a training-data pipeline needs around
event/metadata tables (brief: "when the reference has an operator Spark
lacks (e.g. as-of join, range join), implement it as a composition of
existing DataFrame ops"):

* ``asof_join``    — nearest-prior (or next) right row per key, the
                     DuckDB/pandas ASOF JOIN. Union + running
                     last(ignorenulls) over one (key, ts) sort: ONE
                     shuffle, no join explosion, no per-key state.
* ``interval_join``— points vs (lo, hi] ranges via bucketized
                     equi-join: each interval explodes into its
                     covering buckets, candidates meet on the bucket
                     key, exact containment filters — never a cross
                     join, with a logged guard on degenerate interval
                     spans.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_log = logging.getLogger("clip_quality.joins")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance_s: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the columns of the ONE
    ``right`` row per ``on`` key that is nearest in time — backward =
    latest right with ``right_ts <= left_ts`` (the common "state as of
    this event" lookup), forward = earliest right with ``right_ts >=
    left_ts``. Equal timestamps match. Unmatched left rows keep the
    right columns NULL.

    Scale shape: tag both inputs, union, and take a running
    ``last(<right payload>, ignorenulls=True)`` over a window sorted by
    (key, ts) — one shuffle on the key, each row visited once, state
    bounded by one payload struct per partition-sort position. This is
    the plan a dedicated ASOF operator would produce; a naive
    "join on key where right_ts <= left_ts then pick max" explodes to
    |matches| rows per pair before aggregating. Skewed keys behave like
    any windowed aggregate (salt upstream if one key dominates).

    ``tolerance_s``: a match farther than this many seconds (older for
    backward, newer for forward) is nulled out, row kept.
    Right columns (minus the key) come back with ``suffix`` appended;
    the matched right timestamp is ``<right_ts><suffix>``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got "
                         f"{direction!r}")
    lcols = [c for c in left.columns]
    rcols = [c for c in right.columns if c not in on]
    if not rcols:
        raise ValueError("right side has no payload columns besides the key")
    overlap = set(lcols) & {c + suffix for c in rcols}
    if overlap:
        raise ValueError(f"suffixed right columns collide with left: "
                         f"{sorted(overlap)}")
    lpay = F.struct(*[F.col(c) for c in lcols]).alias("_lpay")
    rpay = F.struct(*[F.col(c) for c in rcols]).alias("_rpay")
    lt = left.select(
        *[F.col(k) for k in on],
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_src"),
        lpay,
        F.lit(None).cast(
            right.select(rpay).schema["_rpay"].dataType
        ).alias("_rpay"),
    )
    # a NULL-timestamped right row can never be "nearest in time" — and
    # unfiltered it is a live hazard: asc sorts nulls FIRST, so in
    # backward mode it would act as a match-everything state-since
    # -infinity row (DuckDB/pandas ASOF both treat NULL order keys as
    # non-matching)
    rt = right.filter(F.col(right_ts).isNotNull()).select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_src"),
        F.lit(None).cast(
            left.select(lpay).schema["_lpay"].dataType
        ).alias("_lpay"),
        rpay,
    )
    # at equal _ats the right row must sort BEFORE the left row so it is
    # visible to the running last() — _src asc does that in both
    # directions
    order = (
        [F.col("_ats").asc(), F.col("_src").asc()]
        if direction == "backward"
        else [F.col("_ats").desc(), F.col("_src").asc()]
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_rpay", ignorenulls=True).over(w)
    out = (
        lt.unionByName(rt)
        # a NULL-timestamped LEFT row has no position on the time axis:
        # keep the row, null the match (without this, desc sorts nulls
        # LAST and forward mode would hand it the oldest right state)
        .withColumn(
            "_m", F.when(F.col("_ats").isNotNull(), matched)
        )
        .filter(F.col("_src") == 1)
    )
    if tolerance_s is not None:
        # timestamp columns: integer µs diff (NTZ cannot cast to double
        # in Spark 4, and epoch-based math would be session-tz-bound —
        # a DIFFERENCE is tz-free); numeric columns: plain subtraction
        t = dict(out.dtypes)["_ats"]
        if t.startswith("timestamp"):
            gap = (
                F.abs(
                    F.expr(
                        f"timestampdiff(MICROSECOND, _m.{right_ts}, _ats)"
                    )
                ).cast("double")
                / F.lit(1e6)
            )
        else:
            gap = F.abs(
                F.col("_ats").cast("double")
                - F.col(f"_m.{right_ts}").cast("double")
            )
        out = out.withColumn(
            "_m", F.when(gap <= tolerance_s, F.col("_m"))
        )
    return out.select(
        *[F.col(f"_lpay.{c}").alias(c) for c in lcols],
        *[F.col(f"_m.{c}").alias(c + suffix) for c in rcols],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    max_buckets_per_interval: int = 10_000,
    stats_out: dict | None = None,
) -> DataFrame:
    """Inner join of point rows to every interval row whose
    ``[lo_col, hi_col]`` contains ``point_col`` (numeric; cast
    timestamps to epoch first). Spark plans a plain BETWEEN join as
    BroadcastNestedLoopJoin or a cartesian — quadratic. Here each
    interval explodes into the fixed-width buckets it covers and
    candidates meet on the bucket key (equi-join, shuffle bounded by
    bucket occupancy), then exact containment filters.

    ``bucket_width`` tunes the tradeoff: wide buckets -> fewer explode
    rows but larger candidate buckets; aim for the typical interval
    length. Intervals spanning more than ``max_buckets_per_interval``
    buckets (a degenerate open-ended range would explode the index) are
    DROPPED with a logged count (+ ``stats_out`` key
    'oversized_intervals') — the same bounded-join / logged-drop
    contract as the dedup hot-bucket guards. Inverted (hi < lo)
    intervals match nothing and are dropped silently."""
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be > 0 (got {bucket_width})")
    p_b = F.floor(F.col(point_col) / F.lit(bucket_width))
    lo_b = F.floor(F.col(lo_col) / F.lit(bucket_width))
    hi_b = F.floor(F.col(hi_col) / F.lit(bucket_width))
    iv = intervals.filter(F.col(lo_col) <= F.col(hi_col))
    spans = iv.withColumn("_span", hi_b - lo_b + 1)
    n_over = spans.filter(
        F.col("_span") > max_buckets_per_interval
    ).count()
    if stats_out is not None:
        stats_out["oversized_intervals"] = n_over
    if n_over:
        _log.warning(
            "interval_join: dropping %d interval(s) spanning more than "
            "%d buckets (bounded-join guard; widen bucket_width or cap "
            "the ranges)", n_over, max_buckets_per_interval,
        )
        spans = spans.filter(F.col("_span") <= max_buckets_per_interval)
    exploded = spans.drop("_span").withColumn(
        "_b", F.explode(F.sequence(lo_b, hi_b))
    )
    return (
        points.withColumn("_b", p_b)
        .join(exploded, "_b")
        .filter(F.col(point_col).between(F.col(lo_col), F.col(hi_col)))
        .drop("_b")
    )
