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


# ---------------------------------------------------------------------------
# mergeable sketch profiles (the 100-TB profiling path)
# ---------------------------------------------------------------------------
#
# count_distinct / percentile over the whole corpus re-scans everything
# on every run; at 10^12 clips the production pattern is: profile each
# ingest BATCH once into fixed-size mergeable sketches (DataSketches
# HLL via F.hll_sketch_agg — ~2^lg_k bytes regardless of input size),
# persist the per-batch sketch rows, and answer corpus-lifetime
# questions ("distinct speakers ever", "null rate to date") by MERGING
# sketches (hll_union_agg) — no history rescan, ever. The reference
# profiler (profiler.py:273-290) recomputes exact distincts per run;
# this is the scale-correct analogue, with the exact aggregates
# retained above as the small-SF oracle surface.


def sketch_profile(
    df: DataFrame,
    cols: list[str],
    lg_k: int = 12,
    numeric_bins: dict | None = None,
) -> DataFrame:
    """ONE-row mergeable profile of a batch: total rows plus, per
    column, the null count and an HLL sketch (binary) of the non-null
    values. One hash-agg pass, all map-side partial; values are hashed
    via their canonical string form so sketches stay mergeable across
    schema-compatible batches. lg_k=12 -> ~1.6% relative standard
    error in ~4 KiB per column.

    ``numeric_bins`` = {col: (lo, hi, nbins)} additionally records,
    per numeric column, EXACTLY-mergeable distribution state: count /
    sum / sum-of-squares (mean+std via moments), min / max, and a
    fixed-bin histogram with underflow/overflow buckets (nbins+2 longs
    — vector-ADD mergeable, unlike a quantile sketch, and enough for
    the PSI distribution-shift test in profile_drift). Bin edges are
    part of the history contract: every batch must use the same spec."""
    aggs = [F.count(F.lit(1)).alias("rows")]
    for c in cols:
        aggs.append(
            # coalesce: sum over an EMPTY batch is SQL NULL, which
            # would poison the additive merge counters downstream
            F.coalesce(
                F.sum(F.isnull(F.col(c)).cast("long")), F.lit(0)
            ).alias(f"{c}__nulls")
        )
        aggs.append(
            F.hll_sketch_agg(
                F.col(c).cast("string"), F.lit(int(lg_k))
            ).alias(f"{c}__hll")
        )
    for c, (lo, hi, nbins) in (numeric_bins or {}).items():
        if not hi > lo or nbins < 1:
            raise ValueError(
                f"numeric_bins[{c!r}]: need hi > lo and nbins >= 1, "
                f"got ({lo}, {hi}, {nbins})"
            )
        raw = F.col(c).cast("double")
        # NaN is treated as MISSING for the numeric state: one NaN
        # would otherwise poison the additive sum/sumsq for the life
        # of the history (NaN + x = NaN survives every merge)
        v = F.when(~F.isnan(raw), raw)
        # moments are lo-SHIFTED before squaring (mean adds lo back at
        # read-out, variance is shift-invariant): naive sumsq on a
        # large-magnitude column (epoch millis: mean ~1.7e12) loses
        # ~16 digits to cancellation and reads std as 0/garbage
        s = v - F.lit(float(lo))
        width = (float(hi) - float(lo)) / int(nbins)
        # bucket 0 = underflow, 1..nbins = in-range, nbins+1 =
        # overflow. least() clamps the float edge where a value just
        # below hi still floors to nbins (width not exactly
        # representable) — an in-range value must never count as
        # overflow
        idx = (
            # explicit NULL short-circuit: least() SKIPS nulls, so
            # without it a NULL value would fall through to
            # least(NULL, nbins) = nbins and count as in-range
            F.when(v.isNull(), F.lit(None).cast("int"))
            .when(v < F.lit(float(lo)), F.lit(0))
            .when(v >= F.lit(float(hi)), F.lit(int(nbins) + 1))
            .otherwise(
                F.least(
                    F.floor(s / F.lit(width)).cast("int") + F.lit(1),
                    F.lit(int(nbins)),
                )
            )
        )
        aggs.append(
            F.coalesce(F.count(v), F.lit(0)).alias(f"{c}__count")
        )
        aggs.append(
            F.coalesce(F.sum(s), F.lit(0.0)).alias(f"{c}__sum")
        )
        aggs.append(
            F.coalesce(F.sum(s * s), F.lit(0.0)).alias(f"{c}__sumsq")
        )
        aggs.append(F.min(v).alias(f"{c}__min"))
        aggs.append(F.max(v).alias(f"{c}__max"))
        aggs.append(
            F.array(
                *[
                    F.coalesce(
                        F.sum((idx == F.lit(b)).cast("long")),
                        F.lit(0),
                    )
                    for b in range(int(nbins) + 2)
                ]
            ).alias(f"{c}__hist")
        )
        # the FULL spec rides in every row so the history guard can
        # detect changed lo/hi even at an unchanged bin count
        # (max-of-literal keeps the projection a legal aggregate)
        aggs.append(
            F.max(
                F.lit(f"{float(lo)}:{float(hi)}:{int(nbins)}")
            ).alias(f"{c}__spec")
        )
    return df.agg(*aggs)


def _require_profile_cols(profiles: DataFrame, cols: list[str]) -> None:
    """Refuse to merge a history whose rows were profiled with
    DIFFERENT columns: allowMissingColumns reads fill absent counters
    with NULL, sum() would skip them while ``rows`` still counts every
    row, and the resulting null fractions UNDERSTATE reality — masking
    exactly the drift the monitor exists to catch. sketch_profile
    coalesces real counters to 0, so a NULL counter can only mean the
    column was not profiled for that row."""
    if not cols:
        return
    missing = [c for c in cols if f"{c}__nulls" not in profiles.columns]
    if missing:
        raise ValueError(
            f"profile history has no counters for {missing} — these "
            "columns were never profiled; re-profile or query the "
            "recorded columns"
        )
    import functools
    import operator

    bad = profiles.filter(
        functools.reduce(
            operator.or_,
            [F.col(f"{c}__nulls").isNull() for c in cols],
        )
    ).count()
    if bad:
        raise ValueError(
            f"{bad} profile-history row(s) lack counters for some of "
            f"{cols} (profile_cols changed mid-history) — re-profile "
            "or query the common column subset"
        )


def merge_sketch_profiles(
    profiles: DataFrame,
    cols: list[str],
    numeric_bins: dict | None = None,
) -> DataFrame:
    """Fold any number of per-batch profile rows into one: counts add,
    sketches union (register-wise max — commutative, idempotent per
    distinct value, so re-merging overlapping histories never
    double-counts distincts), numeric moments add and histograms
    vector-add (EXACT merges — merged-of-splits equals whole to the
    bit). allowDifferentLgConfigK tolerates a tuned lg_k change
    mid-history."""
    aggs = [F.sum("rows").alias("rows")]
    for c in cols:
        aggs.append(F.sum(f"{c}__nulls").alias(f"{c}__nulls"))
        aggs.append(
            F.hll_union_agg(F.col(f"{c}__hll"), F.lit(True)).alias(
                f"{c}__hll"
            )
        )
    for c, (lo, hi, nbins) in (numeric_bins or {}).items():
        aggs.append(F.sum(f"{c}__count").alias(f"{c}__count"))
        aggs.append(F.sum(f"{c}__sum").alias(f"{c}__sum"))
        aggs.append(F.sum(f"{c}__sumsq").alias(f"{c}__sumsq"))
        aggs.append(F.min(f"{c}__min").alias(f"{c}__min"))
        aggs.append(F.max(f"{c}__max").alias(f"{c}__max"))
        aggs.append(F.max(f"{c}__spec").alias(f"{c}__spec"))
        zeros = F.array(
            *[F.lit(0).cast("long") for _ in range(int(nbins) + 2)]
        )
        aggs.append(
            F.aggregate(
                F.collect_list(f"{c}__hist"),
                zeros,
                lambda acc, h: F.zip_with(acc, h, lambda a, b: a + b),
            ).alias(f"{c}__hist")
        )
    return profiles.agg(*aggs)


def numeric_profile_estimates(
    profile: DataFrame, numeric_bins: dict
) -> DataFrame:
    """Tidy read-out of the numeric state in a (merged) profile row:
    one row per column with count / mean / std (from moments) / min /
    max and the histogram (underflow + nbins + overflow longs)."""
    per_col = []
    for c, (lo, _hi, _nb) in numeric_bins.items():
        n = F.col(f"{c}__count")
        # stored moments are lo-shifted (see sketch_profile): mean
        # adds lo back; variance is shift-invariant
        smean = F.when(n > 0, F.col(f"{c}__sum") / n)
        var = F.when(
            n > 1,
            F.greatest(
                (F.col(f"{c}__sumsq") - F.col(f"{c}__sum") * smean)
                / (n - 1),
                F.lit(0.0),
            ),
        )
        per_col.append(
            F.struct(
                F.lit(c).alias("column"),
                n.alias("count"),
                F.round(smean + F.lit(float(lo)), 6).alias("mean"),
                F.round(F.sqrt(var), 6).alias("std"),
                F.col(f"{c}__min").alias("min"),
                F.col(f"{c}__max").alias("max"),
                F.col(f"{c}__hist").alias("hist"),
            )
        )
    return profile.select(
        F.explode(F.array(*per_col)).alias("s")
    ).select("s.*")


def psi(latest_hist: list, prior_hist: list, eps: float = 1e-4) -> float:
    """Population stability index between two histogram counts over the
    SAME bins: sum((p-q)*ln(p/q)) with epsilon smoothing. Convention:
    < 0.1 stable, 0.1-0.25 moderate shift, > 0.25 major shift."""
    import math

    lt, pt = float(sum(latest_hist)), float(sum(prior_hist))
    if lt == 0 or pt == 0:
        return 0.0
    out = 0.0
    for a, b in zip(latest_hist, prior_hist):
        p = max(a / lt, eps)
        q = max(b / pt, eps)
        out += (p - q) * math.log(p / q)
    return out


def profile_estimates(profile: DataFrame, cols: list[str]) -> DataFrame:
    """Tidy read-out of a (merged) profile row: one row per column with
    null count/fraction and the HLL distinct estimate."""
    rows = F.col("rows")
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__nulls").alias("nulls"),
            F.when(rows > 0, F.col(f"{c}__nulls") / rows)
            .otherwise(F.lit(0.0))
            .alias("null_frac"),
            F.when(
                F.col(f"{c}__hll").isNull(), F.lit(0).cast("long")
            )
            .otherwise(
                F.hll_sketch_estimate(F.col(f"{c}__hll")).cast("long")
            )
            .alias("approx_distinct"),
        )
        for c in cols
    ]
    return profile.select(
        rows.alias("rows"), F.explode(F.array(*per_col)).alias("s")
    ).select("rows", "s.*")


def incremental_profile_run(
    store,
    table: str,
    new_df: DataFrame,
    cols: list[str],
    lg_k: int = 12,
    source_fingerprint: str | None = None,
    numeric_bins: dict | None = None,
) -> bool:
    """Append one sketch-profile row for a new batch to a
    TableStore-backed profile history. Fingerprint-idempotent like the
    dedup signature histories: an exact replay of an already-profiled
    batch is skipped (returns False) so at-least-once ingest never
    double-counts rows/nulls (sketch union would forgive double
    counting of distincts, but the additive counters would not).

    The guard checks the LAST commit only — sufficient for a
    single-writer history. When several writers share one table
    (batch shards + stream batches), use a commit-record scan instead
    (the pipeline and stream sink both do: _find_committed_write /
    batch_committed), or an interleaved append defeats the skip."""
    if (
        source_fingerprint is not None
        and store.exists(table)
        and store.is_unchanged(table, source_fingerprint)
    ):
        return False
    append_profile_row(
        store, table, new_df, cols, lg_k=lg_k,
        numeric_bins=numeric_bins,
        properties=(
            {"source_fingerprint": source_fingerprint}
            if source_fingerprint is not None
            else None
        ),
    )
    return True


def append_profile_row(
    store,
    table: str,
    new_df: DataFrame,
    cols: list[str],
    lg_k: int = 12,
    properties: dict | None = None,
    numeric_bins: dict | None = None,
) -> None:
    """The ONE profile-append implementation (callers bring their own
    replay guard: last-commit fingerprint here, commit-record scans in
    the pipeline/stream sinks): stamp a monotone batch ordinal so
    profile_drift can split latest-vs-prior, and ALWAYS append —
    TableStore treats an append with no current snapshot as creation
    under the manifest lock, whereas a conditional exists()/overwrite
    would let two concurrent first writers (stream batch racing a
    pipeline shard into a fresh out_root) clobber each other's row."""
    idx = (
        store.read(table).agg(F.max("batch_idx")).collect()[0][0] + 1
        if store.exists(table)
        else 0
    )
    store.write(
        table,
        sketch_profile(
            new_df, cols, lg_k=lg_k, numeric_bins=numeric_bins
        ).withColumn("batch_idx", F.lit(int(idx))),
        mode="append",
        properties=properties,
    )


def corpus_profile(
    store,
    table: str,
    cols: list[str],
    numeric_bins: dict | None = None,
) -> DataFrame:
    """Corpus-lifetime profile from the persisted per-batch sketch rows:
    merge + estimate, never rescanning the corpus itself. Raises if the
    history was profiled with different columns (see
    _require_profile_cols). With ``numeric_bins``, returns the numeric
    read-out (count/mean/std/min/max/hist) for those columns instead."""
    rows = store.read(table)
    _require_profile_cols(rows, cols)
    if numeric_bins:
        _require_numeric_cols(rows, numeric_bins)
        return numeric_profile_estimates(
            merge_sketch_profiles(
                rows, [], numeric_bins=numeric_bins
            ),
            numeric_bins,
        )
    return profile_estimates(merge_sketch_profiles(rows, cols), cols)


def quantile_edges_from_history(
    profiles: DataFrame, col: str, n_bins: int,
    probs: list[float] | None = None,
) -> list[float]:
    """Derive PINNED quality-curriculum bin edges for ``col`` from a
    sketch-profile history's numeric distribution state — the
    principled source for ``curriculum_filter(edges=...)`` /
    ``--curriculum-edges`` once a corpus has been profiled: the
    streaming sink REQUIRES pinned edges (a micro-batch is not a corpus
    to derive quantiles from), and until now they had to be chosen by
    hand. With this, yesterday's corpus profile calibrates today's
    curriculum, shard- and path-invariantly, WITHOUT rescanning any
    data — the history rows are fixed-size mergeable state, so the
    derivation cost is independent of corpus size (the 10^12-clip
    shape).

    Edges are the (1/n .. (n-1)/n) quantiles (``probs`` overrides) of
    the EXACTLY-merged fixed-bin histogram, linearly interpolated
    within the containing bucket; the underflow/overflow buckets
    interpolate against the recorded true min/max. Accuracy is bounded
    by the recorded bin width (the ``--profile-numeric lo:hi:nbins``
    contract) — tighten nbins when calibrating curricula. Heavily
    concentrated distributions can yield duplicate edges; the
    curriculum's non-descending-edges contract collapses them into
    fewer occupied bins, same as derived quantiles would.

    Raises ValueError when the history carries no (consistent) numeric
    state for ``col`` — same contract as the drift guard."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    if probs is None:
        probs = [i / n_bins for i in range(1, n_bins)]
    if any(not 0.0 < p < 1.0 for p in probs):
        raise ValueError(f"probs must lie strictly in (0, 1): {probs}")
    if (
        f"{col}__hist" not in profiles.columns
        or f"{col}__spec" not in profiles.columns
    ):
        raise ValueError(
            f"profile history has no numeric state for {col!r} — "
            "profile it with numeric_bins/--profile-numeric first"
        )
    specs = [
        r[0]
        for r in profiles.select(f"{col}__spec").distinct().collect()
    ]
    if len(specs) != 1 or not specs[0]:
        raise ValueError(
            f"profile history holds {len(specs)} distinct bin specs for "
            f"{col!r} ({specs}) — the bin edges are part of the history "
            "contract"
        )
    lo_s, hi_s, nb_s = specs[0].split(":")
    lo, hi, nbins = float(lo_s), float(hi_s), int(nb_s)
    merged = merge_sketch_profiles(
        profiles, [], {col: (lo, hi, nbins)}
    ).collect()[0]
    cnt = int(merged[f"{col}__count"] or 0)
    if cnt == 0:
        raise ValueError(
            f"profile history records no non-null values for {col!r}"
        )
    hist = list(merged[f"{col}__hist"])
    vmin = float(merged[f"{col}__min"])
    vmax = float(merged[f"{col}__max"])
    width = (hi - lo) / nbins
    # bucket b spans [bounds[b], bounds[b+1]): underflow against the
    # true min, overflow against the true max
    bounds = (
        [min(vmin, lo), lo]
        + [lo + width * i for i in range(1, nbins)]
        + [hi, max(vmax, hi)]
    )
    edges: list[float] = []
    for p in probs:
        rank = p * cnt
        cum = 0.0
        edge = vmax
        for b, h in enumerate(hist):
            if h and cum + h >= rank:
                frac = (rank - cum) / h
                left, right = bounds[b], bounds[b + 1]
                edge = left + frac * (right - left)
                break
            cum += h
        edges.append(float(edge))
    return edges


def _require_numeric_cols(profiles: DataFrame, numeric_bins: dict) -> None:
    """Same mid-history-change guard as _require_profile_cols, for the
    numeric state (a NULL count counter or a missing/short histogram
    means the column or its bin spec changed)."""
    if not numeric_bins:
        return
    missing = [
        c
        for c in numeric_bins
        # __spec too: a history written before spec stamping existed
        # must degrade via ValueError, not die on an unresolved-column
        # AnalysisException in the filter below
        if f"{c}__hist" not in profiles.columns
        or f"{c}__spec" not in profiles.columns
    ]
    if missing:
        raise ValueError(
            f"profile history has no numeric state for {missing} — "
            "re-profile or query the recorded columns"
        )
    import functools
    import operator

    bad = profiles.filter(
        functools.reduce(
            operator.or_,
            [
                F.col(f"{c}__count").isNull()
                # the stamped spec detects changed lo/hi even when
                # nbins (and so the array length) stayed the same
                | (
                    F.coalesce(F.col(f"{c}__spec"), F.lit(""))
                    != F.lit(
                        f"{float(spec[0])}:{float(spec[1])}:"
                        f"{int(spec[2])}"
                    )
                )
                for c, spec in numeric_bins.items()
            ],
        )
    ).count()
    if bad:
        raise ValueError(
            f"{bad} profile-history row(s) lack numeric state or use "
            f"a different bin spec for some of {list(numeric_bins)} — "
            "the bin edges are part of the history contract"
        )


def profile_drift(
    store,
    table: str,
    cols: list[str],
    null_jump: float = 0.1,
    rows_band: tuple[float, float] = (0.5, 2.0),
    novelty_low: float | None = None,
    novelty_high: float | None = None,
    numeric_bins: dict | None = None,
    psi_threshold: float | None = 0.25,
) -> dict:
    """Drift check of the LATEST profiled batch against the merged
    history before it — the schema/values-level analogue of the
    keep-rate trend alert, answerable entirely from the sketch rows
    (no corpus rescan):

    * ``null_jump``   — a column's latest-batch null fraction moved
      more than this from the historical fraction (schema/extract
      regressions surface here first);
    * ``rows_band``   — latest batch row count vs the mean historical
      batch outside [lo, hi]× (a collapsed or doubled ingest);
    * ``novelty_low`` — fraction of the latest batch's non-null values
      NEVER seen before (sketch-estimated: distinct(all) −
      distinct(history), clamped at 0) fell below this: a re-ingest /
      stuck-upstream signature (everything already known);
    * ``novelty_high``— novelty above this: a cardinality shift (ids
      leaking into a categorical column, format change);
    * ``numeric_bins``/``psi_threshold`` — PSI between the latest
      batch's fixed-bin histogram and the merged prior histogram per
      numeric column (industry convention: > 0.25 = major
      distribution shift) — the numeric-shape test null rates and
      distinct counts cannot see (e.g. SNR silently degrading).

    Returns ``{"batches": n, "findings": [...]}``; empty findings =
    healthy, fewer than 2 batches = nothing to compare (no findings).
    Driver-side over one tiny row per batch; the only Spark work is
    the sketch merges."""
    if not store.exists(table):
        return {"batches": 0, "findings": []}
    # one tiny row per batch, consumed by ~8 actions below (counts,
    # guards, three merges, the PSI merges): cache for the call
    rows = store.read(table).cache()
    try:
        return _profile_drift_impl(
            rows, cols, null_jump, rows_band, novelty_low,
            novelty_high, numeric_bins, psi_threshold,
        )
    finally:
        rows.unpersist()


def _profile_drift_impl(
    rows, cols, null_jump, rows_band, novelty_low, novelty_high,
    numeric_bins, psi_threshold,
) -> dict:
    n_batches = rows.count()
    if n_batches < 2:
        return {"batches": n_batches, "findings": []}
    _require_profile_cols(rows, cols)
    # batch_idx is assigned outside the manifest lock, so two writers
    # committing concurrently (a stream batch racing a pipeline shard)
    # can mint the same idx; the split below then treats the colliding
    # batches as ONE latest group — a granularity artifact, not a
    # counter corruption (their rows merge, nothing double-counts)
    latest_idx = rows.agg(F.max("batch_idx")).collect()[0][0]
    latest = rows.filter(F.col("batch_idx") == latest_idx)
    history = rows.filter(F.col("batch_idx") != latest_idx)

    def _est(df: DataFrame) -> dict:
        merged = merge_sketch_profiles(df, cols)
        return {
            r["column"]: r
            for r in profile_estimates(merged, cols).collect()
        }
    e_latest = _est(latest)
    e_hist = _est(history)
    e_all = _est(rows)
    hist_batches = history.select("rows").collect()
    mean_rows = sum(r["rows"] for r in hist_batches) / len(hist_batches)
    findings: list[dict] = []
    any_col = next(iter(cols))
    latest_rows = e_latest[any_col]["rows"]
    ratio = latest_rows / mean_rows if mean_rows else float("inf")
    if not rows_band[0] <= ratio <= rows_band[1]:
        findings.append({
            "column": None, "kind": "rows_out_of_band",
            "value": round(ratio, 4), "bound": list(rows_band),
        })
    for c in cols:
        dn = abs(e_latest[c]["null_frac"] - e_hist[c]["null_frac"])
        if dn > null_jump:
            findings.append({
                "column": c, "kind": "null_frac_jump",
                "value": round(dn, 4), "bound": null_jump,
            })
        non_null = latest_rows - e_latest[c]["nulls"]
        if non_null > 0 and (
            novelty_low is not None or novelty_high is not None
        ):
            novel = max(
                0,
                e_all[c]["approx_distinct"]
                - e_hist[c]["approx_distinct"],
            )
            frac = novel / non_null
            if novelty_low is not None and frac < novelty_low:
                findings.append({
                    "column": c, "kind": "novelty_collapse",
                    "value": round(frac, 4), "bound": novelty_low,
                })
            if novelty_high is not None and frac > novelty_high:
                findings.append({
                    "column": c, "kind": "novelty_spike",
                    "value": round(frac, 4), "bound": novelty_high,
                })
    if numeric_bins and psi_threshold is not None:
        # an incompatible numeric history (pre-flag rows, changed bin
        # spec, a writer configured without numeric state) must NOT
        # discard the categorical findings already computed above —
        # it surfaces as its own finding so the alert names the
        # problem instead of drift silently never running again
        try:
            _require_numeric_cols(rows, numeric_bins)
        except ValueError as exc:
            findings.append({
                "column": None,
                "kind": "numeric_history_incompatible",
                "value": str(exc), "bound": None,
            })
        else:

            def _hists(df: DataFrame) -> dict:
                row = merge_sketch_profiles(
                    df, [], numeric_bins=numeric_bins
                ).collect()[0]
                return {
                    c: list(row[f"{c}__hist"]) for c in numeric_bins
                }

            h_latest = _hists(latest)
            h_prior = _hists(history)
            for c in numeric_bins:
                v = psi(h_latest[c], h_prior[c])
                if v > psi_threshold:
                    findings.append({
                        "column": c, "kind": "distribution_psi",
                        "value": round(v, 4), "bound": psi_threshold,
                    })
    return {"batches": n_batches, "findings": findings}


def alert_profile_drift(drift: dict, severity: str = "HIGH") -> list[str]:
    """Route non-empty drift findings through the notification
    transports (same channel as the keep-rate trend alert)."""
    if not drift.get("findings"):
        return []
    from ..notify import notify

    msg = "; ".join(
        f"{f['kind']}({f['column'] or 'batch'})={f['value']}"
        f" bound={f['bound']}"
        for f in drift["findings"]
    )
    return notify(severity, f"profile drift: {msg}")
