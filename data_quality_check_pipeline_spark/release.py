"""Pre-release QA gate: one verdict over everything a training run is
about to consume.

Production pipelines do not hand a corpus to a trainer because the last
ingest "looked fine" — they gate the RELEASE: the data contract still
holds on the full clean table, no clip is simultaneously clean and
quarantined, the train/test boundary leaks no near-duplicates, and the
profile history shows no unexplained drift. Each of those checks exists
in this engine as its own operator; ``release_check`` composes them
into a single machine-readable verdict with a CI exit code (CLI
``--release-check``), the same role the reference's threshold gate
plays per-run (threshold checks at ingest time; this gates the
artifact). No new data semantics live here — failures cite the
underlying operator's result so the fix path is the operator's own
surface.

Scale shape: the expectations suite is ONE distributed aggregate over
the clean table, the consistency check one semi-join on clip_id, the
leakage check the same capped banded minhash join the audit op uses,
and the drift check reads only the per-batch sketch rows — nothing
here rescans the corpus more than the named checks already would.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .pipeline import (
    CLEAN_TABLE,
    PROFILE_TABLE,
    QUARANTINE_TABLE,
    active_quarantine,
)
from .sources.tables import TableStore


def _derive_profile_config(hist) -> tuple[list[str], dict | None]:
    """Reconstruct (cols, numeric_bins) from the history schema: the
    per-column counters are ``{c}__nulls`` and each numeric column
    carries its full ``lo:hi:nbins`` spec stamp in ``{c}__spec`` (the
    history contract), so the release gate needs no out-of-band record
    of what was profiled."""
    cols = [c[: -len("__nulls")] for c in hist.columns
            if c.endswith("__nulls")]
    spec_cols = [c for c in hist.columns if c.endswith("__spec")]
    numeric: dict = {}
    if spec_cols:
        idx = hist.agg(F.max("batch_idx")).collect()[0][0]
        row = hist.filter(F.col("batch_idx") == idx).select(
            *spec_cols
        ).first()
        for sc in spec_cols:
            v = row[sc] if row is not None else None
            if v:
                lo, hi, nb = v.split(":")
                numeric[sc[: -len("__spec")]] = (
                    float(lo), float(hi), int(nb)
                )
    return cols, (numeric or None)


def release_check(
    spark: SparkSession,
    out_root: str,
    leakage_jaccard: float | None = None,
    psi_threshold: float = 0.25,
    branch: str | None = None,
) -> dict:
    """Run the pre-release checks against ``out_root``; returns
    ``{"ok": bool, "checks": {name: {"ok": ..., ...}}}``.

    Always run: ``clean_table`` (exists, non-empty),
    ``expectations`` (the clips data-contract suite, one aggregate),
    ``quarantine_consistency`` (no clip both clean and actively
    quarantined — a resolved requeue is fine, an unresolved one means
    the tables disagree about the corpus), and — whenever the table
    carries the pack columns — ``pack_completeness`` (no
    ``pack_run IS NULL`` backlog: corrections reset superseded rows'
    chunk identity, and a chunk-addressed trainer would silently skip
    those rows; the fix is ``--repack-tokens``).

    ``leakage_jaccard`` adds the split-leakage check: minhash near-dup
    pairs within the clean table that straddle splits. Requesting it
    against a table with no split column FAILS the check (an asked-for
    gate must never silently pass).

    The drift check runs whenever a profile history exists (its
    presence means profiling was requested); profiled columns and
    numeric bin specs are re-derived from the history itself.

    ``branch``: audit a WAP staging branch's view instead of mainline
    — the AUDIT step of write-audit-publish (every table read resolves
    to its branch head, so the verdict judges exactly what
    ``publish_branch`` would ship)."""
    store = TableStore(spark, out_root, default_branch=branch)
    checks: dict = {}

    if not store.exists(CLEAN_TABLE):
        checks["clean_table"] = {"ok": False, "reason": "missing"}
        return {"ok": False, "checks": checks}
    clean = store.read(CLEAN_TABLE)
    # one aggregate serves both the row count and (when the pack
    # contract is in effect) the unpacked-backlog count
    has_pack = "pack_run" in clean.columns
    agg_cols = [F.count(F.lit(1)).alias("n")]
    if has_pack:
        agg_cols.append(
            F.sum(F.col("pack_run").isNull().cast("long"))
            .alias("unpacked")
        )
    row = clean.agg(*agg_cols).first()
    n_clean = row["n"]
    checks["clean_table"] = {"ok": n_clean > 0, "rows": n_clean}
    # advisory (never fails — reads are delete-applied and correct):
    # shipping with pending merge-on-read deletes means every consumer
    # of the release pays the scan-time anti-join/filter tax and the
    # deleted bytes are still on disk; the materializing compact
    # belongs BEFORE the artifact ships
    pending = store._pending_deletes(
        store.current_snapshot(CLEAN_TABLE)
    )
    if pending:
        checks["pending_mor_deletes"] = {
            "ok": True,
            "pending": len(pending),
            "hint": "run --compact on the table to materialize the "
                    "merge-on-read deletes before shipping",
        }
    if has_pack:
        unpacked = int(row["unpacked"] or 0)
        checks["pack_completeness"] = {
            "ok": unpacked == 0,
            "unpacked": unpacked,
            **(
                {"hint": "run --repack-tokens to pack the backlog"}
                if unpacked
                else {}
            ),
        }

    from .operators.expectations import clips_suite, evaluate_suite

    results, _ = evaluate_suite(clean, clips_suite())
    failed = [r["name"] for r in results if not r["success"]]
    checks["expectations"] = {
        "ok": not failed,
        "total": len(results),
        "failed": failed,
    }

    if store.exists(QUARANTINE_TABLE):
        both = (
            clean.select("clip_id").distinct()
            .join(
                active_quarantine(store.read(QUARANTINE_TABLE))
                .select("clip_id").distinct(),
                "clip_id",
                "left_semi",
            )
            .count()
        )
        checks["quarantine_consistency"] = {
            "ok": both == 0, "clean_and_quarantined": both
        }

    if leakage_jaccard is not None:
        if "split" not in clean.columns:
            checks["split_leakage"] = {
                "ok": False, "reason": "no split column"
            }
        else:
            from .operators.dedup import minhash_lsh_pairs
            from .operators.sampling import split_leakage

            text_col = (
                "transcript_scrubbed"
                if "transcript_scrubbed" in clean.columns
                else "transcript"
            )
            pairs = minhash_lsh_pairs(
                clean.select("clip_id", text_col, "split"),
                "clip_id", text_col,
                min_est_jaccard=leakage_jaccard,
            )
            rep = split_leakage(clean, pairs, "clip_id")
            checks["split_leakage"] = {
                "ok": rep["leaking"] == 0,
                "leaking": rep["leaking"],
                "edges": rep["edges"],
                "min_est_jaccard": leakage_jaccard,
            }

    if store.exists(PROFILE_TABLE):
        from .operators.profile import profile_drift

        hist = store.read(PROFILE_TABLE)
        cols, numeric = _derive_profile_config(hist)
        drift = profile_drift(
            store, PROFILE_TABLE, cols,
            numeric_bins=numeric, psi_threshold=psi_threshold,
        )
        checks["profile_drift"] = {
            "ok": not drift["findings"],
            "batches": drift["batches"],
            "findings": drift["findings"],
        }

    return {
        "ok": all(c["ok"] for c in checks.values()),
        "checks": checks,
    }
