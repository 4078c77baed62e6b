"""Correction re-delivery: corrected clips supersede their stored rows.

A production corpus receives fixed versions of clips it already landed —
re-transcriptions, re-encodes, metadata fixes. The arriving row carries
an EXISTING clip_id and must replace the stored row, not duplicate it
(the dedup family would instead quarantine an arrival-order-dependent
copy) and not bypass quality control (a "correction" can be worse than
the original). Reference parity: the reference engine re-validates every
arrival but has no replace semantics; this composes its validate stage
with TableStore.upsert.

Policy (each step mirrors the ingest path's contracts):

* Only clips currently in ``clips_clean`` are correctable here —
  a fix for a QUARANTINED clip re-enters through the requeue path
  (pipeline.requeue_quarantine), which owns retry bookkeeping; unknown
  clip_ids are reported and skipped, never silently inserted.
* Corrections re-run the FULL scoring/validation path. A correction
  that now fails QC is a DOWNGRADE: the stored row is deleted from
  clips_clean (the corrector just declared its content wrong) and the
  failure routes to quarantine with stage='correction'.
* Corrections re-run the dedup checks against the signature histories
  (minus the corrected clips' own old signatures): a corrected
  transcript that now equals / near-dups ANOTHER retained clip
  quarantines terminally, exactly as it would have at ingest.
* Survivors land via ONE atomic ``upsert`` snapshot. Assignment columns
  the scoring path does not produce are STICKY from the prior row —
  above all ``split``: a corrected clip hopping train -> test is
  eval-set contamination by construction. Packing columns
  (pack_run/pack_shard/chunk_id/start_offset/n_tokens) are instead
  NULLED: the corrected transcript invalidates the token counts, so the
  chunk identity must be re-derived by the next packing run rather than
  silently carried stale.
* Signature histories are brought to corpus truth: removed clips'
  signatures purge (takedown's rule — content that left the corpus
  leaves no dedup memory); landed clips' signatures REPLACE their old
  entries (content hash delete+append, clip_id-keyed tables upsert).
* The last commit is one row in the ``corrections_log`` table; its
  correction_id makes the whole operation idempotent (a crash mid-way
  re-runs commits that are themselves idempotent re-applications).

Ingest-path contrast: batch shards and the streaming sink are
deliberately clip_id-BLIND across batches (no per-batch join against
the ever-growing clean table — at 100 TB that lookup would dominate
the sink). A re-delivered id with identical content is caught by the
content dedup history; a re-delivered id with NEW content is by
definition a correction and must come through THIS op — if it is fed
to ingest instead, the duplicate id lands and the release gate's
``be_unique`` expectation fails the corpus before any trainer sees it
(test_release.py plants exactly that corruption).
"""

from __future__ import annotations

import logging
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.dedup import (
    audio_near_dup_pairs_incremental,
    content_hash_expr,
    dedup_exact_incremental,
    minhash_lsh_pairs_incremental,
    minhash_signatures,
)
from .operators.scrub import scrub_transcripts
from .pipeline import (
    AUDIO_FP_TABLE,
    CLEAN_TABLE,
    CONTENT_HASH_TABLE,
    DUP_AUDIO_REASON,
    DUP_CONTENT_REASON,
    NEARDUP_CONTENT_REASON,
    QUARANTINE_TABLE,
    _find_committed_write,
    flag_clips,
    score_clips,
)
from .sources.tables import TableStore
from .streaming.stream import NEARDUP_SIG_TABLE

_log = logging.getLogger(__name__)

CORRECTIONS_LOG = "corrections_log"
PACK_COLS = ("pack_run", "pack_shard", "chunk_id", "start_offset",
             "n_tokens")


def _new_side(pairs: DataFrame) -> DataFrame:
    """Losing side of (new-vs-history | new-vs-new) pairs — the same
    deterministic routing as the ingest paths (new side loses to
    history; greater clip_id loses new-vs-new)."""
    return pairs.select(
        F.when(F.col("new_a") & ~F.col("new_b"), F.col("id_a"))
        .when(F.col("new_b") & ~F.col("new_a"), F.col("id_b"))
        .otherwise(F.col("id_b"))
        .alias("clip_id")
    ).distinct()


def apply_corrections(
    spark: SparkSession,
    out_root: str,
    corrected: DataFrame,
    correction_id: str,
    with_audio: bool = True,
    near_dup_jaccard: float = 0.8,
    audio_max_hamming: int = 6,
) -> dict:
    """Apply one correction batch; returns a JSON-able report.

    ``corrected`` carries the raw clip schema (clip_id, bytes, sr_hz,
    dur_ms, codec, transcript). clip_ids must be unique and non-NULL.
    """
    from pyspark import StorageLevel

    store = TableStore(spark, out_root)
    report: dict = {
        "correction_id": correction_id,
        "skipped_already_applied": False,
    }
    if _find_committed_write(
        store, CORRECTIONS_LOG, {"correction_id": correction_id}
    ):
        _log.info("correction %s already applied; skipping",
                  correction_id)
        report["skipped_already_applied"] = True
        return report
    if not store.exists(CLEAN_TABLE):
        raise FileNotFoundError(
            f"corrections: no {CLEAN_TABLE} table under {out_root}"
        )

    n_total, n_ids, n_distinct = corrected.agg(
        F.count(F.lit(1)), F.count("clip_id"),
        F.count_distinct("clip_id"),
    ).first()
    if n_ids < n_total or n_distinct < n_ids:
        raise ValueError(
            "corrections: clip_ids must be non-NULL and unique "
            f"({n_total} rows, {n_ids} non-null, {n_distinct} distinct)"
        )
    report["requested"] = n_total

    clean = store.read(CLEAN_TABLE)
    # correctable = currently retained; a quarantined clip's fix goes
    # through requeue (retry bookkeeping lives there), an unknown id is
    # refused (corrections never insert)
    prior = clean.join(
        corrected.select("clip_id"), "clip_id", "left_semi"
    ).persist(StorageLevel.DISK_ONLY)
    known_ids = {r["clip_id"] for r in prior.select("clip_id").collect()}
    unknown = sorted(
        r["clip_id"]
        for r in corrected.select("clip_id")
        .join(clean.select("clip_id"), "clip_id", "left_anti")
        .limit(1001)
        .collect()
    )
    report["n_unknown_skipped"] = n_total - len(known_ids)
    report["unknown_skipped"] = unknown[:1000]
    if not known_ids:
        prior.unpersist()
        report.update({"landed": 0, "removed": 0})
        _commit_log(store, report, correction_id)
        return report
    # correction batches are takedown-sized (delete_where caps its key
    # list at 1M), so the isin literals below are bounded; the row
    # selection itself stays a distributed semi-join
    inc = corrected.join(prior.select("clip_id"), "clip_id", "left_semi")

    # -- re-score through the full path (payload-heavy: DISK_ONLY, the
    # DESIGN.md #40 rule) -------------------------------------------------
    flagged = flag_clips(
        score_clips(inc, with_audio), with_audio
    ).persist(StorageLevel.DISK_ONLY)
    try:
        drop_rows = flagged.filter(~F.col("keep")).select(
            "clip_id", "reasons", "severity"
        )
        kept = flagged.filter(F.col("keep")).drop(
            "reasons", "severity", "keep"
        )
        quarantine_parts = [
            drop_rows.withColumn("stage", F.lit("correction"))
        ]

        # -- dedup checks vs history MINUS the corrected clips' own old
        # signatures (their old content is being retired; self-collisions
        # are not duplicates) ---------------------------------------------
        def _history_minus_own(table: str, key: str) -> DataFrame | None:
            if not store.exists(table):
                return None
            h = store.read(table)
            if key not in h.columns:
                return h
            return h.filter(~F.col(key).isin(sorted(known_ids)))

        old_hashes = [
            r["_h"]
            for r in prior.select(
                content_hash_expr("transcript").alias("_h")
            ).collect()
            if r["_h"] is not None
        ]
        new_hashes = None
        if store.exists(CONTENT_HASH_TABLE):
            hist = store.read(CONTENT_HASH_TABLE)
            if old_hashes:
                hist = hist.filter(
                    ~F.col("text_hash").isin(old_hashes)
                )
            survivors, new_hashes = dedup_exact_incremental(
                kept, hist, "clip_id", "transcript"
            )
            dup = kept.select("clip_id").join(
                survivors.select("clip_id"), "clip_id", "left_anti"
            )
            quarantine_parts.append(_dup_rows(dup, DUP_CONTENT_REASON))
            kept = survivors
        new_sigs = None
        if store.exists(NEARDUP_SIG_TABLE):
            pairs, new_sigs = minhash_lsh_pairs_incremental(
                kept, _history_minus_own(NEARDUP_SIG_TABLE, "clip_id"),
                "clip_id", "transcript",
                min_est_jaccard=near_dup_jaccard, keep_flags=True,
            )
            dup_ids = _new_side(pairs)
            quarantine_parts.append(
                _dup_rows(dup_ids, NEARDUP_CONTENT_REASON)
            )
            kept = kept.join(dup_ids, "clip_id", "left_anti")
            new_sigs = new_sigs.join(dup_ids, "clip_id", "left_anti")
        new_fps = None
        if with_audio and store.exists(AUDIO_FP_TABLE):
            apairs, new_fps = audio_near_dup_pairs_incremental(
                kept, _history_minus_own(AUDIO_FP_TABLE, "clip_id"),
                "clip_id", max_hamming=audio_max_hamming,
                keep_flags=True,
            )
            a_dup = _new_side(apairs)
            quarantine_parts.append(_dup_rows(a_dup, DUP_AUDIO_REASON))
            kept = kept.join(a_dup, "clip_id", "left_anti")
            new_fps = new_fps.join(a_dup, "clip_id", "left_anti")

        # -- build clean-shape rows: scoring cols from the re-run, sticky
        # assignment cols from the prior row, pack cols re-derived later --
        new_rows = scrub_transcripts(kept)
        sticky = [
            c for c in clean.columns if c not in new_rows.columns
        ]
        clean_types = dict(clean.dtypes)
        carry = [c for c in sticky if c not in PACK_COLS]
        if carry:
            new_rows = new_rows.join(
                prior.select("clip_id", *carry), "clip_id", "left"
            )
        for c in sticky:
            if c in PACK_COLS:
                new_rows = new_rows.withColumn(
                    c, F.lit(None).cast(clean_types[c])
                )

        landed_ids = {
            r["clip_id"]
            for r in new_rows.select("clip_id").collect()
        }
        removed_ids = sorted(known_ids - landed_ids)
        report["landed"] = len(landed_ids)
        report["removed"] = len(removed_ids)

        # restrict each per-stage signature frame to the FINALLY landed
        # rows: a clip that survived exact dedup but fell to a LATER
        # stage (minhash / audio near-dup) left the corpus, and content
        # that never landed must leave no dedup memory (takedown's
        # rule — its hash/sig would otherwise block a legitimate future
        # re-upload of text the corpus does not contain)
        if new_hashes is not None:
            new_hashes = new_hashes.join(
                kept.select(
                    content_hash_expr("transcript").alias("text_hash")
                ),
                "text_hash", "left_semi",
            )
        if new_sigs is not None:
            new_sigs = new_sigs.join(
                kept.select("clip_id"), "clip_id", "left_semi"
            )
        if new_fps is not None:
            new_fps = new_fps.join(
                kept.select("clip_id"), "clip_id", "left_semi"
            )

        # -- commits, data first, log marker last --------------------------
        if landed_ids:
            up = store.upsert(
                CLEAN_TABLE, new_rows, "clip_id",
                properties={"correction_id": correction_id},
            )
            if up["aborted"]:
                raise RuntimeError(
                    "corrections: clean upsert lost a commit race — "
                    "re-run (idempotent)"
                )
            report["clean_upsert"] = {
                k: up[k]
                for k in ("snapshot", "n_updated", "dirs_rewritten",
                          "dirs_untouched", "files_rewritten",
                          "files_carried")
            }
        if removed_ids:
            res = store.delete_where(
                CLEAN_TABLE, "clip_id", removed_ids,
                properties={"correction_id": correction_id},
            )
            if res["aborted"]:
                raise RuntimeError(
                    "corrections: clean delete lost a commit race — "
                    "re-run (idempotent)"
                )
            report["clean_deleted"] = res["n_deleted"]

        # signature truth: old entries out, landed survivors' entries in
        if store.exists(CONTENT_HASH_TABLE):
            if old_hashes:
                store.delete_where(
                    CONTENT_HASH_TABLE, "text_hash", old_hashes,
                    properties={"correction_id": correction_id},
                )
            if new_hashes is not None:
                store.write(
                    CONTENT_HASH_TABLE, new_hashes, mode="append",
                    properties={"correction_id": correction_id},
                )
        if store.exists(NEARDUP_SIG_TABLE):
            if removed_ids:
                store.delete_where(
                    NEARDUP_SIG_TABLE, "clip_id", removed_ids,
                    properties={"correction_id": correction_id},
                )
            if new_sigs is None and landed_ids:
                # table appeared between the mining check and here
                # (concurrent first streaming batch) — still keep it
                # truthful; minhash_signatures keys output by id_col
                new_sigs = minhash_signatures(
                    kept, "clip_id", "transcript"
                )
            if new_sigs is not None:
                store.upsert(
                    NEARDUP_SIG_TABLE, new_sigs, "clip_id",
                    properties={"correction_id": correction_id},
                )
        if with_audio and store.exists(AUDIO_FP_TABLE):
            if removed_ids:
                store.delete_where(
                    AUDIO_FP_TABLE, "clip_id", removed_ids,
                    properties={"correction_id": correction_id},
                )
            if new_fps is not None:
                store.upsert(
                    AUDIO_FP_TABLE, new_fps, "clip_id",
                    properties={"correction_id": correction_id},
                )

        # quarantine rows for every non-landing correction
        q = quarantine_parts[0]
        for p in quarantine_parts[1:]:
            q = q.unionByName(p)
        q = q.select(
            "clip_id", "reasons", "severity", "stage",
            F.lit(f"correction_{correction_id}").alias("run_id"),
            F.current_timestamp().alias("ts"),
            F.lit(0).alias("retry_count"),
        )
        if q.limit(1).count():
            store.write(
                QUARANTINE_TABLE, q,
                mode="append"
                if store.exists(QUARANTINE_TABLE) else "overwrite",
                properties={"correction_id": correction_id},
            )
    finally:
        flagged.unpersist()
        prior.unpersist()

    _commit_log(store, report, correction_id)
    return report


def _dup_rows(ids: DataFrame, reason: str) -> DataFrame:
    return ids.select(
        "clip_id",
        F.array(F.lit(reason)).alias("reasons"),
        F.lit("MEDIUM").alias("severity"),
        F.lit("correction_dedup").alias("stage"),
    )


def _commit_log(
    store: TableStore, report: dict, correction_id: str
) -> None:
    spark = store.spark
    row = spark.createDataFrame(
        [
            (
                correction_id,
                int(report.get("requested", 0)),
                int(report.get("landed", 0)),
                int(report.get("removed", 0)),
                int(report.get("n_unknown_skipped", 0)),
                float(time.time()),
            )
        ],
        "correction_id string, requested long, landed long, "
        "removed long, unknown long, ts double",
    )
    store.write(
        CORRECTIONS_LOG, row,
        mode="append" if store.exists(CORRECTIONS_LOG) else "overwrite",
        properties={"correction_id": correction_id},
    )
