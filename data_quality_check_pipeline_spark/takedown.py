"""Compliance takedown: remove named clips from the corpus and
propagate through every table that remembers them.

A production 100-TB training corpus receives removal orders — GDPR
erasure, DMCA, abusive-content takedowns. Dropping the rows from
``clips_clean`` is the easy part; the engine also keeps per-clip STATE
that must be handled deliberately:

* ``content_hash_history`` — exact-dedup memory (text hashes of every
  retained clip; dedup.py:content_hash_expr is the shared identity),
* ``audio_fp_history`` — audio near-dup memory (clip_id, audio_fp),
* ``minhash_sig_history`` — the streaming near-dup signature table
  (clip_id, sig),
* ``clips_quarantine`` — the routing/audit table.

Two policies, matching the two real-world orders:

``mode='purge'`` (GDPR erasure): the clip AND its signatures go. A
later re-upload of the same content is judged on its own — the corpus
has genuinely forgotten it. Physical deletion is two-phase, exactly as
in Iceberg: the delete snapshots stop the data being readable NOW;
``hard=True`` additionally expires old snapshots so the bytes leave
disk (until then, time-travel reads can still see them — the
documented COW contract).

``mode='block'`` (DMCA / abusive content): the clip goes, but its
signatures STAY (and the transcript hash is force-registered if the
table predates dedup), so any re-upload quarantines terminally as a
duplicate. Blocking is signature-based: clips whose transcript was
NULL cannot be content-blocked (reported in the result).

Both modes append a terminal ``takedown`` quarantine marker per
requested clip_id (TERMINAL_REASONS: requeue never re-drives it) and
are idempotent per ``takedown_id`` (derived from mode + the id set;
re-running the same order is a no-op — the marker commit is checked
first, and it is written LAST, so a crash mid-takedown re-runs the
table rewrites, which are themselves no-ops on already-deleted rows).

Both modes' table deletes default to COW rewrites (delete_where);
``defer=True`` switches them to merge-on-read equality-delete files
(delete_keys_mor) — O(keys) commit, zero data I/O, rows unreadable
immediately, bytes erased at the next compact()+expire — the right
lever for point-id orders against un-clustered 100-TB layouts.

Streaming exact-dedup state (watermark state inside the stream's
checkpoint) is NOT purgeable here — it ages out with the watermark; a
checkpoint reset clears it. Reports/metrics artifacts hold aggregates,
not per-clip content, and are left alone. A DSIR selection-model
history (operators/selection.py) IS purgeable despite being aggregate
state — its count histogram is exactly mergeable, so pass
``dsir_model_table=`` and apply_takedown calls
``selection.dsir_model_forget`` itself, BEFORE the clean delete (the
forget needs the removed transcripts the purge destroys) and with the
takedown_id as the idempotency fingerprint; the HLL profile sketches
cannot subtract and age out only by re-profiling.

Reference parity: the reference engine has no takedown analogue (its
rollback_manager.py only moves version pointers); this is part of the
round brief's "operations a large-scale training-data pipeline would
need".
"""

from __future__ import annotations

import hashlib
import logging

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .operators.dedup import content_hash_expr
from .pipeline import (
    AUDIO_FP_TABLE,
    CLEAN_TABLE,
    CONTENT_HASH_TABLE,
    QUARANTINE_TABLE,
    _find_committed_write,
)
from .sources.tables import TableStore
from .streaming.stream import NEARDUP_SIG_TABLE

_log = logging.getLogger("clip_quality.takedown")

TAKEDOWN_REASON = "takedown"
TAKEDOWN_STAGE = "takedown"


def takedown_id_for(clip_ids, mode: str) -> str:
    """Deterministic order id: the same (mode, id set) is the same
    takedown, however the caller batches or orders it."""
    h = hashlib.sha256()
    h.update(mode.encode())
    for c in sorted(set(clip_ids)):
        h.update(b"\x00")
        h.update(str(c).encode())
    return h.hexdigest()[:16]


def apply_takedown(
    spark: SparkSession,
    out_root: str,
    clip_ids,
    mode: str = "purge",
    takedown_id: str | None = None,
    hard: bool = False,
    defer: bool = False,
    orphan_grace_s: float = 3600.0,
    keep_last: int = 1,
    dsir_model_table: str | None = None,
    dsir_text_col: str = "transcript",
    dsir_ks: tuple[int, ...] = (1, 2),
    dsir_n_features: int = 8192,
) -> dict:
    """Execute one takedown order against an out_root. Returns a JSON-
    able report; see the module docstring for the policy semantics.

    ``hard`` (purge only — ValueError with mode='block', whose whole
    point is that signatures and snapshots stay): after the delete
    snapshots commit, expire all but ``keep_last`` snapshots of every
    rewritten table so the removed rows physically leave disk.
    ``orphan_grace_s`` follows expire_snapshots' contract — pass 0 only
    with no concurrent writers. Soft purge first + a scheduled hard
    pass is the production shape (Iceberg: delete + expire_snapshots +
    remove_orphan_files).

    ``dsir_model_table`` (purge only): a DSIR corpus-model history
    (operators/selection.py incremental_dsir_model_run) to forget the
    removed clips from. It runs BEFORE the clean delete — the forget
    needs the removed transcripts, which the purge is about to destroy
    — and must be passed on the FIRST run of the order (after the
    clean rows are gone, the negated histogram can no longer be
    built). ks/n_features must match the model's ingest spec (the spec
    stamp is verified).

    ``defer``: commit every table delete as a merge-on-read
    equality-delete file (TableStore.delete_keys_mor) instead of a COW
    rewrite — O(keys) commit cost, zero data I/O, which is the right
    shape for a point-id order against 100 TB on a layout without
    clip_id clustering or bloom sidecars (where COW honestly rewrites
    the table, DESIGN #41). The rows are unreadable IMMEDIATELY (every
    read anti-joins the key file); the bytes leave disk at the next
    ``compact()`` + ``expire_snapshots`` — the same logical-now /
    physical-later contract as a soft COW purge, just with the data
    I/O moved wholly into maintenance. Incompatible with ``hard``
    (hard's point is immediate physical erasure; schedule the compact
    + a later hard pass instead). Data-restructuring maintenance on
    the touched tables refuses until that compact — the documented
    MOR pending-deletes contract.

    Crash-ordering contract: signature-history commits happen BEFORE
    the clips_clean delete (the hashes that drive them are derived
    FROM clips_clean, so this order makes every crash re-run converge),
    the quarantine marker commits last as the idempotency anchor, and
    a hard purge's snapshot expiry — which runs after the marker — is
    re-driven by a replay of the same order (the one commit the marker
    cannot anchor)."""
    if mode not in ("purge", "block"):
        raise ValueError(f"mode must be 'purge' or 'block', got {mode!r}")
    if hard and mode != "purge":
        raise ValueError(
            "takedown: hard=True is a purge-only option (block mode "
            "keeps signatures AND snapshots so re-uploads stay "
            "quarantined) — got mode='block'"
        )
    if hard and defer:
        raise ValueError(
            "takedown: hard=True needs immediate physical erasure "
            "(COW delete + snapshot expiry); defer=True's point is "
            "zero data I/O at order time — run the deferred takedown, "
            "then compact() + a later hard/expire pass"
        )
    ids = sorted({c for c in clip_ids if c is not None})
    if not ids:
        raise ValueError("takedown: empty clip_id set")
    tid = takedown_id or takedown_id_for(ids, mode)
    store = TableStore(spark, out_root)
    report: dict = {
        "takedown_id": tid, "mode": mode, "requested": len(ids),
        "defer": defer, "tables": {},
        "skipped_already_applied": False,
    }

    def _hard_expire() -> dict:
        expired: dict = {}
        for table in (CLEAN_TABLE, CONTENT_HASH_TABLE,
                      AUDIO_FP_TABLE, NEARDUP_SIG_TABLE):
            if store.exists(table):
                expired[table] = store.expire_snapshots(
                    table, keep_last=keep_last,
                    orphan_grace_s=orphan_grace_s,
                )
        return expired

    # idempotency: the quarantine marker is the LAST commit of a
    # takedown, so its presence proves the whole order applied
    if _find_committed_write(
        store, QUARANTINE_TABLE, {"takedown_id": tid}
    ):
        _log.info("takedown %s already applied; skipping", tid)
        report["skipped_already_applied"] = True
        if hard:
            # the expiry is the one step AFTER the marker — a crash in
            # that window would otherwise leave the purged bytes on
            # disk forever while every re-run reports 'already
            # applied'; expiry is idempotent, so re-drive it here
            report["hard_expired"] = _hard_expire()
        return report

    if not store.exists(CLEAN_TABLE):
        raise FileNotFoundError(
            f"takedown: no {CLEAN_TABLE} table under {out_root}"
        )
    if hard and mode == "purge":
        # fail FAST, before anything commits: release tags pin their
        # snapshots through expire_snapshots (their contract), which
        # here would leave the purged rows' bytes on disk — readable
        # via read(tag=...) — while hard_expired reports success. And
        # the check cannot run later: the quarantine marker is the
        # idempotency anchor, so a post-marker refusal would make the
        # untag-and-re-run a skipped no-op. GDPR erasure must win or
        # fail loudly; a shipped release containing the purged clips
        # is itself a compliance finding — untag it and re-run.
        tagged = {
            t: sorted(store.tags(t))
            for t in (CLEAN_TABLE, CONTENT_HASH_TABLE,
                      AUDIO_FP_TABLE, NEARDUP_SIG_TABLE)
            if store.tags(t)
        }
        if tagged:
            raise ValueError(
                "takedown --hard: release tags pin snapshots that "
                f"would keep the purged rows' bytes on disk: {tagged}"
                " — untag those releases and re-run"
            )
    clean = store.read(CLEAN_TABLE)
    # capture the targets BEFORE the delete rewrites them away: the
    # content hashes drive the history purge/block, and null-transcript
    # targets are reported as unblockable
    target = clean.filter(F.col("clip_id").isin(ids)).select(
        "clip_id", content_hash_expr("transcript").alias("_h")
    )
    rows = target.collect()
    found_ids = {r["clip_id"] for r in rows}
    hashes = sorted({r["_h"] for r in rows if r["_h"] is not None})
    null_text = sorted(
        r["clip_id"] for r in rows if r["_h"] is None
    )
    report["found_in_clean"] = len(found_ids)
    report["not_in_clean"] = len(ids) - len(found_ids)

    def _mor_replayed(table: str) -> str | None:
        """Snapshot id of a pending MOR delete file this order already
        committed on ``table`` (crash between a table delete and the
        quarantine marker): a delete entry's dir is deletes_<sid> of
        the mor_delete snapshot that minted it, whose properties carry
        the takedown_id. Re-running the same delete would be
        semantically harmless (same anti-join twice) but would stack a
        duplicate key file every read pays for until compact."""
        snap = store.current_snapshot(table)
        pending = (snap or {}).get("delete_files") or []
        if not pending:
            return None
        props = {
            r["id"]: r["properties"]
            for r in store.property_records(table)
        }
        for e in pending:
            # predicate deletes (delete_below_mor) carry pred_id, not
            # path, and are never takedown-minted — skip, don't crash
            p = e.get("path")
            if not p:
                continue
            sid = p.split("_", 1)[1]
            if props.get(sid, {}).get("takedown_id") == tid:
                return sid
        return None

    def _delete(table: str, key_col: str, keys) -> None:
        if not store.exists(table):
            report["tables"][table] = {"n_deleted": 0, "snapshot": None}
            return
        if defer:
            # replay guard FIRST, before the empty-keys return: on a
            # crash-replay the derived key set (hashes, found_ids) is
            # empty precisely BECAUSE this order's MOR delete already
            # applied — the committed entry, not the keys, is the truth
            prior = _mor_replayed(table)
            if prior is not None:
                report["tables"][table] = {
                    "mor": True, "snapshot": prior,
                    "n_keys": len(keys), "replayed": True,
                }
                return
        if not keys:
            report["tables"][table] = {"n_deleted": 0, "snapshot": None}
            return
        if defer:
            res = store.delete_keys_mor(
                table, key_col, keys,
                properties={"takedown_id": tid, "takedown_mode": mode},
            )
            report["tables"][table] = {
                "mor": True,
                "snapshot": res["snapshot"],
                "n_keys": res["n_keys"],
                "dirs_in_scope": res["dirs_in_scope"],
            }
            return
        res = store.delete_where(
            table, key_col, keys,
            properties={"takedown_id": tid, "takedown_mode": mode},
        )
        if res["aborted"]:
            raise RuntimeError(
                f"takedown {tid}: {table} delete lost a commit race — "
                "re-run the takedown (it is idempotent)"
            )
        report["tables"][table] = {
            "n_deleted": res["n_deleted"],
            "snapshot": res["snapshot"],
            "dirs_rewritten": res["dirs_rewritten"],
            "dirs_untouched": res["dirs_untouched"],
            "files_rewritten": res["files_rewritten"],
            "files_carried": res["files_carried"],
        }

    # history-table phase FIRST: every input here (the content hashes,
    # the DSIR transcripts) is derived from clips_clean, so these
    # commits must land while clips_clean still holds the target rows —
    # a crash after the clean delete would otherwise re-run with an
    # empty derivation and silently skip the purge/block of the dedup
    # memory (each step below is a no-op on replay once committed)
    if mode == "purge":
        if dsir_model_table is not None and found_ids:
            from .operators.selection import dsir_model_forget

            dsir_model_forget(
                store, dsir_model_table,
                clean.filter(F.col("clip_id").isin(sorted(found_ids))),
                dsir_text_col, ks=dsir_ks, n_features=dsir_n_features,
                source_fingerprint=f"takedown_{tid}",
            )
            report["dsir_model_forgot"] = len(found_ids)
        _delete(CONTENT_HASH_TABLE, "text_hash", hashes)
        _delete(AUDIO_FP_TABLE, "clip_id", ids)
        _delete(NEARDUP_SIG_TABLE, "clip_id", ids)
    else:
        # block: signatures stay; force-register the transcript hashes
        # that are not already in the exact-dedup history (a table that
        # predates --dedup-content, or a clip ingested before it was
        # enabled) so re-uploads quarantine as duplicate_content
        missing = hashes
        if store.exists(CONTENT_HASH_TABLE) and hashes:
            present = {
                r["text_hash"]
                for r in store.read(CONTENT_HASH_TABLE)
                .filter(F.col("text_hash").isin(hashes))
                .collect()
            }
            missing = [h for h in hashes if h not in present]
        if missing:
            store.write(
                CONTENT_HASH_TABLE,
                spark.createDataFrame(
                    [(h,) for h in missing], "text_hash long"
                ),
                mode=(
                    "append" if store.exists(CONTENT_HASH_TABLE)
                    else "overwrite"
                ),
                properties={"takedown_id": tid, "takedown_mode": mode},
            )
        report["blocked_hashes_registered"] = len(missing)
        report["blocked_hashes_total"] = len(hashes)
        report["unblockable_null_transcript"] = null_text

    # clean delete AFTER the history phase (see ordering note above)
    _delete(CLEAN_TABLE, "clip_id", list(found_ids))

    # terminal marker rows for EVERY requested id (also the ones not
    # currently in clips_clean: the order still applies to them — in
    # block mode their signatures may already guard re-uploads, and the
    # audit trail must show the order was processed)
    marker = spark.createDataFrame(
        [(c,) for c in ids], "clip_id string"
    ).select(
        "clip_id",
        F.array(F.lit(TAKEDOWN_REASON)).alias("reasons"),
        F.lit("HIGH").alias("severity"),
        F.lit(TAKEDOWN_STAGE).alias("stage"),
        F.lit(tid).alias("run_id"),
        F.current_timestamp().alias("ts"),
        F.lit(0).alias("retry_count"),
    )
    store.write(
        QUARANTINE_TABLE,
        marker,
        mode="append" if store.exists(QUARANTINE_TABLE) else "overwrite",
        properties={"takedown_id": tid, "takedown_mode": mode},
    )

    if hard:
        report["hard_expired"] = _hard_expire()
    clean_rep = report["tables"][CLEAN_TABLE]
    _log.info(
        "takedown %s (%s%s): %d requested, %s removed from %s",
        tid, mode, " deferred" if defer else "", len(ids),
        clean_rep["n_deleted"] if "n_deleted" in clean_rep
        else f"{clean_rep.get('n_keys', 0)} keys",
        CLEAN_TABLE,
    )
    return report
