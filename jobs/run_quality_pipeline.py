"""spark-submit entry point for the clip-quality pipeline.

Cluster usage (north rule: spark-submit --py-files on multi-executor
clusters):

    zip -r pkg.zip data_quality_check_pipeline_spark
    spark-submit --py-files pkg.zip jobs/run_quality_pipeline.py \
        --input /data/clips_parquet --out /data/quality_out \
        --shards 64 --fingerprint <source-snapshot-id>

Local smoke:

    python jobs/run_quality_pipeline.py --synthetic 5000 --out /tmp/q_out
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def source_fingerprint(path: str) -> str:
    """Content fingerprint of the input (parity: SHA-256 idempotency check,
    reference rollback_manager.py:142-163) from file names+sizes+mtimes —
    no data read."""
    h = hashlib.sha256()
    if os.path.isdir(path):
        # FULL recursive walk: a top-level listdir would miss rewrites
        # nested >= 2 levels deep (lang=/date=/part-*.parquet backfills)
        # and falsely skip the run as "source unchanged"
        for root, dirs, files in sorted(os.walk(path)):
            dirs.sort()
            for n in sorted(files):
                fp = os.path.join(root, n)
                st = os.stat(fp)
                rel = os.path.relpath(fp, path)
                h.update(
                    f"{rel}:{st.st_size}:{st.st_mtime_ns}".encode()
                )
    else:
        st = os.stat(path)
        h.update(
            f"{os.path.basename(path)}:{st.st_size}:"
            f"{st.st_mtime_ns}".encode()
        )
    return h.hexdigest()[:16]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="clips parquet path (or Iceberg table)")
    ap.add_argument("--out", required=True, help="output table root")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic clips instead of --input")
    ap.add_argument("--shards", type=int, default=1)
    ap.add_argument("--run-id", default="")
    ap.add_argument("--fingerprint", default="")
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--no-review", action="store_true")
    ap.add_argument("--review-file", default=None)
    ap.add_argument("--interactive-review", action="store_true",
                    help="when the gate needs a decision and no "
                         "--review-file is set, prompt on the terminal "
                         "([C/D/Q/H], auto-timeout) instead of applying "
                         "the timeout action immediately; non-TTY stdin "
                         "degrades to the timeout action")
    ap.add_argument("--cores", default=None)
    ap.add_argument("--pushgateway", default=None, metavar="URL",
                    help="Prometheus pushgateway base URL; run metrics "
                         "are PUT to <URL>/metrics/job/clip_quality")
    ap.add_argument("--list-versions", action="store_true",
                    help="list clips_clean snapshots and exit")
    ap.add_argument("--rollback", default=None, metavar="SNAPSHOT_ID",
                    help="roll clips_clean back to a snapshot and exit")
    ap.add_argument("--tag", default=None, metavar="NAME",
                    help="pin a release tag on clips_clean (current "
                         "snapshot, or --tag-snapshot SID) and exit; "
                         "tagged snapshots survive --expire-snapshots "
                         "and --export-snapshot accepts the tag name")
    ap.add_argument("--tag-snapshot", default=None, metavar="SID",
                    help="with --tag: tag this snapshot instead of "
                         "the current one")
    ap.add_argument("--untag", default=None, metavar="NAME",
                    help="drop a clips_clean release tag and exit "
                         "(the snapshot becomes expirable again)")
    ap.add_argument("--compact", default=None, metavar="TABLE",
                    help="rewrite TABLE's current view as one snapshot "
                         "dir (small-file compaction for append-heavy "
                         "history tables, e.g. content_hash_history / "
                         "audio_fp_history) and exit")
    ap.add_argument("--compact-cluster-by", default=None,
                    metavar="COL[,COL...]",
                    help="with --compact: sort-order cluster the rewrite "
                         "by these columns (disjoint per-file key ranges "
                         "-> selective min/max scan pruning, e.g. "
                         "clip_id for takedown lookups); omitted = keep "
                         "the table's recorded clustering")
    ap.add_argument("--compact-zorder", default=None,
                    metavar="COL[,COL...]",
                    help="with --compact: Z-ORDER the rewrite on these "
                         "numeric/timestamp columns (Morton-interleaved "
                         "quantile buckets -> min/max pruning selective "
                         "on EVERY listed column, where a linear sort "
                         "only serves the leading key; e.g. "
                         "snr_db,dur_ms for quality-band range scans); "
                         "mutually exclusive with --compact-cluster-by")
    ap.add_argument("--compact-bloom", default=None,
                    metavar="COL[,COL...]",
                    help="with --compact: record per-file key-membership "
                         "bloom sidecars for these columns on the rewrite "
                         "(and on every later append/COW snapshot) — "
                         "bounds point-id maintenance (takedown/"
                         "correction COW, id lookups) on ANY layout, "
                         "including hash-sharded dirs where min/max "
                         "stats span the id domain; omitted = keep the "
                         "table's recorded bloom spec")
    ap.add_argument("--rename-column", default=None,
                    metavar="TABLE:OLD:NEW",
                    help="maintenance op (exits after): rename a "
                         "column WITHOUT rewriting data (Iceberg "
                         "schema evolution: metadata-only; reads map "
                         "old-name files at scan time, retroactively "
                         "across time travel). Partition columns "
                         "refuse; file-level COW ops refuse until one "
                         "--compact normalizes the files")
    ap.add_argument("--show-meta", default=None,
                    metavar="TABLE[:KIND]",
                    help="maintenance op (exits after): print a "
                         "metadata table (snapshots | files | refs | "
                         "history | deletes; default snapshots) — the "
                         "Iceberg tbl.snapshots/files/refs analogue, "
                         "driver-side metadata only (deletes = pending "
                         "merge-on-read delete entries)")
    ap.add_argument("--drop-column", default=None,
                    metavar="TABLE:COL",
                    help="maintenance op (exits after): drop a column "
                         "WITHOUT rewriting data (metadata-only; reads "
                         "select it out per pre-drop dir). NOT erasure "
                         "— the bytes stay until --compact + "
                         "--expire-snapshots (the takedown-hard "
                         "two-step, stated not hidden)")
    ap.add_argument("--adopt-files", default=None, nargs=2,
                    metavar=("TABLE", "SRC_DIR"),
                    help="maintenance op (exits after): adopt an "
                         "existing parquet directory as a snapshot of "
                         "TABLE WITHOUT copying data (Iceberg "
                         "add_files: files hard-link into the snap "
                         "dir, stats come from footers) — the 100-TB "
                         "path for bringing already-landed corpora "
                         "under snapshot governance; idempotent per "
                         "unchanged source; appends to the current "
                         "view")
    ap.add_argument("--backfill-blooms", default=None,
                    metavar="TABLE:COL[,COL...]",
                    help="add bloom sidecars to an EXISTING table "
                         "WITHOUT rewriting data (the 100-TB shape vs "
                         "--compact-bloom's full rewrite): one "
                         "distributed key-column scan per snapshot "
                         "dir, sidecars land in place, no new snapshot "
                         "— incremental anchors/changelogs untouched; "
                         "idempotent; exits after")
    ap.add_argument("--binpack", default=None,
                    metavar="TABLE",
                    help="maintenance op (exits after): incremental "
                         "small-file compaction — merge ONLY data "
                         "files under --binpack-small-bytes; bigger "
                         "files hard-link forward untouched (cost "
                         "proportional to the small-file bytes, not "
                         "the table — the routine maintenance op "
                         "--compact is too expensive to be)")
    ap.add_argument("--binpack-small-bytes", type=int,
                    default=64 * 1024 * 1024,
                    help="with --binpack: files below this size merge "
                         "(default 64 MiB)")
    ap.add_argument("--fsck", default=None,
                    metavar="TABLE|all",
                    help="maintenance op (exits after): physical "
                         "integrity audit — manifest vs filesystem vs "
                         "bloom sidecars vs tag/branch refs (missing/"
                         "empty/unlisted data files, dangling refs); "
                         "read-only, one JSON verdict per table, exit 3 "
                         "on any error-level finding")
    ap.add_argument("--fsck-deep", action="store_true",
                    help="with --fsck: also re-open every listed "
                         "file's parquet FOOTER (metadata-only) and "
                         "compare num_rows to the manifest — catches "
                         "replaced/truncated files")
    ap.add_argument("--delete-below", default=None,
                    metavar="TABLE:COL:CUTOFF",
                    help="maintenance op (exits after): predicate "
                         "retention delete — copy-on-write remove every "
                         "row with COL < CUTOFF (NULLs survive). "
                         "Per-file footer stats + manifest null counts "
                         "classify files: wholly-dead files DROP with "
                         "zero bytes read (the metadata-delete fast "
                         "path on age-clustered layouts), clean files "
                         "hard-link forward, only boundary files "
                         "rewrite. CUTOFF parses as int, float, ISO "
                         "timestamp, then string. Physical erasure "
                         "still needs --expire-snapshots")
    ap.add_argument("--delete-below-defer", action="store_true",
                    help="with --delete-below: commit as a merge-on-"
                         "read PREDICATE delete (manifest-only, O(1) "
                         "commit, zero file I/O on ANY layout); reads "
                         "filter at scan time until --compact "
                         "materializes it. The retention lever when "
                         "the layout is not age-clustered and COW "
                         "would rewrite the table")
    ap.add_argument("--expire-snapshots", default=None,
                    metavar="TABLE|all",
                    help="version GC as a scheduled maintenance op: drop "
                         "all but the newest --expire-keep snapshots of "
                         "TABLE ('all' = every table under --out) and "
                         "delete data files no survivor references; "
                         "crash/replay idempotency memory is retained "
                         "(expired_props). PHYSICAL erasure of COW-"
                         "deleted rows happens here — takedown --hard "
                         "runs the same pass inline")
    ap.add_argument("--expire-keep", type=int, default=5,
                    help="with --expire-snapshots: snapshots to retain "
                         "per table (default 5, the reference's policy)")
    ap.add_argument("--expire-grace", type=float, default=3600.0,
                    metavar="SECONDS",
                    help="with --expire-snapshots: leave unreferenced "
                         "snap dirs younger than this alone (a "
                         "concurrent writer's data lands before its "
                         "manifest commit); 0 only with no concurrent "
                         "writers")
    ap.add_argument("--requeue", action="store_true",
                    help="re-drive quarantined clips instead of a full run")
    ap.add_argument("--stream", action="store_true",
                    help="drain --input as a Structured Stream "
                         "(availableNow micro-batches) instead of a batch "
                         "run; checkpoint under <out>/_stream_ckpt")
    ap.add_argument("--stream-content-dedup", action="store_true",
                    help="with --stream: also drop exact-content "
                         "re-uploads (same normalized transcript under a "
                         "new clip_id) within the dedup watermark")
    ap.add_argument("--stream-near-dup", action="store_true",
                    help="with --stream: quarantine minhash NEAR-dup "
                         "re-uploads (small transcript edits) against a "
                         "persisted signature-history table "
                         "(minhash_sig_history under <out>)")
    ap.add_argument("--stream-audio-near-dup", action="store_true",
                    help="with --stream: quarantine audio-fingerprint "
                         "near-dup re-uploads (re-encodes with rewritten "
                         "transcripts) against the shared "
                         "audio_fp_history table under <out>; radius "
                         "from --dedup-audio-max-hamming")
    ap.add_argument("--dedup-content", action="store_true",
                    help="batch runs: quarantine kept clips whose exact "
                         "normalized transcript was already retained "
                         "(this run or any earlier run into <out>; "
                         "history table content_hash_history)")
    ap.add_argument("--dedup-audio", action="store_true",
                    help="batch runs: quarantine kept clips whose audio "
                         "spectral fingerprint near-dups an already-"
                         "retained clip (history table audio_fp_history)")
    ap.add_argument("--dedup-audio-max-hamming", type=int, default=6,
                    metavar="N",
                    help="with --dedup-audio: fingerprint hamming "
                         "radius counted as a near-dup (default 6; the "
                         "synthetic tone corpus is fingerprint-"
                         "degenerate, use 0 there)")
    ap.add_argument("--dedup-quality-col", default=None, metavar="COL",
                    help="with --dedup-content: keep the within-run dup "
                         "group's argmax of this score column (e.g. "
                         "snr_db) instead of min clip_id")
    ap.add_argument("--decontam-heldout", default=None, metavar="PATH",
                    help="batch runs: parquet of heldout/benchmark "
                         "texts; kept clips whose transcript shares a "
                         "word n-gram with any heldout row quarantine "
                         "terminally (reason eval_contamination; runs "
                         "BEFORE dedup so contaminated clips leave no "
                         "signature history)")
    ap.add_argument("--decontam-text-col", default="text", metavar="COL",
                    help="text column in the --decontam-heldout parquet "
                         "(default: text)")
    ap.add_argument("--decontam-k", type=int, default=8, metavar="K",
                    help="contamination n-gram length in words "
                         "(default 8)")
    ap.add_argument("--decontam-min-hits", type=int, default=1,
                    metavar="N",
                    help="distinct shared n-grams needed to flag a clip "
                         "(default 1)")
    ap.add_argument("--sample-lang", default=None, metavar="L=R,...",
                    help="deterministic per-language mixture sampling "
                         "of the kept branch, e.g. en=0.3,de=1.0 — "
                         "decisions hash clip_id (stable across "
                         "shards/retries/requeues); sampled-out clips "
                         "are counted, not quarantined")
    ap.add_argument("--sample-default-rate", type=float, default=1.0,
                    metavar="R",
                    help="with --sample-lang: rate for unlisted/NULL "
                         "languages (default 1.0 = keep)")
    ap.add_argument("--sample-seed", type=int, default=0)
    ap.add_argument("--sample-temperature", type=float, default=None,
                    metavar="ALPHA",
                    help="temperature mixture instead of explicit "
                         "rates: per-lang keep rates derived from "
                         "count(lang)**ALPHA over the kept branch "
                         "(0=uniform, 1=natural; 0.3-0.7 up-weights "
                         "tail languages). With --stream the rates pin "
                         "at stream start from the LANDED clean "
                         "table's lang counts (refused on an empty "
                         "out_root); mutually exclusive with "
                         "--sample-lang")
    ap.add_argument("--sample-dsir-target", default=None, metavar="PARQUET",
                    help="DSIR domain-targeted selection: keep the "
                         "--sample-dsir-frac of kept clips whose hashed-"
                         "n-gram transcript profile best matches this "
                         "target-domain parquet (importance resampling, "
                         "Gumbel-threshold mode). Runs before dedup; "
                         "composes with the mixture/curriculum filters "
                         "(own hash domains). With --stream the model "
                         "and cutoff pin at stream start from the "
                         "LANDED clean table (refused on an empty "
                         "out_root)")
    ap.add_argument("--sample-dsir-frac", type=float, default=None,
                    metavar="F",
                    help="with --sample-dsir-target: fraction of scored "
                         "clips to keep, in (0, 1]")
    ap.add_argument("--sample-dsir-text-col", default="text",
                    metavar="COL",
                    help="text column in the target parquet "
                         "(default: text)")
    ap.add_argument("--sample-dsir-temperature", type=float, default=1.0,
                    metavar="T",
                    help="selection sharpness: >1 flattens toward "
                         "uniform, <<1 approaches arg-top-k by weight "
                         "(default 1.0)")
    ap.add_argument("--curriculum", default=None,
                    metavar="COL=R0,R1,...",
                    help="quality-curriculum sampling of the kept "
                         "branch: quantile-bin COL into len(rates) "
                         "bins (bin 0 = lowest scores) and keep bin k "
                         "at rate Rk, e.g. snr_db=0,0.5,1,1 drops the "
                         "bottom quartile and halves the second. "
                         "Composes independently with --sample-lang/"
                         "--sample-temperature (own hash domain). "
                         "NULL scores keep. With --stream, "
                         "--curriculum-edges is required")
    ap.add_argument("--curriculum-edges", default=None,
                    metavar="E0,E1,...",
                    help="pin the curriculum bin thresholds (len(rates)"
                         "-1 ascending values) instead of deriving "
                         "quantiles per shard: the verdict becomes a "
                         "pure row function — identical across shard "
                         "counts and the batch/stream paths (required "
                         "with --stream)")
    ap.add_argument("--curriculum-edges-from-history", action="store_true",
                    help="derive the pinned curriculum thresholds from "
                         "the out-root's profile_history numeric state "
                         "(profile.quantile_edges_from_history) instead "
                         "of passing them by hand — requires the "
                         "curriculum column to have been profiled with "
                         "--profile-numeric in a prior run; satisfies "
                         "--stream's pinned-edges requirement (derived "
                         "edges are logged). Mutually exclusive with "
                         "--curriculum-edges")
    ap.add_argument("--split", default=None, metavar="NAME=F,...",
                    help="stable split assignment, e.g. "
                         "train=0.8,val=0.1,test=0.1 (fractions sum to "
                         "1): adds a split column and partitions "
                         "clips_clean by (lang, split); a clip's split "
                         "never changes as the corpus grows")
    ap.add_argument("--split-seed", type=int, default=0)
    ap.add_argument("--profile-cols", default=None, metavar="C1,C2,...",
                    help="sketch-profile the landed kept branch: one "
                         "mergeable HLL row per shard into "
                         "profile_history, plus a run-level drift "
                         "check (null rates / batch size / novelty) "
                         "routed through notify")
    ap.add_argument("--profile-numeric", default=None,
                    metavar="C=LO:HI[:BINS],...",
                    help="with --profile-cols: also record exact "
                         "mergeable numeric distribution state "
                         "(moments + fixed-bin histogram, e.g. "
                         "snr_db=0:60,dur_ms=0:20000:40; default 20 "
                         "bins) and run a PSI distribution-shift "
                         "check per run — bin edges are part of the "
                         "history contract")
    ap.add_argument("--pack-tokens", type=int, default=None, metavar="N",
                    help="assign each kept clip a training-chunk id "
                         "(pack_run, pack_shard, chunk_id) by packing "
                         "scrubbed-transcript tokens into N-token "
                         "concatenated-stream chunks per "
                         "(lang[, split]); batch AND --stream (stream: "
                         "pack_run=stream id, pack_shard=batch id)")
    ap.add_argument("--changelog", nargs=2, default=None,
                    metavar=("TABLE", "SINCE_SNAPSHOT"),
                    help="admin: print the rows appended to TABLE "
                         "after SINCE_SNAPSHOT (incremental "
                         "consumption; errors honestly on non-append "
                         "history — full-read and re-anchor, or pass "
                         "--changelog-cdc)")
    ap.add_argument("--changelog-cdc", action="store_true",
                    help="with --changelog: row-level net CDC instead "
                         "of append-only deltas — emits insert AND "
                         "delete images so upserts (corrections), "
                         "delete_where (takedowns) and overwrites "
                         "replay without a full resync; reads only "
                         "the snapshot dirs that differ")
    ap.add_argument("--takedown", default=None, metavar="IDS_OR_PATH",
                    help="compliance takedown: comma-separated clip_ids "
                         "or a parquet path with a clip_id column. "
                         "Removes the clips from clips_clean and "
                         "handles dedup-signature state per "
                         "--takedown-mode; appends terminal quarantine "
                         "markers; idempotent per (mode, id set)")
    ap.add_argument("--takedown-mode", default="purge",
                    choices=["purge", "block"],
                    help="purge = GDPR erasure (signatures go too; a "
                         "re-upload is re-admitted); block = DMCA-style "
                         "(signatures stay + transcript hashes are "
                         "force-registered so re-uploads quarantine as "
                         "duplicates)")
    ap.add_argument("--takedown-hard", action="store_true",
                    help="with --takedown-mode purge: expire old "
                         "snapshots of every rewritten table so the "
                         "removed rows physically leave disk (otherwise "
                         "time-travel reads can still see them until a "
                         "scheduled expire pass)")
    ap.add_argument("--takedown-defer", action="store_true",
                    help="commit the table deletes as merge-on-read "
                         "equality-delete files instead of COW "
                         "rewrites: O(keys) commit, zero data I/O, "
                         "rows unreadable immediately; bytes leave "
                         "disk at the next --compact + "
                         "--expire-snapshots (incompatible with "
                         "--takedown-hard)")
    ap.add_argument("--export-dir", default=None, metavar="PATH",
                    help="export clips_clean as deterministically "
                         "shuffled training shards (one file per "
                         "shard) + an integrity manifest; trainers "
                         "stream the shards directly")
    ap.add_argument("--export-shards", type=int, default=16,
                    metavar="N",
                    help="shard count for --export-dir (the trainer's "
                         "read parallelism; ~corpus_bytes/256MB)")
    ap.add_argument("--export-format", default="parquet",
                    choices=("parquet", "wds"),
                    help="with --export-dir: 'parquet' (shard=K dirs + "
                         "manifest) or 'wds' — WebDataset-style tar "
                         "shards (<clip_id>.pcm payload + "
                         "<clip_id>.json metadata per sample, "
                         "byte-identical re-exports, pure-Python "
                         "verify_webdataset)")
    ap.add_argument("--export-resume", action="store_true",
                    help="with --export-format wds: resume a crashed "
                         "export — tars already on disk are verified "
                         "(rows+checksum vs the expected aggregate) "
                         "and only missing/stale shards are rewritten")
    ap.add_argument("--export-split", default=None, metavar="NAME",
                    help="with --export-dir: export only this split "
                         "(requires a --split run)")
    ap.add_argument("--export-seed", type=int, default=0)
    ap.add_argument("--export-snapshot", default=None,
                    metavar="SNAPSHOT",
                    help="with --export-dir: export clips_clean AS OF "
                         "this snapshot id (time travel) — re-export a "
                         "past release bit-for-bit even after later "
                         "corrections/takedowns; the exported snapshot "
                         "id is recorded in the manifest's provenance "
                         "either way")
    ap.add_argument("--verify-export", default=None, metavar="PATH",
                    help="integrity-check an export dir against its "
                         "manifest (re-derives per-shard rows/tokens/"
                         "checksums from the files); exit 3 on "
                         "mismatch")
    ap.add_argument("--audit-split-leakage", nargs="?", const=0.8,
                    type=float, default=None, metavar="JACCARD",
                    help="maintenance op: mine near-dup pairs (minhash, "
                         "est_jaccard >= JACCARD, default 0.8) within "
                         "clips_clean and report pairs whose members "
                         "straddle train/val/test — eval contamination "
                         "a per-clip split can't see; prints a JSON "
                         "report (assign leakage-free splits with the "
                         "library's group_aware_split)")
    ap.add_argument("--fail-on-leakage", action="store_true",
                    help="with --audit-split-leakage: exit 3 when any "
                         "leaking pair is found (CI gate)")
    ap.add_argument("--audit-cross-modal", action="store_true",
                    help="maintenance op: mine cross-modal identity "
                         "conflicts within clips_clean — the same audio "
                         "fingerprint carrying different transcripts "
                         "(mistranscription/redub) and the same "
                         "transcript carrying different audio "
                         "(re-recorded/TTS-regenerated scripts); prints "
                         "a JSON report of group-level counts + worst "
                         "group per kind (synthetic corpora over-report "
                         "the same-audio kind — their fingerprints are "
                         "degenerate, DESIGN.md #22)")
    ap.add_argument("--decontam-audit", default=None, metavar="PARQUET",
                    help="maintenance op: retroactive contamination "
                         "audit — a benchmark published AFTER data "
                         "landed is checked against the LANDED "
                         "clips_clean (same n-gram-overlap operator as "
                         "the ingest-time --decontam-heldout; honors "
                         "--decontam-k/--decontam-min-hits/"
                         "--decontam-text-col); prints a JSON report "
                         "with contaminated ids (capped sample)")
    ap.add_argument("--decontam-audit-out", default=None, metavar="PARQUET",
                    help="with --decontam-audit: write the full "
                         "contaminated clip_id set to this parquet — "
                         "feed it to --takedown <parquet> "
                         "--takedown-mode block to remove the clips "
                         "and quarantine re-uploads")
    ap.add_argument("--fail-on-contamination", action="store_true",
                    help="with --decontam-audit: exit 3 when any "
                         "landed clip is contaminated (CI gate)")
    ap.add_argument("--fit-quality-model", default=None,
                    metavar="OUT.json",
                    help="maintenance op (needs --input/--synthetic, "
                         "exits after): distill the rule stack's "
                         "signal-based keep/drop into a calibrated "
                         "linear quality scorer — runs score_clips "
                         "over the raw input, fits an IRLS logistic "
                         "model on the numeric quality signals "
                         "(decimal-summed sufficient statistics: "
                         "bit-identical weights on any partitioning), "
                         "and writes model JSON with train AUC + a "
                         "score threshold calibrated to the observed "
                         "keep rate; duplicate drops are excluded "
                         "from the label (identity evidence, not "
                         "signal)")
    ap.add_argument("--quality-model", default=None,
                    metavar="MODEL.json",
                    help="batch AND --stream: stamp every scored clip "
                         "with the advisory model_quality_score column "
                         "from a fitted --fit-quality-model JSON (one "
                         "fused Python-free sigmoid over the run's own "
                         "signal columns; both ingestion paths carry "
                         "the same score for the same clip) — feeds "
                         "--curriculum model_quality_score=... and "
                         "--profile-numeric; never a keep rule")
    ap.add_argument("--quality-model-features",
                    default=None, metavar="COL[,COL...]",
                    help="with --fit-quality-model: numeric signal "
                         "columns to fit on (default: the advisory "
                         "signal set snr_db,clip_frac,silence_frac,"
                         "dyn_range_db,rms,speech_rate,ppl,lang_conf,"
                         "dur_ms)")
    ap.add_argument("--quality-model-sample", type=float, default=None,
                    metavar="FRAC",
                    help="with --fit-quality-model: fit on a "
                         "deterministic hash sample of the input "
                         "(own 'qmodel_fit_sample' domain — the "
                         "10^12-row path; labeling/AUC still score "
                         "the sampled frame only)")
    ap.add_argument("--correct", default=None, metavar="PARQUET",
                    help="maintenance op: apply a correction batch — "
                         "parquet of raw-schema clips whose clip_ids "
                         "already exist in clips_clean; each row is "
                         "re-scored through the full QC path, re-"
                         "deduped against the signature histories "
                         "(minus its own old signatures) and then "
                         "REPLACES its stored row in one atomic upsert "
                         "(split stays sticky, pack_* columns reset); "
                         "a correction that now fails QC DELETES the "
                         "stored row and quarantines with "
                         "stage=correction; prints a JSON report")
    ap.add_argument("--correct-id", default=None, metavar="ID",
                    help="with --correct: idempotency key for the "
                         "batch — a re-run with the same id is a no-op "
                         "(required)")
    ap.add_argument("--correct-jaccard", type=float, default=0.8,
                    metavar="J",
                    help="with --correct: minhash near-dup threshold "
                         "vs the streaming signature history, when one "
                         "exists (default 0.8, the stream default)")
    ap.add_argument("--repack-tokens", type=int, default=None,
                    metavar="BUDGET",
                    help="maintenance op: assign training-chunk "
                         "identity to clips_clean rows whose pack_run "
                         "is NULL (corrections reset pack_* — their "
                         "rows are otherwise unconsumable by a chunk-"
                         "addressed trainer); packs ONLY the backlog "
                         "into a fresh deterministic pack_run so every "
                         "existing chunk id stays untouched; one "
                         "atomic upsert; replay is a no-op; prints a "
                         "JSON report")
    ap.add_argument("--repack-shards", type=int, default=16,
                    metavar="N",
                    help="with --repack-tokens: hash-derived parallel "
                         "shards for the backlog fold (default 16)")
    ap.add_argument("--wap", action="store_true",
                    help="write-audit-publish (batch only): land EVERY "
                         "table this run touches (clean, quarantine, "
                         "dedup/profile histories) on staging branch "
                         "wap-<run-id> instead of mainline; audit with "
                         "--release-check --check-branch wap-<run-id>, "
                         "then --publish-branch on green or "
                         "--drop-branch on red — the trainer reading "
                         "mainline never sees unaudited data, and a "
                         "dropped run leaves no signature history")
    ap.add_argument("--publish-branch", default=None, metavar="NAME",
                    help="maintenance op (exits after): fast-forward "
                         "mainline to branch NAME's head on every "
                         "table carrying that branch (the PUBLISH step "
                         "of --wap); refuses per-table when mainline "
                         "moved since the fork; exit 3 on any refusal")
    ap.add_argument("--drop-branch", default=None, metavar="NAME",
                    help="maintenance op (exits after): discard branch "
                         "NAME on every table carrying it (the audit-"
                         "failed verdict) — mainline never sees the "
                         "staged snapshots and a re-run reprocesses "
                         "them honestly")
    ap.add_argument("--check-branch", default=None, metavar="NAME",
                    help="with --release-check: audit this WAP staging "
                         "branch's view instead of mainline (judges "
                         "exactly what --publish-branch would ship)")
    ap.add_argument("--release-check", action="store_true",
                    help="pre-release QA gate over --out: data-contract "
                         "expectations on the full clean table, "
                         "clean-vs-quarantine consistency, profile "
                         "drift (when a profile history exists), and "
                         "optionally split leakage; prints one JSON "
                         "verdict, exit 3 unless every check passes")
    ap.add_argument("--release-leakage", type=float, default=None,
                    metavar="JACCARD",
                    help="with --release-check: include the split-"
                         "leakage check at this minhash jaccard "
                         "threshold (fails if clips_clean has no split "
                         "column)")
    args = ap.parse_args()
    curriculum_col = curriculum_rates = curriculum_edges = None
    if args.curriculum:
        try:
            curriculum_col, rates_s = args.curriculum.split("=", 1)
            curriculum_col = curriculum_col.strip()
            curriculum_rates = [float(r) for r in rates_s.split(",")]
            if not curriculum_col or len(curriculum_rates) < 2:
                raise ValueError(args.curriculum)
        except ValueError:
            ap.error("--curriculum: expected COL=R0,R1[,R2...], got "
                     f"{args.curriculum!r}")
        if args.curriculum_edges:
            try:
                curriculum_edges = [
                    float(e) for e in args.curriculum_edges.split(",")
                ]
            except ValueError:
                ap.error("--curriculum-edges: expected E0[,E1...], "
                         f"got {args.curriculum_edges!r}")
            if len(curriculum_edges) != len(curriculum_rates) - 1:
                ap.error("--curriculum-edges: need len(rates)-1 = "
                         f"{len(curriculum_rates) - 1} thresholds, got "
                         f"{len(curriculum_edges)}")
        if args.curriculum_edges_from_history:
            if args.curriculum_edges:
                ap.error("--curriculum-edges-from-history and "
                         "--curriculum-edges are mutually exclusive "
                         "edge sources")
        elif args.stream and curriculum_edges is None:
            ap.error("--curriculum with --stream requires pinned edges: "
                     "--curriculum-edges or "
                     "--curriculum-edges-from-history (a micro-batch is "
                     "not a corpus to derive quantile bins from)")
    elif args.curriculum_edges:
        ap.error("--curriculum-edges without --curriculum")
    elif args.curriculum_edges_from_history:
        ap.error("--curriculum-edges-from-history without --curriculum")

    if not args.compact:
        # fail loudly instead of silently dropping the modifier: an
        # operator who believes blooms/clustering landed would only find
        # out on the next whole-table takedown rewrite
        if args.compact_bloom:
            ap.error("--compact-bloom without --compact (use "
                     "--backfill-blooms TABLE:COL for in-place sidecars "
                     "without a rewrite)")
        if args.compact_cluster_by:
            ap.error("--compact-cluster-by without --compact")
        if args.compact_zorder:
            ap.error("--compact-zorder without --compact")
    if args.compact_zorder and args.compact_cluster_by:
        ap.error("--compact-zorder and --compact-cluster-by are "
                 "mutually exclusive layouts")
    if args.wap:
        if args.stream:
            ap.error("--wap is batch-only (a stream has no run-shaped "
                     "audit point; gate streams with the per-batch "
                     "checks instead)")
        if not args.run_id:
            ap.error("--wap requires --run-id (the staging branch is "
                     "named wap-<run-id>)")
    if args.check_branch and not args.release_check:
        ap.error("--check-branch without --release-check")
    if args.takedown_hard and args.takedown_mode != "purge":
        # apply_takedown raises too; catch it at the parser so the
        # operator sees a usage error, not a stack trace
        ap.error("--takedown-hard is purge-only (block mode keeps "
                 "signatures and snapshots so re-uploads stay "
                 "quarantined)")
    if args.delete_below_defer and not args.delete_below:
        ap.error("--delete-below-defer without --delete-below")
    if args.takedown_hard and args.takedown_defer:
        ap.error("--takedown-hard needs immediate physical erasure; "
                 "--takedown-defer's point is zero data I/O at order "
                 "time — defer, then --compact + a later hard/expire "
                 "pass")

    def _history_edges(spark) -> list[float]:
        """Derive pinned curriculum edges from the out-root's profile
        history (fixed-size mergeable state — no data rescan)."""
        from data_quality_check_pipeline_spark.operators.profile import (
            quantile_edges_from_history,
        )
        from data_quality_check_pipeline_spark.pipeline import (
            PROFILE_TABLE,
        )
        from data_quality_check_pipeline_spark.sources.tables import (
            TableStore,
        )

        store = TableStore(spark, args.out)
        if not store.exists(PROFILE_TABLE):
            ap.error("--curriculum-edges-from-history: no "
                     f"{PROFILE_TABLE} table under {args.out} — run "
                     "with --profile-cols/--profile-numeric first")
        try:
            edges = quantile_edges_from_history(
                store.read(PROFILE_TABLE), curriculum_col,
                len(curriculum_rates),
            )
        except ValueError as e:
            ap.error(f"--curriculum-edges-from-history: {e}")
        print(f"curriculum edges from {PROFILE_TABLE}: "
              f"{[round(e, 4) for e in edges]}")
        return edges
    if args.sample_temperature is not None:
        if args.sample_lang:
            ap.error("--sample-temperature and --sample-lang are "
                     "mutually exclusive mixture policies")
        # with --stream the mixture rates pin at stream start from the
        # landed clean table (stream.py refuses on an empty out_root)
    if (args.sample_dsir_target is None) != (args.sample_dsir_frac is None):
        ap.error("--sample-dsir-target and --sample-dsir-frac go together")
    # --sample-dsir-* with --stream pins the importance model + cutoff
    # from the landed corpus at stream start (refused on empty out_root)

    def _kv_floats(s: str, what: str) -> dict[str, float]:
        # strip around names/values: a quoted 'en=0.4, de=1.0' must not
        # mint a ' de' stratum that silently never matches any lang
        try:
            out = {
                k.strip(): float(v)
                for k, v in (p.split("=", 1) for p in s.split(","))
            }
            if any(not k for k in out):
                raise ValueError("empty name")
            return out
        except ValueError:
            ap.error(f"--{what}: expected NAME=FLOAT[,NAME=FLOAT...], "
                     f"got {s!r}")

    def _numeric_bins(s: str) -> dict:
        try:
            out = {}
            for p in s.split(","):
                k, spec = p.split("=", 1)
                parts = spec.split(":")
                if len(parts) not in (2, 3) or not k.strip():
                    raise ValueError(p)
                lo, hi = float(parts[0]), float(parts[1])
                bins = int(parts[2]) if len(parts) == 3 else 20
                out[k.strip()] = (lo, hi, bins)
            return out
        except ValueError:
            ap.error("--profile-numeric: expected "
                     f"COL=LO:HI[:BINS][,...], got {s!r}")

    from data_quality_check_pipeline_spark.pipeline import (
        RunConfig,
        run_pipeline,
    )
    from data_quality_check_pipeline_spark.report import (
        render_run_report,
        save_run_report,
    )
    from data_quality_check_pipeline_spark.notify import configure_from_env
    from data_quality_check_pipeline_spark.session import get_spark
    from data_quality_check_pipeline_spark.synth import write_corpus

    # live alert transports when the deployment declares webhooks
    # (CLIP_QUALITY_{SLACK,EMAIL,PAGERDUTY}_WEBHOOK); log-only otherwise
    configure_from_env()

    # version management parity (reference main.py --rollback /
    # --list-versions; rollback_manager.py:96-132)
    if (args.list_versions or args.rollback or args.compact
            or args.backfill_blooms or args.adopt_files
            or args.rename_column or args.drop_column
            or args.show_meta
            or args.publish_branch or args.drop_branch
            or args.expire_snapshots or args.tag or args.untag
            or args.delete_below or args.fsck or args.binpack
            or args.changelog or args.takedown or args.correct
            or args.repack_tokens or args.export_dir
            or args.verify_export or args.release_check
            or args.decontam_audit
            or args.audit_cross_modal
            or args.audit_split_leakage is not None):
        from data_quality_check_pipeline_spark.sources.tables import (
            TableStore,
        )

        spark = get_spark(app_name="clip-quality-admin", cores=args.cores)
        store = TableStore(spark, args.out)
        if args.list_versions:
            tags_by_sid = {}
            for t, sid in store.tags("clips_clean").items():
                tags_by_sid.setdefault(sid, []).append(t)
            for s in store.snapshots("clips_clean"):
                tagged = tags_by_sid.get(s["id"])
                print(
                    f"{s['id']}  mode={s['mode']}  "
                    f"run={s['properties'].get('run_id')}"
                    + (f"  tags={','.join(sorted(tagged))}"
                       if tagged else "")
                )
            for b, sid in sorted(store.branches("clips_clean").items()):
                print(f"branch {b} -> {sid} (unpublished)")
        if args.rollback:
            store.rollback("clips_clean", args.rollback)
            print(f"rolled back clips_clean to {args.rollback}")
        if args.tag:
            sid = store.tag("clips_clean", args.tag, args.tag_snapshot)
            print(f"tagged clips_clean snap_{sid} as {args.tag!r}")
        if args.untag:
            store.untag("clips_clean", args.untag)
            print(f"dropped tag {args.untag!r}")
        if args.compact:
            cluster = (
                [c.strip() for c in args.compact_cluster_by.split(",")
                 if c.strip()]
                if args.compact_cluster_by else None
            )
            bloom = (
                [c.strip() for c in args.compact_bloom.split(",")
                 if c.strip()]
                if args.compact_bloom else None
            )
            zorder = (
                [c.strip() for c in args.compact_zorder.split(",")
                 if c.strip()]
                if args.compact_zorder else None
            )
            sid = store.compact(
                args.compact, cluster_by=cluster, bloom_cols=bloom,
                zorder_by=zorder,
            )
            print(
                f"compacted {args.compact} -> snap_{sid}" if sid
                else f"{args.compact}: nothing to compact"
            )
        if args.publish_branch or args.drop_branch:
            br = args.publish_branch or args.drop_branch
            verb = "publish" if args.publish_branch else "drop"
            hit = failed = 0
            for table in store.list_tables():
                if br not in store.branches(table):
                    continue
                hit += 1
                try:
                    if args.publish_branch:
                        sid = store.publish_branch(table, br)
                        print(f"published {table}@{br} -> snap_{sid}")
                    else:
                        store.drop_branch(table, br)
                        print(f"dropped {table}@{br}")
                except RuntimeError as e:
                    failed += 1
                    print(f"{verb} FAILED on {table}: {e}")
            if hit == 0:
                print(f"branch {br!r} exists on no table under "
                      f"{args.out}")
                spark.stop()
                raise SystemExit(3)
            print(f"{verb}: {hit - failed}/{hit} tables ok")
            if failed:
                spark.stop()
                raise SystemExit(3)
        if args.rename_column:
            parts = args.rename_column.split(":")
            if len(parts) != 3 or not all(parts):
                print("--rename-column expects TABLE:OLD:NEW")
                spark.stop()
                raise SystemExit(2)
            table, old, new = parts
            sid = store.rename_column(table, old, new)
            print(
                f"renamed {table}.{old} -> {new} (metadata-only, "
                f"snap_{sid}); run --compact {table} before COW "
                "maintenance ops"
            )
        if args.show_meta:
            table, _, kind = args.show_meta.partition(":")
            store.read_meta(table, kind or "snapshots").show(
                100, truncate=False
            )
        if args.drop_column:
            table, _, col = args.drop_column.partition(":")
            if not table or not col:
                print("--drop-column expects TABLE:COL")
                spark.stop()
                raise SystemExit(2)
            sid = store.drop_column(table, col)
            print(
                f"dropped {table}.{col} (metadata-only, snap_{sid}); "
                f"physical erasure: --compact {table} then "
                "--expire-snapshots"
            )
        if args.adopt_files:
            table, src = args.adopt_files
            sid = store.adopt_files(table, src)
            n = store.row_count(table)
            print(
                f"adopted {src} into {table} as snap_{sid} "
                f"(zero-copy; table now {n} rows)"
            )
        if args.backfill_blooms:
            table, _, colspec = args.backfill_blooms.partition(":")
            cols = [c.strip() for c in colspec.split(",") if c.strip()]
            if not table or not cols:
                print("--backfill-blooms expects TABLE:COL[,COL...]")
                spark.stop()
                raise SystemExit(2)
            res = store.backfill_blooms(table, cols)
            print(
                f"backfilled blooms on {table} ({','.join(cols)}): "
                f"{res['files_built']} file blooms built across "
                f"{res['dirs_built']} dirs, {res['dirs_skipped']} dirs "
                "already covered/skipped"
            )
        if args.binpack:
            import json as _json

            res = store.binpack(
                args.binpack, small_file_bytes=args.binpack_small_bytes
            )
            print(_json.dumps({"binpack": args.binpack, **res}))
        if args.fsck:
            import json as _json

            tables = (
                store.list_tables()
                if args.fsck == "all" else [args.fsck]
            )
            bad = 0
            for t in tables:
                res = store.fsck(t, deep=args.fsck_deep)
                print(_json.dumps(res))
                if not res["ok"]:
                    bad += 1
            if bad:
                raise SystemExit(3)
        if args.delete_below:
            import json as _json

            parts = args.delete_below.split(":", 2)
            if len(parts) != 3:
                raise SystemExit(
                    "--delete-below expects TABLE:COL:CUTOFF"
                )
            t, col, raw = parts
            cutoff = None
            for cast in (int, float):
                try:
                    cutoff = cast(raw)
                    break
                except ValueError:
                    continue
            if cutoff is None:
                import datetime as _dt

                try:
                    cutoff = _dt.datetime.fromisoformat(raw)
                except ValueError:
                    cutoff = raw  # string-typed column
            if args.delete_below_defer:
                res = store.delete_below_mor(t, col, cutoff)
            else:
                res = store.delete_below(t, col, cutoff)
            print(_json.dumps({"delete_below": args.delete_below, **res}))
        if args.expire_snapshots:
            tables = (
                store.list_tables()
                if args.expire_snapshots == "all"
                else [args.expire_snapshots]
            )
            for t in tables:
                expired = store.expire_snapshots(
                    t, keep_last=args.expire_keep,
                    orphan_grace_s=args.expire_grace,
                )
                print(
                    f"expired {len(expired)} snapshot(s) of {t}"
                    + (f": {', '.join(expired)}" if expired else "")
                )
        if args.takedown:
            import json as _json

            from data_quality_check_pipeline_spark.takedown import (
                apply_takedown,
            )

            if os.path.exists(args.takedown):
                ids = [
                    r["clip_id"]
                    for r in spark.read.parquet(args.takedown)
                    .select("clip_id").collect()
                ]
            else:
                ids = [
                    c.strip() for c in args.takedown.split(",")
                    if c.strip()
                ]
            rep = apply_takedown(
                spark, args.out, ids, mode=args.takedown_mode,
                hard=args.takedown_hard, defer=args.takedown_defer,
            )
            print(_json.dumps(rep, indent=2, default=str))
        if args.correct:
            import json as _json

            from data_quality_check_pipeline_spark.corrections import (
                apply_corrections,
            )

            if not args.correct_id:
                print("--correct requires --correct-id (the batch's "
                      "idempotency key)")
                spark.stop()
                raise SystemExit(3)
            rep = apply_corrections(
                spark, args.out, spark.read.parquet(args.correct),
                args.correct_id,
                near_dup_jaccard=args.correct_jaccard,
                audio_max_hamming=args.dedup_audio_max_hamming,
            )
            print(_json.dumps(rep, indent=2, default=str))
        if args.repack_tokens:
            import json as _json

            from data_quality_check_pipeline_spark.repack import (
                repack_unpacked,
            )

            rep = repack_unpacked(
                spark, args.out, args.repack_tokens,
                n_shards=args.repack_shards,
            )
            print(_json.dumps(rep, indent=2, default=str))
        if args.export_dir:
            from data_quality_check_pipeline_spark.operators.export import (
                export_training_shards,
                export_webdataset_shards,
            )
            from pyspark.sql import functions as F

            try:
                export_sid = args.export_snapshot
                if export_sid is not None:
                    # a release tag resolves to its pinned snapshot
                    export_sid = store.tags("clips_clean").get(
                        export_sid, export_sid
                    )
                if export_sid is None:
                    cur = store.current_snapshot("clips_clean")
                    if cur is None:
                        raise FileNotFoundError(
                            "clips_clean has no snapshots under "
                            f"{args.out} (run the pipeline first)"
                        )
                    export_sid = cur["id"]
                clean = store.read(
                    "clips_clean", snapshot_id=export_sid
                )
            except (KeyError, FileNotFoundError) as exc:
                print(f"export unavailable: {exc}")
                spark.stop()
                raise SystemExit(3)
            provenance = {"table": "clips_clean",
                          "snapshot": export_sid}
            if args.export_split:
                if "split" not in clean.columns:
                    print("export unavailable: clips_clean has no "
                          "split column (run with --split first)")
                    spark.stop()
                    raise SystemExit(3)
                clean = clean.filter(
                    F.col("split") == args.export_split
                )
            if args.export_resume and args.export_format != "wds":
                print("--export-resume requires --export-format wds "
                      "(the parquet write is one atomic Spark job)")
                spark.stop()
                raise SystemExit(3)
            if args.export_format == "wds":
                mf = export_webdataset_shards(
                    clean, "clip_id", args.export_dir,
                    args.export_shards, seed=args.export_seed,
                    resume=args.export_resume,
                    provenance=provenance,
                )
                print(
                    f"exported {mf['total_rows']} rows into "
                    f"{mf['n_shards']} wds tar shards under "
                    f"{args.export_dir}"
                )
            else:
                mf = export_training_shards(
                    clean, "clip_id", args.export_dir,
                    args.export_shards,
                    seed=args.export_seed,
                    token_col=(
                        "n_tokens" if "n_tokens" in clean.columns
                        else None
                    ),
                    provenance=provenance,
                )
                print(
                    f"exported {mf['total_rows']} rows"
                    + (
                        f" / {mf['total_tokens']} tokens"
                        if "total_tokens" in mf else ""
                    )
                    + f" into {mf['n_shards']} shards under "
                    f"{args.export_dir}"
                )
        if args.verify_export:
            from data_quality_check_pipeline_spark.operators.export import (
                WDS_MANIFEST_NAME,
                verify_export,
                verify_webdataset,
            )

            # auto-detect the export format from the manifest on disk
            if os.path.exists(
                os.path.join(args.verify_export, WDS_MANIFEST_NAME)
            ):
                res = verify_webdataset(args.verify_export)
            else:
                res = verify_export(spark, args.verify_export)
            if res["ok"]:
                print(f"export ok: {args.verify_export}")
            else:
                print(f"export CORRUPT: {res['mismatches']}")
                spark.stop()
                raise SystemExit(3)
        if args.audit_split_leakage is not None:
            import json as _json

            from data_quality_check_pipeline_spark.operators.dedup import (
                minhash_lsh_pairs,
            )
            from data_quality_check_pipeline_spark.operators.sampling import (
                split_leakage,
            )

            clean = store.read("clips_clean")
            if "split" not in clean.columns:
                print("leakage audit unavailable: clips_clean has no "
                      "split column (run with --split first)")
                spark.stop()
                raise SystemExit(3)
            text_col = (
                "transcript_scrubbed"
                if "transcript_scrubbed" in clean.columns
                else "transcript"
            )
            mine_stats: dict = {}
            pairs = minhash_lsh_pairs(
                clean.select("clip_id", text_col, "split"),
                "clip_id", text_col,
                min_est_jaccard=args.audit_split_leakage,
                stats_out=mine_stats,
            )
            rep = split_leakage(clean, pairs, "clip_id")
            rep["min_est_jaccard"] = args.audit_split_leakage
            rep["hot_band_buckets"] = mine_stats.get(
                "hot_band_buckets", 0
            )
            print(_json.dumps(rep, indent=2, default=str))
            if args.fail_on_leakage and rep["leaking"]:
                spark.stop()
                raise SystemExit(3)
        if args.audit_cross_modal:
            import json as _json

            from data_quality_check_pipeline_spark.operators.crossmodal import (
                cross_modal_conflicts,
                cross_modal_report,
            )

            if not store.exists("clips_clean"):
                print("cross-modal audit unavailable: no clips_clean "
                      f"table under {args.out}")
                spark.stop()
                raise SystemExit(3)
            clean = store.read("clips_clean")
            rep = cross_modal_report(
                cross_modal_conflicts(clean)
            )
            rep["checked"] = clean.count()
            print(_json.dumps(rep, indent=2, default=str))
            # the operator caches its (id, fp, hash) frame for the two
            # groupBys; release it (documented cache policy)
            spark.catalog.clearCache()
        if args.decontam_audit:
            import json as _json

            from pyspark.sql import functions as F

            from data_quality_check_pipeline_spark.operators.dedup import (
                decontaminate,
            )

            if not store.exists("clips_clean"):
                print("contamination audit unavailable: no clips_clean "
                      f"table under {args.out}")
                spark.stop()
                raise SystemExit(3)
            clean = store.read("clips_clean")
            text_col = (
                "transcript_scrubbed"
                if "transcript_scrubbed" in clean.columns
                else "transcript"
            )
            heldout = spark.read.parquet(args.decontam_audit)
            hits = decontaminate(
                clean.select("clip_id", text_col), heldout,
                "clip_id", text_col,
                heldout_text_col=args.decontam_text_col,
                shingle_k=args.decontam_k,
                min_hits=args.decontam_min_hits,
            ).cache()
            n_bad = hits.count()
            rep = {
                "checked": clean.count(),
                "contaminated": n_bad,
                "shingle_k": args.decontam_k,
                "min_hits": args.decontam_min_hits,
                "heldout": args.decontam_audit,
                "sample_ids": [
                    r["clip_id"]
                    for r in hits.orderBy(
                        F.col("hits").desc(), "clip_id"
                    ).limit(20).collect()
                ],
            }
            if args.decontam_audit_out:
                hits.select("clip_id").coalesce(1).write.mode(
                    "overwrite"
                ).parquet(args.decontam_audit_out)
                rep["out"] = args.decontam_audit_out
                rep["next"] = (
                    f"--takedown {args.decontam_audit_out} "
                    "--takedown-mode block"
                )
            print(_json.dumps(rep, indent=2, default=str))
            if args.fail_on_contamination and n_bad:
                spark.stop()
                raise SystemExit(3)
        if args.changelog:
            from data_quality_check_pipeline_spark.sources.tables import (
                IncrementalReadError,
            )

            table, since = args.changelog
            try:
                if args.changelog_cdc:
                    from pyspark.sql import functions as F

                    cdc_scan: dict = {}
                    delta = store.read_changelog(
                        table, since, scan_stats=cdc_scan
                    )
                    by_kind = {
                        r["_change_type"]: r["n"]
                        for r in delta.groupBy("_change_type")
                        .agg(F.count(F.lit(1)).alias("n"))
                        .collect()
                    }
                    print(
                        f"{table}: net changes since {since}: "
                        f"{by_kind.get('insert', 0)} insert(s), "
                        f"{by_kind.get('delete', 0)} delete(s) "
                        f"(diffed {cdc_scan.get('files_diffed', 0)} "
                        "files; "
                        f"{cdc_scan.get('files_cancelled', 0)} "
                        "carried files cancelled by inode identity)"
                    )
                else:
                    delta = store.read_incremental(table, since)
                    n = delta.count()
                    print(f"{table}: {n} row(s) appended since {since}")
                # preview without binary payloads (audio bytes would
                # flood the terminal)
                slim = delta.drop(
                    *[c for c, t in delta.dtypes if t == "binary"]
                )
                slim.show(20, truncate=40)
            except (
                IncrementalReadError, FileNotFoundError, KeyError
            ) as exc:
                # unknown table / empty table / bad anchor all get the
                # honest one-liner, not a traceback
                print(f"changelog unavailable: {exc}")
                spark.stop()
                raise SystemExit(3)
        if args.release_check:
            import json as _json

            from data_quality_check_pipeline_spark.release import (
                release_check,
            )

            verdict = release_check(
                spark, args.out,
                leakage_jaccard=args.release_leakage,
                branch=args.check_branch,
            )
            print(_json.dumps(verdict, indent=2, default=str))
            if not verdict["ok"]:
                spark.stop()
                raise SystemExit(3)
        spark.stop()
        return

    if args.synthetic:
        # path encodes N: "--synthetic 160000" after an earlier
        # "--synthetic 3000" run must not silently reuse the stale corpus
        corpus = os.path.join(
            args.out, f"_synthetic_input_n{args.synthetic}"
        )
        input_path = os.path.join(corpus, "clips.parquet")
        if not os.path.exists(input_path):
            write_corpus(corpus, args.synthetic)
    elif args.input:
        input_path = args.input
    else:
        ap.error("one of --input / --synthetic is required")

    if args.fit_quality_model:
        import json as _json

        from data_quality_check_pipeline_spark.operators.qmodel import (
            distill_quality_model,
        )

        spark = get_spark(
            app_name="clip-quality-qmodel", cores=args.cores
        )
        feats = (
            [c.strip() for c in args.quality_model_features.split(",")
             if c.strip()]
            if args.quality_model_features else None
        )
        try:
            model, verdict = distill_quality_model(
                spark.read.parquet(input_path),
                feats,
                sample_frac=args.quality_model_sample,
            )
        except ValueError as e:  # degenerate labels / bad features
            print(f"fit-quality-model failed: {e}")
            spark.stop()
            raise SystemExit(3)
        doc = {"model": model.to_dict(), **verdict}
        tmp = args.fit_quality_model + ".tmp"
        with open(tmp, "w") as f:
            _json.dump(doc, f, indent=2, sort_keys=True)
        os.replace(tmp, args.fit_quality_model)
        print(_json.dumps(verdict, indent=2))
        print(f"model written to {args.fit_quality_model}")
        spark.stop()
        return

    if args.stream:
        from data_quality_check_pipeline_spark.sources.tables import (
            TableStore,
        )
        from data_quality_check_pipeline_spark.streaming.stream import (
            start_quality_stream,
        )

        spark = get_spark(app_name="clip-quality-stream", cores=args.cores)
        if args.curriculum_edges_from_history:
            curriculum_edges = _history_edges(spark)
        # stream exactly the given path: a named .parquet file/dir streams
        # itself (never sibling tables in the same parent directory); a
        # plain directory globs *.parquet inside it only, so corpus sidecar
        # files (counts.json) are skipped
        src_dir = (
            input_path
            if input_path.endswith(".parquet")
            else os.path.join(input_path, "*.parquet")
        )
        q = start_quality_stream(
            spark, src_dir, args.out,
            os.path.join(args.out, "_stream_ckpt"), available_now=True,
            content_dedup=args.stream_content_dedup,
            near_dup=args.stream_near_dup,
            audio_near_dup=args.stream_audio_near_dup,
            audio_max_hamming=args.dedup_audio_max_hamming,
            # same flags as batch: a clip reaches the same hash-derived
            # sample/split verdict on either path
            sample_rates=(
                _kv_floats(args.sample_lang, "sample-lang")
                if args.sample_lang else None
            ),
            sample_default_rate=args.sample_default_rate,
            sample_seed=args.sample_seed,
            sample_temperature=args.sample_temperature,
            dsir_target=args.sample_dsir_target,
            dsir_frac=args.sample_dsir_frac,
            dsir_text_col=args.sample_dsir_text_col,
            dsir_temperature=args.sample_dsir_temperature,
            curriculum_col=curriculum_col,
            curriculum_rates=curriculum_rates,
            curriculum_edges=curriculum_edges,
            decontam_heldout=args.decontam_heldout,
            decontam_text_col=args.decontam_text_col,
            decontam_k=args.decontam_k,
            decontam_min_hits=args.decontam_min_hits,
            split_fractions=(
                _kv_floats(args.split, "split") if args.split else None
            ),
            split_seed=args.split_seed,
            profile_cols=(
                [
                    c.strip()
                    for c in args.profile_cols.split(",") if c.strip()
                ]
                if args.profile_cols else None
            ),
            profile_numeric=(
                _numeric_bins(args.profile_numeric)
                if args.profile_numeric else None
            ),
            pack_budget=args.pack_tokens,
            quality_model_json=args.quality_model,
        )
        import time as _time

        _t0 = _time.time()
        q.awaitTermination()
        drain_s = _time.time() - _t0
        from data_quality_check_pipeline_spark.pipeline import (
            active_quarantine,
        )

        store = TableStore(spark, args.out)
        kept = (
            store.read("clips_clean").count()
            if store.exists("clips_clean") else 0
        )
        quarantined = (
            active_quarantine(store.read("clips_quarantine")).count()
            if store.exists("clips_quarantine") else 0
        )
        # rate over the INPUT the drain consumed when known (--synthetic
        # N), else over landed rows; drain excludes JVM start/corpus gen
        n_in = args.synthetic or (kept + quarantined)
        print(
            f"stream drained: clean={kept} quarantine={quarantined} "
            f"(drain {drain_s:.1f}s, {n_in / drain_s:.0f} clips/s)"
        )
        rec = getattr(q, "progress_recorder", None)
        if rec is not None:
            # listener events are async — give the final batch a moment
            rec.wait_for_batches(1, timeout_s=5.0)
            s = rec.summary()
            print(
                f"stream progress: batches={s['batches']} "
                f"rows={s['total_input_rows']} "
                f"degraded={len(s['degraded_batches'])} "
                f"({rec.path})"
            )
            rec.detach()
        spark.stop()
        return

    fp = args.fingerprint or source_fingerprint(input_path)
    spark = get_spark(app_name="clip-quality-pipeline", cores=args.cores)
    if args.curriculum_edges_from_history:
        curriculum_edges = _history_edges(spark)
    cfg = RunConfig(
        out_root=args.out,
        run_id=args.run_id,
        n_shards=args.shards,
        source_fingerprint=fp,
        force=args.force,
        # blocking review only when a decision file is configured (or
        # --interactive-review asks for the TTY prompt) and --no-review
        # was not passed
        non_interactive=(
            args.no_review
            or (args.review_file is None and not args.interactive_review)
        ),
        review_decision_file=args.review_file,
        pushgateway_url=args.pushgateway,
        dedup_content=args.dedup_content,
        dedup_audio=args.dedup_audio,
        dedup_audio_max_hamming=args.dedup_audio_max_hamming,
        dedup_quality_col=args.dedup_quality_col,
        decontam_heldout=args.decontam_heldout,
        decontam_text_col=args.decontam_text_col,
        decontam_k=args.decontam_k,
        decontam_min_hits=args.decontam_min_hits,
        sample_rates=(
            _kv_floats(args.sample_lang, "sample-lang")
            if args.sample_lang else None
        ),
        sample_default_rate=args.sample_default_rate,
        sample_seed=args.sample_seed,
        sample_temperature=args.sample_temperature,
        curriculum_col=curriculum_col,
        curriculum_rates=curriculum_rates,
        curriculum_edges=curriculum_edges,
        dsir_target=args.sample_dsir_target,
        dsir_frac=args.sample_dsir_frac,
        dsir_text_col=args.sample_dsir_text_col,
        dsir_temperature=args.sample_dsir_temperature,
        split_fractions=(
            _kv_floats(args.split, "split") if args.split else None
        ),
        split_seed=args.split_seed,
        profile_cols=(
            [c.strip() for c in args.profile_cols.split(",") if c.strip()]
            if args.profile_cols else None
        ),
        profile_numeric=(
            _numeric_bins(args.profile_numeric)
            if args.profile_numeric else None
        ),
        pack_budget=args.pack_tokens,
        wap_branch=(f"wap-{args.run_id}" if args.wap else None),
        quality_model_json=args.quality_model,
    )
    if args.wap:
        print(f"WAP: staging every table write on branch "
              f"'wap-{args.run_id}' — audit with --release-check "
              f"--check-branch wap-{args.run_id}, then "
              f"--publish-branch / --drop-branch")
    if args.requeue:
        from data_quality_check_pipeline_spark.pipeline import (
            requeue_quarantine,
        )

        print(requeue_quarantine(spark, cfg, input_path))
        spark.stop()
        return
    metrics = run_pipeline(spark, input_path, cfg)
    if not metrics.get("skipped"):
        save_run_report(metrics, os.path.join(args.out, "reports"))
        print(render_run_report(metrics))
    else:
        print(f"skipped: {metrics['reason']}")
    spark.stop()
    if metrics.get("halted"):
        # spark-submit / orchestrators must see a halted pipeline as a
        # FAILED job, not a clean exit with a pretty report
        print("pipeline HALTED by gate decision", file=sys.stderr)
        sys.exit(2)


if __name__ == "__main__":
    main()
