"""End-to-end clip-quality pipeline: ONE lazy DataFrame DAG per shard.

Rebuilds the reference's 17-stage sequential pandas pipeline
(/root/reference/src/pipeline.py:800-913) as a Spark-first plan:

    scan -> clean (one projection) -> UDF scores (fused langid+perplexity
    / audio_stats, two Arrow stages) -> rule flags (one projection) ->
    duplicate flag (one shuffle) -> [cache] -> threshold gate (tiny agg) ->
    keep branch: scrub -> salted repartition -> clips_clean snapshot
    drop branch: quarantine snapshot
    metrics: lang/reason histograms + completeness aggregates -> lineage row

Scale design:
* The flagged DataFrame is computed ONCE and cached; both branches and the
  metric aggregates reuse it (the reference re-validates up to 4x).
* The only full-table shuffles are the duplicate-id aggregate and the final
  salted repartition before the partitioned write.
* Writes are partitioned by ``lang`` with an explicit salt derived from
  ``clip_id`` so the Zipf-skewed language buckets spread across tasks
  (north rule: explicit skew handling, on top of AQE).
* Resume: the corpus is processed in ``n_shards`` deterministic shards
  (pmod(xxhash64(clip_id), n)); every committed shard appends a lineage row;
  a rerun anti-joins pending shards (reference analogue: whole-run checksum
  skip, rollback_manager.py:142-163 — ours is finer grained).
"""

from __future__ import annotations

import json
import logging
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .control import (
    CONTINUE,
    DISCARD,
    HALT,
    QUARANTINE,
    GateResult,
    StageLog,
    Thresholds,
    threshold_gate,
)
from .metrics import save_metrics
from .operators.clean import clean_clips
from .operators.profile import completeness, keep_stats
from .operators.scrub import scrub_transcripts
from .operators.validate import (
    active_rules,
    merge_duplicate_reason,
    with_duplicate_flag,
    with_flags,
)
from .sources.tables import TableStore
from .udfs.audio import with_audio_stats
from .udfs.textscore import with_text_scores

_log = logging.getLogger(__name__)

# severity order for folding per-shard gate decisions into the run-level
# gate (worst wins)
_DECISION_RANK = {CONTINUE: 0, DISCARD: 1, QUARANTINE: 2, HALT: 3}

CLEAN_TABLE = "clips_clean"
QUARANTINE_TABLE = "clips_quarantine"
LINEAGE_TABLE = "lineage"
# cross-run dedup signature history tables (survivors only; see
# _dedup_kept_branch)
CONTENT_HASH_TABLE = "content_hash_history"
AUDIO_FP_TABLE = "audio_fp_history"
PROFILE_TABLE = "profile_history"
DUP_CONTENT_REASON = "duplicate_content"
DUP_AUDIO_REASON = "near_duplicate_audio"
# minhash near-dup of retained content (stream sink's batch analogue;
# stamped by corrections when a corrected transcript now near-dups
# ANOTHER retained clip)
NEARDUP_CONTENT_REASON = "near_duplicate_content"
CONTAMINATION_REASON = "eval_contamination"
# quarantine reasons that are TERMINAL for the DLQ: a duplicate stays a
# duplicate on retry (its survivor is already in the corpus), and a
# clip overlapping the eval set stays contaminated, so requeue must
# never re-drive either into clips_clean — unlike transient validation
# failures. stream_near_duplicate is the streaming sink's analogue.
TERMINAL_REASONS = (
    DUP_CONTENT_REASON,
    DUP_AUDIO_REASON,
    NEARDUP_CONTENT_REASON,
    CONTAMINATION_REASON,
    "stream_near_duplicate",
    # a takedown order (takedown.py) is never retried back in
    "takedown",
)


@dataclass
class RunConfig:
    out_root: str
    run_id: str = ""
    n_shards: int = 1
    salt_buckets: int = 16
    thresholds: Thresholds = field(default_factory=Thresholds)
    non_interactive: bool = True
    review_decision_file: str | None = None
    force: bool = False
    source_fingerprint: str = ""
    with_audio: bool = True
    cache_flagged: bool = True
    module_reports: bool = True
    pushgateway_url: str | None = None
    push_transport: object = None  # injectable (url, data, headers) hook
    # cross-run dedup of the kept branch against persisted signature
    # history in this out_root (exact transcript hash / audio spectral
    # fingerprint); duplicates quarantine with a TERMINAL reason
    dedup_content: bool = False
    dedup_audio: bool = False
    dedup_audio_max_hamming: int = 6
    # survivor policy for WITHIN-shard exact-content groups: keep the
    # argmax of this numeric column (ties -> min clip_id) instead of min
    # clip_id. Cross-run stays greedy (dedup_exact_incremental docs).
    dedup_quality_col: str | None = None
    # eval-set decontamination: parquet of heldout/benchmark texts —
    # kept clips whose transcript shares >= decontam_min_hits distinct
    # word decontam_k-grams with any heldout row quarantine with the
    # TERMINAL eval_contamination reason. Runs BEFORE dedup so a
    # contaminated clip leaves no signature in the dedup history (the
    # sampling-ordering argument: what never lands must leave no trace)
    decontam_heldout: str | None = None
    decontam_text_col: str = "text"
    decontam_k: int = 8
    decontam_min_hits: int = 1
    # compact a dedup history table once its current view fragments past
    # this many snapshot dirs (one small dir accretes per shard per
    # run). None disables. Conflict-safe: compact() aborts rather than
    # clobber a concurrent append, so a lost race just retries next run.
    history_compact_dirs: int | None = 64
    # write-audit-publish: land EVERY table this run touches on this
    # staging branch instead of mainline; audit the branch view
    # (release_check(branch=...)), then publish_branch on green or
    # drop_branch on red — mainline (and the trainer reading it) never
    # sees unaudited data, and a dropped run leaves no signature
    # history behind. History compaction is deferred to mainline.
    wap_branch: str | None = None
    # path to a fitted qmodel JSON (--fit-quality-model output): stamps
    # the advisory model_quality_score column on every scored clip (one
    # fused Python-free sigmoid — the deployment half of the distilled
    # classifier). Advisory like speech_rate: curriculum/profiling
    # input, never a keep rule. Batch-only.
    quality_model_json: str | None = None
    # deterministic kept-branch mixture sampling + split assignment
    # (operators/sampling.py), applied AFTER dedup and BEFORE
    # scrub/write. Decisions hash clip_id (never rand()), so shard
    # replays, resumes and requeued clips all reach the same verdict.
    # Sampled-out clips are counted (stats['sampled_out']), NOT
    # quarantined — they are valid data the mixture did not select.
    sample_rates: dict | None = None  # lang -> keep rate
    sample_default_rate: float = 1.0  # unlisted/NULL lang
    sample_seed: int = 0
    # temperature-based mixture instead of explicit rates: per-lang
    # keep rates derived from count(lang)**alpha over THIS SHARD's kept
    # branch (shards are a hash split, so per-shard proportions match
    # the corpus in expectation; the derived rates are logged per
    # shard). Mutually exclusive with sample_rates. Streaming runs need
    # explicit rates — a micro-batch is not a corpus to derive a
    # mixture from.
    sample_temperature: float | None = None
    # quality-curriculum sampling (operators/sampling.py
    # with_quality_bin): bin the kept branch by quantiles of
    # curriculum_col (n_bins = len(curriculum_rates)) and keep bin k at
    # curriculum_rates[k] (bin 0 = lowest scores). Composes with the
    # language mixture above — the curriculum filter hashes in its own
    # 'curriculum' domain, so equal seeds stay independent (DESIGN
    # #23/#29-class: an undomained second filter at the same seed
    # would share the mixture's fraction and collapse the composed
    # rate to min instead of product). NULL scores keep (rate 1.0):
    # absent quality evidence is not evidence of low quality.
    # curriculum_edges pins the bin thresholds (len(rates)-1 ascending
    # values): without it the edges are derived per shard — each
    # shard's own quantiles, logged for audit, verdicts deterministic
    # given (corpus, n_shards) but NOT across shard counts; pinned
    # edges make the verdict a pure row function (shard-invariant, and
    # the only form the streaming sink accepts — a micro-batch is not
    # a corpus to derive quantiles from).
    curriculum_col: str | None = None
    curriculum_rates: list | None = None  # rate per quantile bin
    curriculum_edges: list | None = None  # pinned thresholds (optional)
    # DSIR-style domain-targeted selection (operators/selection.py):
    # keep the dsir_frac of the kept branch whose hashed-n-gram profile
    # best matches the dsir_target parquet (importance resampling,
    # Gumbel-threshold mode — one quantile pass + a scan-side filter,
    # no count job). Like the mixture/curriculum stages it runs BEFORE
    # dedup (selected-out clips leave no signature history) and
    # composes at equal seeds via its own hash domains. Per-shard model
    # + cutoff derivation (the curriculum-unpinned-edges precedent:
    # deterministic given (corpus, n_shards), not across shard counts).
    # Batch-only — a micro-batch is not a corpus to fit a model on.
    dsir_target: str | None = None  # parquet of target-domain texts
    dsir_frac: float | None = None  # kept fraction of scored clips
    dsir_text_col: str = "text"  # text column IN THE TARGET parquet
    dsir_temperature: float = 1.0
    # split name -> fraction (must sum to 1); adds a 'split' column and
    # partitions clips_clean by (lang, split)
    split_fractions: dict | None = None
    split_seed: int = 0
    # mergeable sketch profiling of the landed kept branch
    # (operators/profile.py): one fixed-size HLL row per shard into
    # profile_history, then a run-level drift check (latest-vs-prior
    # null rates / batch size / value novelty) routed through notify.
    # The corpus-lifetime profile never rescans data (corpus_profile).
    profile_cols: list | None = None
    # numeric distribution state alongside: {col: (lo, hi, nbins)} —
    # exact mergeable moments + fixed-bin histograms, PSI
    # distribution-shift drift (the numeric-shape regression null
    # rates cannot see, e.g. SNR silently degrading). Bin edges are
    # part of the history contract.
    profile_numeric: dict | None = None
    # token-budget sequence packing of the clean output
    # (operators/packing.py): assign each kept clip a
    # (pack_shard, chunk_id) over its scrubbed-transcript token count
    # so the clean table is directly consumable as training chunks.
    # Chunk identity includes the pipeline shard (DESIGN #25 / packing
    # contract: the shard IS the parallel unit — chunk ids restart per
    # shard and stay deterministic under resume/replay).
    pack_budget: int | None = None

    def __post_init__(self) -> None:
        if not self.run_id:
            self.run_id = uuid.uuid4().hex[:12]
        if self.sample_temperature is not None and self.sample_rates:
            raise ValueError(
                "sample_temperature and sample_rates are mutually "
                "exclusive mixture policies — pick one"
            )
        if (self.curriculum_col is None) != (self.curriculum_rates is None):
            raise ValueError(
                "curriculum_col and curriculum_rates go together"
            )
        if self.curriculum_rates is not None and (
            len(self.curriculum_rates) < 2
            or any(not 0.0 <= r <= 1.0 for r in self.curriculum_rates)
        ):
            raise ValueError(
                "curriculum_rates: need >= 2 per-bin rates in [0, 1]"
            )
        if (self.dsir_target is None) != (self.dsir_frac is None):
            raise ValueError("dsir_target and dsir_frac go together")
        if self.dsir_frac is not None and not 0.0 < self.dsir_frac <= 1.0:
            raise ValueError(
                f"dsir_frac must be in (0, 1], got {self.dsir_frac}"
            )
        if self.curriculum_edges is not None:
            if self.curriculum_rates is None:
                raise ValueError(
                    "curriculum_edges without curriculum_col/rates"
                )
            if len(self.curriculum_edges) != len(self.curriculum_rates) - 1:
                raise ValueError(
                    "curriculum_edges: need len(curriculum_rates)-1 "
                    f"= {len(self.curriculum_rates) - 1} thresholds, "
                    f"got {len(self.curriculum_edges)}"
                )


def score_clips(
    df: DataFrame,
    with_audio: bool = True,
    quality_model=None,
    with_audio_fp: bool = False,
) -> DataFrame:
    """clean + the three vectorized scorers. Lazy — no action triggered.

    Also stamps the advisory ``speech_rate`` column (words/sec,
    exprs.speech_rate_expr): a pure expr over cleaned columns, shared
    by the batch shard and the streaming path (both route through
    here), so curriculum/profile decisions keyed on it agree across
    ingestion paths. Never a keep rule — keep/drop is reference-pinned.

    ``quality_model``: a fitted ``qmodel.QualityModel`` — stamps the
    advisory ``model_quality_score`` column (one fused Python-free
    sigmoid over the signal columns this function just computed: the
    deployment half of ``--fit-quality-model``). Advisory like
    speech_rate: feeds ``--curriculum model_quality_score=...`` and
    profiling, never the keep/drop verdict.

    ``with_audio_fp``: also stamp ``audio_fp`` from the SAME window
    materialization as the stats (decode-once: with a real decoder a
    compressed payload decodes once for both signals instead of once
    per operator — udfs/audio.with_audio_stats_and_fingerprint). Set
    by the batch shard when ``--dedup-audio`` will mine the kept
    branch; the column is consumed by _dedup_kept_branch and dropped
    before anything lands."""
    from .functions.exprs import speech_rate_expr

    out = clean_clips(df)
    out = out.withColumn("speech_rate", speech_rate_expr())
    if "bytes" in out.columns:
        from .operators.validate import _H_NULL_BYTES, null_bytes_expr

        # stamp the null_bytes rule's boolean BEFORE the Arrow scorer
        # stage: the rule was the only post-UDF reader of the wide
        # payload, and this one byte per row lets Catalyst prune `bytes`
        # out of the Python-eval row queue for analytic consumers that
        # never land the audio (with_flags drops the helper) — r06
        out = out.withColumn(_H_NULL_BYTES, null_bytes_expr())
    # fused langid+perplexity: one Arrow round trip and one shared
    # tokenize/trigram-hash pass instead of two (udfs/textscore.py;
    # bit-identical to with_langid + with_perplexity by the
    # score_from_hashes contract)
    out = with_text_scores(out)
    if with_audio:
        if with_audio_fp:
            from .udfs.audio import with_audio_stats_and_fingerprint

            out = with_audio_stats_and_fingerprint(out)
        else:
            out = with_audio_stats(out)
    if quality_model is not None:
        from .operators.qmodel import with_quality_score

        out = with_quality_score(out, quality_model)
    return out


def flag_clips(scored: DataFrame, with_audio: bool = True) -> DataFrame:
    """Attach reasons/keep/severity (all rules in one projection) + the
    duplicate-id flag (the one required shuffle)."""
    flagged = with_flags(scored, active_rules(with_audio))
    flagged = with_duplicate_flag(flagged, "clip_id")
    return merge_duplicate_reason(flagged)


def salted_repartition(
    df: DataFrame, buckets: int, lang: str = "lang", key: str = "clip_id"
) -> DataFrame:
    """Spread skewed language buckets: partition by (lang, salt) where
    salt = pmod(xxhash64(key), buckets). Deterministic (no rand()) so
    retried tasks and resumed runs produce identical layouts."""
    salt = F.pmod(F.xxhash64(F.col(key)), F.lit(buckets)).alias("_salt")
    n = df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    return df.repartition(int(n), F.col(lang), salt)


def _shard_expr(key: str, n_shards: int) -> F.Column:
    return F.pmod(F.xxhash64(F.col(key)), F.lit(n_shards))


def _find_committed_write(
    store: TableStore, table: str, match: dict
) -> str | None:
    """Snapshot id of a write whose properties contain ``match`` and
    which is REACHABLE from the table's current view, else None. The
    shard/requeue guards use this to make multi-table commits
    crash-safe: a rerun after a crash BETWEEN a table append and the
    lineage/marker write must skip the append instead of duplicating it
    (the streaming sink's batch_committed is the same pattern).

    Reachability matters for rollback recovery: `rollback` moves
    'current' without deleting history, so a rolled-back shard append is
    still in the manifest — matching it would mark data the current
    view does NOT contain as 'already committed' and the redo would
    silently skip it."""
    if not store.exists(table):
        return None
    current = store.current_snapshot(table)
    reachable = set((current or {}).get("read_set", []))
    records = store.property_records(table)
    # transitive closure through compactions: a compact snapshot's
    # absorbed_read_set lists the dirs it REWROTE — their data is still
    # part of the current view even though the dirs themselves left the
    # read_set (and may be deleted). Without the closure, a crash-rerun
    # after compact+expire would re-append a shard the view contains.
    changed = True
    while changed:
        changed = False
        for s in records:
            if f"snap_{s['id']}" in reachable:
                absorbed = set(
                    s.get("properties", {}).get("absorbed_read_set")
                    or []
                ) - reachable
                if absorbed:
                    reachable |= absorbed
                    changed = True
    # property_records includes snapshots whose manifest entry was
    # GC'd by expire_snapshots while their appended data stayed in the
    # current view — the reachability check below still gates on the
    # data actually being part of the table
    for s in records:
        if f"snap_{s['id']}" not in reachable:
            continue
        props = s.get("properties", {})
        if all(props.get(k) == v for k, v in match.items()):
            return s["id"]
    return None


def _history_before(
    store: TableStore, table: str, match: dict
) -> DataFrame | None:
    """Signature history AS OF before this shard's own append — the
    replay-safe read (the batch twin of the streaming sink's
    _sig_history_before_batch). A crash AFTER the history append but
    before the lineage row replays the shard; reading the CURRENT
    snapshot would then include the shard's own signatures, so every
    clip would 'duplicate' its own committed copy and the replay would
    quarantine clips the first attempt kept. Reading the parent of the
    shard's own committed append keeps every replay's dedup routing
    identical to the first attempt."""
    if not store.exists(table):
        return None
    # live manifest entries carry `parent` (property_records strips it);
    # a crash-rerun happens while its append is still live, same
    # retention argument as the streaming twin
    for s in store.snapshots(table):
        props = s.get("properties", {})
        if all(props.get(k) == v for k, v in match.items()):
            parent = s.get("parent")
            return store.read(table, parent) if parent else None
    return store.read(table)


def _dedup_kept_branch(
    kept_src: DataFrame,
    cfg: RunConfig,
    store: TableStore,
    shard_props: dict,
) -> tuple[DataFrame, DataFrame | None, DataFrame | None,
           DataFrame | None, dict]:
    """Cross-run dedup of the kept branch against the out_root's
    persisted signature history: exact transcript hash first (cheap,
    catches re-uploads verbatim), then audio spectral fingerprint over
    the remainder (catches re-encodes / re-noised copies of the same
    master). Returns ``(survivors, dup_rows, new_hashes, new_fps,
    counts, cached)`` where dup_rows is (clip_id, reason) for
    quarantine routing, new_hashes / new_fps are the SURVIVORS'
    signatures for the caller to append after the data writes commit
    (crash protocol: _history_before), and cached lists the frames the
    stage pinned — unpersist once the signature appends land.

    Works across shards within one run too: shard k's append is
    committed history by the time shard k+1 mines. All routing is
    deterministic (hash anti-join; min-id or argmax-quality within
    batch; greater clip_id loses a new-new audio pair), so crash
    replays and task retries route identically."""
    from .operators.dedup import (
        audio_near_dup_pairs_incremental,
        dedup_exact_incremental,
    )

    counts: dict = {}
    dup_parts: list[DataFrame] = []
    cached: list[DataFrame] = []
    new_hashes = new_fps = None
    if cfg.dedup_content:
        hist = _history_before(store, CONTENT_HASH_TABLE, shard_props)
        survivors, new_hashes = dedup_exact_incremental(
            kept_src, hist, "clip_id", "transcript",
            quality_col=cfg.dedup_quality_col,
        )
        dropped = kept_src.select("clip_id").join(
            survivors.select("clip_id"), "clip_id", "left_anti"
        )
        counts["content_dups"] = dropped.count()
        if counts["content_dups"]:
            dup_parts.append(
                dropped.withColumn("reason", F.lit(DUP_CONTENT_REASON))
            )
        kept_src = survivors
    if cfg.dedup_audio:
        hist = _history_before(store, AUDIO_FP_TABLE, shard_props)
        pairs, new_fps = audio_near_dup_pairs_incremental(
            kept_src, hist, "clip_id",
            max_hamming=cfg.dedup_audio_max_hamming,
            keep_flags=True,
            # decode-once: score_clips already stamped audio_fp from the
            # shared window materialization — reuse it instead of
            # re-extracting (and, with a real decoder, re-decoding)
            fp_col=(
                "audio_fp" if "audio_fp" in kept_src.columns else None
            ),
        )
        cached.append(new_fps)  # the operator's cached (id, fp) frame
        # the NEW side of a new-vs-history pair is the dup; for
        # new-vs-new the greater clip_id loses (same routing as the
        # streaming near-dup sink — deterministic across replays)
        dup_ids = pairs.select(
            F.when(F.col("new_a") & ~F.col("new_b"), F.col("id_a"))
            .when(F.col("new_b") & ~F.col("new_a"), F.col("id_b"))
            .otherwise(F.col("id_b"))
            .alias("clip_id")
        ).distinct()
        counts["audio_dups"] = dup_ids.count()
        if counts["audio_dups"]:
            dup_parts.append(
                dup_ids.withColumn("reason", F.lit(DUP_AUDIO_REASON))
            )
            kept_src = kept_src.join(dup_ids, "clip_id", "left_anti")
            # survivors only: a quarantined dup's fingerprint must not
            # become history (its survivor's already is)
            new_fps = new_fps.join(dup_ids, "clip_id", "left_anti")
    dup_rows = None
    if dup_parts:
        dup_rows = dup_parts[0]
        for p in dup_parts[1:]:
            dup_rows = dup_rows.unionByName(p)
    return kept_src, dup_rows, new_hashes, new_fps, counts, cached


def _merge_shard_report(
    report_data: dict, shard_report: dict, weight: int
) -> None:
    """Fold one shard's report pieces into the run-level ``report_data``
    so rendered reports describe the WHOLE run: completeness missing
    counts are summed (then pct recomputed), expectation pass-rates and
    stat averages are weighted by the shard's kept rows, stat min/max
    take the extremum. Accumulator state lives under ``_acc`` (popped
    before rendering)."""
    acc = report_data.setdefault("_acc", {"ge": {}, "stats": {}})
    w = max(int(weight), 0)

    comp = shard_report.get("completeness")
    if comp:
        tot = report_data.setdefault(
            "completeness", {"rows": 0, "columns": {}}
        )
        tot["rows"] += comp["rows"]
        for c, d in comp["columns"].items():
            cd = tot["columns"].setdefault(c, {"missing": 0})
            cd["missing"] += d["missing"]
        for cd in tot["columns"].values():
            cd["completeness_pct"] = (
                100.0 * (tot["rows"] - cd["missing"]) / tot["rows"]
                if tot["rows"]
                else 100.0
            )

    for e in shard_report.get("ge", []):
        a = acc["ge"].setdefault(
            e["name"], {"rw": 0.0, "w": 0, "mostly": e["mostly"]}
        )
        a["rw"] += e["pass_rate"] * w
        a["w"] += w
    if acc["ge"]:
        report_data["ge"] = [
            {
                "name": name,
                "pass_rate": rate,
                "mostly": a["mostly"],
                "success": rate >= a["mostly"],
            }
            for name, a in acc["ge"].items()
            for rate in [a["rw"] / a["w"] if a["w"] else 1.0]
        ]

    for k, v in (shard_report.get("stats") or {}).items():
        if v is None:
            continue
        if k.endswith("_min") or k.endswith("_max"):
            cur = acc["stats"].get(k)
            pick = min if k.endswith("_min") else max
            acc["stats"][k] = v if cur is None else pick(cur, v)
        else:
            a = acc["stats"].setdefault(k, {"vw": 0.0, "w": 0})
            a["vw"] += v * w
            a["w"] += w
    if acc["stats"]:
        report_data["stats"] = {
            k: (
                a if not isinstance(a, dict)
                else (a["vw"] / a["w"] if a["w"] else None)
            )
            for k, a in acc["stats"].items()
        }


def run_pipeline(
    spark: SparkSession,
    source: DataFrame | str,
    cfg: RunConfig,
) -> dict:
    """Execute the pipeline; returns the metrics document."""
    t_run = time.time()
    log = StageLog()
    # WAP: a branch-scoped handle routes EVERY table this run touches
    # (clean, quarantine, dedup/profile histories, lineage) onto the
    # staging branch — mainline stays byte-identical until
    # publish_branch, and a dropped branch leaves no trace anywhere,
    # including the signature histories (the "what never lands must
    # leave no trace" invariant, extended to the whole run)
    store = TableStore(
        spark, cfg.out_root, default_branch=cfg.wap_branch or None
    )

    # -- LOAD ---------------------------------------------------------------
    t0 = time.time()
    df = spark.read.parquet(source) if isinstance(source, str) else source
    log.record("load", "ok", t0)

    # -- IDEMPOTENCY (parity: rollback_manager.py:142-163) -------------------
    done_shards = _completed_shards(spark, store, cfg)
    if (
        not cfg.force
        and cfg.source_fingerprint
        and store.is_unchanged(CLEAN_TABLE, cfg.source_fingerprint)
        and len(done_shards) >= cfg.n_shards
    ):
        return {
            "run_id": cfg.run_id,
            "skipped": True,
            "reason": "source unchanged; all shards committed",
        }
    totals = {
        "total": 0, "kept": 0, "dropped": 0, "sampled_out": 0,
        "pii_rows": 0,
        "pii_emails": 0, "pii_phones": 0, "pii_ssns": 0, "pii_tox": 0,
    }
    gate_overall: GateResult | None = None
    # per-module report inputs, accumulated across shards via
    # _merge_shard_report (weighted merge; bounded samples keep the
    # first ones seen)
    report_data: dict = {"reason_histogram": [], "mask_samples": [],
                         "dlq_sample": []}
    reason_totals: dict[str, int] = {}
    cleaning_totals: dict[str, int] = {}

    for shard in range(cfg.n_shards):
        if shard in done_shards:
            continue
        shard_df = (
            df
            if cfg.n_shards == 1
            else df.filter(_shard_expr("clip_id", cfg.n_shards) == shard)
        )
        gate, stats, shard_report = _run_shard(
            spark, shard_df, shard, cfg, store, log
        )
        # run-level gate = the WORST shard decision, not the last one —
        # a 30%-failure quarantined shard must not be masked by a clean
        # final shard in the run document
        if gate_overall is None or _DECISION_RANK.get(
            gate.decision, 0
        ) > _DECISION_RANK.get(gate_overall.decision, 0):
            gate_overall = gate
        if gate.decision == HALT:
            # nothing was written for this shard — counting its stats
            # would report clips as kept that never landed, and a resumed
            # run would double-count them
            break
        for k in totals:
            totals[k] += stats.get(k, 0)
        # report pieces are merged ACROSS shards (not last-shard-wins):
        # ge pass-rates and stat averages weighted by the shard's kept
        # rows, completeness missing-counts summed — so the rendered
        # reports describe the whole run, consistent with the validation
        # totals next to them
        _merge_shard_report(
            report_data, shard_report, weight=stats.get("kept", 0)
        )
        for reason, n in shard_report.get("reason_histogram", []):
            reason_totals[reason] = reason_totals.get(reason, 0) + n
        for action, n in shard_report.get("cleaning", {}).items():
            cleaning_totals[action] = cleaning_totals.get(action, 0) + n
        for key in ("mask_samples", "dlq_sample"):
            if not report_data[key]:
                report_data[key] = shard_report.get(key, [])

    wall = time.time() - t_run
    halted = gate_overall is not None and gate_overall.decision == HALT
    metrics = {
        "run_id": cfg.run_id,
        "halted": halted,
        "stages": log.stages,
        "quality": {
            **totals,
            # a HALTed run with nothing committed must NOT masquerade as
            # a perfect run: keep_pct None keeps it out of keep-rate
            # consumers (trend history, dashboards) instead of feeding
            # them a fabricated 100.0.
            # sampled_out counts back INTO the keep rate: keep_pct is a
            # QUALITY metric (validation + dedup) and mixture selection
            # must not deflate it — enabling --sample-lang would
            # otherwise fire a spurious degradation alert and poison
            # the trailing trend baseline ('kept' alone stays the
            # landed count)
            "keep_pct": (
                100.0 * (totals["kept"] + totals["sampled_out"])
                / totals["total"]
                if totals["total"]
                else (None if halted else 100.0)
            ),
        },
        "gate": (
            {
                "decision": gate_overall.decision,
                "failure_pct": gate_overall.failure_pct,
            }
            if gate_overall
            else None
        ),
        "performance": {
            "wall_seconds": wall,
            "clips_per_sec": totals["total"] / wall if wall else 0.0,
            # the EFFECTIVE master, from the live context: a deploy that
            # silently fell back from local-cluster to local[N] is
            # visible in every report (get_spark once overrode
            # spark-submit's --master; this line keeps that honest)
            "master": spark.sparkContext.master,
        },
    }
    # trend check runs BEFORE save_metrics so the trailing window never
    # includes the current run; a degradation routes through notify.
    # A halted zero-work run contributes no keep-rate data point.
    from .metrics import alert_quality_trend

    if metrics["quality"]["keep_pct"] is not None:
        metrics["trend"] = alert_quality_trend(
            f"{cfg.out_root}/metrics", metrics["quality"]["keep_pct"]
        )
    else:
        metrics["trend"] = {"alert": False, "trailing_avg": None,
                            "runs": 0, "skipped": "halted"}
    # profile drift over the sketch history (latest shard row vs all
    # prior rows — hash-sharded shards of one corpus are statistically
    # identical, so drift stays quiet within a run and fires when a NEW
    # run's corpus moved). Monitoring side-channel: never fails the run.
    if cfg.profile_cols and not halted:
        from .operators.profile import (
            alert_profile_drift,
            profile_drift,
        )

        try:
            drift = profile_drift(
                store, PROFILE_TABLE, list(cfg.profile_cols),
                numeric_bins=cfg.profile_numeric,
            )
            metrics["profile_drift"] = drift
            alert_profile_drift(drift)
        except Exception as exc:  # noqa: BLE001 — monitoring only
            _log.warning("profile drift check failed (run continues): %s",
                         exc)
            metrics["profile_drift"] = {"error": str(exc)}
    save_metrics(metrics, f"{cfg.out_root}/metrics", cfg.run_id)
    from .metrics import save_alert_rules, save_dashboard

    save_alert_rules(f"{cfg.out_root}/monitoring")
    save_dashboard(f"{cfg.out_root}/monitoring")
    if cfg.pushgateway_url:
        from .metrics import push_to_gateway

        # monitoring side-channel: a gateway outage must never fail a run
        # whose data is already committed (same rule as the review audit
        # log in control.py) — record and continue
        try:
            push_to_gateway(
                metrics, cfg.pushgateway_url, transport=cfg.push_transport
            )
        except Exception as exc:  # noqa: BLE001 — any transport failure
            _log.warning("pushgateway export failed (run continues): %s",
                         exc)
            metrics["pushgateway_error"] = str(exc)
    if cfg.module_reports and totals["total"]:
        import json as _json
        import os as _os

        from .report import save_module_reports

        report_data.pop("_acc", None)
        report_data["quality"] = metrics["quality"]
        report_data["reason_histogram"] = sorted(
            reason_totals.items(), key=lambda kv: (-kv[1], kv[0])
        )
        report_data["cleaning"] = cleaning_totals
        review: dict = {
            "decision": gate_overall.decision if gate_overall else "n/a",
            "failure_pct": (
                gate_overall.failure_pct if gate_overall else 0.0
            ),
            "audit": [],
        }
        if cfg.review_decision_file:
            audit_path = f"{cfg.review_decision_file}.audit.jsonl"
            if _os.path.exists(audit_path):
                with open(audit_path) as f:
                    rows = [
                        _json.loads(ln) for ln in f if ln.strip()
                    ]
                review["audit"] = rows[-20:]
        report_data["review"] = review
        save_module_reports(
            report_data, f"{cfg.out_root}/reports", cfg.run_id
        )
    return metrics


def _load_quality_model(cfg: RunConfig):
    """Deserialize the distilled quality model once per call site (a
    tiny JSON read; the model itself becomes plan literals). Raises
    loudly on a missing/garbled file — silently scoring without the
    requested model would be a quiet data-quality lie."""
    if not cfg.quality_model_json:
        return None
    from .operators.qmodel import QualityModel

    with open(cfg.quality_model_json) as f:
        doc = json.load(f)
    return QualityModel.from_dict(doc.get("model", doc))


def _run_shard(
    spark: SparkSession,
    df: DataFrame,
    shard: int,
    cfg: RunConfig,
    store: TableStore,
    log: StageLog,
) -> tuple[GateResult, dict, dict]:
    # -- CLEAN + SCORE + VALIDATE (one lazy DAG) -----------------------------
    t0 = time.time()
    flagged = flag_clips(
        score_clips(
            df, cfg.with_audio, _load_quality_model(cfg),
            # decode-once: when --dedup-audio will mine the kept branch,
            # the fingerprint rides the SAME window materialization as
            # the stats (one decode per compressed payload per pass)
            with_audio_fp=cfg.dedup_audio and cfg.with_audio,
        ),
        cfg.with_audio,
    )
    if cfg.cache_flagged:
        flagged = flagged.cache()

    stats = keep_stats(flagged)  # triggers the single evaluation
    log.record("validate", "ok", t0, **stats)

    # -- THRESHOLD GATE (parity: pipeline.py:302-369) ------------------------
    gate = threshold_gate(
        stats["total"],
        stats["dropped"],
        cfg.thresholds,
        cfg.review_decision_file,
        cfg.non_interactive,
    )
    if gate.decision == HALT:
        log.record("gate", "halt", t0)
        if cfg.cache_flagged:
            flagged.unpersist()
        return gate, stats, {}

    # crash-safe shard commit: the lineage row (the resume marker) is
    # written LAST, so a crash after this append but before lineage makes
    # the rerun reprocess the shard — the (fingerprint, shard, n_shards)
    # property match skips the re-append instead of duplicating clips
    shard_props = {
        "shard": shard,
        "n_shards": cfg.n_shards,
        "source_fingerprint": cfg.source_fingerprint,
    }

    # -- KEEP BRANCH: [sample] -> [cross-run dedup] -> scrub -> write --------
    t0 = time.time()
    kept_src = flagged.filter(F.col("keep")).drop(
        "reasons", "severity", "keep"
    )
    # -- MIXTURE SAMPLE (deterministic, operators/sampling.py) ---------------
    # sampling runs BEFORE dedup mining: a sampled-out clip must leave
    # NO trace in the dedup histories — its content never landed, so a
    # later re-upload of the same content must not quarantine against a
    # phantom survivor
    if cfg.sample_rates is not None or cfg.sample_temperature is not None:
        sample_stats: dict = {}
        if cfg.sample_temperature is not None:
            from .operators.sampling import temperature_mix

            kept_src = temperature_mix(
                kept_src, "lang", cfg.sample_temperature, "clip_id",
                seed=cfg.sample_seed, stats_out=sample_stats,
            )
        else:
            from .operators.sampling import stratified_sample

            kept_src = stratified_sample(
                kept_src, "lang", cfg.sample_rates, "clip_id",
                default_rate=cfg.sample_default_rate, seed=cfg.sample_seed,
            )
            sample_stats["rates"] = dict(cfg.sample_rates)
        # kept-before is already known (stats); only after needs a job
        n_after = kept_src.count()
        sampled_out = stats["kept"] - n_after
        stats["sampled_out"] = sampled_out
        stats["kept"] = n_after
        # keep_pct deliberately NOT recomputed here: it is the QUALITY
        # keep rate (validation + dedup drops). Folding mixture
        # selection in would tank it and fire a spurious
        # quality-degradation trend alert the first time --sample-lang
        # is enabled — sampled-out clips are valid data
        log.record(
            "sample", "ok", t0,
            sampled_out=sampled_out, kept=n_after,
            rates=sample_stats.get("rates", {}),
            **(
                {"temperature": cfg.sample_temperature,
                 "unmet": sample_stats.get("unmet", {})}
                if cfg.sample_temperature is not None else {}
            ),
        )
        t0 = time.time()
    # -- DSIR DOMAIN SELECTION (optional): keep the dsir_frac of kept
    # clips whose hashed-n-gram transcript profile best matches the
    # target parquet. BEFORE dedup for the sampling-ordering reason
    # (selected-out clips leave no signature history); own hash
    # domains ('dsir_feat'/'dsir_gumbel'), so it composes with the
    # mixture and curriculum filters at equal seeds (DESIGN #23).
    if cfg.dsir_target is not None:
        from .operators.selection import importance_resample

        dsir_stats: dict = {}
        target_df = kept_src.sparkSession.read.parquet(cfg.dsir_target)
        kept_src = importance_resample(
            kept_src, target_df, "clip_id", "transcript",
            target_text_col=cfg.dsir_text_col,
            temperature=cfg.dsir_temperature, seed=cfg.sample_seed,
            mode="threshold", keep_frac=cfg.dsir_frac,
            stats_out=dsir_stats,
        )
        n_after = kept_src.count()
        dsir_out = stats["kept"] - n_after
        stats["sampled_out"] = stats.get("sampled_out", 0) + dsir_out
        stats["kept"] = n_after
        log.record(
            "dsir_select", "ok", t0,
            target=cfg.dsir_target, keep_frac=cfg.dsir_frac,
            dsir_out=dsir_out, kept=n_after,
            threshold_key=round(dsir_stats["threshold_key"], 6),
        )
        t0 = time.time()
    # -- QUALITY CURRICULUM (optional): quantile-bin the score column,
    # keep bin k at rate k. Before dedup for the same reason as the
    # mixture sample: a curriculum-dropped clip leaves no signature.
    # Own hash domain — composes independently with the mixture filter
    # at equal seeds (pinned by a joint-distribution test).
    if cfg.curriculum_col is not None:
        from .operators.sampling import curriculum_filter

        cur_stats: dict = {}
        kept_src = curriculum_filter(
            kept_src, cfg.curriculum_col, list(cfg.curriculum_rates),
            "clip_id", seed=cfg.sample_seed, edges=cfg.curriculum_edges,
            stats_out=cur_stats,
        )
        n_after = kept_src.count()
        cur_out = stats["kept"] - n_after
        stats["sampled_out"] = stats.get("sampled_out", 0) + cur_out
        stats["kept"] = n_after
        log.record(
            "curriculum", "ok", t0,
            col=cfg.curriculum_col, curriculum_out=cur_out,
            kept=n_after, rates=list(cfg.curriculum_rates),
            bin_edges=[round(e, 4) for e in cur_stats["bin_edges"]],
        )
        t0 = time.time()
    dup_rows = new_hashes = new_fps = None
    # -- DECONTAMINATION (optional): BEFORE dedup, so a contaminated
    # clip never lands a signature in the dedup history (a later
    # re-upload of the same contaminated audio must be judged on its
    # own, not deduped against a clip that never entered the corpus)
    if cfg.decontam_heldout:
        from .operators.dedup import decontaminate

        heldout = kept_src.sparkSession.read.parquet(
            cfg.decontam_heldout
        )
        cont_ids = decontaminate(
            kept_src, heldout, "clip_id", "transcript",
            heldout_text_col=cfg.decontam_text_col,
            shingle_k=cfg.decontam_k,
            min_hits=cfg.decontam_min_hits,
        ).select("clip_id")
        n_cont = cont_ids.count()
        if n_cont:
            dup_rows = cont_ids.withColumn(
                "reason", F.lit(CONTAMINATION_REASON)
            )
            kept_src = kept_src.join(cont_ids, "clip_id", "left_anti")
            # contamination is a QUALITY drop: unlike sampling it
            # counts against keep_pct (and quarantines terminally)
            stats["kept"] -= n_cont
            stats["dropped"] += n_cont
            if stats.get("total"):
                stats["keep_pct"] = (
                    100.0
                    * (stats["kept"] + stats.get("sampled_out", 0))
                    / stats["total"]
                )
        log.record(
            "decontaminate", "ok", t0,
            contaminated=n_cont, k=cfg.decontam_k,
            min_hits=cfg.decontam_min_hits,
        )
        t0 = time.time()
    dedup_cached: list[DataFrame] = []
    if cfg.dedup_content or cfg.dedup_audio:
        (kept_src, dedup_rows, new_hashes, new_fps, dd,
         dedup_cached) = _dedup_kept_branch(
            kept_src, cfg, store, shard_props
        )
        if dedup_rows is not None:
            # decontamination rows (if any) accumulate, never overwrite
            dup_rows = (
                dedup_rows if dup_rows is None
                else dup_rows.unionByName(dedup_rows)
            )
        n_dups = sum(dd.values())
        # run totals report what LANDED: a deduped clip is dropped (it
        # quarantines with a terminal reason), not kept. keep_pct is
        # the QUALITY rate: dups count against it, sampled-out clips
        # (valid data, mixture-excluded) count back in
        stats["kept"] -= n_dups
        stats["dropped"] += n_dups
        if stats.get("total"):
            stats["keep_pct"] = (
                100.0
                * (stats["kept"] + stats.get("sampled_out", 0))
                / stats["total"]
            )
        log.record("dedup", "ok", t0, **dd)
        t0 = time.time()
    # the decode-once fingerprint column is dedup-internal — it must
    # not change the clips_clean schema (drop is a no-op when absent)
    kept_src = kept_src.drop("audio_fp")
    if cfg.split_fractions is not None:
        from .operators.sampling import with_split

        kept_src = with_split(
            kept_src, "clip_id", cfg.split_fractions, seed=cfg.split_seed
        )
    kept_pre = scrub_transcripts(kept_src)
    # -- TOKEN PACKING (optional): chunk assignment over the scrubbed
    # transcript's whitespace tokens, grouped by (lang[, split]) within
    # THIS shard. Chunk identity is (pack_run, lang[, split],
    # pack_shard, chunk_id): pack_run scopes it to this producer run —
    # a later incremental run appended to the same table restarts its
    # own chunk ids, and a consumer grouping without pack_run would
    # otherwise concatenate unrelated documents into one "chunk"
    if cfg.pack_budget is not None:
        from .operators.packing import with_training_chunks

        kept_pre = with_training_chunks(
            kept_pre, cfg.pack_budget, cfg.run_id, shard,
            include_split=cfg.split_fractions is not None,
        )
    # aggregates below run on kept_pre (pre-repartition): the salted
    # shuffle exists only for the write's file layout, and paying it
    # again for two scalar aggs would re-shuffle the audio bytes twice
    kept = salted_repartition(kept_pre, cfg.salt_buckets)
    # without a fingerprint two unrelated runs into the same out_root
    # would false-match each other's shards — guard only when stamped
    clean_sid = (
        _find_committed_write(store, CLEAN_TABLE, shard_props)
        if cfg.source_fingerprint and not cfg.force
        else None
    )
    if clean_sid is None:
        clean_sid = store.write(
            CLEAN_TABLE,
            kept,
            mode="append" if store.exists(CLEAN_TABLE) else "overwrite",
            partition_by=(
                ["lang", "split"] if cfg.split_fractions else ["lang"]
            ),
            properties={"run_id": cfg.run_id, **shard_props},
        )
        log.record("clean_write", "ok", t0, snapshot=clean_sid)
    else:
        log.record("clean_write", "skipped_already_committed", t0,
                   snapshot=clean_sid)

    # -- SKETCH PROFILE of what landed (one HLL row per shard). The
    # replay guard scans ALL committed property records
    # (_find_committed_write), NOT the last-commit fingerprint —
    # profile_history is shared with stream batches, so an interleaved
    # writer between a crash and its replay must not defeat the skip
    # (double-appending would double-count the additive row/null
    # counters). Empty shards (all-dup / fully sampled-out) append
    # nothing: a rows=0 row would trip the drift batch-size band.
    if cfg.profile_cols and stats["kept"] > 0:
        from .operators.profile import append_profile_row

        t0 = time.time()
        already = (
            _find_committed_write(store, PROFILE_TABLE, shard_props)
            if cfg.source_fingerprint and not cfg.force
            else None
        )
        if already is None:
            append_profile_row(
                store, PROFILE_TABLE, kept_pre,
                list(cfg.profile_cols),
                numeric_bins=cfg.profile_numeric,
                properties={"run_id": cfg.run_id, **shard_props},
            )
            log.record("sketch_profile", "ok", t0,
                       cols=list(cfg.profile_cols))
        else:
            log.record("sketch_profile", "skipped_already_committed",
                       t0, cols=list(cfg.profile_cols))
        # same small-file maintenance as the dedup histories: one tiny
        # dir accretes per shard/batch (stream batches share this
        # table); compact folds the view, carrying the fingerprint
        # guard and batch_idx rows through
        if (
            cfg.history_compact_dirs is not None
            and not cfg.wap_branch  # compaction is mainline-only
            and store.exists(PROFILE_TABLE)
        ):
            cur = store.current_snapshot(PROFILE_TABLE)
            if cur and len(cur["read_set"]) > cfg.history_compact_dirs:
                store.compact(PROFILE_TABLE)

    # -- DROP BRANCH: quarantine/DLQ (parity: dead_letter_queue.py) ----------
    t0 = time.time()
    quarantined = (
        flagged.filter(~F.col("keep"))
        .select(
            "clip_id",
            "reasons",
            "severity",
            F.lit("validate").alias("stage"),
            F.lit(cfg.run_id).alias("run_id"),
            F.current_timestamp().alias("ts"),
            F.lit(0).alias("retry_count"),
        )
    )
    if dup_rows is not None:
        quarantined = quarantined.unionByName(
            dup_rows.select(
                "clip_id",
                F.array("reason").alias("reasons"),
                F.lit("MEDIUM").alias("severity"),
                F.when(
                    F.col("reason") == CONTAMINATION_REASON,
                    F.lit("decontaminate"),
                ).otherwise(F.lit("dedup")).alias("stage"),
                F.lit(cfg.run_id).alias("run_id"),
                F.current_timestamp().alias("ts"),
                # terminal from the start: duplicates never requeue
                # (requeue_quarantine filters TERMINAL_REASONS too)
                F.lit(0).alias("retry_count"),
            )
        )
    if gate.decision != DISCARD:
        q_sid = (
            _find_committed_write(store, QUARANTINE_TABLE, shard_props)
            if cfg.source_fingerprint and not cfg.force
            else None
        )
        if q_sid is None:
            q_sid = store.write(
                QUARANTINE_TABLE,
                quarantined,
                mode="append"
                if store.exists(QUARANTINE_TABLE)
                else "overwrite",
                properties={"run_id": cfg.run_id, **shard_props},
            )
            log.record("quarantine", "ok", t0, snapshot=q_sid)
        else:
            log.record("quarantine", "skipped_already_committed", t0,
                       snapshot=q_sid)
    else:
        log.record("quarantine", "skipped_discard", t0)

    # -- DEDUP HISTORY APPENDS (survivors only, committed AFTER the data
    # writes so a crash replays against the pre-append history — see
    # _history_before) -------------------------------------------------------
    for table, sigs in (
        (CONTENT_HASH_TABLE, new_hashes),
        (AUDIO_FP_TABLE, new_fps),
    ):
        if sigs is None:
            continue
        already = (
            _find_committed_write(store, table, shard_props)
            if cfg.source_fingerprint and not cfg.force
            else None
        )
        if already is None:
            store.write(
                table, sigs,
                mode="append" if store.exists(table) else "overwrite",
                properties={"run_id": cfg.run_id, **shard_props},
            )
        # opportunistic small-file maintenance: one dir accretes per
        # shard per run; past the threshold, fold the view into one
        # snapshot (compact aborts on a concurrent commit — next run
        # retries)
        if (
            cfg.history_compact_dirs is not None
            and not cfg.wap_branch  # compaction is mainline-only
            and store.exists(table)
        ):
            cur = store.current_snapshot(table)
            if cur and len(cur["read_set"]) > cfg.history_compact_dirs:
                store.compact(table)
    for c in dedup_cached:
        c.unpersist()

    # -- GE VALIDATE + PII (parity: reference stages 10-11) ------------------
    # one aggregate pass over the cached kept branch: the expectation
    # suite and the PII row count share a single df.agg (extra_aggs)
    t0 = time.time()
    from .operators.expectations import clips_suite, evaluate_suite
    from .operators.scrub import pii_type_agg_cols

    # distribution stats for the statistical report piggyback on the same
    # single pass (statistical_validator.py:249-253 parity)
    stat_aggs = {
        "dur_ms_avg": F.avg("dur_ms"),
        "dur_ms_min": F.min("dur_ms").cast("double"),
        "dur_ms_max": F.max("dur_ms").cast("double"),
        "ppl_avg": F.avg("ppl"),
        "lang_conf_avg": F.avg("lang_conf"),
    }
    if cfg.with_audio:
        stat_aggs["snr_db_avg"] = F.avg("snr_db")
        stat_aggs["rms_avg"] = F.avg("rms")
    ge, extras = evaluate_suite(
        kept_pre,
        clips_suite(),
        extra_aggs={
            "pii_rows": F.sum((F.col("pii_hits") > 0).cast("long")),
            # per-type scrub counters share the same single pass
            # (parity: reference pii_detector.py:168-176)
            **pii_type_agg_cols("transcript"),
            **stat_aggs,
        },
    )
    ge_failed = [r["name"] for r in ge if not r["success"]]
    log.record(
        "ge_validate",
        "ok" if not ge_failed else "violations",
        t0,
        checks=len(ge),
        failed=len(ge_failed),
        **({"failing": ge_failed[:5]} if ge_failed else {}),
    )
    pii_rows = int(extras["pii_rows"] or 0)
    pii_types = {
        k: int(extras[k] or 0)
        for k in ("pii_emails", "pii_phones", "pii_ssns", "pii_tox")
    }
    log.record("pii", "ok", t0, rows_with_pii=pii_rows, **pii_types)

    # -- LINEAGE (enables resume) ---------------------------------------------
    t0 = time.time()
    comp = completeness(df, ["clip_id", "transcript", "codec"])
    # per-shard langid distribution + duplicate tally ride in the lineage
    # row (north rule: per-partition lineage carries profiling metrics —
    # null rates, dedup counts, langid distribution). One agg over the
    # cached flagged df; output bounded by language cardinality, not rows.
    lang_rows = (
        flagged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.array_contains("reasons", "duplicate_clip_id")
                .cast("long")
            ).alias("dups"),
        )
        .collect()
    )
    lang_hist = {(r["lang"] or "unknown"): int(r["n"]) for r in lang_rows}
    dup_count = sum(int(r["dups"] or 0) for r in lang_rows)
    lineage_row = spark.createDataFrame(
        [
            (
                cfg.run_id,
                cfg.source_fingerprint,
                shard,
                cfg.n_shards,
                "complete",
                stats["total"],
                stats["kept"],
                stats["dropped"],
                pii_rows,
                float(comp["columns"]["transcript"]["completeness_pct"]),
                dup_count,
                lang_hist,
                clean_sid,
            )
        ],
        "run_id string, source_fingerprint string, shard int, n_shards int, "
        "status string, total long, kept long, dropped long, pii_rows long, "
        "transcript_completeness double, dup_count long, "
        "lang_hist map<string,long>, clean_snapshot string",
    )
    store.write(
        LINEAGE_TABLE,
        lineage_row,
        mode="append" if store.exists(LINEAGE_TABLE) else "overwrite",
    )
    log.record("lineage", "ok", t0, shard=shard)

    # -- MODULE-REPORT SAMPLES (bounded collects on the CACHED df only) ------
    shard_report: dict = {"ge": ge, "completeness": comp}
    if cfg.module_reports:
        from .operators.profile import reason_histogram

        shard_report["stats"] = {
            k: (float(extras[k]) if extras[k] is not None else None)
            for k in stat_aggs
        }
        shard_report["reason_histogram"] = [
            (r["reason"], int(r["n"]))
            for r in reason_histogram(flagged).limit(50).collect()
        ]
        shard_report["mask_samples"] = [
            {"clip_id": r["clip_id"], "before": r["transcript"],
             "after": r["transcript_scrubbed"]}
            for r in kept_pre.filter(F.col("pii_hits") > 0)
            .select("clip_id", "transcript", "transcript_scrubbed")
            .limit(2).collect()
        ]
        shard_report["dlq_sample"] = [
            {"clip_id": r["clip_id"], "reasons": list(r["reasons"]),
             "severity": r["severity"]}
            for r in quarantined
            .select("clip_id", "reasons", "severity")
            .limit(20).collect()
        ]
        # rows-changed-per-action counters for the cleaning log
        # (reference cleaner.py:71-76): one agg over the RAW shard,
        # column-pruned to the cleaned text columns (bytes never read)
        from .operators.clean import cleaning_counts, clips_cleaning_exprs

        shard_report["cleaning"] = cleaning_counts(
            df,
            {
                f"normalize:{c}": e
                for c, e in clips_cleaning_exprs().items()
            },
        )

    if cfg.cache_flagged:
        flagged.unpersist()
    stats["pii_rows"] = pii_rows
    stats.update(pii_types)
    return gate, stats, shard_report


def active_quarantine(df: DataFrame) -> DataFrame:
    """Quarantine rows representing clips that are still UNRESOLVED.

    ``requeue_quarantine`` appends resolution markers
    (stage='requeue_resolved', severity='RESOLVED') as retry-cap
    bookkeeping while the clip's ORIGINAL quarantine rows stay in the
    table; a recovered clip therefore has both. Consumers that count or
    list quarantined clips get the marker rows removed AND every row
    OLDER than the clip's latest marker. The time scoping matters: a
    clip legitimately RE-quarantined after an earlier resolution (a
    degraded re-upload) has rows NEWER than its marker, and those must
    stay visible — an all-time anti-join would hide the clip forever.
    The per-clip marker-ts aggregate is key-only and broadcast by AQE."""
    resolved = (
        df.filter(F.col("stage") == "requeue_resolved")
        .groupBy("clip_id")
        .agg(F.max("ts").alias("_resolved_ts"))
    )
    return (
        df.filter(F.col("stage") != "requeue_resolved")
        .join(resolved, "clip_id", "left")
        .filter(
            F.col("_resolved_ts").isNull()
            | (F.col("ts") > F.col("_resolved_ts"))
        )
        .drop("_resolved_ts")
    )


def requeue_quarantine(
    spark: SparkSession,
    cfg: RunConfig,
    source: DataFrame | str,
    max_retries: int = 3,
) -> dict:
    """Re-drive quarantined clips (parity: DLQ retry bookkeeping,
    reference dead_letter_queue.py:118-127): re-run the pipeline on the
    subset of source rows whose clip_id sits in quarantine with
    retry_count < max_retries; successes land in clips_clean AND get a
    resolution marker (stage=requeue_resolved, retry_count=max_retries)
    so later requeue runs never re-append them; failures are
    re-quarantined with retry_count + 1.
    """
    store = TableStore(spark, cfg.out_root)
    if not store.exists(QUARANTINE_TABLE):
        return {"requeued": 0}
    q = store.read(QUARANTINE_TABLE)
    # a clip is eligible while its HIGHEST attempt AMONG ACTIVE rows is
    # below the cap (max-then-filter; filter-then-max would keep a clip
    # eligible forever through its older low-retry rows). Active =
    # newer than the clip's latest resolution marker: a resolved clip
    # has no active rows (retired, as before), but one legitimately
    # RE-quarantined after a past resolution counts only its NEW
    # attempts — the marker's retry_count=cap must not block it.
    active = active_quarantine(q)
    # duplicate quarantines are TERMINAL (TERMINAL_REASONS): the dup's
    # survivor is already in clips_clean, so a retry can never
    # legitimately succeed — re-driving one would append duplicate
    # content. Any active row carrying a terminal reason retires the
    # clip from eligibility regardless of retry_count.
    terminal = (
        active.filter(
            F.arrays_overlap(
                "reasons",
                F.array(*[F.lit(r) for r in TERMINAL_REASONS]),
            )
        )
        .select("clip_id")
        .distinct()
    )
    eligible = (
        active
        .groupBy("clip_id")
        .agg(F.max("retry_count").alias("retry_count"))
        .filter(F.col("retry_count") < max_retries)
        .join(terminal, "clip_id", "left_anti")
    )
    df = spark.read.parquet(source) if isinstance(source, str) else source
    subset = df.join(eligible.select("clip_id"), "clip_id", "left_semi")
    n = subset.count()
    if n == 0:
        return {"requeued": 0}

    flagged = flag_clips(
        score_clips(subset, cfg.with_audio, _load_quality_model(cfg)),
        cfg.with_audio,
    )
    flagged = flagged.cache()
    kept = scrub_transcripts(
        flagged.filter(F.col("keep")).drop("reasons", "severity", "keep")
    )
    # a re-driven clip flows through the SAME deterministic sampling /
    # split as the shard path: the hash-of-clip_id decision is the one
    # it would have received had it passed validation the first time
    # (a sampled-out recovered clip still gets its resolution marker —
    # it is valid data the mixture did not select)
    if cfg.sample_rates is not None:
        from .operators.sampling import stratified_sample

        kept = stratified_sample(
            kept, "lang", cfg.sample_rates, "clip_id",
            default_rate=cfg.sample_default_rate, seed=cfg.sample_seed,
        )
    if cfg.split_fractions is not None:
        from .operators.sampling import with_split

        kept = with_split(
            kept, "clip_id", cfg.split_fractions, seed=cfg.split_seed
        )
    # crash guard (same pattern as the shard commit): a crash between
    # this append and the resolution-marker write below leaves the clips
    # eligible — the rerun must skip the re-append, not duplicate them.
    # The key is (source_fingerprint, attempt#) — DELIBERATELY not
    # run_id, which the CLI regenerates per invocation, so a crash-rerun
    # of the same command still matches. attempt# counts the COMMITTED
    # marker snapshots for this fingerprint: a deliberate next re-drive
    # (markers committed) gets a new attempt# and proceeds, while a
    # crash-rerun (markers missing) matches and skips.
    # source_fingerprint also keeps the run-level idempotency
    # short-circuit (is_unchanged) intact over a requeue snapshot.
    attempt = sum(
        1
        for s in (
            store.property_records(QUARANTINE_TABLE)
            if store.exists(QUARANTINE_TABLE)
            else []
        )
        if s.get("properties", {}).get("requeue")
        and s.get("properties", {}).get("source_fingerprint")
        == cfg.source_fingerprint
    )
    requeue_props = {
        "requeue": True,
        "requeue_run": cfg.run_id,
        "requeue_key": f"{cfg.source_fingerprint}:requeue:{attempt}",
        "source_fingerprint": cfg.source_fingerprint,
    }
    if cfg.source_fingerprint and not cfg.force and _find_committed_write(
        store, CLEAN_TABLE, {"requeue_key": requeue_props["requeue_key"]}
    ) is not None:
        _log.warning(
            "requeue clean append skipped: attempt %s already committed "
            "(crash-rerun)", requeue_props["requeue_key"],
        )
    else:
        store.write(
            CLEAN_TABLE, salted_repartition(kept, cfg.salt_buckets),
            mode="append" if store.exists(CLEAN_TABLE) else "overwrite",
            partition_by=(
                ["lang", "split"] if cfg.split_fractions else ["lang"]
            ),
            properties={"run_id": cfg.run_id, **requeue_props},
        )
    still_bad = (
        flagged.filter(~F.col("keep"))
        .join(eligible, "clip_id", "left")
        .select(
            "clip_id",
            "reasons",
            "severity",
            F.lit("requeue").alias("stage"),
            F.lit(cfg.run_id).alias("run_id"),
            F.current_timestamp().alias("ts"),
            (F.coalesce(F.col("retry_count"), F.lit(0)) + 1).alias(
                "retry_count"
            ),
        )
    )
    # resolution markers: a recovered clip's max retry_count jumps to the
    # cap, so the eligibility filter (max < max_retries) retires it — a
    # third requeue run cannot append it to clips_clean a second time
    recovered = flagged.filter(F.col("keep")).select(
        "clip_id",
        F.array().cast("array<string>").alias("reasons"),
        F.lit("RESOLVED").alias("severity"),
        F.lit("requeue_resolved").alias("stage"),
        F.lit(cfg.run_id).alias("run_id"),
        F.current_timestamp().alias("ts"),
        F.lit(max_retries).alias("retry_count"),
    )
    # the marker write is the requeue's commit point (analogous to the
    # shard lineage row) — written last, never skipped
    store.write(
        QUARANTINE_TABLE, still_bad.unionByName(recovered),
        mode="append",
        properties={"run_id": cfg.run_id, **requeue_props},
    )
    stats = keep_stats(flagged)
    if cfg.sample_rates is not None:
        # mirror the shard path's accounting: 'kept' is what LANDED —
        # a recovered-but-sampled-out clip got its resolution marker
        # yet wrote no clean row
        landed = kept.count()
        stats["sampled_out"] = stats["kept"] - landed
        stats["kept"] = landed
    flagged.unpersist()
    return {"requeued": n, **stats}


def _completed_shards(
    spark: SparkSession, store: TableStore, cfg: RunConfig
) -> set[int]:
    # resume guards exist only when the run is STAMPED (same rule as
    # the per-table commit guards): without a fingerprint, a second
    # unstamped run into the same out_root would false-match the first
    # run's lineage rows (fingerprint '' == '') and silently skip every
    # shard — processing nothing while reporting success
    if not cfg.source_fingerprint or not store.exists(LINEAGE_TABLE):
        return set()
    rows = (
        store.read(LINEAGE_TABLE)
        .filter(
            (F.col("source_fingerprint") == cfg.source_fingerprint)
            & (F.col("n_shards") == cfg.n_shards)
            & (F.col("status") == "complete")
        )
        .select("shard")
        .distinct()
        .collect()
    )
    return {r["shard"] for r in rows}
