"""Structured Streaming variant of the clip-quality filter.

The reference is batch-only (Airflow daily, dags/data_quality_dag.py:509);
this module exists because a 10^12-clip corpus is usually *fed* by a stream.
The batch operators are reused verbatim — clean/score/flag are stateless
projections, so the same functions build the streaming DAG:

    readStream (file source) -> clean -> UDF scores -> rule flags
      -> dropDuplicates within watermark (streaming analogue of the
         duplicate-id rule)
      -> foreachBatch: split keep/quarantine and append via TableStore
         (exactly-once per micro-batch through the store's snapshot commit)

Windowed keep-rate monitoring demonstrates watermark + windowed aggregation
for late data.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline import (
    AUDIO_FP_TABLE,
    CLEAN_TABLE,
    DUP_AUDIO_REASON,
    PROFILE_TABLE,
    QUARANTINE_TABLE,
    flag_clips,
    score_clips,
)
from ..operators.scrub import scrub_transcripts
from ..sources.tables import TableStore

_log = logging.getLogger(__name__)

CLIPS_SCHEMA = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, "
    "codec string, transcript string"
)


def read_clip_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source stream over ``path`` (a directory, glob, or a single
    parquet file). The file stream source treats a non-glob path as its
    basePath and requires it to be a DIRECTORY — a plain file path fails
    (and passing the basePath option explicitly does not override it).
    Streaming exactly one named file (without pulling sibling tables from
    the same directory in — see run_quality_pipeline --stream) therefore
    rewrites the path's last character as a one-char character class:
    ``.../clips.parquet`` -> ``.../clips.parque[t]``, a glob matching
    only that file. File-ness is decided by the ``.parquet`` suffix (or
    a local isfile check), NOT by the local filesystem alone — an
    ``s3://bucket/clips.parquet`` object needs the same rewrite even
    though os.path.isfile cannot see it."""
    import os

    reader = spark.readStream.schema(CLIPS_SCHEMA).option(
        "maxFilesPerTrigger", max_files_per_trigger
    )
    base = path.rstrip("/")
    looks_like_file = base.endswith(".parquet") or os.path.isfile(base)
    if not any(ch in base for ch in "*?[") and looks_like_file:
        path = f"{base[:-1]}[{base[-1]}]"
    return reader.parquet(path)


def content_dedup_key(
    id_col: str = "clip_id", text_col: str = "transcript",
    mode: str = "exact",
):
    """Per-row dedup key for streaming CONTENT dedup (JVM-side, no
    Python). NULL/empty text is MISSING data, never duplicate evidence
    (same invariant as the batch dedup family) — such rows key on their
    own clip_id instead, so no two of them ever collide.

    ``mode``:

    * ``"exact"`` — xxhash64 of the normalized lowercased transcript:
      byte-identical content (after whitespace/case normalization)
      collapses.
    * ``"bag"`` — xxhash64 of the SORTED DISTINCT token set: re-uploads
      with reordered or repeated words also collapse. Strictly more
      aggressive — two genuinely different transcripts sharing the
      exact word set (ignoring order and multiplicity) collapse too,
      which is vanishingly rare for real speech but makes this an
      opt-in. True near-dup (edit-distance-ish) detection stays
      batch-side on the stored table.
    """
    if mode not in ("exact", "bag"):
        raise ValueError(f"unknown content dedup mode {mode!r}")
    from ..functions.exprs import norm_text

    t = norm_text(F.lower(F.col(text_col)))
    if mode == "bag":
        hashed = F.xxhash64(
            F.array_sort(F.array_distinct(F.split(t, " ")))
        )
    else:
        hashed = F.xxhash64(t)
    return F.when(
        t.isNotNull() & (t != ""),
        F.concat(F.lit(f"{mode[0]}:"), hashed.cast("string")),
    ).otherwise(F.concat(F.lit("id:"), F.col(id_col)))


def build_streaming_flags(
    stream: DataFrame,
    with_audio: bool = True,
    dedup_watermark: str = "1 hour",
    content_dedup: bool | str = False,
    quality_model=None,
) -> DataFrame:
    """Stateless clean+score+flag; duplicate-id handling becomes
    dropDuplicatesWithinWatermark (global history is unbounded in a
    stream — batch reconciliation owns cross-window dups).

    Order matters twice here: (1) dedup runs on the RAW stream, before
    the pandas-UDF scorers, so duplicate copies never pay langid/
    perplexity/audio Arrow round-trips just to be discarded; (2) the
    dedup operator is dropDuplicatesWithinWatermark — plain
    dropDuplicates on a non-event-time subset would keep one state-store
    entry per distinct clip_id FOREVER (watermark eviction only applies
    when the event-time column is in the dedup keys), an unbounded-state
    leak on a long-running stream.

    ``content_dedup`` additionally drops CONTENT re-uploads (same
    transcript under a different clip_id) within the watermark, keyed
    on a JVM-side hash of the normalized text (content_dedup_key;
    null/empty text never collides). True (or "exact") collapses
    normalized-identical text; "bag" also collapses reordered/repeated
    word sets. State stays watermark-bounded. NEAR-dup detection
    (minhash/simhash banding) deliberately stays batch-side: banded
    candidates need cross-row joins the streaming state model can't
    bound, and the stored clean table is re-deduped by the batch stack
    (the documented stream->batch handoff)."""
    raw = stream.withColumn("ingest_ts", F.current_timestamp())
    deduped = raw.withWatermark(
        "ingest_ts", dedup_watermark
    ).dropDuplicatesWithinWatermark(["clip_id"])
    if content_dedup:
        mode = "exact" if content_dedup is True else content_dedup
        deduped = deduped.withColumn(
            "_content_key", content_dedup_key(mode=mode)
        ).dropDuplicatesWithinWatermark(["_content_key"]).drop(
            "_content_key"
        )
    # quality_model: same advisory model_quality_score stamp as the
    # batch path (score_clips hook) — both ingestion paths carry the
    # same score for the same clip, the speech_rate consistency rule
    scored = score_clips(
        deduped, with_audio=with_audio, quality_model=quality_model
    )
    # rule flags, minus the (stateful) duplicate rule handled above
    from ..operators.validate import active_rules, with_flags

    return with_flags(scored, active_rules(with_audio))


def _marker_via_hadoop_fs(spark: SparkSession, checkpoint_dir: str) -> str:
    """Read-or-mint the stream_identity marker through the Hadoop FS API
    (s3a/hdfs/gs/abfs — any scheme Spark reaches), so the identity lives
    INSIDE the remote checkpoint dir exactly like the local path. The
    property this buys: wiping the remote checkpoint to reprocess from
    scratch mints a FRESH id. A pure path digest survives checkpoint
    deletion — batch numbering restarts at 0 under the OLD id,
    batch_committed finds the old property records for batches 0..N, and
    the sink silently skips every replayed batch (data loss on a
    legitimate reset). Create is no-overwrite, so two racing drivers
    converge: the loser's create throws and it re-reads the winner's id.
    """
    import uuid as _uuid

    jvm = spark._jvm
    jmarker = jvm.org.apache.hadoop.fs.Path(
        checkpoint_dir.rstrip("/") + "/stream_identity"
    )
    fs = jmarker.getFileSystem(spark._jsc.hadoopConfiguration())

    def _read() -> str:
        stream = fs.open(jmarker)
        try:
            return str(
                jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
            ).strip()
        finally:
            stream.close()

    if fs.exists(jmarker):
        return _read()
    sid = _uuid.uuid4().hex[:12]
    try:
        out = fs.create(jmarker, False)  # False = fail if it exists
        try:
            out.write(bytearray(sid.encode()))
        finally:
            out.close()
        return sid
    except Exception:
        if fs.exists(jmarker):  # lost the create race: adopt the winner's
            return _read()
        raise


def stream_identity(
    checkpoint_dir: str, spark: SparkSession | None = None
) -> str:
    """Stable id for ONE logical stream, persisted inside its checkpoint
    dir (created on first use, read back on restart). Guarding replays on
    the bare integer batch_id would false-match across DIFFERENT streams:
    a fresh checkpoint into an existing out_root restarts numbering at 0
    and its first batches would be silently dropped as 'replays'.

    Remote checkpoint URIs go through the Hadoop FS API when ``spark``
    is given (the production path — start_quality_stream passes it), so
    deleting and recreating a remote checkpoint dir mints a fresh id,
    same as local. Only WITHOUT a session does it fall back to a
    path-derived digest (weaker: the id survives checkpoint resets;
    logged)."""
    import hashlib
    import uuid as _uuid

    # Remote URIs must be detected by scheme, not by OSError: os.makedirs
    # on "s3://bucket/ckpt" SUCCEEDS locally (it creates a cwd-relative
    # "s3:" dir), so the marker would land in a junk local path that
    # varies per machine/cwd — after driver failover the new driver would
    # mint a fresh id and replayed batches double-append.
    scheme_end = checkpoint_dir.find("://")
    if scheme_end > 0 and checkpoint_dir[:scheme_end].lstrip(
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789+.-"
    ) == "" and not checkpoint_dir.startswith("file://"):
        if spark is not None:
            return _marker_via_hadoop_fs(spark, checkpoint_dir)
        _log.warning(
            "stream_identity(%s): no SparkSession given for a remote "
            "checkpoint URI — falling back to a path-derived id, which "
            "SURVIVES checkpoint deletion (a reset would silently skip "
            "replayed batches). Pass spark= for marker-file semantics.",
            checkpoint_dir,
        )
        return hashlib.sha256(checkpoint_dir.encode()).hexdigest()[:12]
    if checkpoint_dir.startswith("file://"):
        checkpoint_dir = checkpoint_dir[len("file://"):]

    marker = os.path.join(checkpoint_dir, "stream_identity")
    try:
        os.makedirs(checkpoint_dir, exist_ok=True)
        if os.path.exists(marker):
            with open(marker) as f:
                return f.read().strip()
        sid = _uuid.uuid4().hex[:12]
        with open(marker, "w") as f:
            f.write(sid)
        return sid
    except OSError:
        # remote URI: scope at least per checkpoint path (deleting and
        # recreating the same remote path keeps the same id — weaker,
        # but never weaker than the bare batch_id)
        return hashlib.sha256(checkpoint_dir.encode()).hexdigest()[:12]


def batch_committed(
    store: TableStore, table: str, batch_id: int, stream_id: str
) -> bool:
    """foreachBatch is at-least-once: a crash between a table commit and
    the checkpoint offset commit replays the batch on restart. Every sink
    write stamps (``stream_id``, ``stream_batch``) into snapshot
    properties; a table whose snapshot history already carries this
    stream's batch_id is skipped on replay, making the sink idempotent
    (exactly-once at the table level). The stream_id scoping prevents a
    DIFFERENT stream's batch numbering from false-matching."""
    if not store.exists(table):
        return False
    # property_records (not snapshots): survives expire_snapshots GC
    return any(
        s.get("properties", {}).get("stream_batch") == batch_id
        and s.get("properties", {}).get("stream_id") == stream_id
        for s in store.property_records(table)
    )


NEARDUP_SIG_TABLE = "minhash_sig_history"
NEARDUP_REASON = "stream_near_duplicate"


def _sig_history_before_batch(
    store: TableStore, table: str, batch_id: int, stream_id: str
):
    """Signature history AS OF before this batch's own append — the
    replay-safe read. foreachBatch is at-least-once: a crash AFTER the
    sig append but before the checkpoint offset commit replays the
    batch, and reading the CURRENT snapshot would then include the
    batch's own signatures — batch members would 'near-dup' their own
    committed copies and the replay would quarantine clips the first
    attempt had kept (non-deterministic replay = corrupted exactly-once
    routing). Reading the parent of this batch's own append keeps every
    replay's candidate mining identical to the first attempt. Relies on
    property_records-style retention only within the snapshot manifest;
    expire_snapshots keeps recent snapshots, and checkpoint replays are
    by construction recent."""
    if not store.exists(table):
        return None
    for s in store.snapshots(table):
        p = s.get("properties", {})
        if (
            p.get("stream_batch") == batch_id
            and p.get("stream_id") == stream_id
        ):
            parent = s.get("parent")
            return store.read(table, parent) if parent else None
    return store.read(table)


def start_quality_stream(
    spark: SparkSession,
    source_path: str,
    out_root: str,
    checkpoint_dir: str,
    with_audio: bool = True,
    available_now: bool = True,
    content_dedup: bool | str = False,
    near_dup: bool = False,
    near_dup_jaccard: float = 0.8,
    audio_near_dup: bool = False,
    audio_max_hamming: int = 6,
    sample_rates: dict | None = None,
    sample_default_rate: float = 1.0,
    sample_seed: int = 0,
    sample_temperature: float | None = None,
    dsir_target: str | None = None,
    dsir_frac: float | None = None,
    dsir_text_col: str = "text",
    dsir_temperature: float = 1.0,
    dsir_threshold_key: float | None = None,
    curriculum_col: str | None = None,
    curriculum_rates: list | None = None,
    curriculum_edges: list | None = None,
    decontam_heldout: str | None = None,
    decontam_text_col: str = "text",
    decontam_k: int = 8,
    decontam_min_hits: int = 1,
    split_fractions: dict | None = None,
    split_seed: int = 0,
    profile_cols: list | None = None,
    profile_numeric: dict | None = None,
    pack_budget: int | None = None,
    monitor: bool = True,
    quality_model_json: str | None = None,
):
    """Start (or drain, with availableNow) the streaming pipeline.

    ``monitor=True`` (default) attaches a StreamProgressRecorder
    (streaming/monitor.py): one JSONL line per micro-batch under
    ``<out_root>/monitoring/stream_progress.jsonl``. The query is named
    by its stream identity, so the session-global listener records ONLY
    this stream (a test session runs many), and restarts on the same
    checkpoint keep appending to the same artifact. The recorder rides
    on the returned query as ``q.progress_recorder`` (detach() it
    before tearing the session down mid-flight; events are async).

    ``profile_cols`` appends one mergeable HLL sketch-profile row per
    micro-batch (what LANDED) to the shared profile_history table —
    batch shards and stream batches merge into one corpus profile /
    drift surface.

    ``sample_rates`` / ``split_fractions`` mirror the batch pipeline's
    mixture-sampling + split stage inside the sink: because both sides
    hash clip_id (operators/sampling.py), a clip reaches the SAME
    sample/split verdict whether it arrives by stream or batch into
    this out_root. Sampling runs BEFORE the near-dup mining so a
    sampled-out clip leaves no signature in either history table (its
    content never landed — a later re-upload must not quarantine
    against a phantom survivor); sampled-out clips are simply not
    selected, never quarantined.

    ``curriculum_col``/``curriculum_rates`` add the quality-curriculum
    filter (operators/sampling.py curriculum_filter) after the mixture
    sample. ``curriculum_edges`` is REQUIRED here: a micro-batch is not
    a corpus to derive quantile bins from — pinned edges make the
    verdict a pure row function, so stream and batch arrivals of the
    same clip reach the same curriculum verdict.

    ``sample_temperature`` / ``dsir_target``+``dsir_frac`` bring the
    two remaining corpus-level batch policies to the stream via the
    pinned-state pattern: temperature mixture rates derive ONCE at
    stream start from the landed clean table's per-lang counts
    (operators/sampling.py temperature_rates — the exact math
    temperature_mix runs on its own corpus), and the DSIR importance
    model + selection cutoff pin from the landed transcripts vs the
    target parquet (operators/selection.py pinned_dsir_model; an
    explicit ``dsir_threshold_key`` overrides the derived cutoff, e.g.
    a prior batch run's recorded threshold). Both REFUSE on an empty
    out_root: a micro-batch is not a corpus to fit either policy on.
    Given the pins, both decisions are pure row functions — stream and
    batch arrivals of the same clip agree, replays are deterministic.

    Pin-source contract: the derivations treat the landed corpus as a
    sample of the ARRIVAL distribution, so the reference run should
    have landed NATURALLY (no --sample-temperature / --sample-dsir of
    its own). Deriving from a corpus that was itself
    temperature-sampled yields ~1.0 rates for every stratum (the
    landed mixture already matches the target, so nothing is
    filtered and the streamed portion reverts toward the arrival
    distribution) — detected and WARNED at stream start; similarly a
    DSIR-selected reference corpus collapses the log-ratios toward 0.
    To continue a sampled pipeline instead, pass the ORIGINAL run's
    explicit rates (sample_rates) / recorded threshold
    (dsir_threshold_key) rather than re-deriving.

    ``decontam_heldout`` mirrors the batch pipeline's eval-set
    decontamination inside the sink: each micro-batch's kept clips are
    n-gram-overlap-checked against the heldout parquet
    (operators/dedup.decontaminate — heldout side broadcast, the batch
    never shuffles) and contaminated arrivals route to quarantine with
    the TERMINAL ``eval_contamination`` reason. Runs after
    sample/curriculum (a sampled-out clip needs no contamination scan)
    and BEFORE the near-dup mining, so a contaminated clip leaves no
    signature in either history table — batch-path parity. The heldout
    frame is cached for the stream's lifetime (eval sets are small by
    contract); its shingle explode re-derives per batch from the
    cached rows.

    ``near_dup=True`` adds MINHASH near-dup detection within the sink:
    each micro-batch's kept clips are mined against the persisted
    signature history (minhash_lsh_pairs_incremental — new-vs-history
    AND new-vs-new, history text never re-shingled), near-dup arrivals
    are routed to quarantine with reason ``stream_near_duplicate``
    instead of the clean table, and the SURVIVORS' signatures are
    appended to the history table under the same exactly-once
    (stream_id, batch_id) guard as the data writes. This closes the
    gap content_dedup (exact/bag-of-words key equality) cannot: a
    slightly-edited re-upload streams through an equality key but
    collides in minhash bands. Watermark state is NOT involved — the
    'state' is the durable signature table, bounded by the corpus, and
    the candidate join runs batch-side inside foreachBatch where
    cross-row joins are legal.

    ``audio_near_dup=True`` is the AUDIO analogue: the micro-batch's
    remaining kept clips are mined against the persisted fingerprint
    history (audio_near_dup_pairs_incremental over the shared
    audio_fp_history table, so batch `--dedup-audio` runs and streams
    into one out_root dedup against EACH OTHER'S survivors); a
    re-encoded/re-noised re-upload whose transcript was also rewritten
    — invisible to every text key — still collides in fingerprint
    chunks. Dups quarantine with the terminal near_duplicate_audio
    reason; survivor fingerprints append under the same exactly-once
    guard. A clip dropped by the audio stage leaves NO signature in
    either history table (its text sig is withheld too)."""
    if curriculum_col is not None and curriculum_edges is None:
        raise ValueError(
            "streaming curriculum requires pinned curriculum_edges — "
            "a micro-batch is not a corpus to derive quantiles from"
        )
    if sample_temperature is not None and sample_rates is not None:
        raise ValueError(
            "sample_temperature and sample_rates are mutually "
            "exclusive mixture policies"
        )
    if (dsir_target is None) != (dsir_frac is None):
        raise ValueError("dsir_target and dsir_frac go together")
    store = TableStore(spark, out_root)
    # -- pinned-from-landed derivations (curriculum pinned-edges
    # pattern): a micro-batch is not a corpus, so corpus-level policies
    # (temperature mixture rates, DSIR model + selection cutoff) pin
    # ONCE at stream start from the clips that already LANDED in this
    # out_root, then apply as pure row functions for the stream's
    # lifetime — the same clip reaches the same verdict on any arrival
    # path or replay. Both refuse on an empty landed corpus: a pin
    # derived from nothing would silently keep or drop everything.
    if sample_temperature is not None:
        from ..operators.sampling import temperature_rates

        if not store.exists(CLEAN_TABLE):
            raise ValueError(
                "streaming sample_temperature requires a landed "
                f"corpus ({CLEAN_TABLE}) to derive mixture rates "
                "from — run a batch (or prior stream) into this "
                "out_root first, or pass explicit sample_rates"
            )
        counts = {
            r["lang"]: r["n"]
            for r in store.read(CLEAN_TABLE)
            .groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
            .collect()
            if r["lang"] is not None
        }
        sample_rates, _unmet, _t = temperature_rates(
            counts, sample_temperature
        )
        if not sample_rates:
            raise ValueError(
                "streaming sample_temperature: landed corpus has no "
                "lang strata to derive rates from"
            )
        sample_default_rate = 0.0  # unseen strata: no derived share
        _log.info(
            "stream temperature mixture (alpha=%s) pinned from landed "
            "corpus: %s", sample_temperature,
            {k: round(v, 4) for k, v in sample_rates.items()},
        )
        if sample_temperature < 1.0 and all(
            r > 0.95 for r in sample_rates.values()
        ):
            # the landed mixture already matches the alpha-target —
            # either arrivals really are near-uniform, or the landed
            # corpus was itself temperature-sampled and re-deriving
            # from it degenerates the policy (docstring contract)
            _log.warning(
                "stream temperature mixture: derived rates are ~1.0 "
                "for every stratum — the landed corpus already matches "
                "the target mixture. If it was itself sampled, pass "
                "the original run's explicit sample_rates instead of "
                "re-deriving, or arrivals will stream through nearly "
                "unfiltered."
            )
    dsir_log_ratio = None
    if dsir_target is not None:
        from ..operators.selection import pinned_dsir_model

        target_df = spark.read.parquet(dsir_target)
        if not store.exists(CLEAN_TABLE):
            raise ValueError(
                "streaming dsir selection requires a landed corpus "
                f"({CLEAN_TABLE}) to pin the importance model on — "
                "run a batch (or prior stream) into this out_root "
                "first"
            )
        dsir_stats: dict = {}
        dsir_log_ratio, tau = pinned_dsir_model(
            store.read(CLEAN_TABLE), target_df, "clip_id",
            "transcript", dsir_frac, target_text_col=dsir_text_col,
            temperature=dsir_temperature, seed=sample_seed,
            stats_out=dsir_stats,
        )
        # re-joined every micro-batch: keep the <=8192-row model hot
        dsir_log_ratio = dsir_log_ratio.cache()
        dsir_log_ratio.count()
        if dsir_threshold_key is None:
            dsir_threshold_key = tau
        _log.info(
            "stream dsir selection pinned: threshold_key=%.6f "
            "(derived=%.6f, keep_frac=%s)", dsir_threshold_key, tau,
            dsir_frac,
        )
    sid = stream_identity(checkpoint_dir, spark)
    heldout_df = (
        spark.read.parquet(decontam_heldout).cache()
        if decontam_heldout else None
    )
    qmodel = None
    if quality_model_json:
        import json as _json

        from ..operators.qmodel import QualityModel

        with open(quality_model_json) as f:
            _doc = _json.load(f)
        qmodel = QualityModel.from_dict(_doc.get("model", _doc))
    flagged = build_streaming_flags(
        read_clip_stream(spark, source_path), with_audio,
        content_dedup=content_dedup,
        quality_model=qmodel,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.dedup import (
            audio_near_dup_pairs_incremental,
            minhash_lsh_pairs_incremental,
        )

        def _new_side(pairs: DataFrame) -> DataFrame:
            # the NEW side of a new-vs-history pair is the dup; for
            # new-vs-new pairs the later (greater) clip_id loses —
            # deterministic, so replays route identically
            return pairs.select(
                F.when(
                    F.col("new_a") & ~F.col("new_b"), F.col("id_a")
                ).when(
                    F.col("new_b") & ~F.col("new_a"), F.col("id_b")
                ).otherwise(F.col("id_b")).alias("clip_id")
            ).distinct().cache()

        from pyspark import StorageLevel

        # DISK_ONLY, not cache(): a micro-batch is unbounded in size
        # (the file source cannot split one input file across triggers,
        # so one giant upstream file = one giant batch) and carries the
        # full audio payload. Deserialized on-heap caching of such a
        # batch pins storage against the sink's shuffle/write execution
        # demand — measured unified-memory exhaustion at a 60k-clip
        # (3.3 GB) single-file batch on an 8g heap. The persist exists
        # only to stop the pandas-UDF scoring chain re-running per
        # consumer, so serialized-to-local-disk is the right level; for
        # ordinary MB-scale micro-batches the disk round-trip is noise.
        batch_df = batch_df.persist(StorageLevel.DISK_ONLY)
        dup_ids = None
        a_dup_ids = None
        cont_ids = None
        new_sigs = None
        new_fps = None
        kept_final = None
        try:
            kept_src = batch_df.filter(F.col("keep"))
            if sample_rates is not None:
                from ..operators.sampling import stratified_sample

                kept_src = stratified_sample(
                    kept_src, "lang", sample_rates, "clip_id",
                    default_rate=sample_default_rate, seed=sample_seed,
                )
            if dsir_log_ratio is not None:
                from ..operators.selection import importance_filter

                # batch-stage order parity (sample -> dsir ->
                # curriculum); pinned (model, threshold) makes the
                # verdict a pure row function, so replays and batch
                # arrivals of the same clip agree
                kept_src = importance_filter(
                    kept_src, dsir_log_ratio, "clip_id", "transcript",
                    dsir_threshold_key, temperature=dsir_temperature,
                    seed=sample_seed,
                )
            if curriculum_col is not None:
                from ..operators.sampling import curriculum_filter

                # before the near-dup mining, same rationale as the
                # mixture sample: a curriculum-dropped clip leaves no
                # signature in either history table
                kept_src = curriculum_filter(
                    kept_src, curriculum_col, list(curriculum_rates),
                    "clip_id", seed=sample_seed, edges=curriculum_edges,
                )
            if heldout_df is not None:
                from ..operators.dedup import decontaminate

                cont_ids = decontaminate(
                    kept_src, heldout_df, "clip_id", "transcript",
                    heldout_text_col=decontam_text_col,
                    shingle_k=decontam_k,
                    min_hits=decontam_min_hits,
                ).select("clip_id").cache()
                kept_src = kept_src.join(cont_ids, "clip_id", "left_anti")
            if near_dup:
                history = _sig_history_before_batch(
                    store, NEARDUP_SIG_TABLE, batch_id, sid
                )
                pairs, new_sigs = minhash_lsh_pairs_incremental(
                    kept_src, history, "clip_id", "transcript",
                    min_est_jaccard=near_dup_jaccard, keep_flags=True,
                )
                dup_ids = _new_side(pairs)
                kept_src = kept_src.join(dup_ids, "clip_id", "left_anti")
            if audio_near_dup:
                fp_history = _sig_history_before_batch(
                    store, AUDIO_FP_TABLE, batch_id, sid
                )
                apairs, new_fps = audio_near_dup_pairs_incremental(
                    kept_src, fp_history, "clip_id",
                    max_hamming=audio_max_hamming, keep_flags=True,
                )
                a_dup_ids = _new_side(apairs)
                kept_src = kept_src.join(
                    a_dup_ids, "clip_id", "left_anti"
                )
            kept_final = scrub_transcripts(
                kept_src.drop("reasons", "severity", "keep")
            )
            if split_fractions is not None:
                from ..operators.sampling import with_split

                kept_final = with_split(
                    kept_final, "clip_id", split_fractions,
                    seed=split_seed,
                )
            if pack_budget is not None:
                from ..operators.packing import with_training_chunks

                # pack_run = the stream identity, pack_shard = the
                # micro-batch id: same chunk-identity contract as the
                # batch path (run scopes it, the parallel unit shards
                # it), same output schema
                kept_final = with_training_chunks(
                    kept_final, pack_budget, sid, int(batch_id),
                    include_split=split_fractions is not None,
                )
            # the write, the emptiness probe and the profile agg all
            # consume kept_final — persist it so the near-dup mining
            # joins and scrub run once per batch, not three times.
            # DISK_ONLY for the same payload-size reason as batch_df.
            kept_final = kept_final.persist(StorageLevel.DISK_ONLY)
            if not batch_committed(store, CLEAN_TABLE, batch_id, sid):
                from ..pipeline import salted_repartition

                # the batch path's salted spread, for the same two
                # reasons PLUS a streaming-only one: the file source
                # cannot split a single input file across triggers, so
                # one giant upstream file = one giant micro-batch, and
                # an unspread partitioned write concentrates the whole
                # batch's parquet writer buffers (zstd, per open
                # lang=/split= file) in a handful of tasks — measured
                # heap OOM at a 60k-clip (3.3 GB audio) single-file
                # batch on an 8g local heap. Salting bounds per-task
                # buffer footprint; deterministic, so replays lay out
                # identically.
                store.write(
                    CLEAN_TABLE,
                    salted_repartition(kept_final, 16),
                    mode="append"
                    if store.exists(CLEAN_TABLE)
                    else "overwrite",
                    partition_by=(
                        ["lang", "split"]
                        if split_fractions else ["lang"]
                    ),
                    properties={"stream_batch": batch_id,
                                "stream_id": sid},
                )
            # skip EMPTY batches: availableNow drains emit a trailing
            # empty micro-batch, and an all-zero profile row would trip
            # the drift monitor's batch-size band on every drain.
            # Exactly-once via the SAME (stream_id, batch) all-records
            # guard as every other sink write — a last-commit
            # fingerprint check would break the moment a batch run
            # appends to the shared table between a crash and its
            # replay (the additive counters would double-count)
            if (
                profile_cols
                and not batch_committed(store, PROFILE_TABLE, batch_id, sid)
                and not kept_final.isEmpty()
            ):
                from ..operators.profile import append_profile_row

                append_profile_row(
                    store, PROFILE_TABLE, kept_final,
                    list(profile_cols),
                    numeric_bins=profile_numeric,
                    properties={"stream_batch": batch_id,
                                "stream_id": sid},
                )
            if not batch_committed(store, QUARANTINE_TABLE, batch_id, sid):
                quarantined = batch_df.filter(~F.col("keep")).select(
                    "clip_id", "reasons", "severity",
                    F.lit("stream_validate").alias("stage"),
                    F.lit(f"batch_{batch_id}").alias("run_id"),
                    F.current_timestamp().alias("ts"),
                    F.lit(0).alias("retry_count"),
                )
                def _near_rows(ids: DataFrame, reason: str, stage: str):
                    return (
                        batch_df.filter(F.col("keep"))
                        .join(ids, "clip_id", "left_semi")
                        .select(
                            "clip_id",
                            F.array(F.lit(reason)).alias("reasons"),
                            F.lit("MEDIUM").alias("severity"),
                            F.lit(stage).alias("stage"),
                            F.lit(f"batch_{batch_id}").alias("run_id"),
                            F.current_timestamp().alias("ts"),
                            F.lit(0).alias("retry_count"),
                        )
                    )

                if cont_ids is not None:
                    from ..pipeline import CONTAMINATION_REASON

                    quarantined = quarantined.unionByName(_near_rows(
                        cont_ids, CONTAMINATION_REASON,
                        "stream_decontaminate",
                    ))
                if dup_ids is not None:
                    quarantined = quarantined.unionByName(_near_rows(
                        dup_ids, NEARDUP_REASON, "stream_near_dup"
                    ))
                if a_dup_ids is not None:
                    quarantined = quarantined.unionByName(_near_rows(
                        a_dup_ids, DUP_AUDIO_REASON,
                        "stream_audio_near_dup",
                    ))
                store.write(
                    QUARANTINE_TABLE,
                    quarantined,
                    mode="append"
                    if store.exists(QUARANTINE_TABLE)
                    else "overwrite",
                    properties={"stream_batch": batch_id,
                                "stream_id": sid},
                )
            if near_dup and not batch_committed(
                store, NEARDUP_SIG_TABLE, batch_id, sid
            ):
                # survivors only: a quarantined near-dup is not in the
                # corpus, so its signature must not become history —
                # including a clip the AUDIO stage dropped (its text sig
                # is withheld too). Committed LAST — a crash before this
                # point replays against the same pre-batch history (see
                # _sig_history_before_batch).
                surv_sigs = new_sigs.join(dup_ids, "clip_id", "left_anti")
                if a_dup_ids is not None:
                    surv_sigs = surv_sigs.join(
                        a_dup_ids, "clip_id", "left_anti"
                    )
                store.write(
                    NEARDUP_SIG_TABLE,
                    surv_sigs,
                    mode="append"
                    if store.exists(NEARDUP_SIG_TABLE)
                    else "overwrite",
                    properties={"stream_batch": batch_id,
                                "stream_id": sid},
                )
            if audio_near_dup and not batch_committed(
                store, AUDIO_FP_TABLE, batch_id, sid
            ):
                # new_fps was mined AFTER the text near-dup filter, so
                # text dups are already absent; exclude audio dups
                surv_fps = new_fps.join(
                    a_dup_ids, "clip_id", "left_anti"
                )
                store.write(
                    AUDIO_FP_TABLE,
                    surv_fps,
                    mode="append"
                    if store.exists(AUDIO_FP_TABLE)
                    else "overwrite",
                    properties={"stream_batch": batch_id,
                                "stream_id": sid},
                )
        finally:
            for frame in (dup_ids, a_dup_ids, cont_ids, new_sigs,
                          new_fps, kept_final):
                if frame is not None:
                    frame.unpersist()
            batch_df.unpersist()

    recorder = None
    if monitor:
        from .monitor import StreamProgressRecorder

        recorder = StreamProgressRecorder(
            out_root, query_name=f"clip_quality_stream@{sid}"
        ).attach(spark)
    writer = (
        flagged.writeStream.foreachBatch(sink)
        .queryName(f"clip_quality_stream@{sid}")
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    q.progress_recorder = recorder
    return q


def stateful_lang_keep_rate(
    flagged_stream: DataFrame, degrade_drop: float = 0.10
) -> DataFrame:
    """Per-language RUNNING keep-rate as a custom stateful operator
    (applyInPandasWithState) — the streaming form of the reference's
    quality-degradation trend alert (metrics_collector.py:220-273): alert
    when a language's cumulative keep-rate falls more than ``degrade_drop``
    below its value at the previous micro-batch.

    State per language = (total, kept, prev_rate): three scalars, bounded
    by the language cardinality (~200 keys), not the stream length — safe
    for an unbounded 10^12-clip stream. A windowed agg cannot express this
    (the comparison is against the *previous emission*, not a time window).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        "lang string, total long, kept long, keep_rate double, "
        "prev_rate double, degraded boolean"
    )
    state_schema = "total long, kept long, prev_rate double"

    def update(key, pdfs, state):
        lang = key[0]
        if state.exists:
            total, kept, prev = state.get
        else:
            total, kept, prev = 0, 0, -1.0
        for pdf in pdfs:
            total += len(pdf)
            kept += int(pdf["keep"].sum())
        rate = (kept / total) if total else 0.0
        degraded = prev >= 0.0 and rate < prev - degrade_drop
        state.update((total, kept, float(rate)))
        yield pd.DataFrame(
            [
                {
                    "lang": lang,
                    "total": total,
                    "kept": kept,
                    "keep_rate": rate,
                    "prev_rate": prev if prev >= 0.0 else None,
                    "degraded": bool(degraded),
                }
            ]
        )

    return (
        flagged_stream.select("lang", "keep")
        .groupBy("lang")
        .applyInPandasWithState(
            update,
            out_schema,
            state_schema,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def windowed_keep_rate(
    flagged_stream: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "ingest_ts",
) -> DataFrame:
    """Watermarked windowed keep-rate aggregation (late data demo)."""
    return (
        flagged_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window))
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(F.col("keep").cast("long")).alias("kept"),
        )
        .withColumn("keep_rate", F.col("kept") / F.col("total"))
    )
