"""Correction re-delivery (corrections.py): corrected clips supersede
their stored rows atomically, re-run the full QC + dedup gauntlet, keep
split sticky, reset pack columns, and bring every signature history to
corpus truth. Reference parity: the reference re-validates every arrival
(validator.py) but has no replace primitive; this composes that stage
with TableStore.upsert."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from data_quality_check_pipeline_spark.corrections import (
    CORRECTIONS_LOG,
    PACK_COLS,
    apply_corrections,
)
from data_quality_check_pipeline_spark.operators.dedup import (
    content_hash_expr,
    minhash_signatures,
)
from data_quality_check_pipeline_spark.pipeline import (
    AUDIO_FP_TABLE,
    CLEAN_TABLE,
    CONTENT_HASH_TABLE,
    DUP_CONTENT_REASON,
    NEARDUP_CONTENT_REASON,
    QUARANTINE_TABLE,
    TERMINAL_REASONS,
    RunConfig,
    run_pipeline,
)
from data_quality_check_pipeline_spark.sources.tables import TableStore
from data_quality_check_pipeline_spark.streaming.stream import (
    NEARDUP_SIG_TABLE,
)

RAW_SCHEMA = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, "
    "codec string, transcript string"
)


def _write_parquet(pdf, path):
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)


@pytest.fixture(scope="module")
def corpus_slice(corpus, tmp_path_factory):
    """~600-clip stride sample (defects are front-loaded, DESIGN #22)."""
    df, _, _ = corpus
    sub = df.iloc[::5].reset_index(drop=True)
    d = tmp_path_factory.mktemp("corrections_corpus")
    path = str(d / "clips.parquet")
    _write_parquet(sub, path)
    return sub, path


@pytest.fixture(scope="module")
def rooted(spark, corpus_slice, tmp_path_factory):
    """One dedup-enabled, split+packed pipeline run, plus a minhash
    signature history over the retained transcripts (what a streaming
    near-dup deployment would have persisted)."""
    _, path = corpus_slice
    root = str(tmp_path_factory.mktemp("corrections_tables") / "t")
    cfg = RunConfig(
        out_root=root, run_id="c1", dedup_content=True,
        dedup_audio=True, dedup_audio_max_hamming=0,
        split_fractions={"train": 0.8, "val": 0.1, "test": 0.1},
        pack_budget=50,
    )
    run_pipeline(spark, path, cfg)
    store = TableStore(spark, root)
    clean = store.read(CLEAN_TABLE)
    store.write(
        NEARDUP_SIG_TABLE,
        minhash_signatures(clean, "clip_id", "transcript").filter(
            F.col("sig").isNotNull()
        ),
        mode="overwrite",
    )
    return root


def _raw_rows(spark, store, ids):
    """Raw-schema rows for stored clips (bytes/meta from the clean
    table — a correction typically re-delivers the same audio)."""
    return (
        store.read(CLEAN_TABLE)
        .filter(F.col("clip_id").isin(ids))
        .select("clip_id", "bytes", "sr_hz", "dur_ms", "codec",
                "transcript")
    )


def _pick_clean(spark, root, n=4):
    """n currently-retained clips that survive a token-level edit:
    long enough transcripts, headroom under the cps ceiling (an edit
    adds chars against a fixed dur_ms), and no minhash entanglement
    with another retained clip (ingest has no near-dup stage, so
    mutual near-dups CAN sit in clips_clean — correcting one would
    legitimately quarantine it against the other's signature)."""
    from data_quality_check_pipeline_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    store = TableStore(spark, root)
    clean = store.read(CLEAN_TABLE)
    entangled = {
        x
        for r in minhash_lsh_pairs(
            clean, "clip_id", "transcript", min_est_jaccard=0.4
        ).collect()
        for x in (r["id_a"], r["id_b"])
    }
    rows = [
        r
        for r in clean.filter(
            F.col("transcript").isNotNull()
            & (F.length("transcript") > 40)
        )
        .orderBy("clip_id")
        .collect()
        if r["clip_id"] not in entangled
        and len(r["transcript"]) / (r["dur_ms"] / 1000.0) < 50.0
    ]
    assert len(rows) >= n
    return store, rows[:n]


def _compatible_pair(rows, headroom=6):
    """(victim, donor): the donor's transcript (+ a small edit of
    ``headroom`` chars) must still fit the victim's fixed duration
    under the length_ratio cps band — the corrected row keeps the
    victim's audio but carries the donor's text."""
    for v in rows:
        secs = v["dur_ms"] / 1000.0
        for d in rows:
            if d["clip_id"] == v["clip_id"]:
                continue
            if 3.0 < (len(d["transcript"]) + headroom) / secs < 55.0:
                return v, d
    raise AssertionError("no cps-compatible victim/donor pair")


@pytest.fixture(autouse=True)
def _clear_spark_cache(spark):
    """Each correction re-runs the full score+dedup+upsert chain over
    the shared module root, close to the shared test JVM's heap
    ceiling; cached relations accumulated by earlier tests (this
    module caches minhash frames, the pipeline caches scoring
    subtrees, nothing unpersists across tests) are the measured OOM
    driver — java.lang.OutOfMemoryError inside upsert's persist,
    nondeterministic with GC timing (observed standalone AND in-suite,
    rounds 4-5). Dropping the cache before each test costs a
    recompute and buys heap headroom."""
    spark.catalog.clearCache()
    yield


class TestApplyCorrections:
    def test_replace_sticky_split_reset_pack(self, spark, rooted):
        store, rows = _pick_clean(spark, rooted)
        ids = [r["clip_id"] for r in rows[:2]]
        before = {
            r["clip_id"]: r
            for r in store.read(CLEAN_TABLE)
            .filter(F.col("clip_id").isin(ids))
            .collect()
        }
        n_before = store.read(CLEAN_TABLE).count()
        old_hashes = {
            r["h"]
            for r in _raw_rows(spark, store, ids)
            .select(content_hash_expr("transcript").alias("h"))
            .collect()
        }
        # duplicate the clip's own first word: the content hash changes
        # (token stream differs) while the char-trigram perplexity and
        # language profile barely move — an injected foreign word can
        # tip a non-English clip over PPL_MAX
        fixed = _raw_rows(spark, store, ids).withColumn(
            "transcript",
            F.regexp_replace("transcript", r"^(\S+)", "$1 $1"),
        )
        rep = apply_corrections(
            spark, rooted, fixed, "fix-1", audio_max_hamming=0
        )
        assert rep["landed"] == 2 and rep["removed"] == 0
        assert rep["n_unknown_skipped"] == 0
        assert rep["clean_upsert"]["n_updated"] == 2

        clean = store.read(CLEAN_TABLE)
        assert clean.count() == n_before  # replaced, not duplicated
        after = {
            r["clip_id"]: r
            for r in clean.filter(F.col("clip_id").isin(ids)).collect()
        }
        for cid in ids:
            w = before[cid]["transcript"].split()[0]
            assert after[cid]["transcript"].startswith(f"{w} {w}")
            assert after[cid]["transcript"] != before[cid]["transcript"]
            assert after[cid]["transcript_scrubbed"].startswith(
                f"{w} {w}"
            )
            # split is sticky; pack columns reset to NULL
            assert after[cid]["split"] == before[cid]["split"]
            assert before[cid]["pack_shard"] is not None
            for c in PACK_COLS:
                assert after[cid][c] is None, c

        # signature truth: old hash out, new hash in, minhash sig upserted
        hashes_now = {
            r["text_hash"]
            for r in store.read(CONTENT_HASH_TABLE).collect()
        }
        assert not (old_hashes & hashes_now)
        new_hashes = {
            r["h"]
            for r in clean.filter(F.col("clip_id").isin(ids))
            .select(content_hash_expr("transcript").alias("h"))
            .collect()
        }
        assert new_hashes <= hashes_now
        sigs = store.read(NEARDUP_SIG_TABLE)
        assert sigs.filter(F.col("clip_id").isin(ids)).count() == 2
        assert sigs.groupBy("clip_id").count().filter(
            F.col("count") > 1
        ).count() == 0

        # corrections_log row landed; same id re-run is a no-op
        log = store.read(CORRECTIONS_LOG).collect()
        assert [r["correction_id"] for r in log] == ["fix-1"]
        again = apply_corrections(spark, rooted, fixed, "fix-1")
        assert again["skipped_already_applied"]
        assert store.read(CLEAN_TABLE).count() == n_before

    def test_downgrade_deletes_and_quarantines(self, spark, rooted):
        store, rows = _pick_clean(spark, rooted)
        cid = rows[2]["clip_id"]
        old_hash = (
            _raw_rows(spark, store, [cid])
            .select(content_hash_expr("transcript").alias("h"))
            .first()["h"]
        )
        bad = _raw_rows(spark, store, [cid]).withColumn(
            "transcript", F.lit("")
        )
        rep = apply_corrections(
            spark, rooted, bad, "fix-downgrade", audio_max_hamming=0
        )
        assert rep["landed"] == 0 and rep["removed"] == 1
        assert rep["clean_deleted"] == 1
        clean = store.read(CLEAN_TABLE)
        assert clean.filter(F.col("clip_id") == cid).count() == 0
        q = store.read(QUARANTINE_TABLE).filter(
            (F.col("clip_id") == cid) & (F.col("stage") == "correction")
        ).collect()
        assert len(q) == 1
        assert "empty_transcript" in q[0]["reasons"]
        # every memory of the retired content is gone
        assert store.read(CONTENT_HASH_TABLE).filter(
            F.col("text_hash") == old_hash
        ).count() == 0
        assert store.read(NEARDUP_SIG_TABLE).filter(
            F.col("clip_id") == cid
        ).count() == 0
        assert store.read(AUDIO_FP_TABLE).filter(
            F.col("clip_id") == cid
        ).count() == 0

    def test_duplicate_correction_quarantines_terminally(
        self, spark, rooted
    ):
        store, rows = _pick_clean(spark, rooted, n=8)
        victim_row, donor_row = _compatible_pair(rows[4:])
        victim, donor = victim_row["clip_id"], donor_row["clip_id"]
        donor_text = donor_row["transcript"]
        dup = _raw_rows(spark, store, [victim]).withColumn(
            "transcript", F.lit(donor_text)
        )
        rep = apply_corrections(
            spark, rooted, dup, "fix-dup", audio_max_hamming=0
        )
        assert rep["landed"] == 0 and rep["removed"] == 1
        clean = store.read(CLEAN_TABLE)
        assert clean.filter(F.col("clip_id") == victim).count() == 0
        assert clean.filter(F.col("clip_id") == donor).count() == 1
        q = store.read(QUARANTINE_TABLE).filter(
            F.col("clip_id") == victim
        ).collect()
        reasons = {r0 for r in q for r0 in r["reasons"]}
        assert DUP_CONTENT_REASON in reasons
        assert DUP_CONTENT_REASON in TERMINAL_REASONS
        # the donor's hash stays registered exactly once
        donor_hash = (
            clean.filter(F.col("clip_id") == donor)
            .select(content_hash_expr("transcript").alias("h"))
            .first()["h"]
        )
        assert store.read(CONTENT_HASH_TABLE).filter(
            F.col("text_hash") == donor_hash
        ).count() == 1

    def test_near_duplicate_correction_quarantines(self, spark, rooted):
        store, rows = _pick_clean(spark, rooted, n=6)
        victim_row, donor_row = _compatible_pair(rows, headroom=12)
        victim, donor = victim_row["clip_id"], donor_row["clip_id"]
        donor_text = donor_row["transcript"]
        # small edit (repeat the donor's own first word): exact hash
        # differs, minhash est_jaccard vs the donor stays high, and the
        # trigram/language profile is unchanged
        near = _raw_rows(spark, store, [victim]).withColumn(
            "transcript",
            F.lit(f"{donor_text} {donor_text.split()[0]}"),
        )
        rep = apply_corrections(
            spark, rooted, near, "fix-neardup", near_dup_jaccard=0.5,
            audio_max_hamming=0,
        )
        assert rep["landed"] == 0 and rep["removed"] == 1
        q = store.read(QUARANTINE_TABLE).filter(
            F.col("clip_id") == victim
        ).collect()
        reasons = {r0 for r in q for r0 in r["reasons"]}
        assert NEARDUP_CONTENT_REASON in reasons
        assert NEARDUP_CONTENT_REASON in TERMINAL_REASONS
        assert store.read(CLEAN_TABLE).filter(
            F.col("clip_id") == donor
        ).count() == 1

    def test_unknown_ids_skipped_never_inserted(self, spark, rooted):
        store = TableStore(spark, rooted)
        n_before = store.read(CLEAN_TABLE).count()
        ghost = spark.createDataFrame(
            [("ghost_1", b"\x00\x01", 16000, 2000, "pcm_s16le",
              "this clip was never ingested at all")],
            RAW_SCHEMA,
        )
        rep = apply_corrections(spark, rooted, ghost, "fix-ghost")
        assert rep["landed"] == 0 and rep["removed"] == 0
        assert rep["n_unknown_skipped"] == 1
        assert rep["unknown_skipped"] == ["ghost_1"]
        clean = store.read(CLEAN_TABLE)
        assert clean.count() == n_before
        assert clean.filter(F.col("clip_id") == "ghost_1").count() == 0
        # the no-op batch still logs (idempotency anchor)
        assert store.read(CORRECTIONS_LOG).filter(
            F.col("correction_id") == "fix-ghost"
        ).count() == 1

    def test_invalid_batches_raise(self, spark, rooted):
        dup_ids = spark.createDataFrame(
            [("a", None, 16000, 1000, "pcm_s16le", "x"),
             ("a", None, 16000, 1000, "pcm_s16le", "y")],
            RAW_SCHEMA,
        )
        with pytest.raises(ValueError, match="unique"):
            apply_corrections(spark, rooted, dup_ids, "fix-bad-1")
        null_id = spark.createDataFrame(
            [(None, None, 16000, 1000, "pcm_s16le", "x")],
            RAW_SCHEMA,
        )
        with pytest.raises(ValueError, match="non-NULL"):
            apply_corrections(spark, rooted, null_id, "fix-bad-2")
        with pytest.raises(FileNotFoundError):
            apply_corrections(
                spark, "/tmp/no_such_corrections_root", null_id.limit(0),
                "fix-bad-3",
            )
