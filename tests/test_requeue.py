"""DLQ re-drive: quarantined clips are retried with retry bookkeeping
(parity: reference dead_letter_queue.py retry-eligibility)."""

from pyspark.sql import functions as F

from data_quality_check_pipeline_spark.pipeline import (
    CLEAN_TABLE,
    QUARANTINE_TABLE,
    RunConfig,
    requeue_quarantine,
    run_pipeline,
)
from data_quality_check_pipeline_spark.sources.tables import TableStore


def test_requeue_increments_retry_and_appends(
    spark, corpus, oracle_df, out_root
):
    _, _, path = corpus
    cfg = RunConfig(out_root=out_root, run_id="rq", source_fingerprint="f")
    run_pipeline(spark, path, cfg)
    store = TableStore(spark, out_root)
    n_clean = store.read(CLEAN_TABLE).count()
    n_quar = store.read(QUARANTINE_TABLE).count()

    # source unchanged -> every requeued clip fails again, retry_count + 1
    out = requeue_quarantine(spark, cfg, path, max_retries=3)
    assert out["requeued"] >= n_quar - 10  # dup ids collapse via semi-join
    assert out["kept"] == 0
    assert store.read(CLEAN_TABLE).count() == n_clean
    q = store.read(QUARANTINE_TABLE)
    assert q.filter(F.col("retry_count") == 1).count() > 0

    # after max_retries exceeded nothing is eligible
    for _ in range(3):
        requeue_quarantine(spark, cfg, path, max_retries=3)
    final = requeue_quarantine(spark, cfg, path, max_retries=3)
    assert final["requeued"] == 0

    # terminal dead-letter semantics (reference
    # dead_letter_queue.py:118-127 retry-eligibility parity): attempts
    # stop AT the cap — retry_count never exceeds max_retries no matter
    # how many further requeue calls arrive...
    from data_quality_check_pipeline_spark.pipeline import (
        active_quarantine,
    )

    q = store.read(QUARANTINE_TABLE)
    assert q.agg(F.max("retry_count").alias("m")).collect()[0]["m"] == 3
    # ...the exhausted clips remain VISIBLE as unresolved dead letters
    # (terminal = retired from retries, never hidden from operators)...
    exhausted = {
        r["clip_id"]
        for r in q.filter(
            (F.col("retry_count") == 3)
            & (F.col("stage") != "requeue_resolved")
        ).select("clip_id").collect()
    }
    active = {
        r["clip_id"]
        for r in active_quarantine(q).select("clip_id").collect()
    }
    assert exhausted and exhausted <= active
    # ...and a permanently-failing clip never leaked into clips_clean
    assert store.read(CLEAN_TABLE).count() == n_clean


def test_recovered_clip_not_reappended(
    spark, corpus, oracle_df, out_root, tmp_path
):
    """A clip that PASSES on requeue lands in clips_clean ONCE and gets a
    resolution marker — a further requeue must not append it again."""
    import pandas as pd

    _, _, path = corpus
    out = str(tmp_path / "rq2")
    store = TableStore(spark, out)

    # seed clips_clean + a quarantine entry for one clip that is VALID in
    # the source (simulates a fixed upstream / changed rule outcome);
    # pick a clip the oracle labels keep=True so the requeue passes it
    good_id = oracle_df[oracle_df["keep"]]["clip_id"].iloc[0]
    q_row = spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "clip_id": good_id,
                    "reasons": ["stale_reason"],
                    "severity": "HIGH",
                    "stage": "validate",
                    "run_id": "old",
                    "retry_count": 0,
                }
            ]
        )
    ).withColumn("ts", F.current_timestamp()).select(
        "clip_id", "reasons", "severity", "stage", "run_id", "ts",
        "retry_count",
    )
    store.write(QUARANTINE_TABLE, q_row)

    cfg = RunConfig(out_root=out, run_id="rq2", source_fingerprint="f2")
    first = requeue_quarantine(spark, cfg, path, max_retries=3)
    assert first["requeued"] == 1 and first["kept"] == 1
    assert (
        store.read(CLEAN_TABLE)
        .filter(F.col("clip_id") == good_id)
        .count()
        == 1
    )
    # resolution marker retires the clip: nothing eligible anymore
    second = requeue_quarantine(spark, cfg, path, max_retries=3)
    assert second["requeued"] == 0
    assert (
        store.read(CLEAN_TABLE)
        .filter(F.col("clip_id") == good_id)
        .count()
        == 1  # still exactly once
    )
    # active_quarantine: the recovered clip must NOT read as still
    # quarantined — neither through its resolution marker nor through
    # its ORIGINAL quarantine row — while the raw table keeps both for
    # retry bookkeeping
    from data_quality_check_pipeline_spark.pipeline import (
        active_quarantine,
    )

    q = store.read(QUARANTINE_TABLE)
    assert q.filter(F.col("clip_id") == good_id).count() == 2
    active = active_quarantine(q)
    assert active.filter(F.col("clip_id") == good_id).count() == 0
    assert (
        q.filter(F.col("stage") == "requeue_resolved").count() == 1
    )


def test_stream_quarantine_batch_requeue_handoff(spark, tmp_path):
    """Streaming DLQ parity: clips quarantined by the STREAM are re-driven
    by the batch requeue over the same (or a fixed) source — the
    documented handoff (both paths share QUARANTINE_TABLE's schema and
    retry bookkeeping). Exactly-once holds across the two write paths:
    the stream's (stream_id, batch) guards and the requeue's
    (fingerprint, attempt) guards key on disjoint snapshot properties,
    and a recovered clip lands in clips_clean exactly once, gets its
    resolution marker, and is never re-driven."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_quality_check_pipeline_spark.streaming.stream import (
        start_quality_stream,
    )
    from data_quality_check_pipeline_spark.synth import generate_clips

    pdf, _ = generate_clips(600)
    pdf["clip_id"] = [f"s{i:05d}" for i in range(len(pdf))]
    src = tmp_path / "src"
    os.makedirs(src)
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        str(src / "clips.parquet"),
    )
    out = str(tmp_path / "out")
    q = start_quality_stream(
        spark, str(src), out, str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(timeout=600)
    store = TableStore(spark, out)
    n_clean = store.read(CLEAN_TABLE).count()
    quar_ids = {
        r["clip_id"]
        for r in store.read(QUARANTINE_TABLE)
        .select("clip_id").distinct().collect()
        if r["clip_id"] is not None
    }
    assert quar_ids  # the stream actually quarantined clips

    # 1) unchanged source: every eligible clip fails again -> retry
    #    bookkeeping advances, clean table untouched
    cfg = RunConfig(out_root=out, run_id="rqs", source_fingerprint="fs")
    res = requeue_quarantine(
        spark, cfg, str(src / "clips.parquet"), max_retries=3
    )
    assert res["requeued"] == len(quar_ids)
    assert res["kept"] == 0
    assert store.read(CLEAN_TABLE).count() == n_clean
    assert (
        store.read(QUARANTINE_TABLE)
        .filter(
            (F.col("stage") != "requeue_resolved")
            & (F.col("retry_count") == 1)
        )
        .count()
        > 0
    )

    # 2) fixed source: one stream-quarantined clip re-uploaded with VALID
    #    content (a kept clip's payload under the quarantined id) recovers
    kept_ids = {
        r["clip_id"]
        for r in store.read(CLEAN_TABLE).select("clip_id").collect()
    }
    fixed_id = sorted(quar_ids)[0]
    donor = pdf[pdf["clip_id"].isin(sorted(kept_ids)[:1])].copy()
    donor["clip_id"] = fixed_id
    fixed = tmp_path / "fixed"
    os.makedirs(fixed)
    pq.write_table(
        pa.Table.from_pandas(donor, preserve_index=False),
        str(fixed / "clips.parquet"),
    )
    cfg2 = RunConfig(out_root=out, run_id="rqs2", source_fingerprint="fs2")
    res2 = requeue_quarantine(
        spark, cfg2, str(fixed / "clips.parquet"), max_retries=3
    )
    assert res2["requeued"] == 1 and res2["kept"] == 1
    clean = store.read(CLEAN_TABLE)
    assert clean.filter(F.col("clip_id") == fixed_id).count() == 1
    assert clean.count() == n_clean + 1
    # resolution marker retires it: a further requeue over the fixed
    # source is a no-op and the row count stays exactly-once
    res3 = requeue_quarantine(
        spark, cfg2, str(fixed / "clips.parquet"), max_retries=3
    )
    assert res3["requeued"] == 0
    assert (
        store.read(CLEAN_TABLE)
        .filter(F.col("clip_id") == fixed_id)
        .count()
        == 1
    )


def test_requarantined_clip_visible_and_eligible_again(spark, tmp_path):
    """A clip resolved by requeue and LATER re-quarantined (degraded
    re-upload) must show in active_quarantine and be requeue-eligible
    with its NEW retry counts — the old marker must not hide or retire
    it forever."""
    import pandas as pd

    from data_quality_check_pipeline_spark.pipeline import (
        active_quarantine,
    )

    out = str(tmp_path / "rq3")
    store = TableStore(spark, out)

    def q_row(stage, severity, retry, ts_offset_s):
        return spark.createDataFrame(
            pd.DataFrame([{"clip_id": "c1", "reasons": ["r"],
                           "severity": severity, "stage": stage,
                           "run_id": "x", "retry_count": retry}])
        ).withColumn(
            "ts",
            F.current_timestamp() + F.expr(
                f"INTERVAL {ts_offset_s} SECONDS"
            ),
        ).select("clip_id", "reasons", "severity", "stage", "run_id",
                 "ts", "retry_count")

    # original quarantine -> resolution marker -> NEW quarantine (later)
    store.write(QUARANTINE_TABLE, q_row("validate", "HIGH", 0, -100))
    store.write(QUARANTINE_TABLE,
                q_row("requeue_resolved", "RESOLVED", 3, -50),
                mode="append")
    store.write(QUARANTINE_TABLE, q_row("validate", "HIGH", 0, 50),
                mode="append")

    active = active_quarantine(store.read(QUARANTINE_TABLE))
    rows = active.collect()
    # exactly the NEW quarantine row is visible (old row + marker hidden)
    assert len(rows) == 1 and rows[0]["retry_count"] == 0
    # and the max ACTIVE retry (0) is below the cap, so the clip is
    # eligible for requeue again despite the marker's retry_count=3
    eligible = (
        active.groupBy("clip_id")
        .agg(F.max("retry_count").alias("rc"))
        .filter(F.col("rc") < 3)
    )
    assert eligible.count() == 1


def test_requeue_with_sampling_accounts_and_resolves(
    spark, corpus, oracle_df, out_root, tmp_path
):
    """Requeue under --sample-lang: recovered clips flow through the
    SAME deterministic sampling as the shard path — 'kept' reports what
    LANDED, 'sampled_out' the recovered-but-not-selected remainder, and
    EVERY recovered clip (landed or not) gets its resolution marker so
    nothing stays eligible."""
    import pandas as pd

    _, _, path = corpus
    out = str(tmp_path / "rq3")
    store = TableStore(spark, out)
    good_ids = list(oracle_df[oracle_df["keep"]]["clip_id"].iloc[:20])
    q_rows = spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "clip_id": cid,
                    "reasons": ["stale_reason"],
                    "severity": "HIGH",
                    "stage": "validate",
                    "run_id": "old",
                    "retry_count": 0,
                }
                for cid in good_ids
            ]
        )
    ).withColumn("ts", F.current_timestamp()).select(
        "clip_id", "reasons", "severity", "stage", "run_id", "ts",
        "retry_count",
    )
    store.write(QUARANTINE_TABLE, q_rows)
    cfg = RunConfig(
        out_root=out, run_id="rq3", source_fingerprint="f3",
        sample_rates={}, sample_default_rate=0.5, sample_seed=2,
    )
    first = requeue_quarantine(spark, cfg, path, max_retries=3)
    assert first["requeued"] == 20
    landed = store.read(CLEAN_TABLE).count()
    assert first["kept"] == landed
    assert first["sampled_out"] == 20 - landed
    assert 0 < first["sampled_out"] < 20
    # every recovered clip is resolved — including the sampled-out ones
    q = store.read(QUARANTINE_TABLE)
    assert (
        q.filter(F.col("stage") == "requeue_resolved").count() == 20
    )
    second = requeue_quarantine(spark, cfg, path, max_retries=3)
    assert second["requeued"] == 0
    assert store.read(CLEAN_TABLE).count() == landed
