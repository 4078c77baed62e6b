"""Rule-registry unit tests: one planted positive + negative per rule
(reference style: tests/test_pipeline.py plants one defect per rule)."""

from pyspark.sql import functions as F

from data_quality_check_pipeline_spark.operators.validate import (
    heuristic_rules,
    merge_duplicate_reason,
    with_duplicate_flag,
    with_flags,
)

GOOD = {
    "clip_id": "clip_000000000001",
    "bytes": b"\x00\x01" * 100,
    "sr_hz": 16000,
    "dur_ms": 2000,
    "codec": "pcm_s16le",
    "transcript": "the quick brown fox jumps over the lazy dog",
}

SCHEMA = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string,"
    " transcript string"
)


def flags_for(spark, **overrides):
    row = {**GOOD, **overrides}
    df = spark.createDataFrame([row], SCHEMA)
    out = with_flags(df, heuristic_rules()).collect()[0]
    return list(out["reasons"]), out["keep"], out["severity"]


def test_good_row_keeps(spark):
    reasons, keep, severity = flags_for(spark)
    assert reasons == [] and keep and severity is None


def test_null_clip_id(spark):
    reasons, keep, severity = flags_for(spark, clip_id=None)
    assert "null_clip_id" in reasons and not keep and severity == "CRITICAL"


def test_null_bytes(spark):
    reasons, _, _ = flags_for(spark, bytes=None)
    assert "null_bytes" in reasons
    reasons, _, _ = flags_for(spark, bytes=b"")
    assert "null_bytes" in reasons


def test_empty_transcript_variants(spark):
    for t in (None, "", "   ", "nan"):
        reasons, _, _ = flags_for(spark, transcript=t)
        assert "empty_transcript" in reasons, t


def test_bad_sr(spark):
    for sr in (0, 3_000_000, 44101, None):
        reasons, _, _ = flags_for(spark, sr_hz=sr)
        assert "bad_sr_hz" in reasons, sr
    reasons, _, _ = flags_for(spark, sr_hz=44100)
    assert "bad_sr_hz" not in reasons


def test_dur_bounds(spark):
    for dur in (80, 45000, -1, None):
        reasons, _, _ = flags_for(spark, dur_ms=dur)
        assert "dur_out_of_range" in reasons, dur
    for dur in (300, 30000):
        reasons, _, _ = flags_for(spark, dur_ms=dur)
        assert "dur_out_of_range" not in reasons, dur


def test_codec_whitelist_case_insensitive(spark):
    reasons, _, _ = flags_for(spark, codec="amr")
    assert "unknown_codec" in reasons
    for ok in ("PCM_S16LE", " flac ", "Opus", "mp3"):
        reasons, _, _ = flags_for(spark, codec=ok)
        assert "unknown_codec" not in reasons, ok


def test_length_ratio(spark):
    # 44 chars in 200ms -> 220 cps; dur itself valid (350ms) -> use 350
    reasons, _, _ = flags_for(spark, dur_ms=350)
    assert "length_ratio" in reasons  # 44 chars / .35s = 125 cps
    reasons, _, _ = flags_for(spark, dur_ms=25000)
    assert "length_ratio" in reasons  # 1.76 cps < 2
    reasons, _, _ = flags_for(spark, dur_ms=2000)
    assert "length_ratio" not in reasons


def test_repetition(spark):
    reasons, _, _ = flags_for(
        spark, transcript=" ".join(["again"] * 20), dur_ms=4000
    )
    assert "repetitive" in reasons
    # <=3 tokens never flagged
    reasons, _, _ = flags_for(spark, transcript="go go go", dur_ms=400)
    assert "repetitive" not in reasons


def test_symbol_density(spark):
    reasons, _, _ = flags_for(
        spark, transcript="ok @#$%^&*()!~@#$%^&*()!~", dur_ms=1000
    )
    assert "symbol_density" in reasons


def test_duplicate_flag_all_copies(spark):
    rows = [
        {**GOOD, "clip_id": "a"},
        {**GOOD, "clip_id": "a"},
        {**GOOD, "clip_id": "b"},
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    flagged = merge_duplicate_reason(
        with_duplicate_flag(with_flags(df, heuristic_rules()))
    )
    got = {
        (r["clip_id"], "duplicate_clip_id" in r["reasons"], r["keep"])
        for r in flagged.collect()
    }
    # pandas duplicated(keep=False) parity: BOTH copies flagged
    assert ("a", True, False) in got
    assert ("b", False, True) in got
    assert sum(1 for c, f, k in got if c == "a") == 1  # both identical rows


def test_duplicate_flag_no_broadcast_fallback(spark):
    """The broadcast_dups=False escape hatch (for when the duplicate-key
    set itself exceeds broadcast limits) must produce the identical flag
    set through a non-broadcast join. Forced by disabling Spark's
    auto-broadcast threshold so AQE cannot quietly broadcast anyway."""
    rows = [
        {**GOOD, "clip_id": cid}
        for cid in ["a", "a", "b", "c", "c", "c", "d"]
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    want = {
        (r["clip_id"], r["is_dup"])
        for r in with_duplicate_flag(df).collect()
    }
    assert want == {("a", True), ("b", False), ("c", True), ("d", False)}
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        flagged = with_duplicate_flag(df, broadcast_dups=False)
        plan = flagged._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan  # fallback really engaged
        got = {(r["clip_id"], r["is_dup"]) for r in flagged.collect()}
        assert got == want
        # the default path still broadcasts (explicit hint beats threshold)
        bplan = (
            with_duplicate_flag(df)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in bplan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_severity_is_max(spark):
    reasons, _, severity = flags_for(spark, clip_id=None, dur_ms=80)
    assert set(reasons) >= {"null_clip_id", "dur_out_of_range"}
    assert severity == "CRITICAL"
