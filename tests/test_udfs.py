"""UDF scorer tests: correctness, determinism, batch-size invariance,
and the audio decode invariants."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_quality_check_pipeline_spark.udfs.audio import (
    FAKE_MAGIC,
    decode_payload,
    stats_batch,
    with_audio_stats,
)
from data_quality_check_pipeline_spark.udfs.langid import classify, with_langid
from data_quality_check_pipeline_spark.udfs.lexicon import LANGS
from data_quality_check_pipeline_spark.udfs.perplexity import (
    score_texts,
    with_perplexity,
)

SENTENCES = {
    "en": "the people of this place know that they would like more time",
    "fr": "le monde est dans la ville avec les enfants et le temps",
    "de": "der mann und die frau sind in der stadt mit dem kind",
    "es": "el hombre y la mujer estan en la casa con el agua",
    "it": "il mondo e la vita sono nella casa con il tempo",
}


class TestLangId:
    def test_classifies_each_language(self):
        out = classify(list(SENTENCES.values()))
        assert list(out["lang"]) == list(SENTENCES.keys())
        assert (out["lang_conf"] > 0.5).all()

    def test_empty_and_null(self):
        out = classify([None, "", "ab"])
        assert out["lang"].isna().all()
        assert (out["lang_conf"] == 0.0).all()

    def test_batch_invariance(self):
        texts = list(SENTENCES.values()) * 3
        whole = classify(texts)
        parts = pd.concat(
            [classify(texts[i : i + 2]) for i in range(0, len(texts), 2)],
            ignore_index=True,
        )
        assert list(whole["lang"]) == list(parts["lang"])
        np.testing.assert_array_equal(
            whole["lang_conf"].to_numpy(), parts["lang_conf"].to_numpy()
        )

    def test_spark_matches_local(self, spark):
        texts = list(SENTENCES.values())
        df = spark.createDataFrame(
            [(t,) for t in texts], "transcript string"
        ).repartition(4)
        got = {
            r["transcript"]: (r["lang"], r["lang_conf"])
            for r in with_langid(df).collect()
        }
        local = classify(texts)
        for t, lang, conf in zip(
            texts, local["lang"], local["lang_conf"]
        ):
            assert got[t][0] == lang
            assert got[t][1] == pytest.approx(float(conf), abs=0)


class TestPerplexity:
    def test_natural_below_gibberish(self):
        natural = list(SENTENCES.values())
        gibberish = ["qxzjv kwfbg hyqxz jvkwf", "zzzzqqqqxxxx jjjj"]
        s_nat = score_texts(natural)
        s_gib = score_texts(gibberish)
        assert s_nat.max() < 9.0 < s_gib.min()

    def test_empty_is_worst_case(self):
        s = score_texts([None, ""])
        assert (s > 12.0).all()

    def test_batch_invariance(self):
        texts = list(SENTENCES.values()) * 5
        whole = score_texts(texts)
        parts = np.concatenate(
            [score_texts(texts[i : i + 3]) for i in range(0, len(texts), 3)]
        )
        np.testing.assert_array_equal(whole, parts)

    def test_spark_matches_local(self, spark):
        texts = list(SENTENCES.values())
        df = spark.createDataFrame([(t,) for t in texts], "transcript string")
        got = {
            r["transcript"]: r["ppl"] for r in with_perplexity(df).collect()
        }
        local = score_texts(texts)
        for t, p in zip(texts, local):
            assert got[t] == pytest.approx(float(p), abs=0)


class TestFusedTextScore:
    """textscore.py: the fused langid+perplexity UDF must be
    bit-identical to running the two standalone scorers (the
    score_from_hashes contract score_clips now relies on)."""

    def test_local_parity_bitexact(self):
        from data_quality_check_pipeline_spark.udfs.textscore import (
            classify_and_score,
        )

        texts = (
            list(SENTENCES.values())
            + [None, "", "ab", "qxzjv kwfbg hyqxz jvkwf"]
        ) * 2
        fused = classify_and_score(texts)
        lid = classify(texts)
        ppl = score_texts(texts)
        assert list(fused["lang"]) == list(lid["lang"])
        np.testing.assert_array_equal(
            fused["lang_conf"].to_numpy(), lid["lang_conf"].to_numpy()
        )
        np.testing.assert_array_equal(fused["ppl"].to_numpy(), ppl)

    def test_spark_matches_local(self, spark):
        from data_quality_check_pipeline_spark.udfs.textscore import (
            classify_and_score,
            with_text_scores,
        )

        texts = list(SENTENCES.values())
        df = spark.createDataFrame(
            [(t,) for t in texts], "transcript string"
        ).repartition(3)
        got = {
            r["transcript"]: (r["lang"], r["lang_conf"], r["ppl"])
            for r in with_text_scores(df).collect()
        }
        local = classify_and_score(texts)
        for t, lang, conf, p in zip(
            texts, local["lang"], local["lang_conf"], local["ppl"]
        ):
            assert got[t][0] == lang
            assert got[t][1] == pytest.approx(float(conf), abs=0)
            assert got[t][2] == pytest.approx(float(p), abs=0)

    def test_single_arrow_stage_in_plan(self, spark):
        """The fused scorer must appear as ONE ArrowEvalPython node
        evaluating one UDF — the round-trip-halving is the point."""
        from data_quality_check_pipeline_spark.udfs.textscore import (
            with_text_scores,
        )

        df = spark.createDataFrame([("hello world",)], "transcript string")
        plan = (
            with_text_scores(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("ArrowEvalPython") == 1
        assert plan.count("langid_ppl_udf") >= 1
        assert "perplexity_udf" not in plan


def sine_pcm(n=8000, sr=8000, freq=440.0, amp=9000.0, noise=0.0, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / sr
    x = amp * np.sin(2 * np.pi * freq * t) + rng.normal(0, noise, n)
    return np.clip(x, -32768, 32767).astype("<i2")


class TestAudio:
    def test_decode_pcm_roundtrip_exact(self):
        x = sine_pcm()
        decoded = decode_payload(x.tobytes(), "pcm_s16le")
        np.testing.assert_array_equal(decoded, x)  # allclose -> SNR = inf

    def test_decode_fake_containers(self):
        x = sine_pcm(n=1000)
        for codec, magic in FAKE_MAGIC.items():
            decoded = decode_payload(magic + x.tobytes(), codec)
            np.testing.assert_array_equal(decoded, x)

    def test_real_compressed_raises(self):
        with pytest.raises(NotImplementedError):
            decode_payload(b"\x00" * 100, "flac")

    def test_audio_fingerprint_near_dup(self, spark):
        """Identical audio -> identical fingerprint; same tone with fresh
        low noise -> small hamming; different tone -> large hamming."""
        from data_quality_check_pipeline_spark.operators.dedup import (
            audio_near_dup_pairs,
        )
        from data_quality_check_pipeline_spark.udfs.audio import (
            with_audio_fingerprint,
        )

        base = sine_pcm(n=8000, amp=9000.0, noise=60.0, seed=1)
        near = sine_pcm(n=8000, amp=9000.0, noise=60.0, seed=2)
        far = sine_pcm(n=8000, amp=9000.0, noise=60.0, seed=3, freq=1800.0)
        rows = [
            ("a", base.tobytes(), "pcm_s16le"),
            ("a2", base.tobytes(), "pcm_s16le"),
            ("b", near.tobytes(), "pcm_s16le"),
            ("c", far.tobytes(), "pcm_s16le"),
            ("z", None, "pcm_s16le"),
        ]
        df = spark.createDataFrame(
            rows, "clip_id string, bytes binary, codec string"
        )
        fp = {
            r["clip_id"]: r["audio_fp"]
            for r in with_audio_fingerprint(df).collect()
        }
        assert fp["a"] == fp["a2"]
        assert fp["z"] == 0

        def ham(x, y):
            return bin((x ^ y) & ((1 << 64) - 1)).count("1")

        assert ham(fp["a"], fp["b"]) <= 1
        assert ham(fp["a"], fp["c"]) >= 2

        pairs = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in audio_near_dup_pairs(df, max_hamming=1).collect()
        }
        assert ("a", "a2") in pairs and pairs[("a", "a2")] == 0
        assert ("a", "b") in pairs
        assert ("a", "c") not in pairs

    def test_audio_neardup_collapse_matches_direct_banding(self, spark):
        """audio_near_dup_pairs collapses to distinct fingerprints before
        banding (the duplicate-heavy-corpus scale path); its expanded
        clip-pair output must equal the direct per-clip banding on a
        corpus with duplicate payloads."""
        from data_quality_check_pipeline_spark.operators.dedup import (
            audio_near_dup_pairs,
            hamming_band_pairs,
        )
        from data_quality_check_pipeline_spark.udfs.audio import (
            with_audio_fingerprint,
        )

        rows = []
        for i in range(12):
            x = sine_pcm(
                n=4000, amp=8000.0, noise=40.0,
                seed=i % 4, freq=[440.0, 450.0, 1800.0, 2600.0][i % 4],
            )
            rows.append((f"c{i:02d}", x.tobytes(), "pcm_s16le"))
        rows.append(("silent", None, "pcm_s16le"))
        df = spark.createDataFrame(
            rows, "clip_id string, bytes binary, codec string"
        )
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in audio_near_dup_pairs(
                df, max_hamming=6, chunks=8
            ).collect()
        }
        sigs = (
            with_audio_fingerprint(df)
            .filter(F.col("audio_fp") != 0)
            .select("clip_id", "audio_fp")
        )
        want = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in hamming_band_pairs(
                sigs, "clip_id", "audio_fp", max_hamming=6, chunks=8
            ).collect()
        }
        assert got == want and len(got) > 0
        # duplicate payloads really did collapse (seed i%4 -> 4 fps)
        assert sigs.select("audio_fp").distinct().count() <= 4

    def test_audio_neardup_within_group_expansion_is_capped(self, spark):
        """r03 ADVICE: the distinct-fp collapse bounded the BANDING but
        left the pair re-expansion uncapped — one giant identical-fp
        re-upload cluster (n clips) emitted n(n-1)/2 pairs from an
        unbounded group self-join. max_bucket must now bound the
        expansion too: clips in an over-cap identical-fp group are
        excluded from within-group AND cross-group pairs, with the drop
        logged via stats_out (same tradeoff as the banding hot-bucket
        guard)."""
        from data_quality_check_pipeline_spark.operators.dedup import (
            audio_near_dup_pairs,
        )

        # measured fps (fingerprint_batch): hot == 0xc0 (the seed-2
        # re-noise lands on the SAME fingerprint — it joins the hot
        # group), small == 0x20000000000, hamming(hot, small) == 3 —
        # so small pairs CROSS-group with hot at max_hamming=6
        hot = sine_pcm(n=4000, amp=8000.0, noise=40.0, seed=1)
        hot2 = sine_pcm(n=4000, amp=8000.0, noise=40.0, seed=2)
        small = sine_pcm(
            n=4000, amp=8000.0, noise=40.0, seed=3, freq=2600.0
        )
        rows = [(f"hot{i}", hot.tobytes(), "pcm_s16le") for i in range(5)]
        rows.append(("hot5", hot2.tobytes(), "pcm_s16le"))
        rows += [(f"sm{i}", small.tobytes(), "pcm_s16le") for i in range(2)]
        df = spark.createDataFrame(
            rows, "clip_id string, bytes binary, codec string"
        )
        stats: dict = {}
        pairs = {
            (r["id_a"], r["id_b"])
            for r in audio_near_dup_pairs(
                df, max_hamming=6, chunks=8, max_bucket=3,
                stats_out=stats,
            ).collect()
        }
        assert stats["identical-fp clip groups"] == 1
        # the over-cap group (6 hot clips) is excluded from BOTH
        # expansions — no within pairs, and no cross pairs with the
        # hamming-3 small group either; only the under-cap identical
        # pair survives
        assert pairs == {("sm0", "sm1")}
        # uncapped run keeps everything: C(6,2) within-hot + 1 within-sm
        # + 6*2 cross(hot, sm)
        full = {
            (r["id_a"], r["id_b"])
            for r in audio_near_dup_pairs(
                df, max_hamming=6, chunks=8, max_bucket=None,
            ).collect()
        }
        hot_within = {
            (a, b) for a, b in full
            if a.startswith("hot") and b.startswith("hot")
        }
        cross = {
            (a, b) for a, b in full
            if {a[:2], b[:2]} == {"ho", "sm"}
        }
        assert len(hot_within) == 15 and len(cross) == 12
        assert len(full) == 15 + 1 + 12

    def test_audio_neardup_incremental_equals_full(self, spark):
        """Incremental cross-run audio dedup: mining the new batch
        against the persisted fingerprint history yields exactly the
        full recompute's pair set restricted to new-involving pairs —
        including pairs through an OLD fingerprint that gained a new
        member (a fresh re-upload of an already-ingested master)."""
        from data_quality_check_pipeline_spark.operators.dedup import (
            audio_near_dup_pairs,
            audio_near_dup_pairs_incremental,
        )
        from data_quality_check_pipeline_spark.udfs.audio import (
            with_audio_fingerprint,
        )

        rows = []
        for i in range(12):  # seed/freq cycle of 4 -> duplicate fps
            x = sine_pcm(
                n=4000, amp=8000.0, noise=40.0,
                seed=i % 4, freq=[440.0, 450.0, 1800.0, 2600.0][i % 4],
            )
            rows.append((f"c{i:02d}", x.tobytes(), "pcm_s16le"))
        schema = "clip_id string, bytes binary, codec string"
        hist_df = spark.createDataFrame(rows[:6], schema)
        new_df = spark.createDataFrame(
            rows[6:] + [("silent", None, "pcm_s16le")], schema
        )
        both = spark.createDataFrame(
            rows + [("silent", None, "pcm_s16le")], schema
        )
        full = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in audio_near_dup_pairs(
                both, max_hamming=6, chunks=8
            ).collect()
        }
        hist_fps = (
            with_audio_fingerprint(hist_df)
            .filter(F.col("audio_fp") != 0)
            .select("clip_id", "audio_fp")
        )
        inc, new_fps = audio_near_dup_pairs_incremental(
            new_df, hist_fps, max_hamming=6, chunks=8
        )
        inc = {(r["id_a"], r["id_b"], r["hamming"]) for r in inc.collect()}
        new_ids = {f"c{i:02d}" for i in range(6, 12)}
        assert inc == {
            p for p in full if p[0] in new_ids or p[1] in new_ids
        }
        # c06 (new) reuses c02's fingerprint (seed 2 / 1800 Hz): the OLD
        # fp gained a new member, so the history twin pairs at hamming 0
        assert ("c02", "c06", 0) in inc
        assert not any(
            a not in new_ids and b not in new_ids for a, b, _ in inc
        )
        # returned new_fps: the new batch's fingerprints, silent excluded
        got = {
            (r["clip_id"], r["audio_fp"]) for r in new_fps.collect()
        }
        want = {
            (r["clip_id"], r["audio_fp"])
            for r in with_audio_fingerprint(new_df)
            .filter(F.col("audio_fp") != 0)
            .select("clip_id", "audio_fp")
            .collect()
        }
        assert got == want and len(got) == 6
        # no history -> plain full mine over the new batch alone
        solo, _ = audio_near_dup_pairs_incremental(
            new_df, None, max_hamming=6, chunks=8
        )
        solo = {
            (r["id_a"], r["id_b"], r["hamming"]) for r in solo.collect()
        }
        assert solo == {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in audio_near_dup_pairs(
                new_df, max_hamming=6, chunks=8
            ).collect()
        }

    def test_audio_incremental_tablestore_run(self, spark, tmp_path):
        from data_quality_check_pipeline_spark.operators.dedup import (
            audio_near_dup_pairs,
            incremental_audio_run,
        )
        from data_quality_check_pipeline_spark.sources.tables import (
            TableStore,
        )

        rows = []
        for i in range(8):
            x = sine_pcm(
                n=4000, amp=8000.0, noise=40.0,
                seed=i % 4, freq=[440.0, 450.0, 1800.0, 2600.0][i % 4],
            )
            rows.append((f"c{i:02d}", x.tobytes(), "pcm_s16le"))
        schema = "clip_id string, bytes binary, codec string"
        b1 = spark.createDataFrame(rows[:4], schema)
        b2 = spark.createDataFrame(rows[4:], schema)
        store = TableStore(spark, str(tmp_path))
        pairset = lambda df: {  # noqa: E731
            (r["id_a"], r["id_b"], r["hamming"]) for r in df.collect()
        }
        p1 = incremental_audio_run(
            store, "audio_fps", b1, source_fingerprint="b1",
            max_hamming=6, chunks=8,
        )
        p2 = incremental_audio_run(
            store, "audio_fps", b2, source_fingerprint="b2",
            max_hamming=6, chunks=8,
        )
        assert pairset(p1) | pairset(p2) == pairset(
            audio_near_dup_pairs(
                spark.createDataFrame(rows, schema),
                max_hamming=6, chunks=8,
            )
        )
        assert store.read("audio_fps").count() == 8
        assert incremental_audio_run(
            store, "audio_fps", b2, source_fingerprint="b2",
            max_hamming=6, chunks=8,
        ) is None

    def test_fingerprint_batch_matches_spark_path(self, spark):
        """The full-payload oracle path (fingerprint_batch) and the Spark
        JVM-window path (with_audio_fingerprint) must agree bit-for-bit:
        the window extraction is integer-exact on both sides and the
        spectral code is shared. This parity is what lets the
        clips_audio_neardup golden stand as an independent oracle."""
        from data_quality_check_pipeline_spark.udfs.audio import (
            FAKE_MAGIC,
            fingerprint_batch,
            with_audio_fingerprint,
        )

        rows = []
        for i in range(12):  # varied lengths: short, exactly-FFT, long
            n = [100, 512, 3000, 8000][i % 4]
            x = sine_pcm(
                n=n, amp=3000.0 + 700 * i, noise=50.0, seed=i,
                freq=300.0 + 140.0 * i,
            )
            payload = x.tobytes()
            codec = "pcm_s16le"
            if i % 3 == 0:  # exercise a fake container too
                codec = "opus"
                payload = FAKE_MAGIC["opus"] + payload
            rows.append((f"c{i:02d}", payload, codec))
        rows.append(("null", None, "pcm_s16le"))
        rows.append(("empty", b"", "pcm_s16le"))
        df = spark.createDataFrame(
            rows, "clip_id string, bytes binary, codec string"
        )
        spark_fp = {
            r["clip_id"]: r["audio_fp"]
            for r in with_audio_fingerprint(df).collect()
        }
        py_fp = fingerprint_batch(
            [r[1] for r in rows], [r[2] for r in rows]
        )
        for (cid, _, _), fp in zip(rows, py_fp):
            assert spark_fp[cid] == int(fp), cid
        assert spark_fp["null"] == 0 and spark_fp["empty"] == 0

    def test_real_compressed_batch_marks_undecodable(self):
        """Batch path must not interpret real compressed frames as PCM —
        it marks the row n_samples=0 (-> truncated_audio quarantine) and
        leaves the rest of the batch intact."""
        x = sine_pcm(n=512)
        out = stats_batch(
            [b"\x00\x01\x02\x03" * 100, x.tobytes()], ["flac", "pcm_s16le"]
        )
        assert list(out["n_samples"]) == [0, 512]
        assert out["rms"][0] == 0.0 and out["snr_db"][0] == 0.0

    def test_stats_values(self):
        x = sine_pcm(amp=9000.0, noise=90.0)  # ~40 dB true SNR
        out = stats_batch([x.tobytes()], ["pcm_s16le"])
        assert out["n_samples"][0] == 8000
        assert out["rms"][0] == pytest.approx(9000 / np.sqrt(2), rel=0.02)
        assert out["clip_frac"][0] == 0.0
        assert out["snr_db"][0] > 30.0

    def test_clipping_detected(self):
        x = sine_pcm(amp=60000.0)
        out = stats_batch([x.tobytes()], ["pcm_s16le"])
        assert out["clip_frac"][0] > 0.2

    def test_empty_rows_mixed_batch(self):
        x = sine_pcm(n=512)
        out = stats_batch(
            [None, x.tobytes(), b"", x.tobytes()],
            ["pcm_s16le"] * 4,
        )
        assert list(out["n_samples"]) == [0, 512, 0, 512]
        assert out["rms"][1] == out["rms"][3]

    def test_spark_matches_local(self, spark):
        rows = [
            ("a", sine_pcm(seed=1).tobytes(), "pcm_s16le"),
            ("b", FAKE_MAGIC["flac"] + sine_pcm(seed=2).tobytes(), "flac"),
            ("c", None, "mp3"),
        ]
        df = spark.createDataFrame(
            rows, "clip_id string, bytes binary, codec string"
        )
        got = {
            r["clip_id"]: (
                r["n_samples"], r["rms"], r["snr_db"],
                r["silence_frac"], r["dyn_range_db"],
            )
            for r in with_audio_stats(df).collect()
        }
        local = stats_batch([r[1] for r in rows], [r[2] for r in rows])
        for i, cid in enumerate(["a", "b", "c"]):
            assert got[cid][0] == int(local["n_samples"][i])
            assert got[cid][1] == pytest.approx(float(local["rms"][i]), abs=0)
            # activity signals ride the same windows: bit-for-bit parity
            assert got[cid][3] == pytest.approx(
                float(local["silence_frac"][i]), abs=0
            )
            assert got[cid][4] == pytest.approx(
                float(local["dyn_range_db"][i]), abs=0
            )


class TestAudioActivity:
    """silence_frac / dyn_range_db — advisory window-estimate activity
    signals (curriculum/profile axes, never keep rules)."""

    def test_planted_silent_window(self):
        # zero out exactly the region the extractor reads for window 1:
        # starts are integer-exact floor(span*i/(W-1)) in sample domain
        from data_quality_check_pipeline_spark.udfs.audio import (
            _FFT_N, _N_WINDOWS,
        )

        n = 10_000
        x = sine_pcm(n=n, amp=8000.0)
        take = min(n, _FFT_N)
        span = n - take
        s1 = (span * 1) // (_N_WINDOWS - 1)
        x[s1:s1 + _FFT_N] = 0
        out = stats_batch([x.tobytes()], ["pcm_s16le"])
        assert out["silence_frac"][0] == pytest.approx(0.25)
        assert out["dyn_range_db"][0] > 40.0  # loud vs silent window

    def test_all_silence_and_empty_rows(self):
        zeros = np.zeros(8000, dtype="<i2")
        out = stats_batch(
            [zeros.tobytes(), None, b"", sine_pcm().tobytes()],
            ["pcm_s16le"] * 4,
        )
        # digital silence and undecodable/empty rows are all-silence
        assert list(out["silence_frac"]) == [1.0, 1.0, 1.0, 0.0]
        # constant-level rows have zero dynamic range
        assert out["dyn_range_db"][0] == 0.0
        assert out["dyn_range_db"][3] == pytest.approx(0.0, abs=0.1)

    def test_quiet_clip_is_silent_by_absolute_threshold(self):
        # uniformly ~-45 dBFS: every window under _SILENCE_RMS
        quiet = sine_pcm(amp=250.0)
        out = stats_batch([quiet.tobytes()], ["pcm_s16le"])
        assert out["silence_frac"][0] == 1.0

    def test_advisory_columns_flow_to_scored_clips(self, spark):
        from data_quality_check_pipeline_spark.pipeline import score_clips

        df = spark.createDataFrame(
            [
                (
                    "c1",
                    sine_pcm(n=16000, sr=16000).tobytes(),
                    16000,
                    1000,
                    "pcm_s16le",
                    "a perfectly normal sentence here",
                )
            ],
            "clip_id string, bytes binary, sr_hz int, dur_ms int,"
            " codec string, transcript string",
        )
        row = score_clips(df).collect()[0]
        assert 0.0 <= row["silence_frac"] <= 1.0
        assert row["dyn_range_db"] >= 0.0


# -- real-codec decode adapter ----------------------------------------------

REAL_MAGIC = b"REAL"


def _make_injected_decoder():
    """Stand-in for soundfile/ffmpeg: 'real' compressed payloads are
    REAL + codec[:4] + PCM16; anything else is undecodable (raises, as
    the adapter contract says). Built as a CLOSURE on purpose: the test
    module is not importable on python workers, so a module-level
    function would cloudpickle by reference and fail to deserialize —
    exactly the constraint real deployments face, which is why
    make_decode_windows_udf captures the decoder by value."""

    def injected_decoder(payload: bytes, codec: str):
        import numpy as _np

        magic = b"REAL" + codec[:4].encode().ljust(4, b"_")
        if payload[: len(magic)] != magic:
            raise ValueError(f"not a {codec} stream")
        return _np.frombuffer(payload[len(magic):], dtype="<i2")

    return injected_decoder


injected_decoder = _make_injected_decoder()


def real_payload(samples: np.ndarray, codec: str) -> bytes:
    return REAL_MAGIC + codec[:4].encode().ljust(4, b"_") + samples.tobytes()


class TestRealCodecAdapter:
    """The dependency-gated real-codec decode hook (udfs/audio.py
    compressed_decoder / make_decode_windows_udf): with a decoder
    present, flac/opus/mp3 clips SCORE instead of quarantining, on
    every path (decode_payload, stats_batch, with_audio_stats,
    with_audio_fingerprint) — and the decoder-less build is untouched."""

    def test_autodetect_is_none_in_sandbox(self):
        from data_quality_check_pipeline_spark.udfs import audio

        assert audio.compressed_decoder() is None

    def test_decode_payload_uses_injected_decoder(self):
        x = sine_pcm(n=1000)
        got = decode_payload(
            real_payload(x, "flac"), "flac", decoder=injected_decoder
        )
        np.testing.assert_array_equal(got, x)
        # explicit None: the sandbox behavior, still honest
        with pytest.raises(NotImplementedError):
            decode_payload(
                real_payload(x, "flac"), "flac", decoder=None
            )

    def test_stats_batch_real_equals_fake_container(self):
        """Same PCM through the real-decode path and the fake-container
        path must yield bit-identical stats — the adapter only changes
        WHO strips the container, never the window math."""
        x = sine_pcm(amp=9000.0, noise=90.0)
        via_real = stats_batch(
            [real_payload(x, "opus")], ["opus"],
            decoder=injected_decoder,
        )
        via_fake = stats_batch(
            [FAKE_MAGIC["opus"] + x.tobytes()], ["opus"]
        )
        pd.testing.assert_frame_equal(via_real, via_fake)
        assert via_real["snr_db"][0] > 30.0

    def test_spark_real_rows_score_and_match_local(self, spark):
        """End-to-end Spark plan with the adapter: real flac/opus rows
        decode and score; pcm + fake rows are untouched (bit-identical
        to the decoder-less plan); corrupt real payloads mark
        n_samples=0 (quarantine routing), never kill the batch."""
        rows = [
            ("pcm", sine_pcm(seed=1).tobytes(), "pcm_s16le"),
            ("fake", FAKE_MAGIC["flac"] + sine_pcm(seed=2).tobytes(),
             "flac"),
            ("real_flac", real_payload(sine_pcm(seed=3), "flac"),
             "flac"),
            ("real_opus", real_payload(
                sine_pcm(seed=4, amp=9000.0, noise=90.0), "opus"
            ), "opus"),
            ("corrupt", b"\x00\x01\x02\x03" * 100, "mp3"),
            ("nullrow", None, "mp3"),
        ]
        df = spark.createDataFrame(
            rows, "clip_id string, bytes binary, codec string"
        )
        got = {
            r["clip_id"]: r
            for r in with_audio_stats(
                df, decoder=injected_decoder
            ).collect()
        }
        assert got["real_flac"]["n_samples"] == 8000
        assert got["real_opus"]["snr_db"] > 30.0
        assert got["corrupt"]["n_samples"] == 0
        assert got["nullrow"]["n_samples"] == 0
        # full-payload local path with the same decoder: parity
        local = stats_batch(
            [r[1] for r in rows], [r[2] for r in rows],
            decoder=injected_decoder,
        )
        for i, (cid, _, _) in enumerate(rows):
            assert got[cid]["n_samples"] == int(local["n_samples"][i])
            assert got[cid]["rms"] == pytest.approx(
                float(local["rms"][i]), abs=0
            ), cid
            assert got[cid]["snr_db"] == pytest.approx(
                float(local["snr_db"][i]), abs=0
            ), cid
        # decoder-less plan unchanged for the non-real rows
        base = {
            r["clip_id"]: r
            for r in with_audio_stats(df, decoder=None).collect()
        }
        for cid in ("pcm", "fake", "nullrow"):
            assert base[cid]["rms"] == got[cid]["rms"]
        assert base["real_flac"]["n_samples"] == 0  # sandbox behavior

    def test_fingerprint_real_equals_fake_container(self, spark):
        from data_quality_check_pipeline_spark.udfs.audio import (
            with_audio_fingerprint,
        )

        x = sine_pcm(seed=7, amp=9000.0, noise=30.0)
        df = spark.createDataFrame(
            [
                ("real", real_payload(x, "flac"), "flac"),
                ("fake", FAKE_MAGIC["flac"] + x.tobytes(), "flac"),
            ],
            "clip_id string, bytes binary, codec string",
        )
        fp = {
            r["clip_id"]: r["audio_fp"]
            for r in with_audio_fingerprint(
                df, decoder=injected_decoder
            ).collect()
        }
        assert fp["real"] == fp["fake"] != 0

    def test_score_clips_picks_up_autodetected_decoder(
        self, spark, monkeypatch
    ):
        """Pipeline integration without pipeline changes: score_clips'
        default decoder='auto' resolves through compressed_decoder(),
        so a deployment where soundfile imports just works. Simulate by
        planting the injected decoder in the autodetect cache."""
        from data_quality_check_pipeline_spark.pipeline import score_clips
        from data_quality_check_pipeline_spark.udfs import audio

        monkeypatch.setattr(audio, "_AUTO_DECODER", injected_decoder)
        df = spark.createDataFrame(
            [
                (
                    "r1",
                    real_payload(
                        sine_pcm(n=16000, sr=16000, amp=9000.0,
                                 noise=90.0), "flac"
                    ),
                    16000,
                    1000,
                    "flac",
                    "a perfectly normal sentence here",
                )
            ],
            "clip_id string, bytes binary, sr_hz int, dur_ms int,"
            " codec string, transcript string",
        )
        row = score_clips(df).collect()[0]
        assert row["n_samples"] == 16000  # scored, not quarantined
        assert row["snr_db"] > 30.0


class TestDecodeOnceCombined:
    """with_audio_stats_and_fingerprint (the r05 decode-twice fix):
    stats + fingerprint from ONE shared window materialization —
    bit-identical columns, exactly one decode-UDF node in the plan,
    and the decoder invoked once per real-compressed row per pass."""

    def _rows(self):
        return [
            ("pcm", sine_pcm(seed=1).tobytes(), "pcm_s16le"),
            ("fake", FAKE_MAGIC["flac"] + sine_pcm(seed=2).tobytes(),
             "flac"),
            ("real_flac", real_payload(
                sine_pcm(seed=3, amp=9000.0, noise=90.0), "flac"
            ), "flac"),
            ("real_opus", real_payload(
                sine_pcm(seed=4, amp=9000.0, noise=90.0), "opus"
            ), "opus"),
            ("corrupt", b"\x00\x01\x02\x03" * 100, "mp3"),
            ("nullrow", None, "mp3"),
        ]

    def test_matches_separate_operators_bitexact(self, spark):
        from data_quality_check_pipeline_spark.udfs.audio import (
            with_audio_fingerprint,
            with_audio_stats,
            with_audio_stats_and_fingerprint,
        )

        df = spark.createDataFrame(
            self._rows(), "clip_id string, bytes binary, codec string"
        )
        combined = {
            r["clip_id"]: r
            for r in with_audio_stats_and_fingerprint(
                df, decoder=injected_decoder
            ).collect()
        }
        stats = {
            r["clip_id"]: r
            for r in with_audio_stats(
                df, decoder=injected_decoder
            ).collect()
        }
        fps = {
            r["clip_id"]: r["audio_fp"]
            for r in with_audio_fingerprint(
                df, decoder=injected_decoder
            ).collect()
        }
        for cid in combined:
            for c in ("n_samples", "rms", "clip_frac", "snr_db",
                      "silence_frac", "dyn_range_db"):
                assert combined[cid][c] == stats[cid][c], (cid, c)
            assert combined[cid]["audio_fp"] == fps[cid], cid

    def test_single_decode_udf_node_in_plan(self, spark):
        from data_quality_check_pipeline_spark.udfs.audio import (
            with_audio_stats_and_fingerprint,
        )

        df = spark.createDataFrame(
            self._rows(), "clip_id string, bytes binary, codec string"
        )
        plan = (
            with_audio_stats_and_fingerprint(df, decoder=injected_decoder)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("decode_windows(") == 1, plan

    def test_decoder_invoked_once_per_real_row(self, spark, tmp_path):
        """Count actual decoder calls (each call appends one line to a
        shared file — the python workers run on this host): the
        combined operator decodes each real-compressed row ONCE, where
        the two separate operators decode it twice."""
        from data_quality_check_pipeline_spark.udfs.audio import (
            with_audio_fingerprint,
            with_audio_stats,
            with_audio_stats_and_fingerprint,
        )

        marker = str(tmp_path / "decode_calls.log")

        def counting_decoder(payload: bytes, codec: str):
            import numpy as _np

            with open(marker, "a") as f:
                f.write("x\n")
            magic = b"REAL" + codec[:4].encode().ljust(4, b"_")
            if payload[: len(magic)] != magic:
                raise ValueError(f"not a {codec} stream")
            return _np.frombuffer(payload[len(magic):], dtype="<i2")

        rows = [r for r in self._rows() if r[0].startswith("real")]
        df = spark.createDataFrame(
            rows, "clip_id string, bytes binary, codec string"
        )
        with_audio_stats_and_fingerprint(
            df, decoder=counting_decoder
        ).collect()
        once = sum(1 for _ in open(marker))
        assert once == len(rows), "combined pass must decode each row once"
        # the old two-operator composition decodes twice
        open(marker, "w").close()
        with_audio_stats(df, decoder=counting_decoder).collect()
        with_audio_fingerprint(df, decoder=counting_decoder).collect()
        twice = sum(1 for _ in open(marker))
        assert twice == 2 * len(rows)


class TestDecoderBackends:
    """The two autodetected decoder backends, exercised for REAL
    in-sandbox: _ffmpeg_decoder against an executable planted on PATH
    speaking the pipe contract, _soundfile_decoder against an injected
    soundfile module — so the branch that runs in production is tested,
    not just the injection seam around it."""

    def test_ffmpeg_backend_pipe_contract(self, tmp_path, monkeypatch):
        import os
        import stat

        from data_quality_check_pipeline_spark.udfs.audio import (
            _ffmpeg_decoder,
        )

        # a stand-in ffmpeg honoring `-i pipe:0 ... pipe:1`: emits
        # stdin unchanged (payload already s16le), exits 0
        exe = tmp_path / "ffmpeg"
        exe.write_text("#!/bin/sh\ncat\n")
        exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
        monkeypatch.setenv(
            "PATH", f"{tmp_path}{os.pathsep}" + os.environ["PATH"]
        )
        dec = _ffmpeg_decoder()
        assert dec is not None
        x = sine_pcm(n=500)
        np.testing.assert_array_equal(dec(x.tobytes(), "opus"), x)

    def test_ffmpeg_backend_failure_raises(self, tmp_path, monkeypatch):
        import os
        import stat

        from data_quality_check_pipeline_spark.udfs.audio import (
            _ffmpeg_decoder,
        )

        exe = tmp_path / "ffmpeg"
        exe.write_text("#!/bin/sh\nexit 1\n")
        exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
        monkeypatch.setenv(
            "PATH", f"{tmp_path}{os.pathsep}" + os.environ["PATH"]
        )
        dec = _ffmpeg_decoder()
        with pytest.raises(Exception):
            dec(b"\x00\x01", "mp3")  # -> row marked undecodable upstream

    def test_ffmpeg_backend_absent_is_none(self, tmp_path, monkeypatch):
        from data_quality_check_pipeline_spark.udfs.audio import (
            _ffmpeg_decoder,
        )

        monkeypatch.setenv("PATH", str(tmp_path))  # nothing on PATH
        assert _ffmpeg_decoder() is None

    def test_soundfile_backend_reads_and_downmixes(self, monkeypatch):
        import sys
        import types

        from data_quality_check_pipeline_spark.udfs.audio import (
            _soundfile_decoder,
        )

        calls = {}

        def fake_read(fobj, dtype, always_2d):
            calls["dtype"], calls["always_2d"] = dtype, always_2d
            # stereo: [L, R] per frame -> integer-mean downmix expected
            data = np.array(
                [[100, 300], [-100, -301], [32000, 32000]],
                dtype=np.int16,
            )
            return data, 16000

        monkeypatch.setitem(
            sys.modules, "soundfile",
            types.SimpleNamespace(read=fake_read),
        )
        dec = _soundfile_decoder()
        assert dec is not None
        got = dec(b"payload-bytes", "flac")
        assert calls == {"dtype": "int16", "always_2d": True}
        np.testing.assert_array_equal(
            got, np.array([200, -200, 32000], dtype=np.int16)
        )
        assert got.dtype == np.int16

    def test_soundfile_backend_mono_passthrough(self, monkeypatch):
        import sys
        import types

        from data_quality_check_pipeline_spark.udfs.audio import (
            _soundfile_decoder,
        )

        mono = np.array([[1], [2], [3]], dtype=np.int16)
        monkeypatch.setitem(
            sys.modules, "soundfile",
            types.SimpleNamespace(
                read=lambda f, dtype, always_2d: (mono, 8000)
            ),
        )
        dec = _soundfile_decoder()
        np.testing.assert_array_equal(
            dec(b"x", "flac"), np.array([1, 2, 3], dtype=np.int16)
        )
