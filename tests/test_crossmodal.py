"""Cross-modal consistency mining (operators/crossmodal.py): planted
same-audio/different-transcript and same-transcript/different-audio
conflicts must surface as group rows with exact counts and example ids;
missing modalities (NULL text, fp=0 audio) are never conflict evidence.
"""

from __future__ import annotations

import pytest

from data_quality_check_pipeline_spark.operators.crossmodal import (
    KINDS,
    cross_modal_conflicts,
    cross_modal_report,
)
from test_udfs import sine_pcm


@pytest.fixture(scope="module")
def planted(spark):
    """Seven clips: audio A carries two transcript variants (T1 x2 with
    case/whitespace differences that normalize together, T2 x1); T1 also
    rides on audio B (distinct tone, hamming >= 2 from A per the
    fingerprint tests); C/T3 is clean; one NULL-text and one NULL-bytes
    row must be ignored."""
    a = sine_pcm(n=8000, amp=9000.0, noise=60.0, seed=1).tobytes()
    b = sine_pcm(
        n=8000, amp=9000.0, noise=60.0, seed=3, freq=1800.0
    ).tobytes()
    c = sine_pcm(
        n=8000, amp=9000.0, noise=60.0, seed=5, freq=3000.0
    ).tobytes()
    t1, t1_alt, t2, t3 = (
        "hello world one",
        "  Hello   WORLD one ",  # same content key after normalization
        "goodbye moon two",
        "unique script three",
    )
    rows = [
        ("a0", a, "pcm_s16le", t1),
        ("a1", a, "pcm_s16le", t1_alt),
        ("a2", a, "pcm_s16le", t2),
        ("b1", b, "pcm_s16le", t1),
        ("c1", c, "pcm_s16le", t3),
        ("n1", a, "pcm_s16le", None),  # missing text: not evidence
        ("z1", None, "pcm_s16le", t1),  # fp=0 audio: not evidence
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, codec string, "
        "transcript string"
    )
    return {r["conflict_type"] + "|" + r["group_key"]: r
            for r in cross_modal_conflicts(df).collect()}, df


class TestCrossModalConflicts:
    def test_planted_conflicts_exact(self, planted):
        got, _ = planted
        kinds = sorted(k.split("|")[0] for k in got)
        assert kinds == [
            "same_audio_diff_text", "same_text_diff_audio"
        ]
        audio = next(
            r for k, r in got.items()
            if k.startswith("same_audio_diff_text")
        )
        # fp(A) group: variants T1 {a0, a1} and T2 {a2}; the NULL-text
        # rider n1 is excluded
        assert audio["n_clips"] == 3 and audio["n_variants"] == 2
        assert (audio["example_id_a"], audio["example_id_b"]) == (
            "a0", "a2"
        )
        text = next(
            r for k, r in got.items()
            if k.startswith("same_text_diff_audio")
        )
        # T1 group: variants fp(A) {a0, a1} and fp(B) {b1}; the
        # undecodable z1 is excluded
        assert text["n_clips"] == 3 and text["n_variants"] == 2
        assert (text["example_id_a"], text["example_id_b"]) == (
            "a0", "b1"
        )

    def test_kind_filter_and_unknown_kind(self, planted):
        _, df = planted
        only = cross_modal_conflicts(
            df, kinds=("same_text_diff_audio",)
        ).collect()
        assert [r["conflict_type"] for r in only] == [
            "same_text_diff_audio"
        ]
        with pytest.raises(ValueError, match="unknown conflict kinds"):
            cross_modal_conflicts(df, kinds=("same_audio_diff_text",
                                             "nope"))

    def test_report_shape(self, planted):
        _, df = planted
        rep = cross_modal_report(cross_modal_conflicts(df))
        assert rep["conflict_groups_total"] == 2
        for kind in KINDS:
            assert rep[kind]["groups"] == 1
            assert rep[kind]["clips"] == 3
            assert rep[kind]["worst_group_clips"] == 3

    def test_plan_has_no_joins(self, planted):
        """Scale pin: the conflict report is two hash-keyed aggregate
        chains — NO join, NO cartesian product, ever. Pair expansion
        creeping in would turn a duplicate-heavy corpus quadratic."""
        _, df = planted
        q = cross_modal_conflicts(df)
        plan = q._sc._jvm.PythonSQLUtils.explainString(
            q._jdf.queryExecution(), "formatted"
        )
        assert "Join" not in plan and "CartesianProduct" not in plan
        assert "Aggregate" in plan  # Hash- or SortAggregate chains

    def test_no_conflicts_empty_report(self, spark):
        a = sine_pcm(n=8000, amp=9000.0, noise=60.0, seed=1).tobytes()
        df = spark.createDataFrame(
            [("x", a, "pcm_s16le", "only one")],
            "clip_id string, bytes binary, codec string, "
            "transcript string",
        )
        conflicts = cross_modal_conflicts(df)
        assert conflicts.count() == 0
        rep = cross_modal_report(conflicts)
        assert rep["conflict_groups_total"] == 0
        assert rep[KINDS[0]] == {"groups": 0, "clips": 0}
