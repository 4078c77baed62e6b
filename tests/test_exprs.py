"""Unit tests for shared expressions: null semantics, masks, cleaners,
scrub chain — exact-value asserts mirroring the reference's unit style
(/root/reference/tests/test_pipeline.py:305-334 masking golden values)."""

import weakref

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_quality_check_pipeline_spark.functions.exprs import (
    mask_address,
    mask_dob,
    mask_email,
    mask_name,
    mask_phone,
    null_or_empty,
    pii_hits_expr,
    scrub_expr,
)
from data_quality_check_pipeline_spark.operators.clean import (
    clean_date,
    clean_email,
    clean_name,
    clean_phone,
    fill_missing,
)


def one(spark, value, expr):
    df = spark.createDataFrame([Row(c=value)], "c string")
    return df.select(expr.alias("out")).collect()[0]["out"]


class TestNullSemantics:
    @pytest.mark.parametrize(
        "value,expected",
        [
            (None, True),
            ("", True),
            ("   ", True),
            ("nan", True),
            ("NaN", True),
            ("x", False),
            ("0", False),
        ],
    )
    def test_null_or_empty(self, spark, value, expected):
        assert one(spark, value, null_or_empty(F.col("c"))) is expected


class TestMasks:
    def test_mask_name(self, spark):
        assert one(spark, "John", mask_name("c")) == "J***"

    def test_mask_email(self, spark):
        assert one(spark, "john@gmail.com", mask_email("c")) == "j***@gmail.com"

    def test_mask_email_no_at_passthrough(self, spark):
        assert one(spark, "not-an-email", mask_email("c")) == "not-an-email"

    def test_mask_phone(self, spark):
        assert one(spark, "555-123-4567", mask_phone("c")) == "***-***-4567"

    def test_mask_address(self, spark):
        assert (
            one(spark, "123 Main St New York NY 10001", mask_address("c"))
            == "[MASKED ADDRESS]"
        )

    def test_mask_dob(self, spark):
        assert one(spark, "1985-03-15", mask_dob("c")) == "1985-**-**"

    def test_masks_passthrough_missing(self, spark):
        for m in (mask_name, mask_email, mask_phone, mask_address, mask_dob):
            assert one(spark, None, m("c")) is None


class TestCleaners:
    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("555-123-4567", "555-123-4567"),
            ("(555) 234-5678", "555-234-5678"),
            ("5551234567", "555-123-4567"),
            ("1-555-123-4567", "555-123-4567"),
            ("555.987.6543", "555-987-6543"),
            ("12345", "12345"),  # unparseable passthrough
        ],
    )
    def test_clean_phone(self, spark, raw, expected):
        assert one(spark, raw, clean_phone("c")) == expected

    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("1985-03-15", "1985-03-15"),
            ("1990/07/22", "1990-07-22"),
            ("01/15/2024", "2024-01-15"),
            ("invalid_date", None),
            (None, None),
            # matches NO format -> passes through UNCHANGED (reference
            # cleaner.py:92-127 falls through its format loop; nulling
            # would destroy data)
            ("Jan 5, 2023", "Jan 5, 2023"),
            ("2023-13-45", "2023-13-45"),
        ],
    )
    def test_clean_date(self, spark, raw, expected):
        assert one(spark, raw, clean_date("c")) == expected

    def test_clean_name_email(self, spark):
        assert one(spark, "john doe", clean_name("c")) == "John Doe"
        assert one(spark, "JANE@WORK.COM", clean_email("c")) == "jane@work.com"

    def test_fill_missing(self, spark):
        df = spark.createDataFrame(
            [Row(a="", b=None), Row(a="x", b=5.0)],
            "a string, b double",
        )
        got = {
            (r["a"], r["b"])
            for r in fill_missing(df, {"a": "[UNKNOWN]", "b": 0.0}).collect()
        }
        assert got == {("[UNKNOWN]", 0.0), ("x", 5.0)}


class TestScrub:
    def test_scrub_order_and_tokens(self, spark):
        raw = (
            "mail a@b.com or call 555-123-4567 ssn 123-45-6789 you FRAK"
        )
        out = one(spark, raw, scrub_expr("c"))
        assert out == "mail [EMAIL] or call [PHONE] ssn [SSN] you [TOX]"
        assert one(spark, raw, pii_hits_expr("c")) == 4

    def test_scrub_phone_variants(self, spark):
        for raw, expected in [
            ("call (555) 234-5678 now", "call [PHONE] now"),
            ("call 555.987.6543 now", "call [PHONE] now"),
            ("call 5551234567 now", "call [PHONE] now"),
        ]:
            assert one(spark, raw, scrub_expr("c")) == expected

    def test_email_digits_not_phone(self, spark):
        # an email containing 10 digits must be scrubbed as EMAIL only
        raw = "x 5551234567a@b.com y"
        assert one(spark, raw, scrub_expr("c")) == "x [EMAIL] y"

    def test_no_pii_passthrough(self, spark):
        raw = "perfectly clean transcript"
        assert one(spark, raw, scrub_expr("c")) == raw
        assert one(spark, raw, pii_hits_expr("c")) == 0

    def test_pii_type_counts_breakdown(self, spark):
        from data_quality_check_pipeline_spark.functions.exprs import (
            pii_type_counts_exprs,
        )

        raw = (
            "a@b.com c@d.org call 555-123-4567 ssn 123-45-6789 FRAK blorgit"
        )
        counts = pii_type_counts_exprs("c")
        got = {k: one(spark, raw, v) for k, v in counts.items()}
        assert got == {"emails": 2, "phones": 1, "ssns": 1, "tox": 2}
        assert sum(got.values()) == one(spark, raw, pii_hits_expr("c"))

    def test_pii_type_counts_sequential_order(self, spark):
        from data_quality_check_pipeline_spark.functions.exprs import (
            pii_type_counts_exprs,
        )

        # the digits of an email must NOT re-count as a phone once the
        # email is replaced (fixed-order semantics)
        raw = "x 5551234567a@b.com y"
        counts = pii_type_counts_exprs("c")
        got = {k: one(spark, raw, v) for k, v in counts.items()}
        assert got == {"emails": 1, "phones": 0, "ssns": 0, "tox": 0}

    def test_scrub_stats_with_types(self, spark):
        from data_quality_check_pipeline_spark.operators.scrub import (
            scrub_stats,
            scrub_transcripts,
        )

        df = spark.createDataFrame(
            [("a@b.com and 555-123-4567",), ("clean",), ("FRAK",)],
            "transcript string",
        )
        s = scrub_stats(scrub_transcripts(df), transcript="transcript")
        assert s["rows"] == 3 and s["rows_with_pii"] == 2
        assert s["total_hits"] == 3
        assert (s["pii_emails"], s["pii_phones"], s["pii_ssns"],
                s["pii_tox"]) == (1, 1, 0, 1)


class TestSpeechRate:
    def test_values_and_null_contract(self, spark):
        from data_quality_check_pipeline_spark.functions.exprs import (
            speech_rate_expr,
        )

        rows = [
            (0, "one two three four", 2000),   # 4 words / 2 s
            (1, "  spaced   out  ", 1000),     # norm -> 2 words / 1 s
            (2, None, 1000),                   # no transcript -> NULL
            (3, "", 1000),                     # empty -> NULL
            (4, "nan", 1000),                  # literal nan -> NULL
            (5, "words here", None),           # no duration -> NULL
            (6, "words here", 0),              # non-positive -> NULL
            (7, "w", 100),                     # 1 word / 0.1 s
        ]
        df = spark.createDataFrame(
            rows, "id long, transcript string, dur_ms int"
        )
        got = {
            r["id"]: r["sr"]
            for r in df.select(
                "id", speech_rate_expr().alias("sr")
            ).collect()
        }
        assert got[0] == pytest.approx(2.0)
        assert got[1] == pytest.approx(2.0)
        assert got[2] is None and got[3] is None and got[4] is None
        assert got[5] is None and got[6] is None
        assert got[7] == pytest.approx(10.0)

    def test_rides_score_path_into_clean_table(
        self, spark, corpus, out_root
    ):
        """score_clips stamps speech_rate, so the clean table carries
        it and a curriculum keyed on it works end-to-end (NULL rates
        keep per the curriculum NULL contract)."""
        from data_quality_check_pipeline_spark.pipeline import (
            CLEAN_TABLE,
            RunConfig,
            run_pipeline,
        )
        from data_quality_check_pipeline_spark.sources.tables import (
            TableStore,
        )

        run_pipeline(
            spark, corpus[2],
            RunConfig(
                out_root=out_root, run_id="sr1",
                curriculum_col="speech_rate",
                curriculum_rates=[0.0, 1.0],
                curriculum_edges=[2.5],
            ),
        )
        rows = (
            TableStore(spark, out_root).read(CLEAN_TABLE)
            .select("clip_id", "transcript", "dur_ms", "speech_rate")
            .collect()
        )
        assert len(rows) > 0
        for r in rows:
            expected = round(
                len(r["transcript"].split()) / (r["dur_ms"] / 1000.0), 6
            )
            assert r["speech_rate"] == pytest.approx(expected)
            assert r["speech_rate"] > 2.5  # curriculum dropped bin 0


class TestColumnMemo:
    """Session-scoped Column-tree memo (functions/colmemo.py, r06):
    string-keyed builders return the SAME tree within one SparkContext,
    Column-argument calls bypass the memo, and a context change drops
    every cached tree (stale-gateway guard)."""

    def test_string_args_hit_memo(self, spark):
        from data_quality_check_pipeline_spark.functions.exprs import (
            scrub_expr,
        )
        from data_quality_check_pipeline_spark.operators.validate import (
            active_rules,
        )

        assert scrub_expr("t") is scrub_expr("t")
        assert active_rules(True) is active_rules(True)
        assert active_rules(True) is not active_rules(False)

    def test_column_args_bypass_memo(self, spark):
        from data_quality_check_pipeline_spark.functions.exprs import (
            scrub_expr,
        )

        assert scrub_expr(F.col("t")) is not scrub_expr(F.col("t"))

    def test_context_change_resets(self, spark):
        from data_quality_check_pipeline_spark.functions import colmemo
        from data_quality_check_pipeline_spark.functions.exprs import (
            scrub_expr,
        )

        before = scrub_expr("t")
        # simulate "a different SparkContext became active": the guard
        # only compares identity via the stored weakref, so pointing it
        # at a different object forces the reset path
        class _FakeCtx:
            pass

        colmemo._ctx_ref = weakref.ref(_FakeCtx())
        after = scrub_expr("t")
        assert after is not before
        assert scrub_expr("t") is after  # re-memoized under the new ctx

    def test_memoized_trees_resolve_per_dataframe(self, spark):
        # one shared tree, two different input DataFrames: unresolved
        # attributes bind per-plan, so values track each frame
        from data_quality_check_pipeline_spark.functions.exprs import (
            scrub_expr,
        )

        e = scrub_expr("c")
        a = one(spark, "mail me: bob@x.com", e)
        b = one(spark, "no pii here", e)
        assert a == "mail me: [EMAIL]"
        assert b == "no pii here"
