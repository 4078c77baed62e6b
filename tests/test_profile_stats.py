"""Profiling + statistical operator tests, including the reference-style
100-row income fixture with planted outliers [500000, -5000]
(/root/reference/tests/test_pipeline.py:93-112)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_quality_check_pipeline_spark.operators.expectations import (
    Expectation,
    clips_suite,
    evaluate_suite,
)
from data_quality_check_pipeline_spark.operators.profile import (
    completeness,
    freshness,
    histogram,
    numeric_summary,
    uniqueness,
)
from data_quality_check_pipeline_spark.operators.stats import (
    value_clustering,
    with_iqr_outliers,
    with_zscore_outliers,
)


@pytest.fixture(scope="module")
def income_df(spark):
    rng = np.random.RandomState(42)
    incomes = list(rng.normal(70000, 15000, 98)) + [500000.0, -5000.0]
    rows = [(i + 1, float(v)) for i, v in enumerate(incomes)]
    return spark.createDataFrame(rows, "id int, income double")


class TestStats:
    def test_iqr_outliers_planted(self, income_df):
        flagged, bounds = with_iqr_outliers(income_df, "income")
        out = {r["id"]: r for r in flagged.collect() if r["is_outlier"]}
        assert 99 in out and 100 in out  # the planted outliers
        assert out[99]["outlier_severity"] == "HIGH"
        assert bounds["lower"] < 70000 < bounds["upper"]

    def test_zscore_outliers_planted(self, income_df):
        flagged, stats = with_zscore_outliers(income_df, "income")
        ids = {r["id"] for r in flagged.collect() if r["is_outlier"]}
        assert 99 in ids
        assert stats["std"] > 0

    def test_numeric_summary_matches_numpy(self, income_df):
        s = numeric_summary(income_df, "income")
        vals = np.array([r["income"] for r in income_df.collect()])
        assert s["median"] == pytest.approx(
            float(np.percentile(vals, 50)), rel=0.01
        )
        assert s["mean"] == pytest.approx(float(vals.mean()), rel=1e-9)

    def test_date_bounds_flag(self, spark):
        from data_quality_check_pipeline_spark.operators.stats import (
            with_date_bounds_flag,
        )

        df = spark.createDataFrame(
            [(1, "1919-12-31"), (2, "1920-01-01"), (3, "2000-06-15"),
             (4, "2026-12-31"), (5, "2027-01-01"), (6, None)],
            "id int, d string",
        ).withColumn("d", F.to_date("d"))
        flags = {
            r["id"]: r["date_out_of_bounds"]
            for r in with_date_bounds_flag(df, "d").collect()
        }
        # bounds inclusive; NULL (unparseable) flags true
        assert flags == {1: True, 2: False, 3: False, 4: False,
                         5: True, 6: True}

    def test_value_clustering_detects_skew(self, spark):
        df = spark.createDataFrame(
            [("en",)] * 80 + [("fr",)] * 20, "lang string"
        )
        r = value_clustering(df, "lang", max_share=0.5)
        assert r["skewed"] and r["top_value"] == "en"
        assert r["share"] == pytest.approx(0.8)


class TestProfile:
    def test_completeness_null_semantics(self, spark):
        df = spark.createDataFrame(
            [("a",), (None,), ("",), ("nan",), ("  ",)], "c string"
        )
        got = completeness(df, ["c"])
        assert got["columns"]["c"]["missing"] == 4

    def test_uniqueness(self, spark):
        df = spark.createDataFrame(
            [("a",), ("a",), ("b",), (None,)], "k string"
        )
        u = uniqueness(df, "k")
        assert u == {
            "non_null": 3, "distinct": 2, "duplicates": 1,
            "dup_pct": pytest.approx(100 / 3),
        }

    def test_histogram_lower(self, spark):
        df = spark.createDataFrame(
            [("FLAC",), ("flac",), ("mp3",)], "codec string"
        )
        h = {r["codec"]: r["n"] for r in histogram(df, "codec", lower=True).collect()}
        assert h == {"flac": 2, "mp3": 1}

    def test_freshness(self, spark):
        df = spark.sql("select current_timestamp() - interval 1 hour as ts")
        assert freshness(df, "ts", max_age_hours=24)["fresh"]
        df_old = spark.sql("select timestamp'2000-01-01' as ts")
        assert not freshness(df_old, "ts", max_age_hours=24)["fresh"]

    def test_freshness_on_date_type(self, spark):
        """DateType collects as datetime.date — must not TypeError on the
        datetime subtraction (TPC-H-style o_orderdate is DATE)."""
        df_old = spark.sql("select date'2000-01-01' as d")
        r = freshness(df_old, "d", max_age_hours=24)
        assert r["fresh"] is False and r["age_hours"] > 24
        df_new = spark.sql("select current_date() as d")
        r2 = freshness(df_new, "d", max_age_hours=48)
        assert r2["fresh"] is True

    def test_empty_input_returns_empty_summary_not_crash(self, spark):
        from data_quality_check_pipeline_spark.operators.profile import (
            numeric_summary,
        )
        from data_quality_check_pipeline_spark.operators.stats import (
            with_iqr_outliers,
            with_zscore_outliers,
        )

        empty = spark.createDataFrame([], "x double")
        s = numeric_summary(empty, "x")
        assert s["empty"] and s["median"] is None
        flagged, s2 = with_iqr_outliers(empty, "x")
        assert flagged.count() == 0 and s2["empty"]
        flagged_z, stats_z = with_zscore_outliers(empty, "x")
        assert flagged_z.count() == 0 and stats_z["mean"] is None
        # all-null column behaves like empty
        nulls = spark.createDataFrame(
            [(None,), (None,)], "x double"
        )
        flagged_n, _ = with_zscore_outliers(nulls, "x")
        assert [r["is_outlier"] for r in flagged_n.collect()] == [
            False, False,
        ]


class TestExpectations:
    def test_mostly_semantics(self, spark):
        df = spark.createDataFrame(
            [("a",)] * 95 + [(None,)] * 5, "c string"
        )
        suite = [
            Expectation("not_be_null", "c", mostly=0.9),
            Expectation("not_be_null", "c", mostly=0.99),
        ]
        r, extras = evaluate_suite(df, suite)
        assert extras == {}
        assert r[0]["success"] and not r[1]["success"]
        assert r[0]["pass_rate"] == pytest.approx(0.95)

    def test_empty_input_is_vacuously_satisfied(self, spark):
        """Zero evaluated rows -> NULL aggregate -> vacuous PASS (Great
        Expectations `mostly` semantics), not nine simultaneous false
        failures on an empty shard."""
        empty = spark.createDataFrame([], "c string, v double")
        suite = [
            Expectation("not_be_null", "c", mostly=1.0),
            Expectation("be_between", "v", {"min": 0, "max": 10},
                        mostly=0.99),
        ]
        r, _ = evaluate_suite(empty, suite)
        assert all(e["success"] for e in r)
        assert all(e["pass_rate"] == 1.0 for e in r)

    def test_kinds(self, spark):
        df = spark.createDataFrame(
            [(1, "abc", "x@y.com", 5.0, "ACTIVE")] * 9
            + [(1, "a", "nope", 99.0, "weird")],
            "id int, s string, email string, v double, status string",
        )
        suite = [
            Expectation("exist", "id"),
            Expectation("exist", "missing_col"),
            Expectation("of_type", "v", {"type": "double"}),
            Expectation("be_unique", "id"),
            Expectation("value_lengths_between", "s", {"min": 2, "max": 5},
                        mostly=0.9),
            Expectation("match_regex", "email",
                        {"regex": r"^[^@]+@[^@]+\.[a-z]+$"}, mostly=0.9),
            Expectation("be_between", "v", {"min": 0, "max": 10},
                        mostly=0.9),
            Expectation("be_in_set", "status",
                        {"values": ["active", "inactive"]}, mostly=0.9),
        ]
        by_name = {r["name"]: r for r in evaluate_suite(df, suite)[0]}
        assert by_name["exist:id"]["success"]
        assert not by_name["exist:missing_col"]["success"]
        assert by_name["of_type:v"]["success"]
        assert not by_name["be_unique:id"]["success"]
        assert by_name["value_lengths_between:s"]["success"]
        assert by_name["match_regex:email"]["success"]
        assert by_name["be_between:v"]["success"]
        assert by_name["be_in_set:status"]["success"]

    def test_clips_suite_passes_on_clean_output(
        self, spark, corpus, out_root
    ):
        from data_quality_check_pipeline_spark.pipeline import (
            CLEAN_TABLE,
            RunConfig,
            run_pipeline,
        )
        from data_quality_check_pipeline_spark.sources.tables import TableStore

        _, _, path = corpus
        run_pipeline(
            spark, path,
            RunConfig(out_root=out_root, run_id="exp",
                      source_fingerprint="e"),
        )
        clean = TableStore(spark, out_root).read(CLEAN_TABLE)
        results, _ = evaluate_suite(clean, clips_suite())
        failures = [r for r in results if not r["success"]]
        assert not failures, failures


class TestGELibraryAdapter:
    """evaluate_suite_via_ge contract (reference expectations.py:95-151
    parity): method-name + kwargs mapping onto the legacy PandasDataset
    API, result-shape normalization, missing-method degradation, and
    the import gate. great_expectations is absent in this sandbox, so
    the contract runs against an injected dataset_cls (the fake-airflow
    pattern); the gate test asserts the honest RuntimeError."""

    def _suite(self):
        from data_quality_check_pipeline_spark.operators.expectations import (
            Expectation,
        )

        return [
            Expectation("not_be_null", "a"),
            Expectation("be_between", "b", {"min": 1, "max": 9},
                        mostly=0.9),
            Expectation("be_in_set", "c", {"values": ["x", "y"]}),
            Expectation("match_regex", "a", {"regex": "^r"}),
            Expectation("of_type", "b", {"type": "bigint"}),
        ]

    def test_method_and_kwargs_contract(self, spark):
        from data_quality_check_pipeline_spark.operators.expectations import (
            evaluate_suite_via_ge,
        )

        calls = []

        class FakeDataset:
            def __init__(self, pdf):
                self.pdf = pdf

            def _rec(self, name, kw):
                calls.append((name, kw))
                return {"success": True,
                        "result": {"unexpected_percent": 5.0}}

            def expect_column_values_to_not_be_null(self, **kw):
                return self._rec("not_null", kw)

            def expect_column_values_to_be_between(self, **kw):
                return self._rec("between", kw)

            def expect_column_values_to_be_in_set(self, **kw):
                return self._rec("in_set", kw)

            def expect_column_values_to_match_regex(self, **kw):
                return self._rec("regex", kw)

            def expect_column_values_to_be_of_type(self, **kw):
                return self._rec("of_type", kw)

        df = spark.createDataFrame(
            [("r1", 5, "x")], "a string, b long, c string"
        )
        rows = evaluate_suite_via_ge(
            df, self._suite(), dataset_cls=FakeDataset
        )
        by = dict(calls)
        assert by["between"] == {
            "column": "b", "min_value": 1, "max_value": 9, "mostly": 0.9
        }
        assert by["in_set"] == {"column": "c", "value_set": ["x", "y"]}
        assert by["regex"] == {"column": "a", "regex": "^r"}
        assert by["of_type"] == {"column": "b", "type_": "bigint"}
        assert "mostly" not in by["not_null"]  # mostly=1.0 -> omitted
        # result normalization: unexpected_percent 5 -> pass_rate 0.95
        assert all(r["success"] for r in rows)
        assert rows[0]["pass_rate"] == pytest.approx(0.95)
        assert rows[0]["name"] == "not_be_null:a"

    def test_missing_method_marks_failure_not_raise(self, spark):
        from data_quality_check_pipeline_spark.operators.expectations import (
            Expectation,
            evaluate_suite_via_ge,
        )

        class Minimal:
            def __init__(self, pdf):
                pass

            def expect_column_values_to_not_be_null(self, **kw):
                return {"success": True, "result": {}}

        df = spark.createDataFrame([("r1",)], "a string")
        rows = evaluate_suite_via_ge(
            df,
            [Expectation("not_be_null", "a"),
             Expectation("be_unique", "a")],
            dataset_cls=Minimal,
        )
        assert rows[0]["success"] is True
        assert rows[1]["success"] is False and "error" in rows[1]
        # pass_rate without unexpected_percent falls back to success
        assert rows[0]["pass_rate"] == 1.0

    def test_import_gate_without_ge(self, spark):
        from data_quality_check_pipeline_spark.operators.expectations import (
            evaluate_suite_via_ge,
            ge_library_available,
        )

        if ge_library_available():  # pragma: no cover — not this sandbox
            pytest.skip("great_expectations installed")
        df = spark.createDataFrame([("r1",)], "a string")
        with pytest.raises(RuntimeError, match="great_expectations"):
            evaluate_suite_via_ge(df, self._suite())


class TestSketchProfiles:
    """Mergeable HLL sketch profiles: error bounds vs exact, merge ==
    whole (within sketch error), double-merge idempotence for
    distincts, null/empty handling, TableStore incremental run."""

    @pytest.fixture(scope="class")
    def frame(self, spark):
        rows = [
            (i, f"u{i % 700}", None if i % 10 == 0 else f"v{i}")
            for i in range(4000)
        ]
        return spark.createDataFrame(rows, "id long, user string, val string")

    def test_estimates_within_hll_error(self, spark, frame):
        from data_quality_check_pipeline_spark.operators.profile import (
            profile_estimates,
            sketch_profile,
        )

        est = {
            r["column"]: r
            for r in profile_estimates(
                sketch_profile(frame, ["id", "user", "val"]),
                ["id", "user", "val"],
            ).collect()
        }
        assert est["id"]["rows"] == 4000 and est["id"]["nulls"] == 0
        assert abs(est["id"]["approx_distinct"] - 4000) < 200  # ~5%
        assert abs(est["user"]["approx_distinct"] - 700) < 35
        assert est["val"]["nulls"] == 400
        assert abs(est["val"]["null_frac"] - 0.1) < 1e-9
        assert abs(est["val"]["approx_distinct"] - 3600) < 180

    def test_merge_matches_whole_and_is_idempotent(self, spark, frame):
        from data_quality_check_pipeline_spark.operators.profile import (
            merge_sketch_profiles,
            profile_estimates,
            sketch_profile,
        )

        cols = ["id", "user"]
        parts = [
            sketch_profile(frame.filter(F.col("id") % 3 == k), cols)
            for k in range(3)
        ]
        merged = merge_sketch_profiles(
            parts[0].unionByName(parts[1]).unionByName(parts[2]), cols
        )
        est = {
            r["column"]: r
            for r in profile_estimates(merged, cols).collect()
        }
        assert est["id"]["rows"] == 4000
        assert abs(est["id"]["approx_distinct"] - 4000) < 200
        # every batch saw (almost) all 700 users: union must NOT add
        # them up — distinct stays ~700, the property exact per-batch
        # counters cannot give without a history rescan
        assert abs(est["user"]["approx_distinct"] - 700) < 35

    def test_empty_and_allnull_batches(self, spark, frame):
        from data_quality_check_pipeline_spark.operators.profile import (
            merge_sketch_profiles,
            profile_estimates,
            sketch_profile,
        )

        empty = sketch_profile(frame.filter(F.lit(False)), ["val"])
        est0 = profile_estimates(empty, ["val"]).collect()[0]
        assert est0["rows"] == 0 and est0["approx_distinct"] == 0
        allnull = sketch_profile(
            frame.select(F.lit(None).cast("string").alias("val")), ["val"]
        )
        merged = merge_sketch_profiles(
            allnull.unionByName(sketch_profile(frame, ["val"])), ["val"]
        )
        est = profile_estimates(merged, ["val"]).collect()[0]
        assert est["nulls"] == 4000 + 400
        assert abs(est["approx_distinct"] - 3600) < 180

    def test_incremental_run_and_replay_skip(self, spark, frame, tmp_path):
        from data_quality_check_pipeline_spark.operators.profile import (
            corpus_profile,
            incremental_profile_run,
        )
        from data_quality_check_pipeline_spark.sources.tables import (
            TableStore,
        )

        store = TableStore(spark, str(tmp_path))
        b1 = frame.filter(F.col("id") < 2000)
        b2 = frame.filter(F.col("id") >= 2000)
        assert incremental_profile_run(
            store, "profile_history", b1, ["id", "user"],
            source_fingerprint="b1",
        )
        assert incremental_profile_run(
            store, "profile_history", b2, ["id", "user"],
            source_fingerprint="b2",
        )
        # exact replay of b2 must not double-count
        assert not incremental_profile_run(
            store, "profile_history", b2, ["id", "user"],
            source_fingerprint="b2",
        )
        est = {
            r["column"]: r
            for r in corpus_profile(
                store, "profile_history", ["id", "user"]
            ).collect()
        }
        assert est["id"]["rows"] == 4000
        assert abs(est["id"]["approx_distinct"] - 4000) < 200
        assert abs(est["user"]["approx_distinct"] - 700) < 35


class TestProfileDrift:
    """profile_drift over a sketch history: healthy batches are quiet;
    planted null jumps, duplicate re-ingests (novelty collapse) and
    batch-size swings each raise their own finding kind."""

    def _batch(self, spark, lo, hi, null_every=0, prefix="v"):
        rows = [
            (
                i,
                None
                if (null_every and i % null_every == 0)
                else f"{prefix}{i}",
            )
            for i in range(lo, hi)
        ]
        return spark.createDataFrame(rows, "id long, val string")

    def test_drift_kinds(self, spark, tmp_path):
        from data_quality_check_pipeline_spark.operators.profile import (
            alert_profile_drift,
            incremental_profile_run,
            profile_drift,
        )
        from data_quality_check_pipeline_spark.sources.tables import (
            TableStore,
        )

        store = TableStore(spark, str(tmp_path))
        cols = ["id", "val"]
        t = "profile_history"
        incremental_profile_run(
            store, t, self._batch(spark, 0, 1000), cols,
            source_fingerprint="b1",
        )
        # single batch: nothing to compare
        d0 = profile_drift(store, t, cols)
        assert d0 == {"batches": 1, "findings": []}
        incremental_profile_run(
            store, t, self._batch(spark, 1000, 2000), cols,
            source_fingerprint="b2",
        )
        healthy = profile_drift(
            store, t, cols, novelty_low=0.2, novelty_high=None
        )
        assert healthy["findings"] == []
        assert alert_profile_drift(healthy) == []
        # drifted batch: re-ingest of b1's values with 25% nulls
        incremental_profile_run(
            store, t,
            self._batch(spark, 0, 1000, null_every=4), cols,
            source_fingerprint="b3",
        )
        d = profile_drift(
            store, t, cols, null_jump=0.1, novelty_low=0.2
        )
        kinds = {(f["column"], f["kind"]) for f in d["findings"]}
        assert ("val", "null_frac_jump") in kinds
        assert ("val", "novelty_collapse") in kinds
        assert ("id", "novelty_collapse") in kinds
        # ids had no nulls anywhere: no null finding for id
        assert ("id", "null_frac_jump") not in kinds
        assert alert_profile_drift(d) is not None
        # size swing: a 100-row batch against ~1000-row history
        incremental_profile_run(
            store, t, self._batch(spark, 5000, 5100), cols,
            source_fingerprint="b4",
        )
        d2 = profile_drift(store, t, cols, rows_band=(0.5, 2.0))
        assert any(
            f["kind"] == "rows_out_of_band" for f in d2["findings"]
        )

    def test_mixed_column_history_refuses(self, spark, tmp_path):
        """A history written with DIFFERENT profile_cols must refuse to
        merge: NULL-filled counters from allowMissingColumns would
        silently understate null fractions."""
        from data_quality_check_pipeline_spark.operators.profile import (
            corpus_profile,
            incremental_profile_run,
            profile_drift,
        )
        from data_quality_check_pipeline_spark.sources.tables import (
            TableStore,
        )

        store = TableStore(spark, str(tmp_path))
        b = self._batch(spark, 0, 50)
        incremental_profile_run(store, "ph", b, ["id"],
                                source_fingerprint="x1")
        incremental_profile_run(store, "ph", b, ["id", "val"],
                                source_fingerprint="x2")
        with pytest.raises(ValueError, match="changed mid-history"):
            corpus_profile(store, "ph", ["id", "val"])
        with pytest.raises(ValueError, match="never profiled"):
            corpus_profile(store, "ph", ["id", "nope"])
        with pytest.raises(ValueError, match="changed mid-history"):
            profile_drift(store, "ph", ["id", "val"])
        # the common subset still answers
        est = corpus_profile(store, "ph", ["id"]).collect()
        assert est[0]["rows"] == 100


class TestNumericSketchProfiles:
    """Mergeable numeric distribution state: exact moments/histograms,
    merged-of-splits == whole to the bit, and PSI distribution-shift
    drift that null rates and distinct counts cannot see."""

    BINS = {"x": (0.0, 100.0, 10)}

    def _frame(self, spark, seed, shift=0.0, n=3000):
        import numpy as np

        rng = np.random.RandomState(seed)
        vals = rng.normal(50.0 + shift, 12.0, n)
        rows = [(i, float(v)) for i, v in enumerate(vals)]
        rows.append((n, None))  # a null rides along
        return spark.createDataFrame(rows, "id long, x double")

    def test_moments_and_hist_match_numpy(self, spark):
        import numpy as np

        from data_quality_check_pipeline_spark.operators.profile import (
            numeric_profile_estimates,
            sketch_profile,
        )

        df = self._frame(spark, 1)
        vals = np.array(
            [r["x"] for r in df.collect() if r["x"] is not None]
        )
        est = numeric_profile_estimates(
            sketch_profile(df, [], numeric_bins=self.BINS), self.BINS
        ).collect()[0]
        assert est["count"] == len(vals)
        assert abs(est["mean"] - vals.mean()) < 1e-6
        assert abs(est["std"] - vals.std(ddof=1)) < 1e-6
        assert est["min"] == vals.min() and est["max"] == vals.max()
        hist = est["hist"]
        assert len(hist) == 12 and sum(hist) == len(vals)
        # underflow/overflow buckets count exactly
        assert hist[0] == (vals < 0).sum()
        assert hist[11] == (vals >= 100).sum()
        edges = np.linspace(0, 100, 11)
        np_hist, _ = np.histogram(
            vals[(vals >= 0) & (vals < 100)], bins=edges
        )
        assert list(hist[1:11]) == list(np_hist)

    def test_merge_of_splits_is_exact(self, spark):
        from data_quality_check_pipeline_spark.operators.profile import (
            merge_sketch_profiles,
            sketch_profile,
        )
        from pyspark.sql import functions as F

        df = self._frame(spark, 2)
        whole = sketch_profile(
            df, [], numeric_bins=self.BINS
        ).collect()[0]
        parts = [
            sketch_profile(
                df.filter(F.col("id") % 3 == k), [],
                numeric_bins=self.BINS,
            )
            for k in range(3)
        ]
        merged = merge_sketch_profiles(
            parts[0].unionByName(parts[1]).unionByName(parts[2]),
            [], numeric_bins=self.BINS,
        ).collect()[0]
        assert merged["x__count"] == whole["x__count"]
        assert abs(merged["x__sum"] - whole["x__sum"]) < 1e-9
        assert merged["x__min"] == whole["x__min"]
        assert merged["x__max"] == whole["x__max"]
        assert list(merged["x__hist"]) == list(whole["x__hist"])

    def test_psi_drift_fires_on_shift_only(self, spark, tmp_path):
        from data_quality_check_pipeline_spark.operators.profile import (
            corpus_profile,
            incremental_profile_run,
            profile_drift,
        )
        from data_quality_check_pipeline_spark.sources.tables import (
            TableStore,
        )

        store = TableStore(spark, str(tmp_path))
        t = "ph_num"
        for k, seed in ((0, 10), (1, 11)):
            incremental_profile_run(
                store, t, self._frame(spark, seed), ["x"],
                source_fingerprint=f"b{k}", numeric_bins=self.BINS,
            )
        quiet = profile_drift(
            store, t, ["x"], numeric_bins=self.BINS
        )
        assert not any(
            f["kind"] == "distribution_psi" for f in quiet["findings"]
        )
        # +25 mean shift: a major PSI shift, invisible to null rates
        incremental_profile_run(
            store, t, self._frame(spark, 12, shift=25.0), ["x"],
            source_fingerprint="b2", numeric_bins=self.BINS,
        )
        d = profile_drift(store, t, ["x"], numeric_bins=self.BINS)
        kinds = {f["kind"] for f in d["findings"]}
        assert "distribution_psi" in kinds
        assert "null_frac_jump" not in kinds
        # the numeric corpus read-out answers from sketch rows alone
        est = corpus_profile(
            store, t, ["x"], numeric_bins=self.BINS
        ).collect()[0]
        assert est["count"] == 3 * 3000
        # changed bin spec: corpus_profile refuses outright; drift
        # DEGRADES — categorical monitoring keeps running and the
        # incompatibility surfaces as its own finding (an alert that
        # names the problem beats monitoring silently dying)
        import pytest as _pytest

        with _pytest.raises(ValueError, match="bin spec|numeric state"):
            corpus_profile(
                store, t, ["x"],
                numeric_bins={"x": (0.0, 100.0, 20)},
            )
        # changed nbins AND changed lo/hi at the SAME nbins both trip
        # the stamped-spec guard
        for bad_spec in ((0.0, 100.0, 20), (0.0, 200.0, 10)):
            d_bad = profile_drift(
                store, t, ["x"], numeric_bins={"x": bad_spec}
            )
            assert any(
                f["kind"] == "numeric_history_incompatible"
                for f in d_bad["findings"]
            ), bad_spec
            assert not any(
                f["kind"] == "distribution_psi"
                for f in d_bad["findings"]
            )

    def test_nan_counts_as_missing_not_poison(self, spark):
        """One NaN must not NaN-poison the additive sum/sumsq for the
        life of the history: it is counted as missing, like NULL."""
        import math

        from data_quality_check_pipeline_spark.operators.profile import (
            numeric_profile_estimates,
            sketch_profile,
        )

        df = spark.createDataFrame(
            [(0, 10.0), (1, float("nan")), (2, 30.0), (3, None)],
            "id long, x double",
        )
        est = numeric_profile_estimates(
            sketch_profile(df, [], numeric_bins=self.BINS), self.BINS
        ).collect()[0]
        assert est["count"] == 2
        assert abs(est["mean"] - 20.0) < 1e-9
        assert math.isfinite(est["std"])
        assert sum(est["hist"]) == 2

    def test_large_magnitude_moments_stay_accurate(self, spark):
        """Epoch-millis-scale columns (mean ~1.7e12, std ~1e3): naive
        sumsq cancels ~16 digits and reads std as 0/garbage. The
        lo-shifted moments must recover the true std."""
        import numpy as np

        from data_quality_check_pipeline_spark.operators.profile import (
            numeric_profile_estimates,
            sketch_profile,
        )

        base = 1.7e12
        bins = {"t": (base, base + 86_400_000.0, 24)}
        rng = np.random.RandomState(7)
        vals = base + 43_200_000.0 + rng.normal(0.0, 1e3, 4000)
        df = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(vals)],
            "id long, t double",
        )
        est = numeric_profile_estimates(
            sketch_profile(df, [], numeric_bins=bins), bins
        ).collect()[0]
        true_std = vals.std(ddof=1)
        assert abs(est["std"] - true_std) / true_std < 1e-6
        assert abs(est["mean"] - vals.mean()) < 1e-3

    def test_pre_spec_history_degrades_not_crashes(self, spark, tmp_path):
        """A history written before spec stamping existed (no __spec
        column at all) must degrade drift via its own finding — not die
        on an unresolved-column AnalysisException."""
        import pytest as _pytest

        from data_quality_check_pipeline_spark.operators.profile import (
            corpus_profile,
            profile_drift,
            sketch_profile,
        )
        from data_quality_check_pipeline_spark.sources.tables import (
            TableStore,
        )
        from pyspark.sql import functions as F

        store = TableStore(spark, str(tmp_path))
        t = "ph_prespec"
        for k, seed in ((0, 20), (1, 21)):
            row = sketch_profile(
                self._frame(spark, seed).withColumn(
                    "lang", F.lit("en")
                ),
                ["lang"], numeric_bins=self.BINS,
            ).drop("x__spec").withColumn("batch_idx", F.lit(k))
            store.write(t, row, mode="append")
        d = profile_drift(store, t, ["lang"], numeric_bins=self.BINS)
        kinds = {f["kind"] for f in d["findings"]}
        assert "numeric_history_incompatible" in kinds
        assert "distribution_psi" not in kinds
        with _pytest.raises(ValueError, match="numeric state"):
            corpus_profile(store, t, ["lang"], numeric_bins=self.BINS)


class TestQuantileEdgesFromHistory:
    """Curriculum edges derived from the mergeable histogram state —
    the calibrated-production source for curriculum_filter(edges=...)
    (streaming requires pinned edges; this derives them from history
    without rescanning data)."""

    SPEC = {"score": (0.0, 1000.0, 100)}

    @pytest.fixture(scope="class")
    def history(self, spark):
        from data_quality_check_pipeline_spark.operators.profile import (
            sketch_profile,
        )

        # deterministic, hash-scrambled uniform scores over [0, 1000)
        df = spark.range(4000).select(
            F.col("id"),
            (F.pmod(F.xxhash64("id"), F.lit(100000)).cast("double")
             / F.lit(100.0)).alias("score"),
        )
        batches = [
            sketch_profile(
                df.filter(F.col("id") % 4 == k), [],
                numeric_bins=self.SPEC,
            )
            for k in range(4)
        ]
        hist = batches[0]
        for b in batches[1:]:
            hist = hist.unionByName(b)
        return df, hist

    def test_edges_match_exact_quantiles_within_bin_width(
        self, spark, history
    ):
        from data_quality_check_pipeline_spark.operators.profile import (
            quantile_edges_from_history,
        )

        df, hist = history
        edges = quantile_edges_from_history(hist, "score", 4)
        exact = df.select(
            F.expr("percentile(score, array(0.25, 0.5, 0.75))")
        ).first()[0]
        assert len(edges) == 3
        width = 10.0  # (1000-0)/100
        for e, x in zip(edges, exact):
            assert abs(e - x) <= width, (edges, exact)
        assert edges == sorted(edges)

    def test_history_edges_equal_single_profile_edges(
        self, spark, history
    ):
        """Exact merge property: edges from the 4-batch history ==
        edges from one profile of the whole corpus."""
        from data_quality_check_pipeline_spark.operators.profile import (
            quantile_edges_from_history,
            sketch_profile,
        )

        df, hist = history
        whole = sketch_profile(df, [], numeric_bins=self.SPEC)
        assert quantile_edges_from_history(
            hist, "score", 5
        ) == quantile_edges_from_history(whole, "score", 5)

    def test_outliers_interpolate_against_true_min_max(self, spark):
        """Values outside [lo, hi) land in the under/overflow buckets;
        a quantile falling there interpolates between the spec edge and
        the recorded true extreme."""
        from data_quality_check_pipeline_spark.operators.profile import (
            quantile_edges_from_history,
            sketch_profile,
        )

        rows = [(float(v),) for v in list(range(10)) * 10 + [500.0] * 60]
        df = spark.createDataFrame(rows, "score double")
        hist = sketch_profile(
            df, [], numeric_bins={"score": (0.0, 10.0, 5)}
        )
        # 100 in-range values, 60 overflow: the 0.75 quantile sits in
        # the overflow bucket -> edge in (10, 500]
        (e,) = quantile_edges_from_history(
            hist, "score", 4, probs=[0.75]
        )
        assert 10.0 < e <= 500.0

    def test_edges_feed_curriculum_round_trip(self, spark, history):
        """Derived edges drive curriculum_filter(edges=...): dropping
        bin 0 removes exactly the clips at or below the first edge."""
        from data_quality_check_pipeline_spark.operators.profile import (
            quantile_edges_from_history,
        )
        from data_quality_check_pipeline_spark.operators.sampling import (
            curriculum_filter,
        )

        df, hist = history
        edges = quantile_edges_from_history(hist, "score", 2)
        kept = curriculum_filter(
            df.withColumn("clip_id", F.col("id").cast("string")),
            "score", [0.0, 1.0], "clip_id", edges=edges,
        )
        lo_kept = kept.filter(F.col("score") <= edges[0]).count()
        assert lo_kept == 0
        n = kept.count()
        assert abs(n - 2000) <= 200  # ~median cut at bin-width accuracy

    def test_contract_errors(self, spark, history):
        from data_quality_check_pipeline_spark.operators.profile import (
            quantile_edges_from_history,
            sketch_profile,
        )

        df, hist = history
        with pytest.raises(ValueError, match="no numeric state"):
            quantile_edges_from_history(hist, "other", 4)
        with pytest.raises(ValueError, match="strictly in"):
            quantile_edges_from_history(hist, "score", 4, probs=[0.0])
        with pytest.raises(ValueError, match="n_bins"):
            quantile_edges_from_history(hist, "score", 1)
        # mixed bin specs violate the history contract
        other = sketch_profile(
            df, [], numeric_bins={"score": (0.0, 500.0, 100)}
        )
        with pytest.raises(ValueError, match="distinct bin specs"):
            quantile_edges_from_history(
                hist.unionByName(other), "score", 4
            )
        # all-null history
        nulls = sketch_profile(
            df.withColumn("score", F.lit(None).cast("double")),
            [], numeric_bins=self.SPEC,
        )
        with pytest.raises(ValueError, match="no non-null"):
            quantile_edges_from_history(nulls, "score", 4)


class TestExactPercentiles:
    """exact_percentiles must be bit-identical to Spark's builtin
    percentile aggregate on both code paths (builtin fallback under
    100k rows, distributed rank-pick above)."""

    def _builtin(self, df, col, ps):
        row = df.filter(F.col(col).isNotNull()).agg(
            F.expr(
                f"percentile({col}, array({','.join(map(str, ps))}))"
            ).alias("q")
        ).collect()[0]
        return [float(x) for x in row["q"]]

    def test_rank_pick_matches_builtin_with_ties_and_nulls(self, spark):
        from data_quality_check_pipeline_spark.operators.stats import (
            exact_percentiles,
        )

        rng = np.random.RandomState(7)
        # 120k rows forces the rank-pick path; quantized values force
        # ties across partition boundaries; some nulls
        vals = np.round(rng.normal(100.0, 25.0, 120_000), 1).tolist()
        rows = [(float(v),) for v in vals] + [(None,)] * 500
        df = spark.createDataFrame(rows, "x double").repartition(16)
        ps = (0.25, 0.5, 0.75)
        got = exact_percentiles(df, "x", ps)
        ref = self._builtin(df, "x", ps)
        assert got == ref  # bit-exact, not approx

    def test_small_input_falls_back_to_builtin(self, spark):
        from data_quality_check_pipeline_spark.operators.stats import (
            exact_percentiles,
        )

        df = spark.createDataFrame(
            [(float(i),) for i in range(101)], "x double"
        )
        got = exact_percentiles(df, "x", (0.25, 0.5, 0.75))
        assert got == [25.0, 50.0, 75.0]
