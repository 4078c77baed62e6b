"""Trainable quality classifier (operators/qmodel.py).

Parity oracle: an independent pure-numpy IRLS re-derivation of the
same algorithm (standardize -> base-rate intercept -> floored-weight
Newton steps with ridge). The Spark fit accumulates every sufficient
statistic in DECIMAL(38,18), so on the test corpus the two agree to
~1e-9; determinism across partitionings is exact (bit-for-bit)."""

import json
import math
import random

import numpy as np
import pytest

from data_quality_check_pipeline_spark.operators.qmodel import (
    MAX_FEATURES,
    QualityModel,
    binary_auc,
    calibrate_threshold,
    fit_quality_model,
    score_expr,
    with_quality_score,
)

FEATS = ["snr", "silence", "symdens"]
TRUE_W = [1.6, -2.2, -0.9]
TRUE_B = 0.4
N = 900


def _corpus():
    """Deterministic labeled corpus: features on unlike scales, labels
    drawn from a planted logistic model (driver-side test data only —
    the no-rand() invariant governs PARTITION-level decisions, not
    fixture synthesis)."""
    rng = random.Random(42)
    rows = []
    for i in range(N):
        snr = rng.uniform(0.0, 60.0)        # dB-ish scale
        silence = rng.uniform(0.0, 1.0)     # fraction
        symdens = rng.uniform(0.0, 0.5)
        z = (
            TRUE_B
            + TRUE_W[0] * (snr - 30.0) / 15.0
            + TRUE_W[1] * (silence - 0.5) / 0.3
            + TRUE_W[2] * (symdens - 0.25) / 0.15
        )
        p = 1.0 / (1.0 + math.exp(-z))
        y = 1 if rng.random() < p else 0
        rows.append((f"c{i:05d}", snr, silence, symdens, y))
    return rows


def _df(spark, rows=None):
    return spark.createDataFrame(
        rows or _corpus(),
        ["clip_id", "snr", "silence", "symdens", "label"],
    )


def _numpy_irls(
    rows, max_iter=25, tol=1e-9, l2=1e-3, w_floor=1e-10
):
    X = np.array([[r[1], r[2], r[3]] for r in rows], dtype=float)
    y = np.array([float(r[4]) for r in rows])
    n = len(y)
    mean = X.mean(axis=0)
    var = (X * X).mean(axis=0) - mean * mean
    scale = np.sqrt(np.maximum(var, 0.0))
    scale[scale == 0.0] = 1.0
    Xs = np.hstack(
        [np.ones((n, 1)), (X - mean) / scale]
    )
    w = np.zeros(Xs.shape[1])
    base = y.mean()
    w[0] = math.log(base / (1.0 - base))
    # true L2 penalty on the MEAN-nll objective (pen = n*l2 on the
    # summed form), intercept unpenalized — mirrors fit_quality_model
    pen = np.full(Xs.shape[1], n * l2)
    pen[0] = 0.0
    for _ in range(max_iter):
        p = 1.0 / (1.0 + np.exp(-Xs @ w))
        wt = np.maximum(p * (1.0 - p), w_floor)
        H = Xs.T @ (Xs * wt[:, None])
        H[np.diag_indices_from(H)] += pen
        g = Xs.T @ (y - p) - pen * w
        delta = np.linalg.solve(H, g)
        w = w + delta
        if np.max(np.abs(delta)) < tol:
            break
    return w, mean, scale


class TestFit:
    def test_parity_with_numpy_irls(self, spark):
        rows = _corpus()
        m = fit_quality_model(_df(spark, rows), FEATS, "label")
        w_ref, mean_ref, scale_ref = _numpy_irls(rows)
        assert m.converged
        assert m.n_rows == N and m.n_dropped == 0
        np.testing.assert_allclose(m.means, mean_ref, atol=1e-9)
        np.testing.assert_allclose(m.scales, scale_ref, atol=1e-9)
        np.testing.assert_allclose(m.weights, w_ref, atol=1e-6)

    def test_bitwise_deterministic_across_partitionings(self, spark):
        df = _df(spark)
        m1 = fit_quality_model(df.repartition(1), FEATS, "label")
        m16 = fit_quality_model(df.repartition(16), FEATS, "label")
        assert m1.weights == m16.weights  # exact, not allclose:
        assert m1.means == m16.means      # decimal sums are
        assert m1.scales == m16.scales    # reduction-order-invariant

    def test_recovers_planted_signal_directions(self, spark):
        m = fit_quality_model(_df(spark), FEATS, "label")
        coefs = dict(zip(m.feature_cols, m.raw_coefs))
        assert coefs["snr"] > 0
        assert coefs["silence"] < 0
        assert coefs["symdens"] < 0
        auc = binary_auc(
            with_quality_score(_df(spark), m),
            "model_quality_score",
            "label",
        )
        assert auc > 0.85

    def test_null_rows_dropped_from_fit(self, spark):
        rows = _corpus()
        broken = [
            ("x1", None, 0.1, 0.1, 1),
            ("x2", 30.0, 0.2, 0.2, None),
        ]
        m = fit_quality_model(
            _df(spark, rows + broken), FEATS, "label"
        )
        clean = fit_quality_model(_df(spark, rows), FEATS, "label")
        assert m.n_rows == N and m.n_dropped == 2
        assert m.weights == clean.weights

    def test_hash_sample_fit_is_deterministic_subset(self, spark):
        df = _df(spark)
        m1 = fit_quality_model(
            df, FEATS, "label", sample_frac=0.5, sample_key="clip_id"
        )
        m2 = fit_quality_model(
            df.repartition(8), FEATS, "label",
            sample_frac=0.5, sample_key="clip_id",
        )
        assert 0.35 * N < m1.n_rows < 0.65 * N
        assert m1.weights == m2.weights

    def test_guards(self, spark):
        df = _df(spark)
        with pytest.raises(ValueError, match="MAX_FEATURES"):
            fit_quality_model(
                df, ["snr"] * (MAX_FEATURES + 1), "label"
            )
        with pytest.raises(ValueError, match="sample_key"):
            fit_quality_model(df, FEATS, "label", sample_frac=0.5)
        with pytest.raises(ValueError, match="outside"):
            fit_quality_model(df, FEATS, "snr")  # non-{0,1} labels
        with pytest.raises(ValueError, match="single-class"):
            fit_quality_model(
                df.where("label = 1"), FEATS, "label"
            )
        with pytest.raises(ValueError, match="no usable"):
            fit_quality_model(
                df.where("label = 2"), FEATS, "label"
            )

    def test_constant_feature_gets_zero_coefficient(self, spark):
        from pyspark.sql import functions as F

        df = _df(spark).withColumn("const", F.lit(7.5))
        m = fit_quality_model(df, FEATS + ["const"], "label")
        assert m.scales[3] == 1.0
        assert abs(m.weights[4]) < 1e-12


class TestScore:
    def test_score_plan_is_python_free(self, spark):
        m = fit_quality_model(_df(spark), FEATS, "label")
        scored = with_quality_score(_df(spark), m)
        plan = scored._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan  # native codegen only

    def test_null_signal_imputes_to_fit_mean(self, spark):
        m = fit_quality_model(_df(spark), FEATS, "label")
        probe = spark.createDataFrame(
            [
                ("p_null", None, 0.2, 0.1, 0),
                ("p_mean", m.means[0], 0.2, 0.1, 0),
            ],
            ["clip_id", "snr", "silence", "symdens", "label"],
        )
        got = {
            r["clip_id"]: r["model_quality_score"]
            for r in with_quality_score(probe, m).collect()
        }
        assert got["p_null"] == pytest.approx(
            got["p_mean"], abs=1e-12
        )

    def test_json_roundtrip_scores_identically(self, spark):
        m = fit_quality_model(_df(spark), FEATS, "label")
        m2 = QualityModel.from_json(m.to_json())
        assert m2 == m
        assert json.loads(m.to_json())["feature_cols"] == FEATS

    def test_calibrated_threshold_hits_keep_rate(self, spark):
        from pyspark.sql import functions as F

        m = fit_quality_model(_df(spark), FEATS, "label")
        cut = calibrate_threshold(_df(spark), m, keep_rate=0.7)
        kept = (
            with_quality_score(_df(spark), m)
            .where(F.col("model_quality_score") > cut)
            .count()
        )
        assert kept / N == pytest.approx(0.7, abs=0.03)


class TestDistill:
    def test_distill_from_rule_stack(self, spark, corpus):
        """End-to-end: label the synthetic corpus with the real rule
        stack, fit, and check the calibration contract. Grounded on
        measured values (damped Newton converges in ~13 iters at
        train AUC ~0.894; plain Newton oscillated to 0.30)."""
        from data_quality_check_pipeline_spark.operators.qmodel import (
            distill_quality_model,
        )

        _, _, path = corpus
        raw = spark.read.parquet(path)
        model, verdict = distill_quality_model(raw)
        assert verdict["converged"]
        assert verdict["train_auc"] > 0.85
        assert 0.0 < verdict["threshold_at_keep_rate"] < 1.0
        assert verdict["realized_keep_rate_at_threshold"] == (
            pytest.approx(verdict["observed_keep_rate"], abs=0.02)
        )
        # sampled fit: same labels, deterministic subset, still sane
        m2, v2 = distill_quality_model(raw, sample_frac=0.5)
        assert 0.3 < m2.n_rows / model.n_rows < 0.7
        assert v2["train_auc"] > 0.8


    def test_fit_auc_bucketed_matches_exact(self, spark, corpus):
        """The fit path reports AUC through buckets=10_000 (the
        continuous sigmoid score would otherwise feed the cumulative
        window one row per distinct score — ~the fit row count in ONE
        task at corpus scale). Pin that the bucketed report is within
        1e-3 of the exact AUC of the same scorer on the same labels."""
        from data_quality_check_pipeline_spark.operators.qmodel import (
            distill_quality_model,
        )
        from data_quality_check_pipeline_spark.operators.validate import (
            active_rules,
            with_flags,
        )
        from pyspark.sql import functions as F

        from data_quality_check_pipeline_spark.pipeline import score_clips

        _, _, path = corpus
        raw = spark.read.parquet(path)
        model, verdict = distill_quality_model(raw)
        labeled = with_flags(
            score_clips(raw), active_rules(True)
        ).withColumn("label", F.col("keep").cast("int"))
        exact = binary_auc(
            with_quality_score(labeled, model),
            "model_quality_score",
            "label",
        )
        assert verdict["train_auc"] == pytest.approx(exact, abs=1e-3)


class TestDeploy:
    def test_pipeline_stamps_model_score(self, spark, corpus, tmp_path):
        """Deployment half of the distilled classifier: a batch run
        with quality_model_json stamps model_quality_score on every
        landed clip, and the stored value equals a recomputation from
        the stored signal columns (the score is a pure row function)."""
        from pyspark.sql import functions as F

        from data_quality_check_pipeline_spark.operators.qmodel import (
            distill_quality_model,
            score_expr,
        )
        from data_quality_check_pipeline_spark.pipeline import (
            RunConfig,
            run_pipeline,
        )
        from data_quality_check_pipeline_spark.sources.tables import (
            TableStore,
        )

        _, _, path = corpus
        raw = spark.read.parquet(path)
        model, _ = distill_quality_model(raw, sample_frac=0.3)
        mj = tmp_path / "m.json"
        mj.write_text(json.dumps({"model": model.to_dict()}))
        out = str(tmp_path / "o")
        cfg = RunConfig(
            out_root=out, run_id="qd1", source_fingerprint="fp-qd",
            quality_model_json=str(mj), module_reports=False,
        )
        run_pipeline(spark, path, cfg)
        clean = TableStore(spark, out).read("clips_clean")
        assert "model_quality_score" in clean.columns
        worst = (
            clean.withColumn("re", score_expr(model))
            .select(
                F.max(
                    F.abs(F.col("model_quality_score") - F.col("re"))
                ).alias("d")
            )
            .collect()[0]["d"]
        )
        assert worst < 1e-12
        assert clean.filter(
            F.col("model_quality_score").isNull()
        ).count() == 0  # NULL signals impute, never propagate

    def test_stream_stamps_same_model_score(self, spark, tmp_path):
        """Stream path parity: the streaming sink stamps the SAME
        advisory model_quality_score (score_clips hook), reproducible
        from the stored signal columns — both ingestion paths agree."""
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql import functions as F

        from data_quality_check_pipeline_spark.operators.qmodel import (
            QualityModel,
            score_expr,
        )
        from data_quality_check_pipeline_spark.sources.tables import (
            TableStore,
        )
        from data_quality_check_pipeline_spark.streaming.stream import (
            start_quality_stream,
        )
        from data_quality_check_pipeline_spark.synth import (
            generate_clips,
        )

        df, _ = generate_clips(300)
        src = tmp_path / "src"
        os.makedirs(src)
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            str(src / "clips.parquet"),
        )
        # a tiny hand-built model (fit quality is not under test here)
        model = QualityModel(
            feature_cols=("snr_db", "silence_frac"),
            means=(30.0, 0.2), scales=(15.0, 0.3),
            weights=(0.4, 1.5, -2.0),
            n_rows=1, n_dropped=0, n_iter=1, converged=True,
        )
        mj = tmp_path / "m.json"
        mj.write_text(model.to_json())
        out = str(tmp_path / "out")
        q = start_quality_stream(
            spark, str(src), out, str(tmp_path / "ckpt"),
            available_now=True, quality_model_json=str(mj),
        )
        q.awaitTermination(timeout=600)
        clean = TableStore(spark, out).read("clips_clean")
        assert clean.count() > 0
        worst = (
            clean.withColumn("re", score_expr(model))
            .agg(
                F.max(
                    F.abs(F.col("model_quality_score") - F.col("re"))
                ).alias("d")
            )
            .collect()[0]["d"]
        )
        assert worst < 1e-12


class TestAuc:
    def test_hand_computed_with_ties(self, spark):
        # scores: pos at {0.9, 0.5}, neg at {0.5, 0.1}
        # pairs: (0.9 vs 0.5)=1, (0.9 vs 0.1)=1,
        #        (0.5 vs 0.5)=0.5, (0.5 vs 0.1)=1  -> 3.5/4
        df = spark.createDataFrame(
            [(0.9, 1), (0.5, 1), (0.5, 0), (0.1, 0)],
            ["s", "y"],
        )
        assert binary_auc(df, "s", "y") == pytest.approx(3.5 / 4)

    def test_perfect_and_antiperfect(self, spark):
        df = spark.createDataFrame(
            [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)], ["s", "y"]
        )
        assert binary_auc(df, "s", "y") == pytest.approx(1.0)
        assert binary_auc(
            df.selectExpr("1.0 - s as s", "y"), "s", "y"
        ) == pytest.approx(0.0)

    def test_single_class_nan(self, spark):
        df = spark.createDataFrame([(0.9, 1), (0.1, 1)], ["s", "y"])
        assert math.isnan(binary_auc(df, "s", "y"))

    def test_bucketed_close_to_exact(self, spark):
        m = fit_quality_model(_df(spark), FEATS, "label")
        scored = with_quality_score(_df(spark), m).cache()
        try:
            exact = binary_auc(scored, "model_quality_score", "label")
            approx = binary_auc(
                scored, "model_quality_score", "label", buckets=256
            )
        finally:
            scored.unpersist()
        assert approx == pytest.approx(exact, abs=0.01)

    def test_bucket_guard(self, spark):
        df = spark.createDataFrame([(0.9, 1), (0.1, 0)], ["s", "y"])
        with pytest.raises(ValueError, match="buckets"):
            binary_auc(df, "s", "y", buckets=1)
