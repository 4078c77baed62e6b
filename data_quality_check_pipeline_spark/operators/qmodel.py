"""Trainable linear quality classifier (distributed IRLS logistic
regression over the pipeline's quality signals).

The heuristic rule stack (validate.py) makes hard keep/drop calls from
fixed thresholds; production corpora also want a CALIBRATED quality
score — a model fitted to labels (human review decisions, a trusted
subset, or the rule stack's own keep labels for distillation) over the
numeric signals the pipeline already computes (snr_db, silence_frac,
speech_rate, length_ratio, symbol_density, perplexity, ...). The
reference engine has no analogue (single-table pandas, fixed rules);
this is round-brief "operations a large-scale training-data pipeline
would need" surface, like the dedup/sampling/selection families.

Why hand-rolled IRLS and not MLlib/sklearn:

* Each Newton/IRLS iteration is ONE distributed aggregate producing the
  sufficient statistics — the (d+1)x(d+1) upper triangle of X'WX plus
  the gradient X'(y-p), at most a few hundred scalar sums for the d<=32
  signal vectors this pipeline produces. Map-side partial aggregation
  means per-iteration cost is a single scan with a scalar-sized shuffle:
  the 100 TB shape. The driver solves the tiny dense system (numpy).
* The per-row terms are built from native Column expressions with the
  CURRENT weights inlined as literals — whole-stage codegen, no Python
  in the loop, no MLlib RDD fallback paths.
* Every sum is accumulated in DECIMAL(38,18) (the repo's
  order-invariance discipline, see lineitem_pricing_summary): the
  fitted weights are BIT-FOR-BIT identical across partitionings, task
  retries, and cluster sizes — `rand()`-free determinism extended to
  floating-point reduction order (test-pinned by refitting on
  repartition(1) vs repartition(16)).

At 10^12 rows one does not fit on the full corpus: ``sample_frac``
takes a deterministic ``hash_frac`` sample (own 'qmodel_fit_sample'
hash domain per DESIGN #23) for fitting, while SCORING stays a pure
projection over the full corpus — ``score_expr`` folds the
standardized-space weights back to raw feature space, so the deployed
score is one fused sigmoid(dot) expression with mean-imputation for
NULL signals (a missing signal contributes exactly nothing, i.e. the
standardized 0 the model was centered on).

Numerical shape: features are standardized from a first-pass
moment aggregate (lo-shifted is unnecessary here — sums are decimal,
cancellation-free), the intercept starts at the label base-rate logit,
and the IRLS weight p(1-p) is floored so a saturated row cannot zero a
whole Hessian block. Constant features get scale 1 and therefore
coefficient ~0 (their standardized value is 0 everywhere) instead of a
singular system; ``ridge`` keeps the solve positive-definite even on
separable toy corpora.
"""

from __future__ import annotations

import json
import logging
import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import hash_frac

_log = logging.getLogger("clip_quality.qmodel")

_SAMPLE_DOMAIN = "qmodel_fit_sample"
# (d+1)(d+2)/2 + (d+1) decimal aggregates per iteration; beyond ~32
# features the single-pass aggregate stops being the right shape
# (switch to gradient descent with feature-block passes) — refuse
# loudly instead of degrading into a 10k-column codegen blob.
MAX_FEATURES = 32
_DEC = "decimal(38,18)"
# IRLS weight floor: keeps saturated rows (p ~ 0 or 1) from zeroing
# Hessian blocks; standard practice, matches statsmodels' clipping.
_W_FLOOR = 1e-10


@dataclass(frozen=True)
class QualityModel:
    """Fitted logistic quality model.

    ``weights`` live in STANDARDIZED feature space (index 0 =
    intercept); ``means``/``scales`` are the standardization the fit
    used. ``raw_bias``/``raw_coefs`` fold the two together for scoring:
    score = sigmoid(raw_bias + sum_i raw_coefs[i] * x_i) with NULL x_i
    imputed to means[i].
    """

    feature_cols: tuple[str, ...]
    means: tuple[float, ...]
    scales: tuple[float, ...]
    weights: tuple[float, ...]
    n_rows: int
    n_dropped: int
    n_iter: int
    converged: bool

    @property
    def raw_coefs(self) -> tuple[float, ...]:
        return tuple(
            w / s for w, s in zip(self.weights[1:], self.scales)
        )

    @property
    def raw_bias(self) -> float:
        return self.weights[0] - sum(
            c * m for c, m in zip(self.raw_coefs, self.means)
        )

    def to_dict(self) -> dict:
        return {
            "feature_cols": list(self.feature_cols),
            "means": list(self.means),
            "scales": list(self.scales),
            "weights": list(self.weights),
            "n_rows": self.n_rows,
            "n_dropped": self.n_dropped,
            "n_iter": self.n_iter,
            "converged": self.converged,
        }

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), sort_keys=True)

    @classmethod
    def from_dict(cls, d: dict) -> "QualityModel":
        return cls(
            feature_cols=tuple(d["feature_cols"]),
            means=tuple(float(v) for v in d["means"]),
            scales=tuple(float(v) for v in d["scales"]),
            weights=tuple(float(v) for v in d["weights"]),
            n_rows=int(d["n_rows"]),
            n_dropped=int(d["n_dropped"]),
            n_iter=int(d["n_iter"]),
            converged=bool(d["converged"]),
        )

    @classmethod
    def from_json(cls, s: str) -> "QualityModel":
        return cls.from_dict(json.loads(s))


def _std_cols(
    feature_cols: tuple[str, ...],
    means: tuple[float, ...],
    scales: tuple[float, ...],
) -> list[Column]:
    return [
        (F.col(c).cast("double") - F.lit(m)) / F.lit(s)
        for c, m, s in zip(feature_cols, means, scales)
    ]


def fit_quality_model(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    *,
    max_iter: int = 25,
    tol: float = 1e-9,
    l2: float = 1e-3,
    sample_frac: float | None = None,
    sample_key: str | None = None,
    seed: int = 0,
) -> QualityModel:
    """Fit sigmoid(w.x) to a {0,1} ``label_col`` by L2-penalized IRLS
    (objective: mean negative log-likelihood + l2/2 * |w[1:]|^2, the
    intercept unpenalized).

    The penalty is not cosmetic: real rule-derived labels are often
    QUASI-SEPARABLE (a hard defect like n_samples=0 predicts drop
    perfectly), where unpenalized ML weights diverge and IRLS never
    converges — the default l2=1e-3 on standardized features bounds
    them with negligible shrinkage on the informative range.

    Rows with a NULL label or any NULL feature are excluded from the
    fit (counted in ``n_dropped``); a label value outside {0,1} raises.
    ``sample_frac`` (with ``sample_key``, e.g. clip_id) fits on a
    deterministic hash sample — the 10^12-row path. Raises on a
    degenerate fit corpus (no rows, or single-class labels).
    """
    import numpy as np

    feats = tuple(feature_cols)
    if not feats:
        raise ValueError("fit_quality_model: empty feature_cols")
    if len(feats) > MAX_FEATURES:
        raise ValueError(
            f"fit_quality_model: {len(feats)} features > MAX_FEATURES="
            f"{MAX_FEATURES}; the one-pass sufficient-statistics "
            "aggregate is the wrong shape past that — reduce the "
            "signal vector or use block passes"
        )
    if sample_frac is not None:
        if sample_key is None:
            raise ValueError(
                "fit_quality_model: sample_frac needs sample_key "
                "(deterministic hash sampling has no row identity "
                "otherwise)"
            )
        if not (0.0 < sample_frac <= 1.0):
            raise ValueError("fit_quality_model: sample_frac not in (0,1]")
        df = df.where(
            hash_frac(sample_key, seed, _SAMPLE_DOMAIN) < F.lit(sample_frac)
        )

    y = F.col(label_col).cast("double")
    valid = y.isNotNull()
    for c in feats:
        valid = valid & F.col(c).cast("double").isNotNull()

    # Pass 1: moments + label sanity, one aggregate. Decimal sums keep
    # means/scales order-invariant too — the standardization is part of
    # the deterministic contract.
    aggs = [
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(valid, 1)).alias("n_valid"),
        F.count(
            F.when(valid & ~y.isin(0.0, 1.0), 1)
        ).alias("n_badlabel"),
        F.sum(F.when(valid, y).cast(_DEC)).alias("sum_y"),
    ]
    for i, c in enumerate(feats):
        x = F.col(c).cast("double")
        aggs.append(F.sum(F.when(valid, x).cast(_DEC)).alias(f"s{i}"))
        aggs.append(
            F.sum(F.when(valid, x * x).cast(_DEC)).alias(f"q{i}")
        )
    row = df.agg(*aggs).collect()[0]
    n = int(row["n_valid"])
    n_dropped = int(row["n_total"]) - n
    if int(row["n_badlabel"]) > 0:
        raise ValueError(
            f"fit_quality_model: {row['n_badlabel']} rows have "
            f"{label_col} outside {{0,1}}"
        )
    if n == 0:
        raise ValueError("fit_quality_model: no usable fit rows")
    n_pos = float(row["sum_y"])
    if n_pos == 0.0 or n_pos == float(n):
        raise ValueError(
            "fit_quality_model: single-class labels — nothing to fit"
        )

    means, scales = [], []
    for i in range(len(feats)):
        m = float(row[f"s{i}"]) / n
        var = max(float(row[f"q{i}"]) / n - m * m, 0.0)
        s = math.sqrt(var)
        means.append(m)
        # constant feature: scale 1 -> standardized value is 0 on every
        # row -> coefficient stays ~0; no singular system.
        scales.append(s if s > 0.0 else 1.0)

    d1 = len(feats) + 1
    w = np.zeros(d1)
    base = n_pos / n
    w[0] = math.log(base / (1.0 - base))

    fit_df = df.where(valid)
    # true L2 penalty (scaled by n: the objective is the MEAN nll +
    # l2/2|w|^2 -> summed form n*l2), intercept excluded
    pen = np.full(d1, n * l2)
    pen[0] = 0.0

    def _stats_at(wv: "np.ndarray"):
        """One distributed pass: Hessian upper triangle, gradient, AND
        the summed nll at ``wv`` — so the damped-Newton line search
        below never needs an extra objective-only scan."""
        xs = _std_cols(feats, tuple(means), tuple(scales))
        eta = F.lit(float(wv[0]))
        for i, x in enumerate(xs):
            eta = eta + F.lit(float(wv[i + 1])) * x
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
        irls_w = F.greatest(p * (F.lit(1.0) - p), F.lit(_W_FLOOR))
        resid = y - p
        # stable log(1+exp(eta)) - y*eta
        nll = (
            F.greatest(eta, F.lit(0.0))
            - y * eta
            + F.log1p(F.exp(-F.abs(eta)))
        )

        xvec = [F.lit(1.0)] + xs
        it_aggs = [F.sum(nll.cast(_DEC)).alias("nll")]
        for i in range(d1):
            for j in range(i, d1):
                it_aggs.append(
                    F.sum((xvec[i] * xvec[j] * irls_w).cast(_DEC))
                    .alias(f"h_{i}_{j}")
                )
        for i in range(d1):
            it_aggs.append(
                F.sum((xvec[i] * resid).cast(_DEC)).alias(f"g_{i}")
            )
        stats = fit_df.agg(*it_aggs).collect()[0]
        H = np.zeros((d1, d1))
        g = np.zeros(d1)
        for i in range(d1):
            g[i] = float(stats[f"g_{i}"])
            for j in range(i, d1):
                H[i, j] = H[j, i] = float(stats[f"h_{i}_{j}"])
        obj = float(stats["nll"]) + 0.5 * float(pen @ (wv * wv))
        return H, g, obj

    # Damped Newton (IRLS + step-halving on the penalized objective).
    # Plain Newton OSCILLATES on quasi-separable rule-derived labels
    # (measured: train AUC 0.87 @ 25 iters -> 0.30 @ 40 — the step
    # overshoots and flips signs); backtracking restores the monotone
    # descent the convexity guarantees. Each trial step costs one scan,
    # same as a plain iteration.
    w_accept: "np.ndarray | None" = None
    obj_accept = float("inf")
    delta: "np.ndarray | None" = None
    step = 1.0
    halvings = 0
    n_iter = 0
    converged = False
    for n_iter in range(1, max_iter + 1):
        H, g, obj = _stats_at(w)
        if w_accept is not None and obj > obj_accept + 1e-9 * max(
            1.0, abs(obj_accept)
        ):
            # trial step increased the objective: backtrack
            halvings += 1
            if halvings > 30:
                # no improving step along the Newton direction at
                # float resolution — stationary, call it converged
                w = w_accept
                converged = True
                break
            step *= 0.5
            w = w_accept + step * delta
            continue
        # w accepted (first point, or objective went down)
        if (
            w_accept is not None
            and float(np.max(np.abs(w - w_accept))) < tol
        ):
            converged = True
            break
        w_accept, obj_accept = w, obj
        g = g - pen * w
        H[np.diag_indices_from(H)] += pen
        delta = np.linalg.solve(H, g)
        step, halvings = 1.0, 0
        w = w_accept + delta
    else:
        # exhausted max_iter; the pending trial w was never evaluated —
        # return the last accepted (objective-verified) point
        if w_accept is not None:
            w = w_accept

    if not converged:
        _log.warning(
            "fit_quality_model: damped IRLS hit max_iter=%d (last "
            "accepted step above tol=%g) — best accepted weights "
            "returned; raise max_iter for a tighter fit",
            max_iter, tol,
        )
    return QualityModel(
        feature_cols=feats,
        means=tuple(means),
        scales=tuple(scales),
        weights=tuple(float(v) for v in w),
        n_rows=n,
        n_dropped=n_dropped,
        n_iter=n_iter,
        converged=converged,
    )


def score_expr(model: QualityModel) -> Column:
    """sigmoid(raw_bias + sum raw_coefs[i] * coalesce(x_i, mean_i)) as
    one native Column expression — whole-stage codegen, no Python.
    NULL signals impute to the fit mean (= standardized 0: a missing
    signal contributes nothing)."""
    eta = F.lit(float(model.raw_bias))
    for c, coef, m in zip(
        model.feature_cols, model.raw_coefs, model.means
    ):
        x = F.coalesce(F.col(c).cast("double"), F.lit(float(m)))
        eta = eta + F.lit(float(coef)) * x
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))


def with_quality_score(
    df: DataFrame,
    model: QualityModel,
    out_col: str = "model_quality_score",
) -> DataFrame:
    return df.withColumn(out_col, score_expr(model))


def calibrate_threshold(
    df: DataFrame,
    model: QualityModel,
    keep_rate: float,
    *,
    accuracy: int = 10_000,
) -> float:
    """Score cutoff that keeps ~``keep_rate`` of ``df`` (rows with
    score STRICTLY > cutoff — the pairing percentile semantics imply;
    with ``>=`` a cutoff landing on a saturated score mass, e.g. the
    0.0 that hard-defect rows underflow to, silently keeps the whole
    mass). One percentile_approx pass — the 100-TB shape (an exact
    global sort for a threshold would be a full shuffle)."""
    if not (0.0 < keep_rate < 1.0):
        raise ValueError("calibrate_threshold: keep_rate not in (0,1)")
    row = df.select(
        F.percentile_approx(
            score_expr(model), F.lit(1.0 - keep_rate), F.lit(accuracy)
        ).alias("cut")
    ).collect()[0]
    if row["cut"] is None:
        raise ValueError("calibrate_threshold: empty frame")
    return float(row["cut"])


DEFAULT_DISTILL_FEATURES = (
    "snr_db",
    "clip_frac",
    "silence_frac",
    "dyn_range_db",
    "rms",
    "speech_rate",
    "ppl",
    "lang_conf",
    "dur_ms",
)


def distill_quality_model(
    raw_clips: DataFrame,
    feature_cols: list[str] | None = None,
    *,
    sample_frac: float | None = None,
    id_col: str = "clip_id",
) -> tuple[QualityModel, dict]:
    """Distill the rule stack's SIGNAL-based keep/drop into a
    calibrated linear scorer over the raw clips table.

    Runs the pipeline's own scoring path (score_clips -> with_flags,
    the exact batch/stream rule set) to label every clip, then fits the
    logistic model on the numeric quality signals. The duplicate flag
    is deliberately NOT part of the label: it is identity-based
    evidence (same clip_id seen twice) that a signal model cannot and
    must not learn — including it would teach the model that the
    signals of whichever clips happened to be re-uploaded are "bad".

    Returns ``(model, verdict)`` where verdict carries train AUC, the
    observed keep rate, and a score threshold calibrated so that
    thresholding reproduces that keep rate (the deployment contract:
    the distilled scorer ranks; the calibrated cut makes it a drop-in
    gate with the same acceptance volume).
    """
    from ..pipeline import score_clips
    from .validate import active_rules, with_flags

    feats = list(feature_cols or DEFAULT_DISTILL_FEATURES)
    labeled = (
        with_flags(score_clips(raw_clips), active_rules(True))
        .withColumn("label", F.col("keep").cast("int"))
        .select(id_col, "label", *feats)
        # referenced by the fit passes AND auc/threshold/keep-rate:
        # without the persist every aggregate would re-run the three
        # scorer UDFs over the full corpus
        .persist()
    )
    try:
        model = fit_quality_model(
            labeled,
            feats,
            "label",
            sample_frac=sample_frac,
            sample_key=id_col if sample_frac is not None else None,
        )
        scored = with_quality_score(labeled, model)
        # bucketed by default: the sigmoid score is continuous, so
        # exact mode's per-DISTINCT-score window input approaches the
        # fit row count in ONE task at corpus scale. 10k buckets bound
        # that task at 10k rows; AUC shift vs exact is < 1e-3 on the
        # committed fixture (test_fit_auc_bucketed_matches_exact).
        auc = binary_auc(
            scored, "model_quality_score", "label", buckets=10_000
        )
        keep_rate = float(
            labeled.agg(
                F.avg(F.col("label").cast("double"))
            ).collect()[0][0]
        )
        threshold = realized = None
        if 0.0 < keep_rate < 1.0:
            threshold = calibrate_threshold(labeled, model, keep_rate)
            # report what the cut actually keeps (strict >): a big
            # saturated score mass at the cut makes realized != target,
            # and the caller should see that, not discover it in prod
            realized = float(
                scored.agg(
                    F.avg(
                        (
                            F.col("model_quality_score")
                            > F.lit(threshold)
                        ).cast("double")
                    )
                ).collect()[0][0]
            )
        verdict = {
            "features": feats,
            "n_fit_rows": model.n_rows,
            "n_dropped_null_signal_rows": model.n_dropped,
            "converged": model.converged,
            "n_iter": model.n_iter,
            "train_auc": auc,
            "observed_keep_rate": keep_rate,
            "threshold_at_keep_rate": threshold,
            "realized_keep_rate_at_threshold": realized,
            "sample_frac": sample_frac,
        }
        return model, verdict
    finally:
        labeled.unpersist()


def binary_auc(
    df: DataFrame,
    score_col: str | Column,
    label_col: str,
    *,
    buckets: int | None = None,
) -> float:
    """ROC-AUC via the Mann-Whitney tie-aware formulation, shaped for
    scale: rows first collapse to per-DISTINCT-score (pos, neg) counts
    in one map-side-combined groupBy, then the cumulative-negatives
    window runs over that aggregate only. Exact AUC needs a global
    order by definition — the single-task window here sees one 3-long
    row per distinct score, not per input row. For a continuous score
    at 10^12 rows pass ``buckets`` to quantize scores onto a fixed
    grid first (min/max from one pre-pass): the window input becomes
    <= buckets rows and the result is the exact AUC of the quantized
    score (monotone-invariance bounds the error by the per-bucket
    mass). NULL score/label rows are excluded; single-class input
    returns NaN (undefined)."""
    from pyspark.sql import Window

    s = (
        F.col(score_col).cast("double")
        if isinstance(score_col, str)
        else score_col.cast("double")
    )
    y = F.col(label_col).cast("double")
    base = df.select(s.alias("s"), y.alias("y")).where(
        F.col("s").isNotNull()
        & ~F.isnan("s")
        & F.col("y").isNotNull()
    )
    if buckets is not None:
        if buckets < 2:
            raise ValueError("binary_auc: buckets must be >= 2")
        lohi = base.agg(
            F.min("s").alias("lo"), F.max("s").alias("hi")
        ).collect()[0]
        if lohi["lo"] is None:
            return float("nan")
        lo, hi = float(lohi["lo"]), float(lohi["hi"])
        if hi > lo:
            base = base.withColumn(
                "s",
                F.least(
                    F.floor(
                        (F.col("s") - F.lit(lo))
                        / F.lit((hi - lo) / buckets)
                    ),
                    F.lit(buckets - 1),
                ).cast("double"),
            )
    grouped = base.groupBy("s").agg(
        F.count(F.when(F.col("y") == 1.0, 1)).alias("pos"),
        F.count(F.when(F.col("y") == 0.0, 1)).alias("neg"),
    )
    wcum = (
        Window.orderBy(F.col("s").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = (
        F.col("pos") * F.coalesce(F.sum("neg").over(wcum), F.lit(0))
        + F.col("pos") * F.col("neg") / F.lit(2.0)
    )
    row = (
        grouped.withColumn("contrib", contrib)
        .agg(
            F.sum(F.col("contrib").cast(_DEC)).alias("u"),
            F.sum("pos").alias("n_pos"),
            F.sum("neg").alias("n_neg"),
        )
        .collect()[0]
    )
    n_pos, n_neg = int(row["n_pos"] or 0), int(row["n_neg"] or 0)
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    return float(row["u"]) / (n_pos * n_neg)
