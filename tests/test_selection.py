"""DSIR-style importance resampling — pure-Python oracle parity and
semantic (domain-enrichment) checks."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from data_quality_check_pipeline_spark.operators.selection import (
    importance_resample,
    importance_weights,
    ngram_log_ratio,
)
from data_quality_check_pipeline_spark.oracle_hash import spark_xxhash64
from data_quality_check_pipeline_spark.operators.sampling import (
    _BUCKETS,
    with_split,
)

_WS = re.compile(r"\s+", re.ASCII)  # Java \s is ASCII (repo gotcha)

KS = (1, 2)
N_FEATURES = 512  # small so target/corpus histograms genuinely collide
LAM = 1.0


# ---------------------------------------------------------------------------
# pure-Python re-derivation (independent of the Spark exprs)
# ---------------------------------------------------------------------------

def _py_feats(text, ks=KS, n_features=N_FEATURES):
    if text is None:
        return []
    toks = _WS.sub(" ", text.lower().strip()).split(" ")
    feats = []
    for k in ks:
        if len(toks) >= k:
            grams = [toks[i:i + k] for i in range(len(toks) - k + 1)]
        else:
            grams = [toks]
        for g in grams:
            feats.append(spark_xxhash64(list(g), "dsir_feat") % n_features)
    return feats


def _py_log_ratio(corpus_texts, target_texts, n_features=N_FEATURES):
    tc, cc = Counter(), Counter()
    for t in target_texts:
        tc.update(_py_feats(t, n_features=n_features))
    for t in corpus_texts:
        cc.update(_py_feats(t, n_features=n_features))
    dt = sum(tc.values()) + LAM * n_features
    dc = sum(cc.values()) + LAM * n_features
    return {
        f: math.log((tc.get(f, 0) + LAM) / dt)
        - math.log((cc.get(f, 0) + LAM) / dc)
        for f in set(tc) | set(cc)
    }


def _py_weights(corpus, target_texts, n_features=N_FEATURES):
    lr = _py_log_ratio([t for _, t in corpus], target_texts, n_features)
    out = {}
    for doc_id, text in corpus:
        feats = _py_feats(text, n_features=n_features)
        if feats:
            out[doc_id] = sum(lr[f] for f in feats)
    return out


def _py_gumbel_key(doc_id, logw, seed=0, temperature=1.0):
    h = spark_xxhash64(doc_id, "dsir_gumbel", seed)
    u = ((h % _BUCKETS) + 0.5) / _BUCKETS
    return logw / temperature - math.log(-math.log(u))


def _mkdf(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


@pytest.fixture(scope="module")
def corpora():
    """Two-vocab corpus: 'sci' docs vs 'chat' docs, target is pure sci."""
    import random

    rng = random.Random(7)
    sci = ("quantum electron proton neutrino boson lattice spectral "
           "operator tensor manifold").split()
    chat = ("lol omg haha yeah nope cool stuff thing whatever maybe "
            "dunno kinda").split()
    corpus = []
    for i in range(120):
        pool = sci if i % 2 == 0 else chat
        corpus.append(
            (f"d{i:03d}", " ".join(rng.choice(pool) for _ in range(12)))
        )
    corpus.append(("dnull", None))
    target = [" ".join(rng.choice(sci) for _ in range(12)) for _ in range(20)]
    return corpus, target


class TestImportanceWeights:
    def test_log_ratio_matches_python_oracle(self, spark, corpora):
        corpus, target = corpora
        lr = {
            r["feat"]: r["log_ratio"]
            for r in ngram_log_ratio(
                _mkdf(spark, corpus),
                _mkdf(spark, [(f"t{i}", t) for i, t in enumerate(target)]),
                "text", ks=KS, n_features=N_FEATURES, smoothing=LAM,
            ).collect()
        }
        py = _py_log_ratio([t for _, t in corpus], target)
        assert set(lr) == set(py)
        for f, v in py.items():
            assert lr[f] == pytest.approx(v, rel=1e-12), f

    def test_weights_match_python_oracle(self, spark, corpora):
        corpus, target = corpora
        got = {
            r["doc_id"]: r["logw"]
            for r in importance_weights(
                _mkdf(spark, corpus),
                _mkdf(spark, [(f"t{i}", t) for i, t in enumerate(target)]),
                "doc_id", "text", ks=KS, n_features=N_FEATURES,
                smoothing=LAM,
            ).collect()
        }
        py = _py_weights(corpus, target)
        assert set(got) == set(py)  # null-text doc absent from both
        assert "dnull" not in got
        for d, v in py.items():
            assert got[d] == pytest.approx(v, rel=1e-9), d

    def test_target_domain_scores_higher(self, spark, corpora):
        corpus, target = corpora
        py = _py_weights(corpus, target)
        sci = [v for d, v in py.items() if int(d[1:]) % 2 == 0]
        chat = [v for d, v in py.items() if int(d[1:]) % 2 == 1]
        assert min(sci) > max(chat)


class TestImportanceResample:
    def test_topk_matches_python_gumbel_oracle(self, spark, corpora):
        corpus, target = corpora
        n_keep = 30
        sel = importance_resample(
            _mkdf(spark, corpus).repartition(7),
            _mkdf(spark, [(f"t{i}", t) for i, t in enumerate(target)]),
            "doc_id", "text", n_keep, ks=KS, n_features=N_FEATURES,
            smoothing=LAM, seed=3,
        )
        got = sorted(r["doc_id"] for r in sel.collect())
        py = _py_weights(corpus, target)
        keyed = sorted(
            ((-_py_gumbel_key(d, w, seed=3), d) for d, w in py.items())
        )
        expect = sorted(d for _, d in keyed[:n_keep])
        assert got == expect

    def test_selection_enriches_target_domain(self, spark, corpora):
        corpus, target = corpora
        sel = importance_resample(
            _mkdf(spark, corpus),
            _mkdf(spark, [(f"t{i}", t) for i, t in enumerate(target)]),
            "doc_id", "text", 40, ks=KS, n_features=N_FEATURES,
        )
        ids = [r["doc_id"] for r in sel.collect()]
        sci_share = sum(1 for d in ids if int(d[1:]) % 2 == 0) / len(ids)
        assert sci_share > 0.9  # corpus is 50/50; target is pure sci

    def test_high_temperature_flattens_selection(self, spark, corpora):
        """temperature >> 1 washes out the weights: selection approaches
        a uniform Gumbel draw, so the off-domain share rises."""
        corpus, target = corpora
        py = _py_weights(corpus, target)
        hot = [
            d for d in sorted(
                py, key=lambda d: -_py_gumbel_key(d, py[d], temperature=1e6)
            )[:40]
        ]
        chat_share = sum(1 for d in hot if int(d[1:]) % 2 == 1) / len(hot)
        assert chat_share > 0.25
        sel = importance_resample(
            _mkdf(spark, corpus),
            _mkdf(spark, [(f"t{i}", t) for i, t in enumerate(target)]),
            "doc_id", "text", 40, ks=KS, n_features=N_FEATURES,
            temperature=1e6,
        )
        assert sorted(r["doc_id"] for r in sel.collect()) == sorted(hot)

    def test_threshold_mode_approximates_topk(self, spark, corpora):
        corpus, target = corpora
        stats = {}
        sel = importance_resample(
            _mkdf(spark, corpus),
            _mkdf(spark, [(f"t{i}", t) for i, t in enumerate(target)]),
            "doc_id", "text", 30, ks=KS, n_features=N_FEATURES,
            mode="threshold", stats_out=stats,
        )
        got = {r["doc_id"] for r in sel.collect()}
        py = _py_weights(corpus, target)
        expect = {
            d for d in sorted(
                py, key=lambda d: -_py_gumbel_key(d, py[d])
            )[:30]
        }
        # percentile_approx cutoff: same decision rule, approximate count
        assert len(got & expect) >= 27
        assert abs(len(got) - 30) <= 3
        assert stats["scored_docs"] == 120

    def test_partition_invariance_and_determinism(self, spark, corpora):
        corpus, target = corpora
        tgt = _mkdf(spark, [(f"t{i}", t) for i, t in enumerate(target)])
        a = importance_resample(
            _mkdf(spark, corpus).repartition(13), tgt, "doc_id", "text",
            25, ks=KS, n_features=N_FEATURES, seed=11,
        )
        b = importance_resample(
            _mkdf(spark, corpus).coalesce(1), tgt, "doc_id", "text",
            25, ks=KS, n_features=N_FEATURES, seed=11,
        )
        assert sorted(r["doc_id"] for r in a.collect()) == sorted(
            r["doc_id"] for r in b.collect()
        )

    def test_precomputed_log_ratio_is_reusable(self, spark, corpora):
        """The calibrated-production shape: derive the model once, apply
        per shard — equal to scoring the whole corpus in one go."""
        corpus, target = corpora
        tgt = _mkdf(spark, [(f"t{i}", t) for i, t in enumerate(target)])
        full = _mkdf(spark, corpus)
        lr = ngram_log_ratio(
            full, tgt, "text", ks=KS, n_features=N_FEATURES,
        ).cache()
        whole = {
            r["doc_id"]: r["logw"]
            for r in importance_weights(
                full, tgt, "doc_id", "text", log_ratio=lr
            ).collect()
        }
        merged = {}
        for shard in (corpus[:40], corpus[40:]):
            merged.update(
                (r["doc_id"], r["logw"])
                for r in importance_weights(
                    _mkdf(spark, shard), tgt, "doc_id", "text",
                    log_ratio=lr,
                ).collect()
            )
        assert merged == whole
        lr.unpersist()

    def test_same_seed_independent_of_split_domain(self, spark, corpora):
        """DESIGN #23 pin: the Gumbel draw and with_split at the SAME
        seed must be independent — selected docs spread over all split
        bands instead of collapsing into 'train'."""
        corpus, target = corpora
        sel = importance_resample(
            _mkdf(spark, corpus),
            _mkdf(spark, [(f"t{i}", t) for i, t in enumerate(target)]),
            "doc_id", "text", 60, ks=KS, n_features=N_FEATURES,
            temperature=1e9,  # ~uniform: isolates the hash interaction
            seed=0,
        )
        split = with_split(
            sel, "doc_id",
            {"train": 0.5, "val": 0.25, "test": 0.25}, seed=0,
        )
        from pyspark.sql import functions as F

        bands = {
            r["split"]: r["n"]
            for r in split.groupBy("split")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert set(bands) == {"train", "val", "test"}

    def test_keep_frac_is_count_free_budget(self, spark, corpora):
        corpus, target = corpora
        stats = {}
        sel = importance_resample(
            _mkdf(spark, corpus),
            _mkdf(spark, [(f"t{i}", t) for i, t in enumerate(target)]),
            "doc_id", "text", ks=KS, n_features=N_FEATURES,
            mode="threshold", keep_frac=0.25, stats_out=stats,
        )
        n = sel.count()
        assert abs(n - 30) <= 3  # 25% of the 120 scored docs, approx
        assert "scored_docs" not in stats  # no count pass ran
        # fraction budget == the equivalent absolute budget's decisions
        sel_n = importance_resample(
            _mkdf(spark, corpus),
            _mkdf(spark, [(f"t{i}", t) for i, t in enumerate(target)]),
            "doc_id", "text", n_keep=30, ks=KS, n_features=N_FEATURES,
            mode="threshold",
        )
        assert {r["doc_id"] for r in sel.collect()} == {
            r["doc_id"] for r in sel_n.collect()
        }
        with pytest.raises(ValueError, match="keep_frac"):
            importance_resample(
                _mkdf(spark, corpus),
                _mkdf(spark, [("t0", target[0])]),
                "doc_id", "text", keep_frac=0.5, mode="top_k",
            )
        with pytest.raises(ValueError, match="exactly one"):
            importance_resample(
                _mkdf(spark, corpus),
                _mkdf(spark, [("t0", target[0])]),
                "doc_id", "text", n_keep=5, keep_frac=0.5,
            )
        with pytest.raises(ValueError, match="exactly one"):
            importance_resample(
                _mkdf(spark, corpus),
                _mkdf(spark, [("t0", target[0])]),
                "doc_id", "text",
            )

    def test_input_validation(self, spark, corpora):
        corpus, target = corpora
        tgt = _mkdf(spark, [(f"t{i}", t) for i, t in enumerate(target)])
        with pytest.raises(ValueError, match="n_keep"):
            importance_resample(
                _mkdf(spark, corpus), tgt, "doc_id", "text", 0
            )
        with pytest.raises(ValueError, match="temperature"):
            importance_resample(
                _mkdf(spark, corpus), tgt, "doc_id", "text", 5,
                temperature=0.0,
            )
        with pytest.raises(ValueError, match="mode"):
            importance_resample(
                _mkdf(spark, corpus), tgt, "doc_id", "text", 5, mode="x"
            )
        with pytest.raises(ValueError, match="smoothing"):
            ngram_log_ratio(
                _mkdf(spark, corpus), tgt, "text", smoothing=0.0
            )


class TestIncrementalDsirModel:
    """The corpus feature histogram is exactly-mergeable state: per-
    batch histograms accumulate in a TableStore history, the merged
    model equals the whole-corpus recompute, replays skip."""

    def test_merged_history_equals_whole_corpus_model(
        self, spark, corpora, tmp_path
    ):
        from data_quality_check_pipeline_spark.operators.selection import (
            feature_hist,
            incremental_dsir_model_run,
            log_ratio_from_hists,
        )
        from data_quality_check_pipeline_spark.sources.tables import (
            TableStore,
        )

        corpus, target = corpora
        store = TableStore(spark, str(tmp_path / "t"))
        merged = None
        for i, shard in enumerate((corpus[:50], corpus[50:])):
            merged = incremental_dsir_model_run(
                store, "dsir_hist", _mkdf(spark, shard), "text",
                ks=KS, n_features=N_FEATURES,
                source_fingerprint=f"b{i}",
            )
        got = {r["feat"]: r["n"] for r in merged.collect()}
        whole = {
            r["feat"]: r["n"]
            for r in feature_hist(
                _mkdf(spark, corpus), "text", KS, N_FEATURES
            ).collect()
        }
        assert got == whole
        # and the model built from the merged state equals the direct
        # whole-corpus model
        tgt_hist = feature_hist(
            _mkdf(spark, [(f"t{i}", t) for i, t in enumerate(target)]),
            "text", KS, N_FEATURES,
        )
        from_state = {
            r["feat"]: r["log_ratio"]
            for r in log_ratio_from_hists(
                tgt_hist, merged, N_FEATURES, smoothing=LAM
            ).collect()
        }
        py = _py_log_ratio([t for _, t in corpus], target)
        assert set(from_state) == set(py)
        for f, v in py.items():
            assert from_state[f] == pytest.approx(v, rel=1e-12)

    def test_replay_skips_and_spec_mismatch_refuses(
        self, spark, corpora, tmp_path
    ):
        from data_quality_check_pipeline_spark.operators.selection import (
            incremental_dsir_model_run,
        )
        from data_quality_check_pipeline_spark.sources.tables import (
            TableStore,
        )

        corpus, _ = corpora
        store = TableStore(spark, str(tmp_path / "t"))
        first = incremental_dsir_model_run(
            store, "dsir_hist", _mkdf(spark, corpus[:30]), "text",
            ks=KS, n_features=N_FEATURES, source_fingerprint="a",
        )
        assert first is not None
        assert incremental_dsir_model_run(
            store, "dsir_hist", _mkdf(spark, corpus[:30]), "text",
            ks=KS, n_features=N_FEATURES, source_fingerprint="a",
        ) is None  # fingerprint replay: exactly-once
        with pytest.raises(ValueError, match="feature universe"):
            incremental_dsir_model_run(
                store, "dsir_hist", _mkdf(spark, corpus[30:60]), "text",
                ks=(1,), n_features=N_FEATURES, source_fingerprint="b",
            )

    def test_forget_equals_recompute_without_removed(
        self, spark, corpora, tmp_path
    ):
        """GDPR-grade erasure on mergeable count state: negated appends
        make the merged model equal a recompute over the corpus without
        the removed clips — bit-for-bit, no rescan."""
        from data_quality_check_pipeline_spark.operators.selection import (
            dsir_corpus_hist,
            dsir_model_forget,
            feature_hist,
            incremental_dsir_model_run,
        )
        from data_quality_check_pipeline_spark.sources.tables import (
            TableStore,
        )

        corpus, _ = corpora
        store = TableStore(spark, str(tmp_path / "t"))
        for i, shard in enumerate((corpus[:60], corpus[60:])):
            incremental_dsir_model_run(
                store, "dsir_hist", _mkdf(spark, shard), "text",
                ks=KS, n_features=N_FEATURES, source_fingerprint=f"b{i}",
            )
        removed = corpus[60:90]
        post = dsir_model_forget(
            store, "dsir_hist", _mkdf(spark, removed), "text",
            ks=KS, n_features=N_FEATURES, source_fingerprint="order1",
        )
        survivors = corpus[:60] + corpus[90:]
        expect = {
            r["feat"]: r["n"]
            for r in feature_hist(
                _mkdf(spark, survivors), "text", KS, N_FEATURES
            ).collect()
        }
        assert {r["feat"]: r["n"] for r in post.collect()} == expect
        # the read path rebuilds the same merged state from the table
        # alone (forget rows included)
        assert {
            r["feat"]: r["n"]
            for r in dsir_corpus_hist(
                store, "dsir_hist", KS, N_FEATURES
            ).collect()
        } == expect
        # replaying the same order is a no-op (idempotent per takedown id)
        assert dsir_model_forget(
            store, "dsir_hist", _mkdf(spark, removed), "text",
            ks=KS, n_features=N_FEATURES, source_fingerprint="order1",
        ) is None
        # forgetting from an empty/missing history refuses
        with pytest.raises(ValueError, match="nothing to forget"):
            dsir_model_forget(
                TableStore(spark, str(tmp_path / "empty")), "dsir_hist",
                _mkdf(spark, removed), "text",
                ks=KS, n_features=N_FEATURES,
            )
