"""Sampling / mixing / packing operator tests: determinism across
partitionings, rate accuracy, cap semantics + prefilter==exact
equivalence, split stability under corpus growth, pure-Python oracles
for both packing semantics, and the shuffle-free plan pins."""

import random

import pytest
from pyspark.sql import functions as F

from data_quality_check_pipeline_spark.operators.packing import (
    chunk_stats,
    pack_greedy,
    pack_stream_chunks,
)
from data_quality_check_pipeline_spark.operators.sampling import (
    cap_per_stratum,
    corpus_mix,
    curriculum_filter,
    group_aware_split,
    hash_frac,
    hash_sample,
    split_leakage,
    stratified_sample,
    temperature_mix,
    with_quality_bin,
    with_split,
)


@pytest.fixture(scope="module")
def corpus_df(spark):
    rng = random.Random(7)
    langs = ["en"] * 60 + ["de"] * 25 + ["fr"] * 10 + ["sw"] * 5
    rows = [
        (i, langs[rng.randrange(len(langs))], rng.randrange(1, 400))
        for i in range(4000)
    ]
    return spark.createDataFrame(rows, "id long, lang string, n_tok int")


class TestHashSample:
    def test_deterministic_and_partition_invariant(self, spark, corpus_df):
        a = {r["id"] for r in hash_sample(corpus_df, "id", 0.3).collect()}
        b = {
            r["id"]
            for r in hash_sample(
                corpus_df.repartition(17, "lang"), "id", 0.3
            ).collect()
        }
        assert a == b and len(a) > 0
        # a different seed gives a genuinely different sample
        c = {
            r["id"]
            for r in hash_sample(corpus_df, "id", 0.3, seed=9).collect()
        }
        assert c != a and abs(len(c) - len(a)) < 0.1 * len(a)

    def test_rate_accuracy_and_nesting(self, spark, corpus_df):
        n = corpus_df.count()
        kept = hash_sample(corpus_df, "id", 0.25)
        k = kept.count()
        assert abs(k / n - 0.25) < 0.03
        # same seed, smaller rate => subset (thresholds nest)
        small = {
            r["id"] for r in hash_sample(corpus_df, "id", 0.1).collect()
        }
        assert small <= {r["id"] for r in kept.collect()}
        with pytest.raises(ValueError, match="rate"):
            hash_sample(corpus_df, "id", 1.5)

    def test_plan_is_pure_filter(self, spark, corpus_df):
        q = hash_sample(corpus_df, "id", 0.5)
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Python" not in plan

    def test_matches_pure_python_xxh64(self, spark, corpus_df):
        """The scan-side decision must equal the committed-golden
        machinery's independent re-derivation (oracle_hash)."""
        from data_quality_check_pipeline_spark.oracle_hash import (
            spark_xxhash64,
        )

        got = {r["id"] for r in hash_sample(corpus_df, "id", 0.2, 3).collect()}
        exp = {
            i
            for i in range(4000)
            if (spark_xxhash64(i, 3) % (1 << 20)) / (1 << 20) < 0.2
        }
        assert got == exp


class TestStratifiedAndMix:
    def test_per_stratum_rates(self, spark, corpus_df):
        rates = {"en": 0.1, "de": 0.5, "fr": 1.0}
        out = stratified_sample(corpus_df, "lang", rates, "id")
        got = {
            r["lang"]: r["n"]
            for r in out.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        base = {
            r["lang"]: r["n"]
            for r in corpus_df.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert "sw" not in got  # default_rate=0 drops unlisted strata
        assert got["fr"] == base["fr"]
        assert abs(got["en"] / base["en"] - 0.1) < 0.05
        assert abs(got["de"] / base["de"] - 0.5) < 0.07

    def test_corpus_mix_targets_and_unmet(self, spark, corpus_df):
        stats = {}
        out = corpus_mix(
            corpus_df,
            "lang",
            weights={"en": 1.0, "de": 1.0, "sw": 1.0},
            total_rows=900,
            key_col="id",
            stats_out=stats,
        )
        got = {
            r["lang"]: r["n"]
            for r in out.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        # en and de can meet ~300 each; sw (~200 rows total) cannot
        assert abs(got["en"] - 300) < 60 and abs(got["de"] - 300) < 60
        assert stats["rates"]["sw"] == 1.0 and "sw" in stats["unmet"]
        assert "fr" not in got  # unweighted stratum dropped

    def test_temperature_alpha_one_keeps_everything(
        self, spark, corpus_df
    ):
        """alpha=1 targets the natural distribution: every rate is
        exactly 1.0 and no row is sampled out."""
        stats = {}
        out = temperature_mix(
            corpus_df, "lang", 1.0, "id", stats_out=stats
        )
        assert all(r == 1.0 for r in stats["rates"].values())
        assert stats["unmet"] == {}
        assert out.count() == corpus_df.count()

    def test_temperature_zero_targets_uniform(self, spark, corpus_df):
        """alpha=0 = uniform mixture: the default total is bounded by
        the rarest stratum, so every stratum keeps ~count(min)."""
        base = {
            r["lang"]: r["n"]
            for r in corpus_df.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        n_min = min(base.values())
        stats = {}
        out = temperature_mix(
            corpus_df, "lang", 0.0, "id", stats_out=stats
        )
        got = {
            r["lang"]: r["n"]
            for r in out.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert stats["unmet"] == {}  # default total never upsamples
        # the binding (rarest) stratum keeps everything; the rest land
        # near n_min (Bernoulli noise)
        binding = min(base, key=base.get)
        assert got[binding] == n_min
        for s, n in got.items():
            assert abs(n - n_min) < 0.35 * n_min, (s, n, n_min)
        # exact-rate math: rate_s = n_min / n_s
        for s, r in stats["rates"].items():
            assert abs(r - n_min / base[s]) < 1e-9

    def test_temperature_partial_upweights_tail(self, spark, corpus_df):
        """0<alpha<1 shifts share from head to tail: the tail stratum's
        kept fraction strictly exceeds the head's."""
        stats = {}
        out = temperature_mix(
            corpus_df, "lang", 0.5, "id", stats_out=stats
        )
        base = {
            r["lang"]: r["n"]
            for r in corpus_df.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert stats["rates"]["sw"] == 1.0  # rarest keeps all
        assert stats["rates"]["en"] < stats["rates"]["sw"]
        # shares follow n^0.5 renormalized: check en's derived rate
        import math

        shares = {s: math.sqrt(n) for s, n in base.items()}
        ssum = sum(shares.values())
        shares = {s: w / ssum for s, w in shares.items()}
        t = min(base[s] / p for s, p in shares.items())
        assert abs(stats["rates"]["en"] - t * shares["en"] / base["en"]) \
            < 1e-9
        assert stats["total_rows"] == int(round(t))
        assert abs(out.count() - t) < 0.1 * t

    def test_temperature_explicit_total_and_nulls(self, spark):
        """An over-asked explicit total clamps + reports unmet; NULL
        strata drop and are counted."""
        rows = [(i, "en" if i % 4 else None) for i in range(400)]
        df = spark.createDataFrame(rows, "id long, lang string")
        stats = {}
        out = temperature_mix(
            df, "lang", 0.0, "id", total_rows=1000, stats_out=stats
        )
        assert stats["rates"]["en"] == 1.0
        assert stats["unmet"]["en"] == 700
        assert stats["null_stratum_rows"] == 100
        assert out.filter(F.col("lang").isNull()).count() == 0
        assert out.count() == 300
        with pytest.raises(ValueError, match="alpha"):
            temperature_mix(df, "lang", -0.1, "id")
        with pytest.raises(ValueError, match="total_rows"):
            temperature_mix(df, "lang", 0.5, "id", total_rows=0)

    def test_split_stable_under_growth(self, spark, corpus_df):
        fr = {"train": 0.8, "val": 0.1, "test": 0.1}
        small = with_split(corpus_df.filter(F.col("id") < 1000), "id", fr)
        big = with_split(corpus_df, "id", fr)
        m_small = {r["id"]: r["split"] for r in small.collect()}
        m_big = {r["id"]: r["split"] for r in big.collect()}
        assert all(m_big[i] == s for i, s in m_small.items())
        n = len(m_big)
        from collections import Counter

        c = Counter(m_big.values())
        assert abs(c["train"] / n - 0.8) < 0.03
        assert abs(c["val"] / n - 0.1) < 0.02
        with pytest.raises(ValueError, match="sum to 1"):
            with_split(corpus_df, "id", {"a": 0.5})

    def test_split_independent_of_sampling_at_equal_seed(
        self, spark, corpus_df
    ):
        """Regression: sample then split with the SAME seed. Without
        domain separation both decisions share one hash fraction and
        every sampling survivor (frac < rate) lands in the low split
        band — all 'train', zero eval data."""
        from collections import Counter

        kept = hash_sample(corpus_df, "id", 0.5, seed=0)
        out = with_split(
            kept, "id", {"train": 0.8, "val": 0.1, "test": 0.1}, seed=0
        )
        c = Counter(r["split"] for r in out.collect())
        n = sum(c.values())
        assert abs(c["train"] / n - 0.8) < 0.05
        assert c["val"] > 0 and c["test"] > 0


class TestGroupAwareSplit:
    """Leakage-safe splits: dup-group members share one split; clips
    without dup evidence keep their exact with_split label."""

    FR = {"train": 0.8, "val": 0.1, "test": 0.1}

    def _edges(self, spark, groups):
        rows = [
            (g[i], g[i + 1]) for g in groups for i in range(len(g) - 1)
        ]
        return spark.createDataFrame(rows, "id_a long, id_b long")

    def test_groups_cohere_and_singletons_unchanged(
        self, spark, corpus_df
    ):
        from data_quality_check_pipeline_spark.operators.graph import (
            connected_components,
        )

        groups = [[0, 1, 2, 3], [10, 11], [100, 101, 102]]
        comps = connected_components(self._edges(spark, groups))
        out = group_aware_split(corpus_df, "id", self.FR, comps)
        labels = {r["id"]: r["split"] for r in out.collect()}
        # no rows lost or duplicated by the left join
        assert len(labels) == corpus_df.count()
        for g in groups:
            assert len({labels[i] for i in g}) == 1, g
        # every group carries its representative's (min id) band, and
        # singletons carry bit-for-bit the per-row with_split label
        base = {
            r["id"]: r["split"]
            for r in with_split(corpus_df, "id", self.FR).collect()
        }
        grouped = {i for g in groups for i in g}
        for i, s in labels.items():
            want = base[min(g for g in groups if i in g)[0] if i in grouped else i]
            assert s == want, i

    def test_matches_pure_python_rederivation(self, spark, corpus_df):
        """The group split is the same committed-golden hash machinery:
        band(pmod(xxhash64(rep, 'split', seed), 2^20)/2^20)."""
        from data_quality_check_pipeline_spark.oracle_hash import (
            spark_xxhash64,
        )

        groups = [[5, 6, 7], [42, 43]]
        comps = self._edges(spark, groups)
        from data_quality_check_pipeline_spark.operators.graph import (
            connected_components,
        )

        comps = connected_components(comps)
        out = group_aware_split(corpus_df, "id", self.FR, comps, seed=3)
        labels = {r["id"]: r["split"] for r in out.collect()}
        rep = {i: min(g) for g in groups for i in g}

        def band(key):
            f = (spark_xxhash64(key, "split", 3) % (1 << 20)) / float(1 << 20)
            return "train" if f < 0.8 else ("val" if f < 0.9 else "test")

        for i in [5, 6, 7, 42, 43, 8, 9, 1000]:
            assert labels[i] == band(rep.get(i, i)), i

    def test_leakage_audit(self, spark, corpus_df):
        """with_split tears big dup groups across splits (the audit
        catches it); group_aware_split measures 0 by construction."""
        from data_quality_check_pipeline_spark.operators.graph import (
            connected_components,
        )

        # many 2-clip groups: P(all coherent under per-row split) ~ 0
        groups = [[2 * k, 2 * k + 1] for k in range(200)]
        edges = self._edges(spark, groups)
        naive = with_split(corpus_df, "id", self.FR)
        leak = split_leakage(naive, edges, "id")
        assert leak["edges"] == 200 and leak["leaking"] > 0
        assert sum(leak["by_split_pair"].values()) == leak["leaking"]
        comps = connected_components(edges)
        safe = group_aware_split(corpus_df, "id", self.FR, comps)
        leak2 = split_leakage(safe, edges, "id")
        assert leak2 == {"edges": 200, "leaking": 0, "by_split_pair": {}}
        # endpoints absent from df (quarantined after mining) don't count
        part = split_leakage(
            safe.filter(F.col("id") != 0), edges, "id"
        )
        assert part["edges"] == 199

    def test_stable_under_corpus_growth(self, spark, corpus_df):
        """Adding new clips (and new dup evidence touching only them)
        never moves existing labels."""
        from data_quality_check_pipeline_spark.operators.graph import (
            connected_components,
        )

        old_edges = self._edges(spark, [[0, 1, 2]])
        comps_old = connected_components(old_edges)
        small = corpus_df.filter(F.col("id") < 1000)
        old = {
            r["id"]: r["split"]
            for r in group_aware_split(
                small, "id", self.FR, comps_old
            ).collect()
        }
        new_edges = self._edges(spark, [[0, 1, 2], [3000, 3001]])
        comps_new = connected_components(new_edges)
        new = {
            r["id"]: r["split"]
            for r in group_aware_split(
                corpus_df, "id", self.FR, comps_new
            ).collect()
        }
        assert all(new[i] == s for i, s in old.items())
        assert new[3000] == new[3001]


class TestTemperatureWeighted:
    def test_token_weighted_rates_exact(self, spark):
        """alpha=0 with a token weight: rates derive from token MASS,
        not clip counts — verified against hand arithmetic."""
        # en: 100 clips x 10 tok = 1000; sw: 50 clips x 4 tok = 200
        rows = [(i, "en", 10) for i in range(100)] + [
            (1000 + i, "sw", 4) for i in range(50)
        ]
        df = spark.createDataFrame(rows, "id long, lang string, n_tok int")
        stats = {}
        temperature_mix(
            df, "lang", 0.0, "id", stats_out=stats, weight_col="n_tok"
        )
        # uniform token target: T = min(1000/0.5, 200/0.5) = 400 tokens
        assert stats["unit"] == "n_tok"
        assert stats["total_rows"] == 400
        assert stats["rates"]["en"] == pytest.approx(200 / 1000)
        assert stats["rates"]["sw"] == pytest.approx(1.0)
        # clip-count mixing would instead give en rate 50/100
        stats2 = {}
        temperature_mix(df, "lang", 0.0, "id", stats_out=stats2)
        assert stats2["unit"] == "rows"
        assert stats2["rates"]["en"] == pytest.approx(0.5)

    def test_unit_weight_matches_row_count_semantics(
        self, spark, corpus_df
    ):
        ones = corpus_df.withColumn("w", F.lit(1))
        s_w, s_n = {}, {}
        a = temperature_mix(
            ones, "lang", 0.4, "id", stats_out=s_w, weight_col="w"
        )
        b = temperature_mix(ones, "lang", 0.4, "id", stats_out=s_n)
        assert s_w["rates"] == pytest.approx(s_n["rates"])
        assert {r["id"] for r in a.collect()} == {
            r["id"] for r in b.collect()
        }

    def test_null_and_zero_weights(self, spark):
        """NULL weights count 0; an all-zero-mass stratum supplies
        nothing (its rows drop at rate 0)."""
        rows = [(i, "en", 10) for i in range(40)] + [
            (100 + i, "xx", None) for i in range(10)
        ]
        df = spark.createDataFrame(rows, "id long, lang string, n_tok int")
        stats = {}
        out = temperature_mix(
            df, "lang", 0.5, "id", stats_out=stats, weight_col="n_tok"
        )
        assert "xx" not in stats["rates"]
        assert out.filter(F.col("lang") == "xx").count() == 0
        assert out.filter(F.col("lang") == "en").count() == 40


class TestQualityBins:
    def test_exact_bins_match_duckdb_oracle(self, spark):
        """exact=True edges == DuckDB quantile_cont; per-row bins match
        the same value-threshold rule applied independently."""
        import duckdb

        rng = random.Random(11)
        rows = [(i, rng.uniform(0.0, 60.0)) for i in range(500)]
        df = spark.createDataFrame(rows, "id long, snr double")
        stats = {}
        out = with_quality_bin(df, "snr", 4, exact=True, stats_out=stats)
        got = {r["id"]: r["quality_bin"] for r in out.collect()}
        con = duckdb.connect()
        con.execute(
            "create table t as select * from (values "
            + ", ".join(f"({i}, {s!r})" for i, s in rows)
            + ") v(id, snr)"
        )
        edges = [
            float(e)
            for e in con.execute(
                "select quantile_cont(snr::double, [0.25, 0.5, 0.75]) "
                "from t"
            ).fetchone()[0]
        ]
        assert stats["bin_edges"] == pytest.approx(list(edges))

        def bin_of(x):
            for k, e in enumerate(edges):
                if x <= e:
                    return k
            return len(edges)

        assert got == {i: bin_of(s) for i, s in rows}

    def test_approx_bins_balanced_and_partition_invariant(
        self, spark, corpus_df
    ):
        scored = corpus_df.withColumn(
            "score", hash_frac("id", seed=5) * 100
        )
        out = with_quality_bin(scored, "score", 10)
        from collections import Counter

        c = Counter(r["quality_bin"] for r in out.collect())
        assert set(c) == set(range(10))
        n = sum(c.values())
        assert all(abs(v / n - 0.1) < 0.03 for v in c.values())
        again = {
            r["id"]: r["quality_bin"]
            for r in with_quality_bin(
                scored.repartition(13, "lang"), "score", 10
            ).collect()
        }
        assert again == {r["id"]: r["quality_bin"] for r in out.collect()}

    def test_nulls_ties_and_errors(self, spark):
        rows = [(0, None), (1, 5.0), (2, 5.0), (3, 5.0), (4, 5.0)]
        df = spark.createDataFrame(rows, "id long, s double")
        out = {
            r["id"]: r["quality_bin"]
            for r in with_quality_bin(df, "s", 4, exact=True).collect()
        }
        # NULL score -> NULL bin; an all-ties distribution collapses
        # its duplicate edges into ONE occupied bin (bin 0)
        assert out[0] is None
        assert {out[i] for i in (1, 2, 3, 4)} == {0}
        allnull = spark.createDataFrame(
            [(0, None), (1, None)], "id long, s double"
        )
        assert all(
            r["quality_bin"] is None
            for r in with_quality_bin(allnull, "s", 3).collect()
        )
        with pytest.raises(ValueError, match="n_bins"):
            with_quality_bin(df, "s", 1)

    def test_curriculum_composition(self, spark, corpus_df):
        """The intended use: bin by quality, then per-bin keep rates —
        dropping the bottom quintile entirely keeps exactly the rows
        above edge[0]."""
        scored = corpus_df.withColumn(
            "score", hash_frac("id", seed=8) * 100
        )
        stats = {}
        binned = with_quality_bin(scored, "score", 5, stats_out=stats)
        rates = {0: 0.0, 1: 0.5, 2: 1.0, 3: 1.0, 4: 1.0}
        kept = stratified_sample(binned, "quality_bin", rates, "id")
        assert kept.filter(F.col("quality_bin") == 0).count() == 0
        assert (
            kept.filter(F.col("score") <= stats["bin_edges"][0]).count()
            == 0
        )
        n2 = binned.filter(F.col("quality_bin") == 1).count()
        k2 = kept.filter(F.col("quality_bin") == 1).count()
        assert abs(k2 / n2 - 0.5) < 0.08
        for b in (2, 3, 4):
            assert kept.filter(F.col("quality_bin") == b).count() == (
                binned.filter(F.col("quality_bin") == b).count()
            )

    def test_pinned_edges_skip_derivation_and_match(self, spark):
        """edges=... pins the thresholds: same assignment rule as
        derived edges (feeding derived edges back in reproduces the
        bins bit-for-bit), no quantile job, validation errors."""
        rng = random.Random(3)
        rows = [(i, rng.uniform(0.0, 60.0)) for i in range(400)]
        df = spark.createDataFrame(rows, "id long, s double")
        stats = {}
        derived = with_quality_bin(df, "s", 4, exact=True, stats_out=stats)
        pinned = with_quality_bin(df, "s", 4, edges=stats["bin_edges"])
        assert {(r["id"], r["quality_bin"]) for r in pinned.collect()} == {
            (r["id"], r["quality_bin"]) for r in derived.collect()
        }
        # manual rule on hand-pinned edges
        out = {
            r["id"]: r["quality_bin"]
            for r in with_quality_bin(df, "s", 3, edges=[20.0, 40.0])
            .collect()
        }
        for i, s in rows:
            assert out[i] == (0 if s <= 20.0 else 1 if s <= 40.0 else 2)
        with pytest.raises(ValueError, match="n_bins-1"):
            with_quality_bin(df, "s", 4, edges=[1.0])
        with pytest.raises(ValueError, match="ascending"):
            with_quality_bin(df, "s", 3, edges=[40.0, 20.0])

    def test_curriculum_filter_helper(self, spark, corpus_df):
        """curriculum_filter == with_quality_bin + domained
        stratified_sample composition, with rate validation."""
        scored = corpus_df.withColumn(
            "score", hash_frac("id", seed=8) * 100
        )
        out = curriculum_filter(
            scored, "score", [0.0, 1.0], "id", edges=[50.0]
        )
        got = {r["id"] for r in out.select("id").collect()}
        assert got == {
            r["id"]
            for r in scored.filter(F.col("score") > 50.0).collect()
        }
        assert "quality_bin" not in out.columns
        with pytest.raises(ValueError, match="bin 1"):
            curriculum_filter(scored, "score", [0.5, 1.5], "id")

    def test_curriculum_domain_independent_at_equal_seed(
        self, spark, corpus_df
    ):
        """DESIGN #23 pin: the curriculum filter is a new hash-decision
        KIND. Composed with an undomained mixture sample at the SAME
        seed, the joint keep rate must be the product (0.5*0.5=0.25);
        without the 'curriculum' domain the two filters share one
        fraction and the composition collapses to min (0.5)."""
        scored = corpus_df.withColumn(
            "score", hash_frac("id", seed=8) * 100
        )
        binned = with_quality_bin(scored, "score", 2)
        mixed = hash_sample(binned, "id", 0.5, seed=0)
        n = corpus_df.count()
        rates = {0: 0.5, 1: 0.5}
        both = stratified_sample(
            mixed, "quality_bin", rates, "id", seed=0,
            domain="curriculum",
        )
        assert abs(both.count() / n - 0.25) < 0.03
        # the hazard the domain exists for: undomained at equal seed
        # the second filter is a no-op over the first's survivors
        collapsed = stratified_sample(
            mixed, "quality_bin", rates, "id", seed=0
        )
        assert collapsed.count() == mixed.count()

    def test_plan_is_pure_projection_after_edges(self, spark, corpus_df):
        """Assignment itself adds no shuffle and no Python: one CASE
        chain over the scan (the quantile agg is a separate tiny job)."""
        scored = corpus_df.withColumn(
            "score", hash_frac("id", seed=5) * 100
        )
        out = with_quality_bin(scored, "score", 10)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Python" not in plan


class TestCapPerStratum:
    def test_cap_semantics_and_prefilter_equivalence(
        self, spark, corpus_df
    ):
        stats = {}
        fast = cap_per_stratum(
            corpus_df, "lang", 100, "id", stats_out=stats
        )
        exact = cap_per_stratum(
            corpus_df, "lang", 100, "id", prefilter=False
        )
        fs = sorted((r["lang"], r["id"]) for r in fast.collect())
        es = sorted((r["lang"], r["id"]) for r in exact.collect())
        assert fs == es
        got = {
            r["lang"]: r["n"]
            for r in fast.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        base = {
            r["lang"]: r["n"]
            for r in corpus_df.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        for lang, n in base.items():
            assert got[lang] == min(100, n), lang
        assert stats["prefilter_short_strata"] == []

    def test_prefilter_undershoot_falls_back(self, spark, corpus_df):
        """A margin below 1 forces the undershoot path; the result must
        still be exactly the cap-smallest-hash rows."""
        stats = {}
        fast = cap_per_stratum(
            corpus_df, "lang", 120, "id", margin=0.2, stats_out=stats
        )
        exact = cap_per_stratum(
            corpus_df, "lang", 120, "id", prefilter=False
        )
        assert sorted((r["lang"], r["id"]) for r in fast.collect()) == sorted(
            (r["lang"], r["id"]) for r in exact.collect()
        )
        assert len(stats["prefilter_short_strata"]) > 0

    def test_null_stratum_survives_other_strata_fallback(self, spark):
        """Regression (three-valued logic): when a NON-null stratum
        triggers the exact fallback, isin() evaluates to NULL for
        NULL-stratum rows, and without coalesce they fail BOTH sides
        of the fallback union and silently vanish."""
        rows = [(i, "a") for i in range(200)] + [
            (1000 + i, None) for i in range(50)
        ]
        df = spark.createDataFrame(rows, "id long, lang string")
        fast = cap_per_stratum(df, "lang", 100, "id", margin=0.1)
        exact = cap_per_stratum(df, "lang", 100, "id", prefilter=False)
        key = lambda t: (t[0] is None, t[0] or "", t[1])  # noqa: E731
        fs = sorted(((r["lang"], r["id"]) for r in fast.collect()), key=key)
        es = sorted(
            ((r["lang"], r["id"]) for r in exact.collect()), key=key
        )
        assert fs == es
        assert sum(1 for lang, _ in fs if lang is None) == 50


def _py_stream_chunks(rows, budget):
    """rows: (group, order, size) — reference fold."""
    out = {}
    by_g = {}
    for g, o, s in rows:
        by_g.setdefault(g, []).append((o, s))
    for g, items in by_g.items():
        off = 0
        for o, s in sorted(items):
            out[(g, o)] = (off, off // budget)
            off += max(s or 0, 0)
    return out


def _py_greedy(rows, budget):
    out = {}
    by_g = {}
    for g, o, s in rows:
        by_g.setdefault(g, []).append((o, s))
    for g, items in by_g.items():
        b, fill = 0, 0
        for o, s in sorted(items):
            s = max(s or 0, 0)
            if fill > 0 and fill + s > budget:
                b, fill = b + 1, 0
            out[(g, o)] = b
            fill += s
            if fill >= budget:
                b, fill = b + 1, 0
    return out


class TestPacking:
    def _rows(self):
        rng = random.Random(13)
        rows = [
            (f"g{rng.randrange(4)}", i, rng.randrange(0, 900))
            for i in range(500)
        ]
        rows.append(("g0", 9991, None))  # NULL size rides along
        rows.append(("g1", 9992, 5000))  # oversized doc
        return rows

    def test_stream_chunks_matches_oracle(self, spark):
        rows = self._rows()
        df = spark.createDataFrame(rows, "g string, i long, sz int")
        packed = pack_stream_chunks(
            df, "sz", 1000, ["g"], ["i"]
        )
        exp = _py_stream_chunks(rows, 1000)
        for r in packed.collect():
            off, ch = exp[(r["g"], r["i"])]
            assert (r["start_offset"], r["chunk_id"]) == (off, ch)
        st = {
            (r["g"], r["chunk_id"]): (r["n_docs"], r["chunk_tokens"])
            for r in chunk_stats(packed, "sz", ["g"]).collect()
        }
        assert sum(n for n, _ in st.values()) == len(rows)

    def test_greedy_matches_oracle_and_never_overflows(self, spark):
        rows = self._rows()
        df = spark.createDataFrame(rows, "g string, i long, sz int")
        packed = pack_greedy(df, "sz", 1000, ["g"], ["i"])
        exp = _py_greedy(rows, 1000)
        got = {(r["g"], r["i"]): r["bin_id"] for r in packed.collect()}
        assert got == exp
        # no bin of >1 doc exceeds the budget
        fills = (
            packed.groupBy("g", "bin_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.coalesce("sz", F.lit(0))).alias("tok"),
            )
            .collect()
        )
        for r in fills:
            assert r["n"] == 1 or r["tok"] <= 1000

    def test_errors(self, spark):
        df = spark.createDataFrame([("g", 1, 5)], "g string, i long, sz int")
        with pytest.raises(ValueError, match="budget"):
            pack_stream_chunks(df, "sz", 0, ["g"], ["i"])
        with pytest.raises(ValueError, match="budget"):
            pack_greedy(df, "sz", -3, ["g"], ["i"])
