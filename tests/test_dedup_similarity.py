"""Dedup stack + embedding similarity tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_quality_check_pipeline_spark.operators.dedup import (
    dedup_exact,
    exact_dups,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_pairs,
    simhash_signatures,
)
from data_quality_check_pipeline_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dups,
    ivf_centroids,
    ivf_topk,
    lsh_topk,
    with_ivf_cell,
    with_lsh_bucket,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill in the morning sun"
)
NEAR = BASE.replace("morning", "evening")
FAR = (
    "completely different content about database engines and distributed "
    "query processing with columnar storage formats"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),              # exact dup of 1
        (3, "  " + BASE.upper() + "  "),  # normalized dup of 1
        (4, NEAR),              # near dup of 1
        (5, FAR),
        (6, "tiny text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestExactDedup:
    def test_groups(self, docs):
        groups = exact_dups(docs, "doc_id", "text").collect()
        assert len(groups) == 1
        assert groups[0]["ids"] == [1, 2, 3]

    def test_survivor_deterministic(self, docs):
        kept = sorted(
            r["doc_id"] for r in dedup_exact(docs, "doc_id", "text").collect()
        )
        assert kept == [1, 4, 5, 6]

    def test_null_text_is_not_duplicate_evidence(self, spark):
        """xxhash64(NULL) is a seed CONSTANT: without an explicit null
        policy every null-text row would collapse into one 'duplicate'
        group and all but one would be silently discarded."""
        rows = [(1, "same text"), (2, "same text"),
                (3, None), (4, None), (5, None)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        # all null-text rows survive; the real dup group keeps min id
        kept = sorted(
            r["doc_id"] for r in dedup_exact(df, "doc_id", "text").collect()
        )
        assert kept == [1, 3, 4, 5]
        # and they never show up as a duplicate group
        groups = exact_dups(df, "doc_id", "text").collect()
        assert len(groups) == 1 and groups[0]["ids"] == [1, 2]

    def test_survivor_by_quality(self, spark):
        """Production policy: a dup group keeps its BEST-quality member
        (argmax quality, ties -> min id, NULL quality loses), not the
        min id."""
        rows = [
            (1, "same text", 0.2),
            (2, "same text", 0.9),   # best quality -> survivor
            (3, "same text", None),  # null quality always loses
            (4, "other words", 0.1),
            (5, "OTHER words  ", 0.1),  # tie with 4 -> min id 4 wins
            (6, None, 0.0),          # null text always survives
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, q double")
        kept = sorted(
            r["doc_id"]
            for r in dedup_exact(df, "doc_id", "text",
                                 quality_col="q").collect()
        )
        assert kept == [2, 4, 6]

    def test_component_survivor_by_quality(self, spark):
        from data_quality_check_pipeline_spark.operators.graph import (
            dedup_survivors_by_component,
        )

        comps = spark.createDataFrame(
            # group A = {1,2,3}, group B = {7,9}; 5 is in no component
            [(1, 1), (2, 1), (3, 1), (7, 7), (9, 7)],
            "node long, comp long",
        )
        df = spark.createDataFrame(
            [(1, 0.1), (2, 0.8), (3, 0.8), (5, 0.0), (7, None), (9, 0.2)],
            "doc_id long, q double",
        )
        kept = sorted(
            r["doc_id"]
            for r in dedup_survivors_by_component(
                df, comps, "doc_id", quality_col="q"
            ).collect()
        )
        # A: quality tie 2 vs 3 -> min id 2; B: null(7) loses to 0.2(9)
        assert kept == [2, 5, 9]
        # default policy unchanged: min-id (== component label)
        kept_min = sorted(
            r["doc_id"]
            for r in dedup_survivors_by_component(
                df, comps, "doc_id"
            ).collect()
        )
        assert kept_min == [1, 5, 7]

    def test_null_text_produces_no_near_dup_pairs(self, spark):
        from data_quality_check_pipeline_spark.operators.dedup import (
            minhash_lsh_pairs,
            ngram_jaccard_pairs,
            simhash_pairs,
        )

        rows = [(1, None), (2, None), (3, None), (4, "real text here")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        assert minhash_lsh_pairs(df, "doc_id", "text").count() == 0
        assert simhash_pairs(df, "doc_id", "text").count() == 0
        assert ngram_jaccard_pairs(df, "doc_id", "text").count() == 0


class TestMinHash:
    def test_signature_shape_and_determinism(self, docs):
        sigs = {
            r["doc_id"]: r["sig"]
            for r in minhash_signatures(docs, "doc_id", "text").collect()
        }
        assert len(sigs[1]) == 32
        assert sigs[1] == sigs[2]  # identical text -> identical signature

    def test_lsh_finds_near_dups_not_far(self, docs):
        pairs = {
            (r["id_a"], r["id_b"]): r["est_jaccard"]
            for r in minhash_lsh_pairs(
                docs, "doc_id", "text", min_est_jaccard=0.5
            ).collect()
        }
        assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
        assert (1, 4) in pairs  # near dup caught
        assert not any(5 in p for p in pairs)  # far doc not paired


class TestHotBucketGuards:
    """Planted pathological corpora: the candidate generators must BOUND
    degenerate buckets (the only quadratic blowup risk at 100 TB) and
    report the drops — never silently truncate."""

    @pytest.fixture(scope="class")
    def hot_shingle_docs(self, spark):
        # every doc shares the word "boilerplate"; docs 0/1 additionally
        # share real content (a true near-dup pair)
        rows = [(0, "boilerplate alpha beta gamma delta"),
                (1, "boilerplate alpha beta gamma epsilon")]
        rows += [
            (i, f"boilerplate unique{i}a unique{i}b unique{i}c")
            for i in range(2, 42)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_stop_shingle_cutoff_bounds_candidates(self, hot_shingle_docs):
        stats: dict = {}
        pairs = ngram_jaccard_pairs(
            hot_shingle_docs, "doc_id", "text", shingle_k=1,
            min_jaccard=0.01, max_doc_freq=10, stats_out=stats,
        ).collect()
        # "boilerplate" (df=42 > 10) is dropped and accounted for
        assert stats["stop_shingles"] == 1
        # without the cutoff every pair of the 42 docs is a candidate
        # (861 pairs); with it only the true near-dup pair survives
        assert {(r["id_a"], r["id_b"]) for r in pairs} == {(0, 1)}
        # jaccard is a lower bound: intersection lost "boilerplate" but
        # |A|,|B| still count it -> 3/(5+5-3) instead of 4/(5+5-4)
        assert pairs[0]["jaccard"] == pytest.approx(3 / 7)

    def test_no_cutoff_reproduces_unbounded_behavior(self, hot_shingle_docs):
        stats: dict = {}
        pairs = ngram_jaccard_pairs(
            hot_shingle_docs, "doc_id", "text", shingle_k=1,
            min_jaccard=0.01, max_doc_freq=None, stats_out=stats,
        ).collect()
        assert stats == {}  # guard disabled -> nothing counted
        assert len(pairs) == 42 * 41 // 2

    def test_relative_doc_freq_cutoff(self, hot_shingle_docs):
        """max_doc_frac scales the stop-shingle cutoff with the corpus
        (DESIGN.md #19: the absolute default alone lets boilerplate just
        under it dominate the join at scale). frac=0.2 of 42 docs -> 9,
        so 'boilerplate' (df=42) drops even with max_doc_freq=100."""
        stats: dict = {}
        pairs = ngram_jaccard_pairs(
            hot_shingle_docs, "doc_id", "text", shingle_k=1,
            min_jaccard=0.01, max_doc_freq=100, max_doc_frac=0.2,
            stats_out=stats,
        ).collect()
        assert stats["stop_shingles"] == 1
        assert {(r["id_a"], r["id_b"]) for r in pairs} == {(0, 1)}
        # frac works with max_doc_freq=None too; invalid frac raises
        assert ngram_jaccard_pairs(
            hot_shingle_docs, "doc_id", "text", shingle_k=1,
            min_jaccard=0.01, max_doc_freq=None, max_doc_frac=0.2,
        ).count() == 1
        with pytest.raises(ValueError, match="max_doc_frac"):
            ngram_jaccard_pairs(
                hot_shingle_docs, "doc_id", "text", max_doc_frac=1.5,
            )

    def test_cap_above_df_changes_nothing(self, hot_shingle_docs):
        capped = ngram_jaccard_pairs(
            hot_shingle_docs, "doc_id", "text", shingle_k=1,
            min_jaccard=0.01, max_doc_freq=100,
        ).collect()
        uncapped = ngram_jaccard_pairs(
            hot_shingle_docs, "doc_id", "text", shingle_k=1,
            min_jaccard=0.01, max_doc_freq=None,
        ).collect()
        assert sorted(map(tuple, capped)) == sorted(map(tuple, uncapped))

    def test_minhash_hot_band_bucket_dropped(self, spark):
        # 30 identical docs -> every band bucket holds all 30; one distinct
        # pair of near-dups must still surface through its own buckets
        rows = [(i, "spam spam lorem ipsum dolor sit amet") for i in range(30)]
        rows += [(100, "an actual sentence about spark shuffles and joins"),
                 (101, "an actual sentence about spark shuffles and join")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        stats: dict = {}
        pairs = {
            (r["id_a"], r["id_b"])
            for r in minhash_lsh_pairs(
                df, "doc_id", "text", min_est_jaccard=0.3,
                max_bucket=10, stats_out=stats,
            ).collect()
        }
        assert stats["hot_band_buckets"] >= 8  # all 8 spam bands over cap
        assert all(a >= 100 for a, _ in pairs)  # spam cluster suppressed
        assert (100, 101) in pairs              # true pair kept

    def test_hamming_hot_chunk_bucket_dropped(self, spark):
        from data_quality_check_pipeline_spark.operators.dedup import (
            hamming_band_pairs,
        )

        # 25 sigs identical in chunk 0 (low 16 bits = 0xAAAA) but far apart
        # overall; plus one genuine near pair (hamming 1) away from the herd
        rows = [(i, (i << 16) | 0xAAAA) for i in range(25)]
        rows += [(100, 0x7777000055550000), (101, 0x7777000055550001)]
        sigs = spark.createDataFrame(rows, "id long, sig long")
        stats: dict = {}
        pairs = {
            (r["id_a"], r["id_b"])
            for r in hamming_band_pairs(
                sigs, "id", "sig", max_hamming=3, chunks=4,
                max_bucket=10, stats_out=stats,
            ).collect()
        }
        # 3 hot buckets: the planted (chunk0, 0xAAAA) plus the herd's
        # shared all-zero high chunks (chunk2, 0) and (chunk3, 0)
        assert stats["hot_chunk_buckets"] == 3
        assert pairs == {(100, 101)}

    def test_left_anti_fallback_matches_inline_path(self, spark):
        """The >max_inline_keys branch of _drop_hot_groups — the path a
        pathologically degenerate 100-TB corpus triggers — must keep the
        exact survivor set the IN-set path keeps, INCLUDING dropping a
        hot group whose key is NULL (r02 ADVICE: a raw-key left_anti
        never matches NULL keys; the fix anti-joins on the null-safe
        _enc encoding both sides already share)."""
        from data_quality_check_pipeline_spark.operators.dedup import (
            _drop_hot_groups,
        )

        rows = []
        for g in range(30):  # 30 hot groups of 5 rows, group 0 keyed NULL
            key = None if g == 0 else f"k{g}"
            rows += [(g * 10 + i, key) for i in range(5)]
        rows += [(1000, "cold1"), (1001, "cold2"), (1002, None)]
        # note 1002: a SINGLE extra null row joins group 0 (6 rows) —
        # cold rows are only the two distinct-key singletons
        df = spark.createDataFrame(rows, "id long, band string")
        stats_in: dict = {}
        stats_fb: dict = {}
        inline = {
            r["id"]
            for r in _drop_hot_groups(
                df, ["band"], 3, "t", stats_out=stats_in
            ).collect()
        }
        fallback_df = _drop_hot_groups(
            df, ["band"], 3, "t", stats_out=stats_fb, max_inline_keys=5
        )
        fallback = {r["id"] for r in fallback_df.collect()}
        assert inline == fallback == {1000, 1001}
        assert stats_in["t"] == stats_fb["t"] == 30
        # schema unchanged (the _enc helper column never leaks out)
        assert fallback_df.columns == df.columns


def _two_batch_corpus(spark):
    """A corpus split into an already-ingested batch (ids < 100) and a
    new arrival (ids >= 100), with planted near-dup clusters WITHIN
    history, WITHIN the new batch, and ACROSS the split."""
    hist = [
        (1, BASE),
        (2, BASE),                               # hist-hist exact
        (3, NEAR),                               # hist-hist near
        (4, FAR),
        (5, "unrelated musings on tea kettles and copper pots in autumn"),
    ]
    new = [
        (101, BASE.replace("lazy", "sleepy")),   # cross: near dup of 1/2
        (102, FAR),                              # cross: exact dup of 4
        (103, "fresh content about sailing boats across the northern sea"),
        (104, "fresh content about sailing boats across the southern sea"),
        # ^ 103/104: new-new near pair
        (105, "completely novel text with no relatives anywhere at all"),
    ]
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, text string"
    )
    return mk(hist), mk(new), mk(hist + new)


class TestIncrementalMinhash:
    KW = dict(n_hashes=32, bands=8, min_est_jaccard=0.5)

    def _pairset(self, df):
        return {
            (r["id_a"], r["id_b"], r["est_jaccard"]) for r in df.collect()
        }

    def test_incremental_equals_full(self, spark):
        """The contract: full_pairs(history ∪ new) == full_pairs(history)
        ∪ incremental_pairs(new, sigs(history)) — the incremental pass
        mines every new-vs-new AND new-vs-history pair and nothing
        history-internal (those were found when history was ingested)."""
        from data_quality_check_pipeline_spark.operators.dedup import (
            minhash_lsh_pairs_incremental,
        )

        hist, new, both = _two_batch_corpus(spark)
        full = self._pairset(
            minhash_lsh_pairs(both, "doc_id", "text", **self.KW)
        )
        hist_pairs = self._pairset(
            minhash_lsh_pairs(hist, "doc_id", "text", **self.KW)
        )
        hist_sigs = minhash_signatures(hist, "doc_id", "text", 32)
        inc, new_sigs = minhash_lsh_pairs_incremental(
            new, hist_sigs, "doc_id", "text", **self.KW
        )
        inc = self._pairset(inc)
        assert full == hist_pairs | inc
        # every incremental pair touches a new id; all three planted
        # new-involving relationships surfaced
        assert all(a >= 100 or b >= 100 for a, b, _ in inc)
        inc_ids = {(a, b) for a, b, _ in inc}
        assert (1, 101) in inc_ids      # cross near
        assert (4, 102) in inc_ids      # cross exact
        assert (103, 104) in inc_ids    # new-new near
        assert not any(a < 100 and b < 100 for a, b in inc_ids)
        # the returned new_sigs are exactly the new batch's signatures
        want = {
            (r["doc_id"], tuple(r["sig"]))
            for r in minhash_signatures(new, "doc_id", "text", 32).collect()
        }
        got = {(r["doc_id"], tuple(r["sig"])) for r in new_sigs.collect()}
        assert got == want

    def test_first_run_without_history(self, spark):
        from data_quality_check_pipeline_spark.operators.dedup import (
            minhash_lsh_pairs_incremental,
        )

        hist, _, _ = _two_batch_corpus(spark)
        inc, _ = minhash_lsh_pairs_incremental(
            hist, None, "doc_id", "text", **self.KW
        )
        assert self._pairset(inc) == self._pairset(
            minhash_lsh_pairs(hist, "doc_id", "text", **self.KW)
        )

    def test_union_level_hot_bucket_cap(self, spark):
        """The cap must see UNION bucket sizes: a bucket that is under
        the cap within each batch alone but over it across batches is
        dropped, exactly as a full recompute would drop it."""
        from data_quality_check_pipeline_spark.operators.dedup import (
            minhash_lsh_pairs_incremental,
        )

        spam = "identical spam body repeated across every upload batch"
        hist = spark.createDataFrame(
            [(i, spam) for i in range(3)], "doc_id long, text string"
        )
        new = spark.createDataFrame(
            [(100 + i, spam) for i in range(3)], "doc_id long, text string"
        )
        hist_sigs = minhash_signatures(hist, "doc_id", "text", 32)
        stats_inc: dict = {}
        inc, _ = minhash_lsh_pairs_incremental(
            new, hist_sigs, "doc_id", "text",
            max_bucket=4, stats_out=stats_inc, **self.KW
        )
        stats_full: dict = {}
        full = minhash_lsh_pairs(
            hist.unionByName(new), "doc_id", "text",
            max_bucket=4, stats_out=stats_full, **self.KW
        )
        # all 6 clones share all 8 band buckets -> every bucket is hot
        # in the UNION (6 > 4) though each batch alone (3) is under cap
        assert stats_inc["hot_band_buckets"] == stats_full[
            "hot_band_buckets"] > 0
        assert inc.count() == full.count() == 0

    def test_tablestore_run_accumulates_and_skips_replays(
        self, spark, tmp_path
    ):
        from data_quality_check_pipeline_spark.operators.dedup import (
            incremental_minhash_run,
        )
        from data_quality_check_pipeline_spark.sources.tables import (
            TableStore,
        )

        hist, new, both = _two_batch_corpus(spark)
        store = TableStore(spark, str(tmp_path))
        p1 = incremental_minhash_run(
            store, "minhash_sigs", hist, "doc_id", "text",
            source_fingerprint="batch1", **self.KW
        )
        p2 = incremental_minhash_run(
            store, "minhash_sigs", new, "doc_id", "text",
            source_fingerprint="batch2", **self.KW
        )
        accumulated = self._pairset(p1) | self._pairset(p2)
        assert accumulated == self._pairset(
            minhash_lsh_pairs(both, "doc_id", "text", **self.KW)
        )
        # history now holds every signature, once
        assert store.read("minhash_sigs").count() == 10
        # replaying the last batch is a no-op (idempotent ingest)
        assert incremental_minhash_run(
            store, "minhash_sigs", new, "doc_id", "text",
            source_fingerprint="batch2", **self.KW
        ) is None
        assert store.read("minhash_sigs").count() == 10


class TestIncrementalSimhash:
    KW = dict(max_hamming=7, chunks=8)

    def _pairset(self, df):
        return {(r["id_a"], r["id_b"], r["hamming"]) for r in df.collect()}

    def test_incremental_equals_full(self, spark):
        """full_pairs(history ∪ new) == full_pairs(history) ∪
        incremental_pairs(new, sigs(history)) — the SimHash analogue of
        the minhash contract, through the shared banding helper."""
        from data_quality_check_pipeline_spark.operators.dedup import (
            simhash_pairs_incremental,
        )

        hist, new, both = _two_batch_corpus(spark)
        full = self._pairset(
            simhash_pairs(both, "doc_id", "text", **self.KW)
        )
        hist_pairs = self._pairset(
            simhash_pairs(hist, "doc_id", "text", **self.KW)
        )
        hist_sigs = simhash_signatures(hist, "doc_id", "text")
        inc, new_sigs = simhash_pairs_incremental(
            new, hist_sigs, "doc_id", "text", **self.KW
        )
        inc = self._pairset(inc)
        assert full == hist_pairs | inc
        assert all(a >= 100 or b >= 100 for a, b, _ in inc)
        inc_ids = {(a, b) for a, b, _ in inc}
        assert (4, 102) in inc_ids           # cross exact: hamming 0
        assert not any(a < 100 and b < 100 for a, b in inc_ids)
        # the returned new_sigs are exactly the new batch's signatures
        want = {
            (r["doc_id"], r["simhash"])
            for r in simhash_signatures(new, "doc_id", "text").collect()
        }
        got = {(r["doc_id"], r["simhash"]) for r in new_sigs.collect()}
        assert got == want

    def test_first_run_and_new_flags(self, spark):
        from data_quality_check_pipeline_spark.operators.dedup import (
            simhash_pairs_incremental,
        )

        hist, new, _ = _two_batch_corpus(spark)
        # no history -> plain full mine over the new batch
        inc, _ = simhash_pairs_incremental(
            hist, None, "doc_id", "text", **self.KW
        )
        assert self._pairset(inc) == self._pairset(
            simhash_pairs(hist, "doc_id", "text", **self.KW)
        )
        # keep_flags tells the caller which side is the new arrival
        hist_sigs = simhash_signatures(hist, "doc_id", "text")
        flagged, _ = simhash_pairs_incremental(
            new, hist_sigs, "doc_id", "text", keep_flags=True, **self.KW
        )
        rows = {
            (r["id_a"], r["id_b"]): (r["new_a"], r["new_b"])
            for r in flagged.collect()
        }
        assert rows[(4, 102)] == (False, True)      # history vs new
        for (a, b), (na, nb) in rows.items():
            assert na == (a >= 100) and nb == (b >= 100)

    def test_tablestore_run_accumulates_and_skips_replays(
        self, spark, tmp_path
    ):
        from data_quality_check_pipeline_spark.operators.dedup import (
            incremental_simhash_run,
        )
        from data_quality_check_pipeline_spark.sources.tables import (
            TableStore,
        )

        hist, new, both = _two_batch_corpus(spark)
        store = TableStore(spark, str(tmp_path))
        p1 = incremental_simhash_run(
            store, "simhash_sigs", hist, "doc_id", "text",
            source_fingerprint="b1", **self.KW
        )
        p2 = incremental_simhash_run(
            store, "simhash_sigs", new, "doc_id", "text",
            source_fingerprint="b2", **self.KW
        )
        assert self._pairset(p1) | self._pairset(p2) == self._pairset(
            simhash_pairs(both, "doc_id", "text", **self.KW)
        )
        assert store.read("simhash_sigs").count() == 10
        assert incremental_simhash_run(
            store, "simhash_sigs", new, "doc_id", "text",
            source_fingerprint="b2", **self.KW
        ) is None
        assert store.read("simhash_sigs").count() == 10


class TestIncrementalExact:
    def _mk(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_sequential_equals_full_min_id(self, spark):
        """Feeding batches through dedup_exact_incremental (appending
        kept_hashes each round) retains exactly dedup_exact(union) under
        the min-id policy with ingest-ordered ids."""
        from data_quality_check_pipeline_spark.operators.dedup import (
            dedup_exact_incremental,
        )

        b1 = [(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, None)]
        b2 = [(11, "aaa"), (12, "ccc"), (13, "ccc"), (14, None)]
        b3 = [(21, "bbb"), (22, "ddd")]
        hist = None
        kept_ids: set = set()
        for rows in (b1, b2, b3):
            kept, hashes = dedup_exact_incremental(
                self._mk(spark, rows), hist, "doc_id", "text"
            )
            kept_ids |= {r["doc_id"] for r in kept.collect()}
            hist = hashes if hist is None else hist.unionByName(hashes)
        full = {
            r["doc_id"]
            for r in dedup_exact(
                self._mk(spark, b1 + b2 + b3), "doc_id", "text"
            ).collect()
        }
        # nulls all survive; "aaa"->1, "bbb"->2, "ccc"->12, "ddd"->22
        assert kept_ids == full == {1, 2, 4, 12, 14, 22}
        # history hashes cover exactly the retained non-null texts
        assert hist.count() == 4

    def test_quality_policy_is_greedy_across_runs(self, spark):
        """Within a batch the best-quality copy survives; across runs
        the policy is greedy — an earlier survivor is never displaced
        by a later higher-quality copy (documented tradeoff vs the
        full-compaction argmax)."""
        from data_quality_check_pipeline_spark.operators.dedup import (
            dedup_exact_incremental,
        )

        mk = lambda rows: spark.createDataFrame(  # noqa: E731
            rows, "doc_id long, text string, q double"
        )
        k1, h1 = dedup_exact_incremental(
            mk([(1, "aaa", 0.2), (2, "aaa", 0.8)]), None,
            "doc_id", "text", quality_col="q",
        )
        assert {r["doc_id"] for r in k1.collect()} == {2}
        k2, _ = dedup_exact_incremental(
            mk([(11, "aaa", 0.99), (12, "eee", 0.1)]), h1,
            "doc_id", "text", quality_col="q",
        )
        # 11 outscores the retained 2 but "aaa" is already in history
        assert {r["doc_id"] for r in k2.collect()} == {12}
        full = dedup_exact(
            mk([(1, "aaa", 0.2), (2, "aaa", 0.8),
                (11, "aaa", 0.99), (12, "eee", 0.1)]),
            "doc_id", "text", quality_col="q",
        )
        assert {r["doc_id"] for r in full.collect()} == {11, 12}

    def test_tablestore_run_and_replay_skip(self, spark, tmp_path):
        from data_quality_check_pipeline_spark.operators.dedup import (
            incremental_dedup_exact_run,
        )
        from data_quality_check_pipeline_spark.sources.tables import (
            TableStore,
        )

        store = TableStore(spark, str(tmp_path))
        k1 = incremental_dedup_exact_run(
            store, "content_hashes",
            self._mk(spark, [(1, "aaa"), (2, "aaa"), (3, "bbb")]),
            "doc_id", "text", source_fingerprint="b1",
        )
        assert {r["doc_id"] for r in k1.collect()} == {1, 3}
        k2 = incremental_dedup_exact_run(
            store, "content_hashes",
            self._mk(spark, [(11, "aaa"), (12, "zzz")]),
            "doc_id", "text", source_fingerprint="b2",
        )
        assert {r["doc_id"] for r in k2.collect()} == {12}
        assert store.read("content_hashes").count() == 3
        assert incremental_dedup_exact_run(
            store, "content_hashes",
            self._mk(spark, [(11, "aaa"), (12, "zzz")]),
            "doc_id", "text", source_fingerprint="b2",
        ) is None
        assert store.read("content_hashes").count() == 3


class TestSimHash:
    def test_identical_signatures(self, docs):
        sigs = {
            r["doc_id"]: r["simhash"]
            for r in simhash_signatures(docs, "doc_id", "text").collect()
        }
        assert sigs[1] == sigs[2] == sigs[3]

    def test_pairs_by_hamming(self, docs):
        # chunks=8 -> pigeonhole guarantees candidates for hamming <= 7
        pairs = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in simhash_pairs(
                docs, "doc_id", "text", max_hamming=7, chunks=8
            ).collect()
        }
        assert pairs.get((1, 2)) == 0
        assert (1, 4) in pairs
        assert not any(5 in p for p in pairs)


class TestNgramJaccard:
    def test_exact_jaccard(self, docs):
        pairs = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(
                docs, "doc_id", "text", min_jaccard=0.5
            ).collect()
        }
        assert pairs[(1, 2)] == pytest.approx(1.0)
        assert 0.5 <= pairs[(1, 4)] < 1.0
        assert (1, 5) not in pairs

    def test_short_docs_sharing_first_word_are_not_identical(self, spark):
        """A doc shorter than shingle_k contributes its WHOLE token
        sequence as one shingle — using just the first token would give
        jaccard 1.0 to any two short docs sharing a first word."""
        df = spark.createDataFrame(
            [(1, "hello world"), (2, "hello there"), (3, "hello world")],
            "doc_id long, text string",
        )
        pairs = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(
                df, "doc_id", "text", shingle_k=3, min_jaccard=0.1
            ).collect()
        }
        assert (1, 2) not in pairs           # share only the first word
        assert pairs[(1, 3)] == pytest.approx(1.0)  # truly identical

    def test_minhash_bands_must_divide_n_hashes(self, spark, docs):
        from data_quality_check_pipeline_spark.operators.dedup import (
            minhash_lsh_pairs,
        )

        for bad in (64, 5, 0):
            with pytest.raises(ValueError, match="bands"):
                minhash_lsh_pairs(
                    docs, "doc_id", "text", n_hashes=32, bands=bad
                )

    def test_hamming_banding_rejects_unguaranteed_threshold(self, spark):
        from data_quality_check_pipeline_spark.operators.dedup import (
            hamming_band_pairs,
        )

        sigs = spark.createDataFrame(
            [(1, 7), (2, 9)], "id long, sig long"
        )
        # hamming 6 with 16-bit chunks (guarantee 3) -> explicit error...
        with pytest.raises(ValueError, match="pigeonhole"):
            hamming_band_pairs(sigs, "id", "sig", max_hamming=6, chunks=4)
        # ...unless approximate recall is explicitly accepted
        hamming_band_pairs(
            sigs, "id", "sig", max_hamming=6, chunks=4,
            allow_partial_recall=True,
        ).collect()


class TestConnectedComponents:
    def test_two_components_and_chain(self, spark):
        from data_quality_check_pipeline_spark.operators.graph import (
            connected_components,
        )

        edges = spark.createDataFrame(
            [(2, 1), (2, 3), (3, 4), (4, 5), (10, 11)],
            "id_a long, id_b long",
        )
        comps = {
            r["node"]: r["comp"]
            for r in connected_components(edges).collect()
        }
        assert comps == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}

    def test_deep_chain_converges_in_log_rounds(self, spark):
        """A 64-node chain has diameter 63: plain min-label propagation
        needs 63 rounds (> the max_iter=50 default), pointer jumping
        needs ~log2(63). Convergence inside the default cap proves the
        path-compression step works. driver_threshold=0 forces the
        DISTRIBUTED iteration (the property under test)."""
        from data_quality_check_pipeline_spark.operators.graph import (
            connected_components,
        )

        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(63)], "id_a long, id_b long"
        )
        comps = {
            r["node"]: r["comp"]
            for r in connected_components(
                edges, driver_threshold=0
            ).collect()
        }
        assert set(comps.values()) == {0}
        assert len(comps) == 64

    def test_driver_shortcut_matches_distributed(self, spark):
        """Below driver_threshold (and with no checkpoint_dir) CC solves
        via driver-side union-find — output must equal the distributed
        iteration exactly, for long AND string ids."""
        import random

        from data_quality_check_pipeline_spark.operators.graph import (
            connected_components,
        )

        rng = random.Random(7)
        edge_list = [
            (rng.randrange(120), rng.randrange(120)) for _ in range(90)
        ]
        for schema, mk in [
            ("id_a long, id_b long", lambda x: x),
            ("id_a string, id_b string", lambda x: f"n{x:03d}"),
        ]:
            edges = spark.createDataFrame(
                [(mk(a), mk(b)) for a, b in edge_list], schema
            )
            fast = {
                (r["node"], r["comp"])
                for r in connected_components(edges).collect()
            }
            dist = {
                (r["node"], r["comp"])
                for r in connected_components(
                    edges, driver_threshold=0
                ).collect()
            }
            assert fast == dist and fast

    def test_reliable_checkpoint_dir(self, spark, tmp_path):
        """Table-backed per-round persistence (the cluster-safe mode) must
        produce identical components, sweep its per-round files on
        convergence, and leave a durable ``final`` the returned DataFrame
        reads from."""
        import os

        from data_quality_check_pipeline_spark.operators.graph import (
            connected_components,
        )

        edges = spark.createDataFrame(
            [(2, 1), (2, 3), (3, 4), (4, 5), (10, 11)],
            "id_a long, id_b long",
        )
        ckpt = str(tmp_path / "cc")
        comps = {
            r["node"]: r["comp"]
            for r in connected_components(
                edges, checkpoint_dir=ckpt
            ).collect()
        }
        assert comps == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}
        run_dirs = [d for d in os.listdir(ckpt) if d.startswith("cc_")]
        assert len(run_dirs) == 1  # per-invocation subdir
        inside = os.listdir(os.path.join(ckpt, run_dirs[0]))
        # rounds cleaned on convergence; only the final labels remain
        assert not [d for d in inside if d.startswith("round_")]
        persisted = {
            r["node"]: r["comp"]
            for r in spark.read.parquet(
                f"{ckpt}/{run_dirs[0]}/final"
            ).collect()
        }
        assert persisted == comps

    def test_checkpoint_runs_isolated_by_tag(self, spark, tmp_path):
        """Two CC jobs sharing one checkpoint dir must not clobber each
        other's files (r02 ADVICE: fixed cc_round_<i> names collided)."""
        import os

        from data_quality_check_pipeline_spark.operators.graph import (
            connected_components,
        )

        ckpt = str(tmp_path / "cc")
        e1 = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        e2 = spark.createDataFrame([(7, 8), (8, 9)], "id_a long, id_b long")
        c1 = connected_components(e1, checkpoint_dir=ckpt)
        c2 = connected_components(e2, checkpoint_dir=ckpt)
        # both lazy results stay readable after the other job ran
        assert {r["comp"] for r in c1.collect()} == {1}
        assert {r["comp"] for r in c2.collect()} == {7}
        assert len([d for d in os.listdir(ckpt) if d.startswith("cc_")]) == 2

    def test_checkpoint_resume_after_driver_loss(self, spark, tmp_path):
        """A stable run_tag makes the iteration resumable: a run killed
        mid-iteration (simulated via a too-small max_iter) leaves complete
        round files; a new 'driver' with the same tag picks up from them
        and converges, then a third call short-circuits to the persisted
        final without recomputing (proven by passing disjoint edges)."""
        import os

        from data_quality_check_pipeline_spark.operators.graph import (
            connected_components,
        )

        ckpt = str(tmp_path / "cc")
        chain = spark.createDataFrame(
            [(i, i + 1) for i in range(1, 9)], "id_a long, id_b long"
        )
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(
                chain, max_iter=1, checkpoint_dir=ckpt, run_tag="jobA"
            )
        run_dir = os.path.join(ckpt, "cc_jobA")
        rounds = [d for d in os.listdir(run_dir) if d.startswith("round_")]
        assert rounds  # crash left resumable state
        comps = {
            r["node"]: r["comp"]
            for r in connected_components(
                chain, max_iter=20, checkpoint_dir=ckpt, run_tag="jobA"
            ).collect()
        }
        assert set(comps.values()) == {1} and len(comps) == 9
        # rounds swept, final persisted
        inside = os.listdir(run_dir)
        assert not [d for d in inside if d.startswith("round_")]
        # same tag again: returns the persisted final untouched — the
        # disjoint edge set would otherwise yield component 100
        other = spark.createDataFrame([(100, 101)], "id_a long, id_b long")
        again = {
            r["node"]: r["comp"]
            for r in connected_components(
                other, checkpoint_dir=ckpt, run_tag="jobA"
            ).collect()
        }
        assert again == comps

    def test_nonconvergence_raises(self, spark):
        """A chain longer than max_iter hops must raise, not silently
        return split components."""
        from data_quality_check_pipeline_spark.operators.graph import (
            connected_components,
        )

        chain = spark.createDataFrame(
            [(i, i + 1) for i in range(1, 8)], "id_a long, id_b long"
        )
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(chain, max_iter=2, driver_threshold=0)
        # ample cap: the same chain folds into one component
        comps = {
            r["comp"]
            for r in connected_components(
                chain, max_iter=20, driver_threshold=0
            ).collect()
        }
        assert comps == {1}

    def test_survivors(self, spark):
        from data_quality_check_pipeline_spark.operators.graph import (
            connected_components,
            dedup_survivors_by_component,
        )

        edges = spark.createDataFrame(
            [(1, 2), (2, 3)], "id_a long, id_b long"
        )
        df = spark.createDataFrame(
            [(i, f"t{i}") for i in (1, 2, 3, 9)], "doc_id long, text string"
        )
        comps = connected_components(edges)
        kept = sorted(
            r["doc_id"]
            for r in dedup_survivors_by_component(
                df, comps, "doc_id"
            ).collect()
        )
        assert kept == [1, 9]  # 2,3 fold into component 1; 9 untouched


@pytest.fixture(scope="module")
def embeddings(spark):
    rng = np.random.RandomState(0)
    centers = rng.normal(size=(3, 16))
    rows = []
    for i in range(60):
        c = centers[i % 3]
        v = c + rng.normal(scale=0.05, size=16)
        rows.append((i, [float(x) for x in v]))
    # a true near-dup pair: 100/101 almost identical
    v = centers[0] + rng.normal(scale=0.01, size=16)
    rows.append((100, [float(x) for x in v]))
    rows.append((101, [float(x) for x in v + 1e-4]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


class TestSimilarity:
    def test_brute_force_matches_numpy(self, spark, embeddings):
        pdf = embeddings.toPandas()
        mat = np.array(pdf["embedding"].tolist())
        ids = pdf["vec_id"].to_numpy()
        q = embeddings.limit(2).selectExpr(
            "vec_id as query_id", "embedding"
        )
        got = brute_force_topk(embeddings, q, k=5).collect()
        qpdf = q.toPandas()
        for qid, qv in zip(qpdf["query_id"], qpdf["embedding"]):
            qv = np.array(qv)
            cos = (mat @ qv) / (
                np.linalg.norm(mat, axis=1) * np.linalg.norm(qv)
            )
            want = ids[np.argsort(-cos)[:5]]
            have = [
                r["vec_id"]
                for r in sorted(
                    (r for r in got if r["query_id"] == qid),
                    key=lambda r: r["rank"],
                )
            ]
            assert set(have) == set(want.tolist())

    def test_lsh_bucket_deterministic(self, embeddings):
        b1 = {
            r["vec_id"]: r["lsh_bucket"]
            for r in with_lsh_bucket(embeddings, dim=16).collect()
        }
        b2 = {
            r["vec_id"]: r["lsh_bucket"]
            for r in with_lsh_bucket(embeddings, dim=16).collect()
        }
        assert b1 == b2

    def test_lsh_bucket_requires_dim(self, embeddings):
        # dim is a required keyword-only arg: a missing value fails at
        # the call site (TypeError from the signature), not deep inside
        # plan construction
        with pytest.raises(TypeError, match="dim"):
            with_lsh_bucket(embeddings)

    def test_lsh_topk_recall_on_clusters(self, embeddings):
        q = embeddings.limit(3).selectExpr("vec_id as query_id", "embedding")
        exact = brute_force_topk(embeddings, q, k=5).collect()
        approx = lsh_topk(embeddings, q, k=5, n_planes=4, dim=16).collect()
        exact_sets = {}
        for r in exact:
            exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
        approx_sets = {}
        for r in approx:
            approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
        recalls = [
            len(exact_sets[q_] & approx_sets.get(q_, set())) / 5
            for q_ in exact_sets
        ]
        assert sum(recalls) / len(recalls) >= 0.6

    def test_lsh_multitable_multiprobe_improves_recall(self, embeddings):
        q = embeddings.limit(3).selectExpr("vec_id as query_id", "embedding")
        exact = brute_force_topk(embeddings, q, k=5).collect()
        exact_sets: dict = {}
        for r in exact:
            exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])

        def recall(rows):
            sets: dict = {}
            for r in rows:
                sets.setdefault(r["query_id"], set()).add(r["vec_id"])
            return sum(
                len(exact_sets[q_] & sets.get(q_, set())) / 5
                for q_ in exact_sets
            ) / len(exact_sets)

        single = recall(
            lsh_topk(embeddings, q, k=5, n_planes=6, dim=16).collect()
        )
        multi = recall(
            lsh_topk(
                embeddings, q, k=5, n_planes=6, dim=16,
                n_tables=4, multiprobe=1,
            ).collect()
        )
        assert multi >= single
        assert multi >= 0.8

    def test_lsh_multiprobe_radius_validated(self, embeddings):
        q = embeddings.limit(1).selectExpr("vec_id as query_id", "embedding")
        with pytest.raises(ValueError, match="radius 0, 1 or 2"):
            lsh_topk(embeddings, q, dim=16, multiprobe=3)

    def test_lsh_multiprobe_radius2_extends_radius1(self, embeddings):
        """Radius 2 probes a strict superset of radius 1's buckets: its
        candidate set (and therefore recall) can only grow. The probe set
        sizes are exact: 1, 1+P, 1+P+C(P,2)."""
        from data_quality_check_pipeline_spark.operators.similarity import (
            _probe_flips,
            lsh_candidates,
        )

        assert len(_probe_flips(6, 0)) == 1
        assert len(_probe_flips(6, 1)) == 7
        assert len(_probe_flips(6, 2)) == 7 + 15
        assert set(_probe_flips(6, 1)) < set(_probe_flips(6, 2))
        q = embeddings.limit(2).selectExpr("vec_id as query_id", "embedding")

        def cand_set(r):
            return {
                (x["query_id"], x["vec_id"])
                for x in lsh_candidates(
                    embeddings, q, dim=16, n_planes=6, multiprobe=r
                ).collect()
            }

        c0, c1, c2 = cand_set(0), cand_set(1), cand_set(2)
        assert c0 <= c1 <= c2

    def test_ivf_cells_partition_corpus(self, embeddings):
        cents = ivf_centroids(embeddings, n_centroids=4)
        assert len(cents) == 4 and len(cents[0]) == 16
        cells = with_ivf_cell(embeddings, cents).collect()
        assert all(0 <= r["ivf_cell"] < 4 for r in cells)
        # determinism across runs
        again = with_ivf_cell(embeddings, cents).collect()
        assert {r["vec_id"]: r["ivf_cell"] for r in cells} == {
            r["vec_id"]: r["ivf_cell"] for r in again
        }

    def test_kpp_seeding_resists_low_id_collapse(self, spark):
        """Planted pathology: the 8 SMALLEST ids are near-identical
        vectors. min_id seeding collapses the whole codebook into that
        one direction; kpp (deterministic farthest-point over the
        id-hash-ordered pool) spreads seeds across the real clusters.
        This is the scenario kpp exists for — on benign corpora min_id
        measured better and stays the default (DESIGN.md)."""
        rng = np.random.RandomState(3)
        centers = rng.normal(size=(4, 16))
        rows = []
        for i in range(8):  # lowest ids: one tight near-dup herd
            v = centers[0] + rng.normal(scale=0.001, size=16)
            rows.append((i, [float(x) for x in v]))
        for i in range(8, 72):
            v = centers[i % 4] + rng.normal(scale=0.05, size=16)
            rows.append((i, [float(x) for x in v]))
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

        def min_pairwise_cosdist(cents):
            m = np.array(cents)
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            sims = m @ m.T
            np.fill_diagonal(sims, -1.0)
            return 1.0 - sims.max()

        lowid = ivf_centroids(df, n_centroids=4, seeding="min_id")
        kpp = ivf_centroids(df, n_centroids=4, seeding="kpp")
        assert min_pairwise_cosdist(lowid) < 1e-4   # collapsed codebook
        assert min_pairwise_cosdist(kpp) > 0.01     # spread seeds
        # determinism across invocations (no rand() anywhere)
        assert kpp == ivf_centroids(df, n_centroids=4, seeding="kpp")
        with pytest.raises(ValueError, match="unknown seeding"):
            ivf_centroids(df, n_centroids=4, seeding="random")

    def test_ivf_codebook_shrinks_to_small_corpus(self, spark):
        small = spark.createDataFrame(
            [(i, [float(i), 1.0]) for i in range(3)],
            "vec_id long, embedding array<double>",
        )
        cents = ivf_centroids(small, n_centroids=16, iters=1)
        assert len(cents) == 3  # shrinks instead of IndexError

    def test_ivf_lloyd_reduces_distortion(self, embeddings):
        import numpy as np

        pdf = embeddings.toPandas()
        mat = np.array(pdf["embedding"].tolist())

        def distortion(cents):
            c = np.array(cents)
            sims = (mat @ c.T) / (
                np.linalg.norm(mat, axis=1)[:, None]
                * np.linalg.norm(c, axis=1)[None, :]
            )
            return float((1 - sims.max(axis=1)).mean())

        c0 = ivf_centroids(embeddings, n_centroids=3, iters=0)
        c2 = ivf_centroids(embeddings, n_centroids=3, iters=2)
        assert distortion(c2) <= distortion(c0) + 1e-9

    def test_ivf_topk_recall(self, embeddings):
        q = embeddings.limit(3).selectExpr("vec_id as query_id", "embedding")
        exact = brute_force_topk(embeddings, q, k=5).collect()
        approx = ivf_topk(
            embeddings, q, k=5, n_centroids=4, n_probe=2, iters=1
        ).collect()
        exact_sets: dict = {}
        for r in exact:
            exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
        approx_sets: dict = {}
        for r in approx:
            approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
        recalls = [
            len(exact_sets[q_] & approx_sets.get(q_, set())) / 5
            for q_ in exact_sets
        ]
        assert sum(recalls) / len(recalls) >= 0.8

    def test_embedding_near_dups(self, embeddings):
        pairs = {
            (r["id_a"], r["id_b"])
            for r in embedding_near_dups(
                embeddings, min_cosine=0.9999, dim=16
            ).collect()
        }
        assert (100, 101) in pairs

    def test_embedding_near_dups_incremental_equals_full(
        self, spark, embeddings
    ):
        """full(history ∪ new) == full(history) ∪ incremental(new,
        history); every incremental pair touches a new id; TableStore
        run wrapper accumulates and skips fingerprint replays."""
        from data_quality_check_pipeline_spark.operators.similarity import (
            embedding_near_dups_incremental,
            incremental_embedding_run,
        )
        from data_quality_check_pipeline_spark.sources.tables import (
            TableStore,
        )

        kw = dict(min_cosine=0.98, dim=16)
        hist = embeddings.filter(F.col("vec_id") < 40)
        new = embeddings.filter(F.col("vec_id") >= 40)

        def ps(df):
            return {
                (r["id_a"], r["id_b"], round(r["cosine"], 9))
                for r in df.collect()
            }

        full = ps(embedding_near_dups(embeddings, **kw))
        hist_pairs = ps(embedding_near_dups(hist, **kw))
        inc_df, new_vecs = embedding_near_dups_incremental(
            new, hist, keep_flags=True, **kw
        )
        inc = ps(inc_df.drop("new_a", "new_b"))
        assert full == hist_pairs | inc and len(inc) > 0
        assert all(a >= 40 or b >= 40 for a, b, _ in inc)
        assert (100, 101) in {(a, b) for a, b, _ in inc}  # new-new
        flags = {
            (r["id_a"], r["id_b"]): (r["new_a"], r["new_b"])
            for r in inc_df.collect()
        }
        for (a, b), (na, nb) in flags.items():
            assert na == (a >= 40) and nb == (b >= 40)
        assert new_vecs.count() == new.count()

        import tempfile

        with tempfile.TemporaryDirectory() as d:
            store = TableStore(spark, d)
            p1 = incremental_embedding_run(
                store, "vecs", hist, source_fingerprint="b1", **kw
            )
            p2 = incremental_embedding_run(
                store, "vecs", new, source_fingerprint="b2", **kw
            )
            assert ps(p1) | ps(p2) == full
            assert store.read("vecs").count() == embeddings.count()
            assert incremental_embedding_run(
                store, "vecs", new, source_fingerprint="b2", **kw
            ) is None


class TestIncrementalComponents:
    """connected_components_incremental: folding new edges into a
    standing labeling equals full CC over the cumulative edge set —
    including merges that relabel OLD nodes — for long and string ids;
    plus the overwrite-table maintenance round."""

    def _labels(self, df):
        return {(r["node"], r["comp"]) for r in df.collect()}

    def test_incremental_equals_full_with_merge(self, spark):
        from data_quality_check_pipeline_spark.operators.graph import (
            connected_components,
            connected_components_incremental,
        )

        for mk, schema in [
            (lambda x: x, "id_a long, id_b long"),
            (lambda x: f"n{x:03d}", "id_a string, id_b string"),
        ]:
            # batch 1: two separate chains {0..3} and {10..13}, plus a
            # singleton pair {20,21}
            b1 = [(0, 1), (1, 2), (2, 3), (10, 11), (11, 12), (12, 13),
                  (20, 21)]
            # batch 2: MERGES the two chains (3-10), extends one (13-14),
            # and adds a brand-new component {30,31}
            b2 = [(3, 10), (13, 14), (30, 31)]
            e1 = spark.createDataFrame(
                [(mk(a), mk(b)) for a, b in b1], schema
            )
            e2 = spark.createDataFrame(
                [(mk(a), mk(b)) for a, b in b2], schema
            )
            l1 = connected_components(e1)
            inc = connected_components_incremental(e2, l1)
            full = connected_components(e1.unionByName(e2))
            assert self._labels(inc) == self._labels(full)
            got = dict(self._labels(inc))
            # the merge relabeled the old 10..13 chain down to comp 0
            assert got[mk(11)] == mk(0) and got[mk(14)] == mk(0)
            assert got[mk(21)] == mk(20) and got[mk(31)] == mk(30)
            # prior_labels=None degrades to a plain full run
            assert self._labels(
                connected_components_incremental(e1, None)
            ) == self._labels(l1)

    def test_components_table_round(self, spark, tmp_path):
        from data_quality_check_pipeline_spark.operators.graph import (
            connected_components,
            incremental_components_run,
        )
        from data_quality_check_pipeline_spark.sources.tables import (
            TableStore,
        )

        store = TableStore(spark, str(tmp_path))
        e1 = spark.createDataFrame(
            [(0, 1), (5, 6)], "id_a long, id_b long"
        )
        e2 = spark.createDataFrame([(1, 5)], "id_a long, id_b long")
        incremental_components_run(
            store, "comps", e1, source_fingerprint="b1"
        )
        l2 = incremental_components_run(
            store, "comps", e2, source_fingerprint="b2"
        )
        # table holds the FULL replacement labeling after the merge
        want = self._labels(
            connected_components(e1.unionByName(e2))
        )
        assert self._labels(store.read("comps")) == want
        assert self._labels(l2) == want
        # replay skips; table unchanged
        assert incremental_components_run(
            store, "comps", e2, source_fingerprint="b2"
        ) is None
        assert self._labels(store.read("comps")) == want


class TestDecontaminate:
    """Eval-set decontamination: n-gram overlap vs a heldout set."""

    K = 4

    def _frames(self, spark):
        eval_passage = "alpha bravo charlie delta echo foxtrot"
        corpus = spark.createDataFrame(
            [
                # quotes a full heldout 4-gram (twice: hits stay distinct)
                (1, "intro text alpha bravo charlie delta more words "
                    "and again alpha bravo charlie delta end"),
                # clean doc, same vocabulary but never 4 in a row
                (2, "bravo alpha delta charlie echo words foxtrot jumble"),
                # quotes TWO distinct heldout 4-grams
                (3, "x alpha bravo charlie delta echo y"),
                (4, None),  # null text: never contaminated
                (5, "tiny doc"),  # shorter than k, not in heldout
            ],
            "doc_id long, text string",
        )
        heldout = spark.createDataFrame(
            [(eval_passage,), (None,)], "text string"
        )
        return corpus, heldout

    def test_planted_overlap_and_min_hits(self, spark):
        from data_quality_check_pipeline_spark.operators.dedup import (
            decontaminate,
        )

        corpus, heldout = self._frames(spark)
        got = {
            r["doc_id"]: r["hits"]
            for r in decontaminate(
                corpus, heldout, "doc_id", "text", shingle_k=self.K
            ).collect()
        }
        # doc 1 shares exactly one distinct 4-gram (quoted twice),
        # doc 3 spans 'alpha..echo' = two heldout 4-grams
        assert got == {1: 1, 3: 2}
        strict = {
            r["doc_id"]
            for r in decontaminate(
                corpus, heldout, "doc_id", "text",
                shingle_k=self.K, min_hits=2,
            ).collect()
        }
        assert strict == {3}

    def test_short_heldout_matches_only_whole_text(self, spark):
        """A heldout doc shorter than k collapses to its whole text
        (the _shingle_expr fallback): it flags only corpus docs whose
        own shingle set contains that exact string — i.e. equally-short
        identical docs — not every doc containing the words."""
        from data_quality_check_pipeline_spark.operators.dedup import (
            decontaminate,
        )

        corpus = spark.createDataFrame(
            [(1, "tiny doc"), (2, "this tiny doc sits inside a longer "
                                  "sentence with many more words here")],
            "doc_id long, text string",
        )
        heldout = spark.createDataFrame([("tiny doc",)], "text string")
        got = {
            r["doc_id"]
            for r in decontaminate(
                corpus, heldout, "doc_id", "text", shingle_k=self.K
            ).collect()
        }
        assert got == {1}

    def test_matches_python_oracle_on_random_data(self, spark):
        import random

        from data_quality_check_pipeline_spark.operators.dedup import (
            decontaminate,
        )

        rng = random.Random(7)
        vocab = [f"w{i}" for i in range(30)]

        def doc():
            return " ".join(
                rng.choice(vocab) for _ in range(rng.randrange(2, 25))
            )

        corpus_rows = [(i, doc()) for i in range(120)]
        heldout_rows = [(doc(),) for _ in range(15)]

        def shingles(text):
            toks = text.split()
            if len(toks) < self.K:
                return {" ".join(toks)}
            return {
                " ".join(toks[i:i + self.K])
                for i in range(len(toks) - self.K + 1)
            }

        held = set().union(*(shingles(t) for (t,) in heldout_rows))
        expect = {
            i: len(shingles(t) & held)
            for i, t in corpus_rows
            if shingles(t) & held
        }
        got = {
            r["doc_id"]: r["hits"]
            for r in decontaminate(
                spark.createDataFrame(
                    corpus_rows, "doc_id long, text string"
                ),
                spark.createDataFrame(heldout_rows, "text string"),
                "doc_id", "text", shingle_k=self.K,
            ).collect()
        }
        assert got == expect

    def test_plan_broadcasts_heldout_not_corpus(self, spark):
        from data_quality_check_pipeline_spark.operators.dedup import (
            decontaminate,
        )

        corpus, heldout = self._frames(spark)
        q = decontaminate(corpus, heldout, "doc_id", "text")
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        with pytest.raises(ValueError, match="min_hits"):
            decontaminate(
                corpus, heldout, "doc_id", "text", min_hits=0
            )


class TestDupSpans:
    """Span-level exact-substring dedup: duplicated passages inside
    otherwise-distinct documents (Lee et al. 2022 at k-word grain)."""

    K = 8

    def _corpus(self, spark):
        base = " ".join(f"a{i}" for i in range(20))  # doc 1: the owner
        pasted = " ".join(f"A{i}" for i in range(5, 17)).upper()
        return spark.createDataFrame(
            [
                (1, base),
                # unique prefix + 12-word passage from doc 1 (shouting,
                # double-spaced: normalization must still match) + suffix
                (2, "x0 x1 x2  " + pasted.replace(" ", "  ") + "  y0 y1"),
                (3, base.upper()),          # full re-upload of doc 1
                (4, "a5 a6 a7 a8 a9"),      # sub-k copy: not evidence
                (5, None),                  # missing text: no rows
                (6, "b0 b1 b2 b3 b4 b5 b6 b7 b8 b9"),  # unique doc
            ],
            "doc_id long, text string",
        )

    def test_planted_spans(self, spark):
        from data_quality_check_pipeline_spark.operators.dedup import (
            dup_spans,
        )

        got = sorted(
            (r["doc_id"], r["span_start"], r["span_end"], r["span_words"])
            for r in dup_spans(
                self._corpus(spark), "doc_id", "text", k=self.K
            ).collect()
        )
        # doc 2: pasted words sit at positions 3..14 -> duplicated
        # shingle starts 3..7 merge to span [3, 14] (exactly the paste);
        # doc 3: every shingle owned by doc 1 -> one whole-doc span;
        # doc 1 (owner), doc 4 (<k), doc 5 (null), doc 6 (unique): none
        assert got == [(2, 3, 14, 12), (3, 0, 19, 20)]

    def test_strip_dup_spans(self, spark):
        from data_quality_check_pipeline_spark.operators.dedup import (
            dup_spans,
            strip_dup_spans,
        )

        corpus = self._corpus(spark)
        spans = dup_spans(corpus, "doc_id", "text", k=self.K)
        out = {
            r["doc_id"]: r["text"]
            for r in strip_dup_spans(
                corpus, spans, "doc_id", "text"
            ).collect()
        }
        # affected docs: normalized text minus covered words
        assert out[2] == "x0 x1 x2 y0 y1"
        assert out[3] == ""  # fully-duplicated doc strips to empty
        # unaffected docs keep ORIGINAL text verbatim (casing intact)
        assert out[1] == " ".join(f"a{i}" for i in range(20))
        assert out[5] is None
        assert out[6] == "b0 b1 b2 b3 b4 b5 b6 b7 b8 b9"

    def test_k_validation_and_no_spans_noop(self, spark):
        from data_quality_check_pipeline_spark.operators.dedup import (
            dup_spans,
            strip_dup_spans,
        )

        corpus = self._corpus(spark).filter("doc_id in (1, 6)")
        with pytest.raises(ValueError, match="k must be"):
            dup_spans(corpus, "doc_id", "text", k=1)
        spans = dup_spans(corpus, "doc_id", "text", k=self.K)
        assert spans.count() == 0
        out = strip_dup_spans(corpus, spans, "doc_id", "text")
        assert {r["text"] for r in out.collect()} == {
            r["text"] for r in corpus.collect()
        }


class TestIncrementalDupSpans:
    """Ingest-shape span dedup: new batch vs persisted shingle history."""

    K = 8

    def _mk(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def _corpus_rows(self):
        base = " ".join(f"a{i}" for i in range(20))
        passage = " ".join(f"a{i}" for i in range(5, 17))
        return [
            (1, base),
            (2, "x0 x1 x2 " + passage + " y0 y1"),    # pastes doc 1's span
            (3, base),                                 # full re-upload
            (4, "b0 b1 b2 b3 b4 b5 b6 b7 b8 b9"),      # unique
            (5, None),
            # batch-2 docs (ids above batch 1)
            (11, "z0 z1 " + passage + " z2 z3 z4"),    # vs HISTORY only
            (12, "c0 c1 c2 c3 c4 c5 c6 c7 c8 c9"),     # unique
            (13, "c0 c1 c2 c3 c4 c5 c6 c7 c8 c9"),     # within-batch dup
        ]

    def test_sequential_equals_full(self, spark):
        from data_quality_check_pipeline_spark.operators.dedup import (
            dup_spans,
            dup_spans_incremental,
        )

        rows = self._corpus_rows()
        full = {
            tuple(r) for r in dup_spans(
                self._mk(spark, rows), "doc_id", "text", k=self.K
            ).collect()
        }
        b1 = self._mk(spark, [r for r in rows if r[0] < 10])
        b2 = self._mk(spark, [r for r in rows if r[0] >= 10])
        s1, sh1 = dup_spans_incremental(b1, None, "doc_id", "text", k=self.K)
        s2, _sh2 = dup_spans_incremental(
            b2, sh1, "doc_id", "text", k=self.K
        )
        inc = {tuple(r) for r in s1.collect()} | {
            tuple(r) for r in s2.collect()
        }
        assert inc == full and len(full) > 0
        # doc 11's duplication is visible ONLY through history ownership
        assert any(r[0] == 11 for r in inc)

    def test_tablestore_run_and_replay_skip(self, spark, tmp_path):
        from data_quality_check_pipeline_spark.operators.dedup import (
            incremental_dup_spans_run,
        )
        from data_quality_check_pipeline_spark.sources.tables import (
            TableStore,
        )

        rows = self._corpus_rows()
        store = TableStore(spark, str(tmp_path))
        s1 = incremental_dup_spans_run(
            store, "span_shingles",
            self._mk(spark, [r for r in rows if r[0] < 10]),
            "doc_id", "text", k=self.K, source_fingerprint="b1",
        )
        assert {r["doc_id"] for r in s1.collect()} == {2, 3}
        n_hist1 = store.read("span_shingles").count()
        assert n_hist1 > 0
        s2 = incremental_dup_spans_run(
            store, "span_shingles",
            self._mk(spark, [r for r in rows if r[0] >= 10]),
            "doc_id", "text", k=self.K, source_fingerprint="b2",
        )
        assert {r["doc_id"] for r in s2.collect()} == {11, 13}
        # history accumulates only NOVEL shingles; re-pasted passages
        # and within-batch dup copies add nothing
        n_hist2 = store.read("span_shingles").count()
        assert n_hist2 > n_hist1
        assert store.read("span_shingles").distinct().count() == n_hist2
        # fingerprint replay skips idempotently
        assert incremental_dup_spans_run(
            store, "span_shingles",
            self._mk(spark, [r for r in rows if r[0] >= 10]),
            "doc_id", "text", k=self.K, source_fingerprint="b2",
        ) is None
        assert store.read("span_shingles").count() == n_hist2


class TestIvfIndex:
    """Persisted IVF index: build once, append, probe with file pruning."""

    def _queries(self, spark, embeddings):
        rows = embeddings.filter("vec_id in (0, 1, 100)").collect()
        return spark.createDataFrame(
            [(int(r["vec_id"]), list(r["embedding"])) for r in rows],
            "query_id long, embedding array<double>",
        )

    def test_index_topk_equals_adhoc_ivf_topk(
        self, spark, embeddings, tmp_path
    ):
        from data_quality_check_pipeline_spark.operators.similarity import (
            ivf_index_build,
            ivf_index_topk,
            ivf_topk,
        )
        from data_quality_check_pipeline_spark.sources.tables import (
            TableStore,
        )

        store = TableStore(spark, str(tmp_path))
        cents = ivf_index_build(
            store, "emb", embeddings, n_centroids=6, iters=1,
        )
        queries = self._queries(spark, embeddings)
        got = {
            (r["query_id"], r["vec_id"], r["rank"])
            for r in ivf_index_topk(
                store, "emb", queries, k=5, n_probe=2
            ).collect()
        }
        want = {
            (r["query_id"], r["vec_id"], r["rank"])
            for r in ivf_topk(
                embeddings, queries, k=5, n_probe=2, cents=cents
            ).collect()
        }
        assert got == want and len(got) == 15

    def test_probe_prunes_unprobed_cells(
        self, spark, embeddings, tmp_path
    ):
        from data_quality_check_pipeline_spark.operators.similarity import (
            ivf_index_build,
            ivf_index_topk,
        )
        from data_quality_check_pipeline_spark.sources.tables import (
            TableStore,
        )

        store = TableStore(spark, str(tmp_path))
        ivf_index_build(store, "emb", embeddings, n_centroids=6, iters=1)
        queries = self._queries(spark, embeddings).limit(1)
        ss: dict = {}
        ivf_index_topk(
            store, "emb", queries, k=3, n_probe=1, scan_stats=ss
        ).collect()
        # 6 cells partitioned into their own files; 1 probed cell reads
        # only its file(s) — the manifest 'in' prune skips the rest
        assert ss["files_skipped"] > 0
        assert ss["files_kept"] < ss["files_kept"] + ss["files_skipped"]

    def test_append_frozen_codebook_and_replay(
        self, spark, embeddings, tmp_path
    ):
        from data_quality_check_pipeline_spark.operators.similarity import (
            ivf_index_append,
            ivf_index_build,
            ivf_index_centroids,
            ivf_index_topk,
        )
        from data_quality_check_pipeline_spark.sources.tables import (
            TableStore,
        )

        store = TableStore(spark, str(tmp_path))
        base = embeddings.filter("vec_id < 100")
        cents = ivf_index_build(store, "emb", base, n_centroids=6, iters=1)
        late = embeddings.filter("vec_id >= 100")  # the near-dup pair
        n = ivf_index_append(
            store, "emb", late, source_fingerprint="b2"
        )
        assert n == 2
        # codebook is frozen: append never retrains
        assert ivf_index_centroids(store, "emb") == cents
        # the appended near-dup is now retrievable as its twin's top hit
        q = spark.createDataFrame(
            [(100, list(late.filter("vec_id = 100")
                        .collect()[0]["embedding"]))],
            "query_id long, embedding array<double>",
        )
        top = ivf_index_topk(store, "emb", q, k=2, n_probe=2).collect()
        assert {r["vec_id"] for r in top} == {100, 101}
        # exact replay of the same batch appends nothing
        assert ivf_index_append(
            store, "emb", late, source_fingerprint="b2"
        ) is None
        assert store.read("emb_vectors").count() == 62


class TestHardNegatives:
    """mine_hard_negatives: contrastive-training negatives = top-k by
    cosine inside [band_lo, band_hi) — near-dups are false negatives and
    must be excluded; self-pairs never appear."""

    def _numpy_expected(self, embeddings, anchors, k, band_hi,
                        band_lo=None):
        pdf = embeddings.toPandas()
        mat = np.array(pdf["embedding"].tolist())
        ids = pdf["vec_id"].to_numpy()
        want = {}
        for aid, av in anchors:
            av = np.array(av)
            cos = (mat @ av) / (
                np.linalg.norm(mat, axis=1) * np.linalg.norm(av)
            )
            mask = (ids != aid) & (cos < band_hi)
            if band_lo is not None:
                mask &= cos >= band_lo
            cand = sorted(
                zip(cos[mask], ids[mask]), key=lambda t: (-t[0], t[1])
            )
            want[aid] = [int(i) for _, i in cand[:k]]
        return want

    def test_brute_matches_numpy(self, spark, embeddings):
        from data_quality_check_pipeline_spark.operators.similarity import (
            mine_hard_negatives,
        )

        anchors = embeddings.limit(3)
        got = mine_hard_negatives(
            embeddings, anchors, k=4, band_hi=0.99
        ).collect()
        apdf = anchors.toPandas()
        want = self._numpy_expected(
            embeddings,
            list(zip(apdf["vec_id"], apdf["embedding"])),
            k=4, band_hi=0.99,
        )
        for aid, ordered in want.items():
            have = [
                r["vec_id"]
                for r in sorted(
                    (r for r in got if r["anchor_id"] == aid),
                    key=lambda r: r["rank"],
                )
            ]
            assert have == ordered

    def test_near_dup_excluded_by_band(self, spark, embeddings):
        # vec 100 and 101 are near-identical (cosine ~ 1.0): a valid
        # hard-negative miner must NOT surface 101 as a "negative" for
        # 100 — it is the same content. Without the band it would be
        # the rank-1 hit.
        from data_quality_check_pipeline_spark.operators.similarity import (
            mine_hard_negatives,
        )

        anchors = embeddings.filter("vec_id = 100")
        banded = mine_hard_negatives(
            embeddings, anchors, k=5, band_hi=0.999
        ).collect()
        assert all(r["vec_id"] != 101 for r in banded)
        unbanded = mine_hard_negatives(
            embeddings, anchors, k=5, band_hi=1.01
        ).collect()
        top = min(unbanded, key=lambda r: r["rank"])
        assert top["vec_id"] == 101

    def test_band_lo_drops_easy_negatives(self, spark, embeddings):
        from data_quality_check_pipeline_spark.operators.similarity import (
            mine_hard_negatives,
        )

        anchors = embeddings.limit(1)
        # fixture geometry for anchor 0: same-cluster rows sit > 0.99,
        # cross-cluster mostly < 0 — band_lo=0 drops the easy (negative-
        # cosine) negatives, band_hi drops the near-dup cluster
        banded = mine_hard_negatives(
            embeddings, anchors, k=100, band_hi=0.99, band_lo=0.0
        ).collect()
        unbounded = mine_hard_negatives(
            embeddings, anchors, k=100, band_hi=0.99
        ).collect()
        assert banded, "band [0.0, 0.99) should keep mid-band rows"
        assert all(0.0 <= r["cosine"] < 0.99 for r in banded)
        assert len(banded) < len(unbounded)

    def test_self_mining_never_pairs_self(self, spark, embeddings):
        from data_quality_check_pipeline_spark.operators.similarity import (
            mine_hard_negatives,
        )

        got = mine_hard_negatives(
            embeddings, None, k=3, band_hi=0.999,
            method="ivf", n_centroids=4, n_probe=2,
            broadcast_anchors=False,
        ).collect()
        assert got
        assert all(r["vec_id"] != r["anchor_id"] for r in got)
        per_anchor = {}
        for r in got:
            per_anchor.setdefault(r["anchor_id"], []).append(r["rank"])
        for ranks in per_anchor.values():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))

    def test_self_mining_plan_never_broadcasts_corpus(
        self, spark, embeddings
    ):
        # corpus-scale self-mining must meet through a shuffle equi-join:
        # no broadcast of either side, no cartesian product
        from data_quality_check_pipeline_spark.operators.similarity import (
            mine_hard_negatives,
        )
        from data_quality_check_pipeline_spark.plans.assertions import (
            formatted_plan,
        )

        df = mine_hard_negatives(
            embeddings, None, k=3, band_hi=0.999,
            method="ivf", n_centroids=4, n_probe=2,
            broadcast_anchors=False,
        )
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastExchange" not in plan

    def test_lsh_method_recall_vs_brute(self, spark, embeddings):
        from data_quality_check_pipeline_spark.operators.similarity import (
            mine_hard_negatives,
        )

        anchors = embeddings.limit(3)
        exact = mine_hard_negatives(
            embeddings, anchors, k=5, band_hi=0.999
        ).collect()
        approx = mine_hard_negatives(
            embeddings, anchors, k=5, band_hi=0.999,
            method="lsh", dim=16, n_planes=4, n_tables=4, multiprobe=1,
        ).collect()
        e, a = {}, {}
        for r in exact:
            e.setdefault(r["anchor_id"], set()).add(r["vec_id"])
        for r in approx:
            a.setdefault(r["anchor_id"], set()).add(r["vec_id"])
        recalls = [
            len(e[q] & a.get(q, set())) / len(e[q]) for q in e
        ]
        assert sum(recalls) / len(recalls) >= 0.6

    def test_brute_refuses_nonbroadcast(self, spark, embeddings):
        from data_quality_check_pipeline_spark.operators.similarity import (
            mine_hard_negatives,
        )

        with pytest.raises(ValueError, match="broadcast"):
            mine_hard_negatives(
                embeddings, None, method="brute",
                broadcast_anchors=False,
            )

    def test_unknown_method(self, spark, embeddings):
        from data_quality_check_pipeline_spark.operators.similarity import (
            mine_hard_negatives,
        )

        with pytest.raises(ValueError, match="unknown method"):
            mine_hard_negatives(embeddings, None, method="annoy")
