"""Property-based tests (hypothesis): Spark Column expressions vs the
pure-Python oracle on generated adversarial text.

Alphabet is printable ASCII on purpose: Java regex \\b is ASCII-word by
default while Python re is unicode-aware, so unicode text would test
engine divergence, not our code. The PII patterns themselves are ASCII.

Each hypothesis example builds ONE small DataFrame and runs ONE Spark job
(max_examples kept low; deadline disabled — Spark latency is not the
property under test).
"""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_quality_check_pipeline_spark.functions.exprs import (
    TOX_WORDS,
    mask_email,
    mask_name,
    mask_phone,
    pii_hits_expr,
    scrub_expr,
)
from data_quality_check_pipeline_spark.oracle import scrub_text

_WORD = st.text(
    alphabet=st.characters(
        min_codepoint=32, max_codepoint=126, blacklist_characters="'\\"
    ),
    min_size=1,
    max_size=12,
)
_EMAIL = st.builds(
    lambda a, b, c: f"{a}@{b}.{c}",
    st.from_regex(r"[A-Za-z0-9._%+-]{1,10}", fullmatch=True),
    st.from_regex(r"[A-Za-z0-9.-]{1,8}", fullmatch=True),
    st.from_regex(r"[A-Za-z]{2,4}", fullmatch=True),
)
_PHONE = st.one_of(
    st.from_regex(r"\(\d{3}\)\d{3}-\d{4}", fullmatch=True),
    st.from_regex(r"\d{3}-\d{3}-\d{4}", fullmatch=True),
    st.from_regex(r"\d{3}\.\d{3}\.\d{4}", fullmatch=True),
    st.from_regex(r"\d{10}", fullmatch=True),
)
_SSN = st.from_regex(r"\d{3}-\d{2}-\d{4}", fullmatch=True)
_TOX = st.sampled_from(TOX_WORDS + [w.upper() for w in TOX_WORDS])

_FRAGMENT = st.one_of(_WORD, _EMAIL, _PHONE, _SSN, _TOX)
_TEXT = st.lists(_FRAGMENT, min_size=0, max_size=8).map(" ".join)
_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


class TestScrubProperties:
    @_SETTINGS
    @given(texts=st.lists(_TEXT, min_size=1, max_size=24))
    def test_scrub_and_hits_match_python_oracle(self, spark, texts):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "id long, text string"
        )
        got = {
            r["id"]: (r["s"], r["h"])
            for r in df.select(
                "id",
                scrub_expr("text").alias("s"),
                pii_hits_expr("text").alias("h"),
            ).collect()
        }
        for i, t in enumerate(texts):
            want_s, want_h = scrub_text(t)
            assert got[i] == (want_s, want_h), repr(t)

    @_SETTINGS
    @given(texts=st.lists(_TEXT, min_size=1, max_size=24))
    def test_scrub_idempotent(self, spark, texts):
        """Scrubbing already-scrubbed text is a no-op (tokens contain no
        PII-shaped substrings)."""
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        rows = df.select(
            scrub_expr("text").alias("once"),
            scrub_expr(scrub_expr("text")).alias("twice"),
        ).collect()
        for r in rows:
            assert r["once"] == r["twice"]


class TestMaskProperties:
    @_SETTINGS
    @given(names=st.lists(_WORD, min_size=1, max_size=24))
    def test_mask_name(self, spark, names):
        df = spark.createDataFrame([(n,) for n in names], "v string")
        rows = df.select("v", mask_name("v").alias("m")).collect()
        for r in rows:
            v = r["v"]
            if v.strip() == "" or v == "[UNKNOWN]":
                continue  # guard passthrough
            assert r["m"] == v[0] + "***"

    @_SETTINGS
    @given(emails=st.lists(_EMAIL, min_size=1, max_size=24))
    def test_mask_email_keeps_domain(self, spark, emails):
        df = spark.createDataFrame([(e,) for e in emails], "v string")
        rows = df.select("v", mask_email("v").alias("m")).collect()
        for r in rows:
            local, domain = r["v"].split("@", 1)
            assert r["m"] == f"{local[0]}***@{domain}"

    @_SETTINGS
    @given(phones=st.lists(_PHONE, min_size=1, max_size=24))
    def test_mask_phone_keeps_last4(self, spark, phones):
        df = spark.createDataFrame([(p,) for p in phones], "v string")
        rows = df.select("v", mask_phone("v").alias("m")).collect()
        for r in rows:
            assert r["m"] == "***-***-" + r["v"][-4:]


class TestTokenCountProperty:
    @_SETTINGS
    @given(texts=st.lists(_TEXT, min_size=1, max_size=24))
    def test_whitespace_token_count(self, spark, texts):
        from data_quality_check_pipeline_spark.operators.text import (
            whitespace_token_count,
        )

        df = spark.createDataFrame([(t,) for t in texts], "text string")
        rows = df.select(
            "text", whitespace_token_count("text").alias("n")
        ).collect()
        for r in rows:
            assert r["n"] == len(r["text"].split()), repr(r["text"])


class TestContentDedupKeyProperty:
    @_SETTINGS
    @given(texts=st.lists(_TEXT, min_size=1, max_size=12))
    def test_key_invariant_under_case_and_whitespace(self, spark, texts):
        """The streaming content-dedup key must be identical for any two
        texts equal after lowercasing + whitespace normalization, and
        distinct otherwise; null/empty text keys on clip_id (never a
        shared key)."""
        import re as _re

        from data_quality_check_pipeline_spark.streaming.stream import (
            content_dedup_key,
        )

        rows = []
        for i, t in enumerate(texts):
            rows.append((f"a{i}", t))
            rows.append((f"b{i}", "  " + t.upper() + " "))  # same content
        rows += [("n1", None), ("n2", None), ("e1", ""), ("e2", "   ")]
        df = spark.createDataFrame(rows, "clip_id string, transcript string")
        keys = {
            r["clip_id"]: r["k"]
            for r in df.select(
                "clip_id", content_dedup_key().alias("k")
            ).collect()
        }

        def norm(t):
            return _re.sub(r"\s+", " ", t.lower().strip(), flags=_re.ASCII)

        for i, t in enumerate(texts):
            if norm(t):
                assert keys[f"a{i}"] == keys[f"b{i}"], repr(t)
            for j, u in enumerate(texts):
                if norm(t) and norm(u):
                    same = norm(t) == norm(u)
                    assert (keys[f"a{i}"] == keys[f"a{j}"]) == same
        # missing text: every row keys uniquely (on its own clip_id)
        missing = [
            k for cid, k in keys.items() if cid in ("n1", "n2", "e1", "e2")
        ]
        assert len(set(missing)) == 4
        assert all(k.startswith("id:") for k in missing)


# -- incremental-dedup invariants over generated corpora ---------------------

# small vocab on purpose: duplicates and near-dups must actually occur
_DOC = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "epsilon"]),
    min_size=0, max_size=6,
).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=1, max_size=14)
_SPLIT = st.integers(min_value=0, max_value=14)


class TestIncrementalInvariants:
    """The incremental==full contracts, under hypothesis-generated
    corpora instead of hand-planted ones: any split of any corpus into
    (history, new) must reproduce the full recompute exactly."""

    @given(docs=_CORPUS, split=_SPLIT)
    @_SETTINGS
    def test_exact_sequential_equals_full(self, spark, docs, split):
        from data_quality_check_pipeline_spark.operators.dedup import (
            dedup_exact,
            dedup_exact_incremental,
        )

        rows = [(i, t if t else None) for i, t in enumerate(docs)]
        split = min(split, len(rows))
        mk = lambda rs: spark.createDataFrame(  # noqa: E731
            rs, "doc_id long, text string"
        )
        hist_rows, new_rows = rows[:split], rows[split:]
        kept_ids: set = set()
        hashes = None
        for batch in (hist_rows, new_rows):
            if not batch:
                continue
            kept, h = dedup_exact_incremental(
                mk(batch), hashes, "doc_id", "text"
            )
            kept_ids |= {r["doc_id"] for r in kept.collect()}
            hashes = h if hashes is None else hashes.unionByName(h)
        full = {
            r["doc_id"]
            for r in dedup_exact(mk(rows), "doc_id", "text").collect()
        }
        assert kept_ids == full

    @given(docs=_CORPUS, split=_SPLIT)
    @_SETTINGS
    def test_minhash_incremental_equals_full(self, spark, docs, split):
        from data_quality_check_pipeline_spark.operators.dedup import (
            minhash_lsh_pairs,
            minhash_lsh_pairs_incremental,
            minhash_signatures,
        )

        rows = [(i, t) for i, t in enumerate(docs) if t]
        if not rows:
            return
        split = min(split, len(rows))
        mk = lambda rs: spark.createDataFrame(  # noqa: E731
            rs, "doc_id long, text string"
        )
        kw = dict(n_hashes=16, bands=4, shingle_k=1,
                  min_est_jaccard=0.5)
        ps = lambda df: {  # noqa: E731
            (r["id_a"], r["id_b"]) for r in df.collect()
        }
        full = ps(minhash_lsh_pairs(mk(rows), "doc_id", "text", **kw))
        hist_rows, new_rows = rows[:split], rows[split:]
        hist_pairs = (
            ps(minhash_lsh_pairs(mk(hist_rows), "doc_id", "text", **kw))
            if hist_rows else set()
        )
        if new_rows:
            hist_sigs = (
                minhash_signatures(
                    mk(hist_rows), "doc_id", "text", 16, 1
                ) if hist_rows else None
            )
            inc, _ = minhash_lsh_pairs_incremental(
                mk(new_rows), hist_sigs, "doc_id", "text", **kw
            )
            inc = ps(inc)
        else:
            inc = set()
        assert full == hist_pairs | inc

    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 12), st.integers(0, 12)),
            min_size=1, max_size=20,
        ),
        split=st.integers(0, 20),
    )
    @_SETTINGS
    def test_components_incremental_equals_full(self, spark, edges, split):
        from data_quality_check_pipeline_spark.operators.graph import (
            connected_components,
            connected_components_incremental,
        )

        split = min(split, len(edges))
        b1, b2 = edges[:split], edges[split:]
        mk = lambda es: spark.createDataFrame(  # noqa: E731
            es, "id_a long, id_b long"
        )
        full = {
            (r["node"], r["comp"])
            for r in connected_components(mk(edges)).collect()
        }
        if not b1:
            inc = connected_components_incremental(mk(b2), None)
        elif not b2:
            inc = connected_components(mk(b1))
        else:
            inc = connected_components_incremental(
                mk(b2), connected_components(mk(b1))
            )
        assert {
            (r["node"], r["comp"]) for r in inc.collect()
        } == full


class TestSamplingPackingProperties:
    """Hypothesis invariants for the deterministic sampling and packing
    operators: Spark decisions == the pure-Python re-derivation on
    arbitrary keys/rates/seeds, split stability under subsetting, and
    the greedy-packing fold vs a reference implementation on
    adversarial shapes (all-oversized, zeros, NULLs, many groups)."""

    @given(
        ids=st.lists(
            st.integers(min_value=-(10**12), max_value=10**12),
            min_size=1, max_size=50, unique=True,
        ),
        rate=st.floats(min_value=0.0, max_value=1.0),
        seed=st.integers(min_value=0, max_value=10**6),
    )
    @_SETTINGS
    def test_hash_sample_matches_python_for_any_rate_seed(
        self, spark, ids, rate, seed
    ):
        from data_quality_check_pipeline_spark.operators.sampling import (
            hash_sample,
        )
        from data_quality_check_pipeline_spark.oracle_hash import (
            spark_xxhash64,
        )

        df = spark.createDataFrame([(i,) for i in ids], "id long")
        got = {
            r["id"]
            for r in hash_sample(
                df.repartition(3), "id", rate, seed
            ).collect()
        }
        B = 1 << 20
        exp = {
            i for i in ids
            if (spark_xxhash64(i, seed) % B) / B < rate
        }
        assert got == exp

    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),      # group
                st.integers(min_value=0, max_value=10**6),  # order key
                st.one_of(
                    st.none(),
                    st.integers(min_value=0, max_value=2500),
                ),
            ),
            min_size=1, max_size=60,
            unique_by=lambda t: (t[0], t[1]),
        ),
        budget=st.integers(min_value=1, max_value=1000),
    )
    @_SETTINGS
    def test_packing_folds_match_python(self, spark, rows, budget):
        from data_quality_check_pipeline_spark.operators.packing import (
            pack_greedy,
            pack_stream_chunks,
        )

        df = spark.createDataFrame(
            [(f"g{g}", i, s) for g, i, s in rows],
            "g string, i long, sz int",
        )
        packed = pack_stream_chunks(df, "sz", budget, ["g"], ["i"])
        by_g: dict = {}
        for g, i, s in rows:
            by_g.setdefault(g, []).append((i, s or 0))
        exp_off = {}
        for g, items in by_g.items():
            off = 0
            for i, s in sorted(items):
                exp_off[(f"g{g}", i)] = (off, off // budget)
                off += s
        for r in packed.collect():
            assert (
                r["start_offset"], r["chunk_id"]
            ) == exp_off[(r["g"], r["i"])]
        greedy = pack_greedy(df, "sz", budget, ["g"], ["i"])
        exp_bin = {}
        for g, items in by_g.items():
            b, fill = 0, 0
            for i, s in sorted(items):
                if fill > 0 and fill + s > budget:
                    b, fill = b + 1, 0
                exp_bin[(f"g{g}", i)] = b
                fill += s
                if fill >= budget:
                    b, fill = b + 1, 0
        got_bin = {
            (r["g"], r["i"]): r["bin_id"] for r in greedy.collect()
        }
        assert got_bin == exp_bin

    @given(
        ids=st.lists(
            st.integers(min_value=0, max_value=10**9),
            min_size=2, max_size=40, unique=True,
        ),
        seed=st.integers(min_value=0, max_value=10**6),
        cut=st.integers(min_value=1, max_value=39),
    )
    @_SETTINGS
    def test_split_stable_under_any_subset(self, spark, ids, seed, cut):
        from data_quality_check_pipeline_spark.operators.sampling import (
            with_split,
        )

        fr = {"train": 0.7, "val": 0.2, "test": 0.1}
        df = spark.createDataFrame([(i,) for i in ids], "id long")
        full = {
            r["id"]: r["split"]
            for r in with_split(df, "id", fr, seed).collect()
        }
        subset_ids = ids[: min(cut, len(ids))]
        sub = {
            r["id"]: r["split"]
            for r in with_split(
                spark.createDataFrame(
                    [(i,) for i in subset_ids], "id long"
                ),
                "id", fr, seed,
            ).collect()
        }
        assert all(full[i] == s for i, s in sub.items())


class TestPruneSoundness:
    """Pure-Python property: file pruning must be SOUND. If
    `_file_may_match` says False, then NO row of the file could satisfy
    every predicate — under a deliberately GENEROUS row oracle (any
    type-uncertain comparison counts as "could match"). An unsound
    prune is silent data loss (the bare-string 'in' bug class); an
    over-kept file is merely slow. No Spark session: hundreds of
    examples run in milliseconds."""

    _DOM = {
        "int": st.integers(-1000, 1000),
        "float": st.floats(
            allow_nan=False, allow_infinity=False,
            min_value=-1e6, max_value=1e6,
        ),
        "str": st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=8,
        ),
        "date": st.dates(),
        "datetime": st.datetimes(),
        "bool": st.booleans(),
    }

    @staticmethod
    def _stats(cols: dict) -> dict:
        from data_quality_check_pipeline_spark.sources.tables import (
            _norm_stat_value,
        )

        stats = {}
        for col, vals in cols.items():
            nv = [_norm_stat_value(v) for v in vals if v is not None]
            if not nv or any(v is None for v in nv):
                continue  # all-null or non-comparable type: no stats
            stats[col] = [min(nv), max(nv)]
        return stats

    @staticmethod
    def _could_match(cols: dict, idx: int, prune: list) -> bool:
        """Generous row oracle: SQL three-valued logic for NULLs, and
        any cross-type comparison counts as 'could match'."""
        from data_quality_check_pipeline_spark.sources.tables import (
            _norm_stat_value,
        )

        def comparable(a, b):
            num = (int, float)
            return (isinstance(a, num) and isinstance(b, num)) or (
                isinstance(a, str) and isinstance(b, str)
            )

        for col, op, val in prune:
            if col not in cols:
                continue  # unknown column: engine-side behavior unknown
            rv = cols[col][idx]
            if rv is None:
                return False  # NULL satisfies no predicate
            nrv = _norm_stat_value(rv)
            if nrv is None:
                continue  # non-comparable column type: uncertain
            if op == "in":
                items = [val] if isinstance(val, (str, bytes)) else list(val)
                hit = False
                for x in items:
                    nx = _norm_stat_value(x)
                    if nx is None:
                        continue
                    if not comparable(nrv, nx) or nrv == nx:
                        hit = True
                        break
                if not hit:
                    return False
                continue
            nval = _norm_stat_value(val)
            if nval is None:
                continue  # un-normalizable predicate value: uncertain
            if not comparable(nrv, nval):
                continue
            ok = {
                "=": nrv == nval,
                "<": nrv < nval,
                "<=": nrv <= nval,
                ">": nrv > nval,
                ">=": nrv >= nval,
            }[op]
            if not ok:
                return False
        return True

    @given(data=st.data())
    @settings(max_examples=300, deadline=None)
    def test_never_prunes_a_possibly_matching_row(self, data):
        from data_quality_check_pipeline_spark.sources.tables import (
            _file_may_match,
        )

        dom_names = list(self._DOM)
        n_cols = data.draw(st.integers(1, 4), label="n_cols")
        n_rows = data.draw(st.integers(1, 8), label="n_rows")
        cols = {}
        col_dom = {}
        for c in range(n_cols):
            name = f"c{c}"
            dom = data.draw(st.sampled_from(dom_names), label=f"dom_{name}")
            col_dom[name] = dom
            cols[name] = data.draw(
                st.lists(
                    st.one_of(st.none(), self._DOM[dom]),
                    min_size=n_rows, max_size=n_rows,
                ),
                label=f"vals_{name}",
            )

        n_preds = data.draw(st.integers(1, 4), label="n_preds")
        prune = []
        for p in range(n_preds):
            # mostly real columns, sometimes an unknown one
            col = data.draw(
                st.sampled_from(list(cols) + ["ghost"]), label=f"pcol_{p}"
            )
            # mostly the column's own domain, sometimes a mismatched one
            dom = data.draw(
                st.sampled_from(
                    [col_dom.get(col, "int")] * 3 + dom_names
                ),
                label=f"pdom_{p}",
            )
            op = data.draw(
                st.sampled_from(["=", "<", "<=", ">", ">=", "in"]),
                label=f"op_{p}",
            )
            if op == "in":
                bare = dom == "str" and data.draw(
                    st.booleans(), label=f"bare_{p}"
                )
                val = (
                    data.draw(self._DOM["str"], label=f"v_{p}")
                    if bare
                    else data.draw(
                        st.lists(self._DOM[dom], max_size=3),
                        label=f"v_{p}",
                    )
                )
            else:
                val = data.draw(self._DOM[dom], label=f"v_{p}")
            prune.append((col, op, val))

        if not _file_may_match(self._stats(cols), prune):
            survivors = [
                i
                for i in range(n_rows)
                if self._could_match(cols, i, prune)
            ]
            assert survivors == [], (
                f"pruned a file holding possibly-matching rows "
                f"{survivors}: cols={cols} prune={prune}"
            )
