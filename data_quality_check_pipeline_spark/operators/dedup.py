"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's exact duplicate check (validator.py:76-82 on the id
column), this module implements the standard near-dup stack, all Spark-first:

* exact dedup           — hash groupBy, deterministic survivor
* MinHash + LSH         — shingle -> n minhashes -> banded bucket join
* SimHash               — 64-bit token-hash sign aggregate + chunk banding
* n-gram Jaccard        — inverted-index self-join (exact verify)

Scale notes: every candidate-pair generator works through an equi-join on a
bucket key (banded signatures / shared n-gram), never a cross join. Exact
verification only touches candidate pairs. All hashing is xxhash64 JVM-side;
no Python in any hot path.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.colmemo import memo_cols
from ..functions.exprs import norm_text

_log = logging.getLogger("clip_quality.dedup")


def _drop_hot_groups(
    df: DataFrame,
    keys: list[str],
    cap: int | None,
    what: str,
    stats_out: dict | None = None,
    max_inline_keys: int = 10_000,
) -> DataFrame:
    """Bound candidate-bucket size before a self-join: remove every row
    whose ``keys`` group holds more than ``cap`` rows.

    The 100-TB rationale: a degenerate bucket (a boilerplate shingle, an
    all-zero band hash over empty-ish docs) turns the downstream equi-self-
    join quadratic INSIDE that bucket — cap² candidate pairs from one key.
    Dropping the group loses only pairs whose every shared key is that hot
    (for LSH, pairs still collide through their other bands), which is the
    standard stop-shingle / hot-bucket tradeoff.

    Shape: one groupBy over the keys (map-side partial counts; shuffle =
    distinct keys only) -> the over-cap key set, tiny by construction,
    is COLLECTED to the driver (drops are logged — no silent truncation;
    the count also lands in ``stats_out`` when given) and removed with a
    literal IN-set filter pushed into the candidate scan — no join, no
    cached dataset pinned for the session, and the (expensive upstream)
    ``df`` subtree is never re-evaluated to resolve the hot keys. If the
    over-cap key set is itself pathological (> ``max_inline_keys``,
    i.e. the corpus is mostly degenerate buckets), fall back to a
    left_anti join so the plan literal stays bounded.
    """
    if cap is None:
        return df
    # null-safe composite key encoding. BOTH sides of the comparison go
    # through this SAME Spark expression (the hot set is collected
    # ALREADY ENCODED by Spark's cast, never re-encoded by Python str(),
    # which diverges for bool/float/timestamp keys — 'True' vs 'true',
    # repr vs scientific notation — and would silently fail the filter
    # open). concat_ws SKIPS nulls, which could alias key tuples —
    # coalesce to a sentinel prevents it.
    sep, null_tag = "\x1f", "\x00NULL"
    enc = F.concat_ws(
        sep,
        *[
            F.coalesce(F.col(k).cast("string"), F.lit(null_tag))
            for k in keys
        ],
    )
    hot = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > cap)
        .select(enc.alias("_enc"))
    )
    hot_set = [
        r["_enc"] for r in hot.limit(max_inline_keys + 1).collect()
    ]
    n_hot = len(hot_set)
    if n_hot > max_inline_keys:
        n_hot = hot.count()  # exact figure for the log (rare path)
    if stats_out is not None:
        stats_out[what] = n_hot
    if n_hot == 0:
        return df
    _log.warning(
        "%s: dropping %d group(s) larger than cap=%d from candidate "
        "generation (recall tradeoff, bounded join)",
        what, n_hot, cap,
    )
    if n_hot > max_inline_keys:
        # anti-join on the null-safe _enc encoding, NOT the raw key tuple:
        # a plain equi-join never matches NULL keys, so a hot group whose
        # key contains NULL would survive — the bounded-join guarantee
        # would fail in exactly the degenerate case the guard exists for.
        return (
            df.withColumn("_enc", enc)
            .join(hot.select("_enc"), "_enc", "left_anti")
            .drop("_enc")
        )
    return df.filter(~enc.isin(hot_set))

# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


def exact_dups(
    df: DataFrame, id_col: str, text_col: str, normalized: bool = True
) -> DataFrame:
    """Groups of rows with identical (normalized) text: returns
    (text_hash, n, ids) for groups with n > 1.

    NULL text is MISSING data, not duplicate evidence — xxhash64(NULL)
    is a seed constant, so without the filter every null-text row would
    collapse into one giant 'duplicate' group."""
    t = norm_text(F.lower(F.col(text_col))) if normalized else F.col(text_col)
    return (
        df.filter(t.isNotNull())
        .select(F.col(id_col), F.xxhash64(t).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sort_array(F.collect_list(id_col)).alias("ids"),
        )
        .filter(F.col("n") > 1)
    )


def _argmax_quality(id_expr, quality_col: str):
    """min_by ordering key that keeps the HIGHEST-quality member, ties
    broken on MIN id — one aggregate, no window sort over the corpus.
    NULL quality coalesces to -inf so it always loses to a scored row;
    the id tie-break keeps the choice deterministic across retries."""
    nq = -F.coalesce(F.col(quality_col).cast("double"),
                     F.lit(float("-inf")))
    return F.min_by(id_expr, F.struct(nq.alias("_nq"), id_expr.alias("_i")))


def content_hash_expr(text_col: str):
    """The text-identity hash whose values populate the exact-dedup
    content_hash_history table: xxhash64 over the lowercased,
    whitespace-normalized text. dedup_exact / dedup_exact_incremental
    and the takedown purge/block paths (takedown.py) MUST all derive
    hashes through this one expression — a drift here would purge or
    block the wrong history rows. NULL text hashes to NULL (callers
    treat missing text as not-duplicate-evidence)."""
    t = norm_text(F.lower(F.col(text_col)))
    return F.when(t.isNotNull(), F.xxhash64(t))


def dedup_exact(
    df: DataFrame, id_col: str, text_col: str,
    quality_col: str | None = None,
) -> DataFrame:
    """Keep one deterministic survivor per exact text group. Implemented
    as an argmin/argmax aggregate + semi-join — no window sort over the
    full corpus.

    Default policy: min id. With ``quality_col`` (numeric), the
    survivor is the group's BEST-quality member instead — the
    production policy for training-data dedup, where a dup cluster
    should keep its longest/highest-scoring copy, not whichever was
    ingested first. Ties (exact dups often score identically) break on
    min id; NULL quality ranks lowest.

    Rows with NULL text all SURVIVE: missing text is not evidence of
    shared content (xxhash64(NULL) is a constant — grouping on it would
    silently discard all-but-one of every null-text row)."""
    h = content_hash_expr(text_col)
    cols = [F.col(id_col).alias("_id"), h.alias("_h"),
            h.isNull().alias("_null")]
    if quality_col is not None:
        cols.append(F.col(quality_col))
    keyed = df.select(*cols)
    pick = (
        F.min("_id") if quality_col is None
        else _argmax_quality(F.col("_id"), quality_col)
    ).alias(id_col)
    survivors = (
        keyed.filter(~F.col("_null"))
        .groupBy("_h")
        .agg(pick)
        .select(id_col)
        .unionByName(keyed.filter("_null").select(
            F.col("_id").alias(id_col)))
    )
    return df.join(survivors, on=id_col, how="left_semi")


def dedup_exact_incremental(
    new_df: DataFrame, history_hashes: DataFrame | None,
    id_col: str, text_col: str,
    quality_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Incremental exact dedup: keep the NEW rows whose (normalized)
    text hash has never been retained before — the 100-TB ingest shape,
    where each arriving shard drops copies of anything already in the
    corpus via one hash anti-join instead of re-grouping all text ever
    seen. Returns ``(kept, kept_hashes)``: the surviving subset of
    ``new_df`` (original columns), and its (text_hash) frame — append
    kept_hashes to the history table after the run commits, so history
    always holds exactly the retained corpus's hashes (8 bytes/doc).

    Sequential-equals-full (tested): with the default min-id policy and
    ids assigned in ingest order, feeding batches B1..Bn through this
    function retains exactly ``dedup_exact(B1 ∪ … ∪ Bn)``. With
    ``quality_col`` the within-batch survivor is the batch's best copy,
    but the cross-run policy is necessarily GREEDY: an earlier batch's
    survivor is never displaced by a later higher-quality copy (history
    stores hashes, not scores) — the standard streaming-ingest
    tradeoff; run a periodic full ``dedup_exact`` compaction when
    global argmax semantics matter.

    NULL-text rows all survive and contribute no hash (missing text is
    not duplicate evidence — dedup_exact's rule)."""
    h = content_hash_expr(text_col)
    keyed = new_df.select(
        F.col(id_col).alias("_id"),
        h.alias("_h"),
        h.isNull().alias("_null"),
        *([F.col(quality_col)] if quality_col is not None else []),
    )
    pick = (
        F.min("_id") if quality_col is None
        else _argmax_quality(F.col("_id"), quality_col)
    ).alias(id_col)
    batch_surv = keyed.filter(~F.col("_null")).groupBy("_h").agg(pick)
    if history_hashes is not None:
        batch_surv = batch_surv.join(
            history_hashes.select(F.col("text_hash").alias("_h")),
            "_h", "left_anti",
        )
    kept_ids = batch_surv.select(id_col).unionByName(
        keyed.filter("_null").select(F.col("_id").alias(id_col))
    )
    kept = new_df.join(kept_ids, on=id_col, how="left_semi")
    kept_hashes = batch_surv.select(F.col("_h").alias("text_hash"))
    return kept, kept_hashes


# ---------------------------------------------------------------------------
# shingles + MinHash/LSH
# ---------------------------------------------------------------------------


def _shingle_expr(text_col: str, k: int):
    """Distinct word k-shingles as an array column (JVM-side). A document
    shorter than ``k`` tokens contributes its WHOLE token sequence as one
    shingle (mirroring the minhash fallback) — using just the first token
    would give Jaccard 1.0 to any two short docs sharing a first word."""
    toks = F.split(norm_text(F.lower(F.col(text_col))), " ")
    n = F.array_size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))
    )
    # null text -> null array (explode() then drops the row entirely):
    # a doc with MISSING text has no shingles and joins no candidate pair
    return F.when(
        toks.isNotNull(),
        F.array_distinct(
            F.when(n >= k, sh).otherwise(F.array(F.concat_ws(" ", toks)))
        ),
    )


@memo_cols
def _shingle_hash_expr(text_col: str, k: int):
    """Distinct word k-shingles as an array of 64-bit hashes (JVM-side):
    xxhash64 over the token-array slice directly — no concat_ws string
    build, and everything downstream (explode, groupBy, join keys)
    carries 8-byte longs instead of shingle strings (guide §2.3:
    shuffle fewer bytes; measured ~20% faster on the minhash path).
    Same structure as :func:`_shingle_expr` — short docs contribute
    their whole token sequence as one shingle, null text -> null array
    (explode drops the doc: xxhash64(NULL) is a constant, which would
    otherwise alias every null-text doc)."""
    toks = F.split(norm_text(F.lower(F.col(text_col))), " ")
    n = F.array_size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(
        toks.isNotNull(),
        F.array_distinct(
            F.when(
                n >= k,
                F.transform(
                    idx,
                    lambda i: F.xxhash64(F.slice(toks, i + 1, k)),
                ),
            ).otherwise(F.array(F.xxhash64(toks)))
        ),
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str,
    n_hashes: int = 32, shingle_k: int = 3,
) -> DataFrame:
    """(id, sig: array<bigint>) — n_hashes minima over xxhash64(shingle, i).

    One explode + one groupBy with n_hashes min-aggregates: partial (map-
    side) mins shrink the shuffle to n_hashes longs per doc.

    Each distinct shingle is hashed ONCE (``_shingle_hash_expr``) and the
    n_hashes family is derived from that 64-bit base via xxhash64(base, i).
    """
    sh_hashes = _shingle_hash_expr(text_col, shingle_k)
    exploded = df.select(F.col(id_col), F.explode(sh_hashes).alias("_sh"))
    mins, sig = _minhash_agg_exprs(n_hashes)
    agg = exploded.groupBy(id_col).agg(*mins)
    return agg.select(F.col(id_col), sig)


@memo_cols
def _minhash_agg_exprs(n_hashes: int):
    """(min-aggregates, sig-array reconstruct) for minhash_signatures —
    static per n_hashes, session-memoized (the 32-agg family costs ~130
    py4j round trips per build, r06)."""
    mins = [
        F.min(F.xxhash64(F.col("_sh"), F.lit(i))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    sig = F.array(
        *[F.col(f"h{i}") for i in range(n_hashes)]
    ).alias("sig")
    return mins, sig


def minhash_lsh_pairs(
    df: DataFrame, id_col: str, text_col: str,
    n_hashes: int = 32, bands: int = 8, shingle_k: int = 3,
    min_est_jaccard: float = 0.7,
    max_bucket: int | None = 10_000,
    stats_out: dict | None = None,
    persist_sigs: bool = True,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH, scored by signature
    agreement (unbiased Jaccard estimate). Returns (id_a, id_b, est_jaccard)
    with id_a < id_b.

    Pair generation is an equi-join on (band index, band hash) — never a
    cross join. Degenerate band buckets (near-identical boilerplate /
    empty-ish docs hashing to one band value) are BOUNDED: any
    (band, band_hash) bucket holding more than ``max_bucket`` docs is
    dropped from candidate generation before the self-join, with the drop
    count logged and reported via ``stats_out`` (key 'hot_band_buckets') —
    see _drop_hot_groups. Pairs inside a dropped bucket still surface
    through their other bands unless degenerate in ALL bands (true spam
    clusters, which belong to exact dedup). max_bucket=None disables.

    ``persist_sigs`` (default on) caches the signature frame
    (MEMORY_AND_DISK): the banding stage references it ~3x (hot-bucket
    pre-pass + both self-join sides), and without the cache the
    shingle-explode + n_hashes-min aggregation reruns each time. The
    cached frame is (id, n_hashes longs) — far smaller than the text
    it came from; it stays cached for the session. Pass False for a
    pure plan, or materialize minhash_signatures to a table yourself
    at extreme scale.
    """
    if not 1 <= bands <= n_hashes or n_hashes % bands:
        # bands > n_hashes would make every band hash the constant
        # xxhash64('') (one giant bucket -> quadratic join or, with the
        # hot-bucket cap, zero pairs); a non-divisor would silently
        # exclude the trailing signature hashes from banding
        raise ValueError(
            f"bands must divide n_hashes (got bands={bands}, "
            f"n_hashes={n_hashes})"
        )
    rows = n_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, n_hashes, shingle_k)
    if persist_sigs:
        from pyspark import StorageLevel

        sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
    banded = _minhash_banded(sigs, id_col, n_hashes, bands)
    banded = _drop_hot_groups(
        banded, ["band", "band_hash"], max_bucket,
        "hot_band_buckets", stats_out,
    )
    left = banded.select(
        F.col(id_col).alias("id_a"),
        F.col("sig").alias("sig_a"),
        "band",
        "band_hash",
    )
    right = banded.select(
        F.col(id_col).alias("id_b"),
        F.col("sig").alias("sig_b"),
        "band",
        "band_hash",
    )
    # Score and threshold BEFORE the dedup shuffle: a pair colliding in
    # several bands recomputes the (cheap, codegen'd) zip_with once per
    # collision, but the distinct exchange then carries 24-byte
    # (id_a, id_b, est) rows instead of two full n_hashes-long signature
    # arrays (~22x smaller here), and sub-threshold candidates never
    # enter the shuffle at all. est is deterministic per pair, so
    # distinct over the projected triple collapses band duplicates
    # exactly as the old sig-carrying distinct did. (r02 review item.)
    return (
        left.join(right, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            _sig_agreement(n_hashes).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= min_est_jaccard)
        .distinct()
    )


def _minhash_banded(
    sigs: DataFrame, id_col: str, n_hashes: int, bands: int
) -> DataFrame:
    """Explode a (id, sig) frame into (id, sig, band, band_hash) rows —
    one per band. Pure map-side (no shuffle): each band hash is
    xxhash64 over that band's slice of the signature, salted by the
    band index so identical slices in DIFFERENT bands never bucket
    together. Shared by the full and the incremental candidate
    generators so the two band identically (the incremental-equals-full
    equivalence depends on it). Extra columns on ``sigs`` are carried
    through untouched."""
    rows = n_hashes // bands
    return sigs.select(
        "*",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            *[
                                F.col("sig")[b * rows + r].cast("string")
                                for r in range(rows)
                            ],
                        ),
                        F.lit(b),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    )


def _sig_agreement(n_hashes: int):
    """Fraction of agreeing signature positions between sig_a and sig_b
    (the unbiased Jaccard estimate)."""
    return (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda a, b: a == b),
                lambda x: x,
            )
        ).cast("double")
        / F.lit(float(n_hashes))
    )


def minhash_lsh_pairs_incremental(
    new_df: DataFrame, history_sigs: DataFrame | None,
    id_col: str, text_col: str,
    n_hashes: int = 32, bands: int = 8, shingle_k: int = 3,
    min_est_jaccard: float = 0.7,
    max_bucket: int | None = 10_000,
    stats_out: dict | None = None,
    persist_sigs: bool = True,
    keep_flags: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Incremental cross-run near-dup mining: candidate pairs where at
    least ONE side is a NEW document, against a persisted signature
    history — the 100-TB shape, where each arriving shard dedups
    against everything already ingested WITHOUT re-mining the corpus.
    Returns ``(pairs, new_sigs)``: score-thresholded (id_a, id_b,
    est_jaccard) pairs (new-vs-new AND new-vs-history), and the new
    batch's (id, sig) frame for the caller to append to the history
    table after the run commits (see incremental_minhash_run).

    Equivalence guarantee (tested): with identical parameters,
    ``full_pairs(history ∪ new) == full_pairs(history) ∪
    incremental_pairs(new, sigs(history))`` — exactly, whenever the
    hot-bucket cap does not fire. Banding and capping run over the
    UNION of history and new signatures, so every new-involving pair
    sees exactly the bucket bounds a full recompute would; when a
    bucket grows past the cap ACROSS runs, the accumulated pair set is
    a SUPERSET of a capped full recompute (pairs legitimately found
    while the bucket was still small are kept, not retroactively
    dropped) and never misses anything the full recompute would find.
    Only the raw-text stage (shingle explode + n_hashes min-aggs, the
    expensive part) is skipped for history rows: re-banding a history
    signature is one codegen'd projection over 8·n_hashes bytes/doc.

    ``history_sigs`` must hold (id_col, sig: array<bigint>) rows
    produced by minhash_signatures WITH THE SAME n_hashes/shingle_k
    (signatures from different parameters silently estimate garbage).
    ids in ``new_df`` must be disjoint from history — replaying an
    already-ingested batch belongs to the caller's idempotency layer
    (TableStore source fingerprints), not here. ``history_sigs=None``
    degrades to a first-run full mine over new_df alone.

    ``keep_flags=True`` appends boolean ``new_a``/``new_b`` columns so a
    caller can tell WHICH side of a pair is the new arrival (the
    streaming near-dup sink quarantines the new side of a new-vs-history
    pair; id order alone cannot tell). Flags are deterministic per pair,
    so the band-dedup distinct is unaffected."""
    new_sigs = minhash_signatures(
        new_df, id_col, text_col, n_hashes, shingle_k
    )
    if persist_sigs:
        from pyspark import StorageLevel

        new_sigs = new_sigs.persist(StorageLevel.MEMORY_AND_DISK)
    tagged = new_sigs.withColumn("_new", F.lit(True))
    if history_sigs is not None:
        tagged = (
            history_sigs.select(F.col(id_col), "sig")
            .withColumn("_new", F.lit(False))
            .unionByName(tagged)
        )
    banded = _minhash_banded(tagged, id_col, n_hashes, bands)
    banded = _drop_hot_groups(
        banded, ["band", "band_hash"], max_bucket,
        "hot_band_buckets", stats_out,
    )
    left = banded.select(
        F.col(id_col).alias("id_a"),
        F.col("sig").alias("sig_a"),
        F.col("_new").alias("_new_a"),
        "band",
        "band_hash",
    )
    right = banded.select(
        F.col(id_col).alias("id_b"),
        F.col("sig").alias("sig_b"),
        F.col("_new").alias("_new_b"),
        "band",
        "band_hash",
    )
    out_cols = [
        F.col("id_a"), F.col("id_b"),
        _sig_agreement(n_hashes).alias("est_jaccard"),
    ]
    if keep_flags:
        out_cols += [
            F.col("_new_a").alias("new_a"),
            F.col("_new_b").alias("new_b"),
        ]
    pairs = (
        left.join(right, ["band", "band_hash"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("_new_a") | F.col("_new_b"))
        )
        .select(*out_cols)
        .filter(F.col("est_jaccard") >= min_est_jaccard)
        .distinct()
    )
    return pairs, new_sigs


def _incremental_run(
    store, table: str, new_df: DataFrame, miner,
    source_fingerprint: str | None, what: str,
) -> DataFrame | None:
    """One ingest round against a TableStore-backed signature history:
    read the current history snapshot, run ``miner(new_df, history) ->
    (result, new_sigs)``, materialize the result, then append the new
    signatures as the next snapshot. Returns the result DataFrame, or
    None when ``source_fingerprint`` matches the table's last commit
    (an exact replay of an already-ingested batch — ids would collide
    with history, so the run is skipped idempotently; pass None to
    disable).

    The sig append commits AFTER the result is materialized from the
    PRE-append snapshot, so a crash mid-run re-mines the same batch
    against the same history next time — at-least-once with the
    fingerprint guard upgrading replays to exactly-once. Shared by the
    minhash / simhash / audio / exact incremental run wrappers."""
    if source_fingerprint is not None and store.exists(table) and (
        store.is_unchanged(table, source_fingerprint)
    ):
        _log.info(
            "%s(%s): source fingerprint unchanged — batch already "
            "ingested, skipping", what, table,
        )
        return None
    history = store.read(table) if store.exists(table) else None
    result, new_sigs = miner(new_df, history)
    # materialize BEFORE committing the sigs: once the append lands, a
    # re-run would see the batch's own sigs as 'history'
    result = result.cache()
    result.count()
    store.write(
        table, new_sigs, mode="append",
        properties=(
            {"source_fingerprint": source_fingerprint}
            if source_fingerprint is not None else None
        ),
    )
    return result


def incremental_minhash_run(
    store, table: str, new_df: DataFrame,
    id_col: str, text_col: str,
    source_fingerprint: str | None = None,
    **kwargs,
) -> DataFrame | None:
    """MinHash ingest round (see _incremental_run for the commit
    protocol): history table holds (id_col, sig) rows; returns the
    new-involving pair set, or None on a fingerprint-replay skip."""
    return _incremental_run(
        store, table, new_df,
        lambda new, hist: minhash_lsh_pairs_incremental(
            new, hist, id_col, text_col, **kwargs
        ),
        source_fingerprint, "incremental_minhash_run",
    )


def incremental_simhash_run(
    store, table: str, new_df: DataFrame,
    id_col: str, text_col: str,
    source_fingerprint: str | None = None,
    **kwargs,
) -> DataFrame | None:
    """SimHash ingest round (see _incremental_run): history table holds
    (id_col, simhash) rows; returns the new-involving pair set."""
    return _incremental_run(
        store, table, new_df,
        lambda new, hist: simhash_pairs_incremental(
            new, hist, id_col, text_col, **kwargs
        ),
        source_fingerprint, "incremental_simhash_run",
    )


def incremental_audio_run(
    store, table: str, new_df: DataFrame,
    id_col: str = "clip_id",
    source_fingerprint: str | None = None,
    **kwargs,
) -> DataFrame | None:
    """Audio-fingerprint ingest round (see _incremental_run): history
    table holds (id_col, audio_fp) rows — 16 bytes/clip, never the
    payloads; returns the new-involving clip pair set."""
    return _incremental_run(
        store, table, new_df,
        lambda new, hist: audio_near_dup_pairs_incremental(
            new, hist, id_col, **kwargs
        ),
        source_fingerprint, "incremental_audio_run",
    )


def incremental_dedup_exact_run(
    store, table: str, new_df: DataFrame,
    id_col: str, text_col: str,
    source_fingerprint: str | None = None,
    **kwargs,
) -> DataFrame | None:
    """Exact-dedup ingest round (see _incremental_run): history table
    holds (text_hash) rows of everything RETAINED so far; returns the
    kept subset of ``new_df`` (whose hashes were appended), or None on
    a fingerprint-replay skip."""
    return _incremental_run(
        store, table, new_df,
        lambda new, hist: dedup_exact_incremental(
            new, hist, id_col, text_col, **kwargs
        ),
        source_fingerprint, "incremental_dedup_exact_run",
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, bits: int = 64
) -> DataFrame:
    """(id, simhash: bigint): sign-sum of token hashes per bit position.

    One explode + one groupBy with ``bits`` sum-aggregates (map-side
    combine); bit extraction via shiftright/&1 stays JVM-side.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(F.split(norm_text(F.lower(F.col(text_col))), " "))
        ).alias("_t"),
    ).withColumn("_h", F.xxhash64("_t"))
    sums, sig = _simhash_agg_exprs(bits)
    agg = toks.groupBy(id_col).agg(*sums)
    return agg.select(F.col(id_col), sig)


@memo_cols
def _simhash_agg_exprs(bits: int):
    """(sign-sum aggregates, signature reconstruct) for
    simhash_signatures — static per bits, session-memoized (the 64-agg
    family plus the 64-term reconstruct cost ~0.2 s of py4j build per
    call, r06)."""
    sums = [
        F.sum(
            (F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    sig = None
    for b in range(bits):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1)).otherwise(F.lit(0))
        term = F.shiftleft(bit.cast("long"), b)
        sig = term if sig is None else sig.bitwiseOR(term)
    return sums, sig.alias("simhash")


def _check_hamming_params(
    max_hamming: int, chunks: int, allow_partial_recall: bool
) -> None:
    """Shared parameter validation for the hamming-banding family."""
    if 64 % chunks:
        raise ValueError(f"chunks must divide 64 (got {chunks})")
    if max_hamming > chunks - 1 and not allow_partial_recall:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the pigeonhole recall "
            f"guarantee of chunks-1={chunks - 1}: pairs differing in "
            f"{chunks}..{max_hamming} bits spread across all chunks "
            "would be silently missed. Raise chunks, lower max_hamming, "
            "or pass allow_partial_recall=True to accept approximate "
            "recall."
        )


def _hamming_chunked(sigs: DataFrame, sig_col: str, chunks: int) -> DataFrame:
    """Explode a signature frame into one row per (chunk_idx, chunk_val)
    bit-chunk of ``sig_col``. Pure map-side (no shuffle). Shared by the
    full and the incremental hamming candidate generators so the two
    band identically — the incremental-equals-full equivalence depends
    on it (same argument as _minhash_banded). Extra columns on ``sigs``
    are carried through untouched."""
    return sigs.select("*", _chunk_explode_expr(sig_col, chunks))


@memo_cols
def _chunk_explode_expr(sig_col: str, chunks: int):
    width = 64 // chunks
    mask = (1 << width) - 1
    return F.posexplode(
        F.array(
            *[
                F.shiftright(F.col(sig_col), i * width)
                .bitwiseAND(F.lit(mask))
                for i in range(chunks)
            ]
        )
    ).alias("chunk_idx", "chunk_val")


def hamming_band_pairs(
    sigs: DataFrame, id_col: str, sig_col: str,
    max_hamming: int = 3, chunks: int = 4,
    max_bucket: int | None = 10_000,
    stats_out: dict | None = None,
    allow_partial_recall: bool = False,
) -> DataFrame:
    """Near-dup pairs over any 64-bit signature column: banding on
    ``chunks`` equal bit-chunks (pigeonhole: any pair with hamming <
    chunks shares >= 1 exact chunk), then exact hamming verify via
    bit_count(xor). Shared by text SimHash and the audio fingerprint.

    Tradeoff: more chunks -> stronger recall guarantee (hamming <=
    chunks-1) but shorter chunk keys -> bigger candidate buckets. chunks
    must divide 64; 4 (16-bit keys) suits dedup at scale, 8 (8-bit keys)
    only for small corpora or as a second LSH pass.

    Any (chunk_idx, chunk_val) bucket with more than ``max_bucket``
    signatures is dropped before the self-join (drop count logged +
    reported via ``stats_out`` key 'hot_chunk_buckets'; see
    _drop_hot_groups) — a degenerate chunk value (e.g. a common all-zero
    16-bit span) would otherwise make the join quadratic in that bucket.
    Pairs in a dropped bucket still pair through their other chunks when
    hamming < chunks-1 holds over the remaining spans. max_bucket=None
    disables.

    ``max_hamming > chunks - 1`` exceeds the pigeonhole guarantee: a
    pair can differ in <= max_hamming bits spread across EVERY chunk and
    never share a band — a systematic false negative in exactly the
    hamming range the threshold advertises. That combination raises
    unless ``allow_partial_recall=True`` (a deliberate approximate mode,
    e.g. as a cheap first pass before an exact verify)."""
    _check_hamming_params(max_hamming, chunks, allow_partial_recall)
    chunked = _hamming_chunked(
        sigs.select(F.col(id_col), F.col(sig_col).alias("_sig")),
        "_sig", chunks,
    )
    chunked = _drop_hot_groups(
        chunked, ["chunk_idx", "chunk_val"], max_bucket,
        "hot_chunk_buckets", stats_out,
    )
    a = chunked.select(
        F.col(id_col).alias("id_a"), F.col("_sig").alias("sh_a"),
        "chunk_idx", "chunk_val",
    )
    b = chunked.select(
        F.col(id_col).alias("id_b"), F.col("_sig").alias("sh_b"),
        "chunk_idx", "chunk_val",
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    # hamming + threshold BEFORE the dedup shuffle (same rationale as
    # minhash_lsh_pairs): the distinct exchange carries (id_a, id_b,
    # hamming) only, and pairs over max_hamming never enter it
    return (
        a.join(b, ["chunk_idx", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
        .select("id_a", "id_b", "hamming")
    )


def hamming_band_pairs_incremental(
    new_sigs: DataFrame, history_sigs: DataFrame | None,
    id_col: str, sig_col: str,
    max_hamming: int = 3, chunks: int = 4,
    max_bucket: int | None = 10_000,
    stats_out: dict | None = None,
    allow_partial_recall: bool = False,
    keep_flags: bool = False,
) -> DataFrame:
    """Incremental cross-run hamming mining over any 64-bit signature
    column: candidate pairs where at least ONE side is NEW, against a
    persisted signature history — the 100-TB shape shared by text
    SimHash and the audio fingerprint (each arriving shard dedups
    against everything already ingested without recomputing history
    signatures; re-banding a history signature is one codegen'd
    projection over 8 bytes/row).

    Equivalence guarantee (tested, same argument as
    minhash_lsh_pairs_incremental): with identical parameters,
    ``full_pairs(history ∪ new) == full_pairs(history) ∪
    incremental_pairs(new, history)`` exactly whenever the hot-bucket
    cap does not fire; banding and capping run over the UNION so every
    new-involving pair sees the bucket bounds a full recompute would,
    and cross-run cap growth only ever yields a SUPERSET of the capped
    full recompute (pairs found while a bucket was still small are
    kept), never a miss relative to it.

    ``history_sigs`` must hold (id_col, sig_col) rows produced by the
    SAME signature function; ids in ``new_sigs`` must be disjoint from
    history (replay idempotency belongs to the caller's TableStore
    fingerprint layer). ``history_sigs=None`` degrades to a first-run
    full mine. ``keep_flags=True`` appends boolean new_a/new_b columns
    so callers can tell which side is the new arrival."""
    _check_hamming_params(max_hamming, chunks, allow_partial_recall)
    tagged = new_sigs.select(
        F.col(id_col), F.col(sig_col).alias("_sig")
    ).withColumn("_new", F.lit(True))
    if history_sigs is not None:
        tagged = (
            history_sigs.select(F.col(id_col), F.col(sig_col).alias("_sig"))
            .withColumn("_new", F.lit(False))
            .unionByName(tagged)
        )
    chunked = _hamming_chunked(tagged, "_sig", chunks)
    chunked = _drop_hot_groups(
        chunked, ["chunk_idx", "chunk_val"], max_bucket,
        "hot_chunk_buckets", stats_out,
    )
    a = chunked.select(
        F.col(id_col).alias("id_a"), F.col("_sig").alias("sh_a"),
        F.col("_new").alias("_new_a"), "chunk_idx", "chunk_val",
    )
    b = chunked.select(
        F.col(id_col).alias("id_b"), F.col("_sig").alias("sh_b"),
        F.col("_new").alias("_new_b"), "chunk_idx", "chunk_val",
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    out_cols = ["id_a", "id_b", hamming.alias("hamming")]
    if keep_flags:
        out_cols += [
            F.col("_new_a").alias("new_a"),
            F.col("_new_b").alias("new_b"),
        ]
    return (
        a.join(b, ["chunk_idx", "chunk_val"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("_new_a") | F.col("_new_b"))
        )
        .select(*out_cols)
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str,
    max_hamming: int = 3, chunks: int = 4,
    max_bucket: int | None = 10_000,
    stats_out: dict | None = None,
    allow_partial_recall: bool = False,
    persist_sigs: bool = True,
) -> DataFrame:
    """Near-dup pairs by text SimHash (see hamming_band_pairs).

    ``persist_sigs`` (default on) caches the signature frame
    (MEMORY_AND_DISK): the banding stage references it ~3x (hot-bucket
    pre-pass + both self-join sides), and without the cache the
    64-sum-agg signature computation reruns each time — 2.5x measured
    at sf0.1. The cached frame is (id, 8-byte sig) — tiny relative to
    the text it came from; it stays cached for the session (the
    returned DataFrame reads from it lazily). Pass False for a pure
    plan, or materialize simhash_signatures to a table yourself at
    extreme scale."""
    sigs = simhash_signatures(df, id_col, text_col)
    if persist_sigs:
        from pyspark import StorageLevel

        sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
    return hamming_band_pairs(
        sigs, id_col, "simhash", max_hamming, chunks, max_bucket,
        stats_out, allow_partial_recall,
    )


def simhash_pairs_incremental(
    new_df: DataFrame, history_sigs: DataFrame | None,
    id_col: str, text_col: str,
    max_hamming: int = 3, chunks: int = 4,
    max_bucket: int | None = 10_000,
    stats_out: dict | None = None,
    allow_partial_recall: bool = False,
    persist_sigs: bool = True,
    keep_flags: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Incremental SimHash near-dup mining: pairs with >= 1 NEW side
    against a persisted (id, simhash) history — only the NEW batch's
    text crosses the 64-sum-agg signature stage; history rows cost one
    8-byte re-banding projection each. Returns ``(pairs, new_sigs)``;
    append new_sigs to the history table after the run commits (see
    incremental_simhash_run). Equivalence + cap semantics:
    hamming_band_pairs_incremental."""
    new_sigs = simhash_signatures(new_df, id_col, text_col)
    if persist_sigs:
        from pyspark import StorageLevel

        new_sigs = new_sigs.persist(StorageLevel.MEMORY_AND_DISK)
    pairs = hamming_band_pairs_incremental(
        new_sigs, history_sigs, id_col, "simhash",
        max_hamming, chunks, max_bucket, stats_out,
        allow_partial_recall, keep_flags,
    )
    return pairs, new_sigs


def audio_near_dup_pairs(
    df: DataFrame, id_col: str = "clip_id",
    max_hamming: int = 6, chunks: int = 8,
    max_bucket: int | None = 10_000,
    stats_out: dict | None = None,
    allow_partial_recall: bool = False,
) -> DataFrame:
    """Near-duplicate AUDIO pairs via the 64-bit spectral fingerprint
    (udfs/audio.py:audio_fingerprint_udf — computed from the JVM-extracted
    Welch windows; payload bytes never cross to Python). fp=0 rows
    (silent/undecodable) are excluded: they are not evidence of shared
    content and would otherwise bucket together.

    Defaults honor the pigeonhole guarantee for the advertised
    max_hamming=6: chunks=8 (8-bit chunk keys) guarantees recall up to
    hamming 7. 8-bit keys produce larger candidate buckets than the
    16-bit default elsewhere — at very large clip counts either rely on
    the hot-bucket cap (logged drops) or trade down to chunks=4 with
    max_hamming=3.

    ``max_bucket`` bounds BOTH candidate joins: the banding buckets
    over distinct fingerprints (hamming_band_pairs) AND the pair
    re-expansion over identical-fingerprint clip groups. The latter is
    the duplicate-heavy-corpus hazard this operator exists for: one
    re-upload cluster of n identical clips would otherwise emit
    n(n-1)/2 pairs from an uncapped group self-join. Clips in a group
    larger than max_bucket are excluded from pair expansion entirely
    (within-group AND cross-group), logged and reported via
    ``stats_out`` key 'identical-fp clip groups' — the same recall
    tradeoff as the banding hot-bucket drop: a >max_bucket identical
    cluster is exact-dedup territory (collapse it by fingerprint), not
    pairwise-near-dup territory."""
    from ..udfs.audio import with_audio_fingerprint

    sigs = (
        with_audio_fingerprint(df)
        .filter(F.col("audio_fp") != 0)
        .select(id_col, "audio_fp")
        # referenced three times below (distinct-fp banding + two member
        # expansions); without the cache the fingerprint UDF scan reruns.
        # The cache is (id, fp) pairs — 16 B/clip. At extreme corpus
        # sizes materialize fingerprints to a TABLE once and run
        # hamming_band_pairs + the expansions against it instead of
        # pinning executor storage for the session.
        .cache()
    )
    # Collapse to DISTINCT fingerprints before banding: audio corpora are
    # duplicate-heavy (same master re-encoded/re-uploaded), so the banding
    # self-join runs over D distinct signatures instead of N clips
    # (4000 -> 34 on the synthetic corpus) — the bucket-quadratic term
    # shrinks by (N/D)^2. Clip pairs are then re-expanded: within-group
    # (identical fp, hamming 0) via a group self-join, cross-group via
    # membership joins on each side of the fp pairs. Output is exactly
    # the pre-collapse pair set (id_a < id_b, hamming <= max_hamming).
    fp_pairs = hamming_band_pairs(
        sigs.select(F.col("audio_fp").alias("_fp")).distinct()
        .withColumn("_fpid", F.col("_fp")),
        "_fpid", "_fp",
        max_hamming, chunks, max_bucket, stats_out,
        allow_partial_recall,
    ).select(
        F.col("id_a").alias("_fp_a"),
        F.col("id_b").alias("_fp_b"),
        "hamming",
    )
    # Bound the expansion joins: the distinct-fp collapse makes the
    # BANDING immune to duplicate-heavy groups, but the re-expansion
    # back to clip pairs is still group-size-quadratic (within) /
    # group-size-linear per fp pair (cross). Same guard, same logging,
    # same tradeoff as the banding cap.
    members = _drop_hot_groups(
        sigs, ["audio_fp"], max_bucket,
        "identical-fp clip groups", stats_out,
    )
    within = (
        members.alias("x")
        .join(members.alias("y"), "audio_fp")
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("id_a"),
            F.col(f"y.{id_col}").alias("id_b"),
            F.lit(0).alias("hamming"),
        )
    )
    cross = (
        fp_pairs.join(
            members.select(
                F.col("audio_fp").alias("_fp_a"),
                F.col(id_col).alias("_ca"),
            ),
            "_fp_a",
        )
        .join(
            members.select(
                F.col("audio_fp").alias("_fp_b"),
                F.col(id_col).alias("_cb"),
            ),
            "_fp_b",
        )
        .select(
            F.least("_ca", "_cb").alias("id_a"),
            F.greatest("_ca", "_cb").alias("id_b"),
            "hamming",
        )
    )
    return within.unionByName(cross)


def audio_near_dup_pairs_incremental(
    new_df: DataFrame, history_fps: DataFrame | None,
    id_col: str = "clip_id",
    max_hamming: int = 6, chunks: int = 8,
    max_bucket: int | None = 10_000,
    stats_out: dict | None = None,
    allow_partial_recall: bool = False,
    keep_flags: bool = False,
    fp_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Incremental cross-run AUDIO near-dup mining: clip pairs with
    >= 1 NEW side against a persisted (id_col, audio_fp) history —
    only the NEW batch's Welch windows cross the fingerprint UDF;
    history clips cost 16 bytes each. Returns ``(pairs, new_fps)``;
    append new_fps (fp=0 silent/undecodable rows already excluded) to
    the history table after the run commits (see incremental_audio_run).

    ``fp_col``: name of an ALREADY-COMPUTED fingerprint column on
    ``new_df`` (the decode-once path: score_clips stamped it from the
    same window materialization as the audio stats —
    udfs/audio.with_audio_stats_and_fingerprint). When given, no
    fingerprint UDF runs here and compressed payloads are not decoded
    a second time; when None, fingerprints are computed from the raw
    bytes as before.

    Keeps the full operator's duplicate-heavy-corpus shape: banding
    runs over DISTINCT fingerprints of the union, then pairs re-expand
    through the member sets. 'New' is tracked at BOTH levels — a
    fingerprint counts as new when it has >= 1 new member (a new
    re-upload of an old master makes its old fingerprint's pairs
    eligible again), and the re-expansion keeps only clip pairs that
    actually touch a new clip. Result (tested): exactly
    ``audio_near_dup_pairs(history ∪ new)`` restricted to
    new-involving pairs, whenever the caps do not fire; caps apply to
    the union, so bounds match a full recompute (superset-not-miss
    across runs, as in hamming_band_pairs_incremental).

    ``keep_flags=True`` appends boolean new_a/new_b columns (which side
    of the pair is a new arrival) so a sink can quarantine the new side
    of a new-vs-history pair deterministically."""
    if fp_col is not None:
        fp_src = new_df.select(
            F.col(id_col), F.col(fp_col).alias("audio_fp")
        )
    else:
        from ..udfs.audio import with_audio_fingerprint

        fp_src = with_audio_fingerprint(new_df).select(
            id_col, "audio_fp"
        )
    new_fps = (
        fp_src
        .filter(F.col("audio_fp") != 0)
        # referenced several times below; without the cache the
        # fingerprint UDF scan reruns. 16 B/clip, NEW batch only —
        # unlike the full operator this never pins history-sized
        # storage (history is already materialized by the caller).
        .cache()
    )
    members = new_fps.withColumn("_new", F.lit(True))
    if history_fps is not None:
        members = (
            history_fps.select(F.col(id_col), "audio_fp")
            .filter(F.col("audio_fp") != 0)
            .withColumn("_new", F.lit(False))
            .unionByName(members)
        )
    # fingerprint-level novelty: one groupBy over the union (shuffle =
    # distinct fps only). A fp is 'new' iff it gained a new member.
    fp_flags = members.groupBy("audio_fp").agg(
        F.max("_new").alias("_fp_new")
    )
    fp_pairs = hamming_band_pairs_incremental(
        fp_flags.filter(F.col("_fp_new"))
        .select(F.col("audio_fp").alias("_fpid"),
                F.col("audio_fp").alias("_fp")),
        fp_flags.filter(~F.col("_fp_new"))
        .select(F.col("audio_fp").alias("_fpid"),
                F.col("audio_fp").alias("_fp")),
        "_fpid", "_fp",
        max_hamming, chunks, max_bucket, stats_out,
        allow_partial_recall,
    ).select(
        F.col("id_a").alias("_fp_a"),
        F.col("id_b").alias("_fp_b"),
        "hamming",
    )
    # same expansion bound as the full operator, over the union
    bounded = _drop_hot_groups(
        members, ["audio_fp"], max_bucket,
        "identical-fp clip groups", stats_out,
    )
    within_cols = [
        F.col(f"x.{id_col}").alias("id_a"),
        F.col(f"y.{id_col}").alias("id_b"),
        F.lit(0).alias("hamming"),
    ]
    # x.id < y.id below, so the flags follow the ids positionally
    cross_swap = F.col("_ca") > F.col("_cb")
    cross_cols = [
        F.least("_ca", "_cb").alias("id_a"),
        F.greatest("_ca", "_cb").alias("id_b"),
        F.col("hamming"),
    ]
    if keep_flags:
        within_cols += [
            F.col("x._new").alias("new_a"),
            F.col("y._new").alias("new_b"),
        ]
        cross_cols += [
            F.when(cross_swap, F.col("_nb")).otherwise(F.col("_na"))
            .alias("new_a"),
            F.when(cross_swap, F.col("_na")).otherwise(F.col("_nb"))
            .alias("new_b"),
        ]
    within = (
        bounded.alias("x")
        .join(bounded.alias("y"), "audio_fp")
        .filter(
            (F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
            & (F.col("x._new") | F.col("y._new"))
        )
        .select(*within_cols)
    )
    cross = (
        fp_pairs.join(
            bounded.select(
                F.col("audio_fp").alias("_fp_a"),
                F.col(id_col).alias("_ca"),
                F.col("_new").alias("_na"),
            ),
            "_fp_a",
        )
        .join(
            bounded.select(
                F.col("audio_fp").alias("_fp_b"),
                F.col(id_col).alias("_cb"),
                F.col("_new").alias("_nb"),
            ),
            "_fp_b",
        )
        .filter(F.col("_na") | F.col("_nb"))
        .select(*cross_cols)
    )
    return within.unionByName(cross), new_fps


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (inverted index join)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str,
    shingle_k: int = 3, min_jaccard: float = 0.8,
    max_doc_freq: int | None = 10_000,
    stats_out: dict | None = None,
    max_doc_frac: float | None = None,
    persist_posting: bool = True,
) -> DataFrame:
    """Exact Jaccard over word k-shingles for pairs sharing >= 1 shingle.

    Classic inverted-index self-join: explode distinct shingles, join on the
    shingle, count intersections, then |A∩B| / (|A|+|B|-|A∩B|). The shuffle
    is bounded by the posting lists — and the posting lists are themselves
    BOUNDED by a stop-shingle cutoff: any shingle appearing in more than
    ``max_doc_freq`` documents (boilerplate, templates) is removed from the
    inverted index before the self-join (drop count logged + reported via
    ``stats_out`` key 'stop_shingles'; see _drop_hot_groups), since one such
    shingle alone contributes df² candidate pairs. Shingles travel as
    64-bit hashes (``_shingle_hash_expr``), never strings: the posting
    shuffle, the stop-shingle groupBy and the self-join keys all carry 8
    bytes per shingle (guide §2.3). |A| and |B| are counted
    BEFORE the cutoff, so the reported jaccard of a surviving pair is exact
    when none of its shared shingles were dropped and a lower bound
    otherwise — the filter only MISSES pairs whose overlap is purely
    boilerplate, it never inflates a score. max_doc_freq=None disables.

    ``persist_posting`` (default on) caches the exploded posting frame
    (MEMORY_AND_DISK, (id, n, 8-byte shingle hash) rows): it is
    referenced ~3x (stop-shingle pre-pass + both self-join sides), and
    without the cache the tokenize+shingle+explode pipeline reruns each
    time (r06: the dominant cost of doc_dup_components). Pass False for
    a pure plan, or materialize the posting to a table at extreme scale.
    Callers whose upstream is expensive should STILL cache their input
    (the harness queries do): the posting cache only absorbs
    re-evaluations downstream of the scan.

    ``max_doc_frac`` makes the cutoff CORPUS-RELATIVE: the effective
    cutoff becomes min(max_doc_freq, ceil(frac * corpus_rows)) (one
    cheap count() action). The absolute default alone is a trap at
    scale — boilerplate shared by, say, 5k of 50k docs sits under a
    10k absolute cap yet contributes ~12.5M candidate pairs per shingle
    (measured, DESIGN.md #19); 0.1-1% of N is the usual production
    setting.
    """
    if max_doc_frac is not None:
        if not 0.0 < max_doc_frac <= 1.0:
            raise ValueError(
                f"max_doc_frac must be in (0, 1] (got {max_doc_frac})"
            )
        import math

        rel = max(1, math.ceil(max_doc_frac * df.count()))
        max_doc_freq = rel if max_doc_freq is None else min(
            max_doc_freq, rel
        )
    sh = df.select(
        F.col(id_col),
        _shingle_hash_expr(text_col, shingle_k).alias("_shs"),
    ).withColumn("_n", F.array_size("_shs"))
    posting = sh.select(
        F.col(id_col), F.col("_n"), F.explode("_shs").alias("_sh")
    )
    if persist_posting:
        from pyspark import StorageLevel

        posting = posting.persist(StorageLevel.MEMORY_AND_DISK)
    posting = _drop_hot_groups(
        posting, ["_sh"], max_doc_freq, "stop_shingles", stats_out
    )
    a = posting.select(
        F.col(id_col).alias("id_a"), F.col("_n").alias("n_a"), "_sh"
    )
    b = posting.select(
        F.col(id_col).alias("id_b"), F.col("_n").alias("n_b"), "_sh"
    )
    inter = (
        a.join(b, "_sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# Eval-set decontamination
# ---------------------------------------------------------------------------


def decontaminate(
    corpus: DataFrame,
    heldout: DataFrame,
    id_col: str,
    text_col: str,
    heldout_text_col: str | None = None,
    shingle_k: int = 8,
    min_hits: int = 1,
    broadcast_heldout: bool = True,
) -> DataFrame:
    """Benchmark/eval-set decontamination: returns ``(id_col, hits)``
    for every corpus doc sharing at least ``min_hits`` DISTINCT word
    ``shingle_k``-grams with ANY heldout doc (the classic n-gram-overlap
    contamination test used to keep eval sets out of training corpora;
    the reference engine has no analogue — this is training-data-
    pipeline surface, like the dedup family above).

    Scale shape: the heldout side (an eval benchmark: typically 1e3-1e5
    docs) collapses to its DISTINCT shingle set and is broadcast, so the
    corpus is ONE scan + explode + broadcast-hash semi-join — the corpus
    itself never shuffles; the only shuffle is the hits groupBy over
    MATCHED rows (bounded by actual contamination, normally a sliver).
    Set ``broadcast_heldout=False`` for an unusually large heldout side
    and the join falls back to a shuffle join (AQE may still broadcast).

    Shingling is ``_shingle_hash_expr`` — the SAME normalization and
    short-doc fallback as the n-gram/minhash dedup family, so a
    contamination threshold and a dedup threshold refer to the same
    token universe. Null text on either side contributes no shingles
    (never contaminates, never contaminated).

    ``hits`` counts distinct shared shingles (corpus-doc shingles are
    distinct by construction, the heldout set is made distinct): a doc
    quoting one heldout passage twice scores the passage once.
    """
    if min_hits < 1:
        raise ValueError(f"min_hits must be >= 1 (got {min_hits})")
    # shingles travel as 64-bit hashes on BOTH sides (same
    # _shingle_hash_expr, so matches are preserved): the broadcast holds
    # 8 bytes per heldout shingle instead of a k-word string, and the
    # corpus side never builds shingle strings at all (guide §2.3;
    # r06: doc_decontam_hits measured 1.48 s -> the string concat_ws
    # build per corpus shingle was a visible fraction)
    held_sh = (
        heldout.select(
            F.explode(
                _shingle_hash_expr(heldout_text_col or text_col, shingle_k)
            ).alias("_sh")
        ).distinct()
    )
    if broadcast_heldout:
        held_sh = F.broadcast(held_sh)
    corp_sh = corpus.select(
        F.col(id_col),
        F.explode(_shingle_hash_expr(text_col, shingle_k)).alias("_sh"),
    )
    return (
        corp_sh.join(held_sh, "_sh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("hits"))
        .filter(F.col("hits") >= min_hits)
    )


# ---------------------------------------------------------------------------
# Span-level exact-substring dedup (duplicated PASSAGES inside distinct docs)
# ---------------------------------------------------------------------------


def dup_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
) -> DataFrame:
    """Positions of duplicated word spans: maximal runs of ``k``-word
    shingles that already occur in an EARLIER document (min-``id_col``
    ownership, the dedup family's survivor convention). Doc-level
    dedup (exact/minhash/simhash above) only removes documents that are
    mostly duplicate; boilerplate passages PASTED INTO otherwise-unique
    documents — license headers, quoted posts, templated intros —
    stream through it untouched, and span-level removal is the standard
    cure (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better": exact-substring dedup; approximated here at
    ``k``-word granularity instead of suffix-array byte granularity).

    Returns ``(id_col, span_start, span_end, span_words)`` — 0-based
    inclusive WORD indexes into the normalized token sequence (the same
    ``norm_text``+lower tokenization as the whole dedup family). A span
    covers every word of every duplicated shingle in one consecutive
    run: shingle starts p..q merge to words [p, q+k-1]. The first
    (min-id) holder of a passage reports nothing — dedup keeps one copy.
    Docs shorter than ``k`` words (or with missing text) yield no rows:
    a sub-``k`` span is not evidence at this granularity.

    Scale shape: ONE explode of positional shingles (corpus-token row
    count, 8-byte hashed shingles — never shingle strings) -> min-id
    groupBy (map-side partial min) -> equi-join back (1:1 per
    occurrence row, so a hot boilerplate shingle fans out linearly, not
    quadratically — no hot-bucket cap needed; AQE skew-join splits the
    shuffle) -> per-doc window (bounded by doc length) merges runs.
    No cross join, no Python.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2 (got {k})")
    from pyspark import StorageLevel

    # the positional-shingle explode feeds BOTH the ownership groupBy
    # and the probe side of the join — persist it so the tokenize+
    # shingle+explode pipeline runs once (r06; the persist_sigs /
    # persist_posting precedent; (id, pos, 8-byte hash) rows only)
    pos = _pos_shingles(df, id_col, text_col, k).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    first = pos.groupBy("_sh").agg(F.min("_id").alias("_first"))
    dup_pos = (
        pos.join(first, "_sh")
        .filter(F.col("_id") > F.col("_first"))
        .select("_id", "_pos")
    )
    return _merge_runs(dup_pos, id_col, k)


def _pos_shingles(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """(_id, _pos, _sh) — one row per POSITIONAL k-word shingle. The
    token array is projected as a real column before the gram lambda
    (the selection.py lesson: a captured split(regexp_replace(...))
    subtree re-evaluates PER ELEMENT under interpreted HOF lambdas —
    O(words²) per doc; a projected column is an O(1) attribute read)."""
    toked = df.withColumn(
        "__span_toks", F.split(norm_text(F.lower(F.col(text_col))), " ")
    )
    toks = F.col("__span_toks")
    n = F.array_size(toks)
    sh_arr = F.when(
        toks.isNotNull() & (n >= k),
        F.transform(
            F.sequence(F.lit(0), n - k),
            # domain-tagged hash (DESIGN #23 discipline): 8-byte rows
            # through the shuffle, the measured minhash win
            lambda i: F.xxhash64(
                F.lit("dup_span"), F.concat_ws(" ", F.slice(toks, i + 1, k))
            ),
        ),
    )
    return toked.select(
        F.col(id_col).alias("_id"),
        F.posexplode(sh_arr).alias("_pos", "_sh"),
    )


def _merge_runs(dup_pos: DataFrame, id_col: str, k: int) -> DataFrame:
    """Gaps-and-islands over duplicated shingle starts: consecutive
    positions share (pos - row_number) — one run, one group — merged
    to (id_col, span_start, span_end, span_words) word spans."""
    from pyspark.sql import Window

    w = Window.partitionBy("_id").orderBy("_pos")
    runs = dup_pos.withColumn(
        "_grp", F.col("_pos") - F.row_number().over(w)
    )
    return (
        runs.groupBy("_id", "_grp")
        .agg(
            F.min("_pos").alias("span_start"),
            (F.max("_pos") + k - 1).alias("span_end"),
        )
        .select(
            F.col("_id").alias(id_col),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias(
                "span_words"
            ),
        )
    )


def dup_spans_incremental(
    new_df: DataFrame,
    history: DataFrame | None,
    id_col: str,
    text_col: str,
    k: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Incremental span mining — the ingest shape of :func:`dup_spans`:
    a NEW batch's positions are duplicated when their shingle is owned
    by the persisted history (any retained earlier batch) OR by an
    earlier-id doc within the batch. Returns ``(spans, new_shingles)``:
    spans for the new docs, and the batch's DISTINCT shingle hashes NOT
    already in history — append them after the run commits so history
    stays exactly the corpus's distinct shingle set.

    Sequential == full (tested): with ids assigned in ingest order,
    feeding batches B1..Bn through this function yields exactly
    ``dup_spans(B1 ∪ … ∪ Bn)`` as the union of the per-round outputs.

    State-size honesty: history holds ONE 8-byte hash per distinct
    k-shingle of the corpus — O(corpus tokens) state, the price of
    exact span coverage (Lee et al.'s suffix array is the same order,
    over bytes). That is much heavier than the O(docs) signature
    tables of the doc-level family; compact the table periodically
    (TableStore.compact) and budget for it. The alternative — re-mining
    the whole corpus per ingest — re-pays the full explode every run.

    ``history``: a (shingle_hash: long) frame, or None for the first
    batch."""
    if k < 2:
        raise ValueError(f"k must be >= 2 (got {k})")
    from pyspark import StorageLevel

    # same two-reference shape as dup_spans: persist so the explode
    # pipeline over the new batch runs once (r06)
    pos = _pos_shingles(new_df, id_col, text_col, k).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    first = pos.groupBy("_sh").agg(F.min("_id").alias("_first"))
    if history is not None:
        hist_sh = history.select(F.col("shingle_hash").alias("_sh"))
        owned = first.join(
            hist_sh.withColumn("_hist", F.lit(True)), "_sh", "left"
        )
    else:
        owned = first.withColumn("_hist", F.lit(None).cast("boolean"))
    dup_pos = (
        pos.join(owned, "_sh")
        .filter(F.col("_hist").isNotNull() | (F.col("_id") > F.col("_first")))
        .select("_id", "_pos")
    )
    spans = _merge_runs(dup_pos, id_col, k)
    new_shingles = (
        owned.filter(F.col("_hist").isNull())
        .select(F.col("_sh").alias("shingle_hash"))
    )
    return spans, new_shingles


def incremental_dup_spans_run(
    store, table: str, new_df: DataFrame,
    id_col: str, text_col: str,
    source_fingerprint: str | None = None,
    **kwargs,
) -> DataFrame | None:
    """Span-dedup ingest round (see _incremental_run for the commit
    protocol): history table holds (shingle_hash) rows; returns the
    new batch's duplicated spans, or None on a fingerprint-replay
    skip."""
    return _incremental_run(
        store, table, new_df,
        lambda new, hist: dup_spans_incremental(
            new, hist, id_col, text_col, **kwargs
        ),
        source_fingerprint, "incremental_dup_spans_run",
    )


def strip_dup_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Remove the words covered by ``dup_spans`` output from each doc's
    text: returns ``df`` with ``text_col`` replaced by the normalized
    token sequence minus covered positions (empty string when a doc is
    covered entirely). Docs with no spans keep their ORIGINAL text
    verbatim — only affected docs pay the rebuild, and only affected
    docs' words are ever exploded/shuffled (the affected set is
    bounded by actual duplication, normally a sliver of the corpus).
    """
    covered = spans.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.col("span_start"), F.col("span_end"))
        ).alias("_pos"),
    ).distinct()
    affected_ids = spans.select(id_col).distinct()
    affected = df.join(affected_ids, id_col, "left_semi")
    toks = F.split(norm_text(F.lower(F.col(text_col))), " ")
    words = affected.select(
        F.col(id_col), F.posexplode(toks).alias("_pos", "_w")
    )
    kept = words.join(covered, [id_col, "_pos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_w"))),
                lambda s: s["_w"],
            ),
            " ",
        ).alias("_rebuilt")
    )
    out = (
        df.join(affected_ids.withColumn("_aff", F.lit(True)), id_col, "left")
        .join(rebuilt, id_col, "left")
        .withColumn(
            text_col,
            F.when(
                F.col("_aff").isNotNull(),
                F.coalesce(F.col("_rebuilt"), F.lit("")),
            ).otherwise(F.col(text_col)),
        )
        .drop("_aff", "_rebuilt")
    )
    return out
