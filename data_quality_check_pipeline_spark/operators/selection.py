"""Domain-targeted data selection (DSIR-style importance resampling).

A web-scale training corpus is rarely used uniformly: given a small
high-quality TARGET sample (a trusted eval-adjacent corpus, a curated
domain set), production pipelines up-select raw-corpus documents whose
n-gram profile looks like the target — "Data Selection via Importance
Resampling" (Xie et al., 2023): score every raw doc with the
log-likelihood ratio of two bag-of-hashed-n-grams models (target vs raw
corpus) and resample proportionally to the ratio via the Gumbel top-k
trick. The reference engine has no analogue — this is round-brief
training-data-pipeline surface, like the dedup/sampling families.

Scale shape (the 100 TB contract):

* Feature histograms are BOUNDED: hashed n-grams live in ``n_features``
  buckets, so both the target and the raw-corpus histograms are one
  map-side-combined groupBy that returns <= n_features rows regardless
  of corpus size. The log-ratio table is therefore always broadcastable.
* Per-doc scoring is ONE scan: explode hashed n-grams, broadcast-join
  the log-ratio table, sum per doc (map-side partial agg). No corpus
  self-join, no signature state.
* Selection: ``mode="top_k"`` is an exact global top-k
  (TakeOrdered-style sort+limit — fine up to millions of keeps);
  ``mode="threshold"`` is the 100-TB shape — one ``percentile_approx``
  pass fixes a score cutoff and the keep decision becomes a scan-side
  filter (approximately n_keep rows, no global sort).

Determinism: the Gumbel noise derives from ``xxhash64(id, 'dsir_gumbel',
seed)`` — never ``rand()`` (repo invariant; task retries and
repartitioning reproduce the same selected set), and the feature hash
folds a ``'dsir_feat'`` domain literal so the feature universe is
independent of every other hash-derived decision at equal seeds
(DESIGN #23).
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.exprs import norm_text
from .sampling import _BUCKETS

_log = logging.getLogger("clip_quality.selection")

_FEAT_DOMAIN = "dsir_feat"
_GUMBEL_DOMAIN = "dsir_gumbel"


def _ngram_feature_expr(
    text_col: str, ks: tuple[int, ...], n_features: int,
    toks: Column | None = None,
) -> Column:
    """Array of hashed n-gram feature ids (one entry PER OCCURRENCE —
    DSIR models raw counts, not the distinct sets the dedup family
    uses). Tokenization matches the dedup/decontamination families
    (norm_text + lower + single-space split) so a selection model and a
    dedup threshold refer to the same token universe. A doc shorter
    than k tokens contributes its whole token sequence as one k-gram
    (the family's short-doc fallback); null text -> null array (explode
    drops the doc: no features, no weight, excluded from selection).

    Perf shape (measured 3.6 s -> 0.7 s per sf0.1 corpus pass,
    checksum-identical): pmod folds INTO the per-k gram lambda instead
    of a second transform over the concat — HOF lambdas run
    interpreted, and nesting them is the DESIGN #15 27x trap. Callers
    that scan real data should pass ``toks`` as a MATERIALIZED column
    (see ``_exploded_feats``): a captured `split(regexp_replace(...))`
    subtree inside the lambda re-evaluates per element (O(words²) per
    doc), a projected column is an O(1) attribute read."""
    if toks is None:
        toks = F.split(norm_text(F.lower(F.col(text_col))), " ")
    n = F.array_size(toks)
    nf = F.lit(n_features)

    def _gram_hash(k: int):
        # single-parameter lambda, k bound in the enclosing scope: a
        # 2-arg callable would make F.transform pass (element, INDEX)
        # and the gram width would silently become the array position
        return lambda i: F.pmod(
            F.xxhash64(F.slice(toks, i + 1, k), F.lit(_FEAT_DOMAIN)), nf
        )

    per_k = []
    for k in ks:
        idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
        grams = F.when(
            n >= k,
            F.transform(idx, _gram_hash(k)),
        ).otherwise(
            F.array(F.pmod(F.xxhash64(toks, F.lit(_FEAT_DOMAIN)), nf))
        )
        per_k.append(grams)
    feats = F.concat(*per_k) if len(per_k) > 1 else per_k[0]
    return F.when(toks.isNotNull(), feats)


def _exploded_feats(
    df: DataFrame, text_col: str, ks: tuple[int, ...], n_features: int,
    extra_cols: tuple = (),
) -> DataFrame:
    """(extra_cols..., feat) — one row per n-gram occurrence, with the
    token array projected as a real column BEFORE the gram lambdas
    (the Generate node blocks CollapseProject from inlining it back)."""
    toked = df.withColumn(
        "__dsir_toks", F.split(norm_text(F.lower(F.col(text_col))), " ")
    )
    return toked.select(
        *extra_cols,
        F.explode(
            _ngram_feature_expr(
                text_col, ks, n_features, toks=F.col("__dsir_toks")
            )
        ).alias("feat"),
    )


def feature_hist(
    df: DataFrame, text_col: str,
    ks: tuple[int, ...] = (1, 2), n_features: int = 8192,
) -> DataFrame:
    """(feat, n) hashed-n-gram occurrence histogram — at most
    n_features rows whatever the input size (map-side combine does the
    heavy lifting). EXACTLY mergeable: histograms of disjoint batches
    vector-add (groupBy(feat).sum(n)) to the whole-corpus histogram,
    which is what makes the DSIR corpus model incrementally
    maintainable (see incremental_dsir_model_run)."""
    return (
        _exploded_feats(df, text_col, ks, n_features)
        .groupBy("feat")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_feature_hist = feature_hist  # internal alias (historical name)


def _hist_spec(ks: tuple[int, ...], n_features: int) -> str:
    return f"ks={','.join(str(k) for k in ks)};nf={int(n_features)}"


def log_ratio_from_hists(
    target_hist: DataFrame,
    corpus_hist: DataFrame,
    n_features: int,
    smoothing: float = 1.0,
    stats_out: dict | None = None,
) -> DataFrame:
    """(feat, log_ratio) from two precomputed (feat, n) histograms —
    the model-from-state path: the histograms are bounded mergeable
    state, so deriving the model costs nothing corpus-sized."""
    if n_features < 2:
        raise ValueError(f"n_features must be >= 2, got {n_features}")
    if smoothing <= 0:
        raise ValueError(
            f"smoothing must be > 0 (zero counts need mass), got {smoothing}"
        )
    # persist the (bounded, <= n_features rows) hists: each is referenced
    # twice — the totals collect here and the model join below. Without
    # this the CORPUS-sized explode behind corpus_hist re-runs when the
    # model broadcasts (measured: one of the three full-corpus feature
    # passes in doc_dsir_select was exactly this recompute).
    target_hist = target_hist.persist()
    corpus_hist = corpus_hist.persist()
    t_total = (target_hist.agg(F.sum("n")).collect()[0][0]) or 0
    c_total = (corpus_hist.agg(F.sum("n")).collect()[0][0]) or 0
    if stats_out is not None:
        stats_out["target_tokens"] = int(t_total)
        stats_out["corpus_tokens"] = int(c_total)
    lam = float(smoothing)
    denom_t = float(t_total) + lam * n_features
    denom_c = float(c_total) + lam * n_features
    joined = (
        target_hist.select("feat", F.col("n").alias("nt"))
        .join(
            corpus_hist.select("feat", F.col("n").alias("nc")),
            "feat", "full_outer",
        )
    )
    return joined.select(
        "feat",
        (
            F.log((F.coalesce(F.col("nt"), F.lit(0)) + F.lit(lam))
                  / F.lit(denom_t))
            - F.log((F.coalesce(F.col("nc"), F.lit(0)) + F.lit(lam))
                    / F.lit(denom_c))
        ).alias("log_ratio"),
    )


def incremental_dsir_model_run(
    store,
    table: str,
    new_df: DataFrame,
    text_col: str,
    ks: tuple[int, ...] = (1, 2),
    n_features: int = 8192,
    source_fingerprint: str | None = None,
) -> DataFrame | None:
    """Maintain the DSIR CORPUS model incrementally: append this
    batch's (feat, n) histogram to a TableStore history table and
    return the MERGED corpus histogram — at 100 TB the raw-corpus
    n-gram distribution q(f) cannot be re-mined per run, but its
    histogram is bounded (<= n_features rows/batch) exactly-mergeable
    state, the same pattern as the sketch-profile history. Feed the
    result to :func:`log_ratio_from_hists` with any target histogram
    (targets are small and may change; the corpus state never needs
    rescanning).

    Every appended row carries a spec stamp (ks + n_features — the
    feature universe); a history holding a different spec refuses
    rather than silently merging incompatible universes (the profile
    history's bin-edge contract, applied here). Same commit protocol
    as the dedup signature histories (_incremental_run): result
    materialized from the pre-append snapshot, fingerprint replays
    skipped idempotently. Returns None on a replay skip."""
    from .dedup import _incremental_run

    spec = _hist_spec(ks, n_features)

    def miner(new: DataFrame, hist: DataFrame | None):
        new_hist = feature_hist(new, text_col, ks, n_features).withColumn(
            "spec", F.lit(spec)
        )
        if hist is not None:
            specs = [
                r[0] for r in hist.select("spec").distinct().collect()
            ]
            if specs != [spec]:
                raise ValueError(
                    f"dsir model history {table!r} holds spec(s) "
                    f"{specs}, expected {spec!r} — the feature universe "
                    "is part of the history contract"
                )
            merged = (
                hist.select("feat", "n")
                .unionByName(new_hist.select("feat", "n"))
                .groupBy("feat")
                .agg(F.sum("n").alias("n"))
            )
        else:
            merged = new_hist.select("feat", "n")
        return merged, new_hist

    return _incremental_run(
        store, table, new_df, miner, source_fingerprint,
        "incremental_dsir_model_run",
    )


def dsir_corpus_hist(
    store,
    table: str,
    ks: tuple[int, ...] = (1, 2),
    n_features: int = 8192,
) -> DataFrame:
    """Merged (feat, n) corpus histogram from a model history table —
    the read path between runs: groupBy(feat).sum over the appended
    batch rows (including any negative forget rows; exact by
    mergeability). Verifies the spec stamp; zero-count features drop
    (equal to a recompute that never saw them)."""
    spec = _hist_spec(ks, n_features)
    hist = store.read(table)
    specs = [r[0] for r in hist.select("spec").distinct().collect()]
    if specs != [spec]:
        raise ValueError(
            f"dsir model history {table!r} holds spec(s) {specs}, "
            f"expected {spec!r} — the feature universe is part of the "
            "history contract"
        )
    return (
        hist.select("feat", "n")
        .groupBy("feat")
        .agg(F.sum("n").alias("n"))
        .filter(F.col("n") != 0)
    )


def dsir_model_forget(
    store,
    table: str,
    removed_df: DataFrame,
    text_col: str,
    ks: tuple[int, ...] = (1, 2),
    n_features: int = 8192,
    source_fingerprint: str | None = None,
) -> DataFrame | None:
    """GDPR-grade erasure for the DSIR corpus model: because the model
    state is an exactly-mergeable count histogram (unlike the HLL
    profile sketches, which cannot subtract), a purge order can append
    the NEGATED histogram of the removed clips and the merged model
    equals, bit-for-bit, a recompute over the corpus without them — no
    rescan, and the removed clips' n-gram evidence genuinely leaves the
    state (takedown.py's purge semantics, extended to selection state).

    Contract: ``removed_df`` must be (a subset of) rows previously
    ingested into ``table`` with the SAME text/ks/n_features — negated
    counts for never-ingested text would drive buckets negative and the
    model would under-weight innocent features. The spec stamp is
    verified; pass the takedown id as ``source_fingerprint`` for
    idempotent replays. Returns the merged post-forget histogram, or
    None on a replay skip."""
    from .dedup import _incremental_run

    spec = _hist_spec(ks, n_features)

    def miner(removed: DataFrame, hist: DataFrame | None):
        if hist is None:
            raise ValueError(
                f"dsir_model_forget: no model history at {table!r} — "
                "nothing to forget from"
            )
        specs = [r[0] for r in hist.select("spec").distinct().collect()]
        if specs != [spec]:
            raise ValueError(
                f"dsir model history {table!r} holds spec(s) {specs}, "
                f"expected {spec!r} — the feature universe is part of "
                "the history contract"
            )
        neg = feature_hist(removed, text_col, ks, n_features).select(
            "feat", (-F.col("n")).alias("n"), F.lit(spec).alias("spec")
        )
        merged = (
            hist.select("feat", "n")
            .unionByName(neg.select("feat", "n"))
            .groupBy("feat")
            .agg(F.sum("n").alias("n"))
            .filter(F.col("n") != 0)
        )
        return merged, neg

    return _incremental_run(
        store, table, removed_df, miner, source_fingerprint,
        "dsir_model_forget",
    )


def ngram_log_ratio(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str,
    target_text_col: str | None = None,
    ks: tuple[int, ...] = (1, 2),
    n_features: int = 8192,
    smoothing: float = 1.0,
    stats_out: dict | None = None,
) -> DataFrame:
    """(feat, log_ratio) — log p_target(feat) − log p_corpus(feat) under
    add-``smoothing`` bag-of-hashed-n-grams models. <= n_features rows:
    always broadcastable. Features seen in neither side are irrelevant
    (no corpus doc can contain them); features seen only in the target
    get the corpus smoothing floor and vice versa."""
    return log_ratio_from_hists(
        feature_hist(target, target_text_col or text_col, ks, n_features),
        feature_hist(corpus, text_col, ks, n_features),
        n_features, smoothing, stats_out,
    )


def importance_weights(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    target_text_col: str | None = None,
    ks: tuple[int, ...] = (1, 2),
    n_features: int = 8192,
    smoothing: float = 1.0,
    log_ratio: DataFrame | None = None,
    stats_out: dict | None = None,
) -> DataFrame:
    """(id, logw) — per-doc log importance weight: sum over the doc's
    hashed-n-gram OCCURRENCES of the feature's log ratio. One corpus
    scan: explode + broadcast join on the bounded log-ratio table +
    groupBy(id) sum (map-side partials). Docs with NULL/empty-feature
    text are absent from the result — they carry no evidence either way
    and are excluded from selection (quality validation owns them).

    Pass a precomputed ``log_ratio`` (from :func:`ngram_log_ratio`) to
    score several corpora / shards against one fixed target model —
    the calibrated-production shape (model derived once, applied
    everywhere, shard-invariant)."""
    if log_ratio is None:
        log_ratio = ngram_log_ratio(
            corpus, target, text_col, target_text_col, ks, n_features,
            smoothing, stats_out,
        )
    exploded = _exploded_feats(
        corpus, text_col, ks, n_features, extra_cols=(F.col(id_col),)
    )
    return (
        exploded.join(F.broadcast(log_ratio), "feat")
        .groupBy(id_col)
        .agg(F.sum("log_ratio").alias("logw"))
    )


def _gumbel_key(id_col: str, seed: int, temperature: float) -> Column:
    """logw/temperature + Gumbel(0,1) noise, the Gumbel top-k trick:
    taking the n_keep largest keys samples n_keep docs WITHOUT
    replacement with probability proportional to exp(logw/temperature).
    Noise is hash-derived ((h + 0.5)/buckets keeps u strictly inside
    (0,1) — Spark's ln() returns NULL at 0) and domain-separated."""
    h = F.xxhash64(
        F.col(id_col), F.lit(_GUMBEL_DOMAIN), F.lit(int(seed)).cast("long")
    )
    u = (F.pmod(h, F.lit(_BUCKETS)).cast("double") + F.lit(0.5)) / F.lit(
        float(_BUCKETS)
    )
    gumbel = -F.log(-F.log(u))
    return F.col("logw") / F.lit(float(temperature)) + gumbel


def importance_resample(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    n_keep: int | None = None,
    target_text_col: str | None = None,
    ks: tuple[int, ...] = (1, 2),
    n_features: int = 8192,
    smoothing: float = 1.0,
    temperature: float = 1.0,
    seed: int = 0,
    mode: str = "top_k",
    keep_frac: float | None = None,
    log_ratio: DataFrame | None = None,
    stats_out: dict | None = None,
) -> DataFrame:
    """Select corpus rows that look like ``target``: Gumbel top-k over
    the importance weights (sampling without replacement proportional
    to exp(logw/temperature); temperature > 1 flattens toward uniform,
    << 1 approaches arg-top-k by weight). Returns the selected corpus
    rows (all columns). Budget: exactly one of ``n_keep`` (absolute)
    or ``keep_frac`` (fraction of scored docs; threshold mode only).

    ``mode="top_k"``: exact — global sort+limit over the (id, key)
    frame (two slim columns, never the full rows). ``mode="threshold"``:
    the 100-TB shape — ``percentile_approx`` fixes the key cutoff in one
    pass and selection becomes a scan-side filter; the kept count is
    approximate (percentile_approx accuracy), the decision per doc is
    still deterministic. With ``keep_frac`` the count pass is skipped
    entirely (one quantile job + one filter). Both modes end with one
    left_semi join of the corpus against the selected id set."""
    if (n_keep is None) == (keep_frac is None):
        raise ValueError("exactly one of n_keep / keep_frac required")
    if n_keep is not None and n_keep <= 0:
        raise ValueError(f"n_keep must be > 0, got {n_keep}")
    if keep_frac is not None and not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    if mode not in ("top_k", "threshold"):
        raise ValueError(f"mode must be top_k|threshold, got {mode!r}")
    if keep_frac is not None and mode != "threshold":
        raise ValueError("keep_frac requires mode='threshold'")
    if log_ratio is None:
        # share ONE corpus explode between the model histogram and the
        # per-doc scoring (r06): without this the corpus-sized
        # tokenize+gram+explode pipeline ran twice — once under
        # feature_hist(corpus) and once under importance_weights. The
        # persisted frame is (id, feat) — two narrow columns.
        from pyspark import StorageLevel

        exploded = _exploded_feats(
            corpus, text_col, ks, n_features,
            extra_cols=(F.col(id_col),),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        corpus_hist = exploded.groupBy("feat").agg(
            F.count(F.lit(1)).alias("n")
        )
        log_ratio = log_ratio_from_hists(
            feature_hist(target, target_text_col or text_col, ks,
                         n_features),
            corpus_hist, n_features, smoothing, stats_out,
        )
        weights = (
            exploded.join(F.broadcast(log_ratio), "feat")
            .groupBy(id_col)
            .agg(F.sum("log_ratio").alias("logw"))
        )
    else:
        weights = importance_weights(
            corpus, target, id_col, text_col, target_text_col, ks,
            n_features, smoothing, log_ratio, stats_out,
        )
    keyed = weights.select(
        id_col, _gumbel_key(id_col, seed, temperature).alias("_key")
    )
    if mode == "top_k":
        chosen = keyed.orderBy(F.col("_key").desc(), F.col(id_col)).limit(
            n_keep
        )
    else:
        if keep_frac is not None:
            # count-free: the quantile IS the budget
            keyed = keyed.persist()  # two references: quantile, filter
            frac_drop = 1.0 - float(keep_frac)
            n_scored = None
        else:
            keyed = keyed.persist()  # three refs: count, quantile, filter
            n_scored = keyed.count()
            frac_drop = (
                max(0.0, 1.0 - float(n_keep) / n_scored) if n_scored else 0.0
            )
        tau = keyed.agg(
            F.percentile_approx("_key", F.lit(frac_drop))
        ).collect()[0][0]
        if tau is None:  # nothing scored (e.g. all-null text corpus)
            chosen = keyed
            tau = float("nan")
        else:
            chosen = keyed.filter(F.col("_key") >= F.lit(float(tau)))
        if stats_out is not None:
            stats_out["threshold_key"] = float(tau)
            if n_scored is not None:
                stats_out["scored_docs"] = int(n_scored)
    selected = corpus.join(
        chosen.select(id_col), id_col, "left_semi"
    )
    if stats_out is not None:
        stats_out["mode"] = mode
        if n_keep is not None:
            stats_out["n_keep_requested"] = int(n_keep)
        else:
            stats_out["keep_frac_requested"] = float(keep_frac)
    return selected


def doc_keys(
    df: DataFrame,
    log_ratio: DataFrame,
    id_col: str,
    text_col: str,
    temperature: float = 1.0,
    seed: int = 0,
    ks: tuple[int, ...] = (1, 2),
    n_features: int = 8192,
) -> DataFrame:
    """(id, _key) — each doc's Gumbel-perturbed importance key under a
    FIXED log-ratio model: the pure-row-function core both selection
    modes rank on. Deterministic given (model, seed): the same doc gets
    the same key on any partitioning, shard, or arrival path — which is
    what makes a pinned-threshold STREAM verdict equal the batch one."""
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    weights = importance_weights(
        df, None, id_col, text_col, ks=ks, n_features=n_features,
        log_ratio=log_ratio,
    )
    return weights.select(
        id_col, _gumbel_key(id_col, seed, temperature).alias("_key")
    )


def importance_filter(
    df: DataFrame,
    log_ratio: DataFrame,
    id_col: str,
    text_col: str,
    threshold_key: float,
    temperature: float = 1.0,
    seed: int = 0,
    ks: tuple[int, ...] = (1, 2),
    n_features: int = 8192,
) -> DataFrame:
    """Keep rows whose importance key clears a PINNED threshold — the
    streaming/sharded face of ``importance_resample(mode='threshold')``:
    given the same (log_ratio, threshold_key, temperature, seed), a doc
    reaches the same keep verdict whether it arrives in one batch, many
    micro-batches, or any shard split, because the key is a pure row
    function (no quantile pass, no corpus state). Derive the pin once
    from a reference corpus via :func:`pinned_dsir_model`."""
    keep = doc_keys(
        df, log_ratio, id_col, text_col, temperature, seed, ks,
        n_features,
    ).filter(F.col("_key") >= F.lit(float(threshold_key)))
    return df.join(keep.select(id_col), id_col, "left_semi")


def pinned_dsir_model(
    reference: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    keep_frac: float,
    target_text_col: str | None = None,
    ks: tuple[int, ...] = (1, 2),
    n_features: int = 8192,
    smoothing: float = 1.0,
    temperature: float = 1.0,
    seed: int = 0,
    stats_out: dict | None = None,
) -> tuple[DataFrame, float]:
    """(log_ratio, threshold_key) pinned from a REFERENCE corpus — the
    stream-start derivation (curriculum pinned-edges pattern: a
    micro-batch is not a corpus to fit an importance model on, so the
    model and the selection cutoff come from the corpus that already
    landed). log_ratio is the usual <= n_features-row broadcastable
    table; threshold_key is the (1-keep_frac) quantile of the
    reference's own keys, so the stream keeps ~keep_frac of arrivals
    to the extent arrivals are distributed like the reference. Both
    derivations are one bounded-output pass each; the returned
    log_ratio should be cached by the caller (it is re-joined every
    micro-batch).

    Raises ValueError when the reference yields no scored docs — a pin
    derived from nothing would silently keep or drop everything."""
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    log_ratio = ngram_log_ratio(
        reference, target, text_col, target_text_col, ks, n_features,
        smoothing, stats_out,
    )
    keyed = doc_keys(
        reference, log_ratio, id_col, text_col, temperature, seed, ks,
        n_features,
    )
    tau = keyed.agg(
        F.percentile_approx("_key", F.lit(1.0 - float(keep_frac)))
    ).collect()[0][0]
    if tau is None:
        raise ValueError(
            "pinned_dsir_model: reference corpus yields no scored "
            "docs (empty / all-null text) — nothing to pin a "
            "threshold on"
        )
    if stats_out is not None:
        stats_out["threshold_key"] = float(tau)
        stats_out["keep_frac_requested"] = float(keep_frac)
    return log_ratio, float(tau)
