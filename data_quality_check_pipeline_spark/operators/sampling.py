"""Deterministic corpus sampling / mixing operators.

A training-data pipeline rarely trains on the raw corpus: it samples
per-language (or per-source) strata to a target mixture, caps
over-represented strata, and assigns stable train/val/test splits. The
reference engine has no analogue (single-table pandas, no sampling
stage); these are the round-brief "operations a large-scale
training-data pipeline would need".

Every decision here derives from ``xxhash64(key, seed)`` — NEVER
``rand()`` (the repo invariant: task retries and different
partitionings must reproduce the same sample; see CLAUDE.md). The hash
keeps decisions:

* deterministic  — same key + seed => same decision, on any cluster,
  any partitioning, any retry;
* independent    — a pure per-row filter, no shuffle, whole-stage
  codegen (``hash_sample`` / ``stratified_sample`` / ``with_split``
  compile to a single projection+filter over the scan);
* composable     — disjoint seeds give independent samples of the same
  corpus.

``cap_per_stratum`` is the one operator that needs per-stratum order
(keep exactly-k): its scale path prefilters with the same hash
threshold so the final window sorts ~cap*margin rows per stratum, not
the whole corpus (hot-language skew would otherwise serialize into one
sort task).
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_log = logging.getLogger("clip_quality.sampling")

# hash -> uniform fraction resolution. 2^20 buckets: rate granularity
# ~1e-6, and pmod on a power of two stays exact in long arithmetic.
_BUCKETS = 1 << 20


def hash_frac(
    key_col: str | Column, seed: int = 0, domain: str | None = None
) -> Column:
    """Uniform-[0,1) fraction derived from ``xxhash64(key[, domain],
    seed)``.

    The seed rides along as a literal hash input (Spark's xxhash64 has
    a fixed internal seed; folding a literal gives the same effect and
    keeps the pure-Python oracle parity of ``oracle_hash.
    spark_xxhash64`` applicable). Stable across partitionings, retries
    and sessions.

    ``domain`` separates hash universes between DIFFERENT decision
    kinds over the same keys: without it, a sampling filter and a split
    assignment given equal seeds would share one fraction, and the
    sampling survivors (frac < rate) would all fall into the low split
    bands — every kept row "train". Same-kind decisions (two samples)
    stay composable via seeds alone."""
    col = F.col(key_col) if isinstance(key_col, str) else key_col
    # literals fold as (string, LONG) so the pure-Python re-derivation
    # (oracle_hash.spark_xxhash64(key[, domain], seed)) matches
    # bit-for-bit
    parts = ([F.lit(domain)] if domain is not None else []) + [
        F.lit(int(seed)).cast("long")
    ]
    h = F.xxhash64(col, *parts)
    return F.pmod(h, F.lit(_BUCKETS)).cast("double") / F.lit(float(_BUCKETS))


def hash_sample(
    df: DataFrame, key_col: str, rate: float, seed: int = 0,
    domain: str | None = None,
) -> DataFrame:
    """Keep a deterministic ~``rate`` fraction of rows, keyed on
    ``key_col``. Pure filter: no shuffle, no state, codegen-friendly —
    the 100 TB shape (a sample is a scan predicate, not a job).
    ``domain``: set when a DIFFERENT sampling decision kind composes
    with this one over the same keys (DESIGN #23) — two undomained
    filters at one seed share a fraction, and the composed keep rate
    silently becomes min(r1, r2) instead of r1*r2."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(hash_frac(key_col, seed, domain=domain) < rate)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
    seed: int = 0,
    domain: str | None = None,
) -> DataFrame:
    """Per-stratum Bernoulli sampling: stratum ``s`` keeps a
    deterministic ~``rates[s]`` fraction (``default_rate`` for
    unlisted strata, NULL stratum included). Still one scan-side
    filter — the per-stratum thresholds compile into a CASE chain, so
    sampling a 100-language corpus stays shuffle-free. ``domain``: see
    ``hash_sample`` — required when a second sampling decision KIND
    composes over the same keys (e.g. the pipeline's quality-curriculum
    filter after its language-mixture filter)."""
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} must be in [0,1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0,1], got {default_rate}")
    rate_expr: Column = F.lit(float(default_rate))
    for s, r in sorted(rates.items()):
        rate_expr = F.when(
            F.col(strata_col) == F.lit(s), F.lit(float(r))
        ).otherwise(rate_expr)
    return df.filter(hash_frac(key_col, seed, domain=domain) < rate_expr)


def corpus_mix(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    total_rows: int,
    key_col: str,
    seed: int = 0,
    stats_out: dict | None = None,
) -> DataFrame:
    """Resample toward a target mixture: stratum ``s`` should supply
    ~``weights[s]/sum(weights)`` of a ~``total_rows``-row training
    corpus. Two passes: a tiny per-stratum count aggregate (map-side
    partial, result rows = #strata) fixes the per-stratum rates on the
    driver, then one ``stratified_sample`` filter applies them.
    Strata absent from ``weights`` are dropped. A stratum too small
    for its target keeps everything (rate clamps to 1.0) — the
    shortfall is reported in ``stats_out['unmet']`` rather than
    silently rebalanced (production mixing re-weights epochs instead;
    a silent rebalance would hide the data gap)."""
    if total_rows <= 0:
        raise ValueError(f"total_rows must be > 0, got {total_rows}")
    wsum = float(sum(weights.values()))
    if wsum <= 0 or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative with a positive sum")
    counts = {
        r[strata_col]: r["n"]
        for r in df.filter(F.col(strata_col).isin(list(weights)))
        .groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    rates: dict[str, float] = {}
    unmet: dict[str, int] = {}
    for s, w in weights.items():
        target = total_rows * w / wsum
        have = counts.get(s, 0)
        if have == 0:
            if target > 0:
                unmet[s] = int(round(target))
            continue
        if target > have:
            unmet[s] = int(round(target - have))
        rates[s] = min(1.0, target / have)
    if stats_out is not None:
        stats_out["rates"] = dict(rates)
        stats_out["unmet"] = unmet
    if unmet:
        _log.warning(
            "corpus_mix: %d strata cannot meet their target (%s); keeping "
            "all their rows", len(unmet), unmet,
        )
    return stratified_sample(
        df, strata_col, rates, key_col, default_rate=0.0, seed=seed
    )


def temperature_rates(
    counts: dict, alpha: float, total_rows: float | None = None,
) -> tuple[dict, dict, float]:
    """(rates, unmet, t) from per-stratum mass — the driver-side core
    of :func:`temperature_mix`, factored out so a STREAM can derive
    the same rates once from a reference corpus's counts (the landed
    clean table at stream start — a micro-batch is not a corpus) and
    apply them as a pinned pure row filter for the stream's lifetime,
    the curriculum pinned-edges pattern. Same math, same stratum for
    stratum: stratified_sample(df, col, rates, key, default_rate=0.0)
    over the SAME corpus equals temperature_mix's output exactly."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    if total_rows is not None and total_rows <= 0:
        raise ValueError(f"total_rows must be > 0, got {total_rows}")
    counts = {s: float(n) for s, n in counts.items() if n and n > 0}
    if not counts:
        return {}, {}, 0.0
    shares = {s: float(n) ** alpha for s, n in counts.items()}
    ssum = sum(shares.values())
    shares = {s: w / ssum for s, w in shares.items()}
    # largest achievable-without-upsampling corpus: the binding stratum
    # is the one whose natural count falls shortest of its target share
    t_max = min(counts[s] / p for s, p in shares.items())
    t = t_max if total_rows is None else float(total_rows)
    rates: dict[str, float] = {}
    unmet: dict[str, int] = {}
    for s, p in shares.items():
        target = t * p
        have = counts[s]
        if target > have:
            unmet[s] = int(round(target - have))
        rates[s] = min(1.0, target / have)
    return rates, unmet, t


def temperature_mix(
    df: DataFrame,
    strata_col: str,
    alpha: float,
    key_col: str,
    total_rows: int | None = None,
    seed: int = 0,
    stats_out: dict | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """Temperature-based mixture resampling: stratum ``s`` should supply
    a share proportional to ``count(s) ** alpha`` — the standard
    multilingual rebalance (alpha=1 keeps the natural distribution,
    alpha=0 targets uniform, alpha~0.3-0.7 up-weights tail languages
    without drowning the head). Unlike ``corpus_mix`` the weights come
    from the corpus itself, so no per-stratum weight list is needed —
    the right default when the stratum set is open-ended (hundreds of
    languages/sources).

    ``total_rows=None`` picks the LARGEST corpus achievable without
    upsampling (T = min_s count(s)/p(s)): every stratum meets its target
    exactly and no rate clamps. An explicit larger ``total_rows`` clamps
    over-asked strata to rate 1.0 and reports the shortfall in
    ``stats_out['unmet']`` (corpus_mix's no-silent-rebalance rule).

    Same execution shape as ``stratified_sample``: one tiny count
    aggregate fixes the rates on the driver, then a single scan-side
    hash filter applies them — no shuffle of the corpus. NULL-stratum
    rows are dropped (rate 0) and counted in
    ``stats_out['null_stratum_rows']``; a mixture needs a stratum
    label. Hash decisions share the sampling domain/seed universe:
    temperature_mix at seed k and with_split at seed k stay independent
    (the 'split' domain literal), while two temperature samples need
    distinct seeds to be independent.

    ``weight_col`` switches the mixture's unit from clips to a per-row
    weight — in practice the token count (packing's ``n_tokens``):
    language share in TRAINING is token share, and clip-count mixing
    over-serves languages with short clips. Stratum mass becomes
    ``sum(weight)`` (NULL weights count 0), shares become
    ``mass**alpha``, and ``total_rows`` is then a TOKEN budget. The
    per-row keep decision stays a Bernoulli hash filter at the
    stratum's rate, so the sampled token mass meets the target in
    expectation with no per-row weighting shuffle."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    if total_rows is not None and total_rows <= 0:
        raise ValueError(f"total_rows must be > 0, got {total_rows}")
    mass = (
        F.count(F.lit(1)).cast("double")
        if weight_col is None
        else F.sum(
            F.coalesce(F.col(weight_col).cast("double"), F.lit(0.0))
        )
    )
    rows = (
        df.groupBy(strata_col)
        .agg(mass.alias("n"))
        .collect()
    )
    counts = {r[strata_col]: (r["n"] or 0.0) for r in rows}
    null_rows = counts.pop(None, 0)
    # strata with zero mass can't supply anything — rate 0 (guards the
    # division below; only reachable with weight_col when every weight
    # in a stratum is NULL/0)
    counts = {s: n for s, n in counts.items() if n > 0}
    if not counts:
        if stats_out is not None:
            stats_out.update(
                {"rates": {}, "unmet": {}, "total_rows": 0,
                 "null_stratum_rows": null_rows}
            )
        return df.filter(F.lit(False))
    rates, unmet, t = temperature_rates(counts, alpha, total_rows)
    if stats_out is not None:
        stats_out["rates"] = dict(rates)
        stats_out["unmet"] = unmet
        stats_out["total_rows"] = int(round(t))
        stats_out["null_stratum_rows"] = null_rows
        # total_rows/unmet are in this unit (token budget vs clip count)
        stats_out["unit"] = weight_col or "rows"
    if unmet:
        _log.warning(
            "temperature_mix(alpha=%s): %d strata cannot meet their "
            "target (%s); keeping all their rows", alpha, len(unmet),
            unmet,
        )
    return stratified_sample(
        df, strata_col, rates, key_col, default_rate=0.0, seed=seed
    )


def with_quality_bin(
    df: DataFrame,
    score_col: str,
    n_bins: int = 10,
    out_col: str = "quality_bin",
    exact: bool = False,
    relative_error: float = 1e-4,
    edges: list[float] | None = None,
    stats_out: dict | None = None,
) -> DataFrame:
    """Assign each row a quantile bin of ``score_col`` (0 = lowest
    scores .. up to n_bins-1) — the strata for quality-curriculum
    sampling: compose with ``stratified_sample`` (per-bin keep rates,
    e.g. down-weight the bottom deciles) or ``cap_per_stratum``. NULL
    scores get a NULL bin (no quality evidence is not "lowest
    quality"); filter or rate them explicitly.

    Bin edges are the (1/n .. (n-1)/n) quantiles, computed once
    driver-side (``percentile_approx`` one-pass aggregate; ``exact=
    True`` switches to exact ``percentile`` for small/oracle corpora —
    at 10^12 rows exact quantiles mean a global sort, approx is the
    only sane default). Assignment is then a pure CASE-chain
    projection over the scan — no shuffle, no second pass, and the
    edges land in ``stats_out['bin_edges']`` so the binning is
    reproducible/auditable. Bin k covers edge[k-1] < x <= edge[k]
    (value-threshold semantics: a row equal to an edge takes the lower
    bin), and heavily-tied score distributions collapse duplicate
    edges: mass concentrated on one value yields fewer occupied bins
    rather than an arbitrary tie split (deterministic,
    partition-invariant — a rank-based ntile would tie-break by row
    order, which retries can change).

    ``edges`` pins the thresholds explicitly (len == n_bins-1,
    ascending) and skips the quantile job entirely — the production
    shape once a curriculum is calibrated: derived edges depend on the
    corpus slice they were computed from (a different shard count or a
    micro-batch sees different quantiles), pinned edges make the
    verdict a pure function of the row, identical across shardings,
    batch/stream paths and corpus growth."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    if edges is not None:
        if len(edges) != n_bins - 1:
            raise ValueError(
                f"need n_bins-1={n_bins - 1} pinned edges, "
                f"got {len(edges)}"
            )
        edges = [float(e) for e in edges]
        if any(a > b for a, b in zip(edges, edges[1:])):
            raise ValueError(f"pinned edges must be ascending: {edges}")
    else:
        qs = [i / n_bins for i in range(1, n_bins)]
        arr = f"array({', '.join(map(str, qs))})"
        edges_row = df.select(
            F.expr(
                f"percentile({score_col}, {arr})"
                if exact
                else f"percentile_approx({score_col}, {arr}, "
                f"{int(1.0 / relative_error)})"
            ).alias("e")
        ).first()
        edges = [float(e) for e in (edges_row["e"] or [])]
    if stats_out is not None:
        stats_out["bin_edges"] = list(edges)
    if not edges:  # empty / all-NULL input: every bin is NULL anyway
        return df.withColumn(
            out_col,
            F.when(F.col(score_col).isNotNull(), F.lit(0)).cast("int"),
        )
    expr: Column = F.lit(len(edges))  # top bin
    for k in range(len(edges) - 1, -1, -1):
        expr = F.when(
            F.col(score_col) <= F.lit(edges[k]), F.lit(k)
        ).otherwise(expr)
    return df.withColumn(
        out_col,
        F.when(F.col(score_col).isNotNull(), expr).cast("int"),
    )


def curriculum_filter(
    df: DataFrame,
    score_col: str,
    rates: list[float],
    key_col: str,
    seed: int = 0,
    edges: list[float] | None = None,
    stats_out: dict | None = None,
) -> DataFrame:
    """Quality-curriculum keep filter: quantile-bin ``score_col`` into
    ``len(rates)`` bins (``edges`` pins them; see ``with_quality_bin``)
    and keep bin k at ``rates[k]`` — the one entry point both the batch
    shard and the streaming sink call, so a clip reaches the same
    curriculum verdict on either path when edges are pinned.

    The keep decision hashes ``key_col`` in its own ``'curriculum'``
    domain (DESIGN #23): it composes independently with the language
    mixture / split decisions at equal seeds. NULL scores keep
    (default_rate 1.0): absent quality evidence is not evidence of low
    quality — rate them explicitly by filtering upstream if desired."""
    for k, r in enumerate(rates):
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for bin {k} must be in [0,1], got {r}")
    binned = with_quality_bin(
        df, score_col, n_bins=len(rates), edges=edges, stats_out=stats_out
    )
    return stratified_sample(
        binned, "quality_bin",
        {k: float(r) for k, r in enumerate(rates)},
        key_col, default_rate=1.0, seed=seed, domain="curriculum",
    ).drop("quality_bin")


def _split_band_expr(frac: Column, fractions: dict[str, float]) -> Column:
    """Map a uniform-[0,1) fraction onto cumulative ``fractions`` bands
    (insertion order)."""
    tot = float(sum(fractions.values()))
    if abs(tot - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1 (got {tot})")
    if any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be non-negative")
    expr: Column | None = None
    hi = 0.0
    names = list(fractions)
    for name in names[:-1]:
        hi += fractions[name]
        cond = frac < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def with_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    seed: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Assign a stable train/val/test split label per row: the hash
    fraction lands in cumulative ``fractions`` bands (insertion
    order). Fractions must sum to ~1. A row's split never changes as
    the corpus grows — the property that keeps eval sets uncontaminated
    across corpus versions (rand()-based splits reshuffle every run).
    The hash is domain-separated ('split') from sampling decisions, so
    running sampling and splitting with the SAME seed on the same keys
    still yields independent outcomes."""
    frac = hash_frac(key_col, seed, domain="split")
    return df.withColumn(out_col, _split_band_expr(frac, fractions))


def group_aware_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    components: DataFrame,
    seed: int = 0,
    out_col: str = "split",
    node_col: str = "node",
    comp_col: str = "comp",
) -> DataFrame:
    """``with_split`` that never tears a duplicate group across splits.

    Per-row splits leak evaluation data: two near-duplicate clips (one
    hash each) can land on opposite sides of the train/test boundary,
    and the model is then evaluated on paraphrases of its own training
    rows. The fix is to key the split hash on the duplicate GROUP, not
    the clip: ``components`` is the (node, comp) labeling that
    ``graph.connected_components`` derives from any union of dedup pair
    miners (exact / minhash / simhash / audio), and every member of a
    component hashes its component label. Clips absent from
    ``components`` (the vast majority — singletons with no dup
    evidence) hash their own key, which is bit-for-bit the
    ``with_split`` assignment: group-awareness REFINES the per-row
    split (same 'split' hash domain, same decision kind — singletons
    keep their labels; only dup-group members move, coherently, to
    their representative's band).

    Stability: labels change only when new dup EVIDENCE arrives. An
    edge that merges two groups re-keys the merged group to the new
    min-id representative — the whole group moves together, which is
    forced: two groups previously in different splits must end up in
    one.

    Scale shape: ``components`` holds only clips with dup evidence (a
    small fraction of the corpus, bounded by the miners' caps), so the
    left join is AQE-broadcastable; the split expression itself stays a
    pure projection. NULL component labels (shouldn't occur — CC labels
    are min ids) fall back to the row key via coalesce rather than
    hashing NULL."""
    comp = components.select(
        F.col(node_col).alias("__ga_node"),
        F.col(comp_col).alias("__ga_comp"),
    )
    rep = F.coalesce(F.col("__ga_comp"), F.col(key_col))
    frac = hash_frac(rep, seed, domain="split")
    return (
        df.join(comp, F.col(key_col) == F.col("__ga_node"), "left")
        .withColumn(out_col, _split_band_expr(frac, fractions))
        .drop("__ga_node", "__ga_comp")
    )


def split_leakage(
    df: DataFrame,
    edges: DataFrame,
    key_col: str,
    split_col: str = "split",
    src: str = "id_a",
    dst: str = "id_b",
) -> dict:
    """Count duplicate-pair edges that straddle split boundaries — the
    eval-contamination audit for a split assignment. Returns
    ``{"edges": N, "leaking": M, "by_split_pair": {...}}`` where
    ``leaking`` counts edges whose two endpoints carry different
    ``split_col`` labels (endpoints missing from ``df`` — e.g. clips
    quarantined after pair mining — don't count: there is nothing to
    leak). ``group_aware_split`` over the components of ``edges``
    makes this 0 by construction; ``with_split`` does not.

    Aggregate-only and edge-bounded: two joins of the (bounded) edge
    set against a (key, split) projection, then a #split²-row groupBy —
    never a corpus shuffle."""
    lab = df.select(
        F.col(key_col).alias("__sl_key"), F.col(split_col).alias("__sl_split")
    )
    a = lab.select(
        F.col("__sl_key").alias(src), F.col("__sl_split").alias("__sl_a")
    )
    b = lab.select(
        F.col("__sl_key").alias(dst), F.col("__sl_split").alias("__sl_b")
    )
    joined = edges.select(src, dst).join(a, src).join(b, dst)
    rows = (
        joined.groupBy("__sl_a", "__sl_b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    total = sum(r["n"] for r in rows)
    leaking = sum(r["n"] for r in rows if r["__sl_a"] != r["__sl_b"])
    pairs = {
        f"{r['__sl_a']}->{r['__sl_b']}": r["n"]
        for r in rows
        if r["__sl_a"] != r["__sl_b"]
    }
    return {"edges": total, "leaking": leaking, "by_split_pair": pairs}


def cap_per_stratum(
    df: DataFrame,
    strata_col: str,
    cap: int,
    key_col: str,
    seed: int = 0,
    prefilter: bool = True,
    margin: float = 2.0,
    stats_out: dict | None = None,
) -> DataFrame:
    """Keep exactly ``min(cap, n)`` rows per stratum — the rows with
    the smallest hash fractions (deterministic; ties broken by key).
    The head-count cap is how pipelines bound over-represented
    languages/sources when a plain rate undershoots small strata.

    Scale shape: the naive form is ``row_number() over (partition by
    stratum order by hash)`` — a full sort of every stratum, and the
    hot stratum serializes into one task. With ``prefilter=True`` a
    tiny count pass sets a per-stratum hash threshold at
    ``margin * cap / n`` so the window input shrinks to ~margin*cap
    rows per stratum first (same scan-side filter as
    ``stratified_sample``); the cap-smallest hashes among survivors
    are exactly the cap-smallest overall whenever the prefilter kept
    >= min(cap, n) rows, which is verified per stratum and any
    undershooting stratum (binomially rare at margin 2) falls back to
    the exact path for just that stratum."""
    if cap <= 0:
        raise ValueError(f"cap must be > 0, got {cap}")
    frac = hash_frac(key_col, seed)

    def _exact(d: DataFrame) -> DataFrame:
        w = (
            Window.partitionBy(strata_col)
            .orderBy(frac.asc(), F.col(key_col).asc())
        )
        return (
            d.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cap)
            .drop("_rn")
        )

    if not prefilter:
        return _exact(df)

    counts = {
        r[strata_col]: r["n"]
        for r in df.groupBy(strata_col).agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    rates = {
        s: min(1.0, margin * cap / n) for s, n in counts.items() if n > 0
    }
    # NULL strata and rate-1 strata skip the filter entirely
    thresh: Column = F.lit(1.0)
    for s, r in sorted((s, r) for s, r in rates.items() if s is not None):
        thresh = F.when(
            F.col(strata_col) == F.lit(s), F.lit(float(r))
        ).otherwise(thresh)
    survivors = df.filter(frac < thresh)
    got = {
        r[strata_col]: r["n"]
        for r in survivors.groupBy(strata_col).agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    short = [
        s
        for s, n in counts.items()
        if got.get(s, 0) < min(cap, n)
    ]
    if stats_out is not None:
        stats_out["prefilter_rates"] = rates
        stats_out["prefilter_short_strata"] = list(short)
    if short:
        _log.warning(
            "cap_per_stratum: prefilter undershot %d strata (%s); exact "
            "fallback for those", len(short), short[:10],
        )
        null_short = any(s is None for s in short)
        # coalesce: isin() is NULL (not False) for NULL strata under
        # three-valued logic — without it a NULL-stratum row fails BOTH
        # ~is_short and is_short filters and silently vanishes whenever
        # any other stratum falls back
        is_short = F.coalesce(
            F.col(strata_col).isin(
                [s for s in short if s is not None]
            ),
            F.lit(False),
        ) | (F.lit(null_short) & F.col(strata_col).isNull())
        survivors = survivors.filter(~is_short).unionByName(
            df.filter(is_short)
        )
    return _exact(survivors)
