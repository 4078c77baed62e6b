"""Similarity search over embedding columns (array<float>).

Two paths, per the scale playbook:

* brute-force cosine top-k — the exact baseline: broadcast the (small) query
  set, JVM-side dot products via zip_with/aggregate, per-query top-k without
  a global sort.
* hyperplane-LSH bucketed ANN — the scale path: sign-pattern bucket key from
  D deterministic random hyperplanes; candidates meet through an equi-join
  on the bucket, exact cosine re-rank inside buckets only.

Embedding near-dup detection reuses the same machinery with a cosine
threshold instead of top-k.
"""

from __future__ import annotations

import logging

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_log = logging.getLogger("clip_quality.similarity")


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k of ``corpus`` rows per query row.

    The query side is broadcast (it is small by construction); the corpus
    streams through map-side only — no corpus shuffle. Top-k per query via a
    window over the (tiny) query partitioning of the scored pairs.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col), F.col(vec_col).alias("_qvec")
        )
    )
    scored = corpus.select(
        F.col(id_col), F.col(vec_col)
    ).crossJoin(q).select(
        F.col(query_id_col),
        F.col(id_col),
        cosine_expr(F.col(vec_col), F.col("_qvec")).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim)).astype(np.float64)


def with_lsh_bucket(
    df: DataFrame, vec_col: str = "embedding",
    *, dim: int, n_planes: int = 8, seed: int = 7,
    out: str = "lsh_bucket",
) -> DataFrame:
    """Sign-pattern bucket id from deterministic random hyperplanes. The
    planes are literal arrays folded into the plan (a few KB) — no join.

    ``dim`` is a required keyword (enforced by the signature, so a
    missing value fails at the call site): an array<T> schema does not
    carry its length, and inferring it with a ``.first()`` would hide a
    driver-side Spark job inside a pure plan transformation."""
    return df.withColumn(
        out, _bucket_expr(vec_col, dim, n_planes, seed)
    )


def _bucket_expr(
    vec_col: str, dim: int | None, n_planes: int, seed: int
) -> Column:
    """Sign-pattern bucket id Column (the planes fold into the plan)."""
    if dim is None:
        raise ValueError(
            "LSH bucketing requires dim (the embedding length): the "
            "array column's schema does not carry it, and inferring it "
            "would trigger a hidden driver-side job per call"
        )
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        # one F.expr per plane instead of `dim` py4j F.lit calls — same
        # shortest-round-trip doubles, ~1/dim the driver-side plan-build
        # cost (the _cents_lit rationale, r06)
        plane = F.expr(
            "array("
            + ",".join(f"{float(v)!r}d" for v in planes[i])
            + ")"
        )
        bit = (_dot(F.col(vec_col), plane) > 0).cast("long")
        bucket = bucket.bitwiseOR(F.shiftleft(bit, i))
    return bucket


def _probe_flips(n_planes: int, multiprobe: int) -> list[int]:
    """Bucket-XOR masks for multiprobe radius 0, 1 or 2: the empty flip,
    every single-bit flip, and (radius 2) every two-bit flip."""
    if multiprobe not in (0, 1, 2):
        raise ValueError("multiprobe supports radius 0, 1 or 2")
    flips = [0]
    if multiprobe >= 1:
        flips += [1 << i for i in range(n_planes)]
    if multiprobe >= 2:
        flips += [
            (1 << i) | (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    return flips


def lsh_candidates(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 8,
    *,
    dim: int,
    n_tables: int = 1,
    multiprobe: int = 0,
    seed: int = 7,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Deduplicated LSH candidate set: one row per (query, corpus id) that
    shares a probed (table, bucket); carries ``vec_col`` and ``_qvec`` for
    re-ranking. Exposed separately from lsh_topk so callers can measure
    the scanned fraction (see the ann_recall harness query).

    ``broadcast_queries=False``: the query side meets the corpus through
    a shuffle join on (table, bucket) instead of a broadcast — required
    when the "query" side is itself corpus-scale (self-mining, e.g.
    mine_hard_negatives over every clip as its own anchor)."""
    buckets = F.posexplode(
        F.array(
            *[
                _bucket_expr(vec_col, dim, n_planes, seed + t)
                for t in range(n_tables)
            ]
        )
    ).alias("_tbl", "_bkt")
    c = corpus.select(F.col(id_col), F.col(vec_col), buckets)
    qb = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec"), buckets
    )
    if multiprobe:
        flips = F.array(
            *[F.lit(f) for f in _probe_flips(n_planes, multiprobe)]
        )
        qb = qb.withColumn("_flip", F.explode(flips)).select(
            F.col(query_id_col),
            F.col("_qvec"),
            F.col("_tbl"),
            F.col("_bkt").bitwiseXOR(F.col("_flip")).alias("_bkt"),
        )
    if broadcast_queries:
        qb = F.broadcast(qb)
    return c.join(qb, ["_tbl", "_bkt"]).dropDuplicates(
        [query_id_col, id_col]
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 8,
    *,
    dim: int,
    n_tables: int = 1,
    multiprobe: int = 0,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: candidates share a hyperplane-LSH bucket; exact
    cosine re-rank over the (deduplicated) candidate union.

    Recall knobs, in the standard LSH order of preference:

    * ``n_tables`` — independent hash tables (plane sets seeded
      seed..seed+T-1); candidates union across tables. Linear cost in T.
    * ``multiprobe`` — probe radius in bucket hamming space: 1 probes every
      single-bit-flip bucket too ((n_planes+1) probes per table); 2 adds
      every two-bit flip, catching neighbors that fall just across two
      hyperplanes. Only the QUERY side expands — the corpus still stores
      n_tables rows per vector.
    * fewer ``n_planes`` — bigger buckets (recall up, candidates up).

    Scale shape: the corpus emits n_tables (table, bucket) rows per vector
    via ONE posexplode; the probe-expanded query side is tiny and
    broadcast; candidates meet through the (table, bucket) equi-join —
    never a cross join. Measured on the harness corpora (3 queries, k=5):
    n_planes=9, n_tables=6, multiprobe=2 -> recall@5 = 0.93 (sf0.01) /
    1.00 (sf0.1) scanning ~45% of these SMALL corpora; the scanned
    fraction is ~n_tables*probes/2^n_planes, independent of corpus size
    (see ann_recall's scan_frac column). Radius-1 configs plateaued at
    0.87 here — the missed neighbors differ from their query across >= 2
    planes in every table.
    """
    cand = lsh_candidates(
        corpus, queries, id_col, vec_col, query_id_col, n_planes,
        dim=dim, n_tables=n_tables, multiprobe=multiprobe, seed=seed,
    )
    scored = cand.select(
        F.col(query_id_col),
        F.col(id_col),
        cosine_expr(F.col(vec_col), F.col("_qvec")).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def _seq_dot(a: list[float], b: list[float]) -> float:
    """Sequential left-to-right fold — matches both Spark's F.aggregate
    and DuckDB's list_dot_product step order, so driver-side seeding
    arithmetic reproduces bit-for-bit on the oracle side."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _kpp_seeds(
    corpus: DataFrame,
    n_centroids: int,
    id_col: str,
    vec_col: str,
    pool: int,
) -> list[list[float]]:
    """Deterministic farthest-point (kmeans++-style) seeding: take the
    ``pool`` candidates smallest by a Knuth multiplicative hash of the id
    (id-hash order, NOT corpus order — reproducible across runs/retries,
    no rand()), then greedily pick the candidate maximizing its min cosine
    distance to the already-chosen set (ties -> lowest hash, lowest id).
    Distances round to 9 decimals so the SQL oracle's double arithmetic
    agrees on every argmax. Resists the codebook collapse min-id seeding
    suffers when the smallest ids are near-duplicates; see DESIGN.md for
    measured recall on the harness corpora (min-id wins there — its low
    ids happen to be cluster-stratified; kpp is the defence against
    adversarial id orders)."""
    import math

    # the greedy loop below is driver-side O(pool * n_centroids) (the
    # min-distance dict amortizes the distance updates, but every pick
    # scans `rest` once) and the candidate pool is COLLECTED — a pool
    # raised toward corpus scale would turn seeding into the job's
    # bottleneck and blow the driver heap. Seeding quality plateaus far
    # below this cap; clamp loudly instead of degrading silently.
    _MAX_KPP_POOL = 50_000
    if pool > _MAX_KPP_POOL:
        _log.warning(
            "_kpp_seeds: pool=%d clamped to %d (driver-side greedy "
            "seeding; larger pools add cost, not quality)",
            pool, _MAX_KPP_POOL,
        )
        pool = _MAX_KPP_POOL

    h = F.pmod(
        F.pmod(F.col(id_col).cast("long"), F.lit(2147483648))
        * F.lit(2654435761),
        F.lit(2147483648),
    )
    cand = (
        corpus.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_v"),
            h.alias("_h"),
        )
        .orderBy("_h", "_id")
        .limit(pool)
        .collect()
    )
    # zero-norm vectors have no cosine direction — they cannot seed a
    # cell (and would divide by zero in the distance below)
    cand = [r for r in cand if any(x != 0.0 for x in r["_v"])]
    if not cand:
        return []

    def cosd(a, b):
        return round(
            1.0
            - _seq_dot(a, b)
            / (math.sqrt(_seq_dot(a, a)) * math.sqrt(_seq_dot(b, b))),
            9,
        )

    chosen = [cand[0]]
    rest = list(cand[1:])
    mind = {r["_id"]: cosd(r["_v"], cand[0]["_v"]) for r in rest}
    while len(chosen) < n_centroids and rest:
        nxt = None
        best = -float("inf")
        for r in rest:  # rest stays (hash, id)-ordered: '>' keeps first
            if mind[r["_id"]] > best:
                best = mind[r["_id"]]
                nxt = r
        chosen.append(nxt)
        rest.remove(nxt)
        for r in rest:
            d = cosd(r["_v"], nxt["_v"])
            if d < mind[r["_id"]]:
                mind[r["_id"]] = d
    return [list(map(float, r["_v"])) for r in chosen]


def ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 0,
    seeding: str = "min_id",
    pool: int | None = None,
) -> list[list[float]]:
    """Deterministic IVF codebook, optionally refined by ``iters`` Lloyd
    steps run as Spark aggregations.

    ``seeding``:

    * ``"min_id"`` (default) — seeds are the ``n_centroids`` smallest ids.
      Reproducible across runs/retries (no rand()); collapses if the
      lowest ids happen to be near-duplicates.
    * ``"kpp"`` — deterministic farthest-point over an id-hash-ordered
      candidate pool (``pool``, default max(4*n_centroids, 32)); immune
      to id-order pathologies at the cost of favoring outliers as seeds.
      Measured on the harness corpora min_id wins (DESIGN.md), so it
      stays the default; use kpp when id order correlates with content.

    One Lloyd step = assign (argmax cosine against the broadcast-literal
    codebook, map-side only) -> posexplode vectors -> groupBy(cell, pos)
    avg -> collect the (n_centroids x dim) means. The shuffle is keyed on
    (cell, pos): n_centroids*dim groups regardless of corpus size, with
    map-side partial aggregation — scale-safe at 10^12 rows.
    """
    if seeding == "kpp":
        cents = _kpp_seeds(
            corpus, n_centroids, id_col, vec_col,
            pool or max(4 * n_centroids, 32),
        )
    elif seeding == "min_id":
        seeds = (
            corpus.select(id_col, vec_col)
            .orderBy(F.col(id_col).asc())
            .limit(n_centroids)
            .collect()
        )
        cents = [list(map(float, r[vec_col])) for r in seeds]
    else:
        raise ValueError(f"unknown seeding {seeding!r}")
    # corpus smaller than the requested codebook: shrink, don't crash
    n_centroids = len(cents)
    for _ in range(iters):
        assigned = with_ivf_cell(corpus, cents, vec_col=vec_col)
        means = (
            assigned.select(
                "ivf_cell", F.posexplode(F.col(vec_col)).alias("pos", "x")
            )
            .groupBy("ivf_cell", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r["ivf_cell"], {})[r["pos"]] = r["m"]
        cents = [
            [by_cell[c][p] for p in sorted(by_cell[c])]
            if c in by_cell
            else cents[c]  # empty cell keeps its old centroid
            for c in range(n_centroids)
        ]
    return cents


def _cents_lit(cents: list[list[float]]) -> Column:
    """Literal array<array<double>> codebook in ONE expression call.

    Building it as nested F.array(F.lit(...)) costs one py4j round trip
    per element — ~0.5 s of driver time per query for an 8x64 codebook
    referenced twice (r06 measurement); a single F.expr with 'd'-suffixed
    double literals is one call. repr() is shortest-round-trip, so the
    parsed doubles are bit-identical to the F.lit path."""
    body = ",".join(
        "array(" + ",".join(f"{float(x)!r}d" for x in c) + ")"
        for c in cents
    )
    return F.expr(f"array({body})")


def with_ivf_cell(
    df: DataFrame,
    cents: list[list[float]],
    vec_col: str = "embedding",
    out: str = "ivf_cell",
) -> DataFrame:
    """0-based nearest-centroid id by cosine; ties break to the lowest
    cell (array_position finds the first maximum). The codebook is a plan
    literal — no join, map-side only."""
    sims = F.transform(
        _cents_lit(cents),
        lambda c: _dot(F.col(vec_col), c) / (_norm(F.col(vec_col)) * _norm(c)),
    )
    cell = (F.array_position(sims, F.array_max(sims)) - 1).cast("int")
    return df.withColumn(out, cell)


def ivf_candidates(
    corpus: DataFrame,
    queries: DataFrame,
    cents: list[list[float]],
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    assigned: bool = False,
    broadcast_queries: bool = True,
) -> DataFrame:
    """One row per (query, corpus id) whose cell is among the query's
    ``n_probe`` best cells; carries ``vec_col`` and ``_qvec`` for
    re-ranking. A corpus vector lives in exactly one cell, so the set is
    duplicate-free by construction. Exposed separately from ivf_topk so
    callers can measure the scanned fraction (ann_recall).

    ``assigned=True``: the corpus already carries its ``ivf_cell``
    column (the persisted-index path — assignment was paid once at
    write time, not per query batch).

    ``broadcast_queries=False``: candidates meet through a shuffle join
    on ivf_cell instead of broadcasting the query side — required when
    the query side is corpus-scale (self-mining)."""
    c = corpus if assigned else with_ivf_cell(corpus, cents, vec_col)
    sims = F.transform(
        _cents_lit(cents),
        lambda cc: _dot(F.col(vec_col), cc)
        / (_norm(F.col(vec_col)) * _norm(cc)),
    )
    # each query row -> n_probe rows keyed by probed cell; sort key is
    # struct(-sim, cell) so ascending order = sim desc, ties -> lowest cell
    ranked_cells = F.slice(
        F.array_sort(
            F.zip_with(
                sims,
                F.sequence(F.lit(0), F.lit(len(cents) - 1)),
                lambda s, i: F.struct((-s).alias("s"), i.alias("i")),
            )
        ),
        1,
        n_probe,
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qvec"),
        F.explode(F.transform(ranked_cells, lambda x: x["i"])).alias(
            "ivf_cell"
        ),
    )
    if broadcast_queries:
        q = F.broadcast(q)
    return c.join(q, "ivf_cell")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_centroids: int = 16,
    n_probe: int = 4,
    iters: int = 0,
    cents: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus rows are inverted-listed by nearest
    centroid; each query probes its ``n_probe`` nearest cells and re-ranks
    exact cosine inside them only.

    Scale shape: the codebook is a literal (KBs); cell assignment is a
    map-side projection on both sides; candidates meet through an equi-join
    on ivf_cell (never a cross join); per-query top-k via a window over the
    small scored candidate set. Recall/cost dial = n_probe/n_centroids.
    """
    if cents is None:
        cents = ivf_centroids(corpus, n_centroids, id_col, vec_col, iters)
    cand = ivf_candidates(
        corpus, queries, cents, n_probe, id_col, vec_col, query_id_col
    )
    scored = cand.select(
        F.col(query_id_col),
        F.col(id_col),
        cosine_expr(F.col(vec_col), F.col("_qvec")).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def embedding_near_dups(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float = 0.95,
    n_planes: int = 8,
    *,
    dim: int,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine, LSH-bucketed: only pairs in
    the same bucket are scored (misses across-bucket pairs near the planes —
    run with 2 seeds and union for higher recall)."""
    b = with_lsh_bucket(df, vec_col, dim=dim, n_planes=n_planes)
    left = b.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"),
        "lsh_bucket",
    )
    right = b.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"),
        "lsh_bucket",
    )
    return (
        left.join(right, "lsh_bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            cosine_expr(F.col("v_a"), F.col("v_b")).alias("cosine"),
        )
        .filter(F.col("cosine") >= min_cosine)
    )


def embedding_near_dups_incremental(
    new_df: DataFrame,
    history_df: DataFrame | None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float = 0.95,
    n_planes: int = 8,
    *,
    dim: int,
    keep_flags: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Incremental cross-run semantic dedup: near-dup pairs with >= 1
    NEW side against a persisted (id, embedding) history — the
    embedding analogue of the minhash/simhash/audio incremental miners
    (same union-tagged shape; the bucket hash is one projection per
    row, so history costs no re-scoring of history-internal pairs,
    which is the quadratic term a full recompute pays every run).
    Returns ``(pairs, new_vecs)``: thresholded (id_a, id_b, cosine)
    pairs touching a new vector, and the new batch's (id, vec) frame to
    append to the history table after the run commits
    (incremental_embedding_run).

    Equivalence (tested): with the same planes/threshold,
    ``full(history ∪ new) == full(history) ∪ incremental(new,
    history)`` — banding runs over the union, and each pair shares
    exactly one bucket key (the bucket is the FULL plane signature), so
    no distinct shuffle is needed. Same recall caveat as
    embedding_near_dups: pairs split across a plane are missed; union
    two seeds for higher recall. ``keep_flags=True`` appends new_a /
    new_b side-attribution columns."""
    tagged = new_df.select(
        F.col(id_col), F.col(vec_col)
    ).withColumn("_new", F.lit(True))
    if history_df is not None:
        tagged = (
            history_df.select(F.col(id_col), F.col(vec_col))
            .withColumn("_new", F.lit(False))
            .unionByName(tagged)
        )
    b = with_lsh_bucket(tagged, vec_col, dim=dim, n_planes=n_planes)
    left = b.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"),
        F.col("_new").alias("_new_a"), "lsh_bucket",
    )
    right = b.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"),
        F.col("_new").alias("_new_b"), "lsh_bucket",
    )
    out = [
        F.col("id_a"), F.col("id_b"),
        cosine_expr(F.col("v_a"), F.col("v_b")).alias("cosine"),
    ]
    if keep_flags:
        out += [
            F.col("_new_a").alias("new_a"),
            F.col("_new_b").alias("new_b"),
        ]
    pairs = (
        left.join(right, "lsh_bucket")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("_new_a") | F.col("_new_b"))
        )
        .select(*out)
        .filter(F.col("cosine") >= min_cosine)
    )
    return pairs, new_df.select(F.col(id_col), F.col(vec_col))


def incremental_embedding_run(
    store, table: str, new_df: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
    source_fingerprint: str | None = None,
    **kwargs,
) -> DataFrame | None:
    """Embedding ingest round against a TableStore-backed (id, vec)
    history (commit protocol: dedup._incremental_run — materialize the
    pairs from the pre-append snapshot, then append the new vectors;
    fingerprint-idempotent replays)."""
    from .dedup import _incremental_run

    return _incremental_run(
        store, table, new_df,
        lambda new, hist: embedding_near_dups_incremental(
            new, hist, id_col, vec_col, **kwargs
        ),
        source_fingerprint, "incremental_embedding_run",
    )


# ---------------------------------------------------------------------------
# Persisted IVF index (TableStore-backed: build once, append, probe-prune)
# ---------------------------------------------------------------------------


def _ivf_tables(name: str) -> tuple[str, str]:
    return f"{name}_centroids", f"{name}_vectors"


def ivf_index_build(
    store, name: str, corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id", vec_col: str = "embedding",
    iters: int = 0, seeding: str = "min_id",
    source_fingerprint: str | None = None,
) -> list[list[float]]:
    """Train and persist an IVF index as two TableStore tables:
    ``<name>_centroids`` (ivf_cell, centroid) — the FROZEN codebook —
    and ``<name>_vectors`` (id, vec, ivf_cell), written partitioned BY
    CELL so each data file's ivf_cell stats are exact (hive-path
    min==max) and a probe reads only the probed cells' files through
    ``read(prune=[('ivf_cell','in', cells)])`` — manifest-level
    inverted lists. The per-query-batch cost the ad-hoc path pays
    (re-assigning the whole corpus, ``ivf_candidates(assigned=False)``)
    is paid ONCE here at write time. Returns the codebook."""
    cents = ivf_centroids(
        corpus, n_centroids, id_col, vec_col, iters, seeding,
    )
    cent_t, vec_t = _ivf_tables(name)
    spark = corpus.sparkSession
    cent_rows = [(i, list(map(float, c))) for i, c in enumerate(cents)]
    store.write(
        cent_t,
        spark.createDataFrame(
            cent_rows, "ivf_cell int, centroid array<double>"
        ),
        properties=(
            {"source_fingerprint": source_fingerprint}
            if source_fingerprint is not None else None
        ),
    )
    assigned = with_ivf_cell(
        corpus.select(id_col, vec_col), cents, vec_col
    )
    store.write(
        vec_t, assigned, partition_by=["ivf_cell"],
        properties=(
            {"source_fingerprint": source_fingerprint}
            if source_fingerprint is not None else None
        ),
    )
    return cents


def ivf_index_centroids(store, name: str) -> list[list[float]]:
    """Load the frozen codebook back from the centroids table."""
    cent_t, _ = _ivf_tables(name)
    rows = store.read(cent_t).collect()
    by_cell = {r["ivf_cell"]: list(map(float, r["centroid"])) for r in rows}
    return [by_cell[i] for i in range(len(by_cell))]


def ivf_index_append(
    store, name: str, new_df: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
    source_fingerprint: str | None = None,
) -> int | None:
    """Assign NEW vectors against the frozen codebook and append them to
    the vectors table — existing assignments never move (an IVF index
    ages as the corpus drifts from the training sample; rebuild via
    ivf_index_build when recall degrades, the standard reindex
    tradeoff). Fingerprint-idempotent: returns None on an exact replay
    of an already-appended batch, else the number of rows appended."""
    cent_t, vec_t = _ivf_tables(name)
    if source_fingerprint is not None and store.exists(vec_t) and (
        store.is_unchanged(vec_t, source_fingerprint)
    ):
        return None
    cents = ivf_index_centroids(store, name)
    assigned = with_ivf_cell(
        new_df.select(id_col, vec_col), cents, vec_col
    )
    n = assigned.count()
    store.write(
        vec_t, assigned, mode="append", partition_by=["ivf_cell"],
        properties=(
            {"source_fingerprint": source_fingerprint}
            if source_fingerprint is not None else None
        ),
    )
    return n


def ivf_index_topk(
    store, name: str, queries: DataFrame,
    k: int = 10, n_probe: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
    query_id_col: str = "query_id",
    scan_stats: dict | None = None,
) -> DataFrame:
    """Top-k against the persisted index: rank each query's ``n_probe``
    cells against the frozen codebook (driver-side — the query batch is
    the small side by contract), then read ONLY the files of the probed
    cells via the 'in' manifest prune and re-rank exact cosine inside
    them. Equals ivf_topk(cents=<frozen codebook>) row-for-row (tested);
    the difference is the scan: the ad-hoc path touches the whole corpus
    per query batch, this path touches files covering the probed cells
    (pass ``scan_stats`` to observe files_kept/files_skipped)."""
    import numpy as np

    cents = ivf_index_centroids(store, name)
    _, vec_t = _ivf_tables(name)
    qrows = queries.select(query_id_col, vec_col).collect()
    c = np.array(cents, dtype="float64")
    cn = np.linalg.norm(c, axis=1)
    probe_cells: set[int] = set()
    probes = []
    for r in qrows:
        v = np.array(list(r[vec_col]), dtype="float64")
        sims = (c @ v) / (cn * (np.linalg.norm(v) or 1.0))
        # sim desc, ties -> lowest cell (matches ivf_candidates' sort)
        order = np.lexsort((np.arange(len(cents)), -sims))[:n_probe]
        cells = [int(x) for x in order]
        probe_cells.update(cells)
        probes.append((r[query_id_col], list(map(float, r[vec_col])), cells))
    spark = queries.sparkSession
    # mirror the queries' own types (query ids may be strings, vectors
    # float or double — a hardcoded schema would silently change the
    # cosine's precision vs the ad-hoc path)
    from pyspark.sql.types import IntegerType, StructField, StructType

    qschema = StructType(
        [
            queries.schema[query_id_col],
            StructField("_qvec", queries.schema[vec_col].dataType),
            StructField("ivf_cell", IntegerType()),
        ]
    )
    qdf = spark.createDataFrame(
        [(qid, qv, cell) for qid, qv, cells in probes for cell in cells],
        qschema,
    )
    corpus = store.read(
        vec_t,
        prune=[("ivf_cell", "in", sorted(probe_cells))],
        scan_stats=scan_stats,
    )
    cand = corpus.join(F.broadcast(qdf), "ivf_cell")
    scored = cand.select(
        F.col(query_id_col),
        F.col(id_col),
        cosine_expr(F.col(vec_col), F.col("_qvec")).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# Hard-negative mining (contrastive training pairs)
# ---------------------------------------------------------------------------


def mine_hard_negatives(
    corpus: DataFrame,
    anchors: DataFrame | None = None,
    k: int = 5,
    band_hi: float = 0.95,
    band_lo: float | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    anchor_id_col: str = "anchor_id",
    method: str = "brute",
    *,
    dim: int | None = None,
    n_planes: int = 8,
    n_tables: int = 1,
    multiprobe: int = 0,
    seed: int = 7,
    cents: list[list[float]] | None = None,
    n_centroids: int = 16,
    n_probe: int = 4,
    broadcast_anchors: bool = True,
) -> DataFrame:
    """Per-anchor hard negatives for contrastive (CLAP/CLIP-style)
    training: the ``k`` corpus rows MOST similar to each anchor that are
    still safely not-the-same-content — i.e. ranked by cosine desc
    within the band ``[band_lo, band_hi)``. ``band_hi`` excludes
    near-duplicates (an undetected dup used as a "negative" is a false
    negative that actively damages a contrastive objective — it is the
    same content wearing a different id); ``band_lo`` optionally skips
    easy negatives a model separates for free. Self-pairs
    (anchor id == corpus id) are always excluded, so ``anchors`` may be
    a subset of — or exactly — the corpus.

    Returns (anchor_id, id_col, cosine, rank) with rank 1..k per
    anchor, ties broken ascending id (deterministic across retries and
    partitionings, the repo invariant).

    ``anchors=None`` mines the whole corpus against itself.

    Methods (same dial as top-k search):

    * ``'brute'`` — exact; the anchor side is broadcast. For bounded
      anchor sets (a training batch, an eval probe) or oracle checks.
    * ``'lsh'`` — hyperplane-LSH candidates (requires ``dim``); recall
      knobs n_tables/multiprobe as lsh_topk.
    * ``'ivf'`` — inverted-file candidates (codebook trained via
      ivf_centroids unless ``cents`` is given); knobs
      n_centroids/n_probe as ivf_topk.

    Scale shape: with ``broadcast_anchors=False`` the lsh/ivf candidate
    generators join anchors to the corpus through a SHUFFLE equi-join on
    the bucket/cell key — corpus-scale self-mining never broadcasts and
    never cross-joins; the per-anchor re-rank window runs over the
    bounded candidate set only. 'brute' refuses broadcast_anchors=False
    (a non-broadcast exact path would be an all-pairs cross join — use
    'lsh' or 'ivf' at scale)."""
    if anchors is None:
        anchors = corpus
    a = anchors.select(
        F.col(id_col).alias(anchor_id_col), F.col(vec_col)
    )
    if method == "brute":
        if not broadcast_anchors:
            raise ValueError(
                "mine_hard_negatives(method='brute') requires the "
                "anchor side to be broadcastable; use method='lsh' or "
                "'ivf' for corpus-scale anchors"
            )
        q = F.broadcast(
            a.select(
                F.col(anchor_id_col), F.col(vec_col).alias("_qvec")
            )
        )
        cand = corpus.select(F.col(id_col), F.col(vec_col)).crossJoin(q)
    elif method == "lsh":
        cand = lsh_candidates(
            corpus, a, id_col, vec_col, anchor_id_col, n_planes,
            dim=dim, n_tables=n_tables, multiprobe=multiprobe,
            seed=seed, broadcast_queries=broadcast_anchors,
        )
    elif method == "ivf":
        if cents is None:
            cents = ivf_centroids(corpus, n_centroids, id_col, vec_col)
        cand = ivf_candidates(
            corpus, a, cents, n_probe, id_col, vec_col, anchor_id_col,
            broadcast_queries=broadcast_anchors,
        )
    else:
        raise ValueError(
            f"mine_hard_negatives: unknown method {method!r} "
            "(expected 'brute', 'lsh' or 'ivf')"
        )
    scored = cand.filter(
        F.col(id_col) != F.col(anchor_id_col)
    ).select(
        F.col(anchor_id_col),
        F.col(id_col),
        cosine_expr(F.col(vec_col), F.col("_qvec")).alias("cosine"),
    ).filter(F.col("cosine") < F.lit(float(band_hi)))
    if band_lo is not None:
        scored = scored.filter(F.col("cosine") >= F.lit(float(band_lo)))
    w = Window.partitionBy(anchor_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(anchor_id_col, id_col, "cosine", "rank")
    )
