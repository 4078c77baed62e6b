"""Connected components over candidate-pair edges — dedup GROUP closure.

The pairwise dedup operators (minhash_lsh_pairs, simhash_pairs,
ngram_jaccard_pairs, embedding_near_dups) emit edges; production dedup
keeps one survivor per *transitively connected* group, which needs the
components of that graph. The reference has no analogue (its duplicate
notion is exact-key only, validator.py:76-82); this is the standard
training-data-pipeline extension.

Algorithm: iterative min-label propagation expressed as DataFrame joins
(the classic Spark CC shape; see also "large-star/small-star", Kiveris et
al.). Each iteration every node takes the min component id among itself
and its neighbors; converges in O(graph diameter) rounds — near-dup
clusters are shallow (diameter ~ a few), so 3-6 rounds in practice.

Scale shape per iteration: one shuffle join (edges x labels, keyed on the
node id) + one groupBy min. Edges are the SMALL candidate-pair set (LSH
output), not the corpus. Convergence check is a count() action per round
(cheap: labels are (id, long) pairs). max_iter bounds pathological chains.
"""

from __future__ import annotations

import logging
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_log = logging.getLogger("clip_quality.graph")


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for any scheme Spark can reach — the round files
    may live on HDFS/S3A, so listing/deleting must go through the Hadoop
    FS API, not os.*."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def _complete_rounds(spark: SparkSession, run_dir: str) -> list[int]:
    """Round indices under run_dir whose parquet write finished
    (_SUCCESS present) — a crash mid-write leaves no marker, so a
    resuming driver never trusts a torn round."""
    jvm = spark._jvm
    fs, jdir = _hadoop_fs(spark, run_dir)
    if not fs.exists(jdir):
        return []
    out = []
    for st in fs.listStatus(jdir):
        name = st.getPath().getName()
        if name.startswith("round_"):
            succ = jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")
            if fs.exists(succ):
                out.append(int(name[len("round_"):]))
    return sorted(out)


def _driver_union_find(edge_rows, node_type, spark) -> DataFrame:
    """Exact CC for small graphs, solved on the driver: union-find with
    path compression, then comp = min node id per component — the same
    fixed point min-label propagation reaches. One collect + O(E α(E))
    compute replaces rounds of distributed job waves."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for u, v in edge_rows:
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    comp_min: dict = {}
    roots = {n: find(n) for n in parent}
    for n, r in roots.items():
        if r not in comp_min or n < comp_min[r]:
            comp_min[r] = n
    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        [StructField("node", node_type), StructField("comp", node_type)]
    )
    return spark.createDataFrame(
        [(n, comp_min[r]) for n, r in roots.items()], schema
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
    run_tag: str | None = None,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component
    = min node id reachable through the undirected edge set.

    Raises RuntimeError if labels have not converged after ``max_iter``
    rounds (a component with diameter > max_iter, e.g. a near-dup CHAIN
    of templated documents): returning intermediate labels would silently
    split one true group into several and leave extra "survivors" behind.
    Convergence stops early, so a generous cap costs nothing on the
    shallow graphs near-dup candidates produce.

    Per-round lineage truncation (iterative joins otherwise stack an
    exponentially re-evaluated plan):

    * ``checkpoint_dir=None`` (default): ``localCheckpoint`` — blocks live
      on executors. Right for local/single-JVM runs, but on a real cluster
      an executor loss mid-iteration makes the truncated lineage
      unrecoverable and kills the job.
    * ``checkpoint_dir=<fault-tolerant path>``: each round's labels —
      (id, long) pairs, tiny relative to the corpus — are written to
      ``<dir>/cc_<run_tag>/round_<i>`` parquet and read back, so the
      iteration survives executor loss. This is the 100-TB
      configuration; point it at the job's durable storage (e.g. the
      TableStore root).

    ``run_tag`` scopes the round files to ONE invocation: concurrent CC
    jobs sharing a checkpoint dir never overwrite each other's rounds
    (omitted -> a fresh uuid tag, fully isolated). Passing a STABLE tag
    additionally makes the call resumable after driver loss: a rerun
    with the same (checkpoint_dir, run_tag, edges) picks up from the
    last complete round's files (torn writes are ignored — only rounds
    with a _SUCCESS marker count), and if the prior run already
    converged its ``final`` labels are returned without re-iterating.
    Resuming from any valid intermediate labeling is safe: labels only
    decrease and never below the component minimum, so the fixed point
    is unchanged. Do NOT reuse a tag across different edge sets.

    On convergence all round_<i> dirs are deleted; only
    ``<dir>/cc_<run_tag>/final`` (the result the returned DataFrame
    reads from) remains — remove it once the result is consumed.

    ``driver_threshold``: when ``checkpoint_dir`` is None AND the
    symmetrized edge-row count (2x the undirected edges) is at or
    below this, the components
    are solved by a driver-side union-find instead of iterative joins —
    identical output (comp = min reachable id), one collect + linear
    compute instead of O(log d) full job waves. Near-dup edge sets are
    usually tiny relative to the corpus, so this is the common case;
    the distributed path engages automatically above the threshold and
    ALWAYS when a checkpoint_dir is given (durability was requested —
    a driver-held edge list has none). 0 disables the shortcut.
    """
    spark = edges.sparkSession
    run_dir = None
    start_it = 0
    resume_labels = None
    if checkpoint_dir is not None:
        tag = run_tag or uuid.uuid4().hex[:12]
        run_dir = f"{checkpoint_dir}/cc_{tag}"
        if run_tag is not None:
            jvm = spark._jvm
            fs, _ = _hadoop_fs(spark, run_dir)
            if fs.exists(
                jvm.org.apache.hadoop.fs.Path(f"{run_dir}/final/_SUCCESS")
            ):
                # prior run with this tag converged (possibly crashing
                # between the final write and round cleanup — sweep now)
                _delete_rounds(spark, run_dir)
                return spark.read.parquet(f"{run_dir}/final")
            done = _complete_rounds(spark, run_dir)
            if done:
                start_it = done[-1] + 1
                resume_labels = spark.read.parquet(
                    f"{run_dir}/round_{done[-1]}"
                )
    und = (
        # symmetrize in ONE pass: a union of two selects over `edges`
        # evaluates the (often expensive — a candidate-pair self-join)
        # edge subtree TWICE; exploding a 2-element struct array emits
        # both orientations from a single evaluation (r06, guide §2.4:
        # doc_dup_components measured 5.2 s -> the edge pipeline was its
        # dominant cost and ran 2x here plus once per downstream read)
        edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(src).alias("u"), F.col(dst).alias("v")
                    ),
                    F.struct(
                        F.col(dst).alias("u"), F.col(src).alias("v")
                    ),
                )
            ).alias("_e")
        )
        .select("_e.u", "_e.v")
        .distinct()
        # every iteration joins against und: without this cache the
        # upstream edge computation (often an expensive candidate-pair
        # self-join) re-evaluates once PER ROUND. The edge set is small
        # by construction (near-dup pairs, not the corpus) and is
        # unpersisted before returning.
        .cache()
    )
    if checkpoint_dir is None and driver_threshold > 0:
        head = und.limit(driver_threshold + 1).collect()
        if len(head) <= driver_threshold:
            und.unpersist()
            return _driver_union_find(
                [(r["u"], r["v"]) for r in head],
                und.schema["u"].dataType,
                edges.sparkSession,
            )
        # over threshold: fall through to the distributed iteration
        # (the limit+collect cost one evaluation of the cached edge set,
        # which the first round needed anyway)
    labels = resume_labels if resume_labels is not None else (
        und.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    changed = -1
    for it in range(start_it, start_it + max_iter):
        nbr_min = (
            und.join(
                labels.select(
                    F.col("node").alias("v"), F.col("comp").alias("vcomp")
                ),
                "v",
            )
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("vcomp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce("nbr_comp", "comp")
                ).alias("comp"),
            )
        )
        # pointer jump (path compression): comp <- label[comp]. Labels
        # only decrease, so label[comp] <= comp and each round roughly
        # halves every node's distance to its component minimum —
        # convergence in O(log diameter) rounds instead of O(diameter),
        # i.e. fewer shuffles AND fewer checkpoints on deep near-dup
        # chains (templated doc series). The pre-jump labels are cached
        # first: they appear on BOTH sides of the self-join, and without
        # materialization the neighbor-min aggregate above would be
        # computed twice per round.
        pre_jump = new_labels.cache()
        new_labels = (
            pre_jump.alias("l")
            .join(
                pre_jump.select(
                    F.col("node").alias("comp"),
                    F.col("comp").alias("_cc"),
                ).alias("p"),
                "comp",
                "left",
            )
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce("_cc", F.col("comp"))
                ).alias("comp"),
            )
        )
        if checkpoint_dir is None:
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            path = f"{run_dir}/round_{it}"
            new_labels.write.mode("overwrite").parquet(path)
            new_labels = spark.read.parquet(path)
        pre_jump.unpersist()  # checkpointed labels no longer depend on it
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    # labels is checkpointed (independent lineage), so releasing the edge
    # cache cannot force recomputation downstream
    und.unpersist()
    if changed != 0:
        # round files are deliberately KEPT: with a stable run_tag the
        # caller can resume from the last complete round
        where = f" (round files kept under {run_dir})" if run_dir else ""
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            f"iterations ({changed} labels still changing) — a component "
            f"diameter exceeds max_iter; raise max_iter{where}"
        )
    if run_dir is not None:
        # persist the result, then sweep the per-round files (ADVICE r02:
        # they accumulated forever and fixed names collided across jobs)
        labels.select("node", "comp").write.mode("overwrite").parquet(
            f"{run_dir}/final"
        )
        labels = spark.read.parquet(f"{run_dir}/final")
        _delete_rounds(spark, run_dir)
    return labels.select("node", "comp")


def _delete_rounds(spark: SparkSession, run_dir: str) -> None:
    fs, jdir = _hadoop_fs(spark, run_dir)
    if not fs.exists(jdir):
        return
    for st in fs.listStatus(jdir):
        if st.getPath().getName().startswith("round_"):
            fs.delete(st.getPath(), True)


def dedup_survivors_by_component(
    df: DataFrame,
    components: DataFrame,
    id_col: str,
    quality_col: str | None = None,
) -> DataFrame:
    """Keep one deterministic survivor per near-dup group; rows not in
    any component survive untouched.

    Default policy: min id — free, because the component LABEL already
    is the group's min id, so non-survivors are simply the rows where
    node != comp (no extra join). With ``quality_col`` (numeric column
    on ``df``), the survivor is instead the group's argmax-quality
    member (ties -> min id, NULL quality loses) — production pipelines
    keep the BEST copy of a dup cluster, not the first-ingested one.
    Cost shape: one narrow join components⋈(id, quality) + one groupBy
    over components (both bounded by the dup-cluster rows, not the
    corpus) + the same left_anti."""
    if quality_col is None:
        dupes = components.filter(F.col("node") != F.col("comp")).select(
            F.col("node").alias(id_col)
        )
        return df.join(dupes, id_col, "left_anti")
    from .dedup import _argmax_quality

    members = components.join(
        df.select(
            F.col(id_col).alias("node"),
            F.col(quality_col).alias("_q"),
        ),
        "node",
    )
    best = members.groupBy("comp").agg(
        _argmax_quality(F.col("node"), "_q").alias("_keep")
    )
    dupes = (
        members.join(best, "comp")
        .filter(F.col("node") != F.col("_keep"))
        .select(F.col("node").alias(id_col))
    )
    return df.join(dupes, id_col, "left_anti")


def connected_components_incremental(
    new_edges: DataFrame,
    prior_labels: DataFrame | None,
    src: str = "id_a",
    dst: str = "id_b",
    **cc_kwargs,
) -> DataFrame:
    """(node, comp) for the graph (prior structure ∪ new edges) WITHOUT
    re-processing the prior edge set — the closure-side counterpart of
    the incremental pair miners: each ingest round mines only
    new-involving pairs, and this folds them into the standing
    component labeling.

    ``prior_labels`` is the (node, comp) output of an earlier
    connected_components / this function. It is compressed structure:
    each component becomes a STAR (node -> comp edges, self-edge for
    the label node), which preserves connectivity exactly, and the
    min-id fixed point is unchanged — a component's label IS its
    minimum member, every old member appears as a star node, so a
    merged component's minimum is still the minimum over all members.
    At scale this is the point: the cumulative edge set grows with dup
    density ~quadratically per cluster, while labels are ONE row per
    node.

    Returns a FULL REPLACEMENT labeling for prior nodes ∪ new-edge
    nodes (merges relabel old nodes — append semantics do not apply;
    see incremental_components_run for the table protocol).
    Equivalence (tested): identical to connected_components over the
    cumulative edge set. ``prior_labels=None`` degrades to a plain
    full run over new_edges."""
    if prior_labels is None:
        return connected_components(new_edges, src, dst, **cc_kwargs)
    star = prior_labels.select(
        F.col("node").alias(src), F.col("comp").alias(dst)
    )
    return connected_components(
        star.unionByName(new_edges.select(src, dst)),
        src, dst, **cc_kwargs,
    )


def incremental_components_run(
    store, table: str, new_edges: DataFrame,
    src: str = "id_a", dst: str = "id_b",
    source_fingerprint: str | None = None,
    **cc_kwargs,
) -> DataFrame | None:
    """One labels-table maintenance round: read the standing (node,
    comp) labeling, fold in this round's new edges, and OVERWRITE the
    table (a new edge can merge two old components and relabel their
    members, so append semantics do not apply; TableStore keeps the
    previous labeling time-travelable). Returns the new labeling, or
    None on a source-fingerprint replay (idempotent ingest). A crash
    before the commit re-reads the unchanged prior labels next run —
    the overwrite is atomic at the manifest."""
    if source_fingerprint is not None and store.exists(table) and (
        store.is_unchanged(table, source_fingerprint)
    ):
        _log.info(
            "incremental_components_run(%s): fingerprint unchanged — "
            "skipping", table,
        )
        return None
    prior = store.read(table) if store.exists(table) else None
    labels = connected_components_incremental(
        new_edges, prior, src, dst, **cc_kwargs
    )
    labels = labels.cache()
    labels.count()
    store.write(
        table, labels, mode="overwrite",
        properties=(
            {"source_fingerprint": source_fingerprint}
            if source_fingerprint is not None else None
        ),
    )
    return labels
