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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
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
      ``<dir>/cc_round_<i>`` parquet and read back, so the iteration
      survives executor loss and can even be resumed by a new driver from
      the last round's files. This is the 100-TB configuration; point it
      at the job's durable storage (e.g. the TableStore root).
    """
    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        # every iteration joins against und: without this cache the
        # upstream edge computation (often an expensive candidate-pair
        # self-join) re-evaluates once PER ROUND. The edge set is small
        # by construction (near-dup pairs, not the corpus) and is
        # unpersisted before returning.
        .cache()
    )
    labels = (
        und.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    spark = edges.sparkSession
    changed = -1
    for it in range(max_iter):
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
            path = f"{checkpoint_dir}/cc_round_{it}"
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
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            f"iterations ({changed} labels still changing) — a component "
            f"diameter exceeds max_iter; raise max_iter"
        )
    return labels.select("node", "comp")


def dedup_survivors_by_component(
    df: DataFrame,
    components: DataFrame,
    id_col: str,
) -> DataFrame:
    """Keep one deterministic survivor (the min-id == component id) per
    near-dup group; rows not in any component survive untouched."""
    dupes = components.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias(id_col)
    )
    return df.join(dupes, id_col, "left_anti")
