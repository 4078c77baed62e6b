"""Token-budget sequence packing for training shards.

LLM training consumes documents as fixed-budget token sequences; the
pipeline stage that assigns documents to those sequences ("packing")
has no reference analogue (round brief: training-data operations) and
no native Spark operator. Two semantics, two scale shapes:

* ``pack_stream_chunks`` — concatenated-stream chunking: documents are
  laid end-to-end in a deterministic order and the stream is cut every
  ``budget`` tokens; a document belongs to the chunk where it STARTS
  (so a chunk may run over by at most one document's tail — exactly
  how contiguous-token training data is built). This is a running-sum
  window: one shuffle on the group key, SQL-expressible (DuckDB
  oracle-checkable).

* ``pack_greedy`` — bin packing: a document never straddles bins; a
  bin closes when the next document would overflow it (documents above
  the budget get a singleton bin). The fill state is a non-linear
  recurrence no window function expresses, so it runs as an
  Arrow-batched ``applyInPandas`` fold per group — O(rows) per group,
  vectorized transfer, no Python in any other stage.

Both partition by ``group_cols``; at 100 TB a bare language key makes
one sequential sort/fold per language (hot-language skew), so callers
shard: ``group_cols=[lang, pmod(xxhash64(id), n_shards)]`` keeps each
fold bounded while chunk ids stay deterministic (the shard is part of
the chunk identity — standard practice: shards ARE the parallel unit
of a packed dataset).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def pack_stream_chunks(
    df: DataFrame,
    size_col: str,
    budget: int,
    group_cols: list[str],
    order_cols: list[str],
    chunk_col: str = "chunk_id",
    offset_col: str = "start_offset",
) -> DataFrame:
    """Concatenated-stream chunk assignment: within each ``group_cols``
    group, documents ordered by ``order_cols`` form one token stream;
    ``chunk_col`` = floor(start_offset / budget) where
    ``offset_col`` = tokens before this document. One window over one
    (group, order) sort — the same cost as any sessionize; rows with
    NULL or negative size count as 0 tokens (they ride along, never
    shift the stream)."""
    if budget <= 0:
        raise ValueError(f"budget must be > 0, got {budget}")
    size = F.greatest(
        F.coalesce(F.col(size_col).cast("long"), F.lit(0)), F.lit(0)
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(size).over(w), F.lit(0))
    return df.withColumn(offset_col, start).withColumn(
        chunk_col, F.floor(F.col(offset_col) / F.lit(int(budget)))
    )


def pack_greedy(
    df: DataFrame,
    size_col: str,
    budget: int,
    group_cols: list[str],
    order_cols: list[str],
    bin_col: str = "bin_id",
) -> DataFrame:
    """Greedy bin packing: within each group (documents ordered by
    ``order_cols``), ``bin_col`` starts at 0 and increments whenever
    adding the next document would exceed ``budget``; oversized
    documents (> budget) occupy a bin alone. The fold is stateful and
    order-dependent, so it runs per group in one Arrow batch stream
    (``applyInPandas``) — shard the group key to bound group size (see
    module docstring)."""
    if budget <= 0:
        raise ValueError(f"budget must be > 0, got {budget}")
    out_schema = StructType(
        df.schema.fields + [StructField(bin_col, LongType(), False)]
    )
    order = list(order_cols)
    b = int(budget)

    def fold(pdf):
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(
            drop=True
        )
        sizes = (
            pdf[size_col].fillna(0).clip(lower=0).astype("int64").tolist()
        )
        bins = []
        cur_bin, fill = 0, 0
        for s in sizes:
            if fill > 0 and fill + s > b:
                cur_bin += 1
                fill = 0
            bins.append(cur_bin)
            fill += s
            if fill >= b:
                cur_bin += 1
                fill = 0
        pdf[bin_col] = bins
        return pdf

    return df.groupBy(*group_cols).applyInPandas(fold, out_schema)


def chunk_stats(
    packed: DataFrame,
    size_col: str,
    group_cols: list[str],
    chunk_col: str = "chunk_id",
) -> DataFrame:
    """Per-chunk occupancy summary (docs, tokens) — the packing QA
    surface (budget overrun distribution, tail chunks)."""
    return packed.groupBy(*group_cols, chunk_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.greatest(
                F.coalesce(F.col(size_col).cast("long"), F.lit(0)),
                F.lit(0),
            )
        ).alias("chunk_tokens"),
    )


def with_training_chunks(
    df: DataFrame,
    budget: int,
    pack_run: str,
    pack_shard: int | Column,
    include_split: bool,
    token_col: str = "transcript_scrubbed",
) -> DataFrame:
    """Stamp clip rows with training-chunk identity — shared by the
    batch shard and streaming micro-batch paths so both emit the same
    schema: (pack_run, pack_shard, chunk_id, start_offset, n_tokens).
    ``pack_run`` scopes chunk ids to one producer run/stream (chunk 0
    of two different runs appended to the same table must never read
    as one chunk); ``pack_shard`` is the parallel unit (pipeline shard
    or stream batch id) within it — an int literal, or a Column when
    the caller derives shards row-wise (repack.py hashes clip_id so
    one giant unpacked backlog never folds in a single window
    partition)."""
    group = ["lang"] + (["split"] if include_split else []) + [
        "pack_shard"
    ]
    shard_col = (
        pack_shard.cast("int")
        if isinstance(pack_shard, Column)
        else F.lit(int(pack_shard))
    )
    return pack_stream_chunks(
        df.withColumn(
            "_tok",
            F.regexp_count(F.col(token_col), F.lit(r"\S+")),
        )
        .withColumn("pack_shard", shard_col)
        .withColumn("pack_run", F.lit(str(pack_run))),
        "_tok",
        budget,
        group,
        ["clip_id"],
    ).withColumnRenamed("_tok", "n_tokens")
