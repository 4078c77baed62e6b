"""Incremental re-pack: training-chunk identity for unpacked rows.

Corrections (corrections.py) reset a superseded clip's ``pack_*``
columns to NULL — the corrected transcript invalidates the token
counts, so the old chunk identity must not be carried stale. Those
rows would otherwise stay unconsumable by a chunk-addressed trainer
forever: a FULL re-pack is not an option at scale because consumers
address data by (pack_run, lang[, split], pack_shard, chunk_id) and
re-running packing over the whole table renames every existing chunk.

This op packs ONLY the rows with ``pack_run IS NULL`` into a FRESH
``pack_run``, leaving every already-assigned chunk untouched — the
packed dataset stays append-only in chunk identity (the same contract
as incremental pipeline runs, which also mint their own pack_run).
No reference analogue (reference has no packing); round brief:
training-data operations.

Scale + determinism:

* the backlog is sharded by ``pmod(xxhash64('repack_shard', clip_id),
  n_shards)`` — its own hash domain (DESIGN.md #23) — so one giant
  backlog never folds in a single window partition;
* the fresh ``pack_run`` is ``repack-<hex>`` where <hex> is an
  order-invariant hash over the backlog's clip_ids: the same backlog
  always mints the same run (idempotent replay re-derives identical
  chunk ids), two different backlogs can never collide into one
  chunk namespace;
* the landing write is ONE atomic ``TableStore.upsert`` — a reader
  never sees a half-packed backlog; a crash before the commit leaves
  every row still NULL (the next run re-packs the identical set).

Natural idempotency: after a successful repack no NULL-pack_run rows
remain, so a replay is a reported no-op — no marker table needed.
"""

from __future__ import annotations

import logging

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .corrections import PACK_COLS
from .operators.packing import with_training_chunks
from .pipeline import CLEAN_TABLE
from .sources.tables import TableStore

_log = logging.getLogger(__name__)


def repack_unpacked(
    spark: SparkSession,
    out_root: str,
    budget: int,
    n_shards: int = 16,
    token_col: str = "transcript_scrubbed",
) -> dict:
    """Assign chunk identity to every clips_clean row whose
    ``pack_run`` is NULL; returns a JSON-able report."""
    if budget <= 0:
        raise ValueError(f"budget must be > 0, got {budget}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be > 0, got {n_shards}")
    store = TableStore(spark, out_root)
    if not store.exists(CLEAN_TABLE):
        raise FileNotFoundError(
            f"repack: no {CLEAN_TABLE} table under {out_root}"
        )
    clean = store.read(CLEAN_TABLE)
    missing = [c for c in PACK_COLS if c not in clean.columns]
    if missing:
        raise ValueError(
            f"repack: {CLEAN_TABLE} was never packed (missing "
            f"{missing}); run the pipeline with --pack-tokens first"
        )
    clean_types = dict(clean.dtypes)
    unpacked = clean.filter(F.col("pack_run").isNull())
    # bit_xor: order-invariant set fingerprint that cannot overflow
    # (a sum of xxhash64 longs would, and Spark 4 ANSI makes that a
    # job failure, not a wrap)
    n, fp = unpacked.agg(
        F.count(F.lit(1)),
        F.bit_xor(F.xxhash64(F.lit("repack_run"), F.col("clip_id"))),
    ).first()
    report: dict = {
        "unpacked": int(n), "budget": int(budget),
        "n_shards": int(n_shards), "landed": 0, "pack_run": None,
    }
    if n == 0:
        _log.info("repack(%s): no unpacked rows; no-op", out_root)
        return report
    pack_run = f"repack-{(fp or 0) & 0xFFFFFFFFFFFFFFFF:016x}"
    report["pack_run"] = pack_run

    shard = F.pmod(
        F.xxhash64(F.lit("repack_shard"), F.col("clip_id")),
        F.lit(int(n_shards)),
    )
    stamped = with_training_chunks(
        unpacked.drop(*PACK_COLS), budget, pack_run, shard,
        include_split="split" in clean.columns, token_col=token_col,
    )
    # match the stored column types exactly (upsert unions by name;
    # e.g. floor() yields long where the table may hold int)
    for c in PACK_COLS:
        stamped = stamped.withColumn(c, F.col(c).cast(clean_types[c]))
    stamped = stamped.select(*clean.columns)

    # consumed twice (chunk stats + the upsert's rewrite); payload rows
    # carry audio bytes — DISK_ONLY, the DESIGN.md #40 rule
    from pyspark import StorageLevel

    stamped = stamped.persist(StorageLevel.DISK_ONLY)
    try:
        report["n_chunks"] = (
            stamped.select("lang", "pack_shard", "chunk_id")
            .distinct()
            .count()
        )
        up = store.upsert(
            CLEAN_TABLE, stamped, "clip_id",
            properties={"repack_run": pack_run},
        )
    finally:
        stamped.unpersist()
    if up["aborted"]:
        raise RuntimeError(
            "repack: upsert lost a commit race — re-run (idempotent)"
        )
    if up["n_inserted"]:
        raise RuntimeError(
            f"repack: {up['n_inserted']} rows inserted instead of "
            "replaced — the backlog frame drifted from the table "
            "mid-run (concurrent writer); re-run"
        )
    report["landed"] = int(up["n_updated"])
    report["snapshot"] = up["snapshot"]
    report["dirs_rewritten"] = up["dirs_rewritten"]
    report["files_rewritten"] = up["files_rewritten"]
    report["files_carried"] = up["files_carried"]
    _log.info(
        "repack(%s): %d rows -> %s (%d chunks)",
        out_root, report["landed"], pack_run, report["n_chunks"],
    )
    return report
