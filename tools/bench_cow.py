"""Measure the copy-on-write maintenance cost at the 160k-clip scale:
a small correction batch against a large clean table should rewrite
only the FILES whose min/max clip_id stats overlap the batch (the
rest hard-link forward), the repack of its backlog should land in one
more bounded upsert, and the CDC changelog should read only the
non-carried files — never the corpus. Run once on the raw
hash-sharded ingest layout (every dir AND file spans the id domain —
COW honestly rewrites everything) and once with --cluster (id-sorted
files — the maintenance layout where file-level COW pays off).

Builds (or reuses) a split+packed pipeline table under
``/tmp/spark_graft_cow/t``, compacts it id-clustered (the
takedown/changelog access layout), then measures:

* ``apply_corrections`` for a 100-clip contiguous-id batch —
  wall, dirs_rewritten vs dirs in the current read_set;
* ``repack_unpacked`` over the resulting backlog — wall;
* ``read_changelog`` since the pre-correction anchor — wall + rows,
  against a full ``read().count()`` of the same table.

Wall clocks on this host are noisy (DESIGN.md #15) — the load-bearing
numbers are the DETERMINISTIC dir/file counts; walls are indicative.
Prints one JSON line; paste the findings into DESIGN.md.

Usage: python tools/bench_cow.py [--n-clips 160000] [--fresh]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

ROOT = "/tmp/spark_graft_cow"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-clips", type=int, default=160_000)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--fresh", action="store_true",
                    help="rebuild the table even if one exists")
    ap.add_argument("--cluster", action="store_true",
                    help="full clustered compact after the build "
                         "(ONE dir of id-clustered files — the layout "
                         "where file-level COW carry-forward bounds a "
                         "correction to the overlapping files)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from data_quality_check_pipeline_spark.corrections import (
        apply_corrections,
    )
    from data_quality_check_pipeline_spark.pipeline import (
        CLEAN_TABLE,
        RunConfig,
        run_pipeline,
    )
    from data_quality_check_pipeline_spark.repack import repack_unpacked
    from data_quality_check_pipeline_spark.session import get_spark
    from data_quality_check_pipeline_spark.sources.tables import TableStore
    from data_quality_check_pipeline_spark.synth import write_corpus

    spark = get_spark("bench-cow", cores=args.cores)
    out: dict = {"n_clips": args.n_clips, "cores": args.cores}

    corpus_dir = f"/tmp/spark_graft_clips_cache/n{args.n_clips}"
    parquet = os.path.join(corpus_dir, "clips.parquet")
    if not os.path.exists(parquet):
        print(f"generating {args.n_clips} clips ...", file=sys.stderr)
        write_corpus(corpus_dir, args.n_clips)

    root = os.path.join(ROOT, f"t{args.n_clips}")
    store = TableStore(spark, root)
    if args.fresh and os.path.isdir(root):
        shutil.rmtree(root)
        store = TableStore(spark, root)
    if not store.exists(CLEAN_TABLE):
        t0 = time.time()
        run_pipeline(
            spark, parquet,
            RunConfig(
                out_root=root, run_id="cow1", n_shards=4,
                module_reports=False,
                split_fractions={
                    "train": 0.8, "val": 0.1, "test": 0.1
                },
                pack_budget=2000,
            ),
        )
        out["build_s"] = round(time.time() - t0, 2)
        if args.cluster:
            # one clustered dir of disjoint-range files: best
            # read(prune=...) selectivity AND the layout where
            # file-level COW carry-forward bounds a correction to the
            # overlapping files (the hash-sharded ingest layout's
            # dirs+files all span the id domain, so COW there honestly
            # rewrites everything — cluster-compact first)
            t0 = time.time()
            store.compact(
                CLEAN_TABLE, cluster_by=["clip_id"], target_files=32
            )
            out["cluster_compact_s"] = round(time.time() - t0, 2)

    clean = store.read(CLEAN_TABLE)
    n_before = clean.count()
    anchor = store.current_snapshot(CLEAN_TABLE)["id"]
    out["rows"] = n_before
    out["dirs_in_read_set"] = len(
        store.current_snapshot(CLEAN_TABLE)["read_set"]
    )

    # -- 100-clip contiguous-id correction batch --------------------------
    ids = [
        r["clip_id"]
        for r in clean.filter(
            F.col("transcript").isNotNull()
            & (F.length("transcript") > 40)
            & (F.length("transcript")
               / (F.col("dur_ms") / 1000.0) < 45.0)
        )
        # project BEFORE takeOrdered: with the bytes column aboard,
        # every task ships its top-100 FULL rows (~55 KB audio each)
        # to the driver and 160+ tasks blow spark.driver.maxResultSize
        .select("clip_id")
        .orderBy("clip_id")
        .limit(100)
        .collect()
    ]
    fixed = (
        clean.filter(F.col("clip_id").isin(ids))
        .select("clip_id", "bytes", "sr_hz", "dur_ms", "codec",
                F.regexp_replace(
                    "transcript", r"^(\S+)", "$1 $1"
                ).alias("transcript"))
    )
    t0 = time.time()
    rep = apply_corrections(
        spark, root, fixed, f"cowfix-{anchor}", with_audio=True,
    )
    out["correct_s"] = round(time.time() - t0, 2)
    out["correct"] = {
        k: rep.get(k)
        for k in ("requested", "landed", "removed")
    }
    for k in ("dirs_rewritten", "dirs_untouched",
              "files_rewritten", "files_carried"):
        out[f"correct_{k}"] = rep.get("clean_upsert", {}).get(k)
    out["dirs_after_correct"] = len(
        store.current_snapshot(CLEAN_TABLE)["read_set"]
    )

    # -- repack the backlog ------------------------------------------------
    t0 = time.time()
    rp = repack_unpacked(spark, root, budget=2000)
    out["repack_s"] = round(time.time() - t0, 2)
    out["repack"] = {k: rp.get(k) for k in ("unpacked", "landed",
                                            "n_chunks")}

    # -- CDC vs full read --------------------------------------------------
    t0 = time.time()
    cdc_scan: dict = {}
    ch = store.read_changelog(CLEAN_TABLE, anchor, scan_stats=cdc_scan)
    by_kind = {
        r["_change_type"]: r["n"]
        for r in ch.groupBy("_change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    out["cdc_s"] = round(time.time() - t0, 2)
    out["cdc"] = by_kind
    out["cdc_scan"] = cdc_scan
    t0 = time.time()
    out["full_read_rows"] = store.read(CLEAN_TABLE).count()
    out["full_read_s"] = round(time.time() - t0, 2)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
