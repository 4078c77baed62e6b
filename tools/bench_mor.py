"""Measure merge-on-read vs copy-on-write point-delete cost at the
160k-clip scale, on the RAW hash-sharded ingest layout — the layout
where COW has no file-level out (every dir and file spans the id
domain, DESIGN #41) and where delete_keys_mor is therefore the only
bounded takedown lever.

The deterministic load-bearing numbers are the FILE COUNTS (COW
rewrites ~all files; MOR writes one key file and touches zero data
files); walls on this host are noisy (DESIGN #15) and indicative.
Also measured: the per-read broadcast-anti-join tax a pending MOR
delete adds, and the compact() wall that materializes it (the cost
MOR defers into maintenance).

Sequence (same table, commits stack like a real maintenance history):

1. baseline ``read().count()``;
2. COW ``delete_where`` of ``--n-ids`` ids — wall + files counts;
3. MOR ``delete_keys_mor`` of ``--n-ids`` different ids — wall;
4. ``read().count()`` with the delete pending — the read tax;
5. ``compact(cluster_by=clip_id)`` — materialization wall;
6. ``read().count()`` after — clean-read restore check.

Prints one JSON line; paste findings into DESIGN.md.

``--stacked K`` appends a second experiment on the post-compact
table: K consecutive MOR orders of ``--n-ids`` ids each (the GDPR
inbox between two maintenance windows), then ONE materializing
compact — evidencing the amortization claim (DESIGN #51): commit
cost stays O(keys) per order while the rewrite is paid once for all
K, vs COW's per-order rewrite floor.

Usage: python tools/bench_mor.py [--n-clips 160000] [--fresh]
       [--stacked 8]
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

ROOT = "/tmp/spark_graft_mor"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-clips", type=int, default=160_000)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--n-ids", type=int, default=8)
    ap.add_argument("--fresh", action="store_true",
                    help="rebuild the table even if one exists")
    ap.add_argument("--stacked", type=int, default=0,
                    help="after the base comparison: K consecutive "
                         "MOR orders then ONE materializing compact "
                         "(the amortization experiment)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from data_quality_check_pipeline_spark.pipeline import (
        CLEAN_TABLE,
        RunConfig,
        run_pipeline,
    )
    from data_quality_check_pipeline_spark.session import get_spark
    from data_quality_check_pipeline_spark.sources.tables import TableStore
    from data_quality_check_pipeline_spark.synth import write_corpus

    spark = get_spark("bench-mor", cores=args.cores)
    out: dict = {"n_clips": args.n_clips, "cores": args.cores,
                 "n_ids": args.n_ids}

    corpus_dir = f"/tmp/spark_graft_clips_cache/n{args.n_clips}"
    parquet = os.path.join(corpus_dir, "clips.parquet")
    if not os.path.exists(parquet):
        print(f"generating {args.n_clips} clips ...", file=sys.stderr)
        write_corpus(corpus_dir, args.n_clips)

    root = os.path.join(ROOT, f"t{args.n_clips}")
    if args.fresh and os.path.isdir(root):
        shutil.rmtree(root)
    store = TableStore(spark, root)
    if not store.exists(CLEAN_TABLE):
        t0 = time.time()
        run_pipeline(
            spark, parquet,
            RunConfig(out_root=root, run_id="mor1", n_shards=4,
                      module_reports=False),
        )
        out["build_s"] = round(time.time() - t0, 2)

    def data_files() -> int:
        n = 0
        tdir = os.path.join(root, CLEAN_TABLE)
        for d in os.listdir(tdir):
            if not d.startswith("snap_"):
                continue
            for _r, _d, fs in os.walk(os.path.join(tdir, d)):
                n += sum(f.endswith(".parquet") for f in fs)
        return n

    clean = store.read(CLEAN_TABLE)
    t0 = time.time()
    out["rows"] = clean.count()
    out["read_baseline_s"] = round(time.time() - t0, 2)
    out["files_before"] = data_files()

    ids = [
        r["clip_id"]
        for r in clean.select("clip_id").orderBy("clip_id")
        .limit(2 * args.n_ids).collect()
    ]
    cow_ids, mor_ids = ids[: args.n_ids], ids[args.n_ids:]

    # -- COW delete: on the raw layout every file overlaps the ids ------
    t0 = time.time()
    res = store.delete_where(CLEAN_TABLE, "clip_id", cow_ids)
    out["cow_delete_s"] = round(time.time() - t0, 2)
    out["cow_files_rewritten"] = res["files_rewritten"]
    out["cow_files_carried"] = res["files_carried"]
    out["cow_n_deleted"] = res["n_deleted"]

    # -- MOR delete: one key file, zero data files ----------------------
    pre = data_files()
    t0 = time.time()
    mres = store.delete_keys_mor(CLEAN_TABLE, "clip_id", mor_ids)
    out["mor_delete_s"] = round(time.time() - t0, 2)
    out["mor_data_files_touched"] = data_files() - pre  # must be 0
    out["mor_dirs_in_scope"] = mres["dirs_in_scope"]

    t0 = time.time()
    n_pending = store.read(CLEAN_TABLE).count()
    out["read_with_pending_s"] = round(time.time() - t0, 2)
    assert n_pending == out["rows"] - 2 * args.n_ids, (
        n_pending, out["rows"])

    # -- the deferred cost: compact materializes the delete -------------
    t0 = time.time()
    store.compact(CLEAN_TABLE, cluster_by=["clip_id"],
                  target_files=32)
    out["compact_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    assert store.read(CLEAN_TABLE).count() == n_pending
    out["read_after_compact_s"] = round(time.time() - t0, 2)

    if args.stacked:
        rest = [
            r["clip_id"]
            for r in store.read(CLEAN_TABLE).select("clip_id")
            .orderBy("clip_id")
            .limit(args.stacked * args.n_ids).collect()
        ]
        walls = []
        for k in range(args.stacked):
            batch = rest[k * args.n_ids:(k + 1) * args.n_ids]
            t0 = time.time()
            store.delete_keys_mor(CLEAN_TABLE, "clip_id", batch)
            walls.append(round(time.time() - t0, 2))
        out["stacked_orders"] = args.stacked
        out["stacked_commit_walls_s"] = walls
        t0 = time.time()
        n = store.read(CLEAN_TABLE).count()
        out["stacked_read_with_pending_s"] = round(
            time.time() - t0, 2
        )
        assert n == n_pending - len(rest), (n, n_pending)
        t0 = time.time()
        store.compact(CLEAN_TABLE, cluster_by=["clip_id"],
                      target_files=32)
        out["stacked_compact_s"] = round(time.time() - t0, 2)
        assert store.read(CLEAN_TABLE).count() == n

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
