"""Measure what bloom sidecars buy point-id maintenance on the layout
where min/max pruning is USELESS: a hash-sharded (unclustered) table
whose every file spans the whole clip_id domain (the raw ingest
layout of DESIGN.md #41-42, where COW previously degenerated to a
full-table rewrite and the documented answer was "cluster-compact
first").

Builds the same 160k-clip table twice — with and without
``bloom_cols=['clip_id']`` — then runs an 8-id takedown
(``delete_where``) and a 4-id correction (``upsert``) against each
and reports files_rewritten / files_carried plus walls. The
load-bearing numbers are the DETERMINISTIC file counts; walls are
indicative on this noisy host (DESIGN.md #15).

Also times the bloom build itself (the write-side price) and a
point-lookup ``read(prune=...)`` under both tables.

Prints one JSON line; paste findings into DESIGN.md.

Usage: python tools/bench_bloom.py [--n-clips 160000] [--files 64]
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

ROOT = "/tmp/spark_graft_bloom"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-clips", type=int, default=160_000)
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from data_quality_check_pipeline_spark.session import get_spark
    from data_quality_check_pipeline_spark.sources.tables import TableStore

    shutil.rmtree(ROOT, ignore_errors=True)
    spark = get_spark(
        app_name="bench_bloom", cores=args.cores, shuffle_partitions=64,
    )
    ts = TableStore(spark, ROOT)
    n = args.n_clips

    def base_df():
        # ~1 KB payload per row so file rewrite cost is realistic-ish
        return (
            spark.range(n)
            .select(
                F.format_string("clip_%09d", F.col("id")).alias("clip_id"),
                F.sha2(F.format_string("p%d", F.col("id")), 512).alias("pad"),
                (F.col("id") % 47).alias("snr_db"),
            )
            .repartition(args.files, F.xxhash64("clip_id"))
        )

    out = {"n_clips": n, "files": args.files}
    doomed = [f"clip_{i:09d}" for i in range(0, n, max(1, n // 8))][:8]
    fixes = [(f"clip_{i:09d}", "FIXED") for i in
             range(1, n, max(1, n // 4))][:4]

    for label, bloom in (("nobloom", None), ("bloom", ["clip_id"])):
        t0 = time.monotonic()
        ts.write(f"t_{label}", base_df(), bloom_cols=bloom)
        out[f"{label}_write_s"] = round(time.monotonic() - t0, 2)

        ss = {}
        t0 = time.monotonic()
        ts.read(
            f"t_{label}", prune=[("clip_id", "in", doomed)], scan_stats=ss,
        ).where(F.col("clip_id").isin(doomed)).count()
        out[f"{label}_lookup_s"] = round(time.monotonic() - t0, 2)
        out[f"{label}_lookup_files_kept"] = ss["files_kept"]

        st = {}
        t0 = time.monotonic()
        ts.delete_where(f"t_{label}", "clip_id", doomed, stats_out=st)
        out[f"{label}_takedown_s"] = round(time.monotonic() - t0, 2)
        out[f"{label}_takedown_files_rewritten"] = st["files_rewritten"]
        out[f"{label}_takedown_files_carried"] = st["files_carried"]

        up = spark.createDataFrame(fixes, "clip_id string, pad string")
        st2 = {}
        t0 = time.monotonic()
        ts.upsert(f"t_{label}", up, "clip_id", stats_out=st2)
        out[f"{label}_correction_s"] = round(time.monotonic() - t0, 2)
        out[f"{label}_correction_files_rewritten"] = st2["files_rewritten"]
        out[f"{label}_correction_files_carried"] = st2["files_carried"]

        cnt = ts.read(f"t_{label}").count()
        assert cnt == n - len(doomed), (cnt, n - len(doomed))

    # sidecar size on disk (the manifest-bloat question)
    sizes = []
    for root, _d, files in os.walk(os.path.join(ROOT, "t_bloom")):
        sizes += [
            os.path.getsize(os.path.join(root, f))
            for f in files if f == "_blooms.json.gz"
        ]
    out["sidecar_bytes_total"] = sum(sizes)
    out["sidecar_count"] = len(sizes)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
