"""Skew-handling evidence: salted vs unsalted partitioned writes.

The corpus language distribution is Zipfian (en holds ~44% of rows —
synth.py `_zipf_lang`), so a write partitioned by bare `lang` makes one
writer task the critical path. `pipeline.salted_repartition` spreads each
language over pmod(xxhash64(clip_id), buckets) salt cells.

This tool measures both layouts on the same input (UDF scoring is run
ONCE and materialized first, so the comparison isolates the shuffle+write
stage), reports wall times, the speedup, and the row distribution of the
heaviest language, and writes BENCH/SKEW.md + BENCH/skew.json.

Usage: python tools/bench_skew.py [--n-clips 20000] [--cores 8]
       [--buckets 8] [--repeats 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-clips", type=int, default=20000)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--buckets", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from data_quality_check_pipeline_spark.pipeline import (
        salted_repartition,
        score_clips,
    )
    from data_quality_check_pipeline_spark.session import get_spark
    from data_quality_check_pipeline_spark.synth import write_corpus

    cache = f"/tmp/spark_graft_clips_cache/n{args.n_clips}"
    parquet = os.path.join(cache, "clips.parquet")
    if not os.path.exists(parquet):
        print(f"generating {args.n_clips} clips ...", file=sys.stderr)
        write_corpus(cache, args.n_clips)

    spark = get_spark(
        app_name="skew", cores=args.cores,
        shuffle_partitions=args.cores * 2,
    )

    langed = f"/tmp/spark_graft_skew/langed_n{args.n_clips}"
    if not os.path.exists(langed):
        # one-time: attach lang (no audio UDF needed), split well for reads
        df = spark.read.parquet(parquet)
        (
            score_clips(df, with_audio=False)
            .select("clip_id", "bytes", "lang", "transcript")
            .repartition(args.cores * 4)
            .write.mode("overwrite")
            .parquet(langed)
        )

    src = spark.read.parquet(langed)
    src.count()  # warm page cache

    share = {
        r["lang"]: r["n"]
        for r in src.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = sum(share.values())
    top_lang, top_n = max(share.items(), key=lambda kv: kv[1])

    def timed_write(make_df) -> float:
        best = float("inf")
        for _ in range(args.repeats):
            out = "/tmp/spark_graft_skew/out"
            shutil.rmtree(out, ignore_errors=True)
            t0 = time.time()
            (
                make_df(src)
                .write.mode("overwrite")
                .partitionBy("lang")
                .parquet(out)
            )
            best = min(best, time.time() - t0)
        return best

    unsalted = timed_write(lambda d: d.repartition(F.col("lang")))
    salted = timed_write(
        lambda d: salted_repartition(d, args.buckets)
    )

    result = {
        "n_clips": args.n_clips,
        "cores": args.cores,
        "buckets": args.buckets,
        "top_lang": top_lang,
        "top_lang_share": round(top_n / total, 3),
        "unsalted_wall_s": round(unsalted, 2),
        "salted_wall_s": round(salted, 2),
        "speedup": round(unsalted / salted, 2),
    }
    print(json.dumps(result))

    md = f"""# BENCH/SKEW — salted vs unsalted partitioned write

Zipfian language skew: `{top_lang}` holds {result['top_lang_share']:.0%}
of {total} rows, so `repartition(lang)` makes one writer task the
critical path. `salted_repartition` (pmod(xxhash64(clip_id), S) salt,
deterministic — survives task retries) spreads it over {args.buckets}
cells per language.

| layout | wall s |
|---|---|
| repartition(lang) (skewed) | {result['unsalted_wall_s']} |
| salted_repartition (S={args.buckets}) | {result['salted_wall_s']} |

**speedup {result['speedup']}x** at local[{args.cores}],
{args.n_clips} clips, per-config minimum of {args.repeats} runs.

Reproduce: `python tools/bench_skew.py --n-clips {args.n_clips} \\
--cores {args.cores} --buckets {args.buckets}`
"""
    with open(os.path.join(REPO, "BENCH", "SKEW.md"), "w") as f:
        f.write(md)
    with open(os.path.join(REPO, "BENCH", "skew.json"), "w") as f:
        json.dump(result, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
