"""Capture .explain('formatted') output for declared queries into
plans/<tag>/<query>_<suffix>.txt (guide §1: record the plan shape before
and after each optimization). Also usable for the bench clips pipeline.

Usage:
    python tools/capture_plans.py <tag> <suffix> [query ...]
e.g.
    python tools/capture_plans.py r06 before            # all bench queries
    python tools/capture_plans.py r06 after doc_scrub   # one query
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_QUERIES = [
    "flagship_doc_quality_filter",
    "doc_scrub",
    "doc_text_stats",
    "doc_minhash_pairs",
    "doc_simhash_pairs",
    "doc_dup_components",
    "customer_mask_clean",
    "lineitem_pricing_summary",
    "lineitem_outlier_summary",
    "orders_by_segment",
    "events_rollup",
    "embedding_topk",
    "embedding_ivf_ann",
    "doc_stratified_sample",
    "doc_token_packing",
    "events_asof_clicks",
    "doc_dsir_select",
    "doc_dup_spans",
    "doc_decontam_hits",
]


def clips_pipeline_df(spark):
    from pyspark.sql import functions as F

    import bench

    from data_quality_check_pipeline_spark.operators.scrub import (
        scrub_transcripts,
    )
    from data_quality_check_pipeline_spark.pipeline import (
        flag_clips,
        score_clips,
    )

    clips_parquet = bench._clips_path(
        int(os.environ.get("SPARK_GRAFT_CLIPS_N", "60000"))
    )
    df = spark.read.parquet(clips_parquet)
    flagged = flag_clips(score_clips(df))
    kept = scrub_transcripts(
        flagged.filter(F.col("keep")).drop("reasons", "severity", "keep")
    )
    return kept.agg(
        F.count(F.lit(1)).alias("kept"),
        F.sum("pii_hits").alias("hits"),
    )


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r06"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or ["clips_keep_drop_scrub"] + BENCH_QUERIES

    import __spark_entry__ as entrymod
    from data_quality_check_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="capture-plans", cores=cpus)
    qs = entrymod.queries()
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        if name == "clips_keep_drop_scrub":
            df = clips_pipeline_df(spark)
        else:
            df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
