"""Stage-isolation benchmarks (guide §1.4): time sub-plans of the
headline queries with the noop sink so the computation is measured, not
the collect/sink. NOT the driver bench — bench.py stays frozen; numbers
from here are cited in OPTIMIZATION_r06.md.

Usage:
    python bench_extra.py clips          # clips pipeline stage ladder
    python bench_extra.py simhash        # simhash stage ladder
    python bench_extra.py ngram          # ngram_jaccard / components ladder
    python bench_extra.py dsir           # dsir stage ladder
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

PASSES = 3


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(spark, name, fn, runs, passes=PASSES):
    spark.sparkContext.setJobDescription(name)
    t0 = time.time()
    fn()
    runs.setdefault(name, []).append(round(time.time() - t0, 3))
    spark.sparkContext.setJobDescription(None)


def report(runs):
    print(f"{'stage':44s} {'min':>7s} {'spread':>7s}")
    for k, v in runs.items():
        print(f"{k:44s} {min(v):7.3f} {max(v) - min(v):7.3f}")


def _spark():
    from data_quality_check_pipeline_spark.session import get_spark

    return get_spark(
        app_name="bench-extra",
        cores=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        extra={"spark.sql.session.timeZone": "UTC"},
    )


def clips() -> None:
    import bench

    from data_quality_check_pipeline_spark.operators.clean import (
        clean_clips,
    )
    from data_quality_check_pipeline_spark.operators.scrub import (
        scrub_transcripts,
    )
    from data_quality_check_pipeline_spark.pipeline import (
        flag_clips,
        score_clips,
    )
    from data_quality_check_pipeline_spark.udfs.audio import (
        with_audio_stats,
        with_audio_windows,
    )
    from data_quality_check_pipeline_spark.udfs.langid import with_langid
    from data_quality_check_pipeline_spark.udfs.perplexity import (
        with_perplexity,
    )

    n = int(os.environ.get("SPARK_GRAFT_CLIPS_N", "60000"))
    path = bench._clips_path(n)
    spark = _spark()
    runs: dict[str, list[float]] = {}

    def scan():
        return spark.read.parquet(path)

    def win_extract():
        df, win_b, ns, tmp = with_audio_windows(clean_clips(scan()))
        return df.withColumns({"_win": win_b, "n_samples": ns}).drop(
            "bytes", *tmp
        )

    ladder = {
        "scan_all_cols": lambda: noop(scan()),
        "scan_no_bytes": lambda: noop(scan().drop("bytes")),
        "clean_only": lambda: noop(clean_clips(scan())),
        "win_extract_only": lambda: noop(win_extract()),
        "langid_only": lambda: noop(
            with_langid(clean_clips(scan()).drop("bytes"))
        ),
        "ppl_only": lambda: noop(
            with_perplexity(clean_clips(scan()).drop("bytes"))
        ),
        "audio_only": lambda: noop(with_audio_stats(clean_clips(scan()))),
        "score_clips_full": lambda: noop(score_clips(scan())),
        "flag_clips_full": lambda: noop(flag_clips(score_clips(scan()))),
        "pipeline_agg(bench shape)": lambda: scrub_transcripts(
            flag_clips(score_clips(scan()))
            .filter(F.col("keep"))
            .drop("reasons", "severity", "keep")
        )
        .agg(
            F.count(F.lit(1)).alias("kept"),
            F.sum("pii_hits").alias("hits"),
        )
        .collect(),
    }
    # warm-up: one full pass pays page-cache + worker spawn
    ladder["pipeline_agg(bench shape)"]()
    for _ in range(PASSES):
        for name, fn in ladder.items():
            timeit(spark, name, fn, runs)
    report(runs)
    spark.stop()


def simhash() -> None:
    import __spark_entry__ as entrymod

    from data_quality_check_pipeline_spark.operators.dedup import (
        hamming_band_pairs,
        simhash_pairs,
        simhash_signatures,
    )

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    runs: dict[str, list[float]] = {}
    df = entrymod._load(spark, sf, "documents", rebalance=True).cache()
    df.count()

    def sigs_only():
        noop(simhash_signatures(df, "doc_id", "text"))

    def full():
        noop(
            simhash_pairs(
                df, "doc_id", "text", max_hamming=3, persist_sigs=False
            )
        )

    def full_cached():
        noop(simhash_pairs(df, "doc_id", "text", max_hamming=3))

    for _ in range(PASSES):
        timeit(spark, "simhash_signatures", sigs_only, runs)
        timeit(spark, "simhash_pairs(no persist)", full, runs)
        timeit(spark, "simhash_pairs(persist)", full_cached, runs)
    report(runs)
    spark.stop()


def ngram() -> None:
    import __spark_entry__ as entrymod

    from data_quality_check_pipeline_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from data_quality_check_pipeline_spark.operators.graph import (
        connected_components,
    )

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    runs: dict[str, list[float]] = {}
    df = entrymod._load(spark, sf, "documents", rebalance=True).cache()
    df.count()

    def pairs():
        noop(
            ngram_jaccard_pairs(
                df, "doc_id", "text", shingle_k=3, min_jaccard=0.3
            )
        )

    def comps():
        noop(
            connected_components(
                ngram_jaccard_pairs(
                    df, "doc_id", "text", shingle_k=3, min_jaccard=0.3
                )
            )
        )

    for _ in range(PASSES):
        timeit(spark, "ngram_jaccard_pairs", pairs, runs)
        timeit(spark, "pairs+connected_components", comps, runs)
    report(runs)
    spark.stop()


def dsir() -> None:
    import __spark_entry__ as entrymod

    from data_quality_check_pipeline_spark.operators.selection import (
        feature_hist,
        importance_resample,
    )

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    runs: dict[str, list[float]] = {}
    df = entrymod._load(spark, sf, "documents").cache()
    df.count()
    corpus = df.select("doc_id", "text")
    target = df.filter(
        (F.col("lang") == "en") & (F.col("doc_id") < 100)
    ).select("text")

    def hist():
        noop(feature_hist(corpus, "text", (1, 2), 512))

    def full():
        noop(
            importance_resample(
                corpus, target, "doc_id", "text", n_keep=150,
                ks=(1, 2), n_features=512, smoothing=1.0, seed=0,
                mode="top_k",
            ).select("doc_id")
        )

    for _ in range(PASSES):
        timeit(spark, "feature_hist(corpus)", hist, runs)
        timeit(spark, "importance_resample(full)", full, runs)
    report(runs)
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "clips"
    {"clips": clips, "simhash": simhash, "ngram": ngram, "dsir": dsir}[
        cmd
    ]()
