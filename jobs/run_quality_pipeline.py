"""spark-submit entry point for the clip-quality pipeline.

Cluster usage (north rule: spark-submit --py-files on multi-executor
clusters):

    zip -r pkg.zip data_quality_check_pipeline_spark
    spark-submit --py-files pkg.zip jobs/run_quality_pipeline.py \
        --input /data/clips_parquet --out /data/quality_out \
        --shards 64 --fingerprint <source-snapshot-id>

Local smoke:

    python jobs/run_quality_pipeline.py --synthetic 5000 --out /tmp/q_out
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def source_fingerprint(path: str) -> str:
    """Content fingerprint of the input (parity: SHA-256 idempotency check,
    reference rollback_manager.py:142-163) from file names+sizes+mtimes —
    no data read."""
    h = hashlib.sha256()
    if os.path.isdir(path):
        names = sorted(os.listdir(path))
    else:
        names = [os.path.basename(path)]
        path = os.path.dirname(path) or "."
    for n in names:
        st = os.stat(os.path.join(path, n))
        h.update(f"{n}:{st.st_size}:{int(st.st_mtime)}".encode())
    return h.hexdigest()[:16]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="clips parquet path (or Iceberg table)")
    ap.add_argument("--out", required=True, help="output table root")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic clips instead of --input")
    ap.add_argument("--shards", type=int, default=1)
    ap.add_argument("--run-id", default="")
    ap.add_argument("--fingerprint", default="")
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--no-review", action="store_true")
    ap.add_argument("--review-file", default=None)
    ap.add_argument("--cores", default=None)
    ap.add_argument("--pushgateway", default=None, metavar="URL",
                    help="Prometheus pushgateway base URL; run metrics "
                         "are PUT to <URL>/metrics/job/clip_quality")
    ap.add_argument("--list-versions", action="store_true",
                    help="list clips_clean snapshots and exit")
    ap.add_argument("--rollback", default=None, metavar="SNAPSHOT_ID",
                    help="roll clips_clean back to a snapshot and exit")
    ap.add_argument("--requeue", action="store_true",
                    help="re-drive quarantined clips instead of a full run")
    ap.add_argument("--stream", action="store_true",
                    help="drain --input as a Structured Stream "
                         "(availableNow micro-batches) instead of a batch "
                         "run; checkpoint under <out>/_stream_ckpt")
    args = ap.parse_args()

    from data_quality_check_pipeline_spark.pipeline import (
        RunConfig,
        run_pipeline,
    )
    from data_quality_check_pipeline_spark.report import (
        render_run_report,
        save_run_report,
    )
    from data_quality_check_pipeline_spark.session import get_spark
    from data_quality_check_pipeline_spark.synth import write_corpus

    # version management parity (reference main.py --rollback /
    # --list-versions; rollback_manager.py:96-132)
    if args.list_versions or args.rollback:
        from data_quality_check_pipeline_spark.sources.tables import (
            TableStore,
        )

        spark = get_spark(app_name="clip-quality-admin", cores=args.cores)
        store = TableStore(spark, args.out)
        if args.list_versions:
            for s in store.snapshots("clips_clean"):
                print(
                    f"{s['id']}  mode={s['mode']}  "
                    f"run={s['properties'].get('run_id')}"
                )
        if args.rollback:
            store.rollback("clips_clean", args.rollback)
            print(f"rolled back clips_clean to {args.rollback}")
        spark.stop()
        return

    if args.synthetic:
        corpus = os.path.join(args.out, "_synthetic_input")
        input_path = os.path.join(corpus, "clips.parquet")
        if not os.path.exists(input_path):
            write_corpus(corpus, args.synthetic)
    elif args.input:
        input_path = args.input
    else:
        ap.error("one of --input / --synthetic is required")

    if args.stream:
        from data_quality_check_pipeline_spark.sources.tables import (
            TableStore,
        )
        from data_quality_check_pipeline_spark.streaming.stream import (
            start_quality_stream,
        )

        spark = get_spark(app_name="clip-quality-stream", cores=args.cores)
        # stream exactly the given path: a named .parquet file/dir streams
        # itself (never sibling tables in the same parent directory); a
        # plain directory globs *.parquet inside it only, so corpus sidecar
        # files (counts.json) are skipped
        src_dir = (
            input_path
            if input_path.endswith(".parquet")
            else os.path.join(input_path, "*.parquet")
        )
        q = start_quality_stream(
            spark, src_dir, args.out,
            os.path.join(args.out, "_stream_ckpt"), available_now=True,
        )
        q.awaitTermination()
        from data_quality_check_pipeline_spark.pipeline import (
            active_quarantine,
        )

        store = TableStore(spark, args.out)
        kept = store.read("clips_clean").count()
        quarantined = (
            active_quarantine(store.read("clips_quarantine")).count()
            if store.exists("clips_quarantine") else 0
        )
        print(f"stream drained: clean={kept} quarantine={quarantined}")
        spark.stop()
        return

    fp = args.fingerprint or source_fingerprint(input_path)
    spark = get_spark(app_name="clip-quality-pipeline", cores=args.cores)
    cfg = RunConfig(
        out_root=args.out,
        run_id=args.run_id,
        n_shards=args.shards,
        source_fingerprint=fp,
        force=args.force,
        non_interactive=args.no_review or True,
        review_decision_file=args.review_file,
        pushgateway_url=args.pushgateway,
    )
    if args.requeue:
        from data_quality_check_pipeline_spark.pipeline import (
            requeue_quarantine,
        )

        print(requeue_quarantine(spark, cfg, input_path))
        spark.stop()
        return
    metrics = run_pipeline(spark, input_path, cfg)
    if not metrics.get("skipped"):
        save_run_report(metrics, os.path.join(args.out, "reports"))
        print(render_run_report(metrics))
    else:
        print(f"skipped: {metrics['reason']}")
    spark.stop()


if __name__ == "__main__":
    main()
