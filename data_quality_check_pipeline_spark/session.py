"""SparkSession factory with scale-appropriate defaults.

Tuned for the clip-quality workload: binary audio payloads make rows wide,
so Arrow batches are kept small and AQE handles skewed language buckets.
On a real cluster the same configs apply; only master/memory change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "clip-quality",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = (
            int(cores) * 2 if str(cores).isdigit() else 32
        )
    # Under spark-submit the JVM gateway already exists and --master was
    # decided at launch (local-cluster[...], yarn, k8s); builder.master()
    # would OVERRIDE it back to local[N] and silently turn a
    # multi-executor deploy into a single JVM (observed: --master
    # local-cluster[2,2,2048] ran as local[4]). PythonRunner exports the
    # gateway port/secret, so their presence = externally-launched JVM =
    # never touch master or driver memory (both fixed at JVM launch).
    under_submit = (
        "PYSPARK_GATEWAY_PORT" in os.environ
        or "PYSPARK_GATEWAY_SECRET" in os.environ
    )
    b = SparkSession.builder.appName(app_name)
    if not under_submit:
        b = b.master(f"local[{cores}]")
    b = (
        b
        # AQE: runtime re-plan, skew-join splitting, partition coalescing —
        # the engine-level half of the skew story (salting is the other half)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow: audio payloads are tens of KB per row — bound batch memory
        # (512 rows * ~30k samples * 4B ≈ 60 MB working set per worker)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        # parquet scans: small splits so wide binary rows fan out across all
        # cores (the Arrow UDF stage pipelines on top of the scan tasks)
        .config("spark.sql.files.maxPartitionBytes", "64m")
        # the vectorized reader's default 4096-row batch is ~225 MB for
        # ~55 KB binary audio rows — at 32 concurrent tasks that is multi-GB
        # of on-heap churn per batch and GC dominates. 512 rows ≈ 28 MB.
        .config("spark.sql.parquet.columnarReaderBatchSize", "512")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # long-lived driver hygiene: the app/SQL status stores retain
        # per-job/stage/task rows and FULL physical-plan descriptions
        # per SQL execution in DRIVER HEAP even with the UI off
        # (defaults: 1000 jobs/stages, 100k tasks, 1000 executions).
        # This engine's dedup/correction plans serialize to hundreds
        # of KB each, so a long session (a streaming driver, a test
        # suite, a multi-query harness) accretes gigabytes and
        # eventually OOMs on an unrelated allocation (observed: a
        # 28-test maintenance-op sequence OOMed an 8g driver on a
        # plain persist() call). Production streaming drivers pin
        # these down for exactly this reason.
        .config("spark.ui.retainedJobs", "100")
        .config("spark.ui.retainedStages", "100")
        .config("spark.ui.retainedTasks", "2000")
        .config("spark.sql.ui.retainedExecutions", "50")
    )
    if not under_submit:
        b = b.config(
            "spark.driver.memory",
            driver_memory or os.environ.get("SPARK_DRIVER_MEM", "8g"),
        )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
