"""DLQ re-drive: quarantined clips are retried with retry bookkeeping
(parity: reference dead_letter_queue.py retry-eligibility)."""

from pyspark.sql import functions as F

from data_quality_check_pipeline_spark.pipeline import (
    CLEAN_TABLE,
    QUARANTINE_TABLE,
    RunConfig,
    requeue_quarantine,
    run_pipeline,
)
from data_quality_check_pipeline_spark.sources.tables import TableStore


def test_requeue_increments_retry_and_appends(
    spark, corpus, oracle_df, out_root
):
    _, _, path = corpus
    cfg = RunConfig(out_root=out_root, run_id="rq", source_fingerprint="f")
    run_pipeline(spark, path, cfg)
    store = TableStore(spark, out_root)
    n_clean = store.read(CLEAN_TABLE).count()
    n_quar = store.read(QUARANTINE_TABLE).count()

    # source unchanged -> every requeued clip fails again, retry_count + 1
    out = requeue_quarantine(spark, cfg, path, max_retries=3)
    assert out["requeued"] >= n_quar - 10  # dup ids collapse via semi-join
    assert out["kept"] == 0
    assert store.read(CLEAN_TABLE).count() == n_clean
    q = store.read(QUARANTINE_TABLE)
    assert q.filter(F.col("retry_count") == 1).count() > 0

    # after max_retries exceeded nothing is eligible
    for _ in range(3):
        requeue_quarantine(spark, cfg, path, max_retries=3)
    final = requeue_quarantine(spark, cfg, path, max_retries=3)
    assert final["requeued"] == 0
