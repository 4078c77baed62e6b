import json
import os

import pytest

from data_quality_check_pipeline_spark.oracle import run_oracle
from data_quality_check_pipeline_spark.session import get_spark
from data_quality_check_pipeline_spark.synth import generate_clips

CORPUS_N = 3000


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        cores=8,
        shuffle_partitions=8,
        extra={"spark.sql.session.timeZone": "UTC"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus(tmp_path_factory):
    """(pandas df, counts, parquet path) for the deterministic test corpus."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    df, counts = generate_clips(CORPUS_N)
    d = tmp_path_factory.mktemp("corpus")
    path = str(d / "clips.parquet")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)
    with open(d / "counts.json", "w") as f:
        json.dump(counts, f)
    return df, counts, path


@pytest.fixture(scope="session")
def oracle_df(corpus):
    df, _, _ = corpus
    return run_oracle(df)


@pytest.fixture()
def out_root(tmp_path):
    return str(tmp_path / "tables")


@pytest.fixture(scope="module", autouse=True)
def _unpin_spark_storage():
    """Module-boundary storage hygiene for the shared session: several
    operators persist frames for the duration of their computation
    (dedup signature frames, maintenance-op payloads); any a test left
    pinned would accumulate across the whole suite in one 8g local-mode
    JVM. Cleared at module end — a module's own fixtures may legally
    rely on caches within the module."""
    yield
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    if s is not None:
        try:
            s.catalog.clearCache()
        except Exception:  # session already stopped mid-teardown
            pass


def pytest_configure(config):
    os.environ.setdefault("SPARK_DRIVER_MEM", "8g")
