"""spark-submit --py-files deployment smoke (the north-rule run unit).

The rest of the suite imports the package from the repo checkout; this
file proves the DEPLOYED form works: the engine zipped into dist/pkg.zip
(tools/build_pyfiles.py), shipped to a fresh spark-submit driver via
``--py-files``, run from a scratch directory with the repo neither on
PYTHONPATH nor under cwd — so every import (driver and executor side)
can only resolve through zipimport, exactly as on a real multi-executor
cluster. Mirrors the reference's deployment unit (reference main.py via
``python main.py``; SURVEY.md §2.10 CLI lifecycle).
"""

from __future__ import annotations

import importlib.util
import os
import re
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_builder():
    spec = importlib.util.spec_from_file_location(
        "build_pyfiles", os.path.join(REPO, "tools", "build_pyfiles.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _spark_submit() -> str:
    import pyspark

    bundled = os.path.join(
        os.path.dirname(pyspark.__file__), "bin", "spark-submit"
    )
    if os.path.exists(bundled):  # same version as the python libs
        return bundled
    found = shutil.which("spark-submit")
    if not found:
        pytest.skip("no spark-submit on PATH")
    return found


class TestPyFilesArtifact:
    def test_zip_is_deterministic_and_complete(self, tmp_path):
        b = _load_builder()
        z1 = b.build(str(tmp_path / "a.zip"))
        z2 = b.build(str(tmp_path / "b.zip"))
        assert b.artifact_sha256(z1) == b.artifact_sha256(z2)
        import zipfile

        names = zipfile.ZipFile(z1).namelist()
        assert "data_quality_check_pipeline_spark/pipeline.py" in names
        assert (
            "data_quality_check_pipeline_spark/operators/validate.py"
            in names
        )
        assert not any("__pycache__" in n for n in names)
        # the artifact is pure source — zipimport-safe by construction
        assert all(n.endswith(".py") for n in names)


def _submit_pipeline(master: str, tmp_path, corpus_path: str, run_id: str):
    """spark-submit the zipped engine from a scratch dir on ``master``."""
    b = _load_builder()
    pkg_zip = b.build(str(tmp_path / "pkg.zip"))
    entry = str(tmp_path / "run_quality_pipeline.py")
    shutil.copyfile(
        os.path.join(REPO, "jobs", "run_quality_pipeline.py"), entry
    )
    out_root = str(tmp_path / "out")

    import pyspark

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # imports must come from the zip
    env["SPARK_HOME"] = os.path.dirname(pyspark.__file__)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env["SPARK_GRAFT_CPUS"] = "4"
    proc = subprocess.run(
        [
            _spark_submit(),
            "--master", master,
            "--driver-memory", "4g",
            "--py-files", pkg_zip,
            entry,
            "--input", corpus_path,
            "--out", out_root,
            "--run-id", run_id,
            "--shards", "2",
        ],
        cwd=str(tmp_path),  # repo not under cwd either
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    return proc, out_root


class TestSparkSubmitDeploy:
    def test_pyfiles_run_matches_oracle(self, corpus, oracle_df, tmp_path):
        _, _, corpus_path = corpus
        proc, out_root = _submit_pipeline(
            "local[4]", tmp_path, corpus_path, "submit-smoke"
        )
        assert proc.returncode == 0, proc.stderr[-4000:]
        assert "CLIP QUALITY PIPELINE" in proc.stdout

        def report_int(field: str) -> int:
            m = re.search(rf"{field}:\s+([\d,]+)", proc.stdout)
            assert m, f"missing '{field}' in report:\n{proc.stdout}"
            return int(m.group(1).replace(",", ""))

        total = report_int("total clips")
        kept = report_int("kept")
        dropped = report_int("dropped")
        assert total == len(oracle_df)
        assert kept + dropped == total
        # the zip-deployed run reproduces the independent pure-Python
        # oracle's keep decision exactly (same bar as test_parity.py)
        assert kept == int(oracle_df["keep"].sum())
        # durable outputs landed under the out root
        assert os.path.exists(
            os.path.join(out_root, "clips_clean", "manifest.json")
        )
        assert os.path.isdir(os.path.join(out_root, "reports"))

    def test_pyfiles_run_on_multi_executor_cluster(
        self, corpus, oracle_df, tmp_path
    ):
        """The north rule's deployment form: spark-submit --py-files on a
        MULTI-EXECUTOR cluster. local-cluster[2,2,2048] forks two real
        separate executor JVMs (own processes, own python workers) — the
        zip must zipimport on the EXECUTOR side too (UDF deserialization),
        which plain local[N] cannot prove."""
        _, _, corpus_path = corpus
        proc, out_root = _submit_pipeline(
            "local-cluster[2,2,2048]", tmp_path, corpus_path,
            "submit-cluster",
        )
        assert proc.returncode == 0, proc.stderr[-4000:]
        # the report prints the EFFECTIVE master from the live context —
        # get_spark once silently overrode spark-submit's --master back
        # to local[N]; this pin makes that downgrade loudly visible
        assert re.search(r"master:\s+local-cluster\[2,2,2048\]",
                         proc.stdout), proc.stdout
        m = re.search(r"kept:\s+([\d,]+)", proc.stdout)
        assert m, proc.stdout
        kept = int(m.group(1).replace(",", ""))
        # executor-side scoring reproduces the oracle exactly, same bar
        # as the single-JVM deploy
        assert kept == int(oracle_df["keep"].sum())
        assert os.path.exists(
            os.path.join(out_root, "clips_clean", "manifest.json")
        )
