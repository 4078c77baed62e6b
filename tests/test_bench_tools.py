"""Evidence-file handling in the scaling bench tools. No Spark — these
pin the JSON-shape contracts so a multi-minute measurement is never
lost to a file-shape mismatch (the BASELINE.md re-render used to
KeyError('pairs') on a legacy flat submit_scaling.json AFTER the
benchmark finished but BEFORE its scaling.json was written)."""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:  # tools/ is not a package on the test path
    sys.path.insert(0, REPO)

from tools.bench_scaling_submit import _load_doc  # noqa: E402

LEGACY = {
    "metric": "executor_scaling_efficiency_submit",
    "pair": "2 -> 8 executors",
    "n_clips": 160000,
    "cores_per_executor": 1,
    "executor_mem_mb": 4096,
    "rounds": 3,
    "configs": {"2": {"wall_s": 47.4}, "8": {"wall_s": 17.2}},
    "speedup": 2.75,
    "nominal_efficiency": 0.69,
}


def test_load_doc_migrates_legacy_flat_shape(tmp_path):
    p = tmp_path / "submit_scaling.json"
    p.write_text(json.dumps(LEGACY))
    doc = _load_doc(str(p))
    assert "pairs" in doc
    assert doc["pairs"]["2->8"]["speedup"] == 2.75
    assert doc["pairs"]["2->8"]["configs"]["2"]["wall_s"] == 47.4


def test_load_doc_passes_current_shape_through(tmp_path):
    cur = {"metric": "m", "pairs": {"1->4": {"speedup": 3.6}}}
    p = tmp_path / "submit_scaling.json"
    p.write_text(json.dumps(cur))
    assert _load_doc(str(p)) == cur


def test_load_doc_missing_file_yields_empty_pairs(tmp_path):
    doc = _load_doc(str(tmp_path / "absent.json"))
    assert doc["pairs"] == {}
