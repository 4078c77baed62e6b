"""Run metrics document + Prometheus text rendering.

Parity with /root/reference/src/metrics_collector.py:29-36 (nested metrics
dict), :119-207 (JSON + Prometheus text export), :220-273 (quality trend).
All values come from tiny collected aggregates — O(1) driver memory.
"""

from __future__ import annotations

import json
import os
import time


def save_metrics(metrics: dict, out_dir: str, run_id: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"metrics_{run_id}.json")
    with open(path, "w") as f:
        json.dump(metrics, f, indent=2, default=str)
    return path


def prometheus_text(metrics: dict, prefix: str = "clip_quality") -> str:
    """Flatten numeric leaves to Prometheus exposition format
    (metrics_collector.py:132-207)."""
    lines: list[str] = []

    def walk(obj, path):
        if isinstance(obj, dict):
            for k, v in obj.items():
                walk(v, path + [str(k)])
        elif isinstance(obj, list):
            # per-stage metrics live in a list of dicts
            for i, v in enumerate(obj):
                walk(v, path + [str(i)])
        elif isinstance(obj, bool):
            lines.append(f"{prefix}_{'_'.join(path)} {int(obj)}")
        elif isinstance(obj, (int, float)):
            lines.append(f"{prefix}_{'_'.join(path)} {obj}")

    walk(metrics, [])
    return "\n".join(lines) + "\n"


def quality_trend_alert(
    metrics_dir: str, current_keep_pct: float, window: int = 5,
    degradation_pts: float = 10.0,
) -> dict:
    """Run-over-run keep-rate trend (metrics_collector.py:220-273): alert if
    the current keep rate is more than ``degradation_pts`` below the trailing
    average of the last ``window`` runs."""
    history: list[float] = []
    if os.path.isdir(metrics_dir):
        # chronological = file mtime: run_ids are random hex, so a
        # lexicographic sort would pick an arbitrary 'trailing' window
        names = sorted(
            os.listdir(metrics_dir),
            key=lambda n: os.path.getmtime(os.path.join(metrics_dir, n)),
        )
        for fname in names:
            if fname.startswith("metrics_") and fname.endswith(".json"):
                try:
                    with open(os.path.join(metrics_dir, fname)) as f:
                        m = json.load(f)
                    history.append(float(m["quality"]["keep_pct"]))
                except (KeyError, ValueError, json.JSONDecodeError):
                    continue
    recent = history[-window:]
    if not recent:
        return {"alert": False, "trailing_avg": None, "runs": 0}
    avg = sum(recent) / len(recent)
    return {
        "alert": current_keep_pct < avg - degradation_pts,
        "trailing_avg": avg,
        "runs": len(recent),
        "ts": time.time(),
    }
