"""Text report rendering from the metrics document.

Parity with /root/reference/src/pipeline.py:702-795 (pipeline execution
report) and the per-module generate_report functions (SURVEY.md §2.1 S9):
driver-side string rendering from small collected aggregates only.
"""

from __future__ import annotations


def render_run_report(metrics: dict) -> str:
    q = metrics.get("quality", {})
    perf = metrics.get("performance", {})
    gate = metrics.get("gate") or {}
    lines = [
        "=" * 64,
        "CLIP QUALITY PIPELINE — EXECUTION REPORT",
        "=" * 64,
        f"run_id:        {metrics.get('run_id')}",
        "",
        "QUALITY",
        f"  total clips:   {q.get('total', 0):,}",
        f"  kept:          {q.get('kept', 0):,}",
        f"  dropped:       {q.get('dropped', 0):,}",
        f"  keep rate:     {q.get('keep_pct', 100.0):.2f}%",
        f"  rows with PII: {q.get('pii_rows', 0):,}",
        "  PII scrubbed:  "
        f"emails={q.get('pii_emails', 0):,} "
        f"phones={q.get('pii_phones', 0):,} "
        f"ssns={q.get('pii_ssns', 0):,} "
        f"tox={q.get('pii_tox', 0):,}",
        "",
        "GATE",
        f"  decision:      {gate.get('decision', 'n/a')}",
        f"  failure pct:   {gate.get('failure_pct', 0.0):.2f}%",
        "",
        "PERFORMANCE",
        f"  wall seconds:  {perf.get('wall_seconds', 0.0):.2f}",
        f"  clips/sec:     {perf.get('clips_per_sec', 0.0):.1f}",
        "",
        "STAGES",
    ]
    for s in metrics.get("stages", []):
        detail = {
            k: v
            for k, v in s.items()
            if k not in ("stage", "status", "duration_s")
        }
        lines.append(
            f"  {s['stage']:<14} {s['status']:<8} "
            f"{s['duration_s']:>8.3f}s  {detail if detail else ''}"
        )
    lines.append("=" * 64)
    return "\n".join(lines)


def save_run_report(metrics: dict, out_dir: str) -> str:
    import os

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(
        out_dir, f"report_{metrics.get('run_id', 'run')}.txt"
    )
    with open(path, "w") as f:
        f.write(render_run_report(metrics))
    return path
