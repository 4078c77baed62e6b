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
        "  keep rate:     "
        + (f"{q['keep_pct']:.2f}%"
           if q.get("keep_pct") is not None else "n/a (halted)"),
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
        f"  master:        {perf.get('master', 'n/a')}",
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


# ---------------------------------------------------------------------------
# Per-module reports (reference parity: the 12 reports/*.txt —
# validator/profiler/masker/DLQ/statistical generate_report functions).
# Every renderer consumes ONLY driver-side dicts/rows already collected
# during the run: no renderer triggers a Spark job.
# ---------------------------------------------------------------------------


def _hdr(title: str) -> list[str]:
    return ["=" * 64, title, "=" * 64]


def render_validation_report(data: dict) -> str:
    """Rule outcomes + drop-reason histogram (reference validator
    generate_report, src/validator.py:309-321 + profiler severity tally)."""
    q = data.get("quality", {})
    lines = _hdr("VALIDATION REPORT")
    lines += [
        f"total clips:  {q.get('total', 0):,}",
        f"kept:         {q.get('kept', 0):,}",
        f"dropped:      {q.get('dropped', 0):,}",
        "keep rate:    "
        + (f"{q['keep_pct']:.2f}%"
           if q.get("keep_pct") is not None else "n/a (halted)"),
        "",
        "DROP REASONS",
    ]
    for reason, n in data.get("reason_histogram", []):
        lines.append(f"  {reason:<22} {n:>10,}")
    if not data.get("reason_histogram"):
        lines.append("  (none)")
    return "\n".join(lines)


def render_expectations_report(data: dict) -> str:
    """Expectation-suite outcomes (reference expectations report)."""
    lines = _hdr("EXPECTATION SUITE REPORT")
    for r in data.get("ge", []):
        status = "PASS" if r["success"] else "FAIL"
        lines.append(
            f"  [{status}] {r['name']:<40} "
            f"pass_rate={r['pass_rate']:.4f} mostly={r['mostly']}"
        )
    if not data.get("ge"):
        lines.append("  (no expectations evaluated)")
    return "\n".join(lines)


def render_profile_report(data: dict) -> str:
    """Per-column completeness (reference profiler.py:347-421 report)."""
    comp = data.get("completeness", {})
    lines = _hdr("PROFILE REPORT")
    lines.append(f"rows: {comp.get('rows', 0):,}")
    lines.append("")
    lines.append(f"{'column':<24}{'missing':>10}{'complete %':>12}")
    for col, c in comp.get("columns", {}).items():
        lines.append(
            f"{col:<24}{c['missing']:>10,}{c['completeness_pct']:>11.2f}%"
        )
    return "\n".join(lines)


def render_statistical_report(data: dict) -> str:
    """Distribution summary of the kept corpus (reference
    statistical_validator.py:249-253 report)."""
    stats = data.get("stats", {})
    lines = _hdr("STATISTICAL REPORT (kept clips)")
    if not stats:
        lines.append("  (no numeric stats collected)")
    for name, v in stats.items():
        if v is None:
            continue
        lines.append(f"  {name:<22} {v:>14.4f}")
    return "\n".join(lines)


def render_mask_sample_report(data: dict) -> str:
    """Before/after scrub sample, limit 2 (reference masker.py:176-198) +
    per-PII-type counters (pii_detector.py:168-176)."""
    q = data.get("quality", {})
    lines = _hdr("MASKING / SCRUB REPORT")
    lines += [
        f"rows with PII: {q.get('pii_rows', 0):,}",
        f"emails={q.get('pii_emails', 0):,}  "
        f"phones={q.get('pii_phones', 0):,}  "
        f"ssns={q.get('pii_ssns', 0):,}  tox={q.get('pii_tox', 0):,}",
        "",
        "SAMPLE (before -> after, limit 2)",
    ]
    for s in data.get("mask_samples", []):
        lines.append(f"  clip {s['clip_id']}:")
        lines.append(f"    before: {s['before']}")
        lines.append(f"    after:  {s['after']}")
    if not data.get("mask_samples"):
        lines.append("  (no scrubbed rows)")
    return "\n".join(lines)


def render_dlq_report(data: dict) -> str:
    """First 20 quarantined clips (reference
    dead_letter_queue.py:152-158)."""
    lines = _hdr("DEAD LETTER QUEUE REPORT")
    rows = data.get("dlq_sample", [])
    lines.append(f"showing {len(rows)} quarantined clip(s), limit 20")
    for r in rows:
        lines.append(
            f"  {r['clip_id']}  [{r['severity']}]  "
            f"{', '.join(r['reasons'])}"
        )
    return "\n".join(lines)


def render_pii_report(data: dict) -> str:
    """Standalone PII-detection summary (reference
    pii_detector.py:168-176 generate_report: per-type counts per run)."""
    q = data.get("quality", {})
    total = q.get("total", 0)
    pii_rows = q.get("pii_rows", 0)
    lines = _hdr("PII DETECTION REPORT")
    lines += [
        f"rows scanned:   {total:,}",
        f"rows with PII:  {pii_rows:,}"
        + (f"  ({100.0 * pii_rows / total:.2f}%)" if total else ""),
        "",
        "DETECTIONS BY TYPE",
    ]
    for label, key in (
        ("emails", "pii_emails"), ("phones", "pii_phones"),
        ("ssns", "pii_ssns"), ("toxicity", "pii_tox"),
    ):
        lines.append(f"  {label:<12} {q.get(key, 0):>10,}")
    return "\n".join(lines)


def render_cleaning_log(data: dict) -> str:
    """Rows-affected-per-action log (reference cleaner.py:71-76
    cleaning_log / reports/cleaning_log.txt)."""
    lines = _hdr("CLEANING LOG")
    counts = data.get("cleaning", {})
    if not counts:
        lines.append("  (no cleaning counters collected)")
    for action, n in sorted(counts.items()):
        lines.append(f"  {action:<32} {n:>10,} row(s) changed")
    return "\n".join(lines)


def render_contract_report(data: dict) -> str:
    """Schema/data contract outcomes (reference data_contract.py +
    reports/data_contract_report.txt): the schema-level checks
    (exist / of_type) versus the data-level expectations, with an
    overall contract verdict."""
    ge = data.get("ge", [])
    schema_checks = [r for r in ge if r["name"].split(":")[0]
                     in ("exist", "of_type")]
    data_checks = [r for r in ge if r not in schema_checks]
    ok = all(r["success"] for r in ge) if ge else False
    lines = _hdr("DATA CONTRACT REPORT")
    lines.append(f"contract: {'HONORED' if ok else 'VIOLATED'}")
    lines.append("")
    lines.append("SCHEMA CHECKS")
    for r in schema_checks or []:
        lines.append(
            f"  [{'PASS' if r['success'] else 'FAIL'}] {r['name']}"
        )
    if not schema_checks:
        lines.append("  (none)")
    lines.append("")
    lines.append("DATA CHECKS")
    for r in data_checks:
        lines.append(
            f"  [{'PASS' if r['success'] else 'FAIL'}] {r['name']:<40} "
            f"pass_rate={r['pass_rate']:.4f}"
        )
    if not data_checks:
        lines.append("  (none)")
    return "\n".join(lines)


def render_review_report(data: dict) -> str:
    """Gate decision + review audit trail (reference
    human_review.py:306-310 audit log / reports/human_review_report.txt)."""
    rv = data.get("review", {})
    lines = _hdr("HUMAN REVIEW REPORT")
    lines += [
        f"gate decision: {rv.get('decision', 'n/a')}",
        f"failure pct:   {rv.get('failure_pct', 0.0):.2f}%",
        "",
        f"AUDIT TRAIL (last {len(rv.get('audit', []))} decision(s))",
    ]
    for a in rv.get("audit", []):
        lines.append(
            f"  {a.get('ts', '?')}  decision={a.get('decision', '?')}  "
            f"source={a.get('source', '?')}"
        )
    if not rv.get("audit"):
        lines.append("  (no recorded decisions)")
    return "\n".join(lines)


MODULE_RENDERERS = {
    "validation": render_validation_report,
    "expectations": render_expectations_report,
    "profile": render_profile_report,
    "statistical": render_statistical_report,
    "mask_sample": render_mask_sample_report,
    "dlq": render_dlq_report,
    "pii_detection": render_pii_report,
    "cleaning_log": render_cleaning_log,
    "data_contract": render_contract_report,
    "human_review": render_review_report,
}


def save_module_reports(data: dict, out_dir: str, run_id: str) -> list[str]:
    """Write every per-module report; returns the paths."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for name, render in MODULE_RENDERERS.items():
        p = os.path.join(out_dir, f"{name}_report_{run_id}.txt")
        with open(p, "w") as f:
            f.write(render(data) + "\n")
        paths.append(p)
    return paths
