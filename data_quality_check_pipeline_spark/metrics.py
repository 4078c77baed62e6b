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


def push_to_gateway(
    metrics: dict,
    gateway_url: str,
    job: str = "clip_quality",
    transport=None,
    prefix: str = "clip_quality",
) -> tuple[str, bytes]:
    """Push the run's metrics to a Prometheus pushgateway (parity:
    reference metrics_collector.py:278-334).

    ``transport(url, data, headers)`` is injectable (SINKS-style hook —
    tests and airgapped runs pass a recorder); the default is a plain
    urllib PUT to ``<gateway>/metrics/job/<job>``. Returns (url, payload)
    so callers can log exactly what was exported."""
    url = f"{gateway_url.rstrip('/')}/metrics/job/{job}"
    payload = prometheus_text(metrics, prefix).encode()
    headers = {"Content-Type": "text/plain; version=0.0.4"}
    if transport is None:
        import urllib.request

        req = urllib.request.Request(
            url, data=payload, headers=headers, method="PUT"
        )
        urllib.request.urlopen(req, timeout=10)
    else:
        transport(url, payload, headers)
    return url, payload


def alert_quality_trend(
    metrics_dir: str,
    current_keep_pct: float,
    window: int = 5,
    degradation_pts: float = 10.0,
    notifier=None,
) -> dict:
    """Evaluate the run-over-run trend AND route a degradation through the
    severity-routed notify channel (reference wires its trend check into
    alerting, metrics_collector.py:220-273 + prometheus/alerts.yml; round-1
    left quality_trend_alert unrouted)."""
    res = quality_trend_alert(
        metrics_dir, current_keep_pct, window, degradation_pts
    )
    if res["alert"]:
        from .notify import notify

        res["notified"] = (notifier or notify)(
            "HIGH",
            f"quality degradation: keep rate {current_keep_pct:.2f}% is "
            f">{degradation_pts:g} pts below the trailing avg "
            f"{res['trailing_avg']:.2f}% over {res['runs']} run(s)",
        )
    return res


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
                    # keep_pct None = halted zero-work run: no data point
                    history.append(float(m["quality"]["keep_pct"]))
                except (KeyError, TypeError, ValueError,
                        json.JSONDecodeError):
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


# ---------------------------------------------------------------------------
# Prometheus alert rules (parity: reference prometheus/alerts.yml — six
# threshold rules over the exported metric names). Generated from the same
# prefix prometheus_text() uses, so rule exprs and exported names cannot
# drift apart; tests assert every expr metric is actually exported.
# ---------------------------------------------------------------------------

# Scale-free defaults: rates and ratios, never absolute per-run counts —
# the reference's own `dq_quarantined_rows > 10` style rules fire on
# every healthy large run (a 160k-clip run at the documented 3.5% defect
# rate quarantines ~5.7k clips), which trains operators to ignore the
# alerts that matter. PromQL divides gauges, so ratio exprs stay valid.
DEFAULT_ALERT_THRESHOLDS = {
    "low_keep_pct": 90.0,        # warning  (alerts.yml LowPassRate)
    "critical_keep_pct": 80.0,   # critical (alerts.yml CriticalPassRate)
    "max_drop_ratio": 0.15,      # warning  (alerts.yml HighQuarantineRate)
    "max_pii_ratio": 0.10,       # warning  (alerts.yml ManyOutliers-analog)
    "min_clips_per_sec": 500.0,  # warning  (alerts.yml SlowPipeline)
}


def render_alert_rules(
    thresholds: dict | None = None, prefix: str = "clip_quality"
) -> str:
    """Prometheus alerting rules over THIS engine's exported metrics."""
    t = {**DEFAULT_ALERT_THRESHOLDS, **(thresholds or {})}

    def rule(name, expr, severity, summary, wait="5m"):
        return f"""      - alert: {name}
        expr: {expr}
        for: {wait}
        labels:
          severity: {severity}
        annotations:
          summary: "{summary}"
          description: "value: {{{{ $value }}}}"
"""

    rules = [
        rule("LowKeepRate",
             f"{prefix}_quality_keep_pct < {t['low_keep_pct']:g}",
             "warning",
             f"clip keep rate below {t['low_keep_pct']:g}%"),
        rule("CriticalKeepRate",
             f"{prefix}_quality_keep_pct < {t['critical_keep_pct']:g}",
             "critical",
             f"CRITICAL: keep rate below {t['critical_keep_pct']:g}% — "
             "pipeline may need human review", wait="1m"),
        rule("HighQuarantineRatio",
             f"{prefix}_quality_dropped / {prefix}_quality_total"
             f" > {t['max_drop_ratio']:g}",
             "warning", "quarantined fraction of the run is high"),
        rule("HighPiiRatio",
             f"{prefix}_quality_pii_rows / {prefix}_quality_total"
             f" > {t['max_pii_ratio']:g}",
             "warning", "unusually large fraction of clips carried PII"),
        rule("SlowPipeline",
             f"{prefix}_performance_clips_per_sec < "
             f"{t['min_clips_per_sec']:g}",
             "warning", "pipeline throughput below budget"),
        rule("QualityTrendDegradation",
             f"{prefix}_trend_alert == 1",
             "warning",
             "keep rate dropped vs the trailing run average", wait="1m"),
    ]
    return (
        "groups:\n  - name: clip_quality_alerts\n    rules:\n"
        + "".join(rules)
    )


def save_alert_rules(
    out_dir: str, thresholds: dict | None = None,
    prefix: str = "clip_quality",
) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "alerts.yml")
    with open(path, "w") as f:
        f.write(render_alert_rules(thresholds, prefix))
    return path


# ---------------------------------------------------------------------------
# Grafana dashboard (parity: reference grafana/dashboards/
# data_quality_dashboard.json — overview gauges/stats, trend timeseries,
# PII row, stage-duration bars). Generated from the SAME prefix as
# prometheus_text, same drift-proof contract as the alert rules.
# ---------------------------------------------------------------------------

def _dashboard_panels(prefix: str) -> list[tuple[str, str, list[str]]]:
    """(panel_type, title, exprs) — every expr must be an exported name."""
    q = f"{prefix}_quality"
    p = f"{prefix}_performance"
    return [
        ("row", "Pipeline Overview", []),
        ("gauge", "Keep Rate (%)", [f"{q}_keep_pct"]),
        ("stat", "Total Clips Processed", [f"{q}_total"]),
        ("stat", "Kept Clips", [f"{q}_kept"]),
        ("stat", "Dropped Clips (quarantine)", [f"{q}_dropped"]),
        ("stat", "Pipeline Duration (s)", [f"{p}_wall_seconds"]),
        ("stat", "Throughput (clips/s)", [f"{p}_clips_per_sec"]),
        ("row", "Quality Trends", []),
        ("timeseries", "Keep Rate Over Time", [f"{q}_keep_pct"]),
        ("timeseries", "Clips Processed Over Time",
         [f"{q}_total", f"{q}_kept", f"{q}_dropped"]),
        ("timeseries", "Duration Trend", [f"{p}_wall_seconds"]),
        ("row", "PII & Scrubbing", []),
        ("stat", "Rows With PII", [f"{q}_pii_rows"]),
        ("stat", "Emails Scrubbed", [f"{q}_pii_emails"]),
        ("stat", "Phones Scrubbed", [f"{q}_pii_phones"]),
        ("stat", "SSNs Scrubbed", [f"{q}_pii_ssns"]),
        ("stat", "Toxic Terms Scrubbed", [f"{q}_pii_tox"]),
    ]


def render_dashboard(prefix: str = "clip_quality") -> str:
    """Grafana dashboard JSON string over this engine's exported metrics."""
    panels = []
    x = y = 0
    for i, (ptype, title, exprs) in enumerate(_dashboard_panels(prefix)):
        if ptype == "row":
            y += 8 if panels else 0
            x = 0
            panels.append({
                "id": i + 1, "type": "row", "title": title,
                "gridPos": {"h": 1, "w": 24, "x": 0, "y": y},
                "collapsed": False, "panels": [],
            })
            y += 1
            continue
        if x + 6 > 24:
            x = 0
            y += 8
        panels.append({
            "id": i + 1, "type": ptype, "title": title,
            "datasource": {"type": "prometheus", "uid": "prometheus"},
            "gridPos": {"h": 8, "w": 6, "x": x, "y": y},
            "targets": [
                {"expr": e, "refId": chr(ord("A") + j),
                 "legendFormat": title, "instant": ptype != "timeseries"}
                for j, e in enumerate(exprs)
            ],
        })
        x += 6
    doc = {
        "uid": "clip-quality-dashboard",
        "title": "Clip Quality Governance Dashboard",
        "schemaVersion": 39,
        "version": 1,
        "editable": True,
        "timezone": "browser",
        "time": {"from": "now-24h", "to": "now"},
        "annotations": {"list": []},
        "templating": {"list": []},
        "panels": panels,
    }
    return json.dumps(doc, indent=2)


def save_dashboard(out_dir: str, prefix: str = "clip_quality") -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "dashboard.json")
    with open(path, "w") as f:
        f.write(render_dashboard(prefix))
    return path
