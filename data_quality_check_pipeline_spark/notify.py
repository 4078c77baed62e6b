"""Notification routing with a stdlib webhook transport.

The reference routes alerts to Slack/Email/PagerDuty by severity
(/root/reference/src/notifier.py:24-100+). This module preserves the
severity-routing contract; unregistered transports log. One REAL
transport ships: ``webhook_sink`` — a dependency-free JSON POST
(Slack-compatible ``{"text": ...}`` body) — wired from environment
variables by ``configure_from_env`` (CLIP_QUALITY_SLACK_WEBHOOK /
CLIP_QUALITY_EMAIL_WEBHOOK / CLIP_QUALITY_PAGERDUTY_WEBHOOK), so a
deployment gets live alerts with zero extra dependencies; richer
transports (SMTP, PagerDuty Events API) plug into SINKS the same way.
A transport failure is logged, never raised — alerting must not take
the pipeline down with it.
"""

from __future__ import annotations

import logging
import os
from collections.abc import Callable

log = logging.getLogger("clip_quality.notify")

# severity -> transport names (parity: tiered routing)
ROUTING = {
    "CRITICAL": ["pagerduty", "slack", "email"],
    "HIGH": ["slack", "email"],
    "MEDIUM": ["slack"],
    "LOW": [],
}

SINKS: dict[str, Callable[[str, str], None]] = {}


def notify(severity: str, message: str) -> list[str]:
    """Route a message; returns the transports it was (or would be) sent to."""
    targets = ROUTING.get(severity.upper(), [])
    for t in targets:
        sink = SINKS.get(t)
        if sink is not None:
            try:
                sink(severity, message)
            except Exception:  # noqa: BLE001 — alerting never kills the run
                log.exception("notify transport %s failed", t)
        else:
            log.info("[%s -> %s] %s", severity, t, message)
    return targets


def webhook_sink(
    url: str, timeout: float = 5.0, payload_key: str = "text"
) -> Callable[[str, str], None]:
    """JSON-POST webhook transport (stdlib urllib — no dependencies).
    The body is Slack-incoming-webhook compatible:
    ``{"text": "[SEVERITY] message"}``; ``payload_key`` adapts it to
    other webhook receivers."""
    import json
    import urllib.request

    def send(severity: str, message: str) -> None:
        req = urllib.request.Request(
            url,
            data=json.dumps(
                {payload_key: f"[{severity}] {message}"}
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            resp.read()

    return send


def configure_from_env(env=None) -> int:
    """Register webhook transports declared in the environment
    (CLIP_QUALITY_<TRANSPORT>_WEBHOOK for slack/email/pagerduty);
    returns how many were wired. Idempotent; unset vars leave the
    log-only behavior."""
    env = os.environ if env is None else env
    n = 0
    for name in ("slack", "email", "pagerduty"):
        url = env.get(f"CLIP_QUALITY_{name.upper()}_WEBHOOK")
        if url:
            SINKS[name] = webhook_sink(url)
            n += 1
    return n
