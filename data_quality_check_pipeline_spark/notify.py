"""Notification routing with stdlib transports.

The reference routes alerts to Slack/Email/PagerDuty by severity
(/root/reference/src/notifier.py:24-100+). This module preserves the
severity-routing contract with THREE real dependency-free transports,
all wired from environment variables by ``configure_from_env``:

* ``webhook_sink`` — JSON POST (Slack-compatible ``{"text": ...}``
  body); CLIP_QUALITY_SLACK_WEBHOOK / CLIP_QUALITY_EMAIL_WEBHOOK /
  CLIP_QUALITY_PAGERDUTY_WEBHOOK.
* ``smtp_sink`` — real email over stdlib smtplib;
  CLIP_QUALITY_SMTP_HOST (host[:port]) + CLIP_QUALITY_SMTP_FROM +
  CLIP_QUALITY_SMTP_TO (comma list), optional CLIP_QUALITY_SMTP_USER /
  CLIP_QUALITY_SMTP_PASSWORD / CLIP_QUALITY_SMTP_STARTTLS=1. Takes
  the ``email`` slot (overrides an email webhook if both are set).
* ``pagerduty_events_sink`` — PagerDuty Events API v2 enqueue
  (trigger); CLIP_QUALITY_PAGERDUTY_ROUTING_KEY. Takes the
  ``pagerduty`` slot (overrides a pagerduty webhook).

Unregistered transports log. A transport failure is logged, never
raised — alerting must not take the pipeline down with it.
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


def smtp_sink(
    host: str,
    from_addr: str,
    to_addrs: list[str],
    port: int = 25,
    user: str | None = None,
    password: str | None = None,
    starttls: bool = False,
    timeout: float = 10.0,
) -> Callable[[str, str], None]:
    """Real email transport over stdlib smtplib (parity: the reference's
    EmailNotifier, src/notifier.py SMTP branch). One short-lived
    connection per alert — alerts are rare by construction (tiered
    routing sends email only at HIGH/CRITICAL), so connection reuse
    would only add a stale-socket failure mode. Subject carries the
    severity; the body is the message verbatim."""
    import smtplib
    from email.message import EmailMessage

    def send(severity: str, message: str) -> None:
        msg = EmailMessage()
        msg["Subject"] = f"[clip-quality {severity}] alert"
        msg["From"] = from_addr
        msg["To"] = ", ".join(to_addrs)
        msg.set_content(f"[{severity}] {message}")
        with smtplib.SMTP(host, port, timeout=timeout) as s:
            if starttls:
                s.starttls()
            if user:
                s.login(user, password or "")
            s.send_message(msg)

    return send


def pagerduty_events_sink(
    routing_key: str,
    url: str = "https://events.pagerduty.com/v2/enqueue",
    source: str = "clip-quality-pipeline",
    timeout: float = 5.0,
) -> Callable[[str, str], None]:
    """PagerDuty Events API v2 transport (parity: the reference's
    PagerDutyNotifier): one trigger event per alert, severity mapped
    onto the API's enum (CRITICAL->critical, HIGH->error,
    MEDIUM->warning, else info). Stdlib urllib, same
    failure-is-logged contract as every transport."""
    import json
    import urllib.request

    sev_map = {"CRITICAL": "critical", "HIGH": "error",
               "MEDIUM": "warning"}

    def send(severity: str, message: str) -> None:
        body = {
            "routing_key": routing_key,
            "event_action": "trigger",
            "payload": {
                "summary": message,
                "severity": sev_map.get(severity.upper(), "info"),
                "source": source,
            },
        }
        req = urllib.request.Request(
            url,
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            resp.read()

    return send


def configure_from_env(env=None) -> int:
    """Register the transports declared in the environment (module
    docstring lists the variables); returns how many were wired.
    Idempotent; unset vars leave the log-only behavior. The dedicated
    SMTP / PagerDuty-Events transports win their slots over the
    generic webhook when both are configured."""
    env = os.environ if env is None else env
    wired: set[str] = set()
    for name in ("slack", "email", "pagerduty"):
        url = env.get(f"CLIP_QUALITY_{name.upper()}_WEBHOOK")
        if url:
            SINKS[name] = webhook_sink(url)
            wired.add(name)
    smtp_host = env.get("CLIP_QUALITY_SMTP_HOST")
    smtp_from = env.get("CLIP_QUALITY_SMTP_FROM")
    smtp_to = env.get("CLIP_QUALITY_SMTP_TO")
    if smtp_host and smtp_from and smtp_to:
        # host[:port]. A trailing :digits only counts as a port when the
        # host part contains no OTHER colon — a bare IPv6 literal whose
        # last group is decimal ('::1', '2001:db8::5') would otherwise
        # be split into host '::' + port 1 (r05 ADVICE). Bracketed
        # '[addr]:port' passes the address through unbracketed.
        host, port = smtp_host, ""
        if smtp_host.startswith("["):
            addr, sep, rest = smtp_host[1:].partition("]")
            if sep:
                host = addr
                if rest.startswith(":") and rest[1:].isdigit():
                    port = rest[1:]
        else:
            h, sep, p = smtp_host.rpartition(":")
            if sep and p.isdigit() and ":" not in h:
                host, port = h, p
        SINKS["email"] = smtp_sink(
            host,
            smtp_from,
            [a.strip() for a in smtp_to.split(",") if a.strip()],
            port=int(port) if port else 25,
            user=env.get("CLIP_QUALITY_SMTP_USER"),
            password=env.get("CLIP_QUALITY_SMTP_PASSWORD"),
            starttls=env.get("CLIP_QUALITY_SMTP_STARTTLS") == "1",
        )
        wired.add("email")  # a slot, not a count: overriding a webhook
        # in the same slot must not report two live transports
    pd_key = env.get("CLIP_QUALITY_PAGERDUTY_ROUTING_KEY")
    if pd_key:
        SINKS["pagerduty"] = pagerduty_events_sink(pd_key)
        wired.add("pagerduty")
    return len(wired)
