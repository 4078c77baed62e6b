"""Notification routing — log-only stub.

The reference routes alerts to Slack/Email/PagerDuty by severity
(/root/reference/src/notifier.py:24-100+). Engine parity does not require
real transports (SURVEY.md §2.10): this stub preserves the severity-routing
contract and logs; production deployments plug transports into SINKS.
"""

from __future__ import annotations

import logging
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
            sink(severity, message)
        else:
            log.info("[%s -> %s] %s", severity, t, message)
    return targets
