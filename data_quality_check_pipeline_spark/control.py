"""Control plane: threshold gate, review decisions, DLQ policy, retry.

Capability parity with the reference's orchestration
(/root/reference/src/pipeline.py:302-369 threshold+review branch,
src/human_review.py:240-301 file-based decisions,
src/dead_letter_queue.py retry bookkeeping,
src/retry_handler.py:33-94 exponential backoff).

All gates operate on tiny collected aggregates — never on row data — so the
control plane is O(1) regardless of corpus size.
"""

from __future__ import annotations

import functools
import json
import os
import time
from dataclasses import dataclass, field

# decisions (parity: human_review.py:26-31)
CONTINUE = "continue"
DISCARD = "discard"
QUARANTINE = "quarantine"
HALT = "halt"


@dataclass(frozen=True)
class Thresholds:
    """Parity: config.py:76-109."""

    hard_failure_pct: float = 5.0  # fail% above this needs a decision
    review_pass_rate: float = 80.0  # pass% below this forces review
    review_timeout_s: float = 300.0
    timeout_action: str = QUARANTINE
    max_retries: int = 3


@dataclass
class GateResult:
    decision: str
    failure_pct: float
    pass_pct: float
    reviewed: bool = False
    detail: str = ""


def threshold_gate(
    total: int,
    failed: int,
    thresholds: Thresholds | None = None,
    review_decision_file: str | None = None,
    non_interactive: bool = True,
) -> GateResult:
    """Decide continue/discard/quarantine/halt from validation counts.

    Mirrors pipeline.py:302-369: within hard threshold -> continue; below
    review pass-rate -> review (file-based decision or timeout action);
    otherwise quarantine failed rows and continue.
    """
    t = thresholds or Thresholds()
    failure_pct = 100.0 * failed / total if total else 0.0
    pass_pct = 100.0 - failure_pct

    if failure_pct <= t.hard_failure_pct:
        return GateResult(CONTINUE, failure_pct, pass_pct)
    if pass_pct < t.review_pass_rate:
        decision = poll_review_decision(
            review_decision_file,
            timeout_s=0.0 if non_interactive else t.review_timeout_s,
            default=t.timeout_action,
        )
        return GateResult(
            decision, failure_pct, pass_pct, reviewed=True,
            detail="review gate (pass rate below threshold)",
        )
    return GateResult(
        QUARANTINE, failure_pct, pass_pct,
        detail="failure above hard threshold; quarantining failed rows",
    )


def poll_review_decision(
    decision_file: str | None,
    timeout_s: float,
    default: str,
    poll_interval_s: float = 1.0,
    audit_log: str | None = None,
) -> str:
    """File-based human-in-the-loop channel (parity:
    human_review.py:240-301). The decision file contains
    {"decision": "continue|discard|quarantine|halt"}.

    Every consumed decision (including a timeout default) appends one JSONL
    row to ``audit_log`` when given — or, when the decision file is set, to
    ``<decision_file>.audit.jsonl`` next to it — mirroring the reference's
    review audit trail (human_review.py:306-310)."""
    deadline = time.time() + timeout_s
    decision, source = None, "timeout_default"
    while True:
        if decision_file and os.path.exists(decision_file):
            try:
                with open(decision_file) as f:
                    d = json.load(f).get("decision", "").lower()
                if d in (CONTINUE, DISCARD, QUARANTINE, HALT):
                    decision, source = d, "decision_file"
                    break
            except (json.JSONDecodeError, OSError):
                pass
        if time.time() >= deadline:
            decision = default
            break
        time.sleep(min(poll_interval_s, max(deadline - time.time(), 0)))

    path = audit_log or (
        f"{decision_file}.audit.jsonl" if decision_file else None
    )
    if path:
        try:
            with open(path, "a") as f:
                f.write(json.dumps({
                    "ts": time.time(),
                    "decision": decision,
                    "source": source,
                    "decision_file": decision_file,
                }) + "\n")
        except OSError:
            pass  # the audit trail must never block the gate itself
    return decision


def retry(
    max_tries: int = 3, base_delay_s: float = 2.0, cap_s: float = 60.0,
    exceptions: tuple = (Exception,),
):
    """Exponential-backoff retry for driver-side I/O (parity:
    retry_handler.py:33-94; Spark tasks already retry on executors)."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            delay = base_delay_s
            for attempt in range(1, max_tries + 1):
                try:
                    return fn(*args, **kwargs)
                except exceptions:
                    if attempt == max_tries:
                        raise
                    time.sleep(min(delay, cap_s))
                    delay *= 2
            raise AssertionError("unreachable")

        return wrapper

    return deco


@dataclass
class StageLog:
    """Per-stage status records (parity: pipeline.py:104-126)."""

    stages: list[dict] = field(default_factory=list)

    def record(self, name: str, status: str, t0: float, **details) -> None:
        self.stages.append(
            {
                "stage": name,
                "status": status,
                "duration_s": round(time.time() - t0, 4),
                **details,
            }
        )
