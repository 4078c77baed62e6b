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
        if review_decision_file is None and not non_interactive:
            # no file channel configured but a human IS attached: TTY
            # prompt with a real auto-timeout (reference interactive
            # path, human_review.py:127-235). Non-TTY stdin degrades to
            # the timeout action immediately — never blocks a scheduler.
            decision = prompt_review_interactive(
                failure_pct, pass_pct, total, failed, t,
            )
        else:
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


def _append_audit(path: str | None, row: dict) -> None:
    """Append one JSONL row to the review audit trail; never raises —
    the audit trail must never block the gate itself."""
    if not path:
        return
    try:
        with open(path, "a") as f:
            f.write(json.dumps(row) + "\n")
    except OSError:
        pass


def _read_line_with_timeout(timeout_s: float) -> str | None:
    """Read one line from stdin, or None on timeout / closed stream.
    select()-based so the advertised auto-timeout is real (the
    reference prints '(Auto-... in Ns)' but its bare input() would wait
    forever; reference human_review.py:195-198)."""
    import select
    import sys

    try:
        ready, _, _ = select.select([sys.stdin], [], [], max(timeout_s, 0))
        if not ready:
            return None
        line = sys.stdin.readline()
        return line if line else None  # '' = EOF/closed
    except (OSError, ValueError):  # closed/invalid stdin
        return None


def prompt_review_interactive(
    failure_pct: float,
    pass_pct: float,
    total: int,
    failed: int,
    thresholds: Thresholds | None = None,
    samples: list[dict] | None = None,
    audit_log: str | None = None,
    input_fn=None,
    isatty: bool | None = None,
) -> str:
    """Interactive operator prompt (parity: reference
    human_review.py:127-235 request_review_interactive): banner with
    pass rate / threshold / counts, up to 5 failed-row samples, a
    [C/D/Q/H] choice with a REAL auto-timeout, and an audit-trail row
    for whatever was decided. Non-TTY stdin (cron, Airflow, CI) never
    blocks: the timeout action applies immediately, exactly as the
    reference's isatty guard does.

    ``input_fn``/``isatty`` are test seams; production callers leave
    them None (select()-gated stdin read, real isatty)."""
    t = thresholds or Thresholds()
    if isatty is None:
        import sys

        try:
            isatty = sys.stdin.isatty()
        except (AttributeError, ValueError):
            isatty = False
    path = audit_log

    def _decide(decision: str, source: str) -> str:
        _append_audit(path, {
            "ts": time.time(), "decision": decision, "source": source,
            "failure_pct": failure_pct,
        })
        return decision

    if not isatty and input_fn is None:
        return _decide(t.timeout_action, "non_interactive_auto")

    print("\n" + "=" * 60)
    print("  HUMAN REVIEW REQUIRED")
    print("=" * 60)
    print(f"\n  Validation pass rate: {pass_pct:.1f}%")
    print(f"  Required threshold:   {t.review_pass_rate:.1f}%")
    print(f"  Failed clips:         {failed}")
    print(f"  Total clips:          {total}\n")
    for s in (samples or [])[:5]:
        print(f"    {s}")
    if samples:
        print()
    print("  Options:")
    print("    [C] Continue   — keep everything, failed rows included")
    print("    [D] Discard    — drop failed rows, keep the rest")
    print("    [Q] Quarantine — failed rows to the DLQ, keep the rest")
    print("    [H] Halt       — stop the pipeline entirely")
    print(f"\n  (Auto-{t.timeout_action} in {t.review_timeout_s:.0f}s "
          "if no response)\n")
    line = (
        input_fn() if input_fn is not None
        else _read_line_with_timeout(t.review_timeout_s)
    )
    if line is None:
        print(f"\n  No response — auto-{t.timeout_action}.")
        return _decide(t.timeout_action, "timeout_default")
    choice = line.strip().upper()[:1]
    decision = {
        "C": CONTINUE, "D": DISCARD, "Q": QUARANTINE, "H": HALT,
    }.get(choice)
    if decision is None:
        print(f"\n  Unrecognized '{choice}' — auto-{t.timeout_action}.")
        return _decide(t.timeout_action, "invalid_choice_default")
    print(f"\n  Decision recorded: {decision.upper()}")
    return _decide(decision, "operator")


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
    _append_audit(path, {
        "ts": time.time(),
        "decision": decision,
        "source": source,
        "decision_file": decision_file,
    })
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
