"""Declarative expectation suite (Great-Expectations style).

Capability parity with /root/reference/src/expectations.py:39-72 (19
declared expectations) and its built-in evaluator (:156-249) which
implements 8 expectation kinds, all sharing the fractional ``mostly``
pass-rate semantic (:194).

Spark-first design: every data expectation compiles to ONE
``avg(when(...))`` aggregate expression; the whole suite evaluates in a
SINGLE ``df.agg`` pass (the reference loops the table once per expectation).
Schema expectations (exist / of_type) are evaluated against ``df.schema``
with no data pass at all.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.exprs import null_or_empty


@dataclass(frozen=True)
class Expectation:
    kind: str
    column: str
    kwargs: dict = field(default_factory=dict)
    mostly: float = 1.0

    @property
    def name(self) -> str:
        return f"{self.kind}:{self.column}"


def _pass_rate(cond: Column) -> Column:
    """avg over non-null evaluations of the condition."""
    return F.avg(cond.cast("double"))


def _agg_expr(e: Expectation) -> Column | None:
    """Data expectations -> one aggregate Column; schema ones -> None."""
    c = F.col(e.column)
    k = e.kwargs
    if e.kind == "not_be_null":
        # reference counts empty/'nan' as null (expectations.py:203-205)
        return _pass_rate(~null_or_empty(c))
    if e.kind == "be_unique":
        # pass-rate = distinct/non-null (all-or-nothing in the reference;
        # expressed as a ratio so `mostly` composes). nullif: zero
        # non-null rows (empty shard — e.g. every kept clip deduped
        # away) must yield NULL = vacuous pass, not DIVIDE_BY_ZERO
        # under ANSI mode
        return (
            F.count_distinct(c).cast("double")
            / F.nullif(F.count(c).cast("double"), F.lit(0.0))
        )
    if e.kind == "value_lengths_between":
        return _pass_rate(
            F.length(c.cast("string")).between(k["min"], k["max"])
        )
    if e.kind == "match_regex":
        return _pass_rate(c.cast("string").rlike(k["regex"]))
    if e.kind == "be_between":
        return _pass_rate(c.cast("double").between(k["min"], k["max"]))
    if e.kind == "be_in_set":
        vals = [str(v).lower() for v in k["values"]]
        return _pass_rate(F.lower(F.trim(c.cast("string"))).isin(vals))
    if e.kind in ("exist", "of_type"):
        return None
    raise ValueError(f"unknown expectation kind {e.kind}")


def evaluate_suite(
    df: DataFrame,
    suite: list[Expectation],
    extra_aggs: dict[str, Column] | None = None,
) -> tuple[list[dict], dict]:
    """Evaluate all expectations; ONE aggregate job for the data-dependent
    ones. Returns ([{name, success, pass_rate, mostly}, ...], extras).

    ``extra_aggs`` piggybacks arbitrary aggregate Columns onto the same
    single pass (e.g. the pipeline's PII row count); their values land in
    ``extras`` (empty dict when no extra_aggs) so callers avoid a second
    full-table job. The return shape is always a 2-tuple."""
    results: list[dict] = []
    agg_cols: list[Column] = []
    agg_items: list[Expectation] = []
    schema_fields = {f.name: f.dataType.simpleString() for f in df.schema}

    for e in suite:
        if e.kind == "exist":
            ok = e.column in schema_fields
            results.append(
                {"name": e.name, "success": ok, "pass_rate": float(ok),
                 "mostly": e.mostly}
            )
        elif e.kind == "of_type":
            ok = schema_fields.get(e.column) == e.kwargs["type"]
            results.append(
                {"name": e.name, "success": ok, "pass_rate": float(ok),
                 "mostly": e.mostly}
            )
        else:
            expr = _agg_expr(e)
            agg_cols.append(expr.alias(f"e{len(agg_items)}"))
            agg_items.append(e)

    extras: dict = {}
    if agg_items or extra_aggs:
        for k, c in (extra_aggs or {}).items():
            agg_cols.append(c.alias(f"x_{k}"))
        row = df.agg(*agg_cols).collect()[0]
        for k in (extra_aggs or {}):
            extras[k] = row[f"x_{k}"]
        for i, e in enumerate(agg_items):
            rate = row[f"e{i}"]
            # NULL aggregate = zero evaluated rows (empty input, or a
            # rate whose per-row flag was null throughout): vacuously
            # satisfied, matching Great Expectations' `mostly` semantics
            # — 0.0 here would flood an empty shard's report with nine
            # simultaneous false failures
            rate = float(rate) if rate is not None else 1.0
            results.append(
                {
                    "name": e.name,
                    "success": rate >= e.mostly,
                    "pass_rate": rate,
                    "mostly": e.mostly,
                }
            )
    return results, extras


def clips_suite() -> list[Expectation]:
    """Post-filter assertion suite over the cleaned clips table
    (SURVEY.md §2.6 graft: the quality contract on kept rows)."""
    from .validate import DUR_MS_MAX, DUR_MS_MIN, SUPPORTED_LANGS
    from ..functions.exprs import ALLOWED_CODECS, ALLOWED_SR_HZ

    return [
        Expectation("exist", "clip_id"),
        Expectation("exist", "transcript_scrubbed"),
        Expectation("of_type", "sr_hz", {"type": "int"}),
        Expectation("not_be_null", "clip_id"),
        Expectation("be_unique", "clip_id"),
        Expectation("not_be_null", "transcript_scrubbed", mostly=0.99),
        Expectation("be_in_set", "sr_hz", {"values": ALLOWED_SR_HZ}),
        Expectation("be_in_set", "codec", {"values": ALLOWED_CODECS}),
        Expectation("be_in_set", "lang", {"values": SUPPORTED_LANGS}),
        Expectation(
            "be_between", "dur_ms", {"min": DUR_MS_MIN, "max": DUR_MS_MAX}
        ),
        Expectation(
            "match_regex", "clip_id", {"regex": r"^clip_\d{12}$"},
            mostly=0.999,
        ),
    ]
