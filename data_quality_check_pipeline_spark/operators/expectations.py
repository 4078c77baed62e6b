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


# ---------------------------------------------------------------------------
# Great Expectations library adapter (reference expectations.py:95-151)
# ---------------------------------------------------------------------------

# expectation kind -> legacy GE PandasDataset method (the API surface the
# reference calls via getattr)
_GE_METHOD = {
    "not_be_null": "expect_column_values_to_not_be_null",
    "be_unique": "expect_column_values_to_be_unique",
    "value_lengths_between": "expect_column_value_lengths_to_be_between",
    "match_regex": "expect_column_values_to_match_regex",
    "be_between": "expect_column_values_to_be_between",
    "be_in_set": "expect_column_values_to_be_in_set",
    "exist": "expect_column_to_exist",
    "of_type": "expect_column_values_to_be_of_type",
}


def _ge_kwargs(e: Expectation) -> dict:
    """Map an Expectation's kwargs onto the GE method's signature."""
    k = e.kwargs
    out: dict = {"column": e.column}
    if e.kind in ("value_lengths_between", "be_between"):
        out.update(min_value=k["min"], max_value=k["max"])
    elif e.kind == "match_regex":
        out["regex"] = k["regex"]
    elif e.kind == "be_in_set":
        out["value_set"] = list(k["values"])
    elif e.kind == "of_type":
        out["type_"] = k["type"]
    # `mostly` applies to column_values expectations only (GE rejects it
    # on schema-level ones)
    if e.kind not in ("exist", "of_type") and e.mostly < 1.0:
        out["mostly"] = e.mostly
    return out


def ge_library_available() -> bool:
    try:
        import great_expectations  # noqa: F401

        return True
    except ImportError:
        return False


def evaluate_suite_via_ge(
    df: DataFrame,
    suite: list[Expectation],
    sample_rows: int = 100_000,
    dataset_cls=None,
) -> list[dict]:
    """Delegate the suite to the Great Expectations library (parity:
    reference expectations.py:95-151, which getattr-dispatches onto a
    PandasDataset and falls back to the built-in evaluator). This
    adapter exists for deployments standardized on GE reporting; the
    PRODUCTION path remains evaluate_suite — one distributed aggregate,
    corpus-scale — because GE's pandas engine is single-node by design.
    The input is therefore bounded: ``df.limit(sample_rows)`` collected
    to pandas (column-pruned to the suite's columns).

    Import-gated: raises RuntimeError when great_expectations is not
    installed (it is absent in this sandbox — the gate and the method/
    kwargs contract are tested against an injected PandasDataset-
    compatible ``dataset_cls``, the fake-airflow pattern). Returns the
    same [{name, success, pass_rate, mostly}] rows as evaluate_suite;
    a method the installed GE version lacks marks that expectation
    failed (reference :127-134) rather than raising."""
    if dataset_cls is None:
        try:
            from great_expectations.dataset import (  # type: ignore
                PandasDataset as dataset_cls,
            )
        except ImportError as exc:
            raise RuntimeError(
                "great_expectations is not installed; use "
                "evaluate_suite (built-in single-aggregate engine)"
            ) from exc
    cols = [e.column for e in suite]
    keep = [c for c in df.columns if c in set(cols)]
    pdf = df.select(*keep).limit(sample_rows).toPandas()
    ge_df = dataset_cls(pdf)
    results: list[dict] = []
    for e in suite:
        method = getattr(ge_df, _GE_METHOD[e.kind], None)
        if method is None:
            results.append({
                "name": e.name, "success": False, "pass_rate": 0.0,
                "mostly": e.mostly,
                "error": f"GE method {_GE_METHOD[e.kind]} not found",
            })
            continue
        r = method(**_ge_kwargs(e))
        r = r if isinstance(r, dict) else r.to_json_dict()
        success = bool(r.get("success", False))
        unexpected = (r.get("result") or {}).get("unexpected_percent")
        rate = (
            1.0 - unexpected / 100.0
            if unexpected is not None else float(success)
        )
        results.append({
            "name": e.name, "success": success, "pass_rate": rate,
            "mostly": e.mostly,
        })
    return results
