"""Row-level validation: a declarative rule registry compiled into ONE
Spark projection.

Capability parity with the reference's per-column rule sets
(/root/reference/src/validator.py:291-321 runs eight separate full-table
Python loops; src/pipeline.py re-runs the validator up to 4x per run).
Here every rule is a boolean Column expression; all rules are evaluated in a
single whole-stage-codegen pass producing:

* ``reasons: array<string>``  — names of failed rules (empty => keep)
* ``keep:    boolean``        — size(reasons) == 0
* ``severity: string``        — max severity across failed rules

Scale notes
-----------
* All heuristic rules are pure Column exprs: no shuffle, no Python.
* The duplicate-id rule is the only rule that needs a shuffle. It is
  expressed as groupBy(key).count() + equi-join back; AQE converts the join
  to broadcast when the duplicate key set is small, and falls back to a
  sort-merge join (with AQE skew splitting) when it is not — correct at both
  10^4 and 10^12 rows.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.colmemo import memo_cols, memoized_cols
from ..functions.exprs import (
    ALLOWED_CODECS,
    ALLOWED_SR_HZ,
    null_or_empty,
)

# Severity ladder (parity: reference severity map, src/config.py:88-93 /
# src/pipeline.py:473-485).
SEVERITY_RANK = {"LOW": 1, "MEDIUM": 2, "HIGH": 3, "CRITICAL": 4}


@dataclass(frozen=True)
class Rule:
    """One validation rule: ``fail`` is TRUE when the row fails."""

    name: str
    severity: str
    fail: Column


# ---------------------------------------------------------------------------
# Graft rule set: audio clip + transcript sanity
# ---------------------------------------------------------------------------

# Thresholds (kept in one place; the synthetic corpus plants defects with
# wide margins around these so keep/drop F1 is robust to float noise).
DUR_MS_MIN = 300
DUR_MS_MAX = 30_000
CHARS_PER_SEC_MIN = 2.0
CHARS_PER_SEC_MAX = 60.0
REPETITION_MAX = 0.6  # 1 - distinct_tokens/total_tokens
SYMBOL_DENSITY_MAX = 0.30  # non [A-Za-z0-9 space] fraction
LANG_CONF_MIN = 0.50
SUPPORTED_LANGS = ["en", "fr", "de", "es", "it"]
PPL_MAX = 9.0  # char-trigram cross-entropy gate (nats)
CLIP_FRAC_MAX = 0.20
SAMPLES_DUR_TOL = 0.20  # |n_samples/sr - dur/1000| / (dur/1000) tolerance


# Hidden helper columns for the transcript-derived rule subexpressions.
# The compiled reasons array AND the severity chain each evaluate every
# rule's `fail` expression, so without sharing the trim / regex-split /
# regexp_replace work runs many times per row inside CASE WHEN branches
# (where codegen's subexpression elimination cannot hoist it — it only
# dedupes unconditional expressions). with_flags projects these ONCE in
# a prelude (unconditional => CSE applies even within the prelude), the
# rules then reference plain attributes, and the prelude is dropped from
# the output. Measured r06: the flags projection over 60k clips fell
# from ~2.3 s to ~0.6 s. Only built for the default 'transcript' column;
# non-default callers keep the self-contained inline expressions.
# null_bytes gets its own PRE-UDF helper (stamped by score_clips before
# the Arrow scorer stage, backfilled by with_flags when absent): the
# rule was the ONLY post-UDF consumer of the wide `bytes` payload, and
# one boolean column computed early lets Catalyst prune the blobs out of
# the Python-eval row queue — the queue otherwise buffers every input
# row (payload included) while awaiting UDF results (r06; the payload is
# ~50 KB/clip vs 1 byte).
_H_NULL_BYTES = "__vr_null_bytes"

_H_MISSING = "__vr_missing"
_H_NCHARS = "__vr_n_chars"
_H_NTOKS = "__vr_n_toks"
_H_NDISTINCT = "__vr_n_distinct"
_H_NSYM = "__vr_n_sym"
_HELPER_COLS = (_H_MISSING, _H_NCHARS, _H_NTOKS, _H_NDISTINCT, _H_NSYM)


@memo_cols
def null_bytes_expr(bytes_col: str = "bytes"):
    """The null_bytes rule's payload test — stamped as _H_NULL_BYTES
    before the UDF stage (score_clips) so the payload prunes out of the
    Python-eval passthrough."""
    return F.col(bytes_col).isNull() | (F.length(bytes_col) == 0)


@memo_cols
def rule_prelude_cols(transcript: str = "transcript") -> dict:
    """The shared transcript-derived helper columns (see _HELPER_COLS):
    one trim, one split, one regexp_replace per row, shared by every
    rule evaluation downstream."""
    t_norm = F.trim(F.col(transcript))
    toks = F.split(t_norm, r"\s+")
    return {
        _H_MISSING: null_or_empty(transcript),
        _H_NCHARS: F.length(t_norm),
        _H_NTOKS: F.array_size(toks),
        _H_NDISTINCT: F.array_size(F.array_distinct(toks)),
        _H_NSYM: F.length(F.regexp_replace(t_norm, r"[A-Za-z0-9 ]", "")),
    }


@memo_cols
def heuristic_rules(
    transcript: str = "transcript",
    sr_hz: str = "sr_hz",
    dur_ms: str = "dur_ms",
    codec: str = "codec",
    clip_id: str = "clip_id",
    bytes_col: str = "bytes",
) -> list[Rule]:
    """Pure-Column rules — no shuffle, no UDF, one codegen pass.

    Parity map (reference rule -> graft rule):
      not_null id (validator.py:63-66)        -> clip_id/bytes/transcript null
      positive int (validator.py:68-73)       -> sr_hz/dur_ms positive + domains
      length bounds (validator.py:97-101)     -> transcript chars/sec ratio
      alphabetic (validator.py:103-110)       -> symbol-density rule
      allowed_value enum (validator.py:271-286)-> codec whitelist
      address len bounds (validator.py:226-235)-> dur_ms bounds

    With the default ``transcript`` column the transcript-derived
    subexpressions are ATTRIBUTE REFERENCES into the with_flags prelude
    (rule_prelude_cols) — same arithmetic, computed once per row."""
    if transcript == "transcript":
        missing = F.col(_H_MISSING)
        n_chars = F.col(_H_NCHARS)
        n_toks = F.col(_H_NTOKS)
        n_distinct = F.col(_H_NDISTINCT)
        n_sym = F.col(_H_NSYM)
    else:
        t_norm = F.trim(F.col(transcript))
        missing = null_or_empty(transcript)
        n_chars = F.length(t_norm)
        toks = F.split(t_norm, r"\s+")
        n_toks = F.array_size(toks)
        n_distinct = F.array_size(F.array_distinct(toks))
        n_sym = F.length(
            F.regexp_replace(t_norm, r"[A-Za-z0-9 ]", "")
        )
    secs = F.col(dur_ms).cast("double") / F.lit(1000.0)
    chars_per_sec = n_chars.cast("double") / secs
    repetition = F.lit(1.0) - n_distinct.cast("double") / n_toks.cast("double")
    sym_density = n_sym.cast("double") / n_chars.cast("double")

    return [
        Rule("null_clip_id", "CRITICAL", null_or_empty(clip_id)),
        Rule(
            "null_bytes", "CRITICAL",
            F.col(_H_NULL_BYTES) if bytes_col == "bytes"
            else F.col(bytes_col).isNull()
            | (F.length(bytes_col) == 0),
        ),
        Rule("empty_transcript", "HIGH", missing),
        Rule(
            "bad_sr_hz",
            "HIGH",
            F.col(sr_hz).isNull() | ~F.col(sr_hz).isin(ALLOWED_SR_HZ),
        ),
        Rule(
            "dur_out_of_range",
            "MEDIUM",
            F.col(dur_ms).isNull()
            | ~F.col(dur_ms).between(DUR_MS_MIN, DUR_MS_MAX),
        ),
        Rule(
            "unknown_codec",
            "HIGH",
            F.col(codec).isNull()
            | ~F.lower(F.trim(F.col(codec))).isin(ALLOWED_CODECS),
        ),
        Rule(
            "length_ratio",
            "MEDIUM",
            ~missing
            & F.col(dur_ms).isNotNull() & (F.col(dur_ms) > 0)
            & ~chars_per_sec.between(CHARS_PER_SEC_MIN, CHARS_PER_SEC_MAX),
        ),
        Rule(
            "repetitive",
            "MEDIUM",
            ~missing
            & (n_toks > 3)
            & (repetition > REPETITION_MAX),
        ),
        Rule(
            "symbol_density",
            "MEDIUM",
            ~missing
            & (n_chars > 0)
            & (sym_density > SYMBOL_DENSITY_MAX),
        ),
    ]


@memo_cols
def model_rules(
    lang: str = "lang",
    lang_conf: str = "lang_conf",
    ppl: str = "ppl",
    clip_frac: str = "clip_frac",
    n_samples: str = "n_samples",
    sr_hz: str = "sr_hz",
    dur_ms: str = "dur_ms",
) -> list[Rule]:
    """Rules over UDF-scored columns (langid / perplexity / audio_stats).
    Still pure Column exprs — the UDFs only *produce* the columns."""
    est_secs = F.col(n_samples).cast("double") / F.col(sr_hz).cast("double")
    dur_secs = F.col(dur_ms).cast("double") / F.lit(1000.0)
    rel_err = F.abs(est_secs - dur_secs) / dur_secs
    return [
        Rule(
            "lang_unsupported",
            "HIGH",
            F.col(lang).isNull() | ~F.col(lang).isin(SUPPORTED_LANGS),
        ),
        Rule("lang_low_conf", "MEDIUM", F.col(lang_conf) < LANG_CONF_MIN),
        Rule("high_perplexity", "MEDIUM", F.col(ppl) > PPL_MAX),
        Rule("clipped_audio", "MEDIUM", F.col(clip_frac) > CLIP_FRAC_MAX),
        Rule(
            "truncated_audio",
            "HIGH",
            (F.col(n_samples) <= 0)
            # guard: only meaningful when sr/dur metadata is sane (division
            # by zero differs between engines; the bad_sr/dur rules own those)
            | (
                (F.col(sr_hz) > 0)
                & (F.col(dur_ms) > 0)
                & (rel_err > SAMPLES_DUR_TOL)
            ),
        ),
    ]


# rules that require the audio_stats UDF columns (clip_frac, n_samples):
# the ONE list both the batch pipeline and the streaming path consult when
# with_audio=False, so the exclusion set cannot silently drift
AUDIO_RULE_NAMES = ("clipped_audio", "truncated_audio")


@memo_cols
def active_rules(with_audio: bool = True) -> list[Rule]:
    """The full heuristic+model rule set, minus the audio-column rules
    when the audio scorer is off. Single source of truth for
    pipeline.flag_clips and streaming.build_streaming_flags.

    Memoized per session (colmemo): the SAME list object returns on
    every call — treat it as immutable. Stable identity is what lets
    with_flags memoize the compiled reasons/severity trees by id()."""
    return heuristic_rules() + [
        r
        for r in model_rules()
        if with_audio or r.name not in AUDIO_RULE_NAMES
    ]


# ---------------------------------------------------------------------------
# Compilation
# ---------------------------------------------------------------------------


def reasons_expr(rules: list[Rule]) -> Column:
    """array of failed rule names — the P15 combine
    (reference: validator.py:309-321) as one expression."""
    return F.array_compact(
        F.array(*[F.when(r.fail, F.lit(r.name)) for r in rules])
    )


def severity_expr(rules: list[Rule]) -> Column:
    """Max severity across failed rules, NULL when none failed."""
    rank = F.greatest(
        F.lit(0),
        *[
            F.when(r.fail, F.lit(SEVERITY_RANK[r.severity])).otherwise(0)
            for r in rules
        ],
    )
    mapping = {v: k for k, v in SEVERITY_RANK.items()}
    expr = F.lit(None).cast("string")
    for v, label in mapping.items():
        expr = F.when(rank == v, F.lit(label)).otherwise(expr)
    return expr


def with_flags(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Attach reasons/keep/severity. Two projections: the shared-helper
    prelude (rule_prelude_cols — one trim/split/regexp_replace per row),
    then the rule compilation over plain attributes; helpers are dropped
    from the output. CollapseProject keeps the prelude separate (its
    expressions are non-cheap and referenced repeatedly), so the plan
    stays one codegen stage with single-evaluation helpers."""
    has_transcript = "transcript" in df.columns
    if has_transcript:
        df = df.withColumns(rule_prelude_cols())
    if _H_NULL_BYTES not in df.columns and "bytes" in df.columns:
        # backfill for callers that did not stamp it pre-UDF
        # (score_clips does — see null_bytes_helper_col)
        df = df.withColumn(_H_NULL_BYTES, null_bytes_expr())
    # compiled-tree memo keyed by the rule list's id(): sound because
    # the memo value pins the list (its id cannot be recycled while the
    # entry lives), and the hot callers pass the session-stable
    # active_rules() object so the key set stays bounded
    reasons, severity = memoized_cols(
        ("compiled_flag_exprs", id(rules)),
        lambda: (rules, reasons_expr(rules), severity_expr(rules)),
    )[1:]
    out = df.withColumns(
        {
            "reasons": reasons,
            "severity": severity,
        }
    ).withColumn("keep", F.array_size(F.col("reasons")) == 0)
    drops = list(_HELPER_COLS) + [_H_NULL_BYTES]
    return out.drop(*drops) if has_transcript else out.drop(_H_NULL_BYTES)


def with_duplicate_flag(
    df: DataFrame,
    key: str = "clip_id",
    out: str = "is_dup",
    broadcast_dups: bool = True,
) -> DataFrame:
    """Flag ALL copies of duplicated keys (parity: pandas
    duplicated(keep=False), validator.py:76-82).

    groupBy + join rather than a window: partial (map-side) aggregation
    shrinks the shuffle (the agg subtree is column-pruned down to the key),
    and the duplicate key set is explicitly broadcast by default — a
    sort-merge join here would shuffle the FULL row payload (audio bytes)
    just to attach a boolean. Set broadcast_dups=False only when the dup-key
    set itself is too large to broadcast (then AQE decides, and upstream
    should dedup in a key-only pre-pass instead).
    """
    dups = (
        df.select(key)
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("_dup_n"))
        .filter(F.col("_dup_n") > 1)
        .select(key, F.lit(True).alias(out))
    )
    if broadcast_dups:
        dups = F.broadcast(dups)
    return (
        df.join(dups, on=key, how="left")
        .withColumn(out, F.coalesce(F.col(out), F.lit(False)))
    )


@memo_cols
def _merge_duplicate_exprs(dup_col: str, name: str, severity: str):
    """(new_reasons, new_sev) trees for merge_duplicate_reason."""
    new_reasons = F.when(
        F.col(dup_col),
        F.array_append(F.col("reasons"), F.lit(name)),
    ).otherwise(F.col("reasons"))
    new_sev = F.when(
        F.col(dup_col)
        & (
            F.col("severity").isNull()
            | (F.lit(SEVERITY_RANK[severity]) >= _sev_rank_expr())
        ),
        F.lit(severity),
    ).otherwise(F.col("severity"))
    return new_reasons, new_sev


def merge_duplicate_reason(
    df: DataFrame,
    dup_col: str = "is_dup",
    name: str = "duplicate_clip_id",
    severity: str = "HIGH",
) -> DataFrame:
    """Fold the duplicate flag into reasons/keep/severity."""
    new_reasons, new_sev = _merge_duplicate_exprs(dup_col, name, severity)
    return (
        df.withColumn("reasons", new_reasons)
        .withColumn("severity", new_sev)
        .withColumn("keep", F.array_size(F.col("reasons")) == 0)
        .drop(dup_col)
    )


def _sev_rank_expr() -> Column:
    expr = F.lit(0)
    for label, v in SEVERITY_RANK.items():
        expr = F.when(F.col("severity") == label, F.lit(v)).otherwise(expr)
    return expr
