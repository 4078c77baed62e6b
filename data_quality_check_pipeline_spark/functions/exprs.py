"""Shared Column-expression helpers and regex constants.

These encode the semantic core shared by three consumers:

* the Spark operators (Column expressions here),
* the pure-Python oracle (`oracle.py`, via ``re`` on the same patterns),
* the DuckDB oracle SQL in ``__spark_entry__.py``.

All regexes are written in the common subset of Java regex (Spark) and
RE2 (DuckDB): no backreferences, no lookaround.

Reference-parity notes (capability, not code, from /root/reference):
* "missing" means NaN ∪ trimmed-empty ∪ literal "nan"
  (src/profiler.py:51-54, src/cleaner.py:199-204, src/validator.py:91-94).
* masking transforms mirror src/masker.py:49-103 semantics.
* PII regexes generalize src/config.py:299-311 (email/phone/ssn patterns).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .colmemo import memo_cols

# ---------------------------------------------------------------------------
# Domain constants (graft: audio clip + transcript pairs)
# ---------------------------------------------------------------------------

ALLOWED_SR_HZ = [8000, 16000, 22050, 44100, 48000]
ALLOWED_CODECS = ["pcm_s16le", "flac", "opus", "mp3"]

# PII patterns — common Java-regex/RE2 subset. Fixed scrub order:
# email -> phone -> ssn -> toxicity lexicon (mirrors the reference's
# fixed per-column masking order, src/masker.py:113-146).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\(\d{3}\)[ ]?\d{3}[-.]?\d{4}|\d{3}[-.]\d{3}[-.]\d{4}|\b\d{10}\b"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"

# Synthetic toxicity lexicon — placeholder tokens only (this sandbox must not
# embed a real slur list); the mechanism (word-boundary, case-insensitive,
# fixed order) is what is being built.
TOX_WORDS = ["frak", "blorgit", "smegrot", "zarking", "grotpox"]
TOX_RE = r"(?i)\b(" + "|".join(TOX_WORDS) + r")\b"

EMAIL_TOKEN = "[EMAIL]"
PHONE_TOKEN = "[PHONE]"
SSN_TOKEN = "[SSN]"
TOX_TOKEN = "[TOX]"

# ---------------------------------------------------------------------------
# Null semantics
# ---------------------------------------------------------------------------


def null_or_empty(c: Column | str) -> Column:
    """True when the value is missing under the reference's null semantics:
    SQL NULL, empty-after-trim, or the literal string "nan"/"NaN"."""
    col = F.col(c) if isinstance(c, str) else c
    s = F.trim(col.cast("string"))
    return col.isNull() | (s == "") | (F.lower(s) == "nan")


def norm_text(c: Column | str) -> Column:
    """Canonical transcript normalization: trim + collapse internal
    whitespace runs to single spaces. Pure Column expr — one codegen pass."""
    col = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(F.trim(col), r"\s+", " ")


@memo_cols
def speech_rate_expr(
    transcript: Column | str = "transcript",
    dur_ms: Column | str = "dur_ms",
) -> Column:
    """Advisory words-per-second of the clip: whitespace tokens of the
    normalized transcript over the claimed audio duration — the
    continuous text↔audio alignment signal (natural speech sits around
    1.5-4 wps; far outside that band the transcript likely belongs to
    different audio, or is truncated/padded).

    ADVISORY by design: the keep/drop decision is pinned to reference
    parity (the binary chars/sec length_ratio rule, validate.py), so
    this never gates — it feeds the quality curriculum
    (``--curriculum speech_rate=...``) and numeric drift profiles
    (``--profile-numeric speech_rate=...``). NULL (not 0) when the
    transcript or a positive duration is missing: no evidence is not a
    rate of zero, and the curriculum/profile NULL contracts (NULL bin
    keeps; NaN-as-missing) rely on the distinction."""
    t = F.col(transcript) if isinstance(transcript, str) else transcript
    d = F.col(dur_ms) if isinstance(dur_ms, str) else dur_ms
    words = F.array_size(F.split(norm_text(t), " ")).cast("double")
    secs = d.cast("double") / F.lit(1000.0)
    return F.when(
        null_or_empty(t) | d.isNull() | (secs <= 0.0),
        F.lit(None).cast("double"),
    ).otherwise(F.round(words / secs, 6))


# ---------------------------------------------------------------------------
# Scrub chain (transcript PII / toxicity)
# ---------------------------------------------------------------------------


@memo_cols
def scrub_expr(c: Column | str) -> Column:
    """Fixed-order scrub: email -> phone -> ssn -> toxicity lexicon.

    A single nested regexp_replace chain: Catalyst collapses this into one
    projection; the Java Patterns are compiled once per task, and the whole
    chain runs inside whole-stage codegen (no Python).
    """
    col = F.col(c) if isinstance(c, str) else c
    out = F.regexp_replace(col, EMAIL_RE, EMAIL_TOKEN)
    out = F.regexp_replace(out, PHONE_RE, PHONE_TOKEN)
    out = F.regexp_replace(out, SSN_RE, SSN_TOKEN)
    out = F.regexp_replace(out, TOX_RE, TOX_TOKEN)
    return out


@memo_cols
def pii_type_counts_exprs(c: Column | str) -> dict[str, Column]:
    """Per-PII-type match counts prior to scrubbing, as one Column per type
    (parity: reference pii_detector.py:168-176 reports emails / phones /
    SSNs separately per column; ours adds the toxicity lexicon).

    Counted in the fixed scrub order (email -> phone -> ssn -> tox), each
    type over the text with the PRECEDING types already replaced — so a
    digit run inside a scrubbed email never double-counts as a phone, and
    the four counts always sum to pii_hits_expr exactly."""
    col = F.col(c) if isinstance(c, str) else c
    after_email = F.regexp_replace(col, EMAIL_RE, EMAIL_TOKEN)
    after_phone = F.regexp_replace(after_email, PHONE_RE, PHONE_TOKEN)
    after_ssn = F.regexp_replace(after_phone, SSN_RE, SSN_TOKEN)
    return {
        "emails": F.regexp_count(col, F.lit(EMAIL_RE)).cast("int"),
        "phones": F.regexp_count(after_email, F.lit(PHONE_RE)).cast("int"),
        "ssns": F.regexp_count(after_phone, F.lit(SSN_RE)).cast("int"),
        "tox": F.regexp_count(after_ssn, F.lit(TOX_RE)).cast("int"),
    }


@memo_cols
def pii_hits_expr(c: Column | str) -> Column:
    """Total PII/toxicity match count prior to scrubbing (cell-level counter,
    mirroring the reference's per-cell masking stats, src/masker.py:115-146).

    Counted in the same fixed order as the scrub chain so a phone inside an
    already-scrubbed email is not double counted.
    """
    col = F.col(c) if isinstance(c, str) else c
    after_email = F.regexp_replace(col, EMAIL_RE, EMAIL_TOKEN)
    after_phone = F.regexp_replace(after_email, PHONE_RE, PHONE_TOKEN)
    after_ssn = F.regexp_replace(after_phone, SSN_RE, SSN_TOKEN)
    return (
        F.regexp_count(col, F.lit(EMAIL_RE))
        + F.regexp_count(after_email, F.lit(PHONE_RE))
        + F.regexp_count(after_phone, F.lit(SSN_RE))
        + F.regexp_count(after_ssn, F.lit(TOX_RE))
    ).cast("int")


# ---------------------------------------------------------------------------
# Field-level masks (reference parity: src/masker.py:49-103)
# ---------------------------------------------------------------------------


def _guard(col: Column, masked: Column) -> Column:
    """Passthrough for missing values, like the reference's non-str/[UNKNOWN]
    guards (src/masker.py:51-52)."""
    return F.when(null_or_empty(col), col).otherwise(masked)


@memo_cols
def mask_name(c: Column | str) -> Column:
    """'John' -> 'J***' (src/masker.py:49-57)."""
    col = F.col(c) if isinstance(c, str) else c
    return _guard(col, F.concat(F.substring(col, 1, 1), F.lit("***")))


@memo_cols
def mask_email(c: Column | str) -> Column:
    """'john@gmail.com' -> 'j***@gmail.com'; no-@ passthrough
    (src/masker.py:59-72)."""
    col = F.col(c) if isinstance(c, str) else c
    masked = F.concat(
        F.substring(col, 1, 1), F.lit("***@"), F.substring_index(col, "@", -1)
    )
    return _guard(col, F.when(col.contains("@"), masked).otherwise(col))


@memo_cols
def mask_phone(c: Column | str) -> Column:
    """Keep last 4 digits: '555-123-4567' -> '***-***-4567'
    (src/masker.py:74-83)."""
    col = F.col(c) if isinstance(c, str) else c
    return _guard(col, F.concat(F.lit("***-***-"), F.substring(col, -4, 4)))


@memo_cols
def mask_address(c: Column | str) -> Column:
    """Whole value -> '[MASKED ADDRESS]' (src/masker.py:85-93)."""
    col = F.col(c) if isinstance(c, str) else c
    return _guard(col, F.lit("[MASKED ADDRESS]"))


@memo_cols
def mask_dob(c: Column | str) -> Column:
    """Keep year: '1985-03-15' -> '1985-**-**' (src/masker.py:95-103)."""
    col = F.col(c) if isinstance(c, str) else c
    return _guard(col, F.concat(F.substring(col, 1, 4), F.lit("-**-**")))
