"""Cleaning / normalization transforms as Column expressions.

Capability parity with /root/reference/src/cleaner.py:233-242 which applies,
in fixed order: strip whitespace -> phone normalize -> date normalize ->
name title-case -> email lowercase -> missing fill — each as a separate
full-table Python loop. Here the whole chain is ONE Spark projection
(Catalyst CollapseProject + whole-stage codegen).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.colmemo import memo_cols
from ..functions.exprs import norm_text, null_or_empty

# ---------------------------------------------------------------------------
# Graft clean: clips table
# ---------------------------------------------------------------------------


@memo_cols
def clips_cleaning_exprs() -> dict[str, Column]:
    """column -> cleaned expression for the clips table; shared by the
    cleaning projection and the cleaning-log counters so the log always
    counts exactly what the pipeline applied."""
    t = F.col("transcript")
    return {
        "transcript": F.when(null_or_empty(t), F.lit(None)).otherwise(
            norm_text(t)
        ),
        "codec": F.when(
            null_or_empty("codec"), F.lit(None)
        ).otherwise(F.lower(F.trim(F.col("codec")))),
    }


def clean_clips(df: DataFrame) -> DataFrame:
    """Normalize a clips DataFrame in one projection:

    * transcript: trim + collapse whitespace; ""/"nan" -> NULL
      (reference C1/C6 null semantics, cleaner.py:199-215)
    * codec: lowercase + trim (reference C3-analog canonicalization)
    """
    return df.withColumns(clips_cleaning_exprs())


# ---------------------------------------------------------------------------
# Reference-parity customer cleaners (exact semantics of src/cleaner.py)
# ---------------------------------------------------------------------------


@memo_cols
def clean_phone(c: Column | str) -> Column:
    """Strip non-digits; 10 digits -> XXX-XXX-XXXX; 11 digits starting with
    1 -> drop country code; else passthrough (cleaner.py:50-78)."""
    col = F.col(c) if isinstance(c, str) else c
    digits = F.regexp_replace(col.cast("string"), r"\D", "")
    digits10 = F.when(
        (F.length(digits) == 11) & digits.startswith("1"),
        F.substring(digits, 2, 10),
    ).otherwise(digits)
    formatted = F.concat_ws(
        "-",
        F.substring(digits10, 1, 3),
        F.substring(digits10, 4, 3),
        F.substring(digits10, 7, 4),
    )
    return F.when(null_or_empty(col), col).otherwise(
        F.when(F.length(digits10) == 10, formatted).otherwise(col)
    )


@memo_cols
def clean_date(c: Column | str, fmts: list[str] | None = None) -> Column:
    """Literal 'invalid_date' -> NULL; parse alternate formats -> ISO string;
    a value matching NO format passes through UNCHANGED (cleaner.py:92-127
    falls through its format loop keeping the original — silently nulling
    it would destroy data AND book the row as 'cleaned'; formats from
    config.py:314-318)."""
    col = F.col(c) if isinstance(c, str) else c
    fmts = fmts or ["yyyy-MM-dd", "yyyy/MM/dd", "MM/dd/yyyy", "MM-dd-yyyy"]
    s = F.trim(col.cast("string"))
    parsed = F.coalesce(*[F.try_to_timestamp(s, F.lit(f)) for f in fmts])
    return F.when(
        null_or_empty(col) | (F.lower(s) == "invalid_date"), F.lit(None)
    ).otherwise(
        F.coalesce(F.date_format(parsed, "yyyy-MM-dd"), col.cast("string"))
    )


@memo_cols
def clean_name(c: Column | str) -> Column:
    """Title-case (cleaner.py:132-157)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.when(null_or_empty(col), col).otherwise(F.initcap(F.trim(col)))


@memo_cols
def clean_email(c: Column | str) -> Column:
    """Lowercase (cleaner.py:162-186)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.when(null_or_empty(col), col).otherwise(F.lower(F.trim(col)))


def fill_missing(df: DataFrame, fills: dict[str, object]) -> DataFrame:
    """Missing-value fill where empty/'nan' strings count as missing
    (cleaner.py:191-215; fill constants config.py:336-342). One projection."""
    cols = {}
    for name, value in fills.items():
        col = F.col(name)
        cols[name] = F.when(null_or_empty(col), F.lit(value)).otherwise(col)
    return df.withColumns(cols)


def cleaning_counts(df: DataFrame, pairs: dict[str, Column]) -> dict[str, int]:
    """Rows-affected counters (reference C7 action log, cleaner.py:71-76):
    pairs maps action name -> cleaned expression for an existing column.
    Computed in ONE aggregate pass."""
    aggs = [
        F.sum(
            (~F.col(name.split(":")[-1]).eqNullSafe(expr)).cast("long")
        ).alias(name)
        for name, expr in pairs.items()
    ]
    row = df.agg(*aggs).collect()[0]
    return {k: int(row[k] or 0) for k in pairs}
