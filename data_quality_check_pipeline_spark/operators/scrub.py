"""PII / toxicity scrubbing of transcripts (mask stage).

Capability parity with /root/reference/src/masker.py:108-149 (mask_all_pii:
fixed-order per-column masking + per-cell counters), re-targeted to
transcripts: one projection producing ``transcript_scrubbed`` and
``pii_hits`` via a fixed-order regexp_replace chain — entirely JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exprs import (
    pii_hits_expr,
    pii_type_counts_exprs,
    scrub_expr,
)


def scrub_transcripts(
    df: DataFrame,
    transcript: str = "transcript",
    out: str = "transcript_scrubbed",
    hits: str = "pii_hits",
) -> DataFrame:
    """Add scrubbed transcript + hit counter in one projection."""
    return df.withColumns(
        {
            out: scrub_expr(transcript),
            hits: pii_hits_expr(transcript),
        }
    )


def pii_type_agg_cols(transcript: str = "transcript") -> dict:
    """Per-PII-type corpus totals as aggregate Columns (parity: reference
    pii_detector.py:168-176 per-type detection counts). Designed to
    piggyback on an existing single-pass df.agg (e.g. evaluate_suite
    extra_aggs) — 'how many of WHAT was scrubbed' without a new job."""
    return {
        f"pii_{k}": F.sum(c.cast("long"))
        for k, c in pii_type_counts_exprs(transcript).items()
    }


def scrub_stats(
    df: DataFrame, hits: str = "pii_hits",
    transcript: str | None = None,
) -> dict[str, int]:
    """Corpus-level scrub counters (parity: masker stats dict,
    src/masker.py:129-149) in one aggregate pass. When ``transcript`` is
    given (the PRE-scrub text column), the same pass also breaks hits down
    by PII type (emails/phones/ssns/tox)."""
    aggs = [
        F.count(F.lit(1)).alias("rows"),
        F.sum((F.col(hits) > 0).cast("long")).alias("rows_with_pii"),
        F.sum(F.col(hits)).alias("total_hits"),
    ]
    if transcript is not None:
        aggs += [c.alias(k) for k, c in pii_type_agg_cols(transcript).items()]
    row = df.agg(*aggs).collect()[0]
    out = {
        "rows": int(row["rows"]),
        "rows_with_pii": int(row["rows_with_pii"] or 0),
        "total_hits": int(row["total_hits"] or 0),
    }
    if transcript is not None:
        for k in ("pii_emails", "pii_phones", "pii_ssns", "pii_tox"):
            out[k] = int(row[k] or 0)
    return out
