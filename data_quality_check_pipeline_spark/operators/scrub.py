"""PII / toxicity scrubbing of transcripts (mask stage).

Capability parity with /root/reference/src/masker.py:108-149 (mask_all_pii:
fixed-order per-column masking + per-cell counters), re-targeted to
transcripts: one projection producing ``transcript_scrubbed`` and
``pii_hits`` via a fixed-order regexp_replace chain — entirely JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exprs import pii_hits_expr, scrub_expr


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


def scrub_stats(df: DataFrame, hits: str = "pii_hits") -> dict[str, int]:
    """Corpus-level scrub counters (parity: masker stats dict,
    src/masker.py:129-149) in one aggregate pass."""
    row = df.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum((F.col(hits) > 0).cast("long")).alias("rows_with_pii"),
        F.sum(F.col(hits)).alias("total_hits"),
    ).collect()[0]
    return {
        "rows": int(row["rows"]),
        "rows_with_pii": int(row["rows_with_pii"] or 0),
        "total_hits": int(row["total_hits"] or 0),
    }
