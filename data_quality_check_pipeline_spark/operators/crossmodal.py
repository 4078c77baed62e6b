"""Cross-modal consistency mining: conflicts between a clip's AUDIO
identity and its TRANSCRIPT identity.

Two production failure modes in web-crawled audio+transcript corpora:

* ``same_audio_diff_text`` — one recording circulating with divergent
  transcripts (mistranscription, caption drift, redubbed subtitles).
  Training on both teaches the model two labels for one input; these
  groups want human review or a best-transcript vote, not silent keep.
* ``same_text_diff_audio`` — one script re-recorded or TTS-regenerated
  many times (content-farm shape). Exact-text dedup already collapses
  these to one survivor; the report quantifies how much synthetic
  re-reading the corpus carries BEFORE dedup picks survivors.

The reference has no audio path at all — this is part of the audio-axis
extension beyond it (see COVERAGE.md). Identity keys reuse the two
committed hash contracts so conflicts are consistent with the dedup
stack: the 64-bit spectral audio fingerprint
(udfs/audio.py:with_audio_fingerprint — Welch windows extracted
JVM-side, payload bytes never cross to Python) and the exact-dedup
content hash (operators/dedup.py:content_hash_expr).

Scale shape (the 100-TB plan): two hash-keyed groupBys — linear,
map-side combinable, AQE-coalesced — and NO pair expansion. A conflict
group of 100k clips costs ONE aggregate row (counts + two example ids
from different variants), not n(n-1)/2 pairs; follow-up triage joins
the example ids or semi-joins the group key back against the corpus.

Missing data is never conflict evidence (the dedup-family invariant):
rows with NULL/empty transcript or fp=0 audio (silent/undecodable)
are excluded from the side that is missing.

Caveat for synthetic corpora (DESIGN.md #22): synth.py's generated
audio fingerprints are degenerate (few distinct fps), so
``same_audio_diff_text`` over a synthetic corpus reports large groups
by construction — a report to read, not a gate to fail on, there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import content_hash_expr

KINDS = ("same_audio_diff_text", "same_text_diff_audio")


def cross_modal_conflicts(
    df: DataFrame,
    id_col: str = "clip_id",
    text_col: str = "transcript",
    kinds: tuple = KINDS,
) -> DataFrame:
    """Group-level cross-modal conflict report.

    Returns one row per conflicting identity group, columns:

    * ``conflict_type`` — one of ``KINDS``
    * ``group_key``     — the shared identity (audio_fp or content
      hash), as a string
    * ``n_clips``       — clips in the group
    * ``n_variants``    — distinct identities on the OTHER modality
      (>1 by construction)
    * ``example_id_a`` / ``example_id_b`` — ids of two clips from two
      DIFFERENT variants (each variant's min id; min-of-mins and
      max-of-mins, so they always differ), enough to eyeball the
      conflict without carrying member lists in the aggregate
    """
    unknown = set(kinds) - set(KINDS)
    if unknown:
        raise ValueError(f"unknown conflict kinds {sorted(unknown)}")
    from ..udfs.audio import with_audio_fingerprint

    keyed = (
        with_audio_fingerprint(df)
        .select(
            F.col(id_col).alias("_id"),
            F.col("audio_fp").alias("_fp"),
            content_hash_expr(text_col).alias("_ck"),
        )
        # both modality keys present: fp=0 is silent/undecodable audio,
        # NULL _ck is missing text — neither is identity evidence
        .filter((F.col("_fp") != 0) & F.col("_ck").isNotNull())
    )
    if len(kinds) > 1:
        # one fingerprint-UDF scan feeds both groupBys; (id, fp, hash)
        # rows are ~24 B each. At extreme corpus sizes materialize this
        # frame to a table instead of pinning executor storage.
        keyed = keyed.cache()

    def _mine(kind: str) -> DataFrame:
        group, variant = (
            ("_fp", "_ck") if kind == "same_audio_diff_text"
            else ("_ck", "_fp")
        )
        variants = keyed.groupBy(group, variant).agg(
            F.min("_id").alias("_vid"), F.count("*").alias("_vc")
        )
        return (
            variants.groupBy(group)
            .agg(
                F.count("*").alias("n_variants"),
                F.sum("_vc").alias("n_clips"),
                F.min("_vid").alias("example_id_a"),
                F.max("_vid").alias("example_id_b"),
            )
            .filter(F.col("n_variants") > 1)
            .select(
                F.lit(kind).alias("conflict_type"),
                F.col(group).cast("string").alias("group_key"),
                "n_clips", "n_variants",
                "example_id_a", "example_id_b",
            )
        )

    out = _mine(kinds[0])
    for kind in kinds[1:]:
        out = out.unionByName(_mine(kind))
    return out


def cross_modal_report(conflicts: DataFrame) -> dict:
    """Collapse a ``cross_modal_conflicts`` frame to the JSON verdict
    the CLI audit prints: per-kind group/clip counts plus the single
    worst group (most clips) as a triage starting point."""
    rows = (
        conflicts.groupBy("conflict_type")
        .agg(
            F.count("*").alias("groups"),
            F.sum("n_clips").alias("clips"),
            F.max(F.struct("n_clips", "group_key")).alias("worst"),
        )
        .collect()
    )
    rep: dict = {kind: {"groups": 0, "clips": 0} for kind in KINDS}
    for r in rows:
        rep[r["conflict_type"]] = {
            "groups": r["groups"],
            "clips": int(r["clips"]),
            "worst_group_key": r["worst"]["group_key"],
            "worst_group_clips": int(r["worst"]["n_clips"]),
        }
    rep["conflict_groups_total"] = sum(
        v["groups"] for v in rep.values() if isinstance(v, dict)
    )
    return rep
