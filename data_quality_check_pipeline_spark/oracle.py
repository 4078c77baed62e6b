"""Pure-Python/numpy reference implementation (the parity oracle).

Independently re-implements the pipeline semantics — clean -> validate ->
duplicate flag -> model rules -> scrub — over a pandas DataFrame, WITHOUT
Spark. The pytest parity suite runs both this oracle and the Spark pipeline
over the same deterministic corpus and asserts keep/drop F1 >= 0.99,
scrubbed-transcript string equality, and decoded-PCM SNR >= 30 dB
(BASELINE.json north_rule invariants).

The langid / perplexity / audio-stats models are the SAME deterministic
numpy functions used inside the Spark pandas UDFs (udfs/), which is exactly
the reference-label relationship the north rule demands; everything else
(null semantics, rule predicates, regex scrub) is re-derived here with
`re`/pandas so a semantic bug in the Spark Column expressions cannot hide.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .functions.exprs import (
    ALLOWED_CODECS,
    ALLOWED_SR_HZ,
    EMAIL_RE,
    PHONE_RE,
    SSN_RE,
    TOX_RE,
)
from .operators.validate import (
    CHARS_PER_SEC_MAX,
    CHARS_PER_SEC_MIN,
    CLIP_FRAC_MAX,
    DUR_MS_MAX,
    DUR_MS_MIN,
    LANG_CONF_MIN,
    PPL_MAX,
    REPETITION_MAX,
    SAMPLES_DUR_TOL,
    SEVERITY_RANK,
    SUPPORTED_LANGS,
    SYMBOL_DENSITY_MAX,
)
from .udfs.audio import stats_batch
from .udfs.langid import classify
from .udfs.perplexity import score_texts

# re.ASCII: Java regex (the engine) treats \d, \w and \b as ASCII by
# default while Python re is unicode-aware — without this flag the oracle
# would scrub e.g. an Arabic-Indic digit run as a phone number and diverge
# from the engine (found by hypothesis, tests/test_property.py).
_EMAIL = re.compile(EMAIL_RE, re.ASCII)
_PHONE = re.compile(PHONE_RE, re.ASCII)
_SSN = re.compile(SSN_RE, re.ASCII)
_TOX = re.compile(TOX_RE, re.ASCII)

_RULE_SEVERITY = {
    "null_clip_id": "CRITICAL",
    "null_bytes": "CRITICAL",
    "empty_transcript": "HIGH",
    "bad_sr_hz": "HIGH",
    "dur_out_of_range": "MEDIUM",
    "unknown_codec": "HIGH",
    "length_ratio": "MEDIUM",
    "repetitive": "MEDIUM",
    "symbol_density": "MEDIUM",
    "duplicate_clip_id": "HIGH",
    "lang_unsupported": "HIGH",
    "lang_low_conf": "MEDIUM",
    "high_perplexity": "MEDIUM",
    "clipped_audio": "MEDIUM",
    "truncated_audio": "HIGH",
}


def _null_or_empty(v) -> bool:
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return True
    s = str(v).strip()
    return s == "" or s.lower() == "nan"


def _is_null_num(v) -> bool:
    """SQL-NULL test for numeric metadata: a nullable int column comes out
    of pandas .to_numpy() as float64 with NaN (never None), so an
    `is None` check silently passes NaN through to int() and crashes."""
    return v is None or (isinstance(v, (float, np.floating)) and np.isnan(v))


def _clean_text(v):
    if _null_or_empty(v):
        return None
    return re.sub(r"\s+", " ", str(v).strip())


def _clean_codec(v):
    if _null_or_empty(v):
        return None
    return str(v).strip().lower()


def scrub_text(t: str) -> tuple[str, int]:
    """Fixed-order scrub (email -> phone -> ssn -> lexicon) + hit count."""
    hits = len(_EMAIL.findall(t))
    t1 = _EMAIL.sub("[EMAIL]", t)
    hits += len(_PHONE.findall(t1))
    t2 = _PHONE.sub("[PHONE]", t1)
    hits += len(_SSN.findall(t2))
    t3 = _SSN.sub("[SSN]", t2)
    hits += len(_TOX.findall(t3))
    t4 = _TOX.sub("[TOX]", t3)
    return t4, hits


def run_oracle(df: pd.DataFrame) -> pd.DataFrame:
    """Full pipeline oracle. Input: raw clips pandas DataFrame.

    Returns one row per input row with columns:
    clip_id, keep, drop_reasons (list[str]), severity, lang, lang_conf, ppl,
    transcript_clean, transcript_scrubbed (None when dropped), pii_hits.
    """
    n = len(df)
    transcript = [_clean_text(v) for v in df["transcript"]]
    codec = [_clean_codec(v) for v in df["codec"]]
    clip_id = list(df["clip_id"])
    payload = list(df["bytes"])
    sr = df["sr_hz"].to_numpy()
    dur = df["dur_ms"].to_numpy()

    lid = classify(transcript)
    lang = list(lid["lang"])
    conf = lid["lang_conf"].to_numpy()
    ppl = score_texts(transcript)
    astats = stats_batch(payload, codec)
    n_samples = astats["n_samples"].to_numpy()
    clip_frac = astats["clip_frac"].to_numpy()

    # engine parity: with_duplicate_flag joins on the RAW clip_id —
    # SQL null join keys never match (None/NaN rows are never flagged)
    # but '' / literal 'nan' are ordinary values it groups and flags
    dup_counts: dict[str, int] = {}
    for cid in clip_id:
        if not _is_null_num(cid):
            dup_counts[cid] = dup_counts.get(cid, 0) + 1

    reasons_all: list[list[str]] = []
    for k in range(n):
        reasons: list[str] = []
        t = transcript[k]
        if _null_or_empty(clip_id[k]):
            reasons.append("null_clip_id")
        if payload[k] is None or len(payload[k]) == 0:
            reasons.append("null_bytes")
        if t is None:
            reasons.append("empty_transcript")
        if _is_null_num(sr[k]) or int(sr[k]) not in ALLOWED_SR_HZ:
            reasons.append("bad_sr_hz")
        if _is_null_num(dur[k]) or not (
            DUR_MS_MIN <= int(dur[k]) <= DUR_MS_MAX
        ):
            reasons.append("dur_out_of_range")
        if codec[k] is None or codec[k] not in ALLOWED_CODECS:
            reasons.append("unknown_codec")
        if t is not None and not _is_null_num(dur[k]) and int(dur[k]) > 0:
            cps = len(t) / (int(dur[k]) / 1000.0)
            if not (CHARS_PER_SEC_MIN <= cps <= CHARS_PER_SEC_MAX):
                reasons.append("length_ratio")
        if t is not None:
            toks = t.split(" ")
            if len(toks) > 3:
                rep = 1.0 - len(set(toks)) / len(toks)
                if rep > REPETITION_MAX:
                    reasons.append("repetitive")
            n_chars = len(t)
            if n_chars > 0:
                n_sym = len(re.sub(r"[A-Za-z0-9 ]", "", t))
                if n_sym / n_chars > SYMBOL_DENSITY_MAX:
                    reasons.append("symbol_density")
        if (
            not _is_null_num(clip_id[k])
            and dup_counts.get(clip_id[k], 0) > 1
        ):
            reasons.append("duplicate_clip_id")
        if lang[k] is None or lang[k] not in SUPPORTED_LANGS:
            reasons.append("lang_unsupported")
        if conf[k] < LANG_CONF_MIN:
            reasons.append("lang_low_conf")
        if ppl[k] > PPL_MAX:
            reasons.append("high_perplexity")
        if clip_frac[k] > CLIP_FRAC_MAX:
            reasons.append("clipped_audio")
        trunc = n_samples[k] <= 0
        if not trunc and not _is_null_num(sr[k]) and not _is_null_num(dur[k]):
            if int(sr[k]) > 0 and int(dur[k]) > 0:
                est = n_samples[k] / float(sr[k])
                ref = int(dur[k]) / 1000.0
                trunc = abs(est - ref) / ref > SAMPLES_DUR_TOL
        if trunc:
            reasons.append("truncated_audio")
        reasons_all.append(reasons)

    keep = [len(r) == 0 for r in reasons_all]
    severity = [
        max((_RULE_SEVERITY[x] for x in r), key=SEVERITY_RANK.get)
        if r
        else None
        for r in reasons_all
    ]
    scrubbed = []
    hits = []
    for k in range(n):
        if keep[k] and transcript[k] is not None:
            s, h = scrub_text(transcript[k])
        else:
            s, h = None, 0
        scrubbed.append(s)
        hits.append(h)

    return pd.DataFrame(
        {
            "clip_id": clip_id,
            "keep": keep,
            "drop_reasons": reasons_all,
            "severity": severity,
            "lang": lang,
            "lang_conf": conf,
            "ppl": ppl,
            "transcript_clean": transcript,
            "transcript_scrubbed": scrubbed,
            "pii_hits": hits,
        }
    )
