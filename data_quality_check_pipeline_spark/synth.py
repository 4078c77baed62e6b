"""Deterministic synthetic clips corpus (seed-driven; no external data).

Generates the authoritative graft input table
``(clip_id:string, bytes:binary, sr_hz:int32, dur_ms:int32, codec:string,
transcript:string)`` with planted defects at known row indices, mirroring the
reference's dirty fixture strategy (/root/reference/tests/test_pipeline.py:
52-70 plants one defect per rule) but at corpus scale, plus a sidecar counts
dict so profiling aggregates are exactly assertable (FIXTURES.md §5).

Defect classes are assigned by ``i % 1000`` (DEFECT_*) so planted rates are
~0.1% each and exactly countable; PII injections are assigned by ``i % 97``
(kept rows that must be scrubbed). All planted defects sit far from rule
thresholds so keep/drop F1 is robust to float noise (SURVEY.md §7 risk list).

Consistency invariants (so only *planted* rows violate rules):
* dur_ms is derived from the FINAL transcript length at a chars/sec drawn
  from [20, 45] — safely inside the [2, 60] length-ratio gate even after the
  350 ms minimum clamp.
* sr_hz is chosen per row from the allowed set, stepping DOWN to a smaller
  allowed rate whenever sr*dur would exceed ``audio_max_samples``.
  Caveat: the metadata-vs-payload match holds for clean rows, but bad_dur
  odd rows (45 s metadata over a 7.5 s payload) and bad_sr odd rows
  (3 MHz metadata over a 16 kHz payload) ALSO trip truncated_audio on
  top of their own rule — those rows drop either way, but the
  truncated_audio reason-histogram count exceeds counts['defect_trunc'].
  ``audio_max_samples`` must be >= 64000 so the 8 kHz fallback always
  fits the longest possible clip (~7.5 s).

Language assignment is Zipfian over the 5 supported languages — this skew is
intentional: it drives the salting/skew-handling tests (north rule).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

from .udfs.audio import FAKE_MAGIC
from .udfs.lexicon import LANGS, WORDS

SEED = 42

# defect classes by i % 1000
DEFECT_NULL_TRANSCRIPT = 0
DEFECT_WS_TRANSCRIPT = 1
DEFECT_NAN_TRANSCRIPT = 2
DEFECT_BAD_SR = 3
DEFECT_BAD_DUR = 4
DEFECT_BAD_CODEC = 5
DEFECT_REPETITION = 6
DEFECT_SYMBOLS = 7
DEFECT_LENGTH_RATIO = 8
DEFECT_GIBBERISH = 9
DEFECT_TRUNCATED = 10
DEFECT_CLIPPED = 11
DEFECT_NULL_BYTES = 12
DEFECT_DUP_ID = 13  # clip_id copied from row i-1 (both copies must drop)
N_DEFECT_CLASSES = 14

DEFECT_NAMES = {
    DEFECT_NULL_TRANSCRIPT: "null_transcript",
    DEFECT_WS_TRANSCRIPT: "ws_transcript",
    DEFECT_NAN_TRANSCRIPT: "nan_transcript",
    DEFECT_BAD_SR: "bad_sr",
    DEFECT_BAD_DUR: "bad_dur",
    DEFECT_BAD_CODEC: "bad_codec",
    DEFECT_REPETITION: "repetition",
    DEFECT_SYMBOLS: "symbols",
    DEFECT_LENGTH_RATIO: "length_ratio",
    DEFECT_GIBBERISH: "gibberish",
    DEFECT_TRUNCATED: "truncated",
    DEFECT_CLIPPED: "clipped",
    DEFECT_NULL_BYTES: "null_bytes",
    DEFECT_DUP_ID: "dup_id",
}

# PII injections by i % 97 (only on defect-free rows)
PII_EMAIL = 20
PII_PHONE = 21
PII_SSN = 22
PII_TOX = 23

CODECS_CYCLE = ["pcm_s16le", "flac", "opus", "mp3"]

_AMP = 0.3 * 32767.0
_TRUE_SNR_DB = 40.0

PHONE_FORMS = [
    "555-123-4567",
    "(555) 234-5678",
    "555.987.6543",
    "5551234567",
]


def _zipf_lang(i: np.ndarray) -> np.ndarray:
    """Deterministic Zipfian language assignment from the row index."""
    ranks = np.arange(1, len(LANGS) + 1, dtype=np.float64)
    p = (1.0 / ranks) / np.sum(1.0 / ranks)
    cum = np.cumsum(p)
    h = (i.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)
    u = h.astype(np.float64) / float(1 << 32)
    return np.searchsorted(cum, u, side="right").clip(0, len(LANGS) - 1)


def _make_transcripts(
    n: int, lang_idx: np.ndarray, rng: np.random.RandomState
) -> list[str]:
    word_arrays = {}
    zipf_p = {}
    for j, lang in enumerate(LANGS):
        word_arrays[j] = np.array(WORDS[lang], dtype=object)
        ranks = np.arange(1, len(word_arrays[j]) + 1, dtype=np.float64)
        p = 1.0 / ranks
        zipf_p[j] = p / p.sum()
    n_words = rng.randint(4, 14, size=n)
    out: list[str] = []
    for i in range(n):
        j = int(lang_idx[i])
        words = rng.choice(word_arrays[j], size=int(n_words[i]), p=zipf_p[j])
        out.append(" ".join(words))
    return out


def _encode_pcm(
    n_samples: int, sr: int, freq: float, noise_sigma: float,
    rng: np.random.RandomState, clipped: bool = False,
) -> bytes:
    t = np.arange(n_samples, dtype=np.float64) / sr
    amp = _AMP * (6.0 if clipped else 1.0)
    x = amp * np.sin(2 * np.pi * freq * t)
    x += rng.normal(0.0, noise_sigma, size=n_samples)
    return np.clip(x, -32768, 32767).astype("<i2").tobytes()


def generate_clips(
    n: int,
    seed: int = SEED,
    audio_max_samples: int = 64_000,
    sr_choices: list[int] | None = None,
) -> tuple[pd.DataFrame, dict]:
    """Build the corpus as a pandas DataFrame + sidecar planted-count dict."""
    if audio_max_samples < 64_000:
        raise ValueError("audio_max_samples must be >= 64000 (see module doc)")
    sr_choices = sorted(sr_choices or [8000, 16000, 22050, 44100, 48000])

    rng = np.random.RandomState(seed)
    i = np.arange(n, dtype=np.int64)
    lang_idx = _zipf_lang(i)
    transcripts = _make_transcripts(n, lang_idx, rng)

    case_variant = i % 101 == 50
    cps_draw = rng.uniform(20.0, 45.0, size=n)

    defect = (i % 1000).astype(np.int64)
    defect[defect >= N_DEFECT_CLASSES] = -1
    pii = (i % 97).astype(np.int64)
    is_pii_slot = np.isin(pii, [PII_EMAIL, PII_PHONE, PII_SSN, PII_TOX])
    pii[(defect != -1) | ~is_pii_slot] = -1

    counts: dict = {
        "rows": n,
        "langs": {
            lang: int((lang_idx == j).sum()) for j, lang in enumerate(LANGS)
        },
        "pii_email": 0, "pii_phone": 0, "pii_ssn": 0, "pii_tox": 0,
    }
    for code, name in DEFECT_NAMES.items():
        counts[f"defect_{name}"] = int((defect == code).sum())

    gib_chars = np.array(list("qxzjvkwfbghy"), dtype=object)

    rows_transcript: list[str | None] = []
    rows_sr = np.zeros(n, dtype=np.int64)
    rows_dur = np.zeros(n, dtype=np.int64)
    clip_ids: list[str] = []

    for k in range(n):
        text: str | None = transcripts[k]
        d = int(defect[k])
        p = int(pii[k])

        if p == PII_EMAIL:
            text += " contact me at user%d@example.com" % k
            counts["pii_email"] += 1
        elif p == PII_PHONE:
            text += " call %s now" % PHONE_FORMS[k % len(PHONE_FORMS)]
            counts["pii_phone"] += 1
        elif p == PII_SSN:
            text += " ssn is 123-45-6789 ok"
            counts["pii_ssn"] += 1
        elif p == PII_TOX:
            text += " you total frak head"
            counts["pii_tox"] += 1

        if d == DEFECT_NULL_TRANSCRIPT:
            text = None
        elif d == DEFECT_WS_TRANSCRIPT:
            text = "   "
        elif d == DEFECT_NAN_TRANSCRIPT:
            text = "nan"
        elif d == DEFECT_REPETITION:
            text = " ".join(["again"] * 24)
        elif d == DEFECT_SYMBOLS:
            text = text + " " + "@#$%^&*()!~" * 6
        elif d == DEFECT_GIBBERISH:
            text = "".join(rng.choice(gib_chars, size=60))

        n_chars = len(text) if text else 10
        dur_ms = int(round(n_chars / cps_draw[k] * 1000.0))
        dur_ms = max(350, min(dur_ms, 28000))
        if d == DEFECT_BAD_DUR:
            dur_ms = 80 if k % 2 == 0 else 45000
        elif d == DEFECT_LENGTH_RATIO:
            # target cps 120 (above the 60 gate). Caveat: the 300 ms floor
            # caps effective cps at n_chars/0.3, so rows whose transcript
            # drew <= 18 chars land back inside the gate and are KEPT —
            # counts['defect_length_ratio'] is an upper bound on actual
            # drops, not an exact count (engine and oracle agree on every
            # row either way; fixing this means regenerating every cached
            # corpus + recorded bench goldens, deferred to a corpus bump)
            dur_ms = max(300, int(round(n_chars / 120.0 * 1000.0)))

        # sr: prefer the row's cycled choice, stepping down so the payload
        # fits audio_max_samples (8 kHz always fits: <=7.5s -> <=60k samples)
        dur_eff_ms = min(dur_ms, 7500) if d == DEFECT_BAD_DUR else dur_ms
        sr = sr_choices[k % len(sr_choices)]
        for cand in sorted(sr_choices, reverse=True):
            if cand <= sr and cand * dur_eff_ms / 1000.0 <= audio_max_samples:
                sr = cand
                break
        else:
            sr = sr_choices[0]
        if d == DEFECT_BAD_SR:
            sr = 0 if k % 2 == 0 else 3_000_000

        clip_id = f"clip_{k:012d}"
        if d == DEFECT_DUP_ID and k > 0:
            clip_id = f"clip_{k - 1:012d}"

        rows_transcript.append(text)
        rows_sr[k] = sr
        rows_dur[k] = dur_ms
        clip_ids.append(clip_id)

    # --- audio payloads ---
    payloads: list[bytes | None] = []
    noise_sigma = _AMP / (10.0 ** (_TRUE_SNR_DB / 20.0))
    freqs = rng.uniform(100.0, 900.0, size=n)
    audio_rng = np.random.RandomState(seed + 1)
    for k in range(n):
        d = int(defect[k])
        if d == DEFECT_NULL_BYTES:
            payloads.append(None)
            continue
        sr_eff = rows_sr[k] if rows_sr[k] in sr_choices else 16000
        dur_eff = min(int(rows_dur[k]), 7500)  # bad_dur rows: bounded payload
        n_samp = min(
            int(round(sr_eff * dur_eff / 1000.0)), audio_max_samples
        )
        pcm = _encode_pcm(
            n_samp, int(sr_eff), float(freqs[k]), noise_sigma, audio_rng,
            clipped=(d == DEFECT_CLIPPED),
        )
        if d == DEFECT_TRUNCATED:
            pcm = pcm[: max(2, len(pcm) // 3)]
        c = CODECS_CYCLE[k % len(CODECS_CYCLE)]
        if c in FAKE_MAGIC:
            pcm = FAKE_MAGIC[c] + pcm
        payloads.append(pcm)

    codec_out = [
        (
            "amr"
            if defect[k] == DEFECT_BAD_CODEC
            else (
                CODECS_CYCLE[k % len(CODECS_CYCLE)].upper()
                if case_variant[k]
                else CODECS_CYCLE[k % len(CODECS_CYCLE)]
            )
        )
        for k in range(n)
    ]

    df = pd.DataFrame(
        {
            "clip_id": clip_ids,
            "bytes": payloads,
            "sr_hz": rows_sr.astype(np.int32),
            "dur_ms": rows_dur.astype(np.int32),
            "codec": codec_out,
            "transcript": rows_transcript,
        }
    )
    return df, counts


def write_corpus(
    out_dir: str,
    n: int,
    seed: int = SEED,
    audio_max_samples: int = 64_000,
    sr_choices: list[int] | None = None,
    row_group_size: int = 1024,
) -> dict:
    """Write the corpus as parquet + sidecar JSON (deterministic given args).

    ``row_group_size`` matters for Spark parallelism: parquet scans split at
    row-group boundaries, so ~1k rows (~64 MB of audio payload) per group
    keeps a 32-core scan busy; one giant row group would serialize the whole
    UDF pipeline behind a single task.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    df, counts = generate_clips(
        n, seed=seed, audio_max_samples=audio_max_samples,
        sr_choices=sr_choices,
    )
    table = pa.Table.from_pandas(df, preserve_index=False)
    pq.write_table(
        table,
        os.path.join(out_dir, "clips.parquet"),
        row_group_size=row_group_size,
    )
    with open(os.path.join(out_dir, "counts.json"), "w") as f:
        json.dump(counts, f, indent=2)
    return counts
