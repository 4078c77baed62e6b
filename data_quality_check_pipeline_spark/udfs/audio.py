"""Audio decode + feature extraction as a vectorized Arrow pandas UDF.

Treats audio as an opaque ``binary`` column with typed metadata (sr_hz,
dur_ms, codec) — the multimodal-column pattern. Decoding and reductions are
batched: every payload in an Arrow batch is decoded into ONE concatenated
int16 array and all statistics (rms, clip fraction, spectral SNR) are
computed with segmented numpy reductions. No per-row Python math.

Codec support in this sandbox (no audio libraries installed):

* ``pcm_s16le`` — REAL decode: little-endian signed 16-bit PCM.
* ``flac`` / ``opus`` / ``mp3`` — DETERMINISTIC FAKE containers produced by
  synth.py: an 8-byte magic header (b"FAKE" + codec[:4]) followed by raw
  PCM16. The decode strips the header. A real deployment would replace
  ``_decode_compressed`` with pysoundfile/ffmpeg — see the clearly-marked
  hook below (NotImplementedError when a non-fake payload is seen).

SNR estimate: Welch-averaged spectral SNR — ``_N_WINDOWS`` Hann windows of
``_FFT_N`` samples evenly spaced across the clip, PSDs averaged, signal =
power in a small band around the spectral peak, noise = the rest. For the
synthetic sine+noise corpus this tracks the true SNR closely and supports
the decoded-PCM SNR >= 30 dB invariant from BASELINE.json.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    FloatType,
    IntegerType,
    StructField,
    StructType,
)

FAKE_MAGIC = {
    "flac": b"FAKEflac",
    "opus": b"FAKEopus",
    "mp3": b"FAKEmp3_",
}
_FFT_N = 2048
_N_WINDOWS = 4  # Welch windows averaged per clip
_PEAK_BAND = 3  # bins summed around the spectral peak as "signal"
_CLIP_THRESHOLD = 32700

AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("n_samples", IntegerType()),
        StructField("rms", FloatType()),
        StructField("clip_frac", FloatType()),
        StructField("snr_db", FloatType()),
    ]
)


def decode_payload(payload: bytes | None, codec: str | None) -> np.ndarray:
    """Decode one payload to int16 samples. Used by the oracle and tests;
    the UDF uses the batched path below with identical semantics."""
    if payload is None:
        return np.empty(0, dtype=np.int16)
    codec = (codec or "").lower().strip()
    if codec in FAKE_MAGIC:
        magic = FAKE_MAGIC[codec]
        if payload[: len(magic)] == magic:
            payload = payload[len(magic):]
        else:
            # Real compressed audio: requires an external decoder.
            raise NotImplementedError(
                f"real {codec} decode needs soundfile/ffmpeg (not in sandbox)"
            )
    usable = len(payload) - (len(payload) % 2)
    return np.frombuffer(payload[:usable], dtype="<i2")


def _decode_batch(payloads, codecs) -> tuple[np.ndarray, np.ndarray]:
    """Strip fake-container headers and concatenate all payloads into one
    int16 array. Returns (samples, per-row sample counts)."""
    chunks: list[bytes] = []
    lengths = np.zeros(len(payloads), dtype=np.int64)
    for i, (p, c) in enumerate(zip(payloads, codecs)):
        if p is None:
            chunks.append(b"")
            continue
        c = (c or "").lower().strip()
        magic = FAKE_MAGIC.get(c)
        if magic is not None:
            if bytes(p[: len(magic)]) == magic:
                p = p[len(magic):]
            else:
                # Real compressed audio (no sandbox decoder — see
                # decode_payload's NotImplementedError hook). Treating the
                # frames as raw PCM would yield garbage stats; mark the row
                # undecodable instead: n_samples=0 routes it to quarantine
                # via the truncated_audio rule (validate.py) rather than
                # killing the whole Arrow batch with an exception.
                chunks.append(b"")
                continue
        usable = len(p) - (len(p) % 2)
        chunks.append(bytes(p[:usable]))
        lengths[i] = usable // 2
    samples = np.frombuffer(b"".join(chunks), dtype="<i2")
    return samples, lengths


def stats_batch(payloads, codecs) -> pd.DataFrame:
    """Batched audio stats. Shared by the Spark UDF and the oracle.

    Memory discipline: Arrow batches of wide audio rows decode to tens of
    millions of samples; everything here stays float32 with in-place
    squaring (a float64 pipeline at 32 concurrent workers would churn tens
    of GB of temporaries and collapse scaling)."""
    samples, lengths = _decode_batch(payloads, codecs)
    n_rows = len(lengths)
    x = samples.astype(np.float32)

    starts = np.zeros(n_rows, dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])

    rms = np.zeros(n_rows, dtype=np.float64)
    clip_frac = np.zeros(n_rows, dtype=np.float64)
    nonzero = lengths > 0

    # Spectral SNR windows must be gathered BEFORE squaring x in place.
    # Welch-style: _N_WINDOWS windows of _FFT_N samples, evenly spaced
    # across each clip (deterministic offsets from n_samples), PSDs
    # averaged per row — a far more stable tone/noise estimate than a
    # single leading window, at ~_N_WINDOWS x the FFT cost.
    fft_rows = np.flatnonzero(lengths >= 64)
    mat = None
    if fft_rows.size:
        L = lengths[fft_rows]
        take = np.minimum(L, _FFT_N)
        span = np.maximum(L - take, 0)
        # window start offsets within each row: k/(W-1) of the span
        frac = (
            np.arange(_N_WINDOWS, dtype=np.float64) / max(_N_WINDOWS - 1, 1)
        )
        w_start = (span[:, None] * frac[None, :]).astype(np.int64)
        offs = np.arange(_FFT_N, dtype=np.int64)
        idx = (
            starts[fft_rows][:, None, None]
            + w_start[:, :, None]
            + offs[None, None, :]
        )
        mask = offs[None, None, :] < take[:, None, None]
        mat = np.where(mask, x[np.where(mask, idx, 0)], np.float32(0.0))
        # stays float32: pocketfft runs single-precision natively and the
        # SNR is a ratio of band powers (precision ample); float64 here
        # doubles allocation churn across all concurrent workers

    if samples.size:
        # clip mask on int16 directly (no abs: avoids -32768 overflow)
        clip_mask = (
            (samples >= _CLIP_THRESHOLD) | (samples <= -_CLIP_THRESHOLD)
        ).astype(np.float32)
        np.square(x, out=x)  # in place; x is now sample^2
        # reduceat needs strictly valid start offsets; collapse empty rows
        nz_starts = starts[nonzero]
        order_starts = np.unique(np.concatenate(([0], nz_starts)))
        sq_sums = np.add.reduceat(x, order_starts).astype(np.float64)
        clip_sums = np.add.reduceat(clip_mask, order_starts).astype(
            np.float64
        )
        # map segment sums back to rows (segments between consecutive starts)
        seg_of_row = np.searchsorted(order_starts, starts[nonzero], "right") - 1
        rms[nonzero] = np.sqrt(
            sq_sums[seg_of_row] / np.maximum(lengths[nonzero], 1)
        )
        clip_frac[nonzero] = clip_sums[seg_of_row] / np.maximum(
            lengths[nonzero], 1
        )

    # Spectral SNR over the first _FFT_N samples, one batched rFFT.
    snr_db = np.zeros(n_rows, dtype=np.float64)
    if mat is not None:
        # Hann window bounds spectral leakage so a non-bin-centered tone
        # concentrates in a few bins around the peak
        mat = mat * np.hanning(_FFT_N)[None, None, :].astype(np.float32)
        spec = (
            (np.abs(np.fft.rfft(mat, axis=2)) ** 2)
            .mean(axis=1)
            .astype(np.float64)
        )
        spec[:, 0] = 0.0  # ignore DC
        peak_bin = spec.argmax(axis=1)
        # signal = power within +-_PEAK_BAND bins of the peak
        band = np.arange(-_PEAK_BAND, _PEAK_BAND + 1)
        cols = np.clip(peak_bin[:, None] + band[None, :], 0, spec.shape[1] - 1)
        sig = np.take_along_axis(spec, cols, axis=1).sum(axis=1)
        total = spec.sum(axis=1)
        noise = np.maximum(total - sig, 1e-12)
        snr_db[fft_rows] = 10.0 * np.log10(np.maximum(sig, 1e-12) / noise)

    return pd.DataFrame(
        {
            "n_samples": lengths.astype(np.int32),
            "rms": rms.astype(np.float32),
            "clip_frac": clip_frac.astype(np.float32),
            "snr_db": snr_db.astype(np.float32),
        }
    )


@pandas_udf(AUDIO_STATS_SCHEMA)
def audio_stats_udf(payload: pd.Series, codec: pd.Series) -> pd.DataFrame:
    return stats_batch(payload.tolist(), codec.tolist())


def with_audio_stats(df, bytes_col: str = "bytes", codec: str = "codec"):
    """Attach n_samples/rms/clip_frac/snr_db. One Arrow round-trip; the
    ``bytes`` column is only read here (column pruning keeps it out of every
    other stage's scan)."""
    return (
        df.withColumn("_ast", audio_stats_udf(F.col(bytes_col), F.col(codec)))
        .withColumns(
            {
                "n_samples": F.col("_ast.n_samples"),
                "rms": F.col("_ast.rms"),
                "clip_frac": F.col("_ast.clip_frac"),
                "snr_db": F.col("_ast.snr_db"),
            }
        )
        .drop("_ast")
    )
