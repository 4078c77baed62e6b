"""Generic multimodal binary-column plumbing (image / video stubs).

Audio is the REAL modality in this engine (udfs/audio.py decodes PCM and
computes features). This module provides the same Spark-side plumbing —
schema, batching, mapInPandas signatures — for image/video payloads, with
the decode step STUBBED: the container has no imaging libraries, so decoding
raises a clearly-marked NotImplementedError unless the payload uses the
deterministic fake header produced by ``fake_image_payload`` (which lets the
plumbing be tested end-to-end).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

IMAGE_META_SCHEMA = (
    "width int, height int, channels int, mean_luma float"
)
_FAKE_IMG_MAGIC = b"FAKEimg_"


def fake_image_payload(
    width: int, height: int, seed: int = 0
) -> bytes:
    """Deterministic fake image container: magic + dims + u8 luma plane."""
    rng = np.random.RandomState(seed)
    plane = rng.randint(0, 256, size=width * height, dtype=np.uint8)
    head = _FAKE_IMG_MAGIC + np.array(
        [width, height], dtype="<i4"
    ).tobytes()
    return head + plane.tobytes()


def _decode_image(payload: bytes) -> tuple[int, int, int, float]:
    if payload[: len(_FAKE_IMG_MAGIC)] == _FAKE_IMG_MAGIC:
        w, h = np.frombuffer(payload[8:16], dtype="<i4")
        plane = np.frombuffer(payload[16 : 16 + w * h], dtype=np.uint8)
        return int(w), int(h), 1, float(plane.mean()) if plane.size else 0.0
    # REAL image decode would go through Pillow/libjpeg here.
    raise NotImplementedError(
        "real image decode requires Pillow (not installed in this sandbox)"
    )


def with_image_meta(
    df: DataFrame, bytes_col: str = "bytes", out_prefix: str = "img_"
) -> DataFrame:
    """mapInPandas feature extraction over an opaque image column.

    Demonstrates the multimodal pattern at scale: iterator-of-batches (no
    whole-partition materialization), only the binary column + passthroughs
    in the Arrow schema, decode isolated per batch.
    """
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema
    ) + (
        f", {out_prefix}width int, {out_prefix}height int,"
        f" {out_prefix}channels int, {out_prefix}mean_luma float"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                _decode_image(p)
                if p is not None
                else (0, 0, 0, 0.0)
                for p in pdf[bytes_col]
            ]
            m = pd.DataFrame(
                metas,
                columns=[
                    f"{out_prefix}width",
                    f"{out_prefix}height",
                    f"{out_prefix}channels",
                    f"{out_prefix}mean_luma",
                ],
                index=pdf.index,
            )
            yield pd.concat([pdf, m], axis=1)

    return df.mapInPandas(extract, schema)


def frame_sample_stub(*_args, **_kwargs):
    """Video frame sampling requires ffmpeg bindings — not available here.
    The Spark-side shape would mirror with_image_meta (mapInPandas over the
    binary column, exploding sampled frames into rows)."""
    raise NotImplementedError(
        "video frame sampling requires ffmpeg (not installed in this sandbox)"
    )
