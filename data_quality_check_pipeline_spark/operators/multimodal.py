"""Generic multimodal binary-column plumbing (image / video).

Audio is the REAL modality in this engine (udfs/audio.py decodes PCM and
computes features). This module provides the same Spark-side plumbing —
schema, batching, mapInPandas signatures — for image/video payloads.
Image decode is REAL for PNG with zero dependencies (the in-repo
stdlib-zlib codec, functions/png.py: 8-bit grey/RGB/palette/alpha, all
five scanline filters, spec-vector-tested); other formats (JPEG, WebP,
...) are FEATURE-GATED on Pillow: when PIL is importable (production
clusters) they decode through it, otherwise decoding raises a
clearly-marked NotImplementedError. The deterministic fake header from
``fake_image_payload`` remains the cheap-plumbing test container. Video
decode remains an ffmpeg hook.
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


def _pil_image():
    """The PIL.Image module when Pillow is installed, else None. Feature
    gate, not a hard import: production clusters with Pillow get real
    decode; this sandbox (no Pillow — verified) keeps the tested
    fake-payload path and an honest NotImplementedError for real
    payloads."""
    import importlib.util

    if importlib.util.find_spec("PIL") is None:
        return None
    from PIL import Image  # noqa: PLC0415

    return Image


def _decode_image(payload: bytes) -> tuple[int, int, int, float]:
    if payload[: len(_FAKE_IMG_MAGIC)] == _FAKE_IMG_MAGIC:
        w, h = np.frombuffer(payload[8:16], dtype="<i4")
        plane = np.frombuffer(payload[16 : 16 + w * h], dtype=np.uint8)
        return int(w), int(h), 1, float(plane.mean()) if plane.size else 0.0
    Image = _pil_image()
    if Image is not None:
        # Pillow WINS when installed: its C filter reconstruction is
        # orders of magnitude faster than the pure-python codec on
        # Paeth/Average rows, and it covers the corners the native
        # codec refuses (16-bit depth, Adam7 interlace, JPEG/WebP/...)
        import io

        img = Image.open(io.BytesIO(bytes(payload)))
        luma = np.asarray(img.convert("L"), dtype=np.float64)
        return (
            int(img.width),
            int(img.height),
            len(img.getbands()),
            float(luma.mean()) if luma.size else 0.0,
        )
    from ..functions import png as _png

    if _png.is_png(bytes(payload)):
        # Pillow-less fallback: REAL decode via the in-repo stdlib-zlib
        # PNG codec (functions/png.py) — luma arithmetic pinned to
        # Pillow's convert('L') so the two paths agree bit-for-bit
        img = _png.decode_png(bytes(payload))
        lum = _png.luma(img).astype(np.float64)
        return (
            int(img.shape[1]),
            int(img.shape[0]),
            int(img.shape[2]),
            float(lum.mean()) if lum.size else 0.0,
        )
    raise NotImplementedError(
        "real non-PNG image decode requires Pillow "
        "(not installed in this sandbox; PNG decodes natively)"
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


def resize_image(
    df: DataFrame,
    target_w: int,
    target_h: int,
    bytes_col: str = "bytes",
    out_col: str = "bytes_resized",
) -> DataFrame:
    """Nearest-neighbor resize over the opaque image column (mapInPandas).

    The resize math (index-gather on the luma plane) is REAL and runs on
    the fake container; a production build swaps `_decode_image`'s raise
    for Pillow and re-encodes — the Spark plumbing (iterator batches,
    binary in/binary out, schema append) is exactly this.
    """
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema
    ) + f", {out_col} binary"

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf[bytes_col]:
                if p is None:
                    out.append(None)
                    continue
                p = bytes(p)
                if p[: len(_FAKE_IMG_MAGIC)] == _FAKE_IMG_MAGIC:
                    w, h, _c, _ = _decode_image(p)
                    plane = np.frombuffer(
                        p[16 : 16 + w * h], dtype=np.uint8
                    ).reshape(h, w)
                    ys = np.arange(target_h) * h // target_h
                    xs = np.arange(target_w) * w // target_w
                    resized = plane[ys[:, None], xs[None, :]]
                    head = _FAKE_IMG_MAGIC + np.array(
                        [target_w, target_h], dtype="<i4"
                    ).tobytes()
                    out.append(head + resized.tobytes())
                    continue
                Image = _pil_image()
                if Image is not None:
                    # Pillow wins when installed (same ordering + reason
                    # as _decode_image)
                    import io

                    img = Image.open(io.BytesIO(p)).resize(
                        (target_w, target_h), Image.NEAREST
                    )
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    out.append(buf.getvalue())
                    continue
                from ..functions import png as _png

                if _png.is_png(p):
                    # Pillow-less fallback: decode -> nearest-neighbor
                    # gather on every channel -> re-encode (same codec)
                    img = _png.decode_png(p)
                    h, w = img.shape[:2]
                    ys = np.arange(target_h) * h // target_h
                    xs = np.arange(target_w) * w // target_w
                    out.append(
                        _png.encode_png(img[ys[:, None], xs[None, :]])
                    )
                    continue
                raise NotImplementedError(
                    "real non-PNG image resize requires Pillow "
                    "(not installed in this sandbox; PNG resizes "
                    "natively)"
                )
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf

    return df.mapInPandas(resize, schema)


# -- video: fake container + frame sampling ---------------------------------

_FAKE_VID_MAGIC = b"FAKEvid_"


def fake_video_payload(
    width: int, height: int, n_frames: int, seed: int = 0
) -> bytes:
    """magic + dims + frame count + n_frames u8 luma planes."""
    rng = np.random.RandomState(seed)
    head = _FAKE_VID_MAGIC + np.array(
        [width, height, n_frames], dtype="<i4"
    ).tobytes()
    frames = rng.randint(
        0, 256, size=n_frames * width * height, dtype=np.uint8
    )
    return head + frames.tobytes()


def sample_video_frames(
    df: DataFrame,
    every_n: int = 10,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Frame sampling over an opaque video column: mapInPandas EXPLODES
    every ``every_n``-th frame into its own row carrying a fake-image
    payload (so downstream image operators compose). Output rows:
    (id, frame_idx, frame_bytes).

    Real ffmpeg decode would replace the container parse; the row-exploding
    Arrow plumbing — one input row yielding many output rows with bounded
    batch memory — is the production shape.
    """
    schema = f"{id_col} string, frame_idx int, frame_bytes binary"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, p in zip(pdf[id_col], pdf[bytes_col]):
                if p is None:
                    continue
                p = bytes(p)
                if p[: len(_FAKE_VID_MAGIC)] != _FAKE_VID_MAGIC:
                    # real video decode would go through ffmpeg here
                    raise NotImplementedError(
                        "real video decode requires ffmpeg "
                        "(not installed in this sandbox)"
                    )
                w, h, n = np.frombuffer(p[8:20], dtype="<i4")
                plane_sz = int(w) * int(h)
                head = _FAKE_IMG_MAGIC + np.array(
                    [w, h], dtype="<i4"
                ).tobytes()
                for f_idx in range(0, int(n), every_n):
                    start = 20 + f_idx * plane_sz
                    rows.append(
                        (rid, f_idx, head + p[start : start + plane_sz])
                    )
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_idx", "frame_bytes"]
            )

    return df.mapInPandas(sample, schema)
