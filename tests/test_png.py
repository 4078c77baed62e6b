"""The stdlib PNG codec (functions/png.py): spec-vector filter tests
(forward filters implemented here from RFC 2083 and inverted by the
decoder), structural refusals, and the multimodal integration that
makes real PNG payloads decode with zero dependencies."""

import struct
import zlib

import numpy as np
import pytest

from data_quality_check_pipeline_spark.functions.png import (
    decode_png,
    encode_png,
    is_png,
    luma,
)

SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _build_png(w, h, ctype, scanlines: bytes, extra=b"", depth=8,
               interlace=0) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    return (
        SIG
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(scanlines))
        + _chunk(b"IEND", b"")
    )


def _forward_filter(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Apply the RFC 2083 forward filters row by row — the independent
    reference the decoder must invert."""
    h, w, c = img.shape
    flat = img.reshape(h, w * c).astype(np.int32)
    bpp = c
    out = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        row = flat[y]
        ft = ftypes[y % len(ftypes)]
        out.append(ft)
        for i in range(w * c):
            a = int(row[i - bpp]) if i >= bpp else 0
            b = int(prev[i])
            cc = int(prev[i - bpp]) if i >= bpp else 0
            if ft == 0:
                val = row[i]
            elif ft == 1:
                val = row[i] - a
            elif ft == 2:
                val = row[i] - b
            elif ft == 3:
                val = row[i] - (a + b) // 2
            else:  # Paeth
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else cc
                )
                val = row[i] - pred
            out.append(val % 256)
        prev = row
    return bytes(out)


class TestDecode:
    @pytest.mark.parametrize("channels,ctype", [(1, 0), (2, 4), (3, 2),
                                                (4, 6)])
    def test_all_filters_all_colortypes(self, channels, ctype):
        """One row per filter type (0..4, cycling) on deterministic
        pixel data: the decoder must invert the hand-built forward
        filters exactly, for every supported color layout."""
        rng = np.random.RandomState(channels)
        img = rng.randint(0, 256, size=(7, 5, channels), dtype=np.uint8)
        data = _build_png(
            5, 7, ctype, _forward_filter(img, [0, 1, 2, 3, 4])
        )
        got = decode_png(data)
        np.testing.assert_array_equal(got, img)

    def test_palette_expansion(self):
        pal = np.array(
            [[250, 0, 0], [0, 250, 0], [0, 0, 250], [7, 8, 9]],
            dtype=np.uint8,
        )
        idx = np.array([[0, 1, 2], [3, 0, 1]], dtype=np.uint8)
        data = _build_png(
            3, 2, 3,
            _forward_filter(idx[:, :, None], [0]),
            extra=_chunk(b"PLTE", pal.tobytes()),
        )
        got = decode_png(data)
        np.testing.assert_array_equal(got, pal[idx])

    def test_roundtrip_encoder(self):
        for c in (1, 2, 3, 4):
            img = np.random.RandomState(c).randint(
                0, 256, size=(11, 13, c), dtype=np.uint8
            )
            got = decode_png(encode_png(img))
            np.testing.assert_array_equal(got, img)

    def test_luma_matches_pillow_arithmetic(self):
        # PIL convert('L'): (299 R + 587 G + 114 B) // 1000
        img = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255],
                         [10, 20, 30]]], dtype=np.uint8)
        got = luma(img)
        np.testing.assert_array_equal(
            got, np.array([[76, 149, 29, 18]], dtype=np.uint8)
        )
        # grey and grey+alpha pass through the grey plane
        g = np.array([[[7], [9]]], dtype=np.uint8)
        np.testing.assert_array_equal(luma(g), [[7, 9]])

    def test_refusals(self):
        img = np.zeros((2, 2, 1), dtype=np.uint8)
        ok = encode_png(img)
        assert is_png(ok)
        with pytest.raises(ValueError, match="signature"):
            decode_png(b"notapng" + ok)
        with pytest.raises(ValueError, match="bit depth"):
            decode_png(_build_png(2, 2, 0, b"\x00\x00\x00\x00\x00\x00",
                                  depth=16))
        with pytest.raises(ValueError, match="interlacing"):
            decode_png(_build_png(2, 2, 0, b"\x00\x00\x00\x00\x00\x00",
                                  interlace=1))
        with pytest.raises(ValueError, match="CRC"):
            # corrupt one IDAT byte, CRC catches it
            bad = bytearray(ok)
            bad[-20] ^= 0xFF
            decode_png(bytes(bad))
        with pytest.raises(ValueError, match="size"):
            # scanlines for a 1-row image declared as 2 rows
            decode_png(_build_png(2, 2, 0, b"\x00\x00\x00"))
        with pytest.raises(ValueError, match="palette index"):
            decode_png(
                _build_png(
                    1, 1, 3, b"\x00\x05",
                    extra=_chunk(b"PLTE", b"\x01\x02\x03"),
                )
            )
        with pytest.raises(ValueError, match="truncated|IEND"):
            decode_png(ok[:-6])
        with pytest.raises(ValueError, match="truncated"):
            decode_png(ok[:-14])  # cut into the IEND chunk body/CRC

    def test_bomb_guards(self):
        # declared dims over the pixel cap refuse BEFORE any allocation
        with pytest.raises(ValueError, match="pixel cap"):
            decode_png(_build_png(100_000, 100_000, 0, b"\x00"))
        # deflate stream inflating past the declared size is caught by
        # the bounded decompressobj, not by a giant allocation: 2x2
        # grey declares 6 scanline bytes, stream carries 10x that
        bomb = zlib.compress(b"\x00" * 60)
        data = (
            SIG
            + _chunk(b"IHDR",
                     struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
            + _chunk(b"IDAT", bomb)
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="size"):
            decode_png(data)
        # garbage deflate bytes surface as the contract ValueError,
        # never a bare zlib.error
        data = (
            SIG
            + _chunk(b"IHDR",
                     struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
            + _chunk(b"IDAT", b"\x13\x37notdeflate")
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="deflate"):
            decode_png(data)


class TestMultimodalPng:
    def test_with_image_meta_decodes_real_png(self, spark):
        from data_quality_check_pipeline_spark.operators.multimodal import (
            with_image_meta,
        )

        rgb = np.zeros((4, 6, 3), dtype=np.uint8)
        rgb[..., 0] = 255  # pure red -> luma 76 everywhere
        grey = np.full((3, 2, 1), 200, dtype=np.uint8)
        df = spark.createDataFrame(
            [("rgb", encode_png(rgb)), ("grey", encode_png(grey))],
            "id string, bytes binary",
        )
        got = {r["id"]: r for r in with_image_meta(df).collect()}
        assert (got["rgb"]["img_width"], got["rgb"]["img_height"],
                got["rgb"]["img_channels"]) == (6, 4, 3)
        assert got["rgb"]["img_mean_luma"] == pytest.approx(76.0)
        assert (got["grey"]["img_width"], got["grey"]["img_channels"]) \
            == (2, 1)
        assert got["grey"]["img_mean_luma"] == pytest.approx(200.0)

    def test_resize_real_png_roundtrips(self, spark):
        from data_quality_check_pipeline_spark.operators.multimodal import (
            resize_image,
        )

        img = np.random.RandomState(0).randint(
            0, 256, size=(8, 8, 3), dtype=np.uint8
        )
        df = spark.createDataFrame(
            [("a", encode_png(img))], "id string, bytes binary"
        )
        (row,) = resize_image(df, target_w=4, target_h=2).collect()
        out = decode_png(row["bytes_resized"])
        ys = np.arange(2) * 8 // 2
        xs = np.arange(4) * 8 // 4
        np.testing.assert_array_equal(out, img[ys[:, None], xs[None, :]])
