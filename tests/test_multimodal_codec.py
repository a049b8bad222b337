"""Unit tests for the dependency-free real image decoder
(multimodal/binary_ops.decode_image_real): PPM (P6) and uncompressed
24-bit BMP parse from hand-built byte strings with known pixel content;
compressed formats stay behind the honest NotImplementedError gate.
"""

from __future__ import annotations

import struct

import pytest

from mincemeatpy_spark.multimodal.binary_ops import decode_image_real


def _ppm(w, h, pixels):
    assert len(pixels) == w * h  # list of (r, g, b)
    body = b"".join(bytes(p) for p in pixels)
    return b"P6\n%d %d\n255\n" % (w, h) + body


def _bmp(w, h, pixels_topdown):
    """24-bit BMP with positive height => rows stored bottom-up."""
    stride = (3 * w + 3) // 4 * 4
    rows = []
    for y in reversed(range(h)):  # bottom-up storage order
        row = b"".join(
            bytes((b, g, r)) for (r, g, b) in pixels_topdown[y * w : (y + 1) * w]
        )
        rows.append(row + b"\x00" * (stride - 3 * w))
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + h * stride, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, h * stride, 0, 0, 0, 0)
    )
    return header + b"".join(rows)


def test_ppm_decode_exact_means():
    # 2x2, distinct per-pixel values; integer floor means
    px = [(10, 20, 30), (50, 60, 70), (90, 100, 110), (130, 141, 150)]
    m = decode_image_real(_ppm(2, 2, px))
    assert m == {
        "fmt": "ppm",
        "width": 2,
        "height": 2,
        "mean_r": (10 + 50 + 90 + 130) // 4,
        "mean_g": (20 + 60 + 100 + 141) // 4,
        "mean_b": (30 + 70 + 110 + 150) // 4,
    }


def test_bmp_decode_padded_stride_and_bgr_order():
    # width 3 => 9 bytes/row, padded to 12: the decoder must skip the
    # padding and un-swap BGR, or the means shift.
    px = [(i * 10, i * 11, i * 12) for i in range(6)]  # 3x2
    m = decode_image_real(_bmp(3, 2, px))
    assert m["fmt"] == "bmp" and (m["width"], m["height"]) == (3, 2)
    assert m["mean_r"] == sum(p[0] for p in px) // 6
    assert m["mean_g"] == sum(p[1] for p in px) // 6
    assert m["mean_b"] == sum(p[2] for p in px) // 6


def test_bmp_width_multiple_of_four_no_padding():
    px = [(200, 100, 50)] * 4  # 4x1, stride == 12 exactly
    m = decode_image_real(_bmp(4, 1, px))
    assert (m["mean_r"], m["mean_g"], m["mean_b"]) == (200, 100, 50)


def test_compressed_formats_still_gated():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\xff\xd8\xff\xe0" + b"\x00" * 32)  # JPEG magic
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)


def test_ppm_maxval_gate():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"P6\n1 1\n65535\n\x00\x00\x00\x00\x00\x00")


def test_ppm_dimensions_containing_255_parse_correctly():
    # Regression: a substring search for the maxval token would anchor on
    # a width/height that equals 255 and silently corrupt the pixel read.
    px = [(7, 8, 9)] * (255 * 1)
    m = decode_image_real(_ppm(255, 1, px))
    assert (m["width"], m["height"]) == (255, 1)
    assert (m["mean_r"], m["mean_g"], m["mean_b"]) == (7, 8, 9)
