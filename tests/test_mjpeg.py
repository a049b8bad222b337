"""MJPEG-in-AVI codec tests (r9 judge task 2): the compressed-video
path is the composition of the RIFF/AVI LIST walk and the baseline-JFIF
decoder — each '00dc' chunk an independent complete JPEG, per the
format's definition.  Covers the lossy roundtrip bound, the container
cross-checks (frame dims vs AVI header, biCompression fourcc,
declared-vs-found frame count), and that the honest gate still fires
for inter-frame codecs."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from mincemeatpy_spark.multimodal.binary_ops import (
    decode_avi_real,
    encode_avi_mjpeg,
    encode_jpeg_baseline,
)


def _frame(doc_id: int, f: int, w: int, h: int) -> np.ndarray:
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    Yt = ((doc_id * 31 + f * 17 + x * 7 + y * 13) % 200 + 28).astype(
        np.float64
    )
    cb = 128 + (((doc_id + f + (x // 16) * 3) % 5) - 2) * 10
    cr = 128 + (((doc_id * 2 + f + (y // 16) * 3) % 5) - 2) * 10
    r = np.clip(np.round(Yt + 1.402 * (cr - 128)), 0, 255)
    g = np.clip(
        np.round(Yt - 0.344136286 * (cb - 128) - 0.714136286 * (cr - 128)),
        0,
        255,
    )
    b = np.clip(np.round(Yt + 1.772 * (cb - 128)), 0, 255)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


@pytest.mark.parametrize("w,h,nf", [(28, 18, 3), (8, 8, 2), (17, 11, 4)])
def test_mjpeg_roundtrip_within_bound(w, h, nf):
    frames = [_frame(7, f, w, h) for f in range(nf)]
    m = decode_avi_real(encode_avi_mjpeg(w, h, nf, lambda f: frames[f]))
    assert (m["fmt"], m["width"], m["height"], m["n_frames"]) == (
        "avi-mjpeg", w, h, nf,
    )
    bound = 2 * w * h * nf
    for c, k in enumerate(("sum_r", "sum_g", "sum_b")):
        true = sum(int(fr[..., c].astype("int64").sum()) for fr in frames)
        assert abs(m[k] - true) <= bound, (k, m[k], true)


def test_mjpeg_frames_differ_across_time():
    # per-frame decode really happens: two frames with very different
    # brightness must not produce the sums of frame0 * nf
    frames = [
        np.full((8, 16, 3), 50 + f * 120, dtype=np.uint8) for f in range(2)
    ]
    m = decode_avi_real(encode_avi_mjpeg(16, 8, 2, lambda f: frames[f]))
    flat = 2 * int(frames[0][..., 0].astype("int64").sum())
    assert abs(m["sum_r"] - flat) > 100 * 16 * 8


def test_mjpeg_frame_count_mismatch_is_malformed():
    frames = [_frame(1, f, 8, 8) for f in range(3)]
    raw = bytearray(encode_avi_mjpeg(8, 8, 3, lambda f: frames[f]))
    # declare 4 frames in avih (dwTotalFrames is the 5th dword)
    at = raw.index(b"avih") + 8
    raw[at + 16 : at + 20] = struct.pack("<I", 4)
    with pytest.raises(ValueError, match="declared 4"):
        decode_avi_real(bytes(raw))


def test_mjpeg_frame_dims_cross_checked_against_header():
    # container header claims width 9, the JPEG frames inside are 8x8:
    # the per-frame SOF dims must be cross-checked, not trusted
    raw = bytearray(encode_avi_mjpeg(8, 8, 1, lambda f: _frame(1, 0, 8, 8)))
    at = raw.index(b"avih") + 8
    raw[at + 32 : at + 36] = struct.pack("<I", 9)  # dwWidth
    with pytest.raises(ValueError, match="disagree"):
        decode_avi_real(bytes(raw))


def test_mjpeg_biCompression_cross_checked():
    raw = bytearray(encode_avi_mjpeg(8, 8, 1, lambda f: _frame(1, 0, 8, 8)))
    at = raw.index(b"strf") + 8 + 16  # biCompression offset in strf
    assert bytes(raw[at : at + 4]) == b"MJPG"
    raw[at : at + 4] = b"\x00\x00\x00\x00"
    with pytest.raises(ValueError, match="biCompression"):
        decode_avi_real(bytes(raw))


def test_interframe_codecs_still_gated():
    raw = encode_avi_mjpeg(8, 8, 1, lambda f: _frame(1, 0, 8, 8))
    for four in (b"H264", b"VP90", b"DIVX"):
        bad = raw.replace(b"vidsMJPG", b"vids" + four, 1)
        with pytest.raises(NotImplementedError, match="codec library"):
            decode_avi_real(bad)
