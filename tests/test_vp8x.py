"""Extended WebP (VP8X) codec tests: static lossy-with-alpha images —
the ALPH prediction filters (apply/invert exactness), both compression
methods (raw and headerless VP8L alpha-as-green), canvas/frame dim
cross-checks, the animation gates, and container dispatch."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from mincemeatpy_spark.multimodal.binary_ops import (
    _webp_alpha_filter,
    decode_image_real,
    decode_webp_extended,
    encode_webp_extended,
)


def _planes(doc, w, h):
    x = np.arange(w)[None, :]
    yy = np.arange(h)[:, None]
    Y = ((doc * 31 + x * 7 + yy * 13) % 200 + 28).astype(np.uint8)
    cw, ch = (w + 1) // 2, (h + 1) // 2
    cx = np.arange(cw)[None, :]
    cy = np.arange(ch)[:, None]
    U = (((doc + cx * 5 + cy * 3) % 64) + 96).astype(np.uint8)
    V = (((doc * 2 + cx * 3 + cy * 5) % 64) + 96).astype(np.uint8)
    A = ((doc * 13 + x * 3 + yy * 7) % 256).astype(np.uint8)
    return Y, U, V, A


def test_alpha_filters_invert_exactly():
    rng = np.random.RandomState(2)
    for w, h in ((1, 1), (7, 1), (1, 5), (9, 6)):
        plane = rng.randint(0, 256, w * h).tolist()
        for f in range(4):
            fwd = _webp_alpha_filter(plane, w, h, f, False)
            assert _webp_alpha_filter(fwd, w, h, f, True) == plane, (w, h, f)
    # gradient clamp: a hand case where left+above-corner overflows
    plane = [255, 255, 255, 0]
    fwd = _webp_alpha_filter(plane, 2, 2, 3, False)
    # pixel (1,1): pred = clamp(255+255-255)=255 -> (0-255)%256 = 1
    assert fwd[3] == 1
    assert _webp_alpha_filter(fwd, 2, 2, 3, True) == plane


@pytest.mark.parametrize("f", [0, 1, 2, 3])
@pytest.mark.parametrize("comp", [0, 1])
def test_vp8x_roundtrip_alpha_exact(f, comp):
    Y, U, V, A = _planes(7, 24, 20)
    p = encode_webp_extended(
        Y, U, V, A, qi=4, alpha_filter=f, alpha_compression=comp,
        mode_seed=7,
    )
    m = decode_webp_extended(p, return_planes=True)
    assert (m["fmt"], m["width"], m["height"]) == ("webp-vp8x", 24, 20)
    assert m["sum_a"] == int(A.astype("int64").sum())
    assert (np.asarray(m["a_plane"]) == A).all()
    # lossy color within the usual bound
    assert abs(m["sum_y"] - int(Y.astype("int64").sum())) <= 4 * 24 * 20


def test_vp8x_dims_cross_checked():
    Y, U, V, A = _planes(3, 16, 16)
    raw = bytearray(encode_webp_extended(Y, U, V, A))
    at = raw.index(b"VP8X") + 8 + 4  # canvas width-1 field
    raw[at : at + 3] = struct.pack("<I", 17 - 1)[:3]
    with pytest.raises(ValueError, match="disagree"):
        decode_webp_extended(bytes(raw))


def test_vp8x_animation_gates():
    Y, U, V, A = _planes(3, 16, 16)
    raw = bytearray(encode_webp_extended(Y, U, V, A))
    at = raw.index(b"VP8X") + 8
    raw[at] |= 0x02  # ANIM flag
    with pytest.raises(NotImplementedError, match="ANIM"):
        decode_webp_extended(bytes(raw))
    # an ANMF chunk also gates
    good = encode_webp_extended(Y, U, V, A)
    anmf = b"ANMF" + struct.pack("<I", 4) + b"\x00" * 4
    spliced = good[:12] + anmf + good[12:]
    spliced = (
        spliced[:4]
        + struct.pack("<I", len(spliced) - 8)
        + spliced[8:]
    )
    with pytest.raises(NotImplementedError, match="ANMF"):
        decode_webp_extended(spliced)


def test_vp8x_malformed():
    Y, U, V, A = _planes(3, 16, 16)
    good = bytearray(encode_webp_extended(Y, U, V, A, alpha_compression=0))
    # raw alpha size mismatch
    at = good.index(b"ALPH")
    bad = bytearray(good)
    (alen,) = struct.unpack_from("<I", bad, at + 4)
    struct.pack_into("<I", bad, at + 4, alen - 2)
    # shrink: drop two alpha bytes so chunk walk stays aligned
    del bad[at + 8 + alen - 2 : at + 8 + alen]
    with pytest.raises(ValueError, match="size mismatch"):
        decode_webp_extended(bytes(bad))
    # missing VP8 frame
    vp8_at = good.index(b"VP8 ")
    with pytest.raises(ValueError, match="no VP8 frame"):
        decode_webp_extended(
            bytes(good[:4])
            + struct.pack("<I", vp8_at - 8)
            + bytes(good[8:vp8_at])
        )


def test_vp8x_no_alpha_is_opaque():
    # a VP8X container without an ALPH chunk decodes fully opaque
    Y, U, V, A = _planes(5, 16, 16)
    good = bytearray(encode_webp_extended(Y, U, V, A, alpha_compression=0))
    at = good.index(b"ALPH")
    (alen,) = struct.unpack_from("<I", good, at + 4)
    skip = 8 + alen + (alen & 1)
    stripped = bytes(good[:at]) + bytes(good[at + skip :])
    stripped = (
        stripped[:4]
        + struct.pack("<I", len(stripped) - 8)
        + stripped[8:]
    )
    m = decode_webp_extended(stripped)
    assert m["sum_a"] == 255 * 16 * 16


def test_vp8x_dispatches_through_decode_image_real():
    Y, U, V, A = _planes(9, 20, 12)
    m = decode_image_real(encode_webp_extended(Y, U, V, A, qi=2))
    assert m["fmt"] == "webp-vp8x"
    assert m["sum_a"] == int(A.astype("int64").sum())
