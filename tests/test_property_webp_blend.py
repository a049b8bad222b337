"""Property-based certification of the r11 fractional-alpha ANMF blend
(multimodal/binary_ops.decode_webp_anim): hypothesis drives random
(src RGBA, background RGBA) pairs through a REAL encode->decode cycle
on a tiny canvas and compares against an exact-rational reference
implementation of the container spec's over-operator with floor
rounding (fractions.Fraction — no integer shortcuts shared with the
implementation).  This sweeps the full alpha x dst-alpha lattice
including the corners the oracle query only samples (sa=0 & da=0,
sa=255, da=0 with 0<sa<255).
"""

from __future__ import annotations

from fractions import Fraction

from hypothesis import HealthCheck, given, settings, strategies as st

from mincemeatpy_spark.multimodal.binary_ops import (
    decode_webp_anim,
    encode_webp_anim,
)

_channel = st.integers(min_value=0, max_value=255)
_rgba = st.tuples(_channel, _channel, _channel, _channel)


def _reference_blend(src: tuple, dst: tuple) -> tuple:
    """Container-spec over-operator in exact rational arithmetic,
    floored to 8 bits — independent of the decoder's integer form."""
    sr, sg, sb, sa = src
    dr, dg, db, da = dst
    if sa == 255:
        return src
    if sa == 0:
        return dst  # decoder keeps the canvas pixel untouched
    a = Fraction(sa, 255) + Fraction(da, 255) * (1 - Fraction(sa, 255))
    if a == 0:
        return (0, 0, 0, 0)
    out = tuple(
        int(
            (Fraction(s, 1) * Fraction(sa, 255)
             + Fraction(d, 1) * Fraction(da, 255) * (1 - Fraction(sa, 255)))
            / a
        )
        for s, d in ((sr, dr), (sg, dg), (sb, db))
    )
    return out + (int(a * 255),)


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(src=_rgba, dst=_rgba)
def test_fractional_blend_matches_rational_reference(src, dst):
    # 2x2 canvas: frame 0 overwrites the dst pixel everywhere, frame 1
    # alpha-blends the src pixel everywhere — a real container round
    # trip through the VP8L sub-image machinery per example.
    payload = encode_webp_anim(
        2, 2, (0, 0, 0, 255),
        [dict(x=0, y=0, blend=False, dispose=False,
              pixels=[[dst, dst], [dst, dst]]),
         dict(x=0, y=0, blend=True, dispose=False,
              pixels=[[src, src], [src, src]])],
    )
    m = decode_webp_anim(payload)
    assert m["n_frames"] == 2
    exp = _reference_blend(src, dst)
    assert m["frames"][0] == tuple(4 * c for c in dst)
    assert m["frames"][1] == tuple(4 * c for c in exp)
    # range invariant: every composited channel is a valid 8-bit value
    assert all(0 <= c <= 4 * 255 for c in m["frames"][1])
