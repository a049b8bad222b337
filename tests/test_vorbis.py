"""Vorbis-subset transform codec (multimodal/vorbis.py, r9 judge
task 3).  Layered: known-answer tests pin each bitstream layer
independently of the encoder (so inverse-bug cancellation cannot
hide), then property tests pin the full pipeline — the lossy bound and
the tight coefficient-exactness claim (decode == independent
reconstruction of floor*residue).
"""

from __future__ import annotations

import numpy as np
import pytest

from mincemeatpy_spark.multimodal.vorbis import (
    _ogg_crc,
    _ogg_pages,
    _ogg_unpages,
    _vorbis_codewords,
    _vorbis_float32_pack,
    _vorbis_float32_unpack,
    _vorbis_ilog,
    _vorbis_mdct_mat,
    _vorbis_render_line,
    _vorbis_render_point,
    _vorbis_test_signal,
    _vorbis_window,
    decode_vorbis_real,
    encode_vorbis_subset,
)


def test_codeword_assignment_matches_spec_example():
    """The Vorbis I specification's worked example (section 3.2.1):
    lengths [2,4,4,4,4,2,3,3] produce exactly these codewords — an
    assignment that deflate-canonical coding would NOT produce, so
    this KAT distinguishes the two algorithms."""
    got = _vorbis_codewords([2, 4, 4, 4, 4, 2, 3, 3])
    assert got == [
        (2, 0b00),
        (4, 0b0100),
        (4, 0b0101),
        (4, 0b0110),
        (4, 0b0111),
        (2, 0b10),
        (3, 0b110),
        (3, 0b111),
    ]


def test_codeword_oversubscription_rejected():
    with pytest.raises(ValueError):
        _vorbis_codewords([1, 1, 1])
    # unused entries are skipped
    assert _vorbis_codewords([1, 0, 1]) == [(1, 0), (0, None), (1, 1)]


def test_ogg_page_roundtrip_and_crc():
    pkts = [(b"first", 0), (b"x" * 700, 123), (b"", 456), (b"end", 789)]
    stream = _ogg_pages(pkts)
    got, granule = _ogg_unpages(stream)
    assert got == [p for p, _g in pkts]
    assert granule == 789
    # a 700-byte packet must span three lacing values (255+255+190)
    assert stream.count(b"OggS") == 4
    # CRC catches a single flipped bit in a page body
    bad = bytearray(stream)
    bad[40] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        _ogg_unpages(bytes(bad))
    with pytest.raises(ValueError):
        _ogg_unpages(b"NotO" + stream[4:])


def test_ogg_crc_known_answer():
    """The Ogg CRC is the UNREFLECTED 0x04C11DB7 variant: pin a value
    computed from the definition by an independent bit-order
    implementation (MSB-first shift register, no reflection)."""

    def ref(data: bytes) -> int:
        reg = 0
        for byte in data:
            for i in range(7, -1, -1):
                bit = (byte >> i) & 1
                top = (reg >> 31) & 1
                reg = ((reg << 1) & 0xFFFFFFFF) | bit
                if top:
                    reg ^= 0x04C11DB7
        for _ in range(32):
            top = (reg >> 31) & 1
            reg = (reg << 1) & 0xFFFFFFFF
            if top:
                reg ^= 0x04C11DB7
        return reg

    for data in (b"", b"\x01", b"OggS vorbis test", bytes(range(97))):
        assert _ogg_crc(data) == ref(data), data


def test_packed_float_roundtrip():
    for x in (0.0, 1.0, -1.0, -8.0, 16.0, 3.0, -127.0, 1024.0):
        assert _vorbis_float32_unpack(_vorbis_float32_pack(x)) == x


def test_render_line_and_point_truncate_like_c():
    out = [0] * 10
    _vorbis_render_line(0, 0, 10, -7, 10, out)
    # C trunc division: base = -7/10 -> 0, sy = -1
    assert out[0] == 0 and out[9] == -7 + 1  # Bresenham approach
    assert _vorbis_render_point(0, 10, 8, 2, 4) == 6
    assert _vorbis_render_point(0, 0, 3, -7, 2) == -4  # floor(-14/3)->-4 trunc


def test_mdct_window_perfect_reconstruction():
    """The Princen-Bradley TDAC identity with the 4/n scaling: lapped
    windowed MDCT frames overlap-add to the original within 1e-12 —
    the property that makes the codec's only loss the quantizer."""
    n, half = 64, 32
    w = _vorbis_window(n)
    C = _vorbis_mdct_mat(n)
    rng = np.random.default_rng(0)
    L = 10 * half
    sig = rng.normal(0, 1, L)
    pad = np.zeros(half + (L // half + 1) * half + n)
    pad[half : half + L] = sig
    outs, prev = [], None
    for f in range(L // half + 1):
        x = pad[f * half : f * half + n]
        y = (C @ ((4.0 / n) * (C.T @ (w * x)))) * w
        if prev is not None:
            outs.append(prev + y[:half])
        prev = y[half:]
    rec = np.concatenate(outs)[: L - half]
    assert np.abs(rec - sig[: L - half]).max() < 1e-12


def test_roundtrip_exact_fields_and_bound():
    rng = np.random.default_rng(5)
    cases = [
        ("tones", np.clip(
            6000 * np.sin(2 * np.pi * np.arange(1000) / 37)
            + 2500 * np.sin(2 * np.pi * np.arange(1000) / 11),
            -32768, 32767).astype(np.int64)),
        ("noise", rng.integers(-12000, 12000, 777)),
        ("loud", np.clip(30000 * np.sin(2 * np.pi * np.arange(640) / 50),
                         -32768, 32767).astype(np.int64)),
        ("short", rng.integers(-5000, 5000, 90)),
    ]
    for desc, sig in cases:
        b = encode_vorbis_subset(16000, [list(sig)])
        m = decode_vorbis_real(b, _samples=True)
        assert (m["fmt"], m["sample_rate"], m["n_channels"]) == (
            "vorbis", 16000, 1), desc
        assert m["n_samples"] == len(sig), desc
        err = np.abs(m["samples"][0] - sig).max()
        amp = max(1, np.abs(sig).max())
        assert err <= 0.5 * amp + 64, (desc, err, amp)


def test_silence_decodes_exactly():
    b = encode_vorbis_subset(8000, [[0] * 300])
    m = decode_vorbis_real(b, _samples=True)
    assert m["n_samples"] == 300
    assert m["sample_sum"] == 0 and m["energy"] == 0
    assert np.all(m["samples"][0] == 0)


def test_stereo_channels_independent():
    rng = np.random.default_rng(9)
    a = list(rng.integers(-9000, 9000, 500))
    z = [0] * 500
    m = decode_vorbis_real(
        encode_vorbis_subset(22050, [a, z]), _samples=True
    )
    assert m["n_channels"] == 2 and m["n_samples"] == 500
    # the silent channel must stay silent (no cross-channel bleed
    # through the type-2 interleave)
    assert np.abs(m["samples"][1]).max() <= 1
    assert np.abs(m["samples"][0] - np.array(a)).max() <= 0.5 * 9000 + 64


def test_decode_equals_independent_reconstruction():
    """The tight certification (progressive-JPEG pattern): the
    decoder's PCM equals the reconstruction computed OUTSIDE the
    decoder from the encoder's recorded floor curves and quantized
    residue — spectrum is floor*residue exactly, then IMDCT + window
    + overlap-add in plain numpy.  Any bitstream misdecode (codeword
    walk, classword unpack, floor room-folding, interleave) breaks
    int16 equality on nearly every sample."""
    for d, nc in ((7, 333), (12, 1000), (1411, 77)):
        chans, rate = _vorbis_test_signal(d, nc)
        stream, dbg = encode_vorbis_subset(rate, chans, _debug=True)
        m = decode_vorbis_real(stream, _samples=True)
        n = 256
        half, ch = n // 2, len(chans)
        w = _vorbis_window(n)
        C = _vorbis_mdct_mat(n)
        pcm = [[] for _ in range(ch)]
        prev = None
        for curves, qs in dbg:
            spec = np.stack([curves[c] * qs[c] for c in range(ch)])
            y = (C @ spec.T).T * w
            if prev is not None:
                for c in range(ch):
                    pcm[c].extend((prev + y[:, :half])[c])
            prev = y[:, half:]
        L = m["n_samples"]
        expected = np.clip(
            np.round(np.array([p[:L] for p in pcm]) * 32768.0),
            -32768, 32767,
        ).astype(np.int64)
        assert np.array_equal(expected, m["samples"]), (d, nc)


def test_out_of_subset_and_malformed_gates():
    b = encode_vorbis_subset(16000, [[100] * 200])
    # different blocksize nibbles in the identification header ->
    # long/short switching gate.  ident packet starts at page body.
    ident_at = b.find(b"\x01vorbis")
    bad = bytearray(b)
    blk_at = ident_at + 7 + 4 + 1 + 4 + 12  # version+ch+rate+bitrates
    bad[blk_at] = (bad[blk_at] & 0x0F) | 0x90  # bs1 = 2^9 != bs0
    # fix the page CRC so the gate (not the CRC) fires
    import struct

    page_at = b.rfind(b"OggS", 0, ident_at)
    nseg = bad[page_at + 26]
    body_len = sum(bad[page_at + 27 : page_at + 27 + nseg])
    page = bytearray(bad[page_at : page_at + 27 + nseg + body_len])
    page[22:26] = b"\x00\x00\x00\x00"
    bad[page_at + 22 : page_at + 26] = struct.pack(
        "<I", _ogg_crc(bytes(page))
    )
    with pytest.raises(NotImplementedError, match="window switching"):
        decode_vorbis_real(bytes(bad))
    with pytest.raises(ValueError):
        decode_vorbis_real(b[:60])  # truncated
    with pytest.raises(ValueError):
        decode_vorbis_real(b"RIFF" + b[4:])  # not Ogg


def test_ilog_spec_values():
    assert [_vorbis_ilog(v) for v in (0, 1, 2, 3, 4, 7, 127)] == [
        0, 1, 2, 2, 3, 3, 7,
    ]


def test_ordered_codebook_lengths_parse():
    """The ordered length-list form (spec 3.2.1): non-decreasing
    lengths carried as per-length run counts in ilog(remaining) bits.
    Our encoder never writes it (histogram lengths are not monotone),
    so this KAT hand-assembles the codebook bits and checks the parsed
    decode tables against the codeword-assignment ground truth."""
    from mincemeatpy_spark.multimodal.vorbis import _vorbis_read_codebook

    acc = [0, 0]
    out = bytearray()

    def put(v, n):
        acc[0] |= (v & ((1 << n) - 1)) << acc[1]
        acc[1] += n
        while acc[1] >= 8:
            out.append(acc[0] & 0xFF)
            acc[0] >>= 8
            acc[1] -= 8

    put(0x564342, 24)  # sync
    put(1, 16)  # dims
    put(8, 24)  # entries
    put(1, 1)  # ORDERED
    put(2 - 1, 5)  # initial length 2
    put(2, 4)  # ilog(8)=4: two entries of length 2
    put(2, 3)  # ilog(6)=3: two of length 3
    put(4, 3)  # ilog(4)=3: four of length 4  -> Kraft exactly 1
    put(0, 4)  # lookup type 0
    if acc[1]:
        out.append(acc[0] & 0xFF)

    class R:
        def __init__(self, d):
            self.d, self.p = d, 0

        def bits(self, n):
            v = 0
            for i in range(n):
                v |= ((self.d[(self.p + i) >> 3] >> ((self.p + i) & 7)) & 1) << i
            self.p += n
            return v

    book = _vorbis_read_codebook(R(bytes(out)))
    assert book["dims"] == 1 and book["vq"] is None
    got = {}
    for idx, hit in enumerate(book["lut"]):
        if hit is not None:
            e, ln = hit
            # recover the wire-MSB-first word from the reversed index
            rev = idx & ((1 << ln) - 1)
            word = 0
            for _ in range(ln):
                word = (word << 1) | (rev & 1)
                rev >>= 1
            got.setdefault(e, (ln, word))
    assert got == dict(enumerate(_vorbis_codewords([2, 2, 3, 3, 4, 4, 4, 4])))
