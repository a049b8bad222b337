"""VP8 (lossy WebP) codec certification — the progressive-JPEG/Vorbis
pattern: hand-computed known-answer tests for the boolean arithmetic
decoder, exact-integer transform KATs against independent test-side
reimplementations, predictor edge rules, decode == independent numpy
reconstruction (whole-frame, exact equality), lossy roundtrip bounds
across the quantizer/filter/mode rotation, and the honest gates."""

from __future__ import annotations

import numpy as np
import pytest

from mincemeatpy_spark.multimodal.binary_ops import (
    decode_image_real as _decode_image_real,
)
from mincemeatpy_spark.multimodal.vp8 import (
    _B,
    _DC,
    _H,
    _TM,
    _V,
    _vp8_bd_bool,
    _vp8_bd_init,
    _vp8_bd_literal,
    _vp8_bd_tree,
    _vp8_be_bool,
    _vp8_be_finish,
    _vp8_be_init,
    _vp8_be_literal,
    _vp8_be_tree,
    _vp8_idct4,
    _vp8_iwht4,
    _vp8_predict_block,
    _vp8_quant_factors,
    _vp8_simple_filter,
    _vp8_tables,
    _vp8_tree_paths,
    decode_vp8_real,
    encode_vp8_frame,
    encode_webp_lossy,
)


# --- boolean coder --------------------------------------------------------


def test_bool_decoder_hand_computed():
    # stream 0x80 0x00: value=0x8000, range=255.
    # bool(128): split = 1 + ((254*128)>>8) = 128; bigsplit = 0x8000;
    # value >= bigsplit -> bit 1, range = 127, value = 0; renorm one
    # shift (range 254, value 0).
    st = _vp8_bd_init(bytes([0x80, 0x00]))
    assert _vp8_bd_bool(st, 128) == 1
    assert st[1] == 254 and st[0] == 0
    # bool(128) now: split = 1 + ((253*128)>>8) = 127; value 0 < 0x7f00
    # -> bit 0, range = 127, renorm (254).
    assert _vp8_bd_bool(st, 128) == 0
    assert st[1] == 254

    # all-ones stream decodes 1s at high probability-of-zero too:
    # 0xff 0xff: value=0xffff >= any bigsplit -> 1
    st = _vp8_bd_init(bytes([0xFF, 0xFF]))
    assert _vp8_bd_bool(st, 250) == 1

    # prob 255: split = 1 + ((254*255)>>8) = 254 -> zero is nearly
    # certain on a zero stream, no renorm (range 254 >= 128)
    st = _vp8_bd_init(bytes([0x00, 0x00]))
    assert _vp8_bd_bool(st, 255) == 0
    assert st[1] == 254


def test_bool_roundtrip_fuzz():
    rng = np.random.RandomState(7)
    for trial in range(25):
        n = int(rng.randint(1, 400))
        bits = rng.randint(0, 2, n).tolist()
        probs = rng.randint(1, 255, n).tolist()
        st = _vp8_be_init()
        for b, p in zip(bits, probs):
            _vp8_be_bool(st, int(b), int(p))
        data = _vp8_be_finish(st)
        dec = _vp8_bd_init(data)
        out = [_vp8_bd_bool(dec, int(p)) for p in probs]
        assert out == [int(b) for b in bits], f"trial {trial}"


def test_literal_and_tree_roundtrip():
    tables = _vp8_tables()
    tree = tables["kf_ymode_tree"]
    probs = tables["kf_ymode_prob"]
    paths = _vp8_tree_paths(tree)
    assert sorted(paths) == [_DC, _V, _H, _TM, _B]
    st = _vp8_be_init()
    _vp8_be_literal(st, 0x5A, 8)
    for mode in (_DC, _V, _H, _TM, _B):
        _vp8_be_tree(st, tree, probs, mode, paths)
    _vp8_be_literal(st, 3, 2)
    data = _vp8_be_finish(st)
    dec = _vp8_bd_init(data)
    assert _vp8_bd_literal(dec, 8) == 0x5A
    for mode in (_DC, _V, _H, _TM, _B):
        assert _vp8_bd_tree(dec, tree, probs) == mode
    assert _vp8_bd_literal(dec, 2) == 3


# --- transforms -----------------------------------------------------------


def _ref_idct4(coefs):
    """Independent reimplementation: same spec arithmetic, different
    code shape (numpy int64 column/row passes)."""
    c = np.asarray(coefs, dtype=np.int64).reshape(4, 4)

    def onepass(m, final):
        out = np.zeros((4, 4), dtype=np.int64)
        for j in range(4):
            i0, i1, i2, i3 = m[0, j], m[1, j], m[2, j], m[3, j]
            a1, b1 = i0 + i2, i0 - i2
            c1 = ((i1 * 35468) >> 16) - (i3 + ((i3 * 20091) >> 16))
            d1 = (i1 + ((i1 * 20091) >> 16)) + ((i3 * 35468) >> 16)
            vals = [a1 + d1, b1 + c1, b1 - c1, a1 - d1]
            if final:
                vals = [(x + 4) >> 3 for x in vals]
            out[:, j] = vals
        return out

    return onepass(onepass(c, False).T, True).T.reshape(16).tolist()


def test_idct_matches_independent_reimplementation():
    rng = np.random.RandomState(3)
    for _ in range(200):
        coefs = rng.randint(-2000, 2000, 16).tolist()
        assert _vp8_idct4(coefs) == _ref_idct4(coefs)
    # DC-only literal: coef 8 -> every pixel (8+8+4)>>3 ... two passes:
    # col pass gives [8]*4 in column 0, row pass (8+4)>>3 = 1
    out = _vp8_idct4([8] + [0] * 15)
    assert out == [1] * 16
    # and the exact 1/8 DC gain: 64 -> 8
    assert _vp8_idct4([64] + [0] * 15) == [8] * 16


def _ref_iwht4(coefs):
    c = np.asarray(coefs, dtype=np.int64).reshape(4, 4)
    W = np.array(
        [[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -1, 1, -1]],
        dtype=np.int64,
    )
    # two exact butterfly passes == W @ c @ W.T with (x+3)>>3 at the end
    full = W @ c @ W.T
    return ((full + 3) >> 3).reshape(16).tolist()


def test_iwht_matches_independent_reimplementation():
    rng = np.random.RandomState(4)
    for _ in range(200):
        coefs = rng.randint(-3000, 3000, 16).tolist()
        assert _vp8_iwht4(coefs) == _ref_iwht4(coefs)
    # DC-only: 16 -> (16+3)>>3 = 2 everywhere? W@c@W.T puts 16 in all
    # cells only after both passes spread it: [16,0..] -> all 16/8 = 2
    assert _vp8_iwht4([16] + [0] * 15) == [2] * 16


# --- prediction -----------------------------------------------------------


def test_predictors_edge_rules():
    above = list(range(100, 116))
    left = list(range(50, 66))
    # DC both: (sum + 16) >> 5
    p = _vp8_predict_block(_DC, above, left, 99, 16, True, True)
    assert p[0, 0] == (sum(above) + sum(left) + 16) >> 5
    # DC above only: (sum + 8) >> 4
    p = _vp8_predict_block(_DC, above, [129] * 16, 127, 16, True, False)
    assert p[5, 5] == (sum(above) + 8) >> 4
    # DC neither: 128
    p = _vp8_predict_block(_DC, [127] * 16, [129] * 16, 127, 16, False, False)
    assert (p == 128).all()
    # V copies above, H copies left
    assert (_vp8_predict_block(_V, above, left, 0, 16, True, True)
            == np.tile(above, (16, 1))).all()
    assert (_vp8_predict_block(_H, above, left, 0, 16, True, True)[:, 3]
            == np.asarray(left)).all()
    # TM clamps: left + above - corner
    p = _vp8_predict_block(_TM, [255] * 16, [255] * 16, 0, 16, True, True)
    assert (p == 255).all()
    p = _vp8_predict_block(_TM, [0] * 16, [0] * 16, 255, 16, True, True)
    assert (p == 0).all()
    # chroma DC both: (sum + 8) >> 4
    p = _vp8_predict_block(_DC, above[:8], left[:8], 0, 8, True, True)
    assert p[0, 0] == (sum(above[:8]) + sum(left[:8]) + 8) >> 4
    with pytest.raises(NotImplementedError, match="B_PRED"):
        _vp8_predict_block(_B, above, left, 0, 16, True, True)


# --- whole-frame: decode == independent reconstruction --------------------


def _independent_reconstruct(debug, w, h, qi, filter_level, sharpness):
    """Rebuild the frame from the encoder's recorded levels with
    test-side transforms/predictors only (no module reconstruction
    helpers) — catches decoder bugs that encoder/decoder lockstep
    could otherwise cancel."""
    tables = _vp8_tables()
    qf = _vp8_quant_factors(tables, qi)
    zz = tables["zigzag"]
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    W, H = mb_w * 16, mb_h * 16
    yrec = np.zeros((H, W), dtype=np.int64)
    urec = np.zeros((H // 2, W // 2), dtype=np.int64)
    vrec = np.zeros((H // 2, W // 2), dtype=np.int64)

    def predict(rec, px, py, size, mode):
        ha, hl = py > 0, px > 0
        above = rec[py - 1, px : px + size] if ha else np.full(size, 127)
        left = rec[py : py + size, px - 1] if hl else np.full(size, 129)
        if ha and hl:
            corner = int(rec[py - 1, px - 1])
        elif ha:
            corner = 129
        else:
            corner = 127
        if mode == _DC:
            if ha and hl:
                sh = 5 if size == 16 else 4
                val = (int(above.sum()) + int(left.sum()) + (1 << (sh - 1))) >> sh
            elif ha or hl:
                sh = 4 if size == 16 else 3
                s = int(above.sum()) if ha else int(left.sum())
                val = (s + (1 << (sh - 1))) >> sh
            else:
                val = 128
            return np.full((size, size), val, dtype=np.int64)
        if mode == _V:
            return np.tile(np.asarray(above, dtype=np.int64), (size, 1))
        if mode == _H:
            return np.tile(
                np.asarray(left, dtype=np.int64)[:, None], (1, size)
            )
        return np.clip(
            np.asarray(left, dtype=np.int64)[:, None]
            + np.asarray(above, dtype=np.int64)[None, :]
            - corner,
            0,
            255,
        )

    skip_inner = [[False] * mb_w for _ in range(mb_h)]
    for idx, mb in enumerate(debug["mbs"]):
        mby, mbx = idx // mb_w, idx % mb_w
        skip_inner[mby][mbx] = mb["skip"]
        y2 = np.zeros(16, dtype=np.int64)
        for i in range(16):
            q = qf["y2dc"] if i == 0 else qf["y2ac"]
            y2[zz[i]] = mb["y2"][i] * q
        dcs = _ref_iwht4(y2.tolist())
        px, py = mbx * 16, mby * 16
        ypred = predict(yrec, px, py, 16, mb["ymode"])
        for b in range(16):
            coefs = np.zeros(16, dtype=np.int64)
            coefs[0] = dcs[b]
            for i in range(1, 16):
                coefs[zz[i]] = mb["y"][b][i] * qf["y1ac"]
            res = np.asarray(_ref_idct4(coefs.tolist())).reshape(4, 4)
            by, bx = (b // 4) * 4, (b % 4) * 4
            blk = ypred[by : by + 4, bx : bx + 4] + res
            yrec[py + by : py + by + 4, px + bx : px + bx + 4] = np.clip(
                blk, 0, 255
            )
        cx, cy = mbx * 8, mby * 8
        for plane, rec in (("u", urec), ("v", vrec)):
            pred = predict(rec, cx, cy, 8, mb["uvmode"])
            for b in range(4):
                coefs = np.zeros(16, dtype=np.int64)
                for i in range(16):
                    q = qf["uvdc"] if i == 0 else qf["uvac"]
                    coefs[zz[i]] = mb[plane][b][i] * q
                res = np.asarray(_ref_idct4(coefs.tolist())).reshape(4, 4)
                by, bx = (b // 2) * 4, (b % 2) * 4
                blk = pred[by : by + 4, bx : bx + 4] + res
                rec[cy + by : cy + by + 4, cx + bx : cx + bx + 4] = np.clip(
                    blk, 0, 255
                )
    yrec = _vp8_simple_filter(
        yrec, filter_level, sharpness, skip_inner, mb_w, mb_h
    )
    return (
        yrec[:h, :w],
        urec[: (h + 1) // 2, : (w + 1) // 2],
        vrec[: (h + 1) // 2, : (w + 1) // 2],
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
    return Y, U, V


@pytest.mark.parametrize(
    "doc,w,h,qi,fl,sh",
    [
        (7, 24, 20, 4, 0, 0),
        (11, 33, 17, 12, 2, 1),
        (3, 16, 16, 0, 4, 5),
        (20, 40, 36, 31, 6, 0),
    ],
)
def test_decode_equals_independent_reconstruction(doc, w, h, qi, fl, sh):
    Y, U, V = _planes(doc, w, h)
    dbg = {}
    data = encode_vp8_frame(
        Y, U, V, qi=qi, filter_level=fl, sharpness=sh, mode_seed=doc,
        debug=dbg,
    )
    m = decode_vp8_real(data, return_planes=True, placeholder_tables_ok=True)
    ry, ru, rv = _independent_reconstruct(dbg, w, h, qi, fl, sh)
    assert (np.asarray(m["y_plane"]) == ry).all()
    assert (np.asarray(m["u_plane"]) == ru).all()
    assert (np.asarray(m["v_plane"]) == rv).all()


def test_roundtrip_error_bounds_across_rotation():
    for doc in range(10):
        w, h = doc % 17 + 8, doc % 13 + 8
        Y, U, V = _planes(doc, w, h)
        qi = doc % 24
        data = encode_vp8_frame(
            Y, U, V, qi=qi, filter_level=(doc % 3) * 2,
            sharpness=(doc // 3) % 4, mode_seed=doc,
        )
        m = decode_vp8_real(data, placeholder_tables_ok=True)
        per_px = 3 + qi // 3
        assert abs(m["sum_y"] - int(Y.astype("int64").sum())) <= per_px * w * h
        cw, ch = (w + 1) // 2, (h + 1) // 2
        assert abs(m["sum_u"] - int(U.astype("int64").sum())) <= per_px * cw * ch
        assert abs(m["sum_v"] - int(V.astype("int64").sum())) <= per_px * cw * ch


def test_skip_path_and_flat_frame_exact():
    w, h = 24, 20
    flat = np.full((h, w), 128, np.uint8)
    cf = np.full(((h + 1) // 2, (w + 1) // 2), 128, np.uint8)
    dbg = {}
    data = encode_vp8_frame(
        flat, cf, cf, qi=4, fixed_modes=(_DC, _DC), debug=dbg
    )
    assert all(mb["skip"] for mb in dbg["mbs"])
    m = decode_vp8_real(data, placeholder_tables_ok=True)
    assert m["sum_y"] == 128 * w * h


def test_mixed_skip_nonskip_context_tracking():
    # left half flat (skips under DC), right half textured: the
    # above/left nonzero context arrays must reset over skipped MBs
    w, h = 48, 16
    Y = np.full((h, w), 128, np.uint8)
    x = np.arange(16)[None, :]
    yy = np.arange(h)[:, None]
    Y[:, 32:] = ((x * 29 + yy * 17) % 200 + 28).astype(np.uint8)
    cf = np.full((8, 24), 128, np.uint8)
    dbg = {}
    data = encode_vp8_frame(Y, cf, cf, qi=2, fixed_modes=(_DC, _DC), debug=dbg)
    skips = [mb["skip"] for mb in dbg["mbs"]]
    assert True in skips and False in skips
    m = decode_vp8_real(data, placeholder_tables_ok=True)
    assert abs(m["sum_y"] - int(Y.astype("int64").sum())) <= 3 * w * h


# --- loop filter ----------------------------------------------------------


def test_simple_filter_hand_computed_edge():
    # one MB-wide plane, a vertical step at x=16 (an MB edge), second
    # MB has coefficients (inner edges active) — check the exact
    # common-adjustment arithmetic on one pixel pair
    y = np.zeros((16, 32), dtype=np.int64)
    y[:, :16] = 100
    y[:, 16:] = 110
    skip_inner = [[True, True]]  # only MB edge filtering
    fl, sh = 4, 0
    out = _vp8_simple_filter(y.copy(), fl, sh, skip_inner, 2, 1)
    # interior = 4; mb_lim = (4+2)*2 + 4 = 16
    # p1=100,q1=110: mask = |100-110|*2 + |100-110|//2 = 25 > 16 -> no-op
    assert (out == y).all()
    fl = 8  # mb_lim = (8+2)*2 + 8 = 28 >= 25 -> filters
    out = _vp8_simple_filter(y.copy(), fl, 0, skip_inner, 2, 1)
    # ps1-qs1 = -10 -> clamp -10; + 3*(qs0-ps0)=30 -> a=20
    # F1 = (20+4)>>3 = 3, F2 = (20+3)>>3 = 2
    assert (out[:, 15] == 102).all() and (out[:, 16] == 107).all()
    # level 0 is a strict no-op
    assert (_vp8_simple_filter(y.copy(), 0, 0, skip_inner, 2, 1) == y).all()


# --- gates and malformed streams ------------------------------------------


def _craft_header(bits_then):
    """Build a minimal VP8 frame whose header encodes the given
    (bit, prob) list — for gate tests the body never reaches tokens."""
    st = _vp8_be_init()
    for bit, prob in bits_then:
        _vp8_be_bool(st, bit, prob)
    header = _vp8_be_finish(st)
    tag = 0 | (1 << 4) | (len(header) << 5)
    out = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    out += b"\x9d\x01\x2a" + bytes([16, 0, 16, 0])
    return out + header + b"\x00\x00"


def test_gates_and_malformed():
    # segmentation gate: color(0), clamp(0), segmentation(1)
    data = _craft_header([(0, 128), (0, 128), (1, 128)])
    with pytest.raises(NotImplementedError, match="segmentation"):
        decode_vp8_real(data, placeholder_tables_ok=True)
    # interframe gate
    Y, U, V = _planes(1, 16, 16)
    good = bytearray(encode_vp8_frame(Y, U, V))
    bad = bytearray(good)
    bad[0] |= 1
    with pytest.raises(NotImplementedError, match="interframe"):
        decode_vp8_real(bytes(bad), placeholder_tables_ok=True)
    # bad start code
    bad = bytearray(good)
    bad[3] = 0x9C
    with pytest.raises(ValueError, match="start code"):
        decode_vp8_real(bytes(bad), placeholder_tables_ok=True)
    # truncation
    with pytest.raises(ValueError):
        decode_vp8_real(bytes(good[:8]), placeholder_tables_ok=True)
    # B_PRED gate: a header identical to the encoder's, with the first
    # MB coded non-skip + ymode=B_PRED (one bit 0 at prob 145)
    tables = _vp8_tables()
    st = _vp8_be_init()
    for bit in (0, 0, 0, 1):
        _vp8_be_bool(st, bit, 128)  # color, clamp, seg, filter_type
    _vp8_be_literal(st, 0, 6)
    _vp8_be_literal(st, 0, 3)
    _vp8_be_bool(st, 0, 128)  # lf_adj
    _vp8_be_literal(st, 0, 2)  # 1 partition
    _vp8_be_literal(st, 4, 7)  # qi
    for _ in range(5):
        _vp8_be_bool(st, 0, 128)
    _vp8_be_bool(st, 0, 128)  # refresh
    cup = tables["coef_update_probs"]
    for t4 in range(4):
        for b8 in range(8):
            for c3 in range(3):
                for n11 in range(11):
                    _vp8_be_bool(st, 0, cup[t4][b8][c3][n11])
    _vp8_be_bool(st, 1, 128)  # mb_no_coeff_skip
    _vp8_be_literal(st, 128, 8)
    _vp8_be_bool(st, 1, 128)  # skip = 1 (no tokens needed)
    _vp8_be_bool(st, 0, tables["kf_ymode_prob"][0])  # -> B_PRED
    header = _vp8_be_finish(st)
    tag = 0 | (1 << 4) | (len(header) << 5)
    data = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    data += b"\x9d\x01\x2a" + bytes([16, 0, 16, 0]) + header + b"\x00\x00"
    with pytest.raises(NotImplementedError, match="B_PRED"):
        decode_vp8_real(data, placeholder_tables_ok=True)


def test_external_lossy_webp_gate_fails_loud():
    """ADVICE r10 (medium): while the token-probability tables are
    placeholders, a lossy stream without the caller's self-encoded
    provenance assertion must raise the honest gate — NOT mis-decode
    into garbage.  The gate must fire on the direct decoder, the WebP
    container dispatch, and the top-level image dispatch alike."""
    import mincemeatpy_spark.multimodal.binary_ops as bo

    Y, U, V = _planes(3, 16, 16)
    frame = encode_vp8_frame(Y, U, V, qi=4, mode_seed=3)
    with pytest.raises(NotImplementedError, match="placeholder"):
        decode_vp8_real(frame)
    payload = encode_webp_lossy(Y, U, V, qi=4, mode_seed=3)
    with pytest.raises(NotImplementedError, match="placeholder"):
        bo.decode_webp_real(payload)
    with pytest.raises(NotImplementedError, match="placeholder"):
        bo.decode_image_real(payload)


def test_quantizer_delta_gate():
    """ADVICE r10: a frame carrying per-plane quantizer deltas must
    raise the named gate instead of silently dequantizing every plane
    with the base qi (wrong reconstruction)."""
    # header: color(0) clamp(0) seg(0) filter_type(0) level(0,6)
    # sharpness(0,3) lf_adj(0) partitions(0,2) qi(4,7) then the FIRST
    # delta-present flag set with a +1 delta (sign bit 0).
    st = _vp8_be_init()
    for bit in (0, 0, 0, 0):
        _vp8_be_bool(st, bit, 128)
    _vp8_be_literal(st, 0, 6)
    _vp8_be_literal(st, 0, 3)
    _vp8_be_bool(st, 0, 128)
    _vp8_be_literal(st, 0, 2)
    _vp8_be_literal(st, 4, 7)
    _vp8_be_bool(st, 1, 128)      # y1dc delta present
    _vp8_be_literal(st, 1, 4)     # magnitude 1
    _vp8_be_bool(st, 0, 128)      # sign +
    header = _vp8_be_finish(st)
    tag = 0 | (1 << 4) | (len(header) << 5)
    data = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    data += b"\x9d\x01\x2a" + bytes([16, 0, 16, 0]) + header + b"\x00\x00"
    with pytest.raises(NotImplementedError, match="quantizer delta"):
        decode_vp8_real(data, placeholder_tables_ok=True)


def test_empty_header_partition_rejected():
    """ADVICE r10: first_size == 0 used to sail past the truncation
    check (0 < 0 is false) and crash the bool decoder on an empty
    buffer; it must be a named ValueError."""
    tag = 0 | (1 << 4) | (0 << 5)
    data = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    data += b"\x9d\x01\x2a" + bytes([16, 0, 16, 0]) + b"\x00\x00"
    with pytest.raises(ValueError, match="truncated VP8 partitions"):
        decode_vp8_real(data, placeholder_tables_ok=True)


def test_webp_container_dispatch():
    Y, U, V = _planes(5, 20, 12)
    payload = encode_webp_lossy(Y, U, V, qi=4, mode_seed=5)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WEBP"
    # route through decode_image_real -> decode_webp_real -> vp8
    import mincemeatpy_spark.multimodal.binary_ops as bo

    m = bo.decode_image_real(payload, placeholder_vp8_ok=True)
    assert m["fmt"] == "webp-vp8"
    assert (m["width"], m["height"]) == (20, 12)
    assert abs(m["sum_y"] - int(Y.astype("int64").sum())) <= 4 * 20 * 12
    # VP8X decodes for real since r10 (static alpha AND animations,
    # tests/test_vp8x.py); an ANIM-flagged container with no frames
    # is malformed, not unsupported
    import struct

    anim = (
        payload[:12]
        + b"VP8X"
        + struct.pack("<I", 10)
        + bytes([0x02, 0, 0, 0])
        + b"\x00" * 6
    )
    with pytest.raises(ValueError, match="no ANMF frames"):
        bo.decode_image_real(anim)


def test_quant_factor_rules():
    tables = _vp8_tables()
    qf = _vp8_quant_factors(tables, 0)
    assert qf["y1dc"] == 4 and qf["y1ac"] == 4
    assert qf["y2dc"] == 8  # doubled
    assert qf["y2ac"] == 8  # 155% of 4 = 6.2 floored at the min 8
    qf = _vp8_quant_factors(tables, 127)
    assert qf["uvdc"] == 132  # chroma DC cap
    assert qf["y2ac"] == (tables["ac_q"][127] * 155) // 100
