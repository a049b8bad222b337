"""VP8 interop vector (the Vorbis-interop pattern, task 5 applied to
the new codec): a complete VP8 key frame assembled by a TEST-LOCAL
boolean arithmetic encoder implemented with the classic byte-at-a-time
carry-propagation algorithm — a different algorithm shape from the
module encoder's arbitrary-precision low bound — plus test-local
header/mode/token bit sequences.  The module decoder must read it and
reconstruct the independently computed pixels EXACTLY.  This pins the
bool-coder wire format, header field order, mode-tree paths and token
tree across two independent encoder implementations, so module
encoder/decoder inverse-bug cancellation cannot hide in any of those
layers."""

from __future__ import annotations

import numpy as np
import pytest

from mincemeatpy_spark.multimodal.vp8 import (
    _vp8_bd_bool,
    _vp8_bd_init,
    _vp8_tables,
    decode_vp8_real,
)


class _ClassicBoolEncoder:
    """The classic VP8 bool encoder: 24-bit low register, byte output
    with carry propagation into already-emitted bytes (0xff run
    handling), count primed at -24."""

    def __init__(self):
        self.low = 0
        self.range = 255
        self.count = -24
        self.buf = bytearray()

    def put(self, bit: int, prob: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.low += split
            self.range -= split
        else:
            self.range = split
        shift = 8 - self.range.bit_length()
        self.range <<= shift
        self.count += shift
        if self.count >= 0:
            offset = shift - self.count
            if offset > 0 and (self.low << (offset - 1)) & 0x80000000:
                # carry: increment the last non-0xff byte, zero the ffs
                x = len(self.buf) - 1
                while x >= 0 and self.buf[x] == 0xFF:
                    self.buf[x] = 0
                    x -= 1
                assert x >= 0, "carry out of an empty buffer"
                self.buf[x] += 1
            self.buf.append((self.low >> (24 - offset)) & 0xFF)
            self.low = (self.low << offset) & 0xFFFFFF
            shift = self.count
            self.count -= 8
        self.low = (self.low << shift) & 0xFFFFFFFF

    def literal(self, v: int, n: int) -> None:
        for k in range(n - 1, -1, -1):
            self.put((v >> k) & 1, 128)

    def finish(self) -> bytes:
        for _ in range(32):
            self.put(0, 128)
        return bytes(self.buf)


def test_classic_encoder_cross_decodes_with_module_decoder():
    rng = np.random.RandomState(11)
    for trial in range(25):
        n = int(rng.randint(1, 500))
        bits = rng.randint(0, 2, n).tolist()
        probs = rng.randint(1, 255, n).tolist()
        enc = _ClassicBoolEncoder()
        for b, p in zip(bits, probs):
            enc.put(int(b), int(p))
        st = _vp8_bd_init(enc.finish())
        got = [_vp8_bd_bool(st, int(p)) for p in probs]
        assert got == [int(b) for b in bits], f"trial {trial}"


def _tree_put(enc, tree, probs, leaf):
    i = 0
    while True:
        b0, b1 = tree[i], tree[i + 1]
        # walk toward the leaf: does the target live under branch 1?
        def contains(n, target):
            if n <= 0:
                return -n == target
            return contains(tree[n], target) or contains(tree[n + 1], target)

        bit = 1 if contains(b1, leaf) else 0
        enc.put(bit, probs[i >> 1])
        nxt = tree[i + bit]
        if nxt <= 0:
            return
        i = nxt


def test_handmade_vp8_frame_decodes_exactly():
    """16x16 frame, one non-skip MB, DC modes, a single Y2 coefficient
    (+4 level -> dequant 32 -> IWHT 4 -> IDCT DC residual 1/pixel):
    expected luma = 129 everywhere, chroma = 128 everywhere, computed
    right here and matched EXACTLY against the module decoder."""
    t = _vp8_tables()
    enc = _ClassicBoolEncoder()
    # --- keyframe header (first partition) ---
    enc.put(0, 128)  # color space
    enc.put(0, 128)  # clamping
    enc.put(0, 128)  # segmentation off
    enc.put(1, 128)  # filter type simple
    enc.literal(0, 6)  # filter level 0
    enc.literal(0, 3)  # sharpness
    enc.put(0, 128)  # lf deltas off
    enc.literal(0, 2)  # one token partition
    enc.literal(0, 7)  # y_ac_qi = 0
    for _ in range(5):
        enc.put(0, 128)  # no quantizer deltas
    enc.put(0, 128)  # refresh entropy
    cup = t["coef_update_probs"]
    for t4 in range(4):
        for b8 in range(8):
            for c3 in range(3):
                for n11 in range(11):
                    enc.put(0, cup[t4][b8][c3][n11])
    enc.put(1, 128)  # mb_no_coeff_skip on
    enc.literal(128, 8)  # prob_skip_false
    # one macroblock: not skipped, ymode DC, uvmode DC
    enc.put(0, 128)  # skip flag = 0
    _tree_put(enc, t["kf_ymode_tree"], t["kf_ymode_prob"], 0)  # DC
    _tree_put(enc, t["uv_mode_tree"], t["kf_uv_mode_prob"], 0)  # DC
    header = enc.finish()

    # --- token partition ---
    tok = _ClassicBoolEncoder()
    cp = t["coef_probs"]
    tree = t["coef_tree"]
    # Y2 block (type 1, first coef 0, band 0, ctx 0): FOUR (+4), then
    # EOB at position 1 (band 1, ctx 2 after |v|>1)
    _tree_put(tok, tree, cp[1][0][0], 4)
    tok.put(0, 128)  # sign +
    _tree_put(tok, tree, cp[1][1][2], t["EOB"])
    # 16 Y blocks (type 0, first coef 1, band 1, ctx 0): EOB
    for _ in range(16):
        _tree_put(tok, tree, cp[0][1][0], t["EOB"])
    # 4 U + 4 V blocks (type 2, first 0, band 0, ctx 0): EOB
    for _ in range(8):
        _tree_put(tok, tree, cp[2][0][0], t["EOB"])
    tokens = tok.finish()

    tag = 0 | (1 << 4) | (len(header) << 5)
    frame = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    frame += b"\x9d\x01\x2a" + bytes([16, 0, 16, 0]) + header + tokens

    m = decode_vp8_real(frame, return_planes=True, placeholder_tables_ok=True)
    assert (m["width"], m["height"]) == (16, 16)
    # independent expectation: DC pred with no neighbors = 128;
    # y2 level 4 * y2dc(qi=0)=8 -> 32; IWHT spreads to (32+3)>>3 = 4
    # per luma DC; IDCT of DC=4 -> (4+4)>>3 = 1 per pixel -> 129
    assert (np.asarray(m["y_plane"]) == 129).all()
    assert (np.asarray(m["u_plane"]) == 128).all()
    assert (np.asarray(m["v_plane"]) == 128).all()
    assert m["sum_y"] == 129 * 256
    assert m["sum_u"] == m["sum_v"] == 128 * 64


def test_handmade_vp8_all_skip_frame():
    t = _vp8_tables()
    enc = _ClassicBoolEncoder()
    for bit in (0, 0, 0, 1):
        enc.put(bit, 128)
    enc.literal(0, 6)
    enc.literal(0, 3)
    enc.put(0, 128)
    enc.literal(0, 2)
    enc.literal(0, 7)
    for _ in range(5):
        enc.put(0, 128)
    enc.put(0, 128)
    cup = t["coef_update_probs"]
    for t4 in range(4):
        for b8 in range(8):
            for c3 in range(3):
                for n11 in range(11):
                    enc.put(0, cup[t4][b8][c3][n11])
    enc.put(1, 128)
    enc.literal(200, 8)  # skip probability 200
    enc.put(1, 200)  # skip = 1
    _tree_put(enc, t["kf_ymode_tree"], t["kf_ymode_prob"], 3)  # TM
    _tree_put(enc, t["uv_mode_tree"], t["kf_uv_mode_prob"], 1)  # V
    header = enc.finish()
    tag = 0 | (1 << 4) | (len(header) << 5)
    frame = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    frame += b"\x9d\x01\x2a" + bytes([16, 0, 16, 0]) + header + b"\x00\x00"
    m = decode_vp8_real(frame, return_planes=True, placeholder_tables_ok=True)
    # TM with no neighbors: left 129 + above 127 - corner 127 = 129
    assert (np.asarray(m["y_plane"]) == 129).all()
    # V chroma with no above: rows of 127
    assert (np.asarray(m["u_plane"]) == 127).all()


def test_tree_put_helper_agrees_with_module_paths():
    from mincemeatpy_spark.multimodal.vp8 import _vp8_tree_paths

    t = _vp8_tables()
    for tree, nleaves in ((t["kf_ymode_tree"], 5), (t["uv_mode_tree"], 4),
                          (t["coef_tree"], 12)):
        paths = _vp8_tree_paths(tree)
        probs = list(range(1, 12))  # distinct per-node markers
        for leaf in paths:
            enc = []

            class Spy:
                def put(self, bit, prob):
                    enc.append((prob, bit))

            _tree_put(Spy(), tree, probs[: max(i >> 1 for i in
                      range(0, len(tree), 2)) + 1], leaf)
            assert [(probs[i], b) for i, b in paths[leaf]] == enc, (tree, leaf)
