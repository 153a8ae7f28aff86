"""Minimal from-spec VP8 keyframe *writer* for decoder edge-case tests.

Implements the RFC 6386 section 7.1 boolean arithmetic encoder and just
enough of the section 9/10/11 keyframe header + mode syntax to emit
legal all-skip intra frames with arbitrary header-field combinations —
in particular combinations libwebp's encoder never produces, such as a
frame-level loop-filter level of 0 together with absolute-mode segment
LF values > 0 (the gate edge case flagged by r11 ADVICE).  All macro-
blocks are coded skip (no coefficient tokens), with a caller-chosen
per-MB 16x16 prediction-mode pattern so reconstructed MB edges carry
sample deltas the loop filter would visibly smooth if (wrongly) run.

Shares no code with the decoder under test: the encoder below is the
RFC pseudo-code transcribed, the decoder is an independent reading of
the same spec; agreement with libwebp on the crafted streams is the
external check.
"""

import struct

from parquet_converters_spark.functions.vp8_codec import (
    COEFF_UPDATE_PROBS,
    KF_UV_MODE_PROB,
    KF_YMODE_PROB,
    KF_YMODE_TREE,
    UV_MODE_TREE,
)


class BoolEncoder:
    """RFC 6386 section 7.1 reference boolean encoder (transcribed)."""

    def __init__(self):
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self):
        i = len(self.out) - 1
        while self.out[i] == 255:
            self.out[i] = 0
            i -= 1
        self.out[i] += 1

    def write(self, prob: int, bit: int):
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def flush(self) -> bytes:
        c = self.bit_count
        v = self.bottom
        if v & (1 << (32 - c)):
            self._carry()
        v = (v << (c & 7)) & 0xFFFFFFFF
        c >>= 3
        while c > 0:
            v = (v << 8) & 0xFFFFFFFF
            c -= 1
        for _ in range(4):
            self.out.append((v >> 24) & 0xFF)
            v = (v << 8) & 0xFFFFFFFF
        return bytes(self.out)

    # convenience wrappers mirroring the decoder's read patterns
    def flag(self, bit: int):
        self.write(128, 1 if bit else 0)

    def literal(self, n: int, value: int):
        for i in range(n - 1, -1, -1):
            self.write(128, (value >> i) & 1)

    def signed_literal(self, n: int, value: int):
        self.literal(n, abs(value))
        self.write(128, 1 if value < 0 else 0)

    def tree(self, tree, probs, value: int):
        path = _tree_path(tree, value)
        assert path is not None, (tree, value)
        for node, bit in path:
            self.write(probs[node >> 1], bit)


def _tree_path(tree, value, i=0, path=()):
    for bit in (0, 1):
        t = tree[i + bit]
        if t > 0:
            r = _tree_path(tree, value, t, path + ((i, bit),))
            if r is not None:
                return r
        elif -t == value:
            return path + ((i, bit),)
    return None


def craft_keyframe(
    width: int,
    height: int,
    ymodes,
    uvmodes,
    *,
    filter_level: int = 0,
    sharpness: int = 0,
    filter_simple: bool = False,
    segmentation_abs_lf=None,
    y_ac_qi: int = 40,
) -> bytes:
    """Emit a legal all-skip VP8 keyframe (raw VP8 payload, no RIFF).

    ymodes/uvmodes: mb_h x mb_w nested sequences of 16x16 / chroma
    prediction modes (DC/V/H/TM numeric constants; B_PRED unsupported —
    skip-coded frames carry no subblock residuals so 16x16 modes
    suffice).  segmentation_abs_lf: None, or 4 absolute segment
    loop-filter strengths (enables segmentation with seg_abs=1 and NO
    map update, so every MB stays in segment 0).
    """
    mb_w = (width + 15) // 16
    mb_h = (height + 15) // 16
    e = BoolEncoder()
    e.flag(0)  # color_space
    e.flag(0)  # clamping_type
    if segmentation_abs_lf is not None:
        e.flag(1)  # segmentation enabled
        e.flag(0)  # update_map: segment map stays all-zero
        e.flag(1)  # update segment feature data
        e.flag(1)  # absolute (not delta) segment values
        for _ in range(4):
            e.flag(0)  # no quantizer override
        for lf in segmentation_abs_lf:
            e.flag(1)
            e.signed_literal(6, lf)
    else:
        e.flag(0)
    e.flag(1 if filter_simple else 0)
    e.literal(6, filter_level)
    e.literal(3, sharpness)
    e.flag(0)  # no loop-filter deltas
    e.literal(2, 0)  # log2(token partitions) = 0 -> one partition
    e.literal(7, y_ac_qi)
    for _ in range(5):
        e.flag(0)  # no per-plane quantizer deltas
    e.flag(1)  # refresh_entropy (meaningless for a single still)
    for t in range(4):  # no coefficient-probability updates
        for b in range(8):
            for c in range(3):
                for p in range(11):
                    e.write(COEFF_UPDATE_PROBS[t][b][c][p], 0)
    e.flag(1)  # mb_no_coeff_skip enabled
    e.literal(8, 128)  # prob_skip_false
    for my in range(mb_h):
        for mx in range(mb_w):
            e.write(128, 1)  # skip: no residual tokens for this MB
            e.tree(KF_YMODE_TREE, KF_YMODE_PROB, ymodes[my][mx])
            e.tree(UV_MODE_TREE, KF_UV_MODE_PROB, uvmodes[my][mx])
    part0 = e.flush()
    tag = (0) | (0 << 1) | (1 << 4) | (len(part0) << 5)
    hdr = bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
    hdr += b"\x9d\x01\x2a" + struct.pack("<HH", width, height)
    # token partition: all MBs skip, so it is never read; libwebp still
    # requires the partition to exist, so pad with zero bytes.
    return hdr + part0 + b"\x00\x00\x00\x00"


def wrap_riff(vp8_payload: bytes) -> bytes:
    """Wrap a raw VP8 frame in a minimal WebP RIFF container."""
    chunk = b"VP8 " + struct.pack("<I", len(vp8_payload)) + vp8_payload
    if len(vp8_payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
