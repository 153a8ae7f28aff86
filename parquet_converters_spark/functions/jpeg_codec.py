"""Minimal stdlib-only baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

The dominant web-corpus image format, written from the public spec so
``multimodal_decode``/``resize_media`` run REAL on JPEG payloads in any
environment (this container ships no PIL) — the same from-spec pattern
as the PNG/WAV codecs in ``media_codecs.py`` and the HDF5 codec in
``sinks/hdf5_minimal.py``.  Where PIL *is* installed,
``tests/test_multimodal_realdecode.py`` cross-validates both directions
(auto-activating).

Scope (deliberately minimal, spec-complete within it):

- decode: baseline sequential DCT (SOF0) AND progressive DCT (SOF2,
  Annex G: DC first/refinement scans, AC spectral-band first scans
  with EOB runs, AC successive-approximation refinement), Huffman
  entropy coding, 8-bit samples, grayscale or YCbCr, any sampling
  factors up to 2x2 (4:4:4 / 4:2:2 / 4:2:0), interleaved or
  per-component scans, restart markers (DRI/RSTn), 8- and 16-bit
  quantization tables, multi-segment APPn/COM skipping.  Arithmetic
  coding (SOF9-11), lossless, hierarchical, and 12-bit modes raise
  ``NotImplementedError`` naming exactly what they are.
- encode: SOF0, or SOF2 via ``progressive=True`` (a real
  successive-approximation scan ladder — coarse DC, DC refinement,
  two AC spectral bands at Al=1, AC refinement — so every decoder
  path is testable without foreign fixtures), with the Annex K
  example quantization and Huffman tables (the tables virtually every
  encoder ships), quality scaling per the public IJG formula, 4:4:4
  or 4:2:0 subsampling, grayscale or RGB input.  Deterministic: same
  pixels -> same bytes on every platform (pure-integer quantization
  after an IEEE-double DCT with shared constants).  The progressive
  ladder reconstructs the EXACT quantized coefficients (the point
  transforms are lossless shift+refine), so progressive decode is
  asserted bit-identical to the baseline decode of the same image.

These run inside Arrow-batched ``mapInPandas`` workers, so everything
is a pure function of ``bytes`` with no Spark imports.

Reference provenance: the reference engine (BlueBrain/parquet-converters)
has no media surface; this extends the engine for LLM-pipeline
multimodal columns (brief § multimodal).
"""

from __future__ import annotations

import math
import struct

# ---------------------------------------------------------------------------
# Spec constants (ITU-T T.81 Annex K — the public example tables)
# ---------------------------------------------------------------------------

#: zigzag position -> row-major index in the 8x8 block (spec Fig. 5)
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

#: Annex K Table K.1 — luminance quantization (row-major)
QTABLE_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

#: Annex K Table K.2 — chrominance quantization (row-major)
QTABLE_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K Huffman specs as (BITS[1..16], HUFFVAL) — canonical-code form
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# 1-D DCT basis, shared by FDCT and IDCT: COS[u][x] = cos((2x+1)u*pi/16),
# with the 0.5*C(u) normalisation folded in so both transforms are two
# plain matrix passes.
_C = [1.0 / math.sqrt(2.0)] + [1.0] * 7
_COS = [
    [0.5 * _C[u] * math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
    for u in range(8)
]
_COS_T = [[_COS[u][x] for u in range(8)] for x in range(8)]

# SOF markers we must name precisely when rejecting (spec Table B.1);
# SOF0 (baseline) and SOF2 (progressive) are implemented
_SOF_UNSUPPORTED = {
    0xC1: "extended sequential (SOF1)",
    0xC3: "lossless (SOF3)",
    0xC5: "differential sequential (SOF5)",
    0xC6: "differential progressive (SOF6)",
    0xC7: "differential lossless (SOF7)",
    0xC9: "arithmetic-coded sequential (SOF9)",
    0xCA: "arithmetic-coded progressive (SOF10)",
    0xCB: "arithmetic-coded lossless (SOF11)",
    0xCD: "differential arithmetic sequential (SOF13)",
    0xCE: "differential arithmetic progressive (SOF14)",
    0xCF: "differential arithmetic lossless (SOF15)",
}


def is_jpeg(data: bytes) -> bool:
    """SOI marker check — the sniff used by the multimodal decode gate."""
    return len(data) >= 3 and data[:3] == b"\xff\xd8\xff"


#: Allocation guard for untrusted streams: a corrupt SOF dimension
#: field must not make an executor allocate gigabytes.  268M pixels
#: (16k x 16k) is far above anything that belongs in a record column.
_MAX_PIXELS = 1 << 28


# ---------------------------------------------------------------------------
# Huffman code construction (spec Annex C)
# ---------------------------------------------------------------------------


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical order (encoder side)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode_map(
    bits: list[int], vals: list[int]
) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol (decoder side)."""
    out: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


# ---------------------------------------------------------------------------
# 8x8 transforms (spec A.3.3) — separable, IEEE doubles, shared basis
# ---------------------------------------------------------------------------


def _fdct8x8(block: list[float]) -> list[float]:
    tmp = [0.0] * 64
    for y in range(8):
        row = block[y * 8 : y * 8 + 8]
        for u in range(8):
            cu = _COS[u]
            tmp[y * 8 + u] = sum(row[x] * cu[x] for x in range(8))
    out = [0.0] * 64
    for u in range(8):
        col = [tmp[y * 8 + u] for y in range(8)]
        for v in range(8):
            cv = _COS[v]
            out[v * 8 + u] = sum(col[y] * cv[y] for y in range(8))
    return out


def _idct8x8(coef: list[float]) -> list[float]:
    """Sparsity-aware separable IDCT: zero coefficient rows contribute
    exactly 0.0 in every position, so skipping them leaves the output
    BYTES identical (quantized blocks are mostly zeros — this is the
    classic libjpeg shortcut, ~3x on typical content)."""
    # DC-only block: constant fill, reproducing the two-pass arithmetic
    # ((S00 * c) * c) bit-for-bit
    if not any(coef[1:]):
        c = _COS[0][0]
        return [(coef[0] * c) * c] * 64
    tmp = [0.0] * 64
    nz_rows = []
    for v in range(8):
        at = v * 8
        r0, r1, r2, r3, r4, r5, r6, r7 = coef[at : at + 8]
        if not (r0 or r1 or r2 or r3 or r4 or r5 or r6 or r7):
            continue
        nz_rows.append(v)
        for x in range(8):
            t = _COS_T[x]
            # left-assoc chain == sum()'s fold order: bit-identical
            tmp[at + x] = (
                r0 * t[0] + r1 * t[1] + r2 * t[2] + r3 * t[3]
                + r4 * t[4] + r5 * t[5] + r6 * t[6] + r7 * t[7]
            )
    out = [0.0] * 64
    for x in range(8):
        col = [tmp[v * 8 + x] for v in nz_rows]
        cos_v = [_COS[v] for v in nz_rows]
        for y in range(8):
            out[y * 8 + x] = sum(
                c * cv[y] for c, cv in zip(col, cos_v)
            )
    return out


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """Entropy-coded-segment bit reader: 0xFF00 unstuffing, stops clean
    at any real marker, restart-marker aware (spec F.2.2.5)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None  # pending marker (RSTn or scan end)

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("JPEG: bit read past segment end")
        d = self.data
        if self.pos >= len(d):
            raise ValueError("JPEG: truncated entropy-coded segment")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:  # stuffed literal 0xFF
                self.pos += 2
            elif nxt is None:
                raise ValueError("JPEG: truncated after 0xFF")
            else:  # a real marker terminates the segment
                # B.1.1.2: any number of 0xFF fill bytes may precede the
                # marker id; leave pos on the last 0xFF so pos+2 skips it.
                q = self.pos + 1
                while q < len(d) and d[q] == 0xFF:
                    q += 1
                if q >= len(d):
                    raise ValueError("JPEG: truncated after 0xFF")
                self.pos = q - 1
                self.marker = d[q]
                raise ValueError("JPEG: bit read past segment end")
        else:
            self.pos += 1
        # Keep only the unconsumed low bits before appending: without the
        # mask the accumulator grows 8 bits per byte for the whole entropy
        # segment, making bit reads O(n^2) in scan size (DoS on large scans).
        self.acc = ((self.acc & ((1 << self.nbits) - 1)) << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("JPEG: invalid Huffman code")

    def sync_restart(self, n: int) -> None:
        """Byte-align and consume the expected RSTn marker."""
        self.acc = 0
        self.nbits = 0
        if self.marker is None:
            # scan forward to the marker (discarding pad bits/bytes)
            d = self.data
            while self.pos + 1 < len(d):
                if d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
                    if d[self.pos + 1] == 0xFF:  # B.1.1.2 fill byte
                        self.pos += 1
                        continue
                    self.marker = d[self.pos + 1]
                    break
                self.pos += 1
        if self.marker != 0xD0 + (n & 7):
            raise ValueError(
                f"JPEG: expected RST{n & 7}, got marker {self.marker:#x}"
                if self.marker is not None
                else "JPEG: missing restart marker"
            )
        self.pos += 2
        self.marker = None


def _extend(v: int, s: int) -> int:
    """DIFF/AC magnitude decode (spec F.2.2.1 EXTEND)."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _clamp8(x: float) -> int:
    v = int(x + 0.5) if x >= 0 else -int(-x + 0.5)
    return 0 if v < 0 else 255 if v > 255 else v


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline (SOF0) or progressive (SOF2) JPEG to
    ``(width, height, channels, pixels)`` — channels 1 (grayscale) or
    3 (RGB), row-major 8-bit bytes.

    Progressive decoding (spec Annex G) accumulates per-block
    coefficients across scans — DC first/refinement, AC spectral
    bands, AC successive-approximation refinement with EOB runs — and
    runs the IDCT once at the end.  Unsupported modes raise
    ``NotImplementedError`` naming the exact mode (arithmetic coding,
    12-bit, lossless, ...), so the multimodal gate error is precise
    about what's missing rather than "not PNG".  Malformed input
    raises ``ValueError`` — never a bare IndexError/struct.error —
    the contract untrusted-corpus callers rely on.
    """
    try:
        return _decode_jpeg(data)
    except (IndexError, KeyError, struct.error) as e:
        raise ValueError(f"JPEG: corrupt or truncated stream ({e})") from e


def _decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    if not is_jpeg(data):
        raise ValueError("JPEG: bad SOI signature")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    restart_interval = 0
    frame = None  # (W, H, comps) ; comps: list of dicts
    planes: dict[int, bytearray] = {}
    coefs: dict[int, list[list[int]]] = {}  # progressive: zigzag coeffs

    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at {pos}")
        # B.1.1.2: skip optional 0xFF fill bytes before the marker id
        while pos + 2 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if pos + 4 > len(data):
            raise ValueError(f"JPEG: truncated segment {marker:#x}")
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError(f"JPEG: truncated segment {marker:#x}")
        if marker in _SOF_UNSUPPORTED:
            raise NotImplementedError(
                f"JPEG: {_SOF_UNSUPPORTED[marker]} decoding is not "
                "implemented — only baseline sequential Huffman (SOF0)"
            )
        if marker == 0xDB:  # DQT — possibly several tables per segment
            at = 0
            while at < len(body):
                pq, tq = body[at] >> 4, body[at] & 0xF
                at += 1
                if pq == 0:
                    qtables[tq] = list(body[at : at + 64])
                    at += 64
                else:
                    qtables[tq] = list(
                        struct.unpack(">64H", body[at : at + 128])
                    )
                    at += 128
        elif marker == 0xC4:  # DHT — possibly several tables per segment
            at = 0
            while at < len(body):
                tc, th = body[at] >> 4, body[at] & 0xF
                bits = list(body[at + 1 : at + 17])
                n = sum(bits)
                vals = list(body[at + 17 : at + 17 + n])
                htables[(tc, th)] = _build_decode_map(bits, vals)
                at += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(
                    f"JPEG: {prec}-bit precision not implemented (8 only)"
                )
            if nc not in (1, 3):
                raise NotImplementedError(
                    f"JPEG: {nc}-component images not implemented "
                    "(grayscale and YCbCr only)"
                )
            if w == 0 or h == 0 or w * h > _MAX_PIXELS:
                raise ValueError(
                    f"JPEG: implausible dimensions {w}x{h} "
                    "(corrupt header, or beyond the decoder's "
                    f"{_MAX_PIXELS}-pixel allocation guard)"
                )
            comps = []
            hmax = vmax = 1
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                ch, cv = hv >> 4, hv & 0xF
                if not (1 <= ch <= 2 and 1 <= cv <= 2):
                    raise NotImplementedError(
                        f"JPEG: sampling factors {ch}x{cv} not "
                        "implemented (1..2 only)"
                    )
                hmax, vmax = max(hmax, ch), max(vmax, cv)
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            progressive = marker == 0xC2
            for c in comps:
                c["pw"] = mcux * c["h"] * 8  # padded plane width
                c["ph"] = mcuy * c["v"] * 8
                c["bw"] = mcux * c["h"]  # block-grid width
                planes[c["id"]] = bytearray(c["pw"] * c["ph"])
                if progressive:
                    coefs[c["id"]] = [
                        [0] * 64 for _ in range(c["bw"] * mcuy * c["v"])
                    ]
            frame = {
                "w": w, "h": h, "comps": comps,
                "hmax": hmax, "vmax": vmax, "mcux": mcux, "mcuy": mcuy,
                "progressive": progressive,
            }
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i : 3 + 2 * i]
                comp = next(
                    (c for c in frame["comps"] if c["id"] == cs), None
                )
                if comp is None:
                    raise ValueError(
                        f"JPEG: scan references unknown component {cs}"
                    )
                scan.append((comp, tt >> 4, tt & 0xF))
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            if frame["progressive"]:
                pos = _decode_scan_progressive(
                    data, pos + 2 + seglen, frame, scan, htables,
                    restart_interval, coefs,
                    ss, se, ahal >> 4, ahal & 0xF,
                )
            else:
                pos = _decode_scan(
                    data, pos + 2 + seglen, frame, scan,
                    qtables, htables, restart_interval, planes,
                )
            continue  # pos already advanced past the ECS
        # APPn / COM / others: skip
        pos += 2 + seglen

    if frame is None:
        raise ValueError("JPEG: no frame header found")
    if frame["progressive"]:
        _finalize_progressive(frame, coefs, qtables, planes)
    return _assemble(frame, planes)


def _decode_scan(
    data, pos, frame, scan, qtables, htables, restart_interval, planes
):
    """Decode one entropy-coded segment (interleaved if Ns>1, else the
    component's own block grid — spec A.2), writing spatial blocks into
    the component planes.  Returns the offset just past the ECS."""
    br = _BitReader(data, pos)
    preds = {c["id"]: 0 for c, _, _ in scan}
    if len(scan) > 1:
        units_x, units_y = frame["mcux"], frame["mcuy"]
    else:
        c = scan[0][0]
        # non-interleaved: the scan covers this component's OWN grid
        units_x = (
            (frame["w"] * c["h"] + frame["hmax"] * 8 - 1)
            // (frame["hmax"] * 8)
        )
        units_y = (
            (frame["h"] * c["v"] + frame["vmax"] * 8 - 1)
            // (frame["vmax"] * 8)
        )
    n_units = units_x * units_y
    rst = 0
    for unit in range(n_units):
        if restart_interval and unit and unit % restart_interval == 0:
            br.sync_restart(rst)
            rst = (rst + 1) & 7
            for k in preds:
                preds[k] = 0
        ux, uy = unit % units_x, unit // units_x
        for comp, td, ta in scan:
            nb = comp["h"] * comp["v"] if len(scan) > 1 else 1
            for b in range(nb):
                if len(scan) > 1:
                    bx = ux * comp["h"] + b % comp["h"]
                    by = uy * comp["v"] + b // comp["h"]
                else:
                    bx, by = ux, uy
                block = _decode_block(
                    br,
                    htables.get((0, td)),
                    htables.get((1, ta)),
                    qtables[comp["tq"]],
                    preds,
                    comp["id"],
                )
                _place_block(planes[comp["id"]], comp["pw"], bx, by, block)
    # skip to just past the ECS (next real marker)
    d = data
    p = br.pos
    if br.marker is not None:
        return p
    while p + 1 < len(d):
        if d[p] == 0xFF and d[p + 1] != 0x00:
            return p
        p += 1
    return p


def _decode_scan_progressive(
    data, pos, frame, scan, htables, restart_interval, coefs, ss, se, ah, al
):
    """One progressive scan (spec Annex G.2): DC scans (Ss=0, possibly
    interleaved) or single-component AC spectral-band scans, first pass
    (Ah=0) or successive-approximation refinement (Ah>0), with EOB-run
    state and restart-marker resets.  Coefficients accumulate into
    ``coefs`` in zigzag order; no IDCT here."""
    br = _BitReader(data, pos)
    preds = {c["id"]: 0 for c, _, _ in scan}
    eobrun = 0
    if len(scan) > 1:
        if ss != 0:
            raise ValueError("JPEG: interleaved AC scan is not legal")
        units_x, units_y = frame["mcux"], frame["mcuy"]
    else:
        # non-interleaved: the scan walks the component's OWN block
        # grid (spec A.2.2), one block per unit
        c = scan[0][0]
        units_x = (
            (frame["w"] * c["h"] + frame["hmax"] * 8 - 1)
            // (frame["hmax"] * 8)
        )
        units_y = (
            (frame["h"] * c["v"] + frame["vmax"] * 8 - 1)
            // (frame["vmax"] * 8)
        )
    rst = 0
    n_units = units_x * units_y
    for unit in range(n_units):
        if restart_interval and unit and unit % restart_interval == 0:
            br.sync_restart(rst)
            rst = (rst + 1) & 7
            for k in preds:
                preds[k] = 0
            eobrun = 0
        ux, uy = unit % units_x, unit // units_x
        for comp, td, ta in scan:
            nb = comp["h"] * comp["v"] if len(scan) > 1 else 1
            for b in range(nb):
                if len(scan) > 1:
                    bx = ux * comp["h"] + b % comp["h"]
                    by = uy * comp["v"] + b // comp["h"]
                else:
                    bx, by = ux, uy
                block = coefs[comp["id"]][by * comp["bw"] + bx]
                if ss == 0:  # DC scan
                    if ah == 0:
                        table = htables.get((0, td))
                        if table is None:
                            raise ValueError(
                                "JPEG: scan references an undefined "
                                "Huffman table"
                            )
                        s = br.decode_huff(table)
                        diff = _extend(br.receive(s), s) if s else 0
                        preds[comp["id"]] += diff
                        block[0] = preds[comp["id"]] << al
                    else:  # DC refinement: one raw bit per block
                        if br.read_bit():
                            block[0] |= 1 << al
                else:  # AC scan (single component)
                    table = htables.get((1, ta))
                    if table is None:
                        raise ValueError(
                            "JPEG: scan references an undefined Huffman "
                            "table"
                        )
                    if ah == 0:
                        eobrun = _ac_first(br, table, block, ss, se, al, eobrun)
                    else:
                        eobrun = _ac_refine(
                            br, table, block, ss, se, al, eobrun
                        )
    # skip to just past the ECS (next real marker)
    d = data
    p = br.pos
    if br.marker is not None:
        return p
    while p + 1 < len(d):
        if d[p] == 0xFF and d[p + 1] != 0x00:
            return p
        p += 1
    return p


def _ac_first(br, table, block, ss, se, al, eobrun):
    """First AC pass for one block (spec G.2.2): run-length coded
    magnitudes shifted by the point transform, EOB-run compressed."""
    if eobrun:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = br.decode_huff(table)
        r, s = rs >> 4, rs & 0xF
        if s:
            k += r
            if k > se:
                raise ValueError("JPEG: AC index out of band")
            block[k] = _extend(br.receive(s), s) << al
            k += 1
        else:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.receive(r)
            break
    return eobrun


def _ac_refine(br, table, block, ss, se, al, eobrun):
    """AC successive-approximation refinement for one block (spec
    G.2.3, the libjpeg decode_mcu_AC_refine logic): newly-significant
    coefficients arrive as +-1<<Al; every already-nonzero coefficient
    visited consumes one correction bit."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss

    def correct(z):
        if br.read_bit() and (block[z] & p1) == 0:
            block[z] += p1 if block[z] > 0 else m1

    if eobrun == 0:
        while k <= se:
            rs = br.decode_huff(table)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r < 15:  # EOB run (covers this block's remainder too)
                    eobrun = 1 << r
                    if r:
                        eobrun += br.receive(r)
                    break
                val = 0  # ZRL: pass 16 zero-history slots
            elif s == 1:
                val = p1 if br.read_bit() else m1
            else:
                raise ValueError("JPEG: AC refinement magnitude must be 1")
            while k <= se:
                if block[k]:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                block[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if block[k]:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _finalize_progressive(frame, coefs, qtables, planes):
    """Dequantize + IDCT every accumulated block into the component
    planes (run once, after all scans)."""
    for comp in frame["comps"]:
        qt = qtables.get(comp["tq"])
        if qt is None:
            raise ValueError(
                f"JPEG: component references undefined quant table "
                f"{comp['tq']}"
            )
        bw = comp["bw"]
        for idx, zz_block in enumerate(coefs[comp["id"]]):
            coef = [0.0] * 64
            for k in range(64):
                v = zz_block[k]
                if v:
                    coef[ZIGZAG[k]] = v * qt[k]
            px = _idct8x8(coef)
            block = bytes(_clamp8(v + 128.0) for v in px)
            _place_block(planes[comp["id"]], comp["pw"], idx % bw, idx // bw, block)


def _decode_block(br, dc_table, ac_table, qt, preds, cid):
    if dc_table is None or ac_table is None:
        raise ValueError("JPEG: scan references an undefined Huffman table")
    coef = [0.0] * 64
    s = br.decode_huff(dc_table)
    diff = _extend(br.receive(s), s) if s else 0
    preds[cid] += diff
    coef[0] = preds[cid] * qt[0]
    k = 1
    while k < 64:
        rs = br.decode_huff(ac_table)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG: AC coefficient index out of range")
        coef[ZIGZAG[k]] = _extend(br.receive(s), s) * qt[k]
        k += 1
    px = _idct8x8(coef)
    return bytes(_clamp8(v + 128.0) for v in px)


def _place_block(plane, pw, bx, by, block):
    x0, y0 = bx * 8, by * 8
    for y in range(8):
        at = (y0 + y) * pw + x0
        plane[at : at + 8] = block[y * 8 : y * 8 + 8]


def _assemble(frame, planes) -> tuple[int, int, int, bytes]:
    """Upsample component planes (pixel replication) and convert to the
    output colorspace (spec-standard YCbCr -> RGB, BT.601 constants)."""
    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    if len(comps) == 1:
        c = comps[0]
        plane, pw = planes[c["id"]], c["pw"]
        out = bytearray(w * h)
        for y in range(h):
            at = y * pw
            out[y * w : (y + 1) * w] = plane[at : at + w]
        return w, h, 1, bytes(out)
    out = bytearray(w * h * 3)
    for y in range(h):
        row = y * w * 3
        for x in range(w):
            vals = []
            for c in comps:
                sx = x * c["h"] // hmax
                sy = y * c["v"] // vmax
                vals.append(planes[c["id"]][sy * c["pw"] + sx])
            yy, cb, cr = vals[0], vals[1] - 128, vals[2] - 128
            d = row + x * 3
            out[d] = _clamp8(yy + 1.402 * cr)
            out[d + 1] = _clamp8(yy - 0.344136 * cb - 0.714136 * cr)
            out[d + 2] = _clamp8(yy + 1.772 * cb)
    return w, h, 3, bytes(out)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing (spec F.1.2.3)
                self.out.append(0x00)
        # Drop the flushed high bits so the accumulator stays <8 bits wide
        # (unbounded growth would make encoding O(n^2) in stream length).
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)


def _scale_qtable(base: list[int], quality: int) -> list[int]:
    """The public IJG quality scaling: 1..100 -> per-entry scale."""
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [max(1, min(255, (b * scale + 50) // 100)) for b in base]


def _category(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


def _encode_block(bw, coef_q, pred, dc_codes, ac_codes):
    """Huffman-encode one quantized block (zigzag ints); returns new DC
    predictor."""
    diff = coef_q[0] - pred
    s = _category(diff)
    code, length = dc_codes[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if coef_q[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = coef_q[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_codes[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return coef_q[0]


def _emit_ac_first(bw, blocks, ac_codes, ss, se, al):
    """First-pass AC scan for a block sequence (spec G.1.2.2): values
    point-transformed by ``>> al`` with truncation toward zero, ZRL
    runs, one EOB per block (no cross-block EOB-run accumulation —
    legal, just less compressed)."""
    for blk in blocks:
        r = 0
        for k in range(ss, se + 1):
            v = blk[k]
            t = (v >> al) if v >= 0 else -((-v) >> al)
            if t == 0:
                r += 1
                continue
            while r > 15:
                code, ln = ac_codes[0xF0]
                bw.write(code, ln)
                r -= 16
            s = _category(t)
            code, ln = ac_codes[(r << 4) | s]
            bw.write(code, ln)
            bw.write(t if t > 0 else t + (1 << s) - 1, s)
            r = 0
        if r > 0:
            code, ln = ac_codes[0x00]  # EOB covering this block only
            bw.write(code, ln)


def _emit_ac_refine(bw, blocks, ac_codes, ss, se, al):
    """AC successive-approximation refinement (spec G.1.2.3, the
    libjpeg encode_mcu_AC_refine structure): newly-significant coeffs
    (|v|>>al == 1) emit (run,1)+sign; already-nonzero coeffs buffer a
    correction bit that rides the NEXT emitted symbol; ZRLs flush only
    while a significant coefficient is still ahead (keeping the
    decoder's walk aligned with the buffered bits); trailing
    zeros/corrections fold into one per-block EOB."""
    for blk in blocks:
        absval = [0] * (se + 1)
        eob = ss - 1  # position of the LAST newly-significant coef
        for k in range(ss, se + 1):
            a = (blk[k] if blk[k] >= 0 else -blk[k]) >> al
            absval[k] = a
            if a == 1:
                eob = k
        r = 0
        br_bits: list[int] = []
        for k in range(ss, se + 1):
            a = absval[k]
            if a == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                code, ln = ac_codes[0xF0]
                bw.write(code, ln)
                r -= 16
                for bit in br_bits:
                    bw.write(bit, 1)
                br_bits = []
            if a > 1:  # history coefficient: correction bit only
                br_bits.append(a & 1)
                continue
            code, ln = ac_codes[(r << 4) | 1]
            bw.write(code, ln)
            bw.write(1 if blk[k] > 0 else 0, 1)
            for bit in br_bits:
                bw.write(bit, 1)
            br_bits = []
            r = 0
        if r > 0 or br_bits:
            code, ln = ac_codes[0x00]  # EOB (run of exactly this block)
            bw.write(code, ln)
            for bit in br_bits:
                bw.write(bit, 1)


def _quantize_block(pixels, qt) -> list[int]:
    """Level-shift, FDCT, quantize, zigzag — one spatial 8x8 in, 64
    zigzag-ordered quantized ints out."""
    shifted = [p - 128.0 for p in pixels]
    coef = _fdct8x8(shifted)
    out = [0] * 64
    for k in range(64):
        c = coef[ZIGZAG[k]] / qt[k]
        out[k] = int(c + 0.5) if c >= 0 else -int(-c + 0.5)
    return out


def _extract_block(plane, pw, ph, x0, y0) -> list[int]:
    """8x8 tile with edge replication for partial tiles."""
    out = []
    for y in range(8):
        sy = min(y0 + y, ph - 1)
        row = plane[sy * pw : sy * pw + pw]
        for x in range(8):
            out.append(row[min(x0 + x, pw - 1)])
    return out


def encode_jpeg(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    quality: int = 85,
    subsampling: str = "4:2:0",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Encode 8-bit pixels (1=grayscale or 3=RGB, row-major) as a
    baseline JFIF JPEG with the Annex K tables.  Deterministic bytes
    for identical input on every platform.  ``restart_interval`` > 0
    emits DRI + RSTn markers every that-many MCUs (spec F.1.2.5) —
    what a parallel encoder would do to make the stream splittable.

    ``progressive=True`` emits SOF2 with a real successive-approximation
    scan ladder (spec Annex G): coarse DC (Al=1) -> DC refinement ->
    per-component AC spectral bands 1-5 and 6-63 at Al=1 -> AC
    refinement — exercising all four progressive scan types, so the
    decoder's Annex G paths are testable without foreign fixtures;
    ``restart_interval`` composes (RSTn every N MCUs in DC scans / N
    blocks in AC scans, resetting predictors and EOB-run state)."""
    if channels not in (1, 3):
        raise ValueError(f"channels must be 1 or 3, got {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, expected "
            f"{width * height * channels}"
        )
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError("subsampling must be '4:4:4' or '4:2:0'")

    qt_l = _scale_qtable(QTABLE_LUMA, quality)
    qt_c = _scale_qtable(QTABLE_CHROMA, quality)

    # --- colorspace: RGB -> YCbCr planes (BT.601, spec-standard) ---
    if channels == 1:
        y_plane = list(pixels)
        cb_plane = cr_plane = None
    else:
        n = width * height
        y_plane = [0] * n
        cb_plane = [0] * n
        cr_plane = [0] * n
        for i in range(n):
            r, g, b = pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
            y_plane[i] = _clamp8(0.299 * r + 0.587 * g + 0.114 * b)
            cb_plane[i] = _clamp8(128 - 0.168736 * r - 0.331264 * g + 0.5 * b)
            cr_plane[i] = _clamp8(128 + 0.5 * r - 0.418688 * g - 0.081312 * b)

    sub = channels == 3 and subsampling == "4:2:0"
    if sub:
        cw, ch_ = (width + 1) // 2, (height + 1) // 2
        cb_s = [0] * (cw * ch_)
        cr_s = [0] * (cw * ch_)
        for sy in range(ch_):
            for sx in range(cw):
                acc_b = acc_r = cnt = 0
                for dy in (0, 1):
                    for dx in (0, 1):
                        x, y = 2 * sx + dx, 2 * sy + dy
                        if x < width and y < height:
                            acc_b += cb_plane[y * width + x]
                            acc_r += cr_plane[y * width + x]
                            cnt += 1
                cb_s[sy * cw + sx] = (acc_b + cnt // 2) // cnt
                cr_s[sy * cw + sx] = (acc_r + cnt // 2) // cnt
        comps = [
            ("y", y_plane, width, height, 2, 2, 0),
            ("cb", cb_s, cw, ch_, 1, 1, 1),
            ("cr", cr_s, cw, ch_, 1, 1, 1),
        ]
        hmax = vmax = 2
    elif channels == 3:
        comps = [
            ("y", y_plane, width, height, 1, 1, 0),
            ("cb", cb_plane, width, height, 1, 1, 1),
            ("cr", cr_plane, width, height, 1, 1, 1),
        ]
        hmax = vmax = 1
    else:
        comps = [("y", y_plane, width, height, 1, 1, 0)]
        hmax = vmax = 1

    # --- headers ---
    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HHBB", 1, 1, 0, 0)  # density 1x1, no thumbnail
    )
    # DQT (zigzag order per spec B.2.4.1)
    for tq, qt in ([(0, qt_l)] + ([(1, qt_c)] if channels == 3 else [])):
        zz = bytes(qt[k] for k in range(64))
        out += b"\xff\xdb" + struct.pack(">H", 3 + 64) + bytes([tq]) + zz
    # SOF0 (baseline) or SOF2 (progressive)
    nf = len(comps)
    sof = struct.pack(">BHHB", 8, height, width, nf)
    for i, (_, _, _, _, ch_f, cv_f, tq) in enumerate(comps):
        sof += bytes([i + 1, (ch_f << 4) | cv_f, tq])
    out += (
        (b"\xff\xc2" if progressive else b"\xff\xc0")
        + struct.pack(">H", 2 + len(sof))
        + sof
    )
    # DHT: standard tables (luma always, chroma only for color)
    specs = [
        (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
    ]
    if channels == 3:
        specs += [
            (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
            (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
        ]
    for tc, th, bits, vals in specs:
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    dc_l = _build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _build_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _build_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _build_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    def sos_header(comp_idx, ss, se, ah, al):
        body = bytes([len(comp_idx)])
        for i in comp_idx:
            t = 0 if i == 0 else 1 if channels == 3 else 0
            body += bytes([i + 1, (t << 4) | t])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    if progressive:
        # quantize every block up front (component raster grids)
        grids = []  # (blocks, bwc, tq, units_x, units_y, ch_f, cv_f)
        for name, plane, pw, ph, ch_f, cv_f, tq in comps:
            qt = qt_l if tq == 0 else qt_c
            bwc, bhc = mcux * ch_f, mcuy * cv_f
            blocks = [
                _quantize_block(
                    _extract_block(plane, pw, ph, bx * 8, by * 8), qt
                )
                for by in range(bhc)
                for bx in range(bwc)
            ]
            ux = (width * ch_f + 8 * hmax - 1) // (8 * hmax)
            uy = (height * cv_f + 8 * vmax - 1) // (8 * vmax)
            grids.append((blocks, bwc, tq, ux, uy, ch_f, cv_f))

        mcu_list = []  # per MCU: [(ci, tq, block), ...] — decoder walk
        for my in range(mcuy):
            for mx in range(mcux):
                blks = []
                for ci, (blocks, bwc, tq, _, _, ch_f, cv_f) in enumerate(
                    grids
                ):
                    for by in range(cv_f):
                        for bx in range(ch_f):
                            blks.append(
                                (
                                    ci,
                                    tq,
                                    blocks[
                                        (my * cv_f + by) * bwc
                                        + (mx * ch_f + bx)
                                    ],
                                )
                            )
                mcu_list.append(blks)

        def chunked(units):
            """Split a scan's unit walk at restart boundaries; the
            caller emits RSTn between chunks (decoder resets preds and
            EOB-run state there)."""
            if not restart_interval:
                return [units]
            return [
                units[i : i + restart_interval]
                for i in range(0, len(units), restart_interval)
            ]

        def emit_scan(units, emit_chunk):
            for j, chunk in enumerate(chunked(units)):
                if j:
                    out.extend([0xFF, 0xD0 + ((j - 1) & 7)])
                bw = _BitWriter()
                emit_chunk(bw, chunk)
                out.extend(bw.flush())

        all_comps = list(range(nf))

        # scan 1: DC first, Al=1 (coarse DC, arithmetic shift)
        def dc_first(bw, mcus):
            preds = [0] * nf  # fresh per restart segment
            for blks in mcus:
                for ci, tq, blk in blks:
                    v = blk[0] >> 1
                    diff = v - preds[ci]
                    preds[ci] = v
                    s = _category(diff)
                    code, ln = (dc_l if tq == 0 else dc_c)[s]
                    bw.write(code, ln)
                    if s:
                        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)

        out += sos_header(all_comps, 0, 0, 0, 1)
        emit_scan(mcu_list, dc_first)

        # scan 2: DC refinement, Al=0 (one raw bit per block)
        def dc_refine(bw, mcus):
            for blks in mcus:
                for _ci, _tq, blk in blks:
                    bw.write(blk[0] & 1, 1)

        out += sos_header(all_comps, 0, 0, 1, 0)
        emit_scan(mcu_list, dc_refine)

        # per component: AC bands at Al=1, then full-band refinement
        for ci, (blocks, bwc, tq, ux, uy, _, _) in enumerate(grids):
            ac = ac_l if tq == 0 else ac_c
            order = [
                blocks[y * bwc + x] for y in range(uy) for x in range(ux)
            ]
            for ss_, se_ in ((1, 5), (6, 63)):
                out += sos_header([ci], ss_, se_, 0, 1)
                emit_scan(
                    order,
                    lambda bw, ch, ss_=ss_, se_=se_: _emit_ac_first(
                        bw, ch, ac, ss_, se_, 1
                    ),
                )
            out += sos_header([ci], 1, 63, 1, 0)
            emit_scan(
                order,
                lambda bw, ch: _emit_ac_refine(bw, ch, ac, 1, 63, 0),
            )
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    # --- baseline: single interleaved scan ---
    out += sos_header(list(range(nf)), 0, 63, 0, 0)
    bw = _BitWriter()
    preds = {name: 0 for name, *_ in comps}
    rst = 0
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                out += bw.flush()
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                for k in preds:
                    preds[k] = 0
            mcu_i += 1
            for name, plane, pw, ph, ch_f, cv_f, tq in comps:
                qt = qt_l if tq == 0 else qt_c
                dc = dc_l if tq == 0 else dc_c
                ac = ac_l if tq == 0 else ac_c
                for by in range(cv_f):
                    for bx in range(ch_f):
                        tile = _extract_block(
                            plane, pw, ph,
                            (mx * ch_f + bx) * 8, (my * cv_f + by) * 8,
                        )
                        qblock = _quantize_block(tile, qt)
                        preds[name] = _encode_block(
                            bw, qblock, preds[name], dc, ac
                        )
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)
