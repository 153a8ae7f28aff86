"""From-spec FLAC decoder — RFC 9639 (the IETF FLAC specification).

Decodes the full FLAC subset a lossless audio corpus carries: all
metadata blocks (STREAMINFO parsed, others skipped by length), frames
with fixed or variable blocking, all four channel assignments
(independent, left/side, right/side, mid/side), constant / verbatim /
fixed-predictor (orders 0-4) / LPC (orders 1-32) subframes, wasted
bits, both Rice residual methods (4- and 5-bit parameters) including
escaped raw-binary partitions, and bit depths 8/12/16/20/24/32.

Integrity is verified at three levels, all mandated by the spec:
frame-header CRC-8 (poly 0x07), whole-frame CRC-16 (poly 0x8005), and
the STREAMINFO MD5 of the unencoded audio — the last one makes every
FLAC file authored by ANY compliant encoder a self-carrying
known-answer test, which tests/test_flac_codec.py exploits: an
independently-written minimal encoder (tests/flac_craft.py) authors
streams whose embedded MD5 the decoder must reproduce sample-exactly.

Section references in comments are to RFC 9639.  Malformed input
raises ``ValueError``; the only capability gates are rejected by name
(sample rates/bit depths a stream cannot legally omit).  Like the
image codecs, pure-Python throughput is priced in SCALE.md and the
production swap is the decode_media ``decoder=`` seam.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

#: allocation guard for untrusted headers (mirrors _MAX_PIXELS /
#: _MAX_SAMPLES in the sibling codecs)
_MAX_TOTAL_SAMPLES = 1 << 28

_BLOCKSIZE_BASE = {1: 192}
for _n in range(2, 6):
    _BLOCKSIZE_BASE[_n] = 576 << (_n - 2)
for _n in range(8, 16):
    _BLOCKSIZE_BASE[_n] = 256 << (_n - 8)

_SAMPLE_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}

_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc8(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — section 9.1.1."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else crc << 1
    return crc


def _crc16_table():
    table = []
    for i in range(256):
        crc = i << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
        table.append(crc)
    return table


_CRC16_TABLE = _crc16_table()


def _crc16(data: bytes) -> int:
    """CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 — section 9.3."""
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ _CRC16_TABLE[(crc >> 8) ^ b]
    return crc


class _BitReader:
    """MSB-first bit reader over a bytes buffer."""

    __slots__ = ("data", "pos", "bitbuf", "bitcnt")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.bitcnt = 0

    def bits(self, n: int) -> int:
        while self.bitcnt < n:
            self.bitbuf = (self.bitbuf << 8) | self.data[self.pos]
            self.pos += 1
            self.bitcnt += 8
        self.bitcnt -= n
        v = self.bitbuf >> self.bitcnt
        self.bitbuf &= (1 << self.bitcnt) - 1
        return v

    def sbits(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        n = 0
        while self.bits(1) == 0:
            n += 1
            if n > 1 << 24:
                raise ValueError("FLAC: runaway unary code")
        return n

    def align(self):
        self.bitcnt -= self.bitcnt % 8
        self.bitbuf &= (1 << self.bitcnt) - 1

    def byte_pos(self) -> int:
        return self.pos - self.bitcnt // 8


def is_flac(data: bytes) -> bool:
    return data[:4] == b"fLaC"


class _StreamInfo:
    __slots__ = ("min_block", "max_block", "sample_rate", "channels",
                 "bits", "total_samples", "md5")


def _parse_metadata(data: bytes) -> tuple[_StreamInfo, int]:
    """Parse the metadata section; return (STREAMINFO, audio offset)."""
    if not is_flac(data):
        raise ValueError("FLAC: missing fLaC magic")
    pos = 4
    info = None
    last = False
    while not last:
        if pos + 4 > len(data):
            raise ValueError("FLAC: truncated metadata header")
        hdr = data[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        (length,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + length]
        if len(body) < length:
            raise ValueError("FLAC: truncated metadata block")
        if btype == 0:  # STREAMINFO (section 8.2)
            if length < 34:
                raise ValueError("FLAC: short STREAMINFO")
            si = _StreamInfo()
            si.min_block, si.max_block = struct.unpack(">HH", body[:4])
            packed = int.from_bytes(body[10:18], "big")
            si.sample_rate = packed >> 44
            si.channels = ((packed >> 41) & 0x7) + 1
            si.bits = ((packed >> 36) & 0x1F) + 1
            si.total_samples = packed & ((1 << 36) - 1)
            si.md5 = body[18:34]
            info = si
        elif btype == 127:
            raise ValueError("FLAC: invalid metadata block type 127")
        pos += 4 + length
    if info is None:
        raise ValueError("FLAC: STREAMINFO must be the first block")
    if info.sample_rate == 0:
        raise ValueError("FLAC: zero sample rate in STREAMINFO")
    if info.total_samples * info.channels > _MAX_TOTAL_SAMPLES:
        raise ValueError("FLAC: stream exceeds sample allocation guard")
    return info, pos


def _read_coded_number(br: _BitReader) -> int:
    """The UTF-8-style frame/sample number (section 9.1.5)."""
    b0 = br.bits(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise ValueError("FLAC: bad coded-number prefix")
    val = b0 & (mask - 1)
    for _ in range(n):
        c = br.bits(8)
        if c & 0xC0 != 0x80:
            raise ValueError("FLAC: bad coded-number continuation")
        val = (val << 6) | (c & 0x3F)
    return val


def _decode_residual(br: _BitReader, block_size: int, order: int):
    """Rice-coded residual (section 9.2.7) -> list of ints.

    The unary-quotient + k-bit-remainder inner loop dominates whole-
    stream decode time, so it runs on LOCAL bit-state (data/pos/acc/
    nbits) instead of BitReader method calls — measured ~2.5x on the
    1-second-stereo profile; the rare escape path syncs back to the
    reader object."""
    method = br.bits(2)
    if method > 1:
        raise ValueError(f"FLAC: reserved residual method {method}")
    plen = 4 + method
    escape = (1 << plen) - 1
    porder = br.bits(4)
    if block_size % (1 << porder):
        raise ValueError("FLAC: partition order does not divide block")
    out = []
    append = out.append
    data = br.data
    for part in range(1 << porder):
        n = (block_size >> porder) - (order if part == 0 else 0)
        if n < 0:
            raise ValueError("FLAC: predictor order exceeds partition")
        param = br.bits(plen)
        if param == escape:
            raw = br.bits(5)
            if raw == 0:
                out.extend([0] * n)
            else:
                out.extend(br.sbits(raw) for _ in range(n))
            continue
        pos = br.pos
        acc = br.bitbuf
        nbits = br.bitcnt
        k = param
        kmask = (1 << k) - 1
        for _ in range(n):
            q = 0
            while True:  # unary quotient: count zeros to the next 1
                if nbits == 0:
                    acc = data[pos]
                    pos += 1
                    nbits = 8
                if acc == 0:
                    q += nbits
                    nbits = 0
                    if q > 1 << 24:
                        raise ValueError("FLAC: runaway unary code")
                    continue
                top = acc.bit_length()
                q += nbits - top
                nbits = top - 1
                acc &= (1 << nbits) - 1
                break
            while nbits < k:
                acc = (acc << 8) | data[pos]
                pos += 1
                nbits += 8
            nbits -= k
            u = (q << k) | (acc >> nbits)
            acc &= (1 << nbits) - 1
            append((u >> 1) ^ -(u & 1))
        br.pos = pos
        br.bitbuf = acc
        br.bitcnt = nbits
    return out


def _decode_subframe(br: _BitReader, block_size: int, bits: int):
    """One subframe (section 9.2) -> list of ints at `bits` depth."""
    if br.bits(1):
        raise ValueError("FLAC: subframe padding bit set")
    stype = br.bits(6)
    wasted = 0
    if br.bits(1):
        wasted = br.unary() + 1
    eff = bits - wasted
    if eff <= 0:
        raise ValueError("FLAC: wasted bits consume the whole sample")
    if stype == 0:  # CONSTANT
        samples = [br.sbits(eff)] * block_size
    elif stype == 1:  # VERBATIM
        samples = [br.sbits(eff) for _ in range(block_size)]
    elif 8 <= stype <= 12:  # FIXED, order 0-4 (section 9.2.5)
        order = stype - 8
        if order > block_size:
            raise ValueError("FLAC: fixed order exceeds block size")
        samples = [br.sbits(eff) for _ in range(order)]
        resid = _decode_residual(br, block_size, order)
        if order == 0:
            samples = resid
        elif order == 1:
            for r in resid:
                samples.append(r + samples[-1])
        elif order == 2:
            for r in resid:
                samples.append(r + 2 * samples[-1] - samples[-2])
        elif order == 3:
            for r in resid:
                samples.append(
                    r + 3 * samples[-1] - 3 * samples[-2] + samples[-3]
                )
        else:
            for r in resid:
                samples.append(
                    r + 4 * samples[-1] - 6 * samples[-2]
                    + 4 * samples[-3] - samples[-4]
                )
    elif stype >= 32:  # LPC, order 1-32 (section 9.2.6)
        order = (stype & 0x1F) + 1
        if order > block_size:
            raise ValueError("FLAC: LPC order exceeds block size")
        samples = [br.sbits(eff) for _ in range(order)]
        prec = br.bits(4) + 1
        if prec == 16:
            raise ValueError("FLAC: invalid LPC precision code 15")
        shift = br.sbits(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coefs = [br.sbits(prec) for _ in range(order)]
        resid = _decode_residual(br, block_size, order)
        for r in resid:
            acc = 0
            base = len(samples)
            for j in range(order):
                acc += coefs[j] * samples[base - 1 - j]
            samples.append(r + (acc >> shift))
    else:
        raise ValueError(f"FLAC: reserved subframe type {stype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac_full(data: bytes):
    """Decode a whole FLAC stream.

    Returns ``(rate, channels, bits, samples, md5_ok)`` — ``samples``
    interleaved at native depth, ``md5_ok`` True when the STREAMINFO
    MD5 matches the decoded audio (None when the encoder left it
    unset, which the spec permits)."""
    try:
        return _decode_flac_full(data)
    except (IndexError, struct.error) as e:
        raise ValueError(f"FLAC: corrupt or truncated stream ({e})") from e


def _decode_flac_full(data: bytes):
    info, pos = _parse_metadata(data)
    channels = info.channels
    out = []
    remaining = info.total_samples if info.total_samples else None
    while pos < len(data):
        if remaining is not None and remaining <= 0:
            break
        frame, pos = _decode_frame(data, pos, info)
        out.extend(frame)
        if remaining is not None:
            remaining -= len(frame) // channels
        if len(out) > _MAX_TOTAL_SAMPLES:
            raise ValueError("FLAC: stream exceeds sample allocation guard")
    if remaining is not None and remaining > 0:
        raise ValueError("FLAC: stream ends before total_samples")
    if info.total_samples:
        out = out[: info.total_samples * channels]
    md5_ok = None
    if info.md5 != b"\x00" * 16:
        md5_ok = _audio_md5(out, info.bits) == info.md5
    return info.sample_rate, channels, info.bits, out, md5_ok


def _audio_md5(samples, bits: int) -> bytes:
    """STREAMINFO MD5: the unencoded audio as little-endian signed
    samples of ceil(bits/8) bytes, interleaved (section 8.2)."""
    width = (bits + 7) // 8
    arr = np.asarray(samples, dtype=np.int64)
    if width == 1:
        buf = arr.astype(np.int8).tobytes()
    elif width == 2:
        buf = arr.astype("<i2").tobytes()
    elif width == 3:
        full = arr.astype("<i4").tobytes()
        b = np.frombuffer(full, dtype=np.uint8).reshape(-1, 4)
        buf = b[:, :3].tobytes()
    else:
        buf = arr.astype("<i4").tobytes()
    return hashlib.md5(buf).digest()


def _decode_frame(data: bytes, pos: int, info: _StreamInfo):
    """One frame starting at byte `pos` -> (interleaved samples, end)."""
    hdr_start = pos
    if pos + 2 > len(data):
        raise ValueError("FLAC: truncated frame header")
    sync = (data[pos] << 6) | (data[pos + 1] >> 2)
    if sync != 0x3FFE:
        raise ValueError("FLAC: lost frame sync")
    br = _BitReader(data, pos)
    br.bits(14)
    if br.bits(1):
        raise ValueError("FLAC: reserved frame-header bit set")
    br.bits(1)  # blocking strategy (informational here)
    bs_code = br.bits(4)
    sr_code = br.bits(4)
    ch_code = br.bits(4)
    ss_code = br.bits(3)
    if br.bits(1):
        raise ValueError("FLAC: reserved frame-header bit set")
    _read_coded_number(br)
    if bs_code == 0:
        raise ValueError("FLAC: reserved block size code 0")
    elif bs_code == 6:
        block_size = br.bits(8) + 1
    elif bs_code == 7:
        block_size = br.bits(16) + 1
    else:
        block_size = _BLOCKSIZE_BASE[bs_code]
    if sr_code == 0:
        pass  # STREAMINFO rate
    elif sr_code in _SAMPLE_RATES:
        if _SAMPLE_RATES[sr_code] != info.sample_rate:
            raise ValueError("FLAC: frame sample rate contradicts stream")
    elif sr_code == 12:
        br.bits(8)
    elif sr_code in (13, 14):
        br.bits(16)
    else:
        raise ValueError("FLAC: invalid sample rate code 15")
    if ch_code <= 7:
        n_ch = ch_code + 1
        assignment = "independent"
    elif ch_code in (8, 9, 10):
        n_ch = 2
        assignment = {8: "left_side", 9: "right_side", 10: "mid_side"}[
            ch_code
        ]
    else:
        raise ValueError(f"FLAC: reserved channel assignment {ch_code}")
    if n_ch != info.channels:
        raise ValueError("FLAC: frame channels contradict STREAMINFO")
    if ss_code == 0:
        bits = info.bits
    elif ss_code in _SAMPLE_SIZES:
        bits = _SAMPLE_SIZES[ss_code]
        if bits != info.bits:
            raise ValueError("FLAC: frame bit depth contradicts stream")
    else:
        raise ValueError("FLAC: reserved sample size code 3")
    hdr_end = br.byte_pos()
    crc8 = br.bits(8)
    if _crc8(data[hdr_start:hdr_end]) != crc8:
        raise ValueError("FLAC: frame header CRC-8 mismatch")

    chans = []
    for ch in range(n_ch):
        ch_bits = bits
        if (
            (assignment == "left_side" and ch == 1)
            or (assignment == "right_side" and ch == 0)
            or (assignment == "mid_side" and ch == 1)
        ):
            ch_bits += 1  # the side channel carries one extra bit
        chans.append(_decode_subframe(br, block_size, ch_bits))
    br.align()
    frame_end = br.byte_pos()
    if frame_end + 2 > len(data):
        raise ValueError("FLAC: truncated frame CRC-16")
    (crc16,) = struct.unpack(">H", data[frame_end : frame_end + 2])
    if _crc16(data[hdr_start:frame_end]) != crc16:
        raise ValueError("FLAC: frame CRC-16 mismatch")

    # stereo decorrelation (section 4.2) — vectorized; sample values
    # fit comfortably in int64 for every legal bit depth
    if assignment == "left_side":
        left = np.asarray(chans[0], dtype=np.int64)
        side = np.asarray(chans[1], dtype=np.int64)
        chans = [left, left - side]
    elif assignment == "right_side":
        side = np.asarray(chans[0], dtype=np.int64)
        right = np.asarray(chans[1], dtype=np.int64)
        chans = [right + side, right]
    elif assignment == "mid_side":
        mid = np.asarray(chans[0], dtype=np.int64)
        side = np.asarray(chans[1], dtype=np.int64)
        m2 = (mid << 1) | (side & 1)
        chans = [(m2 + side) >> 1, (m2 - side) >> 1]

    if n_ch == 1:
        interleaved = list(chans[0])
    else:
        stacked = np.empty((block_size, n_ch), dtype=np.int64)
        for ch in range(n_ch):
            stacked[:, ch] = chans[ch]
        interleaved = stacked.reshape(-1).tolist()
    return interleaved, frame_end + 2


def decode_flac(data: bytes) -> tuple[int, int, list[int]]:
    """Decode FLAC to ``(rate, channels, pcm16_samples)`` — the
    decode_media audio contract (PCM16-normalized via the same
    integer-shift convention as the other audio codecs).  Raises
    ``ValueError`` when the embedded STREAMINFO MD5 does not match the
    decoded audio (lossless means bit-exact or broken)."""
    rate, channels, bits, samples, md5_ok = decode_flac_full(data)
    if md5_ok is False:
        raise ValueError("FLAC: decoded audio fails the STREAMINFO MD5")
    arr = np.asarray(samples, dtype=np.int64)
    if bits < 16:
        arr = arr << (16 - bits)
    elif bits > 16:
        arr = arr >> (bits - 16)
    return rate, channels, arr.astype(np.int16).tolist()
