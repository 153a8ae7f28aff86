"""Minimal from-spec FLAC *encoder* for decoder known-answer tests.

Independently written against RFC 9639 — shares no code with the
decoder under test (functions/flac_codec.py) and makes the opposite
choice at every syntax fork the spec allows, so a shared misreading
would desync rather than silently agree:

- block sizes use the 16-bit end-of-header code (7) even when a
  common code exists; the decoder must handle both (fixture streams
  with common codes are crafted explicitly in the tests);
- the sample rate uses explicit end-of-header codes (13/14) rather
  than the STREAMINFO-implied 0;
- the bit depth is written explicitly when the depth has a code;
- variable blocking strategy (sample-number coded numbers) instead of
  the fixed strategy most encoders default to;
- CRCs are computed by a table-free bitwise loop (the decoder uses a
  table for CRC-16).

The embedded STREAMINFO MD5 — computed here from the INPUT samples —
is the oracle: the decoder recomputes it from its OUTPUT, so any
sample-level disagreement between the two implementations fails
loudly.
"""

import hashlib
import struct


def _crc_generic(data: bytes, width: int, poly: int) -> int:
    crc = 0
    mask = (1 << width) - 1
    top = 1 << (width - 1)
    for byte in data:
        for i in range(7, -1, -1):
            bit = (byte >> i) & 1
            fb = ((crc & top) >> (width - 1)) ^ bit
            crc = ((crc << 1) & mask) ^ (poly if fb else 0)
    return crc


def crc8_bitwise(data: bytes) -> int:
    return _crc_generic(data, 8, 0x07)


def crc16_bitwise(data: bytes) -> int:
    return _crc_generic(data, 16, 0x8005)


class BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        assert 0 <= value < (1 << n), (value, n)
        self.acc = (self.acc << n) | value
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, n: int):
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


def _audio_md5(channels_data, bits: int) -> bytes:
    width = (bits + 7) // 8
    buf = bytearray()
    n = len(channels_data[0])
    for i in range(n):
        for ch in channels_data:
            buf += int(ch[i]).to_bytes(width, "little", signed=True)
    return hashlib.md5(bytes(buf)).digest()


def _coded_number(value: int) -> bytes:
    """UTF-8-style coded number, up to 36 bits."""
    if value < 0x80:
        return bytes([value])
    # determine continuation count from bit length
    for n in range(1, 7):
        if value.bit_length() <= 6 * n + (6 - n):
            break
    head_bits = 6 - n
    lead = (0xFF << (head_bits + 1)) & 0xFF
    parts = []
    v = value
    for _ in range(n):
        parts.append(0x80 | (v & 0x3F))
        v >>= 6
    parts.reverse()
    return bytes([lead | v]) + bytes(parts)


def _rice_write(bw: BitWriter, resid, param: int):
    for r in resid:
        u = (abs(r) << 1) - (1 if r < 0 else 0)  # zigzag
        bw.write_unary(u >> param)
        if param:
            bw.write(u & ((1 << param) - 1), param)


def _best_rice_param(resid) -> int:
    best, best_cost = 0, None
    for p in range(15):
        cost = 0
        for r in resid:
            u = (abs(r) << 1) - (1 if r < 0 else 0)
            cost += (u >> p) + 1 + p
            if best_cost is not None and cost > best_cost:
                break
        if best_cost is None or cost < best_cost:
            best, best_cost = p, cost
    return best


def _write_residual(bw: BitWriter, resid, *, escape_raw=None,
                    partition_order=0, order=0, block_size=0):
    """method 0 (4-bit Rice); escape_raw forces raw-binary partitions
    of the given bit width."""
    bw.write(0, 2)
    bw.write(partition_order, 4)
    nparts = 1 << partition_order
    idx = 0
    for part in range(nparts):
        n = (block_size >> partition_order) - (order if part == 0 else 0)
        chunk = resid[idx : idx + n]
        idx += n
        if escape_raw is not None:
            bw.write(15, 4)
            bw.write(escape_raw, 5)
            if escape_raw:
                for r in chunk:
                    bw.write_signed(r, escape_raw)
        else:
            param = _best_rice_param(chunk)
            bw.write(param, 4)
            _rice_write(bw, chunk, param)
    assert idx == len(resid)


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _write_subframe(bw: BitWriter, samples, bits: int, mode,
                    wasted=0, escape_raw=None, partition_order=0,
                    lpc=None):
    bw.write(0, 1)
    eff = bits - wasted
    shifted = [s >> wasted for s in samples]
    if wasted:
        assert all(s == (v << wasted) for s, v in zip(samples, shifted))
    if mode == "constant":
        assert len(set(samples)) == 1
        bw.write(0, 6)
        _write_wasted(bw, wasted)
        bw.write_signed(shifted[0], eff)
    elif mode == "verbatim":
        bw.write(1, 6)
        _write_wasted(bw, wasted)
        for s in shifted:
            bw.write_signed(s, eff)
    elif isinstance(mode, tuple) and mode[0] == "fixed":
        order = mode[1]
        coefs = _FIXED_COEFS[order]
        bw.write(8 + order, 6)
        _write_wasted(bw, wasted)
        for s in shifted[:order]:
            bw.write_signed(s, eff)
        resid = [
            shifted[i] - sum(c * shifted[i - 1 - j]
                             for j, c in enumerate(coefs))
            for i in range(order, len(shifted))
        ]
        _write_residual(bw, resid, escape_raw=escape_raw,
                        partition_order=partition_order, order=order,
                        block_size=len(samples))
    elif mode == "lpc":
        order, prec, shift, coefs = lpc
        bw.write(32 + order - 1, 6)
        _write_wasted(bw, wasted)
        for s in shifted[:order]:
            bw.write_signed(s, eff)
        bw.write(prec - 1, 4)
        bw.write_signed(shift, 5)
        for c in coefs:
            bw.write_signed(c, prec)
        resid = []
        for i in range(order, len(shifted)):
            acc = sum(coefs[j] * shifted[i - 1 - j] for j in range(order))
            resid.append(shifted[i] - (acc >> shift))
        _write_residual(bw, resid, escape_raw=escape_raw,
                        partition_order=partition_order, order=order,
                        block_size=len(samples))
    else:
        raise AssertionError(mode)


def _write_wasted(bw: BitWriter, wasted: int):
    if wasted:
        bw.write(1, 1)
        bw.write_unary(wasted - 1)
    else:
        bw.write(0, 1)


_SS_CODES = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}


def encode_flac(channels_data, rate: int, bits: int, *,
                block_size=64, modes=None, stereo="independent",
                wasted=0, escape_raw=None, partition_order=0,
                lpc=None, blocksize_code="explicit16",
                omit_md5=False) -> bytes:
    """Author a FLAC stream.  ``channels_data``: per-channel sample
    lists (equal lengths).  ``modes``: per-frame subframe mode (cycled;
    default fixed order 2).  ``stereo``: independent / left_side /
    right_side / mid_side (2 channels only)."""
    n_ch = len(channels_data)
    total = len(channels_data[0])
    assert all(len(c) == total for c in channels_data)
    modes = modes or [("fixed", 2)]

    out = bytearray(b"fLaC")
    si = bytearray()
    si += struct.pack(">HH", block_size, block_size)
    si += b"\x00\x00\x00" * 2  # min/max frame size unknown
    packed = (rate << 44) | ((n_ch - 1) << 41) | ((bits - 1) << 36) | total
    si += packed.to_bytes(8, "big")
    si += b"\x00" * 16 if omit_md5 else _audio_md5(channels_data, bits)
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + bytes(si)

    sample_pos = 0
    frame_idx = 0
    while sample_pos < total:
        n = min(block_size, total - sample_pos)
        chans = [c[sample_pos : sample_pos + n] for c in channels_data]
        mode = modes[frame_idx % len(modes)]

        bw = BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(1, 1)  # variable blocking: coded number = sample no.
        if blocksize_code == "explicit16":
            bw.write(7, 4)
        elif blocksize_code == "explicit8":
            assert n <= 256
            bw.write(6, 4)
        else:  # a common code; caller guarantees it matches n
            bw.write(blocksize_code, 4)
        # sample rate: tens-of-Hz code when it fits, else Hz code
        if rate % 10 == 0 and rate // 10 < 65536:
            sr_code, sr_field, sr_bits = 14, rate // 10, 16
        else:
            sr_code, sr_field, sr_bits = 13, rate, 16
        bw.write(sr_code, 4)
        if stereo == "independent":
            bw.write(n_ch - 1, 4)
        else:
            assert n_ch == 2
            bw.write(
                {"left_side": 8, "right_side": 9, "mid_side": 10}[stereo],
                4,
            )
        bw.write(_SS_CODES.get(bits, 0), 3)
        bw.write(0, 1)
        for b in _coded_number(sample_pos):
            bw.write(b, 8)
        if blocksize_code == "explicit16":
            bw.write(n - 1, 16)
        elif blocksize_code == "explicit8":
            bw.write(n - 1, 8)
        bw.write(sr_field, sr_bits)
        bw.align()
        hdr = bw.bytes()
        hdr += bytes([crc8_bitwise(hdr)])

        # a frame shorter than the predictor order cannot carry it —
        # real encoders fall back; verbatim always fits
        frame_mode = mode
        if isinstance(mode, tuple) and mode[0] == "fixed" and mode[1] > n:
            frame_mode = "verbatim"
        if mode == "lpc" and lpc[0] > n:
            frame_mode = "verbatim"

        body = BitWriter()
        if stereo == "independent":
            subchans = [(c, bits) for c in chans]
        elif stereo == "left_side":
            left, right = chans
            side = [l - r for l, r in zip(left, right)]
            subchans = [(left, bits), (side, bits + 1)]
        elif stereo == "right_side":
            left, right = chans
            side = [l - r for l, r in zip(left, right)]
            subchans = [(side, bits + 1), (right, bits)]
        else:  # mid_side
            left, right = chans
            side = [l - r for l, r in zip(left, right)]
            mid = [(l + r) >> 1 for l, r in zip(left, right)]
            subchans = [(mid, bits), (side, bits + 1)]
        for cdata, cbits in subchans:
            _write_subframe(body, cdata, cbits, frame_mode, wasted=wasted,
                            escape_raw=escape_raw,
                            partition_order=partition_order, lpc=lpc)
        body.align()
        frame = hdr + body.bytes()
        frame += struct.pack(">H", crc16_bitwise(frame))
        out += frame
        sample_pos += n
        frame_idx += 1
    return bytes(out)
