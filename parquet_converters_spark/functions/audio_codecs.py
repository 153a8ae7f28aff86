"""From-spec audio decoders: G.711 (u-law/A-law), Sun AU, AIFF/AIFC.

The engine's audio surface (decode_media + audio feature extraction)
was PCM16-WAV-only through r11 — the r11 verdict ranked broader audio
as the largest remaining multimodal hole.  This module adds the
telephony codecs and the two classic container formats from their
public specs:

- **G.711 u-law / A-law** (ITU-T G.711): 8-bit logarithmic companding,
  decoded by 256-entry tables built from the expansion formulas.  The
  16-bit scaling matches the de-facto reference implementations
  (CPython ``audioop``/sox ``st_*law2linear16`` and the JDK's
  ``javax.sound`` converters): u-law peaks at +/-32124, A-law at
  +/-32256 — crossvalidated for all 256 code bytes in
  tests/test_audio_codecs.py.
- **Sun AU** (the ``.snd`` header documented with every ``man au``):
  big-endian header, u-law / A-law / linear PCM 8/16/24/32 payloads.
- **AIFF / AIFC** (Apple "Audio Interchange File Format" EA IFF 85):
  COMM + SSND chunks, 80-bit extended-precision sample rate, PCM
  8/16/24/32; AIFC compression types ``NONE``/``sowt`` (byte-swapped
  PCM16) / ``ulaw``/``ALAW`` decode, others are rejected by name.

Every decoder returns ``(sample_rate, channels, samples)`` with
``samples`` interleaved and normalized to PCM16 — 8-bit widens by <<8,
24/32-bit truncate their low bits: the integer-shift convention of
CPython ``audioop`` / sox, against which crossvalidation is EXACT.
(The JDK's ``javax.sound`` renormalizes depth conversions through
float instead, agreeing exactly on PCM16 and G.711 and within one
narrow-width LSB elsewhere — both oracles are asserted in
tests/test_audio_codecs.py.)  Malformed input raises ``ValueError``;
unsupported-by-name modes raise ``NotImplementedError`` naming the
mode (the untrusted-corpus decoder contract shared by the image
codecs).

Like the image codecs, pure-Python throughput is priced in SCALE.md
and the production swap is the ``decode_media(decoder=...)`` seam —
``jdk_sound_media_decoder`` (functions/native_codecs.py) routes these
formats through a persistent ``javax.sound.sampled`` bridge.
"""

from __future__ import annotations

import struct

import numpy as np


def _build_ulaw_table() -> np.ndarray:
    # ITU-T G.711 u-law expansion: invert, split sign/exponent/mantissa,
    # reconstruct the 14-bit magnitude on the 16-bit grid (bias 0x84)
    out = np.empty(256, dtype=np.int16)
    for b in range(256):
        u = ~b & 0xFF
        exp = (u >> 4) & 0x07
        mant = u & 0x0F
        s = (((mant << 3) + 0x84) << exp) - 0x84
        out[b] = -s if u & 0x80 else s
    return out


def _build_alaw_table() -> np.ndarray:
    # ITU-T G.711 A-law expansion: XOR 0x55, 13-bit magnitude scaled
    # to 16 bits; a SET sign bit means positive in A-law
    out = np.empty(256, dtype=np.int16)
    for b in range(256):
        a = b ^ 0x55
        exp = (a >> 4) & 0x07
        mant = a & 0x0F
        if exp == 0:
            s = (mant << 4) + 8
        else:
            s = ((mant << 4) + 0x108) << (exp - 1)
        out[b] = s if a & 0x80 else -s
    return out


ULAW_TABLE = _build_ulaw_table()
ALAW_TABLE = _build_alaw_table()

#: allocation guard for untrusted headers (mirrors the image codecs'
#: _MAX_PIXELS): 2^28 samples = 512 MiB of PCM16, far past any test or
#: bench input, cheap insurance against hostile length fields
_MAX_SAMPLES = 1 << 28


def decode_g711(data: bytes, law: str) -> list[int]:
    """Expand G.711 companded bytes to PCM16 (``law``: 'ulaw'/'alaw')."""
    table = {"ulaw": ULAW_TABLE, "alaw": ALAW_TABLE}[law]
    return table[np.frombuffer(data, dtype=np.uint8)].tolist()


_ULAW_SEG_END = np.array(
    [0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF], dtype=np.int64
)
_ALAW_SEG_END = np.array(
    [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF], dtype=np.int64
)


def encode_g711(samples, law: str) -> bytes:
    """Compress PCM16 samples to G.711 bytes (``law``: 'ulaw'/'alaw').

    The ITU-T G.711 segment-compand algorithm, vectorized; agrees with
    CPython ``audioop.lin2ulaw``/``lin2alaw`` (the C sox-derived
    reference) for every 16-bit input value
    (tests/test_audio_codecs.py sweeps all 65536)."""
    s = np.asarray(samples, dtype=np.int64)
    if law == "ulaw":
        v = s >> 2  # compand in the 14-bit domain
        neg = v < 0
        mask = np.where(neg, 0x7F, 0xFF)
        mag = np.minimum(np.where(neg, -v, v), 8159) + 33  # bias 0x84>>2
        seg = np.searchsorted(_ULAW_SEG_END, mag, side="left")
        uval = (seg << 4) | ((mag >> (seg + 1)) & 0xF)
        out = np.where(seg >= 8, 0x7F, uval) ^ mask
    elif law == "alaw":
        v = s >> 3  # compand in the 13-bit domain
        neg = v < 0
        mask = np.where(neg, 0x55, 0xD5)
        mag = np.where(neg, -v - 1, v)
        seg = np.searchsorted(_ALAW_SEG_END, mag, side="left")
        low = np.where(
            seg < 2, (mag >> 1) & 0xF, (mag >> np.maximum(seg, 1)) & 0xF
        )
        out = np.where(seg >= 8, 0x7F, (seg << 4) | low) ^ mask
    else:
        raise ValueError(f"G.711: unknown law {law!r}")
    return out.astype(np.uint8).tobytes()


def encode_wav_g711(sample_rate: int, samples, law: str,
                    channels: int = 1) -> bytes:
    """A G.711 RIFF/WAVE file (format tag 7 u-law / 6 A-law) from
    PCM16 samples — the companion sink to decode_wav's G.711 legs."""
    payload = encode_g711(samples, law)
    tag = {"ulaw": 7, "alaw": 6}[law]
    fmt = struct.pack(
        "<HHIIHH", tag, channels, sample_rate, sample_rate * channels,
        channels, 8,
    ) + struct.pack("<H", 0)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _pcm_to_16(body: bytes, bits: int, big_endian: bool,
               unsigned8: bool = False) -> list[int]:
    """Normalize linear PCM of any standard depth to PCM16."""
    if bits == 8:
        if unsigned8:  # WAV convention: 8-bit is unsigned, offset 128
            arr = np.frombuffer(body, dtype=np.uint8).astype(np.int16)
            arr -= 128
        else:  # AU/AIFF convention: 8-bit is signed linear
            arr = np.frombuffer(body, dtype=np.int8).astype(np.int16)
        return (arr << 8).tolist()
    if bits == 16:
        dt = ">i2" if big_endian else "<i2"
        n = len(body) // 2
        return np.frombuffer(body[: n * 2], dtype=dt).astype(
            np.int16
        ).tolist()
    if bits == 24:
        n = len(body) // 3
        b = np.frombuffer(body[: n * 3], dtype=np.uint8).reshape(n, 3)
        if big_endian:
            hi, mid = b[:, 0], b[:, 1]
        else:
            hi, mid = b[:, 2], b[:, 1]
        # PCM16 = top 16 of the 24: sign-carrying high byte + next byte
        return (
            (hi.astype(np.int8).astype(np.int16) << 8)
            | mid.astype(np.int16)
        ).tolist()
    if bits == 32:
        dt = ">i4" if big_endian else "<i4"
        n = len(body) // 4
        arr = np.frombuffer(body[: n * 4], dtype=dt).astype(np.int64)
        return (arr >> 16).astype(np.int16).tolist()
    raise NotImplementedError(f"PCM: unsupported sample size {bits} bits")


def _pcm_native(body: bytes, bits: int, big_endian: bool,
                unsigned8: bool = False) -> list[int]:
    """Decode linear PCM at its NATIVE depth (signed integers on the
    ``bits``-bit grid) — the lossless path ``transcode_audio``'s
    ``depth='native'`` mode rides; ``_pcm_to_16`` above remains the
    decode_media/feature interchange convention."""
    if bits == 8:
        if unsigned8:  # WAV convention: 8-bit is unsigned, offset 128
            arr = np.frombuffer(body, dtype=np.uint8).astype(np.int16)
            return (arr - 128).tolist()
        return np.frombuffer(body, dtype=np.int8).tolist()
    if bits == 16:
        dt = ">i2" if big_endian else "<i2"
        n = len(body) // 2
        return np.frombuffer(body[: n * 2], dtype=dt).astype(
            np.int64).tolist()
    if bits == 24:
        n = len(body) // 3
        b = np.frombuffer(body[: n * 3], dtype=np.uint8).reshape(n, 3)
        if big_endian:
            hi, mid, lo = b[:, 0], b[:, 1], b[:, 2]
        else:
            hi, mid, lo = b[:, 2], b[:, 1], b[:, 0]
        return (
            (hi.astype(np.int8).astype(np.int64) << 16)
            | (mid.astype(np.int64) << 8) | lo.astype(np.int64)
        ).tolist()
    if bits == 32:
        dt = ">i4" if big_endian else "<i4"
        n = len(body) // 4
        return np.frombuffer(body[: n * 4], dtype=dt).astype(
            np.int64).tolist()
    raise NotImplementedError(f"PCM: unsupported sample size {bits} bits")


def _native_to_16(samples: list[int], bits: int) -> list[int]:
    """Native-depth signed samples -> the PCM16 interchange grid (the
    integer-shift convention _pcm_to_16 documents)."""
    if bits == 16:
        return samples
    arr = np.asarray(samples, dtype=np.int64)
    if bits < 16:
        return (arr << (16 - bits)).tolist()
    return (arr >> (bits - 16)).tolist()


def _pack_pcm(samples, bits: int, big_endian: bool,
              unsigned8: bool = False, fmt_name: str = "PCM",
              channels: int = 1) -> bytes:
    """Range-check and pack native-depth signed samples (8/16/24/32)
    — the shared body writer for the WAV/AU/AIFF sinks (inverse of
    _pcm_native).  Rejects ragged interleaving (size not divisible by
    ``channels``) so a header's frame count can never disagree with
    the body it describes (r13 ADVICE; mirrors encode_flac's check)."""
    if bits not in (8, 16, 24, 32):
        raise ValueError(f"{fmt_name}: unsupported bit depth {bits}")
    if channels < 1:
        raise ValueError(f"{fmt_name}: channels must be >= 1")
    arr = np.asarray(samples, dtype=np.int64)
    if arr.size % channels:
        raise ValueError(
            f"{fmt_name}: {arr.size} samples not divisible by "
            f"{channels} channels"
        )
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    if arr.size and (int(arr.min()) < lo or int(arr.max()) > hi):
        raise ValueError(f"{fmt_name}: samples exceed {bits}-bit range")
    bo = ">" if big_endian else "<"
    if bits == 8:
        if unsigned8:
            return (arr + 128).astype(np.uint8).tobytes()
        return arr.astype(np.int8).tobytes()
    if bits == 16:
        return arr.astype(bo + "i2").tobytes()
    if bits == 24:
        full = arr.astype(bo + "i4").tobytes()
        b = np.frombuffer(full, dtype=np.uint8).reshape(-1, 4)
        return (b[:, 1:] if big_endian else b[:, :3]).tobytes()
    return arr.astype(bo + "i4").tobytes()


def encode_pcm_wav(sample_rate: int, samples, channels: int = 1,
                   bits: int = 16) -> bytes:
    """Canonical RIFF/WAVE writer at native depth (PCM 8/16/24/32,
    format tag 1; 8-bit written unsigned offset-128 per the WAV
    convention).  ``samples`` interleaved signed ints on the
    ``bits``-bit grid."""
    body = _pack_pcm(samples, bits, big_endian=False, unsigned8=True,
                     fmt_name="WAV", channels=channels)
    width = bits // 8
    byte_rate = sample_rate * channels * width
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      channels * width, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunks += b"\x00"  # RIFF chunks are word-aligned
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def encode_au(sample_rate: int, samples, channels: int = 1,
              bits: int = 16, law: str | None = None) -> bytes:
    """Sun AU writer: big-endian header + linear PCM 8/16/24/32 body
    (encodings 2-5), or G.711 (encoding 1 u-law / 27 A-law) when
    ``law`` is given (then ``samples`` are PCM16 and ``bits`` is
    ignored).  Crossread by the CPython stdlib ``sunau`` reader in
    tests/test_flac_encoder.py."""
    if law is not None:
        if channels < 1 or len(samples) % channels:
            raise ValueError(
                f"AU: {len(samples)} samples not divisible by "
                f"{channels} channels"
            )
        body = encode_g711(samples, law)
        enc = {"ulaw": 1, "alaw": 27}[law]
    else:
        enc = {8: 2, 16: 3, 24: 4, 32: 5}.get(bits)
        if enc is None:
            raise ValueError(f"AU: unsupported bit depth {bits}")
        body = _pack_pcm(samples, bits, big_endian=True, fmt_name="AU",
                         channels=channels)
    return (b".snd"
            + struct.pack(">IIIII", 24, len(body), enc, sample_rate,
                          channels)
            + body)


def encode_aiff(sample_rate: int, samples, channels: int = 1,
                bits: int = 16) -> bytes:
    """AIFF writer (EA IFF 85): FORM/AIFF with COMM (80-bit extended
    sample rate) + SSND, big-endian PCM 8/16/24/32.  Crossread by the
    CPython stdlib ``aifc`` reader in tests/test_flac_encoder.py."""
    body = _pack_pcm(samples, bits, big_endian=True, fmt_name="AIFF",
                     channels=channels)
    arr = np.asarray(samples, dtype=np.int64)
    # 80-bit extended-precision rate: exponent so the mantissa's top
    # bit is set (normalized), integer rates only
    if sample_rate <= 0:
        raise ValueError("AIFF: sample rate must be positive")
    shift = 63 - (sample_rate.bit_length() - 1)
    ext = struct.pack(">HQ", 16383 + 63 - shift, sample_rate << shift)
    nframes = arr.size // max(1, channels)
    comm = struct.pack(">HIH", channels, nframes, bits) + ext
    ssnd = struct.pack(">II", 0, 0) + body
    chunks = b"COMM" + struct.pack(">I", len(comm)) + comm
    chunks += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    if len(ssnd) & 1:
        chunks += b"\x00"
    return (b"FORM" + struct.pack(">I", 4 + len(chunks)) + b"AIFF"
            + chunks)


# --------------------------------------------------------------------------
# Sun AU (.snd)
# --------------------------------------------------------------------------

#: AU encoding field -> (name, handler kind).  Float encodings (6, 7)
#: and ADPCM (23-26) are rejected by name below.
_AU_PCM_BITS = {2: 8, 3: 16, 4: 24, 5: 32}


def is_au(data: bytes) -> bool:
    return data[:4] == b".snd"


def decode_au(data: bytes) -> tuple[int, int, list[int]]:
    """Decode a Sun AU file to ``(rate, channels, pcm16_samples)``."""
    rate, channels, bits, samples = decode_au_native(data)
    return rate, channels, _native_to_16(samples, bits)


def decode_au_native(data: bytes) -> tuple[int, int, int, list[int]]:
    """Decode a Sun AU file at NATIVE depth:
    ``(rate, channels, bits, samples)`` — PCM keeps its stored depth,
    G.711 expands onto the 16-bit grid (its canonical linear form)."""
    try:
        return _decode_au(data)
    except (IndexError, struct.error) as e:
        raise ValueError(f"AU: corrupt or truncated stream ({e})") from e


def _decode_au(data: bytes) -> tuple[int, int, int, list[int]]:
    if not is_au(data):
        raise ValueError("AU: missing .snd magic")
    if len(data) < 24:
        raise ValueError("AU: truncated header")
    offset, size, enc, rate, channels = struct.unpack_from(">IIIII", data, 4)
    if offset < 24 or offset > len(data):
        raise ValueError("AU: bad data offset")
    if channels == 0 or rate == 0:
        raise ValueError("AU: zero channels or sample rate")
    end = len(data) if size == 0xFFFFFFFF else min(len(data), offset + size)
    body = data[offset:end]
    if enc in (1, 27):
        width = 1  # G.711 is one code byte per sample
    elif enc in _AU_PCM_BITS:
        width = _AU_PCM_BITS[enc] // 8
    else:
        raise NotImplementedError(
            f"AU: encoding {enc} not supported (u-law=1, A-law=27, "
            "linear PCM 8/16/24/32 = 2-5 are; float/ADPCM are not)"
        )
    # guard scales by the encoding's actual bytes/sample: a 1 GiB
    # G.711 body is 2^30 samples, not 2^28 — cap SAMPLES, not bytes
    if len(body) // width > _MAX_SAMPLES:
        raise ValueError("AU: data exceeds allocation guard")
    if enc == 1:
        out_bits, samples = 16, decode_g711(body, "ulaw")
    elif enc == 27:
        out_bits, samples = 16, decode_g711(body, "alaw")
    else:
        out_bits = _AU_PCM_BITS[enc]
        samples = _pcm_native(body, out_bits, big_endian=True)
    if len(samples) % channels:
        samples = samples[: len(samples) - len(samples) % channels]
    return rate, channels, out_bits, samples


# --------------------------------------------------------------------------
# AIFF / AIFC (EA IFF 85)
# --------------------------------------------------------------------------


def is_aiff(data: bytes) -> bool:
    return data[:4] == b"FORM" and data[8:12] in (b"AIFF", b"AIFC")


def _read_extended80(b: bytes) -> int:
    """The COMM sample rate is an 80-bit IEEE 754 extended-precision
    float; audio rates are small positive integers, decoded exactly."""
    (se,) = struct.unpack(">H", b[:2])
    (mant,) = struct.unpack(">Q", b[2:10])
    exp = se & 0x7FFF
    if mant == 0 or exp == 0:
        return 0
    if exp == 0x7FFF:
        raise ValueError("AIFF: non-finite sample rate")
    # value = mant * 2^(exp - 16383 - 63); shift onto the integer grid
    shift = exp - 16383 - 63
    rate = mant << shift if shift >= 0 else mant >> -shift
    if se & 0x8000 or rate == 0 or rate > 10**9:
        raise ValueError("AIFF: unreasonable sample rate")
    return int(rate)


def decode_aiff(data: bytes) -> tuple[int, int, list[int]]:
    """Decode AIFF/AIFC to ``(rate, channels, pcm16_samples)``."""
    rate, channels, bits, samples = decode_aiff_native(data)
    return rate, channels, _native_to_16(samples, bits)


def decode_aiff_native(data: bytes) -> tuple[int, int, int, list[int]]:
    """Decode AIFF/AIFC at NATIVE depth:
    ``(rate, channels, bits, samples)`` — PCM keeps its stored depth,
    G.711 expands onto the 16-bit grid."""
    try:
        return _decode_aiff(data)
    except (IndexError, struct.error) as e:
        raise ValueError(f"AIFF: corrupt or truncated stream ({e})") from e


def _decode_aiff(data: bytes) -> tuple[int, int, int, list[int]]:
    if not is_aiff(data):
        raise ValueError("AIFF: not a FORM/AIFF file")
    is_aifc = data[8:12] == b"AIFC"
    pos = 12
    comm = ssnd = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack(">I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"COMM":
            comm = body
        elif tag == b"SSND":
            ssnd = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if comm is None or ssnd is None:
        raise ValueError("AIFF: missing COMM or SSND chunk")
    if len(comm) < 18:
        raise ValueError("AIFF: short COMM chunk")
    channels, _nframes, bits = struct.unpack(">HIH", comm[:8])
    rate = _read_extended80(comm[8:18])
    if channels == 0 or rate == 0:
        raise ValueError("AIFF: zero channels or sample rate")
    compression = b"NONE"
    if is_aifc:
        if len(comm) < 22:
            raise ValueError("AIFC: COMM missing compression type")
        compression = comm[18:22]
    if len(ssnd) < 8:
        raise ValueError("AIFF: short SSND chunk")
    (ssnd_offset,) = struct.unpack(">I", ssnd[:4])
    body = ssnd[8 + ssnd_offset :]
    comp = compression.lower().rstrip()
    if comp in (b"ulaw", b"alaw"):
        width = 1  # G.711 is one code byte per sample
    elif comp in (b"none", b"twos", b"sowt"):
        width = max(1, (bits + 7) // 8)
    else:
        raise NotImplementedError(
            f"AIFC: compression {compression!r} not supported "
            "(NONE/sowt/ulaw/ALAW are; float32/ima4/GSM are not)"
        )
    # guard scales by the compression's actual bytes/sample — a 1 GiB
    # ulaw body is 2^30 samples, not 2^28 — cap SAMPLES, not bytes
    if len(body) // width > _MAX_SAMPLES:
        raise ValueError("AIFF: data exceeds allocation guard")
    if comp in (b"none", b"twos"):  # twos = explicit big-endian PCM
        out_bits = bits
        samples = _pcm_native(body, bits, big_endian=True)
    elif comp == b"sowt":  # little-endian PCM16 ("twos" reversed)
        if bits != 16:
            raise NotImplementedError("AIFC: sowt requires 16-bit PCM")
        out_bits = 16
        samples = _pcm_native(body, 16, big_endian=False)
    elif comp == b"ulaw":
        out_bits, samples = 16, decode_g711(body, "ulaw")
    else:
        out_bits, samples = 16, decode_g711(body, "alaw")
    if len(samples) % channels:
        samples = samples[: len(samples) - len(samples) % channels]
    return rate, channels, out_bits, samples


# --------------------------------------------------------------------------
# Ogg container (RFC 3533) — demux only, for the FLAC mapping
# --------------------------------------------------------------------------

def is_ogg(data: bytes) -> bool:
    return data[:4] == b"OggS"


def ogg_packets(data: bytes, max_packets: int = 1 << 20,
                verify_crc: bool = False) -> list[bytes]:
    """Reassemble the FIRST logical stream's packets from an Ogg
    stream (RFC 3533 §6): pages are validated structurally (magic,
    version 0, sane header type), packets are rebuilt from the lacing
    values (a 255 lacing continues the packet, across pages via the
    continuation flag).  By default CRCs are not verified —
    corruption surfaces in the embedded codec's own checksum ladder
    (FLAC: CRC-8/16 + MD5), which is the stronger check;
    ``verify_crc=True`` additionally enforces each page's RFC 3533
    checksum (r15 — the engine's own mux emits real CRCs since the
    r14 ADVICE fix, and legacy zero-CRC fixtures stay readable under
    the default)."""
    if verify_crc:
        from parquet_converters_spark.functions.media_craft import (
            ogg_crc,
        )
    n = len(data)
    packets: list[bytes] = []
    cur = bytearray()
    serial = None
    p = 0
    while p + 27 <= n:
        if data[p : p + 4] != b"OggS" or data[p + 4] != 0 or \
                data[p + 5] > 7:
            raise ValueError("Ogg: bad page header")
        htype = data[p + 5]
        page_serial = int.from_bytes(data[p + 14 : p + 18], "little")
        nseg = data[p + 26]
        seg_table = data[p + 27 : p + 27 + nseg]
        body = p + 27 + nseg
        body_len = sum(seg_table)
        if body + body_len > n:
            raise ValueError("Ogg: truncated page body")
        if verify_crc:
            page = bytearray(data[p : body + body_len])
            stored = int.from_bytes(page[22:26], "little")
            page[22:26] = b"\x00\x00\x00\x00"
            if ogg_crc(bytes(page)) != stored:
                raise ValueError(
                    f"Ogg: page CRC mismatch at offset {p} "
                    f"(stored 0x{stored:08x})"
                )
        if serial is None:
            serial = page_serial
        if page_serial == serial:
            dropping = False
            if not (htype & 0x01) and cur:
                # new page does NOT continue a packet, but one is
                # open: the stream lost its tail — drop the fragment
                cur = bytearray()
            elif (htype & 0x01) and not cur:
                # mirror case (RFC 3533 §5): a continuation page with
                # no packet open (its head page lost — at the stream
                # start or mid-stream) — discard the orphan fragment
                # up to its terminating lacing
                dropping = True
            q = body
            for lace in seg_table:
                if dropping:
                    q += lace
                    if lace < 255:
                        dropping = False
                    continue
                cur += data[q : q + lace]
                q += lace
                if lace < 255:
                    packets.append(bytes(cur))
                    cur = bytearray()
                    if len(packets) > max_packets:
                        raise ValueError("Ogg: implausible packet count")
            if htype & 0x04:
                break  # EOS for the tracked stream: trailing bytes
                # (tags, padding, other streams) are not our pages
        p = body + body_len
    return packets


def ogg_flac_to_native(data: bytes) -> bytes | None:
    """Ogg-FLAC (the FLAC-to-Ogg mapping 1.0) -> the equivalent BARE
    FLAC stream, or None when the first packet is not a FLAC mapping
    header (Vorbis/Opus/other stay with their named rejection).  The
    mapping is a pure framing: packet 0 carries ``0x7F FLAC maj min
    nheaders`` then the native ``fLaC`` signature + STREAMINFO, each
    further header packet is one metadata block, and each audio
    packet is one frame — concatenation IS the native stream, which
    then rides the full from-spec decoder (CRC-8/CRC-16/MD5 ladder
    included)."""
    if not is_ogg(data) or len(data) < 27:
        return None
    # PEEK before demuxing: the mapping is decided by the first 13
    # bytes of the first packet.  A non-FLAC stream (Vorbis/Opus — the
    # common case, possibly huge, possibly truncated) returns None
    # here without paying a full packet reassembly, so it reaches its
    # caller's NAMED rejection rather than a demux ValueError.
    p = 27 + data[26]
    if data[p : p + 5] != b"\x7fFLAC" or data[p + 9 : p + 13] != b"fLaC":
        return None
    pkts = ogg_packets(data)
    if not pkts or pkts[0][:5] != b"\x7fFLAC" or \
            pkts[0][9:13] != b"fLaC":
        return None
    return pkts[0][9:] + b"".join(pkts[1:])


def encode_ogg_flac(rate: int, samples, channels: int = 1,
                    bits: int = 16, block_size: int = 4096) -> bytes:
    """PCM -> Ogg-FLAC (FLAC-to-Ogg mapping 1.0 over RFC 3533 pages):
    the production FLAC encoder runs with frame boundaries exposed,
    packet 0 carries the mapping header + fLaC signature + STREAMINFO
    on the BOS page, and each audio frame rides its own packet/page
    with the granule position at the cumulative sample count (EOS flag
    on the last).  Roundtrips through ogg_flac_to_native byte-exactly
    by construction — the demux concatenation law in reverse."""
    from parquet_converters_spark.functions.flac_encoder import (
        encode_flac as _encode_flac_full,
    )
    from parquet_converters_spark.functions.media_craft import ogg_page

    header, frames = _encode_flac_full(
        rate, samples, channels, bits, block_size, return_frames=True,
    )
    pages = [ogg_page(
        0, b"\x7fFLAC\x01\x00" + (0).to_bytes(2, "big") + header,
        htype=2, seq=0,
    )]
    total = len(samples) // max(1, channels)
    done = 0
    for i, fr in enumerate(frames):
        done = min(done + block_size, total)
        pages.append(ogg_page(
            done, fr,
            htype=4 if i == len(frames) - 1 else 0, seq=i + 1,
        ))
    if not frames:  # empty stream: a bare EOS page closes it
        pages.append(ogg_page(0, b"", htype=4, seq=1))
    return b"".join(pages)
