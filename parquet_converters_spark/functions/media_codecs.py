"""Minimal stdlib-only media codecs: PNG (image) and WAV/PCM16 (audio).

Purpose: give the multimodal operators a REAL decode path that works in
any environment (this container ships no PIL/ffmpeg/soundfile), the
same way ``sinks/hdf5_minimal.py`` gives the SONATA sink a from-spec
HDF5 codec so the h5py cross-validation leg is never the only check.
Where PIL *is* installed, ``tests/test_multimodal_realdecode.py``
cross-validates these decoders against it pixel-for-pixel
(auto-activating, the ``tests/test_h5py_crossval.py`` pattern).

Scope (deliberately minimal, spec-complete within it):

- PNG: 8-bit greyscale / RGB / RGBA, non-interlaced, single IDAT
  stream (any zlib split across IDAT chunks on decode), all five
  filter types on decode, filter 0 on encode.  PNG spec (RFC 2083).
- WAV: RIFF/WAVE canonical header, PCM16 mono/stereo, little-endian.
- JPEG (baseline SOF0, 4:4:4/4:2:2/4:2:0, restart markers) lives in
  the sibling ``functions/jpeg_codec.py`` — same from-spec pattern.

These run inside Arrow-batched ``mapInPandas`` workers, so they are
pure functions of ``bytes`` with no Spark imports.

Reference provenance: the reference engine has no media surface; this
extends the engine for LLM-pipeline multimodal columns (brief §
multimodal).
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color types for the supported channel counts
_COLOR_TYPE = {1: 0, 3: 2, 4: 6}
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Encode raw 8-bit pixel bytes (row-major, ``channels`` per px)
    as a valid non-interlaced PNG with filter type 0 on every row."""
    if channels not in _COLOR_TYPE:
        raise ValueError(f"channels must be 1, 3, or 4, got {channels}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, expected "
            f"{stride * height} ({width}x{height}x{channels})"
        )
    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, _COLOR_TYPE[channels], 0, 0, 0
    )
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter_row(
    ftype: int, row: bytearray, prev: bytes, bpp: int
) -> bytearray:
    """Apply the inverse of PNG filter ``ftype`` in place (spec §6)."""
    n = len(row)
    if ftype == 0:  # None
        return row
    if ftype == 1:  # Sub
        for i in range(bpp, n):
            row[i] = (row[i] + row[i - bpp]) & 0xFF
    elif ftype == 2:  # Up
        for i in range(n):
            row[i] = (row[i] + prev[i]) & 0xFF
    elif ftype == 3:  # Average
        for i in range(n):
            left = row[i - bpp] if i >= bpp else 0
            row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
    elif ftype == 4:  # Paeth
        for i in range(n):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            if pa <= pb and pa <= pc:
                pred = a
            elif pb <= pc:
                pred = b
            else:
                pred = c
            row[i] = (row[i] + pred) & 0xFF
    else:
        raise ValueError(f"PNG: unknown filter type {ftype}")
    return row


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG to ``(width, height, channels, raw_pixels)``.

    Supports the :func:`encode_png` subset plus anything PIL writes
    within it (8-bit L/RGB/RGBA, non-interlaced, any row filters, IDAT
    split over multiple chunks) — enough for full pixel-level
    cross-validation against PIL.  Malformed input raises
    ``ValueError``, never a bare zlib/struct/index error (the
    untrusted-corpus decoder contract, tests/test_codec_properties.py).
    """
    try:
        return _decode_png(data)
    except (IndexError, struct.error, zlib.error) as e:
        raise ValueError(f"PNG: corrupt or truncated stream ({e})") from e


def _decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    if data[:8] != _PNG_SIG:
        raise ValueError("PNG: bad signature")
    pos, width = 8, None
    idat = bytearray()
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("PNG: truncated chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"PNG: truncated {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"PNG: unsupported bit depth {depth}")
            if ctype not in _CHANNELS:
                raise ValueError(f"PNG: unsupported color type {ctype}")
            if comp != 0 or filt != 0:
                raise ValueError("PNG: unsupported compression/filter method")
            if ilace != 0:
                raise ValueError("PNG: interlaced images unsupported")
            channels = _CHANNELS[ctype]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG: missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"PNG: decompressed to {len(raw)} bytes, expected "
            f"{(stride + 1) * height}"
        )
    out = bytearray()
    prev = bytes(stride)
    for y in range(height):
        at = y * (stride + 1)
        row = _unfilter_row(
            raw[at], bytearray(raw[at + 1 : at + 1 + stride]), prev, channels
        )
        out += row
        prev = bytes(row)
    return width, height, channels, bytes(out)


def resize_nearest(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    new_w: int,
    new_h: int,
) -> bytes:
    """Nearest-neighbor resize with the standard pixel-center mapping
    ``src = floor((dst + 0.5) * src_dim / dst_dim)`` — integer-exact
    (computed as ``(2*dst+1)*src_dim // (2*dst_dim)``), so every
    engine/platform produces identical bytes."""
    out = bytearray(new_w * new_h * channels)
    for y in range(new_h):
        sy = min((2 * y + 1) * height // (2 * new_h), height - 1)
        src_row = sy * width * channels
        dst_row = y * new_w * channels
        for x in range(new_w):
            sx = min((2 * x + 1) * width // (2 * new_w), width - 1)
            s = src_row + sx * channels
            d = dst_row + x * channels
            out[d : d + channels] = pixels[s : s + channels]
    return bytes(out)


def is_bmp(data: bytes) -> bool:
    return len(data) >= 2 and data[:2] == b"BM"


def encode_bmp(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Encode 8-bit RGB (24-bit BI_RGB) or RGBA (32-bit) pixels as a
    bottom-up Windows BMP (BITMAPINFOHEADER).  Deterministic bytes."""
    if channels not in (3, 4):
        raise ValueError(f"channels must be 3 or 4, got {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, expected "
            f"{width * height * channels}"
        )
    stride = (width * channels + 3) & ~3
    body = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(width):
            o = (y * width + x) * channels
            row += bytes(
                [pixels[o + 2], pixels[o + 1], pixels[o]]
            )  # BGR order
            if channels == 4:
                row.append(pixels[o + 3])
        body += row + bytes(stride - len(row))
    info = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, channels * 8, 0, len(body), 2835, 2835, 0, 0,
    )
    off = 14 + 40
    head = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    return head + info + bytes(body)


def decode_bmp(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode an uncompressed (BI_RGB) Windows BMP to ``(width, height,
    channels, pixels)``: 8-bit palette and 24-bit map to RGB, 32-bit to
    RGBA; bottom-up and top-down row orders both handled.  RLE and
    bitfield compressions raise ``NotImplementedError`` naming them;
    malformed input raises ``ValueError``."""
    try:
        return _decode_bmp(data)
    except (IndexError, struct.error) as e:
        raise ValueError(f"BMP: corrupt or truncated stream ({e})") from e


_BMP_COMPRESSION = {1: "RLE8", 2: "RLE4", 3: "BI_BITFIELDS", 4: "JPEG", 5: "PNG"}


def _decode_bmp(data: bytes) -> tuple[int, int, int, bytes]:
    if not is_bmp(data):
        raise ValueError("BMP: bad signature")
    (off,) = struct.unpack("<I", data[10:14])
    hdr_size, w, h_signed = struct.unpack("<Iii", data[14:26])
    if hdr_size < 40:
        raise NotImplementedError(
            f"BMP: {hdr_size}-byte header (BITMAPCOREHEADER) not implemented"
        )
    planes, bpp, compression = struct.unpack("<HHI", data[26:34])
    if compression != 0:
        name = _BMP_COMPRESSION.get(compression, str(compression))
        raise NotImplementedError(
            f"BMP: compression {name} not implemented (BI_RGB only)"
        )
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"BMP: {bpp}-bit pixels not implemented")
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    if w <= 0 or h == 0 or w * h > (1 << 28):
        raise ValueError(f"BMP: implausible dimensions {w}x{h_signed}")
    palette = None
    if bpp == 8:
        (n_colors,) = struct.unpack("<I", data[46:50])
        n_colors = n_colors or 256
        pal_at = 14 + hdr_size
        palette = data[pal_at : pal_at + 4 * n_colors]
        if len(palette) != 4 * n_colors:
            raise ValueError("BMP: truncated palette")
    src_c = bpp // 8
    out_c = 4 if bpp == 32 else 3
    stride = (w * src_c + 3) & ~3
    if off + stride * h > len(data):
        raise ValueError("BMP: truncated pixel data")
    out = bytearray(w * h * out_c)
    for row_i in range(h):
        y = row_i if top_down else h - 1 - row_i
        at = off + row_i * stride
        d = y * w * out_c
        for x in range(w):
            if bpp == 8:
                e = 4 * data[at + x]
                out[d : d + 3] = bytes(
                    [palette[e + 2], palette[e + 1], palette[e]]
                )
            else:
                s = at + x * src_c
                out[d] = data[s + 2]
                out[d + 1] = data[s + 1]
                out[d + 2] = data[s]
                if out_c == 4:
                    out[d + 3] = data[s + 3]
            d += out_c
    if out_c == 4 and not any(out[3::4]):
        # BI_RGB defines the 4th byte as reserved/zero, so standard 32bpp
        # writers zero it; treat an all-zero alpha plane as opaque (the
        # common-decoder convention) instead of fully transparent.
        out[3::4] = b"\xff" * (w * h)
    return w, h, out_c, bytes(out)


def encode_wav(sample_rate: int, samples: list[int], channels: int = 1) -> bytes:
    """Encode interleaved PCM16 samples as a canonical RIFF/WAVE file."""
    body = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(body))
        + body
    )


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """Decode a RIFF/WAVE file to
    ``(sample_rate, channels, interleaved_pcm16_samples)``.

    Formats: linear PCM 8/16/24/32 bits (format tag 1), G.711 A-law
    (6) and u-law (7), and WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrapping
    any of those sub-formats.  16-bit passes through exactly (the
    pre-r12 behavior, unchanged); other depths normalize to PCM16 —
    8-bit (unsigned, offset 128) widens by <<8, 24/32-bit truncate low
    bits — the audioop/sox integer-shift convention, crossvalidated
    exactly in tests/test_audio_codecs.py.  Malformed input raises
    ``ValueError``; float/ADPCM formats raise ``NotImplementedError``
    naming the tag."""
    rate, channels, bits, samples = decode_wav_native(data)
    if bits != 16:
        from parquet_converters_spark.functions.audio_codecs import (
            _native_to_16,
        )

        samples = _native_to_16(samples, bits)
    return rate, channels, samples


def decode_wav_native(data: bytes) -> tuple[int, int, int, list[int]]:
    """Decode a RIFF/WAVE file at NATIVE depth:
    ``(rate, channels, bits, samples)`` — PCM keeps its stored depth
    (8-bit returned signed, offset removed), G.711 expands onto the
    16-bit grid.  The lossless path ``transcode_audio``'s
    ``depth='native'`` mode rides."""
    try:
        return _decode_wav(data)
    except (IndexError, struct.error) as e:
        raise ValueError(f"WAV: corrupt or truncated stream ({e})") from e


def _decode_wav(data: bytes) -> tuple[int, int, int, list[int]]:
    from parquet_converters_spark.functions.audio_codecs import (
        _pcm_native,
        decode_g711,
    )

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("WAV: not a RIFF/WAVE file")
    pos, fmt, body_bytes = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            fmt = body
        elif tag == b"data":
            body_bytes = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or body_bytes is None:
        raise ValueError("WAV: missing fmt or data chunk")
    audio_fmt, channels, rate = struct.unpack("<HHI", fmt[:8])
    (bits,) = struct.unpack("<H", fmt[14:16])
    if audio_fmt == 0xFFFE:
        # WAVE_FORMAT_EXTENSIBLE: the real format tag is the first two
        # bytes of the 16-byte SubFormat GUID (cbSize >= 22)
        if len(fmt) < 26:
            raise ValueError("WAV: extensible fmt chunk too short")
        (audio_fmt,) = struct.unpack("<H", fmt[24:26])
    if channels == 0 or rate == 0:
        raise ValueError("WAV: zero channels or sample rate")
    if audio_fmt == 1:
        if bits == 16:  # exact passthrough, the historical fast path
            n = len(body_bytes) // 2
            samples = list(struct.unpack(f"<{n}h", body_bytes[: n * 2]))
            out_bits = 16
        else:
            samples = _pcm_native(
                body_bytes, bits, big_endian=False, unsigned8=True
            )
            out_bits = bits
    elif audio_fmt == 6:
        out_bits, samples = 16, decode_g711(body_bytes, "alaw")
    elif audio_fmt == 7:
        out_bits, samples = 16, decode_g711(body_bytes, "ulaw")
    else:
        raise NotImplementedError(
            f"WAV: format tag {audio_fmt} not supported (PCM=1, "
            "A-law=6, u-law=7, and extensible wrappers of those are; "
            "IEEE-float/ADPCM are not)"
        )
    if len(samples) % channels:
        samples = samples[: len(samples) - len(samples) % channels]
    return rate, channels, out_bits, samples
