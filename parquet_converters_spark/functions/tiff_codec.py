"""From-spec baseline TIFF 6.0 decoder.

Decodes the strip-based baseline subset plus the ubiquitous
extensions a document/scan corpus actually carries: both byte orders,
bilevel (1-bit, both photometric polarities), grayscale 8/16-bit,
palette-color, RGB/RGBA (chunky), Compression = none (1) / CCITT-free
LZW (5, with its early-code-width-change quirk) / PackBits (32773) /
Deflate (8 and the old 32946 code), and the horizontal-differencing
Predictor (317 = 2) LZW/Deflate streams routinely use.  Multi-page
files decode their FIRST IFD (the thumbnail convention the other
first-frame decoders follow).

Named rejections (``NotImplementedError``) for: tiled organization
(322/323), planar configuration 2, CCITT fax codings, JPEG-in-TIFF,
FillOrder 2, and float samples — each names the JDK ImageIO seam as
the remedy (``decode_media(decoder=jdk_imageio_media_decoder())``,
functions/native_codecs.py), which reads all of those through the
javax.imageio TIFF plugin this engine already bridges.

Output contract matches the sibling image codecs:
``decode_tiff(data) -> (width, height, channels, pixels)`` with
8-bit samples (16-bit narrows by >>8), channels 1/3/4.  Malformed
input raises ``ValueError``; the allocation guard mirrors
``_MAX_PIXELS``.  External validation: vectors authored by the JDK's
own TIFF *writer* across compressions (tests/tiff_fixtures.py) plus
live JDK-bridge crossreads — see tests/test_tiff_codec.py.
"""

from __future__ import annotations

import struct
import zlib

_MAX_PIXELS = 1 << 28

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
               10: 8, 11: 4, 12: 8}


def is_tiff(data: bytes) -> bool:
    return data[:4] in (b"II*\x00", b"MM\x00*")


def decode_tiff(data: bytes):
    """Decode the first IFD of a TIFF file to
    ``(width, height, channels, pixels)``."""
    try:
        return _decode_tiff(data)
    except (IndexError, struct.error, zlib.error) as e:
        raise ValueError(f"TIFF: corrupt or truncated stream ({e})") from e


def _read_ifd(data: bytes, bo: str):
    """Parse the first IFD into {tag: list-of-values}."""
    (ifd_off,) = struct.unpack_from(bo + "I", data, 4)
    if ifd_off + 2 > len(data):
        raise ValueError("TIFF: IFD offset out of range")
    (n,) = struct.unpack_from(bo + "H", data, ifd_off)
    tags = {}
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        if base + 12 > len(data):
            raise ValueError("TIFF: truncated IFD")
        tag, typ, cnt = struct.unpack_from(bo + "HHI", data, base)
        size = _TYPE_SIZES.get(typ)
        if size is None:
            continue  # unknown field type: skip per spec
        total = size * cnt
        if total > (1 << 24):
            raise ValueError("TIFF: implausible IFD entry size")
        if total <= 4:
            raw = data[base + 8 : base + 8 + total]
        else:
            (off,) = struct.unpack_from(bo + "I", data, base + 8)
            raw = data[off : off + total]
            if len(raw) < total:
                raise ValueError("TIFF: IFD value out of range")
        if typ == 3:
            vals = list(struct.unpack(bo + f"{cnt}H", raw))
        elif typ == 4:
            vals = list(struct.unpack(bo + f"{cnt}I", raw))
        elif typ in (1, 6, 7, 2):
            vals = list(raw)
        elif typ == 8:
            vals = list(struct.unpack(bo + f"{cnt}h", raw))
        elif typ == 9:
            vals = list(struct.unpack(bo + f"{cnt}i", raw))
        else:  # rationals/floats: not needed for pixel decode
            vals = [0] * cnt
        tags[tag] = vals
    return tags


def _unpackbits(src: bytes, expected: int) -> bytes:
    """Apple PackBits (TIFF section 9)."""
    out = bytearray()
    i = 0
    while i < len(src) and len(out) < expected:
        n = src[i]
        i += 1
        if n < 128:
            out += src[i : i + n + 1]
            i += n + 1
        elif n > 128:
            if i >= len(src):
                break
            out += bytes([src[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expected:
        raise ValueError("TIFF: PackBits strip underrun")
    return bytes(out[:expected])


def _lzw_decode(src: bytes, expected: int) -> bytes:
    """TIFF-variant LZW (section 13): MSB-first code packing, Clear =
    256, EOI = 257, and the code width grows one code EARLY (at table
    size 511/1023/2047, unlike GIF)."""
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    i = 0
    while i < len(src) or nbits >= width:
        while nbits < width and i < len(src):
            acc = (acc << 8) | src[i]
            i += 1
            nbits += 8
        if nbits < width:
            break
        nbits -= width
        code = (acc >> nbits) & ((1 << width) - 1)
        if code == 256:
            reset()
            prev = None
            continue
        if code == 257:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("TIFF: bad initial LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("TIFF: LZW code out of range")
        out += entry
        prev = entry
        # early change: width grows when ONE slot remains
        if len(table) >= (1 << width) - 1 and width < 12:
            width += 1
        if len(out) >= expected:
            break
    if len(out) < expected:
        raise ValueError("TIFF: LZW strip underrun")
    return bytes(out[:expected])


def _undo_predictor(row: bytearray, spp: int):
    """Predictor 2: horizontal differencing per sample channel."""
    for i in range(spp, len(row)):
        row[i] = (row[i] + row[i - spp]) & 0xFF


def _decode_tiff(data: bytes):
    if not is_tiff(data):
        raise ValueError("TIFF: missing II*/MM* magic")
    bo = "<" if data[:2] == b"II" else ">"
    tags = _read_ifd(data, bo)

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF: missing required tag {tag}")
            return default
        return v[0]

    if 322 in tags or 323 in tags:
        raise NotImplementedError(
            "TIFF: tiled organization is not in the from-spec subset — "
            "route through the JDK ImageIO seam (decode_media(decoder="
            "jdk_imageio_media_decoder()))"
        )
    if one(284, 1) != 1:
        raise NotImplementedError(
            "TIFF: planar configuration 2 is not in the from-spec "
            "subset — use the JDK ImageIO seam"
        )
    if one(266, 1) != 1:
        raise NotImplementedError(
            "TIFF: FillOrder 2 is not in the from-spec subset — use "
            "the JDK ImageIO seam"
        )
    w, h = one(256), one(257)
    if w == 0 or h == 0 or w * h > _MAX_PIXELS:
        raise ValueError(f"TIFF: implausible dimensions {w}x{h}")
    comp = one(259, 1)
    photo = one(262)
    spp = one(277, 1)
    bps = tags.get(258, [1])
    if len(set(bps)) != 1:
        raise NotImplementedError(
            "TIFF: heterogeneous BitsPerSample — use the JDK seam"
        )
    bits = bps[0]
    sample_format = one(339, 1)
    if sample_format not in (1, 4):  # unsigned (4 = undefined)
        raise NotImplementedError(
            "TIFF: float/signed samples are not in the from-spec "
            "subset — use the JDK ImageIO seam"
        )
    if comp in (2, 3, 4):
        raise NotImplementedError(
            "TIFF: CCITT fax codings are not in the from-spec subset "
            "— use the JDK ImageIO seam"
        )
    if comp in (6, 7):
        raise NotImplementedError(
            "TIFF: JPEG-in-TIFF is not in the from-spec subset — use "
            "the JDK ImageIO seam"
        )
    if comp not in (1, 5, 8, 32773, 32946):
        raise ValueError(f"TIFF: unknown compression {comp}")
    predictor = one(317, 1)
    if predictor not in (1, 2):
        raise NotImplementedError(
            "TIFF: floating-point predictor — use the JDK ImageIO seam"
        )
    if bits not in (1, 8, 16):
        raise NotImplementedError(
            f"TIFF: {bits}-bit samples are not in the from-spec "
            "subset (1/8/16 are) — use the JDK ImageIO seam"
        )
    if photo not in (0, 1, 2, 3):
        raise NotImplementedError(
            f"TIFF: photometric {photo} is not in the from-spec "
            "subset — use the JDK ImageIO seam"
        )

    offsets = tags.get(273)
    counts = tags.get(279)
    if offsets is None or counts is None or len(offsets) != len(counts):
        raise ValueError("TIFF: missing or mismatched strip tables")
    rows_per_strip = one(278, h)
    if rows_per_strip == 0:
        raise ValueError("TIFF: zero RowsPerStrip")

    # row size in bytes at the file's bit depth
    row_bits = w * spp * bits
    row_bytes = (row_bits + 7) // 8

    raw = bytearray()
    rows_done = 0
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        strip = data[off : off + cnt]
        if len(strip) < cnt:
            raise ValueError("TIFF: strip out of range")
        nrows = min(rows_per_strip, h - rows_done)
        expected = row_bytes * nrows
        if comp == 1:
            if len(strip) < expected:
                raise ValueError("TIFF: short uncompressed strip")
            out = bytes(strip[:expected])
        elif comp == 32773:
            out = _unpackbits(strip, expected)
        elif comp == 5:
            out = _lzw_decode(strip, expected)
        else:  # 8 / 32946: zlib
            out = zlib.decompress(bytes(strip))
            if len(out) < expected:
                raise ValueError("TIFF: short deflate strip")
            out = out[:expected]
        if predictor == 2:
            if bits != 8:
                raise NotImplementedError(
                    "TIFF: predictor 2 with non-8-bit samples — use "
                    "the JDK ImageIO seam"
                )
            buf = bytearray(out)
            for r in range(nrows):
                row = buf[r * row_bytes : (r + 1) * row_bytes]
                _undo_predictor(row, spp)
                buf[r * row_bytes : (r + 1) * row_bytes] = row
            out = bytes(buf)
        raw += out
        rows_done += nrows
    if rows_done < h:
        raise ValueError("TIFF: strips cover fewer rows than ImageLength")

    # normalize to 8-bit samples
    if bits == 1:
        if spp != 1:
            raise NotImplementedError(
                "TIFF: 1-bit with multiple samples — use the JDK seam"
            )
        px = bytearray(w * h)
        for y in range(h):
            base = y * row_bytes
            for x in range(w):
                bit = (raw[base + (x >> 3)] >> (7 - (x & 7))) & 1
                px[y * w + x] = 255 if bit else 0
        samples = bytes(px)
    elif bits == 16:
        n = w * h * spp
        fmt = bo + f"{n}H"
        vals = struct.unpack(fmt, bytes(raw[: n * 2]))
        samples = bytes(v >> 8 for v in vals)
    else:
        samples = bytes(raw[: w * h * spp])

    if photo == 0:  # WhiteIsZero: invert to BlackIsZero convention
        samples = bytes(255 - s for s in samples)
    if photo == 3:  # palette
        if spp != 1:
            raise ValueError("TIFF: palette image with SamplesPerPixel>1")
        cmap = tags.get(320)
        ncolors = 1 << bits
        if cmap is None or len(cmap) < 3 * ncolors:
            raise ValueError("TIFF: missing or short ColorMap")
        out = bytearray(w * h * 3)
        # 1-bit palettes index with the raw bit, not the 0/255 expand
        if bits == 1:
            idx = bytes(1 if s else 0 for s in samples)
        else:
            idx = samples
        for i, s in enumerate(idx):
            if s >= ncolors:
                raise ValueError("TIFF: palette index out of range")
            out[3 * i] = cmap[s] >> 8
            out[3 * i + 1] = cmap[ncolors + s] >> 8
            out[3 * i + 2] = cmap[2 * ncolors + s] >> 8
        return w, h, 3, bytes(out)
    if photo in (0, 1):
        if spp == 1:
            return w, h, 1, samples
        if spp == 2:  # gray + alpha: keep both
            raise NotImplementedError(
                "TIFF: gray+alpha — use the JDK ImageIO seam"
            )
        raise ValueError("TIFF: gray photometric with SamplesPerPixel>2")
    # photo == 2: RGB / RGBA
    if spp == 3:
        return w, h, 3, samples
    if spp == 4:
        return w, h, 4, samples
    raise ValueError(f"TIFF: RGB with SamplesPerPixel={spp}")


def encode_tiff(width: int, height: int, channels: int, pixels,
                compression: str = "deflate") -> bytes:
    """Encode 8-bit gray/RGB/RGBA pixels as a baseline TIFF (little-
    endian, IFD-first layout, one strip, Deflate (8) or uncompressed).

    The resize_media companion sink (TIFF in -> TIFF out, like the
    other formats).  Deliberately laid out differently from the test
    suite's independent writer (tests/tiff_craft.py writes data-first
    with a patched IFD pointer; this one writes the IFD at offset 8) —
    the decoder must read both, and the JDK reader crossreads ours
    (tests/test_tiff_codec.py)."""
    if channels not in (1, 3, 4):
        raise ValueError(f"TIFF encode: channels must be 1/3/4, got "
                         f"{channels}")
    pixels = bytes(pixels)
    if len(pixels) != width * height * channels:
        raise ValueError("TIFF encode: pixel buffer size mismatch")
    comp_tag = {"none": 1, "deflate": 8}[compression]
    body = pixels if comp_tag == 1 else zlib.compress(pixels, 6)

    entries = [
        (256, 3, 1, width),
        (257, 3, 1, height),
        (259, 3, 1, comp_tag),
        (262, 3, 1, 2 if channels >= 3 else 1),
        (277, 3, 1, channels),
        (278, 3, 1, height),
        (279, 4, 1, len(body)),
    ]
    bps_cnt = channels
    entries.append((258, 3, bps_cnt, 0))  # value/offset patched below
    entries.append((273, 4, 1, 0))  # strip offset patched below
    if channels == 4:
        entries.append((338, 3, 1, 2))  # ExtraSamples: unassoc alpha
    entries.sort()
    ifd_off = 8
    after_ifd = ifd_off + 2 + 12 * len(entries) + 4
    bps_off = after_ifd if bps_cnt > 2 else None
    strip_off = after_ifd + (2 * bps_cnt if bps_off else 0)

    out = bytearray(b"II*\x00")
    out += struct.pack("<I", ifd_off)
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        if tag == 258:
            if bps_off is not None:
                out += struct.pack("<HHII", tag, typ, cnt, bps_off)
            else:
                out += struct.pack("<HHIHH", tag, typ, cnt, 8, 0)
            continue
        if tag == 273:
            out += struct.pack("<HHII", tag, typ, cnt, strip_off)
            continue
        out += struct.pack("<HHI", tag, typ, cnt)
        if typ == 4:
            out += struct.pack("<I", val)
        else:
            out += struct.pack("<HH", val, 0)
    out += struct.pack("<I", 0)  # next-IFD terminator
    if bps_off is not None:
        out += struct.pack(f"<{bps_cnt}H", *([8] * bps_cnt))
    out += body
    return bytes(out)
