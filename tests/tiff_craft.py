"""Flexible from-spec baseline TIFF 6.0 *writer* for decoder tests.

Independent of the decoder under test (functions/tiff_codec.py):
written against the spec's IFD/strip layout rules directly, with
knobs the JDK-writer fixtures (tests/tiff_fixtures.py) do not reach —
big-endian files, WhiteIsZero, bilevel, palette-color, multi-strip
layouts, PackBits and Deflate compression, and the horizontal
predictor.  The external cross-check is the JDK ImageIO *reader*
(via the bridge) wherever it supports the combination.
"""

import struct
import zlib


def packbits_encode(row: bytes) -> bytes:
    """A simple valid PackBits encoding (literal/run alternation)."""
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, row[i]])
            i += run
        else:
            lit_start = i
            i += 1
            while (
                i < n
                and i - lit_start < 128
                and not (i + 1 < n and row[i] == row[i + 1])
            ):
                i += 1
            out += bytes([i - lit_start - 1]) + row[lit_start:i]
    return bytes(out)


def encode_tiff_ex(
    w,
    h,
    pixels,
    *,
    channels=3,
    big_endian=False,
    compression=1,  # 1 none, 8 deflate, 32773 packbits
    predictor=1,
    photometric=None,  # default: 1 for gray, 2 for rgb
    rows_per_strip=None,
    bilevel=False,  # 1-bit, photometric decides polarity
    palette=None,  # list of (r, g, b) 8-bit -> photometric 3
    extra_tags=(),
) -> bytes:
    bo = ">" if big_endian else "<"
    rows_per_strip = rows_per_strip or h
    if palette is not None:
        photometric = 3
        channels = 1
        bits = 8
    elif bilevel:
        channels = 1
        bits = 1
        if photometric is None:
            photometric = 1
    else:
        bits = 8
        if photometric is None:
            photometric = 2 if channels >= 3 else 1

    # build raw rows at the file bit depth
    if bilevel:
        row_bytes = (w + 7) // 8
        raw_rows = []
        for y in range(h):
            row = bytearray(row_bytes)
            for x in range(w):
                bit = 1 if pixels[y * w + x] else 0
                if photometric == 0:
                    bit ^= 1  # WhiteIsZero stores inverted
                if bit:
                    row[x >> 3] |= 0x80 >> (x & 7)
            raw_rows.append(bytes(row))
    else:
        row_bytes = w * channels
        raw_rows = [
            bytes(pixels[y * row_bytes : (y + 1) * row_bytes])
            for y in range(h)
        ]
        if photometric == 0:  # WhiteIsZero gray: store inverted
            raw_rows = [bytes(255 - b for b in r) for r in raw_rows]

    if predictor == 2:
        assert not bilevel
        diffed = []
        for r in raw_rows:
            row = bytearray(r)
            for i in range(len(row) - 1, channels - 1, -1):
                row[i] = (row[i] - row[i - channels]) & 0xFF
            diffed.append(bytes(row))
        raw_rows = diffed

    strips = []
    y = 0
    while y < h:
        nrows = min(rows_per_strip, h - y)
        blob = b"".join(raw_rows[y : y + nrows])
        if compression == 8:
            blob = zlib.compress(blob, 6)
        elif compression == 32773:
            blob = b"".join(
                packbits_encode(r) for r in raw_rows[y : y + nrows]
            )
        strips.append(blob)
        y += nrows

    # layout: header, strip data, (bps array / colormap), IFD
    out = bytearray((b"MM\x00*" if big_endian else b"II*\x00"))
    out += b"\x00\x00\x00\x00"  # IFD offset patched below
    strip_offsets = []
    for s in strips:
        strip_offsets.append(len(out))
        out += s
        if len(out) & 1:
            out += b"\x00"

    aux = {}  # tag -> offset of its out-of-line value
    if channels in (3, 4) and not bilevel:
        aux[258] = len(out)
        out += struct.pack(bo + f"{channels}H", *([8] * channels))
    if palette is not None:
        # spec: ColorMap always carries 3 * 2^bits entries
        full = list(palette) + [(0, 0, 0)] * (256 - len(palette))
        aux[320] = len(out)
        for comp_i in range(3):
            for entry in full:
                out += struct.pack(bo + "H", entry[comp_i] << 8)
    if len(strips) > 1:
        aux[273] = len(out)
        out += struct.pack(bo + f"{len(strips)}I", *strip_offsets)
        aux[279] = len(out)
        out += struct.pack(
            bo + f"{len(strips)}I", *[len(s) for s in strips]
        )

    entries = [(256, 3, 1, w), (257, 3, 1, h)]
    if bilevel:
        entries.append((258, 3, 1, 1))
    elif channels in (3, 4):
        entries.append((258, 3, channels, aux[258]))
    else:
        entries.append((258, 3, 1, 8))
    entries.append((259, 3, 1, compression))
    entries.append((262, 3, 1, photometric))
    if len(strips) > 1:
        entries.append((273, 4, len(strips), aux[273]))
        entries.append((279, 4, len(strips), aux[279]))
    else:
        entries.append((273, 4, 1, strip_offsets[0]))
        entries.append((279, 4, 1, len(strips[0])))
    entries.append((277, 3, 1, channels))
    entries.append((278, 3, 1, rows_per_strip))
    if predictor != 1:
        entries.append((317, 3, 1, predictor))
    if palette is not None:
        entries.append((320, 3, 3 * 256, aux[320]))
    entries += list(extra_tags)
    entries.sort()

    if len(out) & 1:
        out += b"\x00"
    ifd_off = len(out)
    struct.pack_into(bo + "I", out, 4, ifd_off)
    out += struct.pack(bo + "H", len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack(bo + "HHI", tag, typ, cnt)
        if typ == 4 or cnt > 2:
            out += struct.pack(bo + "I", val)
        else:
            out += struct.pack(bo + "HH", val, 0)
    out += struct.pack(bo + "I", 0)
    return bytes(out)
