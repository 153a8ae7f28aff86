"""Minimal stdlib-only GIF codec (GIF87a/GIF89a, W3C/CompuServe spec).

The third web-corpus image format (after PNG and baseline JPEG),
written from the public specification so the multimodal operators run
REAL on GIF payloads in any environment — the same from-spec pattern
as ``media_codecs.py`` (PNG/WAV), ``jpeg_codec.py`` (baseline JPEG),
and ``avi_codec.py`` (MJPEG AVI).

Scope (deliberately minimal, spec-complete within it):

- decode: GIF87a + GIF89a, global and local color tables, full
  variable-width LZW (clear/EOI codes, 12-bit dictionary cap, code
  width growth), interlaced images (the four-pass row order),
  transparency via Graphic Control Extension (output is RGBA), and
  FULL animation compositing: sub-rectangle frames paint onto the
  canvas, transparent indices show through, and all four disposal
  methods (none / do-not-dispose / restore-to-background /
  restore-to-previous) are applied between frames — each emitted
  frame is the complete composited canvas, what a viewer shows.
- encode: GIF89a, single- or multi-frame, one global color table
  built from the input pixels (<= 256 distinct colors required — this
  is a codec for deterministic fixtures and palette imagery, not a
  quantizer), standard LZW with dictionary reset at 4096, optional
  per-frame delay; deterministic bytes for identical input.

These run inside Arrow-batched ``mapInPandas`` workers, so everything
is a pure function of ``bytes`` with no Spark imports.

Reference provenance: the reference engine (BlueBrain/parquet-converters)
has no media surface; this extends the engine for LLM-pipeline
multimodal columns (brief § multimodal).
"""

from __future__ import annotations

import struct


def is_gif(data: bytes) -> bool:
    return data[:6] in (b"GIF87a", b"GIF89a")


# ---------------------------------------------------------------------------
# LZW (spec Appendix F)
# ---------------------------------------------------------------------------


def _lzw_decode(min_code_size: int, data: bytes, n_expected: int) -> bytearray:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader state (LSB-first within bytes, per spec)
    acc = nbits = pos = 0
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None

    while True:
        while nbits < code_size:
            if pos >= len(data):
                # tolerated: some writers omit the explicit EOI
                return out
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            if code >= len(table):
                raise ValueError(f"GIF: LZW code {code} before any output")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"GIF: LZW code {code} out of range")
        out += entry
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
        if len(out) >= n_expected:
            return out


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, size: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    code_size = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, code_size)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], code_size)
        table[wk] = next_code
        next_code += 1
        if next_code > (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code >= 4096:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: list[bytes], height: int) -> list[bytes]:
    out: list[bytes | None] = [None] * height
    i = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, height, step):
            out[y] = rows[i]
            i += 1
    return out  # type: ignore[return-value]


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks; return (bytes, position after the
    block terminator)."""
    chunks = []
    while True:
        if pos >= len(data):
            raise ValueError("GIF: truncated sub-block stream")
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        chunks.append(data[pos : pos + n])
        if len(chunks[-1]) != n:
            raise ValueError("GIF: truncated sub-block")
        pos += n


#: Allocation guard for untrusted streams (same rationale as
#: jpeg_codec._MAX_PIXELS): corrupt canvas fields must not allocate GBs.
_MAX_PIXELS = 1 << 28


def parse_gif_frames(data: bytes) -> tuple[int, int, list[tuple[int, bytes]]]:
    """Parse a GIF to ``(width, height, [(delay_ms, rgba_bytes), ...])``
    where each entry is the COMPOSITED full canvas at that frame (what
    a viewer displays): sub-rectangle frames paint over the previous
    state, transparent indices show through, disposal methods 2/3
    clear-to-transparent / restore-to-previous between frames.  Output
    is always RGBA; alpha 0 marks never-painted (or disposed) canvas.
    Malformed input raises ``ValueError``, never a bare
    IndexError/struct.error."""
    try:
        return _parse_gif_frames(data)
    except (IndexError, struct.error) as e:
        raise ValueError(f"GIF: corrupt or truncated stream ({e})") from e


def _parse_gif_frames(data: bytes):
    if not is_gif(data):
        raise ValueError("GIF: bad signature")
    w, h, packed, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    if w == 0 or h == 0 or w * h > _MAX_PIXELS:
        raise ValueError(f"GIF: implausible canvas {w}x{h}")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = data[pos : pos + 3 * n]
        pos += 3 * n
    frames: list[tuple[int, bytes]] = []
    # compositing state (spec 23: frames paint ONTO the canvas; the
    # previous GCE's disposal decides what the next frame paints over)
    canvas = bytearray(w * h * 4)  # starts fully transparent
    transparent = -1
    delay_ms = 0
    dispose = 0
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos + 1]
            pos += 2
            if label == 0xF9:  # graphic control
                body, pos = _sub_blocks(data, pos)
                flags = body[0]
                (delay_cs,) = struct.unpack("<H", body[1:3])
                delay_ms = delay_cs * 10
                transparent = body[3] if flags & 0x01 else -1
                dispose = (flags >> 2) & 0x07
            else:  # comment / application / plain text: skip
                _, pos = _sub_blocks(data, pos)
        elif b == 0x2C:  # image descriptor
            left, top, fw, fh, fpacked = struct.unpack(
                "<HHHHB", data[pos + 1 : pos + 10]
            )
            pos += 10
            if left + fw > w or top + fh > h:
                raise ValueError(
                    f"GIF: frame {fw}x{fh}@{left},{top} exceeds the "
                    f"{w}x{h} canvas"
                )
            ct = gct
            if fpacked & 0x80:
                n = 2 << (fpacked & 0x07)
                ct = data[pos : pos + 3 * n]
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF: image has no color table")
            min_code = data[pos]
            pos += 1
            lzw, pos = _sub_blocks(data, pos)
            idx = _lzw_decode(min_code, lzw, fw * fh)
            if len(idx) < fw * fh:
                raise ValueError(
                    f"GIF: LZW stream yields {len(idx)} of {fw * fh} pixels"
                )
            rows = [idx[y * fw : (y + 1) * fw] for y in range(fh)]
            if fpacked & 0x40:
                rows = _deinterlace([bytes(r) for r in rows], fh)
            saved = bytes(canvas) if dispose == 3 else None
            for y, row in enumerate(rows):
                at = ((top + y) * w + left) * 4
                for i in row:
                    if i != transparent:  # transparent: show-through
                        c = 3 * i
                        canvas[at] = ct[c]
                        canvas[at + 1] = ct[c + 1]
                        canvas[at + 2] = ct[c + 2]
                        canvas[at + 3] = 255
                    at += 4
            frames.append((delay_ms, bytes(canvas)))
            # disposal happens AFTER this frame is shown, before the next
            if dispose == 2:  # restore to background = clear the rect
                for y in range(fh):
                    at = ((top + y) * w + left) * 4
                    canvas[at : at + 4 * fw] = bytes(4 * fw)
            elif dispose == 3:  # restore to previous
                canvas = bytearray(saved)
            transparent = -1
            delay_ms = 0
            dispose = 0
        else:
            raise ValueError(f"GIF: unknown block {b:#x} at {pos}")
    if not frames:
        raise ValueError("GIF: no image data")
    return w, h, frames


def decode_gif(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a GIF's FIRST frame to ``(width, height, channels,
    pixels)`` — RGB if fully opaque, RGBA if the frame carries
    transparency (matching ``decode_png``'s channel convention)."""
    w, h, frames = parse_gif_frames(data)
    rgba = frames[0][1]
    if all(rgba[i] == 255 for i in range(3, len(rgba), 4)):
        rgb = bytearray(w * h * 3)
        for p in range(w * h):
            rgb[3 * p : 3 * p + 3] = rgba[4 * p : 4 * p + 3]
        return w, h, 3, bytes(rgb)
    return w, h, 4, bytes(rgba)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def encode_gif(
    width: int,
    height: int,
    channels: int,
    frames: list[bytes],
    delay_ms: int = 100,
) -> bytes:
    """Encode one or more raw 8-bit frames (RGB or RGBA, row-major) as
    a GIF89a with one global color table.  All frames together must
    use <= 256 distinct colors (palette imagery / fixtures — this is
    not a quantizer); RGBA alpha < 128 maps to one transparent index.
    Deterministic bytes for identical input."""
    if channels not in (3, 4):
        raise ValueError(f"channels must be 3 or 4, got {channels}")
    if not frames:
        raise ValueError("GIF: need at least one frame")
    n_px = width * height
    for f in frames:
        if len(f) != n_px * channels:
            raise ValueError(
                f"frame is {len(f)} bytes, expected {n_px * channels}"
            )
    # palette: first-seen order (deterministic); transparent slot first
    # if any frame uses alpha
    has_alpha = channels == 4 and any(
        f[4 * p + 3] < 128 for f in frames for p in range(n_px)
    )
    palette: dict[tuple[int, int, int], int] = {}
    t_index = 0 if has_alpha else -1
    next_i = 1 if has_alpha else 0  # slot 0 reserved for transparency
    index_frames: list[bytes] = []
    for f in frames:
        idx = bytearray(n_px)
        for p in range(n_px):
            o = p * channels
            if channels == 4 and f[o + 3] < 128:
                idx[p] = t_index
                continue
            key = (f[o], f[o + 1], f[o + 2])
            i = palette.get(key)
            if i is None:
                if next_i >= 256:
                    raise ValueError(
                        "GIF: more than 256 distinct colors — quantize "
                        "first (this codec is palette-exact by design)"
                    )
                i = next_i
                palette[key] = i
                next_i += 1
            idx[p] = i
        index_frames.append(bytes(idx))
    n_colors = next_i
    # GCT size: power of two >= max(n_colors, 2)
    bits = max((n_colors - 1).bit_length(), 1)
    table_n = 1 << bits
    gct = bytearray(3 * table_n)
    for (r, g, b), i in palette.items():
        gct[3 * i : 3 * i + 3] = bytes([r, g, b])
    out = bytearray(b"GIF89a")
    out += struct.pack(
        "<HHBBB", width, height, 0x80 | ((bits - 1) & 0x07), 0, 0
    )
    out += gct
    if len(frames) > 1:
        # NETSCAPE2.0 loop-forever block (the de-facto animation marker)
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    min_code = max(bits, 2)
    for idx in index_frames:
        flags = (0x01 if has_alpha else 0x00) | (0x04 if len(frames) > 1 else 0)
        out += b"\x21\xf9\x04" + bytes([flags]) + struct.pack(
            "<H", delay_ms // 10
        ) + bytes([t_index if has_alpha else 0, 0])
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out += bytes([min_code])
        lzw = _lzw_encode(min_code, idx)
        for at in range(0, len(lzw), 255):
            chunk = lzw[at : at + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
