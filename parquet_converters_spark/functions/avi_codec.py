"""Minimal stdlib-only MJPEG-in-AVI container codec (Microsoft RIFF
AVI 1.0, public 'AVI RIFF File Reference').

Purpose: give ``sample_frames`` a REAL video path in any environment
(this container ships no ffmpeg) — motion-JPEG is just a RIFF index
over per-frame baseline JPEGs, so with ``functions/jpeg_codec.py`` in
place the whole video pipeline (container parse -> frame select ->
image decode) runs from-spec.  Same pattern as the PNG/WAV codecs in
``media_codecs.py``.

Scope (deliberately minimal, spec-complete within it):

- parse: RIFF 'AVI ' files; 'avih' main header (frame interval,
  count), first video stream's 'strh' (rate/scale -> fps), '00dc'/
  '00db' chunks inside 'movi' (including inside 'rec ' groups) in
  stream order; the optional 'idx1' index is ignored (chunk order is
  authoritative for our writes and for every MJPEG writer that
  matters).  Non-MJPEG streams raise ``NotImplementedError`` naming
  the fourcc.
- write: a canonical single-video-stream MJPEG AVI from a list of
  JPEG payloads + fps — 'hdrl' (avih + one 'strl' with strh/strf
  BITMAPINFOHEADER), 'movi' with word-aligned '00dc' chunks, 'idx1'.
  Deterministic bytes for identical input.

These run inside Arrow-batched ``mapInPandas`` workers, so everything
is a pure function of ``bytes`` with no Spark imports.

Reference provenance: the reference engine (BlueBrain/parquet-converters)
has no media surface; this extends the engine for LLM-pipeline
multimodal columns (brief § multimodal).
"""

from __future__ import annotations

import struct

_MJPG_FOURCCS = (b"MJPG", b"mjpg", b"dmb1")


def is_avi(data: bytes) -> bool:
    return (
        len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI "
    )


def _chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_len) for the chunks in a LIST
    body; handles the word alignment the RIFF spec requires."""
    pos = start
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        yield tag, pos + 8, length
        pos += 8 + length + (length & 1)


def parse_avi_mjpeg(data: bytes) -> tuple[float, list[bytes]]:
    """Parse an MJPEG AVI to ``(fps, [jpeg_frame_bytes, ...])``.

    Frame order is chunk order in 'movi' ('rec ' groups flattened) —
    what every MJPEG writer produces.  The video fourcc is checked
    from the stream format header; non-MJPEG codecs raise
    ``NotImplementedError`` naming the fourcc so the multimodal gate
    error is precise.  Malformed input raises ``ValueError``, never a
    bare IndexError/struct.error."""
    try:
        return _parse_avi_mjpeg(data)
    except (IndexError, struct.error) as e:
        raise ValueError(f"AVI: corrupt or truncated stream ({e})") from e


def _parse_avi_mjpeg(data: bytes) -> tuple[float, list[bytes]]:
    if not is_avi(data):
        raise ValueError("AVI: not a RIFF/AVI file")
    fps = 0.0
    frames: list[bytes] = []
    video_stream: int | None = None
    stream_no = 0

    def walk(start: int, end: int):
        nonlocal fps, video_stream, stream_no
        for tag, at, length in _chunks(data, start, end):
            body_end = at + length
            if tag == b"LIST":
                ltype = data[at : at + 4]
                if ltype == b"strl":
                    _scan_strl(at + 4, body_end)
                    stream_no += 1
                else:  # hdrl / movi / rec  / odml ...
                    walk(at + 4, body_end)
            elif tag == b"avih" and fps == 0.0:
                (usec_per_frame,) = struct.unpack("<I", data[at : at + 4])
                if usec_per_frame:
                    fps = 1e6 / usec_per_frame
            elif len(tag) == 4 and tag[2:4] in (b"dc", b"db"):
                if video_stream is not None and tag[:2] == (
                    b"%02d" % video_stream
                ):
                    frames.append(bytes(data[at:body_end]))

    def _scan_strl(start: int, end: int):
        nonlocal fps, video_stream
        fcc_type = fcc_handler = None
        rate = scale = 0
        for tag, at, length in _chunks(data, start, end):
            if tag == b"strh":
                fcc_type = data[at : at + 4]
                fcc_handler = data[at + 4 : at + 8]
                scale, rate = struct.unpack("<II", data[at + 20 : at + 28])
            elif tag == b"strf" and fcc_type == b"vids":
                # BITMAPINFOHEADER: biCompression at offset 16
                compression = data[at + 16 : at + 20]
                if (
                    compression not in _MJPG_FOURCCS
                    and fcc_handler not in _MJPG_FOURCCS
                ):
                    name = (compression or fcc_handler or b"?").decode(
                        "ascii", "replace"
                    )
                    raise NotImplementedError(
                        f"AVI: video codec {name!r} is not implemented — "
                        "only MJPG (motion-JPEG; per-frame baseline JPEG)"
                    )
        if fcc_type == b"vids" and video_stream is None:
            video_stream = stream_no
            if rate and scale:
                fps = rate / scale

    walk(12, len(data))
    if video_stream is None:
        raise ValueError("AVI: no video stream found")
    if not fps:
        raise ValueError("AVI: no frame rate in avih/strh")
    return fps, frames


def encode_avi_mjpeg(
    frames: list[bytes], fps: float = 10.0, width: int = 0, height: int = 0
) -> bytes:
    """Write a canonical single-stream MJPEG AVI.  ``width``/``height``
    default to the first frame's JPEG header dimensions (parsed via
    the sibling codec) so callers can pass bare JPEG payload lists."""
    if not frames:
        raise ValueError("AVI: need at least one frame")
    if not width or not height:
        from parquet_converters_spark.functions.jpeg_codec import decode_jpeg

        # header-only need: decode is cheap at thumbnail sizes and
        # keeps this module free of a separate header parser
        width, height, _, _ = decode_jpeg(frames[0])[0:4]

    def chunk(tag: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    usec = int(round(1e6 / fps))
    maxbytes = max(len(f) for f in frames)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        usec,  # dwMicroSecPerFrame
        maxbytes * int(fps) + 1,  # dwMaxBytesPerSec (advisory)
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        len(frames),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        maxbytes,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIII",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1000,  # dwScale
            int(round(fps * 1000)),  # dwRate (rate/scale = fps)
            0,  # dwStart
            len(frames),  # dwLength
            maxbytes,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (-1 = default)
            0,  # dwSampleSize (0 = variable)
            0,  # rcFrame packed as one dword pair-free placeholder
        )
        + struct.pack("<HH", width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        width,
        height,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        width * height * 3,  # biSizeImage (advisory)
        0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_body)
    # idx1: offsets are relative to the start of 'movi' list data
    idx = bytearray()
    off = 4  # past the 'movi' fourcc
    for f in frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) & 1)
    idx1 = chunk(b"idx1", bytes(idx))
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
