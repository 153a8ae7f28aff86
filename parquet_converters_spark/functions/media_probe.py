"""Cheap media metadata probe — typed metadata without full decode.

At 100 TB the first pass over a media corpus is triage, not decode:
route/filter/partition by format and shape before paying codec cost.
``probe_media_payload`` reads ONLY structured header fields — never
entropy-coded payload — and returns a typed record;
:func:`probe_media` maps it over a payload DataFrame with Arrow
batching.  Cost contract: O(header) for most families; for Matroska
the r15 block-cadence count walks every block HEADER (constant work
per block, payload skipped via element sizes — linear in block count,
still zero codec cost), the price of an exact frame count.

Probed per family:

- **images** (PNG, JPEG incl. progressive, GIF, BMP, WebP
  VP8/VP8L/VP8X, TIFF either endian): width/height/channels from the
  header fields alone — the JPEG probe walks markers to the first
  SOF, the TIFF probe parses the first IFD, WebP reads the
  per-variant dimension encoding.
- **audio** (WAV, Sun AU, AIFF/AIFC, FLAC): sample rate / channels /
  bit depth / duration (seconds, when the header carries a length).
- **video** (AVI): dims + frame count + fps from ``avih``/``strh``,
  codec fourcc from the first ``vids`` stream header.  For the
  ISO-BMFF and Matroska containers (r15), per-track video depth
  without any decoder: codec (VisualSampleEntry fourcc / CodecID),
  frame count (stts/stsz sample counts; SimpleBlock cadence), and
  frame rate (stts deltas over the mdhd timescale; DefaultDuration).
- **MPEG audio (MP3/MP2/MP1)**: full frame-header parse (ISO/IEC
  11172-3 §2.4.1.3 + the MPEG-2 LSF extension) — version, layer,
  sample rate, channels, declared bitrate — plus duration from a
  Xing/Info or VBRI VBR tag's frame count when present, else the
  CBR estimate from stream length (ID3v1 trailer excluded).  Still
  header-only: no decoder, no entropy data touched — the same
  contract as the reference's header-probe/version-dispatch
  (/root/reference/src/touches/touch_reader.cpp:95-117).
- **containers** (Ogg incl. the Vorbis/Opus/FLAC mappings,
  ISO-BMFF/MP4/M4A, Matroska/WebM): codec identity, rate/channels,
  duration (Ogg granule positions, mvhd, Segment Info), dims and
  kind from the container's own header structures — again without
  touching any coded payload.
- **triage-only** (Flash Video): format identified by magic so a
  pipeline can route it to an external decoder; shape fields null.

Unknown or too-short payloads yield ``format='unknown'`` rather than
raising — triage must never fail a 100 TB scan (per-payload decode
errors belong to decode_media's contract, not the probe's).
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PROBE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("format", StringType(), False),
        StructField("kind", StringType(), False),  # image|audio|video|other
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("bit_depth", IntegerType(), True),
        # declared COMPRESSED bitrate (bits/s) — an independent header
        # field only compressed formats carry (MP3 frame header); PCM
        # formats leave it null (their rate*ch*bits is derivable)
        StructField("bit_rate", IntegerType(), True),
        StructField("duration_s", DoubleType(), True),
        # r15 video track depth (header-only, no decoder): primary
        # track's codec identity (ISO-BMFF sample-entry fourcc /
        # Matroska CodecID / AVI strh handler), frame count (stts or
        # stsz sample counts; Matroska block cadence; avih), and
        # frame rate (stts deltas over the mdhd timescale; Matroska
        # DefaultDuration; avih usec-per-frame)
        StructField("codec", StringType(), True),
        StructField("fps", DoubleType(), True),
        StructField("n_frames", LongType(), True),
        StructField("n_bytes", LongType(), False),
    ]
)

_MP3_RATES = {0: 44100, 1: 48000, 2: 32000}  # MPEG1; /2 (V2), /4 (V2.5)

# ISO/IEC 11172-3 Table B.1 / 13818-3 bitrate tables, kbit/s, indexed
# 1..14 (0 = "free format" -> unknown, 15 = forbidden).  Keyed by
# (is_mpeg1, layer).  MPEG-2 and 2.5 (LSF) share one Layer II/III row.
_MPEG_KBPS = {
    (True, 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320,
                352, 384, 416, 448),
    (True, 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                224, 256, 320, 384),
    (True, 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160,
                192, 224, 256, 320),
    (False, 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160,
                 176, 192, 224, 256),
    (False, 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96,
                 112, 128, 144, 160),
}
_MPEG_KBPS[(False, 3)] = _MPEG_KBPS[(False, 2)]


def _probe_mpeg_audio(d: bytes, hdr_at: int) -> dict:
    """Parse one MPEG audio frame header (+ Xing/Info/VBRI VBR tag)
    at ``hdr_at``.  Returns the typed triage record; fields the
    header can't supply stay null (free-format bitrate, truncated
    tag)."""
    n = len(d)
    out = dict(format="mp3", kind="audio")
    if hdr_at + 4 > n or d[hdr_at] != 0xFF or \
            (d[hdr_at + 1] & 0xE0) != 0xE0:
        return out  # ID3 tag with no parseable frame after it
    b1, b2, b3 = d[hdr_at + 1], d[hdr_at + 2], d[hdr_at + 3]
    version = (b1 >> 3) & 0x3   # 0=MPEG2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    layer_code = (b1 >> 1) & 0x3  # 1=III, 2=II, 3=I (0 reserved)
    if version == 1 or layer_code == 0:
        return out  # reserved fields: magic matched, header didn't
    layer = 4 - layer_code  # 1, 2 or 3
    out["format"] = {1: "mp1", 2: "mp2", 3: "mp3"}[layer]
    sr_code = (b2 >> 2) & 0x3
    base = _MP3_RATES.get(sr_code)
    if base is None:
        return out
    rate = base if version == 3 else (
        base // 2 if version == 2 else base // 4
    )
    mono = ((b3 >> 6) & 0x3) == 3
    out.update(sample_rate=rate, channels=1 if mono else 2)
    is_v1 = version == 3
    br_idx = (b2 >> 4) & 0xF
    bps = None
    if br_idx not in (0, 15):  # 0 = free format, 15 = forbidden
        bps = _MPEG_KBPS[(is_v1, layer)][br_idx - 1] * 1000
        out["bit_rate"] = bps
    # samples per frame: L1 384; L2 1152; L3 1152 (MPEG1) / 576 (LSF)
    spf = 384 if layer == 1 else (
        1152 if (layer == 2 or is_v1) else 576
    )
    # VBR tags give the EXACT frame count (needs only rate + layer, so
    # it works for free-format streams too).  Xing/Info sits after the
    # Layer III side info; VBRI at a fixed +32 (Fraunhofer spec).
    frames = None
    if layer == 3:
        # protection_bit=0 (b1 bit 0 clear) means a 16-bit CRC sits
        # between the header and the side info (ISO/IEC 11172-3
        # §2.4.1.3) — both VBR tag probes must step over it
        crc2 = 0 if (b1 & 1) else 2
        side = (17 if mono else 32) if is_v1 else (9 if mono else 17)
        p = hdr_at + 4 + crc2 + side
        if d[p : p + 4] in (b"Xing", b"Info") and p + 12 <= n:
            (flags,) = struct.unpack_from(">I", d, p + 4)
            if flags & 1:
                (frames,) = struct.unpack_from(">I", d, p + 8)
        else:
            p = hdr_at + 4 + crc2 + 32
            if d[p : p + 4] == b"VBRI" and p + 18 <= n:
                (frames,) = struct.unpack_from(">I", d, p + 14)
    if frames is not None:
        out["duration_s"] = frames * spf / rate
    elif bps is not None:
        # CBR estimate: declared bitrate over the audio byte span
        # (leading ID3v2 already behind hdr_at; drop an ID3v1 trailer)
        nbytes = n - hdr_at
        if n >= hdr_at + 128 and d[n - 128 : n - 125] == b"TAG":
            nbytes -= 128
        out["duration_s"] = nbytes * 8 / bps
    return out


def _flac_streaminfo(packed8: bytes):
    """The 8 packed STREAMINFO bytes starting at the sample-rate field
    -> (rate, channels, bits, total_samples) — shared by the bare-FLAC
    and Ogg-FLAC branches so the two can never diverge."""
    packed = int.from_bytes(packed8, "big")
    rate = packed >> 44
    ch = ((packed >> 41) & 0x7) + 1
    bits = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    return rate, ch, bits, total


def _img(fmt, w, h, c):
    return dict(format=fmt, kind="image", width=w, height=h, channels=c)


def _aud(fmt, rate, ch, bits, dur):
    return dict(format=fmt, kind="audio", sample_rate=rate, channels=ch,
                bit_depth=bits, duration_s=dur)


#: PROBE_SCHEMA's IntegerType columns — values a lying header pushes
#: outside int32 are nulled (see _sanitize).
_INT32_FIELDS = ("width", "height", "channels", "sample_rate",
                 "bit_depth", "bit_rate")


def _sanitize(rec: dict) -> dict:
    """Clamp the record to PROBE_SCHEMA's types: a hostile/corrupt
    header can declare a 2^40 channel count or a NaN duration, and an
    out-of-range value would blow up the Arrow int32 conversion INSIDE
    mapInPandas — failing the scan the triage contract says never
    fails.  Such values are header lies; null is the honest answer."""
    for k in _INT32_FIELDS:
        v = rec.get(k)
        if v is not None and not (0 <= v < 2**31):
            rec[k] = None
    for k in ("duration_s", "fps"):
        v = rec.get(k)
        if v is not None and not (0 <= v < 1e12):  # NaN/inf/absurd
            rec[k] = None
    nf = rec.get("n_frames")
    if nf is not None and not (0 <= nf < 2**63):
        rec["n_frames"] = None
    return rec


def probe_media_payload(data: bytes) -> dict:
    """Header-only probe of one payload; never raises on junk."""
    try:
        return _sanitize(_probe(bytes(data)))
    except Exception:
        return dict(format="unknown", kind="other")


def _probe(d: bytes) -> dict:
    n = len(d)
    if n < 12:
        return dict(format="unknown", kind="other")
    # ---- images ----
    if d[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", d[16:24])
        color = d[25]
        # palette (3) reports 3: what a decode materializes
        ch = {0: 1, 2: 3, 3: 3, 4: 2, 6: 4}.get(color)
        return _img("png", w, h, ch)
    if d[:2] == b"\xff\xd8":
        pos = 2
        while pos + 4 <= n:
            if d[pos] != 0xFF:
                break
            marker = d[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            (seg,) = struct.unpack(">H", d[pos + 2 : pos + 4])
            if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                          0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                h, w = struct.unpack(">HH", d[pos + 5 : pos + 9])
                return _img("jpeg", w, h, d[pos + 9])
            pos += 2 + seg
        return _img("jpeg", None, None, None)
    if d[:4] == b"GIF8":
        w, h = struct.unpack("<HH", d[6:10])
        return _img("gif", w, h, 3)
    if d[:2] == b"BM":
        w, h = struct.unpack("<ii", d[18:26])
        (bpp,) = struct.unpack("<H", d[28:30])
        return _img("bmp", w, abs(h), max(1, bpp // 8))
    if d[:4] == b"RIFF" and d[8:12] == b"WEBP":
        four = d[12:16]
        if four == b"VP8X" and n >= 30:
            w = 1 + (d[24] | (d[25] << 8) | (d[26] << 16))
            h = 1 + (d[27] | (d[28] << 8) | (d[29] << 16))
            return _img("webp", w, h, 4 if d[20] & 0x10 else 3)
        if four == b"VP8L" and n >= 25:
            bits = int.from_bytes(d[21:25], "little")
            w = (bits & 0x3FFF) + 1
            h = ((bits >> 14) & 0x3FFF) + 1
            return _img("webp", w, h, 4 if (bits >> 28) & 1 else 3)
        if four == b"VP8 " and n >= 30 and d[23:26] == b"\x9d\x01\x2a":
            (w,) = struct.unpack("<H", d[26:28])
            (h,) = struct.unpack("<H", d[28:30])
            return _img("webp", w & 0x3FFF, h & 0x3FFF, 3)
        return _img("webp", None, None, None)
    if d[:4] in (b"II*\x00", b"MM\x00*"):
        from parquet_converters_spark.functions.tiff_codec import _read_ifd

        bo = "<" if d[:2] == b"II" else ">"
        tags = _read_ifd(d, bo)
        w = tags.get(256, [None])[0]
        h = tags.get(257, [None])[0]
        spp = tags.get(277, [1])[0]
        return _img("tiff", w, h, spp)
    # ---- audio ----
    if d[:4] == b"RIFF" and d[8:12] == b"WAVE":
        pos, rate, ch, bits, nbytes = 12, None, None, None, None
        while pos + 8 <= n:
            tag = d[pos : pos + 4]
            (ln,) = struct.unpack("<I", d[pos + 4 : pos + 8])
            if tag == b"fmt ":
                _fmt, ch, rate = struct.unpack(
                    "<HHI", d[pos + 8 : pos + 16]
                )
                (bits,) = struct.unpack("<H", d[pos + 22 : pos + 24])
            elif tag == b"data":
                nbytes = ln
            pos += 8 + ln + (ln & 1)
        dur = None
        if rate and ch and bits and nbytes is not None:
            dur = nbytes / (rate * ch * max(bits // 8, 1))
        return _aud("wav", rate, ch, bits, dur)
    if d[:4] == b".snd":
        off, size, enc, rate, ch = struct.unpack_from(">IIIII", d, 4)
        bits = {1: 8, 2: 8, 3: 16, 4: 24, 5: 32, 27: 8}.get(enc)
        dur = None
        if size != 0xFFFFFFFF and rate and ch and bits:
            dur = size / (rate * ch * max(bits // 8, 1))
        return _aud("au", rate, ch, bits, dur)
    if d[:4] == b"FORM" and d[8:12] in (b"AIFF", b"AIFC"):
        from parquet_converters_spark.functions.audio_codecs import (
            _read_extended80,
        )

        pos = 12
        while pos + 8 <= n:
            tag = d[pos : pos + 4]
            (ln,) = struct.unpack(">I", d[pos + 4 : pos + 8])
            if tag == b"COMM":
                ch, frames, bits = struct.unpack(
                    ">HIH", d[pos + 8 : pos + 16]
                )
                rate = _read_extended80(d[pos + 16 : pos + 26])
                dur = frames / rate if rate else None
                return _aud("aiff", rate, ch, bits, dur)
            pos += 8 + ln + (ln & 1)
        return _aud("aiff", None, None, None, None)
    if d[:4] == b"fLaC":
        rate, ch, bits, total = _flac_streaminfo(d[18:26])
        dur = total / rate if rate and total else None
        return _aud("flac", rate, ch, bits, dur)
    # ---- video ----
    if d[:4] == b"RIFF" and d[8:12] == b"AVI ":
        out = dict(format="avi", kind="video")
        # avih lives in the first LIST hdrl: micro-sec/frame, ...,
        # total frames, ..., width, height
        idx = d.find(b"avih")
        if 0 <= idx and idx + 40 <= n:
            usec, _mx, _pad, _fl, frames = struct.unpack(
                "<IIIII", d[idx + 8 : idx + 28]
            )
            w, h = struct.unpack("<II", d[idx + 40 : idx + 48])
            out.update(width=w, height=h, n_frames=frames)
            if usec:
                out["duration_s"] = frames * usec / 1e6
                out["fps"] = 1e6 / usec
        # r15: codec identity from the first 'vids' stream header
        # (fccHandler fourcc, e.g. MJPG)
        sidx = d.find(b"strh")
        while sidx >= 0 and sidx + 16 <= n:
            if d[sidx + 8 : sidx + 12] == b"vids":
                fcc = d[sidx + 12 : sidx + 16]
                if fcc.strip(b"\x00 "):
                    out["codec"] = fcc.decode(
                        "ascii", "replace").strip().lower()
                break
            sidx = d.find(b"strh", sidx + 4)
        return out
    # ---- MPEG audio (header parse, no decode) ----
    if d[:3] == b"ID3" or (d[0] == 0xFF and (d[1] & 0xE0) == 0xE0):
        hdr_at = 0
        if d[:3] == b"ID3":
            # skip the syncsafe-length ID3v2 tag to the first frame
            tag_len = ((d[6] & 0x7F) << 21) | ((d[7] & 0x7F) << 14) | \
                ((d[8] & 0x7F) << 7) | (d[9] & 0x7F)
            hdr_at = 10 + tag_len
        return _probe_mpeg_audio(d, hdr_at)
    # ---- containers (header walk, no decode) ----
    if d[:4] == b"OggS":
        return _probe_ogg(d)
    if d[:4] == b"\x1a\x45\xdf\xa3":
        return _probe_ebml(d)
    if d[4:8] == b"ftyp":
        return _probe_isobmff(d)
    if d[:4] == b"FLV\x01":
        return _probe_flv(d)
    return dict(format="unknown", kind="other")


def _probe_flv(d: bytes) -> dict:
    """Flash Video probe: kind from the header's audio/video flags,
    duration from the first script tag's onMetaData AMF0 'duration'
    double (the standard position for it — written by every FLV
    muxer).  Adobe FLV spec §E.2-E.4; header fields only."""
    flags = d[4] if len(d) > 4 else 0
    has_audio, has_video = bool(flags & 4), bool(flags & 1)
    out = dict(
        format="flv",
        kind="audio" if has_audio and not has_video else "video",
    )
    n = len(d)
    if n < 9:
        return out
    (hdr_len,) = struct.unpack_from(">I", d, 5)
    p = hdr_len + 4  # skip header + first PreviousTagSize
    # walk a few tags for the script tag (type 18); data tags carry
    # entropy payload the probe must not chase, so bound the walk
    for _ in range(4):
        if p + 11 > n:
            return out
        ttype = d[p]
        dsize = int.from_bytes(d[p + 1 : p + 4], "big")
        body = p + 11
        if ttype == 18:
            blob = d[body : min(body + dsize, n)]
            i = blob.find(b"onMetaData")
            if i >= 0:
                j = blob.find(b"\x00\x08duration\x00", i)
                if j >= 0 and j + 11 + 8 <= len(blob):
                    (dur,) = struct.unpack_from(">d", blob, j + 11)
                    if dur > 0:
                        out["duration_s"] = dur
            return out
        p = body + dsize + 4  # next tag (skip PreviousTagSize)
    return out


def _probe_ogg(d: bytes) -> dict:
    """Ogg container probe (RFC 3533 page framing): identify the
    mapped codec from the first page's ID packet — Vorbis I §4.2.2,
    OpusHead per RFC 7845 §5.1, Ogg-FLAC mapping 1.0 — and take the
    stream duration from the LAST page's granule position (PCM frame
    count for Vorbis/FLAC; 48 kHz ticks minus pre-skip for Opus).
    Header fields only; no entropy data is touched."""
    out = dict(format="ogg", kind="audio")
    n = len(d)
    if n < 28:
        return out
    nseg = d[26]
    p = 27 + nseg  # first packet starts after the segment table
    pkt = d[p : p + 64]
    rate = ch = None
    gps_rate = None  # granule-position time base
    preskip = 0
    if pkt[:7] == b"\x01vorbis" and len(pkt) >= 28:
        out["format"] = "ogg/vorbis"
        ch = pkt[11]
        rate = int.from_bytes(pkt[12:16], "little")
        br_nom = int.from_bytes(pkt[20:24], "little", signed=True)
        if br_nom > 0:
            out["bit_rate"] = br_nom
        gps_rate = rate
    elif pkt[:8] == b"OpusHead" and len(pkt) >= 19:
        out["format"] = "ogg/opus"
        ch = pkt[9]
        preskip = int.from_bytes(pkt[10:12], "little")
        rate = int.from_bytes(pkt[12:16], "little") or 48000
        gps_rate = 48000  # Opus granules are ALWAYS 48 kHz ticks
    elif pkt[:5] == b"\x7fFLAC" and len(pkt) >= 44 and \
            pkt[9:13] == b"fLaC":
        # mapping header (5+2+2) + 'fLaC' + block header + STREAMINFO
        out["format"] = "ogg/flac"
        rate, ch, bits, _total = _flac_streaminfo(pkt[27:35])
        out["bit_depth"] = bits
        gps_rate = rate
    if ch:
        out["channels"] = ch
    if rate:
        out["sample_rate"] = rate
    if gps_rate:
        # last page's granule position.  'OggS' can occur by chance
        # inside entropy-coded packet data, so scan backward until the
        # candidate looks like a real page header (version byte 0,
        # header-type flags within spec) — not just the magic.
        q = d.rfind(b"OggS", 1)
        while q > 0:
            if q + 27 <= n and d[q + 4] == 0 and d[q + 5] <= 7:
                gp = int.from_bytes(d[q + 6 : q + 14], "little")
                if 0 < gp < (1 << 64) - 1:
                    out["duration_s"] = max(0, gp - preskip) / gps_rate
                    break
                # -1 sentinel ("no packet ends on this page", legal on
                # continuation-only pages, RFC 3533 §6) or 0: keep
                # scanning earlier pages for a usable granule (r14
                # ADVICE) instead of silently dropping the duration
            q = d.rfind(b"OggS", 1, q)
    return out


#: VisualSampleEntry fourccs the probe names as video codecs
#: (ISO/IEC 14496-15 avc/hevc bindings, VP9-in-ISO-BMFF, AV1-ISOBMFF,
#: QuickTime MJPEG entries).
_BMFF_VIDEO_ENTRIES = (b"avc1", b"avc3", b"hvc1", b"hev1", b"vp08",
                       b"vp09", b"av01", b"mp4v", b"s263", b"mjpa",
                       b"jpeg")


def iter_boxes(d: bytes, lo: int, hi: int):
    """Iterate ISO-BMFF boxes in ``d[lo:hi]`` -> (type, body, end)
    (ISO/IEC 14496-12 §4.2: 32-bit size, 64-bit largesize form,
    size 0 = to-end-of-file).  Shared by the triage probe and the
    sample-table demux (bmff_demux) so the two walks can never
    disagree about box framing."""
    p = lo
    while p + 8 <= hi:
        (sz,) = struct.unpack_from(">I", d, p)
        typ = d[p + 4 : p + 8]
        body = p + 8
        if sz == 1:
            if p + 16 > hi:
                return
            (sz,) = struct.unpack_from(">Q", d, p + 8)
            body = p + 16
        elif sz == 0:
            sz = hi - p  # box extends to end of file
        if sz < 8:
            return
        yield typ, body, min(p + sz, hi)
        p += sz


def read_mdhd_timescale(d: bytes, body: int, end: int) -> int | None:
    """Media timescale from an mdhd box body (version-dependent
    offset: +20 for v1's 64-bit times, +12 for v0 — ISO/IEC 14496-12
    §8.4.2).  Shared by the probe and bmff_demux (r15 review: the
    offset rule must live once)."""
    if body >= end:
        return None
    off = body + (20 if d[body] == 1 else 12)
    if off + 4 > end:
        return None
    return int.from_bytes(d[off : off + 4], "big")


def read_stts_entries(d: bytes, body: int, end: int):
    """Bounded (sample_count, sample_delta) entry list from an stts
    box body (§8.6.1.2) — entry count capped by the box's own size so
    a lying header cannot drive a huge loop.  Shared by the probe and
    bmff_demux."""
    if body + 8 > end:
        return []
    cnt = int.from_bytes(d[body + 4 : body + 8], "big")
    cnt = min(cnt, (end - body - 8) // 8)
    return [struct.unpack_from(">II", d, body + 8 + 8 * i)
            for i in range(cnt)]


def _probe_isobmff(d: bytes) -> dict:
    """ISO-BMFF (MP4/M4A/MOV family) probe: major brand from ftyp,
    duration from moov/mvhd (version 0 and 1 layouts), kind from the
    trak handlers (all-'soun' -> audio), rate/channels from an mp4a
    audio sample entry when one exists (ISO/IEC 14496-12 §8.2.2,
    §8.4.3, 14496-14 §5.6), and — r15 — per-track video depth from
    the sample table alone: codec fourcc + dims from the
    VisualSampleEntry (§12.1.3), frame count from stts/stsz sample
    counts (§8.6.1.2, §8.7.3.2), frame rate from the stts delta sum
    over the mdhd media timescale (§8.4.2).  All header-only."""
    brand = d[8:12].decode("ascii", "replace").strip()
    out = dict(format=f"isobmff/{brand}", kind="video")
    n = len(d)
    handlers = []
    tracks: list[dict] = []

    def boxes(lo, hi):
        return iter_boxes(d, lo, hi)

    def walk(lo, hi, depth, t=None):
        if depth > 8:
            return
        for typ, body, end in boxes(lo, hi):
            if typ == b"trak":
                t = {}
                tracks.append(t)
                walk(body, end, depth + 1, t)
                continue
            if typ == b"mvhd" and body < end:
                v = d[body]
                ts = dur = unknown = 0
                if v == 1 and body + 32 <= end:
                    ts = int.from_bytes(d[body + 20 : body + 24], "big")
                    dur = int.from_bytes(d[body + 24 : body + 32], "big")
                    unknown = (1 << 64) - 1
                elif v == 0 and body + 20 <= end:
                    ts = int.from_bytes(d[body + 12 : body + 16], "big")
                    dur = int.from_bytes(d[body + 16 : body + 20], "big")
                    unknown = (1 << 32) - 1
                if ts and dur and dur != unknown:
                    out["duration_s"] = dur / ts
            elif typ == b"hdlr" and body + 12 <= end:
                h = d[body + 8 : body + 12]
                handlers.append(h)
                if t is not None:
                    t["handler"] = h
            elif typ == b"mdhd" and t is not None:
                ts = read_mdhd_timescale(d, body, end)
                if ts is not None:
                    t["timescale"] = ts
            elif typ == b"tkhd":
                # track dims: 16.16 fixed at +76 (v0) / +88 (v1)
                off = body + (88 if d[body : body + 1] == b"\x01"
                              else 76)
                if off + 8 <= end:
                    tw = int.from_bytes(d[off : off + 2], "big")
                    th = int.from_bytes(d[off + 4 : off + 6], "big")
                    if tw and th and out.get("width") is None:
                        out["width"], out["height"] = tw, th
            elif typ == b"stts" and t is not None:
                entries = read_stts_entries(d, body, end)
                frames = sum(sc for sc, _ in entries)
                if frames:
                    t["stts_frames"] = frames
                    t["stts_ticks"] = sum(
                        sc * delta for sc, delta in entries)
            elif typ == b"stsz" and t is not None and body + 12 <= end:
                t["stsz_count"] = int.from_bytes(
                    d[body + 8 : body + 12], "big")
            elif typ in _BMFF_VIDEO_ENTRIES and end - body >= 28:
                if t is not None and "codec" not in t:
                    t["codec"] = typ.decode("ascii", "replace")
                # VisualSampleEntry: 6 reserved + dref(2), 2+2+12
                # pre_defined/reserved, then width(2) height(2)
                tw = int.from_bytes(d[body + 24 : body + 26], "big")
                th = int.from_bytes(d[body + 26 : body + 28], "big")
                if tw and th and out.get("width") is None:
                    out["width"], out["height"] = tw, th
            elif typ == b"mp4a" and end - body >= 28:
                if t is not None and "codec" not in t:
                    t["codec"] = "mp4a"
                # AudioSampleEntry: 6 reserved + dref idx(2), 8
                # reserved, channelcount(2), samplesize(2), 4 more,
                # samplerate as 16.16 fixed (integer part read)
                out["channels"] = int.from_bytes(
                    d[body + 16 : body + 18], "big")
                out["bit_depth"] = int.from_bytes(
                    d[body + 18 : body + 20], "big")
                out["sample_rate"] = int.from_bytes(
                    d[body + 24 : body + 26], "big")
                # declared avg bitrate from the nested esds box's
                # DecoderConfigDescriptor (14496-1 §7.2.6.6), reached
                # by WALKING the descriptor chain — a byte-scan for
                # tag 0x04 misfires on ES_IDs/flags containing 0x04
                e = d.find(b"esds", body, end)
                if e >= 0:
                    avg = _esds_avg_bitrate(d, e + 8, end)
                    if avg:
                        out["bit_rate"] = avg
            if typ in (b"moov", b"mdia", b"minf", b"stbl"):
                walk(body, end, depth + 1, t)
            elif typ == b"stsd":
                # version/flags(4) + entry_count(4), then sample entries
                walk(body + 8, end, depth + 1, t)

    walk(0, n, 0)
    if handlers and all(h == b"soun" for h in handlers):
        out["kind"] = "audio"
    # primary-track depth: the first video track (by handler or by a
    # recognized VisualSampleEntry), else — audio-only files — the
    # first audio track's sample-entry codec
    vid = next((t for t in tracks if t.get("handler") == b"vide"
                or t.get("codec") in
                {c.decode() for c in _BMFF_VIDEO_ENTRIES}), None)
    primary = vid or next((t for t in tracks if "codec" in t), None)
    if primary is not None:
        if primary.get("codec"):
            out["codec"] = primary["codec"]
        frames = primary.get("stts_frames") or primary.get("stsz_count")
        if frames and vid is primary:
            out["n_frames"] = frames
            ts, ticks = primary.get("timescale"), \
                primary.get("stts_ticks")
            if ts and ticks:
                out["fps"] = primary["stts_frames"] * ts / ticks
    return out


def _esds_avg_bitrate(d: bytes, p: int, end: int) -> int | None:
    """avgBitrate from an esds body at ``p`` (after the box header's
    version/flags) by walking the MPEG-4 descriptor chain (ISO/IEC
    14496-1 §7.2.6): ES_Descriptor tag 0x03 -> expandable length ->
    ES_ID(2) + flags(1) + optional dependsOn/URL/OCR fields ->
    DecoderConfigDescriptor tag 0x04 -> expandable length ->
    objType(1) streamType(1) bufferSizeDB(3) maxBitrate(4)
    avgBitrate(4).  Every read bounds-checked against the mp4a box
    ``end``; malformed chains return None."""

    def explen(q):  # expandable length: high bit continues
        while q < end and d[q] & 0x80:
            q += 1
        return q + 1 if q < end else None

    if p >= end or d[p] != 0x03:
        return None
    q = explen(p + 1)
    if q is None or q + 3 > end:
        return None
    flags = d[q + 2]
    q += 3
    if flags & 0x80:  # streamDependenceFlag: dependsOn_ES_ID(2)
        q += 2
    if flags & 0x40:  # URL_Flag: URLlength(1) + URLstring
        if q >= end:
            return None
        q += 1 + d[q]
    if flags & 0x20:  # OCRstreamFlag: OCR_ES_Id(2)
        q += 2
    if q >= end or d[q] != 0x04:
        return None
    q = explen(q + 1)
    if q is None or q + 13 > end:
        return None
    return int.from_bytes(d[q + 9 : q + 13], "big")


#: EBML master elements the probe descends into (Matroska/WebM).
_EBML_MASTERS = {
    0x1A45DFA3,  # EBML header
    0x18538067,  # Segment
    0x1549A966,  # Info
    0x1654AE6B,  # Tracks
    0xE0,        # Video
    0xE1,        # Audio
    0x1F43B675,  # Cluster (r15: block cadence)
    0xA0,        # BlockGroup
}


def _ebml_vint(d: bytes, p: int, keep_marker: bool):
    """One EBML variable-length integer at ``p`` -> (value, end) or
    (None, p) on malformed input.  IDs keep their marker bit (they are
    compared with it); sizes clear it.  All-ones sizes mean 'unknown'
    and come back as None with the END position (caller treats the
    element as running to end-of-data)."""
    if p >= len(d) or d[p] == 0:
        return None, p
    ln = 9 - d[p].bit_length()
    if p + ln > len(d):
        return None, p
    raw = int.from_bytes(d[p : p + ln], "big")
    if keep_marker:
        return raw, p + ln
    val = raw & ((1 << (7 * ln)) - 1)
    if val == (1 << (7 * ln)) - 1:
        return None, p + ln  # unknown size
    return val, p + ln


def _probe_ebml(d: bytes) -> dict:
    """Matroska/WebM probe (RFC 8794 EBML + the Matroska element IDs):
    DocType from the EBML header, duration from Segment/Info
    (Duration float x TimecodeScale ns), kind + audio shape / video
    dims from the first TrackEntry, and — r15 — video depth without
    any decoder: CodecID per track, frame rate from DefaultDuration
    (ns per frame), frame count from the SimpleBlock/Block cadence
    (each block header carries its track number as a vint; the coded
    payload itself is skipped via the element size — header-only)."""
    out = dict(format="matroska", kind="video")
    n = len(d)
    scale = [1_000_000]  # TimecodeScale default, ns per tick
    tracks: list[dict] = []
    block_counts: dict[int, int] = {}

    def walk(lo, hi, depth, t=None):
        if depth > 6:
            return
        p = lo
        while p < hi:
            eid, q = _ebml_vint(d, p, keep_marker=True)
            if eid is None:
                return
            size, body = _ebml_vint(d, q, keep_marker=False)
            end = hi if size is None else min(body + size, hi)
            if body >= hi:
                return
            if eid == 0xAE:  # TrackEntry: fresh per-track context
                t = {}
                tracks.append(t)
                walk(body, end, depth + 1, t)
            elif eid in _EBML_MASTERS:
                walk(body, end, depth + 1, t)
            elif eid == 0x4282:  # DocType
                out["format"] = d[body:end].decode("ascii", "replace")
            elif eid == 0x2AD7B1:  # TimecodeScale
                scale[0] = int.from_bytes(d[body:end], "big")
            elif eid == 0x4489:  # Duration (float 4 or 8)
                ln = end - body
                if ln in (4, 8):
                    (ticks,) = struct.unpack(
                        ">f" if ln == 4 else ">d", d[body:end])
                    out["_dur_ticks"] = ticks
            elif eid == 0x83:  # TrackType: 1 video, 2 audio
                if t is not None and body < n:
                    t["type"] = d[body]
            elif eid == 0xD7:  # TrackNumber
                if t is not None:
                    t["number"] = int.from_bytes(d[body:end], "big")
            elif eid == 0x86:  # CodecID (ascii, e.g. V_VP9, A_OPUS)
                if t is not None:
                    t["codec"] = d[body:end].decode("ascii", "replace")
            elif eid == 0x23E383:  # DefaultDuration (ns per frame)
                if t is not None:
                    t["default_dur_ns"] = int.from_bytes(
                        d[body:end], "big")
            elif eid in (0xA3, 0xA1):  # SimpleBlock / Block
                # header: track number vint (no all-ones 'unknown'
                # rule here, unlike sizes), then timecode(2) +
                # flags(1) + (if laced) a frame-count byte — the
                # payload is never read (skipped via `end`).  A laced
                # block carries count+1 FRAMES (r15 review: counting
                # it as one undercounted laced tracks).
                b0 = d[body] if body < end else 0
                if b0:
                    ln = 9 - b0.bit_length()
                    if body + ln + 3 <= end:
                        raw = int.from_bytes(d[body : body + ln], "big")
                        tn = raw & ((1 << (7 * ln)) - 1)
                        flags = d[body + ln + 2]
                        frames_in_block = 1
                        if (flags >> 1) & 0x3 and body + ln + 4 <= end:
                            frames_in_block = d[body + ln + 3] + 1
                        block_counts[tn] = \
                            block_counts.get(tn, 0) + frames_in_block
            elif eid == 0xB5:  # SamplingFrequency (float)
                ln = end - body
                if ln in (4, 8):
                    (f,) = struct.unpack(
                        ">f" if ln == 4 else ">d", d[body:end])
                    if 0 < f < 2**31:  # NaN/inf/absurd: leave null
                        out["sample_rate"] = int(f)
            elif eid == 0x9F:  # Channels
                out["channels"] = int.from_bytes(d[body:end], "big")
            elif eid == 0x6264:  # Audio/BitDepth
                out["bit_depth"] = int.from_bytes(d[body:end], "big")
            elif eid == 0xB0:  # PixelWidth
                out["width"] = int.from_bytes(d[body:end], "big")
            elif eid == 0xBA:  # PixelHeight
                out["height"] = int.from_bytes(d[body:end], "big")
            p = end

    walk(0, n, 0)
    ticks = out.pop("_dur_ticks", None)
    if ticks is not None and ticks > 0:
        out["duration_s"] = ticks * scale[0] / 1e9
    types = [t["type"] for t in tracks if "type" in t]
    if types and all(t == 2 for t in types):
        out["kind"] = "audio"
    # primary-track depth: first video track, else first audio track
    vid = next((t for t in tracks if t.get("type") == 1), None)
    primary = vid or next((t for t in tracks if "codec" in t), None)
    if primary is not None:
        if primary.get("codec"):
            out["codec"] = primary["codec"]
        if primary is vid:
            dd = primary.get("default_dur_ns")
            if dd:
                out["fps"] = 1e9 / dd
            frames = block_counts.get(primary.get("number"))
            if frames:
                out["n_frames"] = frames
            if "fps" not in out and frames and \
                    out.get("duration_s"):
                out["fps"] = frames / out["duration_s"]
    return out


def probe_media(df: DataFrame) -> DataFrame:
    """Probe every payload's typed metadata via Arrow-batched
    ``mapInPandas`` — a 1:1 narrow map (no shuffle), header-only cost
    per row, so it runs as the triage pass BEFORE any decode fan-out.
    Input: the MEDIA_SCHEMA shape (``media_id``, ``payload``)."""

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        cols = [f.name for f in PROBE_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rec = probe_media_payload(bytes(payload))
                rec["media_id"] = int(mid)
                rec["n_bytes"] = len(payload)
                rows.append([rec.get(c) for c in cols])
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, PROBE_SCHEMA)
