"""Matroska/WebM block demuxer — a header-structure walk that hands
the FIRST video track's coded per-frame payloads to the codec layer,
so in-repo-decodable codecs (VP8 keyframes via the RFC 6386 decoder)
can ride ``sample_frames`` without any external tool.

RFC 8794 (EBML) + the public Matroska element IDs; the vint reader is
shared with ``media_probe`` so the demux walk and the triage walk can
never disagree about element framing.  Reference-parity analogue: a
container *reader* in the same sense as the reference's header-probe/
version dispatch (/root/reference/src/touches/touch_reader.cpp:95-117)
— structure parsed from the public spec, payloads passed through
untouched.

Scope (named, like every capability gate in this repo): SimpleBlock
and BlockGroup/Block without lacing ON THE VIDEO TRACK.  A laced
*video* stream raises ``NotImplementedError`` naming the lacing mode
— better rejected than misframed; laced blocks on OTHER tracks
(ffmpeg routinely Xiph-laces small Vorbis audio packets) are simply
skipped, they are not ours to demux (r15 review finding: rejecting
the whole file for laced audio failed real-world WebM whose video
track was fully supported).
"""

from __future__ import annotations

import struct

from parquet_converters_spark.functions.media_probe import _ebml_vint


def is_matroska(data: bytes) -> bool:
    return bytes(data[:4]) == b"\x1a\x45\xdf\xa3"


def parse_matroska_video_blocks(data: bytes):
    """Demux the first video track -> ``(codec_id, width, height,
    blocks)`` where ``blocks`` is ``[(ts_ms, is_keyframe, payload),
    ...]`` in stream order.

    ``ts_ms`` is the block timecode (cluster base + relative) scaled
    by TimecodeScale to milliseconds.  Keyframe detection: the
    SimpleBlock keyframe flag (0x80); for BlockGroup/Block, the
    absence of a ReferenceBlock element (a block that references
    nothing is independently decodable).  Raises ``ValueError`` on a
    non-Matroska payload and ``NotImplementedError`` on laced video
    blocks.
    """
    d = bytes(data)
    if not is_matroska(d):
        raise ValueError("matroska_demux: not an EBML/Matroska stream")
    n = len(d)
    scale = [1_000_000]  # ns per tick (TimecodeScale default)
    video = {}  # first video track: number/codec/width/height
    blocks: list = []
    laced: dict = {}  # track number -> first lacing mode seen

    def block_fields(lo, hi):
        """(track_number, relative_timecode, flags, payload_start) of
        one [Simple]Block body, or None on malformed framing."""
        b0 = d[lo] if lo < hi else 0
        if not b0:
            return None
        ln = 9 - b0.bit_length()
        if lo + ln + 3 > hi:
            return None
        raw = int.from_bytes(d[lo : lo + ln], "big")
        tn = raw & ((1 << (7 * ln)) - 1)
        (rel,) = struct.unpack_from(">h", d, lo + ln)
        flags = d[lo + ln + 2]
        return tn, rel, flags, lo + ln + 3

    def walk(lo, hi, depth, ctx):
        # ctx: {"track": per-TrackEntry dict, "cluster_tc": int,
        #       "group": per-BlockGroup dict}
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
            if eid in (0x18538067, 0x1549A966, 0x1654AE6B):
                walk(body, end, depth + 1, dict(ctx))
            elif eid == 0xAE:  # TrackEntry
                t = {}
                walk(body, end, depth + 1, {**ctx, "track": t})
                if t.get("type") == 1 and not video:
                    video.update(t)
            elif eid in (0xE0, 0xE1):  # Video / Audio settings
                walk(body, end, depth + 1, dict(ctx))
            elif eid == 0x1F43B675:  # Cluster
                walk(body, end, depth + 1,
                     {**ctx, "cluster_tc": 0})
            elif eid == 0xA0:  # BlockGroup
                g = {"block": None, "referenced": False}
                walk(body, end, depth + 1, {**ctx, "group": g})
                if g["block"] is not None:
                    tn, ts_ticks, payload = g["block"]
                    blocks.append(
                        (tn, ts_ticks, not g["referenced"], payload))
            elif eid == 0x2AD7B1:  # TimecodeScale
                scale[0] = int.from_bytes(d[body:end], "big")
            elif eid == 0xE7:  # Cluster Timecode
                ctx["cluster_tc"] = int.from_bytes(d[body:end], "big")
            elif eid == 0xD7 and "track" in ctx:  # TrackNumber
                ctx["track"]["number"] = int.from_bytes(
                    d[body:end], "big")
            elif eid == 0x83 and "track" in ctx:  # TrackType
                # bound by the ELEMENT end, not the buffer: a
                # zero-size TrackType must read as 0, not steal the
                # next element's first byte as the track type
                ctx["track"]["type"] = d[body] if body < end else 0
            elif eid == 0x86 and "track" in ctx:  # CodecID
                ctx["track"]["codec"] = d[body:end].decode(
                    "ascii", "replace")
            elif eid == 0xB0 and "track" in ctx:  # PixelWidth
                ctx["track"]["width"] = int.from_bytes(
                    d[body:end], "big")
            elif eid == 0xBA and "track" in ctx:  # PixelHeight
                ctx["track"]["height"] = int.from_bytes(
                    d[body:end], "big")
            elif eid == 0xFB and "group" in ctx:  # ReferenceBlock
                ctx["group"]["referenced"] = True
            elif eid in (0xA3, 0xA1):  # SimpleBlock / Block
                f = block_fields(body, end)
                if f is not None:
                    tn, rel, flags, pstart = f
                    # once the video track is known, other tracks'
                    # blocks are skipped OUTRIGHT — never sliced,
                    # never lacing-checked (not ours to demux)
                    vnum = video.get("number")
                    if vnum is not None and tn != vnum:
                        p = end
                        continue
                    lacing = (flags >> 1) & 0x3
                    if lacing:
                        laced.setdefault(tn, lacing)
                        p = end
                        continue
                    ts_ticks = ctx.get("cluster_tc", 0) + rel
                    payload = d[pstart:end]
                    if eid == 0xA3:
                        blocks.append(
                            (tn, ts_ticks, bool(flags & 0x80), payload))
                    elif "group" in ctx:
                        # bare Block: keyframe decided by the group
                        ctx["group"]["block"] = (tn, ts_ticks, payload)
                    else:  # Block outside a group: treat as delta
                        blocks.append((tn, ts_ticks, False, payload))
            p = end

    walk(0, n, 0, {})
    if not video:
        return None, None, None, []
    vnum = video.get("number")
    if vnum in laced:
        raise NotImplementedError(
            "matroska_demux: the VIDEO track uses laced blocks "
            f"(lacing mode {laced[vnum]}) — not supported; laced "
            "non-video tracks are skipped, but a laced video stream "
            "is better rejected than misframed"
        )
    ms = scale[0] / 1e6  # ms per tick
    out = [
        (int(round(ts_ticks * ms)), key, payload)
        for tn, ts_ticks, key, payload in blocks
        if tn == vnum
    ]
    return (video.get("codec"), video.get("width"),
            video.get("height"), out)
