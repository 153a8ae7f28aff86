"""ISO-BMFF sample-table demuxer — resolves the FIRST video track's
per-sample byte ranges from the sample table alone (ISO/IEC 14496-12
§8.5-8.7: stsd/stts/stsc/stsz/stco/co64) and hands the coded sample
payloads to the codec layer, so in-repo-decodable codecs (MJPEG via
the 'jpeg' sample entry + functions/jpeg_codec.py) can ride
``sample_frames`` without any external tool.

Box framing is shared with the triage probe (``media_probe.iter_boxes``)
so the demux walk and the probe walk can never disagree.  Reference-
parity analogue: header-probe/version dispatch then typed record
extraction (/root/reference/src/touches/touch_reader.cpp:95-117) —
structure from the public spec, payload bytes passed through untouched.

Scope (named): non-fragmented files (moov sample tables; `moof`
fragments raise by name), 32-bit stco and 64-bit co64 chunk offsets,
fixed or per-sample stsz sizes.
"""

from __future__ import annotations

import struct

from parquet_converters_spark.functions.media_probe import (
    iter_boxes,
    read_mdhd_timescale,
    read_stts_entries,
)


def is_bmff(data: bytes) -> bool:
    return len(data) >= 12 and bytes(data[4:8]) == b"ftyp"


def parse_bmff_video_samples(data: bytes):
    """Demux the first video track -> ``(codec, fps, samples)`` where
    ``samples`` is ``[(ts_ms, payload), ...]`` in decode order.

    Timestamps come from the stts delta run-lengths over the mdhd
    media timescale; byte ranges from stsc (samples-per-chunk runs) ×
    stco/co64 (chunk offsets) × stsz (sample sizes).  Raises
    ``ValueError`` on a non-BMFF payload or a malformed/out-of-range
    sample table, ``NotImplementedError`` on fragmented (moof) files.
    """
    d = bytes(data)
    if not is_bmff(d):
        raise ValueError("bmff_demux: no ftyp box")
    n = len(d)
    track: dict = {}

    def walk(lo, hi, depth, t=None):
        if depth > 8:
            return
        for typ, body, end in iter_boxes(d, lo, hi):
            if typ == b"moof":
                raise NotImplementedError(
                    "bmff_demux: fragmented MP4 (moof) is not "
                    "supported — sample tables live in moov here"
                )
            if typ == b"trak":
                t = {}
                walk(body, end, depth + 1, t)
                if t.get("handler") == b"vide" and not track:
                    track.update(t)
                continue
            if t is not None:
                if typ == b"hdlr" and body + 12 <= end:
                    t["handler"] = d[body + 8 : body + 12]
                elif typ == b"mdhd":
                    ts = read_mdhd_timescale(d, body, end)
                    if ts is not None:
                        t["timescale"] = ts
                elif typ == b"stts":
                    t["stts"] = read_stts_entries(d, body, end)
                elif typ == b"stsz" and body + 12 <= end:
                    fixed = int.from_bytes(d[body + 4 : body + 8], "big")
                    cnt = int.from_bytes(d[body + 8 : body + 12], "big")
                    if fixed:
                        # allocation guard (r15 review): a lying
                        # sample_count of 2^32-1 must not build a
                        # billions-entry list — more samples than
                        # the file has bytes is impossible anyway
                        cnt = min(cnt, n // max(1, fixed) + 1)
                        t["sizes"] = [fixed] * cnt
                    else:
                        cnt = min(cnt, (end - body - 12) // 4)
                        t["sizes"] = [
                            int.from_bytes(
                                d[body + 12 + 4 * i
                                  : body + 16 + 4 * i], "big")
                            for i in range(cnt)
                        ]
                elif typ == b"stsc" and body + 8 <= end:
                    cnt = int.from_bytes(d[body + 4 : body + 8], "big")
                    cnt = min(cnt, (end - body - 8) // 12)
                    t["stsc"] = [
                        struct.unpack_from(">III", d, body + 8 + 12 * i)
                        for i in range(cnt)
                    ]
                elif typ in (b"stco", b"co64") and body + 8 <= end:
                    cnt = int.from_bytes(d[body + 4 : body + 8], "big")
                    w = 4 if typ == b"stco" else 8
                    cnt = min(cnt, (end - body - 8) // w)
                    t["chunks"] = [
                        int.from_bytes(
                            d[body + 8 + w * i : body + 8 + w * (i + 1)],
                            "big")
                        for i in range(cnt)
                    ]
                elif typ == b"stsd":
                    # first sample entry's fourcc is the codec
                    for etyp, _eb, _ee in iter_boxes(d, body + 8, end):
                        t["codec"] = etyp.decode("ascii", "replace")
                        break
            if typ in (b"moov", b"mdia", b"minf", b"stbl"):
                walk(body, end, depth + 1, t)

    walk(0, n, 0)
    if not track:
        return None, None, []
    sizes = track.get("sizes", [])
    chunks = track.get("chunks", [])
    stsc = track.get("stsc", [])
    if not sizes or not chunks or not stsc:
        return track.get("codec"), None, []
    # expand stsc runs -> samples-per-chunk for every chunk, indexed
    # by chunk number: ISO 14496-12 8.7.4 implies the first run starts
    # at chunk 1, but a (legal) table starting past 1 must pad the
    # uncovered head with 0-sample chunks — extending sequentially
    # would shift every run left and silently mis-frame samples
    # clamp every chunk NUMBER to len(chunks) BEFORE allocating: the
    # run values are untrusted 32-bit ints, and a crafted
    # first_chunk of 0xFFFFFFFF would otherwise build a ~4-billion-
    # element list (executor OOM) before the final truncation runs
    nchunks = len(chunks)
    spc = [0] * max(0, min(stsc[0][0] - 1, nchunks))
    for i, (first, per, _desc) in enumerate(stsc):
        last = min(stsc[i + 1][0] - 1, nchunks) if i + 1 < len(stsc) \
            else nchunks
        spc.extend([per] * max(0, min(last - first + 1, nchunks - len(spc))))
    spc = spc[:nchunks]
    # resolve byte ranges chunk by chunk
    ranges = []
    si = 0
    for ci, off in enumerate(chunks):
        pos = off
        for _ in range(spc[ci] if ci < len(spc) else 0):
            if si >= len(sizes):
                break
            size = sizes[si]
            if pos < 0 or pos + size > n:
                raise ValueError(
                    f"bmff_demux: sample {si} range "
                    f"[{pos}, {pos + size}) outside the file"
                )
            ranges.append((pos, size))
            pos += size
            si += 1
    # timestamps: stts run-lengths over the media timescale
    ts_ticks, ticks = [], 0
    for count, delta in track.get("stts", []):
        for _ in range(min(count, len(ranges) - len(ts_ticks))):
            ts_ticks.append(ticks)
            ticks += delta
    while len(ts_ticks) < len(ranges):
        ts_ticks.append(ticks)  # stts shorter than stsz: flat tail
    scale = track.get("timescale") or 0
    fps = None
    stts = track.get("stts", [])
    if scale and stts:
        total = sum(c * dl for c, dl in stts)
        cnt = sum(c for c, _ in stts)
        if total and cnt:
            fps = cnt * scale / total
    samples = [
        (int(round(t * 1000 / scale)) if scale else 0,
         d[pos : pos + size])
        for t, (pos, size) in zip(ts_ticks, ranges)
    ]
    return track.get("codec"), fps, samples
