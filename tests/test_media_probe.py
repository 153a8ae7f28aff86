"""Header-only media metadata probe (functions/media_probe.py).

Every probed field is crossvalidated against the full decoder on the
same payload (dims/channels/rate/duration must agree with what decode
actually materializes), using payloads authored by this repo's
encoders AND the external fixture corpora (JDK-written TIFFs, CPython
stdlib-written audio, libwebp-written WebP vectors).  The probe's own
contract — never raise on junk, triage-only formats identified by
name — is asserted with a corrupt sweep.
"""

import os
import random
import struct
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))
from audio_fixtures import VECTORS as AUDIO_VECTORS  # noqa: E402
from tiff_fixtures import VECTORS as TIFF_VECTORS  # noqa: E402

from parquet_converters_spark.functions.media_probe import (  # noqa: E402
    probe_media,
    probe_media_payload,
)


def _pattern(w, h, c, seed=0):
    return bytes(
        (x * 31 + y * 17 + k * 11 + seed) % 256
        for y in range(h)
        for x in range(w)
        for k in range(c)
    )


def test_probe_images_agree_with_decoders():
    from parquet_converters_spark.functions.gif_codec import encode_gif
    from parquet_converters_spark.functions.jpeg_codec import encode_jpeg
    from parquet_converters_spark.functions.media_codecs import (
        encode_bmp,
        encode_png,
    )
    from parquet_converters_spark.functions.tiff_codec import encode_tiff
    from parquet_converters_spark.functions.webp_codec import (
        encode_webp_lossless,
    )

    w, h = 23, 14
    cases = [
        ("png", encode_png(w, h, 3, _pattern(w, h, 3, 1)), 3),
        ("png", encode_png(w, h, 1, _pattern(w, h, 1, 2)), 1),
        ("jpeg", encode_jpeg(w, h, 3, _pattern(w, h, 3, 3)), 3),
        ("gif", encode_gif(w, h, 3, [_pattern(w, h, 3, 4)]), 3),
        ("bmp", encode_bmp(w, h, 3, _pattern(w, h, 3, 5)), 3),
        ("webp", encode_webp_lossless(w, h, 3, _pattern(w, h, 3, 6)), 3),
        ("tiff", encode_tiff(w, h, 3, _pattern(w, h, 3, 7)), 3),
    ]
    for fmt, payload, ch in cases:
        rec = probe_media_payload(payload)
        assert rec["format"] == fmt and rec["kind"] == "image"
        assert (rec["width"], rec["height"]) == (w, h), fmt
        assert rec["channels"] == ch, fmt
    for name, v in sorted(TIFF_VECTORS.items()):
        rec = probe_media_payload(v["payload"])
        assert rec["format"] == "tiff", name
        assert (rec["width"], rec["height"]) == v["size"], name


def test_probe_webp_variants():
    """All three WebP header variants: VP8L, lossy VP8, VP8X."""
    from vp8_fixtures import VECTORS as VP8_VECTORS

    for name, v in sorted(VP8_VECTORS.items()):
        rec = probe_media_payload(v["webp"])
        assert rec["format"] == "webp"
        assert (rec["width"], rec["height"]) == v["size"], name


def test_probe_audio_agree_with_decoders():
    from parquet_converters_spark.functions.audio_codecs import (
        decode_aiff,
        decode_au,
    )
    from parquet_converters_spark.functions.media_codecs import decode_wav

    for name, v in sorted(AUDIO_VECTORS.items()):
        rec = probe_media_payload(v["payload"])
        dec = decode_wav if name.startswith("wav") else \
            decode_au if name.startswith("au") else decode_aiff
        rate, channels, samples = dec(v["payload"])
        assert rec["kind"] == "audio", name
        assert rec["sample_rate"] == rate, name
        assert rec["channels"] == channels, name
        dur = len(samples) / channels / rate
        assert rec["duration_s"] == pytest.approx(dur, rel=1e-6), name


def test_probe_flac():
    from flac_craft import encode_flac

    ch = [list(range(-100, 100)) * 4, list(range(100, -100, -1)) * 4]
    payload = encode_flac(ch, 44100, 16, stereo="mid_side",
                          modes=[("fixed", 1)])
    rec = probe_media_payload(payload)
    assert rec["format"] == "flac" and rec["kind"] == "audio"
    assert (rec["sample_rate"], rec["channels"], rec["bit_depth"]) == (
        44100, 2, 16,
    )
    assert rec["duration_s"] == pytest.approx(800 / 44100)


def test_probe_avi():
    from parquet_converters_spark.functions.avi_codec import (
        encode_avi_mjpeg,
        parse_avi_mjpeg,
    )
    from parquet_converters_spark.functions.jpeg_codec import encode_jpeg

    w, h = 32, 24
    frames = [encode_jpeg(w, h, 3, _pattern(w, h, 3, i)) for i in range(5)]
    avi = encode_avi_mjpeg(frames, fps=10.0)
    fps, parsed = parse_avi_mjpeg(avi)
    rec = probe_media_payload(avi)
    assert rec["format"] == "avi" and rec["kind"] == "video"
    assert (rec["width"], rec["height"]) == (w, h)
    assert rec["duration_s"] == pytest.approx(len(parsed) / fps)


def test_probe_triage_only_formats():
    cases = [
        (b"\xff\xfb\x90\x00" + bytes(64), "mp3", "audio", 44100),
        (b"ID3\x04\x00\x00\x00\x00\x00\x0a" + bytes(10)
         + b"\xff\xf3\x90\x00" + bytes(32), "mp3", "audio", 22050),
        (b"OggS" + bytes(32), "ogg", "audio", None),
        (b"\x1a\x45\xdf\xa3" + bytes(32), "matroska", "video", None),
        (b"FLV\x01" + bytes(32), "flv", "video", None),
        (b"\x00\x00\x00\x20ftypisom" + bytes(32), "isobmff/isom",
         "video", None),
        (b"\x00\x00\x00\x18ftypM4A " + bytes(32), "isobmff/M4A",
         "video", None),
    ]
    for payload, fmt, kind, rate in cases:
        rec = probe_media_payload(payload)
        assert (rec["format"], rec["kind"]) == (fmt, kind), fmt
        if rate is not None:
            assert rec["sample_rate"] == rate, fmt


def test_probe_never_raises_on_junk():
    from parquet_converters_spark.functions.media_codecs import encode_png

    rng = random.Random(5)
    seeds = [
        b"", b"\x00", bytes(11), b"RIFF\x00\x00\x00\x00JUNK",
        encode_png(5, 4, 3, _pattern(5, 4, 3)),
    ]
    cases = list(seeds)
    for _ in range(300):
        base = bytearray(rng.choice(seeds[-2:]))
        for _ in range(rng.randrange(1, 5)):
            if base:
                base[rng.randrange(len(base))] = rng.randrange(256)
        cases.append(bytes(base))
    # r14: mutate VALID container/frame payloads too — the Ogg/BMFF/
    # EBML walkers and the MPEG header parse must survive any byte
    # damage (truncations, size-field lies, varint corruption)
    vorbis_id = (b"\x01vorbis" + b"\x00" * 4 + bytes([2])
                 + (44100).to_bytes(4, "little") + b"\x00" * 12
                 + b"\xb8\x01")
    mp4 = (_mp4_box(b"ftyp", b"isom\x00\x00\x00\x00isom")
           + _mp4_box(b"moov", _mp4_box(
               b"mvhd", b"\x00" * 12 + (600).to_bytes(4, "big")
               + (3000).to_bytes(4, "big") + b"\x00" * 80)))
    webm = (_ebml(b"\x1a\x45\xdf\xa3", _ebml(b"\x42\x82", b"webm"))
            + b"\x18\x53\x80\x67\xff"
            + _ebml(b"\x15\x49\xa9\x66",
                    _ebml(b"\x44\x89", struct.pack(">d", 1000.0))))
    container_seeds = [
        _ogg_page(0, vorbis_id) + _ogg_page(44100, b"x", htype=4),
        mp4, webm,
        b"\xff\xfb\x90\x00" + bytes(413),
    ]
    for seed_payload in container_seeds:
        cases.append(seed_payload)
        for _ in range(150):
            base = bytearray(seed_payload)
            for _ in range(rng.randrange(1, 6)):
                base[rng.randrange(len(base))] = rng.randrange(256)
            cut = rng.randrange(len(base) + 1)
            cases.append(bytes(base[:cut]))
            cases.append(bytes(base))
    for case in cases:
        rec = probe_media_payload(case)
        assert isinstance(rec["format"], str) and isinstance(
            rec["kind"], str
        )


def test_probe_media_spark(spark):
    from parquet_converters_spark.functions.media_codecs import (
        encode_png,
        encode_wav,
    )
    from parquet_converters_spark.functions.multimodal import MEDIA_SCHEMA

    png = encode_png(9, 6, 3, _pattern(9, 6, 3, 1))
    wav = encode_wav(8000, list(range(-500, 500)))
    rows = [
        (1, "image", bytearray(png), "image/png", len(png)),
        (2, "audio", bytearray(wav), "audio/wav", len(wav)),
        (3, "other", bytearray(b"OggS" + bytes(30)), None, 34),
        (4, "other", bytearray(b"garbage..."), None, 10),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in probe_media(df).collect()}
    assert len(got) == 4
    assert (got[1]["format"], got[1]["width"], got[1]["height"],
            got[1]["channels"]) == ("png", 9, 6, 3)
    assert (got[2]["format"], got[2]["sample_rate"],
            got[2]["channels"]) == ("wav", 8000, 1)
    assert got[2]["duration_s"] == pytest.approx(1000 / 8000)
    assert got[3]["format"] == "ogg"
    assert got[4]["format"] == "unknown" and got[4]["kind"] == "other"
    assert got[1]["n_bytes"] == len(png)


def test_multimodal_probe_query_matches_fixture_metadata(spark):
    """The r13 driver row: the registry query's probe output must equal
    the metadata RECORDED when the external tools authored each fixture
    (stdlib audio writers, JDK ImageIO + its TIFF plugin, libwebp, the
    independent test-side FLAC encoder) — the same expectations the
    DuckDB VALUES oracle serializes."""
    from parquet_converters_spark.queries import (
        _probe_fixture_corpus,
        multimodal_probe,
    )

    payloads, expected = _probe_fixture_corpus()
    assert len(payloads) == len(expected) >= 50
    rows = multimodal_probe(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == len(expected)
    for r, e in zip(rows, expected):
        for c in ("media_id", "format", "kind", "n_bytes"):
            assert r[c] == e[c], (r["media_id"], c, r[c], e[c])
        for c in ("width", "height", "channels", "sample_rate",
                  "bit_depth", "bit_rate"):
            want = e[c] if e[c] is not None else -1
            assert r[c] == want, (r["media_id"], c, r[c], want)
        want_d = e["duration_s"] if e["duration_s"] is not None else -1.0
        assert r["duration_s"] == pytest.approx(want_d, abs=1e-12)


def _mpeg_frame(version=3, layer=3, br_idx=9, sr_code=0, mode=0,
                tail=12, prot=1):
    """Hand-craft one MPEG audio frame header from ISO/IEC 11172-3
    §2.4.1.3 (version: 3=MPEG1 2=MPEG2 0=MPEG2.5; layer 1/2/3; mode
    0=stereo 3=mono; prot=0 means a 16-bit CRC follows the header) —
    the independent test-side constructor the probe is checked
    against."""
    b1 = 0xE0 | (version << 3) | ((4 - layer) << 1) | prot
    b2 = (br_idx << 4) | (sr_code << 2)
    b3 = mode << 6
    return bytes([0xFF, b1, b2, b3]) + b"\x00" * tail


def test_probe_mpeg_audio_full_header():
    """r14 (r13 verdict item 3): MP3 triage depth — version/layer/
    rate/channels/declared-bitrate/duration from the frame header and
    VBR tags alone, every expectation computed from the spec tables
    here, never from the probe."""
    # MPEG1 L3 128k stereo: CBR duration over the full byte span
    rec = probe_media_payload(_mpeg_frame(tail=413))
    assert (rec["format"], rec["kind"]) == ("mp3", "audio")
    assert (rec["sample_rate"], rec["channels"]) == (44100, 2)
    assert rec["bit_rate"] == 128000
    assert rec["duration_s"] == pytest.approx(417 * 8 / 128000)
    # ID3v1 trailer excluded from the CBR estimate
    with_tag = _mpeg_frame(tail=413) * 2 + b"TAG" + b"\x00" * 125
    rec = probe_media_payload(with_tag)
    assert rec["duration_s"] == pytest.approx(2 * 417 * 8 / 128000)
    # ID3v2 leader skipped (syncsafe length), then the same frame
    id3 = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10
    rec = probe_media_payload(id3 + _mpeg_frame(tail=413))
    assert rec["bit_rate"] == 128000
    assert rec["duration_s"] == pytest.approx(417 * 8 / 128000)
    # sample-rate table x version (MPEG2 = /2, MPEG2.5 = /4)
    assert probe_media_payload(_mpeg_frame(sr_code=1))["sample_rate"] \
        == 48000
    assert probe_media_payload(_mpeg_frame(sr_code=2))["sample_rate"] \
        == 32000
    assert probe_media_payload(
        _mpeg_frame(version=2, br_idx=3, mode=3))["sample_rate"] == 22050
    assert probe_media_payload(
        _mpeg_frame(version=0, br_idx=3, mode=3))["sample_rate"] == 11025
    # MPEG2 LSF Layer III bitrate table differs from MPEG1's
    rec = probe_media_payload(_mpeg_frame(version=2, br_idx=3, mode=3,
                                          tail=60))
    assert rec["bit_rate"] == 24000
    assert rec["duration_s"] == pytest.approx(64 * 8 / 24000)
    # layer naming: Layer II -> mp2, Layer I -> mp1
    rec = probe_media_payload(_mpeg_frame(layer=2, br_idx=8, sr_code=1))
    assert (rec["format"], rec["bit_rate"]) == ("mp2", 128000)
    rec = probe_media_payload(_mpeg_frame(layer=1, br_idx=4))
    assert (rec["format"], rec["bit_rate"]) == ("mp1", 128000)
    # mono channel mode
    assert probe_media_payload(_mpeg_frame(mode=3))["channels"] == 1


def test_probe_mpeg_audio_vbr_tags():
    # Xing (MPEG1 L3 stereo -> 32-byte side info): frames flag set
    xing = (_mpeg_frame(br_idx=5, mode=3, tail=0) + b"\x00" * 17
            + b"Xing" + (1).to_bytes(4, "big")
            + (1234).to_bytes(4, "big") + b"\x00" * 40)
    rec = probe_media_payload(xing)
    assert rec["duration_s"] == pytest.approx(1234 * 1152 / 44100)
    # "Info" (LAME's CBR spelling) parses the same way
    info = xing.replace(b"Xing", b"Info")
    assert probe_media_payload(info)["duration_s"] == pytest.approx(
        1234 * 1152 / 44100)
    # frames flag CLEAR -> no count -> falls back to the CBR estimate
    noflag = (_mpeg_frame(br_idx=5, mode=3, tail=0) + b"\x00" * 17
              + b"Xing" + (0).to_bytes(4, "big") + b"\x00" * 44)
    rec = probe_media_payload(noflag)
    assert rec["duration_s"] == pytest.approx(len(noflag) * 8 / 64000)
    # VBRI (fixed offset 32 after the header): frames at +14
    vbri = (_mpeg_frame(tail=0) + b"\x00" * 32 + b"VBRI"
            + b"\x00" * 10 + (99).to_bytes(4, "big") + b"\x00" * 8)
    rec = probe_media_payload(vbri)
    assert rec["duration_s"] == pytest.approx(99 * 1152 / 44100)
    # MPEG2 mono Layer III side info is 9 bytes, not 17
    x2 = (_mpeg_frame(version=2, br_idx=3, mode=3, tail=0) + b"\x00" * 9
          + b"Xing" + (1).to_bytes(4, "big") + (50).to_bytes(4, "big"))
    rec = probe_media_payload(x2)
    assert rec["duration_s"] == pytest.approx(50 * 576 / 22050)


def test_probe_mpeg_audio_degenerate_headers():
    # free-format (idx 0): rate/channels known, bitrate+duration null
    rec = probe_media_payload(_mpeg_frame(br_idx=0))
    assert (rec["sample_rate"], rec["channels"]) == (44100, 2)
    assert rec.get("bit_rate") is None and rec.get("duration_s") is None
    # forbidden bitrate idx 15 behaves the same (still identified)
    rec = probe_media_payload(_mpeg_frame(br_idx=15))
    assert rec["format"] == "mp3" and rec.get("bit_rate") is None
    # reserved sample-rate code 3 stops after format id
    rec = probe_media_payload(_mpeg_frame(sr_code=3))
    assert rec["format"] == "mp3" and rec.get("sample_rate") is None
    # reserved version (1) / reserved layer (0): sync matched, header
    # didn't — stays generic "mp3" triage with null fields
    raw = bytearray(_mpeg_frame())
    raw[1] = 0xE0 | (1 << 3) | (1 << 1) | 1  # version=reserved
    rec = probe_media_payload(bytes(raw))
    assert rec["format"] == "mp3" and rec.get("sample_rate") is None
    # truncated Xing region must not raise (slices come back short)
    short = _mpeg_frame(br_idx=5, mode=3, tail=0) + b"\x00" * 17 + b"Xi"
    rec = probe_media_payload(short)
    assert rec["format"] == "mp3" and rec["bit_rate"] == 64000


def _ogg_page(granule, packet, htype=2, seq=0):
    """One Ogg page (RFC 3533 §6) — test-side crafter; CRC left zero
    (the probe reads structure, not checksums)."""
    segs = []
    rest = len(packet)
    while rest >= 255:
        segs.append(255)
        rest -= 255
    segs.append(rest)
    return (b"OggS\x00" + bytes([htype])
            + granule.to_bytes(8, "little") + b"\x01\x00\x00\x00"
            + seq.to_bytes(4, "little") + b"\x00\x00\x00\x00"
            + bytes([len(segs)]) + bytes(segs) + packet)


def _mp4_box(typ, payload):
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _ebml(eid, payload):
    assert len(payload) < 127
    return eid + bytes([0x80 | len(payload)]) + payload


def test_probe_ogg_vorbis_opus_flac():
    """r14: Ogg container depth — codec from the first page's ID
    packet, duration from the last page's granule position, every
    expectation the analytic value of the construction."""
    vorbis_id = (b"\x01vorbis" + b"\x00" * 4 + bytes([2])
                 + (44100).to_bytes(4, "little")
                 + (0).to_bytes(4, "little")
                 + (128000).to_bytes(4, "little")
                 + (0).to_bytes(4, "little") + b"\xb8\x01")
    data = (_ogg_page(0, vorbis_id) + _ogg_page(0, b"\x03vorbis...")
            + _ogg_page(441000, b"\x05...", htype=4, seq=2))
    rec = probe_media_payload(data)
    assert rec["format"] == "ogg/vorbis" and rec["kind"] == "audio"
    assert (rec["sample_rate"], rec["channels"]) == (44100, 2)
    assert rec["bit_rate"] == 128000
    assert rec["duration_s"] == pytest.approx(441000 / 44100)  # 10 s

    opus_id = (b"OpusHead\x01" + bytes([1])
               + (312).to_bytes(2, "little")
               + (16000).to_bytes(4, "little") + b"\x00\x00\x00")
    data = _ogg_page(0, opus_id) + _ogg_page(48000 * 3 + 312, b"x",
                                             htype=4, seq=1)
    rec = probe_media_payload(data)
    assert rec["format"] == "ogg/opus"
    assert (rec["sample_rate"], rec["channels"]) == (16000, 1)
    # granules are 48 kHz ticks minus pre-skip regardless of input rate
    assert rec["duration_s"] == pytest.approx(3.0)

    # Ogg-FLAC mapping 1.0: 0x7F FLAC maj min nhdr + bare fLaC headers
    packed = (22050 << 44) | (0 << 41) | (15 << 36) | 22050  # 1s mono 16b
    streaminfo = (b"\x00\x10\x00\x10\x00\x00\x00\x00\x00\x00"
                  + packed.to_bytes(8, "big") + b"\x00" * 16)
    flac_id = (b"\x7fFLAC\x01\x00\x00\x01fLaC\x80"
               + len(streaminfo).to_bytes(3, "big") + streaminfo)
    data = _ogg_page(0, flac_id) + _ogg_page(22050, b"x", htype=4, seq=1)
    rec = probe_media_payload(data)
    assert rec["format"] == "ogg/flac"
    assert (rec["sample_rate"], rec["channels"], rec["bit_depth"]) == \
        (22050, 1, 16)
    assert rec["duration_s"] == pytest.approx(1.0)

    # bare magic with no parseable ID packet stays generic triage
    rec = probe_media_payload(b"OggS" + bytes(40))
    assert rec["format"] == "ogg" and rec.get("duration_s") is None


def test_probe_isobmff_mvhd_and_audio_entry():
    """r14: ISO-BMFF depth — brand, mvhd duration (v0 and v1), kind
    from trak handlers, mp4a rate/channels."""
    mvhd_v0 = _mp4_box(b"mvhd", b"\x00\x00\x00\x00" + b"\x00" * 8
                       + (600).to_bytes(4, "big")
                       + (3000).to_bytes(4, "big") + b"\x00" * 80)
    mp4a = _mp4_box(b"mp4a", b"\x00" * 6 + b"\x00\x01" + b"\x00" * 8
                    + (2).to_bytes(2, "big") + (16).to_bytes(2, "big")
                    + b"\x00" * 4 + (44100 << 16).to_bytes(4, "big"))
    stsd = _mp4_box(b"stsd", b"\x00\x00\x00\x00"
                    + (1).to_bytes(4, "big") + mp4a)
    hdlr = _mp4_box(b"hdlr", b"\x00" * 8 + b"soun" + b"\x00" * 12)
    mdia = _mp4_box(b"mdia", hdlr + _mp4_box(
        b"minf", _mp4_box(b"stbl", stsd)))
    moov = _mp4_box(b"moov", mvhd_v0 + _mp4_box(b"trak", mdia))
    data = _mp4_box(b"ftyp", b"M4A \x00\x00\x00\x00mp42") + moov
    rec = probe_media_payload(data)
    assert rec["format"] == "isobmff/M4A"
    assert rec["kind"] == "audio"  # all handlers are 'soun'
    assert rec["duration_s"] == pytest.approx(3000 / 600)
    assert (rec["sample_rate"], rec["channels"], rec["bit_depth"]) == \
        (44100, 2, 16)

    # mvhd version 1 (64-bit duration), video handler -> kind video,
    # dims from tkhd's 16.16 fixed width/height
    mvhd_v1 = _mp4_box(b"mvhd", b"\x01\x00\x00\x00" + b"\x00" * 16
                       + (1000).to_bytes(4, "big")
                       + (90500).to_bytes(8, "big") + b"\x00" * 80)
    tkhd = _mp4_box(b"tkhd", b"\x00" * 76
                    + (1280 << 16).to_bytes(4, "big")
                    + (720 << 16).to_bytes(4, "big"))
    hdlr_v = _mp4_box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12)
    moov = _mp4_box(b"moov", mvhd_v1 + _mp4_box(
        b"trak", tkhd + _mp4_box(b"mdia", hdlr_v)))
    data = _mp4_box(b"ftyp", b"isom\x00\x00\x00\x00isom") + moov
    rec = probe_media_payload(data)
    assert rec["format"] == "isobmff/isom" and rec["kind"] == "video"
    assert rec["duration_s"] == pytest.approx(90.5)
    assert (rec["width"], rec["height"]) == (1280, 720)
    # tkhd version 1 shifts the dims by 12 bytes
    tkhd1 = _mp4_box(b"tkhd", b"\x01" + b"\x00" * 87
                     + (640 << 16).to_bytes(4, "big")
                     + (480 << 16).to_bytes(4, "big"))
    moov = _mp4_box(b"moov", _mp4_box(b"trak", tkhd1))
    rec = probe_media_payload(
        _mp4_box(b"ftyp", b"isom\x00\x00\x00\x00isom") + moov)
    assert (rec["width"], rec["height"]) == (640, 480)


def test_probe_matroska_webm():
    """r14: EBML/Matroska depth — DocType, Duration x TimecodeScale,
    track shape from the first TrackEntry."""
    header = _ebml(b"\x1a\x45\xdf\xa3", _ebml(b"\x42\x82", b"webm"))
    info = _ebml(b"\x15\x49\xa9\x66",
                 _ebml(b"\x2a\xd7\xb1", (1_000_000).to_bytes(3, "big"))
                 + _ebml(b"\x44\x89", struct.pack(">d", 12500.0)))
    audio = _ebml(b"\xe1", _ebml(b"\xb5", struct.pack(">d", 48000.0))
                  + _ebml(b"\x9f", bytes([2])))
    track = _ebml(b"\x16\x54\xae\x6b",
                  _ebml(b"\xae", _ebml(b"\x83", b"\x02") + audio))
    seg_payload = info + track
    segment = (b"\x18\x53\x80\x67"
               + bytes([0x80 | len(seg_payload)]) + seg_payload)
    rec = probe_media_payload(header + segment)
    assert rec["format"] == "webm" and rec["kind"] == "audio"
    assert rec["duration_s"] == pytest.approx(12.5)  # ticks x 1ms
    assert (rec["sample_rate"], rec["channels"]) == (48000, 2)

    # video track + unknown-size segment (streamed files): runs to EOF
    video = _ebml(b"\xe0", _ebml(b"\xb0", (640).to_bytes(2, "big"))
                  + _ebml(b"\xba", (360).to_bytes(2, "big")))
    track = _ebml(b"\x16\x54\xae\x6b",
                  _ebml(b"\xae", _ebml(b"\x83", b"\x01") + video))
    segment = b"\x18\x53\x80\x67" + b"\xff" + info + track
    rec = probe_media_payload(header + segment)
    assert rec["format"] == "webm" and rec["kind"] == "video"
    assert (rec["width"], rec["height"]) == (640, 360)
    assert rec["duration_s"] == pytest.approx(12.5)

    # bare magic stays generic matroska triage
    rec = probe_media_payload(b"\x1a\x45\xdf\xa3" + bytes(20))
    assert rec["format"] == "matroska" and rec["kind"] == "video"


def _flv(duration=None, audio=True, video=True):
    """Minimal FLV (Adobe spec §E): header + a script tag carrying
    the standard onMetaData AMF0 ECMA array."""
    flags = (4 if audio else 0) | (1 if video else 0)
    hdr = b"FLV\x01" + bytes([flags]) + (9).to_bytes(4, "big")
    out = hdr + b"\x00\x00\x00\x00"
    if duration is not None:
        amf = (b"\x02" + (10).to_bytes(2, "big") + b"onMetaData"
               + b"\x08" + (1).to_bytes(4, "big")
               + (8).to_bytes(2, "big") + b"duration\x00"
               + struct.pack(">d", duration)
               + b"\x00\x00\x09")
        tag = (b"\x12" + len(amf).to_bytes(3, "big")
               + b"\x00\x00\x00\x00" + b"\x00\x00\x00" + amf)
        out += tag + (11 + len(amf)).to_bytes(4, "big")
    return out


def test_probe_flv():
    """r14: FLV depth — kind from the header flags, duration from the
    onMetaData script tag."""
    rec = probe_media_payload(_flv(duration=63.4))
    assert rec["format"] == "flv" and rec["kind"] == "video"
    assert rec["duration_s"] == pytest.approx(63.4)
    rec = probe_media_payload(_flv(duration=2.0, video=False))
    assert rec["kind"] == "audio"
    assert rec["duration_s"] == pytest.approx(2.0)
    # no script tag / bare magic: triage only, no crash
    rec = probe_media_payload(_flv())
    assert rec["format"] == "flv" and rec.get("duration_s") is None
    rec = probe_media_payload(b"FLV\x01" + bytes(30))
    assert rec["format"] == "flv"


def test_probe_r14_review_fixes():
    """r14 review pass: lying headers must null, not poison or crash.

    - int32 overflow: a 6-byte EBML Channels (2^40) / a >=2^31 Ogg
      rate must come back null (Arrow int32 conversion inside
      mapInPandas would otherwise kill the scan);
    - mvhd v1 unknown-duration sentinel (2^64-1) -> null, not 584 My;
    - Ogg false sync: 'OggS' inside packet data must not be read as
      the last page header;
    - free-format MP3 with a Xing frame count still gets a duration
      (needs only rate + layer);
    - mvhd reads bounded by the BOX, not the payload."""
    # EBML: 6-byte Channels element
    hdr = _ebml(b"\x1a\x45\xdf\xa3", _ebml(b"\x42\x82", b"webm"))
    audio = _ebml(b"\xe1", _ebml(b"\x9f", (1 << 40).to_bytes(6, "big")))
    trk = _ebml(b"\x16\x54\xae\x6b",
                _ebml(b"\xae", _ebml(b"\x83", b"\x02") + audio))
    rec = probe_media_payload(hdr + b"\x18\x53\x80\x67\xff" + trk)
    assert rec["format"] == "webm" and rec.get("channels") is None
    # Ogg Vorbis with rate >= 2^31
    vid = (b"\x01vorbis" + b"\x00" * 4 + bytes([2])
           + (2**31 + 5).to_bytes(4, "little") + b"\x00" * 12
           + b"\xb8\x01")
    rec = probe_media_payload(_ogg_page(0, vid))
    assert rec["format"] == "ogg/vorbis"
    assert rec.get("sample_rate") is None
    # mvhd v1 unknown-duration sentinel
    mvhd = _mp4_box(b"mvhd", b"\x01\x00\x00\x00" + b"\x00" * 16
                    + (1000).to_bytes(4, "big")
                    + ((1 << 64) - 1).to_bytes(8, "big") + b"\x00" * 80)
    data = (_mp4_box(b"ftyp", b"isom\x00\x00\x00\x00isom")
            + _mp4_box(b"moov", mvhd))
    rec = probe_media_payload(data)
    assert rec.get("duration_s") is None
    # Ogg false sync: last 'OggS' bytes live INSIDE packet data
    vid = (b"\x01vorbis" + b"\x00" * 4 + bytes([2])
           + (44100).to_bytes(4, "little") + b"\x00" * 12 + b"\xb8\x01")
    good = _ogg_page(0, vid) + _ogg_page(
        441000, b"entropy...OggS\xff\xff\xff\xff\xff\xff\xff\xff\xff"
        b"\xff\xff\xff", htype=4, seq=1)
    rec = probe_media_payload(good)
    # the false capture (version 0xff, flags 0xff) is skipped; the
    # REAL last page header still supplies the 10 s duration
    assert rec["duration_s"] == pytest.approx(441000 / 44100)
    # free-format (br_idx 0) Layer III with a Xing frame count
    xing = (_mpeg_frame(br_idx=0, mode=3, tail=0) + b"\x00" * 17
            + b"Xing" + (1).to_bytes(4, "big")
            + (1234).to_bytes(4, "big"))
    rec = probe_media_payload(xing)
    assert rec.get("bit_rate") is None
    assert rec["duration_s"] == pytest.approx(1234 * 1152 / 44100)
    # mvhd box declaring a 12-byte size followed by a sibling box:
    # field reads must not leak into the neighbor
    lying = _mp4_box(b"ftyp", b"isom\x00\x00\x00\x00isom") + _mp4_box(
        b"moov",
        struct.pack(">I", 12) + b"mvhd" + b"\x00\x00\x00\x00"
        + _mp4_box(b"free", (600).to_bytes(4, "big") * 30))
    rec = probe_media_payload(lying)
    assert rec.get("duration_s") is None


def test_probe_bmff_esds_bitrate_and_webm_bitdepth():
    """r14: declared avg bitrate from mp4a's esds
    DecoderConfigDescriptor; BitDepth from a Matroska Audio element."""
    dcd = (b"\x04\x0d"            # tag 0x04, length 13
           + b"\x40\x15"          # objectType AAC-LC, streamType audio
           + b"\x00\x00\x00"      # bufferSizeDB
           + (160000).to_bytes(4, "big")   # maxBitrate
           + (128000).to_bytes(4, "big"))  # avgBitrate
    esds = _mp4_box(b"esds", b"\x00\x00\x00\x00"
                    + b"\x03\x11\x00\x01\x00" + dcd)
    mp4a = _mp4_box(b"mp4a", b"\x00" * 6 + b"\x00\x01" + b"\x00" * 8
                    + (2).to_bytes(2, "big") + (16).to_bytes(2, "big")
                    + b"\x00" * 4 + (48000 << 16).to_bytes(4, "big")
                    + esds)
    stsd = _mp4_box(b"stsd", b"\x00" * 4 + (1).to_bytes(4, "big") + mp4a)
    moov = _mp4_box(b"moov", _mp4_box(b"trak", _mp4_box(
        b"mdia", _mp4_box(b"minf", _mp4_box(b"stbl", stsd)))))
    data = _mp4_box(b"ftyp", b"M4A \x00\x00\x00\x00mp42") + moov
    rec = probe_media_payload(data)
    assert rec["sample_rate"] == 48000
    assert rec["bit_rate"] == 128000

    # Matroska BitDepth (0x6264) inside the Audio element
    hdr = _ebml(b"\x1a\x45\xdf\xa3", _ebml(b"\x42\x82", b"matroska"))
    audio = _ebml(b"\xe1", _ebml(b"\xb5", struct.pack(">d", 44100.0))
                  + _ebml(b"\x9f", bytes([1]))
                  + _ebml(b"\x62\x64", bytes([24])))
    trk = _ebml(b"\x16\x54\xae\x6b",
                _ebml(b"\xae", _ebml(b"\x83", b"\x02") + audio))
    rec = probe_media_payload(hdr + b"\x18\x53\x80\x67\xff" + trk)
    assert rec["format"] == "matroska" and rec["kind"] == "audio"
    assert (rec["sample_rate"], rec["channels"], rec["bit_depth"]) == \
        (44100, 1, 24)


def test_probe_esds_walks_descriptor_chain():
    """r14 review pass 3: the esds avgBitrate must come from WALKING
    the descriptor chain — an ES_ID whose low byte is 0x04 (muxers
    commonly set ES_ID = track_ID) must not be misread as the
    DecoderConfigDescriptor tag, and multi-byte expandable lengths
    must not let the 4-byte read cross the box end."""
    def m4a(es_id, dcd_len_bytes=b"\x0d", truncate=0):
        dcd = (b"\x04" + dcd_len_bytes + b"\x40\x15\x00\x00\x00"
               + (160000).to_bytes(4, "big")
               + (128000).to_bytes(4, "big"))
        esds = _mp4_box(b"esds", b"\x00\x00\x00\x00"
                        + b"\x03\x11" + es_id.to_bytes(2, "big")
                        + b"\x00" + dcd)
        if truncate:
            esds = esds[:-truncate]
        mp4a = _mp4_box(b"mp4a", b"\x00" * 6 + b"\x00\x01"
                        + b"\x00" * 8 + (2).to_bytes(2, "big")
                        + (16).to_bytes(2, "big") + b"\x00" * 4
                        + (48000 << 16).to_bytes(4, "big") + esds)
        stsd = _mp4_box(b"stsd", b"\x00" * 4
                        + (1).to_bytes(4, "big") + mp4a)
        moov = _mp4_box(b"moov", _mp4_box(b"trak", _mp4_box(
            b"mdia", _mp4_box(b"minf", _mp4_box(b"stbl", stsd)))))
        return _mp4_box(b"ftyp", b"M4A \x00\x00\x00\x00mp42") + moov

    # ES_ID = 4: the old byte-scan fabricated bit_rate=1895825409 here
    rec = probe_media_payload(m4a(es_id=4))
    assert rec["bit_rate"] == 128000
    # 4-byte padded expandable length (0x80 0x80 0x80 0x0d) parses too
    rec = probe_media_payload(
        m4a(es_id=1, dcd_len_bytes=b"\x80\x80\x80\x0d"))
    assert rec["bit_rate"] == 128000
    # truncated mid-descriptor: null, never a cross-box read
    rec = probe_media_payload(m4a(es_id=1, truncate=3))
    assert rec.get("bit_rate") is None


def test_ogg_midstream_orphan_fragment_dropped():
    """r14 review pass 3: a MID-STREAM continuation page arriving with
    no open packet drops its orphan fragment (RFC 3533 §5) instead of
    emitting it as a spurious packet."""
    from parquet_converters_spark.functions.audio_codecs import (
        ogg_packets,
    )

    first = _ogg_page(0, b"first", htype=2, seq=0)
    # a continuation-flagged page whose leading fragment has no head:
    # lacing [7, 6] -> 7 orphan bytes then the real packet 'second'
    bad = (b"OggS\x00\x01" + b"\x00" * 8 + b"\x01\x00\x00\x00"
           + (1).to_bytes(4, "little") + b"\x00" * 4
           + bytes([2, 7, 6]) + b"XXXXXXX" + b"second")
    assert ogg_packets(first + bad) == [b"first", b"second"]


def test_probe_mpeg_crc_protected_vbr_tags():
    """r15 ADVICE: protection_bit=0 (header bit 0 CLEAR) inserts a
    16-bit CRC between the header and the Layer III side info
    (ISO/IEC 11172-3 §2.4.1.3) — both VBR tag probes must step over
    it, or CRC-protected VBR files miss the exact frame count."""
    # MPEG1 L3 mono + CRC: Xing sits at 4 (header) + 2 (CRC) + 17
    xing = (_mpeg_frame(br_idx=5, mode=3, prot=0, tail=0)
            + b"\xBE\xEF" + b"\x00" * 17
            + b"Xing" + (1).to_bytes(4, "big")
            + (1234).to_bytes(4, "big") + b"\x00" * 40)
    rec = probe_media_payload(xing)
    assert rec["duration_s"] == pytest.approx(1234 * 1152 / 44100)
    # VBRI with CRC: 4 + 2 + 32
    vbri = (_mpeg_frame(prot=0, tail=0) + b"\xBE\xEF" + b"\x00" * 32
            + b"VBRI" + b"\x00" * 10 + (99).to_bytes(4, "big")
            + b"\x00" * 8)
    rec = probe_media_payload(vbri)
    assert rec["duration_s"] == pytest.approx(99 * 1152 / 44100)
    # and the UNprotected layout must be unchanged by the fix
    xing1 = (_mpeg_frame(br_idx=5, mode=3, tail=0) + b"\x00" * 17
             + b"Xing" + (1).to_bytes(4, "big")
             + (77).to_bytes(4, "big") + b"\x00" * 40)
    assert probe_media_payload(xing1)["duration_s"] == pytest.approx(
        77 * 1152 / 44100)


def test_probe_ogg_granule_sentinel_skipped():
    """r15 ADVICE: a trailing continuation-only page may legally carry
    the -1 'no packet ends here' granule sentinel (RFC 3533 §6) — the
    backward scan must keep looking at earlier pages instead of
    breaking and silently dropping the duration."""
    vorbis_id = (b"\x01vorbis" + b"\x00" * 4 + bytes([2])
                 + (44100).to_bytes(4, "little") + b"\x00" * 8
                 + b"\x00" * 4 + b"\xb8\x01")
    body = (_ogg_page(0, vorbis_id)
            + _ogg_page(441000, b"x" * 300, htype=0, seq=1))
    # sentinel granule on the last page: duration from the page before
    data = body + _ogg_page((1 << 64) - 1, b"y", htype=1, seq=2)
    rec = probe_media_payload(data)
    assert rec["format"] == "ogg/vorbis"
    assert rec["duration_s"] == pytest.approx(441000 / 44100)
    # a zero granule (header page) past the data page: same skip rule
    data = body + _ogg_page(0, b"y", htype=0, seq=2)
    assert probe_media_payload(data)["duration_s"] == pytest.approx(
        441000 / 44100)


def test_probe_bmff_video_track_depth():
    """r15 (r14 VERDICT item 2): per-track video depth from the
    sample table alone — codec fourcc + dims from the
    VisualSampleEntry, frame count from stts, fps from the stts
    delta sum over the mdhd media timescale.  Every expectation is
    the analytic value of this construction."""
    avc1 = _mp4_box(b"avc1", b"\x00" * 24
                    + (640).to_bytes(2, "big") + (360).to_bytes(2, "big")
                    + b"\x00" * 20)
    stsd = _mp4_box(b"stsd", b"\x00" * 4 + (1).to_bytes(4, "big") + avc1)
    # stts: 100 frames @ delta 512 + 25 frames @ delta 1024 at media
    # timescale 15360 -> 125 frames / 76800 ticks -> exactly 25 fps
    stts = _mp4_box(b"stts", b"\x00" * 4 + (2).to_bytes(4, "big")
                    + (100).to_bytes(4, "big") + (512).to_bytes(4, "big")
                    + (25).to_bytes(4, "big") + (1024).to_bytes(4, "big"))
    mdhd = _mp4_box(b"mdhd", b"\x00" * 12
                    + (15360).to_bytes(4, "big")
                    + (76800).to_bytes(4, "big") + b"\x00" * 4)
    mdia = _mp4_box(b"mdia", mdhd
                    + _mp4_box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12)
                    + _mp4_box(b"minf", _mp4_box(b"stbl", stsd + stts)))
    mvhd = _mp4_box(b"mvhd", b"\x00" * 12 + (600).to_bytes(4, "big")
                    + (3000).to_bytes(4, "big") + b"\x00" * 80)
    mp4 = (_mp4_box(b"ftyp", b"mp42\x00\x00\x00\x00mp42")
           + _mp4_box(b"moov", mvhd + _mp4_box(b"trak", mdia)))
    rec = probe_media_payload(mp4)
    assert (rec["format"], rec["kind"]) == ("isobmff/mp42", "video")
    assert rec["codec"] == "avc1"
    assert (rec["width"], rec["height"]) == (640, 360)
    assert rec["n_frames"] == 125
    assert rec["fps"] == pytest.approx(25.0)
    assert rec["duration_s"] == pytest.approx(5.0)

    # stsz fallback: frame count without an stts (no fps derivable)
    stsz = _mp4_box(b"stsz", b"\x00" * 8 + (42).to_bytes(4, "big"))
    mdia2 = _mp4_box(b"mdia",
                     _mp4_box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12)
                     + _mp4_box(b"minf", _mp4_box(b"stbl", stsd + stsz)))
    mp4b = (_mp4_box(b"ftyp", b"isom\x00\x00\x00\x00isom")
            + _mp4_box(b"moov", _mp4_box(b"trak", mdia2)))
    rec = probe_media_payload(mp4b)
    assert rec["codec"] == "avc1" and rec["n_frames"] == 42
    assert rec.get("fps") is None

    # vp09 sample entry is named too; audio-only files surface the
    # audio sample-entry codec (mp4a) with NO frame fields
    vp9 = mp4.replace(b"avc1", b"vp09")
    assert probe_media_payload(vp9)["codec"] == "vp09"
    mp4a = _mp4_box(b"mp4a", b"\x00" * 6 + b"\x00\x01" + b"\x00" * 8
                    + (2).to_bytes(2, "big") + (16).to_bytes(2, "big")
                    + b"\x00" * 4 + (44100 << 16).to_bytes(4, "big"))
    stsd_a = _mp4_box(b"stsd", b"\x00" * 4 + (1).to_bytes(4, "big") + mp4a)
    mdia_a = _mp4_box(b"mdia",
                      _mp4_box(b"hdlr", b"\x00" * 8 + b"soun" + b"\x00" * 12)
                      + _mp4_box(b"minf", _mp4_box(b"stbl", stsd_a)))
    m4a = (_mp4_box(b"ftyp", b"M4A \x00\x00\x00\x00mp42")
           + _mp4_box(b"moov", _mp4_box(b"trak", mdia_a)))
    rec = probe_media_payload(m4a)
    assert (rec["kind"], rec["codec"]) == ("audio", "mp4a")
    assert rec.get("n_frames") is None and rec.get("fps") is None


def test_probe_matroska_video_track_depth():
    """r15: Matroska/WebM video depth header-only — CodecID, fps from
    DefaultDuration (ns/frame), frame count from the SimpleBlock
    cadence (track-number vints in block headers; coded payload
    skipped via element sizes)."""
    hdr = _ebml(b"\x1a\x45\xdf\xa3", _ebml(b"\x42\x82", b"webm"))
    info = _ebml(b"\x15\x49\xa9\x66",
                 _ebml(b"\x2a\xd7\xb1", (1_000_000).to_bytes(3, "big"))
                 + _ebml(b"\x44\x89", struct.pack(">d", 2000.0)))
    ventry = _ebml(b"\xae",
                   _ebml(b"\xd7", b"\x01") + _ebml(b"\x83", b"\x01")
                   + _ebml(b"\x86", b"V_VP9")
                   + _ebml(b"\x23\xe3\x83",
                           (33333333).to_bytes(4, "big"))
                   + _ebml(b"\xe0", _ebml(b"\xb0", (320).to_bytes(2, "big"))
                           + _ebml(b"\xba", (180).to_bytes(2, "big"))))
    aentry = _ebml(b"\xae",
                   _ebml(b"\xd7", b"\x02") + _ebml(b"\x83", b"\x02")
                   + _ebml(b"\x86", b"A_OPUS"))
    tracks = _ebml(b"\x16\x54\xae\x6b", ventry + aentry)

    def sblock(track, payload):
        return _ebml(b"\xa3", bytes([0x80 | track, 0, 0, 0]) + payload)

    cluster = _ebml(b"\x1f\x43\xb6\x75",
                    sblock(1, b"vf1") + sblock(2, b"au1")
                    + sblock(1, b"vf2") + sblock(1, b"vf3")
                    + sblock(2, b"au2"))
    seg_body = info + tracks + cluster
    data = hdr + b"\x18\x53\x80\x67" + bytes([0x80 | len(seg_body)]) \
        + seg_body
    rec = probe_media_payload(data)
    assert (rec["format"], rec["kind"]) == ("webm", "video")
    assert rec["codec"] == "V_VP9"
    assert (rec["width"], rec["height"]) == (320, 180)
    assert rec["n_frames"] == 3  # only track 1's blocks counted
    assert rec["fps"] == pytest.approx(1e9 / 33333333)
    assert rec["duration_s"] == pytest.approx(2.0)

    # no DefaultDuration: fps falls back to blocks / Duration
    ventry2 = _ebml(b"\xae",
                    _ebml(b"\xd7", b"\x01") + _ebml(b"\x83", b"\x01")
                    + _ebml(b"\x86", b"V_AV1"))
    seg2 = info + _ebml(b"\x16\x54\xae\x6b", ventry2) + cluster
    data2 = hdr + b"\x18\x53\x80\x67" + bytes([0x80 | len(seg2)]) + seg2
    rec = probe_media_payload(data2)
    assert rec["codec"] == "V_AV1"
    assert rec["fps"] == pytest.approx(3 / 2.0)

    # audio-only: first audio track's CodecID, no frame fields
    seg3 = info + _ebml(b"\x16\x54\xae\x6b", aentry)
    data3 = hdr + b"\x18\x53\x80\x67" + bytes([0x80 | len(seg3)]) + seg3
    rec = probe_media_payload(data3)
    assert (rec["kind"], rec["codec"]) == ("audio", "A_OPUS")
    assert rec.get("n_frames") is None


def test_probe_avi_video_depth():
    """r15: AVI carries codec (strh fccHandler), n_frames and fps."""
    from parquet_converters_spark.functions.avi_codec import (
        encode_avi_mjpeg,
    )
    from parquet_converters_spark.functions.jpeg_codec import encode_jpeg

    frames = [encode_jpeg(8, 6, 3, bytes(8 * 6 * 3)) for _ in range(4)]
    avi = encode_avi_mjpeg(frames, fps=10.0)
    rec = probe_media_payload(avi)
    assert rec["codec"] == "mjpg"
    assert rec["n_frames"] == 4
    assert rec["fps"] == pytest.approx(10.0)


def test_probe_matroska_laced_block_frame_count():
    """r15 review finding: a laced block carries lace_count+1 frames —
    the cadence count must add them all, not 1 per block."""
    hdr = _ebml(b"\x1a\x45\xdf\xa3", _ebml(b"\x42\x82", b"webm"))
    info = _ebml(b"\x15\x49\xa9\x66",
                 _ebml(b"\x2a\xd7\xb1", (1_000_000).to_bytes(3, "big"))
                 + _ebml(b"\x44\x89", struct.pack(">d", 1000.0)))
    ventry = _ebml(b"\xae",
                   _ebml(b"\xd7", b"\x01") + _ebml(b"\x83", b"\x01")
                   + _ebml(b"\x86", b"V_VP9"))
    # one unlaced block (1 frame) + one Xiph-laced block with frame
    # count byte 2 (3 frames) -> 4 frames total
    plain = _ebml(b"\xa3", b"\x81\x00\x00\x80" + b"x")
    laced = _ebml(b"\xa3", b"\x81\x00\x00" + bytes([0x80 | 0x02])
                  + b"\x02\x01\x01" + b"abcde")
    cluster = _ebml(b"\x1f\x43\xb6\x75", plain + laced)
    seg = info + _ebml(b"\x16\x54\xae\x6b", ventry) + cluster
    data = hdr + b"\x18\x53\x80\x67" + bytes([0x80 | len(seg)]) + seg
    rec = probe_media_payload(data)
    assert rec["n_frames"] == 4
    assert rec["fps"] == pytest.approx(4.0)  # 4 frames / 1 s
