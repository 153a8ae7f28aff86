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
                  "bit_depth"):
            want = e[c] if e[c] is not None else -1
            assert r[c] == want, (r["media_id"], c, r[c], want)
        want_d = e["duration_s"] if e["duration_s"] is not None else -1.0
        assert r["duration_s"] == pytest.approx(want_d, abs=1e-12)
