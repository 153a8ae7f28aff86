"""From-spec audio codecs (functions/audio_codecs.py + decode_wav).

Validation layers, mirroring the image-codec pattern:

1. G.711 formula crossval: all 256 code bytes of both laws against
   CPython ``audioop`` (the C sox-derived reference) — exact.
2. Embedded known-answer vectors (tests/audio_fixtures.py — files
   authored by the CPython stdlib wave/aifc/sunau writers, expected
   PCM via audioop): exact decode with ZERO optional deps.
3. Generator determinism: re-running scripts/make_audio_fixtures.py
   must reproduce the committed fixture byte-for-byte (gated on the
   authoring modules existing — they left the stdlib in 3.13).
4. The CPython test-suite audio files present in this container
   (externally authored, full provenance) against the stdlib readers.
5. Live JDK ``javax.sound`` bridge crossval: PCM16 and G.711 are
   sample-EXACT three ways (ours == audioop == JDK); PCM 8/24/32
   bounded by the documented float-vs-shift conversion difference.
6. Corrupt-stream sweeps: the untrusted-corpus decoder contract
   (ValueError/NotImplementedError only).
7. Spark-level decode_media legs: the from-spec path and the
   ``jdk_sound_media_decoder`` seam over a mixed audio corpus.
"""

import glob
import io
import os
import random
import shutil
import struct
import sys
import warnings

import pytest

sys.path.insert(0, os.path.dirname(__file__))
from audio_fixtures import VECTORS  # noqa: E402

from parquet_converters_spark.functions.audio_codecs import (  # noqa: E402
    ALAW_TABLE,
    ULAW_TABLE,
    _read_extended80,
    decode_aiff,
    decode_au,
    decode_g711,
    is_aiff,
    is_au,
)
from parquet_converters_spark.functions.media_codecs import (  # noqa: E402
    decode_wav,
)

try:
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop
    HAVE_AUDIOOP = True
except ImportError:  # pragma: no cover - removed in Python 3.13
    audioop = None
    HAVE_AUDIOOP = False

needs_audioop = pytest.mark.skipif(not HAVE_AUDIOOP, reason="no audioop")
needs_jdk = pytest.mark.skipif(
    not (shutil.which("javac") and shutil.which("java")),
    reason="JDK (java+javac) not on PATH",
)


def _decoder_for(name):
    if name.startswith("wav"):
        return decode_wav
    if name.startswith("au"):
        return decode_au
    return decode_aiff


def _signal16(n=200, seed=5):
    out = []
    x = 12345 + seed
    for i in range(n):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        out.append((((x >> 7) % 65536) - 32768) * (n - i) // n)
    return out


def _wav_g711(fmt_tag, payload, rate=8000, channels=1):
    fmt = struct.pack(
        "<HHIIHH", fmt_tag, channels, rate, rate * channels, channels, 8
    ) + struct.pack("<H", 0)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


# --------------------------------------------------------------------------
# 1. G.711 vs audioop, every code byte
# --------------------------------------------------------------------------


@needs_audioop
@pytest.mark.parametrize("law", ["ulaw", "alaw"])
def test_g711_all_256_bytes_match_audioop(law):
    expand = audioop.ulaw2lin if law == "ulaw" else audioop.alaw2lin
    ref = list(struct.unpack("<256h", expand(bytes(range(256)), 2)))
    assert decode_g711(bytes(range(256)), law) == ref


def test_g711_tables_properties():
    """Spec invariants that hold with zero deps: peak magnitudes and
    the ~0 codes."""
    assert int(ULAW_TABLE.max()) == 32124 and int(ULAW_TABLE.min()) == -32124
    assert int(ALAW_TABLE.max()) == 32256 and int(ALAW_TABLE.min()) == -32256
    assert ULAW_TABLE[0xFF] == 0  # u-law 0xFF is +0
    assert set(abs(int(v)) for v in ALAW_TABLE) == set(
        abs(int(v)) for v in -ALAW_TABLE
    )


# --------------------------------------------------------------------------
# 2. embedded vectors (zero deps)
# --------------------------------------------------------------------------


@pytest.mark.parametrize("name", sorted(VECTORS))
def test_embedded_vector_exact(name):
    v = VECTORS[name]
    rate, channels, samples = _decoder_for(name)(v["payload"])
    assert (rate, channels) == (v["rate"], v["channels"])
    assert samples == v["pcm16"]


def test_fixture_generator_deterministic(tmp_path):
    """Regenerating the fixture module reproduces the committed bytes
    (provenance is real, not hand-edited)."""
    pytest.importorskip("aifc")
    pytest.importorskip("sunau")
    import subprocess

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    work = tmp_path / "repo"
    (work / "tests").mkdir(parents=True)
    (work / "scripts").mkdir()
    shutil.copy(
        os.path.join(here, "scripts/make_audio_fixtures.py"),
        work / "scripts/make_audio_fixtures.py",
    )
    subprocess.run(
        [sys.executable, "scripts/make_audio_fixtures.py"],
        cwd=work,
        check=True,
        env={**os.environ, "PYTHONPATH": here},
        capture_output=True,
    )
    regenerated = (work / "tests/audio_fixtures.py").read_bytes()
    committed = open(os.path.join(here, "tests/audio_fixtures.py"),
                     "rb").read()
    assert regenerated == committed


# --------------------------------------------------------------------------
# 4. externally-authored CPython test-suite files (when present)
# --------------------------------------------------------------------------

_CPY_AUDIO_DIRS = [
    "/root/.pyenv/versions/3.7.16/lib/python3.7/test/audiodata",
    "/root/.pyenv/versions/3.13.0/lib/python3.13/test/audiodata",
]


def _cpython_files(suffixes):
    out = []
    for d in _CPY_AUDIO_DIRS:
        out += sorted(glob.glob(os.path.join(d, "*")))
    return [f for f in out if f.endswith(suffixes)]


@needs_audioop
def test_cpython_wav_fixtures_match_stdlib():
    files = _cpython_files((".wav",))
    if not files:
        pytest.skip("CPython audiodata not present")
    import wave

    checked = 0
    for path in files:
        data = open(path, "rb").read()
        if path.endswith("-ext.wav"):
            # the stdlib oracle cannot read WAVE_FORMAT_EXTENSIBLE;
            # its non-ext twin carries the same audio
            twin = decode_wav(open(path.replace("-ext", ""), "rb").read())
            assert decode_wav(data) == twin
            checked += 1
            continue
        w = wave.open(io.BytesIO(data))
        frames = w.readframes(w.getnframes())
        sw = w.getsampwidth()
        if sw == 1:
            frames = audioop.bias(frames, 1, -128)
        exp = list(
            struct.unpack(
                f"<{len(audioop.lin2lin(frames, sw, 2)) // 2}h",
                audioop.lin2lin(frames, sw, 2),
            )
        )
        rate, channels, samples = decode_wav(data)
        assert (rate, channels) == (w.getframerate(), w.getnchannels())
        assert samples == exp, path
        checked += 1
    assert checked >= 4


@needs_audioop
def test_cpython_aiff_and_au_fixtures_match_stdlib():
    files = _cpython_files((".aiff", ".aifc", ".au"))
    if not files:
        pytest.skip("CPython audiodata not present")
    aifc = pytest.importorskip("aifc")
    sunau = pytest.importorskip("sunau")
    checked = 0
    for path in files:
        data = open(path, "rb").read()
        if path.endswith(".au"):
            a = sunau.open(io.BytesIO(data))
            dec = decode_au
        else:
            a = aifc.open(io.BytesIO(data))
            dec = decode_aiff
        frames = a.readframes(a.getnframes())
        comp = a.getcomptype()
        comp = comp.encode() if isinstance(comp, str) else comp
        sw = a.getsampwidth()
        if comp in (b"ulaw", b"ULAW", b"alaw", b"ALAW"):
            # both readers hand back already-expanded native PCM16
            exp = list(struct.unpack(f"<{len(frames) // 2}h", frames))
        else:
            if path.endswith(".au") or comp == b"NONE":
                if sw > 1:
                    frames = audioop.byteswap(frames, sw)
            w16 = audioop.lin2lin(frames, sw, 2)
            exp = list(struct.unpack(f"<{len(w16) // 2}h", w16))
        rate, channels, samples = dec(data)
        assert (rate, channels) == (a.getframerate(), a.getnchannels())
        assert samples == exp, path
        checked += 1
    assert checked >= 6


# --------------------------------------------------------------------------
# 5. JDK javax.sound bridge crossval
# --------------------------------------------------------------------------


@needs_jdk
def test_jdk_bridge_exact_on_pcm16_and_g711_vectors():
    from parquet_converters_spark.functions.native_codecs import (
        _audio_bridge_decode,
        _compile_audio_bridge,
    )

    classes = _compile_audio_bridge()
    exact = ("wav_pcm16", "au_pcm16", "aiff_pcm16", "au_ulaw",
             "aifc_ulaw")
    for name in exact:
        v = VECTORS[name]
        rate, channels, samples = _audio_bridge_decode(
            classes, v["payload"]
        )
        assert (rate, channels) == (v["rate"], v["channels"]), name
        assert samples == v["pcm16"], name


@needs_jdk
def test_jdk_bridge_depth_conversions_within_one_narrow_lsb():
    """PCM 8/24/32: the JDK renormalizes through float where we (and
    audioop/sox) integer-shift — documented, bounded by one LSB of the
    narrow width."""
    from parquet_converters_spark.functions.native_codecs import (
        _audio_bridge_decode,
        _compile_audio_bridge,
    )

    classes = _compile_audio_bridge()
    for name, bits in (("wav_pcm8", 8), ("wav_pcm24", 24),
                       ("wav_pcm32", 32), ("au_pcm24", 24),
                       ("aiff_pcm32", 32)):
        v = VECTORS[name]
        rate, channels, samples = _audio_bridge_decode(
            classes, v["payload"]
        )
        assert (rate, channels) == (v["rate"], v["channels"]), name
        tol = 256 if bits == 8 else 1
        worst = max(abs(a - b) for a, b in zip(samples, v["pcm16"]))
        assert worst <= tol, (name, worst)


@needs_jdk
@needs_audioop
@pytest.mark.parametrize("law,tag", [("ulaw", 7), ("alaw", 6)])
def test_g711_wav_three_way_exact(law, tag):
    """ours == audioop == JDK, sample for sample, on G.711 WAV (the
    format the stdlib writers cannot author: header crafted around an
    audioop-companded payload)."""
    from parquet_converters_spark.functions.native_codecs import (
        _audio_bridge_decode,
        _compile_audio_bridge,
    )

    frames16 = struct.pack("<200h", *_signal16(200, seed=61))
    conv = audioop.lin2ulaw if law == "ulaw" else audioop.lin2alaw
    expand = audioop.ulaw2lin if law == "ulaw" else audioop.alaw2lin
    comp = conv(frames16, 2)
    wav = _wav_g711(tag, comp)
    exp = list(struct.unpack("<200h", expand(comp, 2)))
    assert decode_wav(wav) == (8000, 1, exp)
    assert _audio_bridge_decode(_compile_audio_bridge(), wav) == (
        8000, 1, exp,
    )


# --------------------------------------------------------------------------
# 6. corrupt-stream sweeps + header edge cases
# --------------------------------------------------------------------------


def test_extended80_sample_rates():
    def enc80(rate):
        # encode a positive integer as 80-bit extended (normalized)
        e = rate.bit_length() - 1
        mant = rate << (63 - e)
        return struct.pack(">HQ", 16383 + e, mant)

    for rate in (1, 8000, 11025, 22050, 44100, 48000, 96000):
        assert _read_extended80(enc80(rate)) == rate
    with pytest.raises(ValueError):
        _read_extended80(struct.pack(">HQ", 0x7FFF, 1 << 63))  # inf/nan
    with pytest.raises(ValueError):
        _read_extended80(struct.pack(">HQ", 0x8000 | 16395, 1 << 63))  # neg
    assert _read_extended80(struct.pack(">HQ", 0, 0)) == 0


def test_rejected_by_name_modes():
    # AU float encoding
    au = b".snd" + struct.pack(">IIIII", 24, 8, 6, 8000, 1) + b"\x00" * 8
    with pytest.raises(NotImplementedError, match="AU: encoding 6"):
        decode_au(au)
    # AIFC ima4 compression
    v = VECTORS["aifc_ulaw"]["payload"]
    patched = v.replace(b"ulaw", b"ima4", 1)
    with pytest.raises(NotImplementedError, match="ima4"):
        decode_aiff(patched)
    # WAV IEEE float format tag
    wav = _wav_g711(3, b"\x00" * 8)
    with pytest.raises(NotImplementedError, match="format tag 3"):
        decode_wav(wav)


def test_allocation_guard_scales_by_bytes_per_sample(monkeypatch):
    """r12 ADVICE: the old guard capped BYTES at _MAX_SAMPLES*4, so a
    1-byte/sample G.711 body could smuggle 4x the documented sample
    cap.  The guard now caps SAMPLES for the detected encoding."""
    import parquet_converters_spark.functions.audio_codecs as ac

    monkeypatch.setattr(ac, "_MAX_SAMPLES", 16)
    # AU u-law: 17 one-byte samples > cap 16 -> must raise (the old
    # byte guard allowed up to 64 bytes here)
    au = b".snd" + struct.pack(">IIIII", 24, 17, 1, 8000, 1) + b"\x00" * 17
    with pytest.raises(ValueError, match="allocation guard"):
        decode_au(au)
    # AU PCM32: 64 bytes = 16 samples == cap -> decodes fine
    au32 = b".snd" + struct.pack(">IIIII", 24, 64, 5, 8000, 1) + b"\x00" * 64
    rate, ch, samples = decode_au(au32)
    assert (rate, ch, len(samples)) == (8000, 1, 16)
    # AIFC ulaw: 17 one-byte samples > cap -> must raise
    comm = struct.pack(">HIH", 1, 17, 16) + struct.pack(
        ">HQ", 16383 + 12, 8000 << 51
    ) + b"ulaw"
    ssnd = struct.pack(">II", 0, 0) + b"\x00" * 17
    assert len(comm) % 2 == 0 and len(ssnd) % 2 == 1
    aifc = (
        b"FORM" + struct.pack(">I", 4 + 8 + len(comm) + 8 + len(ssnd) + 1)
        + b"AIFC"
        + b"COMM" + struct.pack(">I", len(comm)) + comm
        + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd + b"\x00"
    )
    with pytest.raises(ValueError, match="allocation guard"):
        decode_aiff(aifc)
    # unsupported-mode rejection still fires before the guard
    au_bad = b".snd" + struct.pack(">IIIII", 24, 17, 6, 8000, 1) + b"\x00" * 17
    with pytest.raises(NotImplementedError, match="AU: encoding 6"):
        decode_au(au_bad)


@pytest.mark.parametrize("name", ["wav_pcm16", "au_ulaw", "aifc_sowt",
                                  "aiff_pcm24"])
def test_corrupt_streams_raise_clean_errors(name):
    data = VECTORS[name]["payload"]
    dec = _decoder_for(name)
    rng = random.Random(hash(name) & 0xFFFF)
    cases = [data[:n] for n in (3, 7, 11, 23, len(data) // 2)]
    for _ in range(150):
        mutated = bytearray(data)
        for _ in range(rng.randrange(1, 4)):
            mutated[rng.randrange(len(mutated))] = rng.randrange(256)
        cases.append(bytes(mutated))
    for case in cases:
        try:
            dec(case)
        except (ValueError, NotImplementedError):
            pass


def test_magic_sniffers():
    assert is_au(VECTORS["au_pcm16"]["payload"])
    assert is_aiff(VECTORS["aiff_pcm16"]["payload"])
    assert is_aiff(VECTORS["aifc_sowt"]["payload"])
    assert not is_au(VECTORS["wav_pcm16"]["payload"])
    assert not is_aiff(b"FORM\x00\x00\x00\x04JUNK")


# --------------------------------------------------------------------------
# 7. Spark-level decode_media legs
# --------------------------------------------------------------------------


def _audio_df(spark):
    from parquet_converters_spark.functions.multimodal import MEDIA_SCHEMA

    names = ["wav_pcm16", "wav_pcm8", "au_ulaw", "aiff_pcm24",
             "aifc_alaw", "aifc_sowt"]
    rows = [
        (400 + i, "audio", bytearray(VECTORS[n]["payload"]),
         "audio/" + n.split("_")[0], len(VECTORS[n]["payload"]))
        for i, n in enumerate(names)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA), names


def _expected_features(name, n_features):
    import numpy as np

    from parquet_converters_spark.functions.multimodal import (
        _band_features,
    )

    samples = VECTORS[name]["pcm16"]
    scaled = [min(abs(s), 32767) // 128 for s in samples]
    return [float(np.float32(f))
            for f in _band_features(scaled, n_features)]


def test_decode_media_fromspec_audio_formats(spark):
    from parquet_converters_spark.functions.multimodal import decode_media

    df, names = _audio_df(spark)
    rows = {r["media_id"]: r
            for r in decode_media(df, n_features=4).collect()}
    assert len(rows) == len(names)
    for i, name in enumerate(names):
        r = rows[400 + i]
        assert r["width"] is None and r["height"] is None
        assert r["channels"] == VECTORS[name]["channels"]
        assert r["features"] == _expected_features(name, 4), name


@needs_jdk
def test_decode_media_jdk_sound_seam(spark):
    """The audio seam adapter: WAV/AU/AIFF route through the
    javax.sound bridge (exact features on PCM16/G.711), AIFC
    alaw/sowt route back to the from-spec path (the JDK cannot read
    them), and image payloads fall through to the from-spec table."""
    from parquet_converters_spark.functions.media_codecs import encode_png
    from parquet_converters_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
    )
    from parquet_converters_spark.functions.native_codecs import (
        jdk_sound_media_decoder,
    )

    df, names = _audio_df(spark)
    png = encode_png(5, 4, 3, bytes(range(60)))
    extra = df.sparkSession.createDataFrame(
        [(499, "image", bytearray(png), "image/png", len(png))],
        MEDIA_SCHEMA,
    )
    got = decode_media(df.unionAll(extra), n_features=4,
                       decoder=jdk_sound_media_decoder())
    rows = {r["media_id"]: r for r in got.collect()}
    assert len(rows) == len(names) + 1
    # G.711 + PCM16 formats and the from-spec-routed AIFC legs: exact
    for i, name in enumerate(names):
        if name in ("wav_pcm8", "aiff_pcm24"):
            continue  # depth conversions differ by documented <=1 LSB
        assert rows[400 + i]["features"] == _expected_features(name, 4), name
    assert (rows[499]["width"], rows[499]["height"]) == (5, 4)

# --------------------------------------------------------------------------
# 8. G.711 encoders
# --------------------------------------------------------------------------


@needs_audioop
@pytest.mark.parametrize("law", ["ulaw", "alaw"])
def test_encode_g711_all_65536_match_audioop(law):
    import numpy as np

    from parquet_converters_spark.functions.audio_codecs import encode_g711

    all16 = np.arange(-32768, 32768, dtype=np.int16)
    conv = audioop.lin2ulaw if law == "ulaw" else audioop.lin2alaw
    assert encode_g711(all16, law) == conv(all16.tobytes(), 2)


@pytest.mark.parametrize("law", ["ulaw", "alaw"])
def test_g711_roundtrip_is_company_idempotent(law):
    """compand -> expand -> compand is a fixed point (the standard
    G.711 idempotence property), with zero deps."""
    from parquet_converters_spark.functions.audio_codecs import (
        decode_g711,
        encode_g711,
    )

    first = encode_g711(_signal16(500, seed=71), law)
    expanded = decode_g711(first, law)
    assert encode_g711(expanded, law) == first


@needs_jdk
@pytest.mark.parametrize("law", ["ulaw", "alaw"])
def test_encode_wav_g711_reads_back_everywhere(law):
    """Our G.711 WAV sink decodes identically through our own decoder
    and through the JDK (an external reader of our bytes)."""
    from parquet_converters_spark.functions.audio_codecs import (
        decode_g711,
        encode_g711,
        encode_wav_g711,
    )
    from parquet_converters_spark.functions.native_codecs import (
        _audio_bridge_decode,
        _compile_audio_bridge,
    )

    pcm = _signal16(400, seed=73)
    wav = encode_wav_g711(8000, pcm, law, channels=2)
    exp = decode_g711(encode_g711(pcm, law), law)
    assert decode_wav(wav) == (8000, 2, exp)
    assert _audio_bridge_decode(_compile_audio_bridge(), wav) == (
        8000, 2, exp,
    )


def test_common_compressed_formats_rejected_by_name():
    """MP3/Ogg/Matroska/FLV/ISO-BMFF payloads fail with the format
    NAMED and the seam/fake remedies spelled out — not the generic
    trailer."""
    from parquet_converters_spark.functions.multimodal import _real_decode

    cases = [
        (b"ID3\x04\x00" + bytes(40), "MP3"),
        (b"\xff\xfb\x90\x00" + bytes(40), "MP3"),
        (b"OggS" + bytes(40), "Ogg"),
        (b"\x1a\x45\xdf\xa3" + bytes(40), "Matroska"),
        (b"FLV\x01" + bytes(40), "Flash"),
        (b"\x00\x00\x00\x20ftypisom" + bytes(40), "ISO-BMFF"),
    ]
    for payload, name in cases:
        with pytest.raises(NotImplementedError, match=name):
            _real_decode(payload, 4)


def test_aifc_twos_is_explicit_big_endian_pcm():
    """AIFC comptype 'twos' = explicit big-endian PCM (what NONE means
    implicitly): patch the embedded NONE-pcm16 vector's compression
    fourcc and the decode must be identical."""
    v = VECTORS["aiff_pcm16"]["payload"]
    # the aifc writer emits AIFC with an explicit 'NONE' comptype
    assert b"NONE" in v
    patched = v.replace(b"NONE", b"twos", 1)
    assert decode_aiff(patched) == decode_aiff(v)


@needs_audioop
def test_au_alaw_threeway():
    """AU encoding 27 (A-law): sunau cannot author it, so craft the
    24-byte header around an audioop-companded payload — ours ==
    audioop exactly, and the JDK reads the same bytes when present."""
    from parquet_converters_spark.functions.audio_codecs import decode_au

    frames16 = struct.pack("<200h", *_signal16(200, seed=91))
    comp = audioop.lin2alaw(frames16, 2)
    au = b".snd" + struct.pack(">IIIII", 24, len(comp), 27, 8000, 1) + comp
    exp = list(struct.unpack("<200h", audioop.alaw2lin(comp, 2)))
    assert decode_au(au) == (8000, 1, exp)
    if shutil.which("javac") and shutil.which("java"):
        from parquet_converters_spark.functions.native_codecs import (
            _audio_bridge_decode,
            _compile_audio_bridge,
        )

        assert _audio_bridge_decode(_compile_audio_bridge(), au) == (
            8000, 1, exp,
        )


def test_encode_au_aiff_writers_stdlib_crossread():
    """r13: the AU/AIFF writers (transcode targets) — every depth
    crossread by the CPython stdlib sunau/aifc readers AND by our own
    native-depth decoders."""
    import io
    import warnings

    import numpy as np

    from parquet_converters_spark.functions.audio_codecs import (
        decode_aiff_native,
        decode_au_native,
        encode_aiff,
        encode_au,
    )

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import aifc
        import sunau

    rng = random.Random(5)
    for bits, dt in ((8, None), (16, ">i2"), (24, None), (32, ">i4")):
        amp = 1 << (bits - 2)
        pcm = [rng.randrange(-amp, amp) for _ in range(301)]
        au = encode_au(11025, pcm, 1, bits)
        assert decode_au_native(au) == (11025, 1, bits, pcm)
        af = encode_aiff(22050, pcm, 1, bits)
        assert decode_aiff_native(af) == (22050, 1, bits, pcm)
        r = sunau.open(io.BytesIO(au))
        assert (r.getframerate(), r.getnchannels(),
                r.getsampwidth()) == (11025, 1, bits // 8)
        r2 = aifc.open(io.BytesIO(af))
        assert (r2.getframerate(), r2.getnchannels(),
                r2.getsampwidth()) == (22050, 1, bits // 8)
        if dt:  # sample-exact where numpy can read the frames directly
            assert np.frombuffer(r.readframes(301),
                                 dtype=dt).tolist() == pcm
            assert np.frombuffer(r2.readframes(301),
                                 dtype=dt).tolist() == pcm
    # G.711 AU leg: stdlib sunau reads the header; our decoder
    # round-trips the companded bytes
    pcm16 = [rng.randrange(-32768, 32768) for _ in range(200)]
    for law, enc_code in (("ulaw", 1), ("alaw", 27)):
        au = encode_au(8000, pcm16, 1, law=law)
        r = sunau.open(io.BytesIO(au))
        assert r.getframerate() == 8000
        rate, ch, bits_, samples = decode_au_native(au)
        assert (rate, ch, bits_) == (8000, 1, 16)
        from parquet_converters_spark.functions.audio_codecs import (
            decode_g711,
            encode_g711,
        )

        assert samples == decode_g711(encode_g711(pcm16, law), law)


def test_transcode_audio_au_aiff_targets(spark):
    from parquet_converters_spark.functions.audio_codecs import (
        decode_aiff_native,
        decode_au_native,
    )
    from parquet_converters_spark.functions.media_codecs import encode_wav
    from parquet_converters_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        transcode_audio,
    )

    pcm = [((13 * k) % 400) - 200 for k in range(500)]
    wav = encode_wav(16000, pcm)
    df = spark.createDataFrame(
        [(1, "audio", bytearray(wav), "audio/wav", 0)], MEDIA_SCHEMA
    )
    out_au = transcode_audio(df, target="au").collect()[0]
    assert decode_au_native(bytes(out_au["payload"])) == (
        16000, 1, 16, pcm)
    out_af = transcode_audio(df, target="aiff", depth="native").collect()[0]
    assert decode_aiff_native(bytes(out_af["payload"])) == (
        16000, 1, 16, pcm)


def test_encoders_reject_ragged_interleave():
    """r13 ADVICE: encode_aiff/encode_au/encode_pcm_wav accepted
    sample counts not divisible by channels — AIFF then wrote
    nframes = size // channels while the SSND body carried the ragged
    tail, so header and body silently disagreed.  All PCM writers now
    reject ragged input (and channels < 1) the way encode_flac does."""
    from parquet_converters_spark.functions.audio_codecs import (
        encode_aiff,
        encode_au,
        encode_pcm_wav,
    )

    ragged = [0, 1, 2, 3, 4]  # 5 samples, 2 channels
    for enc in (encode_aiff, encode_au, encode_pcm_wav):
        with pytest.raises(ValueError, match="divisible"):
            enc(8000, ragged, channels=2)
        with pytest.raises(ValueError, match="channels"):
            enc(8000, [0, 1], channels=0)
        # even counts still encode fine
        assert len(enc(8000, [0, 1, 2, 3], channels=2)) > 0
    # the G.711 AU path takes the same guard
    with pytest.raises(ValueError, match="divisible"):
        encode_au(8000, ragged, channels=2, law="ulaw")


def test_jdk_mp3_capability_probe_and_posture():
    """r14 (r13 verdict item 4): the lossy-audio posture is MEASURED,
    not assumed — jdk_sound_mp3_supported() live-probes this JVM's
    javax.sound SPI set with a crafted silent CBR frame, and the
    decode path honors whatever it finds: SPI present -> the bridge
    decodes MPEG audio; absent (stock OpenJDK) -> the named
    NotImplementedError rejection stands.  Either way there is no
    silent gap."""
    import shutil

    from parquet_converters_spark.functions.native_codecs import (
        jdk_sound_mp3_supported,
        jdk_sound_media_decoder,
    )

    if not shutil.which("java"):
        pytest.skip("no JVM on this box")
    supported = jdk_sound_mp3_supported()
    assert isinstance(supported, bool)
    # memoized: second call answers without respawning anything
    assert jdk_sound_mp3_supported() is supported

    decoder = jdk_sound_media_decoder()
    frame = b"\xff\xfb\x90\xc0" + b"\x00" * 413  # silent CBR frame
    if supported:
        _w, _h, ch, feats = decoder(frame * 4, 4)
        assert ch >= 1 and len(feats) == 4
    else:
        with pytest.raises(NotImplementedError, match="MP3"):
            decoder(frame * 4, 4)
    # triage is format-complete regardless of the decode posture
    from parquet_converters_spark.functions.media_probe import (
        probe_media_payload,
    )

    rec = probe_media_payload(frame * 4)
    assert rec["format"] == "mp3" and rec["bit_rate"] == 128000


def _ogg_mux(packets, granule_last=0, max_segs=8):
    """Test-side Ogg muxer (RFC 3533): packets -> 255-lacing segments
    -> pages of at most ``max_segs`` segments, with the continuation
    flag set when a packet spans pages — deliberately small pages so
    the demuxer's lacing/continuation logic is exercised hard."""
    segs = []
    for pkt in packets:
        rest = pkt
        while True:
            take = rest[:255]
            segs.append(take)
            rest = rest[255:]
            if len(take) < 255:
                break
            if not rest:
                segs.append(b"")  # exact-255 multiple: 0-lacing end
                break
    out = b""
    seq = 0
    cont = False
    i = 0
    while i < len(segs):
        chunk = segs[i : i + max_segs]
        i += len(chunk)
        last = i >= len(segs)
        htype = (1 if cont else 0) | (2 if seq == 0 else 0) \
            | (4 if last else 0)
        body = b"".join(chunk)
        out += (b"OggS\x00" + bytes([htype])
                + (granule_last if last else 0).to_bytes(8, "little")
                + b"\x07\x00\x00\x00" + seq.to_bytes(4, "little")
                + b"\x00" * 4 + bytes([len(chunk)])
                + bytes(len(c) for c in chunk) + body)
        cont = len(chunk[-1]) == 255
        seq += 1
    return out


def _flac_as_ogg(native, granule_last=0, max_segs=8, chunk=300):
    """Wrap a bare FLAC stream per the FLAC-to-Ogg mapping 1.0:
    packet 0 = 0x7F'FLAC' ver nheaders + fLaC + STREAMINFO, one packet
    per further metadata block, then the audio data (split at ``chunk``
    boundaries — our demuxer concatenates, so frame-exact packetization
    is not required for this test)."""
    assert native[:4] == b"fLaC"
    pos = 4
    blocks = []
    while True:
        hdr = native[pos]
        ln = int.from_bytes(native[pos + 1 : pos + 4], "big")
        blocks.append(native[pos : pos + 4 + ln])
        pos += 4 + ln
        if hdr & 0x80:
            break
    packets = [b"\x7fFLAC\x01\x00"
               + (len(blocks) - 1).to_bytes(2, "big")
               + b"fLaC" + blocks[0]]
    packets += blocks[1:]
    audio = native[pos:]
    packets += [audio[i : i + chunk] for i in range(0, len(audio), chunk)]
    return _ogg_mux(packets, granule_last=granule_last,
                    max_segs=max_segs)


def test_ogg_flac_demux_decodes_end_to_end():
    """r14: Ogg-FLAC (mapping 1.0) decodes through the full from-spec
    ladder — the demuxer reassembles packets across 255-lacings and
    page continuations, concatenation reproduces the bare stream, and
    decode_flac's CRC-8/CRC-16/MD5 ladder then verifies it.  The Ogg
    framing here is authored by an independent test-side muxer."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from flac_craft import encode_flac

    from parquet_converters_spark.functions.audio_codecs import (
        ogg_flac_to_native,
        ogg_packets,
    )
    from parquet_converters_spark.functions.multimodal import (
        _decode_audio_payload_native,
        _real_decode,
    )

    pcm = [((31 * k) % 1000) - 500 for k in range(2000)]
    native = encode_flac([pcm], 16000, 16, modes=[("fixed", 2)],
                         block_size=512)
    ogg = _flac_as_ogg(native, granule_last=2000, max_segs=3, chunk=300)
    # demux reproduces the bare stream byte-exactly
    assert ogg_flac_to_native(ogg) == native
    # packets reassemble across pages (max_segs=3 forces continuation)
    pkts = ogg_packets(ogg)
    assert pkts[0][:5] == b"\x7fFLAC" and len(pkts) >= 3
    # full native decode (CRC + MD5 ladder inside)
    rate, ch, bits, samples = _decode_audio_payload_native(ogg)
    assert (rate, ch, bits) == (16000, 1, 16)
    assert samples == pcm
    # feature-extraction path decodes it too
    _w, _h, nch, feats = _real_decode(ogg, 4)
    assert nch == 1 and len(feats) == 4
    # exact-255-multiple packet boundary (0-lacing terminator)
    ogg2 = _flac_as_ogg(native, chunk=255)
    assert ogg_flac_to_native(ogg2) == native
    # probe agrees with the decode on the same payload
    from parquet_converters_spark.functions.media_probe import (
        probe_media_payload,
    )

    rec = probe_media_payload(ogg)
    assert rec["format"] == "ogg/flac"
    assert (rec["sample_rate"], rec["channels"], rec["bit_depth"]) == \
        (16000, 1, 16)
    assert rec["duration_s"] == pytest.approx(2000 / 16000)


def test_ogg_flac_transcodes_and_vorbis_stays_rejected(spark):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from flac_craft import encode_flac

    from parquet_converters_spark.functions.audio_codecs import (
        decode_aiff_native,
    )
    from parquet_converters_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        _real_decode,
        transcode_audio,
    )

    pcm = [((7 * k) % 400) - 200 for k in range(800)]
    ogg = _flac_as_ogg(
        encode_flac([pcm], 8000, 16, modes=[("fixed", 1)],
                    block_size=256))
    df = spark.createDataFrame(
        [(1, "audio", bytearray(ogg), "audio/ogg", 0)], MEDIA_SCHEMA)
    out = transcode_audio(df, target="aiff", depth="native").collect()[0]
    assert decode_aiff_native(bytes(out["payload"])) == (8000, 1, 16, pcm)
    # Vorbis/Opus (no from-spec decoder) keep the named rejection
    vorbis = (b"OggS\x00\x02" + b"\x00" * 20 + b"\x01" + b"\x1e"
              + b"\x01vorbis" + b"\x00" * 23)
    with pytest.raises(NotImplementedError, match="Ogg"):
        _real_decode(vorbis, 4)


def test_ogg_demux_edge_framing():
    """r14 review pass 2: EOS stops the walk (trailing tags/padding
    after the last page must not fail an intact stream); a truncated
    NON-FLAC Ogg still reaches the named rejection (peek-before-demux);
    a head-lost continuation page drops its orphan fragment per
    RFC 3533 §5."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from flac_craft import encode_flac

    from parquet_converters_spark.functions.audio_codecs import (
        ogg_flac_to_native,
        ogg_packets,
    )
    from parquet_converters_spark.functions.multimodal import _real_decode

    pcm = [((13 * k) % 600) - 300 for k in range(700)]
    native = encode_flac([pcm], 8000, 16, modes=[("fixed", 1)],
                         block_size=256)
    ogg = _flac_as_ogg(native, granule_last=700)
    # trailing junk after the EOS page: stream still demuxes
    assert ogg_flac_to_native(ogg + b"\x00" * 64) == native
    assert ogg_flac_to_native(ogg + b"APETAGEX" + b"\x01" * 40) == native
    # truncated Ogg VORBIS: named NotImplementedError, not a demux
    # ValueError (the peek decides FLAC-or-not before reassembly)
    vid = (b"\x01vorbis" + b"\x00" * 4 + bytes([2])
           + (44100).to_bytes(4, "little") + b"\x00" * 12 + b"\xb8\x01")
    vorbis = _ogg_mux([vid, b"\x03vorbis" + b"\x00" * 500])
    truncated = vorbis[: len(vorbis) - 40]
    assert ogg_flac_to_native(truncated) is None
    with pytest.raises(NotImplementedError, match="Ogg"):
        _real_decode(truncated, 4)
    # head-page-lost: first surviving page has the continuation flag;
    # its orphan leading fragment is dropped, not emitted as a packet
    big = bytes(range(256)) * 2  # one packet spanning pages
    paged = _ogg_mux([big, b"tail"], max_segs=1)
    # find the second page (starts after page 1's 27+1+255 bytes)
    second = paged[27 + 1 + 255:]
    assert second[:4] == b"OggS" and second[5] & 0x01
    pkts = ogg_packets(second)
    assert pkts == [b"tail"]  # orphan fragment of `big` discarded


def test_encode_ogg_flac_roundtrip(spark):
    """r14: the mux direction — transcode_audio(target='ogg') wraps
    the production FLAC encode in the FLAC-to-Ogg mapping (one frame
    per packet/page, cumulative granules, EOS on the last page); the
    demux side (itself validated against the independent test-side
    muxer) must reproduce the bare FLAC stream byte-exactly, the full
    CRC/MD5 ladder green, and the probe must read the mapping
    header + last-page granule back."""
    from parquet_converters_spark.functions.audio_codecs import (
        encode_ogg_flac,
        ogg_flac_to_native,
        ogg_packets,
    )
    from parquet_converters_spark.functions.flac_codec import (
        decode_flac_full,
    )
    from parquet_converters_spark.functions.flac_encoder import (
        encode_flac as prod_encode_flac,
    )
    from parquet_converters_spark.functions.media_probe import (
        probe_media_payload,
    )

    pcm = [((17 * k) % 2000) - 1000 for k in range(3000)]
    ogg = encode_ogg_flac(12000, pcm, channels=1, bits=16,
                          block_size=1024)
    bare = prod_encode_flac(12000, pcm, 1, 16, block_size=1024)
    assert ogg_flac_to_native(ogg) == bare  # concatenation law
    # mapping shape: header packet + one packet per frame (3 frames)
    pkts = ogg_packets(ogg)
    assert len(pkts) == 1 + 3 and pkts[0][:5] == b"\x7fFLAC"
    rate, ch, bits, samples, md5_ok = decode_flac_full(
        ogg_flac_to_native(ogg))
    assert md5_ok is True and samples == pcm
    rec = probe_media_payload(ogg)
    assert rec["format"] == "ogg/flac"
    assert rec["duration_s"] == pytest.approx(3000 / 12000)
    # through the Spark sink: any source -> ogg -> decode == source
    from parquet_converters_spark.functions.media_codecs import encode_wav
    from parquet_converters_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        transcode_audio,
    )

    wav = encode_wav(16000, pcm[:800])
    df = spark.createDataFrame(
        [(1, "audio", bytearray(wav), "audio/wav", 0)], MEDIA_SCHEMA)
    out = transcode_audio(df, target="ogg").collect()[0]
    r2, c2, b2, s2, ok2 = decode_flac_full(
        ogg_flac_to_native(bytes(out["payload"])))
    assert (r2, c2, b2, s2, ok2) == (16000, 1, 16, pcm[:800], True)
    # empty-stream degenerate: bare EOS page, still demuxable
    empty = encode_ogg_flac(8000, [], channels=1, bits=16)
    assert ogg_flac_to_native(empty)[:4] == b"fLaC"


def _ogg_crc_ref(data: bytes) -> int:
    """Independent bitwise RFC 3533 page CRC (poly 0x04C11DB7, init 0,
    non-reflected, no final xor) — checks the engine's table-driven
    implementation from a second construction."""
    crc = 0
    for byte in data:
        crc ^= byte << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7) if crc & 0x80000000 \
                else (crc << 1)
            crc &= 0xFFFFFFFF
    return crc


def test_ogg_pages_carry_spec_crc():
    """r15 ADVICE (high): spec-compliant readers (libogg, ffmpeg)
    verify the page CRC and DISCARD mismatching pages — every page the
    engine emits (the transcode sink included) must carry the real
    RFC 3533 checksum, verified here against an independent bitwise
    implementation."""
    from parquet_converters_spark.functions.audio_codecs import (
        encode_ogg_flac,
        ogg_flac_to_native,
    )
    from parquet_converters_spark.functions.media_craft import (
        ogg_crc,
        ogg_page,
    )

    # the crafting primitive itself, including a multi-lace page
    for pkt in (b"", b"x", b"y" * 255, b"z" * 700):
        page = ogg_page(3, pkt, htype=0, seq=7)
        stored = int.from_bytes(page[22:26], "little")
        assert stored != 0 or pkt == b""
        zeroed = bytearray(page)
        zeroed[22:26] = b"\x00\x00\x00\x00"
        assert stored == _ogg_crc_ref(bytes(zeroed))
        assert ogg_crc(bytes(zeroed)) == stored
    # every page of a production transcode stream
    pcm = [((13 * k) % 400) - 200 for k in range(2500)]
    ogg = encode_ogg_flac(22050, pcm, channels=1, bits=16,
                          block_size=1024)
    npages = 0
    p = 0
    while p < len(ogg):
        assert ogg[p : p + 4] == b"OggS"
        nseg = ogg[p + 26]
        body = p + 27 + nseg
        length = 27 + nseg + sum(ogg[p + 27 : body])
        page = bytearray(ogg[p : p + length])
        stored = int.from_bytes(page[22:26], "little")
        page[22:26] = b"\x00\x00\x00\x00"
        assert stored == _ogg_crc_ref(bytes(page)), f"page {npages}"
        npages += 1
        p += length
    assert npages == 1 + 3  # BOS + ceil(2500/1024) frame pages
    # and the demux/decode path is CRC-agnostic: still byte-exact
    assert ogg_flac_to_native(ogg)[:4] == b"fLaC"


def test_jdk_mp3_probe_memoizes_only_in_band(monkeypatch):
    """r15 ADVICE: only the in-band UnsupportedAudioFileException may
    pin the MP3 capability to False — a transient bridge/JVM failure
    must propagate un-memoized, or one hiccup permanently disables
    the decode seam for the whole process."""
    from parquet_converters_spark.functions import native_codecs as nc

    saved = list(nc._JDK_MP3_CAPABILITY)
    nc._JDK_MP3_CAPABILITY.clear()
    try:
        def boom(classes, payload):
            raise ValueError("JDK sound: java.io.IOException: pipe")

        monkeypatch.setattr(nc, "_audio_bridge_decode", boom)
        with pytest.raises(ValueError, match="pipe"):
            nc.jdk_sound_mp3_supported(classes={})
        assert nc._JDK_MP3_CAPABILITY == []  # NOT pinned

        def unsupported(classes, payload):
            raise ValueError(
                "JDK sound: javax.sound.sampled."
                "UnsupportedAudioFileException: Stream of unsupported"
                " format")

        monkeypatch.setattr(nc, "_audio_bridge_decode", unsupported)
        assert nc.jdk_sound_mp3_supported(classes={}) is False
        assert nc._JDK_MP3_CAPABILITY == [False]
        # once memoized, later transient errors are never consulted
        monkeypatch.setattr(nc, "_audio_bridge_decode", boom)
        assert nc.jdk_sound_mp3_supported(classes={}) is False
    finally:
        nc._JDK_MP3_CAPABILITY.clear()
        nc._JDK_MP3_CAPABILITY.extend(saved)


def test_ogg_packets_verify_crc():
    """r15: opt-in page-CRC enforcement — the engine's mux output
    verifies clean; any single flipped bit in a page fails by name."""
    from parquet_converters_spark.functions.audio_codecs import (
        encode_ogg_flac,
        ogg_packets,
    )

    pcm = [((5 * k) % 1000) - 500 for k in range(1500)]
    ogg = encode_ogg_flac(8000, pcm, channels=1, bits=16,
                          block_size=1024)
    assert ogg_packets(ogg, verify_crc=True) == ogg_packets(ogg)
    bad = bytearray(ogg)
    bad[len(bad) // 2] ^= 0x40  # flip one payload bit mid-stream
    with pytest.raises(ValueError, match="CRC mismatch"):
        ogg_packets(bytes(bad), verify_crc=True)
    # the default stays CRC-agnostic (legacy zero-CRC fixtures)
    hdr_zeroed = bytearray(ogg)
    hdr_zeroed[22:26] = b"\x00\x00\x00\x00"
    assert ogg_packets(bytes(hdr_zeroed)) == ogg_packets(ogg)
