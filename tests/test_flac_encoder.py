"""Production FLAC encoder (functions/flac_encoder.py) + the
transcode_audio sink surface (r12 verdict item 5).

Validation ladder:

1. Every stream decodes back SAMPLE-EXACT through the from-spec
   decoder with its full integrity ladder green — frame CRC-8s and
   CRC-16s are verified by the decoder on every frame, and the
   STREAMINFO MD5 (computed from the INPUT here, recomputed from the
   decoder's OUTPUT there) must report True.
2. Cross-encoder agreement: the same content authored by the
   INDEPENDENT test-side encoder (tests/flac_craft.py — variable
   blocking, explicit block-size/rate codes: the opposite syntax fork
   at every turn) decodes to the same samples as ours.
3. Real compression on smooth content, graceful verbatim on noise.
4. Spark-level: transcode_audio normalizes a mixed WAV/AU/AIFF/FLAC
   corpus to FLAC payloads that decode back to each source's PCM16.
"""

import os
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from parquet_converters_spark.functions.flac_codec import (  # noqa: E402
    decode_flac_full,
)
from parquet_converters_spark.functions.flac_encoder import (  # noqa: E402
    encode_flac,
)


def smooth(n, seed=7, amp=20000):
    rng = np.random.RandomState(seed)
    acc = np.cumsum(rng.randint(-amp // 8, amp // 8, n))
    return np.clip(acc, -amp, amp - 1).astype(np.int64)


@pytest.mark.parametrize("nsamp,bs", [
    (10000, 4096), (4096, 4096), (4095, 4096), (100, 64),
    (192, 192), (1, 16), (0, 4096),
])
def test_roundtrip_mono16(nsamp, bs):
    x = smooth(nsamp)
    data = encode_flac(44100, x, 1, 16, block_size=bs)
    rate, ch, bits, out, md5_ok = decode_flac_full(data)
    assert (rate, ch, bits) == (44100, 1, 16)
    assert np.array_equal(np.asarray(out), x)
    assert md5_ok is True


@pytest.mark.parametrize("bits", [8, 12, 16, 20, 24, 32])
def test_roundtrip_depths(bits):
    amp = 1 << (bits - 2)
    x = np.clip(smooth(3000, seed=bits, amp=amp),
                -(1 << (bits - 1)), (1 << (bits - 1)) - 1)
    data = encode_flac(8000, x, 1, bits, block_size=1024)
    rate, ch, b, out, md5_ok = decode_flac_full(data)
    assert b == bits
    assert np.array_equal(np.asarray(out), x)
    assert md5_ok is True


def test_roundtrip_stereo_and_decorrelation_modes():
    """Correlated stereo content must exercise the decorrelated
    channel assignments (8/9/10) on the wire, and still round-trip
    exactly.  The mode is read back from our own frame headers —
    fixed blocking, so the header layout is ours by construction."""
    left = smooth(8000, seed=3)
    rng = np.random.RandomState(4)
    right = np.clip(left + rng.randint(-40, 40, 8000), -32768, 32767)
    inter = np.empty(16000, np.int64)
    inter[0::2], inter[1::2] = left, right
    data = encode_flac(48000, inter, 2, 16, block_size=1024)
    rate, ch, bits, out, md5_ok = decode_flac_full(data)
    assert (rate, ch, md5_ok) == (48000, 2, True)
    assert np.array_equal(np.asarray(out), inter)
    # scan frame sync words and collect channel-assignment codes
    modes = set()
    pos = data.find(b"\xff\xf8")
    while pos != -1:
        ch_code = data[pos + 3] >> 4
        modes.add(ch_code)
        pos = data.find(b"\xff\xf8", pos + 2)
    assert modes & {8, 9, 10}, f"no decorrelated frames: {modes}"


def test_lpc_subframes_on_tonal_content():
    """r13: LPC predictors (section 9.2.6).  Sinusoidal content must
    (a) round-trip sample-exact with the full integrity ladder green,
    (b) emit LPC subframe types on the wire (6-bit type >= 32), and
    (c) beat the fixed-only encoder by a real margin."""
    import parquet_converters_spark.functions.flac_encoder as FE

    t = np.arange(30000)
    rng = np.random.RandomState(3)
    x = np.clip(
        9000 * np.sin(2 * np.pi * t * 440 / 44100)
        + 5000 * np.sin(2 * np.pi * t * 659 / 44100)
        + rng.randint(-200, 200, len(t)),
        -32768, 32767,
    ).astype(np.int64)
    data = encode_flac(44100, x, 1, 16)
    rate, ch, bits, out, md5_ok = decode_flac_full(data)
    assert md5_ok is True and np.array_equal(np.asarray(out), x)
    orig = FE._lpc_candidates
    try:
        FE._lpc_candidates = lambda *a, **k: []
        fixed_only = FE.encode_flac(44100, x, 1, 16)
    finally:
        FE._lpc_candidates = orig
    assert len(data) < 0.97 * len(fixed_only), (
        len(data), len(fixed_only))
    # first subframe type on the wire: byte after the first frame
    # header must carry an LPC type (1 zero bit + 6-bit type >= 32)
    choice = FE._subframe_cost(x[:4096], 16, 4096)
    assert choice[0] == "lpc" and 1 <= choice[1] <= 8


def test_lpc_quantization_edges():
    from parquet_converters_spark.functions.flac_encoder import (
        _lpc_residual,
        _quantize_lpc,
    )

    # tiny coefficients still quantize (shift clamps at 15)
    q = _quantize_lpc(np.array([1e-6, -1e-6]))
    assert q is not None and q[1] == 15
    # huge coefficients are rejected, not mangled
    assert _quantize_lpc(np.array([9000.0])) is None
    # exact integer predictor reproduces the fixed-order-1 residual
    x = np.array([10, 20, 30, 45, 55], dtype=np.int64)
    qc, shift = _quantize_lpc(np.array([1.0]))
    resid = _lpc_residual(x, qc, shift)
    assert list(resid) == [10, 10, 15, 10]


def test_wasted_bits_on_widened_content():
    """r13: 'wasted bits' (section 9.2.2) — content with shared low
    zero bits (8-bit audio widened onto the 16-bit grid, exactly what
    the pcm16 transcode convention produces) codes on the narrow grid.
    Must round-trip exactly and beat the no-wasted encoding by a wide
    margin."""
    import parquet_converters_spark.functions.flac_encoder as FE

    rng = np.random.RandomState(11)
    saw = (np.arange(20000) % 200 - 100).astype(np.int64)
    x8 = ((saw + rng.randint(-10, 11, 20000)).clip(-128, 127)
          << 8).astype(np.int64)
    data = FE.encode_flac(8000, x8, 1, 16, block_size=1024)
    rate, ch, bits, out, md5_ok = decode_flac_full(data)
    assert md5_ok is True and np.array_equal(np.asarray(out), x8)
    orig = FE._wasted_bits
    try:
        FE._wasted_bits = lambda *a: 0
        without = FE.encode_flac(8000, x8, 1, 16, block_size=1024)
    finally:
        FE._wasted_bits = orig
    assert len(data) < 0.75 * len(without), (len(data), len(without))
    # the without-stream is also valid (wasted is an optimization,
    # not a format requirement)
    assert decode_flac_full(without)[4] is True


def test_compression_real_and_noise_graceful():
    x = smooth(20000)
    data = encode_flac(44100, x, 1, 16)
    assert len(data) < 0.6 * (2 * len(x)), len(data)
    rng = np.random.RandomState(9)
    noise = rng.randint(-32768, 32768, 5000).astype(np.int64)
    nd = encode_flac(8000, noise, 1, 16)
    assert len(nd) < 2 * 5000 + 256  # verbatim + headers, never blows up
    assert decode_flac_full(nd)[4] is True


def test_constant_collapses():
    x = np.full(8192, -12345, np.int64)
    data = encode_flac(8000, x, 1, 16)
    assert len(data) < 200
    rate, ch, bits, out, md5_ok = decode_flac_full(data)
    assert md5_ok is True and set(out) == {-12345}


def test_cross_encoder_agreement_with_craft():
    """flac_craft (variable blocking, explicit codes) and the
    production encoder (fixed blocking, common codes) author the same
    content; the decoder must produce identical samples from both —
    and the streams themselves must differ (different syntax forks)."""
    from flac_craft import encode_flac as craft_encode

    x = smooth(2000, seed=11)
    ours = encode_flac(8000, x, 1, 16, block_size=256)
    theirs = craft_encode([x.tolist()], 8000, 16,
                          modes=[("fixed", 2)], block_size=256)
    assert ours != theirs
    ro = decode_flac_full(ours)
    rt = decode_flac_full(theirs)
    assert ro[3] == rt[3] == x.tolist()
    assert ro[4] is rt[4] is True
    # blocking-strategy bit: ours fixed (0), craft variable (1)
    assert not _blocking_bit(ours) and _blocking_bit(theirs)


def _blocking_bit(data):
    pos = data.find(b"\xff\xf8")
    if pos == -1:
        pos = data.find(b"\xff\xf9")
    return data[pos + 1] & 1


def test_streaminfo_fields():
    x = smooth(5000)
    data = encode_flac(22050, x, 1, 16, block_size=512)
    assert data[:4] == b"fLaC"
    min_bs, max_bs = struct.unpack(">HH", data[8:12])
    assert min_bs == max_bs == 512
    min_f = int.from_bytes(data[12:15], "big")
    max_f = int.from_bytes(data[15:18], "big")
    assert 0 < min_f <= max_f
    packed = int.from_bytes(data[18:26], "big")
    assert packed >> 44 == 22050
    assert packed & ((1 << 36) - 1) == 5000


def test_input_validation():
    with pytest.raises(ValueError, match="bit depth"):
        encode_flac(8000, [0], 1, 13)
    with pytest.raises(ValueError, match="block_size"):
        encode_flac(8000, [0], 1, 16, block_size=8)
    with pytest.raises(ValueError, match="divisible"):
        encode_flac(8000, [0, 1, 2], 2, 16)
    with pytest.raises(ValueError, match="range"):
        encode_flac(8000, [40000], 1, 16)
    with pytest.raises(ValueError, match="sample rate"):
        encode_flac(1 << 20, [0], 1, 16)
    with pytest.raises(ValueError, match="channels"):
        encode_flac(8000, [0], 9, 16)


def test_transcode_audio_mixed_corpus_to_flac(spark):
    """Spark sink surface: a mixed WAV/AU/AIFC/FLAC corpus normalized
    to FLAC; every output payload decodes back (full integrity
    ladder) to the source's PCM16 interchange samples."""
    from audio_fixtures import VECTORS

    from parquet_converters_spark.functions.flac_codec import decode_flac
    from parquet_converters_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        _decode_audio_payload,
        transcode_audio,
    )

    names = ["wav_pcm16", "au_ulaw", "aifc_sowt", "aiff_pcm24"]
    rows = [
        (i, "audio", bytearray(VECTORS[n]["payload"]), "audio/x", 0)
        for i, n in enumerate(names)
    ]
    ours = encode_flac(8000, smooth(1000, seed=5), 1, 16, block_size=256)
    rows.append((len(names), "audio", bytearray(ours), "audio/flac", 0))
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in transcode_audio(df).collect()}
    assert len(got) == 5
    for i, n in enumerate(names):
        src_rate, src_ch, src_samples = _decode_audio_payload(
            VECTORS[n]["payload"]
        )
        out = got[i]
        assert (out["sample_rate"], out["channels"]) == (src_rate, src_ch)
        rate, ch, flac_samples = decode_flac(bytes(out["payload"]))
        assert flac_samples == list(src_samples)
    # FLAC in -> FLAC out stays sample-exact too
    r5 = got[len(names)]
    assert decode_flac(bytes(r5["payload"]))[2] == decode_flac(ours)[2]


def test_transcode_audio_wav_target_roundtrip(spark):
    from parquet_converters_spark.functions.media_codecs import (
        decode_wav,
        encode_wav,
    )
    from parquet_converters_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        transcode_audio,
    )

    pcm = smooth(500, seed=6).tolist()
    flac = encode_flac(16000, pcm, 1, 16, block_size=128)
    df = spark.createDataFrame(
        [(1, "audio", bytearray(flac), "audio/flac", 0)], MEDIA_SCHEMA
    )
    out = transcode_audio(df, target="wav").collect()[0]
    assert decode_wav(bytes(out["payload"])) == (16000, 1, pcm)
    assert bytes(out["payload"]) == encode_wav(16000, pcm, 1)


def test_transcode_audio_native_depth_24bit_lossless(spark):
    """r13: depth='native' — a 24-bit WAV authored by the CPython
    stdlib wave writer must become 24-bit FLAC with EVERY bit
    preserved (the pcm16 default would shift off the low 8), then
    round-trip back to a byte-identical native WAV."""
    import wave as wave_mod
    from io import BytesIO

    from parquet_converters_spark.functions.audio_codecs import (
        encode_pcm_wav,
    )
    from parquet_converters_spark.functions.flac_codec import (
        decode_flac_full,
    )
    from parquet_converters_spark.functions.media_codecs import (
        decode_wav_native,
    )
    from parquet_converters_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        transcode_audio,
    )

    rng = np.random.RandomState(12)
    pcm24 = np.clip(
        np.cumsum(rng.randint(-300000, 300000, 2000)),
        -(1 << 23), (1 << 23) - 1,
    ).astype(np.int64)
    # author with the stdlib writer (independent of our codecs)
    frames = b"".join(
        int(s).to_bytes(3, "little", signed=True) for s in pcm24
    )
    bio = BytesIO()
    w = wave_mod.open(bio, "wb")
    w.setnchannels(1)
    w.setsampwidth(3)
    w.setframerate(48000)
    w.writeframes(frames)
    w.close()
    wav_bytes = bio.getvalue()
    assert decode_wav_native(wav_bytes) == (48000, 1, 24, pcm24.tolist())

    df = spark.createDataFrame(
        [(1, "audio", bytearray(wav_bytes), "audio/wav", 0)],
        MEDIA_SCHEMA,
    )
    out = transcode_audio(df, depth="native").collect()[0]
    assert out["bit_depth"] == 24
    rate, ch, bits, samples, md5_ok = decode_flac_full(
        bytes(out["payload"])
    )
    assert (rate, ch, bits, md5_ok) == (48000, 1, 24, True)
    assert samples == pcm24.tolist()  # every bit survived
    # and back out to a native WAV, byte-identical to the canonical
    # 24-bit writer over the same samples
    df2 = spark.createDataFrame(
        [(2, "audio", bytearray(out["payload"]), "audio/flac", 0)],
        MEDIA_SCHEMA,
    )
    back = transcode_audio(df2, target="wav", depth="native").collect()[0]
    assert bytes(back["payload"]) == encode_pcm_wav(
        48000, pcm24.tolist(), 1, 24
    )
    # the pcm16 default on the same input really does truncate
    out16 = transcode_audio(df, depth="pcm16").collect()[0]
    r16 = decode_flac_full(bytes(out16["payload"]))
    assert r16[2] == 16 and r16[3] == (pcm24 >> 8).tolist()


def test_encode_pcm_wav_depths_roundtrip():
    from parquet_converters_spark.functions.audio_codecs import (
        encode_pcm_wav,
    )
    from parquet_converters_spark.functions.media_codecs import (
        decode_wav_native,
    )

    rng = np.random.RandomState(4)
    for bits in (8, 16, 24, 32):
        amp = 1 << (bits - 2)
        x = np.clip(rng.randint(-amp, amp, 501), -(1 << (bits - 1)),
                    (1 << (bits - 1)) - 1).astype(np.int64).tolist()
        wav = encode_pcm_wav(22050, x, 1, bits)
        assert decode_wav_native(wav) == (22050, 1, bits, x)
    with pytest.raises(ValueError, match="bit depth"):
        encode_pcm_wav(8000, [0], 1, 12)
    with pytest.raises(ValueError, match="range"):
        encode_pcm_wav(8000, [200], 1, 8)


def test_transcode_audio_rejects_unknown(spark):
    from parquet_converters_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        transcode_audio,
    )

    df = spark.createDataFrame(
        [(1, "audio", bytearray(b"OggS" + bytes(30)), None, 34)],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="transcode supports"):
        transcode_audio(df).collect()
    with pytest.raises(ValueError, match="unknown target"):
        transcode_audio(df, target="mp3")


def test_transcode_native_widens_odd_flac_depths(spark):
    """12/20-bit FLAC is spec-valid but the PCM containers are
    byte-aligned: depth='native' widens to the next supported depth by
    left shift (amplitude-preserving; the zeros come back as wasted
    bits on re-encode) instead of crashing the job."""
    from parquet_converters_spark.functions.media_codecs import (
        decode_wav_native,
    )
    from parquet_converters_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        transcode_audio,
    )

    pcm12 = [((31 * k) % 4000) - 2000 for k in range(400)]
    flac12 = encode_flac(8000, pcm12, 1, 12, block_size=128)
    df = spark.createDataFrame(
        [(1, "audio", bytearray(flac12), "audio/flac", 0)], MEDIA_SCHEMA
    )
    out = transcode_audio(df, target="wav", depth="native").collect()[0]
    assert out["bit_depth"] == 16
    rate, ch, bits, samples = decode_wav_native(bytes(out["payload"]))
    assert (rate, ch, bits) == (8000, 1, 16)
    assert samples == [s << 4 for s in pcm12]
    # FLAC target keeps the odd depth natively
    out_f = transcode_audio(df, target="flac", depth="native").collect()[0]
    assert out_f["bit_depth"] == 12
    assert decode_flac_full(bytes(out_f["payload"]))[3] == pcm12


def test_resample_pcm16_properties():
    """Integer linear-interpolation resampler invariants: constants
    stay constant, ramps stay ramps (exact at integer positions),
    frequency content scales (zero-crossing count preserved), and the
    arithmetic is deterministic integer math."""
    from parquet_converters_spark.functions.multimodal import (
        _resample_pcm16,
    )

    # constant in -> constant out, any rate pair
    const = [777] * 1000
    for src, dst in ((8000, 16000), (44100, 16000), (16000, 16000)):
        out = _resample_pcm16(const, 1, src, dst)
        assert set(out) == {777}
        assert len(out) == max(1, 1000 * dst // src)
    # a linear ramp resamples onto the same line (exact: integer
    # interpolation of a line IS the line at the sampled positions)
    ramp = list(range(0, 4000, 4))
    up = _resample_pcm16(ramp, 1, 8000, 16000)
    for i, v in enumerate(up[: 2 * len(ramp) - 2]):
        assert v == 2 * i, (i, v)
    # sine frequency preserved: zero crossings scale with duration
    t = np.arange(8000)
    sine = (10000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int64)
    res = _resample_pcm16(sine.tolist(), 1, 8000, 16000)
    zc = sum(1 for a, b in zip(res, res[1:]) if (a >= 0) != (b >= 0))
    zc_src = sum(1 for a, b in zip(sine, sine[1:]) if (a >= 0) != (b >= 0))
    assert abs(zc - zc_src) <= 2  # same tone, same second of audio
    # stereo: channels resample independently
    inter = [100, -100] * 500
    out = _resample_pcm16(inter, 2, 8000, 4000)
    assert out[0::2] == [100] * (len(out) // 2)
    assert out[1::2] == [-100] * (len(out) // 2)


def test_resample_audio_spark(spark):
    from parquet_converters_spark.functions.flac_codec import decode_flac
    from parquet_converters_spark.functions.media_codecs import (
        decode_wav,
        encode_wav,
    )
    from parquet_converters_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        resample_audio,
    )

    pcm = smooth(4000, seed=2).tolist()
    wav = encode_wav(8000, pcm)
    flac = encode_flac(44100, smooth(4410, seed=3), 1, 16)
    df = spark.createDataFrame(
        [(1, "audio", bytearray(wav), "audio/wav", 0),
         (2, "audio", bytearray(flac), "audio/flac", 0)],
        MEDIA_SCHEMA,
    )
    got = {r["media_id"]: r for r in
           resample_audio(df, 16000).collect()}
    assert got[1]["sample_rate"] == got[2]["sample_rate"] == 16000
    r1 = decode_wav(bytes(got[1]["payload"]))
    assert r1[0] == 16000 and len(r1[2]) == 8000  # 0.5 s at 16 kHz
    # flac target too
    out_f = {r["media_id"]: r for r in
             resample_audio(df, 16000, target="flac").collect()}
    rf = decode_flac(bytes(out_f[1]["payload"]))
    assert rf[0] == 16000 and rf[2] == r1[2]
    with pytest.raises(ValueError, match="target_rate"):
        resample_audio(df, 0)
