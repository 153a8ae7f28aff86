"""From-spec FLAC decoder (functions/flac_codec.py) vs an independent
from-spec encoder (tests/flac_craft.py).

No FLAC implementation exists in this container (no flac binary, no
ffmpeg, no soundfile; probed), so the validation model is the HDF5
external-fixture pattern: encoder and decoder are two independent
readings of RFC 9639 that make opposite choices at every syntax fork,
glued together by the spec's own integrity ladder — frame-header
CRC-8, whole-frame CRC-16, and the STREAMINFO MD5 of the unencoded
audio.  The MD5 is computed by the ENCODER from its input and
re-derived by the DECODER from its output, so any sample-level
disagreement between the two implementations fails loudly rather than
silently round-tripping.  A hypothesis sweep covers randomized
shapes; deterministic cases pin every subframe type, stereo mode, bit
depth, Rice escape, and blocking variant.
"""

import os
import random
import sys

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

sys.path.insert(0, os.path.dirname(__file__))
from flac_craft import encode_flac  # noqa: E402

from parquet_converters_spark.functions.flac_codec import (  # noqa: E402
    decode_flac,
    decode_flac_full,
    is_flac,
)


def _smooth(n, seed, amp=1000):
    out, acc, x = [], 0, seed
    for _ in range(n):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        acc += ((x >> 7) % (amp // 4 or 2)) - (amp // 8 or 1)
        out.append(max(-amp, min(amp - 1, acc)))
    return out


def _interleave(chs):
    out = []
    for i in range(len(chs[0])):
        for c in chs:
            out.append(c[i])
    return out


def _roundtrip(chs, rate, bits, **kw):
    data = encode_flac(chs, rate, bits, **kw)
    r, c, b, s, md5 = decode_flac_full(data)
    assert (r, c, b) == (rate, len(chs), bits)
    assert s == _interleave(chs)
    assert md5 is (None if kw.get("omit_md5") else True)
    return data


# --------------------------------------------------------------------------
# deterministic feature pins
# --------------------------------------------------------------------------


@pytest.mark.parametrize("mode", [
    "verbatim", "constant",
    ("fixed", 0), ("fixed", 1), ("fixed", 2), ("fixed", 3), ("fixed", 4),
])
def test_subframe_types_roundtrip(mode):
    ch = [[-137] * 150] if mode == "constant" else [_smooth(150, 11)]
    _roundtrip(ch, 8000, 16, modes=[mode])


@pytest.mark.parametrize("order,prec,shift,coefs", [
    (1, 8, 2, [100]),
    (2, 12, 4, [2000, -1000]),
    (8, 10, 5, [500, -300, 200, -100, 80, -60, 40, -20]),
    (32, 6, 3, [((i * 7) % 61) - 30 for i in range(32)]),
])
def test_lpc_orders_roundtrip(order, prec, shift, coefs):
    _roundtrip([_smooth(180, 13 + order)], 44100, 16, modes=["lpc"],
               lpc=(order, prec, shift, coefs))


@pytest.mark.parametrize("stereo", [
    "independent", "left_side", "right_side", "mid_side",
])
def test_stereo_modes_roundtrip(stereo):
    chs = [_smooth(130, 19, 900), _smooth(130, 23, 900)]
    _roundtrip(chs, 48000, 16, stereo=stereo, modes=[("fixed", 2)])


@pytest.mark.parametrize("bits,amp", [
    (8, 100), (12, 1800), (16, 30000), (20, 400000),
    (24, 8_000_000), (32, 2_000_000_000),
])
def test_bit_depths_roundtrip(bits, amp):
    _roundtrip([_smooth(100, 29, amp)], 16000, bits, modes=[("fixed", 1)])


def test_wasted_bits_escape_partitions_and_blocking():
    w = [s << 3 for s in _smooth(100, 31, 500)]
    _roundtrip([w], 8000, 16, modes=[("fixed", 2)], wasted=3)
    _roundtrip([_smooth(128, 37, 800)], 8000, 16, modes=[("fixed", 2)],
               escape_raw=12)
    _roundtrip([[5] * 128], 8000, 16, modes=[("fixed", 1)], escape_raw=0)
    _roundtrip([_smooth(256, 41)], 8000, 16, modes=[("fixed", 2)],
               partition_order=3, block_size=128)
    _roundtrip([_smooth(500, 43)], 8000, 16, block_size=96,
               modes=["verbatim", ("fixed", 2), ("fixed", 4), "lpc"],
               lpc=(2, 12, 4, [1500, -700]))
    _roundtrip([_smooth(200, 47)], 8000, 16, block_size=100,
               blocksize_code="explicit8", modes=[("fixed", 2)])
    _roundtrip([_smooth(384, 53)], 8000, 16, block_size=192,
               blocksize_code=1, modes=[("fixed", 2)])
    _roundtrip([_smooth(100, 59)], 44101, 16, modes=[("fixed", 2)])
    _roundtrip([_smooth(100, 61)], 8000, 16, modes=[("fixed", 2)],
               omit_md5=True)


def test_eight_channels():
    chs = [_smooth(64, 70 + i, 500) for i in range(8)]
    _roundtrip(chs, 8000, 16, modes=[("fixed", 1)])


# --------------------------------------------------------------------------
# integrity ladder
# --------------------------------------------------------------------------


def test_crc8_tamper_detected():
    data = bytearray(_roundtrip([_smooth(100, 77)], 8000, 16,
                                modes=["verbatim"]))
    # STREAMINFO is 4 + 4 + 34 bytes; frame header starts at 42
    hdr = 42
    assert data[hdr] == 0xFF  # sync
    data[hdr + 4] ^= 0x01  # flip a header bit past the codes
    with pytest.raises(ValueError, match="CRC-8|sync|reserved|coded"):
        decode_flac_full(bytes(data))


def test_crc16_tamper_detected():
    good = _roundtrip([_smooth(100, 79)], 8000, 16, modes=["verbatim"])
    data = bytearray(good)
    data[-40] ^= 0x10  # flip a bit inside subframe data
    with pytest.raises(ValueError):
        decode_flac_full(bytes(data))


def test_md5_mismatch_detected():
    data = bytearray(_roundtrip([_smooth(100, 83)], 8000, 16,
                                modes=["verbatim"]))
    data[26] ^= 0xFF  # corrupt a byte inside the STREAMINFO MD5 field
    r, c, b, s, md5 = decode_flac_full(bytes(data))
    assert md5 is False
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(data))


def test_decode_flac_pcm16_normalization():
    for bits, sample, expect in ((8, 100, 100 << 8), (16, -1234, -1234),
                                 (24, 1 << 20, 1 << 12)):
        data = encode_flac([[sample] * 32], 8000, bits,
                           modes=["constant"])
        rate, channels, pcm = decode_flac(data)
        assert (rate, channels) == (8000, 1)
        assert pcm == [expect] * 32


def test_is_flac_and_corrupt_sweep():
    good = _roundtrip([_smooth(200, 89)], 8000, 16,
                      modes=[("fixed", 2), "verbatim"], block_size=64)
    assert is_flac(good) and not is_flac(good[1:])
    rng = random.Random(97)
    cases = [good[:n] for n in (3, 4, 8, 30, 42, 60, len(good) // 2)]
    for _ in range(300):
        m = bytearray(good)
        for _ in range(rng.randrange(1, 4)):
            m[rng.randrange(len(m))] = rng.randrange(256)
        cases.append(bytes(m))
    survived_clean = 0
    for case in cases:
        try:
            decode_flac_full(case)
            survived_clean += 1
        except (ValueError, NotImplementedError):
            pass
    # the integrity ladder should catch almost every mutation; a few
    # mutations land in skipped padding or are CRC-coincidences
    assert survived_clean < len(cases) // 4


# --------------------------------------------------------------------------
# randomized property sweep
# --------------------------------------------------------------------------

if HAVE_HYPOTHESIS:

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(1, 400),
        n_ch=st.integers(1, 3),
        bits=st.sampled_from([8, 16, 24]),
        block=st.sampled_from([32, 64, 100, 192]),
        seed=st.integers(0, 2**30),
        mode=st.sampled_from(["verbatim", ("fixed", 1), ("fixed", 2),
                              ("fixed", 3)]),
    )
    def test_random_roundtrip(n, n_ch, bits, block, seed, mode):
        amp = (1 << (bits - 1)) - 1
        chs = [_smooth(n, seed + i, amp) for i in range(n_ch)]
        _roundtrip(chs, 8000, bits, modes=[mode], block_size=block)

    @settings(max_examples=15, deadline=None)
    @given(
        n=st.integers(2, 300),
        seed=st.integers(0, 2**30),
        stereo=st.sampled_from(["left_side", "right_side", "mid_side"]),
    )
    def test_random_stereo_roundtrip(n, seed, stereo):
        chs = [_smooth(n, seed, 20000), _smooth(n, seed + 1, 20000)]
        _roundtrip(chs, 44100, 16, stereo=stereo, modes=[("fixed", 2)])


# --------------------------------------------------------------------------
# decode_media integration
# --------------------------------------------------------------------------


def test_decode_media_flac(spark):
    import numpy as np

    from parquet_converters_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        _band_features,
        decode_media,
    )

    chs = [_smooth(300, 101, 20000), _smooth(300, 103, 20000)]
    payload = encode_flac(chs, 44100, 16, stereo="mid_side",
                          modes=[("fixed", 2)], block_size=128)
    df = spark.createDataFrame(
        [(500, "audio", bytearray(payload), "audio/flac", len(payload))],
        MEDIA_SCHEMA,
    )
    rows = decode_media(df, n_features=4).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["width"] is None and r["channels"] == 2
    samples = _interleave(chs)
    scaled = [min(abs(s), 32767) // 128 for s in samples]
    assert r["features"] == [
        float(np.float32(f)) for f in _band_features(scaled, 4)
    ]
