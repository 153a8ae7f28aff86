"""Property-based codec tests (hypothesis): the from-spec media codecs
must hold their invariants on ARBITRARY pixel/sample content, not just
the deterministic fixtures — lossless formats round-trip exactly,
lossy JPEG keeps its progressive==baseline coefficient identity, and
every encoder is deterministic.

Sizes are kept small (codecs are pure Python; the point is edge-case
coverage — odd dims, extreme values, single pixels — not throughput).
"""

import pytest

try:
    from hypothesis import given, settings, strategies as st

    HAVE_HYPOTHESIS = True
except Exception:  # pragma: no cover
    HAVE_HYPOTHESIS = False
    pytest.skip("hypothesis not installed", allow_module_level=True)

from parquet_converters_spark.functions.gif_codec import (
    decode_gif,
    encode_gif,
)
from parquet_converters_spark.functions.jpeg_codec import (
    decode_jpeg,
    encode_jpeg,
)
from parquet_converters_spark.functions.media_codecs import (
    decode_bmp,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
    resize_nearest,
)
from parquet_converters_spark.functions.webp_codec import (
    decode_webp,
    encode_webp_lossless,
)

_DIM = st.integers(min_value=1, max_value=24)


@st.composite
def _image(draw, channels=(1, 3, 4), max_colors=None):
    w = draw(_DIM)
    h = draw(_DIM)
    c = draw(st.sampled_from(channels))
    if max_colors:
        # palette imagery: pixels drawn from a small random palette
        palette = draw(
            st.lists(
                st.binary(min_size=c, max_size=c),
                min_size=1,
                max_size=max_colors,
                unique=True,
            )
        )
        px = b"".join(
            palette[draw(st.integers(0, len(palette) - 1))]
            for _ in range(w * h)
        )
    else:
        px = draw(st.binary(min_size=w * h * c, max_size=w * h * c))
    return w, h, c, px


@settings(max_examples=25, deadline=None)
@given(_image())
def test_png_roundtrip_any_pixels(img):
    w, h, c, px = img
    data = encode_png(w, h, c, px)
    assert decode_png(data) == (w, h, c, px)
    assert encode_png(w, h, c, px) == data


@settings(max_examples=25, deadline=None)
@given(_image(channels=(3, 4)))
def test_bmp_roundtrip_any_pixels(img):
    w, h, c, px = img
    data = encode_bmp(w, h, c, px)
    if c == 4 and not any(px[3::4]):
        # BI_RGB's 4th byte is reserved/zero: an all-zero alpha plane
        # decodes as opaque (common-decoder convention), not transparent.
        W, H, C, got = decode_bmp(data)
        assert (W, H, C) == (w, h, c)
        assert got[3::4] == b"\xff" * (w * h)
        for ch in range(3):
            assert got[ch::4] == px[ch::4]
    else:
        assert decode_bmp(data) == (w, h, c, px)
    assert encode_bmp(w, h, c, px) == data


@settings(max_examples=15, deadline=None)
@given(_image(channels=(3, 4), max_colors=16))
def test_gif_roundtrip_palette_pixels(img):
    w, h, c, px = img
    data = encode_gif(w, h, c, [px])
    W, H, C, got = decode_gif(data)
    assert (W, H) == (w, h)
    # opaque pixels round-trip exactly; transparent ones keep alpha=0
    for p in range(w * h):
        if c == 4 and px[4 * p + 3] < 128:
            assert C == 4 and got[4 * p + 3] == 0
        else:
            src = px[c * p : c * p + 3]
            dst = got[C * p : C * p + 3]
            assert dst == src
    assert encode_gif(w, h, c, [px]) == data


@settings(max_examples=25, deadline=None)
@given(_image(channels=(3, 4)))
def test_webp_roundtrip_any_pixels(img):
    """VP8L lossless round-trip on arbitrary pixels.  An all-opaque
    RGBA input legitimately decodes as 3-channel (ARGB alpha plane is
    uniform 255) — compare in RGBA space."""
    w, h, c, px = img
    data = encode_webp_lossless(w, h, c, px)
    W, H, C, got = decode_webp(data)
    assert (W, H) == (w, h)

    def rgba(buf, ch):
        if ch == 4:
            return bytes(buf)
        return b"".join(
            buf[3 * p : 3 * p + 3] + b"\xff" for p in range(w * h)
        )

    assert rgba(got, C) == rgba(px, c)
    assert encode_webp_lossless(w, h, c, px) == data


@settings(max_examples=10, deadline=None)
@given(_image(channels=(1, 3)), st.sampled_from([50, 85, 95]))
def test_jpeg_progressive_equals_baseline_any_pixels(img, quality):
    """The strongest JPEG invariant that holds on ARBITRARY content:
    the progressive ladder re-encodes the same quantized coefficients,
    so its decode must be bit-identical to the baseline decode."""
    w, h, c, px = img
    sub = "4:4:4" if c == 1 else "4:2:0"
    base = encode_jpeg(w, h, c, px, quality=quality, subsampling=sub)
    prog = encode_jpeg(
        w, h, c, px, quality=quality, subsampling=sub, progressive=True
    )
    assert decode_jpeg(prog) == decode_jpeg(base)


@settings(max_examples=10, deadline=None)
@given(_image(channels=(1, 3)))
def test_jpeg_decode_shape_and_determinism(img):
    w, h, c, px = img
    data = encode_jpeg(w, h, c, px, quality=85)
    assert encode_jpeg(w, h, c, px, quality=85) == data
    W, H, C, out = decode_jpeg(data)
    assert (W, H, C, len(out)) == (w, h, c, w * h * c)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=2, max_size=400),
    st.sampled_from([8000, 16000, 44100]),
    st.sampled_from([1, 2]),
)
def test_wav_roundtrip_any_samples(samples, rate, channels):
    if len(samples) % channels:
        samples = samples[: len(samples) - 1]
    if not samples:
        samples = [0, 0][:channels] * (2 // channels or 1)
    data = encode_wav(rate, samples, channels=channels)
    assert decode_wav(data) == (rate, channels, samples)


def test_corrupt_streams_raise_clean_errors():
    """The untrusted-corpus decoder contract: ANY mangled stream (bit
    flips, truncation, spliced garbage) raises ValueError or
    NotImplementedError — never IndexError/KeyError/struct.error, and
    never a runaway allocation (corrupt dimension fields are capped by
    the _MAX_PIXELS guards)."""
    import random

    from parquet_converters_spark.functions.avi_codec import (
        encode_avi_mjpeg,
        parse_avi_mjpeg,
    )
    from parquet_converters_spark.functions.gif_codec import (
        decode_gif,
        encode_gif,
    )
    from parquet_converters_spark.functions.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = random.Random(99)
    px = bytes(
        ((x * 7 + y * 13 + c * 29) % 256)
        for y in range(12)
        for x in range(16)
        for c in range(3)
    )
    jpg = encode_jpeg(16, 12, 3, px)
    samples = [
        (decode_gif, encode_gif(16, 12, 3, [bytes((v % 13) * 19 for v in range(576))])),
        (decode_jpeg, jpg),
        (decode_jpeg, encode_jpeg(16, 12, 3, px, progressive=True)),
        (parse_avi_mjpeg, encode_avi_mjpeg([jpg], fps=5)),
        (decode_png, encode_png(16, 12, 3, px)),
        (decode_bmp, encode_bmp(16, 12, 3, px)),
        (decode_wav, encode_wav(8000, [((i * 991) % 65536) - 32768 for i in range(300)])),
        (decode_webp, encode_webp_lossless(16, 12, 3, px)),
    ]
    for dec, data in samples:
        for trial in range(150):
            b = bytearray(data)
            mode = trial % 3
            if mode == 0:
                i = rng.randrange(len(b))
                b[i] ^= 1 << rng.randrange(8)
            elif mode == 1:
                b = bytearray(b[: rng.randrange(4, len(b))])
            else:
                i = rng.randrange(len(b))
                b[i : i + 4] = bytes(rng.randrange(256) for _ in range(4))
            try:
                dec(bytes(b))
            except (ValueError, NotImplementedError):
                pass
            # anything else (IndexError, KeyError, struct.error,
            # StopIteration) propagates and fails the test


@settings(max_examples=25, deadline=None)
@given(_image(), _DIM, _DIM)
def test_resize_nearest_properties(img, nw, nh):
    """Every output pixel of a nearest resize IS an input pixel (no
    interpolation invents values), and identity resize is exact."""
    w, h, c, px = img
    out = resize_nearest(w, h, c, px, nw, nh)
    assert len(out) == nw * nh * c
    assert resize_nearest(w, h, c, px, w, h) == px
    src_pixels = {px[i * c : (i + 1) * c] for i in range(w * h)}
    for j in range(nw * nh):
        assert out[j * c : (j + 1) * c] in src_pixels


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(-(1 << 15), (1 << 15) - 1), min_size=0,
             max_size=600),
    st.sampled_from([8000, 44100, 96000]),
    st.sampled_from([1, 2]),
    st.sampled_from([16, 20, 32]),
    st.sampled_from([16, 64, 256]),
)
def test_flac_roundtrip_any_samples(samples, rate, channels, bits,
                                    block_size):
    """r13 production FLAC encoder: any samples/rate/channels/depth/
    block size round-trip sample-exact with the decoder's full
    CRC-8/CRC-16/MD5 integrity ladder green, and encoding is
    deterministic."""
    from parquet_converters_spark.functions.flac_codec import (
        decode_flac_full,
    )
    from parquet_converters_spark.functions.flac_encoder import (
        encode_flac,
    )

    if len(samples) % channels:
        samples = samples[:-1]
    data = encode_flac(rate, samples, channels, bits,
                       block_size=block_size)
    assert encode_flac(rate, samples, channels, bits,
                       block_size=block_size) == data
    r, ch, b, out, md5_ok = decode_flac_full(data)
    assert (r, ch, b) == (rate, channels, bits)
    assert out == list(samples)
    assert md5_ok is True


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(-128, 127), min_size=1, max_size=400),
    st.sampled_from([8, 16, 24, 32]),
    st.sampled_from([8000, 48000]),
)
def test_pcm_container_writers_roundtrip(samples, bits, rate):
    """The three native-depth PCM writers (WAV/AU/AIFF) round-trip any
    samples through their own native decoders at every depth (values
    scaled onto each grid)."""
    from parquet_converters_spark.functions.audio_codecs import (
        decode_aiff_native,
        decode_au_native,
        encode_aiff,
        encode_au,
        encode_pcm_wav,
    )
    from parquet_converters_spark.functions.media_codecs import (
        decode_wav_native,
    )

    scaled = [s << (bits - 8) for s in samples]
    assert decode_wav_native(
        encode_pcm_wav(rate, scaled, 1, bits)) == (rate, 1, bits, scaled)
    assert decode_au_native(
        encode_au(rate, scaled, 1, bits)) == (rate, 1, bits, scaled)
    assert decode_aiff_native(
        encode_aiff(rate, scaled, 1, bits)) == (rate, 1, bits, scaled)
