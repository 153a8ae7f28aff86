"""Cross-validation of the from-spec Python codecs against the JDK's
``javax.imageio`` implementations (tests/ImageIoVector.java).

This is the *external known-answer* leg the PIL-gated tests could never
run in this container: the JDK ships independent JPEG/PNG/GIF/BMP
readers and writers, and a JDK is a hard dependency of Spark itself —
so these tests run everywhere the engine runs, with zero optional
Python deps.  A symmetric encoder/decoder bug (YCbCr matrix sign, IDCT
transpose, zigzag order...) that own-round-trip tests cannot see fails
here.

Measured agreement this suite pins (JDK 17 ImageIO vs ours):
  - PNG / BMP-24 / GIF (incl. interlaced): byte-exact pixels, both ways
  - JPEG gray + color, baseline + progressive, 4:4:4 + 4:2:0:
    max per-sample diff <= 2 between the two decoders on the same
    stream (IDCT/rounding implementation slack; IJG-style fixed-point
    vs our float path)
"""

import math
import shutil
import subprocess
from pathlib import Path

import pytest

_JAVA = shutil.which("java")
_JAVAC = shutil.which("javac")

pytestmark = pytest.mark.skipif(
    not (_JAVA and _JAVAC), reason="JDK (java+javac) not on PATH"
)


# --------------------------------------------------------------------------
# harness
# --------------------------------------------------------------------------


class _ImageIO:
    """Wrapper around the compiled ImageIoVector oracle."""

    def __init__(self, classdir: Path):
        self.classdir = str(classdir)
        self.work = classdir

    def _run(self, *args):
        subprocess.run(
            [_JAVA, "-cp", self.classdir, "ImageIoVector", *args],
            check=True,
            capture_output=True,
        )

    def decode(self, data: bytes, suffix: str) -> tuple[int, int, bytes]:
        """ImageIO-decode ``data`` -> (w, h, RGBA bytes)."""
        src = self.work / f"in{suffix}"
        dst = self.work / "out.raw"
        src.write_bytes(data)
        self._run("decode", str(src), str(dst))
        raw = dst.read_bytes()
        nl = raw.index(b"\n")
        w, h, _ = map(int, raw[:nl].split())
        px = raw[nl + 1 :]
        assert len(px) == w * h * 4
        return w, h, px

    def encode(self, fmt, w, h, c, pixels: bytes, opts: str = "") -> bytes:
        src = self.work / "in.raw"
        dst = self.work / f"out.{fmt}"
        src.write_bytes(pixels)
        args = ["encode", fmt, str(w), str(h), str(c), str(src), str(dst)]
        if opts:
            args.append(opts)
        self._run(*args)
        return dst.read_bytes()


@pytest.fixture(scope="session")
def iio(tmp_path_factory):
    d = tmp_path_factory.mktemp("imageio_oracle")
    src = Path(__file__).parent / "ImageIoVector.java"
    shutil.copy(src, d / "ImageIoVector.java")
    subprocess.run(
        [_JAVAC, str(d / "ImageIoVector.java")],
        check=True,
        capture_output=True,
    )
    return _ImageIO(d)


def _pattern(w, h, c, seed=7):
    return bytes(
        (x * 7 + y * 13 + ch * 29 + seed) % 256
        for y in range(h)
        for x in range(w)
        for ch in range(c)
    )


def _smooth(w, h, c):
    return bytes(
        (x * 3 + y * 2 + ch * 5) % 256
        for y in range(h)
        for x in range(w)
        for ch in range(c)
    )


def _palette_img(w, h):
    pal = [(10, 20, 30), (200, 100, 50), (0, 255, 128), (255, 255, 0), (5, 5, 5)]
    return bytes(
        b for y in range(h) for x in range(w) for b in pal[(x + 2 * y) % 5]
    )


def _to_rgba(px, c, n):
    out = bytearray()
    for p in range(n):
        if c == 1:
            v = px[p]
            out += bytes([v, v, v, 255])
        elif c == 2:
            out += bytes([px[2 * p]] * 3) + px[2 * p + 1 : 2 * p + 2]
        elif c == 3:
            out += px[3 * p : 3 * p + 3] + b"\xff"
        else:
            out += px[4 * p : 4 * p + 4]
    return bytes(out)


def _maxdiff_rgb(a, b):
    """Max per-sample diff over RGB (alpha excluded) of two RGBA buffers."""
    assert len(a) == len(b)
    return max(
        (abs(a[i] - b[i]) for i in range(len(a)) if i % 4 != 3), default=0
    )


def _psnr(a, b):
    se = sum((x - y) ** 2 for x, y in zip(a, b))
    return 99.0 if se == 0 else 10 * math.log10(255 * 255 / (se / len(a)))


# --------------------------------------------------------------------------
# lossless formats: byte-exact both directions
# --------------------------------------------------------------------------


@pytest.mark.parametrize("c", [1, 3, 4])
def test_png_crossval_both_ways(iio, c):
    from parquet_converters_spark.functions.media_codecs import (
        decode_png,
        encode_png,
    )

    w, h = 13, 7
    px = _pattern(w, h, c)
    # ours -> ImageIO
    W, H, j = iio.decode(encode_png(w, h, c, px), ".png")
    assert (W, H) == (w, h) and j == _to_rgba(px, c, w * h)
    # ImageIO -> ours
    got = decode_png(iio.encode("png", w, h, c, px))
    assert got[:2] == (w, h)
    assert _to_rgba(got[3], got[2], w * h) == _to_rgba(px, c, w * h)


def test_bmp_crossval_both_ways(iio):
    from parquet_converters_spark.functions.media_codecs import (
        decode_bmp,
        encode_bmp,
    )

    w, h = 13, 7  # odd width exercises row padding
    px = _pattern(w, h, 3)
    W, H, j = iio.decode(encode_bmp(w, h, 3, px), ".bmp")
    assert (W, H) == (w, h) and j == _to_rgba(px, 3, w * h)
    data = iio.encode("bmp", w, h, 3, px)
    assert data[28] == 24 and data[30] == 0  # 24bpp BI_RGB from the JDK
    assert decode_bmp(data) == (w, h, 3, px)


def test_gif_crossval_both_ways_and_interlaced(iio):
    from parquet_converters_spark.functions.gif_codec import (
        decode_gif,
        encode_gif,
    )

    w, h = 13, 7
    px = _palette_img(w, h)
    W, H, j = iio.decode(encode_gif(w, h, 3, [px]), ".gif")
    assert (W, H) == (w, h) and j == _to_rgba(px, 3, w * h)
    plain = iio.encode("gif", w, h, 3, px)
    # The JDK GIF writer emits interlaced image data by default (image
    # descriptor flag bit 0x40) — so this leg externally validates our
    # interlace de-scrambling, not just plain row order.
    desc = plain.find(b"\x2c")
    assert desc >= 0 and plain[desc + 9] & 0x40
    got = decode_gif(plain)
    assert got[:2] == (w, h)
    assert _to_rgba(got[3], got[2], w * h) == _to_rgba(px, 3, w * h)


# --------------------------------------------------------------------------
# JPEG: two independent decoders on the same stream agree within +-2
# --------------------------------------------------------------------------

_JPEG_TOL = 2  # IDCT + color-convert rounding slack between decoders


def _assert_decoders_agree(iio, data: bytes, tol=_JPEG_TOL, min_psnr=None):
    from parquet_converters_spark.functions.jpeg_codec import decode_jpeg

    W, H, C, ours = decode_jpeg(data)
    jw, jh, j = iio.decode(data, ".jpg")
    assert (jw, jh) == (W, H)
    ours_rgba = _to_rgba(ours, C, W * H)
    if tol is not None:
        assert _maxdiff_rgb(ours_rgba, j) <= tol
    if min_psnr is not None:
        assert _psnr(ours_rgba, j) >= min_psnr
    return W, H, C, ours


@pytest.mark.parametrize("progressive", [False, True])
def test_jpeg_gray_crossval(iio, progressive):
    """ImageIO-encoded grayscale stream: both decoders within +-1..2,
    and our decode lands near the original (real fidelity, not just
    decoder agreement)."""
    w, h = 40, 24
    g = _pattern(w, h, 1)
    opts = "q=90;progressive" if progressive else "q=90"
    data = iio.encode("jpg", w, h, 1, g, opts)
    if progressive:
        assert b"\xff\xc2" in data  # SOF2 actually emitted
    W, H, C, ours = _assert_decoders_agree(iio, data)
    assert (W, H, C) == (w, h, 1)
    assert _psnr(ours, g) > 30.0


@pytest.mark.parametrize("progressive", [False, True])
def test_jpeg_color_crossval_imageio_encodes(iio, progressive):
    """ImageIO-encoded color stream (the JDK picks its own subsampling):
    our decoder agrees with the JDK's within +-2."""
    w, h = 40, 24
    rgb = _smooth(w, h, 3)
    opts = "q=90;progressive" if progressive else "q=90"
    data = iio.encode("jpg", w, h, 3, rgb, opts)
    if progressive:
        assert b"\xff\xc2" in data
    W, H, C, ours = _assert_decoders_agree(iio, data)
    assert (W, H, C) == (w, h, 3)
    assert _psnr(_to_rgba(ours, 3, w * h), _to_rgba(rgb, 3, w * h)) > 30.0


@pytest.mark.parametrize("subsampling", ["4:4:4", "4:2:0"])
def test_jpeg_color_crossval_we_encode(iio, subsampling):
    """OUR encoder's streams decode identically (+-2) under the JDK
    decoder — this is the leg that kills symmetric encode/decode bugs:
    the external decoder reads our bytes with no shared code."""
    from parquet_converters_spark.functions.jpeg_codec import encode_jpeg

    w, h = 40, 24
    rgb = _smooth(w, h, 3)
    data = encode_jpeg(w, h, 3, rgb, quality=90, subsampling=subsampling)
    _assert_decoders_agree(iio, data)


def test_jpeg_gray_crossval_we_encode(iio):
    from parquet_converters_spark.functions.jpeg_codec import encode_jpeg

    w, h = 40, 24
    g = _pattern(w, h, 1)
    _assert_decoders_agree(iio, encode_jpeg(w, h, 1, g, quality=90))


def test_jpeg_restart_stream_crossval(iio):
    """Our DRI/RSTn streams are readable by the external decoder too."""
    from parquet_converters_spark.functions.jpeg_codec import encode_jpeg

    w, h = 40, 24
    rgb = _smooth(w, h, 3)
    data = encode_jpeg(
        w, h, 3, rgb, quality=85, subsampling="4:2:0", restart_interval=2
    )
    assert b"\xff\xdd" in data
    _assert_decoders_agree(iio, data)


def test_wav_crossval_both_ways(iio):
    """PCM16 WAV against javax.sound.sampled (also a JDK built-in):
    the JDK reads our RIFF/WAVE files sample-exactly, and we read the
    JDK's."""
    import struct

    from parquet_converters_spark.functions.media_codecs import (
        decode_wav,
        encode_wav,
    )

    samples = [((i * 991) % 65536) - 32768 for i in range(600)]
    for channels in (1, 2):
        rate = 8000 if channels == 1 else 44100
        # ours -> JDK
        src = iio.work / "w.wav"
        src.write_bytes(encode_wav(rate, samples, channels=channels))
        dst = iio.work / "w.raw"
        iio._run("wavdecode", str(src), str(dst))
        raw = dst.read_bytes()
        nl = raw.index(b"\n")
        got_rate, got_ch, bits, endian = raw[:nl].split()
        assert (int(got_rate), int(got_ch), int(bits)) == (rate, channels, 16)
        assert endian == b"le"
        pcm = raw[nl + 1 :]
        assert list(struct.unpack(f"<{len(samples)}h", pcm)) == samples
        # JDK -> ours
        pcm_in = iio.work / "w.pcm"
        pcm_in.write_bytes(struct.pack(f"<{len(samples)}h", *samples))
        out = iio.work / "w2.wav"
        iio._run("wavencode", str(rate), str(channels), str(pcm_in), str(out))
        assert decode_wav(out.read_bytes()) == (rate, channels, samples)


def test_jpeg_progressive_stream_crossval(iio):
    """Our progressive (SOF2, real SA ladder) streams decode under the
    JDK decoder to the same pixels as under ours."""
    from parquet_converters_spark.functions.jpeg_codec import encode_jpeg

    w, h = 40, 24
    rgb = _smooth(w, h, 3)
    data = encode_jpeg(
        w, h, 3, rgb, quality=90, subsampling="4:4:4", progressive=True
    )
    assert b"\xff\xc2" in data
    _assert_decoders_agree(iio, data)
