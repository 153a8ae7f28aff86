"""From-spec baseline TIFF decoder (functions/tiff_codec.py).

Validation layers:

1. Embedded known-answer vectors authored by the JDK's own
   javax.imageio TIFF *writer* (tests/tiff_fixtures.py: gray/gray16/
   rgb/rgba x None/LZW/ZLib/PackBits/Deflate) — byte-exact with zero
   optional deps, incl. the TIFF-LZW early-code-width-change quirk.
2. Crafted edge files the JDK writer does not emit (tests/
   tiff_craft.py: big-endian, WhiteIsZero, bilevel, palette, multi-
   strip, Deflate+predictor-2) — round-tripped against the crafting
   writer and, where the JDK reader supports the combination,
   crossread through the bridge.
3. Generator determinism; corrupt-stream sweep; named rejections
   pointing at the JDK seam; the decode_media from-spec leg and the
   compression-aware seam routing.
"""

import os
import random
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))
from tiff_craft import encode_tiff_ex  # noqa: E402
from tiff_fixtures import VECTORS  # noqa: E402

from parquet_converters_spark.functions.tiff_codec import (  # noqa: E402
    decode_tiff,
    is_tiff,
)

needs_jdk = pytest.mark.skipif(
    not (shutil.which("javac") and shutil.which("java")),
    reason="JDK (java+javac) not on PATH",
)


def _pattern(w, h, c, seed=0):
    return bytes(
        (x * 31 + y * 17 + k * 11 + seed) % 256
        for y in range(h)
        for x in range(w)
        for k in range(c)
    )


# --------------------------------------------------------------------------
# 1. JDK-writer vectors (zero deps)
# --------------------------------------------------------------------------


@pytest.mark.parametrize("name", sorted(VECTORS))
def test_jdk_authored_vector_exact(name):
    v = VECTORS[name]
    w, h, c, px = decode_tiff(v["payload"])
    assert (w, h) == v["size"] and c == v["channels"]
    assert px == v["pixels"]


@needs_jdk
def test_fixture_generator_deterministic(tmp_path):
    import subprocess

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    work = tmp_path / "repo"
    (work / "tests").mkdir(parents=True)
    (work / "scripts").mkdir()
    shutil.copy(
        os.path.join(here, "scripts/make_tiff_fixtures.py"),
        work / "scripts/make_tiff_fixtures.py",
    )
    subprocess.run(
        [sys.executable, "scripts/make_tiff_fixtures.py"],
        cwd=work, check=True,
        env={**os.environ, "PYTHONPATH": here}, capture_output=True,
    )
    assert (work / "tests/tiff_fixtures.py").read_bytes() == open(
        os.path.join(here, "tests/tiff_fixtures.py"), "rb"
    ).read()


# --------------------------------------------------------------------------
# 2. crafted edge files
# --------------------------------------------------------------------------


@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("compression", [1, 8, 32773])
def test_crafted_rgb_roundtrip(big_endian, compression):
    w, h = 19, 11
    px = _pattern(w, h, 3, 1)
    tif = encode_tiff_ex(w, h, px, big_endian=big_endian,
                         compression=compression)
    assert decode_tiff(tif) == (w, h, 3, px)


def test_crafted_multistrip_and_predictor():
    w, h = 23, 17
    px = _pattern(w, h, 3, 2)
    tif = encode_tiff_ex(w, h, px, compression=8, rows_per_strip=5)
    assert decode_tiff(tif) == (w, h, 3, px)
    tif2 = encode_tiff_ex(w, h, px, compression=8, predictor=2,
                          rows_per_strip=4)
    assert decode_tiff(tif2) == (w, h, 3, px)
    tif3 = encode_tiff_ex(w, h, px, compression=32773, rows_per_strip=3)
    assert decode_tiff(tif3) == (w, h, 3, px)


def test_crafted_gray_polarities_and_bilevel():
    w, h = 18, 9
    g = _pattern(w, h, 1, 3)
    assert decode_tiff(
        encode_tiff_ex(w, h, g, channels=1, photometric=1)
    ) == (w, h, 1, g)
    # WhiteIsZero: stored inverted, decoder re-inverts to BlackIsZero
    assert decode_tiff(
        encode_tiff_ex(w, h, g, channels=1, photometric=0)
    ) == (w, h, 1, g)
    bits = bytes((x + y) % 2 for y in range(h) for x in range(w))
    expect = bytes(255 if b else 0 for b in bits)
    for photo in (0, 1):
        tif = encode_tiff_ex(w, h, bits, bilevel=True, photometric=photo)
        assert decode_tiff(tif) == (w, h, 1, expect)


def test_crafted_palette():
    w, h = 16, 8
    palette = [(250, 10, 30), (0, 128, 255), (77, 200, 5), (9, 9, 9)]
    idx = bytes((x * 3 + y) % 4 for y in range(h) for x in range(w))
    expect = bytes(v for i in idx for v in palette[i])
    tif = encode_tiff_ex(w, h, idx, palette=palette)
    assert decode_tiff(tif) == (w, h, 3, expect)


@needs_jdk
@pytest.mark.parametrize("kwargs", [
    {"compression": 8, "predictor": 2, "rows_per_strip": 4},
    {"compression": 32773, "rows_per_strip": 3},
    {"big_endian": True, "compression": 8},
])
def test_crafted_files_crossread_by_jdk(kwargs):
    """The crafting writer is itself externally checked: the JDK
    reader must agree with our decoder on its files."""
    from parquet_converters_spark.functions.native_codecs import (
        _bridge_decode,
        _compile_imageio_bridge,
    )

    w, h = 23, 17
    px = _pattern(w, h, 3, 4)
    tif = encode_tiff_ex(w, h, px, **kwargs)
    assert decode_tiff(tif) == (w, h, 3, px)
    assert _bridge_decode(_compile_imageio_bridge(), tif) == (w, h, 3, px)


# --------------------------------------------------------------------------
# 3. contract: rejections, corrupt sweep, routing
# --------------------------------------------------------------------------


def test_named_rejections_point_at_seam():
    w, h = 8, 8
    px = _pattern(w, h, 3, 5)
    base = encode_tiff_ex(w, h, px)
    tiled = encode_tiff_ex(w, h, px, extra_tags=[(322, 3, 1, 16),
                                                 (323, 3, 1, 16)])
    with pytest.raises(NotImplementedError, match="tiled.*seam"):
        decode_tiff(tiled)
    for tag, typ, val, pat in ((259, 3, 2, "CCITT"), (284, 3, 2, "planar"),
                               (266, 3, 2, "FillOrder"),
                               (259, 3, 7, "JPEG-in-TIFF")):
        bad = encode_tiff_ex(w, h, px)
        # rebuild with the overriding tag via extra_tags on a fresh file
        bad = encode_tiff_ex(w, h, px, extra_tags=[(tag, typ, 1, val)])
        with pytest.raises((NotImplementedError, ValueError)):
            decode_tiff(bad)
    assert is_tiff(base) and not is_tiff(base[1:])


def test_corrupt_streams_raise_clean_errors():
    data = encode_tiff_ex(23, 17, _pattern(23, 17, 3, 6), compression=8,
                          rows_per_strip=4)
    rng = random.Random(77)
    cases = [data[:n] for n in (2, 4, 8, 20, len(data) // 2)]
    for _ in range(250):
        m = bytearray(data)
        for _ in range(rng.randrange(1, 4)):
            m[rng.randrange(len(m))] = rng.randrange(256)
        cases.append(bytes(m))
    for case in cases:
        try:
            decode_tiff(case)
        except (ValueError, NotImplementedError):
            pass


def test_decode_media_tiff_fromspec(spark):
    """TIFF now decodes on the DEFAULT (from-spec) path — the r12
    bridge-only routing is history."""
    import numpy as np

    from parquet_converters_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        _band_features,
        decode_media,
    )

    w, h = 19, 11
    px = _pattern(w, h, 3, 8)
    tif = encode_tiff_ex(w, h, px, compression=8, predictor=2)
    df = spark.createDataFrame(
        [(600, "image", bytearray(tif), "image/tiff", len(tif))],
        MEDIA_SCHEMA,
    )
    r = decode_media(df, n_features=4).collect()[0]
    assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
    assert r["features"] == [
        float(np.float32(f)) for f in _band_features(px, 4)
    ]


@needs_jdk
def test_seam_routing_is_compression_aware():
    """The JDK adapter's measured routing: uncompressed TIFF decodes
    from spec (50x faster than the pipe round-trip), entropy-coded
    TIFF rides the bridge."""
    from parquet_converters_spark.functions import native_codecs as nc

    dec = nc.jdk_imageio_media_decoder()
    calls = []
    orig = nc._bridge_decode

    def spy(classes, payload):
        calls.append(1)
        return orig(classes, payload)

    w, h = 19, 11
    px = _pattern(w, h, 3, 9)
    try:
        nc._bridge_decode = spy
        dec(encode_tiff_ex(w, h, px), 4)  # uncompressed: from-spec
        assert not calls
        dec(encode_tiff_ex(w, h, px, compression=8), 4)  # deflate
        assert len(calls) == 1
        dec(VECTORS["rgb_lzw"]["payload"], 4)  # LZW
        assert len(calls) == 2
    finally:
        nc._bridge_decode = orig

@needs_jdk
def test_encode_tiff_sink_crossread_by_jdk():
    """The production encoder (IFD-first layout, distinct from the
    test writer's data-first layout) round-trips through our decoder
    and the JDK reader for every channel count and compression."""
    from parquet_converters_spark.functions.native_codecs import (
        _bridge_decode,
        _compile_imageio_bridge,
    )
    from parquet_converters_spark.functions.tiff_codec import encode_tiff

    classes = _compile_imageio_bridge()
    for c in (1, 3, 4):
        px = _pattern(11, 7, c, c)
        for comp in ("none", "deflate"):
            t = encode_tiff(11, 7, c, px, comp)
            assert decode_tiff(t) == (11, 7, c, px)
            assert _bridge_decode(classes, t) == (11, 7, c, px)


def test_resize_media_tiff(spark):
    """TIFF in -> TIFF out through resize_media, deterministic and
    re-decodable."""
    from parquet_converters_spark.functions.media_codecs import (
        resize_nearest,
    )
    from parquet_converters_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        resize_media,
    )
    from parquet_converters_spark.functions.tiff_codec import encode_tiff

    w, h = 16, 9
    px = _pattern(w, h, 3, 12)
    tif = encode_tiff_ex(w, h, px, compression=8)
    df = spark.createDataFrame(
        [(700, "image", bytearray(tif), "image/tiff", len(tif))],
        MEDIA_SCHEMA,
    )
    out = bytes(resize_media(df, width=8, height=6).collect()[0]["payload"])
    expected = encode_tiff(8, 6, 3, resize_nearest(w, h, 3, px, 8, 6))
    assert out == expected
    assert decode_tiff(out)[:3] == (8, 6, 3)
