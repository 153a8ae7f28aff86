"""TIFF through the JDK ImageIO seam (r11 verdict item 5).

There is no from-spec TIFF decoder in this engine — the JDK has shipped
a javax.imageio TIFF plugin since Java 9 (probed present in this
container), so a single routing entry in jdk_imageio_media_decoder buys
the whole format at zero new dependency.  The oracle payloads below are
written by a minimal from-spec baseline TIFF 6.0 writer (single strip,
uncompressed, both byte orders) so pixel equality is exact by
construction; the from-spec decode table rejects TIFF by name, pointing
at the seam.
"""

import shutil
import struct
import sys
import os

import pytest

sys.path.insert(0, os.path.dirname(__file__))

needs_jdk = pytest.mark.skipif(
    not (shutil.which("javac") and shutil.which("java")),
    reason="JDK (java+javac) not on PATH",
)


def encode_tiff(w, h, channels, px, big_endian=False):
    """Minimal baseline TIFF 6.0: one uncompressed strip, one IFD."""
    assert channels in (1, 3)
    bo = ">" if big_endian else "<"
    strip = bytes(px)
    out = bytearray(b"MM\x00*" if big_endian else b"II*\x00")
    ifd_off = 8 + len(strip) + (len(strip) & 1)
    out += struct.pack(bo + "I", ifd_off)
    out += strip
    if len(strip) & 1:
        out += b"\x00"
    entries = [
        (256, 3, 1, w),  # ImageWidth
        (257, 3, 1, h),  # ImageLength
        (259, 3, 1, 1),  # Compression: none
        # Photometric: 1 = BlackIsZero (gray), 2 = RGB
        (262, 3, 1, 2 if channels == 3 else 1),
        (273, 4, 1, 8),  # StripOffsets: data starts right after header
        (277, 3, 1, channels),  # SamplesPerPixel
        (278, 3, 1, h),  # RowsPerStrip
        (279, 4, 1, len(strip)),  # StripByteCounts
    ]
    if channels == 3:
        # BitsPerSample needs 3 SHORTs -> stored past the IFD
        # (10 entries once 258 is inserted)
        bps_off = ifd_off + 2 + (len(entries) + 1) * 12 + 4
        entries.insert(2, (258, 3, 3, bps_off))
    else:
        entries.insert(2, (258, 3, 1, 8))  # fits inline
    out += struct.pack(bo + "H", len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack(bo + "HHI", tag, typ, cnt)
        if typ == 4 or cnt > 2:
            # LONG value, or a >4-byte array: the field holds a LONG
            # (an offset, for the array case) — never left-justified
            out += struct.pack(bo + "I", val)
        else:
            # inline SHORT value is left-justified in the 4-byte field
            out += struct.pack(bo + "HH", val, 0)
    out += struct.pack(bo + "I", 0)  # next-IFD terminator
    if channels == 3:
        out += struct.pack(bo + "HHH", 8, 8, 8)
    return bytes(out)


def _pattern(w, h, c, seed=0):
    return bytes(
        (x * 31 + y * 17 + k * 11 + seed) % 256
        for y in range(h)
        for x in range(w)
        for k in range(c)
    )


@needs_jdk
@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("channels", [1, 3])
def test_bridge_decodes_minimal_tiff_exact(big_endian, channels):
    from parquet_converters_spark.functions.native_codecs import (
        _bridge_decode,
        _compile_imageio_bridge,
    )

    w, h = 7, 5
    px = _pattern(w, h, channels, seed=big_endian * 3)
    tif = encode_tiff(w, h, channels, px, big_endian=big_endian)
    W, H, C, got = _bridge_decode(_compile_imageio_bridge(), tif)
    assert (W, H, C) == (w, h, channels)
    assert got == px


def test_fromspec_table_decodes_tiff():
    """TIFF decodes on the default from-spec path (functions/
    tiff_codec.py, added later in r12 — this test originally asserted
    rejection-by-name when only the bridge could read TIFF)."""
    from parquet_converters_spark.functions.multimodal import (
        _band_features,
        _real_decode,
    )

    px = _pattern(3, 2, 3)
    assert _real_decode(encode_tiff(3, 2, 3, px), 4) == (
        3, 2, 3, _band_features(px, 4),
    )
    g = _pattern(3, 2, 1)
    assert _real_decode(encode_tiff(3, 2, 1, g, True), 4) == (
        3, 2, 1, _band_features(g, 4),
    )


@needs_jdk
def test_decode_media_tiff_through_seam(spark):
    """Spark-level: a mixed TIFF+PNG corpus through decode_media with
    the JDK adapter — TIFF routes to the bridge, PNG stays from-spec,
    and the TIFF features equal the from-spec band features of the
    known pixels (bridge TIFF decode is byte-exact, so features are
    exact too, unlike the IDCT-tolerance JPEG leg)."""
    from parquet_converters_spark.functions.media_codecs import encode_png
    from parquet_converters_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        _band_features,
        decode_media,
    )
    from parquet_converters_spark.functions.native_codecs import (
        jdk_imageio_media_decoder,
    )

    specs = [
        (300, encode_tiff(9, 6, 3, _pattern(9, 6, 3, 1)), "image/tiff"),
        (301, encode_tiff(8, 8, 1, _pattern(8, 8, 1, 2), True),
         "image/tiff"),
        (302, encode_png(5, 4, 3, _pattern(5, 4, 3, 3)), "image/png"),
    ]
    df = spark.createDataFrame(
        [(mid, "image", bytearray(p), mt, len(p)) for mid, p, mt in specs],
        MEDIA_SCHEMA,
    )
    import numpy as np

    def f32(vals):  # the features column is float32 in MEDIA outputs
        return [float(np.float32(v)) for v in vals]

    got = decode_media(df, n_features=4,
                       decoder=jdk_imageio_media_decoder())
    by_id = {r["media_id"]: r for r in got.collect()}
    assert len(by_id) == 3
    assert (by_id[300]["width"], by_id[300]["height"],
            by_id[300]["channels"]) == (9, 6, 3)
    assert by_id[300]["features"] == f32(_band_features(
        _pattern(9, 6, 3, 1), 4))
    assert (by_id[301]["width"], by_id[301]["height"],
            by_id[301]["channels"]) == (8, 8, 1)
    assert by_id[301]["features"] == f32(_band_features(
        _pattern(8, 8, 1, 2), 4))
    assert (by_id[302]["width"], by_id[302]["height"],
            by_id[302]["channels"]) == (5, 4, 3)


def encode_tiled_tiff_gray(size, px):
    """Tiled baseline TIFF 6.0: one 16x16 gray tile (tags 322-325) —
    a layout the from-spec strip decoder rejects by name."""
    assert size == 16 and len(px) == 256
    out = bytearray(b"II*\x00")
    strip = bytes(px)
    out += struct.pack("<I", 8 + len(strip))
    out += strip
    entries = [
        (256, 3, 1, size), (257, 3, 1, size), (258, 3, 1, 8),
        (259, 3, 1, 1), (262, 3, 1, 1), (277, 3, 1, 1),
        (322, 3, 1, 16), (323, 3, 1, 16),   # TileWidth/TileLength
        (324, 4, 1, 8), (325, 4, 1, len(strip)),  # offsets/bytecounts
    ]
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack("<HHI", tag, typ, cnt)
        if typ == 4:
            out += struct.pack("<I", val)
        else:
            out += struct.pack("<HH", val, 0)
    out += struct.pack("<I", 0)
    return bytes(out)


@needs_jdk
def test_tiled_tiff_retries_on_bridge():
    """r12 ADVICE: compression-1 tiled TIFF sniffs onto the from-spec
    path, which rejects tiles by name — the seam must catch that and
    retry on the JDK bridge (which decodes tiles fine) instead of
    bouncing the user to the seam they are already on."""
    from parquet_converters_spark.functions.multimodal import (
        _band_features,
        _real_decode,
    )
    from parquet_converters_spark.functions.native_codecs import (
        jdk_imageio_media_decoder,
    )

    px = _pattern(16, 16, 1, seed=9)
    tif = encode_tiled_tiff_gray(16, px)
    with pytest.raises(NotImplementedError, match="tiled"):
        _real_decode(tif, 4)
    decode = jdk_imageio_media_decoder()
    assert decode(tif, 4) == (16, 16, 1, _band_features(px, 4))


@needs_jdk
def test_bridge_survives_corrupt_tiff():
    """Truncations and byte-mangles of a TIFF payload surface as
    ValueError (the bridge's in-band error frame) or decode to
    *something*, and the bridge keeps serving afterwards."""
    import random

    from parquet_converters_spark.functions.native_codecs import (
        _bridge_decode,
        _compile_imageio_bridge,
    )

    classes = _compile_imageio_bridge()
    tif = encode_tiff(9, 6, 3, _pattern(9, 6, 3, 7))
    rng = random.Random(42)
    cases = [tif[:n] for n in (4, 8, 12, len(tif) // 2)]
    for _ in range(40):
        m = bytearray(tif)
        for _ in range(rng.randrange(1, 4)):
            m[rng.randrange(len(m))] = rng.randrange(256)
        cases.append(bytes(m))
    for case in cases:
        try:
            _bridge_decode(classes, case)
        except ValueError:
            pass
    w, h, c, px = _bridge_decode(classes, tif)
    assert (w, h, c) == (9, 6, 3) and px == _pattern(9, 6, 3, 7)
