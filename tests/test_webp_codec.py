"""WebP (VP8L) codec tests: deterministic round-trips, the untrusted-
corpus hardening contract, the Spark decode/resize real paths, and —
where libwebp is present (it ships in this container as libwebp.so.7)
— live bidirectional cross-validation against the format's reference
implementation: libwebp must read every stream our encoder writes, and
our decoder must produce BIT-IDENTICAL pixels to libwebp's decoder on
libwebp-encoded streams across transforms, color cache, meta prefix
codes, and the 2D distance map (whose table was recovered empirically
from libwebp behavior — scripts/recover_webp_dtable.py)."""

import ctypes
import ctypes.util
import random

import pytest

from parquet_converters_spark.functions.webp_codec import (
    _DIST_MAP,
    decode_webp,
    encode_webp_lossless,
    is_webp,
)

# --------------------------------------------------------------------------
# libwebp oracle (ctypes; auto-skip when the library is absent)
# --------------------------------------------------------------------------

try:
    _LIB = ctypes.CDLL("libwebp.so.7")
except OSError:  # pragma: no cover
    try:
        _name = ctypes.util.find_library("webp")
        _LIB = ctypes.CDLL(_name) if _name else None
    except OSError:
        _LIB = None

if _LIB is not None:
    _LIB.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    _LIB.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    for _fn, _c in (("WebPEncodeLosslessRGBA", 4), ("WebPEncodeLosslessRGB", 3)):
        f = getattr(_LIB, _fn)
        f.restype = ctypes.c_size_t
        f.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
    _LIB.WebPEncodeRGB.restype = ctypes.c_size_t
    _LIB.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    _LIB.WebPFree.argtypes = [ctypes.c_void_p]

needs_libwebp = pytest.mark.skipif(_LIB is None, reason="libwebp not found")


def lw_decode_rgba(data: bytes):
    w, h = ctypes.c_int(), ctypes.c_int()
    p = _LIB.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not p:
        raise ValueError("libwebp decode failed")
    try:
        return w.value, h.value, ctypes.string_at(p, w.value * h.value * 4)
    finally:
        _LIB.WebPFree(p)


def lw_encode_lossless(w, h, c, pixels: bytes) -> bytes:
    out = ctypes.POINTER(ctypes.c_uint8)()
    fn = _LIB.WebPEncodeLosslessRGBA if c == 4 else _LIB.WebPEncodeLosslessRGB
    size = fn(pixels, w, h, w * c, ctypes.byref(out))
    if not size:
        raise ValueError("libwebp encode failed")
    try:
        return ctypes.string_at(out, size)
    finally:
        _LIB.WebPFree(out)


def lw_encode_lossy_rgb(w, h, pixels: bytes, quality=75.0) -> bytes:
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = _LIB.WebPEncodeRGB(
        pixels, w, h, w * 3, ctypes.c_float(quality), ctypes.byref(out)
    )
    if not size:
        raise ValueError("libwebp lossy encode failed")
    try:
        return ctypes.string_at(out, size)
    finally:
        _LIB.WebPFree(out)


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------


def _pattern(w, h, c, seed=7):
    return bytes(
        (x * 7 + y * 13 + ch * 29 + seed) % 256
        for y in range(h)
        for x in range(w)
        for ch in range(c)
    )


def _to_rgba(px, c, n):
    if c == 4:
        return bytes(px)
    return b"".join(px[3 * p : 3 * p + 3] + b"\xff" for p in range(n))


def _tiled(w, h, dx, dy, seed):
    rng = random.Random(seed)
    px = [[None] * w for _ in range(h)]
    for y in range(h):
        for x in range(w):
            sx, sy = x - dx, y - dy
            if (dy > 0 and 0 <= sx < w and sy >= 0) or (
                dy == 0 and dx > 0 and sx >= 0
            ):
                px[y][x] = px[sy][sx]
            else:
                px[y][x] = (
                    rng.randrange(256), rng.randrange(256), rng.randrange(256)
                )
    return bytes(v for row in px for p in row for v in p)


# --------------------------------------------------------------------------
# self-contained (no libwebp needed)
# --------------------------------------------------------------------------


def test_roundtrip_rgb_rgba_deterministic():
    w, h = 13, 7
    for c in (3, 4):
        px = _pattern(w, h, c)
        data = encode_webp_lossless(w, h, c, px)
        assert is_webp(data)
        W, H, C, got = decode_webp(data)
        assert (W, H) == (w, h)
        assert _to_rgba(got, C, w * h) == _to_rgba(px, c, w * h)
        assert encode_webp_lossless(w, h, c, px) == data


def test_all_opaque_rgba_collapses_to_rgb():
    w, h = 5, 4
    px = bytearray(_pattern(w, h, 4))
    px[3::4] = b"\xff" * (w * h)
    W, H, C, got = decode_webp(encode_webp_lossless(w, h, 4, bytes(px)))
    assert (W, H, C) == (w, h, 3)
    for ch in range(3):
        assert got[ch::3] == bytes(px[ch::4])


def test_bad_inputs_raise_value_error():
    with pytest.raises(ValueError, match="signature"):
        decode_webp(b"NOPE" + bytes(20))
    with pytest.raises(ValueError, match="VP8L"):
        decode_webp(b"RIFF\x04\x00\x00\x00WEBP")
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\xff\xff\x00\x00WEBPVP8L\x05\x00\x00\x00\x2f" + bytes(4))


def test_empty_animation_rejected():
    # a VP8X container advertising animation but carrying no ANMF
    # frames is malformed, not unsupported (animation IS implemented)
    vp8x = b"VP8X" + (10).to_bytes(4, "little") + bytes([0x02]) + bytes(9)
    anim = b"ANIM" + (6).to_bytes(4, "little") + bytes(6)
    body = vp8x + anim
    data = b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WEBP" + body
    with pytest.raises(ValueError, match="no ANMF"):
        decode_webp(data)


def test_dist_map_shape():
    """Table invariants: 120 entries, unique, within the spec's
    near-neighborhood, and every dy=0 entry has dx>0 (a left-only
    horizontal reference)."""
    assert len(_DIST_MAP) == 120
    assert len(set(_DIST_MAP)) == 120
    for dx, dy in _DIST_MAP:
        assert 0 <= dy <= 8 and -8 <= dx <= 8
        if dy == 0:
            assert dx > 0


def test_encoder_compression_classes():
    """The encoder is a real compressor, not a raw-literal dump: pin
    the size class per content type (generous bounds — a regression to
    literal coding would blow them by an order of magnitude)."""
    w, h = 40, 30
    gradient = bytes(
        ((x * 3 + y * 2) % 256, (x + y) % 256, (x * 2 + y * 5) % 256)[c]
        for y in range(h) for x in range(w) for c in range(3)
    )
    assert len(encode_webp_lossless(w, h, 3, gradient)) < 200  # predictor
    colors = [(10, 20, 30), (200, 100, 50), (0, 255, 128), (255, 255, 0)]
    pal = bytes(
        v for y in range(h) for x in range(w) for v in colors[(x + 2 * y) % 4]
    )
    assert len(encode_webp_lossless(w, h, 3, pal)) < 300  # palette/LZ77
    flat = bytes([42, 17, 99]) * (w * h)
    assert len(encode_webp_lossless(w, h, 3, flat)) < 100
    # and the stage switches still emit decodable targeted vectors
    for kw in (
        {"use_lz77": False},
        {"subtract_green": False},
        {"predictor": False},
        {"palette": False},
        {"use_lz77": False, "subtract_green": False, "predictor": False,
         "palette": False},
    ):
        data = encode_webp_lossless(w, h, 3, gradient, **kw)
        assert decode_webp(data)[:3] == (w, h, 3)


def test_palette_roundtrip_all_bundle_widths():
    """Color-indexing candidate at every bundling width (8/4/2/1
    indices per byte) incl. a non-multiple row tail."""
    w, h = 13, 7
    for ncol in (2, 4, 16, 17):
        pal = [((i * 37) % 256, (i * 91) % 256, (i * 13) % 256)
               for i in range(ncol)]
        raw = bytes(
            v for y in range(h) for x in range(w)
            for v in pal[(x + 3 * y) % ncol]
        )
        data = encode_webp_lossless(w, h, 3, raw)
        assert decode_webp(data) == (w, h, 3, raw)


def test_corrupt_streams_raise_clean_errors_ours():
    rng = random.Random(7)
    data = encode_webp_lossless(16, 12, 3, _pattern(16, 12, 3))
    for trial in range(200):
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
            decode_webp(bytes(b))
        except (ValueError, NotImplementedError):
            pass


# --------------------------------------------------------------------------
# animation (VP8X/ANIM/ANMF with VP8L frames)
# --------------------------------------------------------------------------


def _anmf(fx, fy, fw, fh, dur, flags, vp8l_payload):
    """Hand-assemble one ANMF chunk from a bare encode_webp_lossless
    output (offsets in PIXELS, must be even)."""
    import struct

    (plen,) = struct.unpack("<I", vp8l_payload[16:20])
    sub = b"VP8L" + struct.pack("<I", plen) + vp8l_payload[20 : 20 + plen]
    if plen & 1:
        sub += b"\x00"
    body = (
        (fx // 2).to_bytes(3, "little")
        + (fy // 2).to_bytes(3, "little")
        + (fw - 1).to_bytes(3, "little")
        + (fh - 1).to_bytes(3, "little")
        + int(dur).to_bytes(3, "little")
        + bytes([flags])
        + sub
    )
    out = b"ANMF" + struct.pack("<I", len(body)) + body
    return out + (b"\x00" if len(body) & 1 else b"")


def _anim_container(cw, ch, bg_bgra, anmfs):
    import struct

    vp8x = bytes([0x12]) + bytes(3)
    vp8x += (cw - 1).to_bytes(3, "little") + (ch - 1).to_bytes(3, "little")
    chunks = b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x
    anim = bytes(bg_bgra) + struct.pack("<H", 0)
    chunks += b"ANIM" + struct.pack("<I", len(anim)) + anim
    for a in anmfs:
        chunks += a
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP" + chunks


def test_anim_roundtrip_full_canvas():
    from parquet_converters_spark.functions.webp_codec import (
        encode_webp_anim,
        parse_webp_frames,
    )

    w, h = 20, 14
    frames = [_pattern(w, h, 3, seed=s) for s in range(4)]
    data = encode_webp_anim(w, h, 3, frames, delay_ms=200)
    assert is_webp(data)
    W, H, got = parse_webp_frames(data)
    assert (W, H) == (w, h) and len(got) == 4
    for (dur, rgba), src in zip(got, frames):
        assert dur == 200
        assert rgba[3::4] == b"\xff" * (w * h)
        for ch_ in range(3):
            assert rgba[ch_::4] == src[ch_::3]
    # decode_webp thumbnail convention: first composited canvas
    gw, gh, gc, gp = decode_webp(data)
    assert (gw, gh, gc) == (w, h, 4)
    assert bytes(gp[0::4]) == frames[0][0::3]
    assert encode_webp_anim(w, h, 3, frames, delay_ms=200) == data


def test_anim_subrect_blend_and_dispose_semantics():
    """Hand-built animation exercising the container semantics our
    encoder never writes: sub-rect placement, overwrite-vs-blend of a
    transparent frame, dispose-to-background."""
    from parquet_converters_spark.functions.webp_codec import (
        parse_webp_frames,
    )

    cw, ch = 8, 6
    base = encode_webp_lossless(cw, ch, 3, bytes([10, 20, 30]) * (cw * ch))
    # 2x2 sub-rect at (2,2): fully transparent pixels
    clear = encode_webp_lossless(2, 2, 4, bytes([9, 9, 9, 0]) * 4)
    # frame 1: full canvas opaque; frame 2: transparent sub-rect,
    # BLEND mode (flags bit1 clear) -> canvas unchanged there;
    # frame 3: transparent sub-rect, NO-BLEND (bit1 set) -> alpha hole,
    # and dispose-to-background (bit0) afterwards
    data = _anim_container(
        cw, ch, (1, 2, 3, 255),  # bg BGRA -> ARGB(255,3,2,1)
        [
            _anmf(0, 0, cw, ch, 100, 0x02, base),
            _anmf(2, 2, 2, 2, 100, 0x00, clear),   # blend
            _anmf(2, 2, 2, 2, 100, 0x02 | 0x01, clear),  # overwrite+dispose
            _anmf(0, 0, cw, ch, 100, 0x02, base),
        ],
    )
    W, H, got = parse_webp_frames(data)
    assert (W, H) == (cw, ch) and len(got) == 4
    f1, f2, f3, f4 = (g[1] for g in got)
    assert f1[0:4] == bytes([10, 20, 30, 255])
    # blending a fully transparent frame leaves the canvas intact
    assert f2 == f1
    # overwrite puts the transparent pixels through
    at = (2 * cw + 2) * 4
    assert f3[at : at + 4] == bytes([9, 9, 9, 0])
    assert f3[0:4] == bytes([10, 20, 30, 255])  # outside the rect
    # frame 4 repaints the full canvas after dispose-to-background
    assert f4 == f1


def test_anim_frame_bounds_checked():
    from parquet_converters_spark.functions.webp_codec import (
        parse_webp_frames,
    )

    sub = encode_webp_lossless(4, 4, 3, bytes(48))
    data = _anim_container(6, 6, (0, 0, 0, 0), [_anmf(4, 4, 4, 4, 100, 0x02, sub)])
    with pytest.raises(ValueError, match="bounds"):
        parse_webp_frames(data)


def test_sample_frames_real_path_webp_anim(spark):
    from parquet_converters_spark.functions.media_codecs import decode_png
    from parquet_converters_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        sample_frames,
    )
    from parquet_converters_spark.functions.webp_codec import (
        encode_webp_anim,
    )

    w, h = 20, 14
    frames = [_pattern(w, h, 3, seed=s) for s in range(5)]
    data = encode_webp_anim(w, h, 3, frames, delay_ms=200)
    df = spark.createDataFrame(
        [(600, "video", bytearray(data), "image/webp", len(data))],
        MEDIA_SCHEMA,
    )
    got = sorted(
        sample_frames(df, every_ms=300, max_frames=4).collect(),
        key=lambda r: r["frame_index"],
    )
    assert [r["frame_ts_ms"] for r in got] == [0, 300, 600, 900]
    for r, src_seed in zip(got, [0, 1, 3, 4]):
        W, H, C, rgba = decode_png(bytes(r["payload"]))
        assert (W, H, C) == (w, h, 4)
        src = _pattern(w, h, 3, seed=src_seed)
        for ch_ in range(3):
            assert rgba[ch_::4] == src[ch_::3]


def test_corrupt_anim_streams_raise_clean_errors():
    from parquet_converters_spark.functions.webp_codec import (
        encode_webp_anim,
        parse_webp_frames,
    )

    rng = random.Random(23)
    data = encode_webp_anim(12, 8, 3, [_pattern(12, 8, 3, seed=s) for s in range(3)])
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
            parse_webp_frames(bytes(b))
        except (ValueError, NotImplementedError):
            pass


# --------------------------------------------------------------------------
# libwebp cross-validation
# --------------------------------------------------------------------------


@needs_libwebp
@pytest.mark.parametrize("c", [3, 4])
def test_crossval_libwebp_reads_ours(c):
    w, h = 13, 7
    px = _pattern(w, h, c)
    W, H, rgba = lw_decode_rgba(encode_webp_lossless(w, h, c, px))
    assert (W, H) == (w, h)
    assert rgba == _to_rgba(px, c, w * h)


@needs_libwebp
@pytest.mark.parametrize(
    "kind,w,h,c",
    [
        ("noise", 40, 30, 3),
        ("noise", 40, 30, 4),
        ("gradient", 80, 60, 3),
        ("palette", 37, 29, 3),
        ("big", 160, 120, 3),
    ],
)
def test_crossval_we_read_libwebps(kind, w, h, c):
    """Our decoder is bit-identical to libwebp's own on libwebp-encoded
    streams (transforms, color cache, meta prefix codes included).
    Note libwebp's encoder may alter RGB under alpha=0 (non-exact
    mode), so the contract is decode-vs-decode, not vs the input."""
    rng = random.Random(hash((kind, w, h, c)) & 0xFFFF)
    if kind == "gradient":
        raw = bytes(
            ((x * 3 + y * 2) % 256, (x + y) % 256, (x * 2 + y * 5) % 256)[ch]
            for y in range(h) for x in range(w) for ch in range(3)
        )
    elif kind == "palette":
        pal = [
            (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(12)
        ]
        raw = bytes(
            v for y in range(h) for x in range(w)
            for v in pal[(x * x + 3 * y) % 12]
        )
    elif kind == "big":
        raw = bytes(
            (((x * 3 + y * 2) % 256 + rng.randrange(24)) % 256)
            for y in range(h) for x in range(w) for _ in range(3)
        )
    else:
        raw = bytes(rng.randrange(256) for _ in range(w * h * c))
    data = lw_encode_lossless(w, h, c if kind == "noise" else 3, raw)
    W, H, truth = lw_decode_rgba(data)
    gw, gh, gc, got = decode_webp(data)
    assert (gw, gh) == (W, H)
    assert _to_rgba(got, gc, W * H) == truth


@needs_libwebp
@pytest.mark.parametrize(
    "dx,dy", [(1, 0), (8, 0), (0, 1), (-8, 3), (5, 7), (8, 7), (7, 7), (-4, 6)]
)
def test_crossval_distance_map_offsets(dx, dy):
    """Tiled images force LZ77 references at specific 2D offsets —
    exercising the empirically-recovered distance-map table, including
    its tail codes, at two widths (the same code maps to different
    linear distances per width)."""
    for w in (19, 31):
        raw = _tiled(w, 24, dx, dy, seed=dy * 100 + dx)
        data = lw_encode_lossless(w, 24, 3, raw)
        W, H, truth = lw_decode_rgba(data)
        gw, gh, gc, got = decode_webp(data)
        assert (gw, gh) == (W, H)
        assert _to_rgba(got, gc, W * H) == truth


try:
    from hypothesis import given, settings, strategies as st

    HAVE_HYPOTHESIS = True
except Exception:  # pragma: no cover
    HAVE_HYPOTHESIS = False


if HAVE_HYPOTHESIS:

    @needs_libwebp
    @settings(max_examples=15, deadline=None)
    @given(
        st.integers(1, 24),
        st.integers(1, 24),
        st.sampled_from([3, 4]),
        st.randoms(use_true_random=False),
    )
    def test_crossval_fuzz_libwebp_streams(w, h, c, rnd):
        """Continuous external fuzz: arbitrary images through libwebp's
        encoder must decode bit-identically under both decoders."""
        raw = bytes(rnd.randrange(256) for _ in range(w * h * c))
        data = lw_encode_lossless(w, h, c, raw)
        W, H, truth = lw_decode_rgba(data)
        gw, gh, gc, got = decode_webp(data)
        assert (gw, gh) == (W, H)
        assert _to_rgba(got, gc, W * H) == truth

    @needs_libwebp
    @settings(max_examples=15, deadline=None)
    @given(
        st.integers(1, 24),
        st.integers(1, 24),
        st.sampled_from([3, 4]),
        st.randoms(use_true_random=False),
    )
    def test_crossval_fuzz_libwebp_reads_ours(w, h, c, rnd):
        raw = bytes(rnd.randrange(256) for _ in range(w * h * c))
        data = encode_webp_lossless(w, h, c, raw)
        W, H, rgba = lw_decode_rgba(data)
        assert (W, H) == (w, h)
        assert rgba == _to_rgba(raw, c, w * h)


@needs_libwebp
def test_libwebp_reads_our_anim_container():
    """The one externally checkable piece of our animation writer in
    this environment (no libwebpdemux): libwebp's container parser
    must report our VP8X canvas geometry."""
    from parquet_converters_spark.functions.webp_codec import (
        encode_webp_anim,
    )

    _LIB.WebPGetInfo.restype = ctypes.c_int
    _LIB.WebPGetInfo.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    w, h = 20, 14
    data = encode_webp_anim(
        w, h, 3, [_pattern(w, h, 3, seed=s) for s in range(3)]
    )
    gw, gh = ctypes.c_int(), ctypes.c_int()
    ok = _LIB.WebPGetInfo(data, len(data), ctypes.byref(gw), ctypes.byref(gh))
    assert ok and (gw.value, gh.value) == (w, h)


@needs_libwebp
def test_lossy_vp8_decodes_from_spec():
    """Lossy VP8 stills decode from spec (r11, vp8_codec.py) —
    byte-identical to libwebp's own RGB output (the deep oracle suite
    lives in tests/test_vp8_codec.py)."""
    data = lw_encode_lossy_rgb(16, 12, _pattern(16, 12, 3))
    assert is_webp(data) and b"VP8 " in data[:16]
    w, h, c, rgb = decode_webp(data)
    assert (w, h, c) == (16, 12, 3)
    _W, _H, ref = lw_decode_rgba(data)
    assert bytes(rgb) == bytes(
        b for i in range(0, len(ref), 4) for b in ref[i : i + 3]
    )


@needs_libwebp
def test_corrupt_libwebp_streams_raise_clean_errors():
    """The hardening sweep over a feature-rich EXTERNAL stream
    (transforms + cache + backrefs), not just our simple encoder's."""
    rng = random.Random(11)
    raw = _tiled(31, 24, 3, 2, seed=5)
    data = lw_encode_lossless(31, 24, 3, raw)
    for trial in range(200):
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
            decode_webp(bytes(b))
        except (ValueError, NotImplementedError):
            pass


# --------------------------------------------------------------------------
# Spark real paths
# --------------------------------------------------------------------------


@pytest.fixture()
def webp_media_df(spark):
    from parquet_converters_spark.functions.multimodal import MEDIA_SCHEMA

    w, h = 20, 14
    px = _pattern(w, h, 3)
    data = encode_webp_lossless(w, h, 3, px)
    rows = [(500, "image", bytearray(data), "image/webp", len(data))]
    return spark.createDataFrame(rows, MEDIA_SCHEMA), (w, h, px)


@needs_libwebp
def test_libwebp_handle_memoized():
    """_load_libwebp dlopens + sets prototypes once per process and
    returns the same handle afterwards (hot-path overhead regression:
    the seam used to re-dlopen per decoded payload)."""
    from parquet_converters_spark.functions import native_codecs as nc

    nc._LIBWEBP = None  # force a fresh load
    first = nc._load_libwebp()
    assert nc._load_libwebp() is first
    assert nc._LIBWEBP is first


@needs_libwebp
def test_libwebp_encode_lossy_helper():
    """native_codecs.libwebp_encode_lossy_rgb (bench corpus generator)
    produces a real VP8 stream, decodable both through the libwebp seam
    and (since r11) the from-spec lossy VP8 decoder."""
    from parquet_converters_spark.functions.native_codecs import (
        _libwebp_decode_rgba,
        libwebp_encode_lossy_rgb,
    )

    data = libwebp_encode_lossy_rgb(16, 12, _pattern(16, 12, 3))
    assert is_webp(data) and b"VP8 " in data[:16]
    w, h, rgba = _libwebp_decode_rgba(data)
    assert (w, h, len(rgba)) == (16, 12, 16 * 12 * 4)


@needs_libwebp
def test_libwebp_media_decoder_seam(spark, webp_media_df):
    """The shipped native adapter (functions/native_codecs.py) plugs
    into decode_media(decoder=...): lossless WebP decodes identically
    to the from-spec path, and LOSSY WebP (which also decodes from
    spec since r11) decodes through the fast libwebp seam."""
    from parquet_converters_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        _band_features,
        decode_media,
    )
    from parquet_converters_spark.functions.native_codecs import (
        libwebp_media_decoder,
    )

    df, (w, h, px) = webp_media_df
    dec = libwebp_media_decoder()
    r = decode_media(df, n_features=4, decoder=dec).collect()[0]
    assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
    assert r["features"] == pytest.approx(_band_features(px, 4), abs=1e-6)
    # lossy VP8: the native seam and the from-spec path (vp8_codec,
    # r11) must agree exactly — both are byte-level libwebp-compatible
    lossy = lw_encode_lossy_rgb(16, 12, _pattern(16, 12, 3))
    ldf = spark.createDataFrame(
        [(501, "image", bytearray(lossy), "image/webp", len(lossy))],
        MEDIA_SCHEMA,
    )
    r2 = decode_media(ldf, n_features=4, decoder=dec).collect()[0]
    assert (r2["width"], r2["height"]) == (16, 12)
    assert len(r2["features"]) == 4
    r3 = decode_media(ldf, n_features=4).collect()[0]
    assert (r3["width"], r3["height"]) == (16, 12)
    assert r3["features"] == pytest.approx(r2["features"], abs=1e-6)


def test_decode_media_real_path_webp(spark, webp_media_df):
    from parquet_converters_spark.functions.multimodal import (
        _band_features,
        decode_media,
    )

    df, (w, h, px) = webp_media_df
    r = decode_media(df, n_features=4).collect()[0]
    assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
    assert r["features"] == pytest.approx(_band_features(px, 4), abs=1e-6)


def test_resize_media_real_path_webp(spark, webp_media_df):
    from parquet_converters_spark.functions.media_codecs import resize_nearest
    from parquet_converters_spark.functions.multimodal import resize_media

    df, (w, h, px) = webp_media_df
    got = bytes(resize_media(df, width=8, height=6).collect()[0]["payload"])
    expected = encode_webp_lossless(
        8, 6, 3, resize_nearest(w, h, 3, px, 8, 6)
    )
    assert got == expected  # WebP in -> WebP out, byte-identical
    assert decode_webp(got)[:3] == (8, 6, 3)


@needs_libwebp
def test_encoder_cross_color_on_photographic():
    """The r11 cross-color candidate: channel-correlated photographic
    content must emit a CROSS_COLOR transform, shrink the stream, and
    stay losslessly round-trippable + libwebp-readable."""
    import math

    w, h = 96, 72
    px = bytes(
        int(127 + 120 * math.sin((x * x + y * y) / 37.0 + 0.15 * c)) & 255
        for y in range(h) for x in range(w) for c in range(3)
    )
    from parquet_converters_spark.functions import webp_codec as W

    data = W.encode_webp_lossless(w, h, 3, px)
    assert W.decode_webp(data)[3] == px
    _W, _H, rgba = lw_decode_rgba(data)
    assert bytes(
        b for i in range(0, len(rgba), 4) for b in rgba[i : i + 3]
    ) == px
    # the gate must have fired: disabling cross-color grows the stream
    orig = W._pick_cross_color
    try:
        W._pick_cross_color = lambda p: None
        plain = W.encode_webp_lossless(w, h, 3, px)
    finally:
        W._pick_cross_color = orig
    assert len(data) < len(plain)


def test_encoder_meta_prefix_on_heterogeneous():
    """r12: per-tile meta prefix codes (the entropy image).  Content
    with two distinct symbol distributions must trigger the meta
    candidate (>1% real-size gate), shrink the stream, and stay
    losslessly round-trippable; spatially-uniform content must stay
    BYTE-IDENTICAL to the flat path (the gate holds)."""
    import random

    from parquet_converters_spark.functions import webp_codec as W

    rng = random.Random(9)
    w, h = 128, 64
    px = bytes(
        b
        for y in range(h)
        for x in range(w)
        for b in (
            (rng.randrange(128), rng.randrange(128), rng.randrange(128))
            if x < w // 2
            else (128 + rng.randrange(128), 128 + rng.randrange(128),
                  128 + rng.randrange(128))
        )
    )
    data = W.encode_webp_lossless(w, h, 3, px)
    assert W.decode_webp(data)[3] == px
    orig = W._write_coded_image_meta
    try:
        W._write_coded_image_meta = lambda *a, **k: False
        flat = W.encode_webp_lossless(w, h, 3, px)
    finally:
        W._write_coded_image_meta = orig
    assert len(data) < 0.99 * len(flat)  # the gate fired for real

    # uniform noise: one group suffices, the gate must keep bytes
    # identical to the flat serialization
    uni = bytes(rng.randrange(256) for _ in range(w * h * 3))
    with_meta = W.encode_webp_lossless(w, h, 3, uni)
    try:
        W._write_coded_image_meta = lambda *a, **k: False
        without = W.encode_webp_lossless(w, h, 3, uni)
    finally:
        W._write_coded_image_meta = orig
    assert with_meta == without


def test_encoder_subtract_green_is_measured():
    """r13: subtract-green is a measured choice.  On channel-
    independent noise (each channel its own noise source) SG only ADDS
    the green noise to R and B — the SG-off candidate must win; on
    channel-correlated photographic content SG decorrelates and the
    output must stay byte-identical to the always-SG path."""
    import math
    import random

    from parquet_converters_spark.functions import webp_codec as W

    rng = random.Random(5)
    w, h = 128, 64
    grad_noise = bytes(
        max(0, min(255, x + y + c * 8 + rng.randrange(-24, 25)))
        for y in range(h) for x in range(w) for c in range(3)
    )
    data = W.encode_webp_lossless(w, h, 3, grad_noise)
    assert W.decode_webp(data)[3] == grad_noise
    forced_sg = W.encode_webp_lossless(w, h, 3, grad_noise,
                                       subtract_green=False)
    # the candidate fired: the adaptive encode equals the SG-off size
    # and beats the old always-SG behavior by >4%
    assert len(data) == len(forced_sg)
    # no SUBTRACT_GREEN transform on the wire: parse transform headers
    br = W._Br(data[20:])
    assert br.bits(8) == 0x2F
    br.bits(14 + 14 + 1 + 3)
    saw = []
    while br.bits(1):
        t = br.bits(2)
        saw.append(t)
        if t in (0, 1):
            br.bits(3)
            break
        if t == 3:
            break
    assert 2 not in saw, f"SG emitted on noise content: {saw}"

    pw, ph = 96, 72
    photo = bytes(
        int(127 + 120 * math.sin((x * x + y * y) / 37.0 + 0.15 * c)) & 255
        for y in range(ph) for x in range(pw) for c in range(3)
    )
    adaptive = W.encode_webp_lossless(pw, ph, 3, photo)
    # the probe must SKIP the SG-off pipeline here (correlated
    # channels): bytes identical to r12's SG-always output
    probe = W._sg_entropy_probe
    try:
        W._sg_entropy_probe = lambda o, n, **k: (99.0, 0.0)  # force skip
        sg_always = W.encode_webp_lossless(pw, ph, 3, photo)
    finally:
        W._sg_entropy_probe = probe
    assert adaptive == sg_always


@needs_libwebp
def test_encoder_sg_off_streams_libwebp_readable():
    """The SG-off winner must remain byte-exactly decodable by
    libwebp (it changes the transform list on the wire)."""
    import random

    from parquet_converters_spark.functions import webp_codec as W

    rng = random.Random(8)
    w, h = 64, 48
    px = bytes(
        max(0, min(255, 2 * x + y + rng.randrange(-20, 21)))
        for y in range(h) for x in range(w) for c in range(3)
    )
    data = W.encode_webp_lossless(w, h, 3, px)
    _w, _h, rgba = lw_decode_rgba(data)
    assert bytes(
        b for i in range(0, len(rgba), 4) for b in rgba[i:i + 3]
    ) == px


def test_neighbor_codes_invert_the_dist_map():
    """The encoder-side inverse of the spec's 2D distance mapping must
    agree with the decoder's forward map for every code and width,
    including the small-width collision clamp."""
    from parquet_converters_spark.functions.webp_codec import (
        _DIST_MAP,
        _neighbor_codes,
    )

    for w in (1, 3, 8, 20, 128, 1000):
        table = _neighbor_codes(w)
        for dist, code in table.items():
            dx, dy = _DIST_MAP[code - 1]
            assert dy * w + dx == dist >= 1, (w, dist, code)
        # smallest code wins collisions: no larger code maps to a dist
        # already owned by a smaller one
        seen = {}
        for code, (dx, dy) in enumerate(_DIST_MAP, start=1):
            d = dy * w + dx
            if d >= 1 and d not in seen:
                seen[d] = code
        assert table == seen


@needs_libwebp
def test_encoder_distance_mapping_on_sparse_row_deltas():
    """r13: the 2D distance mapping as a gated candidate.  Content
    whose rows mostly repeat with sparse changes codes its many
    dist==width references as cheap neighborhood codes — the gate must
    fire, shrink the stream, and stay libwebp-decodable; content
    without near references stays byte-identical (gate holds)."""
    import random

    from parquet_converters_spark.functions import webp_codec as W

    rng = random.Random(3)
    w, h = 128, 96
    row = [rng.randrange(256) for _ in range(w * 3)]
    out = list(row)
    for _y in range(1, h):
        for _ in range(6):
            row[rng.randrange(w * 3)] = rng.randrange(256)
        out += row
    px = bytes(out)
    data = W.encode_webp_lossless(w, h, 3, px)
    assert W.decode_webp(data)[3] == px
    _w, _h, rgba = lw_decode_rgba(data)
    assert bytes(
        b for i in range(0, len(rgba), 4) for b in rgba[i:i + 3]
    ) == px
    orig = W._neighbor_codes
    try:
        W._neighbor_codes = lambda wd: {}
        without = W.encode_webp_lossless(w, h, 3, px)
    finally:
        W._neighbor_codes = orig
    assert len(data) < 0.99 * len(without)  # the gate fired for real

    # no-near-reference content: bytes identical with the map offered
    noise = bytes(rng.randrange(256) for _ in range(64 * 48 * 3))
    a = W.encode_webp_lossless(64, 48, 3, noise)
    try:
        W._neighbor_codes = lambda wd: {}
        b = W.encode_webp_lossless(64, 48, 3, noise)
    finally:
        W._neighbor_codes = orig
    assert a == b


def test_cluster_tiles_cached_matches_full_rescan():
    """r12 ADVICE: _cluster_tiles now caches pairwise merge gains and
    refreshes only the merged cluster's row (O(k^2) histogram merges,
    was O(k^3)).  Lock the output — assignment AND group histograms —
    to a straight reimplementation of the old full-rescan loop on
    random histogram sets, so the cache can never drift the emitted
    streams."""
    import random

    from parquet_converters_spark.functions.webp_codec import (
        _cluster_tiles,
        _hist_cost,
        _merge_hists,
    )

    def reference(tile_hists, max_groups=16):
        clusters = [list(hs) for hs in tile_hists]
        members = [[i] for i in range(len(tile_hists))]
        costs = [sum(_hist_cost(h) for h in c) for c in clusters]

        def merge_gain(i, j):
            merged = [_merge_hists(a, b)
                      for a, b in zip(clusters[i], clusters[j])]
            mc = sum(_hist_cost(h) for h in merged)
            return costs[i] + costs[j] - mc, merged, mc

        while len(clusters) > 1:
            best = None
            for i in range(len(clusters)):
                for j in range(i + 1, len(clusters)):
                    gain, merged, mc = merge_gain(i, j)
                    if best is None or gain > best[0]:
                        best = (gain, i, j, merged, mc)
            if best[0] <= 0 and len(clusters) <= max_groups:
                break
            _, i, j, merged, mc = best
            clusters[i] = merged
            costs[i] = mc
            members[i] += members[j]
            del clusters[j], costs[j], members[j]
        assignment = {}
        for group, tiles in enumerate(members):
            for t in tiles:
                assignment[t] = group
        return assignment, clusters

    rng = random.Random(77)
    for trial in range(6):
        k = rng.choice([2, 3, 7, 12, 25, 40])
        # 3 histogram "ops" per tile (the green/red/blue shape), with
        # overlapping small-symbol alphabets so merges genuinely help
        tiles = [
            [
                {rng.randrange(8): rng.randrange(1, 50)
                 for _ in range(rng.randrange(1, 6))}
                for _ in range(3)
            ]
            for _ in range(k)
        ]
        got_a, got_h = _cluster_tiles([list(t) for t in tiles])
        ref_a, ref_h = reference([list(t) for t in tiles])
        assert got_a == ref_a, f"trial {trial}: assignment drifted"
        assert got_h == ref_h, f"trial {trial}: group histograms drifted"


@needs_libwebp
def test_encoder_meta_prefix_libwebp_reads_ours():
    """libwebp (the external decoder) must read our meta-coded stream
    byte-exactly — the entropy image, per-group code sets, and
    per-tile tree switching are all on the wire."""
    import random

    from parquet_converters_spark.functions import webp_codec as W

    rng = random.Random(21)
    w, h = 96, 48
    px = bytes(
        b
        for y in range(h)
        for x in range(w)
        for b in (
            (rng.randrange(64), rng.randrange(64), rng.randrange(64))
            if (x // 32 + y // 32) % 2 == 0
            else (192 + rng.randrange(64), 192 + rng.randrange(64),
                  192 + rng.randrange(64))
        )
    )
    data = W.encode_webp_lossless(w, h, 3, px)
    # confirm the meta candidate actually won before testing libwebp
    orig = W._write_coded_image_meta
    try:
        W._write_coded_image_meta = lambda *a, **k: False
        flat = W.encode_webp_lossless(w, h, 3, px)
    finally:
        W._write_coded_image_meta = orig
    assert len(data) < len(flat)
    assert W.decode_webp(data)[3] == px
    _w, _h, rgba = lw_decode_rgba(data)
    assert bytes(
        b for i in range(0, len(rgba), 4) for b in rgba[i : i + 3]
    ) == px


def test_encoder_per_tile_predictor_modes():
    """r12: per-tile predictor selection against shared statistics.
    Content whose halves want different predictors (row-constant left
    / column-constant right, plus noise) must trigger the tiled
    candidate and shrink the stream; content a single mode serves
    stays byte-identical (the >1% gate)."""
    import random

    from parquet_converters_spark.functions import webp_codec as W

    rng = random.Random(31)
    w, h = 128, 64
    rowbase = [rng.randrange(256) for _ in range(h)]
    colbase = [rng.randrange(256) for _ in range(w)]
    px = bytes(
        (b + rng.randint(-3, 3)) & 255
        for y in range(h)
        for x in range(w)
        for b in [rowbase[y] if x < w // 2 else colbase[x]] * 3
    )
    data = W.encode_webp_lossless(w, h, 3, px)
    assert W.decode_webp(data)[3] == px
    orig = W._pick_predictor_tiled
    try:
        W._pick_predictor_tiled = lambda *a: None
        flat = W.encode_webp_lossless(w, h, 3, px)
    finally:
        W._pick_predictor_tiled = orig
    assert len(data) < 0.99 * len(flat)  # the tiled candidate fired

    # a plain gradient: one mode serves everywhere, bytes identical
    grad = bytes(
        ((x * 3 + y * 2) % 256, (x + y) % 256, (x * 2 + y * 5) % 256)[c]
        for y in range(h) for x in range(w) for c in range(3)
    )
    with_tiled = W.encode_webp_lossless(w, h, 3, grad)
    try:
        W._pick_predictor_tiled = lambda *a: None
        without = W.encode_webp_lossless(w, h, 3, grad)
    finally:
        W._pick_predictor_tiled = orig
    assert with_tiled == without


@needs_libwebp
def test_encoder_per_tile_predictor_libwebp_reads_ours():
    """The per-tile predictor image (a real, varying parameter image)
    is on the wire: libwebp must reconstruct our stream byte-exactly."""
    import random

    from parquet_converters_spark.functions import webp_codec as W

    rng = random.Random(33)
    w, h = 96, 48
    rowbase = [rng.randrange(256) for _ in range(h)]
    colbase = [rng.randrange(256) for _ in range(w)]
    px = bytes(
        (b + rng.randint(-2, 2)) & 255
        for y in range(h)
        for x in range(w)
        for b in [rowbase[y] if x < w // 2 else colbase[x]] * 3
    )
    data = W.encode_webp_lossless(w, h, 3, px)
    orig = W._pick_predictor_tiled
    try:
        W._pick_predictor_tiled = lambda *a: None
        flat = W.encode_webp_lossless(w, h, 3, px)
    finally:
        W._pick_predictor_tiled = orig
    assert len(data) < len(flat)  # fired, so the tiled image is live
    assert W.decode_webp(data)[3] == px
    _w, _h, rgba = lw_decode_rgba(data)
    assert bytes(
        b for i in range(0, len(rgba), 4) for b in rgba[i : i + 3]
    ) == px


def _screenshot_px(seed=7, w=96, h=64, colors=2):
    """Deterministic text-screenshot-like content: glyph blocks of
    ``colors-1`` ink colors on white."""
    import random

    rng = random.Random(seed)
    px = bytearray(b"\xff" * (w * h * 3))
    pal = [(0, 0, 0), (40, 40, 220), (220, 40, 40)][: max(1, colors - 1)]
    for row in range(6, h - 7, 10):
        x = 4
        while x < w - 6:
            gw = rng.randrange(3, 7)
            col = pal[rng.randrange(len(pal))]
            for gy in range(7):
                for gx in range(gw):
                    if rng.random() < 0.55:
                        i = ((row + gy) * w + x + gx) * 3
                        px[i : i + 3] = bytes(col)
            x += gw + rng.randrange(1, 3)
    return bytes(px)


def test_encoder_flat_green_fallback_tiny_streams():
    """r14: on sub-2 KB low-color streams the green prefix-code header
    (entropy-optimal lengths over 100+ bundled-byte symbols) dominates;
    the flat-green candidate (equal-weight lengths -> RLE-collapsible
    header) must fire there, shrink the stream, and stay lossless —
    while content where it loses stays BYTE-IDENTICAL (strictly-smaller
    gate)."""
    from parquet_converters_spark.functions import webp_codec as W

    w, h = 96, 64
    orig_wci = W._write_coded_image

    def no_flat(*args, **kwargs):
        kwargs.pop("flat_green", None)
        return orig_wci(*args, **kwargs)

    # 2-color screenshot: candidate fires and wins
    px = _screenshot_px(7, w, h, colors=2)
    with_flat = W.encode_webp_lossless(w, h, 3, px)
    assert W.decode_webp(with_flat)[3] == px
    try:
        W._write_coded_image = no_flat
        without = W.encode_webp_lossless(w, h, 3, px)
    finally:
        W._write_coded_image = orig_wci
    assert len(with_flat) < len(without)

    # 3-color variant measures flat as a loss: gate keeps bytes equal
    px3 = _screenshot_px(7, w, h, colors=3)
    with_flat = W.encode_webp_lossless(w, h, 3, px3)
    try:
        W._write_coded_image = no_flat
        without = W.encode_webp_lossless(w, h, 3, px3)
    finally:
        W._write_coded_image = orig_wci
    assert with_flat == without
    assert W.decode_webp(with_flat)[3] == px3


def test_huffman_lengths_impossible_limit_raises():
    """r14: _huffman_lengths' frequency-halving limiter reaches a
    fixpoint (all freqs in {1,2}) for alphabets that cannot fit the
    requested depth — that must raise, not spin forever (found while
    scanning length limits below ceil(log2(n_symbols)))."""
    from parquet_converters_spark.functions.webp_codec import (
        _huffman_lengths,
    )

    freqs = {i: 1 + (i % 13) for i in range(177)}  # needs depth >= 8
    with pytest.raises(ValueError, match="cannot fit"):
        _huffman_lengths(freqs, 6)
    # the boundary depth still works and respects the limit
    lengths = _huffman_lengths(freqs, 8)
    assert max(lengths.values()) <= 8 and len(lengths) == 177
