"""From-spec lossy VP8 decoder (functions/vp8_codec.py) vs libwebp.

Two validation layers, mirroring the r10 image-codec pattern:

1. Embedded known-answer vectors (tests/vp8_fixtures.py — streams
   encoded AND decoded by libwebp, provenance in the generator):
   exact Y/U/V and RGB sample equality with ZERO optional deps.
2. Live cross-validation wherever libwebp.so is present: a sweep of
   sizes / qualities / content classes must decode bit-identically to
   WebPDecodeYUV (the RFC-normative reconstruction) and byte-
   identically to WebPDecodeRGBA (conversion + fancy upsampling).

Plus: container integration (lossy stills and lossy ANMF animation
frames through decode_webp / parse_webp_frames — ALPH alpha planes
decode from spec and are asserted byte-exact below; only inter frames
remain rejected by name, and a WebP still can never contain one), the
RFC-vs-libwebp Y2-AC dequant formula equivalence, a deterministic
corrupt-stream sweep enforcing the untrusted-corpus decoder contract,
and crafted-stream edge cases (tests/vp8_craft.py) for legal header
combinations libwebp's encoder never emits.
"""

import ctypes
import os
import random
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from vp8_fixtures import VECTORS  # noqa: E402

from parquet_converters_spark.functions.vp8_codec import (  # noqa: E402
    AC_QLOOKUP,
    decode_vp8,
    decode_vp8_yuv,
)
from parquet_converters_spark.functions.webp_codec import (  # noqa: E402
    decode_webp,
    parse_webp_frames,
)

try:
    _LIB = ctypes.CDLL("libwebp.so.7")
    HAVE_LIBWEBP = True
except OSError:  # pragma: no cover - present in this container
    _LIB = None
    HAVE_LIBWEBP = False

needs_libwebp = pytest.mark.skipif(not HAVE_LIBWEBP, reason="no libwebp")

if HAVE_LIBWEBP:
    _LIB.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    _LIB.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    _LIB.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    _LIB.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    _LIB.WebPEncodeRGB.restype = ctypes.c_size_t
    _LIB.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    _LIB.WebPFree.argtypes = [ctypes.c_void_p]


def lw_encode(w, h, px, q=75.0):
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = _LIB.WebPEncodeRGB(px, w, h, w * 3, ctypes.c_float(q),
                              ctypes.byref(out))
    assert size
    try:
        return ctypes.string_at(out, size)
    finally:
        _LIB.WebPFree(out)


def lw_yuv(data):
    w, h = ctypes.c_int(), ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)()
    vp = ctypes.POINTER(ctypes.c_uint8)()
    st, uvs = ctypes.c_int(), ctypes.c_int()
    yp = _LIB.WebPDecodeYUV(data, len(data), ctypes.byref(w),
                            ctypes.byref(h), ctypes.byref(up),
                            ctypes.byref(vp), ctypes.byref(st),
                            ctypes.byref(uvs))
    assert yp
    W, H = w.value, h.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    y = np.ctypeslib.as_array(yp, shape=(H, st.value))[:, :W].copy()
    u = np.ctypeslib.as_array(up, shape=(ch, uvs.value))[:, :cw].copy()
    v = np.ctypeslib.as_array(vp, shape=(ch, uvs.value))[:, :cw].copy()
    _LIB.WebPFree(yp)
    return W, H, y, u, v


def lw_rgb_rgba(data):
    w, h = ctypes.c_int(), ctypes.c_int()
    p = _LIB.WebPDecodeRGBA(data, len(data), ctypes.byref(w),
                            ctypes.byref(h))
    assert p
    arr = np.ctypeslib.as_array(p, shape=(h.value, w.value, 4)).copy()
    _LIB.WebPFree(p)
    return arr


def lw_rgb(data):
    return lw_rgb_rgba(data)[:, :, :3]


def vp8_chunk(webp: bytes) -> bytes:
    pos = 12
    while pos + 8 <= len(webp):
        fourcc = webp[pos : pos + 4]
        (size,) = struct.unpack("<I", webp[pos + 4 : pos + 8])
        if fourcc == b"VP8 ":
            return webp[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise ValueError("no VP8 chunk")


def _pattern(w, h, seed=7):
    return bytes((x * 7 + y * 13 + c * 29 + seed) % 256
                 for y in range(h) for x in range(w) for c in range(3))


def _gradient(w, h):
    return bytes(b for y in range(h) for x in range(w)
                 for b in ((x * 255) // max(w - 1, 1),
                           (y * 255) // max(h - 1, 1), 128))


def _noise(w, h, seed):
    rng = random.Random(seed)
    return bytes(rng.randrange(256) for _ in range(w * h * 3))


# --------------------------------------------------------------------------
# embedded known-answer vectors (zero deps)
# --------------------------------------------------------------------------


@pytest.mark.parametrize("name", sorted(VECTORS))
def test_embedded_vector_yuv_exact(name):
    vec = VECTORS[name]
    w, h = vec["size"]
    W, H, y, u, v = decode_vp8_yuv(vp8_chunk(vec["webp"]))
    assert (W, H) == (w, h)
    cw, ch = (w + 1) // 2, (h + 1) // 2
    assert y.tobytes() == vec["y"]
    assert u.shape == (ch, cw) and u.tobytes() == vec["u"]
    assert v.tobytes() == vec["v"]


@pytest.mark.parametrize("name", sorted(VECTORS))
def test_embedded_vector_rgb_exact(name):
    vec = VECTORS[name]
    w, h = vec["size"]
    W, H, c, rgb = decode_webp(vec["webp"])  # full RIFF through webp
    assert (W, H, c) == (w, h, 3)
    assert bytes(rgb) == vec["rgb"]


# --------------------------------------------------------------------------
# live libwebp cross-validation
# --------------------------------------------------------------------------

_SWEEP_SIZES = [(1, 1), (3, 2), (16, 16), (17, 9), (33, 31), (64, 48)]
_SWEEP_QUALS = [5.0, 50.0, 90.0]


@needs_libwebp
def test_live_yuv_bit_identical_sweep():
    """Every size x quality x content combination decodes to the exact
    WebPDecodeYUV planes (the RFC-normative part of the pipeline)."""
    n = 0
    for w, h in _SWEEP_SIZES:
        for q in _SWEEP_QUALS:
            for gen in (_pattern, _gradient, lambda a, b: _noise(a, b, 5)):
                webp = lw_encode(w, h, gen(w, h), q)
                W, H, y1, u1, v1 = lw_yuv(webp)
                w2, h2, y2, u2, v2 = decode_vp8_yuv(vp8_chunk(webp))
                assert (W, H) == (w2, h2)
                assert (y1 == y2).all() and (u1 == u2).all() and (
                    v1 == v2
                ).all(), (w, h, q, gen.__name__)
                n += 1
    assert n == len(_SWEEP_SIZES) * len(_SWEEP_QUALS) * 3


@needs_libwebp
def test_live_rgb_byte_identical_sweep():
    """The RGB path (fancy upsampler + fixed-point BT.601) matches
    WebPDecodeRGBA byte for byte."""
    for w, h in ((2, 2), (17, 9), (33, 31), (48, 32)):
        for q in (5.0, 75.0):
            webp = lw_encode(w, h, _gradient(w, h), q)
            ref = lw_rgb(webp)
            W, H, c, rgb = decode_vp8(vp8_chunk(webp))
            got = np.frombuffer(rgb, np.uint8).reshape(H, W, 3)
            assert (got == ref).all(), (w, h, q)


# --------------------------------------------------------------------------
# container integration
# --------------------------------------------------------------------------


@needs_libwebp
def test_lossy_anmf_frames_composite():
    """ANMF frames carrying lossy VP8 payloads composite through
    parse_webp_frames (hand-built container: libwebp has no demuxer in
    this environment)."""
    w, h = 24, 18
    webp = lw_encode(w, h, _pattern(w, h), 75.0)
    chunk = vp8_chunk(webp)
    expected = lw_rgb(webp)

    def anmf(x, y, dur, payload):
        body = bytearray()
        body += (x // 2).to_bytes(3, "little")
        body += (y // 2).to_bytes(3, "little")
        body += (w - 1).to_bytes(3, "little")
        body += (h - 1).to_bytes(3, "little")
        body += dur.to_bytes(3, "little")
        body += bytes([0])  # blend over, no dispose
        body += b"VP8 " + len(payload).to_bytes(4, "little") + payload
        if len(payload) & 1:
            body += b"\x00"
        return b"ANMF" + len(body).to_bytes(4, "little") + bytes(body)

    cw, ch = 32, 20
    vp8x = b"VP8X" + (10).to_bytes(4, "little") + bytes(
        [0x02, 0, 0, 0]
    ) + (cw - 1).to_bytes(3, "little") + (ch - 1).to_bytes(3, "little")
    anim = b"ANIM" + (6).to_bytes(4, "little") + bytes(6)
    payload = vp8x + anim + anmf(0, 0, 40, chunk) + anmf(8, 2, 60, chunk)
    riff = b"RIFF" + (4 + len(payload)).to_bytes(4, "little") + b"WEBP" + payload

    CW, CH, frames = parse_webp_frames(riff)
    assert (CW, CH) == (cw, ch) and len(frames) == 2
    assert [f[0] for f in frames] == [40, 60]
    f0 = np.frombuffer(frames[0][1], np.uint8).reshape(ch, cw, 4)
    assert (f0[:h, :w, :3] == expected).all()
    assert (f0[:h, :w, 3] == 255).all()
    assert (f0[:, w:, 3] == 0).all()  # outside frame 0: transparent
    f1 = np.frombuffer(frames[1][1], np.uint8).reshape(ch, cw, 4)
    assert (f1[2 : 2 + h, 8 : 8 + w, :3] == expected).all()
    # decode_webp thumbnail path = first composited canvas
    W, H, c, px = decode_webp(riff)
    assert (W, H, c) == (cw, ch, 4)
    assert bytes(px) == frames[0][1]


@needs_libwebp
def test_inter_frame_rejected_by_name():
    webp = lw_encode(16, 16, _pattern(16, 16), 75.0)
    chunk = bytearray(vp8_chunk(webp))
    chunk[0] |= 0x01  # frame_type -> inter
    with pytest.raises(NotImplementedError, match="inter"):
        decode_vp8_yuv(bytes(chunk))


@pytest.mark.parametrize("name", ["alpha_grad_q75", "alpha_noise_q50"])
def test_embedded_alpha_vector_rgba_exact(name):
    """Lossy VP8 + ALPH alpha plane decodes byte-identically to
    WebPDecodeRGBA (embedded vector, zero deps)."""
    from vp8_fixtures import ALPHA_VECTORS

    vec = ALPHA_VECTORS[name]
    w, h = vec["size"]
    W, H, c, px = decode_webp(vec["webp"])
    assert (W, H, c) == (w, h, 4)
    # our 4-channel layout is RGBA, same as WebPDecodeRGBA
    assert bytes(px) == vec["rgba"]


def _forward_filter(a: bytes, w: int, h: int, filt: int) -> bytes:
    """Encoder-side ALPH row filter (inverse of the decoder's)."""
    if filt == 0:
        return bytes(a)
    out = bytearray(w * h)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if y == 0:
                pred = a[i - 1] if x else 0
            elif filt == 1:
                pred = a[i - 1] if x else a[i - w]
            elif filt == 2:
                pred = a[i - w]
            else:
                left = a[i - 1] if x else a[i - w]
                top = a[i - w]
                tl = a[i - w - 1] if x else a[i - w]
                pred = min(255, max(0, left + top - tl))
            out[i] = (a[i] - pred) & 0xFF
    return bytes(out)


@needs_libwebp
@pytest.mark.parametrize("filt", [0, 1, 2, 3])
def test_alph_crafted_filters_vs_libwebp(filt):
    """All four ALPH row filters, including the vertical/gradient
    modes libwebp's default encoder never emits: hand-craft a raw
    forward-filtered ALPH chunk, splice it into a VP8X container, and
    require libwebp and the from-spec decoder to produce the same
    RGBA bytes."""
    w, h = 19, 11
    webp = lw_encode(w, h, _pattern(w, h), 80.0)
    chunk = vp8_chunk(webp)
    alpha = bytes((x * 31 + y * 57 + (x * y) % 7) % 256
                  for y in range(h) for x in range(w))
    body = bytes([filt << 2]) + _forward_filter(alpha, w, h, filt)
    alph = b"ALPH" + len(body).to_bytes(4, "little") + body
    if len(body) & 1:
        alph += b"\x00"
    vp8x = b"VP8X" + (10).to_bytes(4, "little") + bytes(
        [0x10, 0, 0, 0]
    ) + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
    vp8c = b"VP8 " + len(chunk).to_bytes(4, "little") + chunk
    if len(chunk) & 1:
        vp8c += b"\x00"
    payload = vp8x + alph + vp8c
    riff = (
        b"RIFF" + (4 + len(payload)).to_bytes(4, "little") + b"WEBP"
        + payload
    )
    ref = lw_rgb_rgba(riff)
    assert (ref[:, :, 3].flatten() == np.frombuffer(alpha, np.uint8)).all()
    W, H, c, px = decode_webp(riff)
    assert (W, H, c) == (w, h, 4)
    got = np.frombuffer(bytes(px), np.uint8).reshape(h, w, 4)
    assert (got == ref).all()


# --------------------------------------------------------------------------
# spec invariants + hardening
# --------------------------------------------------------------------------


def test_y2_ac_dequant_formula_equivalence():
    """RFC 6386 writes the Y2 AC dequant as ac_q * 155 / 100; libwebp
    computes (ac_q * 101581) >> 16.  They agree on every reachable
    table value, so the RFC form in _dequant_factors is libwebp-exact."""
    for ac in AC_QLOOKUP:
        assert (ac * 155) // 100 == (ac * 101581) >> 16


def test_corrupt_streams_raise_clean_errors():
    """Truncations and byte-mangles of a real lossy stream surface as
    ValueError/NotImplementedError only — never IndexError or
    struct.error (untrusted-corpus decoder contract)."""
    data = vp8_chunk(VECTORS["pattern_q50"]["webp"])
    rng = random.Random(17)
    cases = [data[:n] for n in (0, 1, 3, 9, 10, 15, len(data) // 2)]
    for _ in range(300):
        mutated = bytearray(data)
        for _ in range(rng.randrange(1, 4)):
            mutated[rng.randrange(len(mutated))] = rng.randrange(256)
        cases.append(bytes(mutated))
    decoded = errors = 0
    for case in cases:
        try:
            decode_vp8_yuv(case)
            decoded += 1
        except (ValueError, NotImplementedError):
            errors += 1
    # bool-decoder slop means many mutations still "decode" (to other
    # pixels) — the contract is only about the error TYPES
    assert decoded + errors == len(cases)


def test_fixture_regeneration_note():
    """The vectors module records provenance (generator + libwebp
    version) in its docstring."""
    import vp8_fixtures

    assert "make_vp8_fixtures" in (vp8_fixtures.__doc__ or "")
    assert "libwebp" in vp8_fixtures.__doc__


@needs_libwebp
def test_spark_sample_frames_lossy_anmf(spark):
    """Spark-level frame sampling over an animated WebP whose ANMF
    frames are LOSSY VP8 — the full mapInPandas path through
    parse_webp_frames and the from-spec VP8 decoder."""
    from parquet_converters_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        sample_frames,
    )

    w, h = 24, 18
    chunk = vp8_chunk(lw_encode(w, h, _pattern(w, h), 75.0))

    def anmf(dur):
        body = bytearray()
        body += (0).to_bytes(3, "little") * 2
        body += (w - 1).to_bytes(3, "little")
        body += (h - 1).to_bytes(3, "little")
        body += dur.to_bytes(3, "little") + bytes([0])
        body += b"VP8 " + len(chunk).to_bytes(4, "little") + chunk
        if len(chunk) & 1:
            body += b"\x00"
        return b"ANMF" + len(body).to_bytes(4, "little") + bytes(body)

    vp8x = b"VP8X" + (10).to_bytes(4, "little") + bytes(
        [0x02, 0, 0, 0]
    ) + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
    anim = b"ANIM" + (6).to_bytes(4, "little") + bytes(6)
    payload = vp8x + anim + anmf(500) + anmf(500) + anmf(500)
    riff = (
        b"RIFF" + (4 + len(payload)).to_bytes(4, "little") + b"WEBP"
        + payload
    )
    df = spark.createDataFrame(
        [(900, "video", bytearray(riff), "image/webp", len(riff))],
        MEDIA_SCHEMA,
    )
    rows = sample_frames(df, every_ms=500, max_frames=3).collect()
    assert len(rows) == 3
    assert [r["frame_index"] for r in rows] == [0, 1, 2]
    # every sampled frame decodes (PNG re-encode of the composited
    # canvas) to the VP8 frame's pixels — expected from the bare-chunk
    # decode, itself pinned bit-exact against libwebp above (libwebp's
    # simple API cannot decode animations: no demuxer here)
    from parquet_converters_spark.functions.media_codecs import decode_png

    eW, eH, _c, ergb = decode_vp8(chunk)
    expected = np.frombuffer(ergb, np.uint8).reshape(eH, eW, 3)
    for r in rows:
        W, H, c, px = decode_png(bytes(r["payload"]))
        assert (W, H) == (w, h)
        got = np.frombuffer(px, np.uint8).reshape(h, w, c)
        assert (got[:, :, :3] == expected).all()


@needs_libwebp
def test_corrupt_alph_streams_raise_clean_errors():
    """Byte-mangles and truncations of a lossy-with-alpha file obey
    the untrusted-corpus contract (ValueError/NotImplementedError
    only)."""
    from vp8_fixtures import ALPHA_VECTORS

    data = ALPHA_VECTORS["alpha_grad_q75"]["webp"]
    rng = random.Random(23)
    cases = [data[:n] for n in (13, 20, 30, 40, len(data) // 2)]
    for _ in range(200):
        mutated = bytearray(data)
        for _ in range(rng.randrange(1, 4)):
            mutated[rng.randrange(len(mutated))] = rng.randrange(256)
        cases.append(bytes(mutated))
    for case in cases:
        try:
            decode_webp(case)
        except (ValueError, NotImplementedError):
            pass


# --------------------------------------------------------------------------
# crafted-stream edge cases (tests/vp8_craft.py): legal header
# combinations libwebp's encoder never emits
# --------------------------------------------------------------------------

from vp8_craft import craft_keyframe, wrap_riff  # noqa: E402

from parquet_converters_spark.functions.vp8_codec import (  # noqa: E402
    DC_PRED,
    H_PRED,
    TM_PRED,
    V_PRED,
)


def _checker_modes(mb_w, mb_h):
    ym = [[(V_PRED if (mx + my) % 2 == 0 else H_PRED)
           for mx in range(mb_w)] for my in range(mb_h)]
    uv = [[(H_PRED if (mx + my) % 2 == 0 else V_PRED)
           for mx in range(mb_w)] for my in range(mb_h)]
    return ym, uv


@needs_libwebp
def test_crafted_filter_level0_abs_segment_lf_not_filtered():
    """r11 ADVICE regression: libwebp gates the loop filter solely on
    the frame-level filter_level (VP8ParseFilterHeader: level==0 =>
    filter_type=0), even when absolute-mode segment LF values are
    nonzero.  The checkerboard V/H prediction pattern gives every MB
    edge a sample delta the filter would smooth if (wrongly) run, so
    this fails if the decoder gates on `segmentation` too."""
    ym, uv = _checker_modes(4, 4)
    vp8 = craft_keyframe(64, 64, ym, uv, filter_level=0,
                         segmentation_abs_lf=[63, 63, 63, 63])
    W, H, y, u, v = decode_vp8_yuv(vp8)
    lW, lH, ly, lu, lv = lw_yuv(wrap_riff(vp8))
    assert (W, H) == (lW, lH) == (64, 64)
    assert np.array_equal(y, ly) and np.array_equal(u, lu) \
        and np.array_equal(v, lv)
    # the no-filter result must be the raw prediction checkerboard —
    # only 127 (V from the top border) and 129 (H from the left border)
    assert set(np.unique(y)) == {127, 129}


@needs_libwebp
@pytest.mark.parametrize("simple", [False, True])
@pytest.mark.parametrize("seg_lf", [None, [63, 63, 63, 63]])
def test_crafted_filtered_frames_match_libwebp(simple, seg_lf):
    """Control for the gate fix: the same checkerboard content with a
    nonzero frame filter_level IS filtered (samples change vs the
    unfiltered frame) and still matches libwebp bit-exactly, with and
    without absolute segment LF overrides, normal and simple filter."""
    ym, uv = _checker_modes(4, 4)
    vp8 = craft_keyframe(64, 64, ym, uv, filter_level=32,
                         filter_simple=simple,
                         segmentation_abs_lf=seg_lf)
    W, H, y, u, v = decode_vp8_yuv(vp8)
    lW, lH, ly, lu, lv = lw_yuv(wrap_riff(vp8))
    assert (W, H) == (lW, lH) == (64, 64)
    assert np.array_equal(y, ly) and np.array_equal(u, lu) \
        and np.array_equal(v, lv)
    assert set(np.unique(y)) != {127, 129}  # the filter had an effect


@needs_libwebp
def test_crafted_mode_sweep_matches_libwebp():
    """All four 16x16 modes through the crafted all-skip path, odd
    (non-MB-multiple) dimensions included, match libwebp."""
    for wpx, hpx in ((48, 48), (33, 17)):
        mb_w, mb_h = (wpx + 15) // 16, (hpx + 15) // 16
        modes = (DC_PRED, V_PRED, H_PRED, TM_PRED)
        ym = [[modes[(mx + my) % 4] for mx in range(mb_w)]
              for my in range(mb_h)]
        uv = [[modes[(mx + 2 * my) % 4] for mx in range(mb_w)]
              for my in range(mb_h)]
        vp8 = craft_keyframe(wpx, hpx, ym, uv, filter_level=24)
        W, H, y, u, v = decode_vp8_yuv(vp8)
        lW, lH, ly, lu, lv = lw_yuv(wrap_riff(vp8))
        assert (W, H) == (lW, lH) == (wpx, hpx)
        assert np.array_equal(y, ly) and np.array_equal(u, lu) \
            and np.array_equal(v, lv)
