"""GIF codec legs (functions/gif_codec.py): from-spec LZW + container
round-trips, hand-built interlace/sub-rect streams pinning the decoder
independently of our encoder, and the REAL Spark multimodal paths
(decode_media / resize_media / sample_frames) on GIF payloads.
Auto-activating PIL cross-validation, the test_h5py_crossval pattern."""

import struct

import pytest

from parquet_converters_spark.functions.gif_codec import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    is_gif,
    parse_gif_frames,
)

try:
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except Exception:
    HAVE_PIL = False


def _palette_frame(w, h, channels=3, n_colors=16, seed=0):
    """Deterministic palette imagery (n_colors distinct values)."""
    out = bytearray()
    for y in range(h):
        for x in range(w):
            v = ((x * 3 + y * 5 + seed) % n_colors) * (255 // (n_colors - 1))
            if channels == 3:
                out += bytes([v, 255 - v, (v * 3) % 256])
            else:
                out += bytes([v, v, 255 - v, 0 if (x + y) % 7 == 0 else 255])
    return bytes(out)


# --------------------------------------------------------------------------
# codec round-trips
# --------------------------------------------------------------------------


def test_gif_rgb_roundtrip_lossless():
    w, h = 23, 17
    px = _palette_frame(w, h)
    data = encode_gif(w, h, 3, [px])
    assert is_gif(data)
    assert decode_gif(data) == (w, h, 3, px)


def test_gif_rgba_transparency_roundtrip():
    w, h = 19, 13
    px = _palette_frame(w, h, channels=4)
    out = decode_gif(encode_gif(w, h, 4, [px]))
    assert out[:3] == (w, h, 4)
    got = out[3]
    for p in range(w * h):
        if px[4 * p + 3] < 128:  # transparent: alpha 0, RGB not preserved
            assert got[4 * p + 3] == 0
        else:
            assert got[4 * p : 4 * p + 3] == px[4 * p : 4 * p + 3]
            assert got[4 * p + 3] == 255


def test_gif_flat_color_kwkwk():
    """A single-color frame drives LZW straight through the KwKwK
    (code == next table slot) path."""
    w, h = 64, 64
    px = bytes([200, 10, 30]) * (w * h)
    assert decode_gif(encode_gif(w, h, 3, [px])) == (w, h, 3, px)


def test_gif_large_image_dictionary_reset():
    """>4096 LZW codes force the encoder's clear-code reset; the
    decoder must resynchronize losslessly."""
    w, h = 120, 90
    px = _palette_frame(w, h, n_colors=128)
    data = encode_gif(w, h, 3, [px])
    assert decode_gif(data) == (w, h, 3, px)


def test_gif_animation_frames_and_delays():
    w, h = 16, 12
    frames = [_palette_frame(w, h, seed=s) for s in range(4)]
    data = encode_gif(w, h, 3, frames, delay_ms=250)
    W, H, got = parse_gif_frames(data)
    assert (W, H) == (w, h) and len(got) == 4
    assert [d for d, _ in got] == [250] * 4
    for (_, rgba), src in zip(got, frames):
        rgb = bytes(
            b for p in range(w * h) for b in rgba[4 * p : 4 * p + 3]
        )
        assert rgb == src
    assert encode_gif(w, h, 3, frames, delay_ms=250) == data  # deterministic


def test_gif_too_many_colors_rejected():
    w, h = 32, 32  # 1024 px, all distinct colors
    px = bytes(
        b
        for i in range(w * h)
        for b in (i & 0xFF, (i >> 8) & 0xFF, (i * 7) & 0xFF)
    )
    with pytest.raises(ValueError, match="256 distinct colors"):
        encode_gif(w, h, 3, [px])


# --------------------------------------------------------------------------
# hand-built streams: decoder behavior independent of our encoder
# --------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _hand_gif(w, h, indices, gct, interlaced=False, left=0, top=0, fw=None, fh=None):
    """Assemble a minimal single-frame GIF89a from raw palette
    indices (row-major, pre-reordered by the caller if interlaced)."""
    fw, fh = fw or w, fh or h
    bits = max((len(gct) // 3 - 1).bit_length(), 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += gct + bytes(3 * ((1 << bits) - len(gct) // 3))
    out += b"\x2c" + struct.pack(
        "<HHHHB", left, top, fw, fh, 0x40 if interlaced else 0
    )
    min_code = max(bits, 2)
    out += bytes([min_code])
    lzw = _lzw_encode(min_code, indices)
    for at in range(0, len(lzw), 255):
        chunk = lzw[at : at + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_interlaced_decode():
    """Rows stored in the four-pass interlace order must come back in
    display order (spec Appendix E) — our encoder never interlaces, so
    this pins the decoder on foreign-shaped data."""
    w, h = 8, 11
    gct = bytes(b for i in range(8) for b in (i * 30, 255 - i * 30, i * 9))
    rows = [bytes((x + y) % 8 for x in range(w)) for y in range(h)]
    stored = []
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            stored.append(rows[y])
    data = _hand_gif(w, h, b"".join(stored), gct, interlaced=True)
    W, H, C, px = decode_gif(data)
    assert (W, H, C) == (w, h, 3)
    for y in range(h):
        for x in range(w):
            i = rows[y][x]
            assert px[3 * (y * w + x) : 3 * (y * w + x) + 3] == gct[
                3 * i : 3 * i + 3
            ]


def _hand_anim(w, h, gct, frames):
    """Multi-frame GIF89a from specs
    ``(left, top, fw, fh, indices, dispose, transparent)``."""
    bits = max((len(gct) // 3 - 1).bit_length(), 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += gct + bytes(3 * ((1 << bits) - len(gct) // 3))
    min_code = max(bits, 2)
    for left, top, fw, fh, idx, dispose, transparent in frames:
        flags = (dispose << 2) | (0x01 if transparent >= 0 else 0)
        out += b"\x21\xf9\x04" + bytes(
            [flags, 10, 0, max(transparent, 0), 0]
        )
        out += b"\x2c" + struct.pack("<HHHHB", left, top, fw, fh, 0)
        out += bytes([min_code])
        lzw = _lzw_encode(min_code, idx)
        for at in range(0, len(lzw), 255):
            chunk = lzw[at : at + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_gif_subrect_compositing():
    """A sub-rectangle frame paints ONTO the previous canvas state —
    the dominant real-world animated-GIF shape."""
    w, h = 8, 6
    gct = bytes([10, 10, 10, 200, 50, 50, 0, 0, 0])  # A, B, pad
    full_a = bytes(w * h)  # all index 0 (color A)
    patch_b = bytes([1] * (3 * 2))  # 3x2 of color B
    data = _hand_anim(
        w, h, gct,
        [(0, 0, w, h, full_a, 0, -1), (2, 1, 3, 2, patch_b, 0, -1)],
    )
    W, H, frames = parse_gif_frames(data)
    assert (W, H) == (w, h) and len(frames) == 2
    _, f2 = frames[1]
    for y in range(h):
        for x in range(w):
            px = f2[4 * (y * w + x) : 4 * (y * w + x) + 3]
            if 1 <= y <= 2 and 2 <= x <= 4:
                assert px == bytes([200, 50, 50]), (x, y)
            else:
                assert px == bytes([10, 10, 10]), (x, y)


def test_gif_transparent_index_shows_through():
    """A transparent index in frame 2 leaves frame 1's pixel visible
    (inter-frame transparency, not a hole)."""
    w, h = 4, 2
    gct = bytes([10, 10, 10, 200, 50, 50, 0, 0, 0])
    full_a = bytes(w * h)
    # frame 2 full-canvas: index 2 = transparent except one B pixel
    f2 = bytearray([2] * (w * h))
    f2[5] = 1
    data = _hand_anim(
        w, h, gct, [(0, 0, w, h, full_a, 0, -1), (0, 0, w, h, bytes(f2), 0, 2)]
    )
    _, _, frames = parse_gif_frames(data)
    _, out = frames[1]
    for p in range(w * h):
        expect = (200, 50, 50) if p == 5 else (10, 10, 10)
        assert tuple(out[4 * p : 4 * p + 3]) == expect
        assert out[4 * p + 3] == 255  # composited: everything painted


def test_gif_disposal_background_and_previous():
    """Disposal 2 clears the frame's rect to transparent before the
    next frame; disposal 3 restores the pre-frame canvas."""
    w, h = 4, 2
    gct = bytes([10, 10, 10, 200, 50, 50, 0, 255, 0])
    full_a = bytes(w * h)
    patch_b = bytes([1])  # 1x1 at (0,0)
    patch_c = bytes([2])  # 1x1 at (3,1)
    # dispose=2 on frame 1: after showing, its (full) rect clears
    data = _hand_anim(
        w, h, gct,
        [(0, 0, w, h, full_a, 2, -1), (0, 0, 1, 1, patch_b, 0, -1)],
    )
    _, _, frames = parse_gif_frames(data)
    _, out = frames[1]
    assert tuple(out[0:4]) == (200, 50, 50, 255)
    assert all(out[4 * p + 3] == 0 for p in range(1, w * h))  # cleared
    # dispose=3 on frame 2 (the B patch): frame 3 composites over the
    # RESTORED frame-1 canvas, so B must be gone
    data = _hand_anim(
        w, h, gct,
        [
            (0, 0, w, h, full_a, 0, -1),
            (0, 0, 1, 1, patch_b, 3, -1),
            (3, 1, 1, 1, patch_c, 0, -1),
        ],
    )
    _, _, frames = parse_gif_frames(data)
    _, out = frames[2]
    assert tuple(out[0:3]) == (10, 10, 10)  # B restored away
    assert tuple(out[4 * 7 : 4 * 7 + 3]) == (0, 255, 0)  # C painted
    assert all(
        tuple(out[4 * p : 4 * p + 3]) == (10, 10, 10)
        for p in range(w * h)
        if p not in (7,)
    )


def test_gif_frame_exceeding_canvas_rejected():
    gct = bytes(6)
    data = _hand_gif(10, 10, bytes(16), gct, fw=4, fh=4, left=8, top=8)
    with pytest.raises(ValueError, match="exceeds"):
        parse_gif_frames(data)


def test_gif_lzw_primitives_roundtrip():
    for min_code in (2, 4, 8):
        n = 1 << min_code
        seq = bytes((i * 31 + (i >> 3)) % n for i in range(5000))
        assert bytes(_lzw_decode(min_code, _lzw_encode(min_code, seq), 5000)) == seq


def test_gif_garbage_rejected():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTAGIF" + bytes(40))


# --------------------------------------------------------------------------
# the REAL Spark paths
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def gif_media_df(spark):
    from parquet_converters_spark.functions.multimodal import MEDIA_SCHEMA

    w, h = 20, 14
    still = encode_gif(w, h, 3, [_palette_frame(w, h)])
    anim = encode_gif(
        w, h, 3, [_palette_frame(w, h, seed=s) for s in range(5)], delay_ms=200
    )
    rows = [
        (300, "image", bytearray(still), "image/gif", len(still)),
        (301, "video", bytearray(anim), "image/gif", len(anim)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_media_real_path_gif(spark, gif_media_df):
    from parquet_converters_spark.functions.multimodal import (
        _band_features,
        decode_media,
    )

    got = {
        r["media_id"]: r
        for r in decode_media(gif_media_df, n_features=4).collect()
    }
    w, h = 20, 14
    px = _palette_frame(w, h)
    r = got[300]
    assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
    assert r["features"] == pytest.approx(_band_features(px, 4), abs=1e-6)
    # animation: first frame
    r2 = got[301]
    assert (r2["width"], r2["height"], r2["channels"]) == (w, h, 3)
    assert r2["features"] == pytest.approx(
        _band_features(_palette_frame(w, h, seed=0), 4), abs=1e-6
    )


def test_resize_media_real_path_gif(spark, gif_media_df):
    from parquet_converters_spark.functions.media_codecs import resize_nearest
    from parquet_converters_spark.functions.multimodal import resize_media

    still = gif_media_df.filter("media_id = 300")
    got = bytes(
        resize_media(still, width=8, height=6).collect()[0]["payload"]
    )
    w, h = 20, 14
    px = _palette_frame(w, h)
    expected = encode_gif(8, 6, 3, [resize_nearest(w, h, 3, px, 8, 6)])
    assert got == expected  # GIF in -> GIF out, byte-identical
    assert decode_gif(got)[:3] == (8, 6, 3)


def test_sample_frames_real_path_gif(spark, gif_media_df):
    """GCE delays define the timeline: 5 frames x 200 ms; sampling
    every 300 ms picks the frame VISIBLE at 0/300/600/900 ms =
    source frames 0/1/3/4, re-encoded as RGBA PNG."""
    from parquet_converters_spark.functions.media_codecs import decode_png
    from parquet_converters_spark.functions.multimodal import sample_frames

    anim = gif_media_df.filter("media_id = 301")
    got = sorted(
        sample_frames(anim, every_ms=300, max_frames=4).collect(),
        key=lambda r: r["frame_index"],
    )
    assert [r["frame_ts_ms"] for r in got] == [0, 300, 600, 900]
    w, h = 20, 14
    for r, src_seed in zip(got, [0, 1, 3, 4]):
        W, H, C, rgba = decode_png(bytes(r["payload"]))
        assert (W, H, C) == (w, h, 4)
        src = _palette_frame(w, h, seed=src_seed)
        rgb = bytes(b for p in range(w * h) for b in rgba[4 * p : 4 * p + 3])
        assert rgb == src


def test_sample_frames_zero_delay_gif(spark):
    """All-zero GCE delays are common in the wild; viewers clamp them
    to ~100 ms.  The t=0 sample must be the FIRST displayed frame (not
    the last composited canvas), and the clamped timeline spans
    n_frames x 100 ms."""
    from parquet_converters_spark.functions.media_codecs import decode_png
    from parquet_converters_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        sample_frames,
    )

    w, h = 20, 14
    anim = encode_gif(
        w, h, 3, [_palette_frame(w, h, seed=s) for s in range(4)], delay_ms=0
    )
    df = spark.createDataFrame(
        [(400, "video", bytearray(anim), "image/gif", len(anim))],
        MEDIA_SCHEMA,
    )
    got = sorted(
        sample_frames(df, every_ms=100, max_frames=4).collect(),
        key=lambda r: r["frame_index"],
    )
    # clamped timeline: frame k visible at [100k, 100k+100) ms
    assert [r["frame_ts_ms"] for r in got] == [0, 100, 200, 300]
    for r, src_seed in zip(got, [0, 1, 2, 3]):
        W, H, C, rgba = decode_png(bytes(r["payload"]))
        assert (W, H, C) == (w, h, 4)
        src = _palette_frame(w, h, seed=src_seed)
        rgb = bytes(b for p in range(w * h) for b in rgba[4 * p : 4 * p + 3])
        assert rgb == src


# --------------------------------------------------------------------------
# auto-activating PIL cross-validation
# --------------------------------------------------------------------------


@pytest.mark.skipif(not HAVE_PIL, reason="PIL not installed")
def test_gif_crossval_pil_reads_ours():
    import io

    w, h = 21, 15
    px = _palette_frame(w, h)
    img = Image.open(io.BytesIO(encode_gif(w, h, 3, [px])))
    assert img.size == (w, h)
    assert img.convert("RGB").tobytes() == px


@pytest.mark.skipif(not HAVE_PIL, reason="PIL not installed")
def test_gif_crossval_we_read_pils():
    import io

    w, h = 21, 15
    px = _palette_frame(w, h)
    buf = io.BytesIO()
    Image.frombytes("RGB", (w, h), px).convert(
        "P", palette=Image.ADAPTIVE
    ).save(buf, format="GIF")
    W, H, C, got = decode_gif(buf.getvalue())
    assert (W, H) == (w, h)
    rgb = (
        got
        if C == 3
        else bytes(b for p in range(w * h) for b in got[4 * p : 4 * p + 3])
    )
    assert rgb == px
