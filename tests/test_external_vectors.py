"""Known-answer vectors from an EXTERNAL codec implementation.

``tests/imageio_fixtures.py`` embeds, as hex constants, image files
produced by the JDK's javax.imageio writers and the pixel output of the
JDK's own readers for those exact bytes (provenance in that module's
docstring; regenerate with scripts/make_imageio_fixtures.py).  These
tests decode the embedded bytes with OUR from-spec codecs and assert
the externally-decoded pixels — exactly for the lossless formats, and
within +-2 per sample for JPEG (IDCT/rounding slack between two
independent decoders of the same stream).

This closes the self-certification gap: unlike own-encoder round-trips,
a symmetric encode/decode bug (YCbCr matrix sign, IDCT transpose,
zigzag order, interlace pass order...) cannot pass here.  Zero optional
deps — no PIL, no subprocess, no Java at test time.
"""

import pytest

from imageio_fixtures import FIXTURES
from webp_fixtures import FIXTURES as WEBP_FIXTURES


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


def _decode(fmt, data):
    if fmt == "png":
        from parquet_converters_spark.functions.media_codecs import decode_png

        return decode_png(data)
    if fmt == "bmp":
        from parquet_converters_spark.functions.media_codecs import decode_bmp

        return decode_bmp(data)
    if fmt == "gif":
        from parquet_converters_spark.functions.gif_codec import decode_gif

        return decode_gif(data)
    from parquet_converters_spark.functions.jpeg_codec import decode_jpeg

    return decode_jpeg(data)


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_external_vector(name):
    fx = FIXTURES[name]
    data = bytes.fromhex(fx["data_hex"])
    expected = bytes.fromhex(fx["expected_rgba_hex"])
    w, h, tol = fx["width"], fx["height"], fx["tolerance"]
    W, H, C, px = _decode(fx["format"], data)
    assert (W, H) == (w, h)
    got = _to_rgba(px, C, w * h)
    assert len(got) == len(expected) == w * h * 4
    if tol == 0:
        assert got == expected
    else:
        worst = max(
            abs(a - b)
            for i, (a, b) in enumerate(zip(got, expected))
            if i % 4 != 3
        )
        assert worst <= tol, f"{name}: max per-sample diff {worst} > {tol}"


@pytest.mark.parametrize("name", sorted(WEBP_FIXTURES))
def test_external_webp_vector(name):
    """VP8L known-answer vectors from libwebp (the format's reference
    implementation — provenance in tests/webp_fixtures.py): our
    from-spec decoder must reproduce libwebp's decode EXACTLY,
    covering predictor/cross-color transforms, palette bundling, the
    empirically-recovered 2D distance-map tail, and alpha."""
    from parquet_converters_spark.functions.webp_codec import decode_webp

    fx = WEBP_FIXTURES[name]
    data = bytes.fromhex(fx["data_hex"])
    expected = bytes.fromhex(fx["expected_rgba_hex"])
    w, h = fx["width"], fx["height"]
    W, H, C, px = decode_webp(data)
    assert (W, H) == (w, h)
    assert _to_rgba(px, C, w * h) == expected


def test_fixture_streams_are_what_they_claim():
    """The embedded bytes really are the stated formats/modes — guards
    against a regeneration accidentally downgrading the coverage."""
    sigs = {
        "png": b"\x89PNG",
        "bmp": b"BM",
        "gif": b"GIF8",
        "jpg": b"\xff\xd8",
    }
    for name, fx in FIXTURES.items():
        data = bytes.fromhex(fx["data_hex"])
        assert data.startswith(sigs[fx["format"]]), name
        if fx["format"] == "jpg":
            prog = "progressive" in fx["encoder_opts"]
            assert (b"\xff\xc2" in data) == prog, name
            assert (b"\xff\xc0" in data) == (not prog), name
    # the GIF vector must exercise interlacing (the JDK writes it)
    gif = bytes.fromhex(FIXTURES["gif_interlaced"]["data_hex"])
    desc = gif.find(b"\x2c")
    assert desc >= 0 and gif[desc + 9] & 0x40


# --------------------------------------------------------------------------
# resize-kernel external vectors (r11): JDK AffineTransformOp NN
# --------------------------------------------------------------------------


def _resize_pattern(w, h):
    return bytes(
        (x * 17 + y * 31 + c * 53) % 256
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )


def test_resize_nearest_vs_jdk_vectors():
    """media_codecs.resize_nearest vs embedded JDK
    AffineTransformOp(TYPE_NEAREST_NEIGHBOR) outputs
    (tests/resize_fixtures.py, zero deps at test time).

    Identity / upscale / integer-ratio downscales must be
    byte-identical.  On non-integer downscales the two conventions may
    pick opposite sides of an exact half-pixel rounding tie, so every
    differing sample must still be a valid nearest neighbor: the JDK's
    pick must equal OUR kernel's pick from one of the two source
    columns/rows adjacent to the ideal center."""
    from resize_fixtures import VECTORS

    from parquet_converters_spark.functions.media_codecs import (
        resize_nearest,
    )

    exact = 0
    for (w, h, nw, nh), jdk in VECTORS:
        px = _resize_pattern(w, h)
        ours = resize_nearest(w, h, 3, px, nw, nh)
        assert len(ours) == len(jdk)
        if ours == jdk:
            exact += 1
            continue
        # tie analysis: both picks must be source pixels whose center
        # distance to the ideal sample point is within half a source
        # pixel of optimal
        for y in range(nh):
            for x in range(nw):
                i = (y * nw + x) * 3
                if ours[i : i + 3] == jdk[i : i + 3]:
                    continue
                cx = (x + 0.5) * w / nw - 0.5
                cy = (y + 0.5) * h / nh - 0.5
                candidates = {
                    px[(sy * w + sx) * 3 : (sy * w + sx) * 3 + 3]
                    for sx in (int(cx), min(int(cx) + 1, w - 1))
                    for sy in (int(cy), min(int(cy) + 1, h - 1))
                }
                assert jdk[i : i + 3] in candidates, (w, h, nw, nh, x, y)
                assert ours[i : i + 3] in candidates, (w, h, nw, nh, x, y)
    # the agreeing shapes must stay byte-exact (regression guard on
    # the measured convention overlap)
    assert exact >= 4
