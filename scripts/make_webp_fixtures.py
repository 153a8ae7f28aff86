#!/usr/bin/env python3
"""Generate tests/webp_fixtures.py: VP8L streams produced by libwebp
(the format's reference implementation, libwebp.so.7 in this
container) plus libwebp's own decode of those exact bytes, embedded as
hex constants — self-contained external known-answer vectors for the
from-spec decoder in functions/webp_codec.py, requiring no libwebp at
test time.

Regenerate with:  PYTHONPATH=/root/repo python scripts/make_webp_fixtures.py
"""

import ctypes
import random
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_lib = ctypes.CDLL("libwebp.so.7")
_lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
_lib.WebPDecodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
]
for _fn in ("WebPEncodeLosslessRGBA", "WebPEncodeLosslessRGB"):
    f = getattr(_lib, _fn)
    f.restype = ctypes.c_size_t
    f.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
_lib.WebPFree.argtypes = [ctypes.c_void_p]
_lib.WebPGetDecoderVersion.restype = ctypes.c_int


def decode_rgba(data):
    w, h = ctypes.c_int(), ctypes.c_int()
    p = _lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not p:
        raise ValueError("libwebp decode failed")
    try:
        return w.value, h.value, ctypes.string_at(p, w.value * h.value * 4)
    finally:
        _lib.WebPFree(p)


def encode_lossless(w, h, c, pixels):
    out = ctypes.POINTER(ctypes.c_uint8)()
    fn = _lib.WebPEncodeLosslessRGBA if c == 4 else _lib.WebPEncodeLosslessRGB
    size = fn(pixels, w, h, w * c, ctypes.byref(out))
    if not size:
        raise ValueError("libwebp encode failed")
    try:
        return ctypes.string_at(out, size)
    finally:
        _lib.WebPFree(out)


def main():
    rng = random.Random(20260815)
    fixtures = {}

    def add(name, w, h, c, raw):
        data = encode_lossless(w, h, c, raw)
        dw, dh, rgba = decode_rgba(data)
        assert (dw, dh) == (w, h)
        fixtures[name] = {
            "width": w,
            "height": h,
            "data_hex": data.hex(),
            "expected_rgba_hex": rgba.hex(),
        }
        print(f"{name}: {len(data)} file bytes")

    # gradient: predictor / cross-color transforms
    w, h = 40, 30
    add("vp8l_gradient", w, h, 3, bytes(
        ((x * 3 + y * 2) % 256, (x + y) % 256, (x * 2 + y * 5) % 256)[ch]
        for y in range(h) for x in range(w) for ch in range(3)
    ))
    # 4-color palette: color-indexing with 2-bit pixel bundling
    w, h = 37, 29
    pal = [(rng.randrange(256), rng.randrange(256), rng.randrange(256))
           for _ in range(4)]
    add("vp8l_palette4", w, h, 3, bytes(
        v for y in range(h) for x in range(w) for v in pal[(x + 3 * y) % 4]
    ))
    # tiled at a distance-map tail offset (code for (5,7) at w=19)
    w, h = 19, 24
    px = [[None] * w for _ in range(h)]
    for y in range(h):
        for x in range(w):
            sx, sy = x - 5, y - 7
            if 0 <= sx < w and sy >= 0:
                px[y][x] = px[sy][sx]
            else:
                px[y][x] = (rng.randrange(256), rng.randrange(256),
                            rng.randrange(256))
    add("vp8l_tiled_5_7", w, h, 3,
        bytes(v for row in px for p in row for v in p))
    # random noise with a real alpha plane
    w, h = 24, 18
    add("vp8l_noise_alpha", w, h, 4, bytes(
        rng.randrange(256) if i % 4 != 3 else (255 if (i // 4) % 3 else 77)
        for i in range(w * h * 4)
    ))

    v = _lib.WebPGetDecoderVersion()
    ver = f"{(v >> 16) & 0xFF}.{(v >> 8) & 0xFF}.{v & 0xFF}"
    out = REPO / "tests" / "webp_fixtures.py"
    with out.open("w") as f:
        f.write('"""AUTO-GENERATED known-answer vectors — do not edit.\n\n')
        f.write("Provenance: every byte string below was produced by\n")
        f.write(f"libwebp {ver} (WebPEncodeLossless*), and every\n")
        f.write("expected_rgba buffer is that SAME reference\n")
        f.write("implementation's WebPDecodeRGBA output for those bytes.\n\n")
        f.write("Regenerate: PYTHONPATH=/root/repo python "
                "scripts/make_webp_fixtures.py\n")
        f.write('"""\n\n')
        f.write("FIXTURES = {\n")
        for name, fx in fixtures.items():
            f.write(f"    {name!r}: {{\n")
            for k, v_ in fx.items():
                f.write(f"        {k!r}: {v_!r},\n")
            f.write("    },\n")
        f.write("}\n")
    print(f"wrote {out} ({out.stat().st_size} bytes)")


if __name__ == "__main__":
    sys.exit(main())
