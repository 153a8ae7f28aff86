#!/usr/bin/env python3
"""Generate embedded known-answer vectors for the from-spec VP8 decoder.

Encodes a handful of small images to LOSSY WebP with libwebp
(/lib/x86_64-linux-gnu/libwebp.so.7, 1.2.4 in this container), decodes
them back with libwebp itself (WebPDecodeYUV + WebPDecodeRGBA), and
embeds stream + expected planes as hex in tests/vp8_fixtures.py — so
tests/test_vp8_codec.py can assert exact sample equality with ZERO
optional dependencies, the same pattern as tests/imageio_fixtures.py
and tests/webp_fixtures.py (r10).

The corpus spans the keyframe feature space: flat color (skip MBs +
DC), gradients (segmentation + TM/B_PRED), noise (dense tokens, all
extra-bit categories), block art (strong edges -> loop filter
decisions), odd dimensions (partial edge MBs), and quality extremes
(q5 -> heavy filtering / q95 -> near-lossless tokens).
"""

from __future__ import annotations

import ctypes
import random

import numpy as np

_LIB = ctypes.CDLL("libwebp.so.7")
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
_LIB.WebPEncodeRGBA.restype = ctypes.c_size_t
_LIB.WebPEncodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
]
_LIB.WebPFree.argtypes = [ctypes.c_void_p]


def encode(w, h, px, q):
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = _LIB.WebPEncodeRGB(px, w, h, w * 3, ctypes.c_float(q),
                              ctypes.byref(out))
    assert size
    try:
        return ctypes.string_at(out, size)
    finally:
        _LIB.WebPFree(out)


def dec_yuv(data):
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
    return y, u, v


def dec_rgb(data):
    w, h = ctypes.c_int(), ctypes.c_int()
    p = _LIB.WebPDecodeRGBA(data, len(data), ctypes.byref(w),
                            ctypes.byref(h))
    assert p
    a = np.ctypeslib.as_array(p, shape=(h.value, w.value, 4)).copy()
    _LIB.WebPFree(p)
    return a[:, :, :3]


def encode_rgba(w, h, px, q):
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = _LIB.WebPEncodeRGBA(px, w, h, w * 4, ctypes.c_float(q),
                               ctypes.byref(out))
    assert size
    try:
        return ctypes.string_at(out, size)
    finally:
        _LIB.WebPFree(out)


def pattern(w, h, seed=7):
    return bytes((x * 7 + y * 13 + c * 29 + seed) % 256
                 for y in range(h) for x in range(w) for c in range(3))


def gradient(w, h):
    return bytes(b for y in range(h) for x in range(w)
                 for b in ((x * 255) // max(w - 1, 1),
                           (y * 255) // max(h - 1, 1), 128))


def noise(w, h, seed):
    rng = random.Random(seed)
    return bytes(rng.randrange(256) for _ in range(w * h * 3))


def blocks(w, h, seed):
    rng = random.Random(seed)
    px = bytearray(w * h * 3)
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            col = bytes(rng.randrange(256) for _ in range(3))
            for y in range(by, min(by + 8, h)):
                for x in range(bx, min(bx + 8, w)):
                    px[(y * w + x) * 3 : (y * w + x) * 3 + 3] = col
    return bytes(px)


CASES = [
    ("flat_q75", 16, 16, bytes([90, 140, 200]) * 256, 75.0),
    ("pattern_q50", 32, 24, pattern(32, 24), 50.0),
    ("gradient_q5", 33, 21, gradient(33, 21), 5.0),
    ("noise_q95", 24, 16, noise(24, 16, 3), 95.0),
    ("blocks_q25", 40, 28, blocks(40, 28, 9), 25.0),
    ("odd_q80", 17, 9, pattern(17, 9, seed=11), 80.0),
]


def dec_rgba(data):
    w, h = ctypes.c_int(), ctypes.c_int()
    p = _LIB.WebPDecodeRGBA(data, len(data), ctypes.byref(w),
                            ctypes.byref(h))
    assert p
    a = np.ctypeslib.as_array(p, shape=(h.value, w.value, 4)).copy()
    _LIB.WebPFree(p)
    return a


def alpha_case(name, w, h, q, agen):
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes([(x * 7) % 256, (y * 11) % 256,
                         (x * 3 + y * 5) % 256, agen(x, y)])
    webp = encode_rgba(w, h, bytes(px), q)
    assert b"ALPH" in webp[:40]
    return name, w, h, webp, dec_rgba(webp)


ALPHA_CASES = [
    alpha_case("alpha_grad_q75", 32, 24, 75.0,
               lambda x, y: (x * 255) // 31),
    alpha_case("alpha_noise_q50", 17, 13, 50.0,
               lambda x, y: (x * 37 + y * 91) % 256),
]


def main():
    entries = []
    for name, w, h, px, q in CASES:
        webp = encode(w, h, px, q)
        y, u, v = dec_yuv(webp)
        rgb = dec_rgb(webp)
        entries.append((name, w, h, webp, y, u, v, rgb))

    def hexlines(b: bytes, indent="        "):
        s = b.hex()
        return "\n".join(
            f'{indent}"{s[i:i + 72]}"' for i in range(0, len(s), 72)
        )

    with open("tests/vp8_fixtures.py", "w") as f:
        f.write(
            '"""AUTO-GENERATED by scripts/make_vp8_fixtures.py — do not '
            'edit.\n\nLossy-WebP known-answer vectors: streams encoded '
            "AND decoded by\nlibwebp.so.7 (1.2.4); expected Y/U/V planes "
            "are WebPDecodeYUV output,\nexpected RGB is WebPDecodeRGBA "
            "(fancy upsampling).  Asserted by\ntests/test_vp8_codec.py "
            'with zero optional dependencies."""\n\n'
        )
        f.write("VECTORS = {\n")
        for name, w, h, webp, y, u, v, rgb in entries:
            f.write(f'    "{name}": {{\n')
            f.write(f'        "size": ({w}, {h}),\n')
            f.write(f'        "webp": bytes.fromhex(\n{hexlines(webp)}\n'
                    "        ),\n")
            for key, arr in (("y", y), ("u", u), ("v", v), ("rgb", rgb)):
                f.write(
                    f'        "{key}": bytes.fromhex(\n'
                    f"{hexlines(arr.tobytes())}\n        ),\n"
                )
            f.write("    },\n")
        f.write("}\n\n")
        f.write("# lossy VP8 + ALPH alpha plane: full RIFF file and the\n")
        f.write("# expected WebPDecodeRGBA output\n")
        f.write("ALPHA_VECTORS = {\n")
        for name, w, h, webp, rgba in ALPHA_CASES:
            f.write(f'    "{name}": {{\n')
            f.write(f'        "size": ({w}, {h}),\n')
            f.write(f'        "webp": bytes.fromhex(\n{hexlines(webp)}\n'
                    "        ),\n")
            f.write(f'        "rgba": bytes.fromhex(\n'
                    f"{hexlines(rgba.tobytes())}\n        ),\n")
            f.write("    },\n")
        f.write("}\n")
    total = sum(len(e[3]) for e in entries)
    print(f"wrote tests/vp8_fixtures.py ({len(entries)} vectors + "
          f"{len(ALPHA_CASES)} alpha, {total} stream bytes)")


if __name__ == "__main__":
    main()
