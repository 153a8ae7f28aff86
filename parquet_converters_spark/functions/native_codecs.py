"""Native-codec adapters for the ``decode_media(decoder=)`` /
``resize_media(resizer=)`` swap seam.

The from-spec stdlib codecs (jpeg_codec.py, gif_codec.py,
webp_codec.py, media_codecs.py) are the always-available,
environment-independent path — and, being pure Python, the documented
per-core throughput ceiling at 100 TB (SCALE.md).  This module is the
other side of that trade: factories that wrap a NATIVE library behind
the exact callable signatures the seam accepts, so production clusters
swap throughput in with one argument and zero plumbing changes.

Only stdlib ``ctypes`` against system libraries — nothing is imported
at module load, and a missing library raises a clean ``RuntimeError``
from the factory (never at import time), so this module is safe to
ship everywhere.

Currently provided: libwebp (present in this container; since r11 the
from-spec path decodes lossy VP8 too — vp8_codec.py — so the seam is
pure throughput swap except for ALPH alpha-plane files, which only
libwebp handles).  The same factory pattern is where a PIL-SIMD /
libjpeg-turbo / nvJPEG wrapper would live.
"""

from __future__ import annotations

_WEBP_SONAMES = ("libwebp.so.7", "libwebp.so", "libwebp.dylib", "webp")

# Per-process handle cache: the dlopen + prototype setup happen once per
# worker process, not once per decoded row.  The cache lives at module
# level (never captured in a closure), so seam callables stay picklable.
_LIBWEBP = None


def _load_libwebp():
    global _LIBWEBP
    if _LIBWEBP is not None:
        return _LIBWEBP
    import ctypes
    import ctypes.util

    lib = None
    for name in _WEBP_SONAMES:
        try:
            lib = ctypes.CDLL(name)
            break
        except OSError:
            continue
    if lib is None:
        found = ctypes.util.find_library("webp")
        if found:
            try:
                lib = ctypes.CDLL(found)
            except OSError:
                lib = None
    if lib is None:
        raise RuntimeError(
            "libwebp shared library not found — install libwebp or use "
            "the from-spec decoder (functions/webp_codec.py, lossless "
            "only)"
        )
    lib.WebPGetInfo.restype = ctypes.c_int
    lib.WebPGetInfo.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.WebPFree.argtypes = [ctypes.c_void_p]
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    lib.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_float,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    _LIBWEBP = lib
    return lib


def libwebp_encode_lossy_rgb(
    w: int, h: int, pixels: bytes, quality: float = 75.0
) -> bytes:
    """Encode packed RGB to LOSSY (VP8) WebP via libwebp — corpus
    generation for benches/tests; the from-spec encoder is VP8L-only."""
    import ctypes

    lib = _load_libwebp()
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = lib.WebPEncodeRGB(
        pixels, w, h, w * 3, ctypes.c_float(quality), ctypes.byref(out)
    )
    if not size:
        raise ValueError("libwebp lossy encode failed")
    try:
        return ctypes.string_at(out, size)
    finally:
        lib.WebPFree(out)


def _libwebp_decode_rgba(data: bytes) -> tuple[int, int, bytes]:
    """Decode any (lossless OR lossy) WebP via libwebp -> (w, h, RGBA).

    The library handle is memoized per worker process (module-level
    cache in ``_load_libwebp``), so no handles are captured in
    picklable closures and the dlopen cost is paid once, not per row."""
    import ctypes

    lib = _load_libwebp()
    w, h = ctypes.c_int(), ctypes.c_int()
    p = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not p:
        raise ValueError("libwebp: cannot decode payload")
    try:
        return w.value, h.value, ctypes.string_at(p, w.value * h.value * 4)
    finally:
        lib.WebPFree(p)


def libwebp_media_decoder():
    """Factory: a ``decode_media(decoder=...)``-compatible callable that
    decodes WebP (lossless *and* lossy) through libwebp and everything
    else through the from-spec ``_real_decode`` table.

    Raises ``RuntimeError`` immediately (driver-side) if libwebp is not
    loadable here — fail fast rather than on the executors.  Executors
    load their own library handle on first call.
    """
    _load_libwebp()  # driver-side availability check

    def decode(payload: bytes, n_features: int):
        from parquet_converters_spark.functions.multimodal import (
            _band_features,
            _real_decode,
        )
        from parquet_converters_spark.functions.webp_codec import is_webp

        if is_webp(payload):
            w, h, rgba = _libwebp_decode_rgba(payload)
            if all(rgba[i] == 255 for i in range(3, len(rgba), 4)):
                pixels = bytes(
                    b for p in range(w * h) for b in rgba[4 * p : 4 * p + 3]
                )
                return w, h, 3, _band_features(pixels, n_features)
            return w, h, 4, _band_features(rgba, n_features)
        return _real_decode(payload, n_features)

    return decode
