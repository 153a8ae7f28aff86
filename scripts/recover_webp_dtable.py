#!/usr/bin/env python3
"""Empirically recover/verify the VP8L 2D distance-map table against
libwebp (the format's reference implementation, present in this
container as libwebp.so.7).

Method — no libwebp source is read, only its public behavior:
  1. Generate RGB images tiled so pixel(x,y) == pixel(x-dx, y-dy) for
     every offset in the map's neighborhood, at several widths (the
     same linear distance dy*w+dx maps to different (dx,dy) at
     different widths, which disambiguates).
  2. Encode each with WebPEncodeLosslessRGB; decode with libwebp to
     get ground-truth pixels.
  3. Parse the stream with OUR bitstream machinery
     (functions/webp_codec.py), compute the coded-plane truth by
     applying the FORWARD transforms to libwebp's output, and walk the
     symbol stream: literals/cache-refs are verified against the coded
     truth; every backward reference with dist_code <= 120 yields the
     set of (dx, dy) offsets whose copy matches the coded truth.
  4. Intersect candidate sets per code across all occurrences; a
     singleton is a recovered table entry.

Prints the recovered 120-entry table and diffs it against the module's
current _DIST_MAP.  Used once to pin the table now embedded in
functions/webp_codec.py; rerunnable for audit.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from parquet_converters_spark.functions import webp_codec as W  # noqa: E402


# --- libwebp via ctypes ----------------------------------------------------

import ctypes  # noqa: E402

_lib = ctypes.CDLL("libwebp.so.7")
_lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
_lib.WebPDecodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
]
_lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
_lib.WebPEncodeLosslessRGB.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
]
_lib.WebPFree.argtypes = [ctypes.c_void_p]


def lw_decode_argb(data: bytes):
    w, h = ctypes.c_int(), ctypes.c_int()
    p = _lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not p:
        raise ValueError("libwebp decode failed")
    try:
        buf = ctypes.string_at(p, w.value * h.value * 4)
    finally:
        _lib.WebPFree(p)
    px = [
        (buf[4 * i + 3] << 24) | (buf[4 * i] << 16)
        | (buf[4 * i + 1] << 8) | buf[4 * i + 2]
        for i in range(w.value * h.value)
    ]
    return w.value, h.value, px


def lw_encode_rgb(w, h, pixels: bytes) -> bytes:
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = _lib.WebPEncodeLosslessRGB(pixels, w, h, w * 3, ctypes.byref(out))
    if not size:
        raise ValueError("libwebp encode failed")
    try:
        return ctypes.string_at(out, size)
    finally:
        _lib.WebPFree(out)


# --- forward transforms (truth pixels -> coded plane) -----------------------


def fwd_subtract_green(px):
    out = []
    for p in px:
        g = (p >> 8) & 0xFF
        r = (((p >> 16) & 0xFF) - g) & 0xFF
        b = ((p & 0xFF) - g) & 0xFF
        out.append((p & 0xFF00FF00) | (r << 16) | b)
    return out


def fwd_cross_color(px, w, h, bits, data):
    sw = W._subsample(w, bits)
    out = []
    pos = 0
    for y in range(h):
        row = (y >> bits) * sw
        for x in range(w):
            cte = data[row + (x >> bits)]
            g2r, g2b, r2b = cte & 0xFF, (cte >> 8) & 0xFF, (cte >> 16) & 0xFF
            p = px[pos]
            g = (p >> 8) & 0xFF
            r = (p >> 16) & 0xFF
            b = p & 0xFF
            # inverse order was: r += d(g2r,g); b += d(g2b,g); b += d(r2b, r_new)
            b = (b - W._ct_delta(r2b, r) - W._ct_delta(g2b, g)) & 0xFF
            r = (r - W._ct_delta(g2r, g)) & 0xFF
            out.append((p & 0xFF00FF00) | (r << 16) | b)
            pos += 1
    return out


def _sub_pixels(a, b):
    return (
        ((((a >> 24) - (b >> 24)) & 0xFF) << 24)
        | (((((a >> 16) & 0xFF) - ((b >> 16) & 0xFF)) & 0xFF) << 16)
        | (((((a >> 8) & 0xFF) - ((b >> 8) & 0xFF)) & 0xFF) << 8)
        | (((a & 0xFF) - (b & 0xFF)) & 0xFF)
    )


def fwd_predictor(px, w, h, bits, data):
    sw = W._subsample(w, bits)
    out = []
    pos = 0
    for y in range(h):
        for x in range(w):
            if pos == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = px[pos - 1]
            elif x == 0:
                pred = px[pos - w]
            else:
                mode = (data[(y >> bits) * sw + (x >> bits)] >> 8) & 0xFF
                pred = W._predict(mode, px, w, x, y, pos)
            out.append(_sub_pixels(px[pos], pred))
            pos += 1
    return out


# --- solve-mode stream walk -------------------------------------------------


def solve_stream(data: bytes, votes: dict):
    """Parse one libwebp VP8L stream; record per-dist-code candidate
    offset sets into ``votes``.  Returns (n_backrefs_2d, ok)."""
    parsed = W._parse_container(data)
    body = parsed.get("vp8l")
    if body is None or body[0] != 0x2F:
        return 0, False
    br = W._Br(body, 1)
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bit()
    if br.bits(3) != 0:
        return 0, False
    truth_w, truth_h, truth = lw_decode_argb(data)
    assert (truth_w, truth_h) == (w, h)

    transforms = []
    # read transform list exactly as the decoder does
    seen = set()
    cur_w = w
    while br.bit():
        t = br.bits(2)
        if t in seen:
            return 0, False
        seen.add(t)
        cur_w = W._read_transform(br, t, cur_w, h, transforms)

    # forward-apply the transforms (read order) to get coded truth
    coded = truth
    cw = w
    for ttype, params, tw in transforms:
        if ttype == "subtract_green":
            coded = fwd_subtract_green(coded)
        elif ttype == "cross_color":
            coded = fwd_cross_color(coded, tw, h, *params)
        elif ttype == "predictor":
            coded = fwd_predictor(coded, tw, h, *params)
        else:  # color_index — skip these samples (palette images)
            return 0, False
        cw = tw

    # the main image's spatially-coded stream (mirrors
    # _decode_image_stream but verifies against coded truth and solves
    # dist codes instead of resolving them through the table)
    cache_bits = 0
    if br.bit():
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            return 0, False
    meta = None
    sub_bits = 0
    groups_n = 1
    if br.bit():
        sub_bits = br.bits(3) + 2
        mw_, mh_ = W._subsample(cw, sub_bits), W._subsample(h, sub_bits)
        meta = W._decode_image_stream(br, mw_, mh_, False)
        meta = [((p >> 8) & 0xFFFF) for p in meta]
        groups_n = max(meta) + 1
    green_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    groups = [
        tuple(
            W._read_prefix_code(br, a)
            for a in (green_alpha, 256, 256, 256, 40)
        )
        for _ in range(groups_n)
    ]
    cache = [0] * (1 << cache_bits) if cache_bits else None
    n = cw * h
    if len(coded) != n:
        return 0, False
    pos = 0
    mw = W._subsample(cw, sub_bits) if meta else 0
    found = 0
    group = groups[0]
    while pos < n:
        if meta is not None:
            x, y = pos % cw, pos // cw
            group = groups[meta[(y >> sub_bits) * mw + (x >> sub_bits)]]
        g_tree, r_tree, b_tree, a_tree, d_tree = group
        s = g_tree.read(br)
        if s < 256:
            red = r_tree.read(br)
            blue = b_tree.read(br)
            alpha = a_tree.read(br)
            argb = (alpha << 24) | (red << 16) | (s << 8) | blue
            if argb != coded[pos]:
                return found, False  # forward-transform mismatch
            if cache is not None:
                cache[W._cache_key(argb, cache_bits)] = argb
            pos += 1
        elif s < 280:
            length = W._lz77_value(s - 256, br)
            dist_code = W._lz77_value(d_tree.read(br), br)
            if pos + length > n:
                return found, False
            if dist_code > 120:
                dist = dist_code - 120
                if dist > pos or any(
                    coded[pos - dist + i] != coded[pos + i]
                    for i in range(length)
                ):
                    return found, False
            else:
                cands = set()
                for dy in range(0, 9):
                    for dx in range(-9, 10):
                        d = dy * cw + dx
                        if d < 1 or d > pos:
                            continue
                        if all(
                            coded[pos - d + i] == coded[pos + i]
                            for i in range(length)
                        ):
                            cands.add((dx, dy))
                if not cands:
                    return found, False
                cur = votes.setdefault(dist_code, set(cands))
                cur &= cands
                votes[dist_code] = cur
                found += 1
            if cache is not None:
                for i in range(length):
                    argb = coded[pos + i]
                    cache[W._cache_key(argb, cache_bits)] = argb
            pos += length
        else:
            if cache is None:
                return found, False
            argb = cache[s - 280]
            if argb != coded[pos]:
                return found, False
            pos += 1
    return found, True


# --- sample generation -------------------------------------------------------


def tiled_image(w, h, dx, dy, seed):
    """pixel(x,y) = pixel(x-dx, y-dy) wherever that source exists."""
    import random

    rng = random.Random(seed)
    px = [[None] * w for _ in range(h)]
    for y in range(h):
        for x in range(w):
            sx, sy = x - dx, y - dy
            if dy == 0 and dx > 0 and sx >= 0:
                px[y][x] = px[sy][sx]
            elif dy > 0 and 0 <= sx < w and sy >= 0:
                px[y][x] = px[sy][sx]
            else:
                px[y][x] = (
                    rng.randrange(256), rng.randrange(256), rng.randrange(256)
                )
    return bytes(v for row in px for p in row for v in p)


def main():
    votes: dict[int, set] = {}
    streams = bad = 0
    widths = (19, 23, 31, 37, 45)
    offsets = [(dx, 0) for dx in range(1, 9)] + [
        (dx, dy) for dy in range(1, 9) for dx in range(-8, 9)
    ]
    for seed, (dx, dy) in enumerate(offsets):
        for w in widths:
            h = 24
            raw = tiled_image(w, h, dx, dy, seed * 100 + w)
            data = lw_encode_rgb(w, h, raw)
            try:
                _, ok = solve_stream(data, votes)
            except (ValueError, NotImplementedError):
                ok = False
            streams += 1
            bad += 0 if ok else 1
    print(f"{streams} streams parsed, {bad} skipped")
    solved = {c: next(iter(s)) for c, s in votes.items() if len(s) == 1}
    ambiguous = {c: s for c, s in votes.items() if len(s) > 1}
    empty = [c for c, s in votes.items() if not s]
    print(f"codes seen: {len(votes)}; solved: {len(solved)}; "
          f"ambiguous: {len(ambiguous)}; contradictory: {empty}")
    diffs = []
    for code, off in sorted(solved.items()):
        if code - 1 >= len(W._DIST_MAP) or W._DIST_MAP[code - 1] != off:
            cur = (
                W._DIST_MAP[code - 1]
                if code - 1 < len(W._DIST_MAP)
                else None
            )
            diffs.append((code, cur, off))
    print(f"table disagreements: {len(diffs)}")
    for code, cur, off in diffs:
        print(f"  code {code}: module has {cur}, recovered {off}")
    if ambiguous:
        print("ambiguous codes:",
              {c: sorted(s) for c, s in sorted(ambiguous.items())})
    # emit the recovered table merged over the module's for unseen codes
    merged = []
    for code in range(1, 121):
        if code in solved:
            merged.append(solved[code])
        elif code - 1 < len(W._DIST_MAP):
            merged.append(W._DIST_MAP[code - 1])
        else:
            merged.append(None)
    print("RECOVERED_TABLE = (")
    for i in range(0, 120, 8):
        row = ", ".join(str(t) for t in merged[i : i + 8])
        print(f"    {row},")
    print(")")
    unseen = [i + 1 for i, t in enumerate(merged) if t is None]
    if unseen:
        print("UNSEEN codes with no module fallback:", unseen)


if __name__ == "__main__":
    main()
