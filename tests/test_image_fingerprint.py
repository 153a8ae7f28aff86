"""Perceptual image hashes (dHash/aHash) + Hamming-banded near-dup.

The reference arithmetic here is written independently of
functions/image_fingerprint.py (per-pixel loops, no numpy, no shared
helpers) so a bug in the module's vectorized luma/grid path cannot
cancel out in the comparison.
"""

import random

import pytest

from parquet_converters_spark.functions.image_fingerprint import (
    ahash64_unsigned,
    bmp_realizing_dhash,
    decode_image_pixels,
    dhash64_unsigned,
    hamming_neardup_pairs,
    image_hashes,
    luma_grid,
    to_signed64,
)
from parquet_converters_spark.functions.media_codecs import (
    encode_bmp,
    encode_png,
)


def _ref_luma_grid(w, h, c, pixels, gw, gh):
    # Independent re-derivation: per-pixel loops, no numpy.
    def luma(x, y):
        at = (y * w + x) * c
        if c >= 3:
            r, g, b = pixels[at], pixels[at + 1], pixels[at + 2]
            return (299 * r + 587 * g + 114 * b) // 1000
        return pixels[at]

    grid = []
    for j in range(gh):
        row = []
        for i in range(gw):
            x0, x1 = i * w // gw, (i + 1) * w // gw
            y0, y1 = j * h // gh, (j + 1) * h // gh
            vals = [luma(x, y) for y in range(y0, y1) for x in range(x0, x1)]
            row.append(sum(vals) // len(vals))
        grid.append(row)
    return grid


def _random_rgb(w, h, seed):
    rng = random.Random(seed)
    return bytes(rng.randrange(256) for _ in range(w * h * 3))


def _ref_dhash(payload):
    w, h, c, px = decode_image_pixels(payload)
    g = _ref_luma_grid(w, h, c, px, 9, 8)
    out = 0
    for y in range(8):
        for x in range(8):
            if g[y][x + 1] > g[y][x]:
                out |= 1 << (y * 8 + x)
    return out


def _ref_ahash(payload):
    w, h, c, px = decode_image_pixels(payload)
    g = _ref_luma_grid(w, h, c, px, 8, 8)
    mean = sum(sum(r) for r in g) // 64
    out = 0
    for y in range(8):
        for x in range(8):
            if g[y][x] > mean:
                out |= 1 << (y * 8 + x)
    return out


@pytest.mark.parametrize("w,h", [(9, 8), (18, 16), (32, 24), (45, 40)])
def test_hashes_match_independent_reference(w, h):
    for seed in range(3):
        payload = encode_bmp(w, h, 3, _random_rgb(w, h, seed * 100 + w))
        assert dhash64_unsigned(payload) == _ref_dhash(payload)
        assert ahash64_unsigned(payload) == _ref_ahash(payload)


def test_hash_is_codec_invariant():
    # The same pixels through three different REAL codecs hash equal —
    # the perceptual hash sees pixels, not container bytes.
    from parquet_converters_spark.functions.tiff_codec import encode_tiff

    px = _random_rgb(27, 16, 7)
    bmp = encode_bmp(27, 16, 3, px)
    png = encode_png(27, 16, 3, px)
    tif = encode_tiff(27, 16, 3, px)
    assert dhash64_unsigned(bmp) == dhash64_unsigned(png)
    assert ahash64_unsigned(bmp) == ahash64_unsigned(png)
    assert dhash64_unsigned(tif) == dhash64_unsigned(bmp)
    assert ahash64_unsigned(tif) == ahash64_unsigned(bmp)


def test_bmp_realizing_dhash_round_trips_exact_bits():
    rng = random.Random(42)
    for _ in range(8):
        target = rng.getrandbits(64)
        assert dhash64_unsigned(bmp_realizing_dhash(target)) == target


def test_luma_grid_identity_on_exact_grid():
    # A 9x8 gray image downsampled to 9x8 is the pixel values
    # themselves (luma of gray v is exactly v).
    vals = [[(x * 29 + y * 13) % 251 for x in range(9)] for y in range(8)]
    px = bytes(v for row in vals for v in row for _ in range(3))
    grid = luma_grid(9, 8, 3, px, 9, 8)
    assert grid == vals


def test_too_small_image_rejected():
    payload = encode_bmp(4, 4, 3, _random_rgb(4, 4, 1))
    with pytest.raises(ValueError, match="smaller than"):
        dhash64_unsigned(payload)


def test_non_image_payload_rejected_by_name():
    with pytest.raises(NotImplementedError, match="still image"):
        dhash64_unsigned(b"RIFF\x00\x00\x00\x00WAVEjunk")


def test_to_signed64():
    assert to_signed64(5) == 5
    assert to_signed64((1 << 63)) == -(1 << 63)
    assert to_signed64((1 << 64) - 1) == -1


def test_image_hashes_and_banded_pairs(spark):
    # Images realized from controlled dhash targets: pairs (2k, 2k+1)
    # sit at exact Hamming distance k (flip bits 0,9,18,27,...); the
    # banded join must find exactly the pairs with distance <= 3 and
    # report the exact distance — verified against a brute-force
    # all-pairs recount.
    base = 0x5A5A_0FF0_C3C3_1234
    rows = []
    for k in range(6):
        flips = 0
        for i in range(k):
            flips |= 1 << (9 * i)
        rows.append((2 * k, bmp_realizing_dhash(base)))
        rows.append((2 * k + 1, bmp_realizing_dhash(base ^ flips)))
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    sig = image_hashes(df)
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in hamming_neardup_pairs(sig, max_hamming=3).collect()
    }
    hashes = {r.media_id: r.dhash for r in sig.collect()}
    want = {}
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1")
            if d <= 3:
                want[(a, b)] = d
    assert got == want
    # the k-flip construction seeds known in-pair distances
    assert want[(0, 1)] == 0 and want[(2, 3)] == 1 and want[(6, 7)] == 3
    assert (8, 9) not in want  # distance 4 excluded


def test_dhash_stable_under_rescale():
    # The perceptual property itself: a smooth image downscaled 2x
    # (pixel-area resample) keeps a close dHash — the hash sees the
    # coarse luma structure, not the resolution.
    import math

    w, h = 36, 32
    px = bytes(
        v
        for y in range(h)
        for x in range(w)
        for v in [
            int(128 + 90 * math.sin(2 * math.pi * x / w) * math.cos(2 * math.pi * y / h))
        ] * 3
    )
    big = encode_bmp(w, h, 3, px)
    # 2x2 box downscale (independent of luma_grid's machinery)
    small_px = bytearray()
    for y in range(0, h, 2):
        for x in range(0, w, 2):
            s = 0
            for dy in range(2):
                for dx in range(2):
                    s += px[((y + dy) * w + (x + dx)) * 3]
            v = s // 4
            small_px += bytes((v, v, v))
    small = encode_bmp(w // 2, h // 2, 3, bytes(small_px))
    d = bin(
        (dhash64_unsigned(big) ^ dhash64_unsigned(small)) & ((1 << 64) - 1)
    ).count("1")
    assert d <= 6, f"dhash moved {d} bits under 2x downscale"


def test_image_neardup_survivors(spark):
    # Three clusters: ids {1,2,3} share one hash neighborhood (exact +
    # 1-bit + 2-bit), {10,11} another, {20} is a singleton.  Survivors
    # keep each cluster's minimum id with all original columns.
    from parquet_converters_spark.functions.image_fingerprint import (
        image_neardup_survivors,
    )

    a, b = 0x1234_5678_9ABC_DEF0, 0x0FF0_0FF0_0FF0_0FF0
    rows = [
        (1, bmp_realizing_dhash(a), "x1"),
        (2, bmp_realizing_dhash(a ^ 1), "x2"),
        (3, bmp_realizing_dhash(a ^ (1 << 9) ^ (1 << 18)), "x3"),
        (10, bmp_realizing_dhash(b), "y1"),
        (11, bmp_realizing_dhash(b), "y2"),
        (20, bmp_realizing_dhash(a ^ b), "z"),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, payload binary, tag string"
    )
    kept = sorted(
        (r.media_id, r.tag) for r in image_neardup_survivors(df).collect()
    )
    assert kept == [(1, "x1"), (10, "y1"), (20, "z")]


def test_video_frame_hashes_gif_and_avi(spark):
    # GIF timeline: frames realize known targets; the API must return
    # them per (media_id, frame_index) with timeline ticks.
    from parquet_converters_spark.functions.gif_codec import encode_gif
    from parquet_converters_spark.functions.image_fingerprint import (
        rows_realizing_dhash,
        to_signed64,
        video_frame_hashes,
    )

    t0, t1 = 0x0102_0304_0506_0708, 0xF0E0_D0C0_B0A0_9080

    def rgb(target):
        rows = rows_realizing_dhash(target)
        return bytes(v for row in rows for v in row for _ in range(3))

    gif = encode_gif(9, 8, 3, [rgb(t0), rgb(t1)], delay_ms=100)
    df = spark.createDataFrame([(5, gif)], "media_id long, payload binary")
    got = {
        (r.media_id, r.frame_index): (r.frame_ts_ms, r.dhash)
        for r in video_frame_hashes(df, every_ms=100, max_frames=2).collect()
    }
    assert got == {
        (5, 0): (0, to_signed64(t0)),
        (5, 1): (100, to_signed64(t1)),
    }


def test_image_dedup_gate_streaming_exactly_once(spark, tmp_path):
    """Two file streams over the same images union to a duplicated
    stream; the gate's dropDuplicatesWithinWatermark on dHash restores
    exactly-once by PERCEPTUAL identity (media_ids all distinct — the
    keys would never collapse; the pixels do)."""
    import datetime

    from parquet_converters_spark.functions.image_fingerprint import (
        image_dedup_gate,
    )

    base = datetime.datetime(2026, 1, 1)
    rows = []
    for i in range(40):
        # 10 distinct images, each re-posted 4x under fresh ids
        target = ((i % 10) * 2654435761 + 17) % (1 << 64)
        rows.append(
            (i, base + datetime.timedelta(minutes=i),
             bmp_realizing_dhash(target))
        )
    src = str(tmp_path / "images_stream")
    spark.createDataFrame(
        rows, "media_id long, ts timestamp, payload binary"
    ).repartition(2).write.parquet(src)

    schema = spark.read.parquet(src).schema
    stream = lambda: (  # noqa: E731
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    duplicated = stream().unionByName(stream())
    q = (
        image_dedup_gate(duplicated, watermark="1 day")
        .writeStream.format("memory")
        .queryName("img_dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql(
        "select count(*) n, count(distinct dhash) d from img_dedup_stream"
    ).collect()[0]
    assert got["d"] == 10
    assert got["n"] == 10  # no duplicate emissions

    # batch symmetry: same gate, same answer
    batch = spark.read.parquet(src)
    assert image_dedup_gate(batch).count() == 10


def test_video_frame_hashes_duplicate_ids_and_payload_col(spark):
    # duplicate media_id must NOT multiply rows (the r15 _fid-join
    # regression), and payload_col must be honored by name
    from parquet_converters_spark.functions.gif_codec import encode_gif
    from parquet_converters_spark.functions.image_fingerprint import (
        rows_realizing_dhash,
        video_frame_hashes,
    )

    rows_px = rows_realizing_dhash(0x1234)
    rgb = bytes(v for row in rows_px for v in row for _ in range(3))
    gif = encode_gif(9, 8, 3, [rgb, rgb], delay_ms=100)
    df = spark.createDataFrame(
        [(5, gif), (5, gif)], "media_id long, blob binary"
    )
    out = video_frame_hashes(
        df, payload_col="blob", every_ms=100, max_frames=2
    ).collect()
    assert len(out) == 4  # 2 inputs x 2 frames, not 2 x 2 x 2


def _ref_phash(payload):
    # independent reference: direct cosine double sums, no matrix path
    import math

    from parquet_converters_spark.functions.image_fingerprint import (
        decode_image_pixels,
    )

    w, h, c, px = decode_image_pixels(payload)
    g = _ref_luma_grid(w, h, c, px, 32, 32)
    low = [
        [
            sum(
                g[y][x]
                * math.cos(math.pi * (2 * x + 1) * u / 64)
                * math.cos(math.pi * (2 * y + 1) * v / 64)
                for y in range(32)
                for x in range(32)
            )
            for u in range(8)
        ]
        for v in range(8)
    ]
    flat = [low[v][u] for v in range(8) for u in range(8)]
    med = sorted(flat[1:])[31]  # median of 63 = 32nd smallest
    out = 0
    for i, val in enumerate(flat):
        if i and val > med:
            out |= 1 << i
    return out


def test_phash_matches_independent_dct():
    from parquet_converters_spark.functions.image_fingerprint import (
        phash64_unsigned,
    )

    for seed in (3, 9):
        payload = encode_bmp(40, 36, 3, _random_rgb(40, 36, seed))
        assert phash64_unsigned(payload) == _ref_phash(payload)


def test_phash_stable_under_rescale():
    import math

    from parquet_converters_spark.functions.image_fingerprint import (
        phash64_unsigned,
    )

    w, h = 64, 64
    px = bytes(
        v
        for y in range(h)
        for x in range(w)
        for v in [
            int(128 + 100 * math.sin(2 * math.pi * x / w)
                * math.cos(2 * math.pi * y / h))
        ] * 3
    )
    big = encode_bmp(w, h, 3, px)
    small_px = bytearray()
    for y in range(0, h, 2):
        for x in range(0, w, 2):
            s = sum(
                px[((y + dy) * w + (x + dx)) * 3]
                for dy in range(2) for dx in range(2)
            )
            v = s // 4
            small_px += bytes((v, v, v))
    small = encode_bmp(w // 2, h // 2, 3, bytes(small_px))
    d = bin(
        (phash64_unsigned(big) ^ phash64_unsigned(small)) & ((1 << 64) - 1)
    ).count("1")
    assert d <= 4, f"phash moved {d} bits under 2x downscale"


def test_phash_rejects_small_images():
    from parquet_converters_spark.functions.image_fingerprint import (
        phash64_unsigned,
    )

    with pytest.raises(ValueError, match="smaller than"):
        phash64_unsigned(encode_bmp(16, 16, 3, _random_rgb(16, 16, 2)))


def test_phash_synthesis_all_180_variants_bit_exact():
    """r16: every census variant (36 unit patterns x 5 amplitudes)
    round-trips bit-exact through the REAL decode -> 32x32 luma ->
    DCT -> median path — exhaustive, because doc_id only selects among
    these 180 payloads, so this covers the entire query input space."""
    from parquet_converters_spark.functions.image_fingerprint import (
        PHASH_UNITS,
        bmp_realizing_phash,
        phash64_unsigned,
        phash_target,
    )

    assert len(PHASH_UNITS) == 36
    seen = set()
    for v in range(180):
        t, a = phash_target(v)
        assert bin(t).count("1") == 31 and not (t & 1) and not (t >> 63)
        assert phash64_unsigned(bmp_realizing_phash(t, a)) == t
        seen.add(t)
    assert len(seen) == 36  # amplitudes change bytes, never the hash


def test_phash_synthesis_rejects_knife_edge_targets():
    from parquet_converters_spark.functions.image_fingerprint import (
        bmp_realizing_phash,
    )

    with pytest.raises(ValueError, match="EXACTLY 31"):
        bmp_realizing_phash((1 << 31) - 2)  # 30 set bits
    with pytest.raises(ValueError, match="median"):
        bmp_realizing_phash(1 | ((1 << 32) - 2))  # DC bit set
    with pytest.raises(ValueError, match="median"):
        bmp_realizing_phash((1 << 63) | ((1 << 31) - 2))  # bit 63 set


def test_image_phashes_stage_signed_fold(spark):
    """The Spark stage returns phash as SIGNED long (hash-join/groupBy
    type parity with dhash/ahash); a payload whose unsigned hash sets
    bit 63 must fold negative."""
    from parquet_converters_spark.functions.image_fingerprint import (
        bmp_realizing_phash,
        image_phashes,
        phash64_unsigned,
        phash_target,
    )

    t0, a0 = phash_target(0)
    t1, a1 = phash_target(37)  # different unit AND amplitude rung
    df = spark.createDataFrame(
        [(1, bytearray(bmp_realizing_phash(t0, a0))),
         (2, bytearray(bmp_realizing_phash(t1, a1)))],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r["phash"] for r in image_phashes(df).collect()}
    assert got == {1: t0, 2: t1}  # both targets < 2^63: fold is identity
    # signed-fold arithmetic (bit 63 case) — checked at the fold site
    u = (1 << 63) | 5
    assert (u - (1 << 64) if u >= (1 << 63) else u) == 5 - (1 << 63)
    # and the stage agrees with the payload-level function exactly
    raw = bmp_realizing_phash(t0, a0)
    assert phash64_unsigned(raw) == t0


def test_phash_pair_targets_distance_and_roundtrip():
    """r16: the neardup construction — popcount stays 31 (synthesis
    precondition), pair distance is exactly 2*(q%4), base diversifier
    keeps distinct bases >= 8 bits apart, and a (unit x diversifier x
    swap) sweep round-trips bit-exact through the real DCT path."""
    from parquet_converters_spark.functions.image_fingerprint import (
        bmp_realizing_phash,
        phash64_unsigned,
        phash_pair_target,
    )

    for q in range(0, 2304, 37):  # sweeps all 8 diversifier levels
        ta, _ = phash_pair_target(8 * q)
        tb, _ = phash_pair_target(8 * q + 1)
        assert bin(ta).count("1") == 31 and bin(tb).count("1") == 31
        assert bin(ta ^ tb).count("1") == 2 * (q % 4)
    # distinct diversifier levels of the same unit: distance 8 apart
    t0, _ = phash_pair_target(8 * 0)      # q=0: unit 1, c=0
    t1, _ = phash_pair_target(8 * 36)     # q=36: unit 1, c=1 (4 swaps)
    assert bin(t0 ^ t1).count("1") == 8
    # the documented cross-unit coincidence: complementary units with
    # diversifier levels summing to 8 sit at distance 8*(c+c')-62 = 2
    from parquet_converters_spark.functions.image_fingerprint import (
        PHASH_UNITS,
    )

    ku = PHASH_UNITS.index(2)       # unit 2...
    kc = PHASH_UNITS.index(61)      # ...and its complement 63-2
    ta, _ = phash_pair_target(8 * (ku + 36 * 7))   # unit 2, c=7
    tb, _ = phash_pair_target(8 * (kc + 36 * 1))   # unit 61, c=1
    assert bin(ta ^ tb).count("1") == 2
    # real-path round-trip across units/diversifiers/swaps/amps
    for did in (0, 1, 8 * 5 + 1, 8 * 40, 8 * 40 + 1, 8 * 75 + 1,
                8 * 36 * 15, 8 * (36 * 15 + 3) + 1):
        t, a = phash_pair_target(did)
        assert phash64_unsigned(bmp_realizing_phash(t, a)) == t, did


def test_phash_synthesis_property_random_targets():
    """r16 property test: the synthesis margin argument must hold for
    ARBITRARY valid targets (exactly 31 set bits among 1..62), not
    just the census/neardup families — if integer rounding could ever
    eat the +-amp margin, a random target would expose it long before
    a crafted one."""
    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from parquet_converters_spark.functions.image_fingerprint import (
        bmp_realizing_phash,
        phash64_unsigned,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        bits=st.permutations(list(range(1, 63))),
        amp=st.sampled_from([300.0, 330.0, 360.0, 390.0, 420.0]),
    )
    def check(bits, amp):
        target = 0
        for p in bits[:31]:
            target |= 1 << p
        assert phash64_unsigned(bmp_realizing_phash(target, amp)) \
            == target

    check()
