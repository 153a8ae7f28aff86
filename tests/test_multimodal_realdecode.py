"""REAL multimodal decode legs (VERDICT r06 'what's missing' item 3).

Two layers, mirroring tests/test_h5py_crossval.py:

- ALWAYS-ON: the stdlib PNG/WAV codecs (functions/media_codecs.py)
  round-trip, and decode_media / resize_media / extract_audio_features
  run their REAL (fake=False) paths through Spark on synthetic PNG and
  WAV payloads, checked against independently computed expectations.
- AUTO-ACTIVATING: where PIL imports, our PNG decoder is
  cross-validated against PIL pixel-for-pixel on our own encodes AND
  on PIL's own re-encodes (different filter choices exercise the
  decoder's filter paths); skips cleanly elsewhere.
"""

import struct
import zlib

import pytest

from parquet_converters_spark.functions.media_codecs import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    resize_nearest,
)

try:  # auto-activating leg: real codec where available
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except Exception:
    HAVE_PIL = False


def _pattern(width, height, channels, seed=7):
    """Deterministic pixel buffer with structure (gradients + stripes)
    so resize/filter bugs can't hide in uniformity."""
    out = bytearray()
    for y in range(height):
        for x in range(width):
            for c in range(channels):
                out.append((x * 7 + y * 13 + c * 29 + seed) % 256)
    return bytes(out)


def _wave(n, rate=8000, period=25):
    """Square-ish PCM16 wave with known zero crossings."""
    return [12000 if (i // period) % 2 == 0 else -12000 for i in range(n)]


# --------------------------------------------------------------------------
# always-on: codec round-trips
# --------------------------------------------------------------------------


@pytest.mark.parametrize("channels", [1, 3, 4])
def test_png_roundtrip(channels):
    w, h = 17, 11  # deliberately non-square, non-power-of-two
    px = _pattern(w, h, channels)
    data = encode_png(w, h, channels, px)
    assert decode_png(data) == (w, h, channels, px)


def test_png_decoder_handles_all_filter_types():
    """Hand-build a PNG whose five rows use filter types 0-4 — the
    encoder only emits filter 0, so this pins the decoder's inverse
    filters independently of our encoder."""
    w, h, c = 8, 5, 1
    px = _pattern(w, h, c)
    rows = [px[y * w : (y + 1) * w] for y in range(h)]
    prev = bytes(w)
    raw = bytearray()
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        row = bytearray(rows[y])
        if ftype == 1:
            for i in range(w - 1, c - 1, -1):
                row[i] = (row[i] - row[i - c]) & 0xFF
        elif ftype == 2:
            for i in range(w):
                row[i] = (row[i] - prev[i]) & 0xFF
        elif ftype == 3:
            for i in range(w - 1, -1, -1):
                left = row[i - c] if i >= c else 0
                row[i] = (row[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:
            for i in range(w - 1, -1, -1):
                a = row[i - c] if i >= c else 0
                b = prev[i]
                cc = prev[i - c] if i >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
                row[i] = (row[i] - pred) & 0xFF
        # the filter bytes above were computed against the ORIGINAL
        # previous row, which is what the spec filters against
        raw += bytes([ftype]) + bytes(row)
        prev = rows[y]
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    data = sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    assert decode_png(data) == (w, h, c, px)


def test_png_truncation_and_garbage_rejected():
    data = encode_png(4, 4, 1, bytes(16))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" + data[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_png(data[:-8])


def test_wav_roundtrip_mono_and_stereo():
    samples = _wave(400)
    data = encode_wav(8000, samples)
    assert decode_wav(data) == (8000, 1, samples)
    stereo = [s for pair in zip(samples, samples) for s in pair]
    data2 = encode_wav(16000, stereo, channels=2)
    assert decode_wav(data2) == (16000, 2, stereo)


def test_resize_nearest_identity_and_downsample():
    w, h, c = 6, 4, 3
    px = _pattern(w, h, c)
    assert resize_nearest(w, h, c, px, w, h) == px
    small = resize_nearest(w, h, c, px, 3, 2)
    # pixel-center mapping: dst(0,0) <- src(1,1); dst(2,1) <- src(5,3)
    assert small[0:c] == px[(1 * w + 1) * c : (1 * w + 1) * c + c]
    assert small[(1 * 3 + 2) * c : (1 * 3 + 2) * c + c] == px[(3 * w + 5) * c :][:c]


# --------------------------------------------------------------------------
# always-on: the REAL (fake=False) Spark paths
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def media_df(spark):
    rows = []
    for i, (w, h, c) in enumerate([(16, 9, 3), (7, 7, 1), (12, 5, 4)]):
        payload = encode_png(w, h, c, _pattern(w, h, c, seed=i))
        rows.append((i, "image", bytearray(payload), "image/png", len(payload)))
    for i, n in enumerate([320, 801]):
        payload = encode_wav(8000 + 1000 * i, _wave(n))
        rows.append(
            (100 + i, "audio", bytearray(payload), "audio/wav", len(payload))
        )
    from parquet_converters_spark.functions.multimodal import MEDIA_SCHEMA

    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_media_real_path(spark, media_df):
    from parquet_converters_spark.functions.multimodal import decode_media

    got = {r["media_id"]: r for r in decode_media(media_df, n_features=4).collect()}
    assert len(got) == 5
    for i, (w, h, c) in enumerate([(16, 9, 3), (7, 7, 1), (12, 5, 4)]):
        r = got[i]
        assert (r["width"], r["height"], r["channels"]) == (w, h, c)
        px = _pattern(w, h, c, seed=i)
        n = len(px)
        expected0 = (sum(px[: n // 4]) / (n // 4)) / 127.5 - 1.0
        assert r["features"][0] == pytest.approx(expected0, abs=1e-6)
    for mid in (100, 101):
        r = got[mid]
        assert r["width"] is None and r["height"] is None and r["channels"] == 1
        assert all(-1.0 <= f <= 1.0 for f in r["features"])


def test_decode_media_unsupported_format_raises(spark, media_df):
    from pyspark.sql import functions as F

    from parquet_converters_spark.functions.multimodal import decode_media

    # Ogg: a real format outside the codec table, rejected BY NAME
    # (TIFF — the previous example here — decodes from spec since r12)
    bad = media_df.withColumn("payload", F.lit(bytearray(b"OggS....")))
    with pytest.raises(Exception, match="Ogg"):
        decode_media(bad).collect()
    # something with no known magic still gets the generic trailer
    junk = media_df.withColumn("payload", F.lit(bytearray(b"????....")))
    with pytest.raises(Exception, match="need PIL/ffmpeg"):
        decode_media(junk).collect()
    # a truncated TIFF is malformed, not unsupported
    tiff = media_df.withColumn("payload", F.lit(bytearray(b"II*\x00....")))
    with pytest.raises(Exception, match="TIFF"):
        decode_media(tiff).collect()


def test_resize_media_real_path(spark, media_df):
    from parquet_converters_spark.functions.multimodal import resize_media

    imgs = media_df.filter("media_type = 'image'")
    got = {
        r["media_id"]: bytes(r["payload"])
        for r in resize_media(imgs, width=8, height=6).collect()
    }
    for i, (w, h, c) in enumerate([(16, 9, 3), (7, 7, 1), (12, 5, 4)]):
        px = _pattern(w, h, c, seed=i)
        expected = encode_png(8, 6, c, resize_nearest(w, h, c, px, 8, 6))
        assert got[i] == expected  # byte-identical, platform-free


def test_audio_features_real_path(spark, media_df):
    from parquet_converters_spark.functions.multimodal import (
        extract_audio_features,
    )

    audio = media_df.filter("media_type = 'audio'")
    rows = extract_audio_features(audio, n_frames=4).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    assert set(by_id) == {100, 101} and all(len(v) == 4 for v in by_id.values())
    # square wave at +/-12000: every frame's energy is exactly
    # (12000/32768)^2; zcr is crossings/(len-1) with a crossing every
    # `period` samples
    for mid, n in ((100, 320), (101, 801)):
        samples = _wave(n)
        for r in sorted(by_id[mid], key=lambda r: r["frame_idx"]):
            i = r["frame_idx"]
            lo, hi = i * n // 4, max((i + 1) * n // 4, i * n // 4 + 1)
            win = samples[lo:hi]
            assert r["energy"] == pytest.approx(
                sum(s * s for s in win) / len(win) / 32768.0**2, rel=1e-12
            )
            crossings = sum(
                1 for a, b in zip(win, win[1:]) if (a >= 0) != (b >= 0)
            )
            assert r["zcr"] == pytest.approx(
                crossings / max(len(win) - 1, 1), rel=1e-12
            )
            assert r["sample_rate"] == 8000 + 1000 * (mid - 100)
            assert r["duration_s"] == pytest.approx(
                n / (8000 + 1000 * (mid - 100))
            )


# --------------------------------------------------------------------------
# auto-activating: PIL cross-validation (the test_h5py_crossval pattern)
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# always-on: baseline JPEG codec (functions/jpeg_codec.py, VERDICT r07
# item 5 / r08 item 6 — the dominant web-corpus image format)
# --------------------------------------------------------------------------


def _psnr(a, b):
    import math

    mse = sum((x - y) ** 2 for x, y in zip(a, b)) / len(a)
    return 99.0 if mse == 0 else 10 * math.log10(255.0**2 / mse)


def _smooth(w, h, channels):
    """Wrap-free gradient (natural-image-like): the right fixture for
    PSNR floors — _pattern's mod-256 sawtooth has full-amplitude chroma
    edges that any 4:2:0 codec legitimately blurs."""
    out = bytearray()
    for y in range(h):
        for x in range(w):
            for c in range(channels):
                out.append(
                    min(
                        255,
                        (x * 200) // max(w - 1, 1)
                        + (y * 55) // max(h - 1, 1)
                        + c * 17,
                    )
                )
    return bytes(out)


def test_jpeg_roundtrip_quality():
    """Lossy round-trips at sane PSNR — grayscale, 4:4:4 on a hard
    sawtooth, 4:2:0 on a smooth gradient (chroma loss expected on
    edges, tight on natural-image-like content)."""
    from parquet_converters_spark.functions.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
        is_jpeg,
    )

    w, h = 37, 23  # non-multiple-of-16: exercises edge replication
    gray = _pattern(w, h, 1)
    data = encode_jpeg(w, h, 1, gray, quality=90)
    assert is_jpeg(data)
    W, H, C, out = decode_jpeg(data)
    assert (W, H, C) == (w, h, 1)
    assert _psnr(gray, out) > 30.0
    rgb = _pattern(w, h, 3)
    W, H, C, out = decode_jpeg(
        encode_jpeg(w, h, 3, rgb, quality=90, subsampling="4:4:4")
    )
    assert (W, H, C) == (w, h, 3)
    assert _psnr(rgb, out) > 30.0
    smooth = _smooth(w, h, 3)
    W, H, C, out = decode_jpeg(
        encode_jpeg(w, h, 3, smooth, quality=90, subsampling="4:2:0")
    )
    assert (W, H, C) == (w, h, 3)
    assert _psnr(smooth, out) > 30.0


def test_jpeg_flat_color_nearly_exact():
    """A uniform block is DC-only — quantization cannot move it more
    than rounding, so round-trip error must be <= 1 count/channel."""
    from parquet_converters_spark.functions.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
    )

    w, h = 16, 16
    px = bytes([120, 64, 200]) * (w * h)
    _, _, _, out = decode_jpeg(encode_jpeg(w, h, 3, px, quality=90))
    assert max(abs(a - b) for a, b in zip(px, out)) <= 1


def test_jpeg_restart_markers_do_not_change_pixels():
    """DRI/RSTn segmentation changes the byte stream (predictor resets,
    byte alignment) but NOT the quantized coefficients — decoded pixels
    must be identical with and without restarts."""
    from parquet_converters_spark.functions.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
    )

    w, h = 40, 24
    px = _pattern(w, h, 3)
    plain = encode_jpeg(w, h, 3, px, quality=85, subsampling="4:2:0")
    rst = encode_jpeg(
        w, h, 3, px, quality=85, subsampling="4:2:0", restart_interval=2
    )
    assert plain != rst and b"\xff\xdd" in rst  # DRI present
    assert decode_jpeg(plain) == decode_jpeg(rst)


def test_jpeg_fill_bytes_before_markers_tolerated():
    """Spec B.1.1.2: any marker may be preceded by any number of 0xFF
    fill bytes.  Inject fills before segment markers, every RSTn, and
    EOI — decoded pixels must be identical to the unpadded stream."""
    from parquet_converters_spark.functions.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
    )

    w, h = 40, 24
    px = _pattern(w, h, 3)
    base = encode_jpeg(
        w, h, 3, px, quality=85, subsampling="4:2:0", restart_interval=2
    )
    want = decode_jpeg(base)
    # fills before a table/frame segment marker (right after SOI)
    assert decode_jpeg(base[:2] + b"\xff\xff\xff" + base[2:]) == want
    # fills before every RSTn inside the scan and before EOI
    sos = base.find(b"\xff\xda")
    assert sos > 0
    out = bytearray(base[:sos])
    i = sos
    while i < len(base):
        if (
            base[i] == 0xFF
            and i + 1 < len(base)
            and (0xD0 <= base[i + 1] <= 0xD7 or base[i + 1] == 0xD9)
        ):
            out += b"\xff\xff"
            out += base[i : i + 2]
            i += 2
        else:
            out.append(base[i])
            i += 1
    assert decode_jpeg(bytes(out)) == want


def test_jpeg_bitio_accumulator_stays_bounded():
    """The entropy bit reader/writer must trim consumed bits: an
    unbounded Python-int accumulator makes bit I/O O(n^2) in scan size
    — an executor-stalling DoS on large/hostile scans well inside the
    _MAX_PIXELS guard."""
    from parquet_converters_spark.functions.jpeg_codec import (
        _BitReader,
        _BitWriter,
    )

    br = _BitReader(bytes(4096), 0)  # 4 KiB of zero bytes, no markers
    for _ in range(4096 * 8):
        br.read_bit()
    assert br.acc.bit_length() <= 8
    bw = _BitWriter()
    for i in range(32768):
        bw.write(i & 1, 1)
    assert bw.acc.bit_length() <= 8


def test_jpeg_unsupported_modes_named_precisely():
    """The gate error names the exact unsupported mode.  (Progressive
    SOF2 moved from this list to IMPLEMENTED in r9 — see
    test_jpeg_progressive_* below.)"""
    import struct as _s

    from parquet_converters_spark.functions.jpeg_codec import decode_jpeg

    def sof(marker):
        body = _s.pack(">BHHB", 8, 16, 16, 1) + bytes([1, 0x11, 0])
        return (
            b"\xff\xd8"
            + bytes([0xFF, marker])
            + _s.pack(">H", 2 + len(body))
            + body
        )

    with pytest.raises(NotImplementedError, match="extended sequential"):
        decode_jpeg(sof(0xC1))
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(sof(0xC9))
    with pytest.raises(NotImplementedError, match="lossless"):
        decode_jpeg(sof(0xC3))


def test_jpeg_progressive_bitidentical_to_baseline():
    """Progressive (SOF2) decode must be BIT-IDENTICAL to the baseline
    decode of the same image/quality: the successive-approximation
    ladder (coarse DC -> DC refine -> AC bands 1-5/6-63 at Al=1 -> AC
    refine) is a lossless re-encoding of the same quantized
    coefficients, so any decoder divergence is a real Annex G bug.
    Covers all four progressive scan types in one assertion, per
    config: grayscale, 4:4:4, and 4:2:0 color."""
    from parquet_converters_spark.functions.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
    )

    w, h = 37, 23  # partial MCUs: padded blocks excluded from AC scans
    gray = _pattern(w, h, 1)
    assert decode_jpeg(
        encode_jpeg(w, h, 1, gray, quality=90, progressive=True)
    ) == decode_jpeg(encode_jpeg(w, h, 1, gray, quality=90))
    rgb = _pattern(w, h, 3)
    for sub in ("4:4:4", "4:2:0"):
        prog = encode_jpeg(
            w, h, 3, rgb, quality=88, subsampling=sub, progressive=True
        )
        assert b"\xff\xc2" in prog and prog.count(b"\xff\xda") >= 5
        assert decode_jpeg(prog) == decode_jpeg(
            encode_jpeg(w, h, 3, rgb, quality=88, subsampling=sub)
        )


def test_jpeg_progressive_ac_refine_paths():
    """Force the hairy AC-refinement cases: a sparse high-frequency
    image produces long zero runs (ZRL-with-correction-bits) and
    coefficients that only become significant in the refinement scan
    (|coef| == 1 at full precision -> 0 at Al=1 -> newly significant
    at Al=0)."""
    from parquet_converters_spark.functions.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
    )

    w, h = 48, 32
    # mostly-flat with isolated impulses: quantized spectra are sparse
    # with many +-1s — exactly what drives EOB runs and late significance
    px = bytearray([128]) * (w * h)
    for i, (x, y) in enumerate(
        [(3, 2), (17, 9), (30, 20), (44, 5), (9, 29), (25, 14)]
    ):
        px[y * w + x] = 128 + (60 if i % 2 else -60)
    px = bytes(px)
    for q in (92, 60):
        prog = encode_jpeg(w, h, 1, px, quality=q, progressive=True)
        assert decode_jpeg(prog) == decode_jpeg(
            encode_jpeg(w, h, 1, px, quality=q)
        )


def test_jpeg_progressive_with_restart_markers():
    """Progressive + DRI/RSTn (restarts reset DC predictors AND EOB-run
    state mid-scan, in both interleaved DC scans and per-component AC
    scans) must still decode bit-identical to the baseline decode."""
    from parquet_converters_spark.functions.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
    )

    w, h = 40, 24
    for c, sub in ((1, "4:4:4"), (3, "4:2:0")):
        px = _pattern(w, h, c)
        base = decode_jpeg(
            encode_jpeg(w, h, c, px, quality=88, subsampling=sub)
        )
        rst = encode_jpeg(
            w, h, c, px, quality=88, subsampling=sub,
            progressive=True, restart_interval=2,
        )
        assert b"\xff\xdd" in rst and b"\xff\xd0" in rst
        assert decode_jpeg(rst) == base


def test_jpeg_progressive_crossblock_eob_runs():
    """Hand-built SOF2 stream pinning the MULTI-block EOB-run paths
    (spec G.2) that real-world encoders (libjpeg optimized tables)
    emit but our per-block-EOB encoder never does: an AC-first EOBRUN
    spanning two blocks, and an AC-refinement EOBRUN whose entry sweep
    consumes correction bits for a previously-significant coefficient."""
    import struct as _s

    from parquet_converters_spark.functions.jpeg_codec import (
        _BitWriter,
        _build_codes,
        _DC_LUMA_BITS,
        _DC_LUMA_VALS,
        _clamp8,
        _idct8x8,
        ZIGZAG,
        decode_jpeg,
    )

    w, h = 16, 8  # two 8x8 luma blocks
    qt = [16] * 64
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + _s.pack(">H", 67) + bytes([0]) + bytes(qt)
    sof = _s.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc2" + _s.pack(">H", 2 + len(sof)) + sof
    # DC table: standard luma.  AC table (th=1): just two symbols —
    # 0x01 (run 0, size 1) at code length 1 and 0x10 (EOB-run, r=1)
    # at length 2.
    dht = bytes([0x00]) + bytes(_DC_LUMA_BITS) + bytes(_DC_LUMA_VALS)
    out += b"\xff\xc4" + _s.pack(">H", 2 + len(dht)) + dht
    ac_bits = [1, 1] + [0] * 14
    ac_vals = [0x01, 0x10]
    dht2 = bytes([0x11]) + bytes(ac_bits) + bytes(ac_vals)
    out += b"\xff\xc4" + _s.pack(">H", 2 + len(dht2)) + dht2
    dc_codes = _build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_codes = _build_codes(ac_bits, ac_vals)

    def sos(ss, se, ah, al):
        body = bytes([1, 1, 0x01, ss, se, (ah << 4) | al])
        return b"\xff\xda" + _s.pack(">H", 2 + len(body)) + body

    # scan 1: DC first, Al=0 — diff 0 for both blocks
    out += sos(0, 0, 0, 0)
    bw = _BitWriter()
    c, ln = dc_codes[0]
    bw.write(c, ln)
    bw.write(c, ln)
    out += bw.flush()
    # scan 2: AC first, Al=1.  Block 1: (r=0,s=1) coeff +1 at k=1
    # (-> 2 after <<Al), then EOBRUN r=1 with bit 0 -> eobrun = 1:
    # ends block 1 AND covers block 2 (cross-block run).
    out += sos(1, 63, 0, 1)
    bw = _BitWriter()
    c, ln = ac_codes[0x01]
    bw.write(c, ln)
    bw.write(1, 1)  # magnitude bit: +1
    c, ln = ac_codes[0x10]
    bw.write(c, ln)
    bw.write(0, 1)  # eobrun = (1<<1) - 1 + 0 = 1
    out += bw.flush()
    # scan 3: AC refinement, Al=0.  EOBRUN r=1 (+bit 0 -> covers 2
    # blocks); block 1's entry sweep must consume ONE correction bit
    # for the k=1 coefficient (bit 1 -> 2 becomes 3); block 2 sweeps
    # nothing.
    out += sos(1, 63, 1, 0)
    bw = _BitWriter()
    c, ln = ac_codes[0x10]
    bw.write(c, ln)
    bw.write(0, 1)  # eobrun = (1<<1) + 0 = 2
    bw.write(1, 1)  # correction bit for block 1's k=1 coefficient
    out += bw.flush()
    out += b"\xff\xd9"

    W, H, C, px = decode_jpeg(bytes(out))
    assert (W, H, C) == (w, h, 1)
    # expected: block 1 has natural coefficient ZIGZAG[1] = 3 * qt = 48,
    # block 2 is flat zero (DC 0 -> 128 gray)
    coef = [0.0] * 64
    coef[ZIGZAG[1]] = 3 * 16
    blk = [_clamp8(v + 128.0) for v in _idct8x8(coef)]
    for y in range(8):
        assert list(px[y * w : y * w + 8]) == blk[y * 8 : y * 8 + 8]
        assert all(v == 128 for v in px[y * w + 8 : y * w + 16])


def test_jpeg_16bit_quant_tables_decode():
    """Rewrite a valid stream's 8-bit DQT as the equivalent 16-bit
    (Pq=1) table — decoded pixels must be identical (spec B.2.4.1)."""
    from parquet_converters_spark.functions.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
    )

    w, h = 24, 16
    px = _pattern(w, h, 1)
    data = encode_jpeg(w, h, 1, px, quality=85)
    at = data.index(b"\xff\xdb")
    (seglen,) = struct.unpack(">H", data[at + 2 : at + 4])
    assert seglen == 3 + 64  # one 8-bit table
    tq = data[at + 4]
    vals = data[at + 5 : at + 5 + 64]
    wide = b"\xff\xdb" + struct.pack(">H", 3 + 128) + bytes([(1 << 4) | tq])
    wide += b"".join(struct.pack(">H", v) for v in vals)
    patched = data[:at] + wide + data[at + 2 + seglen :]
    assert decode_jpeg(patched) == decode_jpeg(data)


def test_jpeg_truncation_and_garbage_rejected():
    from parquet_converters_spark.functions.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
    )

    data = encode_jpeg(16, 16, 1, bytes(256), quality=85)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"JUNK" + data[4:])
    with pytest.raises(ValueError):
        decode_jpeg(data[: len(data) // 2])


@pytest.fixture(scope="module")
def jpeg_media_df(spark):
    from parquet_converters_spark.functions.jpeg_codec import encode_jpeg
    from parquet_converters_spark.functions.multimodal import MEDIA_SCHEMA

    rows = []
    specs = [(32, 20, 3, "4:2:0"), (17, 9, 3, "4:4:4"), (16, 16, 1, "4:4:4")]
    for i, (w, h, c, sub) in enumerate(specs):
        payload = encode_jpeg(
            w, h, c, _pattern(w, h, c, seed=i), quality=88, subsampling=sub
        )
        rows.append(
            (200 + i, "image", bytearray(payload), "image/jpeg", len(payload))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA), specs


def test_decode_media_real_path_jpeg(spark, jpeg_media_df):
    """The Spark fake=False decode path runs REAL on JPEG payloads:
    dimensions from the frame header, features = band-luminance means
    over the decoded pixels (bit-identical to a local decode)."""
    from parquet_converters_spark.functions.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
    )
    from parquet_converters_spark.functions.multimodal import (
        _band_features,
        decode_media,
    )

    df, specs = jpeg_media_df
    got = {r["media_id"]: r for r in decode_media(df, n_features=4).collect()}
    assert len(got) == 3
    for i, (w, h, c, sub) in enumerate(specs):
        r = got[200 + i]
        assert (r["width"], r["height"], r["channels"]) == (w, h, c)
        payload = encode_jpeg(
            w, h, c, _pattern(w, h, c, seed=i), quality=88, subsampling=sub
        )
        _, _, _, pixels = decode_jpeg(payload)
        expected = _band_features(pixels, 4)
        assert r["features"] == pytest.approx(expected, abs=1e-6)


def test_resize_media_real_path_jpeg(spark, jpeg_media_df):
    """resize_media on JPEG payloads: decode -> integer-exact nearest
    resample -> re-encode as JPEG — byte-identical to a local run."""
    from parquet_converters_spark.functions.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
    )
    from parquet_converters_spark.functions.multimodal import resize_media

    df, specs = jpeg_media_df
    got = {
        r["media_id"]: bytes(r["payload"])
        for r in resize_media(df, width=8, height=6).collect()
    }
    for i, (w, h, c, sub) in enumerate(specs):
        payload = encode_jpeg(
            w, h, c, _pattern(w, h, c, seed=i), quality=88, subsampling=sub
        )
        w0, h0, c0, pixels = decode_jpeg(payload)
        expected = encode_jpeg(
            8, 6, c0, resize_nearest(w0, h0, c0, pixels, 8, 6)
        )
        assert got[200 + i] == expected
        assert decode_jpeg(got[200 + i])[:3] == (8, 6, c0)


def test_jdk_imageio_seam_adapter(spark, jpeg_media_df):
    """The shipped JDK ImageIO adapter (functions/native_codecs.py,
    r11) plugs into decode_media(decoder=...): JPEG/GIF route through
    a persistent javax.imageio bridge subprocess on each executor,
    everything else through the from-spec table.  Dims must match the
    from-spec path exactly; JPEG features within the documented
    decoders-agree IDCT tolerance."""
    import shutil

    if not (shutil.which("javac") and shutil.which("java")):
        pytest.skip("JDK (java+javac) not on PATH")
    from parquet_converters_spark.functions.multimodal import decode_media
    from parquet_converters_spark.functions.native_codecs import (
        jdk_imageio_media_decoder,
    )

    df, specs = jpeg_media_df
    dec = jdk_imageio_media_decoder()
    got = decode_media(df, n_features=4, decoder=dec)
    assert got.schema == decode_media(df, n_features=4).schema
    by_id = {r["media_id"]: r for r in got.collect()}
    ref = {r["media_id"]: r for r in decode_media(df, n_features=4).collect()}
    assert by_id.keys() == ref.keys() and len(by_id) == 3
    for mid, r in by_id.items():
        assert (r["width"], r["height"], r["channels"]) == (
            ref[mid]["width"], ref[mid]["height"], ref[mid]["channels"]
        )
        # ±2/sample IDCT slack -> generous feature-mean tolerance
        assert r["features"] == pytest.approx(
            ref[mid]["features"], abs=2.5
        )


def test_native_codec_swap_seam(spark, jpeg_media_df):
    """The SCALE.md-claimed one-function native-codec seam is a real,
    supported parameter: injecting a stub 'native' decoder/resizer
    switches every executor's decode path while the Spark contract
    (schema, 1:1 row shape, Arrow batching) stays identical."""
    from parquet_converters_spark.functions.multimodal import (
        decode_media,
        resize_media,
    )

    # defined inside the test so cloudpickle ships them BY VALUE to the
    # executors (module-level test functions pickle by reference, and
    # workers cannot import the test module) — a real native wrapper
    # would live in an installed package and pickle by reference
    def _native_stub_decoder(payload: bytes, n_features: int):
        return 640, 480, 3, [7.0] * n_features

    def _native_stub_resizer(payload: bytes, width: int, height: int):
        import hashlib

        return b"NATIVE" + hashlib.md5(payload).digest()[:4]

    df, specs = jpeg_media_df
    # decode_media: output provably came from the injected decoder
    got = decode_media(df, n_features=4, decoder=_native_stub_decoder)
    rows = got.collect()
    assert got.schema == decode_media(df, n_features=4).schema
    assert len(rows) == 3
    for r in rows:
        assert (r["width"], r["height"], r["channels"]) == (640, 480, 3)
        assert r["features"] == [7.0] * 4
    # resize_media: payloads provably came from the injected resizer
    out = resize_media(df, width=8, height=6, resizer=_native_stub_resizer)
    rows = out.collect()
    assert out.schema == resize_media(df, width=8, height=6).schema
    assert len(rows) == 3
    import hashlib

    originals = {r["media_id"]: bytes(r["payload"]) for r in df.collect()}
    for r in rows:
        expect = b"NATIVE" + hashlib.md5(originals[r["media_id"]]).digest()[:4]
        assert bytes(r["payload"]) == expect
        assert (r["width"], r["height"]) == (8, 6)
    # and the default (no kwarg) path still routes through the stdlib
    # table — the stub's sentinel dims must NOT appear
    dflt = decode_media(df, n_features=4).collect()
    assert all((r["width"], r["height"]) != (640, 480) for r in dflt)


# --------------------------------------------------------------------------
# always-on: BMP (media_codecs.py) — lossless, trivially spec-complete
# --------------------------------------------------------------------------


def test_bmp_roundtrip_rgb_and_rgba():
    from parquet_converters_spark.functions.media_codecs import (
        decode_bmp,
        encode_bmp,
    )

    w, h = 13, 7  # odd width exercises the 4-byte row padding
    for c in (3, 4):
        px = _pattern(w, h, c)
        data = encode_bmp(w, h, c, px)
        assert decode_bmp(data) == (w, h, c, px)
        assert encode_bmp(w, h, c, px) == data  # deterministic


def test_bmp_32bit_zero_reserved_byte_is_opaque():
    """Standard 32-bit BI_RGB writers zero the reserved 4th byte; such
    files must decode opaque (alpha=255), not fully transparent.  A file
    with any nonzero 4th byte keeps it verbatim (our own encoder's
    round-trip semantics)."""
    from parquet_converters_spark.functions.media_codecs import (
        decode_bmp,
        encode_bmp,
    )

    w, h = 5, 3
    rgb = _pattern(w, h, 3)
    # build RGBA with every alpha zero — the standard BI_RGB shape
    px = bytearray()
    for i in range(w * h):
        px += rgb[3 * i : 3 * i + 3] + b"\x00"
    W, H, C, got = decode_bmp(encode_bmp(w, h, 4, bytes(px)))
    assert (W, H, C) == (w, h, 4)
    assert got[3::4] == b"\xff" * (w * h)
    for ch in range(3):
        assert got[ch::4] == rgb[ch::3]
    # one nonzero alpha anywhere -> plane is meaningful, kept verbatim
    px[3] = 1
    assert decode_bmp(encode_bmp(w, h, 4, bytes(px)))[3] == bytes(px)


def test_bmp_8bit_palette_and_topdown():
    """Hand-built 8-bit palette BMP and a top-down (negative height)
    24-bit BMP — shapes our encoder never writes."""
    import struct as _s

    from parquet_converters_spark.functions.media_codecs import decode_bmp

    # 8-bit: 4x2, palette of 3 colors (BGRA entries), bottom-up
    w, h = 4, 2
    pal = bytes([10, 20, 30, 0, 40, 50, 60, 0, 70, 80, 90, 0])
    idx_rows = [bytes([0, 1, 2, 1]), bytes([2, 2, 0, 0])]  # y=1, y=0 (bottom-up)
    body = idx_rows[1] + idx_rows[0]  # stride 4 == width, no pad
    off = 14 + 40 + len(pal)
    info = _s.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(body), 0, 0, 3, 0)
    data = b"BM" + _s.pack("<IHHI", off + len(body), 0, 0, off) + info + pal + body
    W, H, C, px = decode_bmp(data)
    assert (W, H, C) == (w, h, 3)
    # row y=0 is idx_rows[0] = [0,1,2,1] -> RGB from BGRA palette
    assert px[0:3] == bytes([30, 20, 10]) and px[3:6] == bytes([60, 50, 40])
    # top-down 24-bit: negative height, first stored row IS row 0
    w2, h2 = 2, 2
    rows = [bytes([1, 2, 3, 4, 5, 6]) + b"\x00\x00",  # y0: BGR BGR pad
            bytes([7, 8, 9, 10, 11, 12]) + b"\x00\x00"]
    info2 = _s.pack("<IiiHHIIiiII", 40, w2, -h2, 1, 24, 0, 16, 0, 0, 0, 0)
    data2 = b"BM" + _s.pack("<IHHI", 14 + 40 + 16, 0, 0, 54) + info2 + b"".join(rows)
    W, H, C, px2 = decode_bmp(data2)
    assert (W, H, C) == (w2, h2, 3)
    assert px2[0:3] == bytes([3, 2, 1])  # (0,0) = first stored row, RGB
    assert px2[6:9] == bytes([9, 8, 7])  # (0,1)


def test_bmp_unsupported_named():
    import struct as _s

    from parquet_converters_spark.functions.media_codecs import decode_bmp

    info = _s.pack("<IiiHHIIiiII", 40, 4, 4, 1, 8, 1, 0, 0, 0, 0, 0)
    data = b"BM" + _s.pack("<IHHI", 100, 0, 0, 54) + info + bytes(46)
    with pytest.raises(NotImplementedError, match="RLE8"):
        decode_bmp(data)
    with pytest.raises(ValueError, match="signature"):
        decode_bmp(b"XX" + bytes(60))


def test_decode_and_resize_media_real_path_bmp(spark):
    from parquet_converters_spark.functions.media_codecs import (
        decode_bmp,
        encode_bmp,
        resize_nearest,
    )
    from parquet_converters_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        _band_features,
        decode_media,
        resize_media,
    )

    w, h = 14, 9
    px = _pattern(w, h, 3)
    payload = encode_bmp(w, h, 3, px)
    df = spark.createDataFrame(
        [(400, "image", bytearray(payload), "image/bmp", len(payload))],
        MEDIA_SCHEMA,
    )
    r = decode_media(df, n_features=4).collect()[0]
    assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
    assert r["features"] == pytest.approx(_band_features(px, 4), abs=1e-6)
    got = bytes(resize_media(df, width=6, height=4).collect()[0]["payload"])
    assert got == encode_bmp(6, 4, 3, resize_nearest(w, h, 3, px, 6, 4))
    assert decode_bmp(got)[:3] == (6, 4, 3)


@pytest.mark.skipif(not HAVE_PIL, reason="PIL not installed")
def test_bmp_crossval_pil_both_ways():
    import io

    from parquet_converters_spark.functions.media_codecs import (
        decode_bmp,
        encode_bmp,
    )

    w, h = 13, 7
    px = _pattern(w, h, 3)
    img = Image.open(io.BytesIO(encode_bmp(w, h, 3, px)))
    assert img.size == (w, h) and img.convert("RGB").tobytes() == px
    buf = io.BytesIO()
    Image.frombytes("RGB", (w, h), px).save(buf, format="BMP")
    assert decode_bmp(buf.getvalue()) == (w, h, 3, px)


# --------------------------------------------------------------------------
# always-on: MJPEG-in-AVI video (functions/avi_codec.py) — the REAL
# sample_frames path (previously ffmpeg-gated fake-only)
# --------------------------------------------------------------------------


def _mjpeg_avi(n_frames=9, fps=4.0, w=32, h=24, seed0=0):
    from parquet_converters_spark.functions.avi_codec import encode_avi_mjpeg
    from parquet_converters_spark.functions.jpeg_codec import encode_jpeg

    frames = [
        encode_jpeg(w, h, 3, _pattern(w, h, 3, seed=seed0 + i), quality=85)
        for i in range(n_frames)
    ]
    return encode_avi_mjpeg(frames, fps=fps), frames


def test_avi_mjpeg_roundtrip_and_determinism():
    from parquet_converters_spark.functions.avi_codec import (
        encode_avi_mjpeg,
        is_avi,
        parse_avi_mjpeg,
    )

    avi, frames = _mjpeg_avi()
    assert is_avi(avi)
    fps, got = parse_avi_mjpeg(avi)
    assert fps == pytest.approx(4.0)
    assert got == frames  # frame payloads byte-identical through RIFF
    assert encode_avi_mjpeg(frames, fps=4.0) == avi
    # odd-length frame payloads force the RIFF word-alignment path
    # (the container carries them verbatim; no decode involved)
    odd = [f if len(f) % 2 else f[:-1] for f in frames[:2]]
    assert all(len(f) % 2 for f in odd)
    _, got2 = parse_avi_mjpeg(encode_avi_mjpeg(odd, fps=2.0, width=32, height=24))
    assert got2 == odd


def test_avi_non_mjpeg_codec_named():
    from parquet_converters_spark.functions.avi_codec import parse_avi_mjpeg

    avi, _ = _mjpeg_avi(n_frames=1)
    with pytest.raises(NotImplementedError, match="H264"):
        parse_avi_mjpeg(avi.replace(b"MJPG", b"H264"))
    with pytest.raises(ValueError, match="RIFF/AVI"):
        parse_avi_mjpeg(b"JUNK" + avi[4:])


def test_sample_frames_real_path(spark):
    """fake=False samples REAL MJPEG-AVI frames: every
    round(every_ms*fps/1000)-th frame up to max_frames, payloads =
    the container's raw baseline JPEGs (decodable downstream)."""
    from parquet_converters_spark.functions.jpeg_codec import decode_jpeg
    from parquet_converters_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        sample_frames,
    )

    avi, frames = _mjpeg_avi(n_frames=9, fps=4.0)  # 250 ms/frame
    df = spark.createDataFrame(
        [(7, "video", bytearray(avi), "video/x-msvideo", len(avi))],
        MEDIA_SCHEMA,
    )
    # every_ms=500 at 4 fps -> step 2 -> source frames 0,2,4,6 (max 4)
    got = sorted(
        sample_frames(df, every_ms=500, max_frames=4).collect(),
        key=lambda r: r["frame_index"],
    )
    assert [r["frame_index"] for r in got] == [0, 1, 2, 3]
    assert [r["frame_ts_ms"] for r in got] == [0, 500, 1000, 1500]
    for i, r in enumerate(got):
        assert bytes(r["payload"]) == frames[2 * i]
        assert decode_jpeg(bytes(r["payload"]))[:3] == (32, 24, 3)


def test_sample_frames_non_avi_raises(spark):
    from parquet_converters_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        sample_frames,
    )

    df = spark.createDataFrame(
        [(1, "video", bytearray(b"\x00\x01\x02movie"), "video/mp4", 8)],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="MJPEG-in-AVI"):
        sample_frames(df).collect()


def test_decode_media_real_path_video_first_frame(spark):
    """decode_media on an AVI payload reports the first frame's
    dims/features (the thumbnail convention)."""
    from parquet_converters_spark.functions.jpeg_codec import decode_jpeg
    from parquet_converters_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        _band_features,
        decode_media,
    )

    avi, frames = _mjpeg_avi(n_frames=3, fps=2.0)
    df = spark.createDataFrame(
        [(9, "video", bytearray(avi), "video/x-msvideo", len(avi))],
        MEDIA_SCHEMA,
    )
    r = decode_media(df, n_features=4).collect()[0]
    assert (r["width"], r["height"], r["channels"]) == (32, 24, 3)
    _, _, _, pixels = decode_jpeg(frames[0])
    assert r["features"] == pytest.approx(_band_features(pixels, 4), abs=1e-6)


# --------------------------------------------------------------------------
# auto-activating: PIL cross-validation (the test_h5py_crossval pattern)
# --------------------------------------------------------------------------


@pytest.mark.skipif(not HAVE_PIL, reason="PIL not installed")
@pytest.mark.parametrize("channels,mode", [(1, "L"), (3, "RGB")])
def test_jpeg_crossval_pil_reads_ours(channels, mode):
    """PIL/libjpeg must decode our encodes to nearly the same pixels
    (tolerance: libjpeg's integer islow IDCT vs our float IDCT; 4:4:4
    so no upsampling-filter divergence)."""
    import io

    from parquet_converters_spark.functions.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
    )

    w, h = 24, 16
    px = _pattern(w, h, channels)
    data = encode_jpeg(w, h, channels, px, quality=90, subsampling="4:4:4")
    img = Image.open(io.BytesIO(data))
    assert img.size == (w, h) and img.mode == mode
    theirs = img.tobytes()
    _, _, _, ours = decode_jpeg(data)
    assert max(abs(a - b) for a, b in zip(theirs, ours)) <= 2


@pytest.mark.skipif(not HAVE_PIL, reason="PIL not installed")
@pytest.mark.parametrize("channels,mode", [(1, "L"), (3, "RGB")])
def test_jpeg_crossval_we_read_pils(channels, mode):
    """Our decoder must read PIL's own encodes (real libjpeg streams:
    optimized tables off, 4:4:4) to nearly PIL's own decode."""
    import io

    from parquet_converters_spark.functions.jpeg_codec import decode_jpeg

    w, h = 24, 16
    px = _pattern(w, h, channels)
    buf = io.BytesIO()
    Image.frombytes(mode, (w, h), px).save(
        buf, format="JPEG", quality=90, subsampling=0
    )
    data = buf.getvalue()
    theirs = Image.open(io.BytesIO(data)).tobytes()
    W, H, C, ours = decode_jpeg(data)
    assert (W, H, C) == (w, h, channels)
    assert max(abs(a - b) for a, b in zip(theirs, ours)) <= 2


@pytest.mark.skipif(not HAVE_PIL, reason="PIL not installed")
@pytest.mark.parametrize("channels,mode", [(1, "L"), (3, "RGB")])
def test_jpeg_crossval_progressive_both_ways(channels, mode):
    """Progressive cross-validation: PIL/libjpeg must decode our SOF2
    ladder to nearly our pixels, and our decoder must read libjpeg's
    own progressive output (optimized tables, real cross-block EOB
    runs, successive approximation) to nearly PIL's decode."""
    import io

    from parquet_converters_spark.functions.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
    )

    w, h = 24, 16
    px = _pattern(w, h, channels)
    ours = encode_jpeg(
        w, h, channels, px, quality=90, subsampling="4:4:4", progressive=True
    )
    img = Image.open(io.BytesIO(ours))
    assert img.size == (w, h) and img.mode == mode
    _, _, _, mine = decode_jpeg(ours)
    assert max(abs(a - b) for a, b in zip(img.tobytes(), mine)) <= 2
    buf = io.BytesIO()
    Image.frombytes(mode, (w, h), px).save(
        buf, format="JPEG", quality=90, subsampling=0, progressive=True
    )
    data = buf.getvalue()
    assert b"\xff\xc2" in data
    theirs = Image.open(io.BytesIO(data)).tobytes()
    W, H, C, got = decode_jpeg(data)
    assert (W, H, C) == (w, h, channels)
    assert max(abs(a - b) for a, b in zip(theirs, got)) <= 2


@pytest.mark.skipif(not HAVE_PIL, reason="PIL not installed")
@pytest.mark.parametrize("channels,mode", [(1, "L"), (3, "RGB"), (4, "RGBA")])
def test_png_crossval_pil_reads_ours(channels, mode):
    """PIL must read our encodes to the identical pixel matrix."""
    import io

    w, h = 19, 13
    px = _pattern(w, h, channels)
    img = Image.open(io.BytesIO(encode_png(w, h, channels, px)))
    assert img.size == (w, h) and img.mode == mode
    assert img.tobytes() == px


@pytest.mark.skipif(not HAVE_PIL, reason="PIL not installed")
@pytest.mark.parametrize("channels,mode", [(1, "L"), (3, "RGB"), (4, "RGBA")])
def test_png_crossval_we_read_pils(channels, mode):
    """Our decoder must read PIL's own encodes (PIL picks real row
    filters, exercising the inverse-filter paths on foreign data)."""
    import io

    w, h = 19, 13
    px = _pattern(w, h, channels)
    buf = io.BytesIO()
    Image.frombytes(mode, (w, h), px).save(buf, format="PNG")
    assert decode_png(buf.getvalue()) == (w, h, channels, px)


def test_jdk_imageio_bridge_error_path():
    """A payload the JDK cannot read surfaces as ValueError naming
    ImageIO (the bridge's error frame), and the bridge process
    survives to decode the next payload."""
    import shutil

    if not (shutil.which("javac") and shutil.which("java")):
        pytest.skip("JDK (java+javac) not on PATH")
    from parquet_converters_spark.functions.media_codecs import encode_png
    from parquet_converters_spark.functions.native_codecs import (
        _bridge_decode,
        _compile_imageio_bridge,
    )

    classes = _compile_imageio_bridge()
    with pytest.raises(ValueError, match="ImageIO"):
        _bridge_decode(classes, b"\xff\xd8 definitely not a real jpeg")
    png = encode_png(5, 4, 3, bytes(range(60)))
    w, h, c, px = _bridge_decode(classes, png)
    assert (w, h, c) == (5, 4, 3) and px == bytes(range(60))


def test_jdk_imageio_bridge_pixel_cap_guard():
    """r11 ADVICE: an oversize (decompression-bomb) response header
    must never make the Python side buffer w*h*c bytes.  Exercised
    with a scripted fake bridge process so the guard path itself is
    what's under test; the desynced bridge is dropped (killed +
    uncached) so the next call respawns cleanly."""
    import io
    import os
    import struct

    from parquet_converters_spark.functions import native_codecs as nc

    class _FakeStdin:
        def write(self, b):
            return len(b)

        def flush(self):
            pass

    class _FakeProc:
        def __init__(self, response: bytes):
            self.stdin = _FakeStdin()
            self.stdout = io.BytesIO(response)
            self.killed = False

        def poll(self):
            return None

        def kill(self):
            self.killed = True

        def wait(self):
            return 0

    # status 0, 30000x30000x3 header: 9e8 pixels >> _MAX_PIXELS
    bomb = struct.pack(">b", 0) + struct.pack(">ii", 30000, 30000) \
        + struct.pack(">b", 3) + b"\x00" * 64
    fake = _FakeProc(bomb)
    nc._BRIDGE_PROCS[(os.getpid(), "ImageIoBridge")] = fake
    try:
        with pytest.raises(ValueError, match="allocation guard"):
            nc._bridge_decode({}, b"payload")
        assert fake.killed, "desynced bridge must be dropped"
        assert (os.getpid(), "ImageIoBridge") not in nc._BRIDGE_PROCS
        # bad channel count takes the same guard
        bad_c = struct.pack(">b", 0) + struct.pack(">ii", 4, 4) \
            + struct.pack(">b", 7)
        fake2 = _FakeProc(bad_c)
        nc._BRIDGE_PROCS[(os.getpid(), "ImageIoBridge")] = fake2
        with pytest.raises(ValueError, match="allocation guard"):
            nc._bridge_decode({}, b"payload")
        assert fake2.killed
    finally:
        nc._BRIDGE_PROCS.pop((os.getpid(), "ImageIoBridge"), None)


def test_jdk_imageio_bridge_tempdir_reused_and_stderr_silenced():
    """r11 ADVICE: respawns after a bridge crash reuse the same
    materialized .class dir (no mkdtemp-per-respawn leak; the dir is
    registered for atexit cleanup), and JVM stderr is routed to
    DEVNULL instead of interleaving into worker logs."""
    import os
    import shutil

    if not (shutil.which("javac") and shutil.which("java")):
        pytest.skip("JDK (java+javac) not on PATH")
    from parquet_converters_spark.functions import native_codecs as nc

    classes = nc._compile_imageio_bridge()
    proc1 = nc._bridge_proc(classes)
    assert proc1.stderr is None  # DEVNULL: no inherited stderr pipe
    d1 = nc._BRIDGE_DIRS[(os.getpid(), "ImageIoBridge")]
    assert os.path.isdir(d1)
    proc1.kill()
    proc1.wait()
    proc2 = nc._bridge_proc(classes)  # respawn after crash
    assert proc2 is not proc1 and proc2.poll() is None
    assert nc._BRIDGE_DIRS[(os.getpid(), "ImageIoBridge")] == d1, \
        "class dir must be reused"
    # and the respawned bridge actually works
    from parquet_converters_spark.functions.media_codecs import encode_png

    png = encode_png(3, 2, 3, bytes(range(18)))
    w, h, c, px = nc._bridge_decode(classes, png)
    assert (w, h, c, px) == (3, 2, 3, bytes(range(18)))


def test_video_capability_matrix_measured():
    """r15 (r14 VERDICT item 2): the video decode posture is MEASURED,
    not assumed — the matrix names every family, the from-spec entries
    are the decoders this repo actually ships, and the external
    entries reflect a live which() probe of this box."""
    import shutil

    from parquet_converters_spark.functions.native_codecs import (
        video_decode_capabilities,
    )

    caps = video_decode_capabilities()
    assert caps["mjpeg"] == caps["gif"] == caps["webp_anim"] == "fromspec"
    assert caps["vp8"] == "fromspec-keyframes"
    for codec in ("h264", "hevc", "vp9", "av1", "mpeg4"):
        v = caps[codec]
        assert v == "unsupported" or v.startswith("seam:")
        if not any(shutil.which(t)
                   for t in ("ffmpeg", "gst-launch-1.0", "mpv")):
            assert v == "unsupported", codec
    # memoized
    assert video_decode_capabilities() is caps


def test_sample_frames_rejects_by_name(spark):
    """r15: the rejection NAMES the container and codec the probe
    found, and points at the measured matrix — no silent gap."""
    from parquet_converters_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        sample_frames,
    )

    avc1 = (b"\x00\x00\x00\x34avc1" + b"\x00" * 24
            + (640).to_bytes(2, "big") + (360).to_bytes(2, "big")
            + b"\x00" * 20)
    stsd = (len(avc1) + 16).to_bytes(4, "big") + b"stsd" \
        + b"\x00" * 4 + (1).to_bytes(4, "big") + avc1
    stbl = (len(stsd) + 8).to_bytes(4, "big") + b"stbl" + stsd
    minf = (len(stbl) + 8).to_bytes(4, "big") + b"minf" + stbl
    hdlr = (28).to_bytes(4, "big") + b"hdlr" + b"\x00" * 8 + b"vide" \
        + b"\x00" * 8
    mdia = (len(minf) + len(hdlr) + 8).to_bytes(4, "big") + b"mdia" \
        + hdlr + minf
    trak = (len(mdia) + 8).to_bytes(4, "big") + b"trak" + mdia
    moov = (len(trak) + 8).to_bytes(4, "big") + b"moov" + trak
    mp4 = (20).to_bytes(4, "big") + b"ftypmp42" + b"\x00" * 8 + moov
    df = spark.createDataFrame(
        [(1, "video", bytearray(mp4), "video/mp4", len(mp4))],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match=r"isobmff/mp42 \(codec avc1\)"):
        sample_frames(df).collect()
    with pytest.raises(Exception, match="video_decode_capabilities"):
        sample_frames(df).collect()


def _eb(eid: bytes, payload: bytes) -> bytes:
    """Test-side EBML element with a general-length size vint —
    independent of the engine's crafters."""
    n = len(payload)
    ln = 1
    while n >= (1 << (7 * ln)) - 1:
        ln += 1
    return eid + ((1 << (7 * ln)) | n).to_bytes(ln, "big") + payload


def _vp8_raw(webp: bytes) -> bytes:
    """Extract the raw VP8 bitstream from a (libwebp-authored) simple
    lossy WebP container."""
    assert webp[:4] == b"RIFF" and webp[12:16] == b"VP8 "
    size = int.from_bytes(webp[16:20], "little")
    return webp[20 : 20 + size]


def _webm_vp8(keyframes, inter_ts=None, group_second=False,
              codec=b"V_VP8", first_flags=0x80):
    """Craft a WebM with the given [(ts_ms, vp8_payload)] keyframes on
    track 1 (SimpleBlocks across two clusters; optionally the second
    keyframe rides a BlockGroup with no ReferenceBlock) plus an
    optional undecodable inter block extending the timeline."""
    import struct as _st

    hdr = _eb(b"\x1a\x45\xdf\xa3", _eb(b"\x42\x82", b"webm"))
    info = _eb(b"\x15\x49\xa9\x66",
               _eb(b"\x2a\xd7\xb1", (1_000_000).to_bytes(3, "big")))
    trk = _eb(b"\x16\x54\xae\x6b", _eb(
        b"\xae", _eb(b"\xd7", b"\x01") + _eb(b"\x83", b"\x01")
        + _eb(b"\x86", codec)))

    def sblock(rel, payload, flags=0x80):
        return _eb(b"\xa3", b"\x81" + _st.pack(">h", rel)
                   + bytes([flags]) + payload)

    def block_in_group(rel, payload):
        return _eb(b"\xa0", _eb(
            b"\xa1", b"\x81" + _st.pack(">h", rel) + b"\x00" + payload))

    c1_body = _eb(b"\xe7", b"\x00")
    c2_body = _eb(b"\xe7", (1000).to_bytes(2, "big"))
    for i, (ts, payload) in enumerate(keyframes):
        blk = (block_in_group(ts, payload)
               if group_second and len(keyframes) > 1
               and ts == keyframes[1][0]
               else sblock(ts if ts < 1000 else ts - 1000, payload,
                           flags=first_flags if i == 0 else 0x80))
        if ts < 1000:
            c1_body += blk
        else:
            c2_body += blk
    if inter_ts is not None:
        c2_body += sblock(inter_ts - 1000, b"\x01\x02\x03", flags=0x00)
    seg = info + trk + _eb(b"\x1f\x43\xb6\x75", c1_body) \
        + _eb(b"\x1f\x43\xb6\x75", c2_body)
    return hdr + _eb(b"\x18\x53\x80\x67", seg)


def test_sample_frames_webm_vp8_keyframes(spark):
    """r15: WebM V_VP8 keyframe sampling end-to-end, EXTERNALLY
    anchored — the VP8 payloads were encoded by libwebp (the lossy
    fixture corpus), the WebM wrapper is crafted test-side, and every
    emitted PNG must decode to libwebp's own RGB ground truth for the
    keyframe visible at that tick."""
    from vp8_fixtures import VECTORS

    from parquet_converters_spark.functions.media_codecs import (
        decode_png,
    )
    from parquet_converters_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        sample_frames,
    )

    names = ["flat_q75", "pattern_q50", "blocks_q25"]
    keyframes = [
        (ts, _vp8_raw(VECTORS[name]["webp"]))
        for ts, name in zip((0, 500, 1000), names)
    ]
    webm = _webm_vp8(keyframes, inter_ts=1500, group_second=True)
    df = spark.createDataFrame(
        [(7, "video", bytearray(webm), "video/webm", len(webm))],
        MEDIA_SCHEMA,
    )
    got = sorted(sample_frames(df, every_ms=500, max_frames=4).collect(),
                 key=lambda r: r["frame_index"])
    # ticks 0/500/1000/1500; the inter block at 1500 extends the
    # timeline but the latest KEYFRAME there is still the 1000 ms one
    assert [r["frame_ts_ms"] for r in got] == [0, 500, 1000, 1500]
    expect = [names[0], names[1], names[2], names[2]]
    for r, name in zip(got, expect):
        v = VECTORS[name]
        w, h = v["size"]
        pw, ph, ch, pixels = decode_png(bytes(r["payload"]))
        assert (pw, ph, ch) == (w, h, 3), name
        assert pixels == v["rgb"], name


def test_sample_frames_webm_rejections(spark):
    """Laced video blocks and non-VP8 codecs reject by name."""
    from vp8_fixtures import VECTORS

    from parquet_converters_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        sample_frames,
    )

    raw = _vp8_raw(VECTORS["flat_q75"]["webp"])
    vp9 = _webm_vp8([(0, raw)], codec=b"V_VP9")
    df = spark.createDataFrame(
        [(1, "video", bytearray(vp9), "video/webm", len(vp9))],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="V_VP9"):
        sample_frames(df).collect()
    # a laced SimpleBlock (EBML lacing bits set) on the video track
    laced = _webm_vp8([(0, raw)], first_flags=0x80 | 0x06)
    df = spark.createDataFrame(
        [(2, "video", bytearray(laced), "video/webm", len(laced))],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="lacing"):
        sample_frames(df).collect()


def _mjpeg_mp4(frames, timescale=1000, delta=500):
    """Test-side MJPEG-in-MP4 crafter (independent of the engine's
    demuxer): 'jpeg' sample entries, two samples per chunk, absolute
    stco offsets into a trailing mdat."""
    import struct as _st

    def box(typ, payload):
        return _st.pack(">I", 8 + len(payload)) + typ + payload

    def full(typ, payload):
        return box(typ, b"\x00" * 4 + payload)

    entry = box(b"jpeg", b"\x00" * 24
                + (32).to_bytes(2, "big") + (24).to_bytes(2, "big")
                + b"\x00" * 20)
    stsd = full(b"stsd", (1).to_bytes(4, "big") + entry)
    stts = full(b"stts", (1).to_bytes(4, "big")
                + len(frames).to_bytes(4, "big")
                + delta.to_bytes(4, "big"))
    stsc = full(b"stsc", (1).to_bytes(4, "big")
                + (1).to_bytes(4, "big") + (2).to_bytes(4, "big")
                + (1).to_bytes(4, "big"))
    stsz = full(b"stsz", (0).to_bytes(4, "big")
                + len(frames).to_bytes(4, "big")
                + b"".join(len(f).to_bytes(4, "big") for f in frames))

    def make(offsets):
        stco = full(b"stco", len(offsets).to_bytes(4, "big")
                    + b"".join(o.to_bytes(4, "big") for o in offsets))
        stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
        mdhd = full(b"mdhd", b"\x00" * 8
                    + timescale.to_bytes(4, "big") + b"\x00" * 4)
        hdlr = full(b"hdlr", b"\x00" * 4 + b"vide" + b"\x00" * 12)
        mdia = box(b"mdia", mdhd + hdlr + box(b"minf", stbl))
        moov = box(b"moov", box(b"trak", mdia))
        ftyp = box(b"ftyp", b"mp42\x00\x00\x00\x00mp42")
        mdat = box(b"mdat", b"".join(frames))
        return ftyp + moov + mdat

    # two passes: sizes are offset-independent, so compute offsets
    # from a dummy build then rebuild with the real ones
    dummy = make([0] * ((len(frames) + 1) // 2))
    mdat_body = len(dummy) - sum(len(f) for f in frames)
    offsets, pos = [], mdat_body
    for i in range(0, len(frames), 2):
        offsets.append(pos)
        pos += sum(len(f) for f in frames[i : i + 2])
    return make(offsets)


def test_sample_frames_mjpeg_mp4(spark):
    """r15: MJPEG-in-MP4 frame sampling — the engine's sample-table
    demux against an independently-crafted MP4 around real baseline
    JPEG frames; every emitted payload must be the exact source JPEG
    and every timestamp the stts closed form."""
    from parquet_converters_spark.functions.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
    )
    from parquet_converters_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        sample_frames,
    )

    frames = [
        encode_jpeg(32, 24, 3, bytes((x * 5 + y * 3 + c + i) % 256
                                     for y in range(24)
                                     for x in range(32)
                                     for c in range(3)))
        for i in range(4)
    ]
    mp4 = _mjpeg_mp4(frames)  # 2 fps at the 1000 timescale
    df = spark.createDataFrame(
        [(3, "video", bytearray(mp4), "video/mp4", len(mp4))],
        MEDIA_SCHEMA,
    )
    got = sorted(sample_frames(df, every_ms=500, max_frames=4).collect(),
                 key=lambda r: r["frame_index"])
    assert [r["frame_ts_ms"] for r in got] == [0, 500, 1000, 1500]
    for r, f in zip(got, frames):
        assert bytes(r["payload"]) == f
        assert decode_jpeg(bytes(r["payload"]))[:3] == (32, 24, 3)
    # every_ms=1000 -> step 2: frames 0 and 2
    got = sorted(sample_frames(df, every_ms=1000, max_frames=4).collect(),
                 key=lambda r: r["frame_index"])
    assert [bytes(r["payload"]) for r in got] == [frames[0], frames[2]]
    # fragmented files reject by name
    moof = mp4 + (16).to_bytes(4, "big") + b"moof" + b"\x00" * 8
    df = spark.createDataFrame(
        [(4, "video", bytearray(moof), "video/mp4", len(moof))],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="moof"):
        sample_frames(df).collect()


def test_sample_frames_webm_laced_audio_ok(spark):
    """r15 review finding (high): laced blocks on a NON-video track
    (ffmpeg Xiph-laces small Vorbis audio packets routinely) must not
    reject a WebM whose video track is fully supported."""
    import struct as _st

    from vp8_fixtures import VECTORS

    from parquet_converters_spark.functions.matroska_demux import (
        parse_matroska_video_blocks,
    )
    from parquet_converters_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        sample_frames,
    )

    raw = _vp8_raw(VECTORS["flat_q75"]["webp"])
    hdr = _eb(b"\x1a\x45\xdf\xa3", _eb(b"\x42\x82", b"webm"))
    vtrk = _eb(b"\xae", _eb(b"\xd7", b"\x01") + _eb(b"\x83", b"\x01")
               + _eb(b"\x86", b"V_VP8"))
    atrk = _eb(b"\xae", _eb(b"\xd7", b"\x02") + _eb(b"\x83", b"\x02")
               + _eb(b"\x86", b"A_VORBIS"))
    video_blk = _eb(b"\xa3", b"\x81" + _st.pack(">h", 0) + b"\x80" + raw)
    # Xiph-laced audio SimpleBlock on track 2: lacing bits 0b01,
    # frame count byte = 1 (2 frames), first size 3, then payloads
    laced_audio = _eb(b"\xa3", b"\x82" + _st.pack(">h", 0)
                      + bytes([0x80 | 0x02]) + b"\x01\x03" + b"abcdef")
    cluster = _eb(b"\x1f\x43\xb6\x75",
                  _eb(b"\xe7", b"\x00") + laced_audio + video_blk)
    webm = hdr + _eb(b"\x18\x53\x80\x67",
                     _eb(b"\x16\x54\xae\x6b", vtrk + atrk) + cluster)
    codec, _w, _h, blocks = parse_matroska_video_blocks(webm)
    assert codec == "V_VP8" and len(blocks) == 1 and blocks[0][1]
    df = spark.createDataFrame(
        [(5, "video", bytearray(webm), "video/webm", len(webm))],
        MEDIA_SCHEMA,
    )
    got = sample_frames(df, every_ms=1000, max_frames=1).collect()
    assert len(got) == 1


def test_bmff_stsz_allocation_guard():
    """r15 review finding: a lying fixed-size stsz sample_count of
    2^32-1 must not build a billions-entry list."""
    from parquet_converters_spark.functions.bmff_demux import (
        parse_bmff_video_samples,
    )

    mp4 = _mjpeg_mp4([b"\xff\xd8frame0\xff\xd9"])
    # rewrite the stsz box: fixed sample_size=1, count=0xFFFFFFFF
    i = mp4.find(b"stsz")
    bad = (mp4[: i + 8] + (1).to_bytes(4, "big") + b"\xff\xff\xff\xff"
           + mp4[i + 16 :])
    codec, fps, samples = parse_bmff_video_samples(bad)
    assert codec == "jpeg" and len(samples) <= len(bad) + 1


def test_decode_media_real_path_mp4_and_webm_thumbnail(spark):
    """r15: decode_media's thumbnail convention extends to the two new
    containers — first MJPEG sample of an MP4, first VP8 keyframe of
    a WebM (libwebp-anchored pixels)."""
    from vp8_fixtures import VECTORS

    from parquet_converters_spark.functions.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
    )
    from parquet_converters_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        _band_features,
        decode_media,
    )
    from parquet_converters_spark.functions.vp8_codec import decode_vp8

    frames = [encode_jpeg(32, 24, 3, bytes((x + y + c + i) % 256
                                           for y in range(24)
                                           for x in range(32)
                                           for c in range(3)))
              for i in range(2)]
    mp4 = _mjpeg_mp4(frames)
    raw_vp8 = _vp8_raw(VECTORS["pattern_q50"]["webp"])
    webm = _webm_vp8([(0, raw_vp8)])
    df = spark.createDataFrame(
        [(1, "video", bytearray(mp4), "video/mp4", len(mp4)),
         (2, "video", bytearray(webm), "video/webm", len(webm))],
        MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in decode_media(df, n_features=4).collect()}
    _, _, _, jpix = decode_jpeg(frames[0])
    assert (rows[1]["width"], rows[1]["height"], rows[1]["channels"]) \
        == (32, 24, 3)
    assert rows[1]["features"] == pytest.approx(
        _band_features(jpix, 4), abs=1e-6)
    vw, vh, _c, vpix = decode_vp8(raw_vp8)
    assert (rows[2]["width"], rows[2]["height"], rows[2]["channels"]) \
        == (vw, vh, 3)
    assert rows[2]["features"] == pytest.approx(
        _band_features(vpix, 4), abs=1e-6)

def test_bmff_stsc_first_chunk_past_one_pads_not_shifts():
    """r16 ADVICE: an stsc whose first run starts at chunk 2 means
    chunk 1 carries no described samples — the expansion must index
    samples-per-chunk by chunk NUMBER (pad the uncovered head), not
    extend sequentially, which would read the first samples at chunk
    1's offset and silently mis-frame every payload."""
    from parquet_converters_spark.functions.bmff_demux import (
        parse_bmff_video_samples,
    )

    frames = [b"\xff\xd8frm%d\xff\xd9" % i for i in range(4)]
    assert len({len(f) for f in frames}) == 1  # equal-size by design
    mp4 = bytearray(_mjpeg_mp4(frames))
    i = mp4.find(b"stsc")
    # entry layout after the box type: 4B version/flags, 4B count,
    # then (first_chunk, samples_per_chunk, desc_index)
    assert mp4[i + 12 : i + 16] == (1).to_bytes(4, "big")
    mp4[i + 12 : i + 16] = (2).to_bytes(4, "big")
    codec, _fps, samples = parse_bmff_video_samples(bytes(mp4))
    assert codec == "jpeg"
    # chunk 1 (frames 0,1's bytes) is uncovered; samples start at
    # chunk 2's offset, i.e. frames 2 and 3
    assert [p for _ts, p in samples] == [frames[2], frames[3]]


def test_matroska_zero_size_tracktype_reads_as_zero():
    """r16 ADVICE: a zero-size TrackType element must read as 0 (not a
    video track), not steal the next element's first byte.  The next
    element here is crafted with an 8-byte EBML ID starting 0x01 — the
    exact byte that would falsely mark the track as video."""
    from parquet_converters_spark.functions.matroska_demux import (
        parse_matroska_video_blocks,
    )
    import struct as _st

    hdr = _eb(b"\x1a\x45\xdf\xa3", _eb(b"\x42\x82", b"webm"))
    # unknown element with an 8-byte ID whose first byte is 0x01,
    # zero-size — a legal EBML element the walker just skips
    ghost = b"\x01\x00\x00\x00\x00\x00\x00\x7f" + b"\x80"
    trk = _eb(b"\xae",
              _eb(b"\xd7", b"\x01")        # TrackNumber 1
              + b"\x83\x80"                 # TrackType, SIZE ZERO
              + ghost
              + _eb(b"\x86", b"V_VP8"))     # CodecID
    blk = _eb(b"\xa3", b"\x81" + _st.pack(">h", 0) + b"\x80" + b"payload")
    cluster = _eb(b"\x1f\x43\xb6\x75", _eb(b"\xe7", b"\x00") + blk)
    webm = hdr + _eb(b"\x18\x53\x80\x67",
                     _eb(b"\x16\x54\xae\x6b", trk) + cluster)
    codec, _w, _h, blocks = parse_matroska_video_blocks(webm)
    assert codec is None and blocks == []


def test_bmff_stsc_huge_first_chunk_no_allocation():
    """r16 review finding: the chunk-number pad must clamp untrusted
    32-bit stsc values BEFORE allocating — a crafted first_chunk of
    0xFFFFFFFF would otherwise build a ~4-billion-element list."""
    from parquet_converters_spark.functions.bmff_demux import (
        parse_bmff_video_samples,
    )

    frames = [b"\xff\xd8frm%d\xff\xd9" % i for i in range(4)]
    mp4 = bytearray(_mjpeg_mp4(frames))
    i = mp4.find(b"stsc")
    mp4[i + 12 : i + 16] = b"\xff\xff\xff\xff"  # first_chunk = 2^32-1
    codec, _fps, samples = parse_bmff_video_samples(bytes(mp4))
    assert codec == "jpeg" and samples == []  # no chunk is covered
