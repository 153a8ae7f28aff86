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
from-spec path decodes lossy VP8 and ALPH alpha planes too —
vp8_codec.py / webp_codec.py — so the WebP seam is now a pure
throughput swap) and the JDK ImageIO bridge below.  The same factory
pattern is where a PIL-SIMD / libjpeg-turbo / nvJPEG wrapper would
live.
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


# --------------------------------------------------------------------------
# JDK ImageIO bridge (JPEG/PNG/GIF/BMP through javax.imageio)
# --------------------------------------------------------------------------

# pid-keyed so a forked Python worker never inherits the parent's pipe
_BRIDGE_PROCS: dict = {}
# pid-keyed materialized .class dirs, reused across respawns and removed
# at interpreter exit (a crash-respawn loop must not leak temp dirs)
_BRIDGE_DIRS: dict = {}

# same decompression-bomb guard as the from-spec decoders (jpeg_codec/
# gif_codec/webp_codec._MAX_PIXELS): a corrupt or hostile header must
# not make the Python side buffer gigabytes of pixel bytes
_MAX_PIXELS = 1 << 28


def _compile_bridge(java_name: str) -> dict[str, bytes]:
    """Compile a bridge .java next to this module (driver-side —
    needs javac, which ships with the JDK Spark already requires) and
    return the .class files as bytes, so executors only need `java`."""
    import pathlib
    import shutil
    import subprocess
    import tempfile

    javac = shutil.which("javac")
    if javac is None:
        raise RuntimeError(
            "javac not found — the JDK seam adapters compile their "
            "bridges driver-side; install a JDK or use the from-spec "
            "decoders"
        )
    src = pathlib.Path(__file__).with_name(java_name)
    with tempfile.TemporaryDirectory(prefix="jdk_bridge_") as d:
        subprocess.run(
            [javac, "-d", d, str(src)], check=True, capture_output=True
        )
        return {
            p.name: p.read_bytes()
            for p in pathlib.Path(d).glob("*.class")
        }


def _compile_imageio_bridge() -> dict[str, bytes]:
    return _compile_bridge("ImageIoBridge.java")


def _compile_audio_bridge() -> dict[str, bytes]:
    return _compile_bridge("AudioBridge.java")


def _bridge_proc(classes: dict, main: str = "ImageIoBridge"):
    """The per-process persistent `java <main>` bridge subprocess."""
    import atexit
    import os
    import shutil
    import subprocess
    import tempfile

    key = (os.getpid(), main)
    proc = _BRIDGE_PROCS.get(key)
    if proc is not None and proc.poll() is None:
        return proc
    d = _BRIDGE_DIRS.get(key)
    if d is None or not os.path.isdir(d):
        d = tempfile.mkdtemp(prefix="jdk_bridge_")
        for name, blob in classes.items():
            with open(os.path.join(d, name), "wb") as f:
                f.write(blob)
        _BRIDGE_DIRS[key] = d
        atexit.register(shutil.rmtree, d, ignore_errors=True)
    java = shutil.which("java") or "java"
    # JVM stderr goes nowhere useful interleaved into worker logs; the
    # protocol carries errors in-band, so silence the side channel
    proc = subprocess.Popen(
        [java, "-XX:+UseSerialGC", "-cp", d, main],
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
    )
    _BRIDGE_PROCS[key] = proc
    return proc


def _read_exact(stream, n: int) -> bytes:
    out = bytearray()
    while len(out) < n:
        chunk = stream.read(n - len(out))
        if not chunk:
            raise RuntimeError("ImageIO bridge terminated mid-response")
        out += chunk
    return bytes(out)


def _bridge_decode(classes: dict, payload: bytes):
    import os
    import struct

    proc = _bridge_proc(classes)
    proc.stdin.write(struct.pack(">i", len(payload)) + payload)
    proc.stdin.flush()
    status = _read_exact(proc.stdout, 1)[0]
    if status:
        (n,) = struct.unpack(">i", _read_exact(proc.stdout, 4))
        raise ValueError(
            "JDK ImageIO: " + _read_exact(proc.stdout, n).decode()
        )
    w, h = struct.unpack(">ii", _read_exact(proc.stdout, 8))
    c = _read_exact(proc.stdout, 1)[0]
    if w <= 0 or h <= 0 or c not in (1, 3, 4) or w * h > _MAX_PIXELS:
        # decompression-bomb / desynced-protocol guard: never buffer an
        # unbounded pixel payload.  Draining it would BE the bomb, so
        # drop the bridge and let the next call respawn it.
        proc.kill()
        proc.wait()
        _BRIDGE_PROCS.pop((os.getpid(), "ImageIoBridge"), None)
        raise ValueError(
            f"JDK ImageIO: refusing {w}x{h}x{c} response "
            f"(exceeds the {_MAX_PIXELS}-pixel allocation guard)"
        )
    return w, h, c, _read_exact(proc.stdout, w * h * c)


def _audio_bridge_decode(classes: dict, payload: bytes):
    """One request/response against the AudioBridge subprocess ->
    ``(rate, channels, interleaved_pcm16_list)``."""
    import os
    import struct

    import numpy as np

    proc = _bridge_proc(classes, main="AudioBridge")
    proc.stdin.write(struct.pack(">i", len(payload)) + payload)
    proc.stdin.flush()
    status = _read_exact(proc.stdout, 1)[0]
    if status:
        (n,) = struct.unpack(">i", _read_exact(proc.stdout, 4))
        raise ValueError(
            "JDK sound: " + _read_exact(proc.stdout, n).decode()
        )
    (rate,) = struct.unpack(">i", _read_exact(proc.stdout, 4))
    channels = _read_exact(proc.stdout, 1)[0]
    (count,) = struct.unpack(">i", _read_exact(proc.stdout, 4))
    if rate <= 0 or channels == 0 or count < 0 or count > _MAX_PIXELS:
        proc.kill()
        proc.wait()
        _BRIDGE_PROCS.pop((os.getpid(), "AudioBridge"), None)
        raise ValueError(
            f"JDK sound: refusing rate={rate} ch={channels} n={count} "
            "response (allocation guard)"
        )
    body = _read_exact(proc.stdout, count * 2)
    samples = np.frombuffer(body, dtype=">i2").astype(np.int16).tolist()
    return rate, channels, samples


def jdk_sound_media_decoder():
    """Factory: a ``decode_media(decoder=...)``-compatible callable
    that decodes the audio container formats (WAV, Sun AU, AIFF/AIFC)
    through a persistent ``javax.sound.sampled`` bridge subprocess and
    everything else through the from-spec table — the audio twin of
    :func:`jdk_imageio_media_decoder`, same compile-driver-side /
    ship-.class-bytes-in-the-closure architecture.

    Measured agreement with the from-spec decoders
    (tests/test_audio_codecs.py): PCM16 and G.711 u-law/A-law are
    sample-EXACT (the G.711 tables are normative; three-way agreement
    ours == audioop == JDK).  PCM 8/24/32 differ by conversion
    convention — the JDK renormalizes through float, the from-spec
    decoders integer-shift like audioop/sox — bounded by one LSB of
    the narrow width.  AIFC ``alaw``/``sowt`` stay on the from-spec
    path: the JDK's AIFF reader does not support them (probed)."""
    classes = _compile_audio_bridge()  # driver-side fail fast

    def decode(payload: bytes, n_features: int):
        import struct as _struct

        from parquet_converters_spark.functions.multimodal import (
            _band_features,
            _real_decode,
        )

        head = bytes(payload[:4])
        is_wav = head == b"RIFF" and bytes(payload[8:12]) == b"WAVE"
        is_snd = head == b".snd"
        is_aiff = head == b"FORM" and bytes(payload[8:12]) in (
            b"AIFF", b"AIFC",
        )
        if is_aiff and bytes(payload[8:12]) == b"AIFC":
            # cheap COMM sniff: route the JDK-unsupported AIFC
            # compressions to the from-spec decoder
            pos = 12
            while pos + 8 <= len(payload):
                tag = bytes(payload[pos : pos + 4])
                (ln,) = _struct.unpack(">I", bytes(payload[pos + 4 : pos + 8]))
                if tag == b"COMM":
                    comp = bytes(
                        payload[pos + 26 : pos + 30]
                    ).lower().rstrip()
                    if comp in (b"alaw", b"sowt"):
                        is_aiff = False
                    break
                pos += 8 + ln + (ln & 1)
        # lossy-audio seam: MPEG audio routes through the bridge ONLY
        # when this JVM's probed SPI set actually reads it (stock
        # OpenJDK: no) — else it falls through to _real_decode's named
        # NotImplementedError.  Measured posture recorded in SCALE.md.
        is_mpeg = (
            bytes(payload[:3]) == b"ID3"
            or (len(payload) >= 2 and payload[0] == 0xFF
                and (payload[1] & 0xE0) == 0xE0)
        ) and jdk_sound_mp3_supported(classes)
        if is_wav or is_snd or is_aiff or is_mpeg:
            _rate, channels, samples = _audio_bridge_decode(
                classes, payload
            )
            if not samples:
                return None, None, channels, [-1.0] * n_features
            scaled = [min(abs(s), 32767) // 128 for s in samples]
            return None, None, channels, _band_features(
                scaled, n_features
            )
        return _real_decode(payload, n_features)

    return decode


def jdk_imageio_media_decoder():
    """Factory: a ``decode_media(decoder=...)``-compatible callable
    that decodes JPEG and GIF through a persistent ``javax.imageio``
    bridge subprocess (one per Python worker; per-image cost is a pipe
    round-trip) and everything else through the from-spec table.

    Compiles the bridge driver-side and ships the .class bytes in the
    (picklable) closure — executors need only ``java``, which Spark
    itself requires.  Raises ``RuntimeError`` immediately if javac is
    absent here.

    Routing is measurement-driven (this box, 128x96): JPEG 66 -> 1.1
    ms/img (x60) and GIF 10.3 -> 1.1 ms/img (x9) through the bridge,
    but PNG/BMP stay from-spec because those decoders are C-zlib /
    byte-shuffle backed and already BEAT the bridge's ~0.25 ms pipe
    round-trip — the honest swap point the seam exists to express.
    TIFF also routes to the bridge (the JDK ships a javax.imageio
    TIFF plugin since Java 9; there is no from-spec TIFF path, so the
    bridge is what makes the format decodable at all).  JPEG features
    differ from the from-spec path within the documented IDCT
    tolerance (±2/sample); PNG/GIF/BMP are byte-exact either way.
    """
    classes = _compile_imageio_bridge()  # driver-side fail fast

    def decode(payload: bytes, n_features: int):
        from parquet_converters_spark.functions.multimodal import (
            _band_features,
            _real_decode,
        )

        head = bytes(payload[:4])
        is_tiff = head in (b"II*\x00", b"MM\x00*")
        use_bridge = head[:2] == b"\xff\xd8" or head == b"GIF8"
        if is_tiff:
            # measured routing (SCALE.md r12): uncompressed strips
            # decode ~50x FASTER from spec (memcpy-class), while
            # entropy-coded TIFF (LZW/Deflate) is pure-Python-bound
            # and belongs on the bridge; a cheap IFD sniff decides
            use_bridge = True
            try:
                from parquet_converters_spark.functions.tiff_codec import (
                    _read_ifd,
                )

                bo = "<" if bytes(payload[:2]) == b"II" else ">"
                comp = _read_ifd(bytes(payload), bo).get(259, [1])[0]
                use_bridge = comp not in (1, 32773)
            except Exception:
                pass  # unparseable header: let the bridge report it
        if use_bridge:
            w, h, c, px = _bridge_decode(classes, payload)
            return w, h, c, _band_features(px, n_features)
        try:
            return _real_decode(payload, n_features)
        except NotImplementedError:
            if not is_tiff:
                raise
            # TIFF variants the from-spec strip decoder rejects by
            # name (tiled 322/323, planar-2, FillOrder-2, float
            # samples, odd bit depths) ARE decodable by the JDK's
            # javax.imageio TIFF plugin we are already bridged to —
            # retry there instead of bouncing the user (r12 ADVICE)
            w, h, c, px = _bridge_decode(classes, payload)
            return w, h, c, _band_features(px, n_features)

    return decode


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


_JDK_MP3_CAPABILITY: list = []  # memoized [bool] once probed


def jdk_sound_mp3_supported(classes: dict | None = None) -> bool:
    """LIVE capability probe: does THIS JVM's ``javax.sound.sampled``
    SPI set read MPEG-1 Layer III?  Stock OpenJDK ships no MP3 reader
    (only an external SPI jar — JLayer/Tritonus/JMF — adds one), but
    the answer is a property of the machine, not the spec, so it is
    measured, never assumed — the same posture as the AIFC
    ``alaw``/``sowt`` probe documented on
    :func:`jdk_sound_media_decoder`.

    Sends one minimal crafted CBR frame (MPEG1 L3 44.1 kHz mono,
    all-zero main data — a valid silent frame) through the
    AudioBridge: a clean PCM response means an MP3 SPI is installed;
    the in-band UnsupportedAudioFileException means it is not.
    Memoized per process.  The decode posture that follows is
    documented in SCALE.md ("lossy audio"): triage via
    media_probe (format/rate/channels/bitrate/duration, header-only)
    always works; full decode routes to this seam when present and
    raises the named NotImplementedError when not.

    ``classes`` lets an executor pass the DRIVER-compiled bridge
    bytes it received in the decode closure — executors need only
    ``java``, so compiling here would measure javac presence instead
    of SPI presence (r14 review finding).
    """
    if _JDK_MP3_CAPABILITY:
        return _JDK_MP3_CAPABILITY[0]
    # 417-byte frame: 144 * 128000 // 44100, padding 0 (ISO/IEC
    # 11172-3 §2.4.3.1) — byte-identical construction to the
    # test-side crafter in tests/test_media_probe.py
    frame = b"\xff\xfb\x90\xc0" + b"\x00" * 413
    if classes is None:
        classes = _compile_audio_bridge()
    try:
        _audio_bridge_decode(classes, frame * 4)
        supported = True
    except ValueError as e:
        # memoize ONLY the in-band SPI answer; a transient bridge/JVM
        # failure must propagate rather than pin the capability to
        # False for the whole process (r14 ADVICE)
        if "UnsupportedAudioFileException" not in str(e):
            raise
        supported = False
    _JDK_MP3_CAPABILITY.append(supported)
    return supported


_VIDEO_CAPABILITIES: list = []  # memoized [dict] once probed


def video_decode_capabilities() -> dict[str, str]:
    """MEASURED video-decode capability matrix for THIS container —
    the r14 lossy-audio posture (SCALE.md "lossy audio") applied to
    video (r14 VERDICT item 2).  Never assumed: each entry is either
    a from-spec decoder this repo ships, or a live ``shutil.which``
    probe for an external decode seam, re-run per process.

    Values:

    - ``"fromspec"`` — fully decodable by this repo's own codecs
      (MJPEG-in-AVI via avi_codec+jpeg_codec, animated GIF via
      gif_codec, animated WebP — VP8L *and* lossy VP8 — via
      webp_codec/vp8_codec).
    - ``"fromspec-keyframes"`` — VP8: the RFC 6386 decoder
      (vp8_codec.py) decodes key frames bit-exactly, but inter-frame
      prediction state is not implemented, so VP8-in-WebM *video*
      (P-frames) is not decodable, only still/keyframe payloads.
    - ``"seam:<tool>"`` — an external tool is PRESENT on this box
      and a subprocess seam could route to it (none shipped here
      until a box has one; the probe is what flips this value).
    - ``"unsupported"`` — no decoder and no seam found.  Stock JDKs
      ship NO video decode API at all (javax.imageio is stills-only,
      javax.sound is audio-only; JMF was never part of the JDK), so
      unlike MP3 there is no SPI that a jar on the classpath could
      flip — only an external binary can.

    ``probe_media`` still yields full triage metadata (container,
    codec, dims, fps, frame count, duration) for ALL of these
    header-only; this matrix governs *decode*, not triage.
    """
    if _VIDEO_CAPABILITIES:
        return _VIDEO_CAPABILITIES[0]
    import shutil

    tool = next(
        (t for t in ("ffmpeg", "gst-launch-1.0", "mpv")
         if shutil.which(t)),
        None,
    )
    external = f"seam:{tool}" if tool else "unsupported"
    caps = {
        "mjpeg": "fromspec",
        "gif": "fromspec",
        "webp_anim": "fromspec",
        "vp8": "fromspec-keyframes",
        "h264": external,
        "hevc": external,
        "vp9": external,
        "av1": external,
        "mpeg4": external,
    }
    _VIDEO_CAPABILITIES.append(caps)
    return caps
