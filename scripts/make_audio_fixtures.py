"""Generate tests/audio_fixtures.py — embedded audio known-answer vectors.

Authors small deterministic audio files with EXTERNAL encoders — the
CPython stdlib writers (``wave``, ``aifc``, ``sunau``) and their C
companding implementation (``audioop``) — and records the expected
PCM16 decode alongside, so tests/test_audio_codecs.py can assert the
from-spec decoders (functions/audio_codecs.py, media_codecs.decode_wav)
byte-exactly with ZERO optional dependencies, on containers where the
authoring modules no longer exist (aifc/sunau/audioop were removed in
Python 3.13).

Provenance: run on CPython 3.11.7 (this container), which still ships
all four modules.  Byte-order quirks of the stdlib writers, verified
against their source: raw PCM frames are written verbatim (so the
caller supplies big-endian for AIFF/AU), but the G.711 and sowt
converters run audioop on NATIVE (little-endian) input.  Determinism
of this generator is asserted by the test suite (regenerating must
reproduce the committed fixture byte-for-byte).

Usage:  PYTHONPATH=/root/repo python scripts/make_audio_fixtures.py
"""

import base64
import io
import struct
import sys
import warnings

warnings.filterwarnings("ignore", category=DeprecationWarning)

import aifc  # noqa: E402
import audioop  # noqa: E402
import sunau  # noqa: E402
import wave  # noqa: E402


class _KeepOpenBytesIO(io.BytesIO):
    """The stdlib audio writers patch header sizes in close() and then
    close the underlying file — keep the buffer readable afterwards."""

    def close(self):
        pass


def _signal(n=240, channels=1, seed=3):
    """Deterministic integer 'pluck': a decaying pseudo-sine, full
    16-bit range, no floats (bit-exact on every platform)."""
    out = []
    x = 12345 + seed
    for i in range(n):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        base = ((x >> 7) % 65536) - 32768
        decay = (n - i) * 32768 // n
        s = base * decay // 32768
        for c in range(channels):
            out.append(max(-32768, min(32767, s + c * 17)))
    return out


def _pack16(samples):
    return struct.pack(f"<{len(samples)}h", *samples)


def _lin2width(frames16, width, big_endian=False):
    out = audioop.lin2lin(frames16, 2, width)
    if big_endian and width > 1:
        out = audioop.byteswap(out, width)
    return out


def _expected16(frames16, width):
    """What our decoders normalize a width-W file back to."""
    return list(
        struct.unpack(
            f"<{len(frames16) // 2}h",
            audioop.lin2lin(_lin2width(frames16, width), width, 2),
        )
    )


def main():
    vectors = {}
    rate = 8000

    # ---- WAV: PCM 8/16/24/32 via the stdlib wave writer ----
    for width in (1, 2, 3, 4):
        samples = _signal(200, channels=2, seed=width)
        frames16 = _pack16(samples)
        buf = _KeepOpenBytesIO()
        w = wave.open(buf, "wb")
        w.setnchannels(2)
        w.setsampwidth(width)
        w.setframerate(rate)
        frames = _lin2width(frames16, width)
        if width == 1:  # wave expects unsigned 8-bit
            frames = audioop.bias(frames, 1, 128)
        w.writeframes(frames)
        w.close()
        vectors[f"wav_pcm{width * 8}"] = {
            "payload": buf.getvalue(),
            "rate": rate,
            "channels": 2,
            "pcm16": _expected16(frames16, width),
            "provenance": f"CPython {sys.version.split()[0]} wave writer",
        }

    # ---- AU: PCM 8/16/24/32 + u-law via sunau ----
    for width in (1, 2, 3, 4):
        samples = _signal(200, channels=1, seed=10 + width)
        frames16 = _pack16(samples)
        buf = _KeepOpenBytesIO()
        a = sunau.open(buf, "wb")
        a.setnchannels(1)
        a.setsampwidth(width)
        a.setframerate(rate)
        a.setcomptype("NONE", "")  # sunau DEFAULTS to ULAW
        # sunau writes raw PCM verbatim; AU is big-endian on disk
        a.writeframes(_lin2width(frames16, width, big_endian=True))
        a.close()
        vectors[f"au_pcm{width * 8}"] = {
            "payload": buf.getvalue(),
            "rate": rate,
            "channels": 1,
            "pcm16": _expected16(frames16, width),
            "provenance": f"CPython {sys.version.split()[0]} sunau writer",
        }
    samples = _signal(200, channels=1, seed=20)
    frames16 = _pack16(samples)
    buf = _KeepOpenBytesIO()
    a = sunau.open(buf, "wb")
    a.setnchannels(1)
    a.setsampwidth(2)
    a.setframerate(rate)
    a.setcomptype("ULAW", "")
    a.writeframes(frames16)
    a.close()
    vectors["au_ulaw"] = {
        "payload": buf.getvalue(),
        "rate": rate,
        "channels": 1,
        "pcm16": list(
            struct.unpack(
                "<200h",
                audioop.ulaw2lin(audioop.lin2ulaw(frames16, 2), 2),
            )
        ),
        "provenance": (
            f"CPython {sys.version.split()[0]} sunau writer + audioop "
            "lin2ulaw (C G.711 reference)"
        ),
    }

    # ---- AIFF/AIFC: NONE 8/16/24/32, ulaw, alaw via aifc ----
    for width in (1, 2, 3, 4):
        samples = _signal(200, channels=2, seed=30 + width)
        frames16 = _pack16(samples)
        buf = _KeepOpenBytesIO()
        f = aifc.open(buf, "wb")
        f.setnchannels(2)
        f.setsampwidth(width)
        f.setframerate(rate)
        # aifc writes raw PCM verbatim; AIFF is big-endian on disk
        f.writeframes(_lin2width(frames16, width, big_endian=True))
        f.close()
        vectors[f"aiff_pcm{width * 8}"] = {
            "payload": buf.getvalue(),
            "rate": rate,
            "channels": 2,
            "pcm16": _expected16(frames16, width),
            "provenance": f"CPython {sys.version.split()[0]} aifc writer",
        }
    for law, conv in (("ulaw", audioop.lin2ulaw), ("alaw", audioop.lin2alaw)):
        samples = _signal(200, channels=1, seed=40 + len(law))
        frames16 = _pack16(samples)
        buf = _KeepOpenBytesIO()
        f = aifc.open(buf, "wb")
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.setcomptype(law.encode(), b"")
        f.writeframes(frames16)
        f.close()
        expand = audioop.ulaw2lin if law == "ulaw" else audioop.alaw2lin
        vectors[f"aifc_{law}"] = {
            "payload": buf.getvalue(),
            "rate": rate,
            "channels": 1,
            "pcm16": list(
                struct.unpack("<200h", expand(conv(frames16, 2), 2))
            ),
            "provenance": (
                f"CPython {sys.version.split()[0]} aifc writer + audioop "
                f"lin2{law} (C G.711 reference)"
            ),
        }

    # ---- AIFC sowt (byte-swapped PCM16) via aifc's own converter ----
    samples = _signal(200, channels=2, seed=50)
    frames16 = _pack16(samples)
    buf = _KeepOpenBytesIO()
    f = aifc.open(buf, "wb")
    f.setnchannels(2)
    f.setsampwidth(2)
    f.setframerate(rate)
    f.setcomptype(b"sowt", b"")
    # aifc._lin2sowt byteswaps on write, so supply big-endian input to
    # land little-endian samples on disk (the sowt meaning)
    f.writeframes(audioop.byteswap(frames16, 2))
    f.close()
    vectors["aifc_sowt"] = {
        "payload": buf.getvalue(),
        "rate": rate,
        "channels": 2,
        "pcm16": samples,
        "provenance": (
            f"CPython {sys.version.split()[0]} aifc writer, "
            "comptype sowt (its _lin2sowt converter byteswaps)"
        ),
    }

    # ---- emit ----
    lines = [
        '"""Embedded audio known-answer vectors (generated — do not edit).',
        "",
        "Regenerate: PYTHONPATH=/root/repo python "
        "scripts/make_audio_fixtures.py",
        "Authors: CPython stdlib wave/aifc/sunau writers + audioop",
        "(C G.711 reference).  See the generator docstring for full",
        'provenance.  Payloads are base64; pcm16 are expected decodes."""',
        "",
        "import base64",
        "",
        "VECTORS = {",
    ]
    for name in sorted(vectors):
        v = vectors[name]
        b64 = base64.b64encode(v["payload"]).decode()
        lines.append(f"    {name!r}: {{")
        lines.append(f"        'rate': {v['rate']},")
        lines.append(f"        'channels': {v['channels']},")
        lines.append(f"        'provenance': {v['provenance']!r},")
        lines.append("        'payload': base64.b64decode(")
        for i in range(0, len(b64), 64):
            lines.append(f"            {b64[i:i + 64]!r}")
        lines.append("        ),")
        pcm = v["pcm16"]
        lines.append(f"        'pcm16': {pcm!r},")
        lines.append("    },")
    lines.append("}")
    out = "\n".join(lines) + "\n"
    with open("tests/audio_fixtures.py", "w") as f:
        f.write(out)
    print(f"wrote tests/audio_fixtures.py: {len(vectors)} vectors, "
          f"{len(out)} bytes")


if __name__ == "__main__":
    main()
