#!/usr/bin/env python3
"""Generate tests/imageio_fixtures.py: externally-produced image bytes
plus their externally-decoded pixels, embedded as hex constants.

The external implementation is the JDK's javax.imageio (via
tests/ImageIoVector.java) — an independent, widely-deployed codec stack
sharing no code or design with our from-spec Python codecs.  Embedding
the bytes makes the known-answer tests (tests/test_external_vectors.py)
self-contained: they assert exact (lossless) or +-2 (JPEG) pixel output
with no subprocess, no network, and no optional Python deps.

Regenerate with:  PYTHONPATH=/root/repo python scripts/make_imageio_fixtures.py
"""

import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def pattern(w, h, c, seed=7):
    return bytes(
        (x * 7 + y * 13 + ch * 29 + seed) % 256
        for y in range(h)
        for x in range(w)
        for ch in range(c)
    )


def smooth(w, h, c):
    return bytes(
        (x * 3 + y * 2 + ch * 5) % 256
        for y in range(h)
        for x in range(w)
        for ch in range(c)
    )


def palette_img(w, h):
    pal = [(10, 20, 30), (200, 100, 50), (0, 255, 128), (255, 255, 0), (5, 5, 5)]
    return bytes(
        b for y in range(h) for x in range(w) for b in pal[(x + 2 * y) % 5]
    )


def main():
    work = Path(tempfile.mkdtemp(prefix="iio_fixtures_"))
    (work / "ImageIoVector.java").write_bytes(
        (REPO / "tests" / "ImageIoVector.java").read_bytes()
    )
    subprocess.run(["javac", str(work / "ImageIoVector.java")], check=True)
    jdk = subprocess.run(
        ["java", "-version"], capture_output=True, text=True
    ).stderr.strip().splitlines()[0]

    def run(*args):
        subprocess.run(
            ["java", "-cp", str(work), "ImageIoVector", *args],
            check=True,
            capture_output=True,
        )

    def jenc(fmt, w, h, c, raw, opts=""):
        (work / "in.raw").write_bytes(raw)
        out = work / f"out.{fmt}"
        args = ["encode", fmt, str(w), str(h), str(c), str(work / "in.raw"), str(out)]
        if opts:
            args.append(opts)
        run(*args)
        return out.read_bytes()

    def jdec(data, suffix):
        src = work / f"d{suffix}"
        src.write_bytes(data)
        run("decode", str(src), str(work / "d.raw"))
        raw = (work / "d.raw").read_bytes()
        nl = raw.index(b"\n")
        w, h, _ = map(int, raw[:nl].split())
        return w, h, raw[nl + 1 :]

    fixtures = {}

    def add(name, fmt, w, h, c, raw, opts, tol):
        data = jenc(fmt, w, h, c, raw, opts)
        jw, jh, rgba = jdec(data, "." + fmt)
        assert (jw, jh) == (w, h), name
        fixtures[name] = {
            "format": fmt,
            "width": w,
            "height": h,
            "encoder_opts": opts,
            "tolerance": tol,
            "data_hex": data.hex(),
            "expected_rgba_hex": rgba.hex(),
        }
        print(f"{name}: {len(data)} file bytes, tol={tol}")

    # lossless: exact pixel assertions
    add("png_rgb", "png", 13, 7, 3, pattern(13, 7, 3), "", 0)
    add("png_gray", "png", 13, 7, 1, pattern(13, 7, 1), "", 0)
    add("png_rgba", "png", 13, 7, 4, pattern(13, 7, 4), "", 0)
    add("bmp24", "bmp", 13, 7, 3, pattern(13, 7, 3), "", 0)
    add("gif_interlaced", "gif", 13, 7, 3, palette_img(13, 7), "", 0)
    # JPEG: two independent decoders agree within +-2 (IDCT/rounding slack)
    add("jpeg_gray_baseline", "jpg", 24, 16, 1, pattern(24, 16, 1), "q=90", 2)
    add("jpeg_gray_progressive", "jpg", 24, 16, 1, pattern(24, 16, 1),
        "q=90;progressive", 2)
    add("jpeg_color_baseline", "jpg", 24, 16, 3, smooth(24, 16, 3), "q=90", 2)
    add("jpeg_color_progressive", "jpg", 24, 16, 3, smooth(24, 16, 3),
        "q=90;progressive", 2)

    out = REPO / "tests" / "imageio_fixtures.py"
    with out.open("w") as f:
        f.write('"""AUTO-GENERATED known-answer vectors — do not edit.\n\n')
        f.write("Provenance: every byte string below was produced by the\n")
        f.write("JDK's javax.imageio codecs via tests/ImageIoVector.java,\n")
        f.write("and every expected_rgba buffer is that SAME independent\n")
        f.write("implementation's decode of those bytes (gray read straight\n")
        f.write("off the raster, no colorspace conversion).\n\n")
        f.write(f"Generator JDK: {jdk}\n")
        f.write("Regenerate: PYTHONPATH=/root/repo python "
                "scripts/make_imageio_fixtures.py\n")
        f.write('"""\n\n')
        f.write("FIXTURES = {\n")
        for name, fx in fixtures.items():
            f.write(f"    {name!r}: {{\n")
            for k, v in fx.items():
                f.write(f"        {k!r}: {v!r},\n")
            f.write("    },\n")
        f.write("}\n")
    print(f"wrote {out} ({out.stat().st_size} bytes)")


if __name__ == "__main__":
    sys.exit(main())
