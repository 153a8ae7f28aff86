"""Generate tests/tiff_fixtures.py — JDK-authored TIFF known-answer vectors.

The external author is the JDK's own javax.imageio TIFF *writer*
(present since Java 9 — the same plugin the decode seam bridges): for
each (image type x compression) combination it can express, a
deterministic pixel matrix is handed to a small one-shot Java program
(compiled here) that encodes it to TIFF; the original pixels ride
alongside as the expected lossless decode.  tests/test_tiff_codec.py
asserts the from-spec decoder (functions/tiff_codec.py) reproduces
them byte-exactly with zero optional dependencies.

Usage:  PYTHONPATH=/root/repo python scripts/make_tiff_fixtures.py
(needs javac+java; deterministic — the test suite asserts that
regenerating reproduces the committed bytes).
"""

import base64
import os
import pathlib
import shutil
import struct
import subprocess
import tempfile

_JAVA = r"""
import java.awt.image.BufferedImage;
import java.io.DataInputStream;
import java.io.FileInputStream;
import java.io.File;
import javax.imageio.IIOImage;
import javax.imageio.ImageIO;
import javax.imageio.ImageWriteParam;
import javax.imageio.ImageWriter;
import javax.imageio.stream.FileImageOutputStream;

public class TiffWriteProbe {
    // args: inPixels outTiff type w h compression
    // type: gray | gray16 | rgb | rgba
    public static void main(String[] a) throws Exception {
        String type = a[2];
        int w = Integer.parseInt(a[3]), h = Integer.parseInt(a[4]);
        DataInputStream in =
            new DataInputStream(new FileInputStream(a[0]));
        BufferedImage img;
        if (type.equals("gray")) {
            img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY);
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++)
                    img.getRaster().setSample(x, y, 0, in.readUnsignedByte());
        } else if (type.equals("gray16")) {
            img = new BufferedImage(w, h, BufferedImage.TYPE_USHORT_GRAY);
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++)
                    img.getRaster().setSample(x, y, 0, in.readUnsignedShort());
        } else {
            boolean alpha = type.equals("rgba");
            img = new BufferedImage(w, h, alpha
                ? BufferedImage.TYPE_INT_ARGB : BufferedImage.TYPE_INT_RGB);
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++) {
                    int r = in.readUnsignedByte();
                    int g = in.readUnsignedByte();
                    int b = in.readUnsignedByte();
                    int al = alpha ? in.readUnsignedByte() : 255;
                    img.setRGB(x, y, (al << 24) | (r << 16) | (g << 8) | b);
                }
        }
        in.close();
        ImageWriter wr =
            ImageIO.getImageWritersByFormatName("TIFF").next();
        ImageWriteParam p = wr.getDefaultWriteParam();
        String comp = a[5];
        if (!comp.equals("None")) {
            p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
            p.setCompressionType(comp);
        }
        FileImageOutputStream out =
            new FileImageOutputStream(new File(a[1]));
        wr.setOutput(out);
        wr.write(null, new IIOImage(img, null, null), p);
        out.close();
        // print the supported compression names once for provenance
        for (String c : p.getCompressionTypes()) System.out.println(c);
    }
}
"""


def _pattern(w, h, c, seed=0):
    return bytes(
        (x * 31 + y * 17 + k * 11 + seed) % 256
        for y in range(h)
        for x in range(w)
        for k in range(c)
    )


def _smoothish(w, h, c, seed=0):
    # runs + gradients so LZW/PackBits/Deflate have something to chew
    out = bytearray()
    for y in range(h):
        for x in range(w):
            for k in range(c):
                v = (x // 4 * 16 + y // 3 * 9 + k * 40 + seed) % 256
                out.append(v)
    return bytes(out)


def main():
    javac = shutil.which("javac")
    java = shutil.which("java")
    assert javac and java, "needs a JDK"
    work = tempfile.mkdtemp(prefix="tiff_fixtures_")
    src = os.path.join(work, "TiffWriteProbe.java")
    with open(src, "w") as f:
        f.write(_JAVA)
    subprocess.run([javac, "-d", work, src], check=True,
                   capture_output=True)

    vectors = {}
    w, h = 21, 13  # odd sizes exercise row padding

    def author(name, typ, channels, comp, pixels, bits=8):
        pin = os.path.join(work, "px.bin")
        pout = os.path.join(work, "out.tif")
        if bits == 16:
            # pixels given as 8-bit; widen to 16 (v<<8 | v) for java
            with open(pin, "wb") as f:
                for v in pixels:
                    f.write(struct.pack(">H", (v << 8) | v))
        else:
            with open(pin, "wb") as f:
                f.write(pixels)
        r = subprocess.run(
            [java, "-cp", work, "TiffWriteProbe", pin, pout, typ,
             str(w), str(h), comp],
            check=True, capture_output=True, text=True,
        )
        vectors[name] = {
            "payload": open(pout, "rb").read(),
            "size": (w, h),
            "channels": channels,
            "pixels": pixels,
            "provenance": (
                f"JDK javax.imageio TIFF writer, type={typ}, "
                f"compression={comp}"
            ),
        }
        return r.stdout.split()

    supported = author("gray_none", "gray", 1, "None",
                       _smoothish(w, h, 1, 1))
    comps = [c for c in ("LZW", "Deflate", "ZLib", "PackBits")
             if c in supported]
    for comp in comps:
        author(f"gray_{comp.lower()}", "gray", 1, comp,
               _smoothish(w, h, 1, 2))
        author(f"rgb_{comp.lower()}", "rgb", 3, comp,
               _smoothish(w, h, 3, 3))
    author("rgb_none", "rgb", 3, "None", _pattern(w, h, 3, 4))
    author("rgba_none", "rgba", 4, "None", _pattern(w, h, 4, 5))
    if "LZW" in comps:
        author("rgba_lzw", "rgba", 4, "LZW", _smoothish(w, h, 4, 6))
    author("gray16_none", "gray16", 1, "None",
           _smoothish(w, h, 1, 7), bits=16)
    if "LZW" in comps:
        author("gray16_lzw", "gray16", 1, "LZW",
               _smoothish(w, h, 1, 8), bits=16)

    lines = [
        '"""Embedded TIFF known-answer vectors (generated — do not edit).',
        "",
        "Regenerate: PYTHONPATH=/root/repo python "
        "scripts/make_tiff_fixtures.py",
        "Author: the JDK javax.imageio TIFF writer (see the generator",
        "docstring).  pixels are the original (= expected lossless",
        'decode) samples; 16-bit vectors expect the >>8 narrowing."""',
        "",
        "import base64",
        "",
        "VECTORS = {",
    ]
    for name in sorted(vectors):
        v = vectors[name]
        b64 = base64.b64encode(v["payload"]).decode()
        px64 = base64.b64encode(v["pixels"]).decode()
        lines.append(f"    {name!r}: {{")
        lines.append(f"        'size': {v['size']!r},")
        lines.append(f"        'channels': {v['channels']},")
        lines.append(f"        'provenance': {v['provenance']!r},")
        lines.append("        'payload': base64.b64decode(")
        for i in range(0, len(b64), 64):
            lines.append(f"            {b64[i:i + 64]!r}")
        lines.append("        ),")
        lines.append("        'pixels': base64.b64decode(")
        for i in range(0, len(px64), 64):
            lines.append(f"            {px64[i:i + 64]!r}")
        lines.append("        ),")
        lines.append("    },")
    lines.append("}")
    out = "\n".join(lines) + "\n"
    pathlib.Path("tests/tiff_fixtures.py").write_text(out)
    print(f"wrote tests/tiff_fixtures.py: {len(vectors)} vectors, "
          f"{len(out)} bytes; writer supports {supported}")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
