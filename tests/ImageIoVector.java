// Independent codec oracle for cross-validating the from-spec Python
// decoders/encoders in parquet_converters_spark.functions.*_codec against
// the JDK's javax.imageio implementations (JPEG/PNG/GIF/BMP readers and
// writers shipped with every JDK -- present wherever Spark runs, so this
// is a zero-extra-dependency external reference).
//
// Usage:
//   java ImageIoVector decode <in-image> <out-raw>
//       out-raw = ASCII header "W H 4\n" followed by W*H RGBA bytes
//       (normalized via BufferedImage.getRGB, independent of the
//       reader's internal raster layout).
//   java ImageIoVector encode <fmt> <w> <h> <c> <in-raw> <out-image> [opts]
//       fmt: jpg|png|gif|bmp ; c: 1 (gray), 3 (RGB), 4 (RGBA)
//       opts: semicolon-separated, "progressive" (JPEG SOF2 / GIF
//       interlace), "q=NN" (JPEG quality percent).
import java.awt.image.BufferedImage;
import java.awt.image.IndexColorModel;
import java.io.BufferedOutputStream;
import java.io.DataOutputStream;
import java.io.File;
import java.io.FileInputStream;
import java.io.FileOutputStream;
import java.io.IOException;
import java.util.LinkedHashMap;
import java.util.Map;
import javax.imageio.IIOImage;
import javax.imageio.ImageIO;
import javax.imageio.ImageWriteParam;
import javax.imageio.ImageWriter;
import javax.imageio.stream.ImageOutputStream;

public class ImageIoVector {
    public static void main(String[] a) throws Exception {
        if (a[0].equals("decode")) {
            decode(a[1], a[2]);
        } else if (a[0].equals("encode")) {
            encode(a[1], Integer.parseInt(a[2]), Integer.parseInt(a[3]),
                   Integer.parseInt(a[4]), a[5], a[6],
                   a.length > 7 ? a[7] : "");
        } else if (a[0].equals("wavdecode")) {
            wavDecode(a[1], a[2]);
        } else if (a[0].equals("wavencode")) {
            wavEncode(Integer.parseInt(a[1]), Integer.parseInt(a[2]),
                      a[3], a[4]);
        } else {
            throw new IllegalArgumentException("unknown mode " + a[0]);
        }
    }

    static void decode(String in, String out) throws Exception {
        BufferedImage img = ImageIO.read(new File(in));
        if (img == null) throw new IOException("ImageIO cannot read " + in);
        int w = img.getWidth(), h = img.getHeight();
        // Single-band (grayscale) images must be read straight off the
        // raster: getRGB() would route them through the linear-gray ->
        // sRGB ColorSpace conversion (a gamma curve), corrupting the
        // decoded sample values this oracle exists to report.
        boolean gray = img.getColorModel().getNumComponents() == 1;
        DataOutputStream o = new DataOutputStream(
            new BufferedOutputStream(new FileOutputStream(out)));
        o.writeBytes(w + " " + h + " 4\n");
        for (int y = 0; y < h; y++) {
            for (int x = 0; x < w; x++) {
                int r, g, b, al;
                if (gray) {
                    r = g = b = img.getRaster().getSample(x, y, 0);
                    al = 0xFF;
                } else {
                    int p = img.getRGB(x, y);
                    r = (p >> 16) & 0xFF;
                    g = (p >> 8) & 0xFF;
                    b = p & 0xFF;
                    al = (p >>> 24) & 0xFF;
                }
                o.writeByte(r);
                o.writeByte(g);
                o.writeByte(b);
                o.writeByte(al);
            }
        }
        o.close();
    }

    static void encode(String fmt, int w, int h, int c, String in,
                       String out, String opts) throws Exception {
        byte[] raw;
        try (FileInputStream f = new FileInputStream(in)) {
            raw = f.readAllBytes();
        }
        if (raw.length != w * h * c)
            throw new IOException("raw length " + raw.length + " != "
                                  + (w * h * c));
        BufferedImage img;
        if (c == 1) {
            img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY);
            img.getRaster().setDataElements(0, 0, w, h, raw);
        } else if (fmt.equals("gif")) {
            img = indexedImage(w, h, c, raw);
        } else {
            int type = (c == 4) ? BufferedImage.TYPE_INT_ARGB
                                : BufferedImage.TYPE_3BYTE_BGR;
            img = new BufferedImage(w, h, type);
            setPixels(img, w, h, c, raw);
        }
        ImageWriter wr = ImageIO.getImageWritersByFormatName(fmt).next();
        ImageWriteParam p = wr.getDefaultWriteParam();
        for (String t : opts.split(";")) {
            if (t.equals("progressive") && p.canWriteProgressive())
                p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT);
            if (t.startsWith("q=")) {
                p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
                p.setCompressionQuality(
                    Float.parseFloat(t.substring(2)) / 100f);
            }
        }
        try (ImageOutputStream ios =
                 ImageIO.createImageOutputStream(new File(out))) {
            wr.setOutput(ios);
            wr.write(null, new IIOImage(img, null, null), p);
        }
        wr.dispose();
    }

    static void setPixels(BufferedImage img, int w, int h, int c,
                          byte[] raw) {
        for (int y = 0; y < h; y++) {
            for (int x = 0; x < w; x++) {
                int i = (y * w + x) * c;
                int r = raw[i] & 0xFF, g = raw[i + 1] & 0xFF,
                    b = raw[i + 2] & 0xFF;
                int al = (c == 4) ? raw[i + 3] & 0xFF : 0xFF;
                img.setRGB(x, y, (al << 24) | (r << 16) | (g << 8) | b);
            }
        }
    }

    // WAV oracle via javax.sound.sampled (also ships with every JDK):
    // wavdecode <in.wav> <out>: "rate channels bits\n" + raw PCM bytes
    // (little-endian, as stored).
    static void wavDecode(String in, String out) throws Exception {
        javax.sound.sampled.AudioInputStream ais =
            javax.sound.sampled.AudioSystem.getAudioInputStream(
                new File(in));
        javax.sound.sampled.AudioFormat f = ais.getFormat();
        byte[] pcm = ais.readAllBytes();
        ais.close();
        DataOutputStream o = new DataOutputStream(
            new BufferedOutputStream(new FileOutputStream(out)));
        o.writeBytes((int) f.getSampleRate() + " " + f.getChannels() + " "
                     + f.getSampleSizeInBits()
                     + (f.isBigEndian() ? " be" : " le") + "\n");
        o.write(pcm);
        o.close();
    }

    // wavencode <rate> <channels> <in-pcm16le> <out.wav>
    static void wavEncode(int rate, int channels, String in, String out)
            throws Exception {
        byte[] pcm;
        try (FileInputStream f = new FileInputStream(in)) {
            pcm = f.readAllBytes();
        }
        javax.sound.sampled.AudioFormat fmt =
            new javax.sound.sampled.AudioFormat(rate, 16, channels, true,
                                                false);
        javax.sound.sampled.AudioInputStream ais =
            new javax.sound.sampled.AudioInputStream(
                new java.io.ByteArrayInputStream(pcm), fmt,
                pcm.length / (2L * channels));
        javax.sound.sampled.AudioSystem.write(
            ais, javax.sound.sampled.AudioFileFormat.Type.WAVE,
            new File(out));
    }

    // GIF needs an indexed raster; build an exact palette from the
    // (<=256 distinct colors by construction) input pixels.
    static BufferedImage indexedImage(int w, int h, int c, byte[] raw)
            throws IOException {
        Map<Integer, Integer> pal = new LinkedHashMap<>();
        int[] idx = new int[w * h];
        for (int p = 0; p < w * h; p++) {
            int i = p * c;
            int rgb = ((raw[i] & 0xFF) << 16) | ((raw[i + 1] & 0xFF) << 8)
                      | (raw[i + 2] & 0xFF);
            Integer k = pal.get(rgb);
            if (k == null) {
                k = pal.size();
                if (k >= 256) throw new IOException(">256 colors for GIF");
                pal.put(rgb, k);
            }
            idx[p] = k;
        }
        int n = Math.max(2, pal.size());
        byte[] rr = new byte[n], gg = new byte[n], bb = new byte[n];
        for (Map.Entry<Integer, Integer> e : pal.entrySet()) {
            int rgb = e.getKey(), k = e.getValue();
            rr[k] = (byte) (rgb >> 16);
            gg[k] = (byte) (rgb >> 8);
            bb[k] = (byte) rgb;
        }
        IndexColorModel icm = new IndexColorModel(8, n, rr, gg, bb);
        BufferedImage img = new BufferedImage(
            w, h, BufferedImage.TYPE_BYTE_INDEXED, icm);
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++)
                img.getRaster().setSample(x, y, 0, idx[y * w + x]);
        return img;
    }
}
