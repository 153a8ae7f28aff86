// Persistent stdin/stdout image-decode bridge for the decode_media
// decoder= seam (functions/native_codecs.py:jdk_imageio_media_decoder).
//
// The JDK ships javax.imageio JPEG/PNG/GIF/BMP codecs with every JVM,
// and a JVM is a hard Spark dependency -- so this bridge gives every
// executor a native-speed decoder with zero extra dependencies.  One
// long-lived process per Python worker; the per-image cost is one
// pipe round-trip, not a JVM start.
//
// Protocol (big-endian, matching java.io.Data{Input,Output}Stream):
//   request:  int32 payloadLen, payload bytes (a complete image file)
//   response: byte 0, int32 w, int32 h, byte channels, w*h*c samples
//          or byte 1, int32 msgLen, UTF-8 error message
// Channels: 1 = grayscale (read off the raster -- getRGB would apply
// the linear-gray->sRGB gamma, see tests/ImageIoVector.java), 3 = RGB,
// 4 = RGBA.

import java.awt.image.BufferedImage;
import java.io.BufferedInputStream;
import java.io.BufferedOutputStream;
import java.io.ByteArrayInputStream;
import java.io.DataInputStream;
import java.io.DataOutputStream;
import java.io.EOFException;
import java.io.IOException;

public class ImageIoBridge {
    public static void main(String[] args) throws Exception {
        DataInputStream in =
            new DataInputStream(new BufferedInputStream(System.in));
        DataOutputStream out =
            new DataOutputStream(new BufferedOutputStream(System.out));
        while (true) {
            int n;
            try {
                n = in.readInt();
            } catch (EOFException e) {
                break;  // parent closed the pipe: clean shutdown
            }
            if (n < 0 || n > (1 << 30)) break;
            byte[] buf = new byte[n];
            in.readFully(buf);
            try {
                BufferedImage img =
                    javax.imageio.ImageIO.read(new ByteArrayInputStream(buf));
                if (img == null) {
                    throw new IOException("ImageIO: unsupported format");
                }
                int w = img.getWidth(), h = img.getHeight();
                if ((long) w * h > (1L << 28)) {
                    // mirror the Python-side _MAX_PIXELS guard before
                    // allocating the sample buffer
                    throw new IOException(
                        "ImageIO: image exceeds pixel allocation guard");
                }
                boolean gray = img.getColorModel().getNumComponents() == 1;
                boolean alpha = img.getColorModel().hasAlpha();
                int c = gray ? 1 : (alpha ? 4 : 3);
                byte[] px = new byte[w * h * c];
                int i = 0;
                if (gray) {
                    for (int y = 0; y < h; y++) {
                        for (int x = 0; x < w; x++) {
                            px[i++] =
                                (byte) img.getRaster().getSample(x, y, 0);
                        }
                    }
                } else {
                    for (int y = 0; y < h; y++) {
                        for (int x = 0; x < w; x++) {
                            int p = img.getRGB(x, y);
                            px[i++] = (byte) (p >> 16);
                            px[i++] = (byte) (p >> 8);
                            px[i++] = (byte) p;
                            if (c == 4) px[i++] = (byte) (p >>> 24);
                        }
                    }
                }
                out.writeByte(0);
                out.writeInt(w);
                out.writeInt(h);
                out.writeByte(c);
                out.write(px);
            } catch (Throwable e) {
                // Throwable, not Exception: an OutOfMemoryError from a
                // hostile payload must surface as an in-band error
                // frame, not kill the bridge with the response unsent
                byte[] msg = String.valueOf(e).getBytes("UTF-8");
                out.writeByte(1);
                out.writeInt(msg.length);
                out.write(msg);
            }
            out.flush();
        }
    }
}
