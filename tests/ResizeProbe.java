import java.awt.image.AffineTransformOp;
import java.awt.image.BufferedImage;
import java.awt.geom.AffineTransform;
import java.awt.Image;
import java.awt.Graphics2D;

public class ResizeProbe {
    // args: w h nw nh mode: reads W*H*3 RGB on stdin, writes NW*NH*3 on stdout
    public static void main(String[] a) throws Exception {
        int w = Integer.parseInt(a[0]), h = Integer.parseInt(a[1]);
        int nw = Integer.parseInt(a[2]), nh = Integer.parseInt(a[3]);
        byte[] in = System.in.readAllBytes();
        BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB);
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int i = (y * w + x) * 3;
                img.setRGB(x, y, ((in[i]&0xff)<<16)|((in[i+1]&0xff)<<8)|(in[i+2]&0xff));
            }
        BufferedImage out = new BufferedImage(nw, nh, BufferedImage.TYPE_INT_RGB);
        if (a[4].equals("affine")) {
            AffineTransform t = AffineTransform.getScaleInstance((double)nw/w, (double)nh/h);
            new AffineTransformOp(t, AffineTransformOp.TYPE_NEAREST_NEIGHBOR).filter(img, out);
        } else {
            Image scaled = img.getScaledInstance(nw, nh, Image.SCALE_AREA_AVERAGING);
            Graphics2D g = out.createGraphics();
            g.drawImage(scaled, 0, 0, null);
            g.dispose();
        }
        byte[] ob = new byte[nw*nh*3];
        for (int y = 0; y < nh; y++)
            for (int x = 0; x < nw; x++) {
                int p = out.getRGB(x, y), i = (y*nw+x)*3;
                ob[i] = (byte)(p>>16); ob[i+1] = (byte)(p>>8); ob[i+2] = (byte)p;
            }
        System.out.write(ob); System.out.flush();
    }
}
