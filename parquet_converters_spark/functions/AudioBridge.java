// Persistent stdin/stdout audio-decode bridge for the decode_media
// decoder= seam (functions/native_codecs.py:jdk_sound_media_decoder)
// and the external-oracle legs of tests/test_audio_codecs.py.
//
// javax.sound.sampled ships WAVE/AU/AIFF readers (PCM all depths,
// G.711 u-law/A-law) with every JVM -- the same zero-extra-dependency
// argument as ImageIoBridge.java.  One long-lived process per Python
// worker; the per-file cost is one pipe round-trip.
//
// Protocol (big-endian, matching java.io.Data{Input,Output}Stream):
//   request:  int32 payloadLen, payload bytes (a complete audio file)
//   response: byte 0, int32 sampleRate, byte channels,
//             int32 sampleCount, sampleCount int16 PCM samples
//          or byte 1, int32 msgLen, UTF-8 error message
// Samples are interleaved, normalized to PCM_SIGNED 16-bit via
// AudioSystem.getAudioInputStream(targetFormat, stream) -- the JDK's
// own conversion, which the from-spec decoders are asserted equal to.

import java.io.BufferedInputStream;
import java.io.BufferedOutputStream;
import java.io.ByteArrayInputStream;
import java.io.ByteArrayOutputStream;
import java.io.DataInputStream;
import java.io.DataOutputStream;
import java.io.EOFException;
import java.io.IOException;
import javax.sound.sampled.AudioFormat;
import javax.sound.sampled.AudioInputStream;
import javax.sound.sampled.AudioSystem;

public class AudioBridge {
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
                AudioInputStream src = AudioSystem.getAudioInputStream(
                    new ByteArrayInputStream(buf));
                AudioFormat f = src.getFormat();
                int channels = f.getChannels();
                int rate = Math.round(f.getSampleRate());
                AudioFormat target = new AudioFormat(
                    AudioFormat.Encoding.PCM_SIGNED, f.getSampleRate(),
                    16, channels, channels * 2, f.getSampleRate(), true);
                AudioInputStream pcm =
                    AudioSystem.getAudioInputStream(target, src);
                ByteArrayOutputStream acc = new ByteArrayOutputStream();
                byte[] chunk = new byte[1 << 16];
                long cap = (1L << 28) * 2;  // PCM16 allocation guard
                int r;
                while ((r = pcm.read(chunk)) > 0) {
                    acc.write(chunk, 0, r);
                    if (acc.size() > cap) {
                        throw new IOException(
                            "audio exceeds sample allocation guard");
                    }
                }
                byte[] px = acc.toByteArray();
                out.writeByte(0);
                out.writeInt(rate);
                out.writeByte(channels);
                out.writeInt(px.length / 2);
                out.write(px);  // already big-endian PCM16 per target
            } catch (Throwable e) {
                byte[] msg = String.valueOf(e).getBytes("UTF-8");
                out.writeByte(1);
                out.writeInt(msg.length);
                out.write(msg);
            }
            out.flush();
        }
    }
}
