package graft

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MediaCodecs

/** Pure-JVM container codecs validated BOTH ways against the JDK's own
  * codecs (javax.imageio / javax.sound.sampled): our encoders' output
  * must decode identically under the JDK's readers, and the JDK
  * writers' output must decode identically under our parsers — so the
  * m-tier round-trips genuine format structure, not a private dialect.
  * No SparkSession needed: these are byte-level codecs.
  */
class MediaCodecsSpec extends AnyFunSuite {

  private def pixels(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 31 + seed * 7) % 256).toByte)

  // ------------------------------------------------------------- PNG

  test("our PNG decodes under ImageIO with identical pixels and dims") {
    for ((n, w) <- Seq((0, 1), (1, 1), (63, 8), (64, 8), (65, 8), (1000, 37))) {
      val px = pixels(n, n)
      val bytes = MediaCodecs.encodePng(px, w)
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO rejected our PNG (n=$n w=$w)")
      val h = math.max((n + w - 1) / w, 1)
      assert(img.getWidth == w && img.getHeight == h)
      for (r <- 0 until h; c <- 0 until w) {
        val idx = r * w + c
        val expected = if (idx < n) px(idx) & 0xff else 0
        assert(img.getRaster.getSample(c, r, 0) == expected,
          s"pixel ($c,$r) n=$n w=$w")
      }
    }
  }

  test("ImageIO-written grayscale PNG decodes under our parser " +
    "(exercises non-zero row filters)") {
    val w = 23; val h = 17
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    // a gradient: ImageIO's PNG encoder picks Sub/Up/Paeth filters on
    // smooth data, so this covers the non-trivial unfilter paths
    for (r <- 0 until h; c <- 0 until w)
      img.getRaster.setSample(c, r, 0, (r * 11 + c * 5) % 256)
    val bos = new java.io.ByteArrayOutputStream
    assert(ImageIO.write(img, "png", bos))
    val got = MediaCodecs.decodePng(bos.toByteArray)
    assert(got.width == w && got.height == h)
    for (r <- 0 until h; c <- 0 until w)
      assert((got.pixels(r * w + c) & 0xff) == (r * 11 + c * 5) % 256,
        s"pixel ($c,$r)")
  }

  test("our PNG round-trips through our own decoder, padding zeros") {
    val px = pixels(10, 3)
    val got = MediaCodecs.decodePng(MediaCodecs.encodePng(px, 4))
    assert(got.width == 4 && got.height == 3)
    assert(got.pixels.take(10).toSeq == px.toSeq)
    assert(got.pixels.drop(10).forall(_ == 0))
  }

  test("PNG decoder verifies chunk CRCs") {
    val bytes = MediaCodecs.encodePng(pixels(16, 1), 4)
    bytes(20) = (bytes(20) ^ 0x01).toByte // corrupt a byte inside IHDR
    val e = intercept[IllegalArgumentException](MediaCodecs.decodePng(bytes))
    assert(e.getMessage.contains("CRC"))
  }

  test("PNG IDAT stored-block size is the closed-form the oracle uses") {
    // n_bytes = 8 + 25 + (12 + 2 + 5*ceil(L/65535) + L + 4) + 12,
    // L = h*(w+1) — the m1 oracle's arithmetic
    for ((n, w) <- Seq((0, 1), (500, 17), (70000, 2))) {
      val h = math.max((n + w - 1) / w, 1)
      val L = h * (w + 1)
      val nb = math.max((L + 65534) / 65535, 1)
      val expected = 8 + 25 + (12 + 2 + 5 * nb + L + 4) + 12
      assert(MediaCodecs.encodePng(pixels(n, 2), w).length == expected,
        s"n=$n w=$w")
    }
  }

  // ------------------------------------------------------------- WAV

  test("our WAV decodes under AudioSystem with matching format and frames") {
    for (n <- Seq(0, 1, 2, 501, 1000)) {
      val samples = pixels(n, n)
      val bytes = MediaCodecs.encodeWav(samples)
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      val f = ais.getFormat
      assert(f.getChannels == 1 && f.getSampleSizeInBits == 8 &&
        f.getSampleRate == 8000f && ais.getFrameLength == n, s"n=$n")
      val read = ais.readAllBytes()
      assert(read.toSeq == samples.toSeq, s"n=$n")
    }
  }

  test("AudioSystem-written WAV decodes under our parser") {
    val samples = pixels(333, 9)
    val fmt = new AudioFormat(8000f, 8, 1, false, false) // unsigned 8-bit
    val ais = new AudioInputStream(
      new ByteArrayInputStream(samples), fmt, samples.length)
    val bos = new java.io.ByteArrayOutputStream
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val got = MediaCodecs.decodeWav(bos.toByteArray)
    assert(got.sampleRate == 8000 && got.nSamples == 333)
    assert(got.samples.toSeq == samples.toSeq)
  }

  test("WAV odd-length data gets the RIFF pad byte; size closed-form") {
    for (n <- Seq(0, 1, 7, 8)) {
      val bytes = MediaCodecs.encodeWav(pixels(n, 0))
      assert(bytes.length == 44 + n + n % 2, s"n=$n")
      assert(MediaCodecs.decodeWav(bytes).nSamples == n)
    }
  }

  // ------------------------------------------------------------- GIF

  test("our animated GIF decodes under ImageIO frame-for-frame") {
    val w = 4; val h = 4
    val frames = (0 until 7).map(f => pixels(w * h, f))
    val bytes = MediaCodecs.encodeGif(frames, w, h)
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    reader.setInput(ImageIO.createImageInputStream(
      new ByteArrayInputStream(bytes)))
    assert(reader.getNumImages(true) == 7)
    for (f <- 0 until 7) {
      val img = reader.read(f)
      assert(img.getWidth == w && img.getHeight == h, s"frame $f")
      // palette entry i is (i,i,i): the red channel equals the index
      for (r <- 0 until h; c <- 0 until w)
        assert((img.getRGB(c, r) & 0xff) == (frames(f)(r * w + c) & 0xff),
          s"frame $f pixel ($c,$r)")
    }
    reader.dispose()
  }

  test("our GIF round-trips through our own LZW decoder") {
    val w = 5; val h = 3
    val frames = (0 until 4).map(f => pixels(w * h, f + 11))
    val got = MediaCodecs.decodeGif(MediaCodecs.encodeGif(frames, w, h))
    assert(got.width == w && got.height == h && got.frames.length == 4)
    for (f <- 0 until 4)
      assert(got.frames(f).toSeq == frames(f).toSeq, s"frame $f")
  }

  test("GIF frames longer than the 250-literal clear cadence round-trip") {
    // one frame of 1000 pixels crosses the encoder's periodic clears
    val w = 40; val h = 25
    val frame = pixels(w * h, 5)
    val got = MediaCodecs.decodeGif(MediaCodecs.encodeGif(Seq(frame), w, h))
    assert(got.frames.head.toSeq == frame.toSeq)
  }

  test("ImageIO-written GIF (real compressed LZW) decodes under our parser") {
    val w = 19; val h = 13
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    // flat regions → ImageIO's LZW emits composite codes, exercising the
    // dictionary/KwKwK paths our fixed-9-bit encoder never produces
    for (r <- 0 until h; c <- 0 until w)
      img.getRaster.setSample(c, r, 0, if (c < 10) 40 else 200)
    val bos = new java.io.ByteArrayOutputStream
    assert(ImageIO.write(img, "gif", bos))
    val got = MediaCodecs.decodeGif(bos.toByteArray)
    assert(got.width == w && got.height == h && got.frames.length == 1)
    // indexes map through whatever palette ImageIO chose; the decoded
    // frame must still have exactly two index values with the left
    // region's index on the left
    val px = got.frames.head
    assert(px.toSet.size == 2)
    assert(px(0) == px(9) && px(10) == px(w - 1) && px(0) != px(10))
  }

  test("GIF file size is the closed-form the m1 oracle uses (4x4 frames)") {
    // per frame: 8 (GCE) + 10 (descriptor) + 1 (min code) + 23 (one
    // 21-byte sub-block + len + terminator); file = 781 + 42*F + 1
    for (f <- Seq(1, 5, 30)) {
      val frames = (0 until f).map(i => pixels(16, i))
      assert(MediaCodecs.encodeGif(frames, 4, 4).length == 782 + 42 * f,
        s"frames=$f")
    }
  }
}
