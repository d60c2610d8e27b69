package graft.functions

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{Adler32, CRC32, Inflater}

/** Pure-JVM media container codecs — REAL bytes for the multimodal tier
  * (no codec libraries in this sandbox, and none needed: PNG's zlib is
  * `java.util.zip`, WAV is raw PCM in a RIFF wrapper, and GIF's LZW is
  * ~60 lines of standard code). The [[graft.operators.Multimodal]]
  * generator emits these formats and its decoder parses them back, so
  * the m-tier round-trips genuine container structure end-to-end:
  *
  *  - PNG: 8-bit grayscale, full IHDR/IDAT/IEND with verified CRC32s,
  *    zlib-stored IDAT (deterministic size — the oracle computes the
  *    exact file length), all five PNG row filters accepted on decode
  *    (so externally-encoded files, e.g. javax.imageio's, parse too).
  *  - WAV: canonical 44-byte RIFF/fmt/data PCM layout, chunk-walking
  *    decode (odd-length data padded per the RIFF rule).
  *  - GIF: animated GIF89a with a global 256-entry palette, one image
  *    descriptor per frame, REAL LZW in both directions (encoder uses
  *    the fixed-9-bit clear-code scheme every "uncompressed GIF" writer
  *    uses; decoder is a full variable-width LZW with code growth, so
  *    it reads externally-encoded streams as well).
  *
  * Encoders are deterministic byte-for-byte (no timestamps, no encoder
  * metadata), which is what makes the m-tier DuckDB-oracle-exact: the
  * oracle replays the size/dimension arithmetic, the engine round-trips
  * the actual bytes. MediaCodecsSpec cross-validates against the JDK's
  * own ImageIO / AudioSystem codecs.
  */
object MediaCodecs {

  // ------------------------------------------------------------- PNG

  final case class PngImage(width: Int, height: Int, pixels: Array[Byte])

  private val PngSig =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private def pngChunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val t = tag.getBytes("US-ASCII")
    val bb = ByteBuffer.allocate(12 + data.length)
    bb.putInt(data.length).put(t).put(data)
    val crc = new CRC32
    crc.update(t); crc.update(data)
    bb.putInt(crc.getValue.toInt)
    bb.array
  }

  /** zlib stream with STORED (uncompressed) deflate blocks: size is a
    * closed-form function of the payload — 2 (header) + 5 per block +
    * payload + 4 (adler) — which the DuckDB oracle can replay exactly,
    * unlike a compressed stream whose length depends on the deflater.
    */
  private def zlibStored(raw: Array[Byte]): Array[Byte] = {
    val nb = math.max((raw.length + 65534) / 65535, 1)
    val bb = ByteBuffer.allocate(2 + 5 * nb + raw.length + 4)
    bb.put(0x78.toByte).put(0x01.toByte)
    var off = 0
    var i = 0
    while (i < nb) {
      val m = math.min(65535, raw.length - off)
      bb.put(if (i == nb - 1) 1.toByte else 0.toByte)
      bb.order(ByteOrder.LITTLE_ENDIAN)
      bb.putShort((m & 0xffff).toShort).putShort((~m & 0xffff).toShort)
      bb.order(ByteOrder.BIG_ENDIAN)
      bb.put(raw, off, m)
      off += m
      i += 1
    }
    val ad = new Adler32
    ad.update(raw)
    bb.putInt(ad.getValue.toInt)
    bb.array
  }

  /** Encode 8-bit grayscale pixels (row-major, zero-padded to fill the
    * last row) as a complete, valid PNG. height = ceil(len/width), min 1.
    */
  def encodePng(pixels: Array[Byte], width: Int): Array[Byte] = {
    require(width >= 1, s"png width must be >= 1, got $width")
    val height = math.max((pixels.length + width - 1) / width, 1)
    val stride = width + 1
    val raw = new Array[Byte](height * stride) // filter byte 0 + row
    var r = 0
    while (r < height) {
      var c = 0
      while (c < width) {
        val idx = r * width + c
        if (idx < pixels.length) raw(r * stride + 1 + c) = pixels(idx)
        c += 1
      }
      r += 1
    }
    val ihdr = ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
      .put(8.toByte).put(0.toByte)               // bit depth 8, grayscale
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, none
    PngSig ++ pngChunk("IHDR", ihdr.array) ++
      pngChunk("IDAT", zlibStored(raw)) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  private def u32be(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) |
      ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)

  /** Parse an 8-bit grayscale PNG: chunk walk with CRC verification,
    * inflate IDAT (any zlib stream, not just our stored form), and
    * un-filter with all five PNG filter types — external encoders pick
    * per-row filters freely. For grayscale-8 the "previous pixel" of
    * the filter algebra is one byte left / one row up.
    */
  def decodePng(bytes: Array[Byte]): PngImage = {
    require(bytes.length >= 8 && PngSig.indices.forall(i => bytes(i) == PngSig(i)),
      "not a PNG: bad signature")
    var pos = 8
    var width = -1
    var height = -1
    val idat = new java.io.ByteArrayOutputStream
    var done = false
    while (!done) {
      require(pos + 12 <= bytes.length, "truncated PNG chunk")
      val len = u32be(bytes, pos)
      val tag = new String(bytes, pos + 4, 4, "US-ASCII")
      require(pos + 12 + len <= bytes.length, s"truncated $tag chunk")
      val crc = new CRC32
      crc.update(bytes, pos + 4, 4 + len)
      require(crc.getValue.toInt == u32be(bytes, pos + 8 + len),
        s"CRC mismatch in $tag chunk")
      tag match {
        case "IHDR" =>
          width = u32be(bytes, pos + 8)
          height = u32be(bytes, pos + 12)
          require(bytes(pos + 16) == 8 && bytes(pos + 17) == 0,
            "only 8-bit grayscale PNGs supported")
          require(bytes(pos + 20) == 0, "interlaced PNGs not supported")
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => done = true
        case _      => () // ancillary chunks skipped
      }
      pos += 12 + len
    }
    require(width > 0 && height > 0, "PNG missing IHDR")
    val stride = width + 1
    val raw = new Array[Byte](height * stride)
    val inf = new Inflater
    inf.setInput(idat.toByteArray)
    var o = 0
    while (o < raw.length && !inf.finished()) {
      val n = inf.inflate(raw, o, raw.length - o)
      require(n > 0 || !inf.needsInput, "truncated IDAT stream")
      o += n
    }
    inf.end()
    require(o == raw.length, s"IDAT short: $o of ${raw.length}")
    val px = new Array[Byte](width * height)
    var r = 0
    while (r < height) {
      val ft = raw(r * stride) & 0xff
      var c = 0
      while (c < width) {
        val x = raw(r * stride + 1 + c) & 0xff
        val a = if (c > 0) px(r * width + c - 1) & 0xff else 0          // left
        val b = if (r > 0) px((r - 1) * width + c) & 0xff else 0        // up
        val cc = if (c > 0 && r > 0) px((r - 1) * width + c - 1) & 0xff else 0
        val recon = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 => // Paeth
            val p = a + b - cc
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - cc)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else cc)
          case other => throw new IllegalArgumentException(
            s"unknown PNG filter type $other")
        }
        px(r * width + c) = (recon & 0xff).toByte
        c += 1
      }
      r += 1
    }
    PngImage(width, height, px)
  }

  // ------------------------------------------------------------- WAV

  final case class WavAudio(sampleRate: Int, nSamples: Int,
                            samples: Array[Byte])

  /** Canonical 44-byte-header mono 8-bit PCM WAV; odd-length data gets
    * the RIFF pad byte (excluded from the data chunk's declared size).
    */
  def encodeWav(samples: Array[Byte], sampleRate: Int = 8000): Array[Byte] = {
    val pad = samples.length % 2
    val bb = ByteBuffer.allocate(44 + samples.length + pad)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII"))
      .putInt(36 + samples.length + pad)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                    // PCM
      .putShort(1)                    // mono
      .putInt(sampleRate)
      .putInt(sampleRate)             // byte rate (mono 8-bit)
      .putShort(1)                    // block align
      .putShort(8)                    // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(samples.length)
      .put(samples)
    bb.array // trailing pad byte (if any) stays zero
  }

  private def u32le(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
      ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
  private def u16le(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)

  /** RIFF chunk walk (not fixed offsets — external writers insert LIST/
    * fact chunks) to fmt + data; mono 8-bit PCM only.
    */
  def decodeWav(bytes: Array[Byte]): WavAudio = {
    require(bytes.length >= 12 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE", "not a RIFF/WAVE file")
    var pos = 12
    var rate = -1
    var data: Array[Byte] = null
    while (pos + 8 <= bytes.length && (rate < 0 || data == null)) {
      val tag = new String(bytes, pos, 4, "US-ASCII")
      val len = u32le(bytes, pos + 4)
      require(pos + 8 + len <= bytes.length, s"truncated $tag chunk")
      tag match {
        case "fmt " =>
          require(u16le(bytes, pos + 8) == 1, "only PCM WAV supported")
          require(u16le(bytes, pos + 10) == 1 && u16le(bytes, pos + 22) == 8,
            "only mono 8-bit WAV supported")
          rate = u32le(bytes, pos + 12)
        case "data" =>
          data = java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + len)
        case _ => ()
      }
      pos += 8 + len + (len % 2) // RIFF pad byte on odd chunks
    }
    require(rate > 0 && data != null, "WAV missing fmt or data chunk")
    WavAudio(rate, data.length, data)
  }

  // ------------------------------------------------------------- GIF

  final case class GifVideo(width: Int, height: Int,
                            frames: Seq[Array[Byte]])

  /** LSB-first bit packer over 255-byte GIF sub-blocks. */
  private final class GifBitWriter(out: java.io.ByteArrayOutputStream) {
    private var cur = 0
    private var nBits = 0
    private val block = new Array[Byte](255)
    private var blockLen = 0
    def put(code: Int, width: Int): Unit = {
      cur |= code << nBits
      nBits += width
      while (nBits >= 8) {
        block(blockLen) = (cur & 0xff).toByte
        blockLen += 1
        if (blockLen == 255) flushBlock()
        cur >>>= 8
        nBits -= 8
      }
    }
    private def flushBlock(): Unit = {
      out.write(blockLen)
      out.write(block, 0, blockLen)
      blockLen = 0
    }
    def finish(): Unit = {
      if (nBits > 0) {
        block(blockLen) = (cur & 0xff).toByte
        blockLen += 1
        if (blockLen == 255) flushBlock()
        cur = 0; nBits = 0
      }
      if (blockLen > 0) flushBlock()
      out.write(0) // block terminator
    }
  }

  /** Fixed-9-bit LZW ("uncompressed GIF" scheme): CLEAR, then literal
    * codes with a CLEAR every 250 symbols so the decoder's table never
    * reaches the 10-bit boundary. Size is closed-form in the pixel
    * count — the oracle's file-length arithmetic depends on this.
    */
  private def lzwEncode(pixels: Array[Byte],
                        out: java.io.ByteArrayOutputStream): Unit = {
    val Clear = 256
    val Eoi = 257
    val bw = new GifBitWriter(out)
    bw.put(Clear, 9)
    var i = 0
    while (i < pixels.length) {
      if (i > 0 && i % 250 == 0) bw.put(Clear, 9)
      bw.put(pixels(i) & 0xff, 9)
      i += 1
    }
    bw.put(Eoi, 9)
    bw.finish()
  }

  /** Animated GIF89a: global 256-entry grayscale palette, a graphic
    * control extension + image descriptor + LZW data per frame, every
    * frame full-canvas. Deterministic byte-for-byte.
    */
  def encodeGif(frames: Seq[Array[Byte]], width: Int,
                height: Int): Array[Byte] = {
    require(frames.nonEmpty, "encodeGif needs at least one frame")
    require(frames.forall(_.length == width * height),
      "every frame must be width*height pixels")
    val out = new java.io.ByteArrayOutputStream
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(width & 0xff); out.write((width >> 8) & 0xff)
    out.write(height & 0xff); out.write((height >> 8) & 0xff)
    out.write(0xF7) // GCT present, 8 bits/channel, 256 entries
    out.write(0)    // background index
    out.write(0)    // aspect
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    frames.foreach { px =>
      out.write(0x21); out.write(0xF9); out.write(0x04) // GCE
      out.write(0x00)                                   // no disposal
      out.write(10); out.write(0)                       // delay 10cs
      out.write(0); out.write(0)                        // no transparency
      out.write(0x2C)                                   // image descriptor
      out.write(0); out.write(0); out.write(0); out.write(0) // left, top
      out.write(width & 0xff); out.write((width >> 8) & 0xff)
      out.write(height & 0xff); out.write((height >> 8) & 0xff)
      out.write(0x00) // no local palette, not interlaced
      out.write(8)    // LZW min code size
      lzwEncode(px, out)
    }
    out.write(0x3B)
    out.toByteArray
  }

  /** Full variable-width GIF LZW decoder (code growth, clear codes) —
    * reads any conformant stream, not just [[lzwEncode]]'s output.
    * `data` is the concatenated sub-block payload.
    */
  private def lzwDecode(data: Array[Byte], minCodeSize: Int,
                        nPixels: Int): Array[Byte] = {
    val Clear = 1 << minCodeSize
    val Eoi = Clear + 1
    val out = new Array[Byte](nPixels)
    var outLen = 0
    // dictionary as (prefix code, appended byte); roots are -1-prefixed
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var nextCode = Eoi + 1
    var codeSize = minCodeSize + 1
    var prev = -1
    var acc = 0L
    var accBits = 0
    var pos = 0
    val stack = new Array[Byte](4096)
    def expand(code: Int): Int = { // push the code's string, return first byte
      var depth = 0
      var c = code
      while (c >= Clear) { // composite codes chain through prefixes
        stack(depth) = suffix(c); depth += 1
        c = prefix(c)
      }
      val first = c
      require(outLen + depth + 1 <= nPixels, "LZW overruns pixel count")
      out(outLen) = c.toByte; outLen += 1
      while (depth > 0) { depth -= 1; out(outLen) = stack(depth); outLen += 1 }
      first
    }
    def firstByteOf(code: Int): Int = {
      var c = code
      while (c >= Clear) c = prefix(c)
      c
    }
    while (outLen < nPixels) {
      while (accBits < codeSize) {
        require(pos < data.length, "truncated LZW stream")
        acc |= (data(pos) & 0xffL) << accBits
        accBits += 8
        pos += 1
      }
      val code = (acc & ((1 << codeSize) - 1)).toInt
      acc >>>= codeSize
      accBits -= codeSize
      if (code == Clear) {
        nextCode = Eoi + 1
        codeSize = minCodeSize + 1
        prev = -1
      } else if (code == Eoi) {
        require(outLen == nPixels, s"early EOI at $outLen of $nPixels")
      } else if (prev < 0) { // first code after a clear: always a literal
        require(code < Clear, s"first LZW code $code is not a literal")
        require(outLen < nPixels, "LZW overruns pixel count")
        out(outLen) = code.toByte
        outLen += 1
        prev = code
      } else {
        // standard step: new entry = string(prev) + firstByte, where
        // firstByte comes from `code` if known, from `prev` in the
        // KwKwK case (code == nextCode)
        require(code <= nextCode, s"LZW code $code out of range ($nextCode)")
        val first =
          if (code < nextCode) firstByteOf(code) else firstByteOf(prev)
        if (nextCode < 4096) {
          prefix(nextCode) = prev
          suffix(nextCode) = first.toByte
          nextCode += 1
        }
        require(code < nextCode, s"LZW code $code with full table")
        expand(code)
        if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
        prev = code
      }
    }
    out
  }

  /** GIF 4-pass interlace: stored row order is rows 0,8,16… then
    * 4,12,20… then 2,6,10… then 1,3,5… — remap back to top-down.
    */
  private def deinterlace(raw: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](raw.length)
    var src = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var r = start
      while (r < h) {
        System.arraycopy(raw, src * w, out, r * w, w)
        src += 1
        r += step
      }
    }
    out
  }

  /** Parse an animated GIF: logical screen descriptor, skip palettes and
    * extensions, decode every frame's LZW pixel indexes.
    */
  def decodeGif(bytes: Array[Byte]): GifVideo = {
    require(bytes.length >= 13 &&
      new String(bytes, 0, 3, "US-ASCII") == "GIF", "not a GIF")
    val width = u16le(bytes, 6)
    val height = u16le(bytes, 8)
    val packed = bytes(10) & 0xff
    var pos = 13
    if ((packed & 0x80) != 0) pos += 3 * (2 << (packed & 7)) // global palette
    val frames = Seq.newBuilder[Array[Byte]]
    var done = false
    while (!done) {
      require(pos < bytes.length, "truncated GIF")
      (bytes(pos) & 0xff) match {
        case 0x3B => done = true
        case 0x21 => // extension: label + sub-blocks
          pos += 2
          while ((bytes(pos) & 0xff) != 0) pos += 1 + (bytes(pos) & 0xff)
          pos += 1
        case 0x2C =>
          val fw = u16le(bytes, pos + 5)
          val fh = u16le(bytes, pos + 7)
          val fpacked = bytes(pos + 9) & 0xff
          val interlaced = (fpacked & 0x40) != 0
          pos += 10
          if ((fpacked & 0x80) != 0) pos += 3 * (2 << (fpacked & 7))
          val minCode = bytes(pos) & 0xff
          pos += 1
          val data = new java.io.ByteArrayOutputStream
          while ((bytes(pos) & 0xff) != 0) {
            val n = bytes(pos) & 0xff
            data.write(bytes, pos + 1, n)
            pos += 1 + n
          }
          pos += 1
          val raw = lzwDecode(data.toByteArray, minCode, fw * fh)
          frames += (if (interlaced) deinterlace(raw, fw, fh) else raw)
        case other =>
          throw new IllegalArgumentException(
            f"unknown GIF block 0x$other%02x at $pos")
      }
    }
    GifVideo(width, height, frames.result())
  }
}
